"""Misra-Gries frequent-items summary (sketchlib/sketches/mg.py).

Locked properties, per the published guarantees (Misra & Gries 1982; merge
form Agarwal et al., "Mergeable Summaries", 2013):

- NEVER overcounts: est(x) ≤ true(x), every key, deterministically.
- Exact undercount certificate: true(x) ≤ est(x) + decr, and
  decr ≤ N/(k+1) ≤ ε·N always (no failure probability to carve out).
- Heavy-key containment: every x with true(x) > decr is present.
- Merge preserves all of the above under ARBITRARY regroupings
  (hypothesis-driven), the Mergeable Summaries theorem.
- Weighted updates carry the same certificate with N = ΣW.
- Serde roundtrip is byte-exact; k mismatch refuses to merge.
- End-to-end through the zero-shuffle Spark build kernel: states over the
  synthetic token table answer top-k with est ≤ true ≤ est + bound.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sketchlib.sketches import MisraGries, deserialize


def _zipf(n=50_000, vocab=2_000, seed=3, a=1.3):
    rng = np.random.default_rng(seed)
    return rng.zipf(a, size=n).clip(1, vocab).astype(np.int64)


def _true_counts(keys):
    u, c = np.unique(keys, return_counts=True)
    return dict(zip(u.tolist(), c.tolist()))


def test_never_overcounts_and_certificate():
    keys = _zipf()
    sk = MisraGries(eps=0.01)  # k = 99
    sk.update_values(keys)
    true = _true_counts(keys)
    decr = sk.error_bound()
    assert decr <= len(keys) / (sk.k + 1) + 1e-9  # published worst case
    assert decr <= sk.worst_case_bound() + 1e-9
    probe = np.array(sorted(true), dtype=np.int64)
    est = sk.query(probe)
    for x, e in zip(probe.tolist(), est.tolist()):
        assert e <= true[x], "MG must never overcount"
        assert true[x] <= e + decr, "undercount certificate violated"


def test_unseen_keys_are_zero():
    sk = MisraGries(eps=0.1)
    sk.update_values(np.arange(100, dtype=np.int64))
    assert (sk.query(np.array([10_000, 20_000])) == 0).all()


def test_heavy_key_containment():
    keys = _zipf()
    sk = MisraGries(eps=0.02)
    sk.update_values(keys)
    decr = sk.error_bound()
    present = set(sk.ids.tolist())
    for x, c in _true_counts(keys).items():
        if c > decr:
            assert x in present, f"key {x} (count {c} > decr {decr}) missing"


def test_exact_below_capacity():
    """Fewer distinct keys than k → no decrement ever fires: counts exact."""
    keys = np.repeat(np.arange(50, dtype=np.int64), 7)
    sk = MisraGries(k=64)
    sk.update_values(keys)
    assert sk.error_bound() == 0.0
    assert (sk.query(np.arange(50, dtype=np.int64)) == 7).all()


def test_weighted_update_certificate():
    rng = np.random.default_rng(11)
    u = np.arange(500, dtype=np.int64)
    w = rng.integers(1, 1000, size=500).astype(np.int64)
    sk = MisraGries(k=50)
    sk.update_values(u, counts=w)
    assert sk.total == int(w.sum())
    decr = sk.error_bound()
    assert decr <= w.sum() / (sk.k + 1) + 1e-9
    est = sk.query(u)
    assert (est <= w).all()
    assert (w <= est + decr).all()
    with pytest.raises(ValueError, match="non-negative"):
        MisraGries(k=8).update_values(np.array([1]), counts=np.array([-2]))


def test_topk_order_and_determinism():
    keys = _zipf()
    sk = MisraGries(eps=0.01)
    sk.update_values(keys)
    ids, est = sk.topk(10)
    assert len(ids) == 10
    assert (np.diff(est) <= 0).all()  # descending counts
    ids2, est2 = sk.topk(10)
    assert (ids == ids2).all() and (est == est2).all()


def test_k_mismatch_rejected():
    with pytest.raises(ValueError, match="mismatch"):
        MisraGries(k=8).merge(MisraGries(k=16))


def test_serde_roundtrip():
    sk = MisraGries(eps=0.05)
    sk.update_values(_zipf(n=10_000))
    blob = sk.to_bytes()
    back = deserialize(blob)
    assert isinstance(back, MisraGries)
    assert back.to_bytes() == blob
    assert (back.ids == sk.ids).all() and (back.counts == sk.counts).all()
    assert (back.total, back.decr, back.k) == (sk.total, sk.decr, sk.k)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(200, 3_000),
    k=st.integers(4, 64),
    n_parts=st.integers(1, 8),
    seed=st.integers(0, 10_000),
)
def test_merge_bound_under_arbitrary_regrouping(n, k, n_parts, seed):
    """The Mergeable Summaries theorem, as hypothesis sees it: split the
    stream into random contiguous runs, build one summary per run, merge in
    order — the certificate (no overcount, true ≤ est + decr,
    decr ≤ N/(k+1), heavy-key containment) must hold for EVERY split."""
    rng = np.random.default_rng(seed)
    keys = rng.zipf(1.4, size=n).clip(1, 200).astype(np.int64)
    cuts = np.sort(rng.integers(0, n, size=n_parts - 1)) if n_parts > 1 else np.array([], int)
    parts = np.split(keys, cuts)
    merged = MisraGries(k=k)
    for p in parts:
        piece = MisraGries(k=k)
        piece.update_values(p)
        merged.merge(piece)
    true = _true_counts(keys)
    decr = merged.error_bound()
    assert decr <= n / (k + 1) + 1e-9
    probe = np.array(sorted(true), dtype=np.int64)
    est = merged.query(probe)
    for x, e in zip(probe.tolist(), est.tolist()):
        assert e <= true[x]
        assert true[x] <= e + decr
    present = set(merged.ids.tolist())
    assert all(x in present for x, c in true.items() if c > decr)


def test_ddl_lifecycle_and_weighted_refusal(spark, seq_tiny_dir, tmp_path):
    """mg through the catalog DDL: CREATE SKETCHES registers it, REFRESH
    no-ops on an unchanged dir, the states serve mg_topk_df, and the same
    weight= contract as CM applies (column name, frequency-sketch-only)."""
    import pytest as _pt

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.spark.query import mg_topk_df
    from sketchlib.sql import approx_sql

    tables = {"sequences": seq_tiny_dir}
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark,
        "CREATE SKETCHES m FROM sequences KINDS mg(tokens, eps=0.001) GROUP BY source",
        tables, catalog=cat,
    ).collect()
    assert {r["name"] for r in approx_sql(spark, "SHOW SKETCHES", catalog=cat).collect()} == {"m"}
    out = mg_topk_df(spark, cat.states("m"), "mg_tokens", 3).toPandas()
    assert (out.groupby("group").size() == 3).all()
    assert (out["est_count"] > 0).all()
    ref = approx_sql(spark, "REFRESH SKETCHES m", catalog=cat).collect()[0]
    assert ref["new_files"] == 0
    with _pt.raises(ValueError, match="frequency sketch"):
        approx_sql(
            spark,
            "CREATE SKETCHES w FROM sequences KINDS kll(n_tok, weight=n_tok)",
            tables, catalog=cat,
        )


def test_spark_build_end_to_end(spark, seq_tiny_dir):
    """mg through the zero-shuffle build kernel + mg_topk_df serving over
    the synthetic token table, checked against exact Spark token counts."""
    from pyspark.sql import functions as F

    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import mg_topk_df

    df = spark.read.parquet(seq_tiny_dir)
    states = build_sketches(df, [SketchSpec("mg_tok", "mg", "tokens", {"eps": 1e-3})],
                            group_by="source")
    out = mg_topk_df(spark, states, "mg_tok", 8).toPandas()
    assert set(out.columns) == {"group", "token", "est_count", "undercount_bound"}
    assert (out.groupby("group").size() == 8).all()
    exact = (
        df.select("source", F.explode("tokens").alias("token"))
        .groupBy("source", "token").agg(F.count("*").alias("n")).toPandas()
    )
    true = {(r.source, int(r.token)): int(r.n) for r in exact.itertuples()}
    for r in out.itertuples():
        t = true.get((r.group, int(r.token)), 0)
        assert r.est_count <= t
        assert t <= r.est_count + r.undercount_bound


def test_zero_weight_feed_never_grows_state():
    """Zero weights pass the non-negative check but carry no information:
    unpruned they would grow the state past k counters (unbounded 'KB'
    state) and pad topk with est=0 keys. Regression for the round-5
    review finding."""
    sk = MisraGries(k=4)
    sk.update_values(np.array([1, 2, 3], dtype=np.int64), counts=np.array([10, 10, 10]))
    for i in range(50):
        sk.update_values(
            np.arange(100 + 5 * i, 105 + 5 * i, dtype=np.int64),
            counts=np.zeros(5, dtype=np.int64),
        )
    assert len(sk.ids) == 3
    ids, est = sk.topk(6)
    assert (est > 0).all()
    assert set(ids.tolist()) == {1, 2, 3}
    # serialized state stays at the documented O(k) size
    assert len(sk.to_bytes()) < 200


def test_topk_df_refuses_mg_states(spark):
    """CM's err_bound is an OVERcount interval; MG's is an undercount
    certificate. topk_df must refuse to blur them (mg_topk_df serves MG)."""
    import pandas as pd

    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import mg_topk_df, topk_df

    pdf = pd.DataFrame({"g": ["a"] * 100, "v": (np.arange(100) % 7).astype("int64")})
    states = build_sketches(
        spark.createDataFrame(pdf), [SketchSpec("m", "mg", "v", {"k": 32})], group_by="g"
    )
    with pytest.raises(Exception, match="undercount"):
        topk_df(spark, states, "m", 5).collect()
    out = mg_topk_df(spark, states, "m", 5).toPandas()
    assert "undercount_bound" in out.columns and len(out) == 5


def test_cli_topk_dispatches_mg_states(seq_tiny_dir, tmp_path):
    """`query --kind topk` over MG states must serve mg_topk_df's
    undercount_bound, never CM's err_bound (round-5 review)."""
    import json
    import subprocess
    import sys

    out_dir = str(tmp_path / "states")
    r = subprocess.run(
        [
            sys.executable, "-m", "sketchlib.cli", "build",
            "--input", seq_tiny_dir, "--group-by", "source",
            "--sketches", 'mg_tok:mg:tokens:{"k": 64}',
            "--out", out_dir,
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rq = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "query", "--states", out_dir,
         "--sketch", "mg_tok", "--kind", "topk", "--k", "3"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert rq.returncode == 0, rq.stderr[-2000:]
    rows = [json.loads(l) for l in rq.stdout.splitlines() if l.startswith("{")]
    assert rows and all("undercount_bound" in x and "err_bound" not in x for x in rows)


def test_sql_approx_frequent_all_routes(spark, tmp_path):
    """APPROX_FREQUENT(col, k [, eps]): on-the-fly MG build, states-served
    auto-selection (eps-gated — a tighter explicit eps than the
    registration declines the route), ROLLUP from the finest states, the
    aliased form's _undercount suffix, and APPROX_TOPK never picking an
    mg registration (the two heads carry inverse bound contracts)."""
    import pandas as pd

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql, resolve_catalog_key

    rng = np.random.default_rng(7)
    keys = rng.zipf(1.3, 40_000).clip(1, 3000).astype("int64")
    pdf = pd.DataFrame({"g": np.where(np.arange(40_000) % 2 == 0, "a", "b"), "t": keys})
    base = str(tmp_path / "base")
    spark.createDataFrame(pdf).write.parquet(base)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    t = {"ft": base}
    out = approx_sql(spark, "SELECT APPROX_FREQUENT(t, 5) FROM ft GROUP BY g", t).toPandas()
    assert set(out.columns) == {"group", "token", "est_count", "undercount_bound"}
    for g in ("a", "b"):
        true = pdf[pdf["g"] == g]["t"].value_counts()
        for _, x in out[out["group"] == g].iterrows():
            c = int(true.get(x["token"], 0))
            assert x["est_count"] <= c <= x["est_count"] + x["undercount_bound"]
    approx_sql(spark, "CREATE SKETCHES fs FROM ft KINDS mg(t, eps=0.001) GROUP BY g",
               t, catalog=cat).collect()
    stmt = "SELECT APPROX_FREQUENT(t, 5) FROM ft GROUP BY g"
    assert resolve_catalog_key(spark, stmt, t, cat) == "fs"
    assert resolve_catalog_key(
        spark, "SELECT APPROX_FREQUENT(t, 5, 0.0001) FROM ft GROUP BY g", t, cat
    ) is None  # registration can't achieve the tighter eps
    assert resolve_catalog_key(
        spark, "SELECT APPROX_TOPK(t, 5) FROM ft GROUP BY g", t, cat
    ) is None  # CM's head must never read an undercount summary
    served = approx_sql(spark, stmt, t, catalog=cat).toPandas()
    assert (served.groupby("group").size() == 5).all()
    roll = approx_sql(
        spark, "SELECT APPROX_FREQUENT(t, 3) FROM ft GROUP BY ROLLUP (g)",
        t, catalog=cat, catalog_key="fs",
    ).toPandas()
    assert set(roll["grouping_lvl"]) == {0, 1} and len(roll) == 9
    glob = roll[roll["grouping_lvl"] == 1]
    true_all = pdf["t"].value_counts()
    for _, x in glob.iterrows():
        c = int(true_all.get(x["token"], 0))
        assert x["est_count"] <= c <= x["est_count"] + x["undercount_bound"]
    ra = approx_sql(spark, "SELECT APPROX_FREQUENT(t, 3) AS freq FROM ft", t).toPandas()
    assert {"freq", "freq_undercount", "token"} <= set(ra.columns)
    with pytest.raises(ValueError, match="takes \\(col, k"):
        approx_sql(spark, "SELECT APPROX_FREQUENT(t) FROM ft", t)


def test_sql_frequent_unionall_merge_from_states(spark, tmp_path):
    """APPROX_FREQUENT over (a UNION ALL b) merges the sides' MG states —
    zero base scans (EXPLAIN claims the merge route), the merged
    certificate holds over the concatenated bag, and an explicit eps
    DECLINES the route (the generic path builds at exactly that eps)."""
    import pandas as pd

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql, explain_sql

    rng = np.random.default_rng(7)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    t, frames = {}, {}
    for nm in ("x1", "x2"):
        keys = rng.zipf(1.3, 30_000).clip(1, 2000).astype("int64")
        frames[nm] = pd.DataFrame({"t": keys})
        p = str(tmp_path / nm)
        spark.createDataFrame(frames[nm]).write.parquet(p)
        t[nm] = p
        approx_sql(spark, f"CREATE SKETCHES s_{nm} FROM {nm} KINDS mg(t, eps=0.001)",
                   t, catalog=cat).collect()
    q = "SELECT APPROX_FREQUENT(t, 5) FROM (SELECT t FROM x1 UNION ALL SELECT t FROM x2)"
    ex = {r["property"]: r["value"] for r in explain_sql(spark, q, t, catalog=cat).collect()}
    assert ex["statement_kind"] == "approx_unionall_merge"
    assert ex["sketches"] == "mg" and ex["artifacts"] == "s_x1, s_x2"
    out = approx_sql(spark, q, t, catalog=cat).toPandas()
    both = pd.concat(frames.values())["t"].value_counts()
    assert len(out) == 5
    for _, x in out.iterrows():
        c = int(both.get(x["token"], 0))
        assert x["est_count"] <= c <= x["est_count"] + x["undercount_bound"]
    ex2 = {r["property"]: r["value"] for r in explain_sql(
        spark, q.replace("5)", "5, 0.0005)"), t, catalog=cat).collect()}
    assert ex2["statement_kind"] == "derived_table"
