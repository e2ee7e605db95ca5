"""Weighted t-digest: tdigest(col, weight=w) summarizes the WEIGHT-MASS
distribution of the value column (quantile q = value below which q of the
total weight lies). Locks: accuracy of the weighted rank through both
build strategies, joint NaN filtering (a value-only filter would misalign
values and weights), negative-weight refusal, no-cross-serving (a weighted
digest never answers plain quantile-family SQL statements), and DDL."""

import numpy as np
import pandas as pd
import pytest

from sketchlib.sketches.tdigest import TDigest
from sketchlib.spark.build import SketchSpec, build_sketches
from sketchlib.spark.query import quantiles_df


def _weighted_rank(sub: pd.DataFrame, v: float) -> float:
    return float(sub.loc[sub["x"] <= v, "w"].sum() / sub["w"].sum())


@pytest.fixture(scope="module")
def wdata():
    rng = np.random.default_rng(3)
    n = 60_000
    return pd.DataFrame(
        {
            "g": np.where(np.arange(n) % 2 == 0, "a", "b"),
            "x": rng.lognormal(4, 1, n),
            "w": rng.integers(0, 50, n).astype("float64"),
        }
    )


@pytest.mark.parametrize("strategy", ["map", "shuffle"])
def test_weighted_quantiles_accurate_both_strategies(spark, wdata, strategy):
    df = spark.createDataFrame(wdata)
    spec = [SketchSpec("tdw", "tdigest", "x", {"compression": 400}, weight="w")]
    st = build_sketches(df, spec, group_by="g", strategy=strategy)
    out = quantiles_df(spark, st, "tdw", [0.25, 0.5, 0.9]).collect()
    assert len(out) == 6
    for r in out:
        sub = wdata[wdata["g"] == r["group"]]
        rank = _weighted_rank(sub, float(r["value"]))
        assert abs(rank - r["q"]) <= r["rank_err_bound"] + 1e-3, (r["group"], r["q"], rank)


def test_joint_nan_filter_and_zero_weights():
    """NaN in EITHER array drops the row pair (the old value-only filter
    silently misaligned the arrays); zero weights contribute nothing."""
    v = np.array([1.0, np.nan, 3.0, 5.0, 7.0])
    w = np.array([2.0, 9.0, np.nan, 4.0, 0.0])
    t = TDigest(100).update_values(v, weights=w)
    # surviving mass: 1.0 w=2, 5.0 w=4 -> total weight 6, p100 value 5
    assert t.weights.sum() == 6.0
    assert float(t.quantiles(np.array([1.0]))[0]) == 5.0
    assert t.vmax == 5.0  # 7.0 had zero weight; 3.0 a NaN weight


def test_weight_refusals():
    with pytest.raises(ValueError, match="non-negative"):
        TDigest(100).update_values(np.array([1.0]), weights=np.array([-1.0]))
    with pytest.raises(ValueError, match="align"):
        TDigest(100).update_values(np.array([1.0, 2.0]), weights=np.array([1.0]))
    with pytest.raises(ValueError, match="weighted-update semantics"):
        SketchSpec("q", "kll", "x", {"k": 200}, weight="w")


def test_weighted_digest_never_cross_serves_sql(spark, wdata, tmp_path):
    """A registered WEIGHTED tdigest answers a different distribution than
    the row population — auto-selection must skip it for plain
    APPROX_PERCENTILE / APPROX_MAD / APPROX_TRIMMED_MEAN / APPROX_HISTOGRAM
    statements (on-the-fly fallback), and an explicit key must refuse."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql, resolve_catalog_key

    base = str(tmp_path / "base")
    spark.createDataFrame(wdata).write.parquet(base)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    t = {"wt": base}
    approx_sql(
        spark, "CREATE SKETCHES ws FROM wt KINDS tdigest(x, weight=w) GROUP BY g",
        t, catalog=cat,
    ).collect()
    for stmt in (
        "SELECT APPROX_PERCENTILE(x, 0.5) FROM wt GROUP BY g",
        "SELECT APPROX_MAD(x) FROM wt GROUP BY g",
        "SELECT APPROX_TRIMMED_MEAN(x, 0.1, 0.9) FROM wt GROUP BY g",
        "SELECT APPROX_HISTOGRAM(x, 4) FROM wt GROUP BY g",
    ):
        assert resolve_catalog_key(spark, stmt, t, cat) is None, stmt
    with pytest.raises(ValueError, match="serving"):
        approx_sql(spark, "SELECT APPROX_PERCENTILE(x, 0.5) FROM wt GROUP BY g",
                   t, catalog=cat, catalog_key="ws")
    # the registered weighted digest IS servable by name via the API
    out = quantiles_df(spark, cat.states("ws"), "tdigest_x_w_w", [0.5]).collect()
    assert len(out) == 2
    for r in out:
        sub = wdata[wdata["g"] == r["group"]]
        assert abs(_weighted_rank(sub, float(r["value"])) - 0.5) <= r["rank_err_bound"] + 1e-3


def test_weighted_vs_repeated_equivalence():
    """Integer weights ≡ repeating each value that many times, within the
    digests' own rank bound (bin structure differs, the distribution
    summarized must not)."""
    rng = np.random.default_rng(11)
    v = rng.lognormal(2, 0.7, 5000)
    w = rng.integers(1, 6, 5000)
    a = TDigest(200).update_values(v, weights=w.astype("float64"))
    b = TDigest(200).update_values(np.repeat(v, w))
    qs = np.array([0.1, 0.5, 0.9])
    rep = np.sort(np.repeat(v, w))
    for q, va, vb in zip(qs, a.quantiles(qs), b.quantiles(qs)):
        ra = np.searchsorted(rep, va, side="right") / len(rep)
        rb = np.searchsorted(rep, vb, side="right") / len(rep)
        assert abs(ra - q) <= 2 * a.error_bound()
        assert abs(rb - q) <= 2 * b.error_bound()


def test_weighted_digest_serves_weighted_robust_stats(spark, wdata):
    """mad_df / trimmed_mean_df over a WEIGHTED digest answer the
    weight-mass versions of the statistics — the trimmed mean becomes
    'mean value of the middle 80% of the WEIGHT', checked against the
    exact weighted computation."""
    from sketchlib.spark.query import trimmed_mean_df

    df = spark.createDataFrame(wdata)
    spec = [SketchSpec("tdw", "tdigest", "x", {"compression": 400}, weight="w")]
    st = build_sketches(df, spec, group_by="g")
    out = {r["group"]: r for r in trimmed_mean_df(spark, st, "tdw", 0.1, 0.9).collect()}
    for g in ("a", "b"):
        sub = wdata[wdata["g"] == g].sort_values("x")
        v, w = sub["x"].to_numpy(), sub["w"].to_numpy()
        cum = np.cumsum(w)
        W = cum[-1]
        prev = np.concatenate([[0.0], cum[:-1]])
        win = np.clip(np.minimum(cum, 0.9 * W) - np.maximum(prev, 0.1 * W), 0.0, None)
        exact = float((win * v).sum() / win.sum())
        r = out[g]
        assert r["tm_lo"] - 1e-9 <= exact <= r["tm_hi"] + 1e-9, (g, exact, dict(r.asDict()))


def test_weighted_digest_incremental_refresh(spark, wdata, tmp_path):
    """REFRESH SKETCHES merges appended files' weighted states like any
    other kind — the refreshed weighted quantile stays within bound of
    the full two-file exact."""
    import os

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    base = str(tmp_path / "base")
    a, b = wdata.iloc[:40_000], wdata.iloc[40_000:]
    spark.createDataFrame(a).coalesce(1).write.parquet(base)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    t = {"wt": base}
    approx_sql(
        spark, "CREATE SKETCHES ws FROM wt KINDS tdigest(x, weight=w) GROUP BY g",
        t, catalog=cat,
    ).collect()
    spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(base)
    ref = approx_sql(spark, "REFRESH SKETCHES ws", t, catalog=cat).collect()[0]
    assert ref["new_files"] >= 1
    out = quantiles_df(spark, cat.states("ws"), "tdigest_x_w_w", [0.5]).collect()
    for r in out:
        sub = wdata[wdata["g"] == r["group"]]
        assert abs(_weighted_rank(sub, float(r["value"])) - 0.5) <= r["rank_err_bound"] + 1e-3


def test_sql_weighted_percentile_all_routes(spark, wdata, tmp_path):
    """APPROX_PERCENTILE(col, q, weight=w): on-the-fly weighted build,
    states-served via auto-selection (the weighted registration that the
    PLAIN statement must skip), ROLLUP from the same states, and the
    refusals (weight+rank_err, weight over a row sample)."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql, explain_sql, resolve_catalog_key

    base = str(tmp_path / "base")
    spark.createDataFrame(wdata).write.parquet(base)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    t = {"wt": base}
    stmt = "SELECT APPROX_PERCENTILE(x, 0.5, weight=w) FROM wt GROUP BY g"
    fly = {r["group"]: r for r in approx_sql(spark, stmt, t).collect()}
    for g in ("a", "b"):
        sub = wdata[wdata["g"] == g]
        assert abs(_weighted_rank(sub, float(fly[g]["value"])) - 0.5) \
            <= fly[g]["rank_err_bound"] + 1e-3
    approx_sql(
        spark, "CREATE SKETCHES ws FROM wt KINDS tdigest(x, weight=w) GROUP BY g",
        t, catalog=cat,
    ).collect()
    assert resolve_catalog_key(spark, stmt, t, cat) == "ws"
    assert resolve_catalog_key(
        spark, "SELECT APPROX_PERCENTILE(x, 0.5) FROM wt GROUP BY g", t, cat
    ) is None
    ex = {r["property"]: r["value"] for r in explain_sql(spark, stmt, t, catalog=cat).collect()}
    assert "persisted_sketch_states" in ex["route"] and ex["artifact"] == "ws"
    served = {r["group"]: r for r in approx_sql(spark, stmt, t, catalog=cat).collect()}
    for g in ("a", "b"):
        sub = wdata[wdata["g"] == g]
        assert abs(_weighted_rank(sub, float(served[g]["value"])) - 0.5) \
            <= served[g]["rank_err_bound"] + 1e-3
    roll = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(x, 0.5, weight=w) FROM wt GROUP BY ROLLUP (g)",
        t, catalog=cat, catalog_key="ws",
    ).toPandas()
    assert set(roll["grouping_lvl"]) == {0, 1} and len(roll) == 3
    glob = float(roll.loc[roll["grouping_lvl"] == 1, "value"].iloc[0])
    assert abs(_weighted_rank(wdata, glob) - 0.5) <= 3.31 / 200 + 1e-3
    with pytest.raises(ValueError, match="cannot combine"):
        approx_sql(
            spark, "SELECT APPROX_PERCENTILE(x, 0.5, weight=w, rank_err=0.01) FROM wt", t
        )
    # a persisted ROW sample must refuse a weight= statement by name
    approx_sql(
        spark, "CREATE SAMPLE sc FROM wt KIND uniform RATIO 0.5", t, catalog=cat
    ).collect()
    with pytest.raises(ValueError, match="not a row sample"):
        approx_sql(spark, "SELECT APPROX_PERCENTILE(x, 0.5, weight=w) FROM wt",
                   t, catalog=cat, catalog_key="sc")


def test_inf_weight_refused():
    """+inf weight would make the total mass infinite and every quantile
    garbage — corrupt input raises (NaN = missing data, dropped)."""
    with pytest.raises(ValueError, match="finite"):
        TDigest(100).update_values(np.array([1.0, 2.0]), weights=np.array([1.0, np.inf]))


def test_explain_weight_within_parity(spark, wdata, tmp_path):
    """EXPLAIN on weight= + WITHIN reports the same refusal execution
    makes — an error row, never a bogus KLL plan or a leaked traceback."""
    from sketchlib.sql import approx_sql, explain_sql

    base = str(tmp_path / "base")
    spark.createDataFrame(wdata.head(1000)).write.parquet(base)
    t = {"wt": base}
    stmt = "SELECT APPROX_PERCENTILE(x, 0.5, weight=w) FROM wt WITHIN 1% ERROR"
    ex = {r["property"]: r["value"] for r in explain_sql(spark, stmt, t).collect()}
    assert "error" in ex and "weight= + WITHIN" in ex["error"]
    with pytest.raises(ValueError, match="rank_err/rel_err/weight"):
        approx_sql(spark, stmt, t)


def test_scramble_contract_mismatch_names_migration(spark, tmp_path):
    """The contract-mismatch refusal tells the caller the recorded
    parameters to pass (incl. the 42 → 1042 default-seed change note)."""
    from sketchlib.spark.streaming import StreamingScrambleSink

    sd = str(tmp_path / "sc")
    StreamingScrambleSink(sd, id_col="doc_id", ratio=0.2, seed=42)
    with pytest.raises(ValueError, match="seed=42.*42 → 1042"):
        StreamingScrambleSink(sd, id_col="doc_id", ratio=0.2)  # default 1042
