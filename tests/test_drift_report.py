"""corpus_drift_df — the one-stop 'what changed since the last drop' report
from two state-table snapshots: per-kind drift metrics in one long frame,
zero corpus scans. Locks the identity case (zero drift, exactly), the
doubled-corpus case (mass ×2 exact, distinct/quantiles stable within
bounds), one-sided groups, and the no-common-names guard."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.build import SketchSpec, build_sketches
from sketchlib.spark.query import corpus_drift_df

_SPECS = [
    SketchSpec("h", "hll", "v", {"p": 12}),
    SketchSpec("c", "cm", "v", {"eps": 1e-3, "delta": 0.05}),
    SketchSpec("q", "kll", "x", {"k": 200}),
    SketchSpec("m", "minhash", "v", {"r": 128}),
]


def _df(spark, n, gs=("a", "b")):
    pdf = pd.DataFrame(
        {
            "g": [gs[i % len(gs)] for i in range(n)],
            "v": (np.arange(n) * 7919) % 500,
            "x": (np.arange(n, dtype=np.float64) * 13) % 1000,
        }
    )
    return spark.createDataFrame(pdf)


def test_identity_snapshot_zero_drift(spark):
    df = _df(spark, 4000)
    sa = build_sketches(df, _SPECS, group_by="g")
    sb = build_sketches(df, _SPECS, group_by="g")
    out = corpus_drift_df(spark, sa, sb).toPandas()
    assert set(out["sketch"]) == {"h", "c", "q", "m"}
    num = out[out["metric"].isin(["distinct", "mass", "p50", "p90", "p99"])]
    assert (num["rel_change"] == 0.0).all()  # byte-identical states
    jac = out[out["metric"] == "jaccard"]
    assert (jac["value_a"] == 1.0).all()


def test_doubled_corpus_mass_doubles_distinct_stable(spark):
    df = _df(spark, 4000)
    sa = build_sketches(df, _SPECS, group_by="g")
    sb = build_sketches(df.unionByName(df), _SPECS, group_by="g")
    out = corpus_drift_df(spark, sa, sb).toPandas()
    mass = out[out["metric"] == "mass"]
    assert np.allclose(mass["rel_change"], 1.0)  # CM totals are exact
    assert (mass["bound"] == 0.0).all()
    dist = out[out["metric"] == "distinct"]
    # same value set: relative change within the summed rse bound (3σ)
    assert (dist["rel_change"].abs() <= 3 * dist["bound"]).all()
    for m in ("p50", "p90", "p99"):
        sub = out[out["metric"] == m]
        # same distribution, but KLL compaction is randomized: the doubled
        # stream compacts differently, so values agree within the summed
        # RANK bound translated through the uniform data's density (÷1000)
        tol = sub["bound"] * 1000.0
        assert ((sub["value_b"] - sub["value_a"]).abs() <= tol).all()
    jac = out[out["metric"] == "jaccard"]
    assert (jac["value_a"] >= 1.0 - 1e-12).all()  # identical sets


def test_one_sided_group_and_missing_names(spark):
    df = _df(spark, 2000)
    sa = build_sketches(df, _SPECS, group_by="g")
    sb = build_sketches(df.filter(F.col("g") == "a"), _SPECS, group_by="g")
    out = corpus_drift_df(spark, sa, sb).toPandas()
    lone = out[out["group"] == "b"]
    assert set(lone["metric"]) == {"one_sided"}
    assert lone["value_a"].isna().all()
    assert "one_sided" not in set(out[out["group"] == "a"]["metric"])

    other = build_sketches(df, [SketchSpec("zzz", "hll", "v")], group_by="g")
    with pytest.raises(ValueError, match="no sketch names"):
        corpus_drift_df(spark, sa, other)


def test_fd_drift_rows(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 500,
            "e": [v.astype(np.float32).tolist() for v in rng.normal(size=(500, 8))],
        }
    )
    df = spark.createDataFrame(pdf, "g string, e array<float>")
    spec = [SketchSpec("f", "fd", "e", {"d": 8, "ell": 8})]
    sa = build_sketches(df, spec, group_by="g")
    sb = build_sketches(
        df.withColumn("e", F.expr("transform(e, x -> x * CAST(2.0 AS FLOAT))")),
        spec, group_by="g",
    )
    out = corpus_drift_df(spark, sa, sb, r=3).toPandas()
    aff = out[out["metric"] == "subspace_affinity"]
    assert len(aff) == 1 and aff.iloc[0]["value_a"] > 0.99  # pure scaling: same subspace
    eig0 = out[out["metric"] == "cov_eig_0"].iloc[0]
    # eigenvalues scale ×4 under ×2 data, within the summed certificates
    lo = 4 * eig0["value_a"] - eig0["bound"]
    hi = 4 * (eig0["value_a"] + eig0["bound"]) + eig0["bound"]
    assert lo <= eig0["value_b"] + eig0["bound"] and eig0["value_b"] <= hi


def test_kind_mismatch_raises_clearly(spark):
    """Review fix: a name re-registered with a different sketch kind must
    raise a clear error, not crash deep in metric math or silently sum
    bounds of different sketches."""
    import pytest

    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import corpus_drift_df

    df = spark.range(100).selectExpr("cast(id as double) as x", "'s' as src")
    a = build_sketches(df, [SketchSpec("q", "kll", "x", {"k": 200})], group_by="src")
    b = build_sketches(df, [SketchSpec("q", "hll", "x")], group_by="src")
    with pytest.raises(ValueError, match="kind mismatch"):
        corpus_drift_df(spark, a, b)


def test_fd_dim_mismatch_raises_clearly(spark):
    import pytest

    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import corpus_drift_df

    rows3 = [([1.0, 2.0, 3.0], "s")] * 10
    rows4 = [([1.0, 2.0, 3.0, 4.0], "s")] * 10
    d3 = spark.createDataFrame(rows3, "emb array<double>, src string")
    d4 = spark.createDataFrame(rows4, "emb array<double>, src string")
    a = build_sketches(d3, [SketchSpec("f", "fd", "emb", {"d": 3, "ell": 8})], group_by="src")
    b = build_sketches(d4, [SketchSpec("f", "fd", "emb", {"d": 4, "ell": 8})], group_by="src")
    with pytest.raises(ValueError, match="fd geometry mismatch"):
        corpus_drift_df(spark, a, b)


def test_mg_contributes_mass_drift(spark):
    """Misra-Gries tracks total update mass exactly, same as CM — the
    drift report must not silently skip the kind (round-5 review)."""
    specs = [_SPECS[1], SketchSpec("mg", "mg", "v", {"k": 64})]
    sa = build_sketches(_df(spark, 2000), specs, group_by="g")
    sb = build_sketches(_df(spark, 4000), specs, group_by="g")
    out = corpus_drift_df(spark, sa, sb).toPandas()
    mg = out[out["sketch"] == "mg"]
    assert set(mg["metric"]) == {"mass"}
    cm = out[out["sketch"] == "c"]
    assert sorted(mg["value_a"]) == sorted(cm["value_a"])
    assert sorted(mg["value_b"]) == sorted(cm["value_b"])
    assert (mg["bound"] == 0.0).all()
