"""freq_delta_topk_df — heaviest frequency CHANGES between two Count-Min
registrations (the vocabulary-drift companion to spectrum_drift_df).

CM is linear: x ≤ x̂ ≤ x + ε·N per side, so the signed change estimate
d̂ = b̂ − â brackets the true change d within [−ε·Nₐ, +ε·N_b]. The tests
lock that bracket, the candidate-union recall of vanished/appeared tokens,
the geometry guard, and the one-sided-group NULL signal."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.build import SketchSpec, build_sketches
from sketchlib.spark.query import freq_delta_topk_df

_SPEC = [SketchSpec("c", "cm", "v", {"eps": 1e-3, "delta": 0.05})]


def _states(spark, pdf):
    df = spark.createDataFrame(pdf).withColumn("g", F.col("g").cast("string"))
    return build_sketches(df, _SPEC, group_by="g")


def _snapshots(rng):
    """Two snapshots over 2 groups with a known per-(group, token) shift:
    token 7 quadruples in g0, token 3 vanishes from g1, token 99 appears."""
    base = []
    for g in (0, 1):
        for tok in range(20):
            base.extend([(g, tok)] * (5 + tok))
    a = pd.DataFrame(base, columns=["g", "v"])
    b_rows = []
    for g, tok in base:
        if g == 1 and tok == 3:
            continue  # vanishes
        b_rows.append((g, tok))
    b_rows.extend([(0, 7)] * 36)   # 12 → 48 in g0
    b_rows.extend([(1, 99)] * 40)  # appears in g1
    b = pd.DataFrame(b_rows, columns=["g", "v"])
    return a, b


def test_delta_brackets_exact_and_ranks_injected_change(spark):
    a_pdf, b_pdf = _snapshots(np.random.default_rng(0))
    sa, sb = _states(spark, a_pdf), _states(spark, b_pdf)
    out = freq_delta_topk_df(spark, sa, sb, "c", "c", k=5).toPandas()

    ca = a_pdf.groupby(["g", "v"]).size()
    cb = b_pdf.groupby(["g", "v"]).size()
    na = a_pdf.groupby("g").size()
    nb = b_pdf.groupby("g").size()
    for _, r in out.iterrows():
        g, tok = int(r["group"]), int(r["token"])
        d_true = int(cb.get((g, tok), 0)) - int(ca.get((g, tok), 0))
        diff = int(r["delta_est"]) - d_true
        # asymmetric CM bracket, and the reported symmetric bound
        assert -1e-3 * na[g] <= diff <= 1e-3 * nb[g]
        assert abs(diff) <= r["err_bound"]
    # injected top changes are rank 1 in their group (|Δ|=36 and 40/45)
    by_mag = lambda sub: sub.sort_values(
        "delta_est", key=lambda s: s.abs(), ascending=False
    )
    g0 = by_mag(out[out["group"] == "0"]).iloc[0]
    assert int(g0["token"]) == 7 and int(g0["delta_est"]) > 0
    g1 = by_mag(out[out["group"] == "1"]).iloc[0]
    assert int(g1["token"]) in (99, 3)  # appeared (+40) or vanished (−8): +40 wins
    assert int(g1["token"]) == 99


def test_vanished_token_surfaces_negative(spark):
    a_pdf, b_pdf = _snapshots(np.random.default_rng(1))
    sa, sb = _states(spark, a_pdf), _states(spark, b_pdf)
    out = freq_delta_topk_df(spark, sa, sb, "c", "c", k=40).toPandas()
    g1 = out[(out["group"] == "1") & (out["token"] == 3)]
    assert len(g1) == 1 and int(g1.iloc[0]["delta_est"]) == -8
    assert int(g1.iloc[0]["est_b"]) <= 1e-3 * len(b_pdf)  # absent side ≈ 0


def test_geometry_mismatch_raises(spark):
    a_pdf, b_pdf = _snapshots(np.random.default_rng(2))
    sa = _states(spark, a_pdf)
    other = [SketchSpec("c", "cm", "v", {"eps": 1e-3, "delta": 0.05, "seed": 99})]
    sb = build_sketches(
        spark.createDataFrame(b_pdf).withColumn("g", F.col("g").cast("string")),
        other, group_by="g",
    )
    with pytest.raises(ValueError, match="geometry/seed mismatch"):
        freq_delta_topk_df(spark, sa, sb, "c", "c")


def test_one_sided_group_emits_null_row(spark):
    a_pdf, b_pdf = _snapshots(np.random.default_rng(3))
    sa = _states(spark, a_pdf)
    sb = _states(spark, b_pdf[b_pdf["g"] == 0])  # group 1 vanished entirely
    out = freq_delta_topk_df(spark, sa, sb, "c", "c", k=3).toPandas()
    lone = out[out["group"] == "1"]
    assert len(lone) == 1 and pd.isna(lone.iloc[0]["token"])
    assert not out[out["group"] == "0"]["token"].isna().any()


def test_unknown_sketch_name_raises(spark):
    a_pdf, b_pdf = _snapshots(np.random.default_rng(4))
    sa, sb = _states(spark, a_pdf), _states(spark, b_pdf)
    with pytest.raises(ValueError, match="no cm states"):
        freq_delta_topk_df(spark, sa, sb, "nope", "c")


def test_delta_invariant_under_regrouping(spark):
    """North-rule merge property: states built under different partition
    layouts are byte-identical, so the drift report is EXACTLY the same
    frame whatever the cluster shape was."""
    a_pdf, b_pdf = _snapshots(np.random.default_rng(5))
    out1 = freq_delta_topk_df(
        spark, _states(spark, a_pdf), _states(spark, b_pdf), "c", "c", k=7
    ).toPandas()
    df_a = (
        spark.createDataFrame(a_pdf).withColumn("g", F.col("g").cast("string"))
        .repartition(13)
    )
    df_b = (
        spark.createDataFrame(b_pdf).withColumn("g", F.col("g").cast("string"))
        .repartition(3, "v")
    )
    out2 = freq_delta_topk_df(
        spark, build_sketches(df_a, _SPEC, group_by="g"),
        build_sketches(df_b, _SPEC, group_by="g"), "c", "c", k=7,
    ).toPandas()
    key = ["group", "token"]
    pd.testing.assert_frame_equal(
        out1.sort_values(key).reset_index(drop=True),
        out2.sort_values(key).reset_index(drop=True),
    )
