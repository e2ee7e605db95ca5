"""GROUP BY ROLLUP / CUBE — grouping sets from one finest-grain build.

Contracts under test:
- sketch-served aggregates answer every grouping set by MERGING the
  finest-grain states (regroup_states) — so the rollup's total row must be
  byte-equal to an ungrouped statement's answer (merge associativity), and
  every row must land within the sketch's own bound vs exact;
- ``grouping_lvl`` is the SQL GROUPING() bitmask (leftmost column = MSB),
  row-compatible with DuckDB/Spark ``GROUP BY ROLLUP`` + ``GROUPING()``;
- sampling aggregates recurse per grouping set over the same seed-fixed
  sample, each row within its CLT bound;
- persisted states registered at the finest grain serve the whole rollup
  (and refuse coarser-grain registrations, WHERE, and non-finest grains);
- aliased / multi-aggregate / non-skeleton rollups refuse loudly.
"""

import numpy as np
import pandas as pd
import pytest

from sketchlib.spark.catalog import SketchCatalog
from sketchlib.sql import approx_sql, explain_sql

ORDERS = "/root/testdata/sf0.001/orders.parquet"


@pytest.fixture(scope="module")
def T():
    return {"t": ORDERS}


@pytest.fixture(scope="module")
def exact(T):
    pdf = pd.read_parquet(ORDERS)
    return pdf


def test_rollup_hll_two_cols_vs_exact(spark, T, exact):
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
        "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)",
        tables=T,
    ).toPandas()
    k2 = exact.groupby(["o_orderstatus", "o_orderpriority"])["o_custkey"].nunique()
    k1 = exact.groupby("o_orderstatus")["o_custkey"].nunique()
    k0 = exact["o_custkey"].nunique()
    # row count = finest + subtotal + total, exactly like SQL ROLLUP
    assert len(out) == len(k2) + len(k1) + 1
    assert sorted(out["grouping_lvl"].unique()) == [0, 1, 3]
    for _, r in out.iterrows():
        if r["grouping_lvl"] == 0:
            truth = k2[(r["o_orderstatus"], r["o_orderpriority"])]
        elif r["grouping_lvl"] == 1:
            assert pd.isna(r["o_orderpriority"])
            truth = k1[r["o_orderstatus"]]
        else:
            assert pd.isna(r["o_orderstatus"]) and pd.isna(r["o_orderpriority"])
            truth = k0
        # 3-sigma on the reported per-sketch rse bound
        assert abs(r["estimate"] - truth) <= 3 * r["rse_bound"] * truth + 2


def test_rollup_total_equals_ungrouped_merge_associativity(spark, T):
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
        "GROUP BY ROLLUP(o_orderstatus)",
        tables=T,
    ).toPandas()
    total = float(out.loc[out["grouping_lvl"] == 1, "estimate"].iloc[0])
    flat = approx_sql(
        spark, "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t", tables=T
    ).toPandas()
    # merging all per-group states IS the global state (associativity) —
    # the estimates must agree exactly, not merely within bound
    assert total == pytest.approx(float(flat["estimate"].iloc[0]), rel=0, abs=1e-9)


def test_cube_percentile_all_sets(spark, T, exact):
    out = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(o_totalprice, 0.5) FROM t "
        "GROUP BY CUBE(o_orderstatus, o_orderpriority)",
        tables=T,
    ).toPandas()
    assert sorted(out["grouping_lvl"].unique()) == [0, 1, 2, 3]
    n2 = exact.groupby(["o_orderstatus", "o_orderpriority"]).ngroups
    n1 = exact["o_orderstatus"].nunique()
    nb = exact["o_orderpriority"].nunique()
    assert len(out) == n2 + n1 + nb + 1
    # spot-check the mask-2 set (o_orderstatus rolled, o_orderpriority kept)
    sub = out[out["grouping_lvl"] == 2]
    assert sub["o_orderstatus"].isna().all() and sub["o_orderpriority"].notna().all()
    for _, r in sub.iterrows():
        vals = np.sort(
            exact.loc[
                exact["o_orderpriority"] == r["o_orderpriority"], "o_totalprice"
            ].to_numpy()
        )
        lo = vals[max(0, int(np.floor((0.5 - r["rank_err_bound"]) * (len(vals) - 1))))]
        hi = vals[min(len(vals) - 1, int(np.ceil((0.5 + r["rank_err_bound"]) * (len(vals) - 1))))]
        assert lo <= r["value"] <= hi


def test_rollup_sampling_sum_within_bounds(spark, T, exact):
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(o_totalprice, 0.5) FROM t GROUP BY ROLLUP(o_orderstatus)",
        tables=T,
    ).toPandas()
    assert sorted(out["grouping_lvl"].unique()) == [0, 1]
    s1 = exact.groupby("o_orderstatus")["o_totalprice"].sum()
    s0 = exact["o_totalprice"].sum()
    for _, r in out.iterrows():
        truth = s0 if r["grouping_lvl"] else s1[r["o_orderstatus"]]
        assert abs(r["est_sum"] - truth) <= 3 * r["sum_err"]


def test_rollup_topk_per_set(spark, T, exact):
    out = approx_sql(
        spark,
        "SELECT APPROX_TOPK(o_custkey, 5) FROM t GROUP BY ROLLUP(o_orderstatus)",
        tables=T,
    ).toPandas()
    # 5 candidates per grouping set row-group
    assert (out.groupby("grouping_lvl").size() >= 5).all()
    total = out[out["grouping_lvl"] == 1]
    counts = exact["o_custkey"].value_counts()
    for _, r in total.iterrows():
        # CM overestimates by at most err_bound (one-sided)
        truth = int(counts.get(int(r["token"]), 0))
        assert truth <= r["est_count"] <= truth + r["err_bound"] + 1


def test_rollup_from_registered_states_finest_grain(spark, T, tmp_path):
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark,
        f"CREATE SKETCHES rs FROM {ORDERS} KINDS hll(o_custkey) "
        "GROUP BY o_orderstatus, o_orderpriority",
        catalog=cat,
    )
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
        "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)",
        tables=T, catalog=cat, catalog_key="rs",
    ).toPandas()
    assert sorted(out["grouping_lvl"].unique()) == [0, 1, 3]
    # base-free: the same statement with a bogus base mapping still answers
    out2 = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
        "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)",
        tables={"t": "/nonexistent/path"}, catalog=cat, catalog_key="rs",
    ).toPandas()
    assert np.allclose(
        np.sort(out["estimate"].to_numpy()), np.sort(out2["estimate"].to_numpy())
    )
    # a coarser statement grain must refuse (states are the finest grain)
    with pytest.raises(ValueError, match="FINEST grain"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
            "GROUP BY ROLLUP(o_orderstatus)",
            tables=T, catalog=cat, catalog_key="rs",
        )
    # WHERE cannot apply post-hoc to states
    with pytest.raises(ValueError, match="unfiltered"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t WHERE o_totalprice > 0 "
            "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)",
            tables=T, catalog=cat, catalog_key="rs",
        )


def test_rollup_scramble_key_recurses(spark, T, tmp_path):
    cat = SketchCatalog(spark, str(tmp_path / "cat2"))
    approx_sql(
        spark,
        f"CREATE SAMPLE us FROM {ORDERS} KIND uniform RATIO 0.5 SEED 7",
        catalog=cat,
    )
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(o_totalprice, 0.5) FROM t GROUP BY ROLLUP(o_orderstatus)",
        tables=T, catalog=cat, catalog_key="us",
    ).toPandas()
    assert sorted(out["grouping_lvl"].unique()) == [0, 1]
    assert "est_sum" in out.columns


def test_rollup_refusals(spark, T):
    with pytest.raises(ValueError, match="un-aliased"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(o_custkey) AS d FROM t "
            "GROUP BY ROLLUP(o_orderstatus)",
            tables=T,
        )
    with pytest.raises(ValueError, match="un-aliased"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(o_custkey), APPROX_COUNT(0.1) FROM t "
            "GROUP BY ROLLUP(o_orderstatus)",
            tables=T,
        )
    with pytest.raises(ValueError, match="duplicate column"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
            "GROUP BY ROLLUP(o_orderstatus, o_orderstatus)",
            tables=T,
        )


def test_grouping_sets_sketch_disjoint(spark, T, exact):
    # no set contains ALL key columns — the union (o_orderstatus,
    # o_orderpriority) is still the build grain and the bitmask base
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())",
        tables=T,
    ).toPandas()
    assert sorted(out["grouping_lvl"].unique()) == [1, 2, 3]
    n1 = exact["o_orderstatus"].nunique()
    n2 = exact["o_orderpriority"].nunique()
    assert len(out) == n1 + n2 + 1
    k0 = exact["o_custkey"].nunique()
    r = out[out["grouping_lvl"] == 3].iloc[0]
    assert abs(r["estimate"] - k0) <= 3 * r["rse_bound"] * k0 + 2
    sub = out[out["grouping_lvl"] == 2]
    assert sub["o_orderstatus"].isna().all() and sub["o_orderpriority"].notna().all()
    k2 = exact.groupby("o_orderpriority")["o_custkey"].nunique()
    for _, r in sub.iterrows():
        truth = k2[r["o_orderpriority"]]
        assert abs(r["estimate"] - truth) <= 3 * r["rse_bound"] * truth + 2


def test_grouping_sets_sampling_disjoint_types(spark, T, exact):
    # the dtype of each key column comes from whichever recursion kept it
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(o_totalprice, 0.5) FROM t "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))",
        tables=T,
    ).toPandas()
    assert sorted(out["grouping_lvl"].unique()) == [1, 2]
    s1 = exact.groupby("o_orderstatus")["o_totalprice"].sum()
    for _, r in out[out["grouping_lvl"] == 1].iterrows():
        assert abs(r["est_sum"] - s1[r["o_orderstatus"]]) <= 3 * r["sum_err"]


def test_grouping_sets_refusals(spark, T):
    with pytest.raises(ValueError, match="duplicate column"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
            "GROUP BY GROUPING SETS ((o_orderstatus, o_orderstatus))",
            tables=T,
        )
    with pytest.raises(ValueError, match="names no columns"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
            "GROUP BY GROUPING SETS (())",
            tables=T,
        )


def test_exact_rollup_passes_through(spark, T):
    out = approx_sql(
        spark,
        "SELECT o_orderstatus, COUNT(*) AS n FROM t GROUP BY ROLLUP(o_orderstatus)",
        tables=T,
    ).toPandas()
    assert len(out) == 4  # 3 statuses + total, straight Spark SQL (A4)


def test_explain_rollup_route(spark, T):
    ex = explain_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
        "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)",
        tables=T,
    ).toPandas()
    flat = " ".join(map(str, ex.to_numpy().ravel()))
    assert "approx_rollup" in flat and "state MERGE" in flat
    ex2 = explain_sql(
        spark,
        "SELECT APPROX_SUM(o_totalprice, 0.5) FROM t GROUP BY CUBE(o_orderstatus)",
        tables=T,
    ).toPandas()
    flat2 = " ".join(map(str, ex2.to_numpy().ravel()))
    assert "approx_rollup" in flat2 and "grouping set" in flat2
