"""Weighted Count-Min heavy hitters BY SUM — SketchSpec(weight=...) feed +
the APPROX_TOP_SUM SQL surface.

The reference sketch surface (SURVEY.md B3/B4) answers "top keys by COUNT";
the weighted feed answers the sibling Verdict-style question "SELECT key,
SUM(w) ... ORDER BY 2 DESC LIMIT k" from the same mergeable CM state: each
row adds its weight to the key's cell, so the ε·N bound holds with N = ΣW
(Cormode & Muthukrishnan 2005 — the update analysis never uses unit
increments).
"""

import numpy as np
import pandas as pd
import pytest

from sketchlib.sketches.cm import CountMin
from sketchlib.spark.build import SketchSpec, _weighted_group_pairs, build_sketches
from sketchlib.spark.query import load_states, topk_df

LI = "/root/testdata/sf0.01/lineitem.parquet"


# ---------------------------------------------------------------- kernel --


def test_weighted_pairs_aggregates_per_group():
    keys = np.array([1, 2, 1, 3, 2, 1], dtype=np.int64)
    w = np.array([10, 1, 5, 7, 2, 1], dtype=np.int64)
    codes = np.array([0, 0, 0, 1, 1, 1], dtype=np.int32)
    uk, ws, st = _weighted_group_pairs(keys, w, codes, 2, "t")
    g0 = dict(zip(uk[st[0]:st[1]].tolist(), ws[st[0]:st[1]].tolist()))
    g1 = dict(zip(uk[st[1]:st[2]].tolist(), ws[st[1]:st[2]].tolist()))
    assert g0 == {1: 15, 2: 1}
    assert g1 == {3: 7, 2: 2, 1: 1}


def test_weighted_pairs_null_rows_excluded():
    keys = np.array([1.0, np.nan, 2.0])  # nullable int arrives as float+NaN
    w = np.array([5.0, 3.0, np.nan])
    uk, ws, _ = _weighted_group_pairs(keys, w, np.zeros(3, np.int32), 1, "t")
    # non-int key dtype → hashed (same rule as the unweighted CM path), so
    # only check the surviving weight mass: rows 2 and 3 are excluded
    assert ws.sum() == 5


def test_weighted_pairs_negative_and_fractional_refuse():
    k = np.array([1, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="negative weight"):
        _weighted_group_pairs(k, np.array([1.0, -2.0]), np.zeros(2, np.int32), 1, "t")
    with pytest.raises(ValueError, match="fractional weight"):
        _weighted_group_pairs(k, np.array([1.0, 2.5]), np.zeros(2, np.int32), 1, "t")


def test_spec_weight_needs_frequency_sketch():
    # cm and mg carry weighted-update semantics; everything else refuses
    with pytest.raises(ValueError, match="frequency sketch"):
        SketchSpec("x", "hll", "a", {}, weight="w")
    SketchSpec("x", "mg", "a", {}, weight="w")  # allowed


def test_weighted_cm_never_undercounts_and_merge_invariant(rng):
    keys = rng.integers(0, 500, size=20_000).astype(np.int64)
    w = rng.integers(0, 100, size=20_000).astype(np.int64)
    true = pd.Series(w).groupby(pd.Series(keys)).sum()

    whole = CountMin(eps=1e-3, delta=0.05)
    uk, ws, _ = _weighted_group_pairs(keys, w, np.zeros(len(keys), np.int32), 1, "t")
    whole.update_values(uk, counts=ws)

    # arbitrary re-chunking merges to the identical table (mergeability
    # under weighted updates — the property the map-side build relies on)
    acc = CountMin(eps=1e-3, delta=0.05)
    for lo, hi in [(0, 3_000), (3_000, 3_001), (3_001, 20_000)]:
        part = CountMin(eps=1e-3, delta=0.05)
        uk, ws, _ = _weighted_group_pairs(
            keys[lo:hi], w[lo:hi], np.zeros(hi - lo, np.int32), 1, "t"
        )
        if len(uk):
            part.update_values(uk, counts=ws)
        acc.merge(part)
    assert np.array_equal(whole.table, acc.table)
    assert whole.total == acc.total == int(w.sum())

    est = whole.query(true.index.to_numpy())
    assert (est >= true.to_numpy()).all()
    # the ε·ΣW overcount bound is PER-QUERY with probability ≥ 1−δ (δ=0.05)
    # — over 500 keys a handful of collisions-in-all-rows overshoots are
    # expected; assert the failure fraction, not uniformity
    frac_over = float((est - true.to_numpy() > whole.error_bound()).mean())
    assert frac_over <= 0.05


# ----------------------------------------------------------- spark build --


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(LI)


def _exact_top(li, k, group=None):
    from pyspark.sql import functions as F

    g = ([group] if group else []) + ["l_orderkey"]
    df = li.groupBy(*g).agg(F.sum("l_quantity").alias("s"))
    pdf = df.toPandas()
    out = {}
    for gval, sub in (pdf.groupby(group) if group else [("", pdf)]):
        sub = sub.sort_values(["s", "l_orderkey"], ascending=[False, True])
        out[gval] = list(zip(sub["l_orderkey"].head(k), sub["s"].head(k).astype(int)))
    return out


def test_build_map_equals_shuffle_and_matches_exact(spark, li):
    spec = SketchSpec("cm_w", "cm", "l_orderkey", {"eps": 1e-4, "delta": 0.01},
                      weight="l_quantity")
    st_map = build_sketches(li, [spec], group_by=None)
    st_shf = build_sketches(li, [spec], group_by=None, strategy="shuffle")
    a = topk_df(spark, st_map, "cm_w", 10).toPandas()
    b = topk_df(spark, st_shf, "cm_w", 10).toPandas()
    pd.testing.assert_frame_equal(a, b)
    # eps=1e-4 on 60k rows: the clearly-separated head is exact; deeper
    # ranks can swap under ≤ ε·ΣW overcounts, so check containment there
    exact = _exact_top(li, 10)[""]
    got = list(zip(a["token"].tolist(), a["est_count"].tolist()))
    assert [t for t, _ in got[:5]] == [t for t, _ in exact[:5]]
    true_sum = dict(_exact_top(li, 10**9)[""])
    bound = float(a["err_bound"].iloc[0])
    for t, est in got:
        assert true_sum[t] <= est <= true_sum[t] + bound


def test_grouped_build_per_group_sums(spark, li):
    spec = SketchSpec("cm_w", "cm", "l_orderkey", {"eps": 1e-4, "delta": 0.01},
                      weight="l_quantity")
    states = build_sketches(li, [spec], group_by="l_returnflag")
    sks = {g: sk for (g, _), sk in load_states(states).items()}
    from pyspark.sql import functions as F

    exact = (
        li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("w"))
        .toPandas()
        .set_index("l_returnflag")["w"]
    )
    for g, sk in sks.items():
        assert sk.total == int(exact[g])  # per-group ΣW lands in the right state


def test_weight_column_pruned_into_scan(spark, li):
    # the narrow select must carry the weight column — a missing column
    # raises loudly in the kernel, so a successful build is the check; also
    # assert only the two referenced columns are read
    from sketchlib.spark.build import partial_states

    # plan-text assertion: a cached full-schema scan of the same path from
    # another module would substitute into this plan and mask the pruning
    spark.catalog.clearCache()
    spec = SketchSpec("cm_w", "cm", "l_orderkey", {"eps": 1e-3, "delta": 0.05},
                      weight="l_quantity")
    plan = partial_states(li, [spec], group_by=None)._jdf.queryExecution().toString()
    rs = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs  # unreferenced columns pruned from the scan


# ------------------------------------------------------------- sql door --


@pytest.fixture(scope="module")
def T():
    return {"lineitem": LI}


def test_sql_on_the_fly_matches_exact_order(spark, li, T):
    from sketchlib.sql import approx_sql

    out = approx_sql(
        spark, "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 5) FROM lineitem",
        tables=T,
    ).toPandas()
    assert list(out.columns) == ["token", "est_sum", "err_bound"]
    exact = _exact_top(li, 5)[""]
    assert out["token"].tolist() == [t for t, _ in exact]
    assert (out["est_sum"].to_numpy() >= np.array([s for _, s in exact])).all()


def test_sql_alias_and_grouped(spark, T):
    from sketchlib.sql import approx_sql

    out = approx_sql(
        spark,
        "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 3) AS qty FROM lineitem",
        tables=T,
    )
    assert list(out.columns) == ["token", "qty", "qty_err"]
    g = approx_sql(
        spark,
        "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 2) FROM lineitem "
        "GROUP BY l_returnflag",
        tables=T,
    ).toPandas()
    assert set(g.columns) == {"group", "token", "est_sum", "err_bound"}
    assert g.groupby("group").size().max() <= 2


def test_sql_arg_validation(spark, T):
    from sketchlib.sql import approx_sql

    with pytest.raises(ValueError, match="positive integer"):
        approx_sql(spark, "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, x) FROM lineitem", tables=T)
    with pytest.raises(ValueError, match="key, weight, k"):
        approx_sql(spark, "SELECT APPROX_TOP_SUM(l_orderkey) FROM lineitem", tables=T)
    with pytest.raises(ValueError, match="eps argument"):
        approx_sql(spark, "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 5, z) FROM lineitem", tables=T)
    # a fractional weight column is refused in the KERNEL (executor-side),
    # so the descriptive message arrives wrapped in Spark's task failure
    with pytest.raises(Exception, match="fractional weight"):
        approx_sql(
            spark,
            "SELECT APPROX_TOP_SUM(l_orderkey, l_extendedprice, 5) FROM lineitem",
            tables=T,
        ).collect()


def test_catalog_routing_and_separation(spark, T, tmp_path):
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark,
        "CREATE SKETCHES ts FROM lineitem KINDS cm(l_orderkey, weight=l_quantity)",
        tables=T, catalog=cat,
    )
    stmt = "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 5) FROM lineitem"
    ex = dict(approx_sql(spark, "EXPLAIN " + stmt, tables=T, catalog=cat).collect())
    assert "persisted_sketch_states" in ex["route"] and ex["artifact"] == "ts"
    a = approx_sql(spark, stmt, tables=T, catalog=cat).toPandas()
    b = approx_sql(spark, stmt, tables=T).toPandas()
    pd.testing.assert_frame_equal(a, b)  # states-served == on-the-fly

    # APPROX_TOPK must NOT serve from the weighted set (counts ≠ weights)
    ex2 = dict(
        approx_sql(
            spark, "EXPLAIN SELECT APPROX_TOPK(l_orderkey, 5) FROM lineitem",
            tables=T, catalog=cat,
        ).collect()
    )
    assert "on_the_fly" in ex2["route"]
    # a mismatched weight column refuses the explicit key
    with pytest.raises(ValueError, match="serving APPROX_TOP_SUM"):
        approx_sql(
            spark,
            "SELECT APPROX_TOP_SUM(l_orderkey, l_partkey, 5) FROM lineitem",
            tables=T, catalog=cat, catalog_key="ts",
        )


def test_eps_gating_on_states_route(spark, T, tmp_path):
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    cat = SketchCatalog(spark, str(tmp_path / "cat2"))
    approx_sql(
        spark,
        "CREATE SKETCHES loose FROM lineitem KINDS "
        "cm(l_orderkey, eps=0.01, weight=l_quantity)",
        tables=T, catalog=cat,
    )
    tight = "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 5, 0.001) FROM lineitem"
    ex = dict(approx_sql(spark, "EXPLAIN " + tight, tables=T, catalog=cat).collect())
    assert "on_the_fly" in ex["route"]  # loose states can't achieve 1e-3
    loose = "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 5, 0.05) FROM lineitem"
    ex2 = dict(approx_sql(spark, "EXPLAIN " + loose, tables=T, catalog=cat).collect())
    assert "persisted_sketch_states" in ex2["route"]
    # same gate for APPROX_TOPK (unweighted), via a second registration
    approx_sql(
        spark,
        "CREATE SKETCHES plain FROM lineitem KINDS cm(l_orderkey, eps=0.01)",
        tables=T, catalog=cat,
    )
    ex3 = dict(
        approx_sql(
            spark,
            "EXPLAIN SELECT APPROX_TOPK(l_orderkey, 5, 0.001) FROM lineitem",
            tables=T, catalog=cat,
        ).collect()
    )
    assert "on_the_fly" in ex3["route"]


def test_within_contract_rewrites_eps(spark, T):
    from sketchlib.sql import approx_sql

    out = approx_sql(
        spark,
        "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 5) FROM lineitem "
        "WITHIN 1% ERROR",
        tables=T,
    ).toPandas()
    # ε = 0.01, ΣW = the table's total quantity
    from pyspark.sql import functions as F

    w_total = spark.read.parquet(LI).agg(F.sum("l_quantity")).collect()[0][0]
    assert np.allclose(out["err_bound"], 0.01 * float(w_total))
    with pytest.raises(ValueError, match="ONE accuracy spec"):
        approx_sql(
            spark,
            "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 5, 0.01) FROM lineitem "
            "WITHIN 1% ERROR",
            tables=T,
        )


def test_refresh_preserves_weight(spark, T, tmp_path):
    """Catalog refresh reconstructs the spec WITH its weight column —
    dropping it would silently merge count-states into sum-states."""
    import shutil

    from pyspark.sql import functions as F

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    d = str(tmp_path / "li")
    base = spark.read.parquet(LI).limit(2_000)
    base.write.parquet(d)
    cat = SketchCatalog(spark, str(tmp_path / "cat3"))
    approx_sql(
        spark,
        "CREATE SKETCHES ts FROM lineitem KINDS cm(l_orderkey, weight=l_quantity)",
        tables={"lineitem": d}, catalog=cat,
    )
    spark.read.parquet(LI).limit(4_000).subtract(base).limit(1_000).write.mode(
        "append"
    ).parquet(d)
    cat.refresh("ts")
    served = approx_sql(
        spark,
        "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 5) FROM lineitem",
        tables={"lineitem": d}, catalog=cat, catalog_key="ts",
    ).toPandas()
    fresh = approx_sql(
        spark,
        "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 5) FROM lineitem",
        tables={"lineitem": d},
    ).toPandas()
    pd.testing.assert_frame_equal(served, fresh)
    shutil.rmtree(d, ignore_errors=True)


def test_exact_rescore_topk_weighted(spark, li):
    """The hybrid API variant: weighted-CM candidates re-scored by SUM —
    must EQUAL the true top-k by (SUM(w) DESC, key ASC)."""
    from pyspark.sql.window import Window

    from sketchlib.spark.query import exact_rescore_topk

    spec = SketchSpec("cm_w", "cm", "l_orderkey", {"eps": 1e-4, "delta": 0.01},
                      weight="l_quantity")
    states = build_sketches(li, [spec], group_by="l_returnflag")
    hybrid = exact_rescore_topk(
        li, states, "cm_w", 5, tokens_col="l_orderkey",
        group_by="l_returnflag", weight_col="l_quantity",
    ).toPandas()
    assert set(hybrid.columns) == {"group", "token", "exact_sum"}
    from pyspark.sql import functions as F

    w = Window.partitionBy("group").orderBy(F.desc("s"), F.asc("token"))
    truth = (
        li.select(F.col("l_returnflag").alias("group"),
                  F.col("l_orderkey").alias("token"), "l_quantity")
        .groupBy("group", "token")
        .agg(F.sum("l_quantity").cast("long").alias("s"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .toPandas()
    )
    key = lambda d, c: {  # noqa: E731
        g: sorted(zip(sub["token"], sub[c])) for g, sub in d.groupby("group")
    }
    assert key(hybrid, "exact_sum") == key(truth, "s")


def test_exact_rescore_topk_unweighted_unchanged(spark, li):
    """Regression guard: the unweighted hybrid still emits exact_count."""
    from pyspark.sql import functions as F

    from sketchlib.spark.query import exact_rescore_topk

    docs_like = li.select(
        "l_returnflag", F.array("l_suppkey").alias("toks")
    )
    spec = SketchSpec("cm_s", "cm", "toks", {"eps": 1e-3, "delta": 0.05})
    states = build_sketches(docs_like, [spec], group_by="l_returnflag")
    out = exact_rescore_topk(
        docs_like, states, "cm_s", 3, tokens_col="toks", group_by="l_returnflag"
    ).toPandas()
    assert set(out.columns) == {"group", "token", "exact_count"}
    assert out.groupby("group").size().max() <= 3


def test_join_rows_never_served_by_weighted_cm(spark, T, tmp_path):
    """Regression (review): APPROX_JOIN_ROWS must not resolve a weighted CM
    — its cells hold SUM(w), so the inner product would price the join in
    weight units (~25x inflated here)."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    cat = SketchCatalog(spark, str(tmp_path / "jr"))
    approx_sql(
        spark,
        "CREATE SKETCHES wset FROM lineitem KINDS cm(l_orderkey, weight=l_quantity)",
        tables=T, catalog=cat,
    )
    stmt = ("SELECT APPROX_JOIN_ROWS(a.l_orderkey, b.l_orderkey) "
            "FROM lineitem a, lineitem b")
    ex = dict(approx_sql(spark, "EXPLAIN " + stmt, tables=T, catalog=cat).collect())
    assert "on-the-fly" in ex["route"]  # weighted set skipped
    # an UNWEIGHTED registration then serves
    approx_sql(
        spark, "CREATE SKETCHES uset FROM lineitem KINDS cm(l_orderkey)",
        tables=T, catalog=cat,
    )
    ex2 = dict(approx_sql(spark, "EXPLAIN " + stmt, tables=T, catalog=cat).collect())
    assert "persisted" in ex2["route"]
    assert "uset" in (ex2.get("states_a", "") + ex2.get("states_b", ""))


def test_unionall_merge_never_served_by_weighted_cm(spark, T, tmp_path):
    """Regression (review): the UNION ALL merged-states route for
    APPROX_TOPK must skip weighted CM specs (SUM cells are not counts)."""
    import shutil

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    d1, d2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    li = spark.read.parquet(LI).limit(4_000)
    li.write.parquet(d1)
    li.write.parquet(d2)
    t = {"t1": d1, "t2": d2}
    cat = SketchCatalog(spark, str(tmp_path / "um"))
    for name, tbl in (("w1", "t1"), ("w2", "t2")):
        approx_sql(
            spark,
            f"CREATE SKETCHES {name} FROM {tbl} KINDS cm(l_orderkey, weight=l_quantity)",
            tables=t, catalog=cat,
        )
    stmt = ("SELECT APPROX_TOPK(l_orderkey, 3) FROM "
            "(SELECT l_orderkey FROM t1 UNION ALL SELECT l_orderkey FROM t2)")
    ex = dict(approx_sql(spark, "EXPLAIN " + stmt, tables=t, catalog=cat).collect())
    # weighted sets must NOT claim the merge route — the statement falls to
    # the generic derived-table path (reported as derived_table)
    assert ex["statement_kind"] == "derived_table"
    out = approx_sql(spark, stmt, tables=t, catalog=cat).toPandas()
    # and the answer is COUNTS: every count ≤ rows in the unioned bag
    assert (out["est_count"] <= 8_000).all()
    shutil.rmtree(d1, ignore_errors=True)
    shutil.rmtree(d2, ignore_errors=True)


def test_grouped_states_auto_route(spark, T, tmp_path):
    """Grouped registrations serve grouped APPROX_TOP_SUM statements —
    the generic group-match rule applies to the weighted kind too."""
    import pandas as pd

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    cat = SketchCatalog(spark, str(tmp_path / "gts"))
    approx_sql(
        spark,
        "CREATE SKETCHES gset FROM lineitem KINDS cm(l_orderkey, weight=l_quantity) "
        "GROUP BY l_returnflag",
        tables=T, catalog=cat,
    )
    stmt = ("SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 3) FROM lineitem "
            "GROUP BY l_returnflag")
    ex = dict(approx_sql(spark, "EXPLAIN " + stmt, tables=T, catalog=cat).collect())
    assert "persisted_sketch_states" in ex["route"] and ex["artifact"] == "gset"
    a = approx_sql(spark, stmt, tables=T, catalog=cat).toPandas()
    b = approx_sql(spark, stmt, tables=T).toPandas()
    key = ["group", "token"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    # the UNGROUPED statement must not route to the grouped set
    ex2 = dict(approx_sql(
        spark, "EXPLAIN SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 3) FROM lineitem",
        tables=T, catalog=cat,
    ).collect())
    assert "on_the_fly" in ex2["route"]
