"""Variational subsampling (`[paper:VerdictDB §3.2]`, subsample.py):
estimate identity with the closed-form path, CI coverage against exact
answers, degenerate-group behavior, and the ERROR BY SUBSAMPLING SQL tail
(routing, EXPLAIN parity, refusals)."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.sampling import (
    approx_agg_from_uniform_sample,
    uniform_sample,
)
from sketchlib.spark.subsample import (
    subsample_agg_from_uniform_sample,
    subsample_bivariate_from_uniform_sample,
    subsample_blocks,
)

Z_TEST = 3.29  # 99.9% two-sided — keeps seeded-sample tests deterministic-robust


@pytest.fixture(scope="module")
def li(spark):
    # unpersist on teardown: a cached FULL-schema lineitem scan would
    # substitute (cache-manager subtree match) into OTHER modules' plans
    # against the same path, defeating their pruning plan-locks
    df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def li_sample(spark, li):
    return uniform_sample(li, 0.1, seed=7).cache()


def test_subsample_blocks_rule():
    # the paper's b ≈ n^0.3, clamped
    assert subsample_blocks(10) == 16  # clamp low
    assert subsample_blocks(100_000) == round(100_000 ** 0.3)
    assert subsample_blocks(10 ** 20) == 4096  # clamp high


def test_estimates_match_closed_form(spark, li_sample):
    """The two estimators differ ONLY in the error columns: est_count/
    est_sum/est_avg/est_variance/est_stddev are the same totals and the
    same stable pooled moments, so they agree to float noise."""
    cf = approx_agg_from_uniform_sample(
        li_sample, "l_returnflag", "l_extendedprice", 0.1, moments=True
    ).toPandas().set_index("l_returnflag").sort_index()
    ss = subsample_agg_from_uniform_sample(
        li_sample, "l_returnflag", "l_extendedprice", 0.1, moments=True
    ).toPandas().set_index("l_returnflag").sort_index()
    for c in ("est_count", "est_sum", "est_avg", "est_variance", "est_stddev"):
        np.testing.assert_allclose(ss[c], cf[c], rtol=1e-9, err_msg=c)


def test_subsample_agg_within_ci(spark, li, li_sample):
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_extendedprice").alias("s"),
             F.avg("l_extendedprice").alias("a"),
             F.var_samp("l_extendedprice").alias("v"))
        .collect()
    }
    rows = subsample_agg_from_uniform_sample(
        li_sample, "l_returnflag", "l_extendedprice", 0.1, z=Z_TEST, moments=True
    ).collect()
    assert len(rows) == len(exact)
    for r in rows:
        e = exact[r["l_returnflag"]]
        assert r["count_err"] is not None and r["count_err"] > 0
        assert abs(r["est_count"] - e["n"]) <= r["count_err"], (r, e["n"])
        assert abs(r["est_sum"] - e["s"]) <= r["sum_err"], (r, e["s"])
        assert abs(r["est_avg"] - e["a"]) <= r["avg_err"] + 1e-9, (r, e["a"])
        assert abs(r["est_variance"] - e["v"]) <= r["variance_err"], (r, e["v"])
        # and the spread-based bound is a bound, not a blowup: ≤ 25% rel
        assert r["count_err"] / e["n"] < 0.25


def test_subsample_bivariate_within_ci(spark):
    rng = np.random.default_rng(11)
    n = 150_000
    g = rng.integers(0, 3, n)
    x = rng.normal(10, 2, n)
    y = 0.6 * x + rng.normal(0, 1.5, n)
    pdf = pd.DataFrame({"g": g, "x": x, "y": y})
    full = spark.createDataFrame(pdf)
    samp = uniform_sample(full, 0.2, seed=5)
    rows = subsample_bivariate_from_uniform_sample(
        samp, "g", "x", "y", 0.2, z=Z_TEST
    ).collect()
    for r in rows:
        sub = pdf[pdf.g == r["g"]]
        cov, corr = sub.x.cov(sub.y), sub.x.corr(sub.y)
        assert abs(r["est_covar"] - cov) <= r["covar_err"], (r, cov)
        assert abs(r["est_corr"] - corr) <= r["corr_err"], (r, corr)
        assert abs(r["est_corr"]) <= 1.0


def test_few_blocks_null_error_estimate_served(spark):
    """< 4 nonempty blocks → the error column is NULL (a quantile over 1–3
    spread points is noise) but the estimate itself is still served."""
    pdf = pd.DataFrame({"g": ["a"] * 2000 + ["b"] * 2, "x": 1.0})
    samp = spark.createDataFrame(pdf)  # treat as an already-drawn p=0.5 sample
    rows = {
        r["g"]: r
        for r in subsample_agg_from_uniform_sample(samp, "g", "x", 0.5, b=64).collect()
    }
    assert rows["a"]["sum_err"] is not None
    assert rows["b"]["sum_err"] is None  # 2 rows in 64 blocks: ≤ 2 nonempty
    assert rows["b"]["est_sum"] == pytest.approx(2 / 0.5)


def test_full_ratio_zero_error(spark):
    """p=1: the sample IS the table; the (1−p) finite-population factor
    zeroes every error column, matching the closed-form bounds."""
    pdf = pd.DataFrame({"x": np.arange(5000, dtype=float)})
    samp = spark.createDataFrame(pdf)
    r = subsample_agg_from_uniform_sample(samp, None, "x", 1.0).collect()[0]
    assert r["est_count"] == 5000
    assert r["count_err"] == 0.0 and r["sum_err"] == 0.0 and r["avg_err"] == 0.0


def test_sql_tail_on_the_fly_and_catalog(spark, li, tmp_path):
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    t = {"li": "/root/testdata/sf0.01/lineitem.parquet"}
    exact = {
        r["l_returnflag"]: r["a"]
        for r in li.groupBy("l_returnflag").agg(F.avg("l_quantity").alias("a")).collect()
    }
    # on-the-fly (explicit ratio): 1.96σ CI — allow 3.29/1.96 headroom
    wide = 3.29 / 1.96
    rows = approx_sql(
        spark,
        "SELECT APPROX_AVG(l_quantity, 0.2) FROM li GROUP BY l_returnflag "
        "ERROR BY SUBSAMPLING",
        t,
    ).collect()
    for r in rows:
        assert abs(r["est_avg"] - exact[r["l_returnflag"]]) <= wide * r["avg_err"]

    # catalog route: auto-selected uniform scramble, no ratio in the statement
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, "CREATE SAMPLE ss_li FROM li KIND uniform RATIO 0.2 SEED 3", t, cat)
    props = {
        r["property"]: r["value"]
        for r in approx_sql(
            spark,
            "EXPLAIN SELECT APPROX_AVG(l_quantity) FROM li GROUP BY l_returnflag "
            "ERROR BY SUBSAMPLING",
            t, cat,
        ).collect()
    }
    assert "variational subsampling" in props["error_estimator"]
    assert props["route"].startswith("persisted_sample (uniform")
    assert props["artifact"] == "ss_li"
    rows = approx_sql(
        spark,
        "SELECT APPROX_AVG(l_quantity) FROM li GROUP BY l_returnflag "
        "ERROR BY SUBSAMPLING",
        t, cat,
    ).collect()
    for r in rows:
        assert abs(r["est_avg"] - exact[r["l_returnflag"]]) <= wide * r["avg_err"]

    # alias + ORDER BY tail compose around the modifier
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(l_quantity) AS q FROM li GROUP BY l_returnflag "
        "ORDER BY q DESC LIMIT 2 ERROR BY SUBSAMPLING",
        t, cat,
    )
    assert out.columns == ["l_returnflag", "q", "q_err"]
    got = out.collect()
    assert len(got) == 2 and got[0]["q"] >= got[1]["q"]


def test_sql_tail_skips_stratified_and_states(spark, tmp_path):
    """Resolution under ERROR BY SUBSAMPLING is uniform-scrambles-only:
    a stratified sample and a sketch set registered for the same table are
    both passed over for the uniform one."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql, resolve_catalog_key

    t = {"li": "/root/testdata/sf0.01/lineitem.parquet"}
    cat = SketchCatalog(spark, str(tmp_path / "cat2"))
    approx_sql(
        spark,
        "CREATE SAMPLE strat_li FROM li KIND stratified ON l_returnflag "
        "FRACTIONS '{\"A\": 0.5, \"N\": 0.5, \"R\": 0.5}'",
        t, cat,
    )
    approx_sql(spark, "CREATE SAMPLE uni_li FROM li KIND uniform RATIO 0.1", t, cat)
    stmt = "SELECT APPROX_COUNT(*) FROM li GROUP BY l_returnflag"
    # closed-form routing prefers the group-keyed stratified scramble...
    assert resolve_catalog_key(spark, stmt, t, cat) == "strat_li"
    # ...the subsample estimator must take the uniform one
    assert resolve_catalog_key(spark, stmt + " ERROR BY SUBSAMPLING", t, cat) == "uni_li"
    r = approx_sql(spark, stmt + " ERROR BY SUBSAMPLING", t, cat).collect()
    assert all(row["count_err"] is not None for row in r)


def test_sql_tail_refusals_and_explain_parity(spark, tmp_path):
    """Every unsupported combination raises a descriptive ValueError AND
    EXPLAIN reports the same refusal as an error row (never a traceback,
    never a silent fallback to the closed-form bounds)."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    t = {
        "li": "/root/testdata/sf0.01/lineitem.parquet",
        "ord": "/root/testdata/sf0.01/orders.parquet",
    }
    cat = SketchCatalog(spark, str(tmp_path / "cat3"))
    bad = [
        "SELECT APPROX_COUNT_DISTINCT(l_suppkey) FROM li ERROR BY SUBSAMPLING",
        "SELECT APPROX_PERCENTILE(l_quantity, 0.5) FROM li ERROR BY SUBSAMPLING",
        "SELECT APPROX_SUM(l_quantity) FROM li WITHIN 1% ERROR ERROR BY SUBSAMPLING",
        "SELECT APPROX_SUM(l_quantity, 0.1), APPROX_AVG(l_quantity, 0.1) FROM li "
        "ERROR BY SUBSAMPLING",
        "SELECT l_returnflag, COUNT(*) FROM li GROUP BY l_returnflag "
        "ERROR BY SUBSAMPLING",
        "SELECT APPROX_SUM(l_extendedprice, 0.1) FROM li JOIN ord "
        "ON li.l_orderkey = ord.o_orderkey ERROR BY SUBSAMPLING",
        "SELECT APPROX_COUNT_DISTINCT(v) FROM "
        "(SELECT l_suppkey AS v FROM li UNION SELECT o_custkey AS v FROM ord) "
        "ERROR BY SUBSAMPLING",
    ]
    for stmt in bad:
        with pytest.raises(ValueError):
            approx_sql(spark, stmt, t, cat)
        props = {
            r["property"]: r["value"]
            for r in approx_sql(spark, "EXPLAIN " + stmt, t, cat).collect()
        }
        errs = [v for k, v in props.items() if k.endswith("error")]
        assert errs, f"EXPLAIN shows no error for: {stmt}\n{props}"


def test_subsample_percentile_within_ci(spark):
    """Value-unit quantile CIs — the closed-form path only bounds RANK
    error; the subsample spread folds the density in without estimating
    it. Lognormal data (skewed, heavy-tailed) per group + global."""
    from sketchlib.spark.subsample import subsample_percentile_from_uniform_sample

    rng = np.random.default_rng(5)
    n = 200_000
    pdf = pd.DataFrame({"g": rng.integers(0, 3, n), "x": rng.lognormal(3.0, 0.8, n)})
    samp = uniform_sample(spark.createDataFrame(pdf), 0.1, seed=9)
    rows = subsample_percentile_from_uniform_sample(
        samp, "g", "x", [0.5, 0.9], 0.1, z=Z_TEST
    ).collect()
    assert len(rows) == 6
    for r in rows:
        truth = float(np.quantile(pdf[pdf.g == r["g"]].x, r["q"]))
        assert r["value_err"] is not None and r["value_err"] > 0
        assert abs(r["value"] - truth) <= r["value_err"], (r, truth)
    g = subsample_percentile_from_uniform_sample(
        samp, None, "x", [0.5], 0.1, z=Z_TEST
    ).collect()[0]
    assert abs(g["value"] - float(np.quantile(pdf.x, 0.5))) <= g["value_err"]


def test_sql_percentile_subsample_catalog(spark, li, tmp_path):
    """SQL door: APPROX_PERCENTILE + ERROR BY SUBSAMPLING answers from the
    registered uniform scramble with value-unit CIs; the VALUE estimate is
    identical to the closed-form path's (same exact sample percentile);
    on-the-fly and rank_err combinations refuse with EXPLAIN parity."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    t = {"li": "/root/testdata/sf0.01/lineitem.parquet"}
    cat = SketchCatalog(spark, str(tmp_path / "catp"))
    approx_sql(spark, "CREATE SAMPLE pct_li FROM li KIND uniform RATIO 0.3 SEED 2", t, cat)
    stmt = ("SELECT APPROX_PERCENTILE(l_extendedprice, 0.5, 0.9) FROM li "
            "GROUP BY l_returnflag")
    cf = {(r["l_returnflag"], r["q"]): r["value"]
          for r in approx_sql(spark, stmt, t, cat).collect()}
    ss = approx_sql(spark, stmt + " ERROR BY SUBSAMPLING", t, cat).collect()
    exact = {
        (r["l_returnflag"], q): r[f"p{int(q * 100)}"]
        for r in li.groupBy("l_returnflag").agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        ).collect()
        for q in (0.5, 0.9)
    }
    assert len(ss) == len(cf)
    wide = 3.29 / 1.96
    for r in ss:
        k = (r["l_returnflag"], r["q"])
        assert r["value"] == pytest.approx(cf[k], rel=1e-12)  # same estimate
        assert abs(r["value"] - exact[k]) <= wide * r["value_err"], (r, exact[k])

    # aliased: the bound is VALUE-unit, so the companion is <alias>_err
    # (the closed-form alias would be <alias>_rank_err)
    al = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(l_extendedprice, 0.5) AS med FROM li "
        "ERROR BY SUBSAMPLING",
        t, cat,
    )
    assert al.columns == ["q", "med", "med_err"]

    for bad in [
        # on-the-fly (no registered scramble for this fresh catalog dir)
        ("SELECT APPROX_PERCENTILE(l_extendedprice, 0.5) FROM li "
         "ERROR BY SUBSAMPLING", None),
        # rank_err + subsampling is a double accuracy spec
        ("SELECT APPROX_PERCENTILE(l_extendedprice, 0.5, rank_err=0.01) "
         "FROM li ERROR BY SUBSAMPLING", cat),
    ]:
        stmt_bad, c = bad
        with pytest.raises(ValueError):
            approx_sql(spark, stmt_bad, t, c)
        props = {
            r["property"]: r["value"]
            for r in approx_sql(spark, "EXPLAIN " + stmt_bad, t, c).collect()
        }
        assert any(k.endswith("error") for k in props), (stmt_bad, props)


def test_count_distinct_universe_subsample(spark, li, tmp_path):
    """COUNT(DISTINCT) from a universe scramble under the modifier: the
    sample's distinct values are a Bernoulli(p) sample of the value
    domain, so the row-count subsample estimator applies to them.
    Estimate identical to the closed-form route; exact within CI; grouped
    too; on-the-fly and explicit-rse combinations refuse with EXPLAIN
    parity."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    t = {"li": "/root/testdata/sf0.01/lineitem.parquet"}
    cat = SketchCatalog(spark, str(tmp_path / "catcd"))
    approx_sql(
        spark,
        "CREATE SAMPLE cd_li FROM li KIND universe RATIO 0.25 ON l_partkey SEED 5",
        t, cat,
    )
    stmt = "SELECT APPROX_COUNT_DISTINCT(l_partkey) FROM li"
    cf = approx_sql(spark, stmt, t, cat, catalog_key="cd_li").collect()[0]
    ss = approx_sql(spark, stmt + " ERROR BY SUBSAMPLING", t, cat).collect()[0]
    assert ss["est_distinct"] == pytest.approx(cf["est_distinct"], rel=1e-12)
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    wide = 3.29 / 1.96
    assert abs(ss["est_distinct"] - exact) <= wide * ss["distinct_err"], (ss, exact)

    grouped = approx_sql(
        spark, stmt + " GROUP BY l_returnflag ERROR BY SUBSAMPLING", t, cat
    ).collect()
    exact_g = {
        r["l_returnflag"]: r["d"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d")).collect()
    }
    assert {r["l_returnflag"] for r in grouped} == set(exact_g)
    for r in grouped:
        assert (abs(r["est_distinct"] - exact_g[r["l_returnflag"]])
                <= wide * r["distinct_err"]), (r, exact_g[r["l_returnflag"]])

    for bad, c in [
        (stmt + " ERROR BY SUBSAMPLING", None),  # no registered scramble
        ("SELECT APPROX_COUNT_DISTINCT(l_partkey, 0.005) FROM li "
         "ERROR BY SUBSAMPLING", cat),  # explicit rse = double spec
    ]:
        with pytest.raises(ValueError):
            approx_sql(spark, bad, t, c)
        props = {
            r["property"]: r["value"]
            for r in approx_sql(spark, "EXPLAIN " + bad, t, c).collect()
        }
        assert any(k.endswith("error") for k in props), (bad, props)


def test_count_distinct_null_groups_and_explain_column_parity(spark, tmp_path):
    """Pass-4 review regressions: (a) a group whose sampled values are all
    NULL reports (0, 0) like the closed-form route instead of vanishing;
    (b) EXPLAIN with an explicit catalog_key naming a universe sample on a
    DIFFERENT column reports the same refusal execution raises."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.spark.subsample import (
        subsample_count_distinct_from_universe_sample,
    )
    from sketchlib.sql import approx_sql

    pdf = pd.DataFrame({
        "g": ["a"] * 3000 + ["x"] * 50,
        "v": [float(i % 500) for i in range(3000)] + [None] * 50,
    })
    samp = spark.createDataFrame(pdf)  # treat as an already-drawn p=0.5 sample
    rows = {r["g"]: r for r in
            subsample_count_distinct_from_universe_sample(samp, "g", "v", 0.5).collect()}
    assert set(rows) == {"a", "x"}
    assert rows["x"]["est_distinct"] == 0.0 and rows["x"]["distinct_err"] == 0.0
    assert rows["a"]["est_distinct"] == pytest.approx(500 / 0.5)

    t = {"li": "/root/testdata/sf0.01/lineitem.parquet"}
    cat = SketchCatalog(spark, str(tmp_path / "catcol"))
    approx_sql(
        spark,
        "CREATE SAMPLE cdc_li FROM li KIND universe RATIO 0.25 ON l_partkey SEED 5",
        t, cat,
    )
    stmt = "SELECT APPROX_COUNT_DISTINCT(l_suppkey) FROM li ERROR BY SUBSAMPLING"
    with pytest.raises(ValueError, match="universe sample on"):
        approx_sql(spark, stmt, t, cat, catalog_key="cdc_li")
    props = {
        r["property"]: r["value"]
        for r in approx_sql(spark, "EXPLAIN " + stmt, t, cat,
                            catalog_key="cdc_li").collect()
    }
    errs = [v for k, v in props.items() if k.endswith("error")]
    assert errs and "universe sample on" in " ".join(errs), props


def test_percentile_null_group_survives(spark):
    """A NULL GROUP BY key is a real group: the block↔full join is
    null-safe, so the NULL group appears in the output exactly like the
    closed-form paths (which use groupBy/Window and keep it)."""
    from sketchlib.spark.subsample import subsample_percentile_from_uniform_sample

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"g": ["a"] * 4000 + [None] * 4000,
                        "x": rng.normal(10, 2, 8000)})
    samp = spark.createDataFrame(pdf)  # treat as an already-drawn p=0.5 sample
    rows = subsample_percentile_from_uniform_sample(
        samp, "g", "x", [0.5], 0.5
    ).collect()
    keys = {r["g"] for r in rows}
    assert keys == {"a", None}, keys
    for r in rows:
        assert r["value_err"] is not None and r["value_err"] > 0


def test_where_resizes_blocks_from_filtered_sample(spark, tmp_path):
    """Under a selective WHERE, b must come from the FILTERED sample's row
    count — the registered (unfiltered) count would oversize b until blocks
    hold ~1 row and the quantile spread measures the data, not the
    estimator. Locked by coverage: the filtered-percentile CI must cover
    the exact filtered answer."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    rng = np.random.default_rng(13)
    n = 400_000
    pdf = pd.DataFrame({
        "k": rng.integers(0, 100, n),  # k = 7 keeps ~1% of rows
        "x": rng.normal(50, 10, n),
    })
    base = str(tmp_path / "t")
    spark.createDataFrame(pdf).write.parquet(base)
    t = {"t": base}
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, "CREATE SAMPLE w_t FROM t KIND uniform RATIO 0.5 SEED 1", t, cat)
    sub = pdf[pdf.k == 7]
    wide = 3.29 / 1.96
    r = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(x, 0.5) FROM t WHERE k = 7 ERROR BY SUBSAMPLING",
        t, cat,
    ).collect()[0]
    truth = float(np.quantile(sub.x, 0.5))
    assert abs(r["value"] - truth) <= wide * r["value_err"], (r, truth)
    # the filtered sample has ~2000 rows → b ≈ 16-ish; an unfiltered-count
    # b (≈ 40+) with ~50-row blocks would also pass coverage, so lock the
    # geometry too: the AVG statement's CI under WHERE stays calibrated
    # (not degenerate) as well
    ra = approx_sql(
        spark,
        "SELECT APPROX_AVG(x) FROM t WHERE k = 7 ERROR BY SUBSAMPLING",
        t, cat,
    ).collect()[0]
    assert abs(ra["est_avg"] - sub.x.mean()) <= wide * ra["avg_err"]


def test_states_catalog_key_refuses_subsample(spark, tmp_path):
    """An EXPLICIT catalog_key naming a sketch-states set must refuse the
    modifier (states hold no rows) — serving the KLL rank bound would be
    the silent closed-form fallback the modifier forbids. EXPLAIN mirrors."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    t = {"li": "/root/testdata/sf0.01/lineitem.parquet"}
    cat = SketchCatalog(spark, str(tmp_path / "cats"))
    approx_sql(spark, "CREATE SKETCHES st_li FROM li KINDS kll(l_quantity)", t, cat)
    stmt = "SELECT APPROX_PERCENTILE(l_quantity, 0.5) FROM li ERROR BY SUBSAMPLING"
    with pytest.raises(ValueError, match="sketch-states"):
        approx_sql(spark, stmt, t, cat, catalog_key="st_li")
    props = {
        r["property"]: r["value"]
        for r in approx_sql(spark, "EXPLAIN " + stmt, t, cat,
                            catalog_key="st_li").collect()
    }
    assert any(k.endswith("error") for k in props), props


def test_nonexistent_key_message_and_confidence_stub(spark, tmp_path):
    """Pass-2 review regressions: (a) a typo'd explicit catalog_key under
    the modifier gets the no-such-artifact message, not 'is a sketch-states
    set'; (b) the natural spelling WITH a confidence clause ('WITHIN 1% AT
    CONFIDENCE 99% ERROR BY SUBSAMPLING') also names the real conflict."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    t = {"li": "/root/testdata/sf0.01/lineitem.parquet"}
    cat = SketchCatalog(spark, str(tmp_path / "catnk"))
    with pytest.raises(ValueError, match="no sketch set or sample"):
        approx_sql(spark, "SELECT APPROX_SUM(l_quantity) FROM li ERROR BY SUBSAMPLING",
                   t, cat, catalog_key="no_such_key")
    with pytest.raises(ValueError, match="cannot be combined"):
        approx_sql(
            spark,
            "SELECT APPROX_SUM(l_quantity) FROM li WITHIN 1% AT CONFIDENCE 99% "
            "ERROR BY SUBSAMPLING",
            t,
        )


def test_unionall_subsample_where_sized_from_filtered_union(spark, tmp_path):
    """Side-local WHEREs filter the union — b must come from the filtered
    frame, not the sides' registered counts (the single-table WHERE fix,
    applied to the UNION ALL route). Locked by CI coverage of the exact
    filtered answer."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    rng = np.random.default_rng(21)
    n = 150_000
    frames = {}
    for name in ("ua", "ub"):
        pdf = pd.DataFrame({"k": rng.integers(0, 100, n),
                            "v": rng.normal(40, 8, n)})
        d = str(tmp_path / name)
        spark.createDataFrame(pdf).write.parquet(d)
        frames[name] = (d, pdf)
    t = {k: v[0] for k, v in frames.items()}
    cat = SketchCatalog(spark, str(tmp_path / "catu"))
    cat.create_sample("uw_a", t["ua"], kind="uniform", ratio=0.5)
    cat.create_sample("uw_b", t["ub"], kind="uniform", ratio=0.5)
    r = approx_sql(
        spark,
        "SELECT APPROX_AVG(v, 0.4) FROM "
        "(SELECT v FROM ua WHERE k = 7 UNION ALL SELECT v FROM ub WHERE k = 7) "
        "ERROR BY SUBSAMPLING",
        t, cat,
    ).collect()[0]
    both = pd.concat([frames["ua"][1], frames["ub"][1]])
    truth = both[both.k == 7].v.mean()
    assert r["avg_err"] is not None
    assert abs(r["est_avg"] - truth) <= (3.29 / 1.96) * r["avg_err"], (r, truth)


def test_explain_mirrors_where_on_states_key(spark, tmp_path):
    """Pass-3 review regression (pre-existing, independent of the
    subsample modifier): an explicit catalog_key naming a sketch-states
    set combined with WHERE raises in execution — EXPLAIN must report the
    same refusal, not a confident persisted_sketch_states route."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    t = {"li": "/root/testdata/sf0.01/lineitem.parquet"}
    cat = SketchCatalog(spark, str(tmp_path / "catw"))
    approx_sql(spark, "CREATE SKETCHES stw_li FROM li KINDS kll(l_quantity)", t, cat)
    stmt = "SELECT APPROX_PERCENTILE(l_quantity, 0.5) FROM li WHERE l_suppkey = 7"
    with pytest.raises(ValueError, match="post-hoc"):
        approx_sql(spark, stmt, t, cat, catalog_key="stw_li")
    props = {
        r["property"]: r["value"]
        for r in approx_sql(spark, "EXPLAIN " + stmt, t, cat,
                            catalog_key="stw_li").collect()
    }
    errs = [v for k, v in props.items() if k.endswith("error")]
    assert errs and "post-hoc" in " ".join(errs), props


def test_within_natural_spelling_names_the_conflict(spark):
    """'WITHIN 1% ERROR BY SUBSAMPLING' (the natural spelling — one ERROR
    keyword) must raise the dedicated cannot-combine message, not a generic
    'unsupported statement' after the tail eats the contract's keyword."""
    from sketchlib.sql import approx_sql

    t = {"li": "/root/testdata/sf0.01/lineitem.parquet"}
    stmt = "SELECT APPROX_SUM(l_quantity) FROM li WITHIN 1% ERROR BY SUBSAMPLING"
    with pytest.raises(ValueError, match="cannot be combined"):
        approx_sql(spark, stmt, t)
    props = {
        r["property"]: r["value"]
        for r in approx_sql(spark, "EXPLAIN " + stmt, t).collect()
    }
    assert "cannot be combined" in " ".join(
        v for k, v in props.items() if k.endswith("error")
    ), props


def test_sql_tail_unionall_sample_route(spark, tmp_path):
    """UNION ALL over equal-ratio persisted uniform scrambles honors the
    modifier: the concatenated Bernoulli(p) sample feeds the subsample
    estimator, bases never read (deleted before querying)."""
    import shutil

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    ca, cb = str(tmp_path / "ta"), str(tmp_path / "tb")
    (spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
     .selectExpr("o_totalprice AS v").write.parquet(ca))
    (spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
     .selectExpr("l_extendedprice AS v").write.parquet(cb))
    exact = (spark.read.parquet(ca).unionAll(spark.read.parquet(cb))
             .agg(F.sum("v")).collect()[0][0])
    cat = SketchCatalog(spark, str(tmp_path / "cat4"))
    cat.create_sample("ssua_a", ca, kind="uniform", ratio=0.3)
    cat.create_sample("ssua_b", cb, kind="uniform", ratio=0.3)
    shutil.rmtree(ca)
    shutil.rmtree(cb)
    r = approx_sql(
        spark,
        "SELECT APPROX_SUM(v, 0.2) FROM "
        "(SELECT v FROM ta UNION ALL SELECT v FROM tb) ERROR BY SUBSAMPLING",
        {"ta": ca, "tb": cb}, cat,
    ).collect()[0]
    assert r["sum_err"] is not None and r["sum_err"] > 0
    assert abs(r["est_sum"] - exact) <= (3.29 / 1.96) * r["sum_err"]
