"""approx_sql front door: the Verdict-style SQL query set end-to-end."""

import numpy as np
import pytest

from sketchlib.sql import approx_sql


@pytest.fixture(scope="module")
def tables(seq_tiny_dir):
    return {"sequences": seq_tiny_dir}


def test_count_distinct_group_by(spark, tables):
    out = approx_sql(
        spark, "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source", tables
    ).toPandas()
    assert set(out["group"]) == {"web", "books", "code", "wiki", "forums"}
    assert abs(out["estimate"].sum() - 2000) / 2000 < 0.05
    assert (out["rse_bound"] <= 0.01 + 1e-12).all()  # default rse budget honored


def test_where_is_full_spark_sql(spark, tables):
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences "
        "WHERE n_tok > 500 AND source IN ('web', 'books') GROUP BY source",
        tables,
    ).toPandas()
    assert set(out["group"]) == {"web", "books"}


def test_global_no_group(spark, tables):
    out = approx_sql(spark, "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences", tables).toPandas()
    assert len(out) == 1 and "group" not in out.columns
    assert abs(out["estimate"][0] - 2000) / 2000 <= 3 * out["rse_bound"][0] + 0.01


def test_topk_and_percentile(spark, tables):
    top = approx_sql(
        spark, "SELECT APPROX_TOPK(tokens, 5) FROM sequences GROUP BY source", tables
    ).toPandas()
    assert (top.groupby("group").size() == 5).all()
    q = approx_sql(
        spark, "SELECT APPROX_PERCENTILE(n_tok, 0.5, 0.99) FROM sequences GROUP BY source", tables
    ).toPandas()
    assert set(q["q"]) == {0.5, 0.99}
    p50_web = q[(q["group"] == "web") & (q["q"] == 0.5)]["value"].iloc[0]
    assert 300 < p50_web < 800  # lognormal(ln 512, .6) median ≈ 512


def test_sampled_count_with_ci(spark, tables):
    out = approx_sql(
        spark, "SELECT APPROX_COUNT(0.5) FROM sequences GROUP BY source", tables
    ).toPandas()
    web = out[out["source"] == "web"].iloc[0]
    assert abs(web["est_count"] - 1584) <= 3 * web["count_err"]


def test_from_path_directly(spark, seq_tiny_dir):
    out = approx_sql(
        spark, f"SELECT APPROX_COUNT_DISTINCT(doc_id) FROM {seq_tiny_dir} GROUP BY source"
    ).toPandas()
    assert len(out) == 5


def test_unsupported_statement_rejected(spark, tables):
    # an APPROX statement outside the skeleton is rejected by US (with a
    # pointer to the DataFrame API), not handed to Spark to mis-parse
    with pytest.raises(ValueError, match="unsupported statement"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT(0.5) FROM sequences CLUSTER BY doc_id",
            tables,
        )
    with pytest.raises(ValueError, match="unknown approximate aggregate"):
        approx_sql(spark, "SELECT APPROX_MEDIAN_WRONG(x) FROM sequences", tables)
    # a statement with NO approx aggregate passes through to Spark SQL —
    # its errors are Spark's own (unknown table), not a ValueError
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        approx_sql(spark, "SELECT a, b FROM nonexistent_passthrough_tbl", tables)


def test_approx_sql_answers_from_catalog_states_only(spark, tmp_path, seq_tiny_dir):
    """A5 substitution end-to-end: once states are registered, the statement
    is answered WITHOUT the base table — proven by deleting it first."""
    import shutil

    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    base = str(tmp_path / "base")
    shutil.copytree(seq_tiny_dir, base)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("docs", base, [SketchSpec("hll_doc", "hll", "doc_id", {"p": 12})], group_by="source")
    shutil.rmtree(base)  # base table GONE — any scan of it would fail loudly

    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM docs GROUP BY source",
        catalog=cat,
        catalog_key="docs",
    ).toPandas()
    assert set(out["group"]) == {"web", "books", "code", "wiki", "forums"}
    assert abs(out["estimate"].sum() - 2000) / 2000 < 0.1


def test_approx_sql_catalog_mismatches_raise(spark, tmp_path, seq_tiny_dir):
    """Opt-in to states must never silently rebuild: any statement the
    registered sketch set can't serve raises with the reason."""
    import pytest as _pytest

    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat2"))
    cat.create(
        "docs", seq_tiny_dir, [SketchSpec("hll_doc", "hll", "doc_id", {"p": 12})], group_by="source"
    )
    with _pytest.raises(ValueError, match="WHERE"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM docs WHERE n_tok > 5 GROUP BY source",
            catalog=cat,
            catalog_key="docs",
        )
    with _pytest.raises(ValueError, match="group_by"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM docs",
            catalog=cat,
            catalog_key="docs",
        )
    with _pytest.raises(ValueError, match="no hll"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(n_tok) FROM docs GROUP BY source",
            catalog=cat,
            catalog_key="docs",
        )
    with _pytest.raises(ValueError, match="no sketch set"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM docs GROUP BY source",
            catalog=cat,
            catalog_key="nope",
        )


def test_multi_aggregate_statement_one_pass(spark, tables):
    """Verdict-style SELECT lists: several scalar approx aggregates in one
    statement; the sketch aggregates share ONE build pass and the answers
    match the single-statement results."""
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id), APPROX_SUM(n_tok, 0.5), APPROX_COUNT(0.5) "
        "FROM sequences GROUP BY source",
        tables,
    ).toPandas()
    assert len(out) == 5
    assert {"approx_count_distinct_doc_id", "approx_sum_n_tok", "approx_count_star"} <= set(out.columns)
    assert {"approx_count_distinct_doc_id_err", "approx_sum_n_tok_err"} <= set(out.columns)
    single = approx_sql(
        spark, "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source", tables
    ).toPandas().set_index("group")["estimate"]
    m = out.set_index("source") if "source" in out.columns else out.set_index("group")
    for g, v in single.items():
        assert m.loc[g, "approx_count_distinct_doc_id"] == v  # same build, same estimate

    # multi-row-shaped aggregates refuse to compose
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple rows"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(doc_id), APPROX_TOPK(tokens, 5) "
            "FROM sequences GROUP BY source",
            tables,
        )
    with _pytest.raises(ValueError, match="catalog_key"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(doc_id), APPROX_COUNT(0.5) FROM sequences GROUP BY source",
            tables, catalog=object(), catalog_key="x",
        )


def test_where_applies_to_persisted_sample_scan(spark, tmp_path, seq_tiny_dir):
    """Verdict applies predicates to the scramble scan: filtering commutes
    with Bernoulli sampling, so WHERE over a persisted sample keeps the same
    1/p scale-up and stays unbiased for the filtered population — while
    sketch STATES still reject WHERE."""
    import pyspark.sql.functions as F

    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    df = spark.read.parquet(seq_tiny_dir)
    cat = SketchCatalog(spark, str(tmp_path / "cat_w"))
    cat.create_sample("u", seq_tiny_dir, kind="uniform", ratio=0.5, seed=7)
    cat.create("states", seq_tiny_dir, [SketchSpec("h", "hll", "doc_id", {"p": 12})],
               group_by="source")

    exact = {
        r["source"]: r["n"]
        for r in df.filter("n_tok > 500").groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    out = approx_sql(
        spark, "SELECT APPROX_COUNT(0.0) FROM t WHERE n_tok > 500 GROUP BY source",
        catalog=cat, catalog_key="u",
    ).toPandas()
    for _, r in out.iterrows():
        assert abs(r["est_count"] - exact[r["source"]]) <= 3.3 * max(r["count_err"] / 1.96, 1) * 1.96

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unfiltered"):
        approx_sql(
            spark, "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM t WHERE n_tok > 500 GROUP BY source",
            catalog=cat, catalog_key="states",
        )


def test_expression_arguments(spark, tables):
    """Verdict accepted aggregate EXPRESSIONS, not just columns: expression
    args are projected to a derived column inside the same scan."""
    q = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(n_tok * 2, 0.5) FROM sequences GROUP BY source",
        tables,
    ).toPandas()
    plain = approx_sql(
        spark, "SELECT APPROX_PERCENTILE(n_tok, 0.5) FROM sequences GROUP BY source", tables
    ).toPandas()
    m = q.set_index("group")["value"] / plain.set_index("group")["value"]
    assert ((m - 2).abs() < 0.05).all()  # doubling the column doubles the median

    s = approx_sql(
        spark,
        "SELECT APPROX_SUM(round(n_tok, 0), 0.5) FROM sequences GROUP BY source",
        tables,
    ).toPandas()
    assert (s["est_sum"] > 0).all()  # nested parens parse; expression computes


def test_expression_args_over_persisted_sample(spark, tmp_path, seq_tiny_dir):
    """Review regression: expression arguments must materialize on the
    persisted-sample catalog path too (not just the base-table path)."""
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat_expr"))
    cat.create_sample("u", seq_tiny_dir, kind="uniform", ratio=0.5, seed=7)
    out = approx_sql(
        spark, "SELECT APPROX_SUM(n_tok * 2, 0.5) FROM t GROUP BY source",
        catalog=cat, catalog_key="u",
    ).toPandas()
    plain = approx_sql(
        spark, "SELECT APPROX_SUM(n_tok, 0.5) FROM t GROUP BY source",
        catalog=cat, catalog_key="u",
    ).toPandas()
    m = out.set_index("source")["est_sum"] / plain.set_index("source")["est_sum"]
    assert np.allclose(m.to_numpy(), 2.0)  # same persisted rows → exact factor 2


def test_multicol_group_by_sql(spark, tables):
    """GROUP BY a, b through the SQL front door: output carries one NATIVE-
    typed column per key, values match single-key slices."""
    from pyspark.sql import functions as F

    seqs = spark.read.parquet(tables["sequences"]).withColumn(
        "parity", F.pmod(F.xxhash64("doc_id"), F.lit(2)).cast("long")
    )
    t = {"seqs": seqs}
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id, 0.01) FROM seqs GROUP BY source, parity",
        t,
    ).toPandas()
    assert {"source", "parity", "estimate", "rse_bound"} <= set(out.columns)
    assert len(out) == 10  # 5 sources × 2 parities
    assert str(out["parity"].dtype) == "int64"  # native type restored
    # each (source, parity) estimate ≈ half the source's docs
    single = approx_sql(
        spark, "SELECT APPROX_COUNT_DISTINCT(doc_id, 0.01) FROM seqs GROUP BY source", t
    ).toPandas()
    per_src = dict(zip(single["group"], single["estimate"]))
    for _, r in out.iterrows():
        assert abs(r["estimate"] - per_src[r["source"]] / 2) <= 0.1 * per_src[r["source"]] + 3

    # multi-aggregate statements take composite keys too
    multi = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id), APPROX_SUM(n_tok, 0.5) "
        "FROM seqs GROUP BY source, parity",
        t,
    ).toPandas()
    assert len(multi) == 10 and {"source", "parity"} <= set(multi.columns)
    assert {c for c in multi.columns if c.startswith("approx_sum_n_tok")} == {
        "approx_sum_n_tok", "approx_sum_n_tok_err"
    }


def test_sample_ddl_lifecycle(spark, tables, tmp_path):
    """Verdict's literal entry points (SURVEY A2/A3) as SQL strings only:
    CREATE SAMPLE → SHOW SAMPLES → query it via catalog_key → DROP SAMPLE."""
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="SketchCatalog"):
        approx_sql(spark, "SHOW SAMPLES", tables)

    created = approx_sql(
        spark,
        "CREATE SAMPLE s1 FROM sequences KIND uniform RATIO 0.5 SEED 7",
        tables, catalog=cat,
    ).collect()
    assert len(created) == 1 and created[0]["kind"] == "uniform"
    assert created[0]["ratio"] == 0.5 and created[0]["seed"] == 7

    # duplicate without OR REPLACE refuses; OR REPLACE re-registers
    with pytest.raises(ValueError, match="already exists"):
        approx_sql(spark, "CREATE SAMPLE s1 FROM sequences KIND uniform RATIO 0.5",
                   tables, catalog=cat)
    approx_sql(spark, "CREATE OR REPLACE SAMPLE s1 FROM sequences KIND uniform RATIO 0.4",
               tables, catalog=cat).collect()

    approx_sql(spark, "CREATE SAMPLE s2 FROM sequences KIND universe RATIO 0.5 ON doc_id",
               tables, catalog=cat).collect()
    shown = {r["name"]: r for r in approx_sql(spark, "SHOW SAMPLES", tables, catalog=cat).collect()}
    assert set(shown) == {"s1", "s2"} and shown["s1"]["ratio"] == 0.4

    # the created sample actually answers approx queries (A5 substitution)
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.4) FROM sequences GROUP BY source",
        tables, catalog=cat, catalog_key="s1",
    ).toPandas()
    assert len(out) == 5 and (out["est_count"] > 0).all()

    dropped = approx_sql(spark, "DROP SAMPLE s2", tables, catalog=cat).collect()[0]
    assert dropped["name"] == "s2" and dropped["dropped"]
    assert {r["name"] for r in approx_sql(spark, "SHOW SAMPLES", tables, catalog=cat).collect()} == {"s1"}

    with pytest.raises(ValueError, match="unsupported DDL"):
        approx_sql(spark, "CREATE SAMPLE s3 FROM sequences", tables, catalog=cat)  # no KIND


def test_stratified_sample_ddl_with_fractions(spark, tables, tmp_path):
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    fr = '{"web": 0.5, "books": 0.5, "code": 0.5, "wiki": 0.5, "forums": 0.5}'
    row = approx_sql(
        spark,
        f"CREATE SAMPLE st FROM sequences KIND stratified ON source FRACTIONS '{fr}' SEED 3",
        tables, catalog=cat,
    ).collect()[0]
    assert row["kind"] == "stratified" and row["on_col"] == "source"


def test_approx_join_sql(spark, tmp_path):
    """Verdict's ApproxJoinedRelation through the SQL front door: direct
    mode universe-samples both sides (p-composition); catalog mode answers
    from two persisted universe scrambles sharing ratio+seed."""
    import numpy as np
    import pandas as pd

    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(5)
    fact = pd.DataFrame({"k": rng.integers(0, 200, 5000), "val": rng.uniform(0, 10, 5000).round(3)})
    dim = pd.DataFrame({"j": np.arange(200), "attr": ["x"] * 200})
    fpath, dpath = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.createDataFrame(fact).write.parquet(fpath)
    spark.createDataFrame(dim).write.parquet(dpath)
    t = {"fact": fpath, "dim": dpath}
    exact_n, exact_s = len(fact), float(fact["val"].sum())  # dim covers every key

    out = approx_sql(
        spark, "SELECT APPROX_SUM(val, 0.5) FROM fact JOIN dim ON fact.k = dim.j", t
    ).collect()[0]
    wide = 3.29 / 1.96  # widen the default 95% CI to ~3.3σ for a one-shot check
    assert abs(out["est_count"] - exact_n) <= out["count_err"] * wide
    assert abs(out["est_sum"] - exact_s) <= out["sum_err"] * wide

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, f"CREATE SAMPLE fs FROM {fpath} KIND universe RATIO 0.5 ON k SEED 9",
               catalog=cat).collect()
    approx_sql(spark, f"CREATE SAMPLE ds FROM {dpath} KIND universe RATIO 0.5 ON j SEED 9",
               catalog=cat).collect()
    out2 = approx_sql(
        spark, "SELECT APPROX_COUNT() FROM fact JOIN dim ON fact.k = dim.j", t,
        catalog=cat, catalog_key="fs,ds",
    ).collect()[0]
    assert abs(out2["est_count"] - exact_n) <= out2["count_err"] * wide

    # reversed ON qualifiers resolve to the same join
    out3 = approx_sql(
        spark, "SELECT APPROX_COUNT() FROM fact JOIN dim ON dim.j = fact.k", t,
        catalog=cat, catalog_key="fs,ds",
    ).collect()[0]
    assert out3["est_count"] == out2["est_count"]

    # mismatched seed breaks p-composition -> refused
    approx_sql(spark, f"CREATE SAMPLE ds2 FROM {dpath} KIND universe RATIO 0.5 ON j SEED 10",
               catalog=cat).collect()
    with pytest.raises(ValueError, match="share ratio and seed"):
        approx_sql(spark, "SELECT APPROX_COUNT() FROM fact JOIN dim ON fact.k = dim.j", t,
                   catalog=cat, catalog_key="fs,ds2")
    with pytest.raises(ValueError, match="not supported over a JOIN"):
        approx_sql(spark, "SELECT APPROX_PERCENTILE(val, 0.5) FROM fact JOIN dim ON fact.k = dim.j", t)


def test_sketch_set_ddl(spark, tables, tmp_path):
    """SHOW SKETCHES / DROP SKETCHES route to the sketch-set registry."""
    from sketchlib.spark import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("seqs", tables["sequences"], [SketchSpec("h", "hll", "doc_id", {"p": 12})])
    shown = approx_sql(spark, "SHOW SKETCHES", tables, catalog=cat).collect()
    assert [r["name"] for r in shown] == ["seqs"]
    dropped = approx_sql(spark, "DROP SKETCHES seqs", tables, catalog=cat).collect()[0]
    assert dropped["dropped"]
    assert approx_sql(spark, "SHOW SKETCHES", tables, catalog=cat).count() == 0


def test_multicol_group_from_catalog_states(spark, tables, tmp_path):
    """Composite GROUP BY answered from PERSISTED states (A5 + round-3 A9):
    the catalog registers group_by=['source','parity'], the statement's
    GROUP BY must match, and the answer comes from states with the keys
    split back into columns — base table never resolved."""
    from pyspark.sql import functions as F

    from sketchlib.spark import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    src = str(tmp_path / "seq2")
    spark.read.parquet(tables["sequences"]).withColumn(
        "parity", F.pmod(F.xxhash64("doc_id"), F.lit(2)).cast("string")
    ).write.parquet(src)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("s2", src, [SketchSpec("h", "hll", "doc_id", {"p": 12})],
               group_by=["source", "parity"])

    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM whatever GROUP BY source, parity",
        catalog=cat, catalog_key="s2",
    ).toPandas()
    assert {"source", "parity", "estimate"} <= set(out.columns)
    assert len(out) == 10
    assert abs(out["estimate"].sum() - 2000) / 2000 < 0.1

    with pytest.raises(ValueError, match="registered group_by"):
        approx_sql(spark, "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM w GROUP BY source",
                   catalog=cat, catalog_key="s2")


def test_grouped_approx_join_sql(spark, tmp_path):
    """GROUP BY on an approximate JOIN statement: per-group counts with CIs."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(8)
    fact = pd.DataFrame({
        "k": rng.integers(0, 300, 8000),
        "seg": rng.choice(["x", "y"], 8000),
    })
    dim = pd.DataFrame({"j": np.arange(300)})
    fpath, dpath = str(tmp_path / "f"), str(tmp_path / "d")
    spark.createDataFrame(fact).write.parquet(fpath)
    spark.createDataFrame(dim).write.parquet(dpath)
    t = {"fact": fpath, "dim": dpath}
    out = {r["seg"]: r for r in approx_sql(
        spark, "SELECT APPROX_COUNT(0.5) FROM fact JOIN dim ON fact.k = dim.j GROUP BY seg", t
    ).collect()}
    exact = fact.groupby("seg").size()
    wide = 3.29 / 1.96
    for seg in ("x", "y"):
        assert abs(out[seg]["est_count"] - exact[seg]) <= out[seg]["count_err"] * wide


def test_percentile_from_persisted_sample(spark, tables, tmp_path):
    """APPROX_PERCENTILE answered from a persisted uniform scramble (A12
    over samples): exact percentile of the sample rows, rank-error CI from
    the Bernoulli CLT; covered quantiles sit within 3σ rank error of exact."""
    import numpy as np

    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, "CREATE SAMPLE su FROM sequences KIND uniform RATIO 0.5 SEED 5",
               tables, catalog=cat).collect()
    out = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(n_tok, 0.5, 0.9) FROM sequences GROUP BY source",
        tables, catalog=cat, catalog_key="su",
    ).toPandas()
    assert len(out) == 5 * 2 and {"source", "q", "value", "rank_err_bound"} <= set(out.columns)

    exact = spark.read.parquet(tables["sequences"]).toPandas()
    for (src, q), sub in out.groupby(["source", "q"]):
        vals = np.sort(exact[exact["source"] == src]["n_tok"].to_numpy())
        v = float(sub["value"].iloc[0])
        # achieved rank of the estimate in the TRUE distribution
        lo = np.searchsorted(vals, v, "left") / len(vals)
        hi = np.searchsorted(vals, v, "right") / len(vals)
        err = max(lo - q, q - hi, 0.0)
        assert err <= float(sub["rank_err_bound"].iloc[0]) * (3 / 1.96) + 1.0 / len(vals)

    # WHERE commutes with row sampling on this path too
    w = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(n_tok, 0.5) FROM sequences WHERE source = 'web' GROUP BY source",
        tables, catalog=cat, catalog_key="su",
    ).toPandas()
    assert len(w) == 1 and w["source"].iloc[0] == "web"


def test_global_sampling_aggregates(spark, tables, tmp_path):
    """No-GROUP-BY sampling aggregates: one global row with CLT CI — direct,
    multi-aggregate, and persisted-sample paths."""
    from sketchlib.spark.catalog import SketchCatalog

    out = approx_sql(
        spark, "SELECT APPROX_SUM(n_tok, 0.5) FROM sequences", tables
    ).collect()[0]
    exact = spark.read.parquet(tables["sequences"]).agg({"n_tok": "sum"}).collect()[0][0]
    assert abs(out["est_sum"] - exact) <= out["sum_err"] * (3.29 / 1.96)

    multi = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id), APPROX_COUNT(0.5) FROM sequences",
        tables,
    ).collect()[0]
    assert abs(multi["approx_count_distinct_doc_id"] - 2000) / 2000 < 0.05
    assert abs(multi["approx_count_star"] - 2000) <= multi["approx_count_star_err"] * (3.29 / 1.96)

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, "CREATE SAMPLE gu FROM sequences KIND uniform RATIO 0.5 SEED 2",
               tables, catalog=cat).collect()
    g = approx_sql(spark, "SELECT APPROX_COUNT(0.5) FROM sequences",
                   tables, catalog=cat, catalog_key="gu").collect()[0]
    assert abs(g["est_count"] - 2000) <= g["count_err"] * (3.29 / 1.96)


def test_order_by_limit_passthrough(spark, tables):
    """ORDER BY / LIMIT carry through the rewrite (A14), applied to the
    estimate frame."""
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source "
        "ORDER BY estimate DESC LIMIT 2",
        tables,
    ).collect()
    assert len(out) == 2
    assert out[0]["estimate"] >= out[1]["estimate"]
    full = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source ORDER BY estimate DESC",
        tables,
    ).collect()
    assert [r["group"] for r in out] == [r["group"] for r in full[:2]]

    lim = approx_sql(
        spark, "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source LIMIT 3",
        tables,
    ).collect()
    assert len(lim) == 3


def test_stratified_global_aggregates(spark, tables, tmp_path):
    """Global COUNT/SUM/AVG from a stratified scramble: per-stratum HT
    totals summed, mean via the cross-strata ratio estimator with the
    delta-method CI — all within ~3.3σ of exact."""
    from pyspark.sql import functions as F

    from sketchlib.spark.catalog import SketchCatalog

    fr = '{"web": 0.3, "books": 1.0, "code": 0.6, "wiki": 1.0, "forums": 0.5}'
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark,
        f"CREATE SAMPLE st FROM sequences KIND stratified ON source FRACTIONS '{fr}' SEED 13",
        tables, catalog=cat,
    ).collect()
    exact = (
        spark.read.parquet(tables["sequences"])
        .agg(F.count("*").alias("n"), F.sum("n_tok").alias("s"), F.avg("n_tok").alias("a"))
        .collect()[0]
    )
    wide = 3.29 / 1.96
    g = approx_sql(spark, "SELECT APPROX_SUM(n_tok, 0.5) FROM sequences",
                   tables, catalog=cat, catalog_key="st").collect()[0]
    assert abs(g["est_sum"] - exact["s"]) <= g["sum_err"] * wide
    c = approx_sql(spark, "SELECT APPROX_COUNT(0.5) FROM sequences",
                   tables, catalog=cat, catalog_key="st").collect()[0]
    assert abs(c["est_count"] - exact["n"]) <= c["count_err"] * wide
    a = approx_sql(spark, "SELECT APPROX_AVG(n_tok, 0.5) FROM sequences",
                   tables, catalog=cat, catalog_key="st").collect()[0]
    assert abs(a["est_avg"] - exact["a"]) <= a["avg_err"] * wide


def test_exact_passthrough(spark, tables):
    """No APPROX_ aggregate → Verdict's middleware pass-through (A4): the
    statement runs on Spark SQL verbatim and matches the DataFrame answer."""
    from pyspark.sql import functions as F

    out = approx_sql(
        spark,
        "SELECT source, COUNT(*) AS n, SUM(n_tok) AS s FROM sequences "
        "GROUP BY source ORDER BY source",
        tables,
    ).toPandas()
    exact = (
        spark.read.parquet(tables["sequences"])
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_tok").alias("s"))
        .orderBy("source")
        .toPandas()
    )
    assert out.equals(exact)


def test_auto_routing(spark, tables, tmp_path):
    """Verdict's sample auto-selection: with a catalog but NO catalog_key,
    approx_sql picks the best registered artifact — states for unfiltered
    group-matched sketch aggregates, stratified-on-group for grouped
    sampling aggregates, largest-ratio otherwise, on-the-fly fallback."""
    from pyspark.sql import functions as F

    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import resolve_catalog_key

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create(
        "seq_states", tables["sequences"],
        [SketchSpec("h", "hll", "doc_id", {"p": 14})], group_by="source",
    )
    for ddl in (
        "CREATE SAMPLE u_small FROM sequences KIND uniform RATIO 0.2 SEED 7",
        "CREATE SAMPLE u_big FROM sequences KIND uniform RATIO 0.6 SEED 7",
        "CREATE SAMPLE uni FROM sequences KIND universe RATIO 0.5 ON doc_id SEED 7",
        "CREATE SAMPLE st FROM sequences KIND stratified ON source "
        "FRACTIONS '{\"web\": 0.4, \"books\": 1.0, \"code\": 0.6, \"wiki\": 1.0, "
        "\"forums\": 0.5}' SEED 7",
    ):
        approx_sql(spark, ddl, tables, catalog=cat).collect()

    base = spark.read.parquet(tables["sequences"])
    wide = 3.29 / 1.96  # CI columns are z=1.96; accept up to ~3.3 sigma

    # 1) unfiltered, group-matched COUNT DISTINCT → persisted states win
    q1 = "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source"
    assert resolve_catalog_key(spark, q1, tables, cat) == "seq_states"
    out1 = approx_sql(spark, q1, tables, catalog=cat).toPandas()
    assert "estimate" in out1.columns and len(out1) == 5  # states schema, not est_distinct

    # 2) WHERE blocks states → universe sample serves the filtered distinct
    q2 = "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences WHERE n_tok > 300"
    assert resolve_catalog_key(spark, q2, tables, cat) == "uni"
    est2 = approx_sql(spark, q2, tables, catalog=cat).collect()[0]
    exact2 = base.filter("n_tok > 300").agg(F.countDistinct("doc_id")).collect()[0][0]
    assert abs(est2["est_distinct"] - exact2) <= est2["distinct_err"] * wide

    # 3) grouped AVG keyed on the stratification column → stratified wins
    q3 = "SELECT APPROX_AVG(n_tok, 0.5) FROM sequences GROUP BY source"
    assert resolve_catalog_key(spark, q3, tables, cat) == "st"
    out3 = {r["source"]: r for r in approx_sql(spark, q3, tables, catalog=cat).collect()}
    exact3 = {r["source"]: r["a"] for r in
              base.groupBy("source").agg(F.avg("n_tok").alias("a")).collect()}
    for src, r in out3.items():
        assert abs(r["est_avg"] - exact3[src]) <= max(r["avg_err"] * wide, 1e-9)

    # 4) global filtered SUM → largest-ratio uniform sample
    q4 = "SELECT APPROX_SUM(n_tok, 0.5) FROM sequences WHERE source = 'web'"
    assert resolve_catalog_key(spark, q4, tables, cat) == "u_big"
    est4 = approx_sql(spark, q4, tables, catalog=cat).collect()[0]
    exact4 = base.filter("source = 'web'").agg(F.sum("n_tok")).collect()[0][0]
    assert abs(est4["est_sum"] - exact4) <= est4["sum_err"] * wide

    # 5) nothing registered fits (WHERE blocks the CM states path; no
    # sample serves TOPK) → silent fallback to an on-the-fly build
    q5 = "SELECT APPROX_TOPK(tokens, 5) FROM sequences WHERE n_tok > 0 GROUP BY source"
    assert resolve_catalog_key(spark, q5, tables, cat) is None
    out5 = approx_sql(spark, q5, tables, catalog=cat).toPandas()
    assert (out5.groupby("group").size() == 5).all()


def test_multi_agg_auto_routing(spark, tables, tmp_path):
    """Multi-aggregate auto-selection: every scalar aggregate in one
    statement answered from its own best artifact (HLL states for the
    distinct, the uniform scramble for SUM/COUNT), joined on the group key
    with _multi_agg's column conventions; dropping an artifact any
    aggregate needs makes the WHOLE statement fall back to one on-the-fly
    build over the base table."""
    from pyspark.sql import functions as F

    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create(
        "seq_states", tables["sequences"],
        [SketchSpec("h", "hll", "doc_id", {"p": 14})], group_by="source",
    )
    approx_sql(
        spark, "CREATE SAMPLE u FROM sequences KIND uniform RATIO 0.6 SEED 7",
        tables, catalog=cat,
    ).collect()

    stmt = (
        "SELECT APPROX_COUNT_DISTINCT(doc_id), APPROX_SUM(n_tok, 0.5), APPROX_COUNT(0.5) "
        "FROM sequences GROUP BY source"
    )
    out = approx_sql(spark, stmt, tables, catalog=cat).toPandas()
    want = {
        "source",
        "approx_count_distinct_doc_id", "approx_count_distinct_doc_id_err",
        "approx_sum_n_tok", "approx_sum_n_tok_err",
        "approx_count_star", "approx_count_star_err",
    }
    assert set(out.columns) == want and len(out) == 5
    exact = (
        spark.read.parquet(tables["sequences"])
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("d"),
            F.sum("n_tok").alias("s"),
            F.count("*").alias("n"),
        )
        .toPandas()
    )
    m = out.merge(exact, on="source")
    wide = 3.29 / 1.96
    assert ((m["approx_count_distinct_doc_id"] - m["d"]).abs()
            <= 3 * m["approx_count_distinct_doc_id_err"] + 2.0).all()
    assert ((m["approx_sum_n_tok"] - m["s"]).abs() <= m["approx_sum_n_tok_err"] * wide).all()
    assert ((m["approx_count_star"] - m["n"]).abs() <= m["approx_count_star_err"] * wide).all()

    # drop the states: COUNT_DISTINCT has no artifact left (the uniform
    # scramble can't serve distincts) → entire statement falls back to the
    # on-the-fly single-scan build, which still answers correctly
    cat.drop("seq_states")
    out2 = approx_sql(spark, stmt, tables, catalog=cat).toPandas()
    assert set(out2.columns) == want and len(out2) == 5


def test_join_auto_routing(spark, tables, tmp_path):
    """Join auto-selection: with a catalog and no catalog_key, an APPROX
    join statement finds the registered (left, right) universe-scramble
    pair on the join keys sharing (ratio, seed) and answers from the
    scrambles; without a usable pair it samples both sides on the fly."""
    from pyspark.sql import functions as F

    from sketchlib.spark.catalog import SketchCatalog

    base = spark.read.parquet(tables["sequences"])
    dim_dir = str(tmp_path / "dim")
    base.select("doc_id").distinct().orderBy("doc_id").limit(800).write.parquet(dim_dir)
    t2 = dict(tables, dim=dim_dir)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    for ddl in (
        "CREATE SAMPLE su FROM sequences KIND universe RATIO 0.5 ON doc_id SEED 7",
        "CREATE SAMPLE du FROM dim KIND universe RATIO 0.5 ON doc_id SEED 7",
        # decoy with a different seed: must NOT pair with su/du
        "CREATE SAMPLE du_off FROM dim KIND universe RATIO 0.5 ON doc_id SEED 99",
    ):
        approx_sql(spark, ddl, t2, catalog=cat).collect()

    stmt = (
        "SELECT APPROX_COUNT(0.5) FROM sequences JOIN dim "
        "ON sequences.doc_id = dim.doc_id"
    )
    est = approx_sql(spark, stmt, t2, catalog=cat).collect()[0]
    exact = base.join(spark.read.parquet(dim_dir), "doc_id").count()
    assert abs(est["est_count"] - exact) <= est["count_err"] * (3.29 / 1.96) + 1e-9

    # same statement, explicit pair: identical estimate (routing picked it)
    explicit = approx_sql(spark, stmt, t2, catalog=cat, catalog_key="su,du").collect()[0]
    assert est["est_count"] == explicit["est_count"]


def test_create_sketches_ddl(spark, tables, tmp_path):
    """Full sketch-set lifecycle through SQL strings only: CREATE SKETCHES
    builds+registers, the statement auto-routes to it, SHOW lists it,
    REFRESH no-ops on an unchanged dir, DROP removes it."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import resolve_catalog_key

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark,
        "CREATE SKETCHES sq FROM sequences KINDS hll(doc_id, p=12), "
        "cm(tokens), kll(n_tok) GROUP BY source",
        tables, catalog=cat,
    ).collect()
    listed = {r["name"] for r in approx_sql(spark, "SHOW SKETCHES", catalog=cat).collect()}
    assert "sq" in listed

    q = "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source"
    assert resolve_catalog_key(spark, q, tables, cat) == "sq"
    out = approx_sql(spark, q, tables, catalog=cat).toPandas()
    assert len(out) == 5 and abs(out["estimate"].sum() - 2000) / 2000 < 0.1

    # TOPK and PERCENTILE route to the same set's cm/kll specs
    topq = "SELECT APPROX_TOPK(tokens, 3) FROM sequences GROUP BY source"
    assert resolve_catalog_key(spark, topq, tables, cat) == "sq"
    top = approx_sql(spark, topq, tables, catalog=cat).toPandas()
    assert (top.groupby("group").size() == 3).all()
    pq = "SELECT APPROX_PERCENTILE(n_tok, 0.5) FROM sequences GROUP BY source"
    assert resolve_catalog_key(spark, pq, tables, cat) == "sq"

    ref = approx_sql(spark, "REFRESH SKETCHES sq", catalog=cat).collect()[0]
    assert ref["new_files"] == 0

    approx_sql(spark, "DROP SKETCHES sq", catalog=cat).collect()
    assert resolve_catalog_key(spark, q, tables, cat) is None


def test_having_clause(spark, tables):
    """HAVING filters the estimate frame (post-aggregation, after scale-up),
    composes with ORDER BY/LIMIT, and works on sampling aggregates too."""
    base = "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source"
    full = approx_sql(spark, base, tables).toPandas()
    had = approx_sql(spark, base + " HAVING estimate > 300", tables).toPandas()
    assert set(had["group"]) == set(full[full["estimate"] > 300]["group"])

    combo = approx_sql(
        spark, base + " HAVING estimate > 100 ORDER BY estimate DESC LIMIT 2", tables
    ).toPandas()
    assert len(combo) == 2 and combo["estimate"].is_monotonic_decreasing

    samp = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM sequences GROUP BY source HAVING est_count > 100",
        tables,
    ).toPandas()
    assert (samp["est_count"] > 100).all() and len(samp) > 0


def test_passthrough_edge_cases(spark, tables, tmp_path):
    """Spark's own DDL (SHOW TABLES / REFRESH TABLE) and APPROX_-shaped
    tokens inside string literals pass through to Spark SQL; catalog_key
    without a catalog raises instead of being silently ignored; and
    resolve_catalog_key sees through a HAVING tail."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import resolve_catalog_key

    assert approx_sql(spark, "SHOW TABLES", tables).count() >= 0

    lit = approx_sql(
        spark,
        "SELECT COUNT(*) AS n FROM sequences WHERE source != 'APPROX_X(1)'",
        tables,
    ).collect()[0]
    assert lit["n"] == 2000

    with pytest.raises(ValueError, match="catalog_key without catalog"):
        approx_sql(
            spark, "SELECT APPROX_COUNT(0.5) FROM sequences", tables, catalog_key="x"
        )

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark, "CREATE SAMPLE u FROM sequences KIND uniform RATIO 0.5 SEED 7",
        tables, catalog=cat,
    ).collect()
    q = "SELECT APPROX_COUNT(0.5) FROM sequences GROUP BY source HAVING est_count > 10"
    assert resolve_catalog_key(spark, q, tables, cat) == "u"
    out = approx_sql(spark, q, tables, catalog=cat).toPandas()
    assert (out["est_count"] > 10).all()


def test_approx_over_derived_table(spark, tables):
    """A16 recursion: the derived table runs as exact Spark SQL, the approx
    aggregate runs on top — filters, expressions, and GROUP BY in the inner
    query all apply before sketching; tails still compose on the outside."""
    from pyspark.sql import functions as F

    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM "
        "(SELECT doc_id, source FROM sequences WHERE n_tok > 400) GROUP BY source",
        tables,
    ).toPandas()
    exact = (
        spark.read.parquet(tables["sequences"])
        .filter("n_tok > 400")
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("d"))
        .toPandas()
    )
    m = out.merge(exact, left_on="group", right_on="source")
    assert len(m) == len(exact)
    assert ((m["estimate"] - m["d"]).abs() <= 3 * m["rse_bound"] * m["d"] + 2.0).all()

    # inner aggregation + outer approx + ORDER BY tail
    top = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(total_tok, 0.5) FROM "
        "(SELECT source, SUM(n_tok) AS total_tok FROM sequences GROUP BY source, doc_id) "
        "GROUP BY source ORDER BY value DESC",
        tables,
    ).toPandas()
    assert len(top) == 5 and top["value"].is_monotonic_decreasing


def test_derived_table_guards(spark, tables, tmp_path):
    """Derived-table edges: explicit catalog_key raises (the artifact was
    built over the BASE table, not the subquery's rows); an inner HAVING
    stays inside the subquery; 'FROM (' inside a string literal does not
    trigger extraction; the scratch temp view is dropped afterwards."""
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create(
        "s", tables["sequences"], [SketchSpec("h", "hll", "doc_id", {"p": 12})],
        group_by="source",
    )
    with pytest.raises(ValueError, match="derived-table"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM "
            "(SELECT * FROM sequences WHERE n_tok > 400) GROUP BY source",
            tables, catalog=cat, catalog_key="s",
        )

    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM "
        "(SELECT doc_id, source FROM sequences GROUP BY doc_id, source HAVING COUNT(*) >= 1)",
        tables,
    ).collect()[0]
    assert abs(out["estimate"] - 2000) / 2000 < 0.1

    lit = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences WHERE source != 'FROM (x)'",
        tables,
    ).collect()[0]
    assert abs(lit["estimate"] - 2000) / 2000 < 0.1

    views = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    assert not any(v.startswith("_approx_subquery_") for v in views)


def test_auto_routing_never_reads_base(spark, tmp_path, seq_tiny_dir):
    """A5 through the AUTO path: with a catalog and no key, a statement
    whose best artifact is a sketch set answers with the base table GONE —
    routing matches on the registered path string, never a scan."""
    import shutil

    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import resolve_catalog_key

    base = str(tmp_path / "base")
    shutil.copytree(seq_tiny_dir, base)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("s", base, [SketchSpec("h", "hll", "doc_id", {"p": 12})], group_by="source")
    shutil.rmtree(base)  # any scan of the base would now fail loudly

    t = {"sequences": base}
    q = "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source"
    assert resolve_catalog_key(spark, q, t, cat) == "s"
    out = approx_sql(spark, q, t, catalog=cat).toPandas()
    assert len(out) == 5 and abs(out["estimate"].sum() - 2000) / 2000 < 0.1
