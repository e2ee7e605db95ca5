"""Round-4 surface: WHERE on approx joins, table aliases + fact×dim mixed
joins, approx-over-approx derived tables, multi-key ORDER BY tails,
head-anchored registry DDL, and accuracy-honoring auto-selection."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.sql import approx_sql, resolve_catalog_key

WIDE = 3.29 / 1.96  # widen the default 95% CI to ~3.3σ for one-shot checks


@pytest.fixture(scope="module")
def tables(seq_tiny_dir):
    return {"sequences": seq_tiny_dir}


@pytest.fixture(scope="module")
def join_tables(spark, tmp_path_factory):
    """(tables dict, fact pdf, dim pdf): a fact table with a value and a
    segment, and a dim table unique on the join key carrying an attribute —
    the canonical fact×dimension pair."""
    rng = np.random.default_rng(17)
    fact = pd.DataFrame(
        {
            "k": rng.integers(0, 400, 12000),
            "val": rng.uniform(0, 10, 12000).round(3),
        }
    )
    dim = pd.DataFrame(
        {
            "j": np.arange(400),
            "region": ["r%d" % (i % 3) for i in range(400)],
        }
    )
    d = tmp_path_factory.mktemp("join4")
    fpath, dpath = str(d / "fact"), str(d / "dim")
    spark.createDataFrame(fact).write.parquet(fpath)
    spark.createDataFrame(dim).write.parquet(dpath)
    return {"fact": fpath, "dim": dpath}, fact, dim


def test_join_where_direct(spark, join_tables):
    """WHERE on an approx JOIN statement (VERDICT r3 #2): the predicate
    filters the joined sample before aggregation and the exact filtered
    join falls inside the CI."""
    t, fact, dim = join_tables
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(val, 0.5) FROM fact JOIN dim ON fact.k = dim.j "
        "WHERE val > 5",
        t,
    ).collect()[0]
    sub = fact[fact["val"] > 5]
    assert abs(out["est_count"] - len(sub)) <= out["count_err"] * WIDE
    assert abs(out["est_sum"] - float(sub["val"].sum())) <= out["sum_err"] * WIDE


def test_join_where_from_persisted_scrambles(spark, join_tables, tmp_path):
    """WHERE composes with the two-persisted-universe-scramble path, and the
    predicate may reference columns of either side (dim attribute here)."""
    from sketchlib.spark.catalog import SketchCatalog

    t, fact, dim = join_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, f"CREATE SAMPLE fs FROM {t['fact']} KIND universe RATIO 0.5 ON k SEED 9",
               catalog=cat).collect()
    approx_sql(spark, f"CREATE SAMPLE ds FROM {t['dim']} KIND universe RATIO 0.5 ON j SEED 9",
               catalog=cat).collect()
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT() FROM fact JOIN dim ON fact.k = dim.j "
        "WHERE region = 'r1'",
        t, catalog=cat, catalog_key="fs,ds",
    ).collect()[0]
    joined = fact.merge(dim, left_on="k", right_on="j")
    exact = int((joined["region"] == "r1").sum())
    assert abs(out["est_count"] - exact) <= out["count_err"] * WIDE


def test_join_aliases(spark, join_tables):
    """FROM fact f JOIN dim d ON f.k = d.j — aliases in FROM and ON, plus a
    qualified WHERE predicate (qualifiers are stripped for the joined
    frame)."""
    t, fact, dim = join_tables
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM fact f JOIN dim AS d ON f.k = d.j "
        "WHERE f.val > 5",
        t,
    ).collect()[0]
    exact = int((fact["val"] > 5).sum())
    assert abs(out["est_count"] - exact) <= out["count_err"] * WIDE


def test_mixed_fact_dim_join_uniform(spark, join_tables, tmp_path):
    """Verdict's most common join shape (A8): only the FACT side has a
    scramble; the exact dim side is broadcast. Auto-selection finds the
    single-sided sample, grouping by a DIM attribute works, every group's
    exact answer is inside the CI."""
    from sketchlib.spark.catalog import SketchCatalog

    t, fact, dim = join_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, f"CREATE SAMPLE fu FROM {t['fact']} KIND uniform RATIO 0.5 SEED 3",
               catalog=cat).collect()
    stmt = (
        "SELECT APPROX_SUM(val) FROM fact f JOIN dim d ON f.k = d.j GROUP BY region"
    )
    est = {r["region"]: r for r in approx_sql(spark, stmt, t, catalog=cat).collect()}
    joined = fact.merge(dim, left_on="k", right_on="j")
    exact = joined.groupby("region")["val"].agg(["count", "sum"])
    assert set(est) == set(exact.index)
    for g, row in exact.iterrows():
        assert abs(est[g]["est_count"] - row["count"]) <= est[g]["count_err"] * WIDE
        assert abs(est[g]["est_sum"] - row["sum"]) <= est[g]["sum_err"] * WIDE
    # the single-name key also works explicitly
    out = approx_sql(
        spark, "SELECT APPROX_COUNT() FROM fact JOIN dim ON fact.k = dim.j",
        t, catalog=cat, catalog_key="fu",
    ).collect()[0]
    assert abs(out["est_count"] - len(joined)) <= out["count_err"] * WIDE


def test_mixed_fact_dim_join_universe(spark, join_tables, tmp_path):
    """Mixed path with a UNIVERSE fact scramble on the join key: per-key
    clustered estimator, dim side complete. A universe sample keyed off the
    join key is refused."""
    from sketchlib.spark.catalog import SketchCatalog

    t, fact, dim = join_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, f"CREATE SAMPLE fk FROM {t['fact']} KIND universe RATIO 0.5 ON k SEED 3",
               catalog=cat).collect()
    out = approx_sql(
        spark, "SELECT APPROX_COUNT() FROM fact JOIN dim ON fact.k = dim.j",
        t, catalog=cat, catalog_key="fk",
    ).collect()[0]
    joined = fact.merge(dim, left_on="k", right_on="j")
    assert abs(out["est_count"] - len(joined)) <= out["count_err"] * WIDE
    approx_sql(spark, f"CREATE SAMPLE fv FROM {t['fact']} KIND universe RATIO 0.5 ON val SEED 3",
               catalog=cat).collect()
    with pytest.raises(ValueError, match="not the join key"):
        approx_sql(spark, "SELECT APPROX_COUNT() FROM fact JOIN dim ON fact.k = dim.j",
                   t, catalog=cat, catalog_key="fv").collect()


def test_multikey_order_by(spark, tables):
    """ORDER BY est DESC, group ASC — two keys with directions, applied to
    the result frame (VERDICT r3 #6)."""
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM sequences GROUP BY source "
        "ORDER BY est_count DESC, source ASC LIMIT 3",
        tables,
    ).toPandas()
    assert len(out) == 3
    expected = approx_sql(
        spark, "SELECT APPROX_COUNT(0.5) FROM sequences GROUP BY source", tables
    ).toPandas().sort_values(
        ["est_count", "source"], ascending=[False, True]
    ).head(3)
    assert list(out["source"]) == list(expected["source"])
    # direction-less second key defaults ASC; single-key statements unchanged
    one = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM sequences GROUP BY source ORDER BY source LIMIT 2",
        tables,
    ).toPandas()
    assert list(one["source"]) == sorted(one["source"])


def test_approx_over_approx_subquery(spark, tables, tmp_path):
    """VERDICT r3 #5: FROM (<approx SELECT>) evaluates the inner statement
    via approx_sql and sketches on top of the estimate frame; the inner
    stage's error surfaces as the inner_rel_err_max caveat column."""
    stmt = (
        "SELECT APPROX_PERCENTILE(estimate, 0.5) FROM "
        "(SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source)"
    )
    out = approx_sql(spark, stmt, tables).toPandas()
    assert "inner_rel_err_max" in out.columns
    inner_rel = float(out["inner_rel_err_max"].iloc[0])
    assert 0 < inner_rel < 0.1  # HLL p-from-rse default: ~1% rse
    # bound-aware oracle: the exact median of the EXACT per-group distinct
    # counts must lie within (outer rank slack over 5 values) + inner error
    docs = spark.read.parquet(tables["sequences"])
    exact = sorted(
        r["d"] for r in docs.groupBy("source").agg(
            F.countDistinct("doc_id").alias("d")).collect()
    )
    exact_med = float(exact[len(exact) // 2])
    est = float(out["value"].iloc[0])
    # 5 groups -> KLL is exact in rank; allow the inner relative error at 3σ
    assert abs(est - exact_med) <= 3 * inner_rel * exact_med + 1e-9

    # catalog_key is still rejected on derived tables; inner auto-routing
    # composes (states registered for the inner statement are used)
    from sketchlib.spark.catalog import SketchCatalog
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="derived-table"):
        approx_sql(spark, stmt, tables, catalog=cat, catalog_key="x")


def test_ddl_claims_only_registry_heads(spark, tables, tmp_path):
    """ADVICE r3 (medium): exact Spark SQL over tables that merely MENTION
    samples/sketches reaches the A4 pass-through; only statements whose
    HEAD is registry DDL are claimed."""
    spark.read.parquet(tables["sequences"]).limit(5).createOrReplaceTempView("samples")
    try:
        # passes through WITHOUT a catalog (previously: 'needs a SketchCatalog')
        out = approx_sql(spark, "SELECT count(*) AS n FROM samples").collect()
        assert out[0]["n"] == 5
        # Spark's own DDL falls through too
        approx_sql(spark, "CREATE TEMPORARY VIEW v4_tmp AS SELECT * FROM samples").collect()
        assert approx_sql(spark, "SELECT count(*) AS n FROM v4_tmp").collect()[0]["n"] == 5
        spark.catalog.dropTempView("v4_tmp")
        approx_sql(spark, "DROP TABLE IF EXISTS samples_not_there").collect()
    finally:
        spark.catalog.dropTempView("samples")
    # malformed registry DDL still raises OUR error, not Spark's
    from sketchlib.spark.catalog import SketchCatalog
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="unsupported DDL"):
        approx_sql(spark, "CREATE SAMPLE broken WITHOUT FROM", catalog=cat)


def test_accuracy_honored_in_routing(spark, tables, tmp_path):
    """ADVICE r3 (low): an explicit accuracy argument is honored by
    auto-selection — artifacts that cannot achieve it are skipped and the
    statement falls back to the on-the-fly build at the requested
    precision."""
    from sketchlib.spark import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    # p=9 HLL: rse ~ 1.04/sqrt(512) ~ 4.6% — cannot serve a 1% request
    cat.create("coarse", tables["sequences"],
               [SketchSpec("h", "hll", "doc_id", {"p": 9})], group_by="source")
    q_strict = "SELECT APPROX_COUNT_DISTINCT(doc_id, 0.01) FROM sequences GROUP BY source"
    q_loose = "SELECT APPROX_COUNT_DISTINCT(doc_id, 0.05) FROM sequences GROUP BY source"
    q_default = "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source"
    assert resolve_catalog_key(spark, q_strict, tables, cat) is None
    assert resolve_catalog_key(spark, q_loose, tables, cat) == "coarse"
    assert resolve_catalog_key(spark, q_default, tables, cat) == "coarse"
    # the strict statement's on-the-fly fallback honors the 1% request
    out = approx_sql(spark, q_strict, tables, catalog=cat).toPandas()
    assert (out["rse_bound"] <= 0.01 + 1e-12).all()

    # sampling ratio: a 0.2 sample can't serve a 0.5 request
    approx_sql(spark, f"CREATE SAMPLE u2 FROM {tables['sequences']} KIND uniform RATIO 0.2",
               catalog=cat).collect()
    assert resolve_catalog_key(
        spark, "SELECT APPROX_SUM(n_tok, 0.5) FROM sequences", tables, cat) is None
    assert resolve_catalog_key(
        spark, "SELECT APPROX_SUM(n_tok, 0.1) FROM sequences", tables, cat) == "u2"


def test_registry_scale_routing(spark, tables, tmp_path):
    """VERDICT r3 #9: auto-selection collects the registry per statement —
    verify routing latency at 10⁴ registered samples stays interactive
    (sub-second steady-state; first call pays Spark job warm-up)."""
    import json
    import os
    import time

    from sketchlib.spark.catalog import _SAMPLE_SCHEMA, SketchCatalog

    root = str(tmp_path / "cat")
    cat = SketchCatalog(spark, root)
    n = 10_000
    rows = [
        (f"s{i:05d}", f"/data/other_{i}", "uniform", 0.1, "", 42, 100, float(i), "{}", "[]")
        for i in range(n - 1)
    ]
    # one sample actually matching the statement's table, registered newest
    rows.append(("hit", tables["sequences"], "uniform", 0.3, "", 42, 100, float(n), "{}", "[]"))
    spark.createDataFrame(rows, _SAMPLE_SCHEMA).write.mode("append").parquet(
        os.path.join(root, "_sample_catalog")
    )
    for name, *_ in rows:
        os.makedirs(os.path.join(root, "samples", name), exist_ok=True)
    stmt = "SELECT APPROX_SUM(n_tok, 0.1) FROM sequences"
    assert resolve_catalog_key(spark, stmt, tables, cat) == "hit"  # warm-up + correctness
    t0 = time.perf_counter()
    assert resolve_catalog_key(spark, stmt, tables, cat) == "hit"
    dt = time.perf_counter() - t0
    assert dt < 2.5, f"routing at 10^4 registrations took {dt:.2f}s"


def test_crashed_refresh_restores_in_listing(spark, tables, tmp_path):
    """ADVICE r3 (low): a crash between refresh()'s two renames must not
    hide the set from SHOW SKETCHES / auto-routing — the restore runs in
    the listing path, not only exists()."""
    import os

    from sketchlib.spark import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("crashy", tables["sequences"],
               [SketchSpec("h", "hll", "doc_id", {"p": 10})], group_by="source")
    sdir = os.path.join(str(tmp_path / "cat"), "states", "crashy")
    os.rename(sdir, sdir + "._refresh_old")  # simulate the crash window
    listed = [r["name"] for r in cat.list().collect()]
    assert "crashy" in listed  # restored by the listing itself
    assert os.path.isdir(sdir)
    assert cat.states("crashy").count() > 0


def test_three_table_join_chain(spark, tmp_path):
    """a08's real shape through the SQL door: fact ⋈ dim1 ⋈ dim2 with a
    uniform fact scramble (auto-selected), GROUP BY a second-dim attribute;
    on-the-fly path Bernoulli-samples the FIRST FROM table."""
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(23)
    fact = pd.DataFrame({"ck": rng.integers(0, 200, 10000),
                         "price": rng.uniform(1, 100, 10000).round(2)})
    cust = pd.DataFrame({"cid": np.arange(200), "nk": np.arange(200) % 7})
    nation = pd.DataFrame({"nid": np.arange(7), "nname": [f"n{i}" for i in range(7)]})
    d = tmp_path
    paths = {}
    for name, pdf in (("orders", fact), ("cust", cust), ("nation", nation)):
        paths[name] = str(d / name)
        spark.createDataFrame(pdf).write.parquet(paths[name])
    t = paths
    stmt = (
        "SELECT APPROX_SUM(price) FROM orders o JOIN cust c ON o.ck = c.cid "
        "JOIN nation n ON c.nk = n.nid GROUP BY nname"
    )
    exact = (
        fact.merge(cust, left_on="ck", right_on="cid")
        .merge(nation, left_on="nk", right_on="nid")
        .groupby("nname")["price"].agg(["count", "sum"])
    )

    # catalog path: uniform scramble on the fact side, auto-selected
    cat = SketchCatalog(spark, str(d / "cat"))
    cat.create_sample("ou", paths["orders"], kind="uniform", ratio=0.5, seed=5)
    est = {r["nname"]: r for r in approx_sql(spark, stmt, t, catalog=cat).collect()}
    assert set(est) == set(exact.index)
    for g, row in exact.iterrows():
        assert abs(est[g]["est_count"] - row["count"]) <= est[g]["count_err"] * WIDE
        assert abs(est[g]["est_sum"] - row["sum"]) <= est[g]["sum_err"] * WIDE

    # on-the-fly path: first FROM table sampled at the ratio argument
    stmt2 = (
        "SELECT APPROX_COUNT(0.5) FROM orders o JOIN cust c ON o.ck = c.cid "
        "JOIN nation n ON c.nk = n.nid WHERE o.price > 50 GROUP BY nname"
    )
    est2 = {r["nname"]: r for r in approx_sql(spark, stmt2, t).collect()}
    ex2 = (
        fact[fact["price"] > 50].merge(cust, left_on="ck", right_on="cid")
        .merge(nation, left_on="nk", right_on="nid").groupby("nname").size()
    )
    for g, n in ex2.items():
        assert abs(est2[g]["est_count"] - n) <= est2[g]["count_err"] * WIDE

    # a universe scramble cannot drive the 3-chain
    cat.create_sample("ouu", paths["orders"], kind="universe", ratio=0.5, on="ck", seed=5)
    with pytest.raises(ValueError, match="UNIFORM fact scramble"):
        approx_sql(spark, stmt, t, catalog=cat, catalog_key="ouu").collect()


def test_strip_qualifiers_spares_literals(spark, join_tables):
    """Review r4: a string literal containing 'fact.' must not be rewritten
    by qualifier stripping — only real qualifier positions are."""
    from sketchlib.sql import _strip_qualifiers

    out = _strip_qualifiers("f.val > 5 AND name LIKE 'f.%'", {"f", "fact"})
    assert out == "val > 5 AND name LIKE 'f.%'"
    # end-to-end: the literal predicate reaches Catalyst intact
    t, fact, dim = join_tables
    res = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM fact f JOIN dim d ON f.k = d.j "
        "WHERE f.val > 5 AND d.region != 'f.notaregion'",
        t,
    ).collect()[0]
    exact = int((fact["val"] > 5).sum())
    assert abs(res["est_count"] - exact) <= res["count_err"] * WIDE


def test_dim_side_sample_clustered_ci(spark, tmp_path):
    """Review r4: a uniform scramble on the KEY-UNIQUE side joined to a
    many-rows-per-key exact side — inclusions cluster per sampled row, and
    the reported CI must be the clustered one (Σc², ~√m wider than a
    row-independence formula), with the exact answer inside it."""
    from sketchlib.spark.catalog import SketchCatalog

    m = 25
    keys = np.arange(80)
    fact = pd.DataFrame({"k": np.repeat(keys, m)})       # exactly m rows per key
    dim = pd.DataFrame({"j": keys})
    fpath, dpath = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.createDataFrame(fact).write.parquet(fpath)
    spark.createDataFrame(dim).write.parquet(dpath)
    t = {"fact": fpath, "dim": dpath}
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create_sample("du", dpath, kind="uniform", ratio=0.5, seed=3)
    n_s = cat.sample("du").count()
    out = approx_sql(
        spark, "SELECT APPROX_COUNT() FROM fact JOIN dim ON fact.k = dim.j",
        t, catalog=cat, catalog_key="du",
    ).collect()[0]
    p, z = 0.5, 1.96
    assert out["est_count"] == pytest.approx(n_s * m / p)
    # clustered formula: every sampled dim row brings exactly m joined rows
    assert out["count_err"] == pytest.approx(z * (n_s * m * m * (1 - p)) ** 0.5 / p)
    assert abs(out["est_count"] - len(fact)) <= out["count_err"] * WIDE


def test_three_table_join_refuses_disconnected(spark, tmp_path):
    """Review r4: ON clauses that never link the third table must raise,
    not silently drop it from the join."""
    for name, pdf in (
        ("ta", pd.DataFrame({"x": [1, 2], "k": [1, 2]})),
        ("tb", pd.DataFrame({"y": [1, 2], "k2": [1, 2]})),
        ("tc", pd.DataFrame({"z": [1, 2]})),
    ):
        spark.createDataFrame(pdf).write.parquet(str(tmp_path / name))
    t = {n: str(tmp_path / n) for n in ("ta", "tb", "tc")}
    with pytest.raises(ValueError, match="never join"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT(0.5) FROM ta JOIN tb ON ta.x = tb.y "
            "JOIN tc ON ta.k = tb.k2",
            t,
        ).collect()


def test_kmv_accuracy_gate_uses_sketch_bound(spark, tables, tmp_path):
    """Review r4: the KMV routing gate must use the sketch's own reported
    bound 1/√(k−2) — k=101 achieves 0.1005, not the 0.1 a 1/√(k−1) gate
    would admit."""
    from sketchlib.spark import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("kmv101", tables["sequences"],
               [SketchSpec("km", "kmv", "doc_id", {"k": 101})], group_by="source")
    q = "SELECT APPROX_COUNT_DISTINCT(doc_id, 0.1) FROM sequences GROUP BY source"
    assert resolve_catalog_key(spark, q, tables, cat) is None
    q_loose = "SELECT APPROX_COUNT_DISTINCT(doc_id, 0.11) FROM sequences GROUP BY source"
    assert resolve_catalog_key(spark, q_loose, tables, cat) == "kmv101"


def test_join_routing_honors_explicit_ratio(spark, join_tables, tmp_path):
    """Review r4: an explicit ratio argument in a join statement skips
    samples below it (the single-table rule, extended to joins)."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import _resolve_join_key

    t, fact, dim = join_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create_sample("fu02", t["fact"], kind="uniform", ratio=0.2, seed=3)
    assert _resolve_join_key("fact", "dim", "k", "j", t, cat, req_ratio=0.5) is None
    assert _resolve_join_key("fact", "dim", "k", "j", t, cat, req_ratio=0.1) == "fu02"
    # end-to-end: the 0.5 request falls back to an on-the-fly 0.5 draw
    out = approx_sql(
        spark, "SELECT APPROX_COUNT(0.5) FROM fact JOIN dim ON fact.k = dim.j",
        t, catalog=cat,
    ).collect()[0]
    joined = fact.merge(dim, left_on="k", right_on="j")
    assert abs(out["est_count"] - len(joined)) <= out["count_err"] * WIDE


def test_join_multicol_group_by(spark, tmp_path):
    """GROUP BY two columns on a join statement — per-(seg, region) counts
    with clustered CIs, every cell's exact answer inside them."""
    rng = np.random.default_rng(31)
    fact = pd.DataFrame({
        "k": rng.integers(0, 300, 9000),
        "seg": rng.choice(["x", "y"], 9000),
    })
    dim = pd.DataFrame({"j": np.arange(300), "region": ["r%d" % (i % 2) for i in range(300)]})
    fpath, dpath = str(tmp_path / "f"), str(tmp_path / "d")
    spark.createDataFrame(fact).write.parquet(fpath)
    spark.createDataFrame(dim).write.parquet(dpath)
    t = {"fact": fpath, "dim": dpath}
    out = {(r["seg"], r["region"]): r for r in approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM fact JOIN dim ON fact.k = dim.j "
        "GROUP BY seg, region",
        t,
    ).collect()}
    exact = fact.merge(dim, left_on="k", right_on="j").groupby(["seg", "region"]).size()
    assert set(out) == set(exact.index)
    for cell, n in exact.items():
        assert abs(out[cell]["est_count"] - n) <= out[cell]["count_err"] * WIDE


def test_tails_on_join_statements(spark, join_tables, tmp_path):
    """HAVING / ORDER BY / LIMIT tails compose with join statements (tails
    peel before the join skeleton matches)."""
    t, fact, dim = join_tables
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM fact JOIN dim ON fact.k = dim.j "
        "GROUP BY region HAVING est_count > 0 ORDER BY est_count DESC, region LIMIT 2",
        t,
    ).toPandas()
    assert len(out) == 2
    assert list(out["est_count"]) == sorted(out["est_count"], reverse=True)
    exact = fact.merge(dim, left_on="k", right_on="j").groupby("region").size()
    for _, r in out.iterrows():
        assert abs(r["est_count"] - exact[r["region"]]) <= r["count_err"] * WIDE


def test_sql_grammar_sweep(spark, tables):
    """Deterministic grammar sweep: every combination of aggregate × WHERE
    × GROUP BY × tail either ANALYZES into a frame carrying the expected
    estimate columns or raises OUR ValueError — the front door never leaks
    a Python traceback or mis-parses into Spark. Analysis-only (no jobs),
    so the whole matrix is cheap."""
    import itertools

    aggs = [
        ("APPROX_COUNT_DISTINCT(doc_id)", {"estimate"}),
        ("APPROX_COUNT_DISTINCT(doc_id, 0.02)", {"estimate"}),
        ("APPROX_COUNT(0.5)", {"est_count"}),
        ("APPROX_SUM(n_tok, 0.5)", {"est_sum"}),
        ("APPROX_AVG(n_tok, 0.5)", {"est_avg"}),
        ("APPROX_PERCENTILE(n_tok, 0.5, 0.9)", {"value"}),
        ("APPROX_TOPK(tokens, 3)", {"est_count"}),
    ]
    wheres = ["", " WHERE n_tok > 100", " WHERE source IN ('web', 'books')"]
    groups = ["", " GROUP BY source", " GROUP BY source, n_tok"]
    tails = ["", " LIMIT 3", " ORDER BY source LIMIT 2"]
    n_ok = 0
    combos = [
        (a, wheres[i % 3], groups[(i + j) % 3], tails[(i + 2 * j) % 3])
        for i, a in enumerate(aggs)
        for j in range(3)  # a rotating latin-square slice, not the full product:
    ]                      # every value of every dimension still appears with every agg
    for (agg, want), wh, gp, tl in combos:
        if "ORDER BY source" in tl and not gp:
            continue  # ordering by a group column needs the group column
        stmt = f"SELECT {agg} FROM sequences{wh}{gp}{tl}"
        try:
            df = approx_sql(spark, stmt, tables)
        except ValueError:
            continue  # a refused combination must refuse with OUR error
        cols = set(df.columns)
        assert want <= cols, f"{stmt} -> {cols}"
        if gp:
            # single-col sketch paths keep the generic 'group' column (the
            # documented convention); sampling paths and multi-col groups
            # restore the user's columns
            assert "source" in cols or "group" in cols, f"{stmt} lost its group column: {cols}"
        n_ok += 1
    assert n_ok >= 15  # the sweep exercised a real cross-section


def test_cte_statements(spark, tables):
    """WITH support: exact CTEs feed approx final statements; approx CTEs
    compose (evaluated via approx_sql, checkpointed); plain exact WITH
    statements pass through to Spark SQL untouched."""
    # exact CTE -> approx final
    out = approx_sql(
        spark,
        "WITH big AS (SELECT * FROM sequences WHERE n_tok > 400) "
        "SELECT APPROX_COUNT(0.5) FROM big GROUP BY source",
        tables,
    ).toPandas()
    docs = spark.read.parquet(tables["sequences"])
    exact = {r["source"]: r["n"] for r in
             docs.filter("n_tok > 400").groupBy("source").agg(F.count("*").alias("n")).collect()}
    for _, r in out.iterrows():
        assert abs(r["est_count"] - exact[r["source"]]) <= r["count_err"] * WIDE

    # two CTEs, the second referencing the first; approx inner composes
    out2 = approx_sql(
        spark,
        "WITH big AS (SELECT * FROM sequences WHERE n_tok > 400), "
        "counts AS (SELECT APPROX_COUNT_DISTINCT(doc_id) FROM big GROUP BY source) "
        "SELECT count(*) AS n_groups FROM counts",
        tables,
    ).collect()[0]
    assert out2["n_groups"] == len(exact)

    # plain exact WITH passes through untouched
    out3 = approx_sql(
        spark,
        "WITH t AS (SELECT n_tok FROM sequences) SELECT count(*) AS n FROM t",
        tables,
    ).collect()[0]
    assert out3["n"] == 2000

    # malformed WITH raises OUR error
    with pytest.raises(ValueError, match="malformed WITH"):
        approx_sql(spark, "WITH t SELECT APPROX_COUNT(0.5) FROM t", tables)
