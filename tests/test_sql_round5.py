"""Round-5 surface: IN-subquery predicates in approx statements, chained
CTEs + CTE/tables-binding collision rejection, descriptive join-ratio
errors, and composed inner-error bounds for value-unit approx-over-approx."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.sql import approx_sql

WIDE = 3.29 / 1.96  # widen the default 95% CI to ~3.3σ for one-shot checks


@pytest.fixture(scope="module")
def sub_tables(spark, tmp_path_factory):
    """(tables dict, fact pdf, dim pdf): fact rows keyed into a dim whose
    attribute the IN-subquery filters on."""
    rng = np.random.default_rng(29)
    fact = pd.DataFrame(
        {
            "k": rng.integers(0, 300, 15000),
            "val": rng.uniform(0, 10, 15000).round(3),
            "seg": [f"s{i % 4}" for i in range(15000)],
        }
    )
    dim = pd.DataFrame(
        {"j": np.arange(300), "grp": ["keep" if i % 3 == 0 else "drop" for i in range(300)]}
    )
    d = tmp_path_factory.mktemp("sub5")
    fpath, dpath = str(d / "fact"), str(d / "dim")
    spark.createDataFrame(fact).write.parquet(fpath)
    spark.createDataFrame(dim).write.parquet(dpath)
    return {"fact": fpath, "dim": dpath}, fact, dim


def test_in_subquery_where_sampling_path(spark, sub_tables):
    """APPROX_SUM ... WHERE k IN (SELECT ...) (VERDICT r4 #4): the predicate
    routes through spark.sql (a filter() string rejects subqueries) and the
    exact filtered aggregate falls inside the CI."""
    t, fact, dim = sub_tables
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(val, 0.5) FROM fact "
        "WHERE k IN (SELECT j FROM dim WHERE grp = 'keep')",
        t,
    ).collect()[0]
    keep = set(dim[dim["grp"] == "keep"]["j"])
    sub = fact[fact["k"].isin(keep)]
    assert abs(out["est_sum"] - float(sub["val"].sum())) <= out["sum_err"] * WIDE


def test_in_subquery_where_sketch_path_grouped(spark, sub_tables):
    """The same subquery predicate on the SKETCH path (grouped
    APPROX_COUNT_DISTINCT): estimates per group stay within the HLL bound
    of the exact filtered distinct counts."""
    t, fact, dim = sub_tables
    rows = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(k) FROM fact "
        "WHERE k IN (SELECT j FROM dim WHERE grp = 'keep') GROUP BY seg",
        t,
    ).collect()
    keep = set(dim[dim["grp"] == "keep"]["j"])
    sub = fact[fact["k"].isin(keep)]
    exact = sub.groupby("seg")["k"].nunique().to_dict()
    assert {r["group"] for r in rows} == set(exact)
    for r in rows:
        tol = 3 * r["rse_bound"] * exact[r["group"]] + 2.0
        assert abs(r["estimate"] - exact[r["group"]]) <= tol


def test_in_subquery_where_persisted_sample(spark, sub_tables, tmp_path):
    """Subquery WHERE over a PERSISTED scramble (the A5 path): filtering
    commutes with Bernoulli sampling, so the registered 1/p scale-up covers
    the subquery-filtered population too."""
    from sketchlib.spark.catalog import SketchCatalog

    t, fact, dim = sub_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark, "CREATE SAMPLE us FROM fact KIND uniform RATIO 0.5 SEED 3", t, catalog=cat
    ).collect()
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(val) FROM fact "
        "WHERE k IN (SELECT j FROM dim WHERE grp = 'keep')",
        t, catalog=cat, catalog_key="us",
    ).collect()[0]
    keep = set(dim[dim["grp"] == "keep"]["j"])
    sub = fact[fact["k"].isin(keep)]
    assert abs(out["est_sum"] - float(sub["val"].sum())) <= out["sum_err"] * WIDE


def test_cte_chained(spark, sub_tables):
    """A CTE reading an EARLIER CTE (VERDICT r4 #6): sequential view
    registration makes `b` resolve `a`; lock it with an exact check."""
    t, fact, _ = sub_tables
    out = approx_sql(
        spark,
        "WITH a AS (SELECT k, val FROM fact WHERE val > 5), "
        "b AS (SELECT k FROM a WHERE k < 100) "
        "SELECT COUNT(*) AS n FROM b",
        t,
    ).collect()[0]
    assert out["n"] == len(fact[(fact["val"] > 5) & (fact["k"] < 100)])


def test_cte_chained_approx(spark, sub_tables):
    """Chained CTEs where the FINAL statement is approximate: the approx
    aggregate runs over the second CTE's frame."""
    t, fact, _ = sub_tables
    out = approx_sql(
        spark,
        "WITH a AS (SELECT k, val FROM fact WHERE val > 5), "
        "b AS (SELECT val FROM a WHERE val < 9) "
        "SELECT APPROX_SUM(val, 0.5) FROM b",
        t,
    ).collect()[0]
    sub = fact[(fact["val"] > 5) & (fact["val"] < 9)]
    assert abs(out["est_sum"] - float(sub["val"].sum())) <= out["sum_err"] * WIDE


def test_cte_name_collision_rejected(spark, sub_tables):
    """A CTE name colliding with a `tables` binding is rejected loudly —
    the dict is authoritative in resolution, so the CTE would be silently
    shadowed (answers computed over the wrong relation)."""
    t, _, _ = sub_tables
    with pytest.raises(ValueError, match="collides"):
        approx_sql(
            spark,
            "WITH dim AS (SELECT k FROM fact WHERE val > 5) "
            "SELECT APPROX_COUNT(0.5) FROM dim",
            t,
        )


def test_join_ratio_arg_descriptive_error(spark, sub_tables):
    """A non-numeric ratio argument on an on-the-fly approx join raises the
    library's descriptive error, not a leaked float() traceback."""
    t, _, _ = sub_tables
    with pytest.raises(ValueError, match="numeric sampling ratio"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT(*) FROM fact JOIN dim ON fact.k = dim.j",
            t,
        )


def test_composed_inner_error_bound(spark, sub_tables):
    """VERDICT r4 #8: an outer APPROX_SUM of an inner APPROX_COUNT's
    estimate column shares VALUE units across the two stages, so the
    first-order propagated bound is computable: composed_err_bound =
    outer CI + Σ|inner err_i| (worst case). The exact answer must fall
    inside it, and the propagated term must match the inner frame."""
    t, fact, _ = sub_tables
    inner = "SELECT APPROX_COUNT(0.5) FROM fact GROUP BY k"
    out = approx_sql(spark, f"SELECT APPROX_SUM(est_count, 0.9) FROM ({inner})", t).collect()[0]
    assert out["composed_err_bound"] == out["sum_err"] + out["inner_abs_err"]
    assert out["inner_abs_err"] > 0
    inner_pdf = approx_sql(spark, inner, t).toPandas()
    assert out["inner_abs_err"] == pytest.approx(float(inner_pdf["count_err"].abs().sum()))
    exact = len(fact)
    assert abs(out["est_sum"] - exact) <= WIDE * out["composed_err_bound"]


def test_composed_bound_absent_for_rank_units(spark, sub_tables):
    """Unit discipline: an outer PERCENTILE over inner estimates mixes
    rank and value units — only the relative caveat is emitted, never a
    falsely-summed composed bound."""
    t, _, _ = sub_tables
    out = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(est_count, 0.5) FROM "
        "(SELECT APPROX_COUNT(0.5) FROM fact GROUP BY seg)",
        t,
    )
    assert "inner_rel_err_max" in out.columns
    assert "composed_err_bound" not in out.columns


def test_not_in_and_exists_subquery_where(spark, sub_tables):
    """The subquery-WHERE route is not IN-specific: NOT IN and correlated
    EXISTS predicates take the same spark.sql path."""
    t, fact, dim = sub_tables
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(val, 0.5) FROM fact "
        "WHERE k NOT IN (SELECT j FROM dim WHERE grp = 'keep')",
        t,
    ).collect()[0]
    keep = set(dim[dim["grp"] == "keep"]["j"])
    sub = fact[~fact["k"].isin(keep)]
    assert abs(out["est_sum"] - float(sub["val"].sum())) <= out["sum_err"] * WIDE

    out2 = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM fact "
        "WHERE EXISTS (SELECT 1 FROM dim WHERE dim.j = fact.k AND dim.grp = 'keep')",
        t,
    ).collect()[0]
    sub2 = fact[fact["k"].isin(keep)]
    assert abs(out2["est_count"] - len(sub2)) <= out2["count_err"] * WIDE


def test_signatures_ddl_grammar_errors(spark, tmp_path):
    """Malformed SIGNATURES DDL raises the library's descriptive error (the
    no-leaked-traceback contract), and `DROP TABLE signatures` — Spark's
    own DDL over a user table that merely shares the word — is NOT claimed
    by the registry (head-only claiming)."""
    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="CREATE \\[OR REPLACE\\] SIGNATURES"):
        approx_sql(spark, "CREATE SIGNATURES x FROM", catalog=cat)
    # head-only claiming: a Spark statement naming a table 'signatures'
    # passes through to Spark SQL (which then errors on the missing table,
    # proving the registry never claimed it)
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        approx_sql(spark, "SELECT * FROM signatures_t", catalog=cat)


def test_scalar_subquery_resolves_base_not_sample(spark, sub_tables, tmp_path):
    """A self-referencing scalar subquery (`WHERE val > (SELECT avg(val)
    FROM fact)`) must aggregate over the BASE table even when the outer
    statement is served from a persisted scramble — the outer alias only
    shadows column qualification, not catalog lookup of the inner FROM."""
    from sketchlib.spark.catalog import SketchCatalog

    t, fact, _ = sub_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark, "CREATE SAMPLE u2 FROM fact KIND uniform RATIO 0.5 SEED 5", t, catalog=cat
    ).collect()
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM fact WHERE val > (SELECT avg(val) FROM fact)",
        t, catalog=cat, catalog_key="u2",
    ).collect()[0]
    exact = int((fact["val"] > fact["val"].mean()).sum())
    assert abs(out["est_count"] - exact) <= out["count_err"] * WIDE


def test_join_where_subquery_refused_with_cte_workaround(spark, sub_tables):
    """Subquery predicates on approximate JOIN statements are refused with
    a descriptive error (the sampling kernels' filter() would leak an
    AnalysisException) — and the error's suggested CTE workaround actually
    works, end to end."""
    t, fact, dim = sub_tables
    with pytest.raises(ValueError, match="CTE"):
        approx_sql(
            spark,
            "SELECT APPROX_COUNT(0.5) FROM fact JOIN dim ON fact.k = dim.j "
            "WHERE k IN (SELECT j FROM dim WHERE grp = 'keep')",
            t,
        )
    out = approx_sql(
        spark,
        "WITH f AS (SELECT * FROM fact WHERE k IN (SELECT j FROM dim WHERE grp = 'keep')) "
        "SELECT APPROX_COUNT(0.5) FROM f JOIN dim ON f.k = dim.j",
        t,
    ).collect()[0]
    keep = set(dim[dim["grp"] == "keep"]["j"])
    exact = int(fact["k"].isin(keep).sum())  # dim is key-unique: join preserves count
    assert abs(out["est_count"] - exact) <= out["count_err"] * WIDE


def test_derived_table_inside_where_subquery(spark, sub_tables):
    """`WHERE k IN (SELECT ... FROM (SELECT ...))` — a derived table NESTED
    inside the predicate's subquery: the positional FROM-( rewrite registers
    the innermost block as a view and reassembles the same semantics. Locked
    because it works by construction, not by accident review."""
    t, fact, dim = sub_tables
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(val, 0.5) FROM fact WHERE k IN "
        "(SELECT j FROM (SELECT * FROM dim WHERE grp = 'keep'))",
        t,
    ).collect()[0]
    keep = set(dim[dim["grp"] == "keep"]["j"])
    sub = fact[fact["k"].isin(keep)]
    assert abs(out["est_sum"] - float(sub["val"].sum())) <= out["sum_err"] * WIDE


def test_where_subquery_derived_with_catalog_key(spark, sub_tables, tmp_path):
    """Review fix (round 5): a derived table NESTED INSIDE a WHERE subquery
    must not trip the derived-table branch's catalog_key refusal — the
    statement's own FROM is the plain base table the scramble covers, so it
    answers from the registered sample."""
    from sketchlib.spark.catalog import SketchCatalog

    t, fact, dim = sub_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark, "CREATE SAMPLE u3 FROM fact KIND uniform RATIO 0.5 SEED 11", t, catalog=cat
    ).collect()
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(val) FROM fact WHERE k IN "
        "(SELECT j FROM (SELECT * FROM dim WHERE grp = 'keep'))",
        t, catalog=cat, catalog_key="u3",
    ).collect()[0]
    keep = set(dim[dim["grp"] == "keep"]["j"])
    sub = fact[fact["k"].isin(keep)]
    assert abs(out["est_sum"] - float(sub["val"].sum())) <= out["sum_err"] * WIDE


def test_composed_bound_skipped_for_avg_with_where_tail(spark, sub_tables):
    """Review fix (round 5): an outer APPROX_AVG restricted by a WHERE tail
    averages a SUBSET of inner rows, so the full-frame mean of inner errors
    can UNDERstate the propagated bound — composition is skipped (caveat
    only); SUM keeps its composed bound under WHERE (sum-over-all is
    conservative for any subset)."""
    t, _, _ = sub_tables
    inner = "SELECT APPROX_COUNT(0.5) FROM fact GROUP BY k"
    avg_out = approx_sql(
        spark,
        f"SELECT APPROX_AVG(est_count, 0.9) FROM ({inner}) WHERE est_count > 10",
        t,
    )
    assert "inner_rel_err_max" in avg_out.columns
    assert "composed_err_bound" not in avg_out.columns
    sum_out = approx_sql(
        spark,
        f"SELECT APPROX_SUM(est_count, 0.9) FROM ({inner}) WHERE est_count > 10",
        t,
    )
    assert "composed_err_bound" in sum_out.columns


def test_composed_bound_grouped_outer(spark, sub_tables):
    """Grouped composition (round 5 extension of VERDICT r4 #8): an outer
    APPROX_SUM ... GROUP BY g over inner estimates emits a PER-GROUP
    propagated bound — each group's inner_abs_err is the sum of |err_i|
    over exactly that group's inner rows, and the per-group exact totals
    land inside the composed bound."""
    t, fact, _ = sub_tables
    inner = "SELECT APPROX_COUNT(0.5) FROM fact GROUP BY k, seg"
    out = approx_sql(
        spark,
        f"SELECT APPROX_SUM(est_count, 0.9) FROM ({inner}) GROUP BY seg",
        t,
    ).toPandas()
    assert {"seg", "est_sum", "sum_err", "inner_abs_err", "composed_err_bound"} <= set(out.columns)
    inner_pdf = approx_sql(spark, inner, t).toPandas()
    want_prop = inner_pdf.groupby("seg")["count_err"].apply(lambda s: float(s.abs().sum()))
    exact = fact.groupby("seg").size()
    for _, r in out.iterrows():
        assert r["inner_abs_err"] == pytest.approx(want_prop[r["seg"]])
        assert r["composed_err_bound"] == pytest.approx(r["sum_err"] + r["inner_abs_err"])
        assert abs(r["est_sum"] - exact[r["seg"]]) <= WIDE * r["composed_err_bound"]


def test_explain_routing(spark, sub_tables, tmp_path):
    """EXPLAIN over approx statements (round 5): answers WHICH route and
    artifact would serve the statement — Verdict's which-sample-served
    question — without executing anything (classification + registry only;
    proven by explaining over a nonexistent base path)."""
    from sketchlib.spark.catalog import SketchCatalog

    t, _, _ = sub_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark, "CREATE SAMPLE ex FROM fact KIND uniform RATIO 0.25 SEED 7", t, catalog=cat
    ).collect()

    def props(stmt, tables=t):
        return dict(
            (r["property"], r["value"])
            for r in approx_sql(spark, stmt, tables, catalog=cat).collect()
        )

    p = props("EXPLAIN SELECT APPROX_SUM(val) FROM fact")
    assert p["statement_kind"] == "approx_single"
    assert p["artifact"] == "ex" and p["route"].startswith("persisted_sample")

    # explicit ratio ABOVE the registered sample's: auto-selection skips it
    p2 = props("EXPLAIN SELECT APPROX_SUM(val, 0.5) FROM fact")
    assert p2["route"].startswith("on_the_fly")

    # no execution: a nonexistent base path still explains (nothing is read)
    p3 = props(
        "EXPLAIN SELECT APPROX_COUNT_DISTINCT(k) FROM missing",
        {"missing": "/nonexistent/never_written.parquet"},
    )
    assert p3["statement_kind"] == "approx_single"
    assert p3["route"].startswith("on_the_fly")

    # exact EXPLAIN is Spark's own statement — passes through (A4), so the
    # result is Spark's plan frame, not our property rows
    ex = approx_sql(spark, "EXPLAIN SELECT count(*) FROM fact", t, catalog=cat)
    assert "property" not in ex.columns

    # subquery-WHERE classification is surfaced
    p4 = props(
        "EXPLAIN SELECT APPROX_SUM(val) FROM fact "
        "WHERE k IN (SELECT j FROM dim WHERE grp = 'keep')"
    )
    assert "subquery" in p4["where"]


def test_join_multicol_group_by(spark, sub_tables):
    """Multi-column GROUP BY on an approximate JOIN statement: per-key
    estimates stay inside the CI of the exact grouped join counts."""
    t, fact, dim = sub_tables
    rows = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM fact JOIN dim ON fact.k = dim.j "
        "GROUP BY seg, grp",
        t,
    ).collect()
    joined = fact.merge(dim, left_on="k", right_on="j")
    exact = joined.groupby(["seg", "grp"]).size()
    assert len(rows) == len(exact)
    for r in rows:
        e = exact[(r["seg"], r["grp"])]
        assert abs(r["est_count"] - e) <= r["count_err"] * WIDE


def test_explain_matches_execution_on_joins(spark, sub_tables, tmp_path):
    """Review fixes (round 5, second pass): join EXPLAIN uses the SAME
    parse/resolution as execution — an explicit ratio above the registered
    sample's makes both fall back on-the-fly, a three-table chain reports
    its auto-selected fact scramble, an unsupported aggregate and a bad ON
    qualifier report the error execution would raise."""
    from sketchlib.spark.catalog import SketchCatalog

    t, _, _ = sub_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark, "CREATE SAMPLE jx FROM fact KIND uniform RATIO 0.25 SEED 7", t, catalog=cat
    ).collect()

    def props(stmt):
        return dict(
            (r["property"], r["value"])
            for r in approx_sql(spark, stmt, t, catalog=cat).collect()
        )

    p = props("EXPLAIN SELECT APPROX_COUNT() FROM fact JOIN dim ON fact.k = dim.j")
    assert p["artifact"] == "jx" and p["route"].startswith("fact_sample")
    # explicit ratio above the sample's: execution refuses it — so must EXPLAIN
    p2 = props("EXPLAIN SELECT APPROX_COUNT(0.5) FROM fact JOIN dim ON fact.k = dim.j")
    assert p2["route"].startswith("on_the_fly")
    # three-table chain auto-selects the registered fact scramble
    p3 = props(
        "EXPLAIN SELECT APPROX_COUNT() FROM fact JOIN dim ON fact.k = dim.j "
        "JOIN dim2 ON dim.j = dim2.j2"
    )
    assert p3.get("artifact") == "jx"
    # unsupported aggregate over a join: the error execution raises
    p4 = props("EXPLAIN SELECT APPROX_PERCENTILE(val, 0.5) FROM fact JOIN dim ON fact.k = dim.j")
    assert "error" in p4 and "not supported over a JOIN" in p4["error"]
    # bad ON qualifier: error, never silently-swapped keys
    p5 = props("EXPLAIN SELECT APPROX_COUNT() FROM fact JOIN dim ON typo.k = dim.j")
    assert "error" in p5 and "qualifiers" in p5["error"]


def test_composed_bound_skipped_for_null_group_keys(spark):
    """Review fix (round 5, second pass): a NULL inner group key would make
    the grouped composed bound silently UNDERSTATE (pandas drops NaN keys,
    the join never matches NULL) — composition is skipped, caveat only."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a", "a", None, None], "v": [1.0, 2.0, 3.0, 4.0]})
    )
    df.createOrReplaceTempView("nullg")
    try:
        out = approx_sql(
            spark,
            "SELECT APPROX_SUM(est_sum, 0.9) FROM "
            "(SELECT APPROX_SUM(v, 0.9) FROM nullg GROUP BY g) GROUP BY g",
            None,
        )
        assert "inner_rel_err_max" in out.columns
        assert "composed_err_bound" not in out.columns
    finally:
        spark.catalog.dropTempView("nullg")


# ---------------------------------------------------------------------------
# DDL grammar sweep (round-5 close-out): every registry statement family —
# CREATE/SHOW/REFRESH/DROP × SAMPLE/SKETCHES/ANN INDEX/SIGNATURES — driven
# through its full lifecycle, plus a malformed-variant matrix that must
# refuse with OUR descriptive ValueError (the no-leaked-traceback contract
# the aggregate sweep in test_sql_round4 locks for query statements).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ddl_env(spark, tmp_path_factory):
    """A sequences table (doc_id/tokens/n_tok/source), a tiny embeddings
    table, and a fresh catalog — enough surface for all four DDL families."""
    from sketchlib.data.gen import write_sequences
    from sketchlib.spark.catalog import SketchCatalog

    d = tmp_path_factory.mktemp("ddl5")
    seq = str(d / "seq")
    write_sequences(seq, 1000)
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(120, 8)).astype(np.float32)
    emb = pd.DataFrame({"vec_id": np.arange(120), "embedding": list(map(list, vecs))})
    epath = str(d / "emb")
    spark.createDataFrame(emb).write.parquet(epath)
    cat = SketchCatalog(spark, str(d / "cat"))
    return {"sequences": seq, "emb": epath}, cat


def test_ddl_lifecycle_sweep(spark, ddl_env):
    """CREATE → SHOW (listed) → REFRESH (0 new files) → DROP (dropped=True)
    → DROP again (dropped=False) for each of the four registry families,
    all through the SQL front door."""
    tables, cat = ddl_env
    families = [
        (
            "CREATE SAMPLE gs1 FROM sequences KIND uniform RATIO 0.2 SEED 7",
            "SHOW SAMPLES", "REFRESH SAMPLE gs1", "DROP SAMPLE gs1", "gs1",
        ),
        (
            "CREATE SKETCHES gk1 FROM sequences KINDS hll(doc_id, p=12), kll(n_tok)",
            "SHOW SKETCHES", "REFRESH SKETCHES gk1", "DROP SKETCHES gk1", "gk1",
        ),
        (
            "CREATE ANN INDEX ga1 FROM emb KIND srp ON embedding ID vec_id BITS 8 SEED 3",
            "SHOW ANN INDEXES", "REFRESH ANN INDEX ga1", "DROP ANN INDEX ga1", "ga1",
        ),
        (
            "CREATE SIGNATURES gg1 FROM sequences ON tokens ID doc_id R 32 BANDS 8 SEED 5",
            "SHOW SIGNATURES", "REFRESH SIGNATURES gg1", "DROP SIGNATURES gg1", "gg1",
        ),
    ]
    for create, show, refresh, drop, name in families:
        made = approx_sql(spark, create, tables, catalog=cat).collect()
        assert len(made) == 1 and made[0]["name"] == name, create
        listed = {r["name"] for r in approx_sql(spark, show, catalog=cat).collect()}
        assert name in listed, show
        ref = approx_sql(spark, refresh, catalog=cat).collect()[0]
        assert ref["name"] == name and ref["new_files"] == 0, refresh
        dropped = approx_sql(spark, drop, catalog=cat).collect()[0]
        assert dropped["dropped"] is True, drop
        again = approx_sql(spark, drop, catalog=cat).collect()[0]
        assert again["dropped"] is False, f"{drop} (second time)"
        assert name not in {
            r["name"] for r in approx_sql(spark, show, catalog=cat).collect()
        }


def test_ddl_malformed_sweep(spark, ddl_env):
    """Every malformed registry statement refuses with OUR ValueError whose
    message names the problem — never a bare float()/json traceback, never
    a mis-parse into Spark SQL."""
    tables, cat = ddl_env
    cases = [
        # truncated statements fall to the family usage error
        ("CREATE SAMPLE s FROM", "unsupported DDL"),
        ("CREATE SKETCHES s FROM sequences", "unsupported DDL"),
        ("CREATE ANN INDEX a FROM emb KIND srp", "unsupported DDL"),
        ("CREATE SIGNATURES g FROM sequences", "unsupported DDL"),
        ("REFRESH SAMPLE", "unsupported DDL"),
        ("DROP SKETCHES", "unsupported DDL"),
        # wrong enum values never reach the catalog half-parsed
        ("CREATE SAMPLE s FROM sequences KIND bogus RATIO 0.1", "unsupported DDL"),
        ("CREATE ANN INDEX a FROM emb KIND flann ON embedding ID vec_id", "unsupported DDL"),
        # bad sketch kind and non-numeric parameter: descriptive, not float()
        ("CREATE SKETCHES s FROM sequences KINDS wavelet(doc_id)", "unknown sketch kind"),
        ("CREATE SKETCHES s FROM sequences KINDS hll(doc_id, p=bogus)", "must be numeric"),
        ("CREATE SKETCHES s FROM sequences KINDS hll(doc_id, p14)", "key=value"),
        ("CREATE SKETCHES s FROM sequences KINDS hll(, p=14)", "column name"),
        # malformed FRACTIONS json and a regex-passing non-number RATIO
        (
            "CREATE SAMPLE s FROM sequences KIND stratified ON source FRACTIONS '{not json'",
            "JSON object",
        ),
        ("CREATE SAMPLE s FROM sequences KIND uniform RATIO 1.2.3", "must be a number"),
        # unknown names on the read/maintain side
        ("REFRESH SKETCHES never_made", "never_made"),
        ("REFRESH SAMPLE never_made", "never_made"),
        ("REFRESH ANN INDEX never_made", "never_made"),
        ("REFRESH SIGNATURES never_made", "never_made"),
        # signature parameter contract (r divisible by bands)
        (
            "CREATE SIGNATURES g FROM sequences ON tokens ID doc_id R 30 BANDS 8",
            "divisible",
        ),
    ]
    for stmt, needle in cases:
        with pytest.raises(ValueError, match=needle):
            approx_sql(spark, stmt, tables, catalog=cat)
    # stratified without fractions: the catalog's own contract error
    with pytest.raises(ValueError, match="stratified"):
        approx_sql(
            spark, "CREATE SAMPLE s FROM sequences KIND stratified RATIO 0.1",
            tables, catalog=cat,
        )
    # duplicate CREATE without OR REPLACE: named, actionable
    approx_sql(
        spark, "CREATE SAMPLE dup1 FROM sequences KIND uniform RATIO 0.2",
        tables, catalog=cat,
    )
    try:
        with pytest.raises(ValueError, match="already exists"):
            approx_sql(
                spark, "CREATE SAMPLE dup1 FROM sequences KIND uniform RATIO 0.2",
                tables, catalog=cat,
            )
        # ... and OR REPLACE succeeds where the bare CREATE refused
        out = approx_sql(
            spark, "CREATE OR REPLACE SAMPLE dup1 FROM sequences KIND uniform RATIO 0.3",
            tables, catalog=cat,
        ).collect()
        assert len(out) == 1
    finally:
        approx_sql(spark, "DROP SAMPLE dup1", catalog=cat)


def test_ddl_head_only_near_misses(spark, ddl_env):
    """Statements that merely RESEMBLE registry DDL are not claimed: they
    fall through to Spark SQL (whose own error proves the fall-through) or
    to the registry usage error only when the head genuinely matches."""
    tables, cat = ddl_env
    from pyspark.errors.exceptions.captured import AnalysisException

    # Spark's own DDL over tables that share the keywords passes through
    for stmt in (
        "DROP TABLE samples_t",
        "REFRESH TABLE sketches_t",
        "SELECT * FROM ann_indexes_t",
        "SHOW TABLES IN missing_db_xyz",
    ):
        with pytest.raises(AnalysisException):
            approx_sql(spark, stmt, tables, catalog=cat)
    # registry DDL without a catalog is refused with the catalog hint
    with pytest.raises(ValueError, match="catalog"):
        approx_sql(spark, "SHOW SAMPLES", tables, catalog=None)


def test_explain_statement_kind_sweep(spark, ddl_env):
    """EXPLAIN classifies every statement family without executing it —
    DDL, exact pass-through, single-table approx, CTE, derived table —
    and EXPLAIN of garbage raises our error, not a traceback."""
    tables, cat = ddl_env

    def kind(stmt):
        rows = {r["property"]: r["value"] for r in
                approx_sql(spark, f"EXPLAIN {stmt}", tables, catalog=cat).collect()}
        return rows["statement_kind"], rows

    k, _ = kind("CREATE SAMPLE zz FROM sequences KIND uniform RATIO 0.1")
    assert k == "ddl"
    # EXPLAIN of DDL must not have created anything
    assert not cat.sample_exists("zz")
    # an exact EXPLAIN is Spark's own statement — verbatim pass-through
    # (A4), so it returns Spark's native plan frame, not our report
    native = approx_sql(
        spark, "EXPLAIN SELECT count(*) FROM sequences", tables, catalog=cat
    )
    assert native.columns == ["plan"]
    assert "count" in native.collect()[0]["plan"]
    k, rows = kind("SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source")
    assert k in ("approx", "single_table_approx", "aggregate") or "route" in rows
    k, _ = kind(
        "WITH big AS (SELECT * FROM sequences WHERE n_tok > 100) "
        "SELECT APPROX_COUNT(0.5) FROM big"
    )
    assert k == "cte"
    k, _ = kind(
        "SELECT APPROX_SUM(est_count, 0.5) FROM "
        "(SELECT APPROX_COUNT(0.5) FROM sequences GROUP BY source)"
    )
    assert k == "derived_table"


# ---------------------------------------------------------------------------
# Sketch-merge set operations (A17 exceeded): APPROX_COUNT_DISTINCT over a
# derived-table UNION/INTERSECT/EXCEPT answered from per-side sketch states
# — the sides are never distinct-shuffled. Everything the route cannot
# fully parse must FALL BACK to the generic derived-table path, not refuse.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setop_tables(spark, tmp_path_factory):
    """Two overlapping key spaces: ta.k ∈ [0, 3000), tb.j ∈ [2000, 6000) —
    so union, intersection, and difference are all non-trivial."""
    rng = np.random.default_rng(5)
    a = pd.DataFrame(
        {"k": rng.integers(0, 3000, 20000), "val": rng.normal(size=20000).round(3)}
    )
    b = pd.DataFrame({"j": rng.integers(2000, 6000, 30000)})
    d = tmp_path_factory.mktemp("setop5")
    pa_, pb = str(d / "a"), str(d / "b")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    return {"ta": pa_, "tb": pb}, set(a["k"]), set(b["j"])


def _setop_q(op, rse="0.01", where=""):
    return (
        f"SELECT APPROX_COUNT_DISTINCT(k, {rse}) FROM "
        f"(SELECT k FROM ta{where} {op} SELECT j AS k FROM tb{where and where.replace('k', 'j')})"
    )


def test_setop_union_equals_single_sketch_exactly(spark, setop_tables):
    """Register-wise HLL merge IS set union: the set-op route's estimate is
    EXACTLY the single-table estimate over the materialized UNION ALL —
    merge associativity, surfaced at the SQL layer."""
    t, ka, kb = setop_tables
    merged = approx_sql(spark, _setop_q("UNION"), t).collect()[0]
    u = (
        spark.read.parquet(t["ta"]).select("k")
        .unionByName(spark.read.parquet(t["tb"]).selectExpr("j AS k"))
    )
    u.createOrReplaceTempView("u_exact")
    try:
        single = approx_sql(
            spark, "SELECT APPROX_COUNT_DISTINCT(k, 0.01) FROM u_exact", None
        ).collect()[0]
    finally:
        spark.catalog.dropTempView("u_exact")
    # the single-statement path emits (estimate, rse_bound); values match
    # EXACTLY because register-wise max over per-side states equals the
    # registers of one sketch over the concatenation
    assert merged["approx_count_distinct_k"] == single["estimate"]
    assert merged["approx_count_distinct_k"] == pytest.approx(len(ka | kb), rel=0.05)


def test_setop_union_all_same_answer_and_nary(spark, setop_tables):
    """UNION ALL answers identically to UNION (HLL is duplicate-
    insensitive), and a THREE-side union merges n-ary."""
    t, ka, kb = setop_tables
    u1 = approx_sql(spark, _setop_q("UNION"), t).collect()[0][0]
    u2 = approx_sql(spark, _setop_q("UNION ALL"), t).collect()[0][0]
    assert u1 == u2
    q3 = (
        "SELECT APPROX_COUNT_DISTINCT(k, 0.01) FROM "
        "(SELECT k FROM ta UNION SELECT j AS k FROM tb UNION SELECT k FROM ta)"
    )
    assert approx_sql(spark, q3, t).collect()[0][0] == u1  # idempotent merge


def test_setop_intersect_and_except_within_bound(spark, setop_tables):
    """INTERSECT (J·|A ∪ B|) and EXCEPT (|A| − |A ∩ B|) land within 3× the
    composed bound (+2 discrete slack) of the exact set sizes."""
    t, ka, kb = setop_tables
    for op, exact in (("INTERSECT", len(ka & kb)), ("EXCEPT", len(ka - kb))):
        r = approx_sql(spark, _setop_q(op), t).collect()[0]
        est, err = r["approx_count_distinct_k"], r["approx_count_distinct_k_err"]
        assert abs(est - exact) <= 3 * err + 2, (op, est, exact, err)


def test_setop_side_where_and_alias(spark, setop_tables):
    """Per-side WHERE is honored (applied before the side's sketch build)
    and an outer AS alias names the output columns."""
    t, ka, kb = setop_tables
    q = (
        "SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS n_low FROM "
        "(SELECT k FROM ta WHERE k < 2500 UNION SELECT j AS k FROM tb WHERE j < 2500)"
    )
    r = approx_sql(spark, q, t).collect()[0]
    exact = len({x for x in ka if x < 2500} | {x for x in kb if x < 2500})
    assert set(r.asDict()) == {"n_low", "n_low_err"}
    assert abs(r["n_low"] - exact) <= 3 * r["n_low_err"] + 2


def test_setop_numeric_mix_widens_like_sql(spark, setop_tables):
    """A bigint side against a double side stays on the sketch route: the
    union WIDENS both to double — the same coercion Spark SQL applies to
    the materialized set operation — so the estimate matches the exact
    count over the coerced union. (Mixed NON-numeric sides decline to the
    generic path instead; see the review-pass-3 tests.)"""
    t, ka, _ = setop_tables
    import pandas as _pd

    a = _pd.read_parquet(t["ta"])
    exact = len(set(a.k.astype("float64")) | set(a.val))
    r = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
        "(SELECT k FROM ta UNION SELECT val AS k FROM ta)",
        t,
    ).collect()[0]
    assert abs(r["d"] - exact) <= 3 * r["d_err"] + 2


def test_setop_fallback_shapes_still_answer(spark, setop_tables):
    """Shapes outside the sketch route — GROUP BY tail, non-distinct outer
    aggregate, mixed operators — fall back to the generic derived-table
    path and still answer correctly (never a refusal)."""
    t, ka, kb = setop_tables
    # mixed operators: INTERSECT binds tighter, Spark resolves it on the
    # materialized path; the answer is |A ∪ (B ∩ B)| = |A ∪ B|
    mixed = (
        "SELECT APPROX_COUNT_DISTINCT(k, 0.01) FROM "
        "(SELECT k FROM ta UNION SELECT j AS k FROM tb INTERSECT SELECT j AS k FROM tb)"
    )
    r = approx_sql(spark, mixed, t).collect()[0]
    exact = len(ka | kb)
    assert abs(r[0] - exact) <= 0.05 * exact
    # non-COUNT-DISTINCT outer aggregate over UNION ALL
    s = approx_sql(
        spark,
        "SELECT APPROX_COUNT(0.5) FROM (SELECT k FROM ta UNION ALL SELECT j AS k FROM tb)",
        t,
    ).collect()[0]
    assert abs(s["est_count"] - 50000) <= s["count_err"] * WIDE
    # GROUP BY tail (the set-op route is global-only)
    g = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(k, 0.02) FROM "
        "(SELECT k FROM ta WHERE k < 4 UNION ALL SELECT j AS k FROM tb WHERE j < 4) "
        "GROUP BY k",
        t,
    ).collect()
    assert {int(row["group"]) for row in g} == {x for x in range(4)} & (ka | kb)


def test_setop_explain_matches_execution_route(spark, setop_tables):
    """EXPLAIN classifies the sketch-merge shapes as approx_setop and the
    fallback shapes as derived_table — the same _setop_route decision."""
    t, *_ = setop_tables
    rows = {
        r["property"]: r["value"]
        for r in approx_sql(spark, "EXPLAIN " + _setop_q("INTERSECT"), t).collect()
    }
    assert rows["statement_kind"] == "approx_setop"
    assert rows["set_operation"] == "intersect"
    assert "minhash" in rows["sketches"]
    rows = {
        r["property"]: r["value"]
        for r in approx_sql(
            spark,
            "EXPLAIN SELECT APPROX_COUNT(0.5) FROM "
            "(SELECT k FROM ta UNION ALL SELECT j AS k FROM tb)",
            t,
        ).collect()
    }
    assert rows["statement_kind"] == "derived_table"


# ---------------------------------------------------------------------------
# UNION → UNION ALL rewrite: when every outer aggregate is duplicate-
# insensitive (APPROX_COUNT_DISTINCT), the derived table's distinct shuffle
# is elided — for the GENERAL shapes the state-merge route cannot claim
# (GROUP BY, multi-agg heads, expression sides). Answer identical by
# construction (row dedup never changes a column's distinct-value set).
# ---------------------------------------------------------------------------


def _explain_props(spark, q, t, catalog=None):
    return {
        r["property"]: r["value"]
        for r in approx_sql(spark, "EXPLAIN " + q, t, catalog=catalog).collect()
    }


def test_union_rewrite_grouped_matches_exact_and_union_all(spark, setop_tables):
    """Grouped COUNT DISTINCT over a UNION: rewrite applies (EXPLAIN says
    so), estimates land within bound of exact per-group counts, and the
    answer is BYTE-IDENTICAL to the explicit UNION ALL statement — the two
    texts reach the same plan."""
    t, ka, kb = setop_tables
    q = (
        "SELECT APPROX_COUNT_DISTINCT(k, 0.02) FROM "
        "(SELECT k % 3 AS g, k FROM ta UNION SELECT j % 3 AS g, j AS k FROM tb) "
        "GROUP BY g"
    )
    assert "union_rewrite" in _explain_props(spark, q, t)
    rows = {int(r["group"]): r for r in approx_sql(spark, q, t).collect()}
    allk = ka | kb
    for g in (0, 1, 2):
        exact = len({x for x in allk if x % 3 == g})
        est, rel = rows[g][1], rows[g][2]  # grouped path: relative bound
        assert abs(est - exact) <= 3 * rel * est + 2, (g, est, exact)
    ua = approx_sql(spark, q.replace("UNION SELECT", "UNION ALL SELECT"), t)
    assert sorted(map(tuple, ua.collect())) == sorted(
        map(tuple, approx_sql(spark, q, t).collect())
    )


def test_union_rewrite_multiagg_and_where_tail(spark, setop_tables):
    """Multi-aggregate COUNT-DISTINCT head + WHERE tail on the derived
    output both ride the rewrite (shapes the state-merge route declines)."""
    t, ka, kb = setop_tables
    q = (
        "SELECT APPROX_COUNT_DISTINCT(k, 0.01), APPROX_COUNT_DISTINCT(g, 0.01) "
        "FROM (SELECT k % 100 AS g, k FROM ta UNION SELECT j % 100 AS g, j AS k FROM tb) "
        "WHERE k >= 1000"
    )
    assert "union_rewrite" in _explain_props(spark, q, t)
    r = approx_sql(spark, q, t).collect()[0]
    exact_k = len({x for x in (ka | kb) if x >= 1000})
    exact_g = len({x % 100 for x in (ka | kb) if x >= 1000})
    assert abs(r["approx_count_distinct_k"] - exact_k) <= 3 * r["approx_count_distinct_k_err"] + 2
    assert abs(r["approx_count_distinct_g"] - exact_g) <= 3 * r["approx_count_distinct_g_err"] + 2


def test_union_rewrite_skipped_for_duplicate_sensitive_head(spark, setop_tables):
    """APPROX_COUNT over UNION counts DISTINCT rows — the rewrite would
    change the answer, so it must NOT apply; the materialized path still
    answers correctly."""
    t, ka, kb = setop_tables
    q = (
        "SELECT APPROX_COUNT(0.5) FROM "
        "(SELECT k FROM ta UNION SELECT j AS k FROM tb)"
    )
    assert "union_rewrite" not in _explain_props(spark, q, t)
    r = approx_sql(spark, q, t).collect()[0]
    exact = len(ka | kb)  # distinct rows of the single-column union
    assert abs(r["est_count"] - exact) <= r["count_err"] * WIDE


def test_union_rewrite_skipped_for_mixed_setops(spark, setop_tables):
    """A depth-0 INTERSECT/EXCEPT blocks the rewrite — their semantics
    depend on row multiplicity; Spark resolves precedence on the
    materialized path."""
    t, ka, kb = setop_tables
    q = (
        "SELECT APPROX_COUNT_DISTINCT(k, 0.02) FROM "
        "(SELECT k % 5 AS g, k FROM ta UNION SELECT j % 5 AS g, j AS k FROM tb "
        "EXCEPT SELECT j % 5 AS g, j AS k FROM tb) GROUP BY g"
    )
    assert "union_rewrite" not in _explain_props(spark, q, t)
    rows = {int(r["group"]): r for r in approx_sql(spark, q, t).collect()}
    only_a = ka - kb
    for g in sorted({x % 5 for x in only_a}):
        exact = len({x for x in only_a if x % 5 == g})
        assert abs(rows[g][1] - exact) <= 3 * rows[g][2] * rows[g][1] + 2, (
            g, rows[g][1], exact)


# ---------------------------------------------------------------- aliases


def test_agg_alias_single_paths(spark, sub_tables):
    """SELECT APPROX_X(...) AS name: the estimate column takes the user's
    name and the companion bound becomes name_err in the SAME units as the
    estimate (rse_bound × estimate for HLL — the _multi_agg_routed
    normalization), name_rank_err for percentiles (rank units)."""
    t, fact, _ = sub_tables
    out = approx_sql(spark, "SELECT APPROX_COUNT_DISTINCT(k) AS d_k FROM fact", t)
    assert out.columns == ["d_k", "d_k_err"]
    r = out.collect()[0]
    exact = fact["k"].nunique()
    assert abs(r["d_k"] - exact) <= r["d_k_err"] * WIDE + 2

    out = approx_sql(
        spark, "SELECT APPROX_SUM(val, 0.5) AS total FROM fact GROUP BY seg", t
    )
    assert set(out.columns) == {"seg", "total", "total_err"}
    for r in out.collect():
        exact = float(fact[fact["seg"] == r["seg"]]["val"].sum())
        assert abs(r["total"] - exact) <= r["total_err"] * WIDE

    out = approx_sql(spark, "SELECT APPROX_PERCENTILE(val, 0.5) AS med FROM fact", t)
    assert out.columns == ["q", "med", "med_rank_err"]


def test_agg_alias_multi_and_tails(spark, sub_tables):
    """Aliases in multi-aggregate lists rename only the named slots; an
    ORDER BY on the alias works (the body recursion renames before the tail
    applies); duplicate aliases are refused descriptively."""
    t, fact, _ = sub_tables
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(k) AS d, APPROX_SUM(val, 0.5) FROM fact "
        "GROUP BY seg",
        t,
    )
    assert {"seg", "d", "d_err", "approx_sum_val", "approx_sum_val_err"} == set(out.columns)

    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(k) AS d_k FROM fact "
        "GROUP BY seg ORDER BY d_k DESC LIMIT 2",
        t,
    )
    rows = out.collect()
    assert len(rows) == 2 and rows[0]["d_k"] >= rows[1]["d_k"]

    with pytest.raises(ValueError, match="duplicate alias"):
        approx_sql(
            spark,
            "SELECT APPROX_SUM(val, 0.5) AS s, APPROX_AVG(val, 0.5) AS s FROM fact",
            t,
        )


def test_agg_alias_derived_table_union(spark, setop_tables):
    """Aliases compose with derived-table set operations: the rewritten
    outer statement carries the alias through the view recursion."""
    t, ka, kb = setop_tables
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(k, 0.02) AS d FROM "
        "(SELECT k % 5 AS g, k FROM ta UNION SELECT j % 5 AS g, j AS k FROM tb) "
        "GROUP BY g",
        t,
    )
    assert {"d", "d_err"} <= set(out.columns)
    rows = {int(r["group"]): r for r in out.collect()}
    both = ka | kb
    for g in sorted({x % 5 for x in both}):
        exact = len({x for x in both if x % 5 == g})
        assert abs(rows[g]["d"] - exact) <= rows[g]["d_err"] * WIDE + 2


def test_agg_alias_on_joins(spark, sub_tables):
    """AS name on a join statement renames the named aggregate's estimate
    and bound; the companion count columns keep their default names."""
    t, fact, dim = sub_tables
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(val, 0.5) AS s FROM fact JOIN dim ON fact.k = dim.j",
        t,
    )
    assert {"s", "s_err"} <= set(out.columns)
    r = out.collect()[0]
    exact = float(fact[fact["k"].isin(set(dim["j"]))]["val"].sum())
    assert abs(r["s"] - exact) <= r["s_err"] * WIDE


# ------------------------------------------------------- grouped set-ops


def test_grouped_intersect_except_state_merge(spark, setop_tables):
    """GROUP BY over INTERSECT/EXCEPT takes the sketch-merge route (one
    build pass keyed by side × group, never materialized), per-group
    estimates within the emitted absolute bound, group key restored to its
    native type under the user's name."""
    t, ka, kb = setop_tables
    for op, sel in (("INTERSECT", ka & kb), ("EXCEPT", ka - kb)):
        q = (
            "SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
            f"(SELECT k, k % 3 AS g FROM ta {op} "
            "SELECT j AS k, j % 3 AS g FROM tb) GROUP BY g"
        )
        props = _explain_props(spark, q, t)
        assert props.get("statement_kind") == "approx_setop"
        assert props.get("group_by") == "g"
        out = approx_sql(spark, q, t)
        assert out.columns == ["g", "d", "d_err"]
        rows = {int(r["g"]): r for r in out.collect()}
        for g in sorted({x % 3 for x in sel}):
            exact = len({x for x in sel if x % 3 == g})
            r = rows[g]
            assert abs(r["d"] - exact) <= 3 * r["d_err"] + 2, (op, g, r["d"], exact)


def test_grouped_setop_presence_semantics(spark):
    """Per-group row production matches the exact operation: EXCEPT emits
    exactly the left side's groups (a group only in B is absent, a group
    with no B overlap keeps |A_g| alone); INTERSECT omits groups either
    side lacks."""
    a = spark.createDataFrame(
        pd.DataFrame({"k": list(range(100)) + list(range(200, 300)),
                      "g": ["a"] * 100 + ["b"] * 100})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"k": list(range(50)) + list(range(400, 500)),
                      "g": ["a"] * 50 + ["c"] * 100})
    )
    t = {"ta": a, "tb": b}
    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
        "(SELECT k, g FROM ta EXCEPT SELECT k, g FROM tb) GROUP BY g",
        t,
    )
    rows = {r["g"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}  # 'c' only in B — absent, like the exact op
    assert abs(rows["a"]["d"] - 50) <= 3 * rows["a"]["d_err"] + 2
    assert abs(rows["b"]["d"] - 100) <= 3 * rows["b"]["d_err"] + 2

    out = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
        "(SELECT k, g FROM ta INTERSECT SELECT k, g FROM tb) GROUP BY g",
        t,
    )
    rows = {r["g"]: r for r in out.collect()}
    assert set(rows) == {"a"}  # only group on both sides with overlap
    assert abs(rows["a"]["d"] - 50) <= 3 * rows["a"]["d_err"] + 2


def test_grouped_setop_distributed_path_matches_driver(spark):
    """grouped_setop_df's two routes (driver collect vs
    groupBy+applyInPandas) return identical rows for the same states."""
    from sketchlib.planner import hll_params
    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import grouped_setop_df

    a = spark.range(0, 5000).selectExpr(
        "id AS _v", "CAST(id % 7 AS STRING) AS _g", "'s0' AS _side")
    b = spark.range(2500, 7500).selectExpr(
        "id AS _v", "CAST(id % 7 AS STRING) AS _g", "'s1' AS _side")
    states = build_sketches(
        a.unionByName(b),
        [SketchSpec("hll_v", "hll", "_v", {"p": hll_params(0.01)["p"]}),
         SketchSpec("mh_v", "minhash", "_v", {"r": 1024})],
        group_by=["_side", "_g"],
    ).persist()
    for op in ("union", "intersect", "except"):
        mh = None if op == "union" else "mh_v"
        drv = grouped_setop_df(
            spark, states, op, "hll_v", mh, ["s0", "s1"], distributed=False
        ).collect()
        dst = grouped_setop_df(
            spark, states, op, "hll_v", mh, ["s0", "s1"], distributed=True
        ).collect()
        assert sorted(map(tuple, drv)) == sorted(map(tuple, dst)), op
    states.unpersist()


def test_grouped_setop_key_type_mismatch_declines_to_generic(spark):
    """Sides projecting a bigint key against a string key DECLINE the
    sketch-merge route (stringified-key merging would diverge from Spark
    SQL's coercion) — the generic derived-table path materializes the set
    operation and still answers."""
    a = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3, 4], "g": [1, 2, 1, 2]}))
    b = spark.createDataFrame(pd.DataFrame({"k": [3, 4], "g": ["1", "2"]}))
    t = {"ta": a, "tb": b}
    q = ("SELECT APPROX_COUNT_DISTINCT(k) AS d FROM "
         "(SELECT k, g FROM ta EXCEPT SELECT k, g FROM tb) GROUP BY g")
    props = _explain_props(spark, q, t)
    assert props.get("statement_kind") != "approx_setop"
    rows = approx_sql(spark, q, t).collect()
    assert len(rows) > 0  # answered via Spark SQL's own coercion semantics


def test_grouped_union_left_to_rewrite(spark, setop_tables):
    """Grouped UNION is deliberately NOT claimed by the state-merge route —
    the UNION ALL rewrite builds the same zero-shuffle plan without the
    side tag; EXPLAIN must report the rewrite, not approx_setop."""
    t, ka, kb = setop_tables
    q = (
        "SELECT APPROX_COUNT_DISTINCT(k, 0.02) FROM "
        "(SELECT k, k % 3 AS g FROM ta UNION SELECT j AS k, j % 3 AS g FROM tb) "
        "GROUP BY g"
    )
    props = _explain_props(spark, q, t)
    assert props.get("statement_kind") != "approx_setop"
    assert "union_rewrite" in props


def test_setop_answered_from_persisted_states(spark, tmp_path):
    """A5 extended to set operations: when each side has a registered
    sketch set holding HLL (+ MinHash) on its column, the statement is
    answered from states alone — proven by DELETING both base tables first.
    A grouped registration serves too (merging its per-group states IS the
    whole-table sketch)."""
    import shutil

    from sketchlib.planner import hll_params
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(11)
    a = pd.DataFrame({"k": rng.integers(0, 4000, 30000).astype("int64"),
                      "g": rng.integers(0, 3, 30000).astype(str)})
    b = pd.DataFrame({"k": rng.integers(2000, 8000, 30000).astype("int64")})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    exact = {"union": len(set(a.k) | set(b.k)),
             "intersect": len(set(a.k) & set(b.k)),
             "except": len(set(a.k) - set(b.k))}
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    specs = [SketchSpec("h_k", "hll", "k", {"p": hll_params(0.01)["p"]}),
             SketchSpec("m_k", "minhash", "k", {"r": 1024})]
    cat.create("sa", pa_, specs, group_by="g")  # grouped on purpose
    cat.create("sb", pb, specs, group_by=None)
    t = {"ta": pa_, "tb": pb}
    shutil.rmtree(pa_)
    shutil.rmtree(pb)
    for op in ("UNION", "INTERSECT", "EXCEPT"):
        q = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS est FROM "
             f"(SELECT k FROM ta {op} SELECT k FROM tb)")
        props = {r["property"]: r["value"]
                 for r in approx_sql(spark, "EXPLAIN " + q, t, catalog=cat).collect()}
        assert "PERSISTED STATES" in props["route"], op
        assert props["artifacts"] == "sa, sb"
        r = approx_sql(spark, q, t, catalog=cat).collect()[0]
        assert abs(r["est"] - exact[op.lower()]) <= 3 * r["est_err"] + 2, (
            op, r["est"], exact[op.lower()])


def test_setop_states_compat_gates_fall_back_to_scan(spark, tmp_path):
    """Machine-checked compatibility: mismatched MinHash (r, seed) across
    sides (noise, not J), a missing MinHash for INTERSECT, or an HLL p too
    coarse for the statement's explicit rse each fall back to the scan
    route — EXPLAIN reports the one-pass build, and the answer (bases
    intact here) stays within bound."""
    from sketchlib.planner import hll_params
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(13)
    a = pd.DataFrame({"k": rng.integers(0, 2000, 15000).astype("int64")})
    b = pd.DataFrame({"k": rng.integers(1000, 3000, 15000).astype("int64")})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    p = hll_params(0.01)["p"]
    cat.create("sa", pa_, [SketchSpec("h", "hll", "k", {"p": p}),
                           SketchSpec("m", "minhash", "k", {"r": 1024, "seed": 17})],
               group_by=None)
    cat.create("sb", pb, [SketchSpec("h", "hll", "k", {"p": p}),
                          SketchSpec("m", "minhash", "k", {"r": 1024, "seed": 99})],
               group_by=None)
    t = {"ta": pa_, "tb": pb}
    q = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS est FROM "
         "(SELECT k FROM ta INTERSECT SELECT k FROM tb)")
    props = {r["property"]: r["value"]
             for r in approx_sql(spark, "EXPLAIN " + q, t, catalog=cat).collect()}
    assert "PERSISTED STATES" not in props["route"]  # seed mismatch → scan
    r = approx_sql(spark, q, t, catalog=cat).collect()[0]
    exact = len(set(a.k) & set(b.k))
    assert abs(r["est"] - exact) <= 3 * r["est_err"] + 2

    # UNION has no MinHash requirement — same registrations DO serve it
    qu = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS est FROM "
          "(SELECT k FROM ta UNION SELECT k FROM tb)")
    props = {r["property"]: r["value"]
             for r in approx_sql(spark, "EXPLAIN " + qu, t, catalog=cat).collect()}
    assert "PERSISTED STATES" in props["route"]

    # explicit rse finer than the registered p achieves → scan
    qr = ("SELECT APPROX_COUNT_DISTINCT(k, 0.001) AS est FROM "
          "(SELECT k FROM ta UNION SELECT k FROM tb)")
    props = {r["property"]: r["value"]
             for r in approx_sql(spark, "EXPLAIN " + qr, t, catalog=cat).collect()}
    assert "PERSISTED STATES" not in props["route"]


def test_grouped_setop_from_persisted_states(spark, tmp_path):
    """Grouped set-ops answer from states when BOTH sides' registrations
    are grouped exactly by the statement's key column — zero base-table
    scan (bases deleted first). Grouped UNION claims the route only here;
    without states it declines to the rewrite (separate test)."""
    import shutil

    from sketchlib.planner import hll_params
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(23)
    a = pd.DataFrame({"k": rng.integers(0, 3000, 25000).astype("int64")})
    a["g"] = (a.k % 3).astype("int64")
    b = pd.DataFrame({"k": rng.integers(1500, 4500, 25000).astype("int64")})
    b["g"] = (b.k % 3).astype("int64")
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    sa, sb = set(a.k), set(b.k)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    specs = [SketchSpec("h_k", "hll", "k", {"p": hll_params(0.01)["p"]}),
             SketchSpec("m_k", "minhash", "k", {"r": 1024})]
    cat.create("ga", pa_, specs, group_by="g")
    cat.create("gb", pb, specs, group_by="g")
    t = {"ta": pa_, "tb": pb}
    shutil.rmtree(pa_)
    shutil.rmtree(pb)
    for op, sel in (("UNION", sa | sb), ("INTERSECT", sa & sb), ("EXCEPT", sa - sb)):
        q = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
             f"(SELECT k, g FROM ta {op} SELECT k, g FROM tb) GROUP BY g")
        props = _explain_props(spark, q, t, catalog=cat)
        assert "PERSISTED STATES" in props["route"], op
        rows = {r["g"]: r for r in approx_sql(spark, q, t, catalog=cat).collect()}
        exact = {}
        for k in sel:
            exact[int(k % 3)] = exact.get(int(k % 3), 0) + 1
        # the key column comes back in its recorded native type (bigint),
        # matching the scan route's schema for the same statement
        assert set(rows) == set(exact), op
        for g, ex in exact.items():
            assert abs(rows[g]["d"] - ex) <= 3 * rows[g]["d_err"] + 2, (op, g)


def test_grouped_setop_states_require_matching_grouping(spark, tmp_path):
    """A side registered UNGROUPED (or grouped by a different column)
    cannot serve a grouped set-op — its states don't line up with the
    statement's groups; the resolver declines and the scan route answers."""
    from sketchlib.planner import hll_params
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(29)
    a = pd.DataFrame({"k": rng.integers(0, 2000, 12000).astype("int64")})
    a["g"] = (a.k % 3).astype("int64")
    b = pd.DataFrame({"k": rng.integers(1000, 3000, 12000).astype("int64")})
    b["g"] = (b.k % 3).astype("int64")
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    specs = [SketchSpec("h_k", "hll", "k", {"p": hll_params(0.01)["p"]}),
             SketchSpec("m_k", "minhash", "k", {"r": 1024})]
    cat.create("ga", pa_, specs, group_by="g")
    cat.create("gb", pb, specs, group_by=None)  # ungrouped — cannot serve
    t = {"ta": pa_, "tb": pb}
    q = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
         "(SELECT k, g FROM ta INTERSECT SELECT k, g FROM tb) GROUP BY g")
    props = _explain_props(spark, q, t, catalog=cat)
    assert "PERSISTED STATES" not in props["route"]
    sel = set(a.k) & set(b.k)
    rows = {int(r["g"]): r for r in approx_sql(spark, q, t, catalog=cat).collect()}
    for g in {k % 3 for k in sel}:
        exact = len({k for k in sel if k % 3 == g})
        assert abs(rows[g]["d"] - exact) <= 3 * rows[g]["d_err"] + 2


# ---------------------------------------------------------------------------
# Round-5 review pass 3: set-op bound finiteness, type gates, alias collisions
# ---------------------------------------------------------------------------


def test_setop_disjoint_sides_finite_bounds(spark, tmp_path):
    """INTERSECT/EXCEPT over DISJOINT sides: J = 0 makes the relative bound
    form inf (and err = inf·0.0 = NaN) — the absolute composition must stay
    finite on both the scan and the states route."""
    import math

    a = pd.DataFrame({"k": np.arange(0, 1000, dtype="int64")})
    b = pd.DataFrame({"k": np.arange(50_000, 51_000, dtype="int64")})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    t = {"ta": pa_, "tb": pb}
    for op, exact in (("INTERSECT", 0), ("EXCEPT", 1000)):
        q = (f"SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
             f"(SELECT k FROM ta {op} SELECT k FROM tb)")
        r = approx_sql(spark, q, t).collect()[0]
        assert math.isfinite(r["d_err"]), (op, r["d_err"])
        assert abs(r["d"] - exact) <= 3 * r["d_err"] + 2, op


def test_difference_estimate_finite_on_disjoint_states(spark):
    """difference_estimate composes the intersection error absolutely —
    finite at J = 0 (the old rel-form propagated inf·0 = NaN)."""
    import math

    from sketchlib.planner import hll_params
    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import difference_estimate, intersection_abs_estimate

    df = spark.createDataFrame(
        pd.DataFrame({
            "k": list(range(1000)) + list(range(90_000, 91_000)),
            "side": ["a"] * 1000 + ["b"] * 1000,
        })
    )
    specs = [SketchSpec("h", "hll", "k", {"p": hll_params(0.01)["p"]}),
             SketchSpec("m", "minhash", "k", {"r": 512})]
    states = build_sketches(df, specs, group_by="side")
    inter, ierr = intersection_abs_estimate(states, "h", "m", "a", "b")
    assert math.isfinite(ierr) and abs(inter) <= ierr + 2
    est, err = difference_estimate(states, "h", "m", "a", "b")
    assert math.isfinite(err) and abs(est - 1000) <= 3 * err + 2


def test_setop_numeric_family_sides_widen_and_answer(spark, tmp_path):
    """int vs bigint sides stay on the sketch-merge scan route (lossless
    widening, hash-compatible after the union widens both) — previously an
    over-eager type check raised on any simpleString difference."""
    a = pd.DataFrame({"k": np.arange(0, 2000, dtype="int32")})
    b = pd.DataFrame({"k": np.arange(1000, 3000, dtype="int64")})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    t = {"ta": pa_, "tb": pb}
    q = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
         "(SELECT k FROM ta UNION SELECT k FROM tb)")
    props = {r["property"]: r["value"]
             for r in approx_sql(spark, "EXPLAIN " + q, t).collect()}
    assert props.get("statement_kind") == "approx_setop"
    r = approx_sql(spark, q, t).collect()[0]
    assert abs(r["d"] - 3000) <= 3 * r["d_err"] + 2


def test_setop_mixed_nonnumeric_sides_decline_to_generic(spark, tmp_path):
    """A string side against a bigint side declines the sketch-merge route
    (the DataFrame union's coercion silently null-casts string→bigint) and
    the generic derived-table path answers with Spark SQL's own semantics.
    EXPLAIN reports the same decline — no route divergence."""
    a = pd.DataFrame({"k": np.arange(0, 1500, dtype="int64")})
    b = pd.DataFrame({"k": [str(i) for i in range(1000, 2500)]})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    t = {"ta": pa_, "tb": pb}
    q = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
         "(SELECT k FROM ta INTERSECT SELECT k FROM tb)")
    props = {r["property"]: r["value"]
             for r in approx_sql(spark, "EXPLAIN " + q, t).collect()}
    assert props.get("statement_kind") != "approx_setop"
    exact = spark.sql(
        f"SELECT count(DISTINCT k) AS n FROM (SELECT k FROM parquet.`{pa_}` "
        f"INTERSECT SELECT k FROM parquet.`{pb}`)"
    ).collect()[0]["n"]
    r = approx_sql(spark, q, t).collect()[0]
    assert abs(r["d"] - exact) <= 3 * r["d_err"] + 2


def test_setop_states_refuse_cross_type_registrations(spark, tmp_path):
    """Registered states record the sketched column's input dtype; a bigint
    side against a string side must NOT answer from states (the kernel
    hashes the two families differently — merged registers would union
    unrelated hash spaces). The statement still answers via a scan."""
    import shutil

    from sketchlib.planner import hll_params
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    a = pd.DataFrame({"k": np.arange(0, 1200, dtype="int64")})
    b = pd.DataFrame({"k": [str(i) for i in range(600, 1800)]})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    specs = [SketchSpec("h_k", "hll", "k", {"p": hll_params(0.01)["p"]}),
             SketchSpec("m_k", "minhash", "k", {"r": 512})]
    cat.create("sa", pa_, specs, group_by=None)
    cat.create("sb", pb, specs, group_by=None)
    t = {"ta": pa_, "tb": pb}
    q = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
         "(SELECT k FROM ta UNION SELECT k FROM tb)")
    props = {r["property"]: r["value"]
             for r in approx_sql(spark, "EXPLAIN " + q, t, catalog=cat).collect()}
    assert "PERSISTED STATES" not in str(props.get("route", ""))


def test_grouped_setop_states_emit_real_null_group(spark, tmp_path):
    """A NULL group key comes back as NULL from the grouped states route,
    not as the kernel's '__null__' placeholder string."""
    import shutil

    from sketchlib.planner import hll_params
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    a = pd.DataFrame({"k": np.arange(0, 900, dtype="int64")})
    a["g"] = ["x" if i % 2 else None for i in range(900)]
    b = pd.DataFrame({"k": np.arange(450, 1350, dtype="int64")})
    b["g"] = ["x" if i % 2 else None for i in range(900)]
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    specs = [SketchSpec("h_k", "hll", "k", {"p": hll_params(0.01)["p"]}),
             SketchSpec("m_k", "minhash", "k", {"r": 512})]
    cat.create("ga", pa_, specs, group_by="g")
    cat.create("gb", pb, specs, group_by="g")
    t = {"ta": pa_, "tb": pb}
    shutil.rmtree(pa_)
    shutil.rmtree(pb)
    q = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
         "(SELECT k, g FROM ta UNION SELECT k, g FROM tb) GROUP BY g")
    props = {r["property"]: r["value"]
             for r in approx_sql(spark, "EXPLAIN " + q, t, catalog=cat).collect()}
    assert "PERSISTED STATES" in props["route"]
    rows = approx_sql(spark, q, t, catalog=cat).collect()
    keys = {r["g"] for r in rows}
    assert keys == {"x", None}, keys


def test_setop_explain_validates_rse_like_execution(spark, setop_tables):
    """EXPLAIN raises the SAME descriptive error execution raises for an
    out-of-range rse argument — the shared _setop_route validates it, so
    EXPLAIN can never report a route for a statement that cannot run."""
    t, _, _ = setop_tables
    q = ("SELECT APPROX_COUNT_DISTINCT(k, 5) FROM "
         "(SELECT k FROM ta UNION SELECT j AS k FROM tb)")
    with pytest.raises(ValueError, match="relative standard error"):
        approx_sql(spark, "EXPLAIN " + q, t)
    with pytest.raises(ValueError, match="relative standard error"):
        approx_sql(spark, q, t)


def test_alias_collision_with_other_default_raises(spark, sub_tables):
    """An alias equal to ANOTHER aggregate's default output name would leave
    two identically-named columns — refused with a descriptive error."""
    t, fact, _ = sub_tables
    q = ("SELECT APPROX_SUM(val, 0.5) AS approx_count_star, "
         "APPROX_COUNT(0.5) FROM fact")
    with pytest.raises(ValueError, match="more than once"):
        approx_sql(spark, q, t)


def test_alias_onto_same_slug_expressions_keeps_values_straight(spark, sub_tables):
    """a+b and a-b slug identically; the alias renames must target the slots
    _multi_agg actually produced (keyed on exact expression text), so each
    named column carries ITS OWN expression's estimate."""
    t, fact, _ = sub_tables
    q = ("SELECT APPROX_SUM(val+k, 0.6) AS plus_sum, "
         "APPROX_SUM(val-k, 0.6) AS minus_sum, "
         "APPROX_SUM(val+k, 0.6) AS plus_again FROM fact")
    r = approx_sql(spark, q, t).collect()[0]
    exact_plus = float((fact.val + fact.k).sum())
    exact_minus = float((fact.val - fact.k).sum())
    assert abs(r["plus_sum"] - exact_plus) <= 3.3 * r["plus_sum_err"]
    assert abs(r["minus_sum"] - exact_minus) <= 3.3 * r["minus_sum_err"]
    assert abs(r["plus_again"] - exact_plus) <= 3.3 * r["plus_again_err"]
    # the two +k columns answered from the SAME slot family; the -k column
    # must not have been swapped into either name
    assert abs(r["plus_sum"] - exact_minus) > 3.3 * r["plus_sum_err"]


# ---------------------------------------------------------------------------
# UNION ALL bodies answered from MERGED persisted states (mergeable sketches)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def merge_states_setup(spark, tmp_path_factory):
    """Two registered tables with kll+cm sketches on val, grouped and
    ungrouped variants; returns (tables, catalog, pdf_a, pdf_b)."""
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(41)
    a = pd.DataFrame({
        "val": rng.integers(0, 5000, 40000).astype("int64"),
        "g": (rng.integers(0, 3, 40000)).astype("int64"),
    })
    b = pd.DataFrame({
        "val": rng.integers(2000, 9000, 25000).astype("int64"),
        "g": (rng.integers(0, 3, 25000)).astype("int64"),
    })
    d = tmp_path_factory.mktemp("mergestates")
    pa_, pb = str(d / "ta"), str(d / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(d / "cat"))
    specs = [SketchSpec("k_val", "kll", "val", {"k": 200}),
             SketchSpec("c_val", "cm", "val", {"eps": 1e-4, "delta": 0.01})]
    cat.create("ma", pa_, specs, group_by="g")
    cat.create("mb", pb, specs, group_by="g")
    return {"ta": pa_, "tb": pb}, cat, a, b


def _props(spark, q, t, catalog=None):
    return {r["property"]: r["value"]
            for r in approx_sql(spark, "EXPLAIN " + q, t, catalog=catalog).collect()}


def test_unionall_percentile_from_merged_states(spark, merge_states_setup, tmp_path):
    """APPROX_PERCENTILE over (a UNION ALL b) answers by MERGING the two
    registrations' KLL states — grouped registrations serve the GLOBAL
    statement (merging per-group states is the whole-table sketch)."""
    t, cat, a, b = merge_states_setup
    both = pd.concat([a, b])
    q = ("SELECT APPROX_PERCENTILE(val, 0.5, 0.9) FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") == "approx_unionall_merge"
    assert "PERSISTED STATES" in props["route"]
    rows = approx_sql(spark, q, t, catalog=cat).collect()
    n = len(both)
    for r in rows:
        exact = float(np.quantile(both.val, r["q"], method="inverted_cdf"))
        rank_of = (both.val <= r["value"]).sum() / n
        assert abs(rank_of - r["q"]) <= r["rank_err_bound"] + 2.0 / n, (r, exact)


def test_unionall_percentile_grouped_from_states(spark, merge_states_setup):
    """GROUP BY over the UNION ALL merges groupwise — per-group medians fall
    within the rank bound of each group's concatenated bag."""
    t, cat, a, b = merge_states_setup
    both = pd.concat([a, b])
    q = ("SELECT APPROX_PERCENTILE(val, 0.5) FROM "
         "(SELECT val, g FROM ta UNION ALL SELECT val, g FROM tb) GROUP BY g")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") == "approx_unionall_merge"
    rows = approx_sql(spark, q, t, catalog=cat).collect()
    assert {r["group"] for r in rows} == {"0", "1", "2"}
    for r in rows:
        grp = both[both.g == int(r["group"])].val
        rank_of = (grp <= r["value"]).sum() / len(grp)
        assert abs(rank_of - 0.5) <= r["rank_err_bound"] + 2.0 / len(grp), r


def test_unionall_topk_from_merged_states(spark, merge_states_setup):
    """APPROX_TOPK over the UNION ALL merges the CM states — bag counts sum,
    and the top token's estimated count is within the CM bound of the true
    concatenated count."""
    t, cat, a, b = merge_states_setup
    both = pd.concat([a, b])
    q = ("SELECT APPROX_TOPK(val, 5) FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") == "approx_unionall_merge"
    rows = approx_sql(spark, q, t, catalog=cat).collect()
    assert len(rows) == 5
    vc = both.val.value_counts()
    for r in rows:
        assert abs(r["est_count"] - int(vc.get(r["token"], 0))) <= r["err_bound"], r


def test_unionall_distinct_union_not_claimed_by_merge(spark, merge_states_setup):
    """A DISTINCT union under a percentile head is a DIFFERENT bag — the
    merge route must not claim it; the generic derived path answers."""
    t, cat, a, b = merge_states_setup
    q = ("SELECT APPROX_PERCENTILE(val, 0.5) FROM "
         "(SELECT val FROM ta UNION SELECT val FROM tb)")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") != "approx_unionall_merge"
    # and it still answers (materialized derived table, on-the-fly build)
    vals = pd.concat([a, b]).val.drop_duplicates()
    r = approx_sql(spark, q, t, catalog=cat).collect()[0]
    rank_of = (vals <= r["value"]).sum() / len(vals)
    assert abs(rank_of - 0.5) <= r["rank_err_bound"] + 2.0 / len(vals)


def test_unionall_merge_declines_without_registrations(spark, tmp_path):
    """No catalog → the generic path still answers percentile-over-UNION-ALL
    (materialize + one-pass build); the route is an optimization only."""
    rng = np.random.default_rng(7)
    a = pd.DataFrame({"val": rng.normal(100, 10, 8000).round(3)})
    b = pd.DataFrame({"val": rng.normal(120, 10, 8000).round(3)})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    t = {"ta": pa_, "tb": pb}
    q = ("SELECT APPROX_PERCENTILE(val, 0.5) FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    both = pd.concat([a, b]).val
    r = approx_sql(spark, q, t).collect()[0]
    rank_of = (both <= r["value"]).sum() / len(both)
    assert abs(rank_of - 0.5) <= r["rank_err_bound"] + 2.0 / len(both)


def test_unionall_merge_requires_identical_params(spark, tmp_path):
    """Sides registered with DIFFERENT kll parameters cannot merge — the
    resolver declines and the scan path answers."""
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(13)
    a = pd.DataFrame({"val": rng.integers(0, 1000, 5000).astype("int64")})
    b = pd.DataFrame({"val": rng.integers(0, 1000, 5000).astype("int64")})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("pa", pa_, [SketchSpec("k_val", "kll", "val", {"k": 200})], group_by=None)
    cat.create("pb", pb, [SketchSpec("k_val", "kll", "val", {"k": 400})], group_by=None)
    t = {"ta": pa_, "tb": pb}
    q = ("SELECT APPROX_PERCENTILE(val, 0.5) FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") != "approx_unionall_merge"


def test_unionall_merge_alias_renames_estimate(spark, merge_states_setup):
    """AS name on the merge route renames (value → name,
    rank_err_bound → name_rank_err) like the single-table alias path."""
    t, cat, a, b = merge_states_setup
    q = ("SELECT APPROX_PERCENTILE(val, 0.5) AS med FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    rows = approx_sql(spark, q, t, catalog=cat).collect()
    assert set(rows[0].asDict()) == {"q", "med", "med_rank_err"}


def test_unionall_merge_answers_with_bases_deleted(spark, tmp_path):
    """Zero-scan proof: delete both base tables after registration — the
    merge route still answers the UNION ALL percentile from states alone."""
    import shutil

    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(3)
    a = pd.DataFrame({"val": rng.integers(0, 2000, 9000).astype("int64")})
    b = pd.DataFrame({"val": rng.integers(1000, 3000, 9000).astype("int64")})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    specs = [SketchSpec("k_val", "kll", "val", {"k": 200})]
    cat.create("za", pa_, specs, group_by=None)
    cat.create("zb", pb, specs, group_by=None)
    t = {"ta": pa_, "tb": pb}
    shutil.rmtree(pa_)
    shutil.rmtree(pb)
    q = ("SELECT APPROX_PERCENTILE(val, 0.5) FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    both = pd.concat([a, b]).val
    r = approx_sql(spark, q, t, catalog=cat).collect()[0]
    rank_of = (both <= r["value"]).sum() / len(both)
    assert abs(rank_of - 0.5) <= r["rank_err_bound"] + 2.0 / len(both)


# ---------------------------------------------------------------------------
# UNION ALL bodies answered from persisted SAMPLES (equal-ratio scrambles)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sample_ua_setup(spark, tmp_path_factory):
    """Two tables with registered uniform samples at ratio 0.3; bases
    DELETED after registration (the route scans the scrambles only)."""
    import shutil

    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(61)
    a = pd.DataFrame({
        "val": rng.uniform(0, 100, 60000).round(3),
        "g": rng.integers(0, 4, 60000).astype("int64"),
    })
    b = pd.DataFrame({
        "val": rng.uniform(50, 150, 40000).round(3),
        "g": rng.integers(0, 4, 40000).astype("int64"),
    })
    d = tmp_path_factory.mktemp("sampleua")
    pa_, pb = str(d / "ta"), str(d / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(d / "cat"))
    cat.create_sample("usa", pa_, kind="uniform", ratio=0.3)
    cat.create_sample("usb", pb, kind="uniform", ratio=0.3)
    shutil.rmtree(pa_)
    shutil.rmtree(pb)
    return {"ta": pa_, "tb": pb}, cat, a, b


def test_unionall_sum_from_persisted_samples(spark, sample_ua_setup):
    """APPROX_SUM over (a UNION ALL b) scans only the two 0.3-scrambles
    (bases deleted): equal-ratio Bernoulli samples concatenate into one
    Bernoulli sample of the bag, so the single HT estimator applies."""
    t, cat, a, b = sample_ua_setup
    q = ("SELECT APPROX_SUM(val, 0.2) FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") == "approx_unionall_sample"
    assert props.get("artifacts") == "usa, usb"
    exact = float(a.val.sum() + b.val.sum())
    r = approx_sql(spark, q, t, catalog=cat).collect()[0]
    assert abs(r["est_sum"] - exact) <= WIDE * r["sum_err"]


def test_unionall_count_avg_grouped_from_samples(spark, sample_ua_setup):
    """Grouped COUNT and AVG over the UNION ALL answer per group from the
    concatenated scrambles; group keys come back in the key's own column."""
    t, cat, a, b = sample_ua_setup
    both = pd.concat([a, b])
    qc = ("SELECT APPROX_COUNT(0.2) FROM "
          "(SELECT val, g FROM ta UNION ALL SELECT val, g FROM tb) GROUP BY g")
    props = _props(spark, qc, t, catalog=cat)
    assert props.get("statement_kind") == "approx_unionall_sample"
    rows = {int(r["g"]): r for r in approx_sql(spark, qc, t, catalog=cat).collect()}
    for g, n in both.groupby("g").size().items():
        assert abs(rows[int(g)]["est_count"] - n) <= WIDE * rows[int(g)]["count_err"]
    qa = ("SELECT APPROX_AVG(val, 0.2) FROM "
          "(SELECT val, g FROM ta UNION ALL SELECT val, g FROM tb) GROUP BY g")
    rows = {int(r["g"]): r for r in approx_sql(spark, qa, t, catalog=cat).collect()}
    for g, m in both.groupby("g").val.mean().items():
        assert abs(rows[int(g)]["est_avg"] - m) <= WIDE * rows[int(g)]["avg_err"]


def test_unionall_sample_side_where_commutes(spark, sample_ua_setup):
    """A side-local WHERE is applied to that side's SAMPLE rows — the
    estimate is unbiased for the FILTERED bag."""
    t, cat, a, b = sample_ua_setup
    q = ("SELECT APPROX_SUM(val, 0.2) FROM "
         "(SELECT val FROM ta WHERE val > 50 UNION ALL "
         "SELECT val FROM tb WHERE val > 50)")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") == "approx_unionall_sample"
    exact = float(a.val[a.val > 50].sum() + b.val[b.val > 50].sum())
    r = approx_sql(spark, q, t, catalog=cat).collect()[0]
    assert abs(r["est_sum"] - exact) <= WIDE * r["sum_err"]


def test_unionall_sample_requires_common_ratio(spark, tmp_path):
    """Sides whose registered samples share NO ratio decline — per-side
    weights are a different estimator; the generic scan path answers."""
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(67)
    a = pd.DataFrame({"val": rng.uniform(0, 10, 9000).round(3)})
    b = pd.DataFrame({"val": rng.uniform(0, 10, 9000).round(3)})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create_sample("ra", pa_, kind="uniform", ratio=0.5)
    cat.create_sample("rb", pb, kind="uniform", ratio=0.25)
    t = {"ta": pa_, "tb": pb}
    q = ("SELECT APPROX_SUM(val, 0.2) FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") != "approx_unionall_sample"
    # and the statement still answers (generic derived path, on-the-fly)
    exact = float(a.val.sum() + b.val.sum())
    r = approx_sql(spark, q, t, catalog=cat).collect()[0]
    assert abs(r["est_sum"] - exact) <= WIDE * r["sum_err"]


def test_unionall_sample_alias(spark, sample_ua_setup):
    """AS name renames (est_sum → name, sum_err → name_err) on the route."""
    t, cat, a, b = sample_ua_setup
    q = ("SELECT APPROX_SUM(val, 0.2) AS total FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    r = approx_sql(spark, q, t, catalog=cat).collect()[0]
    assert set(r.asDict()) == {"total", "total_err"}


# ---------------------------------------------------------------------------
# Round-5 review pass 4: route guards, backtracking resolution, EXPLAIN purity
# ---------------------------------------------------------------------------


def test_unionall_sample_route_rejects_aggregate_sides(spark, sample_ua_setup):
    """A side projecting count(*) is NOT a per-row value — transplanting it
    onto the sample would HT-scale a collapsed row to nonsense. The route
    declines; the generic path answers the 2-row derived table."""
    t, cat, a, b = sample_ua_setup
    q = ("SELECT APPROX_COUNT(0.2) FROM "
         "(SELECT count(*) AS c FROM ta UNION ALL SELECT count(*) AS c FROM tb)")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") != "approx_unionall_sample"
    # bases were deleted by the fixture, so the generic path raising on the
    # missing table is the CORRECT behavior here — what must never happen
    # is a silent 1/p-scaled answer from the samples
    with pytest.raises(Exception):
        approx_sql(spark, q, t, catalog=cat).collect()


def test_unionall_count_ignores_value_type_mix(spark, tmp_path):
    """APPROX_COUNT never reads the value column — sides projecting a string
    against a bigint must still answer from the samples."""
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(71)
    a = pd.DataFrame({"v": [f"s{i}" for i in range(20000)],
                      "g": rng.integers(0, 3, 20000).astype("int64")})
    b = pd.DataFrame({"v": np.arange(15000, dtype="int64"),
                      "g": rng.integers(0, 3, 15000).astype("int64")})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create_sample("ca", pa_, kind="uniform", ratio=0.4)
    cat.create_sample("cb", pb, kind="uniform", ratio=0.4)
    t = {"ta": pa_, "tb": pb}
    q = ("SELECT APPROX_COUNT(0.3) FROM "
         "(SELECT v, g FROM ta UNION ALL SELECT v, g FROM tb) GROUP BY g")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") == "approx_unionall_sample"
    both = pd.concat([a[["g"]], b[["g"]]])
    rows = {int(r["g"]): r for r in approx_sql(spark, q, t, catalog=cat).collect()}
    for g, n in both.groupby("g").size().items():
        assert abs(rows[int(g)]["est_count"] - n) <= WIDE * rows[int(g)]["count_err"]


def test_merge_states_backtracks_past_newest_registration(spark, tmp_path):
    """Side A's NEWEST kll registration (k=400) cannot merge with side B's
    only one (k=200) — the resolver must fall back to A's OLDER k=200
    registration instead of declining the zero-scan route."""
    import shutil

    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(73)
    a = pd.DataFrame({"val": rng.integers(0, 3000, 12000).astype("int64")})
    b = pd.DataFrame({"val": rng.integers(1000, 4000, 12000).astype("int64")})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("a_old", pa_, [SketchSpec("k_val", "kll", "val", {"k": 200})], group_by=None)
    cat.create("a_new", pa_, [SketchSpec("k_val", "kll", "val", {"k": 400})], group_by=None)
    cat.create("b_only", pb, [SketchSpec("k_val", "kll", "val", {"k": 200})], group_by=None)
    t = {"ta": pa_, "tb": pb}
    shutil.rmtree(pa_)
    shutil.rmtree(pb)
    q = ("SELECT APPROX_PERCENTILE(val, 0.5) FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") == "approx_unionall_merge"
    assert props.get("artifacts") == "a_old, b_only"
    both = pd.concat([a, b]).val
    r = approx_sql(spark, q, t, catalog=cat).collect()[0]
    rank_of = (both <= r["value"]).sum() / len(both)
    assert abs(rank_of - 0.5) <= r["rank_err_bound"] + 2.0 / len(both)


def test_setop_states_backtrack_past_incompatible_newest(spark, tmp_path):
    """Same for set-ops: A's newest HLL (p mismatch vs B) must not kill the
    states route when an older compatible registration exists."""
    import shutil

    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(79)
    a = pd.DataFrame({"k": rng.integers(0, 2500, 15000).astype("int64")})
    b = pd.DataFrame({"k": rng.integers(1000, 3500, 15000).astype("int64")})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    specs14 = [SketchSpec("h_k", "hll", "k", {"p": 14})]
    specs12 = [SketchSpec("h_k", "hll", "k", {"p": 12})]
    cat.create("sa_old", pa_, specs14, group_by=None)
    cat.create("sa_new", pa_, specs12, group_by=None)
    cat.create("sb", pb, specs14, group_by=None)
    t = {"ta": pa_, "tb": pb}
    shutil.rmtree(pa_)
    shutil.rmtree(pb)
    exact = len(set(a.k) | set(b.k))
    q = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS d FROM "
         "(SELECT k FROM ta UNION SELECT k FROM tb)")
    props = _props(spark, q, t, catalog=cat)
    assert "PERSISTED STATES" in props["route"]
    assert props.get("artifacts") == "sa_old, sb"
    r = approx_sql(spark, q, t, catalog=cat).collect()[0]
    assert abs(r["d"] - exact) <= 3 * r["d_err"] + 2


def test_explain_does_not_rebind_user_temp_views(spark, tmp_path):
    """EXPLAIN's route decision must not register/overwrite temp views: the
    frame gates skip WHERE (predicates don't change schemas), so a user's
    same-named session view survives an EXPLAIN whose tables dict binds the
    name elsewhere."""
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(83)
    a = pd.DataFrame({"val": rng.uniform(0, 10, 8000).round(3),
                      "k": rng.integers(0, 100, 8000).astype("int64")})
    b = pd.DataFrame({"val": rng.uniform(0, 10, 8000).round(3),
                      "k": rng.integers(0, 100, 8000).astype("int64")})
    dim = pd.DataFrame({"k": np.arange(50, dtype="int64")})
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    pdim = str(tmp_path / "dim")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb)
    spark.createDataFrame(dim).write.parquet(pdim)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create_sample("ea", pa_, kind="uniform", ratio=0.5)
    cat.create_sample("eb", pb, kind="uniform", ratio=0.5)
    # the user's session view named 'dim' holds DIFFERENT data
    spark.createDataFrame(pd.DataFrame({"k": [999]})).createOrReplaceTempView("dim")
    try:
        t = {"ta": pa_, "tb": pb, "dim": pdim}
        q = ("SELECT APPROX_SUM(val, 0.4) FROM "
             "(SELECT val FROM ta WHERE k IN (SELECT k FROM dim) UNION ALL "
             "SELECT val FROM tb WHERE k IN (SELECT k FROM dim))")
        props = _props(spark, q, t, catalog=cat)
        assert props.get("statement_kind") == "approx_unionall_sample"
        # the session view is untouched by the EXPLAIN
        assert [r["k"] for r in spark.table("dim").collect()] == [999]
    finally:
        spark.catalog.dropTempView("dim")


# ---------------------------------------------------------------------------
# APPROX_VARIANCE / APPROX_STDDEV — sample-served moment aggregates
# ---------------------------------------------------------------------------


def test_variance_statement_on_the_fly(spark, sub_tables):
    """SELECT APPROX_VARIANCE/STDDEV(col, ratio): delta-method CI covers the
    exact population variance/stddev; aliases rename est + bound."""
    t, fact, _ = sub_tables
    v = approx_sql(spark, "SELECT APPROX_VARIANCE(val, 0.5) FROM fact", t).collect()[0]
    exact_var = float(fact["val"].var(ddof=1))
    assert abs(v["est_variance"] - exact_var) <= v["variance_err"] * WIDE
    sd = approx_sql(spark, "SELECT APPROX_STDDEV(val, 0.5) AS sd FROM fact", t).collect()[0]
    assert set(sd.asDict()) == {"sd", "sd_err"}
    assert abs(sd["sd"] - exact_var ** 0.5) <= sd["sd_err"] * WIDE


def test_variance_served_from_persisted_sample(spark, sub_tables, tmp_path):
    """The A5 move for moments: a registered uniform scramble serves
    APPROX_VARIANCE (EXPLAIN names it; WHERE commutes with the sampling)."""
    from sketchlib.spark.catalog import SketchCatalog

    t, fact, _ = sub_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, "CREATE SAMPLE f_u FROM fact KIND uniform RATIO 0.5 SEED 3", t, cat).collect()

    props = dict(
        approx_sql(
            spark, "EXPLAIN SELECT APPROX_VARIANCE(val, 0.5) FROM fact", t, cat
        ).collect()
    )
    assert props["route"].startswith("persisted_sample (uniform")
    assert props["artifact"] == "f_u"

    v = approx_sql(spark, "SELECT APPROX_VARIANCE(val, 0.5) FROM fact", t, cat).collect()[0]
    assert abs(v["est_variance"] - float(fact["val"].var(ddof=1))) <= v["variance_err"] * WIDE

    w = approx_sql(
        spark, "SELECT APPROX_STDDEV(val, 0.5) FROM fact WHERE seg = 's1'", t, cat
    ).collect()[0]
    exact_sd = float(fact[fact["seg"] == "s1"]["val"].std(ddof=1))
    assert abs(w["est_stddev"] - exact_sd) <= w["stddev_err"] * WIDE


def test_variance_ratio_argument_honored(spark, sub_tables, tmp_path):
    """A registered sample below the requested ratio is skipped (accuracy
    arguments are honored, not silently dropped — same policy as SUM/AVG)."""
    from sketchlib.spark.catalog import SketchCatalog

    t, _, _ = sub_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, "CREATE SAMPLE f_lo FROM fact KIND uniform RATIO 0.2 SEED 3", t, cat).collect()
    props = dict(
        approx_sql(
            spark, "EXPLAIN SELECT APPROX_VARIANCE(val, 0.5) FROM fact", t, cat
        ).collect()
    )
    assert props["route"].startswith("on_the_fly")
    props2 = dict(
        approx_sql(
            spark, "EXPLAIN SELECT APPROX_VARIANCE(val, 0.1) FROM fact", t, cat
        ).collect()
    )
    assert props2["route"].startswith("persisted_sample")


def test_variance_refuses_non_uniform_samples(spark, sub_tables, tmp_path):
    """Stratified scrambles mix inclusion probabilities — the pooled moment
    estimator would be biased, so the route refuses with a descriptive
    error instead of answering wrong."""
    from sketchlib.spark.catalog import SketchCatalog

    t, _, _ = sub_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark,
        'CREATE SAMPLE f_s FROM fact KIND stratified RATIO 0.5 ON seg '
        'FRACTIONS \'{"s0":0.5,"s1":0.5,"s2":0.5,"s3":0.5}\'',
        t,
        cat,
    ).collect()
    with pytest.raises(ValueError, match="UNIFORM"):
        approx_sql(
            spark, "SELECT APPROX_VARIANCE(val, 0.5) FROM fact", t, cat, "f_s"
        ).collect()


def test_variance_grouped_and_multi_agg(spark, sub_tables):
    """Grouped moments + one statement mixing SUM/VARIANCE/STDDEV at one
    ratio: the slot shares a single sample aggregation (moments ride the
    same scan) and every estimate covers its exact counterpart."""
    t, fact, _ = sub_tables
    rows = approx_sql(
        spark,
        "SELECT APPROX_SUM(val, 0.5), APPROX_VARIANCE(val, 0.5), "
        "APPROX_STDDEV(val, 0.5) FROM fact GROUP BY seg",
        t,
    ).collect()
    assert len(rows) == 4
    for r in rows:
        sub = fact[fact["seg"] == r["seg"]]["val"]
        assert abs(r["approx_sum_val"] - float(sub.sum())) <= r["approx_sum_val_err"] * WIDE
        assert (
            abs(r["approx_variance_val"] - float(sub.var(ddof=1)))
            <= r["approx_variance_val_err"] * WIDE
        )
        assert (
            abs(r["approx_stddev_val"] - float(sub.std(ddof=1)))
            <= r["approx_stddev_val_err"] * WIDE
        )


def test_unionall_variance_from_persisted_samples(spark, sample_ua_setup):
    """UNION ALL bodies under a VARIANCE/STDDEV head take the sample route
    too: the concatenated equal-ratio scrambles are one Bernoulli(p) sample
    of the bag, so the moments kernel runs over p-fraction tables only
    (bases deleted by the fixture)."""
    t, cat, a, b = sample_ua_setup
    both = pd.concat([a, b], ignore_index=True)
    q = ("SELECT APPROX_VARIANCE(val, 0.2) FROM "
         "(SELECT val FROM ta UNION ALL SELECT val FROM tb)")
    props = _props(spark, q, t, catalog=cat)
    assert props.get("statement_kind") == "approx_unionall_sample"
    r = approx_sql(spark, q, t, catalog=cat).collect()[0]
    exact = float(both["val"].var(ddof=1))
    assert abs(r["est_variance"] - exact) <= r["variance_err"] * WIDE

    sd = approx_sql(
        spark,
        "SELECT APPROX_STDDEV(val, 0.2) AS s FROM "
        "(SELECT val FROM ta UNION ALL SELECT val FROM tb)",
        t, catalog=cat,
    ).collect()[0]
    assert set(sd.asDict()) == {"s", "s_err"}
    assert abs(sd["s"] - exact ** 0.5) <= sd["s_err"] * WIDE


# ---------------------------------------------------------------------------
# APPROX_COVAR / APPROX_CORR — bivariate sample aggregates
# ---------------------------------------------------------------------------


def test_covar_corr_statements(spark, sub_tables):
    """SELECT APPROX_COVAR/CORR(x, y, ratio): CIs cover the exact
    covar_samp / Pearson correlation, aliases rename est + bound, and a
    multi-aggregate statement mixes them with AVG."""
    t, fact, _ = sub_tables
    exact_cv = float(fact["k"].astype(float).cov(fact["val"]))
    exact_cr = float(fact["k"].astype(float).corr(fact["val"]))
    cv = approx_sql(spark, "SELECT APPROX_COVAR(k, val, 0.5) FROM fact", t).collect()[0]
    assert abs(cv["est_covar"] - exact_cv) <= cv["covar_err"] * WIDE
    cr = approx_sql(spark, "SELECT APPROX_CORR(k, val, 0.5) AS c FROM fact", t).collect()[0]
    assert set(cr.asDict()) == {"c", "c_err"}
    assert abs(cr["c"] - exact_cr) <= cr["c_err"] * WIDE

    m = approx_sql(
        spark,
        "SELECT APPROX_AVG(val, 0.5), APPROX_CORR(k, val, 0.5), "
        "APPROX_COVAR(k, val, 0.5) FROM fact GROUP BY seg",
        t,
    ).collect()
    assert len(m) == 4
    for r in m:
        sub = fact[fact["seg"] == r["seg"]]
        assert abs(r["approx_avg_val"] - float(sub["val"].mean())) <= r["approx_avg_val_err"] * WIDE
        e_cr = float(sub["k"].astype(float).corr(sub["val"]))
        assert abs(r["approx_corr_k_val"] - e_cr) <= r["approx_corr_k_val_err"] * WIDE
        e_cv = float(sub["k"].astype(float).cov(sub["val"]))
        assert abs(r["approx_covar_k_val"] - e_cv) <= r["approx_covar_k_val_err"] * WIDE


def test_covar_corr_served_from_persisted_sample(spark, sub_tables, tmp_path):
    """The A5 route for bivariate moments: a registered uniform scramble
    serves APPROX_CORR (EXPLAIN names it), WHERE commutes, the ratio
    argument is honored, and non-uniform samples are refused."""
    from sketchlib.spark.catalog import SketchCatalog

    t, fact, _ = sub_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, "CREATE SAMPLE f_bu FROM fact KIND uniform RATIO 0.5 SEED 3", t, cat).collect()
    props = dict(
        approx_sql(spark, "EXPLAIN SELECT APPROX_CORR(k, val, 0.5) FROM fact", t, cat).collect()
    )
    assert props["route"].startswith("persisted_sample (uniform")
    assert props["artifact"] == "f_bu"
    sub = fact[fact["seg"] != "s0"]
    e = float(sub["k"].astype(float).corr(sub["val"]))
    r = approx_sql(
        spark, "SELECT APPROX_CORR(k, val, 0.5) FROM fact WHERE seg <> 's0'", t, cat
    ).collect()[0]
    assert abs(r["est_corr"] - e) <= r["corr_err"] * WIDE
    # a higher requested ratio than any registered sample → on-the-fly
    props2 = dict(
        approx_sql(spark, "EXPLAIN SELECT APPROX_COVAR(k, val, 0.9) FROM fact", t, cat).collect()
    )
    assert props2["route"].startswith("on_the_fly")
    approx_sql(
        spark,
        'CREATE SAMPLE f_bs FROM fact KIND stratified RATIO 0.5 ON seg '
        'FRACTIONS \'{"s0":0.5,"s1":0.5,"s2":0.5,"s3":0.5}\'',
        t, cat,
    ).collect()
    with pytest.raises(ValueError, match="UNIFORM"):
        approx_sql(spark, "SELECT APPROX_CORR(k, val, 0.5) FROM fact", t, cat, "f_bs").collect()


# ---------------------------------------------------------------------------
# WITHIN n% ERROR [AT CONFIDENCE c%] — accuracy-contract statements
# ---------------------------------------------------------------------------


def test_within_contract_sampling_aggregates(spark, sub_tables):
    """The pilot-planned ratio meets the stated relative target (small
    slack for pilot noise) and the estimate covers the exact answer."""
    t, fact, _ = sub_tables
    exact = float(fact["val"].sum())
    r = approx_sql(
        spark, "SELECT APPROX_SUM(val) FROM fact WITHIN 2% ERROR", t
    ).collect()[0]
    assert abs(r["est_sum"] - exact) <= r["sum_err"] * WIDE
    assert r["sum_err"] / abs(r["est_sum"]) <= 0.02 * 1.5  # planned, pilot-noise slack

    rows = approx_sql(
        spark,
        "SELECT APPROX_AVG(val) FROM fact GROUP BY seg WITHIN 2% ERROR AT CONFIDENCE 99%",
        t,
    ).collect()
    assert len(rows) == 4
    for row in rows:
        sub = fact[fact["seg"] == row["seg"]]["val"]
        assert abs(row["est_avg"] - float(sub.mean())) <= row["avg_err"] * WIDE
        # the 99% plan makes the reported 95% half-width comfortably under target
        assert row["avg_err"] / abs(row["est_avg"]) <= 0.02 * 1.5


def test_within_contract_tiny_target_goes_exact(spark, sub_tables):
    """An unachievable-without-scanning target degenerates to ratio ~1.0:
    the answer is (near-)exact and the error (near-)zero — never an
    unfounded claim."""
    t, fact, _ = sub_tables
    r = approx_sql(
        spark, "SELECT APPROX_COUNT(*) FROM fact WITHIN 0.0001% ERROR", t
    ).collect()[0]
    assert abs(r["est_count"] - len(fact)) <= max(r["count_err"], 1.0)
    assert r["count_err"] <= len(fact) * 1e-4


def test_within_contract_sketch_rewrites(spark, sub_tables, tmp_path):
    """COUNT_DISTINCT contracts rewrite to rse=target/z (routing honors it:
    a low-p registered sketch set is skipped; a high-p one serves), and
    PERCENTILE contracts become rank_err=t with the planner's k."""
    from sketchlib.spark.catalog import SketchCatalog

    t, fact, _ = sub_tables
    r = approx_sql(
        spark, "SELECT APPROX_COUNT_DISTINCT(k) FROM fact WITHIN 2% ERROR", t
    ).collect()[0]
    exact = int(fact["k"].nunique())
    assert r["rse_bound"] <= 0.02 / 1.959963984540054 * (1 + 1e-9)
    assert abs(r["estimate"] - exact) <= 3 * r["rse_bound"] * exact + 1

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark, "CREATE SKETCHES f_lo FROM fact KINDS hll(k, p=8)", t, cat
    ).collect()
    props = dict(
        approx_sql(
            spark,
            "EXPLAIN SELECT APPROX_COUNT_DISTINCT(k) FROM fact WITHIN 2% ERROR",
            t, cat,
        ).collect()
    )
    assert props["statement_kind"] == "accuracy_contract"
    # p=8 → rse 6.5% > 1.02% target → the registered set must NOT claim it
    assert props["rewritten.route"].startswith("on_the_fly")

    pct = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(val, 0.9) FROM fact WITHIN 0.2% ERROR", t
    ).collect()[0]
    assert pct["rank_err_bound"] <= 0.002 * (1 + 1e-9)
    lo, hi = fact["val"].quantile(0.9 - 0.006), fact["val"].quantile(0.9 + 0.006)
    assert lo <= pct["value"] <= hi


def test_rank_err_argument_routes_only_achieving_states(spark, sub_tables, tmp_path):
    """rank_err= as a plain named argument: KLL states below the needed k
    are skipped (on-the-fly at the planner's k instead), achieving states
    serve; scrambles never claim a rank contract."""
    from sketchlib.spark.catalog import SketchCatalog

    t, fact, _ = sub_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, "CREATE SAMPLE f_u9 FROM fact KIND uniform RATIO 0.9 SEED 2", t, cat).collect()
    approx_sql(spark, "CREATE SKETCHES f_k FROM fact KINDS kll(val, k=400)", t, cat).collect()
    stmt = "SELECT APPROX_PERCENTILE(val, 0.5, rank_err={r}) FROM fact"
    # 3.31/400 ≈ 0.0083: achieves 1% → states route; not 0.5% → on-the-fly
    props_ok = dict(approx_sql(spark, "EXPLAIN " + stmt.format(r=0.01), t, cat).collect())
    assert props_ok["route"].startswith("persisted_sketch_states")
    assert props_ok["artifact"] == "f_k"
    props_no = dict(approx_sql(spark, "EXPLAIN " + stmt.format(r=0.005), t, cat).collect())
    assert props_no["route"].startswith("on_the_fly")
    r = approx_sql(spark, stmt.format(r=0.01), t, cat).collect()[0]
    med = float(fact["val"].quantile(0.5))
    lo, hi = fact["val"].quantile(0.5 - 0.03), fact["val"].quantile(0.5 + 0.03)
    assert lo <= r["value"] <= hi, (r, med)
    with pytest.raises(ValueError, match="scramble"):
        approx_sql(spark, stmt.format(r=0.01), t, cat, "f_u9").collect()


def test_within_contract_refusals(spark, sub_tables):
    """Double accuracy specs, unsupported aggregates, and out-of-range
    targets get descriptive errors."""
    t, _, _ = sub_tables
    with pytest.raises(ValueError, match="ONE accuracy spec"):
        approx_sql(spark, "SELECT APPROX_SUM(val, 0.5) FROM fact WITHIN 1% ERROR", t)
    with pytest.raises(ValueError, match="ONE accuracy spec"):
        approx_sql(spark, "SELECT APPROX_CORR(k, val, 0.3) FROM fact WITHIN 1% ERROR", t)
    with pytest.raises(ValueError, match="does not take"):
        approx_sql(spark, "SELECT APPROX_MYSTERY(val) FROM fact WITHIN 1% ERROR", t)
    with pytest.raises(ValueError, match="strictly between"):
        approx_sql(spark, "SELECT APPROX_SUM(val) FROM fact WITHIN 0% ERROR", t)
    with pytest.raises(ValueError, match="CONFIDENCE"):
        approx_sql(
            spark, "SELECT APPROX_SUM(val) FROM fact WITHIN 1% ERROR AT CONFIDENCE 30%", t
        )
    with pytest.raises(ValueError, match="ONE accuracy spec"):
        # multi-aggregate contracts are supported, but any member carrying
        # its own explicit accuracy argument still collides with WITHIN
        approx_sql(
            spark,
            "SELECT APPROX_SUM(val), APPROX_COUNT(0.5) FROM fact WITHIN 1% ERROR", t
        )


def test_within_contract_bivariate(spark, sub_tables):
    """COVAR takes a relative contract (CLT inversion on m22); CORR takes
    an ABSOLUTE one (Fisher inversion — a relative target on near-zero r
    would demand a full scan for no insight)."""
    t, fact, _ = sub_tables
    exact_cr = float(fact["k"].astype(float).corr(fact["val"]))
    r = approx_sql(
        spark, "SELECT APPROX_CORR(k, val) FROM fact WITHIN 2% ERROR", t
    ).collect()[0]
    assert abs(r["est_corr"] - exact_cr) <= r["corr_err"] * WIDE
    assert r["corr_err"] <= 0.02 * 1.5  # absolute target, pilot-noise slack

    # the relative COVAR contract needs a covariance bounded away from 0
    # (relative targets on near-zero parameters are ill-posed — CORR's
    # absolute form exists for exactly that reason): cov(k, k+val) ≈ var(k)
    exact_cv = float(fact["k"].astype(float).cov(fact["k"].astype(float) + fact["val"]))
    rc = approx_sql(
        spark, "SELECT APPROX_COVAR(k, k + val) FROM fact WITHIN 5% ERROR", t
    ).collect()[0]
    assert abs(rc["est_covar"] - exact_cv) <= rc["covar_err"] * WIDE
    assert rc["covar_err"] / abs(rc["est_covar"]) <= 0.05 * 1.5


def test_within_explain_shares_execution_gates(spark, sub_tables):
    """Review findings r5: EXPLAIN validates everything _within_error
    enforces (double spec, ranges), handles derived tables in execution
    order, and rebuilds the rewritten statement structurally (no textual
    splicing into unrelated text)."""
    t, _, _ = sub_tables

    def props(stmt):
        return dict(approx_sql(spark, "EXPLAIN " + stmt, t).collect())

    p = props("SELECT APPROX_COUNT_DISTINCT(k, 0.05) FROM fact WITHIN 2% ERROR")
    assert "ONE accuracy spec" in p["error"]
    p = props("SELECT APPROX_SUM(val, 0.5) FROM fact WITHIN 2% ERROR")
    assert "ONE accuracy spec" in p["error"]
    p = props("SELECT APPROX_SUM(val) FROM fact WITHIN 0% ERROR")
    assert "would raise" in p["error"]
    p = props("SELECT APPROX_SUM(val) FROM fact WITHIN 1% ERROR AT CONFIDENCE 30%")
    assert "would raise" in p["error"]

    # derived table: EXPLAIN follows execution order (subquery extracted
    # FIRST, the contract applies over the view) — no false would-raise
    p = props(
        "SELECT APPROX_SUM(val) FROM (SELECT val FROM fact WHERE seg <> 's0') "
        "WITHIN 5% ERROR"
    )
    assert p["statement_kind"] == "derived_table"
    # the nested statement_kind is dropped by the derived-table prefix loop;
    # the contract's own properties prove the branch was taken
    assert p["outer.target_rel_error"] == "0.05"
    assert "pilot" in p["outer.plan"]
    # ...and execution agrees (it answers rather than raising)
    out = approx_sql(
        spark,
        "SELECT APPROX_SUM(val) FROM (SELECT val FROM fact WHERE seg <> 's0') "
        "WITHIN 5% ERROR",
        t,
    ).collect()[0]
    assert out["est_sum"] > 0

    # structural rebuild: a single-letter column whose letter appears
    # earlier in the statement must not be spliced into 'SELECT'
    p = props("SELECT APPROX_COUNT_DISTINCT(C) FROM fact WITHIN 3% ERROR")
    assert p["rewritten.statement_kind"] == "approx_single"
    assert p["rewritten.aggregate"].startswith("APPROX_COUNT_DISTINCT(C,")


def test_within_contract_base_free_via_scramble_pilot(spark, sub_tables, tmp_path):
    """With a registered uniform scramble, the contract pilot scans the
    SCRAMBLE (N rescaled by its ratio) and the planned statement serves
    from it too — proven by deleting the base table first: the whole
    contract runs base-free when the planned ratio fits the registration."""
    import shutil

    from sketchlib.spark.catalog import SketchCatalog

    t, fact, _ = sub_tables
    base = str(tmp_path / "fact2")
    spark.createDataFrame(fact).write.parquet(base)
    t2 = {"fact2": base}
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark, "CREATE SAMPLE f2_u FROM fact2 KIND uniform RATIO 0.6 SEED 4", t2, cat
    ).collect()
    shutil.rmtree(base)

    r = approx_sql(
        spark, "SELECT APPROX_SUM(val) FROM fact2 WITHIN 3% ERROR", t2, cat
    ).collect()[0]
    exact = float(fact["val"].sum())
    assert abs(r["est_sum"] - exact) <= r["sum_err"] * WIDE
    assert r["sum_err"] / abs(r["est_sum"]) <= 0.03 * 1.5

    # grouped AVG through the same base-free path
    rows = approx_sql(
        spark,
        "SELECT APPROX_AVG(val) FROM fact2 GROUP BY seg WITHIN 3% ERROR",
        t2, cat,
    ).collect()
    assert len(rows) == 4
    for row in rows:
        sub = fact[fact["seg"] == row["seg"]]["val"]
        assert abs(row["est_avg"] - float(sub.mean())) <= row["avg_err"] * WIDE


def test_within_contract_multi_aggregate(spark, sub_tables):
    """A multi-aggregate contract plans every sampling aggregate from ONE
    pilot scan (per-aggregate ratios) and rewrites sketch aggregates
    arithmetically — all estimates land inside their CIs and at/under the
    shared target; EXPLAIN emits a per-aggregate plan."""
    t, fact, _ = sub_tables
    r = approx_sql(
        spark,
        "SELECT APPROX_COUNT(*), APPROX_SUM(val), APPROX_COUNT_DISTINCT(k) "
        "FROM fact WITHIN 3% ERROR",
        t,
    ).collect()[0]
    assert abs(r["approx_count_star"] - len(fact)) <= r["approx_count_star_err"] * WIDE
    assert r["approx_count_star_err"] / len(fact) <= 0.03 * 1.5
    exact_sum = float(fact["val"].sum())
    assert abs(r["approx_sum_val"] - exact_sum) <= r["approx_sum_val_err"] * WIDE
    assert r["approx_sum_val_err"] / exact_sum <= 0.03 * 1.5
    exact_cd = int(fact["k"].nunique())
    # the CD rewrite converts rse to an absolute err column in multi-agg
    assert abs(r["approx_count_distinct_k"] - exact_cd) <= max(
        3 * r["approx_count_distinct_k_err"], 3
    )

    props = dict(
        approx_sql(
            spark,
            "EXPLAIN SELECT APPROX_COUNT(*), APPROX_SUM(val), "
            "APPROX_COUNT_DISTINCT(k) FROM fact WITHIN 3% ERROR",
            t,
        ).collect()
    )
    assert props["statement_kind"] == "accuracy_contract"
    assert "pilot" in props["agg0.plan"] and "pilot" in props["agg1.plan"]
    assert props["agg2.plan"].startswith("rewrite to explicit rse")


# ---------------------------------------------------------------------------
# APPROX_MAD / APPROX_TRIMMED_MEAN through the SQL door (round-5 close)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def robust_tables(spark, tmp_path_factory):
    """Two groups, one heavy-tailed — the shape the robust statistics exist
    for. Returns (tables, pdf, catalog) with a registered KLL on x."""
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(31)
    pdf = pd.DataFrame(
        {
            "g": np.repeat(["norm", "heavy"], 20_000),
            "x": np.concatenate(
                [rng.normal(10, 1, 20_000), rng.lognormal(3, 1, 20_000)]
            ),
        }
    )
    d = tmp_path_factory.mktemp("robust5")
    base = str(d / "base")
    spark.createDataFrame(pdf).write.parquet(base)
    cat = SketchCatalog(spark, str(d / "cat"))
    tables = {"rt": base}
    approx_sql(
        spark, "CREATE SKETCHES rs FROM rt KINDS kll(x, k=400) GROUP BY g",
        tables, catalog=cat,
    ).collect()
    return tables, pdf, cat


def test_sql_mad_on_the_fly_matches_exact(spark, robust_tables):
    tables, pdf, _ = robust_tables
    rows = {
        r["group"]: r
        for r in approx_sql(spark, "SELECT APPROX_MAD(x) FROM rt GROUP BY g", tables).collect()
    }
    for g in ("norm", "heavy"):
        x = pdf.loc[pdf["g"] == g, "x"].to_numpy()
        exact = float(np.median(np.abs(x - rows[g]["median_est"])))
        assert rows[g]["mad_lo"] - 1e-9 <= exact <= rows[g]["mad_hi"] + 1e-9


def test_sql_trimmed_mean_states_served_base_deleted(spark, robust_tables, tmp_path):
    """The A5 substitution: with a registered KLL, APPROX_TRIMMED_MEAN and
    APPROX_MAD answer from states alone — proven by deleting the base."""
    import shutil

    tables, pdf, cat = robust_tables
    from sketchlib.sql import explain_sql

    ex = {r["property"]: r["value"] for r in explain_sql(
        spark, "SELECT APPROX_TRIMMED_MEAN(x, 0.1, 0.9) FROM rt GROUP BY g",
        tables, catalog=cat,
    ).collect()}
    assert "persisted_sketch_states" in ex["route"] and ex["artifact"] == "rs"
    # move the base away; the states route must still answer
    moved = str(tmp_path / "moved")
    shutil.move(tables["rt"], moved)
    try:
        out = {
            r["group"]: r
            for r in approx_sql(
                spark, "SELECT APPROX_TRIMMED_MEAN(x, 0.1, 0.9) FROM rt GROUP BY g",
                tables, catalog=cat,
            ).collect()
        }
        mads = approx_sql(
            spark, "SELECT APPROX_MAD(x) FROM rt GROUP BY g", tables, catalog=cat
        ).collect()
        assert {r["group"] for r in mads} == {"norm", "heavy"}
        for g in ("norm", "heavy"):
            x = np.sort(pdf.loc[pdf["g"] == g, "x"].to_numpy())
            n = len(x)
            exact = float(x[int(np.floor(0.1 * n)):int(np.floor(0.9 * n))].mean())
            r = out[g]
            assert r["tm_lo"] - 1e-9 <= exact <= r["tm_hi"] + 1e-9
            assert r["tm_lo"] <= r["trimmed_mean"] <= r["tm_hi"]
    finally:
        shutil.move(moved, tables["rt"])


def test_sql_mad_rollup_from_states(spark, robust_tables):
    """ROLLUP serves every grouping set from the ONE registered finest-grain
    state set (coarser = state merge, zero base scans)."""
    tables, pdf, cat = robust_tables
    out = approx_sql(
        spark, "SELECT APPROX_MAD(x) FROM rt GROUP BY ROLLUP (g)",
        tables, catalog=cat, catalog_key="rs",
    ).toPandas()
    assert set(out["grouping_lvl"]) == {0, 1}
    glob = out[out["grouping_lvl"] == 1].iloc[0]
    x = pdf["x"].to_numpy()
    exact = float(np.median(np.abs(x - glob["median_est"])))
    assert glob["mad_lo"] - 1e-9 <= exact <= glob["mad_hi"] + 1e-9


def test_sql_robust_arg_refusals_and_where(spark, robust_tables):
    tables, pdf, cat = robust_tables
    with pytest.raises(ValueError, match="exactly one argument"):
        approx_sql(spark, "SELECT APPROX_MAD(x, 0.5) FROM rt", tables)
    with pytest.raises(ValueError, match="lo < hi"):
        approx_sql(spark, "SELECT APPROX_TRIMMED_MEAN(x, 0.9, 0.1) FROM rt", tables)
    with pytest.raises(ValueError, match="takes \\(col\\) or"):
        approx_sql(spark, "SELECT APPROX_TRIMMED_MEAN(x, 0.5) FROM rt", tables)
    # WHERE + explicit states key refuses (pre-reduced states); WHERE on
    # the on-the-fly route filters first
    with pytest.raises(ValueError, match="unfiltered table"):
        approx_sql(spark, "SELECT APPROX_MAD(x) FROM rt WHERE g = 'norm'",
                   tables, catalog=cat, catalog_key="rs")
    r = approx_sql(
        spark, "SELECT APPROX_MAD(x) FROM rt WHERE g = 'norm'", tables
    ).collect()[0]
    x = pdf.loc[pdf["g"] == "norm", "x"].to_numpy()
    exact = float(np.median(np.abs(x - r["median_est"])))
    assert r["mad_lo"] - 1e-9 <= exact <= r["mad_hi"] + 1e-9


def test_sql_robust_unionall_merge_from_states(spark, robust_tables, tmp_path):
    """APPROX_MAD / APPROX_TRIMMED_MEAN over (a UNION ALL b) answer by
    MERGING the sides' registered KLL states — zero base scans, proven by
    EXPLAIN claiming the merge route, and the bracket still covers the
    exact statistic of the concatenated bag."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import explain_sql

    tables, pdf, _ = robust_tables
    rng = np.random.default_rng(47)
    other = pd.DataFrame({"g": "extra", "x": rng.normal(30, 2, 10_000)})
    pb = str(tmp_path / "other")
    spark.createDataFrame(other).write.parquet(pb)
    cat2 = SketchCatalog(spark, str(tmp_path / "cat2"))
    t = dict(tables, ob=pb)
    approx_sql(spark, "CREATE SKETCHES s1 FROM rt KINDS kll(x, k=400)", t, catalog=cat2).collect()
    approx_sql(spark, "CREATE SKETCHES s2 FROM ob KINDS kll(x, k=400)", t, catalog=cat2).collect()
    q = "SELECT APPROX_MAD(x) FROM (SELECT x FROM rt UNION ALL SELECT x FROM ob)"
    ex = {r["property"]: r["value"] for r in explain_sql(spark, q, t, catalog=cat2).collect()}
    assert ex["statement_kind"] == "approx_unionall_merge"
    assert "PERSISTED STATES" in ex["route"] and ex["artifacts"] == "s1, s2"
    both = np.concatenate([pdf["x"].to_numpy(), other["x"].to_numpy()])
    r = approx_sql(spark, q, t, catalog=cat2).collect()[0]
    exact = float(np.median(np.abs(both - r["median_est"])))
    assert r["mad_lo"] - 1e-9 <= exact <= r["mad_hi"] + 1e-9
    r2 = approx_sql(
        spark,
        "SELECT APPROX_TRIMMED_MEAN(x, 0.1, 0.9) AS tmean FROM "
        "(SELECT x FROM rt UNION ALL SELECT x FROM ob)",
        t, catalog=cat2,
    ).collect()[0]
    s = np.sort(both)
    n = len(s)
    exact_tm = float(s[int(np.floor(0.1 * n)):int(np.floor(0.9 * n))].mean())
    assert r2["tm_lo"] - 1e-9 <= exact_tm <= r2["tm_hi"] + 1e-9
    assert "tmean" in r2.asDict() and "tmean_rank_err" in r2.asDict()


def test_sql_histogram_all_routes(spark, robust_tables, tmp_path):
    """APPROX_HISTOGRAM(col, bins): on-the-fly, states-served (auto-
    selected), ROLLUP from the finest states, UNION ALL merge, and the
    argument refusals — plus every served bin's TRUE mass within 2ε of
    1/bins (the equidepth_histogram_df guarantee, through the SQL door)."""
    from sketchlib.sql import explain_sql

    tables, pdf, cat = robust_tables
    fly = approx_sql(spark, "SELECT APPROX_HISTOGRAM(x, 4) FROM rt", tables).toPandas()
    assert len(fly) == 4 and set(fly["bin"]) == {0, 1, 2, 3}
    ex = {r["property"]: r["value"] for r in explain_sql(
        spark, "SELECT APPROX_HISTOGRAM(x, 4) FROM rt GROUP BY g", tables, catalog=cat
    ).collect()}
    assert "persisted_sketch_states" in ex["route"] and ex["artifact"] == "rs"
    out = approx_sql(
        spark, "SELECT APPROX_HISTOGRAM(x, 4) FROM rt GROUP BY g", tables, catalog=cat
    ).toPandas()
    eps = out["rank_err_bound"].iloc[0]
    for g in ("norm", "heavy"):
        srt = np.sort(pdf.loc[pdf["g"] == g, "x"].to_numpy())
        for _, r in out[out["group"] == g].iterrows():
            mass = (
                np.searchsorted(srt, r["hi"], side="right")
                - np.searchsorted(srt, r["lo"], side="right")
            ) / len(srt)
            if r["bin"] == 0:
                mass += (srt == r["lo"]).sum() / len(srt)
            assert abs(mass - 0.25) <= 2 * eps + 1e-12, (g, r["bin"], mass)
    roll = approx_sql(
        spark, "SELECT APPROX_HISTOGRAM(x, 2) FROM rt GROUP BY ROLLUP (g)",
        tables, catalog=cat, catalog_key="rs",
    ).toPandas()
    assert set(roll["grouping_lvl"]) == {0, 1} and len(roll) == 6
    uni = approx_sql(
        spark,
        "SELECT APPROX_HISTOGRAM(x, 4) FROM (SELECT x FROM rt UNION ALL SELECT x FROM rt)",
        tables, catalog=cat,
    ).toPandas()
    # duplicating the bag doesn't change the distribution: the merged
    # states' bins must carry ≈1/4 of the (doubled ≡ original) mass each.
    # (Edges are not bit-equal to the solo serve — merging a KLL state
    # with itself re-compacts, which is lossy within ε.)
    assert len(uni) == 4
    srt_all = np.sort(pdf["x"].to_numpy())
    for _, r in uni.iterrows():
        mass = (
            np.searchsorted(srt_all, r["hi"], side="right")
            - np.searchsorted(srt_all, r["lo"], side="right")
        ) / len(srt_all)
        if r["bin"] == 0:
            mass += (srt_all == r["lo"]).sum() / len(srt_all)
        assert abs(mass - 0.25) <= 2 * r["rank_err_bound"] + 1e-12, (r["bin"], mass)
    with pytest.raises(ValueError, match="takes \\(col, n_bins\\)"):
        approx_sql(spark, "SELECT APPROX_HISTOGRAM(x) FROM rt", tables)
    with pytest.raises(ValueError, match="positive integer"):
        approx_sql(spark, "SELECT APPROX_HISTOGRAM(x, 0) FROM rt", tables)


def test_sql_robust_aliases_and_narrow_window_sizing(spark, robust_tables):
    """Round-5 review fixes: (1) an AS alias on single-table
    APPROX_MAD/APPROX_TRIMMED_MEAN renames est + rank-err like the
    percentile route (it used to raise while the UNION ALL form worked);
    (2) the on-the-fly route SIZES its own KLL from the trim window /
    bin count, so a narrow window never hits the 'register a larger
    sketch' refusal meant for user registrations; (3) aliasing
    APPROX_HISTOGRAM refuses with the multi-column message."""
    tables, pdf, _ = robust_tables
    r = approx_sql(
        spark, "SELECT APPROX_TRIMMED_MEAN(x, 0.1, 0.9) AS tmean FROM rt",
        tables,
    ).collect()[0]
    d = r.asDict()
    assert "tmean" in d and "tmean_rank_err" in d and "tm_lo" in d
    rm = approx_sql(spark, "SELECT APPROX_MAD(x) AS spread FROM rt", tables).collect()[0]
    assert "spread" in rm.asDict() and "spread_rank_err" in rm.asDict()
    # narrow window: k is planned from the window width (ε ≤ width/8)
    rn = approx_sql(
        spark, "SELECT APPROX_TRIMMED_MEAN(x, 0.49, 0.51) FROM rt", tables
    ).collect()[0]
    assert rn["rank_err_bound"] <= 0.02 / 8 + 1e-12
    assert rn["tm_lo"] <= rn["trimmed_mean"] <= rn["tm_hi"]
    # fine histogram: edge noise stays at most half a bin's mass
    hb = approx_sql(spark, "SELECT APPROX_HISTOGRAM(x, 64) FROM rt", tables).collect()
    assert len(hb) == 64 and hb[0]["rank_err_bound"] <= 1.0 / (4 * 64) + 1e-12
    with pytest.raises(ValueError, match="multi-column bin frame"):
        approx_sql(spark, "SELECT APPROX_HISTOGRAM(x, 4) AS h FROM rt", tables)


def test_sql_mad_rollup_rejects_extra_args_on_states_route(spark, robust_tables):
    """The catalog-served ROLLUP path validates arguments exactly like the
    other routes — a bogus extra argument raises instead of being
    silently dropped (round-5 review)."""
    tables, _, cat = robust_tables
    with pytest.raises(ValueError, match="exactly one argument"):
        approx_sql(
            spark, "SELECT APPROX_MAD(x, 0.5) FROM rt GROUP BY ROLLUP (g)",
            tables, catalog=cat, catalog_key="rs",
        )
