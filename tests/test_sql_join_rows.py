"""APPROX_JOIN_ROWS through the SQL door: join-cardinality estimation from
CM states (on-the-fly and catalog-served), EXPLAIN parity, and the grammar's
descriptive-error contract."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.sql import approx_sql, explain_sql


@pytest.fixture(scope="module")
def jr_tables(spark, tmp_path_factory):
    """Two parquet tables joined on an integer key with real multiplicity."""
    rng = np.random.default_rng(47)
    a = pd.DataFrame({"k": rng.integers(0, 500, 20000), "x": rng.uniform(0, 1, 20000)})
    b = pd.DataFrame({"j": rng.integers(0, 500, 8000), "y": rng.uniform(0, 1, 8000)})
    d = tmp_path_factory.mktemp("jr")
    ap, bp = str(d / "ta"), str(d / "tb")
    spark.createDataFrame(a).write.parquet(ap)
    spark.createDataFrame(b).write.parquet(bp)
    exact = (
        spark.read.parquet(ap)
        .join(spark.read.parquet(bp), F.col("k") == F.col("j"))
        .count()
    )
    return {"ta": ap, "tb": bp}, exact


def test_join_rows_on_the_fly(spark, jr_tables):
    tables, exact = jr_tables
    out = approx_sql(
        spark, "SELECT APPROX_JOIN_ROWS(a.k, b.j) FROM ta a, tb b", tables
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert set(r.asDict()) == {"join_rows_est", "join_rows_err"}
    assert r["join_rows_est"] >= exact  # CM inner product never undercounts
    assert r["join_rows_est"] - exact <= r["join_rows_err"]
    assert r["join_rows_err"] == pytest.approx(1e-4 * 20000 * 8000)


def test_join_rows_alias_and_explicit_eps(spark, jr_tables):
    tables, exact = jr_tables
    r = approx_sql(
        spark,
        "SELECT APPROX_JOIN_ROWS(a.k, b.j, 1e-3) AS jr FROM ta a, tb b",
        tables,
    ).collect()[0]
    assert set(r.asDict()) == {"jr", "jr_err"}
    assert r["jr"] >= exact and r["jr"] - exact <= r["jr_err"]
    assert r["jr_err"] == pytest.approx(1e-3 * 20000 * 8000)


def test_join_rows_states_route(spark, jr_tables, tmp_path):
    """Both sides registered with geometry-identical CMs → answered from
    states with ZERO base scans (proven by deleting both base tables)."""
    import shutil

    from sketchlib.spark.catalog import SketchCatalog

    tables, exact = jr_tables
    # copy the bases so this test can delete them without breaking others
    ta, tb = str(tmp_path / "ta"), str(tmp_path / "tb")
    shutil.copytree(tables["ta"], ta)
    shutil.copytree(tables["tb"], tb)
    tbl = {"ta": ta, "tb": tb}
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(spark, "CREATE SKETCHES jra FROM ta KINDS cm(k)", tbl, cat).collect()
    approx_sql(spark, "CREATE SKETCHES jrb FROM tb KINDS cm(j)", tbl, cat).collect()
    ex = {
        k: v
        for k, v in explain_sql(
            spark, "SELECT APPROX_JOIN_ROWS(a.k, b.j) FROM ta a, tb b", tbl, cat
        ).collect()
    }
    assert ex["statement_kind"] == "approx_join_rows"
    assert ex["route"].startswith("persisted sketch states")
    shutil.rmtree(ta)
    shutil.rmtree(tb)
    r = approx_sql(
        spark, "SELECT APPROX_JOIN_ROWS(a.k, b.j) FROM ta a, tb b", tbl, cat
    ).collect()[0]
    assert r["join_rows_est"] >= exact
    assert r["join_rows_est"] - exact <= r["join_rows_err"]


def test_join_rows_geometry_mismatch_falls_back(spark, jr_tables, tmp_path):
    """Registrations whose CM geometries differ cannot pair — the resolver
    declines and execution builds on the fly (EXPLAIN says so)."""
    from sketchlib.spark.catalog import SketchCatalog

    tables, exact = jr_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat2"))
    approx_sql(spark, "CREATE SKETCHES ga FROM ta KINDS cm(k)", tables, cat).collect()
    approx_sql(
        spark, "CREATE SKETCHES gb FROM tb KINDS cm(j, eps=0.001)", tables, cat
    ).collect()
    ex = {
        k: v
        for k, v in explain_sql(
            spark, "SELECT APPROX_JOIN_ROWS(a.k, b.j) FROM ta a, tb b", tables, cat
        ).collect()
    }
    assert ex["route"].startswith("on-the-fly")
    r = approx_sql(
        spark, "SELECT APPROX_JOIN_ROWS(a.k, b.j) FROM ta a, tb b", tables, cat
    ).collect()[0]
    assert r["join_rows_est"] >= exact


def test_join_rows_errors_are_descriptive(spark, jr_tables):
    tables, _ = jr_tables
    with pytest.raises(ValueError, match="matches no FROM entry"):
        approx_sql(spark, "SELECT APPROX_JOIN_ROWS(z.k, b.j) FROM ta a, tb b", tables)
    with pytest.raises(ValueError, match="numeric"):
        approx_sql(
            spark, "SELECT APPROX_JOIN_ROWS(a.k, b.j, tight) FROM ta a, tb b", tables
        )
    with pytest.raises(ValueError, match="SUBSAMPLING"):
        approx_sql(
            spark,
            "SELECT APPROX_JOIN_ROWS(a.k, b.j) FROM ta a, tb b ERROR BY SUBSAMPLING",
            tables,
        )


def test_join_rows_catalog_key_refused(spark, jr_tables, tmp_path):
    from sketchlib.spark.catalog import SketchCatalog

    tables, _ = jr_tables
    cat = SketchCatalog(spark, str(tmp_path / "cat3"))
    with pytest.raises(ValueError, match="PER SIDE"):
        approx_sql(
            spark,
            "SELECT APPROX_JOIN_ROWS(a.k, b.j) FROM ta a, tb b",
            tables,
            cat,
            catalog_key="anything",
        )


def test_join_rows_self_join_second_moment(spark, jr_tables):
    """Self-join via two aliases = the key's second frequency moment."""
    import collections

    tables, _ = jr_tables
    ks = [r["k"] for r in spark.read.parquet(tables["ta"]).select("k").collect()]
    f2 = sum(c * c for c in collections.Counter(ks).values())
    r = approx_sql(
        spark, "SELECT APPROX_JOIN_ROWS(x.k, y.k) FROM ta x, ta y", tables
    ).collect()[0]
    assert r["join_rows_est"] >= f2
    assert r["join_rows_est"] - f2 <= r["join_rows_err"]


def test_join_rows_duplicate_alias_rejected(spark, jr_tables):
    """A duplicate FROM-entry name must raise, not silently resolve both
    qualifiers to the second table (a wrong-answer shape)."""
    tables, _ = jr_tables
    with pytest.raises(ValueError, match="distinct aliases"):
        approx_sql(spark, "SELECT APPROX_JOIN_ROWS(x.k, x.j) FROM ta x, tb x", tables)
