"""Driver-contract simulation (SURVEY.md §5.6): runs every queries() entry at
sf0.01 and compares to oracle_sql() via DuckDB the way the driver does —
row count, column names, and order-insensitive values."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["within_bound"] for r in rows)


def test_every_oracle_key_has_query():
    q = entrymod.queries()
    for k in entrymod.oracle_sql():
        assert k in q, k


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    assert len(spark_pdf) >= 0  # rows-only floor
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert len(spark_pdf) > 0  # rows-only queries must at least produce rows
        return
    duck_pdf = duck.execute(sql).fetchdf()
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), (len(a), len(b))
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            assert np.allclose(
                a[c].astype(float), b[c].astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            ), c
        else:
            assert (a[c].astype(str) == b[c].astype(str)).all(), (name, c)
