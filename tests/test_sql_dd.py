"""rel_err= on APPROX_PERCENTILE — the DDSketch SQL route.

Contract under test: rel_err=α is a RELATIVE VALUE accuracy spec served by
DDSketch (on the fly at the requested α, or from registered dd states whose
α achieves it); rank_err= stays the KLL route; the two never cross-serve —
a dd state must not answer a plain/rank-bounded statement (its bound is in
different units) and kll/tdigest states must not claim a rel_err contract.
"""

import json

import numpy as np
import pandas as pd
import pytest

from sketchlib.sql import approx_sql, explain_sql
from sketchlib.spark.catalog import SketchCatalog


@pytest.fixture(scope="module")
def dd_table(spark, tmp_path_factory):
    rng = np.random.default_rng(17)
    pdf = pd.DataFrame(
        {
            "price": rng.lognormal(4.0, 0.8, 30_000),
            "seg": [f"s{i % 3}" for i in range(30_000)],
        }
    )
    path = str(tmp_path_factory.mktemp("ddsql") / "t")
    spark.createDataFrame(pdf).write.parquet(path)
    return {"t": path}, pdf


def _exact(vals: np.ndarray, q: float) -> float:
    s = np.sort(vals)
    return float(s[int(np.floor(q * (len(s) - 1)))])


def test_rel_err_on_the_fly(spark, dd_table):
    T, pdf = dd_table
    out = approx_sql(
        spark, "SELECT APPROX_PERCENTILE(price, 0.5, 0.9, 0.99, rel_err=0.02) FROM t",
        tables=T,
    ).toPandas()
    assert sorted(out.columns) == ["q", "rel_err_bound", "value"]
    assert np.allclose(out["rel_err_bound"], 0.02)
    for _, r in out.iterrows():
        v = _exact(pdf["price"].to_numpy(), r["q"])
        assert abs(r["value"] - v) <= 0.02 * abs(v) + 1e-9


def test_rel_err_grouped_and_alias(spark, dd_table):
    T, pdf = dd_table
    out = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(price, 0.9, rel_err=0.05) AS p90 "
        "FROM t GROUP BY seg",
        tables=T,
    ).toPandas()
    assert sorted(out.columns) == ["group", "p90", "p90_rel_err", "q"]
    for _, r in out.iterrows():
        sub = pdf.loc[pdf["seg"] == r["group"], "price"].to_numpy()
        v = _exact(sub, 0.9)
        assert abs(r["p90"] - v) <= 0.05 * abs(v) + 1e-9


def test_both_specs_rejected(spark, dd_table):
    T, _ = dd_table
    with pytest.raises(ValueError, match="ONE accuracy spec"):
        approx_sql(
            spark,
            "SELECT APPROX_PERCENTILE(price, 0.5, rank_err=0.01, rel_err=0.01) FROM t",
            tables=T,
        )


def test_rel_err_within_contract_rejected(spark, dd_table):
    T, _ = dd_table
    with pytest.raises(ValueError, match="ONE accuracy spec"):
        approx_sql(
            spark,
            "SELECT APPROX_PERCENTILE(price, 0.5, rel_err=0.01) FROM t "
            "WITHIN 2% ERROR",
            tables=T,
        )


def test_dd_states_serve_rel_err_and_never_plain(spark, dd_table, tmp_path):
    T, pdf = dd_table
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark,
        f"CREATE SKETCHES dq FROM {T['t']} KINDS dd(price, alpha=0.01), kll(price)",
        catalog=cat,
    )

    # rel_err within alpha -> persisted dd states claim the route
    ex = explain_sql(
        spark, "SELECT APPROX_PERCENTILE(price, 0.9, rel_err=0.02) FROM t",
        tables=T, catalog=cat,
    ).toPandas()
    route = dict(zip(ex["step"], ex["detail"])) if "step" in ex.columns else None
    flat = " ".join(map(str, ex.to_numpy().ravel()))
    assert "persisted_sketch_states" in flat and "dq" in flat, (route, flat)

    out = approx_sql(
        spark, "SELECT APPROX_PERCENTILE(price, 0.9, rel_err=0.02) FROM t",
        tables=T, catalog=cat,
    ).toPandas()
    assert "rel_err_bound" in out.columns
    # the bound reported is the STATE's alpha (0.01), which achieves 0.02
    assert (out["rel_err_bound"] <= 0.02 + 1e-12).all()
    v = _exact(pdf["price"].to_numpy(), 0.9)
    assert abs(out["value"].iloc[0] - v) <= 0.01 * abs(v) + 1e-9

    # a PLAIN statement must not be served by the dd spec: it routes to the
    # same set but picks the kll sketch, answering in rank units
    plain = approx_sql(
        spark, "SELECT APPROX_PERCENTILE(price, 0.9) FROM t",
        tables=T, catalog=cat,
    ).toPandas()
    assert "rank_err_bound" in plain.columns and "rel_err_bound" not in plain.columns

    # rel_err tighter than the registered alpha -> states cannot claim;
    # on-the-fly dd build at the requested alpha
    ex2 = explain_sql(
        spark, "SELECT APPROX_PERCENTILE(price, 0.9, rel_err=0.005) FROM t",
        tables=T, catalog=cat,
    ).toPandas()
    flat2 = " ".join(map(str, ex2.to_numpy().ravel()))
    assert "on_the_fly" in flat2
    tight = approx_sql(
        spark, "SELECT APPROX_PERCENTILE(price, 0.9, rel_err=0.005) FROM t",
        tables=T, catalog=cat,
    ).toPandas()
    assert np.allclose(tight["rel_err_bound"], 0.005)


def test_dd_only_set_refuses_plain_percentile_by_key(spark, dd_table, tmp_path):
    T, _ = dd_table
    cat = SketchCatalog(spark, str(tmp_path / "cat2"))
    approx_sql(
        spark,
        f"CREATE SKETCHES donly FROM {T['t']} KINDS dd(price, alpha=0.01)",
        catalog=cat,
    )
    with pytest.raises(ValueError, match="serving APPROX_PERCENTILE"):
        approx_sql(
            spark, "SELECT APPROX_PERCENTILE(price, 0.5) FROM t",
            tables=T, catalog=cat, catalog_key="donly",
        )
    # with the contract, the same key serves
    out = approx_sql(
        spark, "SELECT APPROX_PERCENTILE(price, 0.5, rel_err=0.01) FROM t",
        tables=T, catalog=cat, catalog_key="donly",
    ).toPandas()
    assert "rel_err_bound" in out.columns and len(out) == 1


def test_rel_err_subsample_estimator_rejected(spark, dd_table):
    T, _ = dd_table
    with pytest.raises(ValueError, match="double|SUBSAMPLING"):
        approx_sql(
            spark,
            "SELECT APPROX_PERCENTILE(price, 0.5, rel_err=0.01) FROM t "
            "ERROR BY SUBSAMPLING",
            tables=T,
        )
