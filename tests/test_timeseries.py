"""As-of join: semantics vs pandas merge_asof and DuckDB ASOF JOIN."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.timeseries import asof_join


@pytest.fixture(scope="module")
def frames(rng):
    n_l, n_r = 400, 120
    left = pd.DataFrame({
        "k": rng.integers(0, 8, n_l),
        "ts": rng.uniform(0, 1000, n_l).round(3),
        "lval": np.arange(n_l),
    }).sort_values(["k", "ts"], ignore_index=True)
    right = pd.DataFrame({
        "k": rng.integers(0, 8, n_r),
        "ts": rng.uniform(0, 1000, n_r).round(3),
        "price": rng.uniform(1, 100, n_r).round(2),
    }).sort_values(["k", "ts"], ignore_index=True)
    return left, right


def _spark_result(spark, left, right, **kw):
    lo = spark.createDataFrame(left)
    ro = spark.createDataFrame(right)
    return (
        asof_join(lo, ro, "k", **kw)
        .toPandas()
        .sort_values(["k", "ts", "lval"], ignore_index=True)
    )


def test_asof_backward_matches_pandas(spark, frames):
    left, right = frames
    got = _spark_result(spark, left, right)
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k", direction="backward"
    ).sort_values(["k", "ts", "lval"], ignore_index=True)
    assert np.allclose(got["price"].to_numpy(), want["price"].to_numpy(), equal_nan=True)


def test_asof_backward_matches_duckdb(spark, frames):
    left, right = frames
    got = _spark_result(spark, left, right)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(
        "SELECT l.k, l.ts, l.lval, r.price FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.k, l.ts, l.lval"
    ).df()
    assert np.allclose(got["price"].to_numpy(), want["price"].to_numpy(), equal_nan=True)


def test_asof_forward_and_tolerance(spark, frames):
    left, right = frames
    got = _spark_result(spark, left, right, direction="forward")
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k", direction="forward"
    ).sort_values(["k", "ts", "lval"], ignore_index=True)
    assert np.allclose(got["price"].to_numpy(), want["price"].to_numpy(), equal_nan=True)

    got_t = _spark_result(spark, left, right, tolerance=5.0)
    want_t = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k",
        direction="backward", tolerance=5.0,
    ).sort_values(["k", "ts", "lval"], ignore_index=True)
    assert np.allclose(got_t["price"].to_numpy(), want_t["price"].to_numpy(), equal_nan=True)


def test_asof_inclusive_tie_and_unmatched(spark):
    left = pd.DataFrame({"k": [1, 1, 2], "ts": [10.0, 5.0, 3.0], "lval": [0, 1, 2]})
    right = pd.DataFrame({"k": [1, 1], "ts": [10.0, 7.0], "price": [100.0, 70.0]})
    got = _spark_result(spark, left, right)
    by = {int(r["lval"]): r["price"] for _, r in got.iterrows()}
    assert by[0] == 100.0   # equal ts matches (inclusive)
    assert np.isnan(by[1])  # before any right row
    assert np.isnan(by[2])  # key with no right rows at all

    # right value column named like a left column must be rejected up front
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(left),  # right shares the 'lval' column name
            "k",
            value_cols=["lval"],
        )


def test_asof_null_right_value_is_not_stitched(spark):
    """Review regression: a matched right row whose value is NULL must yield
    NULL (row semantics), not the previous row's non-null value — and the
    tolerance must be judged against the actually-matched row's ts."""
    left = pd.DataFrame({"k": [1], "ts": [200.0], "lval": [0]})
    right = pd.DataFrame({"k": [1, 1], "ts": [100.0, 199.0], "price": [10.0, np.nan]})
    got = _spark_result(spark, left, right, tolerance=5.0)
    assert np.isnan(got["price"][0])  # matched ts=199 row, whose price IS null
    assert got["_matched_ts"][0] == 199.0
    # without tolerance, same row semantics
    got2 = _spark_result(spark, left, right)
    assert np.isnan(got2["price"][0]) and got2["_matched_ts"][0] == 199.0


def test_asof_randomized_against_pandas(spark, rng):
    """Randomized robustness: duplicate timestamps on both sides, sparse
    keys, NULL right values — Spark result must match merge_asof rows."""
    for trial in range(3):
        n_l, n_r = 150, 60
        left = pd.DataFrame({
            "k": rng.integers(0, 5, n_l),
            "ts": rng.integers(0, 50, n_l).astype("float64"),  # many ties
            "lval": np.arange(n_l),
        })
        price = rng.uniform(0, 10, n_r).round(2)
        price[rng.random(n_r) < 0.25] = np.nan  # NULL right values
        right = pd.DataFrame({
            "k": rng.integers(0, 5, n_r),
            "ts": rng.integers(0, 50, n_r).astype("float64"),
            "price": price,
        })
        # asof is ambiguous among equal (k, ts) right rows — keep one per (k, ts)
        right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)
        got = _spark_result(spark, left, right)
        want = pd.merge_asof(
            left.sort_values(["ts", "lval"]), right.sort_values("ts"),
            on="ts", by="k", direction="backward",
        ).sort_values(["k", "ts", "lval"], ignore_index=True)
        assert np.allclose(got["price"].to_numpy(), want["price"].to_numpy(), equal_nan=True), trial


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_time_buckets_value_identical(spark, frames, direction):
    """The hot-key escape hatch (time_buckets=n) must return value-identical
    results to the single-window path in both directions."""
    left, right = frames
    base = _spark_result(spark, left, right, direction=direction)
    bucketed = _spark_result(spark, left, right, direction=direction, time_buckets=7)
    key = lambda df: sorted(  # noqa: E731
        (int(r["k"]), float(r["ts"]), int(r["lval"]),
         None if pd.isna(r["price"]) else round(float(r["price"]), 9),
         None if pd.isna(r["_matched_ts"]) else round(float(r["_matched_ts"]), 9))
        for _, r in df.iterrows()
    )
    assert key(bucketed) == key(base)


def test_time_buckets_hot_key_skew(spark, rng):
    """One key holding 90% of rows: bucketing spreads it across (key, bucket)
    tasks; results still match pandas merge_asof exactly."""
    n = 5000
    hot = rng.uniform(0, 1000, int(n * 0.9))
    cold_k = rng.integers(1, 6, n - len(hot))
    left = pd.DataFrame({
        "k": np.concatenate([np.zeros(len(hot), dtype=np.int64), cold_k]),
        "ts": np.concatenate([hot, rng.uniform(0, 1000, n - len(hot))]).round(3),
        "lval": np.arange(n),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 6, 300),
        "ts": rng.uniform(0, 1000, 300).round(3),
        "price": rng.uniform(1, 100, 300).round(2),
    })
    got = _spark_result(spark, left, right, time_buckets=16)
    want = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts", by="k", direction="backward",
    )
    g = got.sort_values("lval", ignore_index=True)
    w = want.sort_values("lval", ignore_index=True)
    assert len(g) == len(w) == n
    pd.testing.assert_series_equal(
        g["price"].astype("float64"), w["price"].astype("float64"), check_names=False
    )
