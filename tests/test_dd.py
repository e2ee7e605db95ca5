"""DDSketch: relative-VALUE-error quantiles (Masson et al. VLDB 2019).

The property that distinguishes it from KLL/t-digest — and what these tests
lock — is twofold: (1) |v̂_q − v_q| ≤ α·|v_q| against the exact order
statistic, and (2) merges are ORDER INDEPENDENT, so states are
byte-identical under ANY partition regrouping (the KLL/t-digest tests can
only claim fixed-merge-order determinism).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sketchlib import DDSketch, deserialize

QS = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999])


@pytest.fixture(scope="module")
def lognormal_data():
    rng = np.random.default_rng(7)
    return rng.lognormal(np.log(512), 0.8, 300_000)


def _exact(data: np.ndarray, qs: np.ndarray) -> np.ndarray:
    """Order statistic at rank ⌊q·(n−1)⌋ — the sketch's rank convention."""
    s = np.sort(data)
    idx = np.floor(qs * (len(s) - 1)).astype(int)
    return s[idx]


def _assert_within_alpha(data, sk, qs=QS):
    est = sk.quantiles(qs)
    exact = _exact(np.asarray(data, dtype=np.float64), qs)
    rel = np.abs(est - exact) / np.maximum(np.abs(exact), 1e-300)
    ok = rel <= sk.alpha + 1e-12
    # exact zeros answer exactly (dedicated zero bucket)
    ok |= (exact == 0) & (est == 0)
    assert ok.all(), (est, exact, rel)


def test_relative_error_within_alpha(lognormal_data):
    sk = DDSketch(alpha=0.01)
    for chunk in np.array_split(lognormal_data, 37):
        sk.update_values(chunk)
    assert not sk.collapsed
    _assert_within_alpha(lognormal_data, sk)


def test_merge_within_alpha_and_byte_identical_any_order(lognormal_data):
    parts = np.array_split(lognormal_data, 11)
    sketches = [DDSketch(alpha=0.01).update_values(p) for p in parts]
    fwd = DDSketch(alpha=0.01)
    for s in sketches:
        fwd.merge(deserialize(s.to_bytes()))
    rev = DDSketch(alpha=0.01)
    for s in reversed(sketches):
        rev.merge(deserialize(s.to_bytes()))
    whole = DDSketch(alpha=0.01).update_values(lognormal_data)
    # order independence is structural: no RNG, pure count addition
    assert fwd.to_bytes() == rev.to_bytes() == whole.to_bytes()
    _assert_within_alpha(lognormal_data, fwd)


@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=300),
    st.lists(st.integers(0, 10**6), max_size=6),
    st.integers(0, 100),
)
@settings(max_examples=60, deadline=None)
def test_dd_bytes_invariant_under_regrouping(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.float64)
    whole = DDSketch(alpha=0.02, max_bins=128).update_values(data)
    bs = sorted({b % (len(data) + 1) for b in boundaries})
    chunks = [c for c in np.split(data, bs) if len(c)]
    order = np.random.default_rng(perm_seed).permutation(len(chunks))
    acc = DDSketch(alpha=0.02, max_bins=128)
    for i in order:
        acc.merge(DDSketch(alpha=0.02, max_bins=128).update_values(chunks[i]))
    assert acc.to_bytes() == whole.to_bytes()


def test_negatives_zeros_and_mixed_sign():
    rng = np.random.default_rng(3)
    neg = -rng.lognormal(2.0, 0.7, 50_000)
    zer = np.zeros(1_000)
    pos = rng.lognormal(4.0, 0.5, 50_000)
    data = np.concatenate([neg, zer, pos])
    rng.shuffle(data)
    sk = DDSketch(alpha=0.01).update_values(data)
    assert sk.n_items == len(data)
    _assert_within_alpha(data, sk)
    # median region includes the zero plateau: a q whose exact value is 0
    q_at_zero = 0.497  # inside the zero run after sorting
    assert _exact(data, np.array([q_at_zero]))[0] == 0.0
    assert sk.quantiles([q_at_zero])[0] == 0.0


def test_nan_inf_dropped_and_empty():
    sk = DDSketch()
    sk.update_values(np.array([np.nan, np.inf, -np.inf]))
    assert sk.n_items == 0
    assert np.isnan(sk.quantiles([0.5])[0])
    sk.update_values(np.array([np.nan, 5.0]))
    assert sk.n_items == 1
    est, bound = sk.estimate()
    assert abs(est - 5.0) <= 0.01 * 5.0 + 1e-12
    assert bound == pytest.approx(sk.alpha * abs(est))


def test_collapsing_bounds_memory_and_keeps_upper_quantiles():
    rng = np.random.default_rng(9)
    # 12 decades of positive dynamic range -> thousands of buckets at α=0.01
    data = 10.0 ** rng.uniform(-6, 6, 200_000)
    sk = DDSketch(alpha=0.01, max_bins=256)
    for chunk in np.array_split(data, 23):
        sk.update_values(chunk)
    assert sk.collapsed
    assert len(sk.pos_keys) <= 256
    upper = np.array([0.9, 0.99, 0.999])
    est = sk.quantiles(upper)
    exact = _exact(data, upper)
    rel = np.abs(est - exact) / np.abs(exact)
    assert (rel <= sk.alpha + 1e-12).all()


def test_serde_roundtrip(lognormal_data):
    sk = DDSketch(alpha=0.005, max_bins=512).update_values(lognormal_data[:10_000])
    back = deserialize(sk.to_bytes())
    assert isinstance(back, DDSketch)
    assert back.to_bytes() == sk.to_bytes()
    assert np.array_equal(back.quantiles(QS), sk.quantiles(QS))
    assert back.n_items == sk.n_items


def test_rank_is_inverse_ish_of_quantile(lognormal_data):
    sk = DDSketch(alpha=0.01).update_values(lognormal_data[:50_000])
    vals = sk.quantiles(QS)
    ranks = sk.rank(vals)
    assert (np.abs(ranks - QS) <= 0.02).all()


def test_validation():
    with pytest.raises(ValueError):
        DDSketch(alpha=0.0)
    with pytest.raises(ValueError):
        DDSketch(alpha=1.0)
    with pytest.raises(ValueError):
        DDSketch(max_bins=1)
    with pytest.raises(ValueError):
        DDSketch(alpha=0.01).merge(DDSketch(alpha=0.02))


def test_spark_build_and_rel_quantiles_df(spark):
    from sketchlib.spark import SketchSpec, build_sketches, merge_states
    from sketchlib.spark.query import rel_quantiles_df

    rng = np.random.default_rng(21)
    vals = rng.lognormal(5.0, 0.9, 40_000)
    grp = rng.integers(0, 3, 40_000)
    df = spark.createDataFrame(
        [(int(g), float(v)) for g, v in zip(grp, vals)], "g int, x double"
    )
    states = merge_states(
        build_sketches(df, [SketchSpec("q", "dd", "x", {"alpha": 0.02})], group_by="g")
    )
    out = rel_quantiles_df(spark, states, "q", [0.5, 0.9, 0.99]).collect()
    assert len(out) == 9
    for r in out:
        sub = np.sort(vals[grp == int(r["group"])])
        exact = sub[int(np.floor(r["q"] * (len(sub) - 1)))]
        assert abs(r["value"] - exact) <= 0.02 * abs(exact) + 1e-9
        assert r["rel_err_bound"] == pytest.approx(0.02)


def test_dd_through_ddl_door(spark, tmp_path):
    import pandas as pd

    from sketchlib.sql import approx_sql
    from sketchlib.spark.catalog import SketchCatalog

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"price": rng.lognormal(4.0, 0.6, 20_000)})
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark, f"CREATE SKETCHES s FROM {path} KINDS dd(price, alpha=0.02)",
        catalog=cat,
    )
    names = {r["name"] for r in approx_sql(spark, "SHOW SKETCHES", catalog=cat).collect()}
    assert "s" in names
