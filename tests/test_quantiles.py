"""KLL + t-digest unit tests: rank-error bounds vs exact, merge, serde."""

import numpy as np
import pytest

from sketchlib import KLL, TDigest, deserialize

QS = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


@pytest.fixture(scope="module")
def lognormal_data():
    rng = np.random.default_rng(11)
    return rng.lognormal(np.log(512), 0.6, 400_000)


def _rank_errors(data, approx_values, qs):
    s = np.sort(data)
    ranks = np.searchsorted(s, approx_values, side="left") / len(s)
    return np.abs(ranks - qs)


@pytest.mark.parametrize("cls,kw", [(KLL, {"k": 200}), (TDigest, {"compression": 200})])
def test_rank_error_within_bound(cls, kw, lognormal_data):
    sk = cls(**kw)
    for chunk in np.array_split(lognormal_data, 41):
        sk.update_values(chunk)
    errs = _rank_errors(lognormal_data, sk.quantiles(QS), QS)
    assert (errs <= sk.error_bound()).all(), errs


@pytest.mark.parametrize("cls,kw", [(KLL, {"k": 200}), (TDigest, {"compression": 200})])
def test_merge_within_bound(cls, kw, lognormal_data):
    parts = np.array_split(lognormal_data, 9)
    sketches = [cls(**kw).update_values(p) for p in parts]
    acc = sketches[0]
    for s in sketches[1:]:
        acc.merge(s)
    errs = _rank_errors(lognormal_data, acc.quantiles(QS), QS)
    assert (errs <= acc.error_bound()).all(), errs


@pytest.mark.parametrize("cls,kw", [(KLL, {"k": 200}), (TDigest, {"compression": 200})])
def test_fixed_merge_order_is_deterministic(cls, kw, lognormal_data):
    """Same data, same split, same merge order -> byte-identical states."""

    def run():
        parts = np.array_split(lognormal_data[:100_000], 5)
        acc = cls(**kw).update_values(parts[0])
        for p in parts[1:]:
            acc.merge(cls(**kw).update_values(p))
        return acc.to_bytes()

    assert run() == run()


@pytest.mark.parametrize("cls,kw", [(KLL, {"k": 200}), (TDigest, {"compression": 200})])
def test_serde_roundtrip(cls, kw, lognormal_data):
    sk = cls(**kw).update_values(lognormal_data[:50_000])
    r = deserialize(sk.to_bytes())
    assert np.allclose(r.quantiles(QS), sk.quantiles(QS))
    assert r.n_items == sk.n_items


def test_tdigest_tail_accuracy(lognormal_data):
    """t-digest's raison d'être: tails far tighter than the mid-range bound."""
    td = TDigest(200).update_values(lognormal_data)
    tail_qs = np.array([0.001, 0.999])
    errs = _rank_errors(lognormal_data, td.quantiles(tail_qs), tail_qs)
    assert (errs <= 0.001).all(), errs


def test_tdigest_centroid_count_bounded():
    td = TDigest(200).update_values(np.random.default_rng(3).normal(0, 1, 200_000))
    td._flush()
    assert len(td.means) <= 200 / 2 + 2


def test_kll_extremes_and_small_inputs():
    k = KLL(k=200).update_values(np.array([42.0]))
    assert k.quantiles([0.0, 0.5, 1.0]).tolist() == [42.0, 42.0, 42.0]
    empty = KLL(k=200)
    assert np.isnan(empty.quantiles([0.5])).all()


def test_kll_weights_sum_to_n(lognormal_data):
    k = KLL(k=200).update_values(lognormal_data[:100_000])
    _, w = k._weighted()
    assert w.sum() == 100_000
