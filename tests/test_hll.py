"""HLL unit tests (SURVEY.md §5.1): known-answer accuracy, sparse/dense
promotion, merge identities, serde round-trip."""

import numpy as np
import pytest

from sketchlib import HLL, deserialize
from sketchlib.hashing import hash_ints, hash_strings


def _est(h):
    return h.estimate()[0]


@pytest.mark.parametrize("n", [10, 500, 5_000, 100_000, 1_000_000])
def test_accuracy_within_3rse(n):
    h = HLL(p=14).update_hashes(hash_ints(np.arange(n)))
    est, rse = h.estimate()
    assert abs(est - n) / n <= 3 * rse


def test_bias_hump_region():
    # the classic FFGM estimator fails here (~2.45m); Ertl's must not
    m = 1 << 14
    for n in (int(2.2 * m), int(2.45 * m), int(2.7 * m), int(3.0 * m)):
        h = HLL(p=14).update_hashes(hash_ints(np.arange(n)))
        est, rse = h.estimate()
        assert abs(est - n) / n <= 3 * rse


def test_duplicates_do_not_inflate():
    vals = np.arange(1000)
    h = HLL(p=12)
    for _ in range(5):
        h.update_hashes(hash_ints(vals))
    est, rse = h.estimate()
    assert abs(est - 1000) / 1000 <= 3 * rse


def test_string_hashing_path():
    ids = np.array([f"doc{i:08d}" for i in range(20_000)], dtype=object)
    h = HLL(p=14).update_hashes(hash_strings(ids))
    est, rse = h.estimate()
    assert abs(est - 20_000) / 20_000 <= 3 * rse


def test_sparse_dense_promotion_matches():
    n = 10_000  # > m/4 at p=12 -> forces promotion mid-stream
    hashes = hash_ints(np.arange(n))
    one_shot = HLL(p=12).update_hashes(hashes)
    chunked = HLL(p=12)
    for c in np.array_split(hashes, 23):
        chunked.update_hashes(c)
    assert one_shot.to_bytes() == chunked.to_bytes()


def test_merge_equals_single_shot_bytes():
    hashes = hash_ints(np.arange(300_000))
    whole = HLL(p=14).update_hashes(hashes)
    a = HLL(p=14).update_hashes(hashes[:100_000])
    b = HLL(p=14).update_hashes(hashes[100_000:250_000])
    c = HLL(p=14).update_hashes(hashes[250_000:])
    assert a.merge(b).merge(c).to_bytes() == whole.to_bytes()


def test_merge_idempotent():
    h1 = HLL(p=12).update_hashes(hash_ints(np.arange(5000)))
    h2 = HLL(p=12).update_hashes(hash_ints(np.arange(5000)))
    before = h1.estimate()
    h1.merge(h2)
    assert h1.estimate() == before  # same registers -> same estimate


def test_serde_roundtrip_sparse_and_dense():
    sparse = HLL(p=14).update_hashes(hash_ints(np.arange(100)))
    dense = HLL(p=14).update_hashes(hash_ints(np.arange(50_000)))
    assert sparse.dense is None and dense.dense is not None
    for h in (sparse, dense):
        r = deserialize(h.to_bytes())
        assert r.estimate() == h.estimate()
        assert r.to_bytes() == h.to_bytes()
        assert r.n_items == h.n_items


def test_precision_mismatch_rejected():
    with pytest.raises(ValueError):
        HLL(p=12).merge(HLL(p=14))
    with pytest.raises(ValueError):
        HLL(p=3)


@pytest.mark.parametrize("p", [4, 8, 18])
def test_precision_edges(p):
    """Smallest and largest supported precisions stay within bound."""
    n = 50_000
    h = HLL(p=p).update_hashes(hash_ints(np.arange(n)))
    est, rse = h.estimate()
    assert abs(est - n) / n <= 3 * rse + 2.0 / n
    r = deserialize(h.to_bytes())
    assert r.estimate() == h.estimate()
