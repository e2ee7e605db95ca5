"""Hypothesis property tests (SURVEY.md §5.2, FIXTURES.md F2):
merge associativity/commutativity under arbitrary data splits and
regroupings — byte-identical for HLL/CM core/Bloom/MinHash, within published
bound for KLL/t-digest.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from sketchlib import HLL, KLL, Bloom, CountMin, MinHash, TDigest
from sketchlib.hashing import hash_ints

_values = st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=400)


def _regroup(data: np.ndarray, boundaries: list[int], perm_seed: int):
    """Split data at boundaries, then return chunks in a permuted order."""
    bs = sorted({b % (len(data) + 1) for b in boundaries})
    chunks = [c for c in np.split(data, bs) if len(c)]
    order = np.random.default_rng(perm_seed).permutation(len(chunks))
    return [chunks[i] for i in order]


@given(_values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=60, deadline=None)
def test_hll_merge_invariant_bytes(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.int64)
    whole = HLL(p=10).update_hashes(hash_ints(data))
    chunks = _regroup(data, boundaries, perm_seed)
    acc = HLL(p=10)
    for c in chunks:
        acc.merge(HLL(p=10).update_hashes(hash_ints(c)))
    assert acc.to_bytes() == whole.to_bytes()


@given(_values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=40, deadline=None)
def test_cm_table_invariant(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.int64)
    mk = lambda: CountMin(eps=0.01, delta=0.1, cand_cap=64)
    whole = mk().update_values(data)
    acc = mk()
    for c in _regroup(data, boundaries, perm_seed):
        acc.merge(mk().update_values(c))
    assert (acc.table == whole.table).all()
    assert acc.total == whole.total
    # estimates (the public surface) identical for any key set
    probe = np.unique(data)
    assert (acc.query(probe) == whole.query(probe)).all()


@given(_values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=40, deadline=None)
def test_bloom_bytes_invariant(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.int64)
    mk = lambda: Bloom(m_bits=1 << 12, h=3)
    whole = mk().add(data)
    acc = mk()
    for c in _regroup(data, boundaries, perm_seed):
        acc.merge(mk().add(c))
    assert (acc.bits == whole.bits).all()


@given(_values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=40, deadline=None)
def test_minhash_sig_invariant(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.int64)
    mk = lambda: MinHash(r=32)
    whole = mk().update_hashes(hash_ints(data))
    acc = mk()
    for c in _regroup(data, boundaries, perm_seed):
        acc.merge(mk().update_hashes(hash_ints(c)))
    assert (acc.sig == whole.sig).all()


@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=20, max_size=500),
    st.lists(st.integers(0, 10**6), max_size=6),
    st.integers(0, 100),
)
@settings(max_examples=30, deadline=None)
def test_quantile_sketches_within_bound_under_regrouping(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.float64)
    qs = np.array([0.1, 0.5, 0.9])
    s = np.sort(data)
    for cls, kw in ((KLL, {"k": 200}), (TDigest, {"compression": 200})):
        acc = None
        for c in _regroup(data, boundaries, perm_seed):
            sk = cls(**kw).update_values(c)
            acc = sk if acc is None else acc.merge(sk)
        approx = acc.quantiles(qs)
        # under ties a value spans the whole rank interval [lo, hi]; the error
        # is the distance from q to that interval (0 if q falls inside it)
        hi = np.searchsorted(s, approx, side="right") / len(s)
        lo = np.searchsorted(s, approx, side="left") / len(s)
        err = np.maximum(lo - qs, qs - hi).clip(min=0.0)
        assert (err <= acc.error_bound() + 1.0 / len(s)).all()


@given(_values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=40, deadline=None)
def test_kmv_bytes_invariant(vals, boundaries, perm_seed):
    from sketchlib import KMV

    data = np.array(vals, dtype=np.int64)
    whole = KMV(k=64).update_hashes(hash_ints(data))
    acc = KMV(k=64)
    for c in _regroup(data, boundaries, perm_seed):
        acc.merge(KMV(k=64).update_hashes(hash_ints(c)))
    assert acc.hashes.tobytes() == whole.hashes.tobytes()
