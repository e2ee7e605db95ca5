"""Serde robustness: round-trips under hypothesis-chosen params, and garbage
bytes must fail loudly, never deserialize into a broken sketch."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sketchlib import HLL, KLL, Bloom, CountMin, MinHash, TDigest, deserialize
from sketchlib.hashing import hash_ints


@given(
    p=st.integers(4, 18),
    n=st.integers(0, 5000),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=30, deadline=None)
def test_hll_roundtrip_any_params(p, n, seed):
    h = HLL(p=p).update_hashes(hash_ints(np.arange(seed, seed + n)))
    r = deserialize(h.to_bytes())
    assert r.to_bytes() == h.to_bytes()
    assert r.estimate() == h.estimate()


@given(
    eps=st.floats(1e-4, 0.1), delta=st.floats(0.001, 0.3),
    n=st.integers(0, 2000), cap=st.integers(1, 256),
)
@settings(max_examples=20, deadline=None)
def test_cm_roundtrip_any_params(eps, delta, n, cap):
    cm = CountMin(eps=eps, delta=delta, cand_cap=cap)
    cm.update_values(np.arange(n) % 97)
    r = deserialize(cm.to_bytes())
    assert r.to_bytes() == cm.to_bytes()
    assert (r.table == cm.table).all()


@given(k=st.integers(8, 512), n=st.integers(0, 3000))
@settings(max_examples=20, deadline=None)
def test_kll_roundtrip_any_params(k, n):
    s = KLL(k=k).update_values(np.arange(n, dtype=float))
    r = deserialize(s.to_bytes())
    assert r.to_bytes() == s.to_bytes()


@given(c=st.floats(50, 1000), n=st.integers(0, 3000))
@settings(max_examples=20, deadline=None)
def test_tdigest_roundtrip_any_params(c, n):
    s = TDigest(compression=c).update_values(np.arange(n, dtype=float))
    r = deserialize(s.to_bytes())
    assert r.to_bytes() == s.to_bytes()


@given(data=st.binary(min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_garbage_bytes_rejected(data):
    if data[:4] == b"SKL1":
        return  # hypothesis won't produce a full valid frame; skip prefix hits
    with pytest.raises((ValueError, Exception)):
        sk = deserialize(data)
        # if it somehow parsed, it must still behave
        sk.to_bytes()


def test_truncated_valid_frame_rejected():
    h = HLL(p=12).update_hashes(hash_ints(np.arange(1000)))
    buf = h.to_bytes()
    for cut in (3, 5, 10, len(buf) // 2):
        with pytest.raises(Exception):
            deserialize(buf[:cut])


def test_cross_kind_merge_rejected():
    a = HLL(p=12)
    b = Bloom(m_bits=1 << 12, h=3)
    with pytest.raises((ValueError, AttributeError, TypeError)):
        a.merge(b)


def test_minhash_roundtrip_empty():
    m = MinHash(r=64)
    r = deserialize(m.to_bytes())
    assert (r.sig == m.sig).all() and r.n_items == 0
