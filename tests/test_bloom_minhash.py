"""Bloom + MinHash unit tests: zero false negatives, FPR, Jaccard accuracy."""

import numpy as np
import pytest

from sketchlib import Bloom, MinHash, deserialize
from sketchlib.hashing import hash_ints


def test_bloom_zero_false_negatives():
    keys = np.random.default_rng(5).integers(0, 10**9, 50_000)
    bl = Bloom.for_capacity(len(keys), fpr=0.01).add(keys)
    assert bl.contains(keys).all()


def test_bloom_fpr_near_design():
    present = np.arange(20_000)
    absent = np.arange(10**6, 10**6 + 100_000)
    bl = Bloom.for_capacity(20_000, fpr=0.01).add(present)
    fpr = float(bl.contains(absent).mean())
    assert fpr <= 2 * 0.01, fpr
    assert bl.fpr_bound() <= 1.5 * 0.01


def test_bloom_merge_is_union_bytes():
    a_keys, b_keys = np.arange(0, 5000), np.arange(3000, 9000)
    union = Bloom(m_bits=1 << 17, h=5).add(np.concatenate([a_keys, b_keys]))
    a = Bloom(m_bits=1 << 17, h=5).add(a_keys)
    b = Bloom(m_bits=1 << 17, h=5).add(b_keys)
    assert (a.merge(b).bits == union.bits).all()
    assert a.contains(np.concatenate([a_keys, b_keys])).all()


def test_bloom_serde_and_mismatch():
    bl = Bloom(m_bits=1 << 16, h=4).add(np.arange(100))
    r = deserialize(bl.to_bytes())
    assert (r.bits == bl.bits).all()
    with pytest.raises(ValueError):
        bl.merge(Bloom(m_bits=1 << 15, h=4))


def test_minhash_jaccard_within_se():
    for overlap in (0.0, 0.2, 0.5, 0.9):
        n = 20_000
        shared = int(n * overlap / (2 - overlap))  # so true J == overlap/(2-overlap)...
        a = np.arange(0, n)
        b = np.arange(n - shared, 2 * n - shared)
        true_j = shared / (2 * n - shared)
        ma = MinHash(r=256).update_hashes(hash_ints(a))
        mb = MinHash(r=256).update_hashes(hash_ints(b))
        j, se = ma.jaccard(mb)
        assert abs(j - true_j) <= 4 * se, (overlap, j, true_j)


def test_minhash_merge_is_set_union():
    a, b = np.arange(0, 8000), np.arange(4000, 12000)
    whole = MinHash(r=128).update_hashes(hash_ints(np.concatenate([a, b])))
    ma = MinHash(r=128).update_hashes(hash_ints(a))
    mb = MinHash(r=128).update_hashes(hash_ints(b))
    assert (ma.merge(mb).sig == whole.sig).all()


def test_minhash_identical_sets_j1():
    a = MinHash(r=64).update_hashes(hash_ints(np.arange(1000)))
    b = MinHash(r=64).update_hashes(hash_ints(np.arange(1000)))
    assert a.jaccard(b)[0] == 1.0
