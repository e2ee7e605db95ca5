"""Count-Min unit tests: never undercounts, ε·N bound, merge = add, top-k."""

import collections

import numpy as np
import pytest

from sketchlib import CountMin, deserialize


@pytest.fixture(scope="module")
def zipf_keys():
    rng = np.random.default_rng(7)
    k = rng.zipf(1.2, 500_000)
    return k[k < 100_000]


def test_never_undercounts_and_eps_bound(zipf_keys):
    cm = CountMin(eps=1e-3, delta=0.01)
    cm.update_values(zipf_keys)
    true = collections.Counter(zipf_keys.tolist())
    keys = np.array(list(true.keys())[:5000], dtype=np.int64)
    est = cm.query(keys)
    truth = np.array([true[int(k)] for k in keys])
    assert (est >= truth).all(), "CM must never undercount"
    over = est - truth
    # eps*N bound holds per key with prob >= 1-delta; allow delta fraction violations
    viol = float((over > cm.error_bound()).mean())
    assert viol <= 0.01 + 0.01


def test_unseen_keys_bounded(zipf_keys):
    cm = CountMin(eps=1e-3, delta=0.01).update_values(zipf_keys)
    unseen = np.arange(10**9, 10**9 + 1000)
    assert float((cm.query(unseen) > cm.error_bound()).mean()) <= 0.05


def test_merge_equals_single_shot(zipf_keys):
    whole = CountMin(eps=1e-3, delta=0.05).update_values(zipf_keys)
    parts = np.array_split(zipf_keys, 7)
    acc = CountMin(eps=1e-3, delta=0.05).update_values(parts[0])
    for p in parts[1:]:
        acc.merge(CountMin(eps=1e-3, delta=0.05).update_values(p))
    assert (acc.table == whole.table).all()
    assert acc.total == whole.total


def test_topk_recovers_true_heavy_hitters(zipf_keys):
    cm = CountMin(eps=1e-4, delta=0.01).update_values(zipf_keys)
    true = collections.Counter(zipf_keys.tolist())
    true_top = [k for k, _ in true.most_common(10)]
    ids, est = cm.topk(10)
    # every true top-5 must appear in estimated top-10
    assert set(true_top[:5]) <= set(ids.tolist())
    # estimates within the published overcount bound
    for i, e in zip(ids.tolist(), est.tolist()):
        assert true[i] <= e <= true[i] + 3 * cm.error_bound()


def test_weighted_update():
    cm = CountMin(eps=1e-3, delta=0.01)
    cm.update_values(np.array([1, 2, 3]), counts=np.array([10, 20, 30]))
    assert cm.total == 60
    assert (cm.query(np.array([1, 2, 3])) >= np.array([10, 20, 30])).all()


def test_serde_roundtrip(zipf_keys):
    cm = CountMin(eps=1e-3, delta=0.01).update_values(zipf_keys[:10_000])
    r = deserialize(cm.to_bytes())
    assert (r.table == cm.table).all() and r.total == cm.total
    assert (r.cands == cm.cands).all()
    assert r.to_bytes() == cm.to_bytes()


def test_geometry_mismatch_rejected():
    with pytest.raises(ValueError):
        CountMin(eps=1e-3).merge(CountMin(eps=1e-2))
