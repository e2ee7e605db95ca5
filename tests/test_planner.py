"""Error-budget parameter planner: chosen params must actually meet the
requested bound when run against real data (no-Spark, numpy-only)."""

import numpy as np

from sketchlib import HLL, KLL, Bloom, CountMin, MinHash
from sketchlib.hashing import hash_ints
from sketchlib.planner import bloom_params, cm_params, hll_params, kll_params, minhash_params, plan


def test_hll_params_meet_budget():
    p = hll_params(0.01)
    assert p["rse"] <= 0.01
    h = HLL(p=p["p"]).update_hashes(hash_ints(np.arange(200_000)))
    est, rse = h.estimate()
    assert rse <= 0.01
    assert abs(est - 200_000) / 200_000 <= 3 * rse


def test_cm_params_meet_budget():
    prm = cm_params(1e-3, 0.01)
    cm = CountMin(eps=prm["eps"], delta=prm["delta"])
    assert cm.w == prm["w"] and cm.d == prm["d"]
    keys = np.random.default_rng(3).zipf(1.3, 100_000)
    cm.update_values(keys)
    assert cm.error_bound() <= 1e-3 * cm.total + 1e-9


def test_kll_params_meet_budget():
    prm = kll_params(0.01)
    data = np.random.default_rng(5).normal(0, 1, 200_000)
    k = KLL(k=prm["k"]).update_values(data)
    assert k.error_bound() <= 0.01
    qs = np.array([0.25, 0.5, 0.75])
    ranks = np.searchsorted(np.sort(data), k.quantiles(qs)) / len(data)
    assert (np.abs(ranks - qs) <= 0.01).all()


def test_bloom_params_meet_budget():
    prm = bloom_params(50_000, 0.01)
    bl = Bloom(m_bits=prm["m_bits"], h=prm["h"]).add(np.arange(50_000))
    absent = np.arange(10**6, 10**6 + 50_000)
    assert bl.contains(absent).mean() <= 0.02


def test_minhash_params_and_bulk_plan():
    prm = minhash_params(0.02)
    assert prm["se"] <= 0.02
    a = MinHash(r=prm["r"]).update_hashes(hash_ints(np.arange(0, 10_000)))
    b = MinHash(r=prm["r"]).update_hashes(hash_ints(np.arange(5_000, 15_000)))
    j, se = a.jaccard(b)
    assert se <= 0.02 and abs(j - 1 / 3) <= 4 * se

    p = plan({"distinct_rse": 0.01, "freq_eps": 1e-4, "rank_err": 0.02, "bloom": (10_000, 0.01), "jaccard_se": 0.05})
    assert set(p) == {"hll", "cm", "kll", "tdigest", "bloom", "minhash"}
    assert all("state_bytes" in v or "state_bytes_approx" in v for v in p.values())
