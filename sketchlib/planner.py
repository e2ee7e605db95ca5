"""Error-budget → sketch-parameter selection (SURVEY.md §4 row 1).

Verdict's optimizer picks the best sample (type, ratio) for a query's
accuracy/cost target; our analog is closed-form — each sketch's published
bound inverts directly to the cheapest parameters meeting a requested error,
so "optimization" is arithmetic, not search. Returns SketchSpec-ready params
plus the state-size cost so callers can see the accuracy/space trade.
"""

from __future__ import annotations

import math


def hll_params(target_rse: float) -> dict:
    """Smallest p with 1.04/√(2^p) ≤ target_rse (clamped to [4, 18])."""
    m_needed = (1.04 / target_rse) ** 2
    p = max(4, min(18, math.ceil(math.log2(m_needed))))
    return {"p": p, "rse": 1.04 / math.sqrt(1 << p), "state_bytes": (1 << p)}


def cm_params(target_eps: float, target_delta: float = 0.01) -> dict:
    """w=⌈e/ε⌉, d=⌈ln(1/δ)⌉ (Cormode-Muthukrishnan)."""
    w = math.ceil(math.e / target_eps)
    d = math.ceil(math.log(1.0 / target_delta))
    return {"eps": target_eps, "delta": target_delta, "state_bytes": w * d * 8, "w": w, "d": d}


def mg_params(target_eps: float) -> dict:
    """k = ⌈1/ε⌉ − 1 counters guarantee undercount ≤ N/(k+1) ≤ ε·N with
    certainty (Misra-Gries 1982; merge bound Agarwal et al. 2013). State
    is two int64 arrays of ≤ k entries — deterministic, no δ to budget."""
    k = max(1, math.ceil(1.0 / target_eps) - 1)
    return {"eps": target_eps, "k": k, "state_bytes": k * 16}


def kll_params(target_rank_err: float) -> dict:
    """k from the ε(k) ≈ 3.31/k calibration (sketchlib.sketches.kll)."""
    k = max(8, math.ceil(3.31 / target_rank_err))
    return {"k": k, "rank_err": 3.31 / k, "state_bytes_approx": int(3 * k * 8)}


def tdigest_params(target_rank_err: float) -> dict:
    """compression δ via the same proxy bound (loose for t-digest mid-range)."""
    c = max(50, math.ceil(3.31 / target_rank_err))
    return {"compression": float(c), "state_bytes_approx": int(c * 8)}


def dd_params(target_rel_err: float, max_bins: int = 2048) -> dict:
    """α IS the bound — DDSketch answers within α·|x_q| by construction
    (Masson et al. VLDB 2019); state is ≤ max_bins·16 B per store."""
    return {
        "alpha": float(target_rel_err),
        "max_bins": int(max_bins),
        "state_bytes_max": int(max_bins * 16 * 2),
    }


def bloom_params(n_keys: int, target_fpr: float) -> dict:
    """Optimal m = −n·ln(fpr)/ln²2, h = (m/n)·ln2 (Bloom 1970)."""
    n = max(1, n_keys)
    m = math.ceil(-n * math.log(target_fpr) / (math.log(2) ** 2))
    h = max(1, round((m / n) * math.log(2)))
    return {"m_bits": m, "h": h, "state_bytes": m // 8}


def minhash_params(target_jaccard_se: float) -> dict:
    """r from SE ≤ 0.5/√r."""
    r = max(16, math.ceil((0.5 / target_jaccard_se) ** 2))
    return {"r": r, "se": 0.5 / math.sqrt(r), "state_bytes": r * 8}


def plan(budget: dict) -> dict:
    """Bulk helper: {'distinct_rse': .., 'freq_eps': .., 'rank_err': ..,
    'bloom': (n, fpr), 'jaccard_se': ..} → params per kind."""
    out = {}
    if "distinct_rse" in budget:
        out["hll"] = hll_params(budget["distinct_rse"])
    if "freq_eps" in budget:
        out["cm"] = cm_params(budget["freq_eps"], budget.get("freq_delta", 0.01))
    if "rank_err" in budget:
        out["kll"] = kll_params(budget["rank_err"])
        out["tdigest"] = tdigest_params(budget["rank_err"])
    if "value_rel_err" in budget:
        out["dd"] = dd_params(budget["value_rel_err"])
    if "bloom" in budget:
        out["bloom"] = bloom_params(*budget["bloom"])
    if "jaccard_se" in budget:
        out["minhash"] = minhash_params(budget["jaccard_se"])
    return out
