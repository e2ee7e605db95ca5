"""Misra-Gries frequent-items summary (SURVEY.md §2B addition, round 5).

Algorithm: Misra & Gries, "Finding Repeated Elements" (Sci. Comput. Program.
1982); batched/merge form per Agarwal, Cormode, Huang, Phillips, Wei, Yi,
"Mergeable Summaries" (PODS 2012 / TODS 2013) §3 — the paper whose merge
semantics this whole library is built on, and whose flagship example is
exactly this summary.

The deterministic complement of Count-Min (cm.py): CM never UNDERcounts and
overshoots by ≤ ε·N w.p. ≥ 1−δ; Misra-Gries never OVERcounts and undershoots
by a bound it tracks EXACTLY. With k = ⌈1/ε⌉ − 1 counters, for every key x:

    true(x) − decr ≤ est(x) ≤ true(x),     decr ≤ N/(k+1) ≤ ε·N  (always)

where ``decr`` is the cumulative decrement the summary has applied — a
data-dependent certificate, usually far below the worst-case ε·N, and exact
(no probability: the bound cannot fail). Every key with true(x) > decr is
GUARANTEED present in the summary (est > 0), so top-k recall over
(decr)-heavy keys is 1.0 by construction — a claim CM can only make w.h.p.

Update/merge are one shared vectorized combine: concatenate (ids, counts),
np.unique-sum, and if more than k keys survive subtract the (k+1)-th largest
count m from everything and drop the non-positive (Agarwal et al. §3.1's
merge, which subsumes the classic one-at-a-time decrement). Each subtraction
removes ≥ (k+1)·m total weight — at least k+1 keys have count ≥ m by choice
of m — so Σm ≤ N/(k+1): the classic bound survives arbitrary merge trees,
which is the Mergeable Summaries theorem and what hypothesis locks in
tests/test_mg.py under random regroupings.

Merged CONTENTS are not byte-identical under regrouping (the subtraction
points differ — unlike HLL/CM/Bloom, like KLL/t-digest); the bound and the
heavy-key containment hold for every grouping, and the Spark merge layer's
canonical state ordering (build.py) makes any fixed partitioning
deterministic and resume byte-identical.

Weighted updates (counts = non-negative integer weights) are native — the
combine never assumed multiplicity 1 — so ``SketchSpec(weight=...)`` serves
heavy-hitters-BY-SUM with the same undercount certificate.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.sketches.base import SketchBase, np_frombytes, np_tobytes, register


@register
class MisraGries(SketchBase):
    kind = "mg"

    def __init__(self, eps: float = 1e-4, k: int | None = None):
        """``k`` counters guarantee undercount ≤ N/(k+1); default derives
        k = ⌈1/ε⌉ − 1 so the familiar ε·N form holds with the SAME ε a
        Count-Min would be sized with."""
        self.eps = float(eps)
        self.k = int(k) if k is not None else max(1, int(math.ceil(1.0 / self.eps)) - 1)
        if self.k < 1:
            raise ValueError(f"k must be ≥ 1, got {self.k}")
        self.ids = np.empty(0, dtype=np.int64)  # kept sorted ascending
        self.counts = np.empty(0, dtype=np.int64)
        self.total = 0  # N = total weight inserted (for the N/(k+1) form)
        self.decr = 0  # exact cumulative decrement = the undercount bound
        self._n_items = 0

    # --- update ----------------------------------------------------------
    def update_values(self, values: np.ndarray, counts: np.ndarray | None = None) -> "MisraGries":
        """Add integer keys with optional non-negative integer weights."""
        v = np.asarray(values)
        if v.size == 0:
            return self
        if counts is None:
            u, c = np.unique(v, return_counts=True)
            u = u.astype(np.int64, copy=False)
        else:
            u = v.astype(np.int64, copy=False)
            c = np.asarray(counts, dtype=np.int64)
            if c.min(initial=0) < 0:
                raise ValueError("Misra-Gries weights must be non-negative")
        w = int(c.sum())
        self._n_items += w
        self.total += w
        self._combine(u, c)
        return self

    def _combine(self, ids: np.ndarray, cnts: np.ndarray) -> None:
        """Shared update/merge kernel: unique-sum, then one batched decrement
        of the (k+1)-th largest count if more than k keys remain."""
        if len(self.ids):
            ids = np.concatenate([self.ids, ids])
            cnts = np.concatenate([self.counts, cnts])
        u, inv = np.unique(ids, return_inverse=True)
        # float64 bincount weights are exact for counts < 2^53 — same
        # contract as CM's update path (cm.py)
        s = np.bincount(inv, weights=cnts.astype(np.float64)).astype(np.int64)
        # zero-count keys carry no information (query returns 0 either way)
        # but, unpruned, a zero-weighted feed would grow the state past k
        # counters and pad topk with est=0 keys — drop them unconditionally
        keep = s > 0
        if not keep.all():
            u, s = u[keep], s[keep]
        if len(u) > self.k:
            m = int(np.partition(s, len(s) - self.k - 1)[len(s) - self.k - 1])
            if m > 0:
                s = s - m
                keep = s > 0
                u, s = u[keep], s[keep]
                self.decr += m
        self.ids, self.counts = u, s

    # --- query -----------------------------------------------------------
    def query(self, keys: np.ndarray) -> np.ndarray:
        """Stored (lower-bound) counts for integer keys; 0 when absent.
        true(x) ∈ [est, est + decr] for every key, deterministically."""
        u = np.asarray(keys, dtype=np.int64)
        if len(self.ids) == 0:
            return np.zeros(len(u), dtype=np.int64)
        pos = np.clip(np.searchsorted(self.ids, u), 0, len(self.ids) - 1)
        hit = self.ids[pos] == u
        return np.where(hit, self.counts[pos], 0).astype(np.int64)

    def error_bound(self) -> float:
        """EXACT undercount bound: est(x) ≤ true(x) ≤ est(x) + decr, for all
        x, with certainty — and decr ≤ total/(k+1) always (worst case)."""
        return float(self.decr)

    def worst_case_bound(self) -> float:
        """The published a-priori form N/(k+1) (≤ ε·N at the default k)."""
        return float(self.total) / float(self.k + 1)

    def topk(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        """(ids, stored counts) of the k largest counters; ties break by id
        ascending (determinism, same convention as CM.topk)."""
        if len(self.ids) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        order = np.lexsort((self.ids, -self.counts))[: int(k)]
        return self.ids[order], self.counts[order]

    # --- merge -----------------------------------------------------------
    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.k != self.k:
            raise ValueError(f"Misra-Gries k mismatch: {self.k} vs {other.k}")
        self.total += other.total
        self._n_items += other._n_items
        self.decr += other.decr  # + the combine's own m, added inside
        self._combine(other.ids, other.counts)
        return self

    # --- serde -----------------------------------------------------------
    def _params(self) -> dict:
        return {"eps": self.eps, "k": self.k}

    def _body_bytes(self) -> bytes:
        return struct.pack("<QQQ", self._n_items, self.total, self.decr) + np_tobytes(
            self.ids, self.counts
        )

    @classmethod
    def _from_parts(cls, params: dict, body: memoryview) -> "MisraGries":
        obj = cls(eps=params["eps"], k=params["k"])
        obj._n_items, obj.total, obj.decr = struct.unpack_from("<QQQ", body, 0)
        obj.ids, obj.counts = np_frombytes(body[24:], [np.int64, np.int64])
        return obj
