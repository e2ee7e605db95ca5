"""KMV (k minimum values / bottom-k) sketch.

Algorithm: Bar-Yossef, Jayram, Kumar, Sivakumar, Trevisan, "Counting
distinct elements in a data stream" (RANDOM 2002); estimator and merge
semantics per Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations" (SIGMOD 2007).

Keep the k smallest distinct 64-bit hashes seen. Then:

- distinct count: D̂ = (k−1) / h_(k) with h normalized to (0,1);
  RSE ≈ 1/√(k−2). Below k distinct values the sketch is EXACT.
- the kept hashes are a uniform sample of the DISTINCT value domain —
  the mergeable analog of Verdict's universe sample (SURVEY.md §1.1),
  usable for quotas/joins on sampled domains.

Merge = union then keep k smallest: bottom-k(A ∪ B) ==
bottom-k(bottom-k(A) ∪ bottom-k(B)) exactly, so merges are commutative,
associative, idempotent, and byte-identical under any regrouping.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.sketches.base import SketchBase, np_frombytes, np_tobytes, register

_MAX = float(2.0**64)


@register
class KMV(SketchBase):
    kind = "kmv"

    def __init__(self, k: int = 1024):
        if k < 8:
            raise ValueError("k must be ≥ 8")
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted ascending, unique, ≤ k
        self._n_items = 0

    def update_hashes(self, hashes: np.ndarray, n_seen: int | None = None) -> "KMV":
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return self
        self._n_items += int(n_seen) if n_seen is not None else len(h)
        # prune the batch before the union: anything ≥ current kth-smallest is dead
        if len(self.hashes) == self.k:
            h = h[h < self.hashes[-1]]
            if h.size == 0:
                return self
        merged = np.union1d(self.hashes, h)  # sorted unique
        self.hashes = merged[: self.k]
        return self

    def merge(self, other: "KMV") -> "KMV":
        if other.k != self.k:
            raise ValueError("KMV k mismatch")
        merged = np.union1d(self.hashes, other.hashes)
        self.hashes = merged[: self.k]
        self._n_items += other._n_items
        return self

    def estimate(self) -> tuple[float, float]:
        """(distinct estimate, relative standard error bound)."""
        n = len(self.hashes)
        if n < self.k:
            return float(n), 0.0  # saw fewer than k distinct hashes: exact
        kth = (float(self.hashes[-1]) + 1.0) / _MAX
        return (self.k - 1) / kth, 1.0 / math.sqrt(self.k - 2)

    def domain_sample(self) -> np.ndarray:
        """The kept hashes — a uniform sample of the distinct-value domain."""
        return self.hashes.copy()

    # --- serde -----------------------------------------------------------
    def _params(self) -> dict:
        return {"k": self.k}

    def _body_bytes(self) -> bytes:
        return struct.pack("<Q", self._n_items) + np_tobytes(self.hashes)

    @classmethod
    def _from_parts(cls, params: dict, body: memoryview) -> "KMV":
        obj = cls(k=int(params["k"]))
        (obj._n_items,) = struct.unpack_from("<Q", body, 0)
        (obj.hashes,) = np_frombytes(body[8:], [np.uint64])
        return obj
