"""KLL quantile sketch (SURVEY.md B6).

Algorithm: Karnin, Lang, Liberty, "Optimal Quantile Approximation in Streams"
(FOCS 2016): a stack of compactors with geometrically decaying capacities
c_l = ⌈k·(2/3)^(H−1−l)⌉; a full compactor sorts its buffer and promotes every
other element (random offset) to the level above, doubling item weight.

Published bound (BASELINE.md): normalized rank error ε = O(1/k)·√log(1/δ̄);
we report the practical calibration ε(k) ≈ 3.31/k (≈1.65% at the default
k = 200 at 99% confidence, matching the figures published for Apache
DataSketches' KLL — used as the assert threshold, not as the implementation).

Determinism (SURVEY.md §7 hard-part 1): the compaction offset bit comes from
a counter-indexed splitmix64 stream seeded by the sketch's ``seed`` param —
never from global RNG or wall clock — so a fixed update/merge order
reproduces byte-identical states.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.hashing import splitmix64
from sketchlib.sketches.base import SketchBase, np_frombytes, np_tobytes, register


@register
class KLL(SketchBase):
    kind = "kll"

    def __init__(self, k: int = 200, seed: int = 13):
        self.k = int(k)
        self.seed = int(seed)
        self.compactors: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._compactions = 0
        self._n_items = 0

    # --- geometry ----------------------------------------------------------
    def _capacity(self, level: int) -> int:
        height = len(self.compactors)
        return max(2, int(math.ceil(self.k * (2.0 / 3.0) ** (height - 1 - level))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(l) for l in range(len(self.compactors)))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    # --- update ------------------------------------------------------------
    def update_values(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self._n_items += int(v.size)
        self.compactors[0] = np.concatenate([self.compactors[0], v])
        self._compress()
        return self

    def _offset_bit(self, level: int) -> int:
        x = np.array([(self.seed << 20) ^ (level << 40) ^ self._compactions], dtype=np.uint64)
        return int(splitmix64(x)[0] & np.uint64(1))

    def _compress(self) -> None:
        while self._size() > self._total_capacity():
            for level in range(len(self.compactors)):
                if len(self.compactors[level]) >= self._capacity(level):
                    self._compact(level)
                    break
            else:  # nothing individually full but total over: compact largest
                level = max(range(len(self.compactors)), key=lambda l: len(self.compactors[l]))
                self._compact(level)

    def _compact(self, level: int) -> None:
        buf = np.sort(self.compactors[level], kind="stable")
        keep = np.empty(0, dtype=np.float64)
        if len(buf) % 2 == 1:  # unpaired element stays at this level
            keep, buf = buf[:1], buf[1:]
        offset = self._offset_bit(level)
        self._compactions += 1
        promoted = buf[offset::2]
        self.compactors[level] = keep
        if level + 1 == len(self.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        self.compactors[level + 1] = np.concatenate([self.compactors[level + 1], promoted])

    # --- merge ---------------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k or other.seed != self.seed:
            raise ValueError("KLL k/seed mismatch")
        for level in range(len(other.compactors)):
            while level >= len(self.compactors):
                self.compactors.append(np.empty(0, dtype=np.float64))
            self.compactors[level] = np.concatenate([self.compactors[level], other.compactors[level]])
        self._n_items += other._n_items
        self._compactions = max(self._compactions, other._compactions)
        self._compress()
        return self

    # --- query -----------------------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for level, c in enumerate(self.compactors):
            if len(c):
                vals.append(c)
                wts.append(np.full(len(c), 1 << level, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantiles(self, qs) -> np.ndarray:
        """Vectorized quantile query (values at normalized ranks qs)."""
        v, w = self._weighted()
        if len(v) == 0:
            return np.full(len(np.atleast_1d(qs)), np.nan)
        cum = np.cumsum(w)
        total = cum[-1]
        targets = np.clip(np.asarray(qs, dtype=np.float64), 0.0, 1.0) * total
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.clip(idx, 0, len(v) - 1)
        return v[idx]

    def rank(self, x) -> np.ndarray:
        """Normalized rank(s) of value(s) x — fraction of items ≤ x."""
        v, w = self._weighted()
        if len(v) == 0:
            return np.full(len(np.atleast_1d(x)), np.nan)
        cum = np.concatenate([[0.0], np.cumsum(w)])
        idx = np.searchsorted(v, np.atleast_1d(x), side="right")
        return cum[idx] / cum[-1]

    def error_bound(self) -> float:
        """Normalized rank-error bound (99% conf calibration, see module doc)."""
        return 3.31 / self.k

    # --- serde -------------------------------------------------------------------
    def _params(self) -> dict:
        return {"k": self.k, "seed": self.seed}

    def _body_bytes(self) -> bytes:
        head = struct.pack("<QQH", self._n_items, self._compactions, len(self.compactors))
        return head + np_tobytes(*self.compactors)

    @classmethod
    def _from_parts(cls, params: dict, body: memoryview) -> "KLL":
        obj = cls(k=int(params["k"]), seed=int(params["seed"]))
        obj._n_items, obj._compactions, h = struct.unpack_from("<QQH", body, 0)
        obj.compactors = np_frombytes(body[18:], [np.float64] * h)
        return obj
