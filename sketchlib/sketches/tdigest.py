"""t-digest quantile sketch, merging variant (SURVEY.md B5).

Algorithm: Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
t-Digests" (arXiv:1902.04023), k_1 scale function
k_1(q) = (δ/2π)·asin(2q−1), which bounds each cluster's k-size to ≤ 1 and
makes tail clusters tiny (hence tail accuracy).

Vectorization note (SURVEY.md §7 hard-parts): instead of the paper's greedy
sequential merge loop (per-centroid Python — the slow path), compression
assigns each sorted point to the unit bin ⌊k_1(q_mid)⌋ and reduces each bin
with weighted ``np.bincount``. Every bin spans ≤ 1 k-unit, so the resulting
clusters satisfy the same size invariant the greedy loop enforces (possibly
producing a few more centroids: ≤ δ/2 + 2 total). Entirely numpy, O(n log n).

Accuracy target (BASELINE.md): no closed-form bound exists for t-digest; the
library reports the KLL-style proxy 3.31/δ as ``error_bound()`` and tests
assert observed rank error ≤ that proxy (it is loose for t-digest mid-range
and very loose at tails).

Merge = concatenate centroid sets + recompress after a canonical
(mean, weight) sort; commutative, associative within quantile bound (exact
byte-identity under regrouping is NOT claimed — see FIXTURES.md F2).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.sketches.base import SketchBase, np_frombytes, np_tobytes, register


def _k1_bins(weights_sorted: np.ndarray, delta: float) -> np.ndarray:
    """Unit-bin ids for sorted points: ⌊k1(q_mid)⌋ per point."""
    w = weights_sorted
    cum = np.cumsum(w)
    total = cum[-1]
    qmid = (cum - w / 2.0) / total
    kv = (delta / (2.0 * math.pi)) * np.arcsin(np.clip(2.0 * qmid - 1.0, -1.0, 1.0))
    return np.floor(kv).astype(np.int64)


@register
class TDigest(SketchBase):
    kind = "tdigest"

    def __init__(self, compression: float = 200.0):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.vmin = math.inf
        self.vmax = -math.inf
        self._buf: list[np.ndarray] = []  # raw value buffers awaiting compression
        self._buf_n = 0
        self._n_items = 0

    # --- update ------------------------------------------------------------
    def update_values(self, values: np.ndarray, weights: np.ndarray | None = None) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        if weights is None:
            v = v[~np.isnan(v)]
            if v.size == 0:
                return self
            self._n_items += int(v.size)
            self.vmin = min(self.vmin, float(v.min()))
            self.vmax = max(self.vmax, float(v.max()))
            self._buf.append(v)
            self._buf_n += v.size
            if self._buf_n > 10 * self.compression:
                self._flush()
            return self
        # weighted feed: filter values and weights JOINTLY (a value-only
        # NaN filter would silently misalign the two arrays), refuse
        # negative weights, drop zero-weight rows (no information)
        w = np.asarray(weights, dtype=np.float64)
        if w.shape != v.shape:
            raise ValueError(
                f"t-digest weighted update: values {v.shape} and weights "
                f"{w.shape} must align"
            )
        keep = ~(np.isnan(v) | np.isnan(w))
        v, w = v[keep], w[keep]
        if v.size and float(w.min()) < 0.0:
            raise ValueError("t-digest weights must be non-negative")
        if v.size and np.isinf(w).any():
            # a single +inf weight makes the total mass infinite and every
            # served quantile garbage — corrupt input, raise (NaN = missing
            # data and is dropped; inf = a computed-column bug upstream)
            raise ValueError("t-digest weights must be finite")
        pos = w > 0
        v, w = v[pos], w[pos]
        if v.size == 0:
            return self
        self._n_items += int(v.size)
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._flush()
        self._absorb(v, w)
        return self

    def _flush(self) -> None:
        if self._buf:
            v = np.concatenate(self._buf)
            self._buf, self._buf_n = [], 0
            self._absorb(v, np.ones(len(v)))

    def _absorb(self, means: np.ndarray, weights: np.ndarray) -> None:
        m = np.concatenate([self.means, means])
        w = np.concatenate([self.weights, weights])
        if len(m) == 0:
            return
        # canonical order: (mean, weight) lexsort for run-to-run determinism
        order = np.lexsort((w, m))
        m, w = m[order], w[order]
        bins = _k1_bins(w, self.compression)
        uniq, inv = np.unique(bins, return_inverse=True)
        wsum = np.bincount(inv, weights=w, minlength=len(uniq))
        msum = np.bincount(inv, weights=w * m, minlength=len(uniq))
        self.means = msum / wsum
        self.weights = wsum

    # --- merge ---------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if other.compression != self.compression:
            raise ValueError("TDigest compression mismatch")
        self._flush()
        other._flush()
        self._n_items += other._n_items
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._absorb(other.means, other.weights)
        return self

    # --- query -----------------------------------------------------------------
    def quantiles(self, qs) -> np.ndarray:
        """Interpolated quantile values at normalized ranks qs (vectorized)."""
        self._flush()
        if len(self.means) == 0:
            return np.full(len(np.atleast_1d(qs)), np.nan)
        w = self.weights
        total = w.sum()
        # centroid "centers" in cumulative-weight space
        cum = np.cumsum(w) - w / 2.0
        xp = np.concatenate([[0.0], cum, [total]])
        fp = np.concatenate([[self.vmin], self.means, [self.vmax]])
        targets = np.clip(np.asarray(qs, dtype=np.float64), 0.0, 1.0) * total
        return np.interp(targets, xp, fp)

    def rank(self, x) -> np.ndarray:
        """Approximate normalized rank(s) of value(s) x."""
        self._flush()
        if len(self.means) == 0:
            return np.full(len(np.atleast_1d(x)), np.nan)
        w = self.weights
        total = w.sum()
        cum = np.cumsum(w) - w / 2.0
        xp = np.concatenate([[self.vmin], self.means, [self.vmax]])
        fp = np.concatenate([[0.0], cum, [total]])
        return np.interp(np.atleast_1d(x), xp, fp) / total

    def error_bound(self) -> float:
        """Rank-error proxy (BASELINE.md): KLL-style 3.31/δ, loose for t-digest."""
        return 3.31 / self.compression

    # --- serde -------------------------------------------------------------------
    def _params(self) -> dict:
        return {"compression": self.compression}

    def _body_bytes(self) -> bytes:
        self._flush()
        head = struct.pack(
            "<Qdd", self._n_items,
            self.vmin if self._n_items else math.nan,
            self.vmax if self._n_items else math.nan,
        )
        return head + np_tobytes(self.means, self.weights)

    @classmethod
    def _from_parts(cls, params: dict, body: memoryview) -> "TDigest":
        obj = cls(compression=params["compression"])
        obj._n_items, vmin, vmax = struct.unpack_from("<Qdd", body, 0)
        obj.vmin = vmin if not math.isnan(vmin) else math.inf
        obj.vmax = vmax if not math.isnan(vmax) else -math.inf
        obj.means, obj.weights = np_frombytes(body[24:], [np.float64, np.float64])
        return obj
