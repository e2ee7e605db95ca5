"""DDSketch — relative-error quantiles (SURVEY.md §2B extension).

Algorithm: Masson, Rim, Lee, "DDSketch: A Fast and Fully-Mergeable Quantile
Sketch with Relative-Error Guarantees" (VLDB 2019). Values map to
logarithmic buckets i = ⌈log_γ(x)⌉ with γ = (1+α)/(1−α); answering a
quantile with the bucket midpoint 2γ^i/(γ+1) guarantees

    |x̂_q − x_q| ≤ α · |x_q|

— RELATIVE value error, the complement of KLL/t-digest's rank error: a
p99.9 of a heavy-tailed latency/length distribution answers within α of
the true VALUE no matter how stretched the tail is, where a rank-error
sketch's value error is unbounded across a wide bucket.

Why it completes the quantile family here: bucket counts merge by pure
addition, so the merge is not just commutative+associative but ORDER
INDEPENDENT — states are byte-identical under ANY partition regrouping
(KLL/t-digest need canonical input ordering for byte-equality; DDSketch
needs nothing). No RNG anywhere: determinism is structural.

Memory bound: the collapsing-lowest variant (paper §2.4) folds the
smallest-index buckets into one once a store exceeds ``max_bins``; the
α-guarantee then holds for every quantile that lands at or above the
collapsed bucket (the high quantiles one runs DDSketch for), and
``collapsed`` flags that it happened. Stores: positive and negative
values in mirrored log-bucket stores, exact zeros in a dedicated counter.
Non-finite values are dropped (NaN/±inf carry no quantile semantics),
matching KLL's NaN policy.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.sketches.base import SketchBase, np_frombytes, np_tobytes, register


def _merge_store(
    k1: np.ndarray, c1: np.ndarray, k2: np.ndarray, c2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Merge two (sorted keys, counts) stores: concatenate, sort, reduceat.
    Output keys are sorted ascending — the canonical form serde relies on."""
    if len(k1) == 0:
        return k2, c2
    if len(k2) == 0:
        return k1, c1
    keys = np.concatenate([k1, k2])
    cnts = np.concatenate([c1, c2])
    order = np.argsort(keys, kind="stable")
    keys, cnts = keys[order], cnts[order]
    starts = np.flatnonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))
    return keys[starts], np.add.reduceat(cnts, starts)


@register
class DDSketch(SketchBase):
    kind = "dd"

    def __init__(self, alpha: float = 0.01, max_bins: int = 2048):
        alpha = float(alpha)
        if not 0.0 < alpha < 1.0:
            raise ValueError(f"alpha must be in (0, 1), got {alpha}")
        if max_bins < 2:
            raise ValueError(f"max_bins must be >= 2, got {max_bins}")
        self.alpha = alpha
        self.max_bins = int(max_bins)
        self._log_gamma = math.log((1.0 + alpha) / (1.0 - alpha))
        self.pos_keys = np.empty(0, dtype=np.int64)
        self.pos_counts = np.empty(0, dtype=np.int64)
        self.neg_keys = np.empty(0, dtype=np.int64)
        self.neg_counts = np.empty(0, dtype=np.int64)
        self.n_zero = 0
        self.collapsed = False
        self._n_items = 0

    # --- update ------------------------------------------------------------
    def _bucketize(self, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(sorted unique bucket keys, counts) for strictly positive values."""
        keys = np.ceil(np.log(v) / self._log_gamma).astype(np.int64)
        uk, uc = np.unique(keys, return_counts=True)
        return uk, uc.astype(np.int64)

    def update_values(self, values: np.ndarray) -> "DDSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return self
        self._n_items += int(v.size)
        pos, neg = v[v > 0], -v[v < 0]
        self.n_zero += int(v.size - pos.size - neg.size)
        if pos.size:
            uk, uc = self._bucketize(pos)
            self.pos_keys, self.pos_counts = _merge_store(
                self.pos_keys, self.pos_counts, uk, uc
            )
        if neg.size:
            uk, uc = self._bucketize(neg)
            self.neg_keys, self.neg_counts = _merge_store(
                self.neg_keys, self.neg_counts, uk, uc
            )
        self._collapse()
        return self

    def _collapse(self) -> None:
        # collapsing-lowest (paper §2.4): fold the smallest-index buckets —
        # for the negative store "lowest" means LARGEST |x| bucket, i.e. the
        # most-negative values, keeping the guarantee tight near the top
        if len(self.pos_keys) > self.max_bins:
            cut = len(self.pos_keys) - self.max_bins
            folded = int(self.pos_counts[: cut + 1].sum())
            self.pos_keys = self.pos_keys[cut:]
            self.pos_counts = self.pos_counts[cut:].copy()
            self.pos_counts[0] = folded
            self.collapsed = True
        if len(self.neg_keys) > self.max_bins:
            keep = self.max_bins
            folded = int(self.neg_counts[keep - 1 :].sum())
            self.neg_keys = self.neg_keys[:keep]
            self.neg_counts = self.neg_counts[:keep].copy()
            self.neg_counts[-1] = folded
            self.collapsed = True

    # --- merge ---------------------------------------------------------------
    def merge(self, other: "DDSketch") -> "DDSketch":
        if (other.alpha, other.max_bins) != (self.alpha, self.max_bins):
            raise ValueError("DDSketch alpha/max_bins mismatch")
        self.pos_keys, self.pos_counts = _merge_store(
            self.pos_keys, self.pos_counts, other.pos_keys, other.pos_counts
        )
        self.neg_keys, self.neg_counts = _merge_store(
            self.neg_keys, self.neg_counts, other.neg_keys, other.neg_counts
        )
        self.n_zero += other.n_zero
        self.collapsed = self.collapsed or other.collapsed
        self._n_items += other._n_items
        self._collapse()
        return self

    # --- query -----------------------------------------------------------------
    def _mid(self, keys: np.ndarray) -> np.ndarray:
        # bucket (γ^(k-1), γ^k] answered at 2γ^k/(γ+1), the α-relative midpoint
        gamma = (1.0 + self.alpha) / (1.0 - self.alpha)
        return 2.0 * np.exp(keys * self._log_gamma) / (gamma + 1.0)

    def _ordered(self) -> tuple[np.ndarray, np.ndarray]:
        """(values ascending, counts) across neg | zero | pos stores."""
        vals = [
            -self._mid(self.neg_keys[::-1]),
            np.zeros(1 if self.n_zero else 0),
            self._mid(self.pos_keys),
        ]
        cnts = [
            self.neg_counts[::-1].astype(np.float64),
            np.full(1 if self.n_zero else 0, float(self.n_zero)),
            self.pos_counts.astype(np.float64),
        ]
        return np.concatenate(vals), np.concatenate(cnts)

    def quantiles(self, qs) -> np.ndarray:
        """Values at normalized ranks qs — rank convention ⌊q·(n−1)⌋ + 1
        (1-based), the paper's x_q; each answer is within α·|x_q| of the
        true order statistic (collapsed low buckets excepted)."""
        qarr = np.clip(np.atleast_1d(np.asarray(qs, dtype=np.float64)), 0.0, 1.0)
        if self._n_items == 0:
            return np.full(qarr.shape, np.nan)
        v, c = self._ordered()
        cum = np.cumsum(c)
        n = cum[-1]
        targets = np.floor(qarr * (n - 1)) + 1.0
        idx = np.clip(np.searchsorted(cum, targets, side="left"), 0, len(v) - 1)
        return v[idx]

    def rank(self, x) -> np.ndarray:
        """Normalized rank(s): fraction of items in buckets ≤ x's bucket."""
        xarr = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self._n_items == 0:
            return np.full(xarr.shape, np.nan)
        v, c = self._ordered()
        cum = np.cumsum(c)
        idx = np.searchsorted(v, xarr, side="right")
        out = np.where(idx > 0, cum[np.clip(idx - 1, 0, len(v) - 1)], 0.0)
        return out / cum[-1]

    def error_bound(self) -> float:
        """α — RELATIVE VALUE error: |x̂_q − x_q| ≤ α·|x_q| (vs KLL's
        rank-error bound; callers surfacing bounds must label the unit)."""
        return self.alpha

    def estimate(self) -> tuple[float, float]:
        """(median, α·|median|) — protocol-compatible (value, bound) pair."""
        med = float(self.quantiles([0.5])[0])
        return med, self.alpha * abs(med)

    # --- serde -------------------------------------------------------------
    def _params(self) -> dict:
        return {"alpha": self.alpha, "max_bins": self.max_bins}

    def _body_bytes(self) -> bytes:
        head = struct.pack("<qqB", self.n_zero, self._n_items, int(self.collapsed))
        return head + np_tobytes(
            self.pos_keys, self.pos_counts, self.neg_keys, self.neg_counts
        )

    @classmethod
    def _from_parts(cls, params: dict, body: memoryview) -> "DDSketch":
        sk = cls(alpha=params["alpha"], max_bins=params["max_bins"])
        sk.n_zero, sk._n_items, collapsed = struct.unpack_from("<qqB", body, 0)
        sk.collapsed = bool(collapsed)
        arrays = np_frombytes(body[17:], [np.int64, np.int64, np.int64, np.int64])
        sk.pos_keys, sk.pos_counts, sk.neg_keys, sk.neg_counts = arrays
        return sk
