"""HyperLogLog with sparse + dense register representations (SURVEY.md B1/B2).

Algorithm: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (AofA 2007); sparse-to-dense
promotion per Heule, Nunkesser, Hall, "HyperLogLog in Practice" (EDBT 2013);
estimator per Ertl, "New cardinality estimation algorithms for HyperLogLog
sketches" (arXiv:1702.01284) Algorithm 6 — the improved raw estimator, which
is bias-free over the full cardinality range with no empirical correction
tables and no small/large-range case switches (the classic FFGM estimator has
a bias hump right at the 2.5m linear-counting handoff, observed empirically
here before switching).

Published bound (BASELINE.md): relative standard error ≈ 1.04/√m, m = 2^p.

Representation:
- sparse: sorted unique uint32 array of packed ``(idx << 8) | rho`` with one
  entry per register index (max rho kept); auto-promotes to dense above m/4
  entries (at p=14 the sparse cap is 16 KiB vs the 16 KiB dense array — the
  win is for short partitions/groups, which dominate at 10^12-sequence scale
  with many (group × partition) partial states).
- dense: uint8[m] register array.

Updates, merges and the estimator are pure numpy. Merge is commutative,
associative and idempotent (register-wise max), so estimates are invariant
under arbitrary partition regroupings — the property tests assert
byte-identical serialized states.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.hashing import bit_length_u64
from sketchlib.sketches.base import SketchBase, np_frombytes, np_tobytes, register

_U = np.uint64


_ALPHA_INF = 1.0 / (2.0 * math.log(2.0))


def _sigma(x: float) -> float:
    """Ertl σ(x) = x + Σ_{k≥1} x^(2^k)·2^(k−1); σ(1) = +inf (all registers 0)."""
    if x == 1.0:
        return math.inf
    y, z = 1.0, x
    while True:
        x = x * x
        z_prev = z
        z += x * y
        y += y
        if z == z_prev:
            return z


def _tau(x: float) -> float:
    """Ertl τ(x); τ(0) = τ(1) = 0 (saturated-register correction)."""
    if x == 0.0 or x == 1.0:
        return 0.0
    y, z = 1.0, 1.0 - x
    while True:
        x = math.sqrt(x)
        z_prev = z
        y *= 0.5
        z -= (1.0 - x) ** 2 * y
        if z == z_prev:
            return z / 3.0


def _packed_from_hashes(hashes: np.ndarray, p: int) -> np.ndarray:
    """hashes (uint64) -> sorted unique packed (idx << 8) | rho, max-rho per idx."""
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> _U(64 - p)).astype(np.uint32)
    w = h << _U(p)  # remaining 64-p bits, left-aligned
    # rho = leading zeros within the remaining bits + 1; w == 0 -> 64 - p + 1
    rho = (_U(64) - bit_length_u64(w)).astype(np.uint8) + np.uint8(1)
    rho[w == 0] = np.uint8(64 - p + 1)
    packed = (idx.astype(np.uint32) << np.uint32(8)) | rho.astype(np.uint32)
    packed.sort(kind="stable")
    # keep the LAST entry per idx group == max rho (sorted ascending)
    ids = packed >> np.uint32(8)
    keep = np.empty(len(packed), dtype=bool)
    if len(packed):
        keep[:-1] = ids[1:] != ids[:-1]
        keep[-1] = True
    return packed[keep]


@register
class HLL(SketchBase):
    kind = "hll"

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self._sparse_cap = self.m // 4
        self.dense: np.ndarray | None = None  # uint8[m]
        self.sparse: np.ndarray = np.empty(0, dtype=np.uint32)  # packed, sorted
        self._n_items = 0

    # --- update ----------------------------------------------------------
    def update_hashes(self, hashes: np.ndarray, n_seen: int | None = None) -> "HLL":
        """Vectorized update from precomputed uint64 hashes.

        ``n_seen``: raw item count for metadata when ``hashes`` was already
        deduplicated upstream (HLL is set-semantics, so feeding unique values
        yields identical registers).
        """
        if len(hashes) == 0:
            return self
        self._n_items += len(hashes) if n_seen is None else int(n_seen)
        packed = _packed_from_hashes(hashes, self.p)
        if self.dense is not None:
            self._dense_absorb(packed)
        else:
            self._sparse_absorb(packed)
        return self

    def _dense_absorb(self, packed: np.ndarray) -> None:
        idx = packed >> np.uint32(8)
        rho = (packed & np.uint32(0xFF)).astype(np.uint8)
        regs = self.dense
        cur = regs[idx]
        upd = rho > cur
        regs[idx[upd]] = rho[upd]

    def _sparse_absorb(self, packed: np.ndarray) -> None:
        merged = _merge_packed(self.sparse, packed)
        if len(merged) > self._sparse_cap:
            self._promote()
            self._dense_absorb(merged)
        else:
            self.sparse = merged

    def _promote(self) -> None:
        regs = np.zeros(self.m, dtype=np.uint8)
        if len(self.sparse):
            regs[self.sparse >> np.uint32(8)] = (self.sparse & np.uint32(0xFF)).astype(np.uint8)
        self.dense = regs
        self.sparse = np.empty(0, dtype=np.uint32)

    # --- merge -----------------------------------------------------------
    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError(f"HLL precision mismatch: {self.p} vs {other.p}")
        self._n_items += other._n_items
        if self.dense is None and other.dense is None:
            merged = _merge_packed(self.sparse, other.sparse)
            if len(merged) > self._sparse_cap:
                self._promote()
                self._dense_absorb(merged)
            else:
                self.sparse = merged
        else:
            if self.dense is None:
                self._promote()
            if other.dense is not None:
                np.maximum(self.dense, other.dense, out=self.dense)
            elif len(other.sparse):
                self._dense_absorb(other.sparse)
        return self

    # --- estimate ----------------------------------------------------------
    def estimate(self) -> tuple[float, float]:
        """Returns (cardinality estimate, relative standard error bound).

        Ertl improved raw estimator: E = α∞·m² / (m·σ(C₀/m) + Σ_{k=1..q}
        C_k·2^(−k) + m·τ(1−C_{q+1}/m)·2^(−q)), from the register-value
        histogram C — bias-free, no range-case switches.
        """
        m = self.m
        q = 64 - self.p  # register values range over [0, q+1]
        rse = 1.04 / math.sqrt(m)
        if self.dense is None:
            rhos = (self.sparse & np.uint32(0xFF)).astype(np.int64)
            counts = np.bincount(rhos, minlength=q + 2)
            counts[0] = m - len(self.sparse)
        else:
            counts = np.bincount(self.dense.astype(np.int64), minlength=q + 2)
        z = m * _tau(1.0 - counts[q + 1] / m)
        for k in range(q, 0, -1):
            z = 0.5 * (z + counts[k])
        z += m * _sigma(counts[0] / m)
        return _ALPHA_INF * m * m / z, rse

    # --- serde -----------------------------------------------------------
    def _params(self) -> dict:
        return {"p": self.p}

    def _body_bytes(self) -> bytes:
        if self.dense is not None:
            return struct.pack("<BQ", 1, self._n_items) + np_tobytes(self.dense)
        return struct.pack("<BQ", 0, self._n_items) + np_tobytes(self.sparse)

    @classmethod
    def _from_parts(cls, params: dict, body: memoryview) -> "HLL":
        obj = cls(p=int(params["p"]))
        is_dense, n_items = struct.unpack_from("<BQ", body, 0)
        obj._n_items = n_items
        rest = body[9:]
        if is_dense:
            (obj.dense,) = np_frombytes(rest, [np.uint8])
        else:
            (obj.sparse,) = np_frombytes(rest, [np.uint32])
        return obj


def _merge_packed(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Merge two sorted packed (idx<<8|rho) arrays keeping max rho per idx."""
    if len(a) == 0:
        return b.copy()
    if len(b) == 0:
        return a
    both = np.concatenate([a, b])
    both.sort(kind="stable")
    ids = both >> np.uint32(8)
    keep = np.empty(len(both), dtype=bool)
    keep[:-1] = ids[1:] != ids[:-1]
    keep[-1] = True
    return both[keep]
