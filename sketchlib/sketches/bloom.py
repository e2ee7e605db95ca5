"""Bloom filter (SURVEY.md B7/B8) for token-membership partition pruning.

Algorithm: Bloom, "Space/Time Trade-offs in Hash Coding with Allowable
Errors" (CACM 1970); double hashing h_i = h1 + i*h2 per Kirsch & Mitzenmacher,
"Less Hashing, Same Performance" (ESA 2006).

Published bound (BASELINE.md): FPR ≈ (1 − e^{−hn/m})^h at n inserted keys;
false negatives are impossible (the pruning use in B8 relies on this).

Sizing: ``Bloom.for_capacity(n, fpr)`` gives optimal m = −n·ln(fpr)/ln(2)²
bits and h = (m/n)·ln(2) hashes.

Update/membership are vectorized (bit array as uint8[m/8], ``np.bitwise_or.at``
over pre-uniqued keys); merge = bitwise OR (commutative, associative,
idempotent → byte-identical under regroupings).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.hashing import hash_ints
from sketchlib.sketches.base import SketchBase, np_frombytes, np_tobytes, register

_U = np.uint64


@register
class Bloom(SketchBase):
    kind = "bloom"

    def __init__(self, m_bits: int = 1 << 20, h: int = 7, seed: int = 11):
        if m_bits % 8:
            m_bits += 8 - m_bits % 8
        self.m_bits = int(m_bits)
        self.h = int(h)
        self.seed = int(seed)
        self.bits = np.zeros(self.m_bits // 8, dtype=np.uint8)
        self._n_items = 0

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01, seed: int = 11) -> "Bloom":
        n = max(n, 1)
        m = int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2)))
        h = max(1, round((m / n) * math.log(2)))
        return cls(m_bits=m, h=h, seed=seed)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), h) bit positions via double hashing."""
        u = np.asarray(keys)
        h1 = hash_ints(u, self.seed)
        h2 = hash_ints(u, self.seed + 1) | _U(1)  # odd -> full-cycle stride
        i = np.arange(self.h, dtype=np.uint64)
        mixed = h1[:, None] + i[None, :] * h2[:, None]
        if self.m_bits & (self.m_bits - 1) == 0:
            return mixed & _U(self.m_bits - 1)  # power-of-two: mask, not div
        return mixed % _U(self.m_bits)

    def add(self, keys: np.ndarray, n_seen: int | None = None) -> "Bloom":
        """Insert keys. ``_n_items`` counts RAW items seen (pass ``n_seen``
        when keys were pre-deduplicated upstream): a batching-independent
        quantity, so states are byte-identical no matter how the stream was
        chunked; fpr_bound() then overestimates n (conservative, safe).
        ``n_seen`` also asserts the keys arrive pre-deduplicated, so the
        defensive unique (a sort) is skipped — duplicate positions would
        only re-set the same bits, so dedup affects speed, never state."""
        u = np.asarray(keys)
        if n_seen is None:
            u = np.unique(u)
        if u.size == 0:
            return self
        self._n_items += int(n_seen) if n_seen is not None else int(len(keys))
        pos = self._positions(u).ravel()
        byte = (pos >> _U(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & _U(7)).astype(np.uint8))
        np.bitwise_or.at(self.bits, byte, bit)
        return self

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: True may be a false positive, False is exact."""
        u = np.asarray(keys)
        if u.size == 0:
            return np.empty(0, dtype=bool)
        pos = self._positions(u)
        byte = (pos >> _U(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & _U(7)).astype(np.uint8))
        return ((self.bits[byte] & bit) != 0).all(axis=1)

    def fpr_bound(self) -> float:
        """Design FPR at the current insert count (n = raw items seen, an
        upper bound on distinct inserts → bound is conservative)."""
        if self._n_items == 0:
            return 0.0
        return (1.0 - math.exp(-self.h * self._n_items / self.m_bits)) ** self.h

    def merge(self, other: "Bloom") -> "Bloom":
        if (other.m_bits, other.h, other.seed) != (self.m_bits, self.h, self.seed):
            raise ValueError("Bloom geometry/seed mismatch")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self._n_items += other._n_items  # raw items seen (≥ distinct inserts)
        return self

    # --- serde -----------------------------------------------------------
    def _params(self) -> dict:
        return {"m_bits": self.m_bits, "h": self.h, "seed": self.seed}

    def _body_bytes(self) -> bytes:
        return struct.pack("<Q", self._n_items) + np_tobytes(self.bits)

    @classmethod
    def _from_parts(cls, params: dict, body: memoryview) -> "Bloom":
        obj = cls(m_bits=params["m_bits"], h=params["h"], seed=params["seed"])
        (obj._n_items,) = struct.unpack_from("<Q", body, 0)
        (obj.bits,) = np_frombytes(body[8:], [np.uint8])
        return obj
