"""MinHash signature sketch for Jaccard similarity / near-dup detection.

Algorithm: Broder, "On the resemblance and containment of documents"
(SEQUENCES 1997). r independent hash "permutations" (seeded splitmix64);
signature element i = min over the set's elements of hash_i. For two sets,
E[fraction of matching signature slots] = Jaccard(A, B); standard error of
the estimate is √(J(1−J)/r) ≤ 0.5/√r.

Two usage modes:
- ``MinHash`` sketch object: group-level signature, merged with element-wise
  min (commutative/associative/idempotent → byte-identical under
  regrouping). Answers "Jaccard similarity of token vocabularies between
  sources".
- ``minhash_matrix(hashes, r, seed)``: per-row signatures for document-level
  LSH dedup (used by the dedup operators in sketchlib.spark.dedup).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.hashing import splitmix64
from sketchlib.sketches.base import SketchBase, np_frombytes, np_tobytes, register

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _perm_consts(r: int, seed: int) -> np.ndarray:
    """r per-permutation xor constants from a seeded splitmix64 stream."""
    return splitmix64(np.arange(r, dtype=np.uint64) + np.uint64(seed * 0x9E3779B9))


def minhash_of_hashes(hashes: np.ndarray, r: int, seed: int) -> np.ndarray:
    """Signature (uint64[r]) of one set given its element base-hashes.

    MinHash is a function of the element SET, so duplicates are dropped
    before the (n × r) permutation expansion — on token streams this is the
    difference between O(tokens·r) and O(vocab·r) work per batch. The
    expansion is chunked to bound peak memory at ~32 MB.
    """
    if len(hashes) == 0:
        return np.full(r, _U64MAX, dtype=np.uint64)
    u = np.unique(hashes.astype(np.uint64))
    consts = _perm_consts(r, seed)
    sig = np.full(r, _U64MAX, dtype=np.uint64)
    step = max(1, (4 << 20) // r)  # ~4M cells per chunk
    for i in range(0, len(u), step):
        chunk = u[i : i + step]
        mixed = splitmix64((chunk[:, None] ^ consts[None, :]).ravel())
        np.minimum(sig, mixed.reshape(len(chunk), r).min(axis=0), out=sig)
    return sig


@register
class MinHash(SketchBase):
    kind = "minhash"

    def __init__(self, r: int = 128, seed: int = 17):
        self.r = int(r)
        self.seed = int(seed)
        self.sig = np.full(self.r, _U64MAX, dtype=np.uint64)
        self._n_items = 0

    def update_hashes(self, hashes: np.ndarray, n_seen: int | None = None) -> "MinHash":
        if len(hashes) == 0:
            return self
        self._n_items += len(hashes) if n_seen is None else int(n_seen)
        np.minimum(self.sig, minhash_of_hashes(np.asarray(hashes, np.uint64), self.r, self.seed), out=self.sig)
        return self

    def jaccard(self, other: "MinHash") -> tuple[float, float]:
        """(estimated Jaccard similarity, standard-error bound 0.5/√r)."""
        if (other.r, other.seed) != (self.r, self.seed):
            raise ValueError("MinHash r/seed mismatch")
        j = float(np.mean(self.sig == other.sig))
        return j, 0.5 / math.sqrt(self.r)

    def merge(self, other: "MinHash") -> "MinHash":
        if (other.r, other.seed) != (self.r, self.seed):
            raise ValueError("MinHash r/seed mismatch")
        np.minimum(self.sig, other.sig, out=self.sig)
        self._n_items += other._n_items
        return self

    # --- serde -----------------------------------------------------------
    def _params(self) -> dict:
        return {"r": self.r, "seed": self.seed}

    def _body_bytes(self) -> bytes:
        return struct.pack("<Q", self._n_items) + np_tobytes(self.sig)

    @classmethod
    def _from_parts(cls, params: dict, body: memoryview) -> "MinHash":
        obj = cls(r=params["r"], seed=params["seed"])
        (obj._n_items,) = struct.unpack_from("<Q", body, 0)
        (obj.sig,) = np_frombytes(body[8:], [np.uint64])
        return obj
