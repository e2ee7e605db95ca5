"""Example user-defined sketch kinds for ``register_sketch_kind``.

The UDAF surface's extension point (SURVEY.md A19): a sketch only has to
follow the SketchBase protocol (serde hooks + commutative/associative
``merge``) to build through the zero-shuffle kernel, merge through the
KB-state semilattice, and answer through ``estimates_df`` — nothing in
the engine enumerates kinds.

``MinMaxSketch`` here is deliberately minimal (an exact, O(1)-state
range sketch) so the protocol obligations are readable; registration at
import time also makes the module executor-importable, which is the
recommended deployment shape for plugins (ship the module via
``--py-files``; kernels additionally carry a registry snapshot, so even
driver-only definitions work — tested).
"""

from __future__ import annotations

import struct

import numpy as np

from sketchlib.sketches.base import SketchBase
from sketchlib.spark.build import register_sketch_kind


class MinMaxSketch(SketchBase):
    """Exact (min, max) of a numeric column — estimate() = (range, 0.0)."""

    kind = "minmax"

    def __init__(self):
        self.lo = float("inf")
        self.hi = float("-inf")
        self._n_items = 0

    def update_values(self, vals):
        v = np.asarray(vals, dtype=np.float64)
        if len(v):
            self.lo = min(self.lo, float(v.min()))
            self.hi = max(self.hi, float(v.max()))
            self._n_items += int(len(v))

    def merge(self, other: "MinMaxSketch") -> "MinMaxSketch":
        self.lo = min(self.lo, other.lo)
        self.hi = max(self.hi, other.hi)
        self._n_items += other._n_items
        return self

    def estimate(self):
        if not self._n_items:
            return (0.0, 0.0)
        return (self.hi - self.lo, 0.0)  # exact: zero error bound

    # --- serde hooks (SketchBase) ----------------------------------------
    def _params(self) -> dict:
        return {}

    def _body_bytes(self) -> bytes:
        return struct.pack("<ddq", self.lo, self.hi, self._n_items)

    @classmethod
    def _from_parts(cls, params: dict, body: memoryview) -> "MinMaxSketch":
        sk = cls()
        sk.lo, sk.hi, sk._n_items = struct.unpack_from("<ddq", body)
        return sk


register_sketch_kind(MinMaxSketch, update_style="values")
