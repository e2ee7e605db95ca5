"""Vectorized 64-bit hashing used by every sketch.

Design (SURVEY.md §2B): all kernels are numpy-only — no per-row Python.
Integers go through splitmix64 (Steele, Lea & Flood, "Fast Splittable
Pseudorandom Number Generators", OOPSLA 2014 — public finalizer constants);
strings/bytes go through pandas' C-level siphash (``pd.util.hash_array``)
then a splitmix64 finalize so seeds compose the same way for both dtypes.

Determinism contract: hashes depend only on (value, seed) — never on
wall-clock, process, partition order, or PYTHONHASHSEED — so sketch states
are reproducible across runs and mergeable across arbitrary regroupings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_U = np.uint64
_C1 = _U(0x9E3779B97F4A7C15)
_C2 = _U(0xBF58476D1CE4E5B9)
_C3 = _U(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    x = x.astype(np.uint64, copy=True)
    x += _C1
    x ^= x >> _U(30)
    x *= _C2
    x ^= x >> _U(27)
    x *= _C3
    x ^= x >> _U(31)
    return x


def _seed_mix(seed: int) -> np.uint64:
    return splitmix64(np.array([seed], dtype=np.uint64))[0]


def hash_ints(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash an integer array (any int dtype) to uint64."""
    v = np.asarray(values).astype(np.uint64, copy=False)
    return splitmix64(v ^ _seed_mix(seed))


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Hash a string/object array to uint64 via pandas' C siphash.

    ``pd.util.hash_array`` with the fixed default hash_key is deterministic
    across processes and pandas versions we pin here.
    """
    arr = np.asarray(values, dtype=object)
    h = pd.util.hash_array(arr, categorize=False).astype(np.uint64)
    return splitmix64(h ^ _seed_mix(seed))


def hash_any(values, seed: int = 0) -> np.ndarray:
    """Dispatch on dtype: ints stay numpy-native, everything else via siphash."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return hash_ints(arr, seed)
    if arr.dtype.kind == "f":
        # canonicalize floats bit-wise (normalize -0.0 and NaN payloads)
        f = arr.astype(np.float64, copy=True)
        f[f == 0.0] = 0.0
        f[np.isnan(f)] = np.nan
        return hash_ints(f.view(np.uint64), seed)
    return hash_strings(arr, seed)


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of a uint64 array (0 for 0).

    float log2 is unsafe above 2^53 (mantissa truncation), so use a 6-step
    binary search entirely in integer ops.
    """
    x = x.astype(np.uint64, copy=True)
    n = np.zeros(x.shape, dtype=np.uint8)
    for shift in (32, 16, 8, 4, 2, 1):
        s = _U(shift)
        mask = x >= (_U(1) << s)
        n[mask] += shift
        x[mask] >>= s
    n += (x == 1).astype(np.uint8)
    return n
