"""Deterministic synthetic `sequences` table generator (FIXTURES.md F1).

Schema (BASELINE.json input_hint): doc_id:string, tokens:array<int32>,
n_tok:int32, source:string.

Determinism: counter-based — every random draw is a pure function of
(seed, row index i, position j) through splitmix64, so ANY single row can be
regenerated in isolation (the per-row token-array-equality invariant) and
generation is fully vectorized with no stateful RNG. No wall-clock anywhere.

Distributions:
- n_tok  ~ round(lognormal(μ=ln 512, σ=0.6)) clipped to [1, 8192]
  (Box–Muller from two counter-derived uniforms — long right tail so p99
  quantile tests are non-trivial)
- tokens ~ Zipf(s=1.1) over vocab V=50_000 via inverse-CDF lookup
- source ~ categorical {web:0.80, books:0.10, code:0.05, wiki:0.04,
  forums:0.01} — deliberately skewed so salting/skew handling is load-bearing

Output: hive-partitioned parquet `out_dir/source=<v>/part-cXXXX.parquet`,
chunked so the hot partition (web) gets many files (regroup/resume tests need
real partitions).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sketchlib.hashing import splitmix64

VOCAB = 50_000
ZIPF_S = 1.1
SOURCES = ("web", "books", "code", "wiki", "forums")
SOURCE_P = (0.80, 0.10, 0.05, 0.04, 0.01)
_MU = float(np.log(512.0))
_SIGMA = 0.6
_MAX_NTOK = 8192
_POS_STRIDE = np.uint64(1 << 20)  # > max n_tok, so (i, j) keys never collide

_INV_U64 = 1.0 / 2.0**64


def _u01(keys: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """Uniform(0,1) from counter keys, pure function of (seed, stream, key)."""
    s = splitmix64(np.array([seed], dtype=np.uint64))[0] ^ np.uint64(stream)
    return (splitmix64(keys.astype(np.uint64) ^ s).astype(np.float64) + 0.5) * _INV_U64


def _zipf_cdf() -> np.ndarray:
    p = np.arange(1, VOCAB + 1, dtype=np.float64) ** (-ZIPF_S)
    return np.cumsum(p) / p.sum()


def gen_chunk(start: int, n: int, seed: int = 42, zipf_cdf: np.ndarray | None = None):
    """Rows [start, start+n) as numpy columns (doc_id, tokens_flat, offsets, n_tok, source)."""
    if zipf_cdf is None:
        zipf_cdf = _zipf_cdf()
    i = np.arange(start, start + n, dtype=np.uint64)

    # n_tok via Box–Muller on two counter uniforms
    u1 = _u01(i, seed, 1)
    u2 = _u01(i, seed, 2)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    n_tok = np.clip(np.round(np.exp(_MU + _SIGMA * z)), 1, _MAX_NTOK).astype(np.int32)

    # source categorical
    us = _u01(i, seed, 3)
    cuts = np.cumsum(SOURCE_P)
    src_idx = np.searchsorted(cuts, us, side="right").clip(0, len(SOURCES) - 1)

    # tokens: key = i * STRIDE + j, Zipf inverse-CDF
    total = int(n_tok.sum())
    row_of_tok = np.repeat(i, n_tok)
    offsets = np.concatenate([[0], np.cumsum(n_tok)]).astype(np.int64)
    j = np.arange(total, dtype=np.uint64) - np.repeat(offsets[:-1].astype(np.uint64), n_tok)
    keys = row_of_tok * _POS_STRIDE + j
    ut = _u01(keys, seed, 4)
    tokens_flat = np.searchsorted(zipf_cdf, ut, side="right").astype(np.int32)

    doc_id = np.char.add("doc", np.char.zfill(i.astype("U10"), 10))
    return doc_id, tokens_flat, offsets, n_tok, np.array(SOURCES, dtype=object)[src_idx]


def gen_row_tokens(i: int, seed: int = 42) -> np.ndarray:
    """Regenerate one row's token array in isolation (per-row invariant check)."""
    _, flat, offsets, n_tok, _ = gen_chunk(i, 1, seed)
    return flat[: n_tok[0]]


def write_sequences(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    chunk: int = 50_000,
    overwrite: bool = True,
    row_group_size: int = 2048,
) -> dict:
    """Write the sequences table; returns {'rows': N, 'tokens': total} manifest."""
    if overwrite and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    cdf = _zipf_cdf()
    total_tokens = 0
    for ci, start in enumerate(range(0, n_rows, chunk)):
        n = min(chunk, n_rows - start)
        doc_id, flat, offsets, n_tok, source = gen_chunk(start, n, seed, cdf)
        total_tokens += int(n_tok.sum())
        tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int32()))
        for sv in SOURCES:
            mask = source == sv
            if not mask.any():
                continue
            idx = np.nonzero(mask)[0]
            tbl = pa.table(
                {
                    "doc_id": pa.array(doc_id[idx]),
                    "tokens": tokens.take(pa.array(idx)),
                    "n_tok": pa.array(n_tok[idx], type=pa.int32()),
                }
            )
            pdir = os.path.join(out_dir, f"source={sv}")
            os.makedirs(pdir, exist_ok=True)
            # small row groups: token rows are fat (~2.5 KB/row compressed), and
            # Spark can only split scans at row-group boundaries — one giant row
            # group per file caps parallelism at n_files (observed: 4-way on the
            # 80%-skewed web source). 2048 rows ≈ 2-5 MB per group.
            pq.write_table(
                tbl, os.path.join(pdir, f"part-c{ci:04d}.parquet"), row_group_size=row_group_size
            )
    return {"rows": n_rows, "tokens": total_tokens, "seed": seed, "dir": out_dir}
