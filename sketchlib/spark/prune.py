"""Bloom-filter file/partition pruning (SURVEY.md B8, A7 token predicates).

Verdict avoids scanning irrelevant data by querying samples; the analogous
scan-reduction here: build one Bloom filter per input FILE over the token
column (a one-time pass reusing the standard build pipeline with
``group_by=_file``), persist the tiny states, then answer

    "which files can contain token t?"

driver-side and scan only the surviving files. False positives cost a wasted
scan; false negatives are impossible, so results are exact. This is a
poor-man's dynamic partition pruning under our control — no custom Catalyst
rule needed (SURVEY.md §4): at 10^12-sequence scale the file list is the
partition index, and the Bloom states (~KBs/file) replace a full-scan
predicate with an O(files) driver lookup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from sketchlib.spark.build import SketchSpec, partial_states
from sketchlib.spark.query import load_states


def build_file_blooms(
    df: DataFrame, token_col: str = "tokens", m_bits: int = 1 << 20, h: int = 7
) -> DataFrame:
    """One merged Bloom state per input file (group key = file name)."""
    from sketchlib.spark.build import merge_states

    spec = SketchSpec("bloom_file", "bloom", token_col, {"m_bits": m_bits, "h": h})
    tagged = df.withColumn("_file", F.input_file_name())
    return merge_states(partial_states(tagged, [spec], group_by="_file"))


class FilePruner:
    """Driver-side index: file -> Bloom; prunes scan lists by token membership."""

    def __init__(self, bloom_states: DataFrame):
        self._blooms = {
            g: sk for (g, name), sk in load_states(bloom_states).items() if name == "bloom_file"
        }

    @property
    def files(self) -> list[str]:
        return sorted(self._blooms)

    def files_maybe_containing(self, tokens) -> list[str]:
        """Files that MAY contain ALL of the given tokens (no false negatives)."""
        keys = np.atleast_1d(np.asarray(tokens))
        return sorted(
            f for f, bl in self._blooms.items() if bool(bl.contains(keys).all())
        )

    def pruned_read(self, spark: SparkSession, tokens) -> DataFrame:
        """Scan only surviving files; empty DataFrame if none survive."""
        keep = self.files_maybe_containing(tokens)
        if not keep:
            first = spark.read.parquet(self.files[0])
            return first.limit(0)
        return spark.read.parquet(*keep)

    def stats(self, tokens) -> dict:
        keep = self.files_maybe_containing(tokens)
        return {
            "total_files": len(self._blooms),
            "surviving_files": len(keep),
            "pruned_fraction": 1.0 - len(keep) / max(1, len(self._blooms)),
        }


# ----------------------------------------------------------- zone maps --


def build_file_zonemaps(input_dir: str, cols: list[str]):
    """Per-file (column, min, max, null_count, has_stats) read from parquet
    FOOTER row-group statistics — ZERO data scan (the stats were written at
    ingest), unlike the Bloom index's one-time build pass.

    The range-predicate complement of ``FilePruner`` (B8): a corpus written
    range-partitioned/sorted on a column (dates, n_tok, ids) has nearly
    disjoint per-file [min, max] envelopes, so "WHERE col BETWEEN lo AND hi"
    needs only the intersecting files. Spark's own scan prunes ROW GROUPS
    from the same stats, but still lists and opens every file's footer per
    query; a persisted zone-map table makes the FILE LIST an O(files)
    driver-side lookup (the poor-man's-DPP rationale of FilePruner), and it
    composes with the Bloom index (range ∧ membership).

    Array columns resolve to their parquet LEAF (``col.list.element``) —
    min/max over the elements. A file whose footer lacks stats for the
    column (or any row group of it) gets ``has_stats=False`` and is ALWAYS
    kept: pruning stays exact (no false negatives), it just saves nothing
    for that file.

    Returns a pandas DataFrame — persist it wherever the catalog lives and
    hand it back to ``ZoneMapPruner``.
    """
    import glob as _glob
    import os as _os

    import pandas as pd
    import pyarrow.parquet as pq

    if _os.path.isfile(input_dir):
        files = [input_dir]
    else:
        files = sorted(
            _glob.glob(_os.path.join(input_dir, "**", "*.parquet"), recursive=True)
        )
    if not files:
        raise ValueError(f"no parquet files under {input_dir!r}")
    rows = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        # leaf resolution once per file: exact name, or the list-element leaf
        paths = {}
        if md.num_row_groups:
            rg0 = md.row_group(0)
            for j in range(rg0.num_columns):
                paths[rg0.column(j).path_in_schema] = j
        for col in cols:
            j = paths.get(col)
            if j is None:
                j = paths.get(f"{col}.list.element")
            mn = mx = None
            nulls = 0
            ok = j is not None and md.num_row_groups > 0
            if ok:
                for i in range(md.num_row_groups):
                    st = md.row_group(i).column(j).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    nulls += st.null_count or 0
                    mn = st.min if mn is None or st.min < mn else mn
                    mx = st.max if mx is None or st.max > mx else mx
            rows.append(
                {
                    "file": f, "column": col,
                    "min": mn if ok else None, "max": mx if ok else None,
                    "null_count": nulls if ok else None, "has_stats": bool(ok),
                }
            )
    return pd.DataFrame(rows)


class ZoneMapPruner:
    """Driver-side index: file -> per-column [min, max]; prunes scan lists
    by range predicates. Exact by construction: a file is dropped only when
    its stats envelope cannot intersect the requested range — the caller
    still applies the real filter to the surviving files."""

    def __init__(self, zonemaps):
        self._z = zonemaps
        self._files = sorted(zonemaps["file"].unique())

    @classmethod
    def from_dir(cls, input_dir: str, cols: list[str]) -> "ZoneMapPruner":
        return cls(build_file_zonemaps(input_dir, cols))

    @property
    def files(self) -> list[str]:
        return self._files

    def files_in_range(self, col: str, lo=None, hi=None) -> list[str]:
        """Files whose [min, max] envelope intersects [lo, hi] (either bound
        may be None = unbounded). Stats-less files always survive."""
        sub = self._z[self._z["column"] == col]
        if sub.empty:
            raise KeyError(f"no zone maps built for column {col!r}")
        keep = []
        for r in sub.itertuples(index=False):
            if not r.has_stats:
                keep.append(r.file)
                continue
            if lo is not None and r.max < lo:
                continue
            if hi is not None and r.min > hi:
                continue
            keep.append(r.file)
        return sorted(keep)

    def files_matching(self, predicates: dict) -> list[str]:
        """Intersection over {col: (lo, hi)} predicates."""
        keep = set(self._files)
        for col, (lo, hi) in predicates.items():
            keep &= set(self.files_in_range(col, lo, hi))
        return sorted(keep)

    def pruned_read(self, spark: SparkSession, predicates: dict) -> DataFrame:
        """Scan only surviving files; empty DataFrame if none survive."""
        keep = self.files_matching(predicates)
        if not keep:
            return spark.read.parquet(self._files[0]).limit(0)
        return spark.read.parquet(*keep)

    def stats(self, predicates: dict) -> dict:
        keep = self.files_matching(predicates)
        return {
            "total_files": len(self._files),
            "surviving_files": len(keep),
            "pruned_fraction": 1.0 - len(keep) / max(1, len(self._files)),
        }

    def save(self, path: str) -> None:
        """Persist the index as one small parquet (pandas round-trip) — at
        10⁶ files this is a few MB; rebuilders prefer from_dir (footer
        reads), but a saved index makes query-time pruning storage-free."""
        self._z.to_parquet(path, index=False)

    @classmethod
    def load(cls, path: str) -> "ZoneMapPruner":
        import pandas as pd

        return cls(pd.read_parquet(path))
