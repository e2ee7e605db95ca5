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
