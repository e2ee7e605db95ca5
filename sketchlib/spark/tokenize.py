"""Deterministic text → token-id arrays, entirely JVM-side (SURVEY.md §2A A19
inverse note): whitespace split + xxhash64 → vocab-bounded int32 ids, built
from Spark SQL higher-order functions so the whole expression stays inside
whole-stage codegen — no Python touches row data.

Used to adapt the driver's ``documents`` table (text, no tokens column) to
the sequences schema the sketch layer expects (FIXTURES.md F3 note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def token_ids(text_col: str | Column, vocab: int = 50_000) -> Column:
    """array<int> of hashed token ids for a text column."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))
    return F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(vocab)).cast("int"))


def with_tokens(df: DataFrame, text_col: str = "text", out: str = "tokens", vocab: int = 50_000) -> DataFrame:
    """documents-style table -> sequences-style: adds tokens + n_tok columns."""
    return df.withColumn(out, token_ids(text_col, vocab)).withColumn(
        "n_tok", F.size(F.col(out)).cast("int")
    )
