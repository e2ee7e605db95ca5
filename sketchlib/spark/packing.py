"""Sequence packing — batch assembly for pretraining (SURVEY.md §2D).

Training pipelines concatenate variable-length tokenized sequences into
fixed-size examples (e.g. 4096-token windows); wasted tail tokens are wasted
compute, so the packer's job is to assign sequences to packs such that each
pack's token sum stays ≤ budget while the fill fraction stays high.

Spark-first shape: optimal bin packing is NP-hard and inherently sequential,
but packing quality needs only LOCAL decisions — so each partition packs its
own rows with first-fit-decreasing (FFD, ≤ 11/9·OPT + 1 bins guaranteed;
empirically ≥0.9 fill on natural length distributions), entirely inside one
Arrow-batched `mapInPandas` pass. No shuffle of raw rows at all: pack ids are
namespaced by `TaskContext.partitionId()`, so the assignment is globally
unique without any cross-partition coordination. At 100 TB the pass is
embarrassingly parallel and the only global artifact is the (id → pack)
assignment table. Fill fraction is layout-dependent only at the margins (each
partition wastes at most its own last-bin tails); partitions of ≥10⁴ rows
keep FFD's asymptotic quality.

Oversized sequences (len > budget) get a dedicated pack each with
``overflow=true`` (the caller decides whether to split/truncate them —
packing never silently drops or mutates tokens).
"""

from __future__ import annotations

from bisect import insort

from pyspark.sql import DataFrame


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
) -> DataFrame:
    """Assign each row to a pack of total length ≤ ``budget``.

    Returns (id_col, len_col, pack_id string, pack_offset long, overflow
    boolean): ``pack_offset`` is the token position where this sequence
    starts inside its pack (sequences within a pack are laid out in
    assignment order), so downstream concatenation is a deterministic
    gather. FFD per partition via one ``mapInPandas`` pass.

    Memory contract: the packer buffers the PARTITION's (id, len) pairs —
    never the token payloads — before sorting (FFD's quality needs the
    whole partition's length distribution). That is ~16 B/row: ~160 MB at
    10⁷ rows/partition, ~1.6 GB at 10⁸ — size
    ``spark.sql.files.maxPartitionBytes`` so partitions stay under ~10⁷
    rows (the default 128 MB split of ~2.5 KB token rows gives ~5×10⁴
    rows/partition, three orders of magnitude inside the envelope).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    from pyspark import TaskContext
    from pyspark.sql.types import BooleanType, LongType, StringType, StructField

    schema = (
        df.select(id_col, len_col)
        .schema.add(StructField("pack_id", StringType()))
        .add(StructField("pack_offset", LongType()))
        .add(StructField("overflow", BooleanType()))
    )

    def pack(pdf_iter):
        import numpy as np
        import pandas as pd

        pid = TaskContext.get().partitionId()
        # one packer state across ALL Arrow batches of this partition — bins
        # stay open between batches so batch boundaries don't cost fill
        bins: list[list] = []  # sorted by remaining: [remaining, bin_idx]
        fills: dict[int, int] = {}  # bin_idx -> filled tokens
        assign: list[tuple] = []  # (id, length, bin_idx, offset, overflow)
        n_bins = 0
        rows_id, rows_len = [], []
        for pdf in pdf_iter:
            rows_id.append(pdf[id_col].to_numpy())
            rows_len.append(pdf[len_col].to_numpy())
        if not rows_id:
            return
        ids = np.concatenate(rows_id)
        raw = np.concatenate(rows_len)
        # a NULL length arrives as NaN and would cast to INT64_MIN, opening
        # an unbounded bin that silently breaks the budget invariant
        if raw.dtype.kind == "f" and np.isnan(raw).any():
            raise ValueError(f"pack_sequences: NULL in length column (partition {pid})")
        lens = raw.astype(np.int64)
        if (lens < 0).any():
            raise ValueError(f"pack_sequences: negative length (partition {pid})")
        order = np.lexsort((ids, -lens))  # FFD: longest first, id tie-break
        for i in order:
            length = int(lens[i])
            if length > budget:
                assign.append((ids[i], length, n_bins, 0, True))
                fills[n_bins] = length
                n_bins += 1  # dedicated overflow pack, never reused
                continue
            # first (tightest-fitting) open bin with remaining >= length:
            # bins sorted ascending by remaining → bisect for best fit.
            # Best-fit-decreasing shares FFD's 11/9 guarantee and keeps the
            # list operations O(log n) search + O(n) memmove worst case.
            lo, hi = 0, len(bins)
            while lo < hi:
                mid = (lo + hi) // 2
                if bins[mid][0] < length:
                    lo = mid + 1
                else:
                    hi = mid
            if lo == len(bins):
                b = n_bins
                n_bins += 1
                fills[b] = length
                rem = budget - length
                assign.append((ids[i], length, b, 0, False))
            else:
                rem_old, b = bins.pop(lo)
                off = fills[b]
                fills[b] = off + length
                rem = rem_old - length
                assign.append((ids[i], length, b, off, False))
            if rem > 0:
                insort(bins, [rem, b])
        out = pd.DataFrame(
            {
                id_col: [a[0] for a in assign],
                len_col: [a[1] for a in assign],
                "pack_id": [f"p{pid}_{a[2]}" for a in assign],
                "pack_offset": [a[3] for a in assign],
                "overflow": [a[4] for a in assign],
            }
        )
        yield out

    return df.select(id_col, len_col).mapInPandas(pack, schema)


def packing_stats(packed: DataFrame, budget: int, len_col: str = "n_tok") -> dict:
    """{n_sequences, n_packs, fill_fraction, max_pack_tokens, n_overflow} —
    fill_fraction counts non-overflow packs only (overflow packs are the
    caller's split/truncate decision, not packing waste)."""
    from pyspark.sql import functions as F

    per_pack = packed.groupBy("pack_id").agg(
        F.sum(len_col).alias("tok"),
        F.max("overflow").alias("overflow"),
        F.count("*").alias("n"),
    )
    row = per_pack.agg(
        F.count("*").alias("n_packs"),
        F.sum("n").alias("n_seq"),
        F.sum(F.when(~F.col("overflow"), F.col("tok"))).alias("packed_tok"),
        F.sum(F.when(~F.col("overflow"), 1).otherwise(0)).alias("n_norm"),
        F.max(F.when(~F.col("overflow"), F.col("tok"))).alias("max_tok"),
        F.sum(F.when(F.col("overflow"), 1).otherwise(0)).alias("n_over"),
    ).collect()[0]
    n_norm = int(row["n_norm"] or 0)
    return {
        "n_sequences": int(row["n_seq"] or 0),
        "n_packs": int(row["n_packs"] or 0),
        "fill_fraction": (float(row["packed_tok"]) / (n_norm * budget)) if n_norm else 0.0,
        "max_pack_tokens": int(row["max_tok"] or 0),
        "n_overflow": int(row["n_over"] or 0),
    }


def materialize_packs(
    df: DataFrame,
    packed: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Assemble the actual training examples: join the (id → pack)
    assignment back to the token rows and concatenate each pack's
    sequences in offset order. Returns (pack_id, n_seqs, n_tokens, tokens).

    This is the one stage of the packing pipeline that MUST move payloads —
    a pack's members have to co-locate — so it shuffles exactly once, keyed
    on pack_id, carrying each token array once. JVM-side assembly:
    collect_list of (offset, tokens) structs → array_sort (struct order =
    field order, so offset sorts first) → flatten; no Python in the path.
    """
    from pyspark.sql import functions as F

    joined = packed.select(id_col, "pack_id", "pack_offset").join(
        df.select(id_col, tokens_col), id_col
    )
    return (
        joined.groupBy("pack_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pack_offset"), F.col(tokens_col).alias("_t")))
            ).alias("_parts"),
            F.count("*").alias("n_seqs"),
        )
        .select(
            "pack_id",
            "n_seqs",
            F.flatten(F.col("_parts._t")).alias(tokens_col),
        )
        .withColumn("n_tokens", F.size(tokens_col))
        .select("pack_id", "n_seqs", "n_tokens", tokens_col)
    )


def chunk_documents(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    max_len: int = 4096,
    overlap: int = 0,
) -> DataFrame:
    """Split token arrays into context-window chunks of ≤ ``max_len`` tokens
    with ``overlap`` tokens of carried context between consecutive chunks —
    the complement of pack_sequences: packing concatenates short docs up to
    the window, chunking cuts long docs down to it (a pipeline usually runs
    chunk → pack).

    Chunk i covers token positions [i·stride, i·stride + max_len) with
    stride = max_len − overlap, so consecutive chunks share exactly
    ``overlap`` tokens and every token appears in ≥1 chunk:
    n_chunks = 1 if n ≤ max_len else ceil((n − max_len)/stride) + 1 (the
    last chunk may be shorter; empty and NULL token arrays both yield one
    EMPTY chunk so no row silently vanishes — size(NULL) = -1 would
    otherwise flow a corrupt (NULL tokens, n_chunk_tokens = -1) row into
    downstream token accounting). Output: every non-token input column (metadata
    rides along — chunking is per-row, so carrying payload costs nothing),
    plus chunk_idx int, chunk_id string = '<id>#<idx>', <tokens_col> = the
    chunk slice, n_chunk_tokens int.

    Spark-first shape: pure higher-order SQL — one ``transform(sequence(…),
    i -> slice(…))`` + ``posexplode`` inside whole-stage codegen, zero
    Python, zero shuffle (chunking is per-row); at 100 TB it pipelines
    directly into the scan. Row fan-out is bounded by n/stride, and the
    emitted rows carry only the chunk slices — total output tokens =
    n + (n_chunks − 1)·overlap per doc.
    """
    from pyspark.sql import functions as F

    if overlap >= max_len:
        raise ValueError(f"overlap ({overlap}) must be < max_len ({max_len})")
    # NULL-proof: a typed empty array (bare array() would infer array<string>
    # and break the column type)
    dtype = dict(df.dtypes)[tokens_col]
    df = df.withColumn(
        tokens_col,
        F.coalesce(F.col(tokens_col), F.expr(f"CAST(array() AS {dtype})")),
    )
    stride = max_len - overlap
    n = f"size({tokens_col})"
    n_chunks = (
        f"CASE WHEN {n} <= {max_len} THEN 1 "
        f"ELSE CAST(ceil(({n} - {max_len}) / CAST({stride} AS DOUBLE)) AS INT) + 1 END"
    )
    # slice() is 1-indexed; sequence(0, n_chunks-1) enumerates chunk starts
    chunks = (
        f"transform(sequence(0, {n_chunks} - 1), "
        f"i -> slice({tokens_col}, i * {stride} + 1, {max_len}))"
    )
    keep = [c for c in df.columns if c != tokens_col]
    return (
        df.select(*keep, F.posexplode(F.expr(chunks)).alias("chunk_idx", tokens_col))
        .withColumn("chunk_id", F.concat_ws("#", F.col(id_col).cast("string"), F.col("chunk_idx")))
        .withColumn("n_chunk_tokens", F.size(tokens_col))
        .select(*keep, "chunk_idx", "chunk_id", tokens_col, "n_chunk_tokens")
    )


def _md5_key60(id_col: str, seed: int):
    """First 60 bits of md5(id ':' seed) as a non-negative bigint — the
    engine-portable pseudorandom key under shuffle_shard / split_dataset
    (any engine with md5 evaluates the identical expression; 15 hex chars
    keep it inside int64 with no sign bit)."""
    from pyspark.sql import functions as F

    return F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def shuffle_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 1024,
    seed: int = 0,
    key_col: str = "shuffle_key",
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the step between corpus
    curation and training: decorrelate source/crawl ordering with a
    REPRODUCIBLE pseudorandom permutation, so re-runs, retries, and audits
    see the identical example order, and epoch order is a pure function of
    (id, seed), never of partitioning, cluster size, or input file layout.

    Each row gets ``key_col`` = the first 60 bits of md5(id ':' seed) as a
    non-negative bigint and ``shard_col`` = key % n_shards; the global
    order is (shard, key, id) lexicographically. md5-prefix bits are
    uniform, so shard sizes are multinomial-balanced (no planted skew) —
    and the same expression evaluates identically in any engine with md5
    (used verbatim by the DuckDB oracle).

    Scale shape: pure codegen column expressions — zero shuffle HERE; the
    one payload shuffle happens where the caller materializes, e.g.::

        shuffle_shard(df, n_shards=1024, seed=1)
          .repartitionByRange(1024, "shard", "shuffle_key")
          .sortWithinPartitions("shard", "shuffle_key", "doc_id")
          .write.partitionBy("shard").parquet(out)

    (range-partitioned: shard directories don't interleave, each file is
    key-ordered, a trainer streaming shard dirs in order replays the exact
    global permutation). A NULL id yields NULL key/shard — ids are the
    caller's contract; rows without one have no stable place in a
    reproducible permutation.
    """
    from pyspark.sql import functions as F

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = _md5_key60(id_col, seed)
    return df.withColumn(key_col, key).withColumn(
        shard_col, (F.col(key_col) % n_shards).cast("int")
    )


def split_dataset(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the row's 60-bit md5 key
    (same construction as shuffle_shard, independent salt via ``seed``)
    lands in [0, 2^60), and cumulative weight boundaries carve it into
    named buckets. Membership is a pure function of (id, seed) — appending
    documents NEVER reassigns existing ones (Spark's ``randomSplit`` is
    partition-order sensitive and reshuffles membership on any upstream
    change, which silently leaks eval docs into training across corpus
    versions). Weights are normalized; boundaries are exact integers so
    any engine evaluating the same expression agrees. NULL ids get a NULL
    split. Zero shuffle, pure codegen expressions.
    """
    from pyspark.sql import functions as F

    weights = weights if weights is not None else {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    total = float(sum(weights.values()))
    key = _md5_key60(id_col, seed)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(round(cum * (1 << 60)))
        cond = key < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    split = (expr.otherwise(last) if expr is not None else last).alias(out)
    return df.withColumn(out, F.when(key.isNotNull(), split))
