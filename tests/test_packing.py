"""Sequence packing (D20): FFD per partition, no raw-row shuffle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.packing import pack_sequences, packing_stats


@pytest.fixture(scope="module")
def seq_df(spark, seq_tiny_dir):
    return spark.read.parquet(seq_tiny_dir)


def test_packing_invariants(spark, seq_df):
    """Every pack ≤ budget; every sequence assigned exactly once; offsets
    tile each pack contiguously; fill ≥ 0.9 on the lognormal lengths."""
    budget = 4096
    packed = pack_sequences(seq_df, budget).cache()

    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tok").alias("tok"), F.max("overflow").alias("ov")
    )
    assert per_pack.filter("NOT ov AND tok > 4096").count() == 0

    assert packed.count() == seq_df.count()
    assert packed.select("doc_id").distinct().count() == seq_df.count()

    # offsets are a contiguous tiling: per pack, sorted offsets == cumsum of
    # lengths laid head-to-head
    rows = packed.orderBy("pack_id", "pack_offset").toPandas()
    for _, g in rows.groupby("pack_id"):
        offs = g["pack_offset"].to_numpy()
        lens = g["n_tok"].to_numpy()
        assert offs[0] == 0 and (offs[1:] == np.cumsum(lens)[:-1]).all()

    stats = packing_stats(packed, budget)
    assert stats["n_sequences"] == 2000
    assert stats["max_pack_tokens"] <= budget
    assert stats["fill_fraction"] >= 0.9, stats
    packed.unpersist()


def test_packing_overflow_and_layout_robustness(spark, seq_df):
    """Sequences longer than the budget get dedicated flagged packs (never
    dropped/mutated); invariants survive an adversarial repartition."""
    budget = 600  # median ≈ 512 → plenty of singles and some overflow
    packed = pack_sequences(seq_df.repartition(13), budget).cache()
    n_over_src = seq_df.filter(F.col("n_tok") > budget).count()
    assert n_over_src > 0
    over = packed.filter("overflow")
    assert over.count() == n_over_src
    # overflow packs hold exactly one sequence each
    assert over.groupBy("pack_id").count().filter("count != 1").count() == 0
    # normal packs still respect the budget under the hostile layout
    bad = (
        packed.filter(~F.col("overflow"))
        .groupBy("pack_id").agg(F.sum("n_tok").alias("tok"))
        .filter(F.col("tok") > budget)
    )
    assert bad.count() == 0
    assert packed.count() == seq_df.count()
    packed.unpersist()


def test_materialize_packs(spark, seq_df):
    """The gather step: every pack's token array is its members' arrays
    concatenated in offset order — per-pack token counts equal the
    assignment's sums, and a spot-checked pack byte-matches a manual
    concatenation."""
    budget = 4096
    packed = pack_sequences(seq_df, budget).cache()
    from sketchlib.spark.packing import materialize_packs

    packs = materialize_packs(seq_df, packed).cache()
    want = packed.groupBy("pack_id").agg(
        F.sum("n_tok").alias("tok"), F.count("*").alias("n")
    )
    m = packs.join(want, "pack_id")
    assert m.filter("n_tokens != tok OR n_seqs != n").count() == 0
    assert packs.count() == packed.select("pack_id").distinct().count()

    # spot-check: the largest multi-sequence pack equals manual concat
    pid = (
        packed.groupBy("pack_id").count().filter("count >= 2")
        .orderBy(F.desc("count"), "pack_id").limit(1).collect()[0]["pack_id"]
    )
    members = (
        packed.filter(F.col("pack_id") == pid)
        .join(seq_df.select("doc_id", "tokens"), "doc_id")
        .orderBy("pack_offset")
        .collect()
    )
    manual = [t for r in members for t in r["tokens"]]
    got = packs.filter(F.col("pack_id") == pid).collect()[0]["tokens"]
    assert list(got) == manual
    packed.unpersist(); packs.unpersist()


def test_chunk_documents_invariants(spark):
    """Chunking (round 5): chunk lengths ≤ max_len; consecutive chunks share
    exactly `overlap` tokens; dropping each non-first chunk's overlap prefix
    and concatenating reconstructs the original doc exactly; empty and
    short docs yield exactly one chunk; token accounting matches
    n + (n_chunks-1)*overlap."""
    import pandas as pd

    from sketchlib.spark.packing import chunk_documents

    docs = [
        ("empty", []),
        ("nulldoc", None),  # NULL array → one EMPTY chunk (never size()=-1)
        ("short", list(range(5))),
        ("exact", list(range(16))),
        ("one_over", list(range(17))),
        ("long", list(range(100))),
        ("long2", list(range(999))),
    ]
    df = spark.createDataFrame(
        [(d, t) for d, t in docs], "doc_id string, tokens array<bigint>"
    )
    docs = [(d, t if t is not None else []) for d, t in docs]  # expected view
    max_len, overlap = 16, 4
    stride = max_len - overlap
    out = chunk_documents(df, max_len=max_len, overlap=overlap)
    rows = sorted(out.collect(), key=lambda r: (r["doc_id"], r["chunk_idx"]))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, toks in docs:
        chunks = by_doc[doc_id]
        n = len(toks)
        want_chunks = 1 if n <= max_len else -(-(n - max_len) // stride) + 1
        assert len(chunks) == want_chunks, doc_id
        assert [c["chunk_idx"] for c in chunks] == list(range(want_chunks))
        assert all(c["n_chunk_tokens"] <= max_len for c in chunks)
        assert all(c["chunk_id"] == f"{doc_id}#{c['chunk_idx']}" for c in chunks)
        # overlap contract + exact reconstruction
        recon = list(chunks[0]["tokens"])
        for prev, cur in zip(chunks, chunks[1:]):
            assert list(prev["tokens"])[-overlap:] == list(cur["tokens"])[:overlap]
            recon += list(cur["tokens"])[overlap:]
        assert recon == toks, doc_id
        total = sum(c["n_chunk_tokens"] for c in chunks)
        assert total == n + (want_chunks - 1) * overlap


def test_chunk_documents_no_python_in_plan(spark):
    """Chunking is pure higher-order SQL: the physical plan must contain no
    Python evaluation (it pipelines into the scan at 100 TB)."""
    import pandas as pd

    from sketchlib.spark.packing import chunk_documents

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a"], "tokens": [list(range(50))]})
    )
    plan = chunk_documents(df, max_len=16, overlap=4)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_chunk_documents_property_reconstruction(spark):
    """Hypothesis property: for ANY token array and any (max_len, overlap)
    with overlap < max_len, dropping each non-first chunk's overlap prefix
    and concatenating reconstructs the input exactly, and every chunk
    respects the window."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from sketchlib.spark.packing import chunk_documents

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        toks=st.lists(st.integers(0, 10_000), min_size=0, max_size=300),
        max_len=st.integers(2, 64),
        data=st.data(),
    )
    def prop(toks, max_len, data):
        overlap = data.draw(st.integers(0, max_len - 1))
        df = spark.createDataFrame([("x", toks)], "doc_id string, tokens array<bigint>")
        chunks = sorted(
            chunk_documents(df, max_len=max_len, overlap=overlap).collect(),
            key=lambda r: r["chunk_idx"],
        )
        assert all(len(c["tokens"]) <= max_len for c in chunks)
        recon = list(chunks[0]["tokens"])
        for prev, cur in zip(chunks, chunks[1:]):
            if overlap:
                assert list(prev["tokens"])[-overlap:] == list(cur["tokens"])[:overlap]
            recon += list(cur["tokens"])[overlap:]
        assert recon == toks

    prop()


def test_shuffle_shard_deterministic_and_balanced(spark):
    from sketchlib.spark.packing import shuffle_shard

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s = shuffle_shard(df, n_shards=16, seed=1)
    # pure function of (id, seed): physical partitioning must not matter
    a = s.orderBy("shard", "shuffle_key", "doc_id").collect()
    b = (
        shuffle_shard(df.repartition(13), n_shards=16, seed=1)
        .orderBy("shard", "shuffle_key", "doc_id")
        .collect()
    )
    assert a == b
    # different seed -> different permutation
    c = shuffle_shard(df, n_shards=16, seed=2).orderBy(
        "shard", "shuffle_key", "doc_id"
    ).collect()
    assert [r["doc_id"] for r in a] != [r["doc_id"] for r in c]
    # multinomial balance: no shard more than 2x the mean at n=2000, m=16
    sizes = [r["count"] for r in s.groupBy("shard").count().collect()]
    assert len(sizes) == 16 and max(sizes) < 2 * (2000 / 16)
    # keys are non-negative 60-bit ints; shard = key % n
    assert all(0 <= r["shuffle_key"] < 2**60 for r in a)
    assert all(r["shard"] == r["shuffle_key"] % 16 for r in a)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        shuffle_shard(df, n_shards=0)


def test_shuffle_shard_null_id_and_plan(spark):
    from pyspark.sql import functions as F

    from sketchlib.spark.packing import shuffle_shard

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    rows = {r["doc_id"]: r for r in shuffle_shard(df, n_shards=4).collect()}
    assert rows[None]["shuffle_key"] is None and rows[None]["shard"] is None
    assert rows[1]["shuffle_key"] is not None
    plan = (
        shuffle_shard(df, n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # zero shuffle, zero Python: pure codegen column expressions
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_split_dataset_stable_membership(spark):
    from sketchlib.spark.packing import split_dataset

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    full = {r["doc_id"]: r["split"] for r in split_dataset(df, w, seed=11).collect()}
    # appending docs never reassigns existing ones (the randomSplit failure)
    small = {
        r["doc_id"]: r["split"]
        for r in split_dataset(df.limit(500), w, seed=11).collect()
    }
    assert all(full[k] == v for k, v in small.items())
    # proportions land near the weights (md5 keys are uniform)
    from collections import Counter

    c = Counter(full.values())
    assert abs(c["train"] / 5000 - 0.8) < 0.03
    assert abs(c["val"] / 5000 - 0.1) < 0.02
    assert abs(c["test"] / 5000 - 0.1) < 0.02
    # weights normalize: 8/1/1 == 0.8/0.1/0.1
    norm = {
        r["doc_id"]: r["split"]
        for r in split_dataset(df, {"train": 8, "val": 1, "test": 1}, seed=11).collect()
    }
    assert norm == full

    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        split_dataset(df, {"train": 0.8, "val": -0.1})


def test_split_dataset_single_bucket_and_null(spark):
    from sketchlib.spark.packing import split_dataset

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    rows = {r["doc_id"]: r["split"] for r in split_dataset(df, {"all": 1.0}).collect()}
    assert rows[1] == "all" and rows[None] is None
