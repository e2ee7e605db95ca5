"""Streaming sketch maintenance: streamed states must equal a batch build
over the same data (merge associativity across micro-batch boundaries)."""

from pyspark.sql import functions as F

from sketchlib.spark import SketchSpec, build_sketches
from sketchlib.spark.streaming import stream_build

SPECS = [
    SketchSpec("hll_doc", "hll", "doc_id", {"p": 12}),
    SketchSpec("cm_tok", "cm", "tokens", {"eps": 1e-3, "delta": 0.05}),
    SketchSpec("bloom_tok", "bloom", "tokens", {"m_bits": 1 << 16, "h": 5}),
]


def test_streamed_states_match_batch_build(spark, seq_tiny_dir, tmp_path):
    batch_df = spark.read.parquet(seq_tiny_dir)
    schema = batch_df.schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # force several micro-batches
        .parquet(seq_tiny_dir)
    )
    query, sink = stream_build(
        stream, SPECS, str(tmp_path / "stream_states"),
        group_by="source", checkpoint_dir=str(tmp_path / "ckpt"),
    )
    query.awaitTermination(120)

    streamed = sink.states(spark)
    assert streamed is not None
    got = {(r["group"], r["sketch"]): bytes(r["state"]) for r in streamed.collect()}

    want_df = build_sketches(batch_df, SPECS, group_by="source")
    want = {(r["group"], r["sketch"]): bytes(r["state"]) for r in want_df.collect()}

    assert got.keys() == want.keys()
    for k in want:
        if k[1] == "cm_tok":
            from sketchlib.sketches import deserialize

            a, b = deserialize(got[k]), deserialize(want[k])
            assert (a.table == b.table).all() and a.total == b.total
        else:
            assert got[k] == want[k], k

    # rows/tokens accounting survives the incremental merges
    tot = streamed.filter(F.col("sketch") == "hll_doc").agg(F.sum("rows")).collect()[0][0]
    assert tot == 2000
