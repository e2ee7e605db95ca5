"""Streaming sketch maintenance: streamed states must equal a batch build
over the same data (merge associativity across micro-batch boundaries)."""

import pytest
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


def test_windowed_stream_watermark_semantics(spark, tmp_path):
    """Event-time windows + watermark, two micro-batch runs over a file
    source: (1) late-but-within-delay rows update their window, (2) rows
    older than the watermark are dropped and counted, (3) windows past the
    watermark are flagged final, (4) kept-row states byte-match a batch
    build keyed the same way."""
    import os

    import pandas as pd

    from sketchlib.sketches import deserialize
    from sketchlib.spark.build import partial_states, merge_states
    from sketchlib.spark.streaming import stream_build_windowed

    specs = [SketchSpec("hll_u", "hll", "user_id", {"p": 12})]
    src = str(tmp_path / "src")
    os.makedirs(src)
    H = 3_600_000_000  # 1h in µs

    def mk(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts_us", "source"])
        df = spark.createDataFrame(pdf)
        df = df.withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")

    # batch 1: events at hours 0 and 1 (windows W0, W1); max event = 1h50m
    mk("b1", [(1, 0 * H, "a"), (2, int(0.5 * H), "a"), (3, 1 * H, "a"), (4, int(1.83 * H), "a")])
    schema = spark.read.parquet(f"{src}/b1").schema
    state_dir, ckpt = str(tmp_path / "wstates"), str(tmp_path / "wckpt")

    def run():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
        q, sink = stream_build_windowed(
            stream, specs, state_dir, group_by="source", ts_col="ts",
            window="1 hour", delay="30 minutes", checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)
        return sink

    sink = run()
    # watermark = 1.83h - 0.5h = 1.33h: W0 (ends 1h) is final
    st = sink.states(spark).toPandas()
    assert set(st[st["is_final"]]["window_start"].dt.hour) == {0}

    # batch 2: one late-but-ok row for W1 (ts=1.4h > wm) and one too-late row
    # for W0 (ts=0.2h < wm), plus an on-time row at 3h
    mk("b2", [(9, int(1.4 * H), "a"), (8, int(0.2 * H), "a"), (7, 3 * H, "a")])
    sink = run()

    assert sink.dropped_late() == 1  # the 0.2h row
    st = sink.states(spark).toPandas()
    by_win = {int(r["window_start"].timestamp() // 3600): bytes(r["state"]) for _, r in st.iterrows()}
    # W1 state includes the late row: equals batch build over {3,4,9}'s rows
    n_w1 = deserialize(by_win[1]).estimate()[0]
    assert round(n_w1) == 3
    # W0 unchanged (too-late row rejected): users {1,2}
    assert round(deserialize(by_win[0]).estimate()[0]) == 2
    # new watermark = 3h - 0.5h = 2.5h: W0 and W1 final, W3 open
    fin = {int(r["window_start"].timestamp() // 3600) for _, r in st[st["is_final"]].iterrows()}
    assert fin == {0, 1} and 3 in by_win


def test_windowed_sink_compaction_bounds_live_state(spark, tmp_path):
    """Finalized windows are EVICTED from the per-batch-merged live table
    into the append-only archive: after streaming many windows the live
    table holds only the open ones (per-batch merge cost O(live windows),
    not O(stream age)), while states() still serves every window."""
    import json
    import os

    import pandas as pd

    from sketchlib.sketches import deserialize
    from sketchlib.spark.streaming import stream_build_windowed

    specs = [SketchSpec("hll_u", "hll", "user_id", {"p": 12})]
    src = str(tmp_path / "csrc")
    os.makedirs(src)
    H = 3_600_000_000  # 1h in µs

    n_hours = 6
    for h in range(n_hours):
        pdf = pd.DataFrame(
            [(h * 10 + 1, h * H, "a"), (h * 10 + 2, int((h + 0.4) * H), "a")],
            columns=["user_id", "ts_us", "source"],
        )
        df = spark.createDataFrame(pdf)
        df = df.withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{h}")

    schema = spark.read.parquet(f"{src}/b0").schema
    state_dir = str(tmp_path / "cstates")
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    q, sink = stream_build_windowed(
        stream, specs, state_dir, group_by="source", ts_col="ts",
        window="1 hour", delay="30 minutes", checkpoint_dir=str(tmp_path / "cckpt"),
    )
    q.awaitTermination(120)

    # watermark = 5.4h − 0.5h = 4.9h → windows 0..3 final, 4 and 5 live
    assert sink.live_state_count(spark) == 2
    with open(os.path.join(state_dir, "_current.json")) as fh:
        meta = json.load(fh)
    assert len(meta["archive_dirs"]) >= 3  # finalized incrementally, not at once

    st = sink.states(spark).toPandas()
    wins = sorted(int(r["window_start"].timestamp() // 3600) for _, r in st.iterrows())
    assert wins == list(range(n_hours))  # archive ∪ live covers every window
    fin = {int(r["window_start"].timestamp() // 3600) for _, r in st[st["is_final"]].iterrows()}
    assert fin == {0, 1, 2, 3}
    for _, r in st.iterrows():  # every window's state intact: 2 distinct users
        assert round(deserialize(bytes(r["state"])).estimate()[0]) == 2

    # compaction: many per-batch archive dirs consolidate into ONE, states()
    # unchanged; a second call is a no-op. The rewrite fans out with the
    # archived row count (VERDICT r3 #7): 4 archived rows at 2 rows/file
    # must land in >1 parquet file, not a coalesce(1) single-task rewrite.
    n = sink.compact_archive(spark, target_rows_per_file=2)
    assert n >= 3
    with open(os.path.join(state_dir, "_current.json")) as fh:
        compacted = json.load(fh)["archive_dirs"]
    assert len(compacted) == 1
    n_files = len([
        f for f in os.listdir(os.path.join(state_dir, "archive", compacted[0]))
        if f.endswith(".parquet")
    ])
    assert n_files == 2
    st2 = sink.states(spark).toPandas()
    assert sorted(int(r["window_start"].timestamp() // 3600) for _, r in st2.iterrows()) == wins
    assert sink.compact_archive(spark) == 0


def test_sessionize_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful operator: gap sessionization. Closed sessions are
    emitted as later events arrive; the open tail survives in the keyed
    state store ACROSS micro-batch runs (the second drain closes a session
    the first left open)."""
    import os

    import pandas as pd

    from sketchlib.spark.streaming import sessionize

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    S = 1_000_000_000  # 1s in ns

    def mk(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts_ns"])
        df = spark.createDataFrame(pdf)
        df = df.withColumn("ts", (F.col("ts_ns") / 1000).cast("long")).withColumn(
            "ts", F.timestamp_micros(F.col("ts"))
        ).drop("ts_ns")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")

    # user 1: sessions [0..20] then [100..]; user 2: [5] then [200..]
    mk("b1", [(1, 0), (1, 10 * S), (1, 20 * S), (1, 100 * S), (1, 110 * S), (2, 5 * S), (2, 200 * S)])
    schema = spark.read.parquet(f"{src}/b1").schema
    ckpt = str(tmp_path / "sess_ckpt")

    sink_dir = str(tmp_path / "sess_out")

    def drain():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
        out = sessionize(stream, key="user_id", ts_col="ts", gap_seconds=30)

        def write(bdf, bid):
            if bdf.count():
                bdf.write.mode("append").parquet(sink_dir)

        q = (
            out.writeStream.foreachBatch(write)
            .option("checkpointLocation", ckpt).outputMode("append")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        try:
            return spark.read.parquet(sink_dir).toPandas()
        except Exception:
            import pandas as _pd

            return _pd.DataFrame(columns=["user_id", "session_start", "session_end", "n_events"])

    def keyset(df):
        return {
            (int(r["user_id"]), int(r["session_start"].timestamp()), int(r["session_end"].timestamp()),
             int(r["n_events"]))
            for _, r in df.iterrows()
        }

    got1 = drain()
    assert keyset(got1) == {(1, 0, 20, 3), (2, 5, 5, 1)}  # open tails NOT emitted

    # batch 2: u1 at 115s continues the open session (state survived the
    # restart); u1 at 500s then closes it -> [100..115] with 3 events
    mk("b2", [(1, 115 * S), (1, 500 * S)])
    got2 = drain()
    assert keyset(got2) == {(1, 0, 20, 3), (2, 5, 5, 1), (1, 100, 115, 3)}


def test_streamed_states_served_through_sql_door(spark, seq_tiny_dir, tmp_path):
    """Verdict-over-streams end-to-end: a stream maintains sketch states
    (foreachBatch sink), the snapshot registers in the catalog, and
    approx_sql answers COUNT DISTINCT from it — matching a batch build's
    estimates exactly (streamed states byte-match batch states) and
    auto-routing to it when the statement names the registered input."""
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql, resolve_catalog_key

    schema = spark.read.parquet(seq_tiny_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 3)
        .parquet(seq_tiny_dir)
    )
    query, sink = stream_build(
        stream, SPECS, str(tmp_path / "stream_states"),
        group_by="source", checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert query.awaitTermination(120)

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.register_states(
        "live", sink.states(spark), SPECS, group_by="source", input_dir=seq_tiny_dir
    )
    # auto-routing matches on the registered input identity
    q = "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source"
    tables = {"sequences": seq_tiny_dir}
    assert resolve_catalog_key(spark, q, tables, cat) == "live"
    streamed = approx_sql(spark, q, tables, catalog=cat).toPandas()

    batch = build_sketches(spark.read.parquet(seq_tiny_dir), SPECS, group_by="source")
    from sketchlib.spark.query import estimates_df

    want = estimates_df(spark, batch, "hll_doc").toPandas()
    m = streamed.merge(want, on="group", suffixes=("_s", "_b"))
    assert len(m) == 5 and (m["estimate_s"] == m["estimate_b"]).all()

    # streams have no file lineage: refresh() refuses, re-register instead
    with pytest.raises(ValueError, match="file lineage"):
        cat.refresh("live")


def test_streaming_signature_sink(spark, tmp_path):
    """StreamingSignatureSink (round 5): a document stream signs itself —
    after the stream drains, the persisted signature table is byte-equal
    to batch signing of the same rows under the same contract, a replayed
    batch id overwrites rather than duplicates, a conflicting contract on
    the same state_dir is refused, and dedup_delta against the sink's
    table drops a duplicate of a streamed doc."""
    import pandas as pd

    from sketchlib.spark.dedup import dedup_delta, minhash_signatures
    from sketchlib.spark.streaming import StreamingSignatureSink

    src = str(tmp_path / "src")
    rows = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(40)],
            "tokens": [[(i * 7 + j) % 900 + 11 for j in range(30)] for i in range(40)],
        }
    )
    df = spark.createDataFrame(rows)
    df.limit(20).coalesce(1).write.parquet(f"{src}/a")
    df.exceptAll(df.limit(20)).coalesce(1).write.parquet(f"{src}/b")

    sd = str(tmp_path / "sigs")
    sink = StreamingSignatureSink(sd, r=64, n_bands=16, seed=9)
    schema = "doc_id string, tokens array<bigint>"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sink.signatures(spark)
    want = minhash_signatures(df, "tokens", "doc_id", r=64, n_bands=16, seed=9)
    gp = {r["doc_id"]: (r["sig"], r["bands"]) for r in got.collect()}
    wp = {r["doc_id"]: (r["sig"], r["bands"]) for r in want.collect()}
    assert gp == wp  # streamed == batch, byte-for-byte

    # replaying an already-committed batch id overwrites, never duplicates
    sink(df.limit(20), 0)
    assert sink.signatures(spark).count() == 40

    # contract recorded and enforced
    assert StreamingSignatureSink.contract(sd)["seed"] == 9
    with pytest.raises(ValueError, match="contract"):
        StreamingSignatureSink(sd, r=64, n_bands=16, seed=10)

    # the streaming half of the dedup loop: a delta with one copy of a
    # streamed doc and one genuinely-new doc probes the sink's table
    delta = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["copy_d3", "brand_new"],
                "tokens": [rows["tokens"][3], [999_000 + j for j in range(30)]],
            }
        )
    )
    kept, _ = dedup_delta(delta, sink.signatures(spark), threshold=0.9, seed=9)
    assert {r["doc_id"] for r in kept.collect()} == {"brand_new"}


def test_hopping_windows_assignment_and_finalization(spark, tmp_path):
    """slide= turns the windowed sink's tumbling windows into HOPPING ones:
    each event updates window/slide overlapping windows (Spark's own
    sliding-window semantics), per-window membership is exactly the events
    in [start, start+window), and watermark finalization keys on window END
    exactly as in the tumbling case."""
    import os

    import pandas as pd

    from sketchlib.sketches import deserialize
    from sketchlib.spark.streaming import WindowedStreamingSketchSink, stream_build_windowed

    specs = [SketchSpec("hll_u", "hll", "user_id", {"p": 12})]
    src = str(tmp_path / "hsrc")
    os.makedirs(src)
    H = 3_600_000_000

    rows = [(1, int(2.25 * H), "a"), (2, int(2.75 * H), "a"), (3, int(3.25 * H), "a")]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_us", "source"])
    df = spark.createDataFrame(pdf)
    df = df.withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
    df.coalesce(1).write.parquet(f"{src}/b1")
    schema = spark.read.parquet(f"{src}/b1").schema

    state_dir, ckpt = str(tmp_path / "hstates"), str(tmp_path / "hckpt")
    stream = spark.readStream.schema(schema).parquet(f"{src}/*")
    q, sink = stream_build_windowed(
        stream, specs, state_dir, group_by="source", ts_col="ts",
        window="2 hours", delay="15 minutes", checkpoint_dir=ckpt,
        slide="1 hour",
    )
    assert q.awaitTermination(120)

    st = sink.states(spark).toPandas()
    by_start = {
        int(r["window_start"].timestamp() // 3600): r for _, r in st.iterrows()
    }
    # membership per 2h window on the 1h hop grid
    want = {1: {1, 2}, 2: {1, 2, 3}, 3: {3}}
    for s, users in want.items():
        est = deserialize(bytes(by_start[s]["state"])).estimate()[0]
        assert round(est) == len(users), (s, est)
    # watermark = 3.25h − 0.25h = 3h → the window ENDING at 3h (start 1h)
    # is final; later windows are live
    finals = {s for s, r in by_start.items() if r["is_final"]}
    assert finals == {1}

    # validation: slide must divide window; slide == window degenerates to
    # tumbling (no fan-out)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="evenly divide"):
        WindowedStreamingSketchSink(
            specs, "source", str(tmp_path / "x"), window="2 hours", slide="45 min"
        )
    t = WindowedStreamingSketchSink(
        specs, "source", str(tmp_path / "y"), window="1 hour", slide="1 hour"
    )
    assert t.slide is None


def test_windows_floor_align_pre_epoch_timestamps(spark, tmp_path):
    """Regression (review): window-start alignment must FLOOR, not truncate
    toward zero — a pre-1970 (negative-epoch) event otherwise lands in
    windows that do not contain it."""
    import os

    import pandas as pd

    from sketchlib.spark.streaming import stream_build_windowed

    specs = [SketchSpec("hll_u", "hll", "user_id", {"p": 12})]
    src = str(tmp_path / "nsrc")
    os.makedirs(src)
    H = 3_600_000_000
    # one event half an hour BEFORE the epoch
    pdf = pd.DataFrame([(1, -H // 2, "a")], columns=["user_id", "ts_us", "source"])
    df = spark.createDataFrame(pdf)
    df = df.withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
    df.coalesce(1).write.parquet(f"{src}/b1")
    schema = spark.read.parquet(f"{src}/b1").schema

    for slide in (None, "1 hour"):
        sd = str(tmp_path / f"nstates_{slide}")
        ck = str(tmp_path / f"nckpt_{slide}")
        stream = spark.readStream.schema(schema).parquet(f"{src}/*")
        q, sink = stream_build_windowed(
            stream, specs, sd, group_by="source", ts_col="ts",
            window="2 hours", delay="1 minute", checkpoint_dir=ck, slide=slide,
        )
        assert q.awaitTermination(120)
        starts = {
            int(r["window_start"].timestamp() * 1_000_000)
            for r in sink.states(spark).collect()
        }
        # every assigned window must CONTAIN ts = -0.5h
        assert starts, slide
        for s in starts:
            assert s <= -H // 2 < s + 2 * H, (slide, s)
        if slide:  # 2h window on a 1h hop: exactly two covering windows
            assert starts == {-2 * H, -H}
        else:
            assert starts == {-2 * H}


def test_streaming_scramble_sink(spark, tmp_path):
    """StreamingScrambleSink: the drained stream's scramble equals the
    keyed-coin filter of the full static table (row-identical — the
    determinism the batch-id overwrite relies on), a replayed batch never
    duplicates, a conflicting contract refuses, and the uniform-sample
    estimator over the sink's table covers the exact SUM."""
    import numpy as np
    import pandas as pd
    import pytest as _pt

    from sketchlib.spark.sampling import approx_agg_from_uniform_sample
    from sketchlib.spark.streaming import StreamingScrambleSink

    rng = np.random.default_rng(13)
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i:05d}" for i in range(6000)],
            "val": rng.uniform(0, 10, 6000).round(3),
        }
    )
    src = str(tmp_path / "src")
    half = spark.createDataFrame(pdf.iloc[:3000])
    rest = spark.createDataFrame(pdf.iloc[3000:])
    half.coalesce(1).write.parquet(f"{src}/a")
    rest.coalesce(1).write.parquet(f"{src}/b")

    sd = str(tmp_path / "scramble")
    sink = StreamingScrambleSink(sd, id_col="doc_id", ratio=0.3, seed=7)
    stream = (
        spark.readStream.schema("doc_id string, val double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    samp = sink.sample(spark)
    got = sorted((r["doc_id"], r["val"]) for r in samp.collect())
    want = sorted(
        (r["doc_id"], r["val"])
        for r in sink.coin(spark.createDataFrame(pdf)).collect()
    )
    assert got == want and 0 < len(got) < len(pdf)

    # replayed batch id: rewrite, not append. Identify which file batch 0
    # actually held first — FileStreamSource orders files by modification
    # time, and two files written back-to-back can tie and flip order
    b0 = {r["doc_id"] for r in spark.read.parquet(f"{sd}/b0000000000").collect()}
    first = half if {r["doc_id"] for r in sink.coin(half).collect()} == b0 else rest
    n_before = samp.count()
    sink(first, 0)
    assert sink.sample(spark).count() == n_before

    # contract recorded and conflicting construction refused
    assert StreamingScrambleSink.contract(sd) == {
        "id_col": "doc_id", "ratio": 0.3, "seed": 7
    }
    StreamingScrambleSink(sd, id_col="doc_id", ratio=0.3, seed=7)  # idempotent
    with _pt.raises(ValueError, match="contract"):
        StreamingScrambleSink(sd, id_col="doc_id", ratio=0.5, seed=7)

    # the estimator consumes the sink's table unchanged
    out = approx_agg_from_uniform_sample(sink.sample(spark), None, "val", 0.3).collect()[0]
    exact = float(pdf["val"].sum())
    assert abs(out["est_sum"] - exact) <= out["sum_err"] * (3.29 / 1.96)
