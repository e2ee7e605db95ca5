"""Incremental sketch maintenance over Structured Streaming.

The reference is batch-interactive only (SURVEY.md A18 — Verdict has no
streaming surface), but mergeable sketches make the streaming extension
almost free, and a 10^12-sequence corpus is ingested continuously in
practice: each micro-batch produces partial states via the SAME batch kernel
(`partial_states`), which merge into a persisted running state table.
Commutativity + associativity (property-tested) make the result independent
of micro-batch boundaries: the streamed states are byte-identical to a batch
build over the union of the data for order-independent sketches (tested).

Pattern: ``foreachBatch`` + atomic state-table swap. foreachBatch (rather
than a custom stateful operator) because the state is a handful of KB-sized
blobs per group — broadcast-scale, not keyed-state-store-scale — and the
merge is a tiny job. Exactly-once: the swap directory is versioned by batch
id; replaying a batch after a crash overwrites its own version (idempotent),
and the pointer file advances only after a successful write.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from sketchlib.spark.build import STATE_FIELDS, SketchSpec, merge_states, partial_states


class StreamingSketchSink:
    """foreachBatch sink: merges each micro-batch's partial states into a
    persisted running state table under ``state_dir``."""

    def __init__(self, specs: list[SketchSpec], group_by: str | None, state_dir: str):
        self.specs = specs
        self.group_by = group_by
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _ptr_path(self) -> str:
        return os.path.join(self.state_dir, "_current.json")

    def current_version(self) -> int:
        try:
            with open(self._ptr_path()) as fh:
                return json.load(fh)["version"]
        except FileNotFoundError:
            return -1

    def states(self, spark: SparkSession) -> DataFrame | None:
        v = self.current_version()
        if v < 0:
            return None
        return spark.read.schema(STATE_FIELDS).parquet(os.path.join(self.state_dir, f"v{v:010d}"))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.current_version() == batch_id:
            # replay of an already-committed batch (crash landed between the
            # pointer advance and the streaming checkpoint commit): merging
            # again would read v{batch_id} and overwrite the same path, which
            # Spark rejects — and would double-count. Idempotence = return.
            # Loud, because the other way to land here is pointing a FRESH
            # streaming checkpoint at an old state_dir — which silently drops
            # the new batch 0. Pair each state_dir with ONE checkpoint dir.
            import warnings

            warnings.warn(
                f"StreamingSketchSink: batch {batch_id} already committed in "
                f"{self.state_dir} — skipping (replay). If this is a NEW "
                "checkpoint reusing an old state_dir, its data was NOT merged.",
                stacklevel=2,
            )
            return
        spark = batch_df.sparkSession
        new_partials = partial_states(batch_df, self.specs, self.group_by)
        prev = self.states(spark)
        combined = new_partials if prev is None else new_partials.unionByName(prev)
        merged = merge_states(combined)
        out = os.path.join(self.state_dir, f"v{batch_id:010d}")
        merged.write.mode("overwrite").parquet(out)  # replay-safe: same id, same dir
        tmp = self._ptr_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": int(batch_id)}, fh)
        os.replace(tmp, self._ptr_path())


class WindowedStreamingSketchSink:
    """Event-time-windowed sketch maintenance with WATERMARK semantics.

    States are keyed by (tumbling window start × group). The watermark is
    sink-managed exactly the way Structured Streaming's built-in operators
    manage theirs: it advances to ``max(event_time seen) − delay`` at each
    batch BOUNDARY, rows older than the current watermark are dropped (and
    counted in ``dropped_late``), and windows whose END is at or below the
    watermark are FINAL — compacted out of the live state table into an
    append-only ``archive/`` the batch they finalize and never merged again
    (per-batch merge cost stays O(live windows × groups) over the stream's
    lifetime; ``states()`` unions live + archive).
    Late-but-within-delay rows still update their window (the whole
    point of the delay). foreachBatch rather than applyInPandasWithState for
    the same reason as the unwindowed sink: total state is
    O(windows × groups × KB), a tiny merge job, not a keyed state store.
    """

    def __init__(
        self,
        specs: list[SketchSpec],
        group_by: str | None,
        state_dir: str,
        ts_col: str = "ts",
        window: str = "1 day",
        delay: str = "1 hour",
        slide: str | None = None,
    ):
        self.specs = specs
        self.group_by = group_by
        self.state_dir = state_dir
        self.ts_col = ts_col
        self.window = window
        self.delay = delay
        self.slide = slide
        win_us = _interval_us(window)  # fail fast on unparseable intervals
        _interval_us(delay)
        if slide is not None:
            # HOPPING windows: each event updates window/slide overlapping
            # windows (Structured Streaming's own sliding-window semantics).
            # The divisibility requirement keeps window starts on a single
            # slide grid — same rule as Spark's window() with a slideDuration
            s_us = _interval_us(slide)
            if s_us <= 0 or win_us % s_us != 0:
                raise ValueError(
                    f"slide {slide!r} must evenly divide window {window!r}"
                )
            if s_us == win_us:
                self.slide = None  # degenerate hop = tumbling
        os.makedirs(state_dir, exist_ok=True)

    def _ptr_path(self) -> str:
        return os.path.join(self.state_dir, "_current.json")

    def _meta(self) -> dict:
        try:
            with open(self._ptr_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {"version": -1, "max_event_us": None, "dropped_late": 0, "archive_dirs": []}

    def watermark_us(self) -> int | None:
        """Current watermark (µs since epoch): max event time − delay."""
        m = self._meta()
        if m["max_event_us"] is None:
            return None
        return m["max_event_us"] - self._delay_us()

    def _delay_us(self) -> int:
        return _interval_us(self.delay)

    def dropped_late(self) -> int:
        return self._meta().get("dropped_late", 0)

    def live_state_count(self, spark: SparkSession) -> int:
        """Rows in the LIVE (per-batch-merged) state table — the quantity
        that must stay O(open windows × groups) over a long-running stream."""
        m = self._meta()
        if m["version"] < 0:
            return 0
        path = os.path.join(self.state_dir, f"v{m['version']:010d}")
        return spark.read.schema(STATE_FIELDS).parquet(path).count()

    def compact_archive(self, spark: SparkSession, target_rows_per_file: int = 100_000) -> int:
        """Consolidate the per-batch archive dirs into ONE directory.

        A year-long stream finalizes a window most batches, so the committed
        archive-dir list (and the file count behind `states()`) grows with
        stream age. Compaction rewrites all archived rows into a single
        `archive/compact_<version>` dir and commits it as the only list
        entry — crash-safe for the same reason archiving is: the new dir
        only becomes visible via the pointer write, and the stale dirs are
        deleted only after it. Returns the number of dirs consolidated.
        Safe to call any time between micro-batches (e.g. foreachBatch-
        scheduled every N batches).

        The rewrite fans out: output file count scales with the archived
        row count (``target_rows_per_file`` KB-sized state rows per file),
        so a years-long high-cardinality stream compacts with cluster
        parallelism instead of one task rewriting GBs through coalesce(1);
        months of KB-state windows still land in a single file.
        """
        meta = self._meta()
        dirs = meta.get("archive_dirs", [])
        if len(dirs) <= 1:
            return 0
        paths = [os.path.join(self.state_dir, "archive", d) for d in dirs]
        target = f"compact_{meta['version']:010d}"
        out = os.path.join(self.state_dir, "archive", target)
        archived = spark.read.schema(STATE_FIELDS).parquet(*paths)
        n_rows = archived.count()
        n_files = max(1, -(-n_rows // max(1, target_rows_per_file)))
        archived.coalesce(n_files).write.mode("overwrite").parquet(out)
        tmp = self._ptr_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({**meta, "archive_dirs": [target]}, fh)
        os.replace(tmp, self._ptr_path())
        import shutil

        for p in paths:  # stale only after the pointer committed
            shutil.rmtree(p, ignore_errors=True)
        return len(dirs)

    def states(self, spark: SparkSession) -> DataFrame | None:
        """(window_start timestamp, group, sketch, state, …, is_final).

        Union of the LIVE state table (windows still inside the watermark)
        and the append-only ARCHIVE of finalized windows. Only committed
        archive dirs (listed in the pointer file) are read, so a crash
        mid-archive-write can never surface a partial directory.
        """
        m = self._meta()
        paths = [os.path.join(self.state_dir, "archive", d) for d in m.get("archive_dirs", [])]
        if m["version"] >= 0:
            paths.append(os.path.join(self.state_dir, f"v{m['version']:010d}"))
        if not paths:
            return None
        from pyspark.sql import functions as F  # noqa: N812

        df = spark.read.schema(STATE_FIELDS).parquet(*paths)
        split = F.split(F.col("group"), "\\|", 2)
        wm = self.watermark_us()
        win_end_us = split.getItem(0).cast("long") + _interval_us(self.window)
        return (
            df.withColumn("window_start", F.timestamp_micros(split.getItem(0).cast("long")))
            .withColumn("is_final", F.lit(wm is not None) & (win_end_us <= F.lit(wm or 0)))
            .withColumn("group", split.getItem(1))
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F  # noqa: N812

        spark = batch_df.sparkSession
        meta = self._meta()
        if meta["version"] == batch_id:
            # already committed (crash between pointer advance and streaming
            # checkpoint commit): re-merging would read v{batch_id} while
            # overwriting it and double-accumulate dropped_late. Replay = noop
            # — loud for the fresh-checkpoint-over-old-state_dir misuse.
            import warnings

            warnings.warn(
                f"WindowedStreamingSketchSink: batch {batch_id} already "
                f"committed in {self.state_dir} — skipping (replay). If this "
                "is a NEW checkpoint reusing an old state_dir, its data was "
                "NOT merged.",
                stacklevel=2,
            )
            return
        wm_us = None if meta["max_event_us"] is None else meta["max_event_us"] - self._delay_us()

        # TIMESTAMP_NTZ sources (e.g. parquet written without timezone)
        # reject unix_micros directly — cast first. For NTZ inputs the cast
        # interprets the naive value in the SESSION timezone, so window
        # boundaries are session-tz-relative (deterministic within a job;
        # pin spark.sql.session.timeZone=UTC for cross-engine parity)
        ts_us = F.unix_micros(F.col(self.ts_col).cast("timestamp"))
        batch_df = batch_df.withColumn("_ts_us", ts_us).persist()
        # ONE action covers both late accounting and the event-time high mark
        # (the un-persisted batch would otherwise be re-evaluated per action)
        stats = batch_df.agg(
            F.max("_ts_us").alias("mx"),
            F.sum(
                (F.col("_ts_us") < (wm_us if wm_us is not None else float("-inf"))).cast("long")
            ).alias("late"),
        ).collect()[0]
        dropped = int(stats["late"] or 0)
        if wm_us is not None and dropped:
            batch_df = batch_df.filter(F.col("_ts_us") >= wm_us)

        # never fabricate a watermark from an empty batch: the high mark stays
        # None until a real event has been seen
        seen = [x for x in (meta["max_event_us"], stats["mx"]) if x is not None]
        new_max = max(seen) if seen else None

        win_us = _interval_us(self.window)
        # ts − pmod(ts, step) is FLOOR alignment in exact int64 arithmetic
        # (pmod is non-negative): a cast-truncated ts/step would round
        # pre-epoch (negative) timestamps toward zero and assign them to
        # windows that do not contain them
        if self.slide is None:
            assigned = batch_df.withColumn(
                "_wstart",
                F.col("_ts_us") - F.pmod(F.col("_ts_us"), F.lit(win_us)),
            )
        else:
            # hopping assignment: the latest window start covering ts is
            # floor(ts/slide)*slide; the event also belongs to the
            # (win/slide − 1) earlier starts still covering it. One small
            # sequence-explode per row — the same ×(win/slide) row fan-out
            # Spark's native sliding window() pays, then the per-(window ×
            # group) state path below is unchanged (watermark finalization
            # keys on window END, which is hop-agnostic).
            s_us = _interval_us(self.slide)
            n = win_us // s_us
            base = F.col("_ts_us") - F.pmod(F.col("_ts_us"), F.lit(s_us))
            assigned = (
                batch_df.withColumn("_k", F.explode(F.expr(f"sequence(0, {n - 1})")))
                .withColumn("_wstart", base - F.col("_k") * F.lit(s_us))
                .drop("_k")
            )
        wstart = F.col("_wstart")
        gcol = (
            F.concat(wstart.cast("string"), F.lit("|"), F.col(self.group_by).cast("string"))
            if self.group_by
            else F.concat(wstart.cast("string"), F.lit("|"))
        )
        keyed = assigned.withColumn("_wg", gcol)
        new_partials = partial_states(keyed, self.specs, "_wg")
        prev = None
        if meta["version"] >= 0:
            prev = spark.read.schema(STATE_FIELDS).parquet(
                os.path.join(self.state_dir, f"v{meta['version']:010d}")
            )
        combined = new_partials if prev is None else new_partials.unionByName(prev)
        merged = merge_states(combined).persist()

        # COMPACTION/EVICTION: windows whose end is at or below the NEW
        # watermark are final — they can never receive another row (any such
        # row would be dropped as late above), so move them to the append-only
        # archive and keep only LIVE windows in the per-batch-merged table.
        # Per-batch merge cost is therefore O(live windows × groups), constant
        # over a long-running stream, instead of growing with stream age.
        new_wm = None if new_max is None else int(new_max) - self._delay_us()
        win_end_us = F.split(F.col("group"), "\\|", 2).getItem(0).cast("long") + F.lit(win_us)
        if new_wm is not None:
            final_rows = merged.filter(win_end_us <= F.lit(new_wm))
            live = merged.filter(win_end_us > F.lit(new_wm))
        else:
            final_rows, live = None, merged
        archive_dirs = list(meta.get("archive_dirs", []))
        arch_name = f"b{batch_id:010d}"
        if final_rows is not None and final_rows.count():
            # overwrite keeps replay idempotent; the dir joins the committed
            # list only via the pointer write below
            final_rows.write.mode("overwrite").parquet(
                os.path.join(self.state_dir, "archive", arch_name)
            )
            if arch_name not in archive_dirs:
                archive_dirs.append(arch_name)
        out = os.path.join(self.state_dir, f"v{batch_id:010d}")
        live.write.mode("overwrite").parquet(out)
        merged.unpersist()
        batch_df.unpersist()
        tmp = self._ptr_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": int(batch_id),
                    "max_event_us": None if new_max is None else int(new_max),
                    "dropped_late": int(meta.get("dropped_late", 0) + dropped),
                    "archive_dirs": archive_dirs,
                },
                fh,
            )
        os.replace(tmp, self._ptr_path())


def _interval_us(text: str) -> int:
    """'1 day' / '30 min' / '2 hours' / '1 week' → microseconds; raises a
    clear ValueError (at sink CONSTRUCTION, not mid-stream) on anything else."""
    parts = text.strip().split()
    mult = {
        "ms": 1_000, "millisecond": 1_000, "milliseconds": 1_000,
        "s": 1_000_000, "sec": 1_000_000, "secs": 1_000_000,
        "second": 1_000_000, "seconds": 1_000_000,
        "min": 60_000_000, "mins": 60_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "h": 3_600_000_000, "hour": 3_600_000_000, "hours": 3_600_000_000,
        "day": 86_400_000_000, "days": 86_400_000_000,
        "week": 604_800_000_000, "weeks": 604_800_000_000,
    }
    if len(parts) != 2 or not parts[0].isdigit() or parts[1].lower() not in mult:
        raise ValueError(
            f"unparseable interval {text!r} — use '<n> <unit>' with unit in {sorted(mult)}"
        )
    return int(parts[0]) * mult[parts[1].lower()]


def stream_build_windowed(
    stream_df: DataFrame,
    specs: list[SketchSpec],
    state_dir: str,
    group_by: str | None = "source",
    ts_col: str = "ts",
    window: str = "1 day",
    delay: str = "1 hour",
    checkpoint_dir: str | None = None,
    slide: str | None = None,
):
    """Windowed variant of stream_build: per-(event-time window × group)
    states with sink-managed watermark eviction. ``slide`` turns the
    tumbling windows into HOPPING ones (slide must divide window; each
    event updates window/slide overlapping windows). Returns (query, sink)."""
    sink = WindowedStreamingSketchSink(
        specs, group_by, state_dir, ts_col, window, delay, slide=slide
    )
    writer = stream_df.writeStream.foreachBatch(sink).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start(), sink


def sessionize(
    stream_df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
):
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` — the keyed-state-store API, used here because
    (unlike the sketch sinks) per-key session state genuinely is
    key-cardinality-sized. Emits one row per CLOSED session (a session closes
    when a later event for the same key arrives more than ``gap_seconds``
    after it); the open tail session stays in the state store across
    micro-batches. Output: (key, session_start, session_end, n_events).

    Returns a streaming DataFrame — attach any sink. Deterministic: within a
    batch events are sorted by event time before folding into the state.
    """
    import pandas as pd

    ktype = dict(stream_df.dtypes)[key]
    out_schema = f"{key} {ktype}, session_start timestamp, session_end timestamp, n_events long"
    state_schema = "start_ns long, last_ns long, n long"
    gap_ns = int(gap_seconds * 1_000_000_000)

    def fn(key_tuple, pdf_iter, state):
        import numpy as np

        ts_all = [
            pd.to_datetime(pdf[ts_col]).astype("int64").to_numpy() for pdf in pdf_iter
        ]  # ns since epoch
        ts = np.sort(np.concatenate(ts_all)) if ts_all else np.array([], dtype=np.int64)
        if state.exists:
            start_ns, last_ns, n = state.get
        else:
            start_ns = last_ns = None
            n = 0
        closed = []
        for t in ts.tolist():
            if last_ns is not None and t - last_ns > gap_ns:
                closed.append((start_ns, last_ns, n))
                start_ns, n = t, 0
            if start_ns is None:
                start_ns = t
            last_ns = t
            n += 1
        state.update((start_ns, last_ns, n))
        if closed:
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="ns"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="ns"),
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        stream_df.select(key, ts_col)
        .groupBy(key)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", "NoTimeout")
    )


def stream_build(
    stream_df: DataFrame,
    specs: list[SketchSpec],
    state_dir: str,
    group_by: str | None = "source",
    checkpoint_dir: str | None = None,
):
    """Attach the sketch sink to a streaming DataFrame; returns the query.

    Caller controls the trigger; ``availableNow`` gives a deterministic
    drain-everything run (used in tests), a processing-time trigger gives
    continuous maintenance.
    """
    sink = StreamingSketchSink(specs, group_by, state_dir)
    writer = stream_df.writeStream.foreachBatch(sink).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start(), sink


class StreamingSignatureSink:
    """foreachBatch sink maintaining a persisted MinHash SIGNATURE table
    from a stream of documents — the signature analog of
    StreamingSketchSink, and the streaming half of the incremental-dedup
    loop: a crawl stream signs itself as batches land, so `dedup_delta`
    probes an always-fresh corpus signature table instead of waiting on a
    nightly signing job (the reference is batch-only; this exceeds it).

    Idempotency: each micro-batch's signatures are written to a
    batch-id-keyed subdir (``b<id>``) with mode=overwrite — a crash/replay
    of the same batch rewrites the same path, never duplicating rows (the
    signing kernel is content-keyed, so the rewrite is byte-identical).
    The signing contract (r, n_bands, seed, tokens_col, id_col) is fixed
    at construction and persisted to ``_contract.json`` beside the data
    (underscore-prefixed: invisible to Spark's file index), so consumers
    — dedup_delta, or a later catalog registration — can read the exact
    contract instead of trusting call sites to repeat it.
    """

    def __init__(
        self,
        state_dir: str,
        tokens_col: str = "tokens",
        id_col: str = "doc_id",
        r: int = 128,
        n_bands: int = 32,
        seed: int = 17,
    ):
        if r % n_bands != 0:
            raise ValueError(f"r={r} must be divisible by n_bands={n_bands}")
        self.state_dir = state_dir
        self.tokens_col, self.id_col = tokens_col, id_col
        self.r, self.n_bands, self.seed = r, n_bands, seed
        os.makedirs(state_dir, exist_ok=True)
        cpath = os.path.join(state_dir, "_contract.json")
        contract = {
            "tokens_col": tokens_col, "id_col": id_col,
            "r": r, "n_bands": n_bands, "seed": seed,
        }
        if os.path.exists(cpath):
            with open(cpath) as fh:
                existing = json.load(fh)
            if existing != contract:
                raise ValueError(
                    f"state_dir {state_dir!r} already holds signatures under "
                    f"contract {existing} — constructing a sink with "
                    f"{contract} would mix incompatible signatures; use a "
                    "fresh state_dir or the recorded contract"
                )
        else:
            tmp = cpath + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(contract, fh)
            os.replace(tmp, cpath)

    @staticmethod
    def contract(state_dir: str) -> dict:
        """The signing contract recorded at ``state_dir`` (for consumers)."""
        with open(os.path.join(state_dir, "_contract.json")) as fh:
            return json.load(fh)

    def signatures(self, spark: SparkSession) -> DataFrame | None:
        """All signatures signed so far (None before the first batch) —
        feed directly to ``dedup_delta(existing_sigs=..., seed=self.seed)``."""
        import glob as _glob

        dirs = sorted(_glob.glob(os.path.join(self.state_dir, "b*")))
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sketchlib.spark.dedup import minhash_signatures

        sigs = minhash_signatures(
            batch_df, self.tokens_col, self.id_col,
            r=self.r, n_bands=self.n_bands, seed=self.seed,
        )
        out = os.path.join(self.state_dir, f"b{batch_id:010d}")
        # replay-safe: same batch id -> same dir, overwritten byte-identically
        sigs.write.mode("overwrite").parquet(out)


class StreamingScrambleSink:
    """foreachBatch sink maintaining a persisted UNIFORM SCRAMBLE from a
    stream of rows — the SAMPLING half of continuous maintenance (the
    sketch half is ``StreamingSketchSink``, the signature half
    ``StreamingSignatureSink``): batch scrambles refresh on append via
    ``SketchCatalog.refresh_sample``; this keeps one current as batches
    LAND, so the sampling aggregates (APPROX_COUNT/SUM/AVG and the
    subsample estimator) always have a fresh p-fraction table to scan.

    The inclusion coin is a DETERMINISTIC HASH on the id column
    (``xxhash64(id, seed) mod M < p·M`` — the same keyed-coin family as
    ``universe_sample`` / ``weighted_sample``), NOT Spark's partition-RNG
    ``df.sample``: a replayed micro-batch must re-draw EXACTLY the same
    rows for the batch-id-keyed overwrite to be idempotent, and partition
    layout inside a restarted stream is not a stable thing to key a coin
    on. Over a unique id column the hash coin IS a Bernoulli(p) row
    sample, so every uniform-scramble estimator
    (``approx_agg_from_uniform_sample``, ``subsample_*``) consumes the
    table unchanged. (Do not reuse the same (column, seed) pair as a
    registered UNIVERSE sample — the two coins would be identical and the
    samples perfectly correlated; this sink's default seed 1042 differs
    from the sampling module's default 42 for exactly that reason, but an
    explicit seed clash is on the caller.)

    The drawing contract (id_col, ratio, seed) is fixed at construction
    and persisted to ``_contract.json`` beside the data (underscore-
    prefixed: invisible to Spark's file index); a sink constructed with a
    CONFLICTING contract on the same state_dir refuses — mixed-ratio
    scrambles would silently bias every 1/p scale-up.
    """

    def __init__(
        self,
        state_dir: str,
        id_col: str = "doc_id",
        ratio: float = 0.1,
        seed: int = 1042,
    ):
        if not (0.0 < ratio <= 1.0):
            raise ValueError(f"ratio must be in (0, 1], got {ratio}")
        self.state_dir = state_dir
        self.id_col, self.ratio, self.seed = id_col, float(ratio), int(seed)
        os.makedirs(state_dir, exist_ok=True)
        cpath = os.path.join(state_dir, "_contract.json")
        contract = {"id_col": id_col, "ratio": float(ratio), "seed": int(seed)}
        if os.path.exists(cpath):
            with open(cpath) as fh:
                existing = json.load(fh)
            if existing != contract:
                raise ValueError(
                    f"state_dir {state_dir!r} already holds a scramble under "
                    f"contract {existing} — constructing a sink with "
                    f"{contract} would mix inclusion probabilities; pass the "
                    f"recorded parameters explicitly (e.g. "
                    f"seed={existing.get('seed')}, ratio={existing.get('ratio')}) "
                    "to keep appending, or use a fresh state_dir (note: the "
                    "DEFAULT seed changed 42 → 1042 to decorrelate from the "
                    "sampling module's default — older dirs need seed=42)"
                )
        else:
            tmp = cpath + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(contract, fh)
            os.replace(tmp, cpath)

    @staticmethod
    def contract(state_dir: str) -> dict:
        """The drawing contract recorded at ``state_dir`` (for consumers —
        the ``ratio`` is what every 1/p estimator must scale by)."""
        with open(os.path.join(state_dir, "_contract.json")) as fh:
            return json.load(fh)

    def coin(self, df: DataFrame) -> DataFrame:
        """The sink's keyed Bernoulli draw applied to ANY frame — shared by
        the per-batch write and tests/backfills, so the streamed scramble
        is row-identical to this filter over the concatenated batches."""
        from pyspark.sql import functions as F

        from sketchlib.spark.sampling import _HASH_MOD

        h = F.pmod(F.xxhash64(F.col(self.id_col), F.lit(self.seed)), F.lit(_HASH_MOD))
        return df.filter(h < int(self.ratio * _HASH_MOD))

    def sample(self, spark: SparkSession) -> DataFrame | None:
        """All scramble rows drawn so far (None before the first batch) —
        feed to ``approx_agg_from_uniform_sample(..., ratio=contract['ratio'])``."""
        import glob as _glob

        dirs = sorted(_glob.glob(os.path.join(self.state_dir, "b*")))
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(self.state_dir, f"b{batch_id:010d}")
        # replay-safe: same batch id -> same dir, and the keyed coin re-draws
        # the identical rows, so the overwrite is byte-equivalent
        self.coin(batch_df).write.mode("overwrite").parquet(out)
