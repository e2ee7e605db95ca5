"""Per-partition checkpoint / resume / lineage (SURVEY.md B10).

Layout under ``ckpt_dir``::

    _run.json                    run manifest: n_partitions, specs, read conf
    states/part-00042.parquet    committed partial states of partition 42
    lineage/part-00042.json      lineage: rows, tokens, wall_ms, input files
    tmp/...                      in-progress writes (ignored)

Commit protocol: a partition is committed iff ``states/part-NNNNN.parquet``
exists; the file appears only via atomic ``os.replace`` from ``tmp/``, so a
task killed mid-write leaves no partial commit, and task retries are
idempotent (the replace is last-writer-wins with identical content — the
update kernels are deterministic functions of the partition's rows).

Resume: partitions already committed are skipped WITHOUT consuming their
input iterator — the Python worker never pulls those Arrow batches, so the
scan work for completed partitions is short-circuited. Determinism caveat
(documented in SURVEY.md §3.2): resume requires the same input files and the
same read configuration so Spark produces the identical partition split; the
run manifest records both and ``resume`` validates them before proceeding.

The final merge always reads the checkpoint directory — so a clean run and a
crash+resume run merge EXACTLY the same state files in the same canonical
order, giving byte-identical final states (FIXTURES.md F4 asserts this).

On a real cluster ``ckpt_dir`` must be on storage reachable from executors
(HDFS/NFS/object store via a mounted path); in local mode any directory works.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.taskcontext import TaskContext

from sketchlib.spark.build import (
    STATE_FIELDS,
    _ARROW_STATE_SCHEMA,
    SketchSpec,
    _make_update_fn,
    merge_states,
)

_FAIL_ENV = "SKETCHLIB_FAIL_PARTS"  # test hook: comma-separated part ids to crash


def committed_parts(ckpt_dir: str) -> set[int]:
    sdir = os.path.join(ckpt_dir, "states")
    if not os.path.isdir(sdir):
        return set()
    out = set()
    for f in os.listdir(sdir):
        if f.startswith("part-") and f.endswith(".parquet"):
            out.add(int(f[5:-8]))
    return out


def _ckpt_update_fn(
    specs: list[SketchSpec],
    group_by: str | None,
    ckpt_dir: str,
    done: frozenset[int],
    fail_parts: frozenset[int] = frozenset(),
):
    inner = _make_update_fn(specs, group_by)

    def update(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        if pid in done:
            return  # skip without consuming input -> scan short-circuited
        if pid in fail_parts:
            raise RuntimeError(f"injected failure in partition {pid}")

        t0 = time.perf_counter()
        files: set[str] = set()

        def strip(bs: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for b in bs:
                i = b.schema.get_field_index("_file")
                if i >= 0:
                    files.update(pa.compute.unique(b.column(i)).to_pylist())
                    b = b.drop_columns(["_file"])
                yield b

        out = list(inner(strip(batches)))
        table = (
            pa.Table.from_batches(out)
            if out
            else pa.Table.from_batches([], schema=_ARROW_STATE_SCHEMA)
        )

        os.makedirs(os.path.join(ckpt_dir, "tmp"), exist_ok=True)
        os.makedirs(os.path.join(ckpt_dir, "states"), exist_ok=True)
        os.makedirs(os.path.join(ckpt_dir, "lineage"), exist_ok=True)
        name = f"part-{pid:05d}"
        lineage = {
            "part_id": pid,
            "rows": 0,
            "tokens": 0,
            "n_states": table.num_rows,
            "wall_ms": (time.perf_counter() - t0) * 1000.0,
            "input_files": sorted(files),
        }
        # rows/tokens per partition: take per-group values once (they repeat per sketch)
        if table.num_rows:
            seen = {}
            for g, r, tk in zip(
                table.column("group").to_pylist(),
                table.column("rows").to_pylist(),
                table.column("tokens").to_pylist(),
            ):
                seen[g] = (r, tk)
            lineage["rows"] = int(sum(v[0] for v in seen.values()))
            lineage["tokens"] = int(sum(v[1] for v in seen.values()))

        tmp_state = os.path.join(ckpt_dir, "tmp", name + ".parquet")
        pq.write_table(table, tmp_state)
        with open(os.path.join(ckpt_dir, "tmp", name + ".json"), "w") as fh:
            json.dump(lineage, fh)
        os.replace(
            os.path.join(ckpt_dir, "tmp", name + ".json"),
            os.path.join(ckpt_dir, "lineage", name + ".json"),
        )
        os.replace(tmp_state, os.path.join(ckpt_dir, "states", name + ".parquet"))
        return
        yield  # pragma: no cover — makes this a generator

    return update


def build_with_checkpoint(
    df: DataFrame,
    specs: list[SketchSpec],
    ckpt_dir: str,
    group_by: str | None = "source",
    fanout: int | None = None,
) -> DataFrame:
    """Checkpointed build: returns merged states (one row per group × sketch).

    Re-invoking after a failure resumes: committed partitions are skipped and
    the merge re-reads ALL committed state files, so the result is identical
    to an uninterrupted run.
    """
    spark = df.sparkSession
    cols = sorted({s.column for s in specs} | ({group_by} if group_by else set()))
    narrow = df.select(*cols).withColumn("_file", F.input_file_name())
    n_parts = narrow.rdd.getNumPartitions()

    os.makedirs(ckpt_dir, exist_ok=True)
    run_meta = {
        "n_partitions": n_parts,
        "group_by": group_by,
        "specs": [{"name": s.name, "kind": s.kind, "column": s.column, "params": s.params} for s in specs],
        "max_partition_bytes": spark.conf.get("spark.sql.files.maxPartitionBytes", ""),
    }
    run_path = os.path.join(ckpt_dir, "_run.json")
    if os.path.exists(run_path):
        with open(run_path) as fh:
            prev = json.load(fh)
        if prev != run_meta:
            raise ValueError(
                f"checkpoint dir {ckpt_dir} was created by a different job/configuration; "
                f"resume requires identical input partitioning: {prev} != {run_meta}"
            )
    else:
        with open(run_path, "w") as fh:
            json.dump(run_meta, fh)

    done = frozenset(committed_parts(ckpt_dir))
    if len(done) < n_parts:
        # failure-injection test hook, captured DRIVER-side (executor Python
        # workers are long-lived and never see driver os.environ mutations)
        fail_parts = frozenset(
            int(x) for x in os.environ.get(_FAIL_ENV, "").split(",") if x
        )
        fn = _ckpt_update_fn(specs, group_by, ckpt_dir, done, fail_parts)
        # side-effect job: states land in ckpt_dir, the returned rows are unused
        narrow.mapInArrow(fn, STATE_FIELDS).write.format("noop").mode("overwrite").save()

    states = spark.read.schema(STATE_FIELDS).parquet(os.path.join(ckpt_dir, "states"))
    return merge_states(states, fanout=fanout)


def lineage_df(spark: SparkSession, ckpt_dir: str) -> DataFrame:
    """Lineage table: one row per partition with rows/tokens/wall_ms/files."""
    ldir = os.path.join(ckpt_dir, "lineage")
    recs = []
    for f in sorted(os.listdir(ldir)):
        if f.endswith(".json"):
            with open(os.path.join(ldir, f)) as fh:
                recs.append(json.load(fh))
    return spark.createDataFrame(
        [
            (r["part_id"], r["rows"], r["tokens"], r["wall_ms"], r["n_states"], r["input_files"])
            for r in recs
        ],
        "part_id int, rows long, tokens long, wall_ms double, n_states int, input_files array<string>",
    )


def throughput_metrics(spark: SparkSession, ckpt_dir: str) -> dict:
    """Aggregate sketch-update throughput from lineage (BASELINE metric)."""
    pdf = lineage_df(spark, ckpt_dir).toPandas()
    total_ms = float(pdf["wall_ms"].sum())
    return {
        "partitions": int(len(pdf)),
        "rows": int(pdf["rows"].sum()),
        "tokens": int(pdf["tokens"].sum()),
        "cpu_seconds": total_ms / 1000.0,
        "tokens_per_cpu_sec": (float(pdf["tokens"].sum()) / (total_ms / 1000.0)) if total_ms else 0.0,
    }
