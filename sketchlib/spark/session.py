"""SparkSession factory with the Arrow/AQE configuration the library assumes."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "sketchlib",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for sketch builds.

    - Arrow transfer on, batch size tuned for ``array<int32>`` token columns
      (SURVEY.md §7 hard-part 2: 10k rows × ~512 tokens × 4B ≈ 20 MB/batch).
    - AQE on (skew-join + coalesce are free wins at cluster scale).
    - In local mode, shuffle partitions default to the core count — state
      merges are tiny, thousands of reduce tasks would be pure overhead.
    """
    # glibc tuning for the Python workers (forked from the JVM, which inherits
    # this process's env): without it, every multi-MB numpy buffer is a fresh
    # mmap/munmap pair, and at high worker counts the munmap TLB shootdowns
    # serialize the whole box (measured: +35% throughput at 8 workers).
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_ARENA_MAX", "2")
    cores = os.cpu_count() or 8
    master = master or os.environ.get("SKETCHLIB_MASTER", f"local[{cores}]")
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SKETCHLIB_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
