"""Measured scale evidence for cap_per_group (round 5 continuation).

The naive per-group cap (`row_number() OVER (PARTITION BY grp ...) <= cap`
over the whole corpus) exchanges EVERY row: Spark 4's WindowGroupLimit
reduces over-cap groups map-side, but under-cap groups — the long Zipf
tail, i.e. almost every domain — forward all their rows through the
shuffle anyway just to be counted and kept. cap_per_group splits first:
a counts pass + broadcast join passes under-cap rows through with ZERO
exchange, and only over-cap rows enter the window.

This harness builds a Zipf-shaped corpus (one hot group holding ~30% of
rows + a 70-row tail of cold groups), runs both plans, asserts the kept
sets are IDENTICAL, and reports wall seconds plus the rows that entered
each plan's exchange (the 100 TB decision variable — local single-JVM
shuffles have no network price, so wall parity here is expected; the
shuffle-rows column is what multiplies by 1000 executors).

Writes BENCH/cap_scale.json and prints one JSON line.
Usage: python BENCH/cap_scale.py [n_rows] [cap]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sketchlib.spark import get_spark
    from sketchlib.spark.sampling import cap_per_group

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("cap-scale", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        d = "/tmp/sketchlib_bench/capscale_n%d" % n_rows
        if not os.path.isdir(d):
            # ~30% of rows in group 'hot'; the rest spread 70/group (under
            # cap). The ~256-char low-compressibility payload is the point:
            # a cap operates on DOCUMENTS, and what the naive window
            # shuffles is the document text, not 3 scalar columns.
            (
                spark.range(n_rows)
                .select(
                    F.col("id").alias("doc_id"),
                    F.when(F.col("id") % 10 < 3, F.lit("hot"))
                    .otherwise(F.concat(F.lit("g"), (F.xxhash64("id") % (n_rows // 100)).cast("string")))
                    .alias("grp"),
                    (F.xxhash64("id", F.lit(1)) % 100000).cast("double").alias("score"),
                    F.concat(*[
                        F.sha2(F.concat(F.col("id").cast("string"), F.lit(f":{i}")), 256)
                        for i in range(4)
                    ]).alias("text"),
                )
                .write.parquet(d)
            )
        df = spark.read.parquet(d)
        n_hot = df.filter(F.col("grp") == "hot").count()
        df.count()  # warm scan + codegen before any timed arm

        def kept_set(out):
            return out.agg(
                F.count(F.lit(1)).alias("n"),
                # decimal sum: 2M int64 hashes overflow a BIGINT accumulator
                F.sum(F.xxhash64("doc_id", "text").cast("decimal(38,0)")).alias("sig"),
            ).collect()[0]

        w = Window.partitionBy("grp").orderBy(F.desc_nulls_last("score"), F.asc("doc_id"))

        def run_ours():
            return kept_set(cap_per_group(df, cap, group_col="grp", score_col="score"))

        def run_naive():
            return kept_set(
                df.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= cap).drop("_r")
            )

        # interleaved A/B (host-noise lesson): alternate arms, keep the min
        t_ours, t_naive = [], []
        for _ in range(2):
            t0 = time.time(); naive = run_naive(); t_naive.append(time.time() - t0)
            t0 = time.time(); ours = run_ours(); t_ours.append(time.time() - t0)
        assert tuple(ours) == tuple(naive), (ours, naive)
        t_ours, t_naive = min(t_ours), min(t_naive)

        # exchange input rows: naive shuffles every row (WindowGroupLimit
        # only trims groups ALREADY over cap within a task — the cold tail
        # passes through whole); ours exchanges only the over-cap groups'
        # rows (here: the hot group), post the same map-side trim
        out = {
            "n_rows": n_rows,
            "cap": cap,
            "hot_rows": n_hot,
            "kept_rows": int(ours["n"]),
            "identical_kept_sets": True,
            "cap_per_group_sec": round(t_ours, 2),
            "naive_window_sec": round(t_naive, 2),
            "naive_exchange_rows_upper": n_rows,
            "ours_exchange_rows_upper": n_hot,
            "exchange_reduction": round(n_rows / max(1, n_hot), 2),
            "cpus": int(cpus),
        }
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "cap_scale.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
