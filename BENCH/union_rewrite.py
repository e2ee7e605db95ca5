"""Measured shuffle-elision evidence for the UNION → UNION ALL rewrite.

sql.py's `_union_all_rewrite` turns a depth-0 UNION inside a derived table
into UNION ALL when every outer aggregate is APPROX_COUNT_DISTINCT (dedup
cannot change a column's distinct-value set). What that buys at scale: the
UNION-distinct is a full shuffle of BOTH sides' rows before the sketch scan
ever starts — at 100 TB, the single largest exchange in the plan — while
UNION ALL feeds the zero-shuffle sketch build directly.

This harness measures the same grouped statement (a shape the b35
state-merge route declines) with the rewrite ON vs monkeypatched OFF,
interleaved A/B at two input sizes, in the HIGH-CARDINALITY regime (keys
~unique per row — the regime where approximation is used at all; when the
key space is tiny, map-side partial aggregation collapses the distinct's
exchange to ~|keys| rows per task and the rewrite is ~neutral). Asserts the
two paths' estimates are identical, reports medians and the elided-exchange
slope. Writes BENCH/union_rewrite.json and prints one JSON line.

Usage: python BENCH/union_rewrite.py [rows_per_side] [reps]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


STMT = (
    "SELECT APPROX_COUNT_DISTINCT(k) AS d_k FROM "
    "(SELECT k, grp FROM side_a UNION SELECT k, grp FROM side_b) "
    "GROUP BY grp"
)


def run_once(spark, tables, rewrite_on: bool) -> tuple[float, list]:
    import sketchlib.sql as S

    orig = S._union_all_rewrite
    if not rewrite_on:
        S._union_all_rewrite = lambda head, inner: None
    try:
        t0 = time.perf_counter()
        rows = S.approx_sql(spark, STMT, tables=tables).collect()
        dt = time.perf_counter() - t0
    finally:
        S._union_all_rewrite = orig
    ests = sorted((r["group"], r["d_k"]) for r in rows)
    return dt, ests


def measure(spark, n_rows: int, reps: int) -> dict:
    from pyspark.sql import functions as F

    # High-cardinality sides with ~12.5% cross-side overlap: k unique per
    # row within a side, grp is an 8-way group key. The distinct therefore
    # shuffles ~2*n_rows rows (partial agg cannot collapse unique keys).
    a = (spark.range(n_rows)
         .select(F.col("id").alias("k"), (F.col("id") % 8).cast("string").alias("grp")))
    b = (spark.range(n_rows)
         .select((F.col("id") + int(n_rows * 0.875)).alias("k"),
                 (F.col("id") % 8).cast("string").alias("grp")))
    a = a.persist(); b = b.persist()
    a.count(); b.count()  # materialize inputs outside the timed region
    tables = {"side_a": a, "side_b": b}

    on, off = [], []
    base = None
    for i in range(reps):
        for flag, bucket in ((True, on), (False, off)):  # interleaved A/B
            dt, ests = run_once(spark, tables, flag)
            if base is None:
                base = ests
            assert ests == base, f"rewrite changed the answer: {ests} vs {base}"
            bucket.append(dt)
    a.unpersist(); b.unpersist()
    m_on, m_off = statistics.median(on), statistics.median(off)
    return {
        "rows_per_side": n_rows,
        "rewrite_on_s": round(m_on, 3),
        "rewrite_off_s": round(m_off, 3),
        "speedup": round(m_off / m_on, 3),
        "runs_on": [round(x, 3) for x in on],
        "runs_off": [round(x, 3) for x in off],
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_800_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from sketchlib.spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("union-rewrite-ab", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        sizes = [n // 4, n]  # two sizes -> the elided exchange's slope
        out = {"statement": STMT, "reps_per_arm": reps,
               "points": [measure(spark, s, reps) for s in sizes]}
    finally:
        spark.stop()
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "union_rewrite.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
