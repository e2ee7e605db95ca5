"""Run ONLY the headline queries against an arbitrary sf dir (bench.py's
session conf + methodology, minus the seq-table flagship blocks), printing
per-query times. Used with BENCH/make_sf_replica.py output to validate
driver-scale behavior (probe caps, fast-path routing) that the local
testdata sfs cannot exercise.

    python BENCH/headline_sf.py /tmp/sketchlib_bench/sf1.0 [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sketchlib.spark import get_spark

HEADLINE = [
    "a08_join_broadcast",
    "a09_groupby_agg",
    "a14_topk_orderby_limit",
    "b01_hll_distinct_docs",
    "b03_cm_topk_tokens",
    "b04_kll_price_quantiles",
    "c01_exact_dedup",
]


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "sketchlib-headline-sf",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 << 20)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).summary().collect()

    queries = entrymod.queries()
    for name in HEADLINE:  # untimed warm pass (bench.py methodology)
        queries[name](spark, sf_dir).collect()
    times: dict[str, float] = {}
    samples: dict[str, list] = {n: [] for n in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            sec = round(time.perf_counter() - t0, 3)
            samples[name].append(sec)
            times[name] = min(times.get(name, sec), sec)
    print(json.dumps({"sf_dir": sf_dir, "best": times, "total_best": round(sum(times.values()), 3),
                      "samples": samples}))


if __name__ == "__main__":
    main()
