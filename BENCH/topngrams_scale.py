"""Measured scale evidence for top_ngrams' two plans (round 5 cont., D31).

The default plan groups by the GRAM ARRAY itself — shuffle keys are
n×4-8 B elements plus array offsets per distinct gram. ``by_hash=True``
counts by the 8-byte xxhash64 of the gram first and recounts only the
k·factor candidate grams exactly, so the wide aggregation's shuffle keys
shrink to fixed 8 B. Locally the wall difference is small (single-JVM
shuffles don't pay a network); the decision variable for 1000 executors is
SHUFFLE BYTES WRITTEN, which this harness reads from the executed plan's
Exchange metrics for both arms and reports alongside wall seconds and a
result-identity assertion.

Writes BENCH/topngrams_scale.json and prints one JSON line.
Usage: python BENCH/topngrams_scale.py [n_rows]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def exchange_metrics(df) -> dict:
    """Sum shuffle bytes/records written across every Exchange in the
    EXECUTED plan (AQE/query-stage wrappers unwrapped)."""
    tot = {"shuffleBytesWritten": 0, "shuffleRecordsWritten": 0, "n_exchanges": 0}

    def walk(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
            return
        if name == "Exchange":
            it = node.metrics().iterator()
            ms = {}
            while it.hasNext():
                kv = it.next()
                ms[kv._1()] = kv._2().value()
            tot["shuffleBytesWritten"] += int(ms.get("shuffleBytesWritten", 0))
            tot["shuffleRecordsWritten"] += int(ms.get("shuffleRecordsWritten", 0))
            tot["n_exchanges"] += 1
        ch = node.children().iterator()
        while ch.hasNext():
            walk(ch.next())

    walk(df._jdf.queryExecution().executedPlan())
    return tot


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    gram_ns = [int(x) for x in sys.argv[2:]] or [3, 8]

    from sketchlib.data.gen import write_sequences
    from sketchlib.spark import get_spark
    from sketchlib.spark.text import top_ngrams

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("topngrams-scale", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        d = "/tmp/sketchlib_bench/ngrams_n%d" % n_rows
        if not os.path.isdir(d):
            write_sequences(d, n_rows)
        df = spark.read.parquet(d).select("tokens")
        df.count()  # warm scan/codegen outside the timed arms

        def run(gram_n: int, by_hash: bool):
            out = top_ngrams(df, "tokens", n=gram_n, k=20, by_hash=by_hash)
            t0 = time.time()
            rows = [(tuple(r["ngram"]), r["cnt"]) for r in out.collect()]
            wall = time.time() - t0
            return rows, wall, exchange_metrics(out)

        per_n = {}
        for gram_n in gram_ns:
            # interleaved A/B, keep the min wall per arm (host-noise lesson)
            walls = {"default": [], "by_hash": []}
            for _ in range(2):
                r_def, w, m_def = run(gram_n, False)
                walls["default"].append(w)
                r_hash, w, m_hash = run(gram_n, True)
                walls["by_hash"].append(w)
            assert r_def == r_hash, "the two plans must return identical top-k"
            per_n[str(gram_n)] = {
                "top20_identical": True,
                "default_sec": round(min(walls["default"]), 2),
                "by_hash_sec": round(min(walls["by_hash"]), 2),
                "default_shuffle_bytes": m_def["shuffleBytesWritten"],
                "by_hash_shuffle_bytes": m_hash["shuffleBytesWritten"],
                "default_shuffle_records": m_def["shuffleRecordsWritten"],
                "by_hash_shuffle_records": m_hash["shuffleRecordsWritten"],
                "shuffle_bytes_reduction": round(
                    m_def["shuffleBytesWritten"] / max(1, m_hash["shuffleBytesWritten"]), 2
                ),
            }

        out = {"n_rows": n_rows, "per_gram_n": per_n, "cpus": int(cpus)}
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "topngrams_scale.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
