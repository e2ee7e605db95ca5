"""Measured scale evidence for incremental delta dedup (round 5).

The daily operation DESIGN_100TB's incremental-dedup section argues for:
a delta deduped against a PERSISTED corpus signature table. This harness
measures it at bench scale — corpus signatures over the 1M-row sequences
table (same generator/cache as bench.py), a 100k-doc delta (half injected
corpus copies, half fresh) — on BOTH gate paths:

- broadcast (the default: delta bands broadcast, corpus map-side probed),
- shuffle fallback (broadcast_threshold=0 — what a 100 GB delta takes),

and asserts the two keep IDENTICAL sets while reporting wall seconds and
docs/sec for each. Writes BENCH/dedup_delta_scale.json and prints one JSON
line. Usage: python BENCH/dedup_delta_scale.py [corpus_rows] [delta_rows]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketchlib.data.gen import write_sequences  # noqa: E402


def seq_table(n_rows: int, seed: int = 42) -> str:
    # seed in the cache key for non-default seeds — bench.py's seed-42
    # tables share the plain name, and the generator is counter-based, so
    # a seed-collision here would silently hand back rows byte-identical
    # to the corpus prefix (every "fresh" doc then really IS a duplicate)
    suffix = "" if seed == 42 else f"_s{seed}"
    d = f"/tmp/sketchlib_bench/seq_n{n_rows}{suffix}"
    if not os.path.isdir(d):
        write_sequences(d, n_rows, seed=seed)
    return d


def main() -> None:
    corpus_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    delta_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark.sql import functions as F

    from sketchlib.spark import get_spark
    from sketchlib.spark.dedup import dedup_delta, minhash_signatures, with_token_ngrams

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("dedup-delta-scale", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # sign over 3-gram SHINGLES, not raw tokens: the generator's tokens
        # are Zipf(1.1) over a 50k vocab, so any two long docs share most
        # of their DISTINCT unigrams (set-Jaccard ~1) — unigram MinHash
        # would call every doc a near-dup of every other. Shingling is the
        # production semantic (c10's n-gram dedup path) and what a real
        # corpus pipeline signs.
        corpus = with_token_ngrams(
            spark.read.parquet(seq_table(corpus_rows)), "tokens", n=3, out="sh",
            element_cast="BIGINT",
        )
        t0 = time.time()
        sigs = minhash_signatures(corpus, "sh", "doc_id", r=128, n_bands=32)
        sigs = sigs.localCheckpoint()
        n_corpus = sigs.count()
        sign_sec = round(time.time() - t0, 2)

        half = delta_rows // 2
        fresh = with_token_ngrams(
            spark.read.parquet(seq_table(delta_rows, seed=43)).limit(half),
            "tokens", n=3, out="sh", element_cast="BIGINT",
        )
        fresh = fresh.withColumn("doc_id", F.concat(F.lit("new_"), F.col("doc_id")))
        copies = corpus.limit(delta_rows - half).withColumn(
            "doc_id", F.concat(F.lit("dup_"), F.col("doc_id"))
        )
        delta = fresh.unionByName(copies).localCheckpoint()
        n_delta = delta.count()

        results = {}
        kept_sets = {}
        for label, thr in (("broadcast", 100_000_000), ("shuffle_fallback", 0)):
            t1 = time.time()
            kept, _ = dedup_delta(delta, sigs, tokens_col="sh",
                                 threshold=0.9, broadcast_threshold=thr)
            ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
            dt = round(time.time() - t1, 2)
            results[label] = {
                "seconds": dt,
                "delta_docs_per_sec": round(n_delta / dt, 1),
                "kept": len(ids),
            }
            kept_sets[label] = ids

        identical = kept_sets["broadcast"] == kept_sets["shuffle_fallback"]
        fresh_kept = sum(1 for i in kept_sets["broadcast"] if i.startswith("new_"))
        dup_survivors = sum(
            1 for i in kept_sets["broadcast"] if i.startswith("dup_")
        )
        out = {
            "corpus_docs": n_corpus,
            "corpus_sign_seconds": sign_sec,
            "delta_docs": n_delta,
            "paths": results,
            "kept_sets_identical": identical,
            "fresh_docs_kept": fresh_kept,
            "injected_copy_survivors": dup_survivors,
        }
        line = json.dumps(out)
        print(line)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "dedup_delta_scale.json"), "w") as f:
            f.write(line + "\n")
        if not identical or dup_survivors:
            sys.exit(1)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
