"""Measured scale evidence for the bloom-prefiltered decontamination
fallback (round 5 continuation).

Above the eval broadcast gate, contamination_pairs used to shuffle EVERY
corpus shingle (hash, id) row; the fallback now bloom-prefilters the
corpus side map-side first. This harness measures, at bench scale on the
same cached sequences tables bench.py uses, all three routes:

- broadcast        (the default under-gate path, the reference point),
- prefilter+shuffle (broadcast_threshold=0, the new over-gate default),
- plain shuffle     (broadcast_threshold=0, prefilter_fpr=None — what the
                     over-gate path used to be),

asserts all three produce IDENTICAL pair sets, and reports wall seconds
plus the prefilter's measured selectivity (surviving corpus shingle rows
/ total). Writes BENCH/decon_prefilter.json and prints one JSON line.

Wall-time caveat: on a single-JVM local cluster the shuffle has no
network/disk price, so the decision variable at 100 TB is SHUFFLE INPUT
ROWS (reported, 650× reduction), not local wall — the prefilter only has
to not LOSE wall locally (measured: parity-to-faster run-to-run).

REJECTED VARIANT (measured 2026-08-18, committed here so it isn't
re-tried): a "packed" array-level prefilter — bloom-filter each doc's
shingle ARRAY in one Arrow kernel and explode only survivors JVM-side,
saving the per-shingle id duplication and row framing. Measured 164 s vs
41 s row-level / 57 s plain shuffle on this harness's default sizes: the
packed frame ships array<bigint> rows through Spark's JVM->Arrow
re-encode, the same known-slow path the pyarrow-direct scan exists to
avoid (~11 s/core for array columns, BENCH/DESIGN_100TB), and that
swamps the row-framing saving. Row-level rows are flat longs, which the
bridge encodes fast. Keep the prefilter row-level.
Usage: python BENCH/decon_prefilter.py [corpus_rows] [eval_docs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketchlib.data.gen import write_sequences  # noqa: E402


def seq_table(n_rows: int, seed: int = 42) -> str:
    suffix = "" if seed == 42 else f"_s{seed}"
    d = f"/tmp/sketchlib_bench/seq_n{n_rows}{suffix}"
    if not os.path.isdir(d):
        write_sequences(d, n_rows, seed=seed)
    return d


def main() -> None:
    corpus_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    eval_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000

    from pyspark.sql import functions as F

    from sketchlib.spark import get_spark
    from sketchlib.spark.dedup import (
        _bloom_params,
        _bloom_prefilter,
        _eval_hash_bloom,
        contamination_pairs,
        with_token_ngrams,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("decon-prefilter-scale", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        train = spark.read.parquet(seq_table(corpus_rows)).select("doc_id", "tokens")
        # eval set: 40% true leaks (40-token slices of corpus docs), 60%
        # fresh docs from an independent seed — the fresh majority is what
        # the prefilter should discard map-side
        n_leak = eval_docs * 2 // 5
        leaks = [
            (f"leak_{r['doc_id']}", [int(t) for t in r["tokens"][10:50]])
            for r in train.limit(n_leak).collect()
        ]
        fresh = (
            spark.read.parquet(seq_table(eval_docs - n_leak, seed=7))
            .select(
                F.concat(F.lit("fresh_"), F.col("doc_id")).alias("doc_id"),
                F.slice("tokens", 1, 60).alias("tokens"),
            )
        )
        eval_df = spark.createDataFrame(
            leaks, "doc_id string, tokens array<int>"
        ).unionByName(fresh).localCheckpoint()
        n_eval = eval_df.count()

        def run(name, **kw):
            t0 = time.time()
            pairs = contamination_pairs(
                train, eval_df, n=8, min_shared=3, **kw
            ).collect()
            dt = time.time() - t0
            return dt, {(r["train_id"], r["eval_id"], r["n_shared"]) for r in pairs}

        t_bc, p_bc = run("broadcast")
        t_pf, p_pf = run("prefilter", broadcast_threshold=0)
        t_sh, p_sh = run("shuffle", broadcast_threshold=0, prefilter_fpr=None)
        assert p_bc == p_pf == p_sh, (
            f"route results differ: bc={len(p_bc)} pf={len(p_pf)} sh={len(p_sh)}"
        )

        # measured selectivity of the prefilter pass itself
        t = with_token_ngrams(train, "tokens", n=8, out="_sh", element_cast="BIGINT").select(
            F.col("doc_id").alias("train_id"), F.explode("_sh").alias("h")
        )
        e = (
            with_token_ngrams(eval_df, "tokens", n=8, out="_sh", element_cast="BIGINT")
            .select(F.col("doc_id").alias("eval_id"), F.explode("_sh").alias("h"))
            .distinct()
            .localCheckpoint()
        )
        n_eval_rows = e.count()
        total = t.count()
        bl = _eval_hash_bloom(e, _bloom_params(n_eval_rows, 1e-3))
        survivors = _bloom_prefilter(t, bl).count()

        out = {
            "corpus_docs": corpus_rows,
            "eval_docs": n_eval,
            "n_pairs": len(p_bc),
            "broadcast_sec": round(t_bc, 2),
            "prefilter_shuffle_sec": round(t_pf, 2),
            "plain_shuffle_sec": round(t_sh, 2),
            # measured 2026-08-18; see module docstring (REJECTED VARIANT)
            "rejected_packed_variant_sec": 164.4,
            "identical_pair_sets": True,
            "corpus_shingle_rows": total,
            "eval_distinct_shingles": n_eval_rows,
            "prefilter_survivor_rows": survivors,
            "prefilter_selectivity": round(survivors / total, 6),
            "cpus": int(cpus),
        }
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "decon_prefilter.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
