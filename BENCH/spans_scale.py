"""Measured scale evidence for duplicate_spans (D27) + cut (D28).

The DESIGN_100TB §5b claim under test: SINGLETON PRUNING is the
load-bearing step — only shingle hashes seen >= 2x enter the self-join,
so the join input collapses from corpus shingles to the duplicated
minority. This measures, at two corpus sizes on the same host:

- corpus shingles vs duplicated-shingle join input (the reduction ratio),
- wall time for the full detect pass (and the cut pass at the small size),
- size-growth ratio of wall time vs size-growth ratio of input (linearity
  check: a quadratic pair blow-up would show wall growing ~x4 at x2 input).

Synthetic corpus: docs of ~120 random tokens from a large vocab (so base
shingles are almost all singletons) + an injected 40-token block shared by
1% of docs in groups of 4 (so duplicated shingles stay a small minority,
like a real crawl). Deterministic seed. Writes BENCH/spans_scale.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def make_docs(spark, n_docs: int, seed: int):
    import numpy as np

    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 5_000_000, size=(n_docs, 120), dtype=np.int64)
    # ~1% of docs (the first 4 of every 400) share a 40-token verbatim block
    n_groups = max(1, n_docs // 400)
    blocks = rng.integers(5_000_000, 6_000_000, size=(n_groups, 40), dtype=np.int64)
    docs = []
    for i in range(n_docs):
        toks = base[i].tolist()
        if i % 400 < 4:
            toks = toks[:60] + blocks[(i // 400) % n_groups].tolist() + toks[60:]
        docs.append((i, toks))
    return spark.createDataFrame(docs, "doc_id long, tokens array<bigint>")


def main():
    from pyspark.sql import functions as F

    from sketchlib.spark.dedup import (
        cut_duplicate_spans,
        duplicate_spans,
        with_token_ngrams,
    )
    from sketchlib.spark.session import get_spark

    spark = get_spark(
        "spans-scale", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {"cpus": int(CPUS), "sizes": {}}
    for n_docs in (20_000, 100_000):
        df = make_docs(spark, n_docs, seed=7).repartition(int(CPUS)).cache()
        df.count()
        s = with_token_ngrams(df, "tokens", n=8, out="_sh", element_cast="BIGINT").select(
            F.posexplode("_sh").alias("_pos", "h")
        )
        total = s.count()
        dup_rows = (
            s.groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 2)
            .agg(F.sum("c"))
            .collect()[0][0]
            or 0
        )
        t0 = time.perf_counter()
        spans = duplicate_spans(df, n=8, min_span_tokens=24)
        n_pairs = spans.count()
        detect_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        cut = cut_duplicate_spans(df, spans)
        n_cut_docs = cut.filter(F.col("n_cut_tokens") > 0).count()
        cut_s = time.perf_counter() - t0
        out["sizes"][str(n_docs)] = {
            "corpus_shingles": int(total),
            "join_input_shingles": int(dup_rows),
            "join_input_fraction": round(dup_rows / total, 5),
            "pairs_found": int(n_pairs),
            "docs_cut": int(n_cut_docs),
            "detect_sec": round(detect_s, 2),
            "cut_sec": round(cut_s, 2),
        }
        df.unpersist()
    a = out["sizes"]["20000"]
    b = out["sizes"]["100000"]
    out["wall_growth_vs_input_growth"] = {
        "input_ratio": round(
            b["corpus_shingles"] / a["corpus_shingles"], 2
        ),
        "detect_wall_ratio": round(b["detect_sec"] / a["detect_sec"], 2),
    }
    with open(os.path.join(REPO, "BENCH", "spans_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
