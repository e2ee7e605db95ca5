"""spark-submit entry points (SURVEY.md §3.2, BASELINE north_rule:
"launched via spark-submit --py-files").

Usage (local example; on a cluster add --master/--deploy-mode and ship the
package with --py-files sketchlib.zip):

    spark-submit sketchlib/cli.py build \
        --input /data/sequences --group-by source \
        --sketches hll_doc:hll:doc_id hll_tok:hll:tokens cm_tok:cm:tokens \
        --out /data/sketch_states --checkpoint /data/ckpt/run1

    spark-submit sketchlib/cli.py query \
        --states /data/sketch_states --sketch hll_doc

    spark-submit sketchlib/cli.py lineage --checkpoint /data/ckpt/run1

    spark-submit sketchlib/cli.py dedup-delta \
        --input /data/crawl_drop --catalog /data/cat --signatures corpus \
        --out /data/crawl_drop_deduped --threshold 0.9

    spark-submit sketchlib/cli.py decontaminate \
        --train /data/corpus --eval /data/benchmarks \
        --out /data/corpus_clean --min-span-tokens 50 \
        --report-out /data/contamination_report

``build`` with --checkpoint is resumable: re-running the same command after
a failure skips committed chunks and produces byte-identical states.
``dedup-delta`` is the daily incremental-dedup operation as one command:
the signing contract comes from the catalog registration (a conflicting
seed is impossible), kept rows are written, and the kept signatures are
appended so replaying the same delta keeps nothing.
"""

from __future__ import annotations

import argparse
import json
import sys


def _json_line(row: dict) -> str:
    """One strict-JSON line for a result row: pandas surfaces SQL NULLs in
    float columns as NaN, and ``json.dumps`` would emit the bare token
    ``NaN`` — invalid JSON that jq and any strict parser reject, breaking
    the one-JSON-line-per-row contract. Map non-finite floats back to
    null; everything non-JSON-native falls back to str. Recurses into
    dicts/lists so nested summaries (profile's per-group card) keep the
    same strict-JSON contract."""
    import math

    def clean(v):
        if isinstance(v, float) and not math.isfinite(v):
            return None
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [clean(x) for x in v]
        return v

    return json.dumps(clean(row), default=str)


def _parse_sketch(s: str):
    from sketchlib.spark.build import SketchSpec

    parts = s.split(":", 3)  # JSON params may themselves contain colons
    if len(parts) < 3:
        raise argparse.ArgumentTypeError(f"sketch spec must be name:kind:column[:json_params], got {s!r}")
    name, kind, column = parts[:3]
    params = json.loads(parts[3]) if len(parts) > 3 else {}
    return SketchSpec(name, kind, column, params)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sketchlib")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="one-pass sketch build over a parquet table")
    b.add_argument("--input", required=True, help="parquet directory (hive-partitioned ok)")
    b.add_argument("--group-by", default="source")
    b.add_argument("--sketches", nargs="+", type=_parse_sketch, required=True,
                   help="name:kind:column[:json_params], kinds: hll cm mg kll tdigest dd bloom minhash kmv fd")
    b.add_argument("--out", required=True, help="output dir for the merged state table")
    b.add_argument("--checkpoint", default=None, help="checkpoint dir (enables resume)")
    b.add_argument("--fanout", type=int, default=None, help="two-level merge fanout")

    q = sub.add_parser("query", help="estimates from a persisted state table")
    q.add_argument("--states", required=True)
    q.add_argument("--sketch", required=True)
    q.add_argument(
        "--kind", default="estimate",
        choices=["estimate", "topk", "quantiles", "mad", "equidepth", "trimmed"],
    )
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--quantiles", type=float, nargs="+", default=[0.5, 0.9, 0.99])
    q.add_argument("--bins", type=int, default=10,
                   help="bin count for --kind equidepth")
    q.add_argument("--trim", type=float, nargs=2, default=[0.05, 0.95],
                   metavar=("LO", "HI"),
                   help="quantile window for --kind trimmed (mean of the kept band)")

    ln = sub.add_parser("lineage", help="per-chunk lineage + throughput metrics")
    ln.add_argument("--checkpoint", required=True)

    s = sub.add_parser(
        "sql",
        help="one Verdict-style statement: approx aggregate, sample/sketch "
        "DDL (CREATE/SHOW/DROP/REFRESH), or exact pass-through",
    )
    s.add_argument("statement")
    s.add_argument("--tables", nargs="*", default=[], metavar="NAME=PATH",
                   help="table name → parquet path bindings for FROM")
    s.add_argument("--catalog", default=None,
                   help="SketchCatalog root (enables DDL, persisted-artifact "
                   "answers, and auto-selection)")
    s.add_argument("--catalog-key", default=None,
                   help="force a specific artifact (default: auto-select)")

    dd = sub.add_parser(
        "dedup-delta",
        help="incremental near-dup: dedup a delta parquet dir against a "
        "catalog-registered corpus signature table, write kept rows, "
        "close the loop by appending the kept signatures",
    )
    dd.add_argument("--input", required=True, help="delta parquet dir (token arrays)")
    dd.add_argument("--catalog", required=True, help="SketchCatalog root")
    dd.add_argument("--signatures", required=True,
                    help="registered signature table name (seed contract enforced)")
    dd.add_argument("--out", required=True, help="output dir for the kept delta rows")
    dd.add_argument("--threshold", type=float, default=0.8)
    dd.add_argument("--no-append", action="store_true",
                    help="skip appending the kept signatures to the corpus table")

    cu = sub.add_parser(
        "curate",
        help="corpus-release pass over a documents parquet dir: PII "
        "redaction + C4 line-level boilerplate dedup, with the per-rule "
        "and per-corpus accounting printed as JSON",
    )
    cu.add_argument("--input", required=True, help="parquet dir with a text column")
    cu.add_argument("--out", required=True, help="output dir for the cleaned docs")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--no-redact", action="store_true", help="skip PII redaction")
    cu.add_argument("--no-line-dedup", action="store_true", help="skip line dedup")
    cu.add_argument("--min-line-count", type=int, default=3,
                    help="corpus occurrences at/over which a line is boilerplate")

    dc = sub.add_parser(
        "decontaminate",
        help="benchmark decontamination as one command: flag train docs "
        "sharing a verbatim token span >= the policy length with any eval "
        "doc (exact 8-gram spans, not sketched), write the cleaned corpus "
        "and optionally the span report",
    )
    dc.add_argument("--train", required=True, help="train corpus parquet dir (token arrays)")
    dc.add_argument("--eval", required=True, help="eval/benchmark parquet dir (token arrays)")
    dc.add_argument("--out", required=True, help="output dir for the decontaminated corpus")
    dc.add_argument("--tokens-col", default="tokens")
    dc.add_argument("--id-col", default="doc_id")
    dc.add_argument("--n", type=int, default=8, help="n-gram order of the span detector")
    dc.add_argument("--min-span-tokens", type=int, default=50,
                    help="drop a train doc when its longest verbatim run with "
                    "any eval doc reaches this many tokens")
    dc.add_argument("--report-out", default=None,
                    help="also write the per-pair span report parquet here")
    dc.add_argument("--fuzzy-threshold", type=float, default=None,
                    help="ALSO flag train docs whose shingle-set MinHash "
                    "Jaccard with any eval doc reaches this (the paraphrase "
                    "net behind the exact pass; 0.25-0.5 is typical)")
    dc.add_argument("--shingle-n", type=int, default=3,
                    help="shingle order of the fuzzy pass")
    dc.add_argument("--fuzzy-r", type=int, default=128)
    dc.add_argument("--fuzzy-bands", type=int, default=64)
    dc.add_argument("--fuzzy-report-out", default=None,
                    help="write the fuzzy (train_id, eval_id, jaccard_est) "
                    "pairs parquet here")

    mx = sub.add_parser(
        "mix",
        help="mixture materialization: quality-ranked selection under a "
        "per-source token budget (--budget + --score-col), OR deterministic "
        "replication/downsampling by per-source fractions (--fractions "
        "src=f ...), OR a per-group document cap (--cap [+ --score-col], "
        "RefinedWeb-style); all reproducible pure functions of the input, "
        "never of partitioning",
    )
    mx.add_argument("--input", required=True, help="parquet dir")
    mx.add_argument("--out", required=True)
    mx.add_argument("--source-col", default="source",
                    help="grouping column (budget sources / fraction "
                    "sources / cap groups)")
    mx.add_argument("--id-col", default="doc_id")
    mx.add_argument("--budget", type=int, default=None,
                    help="per-source token budget (needs --score-col)")
    mx.add_argument("--score-col", default=None)
    mx.add_argument("--len-col", default="n_tok")
    mx.add_argument("--fractions", nargs="*", default=None, metavar="SRC=F",
                    help="per-source copy fractions for upsample_mixture")
    mx.add_argument("--cap", type=int, default=None,
                    help="max docs kept per group: top --score-col, or a "
                    "deterministic md5(id:seed) coin without one")
    mx.add_argument("--weighted-k", type=int, default=None,
                    help="per-group Efraimidis-Spirakis weighted draw of K "
                    "docs with probability proportional to --score-col "
                    "(stochastic but reproducible: a pure function of "
                    "(id, seed))")
    mx.add_argument("--temperature", type=float, default=None,
                    help="temperature-rebalance the mixture: p_i ∝ n_i^T "
                    "per-source weights (needs --token-budget), materialized "
                    "by deterministic replication/downsampling")
    mx.add_argument("--token-budget", type=int, default=None,
                    help="global token budget for --temperature")
    mx.add_argument("--seed", type=int, default=0)

    gt = sub.add_parser(
        "gate",
        help="percentile quality gate: keep each group's top fraction of a "
        "score column on the PER-GROUP CDF (raw scores are not comparable "
        "across sources); exact window by default, or sketch-served from a "
        "persisted quantile-state table (--states/--sketch — no shuffle, "
        "no per-group sort)",
    )
    gt.add_argument("--input", required=True, help="parquet dir")
    gt.add_argument("--out", required=True)
    gt.add_argument("--score-col", required=True)
    gt.add_argument("--group-col", default="source")
    gt.add_argument("--keep-top", type=float, required=True,
                    help="fraction of each group to keep (e.g. 0.3)")
    gt.add_argument("--states", default=None,
                    help="persisted quantile-sketch state table (parquet)")
    gt.add_argument("--sketch", default=None, help="sketch name in --states")

    dr = sub.add_parser(
        "drift",
        help="corpus drift report between two state-table snapshots — what "
        "changed since the last drop, from KB states, zero corpus scans: "
        "per-kind metrics (distinct/mass/quantiles/jaccard/spectrum) as "
        "one JSON line per (group, sketch, metric)",
    )
    dr.add_argument("--states-a", required=True, help="older snapshot state parquet")
    dr.add_argument("--states-b", required=True, help="newer snapshot state parquet")
    dr.add_argument("-r", "--spectrum-r", type=int, default=8,
                    help="top-r components for fd sketches")

    pr = sub.add_parser(
        "profile",
        help="one-command corpus data card: exact per-source rows/tokens + "
        "sketch-served distinct-doc estimates and token-length quantiles "
        "(HLL + KLL built in one pass), printed as JSON",
    )
    pr.add_argument("--input", required=True, help="parquet dir (sequences-shaped)")
    pr.add_argument("--group-by", default="source")
    pr.add_argument("--id-col", default="doc_id")
    pr.add_argument("--tokens-col", default="tokens")
    pr.add_argument("--len-col", default="n_tok",
                    help="token-count column; computed as size(tokens-col) if absent")
    pr.add_argument("--quantiles", type=float, nargs="+", default=[0.5, 0.9, 0.99])
    pr.add_argument("--topk", type=int, default=0,
                    help="also report the top-K heavy-hitter tokens per source "
                    "(adds a CM sketch to the same build pass)")

    sh = sub.add_parser(
        "shard",
        help="deterministic global shuffle + shard: write shard=N/ "
        "partitioned parquet whose order is a pure function of (id, seed)",
    )
    sh.add_argument("--input", required=True)
    sh.add_argument("--out", required=True)
    sh.add_argument("--id-col", default="doc_id")
    sh.add_argument("--n-shards", type=int, default=1024)
    sh.add_argument("--seed", type=int, default=0)

    args = p.parse_args(argv)

    from sketchlib.spark import get_spark

    spark = get_spark(f"sketchlib-{args.cmd}")
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "build":
        if args.checkpoint:
            from sketchlib.spark.checkpoint import build_with_checkpoint

            states = build_with_checkpoint(
                spark, args.input, args.sketches, args.checkpoint,
                group_by=args.group_by, fanout=args.fanout,
            )
        else:
            from sketchlib.spark.scan import build_sketches_from_parquet

            states = build_sketches_from_parquet(
                spark, args.input, args.sketches, group_by=args.group_by, fanout=args.fanout
            )
        states.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"states_written": n, "out": args.out}))

    elif args.cmd == "query":
        from sketchlib.spark.query import (
            equidepth_histogram_df,
            estimates_df,
            mad_df,
            quantiles_df,
            topk_df,
        )

        states = spark.read.parquet(args.states)
        if args.kind == "estimate":
            out = estimates_df(spark, states, args.sketch)
        elif args.kind == "topk":
            # dispatch on the stored kind so MG states serve through
            # mg_topk_df (undercount_bound), never mislabeled as CM's
            # err_bound — one 1-row probe of the KIND COLUMN decides
            # (never the state blob: a default-eps CM state is MBs)
            from pyspark.sql import functions as F

            from sketchlib.spark.query import mg_topk_df

            probe = (
                states.filter(F.col("sketch") == args.sketch)
                .select("kind").limit(1).collect()
            )
            if probe and probe[0][0] == "mg":
                out = mg_topk_df(spark, states, args.sketch, args.k)
            else:
                out = topk_df(spark, states, args.sketch, args.k)
        elif args.kind == "mad":
            out = mad_df(spark, states, args.sketch)
        elif args.kind == "equidepth":
            out = equidepth_histogram_df(spark, states, args.sketch, args.bins)
        elif args.kind == "trimmed":
            from sketchlib.spark.query import trimmed_mean_df

            out = trimmed_mean_df(spark, states, args.sketch, args.trim[0], args.trim[1])
        else:
            out = quantiles_df(spark, states, args.sketch, args.quantiles)
        for row in out.toPandas().to_dict("records"):
            print(_json_line(row))

    elif args.cmd == "lineage":
        from sketchlib.spark.checkpoint import throughput_metrics

        print(json.dumps(throughput_metrics(spark, args.checkpoint)))

    elif args.cmd == "dedup-delta":
        from sketchlib.spark.catalog import SketchCatalog
        from sketchlib.spark.dedup import dedup_delta

        cat = SketchCatalog(spark, args.catalog)
        delta = spark.read.parquet(args.input)
        # count the input ONCE up front for the summary line — counting
        # after the pipeline would re-scan the delta dir a second time
        n_delta = delta.count()
        kept, kept_sigs = dedup_delta(
            delta, catalog=cat, catalog_key=args.signatures, threshold=args.threshold
        )
        kept.write.mode("overwrite").parquet(args.out)
        # footer-metadata count of what was just written (no data scan);
        # append_signatures re-evaluates only checkpoint-backed joins
        n_kept = spark.read.parquet(args.out).count()
        appended = 0
        if not args.no_append:
            appended = cat.append_signatures(args.signatures, kept_sigs)["rows_added"]
        print(json.dumps({
            "delta_rows": n_delta, "kept_rows": n_kept,
            "signatures_appended": appended, "out": args.out,
        }))

    elif args.cmd == "curate":
        from pyspark.sql import functions as F

        from sketchlib.spark.dedup import dedup_lines
        from sketchlib.spark.text import PII_PATTERNS, redact_pii

        docs = spark.read.parquet(args.input)
        summary = {}
        if not args.no_redact:
            # ONE redaction pass: pii_report would redact the whole corpus a
            # second time just for its counts — aggregate the per-doc count
            # columns (the attribution the redaction actually performed)
            # and the redacted char total from the same cached frame instead
            docs = redact_pii(docs, text_col=args.text_col).cache()
            agg = docs.agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum(F.length(args.text_col)).alias("_chars"),
                *[F.sum(f"pii_{p}").alias(f"_m_{p}") for p in PII_PATTERNS],
                *[
                    F.sum((F.col(f"pii_{p}") > 0).cast("long")).alias(f"_d_{p}")
                    for p in PII_PATTERNS
                ],
            ).first()
            summary["input_rows"] = int(agg["_n"])
            summary["pii"] = {
                p: {"n_matches": int(agg[f"_m_{p}"] or 0), "n_docs": int(agg[f"_d_{p}"] or 0)}
                for p in PII_PATTERNS
            }
            summary["pii"]["__redacted__"] = {
                "n_matches": int(agg["_chars"] or 0), "n_docs": 0,
            }
            docs = docs.drop(*[f"pii_{p}" for p in PII_PATTERNS])
        else:
            summary["input_rows"] = docs.count()
        if not args.no_line_dedup:
            # cache: cleaned + report are independent plans over the same
            # (possibly redacted) input — don't pay the scan twice
            docs = docs.cache()
            cleaned, report = dedup_lines(
                docs, text_col=args.text_col, id_col=args.id_col,
                min_count=args.min_line_count,
            )
            rep = report.collect()[0]
            summary["line_dedup"] = {
                "n_lines": rep["n_lines"], "n_removed": rep["n_removed"],
                "n_heavy_lines": rep["n_heavy_lines"],
            }
            keep = [c for c in docs.columns if c != args.text_col]
            docs = cleaned.join(docs.select(*keep), args.id_col).withColumnRenamed(
                f"{args.text_col}_clean", args.text_col
            )
        docs.write.mode("overwrite").parquet(args.out)
        summary["output_rows"] = spark.read.parquet(args.out).count()
        summary["out"] = args.out
        print(json.dumps(summary))

    elif args.cmd == "decontaminate":
        from pyspark.sql import functions as F

        from sketchlib.spark.dedup import contamination_spans

        train = spark.read.parquet(args.train)
        eval_df = spark.read.parquet(args.eval)
        n_train = train.count()
        spans = contamination_spans(
            train, eval_df, tokens_col=args.tokens_col, id_col=args.id_col, n=args.n
        ).localCheckpoint()  # contamination-sized; two consumers (report + flag set)
        if args.report_out:
            spans.write.mode("overwrite").parquet(args.report_out)
        flagged = (
            spans.filter(F.col("max_span_tokens") >= args.min_span_tokens)
            .select(F.col("train_id").alias(args.id_col))
            .distinct()
        )
        summary = {
            "train_rows": n_train, "contaminated_pairs": spans.count(),
            "min_span_tokens": args.min_span_tokens, "out": args.out,
        }
        if args.fuzzy_threshold is not None:
            from sketchlib.spark.dedup import contamination_fuzzy

            fz = contamination_fuzzy(
                train, eval_df, tokens_col=args.tokens_col, id_col=args.id_col,
                threshold=args.fuzzy_threshold, n=args.shingle_n,
                r=args.fuzzy_r, n_bands=args.fuzzy_bands,
            ).localCheckpoint()  # two consumers (report + flag union)
            if args.fuzzy_report_out:
                fz.write.mode("overwrite").parquet(args.fuzzy_report_out)
            summary["fuzzy_pairs"] = fz.count()
            summary["fuzzy_threshold"] = args.fuzzy_threshold
            flagged = flagged.unionByName(
                fz.select(F.col("train_id").alias(args.id_col)).distinct()
            ).distinct()
        train.join(flagged, args.id_col, "left_anti").write.mode("overwrite").parquet(args.out)
        n_kept = spark.read.parquet(args.out).count()
        summary["flagged_docs"] = n_train - n_kept
        summary["kept_rows"] = n_kept
        print(json.dumps(summary))

    elif args.cmd == "mix":
        from pyspark.sql import functions as F

        n_modes = sum(
            x is not None
            for x in (args.budget, args.fractions, args.cap, args.weighted_k,
                      args.temperature)
        )
        if n_modes != 1:
            raise SystemExit(
                "mix: pass exactly one of --budget, --fractions, --cap, "
                "--weighted-k, --temperature"
            )
        docs = spark.read.parquet(args.input)
        n_in = docs.count()
        per_source = None
        if args.temperature is not None:
            if args.token_budget is None:
                raise SystemExit("mix: --temperature needs --token-budget")
            from sketchlib.spark.sampling import temperature_weights, upsample_mixture

            rep = temperature_weights(
                docs, args.temperature, len_col=args.len_col,
                source_col=args.source_col, token_budget=args.token_budget,
            ).collect()
            per_source = {
                r[args.source_col]: {
                    "weight": r["weight"], "epochs": r["epochs"],
                    "available_tokens": r["available_tokens"],
                }
                for r in rep
            }
            out_df = upsample_mixture(
                docs, {r[args.source_col]: r["epochs"] for r in rep},
                source_col=args.source_col, id_col=args.id_col, seed=args.seed,
            )
            mode = "temperature"
        elif args.cap is not None:
            from sketchlib.spark.sampling import cap_per_group

            out_df = cap_per_group(
                docs, args.cap, group_col=args.source_col,
                score_col=args.score_col, id_col=args.id_col, seed=args.seed,
            )
            mode = "cap"
        elif args.weighted_k is not None:
            if not args.score_col:
                raise SystemExit("mix: --weighted-k needs --score-col (the weight)")
            from sketchlib.spark.sampling import weighted_sample

            out_df = weighted_sample(
                docs, args.weighted_k, args.score_col,
                group_col=args.source_col, id_col=args.id_col, seed=args.seed,
            )
            mode = "weighted"
        elif args.budget is not None:
            if not args.score_col:
                raise SystemExit("mix: --budget needs --score-col")
            from sketchlib.spark.sampling import select_within_budget

            out_df = select_within_budget(
                docs, args.budget, args.score_col, len_col=args.len_col,
                source_col=args.source_col, id_col=args.id_col,
            )
            mode = "budget"
        else:
            from sketchlib.spark.sampling import upsample_mixture

            fr = {}
            for kv in args.fractions:
                s, _, f = kv.partition("=")
                fr[s] = float(f)
            out_df = upsample_mixture(
                docs, fr, source_col=args.source_col, id_col=args.id_col,
                seed=args.seed,
            )
            mode = "fractions"
        out_df.write.mode("overwrite").parquet(args.out)
        n_out = spark.read.parquet(args.out).count()
        print(json.dumps({
            "mode": mode, "input_rows": n_in, "output_rows": n_out, "out": args.out,
            **({"per_source": per_source} if per_source is not None else {}),
        }))

    elif args.cmd == "gate":
        from pyspark.sql import functions as F

        from sketchlib.spark.sampling import percentile_normalize

        if not 0.0 < args.keep_top <= 1.0:
            raise SystemExit("gate: --keep-top must be in (0, 1]")
        if (args.states is None) != (args.sketch is None):
            raise SystemExit("gate: pass --states and --sketch together")
        docs = spark.read.parquet(args.input)
        n_in = docs.count()
        states = spark.read.parquet(args.states) if args.states else None
        scored = percentile_normalize(
            docs, args.score_col, group_col=args.group_col,
            states=states, sketch=args.sketch, out="_pct",
        )
        kept = (
            scored.filter(F.col("_pct") > 1.0 - args.keep_top)
            .drop("_pct")
        )
        kept.write.mode("overwrite").parquet(args.out)
        n_out = spark.read.parquet(args.out).count()
        # rows with NULL/NaN score (or, in sketch mode, a group with no
        # state) get NULL _pct and fail the gate even at --keep-top 1.0 —
        # account for them explicitly instead of silently folding them
        # into the gated count
        n_invalid = scored.filter(F.col("_pct").isNull()).count()
        print(json.dumps({
            "mode": "sketch" if args.states else "exact",
            "keep_top": args.keep_top,
            "input_rows": n_in, "kept_rows": n_out,
            "invalid_score_rows": n_invalid,
            "gated_rows": n_in - n_out - n_invalid,
            "out": args.out,
        }))

    elif args.cmd == "profile":
        from pyspark.sql import functions as F

        from sketchlib.spark.build import SketchSpec, build_sketches
        from sketchlib.spark.query import estimates_df, mad_df, quantiles_df, topk_df

        docs = spark.read.parquet(args.input)
        lcol = args.len_col
        if lcol not in docs.columns:
            if args.tokens_col not in docs.columns:
                raise SystemExit(
                    f"profile: neither --len-col {lcol!r} nor --tokens-col "
                    f"{args.tokens_col!r} exists in {args.input}"
                )
            docs = docs.withColumn(lcol, F.size(args.tokens_col).cast("int"))
        if args.topk > 0 and args.tokens_col not in docs.columns:
            raise SystemExit(
                f"profile: --topk needs --tokens-col {args.tokens_col!r}, "
                f"which does not exist in {args.input}"
            )
        for opt, col in (("--id-col", args.id_col), ("--group-by", args.group_by)):
            if col not in docs.columns:
                raise SystemExit(
                    f"profile: {opt} {col!r} does not exist in {args.input} "
                    f"(have {sorted(docs.columns)})"
                )
        # exact cheap aggregates: one groupBy scan (rows + token totals).
        # NULL groups are keyed '__null__' — the SAME label the sketch
        # kernel uses — so the two sides of the card join up
        exact = {
            ("__null__" if r["g"] is None else str(r["g"])): r
            for r in docs.groupBy(F.col(args.group_by).alias("g"))
            .agg(F.count(F.lit(1)).alias("rows"), F.sum(lcol).alias("tokens"))
            .collect()
        }
        # sketch pass: ONE corpus scan builds every sketch (zero-shuffle kernel)
        specs = [
            SketchSpec("hll_id", "hll", args.id_col, {"p": 14}),
            SketchSpec("kll_len", "kll", lcol, {"k": 200}),
            # token-MASS length distribution: "the length holding the median
            # TOKEN", not the median document — the budget-math view of the
            # same column, one more KB sketch in the same pass
            SketchSpec("td_len_w", "tdigest", lcol, {"compression": 200}, weight=lcol),
        ]
        if args.topk > 0:
            specs.append(SketchSpec("cm_tok", "cm", args.tokens_col, {"eps": 1e-4, "delta": 0.01}))
        states = build_sketches(docs, specs, group_by=args.group_by).localCheckpoint()
        dd = {r["group"]: r for r in estimates_df(spark, states, "hll_id").collect()}
        qrows = quantiles_df(spark, states, "kll_len", args.quantiles).collect()
        qmap: dict = {}
        for r in qrows:
            # %g keeps mille-level labels distinct (0.999 -> 'p99.9';
            # int(round(q*100)) would collapse 0.995/0.999/1.0 to 'p100')
            qmap.setdefault(r["group"], {})[f"p{r['q'] * 100:g}"] = r["value"]
        rank_err = qrows[0]["rank_err_bound"] if qrows else None
        # robust spread from the SAME kll_len state — no extra scan. The
        # data card's "typical length ± spread" line should not be a
        # stddev the longest docs dominate
        spread = {
            r["group"]: {"mad_est": r["mad_est"], "mad_lo": r["mad_lo"], "mad_hi": r["mad_hi"]}
            for r in mad_df(spark, states, "kll_len").collect()
        }
        # robust center from the same state: the 5%-trimmed mean length —
        # the "typical length" a handful of book-sized docs can't own
        from sketchlib.spark.query import trimmed_mean_df

        tmean = {
            r["group"]: {"tm_est": r["trimmed_mean"], "tm_lo": r["tm_lo"], "tm_hi": r["tm_hi"]}
            for r in trimmed_mean_df(spark, states, "kll_len").collect()
        }
        # the token-mass view: the length below which q of the TOKENS lie
        wq: dict = {}
        for r in quantiles_df(spark, states, "td_len_w", args.quantiles).collect():
            wq.setdefault(r["group"], {})[f"p{r['q'] * 100:g}"] = r["value"]
        hh: dict = {}
        if args.topk > 0:
            for r in topk_df(spark, states, "cm_tok", args.topk).collect():
                hh.setdefault(r["group"], []).append(
                    {"token": r["token"], "est_count": r["est_count"]}
                )
        per_group = {
            g: {
                "rows": int(exact[g]["rows"]),
                "total_tokens": int(exact[g]["tokens"] or 0),
                "distinct_docs_est": dd[g]["estimate"],
                "distinct_docs_rse": dd[g]["rse_bound"],
                "token_len_quantiles": qmap.get(g, {}),
                "token_len_mad": spread.get(g, {}),
                "token_len_trimmed_mean": tmean.get(g, {}),
                "token_mass_len_quantiles": wq.get(g, {}),
                **({"top_tokens": hh.get(g, [])} if args.topk > 0 else {}),
            }
            for g in sorted(exact)
        }
        print(_json_line({
            "corpus": {
                "rows": sum(v["rows"] for v in per_group.values()),
                "total_tokens": sum(v["total_tokens"] for v in per_group.values()),
                "groups": len(per_group),
                "quantile_rank_err_bound": rank_err,
            },
            "per_group": per_group,
        }))

    elif args.cmd == "shard":
        from sketchlib.spark.packing import shuffle_shard

        docs = spark.read.parquet(args.input)
        sharded = shuffle_shard(
            docs, id_col=args.id_col, n_shards=args.n_shards, seed=args.seed
        )
        (
            sharded.repartitionByRange(args.n_shards, "shard", "shuffle_key")
            .sortWithinPartitions("shard", "shuffle_key", args.id_col)
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(args.out)
        )
        n = spark.read.parquet(args.out).count()
        print(json.dumps({
            "rows": n, "n_shards": args.n_shards, "seed": args.seed, "out": args.out,
        }))

    elif args.cmd == "drift":
        from sketchlib.spark.query import corpus_drift_df

        out = corpus_drift_df(
            spark,
            spark.read.parquet(args.states_a),
            spark.read.parquet(args.states_b),
            r=args.spectrum_r,
        )
        for row in out.toPandas().to_dict("records"):
            print(_json_line(row))

    elif args.cmd == "sql":
        from sketchlib.sql import approx_sql

        tables = dict(kv.split("=", 1) for kv in args.tables) or None
        cat = None
        if args.catalog:
            from sketchlib.spark.catalog import SketchCatalog

            cat = SketchCatalog(spark, args.catalog)
        out = approx_sql(spark, args.statement, tables, catalog=cat, catalog_key=args.catalog_key)
        for row in out.toPandas().to_dict("records"):
            print(_json_line(row))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
