"""Benchmark harness (driver contract + BASELINE.md metric).

Runs the headline query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ..., "extra": {...}}.

The flagship number is the sketch-build throughput (tokens/sec) over a
deterministic synthetic sequences table scaled to the sf (FIXTURES.md F1,
N = sf * 2,000,000 rows ≈ sf * 1.2B tokens), generated once and cached in
/tmp. Scaling-efficiency evidence (local[2] vs local[8], + local[32]
diagnostic) is produced by BENCH/scaling.py, not here — one JVM can't host
two masters.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from sketchlib.data.gen import write_sequences  # noqa: E402
from sketchlib.spark import SketchSpec, build_sketches, get_spark  # noqa: E402

HEADLINE = [
    "a08_join_broadcast",
    "a09_groupby_agg",
    "a14_topk_orderby_limit",
    "b01_hll_distinct_docs",
    "b03_cm_topk_tokens",
    "b04_kll_price_quantiles",
    "c01_exact_dedup",
]

SEQ_SPECS = [
    SketchSpec("hll_doc", "hll", "doc_id", {"p": 14}),
    SketchSpec("hll_tok", "hll", "tokens", {"p": 14}),
    SketchSpec("cm_tok", "cm", "tokens", {"eps": 1e-4, "delta": 0.01}),
    SketchSpec("kll_ntok", "kll", "n_tok", {"k": 200}),
    SketchSpec("td_ntok", "tdigest", "n_tok", {"compression": 200}),
    SketchSpec("bloom_tok", "bloom", "tokens", {"m_bits": 1 << 20, "h": 7}),
]


def seq_table_dir(sf: float) -> tuple[str, int, int]:
    """(dir, total tokens, n_rows) for the cached synthetic sequences table."""
    n_rows = max(2_000, int(sf * 2_000_000))
    d = f"/tmp/sketchlib_bench/seq_n{n_rows}"
    if not os.path.exists(os.path.join(d, "_MANIFEST.json")):
        m = write_sequences(d, n_rows)
        with open(os.path.join(d, "_MANIFEST.json"), "w") as fh:
            json.dump(m, fh)
    with open(os.path.join(d, "_MANIFEST.json")) as fh:
        return d, json.load(fh)["tokens"], n_rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = 0.1
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"bench: SF dir not found: {sf_dir}")

    # 4 MB scan splits: token rows are fat and the sketch kernel is the
    # bottleneck, so many small splits beat few big ones (the 80% web skew
    # otherwise caps parallelism at the file count)
    spark = get_spark(
        "sketchlib-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 << 20)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).summary().collect()  # JVM warmup

    seq_dir, seq_tokens, seq_rows = seq_table_dir(sf)

    queries = entrymod.queries()
    # one untimed pass first: the initial query of a session pays JVM parquet-
    # reader init, codegen compilation, and broadcast machinery warm-up (~4-5s
    # landing on whichever query runs first — round 1 misread a08 as slow for
    # exactly this reason). The metric is steady-state latency.
    for name in HEADLINE:
        queries[name](spark, sf_dir).collect()
    times: dict[str, float] = {}
    for _ in range(2):  # best-of-2: shared-host CPU delivery drifts run-to-run
        for name in HEADLINE:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            sec = round(time.perf_counter() - t0, 3)
            times[name] = min(times.get(name, sec), sec)

    # flagship: full sketch build (6 sketches) over the sequences table,
    # pyarrow-direct scan path (see sketchlib/spark/scan.py). One untimed pass
    # first: every reused Python worker pays ~1-2s of numpy SIMD dispatch init
    # on its first uint64 ufunc, which is a per-process constant, not a
    # per-token cost — the metric is steady-state throughput.
    from sketchlib.spark.scan import build_sketches_from_parquet

    assert build_sketches_from_parquet(spark, seq_dir, SEQ_SPECS, group_by="source").count() > 0
    build_sec = float("inf")
    for _ in range(2):  # best-of-2: shared-host CPU delivery drifts run-to-run
        t0 = time.perf_counter()
        states = build_sketches_from_parquet(spark, seq_dir, SEQ_SPECS, group_by="source")
        n_states = states.count()
        build_sec = min(build_sec, time.perf_counter() - t0)
        assert n_states > 0
    times["sketch_build_sequences"] = round(build_sec, 3)

    # ---- second scale block (VERDICT r2 #9): the same flagship build at
    # 5× the rows, so round-over-round comparisons carry a scale axis and
    # overhead-bound vs data-bound shifts are visible. Workers are already
    # warm from the first build (same session), so best-of-2 timed directly.
    scale2 = float(os.environ.get("SPARK_GRAFT_SCALE2", "5"))
    second = {}
    if scale2 > 0:
        seq2_dir, seq2_tokens, seq2_rows = seq_table_dir(sf * scale2)
        b2 = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n2 = build_sketches_from_parquet(spark, seq2_dir, SEQ_SPECS, group_by="source").count()
            b2 = min(b2, time.perf_counter() - t0)
            assert n2 > 0
        second = {
            "sf": sf * scale2,
            "sequences_rows": seq2_rows,
            "sequences_tokens": seq2_tokens,
            "sketch_build_sec": round(b2, 3),
            "sketch_build_tokens_per_sec": round(seq2_tokens / b2, 1),
            # vs the FIRST block above; >1: the small build is overhead-bound
            "throughput_ratio_vs_block1": round((seq2_tokens / b2) / (seq_tokens / build_sec), 3),
        }

    # ---- second scale axis for the HEADLINE QUERIES too (VERDICT r2 #9:
    # "the same headline set" at two sfs): run the full headline set against
    # the sibling testdata sf dir (10× row delta between sf0.01 and sf0.1),
    # so per-query scaling — not just the flagship build's — is visible.
    base = os.path.dirname(sf_dir.rstrip("/"))
    alt = next(
        (
            os.path.join(base, d)
            for d in ("sf0.01", "sf0.1")
            if os.path.join(base, d) != sf_dir.rstrip("/") and os.path.isdir(os.path.join(base, d))
        ),
        None,
    )
    if alt is not None and second:
        for name in HEADLINE:  # untimed warm pass on the new dir's files
            queries[name](spark, alt).collect()
        qt2: dict[str, float] = {}
        for _ in range(2):
            for name in HEADLINE:
                t0 = time.perf_counter()
                queries[name](spark, alt).collect()
                sec = round(time.perf_counter() - t0, 3)
                qt2[name] = min(qt2.get(name, sec), sec)
        try:
            second["queries_sf"] = float(alt.rstrip("/").split("sf")[-1])
        except ValueError:
            second["queries_sf"] = None
        second["queries"] = qt2

    # ---- incremental-refresh economics (DESIGN_100TB §2, measured) at the
    # LARGER second-scale table, where refresh's fixed driver costs stop
    # masking the delta-proportional work: build a catalog set over symlinks
    # (the cached table is never mutated), append a 10% delta, time REFRESH
    # vs a full rebuild over the grown dir.
    refresh_block = {}
    if scale2 > 0:
        import glob
        import shutil
        import tempfile

        from sketchlib.spark.catalog import SketchCatalog

        work = tempfile.mkdtemp(prefix="sketchlib_bench_refresh_")
        try:
            base_dir, _, base_rows = seq_table_dir(sf * scale2)
            linked = os.path.join(work, "seq")
            for f in glob.glob(os.path.join(base_dir, "source=*", "*.parquet")):
                rel = os.path.relpath(f, base_dir)
                dst = os.path.join(linked, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.symlink(f, dst)
            cat = SketchCatalog(spark, os.path.join(work, "cat"))
            cat.create("bench", linked, SEQ_SPECS, group_by="source")
            delta_rows = max(2_000, base_rows // 10)
            delta_dir = f"/tmp/sketchlib_bench/seq_delta_n{delta_rows}"
            # same completion-marker pattern as seq_table_dir: a crashed
            # half-written delta dir must not be silently reused
            if not os.path.exists(os.path.join(delta_dir, "_MANIFEST.json")):
                m = write_sequences(delta_dir, delta_rows, seed=43)
                with open(os.path.join(delta_dir, "_MANIFEST.json"), "w") as fh:
                    json.dump(m, fh)
            for f in glob.glob(os.path.join(delta_dir, "source=*", "*.parquet")):
                rel = os.path.relpath(f, delta_dir)
                dst = os.path.join(linked, os.path.dirname(rel), "delta-" + os.path.basename(f))
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.symlink(f, dst)
            t0 = time.perf_counter()
            rstats = cat.refresh("bench")
            refresh_sec = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_full = build_sketches_from_parquet(spark, linked, SEQ_SPECS, group_by="source").count()
            rebuild_sec = time.perf_counter() - t0
            assert n_full > 0 and rstats["rows_added"] == delta_rows
            refresh_block = {
                "base_rows": base_rows,
                "delta_rows": delta_rows,
                "delta_frac": round(delta_rows / (base_rows + delta_rows), 3),
                "refresh_sec": round(refresh_sec, 3),
                "full_rebuild_sec": round(rebuild_sec, 3),
                "speedup": round(rebuild_sec / refresh_sec, 2),
            }
        finally:
            shutil.rmtree(work, ignore_errors=True)

    # ---- corpus-independence of the states-answered query surface
    # (VERDICT r3 #8): register sketch states for BOTH scales' sequences
    # tables, then time the SAME statements answered FROM STATES ONLY.
    # Verdict's headline property is that this latency does not grow with
    # the corpus — the ratio column should sit ~1.0 while the corpus grows
    # by `scale2`x (the builds above are where corpus size is paid).
    states_flat = {}
    if scale2 > 0:
        import shutil
        import tempfile

        from sketchlib.spark.catalog import SketchCatalog
        from sketchlib.sql import approx_sql

        work2 = tempfile.mkdtemp(prefix="sketchlib_bench_states_")
        try:
            cat = SketchCatalog(spark, os.path.join(work2, "cat"))
            for key, d in (("seq_small", seq_dir), ("seq_big", seq2_dir)):
                st = build_sketches_from_parquet(spark, d, SEQ_SPECS, group_by="source")
                cat.register_states(key, st, SEQ_SPECS, group_by="source", input_dir=d)
            stmts = {
                "hll_count_distinct": "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM t GROUP BY source",
                "cm_topk": "SELECT APPROX_TOPK(tokens, 10) FROM t GROUP BY source",
                "kll_percentile": "SELECT APPROX_PERCENTILE(n_tok, 0.5, 0.99) FROM t GROUP BY source",
            }
            lat: dict[str, dict[str, float]] = {"seq_small": {}, "seq_big": {}}
            for key in lat:
                for qn, stmt in stmts.items():
                    approx_sql(spark, stmt, catalog=cat, catalog_key=key).collect()  # warm
                    best = float("inf")
                    for _ in range(2):
                        t0 = time.perf_counter()
                        approx_sql(spark, stmt, catalog=cat, catalog_key=key).collect()
                        best = min(best, time.perf_counter() - t0)
                    lat[key][qn] = round(best, 3)
            # set operations FROM STATES (round 5): the statement's latency
            # must not grow with the corpus either — both sides resolve to
            # the registered sketch sets, zero base-table scan
            setop_stmt = ("SELECT APPROX_COUNT_DISTINCT(doc_id, 0.02) FROM "
                          "(SELECT doc_id FROM ta UNION SELECT doc_id FROM tb)")
            for key, d in (("seq_small", seq_dir), ("seq_big", seq2_dir)):
                st_tables = {"ta": d, "tb": d}
                approx_sql(spark, setop_stmt, st_tables, catalog=cat).collect()  # warm
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    approx_sql(spark, setop_stmt, st_tables, catalog=cat).collect()
                    best = min(best, time.perf_counter() - t0)
                lat[key]["setop_union_states"] = round(best, 3)
            stmts["setop_union_states"] = setop_stmt
            states_flat = {
                "rows_ratio": round(seq2_rows / seq_rows, 1),
                "small": lat["seq_small"],
                "big": lat["seq_big"],
                "latency_ratio_big_over_small": {
                    qn: round(lat["seq_big"][qn] / lat["seq_small"][qn], 2) for qn in stmts
                },
            }
        finally:
            shutil.rmtree(work2, ignore_errors=True)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_sketch_build_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "extra": {
                    "sequences_rows": seq_rows,
                    "sequences_tokens": seq_tokens,
                    "sketch_build_tokens_per_sec": round(seq_tokens / build_sec, 1),
                    "cpus": cpus,
                    "incremental_refresh": refresh_block,
                    "second_scale": second,
                    "states_flat_latency": states_flat,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
