"""Driver contract for the spark-graft builder (PySpark target).

60 queries; naming maps to SURVEY.md §2:
  a* (11) — Verdict's exact/relational surface (A4–A17 + left join),
       DataFrame-native, each with an ANSI-SQL DuckDB oracle (value-hash
       checked).
  b* (31) — sketch/sample/catalog queries (B1–B11 / §2C Q1–Q5 / A2+A5+A8,
       plus round 3: b23 distributed high-cardinality estimates, b24
       multi-column GROUP BY, b25 stratified APPROX_AVG via DDL, b26
       approximate JOIN via SQL, b27 catalog auto-selection, b28 exact
       pass-through, b29 incremental refresh on append; round 4: b30 WHERE
       on approximate joins, b31 aliased fact×dim mixed join — sampled
       fact, exact broadcast dimension — b32 approx-over-approx derived
       tables with the inner-error caveat column).
       Accuracy claims are driver-checked: each returns ``within_bound``-
       style booleans computed against EXACT answers (calculated in Spark),
       and the oracle asserts they are all TRUE; property queries (b10
       partition invariance, b20 multimodal, b21 checkpoint resume, b22
       streamed-vs-batch byte match) are the same shape.
  c* (18) — training-data pipeline ops: exact dedup, token stats,
       MinHash-LSH / SimHash / n-gram / embedding near-dup, batched
       brute-force + SRP ANN, as-of join (DuckDB ASOF oracle), winnowing
       containment, gap sessionization (DuckDB lag/cumsum oracle), ANN
       from a persisted catalog index (c12, base table deleted first),
       sequence packing (c13, FFD batch assembly), benchmark
       decontamination (c14, exact n-gram overlap vs broadcast eval set),
       dataset mixture composition (c15, weight-targeted sampleBy),
       Gopher-style repetition gates (c16, round 4 — duplicate-token /
       duplicate-bigram / top-token-occupancy stats, hash-matched vs a
       DuckDB list-function oracle), span-level decontamination (c17,
       round 4 — longest consecutive shared-n-gram run per pair),
       incremental delta dedup against persisted corpus signatures (c18,
       round 4 — recall on injected copies + signature-append closure).

Numeric determinism rule: float aggregates are hashed by the driver, and
floating SUM order differs between engines — so every money/value aggregate
is computed in exact integer units (cents = round(x*100); 4dp for 2dp×2dp
products) which both engines reproduce bit-identically; averages are single
exact-int divisions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# the driver may import this file by path; make `import sketchlib` resolve
_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from sketchlib.spark import SketchSpec, build_sketches, estimates_df, quantiles_df, topk_df
from sketchlib.spark.build import partial_states
from sketchlib.spark.scan import partial_states_from_parquet
from sketchlib.spark.query import load_states
from sketchlib.spark.tokenize import pre_tokens, token_id, with_tokens

# Overlap pool for INDEPENDENT Spark actions inside one query (guide §2.6):
# the sketch-build job and its exact-verification job share no dependency, so
# running them from two driver threads lets the second job's tasks back-fill
# executor slots the first job's tail leaves idle. Two workers is plenty.
from concurrent.futures import ThreadPoolExecutor as _TPE

_OVERLAP = _TPE(max_workers=2)

_DIST_SESSIONS: set[int] = set()


def _ensure_dist(spark: SparkSession) -> None:
    """Make sketchlib importable in executor Python workers regardless of the
    driver's cwd/PYTHONPATH: zip the package once and addPyFile it (the same
    mechanism spark-submit --py-files uses)."""
    key = id(spark.sparkContext)
    if key in _DIST_SESSIONS:
        return
    import shutil
    import tempfile

    zip_base = os.path.join(tempfile.gettempdir(), "sketchlib_pyfiles")
    zip_path = zip_base + ".zip"
    src_mtime = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(_REPO, "sketchlib"))
        for f in fs
        if f.endswith(".py")
    )
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < src_mtime:
        shutil.make_archive(zip_base, "zip", root_dir=_REPO, base_dir="sketchlib")
    spark.sparkContext.addPyFile(zip_path)
    _DIST_SESSIONS.add(key)


_READ_CACHE: dict = {}


def _path_fingerprint(path: str):
    """Cheap (name, size, mtime_ns) fingerprint of a parquet file/dir so a
    memoized reader graph is invalidated the moment the underlying files
    change (e.g. the incremental-refresh queries append files)."""
    st = os.stat(path)
    if not os.path.isdir(path):
        return (st.st_size, st.st_mtime_ns)
    out = [st.st_mtime_ns]
    for root, _dirs, files in os.walk(path):
        for f in files:
            s = os.stat(os.path.join(root, f))
            out.append((f, s.st_size, s.st_mtime_ns))
    return tuple(sorted(out, key=str))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Memoized ``spark.read.parquet``: the schema/footer read costs ~70 ms
    per call (measured — a 3-table join paid 0.21 s before touching data),
    and the SAME tables are read by every query in a session. The cache key
    carries a file fingerprint, so this never serves a stale file listing —
    and it memoizes the LAZY reader graph only, never results: every action
    still scans the parquet inputs."""
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark.sparkContext), path, _path_fingerprint(path))
    df = _READ_CACHE.get(key)
    if df is None:
        df = _READ_CACHE[key] = spark.read.parquet(path)
    return df


def _spread(spark: SparkSession, df: DataFrame, max_bytes: int = 1 << 30) -> DataFrame:
    """Round-robin repartition a SCAN-STARVED small input (guide §2.5,
    input skew): the testdata tables are single parquet files with ≤1M-row
    row groups, and Spark assigns a row group to the byte-split holding its
    midpoint — a one-row-group file is a ONE-TASK scan no matter the core
    count, which starves every downstream heavy expression (tokenize:
    measured 0.94 → 0.43 s for b03's exact pass at the sf1 replica).

    The width is BYTE-derived, not core-derived: ~256 KB of compressed
    input per task (≈2 MB of raw text — env knob
    SKETCHLIB_SPREAD_BYTES_PER_TASK), capped at the core count. A width
    sweep at both sf0.1 and the sf1 replica put the optimum near this
    bytes/task (over-fragmenting to 32 tasks at sf0.1 was SLOWER than not
    spreading at all). Fires only when the scan has fewer partitions than
    the target AND the input files are provably small (≤ max_bytes total),
    so a corpus-scale table — thousands of splits — never pays a full
    shuffle."""
    per_task = int(os.environ.get("SKETCHLIB_SPREAD_BYTES_PER_TASK", 256 << 10))
    cores = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
        sz = sum(
            os.stat(f[7:] if f.startswith("file://") else f).st_size for f in files
        )
        n = min(cores, max(2, sz // max(per_task, 1)))
        if not files or sz > max_bytes or df.rdd.getNumPartitions() >= n:
            return df
    except Exception:
        return df
    return df.repartition(n)


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("long")


def _hll_tol(exact, rse):
    """3σ·RSE relative bound + absolute small-n collision slack.

    At tiny cardinalities HLL's error is dominated by discrete register
    collisions (expected n²/2m ≈ 0.02 at n=25, p=14): a single collision
    shifts the estimate by ~1 unit, which exceeds any relative bound when
    n < √m/3. Slack of 2 units covers P(≥3 collisions) ≈ 1e-6 and is
    negligible at large n where the 3·RSE term dominates.
    """
    return 3 * rse * exact + 2.0


# --------------------------------------------------------------------------
# entry: flagship — Verdict Q1 (approx COUNT(DISTINCT doc_id) GROUP BY source)
# with ±err bounds AND the exact answer side by side (SURVEY.md §2C, A15)
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    _ensure_dist(spark)
    sf_dir = "/root/testdata/sf0.001"
    docs = _t(spark, sf_dir, "documents")
    states = build_sketches(docs, [SketchSpec("hll_doc", "hll", "doc_id", {"p": 14})], group_by="source")
    est = estimates_df(spark, states, "hll_doc").toPandas()
    exact = (
        docs.groupBy("source").agg(F.countDistinct("doc_id").alias("exact_distinct")).toPandas()
    )
    m = est.merge(exact, left_on="group", right_on="source")
    m["within_bound"] = (m["estimate"] - m["exact_distinct"]).abs() <= _hll_tol(m["exact_distinct"], m["rse_bound"])
    out = m[["source", "estimate", "rse_bound", "exact_distinct", "within_bound"]]
    return spark.createDataFrame(out)


# --------------------------------------------------------------------------
# a* — exact relational surface (Verdict pass-through semantics)
# --------------------------------------------------------------------------

def q_a06_project_filter(spark, sf_dir):
    """A6/A7: projection + filter pushed to the scan; row-level output."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
            .cast("long")
            .alias("net_4dp"),
        )
    )


def q_a07_filter_predicates(spark, sf_dir):
    """A7: compound predicates (IN / BETWEEN / LIKE / IS NOT NULL)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(1000, 200000)
            & F.col("o_orderpriority").like("1-%")
            & F.col("o_custkey").isNotNull()
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), F.sum(_cents("o_totalprice")).alias("sum_cents"))
    )


def q_a08_join_broadcast(spark, sf_dir):
    """A8: fact ⋈ dims with explicit broadcast of the small sides."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"), F.sum(_cents("o_totalprice")).alias("revenue_cents"))
    )


def q_a09_groupby_agg(spark, sf_dir):
    """A9/A10: TPC-H Q1-shaped multi-aggregate group-by."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("sum_qty"),
        F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
        F.sum(F.round(disc * 10000, 0).cast("long")).alias("sum_disc_4dp"),
        F.sum(F.round(disc * (1 + F.col("l_tax")) * 1000000, 0).cast("long")).alias("sum_charge_6dp"),
        F.count("*").alias("count_order"),
    )


def q_a10_count_sum_avg(spark, sf_dir):
    """A10: COUNT/SUM/AVG — avg as one exact-integer division (both engines identical)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(_cents("value")).alias("sum_value_cents"),
        (F.sum(_cents("value")) / F.count("*")).alias("avg_value_cents"),
    )


def q_a11_time_buckets(spark, sf_dir):
    """Time-bucketed aggregation (tumbling daily windows over events)."""
    e = _t(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    return e.groupBy(day, "event_type").agg(
        F.count("*").alias("n_events"), F.sum(_cents("value")).alias("sum_value_cents")
    )


def q_a12_left_join(spark, sf_dir):
    """A8 beyond inner: LEFT OUTER join — customers with zero orders survive
    with nulls; the per-custkey pre-aggregate keeps the join 1:1 (no fanout)
    and broadcasts nation."""
    c = _t(spark, sf_dir, "customer")
    per_cust = _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count("*").alias("n_ord"))
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("n_ord").isNull().cast("long")).alias("n_no_orders"),
        )
    )


def q_a13_minmax(spark, sf_dir):
    """A13: MIN/MAX pass through exact (extremes can't be sketched safely)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.min(_cents("o_totalprice")).alias("min_cents"),
        F.max(_cents("o_totalprice")).alias("max_cents"),
    )


def q_a14_topk_orderby_limit(spark, sf_dir):
    """A14: ORDER BY ... LIMIT k with a total order (tie-broken by key)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.sum(_cents("o_totalprice")).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("o_custkey"))
        .limit(10)
    )


def q_a16_subquery(spark, sf_dir):
    """A16: scalar-subquery shape (orders above global average price).

    Comparison done in exact integer arithmetic (cents·n > total_cents) so
    no float-average boundary flakiness between engines.
    """
    o = _t(spark, sf_dir, "orders").withColumn("cents", _cents("o_totalprice"))
    totals = o.agg(F.count("*").alias("n_total"), F.sum("cents").alias("total_cents"))
    return (
        o.crossJoin(F.broadcast(totals))
        .filter(F.col("cents") * F.col("n_total") > F.col("total_cents"))
        .agg(F.count("*").alias("n_above"), F.sum("cents").alias("sum_cents_above"))
    )


def q_a17_union(spark, sf_dir):
    """A17: UNION (deduplicating) of two filtered relations."""
    o = _t(spark, sf_dir, "orders").withColumn("cents", _cents("o_totalprice"))
    a = o.filter(F.col("o_totalprice") > 150000).select("o_orderkey", "cents")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", "cents")
    return a.unionByName(b).distinct().agg(
        F.count("*").alias("n_orders"), F.sum("cents").alias("sum_cents")
    )


# --------------------------------------------------------------------------
# b* — sketch queries; within_bound computed vs exact, oracle asserts TRUE
# --------------------------------------------------------------------------

_HLL_DOC = [SketchSpec("hll_doc", "hll", "doc_id", {"p": 14})]
_HLL_TOK = [SketchSpec("hll_tok", "hll", "tokens", {"p": 14})]
_CM_TOK = [SketchSpec("cm_tok", "cm", "tokens", {"eps": 1e-4, "delta": 0.01})]
_MG_TOK = [SketchSpec("mg_tok", "mg", "tokens", {"eps": 1e-3})]
_KLL_PRICE = [SketchSpec("kll_price", "kll", "l_extendedprice", {"k": 200})]
_TD_PRICE = [SketchSpec("td_price", "tdigest", "l_extendedprice", {"compression": 200})]
_DD_PRICE = [SketchSpec("dd_price", "dd", "l_extendedprice", {"alpha": 0.01})]
_BLOOM_USER = [SketchSpec("bloom_user", "bloom", "user_id", {"m_bits": 1 << 17, "h": 7})]
_MH_TOK = [SketchSpec("mh_tok", "minhash", "tokens", {"r": 256})]


def q_b01_hll_distinct_docs(spark, sf_dir):
    """Q1: approx COUNT(DISTINCT doc_id) GROUP BY source, within 3·RSE of exact."""
    docs = _t(spark, sf_dir, "documents")
    # exact pass overlapped with the sketch job (independent actions); the
    # sketch answer is served from PARTIAL states — one job, no merge
    # Exchange, driver-side canonical merge (byte-identical, see query.py)
    fut = _OVERLAP.submit(
        lambda: docs.groupBy("source").agg(F.countDistinct("doc_id").alias("exact")).toPandas()
    )
    states = partial_states(docs, _HLL_DOC, group_by="source")
    est = estimates_df(spark, states, "hll_doc", partial_specs=_HLL_DOC).toPandas()
    exact = fut.result()
    m = est.merge(exact, left_on="group", right_on="source")
    m["within_bound"] = (m["estimate"] - m["exact"]).abs() <= _hll_tol(m["exact"], m["rse_bound"])
    return spark.createDataFrame(m[["source", "within_bound"]])


def q_b23_distributed_estimates_highcard(spark, sf_dir):
    """High-cardinality GROUP BY (one group per order, ~15k at sf0.01 /
    ~150k at sf0.1): estimates_df auto-routes to the DISTRIBUTED path —
    estimation runs executor-side via mapInPandas over the merged state rows
    (no added shuffle, plan-asserted in tests/test_query_distributed.py) and
    the driver never materializes the state set. Each group's HLL estimate
    must sit within 3·RSE + small-n slack of the exact distinct count."""
    li = _t(spark, sf_dir, "lineitem").withColumn("okey", F.col("l_orderkey").cast("string"))
    states = build_sketches(
        li, [SketchSpec("hll_part", "hll", "l_partkey", {"p": 12})], group_by="okey"
    )
    est = estimates_df(spark, states, "hll_part")  # auto → distributed (>1000 groups)
    exact = li.groupBy("okey").agg(F.countDistinct("l_partkey").alias("exact"))
    j = est.join(exact, est["group"] == exact["okey"])
    tol = 3 * F.col("rse_bound") * F.col("exact") + F.lit(2.0)
    return j.select(
        F.col("okey").alias("grp"),
        (F.abs(F.col("estimate") - F.col("exact")) <= tol).alias("within_bound"),
    )


def q_b24_multicol_group_by(spark, sf_dir):
    """Multi-column GROUP BY (SURVEY A9): APPROX_COUNT_DISTINCT(doc_id)
    GROUP BY source, lang through the SQL front door. The composite key is
    factorized inside the one-pass kernel (states byte-identical to sketching
    a concat column — property test in tests/test_spark_build.py) and split
    back into native-typed output columns. Each (source, lang) estimate must
    sit within 3·RSE + small-n slack of exact."""
    from sketchlib.sql import approx_sql

    docs = _t(spark, sf_dir, "documents")
    est = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(doc_id, 0.01) FROM docs GROUP BY source, lang",
        tables={"docs": docs},
    )
    exact = docs.groupBy("source", "lang").agg(F.countDistinct("doc_id").alias("exact"))
    j = est.join(exact, ["source", "lang"])
    tol = 3 * F.col("rse_bound") * F.col("exact") + F.lit(2.0)
    return j.select(
        "source", "lang",
        (F.abs(F.col("estimate") - F.col("exact")) <= tol).alias("within_bound"),
    )


def q_b02_hll_distinct_tokens(spark, sf_dir):
    """Q2: approx COUNT(DISTINCT token) GROUP BY source over tokenized text."""
    raw = _t(spark, sf_dir, "documents")
    docs = with_tokens(raw)
    # exact pass: explode(pre_tokens)+hash instead of exploding the
    # transform()-built array — same ids, codegen'd (see tokenize.token_id);
    # raw text spread off the one-row-group scan before the heavy tokenize
    spread = _spread(spark, raw)
    fut = _OVERLAP.submit(
        lambda: spread.select("source", F.explode(pre_tokens("text")).alias("t"))
        .select("source", token_id("t").alias("tok"))
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("exact"))
        .toPandas()
    )
    states = partial_states(docs, _HLL_TOK, group_by="source")
    est = estimates_df(spark, states, "hll_tok", partial_specs=_HLL_TOK).toPandas()
    exact = fut.result()
    m = est.merge(exact, left_on="group", right_on="source")
    m["within_bound"] = (m["estimate"] - m["exact"]).abs() <= _hll_tol(m["exact"], m["rse_bound"])
    return spark.createDataFrame(m[["source", "within_bound"]])


def q_b03_cm_topk_tokens(spark, sf_dir):
    """Q3: top-k token frequencies per source; CM never undercounts, ≤ 3·ε·N over."""
    raw = _t(spark, sf_dir, "documents")
    docs = with_tokens(raw)
    # exact pass via explode(pre_tokens)+hash — same ids, codegen'd; raw
    # text spread off the one-row-group scan before the heavy tokenize
    spread = _spread(spark, raw)
    fut = _OVERLAP.submit(
        lambda: spread.select("source", F.explode(pre_tokens("text")).alias("t"))
        .select("source", token_id("t").alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("true_count"))
        .toPandas()
    )
    states = partial_states(docs, _CM_TOK, group_by="source")
    top = topk_df(spark, states, "cm_tok", 5, partial_specs=_CM_TOK).toPandas()
    exact = fut.result()
    m = top.merge(exact, left_on=["group", "token"], right_on=["source", "token"], how="left")
    m["true_count"] = m["true_count"].fillna(0)
    ok = (m["est_count"] >= m["true_count"]) & (m["est_count"] <= m["true_count"] + 3 * m["err_bound"])
    m["ok"] = ok
    agg = m.groupby("group")["ok"].all().reset_index()
    agg.columns = ["source", "within_bound"]
    return spark.createDataFrame(agg)


def _quantile_within(spark, sf_dir, specs, sketch):
    li = _t(spark, sf_dir, "lineitem")
    # pyarrow-direct scan (scan.py): the kernel reads ONLY the two needed
    # columns straight from parquet — no JVM row decode, no Arrow re-encode
    # across the Python boundary (measured 0.71 -> 0.48 s for the KLL build
    # at sf0.1); answered from partial states (query.py merge-free path)
    states = partial_states_from_parquet(
        spark, f"{sf_dir}/lineitem.parquet", specs, group_by="l_returnflag"
    )
    qd = quantiles_df(spark, states, sketch, [0.5, 0.9, 0.99], partial_specs=specs).toPandas()
    aggs, sizes = [], []
    for i, r in qd.iterrows():
        grp = F.col("l_returnflag") == r["group"]
        v = float(r["value"])
        aggs.append(F.sum((grp & (F.col("l_extendedprice") < v)).cast("long")).alias(f"lo_{i}"))
        aggs.append(F.sum((grp & (F.col("l_extendedprice") <= v)).cast("long")).alias(f"hi_{i}"))
    for g in qd["group"].unique():
        sizes.append(F.sum((F.col("l_returnflag") == g).cast("long")).alias(f"n_{g}"))
    row = li.agg(*aggs, *sizes).collect()[0]
    out = []
    for i, r in qd.iterrows():
        n = row[f"n_{r['group']}"]
        lo, hi = row[f"lo_{i}"] / n, row[f"hi_{i}"] / n
        err = max(0.0, lo - r["q"], r["q"] - hi)
        out.append((r["group"], float(r["q"]), bool(err <= r["rank_err_bound"] + 1.0 / n)))
    return spark.createDataFrame(
        pd.DataFrame(out, columns=["l_returnflag", "q", "within_bound"])
    )


def q_b04_kll_price_quantiles(spark, sf_dir):
    """Q4a: KLL p50/p90/p99 of l_extendedprice per returnflag within rank bound."""
    return _quantile_within(spark, sf_dir, _KLL_PRICE, "kll_price")


def q_b05_tdigest_price_quantiles(spark, sf_dir):
    """Q4b: t-digest quantiles within the KLL-proxy rank bound (BASELINE.md)."""
    return _quantile_within(spark, sf_dir, _TD_PRICE, "td_price")


def q_b52_dd_price_quantiles(spark, sf_dir):
    """Round 5 close: DDSketch p50/p90/p99 of l_extendedprice per
    returnflag within the RELATIVE VALUE bound |v̂ − v_q| ≤ α·|v_q|
    (Masson et al. VLDB 2019) — the quantile family's third member: KLL
    and t-digest bound the RANK, DDSketch bounds the VALUE, which is
    what a heavy-tailed p99.9 actually needs. The exact order statistic
    (rank ⌊q·(n−1)⌋+1, the sketch's convention) is computed DISTRIBUTED
    — a per-group row_number window probed at the target ranks — never
    a driver-side sort. Merge order independence (byte-identical states
    under any regrouping) is pytest-locked in tests/test_dd.py."""
    import math

    from pyspark.sql import Window
    from sketchlib.spark.query import rel_quantiles_df

    li = _t(spark, sf_dir, "lineitem")
    states = partial_states_from_parquet(
        spark, f"{sf_dir}/lineitem.parquet", _DD_PRICE, group_by="l_returnflag"
    )
    qd = rel_quantiles_df(
        spark, states, "dd_price", [0.5, 0.9, 0.99], partial_specs=_DD_PRICE
    ).toPandas()
    counts = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    targets = [
        (
            r["group"],
            float(r["q"]),
            int(math.floor(float(r["q"]) * (counts[r["group"]] - 1))) + 1,
        )
        for _, r in qd.iterrows()
    ]
    tdf = spark.createDataFrame(pd.DataFrame(targets, columns=["l_returnflag", "q", "rn"]))
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = (
        li.select("l_returnflag", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(tdf), ["l_returnflag", "rn"])
    )
    exact = {
        (r["l_returnflag"], round(r["q"], 6)): float(r["l_extendedprice"])
        for r in ranked.collect()
    }
    out = []
    for _, r in qd.iterrows():
        v_q = exact[(r["group"], round(float(r["q"]), 6))]
        ok = abs(float(r["value"]) - v_q) <= float(r["rel_err_bound"]) * abs(v_q) + 1e-9
        out.append((r["group"], float(r["q"]), bool(ok)))
    return spark.createDataFrame(
        pd.DataFrame(out, columns=["l_returnflag", "q", "within_bound"])
    )


def q_b53_rollup_grouping_sets(spark, sf_dir):
    """GROUP BY ROLLUP through the SQL door: every grouping set answered
    from ONE finest-grain sketch build — the coarser sets are KB-sized
    state MERGES (build.regroup_states), never rescans of the base table,
    so a rollup over registered states stays corpus-size-independent (the
    mergeable-sketch property made user-visible; Verdict's grammar had no
    grouping sets — this exceeds parity). Emits the SQL GROUPING() bitmask
    (``grouping_lvl``) row-compatible with DuckDB/Spark ROLLUP, checked
    here per row against the DISTRIBUTED exact rollup (Spark SQL
    grouping_id, no driver-side sort) within 3× the reported HLL rse.
    Merge associativity (rollup total == ungrouped estimate, byte-equal)
    is pytest-locked in tests/test_sql_rollup.py."""
    from sketchlib.sql import approx_sql

    T = {"t": os.path.join(sf_dir, "orders.parquet")}
    est = approx_sql(
        spark,
        "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM t "
        "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)",
        tables=T,
    ).toPandas()
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_b53_orders")
    exact = spark.sql(
        "SELECT coalesce(o_orderstatus, '(all)') AS s, "
        "coalesce(o_orderpriority, '(all)') AS p, "
        "CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS lvl, "
        "COUNT(DISTINCT o_custkey) AS d FROM _b53_orders "
        "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"
    ).toPandas()
    truth = {
        (r.s, r.p, int(r.lvl)): int(r.d) for r in exact.itertuples(index=False)
    }
    rows = []
    for _, r in est.iterrows():
        s = r["o_orderstatus"] if pd.notna(r["o_orderstatus"]) else "(all)"
        p = r["o_orderpriority"] if pd.notna(r["o_orderpriority"]) else "(all)"
        lvl = int(r["grouping_lvl"])
        d = truth[(s, p, lvl)]
        ok = abs(float(r["estimate"]) - d) <= 3.0 * float(r["rse_bound"]) * d + 2
        rows.append((s, p, lvl, bool(ok)))
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["o_orderstatus", "o_orderpriority", "grouping_lvl", "within_bound"],
        )
    )


def q_b54_kll_mad(spark, sf_dir):
    """Round-5 close: approximate MEDIAN ABSOLUTE DEVIATION per group from
    a SINGLE KLL state (query.mad_df) — the robust spread statistic for
    heavy-tailed quality/price distributions, where stddev is dominated by
    the very tail a gate is trying to cut. The textbook two-scan
    median(|x − median|) is replaced by inverting the sketch's own CDF
    around its served median m̂: the window mass F(m̂+t) − F(m̂−t) is known
    within ±2ε (uniform rank guarantee), so inverting at ½ ∓ 2ε BRACKETS
    the exact MAD-around-m̂. Verified here against the exact order
    statistic of |x − m̂| computed DISTRIBUTED (per-group row_number
    window at rank ⌈n/2⌉ — no driver-side sort). The inversion's window
    is CLOSED (tie atoms on the edge count — query._window_mass_fn), the
    same quantity the order statistic measures, so no atom-boundary
    allowance is needed."""
    import math

    from pyspark.sql import Window
    from sketchlib.spark.query import mad_df

    li = _t(spark, sf_dir, "lineitem")
    states = partial_states_from_parquet(
        spark, f"{sf_dir}/lineitem.parquet", _KLL_PRICE, group_by="l_returnflag"
    )
    md = mad_df(spark, states, "kll_price", partial_specs=_KLL_PRICE).toPandas()
    counts = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    centers = spark.createDataFrame(
        pd.DataFrame(
            [
                (r["group"], float(r["median_est"]), int(math.ceil(counts[r["group"]] / 2)))
                for _, r in md.iterrows()
            ],
            columns=["l_returnflag", "m_hat", "rn"],
        )
    )
    dev = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(centers.select("l_returnflag", "m_hat")), "l_returnflag")
        .withColumn("absdev", F.abs(F.col("l_extendedprice") - F.col("m_hat")))
    )
    w = Window.partitionBy("l_returnflag").orderBy("absdev")
    exact = {
        r["l_returnflag"]: float(r["absdev"])
        for r in dev.withColumn("rno", F.row_number().over(w))
        .join(
            F.broadcast(centers.select("l_returnflag", F.col("rn").alias("rno"))),
            ["l_returnflag", "rno"],
        )
        .collect()
    }
    out = []
    for _, r in md.iterrows():
        g = r["group"]
        ok = r["mad_lo"] - 1e-9 <= exact[g] <= r["mad_hi"] + 1e-9
        ok = ok and (r["mad_lo"] - 1e-12 <= r["mad_est"] <= r["mad_hi"] + 1e-12)
        out.append((g, bool(ok)))
    return spark.createDataFrame(pd.DataFrame(out, columns=["l_returnflag", "within_bound"]))


def q_b57_trimmed_mean(spark, sf_dir):
    """Round-5 close: approximate TRIMMED MEAN per group from a single
    KLL state (query.trimmed_mean_df) — the robust data-card aggregate
    ("mean excluding the top/bottom 10%") whose exact route is a full
    per-group sort. Served by averaging the sketch's own weighted coreset
    over the (0.1, 0.9] rank window with boundary proration; the corner
    windows (0.1∓ε, 0.9∓ε) bracket the exact trimmed mean to first order
    (window mean is monotone in both boundaries). Verified against the
    exact trimmed mean computed DISTRIBUTED (row_number window, keep
    rank ∈ (⌊0.1n⌋, ⌊0.9n⌋], one avg — no driver-side sort); the
    ≤1-row floor-vs-proration definitional slack is orders of magnitude
    inside the ±ε-rank bracket."""
    from pyspark.sql import Window
    from sketchlib.spark.query import trimmed_mean_df

    li = _t(spark, sf_dir, "lineitem")
    states = partial_states_from_parquet(
        spark, f"{sf_dir}/lineitem.parquet", _KLL_PRICE, group_by="l_returnflag"
    )
    tm = trimmed_mean_df(
        spark, states, "kll_price", lo=0.1, hi=0.9, partial_specs=_KLL_PRICE
    ).toPandas()
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    exact = {
        r["l_returnflag"]: float(r["tm_exact"])
        for r in (
            li.select("l_returnflag", "l_extendedprice")
            .withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count("*").over(Window.partitionBy("l_returnflag")))
            .filter(
                (F.col("rn") > F.floor(0.1 * F.col("n")))
                & (F.col("rn") <= F.floor(0.9 * F.col("n")))
            )
            .groupBy("l_returnflag")
            .agg(F.avg("l_extendedprice").alias("tm_exact"))
            .collect()
        )
    }
    out = []
    for _, r in tm.iterrows():
        g = r["group"]
        ok = r["tm_lo"] - 1e-9 <= exact[g] <= r["tm_hi"] + 1e-9
        ok = ok and (r["tm_lo"] - 1e-12 <= r["trimmed_mean"] <= r["tm_hi"] + 1e-12)
        out.append((g, bool(ok)))
    return spark.createDataFrame(pd.DataFrame(out, columns=["l_returnflag", "within_bound"]))


def q_b58_sql_robust_stats(spark, sf_dir):
    """Round-5 close: APPROX_MAD and APPROX_TRIMMED_MEAN through the SQL
    front door, ANSWERED FROM PERSISTED STATES ALONE (A5) — one registered
    KLL on l_extendedprice serves BOTH robust statistics with the base-
    table copy DELETED before querying, and EXPLAIN names the route +
    artifact first. Exact MAD-around-m̂ / trimmed mean (computed before
    deletion, pandas-side over the 3-group frame) must land inside each
    statement's served bracket."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql, explain_sql

    work = tempfile.mkdtemp(prefix="sketchlib_robust_")
    try:
        base = os.path.join(work, "li")
        (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .select("l_returnflag", "l_extendedprice").write.parquet(base))
        pdf = spark.read.parquet(base).toPandas()
        cat = SketchCatalog(spark, os.path.join(work, "cat"))
        t = {"li": base}
        approx_sql(
            spark,
            "CREATE SKETCHES rs FROM li KINDS kll(l_extendedprice, k=400) "
            "GROUP BY l_returnflag",
            t, catalog=cat,
        ).collect()
        ex = {r["property"]: r["value"] for r in explain_sql(
            spark, "SELECT APPROX_MAD(l_extendedprice) FROM li GROUP BY l_returnflag",
            t, catalog=cat,
        ).collect()}
        routed = "persisted_sketch_states" in ex.get("route", "") and ex.get("artifact") == "rs"
        shutil.rmtree(base)
        mad = {r["group"]: r for r in approx_sql(
            spark, "SELECT APPROX_MAD(l_extendedprice) FROM li GROUP BY l_returnflag",
            t, catalog=cat,
        ).collect()}
        tm = {r["group"]: r for r in approx_sql(
            spark,
            "SELECT APPROX_TRIMMED_MEAN(l_extendedprice, 0.1, 0.9) FROM li "
            "GROUP BY l_returnflag",
            t, catalog=cat,
        ).collect()}
        out = []
        for g, sub in pdf.groupby("l_returnflag"):
            x = np.sort(sub["l_extendedprice"].to_numpy())
            n = len(x)
            r_m, r_t = mad[g], tm[g]
            exact_mad = float(np.median(np.abs(x - r_m["median_est"])))
            exact_tm = float(x[int(np.floor(0.1 * n)):int(np.floor(0.9 * n))].mean())
            ok = (
                routed
                and r_m["mad_lo"] - 1e-9 <= exact_mad <= r_m["mad_hi"] + 1e-9
                and r_t["tm_lo"] - 1e-9 <= exact_tm <= r_t["tm_hi"] + 1e-9
            )
            out.append((g, bool(ok)))
        return spark.createDataFrame(
            pd.DataFrame(sorted(out), columns=["l_returnflag", "within_bound"])
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_b59_weighted_tdigest_quantiles(spark, sf_dir):
    """Round-5 close: WEIGHTED quantiles from ``tdigest(col, weight=w)`` —
    the value below which q of the TOTAL WEIGHT lies (here: the price
    below which a quarter/half/90% of shipped QUANTITY sits; over a token
    corpus, tdigest(n_tok, weight=n_tok) answers "the sequence length
    holding the median TOKEN" — the statistic training-budget math needs,
    which the row-population quantile is NOT). Centroids carry fractional
    weights natively; the kernel feeds (value, weight) rows per group in
    both build strategies. Verified: each served value's exact WEIGHTED
    rank (conditional weight sums, one pass) within the digest's rank
    bound of q, plus a max-row-weight atom allowance (one heavy row is
    the discrete rank step the < / ≤ bracket straddles)."""
    li = _t(spark, sf_dir, "lineitem")
    specs = [SketchSpec("td_w", "tdigest", "l_extendedprice",
                        {"compression": 200}, weight="l_quantity")]
    states = build_sketches(li, specs, group_by="l_returnflag")
    qd = quantiles_df(spark, states, "td_w", [0.25, 0.5, 0.9]).toPandas()
    wcol = F.col("l_quantity").cast("double")
    aggs, sizes = [], []
    for i, r in qd.iterrows():
        grp = F.col("l_returnflag") == r["group"]
        v = float(r["value"])
        aggs.append(F.sum(F.when(grp & (F.col("l_extendedprice") < v), wcol)
                          .otherwise(0.0)).alias(f"lo_{i}"))
        aggs.append(F.sum(F.when(grp & (F.col("l_extendedprice") <= v), wcol)
                          .otherwise(0.0)).alias(f"hi_{i}"))
    for g in qd["group"].unique():
        grp = F.col("l_returnflag") == g
        sizes.append(F.sum(F.when(grp, wcol).otherwise(0.0)).alias(f"W_{g}"))
        sizes.append(F.max(F.when(grp, wcol)).alias(f"wmax_{g}"))
    row = li.agg(*aggs, *sizes).collect()[0]
    out = []
    for i, r in qd.iterrows():
        W = row[f"W_{r['group']}"]
        lo, hi = row[f"lo_{i}"] / W, row[f"hi_{i}"] / W
        err = max(0.0, lo - r["q"], r["q"] - hi)
        ok = err <= r["rank_err_bound"] + row[f"wmax_{r['group']}"] / W
        out.append((r["group"], float(r["q"]), bool(ok)))
    return spark.createDataFrame(
        pd.DataFrame(out, columns=["l_returnflag", "q", "within_bound"])
    )


def q_b60_sql_frequent(spark, sf_dir):
    """Round-5 close: APPROX_FREQUENT(col, k) through the SQL front door —
    the DETERMINISTIC heavy hitters (Misra-Gries: never overcounts, exact
    undercount certificate with no failure probability), ANSWERED FROM
    PERSISTED STATES with the base-table copy DELETED (A5). Every served
    token's exact count (computed before deletion) must sit in
    [est, est + undercount_bound] — the certificate has no slack to give.
    EXPLAIN names the route + artifact first; APPROX_TOPK is also asked
    and must NOT auto-select the mg registration (inverse bound
    contracts never cross-serve)."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql, explain_sql, resolve_catalog_key

    work = tempfile.mkdtemp(prefix="sketchlib_freq_")
    try:
        base = os.path.join(work, "li")
        (_t(spark, sf_dir, "lineitem")
         .selectExpr("l_returnflag", "l_suppkey AS t").write.parquet(base))
        pdf = spark.read.parquet(base).toPandas()
        cat = SketchCatalog(spark, os.path.join(work, "cat"))
        t = {"li": base}
        approx_sql(
            spark, "CREATE SKETCHES fs FROM li KINDS mg(t, eps=0.001) "
            "GROUP BY l_returnflag", t, catalog=cat,
        ).collect()
        stmt = "SELECT APPROX_FREQUENT(t, 5) FROM li GROUP BY l_returnflag"
        ex = {r["property"]: r["value"] for r in explain_sql(
            spark, stmt, t, catalog=cat).collect()}
        routed = ("persisted_sketch_states" in ex.get("route", "")
                  and ex.get("artifact") == "fs")
        no_cross = resolve_catalog_key(
            spark, "SELECT APPROX_TOPK(t, 5) FROM li GROUP BY l_returnflag", t, cat
        ) is None
        shutil.rmtree(base)
        served = approx_sql(spark, stmt, t, catalog=cat).toPandas()
        out = []
        for g, sub in pdf.groupby("l_returnflag"):
            true = sub["t"].value_counts()
            rows = served[served["group"] == g]
            ok = routed and no_cross and len(rows) == 5
            for _, x in rows.iterrows():
                c = int(true.get(x["token"], 0))
                ok = ok and (x["est_count"] <= c <= x["est_count"] + x["undercount_bound"])
            out.append((g, bool(ok)))
        return spark.createDataFrame(
            pd.DataFrame(sorted(out), columns=["l_returnflag", "within_bound"])
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_b55_equidepth_histogram(spark, sf_dir):
    """Round-5 close: EQUI-DEPTH bin edges per group from the registered
    KLL state (query.equidepth_histogram_df) — equal-mass feature
    bucketing without the full per-group sort (NTILE) the exact route
    needs. Each of the 8 bins' TRUE mass (computed distributed via
    conditional aggregates — two comparisons per edge, one pass, no
    window) must sit within 2ε of 1/8, ε the sketch's uniform rank
    bound, plus a 1/n tie-atom allowance."""
    from sketchlib.spark.query import equidepth_histogram_df

    li = _t(spark, sf_dir, "lineitem")
    states = partial_states_from_parquet(
        spark, f"{sf_dir}/lineitem.parquet", _KLL_PRICE, group_by="l_returnflag"
    )
    n_bins = 8
    hb = equidepth_histogram_df(
        spark, states, "kll_price", n_bins, partial_specs=_KLL_PRICE
    ).toPandas()
    aggs = [
        F.sum((F.col("l_returnflag") == g).cast("long")).alias(f"n_{g}")
        for g in hb["group"].unique()
    ]
    for i, r in hb.iterrows():
        grp = F.col("l_returnflag") == r["group"]
        x = F.col("l_extendedprice")
        mass = (grp & (x <= r["hi"])).cast("long") - (grp & (x <= r["lo"])).cast("long")
        if int(r["bin"]) == 0:
            mass = mass + (grp & (x == r["lo"])).cast("long")
        aggs.append(F.sum(mass).alias(f"c_{i}"))
    row = li.agg(*aggs).collect()[0]
    out = []
    for i, r in hb.iterrows():
        n = row[f"n_{r['group']}"]
        frac = row[f"c_{i}"] / n
        ok = abs(frac - 1.0 / n_bins) <= 2.0 * float(r["rank_err_bound"]) + 1.0 / n
        out.append((r["group"], int(r["bin"]), bool(ok)))
    return spark.createDataFrame(
        pd.DataFrame(out, columns=["l_returnflag", "bin", "within_bound"])
    )


def q_b56_mg_topk_tokens(spark, sf_dir):
    """Round 5: Misra-Gries top-k token frequencies per source — the
    DETERMINISTIC complement of b03's Count-Min route (Misra & Gries 1982;
    merge form Agarwal et al., Mergeable Summaries, 2013, the theorem this
    library's whole KB-state merge layer is built on). Where CM never
    undercounts and overshoots ≤ ε·N w.p. ≥ 1−δ, MG never OVERcounts and
    undershoots by a bound it tracks EXACTLY (the cumulative decrement),
    so the check here has no 3σ slack and no failure probability:
    est ≤ true AND true ≤ est + bound must hold for EVERY reported token
    (``within_bound``), and the tracked bound must sit under the published
    a-priori N/(k+1) worst case (``cert_ok``). Built through the same
    zero-shuffle kernel (one state per partition × source), merged through
    the same semilattice; regrouping-invariance of the certificate is
    hypothesis-locked in tests/test_mg.py."""
    from sketchlib.spark.query import mg_topk_df

    docs = with_tokens(_t(spark, sf_dir, "documents"))
    states = build_sketches(docs, _MG_TOK, group_by="source")
    top = mg_topk_df(spark, states, "mg_tok", 5).toPandas()
    exact = (
        docs.select("source", F.explode("tokens").alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("true_count"))
        .toPandas()
    )
    totals = (
        docs.select("source", F.size("tokens").alias("n"))
        .groupBy("source").agg(F.sum("n").alias("N")).toPandas()
        .set_index("source")["N"]
    )
    m = top.merge(exact, left_on=["group", "token"], right_on=["source", "token"], how="left")
    m["true_count"] = m["true_count"].fillna(0)
    ok = (m["est_count"] <= m["true_count"]) & (
        m["true_count"] <= m["est_count"] + m["undercount_bound"]
    )
    m["ok"] = ok
    k_counters = _MG_TOK[0].params["k"] if "k" in _MG_TOK[0].params else None
    from sketchlib.planner import mg_params

    k_counters = k_counters or mg_params(_MG_TOK[0].params["eps"])["k"]
    m["cert"] = [
        b <= totals[g] / (k_counters + 1) + 1e-9
        for g, b in zip(m["group"], m["undercount_bound"])
    ]
    agg = m.groupby("group").agg(within_bound=("ok", "all"), cert_ok=("cert", "all"))
    agg = agg.reset_index().rename(columns={"group": "source"})
    return spark.createDataFrame(agg)


def q_c44_embedding_spectrum(spark, sf_dir):
    """Frequent Directions embedding-covariance sketch (Liberty KDD 2013 /
    Ghashami et al. SICOMP 2016): one zero-shuffle build over the
    embeddings table grouped by label gives, per group, a mergeable ℓ×d
    matrix whose singular values bracket every Gram eigenvalue EXACTLY —
    σ_i²(B) ≤ λ_i(AᵀA) ≤ σ_i²(B) + Δ with Δ = the accumulated shrink mass
    (a computable certificate, not a probabilistic tail). The corpus-drift
    / intrinsic-rank diagnostic a 100 TB embedding pipeline runs without a
    second pass: states are KBs, merge like every other sketch, and
    register/refresh through the same catalog DDL (fd(col, d=, ell=)).
    The exact spectrum here is computed DISTRIBUTED: per-partition partial
    d×d Gram matrices via mapInPandas, summed driver-side (d² floats per
    partition — the same partials-then-KB-merge shape as the sketch
    build). Emits per (label × component) bracket booleans."""
    from pyspark.sql.types import ArrayType, DoubleType, StringType, StructField, StructType

    from sketchlib.spark.query import spectrum_df

    d, ell, r = 64, 16, 3
    emb = _t(spark, sf_dir, "embeddings")
    states = build_sketches(
        emb, [SketchSpec("sp", "fd", "embedding", {"d": d, "ell": ell})],
        group_by="label",
    )
    got = spectrum_df(spark, states, "sp", r).toPandas()

    schema = StructType([
        StructField("label", StringType()),
        StructField("gram", ArrayType(DoubleType())),
    ])

    def partial_gram(pdf_iter):
        for pdf in pdf_iter:
            for lab, sub in pdf.groupby("label"):
                M = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
                yield pd.DataFrame(
                    {"label": [str(lab)], "gram": [(M.T @ M).ravel().tolist()]}
                )

    partials = emb.select("label", "embedding").mapInPandas(partial_gram, schema)
    grams: dict[str, np.ndarray] = {}
    for row in partials.collect():  # ≤ partitions × groups rows of d² floats
        g = grams.setdefault(row["label"], np.zeros(d * d))
        g += np.asarray(row["gram"])
    out = []
    for _, rr in got.iterrows():
        lam = np.linalg.eigvalsh(grams[rr["group"]].reshape(d, d))[::-1]
        truth = float(lam[int(rr["component"])])
        sq, delta = float(rr["sq_singular_value"]), float(rr["cov_err_bound"])
        tol = 1e-9 * abs(truth) + 1e-9
        ok = sq <= truth + tol and truth <= sq + delta + tol
        out.append((rr["group"], int(rr["component"]), bool(ok)))
    return spark.createDataFrame(
        pd.DataFrame(out, columns=["label", "component", "within_bracket"])
    )


def q_c45_embedding_drift(spark, sf_dir):
    """Embedding-distribution drift from KB states (spectrum_drift_df):
    two fd registrations answer "has the corpus moved since the last
    drop" with zero corpus scans — per-group covariance eigenvalues
    (Gram/n) with their Δ/n certificates plus the top-r principal
    SUBSPACE AFFINITY ‖V_aᵀV_b‖_F²/r. Checked against three
    deterministic transforms with GUARANTEED outcomes: an identical
    rebuild (affinity 1, zero eigen change), a ×2 scaling (affinity 1,
    eigenvalues ×4 — certificate-interval overlap asserted), and a
    coordinate reversal (an orthogonal permutation: eigenvalues
    invariant within certificates while directions move). Eigenvalues
    catch variance drift; affinity catches rotation drift variances
    miss."""
    from sketchlib.spark.query import spectrum_drift_df

    emb = _t(spark, sf_dir, "embeddings")
    spec = lambda: [SketchSpec("sp", "fd", "embedding", {"d": 64, "ell": 16})]
    sa = build_sketches(emb, spec(), group_by="label")
    sb = build_sketches(emb, spec(), group_by="label")
    sc = build_sketches(
        emb.withColumn("embedding", F.expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))")),
        spec(), group_by="label",
    )
    sd = build_sketches(
        emb.withColumn("embedding", F.expr("reverse(embedding)")),
        spec(), group_by="label",
    )
    idn = spectrum_drift_df(spark, sa, sb, "sp", "sp", r=3).toPandas()
    sca = spectrum_drift_df(spark, sa, sc, "sp", "sp", r=3).toPandas()
    rev = spectrum_drift_df(spark, sa, sd, "sp", "sp", r=3).toPandas()

    def _overlap(ea, erra, eb, errb, scale):
        # certificate intervals [s·ea, s·(ea+erra)] and [eb, eb+errb]
        lo_a, hi_a = scale * ea, scale * (ea + erra)
        tol = 1e-9 * max(hi_a, eb + errb) + 1e-12
        return bool(lo_a <= eb + errb + tol and eb <= hi_a + tol)

    out = []
    for g in sorted(idn["group"].unique()):
        gi = idn[idn["group"] == g]
        gs = sca[sca["group"] == g]
        gr = rev[rev["group"] == g]
        ok_id = bool(
            np.allclose(gi["subspace_affinity"], 1.0)
            and np.allclose(gi["eig_rel_change"], 0.0)
        )
        ok_sc = bool(all(
            _overlap(r["cov_eig_a"], r["err_a"], r["cov_eig_b"], r["err_b"], 4.0)
            for _, r in gs.iterrows()
        ))
        ok_rev = bool(all(
            _overlap(r["cov_eig_a"], r["err_a"], r["cov_eig_b"], r["err_b"], 1.0)
            for _, r in gr.iterrows()
        ))
        out.append((g, ok_id, ok_sc, ok_rev))
    return spark.createDataFrame(
        pd.DataFrame(
            out,
            columns=["label", "identity_no_drift", "scaled_eig_x4", "rotation_eig_invariant"],
        )
    )


def q_c46_freq_drift(spark, sf_dir):
    """Token-frequency DRIFT between two corpus snapshots from CM states
    alone (freq_delta_topk_df): Count-Min is linear, so two same-geometry
    registrations subtract — "which tokens' counts moved most since the
    last drop" with zero corpus scans (the vocabulary companion to c45's
    embedding drift; absolute-change deltoids per Cormode & Muthukrishnan
    ToN 2005, served from the candidate heaps the states already carry).
    Snapshot b drops every third document, so every source genuinely
    drifts. Checks per source: (1) every reported change estimate
    brackets the EXACT per-token change within the published asymmetric
    interval d̂−d ∈ [−ε·Nₐ, +ε·N_b] and the reported symmetric bound;
    (2) a true maximal-|change| token appears in the reported top-k
    (complete here: the per-source vocab is far below cand_cap, so the
    candidate union covers every token)."""
    from sketchlib.spark.query import freq_delta_topk_df

    docs = with_tokens(_t(spark, sf_dir, "documents")).select(
        "doc_id", "source", "tokens"
    )
    snap_b = docs.filter(F.col("doc_id") % 3 != 0)
    sa = build_sketches(docs, _CM_TOK, group_by="source")
    sb = build_sketches(snap_b, _CM_TOK, group_by="source")
    fd = freq_delta_topk_df(spark, sa, sb, "cm_tok", "cm_tok", k=5).toPandas()

    tok = lambda d: d.select("source", F.explode("tokens").alias("token"))
    exact = (
        tok(docs).groupBy("source", "token").agg(F.count("*").alias("ca"))
        .join(
            tok(snap_b).groupBy("source", "token").agg(F.count("*").alias("cb")),
            ["source", "token"], "full_outer",
        )
        .fillna(0, subset=["ca", "cb"])
        .toPandas()
    )
    exact["d"] = exact["cb"] - exact["ca"]
    na = exact.groupby("source")["ca"].sum()
    nb = exact.groupby("source")["cb"].sum()
    lookup = exact.set_index(["source", "token"])["d"]
    eps = _CM_TOK[0].params["eps"]

    out = []
    for g, sub in fd.groupby("group"):
        ok = True
        for _, r in sub.iterrows():
            d_true = int(lookup.get((g, int(r["token"])), 0))
            diff = int(r["delta_est"]) - d_true
            ok &= -eps * na[g] <= diff <= eps * nb[g]
            ok &= abs(diff) <= r["err_bound"]
        ge = exact[exact["source"] == g]
        top_true = set(ge.loc[ge["d"].abs() == ge["d"].abs().max(), "token"])
        recovered = bool(top_true & set(sub["token"].astype(int)))
        out.append((g, bool(ok), recovered))
    return spark.createDataFrame(
        pd.DataFrame(out, columns=["source", "within_bound", "top_change_recovered"])
    )


def q_c47_temperature_mixture(spark, sf_dir):
    """Temperature-scaled mixture weights (temperature_weights): the
    multilingual/domain re-balancing transform every pretraining mix
    states on its data card (p_i ∝ n_i^T, Conneau & Lample 2019 §3.1;
    XLM-R/mT5's sampling-temperature knob) — one exact per-source count
    pass, closed-form weights, and the (target_tokens, epochs) plan a
    2×-inventory budget implies (epochs > 1 ⇒ the source up-samples via
    upsample_mixture's deterministic replication). VALUE-matched at 6 dp
    vs DuckDB computing the identical expression shapes; both engines
    use POWER/** from the same libm, and the 6-dp rounding absorbs
    summation-order float noise in the normalizers (the c38–c43
    convention)."""
    from sketchlib.spark.sampling import temperature_weights

    docs = _t(spark, sf_dir, "documents")
    budget = 2 * docs.agg(F.sum("n_chars")).collect()[0][0]
    rep = temperature_weights(
        docs, 0.7, len_col="n_chars", source_col="source", token_budget=budget
    )
    return rep.select(
        "source",
        "available_tokens",
        F.round("natural_share", 6).alias("natural_share"),
        F.round("weight", 6).alias("weight"),
        F.round("target_tokens", 2).alias("target_tokens"),
        F.round("epochs", 6).alias("epochs"),
    )


def q_c48_percentile_normalize(spark, sf_dir):
    """Per-source percentile normalization, EXACT mode (the step between
    quality scoring and thresholding — raw scores are not comparable
    across sources, gates are stated on the per-source CDF): CUME_DIST
    semantics incl. tie sharing, VALUE-matched per document vs DuckDB
    running the identical window."""
    from sketchlib.spark.sampling import percentile_normalize

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return percentile_normalize(
        docs, "n_chars", group_col="source", round_to=6
    ).select("doc_id", "source", "pct_rank")


def q_c49_percentile_gate_kll(spark, sf_dir):
    """Per-source percentile normalization, KLL-SERVED mode (the 100 TB /
    delta path: KB states closure-broadcast, ONE mapInArrow scoring pass,
    no shuffle, no per-group sort): every document's sketch-served
    percentile lands within KLL's published normalized rank-error bound
    of the exact per-source CUME_DIST, per source — and the scoring plan
    is exchange-free (asserted in-query: a plan regression would flip
    the boolean, not just slow down)."""
    from sketchlib.spark.sampling import percentile_normalize

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    k = 200
    states = build_sketches(
        docs, [SketchSpec("q", "kll", "n_chars", {"k": k})], group_by="source"
    )
    served = percentile_normalize(
        docs, "n_chars", group_col="source", states=states, sketch="q", out="pct_kll"
    )
    no_exchange = "Exchange" not in served._jdf.queryExecution().executedPlan().toString()
    exact = percentile_normalize(docs, "n_chars", group_col="source", out="pct_exact")
    eps = 3.31 / k
    agg = (
        served.select("doc_id", "source", "pct_kll")
        .join(exact.select("doc_id", "pct_exact"), "doc_id")
        .groupBy("source")
        .agg(
            (F.max(F.abs(F.col("pct_kll") - F.col("pct_exact"))) <= eps).alias(
                "within_bound"
            )
        )
    )
    return agg.withColumn("scoring_plan_shuffle_free", F.lit(bool(no_exchange)))


def q_c50_fuzzy_contamination(spark, sf_dir):
    """FUZZY benchmark decontamination (contamination_fuzzy): MinHash-LSH
    between train and eval shingle sets — the paraphrase net behind the
    exact pass (Brown et al. 2020 App. C). The planted leak is each of
    the 20 longest documents with every 8th token substituted: that
    leaves NO 8 consecutive unchanged tokens, so exact 8-gram
    decontamination (c14's operator) finds ZERO pairs — asserted — while
    3-gram shingle Jaccard stays ≈ 0.45 and the fuzzy pass recovers
    every planted (train, eval) pair through the banded probe
    (eval bands broadcast, train side map-side, candidates capped and
    signature-verified JVM-side)."""
    from sketchlib.spark.dedup import contamination_fuzzy, contamination_pairs

    docs = with_tokens(_t(spark, sf_dir, "documents")).select("doc_id", "tokens")
    plant_src = (
        docs.orderBy(F.size("tokens").desc(), "doc_id").limit(20).localCheckpoint()
    )
    evals = plant_src.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.expr(
            "transform(tokens, (x, i) -> CASE WHEN i % 8 = 0 "
            "THEN CAST(x + 1 AS BIGINT) ELSE x END)"
        ).alias("tokens"),
    ).localCheckpoint()
    planted = {
        (r["doc_id"], r["doc_id"] + 10_000_000)
        for r in plant_src.select("doc_id").collect()
    }

    exact_hits = contamination_pairs(docs, evals, n=8).count()
    fuzzy = contamination_fuzzy(
        docs, evals, n=3, r=128, n_bands=64, threshold=0.25
    ).collect()
    got = {(r["train_id"], r["eval_id"]) for r in fuzzy}
    return spark.createDataFrame(
        [(len(planted), bool(planted <= got), bool(exact_hits == 0))],
        "n_planted long, all_found_fuzzy boolean, none_found_exact boolean",
    )


def q_c52_streaming_scramble(spark, sf_dir):
    """Round-5 close: the SAMPLING half of continuous maintenance
    (`StreamingScrambleSink`) — a document stream keeps a persisted
    uniform scramble current as batches land, so APPROX_COUNT/SUM/AVG
    always have a fresh p-fraction table. The inclusion coin is a keyed
    hash on doc_id (replay-deterministic — Spark's partition-RNG sample
    is not), so the drained stream's scramble is ROW-IDENTICAL to the
    same coin over the static table. Checks: row-identity, batch-replay
    idempotency, conflicting-contract refusal, and the uniform-sample
    SUM estimator over the sink's table covering the exact total."""
    import shutil
    import tempfile

    from sketchlib.spark.sampling import approx_agg_from_uniform_sample
    from sketchlib.spark.streaming import StreamingScrambleSink

    docs = (
        _t(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("string").alias("doc_id"),
                F.col("n_chars").cast("double").alias("val"))
        .orderBy("doc_id")
        .limit(4000)
        .cache()
    )
    root = tempfile.mkdtemp(prefix="scramble_c52_")
    try:
        src = os.path.join(root, "src")
        half = docs.limit(2000)
        half.coalesce(1).write.parquet(f"{src}/a")
        docs.exceptAll(half).coalesce(1).write.parquet(f"{src}/b")
        sd = os.path.join(root, "scramble")
        sink = StreamingScrambleSink(sd, id_col="doc_id", ratio=0.25, seed=11)
        stream = (
            spark.readStream.schema("doc_id string, val double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        samp = sink.sample(spark)
        got = sorted((r["doc_id"], r["val"]) for r in samp.collect())
        want = sorted((r["doc_id"], r["val"]) for r in sink.coin(docs).collect())
        row_identical = got == want and 0 < len(got) < 4000
        n_before = len(got)
        # replay the frame batch 0 ACTUALLY held (FileStreamSource orders
        # by mtime — back-to-back writes can tie and flip batch order)
        b0 = {r["doc_id"] for r in spark.read.parquet(
            os.path.join(sd, "b0000000000")).collect()}
        first = (half if {r["doc_id"] for r in sink.coin(half).collect()} == b0
                 else docs.exceptAll(half))
        sink(first, 0)
        replay_ok = sink.sample(spark).count() == n_before
        try:
            StreamingScrambleSink(sd, id_col="doc_id", ratio=0.5, seed=11)
            refused = False
        except ValueError:
            refused = True
        est = approx_agg_from_uniform_sample(
            sink.sample(spark), None, "val", 0.25
        ).collect()[0]
        exact = docs.agg(F.sum("val")).collect()[0][0]
        within = abs(est["est_sum"] - float(exact)) <= est["sum_err"] * (3.29 / 1.96)
        return spark.createDataFrame(
            pd.DataFrame(
                [
                    ("conflicting_contract_refused", bool(refused)),
                    ("replay_idempotent", bool(replay_ok)),
                    ("row_identical_to_static_draw", bool(row_identical)),
                    ("sum_within_ci", bool(within)),
                ],
                columns=["property", "ok"],
            )
        )
    finally:
        docs.unpersist()
        shutil.rmtree(root, ignore_errors=True)


def q_c51_corpus_drift(spark, sf_dir):
    """One-stop corpus drift report (corpus_drift_df): two snapshot state
    sets (full corpus vs every-third-doc-dropped) over four sketch kinds
    in ONE build pass each — "what changed since the last drop" from KB
    states, zero corpus scans. Checks per source: (1) the report carries
    every expected (sketch, metric) row; (2) CM ``mass`` values are
    EXACTLY the two snapshots' token counts (CM totals are exact); (3)
    each side's HLL ``distinct`` estimate brackets the exact per-side
    vocabulary within 3× the reported combined rse bound; (4) the
    MinHash ``jaccard`` of the snapshots' vocabularies is within 4·SE of
    the exact set Jaccard; (5) an identical-snapshot report drifts by
    exactly ZERO (byte-identical states) with jaccard exactly 1."""
    from sketchlib.spark.query import corpus_drift_df

    docs = with_tokens(_t(spark, sf_dir, "documents")).select(
        "doc_id", "source", "n_chars", "tokens"
    )
    snap_b = docs.filter(F.col("doc_id") % 3 != 0)
    specs = lambda: [
        SketchSpec("h", "hll", "tokens", {"p": 14}),
        SketchSpec("c", "cm", "tokens", {"eps": 1e-4, "delta": 0.01}),
        SketchSpec("q", "kll", "n_chars", {"k": 200}),
        SketchSpec("m", "minhash", "tokens", {"r": 256}),
    ]
    sa = build_sketches(docs, specs(), group_by="source").localCheckpoint()
    sb = build_sketches(snap_b, specs(), group_by="source")
    rep = corpus_drift_df(spark, sa, sb).toPandas()
    idn = corpus_drift_df(spark, sa, sa).toPandas()

    tok = lambda d: d.select("source", F.explode("tokens").alias("t"))
    exact = (
        tok(docs).distinct().groupBy("source").agg(F.count("*").alias("va"))
        .join(
            tok(snap_b).distinct().groupBy("source").agg(F.count("*").alias("vb")),
            "source",
        )
        .join(
            tok(docs).groupBy("source").agg(F.count("*").alias("ma")), "source"
        )
        .join(
            tok(snap_b).groupBy("source").agg(F.count("*").alias("mb")), "source"
        )
        .join(
            tok(docs).distinct()
            .join(tok(snap_b).distinct(), ["source", "t"])
            .groupBy("source").agg(F.count("*").alias("inter")),
            "source",
        )
        .toPandas()
        .set_index("source")
    )
    want = {"distinct", "mass", "p50", "p90", "p99", "jaccard"}
    out = []
    for g in sorted(exact.index):
        e = exact.loc[g]
        sub = rep[rep["group"] == g]
        metrics_present = want <= set(sub["metric"])
        mass = sub[sub["metric"] == "mass"].iloc[0]
        mass_exact = mass["value_a"] == e["ma"] and mass["value_b"] == e["mb"]
        d = sub[sub["metric"] == "distinct"].iloc[0]
        distinct_within = (
            abs(d["value_a"] - e["va"]) <= 3 * d["bound"] * e["va"]
            and abs(d["value_b"] - e["vb"]) <= 3 * d["bound"] * e["vb"]
        )
        true_j = e["inter"] / (e["va"] + e["vb"] - e["inter"])
        j = sub[sub["metric"] == "jaccard"].iloc[0]
        jaccard_within = abs(j["value_a"] - true_j) <= 4 * j["bound"] + 1e-12
        gi = idn[idn["group"] == g]
        nums = gi[gi["metric"].isin(["distinct", "mass", "p50", "p90", "p99"])]
        identity_zero = bool(
            (nums["rel_change"] == 0.0).all()
            and (gi[gi["metric"] == "jaccard"]["value_a"] == 1.0).all()
        )
        out.append((g, bool(metrics_present), bool(mass_exact),
                    bool(distinct_within), bool(jaccard_within), identity_zero))
    return spark.createDataFrame(
        pd.DataFrame(out, columns=[
            "source", "metrics_present", "mass_exact", "distinct_within",
            "jaccard_within", "identity_zero_drift",
        ])
    )


def q_b06_bloom_membership(spark, sf_dir):
    """Q5: Bloom token/user membership — zero false negatives, per group."""
    ev = _t(spark, sf_dir, "events")
    states = build_sketches(ev, _BLOOM_USER, group_by="event_type")
    present = ev.select("event_type", "user_id").distinct().toPandas()
    blooms = {g: sk for (g, _), sk in load_states(states).items()}
    out = []
    for g, sub in present.groupby("event_type"):
        keys = sub["user_id"].to_numpy()
        fn = int((~blooms[g].contains(keys)).sum())
        out.append((g, fn))
    return spark.createDataFrame(pd.DataFrame(out, columns=["event_type", "false_negatives"]))


def q_b07_minhash_jaccard(spark, sf_dir):
    """MinHash source-pair token-vocabulary Jaccard within 5·SE of exact."""
    docs = with_tokens(_t(spark, sf_dir, "documents"))
    states = build_sketches(docs, _MH_TOK, group_by="source")
    from sketchlib.spark.query import jaccard_df

    jd = jaccard_df(spark, states, "mh_tok").toPandas()
    pairs = docs.select("source", F.explode("tokens").alias("tok")).distinct().toPandas()
    vocab = {g: set(sub["tok"]) for g, sub in pairs.groupby("source")}
    out = []
    for _, r in jd.iterrows():
        a, b = vocab[r["group_a"]], vocab[r["group_b"]]
        true_j = len(a & b) / len(a | b) if (a | b) else 0.0
        out.append((r["group_a"], r["group_b"], bool(abs(r["jaccard_est"] - true_j) <= 5 * r["se_bound"])))
    return spark.createDataFrame(pd.DataFrame(out, columns=["group_a", "group_b", "within_bound"]))


def q_b08_hll_union_groups(spark, sf_dir):
    """A17 sketch-level UNION: merging per-source HLL states answers the
    global COUNT(DISTINCT doc_id) without re-scanning — within 3·RSE + slack."""
    from sketchlib.spark.query import union_estimate

    docs = _t(spark, sf_dir, "documents")
    states = build_sketches(docs, _HLL_DOC, group_by="source")
    est, rse = union_estimate(states, "hll_doc")
    exact = docs.select(F.countDistinct("doc_id")).collect()[0][0]
    ok = abs(est - exact) <= _hll_tol(exact, rse)
    return spark.createDataFrame(pd.DataFrame({"within_bound": [bool(ok)]}))


def q_b09_sampled_agg_uniform(spark, sf_dir):
    """Verdict's core rewrite (A10): COUNT/SUM/AVG from a 10% uniform sample
    with CLT confidence intervals — exact answers must fall inside them."""
    from sketchlib.spark.sampling import approx_agg_uniform

    li = _t(spark, sf_dir, "lineitem")
    approx = approx_agg_uniform(li, "l_returnflag", "l_extendedprice", 0.1, seed=7, z=3.29).toPandas()
    exact = (
        li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_extendedprice").alias("s"))
        .toPandas()
    )
    m = approx.merge(exact, on="l_returnflag")
    m["within_ci"] = ((m["est_count"] - m["n"]).abs() <= m["count_err"]) & (
        (m["est_sum"] - m["s"]).abs() <= m["sum_err"]
    )
    return spark.createDataFrame(m[["l_returnflag", "within_ci"]])


def q_b13_universe_distinct(spark, sf_dir):
    """A11: COUNT(DISTINCT) via universe (domain) sampling, CI-checked."""
    from sketchlib.spark.sampling import approx_count_distinct_universe

    li = _t(spark, sf_dir, "lineitem")
    r = approx_count_distinct_universe(li, "l_partkey", 0.2, seed=7, z=3.29).collect()[0]
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    ok = abs(r["est_distinct"] - exact) <= r["distinct_err"]
    return spark.createDataFrame(pd.DataFrame({"within_ci": [bool(ok)]}))


def q_b14_kmv_distinct(spark, sf_dir):
    """KMV (bottom-k) distinct count per source — exact below k, bounded above."""
    docs = _t(spark, sf_dir, "documents")
    states = build_sketches(
        docs, [SketchSpec("kmv_doc", "kmv", "doc_id", {"k": 1024})], group_by="source"
    )
    est = estimates_df(spark, states, "kmv_doc").toPandas()
    exact = docs.groupBy("source").agg(F.countDistinct("doc_id").alias("exact")).toPandas()
    m = est.merge(exact, left_on="group", right_on="source")
    ok = np.where(
        m["rse_bound"] == 0.0,
        m["estimate"] == m["exact"],  # below-k: exact by construction
        (m["estimate"] - m["exact"]).abs() <= 3 * m["rse_bound"] * m["exact"],
    )
    m["within_bound"] = ok
    return spark.createDataFrame(m[["source", "within_bound"]])


def q_b16_catalog_sql(spark, sf_dir):
    """A2→A3→A5 end-to-end: CREATE SAMPLE analog persists states to a
    catalog, then the SQL front door answers APPROX_COUNT_DISTINCT from
    those states alone (the base table is not read at query time) — checked
    within the usual HLL bound vs exact."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    root = tempfile.mkdtemp(prefix="sketchcat_b16_")
    try:
        cat = SketchCatalog(spark, root)
        cat.create(
            "docs", f"{sf_dir}/documents.parquet", [SketchSpec("hll_doc", "hll", "doc_id", {"p": 14})],
            group_by="source",
        )
        est = approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM docs GROUP BY source",
            catalog=cat,
            catalog_key="docs",
        ).toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents")
    exact = docs.groupBy("source").agg(F.countDistinct("doc_id").alias("exact")).toPandas()
    m = est.merge(exact, left_on="group", right_on="source")
    m["within_bound"] = (m["estimate"] - m["exact"]).abs() <= _hll_tol(m["exact"], m["rse_bound"])
    return spark.createDataFrame(m[["source", "within_bound"]])


def q_b25_stratified_avg_sql(spark, sf_dir):
    """Stratified APPROX_AVG end-to-end through SQL strings only: CREATE
    SAMPLE ... KIND stratified via the DDL front door (A2 literal), then
    APPROX_AVG answered from the persisted scramble (A5). Per-stratum ratio
    estimator with that stratum's own fraction — full-fraction strata are
    exact (zero error), sampled strata within 3σ of exact."""
    import json
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    docs = _t(spark, sf_dir, "documents")
    sources = sorted(r["source"] for r in docs.select("source").distinct().collect())
    fractions = {s: (1.0 if i % 2 == 0 else 0.8) for i, s in enumerate(sources)}
    root = tempfile.mkdtemp(prefix="sketchcat_b25_")
    try:
        cat = SketchCatalog(spark, root)
        fr = json.dumps(fractions)
        approx_sql(
            spark,
            f"CREATE SAMPLE docs_st FROM {sf_dir}/documents.parquet "
            f"KIND stratified ON source FRACTIONS '{fr}' SEED 11",
            catalog=cat,
        ).collect()
        est = approx_sql(
            spark,
            "SELECT APPROX_AVG(n_chars, 0.8) FROM docs GROUP BY source",
            catalog=cat,
            catalog_key="docs_st",
        ).toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    exact = docs.groupBy("source").agg(F.avg("n_chars").alias("true_avg")).toPandas()
    m = est.merge(exact, on="source")
    m["within_bound"] = (m["est_avg"] - m["true_avg"]).abs() <= m["avg_err"] * (3 / 1.96) + 1e-9
    return spark.createDataFrame(m[["source", "within_bound"]])


def q_b10_partition_invariance(spark, sf_dir):
    """Mergeability contract, driver-checked (replaces round-1's rows-only
    estimate surface): building the same HLL states under a DIFFERENT
    partitioning must give BYTE-IDENTICAL merged states — register-wise max
    is commutative/associative and serialization is canonical, so the
    persisted sample (A2) is independent of cluster layout. This is the
    property that makes build-once-query-many safe across recomputes."""
    docs = _t(spark, sf_dir, "documents")
    s1 = build_sketches(docs, _HLL_DOC, group_by="source").toPandas()
    s2 = build_sketches(docs.repartition(7), _HLL_DOC, group_by="source").toPandas()
    a = {r["group"]: bytes(r["state"]) for _, r in s1.iterrows()}
    b = {r["group"]: bytes(r["state"]) for _, r in s2.iterrows()}
    rows = [(g, bool(g in b and a[g] == b[g])) for g in sorted(a)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["source", "states_identical"]))


def q_b11_hybrid_topk(spark, sf_dir):
    """Sketch→exact hybrid (Verdict's approximate-to-locate, exact-to-answer
    move): CM candidates prune the token domain, one filtered exact pass
    rescores — the result must EQUAL the true exact top-5 per source
    (same (count desc, token asc) tie-break on both paths). Replaces
    round-1's rows-only estimates query with a hash-checkable boolean."""
    from pyspark.sql.window import Window

    from sketchlib.spark.query import exact_rescore_topk

    docs = with_tokens(_t(spark, sf_dir, "documents"))
    states = build_sketches(docs, _CM_TOK, group_by="source")
    hybrid = exact_rescore_topk(docs, states, "cm_tok", 5, tokens_col="tokens", group_by="source").toPandas()
    w = Window.partitionBy("group").orderBy(F.desc("exact_count"), F.asc("token"))
    exact = (
        docs.select(F.col("source").alias("group"), F.explode("tokens").alias("token"))
        .groupBy("group", "token")
        .agg(F.count("*").alias("exact_count"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .drop("_rn")
        .toPandas()
    )
    key = lambda d: {  # noqa: E731
        g: sorted(zip(sub["token"], sub["exact_count"])) for g, sub in d.groupby("group")
    }
    hk, ek = key(hybrid), key(exact)
    rows = [(g, bool(hk.get(g) == ek[g])) for g in sorted(ek)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["source", "hybrid_matches_exact"]))


def q_b15_approx_join(spark, sf_dir):
    """Verdict A8 ApproxJoinedRelation: universe-sample BOTH join sides on
    the shared key (same hash/seed) — survival probabilities compose to p,
    not p², so COUNT/SUM of the join scale by 1/p with a CI the exact
    answer must fall inside."""
    from sketchlib.spark.sampling import approx_join_agg

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    est = approx_join_agg(
        o, c, "o_custkey", "c_custkey", value_col="o_totalprice", ratio=0.2, seed=7, z=3.29
    ).collect()[0]
    exact = (
        o.join(c, o.o_custkey == c.c_custkey)
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()[0]
    )
    ok_n = abs(est["est_count"] - exact["n"]) <= est["count_err"]
    ok_s = abs(est["est_sum"] - exact["s"]) <= est["sum_err"]
    return spark.createDataFrame(
        pd.DataFrame({"count_within_ci": [bool(ok_n)], "sum_within_ci": [bool(ok_s)]})
    )


def q_b26_approx_join_sql(spark, sf_dir):
    """b15's ApproxJoinedRelation re-expressed through the SQL front door
    end-to-end: CREATE SAMPLE ... KIND universe DDL persists both scrambles
    (same ratio+seed so survival probabilities compose to p, not p²), then
    one JOIN statement answers APPROX_SUM from the persisted samples alone.
    Exact join count and sum must fall inside the ~3.3σ CI."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    root = tempfile.mkdtemp(prefix="sketchcat_b26_")
    try:
        cat = SketchCatalog(spark, root)
        approx_sql(
            spark,
            f"CREATE SAMPLE os FROM {sf_dir}/orders.parquet KIND universe RATIO 0.2 ON o_custkey SEED 7",
            catalog=cat,
        ).collect()
        approx_sql(
            spark,
            f"CREATE SAMPLE cs FROM {sf_dir}/customer.parquet KIND universe RATIO 0.2 ON c_custkey SEED 7",
            catalog=cat,
        ).collect()
        est = approx_sql(
            spark,
            "SELECT APPROX_SUM(o_totalprice) FROM orders JOIN customer "
            "ON orders.o_custkey = customer.c_custkey",
            tables={"orders": f"{sf_dir}/orders.parquet", "customer": f"{sf_dir}/customer.parquet"},
            catalog=cat,
            catalog_key="os,cs",
        ).collect()[0]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    exact = (
        o.join(c, o.o_custkey == c.c_custkey)
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()[0]
    )
    wide = 3.29 / 1.96
    ok_n = abs(est["est_count"] - exact["n"]) <= est["count_err"] * wide
    ok_s = abs(est["est_sum"] - exact["s"]) <= est["sum_err"] * wide
    return spark.createDataFrame(
        pd.DataFrame({"count_within_ci": [bool(ok_n)], "sum_within_ci": [bool(ok_s)]})
    )


def q_b30_join_where_sql(spark, sf_dir):
    """Round 4 (VERDICT r3 #2): WHERE on an approximate JOIN statement. The
    predicate filters the joined scramble rows before aggregation — row
    predicates commute with universe sampling (key survival is independent
    of the row filter), so the same 1/p scale-up is unbiased for the
    FILTERED join. Answered from two persisted universe scrambles; the
    exact filtered join count and sum must fall inside the ~3.3σ CI."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    root = tempfile.mkdtemp(prefix="sketchcat_b30_")
    pred = "o_totalprice > 100000"
    try:
        cat = SketchCatalog(spark, root)
        for ddl in (
            f"CREATE SAMPLE os FROM {sf_dir}/orders.parquet KIND universe RATIO 0.2 ON o_custkey SEED 7",
            f"CREATE SAMPLE cs FROM {sf_dir}/customer.parquet KIND universe RATIO 0.2 ON c_custkey SEED 7",
        ):
            approx_sql(spark, ddl, catalog=cat).collect()
        est = approx_sql(
            spark,
            "SELECT APPROX_SUM(o_totalprice) FROM orders JOIN customer "
            f"ON orders.o_custkey = customer.c_custkey WHERE {pred}",
            tables={"orders": f"{sf_dir}/orders.parquet", "customer": f"{sf_dir}/customer.parquet"},
            catalog=cat,
            catalog_key="os,cs",
        ).collect()[0]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    exact = (
        o.join(c, o.o_custkey == c.c_custkey).filter(pred)
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()[0]
    )
    wide = 3.29 / 1.96
    ok_n = abs(est["est_count"] - exact["n"]) <= est["count_err"] * wide
    ok_s = abs(est["est_sum"] - exact["s"]) <= est["sum_err"] * wide
    return spark.createDataFrame(
        pd.DataFrame({"count_within_ci": [bool(ok_n)], "sum_within_ci": [bool(ok_s)]})
    )


def q_b31_join_alias_mixed_sql(spark, sf_dir):
    """Round 4 (VERDICT r3 #4): Verdict's most common join shape — a
    SAMPLED FACT table joined to a small EXACT dimension — through the SQL
    door with table aliases: FROM orders o JOIN customer c ON o.o_custkey =
    c.c_custkey GROUP BY c_mktsegment. Only the fact side has a scramble
    (uniform, auto-selected); the dim side is read exact and broadcast.
    Every segment's exact count and revenue must fall inside the ~3.3σ CI,
    and every segment must be present (the dim grouping column comes from
    the broadcast side)."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    root = tempfile.mkdtemp(prefix="sketchcat_b31_")
    try:
        cat = SketchCatalog(spark, root)
        approx_sql(
            spark,
            f"CREATE SAMPLE ou FROM {sf_dir}/orders.parquet KIND uniform RATIO 0.5 SEED 11",
            catalog=cat,
        ).collect()
        est = approx_sql(
            spark,
            "SELECT APPROX_SUM(o_totalprice) FROM orders o JOIN customer c "
            "ON o.o_custkey = c.c_custkey GROUP BY c_mktsegment",
            tables={"orders": f"{sf_dir}/orders.parquet", "customer": f"{sf_dir}/customer.parquet"},
            catalog=cat,
        ).toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    exact = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .toPandas()
    )
    m = est.merge(exact, on="c_mktsegment", how="outer")
    wide = 3.29 / 1.96
    m["count_within_ci"] = (m["est_count"] - m["n"]).abs() <= m["count_err"] * wide + 1e-9
    m["sum_within_ci"] = (m["est_sum"] - m["s"]).abs() <= m["sum_err"] * wide + 1e-9
    out = m[["c_mktsegment", "count_within_ci", "sum_within_ci"]].sort_values("c_mktsegment")
    return spark.createDataFrame(out)


def q_b32_approx_subquery(spark, sf_dir):
    """Round 4 (VERDICT r3 #5): approx-over-approx derived tables — the
    inner statement (per-priority APPROX_COUNT_DISTINCT of customers) is
    itself approximate; the outer APPROX_PERCENTILE sketches its estimate
    column. The inner stage's error surfaces as the inner_rel_err_max
    caveat column; the bound-aware oracle checks the exact median of the
    EXACT per-group distinct counts lies within the composed tolerance
    (outer is rank-exact over 5 values; inner contributes 3σ of its
    reported relative error plus HLL small-n collision slack)."""
    from sketchlib.sql import approx_sql

    stmt = (
        "SELECT APPROX_PERCENTILE(estimate, 0.5) FROM "
        "(SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM orders GROUP BY o_orderpriority)"
    )
    out = approx_sql(spark, stmt, tables={"orders": f"{sf_dir}/orders.parquet"}).toPandas()
    has_caveat = "inner_rel_err_max" in out.columns and float(out["inner_rel_err_max"].iloc[0]) > 0
    o = _t(spark, sf_dir, "orders")
    exact = sorted(
        r["d"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    )
    exact_med = float(exact[len(exact) // 2])
    est = float(out["value"].iloc[0])
    tol = 3 * float(out["inner_rel_err_max"].iloc[0]) * exact_med + 2.0
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "caveat_present": [bool(has_caveat)],
                "median_within_tol": [bool(abs(est - exact_med) <= tol)],
            }
        )
    )


def q_b33_in_subquery_where(spark, sf_dir):
    """Round 5 (VERDICT r4 #4): IN-subquery predicates in approximate
    statements — ``APPROX_SUM(x) FROM t WHERE k IN (SELECT k FROM dim
    WHERE ...)``. filter() strings reject subqueries, so the WHERE routes
    through spark.sql over registered views; Catalyst plans the
    uncorrelated IN as a (broadcast) semi-join. Exercised on BOTH serving
    paths: a persisted uniform scramble (filtering commutes with Bernoulli
    sampling, so the registered 1/p scale-up is unbiased for the
    subquery-filtered population) and the on-the-fly grouped sketch path
    (HLL over the semi-joined scan). Exact answers must fall inside the
    ~3.3σ CI / 3σ HLL bound."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    tabs = {
        "orders": f"{sf_dir}/orders.parquet",
        "customer": f"{sf_dir}/customer.parquet",
    }
    pred = (
        "o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"
    )
    root = tempfile.mkdtemp(prefix="sketchcat_b33_")
    try:
        cat = SketchCatalog(spark, root)
        approx_sql(
            spark,
            f"CREATE SAMPLE us FROM {tabs['orders']} KIND uniform RATIO 0.25 SEED 7",
            catalog=cat,
        ).collect()
        est = approx_sql(
            spark,
            f"SELECT APPROX_SUM(o_totalprice) FROM orders WHERE {pred}",
            tabs, catalog=cat, catalog_key="us",
        ).collect()[0]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    keys = c.filter("c_mktsegment = 'BUILDING'").select(
        F.col("c_custkey").alias("o_custkey")
    )
    filt = o.join(keys, "o_custkey", "leftsemi")
    exact_sum = filt.agg(F.sum("o_totalprice")).collect()[0][0]
    wide = 3.29 / 1.96
    sum_ok = abs(est["est_sum"] - exact_sum) <= est["sum_err"] * wide

    cd = approx_sql(
        spark,
        f"SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM orders WHERE {pred} "
        "GROUP BY o_orderstatus",
        tabs,
    ).toPandas()
    exact_cd = {
        r["o_orderstatus"]: r["d"]
        for r in filt.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    cd_ok = set(cd["group"]) == set(exact_cd) and all(
        abs(r["estimate"] - exact_cd[r["group"]])
        <= _hll_tol(exact_cd[r["group"]], r["rse_bound"])
        for _, r in cd.iterrows()
    )
    return spark.createDataFrame(
        pd.DataFrame(
            {"sample_sum_within_ci": [bool(sum_ok)], "sketch_cd_within_bound": [bool(cd_ok)]}
        )
    )


def q_b34_explain_routing(spark, sf_dir):
    """Round 5: EXPLAIN through the SQL door — Verdict's which-sample-
    served question, answered BEFORE execution: statement kind, route
    (persisted states / persisted sample / on-the-fly), and the artifact
    auto-selection would pick. Nothing is read or built (classification +
    registry lookups only). Value-matched: the (stmt, property, value)
    rows are deterministic strings, so the DuckDB oracle states them
    literally."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    tabs = {
        "orders": f"{sf_dir}/orders.parquet",
        "documents": f"{sf_dir}/documents.parquet",
    }
    root = tempfile.mkdtemp(prefix="sketchcat_b34_")
    try:
        cat = SketchCatalog(spark, root)
        approx_sql(
            spark,
            f"CREATE SAMPLE us FROM {tabs['orders']} KIND uniform RATIO 0.25 SEED 7",
            catalog=cat,
        ).collect()
        approx_sql(
            spark,
            f"CREATE SKETCHES dd FROM {tabs['documents']} KINDS hll(doc_id) GROUP BY source",
            catalog=cat,
        ).collect()
        stmts = {
            "states": "EXPLAIN SELECT APPROX_COUNT_DISTINCT(doc_id) FROM documents GROUP BY source",
            "sample": "EXPLAIN SELECT APPROX_SUM(o_totalprice) FROM orders",
            "otf": "EXPLAIN SELECT APPROX_SUM(o_totalprice, 0.5) FROM orders",
        }
        rows = []
        for label, stmt in stmts.items():
            for r in approx_sql(spark, stmt, tabs, catalog=cat).collect():
                rows.append((label, r["property"], r["value"]))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["stmt", "property", "value"])
    )


def q_b35_setop_sql(spark, sf_dir):
    """Round 5: sketch-merge SET OPERATIONS through the SQL door (A17
    exceeded — Verdict passed set-ops through unapproximated). UNION /
    INTERSECT / EXCEPT of the orders custkey space vs the lineitem suppkey
    space are each answered from PER-SIDE sketch states built in one pass
    over the narrow unioned projections — the sides are never
    distinct-shuffled or materialized (at 100 TB a UNION-distinct of two
    fact tables is among the biggest shuffles a query can ask for; HLL
    register-max IS set union). Checks: estimate within 3× the emitted
    composed bound (+2 discrete slack) of the Spark-exact set size, AND
    EXPLAIN classifies the statement as the sketch route (sketch_routed)."""
    from sketchlib.sql import approx_sql

    tabs = {
        "orders": f"{sf_dir}/orders.parquet",
        "lineitem": f"{sf_dir}/lineitem.parquet",
    }
    o = spark.read.parquet(tabs["orders"]).select(F.col("o_custkey").alias("k"))
    li = spark.read.parquet(tabs["lineitem"]).select(F.col("l_suppkey").alias("k"))
    exact = {
        "union": o.union(li).distinct().count(),
        "intersect": o.distinct().intersect(li.distinct()).count(),
        "except": o.distinct().exceptAll(li.distinct()).count(),
    }
    out = []
    for op in ("UNION", "INTERSECT", "EXCEPT"):
        q = (
            "SELECT APPROX_COUNT_DISTINCT(o_custkey, 0.01) AS est FROM "
            f"(SELECT o_custkey FROM orders {op} "
            "SELECT l_suppkey AS o_custkey FROM lineitem)"
        )
        r = approx_sql(spark, q, tabs).collect()[0]
        ok = abs(r["est"] - exact[op.lower()]) <= 3 * r["est_err"] + 2
        props = {
            row["property"]: row["value"]
            for row in approx_sql(spark, "EXPLAIN " + q, tabs).collect()
        }
        routed = (
            props.get("statement_kind") == "approx_setop"
            and props.get("set_operation") == op.lower()
        )
        out.append((op.lower(), bool(ok), bool(routed)))
    return spark.createDataFrame(
        pd.DataFrame(out, columns=["op", "within_bound", "sketch_routed"])
    )


def q_b36_union_rewrite(spark, sf_dir):
    """Round 5: UNION → UNION ALL rewrite for duplicate-insensitive heads
    (the general-shape complement to b35's state-merge route). A GROUPED
    count-distinct over a UNION of two fact-table key spaces is answered
    with the distinct shuffle ELIDED — row dedup never changes a column's
    distinct-value set, so the rewrite is exact, and at 100 TB the distinct
    exchange it removes is a full shuffle of both fact tables. Checks per
    group: estimate within 3× the relative bound (+2 discrete slack) of the
    Spark-exact count, and EXPLAIN reports the rewrite."""
    from sketchlib.sql import approx_sql

    tabs = {
        "orders": f"{sf_dir}/orders.parquet",
        "lineitem": f"{sf_dir}/lineitem.parquet",
    }
    q = (
        "SELECT APPROX_COUNT_DISTINCT(k, 0.02) FROM "
        "(SELECT o_custkey % 4 AS g, o_custkey AS k FROM orders "
        "UNION SELECT l_suppkey % 4 AS g, l_suppkey AS k FROM lineitem) "
        "GROUP BY g"
    )
    props = {
        row["property"]: row["value"]
        for row in approx_sql(spark, "EXPLAIN " + q, tabs).collect()
    }
    rewritten = "union_rewrite" in props
    exact = {
        int(r["g"]): r["n"]
        for r in spark.sql(
            "SELECT g, COUNT(DISTINCT k) AS n FROM ("
            f"SELECT o_custkey % 4 AS g, o_custkey AS k FROM parquet.`{tabs['orders']}` "
            "UNION ALL "
            f"SELECT l_suppkey % 4 AS g, l_suppkey AS k FROM parquet.`{tabs['lineitem']}`"
            ") GROUP BY g"
        ).collect()
    }
    out = []
    for r in approx_sql(spark, q, tabs).collect():
        g, est, rel = int(r["group"]), r[1], r[2]
        ok = abs(est - exact[g]) <= 3 * rel * est + 2
        out.append((g, bool(ok), bool(rewritten)))
    return spark.createDataFrame(
        pd.DataFrame(sorted(out), columns=["g", "within_bound", "rewrite_applied"])
    )


def q_b37_grouped_setop(spark, sf_dir):
    """Round 5: GROUPED INTERSECT/EXCEPT through the sketch-merge route —
    `APPROX_COUNT_DISTINCT(k) FROM (a INTERSECT|EXCEPT b) GROUP BY g` with
    both sides projecting the key alongside the value. One sketch-build
    pass keyed by (side × group), per-group HLL+MinHash merges; the set
    operation is never materialized or distinct-shuffled (the shape the
    UNION ALL rewrite cannot claim — INTERSECT/EXCEPT semantics depend on
    per-row matching). Checks per (op, group): estimate within 3× the
    emitted ABSOLUTE bound (+2 discrete slack) of the Spark-exact per-group
    set size, group key restored to its native type under the user's name,
    and EXPLAIN classifies the statement as the grouped sketch route."""
    from sketchlib.sql import approx_sql

    tabs = {
        "orders": f"{sf_dir}/orders.parquet",
        "lineitem": f"{sf_dir}/lineitem.parquet",
    }
    od = (spark.read.parquet(tabs["orders"])
          .selectExpr("o_custkey AS k", "o_custkey % 4 AS g").distinct())
    ld = (spark.read.parquet(tabs["lineitem"])
          .selectExpr("l_suppkey AS k", "l_suppkey % 4 AS g").distinct())
    exact = {
        "intersect": {r["g"]: r["c"] for r in od.intersect(ld)
                      .groupBy("g").agg(F.count("*").alias("c")).collect()},
        "except": {r["g"]: r["c"] for r in od.exceptAll(ld)
                   .groupBy("g").agg(F.count("*").alias("c")).collect()},
    }
    out = []
    for op in ("INTERSECT", "EXCEPT"):
        q = (
            "SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS est FROM "
            f"(SELECT o_custkey AS k, o_custkey % 4 AS g FROM orders {op} "
            "SELECT l_suppkey AS k, l_suppkey % 4 AS g FROM lineitem) GROUP BY g"
        )
        props = {
            row["property"]: row["value"]
            for row in approx_sql(spark, "EXPLAIN " + q, tabs).collect()
        }
        routed = (
            props.get("statement_kind") == "approx_setop"
            and props.get("set_operation") == op.lower()
            and props.get("group_by") == "g"
        )
        rows = {int(r["g"]): r for r in approx_sql(spark, q, tabs).collect()}
        for g, ex in sorted(exact[op.lower()].items()):
            r = rows.get(int(g))
            ok = r is not None and abs(r["est"] - ex) <= 3 * r["est_err"] + 2
            out.append((op.lower(), f"g{int(g)}", bool(ok), bool(routed)))
    return spark.createDataFrame(
        pd.DataFrame(out, columns=["op", "grp", "within_bound", "sketch_routed"])
    )


def q_b38_setop_from_states(spark, sf_dir):
    """Round 5: set operations ANSWERED FROM PERSISTED STATES ALONE —
    Verdict's A5 substitution (scan the artifact, never the base) extended
    to UNION/INTERSECT/EXCEPT. Each side's registered sketch set (HLL +
    MinHash on the key column, one side registered GROUPED on purpose —
    merging per-group states IS the whole-table sketch) serves the
    statement; proven by DELETING both base-table copies before querying.
    Checks per op: estimate within 3× the emitted bound (+2 slack) of the
    exact set size (computed before deletion), and EXPLAIN reports the
    states route with both artifact names."""
    import shutil
    import tempfile

    from sketchlib.planner import hll_params
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    work = tempfile.mkdtemp(prefix="sketchlib_setopst_")
    try:
        ca = os.path.join(work, "orders_keys")
        cb = os.path.join(work, "lineitem_keys")
        (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .selectExpr("o_custkey AS k", "o_custkey % 4 AS g").write.parquet(ca))
        (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .selectExpr("l_suppkey AS k", "l_suppkey % 4 AS g").write.parquet(cb))
        ka = {r["k"] for r in spark.read.parquet(ca).select("k").distinct().collect()}
        kb = {r["k"] for r in spark.read.parquet(cb).select("k").distinct().collect()}
        sets = {"union": ka | kb, "intersect": ka & kb, "except": ka - kb}
        cat = SketchCatalog(spark, os.path.join(work, "cat"))
        specs = [SketchSpec("h_k", "hll", "k", {"p": hll_params(0.01)["p"]}),
                 SketchSpec("m_k", "minhash", "k", {"r": 1024})]
        # ONE pair of grouped registrations serves BOTH shapes: grouped
        # statements match the grouping exactly; global statements merge
        # across the groups (register-max/element-min IS the whole table)
        cat.create("orders_k", ca, specs, group_by="g")
        cat.create("lineitem_k", cb, specs, group_by="g")
        shutil.rmtree(ca)
        shutil.rmtree(cb)
        t = {"ta": ca, "tb": cb}
        out = []
        for op in ("UNION", "INTERSECT", "EXCEPT"):
            sel = sets[op.lower()]
            q = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS est FROM "
                 f"(SELECT k FROM ta {op} SELECT k FROM tb)")
            props = {
                row["property"]: row["value"]
                for row in approx_sql(spark, "EXPLAIN " + q, t, catalog=cat).collect()
            }
            routed = ("PERSISTED STATES" in str(props.get("route", ""))
                      and props.get("artifacts") == "orders_k, lineitem_k")
            r = approx_sql(spark, q, t, catalog=cat).collect()[0]
            ok = abs(r["est"] - len(sel)) <= 3 * r["est_err"] + 2
            out.append((op.lower(), bool(ok), bool(routed)))

            gq = ("SELECT APPROX_COUNT_DISTINCT(k, 0.01) AS est FROM "
                  f"(SELECT k, g FROM ta {op} SELECT k, g FROM tb) GROUP BY g")
            gprops = {
                row["property"]: row["value"]
                for row in approx_sql(spark, "EXPLAIN " + gq, t, catalog=cat).collect()
            }
            grouted = "PERSISTED STATES" in str(gprops.get("route", ""))
            rows = {r["g"]: r for r in approx_sql(spark, gq, t, catalog=cat).collect()}
            exact_g = {}
            for k in sel:  # g comes back bigint (the recorded native type)
                exact_g[int(k % 4)] = exact_g.get(int(k % 4), 0) + 1
            gok = set(rows) == set(exact_g) and all(
                abs(rows[g]["est"] - ex) <= 3 * rows[g]["est_err"] + 2
                for g, ex in exact_g.items()
            )
            out.append((f"grouped_{op.lower()}", bool(gok), bool(grouted)))
        return spark.createDataFrame(
            pd.DataFrame(out, columns=["op", "within_bound", "states_routed"])
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_b39_unionall_merge_states(spark, sf_dir):
    """Round 5: UNION ALL bodies answered by MERGING persisted states —
    the mergeable-sketch generalization of A5: a bag concatenation's sketch
    IS the merge of the per-side sketches, so APPROX_PERCENTILE (KLL) and
    APPROX_TOPK (Count-Min) over ``(a UNION ALL b)`` run with ZERO
    base-table scan (both bases deleted before querying). One pair of
    GROUPED registrations serves the global statements (merging a set's
    per-group states is the whole-table sketch) AND the grouped one.
    Checks: each returned percentile's exact rank within the emitted rank
    bound, top-k counts within the CM bound, EXPLAIN reporting the merge
    route with both artifact names."""
    import shutil
    import tempfile

    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    work = tempfile.mkdtemp(prefix="sketchlib_uamerge_")
    try:
        ca = os.path.join(work, "orders_v")
        cb = os.path.join(work, "lineitem_v")
        (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .selectExpr("o_totalprice AS v", "o_custkey AS tok",
                     "o_custkey % 4 AS g").write.parquet(ca))
        (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .selectExpr("l_extendedprice AS v", "l_suppkey AS tok",
                     "l_suppkey % 4 AS g").write.parquet(cb))
        pa = spark.read.parquet(ca).toPandas()
        pb = spark.read.parquet(cb).toPandas()
        both = pd.concat([pa, pb], ignore_index=True)
        cat = SketchCatalog(spark, os.path.join(work, "cat"))
        specs = [SketchSpec("k_v", "kll", "v", {"k": 200}),
                 SketchSpec("c_tok", "cm", "tok", {"eps": 1e-4, "delta": 0.01})]
        cat.create("ua_orders", ca, specs, group_by="g")
        cat.create("ua_lineitem", cb, specs, group_by="g")
        shutil.rmtree(ca)
        shutil.rmtree(cb)
        t = {"ta": ca, "tb": cb}

        def props_of(stmt):
            return {r["property"]: r["value"]
                    for r in approx_sql(spark, "EXPLAIN " + stmt, t, catalog=cat).collect()}

        out = []
        q1 = ("SELECT APPROX_PERCENTILE(v, 0.5, 0.9) FROM "
              "(SELECT v FROM ta UNION ALL SELECT v FROM tb)")
        p1 = props_of(q1)
        routed1 = (p1.get("statement_kind") == "approx_unionall_merge"
                   and p1.get("artifacts") == "ua_orders, ua_lineitem")
        n = len(both)
        ok1 = True
        for r in approx_sql(spark, q1, t, catalog=cat).collect():
            rank_of = float((both.v <= r["value"]).sum()) / n
            ok1 = ok1 and abs(rank_of - r["q"]) <= r["rank_err_bound"] + 2.0 / n
        out.append(("percentile_global", bool(ok1), bool(routed1)))

        q2 = ("SELECT APPROX_PERCENTILE(v, 0.5) FROM "
              "(SELECT v, g FROM ta UNION ALL SELECT v, g FROM tb) GROUP BY g")
        p2 = props_of(q2)
        routed2 = p2.get("statement_kind") == "approx_unionall_merge"
        rows = approx_sql(spark, q2, t, catalog=cat).collect()
        ok2 = {r["group"] for r in rows} == {str(v) for v in both.g.unique()}
        for r in rows:
            grp = both[both.g == int(r["group"])].v
            rank_of = float((grp <= r["value"]).sum()) / len(grp)
            ok2 = ok2 and abs(rank_of - 0.5) <= r["rank_err_bound"] + 2.0 / len(grp)
        out.append(("percentile_grouped", bool(ok2), bool(routed2)))

        q3 = ("SELECT APPROX_TOPK(tok, 5) FROM "
              "(SELECT tok FROM ta UNION ALL SELECT tok FROM tb)")
        p3 = props_of(q3)
        routed3 = p3.get("statement_kind") == "approx_unionall_merge"
        vc = both.tok.value_counts()
        ok3 = True
        for r in approx_sql(spark, q3, t, catalog=cat).collect():
            ok3 = ok3 and abs(r["est_count"] - int(vc.get(r["token"], 0))) <= r["err_bound"]
        out.append(("topk_global", bool(ok3), bool(routed3)))
        return spark.createDataFrame(
            pd.DataFrame(out, columns=["chk", "within_bound", "states_routed"])
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_b40_unionall_sample_route(spark, sf_dir):
    """Round 5: UNION ALL bodies under COUNT/SUM/AVG heads answered from
    persisted uniform SAMPLES — equal-ratio Bernoulli scrambles of the
    sides concatenate into one Bernoulli sample of the bag, so the single
    Horvitz-Thompson estimator runs over the p-fraction tables only (both
    bases deleted before querying). Checks: global SUM and grouped COUNT
    within their CIs (3.3σ), side-local WHERE applied to the sample rows,
    EXPLAIN reporting the sample route with both artifact names."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    work = tempfile.mkdtemp(prefix="sketchlib_uasample_")
    wide = 3.29 / 1.96
    try:
        ca = os.path.join(work, "orders_v")
        cb = os.path.join(work, "lineitem_v")
        (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .selectExpr("o_totalprice AS v", "o_custkey % 4 AS g").write.parquet(ca))
        (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .selectExpr("l_extendedprice AS v", "l_suppkey % 4 AS g").write.parquet(cb))
        pa = spark.read.parquet(ca).toPandas()
        pb = spark.read.parquet(cb).toPandas()
        both = pd.concat([pa, pb], ignore_index=True)
        cat = SketchCatalog(spark, os.path.join(work, "cat"))
        cat.create_sample("uas_orders", ca, kind="uniform", ratio=0.3)
        cat.create_sample("uas_lineitem", cb, kind="uniform", ratio=0.3)
        shutil.rmtree(ca)
        shutil.rmtree(cb)
        t = {"ta": ca, "tb": cb}

        def props_of(stmt):
            return {r["property"]: r["value"]
                    for r in approx_sql(spark, "EXPLAIN " + stmt, t, catalog=cat).collect()}

        out = []
        q1 = ("SELECT APPROX_SUM(v, 0.2) FROM "
              "(SELECT v FROM ta UNION ALL SELECT v FROM tb)")
        p1 = props_of(q1)
        routed1 = (p1.get("statement_kind") == "approx_unionall_sample"
                   and p1.get("artifacts") == "uas_orders, uas_lineitem")
        r1 = approx_sql(spark, q1, t, catalog=cat).collect()[0]
        ok1 = abs(r1["est_sum"] - float(both.v.sum())) <= wide * r1["sum_err"]
        out.append(("sum_global", bool(ok1), bool(routed1)))

        q2 = ("SELECT APPROX_COUNT(0.2) FROM "
              "(SELECT v, g FROM ta UNION ALL SELECT v, g FROM tb) GROUP BY g")
        p2 = props_of(q2)
        routed2 = p2.get("statement_kind") == "approx_unionall_sample"
        rows = {int(r["g"]): r for r in approx_sql(spark, q2, t, catalog=cat).collect()}
        ok2 = set(rows) == set(int(v) for v in both.g.unique())
        for g, n in both.groupby("g").size().items():
            ok2 = ok2 and abs(rows[int(g)]["est_count"] - n) <= wide * rows[int(g)]["count_err"]
        out.append(("count_grouped", bool(ok2), bool(routed2)))

        q3 = ("SELECT APPROX_SUM(v, 0.2) FROM "
              "(SELECT v FROM ta WHERE v > 1000 UNION ALL "
              "SELECT v FROM tb WHERE v > 1000)")
        p3 = props_of(q3)
        routed3 = p3.get("statement_kind") == "approx_unionall_sample"
        exact3 = float(both.v[both.v > 1000].sum())
        r3 = approx_sql(spark, q3, t, catalog=cat).collect()[0]
        ok3 = abs(r3["est_sum"] - exact3) <= wide * r3["sum_err"]
        out.append(("sum_where_sides", bool(ok3), bool(routed3)))
        return spark.createDataFrame(
            pd.DataFrame(out, columns=["chk", "within_bound", "sample_routed"])
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_b41_moments_aggregates(spark, sf_dir):
    """Round 5: APPROX_VARIANCE / APPROX_STDDEV — second-moment aggregates
    from uniform samples (Verdict's A10 family extended to dispersion).
    The sample variance s² from a Bernoulli(p) scramble is a consistent
    estimator of the table's variance (ratio-type statistic, no 1/p
    scale-up); its CI uses the CLT variance of a sample variance,
    Var(s²) ≈ (μ₄ − σ⁴)/n (fourth central moment estimated from the same
    single scan), with the (1−p) finite-population factor; stddev goes
    through the first-order delta method. Checks (all ~3.3σ): global
    on-the-fly variance, grouped stddev SERVED FROM a persisted scramble
    (EXPLAIN confirming the sample route), and a multi-aggregate statement
    where SUM and VARIANCE share one sample aggregation."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    tabs = {"lineitem": f"{sf_dir}/lineitem.parquet"}
    li = _t(spark, sf_dir, "lineitem")
    wide = 3.29 / 1.96
    out = []

    exact_var = li.agg(F.var_samp("l_extendedprice")).collect()[0][0]
    r1 = approx_sql(
        spark, "SELECT APPROX_VARIANCE(l_extendedprice, 0.5) FROM lineitem", tabs
    ).collect()[0]
    out.append(
        ("variance_global", bool(abs(r1["est_variance"] - exact_var) <= wide * r1["variance_err"]))
    )

    root = tempfile.mkdtemp(prefix="sketchcat_b41_")
    try:
        cat = SketchCatalog(spark, root)
        approx_sql(
            spark,
            f"CREATE SAMPLE li_mom FROM {tabs['lineitem']} KIND uniform RATIO 0.5 SEED 11",
            catalog=cat,
        ).collect()
        stmt = (
            "SELECT APPROX_STDDEV(l_extendedprice, 0.5) FROM lineitem "
            "GROUP BY l_returnflag"
        )
        props = {
            r["property"]: r["value"]
            for r in approx_sql(spark, "EXPLAIN " + stmt, tabs, catalog=cat).collect()
        }
        routed = props.get("route", "").startswith("persisted_sample") and (
            props.get("artifact") == "li_mom"
        )
        exact_sd = {
            r["l_returnflag"]: r["sd"]
            for r in li.groupBy("l_returnflag")
            .agg(F.stddev_samp("l_extendedprice").alias("sd"))
            .collect()
        }
        rows = {r["l_returnflag"]: r for r in approx_sql(spark, stmt, tabs, catalog=cat).collect()}
        ok = set(rows) == set(exact_sd) and all(
            abs(rows[g]["est_stddev"] - exact_sd[g]) <= wide * rows[g]["stddev_err"]
            for g in rows
        )
        out.append(("stddev_grouped_from_sample", bool(ok and routed)))
    finally:
        shutil.rmtree(root, ignore_errors=True)

    exact_sum = li.agg(F.sum("l_extendedprice")).collect()[0][0]
    r3 = approx_sql(
        spark,
        "SELECT APPROX_SUM(l_extendedprice, 0.5), "
        "APPROX_VARIANCE(l_extendedprice, 0.5) FROM lineitem",
        tabs,
    ).collect()[0]
    ok3 = (
        abs(r3["approx_sum_l_extendedprice"] - exact_sum)
        <= wide * r3["approx_sum_l_extendedprice_err"]
    ) and (
        abs(r3["approx_variance_l_extendedprice"] - exact_var)
        <= wide * r3["approx_variance_l_extendedprice_err"]
    )
    out.append(("sum_variance_multi_agg", bool(ok3)))
    return spark.createDataFrame(pd.DataFrame(out, columns=["chk", "within_bound"]))


def q_b42_bivariate_aggregates(spark, sf_dir):
    """Round 5: APPROX_COVAR / APPROX_CORR — bivariate moment aggregates
    from uniform samples. Covariance and Pearson correlation are ratio-type
    statistics (no 1/p scale-up): the sample covariance gets the CLT bound
    Var(s_xy) ≈ (μ₂₂ − σ_xy²)/n with μ₂₂ bounded by Cauchy–Schwarz as
    √(μ₄₀·μ₀₄) from Spark's STABLE one-pass central-moment aggregates
    (conservative, never smaller than the true CI — and immune to the
    catastrophic cancellation a raw power-sum m₂₂ suffers at mean≫stddev),
    and the correlation CI comes from the FISHER z transform (se 1/√(n−3),
    the classical bound that stays honest as |r|→1), both with the (1−p)
    finite-population factor. Checks (~3.3σ): global covariance on the fly,
    grouped correlation SERVED FROM a persisted scramble (EXPLAIN confirming
    the route), and a strongly-correlated EXPRESSION pair (the near-1 regime
    where the naive delta bound would be useless)."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    tabs = {"lineitem": f"{sf_dir}/lineitem.parquet"}
    li = _t(spark, sf_dir, "lineitem")
    wide = 3.29 / 1.96
    out = []

    exact_cv = li.agg(F.covar_samp("l_quantity", "l_extendedprice")).collect()[0][0]
    r1 = approx_sql(
        spark, "SELECT APPROX_COVAR(l_quantity, l_extendedprice, 0.5) FROM lineitem", tabs
    ).collect()[0]
    out.append(("covar_global", bool(abs(r1["est_covar"] - exact_cv) <= wide * r1["covar_err"])))

    root = tempfile.mkdtemp(prefix="sketchcat_b42_")
    try:
        cat = SketchCatalog(spark, root)
        approx_sql(
            spark,
            f"CREATE SAMPLE li_biv FROM {tabs['lineitem']} KIND uniform RATIO 0.5 SEED 13",
            catalog=cat,
        ).collect()
        stmt = (
            "SELECT APPROX_CORR(l_quantity, l_extendedprice, 0.5) FROM lineitem "
            "GROUP BY l_returnflag"
        )
        props = {
            r["property"]: r["value"]
            for r in approx_sql(spark, "EXPLAIN " + stmt, tabs, catalog=cat).collect()
        }
        routed = props.get("route", "").startswith("persisted_sample") and (
            props.get("artifact") == "li_biv"
        )
        exact_cr = {
            r["l_returnflag"]: r["cr"]
            for r in li.groupBy("l_returnflag")
            .agg(F.corr("l_quantity", "l_extendedprice").alias("cr"))
            .collect()
        }
        rows = {r["l_returnflag"]: r for r in approx_sql(spark, stmt, tabs, catalog=cat).collect()}
        ok = set(rows) == set(exact_cr) and all(
            abs(rows[g]["est_corr"] - exact_cr[g]) <= wide * rows[g]["corr_err"] for g in rows
        )
        out.append(("corr_grouped_from_sample", bool(ok and routed)))
    finally:
        shutil.rmtree(root, ignore_errors=True)

    strong = li.agg(
        F.corr(F.col("l_extendedprice"), F.col("l_extendedprice") * (1 - F.col("l_discount")))
    ).collect()[0][0]
    r3 = approx_sql(
        spark,
        "SELECT APPROX_CORR(l_extendedprice, l_extendedprice * (1 - l_discount), 0.5) "
        "AS r FROM lineitem",
        tabs,
    ).collect()[0]
    out.append(
        ("corr_strong_expression",
         bool(r3["r"] > 0.99 and abs(r3["r"] - strong) <= wide * r3["r_err"]))
    )
    return spark.createDataFrame(pd.DataFrame(out, columns=["chk", "within_bound"]))


def q_b43_accuracy_contracts(spark, sf_dir):
    """Round 5: accuracy-contract statements — ``SELECT APPROX_X(...) FROM t
    [...] WITHIN <t>% ERROR [AT CONFIDENCE <c>%]`` (the BlinkDB/Verdict
    accuracy-first UX). The library plans the cheapest parameters meeting
    the target: COUNT_DISTINCT rewrites to rse=t/z (auto-routing honors
    it), PERCENTILE becomes rank_err=t with the planner's KLL k inversion,
    and the sampling aggregates invert their closed-form CLT bounds with
    the data terms (N, Σx², moments) estimated from a 2% pilot scan —
    GROUP BY plans for the worst group. Checks: the SUM contract's reported
    half-width lands at/under the target (1.5× pilot-noise slack) with the
    exact answer inside the CI; the grouped AVG contract at 99% confidence
    holds per group; the COUNT_DISTINCT rewrite achieves rse ≤ t/z; the
    PERCENTILE contract's rank bound ≤ t and the value inside the exact
    rank band."""
    from sketchlib.sql import approx_sql

    tabs = {
        "lineitem": f"{sf_dir}/lineitem.parquet",
        "orders": f"{sf_dir}/orders.parquet",
    }
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    wide = 3.29 / 1.96
    out = []

    exact_sum = li.agg(F.sum("l_extendedprice")).collect()[0][0]
    r1 = approx_sql(
        spark, "SELECT APPROX_SUM(l_extendedprice) FROM lineitem WITHIN 2% ERROR", tabs
    ).collect()[0]
    ok1 = (
        abs(r1["est_sum"] - exact_sum) <= wide * r1["sum_err"]
        and r1["sum_err"] / abs(r1["est_sum"]) <= 0.02 * 1.5
    )
    out.append(("sum_contract", bool(ok1)))

    exact_avg = {
        r["l_returnflag"]: r["a"]
        for r in li.groupBy("l_returnflag").agg(F.avg("l_extendedprice").alias("a")).collect()
    }
    rows = approx_sql(
        spark,
        "SELECT APPROX_AVG(l_extendedprice) FROM lineitem GROUP BY l_returnflag "
        "WITHIN 1% ERROR AT CONFIDENCE 99%",
        tabs,
    ).collect()
    ok2 = set(r["l_returnflag"] for r in rows) == set(exact_avg) and all(
        abs(r["est_avg"] - exact_avg[r["l_returnflag"]]) <= wide * r["avg_err"]
        and r["avg_err"] / abs(r["est_avg"]) <= 0.01 * 1.5
        for r in rows
    )
    out.append(("avg_grouped_contract_99", bool(ok2)))

    exact_cd = o.agg(F.countDistinct("o_custkey")).collect()[0][0]
    r3 = approx_sql(
        spark, "SELECT APPROX_COUNT_DISTINCT(o_custkey) FROM orders WITHIN 3% ERROR", tabs
    ).collect()[0]
    ok3 = (
        r3["rse_bound"] <= 0.03 / 1.959963984540054 * (1 + 1e-9)
        and abs(r3["estimate"] - exact_cd) <= _hll_tol(exact_cd, r3["rse_bound"])
    )
    out.append(("count_distinct_contract", bool(ok3)))

    pct = approx_sql(
        spark,
        "SELECT APPROX_PERCENTILE(l_extendedprice, 0.9) FROM lineitem WITHIN 0.2% ERROR",
        tabs,
    ).collect()[0]
    band = li.selectExpr(
        "percentile(l_extendedprice, 0.894) AS lo", "percentile(l_extendedprice, 0.906) AS hi"
    ).collect()[0]
    ok4 = pct["rank_err_bound"] <= 0.002 * (1 + 1e-9) and band["lo"] <= pct["value"] <= band["hi"]
    out.append(("percentile_rank_contract", bool(ok4)))
    return spark.createDataFrame(pd.DataFrame(out, columns=["chk", "within_bound"]))


def q_b44_contract_registry_pilot(spark, sf_dir):
    """Round 5: the accuracy-contract × registry composition — (1) a
    MULTI-AGGREGATE contract (`APPROX_COUNT(*), APPROX_SUM(x),
    APPROX_COUNT_DISTINCT(k) ... WITHIN 3% ERROR`) plans every sampling
    member from ONE shared pilot scan and rewrites the sketch member
    arithmetically; (2) with a registered uniform scramble the pilot scans
    the SCRAMBLE (N̂ rescaled by 1/(p₀·p_s)) and the planned statement
    serves from it too — verified by DELETING the base table first: the
    whole contract answers base-free. Checks are within-CI booleans plus
    the at/under-target bound check (1.5× pilot-noise slack)."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    tabs = {"orders": f"{sf_dir}/orders.parquet"}
    o = _t(spark, sf_dir, "orders")
    wide = 3.29 / 1.96
    out = []

    exact_n = o.count()
    exact_sum = o.agg(F.sum("o_totalprice")).collect()[0][0]
    exact_cd = o.agg(F.countDistinct("o_custkey")).collect()[0][0]
    r = approx_sql(
        spark,
        "SELECT APPROX_COUNT(*), APPROX_SUM(o_totalprice), "
        "APPROX_COUNT_DISTINCT(o_custkey) FROM orders WITHIN 3% ERROR",
        tabs,
    ).collect()[0]
    ok1 = (
        abs(r["approx_count_star"] - exact_n) <= wide * r["approx_count_star_err"]
        and r["approx_count_star_err"] / exact_n <= 0.03 * 1.5
        and abs(r["approx_sum_o_totalprice"] - exact_sum)
        <= wide * r["approx_sum_o_totalprice_err"]
        and r["approx_sum_o_totalprice_err"] / exact_sum <= 0.03 * 1.5
        and abs(r["approx_count_distinct_o_custkey"] - exact_cd)
        <= 3 * r["approx_count_distinct_o_custkey_err"] + 1
    )
    out.append(("multi_agg_contract", bool(ok1)))

    work = tempfile.mkdtemp(prefix="sketchlib_b44_")
    try:
        base = os.path.join(work, "orders_copy")
        o.write.parquet(base)
        t2 = {"ocopy": base}
        cat = SketchCatalog(spark, os.path.join(work, "cat"))
        approx_sql(
            spark, "CREATE SAMPLE oc_u FROM ocopy KIND uniform RATIO 0.5 SEED 9", t2, cat
        ).collect()
        shutil.rmtree(base)
        r2 = approx_sql(
            spark, "SELECT APPROX_SUM(o_totalprice) FROM ocopy WITHIN 3% ERROR", t2, cat
        ).collect()[0]
        ok2 = (
            abs(r2["est_sum"] - exact_sum) <= wide * r2["sum_err"]
            and r2["sum_err"] / exact_sum <= 0.03 * 1.5
        )
        out.append(("base_free_contract_via_scramble", bool(ok2)))
        rows = approx_sql(
            spark,
            "SELECT APPROX_AVG(o_totalprice) FROM ocopy GROUP BY o_orderstatus "
            "WITHIN 3% ERROR",
            t2, cat,
        ).collect()
        exact_avg = {
            x["o_orderstatus"]: x["a"]
            for x in o.groupBy("o_orderstatus").agg(F.avg("o_totalprice").alias("a")).collect()
        }
        ok3 = set(x["o_orderstatus"] for x in rows) == set(exact_avg) and all(
            abs(x["est_avg"] - exact_avg[x["o_orderstatus"]]) <= wide * x["avg_err"]
            for x in rows
        )
        out.append(("base_free_grouped_contract", bool(ok3)))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pd.DataFrame(out, columns=["chk", "within_bound"]))


def q_b45_subsample_error(spark, sf_dir):
    """Round 5: VARIATIONAL SUBSAMPLING — VerdictDB's own error estimator
    (`[paper:VerdictDB §3.2]`, subsample.py) behind the ``ERROR BY
    SUBSAMPLING`` statement tail. The sample rows are partitioned into
    b≈n^0.3 random blocks; the spread of the per-block estimates prices the
    full-sample estimate's error with NO closed-form variance formula —
    one extra KB-sized aggregation over the same single scramble scan.
    Checks: (1) the estimates are IDENTICAL to the closed-form path (same
    totals, same stable pooled moments — only the error columns change
    estimator); (2) exact answers fall inside the subsample CIs, grouped
    and global, including CORR where the closed form leans on the Fisher
    approximation; (3) the statement answers BASE-FREE from a registered
    uniform scramble (base table deleted first) with EXPLAIN naming both
    the estimator and the artifact; (4) sketch-served aggregates refuse
    the modifier and EXPLAIN reports the same refusal (no silent
    closed-form fallback)."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    li = _t(spark, sf_dir, "lineitem")
    wide = 3.29 / 1.96
    out = []
    work = tempfile.mkdtemp(prefix="sketchlib_b45_")
    try:
        base = os.path.join(work, "li_copy")
        li.write.parquet(base)
        t = {"licopy": base}
        cat = SketchCatalog(spark, os.path.join(work, "cat"))
        approx_sql(
            spark, "CREATE SAMPLE li_u FROM licopy KIND uniform RATIO 0.2 SEED 11", t, cat
        ).collect()

        stmt = "SELECT APPROX_SUM(l_extendedprice) FROM licopy GROUP BY l_returnflag"
        cf = {r["l_returnflag"]: r for r in approx_sql(spark, stmt, t, cat).collect()}
        ss = {r["l_returnflag"]: r
              for r in approx_sql(spark, stmt + " ERROR BY SUBSAMPLING", t, cat).collect()}
        ok1 = set(cf) == set(ss) and all(
            abs(ss[g]["est_sum"] - cf[g]["est_sum"]) <= 1e-6 * abs(cf[g]["est_sum"])
            and ss[g]["sum_err"] != cf[g]["sum_err"]  # different estimator, same estimate
            for g in cf
        )
        out.append(("estimates_match_closed_form", bool(ok1)))

        exact = {
            r["l_returnflag"]: r
            for r in li.groupBy("l_returnflag")
            .agg(F.sum("l_extendedprice").alias("s"), F.avg("l_quantity").alias("a"))
            .collect()
        }
        ok2 = all(
            abs(ss[g]["est_sum"] - exact[g]["s"]) <= wide * ss[g]["sum_err"] for g in exact
        )
        avg_rows = approx_sql(
            spark,
            "SELECT APPROX_AVG(l_quantity) FROM licopy GROUP BY l_returnflag "
            "ERROR BY SUBSAMPLING",
            t, cat,
        ).collect()
        ok2 = ok2 and all(
            abs(r["est_avg"] - exact[r["l_returnflag"]]["a"]) <= wide * r["avg_err"]
            for r in avg_rows
        )
        out.append(("within_ci_grouped", bool(ok2)))

        exact_corr = li.agg(F.corr("l_quantity", "l_extendedprice")).collect()[0][0]
        rc = approx_sql(
            spark,
            "SELECT APPROX_CORR(l_quantity, l_extendedprice) FROM licopy "
            "ERROR BY SUBSAMPLING",
            t, cat,
        ).collect()[0]
        out.append(
            ("corr_within_ci",
             bool(abs(rc["est_corr"] - exact_corr) <= wide * rc["corr_err"])),
        )

        # COUNT(DISTINCT) from a universe scramble: the sample's distinct
        # values are a Bernoulli(p) sample of the VALUE DOMAIN, so the
        # row-count subsample estimator applies to them verbatim
        approx_sql(
            spark,
            "CREATE SAMPLE li_cd FROM licopy KIND universe RATIO 0.25 "
            "ON l_partkey SEED 11",
            t, cat,
        ).collect()
        exact_cd = li.select(F.countDistinct("l_partkey")).collect()[0][0]
        rcd = approx_sql(
            spark,
            "SELECT APPROX_COUNT_DISTINCT(l_partkey) FROM licopy "
            "ERROR BY SUBSAMPLING",
            t, cat,
        ).collect()[0]
        out.append(
            ("count_distinct_universe_ci",
             bool(abs(rcd["est_distinct"] - exact_cd) <= wide * rcd["distinct_err"])),
        )

        # VALUE-unit quantile CIs — the closed-form path only bounds RANK
        # error; the subsample spread folds in the (formula-less) density
        exact_pct = {
            q: li.agg(F.expr(f"percentile(l_extendedprice, {q})")).collect()[0][0]
            for q in (0.5, 0.9)
        }
        pr = approx_sql(
            spark,
            "SELECT APPROX_PERCENTILE(l_extendedprice, 0.5, 0.9) FROM licopy "
            "ERROR BY SUBSAMPLING",
            t, cat,
        ).collect()
        ok_pct = len(pr) == 2 and all(
            r["value_err"] is not None
            and abs(r["value"] - exact_pct[r["q"]]) <= wide * r["value_err"]
            for r in pr
        )
        out.append(("percentile_value_ci", bool(ok_pct)))

        shutil.rmtree(base)  # base-free from here: the scramble answers alone
        props = {
            r["property"]: r["value"]
            for r in approx_sql(
                spark,
                "EXPLAIN SELECT APPROX_AVG(l_quantity) FROM licopy "
                "GROUP BY l_returnflag ERROR BY SUBSAMPLING",
                t, cat,
            ).collect()
        }
        bf = approx_sql(
            spark,
            "SELECT APPROX_AVG(l_quantity) FROM licopy GROUP BY l_returnflag "
            "ERROR BY SUBSAMPLING",
            t, cat,
        ).collect()
        ok4 = (
            "variational subsampling" in props.get("error_estimator", "")
            and props.get("route", "").startswith("persisted_sample (uniform")
            and props.get("artifact") == "li_u"
            and all(abs(r["est_avg"] - exact[r["l_returnflag"]]["a"])
                    <= wide * r["avg_err"] for r in bf)
        )
        out.append(("base_free_route_explained", bool(ok4)))

        bad = "SELECT APPROX_COUNT_DISTINCT(l_suppkey) FROM licopy ERROR BY SUBSAMPLING"
        try:
            approx_sql(spark, bad, t, cat)
            refused = False
        except ValueError:
            refused = True
        eprops = {
            r["property"]: r["value"]
            for r in approx_sql(spark, "EXPLAIN " + bad, t, cat).collect()
        }
        out.append(
            ("refusal_explain_parity",
             bool(refused and any(k.endswith("error") for k in eprops))),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pd.DataFrame(out, columns=["chk", "within_bound"]))


# --------------------------------------------------------------------------
# c* — training-data pipeline ops (exact, oracle-checked)
# --------------------------------------------------------------------------

def q_c01_exact_dedup(spark, sf_dir):
    """Exact dedup: keep min(doc_id) per identical text; survivors per source.

    The survivor's source is read off with min_by in the SAME aggregation
    that picks the survivor (doc_id is unique, so no ties), replacing the
    old groupBy + self-join shape: one Exchange(text) + one Exchange(source)
    instead of Exchange(text) + a doc_id join + Exchange(source) — identical
    rows, one join and one shuffle of the corpus removed."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min_by("source", "doc_id").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("kept_docs"))
    )


def q_c02_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens per source (exact, both engines)."""
    docs = with_tokens(_t(spark, sf_dir, "documents"))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("n_tok").alias("min_tokens"),
        F.max("n_tok").alias("max_tokens"),
    )


def q_c03_minhash_lsh_dedup(spark, sf_dir):
    """MinHash-LSH near-dup removal, duplicate-injection recall check.

    Doubling the corpus (same text, ids shifted by 1M) and deduping must kill
    EVERY injected copy: an exact duplicate collides with its original in all
    bands and the original's smaller id wins min-id clustering — recall 1 by
    construction. (The driver's documents corpus is template-generated with
    thousands of genuine J≥0.9 near-dup pairs, so total kept counts are not
    oracle-able; injected-survivor count == 0 is.)"""
    from sketchlib.spark.dedup import minhash_lsh_dedup

    docs = with_tokens(_t(spark, sf_dir, "documents"))
    doubled = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    kept = minhash_lsh_dedup(doubled, "tokens", "doc_id", r=64, n_bands=16, threshold=0.9)
    return kept.groupBy("source").agg(
        F.sum((F.col("doc_id") >= 1_000_000).cast("long")).alias("injected_survivors")
    )


def q_c04_simhash_dups(spark, sf_dir):
    """SimHash Hamming-0 candidate pairs recover every injected duplicate."""
    from sketchlib.spark.dedup import simhash_candidates, simhash_df

    docs = with_tokens(_t(spark, sf_dir, "documents"))
    doubled = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    sh = simhash_df(doubled, "tokens", "doc_id")
    pairs = simhash_candidates(sh, "doc_id", max_hamming=0)
    recovered = pairs.filter(F.col("id_b") - F.col("id_a") == 1_000_000)
    return recovered.agg(F.count("*").alias("n_recovered"))


def q_c05_ann_top1(spark, sf_dir):
    """Batched brute-force cosine top-1 neighbor (excluding self) for the
    first 5 vectors — ONE corpus pass for all probes (broadcast probe matrix
    + per-batch matmul partial top-k), not a per-probe job loop; exact,
    matched against DuckDB's list_cosine_similarity."""
    from pyspark.sql.window import Window

    from sketchlib.spark.ann import brute_force_topk_many

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.orderBy("vec_id").limit(5).collect()  # the query INPUT, not a loop
    Q = [list(r["embedding"]) for r in probes]
    qids = [int(r["vec_id"]) for r in probes]
    # k=2 then drop self: the stored probe vector itself is always cosine-1.0
    res = brute_force_topk_many(emb, "embedding", "vec_id", Q, k=2, query_ids=qids)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        res.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        # ids only: DuckDB's list_cosine_similarity computes in float32, Spark
        # in float64 — values differ in the 7th digit, the argmax does not
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )


def q_b17_intersection_estimate(spark, sf_dir):
    """Sketch-only set algebra (A17 beyond union): |A ∩ B| = J·|A ∪ B| from
    MinHash + merged HLL states — more robust than inclusion-exclusion when
    the intersection is small. Checked within 3× the composed relative bound
    (+2 discrete small-n slack) vs exact, for the first 6 sources' token
    vocabularies (15 pairs)."""
    from sketchlib.spark.query import intersection_estimate

    docs = with_tokens(_t(spark, sf_dir, "documents"))
    specs = _HLL_TOK + _MH_TOK
    states = build_sketches(docs, specs, group_by="source")
    pairs_pdf = (
        docs.select("source", F.explode("tokens").alias("tok")).distinct().toPandas()
    )
    vocab = {g: set(sub["tok"]) for g, sub in pairs_pdf.groupby("source")}
    gs = sorted(vocab)[:6]
    out = []
    for i, a in enumerate(gs):
        for b in gs[i + 1 :]:
            est, rel = intersection_estimate(states, "hll_tok", "mh_tok", a, b)
            exact = len(vocab[a] & vocab[b])
            ok = abs(est - exact) <= 3 * rel * max(exact, 1) + 2
            out.append((a, b, bool(ok)))
    return spark.createDataFrame(pd.DataFrame(out, columns=["group_a", "group_b", "within_bound"]))


def q_c06_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup (D11): double the corpus with identical
    vectors (ids shifted by 1M) — every injected pair shares every SRP bucket
    and verifies at cosine 1.0, so exactly n pairs with id_b-id_a == 1M are
    recovered (random Gaussian vectors produce no other ≥0.99 pairs)."""
    from sketchlib.spark.ann import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    doubled = emb.unionByName(emb.withColumn("vec_id", F.col("vec_id") + 1_000_000))
    pairs = embedding_near_dup_pairs(doubled, "embedding", "vec_id", threshold=0.99)
    return pairs.agg(
        F.sum((F.col("id_b") - F.col("id_a") == 1_000_000).cast("long")).alias("n_recovered"),
        F.sum((F.col("id_b") - F.col("id_a") != 1_000_000).cast("long")).alias("n_other"),
    )


def q_c07_srp_batch_self_recovery(spark, sf_dir):
    """Batched SRP-LSH ANN (D6): one signature pass answers 5 probes; each
    probe's own stored vector lands in its own bucket and re-ranks to
    cosine 1.0 top-1 (ids are unique, vectors random ⇒ no ties)."""
    from sketchlib.spark.ann import srp_topk_many

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.orderBy("vec_id").limit(5).collect()
    Q = [list(r["embedding"]) for r in probes]
    qids = [int(r["vec_id"]) for r in probes]
    top = srp_topk_many(emb, "embedding", "vec_id", Q, k=1, n_bits=12, query_ids=qids)
    return top.select(
        "query_id", (F.col("vec_id") == F.col("query_id")).alias("found_self")
    ).orderBy("query_id")


def q_c12_ann_from_persisted_index(spark, sf_dir):
    """Persisted ANN index (SketchCatalog.create_ann_index): the base
    embeddings are scanned ONCE at index build; the probe batch is answered
    from the self-contained (id, bucket, vec) index with the bucket IN-filter
    pushed to the parquet scan — proven by DELETING the base copy before
    querying (the same moved-base trick as b16). Each probe's own stored
    vector re-ranks to cosine-1.0 top-1."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog

    work = tempfile.mkdtemp(prefix="sketchlib_annq_")
    try:
        src = f"{sf_dir}/embeddings.parquet"
        base_copy = os.path.join(work, "emb_base.parquet")
        shutil.copytree(src, base_copy) if os.path.isdir(src) else shutil.copyfile(src, base_copy)
        probes = spark.read.parquet(base_copy).orderBy("vec_id").limit(5).collect()
        Q = [list(r["embedding"]) for r in probes]
        qids = [int(r["vec_id"]) for r in probes]

        cat = SketchCatalog(spark, os.path.join(work, "cat"))
        cat.create_ann_index("emb_srp", base_copy, kind="srp", n_bits=12)
        # queries must never resolve the base table
        shutil.rmtree(base_copy) if os.path.isdir(base_copy) else os.remove(base_copy)

        top = cat.ann_topk("emb_srp", Q, k=1, query_ids=qids)
        out = top.select(
            "query_id", (F.col("vec_id") == F.col("query_id")).alias("found_self")
        ).toPandas()
        return spark.createDataFrame(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_c08_asof_join(spark, sf_dir):
    """As-of join (no native Spark equivalent; union + last-non-null window,
    one shuffle): each event matched to its user's most recent signup at or
    before the event — checked value-for-value against DuckDB's ASOF JOIN."""
    from sketchlib.spark.timeseries import asof_join

    e = _t(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts"), _cents("value").alias("signup_cents")
    )
    j = asof_join(
        e.select("event_id", "user_id", "ts", "event_type"),
        signups, "user_id", left_ts="ts", right_ts="signup_ts",
        value_cols=["signup_cents"],
    )
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("signup_cents").isNotNull().cast("long")).alias("n_matched"),
        F.sum(F.coalesce("signup_cents", F.lit(0))).alias("sum_signup_cents"),
    )


def q_c09_winnow_containment(spark, sf_dir):
    """Winnowing fingerprints (rolling k-shingle hash + window-min selection,
    all JVM-side): every injected exact copy (ids +1M) shares fingerprints
    with its original, so detection via the (fingerprint, id) equi-join finds
    exactly the docs long enough to fingerprint (n_tok ≥ k)."""
    from sketchlib.spark.text import with_winnow_fingerprint

    docs = with_tokens(_t(spark, sf_dir, "documents"))
    doubled = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    fps = with_winnow_fingerprint(doubled, "tokens", k=5, w=8)
    ex = fps.select("doc_id", F.explode("fingerprints").alias("fp"))
    orig = ex.filter(F.col("doc_id") < 1_000_000)
    copies = ex.filter(F.col("doc_id") >= 1_000_000).withColumn(
        "doc_id", F.col("doc_id") - 1_000_000
    )
    detected = orig.join(copies, ["fp", "doc_id"], "leftsemi").select("doc_id").distinct()
    return detected.agg(F.count("*").alias("n_detected"))


def q_b20_multimodal_plumbing(spark, sf_dir):
    """Multimodal path (D12) self-check: Arrow-batched decode→resize→feature
    and evenly-spaced frame sampling over the deterministic synthetic media
    table are (1) reproducible run-to-run and (2) bounded (min(k, n_frames)
    frames per video, unique in-range indices)."""
    from sketchlib.spark.multimodal import FakeCodec, decode_features, sample_frames, synth_media_df

    # the generator is deterministic (seeded splitmix64), so both runs see
    # identical rows without any materialization round-trip
    media = synth_media_df(spark, n_rows=48).cache()
    f1 = decode_features(media, codec=FakeCodec()).toPandas().sort_values("media_id", ignore_index=True)
    f2 = decode_features(media, codec=FakeCodec()).toPandas().sort_values("media_id", ignore_index=True)
    det_feat = bool((f1["mean_lum"] == f2["mean_lum"]).all() and len(f1) == 48)
    s1 = sample_frames(media, codec=FakeCodec(), k=4).toPandas()
    s2 = sample_frames(media, codec=FakeCodec(), k=4).toPandas()
    key = lambda d: sorted(map(tuple, d[["media_id", "frame_idx"]].to_numpy()))  # noqa: E731
    det_frames = bool(key(s1) == key(s2))
    meta = {r["media_id"]: r["media"]["n_frames"] for r in media.collect()}
    # coverage first: a regression that DROPS whole videos must fail here
    # (groupby only iterates groups that exist)
    bounded = set(s1["media_id"]) == set(meta) and all(
        len(sub) == min(4, meta[mid]) and sub["frame_idx"].is_unique
        and (sub["frame_idx"] < meta[mid]).all()
        for mid, sub in s1.groupby("media_id")
    )
    return spark.createDataFrame(
        pd.DataFrame(
            {"deterministic": [det_feat and det_frames], "bounded": [bool(bounded)]}
        )
    )


def q_b21_checkpoint_resume(spark, sf_dir):
    """B10 driver-checked: a checkpointed build equals the clean build
    byte-for-byte, AND deleting one committed chunk state then re-invoking
    (resume) reproduces the identical merged states — the crash-recovery
    contract."""
    import glob
    import os
    import shutil
    import tempfile

    from sketchlib.spark.checkpoint import build_with_checkpoint

    src = f"{sf_dir}/documents.parquet"
    baseline = {
        r["group"]: bytes(r["state"])
        for r in build_sketches(_t(spark, sf_dir, "documents"), _HLL_DOC, group_by="source").collect()
    }
    ck = tempfile.mkdtemp(prefix="ckpt_b21_")
    try:
        a = {
            r["group"]: bytes(r["state"])
            for r in build_with_checkpoint(
                spark, src, _HLL_DOC, ck, group_by="source", target_bytes=1 << 16
            ).collect()
        }
        victim = sorted(glob.glob(os.path.join(ck, "states", "*.parquet")))[0]
        shutil.rmtree(victim) if os.path.isdir(victim) else os.remove(victim)
        b = {
            r["group"]: bytes(r["state"])
            for r in build_with_checkpoint(
                spark, src, _HLL_DOC, ck, group_by="source", target_bytes=1 << 16
            ).collect()
        }
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    return spark.createDataFrame(
        pd.DataFrame(
            {"clean_matches": [bool(a == baseline)], "resume_matches": [bool(b == a)]}
        )
    )


def q_c10_ngram_minhash_dedup(spark, sf_dir):
    """Higher-order near-dup (D4+D2): token 3-gram shingles (JVM higher-order
    fns) feed the same MinHash-LSH path; every injected exact copy collides
    in all bands and loses min-id clustering — zero survivors."""
    from sketchlib.spark.dedup import minhash_lsh_dedup, with_token_ngrams

    docs = with_token_ngrams(with_tokens(_t(spark, sf_dir, "documents")), "tokens", n=3)
    doubled = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    kept = minhash_lsh_dedup(doubled, "shingles", "doc_id", r=64, n_bands=16, threshold=0.9)
    return kept.groupBy("source").agg(
        F.sum((F.col("doc_id") >= 1_000_000).cast("long")).alias("injected_survivors")
    )


def q_b18_ivf_self_recovery(spark, sf_dir):
    """IVF ANN (D10): a stored vector's own inverted list is by definition
    its nearest centroid, so nprobe=1 always recovers it as top-1."""
    from sketchlib.spark.ann import ivf_index, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_index(emb, "embedding", "vec_id", n_lists=8)
    assigned = assigned.cache()
    probes = emb.orderBy("vec_id").limit(3).collect()
    out = []
    for r in probes:
        top = ivf_topk(
            assigned, centroids, "embedding", "vec_id", list(r["embedding"]), k=1, nprobe=1
        ).collect()[0]
        out.append((int(r["vec_id"]), bool(top["vec_id"] == r["vec_id"])))
    assigned.unpersist()
    return spark.createDataFrame(pd.DataFrame(out, columns=["query_id", "found_self"]))


def q_b19_bloom_file_pruning(spark, sf_dir):
    """Bloom file pruning (D9/B8): split documents into 8 files, index each
    with a per-file Bloom, then verify ZERO false negatives — every file
    truly containing each probe token survives pruning."""
    import shutil
    import tempfile

    from sketchlib.spark.prune import FilePruner, build_file_blooms

    docs = with_tokens(_t(spark, sf_dir, "documents"))
    d = tempfile.mkdtemp(prefix="bloomfiles_")
    try:
        docs.repartition(8).write.mode("overwrite").parquet(d)
        multi = spark.read.parquet(d)
        pruner = FilePruner(build_file_blooms(multi, "tokens"))
        # probe: the 5 rarest tokens (hardest case — fewest true files)
        rare = [
            r["t"]
            for r in multi.select(F.explode("tokens").alias("t"))
            .groupBy("t").count().orderBy("count", "t").limit(5).collect()
        ]
        ok = True
        for t in rare:
            true_files = {
                r["_f"]
                for r in multi.withColumn("_f", F.input_file_name())
                .filter(F.array_contains("tokens", t)).select("_f").distinct().collect()
            }
            ok = ok and true_files <= set(pruner.files_maybe_containing([t]))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(pd.DataFrame({"no_false_negatives": [bool(ok)]}))


def q_b51_zonemap_pruning(spark, sf_dir):
    """Round 5: zone-map FILE pruning (the range complement of b19's Bloom
    membership index, D9/B8): per-file [min, max] envelopes read from
    parquet FOOTERS — building the index scans ZERO data — prune the file
    list for a range predicate driver-side. lineitem is split into 8 files
    range-sorted on l_orderkey (the layout a range-partitioned corpus write
    produces); `WHERE l_orderkey BETWEEN 2000 AND 2500` then touches only
    the intersecting files. VALUE-matched: aggregates over the pruned read
    equal DuckDB filtering the original single-file table — pruning is
    exact because a file is dropped only when its stats envelope cannot
    intersect the range. `pruned_some` asserts the index actually dropped
    files (>50% here), not just passed everything through."""
    import shutil
    import tempfile

    from sketchlib.spark.prune import ZoneMapPruner

    li = _t(spark, sf_dir, "lineitem")
    d = tempfile.mkdtemp(prefix="zonemap_")
    try:
        (
            li.repartitionByRange(8, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.mode("overwrite").parquet(d)
        )
        pr = ZoneMapPruner.from_dir(d, ["l_orderkey"])
        lo, hi = 2_000, 2_500
        st = pr.stats({"l_orderkey": (lo, hi)})
        pruned_some = st["pruned_fraction"] > 0.5
        out = (
            pr.pruned_read(spark, {"l_orderkey": (lo, hi)})
            .filter((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi))
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").cast("long").alias("sum_qty"),
            )
            .withColumn("pruned_some", F.lit(bool(pruned_some)))
            .orderBy("l_returnflag")
            .toPandas()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(out)


def q_b22_streamed_states_match_batch(spark, sf_dir):
    """A18/D14: sketch states maintained incrementally over micro-batches
    (foreachBatch merge) are byte-identical to one batch build — merge
    associativity across arbitrary batch boundaries, driver-checked."""
    import shutil
    import tempfile

    from sketchlib.spark.streaming import stream_build

    docs = _t(spark, sf_dir, "documents")
    src = tempfile.mkdtemp(prefix="b22_src_")
    state_dir = tempfile.mkdtemp(prefix="b22_states_")
    ckpt = tempfile.mkdtemp(prefix="b22_ckpt_")
    try:
        docs.repartition(6).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 2).parquet(src)
        )
        query, sink = stream_build(stream, _HLL_DOC, state_dir, group_by="source", checkpoint_dir=ckpt)
        if not query.awaitTermination(180):
            query.stop()  # never rmtree under a live stream / read partial state
            raise TimeoutError("b22 stream did not drain within 180s")
        streamed = {
            r["group"]: bytes(r["state"]) for r in sink.states(spark).collect()
        }
        batch = {
            r["group"]: bytes(r["state"])
            for r in build_sketches(spark.read.parquet(src), _HLL_DOC, group_by="source").collect()
        }
    finally:
        for d in (src, state_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(
        pd.DataFrame({"states_match_batch": [bool(streamed == batch)]})
    )


def q_c11_sessionize(spark, sf_dir):
    """Custom stateful streaming operator vs a TRUE SQL oracle: gap
    sessionization of events per user through applyInPandasWithState; the
    emitted CLOSED sessions (every session but each user's open tail) must
    match DuckDB's lag/cumsum sessionization exactly."""
    import shutil
    import tempfile

    from sketchlib.spark.streaming import sessionize

    e = _t(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="c11_src_")
    ckpt = tempfile.mkdtemp(prefix="c11_ckpt_")
    closed: list = []
    try:
        e.select("user_id", "ts").coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
        out = sessionize(stream, key="user_id", ts_col="ts", gap_seconds=7200)
        q = (
            out.writeStream.foreachBatch(lambda bdf, bid: closed.extend(bdf.collect()))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(180):
            q.stop()  # never rmtree under a live stream
            raise TimeoutError("c11 stream did not drain within 180s")
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)
    n_sessions = len(closed)
    total_events = int(sum(r["n_events"] for r in closed))
    return spark.createDataFrame(
        pd.DataFrame({"n_sessions": [n_sessions], "total_events": [total_events]})
    )


def q_c16_repetition_stats(spark, sf_dir):
    """Round 4: Gopher-style intra-document repetition gates (Rae et al.
    2021 §A1.1) over the documents table — whitespace words, so DuckDB can
    reproduce every quantity exactly. Per source: duplicate-token
    occurrences (Σ n − |distinct|), total tokens, top-token occupancy
    (Σ per-doc max token count), and docs flagged repetitive by the bigram
    gate (dup_ngram_frac > 0.1). All integers — hash-stable both engines."""
    from sketchlib.spark.text import with_repetition_stats
    from sketchlib.spark.tokenize import pre_tokens

    docs = _t(spark, sf_dir, "documents").withColumn("w", pre_tokens("text"))
    rep = with_repetition_stats(docs, tokens_col="w", ngram=2)
    n = F.size("w")
    return (
        rep.groupBy("source")
        .agg(
            F.sum(n - F.size(F.array_distinct("w"))).cast("long").alias("dup_token_occurrences"),
            F.sum(n).cast("long").alias("total_tokens"),
            # per-doc top count recovered exactly from the frac: frac = c/n
            F.sum(F.round(F.col("top_token_frac") * n, 0)).cast("long").alias("top_token_occurrences"),
            F.sum((F.col("dup_ngram_frac") > 0.1).cast("long")).alias("repetitive_docs"),
        )
        .orderBy("source")
    )


def _dist_wrapped(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_dist(spark)
        return fn(spark, sf_dir)

    run.__name__ = fn.__name__
    run.__doc__ = fn.__doc__
    return run


def q_b27_auto_routed_sql(spark, sf_dir):
    """Verdict's sample AUTO-SELECTION (the SampleManager behavior that
    defines its UX): the user passes a catalog and NO artifact name;
    approx_sql routes each statement to the best registered artifact —
    persisted sketch states for the unfiltered group-matched COUNT
    DISTINCT, the universe scramble once a WHERE blocks the pre-reduced
    states, the stratified scramble for an AVG grouped on its key — and
    every estimate lands within its error bound vs exact."""
    import json
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql, resolve_catalog_key

    docs = _t(spark, sf_dir, "documents")
    path = f"{sf_dir}/documents.parquet"
    tables = {"docs": path}
    wide = 3.29 / 1.96  # CI columns are z=1.96; accept up to ~3.3 sigma
    root = tempfile.mkdtemp(prefix="sketchcat_b27_")
    checks = []
    try:
        cat = SketchCatalog(spark, root)
        cat.create(
            "docs_states", path, [SketchSpec("h", "hll", "doc_id", {"p": 14})], group_by="source"
        )
        approx_sql(
            spark,
            "CREATE SAMPLE docs_uni FROM docs KIND universe RATIO 0.5 ON doc_id SEED 7",
            tables, catalog=cat,
        ).collect()
        sources = sorted(r["source"] for r in docs.select("source").distinct().collect())
        fr = json.dumps({s: (1.0 if i % 2 == 0 else 0.8) for i, s in enumerate(sources)})
        approx_sql(
            spark,
            f"CREATE SAMPLE docs_st FROM docs KIND stratified ON source FRACTIONS '{fr}' SEED 11",
            tables, catalog=cat,
        ).collect()

        q1 = "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM docs GROUP BY source"
        checks.append(("route_states", resolve_catalog_key(spark, q1, tables, cat) == "docs_states"))
        est1 = approx_sql(spark, q1, tables, catalog=cat).toPandas()
        exact1 = docs.groupBy("source").agg(F.countDistinct("doc_id").alias("exact")).toPandas()
        m1 = est1.merge(exact1, left_on="group", right_on="source")
        checks.append((
            "states_within_bound",
            bool(((m1["estimate"] - m1["exact"]).abs() <= _hll_tol(m1["exact"], m1["rse_bound"])).all()),
        ))

        q2 = "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM docs WHERE n_chars > 200"
        checks.append(("route_universe", resolve_catalog_key(spark, q2, tables, cat) == "docs_uni"))
        est2 = approx_sql(spark, q2, tables, catalog=cat).collect()[0]
        ex2 = docs.filter("n_chars > 200").agg(F.countDistinct("doc_id")).collect()[0][0]
        checks.append((
            "universe_within_ci",
            bool(abs(est2["est_distinct"] - ex2) <= est2["distinct_err"] * wide + 1e-9),
        ))

        q3 = "SELECT APPROX_AVG(n_chars, 0.8) FROM docs GROUP BY source"
        checks.append(("route_stratified", resolve_catalog_key(spark, q3, tables, cat) == "docs_st"))
        est3 = approx_sql(spark, q3, tables, catalog=cat).toPandas()
        exact3 = docs.groupBy("source").agg(F.avg("n_chars").alias("true_avg")).toPandas()
        m3 = est3.merge(exact3, on="source")
        checks.append((
            "stratified_within_ci",
            bool(((m3["est_avg"] - m3["true_avg"]).abs() <= m3["avg_err"] * wide + 1e-9).all()),
        ))

        # multi-aggregate routing: both aggregates answered from artifacts
        # (HLL states + universe scramble can't serve SUM — add a uniform
        # scramble), joined on the group key, each within its bound
        approx_sql(
            spark, "CREATE SAMPLE docs_u FROM docs KIND uniform RATIO 0.6 SEED 7",
            tables, catalog=cat,
        ).collect()
        q4 = (
            "SELECT APPROX_COUNT_DISTINCT(doc_id), APPROX_SUM(n_chars, 0.5) "
            "FROM docs GROUP BY source"
        )
        est4 = approx_sql(spark, q4, tables, catalog=cat).toPandas()
        exact4 = docs.groupBy("source").agg(
            F.countDistinct("doc_id").alias("d"), F.sum("n_chars").alias("s")
        ).toPandas()
        m4 = est4.merge(exact4, on="source")
        ok_d = (
            (m4["approx_count_distinct_doc_id"] - m4["d"]).abs()
            <= 3 * m4["approx_count_distinct_doc_id_err"] + 2.0
        ).all()
        ok_s = (
            (m4["approx_sum_n_chars"] - m4["s"]).abs()
            <= m4["approx_sum_n_chars_err"] * wide + 1e-9
        ).all()
        checks.append(("multi_agg_routed", bool(ok_d and ok_s)))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pd.DataFrame(checks, columns=["check", "ok"]))


def q_b29_incremental_refresh(spark, sf_dir):
    """Incremental sketch maintenance on append (catalog.refresh / REFRESH
    SKETCHES): new parquet files land in a registered input dir; refresh
    sketches ONLY those files and merges their partial states in. The
    refreshed states must be BYTE-IDENTICAL to a from-scratch rebuild over
    the grown dir (HLL register-max is order-free and serialization is
    canonical), and the refreshed estimate covers the grown corpus within
    the HLL bound — at 100 TB this replaces a corpus re-scan with a scan of
    the day's append."""
    import glob
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.spark.scan import build_sketches_from_parquet

    docs = _t(spark, sf_dir, "documents")
    spec = [SketchSpec("h", "hll", "doc_id", {"p": 14})]
    root = tempfile.mkdtemp(prefix="sketchcat_b29_")
    try:
        data = os.path.join(root, "docs")
        docs.filter(F.col("doc_id") % 2 == 0).coalesce(2).write.parquet(data)
        cat = SketchCatalog(spark, os.path.join(root, "cat"))
        cat.create("d", data, spec, group_by="source")
        odd_dir = os.path.join(root, "odd")
        docs.filter(F.col("doc_id") % 2 == 1).coalesce(2).write.parquet(odd_dir)
        for i, f in enumerate(sorted(glob.glob(odd_dir + "/part-*.parquet"))):
            shutil.copy(f, os.path.join(data, f"appended-{i:04d}.parquet"))
        stats = cat.refresh("d")
        full = build_sketches_from_parquet(spark, data, spec, group_by="source").toPandas()
        got = cat.states("d").toPandas()
        fb = {r["group"]: bytes(r["state"]) for _, r in full.iterrows()}
        gb = {r["group"]: bytes(r["state"]) for _, r in got.iterrows()}
        identical = set(fb) == set(gb) and all(fb[g] == gb[g] for g in fb)
        est = estimates_df(spark, cat.states("d"), "h").toPandas()
        exact = docs.groupBy("source").agg(F.countDistinct("doc_id").alias("exact")).toPandas()
        m = est.merge(exact, left_on="group", right_on="source")
        within = bool(
            ((m["estimate"] - m["exact"]).abs() <= _hll_tol(m["exact"], m["rse_bound"])).all()
        )
        rows = [
            ("refresh_saw_new_files", bool(stats["new_files"] > 0)),
            ("refresh_equals_rebuild", bool(identical)),
            ("refreshed_estimate_within_bound", within),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pd.DataFrame(rows, columns=["check", "ok"]))


def q_b28_exact_passthrough(spark, sf_dir):
    """Verdict middleware behavior (A4): a statement with no APPROX_
    aggregate is NOT rewritten — approx_sql passes it through to Spark SQL
    verbatim. Hash-checked value-for-value against DuckDB running the same
    statement."""
    from sketchlib.sql import approx_sql

    return approx_sql(
        spark,
        "SELECT source, lang, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars "
        "FROM documents GROUP BY source, lang",
        {"documents": f"{sf_dir}/documents.parquet"},
    )


def q_c13_sequence_packing(spark, sf_dir):
    """Sequence packing (D20, training-batch assembly): FFD per partition
    inside one mapInPandas pass — zero raw-row shuffle, pack ids namespaced
    by partition. Properties checked against the documents table: no
    non-overflow pack exceeds the budget, every document assigned exactly
    once, offsets tile each pack head-to-head, fill ≥ 0.9."""
    from sketchlib.spark.packing import pack_sequences, packing_stats

    budget = 4096
    docs = _t(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget, id_col="doc_id", len_col="n_chars").cache()
    try:
        n_docs = docs.count()
        over_budget = (
            packed.filter("NOT overflow")
            .groupBy("pack_id").agg(F.sum("n_chars").alias("tok"))
            .filter(F.col("tok") > budget).count()
        )
        exactly_once = (
            packed.count() == n_docs
            and packed.select("doc_id").distinct().count() == n_docs
        )
        rows = packed.orderBy("pack_id", "pack_offset").toPandas()
        tile_ok = True
        for _, g in rows.groupby("pack_id"):
            offs, lens = g["pack_offset"].to_numpy(), g["n_chars"].to_numpy()
            if offs[0] != 0 or not (offs[1:] == np.cumsum(lens)[:-1]).all():
                tile_ok = False
                break
        stats = packing_stats(packed, budget, len_col="n_chars")
    finally:
        packed.unpersist()
    checks = [
        ("packs_within_budget", bool(over_budget == 0)),
        ("exactly_once", bool(exactly_once)),
        ("offsets_tile", bool(tile_ok)),
        ("fill_at_least_090", bool(stats["fill_fraction"] >= 0.9)),
    ]
    return spark.createDataFrame(pd.DataFrame(checks, columns=["check", "ok"]))


def q_c14_contamination(spark, sf_dir):
    """Benchmark decontamination (D21): exact token-8-gram overlap between
    the train corpus and a broadcast eval set — one train scan, no payload
    shuffle. Properties: an eval doc built from a real document's token
    prefix flags THAT document (recall on true contamination), and an eval
    doc of out-of-vocabulary tokens flags nothing (no false hits)."""
    from sketchlib.spark.dedup import contamination_pairs

    docs = with_tokens(_t(spark, sf_dir, "documents")).select("doc_id", "tokens").cache()
    try:
        seeds = (
            docs.withColumn("_n", F.size("tokens"))
            .filter(F.col("_n") >= 40)
            .orderBy(F.desc("_n"), "doc_id")
            .limit(3)
            .collect()
        )
        eval_rows = [
            {"doc_id": f"eval_{i}", "tokens": list(r["tokens"][:40])}
            for i, r in enumerate(seeds)
        ]
        eval_rows.append(
            {"doc_id": "eval_clean", "tokens": [2_000_000_000 - i for i in range(40)]}
        )
        eval_df = spark.createDataFrame(pd.DataFrame(eval_rows))
        hits = contamination_pairs(docs, eval_df, n=8).collect()
        flagged = {(r["train_id"], r["eval_id"]) for r in hits}
        recall_ok = all(
            (seeds[i]["doc_id"], f"eval_{i}") in flagged for i in range(len(seeds))
        )
        clean_ok = not any(e == "eval_clean" for _, e in flagged)
    finally:
        docs.unpersist()
    checks = [
        ("seeded_docs_flagged", bool(recall_ok)),
        ("clean_eval_no_hits", bool(clean_ok)),
    ]
    return spark.createDataFrame(pd.DataFrame(checks, columns=["check", "ok"]))


def q_c17_contamination_spans(spark, sf_dir):
    """Round 4: span-level decontamination (contamination_spans) — the
    longest CONSECUTIVE run of shared 8-grams per (train, eval) pair, via
    positioned shingles + diagonal gaps-and-islands over matched rows
    only. Properties: an eval doc built from a real document's 40-token
    prefix reports max_span_tokens EXACTLY 40 against that document (the
    full verbatim inclusion, not just 'some overlap'), and an
    out-of-vocabulary eval doc reports nothing."""
    from sketchlib.spark.dedup import contamination_spans

    docs = with_tokens(_t(spark, sf_dir, "documents")).select("doc_id", "tokens").cache()
    try:
        seeds = (
            docs.withColumn("_n", F.size("tokens"))
            .filter(F.col("_n") >= 40)
            .orderBy(F.desc("_n"), "doc_id")
            .limit(3)
            .collect()
        )
        eval_rows = [
            {"doc_id": f"eval_{i}", "tokens": list(r["tokens"][:40])}
            for i, r in enumerate(seeds)
        ]
        eval_rows.append(
            {"doc_id": "eval_clean", "tokens": [2_000_000_000 - i for i in range(40)]}
        )
        eval_df = spark.createDataFrame(pd.DataFrame(eval_rows))
        spans = contamination_spans(docs, eval_df, n=8).collect()
        by_pair = {(r["train_id"], r["eval_id"]): r for r in spans}
        # len(seeds) == 3 guards against a vacuous all() over zero seeds on
        # a testdata variant with only short documents
        span_ok = len(seeds) == 3 and all(
            by_pair.get((seeds[i]["doc_id"], f"eval_{i}")) is not None
            and by_pair[(seeds[i]["doc_id"], f"eval_{i}")]["max_span_tokens"] == 40
            for i in range(len(seeds))
        )
        clean_ok = not any(e == "eval_clean" for _, e in by_pair)
    finally:
        docs.unpersist()
    checks = [
        ("seed_span_exactly_40", bool(span_ok)),
        ("clean_eval_no_hits", bool(clean_ok)),
    ]
    return spark.createDataFrame(pd.DataFrame(checks, columns=["check", "ok"]))


def q_c18_dedup_delta(spark, sf_dir):
    """Round 4: INCREMENTAL near-dup dedup (dedup_delta) — the daily
    operation of a growing corpus: a delta is deduped against the
    persisted corpus SIGNATURE table (corpus raw data untouched; delta
    bands broadcast, corpus side map-side probed) and within itself.
    Properties: injected copies of corpus docs are dropped (recall on true
    duplicates), a delta-internal twin is dropped, kept docs are a subset
    of the genuinely-new ones, and appending the returned signatures
    CLOSES THE LOOP — replaying the same delta then keeps nothing."""
    from sketchlib.spark.dedup import dedup_delta, minhash_signatures

    corpus = fresh = None  # bound before try: the finally must not NameError
    docs = with_tokens(_t(spark, sf_dir, "documents")).select("doc_id", "tokens").cache()
    try:
        corpus = docs.filter(F.col("doc_id") % 2 == 0).cache()
        fresh = docs.filter(F.col("doc_id") % 2 == 1).limit(60).cache()
        corpus_sigs = minhash_signatures(
            corpus, "tokens", "doc_id", r=64, n_bands=16
        ).localCheckpoint()
        copies = corpus.limit(25).withColumn("doc_id", F.col("doc_id") + 10_000_000)
        twin = fresh.limit(1).withColumn("doc_id", F.col("doc_id") + 20_000_000)
        delta = fresh.unionByName(copies).unionByName(twin)
        kept, kept_sigs = dedup_delta(delta, corpus_sigs, threshold=0.9)
        kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        fresh_ids = {r["doc_id"] for r in fresh.select("doc_id").collect()}
        copies_dropped = not any(i >= 10_000_000 and i < 20_000_000 for i in kept_ids)
        twin_dropped = not any(i >= 20_000_000 for i in kept_ids)
        kept_subset_of_fresh = kept_ids <= fresh_ids
        grown = corpus_sigs.unionByName(kept_sigs)
        closed = dedup_delta(delta, grown, threshold=0.9)[0].count() == 0
    finally:
        for cached in (fresh, corpus, docs):
            if cached is not None:
                cached.unpersist()
    checks = [
        ("corpus_copies_dropped", bool(copies_dropped)),
        ("delta_internal_twin_dropped", bool(twin_dropped)),
        ("kept_subset_of_fresh", bool(kept_subset_of_fresh)),
        ("sig_append_closes_loop", bool(closed)),
    ]
    return spark.createDataFrame(pd.DataFrame(checks, columns=["check", "ok"]))


def q_c19_signature_catalog(spark, sf_dir):
    """Round 5: signature-table REGISTRY with a machine-enforced signing
    contract (VERDICT r4 #1). The daily-dedup artifact gets the same
    lifecycle as sketches/scrambles/ANN indexes: CREATE SIGNATURES DDL
    persists (id, sig, bands) WITH its (r, n_bands, seed) contract and
    file lineage; REFRESH SIGNATURES signs only appended files;
    dedup_delta(catalog=...) reads the contract from the registry — so a
    mismatched seed (the silent zero-recall footgun) RAISES instead of
    quietly keeping every duplicate. Checks: DDL bootstrap registers the
    contract, refresh counts exactly the appended rows, catalog-routed
    delta dedup drops injected corpus copies, an explicit conflicting seed
    is refused, and appending the kept signatures through the catalog
    closes the loop (replaying the same delta keeps 0)."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.spark.dedup import dedup_delta
    from sketchlib.sql import approx_sql

    grow = fresh = None
    docs = with_tokens(_t(spark, sf_dir, "documents")).select("doc_id", "tokens").cache()
    root = tempfile.mkdtemp(prefix="sigcat_c19_")
    try:
        data = os.path.join(root, "corpus")
        docs.filter(F.col("doc_id") % 4 == 0).coalesce(2).write.parquet(data)
        cat = SketchCatalog(spark, os.path.join(root, "cat"))
        reg = approx_sql(
            spark,
            "CREATE SIGNATURES s FROM corpus ON tokens ID doc_id R 64 BANDS 16 SEED 5",
            {"corpus": data}, catalog=cat,
        ).collect()
        boot_ok = (
            len(reg) == 1 and reg[0]["r"] == 64 and reg[0]["n_bands"] == 16
            and reg[0]["seed"] == 5
        )

        # corpus grows: new parquet files land in the registered dir;
        # REFRESH signs only those (content-keyed, same contract)
        grow = docs.filter(F.col("doc_id") % 4 == 2).cache()
        n_grow = grow.count()
        grow.coalesce(1).write.mode("append").parquet(data)
        rstats = approx_sql(spark, "REFRESH SIGNATURES s", catalog=cat).collect()[0]
        refresh_ok = rstats["new_files"] > 0 and rstats["rows_added"] == n_grow

        # a delta arrives: genuinely-new odd docs + injected corpus copies
        fresh = docs.filter(F.col("doc_id") % 2 == 1).limit(40).cache()
        copies = (
            docs.filter(F.col("doc_id") % 4 == 0).limit(20)
            .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        )
        delta = fresh.unionByName(copies)
        kept, kept_sigs = dedup_delta(
            delta, catalog=cat, catalog_key="s", threshold=0.9
        )
        kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        fresh_ids = {r["doc_id"] for r in fresh.select("doc_id").collect()}
        copies_dropped = not any(i >= 10_000_000 for i in kept_ids)
        kept_ok = copies_dropped and kept_ids <= fresh_ids and len(kept_ids) > 0

        try:
            dedup_delta(delta, catalog=cat, catalog_key="s", threshold=0.9, seed=999)
            seed_refused = False
        except ValueError as e:
            seed_refused = "seed" in str(e)

        cat.append_signatures("s", kept_sigs)
        replay_kept, _ = dedup_delta(delta, catalog=cat, catalog_key="s", threshold=0.9)
        closed = replay_kept.count() == 0

        rows = [
            ("ddl_bootstrap_registers_contract", bool(boot_ok)),
            ("refresh_signs_only_appends", bool(refresh_ok)),
            ("catalog_delta_drops_corpus_copies", bool(kept_ok)),
            ("conflicting_seed_refused", bool(seed_refused)),
            ("append_via_catalog_closes_loop", bool(closed)),
        ]
    finally:
        for cached in (grow, fresh, docs):
            if cached is not None:
                cached.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pd.DataFrame(rows, columns=["check", "ok"]))


def q_c20_chunking(spark, sf_dir):
    """Round 5: context-window chunking (`packing.chunk_documents`) — split
    long token arrays into ≤ max_len windows with `overlap` carried
    context; the complement of c13's packing (a pipeline runs chunk →
    pack). Pure higher-order SQL (no Python, no shuffle — plan-locked in
    tests). VALUE-matched vs DuckDB computing the same closed form:
    n_chunks = 1 if n ≤ L else ceil((n−L)/(L−o)) + 1, total chunk tokens
    = n + (n_chunks−1)·o — so the oracle verifies the chunk COUNTS and
    the exactly-once-plus-overlap token accounting, not just booleans."""
    from sketchlib.spark.packing import chunk_documents

    docs = with_tokens(_t(spark, sf_dir, "documents")).select("source", "doc_id", "tokens")
    ch = chunk_documents(docs, max_len=64, overlap=8)
    return (
        ch.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("long").alias("sum_chunk_tokens"),
            F.max("n_chunk_tokens").cast("int").alias("max_chunk_tokens"),
        )
        .orderBy("source")
    )


def q_c21_quality_gates(spark, sf_dir):
    """Round 5: quality-gate composition (`text.filter_documents`) — one
    pass computes per-gate INDEPENDENT failure counts plus the kept count
    (which gate rejected how many is the operational signal; a gate
    silently dropping 40% of a source is a data incident). Gates here:
    token-count bounds and a duplicate-token-fraction cap, all DuckDB-
    replicable, so the report rows are VALUE-matched, not booleans."""
    from sketchlib.spark.text import filter_documents, words

    docs = _t(spark, sf_dir, "documents")
    w = words("text")
    n_tok = F.size(w)
    dup_frac = (n_tok - F.size(F.array_distinct(w))) / n_tok
    _, report = filter_documents(
        docs,
        {
            "min_tokens": n_tok >= 5,
            "max_tokens": n_tok <= 400,
            "dup_frac": dup_frac <= 0.5,
        },
    )
    return report.select("gate", "n").orderBy("gate")


def q_c22_streaming_signatures(spark, sf_dir):
    """Round 5: the STREAMING half of the incremental-dedup loop
    (`StreamingSignatureSink`) — a document stream signs itself via
    foreachBatch into batch-keyed signature files with the signing
    contract persisted beside the data. Checks: the drained stream's
    signature table is byte-equal to batch signing of the same rows, a
    replayed batch id overwrites (never duplicates), a conflicting
    contract on the same state_dir is refused, and dedup_delta against
    the sink's live table drops a copy of a streamed doc while keeping a
    genuinely new one."""
    import shutil
    import tempfile

    from sketchlib.spark.dedup import dedup_delta, minhash_signatures
    from sketchlib.spark.streaming import StreamingSignatureSink

    docs = (
        with_tokens(_t(spark, sf_dir, "documents"))
        .select(F.col("doc_id").cast("string").alias("doc_id"), "tokens")
        .orderBy("doc_id")
        .limit(80)
        .cache()
    )
    root = tempfile.mkdtemp(prefix="sigstream_c22_")
    try:
        src = os.path.join(root, "src")
        docs.limit(40).coalesce(1).write.parquet(f"{src}/a")
        docs.exceptAll(docs.limit(40)).coalesce(1).write.parquet(f"{src}/b")
        sd = os.path.join(root, "sigs")
        sink = StreamingSignatureSink(sd, r=64, n_bands=16, seed=9)
        stream = (
            spark.readStream.schema("doc_id string, tokens array<bigint>")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = {
            r["doc_id"]: (tuple(r["sig"]), tuple(r["bands"]))
            for r in sink.signatures(spark).collect()
        }
        want = {
            r["doc_id"]: (tuple(r["sig"]), tuple(r["bands"]))
            for r in minhash_signatures(
                docs, "tokens", "doc_id", r=64, n_bands=16, seed=9
            ).collect()
        }
        matches_batch = got == want

        n_before = sink.signatures(spark).count()
        sink(docs.limit(40), 0)  # replay of committed batch 0
        replay_idempotent = sink.signatures(spark).count() == n_before

        try:
            StreamingSignatureSink(sd, r=64, n_bands=16, seed=10)
            contract_enforced = False
        except ValueError as e:
            contract_enforced = "contract" in str(e)

        one = docs.limit(1)
        copy = one.withColumn("doc_id", F.concat(F.lit("copy_"), F.col("doc_id")))
        new = one.withColumn("doc_id", F.lit("brand_new")).withColumn(
            "tokens", F.expr("transform(sequence(0, 29), j -> CAST(990000 + j AS BIGINT))")
        )
        kept, _ = dedup_delta(
            copy.unionByName(new), sink.signatures(spark), threshold=0.9, seed=9
        )
        kept_ids = {r["doc_id"] for r in kept.collect()}
        loop_ok = kept_ids == {"brand_new"}
        rows = [
            ("streamed_equals_batch_signing", bool(matches_batch)),
            ("replay_overwrites_not_duplicates", bool(replay_idempotent)),
            ("conflicting_contract_refused", bool(contract_enforced)),
            ("delta_dedup_against_stream_table", bool(loop_ok)),
        ]
    finally:
        docs.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pd.DataFrame(rows, columns=["check", "ok"]))


def q_c15_mixture_sample(spark, sf_dir):
    """Dataset mixture composition (D22): per-source Bernoulli fractions
    solved so each source's expected output-token share matches the target
    weights under a global budget. Checks: every uncapped source's achieved
    token sum lands inside the Bernoulli CLT bound of its target; an
    over-inventory ask is capped AND flagged; unlisted sources are absent."""
    import math

    from sketchlib.spark.sampling import mixture_sample

    docs = _t(spark, sf_dir, "documents")
    sources = sorted(r["source"] for r in docs.select("source").distinct().collect())
    weights = {s: float(i + 1) for i, s in enumerate(sources[:3])}
    total = int(docs.agg(F.sum("n_chars")).collect()[0][0])
    sampled, report = mixture_sample(
        docs, weights, int(total * 0.3), len_col="n_chars", seed=11
    )
    rep = {r["source"]: r for r in report.collect()}
    got = {
        r["source"]: int(r["tok"])
        for r in sampled.groupBy("source").agg(F.sum("n_chars").alias("tok")).collect()
    }
    within = True
    for s, r in rep.items():
        if r["capped"]:
            continue
        f = r["fraction"]
        sumsq = int(
            docs.filter(F.col("source") == s)
            .agg(F.sum(F.col("n_chars").cast("double") ** 2)).collect()[0][0]
        )
        tol = 3.29 * math.sqrt(f * (1 - f) * sumsq)
        if abs(got.get(s, 0) - r["target_tokens"]) > tol + 1e-9:
            within = False
    excluded_ok = set(got) <= set(weights)

    _, rep2 = mixture_sample(
        docs, {sources[0]: 0.99, sources[1]: 0.01}, int(total * 0.95),
        len_col="n_chars", seed=11,
    )
    capped_flagged = {r["source"]: r["capped"] for r in rep2.collect()}[sources[0]]
    checks = [
        ("uncapped_within_clt", bool(within)),
        ("unlisted_sources_excluded", bool(excluded_ok)),
        ("over_inventory_capped_flagged", bool(capped_flagged)),
    ]
    return spark.createDataFrame(pd.DataFrame(checks, columns=["check", "ok"]))


def q_c23_pii_redaction(spark, sf_dir):
    """Round 5: PII redaction (`text.redact_pii` / `pii_report`) — the
    scrubbing stage a public training corpus runs before release. The
    synthetic documents carry no PII, so the query injects deterministic
    emails/IPs/SSNs/phones keyed off doc_id (identically in the oracle)
    and value-matches the per-pattern match/doc counts PLUS the total
    character count of the fully redacted corpus — locking the actual
    replacement output, not just tallies. Rules apply sequentially in the
    Java-regex ∩ RE2 dialect subset so the same patterns run verbatim in
    both engines; all redaction is regexp built-ins in whole-stage
    codegen (no Python, no shuffle)."""
    from sketchlib.spark.text import pii_report

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or 10."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") % 250).cast("string"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(" ssn 123-45-6789 call 415-555-0142"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_report(aug).orderBy("pattern")


def q_c24_line_dedup(spark, sf_dir):
    """Round 5: C4-style line-level corpus dedup (`dedup.dedup_lines`) —
    remove every line occurring >= 3 times across the corpus, reassemble
    docs with kept lines in order (the boilerplate-removal stage of web
    corpora, Raffel et al. 2020 §2.2). The synthetic docs are single-line,
    so the query appends newline-delimited boilerplate deterministically
    (identically in the oracle): a corpus-wide banner (always heavy), a
    doc_id%7 footer (heavy), a doc_id-keyed pair line whose heaviness
    depends on the sf's doc count (exercises the min_count boundary), and
    a unique marker (never heavy). The reassembled text_clean strings are
    VALUE-matched whole — order, separator, and per-doc kept/removed
    counts all locked."""
    from sketchlib.spark.dedup import dedup_lines

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("Subscribe to our newsletter"),
            F.concat(F.lit("All rights reserved "), (F.col("doc_id") % 7).cast("string")),
            F.concat(F.lit("pair "), (F.col("doc_id") % 250).cast("string")),
            F.concat(F.lit("doc marker "), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    cleaned, _report = dedup_lines(aug, min_count=3)
    return cleaned.orderBy("doc_id")


def q_c25_shuffle_shard(spark, sf_dir):
    """Round 5: deterministic global shuffle + sharding
    (`packing.shuffle_shard`) — the curation→training handoff: a
    REPRODUCIBLE pseudorandom permutation (60-bit md5-prefix key, shard =
    key % n) that is a pure function of (id, seed), independent of
    partitioning, cluster size, or file layout. Every row's key and shard
    are VALUE-matched against DuckDB computing the identical md5
    expression — cross-engine reproducibility is the operator's whole
    contract, so the oracle checks it directly."""
    from sketchlib.spark.packing import shuffle_shard

    docs = _t(spark, sf_dir, "documents")
    return (
        shuffle_shard(docs.select("doc_id"), n_shards=16, seed=7)
        .select("doc_id", "shuffle_key", "shard")
        .orderBy("shard", "shuffle_key", "doc_id")
    )


def q_c26_split_dataset(spark, sf_dir):
    """Round 5: deterministic train/val/test split (`packing.split_dataset`)
    — bucket membership is a pure function of (id, seed) via the 60-bit
    md5 key, so appending documents NEVER reassigns existing ones (Spark's
    randomSplit is partition-order sensitive: membership churns across
    corpus versions and silently leaks eval docs into training). Every
    row's assignment is VALUE-matched vs DuckDB evaluating the identical
    key expression against the identical integer boundaries."""
    from sketchlib.spark.packing import split_dataset

    docs = _t(spark, sf_dir, "documents")
    return (
        split_dataset(
            docs.select("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, seed=11
        )
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


_C27_PHRASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey"
)  # 23 words; with the zdup<k> variant word prepended each injected block is 24 tokens


def q_c27_duplicate_spans(spark, sf_dir):
    """Round 5: corpus-INTERNAL verbatim duplicate spans
    (`dedup.duplicate_spans`) — the train×train complement of c17 and the
    ExactSubstr policy signal (Lee et al. 2022: verbatim runs ≥ ~50 tokens
    repeated across a corpus hurt the model). Docs with doc_id%40==1 get a
    24-token block appended whose first word varies by doc_id%3, so docs
    sharing a variant share exactly that block: every (pair, longest-run,
    span, position) row is VALUE-matched against DuckDB running the same
    singleton-pruned self-join + diagonal gaps-and-islands on n-gram
    STRINGS (hash-free, so the oracle also witnesses that xxhash64
    introduced no spurious or lost matches at this scale)."""
    from sketchlib.spark.dedup import duplicate_spans
    from sketchlib.spark.tokenize import pre_tokens

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 40 == 1,
                F.concat(
                    F.lit(" zdup"),
                    (F.col("doc_id") % 3).cast("string"),
                    F.lit(" " + _C27_PHRASE),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    toks = aug.select("doc_id", pre_tokens("text").alias("tokens"))
    return duplicate_spans(
        toks, id_col="doc_id", n=8, min_span_tokens=24, element_cast=None
    ).orderBy("id_a", "id_b")


def q_c28_cut_spans(spark, sf_dir):
    """Round 5: ExactSubstr remediation (`dedup.cut_duplicate_spans`) —
    the cut half of Lee et al. 2022: each c27 pair keeps its span in the
    smaller id and cuts it from the larger, overlapping intervals applied
    in one pass over original positions. Properties checked on the same
    injected corpus as c27: pairs were found, a re-run of duplicate_spans
    on the CUT corpus finds nothing (the closure that defines the
    operation), every variant's minimum id retains its block verbatim,
    non-flagged docs are byte-untouched, and total cut tokens equals the
    token-count drop. Hash-based span positions are not DuckDB-computable,
    so the oracle is the property contract (c17/c22 precedent)."""
    from sketchlib.spark.dedup import cut_duplicate_spans, duplicate_spans
    from sketchlib.spark.tokenize import pre_tokens

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 40 == 1,
                F.concat(
                    F.lit(" zdup"),
                    (F.col("doc_id") % 3).cast("string"),
                    F.lit(" " + _C27_PHRASE),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    toks = aug.select("doc_id", pre_tokens("text").alias("tokens")).cache()
    spans = duplicate_spans(
        toks, id_col="doc_id", n=8, min_span_tokens=24, element_cast=None
    ).cache()
    n_pairs = spans.count()
    cut = cut_duplicate_spans(toks, spans).cache()
    remaining = duplicate_spans(
        cut, id_col="doc_id", n=8, min_span_tokens=24, element_cast=None
    ).count()
    cut_ids = [r["id_b"] for r in spans.select("id_b").distinct().collect()]
    joined = (
        toks.select("doc_id", F.col("tokens").alias("_before"))
        .join(cut, "doc_id")
        .cache()
    )
    not_cut = ~F.col("doc_id").isin(cut_ids) if cut_ids else F.lit(True)
    untouched_ok = (
        joined.filter(not_cut)
        .filter(
            (F.col("_before") != F.col("tokens")) | (F.col("n_cut_tokens") != 0)
        )
        .count()
        == 0
    )
    accounting_ok = (
        joined.filter(
            F.size("_before") - F.size("tokens") != F.col("n_cut_tokens")
        ).count()
        == 0
    )
    # the synthetic corpus contains genuinely duplicated docs (accidental
    # pairs, also present in c27's value-matched oracle) — the block-
    # retention check applies only to keepers that got the INJECTED phrase
    keeper_ids = sorted(
        {
            r["id_a"]
            for r in spans.select("id_a").distinct().collect()
            if r["id_a"] % 40 == 1
        }
        - set(cut_ids)
    )
    phrase_sql = "array(" + ",".join(f"'{w}'" for w in _C27_PHRASE.split()) + ")"
    keepers_ok = (
        cut.filter(F.col("doc_id").isin(keeper_ids) if keeper_ids else F.lit(False))
        .filter(
            F.expr(
                "NOT exists(sequence(0, size(tokens) - 23), "
                f"i -> slice(tokens, i + 1, 23) = {phrase_sql})"
            )
        )
        .count()
        == 0
    )
    rows = [
        ("flagged_pairs_nonzero", bool(n_pairs > 0)),
        ("post_cut_no_spans", bool(remaining == 0)),
        ("keepers_retain_block", bool(keepers_ok)),
        ("non_flagged_docs_untouched", bool(untouched_ok)),
        ("cut_accounting_consistent", bool(accounting_ok)),
    ]
    for df_ in (toks, spans, cut, joined):
        df_.unpersist()
    return spark.createDataFrame(rows, "check string, ok boolean").orderBy("check")


def q_b47_join_size(spark, sf_dir):
    """Round 5: JOIN-CARDINALITY estimation from CM states alone
    (query.join_size_estimate — Cormode & Muthukrishnan 2005 §4.2 inner
    product): |A ⋈ B on k| priced from two KB-sized sketch rows without
    touching either table, the planner's what-would-this-join-cost
    primitive. Guarantees checked vs the exact Spark join count on three
    shapes — fact⋈dim (orders⋈customer on custkey), fact⋈fact
    (lineitem⋈orders on orderkey), and DISJOINT key domains: the estimate
    never undercounts and overshoots ≤ ε·|A|·|B| (the published w.p. 1−δ
    bound; δ=0.01 so all three hold deterministically here in practice)."""
    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import join_size_estimate

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")

    def cm(df, col):
        spec = [SketchSpec("cm_k", "cm", col, {"eps": 1e-4, "delta": 0.01})]
        return build_sketches(df.select(col), spec, group_by=None)

    rows = []
    for name, (da, ca), (db, cb) in [
        ("orders_x_customer", (orders, "o_custkey"), (cust, "c_custkey")),
        ("lineitem_x_orders", (li, "l_orderkey"), (orders, "o_orderkey")),
    ]:
        # CM keys on the raw integer value, so both sides hash identically
        # regardless of column name; rename to a shared key for the build.
        sa = cm(da.select(F.col(ca).alias("k")), "k")
        sb = cm(db.select(F.col(cb).alias("k")), "k")
        est, bound = join_size_estimate(sa, sb, "cm_k")
        exact = da.join(db, da[ca] == db[cb]).count()
        rows.append((f"{name}_never_undercounts", bool(est >= exact)))
        rows.append((f"{name}_within_bound", bool(est - exact <= bound)))
    # disjoint domains: true join 0, estimate must stay under the bound
    sa = cm(orders.select(F.col("o_custkey").alias("k")), "k")
    sb = cm(orders.select((F.col("o_custkey") + F.lit(10**9)).alias("k")), "k")
    est, bound = join_size_estimate(sa, sb, "cm_k")
    rows.append(("disjoint_within_bound", bool(est <= bound)))
    return spark.createDataFrame(rows, "chk string, within_bound boolean").orderBy("chk")


def q_b49_grouped_join_size(spark, sf_dir):
    """Round 5: PER-GROUP join pricing / key-skew report
    (`query.join_size_df`) — grouped CM states priced pairwise per group;
    the SELF-pair is the per-group second frequency moment F₂ = Σc²
    (the self-join size), the standard skew diagnostic: the group whose
    F₂ explodes is the group whose join/dedup stage will too. Checked
    per l_returnflag group on lineitem's l_partkey keys: the estimate
    never undercounts the exact Σc² and overshoots ≤ ε·N²_g."""
    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import join_size_df

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    spec = [SketchSpec("cm_pk", "cm", "l_partkey", {"eps": 1e-4, "delta": 0.01})]
    states = build_sketches(li, spec, group_by="l_returnflag")
    est = {
        r["group"]: (r["join_rows_est"], r["join_rows_err"])
        for r in join_size_df(spark, states, states, "cm_pk").collect()
    }
    exact = {
        r["l_returnflag"]: r["f2"]
        for r in li.groupBy("l_returnflag", "l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("c") * F.col("c")).alias("f2"))
        .collect()
    }
    rows = []
    for g in sorted(exact):
        e, err = est[g]
        rows.append((g, bool(e >= exact[g] and e - exact[g] <= err)))
    return spark.createDataFrame(rows, "l_returnflag string, within_bound boolean").orderBy(
        "l_returnflag"
    )


def q_c37_hopping_window_stream(spark, sf_dir):
    """Round 5 (D14 extension): HOPPING event-time windows in the streaming
    sketch sink — `stream_build_windowed(..., slide=)` assigns each event
    to window/slide overlapping windows (Spark's own sliding-window
    semantics; one sequence-explode, then the per-(window × group) state
    path is unchanged and watermark finalization keys on window END).
    events streamed with window=2h, slide=1h: the sink's per-window `rows`
    metadata (exact assignment counts — every event lands in exactly 2
    windows) is VALUE-matched against DuckDB computing the identical hop
    assignment relationally; per-window HLL distinct-user estimates must
    sit within 3·rse of exact (`within_rse`). Per-window cardinalities
    here are TINY (~25), so the HLL sits in its small-range
    linear-counting regime where the error is register-collision noise
    (Poisson λ = n²/2m ≈ 2%/window at p=14), not the 1.04/√m asymptote —
    the bound adds a 2.5 absolute collision floor (covers ≤2 colliding
    pairs; P(≥3) across all ~720 windows is ~1e-4)."""
    import shutil
    import tempfile

    from sketchlib.sketches import deserialize
    from sketchlib.spark.streaming import stream_build_windowed

    ev = _t(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="c37_src_")
    state_dir = tempfile.mkdtemp(prefix="c37_states_")
    ckpt = tempfile.mkdtemp(prefix="c37_ckpt_")
    try:
        ev.repartition(4).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q, sink = stream_build_windowed(
            stream,
            [SketchSpec("hll_u", "hll", "user_id", {"p": 14})],
            state_dir, group_by=None, ts_col="ts",
            window="2 hours", delay="30 minutes", checkpoint_dir=ckpt,
            slide="1 hour",
        )
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError("c37 stream did not drain within 180s")
        st = sink.states(spark).toPandas()
        H = 3_600_000_000
        st["window_hour"] = (
            st["window_start"].astype("int64") // 1_000 // H
        )  # ns → µs → hours since epoch

        # exact per-window distinct users via the same hop assignment
        base = (F.unix_micros(F.col("ts").cast("timestamp")) / H).cast("long") * H
        assigned = (
            ev.withColumn("_k", F.explode(F.expr("sequence(0, 1)")))
            .withColumn("_ws", base - F.col("_k") * H)
        )
        exact = (
            assigned.groupBy("_ws")
            .agg(F.countDistinct("user_id").alias("nd"))
            .toPandas()
        )
        exact["window_hour"] = exact["_ws"] // H
        nd = dict(zip(exact["window_hour"], exact["nd"]))
        rse = 1.04 / (2.0 ** 14) ** 0.5
        rows = []
        for _, r in st.iterrows():
            est = deserialize(bytes(r["state"])).estimate()[0]
            ex = nd[r["window_hour"]]
            rows.append(
                (int(r["window_hour"]), int(r["rows"]),
                 bool(abs(est - ex) <= 3 * rse * ex + 2.5))
            )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(state_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["window_hour", "n_rows", "within_rse"])
    ).orderBy("window_hour")


def q_c36_unigram_surprisal(spark, sf_dir):
    """Round 5 (D34): per-document unigram LM surprisal — the CCNet-style
    LM-perplexity quality proxy (Wenzek et al. 2020 rank corpora by LM
    score; the unigram model is its cheapest honest stand-in):
    −(1/n)·Σ log2(c(t)/N) bits/token. Two modes, both checked:

    - EXACT: one vocabulary-sized count pass + one mapInArrow scoring pass
      (no shuffle, plan-locked in tests). VALUE-matched per doc vs DuckDB
      computing the identical quantity over raw WORDS — the Spark side
      tokenizes by FULL-WIDTH xxhash64 (no vocab modulus), which is
      injective on the observed vocabulary w.h.p., so hashed-id counts
      equal word counts and the two engines compute the same real number
      (rounded to 6 dp: summation order differs at ~1e-12).
    - CM-SERVED (`states=`): the corpus model is ONE Count-Min state row
      (KBs) — the 100 TB/daily-delta path, scoring docs with the corpus
      never recounted. CM never undercounts ⇒ the served surprisal never
      exceeds the exact one, and undershoots ≤ log2(1 + ε·N) per token;
      per-doc boolean `cm_within_bound`."""
    import math

    from sketchlib.spark.text import with_unigram_surprisal
    from sketchlib.spark.tokenize import pre_tokens

    docs = _t(spark, sf_dir, "documents").withColumn(
        "toks", F.transform(pre_tokens("text"), lambda t: F.xxhash64(t))
    ).localCheckpoint()

    exact = (
        with_unigram_surprisal(docs, "toks", round_to=6)
        .select("doc_id", "surprisal").toPandas()
    )
    grouped = (
        with_unigram_surprisal(
            docs, "toks", round_to=6, out="surprisal_by_source", group_by="source"
        )
        .select("doc_id", "surprisal_by_source").toPandas()
    )
    exact = exact.merge(grouped, on="doc_id")
    eps = 1e-4
    states = build_sketches(
        docs, [SketchSpec("cm_t", "cm", "toks", {"eps": eps, "delta": 0.01})],
        group_by=None,
    )
    n_total = docs.select(F.sum(F.size("toks"))).collect()[0][0]
    served = (
        with_unigram_surprisal(docs, "toks", states=states, sketch="cm_t")
        .select("doc_id", F.col("surprisal").alias("cm_s")).toPandas()
    )
    m = exact.merge(served, on="doc_id")
    slack = math.log2(1 + eps * float(n_total))
    m["cm_within_bound"] = (m["cm_s"] <= m["surprisal"] + 1e-6) & (
        m["surprisal"] - m["cm_s"] <= slack + 1e-6
    )
    out = m[["doc_id", "surprisal", "surprisal_by_source", "cm_within_bound"]]
    return spark.createDataFrame(out).orderBy("doc_id")


def q_b50_top_sum_weighted(spark, sf_dir):
    """Round 5: heavy hitters BY SUM — `APPROX_TOP_SUM(key, w, k)` served
    from ONE weighted Count-Min (each row adds its weight to the key's
    cell, so ε·N holds with N = ΣW; Cormode & Muthukrishnan 2005 — the
    analysis never uses unit increments). Answers Verdict's "SELECT key,
    SUM(w) ... ORDER BY 2 DESC LIMIT k" without a key-wide groupBy: the
    build is the same zero-shuffle map kernel, the state is KBs. Checked
    per l_returnflag group on lineitem (keys l_orderkey, weights
    l_quantity — integral doubles, exercising the checked int64 cast):
      within_bound       — every top-5 estimate e: true ≤ e ≤ true + ε·ΣW_g
      hybrid_matches     — `exact_rescore_topk(weight_col=...)` (weighted-CM
                           candidates exactly re-scored by SUM) == the true
                           top-5 by (SUM(w) DESC, key ASC) (sketch locates,
                           exact answers — Verdict's hybrid move)
      sql_matches        — the SQL door's grouped APPROX_TOP_SUM statement
                           returns the identical frame to the API route."""
    from sketchlib.spark.query import exact_rescore_topk, topk_df
    from sketchlib.sql import approx_sql

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_quantity"
    )
    spec = [
        SketchSpec(
            "cm_w", "cm", "l_orderkey", {"eps": 1e-4, "delta": 0.01},
            weight="l_quantity",
        )
    ]
    states = build_sketches(li, spec, group_by="l_returnflag")
    top = topk_df(spark, states, "cm_w", 5).toPandas()

    exact = (
        li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("s"))
        .toPandas()
    )
    hybrid = exact_rescore_topk(
        li, states, "cm_w", 5, tokens_col="l_orderkey",
        group_by="l_returnflag", weight_col="l_quantity",
    ).toPandas()

    rows = []
    for g, sub in exact.groupby("l_returnflag"):
        true = dict(zip(sub["l_orderkey"], sub["s"]))
        mine = top[top["group"] == g]
        bound = float(mine["err_bound"].iloc[0])
        wb = all(
            true.get(t, 0) <= e <= true.get(t, 0) + bound
            for t, e in zip(mine["token"], mine["est_count"])
        )
        hsub = hybrid[hybrid["group"] == g]
        resc = sorted(zip(hsub["token"], hsub["exact_sum"]),
                      key=lambda kv: (-kv[1], kv[0]))
        truth = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        rows.append((g, bool(wb), bool(resc == truth)))
    out = pd.DataFrame(rows, columns=["l_returnflag", "within_bound", "hybrid_matches"])

    sql = approx_sql(
        spark,
        "SELECT APPROX_TOP_SUM(l_orderkey, l_quantity, 5) FROM lineitem "
        "GROUP BY l_returnflag",
        tables={"lineitem": f"{sf_dir}/lineitem.parquet"},
    ).toPandas()
    api = top.rename(columns={"est_count": "est_sum"})
    sql_ok = bool(
        sql.sort_values(["group", "token"]).reset_index(drop=True).equals(
            api.sort_values(["group", "token"]).reset_index(drop=True)
        )
    )
    out["sql_matches"] = sql_ok
    return spark.createDataFrame(out).orderBy("l_returnflag")


def q_b48_join_rows_sql(spark, sf_dir):
    """Round 5: APPROX_JOIN_ROWS through the SQL door — `SELECT
    APPROX_JOIN_ROWS(a.k, b.k) FROM t1 a, t2 b` prices the join without
    running it. Two routes checked: on-the-fly (one CM build per side, no
    join executed) and FROM PERSISTED STATES (both sides' registered CMs,
    proven base-free by DELETING both base copies first — the A5
    substitution extended to the join-size question). Both estimates must
    never undercount the exact join count and overshoot ≤ ε·|A|·|B|;
    EXPLAIN must name the states route before execution (parity)."""
    import shutil
    import tempfile

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql, explain_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    exact = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).count()
    na, nb = orders.count(), cust.count()

    tbl = {
        "orders": f"{sf_dir}/orders.parquet",
        "customer": f"{sf_dir}/customer.parquet",
    }
    fly = approx_sql(
        spark,
        "SELECT APPROX_JOIN_ROWS(o.o_custkey, c.c_custkey) FROM orders o, customer c",
        tbl,
    ).collect()[0]
    rows = [
        ("fly_never_undercounts", bool(fly["join_rows_est"] >= exact)),
        ("fly_within_bound", bool(fly["join_rows_est"] - exact <= fly["join_rows_err"])),
        ("fly_bound_is_eps_na_nb", bool(abs(fly["join_rows_err"] - 1e-4 * na * nb) < 1e-6 * na * nb + 1e-9)),
    ]

    work = tempfile.mkdtemp(prefix="sketchlib_b48_")
    try:
        # registered states answer with both BASE COPIES DELETED
        oc, cc = os.path.join(work, "orders"), os.path.join(work, "customer")
        for src, dst in ((tbl["orders"], oc), (tbl["customer"], cc)):
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:  # sf dirs store single-file tables: wrap in a directory
                os.makedirs(dst)
                shutil.copyfile(src, os.path.join(dst, "part-0.parquet"))
        t2 = {"orders": oc, "customer": cc}
        cat = SketchCatalog(spark, os.path.join(work, "cat"))
        approx_sql(spark, "CREATE SKETCHES b48o FROM orders KINDS cm(o_custkey)", t2, cat).collect()
        approx_sql(spark, "CREATE SKETCHES b48c FROM customer KINDS cm(c_custkey)", t2, cat).collect()
        stmt = "SELECT APPROX_JOIN_ROWS(o.o_custkey, c.c_custkey) AS jr FROM orders o, customer c"
        ex = {k: v for k, v in explain_sql(spark, stmt, t2, cat).collect()}
        rows.append(("explain_names_states_route",
                     bool(ex.get("route", "").startswith("persisted sketch states"))))
        shutil.rmtree(oc)
        shutil.rmtree(cc)
        st = approx_sql(spark, stmt, t2, cat).collect()[0]
        rows.append(("states_never_undercounts", bool(st["jr"] >= exact)))
        rows.append(("states_within_bound", bool(st["jr"] - exact <= st["jr_err"])))
        rows.append(("states_base_free", True))  # reaching here = no base scan
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, "chk string, within_bound boolean").orderBy("chk")


def q_b46_plugin_sketch(spark, sf_dir):
    """Round 5: USER-DEFINED sketch kinds (`register_sketch_kind`, the A19
    extension point) end-to-end through the DDL door: the contrib
    MinMaxSketch plugin registers at import, `CREATE SKETCHES ... KINDS
    minmax(n_chars) GROUP BY source` builds it through the zero-shuffle
    kernel + semilattice merge, and `estimates_df` serves per-group
    ranges from the persisted states with the answer VALUE-matched vs
    DuckDB's exact max-min (the plugin is an exact sketch, so the oracle
    needs no bound slack). The base table is NOT deleted here — the point
    is kind extensibility, not A5 routing (b38 covers that)."""
    import shutil
    import tempfile

    import sketchlib.sketches.contrib  # noqa: F401 — registers 'minmax'
    from sketchlib.spark import estimates_df
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    work = tempfile.mkdtemp(prefix="sketchlib_b46_")
    try:
        cat = SketchCatalog(spark, f"{work}/cat")
        t = {"docs": f"{sf_dir}/documents.parquet"}
        approx_sql(
            spark,
            "CREATE SKETCHES b46set FROM docs KINDS minmax(n_chars) GROUP BY source",
            t,
            cat,
        ).collect()
        out = (
            estimates_df(spark, cat.states("b46set"), "minmax_n_chars")
            .select(
                F.col("group").alias("source"),
                F.col("estimate").alias("char_range"),
                F.col("rse_bound").alias("range_err"),
            )
            .orderBy("source")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_c29_cut_accounting(spark, sf_dir):
    """Round 5: VALUE-matched cut accounting for the ExactSubstr
    remediation — c28 checks the closure property; this locks the actual
    token arithmetic: for every doc that loses text, the number of tokens
    cut must equal the size of the UNION of its pairs' [b_start,
    b_start+span) intervals (a doc hit by several overlapping pairs is
    cut once). The oracle reruns c27's span algebra on n-gram strings and
    merges the intervals relationally (sort + running-max gaps-and-
    islands), so Spark's exists-over-intervals filter is checked against
    an independent formulation of the same set arithmetic."""
    from sketchlib.spark.dedup import cut_duplicate_spans, duplicate_spans
    from sketchlib.spark.tokenize import pre_tokens

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 40 == 1,
                F.concat(
                    F.lit(" zdup"),
                    (F.col("doc_id") % 3).cast("string"),
                    F.lit(" " + _C27_PHRASE),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    toks = aug.select("doc_id", pre_tokens("text").alias("tokens"))
    spans = duplicate_spans(
        toks, id_col="doc_id", n=8, min_span_tokens=24, element_cast=None
    )
    cut = cut_duplicate_spans(toks, spans)
    return (
        cut.filter(F.col("n_cut_tokens") > 0)
        .select("doc_id", F.col("n_cut_tokens").cast("long").alias("n_cut_tokens"))
        .orderBy("doc_id")
    )


def q_c30_budget_selection(spark, sf_dir):
    """Round 5 continuation: quality-ranked selection under a TOKEN BUDGET
    (`sampling.select_within_budget`) — per source, keep the maximal prefix
    of docs in (score DESC, id ASC) order whose cumulative token count fits
    the budget (the "take the best N tokens of each source" step between
    quality scoring and mixture composition). The distributed shape is a
    per-(source, score-bucket) token histogram + map-side threshold keep +
    a window over ONLY the boundary bucket — never the naive one-task-per-
    source window — and the kept SET is value-matched here against DuckDB
    running exactly that naive window (`sum(n_tok) OVER (PARTITION BY
    source ORDER BY score DESC, doc_id) <= budget`), ties and boundary
    included. Score/n_tok are deterministic arithmetic on (n_chars,
    doc_id), identically in the oracle; n_buckets=64 keeps several sources'
    boundaries INSIDE a bucket so the exact-prefix window path is
    exercised, not just whole-bucket keeps."""
    from sketchlib.spark.sampling import select_within_budget

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        ((F.col("n_chars") % 37) + (F.col("doc_id") % 7) / 10.0).alias("score"),
        (F.col("n_chars") % 97 + 5).cast("long").alias("n_tok"),
    )
    kept = select_within_budget(docs, 800, "score", n_buckets=64)
    return kept.orderBy("doc_id")


def q_c31_upsample_mixture(spark, sf_dir):
    """Round 5 continuation: deterministic mixture UPSAMPLING
    (`sampling.upsample_mixture`) — the replication half mixture_sample
    flags but refuses to do silently: each source gets floor(f) copies per
    doc plus one more for the md5-keyed fraction of ids covering the
    remainder, so epochs-per-source is explicit AND reproducible (a pure
    function of (id, seed, f), never of partitioning or cluster size).
    Fractions here follow source-number % 3 → {2.25, 1.0, 0.5}: an
    over-unity source (copy fan-out), an identity source, and a sub-unity
    source (keyed drop). Every (doc, copy) row is VALUE-matched against
    DuckDB computing the identical md5 coin and per-copy unnest — the
    binary-exact remainder bounds (2^58, 2^59) make the two engines'
    integer comparisons literally identical."""
    from sketchlib.spark.sampling import upsample_mixture

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    fr = {s: {0: 2.25, 1: 1.0, 2: 0.5}[int(s[3:]) % 3] for s in srcs}
    out = upsample_mixture(docs, fr, seed=3)
    return out.select(
        "doc_id", "source", F.col("copy").cast("int").alias("copy")
    ).orderBy("doc_id", "copy")


def q_c35_weighted_sample(spark, sf_dir):
    """Round 5 continuation: DETERMINISTIC weighted sampling
    (`sampling.weighted_sample`, Efraimidis–Spirakis A-Res) — 40 docs per
    source drawn with probability ∝ n_chars, priorities ln(u)/w from the
    shared 60-bit md5(id:seed) coin. Cross-engine reproducibility IS the
    contract: DuckDB evaluates the identical md5 key, priority, and
    per-source row_number ≤ k window, and every kept (doc_id, source) row
    must VALUE-match. (Priorities are continuous random values — nearest
    gaps at this scale are ~1e-8 relative, so libm ulp differences cannot
    flip the order.)"""
    from sketchlib.spark.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    kept = weighted_sample(docs, 40, "n_chars", group_col="source", seed=7)
    return kept.select("doc_id", "source").orderBy("source", "doc_id")


def q_c34_source_overlap(spark, sf_dir):
    """Round 5 continuation: cross-source OVERLAP MATRIX
    (`sampling.source_overlap`) — the mixture-design report "how much does
    source A already contain of source B", exact per unordered pair on the
    sources' distinct word vocabularies: (n_a, n_b, n_common, jaccard),
    disjoint pairs included at zero. One groupBy(fp) builds each word's
    sorted group set (map-side partial agg; never a corpus self-join) and
    pairs expand map-side from the ≤G arrays. VALUE-matched vs DuckDB
    computing the same matrix relationally (DISTINCT + self-join) — two
    independent formulations of the same set arithmetic. The sketch route
    for 100 TB (per-source MinHash jaccard_df) is cross-validated against
    this exact matrix in tests."""
    from sketchlib.spark.sampling import source_overlap
    from sketchlib.spark.tokenize import pre_tokens

    docs = _t(spark, sf_dir, "documents")
    flat = docs.select("source", F.explode(pre_tokens("text")).alias("w"))
    return source_overlap(flat, "w")


def q_c38_source_divergence(spark, sf_dir):
    """Round 5 close: pairwise JENSEN-SHANNON DIVERGENCE between per-source
    token unigram distributions (`sampling.source_divergence`) — the
    frequency-profile companion to c34's vocabulary overlap: two sources
    can share most of their vocabulary yet USE it with different
    frequencies, and it is the distribution, not the set, that mixture
    design cares about. Exact, in bits (0 = identical, 1 = disjoint;
    disjoint pairs come out at exactly 1.0 via the clamped decomposition).
    Scale shape: the corpus shuffles once into the distinct (source, word)
    profile, per-word ≤G-element probability arrays expand pairs MAP-SIDE
    (the source_overlap shape); single-support words never enter the pair
    stream — their mass folds in through the per-pair coverage terms.
    VALUE-matched (6 dp) vs DuckDB computing the identical decomposition
    relationally (self-join on the word); both engines mirror the exact
    IEEE expression shape so only summation order differs (~1e-15)."""
    from sketchlib.spark.sampling import source_divergence
    from sketchlib.spark.tokenize import pre_tokens

    docs = _t(spark, sf_dir, "documents")
    flat = docs.select("source", F.explode(pre_tokens("text")).alias("w"))
    out = source_divergence(flat, "w")
    return out.select(
        "group_a",
        "group_b",
        "n_common",
        F.round("js_divergence", 6).alias("js_divergence"),
    )


def q_c39_tfidf_terms(spark, sf_dir):
    """Round 5 close: per-source CHARACTERISTIC TERMS by TF-IDF
    (`text.tfidf_terms`) — the data-card "what is this source about"
    report: top-8 terms per source by tf_{g,w}·ln(N/df_w), ranked on the
    6-dp-ROUNDED score with a term-ASC tie-break so both engines resolve
    mathematically-coincident scores (2·ln 2 = ln 4 across distinct
    (tf, df) pairs) identically. A term in every document scores ln(1)=0
    exactly — boilerplate self-cancels with no stopword list. Plan shape:
    doc frequencies via explode(array_distinct(tokens)) (per-doc dedup
    inside the row — no (doc, term) DISTINCT shuffle), per-group top-k as
    a rank window Catalyst rewrites to a map-side WindowGroupLimit
    (plan-locked in tests). VALUE-matched vs DuckDB running the identical
    scoring + window relationally."""
    from sketchlib.spark.text import tfidf_terms
    from sketchlib.spark.tokenize import pre_tokens

    docs = _t(spark, sf_dir, "documents").withColumn("words", pre_tokens("text"))
    out = tfidf_terms(docs, "words", group_col="source", k=8, round_to=6)
    return out.select(
        F.col("group").alias("source"),
        "term",
        "tf",
        "doc_freq",
        "tfidf",
        F.col("rank").cast("long").alias("rank"),
    )


def q_c40_zipf_fit(spark, sf_dir):
    """Round 5 close: per-source ZIPF rank-frequency fit
    (`text.zipf_fit`) — the corpus-health diagnostic: OLS of ln(count) on
    ln(rank) per source (natural text sits near slope -1; templated or
    machine-generated sources bend the curve), rank assigned
    deterministically (count DESC, word ASC). One map-side-combined
    groupBy to the vocab-sized frequency table, a per-group window rank,
    and a six-sums regression aggregation; the closed-form algebra runs
    on a G-row frame. VALUE-matched (6 dp) vs DuckDB running the
    identical ranking + closed-form sums relationally."""
    from sketchlib.spark.text import zipf_fit
    from sketchlib.spark.tokenize import pre_tokens

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull())
        .withColumn("words", pre_tokens("text"))
    )
    out = zipf_fit(docs, "words", group_col="source", round_to=6)
    return out.select(
        F.col("group").alias("source"),
        "n_terms",
        "n_tokens",
        "slope",
        "intercept",
        "r2",
    )


def q_c41_centroid_similarity(spark, sf_dir):
    """Round 5 close: pairwise COSINE between per-label embedding
    CENTROIDS (`ann.centroid_similarity`) — the embedding-space companion
    to c34/c38's token-level source matrices: how close two corpus slices
    sit in representation space, the first-look duplicate-source signal
    before any pairwise-document work. One corpus pass (posexplode
    collapsed by map-side partial agg — shuffle volume tasks x G x dim,
    corpus-independent); the G^2 algebra is a dimension-keyed self-join
    over the tiny centroid frame. VALUE-matched (6 dp) vs DuckDB running
    the identical relational dot/norm/cosine over unnested vectors."""
    from sketchlib.spark.ann import centroid_similarity

    emb = _t(spark, sf_dir, "embeddings")
    return centroid_similarity(emb, "embedding", "label", round_to=6)


def q_c42_pmi_collocations(spark, sf_dir):
    """Round 5 close: top-20 COLLOCATIONS by pointwise mutual information
    (`text.pmi_collocations`, Church & Hanks 1990) — the data-card "which
    word pairs travel together" report, min_count-floored (raw PMI is
    maximized by hapax pairs). Bigram/unigram tables are each one
    map-side-combined groupBy; scoring joins are vocab-keyed; top-k is
    TakeOrderedAndProject. Ranked on the 6-dp-ROUNDED score with
    (w1, w2) tie-breaks so both engines resolve ties identically;
    VALUE-matched vs DuckDB computing the identical PMI expression."""
    from sketchlib.spark.text import pmi_collocations
    from sketchlib.spark.tokenize import pre_tokens

    docs = _t(spark, sf_dir, "documents").withColumn("words", pre_tokens("text"))
    return pmi_collocations(docs, "words", k=20, min_count=5, round_to=6)


def q_c43_histogram(spark, sf_dir):
    """Round 5 close: grouped equi-width HISTOGRAM
    (`sampling.histogram_df`) of document lengths per source — the
    profiling primitive every data card leads with, exact and
    zero-filled (empty bins present), edges GLOBAL so per-source
    histograms are directly comparable. Bin assignment is closed-form
    IEEE f64 (`least(bins-1, floor((x-lo)/width))`), so the oracle
    assigns IDENTICAL bins and the counts match exactly — no float
    tolerance; only the edge-reporting columns are rounded."""
    from sketchlib.spark.sampling import histogram_df

    docs = _t(spark, sf_dir, "documents")
    return histogram_df(
        docs, "n_chars", bins=16, group_col="source", round_to=6
    )


def q_c33_top_ngrams(spark, sf_dir):
    """Round 5 continuation: corpus-wide TOP n-gram report
    (`text.top_ngrams`) — the boilerplate-detection stage feeding
    dedup_lines policy (a 3-gram in half the corpus is a template, not
    content). Runs on word STRINGS (pre_tokens, whitespace mode) so the
    DuckDB oracle computes the identical grams hash-free; output is the
    top-20 3-grams with exact counts, deterministic under count ties
    (cnt DESC, ngram ASC — both engines break ties on the joined string).
    Plan shape: one groupBy with map-side partial agg + TakeOrderedAndProject
    (per-partition top-k, no global sort) — test-locked."""
    from sketchlib.spark.text import top_ngrams
    from sketchlib.spark.tokenize import pre_tokens

    docs = _t(spark, sf_dir, "documents").withColumn("words", pre_tokens("text"))
    top = top_ngrams(docs, "words", n=3, k=20)
    return top.select(
        F.array_join("ngram", " ").alias("ngram"), F.col("cnt")
    ).orderBy(F.desc("cnt"), F.asc("ngram"))


def q_c32_cap_per_group(spark, sf_dir):
    """Round 5 continuation: per-group document cap
    (`sampling.cap_per_group`) — the RefinedWeb-style "at most N docs per
    domain/language" curation step. Grouping on `lang` is deliberately
    skewed in the testdata (en ≈ 3× the rest), so cap=72 exercises BOTH
    paths: en/zh/es are clipped through the over-cap-only window (whose
    row_number()<=cap Catalyst rewrites into a map-side partial
    WindowGroupLimit, plan-locked) while de/fr pass through the
    zero-shuffle under-cap branch. The kept SET is
    value-matched against DuckDB running the naive per-group window
    (`row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
    <= cap`) — duplicate n_chars within a language make the doc_id
    tie-break load-bearing in both engines."""
    from sketchlib.spark.sampling import cap_per_group

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    kept = cap_per_group(docs, 72, group_col="lang", score_col="n_chars")
    return kept.orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "a06_project_filter": _dist_wrapped(q_a06_project_filter),
        "a07_filter_predicates": _dist_wrapped(q_a07_filter_predicates),
        "a08_join_broadcast": _dist_wrapped(q_a08_join_broadcast),
        "a09_groupby_agg": _dist_wrapped(q_a09_groupby_agg),
        "a10_count_sum_avg": _dist_wrapped(q_a10_count_sum_avg),
        "a11_time_buckets": _dist_wrapped(q_a11_time_buckets),
        "a12_left_join": _dist_wrapped(q_a12_left_join),
        "a13_minmax": _dist_wrapped(q_a13_minmax),
        "a14_topk_orderby_limit": _dist_wrapped(q_a14_topk_orderby_limit),
        "a16_subquery": _dist_wrapped(q_a16_subquery),
        "a17_union": _dist_wrapped(q_a17_union),
        "b01_hll_distinct_docs": _dist_wrapped(q_b01_hll_distinct_docs),
        "b02_hll_distinct_tokens": _dist_wrapped(q_b02_hll_distinct_tokens),
        "b03_cm_topk_tokens": _dist_wrapped(q_b03_cm_topk_tokens),
        "b04_kll_price_quantiles": _dist_wrapped(q_b04_kll_price_quantiles),
        "b05_tdigest_price_quantiles": _dist_wrapped(q_b05_tdigest_price_quantiles),
        "b52_dd_price_quantiles": _dist_wrapped(q_b52_dd_price_quantiles),
        "b53_rollup_grouping_sets": _dist_wrapped(q_b53_rollup_grouping_sets),
        "b54_kll_mad": _dist_wrapped(q_b54_kll_mad),
        "b55_equidepth_histogram": _dist_wrapped(q_b55_equidepth_histogram),
        "b57_trimmed_mean": _dist_wrapped(q_b57_trimmed_mean),
        "b58_sql_robust_stats": _dist_wrapped(q_b58_sql_robust_stats),
        "b59_weighted_tdigest_quantiles": _dist_wrapped(q_b59_weighted_tdigest_quantiles),
        "b60_sql_frequent": _dist_wrapped(q_b60_sql_frequent),
        "b56_mg_topk_tokens": _dist_wrapped(q_b56_mg_topk_tokens),
        "b06_bloom_membership": _dist_wrapped(q_b06_bloom_membership),
        "b07_minhash_jaccard": _dist_wrapped(q_b07_minhash_jaccard),
        "b08_hll_union_groups": _dist_wrapped(q_b08_hll_union_groups),
        "b09_sampled_agg_uniform": _dist_wrapped(q_b09_sampled_agg_uniform),
        "b13_universe_distinct": _dist_wrapped(q_b13_universe_distinct),
        "b14_kmv_distinct": _dist_wrapped(q_b14_kmv_distinct),
        "b15_approx_join": _dist_wrapped(q_b15_approx_join),
        "b16_catalog_sql": _dist_wrapped(q_b16_catalog_sql),
        "b17_intersection_estimate": _dist_wrapped(q_b17_intersection_estimate),
        "b18_ivf_self_recovery": _dist_wrapped(q_b18_ivf_self_recovery),
        "b19_bloom_file_pruning": _dist_wrapped(q_b19_bloom_file_pruning),
        "b20_multimodal_plumbing": _dist_wrapped(q_b20_multimodal_plumbing),
        "b21_checkpoint_resume": _dist_wrapped(q_b21_checkpoint_resume),
        "b22_streamed_states_match_batch": _dist_wrapped(q_b22_streamed_states_match_batch),
        "b23_distributed_estimates_highcard": _dist_wrapped(q_b23_distributed_estimates_highcard),
        "b24_multicol_group_by": _dist_wrapped(q_b24_multicol_group_by),
        "b25_stratified_avg_sql": _dist_wrapped(q_b25_stratified_avg_sql),
        "b26_approx_join_sql": _dist_wrapped(q_b26_approx_join_sql),
        "b27_auto_routed_sql": _dist_wrapped(q_b27_auto_routed_sql),
        "b28_exact_passthrough": _dist_wrapped(q_b28_exact_passthrough),
        "b29_incremental_refresh": _dist_wrapped(q_b29_incremental_refresh),
        "b30_join_where_sql": _dist_wrapped(q_b30_join_where_sql),
        "b31_join_alias_mixed_sql": _dist_wrapped(q_b31_join_alias_mixed_sql),
        "b32_approx_subquery": _dist_wrapped(q_b32_approx_subquery),
        "b33_in_subquery_where": _dist_wrapped(q_b33_in_subquery_where),
        "b34_explain_routing": _dist_wrapped(q_b34_explain_routing),
        "b35_setop_sql": _dist_wrapped(q_b35_setop_sql),
        "b36_union_rewrite": _dist_wrapped(q_b36_union_rewrite),
        "b37_grouped_setop": _dist_wrapped(q_b37_grouped_setop),
        "b38_setop_from_states": _dist_wrapped(q_b38_setop_from_states),
        "b39_unionall_merge_states": _dist_wrapped(q_b39_unionall_merge_states),
        "b40_unionall_sample_route": _dist_wrapped(q_b40_unionall_sample_route),
        "b41_moments_aggregates": _dist_wrapped(q_b41_moments_aggregates),
        "b42_bivariate_aggregates": _dist_wrapped(q_b42_bivariate_aggregates),
        "b43_accuracy_contracts": _dist_wrapped(q_b43_accuracy_contracts),
        "b44_contract_registry_pilot": _dist_wrapped(q_b44_contract_registry_pilot),
        "b45_subsample_error": _dist_wrapped(q_b45_subsample_error),
        "b46_plugin_sketch": _dist_wrapped(q_b46_plugin_sketch),
        "b47_join_size": _dist_wrapped(q_b47_join_size),
        "b48_join_rows_sql": _dist_wrapped(q_b48_join_rows_sql),
        "b49_grouped_join_size": _dist_wrapped(q_b49_grouped_join_size),
        "b50_top_sum_weighted": _dist_wrapped(q_b50_top_sum_weighted),
        "b51_zonemap_pruning": _dist_wrapped(q_b51_zonemap_pruning),
        "c36_unigram_surprisal": _dist_wrapped(q_c36_unigram_surprisal),
        "c37_hopping_window_stream": _dist_wrapped(q_c37_hopping_window_stream),
        "c11_sessionize": _dist_wrapped(q_c11_sessionize),
        "b10_partition_invariance": _dist_wrapped(q_b10_partition_invariance),
        "b11_hybrid_topk": _dist_wrapped(q_b11_hybrid_topk),
        "c01_exact_dedup": _dist_wrapped(q_c01_exact_dedup),
        "c02_token_stats": _dist_wrapped(q_c02_token_stats),
        "c03_minhash_lsh_dedup": _dist_wrapped(q_c03_minhash_lsh_dedup),
        "c04_simhash_dups": _dist_wrapped(q_c04_simhash_dups),
        "c05_ann_top1": _dist_wrapped(q_c05_ann_top1),
        "c06_embedding_near_dup": _dist_wrapped(q_c06_embedding_near_dup),
        "c07_srp_batch_self_recovery": _dist_wrapped(q_c07_srp_batch_self_recovery),
        "c08_asof_join": _dist_wrapped(q_c08_asof_join),
        "c09_winnow_containment": _dist_wrapped(q_c09_winnow_containment),
        "c10_ngram_minhash_dedup": _dist_wrapped(q_c10_ngram_minhash_dedup),
        "c12_ann_from_persisted_index": _dist_wrapped(q_c12_ann_from_persisted_index),
        "c13_sequence_packing": _dist_wrapped(q_c13_sequence_packing),
        "c14_contamination": _dist_wrapped(q_c14_contamination),
        "c15_mixture_sample": _dist_wrapped(q_c15_mixture_sample),
        "c16_repetition_stats": _dist_wrapped(q_c16_repetition_stats),
        "c17_contamination_spans": _dist_wrapped(q_c17_contamination_spans),
        "c18_dedup_delta": _dist_wrapped(q_c18_dedup_delta),
        "c19_signature_catalog": _dist_wrapped(q_c19_signature_catalog),
        "c21_quality_gates": _dist_wrapped(q_c21_quality_gates),
        "c22_streaming_signatures": _dist_wrapped(q_c22_streaming_signatures),
        "c20_chunking": _dist_wrapped(q_c20_chunking),
        "c23_pii_redaction": _dist_wrapped(q_c23_pii_redaction),
        "c24_line_dedup": _dist_wrapped(q_c24_line_dedup),
        "c25_shuffle_shard": _dist_wrapped(q_c25_shuffle_shard),
        "c26_split_dataset": _dist_wrapped(q_c26_split_dataset),
        "c27_duplicate_spans": _dist_wrapped(q_c27_duplicate_spans),
        "c28_cut_spans": _dist_wrapped(q_c28_cut_spans),
        "c29_cut_accounting": _dist_wrapped(q_c29_cut_accounting),
        "c30_budget_selection": _dist_wrapped(q_c30_budget_selection),
        "c31_upsample_mixture": _dist_wrapped(q_c31_upsample_mixture),
        "c32_cap_per_group": _dist_wrapped(q_c32_cap_per_group),
        "c33_top_ngrams": _dist_wrapped(q_c33_top_ngrams),
        "c34_source_overlap": _dist_wrapped(q_c34_source_overlap),
        "c35_weighted_sample": _dist_wrapped(q_c35_weighted_sample),
        "c38_source_divergence": _dist_wrapped(q_c38_source_divergence),
        "c39_tfidf_terms": _dist_wrapped(q_c39_tfidf_terms),
        "c40_zipf_fit": _dist_wrapped(q_c40_zipf_fit),
        "c41_centroid_similarity": _dist_wrapped(q_c41_centroid_similarity),
        "c42_pmi_collocations": _dist_wrapped(q_c42_pmi_collocations),
        "c43_histogram": _dist_wrapped(q_c43_histogram),
        "c44_embedding_spectrum": _dist_wrapped(q_c44_embedding_spectrum),
        "c45_embedding_drift": _dist_wrapped(q_c45_embedding_drift),
        "c46_freq_drift": _dist_wrapped(q_c46_freq_drift),
        "c47_temperature_mixture": _dist_wrapped(q_c47_temperature_mixture),
        "c48_percentile_normalize": _dist_wrapped(q_c48_percentile_normalize),
        "c50_fuzzy_contamination": _dist_wrapped(q_c50_fuzzy_contamination),
        "c51_corpus_drift": _dist_wrapped(q_c51_corpus_drift),
        "c52_streaming_scramble": _dist_wrapped(q_c52_streaming_scramble),
        "c49_percentile_gate_kll": _dist_wrapped(q_c49_percentile_gate_kll),
    }


def oracle_sql() -> dict[str, str]:
    cents = "CAST(round(o_totalprice*100, 0) AS BIGINT)"
    return {
        "a06_project_filter": """
            SELECT l_orderkey, l_linenumber,
                   CAST(round(l_extendedprice*(1-l_discount)*10000, 0) AS BIGINT) AS net_4dp
            FROM lineitem WHERE l_quantity > 45
        """,
        # NOTE (round 2): DuckDB widens sum(BIGINT) -> HUGEINT, which pandas
        # renders as float64 while Spark returns int64 — every outer sum() in
        # these oracles is therefore CAST(... AS BIGINT) so both engines hash
        # identically (root cause of the round-1 a* hash_match failures).
        "a07_filter_predicates": f"""
            SELECT o_orderstatus, count(*) AS n_orders, CAST(sum({cents}) AS BIGINT) AS sum_cents
            FROM orders
            WHERE o_orderstatus IN ('O','F') AND o_totalprice BETWEEN 1000 AND 200000
              AND o_orderpriority LIKE '1-%' AND o_custkey IS NOT NULL
            GROUP BY o_orderstatus
        """,
        "a08_join_broadcast": f"""
            SELECT n_name, count(*) AS n_orders, CAST(sum({cents}) AS BIGINT) AS revenue_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "a09_groupby_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000, 0) AS BIGINT)) AS BIGINT) AS sum_disc_4dp,
                   CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000, 0) AS BIGINT)) AS BIGINT) AS sum_charge_6dp,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "a10_count_sum_avg": """
            SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents,
                   CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS DOUBLE) / count(*) AS avg_value_cents
            FROM events GROUP BY event_type
        """,
        "a11_time_buckets": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "a12_left_join": """
            SELECT n_name, count(*) AS n_customers,
                   CAST(sum(CASE WHEN t.n_ord IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_orders
            FROM customer
            LEFT JOIN (SELECT o_custkey, count(*) AS n_ord FROM orders GROUP BY o_custkey) t
                   ON c_custkey = t.o_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "a13_minmax": f"""
            SELECT o_orderpriority, min({cents}) AS min_cents, max({cents}) AS max_cents
            FROM orders GROUP BY o_orderpriority
        """,
        "a14_topk_orderby_limit": f"""
            SELECT o_custkey, CAST(sum({cents}) AS BIGINT) AS revenue_cents
            FROM orders GROUP BY o_custkey
            ORDER BY revenue_cents DESC, o_custkey ASC LIMIT 10
        """,
        "a16_subquery": f"""
            SELECT count(*) AS n_above, CAST(sum(cents) AS BIGINT) AS sum_cents_above
            FROM (SELECT {cents} AS cents FROM orders)
            WHERE cents * (SELECT count(*) FROM orders)
                  > (SELECT sum({cents}) FROM orders)
        """,
        "a17_union": f"""
            SELECT count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS sum_cents FROM (
                SELECT o_orderkey, {cents} AS cents FROM orders WHERE o_totalprice > 150000
                UNION
                SELECT o_orderkey, {cents} AS cents FROM orders WHERE o_orderpriority = '1-URGENT'
            )
        """,
        "b01_hll_distinct_docs": "SELECT source, TRUE AS within_bound FROM documents GROUP BY source",
        "b02_hll_distinct_tokens": "SELECT source, TRUE AS within_bound FROM documents GROUP BY source",
        "b03_cm_topk_tokens": "SELECT source, TRUE AS within_bound FROM documents GROUP BY source",
        "b56_mg_topk_tokens": (
            "SELECT source, TRUE AS within_bound, TRUE AS cert_ok "
            "FROM documents GROUP BY source"
        ),
        "b04_kll_price_quantiles": """
            SELECT l_returnflag, q, TRUE AS within_bound
            FROM (SELECT DISTINCT l_returnflag FROM lineitem),
                 (SELECT unnest([0.5, 0.9, 0.99]) AS q)
        """,
        "b05_tdigest_price_quantiles": """
            SELECT l_returnflag, q, TRUE AS within_bound
            FROM (SELECT DISTINCT l_returnflag FROM lineitem),
                 (SELECT unnest([0.5, 0.9, 0.99]) AS q)
        """,
        "b52_dd_price_quantiles": """
            SELECT l_returnflag, q, TRUE AS within_bound
            FROM (SELECT DISTINCT l_returnflag FROM lineitem),
                 (SELECT unnest([0.5, 0.9, 0.99]) AS q)
        """,
        "b53_rollup_grouping_sets": """
            SELECT COALESCE(o_orderstatus, '(all)') AS o_orderstatus,
                   COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
                   CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER)
                     AS grouping_lvl,
                   TRUE AS within_bound
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "b54_kll_mad": (
            "SELECT l_returnflag, TRUE AS within_bound FROM lineitem GROUP BY l_returnflag"
        ),
        "b57_trimmed_mean": (
            "SELECT l_returnflag, TRUE AS within_bound FROM lineitem GROUP BY l_returnflag"
        ),
        "b58_sql_robust_stats": (
            "SELECT l_returnflag, TRUE AS within_bound FROM lineitem "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "b59_weighted_tdigest_quantiles": """
            SELECT l_returnflag, q, TRUE AS within_bound
            FROM (SELECT DISTINCT l_returnflag FROM lineitem),
                 (SELECT unnest([0.25, 0.5, 0.9]) AS q)
        """,
        "b60_sql_frequent": (
            "SELECT l_returnflag, TRUE AS within_bound FROM lineitem "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "b55_equidepth_histogram": """
            SELECT l_returnflag, CAST(b AS INTEGER) AS bin, TRUE AS within_bound
            FROM (SELECT DISTINCT l_returnflag FROM lineitem),
                 (SELECT unnest(range(8)) AS b)
        """,
        "b08_hll_union_groups": "SELECT TRUE AS within_bound",
        "b09_sampled_agg_uniform": "SELECT DISTINCT l_returnflag, TRUE AS within_ci FROM lineitem",
        "b13_universe_distinct": "SELECT TRUE AS within_ci",
        "b14_kmv_distinct": "SELECT source, TRUE AS within_bound FROM documents GROUP BY source",
        "b15_approx_join": "SELECT TRUE AS count_within_ci, TRUE AS sum_within_ci",
        "b26_approx_join_sql": "SELECT TRUE AS count_within_ci, TRUE AS sum_within_ci",
        "b30_join_where_sql": "SELECT TRUE AS count_within_ci, TRUE AS sum_within_ci",
        "b31_join_alias_mixed_sql": """
            SELECT c_mktsegment, TRUE AS count_within_ci, TRUE AS sum_within_ci
            FROM (SELECT DISTINCT c_mktsegment FROM customer) ORDER BY c_mktsegment
        """,
        "b32_approx_subquery": "SELECT TRUE AS caveat_present, TRUE AS median_within_tol",
        "b33_in_subquery_where": "SELECT TRUE AS sample_sum_within_ci, TRUE AS sketch_cd_within_bound",
        "b34_explain_routing": """
            SELECT * FROM (VALUES
              ('states', 'statement_kind', 'approx_single'),
              ('states', 'table', 'documents'),
              ('states', 'group_by', 'source'),
              ('states', 'aggregate', 'APPROX_COUNT_DISTINCT(doc_id)'),
              ('states', 'route', 'persisted_sketch_states (base table never read, A5)'),
              ('states', 'artifact', 'dd'),
              ('sample', 'statement_kind', 'approx_single'),
              ('sample', 'table', 'orders'),
              ('sample', 'aggregate', 'APPROX_SUM(o_totalprice)'),
              ('sample', 'route', 'persisted_sample (uniform, ratio=0.25)'),
              ('sample', 'artifact', 'us'),
              ('otf', 'statement_kind', 'approx_single'),
              ('otf', 'table', 'orders'),
              ('otf', 'aggregate', 'APPROX_SUM(o_totalprice, 0.5)'),
              ('otf', 'route', 'on_the_fly (scan the base table, build per statement)')
            ) AS t(stmt, property, value)
        """,
        "b35_setop_sql": """
            SELECT * FROM (VALUES
              ('union', TRUE, TRUE),
              ('intersect', TRUE, TRUE),
              ('except', TRUE, TRUE)
            ) AS t(op, within_bound, sketch_routed)
        """,
        "b36_union_rewrite": """
            SELECT * FROM (VALUES
              (0, TRUE, TRUE), (1, TRUE, TRUE), (2, TRUE, TRUE), (3, TRUE, TRUE)
            ) AS t(g, within_bound, rewrite_applied)
        """,
        "b37_grouped_setop": """
            SELECT * FROM (VALUES
              ('intersect', 'g0', TRUE, TRUE), ('intersect', 'g1', TRUE, TRUE),
              ('intersect', 'g2', TRUE, TRUE), ('intersect', 'g3', TRUE, TRUE),
              ('except', 'g0', TRUE, TRUE), ('except', 'g1', TRUE, TRUE),
              ('except', 'g2', TRUE, TRUE), ('except', 'g3', TRUE, TRUE)
            ) AS t(op, grp, within_bound, sketch_routed)
        """,
        "b38_setop_from_states": """
            SELECT * FROM (VALUES
              ('union', TRUE, TRUE),
              ('grouped_union', TRUE, TRUE),
              ('intersect', TRUE, TRUE),
              ('grouped_intersect', TRUE, TRUE),
              ('except', TRUE, TRUE),
              ('grouped_except', TRUE, TRUE)
            ) AS t(op, within_bound, states_routed)
        """,
        "b39_unionall_merge_states": """
            SELECT * FROM (VALUES
              ('percentile_global', TRUE, TRUE),
              ('percentile_grouped', TRUE, TRUE),
              ('topk_global', TRUE, TRUE)
            ) AS t(chk, within_bound, states_routed)
        """,
        "b40_unionall_sample_route": """
            SELECT * FROM (VALUES
              ('sum_global', TRUE, TRUE),
              ('count_grouped', TRUE, TRUE),
              ('sum_where_sides', TRUE, TRUE)
            ) AS t(chk, within_bound, sample_routed)
        """,
        "b41_moments_aggregates": """
            SELECT * FROM (VALUES
              ('variance_global', TRUE),
              ('stddev_grouped_from_sample', TRUE),
              ('sum_variance_multi_agg', TRUE)
            ) AS t(chk, within_bound)
        """,
        "b42_bivariate_aggregates": """
            SELECT * FROM (VALUES
              ('covar_global', TRUE),
              ('corr_grouped_from_sample', TRUE),
              ('corr_strong_expression', TRUE)
            ) AS t(chk, within_bound)
        """,
        "b43_accuracy_contracts": """
            SELECT * FROM (VALUES
              ('sum_contract', TRUE),
              ('avg_grouped_contract_99', TRUE),
              ('count_distinct_contract', TRUE),
              ('percentile_rank_contract', TRUE)
            ) AS t(chk, within_bound)
        """,
        "b44_contract_registry_pilot": """
            SELECT * FROM (VALUES
              ('multi_agg_contract', TRUE),
              ('base_free_contract_via_scramble', TRUE),
              ('base_free_grouped_contract', TRUE)
            ) AS t(chk, within_bound)
        """,
        "b49_grouped_join_size": """
            SELECT l_returnflag, TRUE AS within_bound
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "b50_top_sum_weighted": """
            SELECT l_returnflag, TRUE AS within_bound, TRUE AS hybrid_matches,
                   TRUE AS sql_matches
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "b51_zonemap_pruning": """
            SELECT l_returnflag, COUNT(*) AS n,
                   CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
                   TRUE AS pruned_some
            FROM lineitem WHERE l_orderkey BETWEEN 2000 AND 2500
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "c36_unigram_surprisal": r"""
            WITH w AS (
                SELECT doc_id, source,
                       unnest(list_filter(string_split_regex(text, '\s+'),
                                          x -> x <> '')) AS tok
                FROM documents
            ),
            cnt AS (SELECT tok, count(*) AS c FROM w GROUP BY tok),
            tot AS (SELECT count(*) AS n FROM w),
            per AS (
                SELECT w.doc_id, -avg(log2(cnt.c / tot.n)) AS s
                FROM w JOIN cnt USING (tok) CROSS JOIN tot
                GROUP BY w.doc_id
            ),
            gcnt AS (SELECT source, tok, count(*) AS c FROM w GROUP BY source, tok),
            gtot AS (SELECT source, count(*) AS n FROM w GROUP BY source),
            gper AS (
                SELECT w.doc_id, -avg(log2(gcnt.c / gtot.n)) AS s
                FROM w
                JOIN gcnt ON w.source = gcnt.source AND w.tok = gcnt.tok
                JOIN gtot ON w.source = gtot.source
                GROUP BY w.doc_id
            )
            SELECT d.doc_id, ROUND(per.s, 6) AS surprisal,
                   ROUND(gper.s, 6) AS surprisal_by_source,
                   TRUE AS cm_within_bound
            FROM documents d
            LEFT JOIN per USING (doc_id)
            LEFT JOIN gper USING (doc_id)
            ORDER BY doc_id
        """,
        "c37_hopping_window_stream": """
            WITH k AS (SELECT unnest([0, 1]) AS k),
            w AS (
                SELECT (epoch_us(ts) // 3600000000) - k.k AS window_hour
                FROM events CROSS JOIN k
            )
            SELECT CAST(window_hour AS BIGINT) AS window_hour,
                   COUNT(*) AS n_rows, TRUE AS within_rse
            FROM w GROUP BY window_hour ORDER BY window_hour
        """,
        # mirrors source_divergence's exact decomposition (shared-support
        # term sum + per-pair coverage remainders) with the same IEEE
        # expression shape, so only summation order differs (~1e-15 << 6 dp)
        "c38_source_divergence": r"""
            WITH occ AS (
              SELECT source AS g,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                                        x -> x <> '')) AS w
              FROM documents
              WHERE source IS NOT NULL
            ),
            cnt AS (SELECT g, w, count(*) AS c FROM occ GROUP BY g, w),
            tot AS (SELECT g, sum(c) AS n FROM cnt GROUP BY g),
            probs AS (
              SELECT cnt.g, cnt.w, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p
              FROM cnt JOIN tot ON cnt.g = tot.g
            ),
            pairs AS (
              SELECT a.g AS ga, b.g AS gb, a.p AS pa, b.p AS pb
              FROM probs a JOIN probs b ON a.w = b.w AND a.g < b.g
            ),
            com AS (
              SELECT ga, gb, count(*) AS n_common,
                     sum(pa) AS cov_a, sum(pb) AS cov_b,
                     sum(0.5 * pa * log2(2.0 * pa / (pa + pb))
                       + 0.5 * pb * log2(2.0 * pb / (pa + pb))) AS term_sum
              FROM pairs GROUP BY ga, gb
            )
            SELECT sa.g AS group_a, sb.g AS group_b,
                   COALESCE(com.n_common, 0) AS n_common,
                   round(greatest(0.0, least(1.0,
                       0.5 * (1.0 - COALESCE(com.cov_a, 0.0))
                     + 0.5 * (1.0 - COALESCE(com.cov_b, 0.0))
                     + COALESCE(com.term_sum, 0.0))), 6) AS js_divergence
            FROM tot sa JOIN tot sb ON sa.g < sb.g
            LEFT JOIN com ON com.ga = sa.g AND com.gb = sb.g
            ORDER BY group_a, group_b
        """,
        # mirrors tfidf_terms: occurrence tf per (source, term), corpus doc
        # frequency via per-doc list_distinct, score = tf * ln(N/df) ROUNDED
        # to 6 dp BEFORE ranking (so coincident scores tie identically and
        # the term-ASC tie-break decides in both engines)
        "c39_tfidf_terms": r"""
            WITH d AS (
              SELECT doc_id, source,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            n AS (SELECT count(*) AS n_docs FROM d),
            occ AS (SELECT source AS g, unnest(toks) AS w FROM d),
            tfc AS (SELECT g, w, count(*) AS tf FROM occ GROUP BY g, w),
            dfw AS (
              SELECT w, count(*) AS doc_freq FROM (
                SELECT doc_id, unnest(list_distinct(toks)) AS w FROM d
              ) GROUP BY w
            ),
            scored AS (
              SELECT g, tfc.w AS w, tf, doc_freq,
                     round(CAST(tf AS DOUBLE)
                           * ln(CAST(n_docs AS DOUBLE)
                                / CAST(doc_freq AS DOUBLE)), 6) AS tfidf
              FROM tfc JOIN dfw ON tfc.w = dfw.w CROSS JOIN n
            )
            SELECT g AS source, w AS term, tf, doc_freq, tfidf, rank FROM (
              SELECT *, row_number() OVER (
                         PARTITION BY g ORDER BY tfidf DESC, w ASC) AS rank
              FROM scored
            ) WHERE rank <= 8
            ORDER BY source, rank
        """,
        # mirrors zipf_fit: deterministic (count DESC, word ASC) ranking,
        # natural-log axes, closed-form OLS sums with the same IEEE shape;
        # single-term groups NULL out via the vx > 0 guard in both engines
        "c40_zipf_fit": r"""
            WITH occ AS (
              SELECT source AS g,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                                        x -> x <> '')) AS w
              FROM documents
              WHERE source IS NOT NULL
            ),
            cnt AS (SELECT g, w, count(*) AS c FROM occ GROUP BY g, w),
            xy AS (
              SELECT g, c,
                     ln(CAST(row_number() OVER (
                         PARTITION BY g ORDER BY c DESC, w ASC) AS DOUBLE)) AS x,
                     ln(CAST(c AS DOUBLE)) AS y
              FROM cnt
            ),
            s AS (
              SELECT g, count(*) AS n_terms, CAST(sum(c) AS BIGINT) AS n_tokens,
                     sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
              FROM xy GROUP BY g
            ),
            v AS (
              SELECT g, n_terms, n_tokens, sx, sy,
                     CAST(n_terms AS DOUBLE) AS nd,
                     CAST(n_terms AS DOUBLE) * sxx - sx * sx AS vx,
                     CAST(n_terms AS DOUBLE) * syy - sy * sy AS vy,
                     CAST(n_terms AS DOUBLE) * sxy - sx * sy AS cov
              FROM s
            )
            SELECT g AS source, n_terms, n_tokens,
                   round(CASE WHEN vx > 0 THEN cov / vx END, 6) AS slope,
                   round(CASE WHEN vx > 0
                              THEN (sy - (cov / vx) * sx) / nd END, 6) AS intercept,
                   round(CASE WHEN vx > 0 AND vy > 0
                              THEN (cov * cov) / (vx * vy) END, 6) AS r2
            FROM v ORDER BY source
        """,
        # mirrors centroid_similarity: per-(label, dim) f64 means, pairwise
        # dot via a dimension-keyed self-join, norms per label, identical
        # IEEE cosine expression; labels compared as strings in both engines
        "c41_centroid_similarity": """
            WITH base AS (
              SELECT CAST(label AS VARCHAR) AS g, embedding AS v
              FROM embeddings
              WHERE label IS NOT NULL AND embedding IS NOT NULL
            ),
            e AS (
              SELECT g, generate_subscripts(v, 1) AS pos,
                     CAST(unnest(v) AS DOUBLE) AS val
              FROM base
            ),
            cent AS (SELECT g, pos, avg(val) AS m FROM e GROUP BY g, pos),
            dots AS (
              SELECT a.g AS ga, b.g AS gb, count(*) AS dim,
                     sum(a.m * b.m) AS dot
              FROM cent a JOIN cent b ON a.pos = b.pos AND a.g < b.g
              GROUP BY a.g, b.g
            ),
            norms AS (SELECT g, sum(m * m) AS nn FROM cent GROUP BY g)
            SELECT ga AS group_a, gb AS group_b, dim,
                   round(dot / (sqrt(na.nn) * sqrt(nb.nn)), 6) AS cosine
            FROM dots
            JOIN norms na ON na.g = dots.ga
            JOIN norms nb ON nb.g = dots.gb
            ORDER BY group_a, group_b
        """,
        # mirrors pmi_collocations: adjacent bigrams, min_count floor,
        # identical PMI expression rounded to 6 dp BEFORE the top-k so
        # boundary ties resolve by (w1, w2) identically in both engines
        "c42_pmi_collocations": r"""
            WITH w AS (
              SELECT list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            p AS (
              SELECT toks, unnest(range(1, len(toks))) AS i
              FROM w WHERE len(toks) >= 2
            ),
            big AS (
              SELECT toks[i] AS w1, toks[i + 1] AS w2, count(*) AS pair_count
              FROM p GROUP BY 1, 2
            ),
            uc AS (
              SELECT wd, count(*) AS c
              FROM (SELECT unnest(toks) AS wd FROM w) GROUP BY wd
            ),
            nb AS (SELECT sum(pair_count) AS n_big FROM big),
            nu AS (SELECT sum(c) AS n_uni FROM uc),
            scored AS (
              SELECT b.w1, b.w2, b.pair_count,
                     ua.c AS count_a, ub.c AS count_b,
                     round(log2(
                       (CAST(b.pair_count AS DOUBLE) / CAST(n_big AS DOUBLE))
                       / ((CAST(ua.c AS DOUBLE) / CAST(n_uni AS DOUBLE))
                          * (CAST(ub.c AS DOUBLE) / CAST(n_uni AS DOUBLE)))
                     ), 6) AS pmi
              FROM big b
              JOIN uc ua ON ua.wd = b.w1
              JOIN uc ub ON ub.wd = b.w2
              CROSS JOIN nb CROSS JOIN nu
              WHERE b.pair_count >= 5
            )
            SELECT * FROM scored
            ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20
        """,
        # mirrors histogram_df: GLOBAL min/max edges, identical closed-form
        # f64 bin assignment (bins match exactly -> counts exact), zero-fill
        # shell, rounded edge-reporting columns only
        "c44_embedding_spectrum": """
            SELECT CAST(label AS VARCHAR) AS label, c.component,
                   TRUE AS within_bracket
            FROM (SELECT DISTINCT label FROM embeddings),
                 (SELECT unnest([0, 1, 2]) AS component) c
        """,
        "c52_streaming_scramble": """
            SELECT p AS property, TRUE AS ok FROM (
                SELECT unnest(['conflicting_contract_refused',
                               'replay_idempotent',
                               'row_identical_to_static_draw',
                               'sum_within_ci']) AS p
            ) ORDER BY property
        """,
        "c51_corpus_drift": """
            SELECT CAST(source AS VARCHAR) AS source,
                   TRUE AS metrics_present,
                   TRUE AS mass_exact,
                   TRUE AS distinct_within,
                   TRUE AS jaccard_within,
                   TRUE AS identity_zero_drift
            FROM (SELECT DISTINCT source FROM documents)
        """,
        "c50_fuzzy_contamination": """
            SELECT CAST(20 AS BIGINT) AS n_planted,
                   TRUE AS all_found_fuzzy,
                   TRUE AS none_found_exact
        """,
        "c48_percentile_normalize": """
            SELECT doc_id,
                   CAST(source AS VARCHAR) AS source,
                   ROUND(CUME_DIST() OVER (PARTITION BY source ORDER BY n_chars), 6)
                     AS pct_rank
            FROM documents
        """,
        "c49_percentile_gate_kll": """
            SELECT CAST(source AS VARCHAR) AS source,
                   TRUE AS within_bound,
                   TRUE AS scoring_plan_shuffle_free
            FROM (SELECT DISTINCT source FROM documents)
        """,
        "c47_temperature_mixture": """
            WITH s AS (
              SELECT CAST(source AS VARCHAR) AS source,
                     CAST(SUM(n_chars) AS BIGINT) AS n
              FROM documents GROUP BY source
            ),
            tot AS (
              SELECT CAST(SUM(n) AS DOUBLE) AS grand,
                     SUM(POWER(CAST(n AS DOUBLE), 0.7)) AS psum,
                     2 * SUM(n) AS budget
              FROM s
            )
            SELECT source,
                   n AS available_tokens,
                   ROUND(CAST(n AS DOUBLE) / grand, 6) AS natural_share,
                   ROUND(POWER(CAST(n AS DOUBLE), 0.7) / psum, 6) AS weight,
                   ROUND(POWER(CAST(n AS DOUBLE), 0.7) / psum * budget, 2)
                     AS target_tokens,
                   ROUND(POWER(CAST(n AS DOUBLE), 0.7) / psum * budget
                         / CAST(n AS DOUBLE), 6) AS epochs
            FROM s, tot
        """,
        "c46_freq_drift": """
            SELECT CAST(source AS VARCHAR) AS source,
                   TRUE AS within_bound,
                   TRUE AS top_change_recovered
            FROM (SELECT DISTINCT source FROM documents)
        """,
        "c45_embedding_drift": """
            SELECT CAST(label AS VARCHAR) AS label,
                   TRUE AS identity_no_drift,
                   TRUE AS scaled_eig_x4,
                   TRUE AS rotation_eig_invariant
            FROM (SELECT DISTINCT label FROM embeddings)
        """,
        "c43_histogram": """
            WITH mm AS (
              SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
                     CAST(max(n_chars) AS DOUBLE) AS hi
              FROM documents
            ),
            prm AS (SELECT lo, hi, (hi - lo) / 16 AS w FROM mm),
            base AS (
              SELECT CAST(source AS VARCHAR) AS g, CAST(n_chars AS DOUBLE) AS x
              FROM documents
              WHERE source IS NOT NULL AND n_chars IS NOT NULL
            ),
            counted AS (
              SELECT g, least(15, CAST(floor((x - lo) / w) AS BIGINT)) AS bin,
                     count(*) AS cnt
              FROM base CROSS JOIN prm
              WHERE x >= lo AND x <= hi
              GROUP BY 1, 2
            ),
            shell AS (
              SELECT g, bin
              FROM (SELECT DISTINCT g FROM base)
              CROSS JOIN (SELECT unnest(range(0, 16)) AS bin)
            )
            SELECT shell.g AS "group", CAST(shell.bin AS BIGINT) AS bin,
                   round(lo + shell.bin * w, 6) AS lo_edge,
                   round(lo + (shell.bin + 1) * w, 6) AS hi_edge,
                   COALESCE(cnt, 0) AS cnt
            FROM shell CROSS JOIN prm
            LEFT JOIN counted ON counted.g = shell.g AND counted.bin = shell.bin
            ORDER BY "group", bin
        """,
        "b48_join_rows_sql": """
            SELECT * FROM (VALUES
              ('explain_names_states_route', TRUE),
              ('fly_bound_is_eps_na_nb', TRUE),
              ('fly_never_undercounts', TRUE),
              ('fly_within_bound', TRUE),
              ('states_base_free', TRUE),
              ('states_never_undercounts', TRUE),
              ('states_within_bound', TRUE)
            ) AS t(chk, within_bound)
        """,
        "b47_join_size": """
            SELECT * FROM (VALUES
              ('disjoint_within_bound', TRUE),
              ('lineitem_x_orders_never_undercounts', TRUE),
              ('lineitem_x_orders_within_bound', TRUE),
              ('orders_x_customer_never_undercounts', TRUE),
              ('orders_x_customer_within_bound', TRUE)
            ) AS t(chk, within_bound)
        """,
        "b46_plugin_sketch": """
            SELECT source,
                   CAST(max(n_chars) - min(n_chars) AS DOUBLE) AS char_range,
                   0.0 AS range_err
            FROM documents
            GROUP BY source
            ORDER BY source
        """,
        "b45_subsample_error": """
            SELECT * FROM (VALUES
              ('estimates_match_closed_form', TRUE),
              ('within_ci_grouped', TRUE),
              ('corr_within_ci', TRUE),
              ('count_distinct_universe_ci', TRUE),
              ('percentile_value_ci', TRUE),
              ('base_free_route_explained', TRUE),
              ('refusal_explain_parity', TRUE)
            ) AS t(chk, within_bound)
        """,
        "b27_auto_routed_sql": """
            SELECT 'route_states' AS check, TRUE AS ok
            UNION ALL SELECT 'states_within_bound', TRUE
            UNION ALL SELECT 'route_universe', TRUE
            UNION ALL SELECT 'universe_within_ci', TRUE
            UNION ALL SELECT 'route_stratified', TRUE
            UNION ALL SELECT 'stratified_within_ci', TRUE
            UNION ALL SELECT 'multi_agg_routed', TRUE
        """,
        "b28_exact_passthrough": """
            SELECT source, lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY source, lang
        """,
        "b29_incremental_refresh": """
            SELECT 'refresh_saw_new_files' AS check, TRUE AS ok
            UNION ALL SELECT 'refresh_equals_rebuild', TRUE
            UNION ALL SELECT 'refreshed_estimate_within_bound', TRUE
        """,
        "c13_sequence_packing": """
            SELECT 'packs_within_budget' AS check, TRUE AS ok
            UNION ALL SELECT 'exactly_once', TRUE
            UNION ALL SELECT 'offsets_tile', TRUE
            UNION ALL SELECT 'fill_at_least_090', TRUE
        """,
        "c14_contamination": """
            SELECT 'seeded_docs_flagged' AS check, TRUE AS ok
            UNION ALL SELECT 'clean_eval_no_hits', TRUE
        """,
        "c15_mixture_sample": """
            SELECT 'uncapped_within_clt' AS check, TRUE AS ok
            UNION ALL SELECT 'unlisted_sources_excluded', TRUE
            UNION ALL SELECT 'over_inventory_capped_flagged', TRUE
        """,
        "c18_dedup_delta": """
            SELECT 'corpus_copies_dropped' AS check, TRUE AS ok
            UNION ALL SELECT 'delta_internal_twin_dropped', TRUE
            UNION ALL SELECT 'kept_subset_of_fresh', TRUE
            UNION ALL SELECT 'sig_append_closes_loop', TRUE
        """,
        "c17_contamination_spans": """
            SELECT 'seed_span_exactly_40' AS check, TRUE AS ok
            UNION ALL SELECT 'clean_eval_no_hits', TRUE
        """,

        "c20_chunking": r"""
            WITH per AS (
                SELECT source, doc_id,
                       len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n
                FROM documents
            ), c AS (
                SELECT source, doc_id, n,
                       CASE WHEN n <= 64 THEN 1
                            ELSE CAST(ceil((n - 64) / 56.0) AS INT) + 1 END AS k
                FROM per
            )
            SELECT source,
                   count(DISTINCT doc_id) AS n_docs,
                   CAST(sum(k) AS BIGINT) AS n_chunks,
                   CAST(sum(n + (k - 1) * 8) AS BIGINT) AS sum_chunk_tokens,
                   CAST(max(CASE WHEN n <= 64 THEN n ELSE 64 END) AS INT) AS max_chunk_tokens
            FROM c GROUP BY source ORDER BY source
        """,
        "c21_quality_gates": r"""
            WITH per AS (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
                FROM documents
            ), m AS (
                SELECT doc_id, len(l) AS n, len(list_distinct(l)) AS d FROM per
            )
            SELECT gate, n FROM (
                SELECT '__kept__' AS gate,
                       CAST(sum(CASE WHEN n >= 5 AND n <= 400
                                      AND (n - d) / CAST(n AS DOUBLE) <= 0.5
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n
                FROM m
                UNION ALL
                SELECT 'dup_frac',
                       CAST(sum(CASE WHEN (n - d) / CAST(n AS DOUBLE) <= 0.5
                                 THEN 0 ELSE 1 END) AS BIGINT) FROM m
                UNION ALL
                SELECT 'max_tokens',
                       CAST(sum(CASE WHEN n <= 400 THEN 0 ELSE 1 END) AS BIGINT) FROM m
                UNION ALL
                SELECT 'min_tokens',
                       CAST(sum(CASE WHEN n >= 5 THEN 0 ELSE 1 END) AS BIGINT) FROM m
            ) ORDER BY gate
        """,
        # identical md5 coin + per-copy unnest; remainder bounds 2^58/2^59
        # are binary-exact so both engines compare the same integers
        "c31_upsample_mixture": """
            WITH k AS (
                SELECT doc_id, source,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':3'), 1, 15))
                            AS BIGINT) AS key,
                       CAST(substr(source, 4) AS INTEGER) % 3 AS grp
                FROM documents
            ), n AS (
                SELECT doc_id, source,
                       CASE grp
                         WHEN 0 THEN 2 + CASE WHEN key < 288230376151711744 THEN 1 ELSE 0 END
                         WHEN 1 THEN 1
                         ELSE CASE WHEN key < 576460752303423488 THEN 1 ELSE 0 END
                       END AS n_copies
                FROM k
            )
            SELECT doc_id, source, CAST(unnest(range(n_copies)) AS INTEGER) AS copy
            FROM n WHERE n_copies > 0 ORDER BY doc_id, copy
        """,
        # the naive per-group top-cap window the split operator must equal
        # exactly; doc_id tie-break resolves duplicate n_chars identically
        "c35_weighted_sample": """
            WITH p AS (
                SELECT doc_id, source,
                       ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 15))
                                AS BIGINT) + 0.5) / 1152921504606846976.0)
                         / n_chars AS pri
                FROM documents
                WHERE n_chars IS NOT NULL AND n_chars > 0 AND doc_id IS NOT NULL
            )
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY pri DESC, doc_id) AS rn
                FROM p
            ) WHERE rn <= 40
            ORDER BY source, doc_id
        """,
        "c34_source_overlap": r"""
            WITH d AS (
              SELECT DISTINCT source AS g, w FROM (
                SELECT source,
                       unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
                FROM documents
              )
            ),
            s AS (SELECT g, count(*) AS n FROM d GROUP BY g),
            com AS (
              SELECT a.g AS ga, b.g AS gb, count(*) AS n_common
              FROM d a JOIN d b ON a.w = b.w AND a.g < b.g
              GROUP BY a.g, b.g
            )
            SELECT sa.g AS group_a, sb.g AS group_b,
                   sa.n AS n_a, sb.n AS n_b,
                   COALESCE(com.n_common, 0) AS n_common,
                   CAST(COALESCE(com.n_common, 0) AS DOUBLE)
                     / CAST(sa.n + sb.n - COALESCE(com.n_common, 0) AS DOUBLE) AS jaccard
            FROM s sa JOIN s sb ON sa.g < sb.g
            LEFT JOIN com ON com.ga = sa.g AND com.gb = sb.g
            ORDER BY group_a, group_b
        """,
        "c33_top_ngrams": r"""
            WITH w AS (
              SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
              FROM documents
            ),
            p AS (
              SELECT toks, unnest(range(1, len(toks) - 1)) AS i
              FROM w WHERE len(toks) >= 3
            ),
            occ AS (
              SELECT array_to_string(toks[i:i+2], ' ') AS ngram FROM p
            )
            SELECT ngram, COUNT(*) AS cnt
            FROM occ GROUP BY ngram
            ORDER BY cnt DESC, ngram ASC
            LIMIT 20
        """,
        "c32_cap_per_group": """
            SELECT doc_id, lang, source, n_chars FROM (
                SELECT doc_id, lang, source, n_chars,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY n_chars DESC, doc_id
                       ) AS rn
                FROM documents
            ) WHERE rn <= 72 ORDER BY doc_id
        """,
        # the naive one-task-per-source window the distributed operator
        # must equal exactly: maximal per-source prefix in (score DESC, id)
        # order with cumulative n_tok within budget
        "c30_budget_selection": """
            WITH scored AS (
                SELECT doc_id, source,
                       (n_chars % 37) + (doc_id % 7) / 10.0 AS score,
                       CAST(n_chars % 97 + 5 AS BIGINT) AS n_tok
                FROM documents
            ), c AS (
                SELECT *, sum(n_tok) OVER (
                    PARTITION BY source ORDER BY score DESC, doc_id
                ) AS cum
                FROM scored
            )
            SELECT doc_id, source, score, n_tok FROM c
            WHERE cum <= 800 ORDER BY doc_id
        """,
        # same span algebra as c27, then relational interval-union per cut
        # doc (sort + running-max gaps-and-islands) — an independent
        # formulation of the exists-over-intervals arithmetic Spark runs
        "c29_cut_accounting": r"""
            WITH aug AS (
                SELECT doc_id,
                       text || CASE WHEN doc_id % 40 = 1
                                    THEN ' zdup' || CAST(doc_id % 3 AS VARCHAR)
                                         || ' """ + _C27_PHRASE + r"""'
                                    ELSE '' END AS text
                FROM documents
            ), tok AS (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
                FROM aug
            ), p AS (
                SELECT doc_id, l, unnest(range(1, len(l) - 6)) AS pos1
                FROM tok WHERE len(l) >= 8
            ), sh AS (
                SELECT doc_id, CAST(pos1 - 1 AS INTEGER) AS pos,
                       array_to_string(l[pos1:pos1+7], chr(31)) AS g
                FROM p
            ), f AS (
                SELECT g FROM sh GROUP BY g HAVING count(*) BETWEEN 2 AND 5000
            ), sd AS (
                SELECT sh.doc_id, sh.pos, sh.g FROM sh JOIN f ON sh.g = f.g
            ), m AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.pos AS apos, b.pos AS bpos, a.g
                FROM sd a JOIN sd b ON a.g = b.g AND a.doc_id < b.doc_id
            ), i AS (
                SELECT *, apos - bpos AS diag,
                       apos - CAST(row_number() OVER (
                           PARTITION BY id_a, id_b, apos - bpos ORDER BY apos
                       ) AS INTEGER) AS isl
                FROM m
            ), r AS (
                SELECT id_a, id_b, diag,
                       CAST(count(*) OVER w AS BIGINT) AS run,
                       min(apos) OVER w AS a0
                FROM i WINDOW w AS (PARTITION BY id_a, id_b, diag, isl)
            ), agg AS (
                SELECT id_a, id_b,
                       max(struct_pack(run := run, na := -a0, nb := -(a0 - diag))) AS best
                FROM r GROUP BY id_a, id_b
            ), iv AS (
                SELECT id_b AS doc_id,
                       CAST(-best.nb AS INTEGER) AS s,
                       CAST(-best.nb + best.run + 7 AS INTEGER) AS e
                FROM agg WHERE best.run + 7 >= 24
            ), m1 AS (
                SELECT doc_id, s, e,
                       max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
                FROM iv
            ), m2 AS (
                SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS brk
                FROM m1
            ), m3 AS (
                SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
                FROM m2
            ), per_island AS (
                SELECT doc_id, grp, max(e) - min(s) AS cut
                FROM m3 GROUP BY doc_id, grp
            )
            SELECT doc_id, CAST(sum(cut) AS BIGINT) AS n_cut_tokens
            FROM per_island GROUP BY doc_id ORDER BY doc_id
        """,
        "c28_cut_spans": """
            SELECT 'cut_accounting_consistent' AS check, TRUE AS ok
            UNION ALL SELECT 'flagged_pairs_nonzero', TRUE
            UNION ALL SELECT 'keepers_retain_block', TRUE
            UNION ALL SELECT 'non_flagged_docs_untouched', TRUE
            UNION ALL SELECT 'post_cut_no_spans', TRUE
        """,
        # n-gram STRINGS stand in for Spark's xxhash64 shingles — equality of
        # 8-token tuples is identical, so a value match also witnesses that
        # hashing introduced no spurious/lost matches at this scale
        "c27_duplicate_spans": r"""
            WITH aug AS (
                SELECT doc_id,
                       text || CASE WHEN doc_id % 40 = 1
                                    THEN ' zdup' || CAST(doc_id % 3 AS VARCHAR)
                                         || ' """ + _C27_PHRASE + r"""'
                                    ELSE '' END AS text
                FROM documents
            ), tok AS (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
                FROM aug
            ), p AS (
                SELECT doc_id, l, unnest(range(1, len(l) - 6)) AS pos1
                FROM tok WHERE len(l) >= 8
            ), sh AS (
                SELECT doc_id, CAST(pos1 - 1 AS INTEGER) AS pos,
                       array_to_string(l[pos1:pos1+7], chr(31)) AS g
                FROM p
            ), f AS (
                SELECT g FROM sh GROUP BY g HAVING count(*) BETWEEN 2 AND 5000
            ), sd AS (
                SELECT sh.doc_id, sh.pos, sh.g FROM sh JOIN f ON sh.g = f.g
            ), m AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.pos AS apos, b.pos AS bpos, a.g
                FROM sd a JOIN sd b ON a.g = b.g AND a.doc_id < b.doc_id
            ), i AS (
                SELECT *, apos - bpos AS diag,
                       apos - CAST(row_number() OVER (
                           PARTITION BY id_a, id_b, apos - bpos ORDER BY apos
                       ) AS INTEGER) AS isl
                FROM m
            ), r AS (
                SELECT id_a, id_b, g, diag,
                       CAST(count(*) OVER w AS BIGINT) AS run,
                       min(apos) OVER w AS a0
                FROM i WINDOW w AS (PARTITION BY id_a, id_b, diag, isl)
            ), agg AS (
                SELECT id_a, id_b,
                       CAST(count(DISTINCT g) AS BIGINT) AS n_shared,
                       max(struct_pack(run := run, na := -a0, nb := -(a0 - diag))) AS best
                FROM r GROUP BY id_a, id_b
            )
            SELECT id_a, id_b, n_shared,
                   best.run AS max_run_ngrams,
                   CAST(best.run + 7 AS BIGINT) AS max_span_tokens,
                   CAST(-best.na AS INTEGER) AS a_start,
                   CAST(-best.nb AS INTEGER) AS b_start
            FROM agg
            WHERE best.run + 7 >= 24
            ORDER BY id_a, id_b
        """,
        # boundaries below are int(round(cum_weight * 2^60)) — the exact
        # integers split_dataset compiles into its CASE chain
        "c26_split_dataset": f"""
            WITH k AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':11'), 1, 15))
                            AS BIGINT) AS key
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN key < {int(round(0.8 * (1 << 60)))} THEN 'train'
                        WHEN key < {int(round(0.9 * (1 << 60)))} THEN 'val'
                        ELSE 'test' END AS split
            FROM k
            ORDER BY doc_id
        """,
        "c25_shuffle_shard": """
            WITH k AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 15))
                            AS BIGINT) AS shuffle_key
                FROM documents
            )
            SELECT doc_id, shuffle_key,
                   CAST(shuffle_key % 16 AS INTEGER) AS shard
            FROM k
            ORDER BY shard, shuffle_key, doc_id
        """,
        "c24_line_dedup": r"""
            WITH aug AS (
                SELECT doc_id,
                       text || chr(10) || 'Subscribe to our newsletter'
                            || chr(10) || 'All rights reserved ' || CAST(doc_id % 7 AS VARCHAR)
                            || chr(10) || 'pair ' || CAST(doc_id % 250 AS VARCHAR)
                            || chr(10) || 'doc marker ' || CAST(doc_id AS VARCHAR) AS text
                FROM documents
            ), l AS (
                SELECT doc_id, string_split(text, chr(10)) AS lines FROM aug
            ), e AS (
                SELECT doc_id, unnest(lines) AS line,
                       unnest(range(1, len(lines)+1)) AS pos
                FROM l
            ), h AS (
                -- '' exempt: blank lines are paragraph separators, not
                -- boilerplate (mirrors dedup_lines)
                SELECT line FROM e WHERE line <> ''
                GROUP BY line HAVING count(*) >= 3
            )
            SELECT e.doc_id,
                   coalesce(string_agg(CASE WHEN h.line IS NULL THEN e.line END,
                                       chr(10) ORDER BY e.pos), '') AS text_clean,
                   CAST(sum(CASE WHEN h.line IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   CAST(sum(CASE WHEN h.line IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
            FROM e LEFT JOIN h ON e.line = h.line
            GROUP BY e.doc_id
            ORDER BY e.doc_id
        """,
        "c23_pii_redaction": r"""
            WITH aug AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@mail.example.com or 10.'
                            || CAST(doc_id % 200 AS VARCHAR) || '.0.'
                            || CAST(doc_id % 250 AS VARCHAR)
                            || CASE WHEN doc_id % 3 = 0
                                    THEN ' ssn 123-45-6789 call 415-555-0142'
                                    ELSE '' END AS text
                FROM documents
            ), s1 AS (
                SELECT doc_id,
                  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS pii_email,
                  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
                FROM aug
            ), s2 AS (
                SELECT doc_id, pii_email,
                  len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS pii_ipv4,
                  regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
                FROM s1
            ), s3 AS (
                SELECT doc_id, pii_email, pii_ipv4,
                  len(regexp_extract_all(t2, '\b\d{3}-\d{2}-\d{4}\b')) AS pii_ssn,
                  regexp_replace(t2, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t3
                FROM s2
            ), s4 AS (
                SELECT doc_id, pii_email, pii_ipv4, pii_ssn,
                  len(regexp_extract_all(t3, '\+?\b\d{2,3}[ -]\d{3}[ -]\d{4}\b')) AS pii_phone,
                  regexp_replace(t3, '\+?\b\d{2,3}[ -]\d{3}[ -]\d{4}\b', '<PHONE>', 'g') AS t4
                FROM s3
            )
            SELECT pattern, n_matches, n_docs FROM (
                SELECT 'email' AS pattern,
                       CAST(sum(pii_email) AS BIGINT) AS n_matches,
                       CAST(sum(CASE WHEN pii_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
                FROM s4
                UNION ALL
                SELECT 'ipv4', CAST(sum(pii_ipv4) AS BIGINT),
                       CAST(sum(CASE WHEN pii_ipv4 > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM s4
                UNION ALL
                SELECT 'ssn', CAST(sum(pii_ssn) AS BIGINT),
                       CAST(sum(CASE WHEN pii_ssn > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM s4
                UNION ALL
                SELECT 'phone', CAST(sum(pii_phone) AS BIGINT),
                       CAST(sum(CASE WHEN pii_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM s4
                UNION ALL
                SELECT '__redacted__', CAST(sum(len(t4)) AS BIGINT), 0 FROM s4
            ) ORDER BY pattern
        """,
        "c22_streaming_signatures": """
            SELECT 'streamed_equals_batch_signing' AS check, TRUE AS ok
            UNION ALL SELECT 'replay_overwrites_not_duplicates', TRUE
            UNION ALL SELECT 'conflicting_contract_refused', TRUE
            UNION ALL SELECT 'delta_dedup_against_stream_table', TRUE
        """,
        "c19_signature_catalog": """
            SELECT 'ddl_bootstrap_registers_contract' AS check, TRUE AS ok
            UNION ALL SELECT 'refresh_signs_only_appends', TRUE
            UNION ALL SELECT 'catalog_delta_drops_corpus_copies', TRUE
            UNION ALL SELECT 'conflicting_seed_refused', TRUE
            UNION ALL SELECT 'append_via_catalog_closes_loop', TRUE
        """,
        "c16_repetition_stats": r"""
            WITH w AS (
                SELECT source, doc_id,
                       list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
                FROM documents
            ), per AS (
                SELECT source, doc_id, len(l) AS n, len(list_distinct(l)) AS d,
                       CASE WHEN len(l) >= 2 THEN len(l) - 1 ELSE 0 END AS nsh,
                       CASE WHEN len(l) >= 2 THEN len(list_distinct(
                           list_transform(range(1, len(l)), i -> l[i] || chr(31) || l[i+1])
                       )) ELSE 0 END AS dsh
                FROM w
            ), top AS (
                SELECT source, doc_id, max(c) AS topc FROM (
                    SELECT source, doc_id, t, count(*) AS c
                    FROM (SELECT source, doc_id, unnest(l) AS t FROM w)
                    GROUP BY source, doc_id, t
                ) GROUP BY source, doc_id
            )
            SELECT per.source,
                   CAST(sum(per.n - per.d) AS BIGINT) AS dup_token_occurrences,
                   CAST(sum(per.n) AS BIGINT) AS total_tokens,
                   CAST(sum(coalesce(top.topc, 0)) AS BIGINT) AS top_token_occurrences,
                   CAST(sum(CASE WHEN per.nsh > 0
                                  AND (per.nsh - per.dsh) / CAST(per.nsh AS DOUBLE) > 0.1
                            THEN 1 ELSE 0 END) AS BIGINT) AS repetitive_docs
            FROM per LEFT JOIN top ON per.source = top.source AND per.doc_id = top.doc_id
            GROUP BY per.source ORDER BY per.source
        """,
        "b16_catalog_sql": "SELECT source, TRUE AS within_bound FROM documents GROUP BY source",
        "b17_intersection_estimate": """
            SELECT a.source AS group_a, b.source AS group_b, TRUE AS within_bound
            FROM (SELECT DISTINCT source FROM documents ORDER BY source LIMIT 6) a
            JOIN (SELECT DISTINCT source FROM documents ORDER BY source LIMIT 6) b
              ON a.source < b.source
        """,
        "b18_ivf_self_recovery": """
            SELECT vec_id AS query_id, TRUE AS found_self
            FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 3)
        """,
        "b19_bloom_file_pruning": "SELECT TRUE AS no_false_negatives",
        "b20_multimodal_plumbing": "SELECT TRUE AS deterministic, TRUE AS bounded",
        "b21_checkpoint_resume": "SELECT TRUE AS clean_matches, TRUE AS resume_matches",
        "b22_streamed_states_match_batch": "SELECT TRUE AS states_match_batch",
        "b23_distributed_estimates_highcard": """
            SELECT CAST(l_orderkey AS VARCHAR) AS grp, TRUE AS within_bound
            FROM lineitem GROUP BY l_orderkey
        """,
        "b24_multicol_group_by": """
            SELECT source, lang, TRUE AS within_bound
            FROM documents GROUP BY source, lang
        """,
        "b25_stratified_avg_sql": "SELECT source, TRUE AS within_bound FROM documents GROUP BY source",
        "c11_sessionize": """
            WITH o AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 2 HOUR THEN 1 ELSE 0 END AS brk
                FROM events
            ),
            s AS (
                SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM o
            ),
            g AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY 1, 2),
            closed AS (
                SELECT * FROM g
                WHERE sid < (SELECT max(sid) FROM g g2 WHERE g2.user_id = g.user_id)
            )
            SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(coalesce(sum(n), 0) AS BIGINT) AS total_events
            FROM closed
        """,
        "b10_partition_invariance": "SELECT source, TRUE AS states_identical FROM documents GROUP BY source",
        "b11_hybrid_topk": "SELECT source, TRUE AS hybrid_matches_exact FROM documents GROUP BY source",
        "b06_bloom_membership": """
            SELECT event_type, CAST(0 AS BIGINT) AS false_negatives
            FROM events GROUP BY event_type
        """,
        "b07_minhash_jaccard": """
            SELECT a.source AS group_a, b.source AS group_b, TRUE AS within_bound
            FROM (SELECT DISTINCT source FROM documents) a,
                 (SELECT DISTINCT source FROM documents) b
            WHERE a.source < b.source
        """,
        "c01_exact_dedup": """
            SELECT source, count(*) AS kept_docs
            FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
            GROUP BY source
        """,
        "c02_token_stats": r"""
            SELECT source, count(*) AS n_docs,
                   CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS total_tokens,
                   min(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS min_tokens,
                   max(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS max_tokens
            FROM documents GROUP BY source
        """,
        "c03_minhash_lsh_dedup": "SELECT source, CAST(0 AS BIGINT) AS injected_survivors FROM documents GROUP BY source",
        "c04_simhash_dups": "SELECT count(*) AS n_recovered FROM documents",
        "c05_ann_top1": """
            SELECT a.vec_id AS query_id,
                   arg_max(b.vec_id, list_cosine_similarity(a.embedding, b.embedding)) AS neighbor_id
            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 5) a
            JOIN embeddings b ON a.vec_id <> b.vec_id
            GROUP BY a.vec_id
        """,
        "c06_embedding_near_dup": """
            SELECT count(*) AS n_recovered, CAST(0 AS BIGINT) AS n_other FROM embeddings
        """,
        "c07_srp_batch_self_recovery": """
            SELECT vec_id AS query_id, TRUE AS found_self
            FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5)
            ORDER BY query_id
        """,
        "c12_ann_from_persisted_index": """
            SELECT vec_id AS query_id, TRUE AS found_self
            FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5)
            ORDER BY query_id
        """,
        "c08_asof_join": """
            SELECT e.event_type, count(*) AS n_events,
                   CAST(sum(CASE WHEN s.c IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_matched,
                   CAST(sum(coalesce(s.c, 0)) AS BIGINT) AS sum_signup_cents
            FROM events e
            ASOF LEFT JOIN (
                SELECT user_id, ts, CAST(round(value*100, 0) AS BIGINT) AS c
                FROM events WHERE event_type = 'signup'
            ) s ON e.user_id = s.user_id AND e.ts >= s.ts
            GROUP BY e.event_type
        """,
        "c09_winnow_containment": r"""
            SELECT CAST(count(*) AS BIGINT) AS n_detected FROM documents
            WHERE len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) >= 5
        """,
        "c10_ngram_minhash_dedup": "SELECT source, CAST(0 AS BIGINT) AS injected_survivors FROM documents GROUP BY source",
    }
