"""Phase-level instrumentation for the headline queries (guide §1: measure
first). NOT part of the frozen bench contract — bench.py is the driver's
metric; this file exists to attribute each headline query's wall time to its
internal phases (sketch build+probe, exact verification pass, driver-side
merge/createDataFrame) so optimizations target the real cost.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from __spark_entry__ import _cents, _hll_tol, _t
from sketchlib.spark import SketchSpec, build_sketches, estimates_df, quantiles_df, topk_df
from sketchlib.spark.session import get_spark
from sketchlib.spark.tokenize import with_tokens


class T:
    def __init__(self):
        self.marks = []
        self.t0 = time.perf_counter()

    def mark(self, name):
        t = time.perf_counter()
        self.marks.append((name, round(t - self.t0, 3)))
        self.t0 = t

    def report(self, label):
        total = sum(s for _, s in self.marks)
        print(f"--- {label}: total {total:.3f}s")
        for n, s in self.marks:
            print(f"    {n:<40} {s:.3f}")


def phase_b01(spark, sf_dir):
    t = T()
    docs = _t(spark, sf_dir, "documents")
    states = build_sketches(docs, [SketchSpec("hll_doc", "hll", "doc_id", {"p": 14})], group_by="source")
    t.mark("lazy build graph")
    est = estimates_df(spark, states, "hll_doc").toPandas()
    t.mark("build+probe+estimate (job1)")
    exact = docs.groupBy("source").agg(F.countDistinct("doc_id").alias("exact")).toPandas()
    t.mark("exact countDistinct (job2)")
    m = est.merge(exact, left_on="group", right_on="source")
    m["within_bound"] = (m["estimate"] - m["exact"]).abs() <= _hll_tol(m["exact"], m["rse_bound"])
    out = spark.createDataFrame(m[["source", "within_bound"]]).collect()
    t.mark("pandas merge + createDataFrame + collect")
    t.report("b01")


def phase_b03(spark, sf_dir):
    t = T()
    docs = with_tokens(_t(spark, sf_dir, "documents"))
    states = build_sketches(docs, [SketchSpec("cm_tok", "cm", "tokens", {"eps": 1e-4, "delta": 0.01})], group_by="source")
    t.mark("lazy build graph")
    top = topk_df(spark, states, "cm_tok", 5).toPandas()
    t.mark("build+probe+topk (job1)")
    exact = (
        docs.select("source", F.explode("tokens").alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("true_count"))
        .toPandas()
    )
    t.mark("exact full-vocab agg + toPandas (job2)")
    m = top.merge(exact, left_on=["group", "token"], right_on=["source", "token"], how="left")
    m["true_count"] = m["true_count"].fillna(0)
    ok = (m["est_count"] >= m["true_count"]) & (m["est_count"] <= m["true_count"] + 3 * m["err_bound"])
    m["ok"] = ok
    agg = m.groupby("group")["ok"].all().reset_index()
    agg.columns = ["source", "within_bound"]
    spark.createDataFrame(agg).collect()
    t.mark("pandas merge + createDataFrame + collect")
    t.report("b03")
    print(f"    [exact rows transferred: {len(exact)}]")


def phase_b04(spark, sf_dir):
    t = T()
    li = _t(spark, sf_dir, "lineitem")
    states = build_sketches(li, [SketchSpec("kll_price", "kll", "l_extendedprice", {"k": 200})], group_by="l_returnflag")
    t.mark("lazy build graph")
    qd = quantiles_df(spark, states, "kll_price", [0.5, 0.9, 0.99]).toPandas()
    t.mark("build+probe+quantiles (job1)")
    aggs, sizes = [], []
    for i, r in qd.iterrows():
        grp = F.col("l_returnflag") == r["group"]
        v = float(r["value"])
        aggs.append(F.sum((grp & (F.col("l_extendedprice") < v)).cast("long")).alias(f"lo_{i}"))
        aggs.append(F.sum((grp & (F.col("l_extendedprice") <= v)).cast("long")).alias(f"hi_{i}"))
    for g in qd["group"].unique():
        sizes.append(F.sum((F.col("l_returnflag") == g).cast("long")).alias(f"n_{g}"))
    row = li.agg(*aggs, *sizes).collect()[0]
    t.mark("exact rank agg (job2)")
    out = []
    for i, r in qd.iterrows():
        n = row[f"n_{r['group']}"]
        lo, hi = row[f"lo_{i}"] / n, row[f"hi_{i}"] / n
        err = max(0.0, lo - r["q"], r["q"] - hi)
        out.append((r["group"], float(r["q"]), bool(err <= r["rank_err_bound"] + 1.0 / n)))
    spark.createDataFrame(pd.DataFrame(out, columns=["l_returnflag", "q", "within_bound"])).collect()
    t.mark("createDataFrame + collect")
    t.report("b04")


def phase_a08(spark, sf_dir):
    t = T()
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    t.mark("read graphs")
    (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"), F.sum(_cents("o_totalprice")).alias("revenue_cents"))
    ).collect()
    t.mark("join+agg+collect")
    t.report("a08")


def phase_c01(spark, sf_dir):
    t = T()
    docs = _t(spark, sf_dir, "documents")
    keep = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    (
        docs.join(keep, ["doc_id"])
        .groupBy("source")
        .agg(F.count("*").alias("kept_docs"))
    ).collect()
    t.mark("dedup join+agg+collect")
    t.report("c01")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        "sketchlib-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 << 20)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).summary().collect()

    queries = entrymod.queries()
    for name in ("b01_hll_distinct_docs", "b03_cm_topk_tokens", "b04_kll_price_quantiles",
                 "a08_join_broadcast", "c01_exact_dedup"):
        queries[name](spark, sf_dir).collect()  # warm

    for fn in (phase_b01, phase_b03, phase_b04, phase_a08, phase_c01):
        fn(spark, sf_dir)  # warm phases once
    print("=============== steady state ===============")
    for fn in (phase_b01, phase_b03, phase_b04, phase_a08, phase_c01):
        fn(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
