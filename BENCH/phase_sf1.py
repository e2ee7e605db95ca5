"""Phase attribution for b03/b04 (current r6 implementations) at an
arbitrary sf dir — where does the wall time go at driver scale (sf1)?

    python BENCH/phase_sf1.py /tmp/sketchlib_bench/sf1.0
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from __spark_entry__ import _CM_TOK, _KLL_PRICE, _t
from sketchlib.spark import get_spark
from sketchlib.spark.build import partial_states
from sketchlib.spark.query import quantiles_df, topk_df
from sketchlib.spark.scan import partial_states_from_parquet
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
        print(f"--- {label}: total {total:.3f}s", flush=True)
        for n, s in self.marks:
            print(f"    {n:<46} {s:.3f}")


def phase_b03(spark, sf_dir):
    t = T()
    docs = with_tokens(_t(spark, sf_dir, "documents"))
    t.mark("with_tokens graph")
    states = partial_states(docs, _CM_TOK, group_by="source")
    top = topk_df(spark, states, "cm_tok", 5, partial_specs=_CM_TOK).toPandas()
    t.mark("partial build + probe + topk (job1)")
    exact = (
        docs.select("source", F.explode("tokens").alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("true_count"))
        .toPandas()
    )
    t.mark(f"exact token counts toPandas ({len(exact)} rows)")
    t.report("b03")
    print("    partial rows:", states.count())


def phase_b04(spark, sf_dir):
    t = T()
    li = _t(spark, sf_dir, "lineitem")
    states = partial_states_from_parquet(
        spark, f"{sf_dir}/lineitem.parquet", _KLL_PRICE, group_by="l_returnflag"
    )
    qd = quantiles_df(spark, states, "kll_price", [0.5, 0.9, 0.99], partial_specs=_KLL_PRICE).toPandas()
    t.mark("kernel build + probe + quantiles (job1)")
    aggs, sizes = [], []
    for i, r in qd.iterrows():
        grp = F.col("l_returnflag") == r["group"]
        v = float(r["value"])
        aggs.append(F.sum((grp & (F.col("l_extendedprice") < v)).cast("long")).alias(f"lo_{i}"))
        aggs.append(F.sum((grp & (F.col("l_extendedprice") <= v)).cast("long")).alias(f"hi_{i}"))
    for g in qd["group"].unique():
        sizes.append(F.sum((F.col("l_returnflag") == g).cast("long")).alias(f"n_{g}"))
    li.agg(*aggs, *sizes).collect()
    t.mark("exact rank verification agg (job2)")
    t.report("b04")
    print("    partial rows:", states.count())


def main():
    sf_dir = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "sketchlib-phase-sf1",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 << 20)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).summary().collect()
    qs = entrymod.queries()
    for name in ("b03_cm_topk_tokens", "b04_kll_price_quantiles"):  # warm
        qs[name](spark, sf_dir).collect()
    for _ in range(2):
        phase_b03(spark, sf_dir)
        phase_b04(spark, sf_dir)


if __name__ == "__main__":
    main()
