"""Cross-validation + cost evidence for the two error estimators.

Runs the SAME statements through the closed-form CLT path and the
variational-subsampling path (`ERROR BY SUBSAMPLING`) over one registered
uniform scramble of lineitem at $SPARK_GRAFT_SF_DIR (default sf0.1):

- per-group bound-width ratios subsample/clt (should hover around 1 —
  two independent estimators pricing the same sampling error),
- coverage of the exact answer by BOTH estimators' CIs (z=1.96 widened
  3.29/1.96 for the check, same protocol as the driver queries),
- wall time per statement, best of 3 (the subsample path adds one window
  + one aggregation over the b×groups block frame — KBs — so parity is
  the expectation),
- the percentile statement's value-unit CI (subsample) next to the rank
  bound (closed form) — different units, both reported.

Writes BENCH/subsample_xval.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import tempfile

    from pyspark.sql import functions as F

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.spark.session import get_spark
    from sketchlib.sql import approx_sql

    spark = get_spark("subsample-xval", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    t = {"li": f"{SF_DIR}/lineitem.parquet"}
    li = spark.read.parquet(t["li"])
    work = tempfile.mkdtemp(prefix="sketchlib_xval_")
    cat = SketchCatalog(spark, os.path.join(work, "cat"))
    approx_sql(spark, "CREATE SAMPLE xval_li FROM li KIND uniform RATIO 0.1 SEED 7",
               t, cat).collect()
    approx_sql(spark, "CREATE SAMPLE xval_cd FROM li KIND universe RATIO 0.25 "
               "ON l_partkey SEED 7", t, cat).collect()

    wide = 3.29 / 1.96
    stmts = {
        "sum_grouped": ("SELECT APPROX_SUM(l_extendedprice) FROM li GROUP BY l_returnflag",
                        "est_sum", "sum_err"),
        "avg_grouped": ("SELECT APPROX_AVG(l_quantity) FROM li GROUP BY l_returnflag",
                        "est_avg", "avg_err"),
        "stddev_global": ("SELECT APPROX_STDDEV(l_extendedprice) FROM li",
                          "est_stddev", "stddev_err"),
        "corr_global": ("SELECT APPROX_CORR(l_quantity, l_extendedprice) FROM li",
                        "est_corr", "corr_err"),
        "count_distinct_global": ("SELECT APPROX_COUNT_DISTINCT(l_partkey) FROM li",
                                  "est_distinct", "distinct_err"),
    }
    exact = {
        "sum_grouped": {r["l_returnflag"]: r["v"] for r in
                        li.groupBy("l_returnflag").agg(F.sum("l_extendedprice").alias("v")).collect()},
        "avg_grouped": {r["l_returnflag"]: r["v"] for r in
                        li.groupBy("l_returnflag").agg(F.avg("l_quantity").alias("v")).collect()},
        "stddev_global": {None: li.agg(F.stddev("l_extendedprice")).collect()[0][0]},
        "corr_global": {None: li.agg(F.corr("l_quantity", "l_extendedprice")).collect()[0][0]},
        "count_distinct_global": {None: li.agg(F.countDistinct("l_partkey")).collect()[0][0]},
    }

    def run(stmt):
        best, rows = None, None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = approx_sql(spark, stmt, t, cat).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, rows

    out = {"sf_dir": SF_DIR, "cpus": int(CPUS), "ratio": 0.1, "queries": {}}
    for name, (stmt, est_c, err_c) in stmts.items():
        t_cf, r_cf = run(stmt)
        t_ss, r_ss = run(stmt + " ERROR BY SUBSAMPLING")
        key = lambda r: r["l_returnflag"] if "l_returnflag" in r.__fields__ else None
        cf = {key(r): r for r in r_cf}
        ss = {key(r): r for r in r_ss}
        ratios, cov_cf, cov_ss = [], True, True
        for g, e in exact[name].items():
            ratios.append(ss[g][err_c] / cf[g][err_c])
            cov_cf &= abs(cf[g][est_c] - e) <= wide * cf[g][err_c]
            cov_ss &= abs(ss[g][est_c] - e) <= wide * ss[g][err_c]
        out["queries"][name] = {
            "clt_sec": round(t_cf, 3), "subsample_sec": round(t_ss, 3),
            "bound_ratio_ss_over_clt": [round(x, 3) for x in sorted(ratios)],
            "clt_covers_exact": bool(cov_cf), "subsample_covers_exact": bool(cov_ss),
        }

    # percentile: rank bound (closed form) vs value CI (subsample)
    pstmt = "SELECT APPROX_PERCENTILE(l_extendedprice, 0.5, 0.9) FROM li"
    t_cf, r_cf = run(pstmt)
    t_ss, r_ss = run(pstmt + " ERROR BY SUBSAMPLING")
    ex = {q: li.agg(F.expr(f"percentile(l_extendedprice, {q})")).collect()[0][0]
          for q in (0.5, 0.9)}
    out["percentile"] = {
        "clt_sec": round(t_cf, 3), "subsample_sec": round(t_ss, 3),
        "rank_err_bounds": {str(r["q"]): round(r["rank_err_bound"], 6) for r in r_cf},
        "value_errs": {str(r["q"]): round(r["value_err"], 3) for r in r_ss},
        "value_ci_covers_exact": all(
            abs(r["value"] - ex[r["q"]]) <= wide * r["value_err"] for r in r_ss
        ),
    }
    with open(os.path.join(REPO, "BENCH", "subsample_xval.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
