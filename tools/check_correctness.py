"""Local replica of the driver's correctness gate (CORRECTNESS_r{N}.json).

Runs every `queries()` entry on Spark and its `oracle_sql()` twin on DuckDB
over the same parquet tables, then compares row count, schema (sorted column
names), and exact values (columns sorted by name, rows sorted by all
columns) — the same canonicalization the driver hashes. Exact equality of
values implies any value-hash matches.

Usage: python tools/check_correctness.py [--out FILE] [sf_dir] [query ...]

--out FILE additionally writes the per-query result dict as JSON (the same
shape the driver records in CORRECTNESS_r{N}.json), so a full-registry
sweep can be committed as verification evidence between driver rounds.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # equal_nan: a legitimately-NaN value (avg over an empty group)
            # must compare equal when both sides agree it is NaN
            af, bf = av.astype("float64"), bv.astype("float64")
            if not np.array_equal(af, bf, equal_nan=True):
                diff = (af != bf) & ~(np.isnan(af) & np.isnan(bf))
                bad = np.nonzero(diff)[0][:3]
                return False, f"col {c} float mismatch rows {bad.tolist()}: {av[bad]} vs {bv[bad]}"
        else:
            if not (av.astype(object) == bv.astype(object)).all():
                bad = np.nonzero(av.astype(object) != bv.astype(object))[0][:3]
                return False, f"col {c} mismatch rows {bad.tolist()}: {av[bad]} vs {bv[bad]}"
    return True, ""


def main() -> int:
    args = sys.argv[1:]
    out_file = None
    if args and args[0] == "--out":
        out_file = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = em.queries(), em.oracle_sql()
    results, n_bad = {}, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        entry = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                entry["err"] = "no_oracle"
                entry["spark_rows"] = len(sdf)
            else:
                odf = con.execute(oracles[name]).df()
                entry["rows_match"] = len(sdf) == len(odf)
                entry["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                if entry["rows_match"] and entry["schema_match"]:
                    ok, why = values_equal(canon(sdf), canon(odf))
                    entry["hash_match"] = ok
                    if not ok:
                        entry["why"] = why
                else:
                    entry["hash_match"] = False
                    entry["why"] = f"spark {len(sdf)}x{sorted(sdf.columns)} vs oracle {len(odf)}x{sorted(odf.columns)}"
                entry["spark_rows"], entry["oracle_rows"] = len(sdf), len(odf)
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = entry
        ok = entry.get("hash_match") and not entry["err"]
        if not ok:
            n_bad += 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: {json.dumps({k: v for k, v in entry.items() if k != 'why'})}")
        if entry.get("why"):
            print(f"     why: {entry['why']}")
    print(f"\n{len(results) - n_bad}/{len(results)} green")
    if out_file:
        with open(out_file, "w") as fh:
            json.dump(results, fh, indent=1)
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
