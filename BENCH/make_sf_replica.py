"""Build an sfN-scale PERF replica of a testdata dir by key-shifted copies.

The driver's round-end measurement runs bench.py at a driver-generated
scale factor (sf1 in BENCH_r05.json) that this sandbox does not have, so
headline-query behavior at that scale (probe caps, partial fast-path
routing, broadcast thresholds) would otherwise be unmeasured locally.
This tool writes a 10x (configurable) replica of sf0.1: each scaled table
is concatenated N times with every join key shifted by copy_index *
(max_key + 1), so join fan-outs, group-key distributions, and selectivities
match the source exactly while entity cardinalities scale by N.
`documents.text` gets a per-copy suffix so distinct-text/distinct-token
cardinalities scale too (exact dedup keeps the same duplicate fraction).

PERF ONLY: the value distributions repeat N times, so this is NOT the
driver's sf1 data and is never used for correctness checks (those run
against the real /root/testdata sf dirs). Usage:

    python BENCH/make_sf_replica.py [src_dir] [dst_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> columns shifted by copy_index * span(key family). Key families
# are shared across tables (l_orderkey and o_orderkey shift together) so
# joins keep exactly the source fan-out in every copy.
KEY_FAMILIES = {
    "orderkey": [("lineitem", "l_orderkey"), ("orders", "o_orderkey")],
    "partkey": [("lineitem", "l_partkey"), ("part", "p_partkey")],
    "suppkey": [("lineitem", "l_suppkey"), ("supplier", "s_suppkey")],
    "custkey": [("orders", "o_custkey"), ("customer", "c_custkey")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
}
SCALED = [
    "documents", "lineitem", "orders", "customer", "part", "supplier",
    "embeddings", "events",
]
COPIED = ["nation", "region"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sketchlib_bench/sf1_replica"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    shift_cols: dict[str, dict[str, int]] = {}  # table -> {col: span}
    for fam, sites in KEY_FAMILIES.items():
        span = 0
        for tbl, col in sites:
            t = pq.read_table(os.path.join(src, tbl + ".parquet"), columns=[col])
            span = max(span, int(pc.max(t[col]).as_py()) + 1)
        for tbl, col in sites:
            shift_cols.setdefault(tbl, {})[col] = span

    for tbl in COPIED:
        t = pq.read_table(os.path.join(src, tbl + ".parquet"))
        pq.write_table(t, os.path.join(dst, tbl + ".parquet"))
        print(f"{tbl}: copied {t.num_rows} rows")

    for tbl in SCALED:
        t = pq.read_table(os.path.join(src, tbl + ".parquet"))
        out = os.path.join(dst, tbl + ".parquet")
        copies = []
        for i in range(n):
            c = t
            for col, span in shift_cols.get(tbl, {}).items():
                idx = c.schema.get_field_index(col)
                shifted = pc.add(c[col], pa.scalar(i * span, type=c.schema.field(col).type))
                c = c.set_column(idx, c.schema.field(col), shifted)
            if tbl == "documents" and i > 0:
                idx = c.schema.get_field_index("text")
                suff = pc.binary_join_element_wise(
                    c["text"].cast(pa.string()), pa.scalar(f" r{i}"), ""
                )
                c = c.set_column(idx, c.schema.field("text"), suff.cast(c.schema.field("text").type))
            copies.append(c)
        # ONE write_table call with pyarrow's default 1M-row groups, matching
        # how the driver's generator lays tables out (every testdata sf file
        # is a single <=1M-row row group): a 6M-row replica lineitem gets ~6
        # row groups, a 50k-row documents gets ONE — so scan parallelism in
        # the replica matches what the driver's sf1 data will allow.
        pq.write_table(pa.concat_tables(copies), out)
        md = pq.ParquetFile(out).metadata
        print(f"{tbl}: {t.num_rows} x {n} rows, {md.num_row_groups} rgs -> {out}")

    # bench.py parses the sf out of the dir name; a _DONE marker matches the
    # real testdata layout
    open(os.path.join(dst, "_DONE"), "w").close()
    print("done:", dst)


if __name__ == "__main__":
    main()
