"""Zone-map (parquet-footer min/max) file pruning — the range-predicate
complement of the Bloom index (SURVEY.md B8/D9). Stats come from footers
written at ingest: building the index scans ZERO data."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.prune import FilePruner, ZoneMapPruner, build_file_blooms, build_file_zonemaps

LI = "/root/testdata/sf0.01/lineitem.parquet"


@pytest.fixture(scope="module")
def sorted_dir(spark, tmp_path_factory):
    """lineitem split into 8 files range-sorted on l_orderkey — the layout a
    range-partitioned corpus write produces, where zone maps shine."""
    d = str(tmp_path_factory.mktemp("zm") / "li")
    (
        spark.read.parquet(LI)
        .repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(d)
    )
    return d


def test_build_reads_footers_only(sorted_dir):
    z = build_file_zonemaps(sorted_dir, ["l_orderkey", "l_shipdate"])
    assert set(z["column"]) == {"l_orderkey", "l_shipdate"}
    assert z["has_stats"].all()
    assert (z.groupby("column").size() == 8).all()


def test_range_prunes_disjoint_files_no_false_negatives(spark, sorted_dir):
    pr = ZoneMapPruner.from_dir(sorted_dir, ["l_orderkey"])
    lo, hi = 2_000, 2_500
    keep = pr.files_in_range("l_orderkey", lo, hi)
    # range-sorted layout: the narrow range hits a small subset of files
    assert 1 <= len(keep) < 8
    # exactness: pruned read + real filter == full read + real filter
    pred = (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)
    got = pr.pruned_read(spark, {"l_orderkey": (lo, hi)}).filter(pred).count()
    want = spark.read.parquet(sorted_dir).filter(pred).count()
    assert got == want > 0
    st = pr.stats({"l_orderkey": (lo, hi)})
    assert st["pruned_fraction"] > 0.5


def test_open_bounds_and_miss(spark, sorted_dir):
    pr = ZoneMapPruner.from_dir(sorted_dir, ["l_orderkey"])
    assert pr.files_in_range("l_orderkey", None, None) == pr.files
    # a range beyond every envelope prunes everything, and the empty
    # read keeps the schema
    out = pr.pruned_read(spark, {"l_orderkey": (10**12, None)})
    assert out.count() == 0 and "l_orderkey" in out.columns


def test_timestamp_column(spark, sorted_dir):
    pr = ZoneMapPruner.from_dir(sorted_dir, ["l_shipdate"])
    lo = pd.Timestamp("1995-01-01")
    hi = pd.Timestamp("1995-12-31")
    pred = (F.col("l_shipdate") >= F.lit(lo)) & (F.col("l_shipdate") <= F.lit(hi))
    got = pr.pruned_read(spark, {"l_shipdate": (lo, hi)}).filter(pred).count()
    want = spark.read.parquet(sorted_dir).filter(pred).count()
    assert got == want > 0  # unsorted column: prunes little, still exact


def test_multi_predicate_intersection(spark, sorted_dir):
    pr = ZoneMapPruner.from_dir(sorted_dir, ["l_orderkey", "l_shipdate"])
    keep = pr.files_matching(
        {"l_orderkey": (2_000, 2_500), "l_shipdate": (None, pd.Timestamp("1998-12-31"))}
    )
    assert keep == pr.files_in_range("l_orderkey", 2_000, 2_500)


def test_missing_column_raises_and_statless_kept(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = str(tmp_path / "nostat.parquet")
    pq.write_table(
        pa.table({"a": [1, 2, 3]}), f, write_statistics=False
    )
    z = build_file_zonemaps(f, ["a"])
    assert not z["has_stats"].iloc[0]
    pr = ZoneMapPruner(z)
    assert pr.files_in_range("a", 10**6, None) == [f]  # stats-less → kept
    with pytest.raises(KeyError):
        pr.files_in_range("b", 0, 1)


def test_array_element_leaf(spark, tmp_path):
    """tokens:array<int> resolves to the list-element leaf — min/max over
    elements, so a token-range probe can prune files."""
    d = str(tmp_path / "arr")
    pdf = pd.DataFrame(
        {"id": [1, 2], "tokens": [np.arange(0, 50).tolist(), np.arange(1000, 1050).tolist()]}
    )
    spark.createDataFrame(pdf).repartitionByRange(2, "id").write.parquet(d)
    z = build_file_zonemaps(d, ["tokens"])
    with_stats = z[z["has_stats"]]
    if len(with_stats):  # leaf stats present in this writer version
        pr = ZoneMapPruner(z)
        keep = pr.files_in_range("tokens", 5000, None)
        # no file holds tokens ≥ 5000 — only stats-less files may survive
        assert set(keep) <= set(z[~z["has_stats"]]["file"])


def test_composes_with_bloom(spark, sorted_dir):
    """range ∧ membership: the two driver-side indexes intersect."""
    df = spark.read.parquet(sorted_dir)
    bl = FilePruner(build_file_blooms(df, "l_orderkey"))
    zm = ZoneMapPruner.from_dir(sorted_dir, ["l_orderkey"])
    import os

    base = lambda ps: {os.path.basename(p) for p in ps}  # noqa: E731
    probe = 2_222
    # the Bloom index keys files by input_file_name() (file: URI), the zone
    # maps by local path — compose on basenames
    both = base(bl.files_maybe_containing([probe])) & base(
        zm.files_in_range("l_orderkey", probe, probe)
    )
    truth = {
        r["_f"]
        for r in df.withColumn("_f", F.input_file_name())
        .filter(F.col("l_orderkey") == probe).select("_f").distinct().collect()
    }
    assert truth  # probe exists
    assert base(truth) <= both
    assert len(both) < 8  # the composition actually pruned


def test_save_load_round_trip(spark, sorted_dir, tmp_path):
    pr = ZoneMapPruner.from_dir(sorted_dir, ["l_orderkey"])
    p = str(tmp_path / "zm.parquet")
    pr.save(p)
    back = ZoneMapPruner.load(p)
    assert back.files == pr.files
    assert back.files_in_range("l_orderkey", 2_000, 2_500) == pr.files_in_range(
        "l_orderkey", 2_000, 2_500
    )
