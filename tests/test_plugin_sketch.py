"""User-defined sketch kinds (register_sketch_kind, SURVEY.md A19).

Covers both deployment shapes:

- a plugin in an importable module registered at import time
  (sketchlib.sketches.contrib.MinMaxSketch) — the --py-files shape;
- a plugin defined only in THIS module (pickled into the kernel closures
  via the registry snapshot) with the 'hashes' update style — proving a
  driver-side registration reaches executor processes without any
  executor-side import arrangement.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.sketches.base import SketchBase
from sketchlib.sketches.contrib import MinMaxSketch
from sketchlib.spark import SketchSpec, build_sketches, estimates_df, register_sketch_kind
from sketchlib.spark.scan import build_sketches_from_parquet

TD = "/root/testdata/sf0.001"


class ExactSetSketch(SketchBase):
    """Exact distinct count via a set of 64-bit hashes (test-only)."""

    kind = "exactset_test"

    def __init__(self):
        self.hashes: set[int] = set()
        self._n_items = 0

    def update_hashes(self, h, n_seen=0):
        self.hashes.update(int(x) for x in np.asarray(h, dtype=np.uint64))
        self._n_items += int(n_seen or len(h))

    def merge(self, other):
        self.hashes |= other.hashes
        self._n_items += other._n_items
        return self

    def estimate(self):
        return (float(len(self.hashes)), 0.0)

    def _params(self):
        return {}

    def _body_bytes(self):
        arr = np.fromiter(sorted(self.hashes), dtype=np.uint64, count=len(self.hashes))
        return struct.pack("<q", self._n_items) + arr.tobytes()

    @classmethod
    def _from_parts(cls, params, body):
        sk = cls()
        (sk._n_items,) = struct.unpack_from("<q", body)
        sk.hashes = set(np.frombuffer(body[8:], dtype=np.uint64).tolist())
        return sk


# this module is not importable on executors — ship the class by value
register_sketch_kind(ExactSetSketch, update_style="hashes", pickle_by_value=True)


def test_plugin_values_style_builds_merges_answers(spark):
    docs = spark.read.parquet(f"{TD}/documents.parquet")
    specs = [SketchSpec("range_chars", "minmax", "n_chars")]
    states = build_sketches(docs, specs, group_by="source")
    got = {
        r["group"]: (r["estimate"], r["rse_bound"])
        for r in estimates_df(spark, states, "range_chars").collect()
    }
    exact = {
        r["source"]: float(r["mx"] - r["mn"])
        for r in docs.groupBy("source")
        .agg(F.max("n_chars").alias("mx"), F.min("n_chars").alias("mn"))
        .collect()
    }
    assert set(got) == set(exact)
    for g, e in exact.items():
        assert got[g] == (e, 0.0)
    # merge associativity under regrouping: different partitioning,
    # byte-identical states (min/max is order-free)
    states2 = build_sketches(docs.repartition(7), specs, group_by="source")
    a = {(r["group"], r["sketch"]): bytes(r["state"]) for r in states.collect()}
    b = {(r["group"], r["sketch"]): bytes(r["state"]) for r in states2.collect()}
    assert a == b


def test_plugin_flows_through_parquet_scan_path(spark):
    specs = [SketchSpec("range_chars", "minmax", "n_chars")]
    via_spark = build_sketches(
        spark.read.parquet(f"{TD}/documents.parquet"), specs, group_by="source"
    )
    via_scan = build_sketches_from_parquet(
        spark, f"{TD}/documents.parquet", specs, group_by="source"
    )
    a = {r["group"]: bytes(r["state"]) for r in via_spark.collect()}
    b = {r["group"]: bytes(r["state"]) for r in via_scan.collect()}
    assert a == b


def test_plugin_hashes_style_driver_only_definition(spark):
    docs = spark.read.parquet(f"{TD}/documents.parquet")
    specs = [SketchSpec("docs_exact", "exactset_test", "doc_id")]
    states = build_sketches(docs, specs, group_by="source")
    exact = {
        r["source"]: float(r["n"])
        for r in docs.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    # force the DISTRIBUTED answer path: executor processes must
    # deserialize the plugin state from the snapshot alone
    got = {
        r["group"]: r["estimate"]
        for r in estimates_df(spark, states, "docs_exact", distributed=True).collect()
    }
    assert got == exact


def test_plugin_registration_contract(spark):
    from sketchlib.sketches.contrib import MinMaxSketch as M2

    # idempotent re-registration of the same class + style
    register_sketch_kind(M2, update_style="values")
    register_sketch_kind(ExactSetSketch, update_style="hashes", pickle_by_value=True)
    with pytest.raises(ValueError, match="built-in"):
        register_sketch_kind(
            type("Evil", (MinMaxSketch,), {"kind": "hll"}), update_style="values"
        )
    with pytest.raises(ValueError, match="already registered"):
        register_sketch_kind(
            type("Other", (MinMaxSketch,), {"kind": "minmax"}), update_style="values"
        )
    with pytest.raises(ValueError, match="update_style"):
        register_sketch_kind(MinMaxSketch, update_style="rows")
    with pytest.raises(TypeError, match="SketchBase"):
        register_sketch_kind(dict, update_style="values")
    with pytest.raises(ValueError, match="unknown sketch kind"):
        SketchSpec("x", "nope", "col").make()


def test_plugin_serde_roundtrip():
    from sketchlib.sketches import deserialize

    sk = MinMaxSketch()
    sk.update_values([3.0, -1.5, 7.25])
    rt = deserialize(sk.to_bytes())
    assert isinstance(rt, MinMaxSketch)
    assert (rt.lo, rt.hi, rt.n_items) == (-1.5, 7.25, 3)
    assert rt.estimate() == (8.75, 0.0)


def test_plugin_kind_through_ddl_lifecycle(spark, tmp_path):
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    t = {"docs": "/root/testdata/sf0.001/documents.parquet"}
    approx_sql(
        spark, "CREATE SKETCHES plugset FROM docs KINDS minmax(n_chars) GROUP BY source",
        t, cat,
    ).collect()
    reg = cat.list().where("name = 'plugset'").collect()
    assert len(reg) == 1
    states = cat.states("plugset")
    from sketchlib.spark import estimates_df

    docs = spark.read.parquet(t["docs"])
    exact = {
        r["source"]: float(r["mx"] - r["mn"])
        for r in docs.groupBy("source")
        .agg(F.max("n_chars").alias("mx"), F.min("n_chars").alias("mn"))
        .collect()
    }
    got = {
        r["group"]: r["estimate"]
        for r in estimates_df(spark, states, "minmax_n_chars").collect()
    }
    assert got == exact
    # unknown kinds keep a descriptive refusal that now names plugins
    with pytest.raises(ValueError, match="registered plugins"):
        approx_sql(spark, "CREATE SKETCHES bad FROM docs KINDS nope(n_chars)", t, cat)
    approx_sql(spark, "DROP SKETCHES plugset", t, cat).collect()


class TotalCountSketch(SketchBase):
    """Exact total multiplicity via the 'keys' feed (counts ride along)."""

    kind = "totalcount_test"

    def __init__(self):
        self.total = 0
        self._n_items = 0

    def update_values(self, keys, counts=None):
        import numpy as _np

        n = int(_np.sum(counts)) if counts is not None else len(keys)
        self.total += n
        self._n_items += n

    def merge(self, other):
        self.total += other.total
        self._n_items += other._n_items
        return self

    def estimate(self):
        return (float(self.total), 0.0)

    def _params(self):
        return {}

    def _body_bytes(self):
        return struct.pack("<qq", self.total, self._n_items)

    @classmethod
    def _from_parts(cls, params, body):
        sk = cls()
        sk.total, sk._n_items = struct.unpack_from("<qq", body)
        return sk


register_sketch_kind(TotalCountSketch, update_style="keys", pickle_by_value=True)


def test_plugin_keys_style_counts_ride_along(spark):
    docs = spark.read.parquet(f"{TD}/documents.parquet")
    specs = [SketchSpec("rows_total", "totalcount_test", "doc_id")]
    states = build_sketches(docs, specs, group_by="source")
    exact = {
        r["source"]: float(r["n"])
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    got = {
        r["group"]: r["estimate"]
        for r in estimates_df(spark, states, "rows_total").collect()
    }
    assert got == exact


def test_plugin_kind_incremental_refresh(spark, tmp_path):
    from sketchlib.spark.catalog import SketchCatalog

    base = str(tmp_path / "tbl")
    docs = spark.read.parquet(f"{TD}/documents.parquet")
    docs.limit(30).write.parquet(base)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("plug_rng", base, [SketchSpec("rng", "minmax", "n_chars")], group_by=None)
    before = estimates_df(spark, cat.states("plug_rng"), "rng").collect()[0]["estimate"]
    # append rows widening the range, refresh incrementally
    docs.orderBy(F.desc("n_chars")).limit(5).write.mode("append").parquet(base)
    res = cat.refresh("plug_rng")
    assert res["new_files"] >= 1 and res["rows_added"] == 5
    after = estimates_df(spark, cat.states("plug_rng"), "rng").collect()[0]["estimate"]
    full = spark.read.parquet(base)
    exact = float(full.agg(
        (F.max("n_chars") - F.min("n_chars")).cast("double").alias("r")
    ).collect()[0]["r"])
    assert after == exact and after >= before


def test_unpicklable_plugin_does_not_break_unrelated_merges(spark, seq_tiny_dir):
    """merge/query kernels snapshot ALL plugins (their kinds are only known
    from the state rows at execution) — a plugin cloudpickle cannot
    serialize must be dropped from that snapshot with a warning, not crash
    every unrelated pipeline at closure-pickling time."""
    import threading

    from sketchlib.spark.build import (
        _KINDS,
        _PLUGIN_STYLE,
        SketchSpec,
        _plugin_snapshot,
        build_sketches,
    )
    from sketchlib.spark.query import estimates_df

    # dynamic class (not resolvable by reference) holding an unpicklable
    # attribute -> cloudpickle by-value serialization raises
    broken = type("BrokenPlugin", (), {"kind": "_broken_plugin", "_lock": threading.Lock()})
    _KINDS["_broken_plugin"] = broken
    _PLUGIN_STYLE["_broken_plugin"] = "values"
    try:
        import pyspark.cloudpickle as cp
        import pytest as _pt

        with _pt.raises(Exception):
            cp.dumps((broken, "values"))  # precondition: it really is broken

        snap = _plugin_snapshot()
        assert "_broken_plugin" not in snap  # dropped, not fatal

        # an unrelated built-in pipeline still runs end-to-end through the
        # full-snapshot merge and estimate kernels
        df = spark.read.parquet(seq_tiny_dir).limit(200)
        states = build_sketches(df, [SketchSpec("h", "hll", "doc_id", {"p": 12})],
                                group_by="source")
        est = estimates_df(spark, states, "h")
        assert est.count() > 0
    finally:
        _KINDS.pop("_broken_plugin", None)
        _PLUGIN_STYLE.pop("_broken_plugin", None)
