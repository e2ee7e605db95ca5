"""The merge-free answer path: answerers called with ``partial_specs`` on
build.partial_states output must return results IDENTICAL to the standard
merged-states path — the driver-side canonical merge in _rows_to_states
replicates _merge_pdf's (part_id, state bytes) order, so even order-sensitive
sketches (KLL compaction, t-digest centroids) produce byte-identical states.
Also locks the overflow fallback: above the byte-aware probe cap the call
falls back to merge_states + normal routing (never duplicate groups on the
distributed path)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.spark import SketchSpec, build_sketches
from sketchlib.spark.build import partial_states
from sketchlib.spark.query import (
    _partial_probe_cap,
    estimates_df,
    quantiles_df,
    topk_df,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    rng = np.random.default_rng(7)
    for i in range(4000):
        src = ["web", "wiki", "code"][i % 3]
        rows.append((i, src, rng.integers(0, 500, size=8).tolist(), float(rng.normal(100, 25))))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "tokens", "score"])
    )
    return df.repartition(6)  # several partitions -> several partials per group


def _sorted(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def test_partial_answers_match_merged(spark, docs):
    specs = [
        SketchSpec("h", "hll", "doc_id", {"p": 12}),
        SketchSpec("c", "cm", "tokens", {"eps": 1e-3, "delta": 0.01}),
        SketchSpec("k", "kll", "score", {"k": 160}),
        SketchSpec("t", "tdigest", "score", {"compression": 100}),
    ]
    merged = build_sketches(docs, specs, group_by="source")
    part = partial_states(docs, specs, group_by="source")

    for fn, name, args in [
        (estimates_df, "h", ()),
        (topk_df, "c", (5,)),
        (quantiles_df, "k", ([0.25, 0.5, 0.9],)),
        (quantiles_df, "t", ([0.25, 0.5, 0.9],)),
    ]:
        a = _sorted(fn(spark, merged, name, *args))
        b = _sorted(fn(spark, part, name, *args, partial_specs=specs))
        pd.testing.assert_frame_equal(a, b)


def test_partial_probe_cap_is_byte_aware():
    cm = [SketchSpec("c", "cm", "tokens", {"eps": 1e-4, "delta": 0.01})]
    hll = [SketchSpec("h", "hll", "doc_id", {"p": 12})]
    cap_cm = _partial_probe_cap(cm, "c")
    cap_hll = _partial_probe_cap(hll, "h")
    assert cap_cm < cap_hll  # ~1 MB CM states probe far fewer rows than 4 KB HLLs
    assert cap_cm >= 64 and cap_hll <= 8192
    assert _partial_probe_cap(cm, "missing") >= 64  # unknown sketch: floor


def test_partial_overflow_falls_back_to_merge(spark, docs, monkeypatch):
    """Force the cap below the partial row count: the path must fall back to
    merge_states + standard routing and still return correct results."""
    import sketchlib.spark.query as q

    specs = [SketchSpec("h", "hll", "doc_id", {"p": 12})]
    merged = _sorted(estimates_df(spark, build_sketches(docs, specs, group_by="source"), "h"))
    monkeypatch.setattr(q, "_PROBE_ROWS", 1)
    monkeypatch.setattr(q, "_PARTIAL_PROBE_BYTES", 1)
    part = partial_states(docs, specs, group_by="source")
    b = _sorted(estimates_df(spark, part, "h", partial_specs=specs))
    pd.testing.assert_frame_equal(merged, b)
