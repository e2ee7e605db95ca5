"""Checkpoint/resume tests (SURVEY.md §5.5, FIXTURES.md F4): injected failure
mid-build → resume → final states byte-identical to an uninterrupted run;
lineage covers every partition exactly once."""

import os

import pytest

from sketchlib.spark import SketchSpec
from sketchlib.spark.checkpoint import (
    build_with_checkpoint,
    committed_parts,
    lineage_df,
    throughput_metrics,
)

SPECS = [
    SketchSpec("hll_doc", "hll", "doc_id", {"p": 12}),
    SketchSpec("kll_ntok", "kll", "n_tok", {"k": 200}),
    SketchSpec("cm_tok", "cm", "tokens", {"eps": 1e-3, "delta": 0.05}),
]


def _states_map(df):
    return {(r["group"], r["sketch"]): bytes(r["state"]) for r in df.collect()}


def test_clean_checkpointed_build_and_lineage(spark, seq_tiny_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt_clean")
    df = spark.read.parquet(seq_tiny_dir)
    states = build_with_checkpoint(df, SPECS, ckpt, group_by="source")
    sm = _states_map(states)
    assert len(sm) == 5 * 3  # 5 sources x 3 sketches

    n_parts = df.select("doc_id").rdd.getNumPartitions()
    assert committed_parts(ckpt) == set(range(n_parts))
    lin = lineage_df(spark, ckpt).toPandas()
    assert sorted(lin["part_id"]) == list(range(n_parts))  # every partition exactly once
    assert lin["rows"].sum() == 2000
    assert (lin["input_files"].str.len() > 0).all()
    m = throughput_metrics(spark, ckpt)
    assert m["tokens"] == lin["tokens"].sum() > 0
    assert m["tokens_per_cpu_sec"] > 0


def test_resume_after_injected_failure_byte_identical(spark, seq_tiny_dir, tmp_path):
    df = spark.read.parquet(seq_tiny_dir)

    clean = _states_map(build_with_checkpoint(df, SPECS, str(tmp_path / "c0"), group_by="source"))

    ckpt = str(tmp_path / "c1")
    os.environ["SKETCHLIB_FAIL_PARTS"] = "3"
    try:
        with pytest.raises(Exception, match="injected failure"):
            build_with_checkpoint(df, SPECS, ckpt, group_by="source").collect()
    finally:
        del os.environ["SKETCHLIB_FAIL_PARTS"]

    done_after_crash = committed_parts(ckpt)
    assert 3 not in done_after_crash
    assert len(done_after_crash) > 0  # other partitions committed before the crash

    resumed = _states_map(build_with_checkpoint(df, SPECS, ckpt, group_by="source"))
    assert resumed == clean  # byte-identical, incl. order-sensitive KLL


def test_resume_is_noop_when_complete(spark, seq_tiny_dir, tmp_path):
    ckpt = str(tmp_path / "c2")
    df = spark.read.parquet(seq_tiny_dir)
    first = _states_map(build_with_checkpoint(df, SPECS, ckpt, group_by="source"))
    mtimes = {
        f: os.path.getmtime(os.path.join(ckpt, "states", f))
        for f in os.listdir(os.path.join(ckpt, "states"))
    }
    second = _states_map(build_with_checkpoint(df, SPECS, ckpt, group_by="source"))
    assert first == second
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(ckpt, "states", f)) == t  # nothing rewritten


def test_mismatched_config_rejected(spark, seq_tiny_dir, tmp_path):
    ckpt = str(tmp_path / "c3")
    df = spark.read.parquet(seq_tiny_dir)
    build_with_checkpoint(df, SPECS, ckpt, group_by="source")
    with pytest.raises(ValueError, match="different job/configuration"):
        build_with_checkpoint(df, SPECS[:1], ckpt, group_by="source")
