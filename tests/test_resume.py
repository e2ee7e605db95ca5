"""Checkpoint/resume tests (SURVEY.md §5.5, FIXTURES.md F4): injected failure
mid-build → resume → final states byte-identical to an uninterrupted run;
lineage covers every chunk exactly once."""

import os

import pytest

from sketchlib.spark import SketchSpec
from sketchlib.spark.checkpoint import (
    build_with_checkpoint,
    committed_parts,
    lineage_df,
    throughput_metrics,
)
from sketchlib.spark.scan import plan_chunks

SPECS = [
    SketchSpec("hll_doc", "hll", "doc_id", {"p": 12}),
    SketchSpec("kll_ntok", "kll", "n_tok", {"k": 200}),
    SketchSpec("cm_tok", "cm", "tokens", {"eps": 1e-3, "delta": 0.05}),
]
TB = 1 << 20  # small chunks so the tiny table yields several


def _states_map(df):
    return {(r["group"], r["sketch"]): bytes(r["state"]) for r in df.collect()}


def test_clean_checkpointed_build_and_lineage(spark, seq_tiny_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt_clean")
    states = build_with_checkpoint(spark, seq_tiny_dir, SPECS, ckpt, group_by="source", target_bytes=TB)
    sm = _states_map(states)
    assert len(sm) == 5 * 3  # 5 sources x 3 sketches

    chunks = plan_chunks(seq_tiny_dir, target_bytes=TB)
    assert committed_parts(ckpt) == {c.key for c in chunks}
    lin = lineage_df(spark, ckpt).toPandas()
    assert sorted(lin["chunk_id"]) == [c.chunk_id for c in chunks]  # every chunk once
    assert lin["rows"].sum() == 2000
    m = throughput_metrics(spark, ckpt)
    assert m["tokens"] == lin["tokens"].sum() > 0
    assert m["tokens_per_cpu_sec"] > 0


def test_resume_after_injected_failure_byte_identical(spark, seq_tiny_dir, tmp_path):
    clean = _states_map(
        build_with_checkpoint(spark, seq_tiny_dir, SPECS, str(tmp_path / "c0"), group_by="source", target_bytes=TB)
    )

    ckpt = str(tmp_path / "c1")
    os.environ["SKETCHLIB_FAIL_PARTS"] = "3"
    try:
        with pytest.raises(Exception, match="injected failure"):
            build_with_checkpoint(
                spark, seq_tiny_dir, SPECS, ckpt, group_by="source", target_bytes=TB
            ).collect()
    finally:
        del os.environ["SKETCHLIB_FAIL_PARTS"]

    done_after_crash = committed_parts(ckpt)
    chunks = {c.chunk_id: c.key for c in plan_chunks(seq_tiny_dir, target_bytes=TB)}
    assert chunks[3] not in done_after_crash
    assert len(done_after_crash) > 0  # other chunks committed before the crash

    resumed = _states_map(
        build_with_checkpoint(spark, seq_tiny_dir, SPECS, ckpt, group_by="source", target_bytes=TB)
    )
    assert resumed == clean  # byte-identical, incl. order-sensitive KLL


def test_resume_is_noop_when_complete(spark, seq_tiny_dir, tmp_path):
    ckpt = str(tmp_path / "c2")
    first = _states_map(
        build_with_checkpoint(spark, seq_tiny_dir, SPECS, ckpt, group_by="source", target_bytes=TB)
    )
    mtimes = {
        f: os.path.getmtime(os.path.join(ckpt, "states", f))
        for f in os.listdir(os.path.join(ckpt, "states"))
    }
    second = _states_map(
        build_with_checkpoint(spark, seq_tiny_dir, SPECS, ckpt, group_by="source", target_bytes=TB)
    )
    assert first == second
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(ckpt, "states", f)) == t  # nothing rewritten


def test_mismatched_config_rejected(spark, seq_tiny_dir, tmp_path):
    ckpt = str(tmp_path / "c3")
    build_with_checkpoint(spark, seq_tiny_dir, SPECS, ckpt, group_by="source", target_bytes=TB)
    with pytest.raises(ValueError, match="different job/configuration"):
        build_with_checkpoint(spark, seq_tiny_dir, SPECS[:1], ckpt, group_by="source", target_bytes=TB)


def test_checkpointed_matches_direct_build(spark, seq_tiny_dir, tmp_path):
    from sketchlib.spark.scan import build_sketches_from_parquet

    ck = _states_map(
        build_with_checkpoint(spark, seq_tiny_dir, SPECS, str(tmp_path / "c4"), group_by="source", target_bytes=TB)
    )
    direct = _states_map(
        build_sketches_from_parquet(
            spark, seq_tiny_dir, SPECS, group_by="source", target_bytes=TB, n_tasks=None
        )
    )
    # order-independent sketches byte-match; KLL depends on merge grain, so
    # compare its quantiles within bound instead
    for k, v in direct.items():
        if k[1] != "kll_ntok":
            assert ck[k] == v, k
    import numpy as np

    from sketchlib.sketches import deserialize

    for g in {k[0] for k in ck}:
        qa = deserialize(ck[(g, "kll_ntok")]).quantiles(np.array([0.5, 0.9]))
        qb = deserialize(direct[(g, "kll_ntok")]).quantiles(np.array([0.5, 0.9]))
        assert np.allclose(qa, qb, rtol=0.05)
