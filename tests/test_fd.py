"""FrequentDirections — mergeable embedding-covariance sketch.

Contracts under test (Liberty KDD 2013 / Ghashami et al. 2016):
- exact bracket: σ_i²(B) ≤ λ_i(AᵀA) ≤ σ_i²(B) + Δ with Δ = Σ δ_t (the
  accumulated shrink mass), for streamed, merged, and serde-roundtripped
  states alike;
- merges hold the bracket under ARBITRARY partition regroupings;
- Δ ≤ ‖A − A_k‖F²/(ℓ − k) (the 2016 tail guarantee);
- the Spark build feeds whole per-group rows (flattened array column) and
  spectrum_df serves the same answers on driver and distributed routes;
- DDL: fd(col, d=..) registers/refreshes through the catalog; d is required.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sketchlib.sketches.base import deserialize
from sketchlib.sketches.fd import FrequentDirections


def _data(n=3000, d=24, rank=3, seed=11):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, rank)) @ rng.normal(size=(rank, d)) + 0.03 * rng.normal(
        size=(n, d)
    )


def _bracket_holds(A, sk, r=5):
    lam = np.linalg.eigvalsh(A.T @ A)[::-1][:r]
    sq, delta = sk.spectrum(r)
    return bool((sq <= lam + 1e-6).all() and (lam <= sq + delta + 1e-6).all())


def test_stream_bracket_and_tail_guarantee():
    A = _data()
    sk = FrequentDirections(24, ell=16)
    for chunk in np.array_split(A, 7):
        sk.update_values(chunk.ravel())
    assert _bracket_holds(A, sk)
    # 2016 guarantee: Δ ≤ ‖A − A_k‖F² / (ℓ − k) for k < ℓ
    s = np.linalg.svd(A, compute_uv=False)
    for k in (1, 3, 5):
        tail = float((s[k:] ** 2).sum())
        assert sk.cov_err_bound() <= tail / (sk.ell - k) + 1e-6


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(1, 9), min_size=1, max_size=6), st.integers(0, 99))
def test_merge_bracket_under_any_regrouping(splits, seed):
    A = _data(n=800, d=12, seed=seed)
    bounds = np.cumsum(splits)
    bounds = bounds[bounds < len(A)]
    parts = np.split(A, bounds) if len(bounds) else [A]
    sks = []
    for p in parts:
        s = FrequentDirections(12, ell=8)
        if len(p):
            s.update_values(p.ravel())
        sks.append(s)
    acc = sks[0]
    for s in sks[1:]:
        acc = acc.merge(s)
    assert _bracket_holds(A, acc, r=4)
    assert acc.n_items == len(A)


def test_serde_roundtrip_identical():
    A = _data(n=500, d=16)
    sk = FrequentDirections(16, ell=8).update_values(A.ravel())
    rt = deserialize(sk.to_bytes())
    assert np.allclose(rt.spectrum(4)[0], sk.spectrum(4)[0])
    assert rt.cov_err_bound() == sk.cov_err_bound()
    assert rt.n_items == sk.n_items
    assert rt.to_bytes() == sk.to_bytes()


def test_directions_sign_canonical_and_aligned():
    A = _data(n=4000, d=20, rank=2, seed=5)
    sk = FrequentDirections(20, ell=12).update_values(A.ravel())
    V = sk.directions(2)
    true_v = np.linalg.svd(A, full_matrices=False)[2][:2]
    for i in range(2):
        # alignment up to sign — the sketch canonicalizes its own sign
        assert abs(float(np.dot(V[i], true_v[i]))) > 0.99
        assert V[i][np.abs(V[i]).argmax()] > 0


def test_error_paths():
    sk = FrequentDirections(8, ell=4)
    with pytest.raises(ValueError, match="whole number of vectors"):
        sk.update_values(np.ones(9))
    with pytest.raises(ValueError, match="geometry mismatch"):
        sk.merge(FrequentDirections(8, ell=6))
    with pytest.raises(ValueError, match="d must be"):
        FrequentDirections(0)
    # non-finite vectors dropped, not sketched
    sk.update_values(np.array([np.nan] * 8 + [1.0] * 8))
    assert sk.n_items == 1


def test_spark_build_and_spectrum_df(spark):
    import pandas as pd

    from sketchlib.spark import SketchSpec, build_sketches, spectrum_df

    rng = np.random.default_rng(7)
    d, per = 16, 400
    frames = []
    mats = {}
    for g in ("a", "b"):
        M = _data(n=per, d=d, seed=ord(g))
        mats[g] = M
        frames.append(
            pd.DataFrame({"grp": g, "vec": [row.astype(np.float32) for row in M]})
        )
    df = spark.createDataFrame(pd.concat(frames)).repartition(6)
    states = build_sketches(
        df, [SketchSpec("sp", "fd", "vec", {"d": d, "ell": 8})], group_by="grp"
    )
    for dist in (False, True):
        out = spectrum_df(spark, states, "sp", 3, distributed=dist).toPandas()
        assert len(out) == 6
        for g, M in mats.items():
            sub = out[out["group"] == g].sort_values("component")
            # truth over what was actually stored (float32 round-trip)
            M32 = M.astype(np.float32).astype(np.float64)
            lam = np.linalg.eigvalsh(M32.T @ M32)[::-1][:3]
            sq = sub["sq_singular_value"].to_numpy()
            delta = sub["cov_err_bound"].to_numpy()
            tol = 1e-9 * np.abs(lam) + 1e-9
            assert (sq <= lam + tol).all() and (lam <= sq + delta + tol).all()


def test_approx_spectrum_sql_routes(spark, tmp_path):
    import pandas as pd

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.sql import approx_sql

    d = 16
    M = _data(n=600, d=d, seed=9)
    pdf = pd.DataFrame(
        {"g": ["x"] * 300 + ["y"] * 300, "emb": [r.astype(np.float32) for r in M]}
    )
    base = str(tmp_path / "t")
    spark.createDataFrame(pdf).repartition(4).write.parquet(base)
    T = {"t": base}

    def _truth(g):
        rows = np.stack(pdf.loc[pdf["g"] == g, "emb"].to_numpy())
        rows = rows.astype(np.float64)
        return np.linalg.eigvalsh(rows.T @ rows)[::-1]

    # on-the-fly, d inferred from the data
    out = approx_sql(
        spark, "SELECT APPROX_SPECTRUM(emb, 3, ell=8) FROM t GROUP BY g", tables=T
    ).toPandas()
    assert len(out) == 6
    for g in ("x", "y"):
        lam = _truth(g)[:3]
        sub = out[out["group"] == g].sort_values("component")
        sq = sub["sq_singular_value"].to_numpy()
        delta = sub["cov_err_bound"].to_numpy()
        tol = 1e-9 * np.abs(lam) + 1e-9
        assert (sq <= lam + tol).all() and (lam <= sq + delta + tol).all()

    # states route (base-free) + auto-selection + ell accuracy floor
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark,
        f"CREATE SKETCHES fs FROM {base} KINDS fd(emb, d={d}, ell=8) GROUP BY g",
        catalog=cat,
    )
    got = approx_sql(
        spark, "SELECT APPROX_SPECTRUM(emb, 2) FROM t GROUP BY g",
        tables={"t": "/nonexistent"}, catalog=cat, catalog_key="fs",
    ).toPandas()
    assert len(got) == 4
    with pytest.raises(ValueError, match="no fd sketch"):
        # ell=64 demands tighter Δ than the registered ell=8 achieves
        approx_sql(
            spark, "SELECT APPROX_SPECTRUM(emb, 2, ell=64) FROM t GROUP BY g",
            tables=T, catalog=cat, catalog_key="fs",
        )
    with pytest.raises(ValueError, match="no fd sketch"):
        approx_sql(
            spark, "SELECT APPROX_SPECTRUM(emb, 2, d=32) FROM t GROUP BY g",
            tables=T, catalog=cat, catalog_key="fs",
        )
    # alias renames both the estimate and the bound
    al = approx_sql(
        spark, "SELECT APPROX_SPECTRUM(emb, 2, ell=8) AS lam FROM t GROUP BY g",
        tables=T,
    ).toPandas()
    assert {"lam", "lam_err"} <= set(al.columns)
    # multi-agg refusal (multi-row shape)
    with pytest.raises(ValueError, match="multiple rows per group"):
        approx_sql(
            spark,
            "SELECT APPROX_SPECTRUM(emb, 2, ell=8), APPROX_COUNT(0.5) FROM t",
            tables=T,
        )
    with pytest.raises(ValueError, match="positive integer"):
        approx_sql(spark, "SELECT APPROX_SPECTRUM(emb, 0.5) FROM t", tables=T)


def test_fd_streaming_and_checkpoint_resume(spark, tmp_path):
    """fd rides the generic spec machinery: a streamed build's states hold
    the same exact bracket as a batch build (bytes may differ — fd merges
    are order-sensitive like KLL/t-digest — but the certificate always
    holds), and a checkpointed build resumed after an injected failure is
    BYTE-identical to a clean run (canonical merge order)."""
    import os

    import pandas as pd

    from sketchlib.sketches.base import deserialize as de
    from sketchlib.spark import SketchSpec
    from sketchlib.spark.checkpoint import build_with_checkpoint
    from sketchlib.spark.streaming import stream_build

    d = 12
    M = _data(n=600, d=d, seed=21)
    pdf = pd.DataFrame(
        {"g": ["x"] * 300 + ["y"] * 300, "emb": [r.astype(np.float32) for r in M]}
    )
    base = str(tmp_path / "t")
    spark.createDataFrame(pdf).repartition(4).write.parquet(base)
    specs = [SketchSpec("sp", "fd", "emb", {"d": d, "ell": 8})]

    # streaming sink == same bracket as batch
    schema = spark.read.parquet(base).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(base)
    )
    query, sink = stream_build(
        stream, specs, str(tmp_path / "ss"), group_by="g",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    query.awaitTermination(120)
    got = {r["group"]: de(bytes(r["state"])) for r in sink.states(spark).collect()}
    for g in ("x", "y"):
        rows = np.stack(pdf.loc[pdf["g"] == g, "emb"].to_numpy()).astype(np.float64)
        lam = np.linalg.eigvalsh(rows.T @ rows)[::-1][:3]
        sq, delta = got[g].spectrum(3)
        tol = 1e-9 * np.abs(lam) + 1e-9
        assert (sq <= lam + tol).all() and (lam <= sq + delta + tol).all()
        assert got[g].n_items == 300

    # checkpoint resume byte-identity
    def _smap(df):
        return {(r["group"], r["sketch"]): bytes(r["state"]) for r in df.collect()}

    clean = _smap(
        build_with_checkpoint(
            spark, base, specs, str(tmp_path / "c0"), group_by="g",
            target_bytes=1 << 14,
        )
    )
    ck = str(tmp_path / "c1")
    os.environ["SKETCHLIB_FAIL_PARTS"] = "1"
    try:
        with pytest.raises(Exception, match="injected failure"):
            build_with_checkpoint(
                spark, base, specs, ck, group_by="g", target_bytes=1 << 14
            ).collect()
    finally:
        del os.environ["SKETCHLIB_FAIL_PARTS"]
    resumed = _smap(
        build_with_checkpoint(
            spark, base, specs, ck, group_by="g", target_bytes=1 << 14
        )
    )
    assert resumed == clean


def test_fd_ddl_lifecycle(spark, tmp_path):
    import pandas as pd

    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.spark.query import load_states
    from sketchlib.sql import approx_sql

    d = 12
    M = _data(n=300, d=d, seed=3)
    pdf = pd.DataFrame(
        {"g": ["x"] * 150 + ["y"] * 150, "emb": [r.astype(np.float32) for r in M]}
    )
    base = str(tmp_path / "t")
    spark.createDataFrame(pdf).repartition(3).write.parquet(base)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    approx_sql(
        spark,
        f"CREATE SKETCHES es FROM {base} KINDS fd(emb, d={d}, ell=8) GROUP BY g",
        catalog=cat,
    )
    st_ = load_states(cat.states("es"))
    assert {g for g, _ in st_} == {"x", "y"}
    for (g, _), sk in st_.items():
        rows = np.stack(pdf.loc[pdf["g"] == g, "emb"].to_numpy()).astype(np.float64)
        lam = np.linalg.eigvalsh(rows.T @ rows)[::-1][:3]
        sq, delta = sk.spectrum(3)
        tol = 1e-9 * np.abs(lam) + 1e-9
        assert (sq <= lam + tol).all() and (lam <= sq + delta + tol).all()
    # append + refresh covers the grown corpus
    spark.createDataFrame(pdf.assign(g="x")).write.mode("append").parquet(base)
    stats = cat.refresh("es")
    assert stats["new_files"] > 0
    sk2 = {g: s for (g, _), s in load_states(cat.states("es")).items()}
    assert sk2["x"].n_items == 150 + 300
    # d is required
    with pytest.raises(ValueError, match="requires d"):
        approx_sql(
            spark,
            f"CREATE SKETCHES e2 FROM {base} KINDS fd(emb) GROUP BY g",
            catalog=cat,
        )
