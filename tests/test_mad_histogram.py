"""mad_df + equidepth_histogram_df: single-state robust spread and
equal-mass binning served from KLL/t-digest registrations.

The MAD oracle here is the EXACT MAD around the served median m̂ — the
quantity the bracket certifies (see mad_df docstring): t* = the exact
median of |x − m̂|. The bracket [mad_lo, mad_hi] must contain it.
"""

import numpy as np
import pytest

from sketchlib import KLL, TDigest
from sketchlib.spark.build import SketchSpec, build_sketches
from sketchlib.spark.query import equidepth_histogram_df, mad_df


@pytest.fixture(scope="module")
def lognormal():
    rng = np.random.default_rng(23)
    return rng.lognormal(np.log(100), 0.8, 200_000)


def _exact_mad_around(data, center):
    return float(np.median(np.abs(data - center)))


@pytest.mark.parametrize("cls,kw", [(KLL, {"k": 400}), (TDigest, {"compression": 400})])
def test_mad_bracket_contains_exact_local(cls, kw, lognormal):
    """Pure-sketch check (no Spark): bracket contains the exact MAD-around-m̂
    on a skewed distribution where MAD << stddev."""
    sk = cls(**kw).update_values(lognormal)
    eps = sk.error_bound()
    m = float(sk.quantiles(np.array([0.5]))[0])
    from sketchlib.spark.query import _mass_inverse, _window_mass_fn

    v0, v1 = sk.quantiles(np.array([0.0, 1.0]))
    t_max = max(v1 - m, m - v0) * (1 + 1e-9) + 1e-12
    mass = _window_mass_fn(sk)
    t_lo = _mass_inverse(mass, m, 0.5 - 2 * eps, t_max)
    t_hi = _mass_inverse(mass, m, 0.5 + 2 * eps, t_max)
    exact = _exact_mad_around(lognormal, m)
    assert t_lo - 1e-9 <= exact <= t_hi + 1e-9, (t_lo, exact, t_hi)
    # the bracket is tight-ish, not vacuous: on lognormal it must separate
    # MAD from the (tail-inflated) standard deviation
    assert t_hi < float(np.std(lognormal))


def test_mad_df_serves_per_group(spark):
    import pandas as pd

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "g": np.repeat(["narrow", "wide"], 50_000),
            "x": np.concatenate(
                [rng.normal(10, 1, 50_000), rng.normal(10, 8, 50_000)]
            ),
        }
    )
    df = spark.createDataFrame(pdf)
    states = build_sketches(df, [SketchSpec("q", "kll", "x", {"k": 400})], group_by="g")
    out = {r["group"]: r for r in mad_df(spark, states, "q").collect()}
    assert set(out) == {"narrow", "wide"}
    for g, sigma in (("narrow", 1.0), ("wide", 8.0)):
        r = out[g]
        # MAD of a normal = 0.6745 sigma; the estimate must land nearby and
        # inside its own served bracket
        assert r["mad_lo"] - 1e-9 <= r["mad_est"] <= r["mad_hi"] + 1e-9
        assert abs(r["mad_est"] - 0.6745 * sigma) < 0.25 * sigma
        exact = _exact_mad_around(
            pdf.loc[pdf["g"] == g, "x"].to_numpy(), r["median_est"]
        )
        assert r["mad_lo"] - 1e-9 <= exact <= r["mad_hi"] + 1e-9


def test_mad_df_distributed_equals_driver(spark):
    import pandas as pd

    n = 30_000
    pdf = pd.DataFrame(
        {"k": (np.arange(n) % 1500).astype(str), "x": np.arange(n, dtype=np.float64) % 997}
    )
    df = spark.createDataFrame(pdf)
    states = build_sketches(df, [SketchSpec("q", "kll", "x", {"k": 200})], group_by="k")
    cols = ["group", "median_est", "mad_est", "mad_lo", "mad_hi"]
    got = sorted(tuple(r[c] for c in cols) for r in mad_df(spark, states, "q", distributed=True).collect())
    want = sorted(tuple(r[c] for c in cols) for r in mad_df(spark, states, "q", distributed=False).collect())
    assert got == want and len(got) == 1500


def test_equidepth_edges_have_equal_mass(spark):
    import pandas as pd

    rng = np.random.default_rng(41)
    data = rng.lognormal(np.log(100), 0.8, 100_000)
    pdf = pd.DataFrame({"g": "all", "x": data})
    df = spark.createDataFrame(pdf)
    states = build_sketches(df, [SketchSpec("q", "kll", "x", {"k": 400})], group_by="g")
    n_bins = 10
    bins = equidepth_histogram_df(spark, states, "q", n_bins).collect()
    assert len(bins) == n_bins
    eps = bins[0]["rank_err_bound"]
    srt = np.sort(data)
    for r in sorted(bins, key=lambda r: r["bin"]):
        # true mass of (lo, hi] (first bin also includes its lo == min)
        mass = (
            np.searchsorted(srt, r["hi"], side="right")
            - np.searchsorted(srt, r["lo"], side="right")
        ) / len(srt)
        if r["bin"] == 0:
            mass += (srt == r["lo"]).sum() / len(srt)
        assert abs(mass - 1.0 / n_bins) <= 2 * eps + 1e-12, (r["bin"], mass)
    # edges tile the data range: consecutive his equal next los
    ordered = sorted(bins, key=lambda r: r["bin"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["hi"] == b["lo"]


def test_equidepth_rejects_bad_bins(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"g": ["a"], "x": [1.0]}))
    states = build_sketches(df, [SketchSpec("q", "kll", "x", {"k": 200})], group_by="g")
    with pytest.raises(ValueError, match="n_bins"):
        equidepth_histogram_df(spark, states, "q", 0)


def test_cli_mad_and_equidepth(seq_tiny_dir, tmp_path):
    """CLI surface: `query --kind mad` and `--kind equidepth --bins` serve
    the new reports from persisted states as strict JSON lines."""
    import json
    import subprocess
    import sys

    out_dir = str(tmp_path / "states")
    r = subprocess.run(
        [
            sys.executable, "-m", "sketchlib.cli", "build",
            "--input", seq_tiny_dir, "--group-by", "source",
            "--sketches", 'kll_len:kll:n_tok:{"k": 200}',
            "--out", out_dir,
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rm = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "query", "--states", out_dir,
         "--sketch", "kll_len", "--kind", "mad"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert rm.returncode == 0, rm.stderr[-2000:]
    mads = [json.loads(l) for l in rm.stdout.splitlines() if l.startswith("{")]
    assert {m["group"] for m in mads} == {"web", "books", "code", "wiki", "forums"}
    for m in mads:
        assert m["mad_lo"] - 1e-9 <= m["mad_est"] <= m["mad_hi"] + 1e-9

    rh = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "query", "--states", out_dir,
         "--sketch", "kll_len", "--kind", "equidepth", "--bins", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert rh.returncode == 0, rh.stderr[-2000:]
    bins = [json.loads(l) for l in rh.stdout.splitlines() if l.startswith("{")]
    assert len(bins) == 5 * 4
    assert all(b["target_frac"] == 0.25 for b in bins)


def test_mad_bracket_covers_tie_atom_on_left_edge():
    """Discrete tie atoms sitting exactly at m̂ − t*: a HALF-OPEN window
    (two right-ranks) would exclude the left-edge atom and the inversion
    would overshoot to the next atom (here 2× the true MAD) — the closed
    window _window_mass_fn serves is the same quantity as the order
    statistic, so the bracket contains the exact MAD (round-5 review)."""
    from sketchlib.spark.query import _mass_inverse, _window_mass_fn

    data = np.concatenate(
        [np.zeros(450), np.full(100, 10.0), np.full(450, 30.0)]
    )  # median 10; closed MAD-around-10 = 10 (the 0-atom), half-open would say 20
    sk = KLL(k=4096).update_values(data)
    eps = sk.error_bound()
    m = float(sk.quantiles(np.array([0.5]))[0])
    assert m == 10.0
    exact = _exact_mad_around(data, m)
    assert exact == 10.0
    mass = _window_mass_fn(sk)
    v0, v1 = sk.quantiles(np.array([0.0, 1.0]))
    t_max = max(v1 - m, m - v0) * (1 + 1e-9) + 1e-12
    t_lo = _mass_inverse(mass, m, max(0.5 - 2 * eps, 0.0), t_max)
    t_hi = _mass_inverse(mass, m, min(0.5 + 2 * eps, 1.0), t_max)
    assert t_lo - 1e-9 <= exact <= t_hi + 1e-9, (t_lo, exact, t_hi)
    assert t_hi < 20.0  # the half-open inversion's answer is excluded


@pytest.mark.parametrize("cls,kw", [(KLL, {"k": 400}), (TDigest, {"compression": 400})])
def test_trimmed_mean_bracket_contains_exact_local(cls, kw, lognormal):
    """First-order bracket contains the exact trimmed mean on skewed data,
    and trimming actually rejects the tail (trimmed << plain mean)."""
    from sketchlib.spark.query import _items_weights, _window_mean

    sk = cls(**kw).update_values(lognormal)
    eps = sk.error_bound()
    v, w = _items_weights(sk)
    cum = np.cumsum(np.asarray(w, dtype=np.float64))
    total = float(cum[-1])
    est = _window_mean(v, cum, total, 0.05, 0.95)
    b_lo = _window_mean(v, cum, total, 0.05 - eps, 0.95 - eps)
    b_hi = _window_mean(v, cum, total, 0.05 + eps, 0.95 + eps)
    s = np.sort(lognormal)
    n = len(s)
    exact = float(s[int(np.floor(0.05 * n)):int(np.floor(0.95 * n))].mean())
    assert b_lo - 1e-9 <= exact <= b_hi + 1e-9, (b_lo, exact, b_hi)
    assert b_lo <= est <= b_hi
    assert b_hi < float(lognormal.mean())  # the tail is actually excluded


def test_trimmed_mean_df_serves_per_group(spark):
    import pandas as pd

    from sketchlib.spark.query import trimmed_mean_df

    rng = np.random.default_rng(17)
    base = rng.normal(50, 5, 40_000)
    spiked = np.concatenate([rng.normal(50, 5, 39_600), np.full(400, 1e6)])
    pdf = pd.DataFrame(
        {"g": np.repeat(["clean", "spiked"], 40_000), "x": np.concatenate([base, spiked])}
    )
    states = build_sketches(
        spark.createDataFrame(pdf), [SketchSpec("q", "kll", "x", {"k": 400})], group_by="g"
    )
    out = {r["group"]: r for r in trimmed_mean_df(spark, states, "q", 0.05, 0.95).collect()}
    assert set(out) == {"clean", "spiked"}
    for g in ("clean", "spiked"):
        r = out[g]
        assert r["tm_lo"] - 1e-9 <= r["trimmed_mean"] <= r["tm_hi"] + 1e-9
        # 1% outliers at 1e6 must NOT drag the trimmed mean (plain mean ≈ 10050)
        assert abs(r["trimmed_mean"] - 50.0) < 2.0, (g, r["trimmed_mean"])


def test_trimmed_mean_rejections(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from sketchlib.spark.query import trimmed_mean_df

    df = spark.createDataFrame(pd.DataFrame({"g": ["a"] * 100, "x": np.arange(100.0)}))
    states = build_sketches(df, [SketchSpec("q", "kll", "x", {"k": 200})], group_by="g")
    with pytest.raises(ValueError, match="lo < hi"):
        trimmed_mean_df(spark, states, "q", 0.9, 0.1)
    with pytest.raises(Exception, match="narrower than twice"):
        trimmed_mean_df(spark, states, "q", 0.5, 0.5001).collect()
    # non-quantile states refuse with a pointer, not an AttributeError
    mg_states = build_sketches(
        df.withColumn("t", F.col("x").cast("long")),
        [SketchSpec("m", "mg", "t", {"k": 16})], group_by="g",
    )
    with pytest.raises(Exception, match="weighted item view"):
        trimmed_mean_df(spark, mg_states, "m").collect()


def test_trimmed_mean_distributed_equals_driver(spark):
    import pandas as pd

    from sketchlib.spark.query import trimmed_mean_df

    n = 30_000
    pdf = pd.DataFrame(
        {"k": (np.arange(n) % 1500).astype(str), "x": np.arange(n, dtype=np.float64) % 997}
    )
    states = build_sketches(
        spark.createDataFrame(pdf), [SketchSpec("q", "kll", "x", {"k": 200})], group_by="k"
    )
    cols = ["group", "trimmed_mean", "tm_lo", "tm_hi"]
    got = sorted(
        tuple(r[c] for c in cols)
        for r in trimmed_mean_df(spark, states, "q", distributed=True).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in trimmed_mean_df(spark, states, "q", distributed=False).collect()
    )
    assert got == want and len(got) == 1500
