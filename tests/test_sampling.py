"""Verdict sample-type analogs (SURVEY.md §1.1): scale-up correctness and CI
coverage for uniform / universe / stratified sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.sampling import (
    approx_agg_stratified,
    approx_agg_uniform,
    approx_count_distinct_universe,
    stratified_sample,
    uniform_sample,
    universe_sample,
)

Z_TEST = 3.29  # 99.9% two-sided — keeps seeded-sample tests deterministic-robust


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").cache()


def test_uniform_sample_size(spark, li):
    n = li.count()
    s = uniform_sample(li, 0.1, seed=7).count()
    assert abs(s - 0.1 * n) <= 4 * np.sqrt(0.1 * 0.9 * n)


def test_approx_agg_uniform_within_ci(spark, li):
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_extendedprice").alias("s"), F.avg("l_extendedprice").alias("a"))
        .collect()
    }
    approx = approx_agg_uniform(li, "l_returnflag", "l_extendedprice", 0.1, seed=7, z=Z_TEST).collect()
    assert len(approx) == len(exact)
    for r in approx:
        e = exact[r["l_returnflag"]]
        assert abs(r["est_count"] - e["n"]) <= r["count_err"], (r, e["n"])
        assert abs(r["est_sum"] - e["s"]) <= r["sum_err"], (r, e["s"])
        assert abs(r["est_avg"] - e["a"]) <= r["avg_err"] + 1e-9, (r, e["a"])
        # err columns behave: relative count error at p=0.1, n~20k is small
        assert r["count_err"] / e["n"] < 0.1


def test_universe_sample_is_domain_subsample(spark, li):
    """Universe sampling keeps ALL rows of a kept key — the property uniform
    sampling lacks and the reason it exists (A11)."""
    s = universe_sample(li, "l_partkey", 0.2, seed=7)
    per_key_all = dict(li.groupBy("l_partkey").count().collect())
    for k, c in s.groupBy("l_partkey").count().collect():
        assert per_key_all[k] == c  # no partial keys


def test_approx_count_distinct_universe_within_ci(spark, li):
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    r = approx_count_distinct_universe(li, "l_partkey", 0.2, seed=7, z=Z_TEST).collect()[0]
    assert abs(r["est_distinct"] - exact) <= r["distinct_err"], (r, exact)


def test_stratified_keeps_small_groups(spark, seq_tiny_dir):
    df = spark.read.parquet(seq_tiny_dir)
    fractions = {"web": 0.05, "books": 0.5, "code": 1.0, "wiki": 1.0, "forums": 1.0}
    s = stratified_sample(df, "source", fractions, seed=7)
    counts = dict(s.groupBy("source").count().collect())
    full = dict(df.groupBy("source").count().collect())
    for g in ("code", "wiki", "forums"):
        assert counts[g] == full[g]  # fraction 1.0 -> exact survival
    assert counts["web"] < full["web"] * 0.15


def test_approx_agg_stratified_within_ci(spark, seq_tiny_dir):
    df = spark.read.parquet(seq_tiny_dir)
    fractions = {"web": 0.2, "books": 1.0, "code": 1.0, "wiki": 1.0, "forums": 1.0}
    exact = {
        r["source"]: r
        for r in df.groupBy("source").agg(F.count("*").alias("n"), F.sum("n_tok").alias("s")).collect()
    }
    for r in approx_agg_stratified(df, "source", "n_tok", fractions, seed=7, z=Z_TEST).collect():
        e = exact[r["source"]]
        assert abs(r["est_count"] - e["n"]) <= r["count_err"] + 1e-9
        assert abs(r["est_sum"] - e["s"]) <= r["sum_err"] + 1e-9
        if r["source"] != "web":
            assert r["est_count"] == e["n"] and r["count_err"] == 0.0  # p=1 -> exact


def test_approx_join_agg_probability_composes(spark):
    """Universe⋈universe on the shared key: scale-up is 1/p, NOT 1/p² —
    a p² estimator would be ~5× off at p=0.2, far outside the CI."""
    from sketchlib.spark.sampling import approx_join_agg

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    est = approx_join_agg(
        o, c, "o_custkey", "c_custkey", value_col="o_totalprice", ratio=0.2, seed=7, z=Z_TEST
    ).collect()[0]
    exact = (
        o.join(c, o.o_custkey == c.c_custkey)
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()[0]
    )
    assert abs(est["est_count"] - exact["n"]) <= est["count_err"]
    assert abs(est["est_sum"] - exact["s"]) <= est["sum_err"]
    # composition sanity: the p² reading would be est/p ≈ 5× exact
    assert est["est_count"] < 2 * exact["n"]


def test_approx_join_agg_grouped(spark):
    """Per-group joined estimates: exact answers inside each group's CI."""
    from sketchlib.spark.sampling import approx_join_agg

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    est = {
        r["c_mktsegment"]: r
        for r in approx_join_agg(
            o, c, "o_custkey", "c_custkey", value_col="o_totalprice",
            ratio=0.25, seed=7, z=Z_TEST, group_by="c_mktsegment",
        ).collect()
    }
    exact = {
        r["c_mktsegment"]: r
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    assert set(est) == set(exact)
    for g, r in est.items():
        assert abs(r["est_count"] - exact[g]["n"]) <= r["count_err"], g
        assert abs(r["est_sum"] - exact[g]["s"]) <= r["sum_err"], g


def test_stratified_avg_ratio_estimator(spark, seq_tiny_dir):
    """Stratified APPROX_AVG (VERDICT r2 #7): per-stratum ratio estimator
    with that stratum's own fraction; a stratum sampled at 1.0 is exact with
    zero error, sampled strata cover the true average at 3σ."""
    from sketchlib.spark.sampling import approx_agg_stratified

    df = spark.read.parquet(seq_tiny_dir)
    fractions = {"web": 0.3, "books": 1.0, "code": 0.5, "wiki": 1.0, "forums": 0.4}
    got = approx_agg_stratified(df, "source", "n_tok", fractions, seed=11).toPandas()
    exact = df.groupBy("source").agg(F.avg("n_tok").alias("true_avg")).toPandas()
    m = got.merge(exact, on="source")
    assert len(m) == 5 and {"est_avg", "avg_err"} <= set(m.columns)
    full = m[m["source"].isin(["books", "wiki"])]
    assert (full["avg_err"] == 0).all()
    assert np.allclose(full["est_avg"], full["true_avg"])
    sampled = m[~m["source"].isin(["books", "wiki"])]
    assert (
        (sampled["est_avg"] - sampled["true_avg"]).abs()
        <= sampled["avg_err"] * (3 / 1.96) + 1e-9
    ).all()


def test_mixture_sample(spark, seq_tiny_dir):
    """Data-mixture composition: achieved per-source token sums land within
    the Bernoulli CLT bound of their weight targets; sources over their
    inventory are capped+flagged; unlisted sources are excluded."""
    import math

    from sketchlib.spark.sampling import mixture_sample

    df = spark.read.parquet(seq_tiny_dir)
    total = df.agg(F.sum("n_tok")).collect()[0][0]
    weights = {"web": 0.5, "books": 0.3, "code": 0.2}
    budget = int(total * 0.2)
    sampled, report = mixture_sample(df, weights, budget, seed=11)
    rep = {r["source"]: r for r in report.collect()}
    assert set(rep) == set(weights)
    got = {r["source"]: r["tok"] for r in
           sampled.groupBy("source").agg(F.sum("n_tok").alias("tok")).collect()}
    assert set(got) <= set(weights)  # unlisted sources excluded
    for s, r in rep.items():
        if r["capped"]:
            # capped = fraction 1.0 → the whole inventory comes through
            assert got.get(s, 0) == r["available_tokens"]
            continue
        # CLT bound on the sampled token sum: var = f(1-f)·Σ len²
        f = r["fraction"]
        sumsq = df.filter(F.col("source") == s).agg(F.sum(F.col("n_tok") ** 2)).collect()[0][0]
        tol = 3.29 * math.sqrt(f * (1 - f) * sumsq)
        assert abs(got.get(s, 0) - r["target_tokens"]) <= tol + 1e-9, (s, got.get(s), r)

    # a 'books'-heavy ask beyond inventory gets capped and flagged
    _, rep2 = mixture_sample(df, {"books": 0.9, "web": 0.1}, int(total * 0.9), seed=11)
    assert {r["source"]: r["capped"] for r in rep2.collect()}["books"] is True


def test_approx_moments_within_ci(spark, li):
    """APPROX_VARIANCE/STDDEV kernel (moments=True): per-group estimates of
    the table's variance/stddev fall within the delta-method CI, and the
    relative error is small at p=0.5 over ~20k-row groups."""
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(F.var_samp("l_extendedprice").alias("v"), F.stddev_samp("l_extendedprice").alias("sd"))
        .collect()
    }
    approx = approx_agg_uniform(
        li, "l_returnflag", "l_extendedprice", 0.5, seed=7, z=Z_TEST, moments=True
    ).collect()
    assert len(approx) == len(exact)
    for r in approx:
        e = exact[r["l_returnflag"]]
        assert abs(r["est_variance"] - e["v"]) <= r["variance_err"], (r, e["v"])
        assert abs(r["est_stddev"] - e["sd"]) <= r["stddev_err"], (r, e["sd"])
        assert r["variance_err"] / e["v"] < 0.1
        assert r["stddev_err"] / e["sd"] < 0.05


def test_approx_moments_full_ratio_is_exact(spark, li):
    """At p=1.0 the sample IS the table: est_variance equals var_samp and
    the (1-p) finite-population factor zeroes both error bounds."""
    from sketchlib.spark.sampling import approx_agg_from_uniform_sample

    exact = li.agg(F.var_samp("l_extendedprice")).collect()[0][0]
    r = approx_agg_from_uniform_sample(li, None, "l_extendedprice", 1.0, moments=True).collect()[0]
    assert r["est_variance"] == pytest.approx(exact, rel=1e-9)
    assert r["variance_err"] == pytest.approx(0.0, abs=1e-6)
    assert r["est_stddev"] == pytest.approx(exact ** 0.5, rel=1e-9)


def test_approx_moments_degenerate_groups(spark):
    """n=1 groups carry no dispersion information (NULL variance/bounds);
    a constant column has variance 0 and a NULL stddev_err (the delta
    linearization through sqrt is undefined at 0)."""
    from sketchlib.spark.sampling import approx_agg_from_uniform_sample

    df = spark.createDataFrame(
        [("solo", 3.0)] + [("const", 5.0)] * 50, "g string, v double"
    )
    rows = {
        r["g"]: r
        for r in approx_agg_from_uniform_sample(df, "g", "v", 1.0, moments=True).collect()
    }
    assert rows["solo"]["est_variance"] is None
    assert rows["solo"]["variance_err"] is None
    assert rows["const"]["est_variance"] == pytest.approx(0.0, abs=1e-12)
    assert rows["const"]["stddev_err"] is None


def test_approx_bivariate_within_ci(spark):
    """APPROX_COVAR/CORR kernel: strongly- and weakly-correlated synthetic
    pairs both land inside the CLT / Fisher-z CIs, grouped."""
    from sketchlib.spark.sampling import approx_bivariate_uniform

    rng = np.random.default_rng(17)
    n = 40_000
    x = rng.uniform(0, 10, n)
    strong = 2 * x + rng.normal(0, 2, n)   # corr ≈ 0.94
    weak = rng.normal(0, 5, n)             # corr ≈ 0
    import pandas as pd
    pdf = pd.concat([
        pd.DataFrame({"g": "strong", "x": x, "y": strong}),
        pd.DataFrame({"g": "weak", "x": x, "y": weak}),
    ], ignore_index=True)
    df = spark.createDataFrame(pdf)
    exact = {
        r["g"]: r
        for r in df.groupBy("g").agg(
            F.covar_samp("x", "y").alias("cv"), F.corr("x", "y").alias("cr")
        ).collect()
    }
    rows = approx_bivariate_uniform(df, "g", "x", "y", 0.4, seed=7, z=Z_TEST).collect()
    assert len(rows) == 2
    for r in rows:
        e = exact[r["g"]]
        assert abs(r["est_covar"] - e["cv"]) <= r["covar_err"], (r, e["cv"])
        assert abs(r["est_corr"] - e["cr"]) <= r["corr_err"], (r, e["cr"])
    strong_r = next(r for r in rows if r["g"] == "strong")
    assert strong_r["est_corr"] > 0.9 and strong_r["corr_err"] < 0.01


def test_approx_bivariate_full_ratio_and_degenerate(spark):
    """p=1 → exact covar/corr with zero error; a constant marginal has no
    defined correlation (NULL), n=1 group reports NULL everywhere."""
    from sketchlib.spark.sampling import approx_bivariate_from_uniform_sample

    df = spark.createDataFrame(
        [("a", float(i), float(3 * i + 1)) for i in range(100)]
        + [("const", float(i), 7.0) for i in range(50)]
        + [("solo", 1.0, 2.0)],
        "g string, x double, y double",
    )
    rows = {
        r["g"]: r
        for r in approx_bivariate_from_uniform_sample(df, "g", "x", "y", 1.0).collect()
    }
    exact_cv = df.filter("g='a'").agg(F.covar_samp("x", "y")).collect()[0][0]
    assert rows["a"]["est_covar"] == pytest.approx(exact_cv, rel=1e-9)
    assert rows["a"]["covar_err"] == pytest.approx(0.0, abs=1e-9)
    assert rows["a"]["est_corr"] == pytest.approx(1.0, abs=1e-9)
    assert rows["a"]["corr_err"] == pytest.approx(0.0, abs=1e-9)
    assert rows["const"]["est_corr"] is None
    assert rows["const"]["corr_err"] is None
    assert rows["solo"]["est_covar"] is None
    assert rows["solo"]["est_corr"] is None


def test_approx_moments_numerically_stable(spark):
    """Review findings r5: (a) integer columns whose 4th power overflows
    int64 and (b) double columns with mean >> stddev (catastrophic
    cancellation in a raw power-sum m4) — the stable central-moment
    aggregates must keep estimates AND bounds sane in both regimes."""
    from sketchlib.spark.sampling import (
        approx_agg_from_uniform_sample,
        approx_bivariate_from_uniform_sample,
    )

    rng = np.random.default_rng(3)
    big_ints = rng.integers(90_000, 110_000, 30_000)  # x^4 ~ 1e20 > 2^63
    shifted = 1e9 + rng.normal(0.0, 1000.0, 30_000)   # mean/stddev = 1e6
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({
        "iv": big_ints.astype("int64"), "sv": shifted,
    }))
    r = approx_agg_from_uniform_sample(df, None, "iv", 1.0, moments=True).collect()[0]
    exact_iv = float(np.var(big_ints, ddof=1))
    assert r["est_variance"] == pytest.approx(exact_iv, rel=1e-6)
    assert r["variance_err"] == pytest.approx(0.0, abs=1e-3)  # p=1 → FPC zero

    r2 = approx_agg_from_uniform_sample(df, None, "sv", 0.5, moments=True, z=Z_TEST).collect()[0]
    exact_sv = float(np.var(shifted, ddof=1))
    assert abs(r2["est_variance"] - exact_sv) <= r2["variance_err"]
    # a cancellation-corrupted bound is either ~0 or wildly inflated;
    # the real relative se at n=15k is a few percent
    assert 0 < r2["variance_err"] / exact_sv < 0.2

    df2 = spark.createDataFrame(pd.DataFrame({
        "x": shifted, "y": shifted * 2.0 + rng.normal(0, 500.0, 30_000),
    }))
    b = approx_bivariate_from_uniform_sample(df2, None, "x", "y", 0.5, z=Z_TEST).collect()[0]
    pdf2 = pd.DataFrame({"x": shifted})
    exact_cv = float(np.cov(shifted, shifted * 2.0, ddof=1)[0, 1])  # cov(x, 2x) part dominates
    assert b["est_corr"] > 0.9
    assert 0 < b["corr_err"] < 0.05
    assert b["covar_err"] > 0  # stable conservative bound, not cancelled to 0
    assert abs(b["est_covar"] - exact_cv) <= max(b["covar_err"], 0.05 * exact_cv)


def _naive_budget_prefix(rows, budget_of):
    """Reference: maximal prefix per source in (score DESC, id ASC) order
    with cumulative n_tok <= budget — what the naive window computes."""
    from collections import defaultdict

    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    kept = set()
    for s, rs in by_src.items():
        bud = budget_of(s)
        cum = 0
        for r in sorted(rs, key=lambda r: (-r["score"], r["doc_id"])):
            cum += r["n_tok"]
            if cum > bud:
                break
            kept.add(r["doc_id"])
    return kept


def test_select_within_budget_matches_naive_window(spark):
    """The histogram + boundary-bucket plan must return EXACTLY the naive
    per-source window's prefix — including duplicate scores, ties broken by
    id, a source that fully fits, and a dict budget excluding a source."""
    import random

    from sketchlib.spark.sampling import select_within_budget

    rng = random.Random(7)
    rows = [
        {"doc_id": i, "source": f"s{i % 3}",
         "score": float(rng.randrange(50)),  # few distinct scores -> many ties
         "n_tok": rng.randrange(5, 40)}
        for i in range(600)
    ]
    df = spark.createDataFrame(
        [(r["doc_id"], r["source"], r["score"], r["n_tok"]) for r in rows],
        "doc_id long, source string, score double, n_tok int",
    )

    got = {r["doc_id"] for r in select_within_budget(df, 900, "score", n_buckets=16).collect()}
    assert got == _naive_budget_prefix(rows, lambda s: 900)

    # dict budgets: s2 absent -> excluded entirely; s0 huge -> fully kept
    buds = {"s0": 10**9, "s1": 500}
    got2 = select_within_budget(df, buds, "score", n_buckets=16).collect()
    ids2 = {r["doc_id"] for r in got2}
    assert ids2 == _naive_budget_prefix(rows, lambda s: buds.get(s, 0))
    assert {r["source"] for r in got2} == {"s0", "s1"}
    assert sum(1 for r in rows if r["source"] == "s0") == sum(
        1 for r in got2 if r["source"] == "s0"
    )

    # degenerate: one identical score everywhere -> single bucket, order by id
    same = spark.createDataFrame(
        [(i, "x", 1.0, 10) for i in range(20)],
        "doc_id long, source string, score double, n_tok int",
    )
    kept = sorted(r["doc_id"] for r in select_within_budget(same, 55, "score").collect())
    assert kept == [0, 1, 2, 3, 4]  # 5 docs x 10 tokens <= 55, 6th overflows

    # zero budget keeps nothing; schema is the input's
    assert select_within_budget(df, 0, "score").count() == 0
    assert select_within_budget(df, 0, "score").columns == df.columns

    with pytest.raises(ValueError, match="non-negative"):
        select_within_budget(df, -1, "score")


def test_upsample_mixture_deterministic_replication(spark):
    """Copy counts are a pure function of (id, seed, fraction): floor(f)
    copies + one more iff the 60-bit md5 key is under the remainder
    boundary — verified against an independent hashlib reference. Unlisted
    sources are excluded; sub-unity fractions drop by the same keyed coin;
    NULL ids get floor(f) copies only."""
    import hashlib

    from sketchlib.spark.sampling import upsample_mixture

    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(200)] + [(None, "a")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    fr = {"a": 2.25, "b": 0.5, "c": 1.0}
    out = upsample_mixture(df, fr, seed=3).collect()
    assert [c for c in out[0].asDict()] == ["doc_id", "source", "copy"]

    def key(i):
        return int(hashlib.md5(f"{i}:3".encode()).hexdigest()[:15], 16)

    def want_copies(i, s):
        f = fr.get(s)
        if f is None:
            return 0
        base = int(f)
        if i is None:
            return base
        return base + (1 if key(i) < round((f - base) * (1 << 60)) else 0)

    from collections import Counter

    got = Counter((r["doc_id"], r["source"]) for r in out)
    for i, s in rows:
        assert got.get((i, s), 0) == want_copies(i, s), (i, s)
    # copy indexes are 0..n-1 per doc
    for (i, s), n in got.items():
        copies = sorted(r["copy"] for r in out if r["doc_id"] == i and r["source"] == s)
        assert copies == list(range(n))
    # the coin actually splits: some a-docs got 3 copies, some 2; some
    # b-docs survived, some dropped
    a_counts = {got[(i, "a")] for i, s in rows if s == "a" and i is not None}
    assert a_counts == {2, 3}
    b_counts = {got.get((i, "b"), 0) for i, s in rows if s == "b"}
    assert b_counts == {0, 1}
    assert all(s != "d" for _, s in got)  # unlisted source excluded

    with pytest.raises(ValueError, match="non-negative"):
        upsample_mixture(df, {"a": -0.1})


def test_cap_per_group_matches_naive_window(spark):
    """The split (under-cap pass-through / over-cap-only window) must
    keep EXACTLY the naive single window's top-cap per group — including a
    NULL group, NULL scores (rank last), duplicate scores (id tie-break),
    and groups exactly AT the cap (untouched, zero shuffle path)."""
    import random

    from pyspark.sql import Window

    from sketchlib.spark.sampling import cap_per_group

    rng = random.Random(11)
    rows = []
    sizes = {"big": 400, "mid": 60, "small": 7, None: 30, "atcap": 50}
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            # coarse scores force duplicates; some NULLs in 'big'
            score = None if (g == "big" and i % 37 == 0) else float(rng.randrange(20))
            rows.append((i, g, score))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double").repartition(8)
    cap = 50

    def canon(out):
        return sorted((r["doc_id"], r["grp"], r["score"]) for r in out.collect())

    w = Window.partitionBy("grp").orderBy(F.desc_nulls_last("score"), F.asc("doc_id"))
    naive = canon(
        df.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= cap).drop("_r")
    )
    got = canon(cap_per_group(df, cap, group_col="grp", score_col="score"))
    assert got == naive
    # per-group sizes: big/mid clipped to cap, the rest (≤ cap) untouched
    from collections import Counter

    by_g = Counter(g for _, g, _ in got)
    assert by_g == {"big": 50, "mid": 50, "small": 7, None: 30, "atcap": 50}

    with pytest.raises(ValueError, match="non-negative"):
        cap_per_group(df, -1, group_col="grp")
    assert cap_per_group(df, 0, group_col="grp").count() == 0


def test_cap_per_group_coin_path_deterministic(spark):
    """Without a score the survivors are the cap smallest md5(id:seed) keys
    per group — verified against a hashlib reference, and invariant under
    repartitioning (the kept SET is a pure function of the rows)."""
    import hashlib

    from sketchlib.spark.sampling import cap_per_group

    rows = [(i, "g" if i % 3 else "h") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")

    def key(i, seed=5):
        return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:15], 16)

    want = set()
    for g in ("g", "h"):
        ids = sorted((i for i, gg in rows if gg == g), key=lambda i: (key(i), i))
        want |= set(ids[:40])

    got = {r["doc_id"] for r in cap_per_group(df, 40, group_col="grp", seed=5).collect()}
    assert got == want
    got2 = {
        r["doc_id"]
        for r in cap_per_group(df.repartition(13), 40, group_col="grp", seed=5).collect()
    }
    assert got2 == want
    # a different seed keeps a different set of the same size
    got3 = {r["doc_id"] for r in cap_per_group(df, 40, group_col="grp", seed=6).collect()}
    assert len(got3) == len(want) and got3 != want


def test_temperature_weights_identity_and_flattening(spark, seq_tiny_dir):
    """T=1 reproduces the natural proportions exactly; T<1 strictly
    flattens them (head share shrinks, tail share grows — Conneau &
    Lample 2019 §3.1); T→0 approaches uniform."""
    from sketchlib.spark.sampling import temperature_weights

    df = spark.read.parquet(seq_tiny_dir)
    r1 = {r["source"]: r for r in temperature_weights(df, 1.0).collect()}
    assert all(abs(r["weight"] - r["natural_share"]) < 1e-12 for r in r1.values())
    assert abs(sum(r["weight"] for r in r1.values()) - 1.0) < 1e-12

    shares = {s: r["natural_share"] for s, r in r1.items()}
    head = max(shares, key=shares.get)
    tail = min(shares, key=shares.get)
    assert shares[head] > shares[tail]  # fixture has skewed sources
    r07 = {r["source"]: r["weight"] for r in temperature_weights(df, 0.7).collect()}
    assert r07[head] < shares[head] and r07[tail] > shares[tail]
    # order is preserved under any positive temperature (x^T is monotone)
    assert r07[head] > r07[tail]
    r0 = {r["source"]: r["weight"] for r in temperature_weights(df, 0.01).collect()}
    assert all(abs(w - 1.0 / len(r0)) < 0.02 for w in r0.values())


def test_temperature_weights_budget_epochs_compose_with_upsample(spark, seq_tiny_dir):
    """token_budget adds (target_tokens, epochs); targets sum to the budget;
    feeding epochs into upsample_mixture lands each source within the
    per-doc replication granularity of its target — the two operators
    compose into the actual up-sampling pipeline."""
    from sketchlib.spark.sampling import temperature_weights, upsample_mixture

    df = spark.read.parquet(seq_tiny_dir)
    total = df.agg(F.sum("n_tok")).collect()[0][0]
    budget = int(total * 1.5)
    rep = {r["source"]: r for r in
           temperature_weights(df, 0.5, token_budget=budget).collect()}
    assert abs(sum(r["target_tokens"] for r in rep.values()) - budget) < 1e-6 * budget
    for r in rep.values():
        assert abs(r["epochs"] - r["target_tokens"] / r["available_tokens"]) < 1e-12

    out = upsample_mixture(df, {s: r["epochs"] for s, r in rep.items()}, seed=3)
    got = {r["source"]: r["tok"] for r in
           out.groupBy("source").agg(F.sum("n_tok").alias("tok")).collect()}
    for s, r in rep.items():
        # deterministic md5-coin replication: achieved mass tracks the target
        # within a CLT-ish bound on the fractional-copy token sum
        import math
        frac = r["epochs"] - int(r["epochs"])
        sumsq = df.filter(F.col("source") == s).agg(
            F.sum(F.col("n_tok") ** 2)).collect()[0][0]
        tol = 5.0 * math.sqrt(max(frac * (1 - frac), 0.0) * sumsq) + 1e-9
        assert abs(got[s] - r["target_tokens"]) <= tol, (s, got[s], r)


def test_temperature_weights_validation_and_zero_mass(spark):
    from sketchlib.spark.sampling import temperature_weights

    df = spark.createDataFrame(
        [("a", 100), ("a", 50), ("b", 0), ("c", None)],
        "source string, n_tok long",
    )
    with pytest.raises(ValueError, match="temperature must be positive"):
        temperature_weights(df, 0.0)
    with pytest.raises(ValueError, match="token_budget must be positive"):
        temperature_weights(df, 0.5, token_budget=0)
    rep = {r["source"]: r for r in
           temperature_weights(df, 0.5, token_budget=100).collect()}
    assert rep["b"]["weight"] == 0.0 and rep["b"]["epochs"] == 0.0
    assert rep["c"]["weight"] == 0.0  # NULL mass → 0, present and visible
    assert rep["a"]["weight"] == 1.0


def test_percentile_normalize_exact_matches_cume_dist(spark):
    """Exact mode: per-group CUME_DIST semantics incl. tie sharing;
    NULL/NaN scores get NULL and are excluded from the distribution."""
    from sketchlib.spark.sampling import percentile_normalize

    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
            ("b", 10.0), ("b", 20.0), ("a", None), ("b", float("nan"))]
    df = spark.createDataFrame(rows, "g string, s double")
    got = {(r["g"], r["s"]): r["pct_rank"]
           for r in percentile_normalize(df, "s", group_col="g").collect()}
    assert got[("a", 1.0)] == 0.25
    assert got[("a", 2.0)] == 0.75          # ties share the upper rank
    assert got[("a", 5.0)] == 1.0
    assert got[("b", 10.0)] == 0.5 and got[("b", 20.0)] == 1.0
    assert got[("a", None)] is None
    nan_rows = [v for (g, s), v in got.items() if g == "b" and s is not None and s != s]
    assert nan_rows == [None]


def test_percentile_normalize_kll_within_rank_bound(spark, seq_small_dir):
    """Sketch-served mode: per-source KLL rank within the published
    normalized rank-error bound of the exact per-source CDF, computed in
    ONE mapInArrow pass with no shuffle in the scoring plan."""
    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.sampling import percentile_normalize

    df = spark.read.parquet(seq_small_dir)
    states = build_sketches(
        df, [SketchSpec("q", "kll", "n_tok", {"k": 200})], group_by="source"
    )
    served = percentile_normalize(
        df, "n_tok", group_col="source", states=states, sketch="q", out="pct_kll"
    )
    assert "Exchange" not in served._jdf.queryExecution().executedPlan().toString()
    exact = percentile_normalize(df, "n_tok", group_col="source", out="pct_exact")
    j = (
        served.select("doc_id", "pct_kll")
        .join(exact.select("doc_id", "pct_exact"), "doc_id")
        .toPandas()
    )
    eps = 3.31 / 200
    assert len(j) == df.count()
    assert (j["pct_kll"] - j["pct_exact"]).abs().max() <= eps + 1e-12


def test_percentile_normalize_missing_group_and_merge(spark):
    """Grouped sketch mode NULLs rows whose group has no state; ungrouped
    mode merges all states into one global distribution."""
    import numpy as np

    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.sampling import percentile_normalize

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)] + [("b", float(i)) for i in range(100)],
        "g string, s double",
    )
    states = build_sketches(
        df.filter(F.col("g") == "a"),
        [SketchSpec("q", "kll", "s", {"k": 200})],
        group_by="g",
    )
    out = percentile_normalize(
        df, "s", group_col="g", states=states, sketch="q"
    ).toPandas()
    assert out.loc[out["g"] == "b", "pct_rank"].isna().all()
    assert out.loc[out["g"] == "a", "pct_rank"].notna().all()

    # ungrouped: states merge into one global CDF (here: just group a's)
    glob = percentile_normalize(df, "s", states=states, sketch="q").toPandas()
    a_med = glob.loc[(glob["g"] == "a") & (glob["s"] == 50.0), "pct_rank"].iloc[0]
    assert abs(a_med - 0.51) <= 3.31 / 200 + 1e-12


def test_percentile_normalize_validation(spark):
    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.sampling import percentile_normalize

    df = spark.createDataFrame([("a", 1.0)], "g string, s double")
    with pytest.raises(ValueError, match="BOTH states and sketch"):
        percentile_normalize(df, "s", states=df)
    hll = build_sketches(df, [SketchSpec("h", "hll", "s")], group_by="g")
    with pytest.raises(ValueError, match="does not answer rank"):
        percentile_normalize(df, "s", group_col="g", states=hll, sketch="h")
    with pytest.raises(ValueError, match="no states for sketch"):
        percentile_normalize(df, "s", group_col="g", states=hll, sketch="zzz")


def test_temperature_weights_int_and_null_source(spark):
    """Review fix: non-string and NULL source columns are legal — the report
    carries the source's NATIVE type (int here) and a NULL group sorts last
    instead of crashing the driver-side sort."""
    from sketchlib.spark.sampling import temperature_weights

    df = spark.createDataFrame(
        [(1, 100), (1, 100), (2, 50), (None, 25)],
        "source int, n_tok int",
    )
    rep = temperature_weights(df, 0.5).toPandas()
    assert str(rep["source"].dtype) in ("Int32", "int32", "Int64", "object", "float64")
    by = {(None if v != v else int(v)) if v is not None else None: w
          for v, w in zip(rep["source"], rep["weight"])}
    # p_i ∝ n_i^0.5: 200^.5 : 50^.5 : 25^.5
    import math

    tot = math.sqrt(200) + math.sqrt(50) + math.sqrt(25)
    assert abs(by[1] - math.sqrt(200) / tot) < 1e-12
    assert abs(by[2] - math.sqrt(50) / tot) < 1e-12
    assert None in {(None if v != v else v) for v in rep["source"]} or rep["source"].isna().any()


def test_percentile_normalize_bool_group_sketch_mode(spark):
    """Review fix: group keys are group_name() (Spark-CAST semantics,
    'true'/'false') on BOTH the build and scoring sides — a boolean group
    column must score, not silently emit all NULLs."""
    from pyspark.sql import functions as F

    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.sampling import percentile_normalize

    df = spark.range(200).select(
        (F.col("id") % 2 == 0).alias("flag"),
        F.col("id").cast("double").alias("s"),
    )
    states = build_sketches(df, [SketchSpec("q", "kll", "s", {"k": 200})], group_by="flag")
    out = percentile_normalize(df, "s", group_col="flag", states=states, sketch="q").toPandas()
    assert out["pct_rank"].notna().all()
    # sanity: the max id of each parity group sits at the top of its CDF
    top = out.loc[out["s"] >= 198.0, "pct_rank"]
    assert (top > 0.95).all()
