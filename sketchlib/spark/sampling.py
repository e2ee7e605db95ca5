"""Verdict's sample types, implemented (SURVEY.md §1.1 table).

The sketch layer replaces samples for the fixed query set, but the three
Verdict sample types are cheap to provide natively and complete the parity
story — each with the scale-up rewrite and a CLT confidence interval, which
is exactly Verdict's approx-SELECT surface (A5/A10/A11):

- uniform (Bernoulli p): COUNT/SUM/AVG via Horvitz-Thompson scale-up 1/p,
  variance Σx²(1−p)/p estimated from the sample  `[paper:VerdictDB §3.1]`
- universe (hash(col) < p — subsample the VALUE DOMAIN): COUNT(DISTINCT col)
  as D_s/p with binomial variance D(1−p)/p
- stratified (per-group fractions): GROUP BY over skewed groups where a
  uniform sample would starve small groups; per-group scale-up 1/p_g

Everything is pure DataFrame (one pass, JVM-side, whole-stage codegen);
sampling is seeded and deterministic. Returned bounds are ±z·se (z=1.96
default ⇒ 95% CI), the analog of Verdict's ``± err`` columns (A15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HASH_MOD = 1_000_000


def uniform_sample(df: DataFrame, ratio: float, seed: int = 42) -> DataFrame:
    """Bernoulli row sample (Verdict's uniform scramble)."""
    return df.sample(fraction=ratio, seed=seed)


def universe_sample(df: DataFrame, col: str, ratio: float, seed: int = 42) -> DataFrame:
    """Keep all rows whose hash(col) falls in a p-fraction of the hash space:
    subsamples the value DOMAIN, so COUNT(DISTINCT col) scales by exactly 1/p."""
    h = F.pmod(F.xxhash64(F.col(col), F.lit(seed)), F.lit(_HASH_MOD))
    return df.filter(h < int(ratio * _HASH_MOD))


def stratified_sample(df: DataFrame, group_by: str, fractions: dict, seed: int = 42) -> DataFrame:
    """Per-group Bernoulli fractions (Verdict's stratified scramble): give
    small/rare groups fraction 1.0 so they survive; hot groups get tiny p."""
    return df.sampleBy(group_by, fractions, seed)


def approx_agg_uniform(
    df: DataFrame, group_by: str | None, value_col: str, ratio: float, seed: int = 42,
    z: float = 1.96, moments: bool = False,
) -> DataFrame:
    """Approx COUNT(*), SUM(v), AVG(v) per group from one uniform sample.

    Output per group: est_count ± count_err, est_sum ± sum_err, est_avg ±
    avg_err (half-widths at the given z). Rewrites are Verdict's A10:
    count → n_s/p, sum → Σ_s v/p, avg → ratio of the two; variances are
    Horvitz-Thompson estimates computed in the same single aggregation.
    ``group_by=None`` gives the single global row. ``moments=True`` adds
    est_variance/est_stddev with delta-method CIs (see
    approx_agg_from_uniform_sample)."""
    return approx_agg_from_uniform_sample(
        uniform_sample(df, float(ratio), seed), group_by, value_col, float(ratio),
        z=z, moments=moments,
    )


def approx_agg_from_uniform_sample(
    sample: DataFrame, group_by: str | None, value_col: str, ratio: float,
    z: float = 1.96, moments: bool = False,
) -> DataFrame:
    """Same estimators as approx_agg_uniform, but over an ALREADY-DRAWN
    Bernoulli(p) sample — Verdict's A5 move for the sampling aggregates:
    `CREATE SAMPLE` persists the scramble once (SketchCatalog.create_sample),
    queries scan the p-fraction table instead of the corpus.

    ``moments=True`` additionally estimates the population VARIANCE and
    STDDEV of ``value_col`` from the same single aggregation:

    - est_variance: the sample variance s² (Spark's ``var_samp`` — a
      numerically STABLE shifted one-pass central-moment aggregate; a raw
      Σx²-power-sum expansion would both overflow 64-bit integers at
      x ≳ 3·10⁹ and cancel catastrophically at mean ≫ stddev). Under
      Bernoulli(p) the sampled rows are a simple random subset, so s² is a
      consistent (and to O(1/N) unbiased) estimator of the table's
      variance — a ratio-type statistic, no 1/p scale-up.
    - variance_err: z·se(s²) with the CLT/delta-method variance of a sample
      variance, Var(s²) ≈ (μ₄ − σ⁴)/n = σ⁴(g₂ + 2)/n, computed from the
      stable ``var_pop``/``kurtosis`` aggregates (g₂ = excess kurtosis, so
      g₂ + 2 ≥ 0 by the kurtosis lower bound), with the same (1−p)
      finite-population factor the other estimators carry — at p=1 the
      sample IS the table and the error is 0.
    - est_stddev = √s², stddev_err = variance_err/(2·√s²) (first-order delta
      method through √; NULL when s² = 0, where the linearization is
      undefined).

    Groups with n ≤ 1 report NULL variance/stddev (and NULL bounds) — a
    one-row sample carries no dispersion information.
    """
    p = float(ratio)
    s = sample
    v = F.col(value_col)
    aggs = [
        F.count("*").alias("n_s"),
        F.sum(v).alias("sum_s"),
        F.sum(v * v).alias("sum_sq"),
    ]
    if moments:
        aggs += [
            F.var_samp(v).alias("s2v"),
            F.var_pop(v).alias("m2v"),
            F.kurtosis(v).alias("g2v"),
        ]
    agg = s.groupBy(*([group_by] if group_by else [])).agg(*aggs)
    n_s, sum_s, sum_sq = F.col("n_s"), F.col("sum_s"), F.col("sum_sq")
    est_count = n_s / p
    # Var(n_s/p) = N(1-p)/p, N̂ = n_s/p  ->  n_s(1-p)/p²
    count_err = F.lit(z) * F.sqrt(n_s * (1 - p)) / p
    est_sum = sum_s / p
    # Var(Σv/p) = Σv²(1-p)/p, Σv² estimated by sum_sq/p  ->  sum_sq(1-p)/p²
    sum_err = F.lit(z) * F.sqrt(sum_sq * (1 - p)) / p
    est_avg = sum_s / n_s
    # ratio estimator: se ≈ z·s_v·√((1-p)/n_s), s_v = sample stddev
    var_v = (sum_sq / n_s) - (sum_s / n_s) * (sum_s / n_s)
    avg_err = F.lit(z) * F.sqrt(F.greatest(var_v, F.lit(0.0)) * (1 - p) / n_s)
    out = [
        est_count.alias("est_count"),
        count_err.alias("count_err"),
        est_sum.alias("est_sum"),
        sum_err.alias("sum_err"),
        est_avg.alias("est_avg"),
        avg_err.alias("avg_err"),
    ]
    if moments:
        # μ₄ − σ⁴ = σ⁴·(g₂ + 2) — entirely from stable aggregates; a zero
        # variance carries zero dispersion uncertainty (and kurtosis is
        # NaN there, so the guard is load-bearing, not cosmetic)
        m2, g2 = F.col("m2v"), F.col("g2v")
        s2 = F.col("s2v")  # var_samp: NULL at n ≤ 1
        K = F.when(m2 > 0, m2 * m2 * (g2 + F.lit(2.0))).otherwise(F.lit(0.0))
        var_err = F.when(
            n_s > 1,
            F.lit(z) * F.sqrt(F.greatest(K, F.lit(0.0)) * (1 - p) / n_s),
        )
        sd = F.sqrt(s2)
        sd_err = F.when(sd > 0, var_err / (2 * sd))
        out += [
            s2.alias("est_variance"),
            var_err.alias("variance_err"),
            sd.alias("est_stddev"),
            sd_err.alias("stddev_err"),
        ]
    return agg.select(*([F.col(group_by)] if group_by else []), *out)


def approx_bivariate_uniform(
    df: DataFrame, group_by: str | None, x_col: str, y_col: str, ratio: float,
    seed: int = 42, z: float = 1.96,
) -> DataFrame:
    """Approx COVARIANCE and CORRELATION per group from one uniform sample —
    see approx_bivariate_from_uniform_sample."""
    return approx_bivariate_from_uniform_sample(
        uniform_sample(df, float(ratio), seed), group_by, x_col, y_col, float(ratio), z=z
    )


def approx_bivariate_from_uniform_sample(
    sample: DataFrame, group_by: str | None, x_col: str, y_col: str, ratio: float,
    z: float = 1.96,
) -> DataFrame:
    """Population COVARIANCE and PEARSON CORRELATION of (x, y) from an
    already-drawn Bernoulli(p) sample, one aggregation pass over Spark's
    numerically STABLE central-moment aggregates (``covar_samp``/
    ``var_pop``/``kurtosis`` use shifted one-pass updating; a raw power-sum
    expansion of the cross moments would both overflow 64-bit integers and
    cancel catastrophically at mean ≫ stddev). Both statistics are
    ratio-type — a uniform subset estimates them without any 1/p scale-up:

    - est_covar: ``covar_samp`` of the sample rows, consistent for the
      table's covar_samp. covar_err uses the CLT variance of a sample
      covariance, Var(s_xy) ≈ (μ₂₂ − σ_xy²)/n, with μ₂₂ = E[(x−μx)²(y−μy)²]
      bounded by CAUCHY–SCHWARZ as μ₂₂ ≤ √(μ₄₀·μ₀₄) — each fourth moment
      from the stable per-column variance/kurtosis (μ₄ = σ⁴(g₂+3)). The
      bound is conservative (≤ √3× wider for bivariate-normal data), never
      smaller than the true CI, and immune to the cancellation that makes
      the exact m₂₂ expansion meaningless at large means. The (1−p)
      finite-population factor zeroes it at p=1.
    - est_corr: Pearson r = cov_pop/√(vx·vy) from the same stable
      aggregates (identical to ``corr``, which under ANSI mode throws on a
      zero-variance column where this guarded form returns NULL), clamped
      into [−1, 1] against float rounding. corr_err comes from the FISHER
      z transform — atanh(r) is
      asymptotically normal with se 1/√(n−3) (Fisher 1921), far better
      behaved near |r|→1 than the naive delta bound (1−r²)/√n, and
      exact-zero at p=1 via the same (1−p) factor. The half-width reported
      is the wider side of the back-transformed interval
      tanh(atanh(r) ± z·√(1−p)/√(n−3)) — honest asymmetry made
      conservative. NULL when either marginal variance is 0 (correlation
      undefined, ``corr`` returns NaN) or n ≤ 3.

    Groups with n ≤ 1 report NULL for both estimates.
    """
    p = float(ratio)
    x, y = F.col(x_col), F.col(y_col)
    agg = sample.groupBy(*([group_by] if group_by else [])).agg(
        F.count("*").alias("n_s"),
        F.covar_samp(x, y).alias("cov_s"),
        F.covar_pop(x, y).alias("cov_p"),
        F.var_pop(x).alias("vx"),
        F.var_pop(y).alias("vy"),
        F.kurtosis(x).alias("gx"),
        F.kurtosis(y).alias("gy"),
    )
    n = F.col("n_s")
    vx, vy, gx, gy = F.col("vx"), F.col("vy"), F.col("gx"), F.col("gy")
    s_xy = F.when(n > 1, F.col("cov_s"))
    # μ₄₀ = vx²(gx+3), μ₀₄ = vy²(gy+3); K = √(μ₄₀μ₀₄) − σ_xy² ≥ μ₂₂ − σ_xy²
    mu40 = vx * vx * (gx + F.lit(3.0))
    mu04 = vy * vy * (gy + F.lit(3.0))
    K = F.when(
        (vx > 0) & (vy > 0),
        F.sqrt(F.greatest(mu40 * mu04, F.lit(0.0))) - F.col("cov_p") * F.col("cov_p"),
    ).otherwise(F.lit(0.0))  # a zero marginal variance forces σ_xy = 0 exactly
    covar_err = F.when(
        n > 1, F.lit(z) * F.sqrt(F.greatest(K, F.lit(0.0)) * (1 - p) / n)
    )
    # r from the same stable aggregates (cov_pop/√(vx·vy) IS Pearson's r);
    # built-in F.corr would be equivalent but throws DIVIDE_BY_ZERO on a
    # zero-variance column under ANSI mode — the when-guard division cannot
    raw = F.col("cov_p") / F.sqrt(vx * vy)
    r = F.when(
        (n > 1) & (vx > 0) & (vy > 0),
        F.least(F.greatest(raw, F.lit(-1.0)), F.lit(1.0)),
    )
    # clamp into the open interval so atanh stays finite under float rounding
    r_c = F.least(F.greatest(r, F.lit(-0.999999999999)), F.lit(0.999999999999))
    zf = F.atanh(r_c)
    d = F.lit(z) * F.sqrt(F.lit(1.0 - p)) / F.sqrt(n - 3)
    corr_err = F.when(
        (n > 3) & r.isNotNull(),
        F.greatest(F.tanh(zf + d) - r_c, r_c - F.tanh(zf - d)),
    )
    return agg.select(
        *([F.col(group_by)] if group_by else []),
        s_xy.alias("est_covar"),
        covar_err.alias("covar_err"),
        r.alias("est_corr"),
        corr_err.alias("corr_err"),
    )


def approx_count_distinct_universe(
    df: DataFrame, col: str, ratio: float, group_by: str | None = None, seed: int = 42, z: float = 1.96
) -> DataFrame:
    """Approx COUNT(DISTINCT col) via universe sampling (Verdict A11):
    D̂ = D_s/p with binomial CI; the cross-check for the HLL path."""
    return count_distinct_from_universe_sample(
        universe_sample(df, col, float(ratio), seed), col, float(ratio), group_by=group_by, z=z
    )


def count_distinct_from_universe_sample(
    sample: DataFrame, col: str, ratio: float, group_by: str | None = None, z: float = 1.96
) -> DataFrame:
    """D̂ = D_s/p over an ALREADY-DRAWN universe sample (persisted scramble)."""
    p = float(ratio)
    s = sample
    keys = [group_by] if group_by else []
    agg = s.groupBy(*keys).agg(F.countDistinct(col).alias("d_s"))
    d_s = F.col("d_s")
    out_cols = ([F.col(group_by)] if group_by else []) + [
        (d_s / p).alias("est_distinct"),
        (F.lit(z) * F.sqrt(d_s * (1 - p)) / p).alias("distinct_err"),
    ]
    return agg.select(*out_cols)


def approx_join_agg(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    value_col: str | None = None,
    ratio: float = 0.1,
    seed: int = 42,
    z: float = 1.96,
    group_by: str | list[str] | None = None,
    where: str | None = None,
) -> DataFrame:
    """Approx COUNT(*) / SUM(value) of ``left ⋈ right`` from universe samples
    of BOTH sides — Verdict's ApproxJoinedRelation (A8): when the two inputs
    are universe-sampled on the SAME join key with the SAME hash/seed, a key
    survives on the left iff it survives on the right, so the joined sample
    is itself a universe sample of the JOIN at probability p (NOT p² — the
    probabilities compose through the shared hash, which is the whole trick).

    ``where`` (any Spark SQL predicate over the joined columns) filters the
    joined sample rows BEFORE aggregation: filtering commutes with universe
    sampling (each surviving key was still included with probability p
    independently of the row predicate), so the same 1/p scale-up is
    unbiased for the FILTERED join — and Catalyst pushes the pushable parts
    of the predicate through the join into the scans.

    Estimator: group joined rows per key k → pair count c_k (and value sum
    s_k); Σ_sampled c_k / p is unbiased for the join count with
    Var = Σ c_k²(1−p)/p (independent Bernoulli keys), estimated from the
    sample as Σ_s c_k²/p. Output: one row — est_count ± count_err
    [, est_sum ± sum_err] (±z·se half-widths) — or one row per ``group_by``
    value (a column of either joined side; keys contribute to each group
    they appear in, variances sum per group since keys are independent
    Bernoulli draws).

    Scale: both inputs are filtered BEFORE the join (hash predicate pushes
    into the scans), so the join touches a p-fraction of each side.
    """
    p = float(ratio)
    return approx_join_agg_from_samples(
        universe_sample(left, left_key, p, seed),
        universe_sample(right, right_key, p, seed),
        left_key,
        right_key,
        p,
        value_col=value_col,
        z=z,
        group_by=group_by,
        where=where,
    )


def approx_join_agg_from_samples(
    ls: DataFrame,
    rs: DataFrame,
    left_key: str,
    right_key: str,
    ratio: float,
    value_col: str | None = None,
    z: float = 1.96,
    group_by: str | list[str] | None = None,
    where: str | None = None,
) -> DataFrame:
    """Same estimator over ALREADY-DRAWN universe samples of both sides —
    the A5 move for approximate joins: `CREATE SAMPLE ... KIND universe`
    persists both scrambles once (they MUST share hash seed and ratio so the
    survival probabilities compose to p), and join queries scan the
    p-fraction tables instead of the corpora. ``where`` filters the joined
    rows before aggregation (commutes with the sampling — see
    approx_join_agg)."""
    p = float(ratio)
    joined = ls.join(rs, ls[left_key] == rs[right_key])
    if where:
        joined = joined.filter(where)
    return cluster_join_agg(
        joined, ls[left_key], p, value_col=value_col, z=z, group_by=group_by
    )


def cluster_join_agg(
    joined: DataFrame,
    cluster_col,
    ratio: float,
    value_col: str | None = None,
    z: float = 1.96,
    group_by: str | list[str] | None = None,
) -> DataFrame:
    """COUNT/SUM estimator for a joined frame whose rows were included via
    independent Bernoulli(p) draws of CLUSTERS — the shared core of every
    approximate-join shape. ``cluster_col`` identifies the independent
    inclusion unit: the shared join key for universe⋈universe (a key
    survives as a unit and brings every pair), or the sampled row's own id
    for a uniform scramble joined to exact tables (each sampled row brings
    every row it joins to — one joined row when the other side is unique
    on the key, many otherwise; treating joined rows as independent would
    understate the CI by ~√(rows/cluster) whenever they aren't).

    Estimators: est = Σ_s c_r/p (unbiased, HT), Var = Σ_pop c_r²(1−p)/p
    estimated from the sample as Σ_s c_r²(1−p)/p². With one row per
    cluster this reduces exactly to the plain uniform-sample formulas.
    Grouped: clusters contribute to each group they appear in; per-group
    variances use that group's own cluster cells (cells of one cluster are
    correlated ACROSS groups, but each group's estimator only sums its own
    cells, so the per-group CI is unaffected).
    """
    p = float(ratio)
    gcols = (
        [] if not group_by
        else (list(group_by) if isinstance(group_by, (list, tuple)) else [group_by])
    )
    aggs = [F.count(F.lit(1)).alias("c_k")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("s_k"))
    gb = [cluster_col] + [F.col(c) for c in gcols]
    per_key = joined.groupBy(*gb).agg(*aggs)
    c_k = F.col("c_k")
    out = [
        (F.sum(c_k) / p).alias("est_count"),
        (F.lit(z) * F.sqrt(F.sum(c_k * c_k) * (1 - p)) / p).alias("count_err"),
    ]
    if value_col is not None:
        s_k = F.col("s_k")
        out += [
            (F.sum(s_k) / p).alias("est_sum"),
            (F.lit(z) * F.sqrt(F.sum(s_k * s_k) * (1 - p)) / p).alias("sum_err"),
        ]
    return per_key.groupBy(*gcols).agg(*out) if gcols else per_key.agg(*out)


def approx_join_agg_mixed(
    fact_sample: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    kind: str,
    ratio: float,
    value_col: str | None = None,
    z: float = 1.96,
    group_by: str | list[str] | None = None,
    where: str | None = None,
) -> DataFrame:
    """Approx COUNT(*) / SUM(value) of ``fact ⋈ dim`` when only the FACT
    side has a scramble — Verdict's most common join shape (A8: a sampled
    fact table joined to small exact dimensions). The exact dim side is
    joined exact — the planner auto-broadcasts it when it is small
    (``spark.sql.autoBroadcastJoinThreshold`` / AQE), which is the
    canonical fact×dim case; no broadcast is FORCED, because the
    dim-side-scramble shape ("the sampled side is the key-unique
    dimension") makes the exact side the LARGE fact table, and a forced
    broadcast there would blow the 8 GB cap where a shuffle join works.
    ``group_by`` may name a column of either side (grouping happens after
    the join — the usual fact×dim rollup groups by a dim attribute).

    kind='uniform': each sampled row was kept independently with
    probability p and brings ALL the rows it joins to, so the inclusion
    unit is the sampled ROW — the estimator clusters joined rows by a
    per-sampled-row id (``cluster_join_agg``). With a key-unique dim this
    reduces exactly to the plain Bernoulli HT formulas; with a many-match
    other side (e.g. the scramble sits on the key-unique dimension and the
    exact side is the fact) the clustered variance stays honest where a
    row-independence formula would understate by ~√(rows/cluster).

    kind='universe' (fact sampled on ITS join key): a key survives with
    probability p and brings all its joined rows, so the per-key clustered
    estimator of approx_join_agg applies unchanged — the dim side being
    complete just means key survival is decided by the fact side alone.

    ``where`` filters joined rows before aggregation (commutes with both
    sampling kinds — row predicates are independent of the inclusion draw).
    """
    if kind == "universe":
        return approx_join_agg_from_samples(
            fact_sample, dim, fact_key, dim_key, ratio,
            value_col=value_col, z=z, group_by=group_by, where=where,
        )
    if kind != "uniform":
        raise ValueError(f"mixed approx join needs a uniform or universe fact sample, got {kind!r}")
    s = fact_sample.withColumn("_cluster", row_fingerprint(fact_sample))
    joined = s.join(dim, s[fact_key] == dim[dim_key])
    if where:
        joined = joined.filter(where)
    return cluster_join_agg(
        joined, F.col("_cluster"), ratio, value_col=value_col, z=z, group_by=group_by
    )


def row_fingerprint(df: DataFrame):
    """Deterministic per-row cluster id: xxhash64 over every column. Chosen
    over ``monotonically_increasing_id`` because that expression is
    NONDETERMINISTIC, and Catalyst refuses to push filter predicates
    through a nondeterministic Project — a WHERE on the mixed join would
    silently stop reaching the fact sample's parquet scan (no pushdown, no
    row-group pruning), breaking the captured-plan contract. Byte-identical
    duplicate rows share a fingerprint and therefore a cluster, which only
    makes the CI CONSERVATIVE (their counts add into one Σc² term — the
    estimate itself is unchanged); cross-row collisions are ~n²/2⁶⁴."""
    return F.xxhash64(*[F.col(c) for c in df.columns])


def approx_agg_stratified(
    df: DataFrame, group_by: str, value_col: str, fractions: dict, seed: int = 42, z: float = 1.96
) -> DataFrame:
    """Stratified approx aggregates: per-group scale-up by that group's own
    fraction — small groups sampled at 1.0 get exact answers (err 0), the
    hot group gets sampling error only from its own fraction."""
    return approx_agg_from_stratified_sample(
        stratified_sample(df, group_by, fractions, seed), group_by, value_col, fractions, z=z
    )


def stratified_global_agg(
    sample: DataFrame, on_col: str, value_col: str, fractions: dict, z: float = 1.96
) -> DataFrame:
    """GLOBAL COUNT/SUM/AVG from a stratified sample — one row.

    Totals sum the per-stratum Horvitz-Thompson estimates (independent
    Bernoulli strata ⇒ variances add):
    N̂ = Σ n_g/p_g, Ŝ = Σ sum_g/p_g, Var(N̂) = Σ n_g(1−p_g)/p_g²,
    Var(Ŝ) = Σ sumsq_g(1−p_g)/p_g². The mean is the RATIO estimator
    μ̂ = Ŝ/N̂ with the delta-method variance
    (Var(Ŝ) + μ̂²·Var(N̂) − 2μ̂·Cov(Ŝ,N̂)) / N̂², where per-stratum
    Cov(Ŝ,N̂) = Σx(1−p)/p is estimated by sum_g(1−p_g)/p_g².
    """
    frac_map = F.create_map(*[F.lit(x) for kv in fractions.items() for x in kv])
    v = F.col(value_col)
    per = (
        sample.groupBy(on_col)
        .agg(F.count("*").alias("n_s"), F.sum(v).alias("sum_s"), F.sum(v * v).alias("sum_sq"))
        .withColumn("p_g", frac_map[F.col(on_col)])
    )
    n_s, sum_s, sum_sq, p_g = F.col("n_s"), F.col("sum_s"), F.col("sum_sq"), F.col("p_g")
    tot = per.agg(
        F.sum(n_s / p_g).alias("N"),
        F.sum(sum_s / p_g).alias("S"),
        F.sum(n_s * (1 - p_g) / (p_g * p_g)).alias("varN"),
        F.sum(sum_sq * (1 - p_g) / (p_g * p_g)).alias("varS"),
        F.sum(sum_s * (1 - p_g) / (p_g * p_g)).alias("covSN"),
    )
    N, S = F.col("N"), F.col("S")
    mu = S / N
    avg_var = (F.col("varS") + mu * mu * F.col("varN") - 2 * mu * F.col("covSN")) / (N * N)
    return tot.select(
        N.alias("est_count"),
        (F.lit(z) * F.sqrt(F.col("varN"))).alias("count_err"),
        S.alias("est_sum"),
        (F.lit(z) * F.sqrt(F.col("varS"))).alias("sum_err"),
        mu.alias("est_avg"),
        (F.lit(z) * F.sqrt(F.greatest(avg_var, F.lit(0.0)))).alias("avg_err"),
    )


def approx_agg_from_stratified_sample(
    sample: DataFrame, group_by: str, value_col: str, fractions: dict, z: float = 1.96
) -> DataFrame:
    """Same estimators over an ALREADY-DRAWN stratified sample (persisted
    scramble, SketchCatalog.create_sample(kind='stratified'))."""
    s = sample
    frac_map = F.create_map(*[F.lit(x) for kv in fractions.items() for x in kv])
    v = F.col(value_col)
    agg = (
        s.groupBy(group_by)
        .agg(F.count("*").alias("n_s"), F.sum(v).alias("sum_s"), F.sum(v * v).alias("sum_sq"))
        .withColumn("p_g", frac_map[F.col(group_by)])
    )
    n_s, sum_s, sum_sq, p_g = F.col("n_s"), F.col("sum_s"), F.col("sum_sq"), F.col("p_g")
    # AVG within a stratum: the stratum's sample is Bernoulli(p_g), so the
    # same ratio estimator as the uniform path applies with that stratum's
    # own fraction — est = sum_s/n_s, se ≈ s_v·√((1−p_g)/n_s); a stratum
    # sampled at 1.0 gets the exact average with zero error
    var_v = (sum_sq / n_s) - (sum_s / n_s) * (sum_s / n_s)
    return agg.select(
        F.col(group_by),
        (n_s / p_g).alias("est_count"),
        (F.lit(z) * F.sqrt(n_s * (1 - p_g)) / p_g).alias("count_err"),
        (sum_s / p_g).alias("est_sum"),
        (F.lit(z) * F.sqrt(sum_sq * (1 - p_g)) / p_g).alias("sum_err"),
        (sum_s / n_s).alias("est_avg"),
        (F.lit(z) * F.sqrt(F.greatest(var_v, F.lit(0.0)) * (1 - p_g) / n_s)).alias("avg_err"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict,
    token_budget: int,
    len_col: str = "n_tok",
    source_col: str = "source",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Compose a training-data MIXTURE: per-source Bernoulli fractions are
    solved so each source's expected share of the output tokens matches
    ``weights`` under the global ``token_budget`` (the standard data-mixture
    step of a pretraining pipeline — e.g. 50% web / 30% books / 20% code).

    One exact per-source token-count pass plans the fractions (driver-side
    math over G rows), then a single ``sampleBy`` draws the mixture — the
    corpus is scanned twice, shuffled never. A source whose target exceeds
    its inventory is capped at fraction 1.0 and flagged (``capped`` —
    up-weighting requires replication, a policy the caller owns; silent
    over-claiming of a source would skew the mixture).

    Returns (sampled rows, plan report): report columns are (source,
    weight, target_tokens, available_tokens, fraction, capped). Sources in
    the data but absent from ``weights`` get fraction 0 (excluded).
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    bad = {s: w for s, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"weights must be non-negative, got {bad}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    totals = {
        r[source_col]: int(r["tok"])
        for r in df.groupBy(source_col).agg(F.sum(len_col).alias("tok")).collect()
    }
    fracs: dict = {}
    rows = []
    for s, w in weights.items():
        target = w / wsum * token_budget
        have = totals.get(s, 0)
        frac = min(1.0, target / have) if have > 0 else 0.0
        fracs[s] = frac
        rows.append((s, float(w), int(target), have, frac, bool(have < target)))
    spark = df.sparkSession
    report = spark.createDataFrame(
        rows,
        "source string, weight double, target_tokens long, available_tokens long, "
        "fraction double, capped boolean",
    )
    return df.sampleBy(source_col, fracs, seed), report


def temperature_weights(
    df: DataFrame,
    temperature: float,
    len_col: str = "n_tok",
    source_col: str = "source",
    token_budget: int | None = None,
) -> DataFrame:
    """Temperature-scaled mixture WEIGHTS from source sizes — the standard
    multilingual/domain re-balancing transform (Conneau & Lample 2019 §3.1;
    XLM-R, mT5): p_i ∝ n_i^T for source token counts n_i. T = 1 keeps the
    natural proportions, T → 0 approaches uniform, 0 < T < 1 up-weights
    low-resource sources without letting head sources drown them — the
    knob every pretraining mix states on its data card.

    One exact per-source token-count pass (map-side combined groupBy over
    G rows, same as ``mixture_sample``'s planning pass), then driver-side
    closed-form math. Returns one row per source: (source,
    available_tokens, natural_share, weight) plus, when ``token_budget``
    is given, (target_tokens, epochs) — epochs = target/available is the
    replication factor the weight implies; > 1 means the source must be
    up-sampled, which is exactly what ``upsample_mixture(fractions=
    {source: epochs})`` materializes and ``mixture_sample(weights=...)``
    caps-and-flags. The three compose into the full pipeline: weights
    here, Bernoulli down-sampling there, replication for the rest.

    Sources with zero/NULL token mass get weight 0 (0^T = 0), not an
    error — an empty source should vanish from the mix, loudly visible
    in the report.
    """
    t = float(temperature)
    if t <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    if token_budget is not None and int(token_budget) <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    # keep the source column's NATIVE type (upsample_mixture/sampleBy
    # consume these keys typed) and sort None-safely — a NULL source group
    # is legal input and must not crash the report
    totals = sorted(
        (
            (r[source_col], int(r["tok"] or 0))
            for r in df.groupBy(source_col).agg(F.sum(len_col).alias("tok")).collect()
        ),
        key=lambda kv: (kv[0] is None, str(kv[0])),
    )
    grand = float(sum(n for _, n in totals))
    powed = [(s, n, float(n) ** t) for s, n in totals]
    psum = float(sum(p for _, _, p in powed))
    rows = []
    for s, n, p in powed:
        share = n / grand if grand > 0 else 0.0
        w = p / psum if psum > 0 else 0.0
        if token_budget is None:
            rows.append((s, n, share, w))
        else:
            target = w * int(token_budget)
            rows.append((s, n, share, w, target, (target / n) if n > 0 else 0.0))
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    fields = [
        StructField(source_col, df.schema[source_col].dataType),
        StructField("available_tokens", LongType()),
        StructField("natural_share", DoubleType()),
        StructField("weight", DoubleType()),
    ]
    if token_budget is not None:
        fields += [
            StructField("target_tokens", DoubleType()),
            StructField("epochs", DoubleType()),
        ]
    return df.sparkSession.createDataFrame(rows, StructType(fields))


def percentile_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    out: str = "pct_rank",
    states: DataFrame | None = None,
    sketch: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Normalize a quality score to its PER-GROUP percentile — the step
    between quality scoring and thresholding: raw scores are not
    comparable across sources (one domain's median is another's tail),
    so gates are stated as "keep the top 30% of each source", i.e. on
    the per-source CDF. Adds ``out`` = F_group(score) ∈ (0, 1], the
    fraction of the group's rows with score ≤ this row's (CUME_DIST
    semantics — ties share a value, matching every SQL engine).

    Two modes, same convention as ``text.with_unigram_surprisal``:

    - EXACT (default): per-group ``cume_dist`` window. Semantically the
      oracle; each group sorts on one task, so it is the small-corpus /
      verification path.
    - KLL-SERVED (pass ``states`` + ``sketch``): percentiles come from
      each group's quantile-sketch state (``build_sketches`` KLL /
      t-digest / DDSketch — anything answering ``rank()``). KB states
      are closure-broadcast and scoring is ONE mapInArrow pass — no
      shuffle, no sort, corpus-size-independent: the 100 TB path, and
      the DELTA path (score a fresh crawl against the persisted corpus
      distribution without re-sorting the corpus). KLL guarantees
      |rank̂(x) − rank(x)| ≤ error_bound() w.h.p. (Karnin et al. FOCS
      2016), so a gate at the p-th percentile misclassifies only rows
      within ε of the boundary.

    NULL/NaN scores get NULL ``out`` and are excluded from the exact
    distribution (a sketch never saw them either — build drops NULLs).
    In grouped sketch mode, rows of a group with NO state get NULL
    loudly (the missing-model signal, not a silent global fallback).
    """
    from pyspark.sql import Window

    if (states is None) != (sketch is None):
        raise ValueError("pass BOTH states and sketch for the sketch-served mode")

    if states is None:
        valid = F.col(score_col).isNotNull() & ~F.isnan(F.col(score_col).cast("double"))
        parts = [group_col] if group_col else []
        w = Window.partitionBy(*parts).orderBy(F.col(score_col))
        scored = df.filter(valid).withColumn(out, F.cume_dist().over(w))
        if round_to is not None:
            scored = scored.withColumn(out, F.round(F.col(out), round_to))
        missing = df.filter(~valid).withColumn(out, F.lit(None).cast("double"))
        return scored.unionByName(missing)

    import numpy as np
    import pyarrow as pa

    from sketchlib.spark.query import load_states

    picked = sorted(
        (g, sk) for (g, name), sk in load_states(states).items() if name == sketch
    )
    if not picked:
        raise ValueError(f"no states for sketch {sketch!r}")
    for _, sk in picked:
        if not hasattr(sk, "rank"):
            raise ValueError(
                f"sketch {sketch!r} does not answer rank() — pass a quantile "
                "sketch (kll / tdigest / dd)"
            )
    models: dict = {}
    if group_col is None:
        acc = picked[0][1]
        for _, sk in picked[1:]:
            acc = acc.merge(sk)
        models[None] = acc.to_bytes()
    else:
        models = {g: sk.to_bytes() for g, sk in picked}

    from pyspark.sql.types import StructType

    result_schema = StructType(list(df.schema.fields)).add(out, "double")

    def score(batches):
        import pandas as pd

        from sketchlib.sketches.base import deserialize as _des
        from sketchlib.spark.build import group_name

        resolved: dict = {}

        def sk_for(key):
            if key not in resolved:
                b = models.get(key)
                resolved[key] = _des(b) if b is not None else None
            return resolved[key]

        for batch in batches:
            sidx = batch.schema.get_field_index(score_col)
            if sidx < 0:
                raise KeyError(
                    f"score column {score_col!r} not in batch schema "
                    f"{batch.schema.names}"
                )
            x = batch.column(sidx).to_numpy(zero_copy_only=False)
            x = np.asarray(x, dtype=np.float64)  # nulls surface as NaN
            valid = ~np.isnan(x)
            vals = np.full(batch.num_rows, np.nan)
            if group_col is None:
                if valid.any():
                    vals[valid] = sk_for(None).rank(x[valid])
            else:
                gidx = batch.schema.get_field_index(group_col)
                if gidx < 0:
                    raise KeyError(
                        f"group column {group_col!r} not in batch schema "
                        f"{batch.schema.names}"
                    )
                gvals = batch.column(gidx).to_numpy(zero_copy_only=False)
                codes, uniq = pd.factorize(gvals)
                for ci, gv in enumerate(uniq):
                    # group_name, not str(): build keys are Spark-CAST
                    # strings ('true', '2024-01-01 00:00:00'), and a silent
                    # key mismatch here is indistinguishable from a
                    # missing state (all-NULL output)
                    key = "__null__" if pd.isna(gv) else group_name(gv)
                    sk = sk_for(key)
                    if sk is None:
                        continue  # no state for this group → NULL rows
                    sel = (codes == ci) & valid
                    if sel.any():
                        vals[sel] = sk.rank(x[sel])
                sel = (codes < 0) & valid  # factorize marks NULL groups -1
                if sel.any() and sk_for("__null__") is not None:
                    vals[sel] = sk_for("__null__").rank(x[sel])
            if round_to is not None:
                vals = np.round(vals, round_to)
            mask = np.isnan(vals)
            arr = pa.array(vals, mask=mask, type=pa.float64())
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)] + [arr],
                schema=pa.schema(list(batch.schema) + [pa.field(out, pa.float64())]),
            )

    return df.mapInArrow(score, result_schema)


def select_within_budget(
    df: DataFrame,
    budget: int | dict,
    score_col: str,
    len_col: str = "n_tok",
    source_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Quality-ranked selection under a TOKEN BUDGET — the deterministic
    counterpart of ``mixture_sample``: per source, keep the maximal prefix
    of documents in (``score_col`` DESC, ``id_col`` ASC) order whose
    cumulative ``len_col`` stays within the source's budget ("take the
    best N tokens of web", the step between quality scoring and mixture
    composition). ``budget``: one int for every source, or {source: int}
    (sources absent from the dict are excluded, like ``mixture_sample``'s
    weights).

    Scale shape — the naive window (`sum(len) OVER (PARTITION BY source
    ORDER BY score DESC, id)`) puts each source on ONE task: a 10¹²-doc
    corpus with 10 sources would sort 10¹¹ docs per task. Instead: (1) one
    groupBy pass builds a per-(source, score-bucket) token histogram
    (G × n_buckets rows, driver-side cumulated); (2) every doc in a bucket
    strictly better than the threshold bucket is kept MAP-SIDE (broadcast
    threshold join, no shuffle, no sort); (3) only the BOUNDARY bucket's
    docs (~1/n_buckets of the source) enter a window for the exact
    within-bucket prefix. The kept set is EXACTLY the naive window's
    (test-locked) because bucketing is monotone in score. Degenerate case:
    a source whose every doc has one identical score has a single bucket —
    the boundary window then covers that whole source (the order (score,
    id) gives the histogram nothing to split; raise ``n_buckets`` only
    helps distinct scores).
    """
    from pyspark.sql import Window

    if isinstance(budget, dict):
        bad = {s: b for s, b in budget.items() if int(b) < 0}
        if bad:
            raise ValueError(f"budgets must be non-negative, got {bad}")
        budgets = {s: int(b) for s, b in budget.items()}
        default_budget = None
    else:
        if int(budget) < 0:
            raise ValueError(f"budget must be non-negative, got {budget}")
        budgets, default_budget = {}, int(budget)

    from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType

    spark = df.sparkSession
    sfield = df.schema[source_col]
    # per-source score range, joined back (broadcast) rather than compiled
    # into a per-source WHEN chain: a 10⁴-source corpus would otherwise pay
    # the Catalyst giant-literal-expression planning cost measured for the
    # registry In() listing (DESIGN_100TB §2). A source whose scores are all
    # NULL has no range — its docs are unrankable and drop via the inner join.
    stats = [
        (r[source_col], float(r["_mn"]), float(r["_mx"]) - float(r["_mn"]))
        for r in df.groupBy(source_col)
        .agg(F.min(score_col).alias("_mn"), F.max(score_col).alias("_mx"))
        .collect()
        if r["_mn"] is not None
    ]
    if not stats:
        return df.limit(0)
    stats_df = spark.createDataFrame(
        stats,
        StructType([sfield, StructField("_mn", DoubleType()), StructField("_span", DoubleType())]),
    )
    # monotone per-source affine map of score onto [0, n_buckets): bucket
    # order == score order, so the budget boundary is bucket-exact
    work = (
        df.join(F.broadcast(stats_df), source_col)
        .withColumn(
            "_b",
            F.when(F.col("_span") <= 0, F.lit(0))
            .otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor((F.col(score_col) - F.col("_mn")) / F.col("_span") * n_buckets),
                )
            )
            .cast("int"),
        )
        .drop("_mn", "_span")
    )
    hist = {
        (r[source_col], int(r["_b"])): int(r["_tok"])
        for r in work.groupBy(source_col, "_b").agg(F.sum(len_col).alias("_tok")).collect()
    }
    rows = []  # (source, boundary bucket, boundary-bucket remaining budget)
    for s, _mn, _span in stats:
        bud = budgets.get(s, default_budget)
        if bud is None:  # dict budgets: unlisted source excluded
            rows.append((s, n_buckets, 0))
            continue
        cum = 0
        bstar, remaining = -1, 0  # -1: whole source fits
        for b in range(n_buckets - 1, -1, -1):
            tok = hist.get((s, b), 0)
            if cum + tok > bud:
                bstar, remaining = b, bud - cum
                break
            cum += tok
        rows.append((s, bstar, remaining))
    thr = spark.createDataFrame(
        rows,
        StructType([sfield, StructField("_bstar", IntegerType()), StructField("_rem", LongType())]),
    )
    work = work.join(F.broadcast(thr), source_col)
    full = work.filter((F.col("_bstar") == -1) | (F.col("_b") > F.col("_bstar")))
    w = Window.partitionBy(source_col).orderBy(F.desc(score_col), F.asc(id_col))
    boundary = (
        work.filter(F.col("_b") == F.col("_bstar"))
        .withColumn("_cum", F.sum(len_col).over(w))
        .filter(F.col("_cum") <= F.col("_rem"))
        .drop("_cum")
    )
    return full.unionByName(boundary).select(*df.columns)


def upsample_mixture(
    df: DataFrame,
    fractions: dict,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    copy_col: str = "copy",
) -> DataFrame:
    """Materialize an OVER-unity mixture by deterministic replication — the
    half ``mixture_sample`` refuses to do silently (it caps fractions at
    1.0 and flags ``capped``; actually up-weighting a source means
    replicating it, a decision that must be explicit and reproducible).
    Each source's rows get ``floor(f)`` copies plus one more for the
    deterministic md5 fraction of ids covering the remainder: a doc's copy
    count is a pure function of (id, seed, f) — independent of
    partitioning, cluster size, or file layout, so re-runs and audits see
    the identical corpus. Fractions may be < 1 too (0.5 → half the docs,
    chosen by the same keyed coin — NOT a new sample on every run like
    ``sample()``); sources absent from ``fractions`` are excluded, like
    ``mixture_sample``'s weights. Output rows carry ``copy_col``
    (0..n_copies-1), so (id, copy) is unique and downstream shuffle/shard
    can decorrelate the replicas.

    Scale shape: broadcast plan join + codegen key/explode — zero shuffle,
    one corpus scan. NULL ids have no stable coin: they get floor(f)
    copies only (the fractional extra needs an id).
    """
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from sketchlib.spark.packing import _md5_key60

    bad = {s: f for s, f in fractions.items() if float(f) < 0}
    if bad:
        raise ValueError(f"fractions must be non-negative, got {bad}")
    rows = []
    for s, f in fractions.items():
        base = int(float(f))
        # remainder coin boundary in [0, 2^60) — integer-exact, so any
        # engine computing the same md5 key agrees on every copy count
        bound = int(round((float(f) - base) * (1 << 60)))
        rows.append((s, base, bound))
    spark = df.sparkSession
    plan = spark.createDataFrame(
        rows,
        StructType(
            [df.schema[source_col], StructField("_base", IntegerType()), StructField("_bound", LongType())]
        ),
    )
    key = _md5_key60(id_col, seed)
    out = (
        df.join(F.broadcast(plan), source_col)
        .withColumn(
            "_n",
            F.col("_base")
            + F.when(key < F.col("_bound"), F.lit(1)).otherwise(F.lit(0)),
        )
        .filter(F.col("_n") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
    )
    return out.select(*df.columns, copy_col)


def cap_per_group(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    score_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep at most ``cap`` documents per ``group_col`` value — the
    RefinedWeb-style per-domain/per-source cap that stops a handful of hot
    hosts from dominating a corpus. With ``score_col`` the kept set is the
    group's top ``cap`` by (score DESC, ``id_col`` ASC); without, a
    deterministic md5 coin on (id, seed) picks the survivors — a pure
    function of the row, independent of partitioning and cluster size, so
    re-runs keep the identical set (``sample()`` would not).

    Scale shape: the corpus is NEVER globally windowed. (1) one counts
    pass finds the over-cap groups (map-side partial agg, G tiny rows
    shuffle; eagerly checkpointed, so calling this runs that one job);
    (2) a broadcast null-safe join splits the corpus map-side —
    under-cap rows pass through with ZERO shuffle (at web scale that is
    almost all rows: domains are Zipfian but the cap targets the head);
    (3) only over-cap rows enter the top-``cap`` window, and Catalyst
    rewrites its ``row_number() <= cap`` filter into a PARTIAL
    WindowGroupLimit BELOW the exchange (plan-locked) — every map task
    forwards at most ``cap`` rows per group, so a 10⁹-doc host ships
    ≤ cap × n_tasks rows into its reducer, never 10⁹. (A hand-rolled
    salted pre-window was measured against this and REMOVED: it spends an
    extra full exchange to do what the native rank-limit pushdown does
    map-side for free.)

    NULL groups form a group of their own (null-safe throughout). NULL
    scores rank last. NULL ids have no stable coin/tie-break — with a
    score they tie after (score, NULL); on the coin path they sort as one
    leading block (document ids should be non-null).
    """
    from pyspark.sql import Window

    from sketchlib.spark.packing import _md5_key60

    cap = int(cap)
    if cap < 0:
        raise ValueError(f"cap must be non-negative, got {cap}")
    if cap == 0:
        return df.limit(0)
    # eager checkpoint: the tiny over-cap frame (G_over rows) is consumed by
    # BOTH union branches below — without it each branch re-runs the counts
    # pass (one extra corpus scan per branch, plan-verified)
    over = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") > cap)
        .select(F.col(group_col).alias("_g"), F.lit(True).alias("_over"))
        .localCheckpoint()
    )
    # null-safe equi-join: a NULL group must match its own counts row, and
    # the _over marker (never NULL on a match) is what distinguishes
    # "matched an over-cap NULL group" from "no match" (memory trap: plain
    # equi-joins silently drop NULL keys)
    flagged = df.join(F.broadcast(over), F.col(group_col).eqNullSafe(F.col("_g")), "left")
    under = flagged.filter(F.col("_over").isNull()).select(*df.columns)
    hot = flagged.filter(F.col("_over").isNotNull()).select(*df.columns)

    if score_col is not None:
        order = [F.desc_nulls_last(score_col), F.asc(id_col)]
        key_cols: list = []
    else:
        hot = hot.withColumn("_okey", _md5_key60(id_col, seed))
        order = [F.asc("_okey"), F.asc(id_col)]
        key_cols = ["_okey"]

    w = Window.partitionBy(group_col).orderBy(*order)
    kept_hot = (
        hot.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= cap)
        .drop("_r", *key_cols)
    )
    return under.unionByName(kept_hot).select(*df.columns)


def source_overlap(
    df: DataFrame, fp_col: str, group_col: str = "source"
) -> DataFrame:
    """EXACT pairwise overlap matrix between groups on a distinct
    fingerprint column — the mixture-design question "how much does source
    A already contain of source B?" (shared vocabulary, shared doc
    fingerprints, shared url domains…), answered for every unordered group
    pair as (group_a, group_b, n_a, n_b, n_common, jaccard).

    Scale shape: ONE groupBy(fp) with map-side partial aggregation builds
    each fingerprint's sorted set of groups (the shuffle carries distinct
    fingerprints once — never a self-join of the corpus on fp, which would
    shuffle the distinct table twice and fan out G× on hot fps); group
    pairs then expand map-side from the ≤G-element array (G = #groups, so
    the pair stream is bounded by distinct_fps·G²/2 with G small by
    construction — this is a SOURCE-level report, not near-dup detection:
    for high-cardinality pairing use the LSH paths in spark/dedup.py), and
    per-group distinct sizes fall out of the same arrays. The final joins
    glue G-row and G²-row frames (AQE broadcasts them).

    For the 100 TB variant that never shuffles distinct fingerprints at
    all, register per-group HLL + MinHash sketches and use
    query.jaccard_df / intersection_estimate — this operator is their
    exact oracle at test scale and the exact answer when the distinct
    stream fits a shuffle. NULL groups and NULL fingerprints are excluded.
    """
    base = (
        df.select(F.col(group_col).cast("string").alias("g"), F.col(fp_col).alias("fp"))
        .filter(F.col("g").isNotNull() & F.col("fp").isNotNull())
    )
    sets = base.groupBy("fp").agg(F.array_sort(F.collect_set("g")).alias("gs"))
    sizes = (
        sets.select(F.explode("gs").alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        sets.filter(F.size("gs") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(gs, (a, i) -> "
                    "transform(slice(gs, i + 2, size(gs) - i - 1), "
                    "b -> struct(a AS ga, b AS gb))))"
                )
            ).alias("p")
        )
        .select("p.ga", "p.gb")
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("g").alias("ga"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("g").alias("gb"), F.col("n").alias("n_b"))
    # every unordered pair appears, including DISJOINT ones (n_common = 0) —
    # "these sources share nothing" is a mixture-design answer too
    all_pairs = sa.crossJoin(sb).filter(F.col("ga") < F.col("gb"))
    return (
        all_pairs.join(F.broadcast(pairs), ["ga", "gb"], "left")
        .withColumn("n_common", F.coalesce("n_common", F.lit(0)))
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("group_a", "group_b")
    )


def source_divergence(
    df: DataFrame, token_col: str, group_col: str = "source"
) -> DataFrame:
    """EXACT pairwise Jensen-Shannon divergence between per-group token
    UNIGRAM DISTRIBUTIONS — the mixture-design question `source_overlap`
    cannot answer: two sources can share 90% of their vocabulary (high
    Jaccard) yet USE it with completely different frequencies (high JSD),
    and it is the frequency profile, not the vocabulary set, that predicts
    whether adding source B changes what a model trained on A sees.
    Returns (group_a, group_b, n_common, js_divergence) for every unordered
    pair; JSD is in bits, 0 = identical distributions, 1 = disjoint support
    (base-2 JSD is bounded by 1, Lin 1991).

    Input is FLAT occurrence rows (one row per token occurrence, as from
    ``explode(pre_tokens(text))``) so the same flat frame feeds this and
    ``source_overlap``. NULL groups/tokens are excluded.

    Scale shape — the G² term never touches the corpus: one
    groupBy(group, token) with map-side partial agg collapses occurrences
    to the distinct (g, w) profile (the only corpus-sized shuffle, volume
    ≈ G·vocab after combine), one groupBy(w) builds each word's ≤G-element
    (group, p) array, and pairs expand MAP-SIDE from those arrays exactly
    as in source_overlap. The decomposition keeps single-support words out
    of the pair stream entirely:

        JSD(P,Q) = ½(1−C_P) + ½(1−C_Q) + Σ_{w∈both} term(p_w, q_w)

    where C_P = Σ_{w∈both} p_w (P's probability mass on the SHARED
    vocabulary) and term(p,q) = ½p·log2(2p/(p+q)) + ½q·log2(2q/(p+q)) —
    every word outside the shared support contributes exactly ½·its mass,
    which the coverage terms fold in without enumerating those words per
    pair. Disjoint pairs come out at exactly 1.0. The final joins glue
    G-row and G²-row frames (broadcast).
    """
    base = (
        df.select(F.col(group_col).cast("string").alias("g"), F.col(token_col).alias("w"))
        .filter(F.col("g").isNotNull() & F.col("w").isNotNull())
    )
    cnt = base.groupBy("g", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("g").agg(F.sum("c").alias("n"))
    probs = cnt.join(F.broadcast(tot), "g").select(
        "g", "w", (F.col("c").cast("double") / F.col("n")).alias("p")
    )
    arrs = probs.groupBy("w").agg(
        F.array_sort(F.collect_list(F.struct(F.col("g"), F.col("p")))).alias("gp")
    )
    pairs = (
        arrs.filter(F.size("gp") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(gp, (x, i) -> "
                    "transform(slice(gp, i + 2, size(gp) - i - 1), "
                    "y -> struct(x.g AS ga, y.g AS gb, x.p AS pa, y.p AS pb))))"
                )
            ).alias("t")
        )
        .select("t.ga", "t.gb", "t.pa", "t.pb")
    )
    pa, pb = F.col("pa"), F.col("pb")
    # the oracle mirrors this exact expression shape (same IEEE ops in the
    # same order) so the only cross-engine drift is summation order
    term = F.lit(0.5) * pa * F.log2(F.lit(2.0) * pa / (pa + pb)) + F.lit(0.5) * pb * F.log2(
        F.lit(2.0) * pb / (pa + pb)
    )
    com = pairs.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum("pa").alias("cov_a"),
        F.sum("pb").alias("cov_b"),
        F.sum(term).alias("term_sum"),
    )
    ga = tot.select(F.col("g").alias("ga"))
    gb = tot.select(F.col("g").alias("gb"))
    all_pairs = ga.crossJoin(gb).filter(F.col("ga") < F.col("gb"))
    out = all_pairs.join(F.broadcast(com), ["ga", "gb"], "left").fillna(
        {"n_common": 0, "cov_a": 0.0, "cov_b": 0.0, "term_sum": 0.0}
    )
    jsd = (
        F.lit(0.5) * (F.lit(1.0) - F.col("cov_a"))
        + F.lit(0.5) * (F.lit(1.0) - F.col("cov_b"))
        + F.col("term_sum")
    )
    # JSD ∈ [0, 1] mathematically; float residue (~1e-16 on identical or
    # disjoint pairs) is clamped so the boundary cases come out exact
    jsd = F.greatest(F.lit(0.0), F.least(F.lit(1.0), jsd))
    return out.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        "n_common",
        jsd.alias("js_divergence"),
    ).orderBy("group_a", "group_b")


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """DETERMINISTIC weighted sampling without replacement — k rows
    (per ``group_col`` value, or globally when None) drawn with probability
    proportional to ``weight_col`` via Efraimidis–Spirakis A-Res (IPL 2006):
    each row gets priority ln(u)/w with u the (0,1) fraction of the shared
    60-bit md5(id:seed) key, and the k LARGEST priorities win — equivalent
    to ordering by u^(1/w), the paper's exact weighted-without-replacement
    scheme. The coin is a pure function of (id, seed): independent of
    partitioning, cluster size, and file layout (re-runs/audits draw the
    identical sample; `rand()` would not), and any engine with md5 replays
    it — the driver query value-matches every kept row against DuckDB
    evaluating the same expression.

    The fourth classic sample kind beside D13's uniform/universe/stratified:
    "keep the best-weighted k per source, but stochastically" — quality-
    WEIGHTED selection keeps tail documents with nonzero probability where
    a deterministic top-k by score (cap_per_group) would never pick them.

    Scale shape: priorities are pure codegen columns (no Python, no extra
    scan). Grouped: one per-group window whose row_number ≤ k filter
    Catalyst rewrites into a partial WindowGroupLimit BELOW the exchange
    (plan-locked) — every map task forwards at most k rows per group, so
    a 10⁹-doc group ships ≤ k·n_tasks rows, never 10⁹. Global: orderBy +
    limit plans as TakeOrderedAndProject (per-partition top-k, driver
    merge of k·P rows — keep global k modest; per-group is the scale
    path). Rows with NULL/non-positive weight or NULL id are EXCLUDED
    (no mass / no stable coin — a silent default would bias the draw).
    """
    from pyspark.sql import Window

    from sketchlib.spark.packing import _md5_key60

    k = int(k)
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    wd = F.col(weight_col).cast("double")
    # NaN must be excluded EXPLICITLY: Spark evaluates NaN > 0 as TRUE and
    # sorts NaN above every double, so a NaN weight (failed scorer) would
    # pass the filter and its NaN priority would crowd out every valid row
    eligible = df.filter(
        wd.isNotNull() & ~F.isnan(wd) & (wd > 0) & F.col(id_col).isNotNull()
    )
    u = (_md5_key60(id_col, seed).cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    pri = F.log(u) / F.col(weight_col).cast("double")
    keyed = eligible.withColumn("_pri", pri)
    if group_col is None:
        return (
            keyed.orderBy(F.desc("_pri"), F.asc(id_col)).limit(k).drop("_pri")
        )
    w = Window.partitionBy(group_col).orderBy(F.desc("_pri"), F.asc(id_col))
    return (
        keyed.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r", "_pri")
    )


def histogram_df(
    df: DataFrame,
    value_col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
    group_col: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Equi-width HISTOGRAM of a numeric column — the profiling primitive
    every data card leads with (length distributions, score distributions),
    exact and zero-filled: (group?, bin, lo_edge, hi_edge, cnt) with EVERY
    bin present even when empty (plots and cross-run diffs need the empty
    bins; a missing row is indistinguishable from a dropped one).

    Edges: ``bins`` equal widths over [lo, hi]; when lo/hi are omitted
    they are the column's exact global min/max (one map-side-combined
    pass) — GLOBAL even when ``group_col`` is given, so per-group
    histograms share edges and are directly comparable (the point of a
    grouped histogram). Bin assignment is the closed form
    ``least(bins-1, floor((x-lo)/width))`` — values AT hi land in the last
    bin; with caller-supplied bounds, rows OUTSIDE [lo, hi] are excluded
    (never silently clipped into edge bins — clipping fabricates mass at
    the boundary) and NULLs are excluded. The expression is plain IEEE
    f64 arithmetic, so a relational oracle computing the identical shape
    assigns identical bins — exact cnt match, no float tolerance needed;
    ``round_to`` rounds only the edge REPORTING columns.

    Scale shape: one optional min/max pass and ONE groupBy((g), bin) with
    map-side partial agg — shuffle volume ≈ tasks × G × bins, corpus
    independent; zero-fill is a bins-sized (× G) frame LEFT-joined against
    the counts (broadcast glue, never touches the corpus).
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull()).select(
        *([F.col(group_col).cast("string").alias("g")] if group_col else []),
        x.alias("x"),
    )
    if group_col:
        base = base.filter(F.col("g").isNotNull())
    if lo is None or hi is None:
        mm = df.select(
            F.min(x).alias("lo"), F.max(x).alias("hi")
        ).collect()[0]
        lo = float(mm["lo"]) if lo is None else float(lo)
        hi = float(mm["hi"]) if hi is None else float(hi)
    else:
        lo, hi = float(lo), float(hi)
    if not hi > lo:
        raise ValueError(f"need hi > lo, got lo={lo} hi={hi}")
    width = (hi - lo) / bins
    idx = F.least(
        F.lit(bins - 1), F.floor((F.col("x") - F.lit(lo)) / F.lit(width))
    ).cast("long")
    counted = (
        base.filter((F.col("x") >= lo) & (F.col("x") <= hi))
        .withColumn("bin", idx)
        .groupBy(*(["g"] if group_col else []), "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = df.sparkSession
    shell = spark.range(bins).select(F.col("id").alias("bin"))
    if group_col:
        groups = base.select("g").distinct()
        shell = groups.crossJoin(F.broadcast(shell))
    keys = (["g"] if group_col else []) + ["bin"]
    lo_edge = F.lit(lo) + F.col("bin").cast("double") * F.lit(width)
    hi_edge = F.lit(lo) + (F.col("bin") + F.lit(1)).cast("double") * F.lit(width)
    if round_to is not None:
        lo_edge, hi_edge = F.round(lo_edge, round_to), F.round(hi_edge, round_to)
    out_cols = (
        ([F.col("g").alias("group")] if group_col else [])
        + [
            "bin",
            lo_edge.alias("lo_edge"),
            hi_edge.alias("hi_edge"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        ]
    )
    order = (["group"] if group_col else []) + ["bin"]
    return shell.join(counted, keys, "left").select(*out_cols).orderBy(*order)
