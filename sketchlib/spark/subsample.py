"""Variational subsampling — VerdictDB's error estimator, Spark-first.

`[paper:VerdictDB §3.2]`: partition the sample's rows into b ≈ n^0.3
disjoint SUBSAMPLES of ~n^0.7 rows each, compute the statistic on every
subsample, and read the error of the FULL-sample estimate off the spread
of the subsample estimates — sqrt(n_s)·(ĝ_i − g) has (asymptotically) the
same distribution as sqrt(n)·(ĝ − g), so a quantile of the centered,
sqrt(n_i)-scaled subsample deviations, divided by sqrt(n), is a
confidence half-width for ANY smooth statistic, closed-form or not.
This complements the library's closed-form CLT bounds (sampling.py):
where those exist the two cross-validate; where they don't (or the user
distrusts an asymptotic variance formula), subsampling still answers.

Spark shape — everything rides ONE scan of the sample:

  sample rows ──(+ _sid = floor(rand(seed)·b))──► groupBy(group, _sid)
  → per-block (n_i, Σv, stable central moments)   [the only wide exchange,
    b×groups rows]
  → window over group: full-sample totals + pooled moments (block-mean
    shifted pooling — no raw power sums, no catastrophic cancellation)
  → groupBy(group): exact PERCENTILE of |u_i| = |sqrt(n_i)·(ĝ_i − ĝ)|

The block frame is b×groups rows (KBs), so the window and final
aggregation are free; at 100 TB the cost profile is identical to the
closed-form path — one pass over the p-fraction scramble.

Design notes, all load-bearing:

- _sid comes from ``F.rand(seed)`` (uniform, value-independent),
  NOT a row-content hash: a hash of a low-cardinality projection (e.g. a
  dimension column) would collapse duplicates into few blocks and destroy
  the subsample geometry. rand(seed) is seeded per-partition, so the
  assignment is deterministic for a fixed file layout; it is added AFTER
  any WHERE, so predicate pushdown to the scan is unaffected.
- b defaults to clamp(n^0.3, 16, 4096) — the paper's n_s = n^0.7 rule.
  ``n_total`` may be the REGISTERED row count (rows_sampled): b only
  needs the right order of magnitude, the error normalization below uses
  the actual scanned totals. That shortcut is only valid when the WHOLE
  sample is read — under a selective WHERE the registered count oversizes
  b until blocks hold ~1 row and the spread no longer measures the
  estimator's sampling error (sql.py counts the filtered sample instead;
  n_total=None does the same here at the cost of one count job).
- Per-block estimates mirror the full-sample estimators: count b·n_i/p,
  sum b·Σv/p (each block is a Bernoulli(p/b) sample of the table), avg /
  variance / covariance / correlation are ratio-type (no scale-up).
- Half-width: max(q_conf(|u_i|), z·sd(u_i))/sqrt(n) · sqrt(1−p).
  The empirical quantile alone under-covers at high confidence: with
  b blocks it saturates at max|u_i| once conf > 1−1/b (a 99.9% CI read
  off 22 points IS the max of 22 points — starved of the tail), so the
  normal-scaled subsample spread z·sd(u_i) is the floor; conversely the
  quantile picks up skew/heavy tails the normal scaling misses. Both
  read off the same b-row frame, and max() errs wide, never narrow.
  The sqrt(1−p) factor is the finite-population correction the
  subsample spread cannot see (blocks are drawn at rate p/b ≈ 0, the
  full sample at rate p); it matches the closed-form bounds' (1−p)
  behavior and zeroes the error at p=1, and dropping the (1−p/b)
  denominator keeps it conservative.
- Groups whose rows landed in < 4 nonempty blocks report NULL error —
  a spread over 1–3 points is noise, not a quantile (the estimate column
  itself is still served).

Verdict parity: this is the reference's §3.2 estimator re-expressed as
two tiny post-scan aggregations instead of a per-row operator tree.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

_MIN_BLOCKS = 4  # below this, a quantile of the deviations is noise


def _coverage(z: float) -> float:
    """Two-sided normal coverage of ±z — the |u| quantile level that makes
    the subsample CI comparable to the closed-form ±z·se bounds."""
    return math.erf(z / math.sqrt(2.0))


def subsample_blocks(n_total: int) -> int:
    """The paper's b ≈ n^0.3 (subsample size n^0.7), clamped to [16, 4096]:
    enough blocks for an empirical quantile, blocks big enough for the
    within-block asymptotics."""
    return max(16, min(4096, int(round(max(int(n_total), 1) ** 0.3))))


def _with_sid(sample: DataFrame, b: int, seed: int):
    return sample.withColumn(
        "_sid", F.floor(F.rand(seed) * F.lit(int(b))).cast("int")
    )


def _finalize(blk, gcols, p, z, pairs):
    """Shared tail: u columns over the block frame → per-group quantile.

    ``pairs`` is [(est_name, err_name, est_column, u_column)] built over
    the block frame's columns plus the window totals already attached
    (``_n``, ``_S``/pooled moments)."""
    conf = _coverage(z)
    fpc = math.sqrt(max(0.0, 1.0 - p))
    sel = [F.col(c) for c in blk.columns]
    for est_name, _err_name, est_c, u_c in pairs:
        sel.append(est_c.alias(f"_est_{est_name}"))
        sel.append(u_c.alias(f"_u_{est_name}"))
    staged = blk.select(*sel)
    aggs = []
    for est_name, err_name, *_ in pairs:
        u = F.col(f"_u_{est_name}")
        aggs.append(F.first(F.col(f"_est_{est_name}")).alias(est_name))
        aggs.append(
            F.when(
                F.count_distinct(F.col("_sid")) >= _MIN_BLOCKS,
                F.lit(fpc)
                * F.greatest(
                    F.percentile(F.abs(u), F.lit(conf)),
                    F.lit(z) * F.stddev_samp(u),
                )
                / F.sqrt(F.first(F.col("_n"))),
            ).alias(err_name)
        )
    return staged.groupBy(*gcols).agg(*aggs)


def subsample_agg_from_uniform_sample(
    sample: DataFrame,
    group_by: str | None,
    value_col: str,
    ratio: float,
    n_total: int | None = None,
    b: int | None = None,
    z: float = 1.96,
    moments: bool = False,
    seed: int = 0,
) -> DataFrame:
    """COUNT/SUM/AVG (and with ``moments=True``, VARIANCE/STDDEV) from an
    already-drawn Bernoulli(p) sample, with VARIATIONAL-SUBSAMPLING error
    bounds — same output columns as sampling.approx_agg_from_uniform_sample
    (est_count/count_err/est_sum/sum_err/est_avg/avg_err [+ est_variance/
    variance_err/est_stddev/stddev_err]), so the two estimators are
    drop-in interchangeable and directly comparable.

    The ESTIMATES are identical to the closed-form path by construction
    (same totals, same stable pooled moments); only the error columns come
    from the subsample spread instead of a variance formula."""
    p = float(ratio)
    if not (0.0 < p <= 1.0):
        raise ValueError(f"ratio must be in (0, 1], got {ratio!r}")
    if b is None:
        n = int(n_total) if n_total is not None else sample.count()
        b = subsample_blocks(n)
    v = F.col(value_col)
    gcols = [group_by] if group_by else []
    s = _with_sid(sample, b, seed)
    aggs = [F.count("*").alias("n_i"), F.sum(v).alias("sum_i")]
    if moments:
        aggs += [F.var_samp(v).alias("s2_i"), F.var_pop(v).alias("m2_i")]
    blk = s.groupBy(*gcols, "_sid").agg(*aggs)
    w = Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    n_i, sum_i = F.col("n_i"), F.col("sum_i")
    blk = blk.select(
        *blk.columns,
        F.sum(n_i).over(w).alias("_n"),
        F.sum(sum_i).over(w).alias("_S"),
    )
    if moments:
        # pooled var_pop, block-mean-shifted (numerically stable — the
        # same reason sampling.py uses var_pop/var_samp, not power sums):
        # M2 = Σ n_i·m2_i + Σ n_i·(mean_i − mean)²
        mean = F.col("_S") / F.col("_n")
        dm = sum_i / n_i - mean
        blk = blk.select(
            *blk.columns,
            (
                (F.sum(n_i * F.col("m2_i")).over(w) + F.sum(n_i * dm * dm).over(w))
                / F.col("_n")
            ).alias("_m2"),
        )
    _n, _S = F.col("_n"), F.col("_S")
    pairs = [
        (
            "est_count",
            "count_err",
            _n / p,
            F.sqrt(n_i) * (F.lit(float(b)) * n_i / p - _n / p),
        ),
        (
            "est_sum",
            "sum_err",
            _S / p,
            F.sqrt(n_i) * (F.lit(float(b)) * sum_i / p - _S / p),
        ),
        (
            "est_avg",
            "avg_err",
            _S / _n,
            F.sqrt(n_i) * (sum_i / n_i - _S / _n),
        ),
    ]
    if moments:
        # pooled var_samp of the whole sample (ratio statistic — the
        # estimate matches the closed-form path's var_samp exactly)
        est_var = F.when(_n > 1, F.col("_m2") * _n / (_n - 1))
        est_sd = F.sqrt(est_var)
        pairs += [
            (
                "est_variance",
                "variance_err",
                est_var,
                F.sqrt(n_i) * (F.col("s2_i") - est_var),  # s2_i NULL at n_i<2
            ),
            (
                "est_stddev",
                "stddev_err",
                est_sd,
                F.sqrt(n_i) * (F.sqrt(F.col("s2_i")) - est_sd),
            ),
        ]
    return _finalize(blk, gcols, p, z, pairs)


def subsample_count_distinct_from_universe_sample(
    sample: DataFrame,
    group_by: str | None,
    col: str,
    ratio: float,
    b: int | None = None,
    z: float = 1.96,
    seed: int = 0,
) -> DataFrame:
    """COUNT(DISTINCT col) with a subsampling error bound from a UNIVERSE
    scramble (hash(col) < p — `[paper:VerdictDB §3.1]`). A universe sample
    keeps whole hash-slices of the VALUE DOMAIN, so the sample's distinct
    VALUES are a Bernoulli(p) sample of the domain — one row per (group,
    value) and the row-count estimator applies verbatim to that frame:
    est = D_s/p (identical to the closed-form path's estimate), error from
    the spread of the per-block counts instead of the binomial formula.

    Output: ([group,] est_distinct, distinct_err) — the closed-form
    route's columns, absolute bound, drop-in interchangeable.

    Cost note: the distinct reduction is the one wide exchange (the same
    shuffle the closed-form count-distinct pays); it is localCheckpointed
    because two jobs read it — the D_s count that sizes b (a registered
    ROW count would oversize b when values repeat heavily — the same
    geometry trap as WHERE) and the block aggregation."""
    p = float(ratio)
    if not (0.0 < p <= 1.0):
        raise ValueError(f"ratio must be in (0, 1], got {ratio!r}")
    gcols = [group_by] if group_by else []
    dv = (
        sample.select(*gcols, col)
        .where(F.col(col).isNotNull())
        .distinct()
        .withColumn("_one", F.lit(1.0))
    )
    if b is None:
        # checkpointed ONLY here — two jobs then read dv (the D_s count
        # that sizes b, and the block aggregation); with an explicit b a
        # single lazy reader needs no materialization
        dv = dv.localCheckpoint(eager=True)
        b = subsample_blocks(dv.count())
    out = subsample_agg_from_uniform_sample(
        dv, group_by, "_one", p, b=b, z=z, seed=seed
    )
    out = out.select(
        *gcols,
        F.col("est_count").alias("est_distinct"),
        F.col("count_err").alias("distinct_err"),
    )
    # groups whose sampled values are ALL NULL vanished with the isNotNull
    # filter, but they are real groups with zero distinct values — the
    # closed-form route (count_distinct ignores NULLs, groupBy keeps the
    # group) reports them as (0, 0); reattach them so the two estimators
    # stay drop-in interchangeable. NULL-safe join: a NULL group key is
    # itself a real group.
    est, err = F.col("est_distinct"), F.col("distinct_err")
    zeroed = [
        F.coalesce(est, F.lit(0.0)).alias("est_distinct"),
        F.when(est.isNull(), F.lit(0.0)).otherwise(err).alias("distinct_err"),
    ]
    if group_by:
        allg = sample.select(group_by).distinct()
        out = (
            allg.join(
                out.withColumnRenamed(group_by, "_g_out"),
                F.col(group_by).eqNullSafe(F.col("_g_out")),
                "left",
            )
            .drop("_g_out")
            .select(group_by, *zeroed)
        )
    else:
        # an empty/all-NULL sample: the global aggregate emits one row of
        # NULLs — normalize to the closed-form route's (0.0, 0.0)
        out = out.select(*zeroed)
    return out


def subsample_percentile_from_uniform_sample(
    sample: DataFrame,
    group_by: str | None,
    value_col: str,
    qs: list[float],
    ratio: float,
    n_total: int | None = None,
    b: int | None = None,
    z: float = 1.96,
    seed: int = 0,
) -> DataFrame:
    """Quantiles with VALUE-UNIT confidence half-widths — the capability
    the closed-form path cannot offer. The scramble-percentile estimator
    (sql.py A12-over-sample) bounds the RANK error (√(q(1−q)/n), CLT for
    the empirical process); translating rank error into value units needs
    the density at the quantile, which has no closed form. The subsample
    spread prices it directly: per-block empirical quantiles q̂_i, the
    full-sample quantile q̂, u_i = √n_i·(q̂_i − q̂), half-width =
    max(q_conf(|u_i|), z·sd(u_i))/√n · √(1−p) — the Politis–Romano
    subsampling CI for quantiles (asymptotically normal, density folded
    into the spread, never estimated).

    Output: ([group,] q, value, value_err). ``value`` is the EXACT
    percentile of the full sample — identical to the closed-form path's
    estimate by construction. Costs ONE extra aggregation pass over the
    p-fraction scramble (quantiles don't pool across blocks the way
    moments do, so the full-sample estimate is its own groupBy); both
    passes stay on the sample, never the corpus."""
    p = float(ratio)
    if not (0.0 < p <= 1.0):
        raise ValueError(f"ratio must be in (0, 1], got {ratio!r}")
    qs = [float(q) for q in qs]
    if not qs or not all(0.0 < q < 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1), got {qs!r}")
    if b is None:
        n = int(n_total) if n_total is not None else sample.count()
        b = subsample_blocks(n)
    conf = _coverage(z)
    fpc = math.sqrt(max(0.0, 1.0 - p))
    v = F.col(value_col)
    gcols = [group_by] if group_by else []
    s = _with_sid(sample, b, seed)
    qarr = F.array(*[F.lit(q) for q in qs])
    # pass 1: per-block quantile vector + block size
    blk = s.groupBy(*gcols, "_sid").agg(
        F.percentile(v, qarr).alias("_qv"), F.count("*").alias("n_i")
    )
    # pass 2: full-sample quantile vector + total rows (the estimate)
    full = s.groupBy(*gcols).agg(
        F.percentile(v, qarr).alias("_qfull"), F.count("*").alias("_n")
    )
    if gcols:
        # eqNullSafe, not an equi-join: a NULL group key is a real group
        # (groupBy produced a row for it on both sides) and a standard
        # join would silently drop it from the output
        g = gcols[0]
        j = blk.join(
            full.withColumnRenamed(g, "_g_full"),
            blk[g].eqNullSafe(F.col("_g_full")),
        ).drop("_g_full")
    else:
        j = blk.crossJoin(full)
    # one row per (group, block, quantile): u_i per quantile index
    j = j.select(
        *gcols, "n_i", "_n", "_sid",
        F.posexplode(F.zip_with(
            F.col("_qv"), F.col("_qfull"), lambda bq, fq: F.sqrt(F.col("n_i")) * (bq - fq)
        )).alias("_qi", "_u"),
        F.element_at(F.col("_qfull"), F.col("_qi") + 1).alias("value"),
    )
    out = (
        j.groupBy(*gcols, "_qi")
        .agg(
            F.first("value").alias("value"),
            F.when(
                F.count_distinct(F.col("_sid")) >= _MIN_BLOCKS,
                F.lit(fpc)
                * F.greatest(
                    F.percentile(F.abs(F.col("_u")), F.lit(conf)),
                    F.lit(z) * F.stddev_samp(F.col("_u")),
                )
                / F.sqrt(F.first(F.col("_n"))),
            ).alias("value_err"),
        )
        .withColumn("q", F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("_qi") + 1))
        .select(*gcols, "q", "value", "value_err")
    )
    return out


def subsample_bivariate_from_uniform_sample(
    sample: DataFrame,
    group_by: str | None,
    x_col: str,
    y_col: str,
    ratio: float,
    n_total: int | None = None,
    b: int | None = None,
    z: float = 1.96,
    seed: int = 0,
) -> DataFrame:
    """COVARIANCE and PEARSON CORRELATION with variational-subsampling
    error bounds — same output columns as
    sampling.approx_bivariate_from_uniform_sample (est_covar/covar_err/
    est_corr/corr_err). This is where subsampling earns its keep: the
    closed-form covariance CI leans on a Cauchy–Schwarz μ₂₂ bound and the
    correlation CI on the Fisher z approximation — the subsample spread
    needs neither."""
    p = float(ratio)
    if not (0.0 < p <= 1.0):
        raise ValueError(f"ratio must be in (0, 1], got {ratio!r}")
    if b is None:
        n = int(n_total) if n_total is not None else sample.count()
        b = subsample_blocks(n)
    x, y = F.col(x_col), F.col(y_col)
    gcols = [group_by] if group_by else []
    s = _with_sid(sample, b, seed)
    blk = s.groupBy(*gcols, "_sid").agg(
        F.count("*").alias("n_i"),
        F.sum(x).alias("sx_i"),
        F.sum(y).alias("sy_i"),
        F.covar_samp(x, y).alias("cov_i"),
        F.covar_pop(x, y).alias("cp_i"),
        F.var_pop(x).alias("vx_i"),
        F.var_pop(y).alias("vy_i"),
    )
    w = Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    n_i = F.col("n_i")
    blk = blk.select(
        *blk.columns,
        F.sum(n_i).over(w).alias("_n"),
        F.sum(F.col("sx_i")).over(w).alias("_Sx"),
        F.sum(F.col("sy_i")).over(w).alias("_Sy"),
    )
    mx, my = F.col("_Sx") / F.col("_n"), F.col("_Sy") / F.col("_n")
    dx, dy = F.col("sx_i") / n_i - mx, F.col("sy_i") / n_i - my
    # block-mean-shifted pooling for the three population moments (same
    # stability argument as the univariate path)
    blk = blk.select(
        *blk.columns,
        (
            (F.sum(n_i * F.col("cp_i")).over(w) + F.sum(n_i * dx * dy).over(w))
            / F.col("_n")
        ).alias("_cp"),
        (
            (F.sum(n_i * F.col("vx_i")).over(w) + F.sum(n_i * dx * dx).over(w))
            / F.col("_n")
        ).alias("_vx"),
        (
            (F.sum(n_i * F.col("vy_i")).over(w) + F.sum(n_i * dy * dy).over(w))
            / F.col("_n")
        ).alias("_vy"),
    )
    _n = F.col("_n")
    est_cov = F.when(_n > 1, F.col("_cp") * _n / (_n - 1))
    vx, vy = F.col("_vx"), F.col("_vy")
    raw_r = F.col("_cp") / F.sqrt(vx * vy)
    est_r = F.when(
        (_n > 1) & (vx > 0) & (vy > 0),
        F.least(F.greatest(raw_r, F.lit(-1.0)), F.lit(1.0)),
    )
    # per-block r, guarded like the pooled one (NULL blocks drop out of
    # the percentile — Spark aggregate functions ignore NULLs)
    r_i = F.when(
        (n_i > 1) & (F.col("vx_i") > 0) & (F.col("vy_i") > 0),
        F.least(
            F.greatest(F.col("cp_i") / F.sqrt(F.col("vx_i") * F.col("vy_i")), F.lit(-1.0)),
            F.lit(1.0),
        ),
    )
    pairs = [
        ("est_covar", "covar_err", est_cov, F.sqrt(n_i) * (F.col("cov_i") - est_cov)),
        ("est_corr", "corr_err", est_r, F.sqrt(n_i) * (r_i - est_r)),
    ]
    return _finalize(blk, gcols, p, z, pairs)
