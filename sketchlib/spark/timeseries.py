"""Time-series operators Spark lacks natively: as-of join.

An as-of join assigns every left row the most recent right row for its key
(``right_ts <= left_ts``, backward, inclusive — pandas ``merge_asof`` /
DuckDB ``ASOF JOIN`` semantics), e.g. "the price/config/session state in
effect when this event happened" over training-event logs.

Scale shape (the reason not to write ``l.join(r, l.ts >= r.ts)``): the naive
inequality join is a per-key cartesian product — quadratic in rows-per-key.
This implementation union-tags the two inputs, shuffles ONCE on the join key,
sorts within the partition by (ts, side), and takes a running
``last(value, ignorenulls=True)`` window — O(n log n) per key, one shuffle,
no row ever multiplied. The window's running state is O(1) per value column.

Skew: by default one key lands in one window task (the ordering requirement
makes salting non-trivial). ``time_buckets=n`` is the hot-key escape hatch:
rows are pre-partitioned by (key, coarse time bucket) so a key with 10^9
events spreads over n tasks, and correctness is restored by BOUNDARY
CARRY-IN — the as-of state entering each bucket (the last right row of any
earlier bucket, computed on a tiny per-(key, bucket) summary and
forward-filled across empty buckets) is injected as a synthetic right row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    time_buckets: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the matched right row's value_cols.

    ``direction='backward'``: match the latest right row with
    right_ts <= left_ts (inclusive); ``'forward'``: earliest right row with
    right_ts >= left_ts. Unmatched left rows keep NULL values (left-join
    semantics). ``tolerance`` (seconds for timestamps, native units for
    numerics): matches farther than this are nulled out, like pandas
    merge_asof. Output: left columns + value_cols + ``_matched_ts``.

    ``time_buckets``: split each key's timeline into n equal-width buckets
    and window per (key, bucket) with boundary carry-in — value-identical
    results (tested, incl. 90%-hot-key skew), bounded task size. Ties among
    right rows at the exact same (key, ts) are resolved by value order on
    this path (the unbucketed path leaves such ties partition-dependent).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right value columns collide with left columns: {sorted(clash)}")

    lhs = (
        left.withColumn("_is_right", F.lit(0))
        .withColumn("_ts", F.col(left_ts))
        .withColumn("_rts", F.lit(None).cast(rtypes[right_ts]))
    )
    for c in value_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(rtypes[c]))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in value_cols],
    ).withColumn("_is_right", F.lit(1))
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(ltypes[c]))
    cols = lhs.columns
    u = lhs.select(*cols).unionByName(rhs.select(*cols))

    part_cols = [on]
    if time_buckets and time_buckets > 1:
        backward = direction == "backward"
        tsd = F.col("_ts").cast("double")
        rng = u.agg(F.min(tsd).alias("lo"), F.max(tsd).alias("hi")).collect()[0]
        lo, hi = rng["lo"], rng["hi"]
        width = max(((hi or 0.0) - (lo or 0.0)) / time_buckets, 1e-9)
        bkt = F.least(
            F.greatest(F.floor((tsd - F.lit(lo or 0.0)) / width), F.lit(0)),
            F.lit(time_buckets - 1),
        ).cast("int")
        u = u.withColumn("_bkt", bkt)

        # boundary carry-in on a TINY per-(key, bucket) summary: the match
        # state entering bucket b is the last (backward) / first (forward)
        # right row of any earlier (later) bucket, forward-filled across
        # buckets with no right rows, injected back as a synthetic right row
        rstruct = F.struct(F.col("_ts"), F.col("_rts"), *[F.col(c) for c in value_cols])
        per_bucket = (
            u.filter(F.col("_is_right") == 1)
            .groupBy(on, "_bkt")
            .agg((F.max(rstruct) if backward else F.min(rstruct)).alias("_edge"))
        )
        occupied = u.select(on, "_bkt").distinct()
        fill_order = F.asc("_bkt") if backward else F.desc("_bkt")
        w_fill = (
            Window.partitionBy(on)
            .orderBy(fill_order)
            .rowsBetween(Window.unboundedPreceding, -1)  # strictly earlier buckets
        )
        seeds = (
            occupied.join(per_bucket, [on, "_bkt"], "left")
            .withColumn("_seed", F.last("_edge", ignorenulls=True).over(w_fill))
            .filter(F.col("_seed").isNotNull())
            .select(
                F.col(on),
                F.col("_bkt"),
                F.col("_seed._ts").alias("_ts"),
                F.col("_seed._rts").alias("_rts"),
                *[F.col(f"_seed.{c}").alias(c) for c in value_cols],
            )
            .withColumn("_is_right", F.lit(1))
        )
        for c in left.columns:
            if c not in seeds.columns:
                seeds = seeds.withColumn(c, F.lit(None).cast(ltypes[c]))
        u = u.unionByName(seeds.select(*u.columns))
        part_cols = [on, "_bkt"]

    # right rows sort BEFORE left rows at equal ts (inclusive match) in both
    # directions; forward just scans time in reverse
    order = [F.asc("_ts") if direction == "backward" else F.desc("_ts"), F.desc("_is_right")]
    w = Window.partitionBy(*part_cols).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # the matched right ROW travels as one struct: per-column last(ignorenulls)
    # would stitch values from DIFFERENT right rows whenever a right value is
    # NULL (merge_asof/ASOF JOIN match a row, nulls and all — so must we)
    row_struct = F.when(
        F.col("_is_right") == 1, F.struct(F.col("_rts").alias("_rts"), *[F.col(c) for c in value_cols])
    )
    m = F.last(row_struct, ignorenulls=True).over(w)
    out = u.select(
        *left.columns,
        F.col("_is_right"),
        *[m[c].alias(c) for c in value_cols],
        m["_rts"].alias("_matched_ts"),
    ).filter(F.col("_is_right") == 0).drop("_is_right")

    if tolerance is not None:
        diff = F.abs(F.col(left_ts).cast("double") - F.col("_matched_ts").cast("double"))
        keep = diff <= float(tolerance)
        for c in value_cols:
            out = out.withColumn(c, F.when(keep, F.col(c)))
        out = out.withColumn("_matched_ts", F.when(keep, F.col("_matched_ts")))
    return out
