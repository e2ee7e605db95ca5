"""Scoped SQL front door for the Verdict-style approximate query set.

Verdict's users type SQL; this module gives sketchlib the same entry point
for the reference query surface (SURVEY.md §2C) without building a SQL
dialect: only the STATEMENT SKELETON is parsed here —

    SELECT <approx_fn>(...)[, <approx_fn>(...) ...]
    FROM <table> | (<SELECT ...>)               -- derived tables may
    [WHERE <expr>] [GROUP BY <col>[, <col> ...]]  -- themselves be approx
    [HAVING <pred over result cols>]
    [ORDER BY <col> [ASC|DESC][, <col> [ASC|DESC] ...]] [LIMIT <n>]

and single APPROX_COUNT/APPROX_SUM aggregates over equi-joins —
``FROM a [alias] JOIN b [alias] ON qual.k = qual.k [JOIN c ON ...]
[WHERE ...] [GROUP BY col]`` — answered from a universe-scramble pair
(p-composition), a single fact-side scramble with the exact dimension(s)
broadcast (the fact×dim shape, incl. the three-table chain), or on-the-fly
sampling.

Multiple SCALAR aggregates (COUNT_DISTINCT/COUNT/SUM/AVG) compose in one
statement — every sketch aggregate becomes one SketchSpec and they all
build in a SINGLE scan; TOPK/PERCENTILE (multi-row shapes) go alone.
Aggregate arguments may be expressions (one paren nesting level); the WHERE
expression is handed verbatim to Catalyst (``DataFrame.filter`` accepts any
Spark SQL expression), so predicates are full Spark SQL, not a subset.
Supported aggregates:

    APPROX_COUNT_DISTINCT(col [, rse=0.01])      → HLL        (Q1/Q2)
    APPROX_TOPK(col, k [, eps=1e-4])             → Count-Min  (Q3)
    APPROX_TOP_SUM(key, w, k [, eps=1e-4])       → weighted Count-Min
                                                   (top keys BY SUM(w))
    APPROX_FREQUENT(col, k [, eps=1e-4])         → Misra-Gries (DETERMINISTIC
                                                   heavy hitters: never over-
                                                   counts, exact undercount
                                                   certificate — no δ)
    APPROX_PERCENTILE(col, q1[, q2, ...])        → KLL        (Q4)
        [, rank_err=ε → KLL | rel_err=α → DDSketch | weight=w → weighted
         t-digest: the value below which q of SUM(w) lies]
    APPROX_MAD(col)                              → KLL/t-digest (robust spread;
                                                   bracket certificate)
    APPROX_TRIMMED_MEAN(col [, lo, hi])          → KLL/t-digest (robust mean over
                                                   the (lo, hi] quantile window)
    APPROX_HISTOGRAM(col, n_bins)                → KLL/t-digest (equi-depth bin
                                                   edges, ≈1/n_bins mass per bin)
    APPROX_SUM(col, ratio) / APPROX_COUNT(ratio) → uniform sample + CLT CI
    APPROX_VARIANCE(col, ratio) / APPROX_STDDEV(col, ratio)
                                                 → uniform sample + delta-method CI
    APPROX_COVAR(x, y, ratio) / APPROX_CORR(x, y, ratio)
                                                 → uniform sample; CLT / Fisher-z CI
    APPROX_JOIN_ROWS(a.k1, b.k2 [, eps]) FROM t1 a, t2 b
                                                 → CM inner product (join priced
                                                   without running it; states-served
                                                   when both sides have geometry-
                                                   compatible registered CMs)

FROM accepts a registered temp view name, a parquet path, or a name found in
the optional ``tables`` dict. If a ``SketchCatalog`` is passed and holds
fresh states for (table, aggregate), the query is answered FROM STATES ONLY
— Verdict's A5 "scan the sample instead of the base table" substitution.
Pass ``catalog_key`` to name the artifact, or just ``catalog`` alone for
Verdict's real UX: AUTO-SELECTION (``resolve_catalog_key``) picks the best
registered states/sample for the statement and silently falls back to an
on-the-fly build when nothing fits. Every result carries explicit error
columns.

Statements with NO approx aggregate pass through to Spark SQL verbatim
(Verdict's middleware behavior for exact queries — A4). Anything else
outside the skeleton raises with a pointer to the DataFrame API. (Verdict
itself accepted only a SQL subset it could rewrite — unsupported syntax
erred likewise.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from sketchlib.planner import hll_params
from sketchlib.spark.build import SketchSpec, build_sketches
from sketchlib.spark.query import estimates_df, quantiles_df, rel_quantiles_df, topk_df

_ARGS = r"(?:[^()]|\([^()]*\))*"  # one nesting level: APPROX_SUM(round(x, 2), 0.1)

_SKELETON = re.compile(
    rf"^\s*SELECT\s+(?P<select>APPROX_[A-Z_]+\s*\({_ARGS}\)(?:\s+AS\s+\w+)?"
    rf"(?:\s*,\s*APPROX_[A-Z_]+\s*\({_ARGS}\)(?:\s+AS\s+\w+)?)*)\s*"
    r"FROM\s+(?P<table>[\w./:\-]+)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>(?:ROLLUP|CUBE)\s*\([\w\s,]+\)"
    r"|GROUPING\s+SETS\s*\(\s*\([\w\s,]*\)(?:\s*,\s*\([\w\s,]*\))*\s*\)"
    r"|[\w]+(?:\s*,\s*[\w]+)*))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# GROUP BY ROLLUP(a, b) / CUBE(a, b) / GROUPING SETS ((a, b), (a), ()):
# grouping sets answered from ONE finest-grain sketch build — coarser
# sets are state MERGES, not rescans
_ROLLUP_GROUP = re.compile(
    r"^\s*(?:(?P<mode>ROLLUP|CUBE)\s*\(\s*(?P<cols>[\w]+(?:\s*,\s*[\w]+)*)\s*\)"
    r"|(?P<gsets>GROUPING\s+SETS)\s*"
    r"\(\s*(?P<sets>\([\w\s,]*\)(?:\s*,\s*\([\w\s,]*\))*)\s*\))\s*$",
    re.IGNORECASE,
)

_GSET_ITEM = re.compile(r"\(([\w\s,]*)\)")

_AGG = re.compile(rf"(APPROX_[A-Z_]+)\s*\(({_ARGS})\)", re.IGNORECASE)
# alias-aware variant for the select list only: APPROX_X(args) [AS name]
_AGG_ALIASED = re.compile(
    rf"(APPROX_[A-Z_]+)\s*\(({_ARGS})\)(?:\s+AS\s+(\w+))?", re.IGNORECASE
)
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _num(a) -> float | None:
    """float(a) or None — the optional-numeric-argument parse shared by
    every accuracy/ratio-honoring site (one tolerance policy, one place)."""
    try:
        return float(a)
    except (TypeError, ValueError):
        return None


def _ratio_or_default(fn: str, ratio_arg, default: float = 0.1) -> float:
    """The on-the-fly sampling ratio: the statement's numeric argument, the
    default when none was given — and a DESCRIPTIVE error (not a leaked
    float() traceback) when an argument was given but isn't numeric."""
    r = _num(ratio_arg)
    if r is None:
        if ratio_arg is not None:
            raise ValueError(
                f"{fn} over a JOIN takes a numeric sampling ratio argument, "
                f"got {ratio_arg!r} — e.g. APPROX_COUNT(0.1) or "
                "APPROX_SUM(col, 0.1)"
            )
        return default
    return r

# Accuracy-contract tail (the BlinkDB/Verdict UX: the user states a TARGET,
# the system plans the cheapest parameters meeting it): ``<statement>
# WITHIN <pct>% ERROR [AT CONFIDENCE <conf>%]``. Peeled before the other
# tails, so it may sit after GROUP BY or after ORDER BY/LIMIT alike.
_WITHIN_TAIL = re.compile(
    r"^(?P<body>.*?\S)\s+WITHIN\s+(?P<pct>\d+(?:\.\d+)?)\s*%\s+ERROR"
    r"(?:\s+AT\s+CONFIDENCE\s+(?P<conf>\d+(?:\.\d+)?)\s*%)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# Error-estimator modifier: ``<statement> ERROR BY SUBSAMPLING`` swaps the
# sampling aggregates' closed-form CLT error columns for VerdictDB's
# variational-subsampling spread (`[paper:VerdictDB §3.2]`, subsample.py).
# The ESTIMATES are identical either way — only the error columns change
# estimator — so the modifier is a statement tail, not a different
# statement. Peeled first (like WITHIN), so it may follow any other tail.
_SUBSAMPLE_TAIL = re.compile(
    r"^(?P<body>.*?\S)\s+ERROR\s+BY\s+SUBSAMPLING\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# the aggregates the subsample estimator serves — ONE constant shared by
# execution and EXPLAIN so the two can never drift on what refuses.
# COUNT_DISTINCT serves from UNIVERSE scrambles (the sample's distinct
# values are a Bernoulli(p) sample of the value domain); the rest from
# uniform scrambles.
_SUBSAMPLE_FNS = ("APPROX_COUNT", "APPROX_SUM", "APPROX_AVG",
                  "APPROX_VARIANCE", "APPROX_STDDEV",
                  "APPROX_COVAR", "APPROX_CORR", "APPROX_PERCENTILE",
                  "APPROX_COUNT_DISTINCT")

# the natural spelling of the illegal combination — ``WITHIN 1% ERROR BY
# SUBSAMPLING`` — loses its ERROR keyword to the subsample tail, leaving a
# body that matches neither _WITHIN_TAIL nor the skeleton; detect it so the
# refusal names the real conflict instead of "unsupported statement"
_WITHIN_STUB = re.compile(
    r"\bWITHIN\s+\d+(?:\.\d+)?\s*%"
    r"(?:\s+AT\s+CONFIDENCE\s+\d+(?:\.\d+)?\s*%)?$",
    re.IGNORECASE,
)

_WITHIN_SUBSAMPLE_MSG = (
    "a WITHIN ... ERROR contract is planned by INVERTING the closed-form "
    "CLT bounds — it cannot be combined with ERROR BY SUBSAMPLING; state "
    "one error mechanism"
)

# optional named accuracy arguments of APPROX_PERCENTILE — quantiles are
# numbers in (0,1) too, so a positional accuracy argument would be ambiguous.
# Two contracts, two sketch families: rank_err= routes to KLL (bound in RANK
# units, ε(k) ≈ 3.31/k) and rel_err= routes to DDSketch (bound in RELATIVE
# VALUE units, |v̂ − v_q| ≤ α·|v_q|) — one statement takes at most one.
_RANK_ERR_ARG = re.compile(r"^rank_err\s*=\s*([0-9.eE+\-]+)$", re.IGNORECASE)
_REL_ERR_ARG = re.compile(r"^rel_err\s*=\s*([0-9.eE+\-]+)$", re.IGNORECASE)
# weight= names a COLUMN: the statement asks for WEIGHT-MASS quantiles
# (the value below which q of Σw lies), served by a weighted t-digest
_PCT_WEIGHT_ARG = re.compile(r"^weight\s*=\s*(\w+)$", re.IGNORECASE)


def _pct_weight(args: list) -> str | None:
    """Weight column from ``APPROX_PERCENTILE(col, q..., weight=w)`` —
    routes to a WEIGHTED tdigest (weight-mass quantiles); None = plain."""
    for a in args[1:]:
        mw = _PCT_WEIGHT_ARG.match(a.strip())
        if mw:
            return mw.group(1)
    return None

# named arguments of APPROX_SPECTRUM(col, r [, d=<dim>, ell=<rows>])
_FD_ARG = re.compile(r"^(d|ell)\s*=\s*([0-9.eE+\-]+)$", re.IGNORECASE)


def _spectrum_args(args: list) -> tuple[int, int | None, int]:
    """(r, d or None, ell) from APPROX_SPECTRUM's argument list. ``d`` is
    the embedding dimension (inferred from the data when omitted on the
    on-the-fly route; must match the registered sketch on the states
    route); ``ell`` the sketch rows (accuracy knob, Δ ≤ ‖A−A_k‖F²/(ℓ−k))."""
    if len(args) < 2:
        raise ValueError(
            "APPROX_SPECTRUM takes (col, r [, d=<dim>, ell=<rows>]) — r is "
            "the number of top Gram eigenvalues to bracket"
        )
    rv = _num(args[1])
    if rv is None or int(rv) != rv or rv < 1:
        raise ValueError(
            f"APPROX_SPECTRUM r argument {args[1]!r} must be a positive integer"
        )
    d, ell = None, 128
    for a in args[2:]:
        mm = _FD_ARG.match(a.strip())
        if not mm:
            raise ValueError(
                f"APPROX_SPECTRUM argument {a!r} — expected d=<dim> or ell=<rows>"
            )
        v = int(float(mm.group(2)))
        if mm.group(1).lower() == "d":
            d = v
        else:
            ell = v
    return int(rv), d, ell


def _fd_spec_serves(fn, args, s: dict) -> bool:
    """Whether a registered fd spec serves this APPROX_SPECTRUM statement:
    an explicit d= must EQUAL the sketch's dimension (different d = a
    different matrix entirely), and an explicit ell= is an accuracy floor
    only states at least that large achieve (bigger ℓ = smaller Δ)."""
    if fn != "APPROX_SPECTRUM":
        return True
    if s["kind"] != "fd":
        return False
    _, d, ell = _spectrum_args(args)
    p = s.get("params", {})
    if d is not None and int(p.get("d", -1)) != d:
        return False
    if any(_FD_ARG.match(a.strip()) and a.strip().lower().startswith("ell")
           for a in args[2:]):
        return int(p.get("ell", 0)) >= ell
    return True


def _percentile_args(args: list) -> tuple[list[float], float | None, float | None]:
    """(quantiles, requested rank error, requested relative value error)
    from APPROX_PERCENTILE's argument list —
    ``APPROX_PERCENTILE(col, 0.5, 0.99, rank_err=0.005)`` or
    ``APPROX_PERCENTILE(col, 0.5, 0.99, rel_err=0.01)``."""
    qs: list[float] = []
    rank = rel = None
    weighted = False
    for a in args[1:]:
        mm = _RANK_ERR_ARG.match(a.strip())
        mr = _REL_ERR_ARG.match(a.strip())
        if mm:
            rank = float(mm.group(1))
        elif mr:
            rel = float(mr.group(1))
        elif _PCT_WEIGHT_ARG.match(a.strip()):
            weighted = True  # read separately via _pct_weight
        else:
            qs.append(float(a))
    if weighted and (rank is not None or rel is not None):
        raise ValueError(
            "weight= routes to a weighted t-digest, whose bound is the "
            "digest's own proxy fixed at build — it cannot combine with a "
            "rank_err=/rel_err= accuracy contract; drop one"
        )
    if rank is not None and rel is not None:
        raise ValueError(
            "give ONE accuracy spec — rank_err= (KLL, bound in rank units) "
            "and rel_err= (DDSketch, bound relative to the value) are "
            "different contracts served by different sketches"
        )
    return (qs or [0.5]), rank, rel


def _trim_args(args: list) -> tuple[float, float]:
    """(lo, hi) from APPROX_TRIMMED_MEAN(col [, lo, hi]) — the kept
    quantile window; default (0.05, 0.95), the conventional 5% trim."""
    if len(args) == 1:
        return 0.05, 0.95
    if len(args) != 3:
        raise ValueError(
            "APPROX_TRIMMED_MEAN takes (col) or (col, lo, hi) — lo/hi are "
            "the kept quantile window, e.g. APPROX_TRIMMED_MEAN(x, 0.05, 0.95)"
        )
    lo, hi = _num(args[1]), _num(args[2])
    if lo is None or hi is None or not (0.0 <= lo < hi <= 1.0):
        raise ValueError(
            f"APPROX_TRIMMED_MEAN window ({args[1]!r}, {args[2]!r}) must be "
            "numeric with 0 <= lo < hi <= 1"
        )
    return float(lo), float(hi)


def _mad_args(args: list) -> None:
    """APPROX_MAD takes exactly (col) — there is no accuracy knob to pass
    at query time; the bracket width is the serving state's ε."""
    if len(args) != 1:
        raise ValueError(
            "APPROX_MAD takes exactly one argument (the column) — the "
            "bracket width comes from the serving KLL/t-digest state's "
            "rank error; register a larger sketch for a tighter bracket"
        )


def _hist_args(args: list) -> int:
    """Validated bin count from APPROX_HISTOGRAM(col, n_bins)."""
    if len(args) != 2:
        raise ValueError(
            "APPROX_HISTOGRAM takes (col, n_bins) — equi-depth bin edges "
            "at quantiles i/n_bins, each bin holding ≈ 1/n_bins of the rows"
        )
    n = _num(args[1])
    if n is None or int(n) != n or n < 1:
        raise ValueError(
            f"APPROX_HISTOGRAM n_bins argument {args[1]!r} must be a "
            "positive integer"
        )
    return int(n)


def _robust_kll_k(fn: str, args: list) -> int:
    """On-the-fly KLL size for the robust-statistic heads, planned from the
    statement's OWN requirement — ONE policy shared by the single-statement
    and rollup routes (the refusal "register a larger sketch" is reserved
    for user registrations; a route that chose its own sketch must size
    it): ε ≤ window/8 for a trim window (corner windows stay meaningful),
    ε ≤ 1/(4·n_bins) for a histogram (edge noise ≤ half a bin's mass), and
    the 200 default for MAD (its bracket is valid at any ε). Also performs
    the head's argument validation."""
    from sketchlib.planner import kll_params

    if fn == "APPROX_TRIMMED_MEAN":
        tlo, thi = _trim_args(args)
        return max(200, kll_params((thi - tlo) / 8.0)["k"])
    if fn == "APPROX_HISTOGRAM":
        return max(200, kll_params(1.0 / (4.0 * _hist_args(args)))["k"])
    _mad_args(args)
    return 200


# ORDER BY / LIMIT carry through the rewrite applied to the RESULT frame
# (Verdict A14) — stripped off the tail, the inner statement recurses.
# Multi-key: ORDER BY est DESC, group [ASC] over result columns.
_ORDER_TAIL = re.compile(
    r"^(?P<body>.*?\S)\s+ORDER\s+BY\s+"
    r"(?P<keys>\w+(?:\s+(?:ASC|DESC))?(?:\s*,\s*\w+(?:\s+(?:ASC|DESC))?)*)"
    r"(?:\s+LIMIT\s+(?P<n>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _order_cols(keys: str, rename: dict[str, str] | None = None):
    """ORDER BY key list → [Column with direction], result columns only.
    ``rename`` maps statement-level names onto result-frame names (the
    single-column sketch paths emit the generic ``group`` column, so
    ``GROUP BY source … ORDER BY source`` must order that column)."""
    from pyspark.sql import functions as F

    out = []
    for part in keys.split(","):
        toks = part.split()
        c = F.col((rename or {}).get(toks[0].lower(), toks[0]))
        out.append(c.desc() if len(toks) > 1 and toks[1].upper() == "DESC" else c.asc())
    return out
_LIMIT_TAIL = re.compile(
    r"^(?P<body>.*?\S)\s+LIMIT\s+(?P<n>\d+)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)
# HAVING filters the ESTIMATE frame (post-aggregation, like Verdict applying
# it after scale-up): the predicate references result columns (estimate,
# est_sum, group, ...) and is full Spark SQL
_HAVING_TAIL = re.compile(
    r"^(?P<body>.*GROUP\s+BY\s+\w+(?:\s*,\s*\w+)*)\s+HAVING\s+(?P<pred>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# Verdict's ApproxJoinedRelation (A8) as SQL: one APPROX_COUNT/APPROX_SUM
# over an equi-join, answered by universe-sampling both sides on the join
# key (p-composition, sampling.approx_join_agg), or — the fact×dimension
# shape — by ONE fact-side scramble broadcast-joined to the exact dim.
# Table qualifiers in ON must name the FROM tables or their aliases
# (FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey). WHERE is
# full Spark SQL over the joined columns (commutes with the sampling).
_JOIN_SKELETON = re.compile(
    rf"^\s*SELECT\s+(?P<select>APPROX_[A-Z_]+\s*\({_ARGS}\))(?:\s+AS\s+(?P<salias>\w+))?\s*"
    r"FROM\s+(?P<ta>[\w./:\-]+)(?:\s+(?:AS\s+)?(?P<aa>(?!JOIN\b)\w+))?"
    r"\s+JOIN\s+(?P<tb>[\w./:\-]+)(?:\s+(?:AS\s+)?(?P<ab>(?!ON\b)\w+))?"
    r"\s+ON\s+(?P<qa>\w+)\.(?P<ka>\w+)\s*=\s*(?P<qb>\w+)\.(?P<kb>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>\w+(?:\s*,\s*\w+)*))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


# Three-table chain (a08's real shape: fact ⋈ dim ⋈ dim, e.g. orders ⋈
# customer ⋈ nation GROUP BY n_name): the FACT side is sampled (a registered
# uniform scramble via catalog, or an on-the-fly Bernoulli draw of the FIRST
# FROM table), both dimensions are exact and broadcast.
_JOIN3_SKELETON = re.compile(
    rf"^\s*SELECT\s+(?P<select>APPROX_[A-Z_]+\s*\({_ARGS}\))(?:\s+AS\s+(?P<salias>\w+))?\s*"
    r"FROM\s+(?P<t1>[\w./:\-]+)(?:\s+(?:AS\s+)?(?P<a1>(?!JOIN\b)\w+))?"
    r"\s+JOIN\s+(?P<t2>[\w./:\-]+)(?:\s+(?:AS\s+)?(?P<a2>(?!ON\b)\w+))?"
    r"\s+ON\s+(?P<q1>\w+)\.(?P<k1>\w+)\s*=\s*(?P<q2>\w+)\.(?P<k2>\w+)"
    r"\s+JOIN\s+(?P<t3>[\w./:\-]+)(?:\s+(?:AS\s+)?(?P<a3>(?!ON\b)\w+))?"
    r"\s+ON\s+(?P<q3>\w+)\.(?P<k3>\w+)\s*=\s*(?P<q4>\w+)\.(?P<k4>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>\w+(?:\s*,\s*\w+)*))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


# Join-cardinality estimation (the planner's what-would-this-join-cost
# question, answered WITHOUT running the join): ``SELECT
# APPROX_JOIN_ROWS(a.k1, b.k2 [, eps]) FROM t1 a, t2 b`` prices |t1 ⋈ t2|
# from two Count-Min sketches over the key columns (Cormode & Muthukrishnan
# 2005 §4.2 inner product — never undercounts, overshoot ≤ eps·|A|·|B|).
# Comma-FROM, no ON clause: the keys ARE the aggregate's arguments.
_JOIN_ROWS_SKELETON = re.compile(
    r"^\s*SELECT\s+APPROX_JOIN_ROWS\s*\(\s*"
    r"(?P<qa>\w+)\.(?P<ka>\w+)\s*,\s*(?P<qb>\w+)\.(?P<kb>\w+)"
    r"(?:\s*,\s*(?P<eps>[^,()\s]+))?\s*\)"
    r"(?:\s+AS\s+(?P<alias>\w+))?\s*"
    r"FROM\s+(?P<ta>[\w./:\-]+)(?:\s+(?:AS\s+)?(?P<aa>\w+))?\s*,\s*"
    r"(?P<tb>[\w./:\-]+)(?:\s+(?:AS\s+)?(?P<ab>\w+))?\s*;?\s*$",
    re.IGNORECASE,
)


def _join_rows_sides(m) -> tuple[tuple[str, str], tuple[str, str]]:
    """((table_token, key), (table_token, key)) for the aggregate's two
    qualified arguments, resolved against the FROM entries (alias if given,
    else the table token). Unknown qualifiers raise by name."""
    name_a = m.group("aa") or m.group("ta")
    name_b = m.group("ab") or m.group("tb")
    if name_a == name_b:
        # dict construction would silently overwrite — both qualifiers
        # would resolve to the SECOND table and the statement would price
        # the wrong join with no error (the worst failure shape)
        raise ValueError(
            f"APPROX_JOIN_ROWS FROM entries share the name {name_a!r} — "
            "give the two tables distinct aliases"
        )
    ents = {name_a: m.group("ta"), name_b: m.group("tb")}
    out = []
    for q, k in ((m.group("qa"), m.group("ka")), (m.group("qb"), m.group("kb"))):
        if q not in ents:
            raise ValueError(
                f"APPROX_JOIN_ROWS qualifier {q!r} matches no FROM entry "
                f"(have {sorted(ents)}); a self-join needs two distinct aliases"
            )
        out.append((ents[q], k))
    return out[0], out[1]


def _resolve_join_rows_regs(sides, tables, catalog, req_eps):
    """Newest registration pair able to answer APPROX_JOIN_ROWS from states
    alone: each side needs an UNGROUPED sketch set over its table whose
    specs include a Count-Min on the key column, and the two CM geometries
    (w, d, seed) must be IDENTICAL — different hash families map keys to
    different columns, so a mismatched pair is not an estimate at all.
    An explicit eps argument is a precision request: only CMs achieving it
    serve. Returns ((reg_name, spec_name), (reg_name, spec_name)) or None
    (→ on-the-fly build). Shared by execution and EXPLAIN."""
    import json as _json
    import math as _math
    import os as _os

    if catalog is None:
        return None
    rows = sorted(catalog.list_rows(), key=lambda r: (-r["built_unix"], r["name"]))

    def cands(token, col):
        base = _table_dir(token, tables)
        if base is None:
            return []
        bn = _os.path.normpath(base)
        out = []
        for reg in rows:
            if _os.path.normpath(reg["input_dir"]) != bn or reg["group_by"] != "":
                continue
            for s in _json.loads(reg["specs_json"]):
                if s["kind"] != "cm" or s["column"] != col:
                    continue
                if s.get("weight"):
                    # a weighted CM's cells hold SUM(w), not multiplicities —
                    # its inner product would price the join in weight
                    # units (the cross-serving trap _cm_spec_serves guards
                    # on the single-statement routes)
                    continue
                p = s.get("params", {})
                eps = float(p.get("eps", 1e-4))
                if req_eps is not None and eps > req_eps * (1 + 1e-9):
                    continue
                geom = (
                    int(_math.ceil(_math.e / eps)),
                    int(_math.ceil(_math.log(1.0 / float(p.get("delta", 0.01))))),
                    int(p.get("seed", 7)),
                )
                out.append((reg["name"], s["name"], geom))
        return out

    ca, cb = cands(*sides[0]), cands(*sides[1])
    for na, sa, ga in ca:
        for nb, sb, gb in cb:
            if ga == gb:
                return (na, sa), (nb, sb)
    return None


def _approx_join_rows(spark, m, tables, catalog, catalog_key) -> DataFrame:
    """Execute APPROX_JOIN_ROWS: states-served when both sides have
    geometry-compatible registered CMs (ZERO base-table scans — A5 extended
    to the join-size question), else an on-the-fly build (one scan per
    side, the join itself never runs). Output row: (estimate, abs error
    bound); AS alias renames to (alias, alias_err)."""
    from pyspark.sql import functions as F

    from sketchlib.spark.query import join_size_estimate

    if catalog_key is not None:
        raise ValueError(
            "APPROX_JOIN_ROWS resolves ONE registration PER SIDE — "
            "catalog_key names a single artifact; drop it and let "
            "auto-selection pick a geometry-compatible CM pair"
        )
    eps_arg = m.group("eps")
    req_eps = _num(eps_arg)
    if eps_arg is not None and req_eps is None:
        raise ValueError(
            f"APPROX_JOIN_ROWS third argument {eps_arg!r} must be a numeric "
            "eps (the CM overcount fraction, e.g. 1e-4)"
        )
    sides = _join_rows_sides(m)
    picks = _resolve_join_rows_regs(sides, tables, catalog, req_eps)
    if picks is not None:
        (na, sa), (nb, sb) = picks
        est, err = join_size_estimate(
            catalog.states(na), catalog.states(nb), sa, sketch_b=sb
        )
    else:
        eps = req_eps if req_eps is not None else 1e-4
        params = {"eps": eps, "delta": 0.01, "seed": 7}
        states = []
        for token, key in sides:
            df = _resolve_table(spark, token, tables).select(F.col(key).alias("_jk"))
            states.append(
                build_sketches(df, [SketchSpec("cm_jk", "cm", "_jk", params)], group_by=None)
            )
        est, err = join_size_estimate(states[0], states[1], "cm_jk")
    name = m.group("alias") or "join_rows_est"
    err_name = f"{m.group('alias')}_err" if m.group("alias") else "join_rows_err"
    return spark.createDataFrame([(float(est), float(err))], f"{name} double, {err_name} double")


def _resolve_join3_key(toks, tables, catalog, req_ratio) -> str | None:
    """Auto-selected UNIFORM fact scramble for a three-table chain (None →
    on-the-fly Bernoulli draw of the first FROM table) — shared by
    _approx_join3 and EXPLAIN so the which-sample-served answer can never
    diverge from execution. An explicit ratio argument is a precision
    request: only samples meeting it may serve."""
    import os as _os

    dirs = [_table_dir(t, tables) for t, _ in toks]
    cands = [
        r for r in catalog.list_sample_rows()
        if r["kind"] == "uniform"
        and (req_ratio is None or float(r["ratio"] or 0.0) >= req_ratio - 1e-12)
        and any(
            d is not None and _os.path.normpath(d) == _os.path.normpath(r["input_dir"])
            for d in dirs
        )
    ]
    if not cands:
        return None
    return max(cands, key=lambda r: (float(r["ratio"] or 0.0), r["name"]))["name"]


def _approx_join3(spark, m, tables, catalog, catalog_key) -> DataFrame:
    """fact ⋈ dim ⋈ dim with a Bernoulli-sampled fact side: the sampled
    row is the independent inclusion unit and brings every row the chained
    joins attach to it, so the estimator clusters joined rows per sampled
    row (``cluster_join_agg``) — exact CIs whatever the dims' key
    multiplicity, reducing to plain Bernoulli HT when both dims are
    key-unique. The fact is the table holding the registered uniform
    scramble (catalog path) or the FIRST FROM table (on-the-fly path);
    universe scrambles are refused here — per-key survival does not
    compose across two chained keys (use the two-table pair path for
    universe⋈universe). An explicit ratio argument is honored: only
    samples of ≥ that ratio are auto-selected, else the on-the-fly draw
    runs at the requested ratio.
    """
    from pyspark.sql import functions as F

    fn, value_col, ratio_arg = _join_agg(m.group("select"))

    def _base(t: str) -> str:
        return t.rstrip("/").split("/")[-1].split(".")[0]

    toks = [(m.group(f"t{i}"), m.group(f"a{i}")) for i in (1, 2, 3)]

    def _which(q: str) -> int:
        for i, (t, a) in enumerate(toks):
            if q == t or q == a or _base(t) == q:
                return i
        raise ValueError(
            f"ON qualifier {q!r} names none of the FROM tables/aliases "
            f"{[t for t, _ in toks]} / {[a for _, a in toks]}"
        )

    conds = [
        ((_which(m.group("q1")), m.group("k1")), (_which(m.group("q2")), m.group("k2"))),
        ((_which(m.group("q3")), m.group("k3")), (_which(m.group("q4")), m.group("k4"))),
    ]
    qnames = {n for t, a in toks for n in (t, a, _base(t)) if n}
    _refuse_join_subquery_where(m.group("where"))
    where = _strip_qualifiers(m.group("where"), qnames) if m.group("where") else None
    group = _parse_group(m.group("group"))

    req_ratio = _num(ratio_arg)

    fact_i, ratio, fact_df = 0, None, None
    if catalog is not None:
        import os as _os

        key = catalog_key
        if key is None:
            key = _resolve_join3_key(toks, tables, catalog, req_ratio)
        if key is not None:
            meta = catalog.sample_meta(key)
            if meta["kind"] != "uniform":
                raise ValueError(
                    "three-table approx joins take a UNIFORM fact scramble — "
                    f"{key!r} is {meta['kind']} (universe survival does not "
                    "compose across two chained join keys)"
                )
            sdir = _os.path.normpath(meta["input_dir"])
            fact_i = next(
                (i for i, (t, _) in enumerate(toks)
                 if (d := _table_dir(t, tables)) is not None and _os.path.normpath(d) == sdir),
                None,
            )
            if fact_i is None:
                raise ValueError(
                    f"sample {key!r} was built over {meta['input_dir']!r}, which is "
                    f"none of the FROM tables {[t for t, _ in toks]}"
                )
            fact_df, ratio = catalog.sample(key), float(meta["ratio"])
    if fact_df is None:
        # on-the-fly: the FIRST FROM table is the fact (the conventional
        # statement order), Bernoulli-sampled at the aggregate's ratio arg
        from sketchlib.spark.sampling import uniform_sample

        fact_i, ratio = 0, _ratio_or_default(fn, ratio_arg)
        fact_df = uniform_sample(_resolve_table(spark, toks[0][0], tables), ratio)

    # the sampled row is the independent inclusion unit: it brings every
    # row the chained joins attach to it, so the estimator clusters by a
    # per-sampled-row fingerprint (deterministic — see row_fingerprint:
    # a nondeterministic id would block predicate pushdown to the scan)
    from sketchlib.spark.sampling import row_fingerprint

    fact_df = fact_df.withColumn("_cluster", row_fingerprint(fact_df))
    frames = {
        i: (fact_df if i == fact_i else _resolve_table(spark, toks[i][0], tables))
        for i in range(3)
    }
    joined, in_join = frames[fact_i], {fact_i}
    remaining = list(conds)
    while remaining:
        for c in remaining:
            (ia, ka), (ib, kb) = c
            if (ia in in_join) != (ib in in_join):
                new_i, new_k, old_k = (ib, kb, ka) if ia in in_join else (ia, ka, kb)
                # no forced broadcast: the planner auto-broadcasts small
                # dims; a big exact side must be allowed to shuffle-join
                bdim = frames[new_i]
                joined = joined.join(bdim, joined[old_k] == bdim[new_k])
                in_join.add(new_i)
                remaining.remove(c)
                break
            if ia in in_join and ib in in_join:
                joined = joined.filter(F.col(ka) == F.col(kb))
                remaining.remove(c)
                break
        else:
            raise ValueError("ON clauses do not connect the three FROM tables into a chain")
    if len(in_join) != 3:
        missing = [toks[i][0] for i in range(3) if i not in in_join]
        raise ValueError(
            f"ON clauses never join {missing} — each JOINed table needs an ON "
            "condition linking it to the others (a redundant condition between "
            "two already-joined tables leaves the third as a cross join, which "
            "the approximate path refuses rather than silently mis-estimating)"
        )
    if where:
        joined = joined.filter(where)
    from sketchlib.spark.sampling import cluster_join_agg

    out = cluster_join_agg(
        joined, F.col("_cluster"), ratio, value_col=value_col, group_by=group
    )
    keep = ["est_count", "count_err"] + (["est_sum", "sum_err"] if value_col is not None else [])
    gcols = [] if not group else (list(group) if isinstance(group, (list, tuple)) else [group])
    return out.select(*gcols, *keep)


def _refuse_join_subquery_where(where: str | None) -> None:
    """Approximate JOIN statements hand their WHERE to DataFrame.filter /
    the sampling kernels, which reject subqueries — refuse with a pointer
    to the supported shape instead of leaking Spark's AnalysisException.
    (Single-table statements DO support subquery predicates via
    _apply_where; for joins, pre-filter in a CTE or derived table.)"""
    if where and re.search(r"\(\s*SELECT\b", _mask_literals(where), re.IGNORECASE):
        raise ValueError(
            "subquery predicates are not supported in the WHERE of an "
            "approximate JOIN statement — pre-filter the table in a CTE "
            "(WITH f AS (SELECT ... WHERE k IN (...)) SELECT APPROX_... "
            "FROM f JOIN ...) or a derived table instead"
        )


def _strip_qualifiers(expr: str, names: set[str]) -> str:
    """Drop ``alias.`` / ``table.`` prefixes naming the FROM tokens from a
    predicate: the joined frame carries unqualified columns (TPC-H-style
    schemas have table-prefixed column names, so collisions don't arise).
    Matches are located on LITERAL-MASKED text, so a string literal that
    happens to contain ``alias.`` (e.g. ``url LIKE 'fact.%'``) is never
    rewritten — only real qualifier positions are."""
    if not expr:
        return expr
    pat = re.compile(
        r"\b(?:" + "|".join(re.escape(n) for n in sorted(names, key=len, reverse=True)) + r")\.(?=\w)"
    )
    masked = _mask_literals(expr)
    out, last = [], 0
    for m in pat.finditer(masked):
        out.append(expr[last:m.start()])
        last = m.end()
    out.append(expr[last:])
    return "".join(out)


def _join_agg(select: str) -> tuple[str, str | None, str | None]:
    """(fn, value_col, ratio_arg) for a join statement's single aggregate —
    the ONE parse both execution and EXPLAIN use, so the two can never
    disagree about supported functions or the explicit ratio argument."""
    fn, args = [(f.upper(), _split_args(a)) for f, a in _AGG.findall(select)][0]
    if fn == "APPROX_COUNT":
        return fn, None, (args[0] if args else None)
    if fn == "APPROX_SUM":
        return fn, args[0], (args[1] if len(args) > 1 else None)
    raise ValueError(
        f"{fn} is not supported over a JOIN — approximate joins answer "
        "APPROX_COUNT/APPROX_SUM (Verdict's ApproxJoinedRelation)"
    )


def _join_keys(m) -> tuple[str, str]:
    """(left_key, right_key) from a two-table join match — shared by
    execution and EXPLAIN (a weaker re-implementation in EXPLAIN once
    silently swapped keys where execution raises)."""
    ta, tb = m.group("ta"), m.group("tb")
    aa, ab = m.group("aa"), m.group("ab")
    qa, qb, ka, kb = m.group("qa"), m.group("qb"), m.group("ka"), m.group("kb")

    def _base(t: str) -> str:
        return t.rstrip("/").split("/")[-1].split(".")[0]

    def _owns(q: str, t: str, alias: str | None) -> bool:
        return q == t or q == alias or _base(t) == q

    if _owns(qa, ta, aa) and _owns(qb, tb, ab):
        return ka, kb
    if _owns(qa, tb, ab) and _owns(qb, ta, aa):
        return kb, ka
    raise ValueError(
        f"ON qualifiers ({qa!r}, {qb!r}) must name the FROM tables "
        f"({ta!r}, {tb!r}) or their aliases ({aa!r}, {ab!r})"
    )


def _approx_join(spark, m, tables, catalog, catalog_key) -> DataFrame:
    fn, value_col, ratio_arg = _join_agg(m.group("select"))
    ta, tb = m.group("ta"), m.group("tb")
    aa, ab = m.group("aa"), m.group("ab")
    left_key, right_key = _join_keys(m)

    def _base(t: str) -> str:
        return t.rstrip("/").split("/")[-1].split(".")[0]

    group = _parse_group(m.group("group"))
    qnames = {n for n in (ta, tb, aa, ab, _base(ta), _base(tb)) if n}
    _refuse_join_subquery_where(m.group("where"))
    where = _strip_qualifiers(m.group("where"), qnames) if m.group("where") else None

    req_ratio = _num(ratio_arg)

    if catalog is not None and catalog_key is None:
        # auto-selection for joins: best = a PAIR of universe scrambles on
        # the two join keys sharing (ratio, seed) — p-composition needs the
        # shared hash; else ONE fact-side scramble (uniform, or universe on
        # that side's join key) broadcast-joined to the exact other side.
        # An explicit ratio argument is a precision request: only samples
        # meeting it may serve (None → on-the-fly at the requested ratio).
        catalog_key = _resolve_join_key(
            ta, tb, left_key, right_key, tables, catalog, req_ratio=req_ratio
        )

    if catalog is not None and catalog_key is not None:
        names = [s.strip() for s in str(catalog_key).split(",")]
        if len(names) == 1:
            # fact×dimension (A8's common shape): the single named scramble
            # covers ONE side; the other side is read exact and broadcast
            meta = catalog.sample_meta(names[0])
            import os as _os

            sdir = _os.path.normpath(meta["input_dir"])
            da, db = _table_dir(ta, tables), _table_dir(tb, tables)
            if da is not None and _os.path.normpath(da) == sdir:
                fact_key, dim_key, dim_token = left_key, right_key, tb
            elif db is not None and _os.path.normpath(db) == sdir:
                fact_key, dim_key, dim_token = right_key, left_key, ta
            else:
                raise ValueError(
                    f"sample {names[0]!r} was built over {meta['input_dir']!r}, "
                    f"which is neither join side ({ta!r}, {tb!r})"
                )
            if meta["kind"] == "universe" and meta["on_col"] != fact_key:
                raise ValueError(
                    f"universe sample {names[0]!r} is keyed on {meta['on_col']!r}, "
                    f"not the join key {fact_key!r} — key survival would not "
                    "compose through the join"
                )
            from sketchlib.spark.sampling import approx_join_agg_mixed

            return approx_join_agg_mixed(
                catalog.sample(names[0]), _resolve_table(spark, dim_token, tables),
                fact_key, dim_key, meta["kind"], meta["ratio"],
                value_col=value_col, group_by=group, where=where,
            )
        if len(names) != 2:
            raise ValueError(
                "join statements take catalog_key='left_sample,right_sample' "
                "(two universe scrambles) or one fact-side sample name"
            )
        # A5 for joins: answer from TWO persisted universe scrambles —
        # same seed+ratio required (p-composition only holds through a
        # SHARED hash)
        ma, mb = catalog.sample_meta(names[0]), catalog.sample_meta(names[1])
        for meta, key in ((ma, left_key), (mb, right_key)):
            if meta["kind"] != "universe" or meta["on_col"] != key:
                raise ValueError(
                    f"sample {meta['name']!r} must be a universe sample on {key!r}; "
                    f"got {meta['kind']} on {meta['on_col']!r}"
                )
        if (ma["ratio"], ma["seed"]) != (mb["ratio"], mb["seed"]):
            raise ValueError(
                "join samples must share ratio and seed (survival probabilities "
                f"compose only through the same hash): {names[0]}=({ma['ratio']}, "
                f"{ma['seed']}) vs {names[1]}=({mb['ratio']}, {mb['seed']})"
            )
        from sketchlib.spark.sampling import approx_join_agg_from_samples

        return approx_join_agg_from_samples(
            catalog.sample(names[0]), catalog.sample(names[1]),
            left_key, right_key, ma["ratio"], value_col=value_col, group_by=group,
            where=where,
        )

    from sketchlib.spark.sampling import approx_join_agg

    left = _resolve_table(spark, ta, tables)
    right = _resolve_table(spark, tb, tables)
    return approx_join_agg(
        left, right, left_key, right_key,
        value_col=value_col, ratio=_ratio_or_default(fn, ratio_arg), group_by=group,
        where=where,
    )

# Sample-lifecycle DDL — Verdict's literal entry points (SURVEY A2/A3):
#   CREATE [OR REPLACE] SAMPLE s FROM t KIND uniform RATIO 0.1
#       [ON col] [FRACTIONS '{"g": 0.2}'] [SEED 7]
#   SHOW SAMPLES
#   DROP SAMPLE s
_CREATE_SAMPLE = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?SAMPLE\s+(?P<name>\w+)"
    r"\s+FROM\s+(?P<table>[\w./:\-]+)"
    r"\s+KIND\s+(?P<kind>uniform|universe|stratified)"
    r"(?:\s+RATIO\s+(?P<ratio>[\d.eE+-]+))?"
    r"(?:\s+ON\s+(?P<on>\w+))?"
    r"(?:\s+FRACTIONS\s+'(?P<fractions>[^']*)')?"
    r"(?:\s+SEED\s+(?P<seed>\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_CREATE_SKETCHES = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?SKETCHES\s+(?P<name>\w+)"
    r"\s+FROM\s+(?P<table>[\w./:\-]+)"
    r"\s+KINDS\s+(?P<specs>\w+\s*\([^()]*\)(?:\s*,\s*\w+\s*\([^()]*\))*)"
    r"(?:\s+GROUP\s+BY\s+(?P<group>[\w]+(?:\s*,\s*[\w]+)*))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SKETCH_DDL_DEFAULTS = {
    "hll": {"p": 14},
    "cm": {"eps": 1e-4, "delta": 0.01},
    "mg": {"eps": 1e-4},
    "kll": {"k": 200},
    "tdigest": {"compression": 200},
    "dd": {"alpha": 0.01},
    "bloom": {"m_bits": 1 << 20, "h": 7},
    "kmv": {"k": 1024},
    "fd": {"ell": 128},  # d (the vector dimension) is REQUIRED — no default
}
_SHOW_SAMPLES = re.compile(r"^\s*SHOW\s+SAMPLES\s*;?\s*$", re.IGNORECASE)
_DROP_SAMPLE = re.compile(r"^\s*DROP\s+SAMPLE\s+(?P<name>\w+)\s*;?\s*$", re.IGNORECASE)
_CREATE_ANN = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?ANN\s+INDEX\s+(?P<name>\w+)"
    r"\s+FROM\s+(?P<table>[\w./:\-]+)"
    r"\s+KIND\s+(?P<kind>srp|ivf)"
    r"\s+ON\s+(?P<vec>\w+)"
    r"\s+ID\s+(?P<id>\w+)"
    r"(?:\s+BITS\s+(?P<bits>\d+))?"
    r"(?:\s+LISTS\s+(?P<lists>\d+))?"
    r"(?:\s+SEED\s+(?P<seed>\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_ANN = re.compile(r"^\s*SHOW\s+ANN\s+INDEXES\s*;?\s*$", re.IGNORECASE)
_DROP_ANN = re.compile(r"^\s*DROP\s+ANN\s+INDEX\s+(?P<name>\w+)\s*;?\s*$", re.IGNORECASE)
_REFRESH_ANN = re.compile(r"^\s*REFRESH\s+ANN\s+INDEX\s+(?P<name>\w+)\s*;?\s*$", re.IGNORECASE)
_CREATE_SIGS = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?SIGNATURES\s+(?P<name>\w+)"
    r"\s+FROM\s+(?P<table>[\w./:\-]+)"
    r"\s+ON\s+(?P<tokens>\w+)"
    r"\s+ID\s+(?P<id>\w+)"
    r"(?:\s+R\s+(?P<r>\d+))?"
    r"(?:\s+BANDS\s+(?P<bands>\d+))?"
    r"(?:\s+SEED\s+(?P<seed>\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_SIGS = re.compile(r"^\s*SHOW\s+SIGNATURES\s*;?\s*$", re.IGNORECASE)
_DROP_SIGS = re.compile(r"^\s*DROP\s+SIGNATURES\s+(?P<name>\w+)\s*;?\s*$", re.IGNORECASE)
_REFRESH_SIGS = re.compile(r"^\s*REFRESH\s+SIGNATURES\s+(?P<name>\w+)\s*;?\s*$", re.IGNORECASE)
_SHOW_SKETCHES = re.compile(r"^\s*SHOW\s+SKETCHES\s*;?\s*$", re.IGNORECASE)
_DROP_SKETCHES = re.compile(r"^\s*DROP\s+SKETCHES\s+(?P<name>\w+)\s*;?\s*$", re.IGNORECASE)
_REFRESH_SKETCHES = re.compile(r"^\s*REFRESH\s+SKETCHES\s+(?P<name>\w+)\s*;?\s*$", re.IGNORECASE)
_REFRESH_SAMPLE = re.compile(r"^\s*REFRESH\s+SAMPLE\s+(?P<name>\w+)\s*;?\s*$", re.IGNORECASE)


def _resolve_join_key(
    ta, tb, left_key, right_key, tables, catalog, req_ratio: float | None = None
) -> str | None:
    """Auto-selection for APPROX joins. Best: a (left, right) pair of
    registered UNIVERSE scrambles — one per table, keyed on that side's
    join column — sharing (ratio, seed): survival probabilities compose
    only through the same hash; largest shared ratio (lowest error) wins.
    Fallback: ONE fact-side scramble (uniform, or universe on that side's
    join key) — the fact×dimension shape, the other side read exact and
    broadcast. None → the statement samples both sides on the fly.
    ``req_ratio`` (the statement's explicit ratio argument) is honored:
    samples below it are skipped, so the fallback draw runs at the
    requested precision instead of silently widening the CI."""
    import os

    da, db = _table_dir(ta, tables), _table_dir(tb, tables)
    if da is None or db is None:
        return None
    da, db = os.path.normpath(da), os.path.normpath(db)
    all_rows = catalog.list_sample_rows()
    if req_ratio is not None:
        all_rows = [r for r in all_rows if float(r["ratio"] or 0.0) >= req_ratio - 1e-12]
    rows = [r for r in all_rows if r["kind"] == "universe"]
    lefts = [r for r in rows if os.path.normpath(r["input_dir"]) == da and r["on_col"] == left_key]
    rights = [r for r in rows if os.path.normpath(r["input_dir"]) == db and r["on_col"] == right_key]
    pairs = [
        (a, b)
        for a in lefts
        for b in rights
        if (a["ratio"], a["seed"]) == (b["ratio"], b["seed"]) and a["name"] != b["name"]
    ]
    if pairs:
        a, b = max(pairs, key=lambda p: (float(p[0]["ratio"] or 0.0), p[0]["name"], p[1]["name"]))
        return f"{a['name']},{b['name']}"
    # single fact-side candidates: uniform anywhere, or the universe
    # scrambles already matched to their own side's join key above
    singles = lefts + rights + [
        r for r in all_rows
        if r["kind"] == "uniform" and os.path.normpath(r["input_dir"]) in (da, db)
    ]
    if not singles:
        return None
    best = max(
        singles,
        key=lambda r: (float(r["ratio"] or 0.0), r["kind"] == "universe", r["name"]),
    )
    return best["name"]


def _ddl_input_dir(table: str, tables: dict | None, stmt: str) -> str:
    """DDL builds persist FROM a parquet path — resolve via tables (path
    values only) or a literal path in FROM."""
    if tables and table in tables and isinstance(tables[table], str):
        return tables[table]
    if "/" in table:
        return table
    raise ValueError(
        f"{stmt} needs a parquet path for {table!r} — pass "
        "tables={name: path} or a path in FROM"
    )


# A statement is OURS only when its HEAD names one of the three registries —
# a free-floating word search would claim exact Spark SQL that merely
# MENTIONS a user table named 'samples'/'sketches' (e.g. DROP TABLE samples),
# breaking the A4 pass-through contract.
_DDL_HEAD = re.compile(
    r"^\s*(?:CREATE\s+(?:OR\s+REPLACE\s+)?(?:SAMPLE|SKETCHES|SIGNATURES|ANN\s+INDEX)\b"
    r"|SHOW\s+(?:SAMPLES|SKETCHES|SIGNATURES|ANN\s+INDEXES)\b"
    r"|(?:DROP|REFRESH)\s+(?:SAMPLE|SKETCHES|SIGNATURES|ANN\s+INDEX)\b)",
    re.IGNORECASE,
)


def _ddl(spark: SparkSession, sql: str, tables: dict | None, catalog) -> DataFrame | None:
    """Route sample-lifecycle DDL to the SketchCatalog; None if ``sql`` is
    not a DDL statement."""
    # only claim statements whose HEAD is registry DDL (CREATE SAMPLE …,
    # SHOW SKETCHES, DROP ANN INDEX …) — SHOW TABLES / CREATE VIEW /
    # REFRESH TABLE / DROP TABLE samples etc. are Spark's own DDL and fall
    # through to the exact pass-through (A4)
    if not _DDL_HEAD.match(sql):
        return None
    if catalog is None:
        raise ValueError("sample DDL needs a SketchCatalog — pass catalog=...")

    m = _SHOW_SAMPLES.match(sql)
    if m:
        return catalog.list_samples()

    m = _REFRESH_SKETCHES.match(sql)
    if m:
        stats = catalog.refresh(m.group("name"))
        return spark.createDataFrame(
            [(m.group("name"), stats["new_files"], stats["rows_added"], stats["tokens_added"])],
            "name string, new_files int, rows_added long, tokens_added long",
        )

    m = _REFRESH_SAMPLE.match(sql)
    if m:
        stats = catalog.refresh_sample(m.group("name"))
        return spark.createDataFrame(
            [(m.group("name"), stats["new_files"], stats["rows_added"])],
            "name string, new_files int, rows_added long",
        )

    m = _SHOW_ANN.match(sql)
    if m:
        return catalog.list_ann_indexes()

    m = _SHOW_SIGS.match(sql)
    if m:
        return catalog.list_signatures()

    m = _REFRESH_SIGS.match(sql)
    if m:
        stats = catalog.refresh_signatures(m.group("name"))
        return spark.createDataFrame(
            [(m.group("name"), stats["new_files"], stats["rows_added"])],
            "name string, new_files int, rows_added long",
        )

    m = _CREATE_SIGS.match(sql)
    if m:
        catalog.create_signatures(
            m.group("name"),
            _ddl_input_dir(m.group("table"), tables, "CREATE SIGNATURES"),
            tokens_col=m.group("tokens"),
            id_col=m.group("id"),
            r=int(m.group("r") or 128),
            n_bands=int(m.group("bands") or 32),
            seed=int(m.group("seed") or 17),
            overwrite=bool(m.group("replace")),
        )
        return catalog.list_signatures().where(f"name = '{m.group('name')}'")

    m = _REFRESH_ANN.match(sql)
    if m:
        stats = catalog.refresh_ann_index(m.group("name"))
        return spark.createDataFrame(
            [(m.group("name"), stats["new_files"], stats["rows_added"])],
            "name string, new_files int, rows_added long",
        )

    m = _CREATE_ANN.match(sql)
    if m:
        catalog.create_ann_index(
            m.group("name"),
            _ddl_input_dir(m.group("table"), tables, "CREATE ANN INDEX"),
            kind=m.group("kind").lower(),
            vec_col=m.group("vec"),
            id_col=m.group("id"),
            n_bits=int(m.group("bits") or 16),
            n_lists=int(m.group("lists") or 16),
            seed=int(m.group("seed") or 31),
            overwrite=bool(m.group("replace")),
        )
        return catalog.list_ann_indexes().where(f"name = '{m.group('name')}'")

    m = _SHOW_SKETCHES.match(sql)
    if m:
        return catalog.list()

    for pat, exists_fn, drop_fn in (
        (_DROP_SAMPLE, catalog.sample_exists, catalog.drop_sample),
        (_DROP_SKETCHES, catalog.exists, catalog.drop),
        (_DROP_ANN, catalog.ann_exists, catalog.drop_ann_index),
        (_DROP_SIGS, catalog.sig_exists, catalog.drop_signatures),
    ):
        m = pat.match(sql)
        if m:
            name = m.group("name")
            existed = exists_fn(name)
            drop_fn(name)
            return spark.createDataFrame([(name, existed)], "name string, dropped boolean")

    m = _CREATE_SKETCHES.match(sql)
    if m:
        name = m.group("name")
        input_dir = _ddl_input_dir(m.group("table"), tables, "CREATE SKETCHES")
        specs = []
        from sketchlib.spark.build import _PLUGIN_STYLE

        for sm in re.finditer(r"(\w+)\s*\(([^()]*)\)", m.group("specs")):
            kind = sm.group(1).lower()
            # user kinds registered via register_sketch_kind are first-class
            # in the DDL too (no parameter defaults — pass key=value args)
            if kind not in _SKETCH_DDL_DEFAULTS and kind not in _PLUGIN_STYLE:
                raise ValueError(
                    f"unknown sketch kind {kind!r} — built-ins "
                    f"{sorted(_SKETCH_DDL_DEFAULTS)}"
                    + (
                        f", registered plugins {sorted(_PLUGIN_STYLE)}"
                        if _PLUGIN_STYLE
                        else ""
                    )
                )
            args = [a.strip() for a in sm.group(2).split(",") if a.strip()]
            if not args or not _IDENT.match(args[0]):
                raise ValueError(f"{kind}(...) needs a column name as its first argument")
            col = args[0]
            params = dict(_SKETCH_DDL_DEFAULTS.get(kind, {}))
            weight = None
            for kv in args[1:]:
                k, eq, v = kv.partition("=")
                if not eq:
                    raise ValueError(f"sketch parameter {kv!r} must be key=value")
                if k.strip().lower() == "weight":
                    # weighted frequency sketch (heavy hitters BY SUM) or
                    # weighted t-digest (weight-mass quantiles): the value
                    # is a COLUMN name, not a number
                    if kind not in ("cm", "mg", "tdigest"):
                        raise ValueError(
                            f"weight= needs a frequency sketch (cm or mg) or "
                            f"a tdigest (weighted quantiles); {kind}(...) has "
                            "no weighted-update semantics"
                        )
                    if not _IDENT.match(v.strip()):
                        raise ValueError(
                            f"{kind} weight={v.strip()!r} must be a column name"
                        )
                    weight = v.strip()
                    continue
                try:
                    fv = float(v)
                except ValueError:
                    raise ValueError(
                        f"sketch parameter {k.strip()}={v.strip()!r} must be numeric"
                    ) from None
                params[k.strip().lower()] = int(fv) if fv.is_integer() else fv
            if kind == "fd" and "d" not in params:
                raise ValueError(
                    "fd(col, d=<dim>[, ell=]) requires d — the fixed "
                    "embedding dimension the sketch reshapes the vector "
                    "stream by (no default could be safe: a wrong d "
                    "silently sketches misaligned rows)"
                )
            spec_name = f"{kind}_{col}" if weight is None else f"{kind}_{col}_w_{weight}"
            specs.append(SketchSpec(spec_name, kind, col, params, weight=weight))
        catalog.create(
            name, input_dir, specs,
            group_by=_parse_group(m.group("group")),
            overwrite=bool(m.group("replace")),
        )
        return catalog.list().where(f"name = '{name}'")

    m = _CREATE_SAMPLE.match(sql)
    if m:
        import json

        name = m.group("name")
        input_dir = _ddl_input_dir(m.group("table"), tables, "CREATE SAMPLE")
        kind = m.group("kind").lower()
        if m.group("fractions"):
            try:
                fractions = json.loads(m.group("fractions"))
            except json.JSONDecodeError:
                raise ValueError(
                    "FRACTIONS must be a JSON object mapping group -> probability, "
                    "e.g. FRACTIONS '{\"web\": 0.1, \"books\": 0.5}'"
                ) from None
        else:
            fractions = None
        try:
            ratio = float(m.group("ratio") or 0.1)
        except ValueError:
            raise ValueError(
                f"RATIO {m.group('ratio')!r} must be a number in (0, 1]"
            ) from None
        catalog.create_sample(
            name,
            input_dir,
            kind=kind,
            ratio=ratio,
            on=m.group("on"),
            fractions=fractions,
            seed=int(m.group("seed") or 42),
            overwrite=bool(m.group("replace")),
        )
        return catalog.list_samples().where(f"name = '{name}'")

    raise ValueError(
        "unsupported DDL — accepted: CREATE [OR REPLACE] SAMPLE s FROM t KIND "
        "uniform|universe|stratified RATIO r [ON col] [FRACTIONS '<json>'] "
        "[SEED n]; CREATE [OR REPLACE] SKETCHES s FROM t KINDS hll(col[, p=14])"
        "[, cm(col[, weight=w]), mg(col[, eps=1e-4][, weight=w]), kll(col), "
        "tdigest(col), dd(col[, alpha=0.01]), "
        "bloom(col), kmv(col), fd(col, d=<dim>[, ell=128])] "
        "[GROUP BY col]; "
        "CREATE [OR REPLACE] ANN INDEX s FROM t KIND srp|ivf ON vec ID id "
        "[BITS n] [LISTS n] [SEED n]; "
        "CREATE [OR REPLACE] SIGNATURES s FROM t ON tokens ID id "
        "[R n] [BANDS n] [SEED n]; "
        "SHOW SAMPLES; DROP SAMPLE s; REFRESH SAMPLE s; "
        "SHOW SKETCHES; DROP SKETCHES s; REFRESH SKETCHES s; "
        "SHOW ANN INDEXES; DROP ANN INDEX s; REFRESH ANN INDEX s; "
        "SHOW SIGNATURES; DROP SIGNATURES s; REFRESH SIGNATURES s"
    )


def _split_args(argstr: str) -> list[str]:
    """Split on TOP-LEVEL commas only (expression args contain commas)."""
    out, depth, cur = [], 0, []
    for ch in argstr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            piece = "".join(cur).strip()
            if piece:
                out.append(piece)
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def _expr_slug(expr: str) -> str:
    """Deterministic, human-readable column slug for an expression argument —
    derived from the TEXT, so identical expressions map to identical columns
    (they share one derived column and one sampling slot in _multi_agg)."""
    return re.sub(r"\W+", "_", expr.strip()).strip("_").lower()[:48] or "expr"


def _materialize_expr(df: DataFrame, col: str, slot: str = "") -> tuple[DataFrame, str]:
    """Sketch builds consume COLUMNS; an expression argument is projected to
    a derived column first (Catalyst computes it inside the same scan).

    The derived column is keyed on the EXACT expression text (slug for
    readability + text hash for uniqueness): slugging alone strips operators,
    so distinct expressions like ``a+b`` and ``a-b`` would collide on one
    column and the second aggregate would silently reuse the first's values.
    """
    if _IDENT.match(col):
        return df, col
    import hashlib

    from pyspark.sql import functions as F

    digest = hashlib.sha1(col.strip().encode()).hexdigest()[:8]
    name = f"_expr_{_expr_slug(col)}_{digest}"
    if name not in df.columns:
        df = df.withColumn(name, F.expr(col))
    return df, name


def _parse_group(raw: str | None):
    """GROUP BY clause → None | column name | list of column names."""
    if not raw:
        return None
    if _ROLLUP_GROUP.match(raw):
        # only the plain single-aggregate statement path dispatches rollups
        # (before calling here) — anywhere else must refuse loudly rather
        # than silently grouping by a column literally named "ROLLUP(...)"
        raise ValueError(
            "GROUP BY ROLLUP/CUBE composes only with a plain single-"
            "aggregate statement (no aliases, joins, set operations, or "
            "WITHIN/HAVING tails) — issue one statement per grouping set "
            "for richer shapes"
        )
    parts = [p.strip() for p in raw.split(",")]
    return parts if len(parts) > 1 else parts[0]


def _canon_group(group) -> str:
    """Canonical registration string for a group_by of any shape."""
    if group is None:
        return ""
    return ",".join(group) if isinstance(group, (list, tuple)) else group


def _ungroup(df: DataFrame, base: DataFrame | None, group) -> DataFrame:
    """Restore the user's GROUP BY columns from the internal string ``group``
    column: split composite keys into one column each, cast every key column
    back to its native type in ``base`` (string when the base is unknown)."""
    from pyspark.sql import functions as F

    native = dict(base.dtypes) if base is not None else {}
    if isinstance(group, (list, tuple)):
        from sketchlib.spark.build import split_group

        df = split_group(df, list(group))
        for c in group:
            df = df.withColumn(c, F.col(c).cast(native.get(c, "string")))
        return df
    return df.withColumn("group", F.col("group").cast(native.get(group, "string"))).withColumnRenamed(
        "group", group
    )


def _with_gkey(s: DataFrame, group) -> tuple[DataFrame, str | None]:
    """(df + derived key column, aggregation column) for a composite GROUP BY;
    single-column / global groups pass through unchanged."""
    if isinstance(group, (list, tuple)):
        from sketchlib.spark.build import group_key_expr

        return s.withColumn("_gkey_sql", group_key_expr(list(group))), "_gkey_sql"
    return s, group


def _finish_grouped(out: DataFrame, base: DataFrame | None, group) -> DataFrame:
    """Shape a sketch-path result for the user: drop the group column when
    ungrouped, split composite keys back into native-typed columns (via
    _ungroup); single-column groups keep the generic ``group`` column."""
    if not group:
        return out.drop("group")
    if isinstance(group, (list, tuple)):
        return _ungroup(out, base, group)
    return out


def _resolve_table(spark: SparkSession, name: str, tables: dict | None) -> DataFrame:
    if tables and name in tables:
        t = tables[name]
        return spark.read.parquet(t) if isinstance(t, str) else t
    if "/" in name:
        return spark.read.parquet(name)
    return spark.table(name)


_CATALOG_KINDS = {
    "APPROX_COUNT_DISTINCT": ("hll", "kmv"),
    "APPROX_TOPK": ("cm",),
    "APPROX_TOP_SUM": ("cm",),
    "APPROX_PERCENTILE": ("kll", "tdigest", "dd"),
    "APPROX_SPECTRUM": ("fd",),
    # mad/trimmed-mean read the state's weighted item view — KLL and
    # t-digest only (a dd state's bound is in different units and its
    # bucket midpoints are not a value coreset)
    "APPROX_MAD": ("kll", "tdigest"),
    "APPROX_TRIMMED_MEAN": ("kll", "tdigest"),
    "APPROX_HISTOGRAM": ("kll", "tdigest"),
    # the DETERMINISTIC heavy hitters: same statement shape as
    # APPROX_TOPK but a different bound CONTRACT (mg undercount
    # certificate vs CM overcount) — two heads so neither can be read
    # with the other's interval
    "APPROX_FREQUENT": ("mg",),
}


def _frequent_args(args: list) -> tuple[int, float | None]:
    """(k, eps or None) from APPROX_FREQUENT(col, k [, eps]) — eps sizes
    the on-the-fly summary (counters = ⌈1/ε⌉−1) and gates routing (only
    registered MG states at least that accurate claim the statement)."""
    if len(args) not in (2, 3):
        raise ValueError(
            "APPROX_FREQUENT takes (col, k [, eps]) — deterministic top-k "
            "heavy hitters from a Misra-Gries summary"
        )
    kv = _num(args[1])
    if kv is None or int(kv) != kv or kv < 1:
        raise ValueError(
            f"APPROX_FREQUENT k argument {args[1]!r} must be a positive integer"
        )
    eps = None
    if len(args) == 3:
        eps = _num(args[2])
        if eps is None or not (0.0 < eps < 1.0):
            raise ValueError(
                f"APPROX_FREQUENT eps argument {args[2]!r} must be a number "
                "in (0, 1) — the undercount bound is ≤ ε·N"
            )
    return int(kv), eps


def _mg_spec_serves(fn, args, s: dict) -> bool:
    """Whether a registered MG spec serves this APPROX_FREQUENT statement:
    weighted MGs never serve the plain statement (their certificate is in
    weight units), and an explicit eps routes only to summaries at least
    that accurate (k ≥ ⌈1/ε⌉−1 counters — same explicit-accuracy rule as
    CM's eps)."""
    if fn != "APPROX_FREQUENT":
        return True
    if s["kind"] != "mg":
        return False
    if s.get("weight"):
        return False
    _, eps = _frequent_args(args)
    if eps is not None:
        import math as _math

        need_k = max(1, int(_math.ceil(1.0 / eps)) - 1)
        p = s.get("params", {})
        have_k = p.get("k")
        if have_k is None and p.get("eps") is not None:
            have_k = max(1, int(_math.ceil(1.0 / float(p["eps"]))) - 1)
        return have_k is not None and int(have_k) >= need_k
    return True


def _cm_spec_serves(fn, args, s: dict) -> bool:
    """Whether a registered CM spec can serve this top-k statement.

    APPROX_TOPK routes only to UNWEIGHTED CMs and APPROX_TOP_SUM only to a
    CM whose weight column matches the statement's — cross-serving would
    silently answer a SUM question with occurrence counts (or vice versa).
    An explicit eps argument routes only to states achieving it (the same
    explicit-accuracy rule as COUNT_DISTINCT's rse), so a WITHIN-derived
    eps is honored, not silently loosened."""
    if s["kind"] != "cm":
        return True
    if fn == "APPROX_TOP_SUM":
        if s.get("weight") != (args[1].strip() if len(args) > 1 else None):
            return False
        req_eps = _num(args[3]) if len(args) > 3 else None
    else:
        if s.get("weight"):
            return False
        req_eps = _num(args[2]) if fn == "APPROX_TOPK" and len(args) > 2 else None
    if req_eps is not None:
        return float(s.get("params", {}).get("eps", 1e-4)) <= req_eps * (1 + 1e-9)
    return True


def _pct_spec_serves(fn, args, s: dict) -> bool:
    """Whether a registered quantile spec can serve this percentile
    statement — the bound-semantics analog of ``_cm_spec_serves``: a
    ``rel_err=`` statement (relative VALUE contract) routes only to a
    DDSketch whose alpha achieves it, and a dd state never serves a
    plain/rank-bounded statement (its bound is in different units —
    cross-serving would surface α as a rank error). A WEIGHTED tdigest
    (weight-mass distribution) never serves the quantile-family
    statements implicitly — its CDF is a different distribution than the
    row population every plain statement asks about (the same
    no-cross-serving rule weighted CMs follow); a ``weight=`` statement
    routes ONLY to a tdigest whose registered weight column matches."""
    if fn in ("APPROX_MAD", "APPROX_TRIMMED_MEAN", "APPROX_HISTOGRAM"):
        return not s.get("weight")
    if fn != "APPROX_PERCENTILE":
        return True
    want_w = _pct_weight(args)
    if (s.get("weight") or None) != want_w:
        return False
    if want_w is not None:
        return s["kind"] == "tdigest"
    rel = _percentile_args(args)[2]
    if rel is not None:
        return s["kind"] == "dd" and float(
            s.get("params", {}).get("alpha", 1.0)
        ) <= rel * (1 + 1e-9)
    return s["kind"] != "dd"


def _top_sum_k(args) -> int:
    """Validated k for APPROX_TOP_SUM(key, weight, k [, eps])."""
    if len(args) < 3:
        raise ValueError(
            "APPROX_TOP_SUM takes (key, weight, k [, eps]) — e.g. "
            "APPROX_TOP_SUM(l_orderkey, l_quantity, 10)"
        )
    kv = _num(args[2])
    if kv is None or kv <= 0 or kv != int(kv):
        raise ValueError(
            f"APPROX_TOP_SUM k argument {args[2]!r} must be a positive integer"
        )
    return int(kv)


def _table_dir(table_token: str, tables: dict | None) -> str | None:
    """The FROM token's storage identity (a parquet dir), or None when the
    token is a view/DataFrame whose lineage we can't match to registrations."""
    if tables and table_token in tables and isinstance(tables[table_token], str):
        return tables[table_token]
    if "/" in table_token:
        return table_token
    return None


def _resolve_key(
    fn, args, group, has_where, table_token, tables, catalog,
    reg_rows=None, sample_rows=None, uniform_samples_only=False,
) -> str | None:
    """Verdict's sample-selection step (SampleManager choosing the best
    registered sample for a query — the user never names one): pick the
    best catalog artifact that can answer (fn, col, group, where) over the
    FROM table, or None to fall back to an on-the-fly build.

    ``uniform_samples_only`` is the ERROR BY SUBSAMPLING mode: the
    variational-subsampling estimator needs Bernoulli(p) ROWS at one shared
    inclusion probability, so sketch states (pre-reduced, no rows) and
    stratified scrambles (mixed fractions) are both ineligible.

    Ranking:
    1. persisted SKETCH STATES — pre-reduced KBs, corpus-independent query
       latency — when eligible (no WHERE, exact GROUP BY match: states were
       built unfiltered at one grouping);
    2. persisted SAMPLES (scrambles) — row/domain subsets, so WHERE commutes
       with the sampling and any grouping works. A stratified sample keyed
       on the GROUP BY column beats uniform (per-group variance control,
       Verdict's own preference for grouped aggregates); remaining ties go
       to the LARGEST ratio (lowest error), then name for determinism.

    An EXPLICIT accuracy argument in the statement is honored, not silently
    dropped: APPROX_COUNT_DISTINCT(col, rse) only routes to sketch states
    whose parameters achieve that rse (HLL: 1.04/√2ᵖ; KMV: 1/√(k−1)) and
    skips universe scrambles (their achieved rse depends on the unknown
    distinct count, so a static guarantee is impossible); the sampling
    aggregates' ratio argument only routes to uniform samples of ≥ that
    ratio. When nothing registered can achieve the request, the resolver
    returns None and the on-the-fly build honors it exactly. Stratified
    samples stay exempt from the ratio test — they are chosen for
    per-group variance control, and their per-stratum fractions aren't
    comparable to a single uniform ratio. Statements WITHOUT an explicit
    accuracy argument route to any fitting artifact (the registered
    artifact's own error columns stay honest either way).
    """
    import json
    import os

    base = _table_dir(table_token, tables)
    if base is None:
        return None
    base_n = os.path.normpath(base)
    col = args[0] if args else None

    req_rse = _num(args[1]) if fn == "APPROX_COUNT_DISTINCT" and len(args) > 1 else None
    req_rank = req_rel = None
    if fn == "APPROX_PERCENTILE":
        _, req_rank, req_rel = _percentile_args(args)
    if fn == "APPROX_COUNT" and args:
        req_ratio = _num(args[0])
    elif fn in ("APPROX_SUM", "APPROX_AVG", "APPROX_VARIANCE", "APPROX_STDDEV") and len(args) > 1:
        req_ratio = _num(args[1])
    elif fn in ("APPROX_COVAR", "APPROX_CORR") and len(args) > 2:
        req_ratio = _num(args[2])
    else:
        req_ratio = None

    def _achieves_rse(s: dict) -> bool:
        if fn == "APPROX_PERCENTILE":
            if req_rel is not None:
                # relative-VALUE contract: only DDSketch bounds it, and only
                # one whose alpha achieves the target
                a = float(s.get("params", {}).get("alpha", 1.0))
                return s["kind"] == "dd" and a <= req_rel * (1 + 1e-9)
            if s["kind"] == "dd":
                # a dd state's bound is relative VALUE error — it must never
                # serve a plain/rank-bounded percentile implicitly (the same
                # no-cross-serving rule the weighted/unweighted CMs follow)
                return False
        if req_rank is not None:
            # rank-error contract: only a KLL with ε(k) ≈ 3.31/k ≤ target
            # can promise it statically (t-digest has no closed bound)
            k = float(s.get("params", {}).get("k", 0))
            return s["kind"] == "kll" and k > 0 and 3.31 / k <= req_rank * (1 + 1e-9)
        if req_rse is None:
            return True
        params = s.get("params", {})
        if s["kind"] == "hll":
            return 1.04 / (2.0 ** float(params.get("p", 14))) ** 0.5 <= req_rse * (1 + 1e-9)
        if s["kind"] == "kmv":
            # same bound the sketch itself reports (sketches/kmv.py): a
            # looser gate formula would admit states whose answer frame
            # then carries rse_bound > the requested rse
            k = float(params.get("k", 1024))
            return k > 2 and 1.0 / (k - 2) ** 0.5 <= req_rse * (1 + 1e-9)
        return False

    kinds = _CATALOG_KINDS.get(fn)
    if kinds and not has_where and not uniform_samples_only:
        want_group = _canon_group(group)
        # newest registration first, name as tie-break — deterministic when
        # several sets hold the same sketch
        if reg_rows is None:
            reg_rows = catalog.list_rows()
        regs = sorted(reg_rows, key=lambda r: (-r["built_unix"], r["name"]))
        for reg in regs:
            if os.path.normpath(reg["input_dir"]) != base_n or reg["group_by"] != want_group:
                continue
            specs = json.loads(reg["specs_json"])
            if any(
                s["kind"] in kinds and s["column"] == col and _achieves_rse(s)
                and _cm_spec_serves(fn, args, s) and _mg_spec_serves(fn, args, s)
         and _pct_spec_serves(fn, args, s)
                and _fd_spec_serves(fn, args, s)
                for s in specs
            ):
                return reg["name"]

    def eligible(r) -> bool:
        k = r["kind"]
        if uniform_samples_only and k != (
            "universe" if fn == "APPROX_COUNT_DISTINCT" else "uniform"
        ):
            return False
        if fn in ("APPROX_COUNT", "APPROX_SUM", "APPROX_AVG"):
            # stratified serves global statements (cross-strata ratio
            # estimator) and statements grouped exactly on its key column
            if k == "uniform":
                return req_ratio is None or float(r["ratio"] or 0.0) >= req_ratio - 1e-12
            return k == "stratified" and (group is None or group == r["on_col"])
        if fn in ("APPROX_VARIANCE", "APPROX_STDDEV", "APPROX_COVAR", "APPROX_CORR"):
            # uniform only: the moment estimators assume ONE shared inclusion
            # probability; a stratified scramble's mixed fractions would bias
            # the pooled second/fourth (or cross) moments
            return k == "uniform" and (
                req_ratio is None or float(r["ratio"] or 0.0) >= req_ratio - 1e-12
            )
        if fn == "APPROX_COUNT_DISTINCT":
            return k == "universe" and r["on_col"] == col and req_rse is None
        if fn == "APPROX_PERCENTILE":
            # an accuracy contract needs a static guarantee — only KLL
            # (rank_err) / DDSketch (rel_err) STATES give one; scrambles'
            # empirical-quantile error depends on the (unknown-ahead)
            # sample row count. A weight= statement asks about the
            # weight-mass distribution — only a weighted tdigest holds it.
            if req_rank is not None or req_rel is not None or _pct_weight(args) is not None:
                return False
            return k == "uniform" or (k == "stratified" and group == r["on_col"])
        return False

    if sample_rows is None:
        sample_rows = catalog.list_sample_rows()
    ok = [r for r in sample_rows if os.path.normpath(r["input_dir"]) == base_n and eligible(r)]
    if not ok:
        return None

    def rank(r):
        strat_on_group = r["kind"] == "stratified" and group is not None and group == r["on_col"]
        return (1 if strat_on_group else 0, float(r["ratio"] or 0.0), r["name"])

    return max(ok, key=rank)["name"]


def resolve_catalog_key(
    spark: SparkSession, sql: str, tables: dict | None = None, catalog=None
) -> str | None:
    """Which catalog artifact would ``approx_sql`` auto-select for this
    statement? None = no registered artifact fits (the statement would run
    as an on-the-fly build over the base table). Single-aggregate
    statements only; ORDER BY/LIMIT tails are ignored for routing."""
    if catalog is None:
        return None
    body = sql
    ssm = _SUBSAMPLE_TAIL.match(_mask_literals(body)) and _SUBSAMPLE_TAIL.match(body)
    subsample = bool(ssm)
    if ssm:
        body = ssm.group("body")
    while True:  # peel ORDER BY / LIMIT / HAVING tails, innermost last
        tm = _ORDER_TAIL.match(body) or _LIMIT_TAIL.match(body) or _HAVING_TAIL.match(body)
        if not tm:
            break
        body = tm.group("body")
    m = _SKELETON.match(body)
    if not m:
        return None
    aggs = [(f.upper(), _split_args(argstr)) for f, argstr in _AGG.findall(m.group("select"))]
    if len(aggs) != 1:
        return None
    fn, args = aggs[0]
    group = _parse_group(m.group("group"))
    return _resolve_key(fn, args, group, bool(m.group("where")), m.group("table"),
                        tables, catalog, uniform_samples_only=subsample)


_EXPLAIN_SCHEMA = "property string, value string"


# ONE copy of the weighted-percentile-over-row-sample refusal, shared by
# execution and EXPLAIN (_sample_serving_mismatch) so the two cannot drift
_PCT_WEIGHT_SAMPLE_MSG = (
    "weighted percentile (weight=) serves from a weighted tdigest's states, "
    "not a row sample — register tdigest(col, weight=w) or drop catalog_key"
)


def _sample_serving_mismatch(fn, args, meta, estimator, key) -> str | None:
    """The serving branch's kind/column compatibility gates, replicated for
    EXPLAIN (an EXPLICIT catalog_key can name an incompatible sample —
    auto-resolution never does): None = the sample serves; a message = the
    same raise execution makes. Kept NEXT to the schema both share so a new
    serving gate is added here in the same diff."""
    k = meta["kind"]
    if fn == "APPROX_COUNT_DISTINCT":
        col = args[0] if args else None
        if k != "universe" or meta["on_col"] != col:
            return (f"APPROX_COUNT_DISTINCT({col}) needs a universe sample "
                    f"on {col!r}; {key!r} is {k} on {meta['on_col']!r}")
        return None
    if fn in ("APPROX_VARIANCE", "APPROX_STDDEV", "APPROX_COVAR", "APPROX_CORR"):
        if k != "uniform":
            return f"{fn} needs a UNIFORM sample; {key!r} is {k}"
        return None
    if fn in ("APPROX_COUNT", "APPROX_SUM", "APPROX_AVG", "APPROX_PERCENTILE"):
        if fn == "APPROX_PERCENTILE" and _pct_weight(args) is not None:
            return _PCT_WEIGHT_SAMPLE_MSG
        if estimator == "subsample" and k != "uniform":
            return ("ERROR BY SUBSAMPLING needs a UNIFORM scramble here; "
                    f"{key!r} is {k}")
        if k not in ("uniform", "stratified"):
            return f"{fn} needs a uniform or stratified sample; {key!r} is {k}"
        return None
    return f"{fn} cannot be answered from a persisted sample table"


def explain_sql(
    spark: SparkSession,
    sql: str,
    tables: dict | None = None,
    catalog=None,
    catalog_key: str | None = None,
    estimator: str = "clt",
) -> DataFrame:
    """Routing EXPLAIN for the approx front door — ``approx_sql(spark,
    "EXPLAIN <statement>")`` lands here. Verdict's users could ask WHICH
    sample served a query; this is that surface, statement-first: the
    answer is (property, value) rows naming the statement kind, the route
    (persisted states / persisted sample / on-the-fly build / join pair),
    and the artifact that would serve it — WITHOUT executing anything.
    Classification + registry lookups only; no scan, no build, no
    temp-view side effects."""
    rows: list[tuple[str, str]] = []

    def emit(k, v) -> None:
        rows.append((k, str(v)))

    def done() -> DataFrame:
        return spark.createDataFrame(rows, _EXPLAIN_SCHEMA)

    stmt = sql.strip()
    if _DDL_HEAD.match(stmt):
        emit("statement_kind", "ddl")
        emit("backend", "SketchCatalog registry")
        return done()
    # ERROR BY SUBSAMPLING tail — peeled exactly where execution peels it,
    # so every route/raise below mirrors approx_sql's estimator-aware path
    ssm = _SUBSAMPLE_TAIL.match(_mask_literals(stmt)) and _SUBSAMPLE_TAIL.match(stmt)
    if ssm:
        stmt, estimator = ssm.group("body"), "subsample"
        if _WITHIN_STUB.search(_mask_literals(stmt)):
            emit("statement_kind", "accuracy_contract")
            emit("error", _WITHIN_SUBSAMPLE_MSG + " — approx_sql would raise")
            return done()
    if estimator == "subsample":
        emit("error_estimator",
             "variational subsampling (VerdictDB §3.2): b≈n^0.3 blocks, "
             "half-width = max(q_conf, z·sd)(|√n_i·(ĝ_i−ĝ)|)/√n · √(1−p)")
        if not _AGG.search(_mask_literals(stmt)):
            emit("statement_kind", "exact_passthrough")
            emit("error", "ERROR BY SUBSAMPLING on a statement with no "
                 "APPROX_ aggregate — approx_sql would raise")
            return done()
    if not _AGG.search(_mask_literals(stmt)):
        emit("statement_kind", "exact_passthrough")
        emit("backend", "spark.sql verbatim (A4)")
        return done()
    cte = _extract_ctes(stmt)
    if cte is not None:
        ctes, final = cte
        emit("statement_kind", "cte")
        emit("cte_names", ",".join(n for n, _ in ctes))
        emit(
            "cte_bodies",
            ",".join(
                "approx" if _AGG.search(_mask_literals(b)) else "exact" for _, b in ctes
            ),
        )
        emit("final_statement", "see nested properties below")
        for k, v in explain_sql(spark, final, tables, catalog, catalog_key,
                                estimator=estimator).collect():
            emit(f"final.{k}", v)
        return done()
    sub = _extract_subquery(stmt)
    if sub is not None:
        head, inner, tail = sub
        setop = _setop_route(head, inner, tail)  # the SAME decision execution makes
        if setop is not None and estimator == "subsample":
            emit("statement_kind", "approx_setop")
            emit("route", "error — approx_sql would raise")
            emit("error", "set operations are sketch-served — ERROR BY "
                 "SUBSAMPLING does not apply")
            return done()
        if setop is not None:
            op, parsed, _args, _alias, grouped = setop
            if grouped is None:
                picks = _resolve_setop_states(op, parsed, _args, tables, catalog)
            else:
                idents = _setop_side_idents(parsed, grouped)
                picks = None if idents is None else _resolve_setop_states(
                    op, parsed, _args, tables, catalog,
                    cols=idents[0], group_cols=idents[1],
                )
            if picks is None and grouped is not None and op == "union":
                setop = None  # execution declines too → the rewrite reports below
            elif picks is None and _setop_scan_frames(
                spark, parsed, grouped, tables, apply_where=False
            ) is None:
                # mixed non-numeric side types: execution declines the scan
                # route to the generic derived-table path — report that
                setop = None
            else:
                emit("statement_kind", "approx_setop")
                emit("set_operation", op)
                emit("n_sides", len(parsed))
                if grouped is not None:
                    emit("group_by", grouped[0])
                emit("sketches", "hll (state merge IS set union)" if op == "union"
                     else "hll + minhash (J·|A ∪ B| composition)")
                if picks is not None:
                    emit("artifacts", ", ".join(p["reg"] for p in picks))
                    emit("route", "ANSWERED FROM PERSISTED STATES — per-side "
                         "registered sketch sets merged; the base tables are "
                         "never scanned (A5 extended to set operations)")
                else:
                    emit("route", ("per-(side × group) sketch build in one pass, "
                                   "per-group state merge" if grouped is not None
                                   else "per-side sketch build in one pass") +
                         " — the sides are never distinct-shuffled or materialized")
                return done()
        merged = None if estimator == "subsample" else _unionall_merge_route(head, inner, tail)
        if merged is not None:
            mfn, margs, msides, _malias, mgrouped = merged
            if mgrouped is None:
                mpicks = _resolve_merge_states(mfn, msides, margs, tables, catalog)
            else:
                idents = _setop_side_idents(msides, mgrouped)
                mpicks = None if idents is None else _resolve_merge_states(
                    mfn, msides, margs, tables, catalog,
                    cols=idents[0], group_cols=idents[1],
                )
            if mpicks is not None:  # the same resolution execution performs
                emit("statement_kind", "approx_unionall_merge")
                emit("aggregate", mfn)
                emit("n_sides", len(msides))
                if mgrouped is not None:
                    emit("group_by", mgrouped[0])
                emit("sketches", mpicks[0]["spec"]["kind"])
                emit("artifacts", ", ".join(p["reg"] for p in mpicks))
                emit("route", "ANSWERED FROM PERSISTED STATES — the sides' "
                     "registered sketches MERGE into the UNION ALL bag's "
                     "sketch; the base tables are never scanned")
                return done()
        sroute = _unionall_sample_route(head, inner, tail)
        if sroute is not None:
            sfn, sargs, ssides, _salias, sgrouped = sroute
            spicks = _resolve_unionall_samples(sfn, ssides, sargs, tables, catalog)
            if spicks is not None and _unionall_sample_frames(
                spark, sfn, spicks, ssides, tables, sgrouped, catalog,
                apply_where=False,
            ) is not None:
                emit("statement_kind", "approx_unionall_sample")
                emit("aggregate", sfn)
                emit("n_sides", len(ssides))
                if sgrouped is not None:
                    emit("group_by", sgrouped[0])
                emit("ratio", picks_ratio := spicks[0]["ratio"])
                emit("artifacts", ", ".join(p["name"] for p in spicks))
                emit("route", "ANSWERED FROM PERSISTED SAMPLES — equal-ratio "
                     "uniform scrambles of the sides concatenate into one "
                     f"Bernoulli({picks_ratio}) sample of the UNION ALL bag; "
                     "only the p-fraction tables are scanned")
                return done()
        inner_kind = "approx (inner error caveat/composition applies)" if _AGG.search(
            _mask_literals(inner)
        ) else "exact"
        emit("statement_kind", "derived_table")
        emit("inner_statement", inner_kind)
        if _union_all_rewrite(head, inner) is not None:
            emit("union_rewrite", "UNION → UNION ALL (duplicate-insensitive "
                 "aggregates; the distinct shuffle is elided)")
        for k, v in explain_sql(spark, f"{head} FROM _derived_{tail}", tables,
                                catalog, None, estimator=estimator).collect():
            if k != "statement_kind":
                emit(f"outer.{k}", v)
        return done()
    wmx = _WITHIN_TAIL.match(_mask_literals(stmt)) and _WITHIN_TAIL.match(stmt)
    if wmx and estimator == "subsample":
        emit("statement_kind", "accuracy_contract")
        emit("error", "WITHIN contracts invert the closed-form bounds — "
             "ERROR BY SUBSAMPLING cannot combine; approx_sql would raise")
        return done()
    if wmx:
        # accuracy contract — checked AFTER the subquery branch, mirroring
        # execution order (a derived-table WITHIN statement extracts the
        # subquery first and applies the contract over the view). Every
        # validation _within_error enforces is replicated here as an error
        # row, so EXPLAIN and execution cannot disagree on what raises.
        # Sketch-family rewrites are pure arithmetic (nested EXPLAIN shows
        # the route they'd take, the statement REBUILT structurally — a
        # textual substitution could splice into unrelated text); the
        # sampling families need the pilot scan, which EXPLAIN describes
        # instead of running (zero data work).
        from statistics import NormalDist

        t = float(wmx.group("pct")) / 100.0
        conf = float(wmx.group("conf") or 95.0) / 100.0
        emit("statement_kind", "accuracy_contract")
        emit("target_rel_error", t)
        emit("confidence", conf)
        if not (0.0 < t < 1.0):
            emit("error", "target outside (0, 100)% — approx_sql would raise")
            return done()
        if not (0.5 <= conf < 1.0):
            emit("error", "confidence outside [50, 100)% — approx_sql would raise")
            return done()
        cbody = wmx.group("body")
        while True:
            tmx = (_ORDER_TAIL.match(cbody) or _LIMIT_TAIL.match(cbody)
                   or _HAVING_TAIL.match(cbody))
            if not tmx:
                break
            cbody = tmx.group("body")
        cm = _SKELETON.match(cbody)
        caggs = [] if not cm else _AGG.findall(cm.group("select"))
        if cm is None or not caggs:
            emit("error", "WITHIN ... ERROR needs the single-table approx "
                 "skeleton — approx_sql would raise")
            return done()
        z = NormalDist().inv_cdf(0.5 + conf / 2.0)
        double_spec = "error — approx_sql would raise: give ONE accuracy spec"
        sel_items: list[str] = []
        needs_pilot = False
        for i, (cfn_raw, cargstr) in enumerate(caggs):
            cfn = cfn_raw.upper()
            cargs = _split_args(cargstr)
            prefix = f"agg{i}." if len(caggs) > 1 else ""
            if cfn == "APPROX_COUNT_DISTINCT":
                if len(cargs) > 1:
                    emit("error", double_spec + f" (explicit rse + WITHIN, {cfn})")
                    return done()
                emit(f"{prefix}plan", f"rewrite to explicit rse = target/z = {t / z:.6g} "
                     "(1σ figure; routing honors it)")
                sel_items.append(f"{cfn}({cargs[0]}, {t / z!r})")
            elif cfn == "APPROX_TOPK":
                if len(cargs) > 2:
                    emit("error", double_spec + f" (explicit eps + WITHIN, {cfn})")
                    return done()
                emit(f"{prefix}plan", f"rewrite to explicit eps = {t!r} (CM overcount "
                     "≤ ε·N w.p. 1−δ, δ=0.01; routing honors it — only "
                     "achieving CM states claim the route)")
                sel_items.append(f"{cfn}({', '.join(cargs[:2])}, {t!r})")
            elif cfn == "APPROX_TOP_SUM":
                if len(cargs) > 3:
                    emit("error", double_spec + f" (explicit eps + WITHIN, {cfn})")
                    return done()
                emit(f"{prefix}plan", f"rewrite to explicit eps = {t!r} (weighted CM "
                     "overcount ≤ ε·ΣW w.p. 1−δ, δ=0.01)")
                sel_items.append(f"{cfn}({', '.join(cargs[:3])}, {t!r})")
            elif cfn == "APPROX_PERCENTILE":
                if _pct_weight(cargs) is not None:
                    # same refusal _within_error makes: a weighted digest's
                    # bound is fixed at build — no contract can re-plan it
                    emit("error", double_spec + f" (weight= + WITHIN, {cfn})")
                    return done()
                _, _wrank, _wrel = _percentile_args(cargs)
                if _wrank is not None or _wrel is not None:
                    emit("error", double_spec + f" (rank_err/rel_err + WITHIN, {cfn})")
                    return done()
                from sketchlib.planner import kll_params

                emit(f"{prefix}plan", f"rank_err={t!r} → KLL "
                     f"k={max(200, kll_params(t)['k'])} on the fly; only "
                     "achieving KLL states claim the route")
                sel_items.append(f"{cfn}({', '.join(cargs + [f'rank_err={t!r}'])})")
            elif cfn in ("APPROX_COUNT", "APPROX_SUM", "APPROX_AVG",
                         "APPROX_VARIANCE", "APPROX_STDDEV",
                         "APPROX_COVAR", "APPROX_CORR"):
                if cfn == "APPROX_COUNT":
                    has_ratio = bool([a for a in cargs if a.strip() != "*"])
                elif cfn in ("APPROX_COVAR", "APPROX_CORR"):
                    has_ratio = len(cargs) > 2
                else:
                    has_ratio = len(cargs) > 1
                if has_ratio:
                    emit("error", double_spec + f" (explicit ratio + WITHIN, {cfn})")
                    return done()
                needs_pilot = True
                emit(f"{prefix}plan", "pilot Bernoulli scan (ratio 0.02, over the "
                     "largest registered uniform scramble when one exists) "
                     "estimates the data terms, the closed-form CLT"
                     + ("/Fisher" if cfn == "APPROX_CORR" else "")
                     + " inversion plans the ratio (worst group under GROUP BY); "
                     "a multi-aggregate contract pays the pilot once — "
                     "EXPLAIN does not run it"
                     + ("; the CORR target is ABSOLUTE (±t on r)" if cfn == "APPROX_CORR" else ""))
            else:
                emit("error", f"{cfn} does not take a WITHIN contract — "
                     "approx_sql would raise")
                return done()
        if needs_pilot:
            return done()  # the planned ratios need data — no nested route
        rewritten = f"SELECT {', '.join(sel_items)} FROM {cm.group('table')}"
        if cm.group("where"):
            rewritten += f" WHERE {cm.group('where')}"
        if cm.group("group"):
            rewritten += f" GROUP BY {cm.group('group')}"
        emit("rewritten_statement", "see nested properties below")
        for k, v in explain_sql(spark, rewritten, tables, catalog, catalog_key).collect():
            emit(f"rewritten.{k}", v)
        return done()
    body, tails = stmt, []
    while True:
        tm = _ORDER_TAIL.match(body) or _LIMIT_TAIL.match(body) or _HAVING_TAIL.match(body)
        if not tm:
            break
        tails.append("HAVING" if "pred" in tm.groupdict() else
                     ("ORDER BY" if "keys" in tm.groupdict() else "LIMIT"))
        body = tm.group("body")
    if tails:
        emit("result_tails", ",".join(reversed(tails)))
    jr = _JOIN_ROWS_SKELETON.match(body)
    if jr:
        # mirrors _approx_join_rows' gates exactly (EXPLAIN↔execution parity)
        emit("statement_kind", "approx_join_rows")
        if estimator == "subsample":
            emit("route", "error — approx_sql would raise")
            emit("error", "APPROX_JOIN_ROWS is sketch-served (CM inner "
                 "product); ERROR BY SUBSAMPLING applies to the sampling "
                 "aggregates")
            return done()
        if catalog_key is not None:
            emit("route", "error — approx_sql would raise")
            emit("error", "APPROX_JOIN_ROWS resolves ONE registration PER "
                 "SIDE — drop catalog_key")
            return done()
        jr_eps = _num(jr.group("eps"))
        if jr.group("eps") is not None and jr_eps is None:
            emit("route", "error — approx_sql would raise")
            emit("error", f"non-numeric eps argument {jr.group('eps')!r}")
            return done()
        try:
            jr_sides = _join_rows_sides(jr)
        except ValueError as e:
            emit("route", "error — approx_sql would raise")
            emit("error", str(e))
            return done()
        jr_picks = _resolve_join_rows_regs(jr_sides, tables, catalog, jr_eps)
        if jr_picks is not None:
            emit("route", "persisted sketch states (both sides; zero base scans)")
            emit("states_a", f"{jr_picks[0][0]}.{jr_picks[0][1]}")
            emit("states_b", f"{jr_picks[1][0]}.{jr_picks[1][1]}")
        else:
            emit("route", "on-the-fly CM build (one scan per side; the join "
                 "itself never runs)")
            emit("eps", str(jr_eps if jr_eps is not None else 1e-4))
        return done()
    jm = _JOIN3_SKELETON.match(body) or _JOIN_SKELETON.match(body)
    if jm:
        n_tables = 3 if "t3" in jm.groupdict() else 2
        emit("statement_kind", f"approx_join{'' if n_tables == 2 else '3'}")
        if estimator == "subsample":
            emit("route", "error — approx_sql would raise")
            emit("error", "approx joins report closed-form CIs — ERROR BY "
                 "SUBSAMPLING does not apply")
            return done()
        # the SAME parse execution uses — so an unsupported aggregate or an
        # explicit ratio argument changes EXPLAIN's answer exactly as it
        # changes execution's (the first EXPLAIN cut re-implemented both
        # and diverged: ratio ignored, bad qualifiers silently swapped)
        try:
            fn, _vc, ratio_arg = _join_agg(jm.group("select"))
        except ValueError as e:
            emit("route", "error — approx_sql would raise")
            emit("error", str(e))
            return done()
        emit("aggregate", f"{fn}(...)" if not ratio_arg else f"{fn}(..., {ratio_arg})")
        req_ratio = _num(ratio_arg)
        key = catalog_key
        if key is None and catalog is not None:
            try:
                if n_tables == 2:
                    lk, rk = _join_keys(jm)
                    key = _resolve_join_key(
                        jm.group("ta"), jm.group("tb"), lk, rk, tables, catalog,
                        req_ratio=req_ratio,
                    )
                else:
                    toks = [(jm.group(f"t{i}"), jm.group(f"a{i}")) for i in (1, 2, 3)]
                    key = _resolve_join3_key(toks, tables, catalog, req_ratio)
            except ValueError as e:
                emit("route", "error — approx_sql would raise")
                emit("error", str(e))
                return done()
        if key is None:
            emit("route", "on_the_fly (Bernoulli-sample the fact side per statement)")
        elif "," in str(key):
            emit("route", "universe_scramble_pair (p-composition)")
            emit("artifacts", key)
        else:
            emit("route", "fact_sample_x_exact_dim (broadcast dim)"
                 if n_tables == 2 else "uniform_fact_scramble_x_exact_dims")
            emit("artifact", key)
        return done()
    m = _SKELETON.match(body)
    if not m:
        emit("statement_kind", "unsupported")
        emit("error", "outside the approx statement skeleton — approx_sql would raise")
        return done()
    aggs = [(f.upper(), _split_args(a)) for f, a in _AGG.findall(m.group("select"))]
    rmu = _ROLLUP_GROUP.match(m.group("group") or "")
    if rmu:
        emit("statement_kind", "approx_rollup")
        if rmu.group("gsets"):
            nsets = len(_GSET_ITEM.findall(rmu.group("sets")))
            emit("group_by", f"GROUPING SETS — {nsets} explicit grouping sets")
        else:
            mode = rmu.group("mode").upper()
            rcols = [c.strip() for c in rmu.group("cols").split(",")]
            nsets = (2 ** len(rcols)) if mode == "CUBE" else len(rcols) + 1
            emit("group_by", f"{mode}({', '.join(rcols)}) — {nsets} grouping sets")
        if len(aggs) != 1:
            emit("error", "ROLLUP/CUBE takes exactly one un-aliased approx "
                 "aggregate — approx_sql would raise")
            return done()
        fn0 = aggs[0][0]
        emit("aggregate", f"{fn0}({', '.join(aggs[0][1])})")
        if fn0 in _SKETCH_ROLLUP_FNS:
            emit("plan", "ONE build at the finest grain (persisted states "
                 "when catalog_key names a set registered at exactly that "
                 "grain, else one on-the-fly build); every coarser grouping "
                 "set is a KB-sized state MERGE (regroup_states) — zero "
                 "base rescans, per-set cost independent of corpus size")
        else:
            emit("plan", "one statement per grouping set over the same "
                 "seed-fixed sample (registered scramble reused level to "
                 "level)")
        emit("output", "GROUP BY columns (rolled-up → NULL), grouping_lvl "
             "= SQL GROUPING() bitmask, then the aggregate's estimate + "
             "bound columns")
        return done()
    group = _parse_group(m.group("group"))
    emit("statement_kind", "approx_single" if len(aggs) == 1 else "approx_multi")
    if estimator == "subsample":
        if len(aggs) > 1:
            emit("error", "ERROR BY SUBSAMPLING takes one aggregate per "
                 "statement — approx_sql would raise")
            return done()
        if aggs[0][0] not in _SUBSAMPLE_FNS:
            emit("error", f"{aggs[0][0]} is sketch-served — ERROR BY "
                 "SUBSAMPLING does not apply; approx_sql would raise")
            return done()
        if (aggs[0][0] == "APPROX_PERCENTILE"
                and (_percentile_args(aggs[0][1])[1:] != (None, None)
                     or _pct_weight(aggs[0][1]) is not None)):
            emit("error", "rank_err/rel_err/weight + ERROR BY SUBSAMPLING is "
                 "a double estimator spec — approx_sql would raise")
            return done()
        if aggs[0][0] == "APPROX_COUNT_DISTINCT" and len(aggs[0][1]) > 1:
            emit("error", "explicit rse + ERROR BY SUBSAMPLING is a double "
                 "accuracy spec — approx_sql would raise")
            return done()
    emit("table", m.group("table"))
    if m.group("where"):
        has_sub = bool(re.search(r"\(\s*SELECT\b", _mask_literals(m.group("where")), re.IGNORECASE))
        emit("where", "subquery predicate (routed via spark.sql)" if has_sub else "plain predicate")
    if group:
        emit("group_by", _canon_group(group))
    # registries collected ONCE per EXPLAIN (mirrors _multi_agg_routed's
    # caching — k aggregates must not pay 2k registry collects)
    reg_rows = sample_rows = None
    if catalog is not None:
        reg_rows = catalog.list_rows()
        sample_rows = catalog.list_sample_rows()
    for i, (fn, args) in enumerate(aggs):
        prefix = f"agg{i}." if len(aggs) > 1 else ""
        emit(f"{prefix}aggregate", f"{fn}({', '.join(args)})")
        key = catalog_key
        if key is None and catalog is not None:
            key = _resolve_key(
                fn, args, group, bool(m.group("where")), m.group("table"), tables,
                catalog, reg_rows=reg_rows, sample_rows=sample_rows,
                uniform_samples_only=(estimator == "subsample"),
            )
        if key is None and estimator == "subsample" and fn in (
            "APPROX_PERCENTILE", "APPROX_COUNT_DISTINCT"
        ):
            emit(f"{prefix}route", "error — approx_sql would raise")
            emit(f"{prefix}error", f"{fn} ERROR BY SUBSAMPLING needs a "
                 "registered "
                 + ("universe scramble on the column; the on-the-fly route "
                    "is an HLL sketch" if fn == "APPROX_COUNT_DISTINCT" else
                    "uniform scramble; the on-the-fly route is KLL states"))
        elif key is None:
            emit(f"{prefix}route", "on_the_fly (scan the base table, build per statement)")
        elif catalog is None:
            # catalog_key without a catalog: approx_sql refuses the pair —
            # report that instead of crashing on a None catalog
            emit(f"{prefix}route", "error — approx_sql would raise")
            emit(f"{prefix}error", "catalog_key without catalog does nothing")
        elif catalog.sample_exists(key):
            # SAMPLE FIRST — execution's own priority (a sketch set and a
            # sample may share a name across the two registries; the serving
            # path checks sample_exists first, so EXPLAIN must too)
            meta = catalog.sample_meta(key)
            mismatch = _sample_serving_mismatch(fn, args, meta, estimator, key)
            if mismatch:
                emit(f"{prefix}route", "error — approx_sql would raise")
                emit(f"{prefix}error", mismatch)
            else:
                emit(f"{prefix}route", f"persisted_sample ({meta['kind']}, ratio={meta['ratio']})")
                emit(f"{prefix}artifact", key)
        elif any(r["name"] == key for r in reg_rows):
            if estimator == "subsample":
                emit(f"{prefix}route", "error — approx_sql would raise")
                emit(f"{prefix}error", f"{key!r} is a sketch-states set — "
                     "ERROR BY SUBSAMPLING needs a uniform scramble")
            elif m.group("where"):
                # execution refuses WHERE on pre-reduced states (explicit
                # key only — auto-resolution never picks states under
                # WHERE); EXPLAIN must report the same raise
                emit(f"{prefix}route", "error — approx_sql would raise")
                emit(f"{prefix}error", "sketch states were built over the "
                     "unfiltered table — WHERE cannot be applied post-hoc "
                     "to pre-reduced states")
            else:
                emit(f"{prefix}route", "persisted_sketch_states (base table never read, A5)")
                emit(f"{prefix}artifact", key)
        else:
            emit(f"{prefix}route", "error — approx_sql would raise")
            emit(f"{prefix}error", f"catalog has no sketch set or sample {key!r}")
    return done()


from itertools import count as _count

_SUBQUERY_IDS = _count()


def _mask_literals(sql: str) -> str:
    """Same-length text with single-quoted literal CONTENTS blanked, so
    regex/paren scans can't be fooled by 'FROM (' or ')' inside strings
    while every index still maps onto the original text."""
    return re.sub(r"'[^']*'", lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", sql)


def _extract_ctes(sql: str):
    """Parse ``WITH name AS ( <body> ) [, name2 AS ( <body> ) ...] <final>``
    → ([(name, body), ...], final statement); None when the statement has
    no WITH prefix. Balanced-paren scan over literal-masked text (slices
    the original), so parens inside string literals can't derail it."""
    masked = _mask_literals(sql)
    if not re.match(r"^\s*WITH\b", masked, re.IGNORECASE):
        return None
    ctes = []
    pos = re.match(r"^\s*WITH\s+", masked, re.IGNORECASE).end()
    while True:
        m = re.match(r"(\w+)\s+AS\s*\(", masked[pos:], re.IGNORECASE)
        if not m:
            raise ValueError(
                "malformed WITH clause — expected `name AS ( SELECT ... )` "
                f"at: {sql[pos:pos + 40]!r}"
            )
        name = m.group(1)
        start = pos + m.end() - 1  # the '('
        depth = 0
        for i in range(start, len(masked)):
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
                if depth == 0:
                    break
        else:
            raise ValueError("malformed WITH clause — unbalanced parentheses")
        ctes.append((name, sql[start + 1 : i]))
        rest = re.match(r"\s*,\s*", masked[i + 1 :])
        if rest:
            pos = i + 1 + rest.end()
            continue
        return ctes, sql[i + 1 :].strip()


def _extract_subquery(sql: str):
    """Split ``... FROM ( <inner> ) <tail>`` on the balanced outer parens;
    None when the statement has no derived table. Only the STATEMENT'S OWN
    FROM counts: the first ``FROM`` at paren depth 0 of the literal-masked
    text must be the one followed by ``(`` — a ``FROM (`` nested inside a
    WHERE subquery (``WHERE k IN (SELECT j FROM (SELECT ...))``) is that
    predicate's business (routed whole through _apply_where, where Spark
    parses the nesting natively), not a derived-table statement; keying on
    ANY ``FROM (`` made catalog_key statements with such predicates
    spuriously take (and then refuse) the derived-table branch. Scans
    masked text; slices the original."""
    masked = _mask_literals(sql)
    depth = 0
    for m in re.finditer(r"[()]|\bFROM\b", masked, re.IGNORECASE):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:  # the statement's own FROM
            after = re.match(r"\s*\(", masked[m.end():])
            if not after:
                return None
            start = m.end() + after.end() - 1
            d = 0
            for i in range(start, len(masked)):
                if masked[i] == "(":
                    d += 1
                elif masked[i] == ")":
                    d -= 1
                    if d == 0:
                        return sql[: m.start()], sql[start + 1 : i], sql[i + 1 :]
            return None
    return None


# ---------------------------------------------------------------------------
# Sketch-merge set operations (SURVEY.md A17, exceeding Verdict, which passed
# set-ops through unapproximated): ``SELECT APPROX_COUNT_DISTINCT(x) FROM
# (SELECT x FROM a UNION SELECT x FROM b)`` is answered by building an HLL
# PER SIDE in one pass over the narrow unioned projections and MERGING the
# KB-sized states — the sides are never distinct-shuffled or materialized.
# At 100 TB a UNION-distinct of two fact tables is among the largest shuffles
# a query can ask for; register-wise HLL merge IS set union, so the merged
# estimate is byte-identical to sketching the concatenation (locked by
# test). INTERSECT routes through J·|A ∪ B| (MinHash Jaccard × merged-HLL
# union) and EXCEPT through |A| − |A ∩ B|, each with its composed bound in
# the _err column. The route is an OPTIMIZATION, never the only door: any
# shape it cannot fully parse (mixed operators, chained INTERSECT, multi-
# aggregate heads, GROUP BY tails, un-derivable side columns) falls back to
# the generic derived-table path, which materializes the set-op exactly and
# sketches on top — today's behavior, still correct, just not shuffle-free.
# ---------------------------------------------------------------------------

_SETOP_TOKENS = re.compile(
    r"[()]|\bUNION\s+ALL\b|\bUNION\b|\bINTERSECT\b|\bEXCEPT\b", re.IGNORECASE
)
_SETOP_SIDE = re.compile(
    r"^\s*SELECT\s+(?:DISTINCT\s+)?(?P<col>.+?)\s+FROM\s+(?P<table>[\w./-]+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SETOP_HEAD = re.compile(
    r"^\s*SELECT\s+APPROX_COUNT_DISTINCT\s*\((?P<args>" + _ARGS + r")\)\s*"
    r"(?:AS\s+(?P<alias>\w+)\s*)?$",
    re.IGNORECASE,
)
# minhash rows for INTERSECT/EXCEPT: se_J = 0.5/√r ≈ 0.016 at r=1024 —
# a few KB of state, small next to the HLL registers it rides with
_SETOP_MINHASH_R = 1024


def _strip_outer_parens(s: str) -> str:
    """Peel balanced outer parentheses: '(SELECT ...)' → 'SELECT ...'."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            depth += ch == "("
            depth -= ch == ")"
            if depth == 0 and i < len(s) - 1:
                return s  # the opening paren closes early — not outer parens
        s = s[1:-1].strip()
    return s


def _side_out_name(col: str) -> tuple[str, str | None]:
    """A side's projection → (sketchable expression, output column name).
    ``x`` → ('x', 'x'); ``expr AS k`` → ('expr', 'k'); a bare expression has
    no derivable name (None) — the route then cannot check the outer
    aggregate references it and falls back."""
    am = re.match(r"^(?P<expr>.+?)\s+AS\s+(?P<name>\w+)\s*$", col.strip(),
                  re.IGNORECASE | re.DOTALL)
    if am:
        return am.group("expr"), am.group("name")
    c = col.strip()
    return c, c if _IDENT.match(c) else None


def _split_setop(inner: str):
    """Depth-0 set-operator split of a derived-table body → (op, sides) with
    op in {'union','intersect','except'}; None when there is no depth-0 set
    operator, the operators are mixed (SQL gives them different precedence —
    Spark resolves that correctly on the fallback path), or INTERSECT/EXCEPT
    chain beyond two sides. UNION may be n-ary (state merge is n-ary)."""
    masked = _mask_literals(inner)
    depth, cuts = 0, []
    for m in _SETOP_TOKENS.finditer(masked):
        t = m.group(0)
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0:
            op = "union" if t.upper().startswith("UNION") else t.lower()
            cuts.append((m.start(), m.end(), op))
    if not cuts:
        return None
    ops = {op for *_, op in cuts}
    if len(ops) > 1:
        return None
    op = ops.pop()
    if op != "union" and len(cuts) > 1:
        return None
    sides, prev = [], 0
    for s, e, _ in cuts:
        sides.append(inner[prev:s])
        prev = e
    sides.append(inner[prev:])
    return op, [_strip_outer_parens(s) for s in sides]


def _union_all_rewrite(head: str, inner: str) -> str | None:
    """UNION → UNION ALL in a derived table when every outer aggregate is
    duplicate-INSENSITIVE (APPROX_COUNT_DISTINCT): row-level dedup never
    changes the SET of distinct values in any column, so the answer is
    identical — and the distinct exchange (at 100 TB, a full shuffle of two
    fact tables' rows) is elided entirely. This is the general-shape
    complement to the state-merge route above: it composes with GROUP BY /
    WHERE tails, multi-aggregate COUNT-DISTINCT heads, and arbitrary side
    SELECTs the narrow-side parser cannot claim, because the sides are
    never parsed — only the depth-0 UNION tokens are touched. Returns the
    rewritten inner, or None when the rewrite does not apply (a duplicate-
    sensitive aggregate in the head, INTERSECT/EXCEPT at depth 0 — their
    semantics depend on multiplicity — an APPROX inner, which the
    approx-over-approx branch owns, or nothing to rewrite)."""
    aggs = _AGG.findall(head)
    if not aggs or any(fn.upper() != "APPROX_COUNT_DISTINCT" for fn, _ in aggs):
        return None
    masked = _mask_literals(inner)
    if _AGG.search(masked):
        return None
    depth, spans = 0, []
    for m in _SETOP_TOKENS.finditer(masked):
        t = m.group(0)
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0:
            u = t.upper()
            if u in ("INTERSECT", "EXCEPT"):
                return None
            if u == "UNION":  # bare UNION only — UNION ALL matched whole
                spans.append((m.start(), m.end()))
    if not spans:
        return None
    out, prev = [], 0
    for s, e in spans:
        out.append(inner[prev:s])
        out.append("UNION ALL")
        prev = e
    out.append(inner[prev:])
    return "".join(out)


def _setop_route(head: str, inner: str, tail: str):
    """The ONE routing decision execution and EXPLAIN share (the same
    fidelity rule as join-key resolution: a weaker re-implementation in
    EXPLAIN would let the two answers diverge). Returns
    (op, parsed_sides, agg_args, alias, grouped) when the sketch-merge
    route applies — grouped is None for global statements, or
    (group_name, value_pos, group_pos) when a ``GROUP BY g`` tail rides a
    set operation whose sides project the key alongside the value; None
    sends the statement down the generic derived-table path. Execution
    note: a grouped UNION claims this route ONLY when registered states
    can answer it (zero scan); otherwise _approx_setop declines (returns
    None) and the statement falls to the UNION → UNION ALL rewrite, which
    builds the same one-pass scan plan without the side tag."""
    if _AGG.search(_mask_literals(inner)):
        return None  # approx-over-approx owns APPROX inners
    hm = _SETOP_HEAD.match(head)
    if hm is None:
        return None  # multi-aggregate / non-COUNT-DISTINCT heads
    group = None
    t = tail.strip().strip(";").strip()
    if t:
        gm = re.match(r"^GROUP\s+BY\s+(\w+)$", t, re.IGNORECASE)
        if gm is None:
            return None  # WHERE/ORDER/HAVING tails take the generic path
        group = gm.group(1)
    so = _split_setop(inner)
    if so is None:
        return None
    op, sides = so
    args = _split_args(hm.group("args"))
    if not args or not _IDENT.match(args[0]):
        return None  # outer must reference the union's column by name
    if len(args) > 1:
        # validate the rse argument HERE, the decision point both doors
        # share — were this left to execution, EXPLAIN would report a route
        # for a statement whose execution raises
        r = _num(args[1])
        if r is None or not (0 < r < 1):
            raise ValueError(
                f"APPROX_COUNT_DISTINCT second argument {args[1]!r} must be "
                "a target relative standard error in (0, 1)"
            )
    n_items = 2 if group else 1
    parsed = []
    for s in sides:
        sm = _SETOP_SIDE.match(s)
        if sm is None or len(_split_args(sm.group("col"))) != n_items:
            return None
        parsed.append(sm)
    # the derived relation's column names come from the FIRST side; the
    # outer aggregate (and GROUP BY key) must reference them — set-op
    # columns align BY POSITION, so later sides contribute positions only.
    # A name mismatch falls back, where Spark's unresolved-column error
    # names the offender.
    first_items = _split_args(parsed[0].group("col"))
    first_names = [(_side_out_name(it)[1] or "").lower() for it in first_items]
    if group is None:
        if first_names[0] != args[0].lower():
            return None
        return op, parsed, args, hm.group("alias"), None
    want = {args[0].lower(), group.lower()}
    if set(first_names) != want or len(want) != 2:
        return None
    pos_v = first_names.index(args[0].lower())
    return op, parsed, args, hm.group("alias"), (group, pos_v, 1 - pos_v)


def _resolve_setop_states(
    op, sides, args, tables, catalog, reg_rows=None, cols=None, group_cols=None
):
    """Verdict's A5 substitution extended to SET OPERATIONS: when every
    side is a bare ``SELECT col FROM table`` (no WHERE, plain identifier)
    and a registered sketch set holds a compatible HLL (+ MinHash for
    INTERSECT/EXCEPT) on that side's column, the statement is answered
    from PERSISTED STATES ALONE — the base tables are never scanned, so
    latency is corpus-independent. The registration's GROUPING does not
    matter: merging a set's per-group states IS the whole-table sketch
    (register-max for HLL, element-min for MinHash). Compatibility is
    machine-checked — HLL merges need one register width (same p), and a
    MinHash Jaccard across sides is only meaningful when both sides share
    (r, seed): different permutation constants would compare unrelated
    minima and return noise, not J. Any miss or mismatch returns None →
    the one-pass scan route. Shared by execution and EXPLAIN (the same
    fidelity rule as every other route). Returns one
    {reg, hll_spec, mh_spec} per side.

    Cross-side compatibility is resolved by SEARCH, not newest-first-then-
    check: every candidate registration per side is kept, then side 0's
    candidates (newest first) anchor a signature — (p, MinHash (r, seed)
    when needed, value hash family, key hash family when grouped) — that
    the other sides must match; the first complete assignment wins. A
    newest-only pick would decline statements an OLDER registration could
    still answer from states — at the design scale that is a corpus scan
    where a KB state merge sufficed. The kernel hashes by dtype FAMILY
    (ints as uint64, floats as canonical float64, everything else via
    siphash of its string/object form), so a merge across a bigint side
    and a string side would union unrelated hash spaces and return a
    confidently-bounded wrong answer; registrations without a recorded
    dtype (pre-dtype rows, stream registrations) are unknowable → skipped.

    GROUPED statements pass ``cols`` (per-side value column) and
    ``group_cols`` (per-side group column): a side's registration must then
    be grouped EXACTLY by that side's key column, so its per-group states
    line up one-to-one with the statement's groups."""
    import json as _json
    import os as _os

    if catalog is None:
        return None
    need_mh = op in ("intersect", "except")
    req_rse = _num(args[1]) if len(args) > 1 else None
    if reg_rows is None:
        reg_rows = catalog.list_rows()
    regs = sorted(reg_rows, key=lambda r: (-r["built_unix"], r["name"]))
    cand: list[list] = []  # per side: [(signature, pick)], newest first
    for i, sm in enumerate(sides):
        if sm.group("where"):
            return None  # states were built unfiltered
        if cols is not None:
            col = cols[i]
        else:
            expr, _ = _side_out_name(sm.group("col"))
            col = expr.strip()
            if not _IDENT.match(col):
                return None
        base = _table_dir(sm.group("table"), tables)
        if base is None:
            return None
        base_n = _os.path.normpath(base)
        side_cand = []
        for reg in regs:
            if _os.path.normpath(reg["input_dir"]) != base_n:
                continue
            if group_cols is not None and (
                (reg["group_by"] or "").lower() != group_cols[i].lower()
            ):
                continue
            specs = _json.loads(reg["specs_json"])
            hll = next(
                (s for s in specs if s["kind"] == "hll" and s["column"] == col), None
            )
            if hll is None:
                continue
            if req_rse is not None and (
                1.04 / (2.0 ** float(hll["params"].get("p", 14))) ** 0.5
                > req_rse * (1 + 1e-9)
            ):
                continue
            vclass = _hash_class(hll.get("dtype"))
            if vclass is None:
                continue  # unknowable input type — never merge blind
            gclass = None
            if group_cols is not None:
                gclass = _hash_class(hll.get("group_dtype"))
                if gclass is None:
                    continue
            mh = None
            if need_mh:
                mh = next(
                    (s for s in specs if s["kind"] == "minhash" and s["column"] == col),
                    None,
                )
                if mh is None:
                    continue
            sig = (
                float(hll["params"].get("p", 14)),
                (int(mh["params"].get("r", 128)), int(mh["params"].get("seed", 17)))
                if need_mh else None,
                vclass,
                gclass,
            )
            side_cand.append((sig, {"reg": reg["name"], "hll": hll, "mh": mh}))
        if not side_cand:
            return None
        cand.append(side_cand)
    for sig0, pick0 in cand[0]:
        out = [pick0]
        for side_cand in cand[1:]:
            match = next((p for s, p in side_cand if s == sig0), None)
            if match is None:
                break
            out.append(match)
        else:
            return out
    return None


def _setop_from_states(spark, op, picks, catalog, out_name) -> DataFrame:
    """Answer a global set-operation from registered states (see
    _resolve_setop_states): per side, merge the set's per-group states into
    one whole-table sketch, then the same estimate math as the scan route.
    Reads KBs of state rows; no base-table scan, no build, no shuffle."""
    from sketchlib.spark.query import load_states

    merged = []
    for p in picks:
        st = load_states(catalog.states(p["reg"]))
        hs = [sk for (g, n), sk in sorted(st.items()) if n == p["hll"]["name"]]
        if not hs:
            raise ValueError(
                f"sketch set {p['reg']!r} has no persisted rows for "
                f"{p['hll']['name']!r} — re-register or REFRESH it"
            )
        acc = hs[0]
        for sk in hs[1:]:
            acc = acc.merge(sk)
        m = None
        if p["mh"] is not None:
            ms = [sk for (g, n), sk in sorted(st.items()) if n == p["mh"]["name"]]
            m = ms[0]
            for sk in ms[1:]:
                m = m.merge(sk)
        merged.append((acc, m))
    if op == "union":
        u = merged[0][0]
        for h, _ in merged[1:]:
            u = u.merge(h)
        est, rse = u.estimate()
        err = rse * est
    else:
        (a, ma), (b, mb) = merged
        a_est, a_rse = a.estimate()  # before the merge below touches a
        j, se = ma.jaccard(mb)
        union_est, rse = a.merge(b).estimate()
        inter = j * union_est
        inter_err = inter * rse + union_est * se
        if op == "intersect":
            est, err = inter, inter_err
        else:
            est, err = max(0.0, a_est - inter), a_rse * a_est + inter_err
    return spark.createDataFrame(
        [(float(est), float(err))], f"{out_name} double, {out_name}_err double"
    )


def _widen_dtypes(dtypes) -> str | None:
    """The Spark type a mixed-family group of recorded dtypes widens to —
    the SAME widening the scan route's union applies, so a states answer and
    a scan answer for one statement share a schema. Equal dtypes pass
    through; mixed ints → bigint; mixed numerics → double; None unknown."""
    ds = set(dtypes)
    if None in ds:
        return None
    if len(ds) == 1:
        return ds.pop()
    if ds <= _HASH_INT:
        return "bigint"
    if ds <= _SETOP_NUMERIC:
        return "double"
    return None


def _grouped_setop_from_states(spark, op, picks, catalog, gname, out_name) -> DataFrame:
    """Grouped set operation from registered states (see
    _resolve_setop_states): each side's registration is grouped by its key
    column, so its state rows line up one-to-one with the statement's
    groups — per-group merges reuse _setop_group_row (same presence
    semantics and bounds as the scan route). Zero base-table scan. States
    canonicalize group keys to strings; the key column is CAST back to the
    registrations' recorded (widened) key type, so the result schema
    matches the scan route's for the same statement; driver-side merge —
    source-level group counts, the regime registered sketch sets serve."""
    from sketchlib.spark.query import _setop_group_row, load_states

    tags = [f"s{i}" for i in range(len(picks))]
    mh = None if op == "union" else "mh_v"
    per_g: dict[str, dict] = {}
    for tag, p in zip(tags, picks):
        st = load_states(catalog.states(p["reg"]))
        found = False
        for (g, n), sk in st.items():
            if n == p["hll"]["name"]:
                per_g.setdefault(g, {})[(tag, "hll_v")] = sk
                found = True
            elif mh and p["mh"] is not None and n == p["mh"]["name"]:
                per_g.setdefault(g, {})[(tag, "mh_v")] = sk
        if not found:
            raise ValueError(
                f"sketch set {p['reg']!r} has no persisted rows for "
                f"{p['hll']['name']!r} — re-register or REFRESH it"
            )
    rows = []
    for g in sorted(per_g):
        row = _setop_group_row(op, per_g[g], tags, "hll_v", mh)
        if row is not None:
            # '__null__' is the build kernel's NULL placeholder — emit a real
            # NULL, as the scan route does (only the native TYPE is lost here)
            rows.append((None if g == "__null__" else g, float(row[0]), float(row[1])))
    out = spark.createDataFrame(
        rows or [], f"{gname} string, {out_name} double, {out_name}_err double"
    )
    gtype = _widen_dtypes(p["hll"].get("group_dtype") for p in picks)
    if gtype is not None and gtype != "string":
        from pyspark.sql import functions as F

        out = out.withColumn(gname, F.col(gname).cast(gtype))
    return out


def _setop_side_idents(sides, grouped):
    """(value_cols, group_cols) — per-side plain-identifier projections of a
    grouped set operation, or None when any side projects an expression
    (states are keyed by stored columns; an expression needs the scan)."""
    _, pos_v, pos_g = grouped
    vals, gcols = [], []
    for sm in sides:
        items = _split_args(sm.group("col"))
        v, _ = _side_out_name(items[pos_v])
        g, _ = _side_out_name(items[pos_g])
        v, g = v.strip(), g.strip()
        if not (_IDENT.match(v) and _IDENT.match(g)):
            return None
        vals.append(v)
        gcols.append(g)
    return vals, gcols


_SETOP_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}

_HASH_INT = {"tinyint", "smallint", "int", "bigint"}
_HASH_FLOAT = {"float", "double"}


def _hash_class(dtype: str | None) -> str | None:
    """The kernel's hash family for a Spark type (see hash_any): any int
    width hashes identically for equal values, floats canonicalize to
    float64, everything else must match exactly. None = unknown."""
    if dtype is None:
        return None
    if dtype in _HASH_INT:
        return "int"
    if dtype in _HASH_FLOAT:
        return "float"
    return dtype


def _setop_scan_frames(spark, sides, grouped, tables, apply_where=True):
    """Per-side (_v[, _g]) projections for the sketch-merge SCAN route, or
    None when the sides' projected types are neither identical nor all in
    the numeric family (where the union's widening is lossless and matches
    Spark SQL's set-operation coercion). Schema-only — no job runs — so
    EXPLAIN shares this gate and cannot claim a route execution declines;
    EXPLAIN passes apply_where=False (predicates don't change the inspected
    schema, and subquery predicates would register temp views — a side
    effect EXPLAIN's contract forbids). Mixed non-numeric sides decline
    rather than raise: the generic derived-table path materializes the set
    operation through spark.sql, whose own coercion rules then own the
    semantics."""
    frames = []
    for sm in sides:
        df = _resolve_table(spark, sm.group("table"), tables)
        if apply_where and sm.group("where"):
            df = _apply_where(spark, df, sm.group("where"), tables, sm.group("table"))
        items = _split_args(sm.group("col"))
        if grouped is None:
            sel = [f"({_side_out_name(items[0])[0]}) AS _v"]
        else:
            _, pos_v, pos_g = grouped
            sel = [
                f"({_side_out_name(items[pos_v])[0]}) AS _v",
                f"({_side_out_name(items[pos_g])[0]}) AS _g",
            ]
        frames.append(df.selectExpr(*sel))
    for c in ["_v"] + (["_g"] if grouped else []):
        types = {f.schema[c].dataType.simpleString() for f in frames}
        if len(types) > 1 and not types <= _SETOP_NUMERIC:
            return None
    return frames


_MERGE_HEAD = re.compile(
    r"^\s*SELECT\s+(?P<fn>APPROX_PERCENTILE|APPROX_TOPK|APPROX_MAD|"
    r"APPROX_TRIMMED_MEAN|APPROX_HISTOGRAM|APPROX_FREQUENT)"
    r"\s*\((?P<args>" + _ARGS + r")\)\s*"
    r"(?:AS\s+(?P<alias>\w+)\s*)?$",
    re.IGNORECASE,
)
_MERGE_KINDS = {
    "APPROX_PERCENTILE": ("kll", "tdigest"),
    "APPROX_TOPK": ("cm",),
    # the robust statistics serve from the same mergeable quantile states
    "APPROX_MAD": ("kll", "tdigest"),
    "APPROX_TRIMMED_MEAN": ("kll", "tdigest"),
    "APPROX_HISTOGRAM": ("kll", "tdigest"),
    # MG summaries merge (Agarwal et al.) — the certificate adds
    "APPROX_FREQUENT": ("mg",),
}


# SQL aggregate/window markers inside a side's projection: such a side is
# NOT a per-row function of the base rows, so it does not commute with row
# sampling (count(*) over a 20%-scramble is 20% of the truth, and HT would
# scale it right back up to nonsense) and is not what persisted per-row
# artifacts represent. Per-row expressions (x*2, upper(s), ...) are fine.
_SIDE_AGG_FN = re.compile(
    r"\b(count|sum|avg|mean|min|max|approx_count_distinct|count_if|any_value|"
    r"first|first_value|last|last_value|collect_list|collect_set|percentile|"
    r"percentile_approx|median|mode|stddev|stddev_pop|stddev_samp|variance|"
    r"var_pop|var_samp|corr|covar_pop|covar_samp|skewness|kurtosis|"
    r"bool_and|bool_or|bit_and|bit_or|bit_xor|grouping|array_agg|listagg|"
    r"hll_sketch_agg|approx_percentile)\s*\(|\bover\s*\(",
    re.IGNORECASE,
)


def _unionall_sides(inner: str, n_items: int):
    """Depth-0 UNION ALL split of a derived-table body into _SETOP_SIDE
    matches projecting exactly ``n_items`` items. None when any depth-0
    operator is NOT ``UNION ALL`` (a distinct UNION / INTERSECT / EXCEPT is
    a different bag), any side is SELECT DISTINCT (same reason), a side's
    projection contains an aggregate/window function (not a per-row value —
    see _SIDE_AGG_FN), or a side is not a bare projection."""
    masked = _mask_literals(inner)
    depth, cuts = 0, []
    for m in _SETOP_TOKENS.finditer(masked):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            if not re.match(r"UNION\s+ALL$", tok, re.IGNORECASE):
                return None
            cuts.append((m.start(), m.end()))
    if not cuts:
        return None
    sides_txt, prev = [], 0
    for s, e in cuts:
        sides_txt.append(inner[prev:s])
        prev = e
    sides_txt.append(inner[prev:])
    parsed = []
    for s in sides_txt:
        s = _strip_outer_parens(s)
        if re.match(r"^\s*SELECT\s+DISTINCT\b", s, re.IGNORECASE):
            return None
        sm = _SETOP_SIDE.match(s)
        if sm is None or len(_split_args(sm.group("col"))) != n_items:
            return None
        masked_col = _mask_literals(sm.group("col"))
        if _SIDE_AGG_FN.search(masked_col) or _AGG.search(masked_col):
            return None  # aggregate/window/APPROX projection — not per-row
        parsed.append(sm)
    return parsed


def _unionall_merge_route(head: str, inner: str, tail: str):
    """UNION ALL bodies under a PERCENTILE/TOPK head — the mergeable-sketch
    case Verdict's A5 substitution generalizes to: the bag concatenation's
    sketch IS the merge of the per-side sketches, so registered states can
    answer ``SELECT APPROX_PERCENTILE(x, ...) FROM (a UNION ALL b)`` with
    zero base-table scan. Claims the shape only: every depth-0 set operator
    is UNION ALL (a distinct UNION or INTERSECT/EXCEPT changes the bag), no
    side is SELECT DISTINCT, sides are bare projections, tail is empty or
    one GROUP BY. Returns (fn, args, parsed_sides, alias, grouped) or None;
    this route is an OPTIMIZATION only — a None (or failed resolution)
    falls through to the generic derived-table path, which materializes the
    UNION ALL (plan concatenation, no shuffle) and builds on the fly."""
    hm = _MERGE_HEAD.match(head)
    if hm is None:
        return None
    group = None
    t = tail.strip().strip(";").strip()
    if t:
        gm = re.match(r"^GROUP\s+BY\s+(\w+)$", t, re.IGNORECASE)
        if gm is None:
            return None
        group = gm.group(1)
    args = _split_args(hm.group("args"))
    if not args or not _IDENT.match(args[0]):
        return None
    try:  # malformed k/quantile/window arguments: the generic path owns the error
        fnu = hm.group("fn").upper()
        if fnu == "APPROX_TOPK":
            int(args[1])
        elif fnu == "APPROX_MAD":
            _mad_args(args)
        elif fnu == "APPROX_TRIMMED_MEAN":
            _trim_args(args)
        elif fnu == "APPROX_HISTOGRAM":
            _hist_args(args)
        elif fnu == "APPROX_FREQUENT":
            if _frequent_args(args)[1] is not None:
                # an explicit eps is an accuracy floor the merged sides'
                # registrations were not checked against — the generic
                # path builds at exactly that eps instead
                return None
        else:
            [float(a) for a in args[1:]]
    except (ValueError, IndexError):
        return None
    parsed = _unionall_sides(inner, 2 if group else 1)
    if parsed is None:
        return None
    first_items = _split_args(parsed[0].group("col"))
    first_names = [(_side_out_name(it)[1] or "").lower() for it in first_items]
    fn = hm.group("fn").upper()
    if group is None:
        if first_names[0] != args[0].lower():
            return None
        return fn, args, parsed, hm.group("alias"), None
    want = {args[0].lower(), group.lower()}
    if set(first_names) != want or len(want) != 2:
        return None
    pos_v = first_names.index(args[0].lower())
    return fn, args, parsed, hm.group("alias"), (group, pos_v, 1 - pos_v)


def _resolve_merge_states(
    fn, sides, args, tables, catalog, reg_rows=None, cols=None, group_cols=None
):
    """Per-side registrations whose sketches can MERGE into the UNION ALL
    answer: one sketch kind across sides, IDENTICAL params (merge
    compatibility), and one hash family for CM (it hashes values; see
    _hash_class) / one-or-mixed-numeric value family for KLL & t-digest
    (they store values, and numerics are mutually comparable). Global
    statements accept ANY registered grouping — merging a set's per-group
    states is the whole-table sketch; grouped statements require each
    side's registration grouped exactly by its key column. A registration
    without a recorded dtype is unknowable → None (the scan is always
    safe). Shared by execution and EXPLAIN."""
    import json as _json
    import os as _os

    if catalog is None:
        return None
    kinds = _MERGE_KINDS[fn]
    if reg_rows is None:
        reg_rows = catalog.list_rows()
    regs = sorted(reg_rows, key=lambda r: (-r["built_unix"], r["name"]))
    cand: list[list] = []  # per side: [(kind, params_json, vclass, gclass, pick)]
    for i, sm in enumerate(sides):
        if sm.group("where"):
            return None  # states were built unfiltered
        if cols is not None:
            col = cols[i]
        else:
            expr, _ = _side_out_name(sm.group("col"))
            col = expr.strip()
            if not _IDENT.match(col):
                return None
        base = _table_dir(sm.group("table"), tables)
        if base is None:
            return None
        base_n = _os.path.normpath(base)
        side_cand = []
        for reg in regs:
            if _os.path.normpath(reg["input_dir"]) != base_n:
                continue
            if group_cols is not None and (
                (reg["group_by"] or "").lower() != group_cols[i].lower()
            ):
                continue
            specs = _json.loads(reg["specs_json"])
            for sp in specs:
                if sp["kind"] not in kinds or sp["column"] != col:
                    continue
                if sp.get("weight"):
                    # weighted CMs hold SUM(w) cells — merging one into an
                    # APPROX_TOPK answer would report weights as counts
                    continue
                vclass = _hash_class(sp.get("dtype"))
                if vclass is None:
                    continue  # unknowable input type — never merge blind
                gclass = None
                if group_cols is not None:
                    gclass = _hash_class(sp.get("group_dtype"))
                    if gclass is None:
                        continue
                side_cand.append((
                    sp["kind"],
                    _json.dumps(sp["params"], sort_keys=True),
                    vclass,
                    gclass,
                    {"reg": reg["name"], "spec": sp},
                ))
        if not side_cand:
            return None
        cand.append(side_cand)

    def _vcompat(kind, a, b):
        # CM hashes values — families must match exactly; KLL/t-digest store
        # VALUES, and numerics are mutually comparable, so int/float mix
        if a == b:
            return True
        return kind in ("kll", "tdigest") and {a, b} <= {"int", "float"}

    # search: side 0's candidates (newest first) anchor the signature; a
    # newest-only pick would miss an OLDER registration that still merges
    for kind0, params0, vclass0, gclass0, pick0 in cand[0]:
        out = [pick0]
        for side_cand in cand[1:]:
            match = next(
                (p for k, pr, vc, gc, p in side_cand
                 if k == kind0 and pr == params0 and _vcompat(kind0, vclass0, vc)
                 and gc == gclass0),
                None,
            )
            if match is None:
                break
            out.append(match)
        else:
            return out
    return None


def _unionall_from_states(spark, fn, args, alias, picks, catalog, grouped) -> DataFrame:
    """Answer a UNION ALL statement by MERGING the sides' persisted states:
    sketch states are semilattice elements, so the merge of per-side states
    IS the state of the concatenated bag — KBs of state rows move and the
    base tables are never scanned. Global statements first collapse each
    side's groups to the ungrouped key (register/bag merges across groups
    ARE the whole-table sketch); grouped statements merge groupwise — keys
    align on the kernel's canonical group string."""
    from pyspark.sql import functions as F

    from sketchlib.spark.build import STATE_FIELDS, _merge_pdf

    frames = []
    for p in picks:
        st = catalog.states(p["reg"]).where(F.col("sketch") == p["spec"]["name"])
        st = st.withColumn("sketch", F.lit("_q"))
        if grouped is None:
            st = st.withColumn("group", F.lit(""))  # the ungrouped build's key
        frames.append(st)
    allf = frames[0]
    for f in frames[1:]:
        allf = allf.unionByName(f)
    states = allf.groupBy("group", "sketch").applyInPandas(_merge_pdf, STATE_FIELDS)
    if fn == "APPROX_TOPK":
        out = topk_df(spark, states, "_q", int(args[1]))
        est_col, err_col, err_sfx = "est_count", "err_bound", "_err"
    elif fn == "APPROX_FREQUENT":
        from sketchlib.spark.query import mg_topk_df

        out = mg_topk_df(spark, states, "_q", _frequent_args(args)[0])
        est_col, err_col, err_sfx = "est_count", "undercount_bound", "_undercount"
    elif fn == "APPROX_MAD":
        from sketchlib.spark.query import mad_df

        out = mad_df(spark, states, "_q")
        est_col, err_col, err_sfx = "mad_est", "rank_err_bound", "_rank_err"
    elif fn == "APPROX_TRIMMED_MEAN":
        from sketchlib.spark.query import trimmed_mean_df

        out = trimmed_mean_df(spark, states, "_q", *_trim_args(args))
        est_col, err_col, err_sfx = "trimmed_mean", "rank_err_bound", "_rank_err"
    elif fn == "APPROX_HISTOGRAM":
        from sketchlib.spark.query import equidepth_histogram_df

        if alias:
            raise ValueError(
                "APPROX_HISTOGRAM returns a multi-column bin frame "
                "(bin, lo, hi, target_frac) — an AS alias is ambiguous; "
                "drop the alias"
            )
        out = equidepth_histogram_df(spark, states, "_q", _hist_args(args))
        est_col, err_col, err_sfx = "hi", "rank_err_bound", "_rank_err"
    else:
        qs, _mrank, _mrel = _percentile_args(args)
        if _mrank is not None or _mrel is not None:
            # the merged bag's bound is the merged sketches' own, fixed at
            # build time — a statement-level contract cannot re-bound it
            raise ValueError(
                "rank_err/rel_err contracts do not apply to the UNION ALL "
                "state-merge route — the merged states' accuracy was fixed "
                "when the sides were built; drop the contract or rebuild "
                "the sides' sketch sets at the target accuracy"
            )
        out = quantiles_df(spark, states, "_q", qs)
        est_col, err_col, err_sfx = "value", "rank_err_bound", "_rank_err"
    out = _finish_grouped(out, None, grouped[0] if grouped else None)
    if alias:
        out = (out.withColumnRenamed(est_col, alias)
                  .withColumnRenamed(err_col, f"{alias}{err_sfx}"))
    return out


_SAMPLE_UA_HEAD = re.compile(
    r"^\s*SELECT\s+(?P<fn>APPROX_COUNT|APPROX_SUM|APPROX_AVG|APPROX_VARIANCE|APPROX_STDDEV)"
    r"\s*\((?P<args>" + _ARGS + r")\)\s*"
    r"(?:AS\s+(?P<alias>\w+)\s*)?$",
    re.IGNORECASE,
)


def _unionall_sample_route(head: str, inner: str, tail: str):
    """UNION ALL bodies under a COUNT/SUM/AVG head — the SAMPLE analog of
    the merge route: a Bernoulli(p) sample of each side at the SAME p is a
    Bernoulli(p) sample of the concatenated bag, so registered uniform
    scrambles answer ``SELECT APPROX_SUM(x, p) FROM (a UNION ALL b)`` by
    scanning p-fraction tables instead of the corpus. Sides MAY carry WHERE
    (sampling commutes with row predicates — applied to the sample rows,
    the estimate is unbiased for the filtered bag). Returns
    (fn, args, parsed_sides, alias, grouped) or None; an optimization only
    — failures fall through to the generic derived-table path."""
    hm = _SAMPLE_UA_HEAD.match(head)
    if hm is None:
        return None
    group = None
    t = tail.strip().strip(";").strip()
    if t:
        gm = re.match(r"^GROUP\s+BY\s+(\w+)$", t, re.IGNORECASE)
        if gm is None:
            return None
        group = gm.group(1)
    fn = hm.group("fn").upper()
    args = _split_args(hm.group("args"))
    ratio = _num(args[0] if fn == "APPROX_COUNT" else (args[1] if len(args) > 1 else None))
    if ratio is None or not (0 < ratio <= 1):
        return None  # the generic path owns malformed-ratio errors
    parsed = _unionall_sides(inner, 2 if group else 1)
    if parsed is None:
        return None
    first_items = _split_args(parsed[0].group("col"))
    first_names = [(_side_out_name(it)[1] or "").lower() for it in first_items]
    if group is None:
        if fn != "APPROX_COUNT" and first_names[0] != args[0].lower():
            return None
        return fn, args, parsed, hm.group("alias"), None
    if fn == "APPROX_COUNT":
        if group.lower() not in first_names:
            return None
        pos_g = first_names.index(group.lower())
        return fn, args, parsed, hm.group("alias"), (group, 1 - pos_g, pos_g)
    want = {args[0].lower(), group.lower()}
    if set(first_names) != want or len(want) != 2:
        return None
    pos_v = first_names.index(args[0].lower())
    return fn, args, parsed, hm.group("alias"), (group, pos_v, 1 - pos_v)


def _resolve_unionall_samples(fn, sides, args, tables, catalog, sample_rows=None):
    """Per-side registered UNIFORM samples sharing ONE ratio ≥ the
    statement's requested ratio: equal p is what makes the union of the
    side samples a Bernoulli(p) sample of the concatenated bag (mixed
    ratios would need per-side weights and a different variance
    composition). Picks the LARGEST common ratio, newest registration per
    side. None → the generic scan path."""
    import os as _os

    if catalog is None:
        return None
    req = _num(args[0] if fn == "APPROX_COUNT" else args[1])
    if sample_rows is None:
        sample_rows = catalog.list_sample_rows()
    per_side = []
    for sm in sides:
        base = _table_dir(sm.group("table"), tables)
        if base is None:
            return None
        base_n = _os.path.normpath(base)
        elig = [
            r for r in sample_rows
            if _os.path.normpath(r["input_dir"]) == base_n
            and r["kind"] == "uniform"
            and float(r["ratio"] or 0.0) >= req - 1e-12
        ]
        if not elig:
            return None
        per_side.append(elig)
    common = set.intersection(*[{float(r["ratio"]) for r in e} for e in per_side])
    if not common:
        return None  # no shared p — per-side weights are a different estimator
    p = max(common)
    picks = []
    for elig in per_side:
        cand = [r for r in elig if float(r["ratio"]) == p]
        best = max(cand, key=lambda r: (r["built_unix"], r["name"]))
        picks.append({"name": best["name"], "ratio": p})
    return picks


def _unionall_sample_frames(
    spark, fn, picks, sides, tables, grouped, catalog, apply_where=True
):
    """Per-side (_v[, _g]) projections of the picked SAMPLE tables, with the
    side-local WHERE applied to the sample rows and the same numeric-family
    type gate as _setop_scan_frames. APPROX_COUNT never reads the value, so
    its _v is the literal 1.0 (row marker) and the sides' value types — even
    mixed non-numeric ones — cannot decline the route. Schema-only (no job);
    shared by execution and EXPLAIN so the reported route cannot diverge —
    EXPLAIN passes apply_where=False: predicates don't change the schema the
    gate inspects, and subquery predicates would otherwise register temp
    views (a side effect EXPLAIN's contract forbids)."""
    frames = []
    for p, sm in zip(picks, sides):
        s = catalog.sample(p["name"])
        if apply_where and sm.group("where"):
            s = _apply_where(spark, s, sm.group("where"), tables, sm.group("table"))
        items = _split_args(sm.group("col"))
        if grouped is None:
            vexpr = _side_out_name(items[0])[0]
        else:
            _, pos_v, pos_g = grouped
            vexpr = _side_out_name(items[pos_v])[0]
        if fn == "APPROX_COUNT":
            vexpr = "CAST(1.0 AS DOUBLE)"
        sel = [f"({vexpr}) AS _v"]
        if grouped is not None:
            sel.append(f"({_side_out_name(items[grouped[2]])[0]}) AS _g")
        frames.append(s.selectExpr(*sel))
    for c in ["_v"] + (["_g"] if grouped else []):
        types = {f.schema[c].dataType.simpleString() for f in frames}
        if len(types) > 1 and not types <= _SETOP_NUMERIC:
            return None
    return frames


def _unionall_from_samples(
    spark, fn, args, alias, picks, catalog, grouped, sides, tables,
    estimator: str = "clt",
) -> DataFrame | None:
    """Answer a UNION ALL statement from the sides' persisted uniform
    samples: project each sample to the side's (value[, key]) items, apply
    side-local WHERE to the SAMPLE rows (commutes with Bernoulli sampling),
    UNION ALL the projections (plan concatenation, no exchange) and run the
    single Horvitz-Thompson aggregation at the shared ratio. Scans
    p-fraction tables only — the bases are never read. None when the sides'
    projected types fall outside one numeric family (the generic path owns
    Spark SQL's coercion semantics there)."""
    from pyspark.sql import functions as F

    from sketchlib.spark.sampling import approx_agg_from_uniform_sample

    frames = _unionall_sample_frames(spark, fn, picks, sides, tables, grouped, catalog)
    if frames is None:
        return None
    allf = frames[0]
    for f in frames[1:]:
        allf = allf.unionByName(f)
    if estimator == "subsample":
        # the equal-ratio union IS a Bernoulli(p) sample of the
        # concatenated bag, so the subsample estimator applies verbatim.
        # n_total sizes b from the sides' registered row counts — valid
        # only when the whole scrambles are read: a side-local WHERE can
        # filter the union down to ~1 row per block (the same geometry
        # collapse the single-table path guards), so filtered unions count
        # the filtered frame instead (one pass over the p-fraction
        # samples, never the bases)
        from sketchlib.spark.subsample import subsample_agg_from_uniform_sample

        any_where = any(sm.group("where") for sm in sides)
        out = subsample_agg_from_uniform_sample(
            allf, "_g" if grouped else None, "_v", picks[0]["ratio"],
            n_total=(None if any_where else
                     sum(int(catalog.sample_meta(p["name"])["rows_sampled"])
                         for p in picks)),
            moments=fn in ("APPROX_VARIANCE", "APPROX_STDDEV"),
        )
    else:
        out = approx_agg_from_uniform_sample(
            allf, "_g" if grouped else None, "_v", picks[0]["ratio"],
            moments=fn in ("APPROX_VARIANCE", "APPROX_STDDEV"),
        )
    keep = {
        "APPROX_COUNT": ["est_count", "count_err"],
        "APPROX_SUM": ["est_sum", "sum_err"],
        "APPROX_AVG": ["est_avg", "avg_err"],
        "APPROX_VARIANCE": ["est_variance", "variance_err"],
        "APPROX_STDDEV": ["est_stddev", "stddev_err"],
    }[fn]
    sel = ([F.col("_g").alias(grouped[0])] if grouped else []) + [F.col(k) for k in keep]
    out = out.select(*sel)
    if alias:
        out = (out.withColumnRenamed(keep[0], alias)
                  .withColumnRenamed(keep[1], f"{alias}_err"))
    return out


def _approx_setop(
    spark: SparkSession, route, tables: dict | None, catalog=None
) -> DataFrame | None:
    """Execute the sketch-merge set-operation route: project each side to
    its column(s) (WHERE applied side-local, pushed to that side's scan),
    tag with a side label, UNION ALL the narrow projections (no shuffle —
    union is a plan concatenation), build the sketch states in ONE pass
    grouped by side (× group key when GROUPED), then answer from the states.
    Output matches the single-table convention:
    ([group,] approx_count_distinct_<col>, approx_count_distinct_<col>_err).

    GROUPED statements (``... FROM (a UNION b) GROUP BY g``, sides
    projecting the key alongside the value) key the one-pass build by the
    composite (side, group) and merge per group — the set operation is
    still never materialized or distinct-shuffled; grouped_setop_df
    documents the per-group presence semantics and routing."""
    from pyspark.sql import functions as F

    op, sides, args, alias, grouped = route
    # the rse argument was validated by _setop_route (the shared decision
    # point), so a second argument here is always a numeric in (0, 1)
    rse = _num(args[1]) if len(args) > 1 else 0.01
    out_name = alias or f"approx_count_distinct_{args[0]}"
    if grouped is None:
        picks = _resolve_setop_states(op, sides, args, tables, catalog)
        if picks is not None:
            return _setop_from_states(spark, op, picks, catalog, out_name)
    else:
        idents = _setop_side_idents(sides, grouped)
        picks = None
        if idents is not None:
            picks = _resolve_setop_states(
                op, sides, args, tables, catalog, cols=idents[0], group_cols=idents[1]
            )
        if picks is not None:
            return _grouped_setop_from_states(
                spark, op, picks, catalog, grouped[0], out_name
            )
        if op == "union":
            # without states, grouped UNION belongs to the UNION → UNION ALL
            # rewrite (same one-pass scan keyed by the group alone, no side
            # tag) — decline and let the caller fall through to it
            return None
    tags = [f"s{i}" for i in range(len(sides))]
    base_frames = _setop_scan_frames(spark, sides, grouped, tables)
    if base_frames is None:
        # sides project types outside one numeric family — decline to the
        # generic derived-table path, where Spark SQL's own set-operation
        # coercion owns the semantics (the DataFrame union's coercion can
        # silently null-cast e.g. string→bigint, corrupting the count)
        return None
    frames = [f.withColumn("_side", F.lit(tag)) for tag, f in zip(tags, base_frames)]
    allf = frames[0]
    for f in frames[1:]:
        allf = allf.unionByName(f)
    specs = [SketchSpec("hll_v", "hll", "_v", {"p": hll_params(rse)["p"]})]
    if op in ("intersect", "except"):
        specs.append(SketchSpec("mh_v", "minhash", "_v", {"r": _SETOP_MINHASH_R}))
    mh = "mh_v" if op in ("intersect", "except") else None

    if grouped is not None:
        from sketchlib.spark.query import grouped_setop_df

        gname, _, _ = grouped
        states = build_sketches(allf, specs, group_by=["_side", "_g"])
        out = grouped_setop_df(spark, states, op, "hll_v", mh, tags)
        # restore the key's native type ('__null__' is the composite
        # kernel's NULL placeholder)
        gtype = allf.schema["_g"].dataType  # the WIDENED union type, not side 0's
        key = F.when(F.col("group") == "__null__", F.lit(None)).otherwise(
            F.col("group").cast(gtype)
        )
        return out.select(
            key.alias(gname),
            F.col("estimate").alias(out_name),
            F.col("err_bound").alias(f"{out_name}_err"),
        )

    states = build_sketches(allf, specs, group_by="_side")
    from sketchlib.spark.query import (
        difference_estimate,
        intersection_abs_estimate,
        union_estimate,
    )

    if op == "union":
        est, rse_b = union_estimate(states, "hll_v")
        err = rse_b * est
    elif op == "intersect":
        # absolute bound: finite for disjoint sides (the relative form is
        # inf at J = 0, and inf·0.0 would emit a NaN err column)
        est, err = intersection_abs_estimate(states, "hll_v", "mh_v", tags[0], tags[1])
    else:  # except: |A| − |A ∩ B|, absolute composed bound
        est, err = difference_estimate(states, "hll_v", "mh_v", tags[0], tags[1])
    return spark.createDataFrame(
        [(float(est), float(err))], f"{out_name} double, {out_name}_err double"
    )


def _apply_where(
    spark: SparkSession, df: DataFrame, where: str, tables: dict | None,
    from_name: str | None = None,
) -> DataFrame:
    """Apply a statement's WHERE to a frame. Plain predicates go through
    ``DataFrame.filter`` (full Spark SQL, pushed to the scan by Catalyst).
    Predicates containing a SUBQUERY — ``k IN (SELECT ...)``, ``NOT IN``,
    ``EXISTS (SELECT ...)`` — are routed through ``spark.sql`` over a
    per-call temp view instead: Spark's expression parser rejects
    subqueries inside filter() strings, but accepts them in a full
    statement, where Catalyst plans the uncorrelated IN as a semi-join
    (broadcast when the subquery side is small — the dim-filter shape this
    serves) and a correlated EXISTS as a correlated semi-join. The view is
    aliased back to the statement's FROM token (``from_name``) so
    correlated predicates can qualify outer columns (``fact.k``). Tables
    the subquery references are registered from ``tables`` exactly like
    the exact pass-through; the view is dropped after analysis (plans
    resolve eagerly at DataFrame creation)."""
    if not re.search(r"\(\s*SELECT\b", _mask_literals(where), re.IGNORECASE):
        return df.filter(where)
    # register every referenced table — INCLUDING the FROM table itself: a
    # self-referencing subquery (`WHERE val > (SELECT avg(val) FROM fact)`)
    # must aggregate over the BASE table even when the outer frame is a
    # scramble; the outer alias below only shadows column qualification
    # (nearest FROM wins), not catalog lookup of the inner FROM
    if tables:
        for name, t in tables.items():
            if re.search(rf"\b{re.escape(name)}\b", where):
                d = spark.read.parquet(t) if isinstance(t, str) else t
                d.createOrReplaceTempView(name)
    view = f"_approx_where_{next(_SUBQUERY_IDS)}"
    df.createOrReplaceTempView(view)
    alias = f" AS {from_name}" if from_name and _IDENT.match(from_name) else ""
    try:
        return spark.sql(f"SELECT * FROM {view}{alias} WHERE {where}")
    finally:
        spark.catalog.dropTempView(view)


def _exact_passthrough(spark: SparkSession, sql: str, tables: dict | None) -> DataFrame:
    """Verdict middleware behavior (A4): a statement with no APPROX_
    aggregate is NOT rewritten — it passes through to the backend (Spark
    SQL) verbatim, with ``tables`` registered as temp views first.

    Only table names the statement actually REFERENCES are registered
    (word-boundary match), limiting the createOrReplaceTempView side effect
    to names this query uses; a same-named pre-existing temp view is still
    rebound to the ``tables`` binding — the dict is authoritative."""
    if tables:
        for name, t in tables.items():
            if not re.search(rf"\b{re.escape(name)}\b", sql):
                continue
            df = spark.read.parquet(t) if isinstance(t, str) else t
            df.createOrReplaceTempView(name)
    return spark.sql(sql)


def _multi_agg_routed(
    spark: SparkSession, aggs: list, group, where, table_token: str, tables, catalog
) -> DataFrame | None:
    """Multi-aggregate statements through Verdict's auto-selection: each
    scalar aggregate is answered from ITS best registered artifact (sketch
    aggregates from persisted states, sampling aggregates from scrambles)
    and the per-aggregate single-statement results are joined on the GROUP
    BY key. Routes only when EVERY aggregate resolves — partial routing
    would still scan the base table, forfeiting the latency win, so it
    falls back to the single-scan on-the-fly build instead (return None).

    Output columns match ``_multi_agg`` (``<fn>_<col>`` + ``_err``); group
    key columns come back STRING-typed (the states-schema convention — the
    base table is never read, so native types are unknown here)."""
    scalar = {
        "APPROX_COUNT_DISTINCT", "APPROX_COUNT", "APPROX_SUM", "APPROX_AVG",
        "APPROX_VARIANCE", "APPROX_STDDEV", "APPROX_COVAR", "APPROX_CORR",
    }
    if any(fn not in scalar for fn, _ in aggs):
        return None
    reg_rows = catalog.list_rows()  # registries collected ONCE per statement
    sample_rows = catalog.list_sample_rows()
    keys = []
    for fn, args in aggs:
        k = _resolve_key(
            fn, args, group, bool(where), table_token, tables, catalog,
            reg_rows=reg_rows, sample_rows=sample_rows,
        )
        if k is None:
            return None
        keys.append(k)

    # mixed sources join state-derived group keys (kernel Python str()) with
    # sample-derived keys (Catalyst cast): the two stringifications agree for
    # string/integer group columns but NOT for booleans, big doubles, or
    # timestamps ('True' vs 'true', '1e+20' vs '1.0E20'). When mixing, check
    # the group dtypes on a sample table's schema (footer read) and fall back
    # to the single-scan build when any column is outside the safe set.
    if group:
        state_names = {r["name"] for r in reg_rows}
        kinds_used = {k in state_names for k in keys}
        if kinds_used == {True, False}:
            safe = ("string", "int", "bigint", "smallint", "tinyint")
            sample_key = next(k for k in keys if k not in state_names)
            dtypes = dict(catalog.sample(sample_key).dtypes)
            gcols_chk = list(group) if isinstance(group, (list, tuple)) else [group]
            if any(dtypes.get(c) not in safe for c in gcols_chk):
                return None

    from pyspark.sql import functions as F

    from sketchlib.spark.build import group_key_expr

    gcols = [] if not group else (list(group) if isinstance(group, (list, tuple)) else [group])
    wclause = f" WHERE {where}" if where else ""
    gclause = f" GROUP BY {', '.join(gcols)}" if gcols else ""
    seen: dict[str, int] = {}
    frames = []
    for (fn, args), key in zip(aggs, keys):
        stmt = f"SELECT {fn}({', '.join(args)}) FROM {table_token}{wclause}{gclause}"
        out = approx_sql(spark, stmt, tables, catalog, key)
        if fn == "APPROX_COUNT":
            out_name = "approx_count_star"
        elif fn in ("APPROX_COVAR", "APPROX_CORR"):
            dx = args[0] if _IDENT.match(args[0]) else _expr_slug(args[0])
            dy = args[1] if _IDENT.match(args[1]) else _expr_slug(args[1])
            out_name = f"{fn.lower()}_{dx}_{dy}"
        else:
            disp = args[0] if _IDENT.match(args[0]) else _expr_slug(args[0])
            out_name = f"{fn.lower()}_{disp}"
        n = seen.get(out_name, 0)
        seen[out_name] = n + 1
        if n:
            out_name = f"{out_name}_{n + 1}"
        cols = set(out.columns)
        if "estimate" in cols:  # states path reports a RELATIVE rse → absolute err
            est, err = F.col("estimate"), F.col("rse_bound") * F.col("estimate")
        elif "est_distinct" in cols:  # universe-scramble distinct
            est, err = F.col("est_distinct"), F.col("distinct_err")
        elif fn == "APPROX_COUNT":
            est, err = F.col("est_count"), F.col("count_err")
        elif fn == "APPROX_SUM":
            est, err = F.col("est_sum"), F.col("sum_err")
        elif fn == "APPROX_VARIANCE":
            est, err = F.col("est_variance"), F.col("variance_err")
        elif fn == "APPROX_STDDEV":
            est, err = F.col("est_stddev"), F.col("stddev_err")
        elif fn == "APPROX_COVAR":
            est, err = F.col("est_covar"), F.col("covar_err")
        elif fn == "APPROX_CORR":
            est, err = F.col("est_corr"), F.col("corr_err")
        else:
            est, err = F.col("est_avg"), F.col("avg_err")
        sel = [est.alias(out_name), err.alias(f"{out_name}_err")]
        if gcols:
            # states frames name a single-column group 'group'; sample
            # frames keep the user's column — normalize, then join on one
            # canonical string key (composite-safe)
            if "group" in out.columns and len(gcols) == 1:
                out = out.withColumnRenamed("group", gcols[0])
            out = out.select(group_key_expr(gcols).alias("_gk"), *sel)
        else:
            out = out.select(*sel)
        frames.append(out)

    result = frames[0]
    for o in frames[1:]:
        # FULL OUTER, same rationale as _multi_agg: a group missing from one
        # artifact (e.g. an empty stratum) must not erase the others' answers
        result = result.join(o, "_gk", "full_outer") if gcols else result.crossJoin(o)
    if gcols:
        result = _ungroup(result.withColumnRenamed("_gk", "group"), None, group)
        ordered = gcols + [c for c in result.columns if c not in gcols]
        result = result.select(*ordered)
    return result


def _multi_agg(spark: SparkSession, df: DataFrame, aggs: list, group: str | None) -> DataFrame:
    """Multiple scalar approximate aggregates in ONE statement.

    The Spark-first payoff: every sketch aggregate becomes one SketchSpec
    and they ALL build in a single scan (`build_sketches` takes the list);
    the sampling aggregates share one uniform-sample aggregation per ratio.
    Only scalar-shaped aggregates compose (COUNT_DISTINCT/COUNT/SUM/AVG) —
    TOPK/PERCENTILE return multi-row-per-group shapes and must be issued
    alone. Output columns: <fn>_<col> and <fn>_<col>_err per aggregate.
    """
    from pyspark.sql import functions as F

    scalar = {
        "APPROX_COUNT_DISTINCT", "APPROX_COUNT", "APPROX_SUM", "APPROX_AVG",
        "APPROX_VARIANCE", "APPROX_STDDEV", "APPROX_COVAR", "APPROX_CORR",
    }
    bad = [f for f, _ in aggs if f not in scalar]
    if bad:
        raise ValueError(
            f"{bad[0]} returns multiple rows per group and cannot be combined "
            "with other aggregates — issue it as its own statement"
        )

    # one JVM-derived key string serves BOTH the sketch build and the
    # sampling aggregation, so the full-outer join below always lines up:
    # the kernel's Python str() and Catalyst's cast-to-string disagree on
    # booleans ('True' vs 'true'), NaN, and big-double formatting
    gkey = None
    if group:
        from sketchlib.spark.build import group_key_expr

        gcols = list(group) if isinstance(group, (list, tuple)) else [group]
        gkey = "_gkey_sql"
        df = df.withColumn(gkey, group_key_expr(gcols))

    specs, spec_slots = [], []  # spec_slots: (out_name, spec_name)
    sample_slots: dict[tuple, list] = {}  # (ratio, value_col) -> [(fn, out_name)]
    biv_slots: dict[tuple, list] = {}  # (ratio, x_col, y_col) -> [(fn, out_name)]
    for i, (fn, args) in enumerate(aggs):
        if fn == "APPROX_COUNT_DISTINCT":
            df, col = _materialize_expr(df, args[0])
            disp = args[0] if _IDENT.match(args[0]) else _expr_slug(args[0])
            rse = float(args[1]) if len(args) > 1 else 0.01
            name = f"_q{i}"
            specs.append(SketchSpec(name, "hll", col, {"p": hll_params(rse)["p"]}))
            spec_slots.append((f"approx_count_distinct_{disp}", name))
        elif fn in ("APPROX_COVAR", "APPROX_CORR"):
            df, xcol = _materialize_expr(df, args[0])
            df, ycol = _materialize_expr(df, args[1])
            dx = args[0] if _IDENT.match(args[0]) else _expr_slug(args[0])
            dy = args[1] if _IDENT.match(args[1]) else _expr_slug(args[1])
            biv_slots.setdefault((float(args[2]), xcol, ycol), []).append(
                (fn, f"{fn.lower()}_{dx}_{dy}")
            )
        else:
            if fn == "APPROX_COUNT":
                col, ratio = "_one", float(args[0])
                out_name = "approx_count_star"
            else:
                df, col = _materialize_expr(df, args[0])
                disp = args[0] if _IDENT.match(args[0]) else _expr_slug(args[0])
                ratio = float(args[1])
                out_name = f"{fn.lower()}_{disp}"
            sample_slots.setdefault((ratio, col), []).append((fn, out_name))

    # duplicate aggregates (e.g. the same SUM at two ratios, or twice in one
    # list) would collide in the joined output — disambiguate with a suffix
    # AT CONSTRUCTION TIME, in output order. A rename post-pass cannot do
    # this: withColumnRenamed renames EVERY column with that name, so a slot
    # list carrying the same aggregate twice (one frame, duplicate names)
    # would have both copies renamed together and the plain name lost.
    seen: dict[str, int] = {}

    def _final_name(base: str) -> str:
        n = seen.get(base, 0)
        seen[base] = n + 1
        return f"{base}_{n + 1}" if n else base

    outs = []
    if specs:
        states = build_sketches(df, specs, group_by=gkey)
        for out_name, spec_name in spec_slots:
            nm = _final_name(out_name)
            e = estimates_df(spark, states, spec_name)
            e = e.select(
                "group",
                F.col("estimate").alias(nm),
                (F.col("rse_bound") * F.col("estimate")).alias(f"{nm}_err"),
            )
            outs.append(e)
    for (ratio, value_col), slots in sample_slots.items():
        from sketchlib.spark.sampling import approx_agg_uniform

        base = df.withColumn("_one", F.lit(1.0)) if value_col == "_one" else df
        # one kernel frame per (ratio, column) slot; the higher power sums
        # are added to the shared scan only when a moment aggregate needs them
        moments = any(fn in ("APPROX_VARIANCE", "APPROX_STDDEV") for fn, _ in slots)
        est = approx_agg_uniform(base, gkey, value_col, ratio, moments=moments)
        cols = [F.col(gkey).alias("group")] if gkey else []
        for fn, out_name in slots:
            nm = _final_name(out_name)
            src = {"APPROX_COUNT": ("est_count", "count_err"),
                   "APPROX_SUM": ("est_sum", "sum_err"),
                   "APPROX_AVG": ("est_avg", "avg_err"),
                   "APPROX_VARIANCE": ("est_variance", "variance_err"),
                   "APPROX_STDDEV": ("est_stddev", "stddev_err")}[fn]
            cols += [F.col(src[0]).alias(nm), F.col(src[1]).alias(f"{nm}_err")]
        outs.append(est.select(*cols))
    for (ratio, xcol, ycol), slots in biv_slots.items():
        from sketchlib.spark.sampling import approx_bivariate_uniform

        est = approx_bivariate_uniform(df, gkey, xcol, ycol, ratio)
        cols = [F.col(gkey).alias("group")] if gkey else []
        for fn, out_name in slots:
            nm = _final_name(out_name)
            src = {"APPROX_COVAR": ("est_covar", "covar_err"),
                   "APPROX_CORR": ("est_corr", "corr_err")}[fn]
            cols += [F.col(src[0]).alias(nm), F.col(src[1]).alias(f"{nm}_err")]
        outs.append(est.select(*cols))

    result = outs[0]
    for o in outs[1:]:
        # FULL OUTER: a group missing from one aggregate (e.g. an empty
        # Bernoulli sample for a rare group) must not erase the others'
        # answers for that group
        result = result.join(o, "group", "full_outer") if group else result.crossJoin(o.drop("group"))
    if not group:
        result = result.drop("group")
    else:
        # every branch emitted group as string — restore the user's GROUP BY
        # column(s) and native type(s) on the way out
        result = _ungroup(result, df, group)
    return result


def _dcol(c):
    """Numeric view of a column for caveat math (casts ints/decimals)."""
    from pyspark.sql import functions as F

    return F.col(c).cast("double")


def _rel_err_agg_exprs(cols: list[str]):
    """Spark aggregate expressions whose driver-side max replicates
    the caveat semantics over the same frame — each expression is a
    NaN-guarded ``max`` (Spark's max orders NaN greatest, pandas' skips it,
    so every candidate is wrapped in ``when(~isnan)``); ratio shapes guard
    the denominator like pandas' ``est.where(est > 0)``."""
    from pyspark.sql import functions as F

    cset = set(cols)
    exprs = []

    def push(col):
        v = F.abs(_dcol(col))
        exprs.append(F.max(F.when(~F.isnan(v), v)))

    def push_ratio(err_col, est_col):
        est = F.abs(_dcol(est_col))
        ratio = F.abs(_dcol(err_col)) / est
        exprs.append(F.max(F.when((est > 0) & ~F.isnan(ratio), ratio)))

    for c in ("rse_bound", "rank_err_bound", "rel_err_bound"):
        if c in cset:
            push(c)
    if "err_bound" in cset and "est_count" in cset:
        push_ratio("err_bound", "est_count")
    for c in cols:
        if not c.endswith("_err"):
            continue
        base = c[:-4] if c[:-4] in cset else (
            "est_" + c[:-4] if "est_" + c[:-4] in cset else None
        )
        if base is None:
            continue
        push_ratio(c, base)
    return exprs


def _inner_abs_err_expr(cols: list[str], col: str):
    """Per-row absolute-error Column for estimate column ``col``, or None
    when the column carries no recognizable error companion (the composed
    bound is then not computable and only the relative caveat is emitted).
    NaN rows are nulled so Spark's sum/avg skip them like pandas'."""
    from pyspark.sql import functions as F

    cset = set(cols)
    if col == "estimate" and "rse_bound" in cset:
        e = F.abs(_dcol("rse_bound")) * F.abs(_dcol("estimate"))
    elif f"{col}_err" in cset and col in cset:
        e = F.abs(_dcol(f"{col}_err"))
    elif col.startswith("est_") and f"{col[4:]}_err" in cset:
        e = F.abs(_dcol(f"{col[4:]}_err"))
    else:
        return None
    return F.when(~F.isnan(e), e)


def _alias_join_out(out: DataFrame, jm) -> DataFrame:
    """Apply a join statement's ``AS name`` to the estimate column (and its
    bound → ``name_err``). Join aggregates are APPROX_COUNT/APPROX_SUM only
    (_join_agg), so the default names are fixed."""
    alias = jm.groupdict().get("salias")
    if not alias:
        return out
    fn, _, _ = _join_agg(jm.group("select"))
    default, err = {
        "APPROX_COUNT": ("est_count", "count_err"),
        "APPROX_SUM": ("est_sum", "sum_err"),
    }[fn]
    return (out.withColumnRenamed(default, alias)
               .withColumnRenamed(err, f"{alias}_err"))


def _default_out_names(aggs: list) -> list[str]:
    """_multi_agg's output naming, replicated (incl. the duplicate-name
    suffix pass, which runs in OUTPUT-frame order: sketch aggregates first,
    then sampling aggregates grouped by (ratio, column)) so alias renames
    always target the column that actually exists in the joined frame."""
    sketch, samples, biv = [], {}, {}
    for i, (fn, args) in enumerate(aggs):
        if fn == "APPROX_COUNT_DISTINCT":
            disp = args[0] if _IDENT.match(args[0]) else _expr_slug(args[0])
            sketch.append((i, f"approx_count_distinct_{disp}"))
        elif fn == "APPROX_COUNT":
            samples.setdefault((float(args[0]), "_one"), []).append(
                (i, "approx_count_star"))
        elif fn in ("APPROX_COVAR", "APPROX_CORR"):
            dx = args[0] if _IDENT.match(args[0]) else _expr_slug(args[0])
            dy = args[1] if _IDENT.match(args[1]) else _expr_slug(args[1])
            biv.setdefault((float(args[2]), args[0].strip(), args[1].strip()), []).append(
                (i, f"{fn.lower()}_{dx}_{dy}"))
        else:
            disp = args[0] if _IDENT.match(args[0]) else _expr_slug(args[0])
            # slot key = (ratio, EXACT expression text) — the same identity
            # _materialize_expr keys derived columns on. Keying on the slug
            # would merge distinct expressions that slug alike (a+b vs a-b),
            # partitioning the slots differently from _multi_agg and renaming
            # aliases onto the wrong columns.
            samples.setdefault((float(args[1]), args[0].strip()), []).append(
                (i, f"{fn.lower()}_{disp}"))
    order = (sketch
             + [slot for slots in samples.values() for slot in slots]
             + [slot for slots in biv.values() for slot in slots])
    seen: dict[str, int] = {}
    final = [""] * len(aggs)
    for i, base in order:
        n = seen.get(base, 0)
        seen[base] = n + 1
        final[i] = f"{base}_{n + 1}" if n else base
    return final


def _run_aliased(spark, m, aliased, tables, catalog, catalog_key,
                 estimator: str = "clt") -> DataFrame:
    """Named estimate columns — ``SELECT APPROX_X(args) AS name`` (Verdict
    lets users name their estimate columns; the driver's oracle compare
    requires both sides to agree on names). The statement re-runs alias-free
    and the estimate column is renamed to ``name``, its companion bound to
    ``name_err`` (``name_rank_err`` for percentiles — that bound is in RANK
    units, not value units). COUNT_DISTINCT's relative ``rse_bound`` is
    converted to an ABSOLUTE ``name_err`` (rse × estimate) — the same
    normalization _multi_agg_routed applies, so a named column and its _err
    always share units no matter which path answered."""
    from pyspark.sql import functions as F

    names = [al or None for *_, al in aliased]
    given = [al for al in names if al]
    if len(set(given)) != len(given):
        raise ValueError(f"duplicate alias in select list: {given!r}")
    clean = ", ".join(f"{fn}({args})" for fn, args, _ in aliased)
    stmt = f"SELECT {clean} FROM {m.group('table')}"
    if m.group("where"):
        stmt += f" WHERE {m.group('where')}"
    if m.group("group"):
        stmt += f" GROUP BY {m.group('group')}"
    out = approx_sql(spark, stmt, tables, catalog, catalog_key, estimator=estimator)
    aggs = [(fn.upper(), _split_args(args)) for fn, args, _ in aliased]
    if len(aggs) == 1:
        fn, alias = aggs[0][0], names[0]
        cols = set(out.columns)
        if fn == "APPROX_COUNT_DISTINCT" and "estimate" in cols:
            others = [c for c in out.columns if c not in ("estimate", "rse_bound")]
            return out.select(
                *others,
                F.col("estimate").alias(alias),
                (F.col("rse_bound") * F.col("estimate")).alias(f"{alias}_err"),
            )
        pairs = {
            "APPROX_COUNT_DISTINCT": ("est_distinct", "distinct_err"),
            "APPROX_COUNT": ("est_count", "count_err"),
            "APPROX_SUM": ("est_sum", "sum_err"),
            "APPROX_AVG": ("est_avg", "avg_err"),
            "APPROX_VARIANCE": ("est_variance", "variance_err"),
            "APPROX_STDDEV": ("est_stddev", "stddev_err"),
            "APPROX_COVAR": ("est_covar", "covar_err"),
            "APPROX_CORR": ("est_corr", "corr_err"),
            "APPROX_TOPK": ("est_count", "err_bound"),
            "APPROX_TOP_SUM": ("est_sum", "err_bound"),
            "APPROX_PERCENTILE": ("value", "rank_err_bound"),
            "APPROX_SPECTRUM": ("sq_singular_value", "cov_err_bound"),
            "APPROX_MAD": ("mad_est", "rank_err_bound"),
            "APPROX_TRIMMED_MEAN": ("trimmed_mean", "rank_err_bound"),
            "APPROX_FREQUENT": ("est_count", "undercount_bound"),
        }.get(fn)
        if fn == "APPROX_HISTOGRAM":
            raise ValueError(
                "APPROX_HISTOGRAM returns a multi-column bin frame "
                "(bin, lo, hi, target_frac) — an AS alias is ambiguous; "
                "drop the alias"
            )
        if fn == "APPROX_PERCENTILE" and estimator == "subsample":
            # the subsample percentile's bound is in VALUE units, not rank
            pairs = ("value", "value_err")
        elif fn == "APPROX_PERCENTILE" and "rel_err_bound" in cols:
            # the rel_err= (DDSketch) route: bound relative to the value
            pairs = ("value", "rel_err_bound")
        if pairs is None or pairs[0] not in cols:
            raise ValueError(
                f"cannot alias {fn} here — the result frame has no "
                f"{pairs[0] if pairs else 'estimate'!r} column "
                f"(columns: {out.columns})"
            )
        if fn == "APPROX_PERCENTILE" and estimator != "subsample":
            # suffix carries the bound's UNITS: rank for KLL/t-digest,
            # value-relative for the rel_err= DDSketch route
            err_name = (f"{alias}_rel_err" if pairs[1] == "rel_err_bound"
                        else f"{alias}_rank_err")
        elif fn in ("APPROX_MAD", "APPROX_TRIMMED_MEAN"):
            # same rank-unit suffix convention as the percentile route;
            # the bracket columns (mad_lo/mad_hi, tm_lo/tm_hi) keep their
            # own names — they are the actual certificate
            err_name = f"{alias}_rank_err"
        elif fn == "APPROX_FREQUENT":
            # the suffix names the contract: mg undershoots, never over
            err_name = f"{alias}_undercount"
        else:
            err_name = f"{alias}_err"
        return (out.withColumnRenamed(pairs[0], alias)
                   .withColumnRenamed(pairs[1], err_name))
    defaults = _default_out_names(aggs)
    mapping = {}
    for default, alias in zip(defaults, names):
        if not alias:
            continue
        if default not in out.columns:
            raise ValueError(
                f"cannot alias {default!r} — not in result columns {out.columns}"
            )
        mapping[default] = alias
        mapping[f"{default}_err"] = f"{alias}_err"
    # ONE projection, not sequential withColumnRenamed calls: an alias equal
    # to a later slot's default would otherwise duplicate a name mid-sequence
    # and the later rename would grab both columns
    final_cols = [mapping.get(c, c) for c in out.columns]
    clash = next((n for n in final_cols if final_cols.count(n) > 1), None)
    if clash:
        # an alias equal to another slot's (default) name, or to a group
        # column, would leave two identically-named columns — refuse
        raise ValueError(
            f"output name {clash!r} appears more than once in the result "
            f"({final_cols}) — every output column must have a unique name"
        )
    return out.select(*[F.col(c).alias(mapping.get(c, c)) for c in out.columns])


def _pilot_ratios(
    spark, m, sampling, group, tables, z: float, t: float,
    p0: float = 0.02, seed: int = 777, catalog=None,
) -> list[float]:
    """Plan the sampling ratio meeting a relative-error contract for EACH
    sampling aggregate in ``sampling`` (a list of (fn, args)) by inverting
    its closed-form CLT bound — with the data-dependent terms (N, Σx²,
    central moments) estimated from ONE shared PILOT scan (Verdict planned
    sample choice from stored statistics; with no stored profile, a p₀
    Bernoulli pass is the honest stand-in, and a multi-aggregate contract
    pays it once, not per aggregate).

    Inversions (rel. target t at the contract's z):
      COUNT      t² = z²(1−p)/(pN)            → p = z²/(t²N + z²)
      SUM        t²S² = z²Q(1−p)/p, Q = Σx²   → p = z²Q/(t²S² + z²Q)
      AVG        t²μ² = z²σ²(1−p)/(pN)        → p = z²σ²/(t²μ²N + z²σ²)
      VARIANCE   t²m₂² = z²K(1−p)/(pN), K=μ₄−σ⁴ → p = z²K/(t²m₂²N + z²K)
      STDDEV     rel err of s ≈ ½ that of s²  → VARIANCE inversion at 2t
      COVAR      t²s_xy² = z²K(1−p)/(pN), K=μ₂₂−σ_xy² → p = z²K/(t²s_xy²N + z²K)
      CORR       Fisher half-width ≈ (1−r²)·z√((1−p)/(pN))  (ABSOLUTE target —
                 a relative target on a near-zero r would demand the full
                 scan for no insight) → p = z²(1−r²)²/(t²N + z²(1−r²)²)

    GROUPED statements plan for the WORST group (max required p across the
    pilot's groups) — a group too rare to appear in the pilot cannot be
    planned for and gets the worst-group ratio (documented best effort,
    the reported per-group error columns stay honest either way).
    Degenerate pilots (empty, zero mean/variance where the relative target
    divides by it) plan p = 1.0 — the exact scan, never an unfounded claim.

    When the catalog holds a UNIFORM scramble of the table, the pilot scans
    the LARGEST one instead of the base table — at 100 TB that turns the
    2% pilot from a 2 TB read into p_s×2% of the corpus, and a contract
    whose planned ratio fits the scramble then never touches the base
    table at all. Every planned statistic is ratio-type except N, which
    rescales by the scramble's own inclusion probability
    (N̂ = n₀/(p₀·p_s)); a second Bernoulli thinning of a Bernoulli sample
    is still an unbiased pilot of the table.
    """
    import os as _os

    from pyspark.sql import functions as F

    df, p_s = None, 1.0
    if catalog is not None:
        base = _table_dir(m.group("table"), tables)
        if base is not None:
            base_n = _os.path.normpath(base)
            cand = [
                r for r in catalog.list_sample_rows()
                if _os.path.normpath(r["input_dir"]) == base_n and r["kind"] == "uniform"
            ]
            if cand:
                best = max(cand, key=lambda r: (float(r["ratio"] or 0.0), r["name"]))
                df, p_s = catalog.sample(best["name"]), float(best["ratio"])
    if df is None:
        df = _resolve_table(spark, m.group("table"), tables)
    if m.group("where"):
        df = _apply_where(spark, df, m.group("where"), tables, m.group("table"))

    # one shared pilot scan: every aggregate's statistics ride the same
    # aggregation, aliased per slot. The same STABLE central-moment
    # aggregates the estimator kernels use (sampling.py) — raw power sums
    # would overflow integer columns and cancel catastrophically at
    # mean ≫ stddev, exactly where the planned ratio matters most.
    aggs = [F.count("*").alias("n0")]
    for i, (fn, args) in enumerate(sampling):
        if fn in ("APPROX_COVAR", "APPROX_CORR"):
            df, xc = _materialize_expr(df, args[0])
            df, yc = _materialize_expr(df, args[1])
            x, y = F.col(xc), F.col(yc)
            # no F.corr: it throws DIVIDE_BY_ZERO on a constant column under
            # ANSI mode; r̂ is recomputed from these guarded driver-side
            aggs += [
                F.covar_pop(x, y).alias(f"cxy_{i}"),
                F.var_pop(x).alias(f"vx_{i}"), F.var_pop(y).alias(f"vy_{i}"),
                F.kurtosis(x).alias(f"gx_{i}"), F.kurtosis(y).alias(f"gy_{i}"),
            ]
        elif fn != "APPROX_COUNT":
            df, c = _materialize_expr(df, args[0])
            v = F.col(c).cast("double")
            aggs += [F.sum(v).alias(f"s1_{i}"), F.sum(v * v).alias(f"s2_{i}")]
            if fn in ("APPROX_VARIANCE", "APPROX_STDDEV"):
                aggs += [F.var_pop(v).alias(f"m2_{i}"), F.kurtosis(v).alias(f"g2_{i}")]
    pilot = df.sample(fraction=p0, seed=seed)
    gcols = [] if not group else (list(group) if isinstance(group, (list, tuple)) else [group])
    rows = pilot.groupBy(*gcols).agg(*aggs).collect()
    z2, t2 = z * z, t * t

    def _f(val) -> float:
        """Collected aggregate → finite float (NULL/NaN → 0: an all-NULL or
        constant pilot column carries no signal; the formulas then plan the
        degenerate p = 1.0 through their own zero-denominator guards)."""
        fv = float(val if val is not None else 0.0)
        return fv if fv == fv else 0.0

    out: list[float] = []
    for i, (fn, args) in enumerate(sampling):
        p_req = 0.0
        for r in rows:
            n0 = r["n0"]
            if not n0:
                continue
            N = n0 / (p0 * p_s)
            if fn == "APPROX_COUNT":
                p = z2 / (t2 * N + z2)
            elif fn in ("APPROX_COVAR", "APPROX_CORR"):
                vx, vy = _f(r[f"vx_{i}"]), _f(r[f"vy_{i}"])
                if fn == "APPROX_CORR":
                    if vx == 0 or vy == 0:
                        p = 1.0  # degenerate marginal — only the exact scan is honest
                    else:
                        r_hat = max(-1.0, min(1.0, _f(r[f"cxy_{i}"]) / (vx * vy) ** 0.5))
                        g = (1.0 - r_hat * r_hat) ** 2
                        p = z2 * g / (t2 * N + z2 * g)
                else:
                    cxy = _f(r[f"cxy_{i}"])
                    # the kernel's Cauchy–Schwarz K: √(μ₄₀μ₀₄) − σ_xy²
                    gx, gy = _f(r[f"gx_{i}"]), _f(r[f"gy_{i}"])
                    K = max(
                        (vx * vx * (gx + 3.0) * vy * vy * (gy + 3.0)) ** 0.5 - cxy * cxy,
                        0.0,
                    )
                    p = 1.0 if cxy == 0 else z2 * K / (t2 * cxy * cxy * N + z2 * K)
            elif fn == "APPROX_SUM":
                S, Q = _f(r[f"s1_{i}"]) / (p0 * p_s), _f(r[f"s2_{i}"]) / (p0 * p_s)
                p = 1.0 if S == 0 else z2 * Q / (t2 * S * S + z2 * Q)
            elif fn == "APPROX_AVG":
                mu = _f(r[f"s1_{i}"]) / n0
                var = max(_f(r[f"s2_{i}"]) / n0 - mu * mu, 0.0)
                p = 1.0 if mu == 0 else z2 * var / (t2 * mu * mu * N + z2 * var)
            else:  # APPROX_VARIANCE / APPROX_STDDEV
                m2, g2 = _f(r[f"m2_{i}"]), _f(r[f"g2_{i}"])
                K = max(m2 * m2 * (g2 + 2.0), 0.0)  # μ₄ − σ⁴ = σ⁴(g₂+2)
                tv = t if fn == "APPROX_VARIANCE" else 2.0 * t
                p = 1.0 if m2 == 0 else z2 * K / (tv * tv * m2 * m2 * N + z2 * K)
            p_req = max(p_req, p)
        if p_req <= 0:
            out.append(1.0)  # empty/degenerate pilot: only the exact scan is honest
        else:
            out.append(min(1.0, max(p_req, 1e-6)))
    return out


def _within_error(spark, wm, tables, catalog, catalog_key) -> DataFrame:
    """Accuracy-contract statements — ``SELECT APPROX_X(...) FROM t [...]
    WITHIN <t>% ERROR [AT CONFIDENCE <c>%]`` (default 95%): the user states
    the target, the library plans the cheapest parameters meeting it
    (Verdict/BlinkDB's accuracy-first UX; our planner.py bound inversions
    made statement-level). Translation per aggregate family:

    - COUNT_DISTINCT → explicit rse argument t/z (the HLL/KMV rse is a 1σ
      figure; z·rse ≤ t makes the contract hold at the stated confidence);
      routing already honors explicit rse (states must achieve it).
    - TOPK / TOP_SUM → explicit eps argument t (CM overcount ≤ ε·N w.p.
      1−δ, δ=0.01 fixed — the confidence clause does not tighten δ; N is
      the total weight for TOP_SUM). Routing honors the eps: only CM
      states achieving it claim the persisted route.
    - PERCENTILE → ``rank_err=t`` named argument: on-the-fly builds use the
      planner's k inversion; routing only claims KLL states achieving it.
      The contract is in RANK units (WITHIN 1% ERROR = ±0.01 rank).
    - COUNT/SUM/AVG/VARIANCE/STDDEV/COVAR/CORR → pilot-planned sampling
      ratio (_pilot_ratio), injected as the explicit ratio argument — so
      auto-selection serves the statement from any registered uniform
      scramble of ratio ≥ the plan, and the on-the-fly build samples at
      exactly the planned ratio. A plan of 1.0 degenerates to the exact
      scan (error 0 ≤ any target). CORR's target is ABSOLUTE (±t on the
      correlation itself — a relative target on a near-zero r would demand
      a full scan for no insight); every other family's is relative.

    MULTI-AGGREGATE statements contract every member: sketch aggregates
    translate arithmetically, and ALL sampling aggregates are planned from
    ONE shared pilot scan (per-aggregate ratios — they need not agree).
    The rewritten statement re-enters approx_sql whole, so tails, aliases,
    GROUP BY shapes, multi-aggregate composition, and catalog routing all
    behave exactly as if the user had typed the accuracy arguments by
    hand."""
    from statistics import NormalDist

    t = float(wm.group("pct")) / 100.0
    if not (0.0 < t < 1.0):
        raise ValueError(
            f"WITHIN {wm.group('pct')}% ERROR is outside (0, 100) — state a "
            "relative error target strictly between 0% and 100%"
        )
    conf = float(wm.group("conf") or 95.0) / 100.0
    if not (0.5 <= conf < 1.0):
        raise ValueError(
            f"AT CONFIDENCE {wm.group('conf')}% must be in [50, 100) — e.g. "
            "AT CONFIDENCE 99%"
        )
    z = NormalDist().inv_cdf(0.5 + conf / 2.0)

    body, tails = wm.group("body"), ""
    while True:
        tm = _ORDER_TAIL.match(body) or _LIMIT_TAIL.match(body) or _HAVING_TAIL.match(body)
        if not tm:
            break
        tails = body[len(tm.group("body")):].rstrip(";").rstrip() + tails
        body = tm.group("body")
    m = _SKELETON.match(body)
    if not m:
        raise ValueError(
            "WITHIN ... ERROR needs the single-table approx skeleton — "
            "'SELECT APPROX_X(...) FROM t [WHERE] [GROUP BY] [tails] "
            "WITHIN 1% ERROR'; joins and set operations take explicit "
            "accuracy arguments instead"
        )
    aliased = _AGG_ALIASED.findall(m.group("select"))
    parsed = [(fn.upper(), _split_args(argstr), alias) for fn, argstr, alias in aliased]
    group = _parse_group(m.group("group"))
    sampling_fns = ("APPROX_COUNT", "APPROX_SUM", "APPROX_AVG", "APPROX_VARIANCE",
                    "APPROX_STDDEV", "APPROX_COVAR", "APPROX_CORR")

    # first pass: validate every aggregate (one accuracy spec each) and
    # collect the sampling aggregates that need the pilot — a
    # multi-aggregate contract pays ONE pilot scan for all of them
    sampling: list[tuple[str, list]] = []
    for fn, args, _alias in parsed:
        if fn == "APPROX_COUNT_DISTINCT":
            spec_given = len(args) > 1
            spec_name = "rse"
        elif fn == "APPROX_TOPK":
            spec_given = len(args) > 2
            spec_name = "eps"
        elif fn == "APPROX_TOP_SUM":
            spec_given = len(args) > 3
            spec_name = "eps"
        elif fn == "APPROX_PERCENTILE":
            spec_given = (_percentile_args(args)[1:] != (None, None)
                          or _pct_weight(args) is not None)
            spec_name = "rank_err/rel_err/weight"
        elif fn in sampling_fns:
            if fn == "APPROX_COUNT":
                # APPROX_COUNT() and APPROX_COUNT(*) both mean "no explicit ratio"
                spec_given = bool([a for a in args if a.strip() != "*"])
            elif fn in ("APPROX_COVAR", "APPROX_CORR"):
                spec_given = len(args) > 2
            else:
                spec_given = len(args) > 1
            spec_name = "sampling ratio"
            if not spec_given:
                sampling.append((fn, args))
        else:
            raise ValueError(
                f"{fn} does not take a WITHIN ... ERROR contract — closed-form "
                "inversions cover COUNT/SUM/AVG/VARIANCE/STDDEV/COVAR/CORR "
                "(sampling ratio), COUNT_DISTINCT (rse), TOPK (eps), and "
                "PERCENTILE (rank_err)"
            )
        if spec_given:
            raise ValueError(
                f"give ONE accuracy spec — the statement has both an explicit "
                f"{spec_name} argument and a WITHIN contract ({fn})"
            )

    ratios = iter(
        _pilot_ratios(spark, m, sampling, group, tables, z, t, catalog=catalog)
        if sampling else []
    )
    sel_items = []
    for fn, args, alias in parsed:
        if fn == "APPROX_COUNT_DISTINCT":
            new_args = [args[0], repr(t / z)]
        elif fn == "APPROX_TOPK":
            new_args = [args[0], args[1], repr(t)]
        elif fn == "APPROX_TOP_SUM":
            new_args = [args[0], args[1], args[2], repr(t)]
        elif fn == "APPROX_PERCENTILE":
            new_args = args + [f"rank_err={t!r}"]
        else:
            ratio_txt = f"{next(ratios):.10g}"
            if fn == "APPROX_COUNT":
                new_args = [ratio_txt]
            elif fn in ("APPROX_COVAR", "APPROX_CORR"):
                new_args = [args[0], args[1], ratio_txt]
            else:
                new_args = [args[0], ratio_txt]
        sel_items.append(
            f"{fn}({', '.join(new_args)})" + (f" AS {alias}" if alias else "")
        )

    stmt = f"SELECT {', '.join(sel_items)} FROM {m.group('table')}"
    if m.group("where"):
        stmt += f" WHERE {m.group('where')}"
    if m.group("group"):
        stmt += f" GROUP BY {m.group('group')}"
    return approx_sql(spark, stmt + tails, tables, catalog, catalog_key)


# ---------------------------------------------------------------------------
# GROUP BY ROLLUP / CUBE — grouping sets from ONE finest-grain build
# ---------------------------------------------------------------------------

_SKETCH_ROLLUP_FNS = frozenset(
    ("APPROX_COUNT_DISTINCT", "APPROX_PERCENTILE", "APPROX_TOPK",
     "APPROX_TOP_SUM", "APPROX_SPECTRUM", "APPROX_MAD",
     "APPROX_TRIMMED_MEAN", "APPROX_HISTOGRAM", "APPROX_FREQUENT")
)


def _rollup_grouping_sets(k: int, mode: str) -> list[tuple[int, ...]]:
    """Grouping sets as kept-index tuples, finest first. ROLLUP = the k+1
    prefixes; CUBE = all 2^k subsets (original column order preserved)."""
    if mode == "CUBE":
        from itertools import combinations

        return [c for j in range(k, -1, -1) for c in combinations(range(k), j)]
    return [tuple(range(j)) for j in range(k, -1, -1)]


def _grouping_mask(keep: tuple[int, ...], k: int) -> int:
    """SQL GROUPING() bitmask: leftmost GROUP BY column = most significant
    bit, a set bit = that column is rolled up in this grouping set."""
    return sum(1 << (k - 1 - i) for i in range(k) if i not in keep)


def _shape_rollup_level(out, keep: tuple[int, ...], cols: list[str],
                        native: dict[str, str], mask: int):
    """Shape one grouping set's sketch-route answer frame: split the kept
    key parts out of the composite ``group`` string (native-cast when the
    base schema is known), NULL-fill the rolled-up columns, and stamp the
    GROUPING() bitmask."""
    from pyspark.sql import functions as F

    from sketchlib.spark.build import GROUP_SEP

    kept = [cols[i] for i in keep]
    if kept:
        parts = F.split(F.col("group"), GROUP_SEP)
        for idx, c in enumerate(kept):
            out = out.withColumn(c, parts.getItem(idx).cast(native.get(c, "string")))
    out = out.drop("group")
    for i, c in enumerate(cols):
        if i not in keep:
            out = out.withColumn(c, F.lit(None).cast(native.get(c, "string")))
    out = out.withColumn("grouping_lvl", F.lit(mask).cast("int"))
    est = [c for c in out.columns if c not in cols and c != "grouping_lvl"]
    return out.select(*cols, "grouping_lvl", *est)


def _rollup_states_from_catalog(catalog, catalog_key: str, fn: str, args,
                                cols: list[str], where):
    """(states, spec) for a catalog-served rollup — the headline route:
    states registered ONCE at the finest grain answer every grouping set
    base-free, because coarser sets are merges of the same states."""
    reg = [r for r in catalog.list_rows() if r["name"] == catalog_key]
    if not reg:
        raise ValueError(f"catalog has no sketch set {catalog_key!r}")
    reg = reg[0]
    if where:
        raise ValueError(
            "sketch states were built over the unfiltered table — WHERE "
            "cannot be applied post-hoc to pre-reduced states; rebuild "
            "states with the filter or drop catalog_key"
        )
    want = ",".join(cols)
    if reg["group_by"] != want:
        raise ValueError(
            f"ROLLUP/CUBE needs states at the FINEST grain: statement "
            f"grouping ({want}) != registered group_by "
            f"{reg['group_by']!r} for {catalog_key!r} — coarser sets are "
            "merged down from the finest, never rebuilt"
        )
    kinds = _CATALOG_KINDS.get(fn)
    if kinds is None:
        raise ValueError(f"{fn} cannot be answered from persisted sketch states")
    import json

    col = args[0]
    spec = next(
        (s for s in json.loads(reg["specs_json"])
         if s["kind"] in kinds and s["column"] == col
         and _cm_spec_serves(fn, args, s) and _mg_spec_serves(fn, args, s)
         and _pct_spec_serves(fn, args, s)
         and _fd_spec_serves(fn, args, s)),
        None,
    )
    if spec is None:
        raise ValueError(
            f"sketch set {catalog_key!r} holds no {'/'.join(kinds)} sketch "
            f"on {col!r} serving {fn}"
        )
    if fn == "APPROX_PERCENTILE":
        req_rank = _percentile_args(args)[1]
        if req_rank is not None:
            kk = float(spec.get("params", {}).get("k", 0))
            if spec["kind"] != "kll" or not kk or 3.31 / kk > req_rank * (1 + 1e-9):
                raise ValueError(
                    f"sketch set {catalog_key!r} cannot achieve rank_err="
                    f"{req_rank} — "
                    + (f"its {spec['kind']} sketch has k={int(kk)} "
                       f"(ε≈{3.31 / kk:.4f})" if kk else "its sketch carries no k")
                    + "; rebuild with a larger k or drop catalog_key"
                )
    return catalog.states(catalog_key), spec


def _run_rollup(spark, m, rmu, tables, catalog, catalog_key, estimator):
    """One approx aggregate ``GROUP BY ROLLUP(a, b)`` / ``CUBE(a, b)``.

    Sketch-served aggregates (COUNT_DISTINCT / PERCENTILE / TOPK / TOP_SUM)
    answer EVERY grouping set from one build at the finest grain: coarser
    sets are state merges (``regroup_states``) — KB-sized frames, zero
    rescans of the base data, which is the mergeable-sketch property made
    user-visible (and what makes the rollup corpus-size-independent when
    served from registered states). Sampling aggregates recurse one
    statement per grouping set over the same seed-fixed sample.

    Output schema: the GROUP BY columns (rolled-up ones NULL), then
    ``grouping_lvl`` = the SQL GROUPING() bitmask (leftmost column = most
    significant bit; 0 = finest), then the aggregate's usual
    estimate/bound columns — matching ``GROUP BY ROLLUP`` + ``GROUPING()``
    in ANSI SQL engines row for row.
    """
    from pyspark.sql import functions as F

    select = m.group("select")
    aggs = [(f.upper(), _split_args(a)) for f, a in _AGG.findall(select)]
    aliased = _AGG_ALIASED.findall(select)
    if len(aggs) != 1 or (aliased and aliased[0][2]):
        raise ValueError(
            "GROUP BY ROLLUP/CUBE takes exactly one un-aliased approx "
            "aggregate — grouping sets multiply the result rows, so a "
            "multi-aggregate or aliased head is ambiguous; issue one "
            "statement per aggregate"
        )
    fn, args = aggs[0]
    if rmu.group("gsets"):
        # explicit GROUPING SETS ((a, b), (a), ()): the key-column list is
        # the first-appearance UNION of the sets (GROUPING() bitmask order,
        # and the grain a catalog registration must match)
        raw_sets = [
            [c.strip() for c in inner.split(",") if c.strip()]
            for inner in _GSET_ITEM.findall(rmu.group("sets"))
        ]
        cols = []
        for s_ in raw_sets:
            if len(set(s_)) != len(s_):
                raise ValueError(
                    f"duplicate column in grouping set ({', '.join(s_)})"
                )
            for c in s_:
                if c not in cols:
                    cols.append(c)
        if not cols:
            raise ValueError(
                "GROUPING SETS names no columns — use the plain ungrouped "
                "statement for a single global aggregate"
            )
        k = len(cols)
        sets_ = [tuple(i for i in range(k) if cols[i] in s_) for s_ in raw_sets]
    else:
        mode = rmu.group("mode").upper()
        cols = [c.strip() for c in rmu.group("cols").split(",")]
        if len(set(cols)) != len(cols):
            raise ValueError(f"duplicate column in {mode}({', '.join(cols)})")
        if mode == "CUBE" and len(cols) > 4:
            raise ValueError(
                "CUBE takes at most 4 columns (2^k grouping sets) — use "
                "ROLLUP or explicit GROUPING SETS for wider keys"
            )
        k = len(cols)
        sets_ = _rollup_grouping_sets(k, mode)

    def _recurse() -> DataFrame:
        # one statement per grouping set over the same seed-fixed sample
        # (a registered scramble is reused level to level; the base is
        # never scanned more than the finest build would)
        core = f"SELECT {select} FROM {m.group('table')}"
        if m.group("where"):
            core += f" WHERE {m.group('where')}"
        results = []
        for keep in sets_:
            kept = [cols[i] for i in keep]
            stmt = core + (f" GROUP BY {', '.join(kept)}" if kept else "")
            results.append(
                approx_sql(spark, stmt, tables, catalog, catalog_key,
                           estimator=estimator)
            )
        # key-column dtypes from whichever result kept each column (with
        # explicit GROUPING SETS no single set need contain them all)
        ftypes: dict[str, str] = {}
        for out in results:
            for c, t in out.dtypes:
                ftypes.setdefault(c, t)
        shaped = []
        for keep, out in zip(sets_, results):
            for i, c in enumerate(cols):
                if i not in keep:
                    out = out.withColumn(c, F.lit(None).cast(ftypes.get(c, "string")))
            out = out.withColumn(
                "grouping_lvl", F.lit(_grouping_mask(keep, k)).cast("int")
            )
            est = [c for c in out.columns if c not in cols and c != "grouping_lvl"]
            shaped.append(out.select(*cols, "grouping_lvl", *est))
        res = shaped[0]
        for f_ in shaped[1:]:
            res = res.unionByName(f_)
        return res

    if fn in _SKETCH_ROLLUP_FNS:
        if estimator == "subsample":
            raise ValueError(
                f"{fn} is sketch-served — its bound is not a sampling CI; "
                "ERROR BY SUBSAMPLING applies to the sampling aggregates"
            )
        from sketchlib.spark.build import regroup_states

        qs = req_rank = req_rel = None
        if fn == "APPROX_PERCENTILE":
            qs, req_rank, req_rel = _percentile_args(args)
        # argument validation BEFORE routing, so the catalog-served path
        # raises on bogus arguments exactly like the on-the-fly and
        # non-rollup paths (extra args must never be silently dropped)
        elif fn == "APPROX_MAD":
            _mad_args(args)
        elif fn == "APPROX_TRIMMED_MEAN":
            _trim_args(args)
        elif fn == "APPROX_HISTOGRAM":
            _hist_args(args)
        native: dict[str, str] = {}
        if catalog is not None and catalog_key is not None:
            if any(r["name"] == catalog_key
                   for r in catalog.list_sample_rows()):
                # a SCRAMBLE key: the per-level statements already know how
                # to serve this fn from the sample (empirical quantiles /
                # universe distinct) — recurse rather than refuse
                return _recurse()
            states, spec = _rollup_states_from_catalog(
                catalog, catalog_key, fn, args, cols, m.group("where")
            )
            spec_name = spec["name"]
        else:
            df = _resolve_table(spark, m.group("table"), tables)
            if m.group("where"):
                df = _apply_where(spark, df, m.group("where"), tables, m.group("table"))
            if fn == "APPROX_COUNT_DISTINCT":
                df, col = _materialize_expr(df, args[0])
                rse = float(args[1]) if len(args) > 1 else 0.01
                sp = SketchSpec("_q", "hll", col, {"p": hll_params(rse)["p"]})
            elif fn == "APPROX_TOPK":
                df, col = _materialize_expr(df, args[0])
                eps = float(args[2]) if len(args) > 2 else 1e-4
                sp = SketchSpec("_q", "cm", col, {"eps": eps, "delta": 0.01})
            elif fn == "APPROX_TOP_SUM":
                _top_sum_k(args)
                eps = _num(args[3]) if len(args) > 3 else 1e-4
                if eps is None:
                    raise ValueError(
                        f"APPROX_TOP_SUM eps argument {args[3]!r} must be numeric"
                    )
                df, col = _materialize_expr(df, args[0])
                df, wcol = _materialize_expr(df, args[1])
                sp = SketchSpec(
                    "_q", "cm", col, {"eps": eps, "delta": 0.01}, weight=wcol
                )
            elif fn == "APPROX_SPECTRUM":
                _, fd_d, fd_ell = _spectrum_args(args)
                df, col = _materialize_expr(df, args[0])
                if fd_d is None:
                    probe = df.select(F.size(F.col(col)).alias("_d")).first()
                    if probe is None or probe["_d"] is None or probe["_d"] < 1:
                        raise ValueError(
                            f"APPROX_SPECTRUM could not infer the vector "
                            f"dimension from {col!r} — pass d=<dim> explicitly"
                        )
                    fd_d = int(probe["_d"])
                sp = SketchSpec("_q", "fd", col, {"d": fd_d, "ell": fd_ell})
            elif fn in ("APPROX_MAD", "APPROX_TRIMMED_MEAN", "APPROX_HISTOGRAM"):
                df, col = _materialize_expr(df, args[0])
                sp = SketchSpec("_q", "kll", col, {"k": _robust_kll_k(fn, args)})
            elif fn == "APPROX_FREQUENT":
                _, f_eps = _frequent_args(args)
                df, col = _materialize_expr(df, args[0])
                sp = SketchSpec("_q", "mg", col, {"eps": f_eps or 1e-4})
            else:  # APPROX_PERCENTILE
                df, col = _materialize_expr(df, args[0])
                wcol = _pct_weight(args)
                if wcol is not None:
                    sp = SketchSpec(
                        "_q", "tdigest", col, {"compression": 200}, weight=wcol
                    )
                elif req_rel is not None:
                    sp = SketchSpec("_q", "dd", col, {"alpha": req_rel})
                else:
                    kk = 200
                    if req_rank is not None:
                        from sketchlib.planner import kll_params

                        kk = max(200, kll_params(req_rank)["k"])
                    sp = SketchSpec("_q", "kll", col, {"k": kk})
            # persist the finest-grain states: every grouping set derives
            # from this ONE frame — without it each level's action would
            # re-run the base scan, which is exactly what rollup-by-merge
            # exists to avoid
            states = build_sketches(df, [sp], group_by=list(cols)).persist()
            native = dict(df.dtypes)
            spec_name = "_q"

        frames = []
        for keep in sets_:
            st = states if len(keep) == k else regroup_states(states, list(keep))
            if fn == "APPROX_COUNT_DISTINCT":
                out = estimates_df(spark, st, spec_name)
            elif fn == "APPROX_TOPK":
                out = topk_df(spark, st, spec_name, int(args[1]))
            elif fn == "APPROX_TOP_SUM":
                out = topk_df(spark, st, spec_name, _top_sum_k(args)).withColumnRenamed(
                    "est_count", "est_sum"
                )
            elif fn == "APPROX_SPECTRUM":
                from sketchlib.spark.query import spectrum_df

                out = spectrum_df(spark, st, spec_name, _spectrum_args(args)[0])
            elif fn == "APPROX_MAD":
                from sketchlib.spark.query import mad_df

                out = mad_df(spark, st, spec_name)
            elif fn == "APPROX_TRIMMED_MEAN":
                from sketchlib.spark.query import trimmed_mean_df

                out = trimmed_mean_df(spark, st, spec_name, *_trim_args(args))
            elif fn == "APPROX_HISTOGRAM":
                from sketchlib.spark.query import equidepth_histogram_df

                out = equidepth_histogram_df(spark, st, spec_name, _hist_args(args))
            elif fn == "APPROX_FREQUENT":
                from sketchlib.spark.query import mg_topk_df

                out = mg_topk_df(spark, st, spec_name, _frequent_args(args)[0])
            elif req_rel is not None:
                out = rel_quantiles_df(spark, st, spec_name, qs)
            else:
                out = quantiles_df(spark, st, spec_name, qs)
            frames.append(
                _shape_rollup_level(out, keep, cols, native, _grouping_mask(keep, k))
            )
        res = frames[0]
        for f_ in frames[1:]:
            res = res.unionByName(f_)
        return res

    # sampling aggregates: per-grouping-set recursion
    return _recurse()


def approx_sql(
    spark: SparkSession,
    sql: str,
    tables: dict | None = None,
    catalog=None,
    catalog_key: str | None = None,
    estimator: str = "clt",
) -> DataFrame:
    """Run one Verdict-style approximate SQL statement; returns a DataFrame
    whose columns include the estimate and its error bound (A15).

    Pass ``catalog`` (a SketchCatalog) and ``catalog_key`` to answer FROM
    PERSISTED STATES ONLY — Verdict's A5 "scan the sample instead of the
    base table" substitution: the base table is never read (the FROM name is
    not even resolved), so latency is independent of corpus size. With
    ``catalog`` alone (no key), the best registered artifact is
    AUTO-SELECTED per ``resolve_catalog_key`` — states when the statement
    is unfiltered and group-matched, else the best-fitting sample — falling
    back to an on-the-fly build when nothing is registered for the table.
    Statements without any APPROX_ aggregate pass through to Spark SQL
    exactly (A4). The
    registered sketch set must match the statement (same aggregate kind,
    column, and GROUP BY; no WHERE — states were built unfiltered); a
    mismatch raises rather than silently paying a rebuild the caller opted
    out of.

    Sample-lifecycle DDL (Verdict's literal A2/A3 entry points) is routed to
    the same catalog: ``CREATE [OR REPLACE] SAMPLE s FROM t KIND uniform
    RATIO 0.1 [ON col] [FRACTIONS '<json>'] [SEED n]``, ``SHOW SAMPLES``,
    ``DROP SAMPLE s``. CREATE returns the registration row, SHOW the
    registry, DROP a (name, dropped) row.

    ``estimator`` selects the error mechanism for the SAMPLING aggregates
    (APPROX_COUNT/SUM/AVG/VARIANCE/STDDEV/COVAR/CORR;
    APPROX_PERCENTILE from a registered uniform scramble — there the
    subsample spread gives VALUE-unit quantile CIs the closed-form rank
    bound cannot; APPROX_COUNT_DISTINCT from a registered UNIVERSE
    scramble — the sample's distinct values are a Bernoulli(p) sample of
    the value domain): ``"clt"`` (default) = the closed-form bounds of
    sampling.py; ``"subsample"`` = VerdictDB's variational subsampling
    (subsample.py — `[paper:VerdictDB §3.2]`). A statement tail ``ERROR
    BY SUBSAMPLING`` sets it from SQL. Estimates are identical either
    way; only the error columns change estimator. Sketch-only
    aggregates (TOPK), sketch-states routes, joins, set operations over
    states, stratified scrambles, multi-aggregate lists and WITHIN
    contracts refuse the modifier loudly — their bounds are not sampling
    CIs a subsample spread could replace."""
    if catalog is None and catalog_key is not None:
        raise ValueError(
            "catalog_key without catalog does nothing — pass catalog=SketchCatalog(...)"
        )
    # EXPLAIN over OUR statements (any APPROX_ aggregate, or registry DDL)
    # answers from the router without executing; an exact EXPLAIN is
    # Spark's own statement and passes through verbatim (A4)
    em = re.match(r"^\s*EXPLAIN\s+(?P<stmt>.*)$", sql, re.IGNORECASE | re.DOTALL)
    if em and (_AGG.search(_mask_literals(em.group("stmt")))
               or _DDL_HEAD.match(em.group("stmt"))
               # an ERROR BY SUBSAMPLING tail is OUR grammar even when the
               # statement has no APPROX_ aggregate — EXPLAIN must report
               # the refusal, not hand Spark a statement it cannot parse
               or _SUBSAMPLE_TAIL.match(_mask_literals(em.group("stmt")))):
        return explain_sql(spark, em.group("stmt"), tables, catalog, catalog_key,
                           estimator=estimator)
    ddl = _ddl(spark, sql, tables, catalog)
    if ddl is not None:
        return ddl
    if estimator not in ("clt", "subsample"):
        raise ValueError(
            f"estimator must be 'clt' or 'subsample', got {estimator!r}"
        )
    ssm = _SUBSAMPLE_TAIL.match(_mask_literals(sql)) and _SUBSAMPLE_TAIL.match(sql)
    if ssm:
        sql, estimator = ssm.group("body"), "subsample"
        if _WITHIN_STUB.search(_mask_literals(sql)):
            # 'WITHIN 1% ERROR BY SUBSAMPLING' — the tail ate the
            # contract's ERROR keyword; refuse by name
            raise ValueError(_WITHIN_SUBSAMPLE_MSG)
    if estimator == "subsample" and not _AGG.search(_mask_literals(sql)):
        raise ValueError(
            "ERROR BY SUBSAMPLING selects the error estimator of an approx "
            "statement — this statement has no APPROX_ aggregate (exact "
            "pass-through carries no error columns)"
        )
    # classification ignores string literals: 'APPROX_X(1)' inside quotes
    # must not drag an exact statement into the approx skeleton
    if not _AGG.search(_mask_literals(sql)):
        # no APPROX_ aggregate anywhere in the statement → Verdict's
        # pass-through: exact SQL goes to the backend untouched (A4) —
        # including plain WITH statements, which Spark SQL parses natively
        return _exact_passthrough(spark, sql, tables)
    cte = _extract_ctes(sql)
    if cte is not None:
        # WITH + approx: each CTE body runs as its own statement (exact
        # bodies via pass-through — lazy; approx bodies via approx_sql,
        # eagerly checkpointed so the groups-sized estimate frame computes
        # once however often the final statement references it), registered
        # as temp views, then the final statement recurses through every
        # path below — so a later CTE can read an earlier one (chained
        # CTEs), its body resolving the view the previous iteration
        # registered. A CTE name colliding with a `tables` binding is
        # REJECTED loudly: the dict is authoritative in every resolution
        # path (_resolve_table checks it before views), so the CTE would
        # be silently shadowed — estimates computed over the wrong
        # relation with no error is the worst failure shape.
        ctes, final = cte
        views = []
        try:
            for name, body in ctes:
                if tables and name in tables:
                    raise ValueError(
                        f"CTE name {name!r} collides with a `tables` binding — "
                        "the dict is authoritative in table resolution, so the "
                        "CTE would be silently shadowed; rename the CTE"
                    )
                if _AGG.search(_mask_literals(body)):
                    df = approx_sql(spark, body, tables, catalog, None).localCheckpoint(eager=True)
                else:
                    df = _exact_passthrough(spark, body, tables)
                df.createOrReplaceTempView(name)
                views.append(name)
            return approx_sql(spark, final, tables, catalog, catalog_key,
                              estimator=estimator)
        finally:
            for v in views:
                spark.catalog.dropTempView(v)
    sub = _extract_subquery(sql)
    if sub is not None:
        # Verdict's A16 recursion: the DERIVED TABLE is computed first, the
        # approx aggregate runs on top of it. Extracted BEFORE tail peeling
        # so an inner HAVING/ORDER BY/LIMIT stays inside the subquery;
        # registered as a per-call-unique temp view so the rewritten outer
        # statement takes every path below (tails, routing, ...), then
        # dropped (plans are resolved at DataFrame analysis — the view is
        # not needed after).
        if catalog_key is not None:
            raise ValueError(
                "catalog_key cannot answer a derived-table statement — the "
                "registered artifact was built over the BASE table, not the "
                "subquery's filtered/derived rows; drop catalog_key to "
                "compute over the derived table"
            )
        head, inner, tail = sub
        setop = _setop_route(head, inner, tail)
        if setop is not None and estimator == "subsample":
            raise ValueError(
                "set operations are answered from sketch states, whose "
                "bounds are not sampling CIs — ERROR BY SUBSAMPLING applies "
                "to the sampling aggregates (single table or UNION ALL over "
                "persisted uniform samples)"
            )
        if setop is not None:
            res = _approx_setop(spark, setop, tables, catalog)
            if res is not None:
                return res  # None = grouped UNION without states → rewrite
        merged = None if estimator == "subsample" else _unionall_merge_route(head, inner, tail)
        if merged is not None:
            mfn, margs, msides, malias, mgrouped = merged
            if mgrouped is None:
                mpicks = _resolve_merge_states(mfn, msides, margs, tables, catalog)
            else:
                idents = _setop_side_idents(msides, mgrouped)
                mpicks = None if idents is None else _resolve_merge_states(
                    mfn, msides, margs, tables, catalog,
                    cols=idents[0], group_cols=idents[1],
                )
            if mpicks is not None:
                return _unionall_from_states(
                    spark, mfn, margs, malias, mpicks, catalog, mgrouped
                )
            # no compatible registrations → the generic derived-table path
            # materializes the UNION ALL (plan concatenation) and builds
        sroute = _unionall_sample_route(head, inner, tail)
        if sroute is not None:
            sfn, sargs, ssides, salias, sgrouped = sroute
            spicks = _resolve_unionall_samples(sfn, ssides, sargs, tables, catalog)
            if spicks is not None:
                res = _unionall_from_samples(
                    spark, sfn, sargs, salias, spicks, catalog, sgrouped,
                    ssides, tables, estimator=estimator,
                )
                if res is not None:
                    return res  # None = non-numeric type mix → generic path
        rewritten = _union_all_rewrite(head, inner)
        if rewritten is not None:
            inner = rewritten  # distinct shuffle elided; answer identical
        view = f"_approx_subquery_{next(_SUBQUERY_IDS)}"
        if _AGG.search(_mask_literals(inner)):
            # APPROX-OVER-APPROX (Verdict recursed approximation through
            # nested relations): the inner statement is itself evaluated
            # via approx_sql (auto-routing/catalog apply to it), eagerly
            # checkpointed — the inner result is groups-sized, and the
            # caveat stats below plus the outer aggregate must not each
            # re-run the inner build — and the outer statement sketches on
            # top of the ESTIMATE frame. The outer bound covers only the
            # outer stage's error, so the inner stage's error is surfaced
            # as an explicit caveat column: ``inner_rel_err_max`` = the
            # largest relative half-width among the inner estimates (for
            # rank-bounded inner results, the largest rank error). The
            # composed uncertainty is NOT folded into the outer bound in
            # general — the two stages' errors can be in different units
            # (value vs rank) — EXCEPT where they provably share units:
            # an outer SUM/AVG of an inner ESTIMATE column is linear in
            # its inputs, so the inner stage shifts the outer answer by
            # at most Σ|err_i| (SUM) / Σ|err_i|/n (AVG) — the perfectly-
            # correlated worst case, hence a conservative first-order
            # bound. That case additionally emits ``inner_abs_err`` (the
            # propagated inner bound in the outer aggregate's units) and
            # ``composed_err_bound`` (outer CI + propagated inner), so
            # composition is not left to the reader. Grouped outer
            # statements keep the caveat-only form (propagation would
            # need the inner rows regrouped per outer key).
            inner_df = approx_sql(spark, inner, tables, catalog, None).localCheckpoint(eager=True)
            from pyspark.sql import functions as F

            # VERDICT r5 "what's wrong" #2: the caveat stats are one-row
            # aggregates — compute them with agg() over the checkpointed
            # inner frame instead of materializing the whole frame on the
            # driver (a b23-shaped inner statement has 10⁴–10⁵ groups).
            # ONE small job collects: row count, every relative-error
            # candidate (_rel_err_agg_exprs, pandas-parity NaN guards), the
            # NULL-group-key count (a NULL key would silently UNDERSTATE
            # the composed bound — Spark's equi-join never matches NULL —
            # so NULL keys demote to caveat-only), and the global
            # propagated term when the statement shape composes.
            icols = inner_df.columns
            idts = dict(inner_df.dtypes)
            outer_aggs = [(f.upper(), _split_args(a)) for f, a in _AGG.findall(head)]
            masked_tail = _mask_literals(tail)
            # composition shapes: a bare tail (global reduce), or a tail of
            # exactly [WHERE pred] GROUP BY <one column of the inner frame>
            # (per-group reduce — the propagated term is then computed PER
            # OUTER GROUP from the inner rows and joined back). ORDER
            # BY/LIMIT tails are left caveat-only: the join-back would not
            # preserve the requested ordering.
            m_grp = re.fullmatch(
                r"\s*(?:WHERE\s+.+?\s+)?GROUP\s+BY\s+(\w+)\s*;?\s*",
                masked_tail, re.IGNORECASE | re.DOTALL,
            )
            gcol = m_grp.group(1) if (m_grp is not None and m_grp.group(1) in icols) else None
            global_ok = not re.search(r"GROUP\s+BY", masked_tail, re.IGNORECASE)

            rel_exprs = _rel_err_agg_exprs(icols)
            stat_aggs = [F.count(F.lit(1)).alias("_n")] + [
                e.alias(f"_r{i}") for i, e in enumerate(rel_exprs)
            ]
            if gcol is not None:
                null_key = F.col(gcol).isNull()
                if idts.get(gcol) in ("double", "float"):
                    null_key = null_key | F.isnan(F.col(gcol))
                stat_aggs.append(F.sum(null_key.cast("long")).alias("_gnull"))
            compose_fn, err_expr = None, None
            if len(outer_aggs) == 1:
                ofn, oargs = outer_aggs[0]
                # a WHERE tail restricts the outer aggregate to a SUBSET of
                # inner rows. SUM stays conservative (Σ|err_i| over all ≥
                # over any subset) but AVG does not — the filter can select
                # exactly the rows with the largest errors, making the
                # full-frame/per-group mean an UNDER-estimate — so AVG
                # composition is skipped under WHERE (caveat-only, never a
                # too-small bound)
                if ofn == "APPROX_AVG" and re.search(r"\bWHERE\b", masked_tail, re.IGNORECASE):
                    ofn = None
                if ofn in ("APPROX_SUM", "APPROX_AVG") and oargs and _IDENT.match(oargs[0]):
                    err_expr = _inner_abs_err_expr(icols, oargs[0])
                    if err_expr is not None:
                        compose_fn = ofn
                        prop_agg = (
                            F.sum(err_expr) if ofn == "APPROX_SUM" else F.avg(err_expr)
                        )
                        stat_aggs.append(prop_agg.alias("_prop"))
            stats = inner_df.agg(*stat_aggs).collect()[0]

            n_inner = int(stats["_n"])
            if n_inner == 0:
                caveat = 0.0
            else:
                rels = [stats[f"_r{i}"] for i in range(len(rel_exprs))]
                rels = [float(v) for v in rels if v is not None]
                caveat = max(rels) if rels else float("nan")

            inner_df.createOrReplaceTempView(view)
            try:
                out = approx_sql(spark, f"{head} FROM {view}{tail}", tables,
                                 catalog, None, estimator=estimator)
            finally:
                spark.catalog.dropTempView(view)
            out = out.withColumn("inner_rel_err_max", F.lit(caveat))
            grouped_ok = gcol is not None and int(stats["_gnull"] or 0) == 0
            if compose_fn is not None and n_inner > 0 and (global_ok or grouped_ok):
                ocol = "sum_err" if compose_fn == "APPROX_SUM" else "avg_err"
                if global_ok:
                    prop = stats["_prop"]
                    if prop is None:  # all-NaN errs: pandas sum→0.0, mean→NaN
                        prop = 0.0 if compose_fn == "APPROX_SUM" else float("nan")
                    prop = float(prop)
                    out = out.withColumn("inner_abs_err", F.lit(prop)).withColumn(
                        "composed_err_bound", F.col(ocol) + F.lit(prop)
                    )
                else:
                    # per-group propagated term: a KB-sized groupBy over the
                    # checkpointed inner frame, broadcast-joined back — the
                    # full inner frame never reaches the driver
                    per_agg = (
                        F.sum(err_expr) if compose_fn == "APPROX_SUM" else F.avg(err_expr)
                    )
                    prop_df = inner_df.groupBy(gcol).agg(per_agg.alias("_inner_abs"))
                    if compose_fn == "APPROX_AVG":
                        # group whose errs are ALL NaN: pandas mean is NaN —
                        # keep NaN (never a silently-small composed bound)
                        # and let the join-miss coalesce below cover only
                        # truly absent groups with 0.0
                        prop_df = prop_df.withColumn(
                            "_inner_abs",
                            F.coalesce(F.col("_inner_abs"), F.lit(float("nan"))),
                        )
                    out = (
                        out.join(F.broadcast(prop_df), gcol, "left")
                        .withColumn(
                            "inner_abs_err",
                            F.coalesce(F.col("_inner_abs"), F.lit(0.0)),
                        )
                        .drop("_inner_abs")
                        .withColumn(
                            "composed_err_bound", F.col(ocol) + F.col("inner_abs_err")
                        )
                    )
            return out
        _exact_passthrough(spark, inner, tables).createOrReplaceTempView(view)
        try:
            return approx_sql(spark, f"{head} FROM {view}{tail}", tables,
                              catalog, None, estimator=estimator)
        finally:
            spark.catalog.dropTempView(view)
    wm = _WITHIN_TAIL.match(_mask_literals(sql)) and _WITHIN_TAIL.match(sql)
    if wm:
        if estimator == "subsample":
            raise ValueError(_WITHIN_SUBSAMPLE_MSG)
        return _within_error(spark, wm, tables, catalog, catalog_key)
    tm = _ORDER_TAIL.match(sql)
    if tm:
        inner = approx_sql(spark, tm.group("body"), tables, catalog, catalog_key,
                           estimator=estimator)
        # single-column sketch paths emit the generic 'group' column; let
        # ORDER BY name the user's GROUP BY column anyway
        rename = {}
        gm = re.search(
            r"GROUP\s+BY\s+(\w+)\s*(?:HAVING\b.*)?$",  # a HAVING tail may trail
            tm.group("body"), re.IGNORECASE | re.DOTALL,
        )
        if gm and gm.group(1) not in inner.columns and "group" in inner.columns:
            rename[gm.group(1).lower()] = "group"
        inner = inner.orderBy(*_order_cols(tm.group("keys"), rename))
        return inner.limit(int(tm.group("n"))) if tm.group("n") else inner
    tm = _LIMIT_TAIL.match(sql)
    if tm:
        return approx_sql(
            spark, tm.group("body"), tables, catalog, catalog_key,
            estimator=estimator,
        ).limit(int(tm.group("n")))
    tm = _HAVING_TAIL.match(sql)
    if tm:
        return approx_sql(
            spark, tm.group("body"), tables, catalog, catalog_key,
            estimator=estimator,
        ).filter(tm.group("pred"))
    jr = _JOIN_ROWS_SKELETON.match(sql)
    if jr:
        if estimator == "subsample":
            raise ValueError(
                "APPROX_JOIN_ROWS is sketch-served (CM inner product) — its "
                "bound is not a sampling CI; ERROR BY SUBSAMPLING applies "
                "to the sampling aggregates"
            )
        return _approx_join_rows(spark, jr, tables, catalog, catalog_key)
    jm3, jm2 = _JOIN3_SKELETON.match(sql), None
    if jm3 is None:
        jm2 = _JOIN_SKELETON.match(sql)
    if (jm3 or jm2) and estimator == "subsample":
        raise ValueError(
            "approx joins report closed-form CIs over the fact-side sample "
            "— ERROR BY SUBSAMPLING supports single-table sampling "
            "aggregates (and UNION ALL over persisted uniform samples)"
        )
    if jm3:
        return _alias_join_out(_approx_join3(spark, jm3, tables, catalog, catalog_key), jm3)
    if jm2:
        return _alias_join_out(_approx_join(spark, jm2, tables, catalog, catalog_key), jm2)
    m = _SKELETON.match(sql)
    if not m:
        raise ValueError(
            "unsupported statement — approx_sql accepts only "
            "'SELECT APPROX_*(...) FROM t [WHERE expr] [GROUP BY col]'; "
            "use the DataFrame API (sketchlib.spark) for anything richer"
        )
    rmu = _ROLLUP_GROUP.match(m.group("group") or "")
    if rmu:
        return _run_rollup(spark, m, rmu, tables, catalog, catalog_key, estimator)
    aliased = _AGG_ALIASED.findall(m.group("select"))
    if any(al for *_, al in aliased):
        return _run_aliased(spark, m, aliased, tables, catalog, catalog_key,
                            estimator=estimator)
    aggs = [(f.upper(), _split_args(argstr)) for f, argstr in _AGG.findall(m.group("select"))]
    group = _parse_group(m.group("group"))

    if estimator == "subsample":
        if len(aggs) > 1:
            raise ValueError(
                "ERROR BY SUBSAMPLING takes one aggregate per statement — "
                "issue one statement per aggregate"
            )
        if aggs[0][0] not in _SUBSAMPLE_FNS:
            raise ValueError(
                f"{aggs[0][0]} is sketch-served — its bound is not a "
                "sampling CI a subsample spread could replace; ERROR BY "
                f"SUBSAMPLING applies to {'/'.join(_SUBSAMPLE_FNS)}"
            )
        if aggs[0][0] == "APPROX_PERCENTILE" and (
            _percentile_args(aggs[0][1])[1:] != (None, None)
            or _pct_weight(aggs[0][1]) is not None
        ):
            raise ValueError(
                "give ONE estimator — rank_err/rel_err/weight are static "
                "sketch-route arguments (KLL / DDSketch / weighted tdigest) "
                "and ERROR BY SUBSAMPLING is a data-driven row estimator; "
                "they cannot combine"
            )
        if aggs[0][0] == "APPROX_COUNT_DISTINCT" and len(aggs[0][1]) > 1:
            raise ValueError(
                "give ONE accuracy spec — an explicit rse is a static "
                "sketch-route guarantee a universe scramble cannot promise "
                "(its achieved rse depends on the unknown distinct count); "
                "drop the rse or drop ERROR BY SUBSAMPLING"
            )

    if len(aggs) > 1:
        if catalog is not None and catalog_key is not None:
            raise ValueError(
                "multi-aggregate statements can't take catalog_key — issue one "
                "statement per aggregate to answer from persisted states, or "
                "pass catalog alone for per-aggregate auto-selection"
            )
        if catalog is not None:
            routed = _multi_agg_routed(
                spark, aggs, group, m.group("where"), m.group("table"), tables, catalog
            )
            if routed is not None:
                return routed
        df = _resolve_table(spark, m.group("table"), tables)
        if m.group("where"):
            df = _apply_where(spark, df, m.group("where"), tables, m.group("table"))
        return _multi_agg(spark, df, aggs, group)

    fn, args = aggs[0]

    if catalog is not None and catalog_key is None:
        # Verdict's auto-selection: the user passed a catalog but named no
        # artifact — pick the best registered states/sample for this
        # statement (None → fall through to the on-the-fly build below)
        catalog_key = _resolve_key(
            fn, args, group, bool(m.group("where")), m.group("table"), tables, catalog,
            uniform_samples_only=(estimator == "subsample"),
        )

    if catalog is not None and catalog_key is not None:
        import json

        # persisted SAMPLE tables serve the sampling aggregates (A5 for
        # APPROX_COUNT/SUM/AVG and the universe COUNT DISTINCT path).
        # WHERE is legal here — exactly Verdict's behavior of applying the
        # predicate to the scramble scan: filtering COMMUTES with row/domain
        # sampling (each surviving row/key was still included independently
        # with the registered probability), so the same 1/p scale-up is
        # unbiased for the filtered population. Sketch STATES (below) are
        # pre-reduced and cannot take post-hoc predicates.
        if catalog.sample_exists(catalog_key):
            meta = catalog.sample_meta(catalog_key)
            s = catalog.sample(catalog_key)
            # subsample b-sizing policy, ONE place for every aggregate
            # below: the registered row count sizes b only when the whole
            # scramble is read — under WHERE a selective predicate can
            # leave ~1 row per block (b sized for the unfiltered table),
            # collapsing the subsample geometry, so the FILTERED sample is
            # counted instead (one extra pass over the p-fraction
            # scramble, never the corpus)
            ss_n = None if m.group("where") else int(meta["rows_sampled"])
            if m.group("where"):
                s = _apply_where(spark, s, m.group("where"), tables, m.group("table"))
            if fn in ("APPROX_COUNT", "APPROX_SUM", "APPROX_AVG"):
                if meta["kind"] not in ("uniform", "stratified"):
                    raise ValueError(
                        f"{fn} needs a uniform or stratified sample; {catalog_key!r} is {meta['kind']}"
                    )
                from pyspark.sql import functions as F

                from sketchlib.spark.sampling import (
                    approx_agg_from_stratified_sample,
                    approx_agg_from_uniform_sample,
                )

                if fn == "APPROX_COUNT":
                    col, s = "_one", s.withColumn("_one", F.lit(1.0))
                else:
                    s, col = _materialize_expr(s, args[0])
                keep = {
                    "APPROX_COUNT": ["est_count", "count_err"],
                    "APPROX_SUM": ["est_sum", "sum_err"],
                    "APPROX_AVG": ["est_avg", "avg_err"],
                }[fn]
                if estimator == "subsample":
                    if meta["kind"] != "uniform":
                        raise ValueError(
                            "ERROR BY SUBSAMPLING needs a UNIFORM scramble "
                            "(one shared Bernoulli inclusion probability — "
                            "a stratified sample's mixed fractions break the "
                            f"subsample geometry); {catalog_key!r} is "
                            f"{meta['kind']}"
                        )
                    from sketchlib.spark.subsample import (
                        subsample_agg_from_uniform_sample,
                    )

                    def _uagg(frame, gname):
                        return subsample_agg_from_uniform_sample(
                            frame, gname, col, meta["ratio"],
                            n_total=ss_n, seed=int(meta["seed"]),
                        )
                else:
                    def _uagg(frame, gname):
                        return approx_agg_from_uniform_sample(
                            frame, gname, col, meta["ratio"]
                        )
                if meta["kind"] == "stratified":
                    fractions = json.loads(meta["fractions_json"])
                    if group is None:
                        # global totals: per-stratum HT estimates summed, mean
                        # via the cross-strata ratio estimator (delta-method CI)
                        from sketchlib.spark.sampling import stratified_global_agg

                        out = stratified_global_agg(s, meta["on_col"], col, fractions)
                        return out.select(*keep)
                    if group != meta["on_col"]:
                        raise ValueError(
                            f"stratified sample {catalog_key!r} is keyed by "
                            f"{meta['on_col']!r}; GROUP BY must match"
                        )
                    out = approx_agg_from_stratified_sample(s, group, col, fractions)
                elif isinstance(group, (list, tuple)):
                    # composite key over a persisted scramble: aggregate on
                    # the derived key string, split back into native columns
                    s, gcol = _with_gkey(s, group)
                    out = _uagg(s, gcol)
                    out = out.withColumnRenamed(gcol, "group").select("group", *keep)
                    return _finish_grouped(out, s, group)
                else:
                    out = _uagg(s, group)
                return out.select(*([group] if group else []), *keep)
            if fn in ("APPROX_VARIANCE", "APPROX_STDDEV", "APPROX_COVAR", "APPROX_CORR"):
                if meta["kind"] != "uniform":
                    raise ValueError(
                        f"{fn} needs a UNIFORM sample (one shared inclusion "
                        f"probability — mixed stratified fractions would bias the "
                        f"pooled moments); {catalog_key!r} is {meta['kind']}"
                    )
                from sketchlib.spark.sampling import (
                    approx_agg_from_uniform_sample,
                    approx_bivariate_from_uniform_sample,
                )

                bivar = fn in ("APPROX_COVAR", "APPROX_CORR")
                s, col = _materialize_expr(s, args[0])
                if bivar:
                    s, ycol = _materialize_expr(s, args[1])
                keep = {
                    "APPROX_VARIANCE": ["est_variance", "variance_err"],
                    "APPROX_STDDEV": ["est_stddev", "stddev_err"],
                    "APPROX_COVAR": ["est_covar", "covar_err"],
                    "APPROX_CORR": ["est_corr", "corr_err"],
                }[fn]

                if estimator == "subsample":
                    from sketchlib.spark.subsample import (
                        subsample_agg_from_uniform_sample,
                        subsample_bivariate_from_uniform_sample,
                    )

                    def _run(frame, gname):
                        if bivar:
                            return subsample_bivariate_from_uniform_sample(
                                frame, gname, col, ycol, meta["ratio"],
                                n_total=ss_n, seed=int(meta["seed"]),
                            )
                        return subsample_agg_from_uniform_sample(
                            frame, gname, col, meta["ratio"], moments=True,
                            n_total=ss_n, seed=int(meta["seed"]),
                        )
                else:
                    def _run(frame, gname):
                        if bivar:
                            return approx_bivariate_from_uniform_sample(
                                frame, gname, col, ycol, meta["ratio"]
                            )
                        return approx_agg_from_uniform_sample(
                            frame, gname, col, meta["ratio"], moments=True
                        )

                if isinstance(group, (list, tuple)):
                    s, gcol = _with_gkey(s, group)
                    out = _run(s, gcol)
                    out = out.withColumnRenamed(gcol, "group").select("group", *keep)
                    return _finish_grouped(out, s, group)
                out = _run(s, group)
                return out.select(*([group] if group else []), *keep)
            if fn == "APPROX_COUNT_DISTINCT":
                col = args[0]
                if meta["kind"] != "universe" or meta["on_col"] != col:
                    raise ValueError(
                        f"APPROX_COUNT_DISTINCT({col}) needs a universe sample on {col!r}; "
                        f"{catalog_key!r} is {meta['kind']} on {meta['on_col']!r}"
                    )
                from sketchlib.spark.sampling import count_distinct_from_universe_sample

                if estimator == "subsample":
                    from sketchlib.spark.subsample import (
                        subsample_count_distinct_from_universe_sample,
                    )

                    def _cd(frame, gname):
                        return subsample_count_distinct_from_universe_sample(
                            frame, gname, col, meta["ratio"], seed=int(meta["seed"])
                        )
                else:
                    def _cd(frame, gname):
                        return count_distinct_from_universe_sample(
                            frame, col, meta["ratio"], group_by=gname
                        )
                if isinstance(group, (list, tuple)):
                    s, gcol = _with_gkey(s, group)
                    out = _cd(s, gcol).withColumnRenamed(gcol, "group")
                    return _finish_grouped(out, s, group)
                return _cd(s, group)
            if fn == "APPROX_PERCENTILE":
                # Verdict's A12 over the scramble: EXACT percentile of the
                # persisted sample rows (the sampling is the approximation).
                # Rank error of an empirical quantile from a Bernoulli(p)
                # sample of n_s rows: se ≈ √(q(1−q)/n_s) in rank terms (CLT
                # for the empirical process), reported at z=1.96.
                from pyspark.sql import functions as F

                if _pct_weight(args) is not None:
                    raise ValueError(_PCT_WEIGHT_SAMPLE_MSG)
                if meta["kind"] not in ("uniform", "stratified"):
                    raise ValueError(
                        f"APPROX_PERCENTILE needs a uniform or stratified sample; "
                        f"{catalog_key!r} is {meta['kind']}"
                    )
                if meta["kind"] == "stratified" and group != meta["on_col"]:
                    raise ValueError(
                        f"stratified sample {catalog_key!r} is keyed by "
                        f"{meta['on_col']!r}; GROUP BY must match (per-group "
                        "quantiles across mixed-fraction strata would be biased)"
                    )
                s, col = _materialize_expr(s, args[0])
                qs, req_rank, req_rel = _percentile_args(args)
                if req_rank is not None or req_rel is not None:
                    raise ValueError(
                        "a rank_err/rel_err contract cannot be served from a "
                        "scramble — the empirical quantile's error depends on "
                        "the sample's row count, so no static guarantee "
                        "exists; route to KLL/DDSketch states (drop "
                        "catalog_key for auto-selection) or drop the contract"
                    )
                s, gcol = _with_gkey(s, group)
                gsel = [gcol] if gcol else []
                if estimator == "subsample":
                    # value-unit quantile CIs — the subsample spread folds
                    # the (closed-form-less) density at the quantile into
                    # the per-block estimates; rank bounds stay the CLT
                    # path's output shape
                    if meta["kind"] != "uniform":
                        raise ValueError(
                            "ERROR BY SUBSAMPLING needs a UNIFORM scramble "
                            f"for APPROX_PERCENTILE; {catalog_key!r} is "
                            f"{meta['kind']}"
                        )
                    from sketchlib.spark.subsample import (
                        subsample_percentile_from_uniform_sample,
                    )

                    out = subsample_percentile_from_uniform_sample(
                        s, gcol, col, qs, meta["ratio"],
                        n_total=ss_n, seed=int(meta["seed"]),
                    )
                    if isinstance(group, (list, tuple)):
                        out = out.withColumnRenamed("_gkey_sql", "group")
                        return _finish_grouped(out, s, group)
                    return out
                qs_sql = ", ".join(repr(float(q)) for q in qs)
                agg = s.groupBy(*gsel).agg(
                    F.expr(f"percentile({col}, array({qs_sql}))").alias("_vals"),
                    F.count("*").alias("n_s"),
                )
                qlit = F.array(*[F.lit(float(q)) for q in qs])
                out = (
                    agg.select(*gsel, F.posexplode("_vals").alias("_i", "value"), "n_s")
                    .withColumn("q", F.element_at(qlit, F.col("_i") + 1))
                    .withColumn(
                        "rank_err_bound",
                        F.lit(1.96) * F.sqrt(F.col("q") * (1 - F.col("q")) / F.col("n_s")),
                    )
                    .select(*gsel, "q", "value", "rank_err_bound")
                )
                if isinstance(group, (list, tuple)):
                    out = out.withColumnRenamed("_gkey_sql", "group")
                    return _finish_grouped(out, s, group)
                return out
            raise ValueError(f"{fn} cannot be answered from a persisted sample table")

        reg = [r for r in catalog.list_rows() if r["name"] == catalog_key]
        if not reg:
            # checked BEFORE the estimator gate: a typo'd key must get the
            # no-such-artifact message, not "is a sketch-states set"
            raise ValueError(f"catalog has no sketch set or sample {catalog_key!r}")
        if estimator == "subsample":
            # reachable only via an EXPLICIT catalog_key naming a sketch
            # set (auto-resolution is uniform-scrambles-only): states hold
            # no rows to subsample, and answering with the sketch's own
            # bound would be exactly the silent closed-form fallback the
            # modifier forbids
            raise ValueError(
                f"{catalog_key!r} is a sketch-states set — ERROR BY "
                "SUBSAMPLING needs Bernoulli(p) ROWS (a uniform scramble); "
                "name a sample or drop catalog_key for auto-selection"
            )
        if m.group("where"):
            raise ValueError(
                "sketch states were built over the unfiltered table — WHERE "
                "cannot be applied post-hoc to pre-reduced states; use a "
                "persisted SAMPLE (create_sample) for filterable approx scans, "
                "rebuild states with the filter, or drop catalog_key"
            )
        reg = reg[0]
        if _canon_group(group) != reg["group_by"]:
            raise ValueError(
                f"statement GROUP BY {group!r} != registered group_by "
                f"{reg['group_by']!r} for {catalog_key!r}"
            )
        kinds = _CATALOG_KINDS.get(fn)
        if kinds is None:
            raise ValueError(f"{fn} cannot be answered from persisted sketch states")
        col = args[0]
        spec = next(
            (s for s in json.loads(reg["specs_json"])
             if s["kind"] in kinds and s["column"] == col
             and _cm_spec_serves(fn, args, s) and _mg_spec_serves(fn, args, s)
         and _pct_spec_serves(fn, args, s)
             and _fd_spec_serves(fn, args, s)),
            None,
        )
        if spec is None:
            raise ValueError(
                f"sketch set {catalog_key!r} holds no {'/'.join(kinds)} sketch on "
                f"{col!r} serving {fn}"
                + (" (weighted CMs serve APPROX_TOP_SUM with a matching weight "
                   "column; unweighted CMs serve APPROX_TOPK; an explicit eps "
                   "routes only to states achieving it)"
                   if fn in ("APPROX_TOPK", "APPROX_TOP_SUM") else "")
            )
        states = catalog.states(catalog_key)
        if fn == "APPROX_COUNT_DISTINCT":
            out = estimates_df(spark, states, spec["name"])
        elif fn == "APPROX_SPECTRUM":
            from sketchlib.spark.query import spectrum_df

            out = spectrum_df(spark, states, spec["name"], _spectrum_args(args)[0])
        elif fn == "APPROX_TOPK":
            out = topk_df(spark, states, spec["name"], int(args[1]))
        elif fn == "APPROX_TOP_SUM":
            out = topk_df(spark, states, spec["name"], _top_sum_k(args)).withColumnRenamed(
                "est_count", "est_sum"
            )
        elif fn == "APPROX_MAD":
            from sketchlib.spark.query import mad_df

            _mad_args(args)
            out = mad_df(spark, states, spec["name"])
        elif fn == "APPROX_TRIMMED_MEAN":
            from sketchlib.spark.query import trimmed_mean_df

            out = trimmed_mean_df(spark, states, spec["name"], *_trim_args(args))
        elif fn == "APPROX_HISTOGRAM":
            from sketchlib.spark.query import equidepth_histogram_df

            out = equidepth_histogram_df(spark, states, spec["name"], _hist_args(args))
        elif fn == "APPROX_FREQUENT":
            from sketchlib.spark.query import mg_topk_df

            out = mg_topk_df(spark, states, spec["name"], _frequent_args(args)[0])
        else:  # APPROX_PERCENTILE
            qs, req_rank, req_rel = _percentile_args(args)
            if req_rank is not None:
                k = float(spec.get("params", {}).get("k", 0))
                if spec["kind"] != "kll" or not k or 3.31 / k > req_rank * (1 + 1e-9):
                    raise ValueError(
                        f"sketch set {catalog_key!r} cannot achieve rank_err="
                        f"{req_rank} — its {spec['kind']} sketch on {col!r} "
                        + (f"has k={int(k)} (ε≈{3.31 / k:.4f})" if k else "carries no k")
                        + "; rebuild with a larger k or drop catalog_key"
                    )
            if req_rel is not None:
                # _pct_spec_serves guaranteed a dd with achieving alpha;
                # the answer frame carries the bound in its own units
                out = rel_quantiles_df(spark, states, spec["name"], qs)
            else:
                out = quantiles_df(spark, states, spec["name"], qs)
        return _finish_grouped(out, None, group)

    if estimator == "subsample" and fn in ("APPROX_PERCENTILE", "APPROX_COUNT_DISTINCT"):
        # raised BEFORE the table is resolved: these routes answer ONLY
        # from registered scrambles, so the refusal must not depend on the
        # base path still existing (a base-free catalog with a missing
        # registration would otherwise surface as an AnalysisException)
        raise ValueError(
            f"{fn} ERROR BY SUBSAMPLING answers from a registered "
            + ("UNIVERSE scramble on the column" if fn == "APPROX_COUNT_DISTINCT"
               else "UNIFORM scramble")
            + " (pass catalog=... with one created) — the on-the-fly route "
            + ("builds an HLL sketch, whose bound is deterministic,"
               if fn == "APPROX_COUNT_DISTINCT" else
               "builds KLL states, whose rank bound is deterministic,")
            + " not a subsample CI"
        )

    df = _resolve_table(spark, m.group("table"), tables)
    if m.group("where"):
        df = _apply_where(spark, df, m.group("where"), tables, m.group("table"))

    if fn == "APPROX_COUNT_DISTINCT":
        df, col = _materialize_expr(df, args[0])
        rse = float(args[1]) if len(args) > 1 else 0.01
        p = hll_params(rse)["p"]
        states = build_sketches(df, [SketchSpec("_q", "hll", col, {"p": p})], group_by=group)
        out = estimates_df(spark, states, "_q")
        return _finish_grouped(out, df, group)

    if fn == "APPROX_SPECTRUM":
        from pyspark.sql import functions as F

        from sketchlib.spark.query import spectrum_df

        r, fd_d, fd_ell = _spectrum_args(args)
        df, col = _materialize_expr(df, args[0])
        if fd_d is None:
            # infer the dimension from the data (one-row probe); an
            # explicitly-given d is trusted — the sketch's whole-rows guard
            # catches a ragged column either way
            probe = df.select(F.size(F.col(col)).alias("_d")).first()
            if probe is None or probe["_d"] is None or probe["_d"] < 1:
                raise ValueError(
                    f"APPROX_SPECTRUM could not infer the vector dimension "
                    f"from {col!r} — pass d=<dim> explicitly"
                )
            fd_d = int(probe["_d"])
        states = build_sketches(
            df, [SketchSpec("_q", "fd", col, {"d": fd_d, "ell": fd_ell})],
            group_by=group,
        )
        out = spectrum_df(spark, states, "_q", r)
        return _finish_grouped(out, df, group)

    if fn == "APPROX_TOPK":
        df, col = _materialize_expr(df, args[0])
        k = int(args[1])
        eps = float(args[2]) if len(args) > 2 else 1e-4
        states = build_sketches(
            df, [SketchSpec("_q", "cm", col, {"eps": eps, "delta": 0.01})], group_by=group
        )
        out = topk_df(spark, states, "_q", k)
        return _finish_grouped(out, df, group)

    if fn == "APPROX_TOP_SUM":
        # heavy hitters BY SUM: one weighted-CM build (same zero-shuffle map
        # kernel), top-k re-estimated from the merged state — the Verdict-
        # style "top keys by SUM(w)" answered without a key-wide groupBy
        k = _top_sum_k(args)
        eps = _num(args[3]) if len(args) > 3 else 1e-4
        if eps is None:
            raise ValueError(
                f"APPROX_TOP_SUM eps argument {args[3]!r} must be numeric"
            )
        df, col = _materialize_expr(df, args[0])
        df, wcol = _materialize_expr(df, args[1])
        states = build_sketches(
            df,
            [SketchSpec("_q", "cm", col, {"eps": eps, "delta": 0.01}, weight=wcol)],
            group_by=group,
        )
        out = topk_df(spark, states, "_q", k).withColumnRenamed("est_count", "est_sum")
        return _finish_grouped(out, df, group)

    if fn == "APPROX_PERCENTILE":
        df, col = _materialize_expr(df, args[0])
        qs, req_rank, req_rel = _percentile_args(args)
        wcol = _pct_weight(args)
        if wcol is not None:
            # weight-mass quantiles: one weighted t-digest build (fractional
            # centroid weights native; the digest filters NaN pairs jointly)
            states = build_sketches(
                df,
                [SketchSpec("_q", "tdigest", col, {"compression": 200}, weight=wcol)],
                group_by=group,
            )
            out = quantiles_df(spark, states, "_q", qs)
            return _finish_grouped(out, df, group)
        if req_rel is not None:
            # relative-VALUE contract: α IS the bound (Masson et al. 2019),
            # so the on-the-fly DDSketch just builds at the requested alpha
            states = build_sketches(
                df, [SketchSpec("_q", "dd", col, {"alpha": req_rel})], group_by=group
            )
            out = rel_quantiles_df(spark, states, "_q", qs)
            return _finish_grouped(out, df, group)
        k = 200
        if req_rank is not None:
            # rank-error contract: invert the calibrated KLL bound ε(k)≈3.31/k
            from sketchlib.planner import kll_params

            k = max(200, kll_params(req_rank)["k"])
        states = build_sketches(df, [SketchSpec("_q", "kll", col, {"k": k})], group_by=group)
        out = quantiles_df(spark, states, "_q", qs)
        return _finish_grouped(out, df, group)

    if fn == "APPROX_FREQUENT":
        # deterministic heavy hitters: one MG build through the same
        # zero-shuffle kernel; the answer frame's undercount_bound is the
        # summary's EXACTLY tracked decrement (no δ to carve out)
        from sketchlib.spark.query import mg_topk_df

        f_k, f_eps = _frequent_args(args)
        df, col = _materialize_expr(df, args[0])
        states = build_sketches(
            df, [SketchSpec("_q", "mg", col, {"eps": f_eps or 1e-4})], group_by=group
        )
        out = mg_topk_df(spark, states, "_q", f_k)
        return _finish_grouped(out, df, group)

    if fn in ("APPROX_MAD", "APPROX_TRIMMED_MEAN", "APPROX_HISTOGRAM"):
        # on-the-fly: one KLL build (same zero-shuffle kernel as the
        # percentile route), SIZED from the statement's own requirement
        # (_robust_kll_k — the states route keeps the "register a larger
        # sketch" refusal; there the sketch was the user's registration)
        kk = _robust_kll_k(fn, args)
        df, col = _materialize_expr(df, args[0])
        states = build_sketches(
            df, [SketchSpec("_q", "kll", col, {"k": kk})], group_by=group
        )
        if fn == "APPROX_MAD":
            from sketchlib.spark.query import mad_df

            out = mad_df(spark, states, "_q")
        elif fn == "APPROX_TRIMMED_MEAN":
            from sketchlib.spark.query import trimmed_mean_df

            out = trimmed_mean_df(spark, states, "_q", *_trim_args(args))
        else:
            from sketchlib.spark.query import equidepth_histogram_df

            out = equidepth_histogram_df(spark, states, "_q", _hist_args(args))
        return _finish_grouped(out, df, group)

    if fn in ("APPROX_COVAR", "APPROX_CORR"):
        from sketchlib.spark.sampling import approx_bivariate_uniform, uniform_sample

        df, xcol = _materialize_expr(df, args[0])
        df, ycol = _materialize_expr(df, args[1])
        ratio = float(args[2])
        keep = {
            "APPROX_COVAR": ["est_covar", "covar_err"],
            "APPROX_CORR": ["est_corr", "corr_err"],
        }[fn]
        if estimator == "subsample":
            from sketchlib.spark.subsample import (
                subsample_bivariate_from_uniform_sample,
            )

            def _biv(frame, gname):
                return subsample_bivariate_from_uniform_sample(
                    uniform_sample(frame, ratio, 42), gname, xcol, ycol, ratio
                )
        else:
            def _biv(frame, gname):
                return approx_bivariate_uniform(frame, gname, xcol, ycol, ratio)
        if isinstance(group, (list, tuple)):
            from sketchlib.spark.build import group_key_expr

            df = df.withColumn("_gkey", group_key_expr(list(group)))
            out = _biv(df, "_gkey")
            out = out.withColumnRenamed("_gkey", "group").select("group", *keep)
            return _finish_grouped(out, df, group)
        out = _biv(df, group)
        return out.select(*([group] if group else []), *keep)

    if fn in ("APPROX_COUNT", "APPROX_SUM", "APPROX_AVG", "APPROX_VARIANCE", "APPROX_STDDEV"):
        from sketchlib.spark.sampling import approx_agg_uniform, uniform_sample

        moments = fn in ("APPROX_VARIANCE", "APPROX_STDDEV")
        if fn == "APPROX_COUNT":
            col, ratio = None, float(args[0])
        else:
            df, col = _materialize_expr(df, args[0])
            ratio = float(args[1])
        if col is None:  # pure COUNT: synthesize a numeric column for the shared kernel
            from pyspark.sql import functions as F

            df = df.withColumn("_one", F.lit(1.0))
            col = "_one"
        keep = {
            "APPROX_COUNT": ["est_count", "count_err"],
            "APPROX_SUM": ["est_sum", "sum_err"],
            "APPROX_AVG": ["est_avg", "avg_err"],
            "APPROX_VARIANCE": ["est_variance", "variance_err"],
            "APPROX_STDDEV": ["est_stddev", "stddev_err"],
        }[fn]
        if estimator == "subsample":
            from sketchlib.spark.subsample import subsample_agg_from_uniform_sample

            def _uagg(frame, gname):
                return subsample_agg_from_uniform_sample(
                    uniform_sample(frame, ratio, 42), gname, col, ratio,
                    moments=moments,
                )
        else:
            def _uagg(frame, gname):
                return approx_agg_uniform(frame, gname, col, ratio, moments=moments)
        if isinstance(group, (list, tuple)):
            # composite key: aggregate on the kernel's joined string, then
            # split back into the user's columns
            from sketchlib.spark.build import group_key_expr

            df = df.withColumn("_gkey", group_key_expr(list(group)))
            out = _uagg(df, "_gkey")
            out = out.withColumnRenamed("_gkey", "group").select("group", *keep)
            return _finish_grouped(out, df, group)
        out = _uagg(df, group)
        return out.select(*([group] if group else []), *keep)

    raise ValueError(f"unknown approximate aggregate {fn!r}")
