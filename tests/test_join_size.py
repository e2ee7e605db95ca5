"""CM inner-product join-cardinality estimation (SURVEY.md B3 extended).

Cormode & Muthukrishnan 2005 §4.2: min-of-row-dot-products never undercounts
a⊙b and overshoots ≤ ε·‖a‖₁·‖b‖₁ w.p. ≥ 1−δ. a⊙b over join-key
multiplicity vectors equals the equi-join row count, so the sketch prices a
join without touching either table.
"""

import collections

import numpy as np
import pytest

from sketchlib import CountMin


def _true_join(a_keys, b_keys) -> int:
    ca = collections.Counter(a_keys.tolist())
    cb = collections.Counter(b_keys.tolist())
    return sum(n * cb.get(k, 0) for k, n in ca.items())


@pytest.fixture(scope="module")
def two_sides():
    rng = np.random.default_rng(42)
    a = rng.zipf(1.3, 200_000)
    a = a[a < 50_000]
    b = rng.integers(0, 50_000, 150_000)
    return a.astype(np.int64), b.astype(np.int64)


def test_inner_product_never_undercounts_and_bound(two_sides):
    a_keys, b_keys = two_sides
    cm_a = CountMin(eps=1e-3, delta=0.01).update_values(a_keys)
    cm_b = CountMin(eps=1e-3, delta=0.01).update_values(b_keys)
    est, bound = cm_a.inner_product(cm_b)
    true = _true_join(a_keys, b_keys)
    assert est >= true, "CM inner product must never undercount the join size"
    assert est - true <= bound
    assert bound == pytest.approx(1e-3 * len(a_keys) * len(b_keys))


def test_inner_product_symmetric(two_sides):
    a_keys, b_keys = two_sides
    cm_a = CountMin(eps=1e-3, delta=0.01).update_values(a_keys)
    cm_b = CountMin(eps=1e-3, delta=0.01).update_values(b_keys)
    assert cm_a.inner_product(cm_b) == cm_b.inner_product(cm_a)


def test_inner_product_partition_invariant(two_sides):
    """The estimate is a pure function of the merged table — identical
    however side A's rows were partitioned before merging (tables add)."""
    a_keys, b_keys = two_sides
    whole = CountMin(eps=1e-3, delta=0.05).update_values(a_keys)
    acc = CountMin(eps=1e-3, delta=0.05)
    for part in np.array_split(a_keys, 5):
        acc.merge(CountMin(eps=1e-3, delta=0.05).update_values(part))
    cm_b = CountMin(eps=1e-3, delta=0.05).update_values(b_keys)
    assert whole.inner_product(cm_b) == acc.inner_product(cm_b)


def test_inner_product_geometry_mismatch_raises(two_sides):
    a_keys, b_keys = two_sides
    cm_a = CountMin(eps=1e-3, delta=0.01, seed=7).update_values(a_keys)
    cm_b = CountMin(eps=1e-3, delta=0.01, seed=8).update_values(b_keys)
    with pytest.raises(ValueError, match="geometry/seed mismatch"):
        cm_a.inner_product(cm_b)


def test_disjoint_keys_estimate_small():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 10_000, 50_000).astype(np.int64)
    b = (rng.integers(0, 10_000, 50_000) + 10**9).astype(np.int64)
    cm_a = CountMin(eps=1e-4, delta=0.01).update_values(a)
    cm_b = CountMin(eps=1e-4, delta=0.01).update_values(b)
    est, bound = cm_a.inner_product(cm_b)
    assert est <= bound  # true join is 0; overshoot within ε·Na·Nb


def test_join_size_estimate_from_spark_states(spark, seq_tiny_dir):
    """End-to-end over build_sketches states: estimate vs the exact Spark
    self-join count on doc-hash keys, never undercounting and within bound."""
    from pyspark.sql import functions as F

    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import join_size_estimate

    df = spark.read.parquet(seq_tiny_dir)
    # two overlapping halves joined on n_tok (plenty of multiplicity)
    a = df.filter(F.col("n_tok") % 3 != 0).select("n_tok")
    b = df.filter(F.col("n_tok") % 2 == 0).select("n_tok")
    spec = [SketchSpec("cm_k", "cm", "n_tok", {"eps": 1e-4, "delta": 0.01})]
    sa = build_sketches(a, spec, group_by=None)
    sb = build_sketches(b, spec, group_by=None)
    est, bound = join_size_estimate(sa, sb, "cm_k")
    exact = a.join(b, "n_tok").count()
    assert est >= exact
    assert est - exact <= bound
    # the bound is useful, not vacuous: a 1e-4 eps at tiny scale is tight
    assert bound <= 1e-4 * a.count() * b.count() + 1


def test_join_size_estimate_wrong_kind_raises(spark, seq_tiny_dir):
    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import join_size_estimate

    df = spark.read.parquet(seq_tiny_dir)
    st = build_sketches(df, [SketchSpec("h", "hll", "n_tok", {"p": 12})], group_by=None)
    with pytest.raises(ValueError, match="Count-Min"):
        join_size_estimate(st, st, "h")


def test_join_size_estimate_missing_group_raises(spark, seq_tiny_dir):
    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import join_size_estimate

    df = spark.read.parquet(seq_tiny_dir)
    st = build_sketches(
        df, [SketchSpec("cm_k", "cm", "n_tok", {"eps": 1e-3, "delta": 0.01})], group_by=None
    )
    with pytest.raises(ValueError, match="no state"):
        join_size_estimate(st, st, "cm_k", group_a="nope")


def test_join_size_df_grouped_and_f2(spark, seq_tiny_dir):
    """Per-group pairing: grouped CM states price each group's join; the
    self-pair gives the per-group second frequency moment F2 = sum(c^2)."""
    import collections

    from pyspark.sql import functions as F

    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import join_size_df

    df = spark.read.parquet(seq_tiny_dir)
    spec = [SketchSpec("cm_k", "cm", "n_tok", {"eps": 1e-4, "delta": 0.01})]
    states = build_sketches(df.select("source", "n_tok"), spec, group_by="source")

    out = {r["group"]: (r["join_rows_est"], r["join_rows_err"])
           for r in join_size_df(spark, states, states, "cm_k").collect()}
    rows = df.select("source", "n_tok").collect()
    per_group = collections.defaultdict(collections.Counter)
    for r in rows:
        per_group[r["source"]][r["n_tok"]] += 1
    assert set(out) == set(per_group)
    for g, cnt in per_group.items():
        f2 = sum(c * c for c in cnt.values())
        est, err = out[g]
        assert est >= f2, f"F2 undercount in group {g}"
        assert est - f2 <= err


def test_join_size_df_two_sides_intersect_groups(spark, seq_tiny_dir):
    from pyspark.sql import functions as F

    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import join_size_df

    df = spark.read.parquet(seq_tiny_dir)
    spec = [SketchSpec("cm_k", "cm", "n_tok", {"eps": 1e-3, "delta": 0.01})]
    a = df.filter(F.col("source") != "web")
    b = df.filter(F.col("source") != "code")
    sa = build_sketches(a.select("source", "n_tok"), spec, group_by="source")
    sb = build_sketches(b.select("source", "n_tok"), spec, group_by="source")
    out = {r["group"] for r in join_size_df(spark, sa, sb, "cm_k").collect()}
    # only groups present on BOTH sides are priced
    assert "web" not in out and "code" not in out and len(out) >= 2


def test_join_size_df_wrong_kind_raises(spark, seq_tiny_dir):
    from sketchlib.spark.build import SketchSpec, build_sketches
    from sketchlib.spark.query import join_size_df

    df = spark.read.parquet(seq_tiny_dir)
    st = build_sketches(df, [SketchSpec("h", "hll", "n_tok", {"p": 12})], group_by="source")
    with pytest.raises(ValueError, match="Count-Min"):
        join_size_df(spark, st, st, "h")
