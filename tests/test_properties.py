"""Hypothesis property tests (SURVEY.md §5.2, FIXTURES.md F2):
merge associativity/commutativity under arbitrary data splits and
regroupings — byte-identical for HLL/CM core/Bloom/MinHash, within published
bound for KLL/t-digest.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from sketchlib import HLL, KLL, Bloom, CountMin, MinHash, TDigest
from sketchlib.hashing import hash_ints

_values = st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=400)


def _regroup(data: np.ndarray, boundaries: list[int], perm_seed: int):
    """Split data at boundaries, then return chunks in a permuted order."""
    bs = sorted({b % (len(data) + 1) for b in boundaries})
    chunks = [c for c in np.split(data, bs) if len(c)]
    order = np.random.default_rng(perm_seed).permutation(len(chunks))
    return [chunks[i] for i in order]


@given(_values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=60, deadline=None)
def test_hll_merge_invariant_bytes(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.int64)
    whole = HLL(p=10).update_hashes(hash_ints(data))
    chunks = _regroup(data, boundaries, perm_seed)
    acc = HLL(p=10)
    for c in chunks:
        acc.merge(HLL(p=10).update_hashes(hash_ints(c)))
    assert acc.to_bytes() == whole.to_bytes()


@given(_values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=40, deadline=None)
def test_cm_table_invariant(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.int64)
    mk = lambda: CountMin(eps=0.01, delta=0.1, cand_cap=64)
    whole = mk().update_values(data)
    acc = mk()
    for c in _regroup(data, boundaries, perm_seed):
        acc.merge(mk().update_values(c))
    assert (acc.table == whole.table).all()
    assert acc.total == whole.total
    # estimates (the public surface) identical for any key set
    probe = np.unique(data)
    assert (acc.query(probe) == whole.query(probe)).all()


@given(_values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=40, deadline=None)
def test_bloom_bytes_invariant(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.int64)
    mk = lambda: Bloom(m_bits=1 << 12, h=3)
    whole = mk().add(data)
    acc = mk()
    for c in _regroup(data, boundaries, perm_seed):
        acc.merge(mk().add(c))
    assert (acc.bits == whole.bits).all()


@given(_values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=40, deadline=None)
def test_minhash_sig_invariant(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.int64)
    mk = lambda: MinHash(r=32)
    whole = mk().update_hashes(hash_ints(data))
    acc = mk()
    for c in _regroup(data, boundaries, perm_seed):
        acc.merge(mk().update_hashes(hash_ints(c)))
    assert (acc.sig == whole.sig).all()


@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=20, max_size=500),
    st.lists(st.integers(0, 10**6), max_size=6),
    st.integers(0, 100),
)
@settings(max_examples=30, deadline=None)
def test_quantile_sketches_within_bound_under_regrouping(vals, boundaries, perm_seed):
    data = np.array(vals, dtype=np.float64)
    qs = np.array([0.1, 0.5, 0.9])
    s = np.sort(data)
    for cls, kw in ((KLL, {"k": 200}), (TDigest, {"compression": 200})):
        acc = None
        for c in _regroup(data, boundaries, perm_seed):
            sk = cls(**kw).update_values(c)
            acc = sk if acc is None else acc.merge(sk)
        approx = acc.quantiles(qs)
        # under ties a value spans the whole rank interval [lo, hi]; the error
        # is the distance from q to that interval (0 if q falls inside it)
        hi = np.searchsorted(s, approx, side="right") / len(s)
        lo = np.searchsorted(s, approx, side="left") / len(s)
        err = np.maximum(lo - qs, qs - hi).clip(min=0.0)
        assert (err <= acc.error_bound() + 1.0 / len(s)).all()


@given(_values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=40, deadline=None)
def test_kmv_bytes_invariant(vals, boundaries, perm_seed):
    from sketchlib import KMV

    data = np.array(vals, dtype=np.int64)
    whole = KMV(k=64).update_hashes(hash_ints(data))
    acc = KMV(k=64)
    for c in _regroup(data, boundaries, perm_seed):
        acc.merge(KMV(k=64).update_hashes(hash_ints(c)))
    assert acc.hashes.tobytes() == whole.hashes.tobytes()


def test_incremental_refresh_equals_rebuild_under_any_split(spark, tmp_path_factory):
    """North-rule merge associativity AT THE CATALOG LEVEL: split one table
    into arbitrary file groups, create on the first group, refresh through
    the rest one group at a time — after every refresh the semilattice
    sketch states (HLL, CM) are byte-identical to a from-scratch build over
    the files covered so far, for EVERY split shape."""
    import json
    import os
    import shutil

    from hypothesis import HealthCheck, given, settings
    from sketchlib.data.gen import write_sequences
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.spark.scan import build_sketches_from_parquet, plan_chunks

    src = str(tmp_path_factory.mktemp("refsplit") / "seq")
    write_sequences(src, 2_000)
    all_files = sorted({c.file for c in plan_chunks(src)})
    specs = [
        SketchSpec("h", "hll", "doc_id", {"p": 12}),
        SketchSpec("c", "cm", "tokens", {"eps": 1e-3, "delta": 0.01}),
    ]
    work_root = str(tmp_path_factory.mktemp("refsplit_work"))

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.permutations(list(range(len(all_files)))), st.data())
    def run(perm, data):
        n = len(all_files)
        n_groups = data.draw(st.integers(min_value=2, max_value=min(4, n)))
        cuts = sorted(data.draw(
            st.lists(st.integers(1, n - 1), min_size=n_groups - 1,
                     max_size=n_groups - 1, unique=True)))
        groups, lo = [], 0
        for c in cuts + [n]:
            groups.append([all_files[i] for i in perm[lo:c]])
            lo = c
        groups = [g for g in groups if g]

        work = os.path.join(work_root, f"w{abs(hash(tuple(perm))) % 10**9}_{len(groups)}")
        shutil.rmtree(work, ignore_errors=True)
        linked = os.path.join(work, "seq")
        cat = SketchCatalog(spark, os.path.join(work, "cat"))

        def link(files):
            for f in files:
                rel = os.path.relpath(f, src)
                dst = os.path.join(linked, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.symlink(f, dst)

        try:
            link(groups[0])
            cat.create("s", linked, specs, group_by="source")
            for g in groups[1:]:
                link(g)
                cat.refresh("s")
                full = build_sketches_from_parquet(
                    spark, linked, specs, group_by="source"
                ).toPandas()
                got = cat.states("s").toPandas()
                fk = {(r["group"], r["sketch"]): bytes(r["state"]) for _, r in full.iterrows()}
                gk = {(r["group"], r["sketch"]): bytes(r["state"]) for _, r in got.iterrows()}
                assert fk == gk
        finally:
            shutil.rmtree(work, ignore_errors=True)

    run()


@given(_values, _values, st.lists(st.integers(0, 10**6), max_size=6), st.integers(0, 100))
@settings(max_examples=60, deadline=None)
def test_cm_inner_product_invariant_under_regrouping(a_vals, b_vals, boundaries, perm_seed):
    """Join-size pricing is a pure function of the merged tables: however
    side A's rows are split and re-merged, the inner-product estimate is
    bit-identical — and it never undercounts the true join size."""
    import collections

    a = np.array(a_vals, dtype=np.int64)
    b = np.array(b_vals, dtype=np.int64)
    whole = CountMin(eps=1e-3, delta=0.05).update_values(a)
    acc = CountMin(eps=1e-3, delta=0.05)
    for chunk in _regroup(a, boundaries, perm_seed):
        acc.merge(CountMin(eps=1e-3, delta=0.05).update_values(chunk))
    cm_b = CountMin(eps=1e-3, delta=0.05).update_values(b)
    assert whole.inner_product(cm_b) == acc.inner_product(cm_b)
    est, bound = whole.inner_product(cm_b)
    ca, cb = collections.Counter(a.tolist()), collections.Counter(b.tolist())
    true = sum(n * cb.get(k, 0) for k, n in ca.items())
    assert est >= true
    assert est - true <= bound
