"""Spark end-to-end tests (SURVEY.md §5.3): build sketches on the synthetic
sequences table, compare every query to the exact answer via DuckDB, and
check both build strategies agree."""

import duckdb
import numpy as np
import pytest

from sketchlib.spark import (
    SketchSpec,
    build_sketches,
    estimates_df,
    quantiles_df,
    topk_df,
)
from sketchlib.spark.query import jaccard_df, load_states, membership_df

SPECS = [
    SketchSpec("hll_doc", "hll", "doc_id", {"p": 14}),
    SketchSpec("hll_tok", "hll", "tokens", {"p": 14}),
    SketchSpec("cm_tok", "cm", "tokens", {"eps": 1e-4, "delta": 0.01}),
    SketchSpec("kll_ntok", "kll", "n_tok", {"k": 200}),
    SketchSpec("td_ntok", "tdigest", "n_tok", {"compression": 200}),
    SketchSpec("bloom_tok", "bloom", "tokens", {"m_bits": 1 << 20, "h": 7}),
    SketchSpec("mh_tok", "minhash", "tokens", {"r": 128}),
]


@pytest.fixture(scope="module")
def states(spark, seq_small_dir):
    df = spark.read.parquet(seq_small_dir)
    s = build_sketches(df, SPECS, group_by="source").cache()
    s.count()
    return s


@pytest.fixture(scope="module")
def oracle(seq_small_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW seq AS SELECT * FROM read_parquet('{seq_small_dir}/*/*.parquet', hive_partitioning=1)"
    )
    return con


def test_q1_distinct_doc_within_bound(spark, states, oracle):
    exact = dict(oracle.execute("SELECT source, count(distinct doc_id) FROM seq GROUP BY 1").fetchall())
    est = estimates_df(spark, states, "hll_doc").toPandas()
    assert set(est["group"]) == set(exact)
    for _, r in est.iterrows():
        assert abs(r["estimate"] - exact[r["group"]]) / exact[r["group"]] <= 3 * r["rse_bound"]


def test_q2_distinct_token_within_bound(spark, states, oracle):
    exact = dict(
        oracle.execute(
            "SELECT source, count(distinct t.tok) FROM (SELECT source, unnest(tokens) tok FROM seq) t GROUP BY 1"
        ).fetchall()
    )
    est = estimates_df(spark, states, "hll_tok").toPandas()
    for _, r in est.iterrows():
        assert abs(r["estimate"] - exact[r["group"]]) / exact[r["group"]] <= 3 * r["rse_bound"]


def test_q3_topk_tokens_within_bound(spark, states, oracle):
    true = oracle.execute(
        "SELECT source, tok, count(*) c FROM (SELECT source, unnest(tokens) tok FROM seq) GROUP BY 1,2"
    ).fetchall()
    true_counts = {(s, t): c for s, t, c in true}
    top = topk_df(spark, states, "cm_tok", 20).toPandas()
    for _, r in top.iterrows():
        t = true_counts.get((r["group"], r["token"]), 0)
        assert t <= r["est_count"] <= t + 3 * r["err_bound"], r
    # per group, the estimated top-5 must contain the true top-3
    for g in top["group"].unique():
        true_top3 = [
            t
            for _, t, _ in sorted(
                [x for x in true if x[0] == g], key=lambda x: (-x[2], x[1])
            )[:3]
        ]
        est_top5 = top[top["group"] == g].sort_values("est_count", ascending=False)["token"][:5]
        assert set(true_top3) <= set(est_top5.tolist()), g


@pytest.mark.parametrize("sketch", ["kll_ntok", "td_ntok"])
def test_q4_quantiles_within_rank_bound(spark, states, oracle, sketch, seq_small_dir):
    qd = quantiles_df(spark, states, sketch, [0.5, 0.9, 0.99]).toPandas()
    for g in qd["group"].unique():
        vals = np.array(
            oracle.execute(f"SELECT n_tok FROM seq WHERE source = '{g}' ORDER BY n_tok").fetchall()
        ).ravel()
        sub = qd[qd["group"] == g]
        q = sub["q"].to_numpy()
        hi = np.searchsorted(vals, sub["value"].to_numpy(), side="right") / len(vals)
        lo = np.searchsorted(vals, sub["value"].to_numpy(), side="left") / len(vals)
        err = np.maximum(lo - q, q - hi).clip(min=0.0)
        assert (err <= sub["rank_err_bound"].to_numpy() + 1.0 / len(vals)).all(), (g, err)


def test_q5_bloom_membership_no_false_negatives(spark, states, oracle):
    # every (source, token) actually present must report may_contain=True
    present = oracle.execute(
        "SELECT source, tok FROM (SELECT source, unnest(tokens) tok FROM seq) GROUP BY 1,2 LIMIT 5000"
    ).fetchall()
    by_source = {}
    for s, t in present:
        by_source.setdefault(s, []).append(t)
    mem = membership_df(
        spark, states, "bloom_tok", sorted({t for _, t in present})
    ).toPandas()
    flags = {(r["group"], r["key"]): r["may_contain"] for _, r in mem.iterrows()}
    for s, toks in by_source.items():
        for t in toks:
            assert flags[(s, t)], f"false negative: {s} {t}"


def test_minhash_pairwise_jaccard(spark, states, oracle):
    jd = jaccard_df(spark, states, "mh_tok").toPandas()
    assert len(jd) == 10  # C(5,2) source pairs
    # token vocabularies across sources overlap heavily (same Zipf) -> J should be high-ish
    pair = jd[(jd["group_a"] == "books") & (jd["group_b"] == "web")].iloc[0]
    exact = oracle.execute(
        """
        WITH a AS (SELECT DISTINCT unnest(tokens) t FROM seq WHERE source='books'),
             b AS (SELECT DISTINCT unnest(tokens) t FROM seq WHERE source='web')
        SELECT
          (SELECT count(*) FROM a JOIN b USING (t)) * 1.0 /
          (SELECT count(*) FROM (SELECT t FROM a UNION SELECT t FROM b))
        """
    ).fetchone()[0]
    assert abs(pair["jaccard_est"] - exact) <= 4 * pair["se_bound"], (pair["jaccard_est"], exact)


def test_strategies_agree_bytes(spark, seq_tiny_dir):
    """map (zero-shuffle) and shuffle (salted Verdict-style) strategies must
    produce byte-identical states for order-independent sketches."""
    df = spark.read.parquet(seq_tiny_dir)
    specs = [s for s in SPECS if s.kind in ("hll", "cm", "bloom", "minhash")]
    a = build_sketches(df, specs, group_by="source", strategy="map").toPandas()
    b = build_sketches(df, specs, group_by="source", strategy="shuffle", n_salts=8).toPandas()
    ka = {(r["group"], r["sketch"]): r["state"] for _, r in a.iterrows()}
    kb = {(r["group"], r["sketch"]): r["state"] for _, r in b.iterrows()}
    assert ka.keys() == kb.keys()
    for k in ka:
        if k[1].startswith("cm_"):
            # CM candidate list may differ by merge order; compare core table via queries
            from sketchlib.sketches import deserialize

            sa, sb = deserialize(ka[k]), deserialize(kb[k])
            assert (sa.table == sb.table).all() and sa.total == sb.total
        else:
            assert bytes(ka[k]) == bytes(kb[k]), k


def test_two_level_merge_same_result(spark, seq_tiny_dir):
    df = spark.read.parquet(seq_tiny_dir)
    specs = [s for s in SPECS if s.kind in ("hll", "bloom")]
    one = build_sketches(df, specs, group_by="source", fanout=None).toPandas()
    two = build_sketches(df, specs, group_by="source", fanout=3).toPandas()
    k1 = {(r["group"], r["sketch"]): bytes(r["state"]) for _, r in one.iterrows()}
    k2 = {(r["group"], r["sketch"]): bytes(r["state"]) for _, r in two.iterrows()}
    assert k1 == k2


def test_global_sketch_no_group(spark, seq_tiny_dir):
    df = spark.read.parquet(seq_tiny_dir)
    s = build_sketches(df, [SketchSpec("hll_doc", "hll", "doc_id", {"p": 12})], group_by=None)
    sk = load_states(s)[("", "hll_doc")]
    est, rse = sk.estimate()
    assert abs(est - 2000) / 2000 <= 3 * rse


def test_per_row_token_equality(spark, seq_tiny_dir):
    """FIXTURES.md per-row invariant: stored token arrays == regenerated."""
    from sketchlib.data.gen import gen_row_tokens

    rows = (
        spark.read.parquet(seq_tiny_dir)
        .select("doc_id", "tokens")
        .orderBy("doc_id")
        .limit(50)
        .collect()
    )
    for r in rows:
        i = int(r["doc_id"][3:])
        assert np.array_equal(np.array(r["tokens"], dtype=np.int32), gen_row_tokens(i)), r["doc_id"]


def test_null_group_values_become_explicit_group(spark):
    """Rows with NULL group keys must be sketched under '__null__', not dropped."""
    rows = [(f"d{i}", ["web", None][i % 2]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    states = build_sketches(df, [SketchSpec("h", "hll", "doc_id", {"p": 12})], group_by="source")
    got = {r["group"]: r["rows"] for r in states.collect()}
    assert got == {"web": 100, "__null__": 100}


def test_kmv_in_spark_build(spark, seq_small_dir, oracle_module_scope=None):
    """KMV through the full build path: per-source distinct docs within bound."""
    import duckdb

    df = spark.read.parquet(seq_small_dir)
    states = build_sketches(
        df, [SketchSpec("kmv_doc", "kmv", "doc_id", {"k": 1024})], group_by="source"
    )
    est = estimates_df(spark, states, "kmv_doc").toPandas()
    con = duckdb.connect()
    exact = dict(
        con.execute(
            f"SELECT source, count(distinct doc_id) FROM read_parquet('{seq_small_dir}/*/*.parquet', hive_partitioning=1) GROUP BY 1"
        ).fetchall()
    )
    for _, r in est.iterrows():
        e = exact[r["group"]]
        if r["rse_bound"] == 0.0:
            assert r["estimate"] == e  # below-k groups are exact
        else:
            assert abs(r["estimate"] - e) / e <= 3 * r["rse_bound"]


def test_multicol_group_states_equal_concat_column(spark, seq_tiny_dir):
    """SURVEY A9 multi-column GROUP BY: sketching with group_by=[a, b] must
    produce states BYTE-IDENTICAL to sketching a pre-concatenated key column
    (the kernel's composite factorize is just a faster spelling of concat),
    including null group values."""
    from pyspark.sql import functions as F

    from sketchlib.spark.build import group_key_expr

    df = spark.read.parquet(seq_tiny_dir).withColumn(
        "parity",
        F.when(F.xxhash64("doc_id") % 5 == 0, None).otherwise(
            (F.pmod(F.xxhash64("doc_id"), F.lit(2))).cast("string")
        ),
    )
    specs = [
        SketchSpec("hll_doc", "hll", "doc_id", {"p": 12}),
        SketchSpec("kll_n", "kll", "n_tok", {"k": 200}),  # order-sensitive compaction
        SketchSpec("cm_tok", "cm", "tokens", {"eps": 1e-3, "delta": 0.05}),
    ]
    multi = build_sketches(df, specs, group_by=["source", "parity"])
    concat = build_sketches(
        df.withColumn("_g", group_key_expr(["source", "parity"])), specs, group_by="_g"
    )
    a = {(r["group"], r["sketch"]): bytes(r["state"]) for r in multi.collect()}
    b = {(r["group"], r["sketch"]): bytes(r["state"]) for r in concat.collect()}
    assert a.keys() == b.keys() and len(a) == 5 * 3 * 3  # 5 sources × {0,1,null} × 3 specs
    assert a == b


def test_multicol_group_shuffle_strategy_matches_map(spark, seq_tiny_dir):
    from pyspark.sql import functions as F

    df = spark.read.parquet(seq_tiny_dir).withColumn(
        "parity", F.pmod(F.xxhash64("doc_id"), F.lit(2)).cast("string")
    )
    specs = [SketchSpec("hll_doc", "hll", "doc_id", {"p": 12})]
    m = build_sketches(df, specs, group_by=["source", "parity"], strategy="map")
    s = build_sketches(df, specs, group_by=["source", "parity"], strategy="shuffle", n_salts=4)
    assert {(r["group"], bytes(r["state"])) for r in m.collect()} == {
        (r["group"], bytes(r["state"])) for r in s.collect()
    }
