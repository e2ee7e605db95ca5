"""Sketch catalog (A2/A3/A5 analogs) + sketch-level union (A17)."""

import numpy as np
import pytest

from sketchlib.spark import SketchSpec
from sketchlib.spark.catalog import SketchCatalog
from sketchlib.spark.query import estimates_df, union_estimate

SPECS = [
    SketchSpec("hll_doc", "hll", "doc_id", {"p": 12}),
    SketchSpec("kll_ntok", "kll", "n_tok", {"k": 200}),
]


def test_create_list_query_drop(spark, seq_tiny_dir, tmp_path):
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("tiny", seq_tiny_dir, SPECS, group_by="source")
    assert cat.exists("tiny")

    listed = cat.list().collect()
    assert len(listed) == 1 and listed[0]["name"] == "tiny"
    assert listed[0]["rows"] == 2000
    assert listed[0]["n_states"] == 10  # 5 sources x 2 sketches

    # A5: answer from persisted states only — no base-table access
    est = estimates_df(spark, cat.states("tiny"), "hll_doc").toPandas()
    assert set(est["group"]) == {"web", "books", "code", "wiki", "forums"}

    with pytest.raises(ValueError, match="already exists"):
        cat.create("tiny", seq_tiny_dir, SPECS)
    cat.create("tiny", seq_tiny_dir, SPECS[:1], overwrite=True)
    assert cat.states("tiny").count() == 5

    cat.drop("tiny")
    assert not cat.exists("tiny")
    assert cat.list().count() == 0
    with pytest.raises(ValueError, match="unknown sketch set"):
        cat.states("tiny")


def test_union_estimate_equals_global_sketch(spark, seq_tiny_dir):
    """Merging per-group states == sketching the whole table (set-union law)."""
    from sketchlib.spark import build_sketches

    df = spark.read.parquet(seq_tiny_dir)
    per_group = build_sketches(df, SPECS[:1], group_by="source")
    est_union, rse = union_estimate(per_group, "hll_doc")
    whole = build_sketches(df, SPECS[:1], group_by=None)
    from sketchlib.spark.query import load_states

    est_whole, _ = load_states(whole)[("", "hll_doc")].estimate()
    assert est_union == pytest.approx(est_whole)  # identical registers
    assert abs(est_union - 2000) / 2000 <= 3 * rse

    partial = union_estimate(per_group, "hll_doc", groups=["web", "books"])[0]
    assert partial < est_union


def test_io_shim_parquet_and_iceberg_gate(spark, seq_tiny_dir):
    from sketchlib.spark.io import has_iceberg, read_input

    df = read_input(spark, seq_tiny_dir)
    assert df.count() == 2000
    if not has_iceberg(spark):  # this sandbox: no connector jar
        with pytest.raises(RuntimeError, match="Iceberg connector"):
            read_input(spark, "iceberg:db.tbl")


def test_intersection_estimate_from_sketches(spark, seq_tiny_dir):
    """|A ∩ B| of token vocabularies from HLL+MinHash states vs exact."""
    from sketchlib.spark import build_sketches
    from sketchlib.spark.query import intersection_estimate

    df = spark.read.parquet(seq_tiny_dir)
    specs = [
        SketchSpec("hll_tok", "hll", "tokens", {"p": 14}),
        SketchSpec("mh_tok", "minhash", "tokens", {"r": 256}),
    ]
    states = build_sketches(df, specs, group_by="source")
    est, bound = intersection_estimate(states, "hll_tok", "mh_tok", "books", "web")

    import duckdb

    con = duckdb.connect()
    exact = con.execute(
        f"""
        WITH a AS (SELECT DISTINCT unnest(tokens) t FROM read_parquet('{seq_tiny_dir}/*/*.parquet', hive_partitioning=1) WHERE source='books'),
             b AS (SELECT DISTINCT unnest(tokens) t FROM read_parquet('{seq_tiny_dir}/*/*.parquet', hive_partitioning=1) WHERE source='web')
        SELECT count(*) FROM a JOIN b USING (t)
        """
    ).fetchone()[0]
    assert abs(est - exact) / exact <= 4 * bound, (est, exact, bound)


def test_exact_rescore_topk_matches_true_topk(spark, seq_tiny_dir):
    """Hybrid CM→exact rescoring returns the TRUE top-k (not an estimate)."""
    import duckdb

    from sketchlib.spark import build_sketches
    from sketchlib.spark.query import exact_rescore_topk

    df = spark.read.parquet(seq_tiny_dir)
    states = build_sketches(
        df, [SketchSpec("cm_tok", "cm", "tokens", {"eps": 1e-4, "delta": 0.01})], group_by="source"
    )
    got = exact_rescore_topk(df, states, "cm_tok", k=5).toPandas()

    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT source AS "group", tok AS token, c AS exact_count FROM (
          SELECT source, tok, count(*) c,
                 row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, tok) rn
          FROM (SELECT source, unnest(tokens) tok
                FROM read_parquet('{seq_tiny_dir}/*/*.parquet', hive_partitioning=1))
          GROUP BY source, tok
        ) WHERE rn <= 5
        """
    ).fetchdf()
    g = got.sort_values(["group", "token"]).reset_index(drop=True)
    w = want.sort_values(["group", "token"]).reset_index(drop=True)
    assert len(g) == len(w) == 25
    assert (g["token"].to_numpy() == w["token"].to_numpy()).all()
    assert (g["exact_count"].to_numpy() == w["exact_count"].to_numpy()).all()


def test_difference_estimate_from_sketches(spark, seq_tiny_dir):
    import duckdb

    from sketchlib.spark import build_sketches
    from sketchlib.spark.query import difference_estimate

    df = spark.read.parquet(seq_tiny_dir)
    specs = [
        SketchSpec("hll_tok", "hll", "tokens", {"p": 14}),
        SketchSpec("mh_tok", "minhash", "tokens", {"r": 256}),
    ]
    states = build_sketches(df, specs, group_by="source")
    est, bound = difference_estimate(states, "hll_tok", "mh_tok", "web", "books")
    con = duckdb.connect()
    exact = con.execute(
        f"""
        WITH a AS (SELECT DISTINCT unnest(tokens) t FROM read_parquet('{seq_tiny_dir}/*/*.parquet', hive_partitioning=1) WHERE source='web'),
             b AS (SELECT DISTINCT unnest(tokens) t FROM read_parquet('{seq_tiny_dir}/*/*.parquet', hive_partitioning=1) WHERE source='books')
        SELECT count(*) FROM a ANTI JOIN b USING (t)
        """
    ).fetchone()[0]
    assert abs(est - exact) <= 4 * bound, (est, exact, bound)


def test_list_returns_newest_registration_after_overwrite(spark, tmp_path, seq_tiny_dir):
    """The append-only log holds both registrations after overwrite=True;
    list() must return the newest (max built_unix), not an arbitrary row."""
    import json

    from sketchlib.spark.catalog import SketchCatalog

    cat = SketchCatalog(spark, str(tmp_path / "cat_ow"))
    cat.create("s", seq_tiny_dir, [SketchSpec("h", "hll", "doc_id", {"p": 10})], group_by="source")
    cat.create(
        "s", seq_tiny_dir, [SketchSpec("h", "hll", "doc_id", {"p": 12})],
        group_by="source", overwrite=True,
    )
    rows = cat.list().collect()
    assert len(rows) == 1
    assert json.loads(rows[0]["specs_json"])[0]["params"]["p"] == 12


def test_create_sample_and_query_without_base(spark, tmp_path, seq_tiny_dir):
    """A2 literal: persisted uniform + universe scrambles answer the sampling
    aggregates with the base table DELETED — the Verdict product shape."""
    import shutil

    from sketchlib.sql import approx_sql
    from sketchlib.spark.catalog import SketchCatalog

    base = str(tmp_path / "base_s")
    shutil.copytree(seq_tiny_dir, base)
    cat = SketchCatalog(spark, str(tmp_path / "cat_s"))
    cat.create_sample("u", base, kind="uniform", ratio=0.5, seed=7)
    cat.create_sample("d", base, kind="universe", ratio=0.5, on="doc_id", seed=7)

    # exact answers captured BEFORE deleting the base
    import pyspark.sql.functions as F

    df = spark.read.parquet(base)
    exact = {
        r["source"]: (r["n"], r["s"])
        for r in df.groupBy("source").agg(
            F.count("*").alias("n"), F.sum("n_tok").alias("s")
        ).collect()
    }
    exact_distinct = df.select(F.countDistinct("doc_id")).collect()[0][0]
    shutil.rmtree(base)

    out = approx_sql(
        spark, "SELECT APPROX_SUM(n_tok, 0.5) FROM whatever GROUP BY source",
        catalog=cat, catalog_key="u",
    ).toPandas()
    for _, r in out.iterrows():
        n, s = exact[r["source"]]
        assert abs(r["est_sum"] - s) <= 2 * r["sum_err"]  # z=1.96 default, allow 2x

    cd = approx_sql(
        spark, "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM whatever",
        catalog=cat, catalog_key="d",
    ).collect()[0]
    assert abs(cd["est_distinct"] - exact_distinct) <= 2 * cd["distinct_err"]

    # mismatches raise: wrong kind for the aggregate
    import pytest as _pytest

    with _pytest.raises(ValueError, match="uniform or stratified sample"):
        approx_sql(spark, "SELECT APPROX_SUM(n_tok, 0.5) FROM t GROUP BY source",
                   catalog=cat, catalog_key="d")
    with _pytest.raises(ValueError, match="universe sample"):
        approx_sql(spark, "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM t",
                   catalog=cat, catalog_key="u")

    meta = cat.sample_meta("u")
    assert meta["kind"] == "uniform" and meta["ratio"] == 0.5
    assert {r["name"] for r in cat.list_samples().collect()} == {"u", "d"}
    cat.drop_sample("u")
    assert not cat.sample_exists("u") and cat.sample_exists("d")


def test_stratified_persisted_sample_served_by_sql(spark, tmp_path, seq_tiny_dir):
    """Third Verdict sample type persisted + served: small groups at
    fraction 1.0 answer EXACTLY (err 0), the hot group within CI."""
    import pyspark.sql.functions as F

    from sketchlib.sql import approx_sql
    from sketchlib.spark.catalog import SketchCatalog

    df = spark.read.parquet(seq_tiny_dir)
    fracs = {"web": 0.3, "books": 1.0, "code": 1.0, "wiki": 1.0, "forums": 1.0}
    cat = SketchCatalog(spark, str(tmp_path / "cat_st"))
    cat.create_sample("st", seq_tiny_dir, kind="stratified", on="source", fractions=fracs, seed=7)

    exact = {
        r["source"]: r["n"] for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    out = approx_sql(
        spark, "SELECT APPROX_COUNT(0.0) FROM t GROUP BY source", catalog=cat, catalog_key="st"
    ).toPandas()
    for _, r in out.iterrows():
        if fracs[r["source"]] == 1.0:
            assert r["est_count"] == exact[r["source"]] and r["count_err"] == 0.0
        else:
            assert abs(r["est_count"] - exact[r["source"]]) <= 2 * r["count_err"]

    # GROUP BY must match the stratification key
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keyed by"):
        approx_sql(spark, "SELECT APPROX_COUNT(0.0) FROM t GROUP BY lang",
                   catalog=cat, catalog_key="st")


def test_incremental_refresh(spark, tmp_path):
    """catalog.refresh sketches ONLY files appended since the last build and
    merges them in: byte-identical to a from-scratch rebuild for the
    order-free sketches (HLL register-max, CM counter-add), estimate-level
    identical for KLL; covered-file deletion raises (states can't subtract)."""
    import glob
    import os
    import shutil as sh

    import numpy as np

    from sketchlib.data.gen import write_sequences
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.spark.query import quantiles_df
    from sketchlib.spark.scan import build_sketches_from_parquet
    from sketchlib.sql import approx_sql

    d = str(tmp_path / "seq")
    write_sequences(d, 2000, seed=1)
    specs = [
        SketchSpec("h", "hll", "doc_id", {"p": 12}),
        SketchSpec("c", "cm", "tokens", {"eps": 1e-3, "delta": 0.01}),
        SketchSpec("k", "kll", "n_tok", {"k": 200}),
    ]
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create("s", d, specs, group_by="source")
    assert cat.refresh("s") == {"new_files": 0, "rows_added": 0, "tokens_added": 0}

    d2 = str(tmp_path / "seq2")
    write_sequences(d2, 1000, seed=2)
    n_copied = 0
    for f in glob.glob(d2 + "/source=*/part-*.parquet"):
        rel = os.path.relpath(f, d2)
        dst = os.path.join(d, os.path.dirname(rel), "appended-" + os.path.basename(f))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        sh.copy(f, dst)
        n_copied += 1
    stats = cat.refresh("s")
    assert stats["new_files"] == n_copied
    assert stats["rows_added"] == 1000 and stats["tokens_added"] > 0

    full = build_sketches_from_parquet(spark, d, specs, group_by="source")
    full_pd, got_pd = full.toPandas(), cat.states("s").toPandas()
    fk = {(r["group"], r["sketch"]): bytes(r["state"]) for _, r in full_pd.iterrows()}
    gk = {(r["group"], r["sketch"]): bytes(r["state"]) for _, r in got_pd.iterrows()}
    assert set(fk) == set(gk)
    for (g, sk), st in fk.items():
        if sk in ("h", "c"):  # semilattice states: canonical bytes
            assert gk[(g, sk)] == st, f"{sk} state for {g} differs after refresh"
    qf = quantiles_df(spark, full, "k", [0.5, 0.9]).toPandas().sort_values(["group", "q"])
    qg = quantiles_df(spark, cat.states("s"), "k", [0.5, 0.9]).toPandas().sort_values(["group", "q"])
    assert np.allclose(qf["value"].values, qg["value"].values, rtol=0.05)

    # REFRESH SKETCHES through the SQL front door; second refresh is a no-op
    out = approx_sql(spark, "REFRESH SKETCHES s", catalog=cat).collect()[0]
    assert out["name"] == "s" and out["new_files"] == 0

    # deleting a covered file breaks the append-only contract
    victim = glob.glob(d + "/source=*/part-*.parquet")[0]
    os.remove(victim)
    with pytest.raises(ValueError, match="cannot subtract"):
        cat.refresh("s")


def test_sample_incremental_refresh(spark, tmp_path):
    """refresh_sample applies the registered sampling rule to ONLY the
    appended files and appends survivors: universe refresh is
    content-deterministic (exactly re-sampling the grown dir), uniform
    refresh keeps estimates within CI for the grown table, and REFRESH
    SAMPLE works through the SQL front door."""
    import glob
    import os
    import shutil as sh

    from pyspark.sql import functions as F

    from sketchlib.data.gen import write_sequences
    from sketchlib.spark.catalog import SketchCatalog
    from sketchlib.spark.sampling import universe_sample
    from sketchlib.sql import approx_sql

    d = str(tmp_path / "seq")
    write_sequences(d, 2000, seed=1)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create_sample("u", d, kind="uniform", ratio=0.5, seed=7)
    cat.create_sample("v", d, kind="universe", ratio=0.5, on="doc_id", seed=7)
    assert cat.refresh_sample("u") == {"new_files": 0, "rows_added": 0}

    d2 = str(tmp_path / "seq2")
    write_sequences(d2, 1000, seed=2)
    for f in glob.glob(d2 + "/source=*/part-*.parquet"):
        rel = os.path.relpath(f, d2)
        dst = os.path.join(d, os.path.dirname(rel), "appended-" + os.path.basename(f))
        sh.copy(f, dst)

    stats_u = cat.refresh_sample("u")
    assert stats_u["new_files"] > 0 and stats_u["rows_added"] > 0
    stats_v = cat.refresh_sample("v")

    # universe: hash rule is content-keyed → refreshed sample row-set equals
    # re-sampling the grown dir from scratch
    grown = spark.read.parquet(d)
    expect = universe_sample(grown, "doc_id", 0.5, seed=7)
    got = cat.sample("v")
    assert got.count() == expect.count()
    assert got.select("doc_id").subtract(expect.select("doc_id")).count() == 0

    # uniform: estimates from the refreshed scramble cover the GROWN table
    est = approx_sql(
        spark, "SELECT APPROX_COUNT(0.5) FROM ignored", {"ignored": d},
        catalog=cat, catalog_key="u",
    ).collect()[0]
    n_exact = grown.count()
    assert abs(est["est_count"] - n_exact) <= est["count_err"] * (3.29 / 1.96)

    # SQL front door; second refresh is a no-op
    out = approx_sql(spark, "REFRESH SAMPLE v", catalog=cat).collect()[0]
    assert out["name"] == "v" and out["new_files"] == 0


def test_signature_registry_lifecycle(spark, tmp_path, seq_tiny_dir):
    """Signature tables get the full catalog lifecycle (VERDICT r4 #1):
    CREATE persists the (r, n_bands, seed) contract; REFRESH signs only
    appended files byte-identically to a rebuild; dedup_delta(catalog=...)
    reads the contract and REFUSES a conflicting explicit seed;
    append_signatures rejects rows whose shape breaks the contract."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from sketchlib.spark.dedup import dedup_delta, minhash_signatures
    from sketchlib.sql import approx_sql

    src = spark.read.parquet(seq_tiny_dir)
    data = str(tmp_path / "corpus")
    src.filter(F.xxhash64("doc_id") % 2 == 0).coalesce(2).write.parquet(data)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))

    sigs = cat.create_signatures("s", data, r=64, n_bands=16, seed=9)
    meta = cat.sig_meta("s")
    assert (meta["r"], meta["n_bands"], meta["seed"]) == (64, 16, 9)
    assert sigs.count() == meta["rows"] > 0

    # refresh signs exactly the appended files, content-identically to a
    # fresh signing of those rows under the registered contract
    extra_dir = str(tmp_path / "extra")
    extra = src.filter(F.xxhash64("doc_id") % 2 != 0).limit(50).cache()
    n_extra = extra.count()
    extra.coalesce(1).write.parquet(extra_dir)
    for i, f in enumerate(sorted(glob.glob(extra_dir + "/part-*.parquet"))):
        shutil.copy(f, f"{data}/appended-{i:04d}.parquet")
    stats = cat.refresh_signatures("s")
    assert stats["new_files"] == 1 and stats["rows_added"] == n_extra
    want = minhash_signatures(extra, "tokens", "doc_id", r=64, n_bands=16, seed=9)
    got = cat.signatures("s").join(extra.select("doc_id"), "doc_id", "leftsemi")
    wp = {r["doc_id"]: (r["sig"], r["bands"]) for r in want.collect()}
    gp = {r["doc_id"]: (r["sig"], r["bands"]) for r in got.collect()}
    assert wp == gp
    assert cat.refresh_signatures("s") == {"new_files": 0, "rows_added": 0}

    # contract enforcement: conflicting seed refused, matching seed allowed
    delta = src.orderBy("doc_id").limit(20)
    with pytest.raises(ValueError, match="seed"):
        dedup_delta(delta, catalog=cat, catalog_key="s", seed=999)
    with pytest.raises(ValueError, match="existing_sigs"):
        dedup_delta(delta, minhash_signatures(delta, "tokens", "doc_id"),
                    catalog=cat, catalog_key="s")
    kept, kept_sigs = dedup_delta(delta, catalog=cat, catalog_key="s", seed=9)
    assert kept.count() == kept_sigs.count()

    # shape guard: appending signatures signed under a DIFFERENT contract raises
    bad = minhash_signatures(delta, "tokens", "doc_id", r=32, n_bands=8, seed=9)
    with pytest.raises(ValueError, match="registered with"):
        cat.append_signatures("s", bad)
    before = cat.sig_meta("s")["rows"]
    cat.append_signatures("s", kept_sigs)
    assert cat.sig_meta("s")["rows"] == before + kept_sigs.count()

    # SQL front door: SHOW lists it, DROP removes it, head-only claiming
    shown = approx_sql(spark, "SHOW SIGNATURES", catalog=cat).collect()
    assert [r["name"] for r in shown] == ["s"]
    out = approx_sql(spark, "DROP SIGNATURES s", catalog=cat).collect()[0]
    assert out["dropped"] is True and not cat.sig_exists("s")
    extra.unpersist()


def test_refresh_after_drop_refuses_resurrection(spark, tmp_path, seq_tiny_dir):
    """The append-only registry keeps a DROPPED artifact's stale row —
    refresh/append on it must refuse instead of silently resurrecting a
    PARTIAL table whose lineage claims full coverage (for signatures that
    would mean dedup_delta keeping every duplicate of the missing docs)."""
    import glob
    import shutil

    from sketchlib.spark.dedup import minhash_signatures

    src = spark.read.parquet(seq_tiny_dir)
    data = str(tmp_path / "corpus")
    src.limit(100).coalesce(1).write.parquet(data)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))

    cat.create_signatures("s", data, r=32, n_bands=8, seed=3)
    sigs = minhash_signatures(src.limit(5), "tokens", "doc_id", r=32, n_bands=8, seed=3)
    cat.drop_signatures("s")
    with pytest.raises(ValueError, match="no data on disk"):
        cat.refresh_signatures("s")
    with pytest.raises(ValueError, match="no data on disk"):
        cat.append_signatures("s", sigs)

    cat.create_sample("v", data, kind="uniform", ratio=0.5, seed=3)
    cat.drop_sample("v")
    with pytest.raises(ValueError, match="no data on disk"):
        cat.refresh_sample("v")


def test_dedup_delta_catalog_column_conflicts_refused(spark, tmp_path, seq_tiny_dir):
    """The registry owns the WHOLE signing contract: explicitly-passed
    tokens_col/id_col that conflict with the registered ones raise (a
    silently overridden id column keys signatures on the wrong data)."""
    from sketchlib.spark.dedup import dedup_delta

    src = spark.read.parquet(seq_tiny_dir)
    data = str(tmp_path / "corpus")
    src.limit(80).coalesce(1).write.parquet(data)
    cat = SketchCatalog(spark, str(tmp_path / "cat"))
    cat.create_signatures("s", data, r=32, n_bands=8, seed=3)
    delta = src.orderBy("doc_id").limit(10)
    with pytest.raises(ValueError, match="id_col"):
        dedup_delta(delta, catalog=cat, catalog_key="s", id_col="other_id")
    with pytest.raises(ValueError, match="tokens_col"):
        dedup_delta(delta, catalog=cat, catalog_key="s", tokens_col="other_toks")
    # matching explicit values still pass
    kept, _ = dedup_delta(
        delta, catalog=cat, catalog_key="s", tokens_col="tokens", id_col="doc_id"
    )
    assert kept.count() >= 0


def test_registry_row_cache_equivalence_and_invalidation(spark, tmp_path):
    """The cache-served row APIs (list_rows/list_sample_rows/_registry_meta)
    must equal the DataFrame registry views at every lifecycle step —
    create, overwrite, drop — including mutations made through a SECOND
    catalog instance on the same root (the listing fingerprint, not
    in-process state, is the invalidation key)."""
    from sketchlib.spark.catalog import SketchCatalog

    root = str(tmp_path / "cat")
    cat = SketchCatalog(spark, root)
    other = SketchCatalog(spark, root)
    df = spark.range(2000).selectExpr("CAST(id AS STRING) AS k", "id AS v")
    base = str(tmp_path / "t")
    df.write.parquet(base)

    def assert_synced():
        via_df = sorted(
            [r.asDict() for r in cat.list_samples().collect()], key=lambda r: r["name"]
        )
        via_rows = sorted(
            [r.asDict() for r in cat.list_sample_rows()], key=lambda r: r["name"]
        )
        assert via_rows == via_df

    assert cat.list_sample_rows() == []
    cat.create_sample("s1", base, kind="uniform", ratio=0.5)
    assert_synced()
    assert {r["name"] for r in cat.list_sample_rows()} == {"s1"}
    # warm the cache, then mutate through the OTHER instance
    other.create_sample("s2", base, kind="uniform", ratio=0.3)
    assert {r["name"] for r in cat.list_sample_rows()} == {"s1", "s2"}
    assert_synced()
    # overwrite: newest registration must win in both views
    cat.create_sample("s1", base, kind="uniform", ratio=0.7, overwrite=True)
    assert float(cat.sample_meta("s1")["ratio"]) == 0.7
    assert_synced()
    other.drop_sample("s2")
    assert {r["name"] for r in cat.list_sample_rows()} == {"s1"}
    assert_synced()
    # sketch-set registry shares the same machinery
    from sketchlib.spark.build import SketchSpec

    cat.create("st1", base, [SketchSpec("h", "hll", "k", {"p": 10})], group_by=None)
    assert {r["name"] for r in cat.list_rows()} == {"st1"}
    assert [r.asDict() for r in cat.list_rows()] == [
        r.asDict() for r in cat.list().collect()
    ]


def test_refresh_local_merge_matches_pipeline(spark, tmp_path, monkeypatch):
    """The driver-local refresh merge (r6: collect delta partials + pyarrow
    read/write, no merge Exchange) must produce BYTE-IDENTICAL state tables
    to the Spark-pipeline path — same canonical (part_id, state bytes)
    merge order — and the fallback must engage when the estimate overflows
    the byte budget."""
    import glob
    import os
    import shutil as sh

    from sketchlib.data.gen import write_sequences
    from sketchlib.spark.build import SketchSpec
    from sketchlib.spark.catalog import SketchCatalog

    specs = [
        SketchSpec("h", "hll", "doc_id", {"p": 12}),
        SketchSpec("c", "cm", "tokens", {"eps": 1e-3, "delta": 0.01}),
        SketchSpec("k", "kll", "n_tok", {"k": 200}),
    ]
    d = str(tmp_path / "seq")
    write_sequences(d, 2000, seed=5)
    d2 = str(tmp_path / "delta")
    write_sequences(d2, 800, seed=6)

    def build_and_refresh(root, budget):
        cat = SketchCatalog(spark, root)
        monkeypatch.setattr(SketchCatalog, "_LOCAL_REFRESH_BYTES", budget)
        dd = root + "_data"
        sh.copytree(d, dd)
        cat.create("s", dd, specs, group_by="source")
        for f in glob.glob(d2 + "/source=*/part-*.parquet"):
            rel = os.path.relpath(f, d2)
            dst = os.path.join(dd, os.path.dirname(rel), "ap-" + os.path.basename(f))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            sh.copy(f, dst)
        stats = cat.refresh("s")
        rows = {
            (r["group"], r["sketch"]): (bytes(r["state"]), r["n_items"], r["rows"], r["tokens"])
            for r in cat.states("s").collect()
        }
        return stats, rows

    s_local, local = build_and_refresh(str(tmp_path / "c1"), 256 << 20)
    s_pipe, pipe = build_and_refresh(str(tmp_path / "c2"), 0)  # force fallback
    assert s_local == s_pipe
    assert local == pipe  # byte-identical states, both routes
