"""Multimodal plumbing (schema/batching real, codec faked — container has no
media libs) and the spark-submit CLI surface."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from sketchlib.spark.multimodal import FakeCodec, decode_features, metadata_stats, synth_media_df


def test_metadata_stats_never_reads_payload(spark):
    df = synth_media_df(spark, 64)
    stats = metadata_stats(df)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    rows = stats.collect()
    assert rows[0]["n"] == 64
    assert rows[0]["min_w"] >= 16
    # struct pruning: payload must not appear in the plan's read schema
    assert "payload" not in plan


def test_decode_features_deterministic_and_shaped(spark):
    df = synth_media_df(spark, 32)
    feats = decode_features(df, codec=FakeCodec()).orderBy("media_id").collect()
    assert len(feats) == 32
    for r in feats:
        assert len(r["feat"]) == 6  # 3 channel means + 3 channel stds
        assert 0 <= r["mean_lum"] <= 255
    again = decode_features(df, codec=FakeCodec()).orderBy("media_id").collect()
    assert [list(r["feat"]) for r in feats] == [list(r["feat"]) for r in again]


def test_decode_without_codec_raises(spark):
    df = synth_media_df(spark, 4)
    with pytest.raises(NotImplementedError, match="codec"):
        decode_features(df)


def test_fake_codec_pure_function():
    c = FakeCodec()
    a = c.decode(b"payload-bytes", 16, 8)
    b = c.decode(b"payload-bytes", 16, 8)
    assert a.shape == (8, 16, 3) and a.dtype == np.uint8
    assert (a == b).all()
    assert not (a == c.decode(b"other-bytes!!", 16, 8)).all()


def test_cli_build_query_lineage(seq_tiny_dir, tmp_path):
    """Drive the CLI end-to-end in a subprocess (the spark-submit surface)."""
    out_dir = str(tmp_path / "states")
    ckpt = str(tmp_path / "ckpt")
    env_build = [
        sys.executable, "-m", "sketchlib.cli", "build",
        "--input", seq_tiny_dir, "--group-by", "source",
        "--sketches", "hll_doc:hll:doc_id", 'cm_tok:cm:tokens:{"eps": 0.001, "delta": 0.05}',
        "--out", out_dir, "--checkpoint", ckpt,
    ]
    r = subprocess.run(env_build, capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    built = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert built["states_written"] == 10  # 5 sources x 2 sketches

    r2 = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "query", "--states", out_dir, "--sketch", "hll_doc"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    ests = [json.loads(l) for l in r2.stdout.splitlines() if l.startswith("{")]
    assert {e["group"] for e in ests} == {"web", "books", "code", "wiki", "forums"}

    r3 = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "lineage", "--checkpoint", ckpt],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    m = json.loads([l for l in r3.stdout.splitlines() if l.startswith("{")][-1])
    assert m["rows"] == 2000 and m["tokens_per_cpu_sec"] > 0


def test_sample_frames_deterministic_and_bounded(spark):
    from sketchlib.spark.multimodal import FakeCodec, sample_frames, synth_media_df

    df = synth_media_df(spark, n_rows=24).cache()
    out = sample_frames(df, codec=FakeCodec(), k=4).toPandas()
    meta = {r["media_id"]: r["media"]["n_frames"] for r in df.collect()}
    per = out.groupby("media_id")
    for mid, sub in per:
        assert len(sub) == min(4, meta[mid])  # min(k, n_frames) rows per video
        assert sub["frame_idx"].is_unique
        assert (sub["frame_idx"] < meta[mid]).all() and (sub["frame_idx"] >= 0).all()
    # deterministic across runs
    out2 = sample_frames(df, codec=FakeCodec(), k=4).toPandas()
    a = out.sort_values(["media_id", "frame_idx"], ignore_index=True)
    b = out2.sort_values(["media_id", "frame_idx"], ignore_index=True)
    assert a.equals(b)


def test_sample_frames_requires_codec(spark):
    import pytest as _pytest

    from sketchlib.spark.multimodal import sample_frames, synth_media_df

    with _pytest.raises(NotImplementedError):
        sample_frames(synth_media_df(spark, n_rows=2), codec=None)


def test_cli_sql_lifecycle(seq_tiny_dir, tmp_path):
    """The spark-submit `sql` surface end-to-end in subprocesses: DDL builds
    a sketch set, the approx statement auto-routes to it, and an exact
    statement passes through."""
    import json as _json

    cat = str(tmp_path / "cat")

    def run(stmt, *extra):
        r = subprocess.run(
            [sys.executable, "-m", "sketchlib.cli", "sql", stmt,
             "--tables", f"sequences={seq_tiny_dir}", "--catalog", cat, *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [_json.loads(line) for line in r.stdout.splitlines() if line.startswith("{")]

    run("CREATE SKETCHES sq FROM sequences KINDS hll(doc_id, p=12) GROUP BY source")
    rows = run("SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source")
    assert len(rows) == 5 and abs(sum(r["estimate"] for r in rows) - 2000) / 2000 < 0.1
    exact = run("SELECT source, COUNT(*) AS n FROM sequences GROUP BY source ORDER BY source")
    assert sum(r["n"] for r in exact) == 2000


def test_spark_submit_py_files(seq_tiny_dir, tmp_path):
    """The north rule's literal launch path: `spark-submit --py-files
    sketchlib.zip` from a cwd OUTSIDE the repo — the zip is the only way
    executors (and the driver) can import sketchlib."""
    import json as _json
    import shutil
    import zipfile

    if not shutil.which("spark-submit"):
        import pytest

        pytest.skip("spark-submit not on PATH")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(repo, "sketchlib")
    zf = str(tmp_path / "sketchlib.zip")
    with zipfile.ZipFile(zf, "w") as z:
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, os.path.dirname(src)))
    entry = str(tmp_path / "cli_entry.py")
    shutil.copy(os.path.join(src, "cli.py"), entry)

    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zf, entry, "sql",
         "SELECT APPROX_COUNT_DISTINCT(doc_id) FROM sequences GROUP BY source",
         "--tables", f"sequences={seq_tiny_dir}"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [_json.loads(line) for line in r.stdout.splitlines() if line.startswith("{")]
    assert len(rows) == 5
    assert abs(sum(x["estimate"] for x in rows) - 2000) / 2000 < 0.1


def test_cli_dedup_delta(spark, seq_tiny_dir, tmp_path):
    """The daily dedup operation as ONE CLI command: sign the corpus via
    SIGNATURES DDL, then `dedup-delta` dedups a delta dir against the
    registered table (seed contract from the registry), writes the kept
    rows, and appends the kept signatures — re-running the same delta then
    keeps 0 (the loop is closed)."""
    import json as _json

    from pyspark.sql import functions as F

    cat = str(tmp_path / "cat")
    corpus_dir = str(tmp_path / "corpus")
    delta_dir = str(tmp_path / "delta")
    src = spark.read.parquet(seq_tiny_dir)
    src.limit(300).coalesce(1).write.parquet(corpus_dir)
    fresh = (
        src.orderBy(F.desc("doc_id")).limit(50)
        .join(src.limit(300).select("doc_id"), "doc_id", "left_anti")
    )
    copies = src.limit(20).withColumn("doc_id", F.concat(F.lit("dup_"), F.col("doc_id")))
    fresh.unionByName(copies).coalesce(1).write.parquet(delta_dir)
    n_fresh = fresh.count()

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "sketchlib.cli", *argv],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [_json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]

    run("sql", "CREATE SIGNATURES s FROM corpus ON tokens ID doc_id R 64 BANDS 16 SEED 5",
        "--tables", f"corpus={corpus_dir}", "--catalog", cat)
    out1 = run("dedup-delta", "--input", delta_dir, "--catalog", cat,
               "--signatures", "s", "--out", str(tmp_path / "kept1"),
               "--threshold", "0.9")[0]
    assert out1["kept_rows"] == n_fresh and out1["signatures_appended"] == n_fresh
    kept = spark.read.parquet(str(tmp_path / "kept1"))
    assert kept.filter(F.col("doc_id").startswith("dup_")).count() == 0
    # replay: the appended signatures make the same delta fully deduped
    out2 = run("dedup-delta", "--input", delta_dir, "--catalog", cat,
               "--signatures", "s", "--out", str(tmp_path / "kept2"),
               "--threshold", "0.9", "--no-append")[0]
    assert out2["kept_rows"] == 0


def test_cli_curate_and_shard(spark, tmp_path):
    """The corpus-release subcommands end-to-end in a subprocess."""
    src = str(tmp_path / "docs")
    df = spark.createDataFrame(
        [
            (1, "real content one\nSubscribe now\nmail a@b.io"),
            (2, "real content two\nSubscribe now"),
            (3, "real content three\nSubscribe now"),
        ],
        "doc_id long, text string",
    )
    df.write.parquet(src)

    out = str(tmp_path / "clean")
    r = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "curate",
         "--input", src, "--out", out, "--min-line-count", "3"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["pii"]["email"]["n_matches"] == 1
    assert summary["line_dedup"]["n_heavy_lines"] == 1  # 'Subscribe now'
    got = {r_["doc_id"]: r_["text"] for r_ in spark.read.parquet(out).collect()}
    assert got[1] == "real content one\nmail <EMAIL>"
    assert got[2] == "real content two"

    shards = str(tmp_path / "shards")
    r2 = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "shard",
         "--input", out, "--out", shards, "--n-shards", "2", "--seed", "5"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    info = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert info["rows"] == 3
    sharded = spark.read.parquet(shards)
    assert set(sharded.columns) >= {"doc_id", "text", "shuffle_key", "shard"}
    # placement is the pure function of (id, seed) the operator computes
    from sketchlib.spark.packing import shuffle_shard

    expect = {r_["doc_id"]: r_["shard"] for r_ in
              shuffle_shard(df, n_shards=2, seed=5).collect()}
    got_shards = {r_["doc_id"]: r_["shard"] for r_ in sharded.collect()}
    assert got_shards == expect


def test_cli_decontaminate(spark, seq_tiny_dir, tmp_path):
    """Decontamination as ONE CLI command: a 60-token verbatim inclusion is
    flagged and dropped at the 50-token policy, a 20-token one survives,
    and the span report parquet carries the evidence."""
    import json as _json

    from pyspark.sql import functions as F

    train_dir = str(tmp_path / "train")
    eval_dir = str(tmp_path / "eval")
    src = spark.read.parquet(seq_tiny_dir)
    src.coalesce(1).write.parquet(train_dir)
    rows = src.orderBy("doc_id").limit(2).collect()
    leak_id, leak_toks = rows[0]["doc_id"], rows[0]["tokens"]
    short_id, short_toks = rows[1]["doc_id"], rows[1]["tokens"]
    eval_df = spark.createDataFrame(
        [
            ("bench0", [int(t) for t in leak_toks[:60]]),   # 60-token leak
            ("bench1", [int(t) for t in short_toks[:20]]),  # 20-token phrase
            ("bench2", [9_000_001 + i for i in range(40)]), # no overlap
        ],
        "doc_id string, tokens array<int>",
    )
    eval_df.coalesce(1).write.parquet(eval_dir)

    r = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "decontaminate",
         "--train", train_dir, "--eval", eval_dir,
         "--out", str(tmp_path / "clean"), "--min-span-tokens", "50",
         "--report-out", str(tmp_path / "report")],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = [_json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")][0]
    assert out["train_rows"] == src.count()
    assert out["flagged_docs"] == 1 and out["kept_rows"] == src.count() - 1

    clean = spark.read.parquet(str(tmp_path / "clean"))
    kept_ids = {x["doc_id"] for x in clean.select("doc_id").collect()}
    assert leak_id not in kept_ids and short_id in kept_ids

    rep = {x["train_id"]: x for x in spark.read.parquet(str(tmp_path / "report")).collect()}
    assert rep[leak_id]["max_span_tokens"] == 60
    assert rep[short_id]["max_span_tokens"] == 20
    assert "bench2" not in {x["eval_id"] for x in rep.values()}


def test_cli_mix(spark, tmp_path):
    """Both mix modes end-to-end in a subprocess: budget selection keeps the
    per-source best-score prefix; fraction mode replicates/downsamples by
    the deterministic coin (matching the operator called directly)."""
    import json as _json

    src = str(tmp_path / "docs")
    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], float(i % 10), 10) for i in range(100)],
        "doc_id long, source string, score double, n_tok int",
    )
    df.write.parquet(src)

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "sketchlib.cli", *argv],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [_json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")][-1]

    out1 = run("mix", "--input", src, "--out", str(tmp_path / "sel"),
               "--budget", "200", "--score-col", "score")
    assert out1 == {"mode": "budget", "input_rows": 100, "output_rows": 40,
                    "out": str(tmp_path / "sel")}
    sel = spark.read.parquet(str(tmp_path / "sel"))
    # 200-token budget = 20 docs/source = top 2 score classes (10 docs each);
    # source a (even ids) scores {0,2,4,6,8} -> keeps {6,8}; b keeps {7,9}
    by_src = {(r["source"], r["score"]) for r in sel.collect()}
    assert by_src == {("a", 6.0), ("a", 8.0), ("b", 7.0), ("b", 9.0)}

    out2 = run("mix", "--input", src, "--out", str(tmp_path / "up"),
               "--fractions", "a=2.5", "b=0.5", "--seed", "11")
    up = spark.read.parquet(str(tmp_path / "up"))
    from sketchlib.spark.sampling import upsample_mixture

    want = sorted(
        (r["doc_id"], r["copy"])
        for r in upsample_mixture(df, {"a": 2.5, "b": 0.5}, seed=11).collect()
    )
    assert sorted((r["doc_id"], r["copy"]) for r in up.collect()) == want
    assert out2["output_rows"] == len(want)

    # cap mode: at most 30 docs per source by top score (ties id-broken),
    # matching the operator called directly
    out3 = run("mix", "--input", src, "--out", str(tmp_path / "cap"),
               "--cap", "30", "--score-col", "score")
    assert out3["mode"] == "cap" and out3["output_rows"] == 60
    capd = spark.read.parquet(str(tmp_path / "cap"))
    from sketchlib.spark.sampling import cap_per_group

    want_cap = sorted(
        r["doc_id"] for r in cap_per_group(df, 30, group_col="source",
                                           score_col="score").collect()
    )
    assert sorted(r["doc_id"] for r in capd.collect()) == want_cap

    r = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "mix", "--input", src,
         "--out", str(tmp_path / "x")],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert r.returncode != 0 and "exactly one of" in (r.stderr + r.stdout)
    r = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "mix", "--input", src,
         "--out", str(tmp_path / "x"), "--cap", "5", "--budget", "10"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert r.returncode != 0 and "exactly one of" in (r.stderr + r.stdout)

    # weighted mode: per-source ES draw of 15 docs weighted by score,
    # matching the operator called directly (scores 0 are excluded rows)
    out4 = run("mix", "--input", src, "--out", str(tmp_path / "wk"),
               "--weighted-k", "15", "--score-col", "score", "--seed", "3")
    assert out4["mode"] == "weighted" and out4["output_rows"] == 30
    wk = spark.read.parquet(str(tmp_path / "wk"))
    from sketchlib.spark.sampling import weighted_sample

    want_w = sorted(
        r["doc_id"]
        for r in weighted_sample(df, 15, "score", group_col="source", seed=3).collect()
    )
    assert sorted(r["doc_id"] for r in wk.collect()) == want_w


def test_cli_profile(seq_tiny_dir, tmp_path):
    """`profile` prints the corpus data card: exact rows/tokens per source,
    HLL distinct-doc estimates within bound, KLL length quantiles ordered."""
    r = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "profile",
         "--input", seq_tiny_dir, "--topk", "3"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    card = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert card["corpus"]["groups"] == 5
    assert card["corpus"]["rows"] == 2000
    total = 0
    for g, row in card["per_group"].items():
        total += row["rows"]
        # doc_ids are unique -> distinct estimate within the HLL rse of rows
        assert abs(row["distinct_docs_est"] - row["rows"]) <= 3 * row["distinct_docs_rse"] * row["rows"] + 2
        q = row["token_len_quantiles"]
        assert set(q) == {"p50", "p90", "p99"} and q["p50"] <= q["p90"] <= q["p99"]
        assert row["total_tokens"] > 0
        assert len(row["top_tokens"]) == 3
        # robust spread served from the same kll_len state, bracket ordered
        mad = row["token_len_mad"]
        assert mad["mad_lo"] - 1e-9 <= mad["mad_est"] <= mad["mad_hi"] + 1e-9
        # robust center from the same state: 5%-trimmed mean length inside
        # its bracket and inside the p50/p99 span
        tm = row["token_len_trimmed_mean"]
        assert tm["tm_lo"] - 1e-9 <= tm["tm_est"] <= tm["tm_hi"] + 1e-9
        assert q["p50"] * 0.1 <= tm["tm_est"] <= q["p99"]
        # token-MASS length quantiles: longer docs hold more tokens, so
        # every weighted quantile dominates its row-population twin
        wq = row["token_mass_len_quantiles"]
        assert set(wq) == set(q)
        assert wq["p50"] >= q["p50"] and wq["p50"] <= wq["p90"] <= wq["p99"]
    assert total == card["corpus"]["rows"]


def test_cli_profile_null_group_and_quantile_labels(spark, tmp_path):
    """NULL group values must land under the kernel's '__null__' label (a
    plain str() would KeyError), mille-level quantiles must keep distinct
    labels ('p99.9', not 'p100'), and --topk without a tokens column must
    die with the command's own error."""
    src = str(tmp_path / "docs")
    rows = [(f"d{i}", None if i % 5 == 0 else "web", 10 + i % 7) for i in range(50)]
    spark.createDataFrame(rows, "doc_id string, source string, n_tok int").write.parquet(src)
    r = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "profile", "--input", src,
         "--quantiles", "0.5", "0.995", "0.999"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    card = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert set(card["per_group"]) == {"web", "__null__"}
    assert card["per_group"]["__null__"]["rows"] == 10
    assert set(card["per_group"]["web"]["token_len_quantiles"]) == {"p50", "p99.5", "p99.9"}

    r2 = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "profile", "--input", src, "--topk", "3"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r2.returncode != 0
    assert "--topk needs --tokens-col" in (r2.stderr + r2.stdout)


def test_cli_profile_bad_id_or_group_col(spark, tmp_path):
    src = str(tmp_path / "docs2")
    spark.createDataFrame(
        [("d1", "web", 5)], "doc_id string, source string, n_tok int"
    ).write.parquet(src)
    for args_, msg in (
        (["--id-col", "docid"], "--id-col 'docid'"),
        (["--group-by", "src"], "--group-by 'src'"),
    ):
        r = subprocess.run(
            [sys.executable, "-m", "sketchlib.cli", "profile", "--input", src, *args_],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode != 0
        assert msg in (r.stderr + r.stdout)


def _cli(*argv, timeout=300):
    r = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", *argv],
        capture_output=True, text=True, cwd="/root/repo", timeout=timeout,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")][0]


def test_cli_gate_exact_and_sketch(spark, tmp_path):
    """The percentile quality gate end-to-end: exact mode keeps exactly each
    group's top fraction; sketch mode answers from a persisted KLL state
    table built by the build subcommand and lands within rank error."""
    src = str(tmp_path / "docs")
    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], float(i)) for i in range(200)],
        "doc_id long, source string, score double",
    )
    df.write.parquet(src)

    out = _cli("gate", "--input", src, "--out", str(tmp_path / "kept"),
               "--score-col", "score", "--keep-top", "0.3")
    assert out["mode"] == "exact" and out["input_rows"] == 200
    assert out["kept_rows"] == 60  # exactly top 30% of each 100-row group
    kept = spark.read.parquet(str(tmp_path / "kept"))
    assert kept.agg({"score": "min"}).collect()[0][0] >= 140.0  # top 30 of each parity

    _cli("build", "--input", src, "--group-by", "source",
         "--sketches", "q:kll:score", "--out", str(tmp_path / "states"))
    out2 = _cli("gate", "--input", src, "--out", str(tmp_path / "kept2"),
                "--score-col", "score", "--keep-top", "0.3",
                "--states", str(tmp_path / "states"), "--sketch", "q")
    assert out2["mode"] == "sketch"
    # KLL rank error (k=200 default → ~0.017): boundary may shift by ±eps·100
    assert abs(out2["kept_rows"] - 60) <= 2 * (3.31 / 200) * 200 + 1


def test_cli_mix_temperature(spark, tmp_path):
    """Temperature mix mode: the per-source plan is reported and the
    materialized token mass tracks each source's target."""
    src = str(tmp_path / "docs")
    rows = [(i, "head", 100) for i in range(90)] + [(1000 + i, "tail", 100) for i in range(10)]
    spark.createDataFrame(rows, "doc_id long, source string, n_tok int").write.parquet(src)
    out = _cli("mix", "--input", src, "--out", str(tmp_path / "mixed"),
               "--temperature", "0.5", "--token-budget", "10000")
    assert out["mode"] == "temperature"
    ps = out["per_source"]
    # n^0.5: head 90^.5=9.49, tail 10^.5=3.16 → weights .75/.25
    assert abs(ps["head"]["weight"] - 0.75) < 0.01
    assert ps["tail"]["epochs"] > 1.0  # tail up-samples
    got = {
        r["source"]: r["tok"]
        for r in spark.read.parquet(str(tmp_path / "mixed"))
        .groupBy("source").agg({"n_tok": "sum"}).withColumnRenamed("sum(n_tok)", "tok")
        .collect()
    }
    import math

    for s, n_docs in (("head", 90), ("tail", 10)):
        target = ps[s]["weight"] * 10000
        frac = ps[s]["epochs"] - int(ps[s]["epochs"])
        # md5-coin fractional copies: binomial CLT bound in token units
        tol = 100 * (4 * math.sqrt(n_docs * frac * (1 - frac)) + 1)
        assert abs(got[s] - target) <= tol, (s, got[s], target, tol)


def test_cli_decontaminate_fuzzy(spark, seq_tiny_dir, tmp_path):
    """--fuzzy-threshold unions paraphrase flags into the drop set: a
    mutated-every-8th-token leak survives the exact span policy but is
    caught by the fuzzy pass; the pairs report carries the evidence."""
    from pyspark.sql import functions as F

    train_dir, eval_dir = str(tmp_path / "train"), str(tmp_path / "eval")
    src = spark.read.parquet(seq_tiny_dir)
    src.coalesce(1).write.parquet(train_dir)
    leak = (
        src.filter(F.size("tokens") >= 64).orderBy("doc_id").limit(1)
        .select(
            F.lit("bench_para").alias("doc_id"),
            F.expr("transform(tokens, (x, i) -> CASE WHEN i % 8 = 0 "
                   "THEN CAST(x + 1 AS INT) ELSE x END)").alias("tokens"),
        )
    )
    leak_src_id = src.filter(F.size("tokens") >= 64).orderBy("doc_id").limit(1) \
        .collect()[0]["doc_id"]
    leak.coalesce(1).write.parquet(eval_dir)

    out = _cli("decontaminate", "--train", train_dir, "--eval", eval_dir,
               "--out", str(tmp_path / "clean"), "--min-span-tokens", "50",
               "--fuzzy-threshold", "0.3",
               "--fuzzy-report-out", str(tmp_path / "fuzzy_report"))
    assert out["contaminated_pairs"] == 0  # exact pass is blind to it
    assert out["fuzzy_pairs"] >= 1 and out["flagged_docs"] >= 1
    kept = {r["doc_id"] for r in
            spark.read.parquet(str(tmp_path / "clean")).select("doc_id").collect()}
    assert leak_src_id not in kept
    rep = spark.read.parquet(str(tmp_path / "fuzzy_report")).collect()
    assert any(r["train_id"] == leak_src_id and r["eval_id"] == "bench_para" for r in rep)


def test_cli_drift(spark, tmp_path):
    """Drift report end-to-end: two build runs, one drift command; the
    doubled snapshot's mass rows show rel_change exactly 1."""
    src_a, src_b = str(tmp_path / "a"), str(tmp_path / "b")
    df = spark.createDataFrame(
        [(i, ["x", "y"][i % 2], (i * 7919) % 500) for i in range(2000)],
        "doc_id long, source string, v long",
    )
    df.write.parquet(src_a)
    df.unionByName(df).write.parquet(src_b)
    _cli("build", "--input", src_a, "--sketches", "h:hll:v", "c:cm:v",
         "--out", str(tmp_path / "sa"))
    _cli("build", "--input", src_b, "--sketches", "h:hll:v", "c:cm:v",
         "--out", str(tmp_path / "sb"))
    r = subprocess.run(
        [sys.executable, "-m", "sketchlib.cli", "drift",
         "--states-a", str(tmp_path / "sa"), "--states-b", str(tmp_path / "sb")],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    mass = [x for x in rows if x["metric"] == "mass"]
    assert len(mass) == 2 and all(x["rel_change"] == 1.0 for x in mass)
    dist = [x for x in rows if x["metric"] == "distinct"]
    assert all(abs(x["rel_change"]) <= 3 * x["bound"] for x in dist)
