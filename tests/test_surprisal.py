"""Unigram LM surprisal (D34) — the CCNet-style LM-proxy quality signal:
exact mode (one vocabulary-sized count pass + one mapInArrow scoring pass)
and the CM-served mode (corpus model = ONE Count-Min state row, KBs)."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.build import SketchSpec, build_sketches
from sketchlib.spark.text import with_unigram_surprisal
from sketchlib.spark.tokenize import with_tokens

DOCS = "/root/testdata/sf0.01/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return with_tokens(spark.read.parquet(DOCS)).localCheckpoint()


@pytest.fixture(scope="module")
def py_ref(docs):
    pdf = docs.select("doc_id", "tokens").toPandas()
    cnt = Counter()
    for t in pdf["tokens"]:
        cnt.update(t)
    n = sum(cnt.values())

    def ref(toks):
        if not len(toks):
            return None
        return -sum(math.log2(cnt[t] / n) for t in toks) / len(toks)

    return pdf.set_index("doc_id")["tokens"].map(ref), cnt, n


def test_exact_matches_python_reference(spark, docs, py_ref):
    refs, _, _ = py_ref
    out = (
        with_unigram_surprisal(docs, "tokens")
        .select("doc_id", "surprisal").toPandas().set_index("doc_id")["surprisal"]
    )
    assert float((out - refs).abs().max()) < 1e-12
    assert len(out) == len(refs)


def test_schema_preserved_and_single_pass(docs):
    out = with_unigram_surprisal(docs, "tokens")
    assert out.columns == docs.columns + ["surprisal"]
    # the scoring pass is ONE mapInArrow over the cached frame — no
    # exchange between source and score (the count pass is a separate job)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cm_served_within_bound(spark, docs, py_ref):
    refs, _, n = py_ref
    eps = 1e-4
    states = build_sketches(
        docs, [SketchSpec("cm_tok", "cm", "tokens", {"eps": eps, "delta": 0.01})],
        group_by=None,
    )
    out = (
        with_unigram_surprisal(docs, "tokens", states=states, sketch="cm_tok")
        .select("doc_id", "surprisal").toPandas().set_index("doc_id")["surprisal"]
    )
    d = out - refs
    # CM never undercounts a token ⇒ CM surprisal never exceeds exact
    assert float(d.max()) < 1e-9
    # and undershoots at most log2(1 + ε·N/c_min) per token (c_min ≥ 1)
    assert float(-d.min()) <= math.log2(1 + eps * n)


def test_unseen_token_floors_at_count_one(spark, docs):
    """Delta scoring: a fresh doc whose tokens the corpus never saw gets
    the deterministic add-one floor, not a crash or -inf."""
    counts = (
        docs.select(F.explode("tokens").alias("_t"))
        .groupBy("_t").agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = counts.agg(F.sum("cnt")).collect()[0][0]
    fresh = docs.sparkSession.createDataFrame(
        pd.DataFrame({"doc_id": [1], "tokens": [[10**9 + 7, 10**9 + 9]]})
    )
    out = with_unigram_surprisal(fresh, "tokens", counts=counts).collect()[0]
    assert abs(out["surprisal"] - (-math.log2(1.0 / n))) < 1e-9


def test_empty_and_null_arrays_yield_null(spark, docs):
    counts = (
        docs.select(F.explode("tokens").alias("_t"))
        .groupBy("_t").agg(F.count(F.lit(1)).alias("cnt"))
    )
    weird = spark.createDataFrame(
        [(1, [5, 5]), (2, []), (3, None)], "doc_id int, tokens array<bigint>"
    )
    out = {r["doc_id"]: r["surprisal"] for r in
           with_unigram_surprisal(weird, "tokens", counts=counts).collect()}
    assert out[2] is None and out[3] is None
    assert out[1] is not None


def test_arg_validation(spark, docs):
    with pytest.raises(ValueError, match="BOTH states and sketch"):
        with_unigram_surprisal(docs, "tokens", states=docs)
    states = build_sketches(
        docs, [SketchSpec("kll_n", "kll", "n_tok", {"k": 200})], group_by=None
    )
    with pytest.raises(ValueError, match="not a Count-Min"):
        with_unigram_surprisal(docs, "tokens", states=states, sketch="kll_n")
    with pytest.raises(ValueError, match="no states"):
        with_unigram_surprisal(docs, "tokens", states=states, sketch="nope")


def test_round_to(spark, docs):
    out = (
        with_unigram_surprisal(docs, "tokens", round_to=2)
        .select("surprisal").limit(20).toPandas()["surprisal"]
    )
    assert (out == out.round(2)).all()


def test_trailing_empty_doc_does_not_truncate_previous(spark, docs):
    """Regression (review): a trailing empty-token doc in the same Arrow
    batch must not clip the preceding doc's token sum — reduceat treats a
    clipped trailing start as the previous segment's end."""
    counts = spark.createDataFrame(
        pd.DataFrame({"_t": [5, 7], "cnt": [1, 3]})
    )
    frame = spark.createDataFrame(
        [(1, [5, 7]), (2, [])], "doc_id int, tokens array<bigint>"
    ).coalesce(1)  # one batch, empty row LAST
    out = {r["doc_id"]: r["surprisal"] for r in
           with_unigram_surprisal(frame, "tokens", counts=counts).collect()}
    want = -(math.log2(1 / 4) + math.log2(3 / 4)) / 2
    assert abs(out[1] - want) < 1e-12
    assert out[2] is None


@pytest.fixture(scope="module")
def grouped_ref(docs):
    """Per-source python reference."""
    pdf = docs.select("doc_id", "source", "tokens").toPandas()
    per = {}
    for src, sub in pdf.groupby("source"):
        cnt = Counter()
        for t in sub["tokens"]:
            cnt.update(t)
        per[src] = (cnt, sum(cnt.values()))

    def ref(row):
        cnt, n = per[row["source"]]
        toks = row["tokens"]
        if not len(toks):
            return None
        return -sum(math.log2(cnt[t] / n) for t in toks) / len(toks)

    pdf["ref"] = pdf.apply(ref, axis=1)
    return pdf.set_index("doc_id")["ref"], per


def test_grouped_exact_matches_python_reference(spark, docs, grouped_ref):
    refs, _ = grouped_ref
    out = (
        with_unigram_surprisal(docs, "tokens", group_by="source")
        .select("doc_id", "surprisal").toPandas().set_index("doc_id")["surprisal"]
    )
    assert float((out - refs).abs().max()) < 1e-12


def test_grouped_cm_served_within_bound(spark, docs, grouped_ref):
    refs, per = grouped_ref
    eps = 1e-4
    states = build_sketches(
        docs, [SketchSpec("cm_tok", "cm", "tokens", {"eps": eps, "delta": 0.01})],
        group_by="source",
    )
    out = (
        with_unigram_surprisal(
            docs, "tokens", states=states, sketch="cm_tok", group_by="source"
        )
        .select("doc_id", "surprisal").toPandas().set_index("doc_id")["surprisal"]
    )
    d = out - refs
    assert float(d.max()) < 1e-9  # never exceeds exact (CM never undercounts)
    n_max = max(n for _, n in per.values())
    assert float(-d.min()) <= math.log2(1 + eps * n_max)


def test_group_without_model_yields_null(spark, docs):
    """A doc from a group the counts/states never saw gets NULL, loudly
    distinguishable from a scored doc."""
    counts = (
        docs.filter(F.col("source") != "src0")
        .select("source", F.explode("tokens").alias("_t"))
        .groupBy("source", "_t").agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = (
        with_unigram_surprisal(docs, "tokens", counts=counts, group_by="source")
        .groupBy("source")
        .agg(F.sum(F.col("surprisal").isNull().cast("int")).alias("nulls"),
             F.count(F.lit(1)).alias("n"))
        .toPandas().set_index("source")
    )
    assert out.loc["src0", "nulls"] == out.loc["src0", "n"]
    others = out.drop(index="src0")
    assert (others["nulls"] == 0).all()


def test_grouped_wrong_group_column_raises(spark, docs):
    # exact self-count mode: Spark's analyzer catches the bad column at the
    # count pass; the counts= path reaches the batch-level guard instead
    with pytest.raises(Exception, match="cannot be resolved"):
        with_unigram_surprisal(docs, "tokens", group_by="nope").collect()
    counts = spark.createDataFrame(
        pd.DataFrame({"g": ["a"], "_t": [5], "cnt": [3]})
    )
    with pytest.raises(Exception, match="not in batch schema"):
        with_unigram_surprisal(docs, "tokens", counts=counts, group_by="nope").collect()
