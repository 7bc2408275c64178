"""Unit tests for DataFrame-level operators (tiny in-memory frames)."""

from __future__ import annotations

import pyspark.sql.functions as F

from bids2table_spark.operators.dedup import exact_dedup, minhash_signatures, simhash64
from bids2table_spark.operators.merge import conform_schema, dedup_keep_last, key_merge, resume_filter
from bids2table_spark.operators.similarity import cosine_topk
from bids2table_spark.operators.text import lang_id, token_counts


def test_key_merge_outer(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k int, a string")
    b = spark.createDataFrame([(2, 20.0), (3, 30.0)], "k int, b double")
    got = {r["k"]: (r["a"], r["b"]) for r in key_merge(a, b, ["k"]).collect()}
    assert got == {1: ("x", None), 2: ("y", 20.0), 3: (None, 30.0)}


def test_resume_filter(spark):
    cand = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    done = spark.createDataFrame([(2,)], "k int")
    assert {r["k"] for r in resume_filter(cand, done, ["k"]).collect()} == {1, 3}


def test_dedup_keep_last(spark):
    df = spark.createDataFrame(
        [("a", 1, "old"), ("a", 2, "new"), ("b", 1, "only")], "k string, v int, s string"
    )
    got = {r["k"]: r["s"] for r in dedup_keep_last(df, ["k"], "v").collect()}
    assert got == {"a": "new", "b": "only"}


def test_conform_schema(spark):
    df = spark.createDataFrame([(1, "2")], "a int, b string")
    out = conform_schema(df, {"b": "int", "missing": "string", "a": "long"})
    assert out.columns == ["b", "missing", "a"]
    row = out.collect()[0]
    assert row["b"] == 2 and row["missing"] is None and row["a"] == 1


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], "doc_id long, text string"
    )
    got = {r["canonical_doc_id"]: r["n_dupes"] for r in exact_dedup(df).collect()}
    assert got == {1: 2, 3: 1}


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over it"), (2, "the quick brown fox jumps over it"),
         (3, "entirely different words here now ok")],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: (r["mh0"], r["mh1"]) for r in minhash_signatures(df, k=2).collect()}
    assert sig[1] == sig[2] and sig[1] != sig[3]


def test_simhash_similar_close(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon eta"),
         (3, "one two three four five six")],
        "doc_id long, text string",
    )
    h = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    d12 = bin(h[1] ^ h[2]).count("1")
    d13 = bin(h[1] ^ h[3]).count("1")
    assert d12 < d13


def test_cosine_topk_self_first(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    rows = cosine_topk(emb, q, k=2).orderBy("rank").collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["cosine"] == 1.0
    assert rows[1]["vec_id"] == 1


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of mine", "en"),
         (2, "les roses est une fleur", "fr"),
         (3, "zzz qqq www", "zz")],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got[1] == "en" and got[2] == "fr" and got[3] == "und"


def test_token_counts_edges(spark):
    df = spark.createDataFrame([(1, ""), (2, "hello world"), (3, "a-b 12!")],
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"]) for r in token_counts(df).collect()}
    assert got[1] == (0, 0)
    assert got[2][0] == 2 and got[2][1] >= 3
    assert got[3][0] == 2
