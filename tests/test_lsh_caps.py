"""Skew bounds for the LSH self-joins (round-2 verdict items #2/#3).

A family of near-identical templated docs shares every minhash band, and a
cluster of similar embeddings shares every sign-projection bucket — without
a cap, both self-joins go quadratic in the family size.  These tests pin:

* minhash band buckets wider than ``max_bucket`` emit STAR pairs (linear,
  connectivity preserved), matching the DuckDB oracle's mirrored SQL;
* embedding buckets wider than ``max_bucket`` re-salt deterministically by
  the next sign components, splitting distinct vectors while keeping
  bit-identical vectors together.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from bids2table_spark.operators.dedup import (
    embedding_neardup,
    minhash_lsh_pairs,
)


@pytest.fixture(scope="module")
def skewed_docs(spark):
    template = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [(i, template) for i in range(400)]  # one mega-family
    # distinct pair of near-dups that must survive the cap untouched
    rows += [(1000, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
             (1001, "alpha beta gamma delta epsilon zeta eta theta iota lambda")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf), pdf


def test_minhash_band_cap_linear_star_pairs(spark, skewed_docs):
    docs, _ = skewed_docs
    pairs = minhash_lsh_pairs(docs, max_bucket=32).toPandas()
    fam = pairs[(pairs.doc_a < 1000) & (pairs.doc_b < 1000)]
    # star pairs only: 399 edges to the representative, not C(400,2)=79800
    assert len(fam) == 399
    assert (fam.doc_a == 0).all()
    # the small near-dup pair is untouched by the cap
    assert ((pairs.doc_a == 1000) & (pairs.doc_b == 1001)).any()


def test_minhash_band_cap_matches_oracle(spark, skewed_docs):
    from __spark_entry__ import _lsh_pairs_sql

    docs, pdf = skewed_docs
    got = (
        minhash_lsh_pairs(docs, max_bucket=32)
        .toPandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.sql(_lsh_pairs_sql(128, 16, max_bucket=32))
        .df()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"doc_a": "int64", "doc_b": "int64"}),
        want.astype({"doc_a": "int64", "doc_b": "int64"}),
    )


def test_minhash_no_cap_is_quadratic_baseline(spark, skewed_docs):
    """Sanity: the cap is what bounds the family (max_bucket=None explodes)."""
    docs, _ = skewed_docs
    small = docs.filter("doc_id < 40 or doc_id >= 1000")  # keep runtime sane
    pairs = minhash_lsh_pairs(small, max_bucket=None).toPandas()
    fam = pairs[(pairs.doc_a < 1000) & (pairs.doc_b < 1000)]
    assert len(fam) == 40 * 39 // 2


@pytest.fixture(scope="module")
def skewed_embeddings(spark):
    rng = np.random.RandomState(7)
    rows = []
    # 200 vectors: identical signs in comps 1..32 (same bucket in all 4
    # tables), random signs in comps 33..40 (the re-salt block) -> the cap
    # splits them into up to 256 sub-buckets
    for i in range(200):
        v = np.abs(rng.randn(48)).astype("float32")
        v[32:40] *= np.where(rng.rand(8) < 0.5, -1.0, 1.0).astype("float32")
        rows.append((i, v.tolist()))
    # two bit-identical vectors: must stay together through the re-salt
    dup = np.abs(rng.randn(48)).astype("float32")
    dup[32:40] *= -1.0
    rows += [(500, dup.tolist()), (501, dup.tolist())]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    return spark.createDataFrame(pdf)


def test_embedding_cap_splits_hot_bucket(spark, skewed_embeddings):
    uncapped = embedding_neardup(
        skewed_embeddings, threshold=0.5, max_bucket=None
    ).count()
    capped_df = embedding_neardup(
        skewed_embeddings, threshold=0.5, max_bucket=50
    ).toPandas()
    # re-salting the hot bucket drops cross-sub-bucket candidates: strictly
    # less quadratic work, and identical vectors are still paired
    assert 0 < len(capped_df) < uncapped
    assert ((capped_df.vec_a == 500) & (capped_df.vec_b == 501)).any()


def test_embedding_cap_bounds_bucket_width(spark, skewed_embeddings):
    """Directly inspect the salted bucket layout the join runs on."""
    from pyspark.sql import Window, functions as F

    from bids2table_spark.operators.dedup import srp_buckets

    planes, tables, cap = 8, 4, 50
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = (
        skewed_embeddings.select("vec_id", v.alias("v"))
        .withColumn("tb", F.explode(srp_buckets(F.col("v"), planes, tables)))
        .select("vec_id", "v", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    )
    sub = srp_buckets(F.col("v"), planes, tables * 2)[tables].getField("bucket")
    w = Window.partitionBy("tbl", "bucket")
    salted = base.withColumn("_n", F.count("*").over(w)).withColumn(
        "bucket",
        F.when(F.col("_n") > cap, F.col("bucket") * (2 ** planes) + sub + (2 ** planes))
        .otherwise(F.col("bucket")),
    )
    widths = salted.groupBy("tbl", "bucket").count().toPandas()
    assert widths["count"].max() < 200  # the 200-wide hot bucket was split


def test_uncapped_sanity_guard_fails_fast(spark, skewed_docs):
    """ngram verify stage runs uncapped by default — the sanity guard must
    surface a quadratic bucket as an error, not a silent stall."""
    from bids2table_spark.operators.dedup import ngram_jaccard_pairs

    docs, _ = skewed_docs  # 400-doc template family: every band bucket ~400
    with pytest.raises(Exception, match="sanity_bucket"):
        ngram_jaccard_pairs(docs, sanity_bucket=64).count()
    # under the bound: same pipeline runs clean and still finds true pairs
    small = docs.filter("doc_id >= 1000")
    pairs = ngram_jaccard_pairs(small, threshold=0.3, sanity_bucket=64).toPandas()
    assert ((pairs.doc_a == 1000) & (pairs.doc_b == 1001)).any()


def test_explicit_cap_disables_sanity_guard(spark, skewed_docs):
    from bids2table_spark.operators.dedup import ngram_jaccard_pairs

    docs, _ = skewed_docs
    # star-capped: guard off, linear pairs, no raise
    ngram_jaccard_pairs(docs, max_bucket=32, sanity_bucket=64).count()
