"""Deduplication operators over the ``documents`` table — the operations a
large-scale training-data pipeline needs, each designed so a DuckDB oracle
can reproduce it exactly (shared primitives: md5, word shingles, lexicographic
min — identical in both engines).

* exact_dedup        hash-groupBy on md5(text), keep min doc_id
* minhash_signatures k min-hashes from salted md5 over word 3-gram shingles
* minhash_lsh_pairs  band signatures -> bucket join -> candidate pairs
* ngram_jaccard_pairs candidate pairs with exact shingle-Jaccard >= threshold
* simhash64          64-bit simhash from token md5 bits (vectorized UDF-free)
* embedding_neardup  cosine near-duplicate pairs over the embeddings table
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# word 3-gram shingles from lowercased whitespace-split tokens
_SHINGLE_N = 3


def tokens_col(col: str = "text"):
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def shingles_col(col: str = "text", n: int = _SHINGLE_N):
    """Distinct word n-gram shingles (space-joined), [] for short texts."""
    toks = tokens_col(col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """One row per distinct text: canonical doc = min doc_id, plus dupe count."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def minhash_signatures(docs: DataFrame, k: int = 4) -> DataFrame:
    """k min-hash values per doc: min over shingles of md5(i || ':' || s).

    Lexicographic min over hex digests — deterministic and reproducible in
    any engine with md5.
    """
    sh = shingles_col()
    out = docs.select("doc_id", sh.alias("sh"))

    def salted_md5(prefix: str):
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    for i in range(k):
        out = out.withColumn(
            f"mh{i}", F.array_min(F.transform(F.col("sh"), salted_md5(f"{i}:")))
        )
    return out.drop("sh")


def minhash_lsh_pairs(docs: DataFrame, k: int = 4, bands: int = 2) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the minhash signature."""
    sig = minhash_signatures(docs, k=k)
    rows_per_band = k // bands
    pair_sets = []
    for b in range(bands):
        cols = [f"mh{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        banded = sig.select(
            "doc_id", F.concat_ws("|", *cols).alias("band_key")
        )
        a, bb = banded.alias("a"), banded.alias("b")
        pairs = (
            a.join(bb, on="band_key")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
        )
        pair_sets.append(pairs)
    out = pair_sets[0]
    for p in pair_sets[1:]:
        out = out.unionByName(p)
    return out.distinct()


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Exact shingle-Jaccard over LSH candidates (verify stage of the
    classic minhash pipeline). Jaccard rounded to 4 dp for oracle parity."""
    cands = minhash_lsh_pairs(docs)
    sh = docs.select(F.col("doc_id"), shingles_col().alias("sh"))
    j = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return j


def simhash64(docs: DataFrame) -> DataFrame:
    """64-bit simhash over word tokens: bit b is the sign of the sum over
    tokens of (bit b of md5-high-64 of the token) ? +1 : -1.

    Pure built-in expressions: md5 hex -> first 16 hex chars -> conv to a
    64-bit integer -> per-bit majority vote via aggregate.
    """
    toks = F.array_distinct(tokens_col())
    h = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    # 60-bit simhash (15 hex chars avoids signed-overflow differences)
    def bit_vote(b: int):
        return lambda acc, v: acc + F.when(
            F.shiftright(v, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = []
    for b in range(60):
        vote = F.aggregate(h, F.lit(0), bit_vote(b))
        bits.append(F.when(vote > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long")))
    sim = bits[0]
    for x in bits[1:]:
        sim = sim + x
    return docs.select("doc_id", sim.alias("simhash"))


def embedding_neardup(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Cosine near-duplicate pairs among embeddings sharing a coarse LSH
    bucket (sign of the first two components — cheap deterministic bucketing
    that the oracle can reproduce; full-precision cosine verify inside)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(
        "vec_id",
        v.alias("v"),
        F.concat(
            (F.element_at(v, 1) >= 0).cast("int").cast("string"),
            (F.element_at(v, 2) >= 0).cast("int").cast("string"),
        ).alias("bucket"),
    )
    a, b = base.alias("a"), base.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(F.col(f"{side}.v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cosine", F.round(dot / (norm("a") * norm("b")), 4))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cosine",
        )
    )
