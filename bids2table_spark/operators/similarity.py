"""Similarity search over the ``embeddings`` table.

* brute-force cosine top-k: broadcast the (small) query set, JVM-side
  zip_with/aggregate arithmetic, window top-k — the exact baseline.
* LSH-bucketed variant: sign-random-projection buckets prune the candidate
  set before the exact cosine — the 100 TB scale path (bucket join instead
  of full cross product).  Probes only matching buckets, so it is approximate
  (misses across bucket boundaries) — standard ANN trade-off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _cosine(av, bv):
    dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    na = F.sqrt(F.aggregate(av, F.lit(0.0), lambda a, x: a + x * x))
    nb = F.sqrt(F.aggregate(bv, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (na * nb)


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).

    ``queries``: (query_id, qv array<double>).  Deterministic tie-break on
    vec_id; cosine rounded to 4 dp.
    """
    base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    joined = base.crossJoin(F.broadcast(queries))
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(_cosine(F.col("qv"), F.col("v")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def srp_bucket(vcol, planes: int = 12):
    """Sign-random-projection bucket id from the first ``planes`` components
    (deterministic 'projection' = coordinate axes; oracle-reproducible).
    2^planes buckets — round-1 used 2 planes = 4 buckets, a quadratic
    self-join in disguise at scale."""
    bits = [
        F.coalesce((F.element_at(vcol, i + 1) >= 0).cast("int"), F.lit(0)) * (2 ** i)
        for i in range(planes)
    ]
    b = bits[0]
    for x in bits[1:]:
        b = b + x
    return b


def probe_buckets(bucket, planes: int = 12):
    """Multi-probe set: the query's own bucket plus every Hamming-1
    neighbor (flip one sign bit) — recovers most of the recall a near-miss
    plane costs, at planes+1 bucket reads instead of 2^planes."""
    return F.array(bucket, *[bucket.bitwiseXOR(F.lit(1 << i)) for i in range(planes)])


def cosine_topk_lsh(
    emb: DataFrame, queries: DataFrame, k: int = 5, planes: int = 12
) -> DataFrame:
    """ANN top-k: candidates in the query's SRP bucket or any Hamming-1
    probe bucket are scored (approximate: misses beyond one flipped plane —
    the standard multi-probe LSH trade-off)."""
    base = emb.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
    ).withColumn("bucket", srp_bucket(F.col("v"), planes))
    q = queries.withColumn(
        "bucket", F.explode(probe_buckets(srp_bucket(F.col("qv"), planes), planes))
    )
    # each data vector lives in exactly one bucket and probe buckets are
    # distinct, so no (query, vec) pair is scored twice
    joined = base.join(F.broadcast(q), on="bucket")
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(_cosine(F.col("qv"), F.col("v")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
