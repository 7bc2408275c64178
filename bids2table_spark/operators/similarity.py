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


# ------------------------------------------------------------------- IVF ANN

IVF_CENTROIDS = 16
IVF_ITERS = 3
IVF_PROBE = 4


def _dist2(vcol, cent_lit):
    """Rounded squared L2 via the dot identity |v-c|^2 = v.v - 2v.c + c.c.
    ALL sums run engine-side left-fold (the oracle's list_dot_product is the
    same fold) and the result rounds to 4 dp so assignment argmins agree
    bit-for-bit across engines; ties break on centroid id."""
    dot_vc = F.aggregate(
        F.zip_with(vcol, cent_lit, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    vv = F.aggregate(vcol, F.lit(0.0), lambda a, x: a + x * x)
    cc = F.aggregate(cent_lit, F.lit(0.0), lambda a, x: a + x * x)
    return F.round(vv - 2 * dot_vc + cc, 4)


def _cent_lit(cent: list[float]):
    return F.array(*[F.lit(float(x)) for x in cent])


def _assign_cid(vcol, cents: list[list[float]]):
    """argmin centroid id: array_min over (dist, cid) structs — struct
    ordering is field-by-field, so ties fall to the lower cid."""
    ds = F.array(*[
        F.struct(_dist2(vcol, _cent_lit(c)).alias("d"), F.lit(j).alias("cid"))
        for j, c in enumerate(cents)
    ])
    return F.array_min(ds)["cid"]


def ivf_build(
    emb: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    iters: int = IVF_ITERS,
) -> list[list[float]]:
    """Deterministic Lloyd-iteration centroids (k-means-lite): init = the
    first ``n_centroids`` vectors by id, then ``iters`` assign/mean rounds.
    Per-dim means round to 6 dp (stabilizes cross-engine float drift); a
    cluster that loses every member keeps its previous centroid per-dim.

    Centroids live on the driver as literals (n_centroids x dim doubles —
    tiny), so assignment is a pure projection: no join, no shuffle beyond
    the per-iteration mean agg.  At real scale the assignment expression
    would move into a vectorized Arrow UDF (one (batch x dim) @ (dim x nc)
    matmul per batch) — same plan shape, faster per-row math."""
    base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    init = base.filter(F.col("vec_id") < n_centroids).orderBy("vec_id").collect()
    cents = [[round(float(x), 6) for x in r["v"]] for r in init]
    for _ in range(iters):
        assigned = base.withColumn("cid", _assign_cid(F.col("v"), cents))
        rows = (
            assigned.select("cid", F.posexplode("v").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()
        )
        mean = {(r["cid"], r["i"]): float(r["m"]) for r in rows}
        cents = [
            [mean.get((j, i), c[i]) for i in range(len(c))]
            for j, c in enumerate(cents)
        ]
    return cents


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = IVF_CENTROIDS,
    iters: int = IVF_ITERS,
    n_probe: int = IVF_PROBE,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize vectors to Lloyd centroids,
    probe each query's ``n_probe`` nearest cells, exact cosine inside.

    The scale path beyond SRP-LSH buckets: cells adapt to the data
    distribution, and the vectors->cells map is a plain column the storage
    layer can partition by (cell-pruned scans).  ``queries``: (query_id,
    qv array<double>) — broadcast, like cosine_topk."""
    cents = ivf_build(emb, n_centroids=n_centroids, iters=iters)
    base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    assigned = base.withColumn("cid", _assign_cid(F.col("v"), cents))
    probe_structs = F.array(*[
        F.struct(_dist2(F.col("qv"), _cent_lit(c)).alias("d"), F.lit(j).alias("cid"))
        for j, c in enumerate(cents)
    ])
    probes = queries.select(
        "query_id", "qv",
        F.explode(
            F.transform(
                F.slice(F.array_sort(probe_structs), 1, n_probe), lambda s: s["cid"]
            )
        ).alias("cid"),
    )
    scored = assigned.join(F.broadcast(probes), on="cid").select(
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
