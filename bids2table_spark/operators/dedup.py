"""Deduplication operators over the ``documents`` table — the operations a
large-scale training-data pipeline needs, each designed so a DuckDB oracle
can reproduce it exactly (shared primitives: md5, word shingles, 32-bit
affine hash permutations — identical integer arithmetic in both engines).

* exact_dedup         hash-groupBy on md5(text), keep min doc_id
* minhash_signatures  k=128 min-hashes: ONE md5 per shingle -> h32, then k
                      cheap affine permutations (a_i*h+b_i) mod p — the
                      standard scalable construction (never k md5 passes)
* minhash_lsh_pairs   16 bands x 8 rows -> bucket join -> candidate pairs
* ngram_jaccard_pairs exact Jaccard on the int64-hashed shingle sets over
                      LSH candidates (no string arrays ever shuffle)
* simhash64           60-bit simhash, ONE aggregate pass (array accumulator)
* embedding_neardup   cosine pairs within multi-table sign-projection
                      buckets (tables x planes, union) + optional bucket cap

Scale notes: every self-join is bucketed (band_key / (table, bucket)) — no
all-pairs anywhere; signatures travel as int arrays, shingle strings never
leave the row they were tokenized in; a hot bucket can be capped
(``max_bucket``) with deterministic re-salting by further sign planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# word 3-gram shingles from lowercased whitespace-split tokens
_SHINGLE_N = 3

# universal-hash family over p = 2^31 - 1 (Mersenne); h32 < 2^32 and
# a < 2^30 keep every product within int64 in BOTH engines (no overflow,
# no engine-specific wrap semantics)
MERSENNE_P = 2_147_483_647
MINHASH_K = 128
MINHASH_BANDS = 16


def _mix64(x: int) -> int:
    """splitmix64 finalizer on python ints (table-generation only)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def minhash_coeffs(k: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) affine coefficients, shared with the oracle."""
    a = [(_mix64(2 * i) % (1 << 30)) | 1 for i in range(k)]
    b = [_mix64(2 * i + 1) % MERSENNE_P for i in range(k)]
    return a, b


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


def _h32(s):
    """md5-prefix -> 32-bit int hash of one shingle string (shared with the
    DuckDB oracle: ``('0x' || substr(md5(s), 1, 8))::BIGINT``)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _shingle_hashes_raw(col: str = "text", n: int = _SHINGLE_N):
    """Per-OCCURRENCE int64 shingle hashes (duplicates kept, first-occurrence
    order).  The token array is BOUND as a lambda variable via the
    ``transform(array(toks), t -> ...)`` wrapper: interpreted higher-order
    lambdas do no common-subexpression elimination, so referencing the
    split() through the outer column (the round-5 shape: ``slice(toks, ...)``
    inside the lambda) re-evaluated tokenize/slice work per shingle —
    binding ``t`` makes each access a variable lookup, measured ~25% faster
    on the shingle explode at identical hashes."""
    toks = tokens_col(col)

    def per_t(t):
        gram = F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: _h32(
                F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)])
            ),
        )
        return F.when(F.size(t) >= n, gram).otherwise(
            F.array(_h32(F.concat_ws(" ", t)))
        )

    return F.flatten(F.transform(F.array(toks), per_t))


def hashed_shingles_col(col: str = "text", n: int = _SHINGLE_N):
    """Distinct int64 shingle hashes: md5-prefix -> 32-bit int.  ONE digest
    per shingle occurrence; everything downstream (minhash, jaccard) is int
    math.  Element-wise identical to distinct-strings-then-hash (md5 is
    deterministic and array_distinct keeps first-occurrence order, so the
    distinct can run once, after hashing).
    DuckDB mirror: ``('0x' || substr(md5(s), 1, 8))::BIGINT``."""
    return F.array_distinct(_shingle_hashes_raw(col, n))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """One row per distinct text: canonical doc = min doc_id, plus dupe count."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, sig array<long>[k]): sig_i = min over shingles of
    (a_i * h32 + b_i) mod p.

    The classic scalable construction: hashing cost is one md5 per shingle
    regardless of k.  Shape: repartition docs by doc_id, explode shingle
    hashes, then the k MINs as a vectorized numpy kernel per Arrow batch
    (``mapInArrow``; see the inline note — measured ~2.6x over k codegen'd
    MIN aggregates at identical output).  The job's ONE shuffle moves the
    raw ~300B texts instead of the ~3x-larger exploded (doc_id, h) pairs,
    and the interpreted shingle lambdas (higher-order transforms never
    reach codegen — the same penalty that made the zero-shuffle
    nested-aggregate formulation 40x slower) run across all cores even
    when the input scan is a single small file."""
    import numpy as np

    a, b = minhash_coeffs(k)
    P = docs.sparkSession.sparkContext.defaultParallelism
    # per-occurrence hashes (no array_distinct pass): MIN is insensitive to
    # duplicates, so the signature is identical and the distinct's hash-set
    # walk is saved on the hottest column
    ex = docs.repartition(P, "doc_id").select(
        "doc_id", F.explode(_shingle_hashes_raw()).alias("h")
    )
    # ROUND 6: the k MINs run as ONE numpy matmul-shaped kernel per Arrow
    # batch instead of k codegen'd aggregates — the aggregate's per-input-row
    # buffer update (k hash-map column writes per exploded row) cost ~3x the
    # arithmetic (interleaved A/B at sf0.1: 1.45 s -> 0.55 s, byte-identical
    # signatures).  (h * a_i + b_i) % p stays entirely in int64 (h < 2^32,
    # a < 2^30 — the same no-overflow bound the SQL form relies on), and
    # min is associative, so per-batch partials merged by a second
    # sort+reduceat give exactly the aggregate's result regardless of how
    # Arrow slices the partition into batches.  Memory: one (doc, k) int64
    # partial row per doc per batch — ~1 KB/doc per task at k=128, bounded
    # by docs-per-partition (scale the shuffle partition count with the
    # corpus, as the repartition(P, doc_id) above already does).
    A = np.asarray(a, dtype=np.int64)
    B = np.asarray(b, dtype=np.int64)
    id_ddl = docs.schema["doc_id"].dataType.simpleString()

    def per_part(batches):
        import pyarrow as pa

        from ..blocks import pin_worker_threads

        pin_worker_threads()
        id_type, ids_parts, mins_parts = None, [], []
        for batch in batches:
            if batch.num_rows == 0:
                continue
            id_type = batch.column("doc_id").type
            doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
            h = batch.column("h").to_numpy(zero_copy_only=False)
            order = np.argsort(doc, kind="stable")
            doc, h = doc[order], h[order]
            starts = np.concatenate(([0], np.flatnonzero(doc[1:] != doc[:-1]) + 1))
            perm = (h[:, None] * A[None, :] + B[None, :]) % MERSENNE_P
            ids_parts.append(doc[starts])
            mins_parts.append(np.minimum.reduceat(perm, starts, axis=0))
        if not ids_parts:
            return
        ids = np.concatenate(ids_parts)
        M = np.vstack(mins_parts)
        if len(ids_parts) > 1:  # merge docs split across arrow batches
            order = np.argsort(ids, kind="stable")
            ids, M = ids[order], M[order]
            starts = np.concatenate(([0], np.flatnonzero(ids[1:] != ids[:-1]) + 1))
            ids = ids[starts]
            M = np.minimum.reduceat(M, starts, axis=0)
        offs = np.arange(0, (len(ids) + 1) * k, k, dtype=np.int64)
        sig = pa.LargeListArray.from_arrays(
            pa.array(offs), pa.array(M.ravel(), type=pa.int64())
        ).cast(pa.list_(pa.int64()))
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids.tolist(), type=id_type), sig], names=["doc_id", "sig"]
        )

    return ex.mapInArrow(per_part, f"doc_id {id_ddl}, sig array<long>")


DEFAULT_BAND_CAP = 4096


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    max_bucket: int | None = DEFAULT_BAND_CAP,
    sanity_bucket: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the minhash signature.

    One explode to (doc_id, band_idx, band_key) then ONE self-join keyed on
    (band_idx, band_key) — bucketed by construction, never all-pairs; the
    round-1 version unioned per-band joins (bands separate shuffles).

    ``max_bucket`` bounds the quadratic term: a band bucket wider than the
    cap (a family of near-identical templated docs shares every band key)
    emits STAR pairs only — each member paired with the bucket's min
    doc_id — so its pair count is linear while connectivity survives for
    union-find style dedup (any member still reaches the representative).
    The window count shuffles on the same (band_idx, band_key) key the
    self-join uses, so the cap adds no new partitioning.

    The banded frame is materialized ONCE via an eager localCheckpoint
    before it fans out: the self-join's two sides (plus the star branch)
    would otherwise each replan the whole signature subtree — docs scan,
    per-shingle md5, the 128-MIN aggregate, the band explode and the bucket
    window — and round-6 plans showed exactly 3 copies of that subtree with
    no ReusedExchange (measured 1.7-4x slower than the checkpointed form).
    localCheckpoint, not persist(): same rationale as run_length_sql — no
    session-lifetime cache pin, every call recomputes honestly, and the
    ContextCleaner frees the blocks when the frame is GC'd.  Size is
    bands x ~(16B + band_key) per doc — the banded index, far smaller than
    re-tokenizing the corpus three times."""
    rows = k // bands
    sig = minhash_signatures(docs, k=k)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.lit(list(range(bands))),
                lambda bi: F.struct(
                    bi.alias("band_idx"),
                    F.concat_ws(",", F.transform(F.slice("sig", bi * rows + 1, rows), lambda v: v.cast("string"))).alias("band_key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_idx", "bk.band_key")
    if max_bucket:
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_key")
        banded = banded.withColumn("_n", F.count("*").over(w)).withColumn(
            "_rep", F.min("doc_id").over(w)
        ).localCheckpoint()
        small = banded.filter(F.col("_n") <= max_bucket).drop("_n", "_rep")
        star = (
            banded.filter((F.col("_n") > max_bucket) & (F.col("doc_id") != F.col("_rep")))
            .select(F.col("_rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        )
    elif sanity_bucket:
        # uncapped-but-guarded: callers that NEED full bucket recall (the
        # ngram verify stage) run without star-pair capping, but a bucket
        # past the sanity bound means O(bucket^2) pairs — fail fast with an
        # actionable message instead of silently running a quadratic job.
        # Same (band_idx, band_key) window partitioning the self-join uses,
        # so the guard adds no new shuffle; the raise lives in a FILTER so
        # Catalyst cannot project it away.
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_key")
        small = (
            banded.withColumn("_n", F.count("*").over(w))
            .filter(
                F.when(
                    F.col("_n") > sanity_bucket,
                    F.raise_error(
                        F.format_string(
                            "LSH bucket band_idx=%s has %s members "
                            f"(> sanity_bucket={sanity_bucket}): O(n^2) candidate "
                            "pairs — pass max_bucket to star-cap, or raise "
                            "sanity_bucket if the quadratic cost is intended",
                            F.col("band_idx"), F.col("_n"),
                        )
                    ),
                ).otherwise(F.lit(True))
            )
            .drop("_n")
            .localCheckpoint()  # same fan-out: both self-join sides
        )
        star = None
    else:
        small, star = banded.localCheckpoint(), None
    a_side, b_side = small.alias("a"), small.alias("b")
    pairs = (
        a_side.join(b_side, on=["band_idx", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    max_bucket: int | None = None,
    sanity_bucket: int | None = 32_768,
) -> DataFrame:
    """Exact shingle-Jaccard over LSH candidates (verify stage of the
    classic minhash pipeline), computed on int64 shingle hashes — candidate
    pairs shuffle ~8 bytes/shingle, never re-tokenized strings.  Jaccard
    rounded to 4 dp for oracle parity.

    The LSH bucket cap is OPT-IN here (``max_bucket=None``): star-pair
    candidates are fine for union-find dedup (connectivity survives) but
    wrong for this verify stage — a true near-dup pair inside a wide
    bucket where neither doc is the bucket min would be silently dropped.
    Pass a cap explicitly only when a templated corpus makes the quadratic
    term unaffordable AND star-connected recall is acceptable.
    ``sanity_bucket`` (default 32768) fails fast — with an actionable
    message, at no extra shuffle — if an uncapped bucket would go quadratic
    past that bound, so the blowup is visible instead of a silent stall."""
    cands = minhash_lsh_pairs(
        docs, k=k, bands=bands, max_bucket=max_bucket,
        sanity_bucket=None if max_bucket else sanity_bucket,
    )
    P = docs.sparkSession.sparkContext.defaultParallelism
    # repartition before tokenizing: the join shuffles on doc_a/doc_b anyway,
    # this just keeps the interpreted shingle lambdas off a single scan task
    sh = docs.repartition(P, "doc_id").select(
        F.col("doc_id"), hashed_shingles_col().alias("sh")
    )
    return (
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


def simhash64(docs: DataFrame) -> DataFrame:
    """60-bit simhash over distinct word tokens.

    Shape: explode tokens -> ONE md5 per token -> bit votes as a vectorized
    numpy kernel per Arrow batch (round 6; previously 60 codegen'd
    conditional SUM aggregates — same replacement and measured rationale as
    minhash_signatures) -> fold the votes into the hash.  The round-2
    version computed the same thing
    shuffle-free as a nested higher-order aggregate/zip_with, but Catalyst
    evaluates higher-order lambdas INTERPRETED (never codegen — the exact
    penalty that made k=128 minhash 40x slower); trading one (doc_id, h)
    shuffle for whole-stage codegen is the same fix minhash got.  As in
    minhash, the shuffle happens BEFORE tokenization (repartition by
    doc_id, reused by the groupBy): raw texts are smaller than exploded
    tokens and the tokenizer parallelizes past a single-file scan."""
    P = docs.sparkSession.sparkContext.defaultParallelism
    # explode_OUTER keeps null/empty-token docs as a single null-token row
    # (md5(null) -> v null -> every bit vote falls to the otherwise(-1)
    # branch -> all votes negative -> simhash 0), so every input doc yields
    # a row in ONE pass — no second scan of docs, no join (the round-4
    # left-join fix recomputed a derived docs frame twice)
    import numpy as np

    ex = docs.repartition(P, "doc_id").select(
        "doc_id", F.explode_outer(F.array_distinct(tokens_col())).alias("tok")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("v"),
    )
    # ROUND 6: the 60 conditional-SUM bit votes run as one numpy kernel per
    # Arrow batch (same shape/rationale as minhash_signatures — the wide
    # codegen'd aggregate paid 60 buffer writes per token row).  A NULL v
    # (empty-token doc via explode_outer) voted -1 on every bit in the old
    # aggregate; v=0 has all-zero bits and votes identically, so nulls
    # fill to 0 exactly (and the int64 path stays lossless — a pandas null
    # promotion to float64 would corrupt 60-bit hashes).  Per-batch
    # (ones-count, token-count) partials are additive, so cross-batch
    # merging is a second sort+reduceat; votes_b = 2*ones_b - n > 0 is the
    # aggregate's sum(±1) > 0 bit for bit.
    shifts = np.arange(60, dtype=np.uint64)
    id_ddl = docs.schema["doc_id"].dataType.simpleString()

    def per_part(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..blocks import pin_worker_threads

        pin_worker_threads()
        id_type, ids_parts, ones_parts, cnt_parts = None, [], [], []
        for batch in batches:
            if batch.num_rows == 0:
                continue
            id_type = batch.column("doc_id").type
            doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
            v = pc.fill_null(batch.column("v"), 0).to_numpy(zero_copy_only=False)
            order = np.argsort(doc, kind="stable")
            doc, v = doc[order], v[order]
            starts = np.concatenate(([0], np.flatnonzero(doc[1:] != doc[:-1]) + 1))
            bits = ((v.view(np.uint64)[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            ids_parts.append(doc[starts])
            ones_parts.append(np.add.reduceat(bits, starts, axis=0))
            cnt_parts.append(np.diff(np.append(starts, len(doc))))
        if not ids_parts:
            return
        ids = np.concatenate(ids_parts)
        ones = np.vstack(ones_parts)
        cnt = np.concatenate(cnt_parts)
        if len(ids_parts) > 1:
            order = np.argsort(ids, kind="stable")
            ids, ones, cnt = ids[order], ones[order], cnt[order]
            starts = np.concatenate(([0], np.flatnonzero(ids[1:] != ids[:-1]) + 1))
            ids = ids[starts]
            ones = np.add.reduceat(ones, starts, axis=0)
            cnt = np.add.reduceat(cnt, starts)
        votes_pos = (2 * ones - cnt[:, None]) > 0
        sim = (votes_pos * (np.int64(1) << np.arange(60, dtype=np.int64))[None, :]).sum(axis=1)
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids.tolist(), type=id_type), pa.array(sim, type=pa.int64())],
            names=["doc_id", "simhash"],
        )

    return ex.mapInArrow(per_part, f"doc_id {id_ddl}, simhash long")


def srp_buckets(vcol, planes: int = 8, tables: int = 4):
    """Multi-table sign-projection buckets: table t reads ``planes``
    components starting at t*planes (deterministic 'projections' =
    coordinate axes so any engine reproduces them).  Near-identical vectors
    agree on every table; a single unlucky plane only costs one table —
    recall = 1-(1-q^planes)^tables instead of q^(planes*tables).

    Components past the embedding length read as sign 0 (coalesce guard, as
    in similarity.srp_bucket) — short vectors degrade to coarser buckets
    instead of silently vanishing from later tables via NULL bucket ids."""
    def bucket(t: int):
        bits = [
            F.coalesce(
                (F.element_at(vcol, t * planes + i + 1) >= 0).cast("int"), F.lit(0)
            )
            * (2 ** i)
            for i in range(planes)
        ]
        out = bits[0]
        for x in bits[1:]:
            out = out + x
        return out

    return F.array(*[F.struct(F.lit(t).alias("tbl"), bucket(t).alias("bucket")) for t in range(tables)])


DEFAULT_EMB_BUCKET_CAP = 8192


def embedding_neardup(
    emb: DataFrame,
    threshold: float = 0.95,
    planes: int = 8,
    tables: int = 4,
    max_bucket: int | None = DEFAULT_EMB_BUCKET_CAP,
) -> DataFrame:
    """Cosine near-duplicate pairs among embeddings sharing any (table,
    bucket) — full-precision cosine verify inside the bucket, distinct over
    tables.  2^planes buckets per table (256 at the default) — the round-1
    version had 4 total buckets, a cartesian product in disguise.

    ``max_bucket`` (default on: 8192) caps bucket width for skew: oversized
    buckets re-salt by the NEXT ``planes`` sign components (deterministic),
    bounding the quadratic term; identical vectors re-salt identically, so
    true duplicates are never separated (a bucket of bit-identical vectors
    stays whole — its pairs ARE the answer; remove exact dups upstream)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v")).withColumn(
        "tb", F.explode(srp_buckets(F.col("v"), planes, tables))
    ).select("vec_id", "v", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    if max_bucket:
        from pyspark.sql import Window

        # deterministic sub-salt from the next `planes` components
        sub = srp_buckets(F.col("v"), planes, tables * 2)[tables].getField("bucket")
        w = Window.partitionBy("tbl", "bucket")
        base = base.withColumn("_n", F.count("*").over(w)).withColumn(
            "bucket",
            F.when(F.col("_n") > max_bucket, F.col("bucket") * (2 ** planes) + sub + (2 ** planes)).otherwise(
                F.col("bucket")
            ),
        ).drop("_n")
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
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cosine", F.round(dot / (norm("a") * norm("b")), 4))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"), "cosine")
        .distinct()
    )


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Resolve candidate pairs into clusters: ``(doc_id, cluster_id)`` with
    ``cluster_id`` = min doc id of the vertex's connected component — the
    final stage of the dedup pipeline (pick one canonical document per
    near-duplicate cluster; reference keeps one row per key the same way,
    its ``_get_duplicates`` keep-first: /root/reference/bids2table/table.py:98-118).

    Distributed min-label propagation with pointer jumping (the hash-to-min
    idea of Rastogi et al., "Finding Connected Components in Map-Reduce in
    Logarithmic Rounds", ICDE 2013): each round every vertex takes the min
    label over itself and its neighbors, then labels chase one hop through
    the label table (lbl <- lbl(lbl)), so chains collapse in O(log d)
    rounds, not O(d).  Scale shape: every join/aggregate shuffles on the
    vertex id only; the edge list is checkpointed once and reused; the
    label frontier is localCheckpoint'ed per round (truncates lineage —
    an iterative plan would otherwise grow exponentially and recompute
    history); convergence is detected by an aggregate (no driver-side
    label set).  Only vertices that appear in some pair participate —
    callers left-join the corpus and coalesce to self for singletons."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    lbl = (
        edges.groupBy(F.col("src").alias("doc_id"))
        .agg(F.min("dst").alias("lbl"))
        .withColumn("lbl", F.least("doc_id", "lbl"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = (
            edges.join(lbl.withColumnRenamed("doc_id", "dst"), "dst")
            .select(F.col("src").alias("doc_id"), "lbl")
            .unionByName(lbl)
            .groupBy("doc_id")
            .agg(F.min("lbl").alias("lbl"))
        )
        hop = prop.select(F.col("doc_id").alias("_k"), F.col("lbl").alias("_l2"))
        new = (
            prop.join(hop, prop["lbl"] == hop["_k"], "left")
            .select("doc_id", F.least("lbl", F.coalesce("_l2", "lbl")).alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new.withColumnRenamed("lbl", "_nl")
            .join(lbl, "doc_id")
            .filter(F.col("_nl") != F.col("lbl"))
            .count()
        )
        lbl = new
        if changed == 0:
            return lbl.select("doc_id", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(pointer jumping bounds rounds by O(log diameter) — a graph this "
        "deep means the candidate pairs are wrong, not the iteration cap)"
    )


def dedup_clusters(docs: DataFrame, **lsh_kwargs) -> DataFrame:
    """Every document labeled with its near-duplicate cluster id (min doc_id
    over the MinHash-LSH candidate-pair connected component; singletons get
    their own id).  ``is_canonical`` marks the one row per cluster a
    dedup'd corpus keeps."""
    cc = connected_components(minhash_lsh_pairs(docs, **lsh_kwargs))
    return (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
    )


def ngram_decontaminate(
    corpus: DataFrame, evalset: DataFrame, n: int = 13
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    ``n``-gram with the eval set (the published pretraining practice —
    13-gram overlap — applied cross-table).

    Returns ``(doc_id, n_shared)`` for contaminated corpus docs, where
    ``n_shared`` counts the distinct shared n-gram hashes.  Documents
    shorter than ``n`` tokens shingle to their whole text (same rule as
    :func:`shingles_col`), so short eval items still catch exact copies.

    Scale shape: the eval side (benchmarks — thousands of docs, not
    billions) collapses to a DISTINCT hash set and BROADCASTS; the corpus
    explode then joins map-side — corpus bytes never shuffle for the
    membership test.  The only shuffle is the final per-doc count, keyed
    on doc_id over the (tiny) matched subset.  Hash arithmetic is the
    shared md5-prefix int64 (``hashed_shingles_col``), so a DuckDB oracle
    reproduces it exactly."""
    ev = (
        evalset.select(F.explode(hashed_shingles_col("text", n)).alias("h"))
        .distinct()
    )
    hits = (
        corpus.select("doc_id", F.explode(hashed_shingles_col("text", n)).alias("h"))
        .join(F.broadcast(ev), "h", "left_semi")
    )
    return hits.groupBy("doc_id").agg(F.count("*").alias("n_shared"))
