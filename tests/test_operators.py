"""Unit tests for DataFrame-level operators (tiny in-memory frames)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

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
    sig = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(df, k=8).collect()}
    assert sig[1] == sig[2] and sig[1] != sig[3]


def _near_dup_docs(spark, n=60):
    """n/2 near-duplicate pairs: doc 2i and 2i+1 differ by one word in ~25."""
    base_words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                  "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
                  "psi omega extra").split()
    rows = []
    for i in range(n // 2):
        words = [base_words[(i * 7 + j) % len(base_words)] + str((i + j) % 9) for j in range(25)]
        a = " ".join(words)
        words[i % 25] = "CHANGED"
        b = " ".join(words)
        rows += [(2 * i, a), (2 * i + 1, b)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_recall_at_scale_config(spark):
    """k=128/b=16 must recover nearly all one-word-edit near-dups (their
    shingle Jaccard is ~0.87; band hit probability ~1-(1-0.87^8)^16 ~ 0.999)
    while producing far fewer candidates than all-pairs."""
    from bids2table_spark.operators.dedup import minhash_lsh_pairs

    docs = _near_dup_docs(spark, 60).cache()
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    truth = {(2 * i, 2 * i + 1) for i in range(30)}
    recall = len(pairs & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall}"
    assert len(pairs) < 60 * 59 / 4, "candidate set must stay far below all-pairs"
    docs.unpersist()


def test_embedding_neardup_recall_and_bucket_cap(spark):
    import numpy as np

    from bids2table_spark.operators.dedup import embedding_neardup

    rng = np.random.default_rng(13)
    rows = []
    vid = 0
    for i in range(40):  # 40 near-dup pairs
        v = rng.standard_normal(64)
        w = v + rng.standard_normal(64) * 0.02  # cosine ~ 0.9998
        rows += [(vid, [float(x) for x in v]), (vid + 1, [float(x) for x in w])]
        vid += 2
    # a skewed clump: 50 vectors in one orthant (hot bucket)
    clump_ids = []
    for _ in range(50):
        v = np.abs(rng.standard_normal(64)) + 0.5
        rows.append((vid, [float(x) for x in v]))
        clump_ids.append(vid)
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()

    pairs = {(r["vec_a"], r["vec_b"]) for r in embedding_neardup(emb, threshold=0.99).collect()}
    truth = {(2 * i, 2 * i + 1) for i in range(40)}
    recall = len(pairs & truth) / len(truth)
    assert recall >= 0.95, f"recall {recall}"

    # bucket cap: capping re-salts the hot orthant but never separates the
    # (near-)identical pairs — recall of true dups survives
    capped = {(r["vec_a"], r["vec_b"])
              for r in embedding_neardup(emb, threshold=0.99, max_bucket=10).collect()}
    assert len(capped & truth) / len(truth) >= 0.95
    emb.unpersist()


def test_ann_lsh_multiprobe_recall(spark):
    """Multi-probe LSH top-1 must agree with exact brute force for most
    queries (self-similarity: the vector itself is always in its own
    bucket, so rank-1 recall is 1.0 by construction; check rank-2)."""
    import numpy as np

    from bids2table_spark.operators.similarity import cosine_topk, cosine_topk_lsh

    rng = np.random.default_rng(21)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("qv"),
    )
    exact = {(r["query_id"], r["rank"]): r["vec_id"] for r in cosine_topk(emb, q, k=1).collect()}
    approx = {(r["query_id"], r["rank"]): r["vec_id"] for r in cosine_topk_lsh(emb, q, k=1).collect()}
    hits = sum(exact[k] == approx.get(k) for k in exact)
    assert hits == len(exact)  # rank-1 = the vector itself, always found
    emb.unpersist()


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


def test_fingerprint_winnow_guarantee(spark):
    """Winnowing property: two docs sharing a substring of length
    >= w + k - 1 (= 23 at defaults) share at least one fingerprint, and the
    fingerprint set is much smaller than the k-gram count (w-fold pruning)."""
    from bids2table_spark.operators.text import fingerprint_winnow

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, "PREFIX one " + shared + " SUFFIX alpha"),
            (2, "completely different lead-in: " + shared + " and more text"),
            (3, "no overlap here at all, entirely distinct content stream"),
        ],
        "doc_id long, text string",
    )
    fps = fingerprint_winnow(docs).collect()
    sets = {i: {r["fp"] for r in fps if r["doc_id"] == i} for i in (1, 2, 3)}
    assert sets[1] & sets[2], "docs sharing a long substring must share a fingerprint"
    # doc 3 shares nothing that long with doc 1
    n_grams_1 = len("PREFIX one " + shared + " SUFFIX alpha") - 7
    assert len(sets[1]) < n_grams_1 / 2  # windows prune most positions


def test_ivf_topk_recall_vs_exact(spark):
    """IVF with 4-of-16 probes must recover most of the exact top-5 (cells
    adapt to the data), and build must be deterministic across calls."""
    import numpy as np

    from bids2table_spark.operators.similarity import cosine_topk, ivf_build, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"]) for r in ivf_topk(emb, queries, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall} too low"
    c1 = ivf_build(emb)
    c2 = ivf_build(emb)
    assert np.array_equal(np.array(c1), np.array(c2))


def test_simhash_null_text_docs_survive(spark):
    """Docs with NULL/empty text must still emit a row (simhash 0), not
    silently vanish from the output (cardinality contract)."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, ""), (4, "one two three")],
        "doc_id long, text string",
    )
    h = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    assert set(h) == {1, 2, 3, 4}
    assert h[2] == 0  # null text -> no tokens -> all-zero hash


def test_ngram_jaccard_uncapped_by_default(spark):
    """The LSH bucket cap must be opt-in for the exact-Jaccard verify stage:
    near-dup pairs where NEITHER doc is the bucket min must survive under
    default arguments (star-pair candidates would drop them)."""
    from bids2table_spark.operators.dedup import ngram_jaccard_pairs

    text = "the quick brown fox jumps over the lazy dog once more " * 2
    df = spark.createDataFrame(
        [(i, text) for i in range(8)], "doc_id long, text string"
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(df).collect()}
    # all 8 docs identical -> all 28 pairs, including e.g. (5, 6)
    assert len(pairs) == 28 and (5, 6) in pairs
    # explicit cap switches to star candidates: only pairs through doc 0
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(df, max_bucket=3).collect()
    }
    assert capped == {(0, b) for b in range(1, 8)}


def test_ivf_build_sparse_ids(spark):
    """Seeding must not assume dense vec_ids starting at 0."""
    import numpy as np

    from bids2table_spark.operators.similarity import ivf_build, ivf_topk

    rng = np.random.default_rng(11)
    rows = [
        (int(1_000_000 + 7 * i), rng.normal(size=8).astype(float).tolist())
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_build(emb, n_centroids=4, iters=2)
    assert len(cents) == 4 and all(len(c) == 8 for c in cents)
    with pytest.raises(ValueError, match="n_centroids"):
        ivf_build(emb, n_centroids=100, iters=1)


def test_ivf_arrow_assignment_matches_literal(spark):
    """The Arrow matmul path (scale path past IVF_ARROW_CELLS) must assign
    every vector to the same centroid as the literal-expression path."""
    import numpy as np

    from bids2table_spark.operators import similarity as S

    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(size=12).astype(float).tolist()) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = emb.select("vec_id", S._as_double(F.col("embedding")).alias("v"))
    cents = S.ivf_build(emb, n_centroids=6, iters=2)
    lit = {r["vec_id"]: r["cid"] for r in
           base.withColumn("cid", S._assign_cid(F.col("v"), cents)).collect()}
    arrow = {r["vec_id"]: r["cid"] for r in
             base.withColumn("cid", S.make_assign_udf(cents)(F.col("v"))).collect()}
    assert lit == arrow
    # probe UDF agrees with the literal probe ordering
    q = spark.createDataFrame(rows[:5], "query_id long, qv array<double>")
    probe = {r["query_id"]: list(r["p"]) for r in
             q.select("query_id", S.make_probe_udf(cents, 3)(F.col("qv")).alias("p")).collect()}
    import pyspark.sql.functions as FF
    ps = FF.array(*[
        FF.struct(S._dist2(FF.col("qv"), S._cent_lit(c)).alias("d"), FF.lit(j).alias("cid"))
        for j, c in enumerate(cents)
    ])
    lit_probe = {r["query_id"]: list(r["p"]) for r in q.select(
        "query_id",
        FF.transform(FF.slice(FF.array_sort(ps), 1, 3), lambda s: s["cid"]).alias("p"),
    ).collect()}
    assert probe == lit_probe
    # ivf_topk still returns k ranked hits per query through assign_cells
    top = S.ivf_topk(emb, q, k=3, n_centroids=6, iters=2, n_probe=3)
    got = top.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in got)


def test_ivf_arrow_null_batches(spark):
    """All-null and mixed-null vector batches must not crash the Arrow
    assignment/probe path (null rows -> null cid / no probes)."""
    import numpy as np

    from bids2table_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    cents = [[round(float(x), 6) for x in rng.normal(size=6)] for _ in range(4)]
    mixed = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]), (2, None), (3, [0.5] * 6)],
        "vec_id long, v array<double>",
    )
    got = {r["vec_id"]: r["cid"] for r in
           mixed.withColumn("cid", S.make_assign_udf(cents)(F.col("v"))).collect()}
    assert got[2] is None and got[1] is not None and got[3] is not None
    allnull = spark.createDataFrame([(1, None), (2, None)], "vec_id long, v array<double>")
    got2 = {r["vec_id"]: r["cid"] for r in
            allnull.withColumn("cid", S.make_assign_udf(cents)(F.col("v"))).collect()}
    assert got2 == {1: None, 2: None}
    # probe UDF: null queries probe nothing, valid ones get n_probe cells
    q = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]), (2, None)],
        "query_id long, qv array<double>",
    )
    p = {r["query_id"]: r["p"] for r in
         q.select("query_id", S.make_probe_udf(cents, 2)(F.col("qv")).alias("p")).collect()}
    assert p[2] is None and len(p[1]) == 2


def test_winnow_full_windows_only(spark):
    """Truncated trailing windows must not fingerprint: two docs sharing
    ONLY their final k characters must share no fingerprint (below the
    w+k-1 guarantee threshold); docs shorter than w grams keep their
    whole-doc min."""
    from bids2table_spark.operators.text import fingerprint_winnow

    suffix = "ZZZZZZZZ"  # k=8 shared tail, nothing else in common
    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789" + suffix),
         (2, "THEQUICKBROWNFOXJUMPSOVERTHELAZYDOGS" + suffix)],
        "doc_id long, text string",
    )
    fps = fingerprint_winnow(df, k=8, w=16).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert not (by_doc[1] & by_doc[2]), "shared tail-only fingerprint leaked"
    # short doc (< w grams) still fingerprints via its whole-doc min
    short = spark.createDataFrame([(3, "tiny text!")], "doc_id long, text string")
    assert fingerprint_winnow(short, k=8, w=16).count() == 1
    # the guarantee itself: docs sharing a >= w+k-1 substring DO share one
    core = "SHAREDSUBSTRINGTHATISLONGENOUGHYES"  # 34 >= 16+8-1
    df2 = spark.createDataFrame(
        [(4, "xx" + core + "qqqqqqqqqq"), (5, "yyyyyyyy" + core + "zz")],
        "doc_id long, text string",
    )
    fp2 = fingerprint_winnow(df2, k=8, w=16).collect()
    bd = {}
    for r in fp2:
        bd.setdefault(r["doc_id"], set()).add(r["fp"])
    assert bd[4] & bd[5], "w+k-1 shared-substring guarantee broken"


def test_winnow_chunked_equals_whole_doc(spark):
    """Round-5 scale fix: the chunked winnow (overlapping char chunks, window
    per (doc_id, chunk)) must produce EXACTLY the single-window result, and a
    long doc must actually fan out over multiple chunks."""
    import random

    from bids2table_spark.operators.text import fingerprint_winnow

    rng = random.Random(17)
    # long docs spanning many chunks at chunk_chars=200, plus boundary-length
    # docs (exactly chunk, chunk±1, < k, < w grams) to pin the edge math
    docs = [
        (1, "".join(rng.choice("abcdefg ") for _ in range(1000))),
        (2, "".join(rng.choice("xyzw. ") for _ in range(999))),
        (3, "".join(rng.choice("mnop") for _ in range(200))),
        (4, "".join(rng.choice("qrst") for _ in range(201))),
        (5, "short"),          # < k chars
        (6, "justabouttwenty!"),  # < w grams
        (7, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    whole = fingerprint_winnow(df, k=8, w=16, chunk_chars=1 << 20)
    chunked = fingerprint_winnow(df, k=8, w=16, chunk_chars=200)

    def fp_sets(rows):
        out = {}
        for r in rows:
            out.setdefault(r["doc_id"], set()).add(r["fp"])
        return out

    assert fp_sets(chunked.collect()) == fp_sets(whole.collect())
    # the long doc really was processed as several chunks
    n_chunks = (
        df.filter(F.col("doc_id") == 1)
        .select(F.explode(F.expr("sequence(1, greatest(length(text) - 7, 1), 200)")))
        .count()
    )
    assert n_chunks >= 5


def _uf_clusters(n_nodes, edges):
    """Union-find reference: {node: min id of its component}."""
    parent = {v: v for e in edges for v in e} | {v: v for v in n_nodes}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_connected_components_matches_union_find(spark):
    from bids2table_spark.operators.dedup import connected_components

    # path 1-2-3-4, triangle 10-11-12 (+ chord), bridge 12-13, isolated pair
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
             (12, 13), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == _uf_clusters([], edges)


def test_connected_components_long_chain_converges(spark):
    """Pointer jumping: a 200-vertex path collapses well inside the round
    cap (min-only propagation would need ~200 rounds)."""
    from bids2table_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(200)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(pairs, max_iter=12).collect()
    assert len(out) == 201
    assert {r["cluster_id"] for r in out} == {0}


def test_dedup_clusters_canonical_rows(spark):
    """dedup_clusters: near-identical docs share a cluster; exactly one
    canonical row per cluster; singletons are their own canon."""
    from bids2table_spark.operators.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    rows = [
        (1, base), (2, base), (3, base + " tail"),
        (4, "completely different text about spark columnar encoding " * 4),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup_clusters(docs).collect()}
    assert got[1] == (1, True)
    assert got[2][0] == 1 and not got[2][1]
    assert got[4] == (4, True)
    n_canon = sum(1 for c, is_c in got.values() if is_c)
    assert n_canon == len({c for c, _ in got.values()})


def test_normalize_text_strips_and_collapses(spark):
    from bids2table_spark.operators.text import normalize_text

    rows = [(1, "  hello\x00\x01 world\t\t again \n"), (2, ""), (3, "a\x0bb")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert got[1]["norm_text"] == "hello world again"
    assert got[2]["norm_text"] == "" and got[2]["n_chars_after"] == 0
    # \x0B is a control char (stripped), not whitespace: no space survives
    assert got[3]["norm_text"] == "ab"
    assert got[3]["n_chars_before"] == 3 and got[3]["n_chars_after"] == 2


def test_vocab_topk_deterministic_tiebreak(spark):
    from bids2table_spark.operators.text import vocab_topk

    docs = spark.createDataFrame(
        [(1, "apple Apple banana"), (2, "banana cherry date"), (3, " ")],
        "doc_id long, text string",
    )
    out = vocab_topk(docs, k=3).collect()
    # apple(2, case-folded) and banana(2) tie -> alphabetical; cherry/date
    # tie at the k boundary -> cherry wins by token order
    assert [(r["token"], r["n"]) for r in out] == [
        ("apple", 2), ("banana", 2), ("cherry", 1),
    ]


def test_repetition_score_edges(spark):
    from bids2table_spark.operators.text import repetition_score

    rows = [
        (1, "spam spam spam spam"),          # one bigram repeated 3x
        (2, "a\nb\na\n\n  \nb"),             # 4 non-empty lines, 2 distinct
        (3, ""),                              # empty doc
        (4, "solo"),                          # 1 token: no bigrams
        (5, "x y\nx y\nx y"),                # all lines identical
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_score(docs).collect()}
    assert got[1]["top_bigram_frac"] == 1.0 and got[1]["dup_line_frac"] == 0.0
    assert abs(got[2]["dup_line_frac"] - 0.5) < 1e-12
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["top_bigram_frac"] == 0.0
    assert got[4]["top_bigram_frac"] == 0.0
    assert abs(got[5]["dup_line_frac"] - (1 - 1 / 3)) < 1e-12


def test_pack_sequences_chunks_and_offsets(spark):
    from bids2table_spark.operators.text import pack_sequences

    # one shard (n_shards=1): 3 docs of 3/5/4 tokens, seq_len=4
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f g h"), (2, "i j k l")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_off"])
        for r in pack_sequences(docs, seq_len=4, n_shards=1).collect()
    }
    # token stream offsets: doc0 starts at 0, doc1 at 3, doc2 at 8
    assert got == {0: (3, 0, 0), 1: (5, 0, 3), 2: (4, 2, 0)}


def test_pack_sequences_empty_doc_and_sharding(spark):
    from bids2table_spark.operators.text import pack_sequences

    docs = spark.createDataFrame(
        [(0, "  "), (1, "x y"), (2, "z"), (3, "w w w")],
        "doc_id long, text string",
    )
    rows = pack_sequences(docs, seq_len=2, n_shards=2).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # shard = doc_id % 2; empty doc consumes 0 tokens and doesn't shift others
    assert by_id[0]["shard"] == 0 and by_id[0]["n_tokens"] == 0
    assert by_id[2]["shard"] == 0 and by_id[2]["seq_off"] == 0  # after 0-token doc
    assert by_id[1]["shard"] == 1 and by_id[1]["seq_id"] == 0
    assert by_id[3]["shard"] == 1 and by_id[3]["seq_id"] == 1  # starts at offset 2


def test_sample_by_hash_deterministic_and_bounded(spark):
    from bids2table_spark.operators.text import sample_by_hash

    df = spark.range(2000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in sample_by_hash(df, "k", 0.2).collect())
    b = sorted(r["k"] for r in sample_by_hash(df.repartition(7), "k", 0.2).collect())
    assert a == b  # partitioning-independent
    assert 0.1 < len(a) / 2000 < 0.3
    # nested: a smaller fraction is a subset of a larger one (same hash ladder)
    c = set(r["k"] for r in sample_by_hash(df, "k", 0.05).collect())
    assert c <= set(a)
    assert sample_by_hash(df, "k", 0.0).count() == 0
    assert sample_by_hash(df, "k", 1.0).count() == 2000
    with pytest.raises(ValueError):
        sample_by_hash(df, "k", 1.5)


def test_ngram_decontaminate(spark):
    from bids2table_spark.operators.dedup import ngram_decontaminate

    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "completely unrelated words here nothing shared at all today"),
            (2, "tiny"),
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "quick brown fox jumps"), (101, "tiny")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_shared"]
        for r in ngram_decontaminate(corpus, evalset, n=4).collect()
    }
    # doc 0 shares the 4-gram "quick brown fox jumps"; doc 2 (< n tokens)
    # shingles to its whole text and matches eval doc 101 exactly
    assert got == {0: 1, 2: 1}


def test_minhash_signatures_cross_batch_merge(spark):
    """The numpy signature kernel merges per-batch partial minima: a doc
    whose exploded shingle rows are split across Arrow batches must yield
    the same signature as the single-batch path.  Forcing 16-row batches
    guarantees every multi-shingle doc crosses a batch boundary."""
    docs = spark.range(12).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta iota kappa "),
            F.lit("lambda mu nu xi omicron pi rho sigma tau upsilon doc "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
        tiny = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(docs, k=8).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    full = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(docs, k=8).collect()}
    assert tiny == full and len(full) == 12
