"""Text-analysis operators for training-data pipelines over ``documents``:
language-ID (stopword-marker heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting.
All built-in-expression only (JVM-side); each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..partitioning import spread_scan

# three high-frequency marker words per language; deterministic argmax with
# alphabetical tie-break
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "nicht"],
    "en": ["the", "and", "of"],
    "es": ["que", "los", "una"],
    "fr": ["les", "est", "une"],
}


def _tok(col: str = "text"):
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def lang_id(docs: DataFrame) -> DataFrame:
    """Predicted language = argmax over marker-word hit counts (ties ->
    alphabetically first; no hits -> 'und')."""
    toks = _tok()

    def eq_word(w: str):
        return lambda t: t == w

    scores = []
    for lang in sorted(LANG_MARKERS):
        score = None
        for wrd in LANG_MARKERS[lang]:
            hit = F.size(F.filter(toks, eq_word(wrd)))
            score = hit if score is None else score + hit
        scores.append((lang, score))
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, score in reversed(scores):  # earlier langs win ties
        pred = F.when((score == best_score) & (best_score > 0), lang).otherwise(pred)
    return spread_scan(docs, "doc_id").select("doc_id", "lang", pred.alias("pred_lang"))


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite quality: length, punctuation ratio, stopword ratio,
    uppercase ratio — rounded to 4 dp for oracle parity."""
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    n_upper = F.length(F.regexp_replace("text", r"[^A-Z]", ""))
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    toks = _tok()
    n_tokens = F.when(F.length(F.trim(F.col("text"))) == 0, 0).otherwise(F.size(toks))
    stop = F.size(
        F.filter(toks, lambda t: t.isin("the", "and", "of", "a", "to", "in", "is"))
    )
    stop_ratio = F.when(n_tokens > 0, stop / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_alpha > 0, n_upper / n_alpha).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.2) * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.1) * (1 - upper_ratio)
    )
    return spread_scan(docs, "doc_id").select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(score, 4).alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish subword count (regex pieces:
    word fragments of <=4 chars, digits, punctuation runs)."""
    ws = F.when(F.length(F.trim(F.col("text"))) == 0, 0).otherwise(
        F.size(_tok())
    ).cast("long")
    # BPE-ish: count pieces matched by the tokenizer-style regex
    pieces = F.regexp_count(
        F.lower(F.col("text")), F.lit(r"[a-z]{1,4}|[0-9]|[^a-z0-9\s]")
    ).cast("long")
    return spread_scan(docs, "doc_id").select(
        "doc_id", ws.alias("ws_tokens"), pieces.alias("bpe_tokens")
    )


def repetition_score(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document — the quality-filter
    rules that catch boilerplate and degenerate generations which plain
    length/stopword scores miss:

    * ``dup_line_frac``: fraction of non-empty trimmed lines that are
      duplicates of an earlier line (1 - distinct/total) — computed with
      pure array expressions, no explode, so it costs one codegen'd pass;
    * ``top_bigram_frac``: share of all word 2-grams taken by the single
      most frequent one.  Bigrams are built as an ARRAY expression
      (``transform(sequence(...))`` — no self-join, no per-doc window),
      then exploded into a two-level count/max aggregation: map-side
      partial counts make the shuffle O(distinct bigrams), not O(corpus),
      the same economics as ``vocab_topk``.

    Thresholding (e.g. drop docs with dup_line_frac > 0.3) is left to the
    caller — this operator only measures."""
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    dup_line_frac = F.when(
        F.size(lines) > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines),
    ).otherwise(F.lit(0.0))
    toks = F.when(
        F.length(F.trim(F.col("text"))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(_tok())
    base = spread_scan(docs, "doc_id").select(
        "doc_id", dup_line_frac.alias("dup_line_frac"), toks.alias("_toks")
    ).select(
        "doc_id",
        "dup_line_frac",
        F.when(
            F.size("_toks") >= 2,
            F.expr(
                "transform(sequence(0, size(_toks) - 2), "
                "i -> concat_ws(' ', _toks[i], _toks[i+1]))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("_bg"),
    )
    counts = (
        base.select("doc_id", F.explode("_bg").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        (F.max("c") / F.sum("c")).alias("top_bigram_frac")
    )
    return (
        base.select("doc_id", "dup_line_frac")
        .join(per_doc, on="doc_id", how="left")
        .select(
            "doc_id",
            F.col("dup_line_frac").cast("double").alias("dup_line_frac"),
            F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)).alias(
                "top_bigram_frac"
            ),
        )
    )


def fingerprint_winnow(
    docs: DataFrame, k: int = 8, w: int = 16, chunk_chars: int = 1 << 20
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003): hash
    every character k-gram, keep the minimum of each w-length window of
    consecutive positions, emit the DISTINCT selected hashes per doc.

    Guarantees at least one shared fingerprint for any shared substring of
    length >= w + k - 1 — the property the single-min ``fingerprint`` op
    lacks.

    SCALE SHAPE (round-5 fix for the carried whole-doc-window straggler): a
    document's k-grams are NOT all windowed in one task.  The text is split
    into overlapping character chunks of ``chunk_chars`` — each chunk carries
    ``w + k - 2`` extra trailing chars, exactly enough that every full
    w-window whose start position falls in the chunk's own range is computed
    locally — and the sliding MIN window partitions by (doc_id, chunk), so a
    book-length doc fans out over ~len/chunk_chars tasks instead of pinning
    one.  Chunk own-ranges are disjoint, so no window is emitted twice; the
    result is identical to the single-window formulation (pinned by
    tests/test_operators.py).

    Window-start math (1-based): gram i covers chars [i, i+k-1]; the full
    window at start i needs grams i..i+w-1, i.e. chars up to i+w+k-2.  A
    chunk starting at s spans chars [s, s+chunk_chars+w+k-3], so every
    start i in [s, s+chunk_chars-1] is locally computable.  Global full
    windows end at i = m-w+1 where m = L-k+1 grams; docs with m < w keep
    their whole-doc min (they fit in the first chunk by construction).

    Output: (doc_id, fp) fingerprint-set rows."""
    P = docs.sparkSession.sparkContext.defaultParallelism
    from pyspark.sql import Window

    C = int(chunk_chars)
    # chunk starts: 1, 1+C, 1+2C, … ≤ max(L-k+1, 1) — a chunk whose own
    # range holds no gram start would emit nothing; cap the sequence there
    chunks = docs.select(
        "doc_id",
        "text",
        F.length("text").alias("_len"),
        F.explode(
            F.expr(f"sequence(1, greatest(length(text) - {k - 1}, 1), {C})")
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s"),
        # m: GLOBAL gram count (short docs: one whole-text gram, matching
        # the single-window formulation's array(1) branch)
        F.greatest(F.col("_len") - (k - 1), F.lit(1)).alias("m"),
        F.expr(f"substring(text, s, {C} + {w + k - 2})").alias("ctext"),
    )
    grams = chunks.repartition(P, "doc_id", "s").select(
        "doc_id",
        "s",
        "m",
        F.posexplode(
            F.expr(
                f"case when length(ctext) >= {k} then "
                f"sequence(1, length(ctext) - {k - 1}) else array(1) end"
            )
        ).alias("_", "j"),
        F.col("ctext"),
    ).select(
        "doc_id",
        "s",
        "m",
        "j",
        F.conv(
            F.substring(F.md5(F.expr(f"substring(ctext, j, {k})")), 1, 8), 16, 10
        ).cast("long").alias("h"),
    )
    win = (
        Window.partitionBy("doc_id", "s")
        .orderBy("j")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = grams.select(
        "doc_id", "s", "m", "j",
        F.min("h").over(win).alias("fp"),
    )
    i = F.col("s") + F.col("j") - 1  # global gram start position
    # FULL windows only: truncated trailing windows would always fingerprint
    # the doc's last k-gram (a guaranteed shared print below the w+k-1
    # guarantee threshold).  Emit a window iff its global start is (a) in
    # this chunk's own range (disjoint across chunks — no double emit) and
    # (b) a full global window; docs with fewer than w grams keep their
    # whole-doc min via the first chunk's i=1 window.
    return (
        sel.filter(
            (F.col("j") <= C)
            & (
                (i <= F.col("m") - (w - 1))
                | ((F.col("m") < w) & (i == 1))
            )
        )
        .select("doc_id", "fp")
        .distinct()
    )


def fingerprint(docs: DataFrame, k: int = 8) -> DataFrame:
    """Winnowing-lite document fingerprint: lexicographic min of md5 over all
    character k-grams (k=8) — a deterministic near-dup key."""
    return spread_scan(docs, "doc_id").select(
        "doc_id",
        F.expr(
            f"case when length(text) >= {k} then "
            f"array_min(transform(sequence(1, length(text) - {k - 1}), "
            f"i -> md5(substring(text, i, {k})))) "
            f"else md5(text) end"
        ).alias("fp"),
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """Training-data text cleanup, pure Catalyst (whole-stage codegen, no
    Python): strip C0/DEL control characters (keeping \\t \\n \\r as
    whitespace), collapse every whitespace run to one space, trim.  Returns
    before/after char counts so a pipeline can filter on shrinkage (a doc
    that loses most of its bytes to normalization was mostly junk).
    Reference analog: the extract-side str cast/cleanup before insert
    (/root/reference/bids2table/schema.py:195-224 conforms values the same
    declarative way)."""
    stripped = F.regexp_replace(
        F.col("text"), r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""
    )
    collapsed = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return spread_scan(docs, "doc_id").select(
        "doc_id",
        collapsed.alias("norm_text"),
        F.length("text").cast("long").alias("n_chars_before"),
        F.length(collapsed).cast("long").alias("n_chars_after"),
    )


def vocab_topk(docs: DataFrame, k: int = 100, min_count: int = 1) -> DataFrame:
    """Corpus vocabulary: top-k lowercased whitespace tokens by frequency
    (ties broken by token text — deterministic).  The explode shuffles one
    (token, partial count) per distinct token per partition — map-side
    combine makes the shuffle O(vocab), not O(corpus); the final top-k is
    a single ORDER BY LIMIT over the merged counts (Spark's TakeOrdered,
    no full sort materialized).  This is the counting pass a BPE/unigram
    vocab induction starts from."""
    toks = spread_scan(docs, "doc_id").select(F.explode(_tok()).alias("token")).filter(
        F.length("token") > 0
    )
    counts = toks.groupBy(F.lower(F.col("token")).alias("token")).agg(
        F.count("*").alias("n")
    )
    return (
        counts.filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )


def pack_sequences(docs: DataFrame, seq_len: int = 2048, n_shards: int = 16) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style pretraining batching):
    documents are concatenated in ``doc_id`` order and the token stream is
    split into fixed ``seq_len`` windows; each document reports the shard,
    the sequence it STARTS in, and its token offset there.

    Packing is a prefix sum — inherently sequential — so real pipelines
    pack per SHARD: each shard is an independent token stream, and the
    window partitions by a deterministic ``doc_id % n_shards``.  One
    shuffle, ``n_shards``-way parallel (10k+ shards at 100 TB; a shard is
    whatever one trainer data-loader consumes).  Token count is the same
    whitespace tokenization as :func:`token_counts`, so the packing is
    reproducible from the raw text alone — no tokenizer state."""
    from pyspark.sql import Window

    ws = (
        F.when(F.length(F.trim(F.col("text"))) == 0, 0)
        .otherwise(F.size(_tok()))
        .cast("long")
    )
    t = spread_scan(docs, "doc_id").select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
        ws.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.select(
        "shard",
        "doc_id",
        "n_tokens",
        start.alias("_st"),
    ).select(
        "shard",
        "doc_id",
        "n_tokens",
        F.expr(f"CAST(_st DIV {int(seq_len)} AS BIGINT)").alias("seq_id"),
        (F.col("_st") % seq_len).cast("long").alias("seq_off"),
    )


def sample_by_hash(df: DataFrame, key_col: str, fraction: float, mod: int = 1_000_000) -> DataFrame:
    """Deterministic hash sampling: keep rows whose md5-derived bucket of
    ``key_col`` falls under ``fraction``.  The sample is a pure function of
    the key — stable across runs, machines, and engines (unlike
    ``DataFrame.sample``, whose output depends on partitioning), and
    co-sampling related tables on a shared key keeps them consistent.
    Partition-local (NO shuffle, no RNG state); the standard way to cut a
    reproducible eval slice out of a 100 TB corpus."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % mod
    )
    return df.filter(bucket < int(round(fraction * mod)))
