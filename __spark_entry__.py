"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every SQL-expressible operator from SURVEY.md §2 plus
the training-data pipeline operators (dedup / similarity / text analysis) and
the flagship transcript encode->decode round-trip; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each (omitted only for genuinely non-SQL ops,
which get the weaker rows-only check).

Column names are aliased identically on both sides; float results are
rounded on both sides so the value-hash comparison is stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


# ---------------------------------------------------------------- transcripts

def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcript view of the events table (so the decode
    round-trip has an exact SQL oracle)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"), F.lit("system"))
    return ev.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 12, "0")).alias("conv_id"),
        (rn - 1).cast("int").alias("turn_idx"),
        F.element_at(roles, (rn % 4) + 1).alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.when(rn % 3 == 0, F.col("event_type")).alias("tool"),
        F.col("ts"),
        F.concat(F.lit("pt-"), F.lpad((F.col("user_id") % 4).cast("string"), 4, "0")).alias("pt"),
    )


_TRANSCRIPTS_ORACLE = """
SELECT 'conv-' || lpad(user_id::VARCHAR, 12, '0') AS conv_id,
       (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::INTEGER AS turn_idx,
       (['user','assistant','tool','system'])[
           ((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)) % 4) + 1] AS role,
       coalesce(props, '') AS text,
       CASE WHEN (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)) % 3 = 0
            THEN event_type END AS tool,
       ts,
       'pt-' || lpad((user_id % 4)::VARCHAR, 4, '0') AS pt
FROM events
"""


def q_transcript_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: encode the transcript table with the full codec pipeline
    (stats -> selector plan -> salted groupBy -> numpy kernels) and decode it
    back; the oracle is the *un-encoded* transform — matching value hashes
    prove the round-trip is bit-identical."""
    from bids2table_spark.decode import decode_table
    from bids2table_spark.encode import encode_table
    from bids2table_spark.stats import plan_from_stats

    tr = transcripts_from_events(spark, sf_dir)
    plan = plan_from_stats(tr)  # default 5% sample — plenty for codec ranking
    blocks = encode_table(tr, plan=plan, block_rows=8192, target_group_rows=65536)
    return decode_table(blocks)


def typed_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic wide-typed view of events: boolean, float32, date,
    binary, array<float>, array<long>, array<string>, struct — the full
    round-2 physical type system."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    return ev.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 12, "0")).alias("conv_id"),
        (rn - 1).cast("int").alias("turn_idx"),
        (F.col("event_id") % 2 == 0).alias("flag"),
        F.col("value").cast("float").alias("score"),
        F.to_date("ts").alias("day"),
        F.encode(F.coalesce(F.col("props"), F.lit("")), "utf-8").alias("payload"),
        F.array((F.col("value") * 2).cast("float"), (F.col("value") + 1).cast("float")).alias("vec"),
        F.array(F.col("user_id"), F.col("event_id")).alias("ids"),
        F.split(F.col("event_type"), "_").alias("tags"),
        F.when(F.col("event_id") % 4 == 0, F.lit(None))
        .otherwise(
            F.struct(
                F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int").alias("k"),
                F.col("event_type").alias("w"),
            )
        )
        .alias("meta"),
        F.col("value").alias("val"),  # 2-decimal metric: the ALP target
        # round-3 nesting depth: tool-call struct with NESTED args struct
        F.when(F.col("event_id") % 5 == 0, F.lit(None))
        .otherwise(
            F.struct(
                F.col("event_type").alias("name"),
                F.when(F.col("event_id") % 3 == 0, F.lit(None))
                .otherwise(
                    F.struct(
                        (F.col("event_id") % 300).cast("long").alias("timeout"),
                        F.substring(F.coalesce(F.col("props"), F.lit("")), 1, 12).alias("cmd"),
                    )
                )
                .alias("args"),
            )
        )
        .alias("call"),
        # list<struct> content parts (second element null for odd events)
        F.when(F.col("event_id") % 6 == 0, F.lit(None))
        .otherwise(
            F.array(
                F.struct(F.lit("text").alias("kind"), (F.col("user_id") % 7).cast("long").alias("n")),
                F.when(
                    F.col("event_id") % 2 == 0,
                    F.struct(F.col("event_type").alias("kind"), F.col("event_id").alias("n")),
                ),
            )
        )
        .alias("parts"),
        # 2-D ndarray in the reference's {data, shape} layout
        F.when(F.col("event_id") % 9 == 0, F.lit(None))
        .otherwise(
            _pack2(
                F.array(
                    F.array(F.col("value"), F.col("value") * 3),
                    F.array(F.col("value") - 1, F.col("value") * F.col("value")),
                )
            )
        )
        .alias("mat"),
        F.concat(F.lit("pt-"), (F.col("user_id") % 4).cast("string")).alias("pt"),
    )


def _pack2(col):
    from bids2table_spark.functions import pack_ndarray

    return pack_ndarray(col, ndim=2)


def q_typed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the wide-typed table through the full codec pipeline, then
    scalarize the nested columns (sums / sizes / md5) so the driver's
    value-hash check bites.  Matching hashes prove bool/float/date/binary/
    list/struct all decode bit-identically — the oracle computes the same
    scalars from the *un-encoded* transform."""
    from bids2table_spark.decode import decode_table
    from bids2table_spark.encode import encode_table

    t = typed_from_events(spark, sf_dir)
    blocks = encode_table(t, block_rows=8192, target_group_rows=65536)
    dec = decode_table(blocks)
    return dec.select(
        "conv_id",
        "turn_idx",
        "flag",
        F.round(F.col("score").cast("double"), 4).alias("score_r"),
        F.col("day").cast("string").alias("day"),  # ISO string: stable cross-engine dtype
        F.md5("payload").alias("payload_md5"),
        F.round(
            (F.element_at("vec", 1).cast("double") + F.element_at("vec", 2).cast("double")), 4
        ).alias("vec_sum"),
        (F.element_at("ids", 1) + F.element_at("ids", 2)).alias("ids_sum"),
        F.size("tags").alias("n_tags"),
        F.col("meta.k").alias("meta_k"),
        F.col("meta.w").alias("meta_w"),
        "val",  # raw double: bit-identity means no rounding needed
        F.col("call.name").alias("call_name"),
        F.col("call.args.timeout").alias("call_timeout"),
        F.col("call.args.cmd").alias("call_cmd"),
        F.size("parts").alias("n_parts"),
        F.element_at("parts", 1).getField("n").alias("parts1_n"),
        F.element_at("parts", 2).getField("kind").alias("parts2_kind"),
        F.when(  # concat_ws would fold a NULL mat to '' — keep it NULL
            F.col("mat").isNotNull(),
            F.concat_ws("x", F.element_at("mat.shape", 1), F.element_at("mat.shape", 2)),
        ).alias("mat_shape"),
        F.round(
            F.aggregate(F.col("mat.data"), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("mat_sum"),
    )


def _codec_invariants(blocks, expected: dict[str, str] | None = None) -> DataFrame:
    """Per-column invariants the DuckDB oracle can state independently:
    sum(n_rows) == table count, every chosen codec is registered, encoded
    never exceeds canonical size (+small header slack), and — where the
    cost model's choice is data-forced — the expected codec was picked."""
    from bids2table_spark.codecs import CODECS

    known = F.col("codec").isin(*[F.lit(c) for c in CODECS])
    checks = blocks.groupBy(F.col("column").alias("col_name")).agg(
        F.sum("n_rows").alias("n_rows"),
        F.bool_and(known).alias("codec_known"),
        F.bool_and(F.col("enc_bytes") <= F.col("orig_bytes") + 64).alias("enc_le_orig"),
        F.array_sort(F.collect_set("codec")).alias("_codecs"),
    )
    exp = F.lit(True)
    if expected:
        exp = F.coalesce(
            *[
                F.when(F.col("col_name") == c, F.array_contains("_codecs", name))
                for c, name in expected.items()
            ],
            F.lit(True),
        )
    return checks.select(
        "col_name", "n_rows", "codec_known", "enc_le_orig", exp.alias("expected_codec")
    ).orderBy("col_name")


def q_transcript_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 selector invariants, oracle-checkable (round-1 was rows-only):
    per column, the block rows must cover every input row exactly once, use
    only registered codecs, and never exceed the canonical size."""
    from bids2table_spark.encode import encode_table
    from bids2table_spark.stats import plan_from_stats

    tr = transcripts_from_events(spark, sf_dir)
    plan = plan_from_stats(tr)
    blocks = encode_table(tr, plan=plan, block_rows=8192, target_group_rows=65536)
    return _codec_invariants(blocks)


def q_typed_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same invariants over the wide-typed table, plus the data-forced codec
    expectations: 2-decimal doubles -> alp (f64), the same metric cast to
    float32 -> alp (f32 variant, round 3); asserted only where forced by
    construction."""
    from bids2table_spark.encode import encode_table

    t = typed_from_events(spark, sf_dir)
    blocks = encode_table(t, block_rows=8192, target_group_rows=65536)
    return _codec_invariants(blocks, expected={"val": "alp", "score": "alp"})


# ----------------------------------------------------- reference operators

def q_key_merge_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 key-merge: two per-'handler' fragments outer-joined on the index
    key (bids2table/table.py:59-97)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    frag_a = orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("totalprice"),
    )
    frag_b = li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(28,6)")), 2)
        .cast("double")
        .alias("sum_qty"),
    )
    return frag_a.join(frag_b, on="orderkey", how="full_outer")


def q_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 resume filter: candidates minus processed (logging.py:133-164)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_anti"
    ).select("c_custkey", "c_name")


def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 dedup-keep-last (logging.py:86-89): latest event per user."""
    from bids2table_spark.operators.merge import dedup_keep_last

    ev = _t(spark, sf_dir, "events")
    return dedup_keep_last(ev, ["user_id"], "ts", tiebreak="event_id").select(
        "user_id", "event_id", "event_type", "value"
    )


def q_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 stable multi-key sort at batch finalize (table.py:115-126)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.orderBy("l_orderkey", "l_linenumber").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


def q_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 streaming counters as aggregation: totals + derived rate."""
    ev = _t(spark, sf_dir, "events")
    # total via an unpartitioned window over the (tiny) aggregate output —
    # no separate driver-side count() action / extra pass over events
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("_sum_v"),
    )
    total = F.sum("n").over(Window.partitionBy())
    return agg.select(
        "event_type",
        "n",
        "n_users",
        F.round(F.col("n") / total.cast("double"), 6).alias("frac"),
        F.round(F.col("_sum_v").cast("double") / F.col("n"), 4).alias("avg_value"),
    )


def q_run_length_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 RLE as SQL: run statistics of l_returnflag under the canonical
    (l_orderkey, l_linenumber) order.

    SCALE-SAFE: runs are detected inside range-contiguous l_orderkey
    buckets with a PARTITIONED window (the round-2 version ran one global
    unpartitioned window — a single-task sort of the whole table at 100x),
    then stitched at bucket boundaries: only each bucket's first and last
    run can merge across buckets, so the global window runs over <= 2
    rows per bucket (a ~BUCKET/rows-per-key reduction; recurse for more).
    Runs merge across missing bucket ids too — bucket ids are just
    orderkey ranges, so the previous PRESENT bucket's last run is the true
    predecessor.  Same output as the global-window formulation (the DuckDB
    oracle still computes it globally).

    The post-collapse ``runs`` frame (one row per flag run — orders of
    magnitude smaller than lineitem) is materialized ONCE via an eager
    localCheckpoint: interior and boundary both branch off it, and without
    it Spark recomputes the full scan+window subtree per branch (round-4
    plans showed 2 lineitem FileScans, no ReusedExchange even under AQE).
    localCheckpoint, not persist(): SQL-cache entries live in the
    CacheManager until an explicit unpersist (a session-lifetime pin this
    function cannot release, and one that lets a repeated identical call
    serve from the first call's cache — a benchmark lie), while checkpoint
    blocks are freed by the ContextCleaner when the returned frame is
    GC'd, and every call recomputes honestly.  Caveat: checkpoint blocks
    are not recomputable on executor loss — acceptable for a collapsed
    frame this small (re-run the query)."""
    BUCKET = 1024  # whole orderkeys per bucket: order within/across preserved
    li = _t(spark, sf_dir, "lineitem")
    wb = Window.partitionBy("bucket").orderBy(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    flagged = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.floor(F.col("l_orderkey") / BUCKET).alias("bucket"),
    ).select(
        "*",
        F.when(
            F.lag("l_returnflag").over(wb).isNull()
            | (F.lag("l_returnflag").over(wb) != F.col("l_returnflag")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    ).withColumn(
        "run_id", F.sum("is_start").over(wb.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = flagged.groupBy("bucket", "run_id", "l_returnflag").agg(
        F.count("*").alias("run_len")
    )
    nb = Window.partitionBy("bucket")
    runs = runs.withColumn("n_runs_b", F.max("run_id").over(nb)).localCheckpoint()
    interior = runs.filter(
        (F.col("run_id") > 1) & (F.col("run_id") < F.col("n_runs_b"))
    ).select("l_returnflag", "run_len")
    # boundary runs: <= 2 per bucket; adjacent bucket-edge runs with equal
    # flags chain into one merged run (running-sum chain ids, tiny input)
    wg = Window.orderBy("bucket", "run_id")
    boundary = runs.filter(
        (F.col("run_id") == 1) | (F.col("run_id") == F.col("n_runs_b"))
    ).select(
        "bucket", "run_id", "l_returnflag", "run_len",
        (F.col("run_id") == F.col("n_runs_b")).alias("is_last"),
    )
    boundary = boundary.withColumn(
        "merge_prev",
        (F.col("run_id") == 1)
        & F.coalesce(F.lag("is_last").over(wg), F.lit(False))
        & (F.lag("l_returnflag").over(wg) == F.col("l_returnflag")),
    ).withColumn(
        "chain_id",
        F.sum((~F.col("merge_prev")).cast("long")).over(
            wg.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    chains = boundary.groupBy("chain_id", "l_returnflag").agg(
        F.sum("run_len").alias("run_len")
    ).select("l_returnflag", "run_len")
    all_runs = interior.unionByName(chains)
    return all_runs.groupBy("l_returnflag").agg(
        F.count("*").alias("n_runs"),
        F.round(F.avg("run_len"), 4).alias("avg_run_len"),
        F.max("run_len").alias("max_run_len"),
    )


def q_delta_stats_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 delta as SQL: per-user timestamp deltas (ts - lag(ts))."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).alias("delta_us"),
    ).filter(F.col("delta_us").isNotNull())
    return d.groupBy("user_id").agg(
        F.count("*").alias("n_deltas"),
        F.round(F.avg("delta_us") / 1e6, 4).alias("avg_delta_s"),
        F.round(F.max("delta_us") / 1e6, 4).alias("max_delta_s"),
    )


def q_stats_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 selector inputs as SQL: exact NDV / min / max / avg-length stats."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        F.countDistinct("l_partkey").alias("ndv_partkey"),
        F.countDistinct("l_returnflag").alias("ndv_returnflag"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.avg(F.length("l_returnflag")), 4).alias("avg_flag_len"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


def q_schema_cast_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P7 schema-conform projection: declared order, casts, null-fill of
    a missing column (handlers/handler.py:130-143, schema.py:195-224)."""
    from bids2table_spark.operators.merge import conform_schema

    orders = _t(spark, sf_dir, "orders")
    return conform_schema(
        orders,
        {
            "o_orderkey": "long",
            "o_custkey": "long",
            "o_totalprice": "double",
            "o_orderdate_str": "string",   # missing -> null-filled
            "o_orderpriority": "string",
        },
    )


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 regex entity extraction with typed cast (indexers/bids.py:54-124)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int").alias("k_value"),
        F.regexp_extract(F.col("event_type"), r"^([a-z]+)", 1).alias("type_word"),
    )


def q_pattern_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 pattern-pruned scan: LIKE filter + per-source counts."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source").like("src1%"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("n_chars"), 4).alias("avg_chars"))
    )


def q_overlap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 overlap-threshold QA gate: keep rows whose non-null fraction over
    the declared field set >= 0.75 (handlers/handler.py:89-107)."""
    tr = transcripts_from_events(spark, sf_dir)
    fields = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    nn = sum(F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in fields)
    return (
        tr.withColumn("overlap", F.round(nn / F.lit(float(len(fields))), 4))
        .filter(F.col("overlap") >= 0.75)
        .groupBy("role")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("overlap").cast("decimal(28,6)")).cast("double") / F.count("*"), 4
            ).alias("avg_overlap"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (classic OLAP pattern; the streaming-less
    analog of session_window): new session when gap > 30 min."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp")
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0).alias("is_new"),
    ).withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # decimal-cast before summing: double addition is order-dependent and a
    # .xx5 boundary can round differently between runs (round-1 flake)
    return flagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
        .cast("double")
        .alias("session_value"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 line items by revenue per returnflag (window row_number <= k)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    w = Window.partitionBy("l_returnflag").orderBy(
        rev.desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("revenue", rev)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("l_returnflag", "rnk", "l_orderkey", "l_linenumber", "revenue")
    )


def q_streaming_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming encode (readStream -> foreachBatch resumable
    encode_job with epoch-scoped groups) round-trip: the decoded committed
    state must equal the un-encoded transform bit-for-bit (same oracle as
    the batch flagship)."""
    import shutil

    from bids2table_spark.manifest import decode_job
    from bids2table_spark.streaming import encode_stream

    base = _mat_dir(sf_dir, "stream")
    shutil.rmtree(base, ignore_errors=True)
    src, out = f"{base}/src", f"{base}/enc"
    tr = transcripts_from_events(spark, sf_dir)
    tr.write.mode("overwrite").parquet(src)
    q = encode_stream(
        spark, src, out, schema=spark.read.parquet(src).schema,
        target_group_rows=65536,
    )
    q.awaitTermination(600)
    return decode_job(spark, out)


def q_streaming_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts (Structured Streaming append
    mode): hourly event counts per event_type; the watermark (10 min behind
    max event time) deterministically withholds the trailing window(s), and
    the oracle states the same closed-window predicate in SQL."""
    import hashlib
    import shutil

    from bids2table_spark.streaming import windowed_counts_stream

    base = _mat_dir(sf_dir, "swin")
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/src"
    # watermarks require TIMESTAMP (not NTZ); session TZ is UTC so the cast
    # is value-preserving, and win_start casts back to NTZ for the oracle
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    ev.write.mode("overwrite").parquet(src)
    qname = "b2t_win_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    q = windowed_counts_stream(
        spark, src, schema=spark.read.parquet(src).schema, query_name=qname
    )
    q.awaitTermination(600)
    return spark.table(qname).select(
        F.col("w.start").cast("timestamp_ntz").alias("win_start"),
        F.col("event_type"),
        F.col("n"),
    )


_STREAMING_WINDOWED_SQL = """
WITH m AS (SELECT max(ts) AS mx FROM events),
w AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT win_start, event_type, n FROM w, m
WHERE win_start + INTERVAL 1 HOUR <= mx - INTERVAL 10 MINUTE
"""


def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    sessionization where state = the open session.  A session emits exactly
    once, when a later event closes it (gap > 30 min); each user's final
    open session stays in state — so the oracle is the batch sessionization
    minus every user's last session."""
    import hashlib
    import shutil

    from bids2table_spark.streaming import sessionize_stream

    base = _mat_dir(sf_dir, "ssess")
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/src"
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    ev.write.mode("overwrite").parquet(src)
    qname = "b2t_ssess_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    agg = sessionize_stream(spark, src, schema=spark.read.parquet(src).schema)
    q = (
        agg.writeStream.outputMode("append").format("memory").queryName(qname)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(600)
    return spark.table(qname).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )


_STREAMING_SESSIONIZE_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s2 AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
  FROM s),
agg AS (
  SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end,
         count(*)::BIGINT AS n_events
  FROM s2 GROUP BY 1, 2),
mx AS (SELECT user_id, max(sid) AS last_sid FROM agg GROUP BY 1)
SELECT a.user_id, a.session_start, a.session_end, a.n_events
FROM agg a JOIN mx USING (user_id) WHERE a.sid < mx.last_sid
"""


def q_decode_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + partition pushdown THROUGH the codec layer: decode only
    (conv_id, turn_idx, role) of two pts — unrequested columns' payloads are
    pruned at the blocks parquet scan, never decoded."""
    import shutil

    from bids2table_spark.manifest import decode_job, encode_job

    base = _mat_dir(sf_dir, "proj")
    shutil.rmtree(base, ignore_errors=True)
    tr = transcripts_from_events(spark, sf_dir)
    encode_job(spark, tr, f"{base}/enc", run_id="proj", target_group_rows=65536)
    dec = decode_job(
        spark, f"{base}/enc",
        columns=["conv_id", "turn_idx", "role"],
        pts=["pt-0001", "pt-0002"],
    )
    return dec.groupBy("pt", "role").agg(
        F.count("*").alias("n"),
        F.min("conv_id").alias("min_conv"),
        F.max("turn_idx").alias("max_turn"),
    )


def q_evolution_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution end-to-end: encode HALF the groups WITHOUT `tool`,
    append the remaining groups at the full schema (on_new_columns='allow'),
    then re-run with on_new_columns='backfill' — exactly the stale groups
    are rewritten under the new run_id (latest committed row supersedes,
    Iceberg-rewrite semantics) — and vacuum the fully superseded run dir.
    The oracle is the complete un-encoded table: matching value hashes
    prove the backfilled groups decode bit-identically with NO null-filled
    holes, and that the vacuum deleted nothing live."""
    import shutil

    from bids2table_spark.manifest import decode_job, encode_job, vacuum_job

    base = _mat_dir(sf_dir, "bfill")
    shutil.rmtree(base, ignore_errors=True)
    out = f"{base}/enc"
    tr = transcripts_from_events(spark, sf_dir)
    encode_job(spark, tr.drop("tool"), out, run_id="bf1",
               target_group_rows=65536, max_groups=2)
    encode_job(spark, tr, out, run_id="bf2", target_group_rows=65536,
               on_new_columns="allow")
    encode_job(spark, tr, out, run_id="bf3", target_group_rows=65536,
               on_new_columns="backfill")
    vacuum_job(spark, out)  # bf1 is now fully superseded
    return decode_job(spark, out).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "pt"
    )


def q_decode_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruned range decode: only blocks whose (zmin, zmax) key
    range overlaps the requested conv range are read and decoded; the exact
    predicate is applied after."""
    import shutil

    from bids2table_spark.manifest import decode_job, encode_job

    lo, hi = "conv-000000000010", "conv-000000000019"
    base = _mat_dir(sf_dir, "zone")
    shutil.rmtree(base, ignore_errors=True)
    tr = transcripts_from_events(spark, sf_dir)
    encode_job(spark, tr, f"{base}/enc", run_id="zone", target_group_rows=65536)
    dec = decode_job(spark, f"{base}/enc", key_range=(lo, hi))
    return dec.filter(F.col("conv_id").between(lo, hi)).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "pt"
    )


def q_decode_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruned range decode over a NUMERIC sort key WITH NULLS —
    pins the phys-typed zone-key images end-to-end (round-4 fix for the
    float64-promoted nullable-int image): encode keyed on a nullable
    BIGINT, decode with native-int ``key_range`` bounds, exact predicate
    applied after the block prune."""
    import shutil

    from bids2table_spark.manifest import decode_job, encode_job

    ev = _t(spark, sf_dir, "events")
    df = ev.select(
        F.concat(F.lit("pt-"), F.lpad((F.col("user_id") % 4).cast("string"), 4, "0")).alias("pt"),
        F.when(F.col("event_id") % 97 == 0, F.lit(None))
        .otherwise(F.col("event_id"))
        .alias("ekey"),
        "user_id", "event_type", "value", "ts",
    )
    base = _mat_dir(sf_dir, "zone_num")
    shutil.rmtree(base, ignore_errors=True)
    encode_job(
        spark, df, f"{base}/enc", run_id="zonenum",
        key_cols=("ekey", "user_id"), conv_col="user_id",
        target_group_rows=65536,
    )
    dec = decode_job(spark, f"{base}/enc", key_range=(100, 399))
    return dec.filter(F.col("ekey").between(100, 399)).select(
        "pt", "ekey", "user_id", "event_type", "value", "ts"
    )


def q_decode_filter_nonkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-COLUMN zone-map pruned decode (round 5): the sort key is
    conv_id, but the predicate is a ts RANGE — ``col_ranges`` prunes chunks
    by each block's own (cmin, cmax) before any payload is decoded, then
    the exact predicate runs downstream.  The candidate pass reads only
    metadata columns (payload bytes never scanned — see EXPLAIN.md)."""
    import shutil

    import pandas as pd

    from bids2table_spark.manifest import decode_job, encode_job

    lo, hi = pd.Timestamp("2024-01-10"), pd.Timestamp("2024-01-12")
    base = _mat_dir(sf_dir, "colzone")
    shutil.rmtree(base, ignore_errors=True)
    tr = transcripts_from_events(spark, sf_dir)
    encode_job(spark, tr, f"{base}/enc", run_id="colzone", block_rows=4096,
               target_group_rows=32768)
    dec = decode_job(spark, f"{base}/enc", col_ranges={"ts": (lo, hi)})
    return dec.filter(
        F.col("ts").between(F.lit("2024-01-10"), F.lit("2024-01-12"))
    ).select("conv_id", "turn_idx", "role", "text", "tool", "ts", "pt")


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across encode runs (round 5): batch A (base
    schema) and batch B (adds ``n_chars int``) land in ONE out_dir under
    separate group prefixes; decode yields the union schema with typed
    NULLs for A's groups — the reference's null-fill cast
    (bids2table/schema.py:195-224) re-expressed over the block container
    via the colmeta column ledger."""
    import shutil

    from bids2table_spark.manifest import decode_job, encode_job

    base = _mat_dir(sf_dir, "evolve")
    shutil.rmtree(base, ignore_errors=True)
    tr = transcripts_from_events(spark, sf_dir)
    uid = F.regexp_extract("conv_id", r"conv-0*(\d+)", 1).cast("long")
    batch_a = tr.filter(uid % 2 == 0)
    batch_b = tr.filter(uid % 2 == 1).withColumn(
        "n_chars", F.length("text").cast("int")
    )
    out = f"{base}/enc"
    encode_job(spark, batch_a, out, run_id="evA", group_prefix="a:",
               target_group_rows=32768)
    encode_job(spark, batch_b, out, run_id="evB", group_prefix="b:",
               target_group_rows=32768)
    return decode_job(spark, out).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "pt", "n_chars"
    )


def q_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction (round 5): three small incremental appends (each its own
    group_prefix — the streaming-epoch shape) leave many undersized groups;
    ``compact_job`` rewrites them into full-size groups and tombstones the
    originals in the same manifest append (Iceberg RewriteDataFiles /
    bin-pack semantics), then ``vacuum_job`` drops the superseded run dirs.
    The oracle is the complete un-encoded table: matching value hashes
    prove the rewrite is bit-identical and nothing was double-served or
    lost across the supersede."""
    import shutil

    from bids2table_spark.manifest import compact_job, decode_job, encode_job, vacuum_job

    base = _mat_dir(sf_dir, "compact")
    shutil.rmtree(base, ignore_errors=True)
    out = f"{base}/enc"
    tr = transcripts_from_events(spark, sf_dir)
    uid = F.regexp_extract("conv_id", r"conv-0*(\d+)", 1).cast("long")
    for i in range(3):
        encode_job(spark, tr.filter(uid % 3 == i), out, run_id=f"cp{i}",
                   group_prefix=f"e{i}:", target_group_rows=65536)
    res = compact_job(spark, out, target_group_rows=262_144)
    assert res["groups_compacted"] >= 2, res
    vacuum_job(spark, out)
    return decode_job(spark, out).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "pt"
    )


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel (round 5): two append runs, then read the table AS OF
    the first commit via ``decode_job(as_of=run_id)`` — the append-only
    manifest replays the latest-committed-row vote at that instant, so the
    second batch vanishes.  The oracle is the first batch's un-encoded
    slice."""
    import shutil

    from bids2table_spark.manifest import decode_job, encode_job

    base = _mat_dir(sf_dir, "ttravel")
    shutil.rmtree(base, ignore_errors=True)
    out = f"{base}/enc"
    tr = transcripts_from_events(spark, sf_dir)
    uid = F.regexp_extract("conv_id", r"conv-0*(\d+)", 1).cast("long")
    encode_job(spark, tr.filter(uid % 2 == 0), out, run_id="tt1",
               group_prefix="a:", target_group_rows=65536)
    encode_job(spark, tr.filter(uid % 2 == 1), out, run_id="tt2",
               group_prefix="b:", target_group_rows=65536)
    return decode_job(spark, out, as_of="tt1").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "pt"
    )


# ------------------------------------------------------- ingestion loaders


def _mat_dir(sf_dir: str, tag: str) -> str:
    import hashlib
    import os
    import tempfile

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"b2t_{tag}_{h}")


def q_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 CSV source: materialize nation as CSV, read back via the loader
    with a declared schema, aggregate (loaders/text.py:21-56 parity)."""
    from bids2table_spark.sources.text import csv_source

    nation = _t(spark, sf_dir, "nation")
    path = _mat_dir(sf_dir, "csv")
    nation.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    df = csv_source(
        spark, path,
        schema="n_nationkey long, n_name string, n_regionkey long, n_comment string",
    )
    return df.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"), F.min("n_name").alias("first_name")
    )


def q_tsv_array_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/S7 array-TSV source: delimiter-packed array cells in a TSV, parsed
    to typed arrays (loaders/text.py:59-87 parity)."""
    from bids2table_spark.sources.text import tsv_array_column, tsv_source

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.concat_ws(
            ",",
            F.col("l_quantity").cast("string"),
            F.col("l_linenumber").cast("string"),
            (F.col("l_quantity") * 2).cast("string"),
        ).alias("vals"),
    )
    path = _mat_dir(sf_dir, "tsv")
    li.coalesce(2).write.mode("overwrite").option("header", True).option("sep", "\t").csv(path)
    df = tsv_source(spark, path, schema="l_orderkey long, l_linenumber int, vals string")
    df = tsv_array_column(df, "vals", cast="double")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.aggregate("vals", F.lit(0.0), lambda a, x: a + x), 4).alias("vals_sum"),
        F.size("vals").alias("n_vals"),
    )


def q_json_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 JSON-dict source: from_json over the props column
    (loaders/text.py:90-109 parity; round-1 only regex'd it)."""
    from bids2table_spark.sources.text import json_dict_source

    ev = _t(spark, sf_dir, "events")
    parsed = json_dict_source(ev, "props", "k int")
    return parsed.select(
        "event_id",
        F.col("props_parsed.k").alias("k"),
        (F.col("props_parsed.k") % 10).alias("k_bucket"),
    )


def q_path_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 path source: input_file_name attached and aggregated."""
    from bids2table_spark.sources.text import with_source_path

    docs = with_source_path(_t(spark, sf_dir, "documents"))
    return docs.groupBy(
        F.regexp_extract("source_path", r"([^/]+\.parquet)", 1).alias("file")
    ).agg(F.count("*").alias("n"))


def q_schema_infer_example(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 example-based schema inference: conform orders to the schema
    inferred from one example record (handlers/wrap.py:44-66 parity) —
    declared order, casts, null-fill of missing columns."""
    from bids2table_spark.sources.text import conform_to_example

    example = {
        "o_orderkey": 0,
        "o_totalprice": 0.0,
        "o_missing_note": "",
        "o_orderpriority": "",
        "o_urgent": True,
    }
    orders = _t(spark, sf_dir, "orders").withColumn(
        "o_urgent", F.col("o_orderpriority") == "1-URGENT"
    )
    return conform_to_example(orders, example)


# ----------------------------------------------------------- multimodal ops

def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 multimodal plumbing, oracle-checked: the deterministic media table
    (binary payload + typed metadata) reproduced byte-for-byte — DuckDB
    rebuilds the sha256-chain payloads as hex strings (it cannot hash
    blobs, so identity is asserted via length + hex prefix)."""
    from bids2table_spark.operators.multimodal import synth_media

    m = synth_media(spark, n=200)
    return m.select(
        "media_id", "kind", "mime", "width", "height", "duration_ms",
        F.length("payload").alias("n_bytes"),
        F.substring(F.hex("payload"), 1, 32).alias("payload_hex32"),
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling grid (posexplode over the duration grid)."""
    from bids2table_spark.operators.multimodal import frame_sample, synth_media

    m = synth_media(spark, n=200)
    return frame_sample(m, every_ms=500).select("media_id", "frame_idx", "ts_ms")


_MEDIA_ORACLE_BASE = """
  SELECT i AS media_id,
         (['image','audio','video'])[(i % 3) + 1] AS kind,
         sha256('42:' || i::VARCHAR) AS hx,
         ('0x' || substr(sha256('42:' || i::VARCHAR), 1, 2))::INT AS b0,
         ('0x' || substr(sha256('42:' || i::VARCHAR), 3, 2))::INT AS b1,
         ('0x' || substr(sha256('42:' || i::VARCHAR), 5, 2))::INT AS b2,
         ('0x' || substr(sha256('42:' || i::VARCHAR), 7, 2))::INT AS b3
  FROM generate_series(0, 199) g(i)
"""

_MEDIA_METADATA_SQL = f"""
WITH base AS ({_MEDIA_ORACLE_BASE}),
m AS (
  SELECT media_id, kind,
         CASE kind WHEN 'image' THEN 'image/png' WHEN 'audio' THEN 'audio/wav'
                   ELSE 'video/mp4' END AS mime,
         CASE WHEN kind <> 'audio' THEN 64 + (b1 % 64) END AS width,
         CASE WHEN kind <> 'audio' THEN 64 + (b2 % 64) END AS height,
         CASE WHEN kind <> 'image' THEN 1000 + b3 * 10 END AS duration_ms,
         256 + b0 * 16 AS n_bytes,
         upper(substr(repeat(hx, (256 + b0 * 16) // 32 + 1), 1, 32)) AS payload_hex32
  FROM base)
SELECT * FROM m
"""

def q_binary_file_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 real out-of-band binary ingestion: the synthetic media payloads are
    materialized as actual files once, then read back with the distributed
    ``binaryFile`` source; id/kind parsed from the PATH (FilePointer parity —
    bids2table/utils.py:78-160) and the payload bytes verified against the
    same sha256-chain oracle as the in-memory table."""
    from bids2table_spark.sources.binary import media_from_files, write_media_files

    root = write_media_files(_mat_dir(sf_dir, "media"), n=200, seed=42)
    m = media_from_files(spark, root)
    return m.select(
        "media_id", "kind", "n_bytes",
        F.substring(F.hex("payload"), 1, 32).alias("payload_hex32"),
    )


_BINARY_FILE_INGEST_SQL = f"""
WITH base AS ({_MEDIA_ORACLE_BASE})
SELECT media_id, kind, (256 + b0 * 16)::BIGINT AS n_bytes,
       upper(substr(repeat(hx, (256 + b0 * 16) // 32 + 1), 1, 32)) AS payload_hex32
FROM base
"""


def q_path_list_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 path-list / work-list source (engine.py:229-282 parity): a .txt
    work list (with comments/blanks) selects a subset of the on-disk media
    files; only listed files are loaded (driver-sized lists go straight to
    load(*paths) so unlisted files are never opened)."""
    import os

    from bids2table_spark.sources.binary import (
        binaries_from_path_list,
        path_list_source,
        write_media_files,
    )

    n_media, media_seed = 200, 42
    root = write_media_files(_mat_dir(sf_dir, "media"), n=n_media, seed=media_seed)
    list_path = os.path.join(_mat_dir(sf_dir, "medialist"), "worklist.txt")
    # stamp the worklist with the fixture params: a fixture rebuild (n/seed
    # change deletes stale media_* files) must invalidate the cached list,
    # or it would name absolute paths to files that no longer exist
    stamp_path = list_path + ".stamp"
    stamp = f"{n_media}:{media_seed}"
    stale = not os.path.isfile(stamp_path) or open(stamp_path).read() != stamp
    if not os.path.isfile(list_path) or stale:
        os.makedirs(os.path.dirname(list_path), exist_ok=True)
        names = sorted(f for f in os.listdir(root) if f.startswith("media_"))
        lines = ["# media work list (ids with id % 7 < 3)", ""]
        lines += [
            os.path.join(root, f)
            for f in names
            if int(f.split("_")[1].split(".")[0]) % 7 < 3
        ]
        with open(list_path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        with open(stamp_path, "w") as fh:
            fh.write(stamp)
    listed = path_list_source(spark, list_path)
    df = binaries_from_path_list(spark, root, listed)
    return df.select(
        F.regexp_extract(F.col("path"), r"media_(\d+)\.", 1)
        .cast("long")
        .alias("media_id"),
        F.col("length").alias("n_bytes"),
        F.substring(F.hex("content"), 1, 32).alias("payload_hex32"),
    )


_PATH_LIST_INGEST_SQL = f"""
WITH base AS ({_MEDIA_ORACLE_BASE})
SELECT media_id, (256 + b0 * 16)::BIGINT AS n_bytes,
       upper(substr(repeat(hx, (256 + b0 * 16) // 32 + 1), 1, 32)) AS payload_hex32
FROM base WHERE media_id % 7 < 3
"""


_FRAME_SAMPLE_SQL = f"""
WITH base AS ({_MEDIA_ORACLE_BASE}),
v AS (SELECT media_id, 1000 + b3 * 10 AS duration_ms FROM base WHERE kind = 'video'),
e AS (SELECT media_id, unnest(generate_series(0, duration_ms // 500)) AS frame_idx FROM v)
SELECT media_id, frame_idx, frame_idx * 500 AS ts_ms FROM e
"""


# ------------------------------------------------ training-data pipeline ops

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over the LSH candidate
    pairs (distributed min-label propagation + pointer jumping), min doc_id
    canonical.  Oracle reproduces the fixpoint with a recursive CTE over
    the same pair SQL."""
    from bids2table_spark.operators.dedup import dedup_clusters

    return dedup_clusters(_t(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.2)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.dedup import simhash64

    return simhash64(_t(spark, sf_dir, "documents"))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.dedup import embedding_neardup

    return embedding_neardup(_t(spark, sf_dir, "embeddings"), threshold=0.8)


def _queries_df(spark: SparkSession, sf_dir: str, n: int = 5) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("qv"),
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.similarity import cosine_topk

    return cosine_topk(_t(spark, sf_dir, "embeddings"), _queries_df(spark, sf_dir), k=5)


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.similarity import cosine_topk_lsh

    return cosine_topk_lsh(_t(spark, sf_dir, "embeddings"), _queries_df(spark, sf_dir), k=5)


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic Lloyd centroids (init = first 16 vectors, 3
    iterations, 6dp means, 4dp distances), probe 4 cells, exact cosine
    inside — the adaptive-cell scale path next to the SRP-LSH variant."""
    from bids2table_spark.operators.similarity import ivf_topk

    return ivf_topk(_t(spark, sf_dir, "embeddings"), _queries_df(spark, sf_dir), k=5)


def _ivf_oracle(n_centroids: int = 16, iters: int = 3, n_probe: int = 4, k: int = 5) -> str:
    """DuckDB reproduction of ivf_topk: the Lloyd iterations unroll to CTEs
    (assign -> per-dim mean -> rebuild-with-fallback), using the identical
    rounded arithmetic (4dp distances via the dot identity, 6dp means)."""
    dist = (
        "round(list_dot_product({v}, {v}) - 2 * list_dot_product({v}, {c}) "
        "+ list_dot_product({c}, {c}), 4)"
    )
    sql = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
c0 AS (
  -- seed = first n_centroids vectors in id ORDER with POSITIONAL cids,
  -- mirroring ivf_build's orderBy/limit seeding (sparse/offset id spaces)
  SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cid,
         list_transform(v, x -> round(x, 6)) AS c
  FROM (SELECT * FROM v ORDER BY vec_id LIMIT {n_centroids}))"""
    for t in range(iters):
        d = dist.format(v="v.v", c="c.c")
        sql += f""",
a{t} AS (
  SELECT vec_id, v, cid FROM (
    SELECT v.vec_id, v.v, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {d}, c.cid) AS rn
    FROM v CROSS JOIN c{t} c) WHERE rn = 1),
m{t} AS (
  SELECT cid, g.i, round(avg(a.v[g.i]), 6) AS m
  FROM a{t} a, unnest(generate_series(1, len(a.v))) AS g(i)
  GROUP BY cid, g.i),
e{t} AS (
  SELECT c.cid, g.i, c.c[g.i] AS oldval
  FROM c{t} c, unnest(generate_series(1, len(c.c))) AS g(i)),
c{t + 1} AS (
  SELECT cid, list(val ORDER BY i) AS c FROM (
    SELECT e.cid, e.i, coalesce(m.m, e.oldval)::DOUBLE AS val
    FROM e{t} e LEFT JOIN m{t} m ON m.cid = e.cid AND m.i = e.i
  ) GROUP BY cid)"""
    d_final = dist.format(v="v.v", c="c.c")
    d_probe = dist.format(v="q.v", c="c.c")
    sql += f""",
af AS (
  SELECT vec_id, v, cid FROM (
    SELECT v.vec_id, v.v, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {d_final}, c.cid) AS rn
    FROM v CROSS JOIN c{iters} c) WHERE rn = 1),
probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT q.vec_id AS query_id, q.v AS qv, c.cid,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY {d_probe}, c.cid) AS rn
    FROM v q CROSS JOIN c{iters} c WHERE q.vec_id < 5) WHERE rn <= {n_probe}),
scored AS (
  SELECT p.query_id, a.vec_id,
         round(list_dot_product(p.qv, a.v)
               / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))), 4) AS cosine
  FROM probes p JOIN af a USING (cid))
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored) WHERE rank <= {k}
"""
    return sql


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.text import normalize_text

    return normalize_text(_t(spark, sf_dir, "documents"))


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.text import vocab_topk

    return vocab_topk(_t(spark, sf_dir, "documents"), k=100)


def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.text import repetition_score

    return repetition_score(_t(spark, sf_dir, "documents"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.text import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.text import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.text import token_counts

    return token_counts(_t(spark, sf_dir, "documents"))


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing per doc_id shard (GPT-style
    pretraining batching): seq_id / token offset each document starts at."""
    from bids2table_spark.operators.text import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), seq_len=2048, n_shards=16)


def q_sample_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-bucket sampling: engine-stable 10% slice of
    documents keyed on doc_id (reproducible eval split)."""
    from bids2table_spark.operators.text import sample_by_hash

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sample_by_hash(docs, "doc_id", 0.10)


def q_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing a 13-gram with the
    deterministic 2% hash-sampled 'eval set' slice of the same table."""
    from bids2table_spark.operators.dedup import ngram_decontaminate
    from bids2table_spark.operators.text import sample_by_hash

    docs = _t(spark, sf_dir, "documents")
    evalset = sample_by_hash(docs, "doc_id", 0.02)
    return ngram_decontaminate(docs, evalset, n=13)


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bids2table_spark.operators.text import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"))


def q_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint sets (min of each w-window of k-gram hashes,
    distinct per doc) — guarantees shared fingerprints for shared substrings
    of length >= w + k - 1."""
    from bids2table_spark.operators.text import fingerprint_winnow

    return fingerprint_winnow(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full encode->decode round-trip on sf0.001 transcripts."""
    return q_transcript_roundtrip(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcript_roundtrip": q_transcript_roundtrip,
        "typed_roundtrip": q_typed_roundtrip,
        "transcript_codec_stats": q_transcript_codec_stats,
        "typed_codec_stats": q_typed_codec_stats,
        "key_merge_outer": q_key_merge_outer,
        "resume_anti_join": q_resume_anti_join,
        "dedup_keep_last": q_dedup_keep_last,
        "multikey_sort": q_multikey_sort,
        "group_counts": q_group_counts,
        "run_length_sql": q_run_length_sql,
        "delta_stats_sql": q_delta_stats_sql,
        "stats_ndv": q_stats_ndv,
        "schema_cast_project": q_schema_cast_project,
        "regex_extract": q_regex_extract,
        "pattern_filter": q_pattern_filter,
        "overlap_filter": q_overlap_filter,
        "sessionize": q_sessionize,
        "topk_per_group": q_topk_per_group,
        "streaming_roundtrip": q_streaming_roundtrip,
        "streaming_windowed": q_streaming_windowed,
        "streaming_sessionize": q_streaming_sessionize,
        "decode_projection": q_decode_projection,
        "media_metadata": q_media_metadata,
        "frame_sample": q_frame_sample,
        "binary_file_ingest": q_binary_file_ingest,
        "path_list_ingest": q_path_list_ingest,
        "decode_point_lookup": q_decode_point_lookup,
        "decode_range_numeric": q_decode_range_numeric,
        "decode_filter_nonkey": q_decode_filter_nonkey,
        "schema_evolution": q_schema_evolution,
        "evolution_backfill": q_evolution_backfill,
        "compact_roundtrip": q_compact_roundtrip,
        "time_travel": q_time_travel,
        "csv_ingest": q_csv_ingest,
        "tsv_array_ingest": q_tsv_array_ingest,
        "json_props_parse": q_json_props_parse,
        "path_source_counts": q_path_source_counts,
        "schema_infer_example": q_schema_infer_example,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "embedding_neardup": q_embedding_neardup,
        "ann_topk": q_ann_topk,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "normalize_text": q_normalize_text,
        "vocab_topk": q_vocab_topk,
        "repetition_score": q_repetition_score,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_counts": q_token_counts,
        "pack_sequences": q_pack_sequences,
        "sample_by_hash": q_sample_by_hash,
        "ngram_decontaminate": q_ngram_decontaminate,
        "fingerprint": q_fingerprint,
        "fingerprint_winnow": q_fingerprint_winnow,
    }


_SHINGLES = (
    "list_distinct(CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) >= 3 "
    "THEN list_transform(generate_series(1, len(string_split_regex(lower(trim(text)), '\\s+')) - 2), "
    "i -> array_to_string(string_split_regex(lower(trim(text)), '\\s+')[i:i+2], ' ')) "
    "ELSE [array_to_string(string_split_regex(lower(trim(text)), '\\s+'), ' ')] END)"
)

# int64 shingle hashes: one md5 per shingle, 8 hex chars -> 32-bit int —
# byte-for-byte the arithmetic bids2table_spark.operators.dedup uses
_HASHED_SHINGLES = (
    f"list_distinct(list_transform({_SHINGLES}, "
    "s -> ('0x' || substr(md5(s), 1, 8))::BIGINT))"
)


def _hashed_shingles_sql(n: int) -> str:
    """_HASHED_SHINGLES generalized to word n-grams of any n (DuckDB mirror
    of dedup.hashed_shingles_col(col, n); toks[i:i+n-1] is inclusive)."""
    toks = "string_split_regex(lower(trim(text)), '\\s+')"
    grams = (
        f"list_distinct(CASE WHEN len({toks}) >= {n} "
        f"THEN list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({toks}, ' ')] END)"
    )
    return (
        f"list_distinct(list_transform({grams}, "
        "s -> ('0x' || substr(md5(s), 1, 8))::BIGINT))"
    )


def _minhash_sig_sql(k: int) -> str:
    from bids2table_spark.operators.dedup import MERSENNE_P, minhash_coeffs

    a, b = minhash_coeffs(k)
    exprs = ", ".join(
        f"list_min(list_transform(hs, h -> ({a[i]} * h + {b[i]}) % {MERSENNE_P}))"
        for i in range(k)
    )
    return (
        f"SELECT doc_id, [{exprs}] AS sig FROM "
        f"(SELECT doc_id, {_HASHED_SHINGLES} AS hs FROM documents)"
    )


def _lsh_pairs_sql(k: int, bands: int, max_bucket: int | None = 4096) -> str:
    # mirrors dedup.minhash_lsh_pairs incl. the band-bucket cap: buckets
    # wider than max_bucket emit star pairs (member, bucket-min) only.
    # max_bucket=None mirrors the UNCAPPED call (the ngram-jaccard verify
    # stage default): all in-bucket pairs, no star fallback.
    rows = k // bands
    if max_bucket is None:
        return f"""
WITH sig AS ({_minhash_sig_sql(k)}),
banded AS (
  SELECT doc_id, g.b AS band_idx,
         array_to_string(list_transform(sig[g.b*{rows}+1 : g.b*{rows}+{rows}],
                                        x -> x::VARCHAR), ',') AS band_key
  FROM sig, generate_series(0, {bands - 1}) g(b)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b USING (band_idx, band_key)
WHERE a.doc_id < b.doc_id
"""
    return f"""
WITH sig AS ({_minhash_sig_sql(k)}),
banded AS (
  SELECT doc_id, g.b AS band_idx,
         array_to_string(list_transform(sig[g.b*{rows}+1 : g.b*{rows}+{rows}],
                                        x -> x::VARCHAR), ',') AS band_key
  FROM sig, generate_series(0, {bands - 1}) g(b)
),
counted AS (
  SELECT doc_id, band_idx, band_key,
         count(*) OVER (PARTITION BY band_idx, band_key) AS n,
         min(doc_id) OVER (PARTITION BY band_idx, band_key) AS rep
  FROM banded
)
SELECT DISTINCT doc_a, doc_b FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM counted a JOIN counted b USING (band_idx, band_key)
  WHERE a.n <= {max_bucket} AND a.doc_id < b.doc_id
  UNION ALL
  SELECT rep AS doc_a, doc_id AS doc_b
  FROM counted WHERE n > {max_bucket} AND doc_id <> rep
)
"""


def _srp_bucket_sql(vec: str, planes: int, base_expr: str = "0") -> str:
    """Sum of sign bits of components base_expr*planes+1 .. +planes."""
    terms = " + ".join(
        f"(CASE WHEN {vec}[({base_expr})*{planes} + {i + 1}] >= 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(planes)
    )
    return f"({terms})"


def oracle_sql() -> dict[str, str]:
    return {
        "transcript_roundtrip": _TRANSCRIPTS_ORACLE,
        "typed_roundtrip": """
            SELECT 'conv-' || lpad(user_id::VARCHAR, 12, '0') AS conv_id,
                   (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::INTEGER AS turn_idx,
                   (event_id % 2 = 0) AS flag,
                   round((value::REAL)::DOUBLE, 4) AS score_r,
                   (ts::DATE)::VARCHAR AS day,
                   md5(coalesce(props, '')) AS payload_md5,
                   round(((value * 2)::REAL::DOUBLE + (value + 1)::REAL::DOUBLE), 4) AS vec_sum,
                   user_id + event_id AS ids_sum,
                   len(string_split(event_type, '_')) AS n_tags,
                   CASE WHEN event_id % 4 <> 0
                        THEN regexp_extract(props, '"k":\\s*(\\d+)', 1)::INTEGER END AS meta_k,
                   CASE WHEN event_id % 4 <> 0 THEN event_type END AS meta_w,
                   value AS val,
                   CASE WHEN event_id % 5 <> 0 THEN event_type END AS call_name,
                   CASE WHEN event_id % 5 <> 0 AND event_id % 3 <> 0
                        THEN (event_id % 300)::BIGINT END AS call_timeout,
                   CASE WHEN event_id % 5 <> 0 AND event_id % 3 <> 0
                        THEN substr(coalesce(props, ''), 1, 12) END AS call_cmd,
                   CASE WHEN event_id % 6 <> 0 THEN 2 END AS n_parts,
                   CASE WHEN event_id % 6 <> 0 THEN (user_id % 7)::BIGINT END AS parts1_n,
                   CASE WHEN event_id % 6 <> 0 AND event_id % 2 = 0
                        THEN event_type END AS parts2_kind,
                   CASE WHEN event_id % 9 <> 0 THEN '2x2' END AS mat_shape,
                   CASE WHEN event_id % 9 <> 0 THEN
                        round((((0.0 + value) + (value * 3)) + (value - 1)) + (value * value), 4)
                   END AS mat_sum
            FROM events
        """,
        "transcript_codec_stats": f"""
            WITH tr AS ({_TRANSCRIPTS_ORACLE})
            SELECT col_name, (SELECT count(*) FROM tr) AS n_rows,
                   true AS codec_known, true AS enc_le_orig, true AS expected_codec
            FROM (VALUES ('conv_id'),('role'),('text'),('tool'),('ts'),('turn_idx')) c(col_name)
            ORDER BY col_name
        """,
        "typed_codec_stats": """
            SELECT col_name, (SELECT count(*) FROM events) AS n_rows,
                   true AS codec_known, true AS enc_le_orig, true AS expected_codec
            FROM (VALUES ('conv_id'),('day'),('flag'),('ids'),('meta·__defined__'),
                         ('meta·k'),('meta·w'),('payload'),('score'),('tags'),
                         ('turn_idx'),('val'),('vec'),
                         ('call·__defined__'),('call·name'),
                         ('call·args·__defined__'),('call·args·timeout'),('call·args·cmd'),
                         ('parts·__defined__'),('parts·kind'),('parts·n'),
                         ('mat·__defined__'),('mat·data'),('mat·shape')) c(col_name)
            ORDER BY col_name
        """,
        "key_merge_outer": """
            WITH frag_a AS (
              SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice
              FROM orders),
            frag_b AS (
              SELECT l_orderkey AS orderkey, count(*) AS n_lines,
                     round(sum(l_quantity::DECIMAL(28,6)), 2)::DOUBLE AS sum_qty
              FROM lineitem GROUP BY 1)
            SELECT coalesce(a.orderkey, b.orderkey) AS orderkey, custkey, totalprice,
                   n_lines, sum_qty
            FROM frag_a a FULL OUTER JOIN frag_b b USING (orderkey)
        """,
        "resume_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "dedup_keep_last": """
            SELECT user_id, event_id, event_type, value FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1
        """,
        "multikey_sort": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem ORDER BY l_orderkey, l_linenumber
        """,
        "group_counts": """
            SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
                   round(count(*) / (SELECT count(*)::DOUBLE FROM events), 6) AS frac,
                   round(sum(value::DECIMAL(28,6))::DOUBLE / count(*), 4) AS avg_value
            FROM events GROUP BY event_type
        """,
        "run_length_sql": """
            WITH flagged AS (
              SELECT l_orderkey, l_linenumber, l_returnflag,
                     CASE WHEN lag(l_returnflag) OVER w IS NULL
                               OR lag(l_returnflag) OVER w <> l_returnflag
                          THEN 1 ELSE 0 END AS is_start
              FROM lineitem
              WINDOW w AS (ORDER BY l_orderkey, l_linenumber, l_returnflag)),
            runs0 AS (
              SELECT l_returnflag,
                     sum(is_start) OVER (ORDER BY l_orderkey, l_linenumber, l_returnflag ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
              FROM flagged),
            runs AS (
              SELECT l_returnflag, run_id, count(*) AS run_len
              FROM runs0 GROUP BY 1, 2)
            SELECT l_returnflag, count(*) AS n_runs,
                   round(avg(run_len), 4) AS avg_run_len, max(run_len) AS max_run_len
            FROM runs GROUP BY 1
        """,
        "delta_stats_sql": """
            WITH d AS (
              SELECT user_id,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
              FROM events)
            SELECT user_id, count(*) AS n_deltas,
                   round(avg(delta_us) / 1e6, 4) AS avg_delta_s,
                   round(max(delta_us) / 1e6, 4) AS max_delta_s
            FROM d WHERE delta_us IS NOT NULL GROUP BY user_id
        """,
        "stats_ndv": """
            SELECT count(*) AS n,
                   count(DISTINCT l_partkey) AS ndv_partkey,
                   count(DISTINCT l_returnflag) AS ndv_returnflag,
                   min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
                   round(avg(length(l_returnflag)), 4) AS avg_flag_len,
                   min(l_shipdate) AS min_shipdate, max(l_shipdate) AS max_shipdate
            FROM lineitem
        """,
        "schema_cast_project": """
            SELECT o_orderkey::BIGINT AS o_orderkey, o_custkey::BIGINT AS o_custkey,
                   o_totalprice::DOUBLE AS o_totalprice,
                   NULL::VARCHAR AS o_orderdate_str,
                   o_orderpriority::VARCHAR AS o_orderpriority
            FROM orders
        """,
        "regex_extract": """
            SELECT event_id,
                   regexp_extract(props, '"k":\\s*(\\d+)', 1)::INTEGER AS k_value,
                   regexp_extract(event_type, '^([a-z]+)', 1) AS type_word
            FROM events
        """,
        "pattern_filter": """
            SELECT source, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
            FROM documents WHERE source LIKE 'src1%' GROUP BY source
        """,
        "overlap_filter": f"""
            WITH tr AS ({_TRANSCRIPTS_ORACLE}),
            o AS (
              SELECT role,
                     round(((conv_id IS NOT NULL)::INT + (turn_idx IS NOT NULL)::INT
                      + (role IS NOT NULL)::INT + (text IS NOT NULL)::INT
                      + (tool IS NOT NULL)::INT + (ts IS NOT NULL)::INT) / 6.0, 4) AS overlap
              FROM tr)
            SELECT role, count(*) AS n,
                   round(sum(overlap::DECIMAL(28,6))::DOUBLE / count(*), 4) AS avg_overlap
            FROM o WHERE overlap >= 0.75 GROUP BY role
        """,
        "sessionize": """
            WITH flagged AS (
              SELECT user_id, ts, event_id, value,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id, ts, value,
                     sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM flagged)
            SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
                   round(sum(value::DECIMAL(28,6)), 2)::DOUBLE AS session_value,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM s GROUP BY user_id, session_id
        """,
        "topk_per_group": """
            WITH r AS (
              SELECT l_returnflag, l_orderkey, l_linenumber,
                     round(l_extendedprice * (1 - l_discount), 4) AS revenue
              FROM lineitem),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY l_returnflag
                ORDER BY revenue DESC, l_orderkey, l_linenumber) AS rnk
              FROM r)
            SELECT l_returnflag, rnk, l_orderkey, l_linenumber, revenue
            FROM ranked WHERE rnk <= 3
        """,
        "streaming_roundtrip": _TRANSCRIPTS_ORACLE,
        "streaming_windowed": _STREAMING_WINDOWED_SQL,
        "streaming_sessionize": _STREAMING_SESSIONIZE_SQL,
        "media_metadata": _MEDIA_METADATA_SQL,
        "frame_sample": _FRAME_SAMPLE_SQL,
        "binary_file_ingest": _BINARY_FILE_INGEST_SQL,
        "path_list_ingest": _PATH_LIST_INGEST_SQL,
        "decode_point_lookup": f"""
            WITH tr AS ({_TRANSCRIPTS_ORACLE})
            SELECT conv_id, turn_idx, role, text, tool, ts, pt FROM tr
            WHERE conv_id BETWEEN 'conv-000000000010' AND 'conv-000000000019'
        """,
        "decode_range_numeric": """
            SELECT * FROM (
              SELECT concat('pt-', lpad((user_id % 4)::VARCHAR, 4, '0')) AS pt,
                     CASE WHEN event_id % 97 = 0 THEN NULL ELSE event_id END AS ekey,
                     user_id, event_type, value, ts
              FROM events)
            WHERE ekey BETWEEN 100 AND 399
        """,
        "decode_filter_nonkey": f"""
            WITH tr AS ({_TRANSCRIPTS_ORACLE})
            SELECT conv_id, turn_idx, role, text, tool, ts, pt FROM tr
            WHERE ts BETWEEN TIMESTAMP '2024-01-10' AND TIMESTAMP '2024-01-12'
        """,
        "schema_evolution": f"""
            WITH tr AS ({_TRANSCRIPTS_ORACLE})
            SELECT conv_id, turn_idx, role, text, tool, ts, pt,
                   CASE WHEN CAST(substr(conv_id, 6) AS BIGINT) % 2 = 1
                        THEN length(text)::INTEGER END AS n_chars
            FROM tr
        """,
        "evolution_backfill": _TRANSCRIPTS_ORACLE,
        "compact_roundtrip": _TRANSCRIPTS_ORACLE,
        "time_travel": f"""
            WITH tr AS ({_TRANSCRIPTS_ORACLE})
            SELECT conv_id, turn_idx, role, text, tool, ts, pt FROM tr
            WHERE CAST(substr(conv_id, 6) AS BIGINT) % 2 = 0
        """,
        "decode_projection": f"""
            WITH tr AS ({_TRANSCRIPTS_ORACLE})
            SELECT pt, role, count(*) AS n, min(conv_id) AS min_conv,
                   max(turn_idx) AS max_turn
            FROM tr WHERE pt IN ('pt-0001', 'pt-0002')
            GROUP BY pt, role
        """,
        "csv_ingest": """
            SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "tsv_array_ingest": """
            SELECT l_orderkey, l_linenumber,
                   round(l_quantity + l_linenumber + l_quantity * 2, 4) AS vals_sum,
                   3 AS n_vals
            FROM lineitem
        """,
        "json_props_parse": """
            SELECT event_id,
                   regexp_extract(props, '"k":\\s*(\\d+)', 1)::INTEGER AS k,
                   regexp_extract(props, '"k":\\s*(\\d+)', 1)::INTEGER % 10 AS k_bucket
            FROM events
        """,
        "path_source_counts": """
            SELECT 'documents.parquet' AS file, count(*) AS n FROM documents
        """,
        "schema_infer_example": """
            SELECT o_orderkey::BIGINT AS o_orderkey,
                   o_totalprice::DOUBLE AS o_totalprice,
                   NULL::VARCHAR AS o_missing_note,
                   o_orderpriority::VARCHAR AS o_orderpriority,
                   (o_orderpriority = '1-URGENT') AS o_urgent
            FROM orders
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,
                   count(*) AS n_dupes
            FROM documents GROUP BY 1
        """,
        "dedup_minhash_lsh": _lsh_pairs_sql(128, 16),
        # connected-components fixpoint as a recursive CTE: reach(v, lbl)
        # enumerates every id reachable from v through the pair graph; the
        # component min mirrors the Spark min-label propagation exactly
        "dedup_clusters": f"""
            WITH RECURSIVE pairs AS ({_lsh_pairs_sql(128, 16)}),
            edges AS (
                SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            reach(v, lbl) AS (
                SELECT src, dst FROM edges
                UNION
                SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.v = e.dst
            ),
            comp AS (
                SELECT v AS doc_id, least(v, min(lbl)) AS cluster_id
                FROM reach GROUP BY v
            )
            SELECT d.doc_id,
                   coalesce(c.cluster_id, d.doc_id) AS cluster_id,
                   coalesce(c.cluster_id, d.doc_id) = d.doc_id AS is_canonical
            FROM documents d LEFT JOIN comp c USING (doc_id)
        """,
        "dedup_ngram_jaccard": f"""
            WITH pairs AS ({_lsh_pairs_sql(128, 16, max_bucket=None)}),
            sh AS (SELECT doc_id, {_HASHED_SHINGLES} AS sh FROM documents)
            SELECT doc_a, doc_b,
                   round(len(list_intersect(a.sh, b.sh))
                         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE,
                         4) AS jaccard
            FROM pairs JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b
            WHERE round(len(list_intersect(a.sh, b.sh))
                        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE,
                        4) >= 0.2
        """,
        "dedup_simhash": _simhash_oracle(),
        "embedding_neardup": f"""
            WITH base AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings),
            tb0 AS (
              SELECT vec_id, v, g.t AS tbl,
                     {_srp_bucket_sql("v", 8, "g.t")} AS bucket
              FROM base, generate_series(0, 3) g(t)),
            counted AS (
              SELECT *, count(*) OVER (PARTITION BY tbl, bucket) AS n FROM tb0),
            tb AS (  -- mirrors dedup.embedding_neardup's deterministic re-salt
              SELECT vec_id, v, tbl,
                     CASE WHEN n > 8192
                          THEN bucket * 256 + {_srp_bucket_sql("v", 8, "4")} + 256
                          ELSE bucket END AS bucket
              FROM counted)
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                         4) AS cosine
            FROM tb a JOIN tb b USING (tbl, bucket)
            WHERE a.vec_id < b.vec_id
              AND round(list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                        4) >= 0.8
        """,
        "ann_topk": _ANN_SQL,
        "ann_topk_lsh": _ANN_LSH_SQL,
        "ann_topk_ivf": _ivf_oracle(),
        # \x0B is stripped by the control pass in BOTH engines before the
        # \s+ collapse, so RE2-vs-Java \s class differences cannot surface
        "normalize_text": r"""
            WITH s AS (
              SELECT doc_id, text,
                     trim(regexp_replace(
                         regexp_replace(text,
                             '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                         '\s+', ' ', 'g')) AS norm_text
              FROM documents
            )
            SELECT doc_id, norm_text,
                   length(text)::BIGINT AS n_chars_before,
                   length(norm_text)::BIGINT AS n_chars_after
            FROM s
        """,
        "vocab_topk": r"""
            SELECT token, count(*)::BIGINT AS n FROM (
              SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
              FROM documents
            ) WHERE length(token) > 0
            GROUP BY token ORDER BY n DESC, token LIMIT 100
        """,
        "repetition_score": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents
            ), bg AS (
              SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
              FROM toks, UNNEST(range(1, len(t))) AS u(i)
            ), bgc AS (
              SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg
            ), top AS (
              SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_bigram_frac
              FROM bgc GROUP BY doc_id
            ), ln AS (
              SELECT doc_id,
                     list_filter(
                       list_transform(string_split(text, chr(10)), x -> trim(x)),
                       x -> length(x) > 0) AS ls
              FROM documents
            )
            SELECT ln.doc_id,
                   CASE WHEN len(ls) > 0
                        THEN 1.0 - len(list_distinct(ls))::DOUBLE / len(ls)
                        ELSE 0.0 END AS dup_line_frac,
                   coalesce(top.top_bigram_frac, 0.0) AS top_bigram_frac
            FROM ln LEFT JOIN top ON ln.doc_id = top.doc_id
        """,
        "lang_id": _lang_id_oracle(),
        "quality_score": """
            WITH t AS (
              SELECT doc_id, text,
                     length(text) AS n_chars_m,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                     length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
                     length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END AS n_tokens,
                     len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x IN ('the','and','of','a','to','in','is'))) AS n_stop
              FROM documents),
            r AS (
              SELECT doc_id, n_chars_m, n_tokens::BIGINT AS n_tokens,
                     CASE WHEN n_tokens > 0 THEN n_stop / n_tokens::DOUBLE ELSE 0.0 END AS stop_ratio,
                     CASE WHEN n_chars_m > 0 THEN n_punct / n_chars_m::DOUBLE ELSE 0.0 END AS punct_ratio,
                     CASE WHEN n_alpha > 0 THEN n_upper / n_alpha::DOUBLE ELSE 0.0 END AS upper_ratio
              FROM t)
            SELECT doc_id, n_chars_m, n_tokens,
                   round(stop_ratio, 4) AS stop_ratio,
                   round(punct_ratio, 4) AS punct_ratio,
                   round(0.4 * least(n_chars_m / 500.0, 1.0)
                         + 0.3 * least(stop_ratio * 4, 1.0)
                         + 0.2 * (1 - least(punct_ratio * 10, 1.0))
                         + 0.1 * (1 - upper_ratio), 4) AS quality
            FROM r
        """,
        "token_counts": """
            SELECT doc_id,
                   (CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END)::BIGINT AS ws_tokens,
                   len(regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]|[^a-z0-9\\s]'))::BIGINT AS bpe_tokens
            FROM documents
        """,
        "pack_sequences": """
            WITH t AS (
              SELECT doc_id, (doc_id % 16)::INT AS shard,
                     (CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END)::BIGINT AS n_tokens
              FROM documents
            ), c AS (
              SELECT shard, doc_id, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tokens AS st
              FROM t
            )
            SELECT shard, doc_id, n_tokens,
                   (st // 2048)::BIGINT AS seq_id,
                   (st % 2048)::BIGINT AS seq_off
            FROM c
        """,
        "sample_by_hash": """
            SELECT doc_id, lang, source FROM documents
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000000 < 100000
        """,
        "ngram_decontaminate": f"""
            WITH ev AS (
              SELECT DISTINCT unnest({_hashed_shingles_sql(13)}) AS h
              FROM documents
              WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000000 < 20000
            ), c AS (
              SELECT doc_id, unnest({_hashed_shingles_sql(13)}) AS h
              FROM documents
            )
            SELECT c.doc_id, count(*)::BIGINT AS n_shared
            FROM c JOIN ev USING (h)
            GROUP BY c.doc_id
        """,
        "fingerprint": """
            SELECT doc_id,
                   CASE WHEN length(text) >= 8 THEN
                     list_min(list_transform(generate_series(1, length(text) - 7),
                              i -> md5(substring(text, i, 8))))
                   ELSE md5(text) END AS fp
            FROM documents
        """,
        "fingerprint_winnow": """
            WITH g AS (
              SELECT doc_id, i,
                     ('0x' || substr(md5(substring(text, i, 8)), 1, 8))::BIGINT AS h
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) t(i)
            ),
            s AS (
              SELECT doc_id, i,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp,
                     count(*) OVER (PARTITION BY doc_id) AS m
              FROM g
            )
            SELECT DISTINCT doc_id, fp FROM s
            WHERE i <= m - 15 OR (m < 16 AND i = 1)
        """,
    }


_ANN_SQL = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
q AS (
  SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
scored AS (
  SELECT query_id, vec_id,
         round(list_dot_product(qv, v)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 4) AS cosine
  FROM base CROSS JOIN q),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5
"""

def _ann_lsh_sql(planes: int = 12, k: int = 5, n_queries: int = 5) -> str:
    bucket = _srp_bucket_sql("v", planes)
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
bk AS (
  SELECT vec_id, v, {bucket} AS bucket FROM base),
q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM bk WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, qv,
         CASE WHEN g.i = 0 THEN bucket ELSE xor(bucket, 1 << (g.i - 1)) END AS bucket
  FROM q, generate_series(0, {planes}) g(i)),
scored AS (
  SELECT query_id, b.vec_id,
         round(list_dot_product(qv, b.v)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
  FROM bk b JOIN probes USING (bucket)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}
"""


_ANN_LSH_SQL = _ann_lsh_sql()


def _simhash_oracle() -> str:
    bit_terms = " + ".join(
        f"CASE WHEN (SELECT sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) "
        f"FROM unnest(hs) AS u(h)) > 0 THEN {2 ** b}::BIGINT ELSE 0 END"
        for b in range(60)
    )
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_transform(list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
                     tok -> ('0x' || substr(md5(tok), 1, 15))::UBIGINT::BIGINT) AS hs
          FROM documents)
        SELECT doc_id, ({bit_terms}) AS simhash FROM t
    """


def _lang_id_oracle() -> str:
    from bids2table_spark.operators.text import LANG_MARKERS

    score_exprs = []
    for lang in sorted(LANG_MARKERS):
        hits = " + ".join(
            f"len(list_filter(toks, x -> x = '{w}'))" for w in LANG_MARKERS[lang]
        )
        score_exprs.append(f"({hits}) AS s_{lang}")
    langs = sorted(LANG_MARKERS)
    best = f"greatest({', '.join('s_' + lang for lang in langs)})"
    pred = "'und'"
    for lang in reversed(langs):
        pred = f"CASE WHEN s_{lang} = best AND best > 0 THEN '{lang}' ELSE {pred} END"
    return f"""
        WITH t AS (
          SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS toks
          FROM documents),
        s AS (SELECT doc_id, lang, {', '.join(score_exprs)} FROM t),
        b AS (SELECT *, {best} AS best FROM s)
        SELECT doc_id, lang, {pred} AS pred_lang FROM b
    """
