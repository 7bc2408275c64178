"""Partitioning & explicit skew mitigation.

Encode groups are ``(pt, grp)`` where ``grp`` is a salt bucket of the
conversation key: every conversation stays in exactly one group (so sorted
runs and per-conv delta chains survive), while hot partitions fan out over
more buckets.  Salt counts come from a cheap row-count pre-pass — the
frequency-driven analog of the reference's static range partitioning
(``bids2table/engine.py:285-300``), but data-dependent.

The salt plan is attached back as a LITERAL ``create_map`` expression (a
broadcast join of the tiny dim recomputed per action — ~5s/pass, see the
round-1 perf notes — so do not "restore" one); the only shuffle in the
encode job is the groupBy itself, with AQE skew-join as backstop
(session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_GROUP_ROWS = 262_144
MIN_GROUP_ROWS = 32_768


def spread_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Scale-adaptive fan-out of a narrow scan feeding compute-heavy
    projections (regex passes, per-row md5/tokenize, interpreted
    higher-order lambdas).

    A small table is one parquet file = ONE scan task, so a pure projection
    runs serially no matter how many cores exist — at sf0.1 the quality /
    token / fingerprint queries spent ~0.5 s single-threaded on a 32-core
    box.  When the scan already has >= cluster parallelism partitions (the
    100 TB case) this is a NO-OP: no shuffle is added, so it cannot regress
    the at-scale plan.  The repartition is keyed (deterministic under task
    retry — guide rule: never round-robin rows whose recompute could
    reorder) and only ever RAISES the partition count."""
    P = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= P:
        return df
    return df.repartition(P, *keys) if keys else df.repartition(P)


def adaptive_group_rows(total_rows: int, parallelism: int, target_group_rows: int = DEFAULT_GROUP_ROWS) -> int:
    """Cap the group size so there are at least ~4 groups per core — on a
    small input the fixed 256k target would leave most of the cluster idle;
    at 10^12 rows the cap never binds and the 256k memory bound governs."""
    per_core_target = max(MIN_GROUP_ROWS, total_rows // max(4 * parallelism, 1))
    return min(target_group_rows, per_core_target)


def row_bytes_expr(df: DataFrame, exclude: tuple[str, ...] = ()) -> F.Column:
    """Estimated raw bytes of one row, as a Catalyst expression.

    Variable-width columns (string/binary, arrays thereof) measure their
    actual ``octet_length``; fixed-width types use their physical width.
    Struct fields recurse.  The estimate feeds byte-based group sizing
    (``salt_plan(target_group_bytes=...)``) — it need not match the
    encoded size, only rank row weight consistently so fat-row partitions
    get proportionally more, smaller groups."""
    from pyspark.sql import types as T

    _FIXED = {
        T.ByteType: 1, T.BooleanType: 1, T.ShortType: 2, T.IntegerType: 4,
        T.FloatType: 4, T.DateType: 4, T.LongType: 8, T.DoubleType: 8,
        T.TimestampType: 8, T.TimestampNTZType: 8,
    }

    def field_bytes(c: F.Column, dt) -> F.Column:
        w = _FIXED.get(type(dt))
        if w is not None:
            return F.lit(w)
        if isinstance(dt, (T.StringType, T.BinaryType)):
            return F.coalesce(F.octet_length(c), F.lit(0))
        if isinstance(dt, T.ArrayType):
            ew = _FIXED.get(type(dt.elementType))
            if ew is not None:
                return F.coalesce(F.size(c), F.lit(0)) * ew
            if isinstance(dt.elementType, (T.StringType, T.BinaryType)):
                return F.coalesce(
                    F.aggregate(
                        c, F.lit(0),
                        lambda acc, x: acc + F.coalesce(F.octet_length(x), F.lit(0)),
                    ),
                    F.lit(0),
                )
            # nested arrays: count leaf elements x 8 (good enough to rank)
            return F.coalesce(F.size(F.flatten(c)), F.lit(0)) * 8
        if isinstance(dt, T.StructType):
            parts = [field_bytes(c.getField(f.name), f.dataType) for f in dt.fields]
            return sum(parts[1:], parts[0]) if parts else F.lit(0)
        return F.lit(8)

    parts = [
        field_bytes(F.col(f.name), f.dataType)
        for f in df.schema.fields
        if f.name not in exclude
    ]
    expr = sum(parts[1:], parts[0]) if parts else F.lit(1)
    return expr.cast("long")


def salt_plan(
    df: DataFrame,
    pt_col: str = "pt",
    target_group_rows: int | None = DEFAULT_GROUP_ROWS,
    target_group_bytes: int | str | None = None,
) -> dict[str, int]:
    """rows-per-pt pre-pass -> {pt: n_salts}. Hot pts get more buckets; the
    group-size target adapts to cluster parallelism (see adaptive_group_rows).

    One aggregation + one driver collect; the result is tiny (one entry per
    partition) and is attached back as a *literal map expression*, not a
    join — the salt lookup costs nothing at scan time.

    ``target_group_bytes`` (int bytes or a human string — "64 MiB" etc.,
    see ``functions.parse_size``; reference writer sizes its flush
    partitions in bytes the same way, ``bids2table/writer.py:39,45``)
    switches sizing from row count to RAW BYTES per group, measured per pt
    from the same pre-pass: a partition with 10x-longer texts gets 10x
    more salts instead of 10x-heavier encode tasks.  The byte bound only
    ever SHRINKS groups below the row target (it is a memory cap, not a
    packing goal), floored at 1024 rows per group."""
    if target_group_rows is None:
        target_group_rows = DEFAULT_GROUP_ROWS
    aggs = [F.count("*").alias("count")]
    if target_group_bytes is not None:
        from .functions import parse_size

        target_group_bytes = parse_size(target_group_bytes)
        if target_group_bytes <= 0:
            raise ValueError(f"target_group_bytes must be > 0, got {target_group_bytes}")
        aggs.append(F.sum(row_bytes_expr(df, exclude=(pt_col,))).alias("bytes"))
    rows = df.groupBy(pt_col).agg(*aggs).collect()
    if any(r[pt_col] is None for r in rows):
        raise ValueError(
            f"partition column {pt_col!r} contains NULL values — every row "
            "must carry a non-null partition (fill or filter them first)"
        )
    total = sum(r["count"] for r in rows)
    target = adaptive_group_rows(
        int(total), df.sparkSession.sparkContext.defaultParallelism, target_group_rows
    )
    plan: dict[str, int] = {}
    for r in rows:
        per_pt_target = target
        if target_group_bytes is not None and r["count"]:
            avg_row = max(1.0, float(r["bytes"] or 0) / r["count"])
            # floor at 1024 rows, NOT MIN_GROUP_ROWS: byte sizing exists so
            # that genuinely fat rows (MB-scale multimodal payloads) yield
            # memory-bounded encode tasks — a 32k-row floor would put 32 GB
            # in one task.  1024 rows keeps groups block-friendly while the
            # group-universe cap (encode_job) still bounds driver memory.
            by_bytes = max(1024, int(target_group_bytes / avg_row))
            per_pt_target = min(target, by_bytes)
        plan[r[pt_col]] = max(1, -(-r["count"] // per_pt_target))
    return plan


def with_group(
    df: DataFrame,
    plan: dict[str, int],
    pt_col: str = "pt",
    conv_col: str = "conv_id",
    group_prefix: str = "",
) -> DataFrame:
    """Attach the salt-group column ``grp`` (deterministic per conversation).

    ``grp = xxhash64(conv) mod n_salts(pt)`` keeps every conversation in one
    group (sorted runs and delta chains survive) while hot partitions fan
    out over more buckets.  ``group_prefix`` scopes the labels (streaming
    passes the epoch id so a new micro-batch can never collide with groups
    committed by an earlier one).
    """
    if "grp" in df.columns:
        raise ValueError(
            "input has a column named 'grp', which the encoder reserves for "
            "the salt-group label — withColumn would silently REPLACE the "
            "user column and drop it from the encoded output; rename it first"
        )
    entries: list = []
    for k, v in sorted(plan.items()):
        entries.extend([F.lit(k), F.lit(int(v))])
    n_salts = (
        F.coalesce(F.element_at(F.create_map(*entries), F.col(pt_col)), F.lit(1))
        if entries
        else F.lit(1)
    )
    grp = F.pmod(F.xxhash64(F.col(conv_col)), n_salts)
    return df.withColumn("grp", F.format_string(f"{group_prefix}g%04d", grp))
