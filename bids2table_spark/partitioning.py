"""Partitioning & explicit skew mitigation.

Encode groups are ``(pt, grp)`` where ``grp`` is a salt bucket of the
conversation key: every conversation stays in exactly one group (so sorted
runs and per-conv delta chains survive), while hot partitions fan out over
more buckets.  Salt counts come from a cheap row-count pre-pass — the
frequency-driven analog of the reference's static range partitioning
(``bids2table/engine.py:285-300``), but data-dependent.

The salt plan is joined back as a broadcast join (tiny dim table), so the
only shuffle in the encode job is the groupBy itself; AQE skew-join stays on
as backstop (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_GROUP_ROWS = 262_144
MIN_GROUP_ROWS = 32_768


def adaptive_group_rows(total_rows: int, parallelism: int, target_group_rows: int = DEFAULT_GROUP_ROWS) -> int:
    """Cap the group size so there are at least ~4 groups per core — on a
    small input the fixed 256k target would leave most of the cluster idle;
    at 10^12 rows the cap never binds and the 256k memory bound governs."""
    per_core_target = max(MIN_GROUP_ROWS, total_rows // max(4 * parallelism, 1))
    return min(target_group_rows, per_core_target)


def salt_plan(df: DataFrame, pt_col: str = "pt", target_group_rows: int | None = DEFAULT_GROUP_ROWS) -> DataFrame:
    """rows-per-pt pre-pass -> (pt, n_salts). Hot pts get more buckets; the
    group-size target adapts to cluster parallelism (see adaptive_group_rows).
    """
    counts = df.groupBy(pt_col).count()
    if target_group_rows is None:
        target_group_rows = DEFAULT_GROUP_ROWS
    spark = df.sparkSession
    total = counts.agg(F.sum("count")).collect()[0][0] or 0
    target = adaptive_group_rows(
        int(total), spark.sparkContext.defaultParallelism, target_group_rows
    )
    return counts.select(
        F.col(pt_col),
        F.greatest(
            F.lit(1), F.ceil(F.col("count") / F.lit(target))
        ).cast("int").alias("n_salts"),
    )


def with_group(
    df: DataFrame,
    plan: DataFrame,
    pt_col: str = "pt",
    conv_col: str = "conv_id",
) -> DataFrame:
    """Attach the salt-group column ``grp`` (deterministic per conversation)."""
    out = df.join(F.broadcast(plan), on=pt_col, how="left")
    grp = F.pmod(F.xxhash64(F.col(conv_col)), F.coalesce(F.col("n_salts"), F.lit(1)))
    return out.withColumn("grp", F.format_string("g%04d", grp)).drop("n_salts")
