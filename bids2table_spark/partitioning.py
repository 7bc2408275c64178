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


def salt_plan(df: DataFrame, pt_col: str = "pt", target_group_rows: int = DEFAULT_GROUP_ROWS) -> DataFrame:
    """rows-per-pt pre-pass -> (pt, n_salts). Hot pts get more buckets."""
    return (
        df.groupBy(pt_col)
        .count()
        .select(
            F.col(pt_col),
            F.greatest(
                F.lit(1), F.ceil(F.col("count") / F.lit(target_group_rows))
            ).cast("int").alias("n_salts"),
        )
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
