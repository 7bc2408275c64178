"""Relational operators mirroring the reference's dataflow core.

J1 key-merge (``bids2table/table.py:59-97``): record fragments from different
handlers land in one row keyed by the index tuple — a full outer join.
J2 resume filter (``bids2table/logging.py:133-164``): left anti-join of
candidates vs the processed log.
A4 dedup-keep-last (``bids2table/logging.py:86-89``).
O1 stable multi-key sort at batch finalize (``bids2table/table.py:115-126``).
P5/P7 schema-conform projection + cast (``bids2table/handlers/handler.py:130-143``,
``bids2table/schema.py:195-224``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def key_merge(left: DataFrame, right: DataFrame, key_cols: list[str]) -> DataFrame:
    """Full outer join by index key — the IncrementalTable put/merge."""
    return left.join(right, on=key_cols, how="full_outer")


def resume_filter(candidates: DataFrame, processed: DataFrame, key_cols: list[str]) -> DataFrame:
    """Left anti-join: keep only not-yet-processed candidates."""
    return candidates.join(processed, on=key_cols, how="left_anti")


def dedup_keep_last(df: DataFrame, key_cols: list[str], order_col: str, tiebreak: str | None = None) -> DataFrame:
    """Keep the most recent row per key (drop_duplicates keep='last')."""
    if "_rn" in df.columns:
        raise ValueError(
            "input has a column named '_rn', which dedup_keep_last uses "
            "internally — withColumn would silently replace and drop it; "
            "rename it first"
        )
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def conform_schema(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    """Keep schema columns in declared order; null-fill missing; cast.

    ``columns`` maps name -> Spark type DDL string.
    """
    exprs = []
    for name, typ in columns.items():
        if name in df.columns:
            exprs.append(F.col(name).cast(typ).alias(name))
        else:
            exprs.append(F.lit(None).cast(typ).alias(name))
    return df.select(*exprs)
