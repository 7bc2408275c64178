"""Reusable column-expression builders (the engine's scalar-function
surface; reference analog: the loader/indexer helper functions of
``bids2table/loaders/text.py`` and ``bids2table/indexers/bids.py:54-124``,
re-expressed as Catalyst expressions)."""

from __future__ import annotations

from pyspark.sql import Column, Window, functions as F


def regexp_entity(col, pattern: str, cast: str | None = None) -> Column:
    """P2 regex entity extraction with typed cast; '' (no match) -> null."""
    out = F.nullif(F.regexp_extract(col, pattern, 1), F.lit(""))
    return out.cast(cast) if cast else out


def posix_path(col) -> Column:
    """F1 posix path normalization (utils.py:163-181)."""
    return F.regexp_replace(col, r"\\+", "/")


def zero_pad(col, width: int = 4) -> Column:
    """F4 zero-padded id formatting (logging.py:245-249)."""
    return F.format_string(f"%0{width}d", col)


def run_id_over(value_col: str, order_cols: list[str], partition_cols: list[str] | None = None) -> Column:
    """C2-as-SQL: monotone run id for RLE-style analysis via lag + running sum."""
    w = Window.orderBy(*order_cols)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    is_start = (
        F.when(
            F.lag(value_col).over(w).isNull()
            | (F.lag(value_col).over(w) != F.col(value_col)),
            1,
        ).otherwise(0)
    )
    return F.sum(is_start).over(w.rowsBetween(Window.unboundedPreceding, 0))


def delta_over(col: str, order_cols: list[str], partition_cols: list[str]) -> Column:
    """C4-as-SQL: value minus its predecessor under the canonical order."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return F.col(col) - F.lag(col).over(w)


def null_fraction(cols: list[str]) -> Column:
    """P6 overlap metric: fraction of non-null fields among ``cols``."""
    nn = sum(F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in cols)
    return nn / F.lit(float(len(cols)))
