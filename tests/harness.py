"""Local replica of the driver's oracle comparison: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet dir; compare
row count, schema width, and order-insensitive values (columns sorted by
name, rows sorted by all columns)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    """Column-sort + dtype-normalize + row-sort.

    Floats are kept UNROUNDED for the value compare (compare() applies a
    tolerance); only the row-SORT key uses rounded floats (4 dp — the
    queries themselves round to 4 dp in both engines) so a 1e-17 engine
    divergence can neither flip row order nor fail the compare."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = pd.to_datetime(s).dt.tz_localize(None) if getattr(s.dt, "tz", None) else s
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype(np.float64)
        elif s.dtype == object:
            pdf[c] = s
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
    sort_frame = pdf.copy()
    for c in sort_frame.columns:
        if pd.api.types.is_float_dtype(sort_frame[c]):
            sort_frame[c] = sort_frame[c].round(4)
    order = sort_frame.sort_values(list(sort_frame.columns)).index
    return pdf.loc[order].reset_index(drop=True)


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    got = _norm(spark_df.toPandas())
    want = _norm(oracle_pdf)
    if len(got) != len(want):
        problems.append(f"{name}: row count {len(got)} != oracle {len(want)}")
        return problems
    if list(got.columns) != list(want.columns):
        problems.append(f"{name}: columns {list(got.columns)} != {list(want.columns)}")
        return problems
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            av = a.astype(np.float64).to_numpy()
            bv = b.astype(np.float64).to_numpy()
            ok = np.allclose(av, bv, rtol=1e-9, atol=1e-6, equal_nan=True)
        else:
            ok = a.astype(object).where(pd.notna(a), None).equals(
                b.astype(object).where(pd.notna(b), None)
            )
        if not ok:
            diff_i = None
            try:
                neq = ~(a.astype(object).where(pd.notna(a), None) == b.astype(object).where(pd.notna(b), None))
                diff_i = int(np.flatnonzero(neq.to_numpy())[0])
            except Exception:
                pass
            detail = ""
            if diff_i is not None:
                detail = f" first diff @row {diff_i}: {a.iloc[diff_i]!r} vs {b.iloc[diff_i]!r}"
            problems.append(f"{name}: column {c} values differ{detail}")
    return problems


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duck_con(sf_dir)
    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            results[name] = [f"{name}: SPARK FAILED: {e}"]
            continue
        if name not in oracles:
            try:
                n = sdf.count()
                results[name] = [] if n >= 0 else [f"{name}: negative count?"]
            except Exception as e:  # noqa: BLE001
                results[name] = [f"{name}: SPARK COUNT FAILED: {e}"]
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"{name}: ORACLE FAILED: {e}"]
            continue
        try:
            results[name] = compare(name, sdf, want)
        except Exception as e:  # noqa: BLE001
            results[name] = [f"{name}: COMPARE FAILED: {e}"]
    return results
