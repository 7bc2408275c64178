"""Distributed decode: block rows -> original DataFrame, bit-identical.

Groups block rows by (pt, grp, block_id) — all column blocks of one chunk
land together — decodes each column with its codec kernel, verifies the
sha256 checksum against the canonical decoded representation, and reassembles
the chunk as an Arrow batch.  The shuffle moves *encoded* (small) data.
"""

from __future__ import annotations

import pandas as pd

from .blocks import decode_block

_PHYS_TO_DDL = {
    "string": "string",
    "int": "int",
    "long": "long",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp_ntz",
    "double": "double",
}


def table_columns(blocks_df) -> list[tuple[str, str]]:
    """Recover the encoded table's ordered (column, phys) list from blocks."""
    rows = (
        blocks_df.select("column", "col_idx", "phys")
        .distinct()
        .orderBy("col_idx")
        .collect()
    )
    seen = {}
    for r in rows:
        seen.setdefault(r["column"], r["phys"])
    return list(seen.items())


def decode_table(blocks_df, columns: list[tuple[str, str]] | None = None, verify: bool = True):
    """Inverse of encode.encode_table.  Returns pt + original columns."""
    if columns is None:
        columns = table_columns(blocks_df)
    ddl = "pt string, " + ", ".join(f"{c} {_PHYS_TO_DDL[p]}" for c, p in columns)
    col_names = [c for c, _ in columns]

    def decode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pt = str(key[0])
        out = {}
        for _, row in pdf.iterrows():  # <= n_columns rows per group
            out[row["column"]] = decode_block(row, verify=verify)
        n = len(next(iter(out.values()))) if out else 0
        frame = pd.DataFrame({"pt": pd.Series([pt] * n, dtype="object")})
        for c in col_names:
            arr = out[c]
            frame[c] = arr.to_pandas()
        return frame

    return blocks_df.groupBy("pt", "grp", "block_id").applyInPandas(decode_group, ddl)
