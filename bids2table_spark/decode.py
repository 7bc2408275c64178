"""Distributed decode: block rows -> original DataFrame, bit-identical.

Groups block rows by (pt, grp, block_id) — all column blocks of one chunk
land together — decodes each column with its codec kernel, verifies the
sha256 checksum against the canonical decoded representation, and reassembles
the chunk as an Arrow batch.  The shuffle moves *encoded* (small) data.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

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
    """Inverse of encode.encode_table.  Returns pt + original columns.

    Arrow-native: each (pt, grp, block_id) group holds one block row per
    column; kernels decode straight to Arrow arrays and the chunk is
    reassembled without touching pandas."""
    if columns is None:
        columns = table_columns(blocks_df)
    ddl = "pt string, " + ", ".join(f"{c} {_PHYS_TO_DDL[p]}" for c, p in columns)
    col_names = [c for c, _ in columns]
    phys_by_col = dict(columns)

    def decode_group(key, tbl):  # no hints: pyspark infers eval type
        from .blocks import decode_block, pin_worker_threads

        pin_worker_threads()
        pt = str(key[0])
        rows = tbl.to_pylist()  # <= n_columns small rows (metadata + payload)
        out = {}
        for row in rows:
            out[row["column"]] = decode_block(row, verify=verify)
        n = len(next(iter(out.values()))) if out else 0
        arrays = [pa.array([pt] * n, type=pa.string())]
        names = ["pt"]
        for c in col_names:
            arr = out[c]
            phys = phys_by_col[c]
            if phys == "timestamp":
                # kernel emits tz-naive epoch-ns; session TZ is pinned UTC
                arr = arr.cast(pa.timestamp("us")).cast(pa.timestamp("us", tz="UTC"))
            elif phys == "timestamp_ntz":
                arr = arr.cast(pa.timestamp("us"))
            arrays.append(arr)
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    return blocks_df.groupBy("pt", "grp", "block_id").applyInArrow(decode_group, ddl)
