"""Distributed decode: block rows -> original DataFrame, bit-identical.

Groups block rows by (pt, grp, block_id) — all column blocks of one chunk
land together — decodes each column with its codec kernel, verifies the
sha256 checksum against the canonical decoded representation, and reassembles
the chunk as an Arrow batch.  The shuffle moves *encoded* (small) data.

Struct columns arrive flattened as ``parent·child`` leaves plus a
``parent·__defined__`` validity column (see encode.flatten_struct_columns);
this module reassembles them into proper struct columns.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .blocks import decode_block, is_list_phys, list_child_phys

_PHYS_TO_DDL = {
    "string": "string",
    "int": "int",
    "long": "long",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp_ntz",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "binary": "binary",
}


def phys_ddl(phys: str) -> str:
    if is_list_phys(phys):
        return f"array<{phys_ddl(list_child_phys(phys))}>"
    return _PHYS_TO_DDL[phys]


def _arrow_target(phys: str) -> pa.DataType:
    """The arrow type Spark expects for a given physical tag (timestamps are
    handled separately — they need a two-step naive-ns -> us -> UTC cast)."""
    m = {
        "string": pa.string(), "int": pa.int32(), "long": pa.int64(),
        "double": pa.float64(), "float": pa.float32(), "boolean": pa.bool_(),
        "date": pa.date32(), "binary": pa.binary(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if is_list_phys(phys):
        return pa.list_(_arrow_target(list_child_phys(phys)))
    return m[phys]


def _cast_for_spark(arr: pa.Array, phys: str) -> pa.Array:
    if phys == "timestamp":
        # kernel emits tz-naive epoch-ns; session TZ is pinned UTC
        return arr.cast(pa.timestamp("us")).cast(pa.timestamp("us", tz="UTC"))
    if phys == "timestamp_ntz":
        return arr.cast(pa.timestamp("us"))
    if is_list_phys(phys) and list_child_phys(phys).startswith("timestamp"):
        child = list_child_phys(phys)
        arr = arr.cast(pa.large_list(pa.timestamp("us")))
        return arr.cast(_arrow_target(phys))
    return arr.cast(_arrow_target(phys))


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


def _output_plan(columns: list[tuple[str, str]]):
    """Fold flattened struct leaves back into struct fields.

    Returns (ddl, assembly) where assembly is an ordered list of either
    ("col", name, phys) or ("struct", name, [(field, leaf_name, phys), ...],
    defined_leaf_name)."""
    assembly = []
    struct_entry: dict[str, list] = {}
    for name, phys in columns:
        if "·" not in name:
            assembly.append(("col", name, phys))
            continue
        parent, field = name.split("·", 1)
        if parent not in struct_entry:
            struct_entry[parent] = []
            assembly.append(("struct", parent, struct_entry[parent], f"{parent}·__defined__"))
        if field != "__defined__":
            struct_entry[parent].append((field, name, phys))
    parts = ["pt string"]
    for item in assembly:
        if item[0] == "col":
            parts.append(f"`{item[1]}` {phys_ddl(item[2])}")
        else:
            fields = ", ".join(f"{f}: {phys_ddl(p)}" for f, _, p in item[2])
            parts.append(f"`{item[1]}` struct<{fields}>")
    return ", ".join(parts), assembly


def decode_table(blocks_df, columns: list[tuple[str, str]] | None = None, verify: bool = True):
    """Inverse of encode.encode_table.  Returns pt + original columns.

    Arrow-native: each (pt, grp, block_id) group holds one block row per
    column; kernels decode straight to Arrow arrays and the chunk is
    reassembled without touching pandas."""
    if columns is None:
        columns = table_columns(blocks_df)
    ddl, assembly = _output_plan(columns)

    def decode_group(key, tbl):  # no hints: pyspark infers eval type
        import pyarrow.compute as pc

        from .blocks import decode_block, pin_worker_threads

        pin_worker_threads()
        pt = str(key[0])
        rows = tbl.to_pylist()  # <= n_columns small rows (metadata + payload)
        out = {}
        phys_of = {}
        for row in rows:
            out[row["column"]] = decode_block(row, verify=verify)
            phys_of[row["column"]] = row["phys"]
        n = len(next(iter(out.values()))) if out else 0
        arrays = [pa.array([pt] * n, type=pa.string())]
        names = ["pt"]
        for item in assembly:
            if item[0] == "col":
                _, name, phys = item
                arrays.append(_cast_for_spark(out[name], phys))
                names.append(name)
            else:
                _, parent, fields, defined_name = item
                defined = out[defined_name].cast(pa.bool_())
                children = [_cast_for_spark(out[leaf], p) for _, leaf, p in fields]
                struct = pa.StructArray.from_arrays(
                    children,
                    names=[f for f, _, _ in fields],
                    mask=pc.invert(pc.fill_null(defined, False)),
                )
                arrays.append(struct)
                names.append(parent)
        return pa.Table.from_arrays(arrays, names=names)

    return blocks_df.groupBy("pt", "grp", "block_id").applyInArrow(decode_group, ddl)
