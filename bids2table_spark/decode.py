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

from .blocks import is_list_phys, list_child_phys

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
    """Fold flattened ``parent·child·…`` leaves back into a nesting tree.

    Node kinds: ``leaf`` (a physical block column), ``struct`` (validity
    leaf phys ``boolean``), ``list_struct`` (validity leaf phys
    ``list<boolean>``; every field leaf is a parallel list).  Returns
    (ddl, tree) where tree is the ordered {name: node} map of output
    columns."""

    def new_node():
        return {"kind": None, "children": {}, "defined": None}

    root = new_node()
    for name, phys in columns:
        parts = name.split("·")
        node = root
        for p in parts[:-1]:
            node = node["children"].setdefault(p, new_node())
        last = parts[-1]
        if last == "__defined__":
            node["kind"] = "list_struct" if phys.startswith("list<") else "struct"
            node["defined"] = name
        else:
            node["children"][last] = {
                "kind": "leaf", "children": {}, "name": name, "phys": phys,
            }

    def node_ddl(node) -> str:
        if node["kind"] == "leaf":
            return phys_ddl(node["phys"])
        fields = ", ".join(
            f"{k}: {node_ddl(c)}" if node["kind"] == "struct"
            else f"{k}: {phys_ddl(list_child_phys(c['phys']))}"
            for k, c in node["children"].items()
        )
        return f"struct<{fields}>" if node["kind"] == "struct" else f"array<struct<{fields}>>"

    parts = ["pt string"]
    for name, node in root["children"].items():
        parts.append(f"`{name}` {node_ddl(node)}")
    return ", ".join(parts), root


def decode_table(blocks_df, columns: list[tuple[str, str]] | None = None, verify: bool = True):
    """Inverse of encode.encode_table.  Returns pt + original columns.

    Arrow-native: each (pt, grp, block_id) group holds one block row per
    column; kernels decode straight to Arrow arrays and the chunk is
    reassembled without touching pandas."""
    if columns is None:
        columns = table_columns(blocks_df)
    ddl, tree = _output_plan(columns)
    # decode ONLY requested columns: a projection pushdown keeps each
    # chunk's col_idx==0 block as a row-count anchor (decode_job), and an
    # anchor that isn't itself requested must not pay decode + checksum
    needed = {name for name, _ in columns}

    def decode_group(key, tbl):  # no hints: pyspark infers eval type
        import numpy as np
        import pyarrow.compute as pc

        from .blocks import decode_block, pin_worker_threads

        pin_worker_threads()
        pt = str(key[0])
        rows = tbl.to_pylist()  # <= n_columns small rows (metadata + payload)
        out = {}
        for row in rows:
            if row["column"] in needed:
                out[row["column"]] = decode_block(row, verify=verify)

        def node_type(node) -> pa.DataType:
            if node["kind"] == "leaf":
                return _arrow_target(node["phys"])
            if node["kind"] == "struct":
                fields = [(k, node_type(c)) for k, c in node["children"].items()]
                return pa.struct(fields)
            fields = [
                (k, _arrow_target(list_child_phys(c["phys"])))
                for k, c in node["children"].items()
            ]
            return pa.list_(pa.struct(fields))

        def assemble(node) -> pa.Array:
            # SCHEMA EVOLUTION null-fill: a group encoded before a column
            # was added has no block for it — emit typed NULLs instead of
            # KeyError (reference null-fill cast, bids2table/schema.py:
            # 195-224).  A missing __defined__ leaf means the whole
            # struct/list column post-dates this group.
            if node["kind"] == "leaf":
                if node["name"] not in out:
                    return pa.nulls(n, _arrow_target(node["phys"]))
                return _cast_for_spark(out[node["name"]], node["phys"])
            if node["defined"] not in out:
                return pa.nulls(n, node_type(node))
            if node["kind"] == "struct":
                defined = out[node["defined"]].cast(pa.bool_())
                children = [assemble(c) for c in node["children"].values()]
                return pa.StructArray.from_arrays(
                    children,
                    names=list(node["children"]),
                    mask=pc.invert(pc.fill_null(defined, False)),
                )
            # list_struct: zip parallel list leaves back into list<struct>
            ld = out[node["defined"]]  # list<bool>: element struct validity
            lengths = pc.fill_null(pc.list_value_length(ld), 0)
            off = np.concatenate(
                [np.zeros(1, dtype=np.int64),
                 np.cumsum(lengths.to_numpy(zero_copy_only=False), dtype=np.int64)]
            )
            elem_defined = pc.list_flatten(ld).cast(pa.bool_())
            children = [
                _cast_for_spark(pc.list_flatten(out[c["name"]]), list_child_phys(c["phys"]))
                if c["name"] in out
                else pa.nulls(len(elem_defined), _arrow_target(list_child_phys(c["phys"])))
                for c in node["children"].values()
            ]
            struct = pa.StructArray.from_arrays(
                children,
                names=list(node["children"]),
                mask=pc.invert(pc.fill_null(elem_defined, False)),
            )
            lists = pa.LargeListArray.from_arrays(pa.array(off, type=pa.int64()), struct)
            outer_mask = ld.is_valid().to_numpy(zero_copy_only=False)
            if not bool(outer_mask.all()):
                idx = np.arange(len(outer_mask), dtype=np.int64)
                indices = pa.array(idx, type=pa.int64(), mask=~outer_mask)
                lists = lists.take(indices)
            return lists.cast(pa.list_(struct.type))

        # row count from block METADATA (every column block of a chunk
        # records the same n_rows), so a chunk whose only surviving block
        # is an undecoded anchor still emits its rows (null-filled)
        n = int(rows[0]["n_rows"]) if rows else 0
        arrays = [pa.array([pt] * n, type=pa.string())]
        names = ["pt"]
        for name, node in tree["children"].items():
            arrays.append(assemble(node))
            names.append(name)
        return pa.Table.from_arrays(arrays, names=names)

    # EXPLICIT repartition on the group key (round 6): the groupBy's own
    # exchange is an ENSURE_REQUIREMENTS shuffle, which AQE happily
    # coalesces by *bytes* — encoded chunks are tiny (~10 B/row), so at
    # bench scale the whole decode collapsed into ONE post-shuffle
    # partition and every chunk's kernel work ran serially in a single
    # python worker (measured: all chunks on one pid).  A
    # REPARTITION_BY_NUM shuffle pins the partition count; the groupBy
    # reuses its partitioning, so there is still exactly one exchange.
    # Same fix encode_grouped has carried since round 1 (encode.py).
    n_part = blocks_df.sparkSession.sparkContext.defaultParallelism
    blocks_df = blocks_df.repartition(n_part, "pt", "grp", "block_id")
    return blocks_df.groupBy("pt", "grp", "block_id").applyInArrow(decode_group, ddl)
