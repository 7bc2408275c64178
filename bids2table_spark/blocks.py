"""Block container: the bridge between pandas column chunks (inside
``applyInPandas``) and the numpy codec kernels.

One *block* = one column of one row-chunk of one encode group, stored as a
single row of the blocks table:

    pt, grp, block_id, column, codec, phys, n_rows, n_nulls,
    meta (json), payload (binary), orig_bytes, enc_bytes, checksum

Null handling lives here (codecs only see valid values): the validity bitmap
is ``np.packbits``-packed and carried as the first payload section.  The
checksum is a sha256 over the canonical decoded representation (null-zeroed
values + validity bitmap) computed at encode time and re-verified after
decode — the bit-identical round-trip gate.

Reference seam: the opaque-cell + pack/unpack structure of
``bids2table/extensions/pickle.py:43-66`` and the per-file integrity records
of ``bids2table/logging.py:98-131``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .codecs import get_codec
from .codecs.base import (
    DTYPE_F64,
    DTYPE_I64,
    DTYPE_STR,
    meta_dumps,
    meta_loads,
    strings_to_buf,
)

# physical (Spark-facing) type tags
PHYS_STRING = "string"
PHYS_INT = "int"
PHYS_LONG = "long"
PHYS_TS = "timestamp"
PHYS_TS_NTZ = "timestamp_ntz"
PHYS_DOUBLE = "double"

PHYS_TO_LOGICAL = {
    PHYS_STRING: DTYPE_STR,
    PHYS_INT: DTYPE_I64,
    PHYS_LONG: DTYPE_I64,
    PHYS_TS: DTYPE_I64,
    PHYS_TS_NTZ: DTYPE_I64,
    PHYS_DOUBLE: DTYPE_F64,
}

BLOCKS_SCHEMA_DDL = (
    "pt string, grp string, block_id long, column string, codec string, "
    "phys string, n_rows long, n_nulls long, meta string, payload binary, "
    "orig_bytes long, enc_bytes long, checksum string"
)


def pin_worker_threads() -> None:
    """Cap Arrow's per-process thread pools inside python workers (called at
    the top of every grouped UDF; idempotent).  See the session.py note —
    32 workers each defaulting to machine-wide pools makes local[32] slower
    than local[8]."""
    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
        try:
            pa.set_io_thread_count(1)
        except Exception:
            pass


def spark_field_phys(dt) -> str:
    """Map a Spark DataType to a physical tag."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StringType):
        return PHYS_STRING
    if isinstance(dt, T.IntegerType):
        return PHYS_INT
    if isinstance(dt, T.LongType):
        return PHYS_LONG
    if isinstance(dt, T.TimestampType):
        return PHYS_TS
    if isinstance(dt, T.TimestampNTZType):
        return PHYS_TS_NTZ
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return PHYS_DOUBLE
    raise TypeError(f"unsupported column type for encoding: {dt}")


def _to_kernel(series: pd.Series, phys: str) -> tuple[np.ndarray | pd.Series, np.ndarray]:
    """(valid_values_for_kernel, validity_mask). Timestamps -> epoch ns."""
    mask = series.notna().to_numpy()
    if phys in (PHYS_TS, PHYS_TS_NTZ):
        vals = pd.to_datetime(series).astype("datetime64[ns]").astype(np.int64).to_numpy()
        return vals[mask], mask
    if phys in (PHYS_INT, PHYS_LONG):
        v = series.to_numpy()
        if v.dtype.kind == "f":  # pandas promoted nullable ints to float
            vals = np.zeros(len(v), dtype=np.int64)
            vals[mask] = v[mask].astype(np.int64)
            return vals[mask], mask
        return v.astype(np.int64)[mask], mask
    if phys == PHYS_DOUBLE:
        return series.to_numpy(dtype=np.float64)[mask], mask
    # strings
    return series[mask], mask


def _canonical_bytes(values, mask: np.ndarray, phys: str) -> bytes:
    """Canonical byte image of a (valid-values, mask) column for checksums."""
    h = hashlib.sha256()
    h.update(np.packbits(mask).tobytes())
    if phys == PHYS_STRING:
        offsets, buf = strings_to_buf(values)
        h.update(offsets.tobytes())
        h.update(buf)
    else:
        h.update(np.ascontiguousarray(values).tobytes())
    return h.hexdigest()


def _to_kernel_arrow(arr: pa.Array, phys: str):
    """Arrow-native variant of :func:`_to_kernel` — no pandas object boxing.

    Returns (valid_values_for_kernel, validity_mask).  Timestamps normalize
    to epoch ns regardless of the arrow unit so checksums agree with the
    pandas path.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if arr.null_count:
        mask = arr.is_valid().to_numpy(zero_copy_only=False)
        valid_arr = arr.drop_null()
    else:
        mask = np.ones(n, dtype=bool)
        valid_arr = arr
    if phys in (PHYS_TS, PHYS_TS_NTZ):
        t = valid_arr.type
        vals = valid_arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        unit = t.unit if pa.types.is_timestamp(t) else "us"
        scale = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}[unit]
        return vals * np.int64(scale), mask
    if phys in (PHYS_INT, PHYS_LONG):
        return valid_arr.cast(pa.int64()).to_numpy(zero_copy_only=False), mask
    if phys == PHYS_DOUBLE:
        return valid_arr.cast(pa.float64()).to_numpy(zero_copy_only=False), mask
    return valid_arr, mask  # strings stay as an arrow array


def encode_block_arrow(
    pt: str,
    grp: str,
    block_id: int,
    column: str,
    arr: pa.Array,
    phys: str,
    codec_name: str,
) -> dict:
    """Arrow-native encode of one column chunk into a block-row dict."""
    logical = PHYS_TO_LOGICAL[phys]
    valid, mask = _to_kernel_arrow(arr, phys)
    n = len(arr)
    n_nulls = int(n - mask.sum())
    codec = get_codec(codec_name)
    meta, payload = codec.encode(valid, logical)
    if n_nulls:
        mask_b = np.packbits(mask).tobytes()
        payload = mask_b + payload
        meta = dict(meta)
        meta["mask_bytes"] = len(mask_b)
    if phys == PHYS_STRING:
        offs, _ = strings_to_buf(valid)
        orig = int(offs[-1]) + 8 * n
    else:
        orig = 8 * n
    return {
        "pt": pt,
        "grp": grp,
        "block_id": block_id,
        "column": column,
        "codec": codec_name,
        "phys": phys,
        "n_rows": n,
        "n_nulls": n_nulls,
        "meta": meta_dumps(meta),
        "payload": payload,
        "orig_bytes": orig,
        "enc_bytes": len(payload),
        "checksum": _canonical_bytes(valid, mask, phys),
    }


def encode_block(
    pt: str,
    grp: str,
    block_id: int,
    column: str,
    series: pd.Series,
    phys: str,
    codec_name: str,
) -> dict:
    """Encode one column chunk into a block-row dict."""
    logical = PHYS_TO_LOGICAL[phys]
    valid, mask = _to_kernel(series, phys)
    n = len(series)
    n_nulls = int(n - mask.sum())
    codec = get_codec(codec_name)
    meta, payload = codec.encode(valid, logical)
    if n_nulls:
        mask_b = np.packbits(mask).tobytes()
        payload = mask_b + payload
        meta = dict(meta)
        meta["mask_bytes"] = len(mask_b)
    if phys == PHYS_STRING:
        offs, buf = strings_to_buf(series.fillna(""))
        orig = int(offs[-1]) + 8 * n
    else:
        orig = 8 * n
    return {
        "pt": pt,
        "grp": grp,
        "block_id": block_id,
        "column": column,
        "codec": codec_name,
        "phys": phys,
        "n_rows": n,
        "n_nulls": n_nulls,
        "meta": meta_dumps(meta),
        "payload": payload,
        "orig_bytes": orig,
        "enc_bytes": len(payload),
        "checksum": _canonical_bytes(valid, mask, phys),
    }


def decode_block(row: dict | pd.Series, verify: bool = True) -> pa.Array:
    """Decode one block row back to a pyarrow array (with nulls)."""
    meta = meta_loads(row["meta"])
    phys = row["phys"]
    logical = PHYS_TO_LOGICAL[phys]
    n = int(row["n_rows"])
    n_nulls = int(row["n_nulls"])
    payload = row["payload"]
    if isinstance(payload, (bytearray, memoryview)):
        payload = bytes(payload)
    if n_nulls:
        mask_b = meta["mask_bytes"]
        mask = np.unpackbits(
            np.frombuffer(payload[:mask_b], dtype=np.uint8), count=n
        ).astype(bool)
        payload = payload[mask_b:]
    else:
        mask = np.ones(n, dtype=bool)
    codec = get_codec(row["codec"])
    valid = codec.decode(meta, payload, int(mask.sum()), logical)
    if verify:
        got = _canonical_bytes(valid, mask, phys)
        if got != row["checksum"]:
            raise ValueError(
                f"checksum mismatch for block {row['pt']}/{row['grp']}/"
                f"{row['block_id']}/{row['column']}"
            )
    return _to_arrow(valid, mask, phys)


def _to_arrow(valid, mask: np.ndarray, phys: str) -> pa.Array:
    n = len(mask)
    all_valid = bool(mask.all())
    if phys == PHYS_STRING:
        arr = valid if isinstance(valid, pa.Array) else pa.array(valid, type=pa.large_string())
        if all_valid:
            return arr.cast(pa.string())
        idx = np.cumsum(mask) - 1  # position of each row in the valid array
        indices = pa.array(np.where(mask, idx, 0), type=pa.int64(), mask=~mask)
        return arr.take(indices).cast(pa.string())
    vals = np.asarray(valid)
    full = np.zeros(n, dtype=vals.dtype if len(vals) else np.int64)
    full[mask] = vals
    null_mask = None if all_valid else ~mask
    if phys in (PHYS_TS, PHYS_TS_NTZ):
        return pa.array(full.view("datetime64[ns]"), type=pa.timestamp("ns"), mask=null_mask)
    if phys == PHYS_INT:
        return pa.array(full.astype(np.int32), type=pa.int32(), mask=null_mask)
    if phys == PHYS_LONG:
        return pa.array(full.astype(np.int64), type=pa.int64(), mask=null_mask)
    return pa.array(full.astype(np.float64), type=pa.float64(), mask=null_mask)
