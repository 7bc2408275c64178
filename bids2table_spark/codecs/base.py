"""Codec protocol + block payload helpers.

Every codec maps one column block (a numpy/pandas array of non-null values)
to ``(meta: dict, payload: bytes)`` and back, bit-identically.  Nulls are
handled one layer up (the block container strips them and stores a packed
validity bitmap), so kernels only ever see valid values.

This mirrors the reference's extension-type ``pack``/``unpack`` seam
(``bids2table/extensions/pickle.py:43-66``) — an opaque binary cell plus a
decode hook that must round-trip exactly — generalized to whole column
blocks with codec-specific metadata.
"""

from __future__ import annotations

import json
from typing import Protocol

import numpy as np

# Logical dtypes the engine encodes.  Timestamps travel as "i64" (epoch
# nanoseconds), dates as "i64" days, booleans as "i64" 0/1; the container
# layer does those conversions.  "bin" shares the string kernels (both are
# offsets + byte blob); "f32" keeps float columns at 4 bytes.
DTYPE_STR = "str"
DTYPE_I64 = "i64"
DTYPE_F64 = "f64"
DTYPE_F32 = "f32"
DTYPE_BIN = "bin"


class Codec(Protocol):
    name: str
    dtypes: tuple[str, ...]

    def encode(self, values, dtype: str) -> tuple[dict, bytes]: ...

    def decode(self, meta: dict, payload: bytes, n: int, dtype: str): ...


def pack_sections(sections: list[bytes]) -> tuple[list[int], bytes]:
    """Concatenate binary sections; return (lengths, payload)."""
    return [len(s) for s in sections], b"".join(sections)


def split_sections(lengths: list[int], payload: bytes) -> list[bytes]:
    out = []
    off = 0
    for ln in lengths:
        out.append(payload[off : off + ln])
        off += ln
    return out


def meta_dumps(meta: dict) -> str:
    """Deterministic JSON for block metadata (sorted keys, no whitespace)."""
    return json.dumps(meta, sort_keys=True, separators=(",", ":"))


def meta_loads(s: str) -> dict:
    return json.loads(s)


def strings_to_buf(values) -> tuple[np.ndarray, bytes]:
    """Canonical (offsets, byte-concat) view of a string OR binary array via
    Arrow buffers — zero per-item Python.

    ``offsets`` has n+1 entries (int64); item i is buf[offsets[i]:offsets[i+1]].
    """
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        target = (
            pa.large_binary()
            if pa.types.is_binary(values.type) or pa.types.is_large_binary(values.type)
            else pa.large_string()
        )
        arr = values.cast(target)
    elif len(values) and isinstance(
        values[0] if not hasattr(values, "iloc") else values.iloc[0], (bytes, bytearray)
    ):
        arr = pa.array(values, type=pa.large_binary())
    else:
        arr = pa.array(values, type=pa.large_string())
    if arr.null_count:
        raise ValueError("strings_to_buf expects non-null values")
    n = len(arr)
    if n == 0:
        return np.zeros(1, dtype=np.int64), b""
    # honor arr.offset: a zero-copy slice shares its parent's buffers, so the
    # first logical offset lives at buffer position arr.offset
    raw_off = np.frombuffer(
        arr.buffers()[1], dtype=np.int64, count=n + 1 + arr.offset
    )[arr.offset :]
    data = arr.buffers()[2]
    # slice the Arrow buffer FIRST: to_pybytes() on the parent buffer would
    # copy the whole parent (a 1000-row slice of a 10MB array copied 10MB
    # per call, x3 calls per string block on the encode path)
    buf = (
        data.slice(int(raw_off[0]), int(raw_off[-1] - raw_off[0])).to_pybytes()
        if data is not None
        else b""
    )
    return (raw_off - raw_off[0]).copy(), buf


def buf_to_strings(offsets: np.ndarray, buf: bytes, binary: bool = False):
    """Inverse of :func:`strings_to_buf`; returns a pyarrow LargeString (or
    LargeBinary) array — accepted by Arrow batch assembly without per-item
    copies."""
    import pyarrow as pa

    n = len(offsets) - 1
    off_buf = pa.py_buffer(np.ascontiguousarray(offsets, dtype=np.int64).tobytes())
    t = pa.large_binary() if binary else pa.large_string()
    return pa.Array.from_buffers(t, n, [None, off_buf, pa.py_buffer(buf)])
