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
# nanoseconds); the container layer does the ns<->timestamp conversion.
DTYPE_STR = "str"
DTYPE_I64 = "i64"
DTYPE_F64 = "f64"


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
    """Canonical (offsets, utf8-concat) view of a string array via Arrow
    buffers — zero per-string Python.

    ``offsets`` has n+1 entries (int64); string i is buf[offsets[i]:offsets[i+1]].
    """
    import pyarrow as pa

    if isinstance(values, pa.Array):
        arr = values.cast(pa.large_string())
    elif isinstance(values, pa.ChunkedArray):
        arr = values.combine_chunks().cast(pa.large_string())
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
    buf = data.to_pybytes()[raw_off[0] : raw_off[-1]] if data is not None else b""
    return (raw_off - raw_off[0]).copy(), buf


def buf_to_strings(offsets: np.ndarray, buf: bytes):
    """Inverse of :func:`strings_to_buf`; returns a pyarrow LargeStringArray
    (accepted by pandas/Arrow batch assembly without copying per string)."""
    import pyarrow as pa

    n = len(offsets) - 1
    off_buf = pa.py_buffer(np.ascontiguousarray(offsets, dtype=np.int64).tobytes())
    return pa.Array.from_buffers(
        pa.large_string(), n, [None, off_buf, pa.py_buffer(buf)]
    )
