"""PLAIN codec — uncompressed canonical layout; the fallback every selector
estimate is compared against."""

from __future__ import annotations

import numpy as np

from . import bitpack as bp
from .base import (
    DTYPE_BIN,
    DTYPE_F32,
    DTYPE_F64,
    DTYPE_I64,
    DTYPE_STR,
    buf_to_strings,
    pack_sections,
    split_sections,
    strings_to_buf,
)

_NUM_DTYPES = {DTYPE_I64: np.int64, DTYPE_F64: np.float64, DTYPE_F32: np.float32}


class PlainCodec:
    name = "plain"
    dtypes = (DTYPE_STR, DTYPE_BIN, DTYPE_I64, DTYPE_F64, DTYPE_F32)

    def encode(self, values, dtype: str) -> tuple[dict, bytes]:
        if dtype in (DTYPE_STR, DTYPE_BIN):
            offsets, buf = strings_to_buf(values)
            # offsets are monotone — delta+bitpack them even in PLAIN (cheap,
            # lossless, and keeps the payload self-describing)
            lens, payload = pack_sections([bp.encode_i64(offsets), buf])
            return {"sections": lens}, payload
        arr = np.ascontiguousarray(values, dtype=_NUM_DTYPES[dtype])
        return {"sections": [arr.nbytes]}, arr.tobytes()

    def decode(self, meta: dict, payload: bytes, n: int, dtype: str):
        if dtype in (DTYPE_STR, DTYPE_BIN):
            off_b, buf = split_sections(meta["sections"], payload)
            return buf_to_strings(bp.decode_i64(off_b), buf, binary=dtype == DTYPE_BIN)
        return np.frombuffer(payload, dtype=_NUM_DTYPES[dtype], count=n)
