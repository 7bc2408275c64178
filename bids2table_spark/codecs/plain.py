"""PLAIN codec — uncompressed canonical layout; the fallback every selector
estimate is compared against."""

from __future__ import annotations

import numpy as np

from . import bitpack as bp
from .base import DTYPE_F64, DTYPE_I64, DTYPE_STR, buf_to_strings, pack_sections, split_sections, strings_to_buf


class PlainCodec:
    name = "plain"
    dtypes = (DTYPE_STR, DTYPE_I64, DTYPE_F64)

    def encode(self, values, dtype: str) -> tuple[dict, bytes]:
        if dtype == DTYPE_STR:
            offsets, buf = strings_to_buf(values)
            # offsets are monotone — delta+bitpack them even in PLAIN (cheap,
            # lossless, and keeps the payload self-describing)
            lens, payload = pack_sections([bp.encode_i64(offsets), buf])
            return {"sections": lens}, payload
        arr = np.ascontiguousarray(values, dtype=np.int64 if dtype == DTYPE_I64 else np.float64)
        return {"sections": [arr.nbytes]}, arr.tobytes()

    def decode(self, meta: dict, payload: bytes, n: int, dtype: str):
        if dtype == DTYPE_STR:
            off_b, buf = split_sections(meta["sections"], payload)
            return buf_to_strings(bp.decode_i64(off_b), buf)
        dt = np.int64 if dtype == DTYPE_I64 else np.float64
        return np.frombuffer(payload, dtype=dt, count=n)
