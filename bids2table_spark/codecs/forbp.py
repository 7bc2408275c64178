"""Frame-of-reference + bit-packing codec for integer columns
(``turn_idx``, dictionary codes)."""

from __future__ import annotations

import numpy as np

from . import bitpack as bp
from .base import DTYPE_I64


class ForBitpackCodec:
    name = "forbp"
    dtypes = (DTYPE_I64,)

    def encode(self, values, dtype: str) -> tuple[dict, bytes]:
        payload = bp.encode_i64(np.ascontiguousarray(values, dtype=np.int64))
        return {"sections": [len(payload)]}, payload

    def decode(self, meta: dict, payload: bytes, n: int, dtype: str):
        return bp.decode_i64(payload)
