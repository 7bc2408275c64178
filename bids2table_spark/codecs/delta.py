"""Delta + zigzag + FOR/bit-pack codec for near-monotone integer columns
(``ts`` epoch-nanos, ``turn_idx``).

Within a block sorted by (conv_id, turn_idx) timestamp deltas are small
positive jitters; conversation boundaries produce one outlier delta which the
per-miniblock framing in :mod:`bitpack` absorbs.  Zigzag keeps occasional
negative boundary deltas cheap.  SQL-oracle equivalent:
``ts - lag(ts) OVER (PARTITION BY ... ORDER BY ...)``.
"""

from __future__ import annotations

import numpy as np

from . import bitpack as bp
from .base import DTYPE_I64


class DeltaCodec:
    name = "delta"
    dtypes = (DTYPE_I64,)

    def encode(self, values, dtype: str) -> tuple[dict, bytes]:
        v = np.ascontiguousarray(values, dtype=np.int64)
        if len(v) == 0:
            return {"sections": [0], "first": 0}, b""
        # wraparound-safe diffs (GCD-extracted: second/ms-granular
        # timestamps stored as ns have a huge common delta factor),
        # zigzagged so negatives stay narrow — shared helper so the
        # selector's estimate can never drift from the encoding
        dd, g = bp.gcd_deltas(v)
        payload = bp.encode_u64(bp.zigzag(dd))
        return {"sections": [len(payload)], "first": int(v[0]), "gcd": g}, payload

    def decode(self, meta: dict, payload: bytes, n: int, dtype: str):
        if n == 0:
            return np.empty(0, dtype=np.int64)
        d = bp.unzigzag(bp.decode_u64(payload))
        g = int(meta.get("gcd", 1))
        if g > 1:
            d = d * np.int64(g)
        out = np.empty(n, dtype=np.uint64)
        out[0] = np.uint64(int(meta["first"]) & 0xFFFFFFFFFFFFFFFF)
        np.cumsum(d.view(np.uint64), out=out[1:])  # wraparound cumsum
        out[1:] += out[0]
        return out.view(np.int64)
