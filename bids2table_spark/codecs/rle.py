"""Run-length encoding for sorted/low-churn columns (``conv_id``, ``role``
runs after the (conv_id, turn_idx) sort).

Run boundaries are found with a single vectorized inequality; run values are
dictionary-encoded (strings) or FOR+bit-packed (ints); run lengths are
FOR+bit-packed.  SQL-oracle equivalent: ``lag`` + cumulative ``sum`` window
(see __spark_entry__ ``run_length_sql``).
"""

from __future__ import annotations

import numpy as np

from . import bitpack as bp
from .base import DTYPE_BIN, DTYPE_I64, DTYPE_STR, pack_sections, split_sections
from .dictionary import factorize_block


def run_starts(codes: np.ndarray) -> np.ndarray:
    """Boolean mask of run-start positions for an int code array."""
    if len(codes) == 0:
        return np.zeros(0, dtype=bool)
    starts = np.empty(len(codes), dtype=bool)
    starts[0] = True
    np.not_equal(codes[1:], codes[:-1], out=starts[1:])
    return starts


class RleCodec:
    name = "rle"
    dtypes = (DTYPE_STR, DTYPE_BIN, DTYPE_I64)

    def encode(self, values, dtype: str) -> tuple[dict, bytes]:
        if dtype in (DTYPE_STR, DTYPE_BIN):
            codes, uniques = factorize_block(values)
        else:
            codes = np.ascontiguousarray(values, dtype=np.int64)
            uniques = None
        starts = run_starts(codes)
        idx = np.flatnonzero(starts)
        run_vals = codes[idx]
        run_lens = np.diff(np.append(idx, len(codes)))
        sections = [bp.encode_i64(run_vals), bp.encode_i64(run_lens)]
        extra: dict = {}
        if dtype in (DTYPE_STR, DTYPE_BIN):
            from .dictionary import encode_uniques

            extra, usec = encode_uniques(uniques)
            sections += usec
        lens, payload = pack_sections(sections)
        return {"sections": lens, "n_runs": int(len(idx)), **extra}, payload

    def decode(self, meta: dict, payload: bytes, n: int, dtype: str):
        parts = split_sections(meta["sections"], payload)
        run_vals = bp.decode_i64(parts[0])
        run_lens = bp.decode_i64(parts[1])
        codes = np.repeat(run_vals, run_lens)
        if dtype in (DTYPE_STR, DTYPE_BIN):
            from .dictionary import decode_uniques

            uniques = decode_uniques(meta, parts[2:], binary=dtype == DTYPE_BIN)
            return uniques.take(codes)
        return codes
