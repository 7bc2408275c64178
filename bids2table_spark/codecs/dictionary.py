"""Dictionary codec for low-NDV columns (``role``, ``tool``).

Codes come from ``pd.factorize`` (first-appearance order — deterministic for
a given sorted block) and are FOR+bit-packed; the dictionary itself is stored
as delta-packed offsets + utf8 bytes (strings) or packed int64s.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import bitpack as bp
from .base import DTYPE_BIN, DTYPE_I64, DTYPE_STR, buf_to_strings, pack_sections, split_sections, strings_to_buf


def factorize_block(values) -> tuple[np.ndarray, "object"]:
    """Deterministic first-appearance (codes, uniques) for one block.

    Uses Arrow's dictionary_encode, not ``pd.factorize``: pandas' string
    hashing is NUL-terminated, so ``"\\x00\\x01"`` would collide with ``""``.
    """
    import pyarrow as pa

    if isinstance(values, pa.Array):
        arr = values
    else:
        arr = pa.Array.from_pandas(pd.Series(values, copy=False))
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_string())
    elif pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    d = arr.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return codes, d.dictionary


def encode_uniques(uniques) -> tuple[dict, list[bytes]]:
    """Dictionary-values payload: delta-packed offsets + utf8 blob, with the
    blob cascade-compressed through FSST when that actually shrinks it
    (cascaded lightweight encodings a la BtrBlocks)."""
    from . import fsst

    offsets, buf = strings_to_buf(uniques)
    off_b = bp.encode_i64(offsets)
    if len(buf) >= 2048:
        fmeta, fsec = fsst.encode_bytes(buf)
        if sum(len(s) for s in fsec) < len(buf) * 0.9:
            return {"uniq_fsst": fmeta}, [off_b] + fsec
    return {}, [off_b, buf]


def decode_uniques(meta: dict, sections: list[bytes], binary: bool = False):
    from . import fsst

    offsets = bp.decode_i64(sections[0])
    if "uniq_fsst" in meta:
        buf = fsst.decode_bytes(meta["uniq_fsst"], sections[1:])
    else:
        buf = sections[1]
    return buf_to_strings(offsets, buf, binary=binary)


class DictCodec:
    name = "dict"
    dtypes = (DTYPE_STR, DTYPE_BIN, DTYPE_I64)

    def encode(self, values, dtype: str) -> tuple[dict, bytes]:
        codes, uniques = factorize_block(values)
        code_b = bp.encode_i64(codes)
        if dtype in (DTYPE_STR, DTYPE_BIN):
            extra, usec = encode_uniques(uniques)
            lens, payload = pack_sections([code_b] + usec)
            return {"sections": lens, "ndv": int(len(uniques)), **extra}, payload
        uniq_np = uniques.to_numpy(zero_copy_only=False) if hasattr(uniques, "to_numpy") else uniques
        lens, payload = pack_sections(
            [code_b, bp.encode_i64(np.ascontiguousarray(uniq_np, dtype=np.int64))]
        )
        return {"sections": lens, "ndv": int(len(uniques))}, payload

    def decode(self, meta: dict, payload: bytes, n: int, dtype: str):
        parts = split_sections(meta["sections"], payload)
        codes = bp.decode_i64(parts[0])
        if dtype in (DTYPE_STR, DTYPE_BIN):
            uniques = decode_uniques(meta, parts[1:], binary=dtype == DTYPE_BIN)
            return uniques.take(codes)  # arrow take — vectorized
        uniques = bp.decode_i64(parts[1])
        return uniques[codes]
