"""Codec registry.

Mirrors the reference's plugin registries (``bids2table/loaders/registry.py:14-48``,
``handlers/registry.py:13-49``) — named implementations resolved from config —
as a plain dict keyed by codec name.
"""

from __future__ import annotations

from .alp import AlpCodec
from .base import DTYPE_BIN, DTYPE_F32, DTYPE_F64, DTYPE_I64, DTYPE_STR
from .delta import DeltaCodec
from .dictionary import DictCodec
from .forbp import ForBitpackCodec
from .fsst import FsstCodec
from .plain import PlainCodec
from .rle import RleCodec

CODECS = {
    c.name: c
    for c in (
        PlainCodec(), DictCodec(), RleCodec(), ForBitpackCodec(), DeltaCodec(),
        FsstCodec(), AlpCodec(),
    )
}


def get_codec(name: str):
    try:
        return CODECS[name]
    except KeyError:
        raise KeyError(f"unknown codec {name!r}; available: {sorted(CODECS)}") from None


def codecs_for_dtype(dtype: str) -> list[str]:
    return [name for name, c in CODECS.items() if dtype in c.dtypes]


__all__ = [
    "CODECS",
    "get_codec",
    "codecs_for_dtype",
    "DTYPE_STR",
    "DTYPE_I64",
    "DTYPE_F64",
    "DTYPE_F32",
    "DTYPE_BIN",
]
