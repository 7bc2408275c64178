"""ALP-style lossless double compression (decimal-scaled integers).

Doubles that are "decimals in disguise" (metrics, prices, rounded scores —
the common case in analytics tables) are losslessly representable as
``round(v * 10^e)`` for a small exponent ``e``: encode the integers with the
existing FOR/bit-pack kernel and store the (rare) values that don't fit as
positional exceptions with their raw bits.  This is the core idea of the
published ALP scheme (Afroozeh & Boncz, "ALP: Adaptive Lossless
floating-Point compression", SIGMOD 2024) re-implemented from the paper's
idea in numpy — no reference to any existing implementation.

Correctness contract (bit-identical): at encode time every candidate is
verified by recomputing the exact decode expression ``enc / 10.0**e`` and
comparing *bitwise* against the input; any mismatch (including -0.0, NaN
payloads, infinities, |enc| beyond 2^51) becomes an exception carrying the
original 8 raw bytes.  Decode therefore reproduces the input exactly by
construction, and the block checksum re-verifies it.

Reference seam: fills the "doubles always ship plain" gap called out in
round-1 review; the reference stores f32/f64 ndarrays
(``bids2table/extensions/ndarray.py:19-74``) uncompressed.
"""

from __future__ import annotations

import numpy as np

from . import bitpack as bp
from .base import DTYPE_F64, pack_sections, split_sections

_MAX_EXP = 14  # 10^14 < 2^51: products stay exactly representable
_POW10 = 10.0 ** np.arange(_MAX_EXP + 1)
_INT_BOUND = float(1 << 51)

_SAMPLE = 1024


def _exact_mask(vals: np.ndarray, e: int) -> tuple[np.ndarray, np.ndarray]:
    """(is_exact, enc_ints) for exponent e — exactness is a bitwise check of
    the decode expression, so float rounding subtleties cannot leak through."""
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = vals * _POW10[e]
        enc = np.round(scaled)
        ok = np.isfinite(scaled) & (np.abs(enc) < _INT_BOUND)
        enc_i = np.where(ok, enc, 0.0).astype(np.int64)
        # decode divides (matches the round(x*10^e)/10^e idiom most decimal
        # data was produced with; multiplying by 10^-e drifts ULPs)
        dec = enc_i.astype(np.float64) / _POW10[e]
    exact = ok & (dec.view(np.int64) == vals.view(np.int64))
    return exact, enc_i


def choose_exponent(vals: np.ndarray) -> tuple[int, float]:
    """Pick the exponent with the best exact-hit rate on a sample (ties ->
    smaller e: smaller ints, narrower packs).  Returns (e, hit_rate)."""
    if len(vals) == 0:
        return 0, 1.0
    sample = vals[:: max(1, len(vals) // _SAMPLE)]
    best_e, best_hits = 0, -1.0
    for e in range(_MAX_EXP + 1):
        exact, _ = _exact_mask(sample, e)
        hits = float(exact.mean())
        if hits > best_hits + 1e-12:
            best_e, best_hits = e, hits
        if hits == 1.0:
            break
    return best_e, best_hits


class AlpCodec:
    name = "alp"
    dtypes = (DTYPE_F64,)

    def encode(self, values, dtype: str) -> tuple[dict, bytes]:
        vals = np.ascontiguousarray(values, dtype=np.float64)
        e, _ = choose_exponent(vals)
        exact, enc = _exact_mask(vals, e)
        exc_idx = np.flatnonzero(~exact)
        # exceptions: zero the int slot (keeps the FOR frame tight) and carry
        # the original raw 8 bytes positionally
        enc = np.where(exact, enc, 0)
        sections = [
            bp.encode_i64(enc),
            bp.encode_u64(exc_idx.astype(np.uint64)),
            vals[exc_idx].tobytes(),
        ]
        lens, payload = pack_sections(sections)
        return {"sections": lens, "e": int(e), "n_exc": int(len(exc_idx))}, payload

    def decode(self, meta: dict, payload: bytes, n: int, dtype: str):
        parts = split_sections(meta["sections"], payload)
        enc = bp.decode_i64(parts[0])
        out = enc.astype(np.float64) / _POW10[int(meta["e"])]
        if meta["n_exc"]:
            idx = bp.decode_u64(parts[1]).astype(np.int64)
            out[idx] = np.frombuffer(parts[2], dtype=np.float64, count=meta["n_exc"])
        return out
