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
from .base import DTYPE_F32, DTYPE_F64, pack_sections, split_sections

_MAX_EXP = 14  # 10^14 < 2^51: products stay exactly representable
_POW10 = 10.0 ** np.arange(_MAX_EXP + 1)
_INT_BOUND = float(1 << 51)
# f32: ints are exact only up to 2^24, and the mantissa carries ~7 decimal
# digits — exponents past 7 can't gain hits
_MAX_EXP_F32 = 7
_INT_BOUND_F32 = float(1 << 24)
_POW10_F32 = np.float32(10.0) ** np.arange(_MAX_EXP_F32 + 1, dtype=np.float32)

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


def _exact_mask_f32(vals: np.ndarray, e: int) -> tuple[np.ndarray, np.ndarray]:
    """f32 variant: rounding happens in f64 (wider intermediate = better hit
    rate), the bitwise verification replays the exact f32 decode division."""
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = vals.astype(np.float64) * _POW10[e]
        enc = np.round(scaled)
        ok = np.isfinite(scaled) & (np.abs(enc) < _INT_BOUND_F32)
        enc_i = np.where(ok, enc, 0.0).astype(np.int64)
        dec = enc_i.astype(np.float32) / _POW10_F32[e]
    exact = ok & (dec.view(np.int32) == vals.view(np.int32))
    return exact, enc_i


def choose_exponent(vals: np.ndarray) -> tuple[int, float]:
    """Pick the exponent with the best exact-hit rate on a sample (ties ->
    smaller e: smaller ints, narrower packs).  Returns (e, hit_rate)."""
    return _choose(vals, _exact_mask, _MAX_EXP)


def choose_exponent_f32(vals: np.ndarray) -> tuple[int, float]:
    return _choose(vals, _exact_mask_f32, _MAX_EXP_F32)


def _choose(vals, mask_fn, max_exp) -> tuple[int, float]:
    if len(vals) == 0:
        return 0, 1.0
    sample = vals[:: max(1, len(vals) // _SAMPLE)]
    best_e, best_hits = 0, -1.0
    for e in range(max_exp + 1):
        exact, _ = mask_fn(sample, e)
        hits = float(exact.mean())
        if hits > best_hits + 1e-12:
            best_e, best_hits = e, hits
        if hits == 1.0:
            break
    return best_e, best_hits


class AlpCodec:
    name = "alp"
    dtypes = (DTYPE_F64, DTYPE_F32)

    def encode(self, values, dtype: str) -> tuple[dict, bytes]:
        if dtype == DTYPE_F32:
            vals = np.ascontiguousarray(values, dtype=np.float32)
            e, _ = choose_exponent_f32(vals)
            exact, enc = _exact_mask_f32(vals, e)
        else:
            vals = np.ascontiguousarray(values, dtype=np.float64)
            e, _ = choose_exponent(vals)
            exact, enc = _exact_mask(vals, e)
        exc_idx = np.flatnonzero(~exact)
        # exceptions: fill the int slot with an IN-RANGE value (the first
        # exact encoding) and carry the original raw bytes (8 for f64, 4
        # for f32) positionally — zero-filling dragged the FOR frame min to
        # 0 and a single NaN widened every inlier in its miniblock ~3x
        fill = enc[exact][0] if exact.any() else 0
        enc = np.where(exact, enc, fill)
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
        if dtype == DTYPE_F32:
            out = enc.astype(np.float32) / _POW10_F32[int(meta["e"])]
            exc_dt = np.float32
        else:
            out = enc.astype(np.float64) / _POW10[int(meta["e"])]
            exc_dt = np.float64
        if meta["n_exc"]:
            idx = bp.decode_u64(parts[1]).astype(np.int64)
            out[idx] = np.frombuffer(parts[2], dtype=exc_dt, count=meta["n_exc"])
        return out
