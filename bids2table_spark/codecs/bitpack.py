"""Vectorized frame-of-reference + bit-packing primitive.

The reusable integer-compression kernel shared by the ``forbp``, ``delta``,
``dict`` and ``rle`` codecs.  Values are split into fixed-size miniblocks
(default 4096); each miniblock stores its own frame (minimum) and bit width,
so a single outlier only widens one miniblock (the scheme Parquet's
DELTA_BINARY_PACKED uses).  All packing is numpy-vectorized via
``np.packbits`` / ``np.unpackbits`` — no per-value Python.

Structural seam in the reference: the opaque pack/unpack pair of
``bids2table/extensions/ndarray.py:50-74`` (encode-on-write, bit-identical
decode-on-read); the kernel itself is new.
"""

from __future__ import annotations

import struct

import numpy as np

MINIBLOCK = 4096

_U64 = np.uint64
_HDR = struct.Struct("<QI")  # n_values, miniblock_size


def bit_width(max_val: int) -> int:
    """Number of bits needed to represent ``max_val`` (0 -> 0 bits)."""
    return int(max_val).bit_length()


def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack ``vals`` (uint64, each < 2**width) into a dense bitstream."""
    if width == 0 or len(vals) == 0:
        return b""
    shifts = np.arange(width - 1, -1, -1, dtype=_U64)
    bits = ((vals[:, None] >> shifts) & _U64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def unpack_bits(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=_U64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(_U64)
    shifts = np.arange(width - 1, -1, -1, dtype=_U64)
    return (bits << shifts).sum(axis=1, dtype=_U64)


_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)


def widths_of(vals: np.ndarray) -> np.ndarray:
    """Exact bit_length per uint64 value (vectorized, no float log)."""
    return np.searchsorted(_POW2, vals, side="right").astype(np.int64)


def best_width(rel: np.ndarray) -> tuple[int, np.ndarray]:
    """Patched-FOR width choice for one miniblock: pick the packing width w
    minimizing ``count*w/8 + n_exceptions*(2+8)`` bytes; values needing more
    than w bits become (pos:u16, val:u64) exceptions.  Returns (w, exc_idx).
    """
    bw = widths_of(rel)
    counts = np.bincount(bw, minlength=65)
    above = counts[::-1].cumsum()[::-1]  # above[w] = #values with bw > w-1? see below
    # n_exc(w) = #values with bw > w  = sum counts[w+1:]
    n = len(rel)
    best_w, best_cost = 64, float("inf")
    max_w = int(bw.max()) if n else 0
    for w in range(max_w + 1):
        n_exc = int(above[w + 1]) if w + 1 <= 64 else 0
        cost = n * w / 8 + n_exc * 10
        if cost < best_cost:
            best_w, best_cost = w, cost
    exc = np.flatnonzero(bw > best_w)
    return best_w, exc


def encode_u64(vals: np.ndarray, miniblock: int = MINIBLOCK) -> bytes:
    """Self-contained patched-FOR + bitpack encoding of a uint64 array.

    Layout: ``[n:u64][mini:u32]`` then per miniblock
    ``[min:u64][width:u8][n_exc:u16]`` headers, then the packed bitstreams,
    then exception positions (u16) and raw exception values (u64).
    A handful of outliers (e.g. conversation-boundary deltas) no longer
    widen the whole miniblock — the PFoR idea (Zukowski et al., ICDE 2006).
    """
    vals = np.ascontiguousarray(vals, dtype=_U64)
    n = len(vals)
    if not 1 <= miniblock <= 65535:
        # exception positions/counts are uint16 — a larger miniblock would
        # wrap positions modulo 65536 and silently corrupt the payload
        raise ValueError(f"miniblock must be in [1, 65535], got {miniblock}")
    out = [_HDR.pack(n, miniblock)]
    if n == 0:
        return b"".join(out)
    n_mini = (n + miniblock - 1) // miniblock
    mins = np.empty(n_mini, dtype=_U64)
    widths = np.empty(n_mini, dtype=np.uint8)
    n_excs = np.empty(n_mini, dtype=np.uint16)
    bodies: list[bytes] = []
    exc_pos: list[np.ndarray] = []
    exc_val: list[np.ndarray] = []
    for m in range(n_mini):
        chunk = vals[m * miniblock : (m + 1) * miniblock]
        lo = chunk.min()
        rel = chunk - lo  # uint64 wraparound-safe
        w, exc = best_width(rel)
        mins[m] = lo
        widths[m] = w
        n_excs[m] = len(exc)
        if len(exc):
            exc_pos.append(exc.astype(np.uint16))
            exc_val.append(rel[exc])  # fancy index: already a copy
            rel[exc] = 0  # rel is this iteration's fresh `chunk - lo` temp
        bodies.append(pack_bits(rel, w))
    out.append(mins.tobytes())
    out.append(widths.tobytes())
    out.append(n_excs.tobytes())
    out.extend(bodies)
    if exc_pos:
        out.append(np.concatenate(exc_pos).tobytes())
        out.append(np.concatenate(exc_val).tobytes())
    return b"".join(out)


def decode_u64(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_u64`."""
    n, miniblock = _HDR.unpack_from(buf, 0)
    if n == 0:
        return np.empty(0, dtype=_U64)
    n_mini = (n + miniblock - 1) // miniblock
    off = _HDR.size
    mins = np.frombuffer(buf, dtype=_U64, count=n_mini, offset=off)
    off += 8 * n_mini
    widths = np.frombuffer(buf, dtype=np.uint8, count=n_mini, offset=off)
    off += n_mini
    n_excs = np.frombuffer(buf, dtype=np.uint16, count=n_mini, offset=off)
    off += 2 * n_mini
    out = np.empty(n, dtype=_U64)
    for m in range(n_mini):
        cnt = min(miniblock, n - m * miniblock)
        w = int(widths[m])
        nbytes = (cnt * w + 7) // 8
        rel = unpack_bits(buf[off : off + nbytes], cnt, w)
        out[m * miniblock : m * miniblock + cnt] = rel + mins[m]
        off += nbytes
    total_exc = int(n_excs.sum())
    if total_exc:
        pos = np.frombuffer(buf, dtype=np.uint16, count=total_exc, offset=off)
        off += 2 * total_exc
        vals_e = np.frombuffer(buf, dtype=_U64, count=total_exc, offset=off)
        starts = np.concatenate(([0], np.cumsum(n_excs.astype(np.int64))))
        for m in range(n_mini):
            s, e = starts[m], starts[m + 1]
            if e > s:
                idx = m * miniblock + pos[s:e].astype(np.int64)
                out[idx] = vals_e[s:e] + mins[m]
    return out


def zigzag(vals: np.ndarray) -> np.ndarray:
    """Map int64 -> uint64 so small-magnitude values stay small."""
    v = np.ascontiguousarray(vals, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).view(_U64)


def unzigzag(vals: np.ndarray) -> np.ndarray:
    """Inverse of :func:`zigzag`."""
    u = np.ascontiguousarray(vals, dtype=_U64)
    return ((u >> _U64(1)).astype(np.int64)) ^ -((u & _U64(1)).astype(np.int64))


def encode_i64(vals: np.ndarray, miniblock: int = MINIBLOCK) -> bytes:
    """FOR+bitpack for signed int64: rebase on the signed minimum first
    (two's-complement wraparound subtraction), so mixed-sign arrays still
    frame tightly, then reuse the unsigned kernel."""
    v = np.ascontiguousarray(vals, dtype=np.int64)
    bias = np.int64(v.min()) if len(v) else np.int64(0)
    rel = v.view(_U64) - bias.view(_U64)  # wraparound-safe signed distance
    return struct.pack("<q", int(bias)) + encode_u64(rel, miniblock)


def decode_i64(buf: bytes) -> np.ndarray:
    (bias,) = struct.unpack_from("<q", buf, 0)
    rel = decode_u64(buf[8:])
    return (rel + np.int64(bias).view(_U64)).view(np.int64)


def patched_cost(vals: np.ndarray, miniblock: int = MINIBLOCK) -> float:
    """Estimated payload bytes of :func:`encode_u64` for ``vals`` — the
    per-miniblock optimal patched width + exception cost + headers.  Used
    by the codec cost model so FOR/delta estimates account for patching
    (a global-max-width estimate makes a column with rare outlier deltas —
    e.g. conversation-boundary turn_idx resets — look far bigger than the
    patched kernel actually produces)."""
    vals = np.ascontiguousarray(vals, dtype=_U64)
    n = len(vals)
    total = 0.0
    for m in range(0, n, miniblock):
        chunk = vals[m : m + miniblock]
        w, exc = best_width(chunk - chunk.min())
        total += len(chunk) * w / 8 + len(exc) * 10 + 11
    return total


def gcd_deltas(vals: np.ndarray) -> tuple[np.ndarray, int]:
    """Wraparound-safe consecutive diffs with their GCD extracted.

    THE shared definition for the delta codec (codecs/delta.py), the local
    selector (selector.py) and the distributed stats pass (stats.py): the
    size estimates drive codec selection, so estimate and encoding must
    use identical diff/GCD semantics or selection silently skews.
    Returns ``(reduced_deltas, g)`` with ``g >= 1``."""
    d = (vals[1:].view(np.uint64) - vals[:-1].view(np.uint64)).view(np.int64)
    g = 1
    if len(d) and not (d == np.iinfo(np.int64).min).any():
        g = int(np.gcd.reduce(np.abs(d), initial=0))
        g = g if g > 1 else 1
    return (d // g if g > 1 else d), g
