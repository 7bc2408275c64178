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


def encode_u64(vals: np.ndarray, miniblock: int = MINIBLOCK) -> bytes:
    """Self-contained FOR+bitpack encoding of a uint64 array.

    Layout: ``[n:u64][mini:u32]`` then per miniblock ``[min:u64][width:u8]``
    headers, then the concatenated packed bitstreams.
    """
    vals = np.ascontiguousarray(vals, dtype=_U64)
    n = len(vals)
    out = [_HDR.pack(n, miniblock)]
    if n == 0:
        return b"".join(out)
    n_mini = (n + miniblock - 1) // miniblock
    mins = np.empty(n_mini, dtype=_U64)
    widths = np.empty(n_mini, dtype=np.uint8)
    bodies: list[bytes] = []
    for m in range(n_mini):
        chunk = vals[m * miniblock : (m + 1) * miniblock]
        lo = chunk.min()
        rel = chunk - lo  # uint64 wraparound-safe
        w = bit_width(int(rel.max()))
        mins[m] = lo
        widths[m] = w
        bodies.append(pack_bits(rel, w))
    out.append(mins.tobytes())
    out.append(widths.tobytes())
    out.extend(bodies)
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
    out = np.empty(n, dtype=_U64)
    for m in range(n_mini):
        cnt = min(miniblock, n - m * miniblock)
        w = int(widths[m])
        nbytes = (cnt * w + 7) // 8
        rel = unpack_bits(buf[off : off + nbytes], cnt, w)
        out[m * miniblock : m * miniblock + cnt] = rel + mins[m]
        off += nbytes
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
