"""FSST symbol-table string compression, from scratch and numpy-vectorized.

Implements the published FSST scheme (Boncz, Neumann, Leis — "FSST: Fast
Random Access String Compression", PVLDB 13(9), 2020): a table of up to 255
symbols, each 1-8 bytes, code 255 = escape (the next stream byte is a
literal).  Compression replaces non-overlapping symbol occurrences with
1-byte codes; uncovered bytes are escaped (2 bytes) unless a 1-byte symbol
exists for them.

Differences from the C++ reference implementation (public paper, no code
reused): symbol-table construction is a one-shot frequency/gain ranking over
a bounded sample rather than 5 refinement iterations, and match selection is
a *vectorized* greedy cover — longest symbols first, with approximate greedy
overlap resolution inside each length class via a block-thin + parity trick —
instead of a sequential longest-match scan.  Both choices only affect the
achieved ratio (slightly), never correctness: decode is pure table
substitution and round-trips bit-identically.

All hot paths are numpy array ops; there is no per-byte or per-string Python.
"""

from __future__ import annotations

import numpy as np

from . import bitpack as bp
from .base import DTYPE_BIN, DTYPE_STR, buf_to_strings, pack_sections, split_sections, strings_to_buf

ESCAPE = 255
MAX_SYMBOLS = 255  # codes 0..254
MAX_LEN = 8
SAMPLE_BYTES = 1 << 17


def _windows_u64(buf: np.ndarray, L: int) -> np.ndarray:
    """Exact uint64 keys of all length-L windows (big-endian byte pack)."""
    n = len(buf)
    if n < L:
        return np.empty(0, dtype=np.uint64)
    w = np.zeros(n - L + 1, dtype=np.uint64)
    for i in range(L):  # L <= 8: constant-bound loop
        w |= buf[i : n - L + 1 + i].astype(np.uint64) << np.uint64(8 * i)
    return w


def build_table(buf: np.ndarray, max_symbols: int = MAX_SYMBOLS, iters: int = 6) -> list[bytes]:
    """Construct the symbol table: one-shot gain ranking over a sample, then
    ``iters-1`` refinement passes (the paper's iterative construction):
    compress the sample with the current table, measure *realized* per-code
    gains (raw counts overestimate via overlaps), drop dead symbols and
    refill from the runner-up candidates.  Deterministic throughout."""
    sample = buf[:SAMPLE_BYTES]
    symbols = _rank_candidates(sample, cap=max_symbols)
    if len(sample) < 1024 or not symbols:
        return symbols
    best_symbols, best_size = symbols, None
    stale = 0  # refinement usually converges in 2-3 iterations; stop after
    # two consecutive non-improving trials (best table is kept regardless)
    for _ in range(max(0, iters - 1)):
        table = _Table(symbols)
        stream = compress(sample, table)
        if best_size is None or len(stream) < best_size:
            best_symbols, best_size = symbols, len(stream)
            stale = 0
        else:
            stale += 1
            if stale >= 2:
                return best_symbols
        tok, is_lit = _parse_stream(stream)
        toks = stream[tok]
        # realized gain per existing symbol: code frequency x bytes saved
        code_tok = toks[~is_lit]
        counts = np.bincount(code_tok, minlength=256)[: len(symbols)]
        cand: dict[bytes, int] = {}
        for i, s in enumerate(symbols):
            save = (len(s) - 1) if len(s) > 1 else 1
            g = int(counts[i]) * save
            if g > 0:
                cand[s] = max(cand.get(s, 0), g)
        # grow candidates by merging adjacent symbol pairs (the paper's
        # concatenation step): one code instead of two saves 1 byte/occurrence,
        # and longer symbols unlock further merges next iteration
        if len(code_tok) > 1:
            adj = np.flatnonzero(np.diff(np.flatnonzero(~is_lit)) == 1)
            a = code_tok[adj]
            b = code_tok[adj + 1]
            pair_keys = a.astype(np.int64) * 256 + b
            uniq, pcount = np.unique(pair_keys, return_counts=True)
            top = np.argsort(-pcount)[:max_symbols]
            for key, cnt in zip(uniq[top].tolist(), pcount[top].tolist()):
                if cnt < 3:
                    continue
                merged = symbols[key // 256] + symbols[key % 256]
                if len(merged) <= MAX_LEN:
                    g = cnt * (len(merged) - 1)
                    cand[merged] = max(cand.get(merged, 0), g)
        # escaped literals -> 1-byte symbol candidates (escape costs 2 bytes)
        lit_vals = toks[is_lit]
        if len(lit_vals):
            lcounts = np.bincount(lit_vals, minlength=256)
            for v in np.flatnonzero(lcounts > 2).tolist():
                s1 = bytes([v])
                cand[s1] = max(cand.get(s1, 0), int(lcounts[v]))
        # deterministic re-rank: gain desc, then (len, bytes)
        symbols = [
            s for s, _ in sorted(cand.items(), key=lambda kv: (-kv[1], len(kv[0]), kv[0]))
        ][:max_symbols]
        if not symbols:
            break
    if symbols:
        table = _Table(symbols)
        stream = compress(sample, table)
        if best_size is None or len(stream) < best_size:
            best_symbols = symbols
    return best_symbols


def _rank_candidates(sample: np.ndarray, cap: int) -> list[bytes]:
    """One-shot gain ranking of substrings (the iteration-0 table);
    returns up to ``cap`` ranked symbols (the extras feed refinement)."""
    per_len_cap = cap
    gains, lens_, keys_ = [], [], []
    for L in range(1, MAX_LEN + 1):
        keys = _windows_u64(sample, L)
        if len(keys) == 0:
            continue
        uniq, counts = np.unique(keys, return_counts=True)
        # gain: replacing a length-L occurrence with a 1-byte code; for L=1
        # the gain is vs the 2-byte escape.  Multi-byte symbols need >=2 hits.
        if L == 1:
            gain, keep = counts, counts > 0
        else:
            gain, keep = counts * (L - 1), counts >= 2
        uniq, gain = uniq[keep], gain[keep]
        if len(uniq) > per_len_cap:  # keep ranking input bounded
            top = np.argsort(gain)[-per_len_cap:]
            uniq, gain = uniq[top], gain[top]
        gains.append(gain.astype(np.int64))
        lens_.append(np.full(len(uniq), L, dtype=np.int64))
        keys_.append(uniq)
    if not gains:
        return []
    gain = np.concatenate(gains)
    length = np.concatenate(lens_)
    key = np.concatenate(keys_)
    # Highest gain first; deterministic tie-break on (length, key).
    order = np.lexsort((key, length, -gain))[:cap]
    return [
        int(k).to_bytes(int(ln), "little")
        for k, ln in zip(key[order].tolist(), length[order].tolist())
    ]


def _keep_greedy_idx(
    cand: np.ndarray, payload: np.ndarray, L: int
) -> tuple[np.ndarray, np.ndarray]:
    """:func:`_keep_greedy` variant that filters a parallel payload array."""
    if len(cand) == 0:
        return cand, payload
    blocks = cand // L
    first = np.empty(len(cand), dtype=bool)
    first[0] = True
    np.not_equal(blocks[1:], blocks[:-1], out=first[1:])
    q, p = cand[first], payload[first]
    conflict = np.empty(len(q), dtype=bool)
    conflict[0] = False
    np.less(q[1:] - q[:-1], L, out=conflict[1:])
    starts = ~conflict
    start_idx = np.flatnonzero(starts)
    firsts = np.repeat(start_idx, np.diff(np.append(start_idx, len(q))))
    keep = ((np.arange(len(q)) - firsts) % 2) == 0
    return q[keep], p[keep]


class _Table:
    """Prepared lookup structures for one symbol table."""

    def __init__(self, symbols: list[bytes]):
        self.symbols = symbols
        # full 256-wide tables: np.where evaluates sym_len[codes] for literal
        # tokens too, whose byte values can exceed the symbol count
        self.sym_len = np.zeros(256, dtype=np.int64)
        self.sym_len[: len(symbols)] = [len(s) for s in symbols]
        mat = np.zeros((MAX_SYMBOLS + 1, MAX_LEN), dtype=np.uint8)
        for i, s in enumerate(symbols):
            mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        self.sym_bytes = mat
        # contiguous per-byte-index columns: decompress gathers sym_cols[k]
        # with a 1-D index instead of 2-D fancy indexing into strided rows
        self.sym_cols = np.ascontiguousarray(mat.T)
        self.by_len: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        # one combined 2-byte-prefix bitmask for ALL multi-byte classes:
        # bit (L-2) set => some length-L symbol starts with that u16 prefix.
        # compress gathers it ONCE per buffer instead of once per class.
        self.pref_bits = np.zeros(65536, dtype=np.uint8)
        for L in range(1, MAX_LEN + 1):
            idx = [i for i, s in enumerate(symbols) if len(s) == L]
            if not idx:
                continue
            keys = np.array(
                [int.from_bytes(symbols[i], "little") for i in idx], dtype=np.uint64
            )
            order = np.argsort(keys)
            # 2-byte-prefix candidate filter (1-byte for L==1)
            pref = np.zeros(65536 if L >= 2 else 256, dtype=bool)
            for i in idx:
                s = symbols[i]
                pref[int.from_bytes(s[: min(2, L)], "little")] = True
            if L >= 2:
                self.pref_bits[np.flatnonzero(pref)] |= np.uint8(1 << (L - 2))
            self.by_len[L] = (keys[order], np.array(idx, dtype=np.int64)[order], pref)


def compress(buf: np.ndarray, table: _Table) -> np.ndarray:
    """Compress a uint8 buffer into an FSST byte stream (uint8 array)."""
    n = len(buf)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    start = np.zeros(n, dtype=bool)
    code_at = np.zeros(n, dtype=np.uint8)
    # committed bytes tracked as a 0/1 indicator; the overlap test for a
    # length-L candidate at p is "any committed byte in [p, p+L)", answered
    # by a prefix-count array P (ONE O(n) int32 cumsum per class — cheaper
    # and cache-friendlier than the per-committed-class searchsorted loop
    # this replaces, and the check runs BEFORE the symbol-key searchsorted so
    # later classes binary-search far fewer candidates)
    taken_u8 = np.zeros(n, dtype=np.uint8)
    any_committed = False
    multi = [L for L in range(MAX_LEN, 1, -1) if L in table.by_len]
    if multi:
        # Little-endian 8-byte window keys as a byte-strided uint64 view over
        # a zero-padded copy: K[i] & ((1<<8L)-1) is the length-L key at i.
        # One gather per length class instead of L; LE layout matches the
        # table keys (x86/arm are little-endian).
        pad = np.zeros(((n + 15) // 8) * 8, dtype=np.uint8)
        pad[:n] = buf
        K = np.lib.stride_tricks.as_strided(
            pad.view(np.uint64), shape=(n,), strides=(1,)
        )
        u16 = (
            (buf[:-1].astype(np.uint16) | (buf[1:].astype(np.uint16) << 8))
            if n >= 2
            else np.empty(0, np.uint16)
        )
        # ONE prefix-table gather for all classes; per class it degrades to a
        # cheap sequential bit-test (uint8 AND) instead of a random gather
        pbits = table.pref_bits[u16] if n >= 2 else np.empty(0, np.uint8)
    for L in multi:
        keys, codes, pref = table.by_len[L]
        if n < L:
            continue
        pos = np.flatnonzero(pbits[: n - L + 1] & np.uint8(1 << (L - 2)))
        if len(pos) == 0:
            continue
        if any_committed:
            if len(pos) * L < n:
                # sparse candidates: L gathers over len(pos) beat an O(n)
                # cumsum (same filter — "any committed byte in [p, p+L)")
                ov = taken_u8[pos]
                for k in range(1, L):
                    ov = ov | taken_u8[pos + k]
                pos = pos[ov == 0]
            else:
                # P[i] = committed bytes strictly before i
                P = np.empty(n + 1, dtype=np.int32)
                P[0] = 0
                np.cumsum(taken_u8, out=P[1:])
                pos = pos[P[pos + L] == P[pos]]
            if len(pos) == 0:
                continue
        mask = np.uint64((1 << (8 * L)) - 1) if L < 8 else np.uint64(0xFFFFFFFFFFFFFFFF)
        w = K[pos] & mask
        si = np.searchsorted(keys, w)
        si_c = np.minimum(si, len(keys) - 1)
        ok = keys[si_c] == w
        pos, si_c = pos[ok], si_c[ok]
        if len(pos) == 0:
            continue
        pos, si_c = _keep_greedy_idx(pos, si_c, L)
        start[pos] = True
        code_at[pos] = codes[si_c].astype(np.uint8)
        for k in range(L):  # L <= 8 scattered-write passes, intervals disjoint
            taken_u8[pos + k] = 1
        any_committed = True
    taken = taken_u8.astype(bool)
    # 1-byte symbols on remaining free bytes
    if 1 in table.by_len:
        keys, codes, pref = table.by_len[1]
        free_pos = np.flatnonzero(~taken)
        if len(free_pos):
            hit = pref[buf[free_pos]]
            cand = free_pos[hit]
            vals = buf[cand].astype(np.uint64)
            si = np.searchsorted(keys, vals)
            si_c = np.minimum(si, len(keys) - 1)
            ok = keys[si_c] == vals
            sel = cand[ok]
            taken[sel] = True
            start[sel] = True
            code_at[sel] = codes[si_c[ok]].astype(np.uint8)
    # emit: committed starts -> 1 code byte; free bytes -> escape + literal
    tok = np.flatnonzero(start | ~taken)
    is_sym = start[tok]
    lens = np.where(is_sym, 1, 2)
    offs = np.zeros(len(tok) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    out = np.empty(offs[-1], dtype=np.uint8)
    sym_off = offs[:-1][is_sym]
    out[sym_off] = code_at[tok[is_sym]]
    lit_off = offs[:-1][~is_sym]
    out[lit_off] = ESCAPE
    out[lit_off + 1] = buf[tok[~is_sym]]
    return out


def _parse_stream(s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Token positions and literal-mask of an FSST stream, vectorized.

    Inside each maximal run of consecutive 0xFF bytes the escape markers
    alternate starting with the first (a literal can itself be 0xFF); an
    odd-length run additionally consumes the byte after the run as its final
    literal.  Returns (token_positions, is_literal) in stream order.
    """
    n = len(s)
    is_ff = s == ESCAPE
    lit_mask = np.zeros(n, dtype=bool)  # stream positions holding literal bytes
    marker = np.zeros(n, dtype=bool)
    if is_ff.any():
        d = np.diff(is_ff.astype(np.int8))
        run_starts = np.flatnonzero(d == 1) + 1
        if is_ff[0]:
            run_starts = np.concatenate(([0], run_starts))
        run_ends = np.flatnonzero(d == -1) + 1  # exclusive
        if is_ff[-1]:
            run_ends = np.concatenate((run_ends, [n]))
        run_lens = run_ends - run_starts
        # within-run offsets: even -> marker, odd -> literal
        total = int(run_lens.sum())
        rs_rep = np.repeat(run_starts, run_lens)
        offsets = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(run_lens)[:-1])), run_lens
        )
        pos = rs_rep + offsets
        marker[pos[offsets % 2 == 0]] = True
        lit_mask[pos[offsets % 2 == 1]] = True
        # odd-length run: the byte after the run is the final literal
        odd = run_lens % 2 == 1
        after = run_ends[odd]
        after = after[after < n]
        lit_mask[after] = True
    code_mask = ~marker & ~lit_mask
    tok = np.flatnonzero(code_mask | lit_mask)
    return tok, lit_mask[tok]


def decompress(stream: np.ndarray, table: _Table, out_len: int) -> np.ndarray:
    """Inverse of :func:`compress` — pure table substitution, vectorized.

    Escape parsing: inside each maximal run of consecutive 0xFF bytes the
    escape markers alternate starting with the first (a literal can itself be
    0xFF); an odd-length run additionally consumes the byte after the run as
    its final literal.
    """
    s = np.ascontiguousarray(stream, dtype=np.uint8)
    if len(s) == 0:
        return np.empty(0, dtype=np.uint8)
    tok, is_lit = _parse_stream(s)
    codes = s[tok]
    out_lens = np.where(is_lit, 1, table.sym_len[codes])
    offs = np.zeros(len(tok) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=offs[1:])
    out = np.empty(offs[-1], dtype=np.uint8)
    lit_off = offs[:-1][is_lit]
    out[lit_off] = codes[is_lit]
    sym_tok = ~is_lit
    sym_codes = codes[sym_tok]
    sym_off = offs[:-1][sym_tok]
    # sort tokens by symbol length DESC once: the tokens still live at byte
    # index k then form a PREFIX of the sorted arrays, so each of the <=8
    # scatter passes is a cheap slice — no per-pass length gather or boolean
    # mask materialization (scatter targets stay disjoint, order irrelevant)
    slens = table.sym_len[sym_codes]
    order = np.argsort(-slens, kind="stable")
    sc = sym_codes[order]
    so = sym_off[order]
    counts = np.bincount(slens, minlength=MAX_LEN + 1)
    n_ge = np.cumsum(counts[::-1])[::-1]  # n_ge[i] = #tokens with len >= i
    for k in range(MAX_LEN):  # constant-bound loop over symbol byte index
        end = int(n_ge[k + 1])
        if end == 0:
            break
        out[so[:end] + k] = table.sym_cols[k][sc[:end]]
    if len(out) != out_len:
        raise ValueError(f"fsst decode length mismatch: {len(out)} != {out_len}")
    return out


def encode_bytes(raw: bytes) -> tuple[dict, list[bytes]]:
    """Compress one byte buffer; returns (meta, [symlens, symblob, stream]).
    Reused by the dict/rle codecs to cascade-compress dictionary payloads."""
    buf = np.frombuffer(raw, dtype=np.uint8)
    symbols = build_table(buf)
    table = _Table(symbols)
    stream = compress(buf, table)
    sym_lens = np.array([len(s) for s in symbols], dtype=np.int64)
    meta = {"n_symbols": len(symbols), "raw_bytes": int(len(buf))}
    return meta, [bp.encode_i64(sym_lens), b"".join(symbols), stream.tobytes()]


def decode_bytes(meta: dict, sections: list[bytes]) -> bytes:
    symlen_b, sym_blob, stream_b = sections
    sym_lens = bp.decode_i64(symlen_b)
    symbols = []
    o = 0
    for ln in sym_lens.tolist():  # <=255 iterations
        symbols.append(sym_blob[o : o + ln])
        o += ln
    table = _Table(symbols)
    buf = decompress(
        np.frombuffer(stream_b, dtype=np.uint8), table, int(meta["raw_bytes"])
    )
    return buf.tobytes()


class FsstCodec:
    name = "fsst"
    dtypes = (DTYPE_STR, DTYPE_BIN)

    def encode(self, values, dtype: str) -> tuple[dict, bytes]:
        offsets, raw = strings_to_buf(values)
        fmeta, fsections = encode_bytes(raw)
        lens, payload = pack_sections([bp.encode_i64(offsets)] + fsections)
        return {"sections": lens, **fmeta}, payload

    def decode(self, meta: dict, payload: bytes, n: int, dtype: str):
        off_b, *fsections = split_sections(meta["sections"], payload)
        offsets = bp.decode_i64(off_b)
        return buf_to_strings(
            offsets, decode_bytes(meta, fsections), binary=dtype == DTYPE_BIN
        )
