"""Codec auto-selection: a cost model over sampled column statistics.

Two tiers (north rule: "per-partition cost-model auto-selector that samples
column statistics (NDV, run length, byte entropy)"):

* :func:`build_plan` — consumes the per-(pt, column) stats frame produced by
  :mod:`stats` (one Arrow-vectorized sampling pass over the table) and emits
  ``{"pt/column": codec}``, the plan shipped to every encode task.
* :func:`choose_codec_local` — fallback used inside the encode UDF for
  columns/partitions missing from the plan; same cost model computed on the
  block itself (data is already in memory there, so the estimates are exact).

Estimates are bytes-per-block approximations of each kernel's layout — they
only need to rank codecs correctly, not predict exact sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .codecs.base import strings_to_buf
from .codecs.bitpack import bit_width, gcd_deltas, zigzag


def _int_stats(vals: np.ndarray) -> dict:
    from .codecs.bitpack import patched_cost

    n = len(vals)
    if n == 0:
        return {"n": 0}
    vmin, vmax = int(vals.min()), int(vals.max())
    w_for = bit_width(vmax - vmin)  # python ints: exact for any int64 range
    # patch-aware: rare outliers (conversation-boundary deltas, stray ids)
    # become exceptions in the kernels, so the estimates must not let a
    # single wide value inflate the whole column's width
    # same rebase encode_i64 performs (wraparound-safe signed distance)
    for_pb = patched_cost(
        vals.view(np.uint64) - np.int64(vmin).view(np.uint64) if n else vals
    )
    if n > 1:
        dd, _ = gcd_deltas(vals)
        delta_pb = patched_cost(zigzag(dd))
        runs = int((vals[1:] != vals[:-1]).sum()) + 1
    else:
        delta_pb, runs = 0.0, 1
    ndv = len(np.unique(vals)) if n <= 65536 else min(n, len(np.unique(vals[:: max(1, n // 65536)])) * 4)
    return {"n": n, "w_for": w_for, "for_pb": for_pb, "delta_pb": delta_pb,
            "runs": runs, "ndv": ndv}


# --------------------------------------------------------------------------
# Shared cost models — BOTH selector tiers (the global build_plan over the
# stats frame and the per-block choose_codec_local) route through these, so
# the two tiers cannot drift: identical stats always yield identical codec
# choices (pinned by tests/test_selector.py::test_tiers_agree_on_same_stats).


def int_cost_model(
    n: int,
    w_for: int,
    runs: int,
    ndv: int,
    for_pbytes: float = 0.0,
    delta_pbytes: float = 0.0,
    w_delta: int = 0,
) -> dict[str, float]:
    """Estimated block bytes per int-family codec.  ``for_pbytes`` /
    ``delta_pbytes`` are patch-aware payload byte sums (codecs.bitpack
    .patched_cost); when absent (0) the global-width fallback applies."""
    w_runs = bit_width(n)
    ndv = max(int(ndv), 1)
    return {
        "plain": 8.0 * n,
        "forbp": (for_pbytes or w_for * n / 8) + 32,
        "delta": (delta_pbytes or w_delta * n / 8) + 48,
        "rle": runs * (w_for + w_runs) / 8 + 64,
        "dict": ndv * 8 + bit_width(ndv - 1) * n / 8 + 64,
    }


def str_cost_model(
    n: int, ndv: int, runs: int, total_bytes: float, fsst_ratio: float
) -> dict[str, float]:
    """Estimated block bytes per string/binary codec.  ``fsst_ratio`` is the
    expected compressed/original ratio (sampled trial or entropy-derived);
    dict/rle cascade their uniques blob through FSST, so their dictionary
    cost shrinks by the same ratio."""
    code_bits = bit_width(max(int(ndv) - 1, 0))
    uniq_bytes = total_bytes * ndv / n * min(1.0, fsst_ratio) + 8 * ndv
    return {
        "plain": total_bytes + 2.0 * n,
        "dict": uniq_bytes + code_bits * n / 8 + 64,
        "rle": uniq_bytes + runs * (code_bits + bit_width(n)) / 8 + 64,
        "fsst": total_bytes * fsst_ratio + 2.0 * n + 2048,
    }


def float_cost_model(n: int, w_alp: int, alp_hit: float, width: int) -> dict[str, float]:
    """plain vs ALP for float32/float64 (``width`` = 4 or 8 bytes/value)."""
    n_exc = (1.0 - alp_hit) * n
    return {
        "plain": float(width) * n,
        "alp": w_alp * n / 8 + n_exc * (width + 4) + 64,
    }


def entropy_fsst_ratio(entropy_bits: float) -> float:
    """FSST ratio estimate from byte entropy: near-random bytes (8 bits) ->
    ~1.0, low-entropy text (~4.2 bits) -> ~0.35; floor at 0.25."""
    return max(0.25, min(1.05, entropy_bits / 8.0 * 1.6 - 0.35))


def pick(est: dict[str, float]) -> str:
    """Deterministic argmin (ties break alphabetically)."""
    return min(est.items(), key=lambda kv: (kv[1], kv[0]))[0]


def estimate_int_sizes(vals: np.ndarray) -> dict[str, float]:
    s = _int_stats(np.ascontiguousarray(vals, dtype=np.int64))
    n = s["n"]
    if n == 0:
        return {"forbp": 0.0}
    return int_cost_model(
        n, s["w_for"], s["runs"], s["ndv"],
        for_pbytes=s["for_pb"], delta_pbytes=s["delta_pb"],
    )


def estimate_f64_sizes(vals: np.ndarray) -> dict[str, float]:
    """plain vs ALP for doubles: sample the exact-decimal hit rate and the
    FOR width of the scaled ints (see codecs/alp.py)."""
    from .codecs.alp import _exact_mask, choose_exponent

    n = len(vals)
    if n == 0:
        return {"plain": 0.0}
    e, hit = choose_exponent(vals)
    sample = vals[:: max(1, n // 1024)]
    _, enc = _exact_mask(sample, e)
    w = bit_width(int(enc.max()) - int(enc.min())) if len(enc) else 0
    return float_cost_model(n, w, hit, 8)


def estimate_f32_sizes(vals: np.ndarray) -> dict[str, float]:
    from .codecs.alp import _exact_mask_f32, choose_exponent_f32

    n = len(vals)
    if n == 0:
        return {"plain": 0.0}
    e, hit = choose_exponent_f32(vals)
    sample = vals[:: max(1, n // 1024)]
    _, enc = _exact_mask_f32(sample, e)
    w = bit_width(int(enc.max()) - int(enc.min())) if len(enc) else 0
    return float_cost_model(n, w, hit, 4)


def byte_entropy(buf: np.ndarray) -> float:
    """Shannon entropy (bits/byte) of a uint8 buffer."""
    if len(buf) == 0:
        return 0.0
    counts = np.bincount(buf, minlength=256)
    p = counts[counts > 0] / len(buf)
    return float(-(p * np.log2(p)).sum())


def estimate_str_sizes(series) -> dict[str, float]:
    import pyarrow as pa

    if isinstance(series, pa.ChunkedArray):
        series = series.combine_chunks()
    if isinstance(series, pa.Array):
        arr = series.drop_null() if series.null_count else series
        n = len(arr)
        if n == 0:
            return {"plain": 0.0}
    else:
        vals = series.dropna()
        n = len(vals)
        if n == 0:
            return {"plain": 0.0}
        arr = pa.Array.from_pandas(vals)
    big = (
        pa.large_binary()
        if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)
        else pa.large_string()
    )
    arr = arr.cast(big)
    d = arr.dictionary_encode()
    ndv = len(d.dictionary)
    codes = d.indices.to_numpy(zero_copy_only=False)
    runs = int((codes[1:] != codes[:-1]).sum()) + 1 if n > 1 else 1
    offsets, buf = strings_to_buf(arr)
    total = float(len(buf))
    ent = byte_entropy(np.frombuffer(buf[:65536], dtype=np.uint8))
    return str_cost_model(n, ndv, runs, total, entropy_fsst_ratio(ent))


def choose_codec_local(series, phys: str) -> str:
    """Cost-model pick for one block (exact stats, data already in memory).
    Accepts a pandas Series or a pyarrow Array.  For list<T> columns the
    choice is made on the flattened child values (the codec names the CHILD
    kernel; offsets are always delta-packed)."""
    import pyarrow as pa

    from .blocks import is_list_phys, list_child_phys

    if is_list_phys(phys):
        import pyarrow.compute as pc

        arr = series if isinstance(series, (pa.Array, pa.ChunkedArray)) else pa.Array.from_pandas(series)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = pc.list_flatten(arr.drop_null() if arr.null_count else arr)
        return choose_codec_local(flat, list_child_phys(phys))
    if phys in ("int", "long", "timestamp", "timestamp_ntz", "boolean", "date"):
        if isinstance(series, (pa.Array, pa.ChunkedArray)):
            from .blocks import _to_kernel_arrow

            vals, _ = _to_kernel_arrow(series, phys)
        elif phys in ("boolean", "date"):
            from .blocks import _to_kernel

            vals, _ = _to_kernel(series, phys)
        else:
            v = series.dropna()
            if phys.startswith("timestamp"):
                vals = pd.to_datetime(v).astype("datetime64[ns]").astype(np.int64).to_numpy()
            else:
                vals = v.to_numpy(dtype=np.int64, na_value=0) if v.dtype.kind == "f" else v.to_numpy().astype(np.int64)
        est = estimate_int_sizes(vals)
    elif phys in ("string", "binary"):
        est = estimate_str_sizes(series)
    elif phys == "double":
        if isinstance(series, (pa.Array, pa.ChunkedArray)):
            from .blocks import _to_kernel_arrow

            vals, _ = _to_kernel_arrow(series, phys)
        else:
            vals = series.dropna().to_numpy(dtype=np.float64)
        est = estimate_f64_sizes(vals)
    elif phys == "float":
        if isinstance(series, (pa.Array, pa.ChunkedArray)):
            from .blocks import _to_kernel_arrow

            vals, _ = _to_kernel_arrow(series, phys)
        else:
            vals = series.dropna().to_numpy(dtype=np.float32)
        est = estimate_f32_sizes(vals)
    else:
        return "plain"
    return pick(est)


def build_plan(stats_pdf: pd.DataFrame) -> dict[str, str]:
    """Global plan from the stats pass: {"pt/column": codec}.

    ``stats_pdf`` columns: pt, column, phys, n, ndv, runs, w_for, w_delta,
    total_bytes, entropy, fsst_sample_ratio (see stats.py).  A ``list<T>``
    phys selects for the flattened CHILD values (the plan codec names the
    child kernel; offsets are always delta-packed — blocks._encode_list_block).

    Routes through the SAME cost-model functions as choose_codec_local
    (int_cost_model / str_cost_model / float_cost_model), so the two tiers
    rank codecs identically given the same statistics.
    """
    from .blocks import is_list_phys, list_child_phys

    def _num(r, key) -> float:
        v = r.get(key)
        try:
            v = float(v)
        except (TypeError, ValueError):
            return 0.0
        return v if np.isfinite(v) else 0.0

    plan: dict[str, str] = {}
    for _, r in stats_pdf.iterrows():
        n = max(int(r["n"]), 1)
        phys = r["phys"]
        if is_list_phys(phys):
            phys = list_child_phys(phys)
        if phys in ("int", "long", "timestamp", "timestamp_ntz", "boolean", "date"):
            # patch-aware byte sums from the stats pass (stats._col_partial
            # via codecs.bitpack.patched_cost) keep the global plan's
            # FOR/delta ranking consistent with choose_codec_local on
            # outlier-bearing columns; NDV comes from the merged KMV sketch,
            # so low-NDV int columns (enum-like ids) can rank dict too
            est = int_cost_model(
                n, int(r["w_for"]), int(r["runs"]), int(r["ndv"]),
                for_pbytes=_num(r, "for_pbytes"),
                delta_pbytes=_num(r, "delta_pbytes"),
                w_delta=int(r["w_delta"]),
            )
        elif phys in ("string", "binary"):
            ratio = float(r.get("fsst_sample_ratio") or 0.0)
            if not ratio:
                ratio = entropy_fsst_ratio(float(r["entropy"]))
            est = str_cost_model(
                n, float(r["ndv"]), float(r["runs"]), float(r["total_bytes"]), ratio
            )
        elif phys == "double":
            est = float_cost_model(
                n, int(r.get("w_alp") or 64), _num(r, "alp_hit"), 8
            )
        elif phys == "float":
            est = float_cost_model(
                n, int(r.get("w_alp") or 32), _num(r, "alp_hit"), 4
            )
        else:
            est = {"plain": 0.0}
        plan[f"{r['pt']}/{r['column']}"] = pick(est)
    return plan
