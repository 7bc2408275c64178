"""Column-statistics sampling pass feeding the codec selector.

One Arrow-vectorized ``applyInPandas`` over a sample of each (pt) partition
computes, per (pt, column): row count, NDV, run count (under the canonical
(conv_id, turn_idx) sort), FOR/delta bit widths, total string bytes, byte
entropy, and an *actual* FSST compression ratio on a bounded sample — the
inputs the north rule names (NDV, run length, byte entropy).

Everything that Spark built-ins can compute stays JVM-side in callers
(row counts for the salt plan use ``groupBy().count()``); this pass exists
for the stats built-ins can't express (runs under sort, entropy, sample
compression), and it reads only a sampled fraction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .blocks import spark_field_phys
from .codecs.base import strings_to_buf
from .codecs.bitpack import bit_width, zigzag
from .codecs import fsst as fsst_mod
from .selector import byte_entropy

STATS_DDL = (
    "pt string, column string, phys string, n long, ndv long, runs long, "
    "w_for int, w_delta int, total_bytes long, entropy double, "
    "fsst_sample_ratio double, alp_hit double, w_alp int"
)

_FSST_SAMPLE_BYTES = 1 << 17


def _col_stats(pt: str, name: str, phys: str, series: pd.Series) -> dict:
    out = {
        "pt": pt, "column": name, "phys": phys, "n": len(series),
        "ndv": 0, "runs": 0, "w_for": 0, "w_delta": 0,
        "total_bytes": 0, "entropy": 0.0, "fsst_sample_ratio": 0.0,
        "alp_hit": 0.0, "w_alp": 0,
    }
    valid = series.dropna()
    if len(valid) == 0:
        return out
    if phys in ("int", "long", "timestamp", "timestamp_ntz", "boolean", "date"):
        from .blocks import _to_kernel

        vals, _ = _to_kernel(valid, phys)
        vals = np.asarray(vals, dtype=np.int64)
        out["ndv"] = int(pd.unique(vals).size)
        out["w_for"] = bit_width(int(vals.max()) - int(vals.min()))
        if len(vals) > 1:
            d = (vals[1:].view(np.uint64) - vals[:-1].view(np.uint64)).view(np.int64)
            g = 0
            if not (d == np.iinfo(np.int64).min).any():
                g = int(np.gcd.reduce(np.abs(d), initial=0))
            dd = d // g if g > 1 else d
            out["w_delta"] = bit_width(int(zigzag(dd).max()))
            out["runs"] = int((vals[1:] != vals[:-1]).sum()) + 1
        else:
            out["runs"] = 1
        out["total_bytes"] = 8 * len(vals)
    elif phys in ("string", "binary"):
        import pyarrow as pa

        arr = pa.Array.from_pandas(valid)
        big = (
            pa.large_binary()
            if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)
            else pa.large_string()
        )
        arr = arr.cast(big)
        d = arr.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False)
        out["ndv"] = len(d.dictionary)
        out["runs"] = int((codes[1:] != codes[:-1]).sum()) + 1 if len(codes) > 1 else 1
        offsets, buf = strings_to_buf(arr)
        out["total_bytes"] = int(len(buf))
        sample = np.frombuffer(buf[:_FSST_SAMPLE_BYTES], dtype=np.uint8)
        out["entropy"] = byte_entropy(sample)
        if len(sample) >= 1024:
            table = fsst_mod._Table(fsst_mod.build_table(sample))
            stream = fsst_mod.compress(sample, table)
            out["fsst_sample_ratio"] = float(len(stream) + 8 * len(table.symbols)) / len(sample)
    else:  # double / float
        out["ndv"] = int(pd.unique(valid).size)
        out["total_bytes"] = 8 * len(valid)
        if phys == "double":
            from .codecs.alp import _exact_mask, choose_exponent

            vals = valid.to_numpy(dtype=np.float64)
            e, hit = choose_exponent(vals)
            _, enc = _exact_mask(vals[:: max(1, len(vals) // 4096)], e)
            out["alp_hit"] = float(hit)
            if len(enc):
                out["w_alp"] = bit_width(int(enc.max()) - int(enc.min()))
    return out


# phys tags the sampling pass understands; list<T> columns are skipped here
# and fall back to the per-block local choice inside the encode UDF
_STATS_PHYS = (
    "int", "long", "timestamp", "timestamp_ntz", "boolean", "date",
    "string", "binary", "double", "float",
)


def sample_stats(
    df,
    pt_col: str = "pt",
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    fraction: float = 0.05,
    seed: int = 7,
):
    """Per-(pt, column) stats DataFrame from a seeded sample of the table."""
    from .encode import flatten_struct_columns

    df = flatten_struct_columns(df)
    fields = [
        (f.name, spark_field_phys(f.dataType))
        for f in df.schema.fields
        if f.name != pt_col
    ]
    fields = [(n, p) for n, p in fields if p in _STATS_PHYS]
    sampled = df.sample(fraction=min(1.0, fraction), seed=seed)

    def per_pt(key, pdf):
        from .blocks import pin_worker_threads

        pin_worker_threads()
        pt = str(key[0])
        pdf = pdf.sort_values(list(sort_cols), kind="mergesort", ignore_index=True)
        return pd.DataFrame([_col_stats(pt, name, phys, pdf[name]) for name, phys in fields])

    return sampled.groupBy(pt_col).applyInPandas(per_pt, STATS_DDL)


def plan_from_stats(df, **kwargs) -> dict[str, str]:
    """Convenience: stats pass -> collected (small) -> selector plan."""
    from .selector import build_plan

    stats_pdf = sample_stats(df, **kwargs).toPandas()
    return build_plan(stats_pdf)
