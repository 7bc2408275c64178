"""Column-statistics sampling pass feeding the codec selector.

Round-2 scale shape: the sampling UDF runs per ``(pt, salt)`` chunk — not
one giant task per partition — so its parallelism scales with the cluster
and no single task ever has to hold a partition's whole sample (round-1
capped parallelism at n_pt and OOM'd by construction at 100x).  Each chunk
emits *mergeable* partials: counts, run counts, min/max frames, byte
HISTOGRAMS (entropy is computed from the summed histogram — exactly, since
entropy is a function of the distribution), delta widths, sampled FSST
ratios, ALP hit rates.  NDV — the one stat that does not merge — comes from
a separate single JVM aggregation using ``approx_count_distinct`` (HLL
sketches merge natively inside Spark).

The merge itself runs driver-side in pandas over n_pt x n_salts x n_cols
tiny rows, then feeds :func:`bids2table_spark.selector.build_plan`.

Everything the north rule names (NDV, run length, byte entropy) is here,
Arrow-vectorized, never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .blocks import spark_field_phys
from .codecs.base import strings_to_buf
from .codecs.bitpack import bit_width, gcd_deltas, patched_cost, zigzag
from .codecs import fsst as fsst_mod

PARTIAL_DDL = (
    "pt string, salt int, column string, phys string, n long, ndv long, "
    "runs long, vmin long, vmax long, w_delta int, total_bytes long, "
    "hist binary, fsst_sample_ratio double, alp_hit double, w_alp int, "
    "for_pbytes double, delta_pbytes double, kmv binary"
)

# KMV (k-minimum-values) distinct sketch: each chunk keeps the K smallest
# 64-bit value hashes; sketches MERGE by union+truncate, and the merged
# estimate is (K-1)/normalized_kth_min — so NDV no longer needs its own
# approx_count_distinct Spark job + materialized shared sample (round-4:
# the stats pass is now ONE job, and every stat merges).
_KMV_K = 256


def _kmv_sketch(values) -> bytes:
    """K smallest distinct 64-bit hashes of ``values`` (pandas C-speed hash)."""
    h = pd.util.hash_pandas_object(
        values if isinstance(values, pd.Series) else pd.Series(values), index=False
    ).to_numpy()
    hu = np.unique(h)  # sorted distinct
    return hu[:_KMV_K].tobytes()


def _kmv_estimate(sketches) -> int:
    """Merged NDV estimate from per-chunk KMV sketches."""
    ks = [np.frombuffer(b, dtype=np.uint64) for b in sketches if len(b)]
    if not ks:
        return 0
    hu = np.unique(np.concatenate(ks))
    if len(hu) < _KMV_K:
        return int(len(hu))
    kth = float(hu[_KMV_K - 1]) / float(2**64)
    return int(round((_KMV_K - 1) / kth))

STATS_COLUMNS = [
    "pt", "column", "phys", "n", "ndv", "runs", "w_for", "w_delta",
    "total_bytes", "entropy", "fsst_sample_ratio", "alp_hit", "w_alp",
    "for_pbytes", "delta_pbytes",
]

_FSST_SAMPLE_BYTES = 1 << 17
# the actual-compression trial needs only a RATIO estimate, not a good
# table: a 32KB slice at full refinement stays within ~0.05 of the 128KB
# ratio (measured round 4) at 3-4x less CPU, and caps the trial at a
# CONSTANT cost per chunk no matter how big the per-pt sample grows
_FSST_TRIAL_BYTES = 1 << 15

# phys tags the sampling pass understands; ``list<T>`` columns participate
# too (round 5): their partials are computed over the FLATTENED child values
# — exactly the view choose_codec_local ranks on — so the global plan covers
# them and blocks stop re-running the per-block estimator for every chunk
_STATS_PHYS = (
    "int", "long", "timestamp", "timestamp_ntz", "boolean", "date",
    "string", "binary", "double", "float",
)


def _stats_phys_ok(phys: str) -> bool:
    from .blocks import is_list_phys, list_child_phys

    if is_list_phys(phys):
        return list_child_phys(phys) in _STATS_PHYS
    return phys in _STATS_PHYS

_INT_PHYS = ("int", "long", "timestamp", "timestamp_ntz", "boolean", "date")


def _col_partial(
    pt: str, salt: int, name: str, phys: str, series: pd.Series,
    trial: bool | None = None,
) -> dict:
    """``trial``: run the (expensive) FSST actual-compression trial in this
    chunk.  Default (None) keeps the historical rule — salt 0 carries the
    trial — used by the explicit ``salts_per_pt`` path and unit tests; the
    global-chunk path spreads trials across chunks by a per-pt hash so no
    single task pays every pt's trial."""
    from .blocks import is_list_phys, list_child_phys

    if trial is None:
        trial = salt == 0
    if is_list_phys(phys):
        # list<T>: partials over the flattened child values (the same view
        # the list kernel encodes and choose_codec_local ranks on); the row
        # keeps the declared list phys — build_plan strips it to pick the
        # child branch, and the plan codec names the child kernel
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(series)
        if pa.types.is_null(arr.type):  # chunk where every list is NULL
            flat = pa.array([], type=pa.null())
        else:
            flat = pc.list_flatten(arr.drop_null() if arr.null_count else arr)
        out = _col_partial(pt, salt, name, list_child_phys(phys), flat.to_pandas(), trial=trial)
        out["phys"] = phys
        return out
    out = {
        "pt": pt, "salt": salt, "column": name, "phys": phys, "n": len(series),
        "ndv": 0, "runs": 0, "vmin": 0, "vmax": 0, "w_delta": 0,
        "total_bytes": 0, "hist": b"", "fsst_sample_ratio": 0.0,
        "alp_hit": 0.0, "w_alp": 0, "for_pbytes": 0.0, "delta_pbytes": 0.0,
        "kmv": b"",
    }
    valid = series.dropna()
    if len(valid) == 0:
        return out
    if phys in _INT_PHYS:
        from .blocks import _to_kernel

        vals, _ = _to_kernel(valid, phys)
        vals = np.asarray(vals, dtype=np.int64)
        out["ndv"] = int(pd.unique(vals).size)
        out["kmv"] = _kmv_sketch(vals)
        out["vmin"], out["vmax"] = int(vals.min()), int(vals.max())
        # patch-aware byte estimates (mergeable: they are per-chunk payload
        # byte sums, summed in merged_stats) — the chunk-local rebase matches
        # what the per-block kernels actually see, so rare outliers
        # (conversation-boundary resets) cost exceptions, not global width
        out["for_pbytes"] = patched_cost(
            vals.view(np.uint64) - np.int64(out["vmin"]).view(np.uint64)
        )
        if len(vals) > 1:
            dd, _ = gcd_deltas(vals)
            zz = zigzag(dd)
            out["w_delta"] = bit_width(int(zz.max()))
            out["delta_pbytes"] = patched_cost(zz)
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
        # hash only the chunk's DISTINCT values (the dictionary) — same
        # sketch, ndv-not-n hashing cost
        out["kmv"] = _kmv_sketch(d.dictionary.to_pandas())
        out["runs"] = int((codes[1:] != codes[:-1]).sum()) + 1 if len(codes) > 1 else 1
        offsets, buf = strings_to_buf(arr)
        out["total_bytes"] = int(len(buf))
        sample = np.frombuffer(buf[:_FSST_SAMPLE_BYTES], dtype=np.uint8)
        out["hist"] = np.bincount(sample, minlength=256).astype(np.int64).tobytes()
        # the actual-compression FSST trial is the expensive stat — run it in
        # ONE chunk per pt (salt 0); histograms/counts still come from every
        # chunk, and the merge weights the ratio by bytes so missing chunks
        # simply don't contribute
        if trial and len(sample) >= 1024:
            trial = sample[:_FSST_TRIAL_BYTES]
            table = fsst_mod._Table(fsst_mod.build_table(trial))
            stream = fsst_mod.compress(trial, table)
            out["fsst_sample_ratio"] = float(len(stream) + 8 * len(table.symbols)) / len(trial)
    else:  # double / float
        out["ndv"] = int(pd.unique(valid).size)
        out["total_bytes"] = (8 if phys == "double" else 4) * len(valid)
        if phys == "double":
            from .codecs.alp import _exact_mask, choose_exponent

            vals = valid.to_numpy(dtype=np.float64)
            e, hit = choose_exponent(vals)
            _, enc = _exact_mask(vals[:: max(1, len(vals) // 4096)], e)
        else:
            from .codecs.alp import _exact_mask_f32, choose_exponent_f32

            vals = valid.to_numpy(dtype=np.float32)
            e, hit = choose_exponent_f32(vals)
            _, enc = _exact_mask_f32(vals[:: max(1, len(vals) // 4096)], e)
        out["alp_hit"] = float(hit)
        out["kmv"] = _kmv_sketch(valid)
        if len(enc):
            out["w_alp"] = bit_width(int(enc.max()) - int(enc.min()))
    return out


def _stats_fields(df, pt_col: str) -> list[tuple[str, str]]:
    fields = [
        (f.name, spark_field_phys(f.dataType))
        for f in df.schema.fields
        if f.name != pt_col
    ]
    return [(n, p) for n, p in fields if _stats_phys_ok(p)]


def sample_stats(
    df,
    pt_col: str = "pt",
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    fraction: float = 0.05,
    seed: int = 7,
    salts_per_pt: int | None = None,
    pre_sampled=None,
):
    """Mergeable per-(pt, salt, column) partial stats from a seeded sample.

    Salting is by the conversation key (``sort_cols[0]``), so every
    conversation's rows land in ONE chunk and the per-chunk sort preserves
    the runs/delta structure the encode groups will actually see; chunk
    boundaries only ever split *between* conversations.

    Default chunking is GLOBAL (round 6): one salt space of
    ``defaultParallelism`` chunks shared by every pt, with each chunk
    splitting by pt *inside* the pandas function.  The old per-pt salting
    (``salts_per_pt``, kept for explicit callers/tests) produced
    n_pt x salts chunks, and the ~15 ms applyInPandas per-chunk cost
    (arrow<->pandas conversion + per-group dispatch) dominated the pass:
    128 chunks cost 2.2 s where 32 cost 1.2 s at identical output.  The
    per-pt FSST trial spreads over chunks by a per-pt hash so no single
    task pays every pt's trial.  Partials are identical in distribution
    (conversations still land whole, runs/delta structure preserved);
    only the salt labels differ, and the merge is salt-agnostic.

    ``pre_sampled``: an already flattened+sampled frame to reuse (lets
    merged_stats materialize ONE sample shared by both stats jobs instead
    of two independent full-input sampling scans)."""
    from pyspark.sql import functions as F

    from .encode import flatten_struct_columns

    if pre_sampled is not None:
        df = pre_sampled
    else:
        df = flatten_struct_columns(df).sample(
            fraction=min(1.0, fraction), seed=seed
        )
    fields = _stats_fields(df, pt_col)
    if salts_per_pt is not None:
        sampled = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(sort_cols[0])), F.lit(salts_per_pt)).cast("int")
        )

        def per_chunk(key, pdf):
            from .blocks import pin_worker_threads

            pin_worker_threads()
            pt, salt = str(key[0]), int(key[1])
            pdf = pdf.sort_values(list(sort_cols), kind="mergesort", ignore_index=True)
            return pd.DataFrame(
                [_col_partial(pt, salt, name, phys, pdf[name]) for name, phys in fields]
            )

        sampled = sampled.repartition(
            max(2, df.sparkSession.sparkContext.defaultParallelism), pt_col, "_salt"
        )
        return sampled.groupBy(pt_col, "_salt").applyInPandas(per_chunk, PARTIAL_DDL)

    n_chunks = max(2, df.sparkSession.sparkContext.defaultParallelism)
    sampled = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(sort_cols[0])), F.lit(n_chunks)).cast("int")
    )
    # pin the post-shuffle partition count (REPARTITION_BY_NUM): the sample
    # is a few MB, and AQE's byte-based coalescing would otherwise collapse
    # the python stage to ONE task — every chunk's numpy work serialized in
    # a single worker (measured round 6; same fix as encode/decode)
    sampled = sampled.repartition(n_chunks, "_salt")

    def per_chunk_global(key, pdf):
        import hashlib

        from .blocks import pin_worker_threads

        pin_worker_threads()
        salt = int(key[0])
        rows = []
        for pt, sub in pdf.groupby(pt_col, sort=False):
            sub = sub.sort_values(list(sort_cols), kind="mergesort", ignore_index=True)
            # exactly one chunk per pt runs the FSST trial (deterministic
            # per-pt hash — the trial chunk is stable across runs)
            trial = (
                int(hashlib.md5(str(pt).encode()).hexdigest()[:8], 16) % n_chunks
                == salt
            )
            rows.extend(
                _col_partial(str(pt), salt, name, phys, sub[name], trial=trial)
                for name, phys in fields
            )
        if not rows:  # a salt with zero sampled rows: typed empty frame
            return pd.DataFrame(columns=[c.split()[0] for c in PARTIAL_DDL.split(", ")])
        return pd.DataFrame(rows)

    return sampled.groupBy("_salt").applyInPandas(per_chunk_global, PARTIAL_DDL)


def _entropy_from_hist(counts: np.ndarray) -> float:
    total = counts.sum()
    if total == 0:
        return 0.0
    p = counts[counts > 0] / total
    return float(-(p * np.log2(p)).sum())


def merged_stats(
    df,
    pt_col: str = "pt",
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    fraction: float = 0.05,
    seed: int = 7,
    salts_per_pt: int | None = None,
) -> pd.DataFrame:
    """Partial pass -> driver-side merge -> the per-(pt, column) stats frame
    ``selector.build_plan`` consumes.

    ONE Spark job: every stat merges, including NDV — each chunk carries a
    KMV distinct sketch (k smallest value hashes), sketches union in the
    driver-side merge, and the estimate is (K-1)/kth_min.  (Rounds 2-3 ran
    a separate ``approx_count_distinct`` aggregation over a materialized
    shared sample: 3 jobs where 1 suffices, and a cache the cluster had to
    hold.)"""
    partial = sample_stats(
        df, pt_col=pt_col, sort_cols=sort_cols, fraction=fraction, seed=seed,
        salts_per_pt=salts_per_pt,
    ).toPandas()

    rows = []
    for (pt, col), g in partial.groupby(["pt", "column"], sort=True):
        phys = g["phys"].iloc[0]
        n = int(g["n"].sum())
        hists = [np.frombuffer(h, dtype=np.int64) for h in g["hist"] if len(h)]
        hist = np.sum(hists, axis=0) if hists else np.zeros(256, dtype=np.int64)
        has_trial = g["fsst_sample_ratio"].to_numpy() > 0
        tb = g["total_bytes"].to_numpy(dtype=np.float64) * has_trial
        w_fsst = float((g["fsst_sample_ratio"].to_numpy() * tb).sum() / tb.sum()) if tb.sum() else 0.0
        nn = g["n"].to_numpy(dtype=np.float64)
        w_alp_hit = float((g["alp_hit"].to_numpy() * nn).sum() / nn.sum()) if nn.sum() else 0.0
        from .blocks import is_list_phys, list_child_phys

        base_phys = list_child_phys(phys) if is_list_phys(phys) else phys
        nonzero = g[g["n"] > 0]
        w_for = 0
        if base_phys in _INT_PHYS and len(nonzero):
            w_for = bit_width(int(nonzero["vmax"].max()) - int(nonzero["vmin"].min()))
        rows.append(
            {
                "pt": pt,
                "column": col,
                "phys": phys,
                "n": n,
                "ndv": _kmv_estimate(g["kmv"]) or int(g["ndv"].max()),
                "runs": int(g["runs"].sum()),
                "w_for": w_for,
                "w_delta": int(g["w_delta"].max()),
                "total_bytes": int(g["total_bytes"].sum()),
                "entropy": _entropy_from_hist(hist),
                "fsst_sample_ratio": w_fsst,
                "alp_hit": w_alp_hit,
                "w_alp": int(g["w_alp"].max()),
                "for_pbytes": float(g["for_pbytes"].sum()),
                "delta_pbytes": float(g["delta_pbytes"].sum()),
            }
        )
    return pd.DataFrame(rows, columns=STATS_COLUMNS)


def plan_from_stats(df, **kwargs) -> dict[str, str]:
    """Convenience: mergeable stats pass -> selector plan."""
    from .selector import build_plan

    return build_plan(merged_stats(df, **kwargs))
