"""Multimodal columns: image/audio/video as opaque ``binary`` cells with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step needs image/audio libraries that are NOT in this container,
so the actual pixel/sample decoding is STUBBED: with ``fake=True`` (default)
a deterministic fake decoder derives features from the bytes themselves
(stable across runs — usable in tests and benchmarks); with ``fake=False``
the stub raises ``NotImplementedError`` at the exact seam where PIL/ffmpeg
would slot in.  Everything Spark-side — schema, partitioning, UDF
signatures, Arrow batch shape — is real and tested.

Reference seam: the lazy out-of-band FilePointer + loader pattern
(``bids2table/utils.py:78-160``, ``bids2table/loaders/nibabel.py:9-26``):
heavy payloads stay opaque until a reader explicitly materializes them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_DDL = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURES_DDL = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feature array<float>, thumb_w int, thumb_h int"
)

_FEAT_DIM = 16


def media_hash(seed: int, i: int) -> bytes:
    """THE per-id digest — single source for payload bytes AND metadata
    fields (width/height/duration), so the in-memory table and the on-disk
    fixture can never silently desynchronize."""
    return hashlib.sha256(f"{seed}:{i}".encode()).digest()


def media_payload(seed: int, i: int) -> tuple[bytes, str]:
    """Deterministic (payload, kind) for one media id: bytes derived from a
    sha256 chain — shared by the in-memory synth table and the on-disk
    binary-file fixture (sources/binary.py) so both reproduce byte-for-byte."""
    h = media_hash(seed, i)
    size = 256 + (h[0] << 4)
    payload = (h * ((size // len(h)) + 1))[:size]
    return payload, ["image", "audio", "video"][i % 3]


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from sha256
    chains (no external data; binary column + typed metadata)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids.tolist():  # bounded by batch; payload gen is setup, not hot path
                h = media_hash(seed, i)
                payload, kind = media_payload(seed, i)
                mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "mime": mime,
                        "width": 64 + (h[1] % 64) if kind != "audio" else None,
                        "height": 64 + (h[2] % 64) if kind != "audio" else None,
                        "duration_ms": 1000 + h[3] * 10 if kind != "image" else None,
                        "payload": payload,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_DDL)


def _fake_decode(payload: np.ndarray) -> np.ndarray:
    """Deterministic stand-in for pixel/sample decoding: fold the bytes into
    a fixed-dim float vector (vectorized per batch)."""
    out = np.zeros((len(payload), _FEAT_DIM), dtype=np.float32)
    for k, buf in enumerate(payload):  # per-cell loop over opaque blobs
        b = np.frombuffer(buf, dtype=np.uint8)
        pad = (-len(b)) % _FEAT_DIM
        m = np.pad(b, (0, pad)).reshape(-1, _FEAT_DIM)
        out[k] = m.mean(axis=0) / 255.0
    return out


def extract_features(media: DataFrame, fake: bool = True, batch_size: int = 64) -> DataFrame:
    """Decode + feature-extract + thumbnail-size stage as mapInPandas.

    ``fake=False`` marks where a real decoder (PIL / torchaudio / ffmpeg)
    plugs in; the container lacks those libs, so it raises.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in this "
                    "container; pass fake=True for the deterministic stub"
                )
            payload = pdf["payload"].to_numpy()
            feats = _fake_decode(payload)
            n_bytes = np.array([len(b) for b in payload], dtype=np.int64)
            sha = [hashlib.sha256(b).hexdigest() for b in payload]
            w = pdf["width"].fillna(0).astype(int)
            h = pdf["height"].fillna(0).astype(int)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "sha256": sha,
                    "feature": list(feats),
                    "thumb_w": (w // 2).astype("int32"),
                    "thumb_h": (h // 2).astype("int32"),
                }
            )

    # media payloads are heavy: repartition by id so batches stay bounded
    return media.repartition(max(media.sparkSession.sparkContext.defaultParallelism, 4), "media_id").mapInPandas(
        run, FEATURES_DDL
    )


def frame_sample(media: DataFrame, every_ms: int = 500, fake: bool = True) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (posexplode over the sampling grid); frame decode itself is the stub."""
    vids = media.filter(F.col("kind") == "video")
    grid = F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
    out = vids.select(
        "media_id",
        F.posexplode(grid).alias("frame_idx", "ts_ms"),
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
    )
    if not fake:
        raise NotImplementedError("frame pixel decode needs ffmpeg — stubbed")
    return out
