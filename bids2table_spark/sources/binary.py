"""S9 out-of-band binary ingestion: real files read via ``binaryFile``.

The reference defers heavy payloads behind a FilePointer (path + loader) and
only materializes bytes when a reader asks (``bids2table/utils.py:78-160``,
``bids2table/loaders/nibabel.py:9-26``).  The Spark-native analog is the
``binaryFile`` data source: a distributed scan that yields
``(path, modificationTime, length, content)`` rows with partition-parallel
reads, glob filtering, and column pruning (asking only for ``length``/
``path`` never loads the bytes — the lazy half of FilePointer for free).

``write_media_files`` materializes the deterministic synthetic media
payloads as actual files once per (dir, n, seed) so tests/queries exercise a
genuine file scan, not an in-memory frame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_EXT = {"image": "png", "audio": "wav", "video": "mp4"}


def binary_file_source(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Distributed binary-file scan: one row per file with the payload as a
    ``binary`` column.  ``glob`` maps to ``pathGlobFilter`` (pushed into the
    file listing, so non-matching files are never opened)."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    r = r.option("recursiveFileLookup", str(recursive).lower())
    return r.load(path)


def write_media_files(root: str, n: int = 64, seed: int = 42) -> str:
    """Write the synthetic media payloads as files ``media_<id>.<ext>``.

    Idempotent: a marker file records (n, seed); matching marker -> no-op.
    Driver-side loop is fine here — this builds a test fixture, not a hot
    path (a production ingest starts from files that already exist).
    """
    from bids2table_spark.operators.multimodal import media_payload

    marker = os.path.join(root, "_FIXTURE")
    stamp = f"{n}:{seed}"
    if os.path.isfile(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return root
    os.makedirs(root, exist_ok=True)
    # clear any previous fixture's files: shrinking n / changing seed must
    # not leave stale media_* files for the globbed readers to pick up
    import glob as _glob

    for old in _glob.glob(os.path.join(root, "media_*.*")):
        os.remove(old)
    for i in range(n):
        payload, kind = media_payload(seed, i)
        fname = f"media_{i:05d}.{MEDIA_EXT[kind]}"
        with open(os.path.join(root, fname), "wb") as fh:
            fh.write(payload)
    with open(marker, "w") as fh:
        fh.write(stamp)
    return root


def path_list_source(spark: SparkSession, list_path: str) -> DataFrame:
    """S3 path-list / work-list source (reference ``_load_paths``,
    ``bids2table/engine.py:229-282``, which accepts both text lists and
    ``.npy`` path arrays):

    * ``.txt`` (default): one path per line, blank lines and ``#`` comments
      skipped; read distributed (``spark.read.text`` splits large lists
      across tasks).
    * ``.npy``: a numpy array of path strings, loaded on the DRIVER
      (``allow_pickle=False`` — a work list is metadata, never code) and
      planned as a JVM LocalTableScan; .npy is a single local file, so a
      distributed read buys nothing and the list is tiny next to the
      payload bytes it names."""
    if list_path.endswith(".npy"):
        import numpy as np

        from ..session import local_df

        arr = np.load(list_path, allow_pickle=False)
        if arr.dtype.kind not in ("U", "S"):
            raise TypeError(
                f"path_list_source: .npy work list must hold strings, got dtype {arr.dtype}"
            )
        paths = [
            (p.strip(),)
            for p in (x.decode() if isinstance(x, bytes) else str(x) for x in arr.ravel())
            if p.strip() and not p.strip().startswith("#")
        ]
        return local_df(spark, paths, "path string")
    p = F.trim(F.col("value"))
    return (
        spark.read.text(list_path)
        .select(p.alias("path"))
        .filter((F.length("path") > 0) & (~F.col("path").startswith("#")))
    )


def _norm_path(col):
    # binaryFile yields file:///abs URIs; work lists carry plain /abs paths
    return F.regexp_replace(col, "^file:/+", "/")


def binaries_from_path_list(
    spark: SparkSession,
    root: str,
    list_df: DataFrame,
    max_driver_paths: int = 100_000,
) -> DataFrame:
    """Restrict a binary-file scan to the paths in a work list.

    Scale shape: a work list is tiny next to the payload bytes, so when it
    fits (``<= max_driver_paths``) the paths are collected and handed to
    ``load(*paths)`` directly — Spark's file index then lists ONLY those
    files and unlisted files are never opened.  A larger list falls back to
    a broadcast semi-join against the root scan, which still prunes what
    flows downstream but must enumerate (not read: the join hits only the
    lazily-loaded ``path`` column before content materializes) the root."""
    keys = list_df.select(_norm_path(F.col("path")).alias("p")).distinct()
    head = [r["p"] for r in keys.limit(max_driver_paths + 1).collect()]
    if len(head) <= max_driver_paths:
        # match the semi-join fallback's semantics exactly: paths outside
        # root or no longer on disk are SKIPPED, not returned / not fatal
        # (load() would throw PATH_NOT_FOUND on one stale entry, making
        # results depend on list size instead of content)
        rt = root.rstrip("/") + "/"
        head = [
            p for p in head
            if p.startswith(rt) and os.path.isfile(p)
        ]
        if not head:
            return binary_file_source(spark, root).limit(0)
        return spark.read.format("binaryFile").load(head)
    scan = binary_file_source(spark, root)
    return (
        scan.withColumn("_p", _norm_path(F.col("path")))
        .join(F.broadcast(keys.withColumnRenamed("p", "_p")), on="_p", how="left_semi")
        .drop("_p")
    )


def media_from_files(spark: SparkSession, root: str) -> DataFrame:
    """Parse the ``media_<id>.<ext>`` layout back into the media-table shape:
    id and kind come from the PATH (FilePointer parity — the filename is the
    metadata), bytes from the distributed scan."""
    ext_to_kind = F.create_map(
        *[F.lit(x) for kv in ((e, k) for k, e in MEDIA_EXT.items()) for x in kv]
    )
    df = binary_file_source(spark, root, glob="media_*.*")
    return df.select(
        F.regexp_extract(F.col("path"), r"media_(\d+)\.", 1)
        .cast("long")
        .alias("media_id"),
        ext_to_kind[F.regexp_extract(F.col("path"), r"\.(\w+)$", 1)].alias("kind"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )
