"""Per-partition lineage/metrics manifest + resumable encode job.

The reference's append-only ProcessedLog (``bids2table/logging.py:37-131``)
re-imagined as a small Parquet table next to the encoded blocks:

    out_dir/
      blocks/pt=…/…          encoded block rows, partitioned by pt
      manifest/…             one row per committed (pt, grp) group

Resume = left anti-join of pending groups against committed manifest rows
(the reference's ``filter_paths`` join, ``logging.py:133-164``).  Blocks are
written before their manifest rows; a crash between the two leaves orphan
blocks that are never read, because readers inner-join blocks with the
latest committed manifest row per group on (pt, grp, run_id) — the poor
man's Iceberg snapshot (seam kept so an Iceberg catalog can replace the
path layout; see sources/).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .decode import decode_table
from .encode import encode_grouped
from .partitioning import DEFAULT_GROUP_ROWS, salt_plan, with_group

MANIFEST_DDL = (
    "pt string, grp string, run_id string, n_blocks long, n_rows long, "
    "orig_bytes long, enc_bytes long, codecs string, checksum string, "
    "status string, committed_at timestamp"
)


def _paths(out_dir: str) -> tuple[str, str]:
    out_dir = out_dir.rstrip("/")
    return f"{out_dir}/blocks", f"{out_dir}/manifest"


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    _, mpath = _paths(out_dir)
    try:
        return spark.read.parquet(mpath)
    except Exception:
        return None


def committed_groups(spark: SparkSession, out_dir: str) -> DataFrame | None:
    m = read_manifest(spark, out_dir)
    if m is None:
        return None
    return m.filter(F.col("status") == "committed").select("pt", "grp").distinct()


def encode_job(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    plan: dict[str, str] | None = None,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    pt_col: str = "pt",
    conv_col: str = "conv_id",
    block_rows: int = 65_536,
    target_group_rows: int = DEFAULT_GROUP_ROWS,
    resume: bool = True,
    max_groups: int | None = None,
) -> dict:
    """Encode ``df`` into out_dir, skipping already-committed groups.

    Returns a summary dict (groups encoded/skipped, bytes).  ``max_groups``
    caps the number of groups this run commits — used by tests to simulate
    an interrupted job.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    bpath, mpath = _paths(out_dir)

    splan = salt_plan(df, pt_col=pt_col, target_group_rows=target_group_rows)
    grouped = with_group(df, splan, pt_col=pt_col, conv_col=conv_col)

    # the group universe comes from the (tiny) salt plan — no extra pass over
    # the data; (pt, grp) membership is a pure function of conv_id + plan
    all_groups = [
        (pt, f"g{s:04d}") for pt, n in sorted(splan.items()) for s in range(n)
    ]
    n_total = len(all_groups)
    pending = spark.createDataFrame(all_groups, f"{pt_col} string, grp string")
    done = committed_groups(spark, out_dir) if resume else None
    n_pending = n_total
    if done is not None:
        pending = pending.join(done, on=[pt_col, "grp"], how="left_anti")
        n_pending = pending.count()
    if max_groups is not None:
        pending = pending.orderBy(pt_col, "grp").limit(max_groups)
        n_pending = pending.count()
    if n_pending == 0:
        return {"run_id": run_id, "groups_total": n_total, "groups_encoded": 0,
                "groups_skipped": n_total, "orig_bytes": 0, "enc_bytes": 0}

    if n_pending == n_total:
        todo = grouped  # fresh encode: skip the semi-join entirely
    else:
        todo = grouped.join(F.broadcast(pending), on=[pt_col, "grp"], how="left_semi")
    blocks = encode_grouped(
        todo, key_cols=key_cols, pt_col=pt_col, plan=plan,
        block_rows=block_rows, num_partitions=n_pending,
    ).withColumn("run_id", F.lit(run_id))

    # 1) durable blocks first … (no partitionBy: each encode task emits one
    # file; pt lives as a column and readers select via the manifest join,
    # so hive-style dirs would only multiply small files ~8x)
    blocks.write.mode("append").option("compression", "zstd").parquet(bpath)

    # 2) … then manifest rows derived from what actually landed on disk
    written = spark.read.parquet(bpath).filter(F.col("run_id") == run_id)
    manifest = (
        written.groupBy(pt_col, "grp")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.when(F.col("col_idx") == 0, F.col("n_rows")).otherwise(0)).alias("n_rows"),
            F.sum("orig_bytes").alias("orig_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.to_json(
                F.map_from_entries(
                    F.array_distinct(F.collect_list(F.struct("column", "codec")))
                )
            ).alias("codecs"),
            F.sha2(
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(":", F.col("column"), F.col("block_id"), F.col("checksum"))
                        )
                    ),
                ),
                256,
            ).alias("checksum"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("status", F.lit("committed"))
        .withColumn("committed_at", F.current_timestamp())
        .select(
            pt_col, "grp", "run_id", "n_blocks", "n_rows", "orig_bytes",
            "enc_bytes", "codecs", "checksum", "status", "committed_at",
        )
    )
    manifest.write.mode("append").parquet(mpath)

    m = spark.read.parquet(mpath).filter(F.col("run_id") == run_id)
    agg = m.agg(
        F.count("*"), F.sum("orig_bytes"), F.sum("enc_bytes"), F.sum("n_rows")
    ).collect()[0]
    return {
        "run_id": run_id,
        "groups_total": n_total,
        "groups_encoded": agg[0],
        "groups_skipped": n_total - n_pending,
        "orig_bytes": agg[1] or 0,
        "enc_bytes": agg[2] or 0,
        "n_rows": agg[3] or 0,
    }


def committed_blocks(spark: SparkSession, out_dir: str) -> DataFrame:
    """Blocks joined to the latest committed manifest row per (pt, grp) —
    orphan blocks from crashed runs are invisible here."""
    bpath, _ = _paths(out_dir)
    m = read_manifest(spark, out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    w = Window.partitionBy("pt", "grp").orderBy(
        F.col("committed_at").desc(), F.col("run_id").desc()
    )
    latest = (
        m.filter(F.col("status") == "committed")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("pt", "grp", "run_id")
    )
    blocks = spark.read.parquet(bpath)
    return blocks.join(F.broadcast(latest), on=["pt", "grp", "run_id"], how="inner")


def decode_job(spark: SparkSession, out_dir: str, verify: bool = True) -> DataFrame:
    """Decode the committed state of out_dir back to the original table."""
    return decode_table(committed_blocks(spark, out_dir), verify=verify)
