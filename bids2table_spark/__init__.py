"""bids2table_spark — a PySpark-native per-column lightweight-compression
engine (dict, RLE, frame-of-reference+bitpack, delta, FSST) with codec
auto-selection, built from scratch with the pipeline shape of
clane9/bids2table (scan -> extract -> columnar table -> partitioned sink ->
resumable processed log) re-expressed on Spark.

Public API:
    synth_transcripts(spark, n_conv)          deterministic input table
    encode_table(df) / decode_table(blocks)   in-memory encode/decode
    encode_job(spark, df, out_dir)            durable, resumable encode
    decode_job(spark, out_dir)                decode committed state
    decode_job(spark, out_dir, as_of=...)     time-travel read (run_id/ts)
    snapshots(spark, out_dir)                 commit history metadata table
    compact_job(spark, out_dir)               bin-pack small groups
    vacuum_job(spark, out_dir)                drop superseded run dirs
    plan_from_stats(df)                       stats pass -> codec plan
"""

from .decode import decode_table
from .encode import encode_grouped, encode_table
from .manifest import (
    compact_job,
    decode_job,
    encode_job,
    read_manifest,
    snapshots,
    vacuum_job,
)
from .selector import build_plan, choose_codec_local
from .session import get_spark
from .stats import merged_stats, plan_from_stats, sample_stats
from .synth import synth_transcripts

__all__ = [
    "get_spark",
    "synth_transcripts",
    "encode_table",
    "encode_grouped",
    "decode_table",
    "encode_job",
    "decode_job",
    "compact_job",
    "snapshots",
    "vacuum_job",
    "read_manifest",
    "plan_from_stats",
    "sample_stats",
    "merged_stats",
    "build_plan",
    "choose_codec_local",
]

__version__ = "0.1.0"
