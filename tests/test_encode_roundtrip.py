"""End-to-end encode -> decode bit-identical round-trip on the synthetic
transcript table (the reference-invariant check: per-turn text equality under
stable (conv_id, turn_idx) ordering; mirrors the reference's golden E2E test
``tests/test_engine.py:17-47``)."""

from __future__ import annotations

import pandas as pd
import pytest

from bids2table_spark.decode import decode_table
from bids2table_spark.encode import encode_table
from bids2table_spark.synth import synth_transcripts

KEY = ["conv_id", "turn_idx"]


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(KEY, ignore_index=True)


@pytest.fixture(scope="module")
def transcripts(spark):
    return synth_transcripts(spark, n_conv=300, seed=42, n_pt=4).cache()


def test_roundtrip_bit_identical(spark, transcripts):
    blocks = encode_table(transcripts, block_rows=1024, target_group_rows=2048)
    decoded = decode_table(blocks)
    left = _sorted_pdf(transcripts)
    right = _sorted_pdf(decoded)
    assert len(left) == len(right) and len(left) > 0
    pd.testing.assert_frame_equal(left, right)


def test_roundtrip_compresses(spark, transcripts):
    blocks = encode_table(transcripts).cache()
    agg = blocks.groupBy().sum("orig_bytes", "enc_bytes").collect()[0]
    orig, enc = agg[0], agg[1]
    assert enc < orig * 0.5, f"expected >=2x compression, got {orig}/{enc}"
    # every column present, codecs plausible
    codec_by_col = {
        r["column"]: r["codec"]
        for r in blocks.select("column", "codec").distinct().collect()
    }
    assert set(codec_by_col) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_decode_detects_corruption(spark, transcripts):
    import pyspark.sql.functions as F

    blocks = encode_table(transcripts, block_rows=4096)
    corrupted = blocks.withColumn(
        "payload",
        F.when(
            F.col("column") == "text",
            F.expr("substring(payload, 1, int(length(payload)) - 8)"),
        ).otherwise(F.col("payload")),
    )
    with pytest.raises(Exception, match="(checksum|mismatch|length|buffer|bounds|cannot|Error)"):
        decode_table(corrupted).collect()


def test_plan_override(spark, transcripts):
    blocks = encode_table(transcripts, plan={"role": "dict", "text": "plain"})
    got = {
        r["column"]: r["codec"]
        for r in blocks.select("column", "codec").distinct().collect()
    }
    assert got["role"] == "dict" and got["text"] == "plain"
