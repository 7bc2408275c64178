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


def test_roundtrip_edge_values(spark, tmp_path):
    """Adversarial value shapes through the FULL job: all-null column,
    empty strings, unicode (emoji, CJK, RTL, NUL-adjacent), zero-length
    binary-ish text, single-row conversations, and a 1000-turn hot conv."""
    import pandas as pd

    from bids2table_spark.manifest import decode_job, encode_job

    rows = []
    texts = ["", " ", "héllo wörld", "日本語テキスト", "مرحبا", "🎉🎊" * 50,
             "a\x01b", "x" * 10_000, "newline\nand\ttab"]
    for c in range(40):
        conv = f"conv-{c:04d}"
        n = 1000 if c == 0 else (1 if c % 3 == 0 else 4)
        for t in range(n):
            rows.append({
                "pt": f"pt-{c % 3}",
                "conv_id": conv,
                "turn_idx": t,
                "role": None if c % 5 == 0 else ["user", "assistant"][t % 2],
                "text": texts[(c + t) % len(texts)],
                "tool": None,  # entirely-null column
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=c * 1000 + t),
            })
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(
        pdf,
        "pt string, conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )
    out = str(tmp_path / "edge")
    summary = encode_job(spark, df, out, run_id="edge", target_group_rows=512)
    assert summary["groups_failed"] == 0
    dec = decode_job(spark, out).toPandas()
    key = ["conv_id", "turn_idx"]
    a = pdf.sort_values(key, ignore_index=True)[sorted(pdf.columns)]
    b = dec.sort_values(key, ignore_index=True)[sorted(dec.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
