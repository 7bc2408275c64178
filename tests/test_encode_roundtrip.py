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


def test_zone_key_phys_coercion():
    """Zone images must agree between encode (pandas may promote a nullable
    int64 key to float64) and decode (native-typed key_range bounds)."""
    import numpy as np

    from bids2table_spark.blocks import zone_key_value

    # float64-from-nullable-int at encode == native int at decode
    assert zone_key_value(np.float64(7.0), "long") == zone_key_value(7)
    assert zone_key_value(np.float64(7.0), "int") == zone_key_value(7)
    # ordering still holds through the coerced image
    assert zone_key_value(np.float64(9.0), "long") < zone_key_value(11)
    # NaN from an all-null chunk -> None, not a garbage image
    assert zone_key_value(float("nan"), "long") is None
    # timestamps: epoch-float ns promoted values image like native Timestamps
    t = pd.Timestamp("2024-03-01 12:00:00")
    assert zone_key_value(t, "timestamp") == zone_key_value(t)
    # no-phys dispatch (decode side) unchanged
    assert zone_key_value(5) == f"{5 + (1 << 63):020d}"
    # date keys: a string or Timestamp bound must image through the DATE
    # alphabet (days-since-epoch), not the str/timestamp one
    import datetime

    d = datetime.date(2024, 3, 1)
    assert zone_key_value("2024-03-01", "date") == zone_key_value(d)
    assert zone_key_value(pd.Timestamp("2024-03-01"), "date") == zone_key_value(d)
    assert zone_key_value("2024-02-01", "date") < zone_key_value(d)
    # binary keys: str/bytearray bounds normalize to the bytes hex image
    assert zone_key_value("ab", "binary") == zone_key_value(b"ab")
    assert zone_key_value(bytearray(b"ab"), "binary") == zone_key_value(b"ab")


def test_zone_pruned_lookup_on_nullable_int_key(spark, tmp_path):
    """End-to-end: int sort key WITH NULLS (the float64-promotion trap) —
    a key_range decode must still return every matching row."""
    from bids2table_spark.manifest import decode_job, encode_job

    rows = []
    for c in range(40):
        for t in range(30):
            rows.append({
                "pt": "p0",
                "conv_id": f"c{c:03d}",
                "turn_idx": None if (c == 3 and t == 0) else t,
                "role": "user",
                "text": f"msg {c}/{t}",
                "tool": None,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=c * 100 + t),
            })
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(
        pdf,
        "pt string, conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )
    out = str(tmp_path / "zk")
    summary = encode_job(
        spark, df, out, run_id="zk", target_group_rows=256,
        key_cols=("turn_idx", "conv_id"), conv_col="conv_id",
    )
    assert summary["groups_failed"] == 0
    dec = decode_job(spark, out, key_range=(10, 12)).toPandas()
    got = dec[dec["turn_idx"].between(10, 12)]
    # every (conv, turn) in 10..12 must survive pruning: 40 convs x 3 turns
    assert len(got) == 40 * 3


def test_zone_pruned_lookup_on_nested_key(spark, tmp_path):
    """A NESTED sort key ('meta·k', materializes only post-flatten) must get
    the same key_range bound coercion as a top-level key: key_phys is
    resolved on the flattened schema, so integer bounds image through the
    int alphabet on both sides."""
    from pyspark.sql import functions as F

    from bids2table_spark.manifest import decode_job, encode_job

    rows = []
    for c in range(20):
        for t in range(30):
            rows.append({"pt": "p0", "conv_id": f"c{c:03d}", "k": c * 100 + t})
    pdf = pd.DataFrame(rows)
    df = (
        spark.createDataFrame(pdf, "pt string, conv_id string, k long")
        .select("pt", "conv_id", F.struct(F.col("k")).alias("meta"))
    )
    out = str(tmp_path / "nk")
    summary = encode_job(
        spark, df, out, run_id="nk", target_group_rows=256,
        key_cols=("meta·k", "conv_id"), conv_col="conv_id",
    )
    assert summary["groups_failed"] == 0
    import json

    with open(f"{out}/colmeta.json") as fh:
        assert json.load(fh)["__keyinfo__"]["key_phys"] == "long"
    dec = decode_job(spark, out, key_range=(150, 250)).toPandas()
    ks = dec["meta"].map(lambda m: m["k"])
    got = ks[(ks >= 150) & (ks <= 250)]
    want = sum(1 for c in range(20) for t in range(30) if 150 <= c * 100 + t <= 250)
    assert len(got) == want  # every matching k survives block pruning


def test_large_int64_with_nulls_roundtrip(spark, tmp_path):
    """int64 values above 2**53 WITH nulls must roundtrip bit-exactly: the
    Arrow encode path never boxes through float64 (the deleted pandas path
    silently rounded these)."""
    import numpy as np

    from bids2table_spark.manifest import decode_job, encode_job

    rng = np.random.default_rng(17)
    big = rng.integers(2**53, 2**63 - 1, 300, dtype=np.int64)
    big[::7] = np.iinfo(np.int64).max
    pdf = pd.DataFrame({
        "pt": "p0",
        "conv_id": [f"c{i//30:02d}" for i in range(300)],
        "turn_idx": [i % 30 for i in range(300)],
        "big_id": pd.array(
            [None if i % 11 == 0 else int(big[i]) for i in range(300)],
            dtype="Int64",
        ),
    })
    df = spark.createDataFrame(
        pdf, "pt string, conv_id string, turn_idx int, big_id long"
    )
    out = str(tmp_path / "bigint")
    s = encode_job(spark, df, out, run_id="big", target_group_rows=128)
    assert s["groups_failed"] == 0
    # compare via collect(): toPandas would itself promote the nullable
    # int64 to float64 and round >2**53 values in the COMPARISON
    dec = {
        (r["conv_id"], r["turn_idx"]): r["big_id"]
        for r in decode_job(spark, out).collect()
    }
    exp = {
        (r["conv_id"], r["turn_idx"]): r["big_id"] for r in df.collect()
    }
    assert dec == exp and len(dec) == 300
