"""F3 size parse/format + byte-based group sizing.

Reference parity: ``parse_size``/``detect_size_units``
(``bids2table/utils.py:293-339``) feed the writer's byte-sized flush
partitions (``bids2table/writer.py:39,45``); here the same bound sizes
encode groups via the salt plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bids2table_spark.functions import format_size, parse_size
from bids2table_spark.partitioning import salt_plan


def test_parse_size_forms():
    assert parse_size("64 MiB") == 64 * 1024**2
    assert parse_size("64MiB") == 64 * 1024**2
    assert parse_size("1.5GB") == 1_500_000_000
    assert parse_size("10mb") == 10_000_000
    assert parse_size("2kib") == 2048
    assert parse_size("123") == 123  # bare number = bytes
    assert parse_size(4096) == 4096
    assert parse_size(" 7 b ") == 7
    assert parse_size("0.5 TiB") == 1024**4 // 2


@pytest.mark.parametrize("bad", ["64 XB", "MiB", "1..5GB", "", "12 34 kb"])
def test_parse_size_rejects(bad):
    with pytest.raises(ValueError):
        parse_size(bad)


def test_format_size_roundtrip_rank():
    assert format_size(512) == "512 B"
    assert format_size(64 * 1024**2) == "64.00 MiB"
    assert format_size(1_500_000_000, binary=False) == "1.50 GB"
    # parse(format(n)) stays within rounding of n
    for n in (999, 10_000, 64 * 1024**2, 3 * 1024**3):
        assert abs(parse_size(format_size(n)) - n) <= max(1, n // 100)


@pytest.fixture(scope="module")
def fat_thin(spark):
    """Two pts, same row count, 200x different row weight."""
    base = spark.range(4000).select(
        F.concat(F.lit("c"), (F.col("id") % 500).cast("string")).alias("conv_id"),
        (F.col("id") / 500).cast("int").alias("turn_idx"),
    )
    fat = base.withColumn("pt", F.lit("fat")).withColumn(
        "text", F.repeat(F.lit("x"), 2000)
    )
    thin = base.withColumn("pt", F.lit("thin")).withColumn(
        "text", F.repeat(F.lit("y"), 10)
    )
    return fat.unionByName(thin).cache()


def test_byte_sizing_splits_fat_pt(fat_thin):
    rows_only = salt_plan(fat_thin, target_group_rows=262_144)
    assert rows_only == {"fat": 1, "thin": 1}
    by_bytes = salt_plan(
        fat_thin, target_group_rows=262_144, target_group_bytes="2 MiB"
    )
    # fat: ~8 MB of text / 2 MiB target -> ~4 groups; thin rows are so
    # light the row target governs
    assert by_bytes["thin"] == 1
    assert by_bytes["fat"] >= 3
    # byte bound only shrinks groups: every pt has >= the rows-only salts
    assert all(by_bytes[pt] >= rows_only[pt] for pt in rows_only)


def test_byte_sizing_floor_is_1024_rows(fat_thin):
    # absurdly small byte target must not explode the group universe:
    # 4000 rows / 1024-row floor = at most 4 groups per pt
    plan = salt_plan(fat_thin, target_group_bytes="1KB")
    assert plan["fat"] == 4 and plan["thin"] == 4


def test_row_bytes_expr_measures_variable_width(spark):
    from bids2table_spark.partitioning import row_bytes_expr

    df = spark.createDataFrame(
        [("a", "xxxx", 1, [1.0, 2.0], ["ab", None]), ("b", None, None, None, None)],
        "pt string, s string, i int, d array<double>, t array<string>",
    )
    got = df.select(row_bytes_expr(df, exclude=("pt",)).alias("b")).collect()
    # row 1: 4 (s) + 4 (i) + 16 (2 doubles) + 2 (ab) = 26; row 2: 0 + 4 + 0 + 0
    assert sorted(r["b"] for r in got) == [4, 26]


def test_encode_with_byte_bound_roundtrips(spark, tmp_path):
    from bids2table_spark.manifest import decode_job, encode_job
    from bids2table_spark.synth import synth_transcripts

    df = synth_transcripts(spark, n_conv=120, seed=7, n_pt=2).cache()
    out = str(tmp_path / "enc")
    summary = encode_job(
        spark, df, out, target_group_bytes="64 KiB", resume=False
    )
    assert summary["groups_total"] >= 2
    dec = decode_job(spark, out)
    cols = sorted(c for c in df.columns if c != "grp")
    a = df.select(cols).exceptAll(dec.select(cols)).count()
    b = dec.select(cols).exceptAll(df.select(cols)).count()
    assert a == 0 and b == 0
