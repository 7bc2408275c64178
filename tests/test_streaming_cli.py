"""Streaming incremental encode + CLI + plan-inspection tests."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from bids2table_spark.manifest import decode_job, read_manifest
from bids2table_spark.plans import scan_pushdown
from bids2table_spark.streaming import encode_stream
from bids2table_spark.synth import synth_transcripts

KEY = ["conv_id", "turn_idx"]


def _sorted(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf[sorted(pdf.columns)].sort_values(KEY, ignore_index=True)


def test_streaming_incremental_encode(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "enc")
    tr = synth_transcripts(spark, n_conv=120, seed=42, n_pt=3).cache()
    tr.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    q = encode_stream(spark, src, out, schema, target_group_rows=4096)
    q.awaitTermination(120)
    dec = decode_job(spark, out)
    pd.testing.assert_frame_equal(_sorted(tr), _sorted(dec))

    # restart with no new files: nothing is re-encoded
    q2 = encode_stream(spark, src, out, schema, target_group_rows=4096)
    q2.awaitTermination(120)
    m = read_manifest(spark, out).toPandas()
    assert len(m) == m[["pt", "grp"]].drop_duplicates().shape[0], "no duplicate groups"


def test_streaming_second_batch_new_data(spark, tmp_path):
    """A second micro-batch carrying NEW conversations must be fully encoded
    (round-1 bug: batch-local group labels collided with committed ones and
    the anti-join silently dropped all later batches)."""
    src = str(tmp_path / "src2")
    out = str(tmp_path / "enc2")
    full = synth_transcripts(spark, n_conv=200, seed=7, n_pt=3).cache()
    b1 = full.filter("conv_id < 'conv-000000000100'")
    b2 = full.filter("conv_id >= 'conv-000000000100'")
    b1.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    q1 = encode_stream(spark, src, out, schema, target_group_rows=4096)
    q1.awaitTermination(120)
    # new files arrive
    b2.write.mode("append").parquet(src)
    q2 = encode_stream(spark, src, out, schema, target_group_rows=4096)
    q2.awaitTermination(120)

    pd.testing.assert_frame_equal(_sorted(full), _sorted(decode_job(spark, out)))


def test_cli_roundtrip(spark, tmp_path):
    from bids2table_spark import cli

    src = str(tmp_path / "t")
    enc = str(tmp_path / "e")
    assert cli.main(["synth", "--out", src, "--n-conv", "80"]) == 0
    assert cli.main(["encode", "--input", src, "--out", enc]) == 0
    assert cli.main(["verify", "--input", src, "--encoded", enc, "--out", enc]) == 0


def test_cli_config_file(spark, tmp_path):
    """Config-composed job (reference: bids2table -c cfg composes the whole
    plan, __main__.py:34-96): flags come from JSON, codec pins override the
    selector, and the pinned codec shows up in the manifest."""
    import json as _json

    from bids2table_spark import cli
    from bids2table_spark.manifest import read_manifest

    src = str(tmp_path / "t2")
    enc = str(tmp_path / "e2")
    assert cli.main(["synth", "--out", src, "--n-conv", "60"]) == 0
    cfg = {
        "input": src,
        "out": enc,
        "group_rows": 4096,
        "codecs": {"role": "plain"},  # pin one column away from the selector
    }
    cfg_path = str(tmp_path / "job.json")
    with open(cfg_path, "w") as f:
        _json.dump(cfg, f)
    assert cli.main(["encode", "--config", cfg_path]) == 0
    m = read_manifest(spark, enc).toPandas()
    assert m["codecs"].str.contains('"role:plain"').all()
    assert cli.main(["verify", "--input", src, "--encoded", enc, "--out", enc]) == 0


def test_scan_pushdown_evidence(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = df.filter(df.l_orderkey == 5).select("l_orderkey", "l_quantity")
    info = scan_pushdown(q)
    assert info["pushed_filters"] and "l_orderkey" in info["pushed_filters"][0]
    assert "l_quantity" in (info["read_schema"] or "")
    assert "l_returnflag" not in (info["read_schema"] or ""), "column pruning"
