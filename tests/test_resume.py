"""Resume/idempotency tests — mirrors the reference's 'second run processes
nothing' assertion (``tests/test_engine.py:43-48``) plus the interrupted-run
case the north rule requires."""

from __future__ import annotations

import pandas as pd
import pytest

from bids2table_spark.manifest import decode_job, encode_job, read_manifest
from bids2table_spark.synth import synth_transcripts

KEY = ["conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def transcripts(spark):
    return synth_transcripts(spark, n_conv=240, seed=42, n_pt=4).cache()


def _sorted(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf[sorted(pdf.columns)].sort_values(KEY, ignore_index=True)


def test_interrupt_resume_identical(spark, transcripts, tmp_path):
    out = str(tmp_path / "enc")
    r1 = encode_job(
        spark, transcripts, out, run_id="run1",
        block_rows=1024, target_group_rows=1024, max_groups=3,
    )
    assert r1["groups_encoded"] == 3
    # resume: finishes the rest, skips the committed 3
    r2 = encode_job(
        spark, transcripts, out, run_id="run2",
        block_rows=1024, target_group_rows=1024,
    )
    assert r2["groups_skipped"] == 3
    assert r2["groups_encoded"] == r1["groups_total"] - 3
    pd.testing.assert_frame_equal(_sorted(transcripts), _sorted(decode_job(spark, out)))
    # idempotent third run: nothing pending
    r3 = encode_job(spark, transcripts, out, run_id="run3",
                    block_rows=1024, target_group_rows=1024)
    assert r3["groups_encoded"] == 0
    assert r3["groups_skipped"] == r1["groups_total"]


def test_manifest_metrics(spark, transcripts, tmp_path):
    out = str(tmp_path / "enc2")
    summary = encode_job(spark, transcripts, out, run_id="r", target_group_rows=4096)
    m = read_manifest(spark, out).toPandas()
    assert (m["status"] == "committed").all()
    assert m["n_rows"].sum() == transcripts.count() == summary["n_rows"]
    assert summary["enc_bytes"] < summary["orig_bytes"]
    assert m["codecs"].str.contains("conv_id").all()
