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


def test_cli_backfill_and_vacuum(spark, tmp_path):
    """spark-submit surface for schema evolution: encode at a narrow schema,
    re-encode with --on-new-columns backfill after the input grew a column,
    vacuum the superseded run via the CLI, and verify bit-identity."""
    from bids2table_spark import cli

    src_full = str(tmp_path / "full")
    src_narrow = str(tmp_path / "narrow")
    enc = str(tmp_path / "enc")
    assert cli.main(["synth", "--out", src_full, "--n-conv", "80"]) == 0
    spark.read.parquet(src_full).drop("tool").write.partitionBy("pt").parquet(src_narrow)
    assert cli.main(["encode", "--input", src_narrow, "--out", enc,
                     "--run-id", "n1"]) == 0
    # resume at the grown schema: default errors loud, backfill rewrites
    assert cli.main(["encode", "--input", src_full, "--out", enc,
                     "--run-id", "w1", "--on-new-columns", "backfill"]) == 0
    out = json.loads(_run_cli_capture(["vacuum", "--input", enc]))
    assert out["runs_deleted"] == 1  # n1 fully superseded by the backfill
    assert cli.main(["verify", "--input", src_full, "--encoded", enc]) == 0


def _run_cli_capture(args):
    import contextlib
    import io

    from bids2table_spark import cli

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(args) == 0
    return buf.getvalue().strip().splitlines()[-1]


def test_scan_pushdown_evidence(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = df.filter(df.l_orderkey == 5).select("l_orderkey", "l_quantity")
    info = scan_pushdown(q)
    assert info["pushed_filters"] and "l_orderkey" in info["pushed_filters"][0]
    assert "l_quantity" in (info["read_schema"] or "")
    assert "l_returnflag" not in (info["read_schema"] or ""), "column pruning"


def test_windowed_stream_late_data_semantics(spark, tmp_path):
    """Watermark semantics (documented Spark contract): a late row that
    arrives while its window's state is STILL LIVE merges into the
    aggregate (the watermark guarantees minimum retention, not eager
    dropping); once the watermark passes a window's end the window emits
    EXACTLY ONCE (append mode never updates it), and a later-still row for
    it is guaranteed dropped; the trailing open window is withheld."""
    import datetime as dt
    import time as time_mod

    from bids2table_spark.streaming import windowed_counts_stream

    src = str(tmp_path / "src")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows1 = [  # hours 0..3; max ts 03:30 -> watermark 03:20 after batch 0
        (i, "a", base + dt.timedelta(minutes=m))
        for i, m in enumerate([10, 20, 70, 80, 130, 190, 210])
    ]
    df1 = spark.createDataFrame(rows1, "event_id long, event_type string, ts timestamp")
    df1.coalesce(1).write.mode("append").parquet(src)
    time_mod.sleep(1.1)  # distinct mtimes: file order = batch order
    rows2 = [  # late row for hour 0 — state still live in batch 1 -> merges
        (100, "a", base + dt.timedelta(minutes=15)),
        (101, "a", base + dt.timedelta(minutes=215)),
    ]
    df2 = spark.createDataFrame(rows2, "event_id long, event_type string, ts timestamp")
    df2.coalesce(1).write.mode("append").parquet(src)
    time_mod.sleep(1.1)
    rows3 = [  # hour-0 row AFTER eviction -> guaranteed dropped (no re-emit)
        (200, "a", base + dt.timedelta(minutes=25)),
        (201, "a", base + dt.timedelta(minutes=220)),
    ]
    df3 = spark.createDataFrame(rows3, "event_id long, event_type string, ts timestamp")
    df3.coalesce(1).write.mode("append").parquet(src)

    q = windowed_counts_stream(
        spark, src, schema=df1.schema, query_name="b2t_late_test",
        window_dur="1 hour", delay="10 minutes", max_files_per_trigger=1,
    )
    q.awaitTermination(600)
    rows = spark.table("b2t_late_test").collect()
    got = {(r["w"]["start"].hour, r["n"]) for r in rows}
    # hour 0: 2 on-time + 1 still-live late merge = 3 (row id=200 dropped
    # after eviction — count stays 3 and the window appears exactly once);
    # hour 3 (trailing, still open at drain end) withheld
    assert got == {(0, 3), (1, 2), (2, 1)}, got
    assert len(rows) == len(got)  # append mode: one emission per window


def test_sessionize_stream_state_carries_across_batches(spark, tmp_path):
    """A session split across micro-batches must stitch through the carried
    state (no per-batch session fragmentation), and only sessions CLOSED by
    a later event emit — each user's final open session stays in state."""
    import datetime as dt
    import time as time_mod

    from bids2table_spark.streaming import sessionize_stream

    src = str(tmp_path / "src")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda eid, uid, m: (eid, uid, base + dt.timedelta(minutes=m))
    # batch 1: user 1 session A (0, 10); user 2 session (5)
    df1 = spark.createDataFrame(
        [mk(1, 1, 0), mk(2, 1, 10), mk(3, 2, 5)],
        "event_id long, user_id long, ts timestamp",
    )
    df1.coalesce(1).write.mode("append").parquet(src)
    time_mod.sleep(1.1)
    # batch 2: user 1 ts=25 CONTINUES session A (gap 15 < 30); ts=90 closes
    # it and opens session B (withheld); user 2 ts=100 closes their first
    df2 = spark.createDataFrame(
        [mk(4, 1, 25), mk(5, 1, 90), mk(6, 2, 100)],
        "event_id long, user_id long, ts timestamp",
    )
    df2.coalesce(1).write.mode("append").parquet(src)

    agg = sessionize_stream(
        spark, src, schema=df1.schema, max_files_per_trigger=1
    )
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName("b2t_ssess_test").trigger(availableNow=True).start()
    )
    q.awaitTermination(600)
    got = {
        (r["user_id"], r["session_start"].minute, r["session_end"].minute, r["n_events"])
        for r in spark.table("b2t_ssess_test").collect()
    }
    assert got == {
        (1, 0, 25, 3),   # session A stitched across batches: 0,10,25
        (2, 5, 5, 1),    # user 2's first session closed by ts=100
    }, got


def test_spark_submit_py_files_zip(tmp_path):
    """The actual shipping contract (north rule: spark-submit --py-files):
    zip the package, run synth -> encode -> verify as REAL spark-submit
    subprocesses from a foreign cwd — the zip must supply every module."""
    import os
    import shutil
    import subprocess

    zip_path = shutil.make_archive(
        str(tmp_path / "b2t_spark"), "zip",
        root_dir="/root/repo", base_dir="bids2table_spark",
    )
    cli_py = str(tmp_path / "cli.py")
    shutil.copyfile("/root/repo/bids2table_spark/cli.py", cli_py)
    src, enc = str(tmp_path / "src"), str(tmp_path / "enc")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")

    def submit(*args):
        return subprocess.run(
            ["spark-submit", "--master", "local[4]", "--py-files", zip_path,
             cli_py, *args],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=240,
        )

    r = submit("synth", "--out", src, "--n-conv", "60")
    assert r.returncode == 0, r.stderr[-2000:]
    r = submit("encode", "--input", src, "--out", enc, "--group-rows", "4096")
    assert r.returncode == 0, r.stderr[-2000:]
    r = submit("verify", "--input", src, "--encoded", enc, "--out", enc)
    assert r.returncode == 0, r.stderr[-2000:]


def test_streaming_failed_group_fails_batch(spark, tmp_path):
    """A micro-batch with failed groups must FAIL (so Spark retries it) —
    checkpointing past an unraised failure would lose those rows forever
    (the next epoch's group universe excludes this epoch's labels)."""
    src = str(tmp_path / "src_f")
    out = str(tmp_path / "enc_f")
    tr = synth_transcripts(spark, n_conv=60, seed=42, n_pt=2).cache()
    tr.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    q = encode_stream(
        spark, src, out, schema, target_group_rows=4096,
        plan={"pt-0001/text": "no_such_codec"},
    )
    import pyspark.errors

    with pytest.raises(Exception, match="failed"):
        q.awaitTermination(120)
        q.stop()
    # retry with a sane plan from the same checkpoint: batch replays,
    # committed groups are skipped, the failed ones encode
    q2 = encode_stream(spark, src, out, schema, target_group_rows=4096)
    q2.awaitTermination(120)
    dec = decode_job(spark, out)
    pd.testing.assert_frame_equal(_sorted(tr), _sorted(dec))


def test_cli_flag_beats_config(spark, tmp_path):
    """An explicit CLI flag must override the config file (fill-only-when-
    unset precedence, matching input/out/run_id)."""
    import json as _json

    from bids2table_spark.cli import main
    from bids2table_spark.manifest import read_manifest

    src = str(tmp_path / "src")
    synth_transcripts(spark, n_conv=40, seed=42, n_pt=2).write.parquet(src)
    cfg = {"input": src, "out": str(tmp_path / "enc"), "group_rows": 262144}
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fh:
        _json.dump(cfg, fh)
    rc = main(["encode", "--config", cfg_path, "--group-rows", "128",
               "--run-id", "cfgtest"])
    assert rc == 0
    m = read_manifest(spark, cfg["out"]).toPandas()
    # 40 convs x ~20 turns at group_rows=512 must salt into >1 group per pt;
    # the config's 262144 would have produced exactly 1 per pt
    assert m.groupby("pt")["grp"].nunique().min() > 1


def test_cli_verify_without_out(spark, tmp_path):
    """The documented `verify --input ... --encoded ...` invocation (no
    --out) must work."""
    from bids2table_spark.cli import main

    src = str(tmp_path / "src")
    out = str(tmp_path / "enc")
    synth_transcripts(spark, n_conv=30, seed=42, n_pt=2).write.parquet(src)
    assert main(["encode", "--input", src, "--out", out]) == 0
    assert main(["verify", "--input", src, "--encoded", out]) == 0


def test_cli_compact_snapshots_asof(spark, tmp_path, capsys):
    """CLI surface for the round-5 lifecycle: encode two appends via
    group-prefixed runs, `snapshots` lists both commits, `compact` bin-packs
    the small groups, `decode --as-of` writes the first batch only."""
    import json

    import pyspark.sql.functions as F

    from bids2table_spark import cli

    src = str(tmp_path / "src")
    enc = str(tmp_path / "enc")
    assert cli.main(["synth", "--out", src, "--n-conv", "80"]) == 0
    full = spark.read.parquet(src)
    uid = F.regexp_extract("conv_id", r"conv-0*(\d+)", 1).cast("long")
    a = full.filter(uid % 2 == 0)
    b = full.filter(uid % 2 == 1)
    a.write.mode("overwrite").parquet(str(tmp_path / "a"))
    b.write.mode("overwrite").parquet(str(tmp_path / "b"))
    # encode_job directly for prefixes (the CLI encodes one run per call)
    from bids2table_spark import encode_job

    encode_job(spark, a, enc, run_id="s1", group_prefix="a:",
               target_group_rows=4096)
    encode_job(spark, b, enc, run_id="s2", group_prefix="b:",
               target_group_rows=4096)
    capsys.readouterr()
    assert cli.main(["snapshots", "--input", enc]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [x["run_id"] for x in lines] == ["s1", "s2"]
    assert cli.main(["compact", "--input", enc, "--group-rows", "65536"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["groups_compacted"] >= 2
    dec_dir = str(tmp_path / "asof")
    assert cli.main(["decode", "--input", enc, "--out", dec_dir,
                     "--as-of", "s1"]) == 0
    got = spark.read.parquet(dec_dir)
    assert got.count() == a.count()
    assert got.join(a, on=["conv_id", "turn_idx"], how="left_anti").count() == 0
