"""Incremental encode via Structured Streaming.

The reference is batch-only (SURVEY.md §2.8); its incremental story is the
processed-log anti-join.  At 10^12-turn scale new transcript partitions land
continuously, so we also expose the same encode as a streaming job:
``readStream`` over the input directory -> ``foreachBatch`` running the
resumable :func:`bids2table_spark.manifest.encode_job`.  The manifest
anti-join makes every micro-batch idempotent, so exactly-once falls out of
the same mechanism the batch job uses — checkpoints only bound re-reads.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..manifest import encode_job


def encode_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    schema,
    checkpoint: str | None = None,
    plan: dict[str, str] | None = None,
    available_now: bool = True,
    **encode_kwargs,
):
    """Start a streaming encode of parquet files arriving under input_path.

    With ``available_now`` the query drains existing input and stops — the
    batch-driven smoke mode; in production the same query runs continuously.
    Returns the StreamingQuery.
    """
    stream = spark.readStream.schema(schema).parquet(input_path)

    def sink(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # group labels are epoch-scoped: a NEW micro-batch's groups can never
        # collide with labels committed by an earlier batch (same-epoch replay
        # after a crash still dedups via the manifest anti-join), and the
        # epoch's salt plan is persisted under the same scope so a replay on
        # a different-sized cluster keeps identical labels.
        summary = encode_job(
            spark,
            batch_df,
            out_dir,
            run_id=f"stream-{epoch_id:08d}",
            group_prefix=f"e{epoch_id:08d}-",
            plan=plan,
            **encode_kwargs,
        )
        # encode_job isolates failed groups (manifest status='failed') and
        # returns instead of raising — right for batch, WRONG to let a
        # micro-batch checkpoint past: the next epoch's group universe
        # excludes this epoch's labels, so unraised failures would never be
        # retried (silent loss).  Raising fails the batch; Spark replays it
        # and the manifest anti-join skips the groups that did commit.
        if summary["groups_failed"]:
            raise RuntimeError(
                f"epoch {epoch_id}: {summary['groups_failed']} group(s) failed "
                f"to encode (see manifest status='failed' under {out_dir}); "
                "failing the batch so the stream retries it"
            )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint or f"{out_dir.rstrip('/')}/_checkpoint"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts_stream(
    spark: SparkSession,
    input_path: str,
    schema,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_dur: str = "1 hour",
    delay: str = "10 minutes",
    query_name: str = "b2t_windowed",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Watermarked tumbling-window aggregation — the late-data pattern.

    ``withWatermark(ts, delay)`` bounds state: events arriving more than
    ``delay`` behind the max seen event time are dropped, and in append
    mode a window emits exactly once, when the watermark passes its end
    (the trailing window(s) stay withheld — deterministically absent from
    the output given deterministic input).  State size is O(open windows x
    keys) regardless of stream length — the property that makes this run
    forever at 10^12-turn scale where a batch groupBy cannot.
    """
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    agg = (
        stream.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window_dur).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
    )
    writer = (
        agg.writeStream.outputMode("append").format("memory").queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


SESSION_OUT_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_DDL = "sess_start timestamp, last_ts timestamp, n long"


def sessionize_stream(
    spark: SparkSession,
    input_path: str,
    schema,
    gap_minutes: int = 30,
    max_files_per_trigger: int | None = None,
):
    """Custom stateful streaming sessionization via ``applyInPandasWithState``.

    Per-user state = the OPEN session (start, last event, count).  A session
    completes — and emits, exactly once — when a later event arrives more
    than ``gap_minutes`` after its last event; the final open session stays
    in state (withheld, like an unclosed window).  State is O(users), not
    O(events): the property a batch sessionize (global window over all
    history) cannot offer on an unbounded stream.

    In-batch gap detection is vectorized (numpy diff over the sorted batch);
    python touches only the per-batch boundary bookkeeping.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap = np.timedelta64(gap_minutes * 60, "s")

    def fn(key, pdfs, state):
        (uid,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], ignore_index=True)
        ts = rows["ts"].to_numpy(dtype="datetime64[ns]")
        if state.exists:
            sess_start, last_ts, n = state.get
            sess_start = np.datetime64(sess_start, "ns")
            last_ts = np.datetime64(last_ts, "ns")
        else:
            sess_start, last_ts, n = ts[0], ts[0], 0  # n=0: first row counts below
        # boundary before row i  <=>  gap exceeded vs previous event
        prev = np.concatenate(([last_ts], ts[:-1]))
        is_new = (ts - prev) > gap
        if n == 0:
            is_new[0] = False  # fresh state: row 0 opens the carried session
        out = []
        for i in np.flatnonzero(is_new).tolist():  # sessions in this batch: few
            out.append((uid, sess_start, prev[i] if i else last_ts, int(n + i)))
            n = -i  # so n + next boundary = count since this one
            sess_start = ts[i]
        sess_end = ts[-1]
        state.update((pd.Timestamp(sess_start), pd.Timestamp(sess_end), int(n + len(ts))))
        yield pd.DataFrame(
            out, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    stream_reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        stream_reader = stream_reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = stream_reader.parquet(input_path)
    return stream.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_OUT_DDL, SESSION_STATE_DDL, "append", GroupStateTimeout.NoTimeout
    )
