"""Structured Streaming forms of the engine's time-series workloads.

The reference is batch-only; a complete modern engine must also run
its rollups continuously. These operators are the streaming twins of
``operators.timeseries`` / ``operators.relational``:

- ``streaming_hourly_counts`` — the hourly rollup as an incremental
  watermarked aggregation: late events within the watermark update
  their (date, hour) bucket; older ones are dropped, bounding state.
- ``streaming_user_sessions`` — gap-based sessionization as a custom
  stateful operator (``applyInPandasWithState``): per-user state holds
  (last event micros, open session count); a processing-time timeout
  flushes idle users. This is the one place the semantics genuinely
  need arbitrary state, hence the sanctioned Pandas path.

Scale notes: both operators shuffle once on their grouping key, state
is O(active keys), and the watermark bounds it. The file source used
in tests swaps for Kafka/rate in production with no operator change —
``readStream`` returns the same unbounded DataFrame abstraction.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "read_events_stream",
    "streaming_hourly_counts",
    "streaming_user_sessions",
    "streaming_exact_dedup",
    "maintain_snapshot",
    "streaming_sliding_counts",
    "streaming_enriched_counts",
    "streaming_interval_join",
    "run_to_memory",
    "streaming_session_stats",
    "replay_sessions_to_parquet",
]

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of events parquet files —
    the test/dev stand-in for a Kafka topic. Schema must be supplied
    (streaming sources don't infer)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def streaming_hourly_counts(
    events: DataFrame, watermark: str = "1 hour", type_regex: str | None = None
) -> DataFrame:
    """Incremental ``(date 'M/d', hour, cnt)`` with late-data handling:
    events later than ``watermark`` behind the max seen ts are dropped,
    so state never grows past (watermark span × buckets/hour).

    The aggregation groups on ``window(ts, '1 hour')`` — a grouping on
    derived ``month()/hour()`` expressions would strip the event-time
    metadata and leave the watermark inert (state would grow with every
    distinct (date, hour) forever); grouping on the event-time window
    keeps eviction live, and date/hour are derived from ``window.start``
    afterwards (each 1-hour window has exactly one (date, hour))."""
    out = events.withWatermark("ts", watermark)
    if type_regex:
        out = out.where(F.col("event_type").rlike(type_regex))
    return (
        out.groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.concat(
                F.month("win.start").cast("string"),
                F.lit("/"),
                F.dayofmonth("win.start").cast("string"),
            ).alias("date"),
            F.hour("win.start").alias("hour"),
            "cnt",
        )
    )


_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
_SESSION_OUT_SCHEMA = (
    "user_id long, n_sessions long, n_events long"
)


def streaming_user_sessions(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Stateful gap-sessionization: per user, a new session starts when
    the gap from the previous event exceeds ``gap_minutes``. Emits the
    running ``(user_id, n_sessions, n_events)`` per micro-batch.

    State per key is three longs; ``applyInPandasWithState`` receives
    each user's micro-batch rows as Arrow batches in arbitrary order,
    so the batch is sorted by ts before folding — exact parity with
    the batch operator when each micro-batch is time-complete (events
    spanning two micro-batches out of order need a watermark + sort
    buffer upstream, as in any streaming sessionizer).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    import pandas as pd

    def update(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            last_us, n_sessions, n_events = state.get
        else:
            last_us, n_sessions, n_events = None, 0, 0
        ts_all = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
        for ts in ts_all:
            us = int(ts.value) // 1000  # pandas ns -> micros
            if last_us is None or us - last_us > gap_us:
                n_sessions += 1
            last_us = us
            n_events += 1
        state.update((last_us, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_exact_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key streaming dedup: each key's first arrival
    is emitted, later duplicates arriving within the watermark are
    dropped. ``dropDuplicatesWithinWatermark`` keeps one state entry
    per key seen within the watermark span and EVICTS it afterwards —
    the bounded-state form (plain streaming ``dropDuplicates`` state
    grows with every key forever, a 100 TB non-starter). The dedup key
    for an at-least-once source is the event id; content dedup swaps in
    a digest column."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def maintain_snapshot(
    stream: DataFrame,
    path: str,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    tiebreak: str | None = None,
):
    """Incrementally maintain a latest-per-key parquet snapshot from a
    stream — the ``foreachBatch`` upsert-to-storage pattern: each
    micro-batch is merged with the snapshot at rest through the SAME
    batch ``temporal.latest_snapshot`` operator, and the result
    replaces the snapshot atomically-enough for a single writer
    (checkpoint-then-overwrite; a lakehouse table format would make
    this a real MERGE, the operator seam is identical).

    Scale: each merge is one key-shuffle of (snapshot + batch) — the
    snapshot side re-reads from parquet each batch, which is the
    no-table-format cost; with Delta/Iceberg the same ``upsert``
    callback body becomes ``MERGE INTO`` and touches only matched
    files. State lives entirely at rest; the stream holds none.

    r15: each batch is ONE Spark action — the merge writes to a
    sibling temp directory (so the plan can stream straight from the
    old snapshot files) and the directories are swapped with
    metadata-only filesystem ops. The previous shape materialized the
    merge through an extra eager ``localCheckpoint`` action per batch
    purely so the overwrite-in-place would not clobber its own input.

    r16: the swap goes through the Hadoop ``FileSystem`` API resolved
    from the snapshot path's scheme (HDFS/S3A/ABFS/file:), not POSIX
    ``os.replace`` — and it is crash-recoverable: the current snapshot
    is renamed ASIDE (``<path>__prev``) before the new one is promoted,
    and a batch that starts with the snapshot missing but the aside
    present (a crash landed between the two renames) restores the
    aside instead of silently restarting from an empty snapshot.
    Object stores without atomic rename pay a copy for the aside step;
    a lakehouse table format replaces this whole dance with MERGE, as
    the docstring's first paragraph notes.
    """
    from pyspark.errors import AnalysisException

    from ..operators.temporal import latest_snapshot

    def _fs_and_path(spark, p: str):
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath

    def _rename_or_raise(fs, src, dst) -> None:
        if not fs.rename(src, dst):  # Hadoop rename reports, not raises
            raise IOError(f"snapshot swap failed: rename {src} -> {dst}")

    prev = f"{path}__prev"

    def upsert(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, dst = _fs_and_path(spark, path)
        _, aside = _fs_and_path(spark, prev)
        if not fs.exists(dst) and fs.exists(aside):
            # a crash landed between rename-aside and promote: the
            # aside copy IS the snapshot — restore it
            _rename_or_raise(fs, aside, dst)
        try:
            existing = spark.read.parquet(path)
        except AnalysisException:
            existing = spark.createDataFrame([], batch_df.schema)
        merged = latest_snapshot(
            existing.unionByName(batch_df), keys=keys, ts_col=ts_col, tiebreak=tiebreak
        )
        # write to a temp dir (the ONE action — it reads the old
        # snapshot files directly), then swap directories
        tmp = f"{path}__merge_tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        _, tmp_p = _fs_and_path(spark, tmp)
        fs.delete(aside, True)  # stale aside from an earlier batch
        if fs.exists(dst):
            _rename_or_raise(fs, dst, aside)
        _rename_or_raise(fs, tmp_p, dst)
        fs.delete(aside, True)

    # multi-batch replay is controlled by the caller's readStream
    # options (e.g. maxFilesPerTrigger) — the merge body is per-batch
    q = (
        stream.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_sliding_counts(
    events: DataFrame,
    duration: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Overlapping (sliding) event-time windows: each event lands in
    ``duration/slide`` windows, counts update incrementally, and the
    watermark evicts windows older than the lateness bound — the
    tumbling rollup's overlapping sibling, same bounded-state story
    with a constant-factor more rows in flight.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration, slide).alias("win"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm").alias("win_start"),
            "cnt",
        )
    )


def streaming_enriched_counts(
    events: DataFrame, dim: DataFrame, on: str = "user_id", tier_col: str = "tier"
) -> DataFrame:
    """Stream-static enrichment: the unbounded event stream joins a
    bounded dimension table (re-read per micro-batch, broadcast when
    small), then aggregates per tier in complete mode — the standard
    "enrich the firehose with a slowly-changing dim" topology. State
    is O(tiers); the dim never enters the state store.
    """
    return (
        events.join(F.broadcast(dim), on)
        .groupBy(tier_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("total_value"),
        )
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-STREAM interval join — attribution's core topology: for
    every left event (e.g. a click), every right event (e.g. a
    purchase) by the same key whose event time falls in
    ``[left_ts, left_ts + within]``. Both sides are unbounded, so
    this is the one join shape where BOTH inputs enter the state
    store.

    State stays bounded because both sides carry a watermark AND the
    join condition bounds event-time distance in both directions:
    Spark can evict a buffered left row once the watermark passes
    ``left_ts + within`` (no future right row can match it), and a
    right row once the watermark passes ``right_ts`` (its left
    partners must precede it). Without the time-range condition the
    state store grows without bound — the reason this operator bakes
    the interval into the join predicate rather than filtering after.

    Append output mode only (matches arrive exactly once, when both
    sides are present) — same result as the batch interval join the
    oracle replays.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return l.join(r, cond, "inner")


def run_to_memory(stream: DataFrame, name: str, output_mode: str = "update"):
    """Drain every available input into an in-memory table and stop —
    the batch-replay harness used by tests (`trigger(availableNow)`).
    Returns the StreamingQuery (already awaited)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def replay_sessions_to_parquet(
    spark: SparkSession,
    events: DataFrame,
    root: str,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> str:
    """Drain ``streaming_session_stats`` over a bounded event frame in
    ONE ``availableNow`` run and return the output parquet path.

    Session windows forbid update mode, and in append mode a session is
    emitted only once the watermark passes its end — where the watermark
    used by micro-batch N is the one computed from batch N-1. A bounded
    replay therefore needs batches AFTER the data. The round-6 harness
    got them by RESTARTING the stream twice over a shared checkpoint
    (~5-8 s of stream-start latency each); this version gets the same
    batch sequence inside a single run:

    - the real events are staged as ONE parquet file (one file = one
      micro-batch, so no event can land behind an already-advanced
      watermark and be dropped as late),
    - two far-future sentinel rows (user_id -1, +30 d and +60 d past
      the real max) are staged as separate files whose mtimes are
      forced 100 s apart with ``os.utime`` — the file source orders
      batches by modification time, so the order is deterministic even
      on coarse-mtime filesystems,
    - ``maxFilesPerTrigger=1`` splits the one ``availableNow`` run into
      exactly three micro-batches: batch 0 reads the real events
      (watermark at epoch, nothing emitted), batch 1 reads sentinel A
      (emitting with watermark = real max - 1 h, then advancing it to
      A - 1 h, past every real session end), batch 2 reads sentinel B
      (flushing the rest). One stream start instead of two.

    Callers filter ``user_id != -1`` to drop the sentinels.
    """
    import os
    from datetime import timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    src, out, ckpt = f"{root}/in", f"{root}/out", f"{root}/ckpt"
    ev = events.select("ts", "user_id", "value")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    max_ts = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
    real = [
        f"{src}/{f}" for f in os.listdir(src)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    t0 = max(os.path.getmtime(f) for f in real)
    for i, days in enumerate((30, 60), start=1):
        sentinel = pa.table({
            "ts": pa.array([max_ts + timedelta(days=days)], pa.timestamp("us")),
            "user_id": pa.array([-1], pa.int64()),
            "value": pa.array([0.0], pa.float64()),
        })
        path = f"{src}/sentinel-{i}.parquet"
        pq.write_table(sentinel, path)
        os.utime(path, (t0 + 100 * i, t0 + 100 * i))

    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_session_stats(stream, gap_minutes, watermark)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda b, i: b.write.mode("append").parquet(out))
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False on timeout WITHOUT
    # raising — swallowing that would cache a half-written parquet and
    # turn a hang into a silent wrong-rows failure downstream
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "session replay did not finish its availableNow run within "
            "300s; output parquet is incomplete"
        )
    return out


def streaming_session_stats(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Per-session statistics on the STREAM via the native dynamic-gap
    ``session_window`` — the streaming proof of the batch operator\'s
    claim (operators/relational.py ``session_stats``: "the same API
    runs unchanged under readStream with a watermark"). Two events
    within ``gap_minutes`` merge into one growing session; the
    watermark closes sessions once no extension can arrive, bounding
    state to sessions still open within the lateness horizon.

    Output schema matches the batch operator exactly, so a full
    replay must agree with the batch oracle row-for-row — the
    batch/stream consistency contract.
    """
    sw = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(sw.alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
