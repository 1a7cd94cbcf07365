"""Structured Streaming slice (SURVEY.md §7 Phase D).

The reference is pure batch (SURVEY.md §2c: no streaming, no watermarks, no
state); this is engine extension surface. Each op here is the streaming twin
of a batch entry in ``flnr_wins_spark/plans/events.py`` — identical window
semantics, so the DuckDB oracle on the batch twin validates the shared logic,
and the streaming tests validate incremental execution (file source ->
watermark -> stateful agg -> sink).

Scale notes: all aggregations are keyed (window start and/or user_id), so
state is partitioned across executors; watermarks bound state size; file
sources scale by listing parallelism. ``availableNow`` triggers give
batch-equivalent backfills with streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """File-source stream over a parquet directory of events."""
    return spark.readStream.schema(schema or EVENTS_SCHEMA).parquet(path)


def with_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Late-data bound: rows older than max(event time) - delay are dropped
    from stateful ops; state for closed windows is evicted.

    Watermarks require TIMESTAMP (with timezone) event time — NTZ is cast
    via the session timezone (UTC in session.py), preserving wall-clock.
    """
    return events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark("ts", delay)


def tumbling_counts(events: DataFrame, size: str = "1 hour") -> DataFrame:
    """Streaming twin of plans/events.py::q_events_tumbling."""
    return (
        events.groupBy(F.window("ts", size).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_counts(events: DataFrame, size: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Streaming twin of q_events_sliding."""
    return (
        events.groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(events: DataFrame, gap: str = "15 minutes") -> DataFrame:
    """Streaming twin of q_events_sessionize (merging session windows)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def _join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str,
    watermark: str,
    how: str,
) -> DataFrame:
    """Shared body of the stream-stream joins: watermark both sides,
    suffix the right with ``_r``, and join on key + time-range. ONE copy —
    the inner and left-outer variants must never drift apart on the range
    condition or rename logic."""
    l_ = left.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    r_ = right.select([F.col(c).alias(f"{c}_r") for c in right.columns]).withColumn(
        "ts_r", F.col("ts_r").cast("timestamp")
    ).withWatermark("ts_r", watermark)
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col("ts_r") >= F.col("ts") - F.expr(f"INTERVAL {within}"))
        & (F.col("ts_r") <= F.col("ts") + F.expr(f"INTERVAL {within}"))
    )
    return l_.join(r_, cond, how)


def join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "10 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Stream-stream inner join: pair events from two streams on ``key``
    whose event times are within ``within`` of each other.

    Both sides carry a watermark plus the time-range condition — that is
    what lets Spark BOUND the join state: a buffered left row can be evicted
    once the right watermark passes its ts + within. Without the range
    condition, state grows forever; this function makes it impossible to
    omit. Left columns keep their names; right columns get ``_r``.
    """
    return _join_streams(left, right, key, within, watermark, "inner")


def join_streams_outer(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "10 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Stream-stream LEFT OUTER join with the same bounded-state contract
    as :func:`join_streams`. The semantics Spark guarantees: a left row
    emits its null-padded result only when the watermark proves no matching
    right row can still arrive — so outer results are delayed by design,
    never speculative. Same watermark + time-range requirements (they are
    what make outer emission decidable at all)."""
    return _join_streams(left, right, key, within, watermark, "leftOuter")


def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (broadcast) static dimension — the streaming twin of the engine's R4/R5
    enrich operator. No state is kept: stream-static inner/left joins are
    stateless in Structured Streaming; the dim table is re-resolvable per
    batch, so slowly-changing dimensions pick up updates on refresh."""
    return events.join(F.broadcast(dim), on, "left")


def dedup_within_watermark(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Streaming twin of q_events_dedup: drop duplicate keys, with state
    actually bounded by the watermark.

    ``dropDuplicates`` on non-event-time keys never evicts its state store —
    on an unbounded stream that is unbounded state growth (the round-1 bug
    here). ``dropDuplicatesWithinWatermark`` evicts each key once the
    watermark passes its event time + delay: exactly-one-emit per key within
    any watermark horizon; a duplicate arriving later than the delay re-emits
    by design (exact global dedup over an infinite stream is impossible with
    finite state — land the stream and run the batch ``exact_dedup`` for
    that)."""
    return events.dropDuplicatesWithinWatermark(keys or ["user_id", "event_type"])


def run_available_now(
    df: DataFrame, table_name: str, output_mode: str = "complete", timeout_s: int = 300
):
    """Drain the full backlog with streaming semantics into an in-memory
    table; returns the finished StreamingQuery. Bounded wait: a query that
    neither finishes nor fails within ``timeout_s`` is stopped and reported
    rather than hanging the caller."""
    q = (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.exception() is not None:
        raise q.exception()
    if q.isActive:
        q.stop()
        raise TimeoutError(f"streaming query {table_name} still active after {timeout_s}s")
    return q
