"""Streaming sinks via ``foreachBatch``.

Structured Streaming's file sink is append-only; production pipelines that
re-process (backfill, checkpoint reset, at-least-once sources) need an
IDEMPOTENT sink or they duplicate data. ``partitioned_overwrite_sink``
implements the standard recipe: dynamic partition overwrite inside
``foreachBatch`` — each micro-batch replaces exactly the partitions it
touches, so replaying a batch converges to the same files instead of
appending copies. (Delta/Iceberg MERGE is the transactional upgrade; the
dynamic-overwrite pattern is the vanilla-parquet equivalent.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def partitioned_overwrite_sink(
    stream: DataFrame,
    path: str,
    partition_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Write a stream to partitioned parquet, idempotently per partition.

    Scale notes: partition columns must be low-cardinality derivations of
    event time (date/hour), never raw keys — one directory per value. The
    per-batch write is a normal distributed parquet job; only partitions
    present in the batch are rewritten (``partitionOverwriteMode=dynamic``).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.sparkSession.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
        )
        (
            batch_df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
