"""Streaming sinks via ``foreachBatch``.

Structured Streaming's file sink is append-only; production pipelines that
re-process (backfill, checkpoint reset, at-least-once sources) need an
IDEMPOTENT sink or they duplicate data. ``partitioned_overwrite_sink``
writes each micro-batch under its user partitions PLUS a ``_batch_id``
sub-partition, with dynamic partition overwrite scoped to the write:

  * replaying batch N (failure recovery, checkpoint reset over the same
    input) overwrites exactly batch N's own sub-partitions — idempotent;
  * a later batch touching the same user partition lands in a NEW
    ``_batch_id`` sub-partition — earlier batches' rows are never clobbered
    (plain per-partition dynamic overwrite gets this wrong: any partition
    value spanning two micro-batches would lose the earlier batch's rows).

Readers see an extra ``_batch_id`` column; drop it on read or treat it as
lineage metadata. (Delta/Iceberg MERGE is the transactional upgrade; this is
the vanilla-parquet equivalent.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def partitioned_overwrite_sink(
    stream: DataFrame,
    path: str,
    partition_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Write a stream to partitioned parquet, idempotently per micro-batch.

    Scale notes: partition columns must be low-cardinality derivations of
    event time (date/hour), never raw keys — one directory per value. The
    overwrite mode is passed as a WRITE option, not session conf, so other
    writers in the session keep default static-overwrite semantics.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols, "_batch_id")
            .parquet(path)
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
