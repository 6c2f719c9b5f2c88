"""Structured Streaming ingest into a DocumentStore (J1-J3).

The reference's write path is a size-triggered memtable rotation + flush
worker (``storage.go:632-819``); in Spark the micro-batch boundary *is* the
rotation, and ``foreachBatch`` appending one segment per batch is the flush.
Watermark + windowed aggregation utilities cover the event-time side the
reference lacks (SURVEY.md §2.J notes comet has no event-time semantics —
these are the Spark-native extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from comet_spark.storage.store import DocumentStore

__all__ = ["stream_into_store", "windowed_event_counts"]


def stream_into_store(
    stream: DataFrame,
    store: DocumentStore,
    *,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch → one immutable segment per micro-batch."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        store.append(batch)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts — works on a stream or a batch DF
    (same plan; the batch twin is what the oracle checks)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), key_col, "n_events")
    )
