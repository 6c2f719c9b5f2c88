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

__all__ = [
    "stream_into_store",
    "windowed_event_counts",
    "sessionize_stream",
    "dedup_stream",
]


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


def sessionize_stream(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    gap-based sessions per user; emits a row per CLOSED session, keeps the
    open session in group state across micro-batches. This is the
    Spark-native home for operators the reference would hand-roll
    (SURVEY.md §2.J notes comet has no event-time/state machinery)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        ts = (
            pd.concat(parts)[ts_col]
            .astype("datetime64[us]")
            .astype("int64")
            .sort_values()
            .to_numpy()
        )
        if state.exists:
            start, last, count = state.get
        else:
            start, last, count = None, None, 0

        closed = []
        for t in ts:
            t = int(t)
            if start is None:
                start, last, count = t, t, 1
            elif t - last > gap_us:
                closed.append((start, last, count))
                start, last, count = t, t, 1
            else:
                last, count = t, count + 1
        state.update((start, last, count))
        if closed:
            yield pd.DataFrame(
                {
                    user_col: [key[0]] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "n_events": [c[2] for c in closed],
                }
            )

    # the key column keeps ITS OWN type — hardcoding bigint would crash
    # the first micro-batch for string user ids
    user_type = events.schema[user_col].dataType.simpleString()
    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=f"{user_col} {user_type}, session_start timestamp, "
        "session_end timestamp, n_events bigint",
        stateStructType="start bigint, last bigint, count bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str | None = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on ingest: drop re-ingested duplicate content
    by md5 hash. On a stream with ``ts_col``, uses
    ``dropDuplicatesWithinWatermark`` so the state store holds one hash per
    unique document only inside the watermark horizon — bounded state, the
    requirement for a continuously-ingesting 100 TB pipeline (an unbounded
    dropDuplicates would accrete state forever). On a batch DF (or
    ``ts_col=None``) it degrades to plain first-wins dropDuplicates —
    the batch twin the tests compare against."""
    # md5(NULL) is NULL and dropDuplicates treats NULL keys as EQUAL, so
    # distinct no-text docs would all collapse into one row. Null-text
    # rows fall back to a whole-row content key (streaming-safe, unlike
    # monotonically_increasing_id): only fully-identical rows — true
    # duplicates — still dedup. The prefix can't collide with a real
    # 32-hex digest.
    hashed = stream.withColumn(
        "content_hash",
        F.coalesce(
            F.md5(F.col(text_col).cast("binary")),
            F.concat(F.lit("null:"), F.md5(F.to_json(F.struct("*")))),
        ),
    )
    if ts_col is not None and hashed.isStreaming:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


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


def _parquet_exists(spark, path: str) -> bool:
    """True if ``path`` exists, via the Hadoop FileSystem of the path's
    scheme (so it answers correctly for hdfs:///s3a:// too, not just
    local files). Reaches through the ``_jvm``/``_jsc`` gateway — the
    standard PySpark way to touch the Hadoop FS API, but a private
    surface that pins this to the classic (non-Connect) runtime."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def hll_stream(
    stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    state_path: str,
    *,
    b: int = 6,
    checkpoint: str | None = None,
):
    """Continuous distinct-counting over a stream: each micro-batch's
    partial HLL registers merge (lossless max, sketch.hll_merge) into a
    parquet register table. State is ≤ 2^b rows per group FOREVER —
    the constant-memory way to track "distinct users/terms/urls so far"
    on a 100 TB/day firehose, where exact distinct state would grow
    without bound. Read the estimate at any time with
    ``hll_estimate(spark.read.parquet(state_path), group_cols)``.

    The merged state is collected to the driver before the overwrite —
    legitimate precisely because the sketch is constant-size (this is
    the sketch's whole point); the per-batch register computation stays
    distributed."""
    from comet_spark.operators.sketch import hll_merge, hll_registers

    def upd(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        part = hll_registers(batch, group_cols, value_col, b=b)
        # Only "no state yet" may fall back to a fresh sketch. A transient
        # read failure (corrupt file, IO error, permissions) must raise so
        # the micro-batch retries — swallowing it here would overwrite and
        # silently discard every accumulated register.
        if _parquet_exists(spark, state_path):
            merged = hll_merge(spark.read.parquet(state_path), part)
        else:
            merged = part
        rows = merged.collect()
        if rows:
            spark.createDataFrame(rows, merged.schema).repartition(1).write.mode(
                "overwrite"
            ).parquet(state_path)

    w = stream.writeStream.foreachBatch(upd).trigger(availableNow=True)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()
