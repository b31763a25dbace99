"""Incremental pub-sub and background daemons on Structured Streaming.

Reference surface:
- topic(): at-least-once delivery of NEW matching documents using
  `_version_` checkpoints stored in a checkpoint collection
  (solrj/src/java/org/apache/solr/client/solrj/io/stream/TopicStream.java:71-96,
  `checkpointEvery`) -> a Structured Streaming file source with a
  checkpointLocation: offsets checkpointing gives the same resume-where-
  you-left-off contract, exactly-once into the sink.
- daemon(runInterval): run a stream expression repeatedly in the
  background (io/stream/DaemonStream.java:51-62) -> a writeStream with a
  processingTime (or availableNow) trigger.
- update()/commit() sinks (UpdateStream.java:50, CommitStream.java:44)
  -> foreachBatch append into a table directory; each micro-batch commit
  is the soft-commit analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def topic_stream(
    spark: SparkSession,
    input_dir: str,
    schema: StructType | str,
    where: str | None = None,
) -> DataFrame:
    """readStream over a growing directory of parquet files; `where` is
    the topic's query (only matching new docs are delivered)."""
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    return s.where(where) if where else s


def run_topic_once(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain everything not yet checkpointed into the output table and
    stop (Trigger.AvailableNow) — one daemon wake-up."""
    q = (
        stream.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_daemon_once(
    stream: DataFrame,
    batch_fn,
    checkpoint_dir: str,
) -> None:
    """daemon(): run an arbitrary per-batch transformation (foreachBatch)
    over all new data, then stop."""
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_daemon(
    stream: DataFrame,
    batch_fn,
    checkpoint_dir: str,
    interval: str = "1 second",
    iterations: int | None = None,
    timeout_s: float | None = None,
):
    """daemon(runInterval): the RESIDENT form — a continuous
    foreachBatch query on a processingTime trigger, the direct analogue
    of DaemonStream's wake-every-interval loop (io/stream/
    DaemonStream.java:51-62; run_daemon_once above is the one-shot
    drain). Stops after `iterations` non-empty batches or `timeout_s`
    seconds (whichever comes first; both None = caller manages the
    returned query). Returns the StreamingQuery."""
    import threading
    import time as _time

    done = threading.Event()
    seen = {"n": 0}

    def counted(batch_df, batch_id):
        batch_fn(batch_df, batch_id)
        if batch_df.take(1):
            seen["n"] += 1
            if iterations is not None and seen["n"] >= iterations:
                done.set()

    q = (
        stream.writeStream.foreachBatch(counted)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=interval)
        .start()
    )
    if iterations is None and timeout_s is None:
        return q
    deadline = _time.time() + (timeout_s or 3600.0)
    while _time.time() < deadline and not done.is_set() and q.isActive:
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    return q


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Streaming timeseries(): watermarked tumbling-window counts —
    the streaming analogue of TimeSeriesStream.java:56 with late-data
    handling Solr lacks."""
    g = [F.window(F.col(ts_col), window).alias("w")] + [
        F.col(k) for k in (keys or [])
    ]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*g)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            *[F.col(k) for k in (keys or [])],
            "cnt",
        )
    )
