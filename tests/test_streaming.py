"""topic()/daemon() semantics on Structured Streaming: resume from
checkpoint delivers each row exactly once into the sink."""

import os

from pyspark.sql import functions as F

from solr_spark.streaming.topic import (
    run_daemon_once,
    run_topic_once,
    topic_stream,
    windowed_counts,
)

SCHEMA = "event_id long, event_type string, value double, ts timestamp"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_topic_checkpoint_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(1, "click", 1.0, None), (2, "view", 2.0, None)])
    stream = topic_stream(spark, src, SCHEMA, where="event_type = 'click'")
    run_topic_once(stream, out, ckpt)
    got1 = {r.event_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1}
    # publish more; a second daemon wake-up must deliver ONLY the new ones
    _write_batch(spark, src, [(3, "click", 3.0, None), (4, "error", 4.0, None)])
    stream = topic_stream(spark, src, SCHEMA, where="event_type = 'click'")
    run_topic_once(stream, out, ckpt)
    got2 = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got2 == [1, 3]


def test_daemon_foreach_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "agg")
    _write_batch(spark, src, [(i, "click", float(i), None) for i in range(10)])
    seen = []

    def batch_fn(df, epoch_id):
        df.groupBy("event_type").agg(F.sum("value").alias("s")).write.mode(
            "append"
        ).parquet(out)
        seen.append(epoch_id)

    run_daemon_once(topic_stream(spark, src, SCHEMA), batch_fn, ckpt)
    assert seen
    total = spark.read.parquet(out).agg(F.sum("s")).collect()[0][0]
    assert total == sum(range(10))


def test_windowed_counts_plan(spark, tmp_path):
    """Streaming window agg compiles and runs via availableNow."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "win")
    ckpt = str(tmp_path / "ckpt")
    import datetime

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, "click", 1.0, base + datetime.timedelta(minutes=30 * i))
        for i in range(8)
    ]
    _write_batch(spark, src, rows)
    agg = windowed_counts(
        topic_stream(spark, src, SCHEMA), "ts", "1 hour", "2 hours", ["event_type"]
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append-mode emits only windows sealed by the watermark
    got = spark.read.parquet(out) if os.listdir(out) else None
    if got is not None and got.count():
        assert {"window_start", "event_type", "cnt"} <= set(got.columns)
