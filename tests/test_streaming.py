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


def test_sessionize_batch_vs_duckdb(spark, sf_dir):
    import duckdb

    from solr_spark.streaming.sessions import sessionize, sessionize_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = sessionize(ev, gap_minutes=45).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.execute(sessionize_sql(gap_minutes=45)).fetchall()
    assert len(got) == len(want)
    g = [(r["user_id"], r["session_id"], r["n_events"], r["sum_value"]) for r in got]
    w = [(r[0], r[1], r[2], r[5]) for r in want]
    assert g == w


def test_sessionize_stream_event_time_timeout(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions emit when the
    watermark passes their gap timeout; per-key state is four scalars."""
    import time

    from solr_spark.streaming.sessions import SESSION_SCHEMA, sessionize_stream

    t0 = 1_600_000_000  # fixed epoch seconds
    rows1 = [
        (1, t0, 10.0), (1, t0 + 60, 5.0),          # session A (2 events)
        (1, t0 + 3 * 3600, 7.0),                    # session B (1 event)
    ]
    rows2 = [(99, t0 + 10 * 3600, 0.0)]             # clock: advance watermark
    rows3 = [(99, t0 + 11 * 3600, 0.0)]             # clock 2: fire session B
    src = tmp_path / "src"
    src.mkdir()

    def write(name, rows):
        spark.createDataFrame(
            [(u, t, v) for u, t, v in rows], "user_id long, es long, value double"
        ).selectExpr(
            "user_id", "cast(es as timestamp) ts", "value"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    write("b1", rows1)
    write("b2", rows2)
    write("b3", rows3)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert (1, 2, 15.0) in got          # session A emitted (timeout)
    assert (1, 1, 7.0) in got           # session B emitted after clock 2
    # clock 1's session emits IN-STREAM when clock 2 arrives (gap break
    # inside the key's own event stream); clock 2's session stays open
    assert (99, 1, 0.0) in got and len(got) == 3
