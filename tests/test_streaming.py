"""Structured Streaming tests (SURVEY §5.2 item 5): each streaming
operator drained with availableNow/processAllAvailable and compared to
its batch equivalent on the same data.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from diachronic_spark.catalog import load
from diachronic_spark.streaming.events import (
    read_event_stream,
    session_counts,
    streaming_first_per_day,
    threshold_scan_stream,
    tumbling_counts,
    write_parquet_stream,
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """Events table rewritten as a 4-file parquet directory (a real
    multi-file stream source), ordered by ts within files."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, sf_dir, "events").orderBy("ts").repartitionByRange(
        4, "ts"
    ).write.mode("overwrite").parquet(d)
    return d


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_streaming_tumbling_equals_batch(spark, sf_dir, stream_dir):
    stream = tumbling_counts(read_event_stream(spark, stream_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling")
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.sql("select * from tumbling").collect()
    }
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    want = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in batch.collect()
    }
    # watermark may hold back the final windows in append mode; all
    # emitted windows must match the batch result exactly
    assert got
    assert all(want.get(k) == v for k, v in got.items())


def test_streaming_sessions_equal_batch_counts(spark, sf_dir, stream_dir):
    stream = session_counts(read_event_stream(spark, stream_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = spark.sql(
        "select user_id, count(*) n from sessions group by user_id"
    ).collect()
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "5 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r["user_id"]: r["n"] for r in batch.collect()}
    gotd = {r["user_id"]: r["n"] for r in got}
    assert gotd  # emitted sessions...
    assert all(want.get(u) >= n for u, n in gotd.items())


def test_streaming_dedup_keys_match_batch(spark, sf_dir, stream_dir):
    stream = streaming_first_per_day(read_event_stream(spark, stream_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = spark.sql("select user_id, event_date from dedup").collect()
    keys = {(r["user_id"], str(r["event_date"])) for r in got}
    batch = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("event_date"))
        .distinct()
    )
    want = {(r["user_id"], str(r["event_date"])) for r in batch.collect()}
    assert keys == want
    assert len(got) == len(keys)  # at most one per key


def test_threshold_scan_stream_matches_sequential_spec(spark, sf_dir, stream_dir):
    epoch = dt.datetime(2024, 1, 1)
    stream = threshold_scan_stream(read_event_stream(spark, stream_dir), epoch)
    q = (
        stream.writeStream.format("memory")
        .queryName("scan")
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = {
        (r["user_id"], r["event_id"])
        for r in spark.sql("select * from scan").collect()
    }
    # sequential spec per user over ts-ordered events
    rows = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts")
        .collect()
    )
    want = set()
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, urows in by_user.items():
        cur = epoch
        for r in urows:
            if r["ts"] >= cur:
                want.add((uid, r["event_id"]))
                cur = dt.datetime.combine(
                    r["ts"].date(), dt.time.min
                ) + dt.timedelta(days=1)
    assert got == want


def test_parquet_stream_sink_checkpointed(spark, stream_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = streaming_first_per_day(read_event_stream(spark, stream_dir))
    q = write_parquet_stream(
        stream.select("event_id", "ts", "user_id", "event_date"), out, ckpt
    )
    q.awaitTermination()
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    # second run with same checkpoint: no new input -> no duplicates
    q2 = write_parquet_stream(
        streaming_first_per_day(read_event_stream(spark, stream_dir)).select(
            "event_id", "ts", "user_id", "event_date"
        ),
        out,
        ckpt,
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == n1
