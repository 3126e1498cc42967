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
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
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


def test_dedup_within_watermark_single_survivor(spark, tmp_path):
    """Duplicates with slightly different event times (retry semantics)
    collapse to one row per key."""
    from diachronic_spark.streaming.events import dedup_within_watermark

    d = str(tmp_path / "dups")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 7, "click", 1.0, "{}"),
        (1, base + dt.timedelta(seconds=30), 7, "click", 1.0, "{}"),  # retry
        (2, base + dt.timedelta(minutes=5), 8, "view", 2.0, "{}"),
        (2, base + dt.timedelta(minutes=6), 8, "view", 2.0, "{}"),    # retry
        (3, base + dt.timedelta(minutes=9), 7, "click", 3.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    spark.createDataFrame(rows, schema).write.parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        dedup_within_watermark(stream, ["event_id"], "10 minutes")
        .writeStream.format("memory")
        .queryName("wmdedup")
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = spark.sql(
        "select event_id, count(*) n from wmdedup group by event_id"
    ).collect()
    assert sorted((r.event_id, r.n) for r in got) == [(1, 1), (2, 1), (3, 1)]


def test_foreach_batch_sink_is_exactly_once_across_restart(spark, tmp_path):
    from diachronic_spark.streaming.events import foreach_batch_sink

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, v string").parquet(src)
    _drain(foreach_batch_sink(stream, out, ckpt))
    first = spark.read.parquet(out).count()
    assert first == 10
    # restart from the same checkpoint with no new data: committed
    # batches must not re-run, so the sink contents are unchanged
    stream2 = spark.readStream.schema("id long, v string").parquet(src)
    _drain(foreach_batch_sink(stream2, out, ckpt))
    assert spark.read.parquet(out).count() == first


def test_late_event_behind_watermark_is_dropped(spark, tmp_path):
    """ST2/ST9 pin: an event arriving after the watermark passed its
    window neither re-emits nor corrupts the finalized window — the
    declarative form of the reference's monotone-threshold drop
    (SURVEY §1.2-3)."""
    d = str(tmp_path / "late")
    schema = "ts timestamp, k string"
    t = dt.datetime(2024, 1, 1, 10, 0, 0)

    def write_file(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    write_file([(t, "a"), (t + dt.timedelta(minutes=30), "a")], "f1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    # batch 2: advance watermark past the 10:00 window (event at 12:30)
    write_file([(t + dt.timedelta(hours=2, minutes=30), "a")], "f2")
    q.processAllAvailable()
    # batch 3: a LATE event for the already-finalized 10:00 window
    write_file([(t + dt.timedelta(minutes=45), "a")], "f3")
    q.processAllAvailable()
    q.stop()
    got = {str(r.ws): r.n for r in spark.sql("select * from late").collect()}
    # the 10:00 window was emitted once with the on-time count of 2;
    # the late third event is dropped, never double-emitted
    assert got.get("2024-01-01 10:00:00") == 2
    assert sum(1 for ws in got if ws.startswith("2024-01-01 10:")) == 1


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, stream_dir):
    """Watermarked stream-stream join drains to exactly the batch
    interval-join result on the same data."""
    from diachronic_spark.streaming.events import (
        purchase_attribution_join,
        read_event_stream,
    )

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    sc, sp = split(read_event_stream(spark, stream_dir))
    q = (
        purchase_attribution_join(sc, sp)
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = sorted(
        (r.purchase_id, r.click_id)
        for r in spark.sql("select * from attrib").collect()
    )
    bc, bp = split(load(spark, sf_dir, "events"))
    want = sorted(
        (r.purchase_id, r.click_id)
        for r in purchase_attribution_join(bc, bp).collect()
    )
    assert got and got == want


def test_threshold_scan_tws_equals_groupstate_form(spark, sf_dir, stream_dir):
    # transformWithState's Python driver worker speaks protobuf to the
    # JVM state server; without the protobuf package the query crashes
    # at init. Gate, don't fail — the operator is correct surface and
    # runs wherever pyspark's standard connect/streaming deps exist.
    pytest.importorskip("google.protobuf")
    from diachronic_spark.streaming.events import threshold_scan_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    epoch = dt.datetime(2024, 1, 1)
    q = (
        threshold_scan_tws(read_event_stream(spark, stream_dir), epoch)
        .writeStream.format("memory")
        .queryName("scan_tws")
        .outputMode("append")
        .start()
    )
    _drain(q)
    q2 = (
        threshold_scan_stream(read_event_stream(spark, stream_dir), epoch)
        .writeStream.format("memory")
        .queryName("scan_gs")
        .outputMode("append")
        .start()
    )
    _drain(q2)
    tws = {tuple(r) for r in spark.sql("select * from scan_tws").collect()}
    gs = {tuple(r) for r in spark.sql("select * from scan_gs").collect()}
    assert tws == gs and len(tws) > 0


def test_streaming_cms_equals_batch_sketch(spark, sf_dir, stream_dir, tmp_path):
    from diachronic_spark.operators.sketches import count_min_build
    from diachronic_spark.streaming.sketches import (
        count_min_state,
        count_min_stream,
    )
    from diachronic_spark.streaming.events import read_event_stream

    state = str(tmp_path / "cms_state")
    ckpt = str(tmp_path / "cms_ckpt")
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    _drain(
        count_min_stream(stream, state, ckpt, "event_type", width=64)
    )
    streamed = {
        (r["j"], r["b"]): r["n"]
        for r in count_min_state(spark, state).collect()
    }
    batch = {
        (r["j"], r["b"]): r["n"]
        for r in count_min_build(
            load(spark, sf_dir, "events"), "event_type", width=64
        ).collect()
    }
    assert streamed == batch  # merge-of-micro-batches == one-pass build

    # restart with the same checkpoint: committed batches don't re-run,
    # and the per-batch overwrite keeps the state identical either way
    stream2 = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    _drain(count_min_stream(stream2, state, ckpt, "event_type", width=64))
    streamed2 = {
        (r["j"], r["b"]): r["n"]
        for r in count_min_state(spark, state).collect()
    }
    assert streamed2 == batch


def test_cdc_apply_resumes_from_checkpoint(spark, tmp_path):
    """The q117 CDC-apply shape across a RESTART: a first availableNow
    run sees only the first two change files; new files then arrive and
    a second run with the SAME checkpoint resumes from the committed
    batch — the final table must equal a sequential apply of all four
    changes, and the second run must not re-apply batches 0-1."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from diachronic_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "signup", 1.0), (2, "signup", 2.0), (3, "signup", 3.0)],
        ["user_id", "event_type", "value"],
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    chg_dir = tmp_path / "changes"
    chg_dir.mkdir()
    work = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")
    # change ranks: u1 updated then deleted; u2 deleted then updated
    # (the update must be a no-op); u3 updated twice (last wins)
    ranks = [
        [(1, "click", 10.0, "U"), (2, "view", 0.0, "D"), (3, "click", 30.0, "U")],
        [(1, "view", 0.0, "D"), (2, "click", 20.0, "U"), (3, "click", 31.0, "U")],
        [(3, "purchase", 32.0, "U")],
        [(1, "click", 11.0, "U")],  # no-op: u1 already deleted
    ]
    now = _time.time()

    def write_rank(i):
        d = str(tmp_path / f"seq_{i}")
        spark.createDataFrame(
            ranks[i], ["user_id", "event_type", "value", "op"]
        ).coalesce(1).write.mode("overwrite").parquet(d)
        (part,) = [f for f in os.listdir(d) if f.endswith(".parquet")]
        dst = str(chg_dir / f"chg_{i}.parquet")
        os.replace(os.path.join(d, part), dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    applied = []

    def apply_batch(batch, batch_id):
        prev = base_path if batch_id == 0 else f"{work}/b{batch_id - 1}"
        merge_upsert(
            spark.read.parquet(prev), batch, key="user_id",
            update_cols=["event_type", "value"],
        ).write.mode("overwrite").parquet(f"{work}/b{batch_id}")
        applied.append(batch_id)

    def run():
        q = (
            spark.readStream.schema(
                "user_id bigint, event_type string, value double, op string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(chg_dir))
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_rank(0); write_rank(1)
    run()
    assert applied == [0, 1]
    write_rank(2); write_rank(3)
    run()  # same checkpoint: must resume at batch 2, not replay 0-1
    assert applied == [0, 1, 2, 3]
    final = {
        r.user_id: (r.event_type, r.value)
        for r in spark.read.parquet(f"{work}/b3").collect()
    }
    # u1: updated then deleted (later update no-op) -> absent
    # u2: deleted first -> later update no-op -> absent
    # u3: three updates, last wins
    assert final == {3: ("purchase", 32.0)}


def test_streaming_ingest_loop_cross_batch_state(spark, sf_dir):
    """q136's load-bearing fact: batch 1's near-dups of batch 0's
    SURVIVORS are caught only because the foreachBatch loop appended
    those survivors to the at-rest index between micro-batches —
    reversed-text trigrams share nothing with the forward corpus, so a
    stale (un-appended) index would let every +500000 doc survive."""
    from diachronic_spark.plans import QUERIES

    out = QUERIES["q136"](spark, sf_dir).collect()
    by_band: dict[tuple[int, int], list] = {}
    for r in out:
        by_band.setdefault((r.batch, r.doc_id // 100000), []).append(r)
    # batch 0: novel reversed docs (+300000) all survive; true corpus
    # near-dups (+400000) all caught at jaccard >= 0.5
    assert all(r.survived for r in by_band[(0, 3)])
    assert all(
        not r.survived and r.max_jaccard >= 0.5 for r in by_band[(0, 4)]
    )
    # batch 1: near-dups of batch-0 survivors (+500000) caught — the
    # cross-batch index mutation; fresh novel docs (+600000) survive
    assert all(
        not r.survived and r.max_jaccard >= 0.5 for r in by_band[(1, 5)]
    )
    assert all(r.survived for r in by_band[(1, 6)])
    assert {k: len(v) for k, v in sorted(by_band.items())} == {
        (0, 3): 50, (0, 4): 25, (1, 5): 50, (1, 6): 25,
    }


def test_ingest_loop_leaves_pristine_index_untouched(spark, sf_dir):
    """q136 restores its working index from the shared pristine copy
    via hardlinks — safe only while every mutation is unlink/create.
    Pin the invariant (ADVICE r6): after a full ingest run, the
    pristine tree's file set, sizes, mtimes, AND read-only modes are
    bit-for-bit what they were, so q112/q113 still probe the
    pre-append state."""
    import os

    from diachronic_spark.plans import QUERIES
    from diachronic_spark.plans.ext_queries import _minhash_index

    sf = sf_dir  # fixture yields the sf dir path

    def snapshot(root: str) -> dict:
        out = {}
        for d, _sub, files in os.walk(root):
            for f in files:
                p = os.path.join(d, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (
                    st.st_size, st.st_mtime_ns, st.st_mode,
                )
        return out

    pristine = _minhash_index(spark, sf)
    before = snapshot(pristine)
    assert before, "pristine index is empty?"
    # every data file frozen read-only (the loud-failure guard)
    assert all(not (m & 0o222) for _, _, m in before.values())
    QUERIES["q136"](spark, sf).collect()
    assert snapshot(pristine) == before
