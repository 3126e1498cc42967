"""Streaming operators (SURVEY §2.9 ST1-ST9).

The reference is logically a stream processor run in batch: ordered
revision stream, per-page state, monotone day threshold, memory-bounded
flush (/root/reference/main.py:151-170). These are the incremental
forms on Spark Structured Streaming:

- windowed aggregations (ST3-ST5) share the exact expressions with the
  batch queries q16/q17 — one definition, two execution modes;
- ``streaming_first_per_day`` (ST6) is the watermarked dedup analog of
  the snapshot operator. NOTE its keep-first is ARRIVAL order
  (dropDuplicates semantics); exact min-timestamp semantics need the
  stateful form below;
- ``threshold_scan_stream`` (ST7) replays the reference's monotone
  threshold loop per key with explicit GroupState — the bug-for-bug
  incremental form; late/out-of-order rows are dropped exactly like
  the reference's cur_date scan (ST9 ≙ watermark drop, SURVEY §1.2-3).

State at 100 TB: per-key state is one timestamp (the threshold) —
tiny; use the RocksDB state store for high key cardinality, and
watermarks to bound the windowed operators' state.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import EVENTS


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """ST1: file-based streaming source with explicit schema."""
    reader = spark.readStream.schema(EVENTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "1 day"
) -> DataFrame:
    """ST2+ST3: same expression as batch q16."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def sliding_counts(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """ST4: sliding window counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "1 day"
) -> DataFrame:
    """ST5: session windows per user (same expression as batch q17)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def streaming_first_per_day(
    events: DataFrame, watermark: str = "2 days"
) -> DataFrame:
    """ST6: at-most-one event per (user_id, day) — watermarked dedup.
    Keeps the FIRST-ARRIVED row per key; state for a key is dropped
    once the watermark passes its day."""
    return events.withColumn(
        "event_date", F.to_date("ts")
    ).withWatermark("ts", watermark).dropDuplicates(["user_id", "event_date"])


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 days"
) -> DataFrame:
    """ST6 variant: exactly-once by key where duplicates may arrive with
    DIFFERENT event times (retries, replays). dropDuplicates keys state
    forever unless the event-time column is part of the key;
    dropDuplicatesWithinWatermark instead guarantees dedup for
    duplicates arriving within the watermark delay of each other and
    lets state expire — the right tool for at-least-once upstreams."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def foreach_batch_sink(df: DataFrame, out_path: str, checkpoint: str):
    """ST8 custom-sink form: foreachBatch hands each micro-batch to
    arbitrary BATCH writer code with a (replay-stable) batch_id. The
    checkpoint records committed batch ids, so a restarted query never
    re-runs a committed batch — idempotent end-to-end without the sink
    itself being transactional (the reference achieved the same with
    its upload-then-skip list, main.py:60-71, 186-191)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        (
            batch.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


STATE_SCHEMA = "cur_threshold timestamp"
SCAN_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, value double"
)

_DAY_NS = 86_400_000_000_000


def _threshold_scan_batch(
    key: Tuple[Any, ...],
    chunks: list[pd.DataFrame],
    cur: pd.Timestamp,
) -> tuple[pd.DataFrame | None, pd.Timestamp]:
    """One key's batch of the monotone threshold scan, vectorized.

    The sequential loop ("emit iff ts >= threshold, advance threshold
    to the next midnight") is equivalent to: drop rows below the
    incoming threshold, then keep the first row per UTC day in
    (ts, event_id) order — after an emission the threshold is the next
    midnight, which drops exactly the rest of that day and nothing
    else. numpy int64 day math replaces the per-row pd.Timestamp loop
    (~3x on the q104 drain at sf0.1); equivalence with the sequential
    form is pinned by the driver oracle and the tws-equivalence test.
    """
    import numpy as np

    batch = chunks[0] if len(chunks) == 1 else pd.concat(
        chunks, ignore_index=True
    )
    ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
    eid = batch["event_id"].to_numpy()
    order = np.lexsort((eid, ts_ns))
    ts_s = ts_ns[order]
    keep = ts_s >= cur.value
    if not keep.any():
        return None, cur
    day = ts_s[keep] // _DAY_NS
    first = np.empty(day.shape, dtype=bool)
    first[0] = True
    first[1:] = day[1:] != day[:-1]
    idx = order[keep][first]
    out = batch.iloc[idx][["event_id", "ts", "value"]].copy()
    out.insert(0, "user_id", key[0])
    new_cur = pd.Timestamp((day[-1] + 1) * _DAY_NS)
    return out, new_cur


def threshold_scan_stream(
    events: DataFrame, epoch: dt.datetime
) -> DataFrame:
    """ST7: the reference's per-key monotone daily threshold scan
    (main.py:151-161) as applyInPandasWithState.

    Per key, keep a single timestamp of state (next emittable instant);
    emit a row iff ts >= threshold, then advance the threshold to the
    next midnight — at most one row per key-day survives, first-in-
    stream-order. Within a batch rows are processed in ts order (the
    dump order analog); across batches arrival order governs, exactly
    like the reference's sequential consumption.
    """

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (cur,) = state.get
            cur = pd.Timestamp(cur)
        else:
            cur = pd.Timestamp(epoch)
        # collect ALL chunks before scanning: chunks arrive in
        # nondeterministic shuffle order and a per-chunk scan would let
        # a later-day chunk advance the threshold past earlier days'
        # events — the whole batch must be one (ts, event_id)-ordered
        # scan (vectorized in _threshold_scan_batch).
        chunks = list(pdfs)
        if not chunks:  # NoTimeout means this never fires, but be safe
            state.update((cur.to_pydatetime(),))
            return
        out, cur = _threshold_scan_batch(key, chunks, cur)
        state.update((cur.to_pydatetime(),))
        if out is not None:
            yield out

    # project to the scan's columns BEFORE the stateful exchange:
    # Catalyst does not prune through applyInPandasWithState, so
    # without this every batch ships event_type and the props map
    # through the shuffle and the Arrow boundary for nothing
    return events.select(
        "user_id", "event_id", "ts", "value"
    ).groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SCAN_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_parquet_stream(
    df: DataFrame, out_path: str, checkpoint: str
):
    """ST8: exactly-once parquet sink (checkpointed) — the incremental
    replacement for the reference's write-upload-skip loop
    (main.py:177-191 + 60-71)."""
    return (
        df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def purchase_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: each purchase matched to
    the same user's click events in the preceding attribution window.

    Spark plans a StreamingSymmetricHashJoin; BOTH sides buffer state,
    and the time-range condition + watermarks are what let it EVICT:
    a click older than (watermark + window) can never match a future
    purchase, so its state is dropped. Without the interval condition
    the state grows forever — the condition is a correctness feature of
    the operator, not an optimization.

    ``how="right_outer"`` keeps every purchase: one with no click in
    its window emits a null-padded row WHEN ITS STATE IS EVICTED — the
    engine can only know "no match will ever arrive" once the global
    watermark passes the last event time a matching click could carry
    (here c_ts <= p_ts, so the purchase itself), which is why outer
    results trail the watermark instead of appearing with the data
    batch. Purchases younger than the final watermark are never
    emitted unmatched (their fate is still open when the stream ends).
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("c_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("p_ts", watermark)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {attribution_window}")),
        how,
    ).select(
        "p_user", "purchase_id", "click_id", "c_ts", "p_ts", "purchase_value"
    )


def threshold_scan_tws(
    events: DataFrame, epoch: dt.datetime
) -> DataFrame:
    """``threshold_scan_stream`` on the NEW arbitrary-state API
    (transformWithStateInPandas, Spark 4): identical semantics, but
    state lives in named, schema-typed handles (ValueState) managed by
    the state store instead of a single opaque tuple — the
    forward-looking surface (composable state variables, TTL, timers,
    initial-state bootstrap) for new stateful operators.

    Output equivalence with the GroupState form is test-pinned.
    Requires the RocksDB state store provider and the protobuf package
    (the Python driver worker speaks protobuf to the JVM state
    server) — the test gates on both.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    events = events.select("user_id", "event_id", "ts", "value")

    class ThresholdScan(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cur = handle.getValueState("cur", STATE_SCHEMA)

        def handleInputRows(
            self, key: Tuple[Any, ...], rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            got = self._cur.get()
            cur = pd.Timestamp(got[0]) if got is not None else pd.Timestamp(epoch)
            chunks = list(rows)
            if not chunks:
                self._cur.update((cur.to_pydatetime(),))
                return
            out, cur = _threshold_scan_batch(key, chunks, cur)
            self._cur.update((cur.to_pydatetime(),))
            if out is not None:
                yield out

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ThresholdScan(),
        outputStructType=SCAN_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
