"""Batch sessionization: gaps-and-islands session assignment.

The streaming side already has ``session_window`` aggregation
(streaming/events.py); this is the BATCH complement over historical
data — assign a session index per user from inactivity gaps, entirely
with window expressions (no Python boundary).

Scale shape: both window specs share the same partitioning and
ordering, so Catalyst plans ONE Exchange on the user key and one sort
feeding both Window operators — sessionizing 100 TB of events costs a
single shuffle, and AQE skew-split handles hot users. Compare the
reference's per-page sequential loop (main.py:151-161), which is the
same gaps-and-islands idea run one group at a time in one process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Tag each row with a per-user ``session_idx`` (1-based): a new
    session starts when the gap since the previous event exceeds
    ``gap_seconds``. ``tiebreak`` makes the intra-user order total so
    equal timestamps can't reorder across runs/engines.

    Gap math is integer microseconds (``unix_micros``) — no float
    round-trip, exact cross-engine parity with DuckDB's
    ``date_diff('microsecond', ...)``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *tiebreak)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w)
    )
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("session_idx", F.sum(is_new).over(run))
