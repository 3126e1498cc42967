"""Incremental sketch maintenance on a stream: the mergeable-summary
pattern (operators/sketches.py count-min; q60 HLL; q64 KLL) composed
with Structured Streaming's foreachBatch.

Design: each micro-batch builds its OWN partial grid (the exact batch
operator, reused verbatim) and writes it to a batch-id-keyed
directory with overwrite — an idempotent write, so a batch retried
after a mid-write failure replaces rather than double-counts its
partial. The queryable state is the cell-wise merge of all partials
at read time (count_min_merge). This is deliberately NOT a
read-modify-write of one global grid: RMW inside foreachBatch is not
idempotent under retries, and per-batch partials are exactly the
no-raw-rescan rollup shape the batch sketches already use (SCALE.md).

At scale: a partial grid is <= depth*width rows regardless of batch
size; merging a day of micro-batches is a KB-scale aggregation.
Compact old partials with operators/layout.py if batch count grows
unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketches import count_min_build, count_min_merge


def count_min_stream(
    events: DataFrame,
    state_dir: str,
    checkpoint: str,
    key_col: str,
    depth: int = 4,
    width: int = 512,
):
    """Maintain a count-min sketch over a stream of ``key_col``
    occurrences. Returns the started query (availableNow trigger)."""

    def upd(batch: DataFrame, batch_id: int) -> None:
        part = count_min_build(batch, key_col, depth=depth, width=width)
        (
            part.coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{state_dir}/batch_id={batch_id}")
        )

    return (
        events.writeStream.foreachBatch(upd)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def count_min_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The queryable sketch: cell-wise merge of every batch partial."""
    return count_min_merge(spark.read.parquet(f"{state_dir}/batch_id=*"))
