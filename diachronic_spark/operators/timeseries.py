"""Hypertable-style time-series rollup: time-bucket aggregation with a
dense bucket spine and last-observation-carried-forward gap fill.

Scale shape: the rollup is one shuffle on (key, bucket) with map-side
partial aggregation; bucket bounds are a 1-row aggregate broadcast
into the spine cross-join; the spine itself is generated
distributively (explode of a sequence per key — no driver loop); the
fill is one window per key over already-aggregated bucket rows
(cardinality = keys x buckets, tiny next to the raw events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_rollup(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: str,
    aggs: dict[str, F.Column],
) -> DataFrame:
    """Aggregate into ``date_trunc(bucket)`` time buckets per key.
    Only buckets with data appear — see ``gap_fill_locf`` for the
    dense spine.
    """
    return df.groupBy(
        key_col, F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    ).agg(*[c.alias(n) for n, c in aggs.items()])


def gap_fill_locf(
    rolled: DataFrame,
    key_col: str,
    bucket: str = "hour",
    fill: tuple[str, ...] = (),
    zero: tuple[str, ...] = (),
) -> DataFrame:
    """Densify a ``bucket_rollup`` result onto a complete bucket spine
    (global min..max bucket, one row per key per bucket) and fill gaps:
    ``fill`` columns get last-observation-carried-forward (null until
    the first observation), ``zero`` columns get 0 (counts).

    The filled value rides as ``<col>_filled`` so the sparse original
    stays visible alongside the interpolation.
    """
    bounds = rolled.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = (
        rolled.select(key_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("lo"), F.col("hi"), F.expr(f"interval 1 {bucket}")
                )
            ).alias("bucket"),
        )
    )
    out = spine.join(rolled, [key_col, "bucket"], "left")
    for c in zero:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    w = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    for c in fill:
        out = out.withColumn(
            f"{c}_filled", F.last(c, ignorenulls=True).over(w)
        )
    return out
