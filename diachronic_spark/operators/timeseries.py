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


def rolling_median(
    df: DataFrame,
    order_col: str,
    value_col: str,
    n: int = 7,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Exact trailing-``n``-row median (continuous: even counts
    average the two middle values) via collect_list over a ROWS frame
    + array_sort — a per-row O(n log n) that stays entirely inside
    whole-stage codegen. Built-in percentile/median aren't window
    functions in Spark, and approx sketches can't give the exact
    mid-pair semantics DuckDB's windowed ``median`` has.

    Works on integer value columns (e.g. exact cents): the mid-pair
    average ``(a+b)/2.0`` is either .0 or .5 — exactly representable,
    so no cross-engine rounding hazard (the q54 lesson). Scale: the
    frame is row-bounded (n values buffered per row, not the whole
    partition); use a partitioned Window upstream for per-key series.
    """
    frame = Window.orderBy(order_col).rowsBetween(-(n - 1), 0)
    arr = F.array_sort(F.collect_list(value_col).over(frame))
    sz = F.size(arr)
    lo = F.element_at(arr, F.floor((sz + 1) / 2).cast("int"))
    hi = F.element_at(arr, (F.floor(sz / 2) + 1).cast("int"))
    med = F.when(sz % 2 == 1, lo.cast("double")).otherwise(
        (lo.cast("double") + hi.cast("double")) / 2.0
    )
    return df.withColumn(out_col, med)


def sliding_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    days: int = 7,
) -> DataFrame:
    """Exact trailing-``days`` distinct-key counts per day (DATE-based
    RANGE frame, so calendar gaps don't stretch the window the way a
    ROWS frame would).

    Sliding COUNT(DISTINCT) doesn't decompose into algebraic partials,
    so the shape is: per-day key SETS (one hash-agg — at 100 TB the
    per-day set is active-key-sized, not event-sized), then a RANGE
    window flattening ``days`` sets and counting distinct members.
    Window state is bounded by days × per-day actives. When actives
    are too large for that, trade exactness for the q60 pattern:
    per-day HLL sketch partials merged over the same window.

    Returns (d, n_1d, n_window) per day.
    """
    daily = df.groupBy(F.to_date(ts_col).alias("d")).agg(
        F.collect_set(key_col).alias("__ks")
    )
    w = (
        Window.orderBy(F.datediff(F.col("d"), F.lit("1970-01-01")))
        .rangeBetween(-(days - 1), 0)
    )
    sets = F.collect_list("__ks").over(w)
    return daily.select(
        "d",
        F.size("__ks").alias("n_1d"),
        F.size(F.array_distinct(F.flatten(sets))).alias("n_window"),
    )


def gap_fill_linear(
    rolled: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Densify a daily ``bucket_rollup`` result onto the complete day
    spine and LINEARLY interpolate gaps between the surrounding
    observations — the numeric sibling of ``gap_fill_locf`` (carry
    forward) for series where a straight line is the better prior
    (metering, finance dailies). Rows outside the key's first/last
    observation stay null: extrapolation is a modeling choice, not a
    fill.

    Cross-engine bit-parity by construction: ``value_col`` must be an
    INTEGER column (pre-scale currency to cents, counts are already
    exact) and the time axis is the integer epoch-day, so the lerp is
    one exact integer product over one exact integer span — a single
    float division then one addition, the same IEEE ops in any engine
    regardless of partitioning (no order-dependent double summation).

    Shape: one broadcast bounds row, one spine explode, one left join,
    two frame-bounded windows per key — identical cost profile to
    ``gap_fill_locf``; nothing quadratic, no driver state.
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
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 day"))
            ).alias("bucket"),
        )
    )
    out = spine.join(rolled, [key_col, "bucket"], "left")
    idx = F.datediff(F.col("bucket"), F.to_date(F.lit("1970-01-01")))
    obs_idx = F.when(F.col(value_col).isNotNull(), idx)
    wb = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    pv = F.last(value_col, ignorenulls=True).over(wb)
    pi = F.last(obs_idx, ignorenulls=True).over(wb)
    nv = F.first(value_col, ignorenulls=True).over(wf)
    ni = F.first(obs_idx, ignorenulls=True).over(wf)
    est = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col).cast("double"))
        .when(
            pv.isNotNull() & nv.isNotNull(),
            pv.cast("double")
            + ((nv - pv) * (idx - pi)).cast("double")
            / (ni - pi).cast("double"),
        )
    )
    return out.withColumn(f"{value_col}_est", est)
