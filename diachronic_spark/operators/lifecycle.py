"""User-lifecycle analytics: ordered funnels, retention cohorts, SCD2
change compression.

These are the event-stream analytics a product/training-data pipeline
runs over an `events`-shaped table (user_id, ts, event_type).  The
reference's only temporal semantics is the per-page monotone threshold
scan (reference main.py:151-161); the funnel fold below is the same
shape of computation — a per-key ordered scan with monotone state —
generalized to k ordered stages, which is why it lives here rather
than a UDF: the whole fold is JVM-side higher-order functions.

Scale notes (100 TB):
- `funnel` is ONE shuffle (groupBy user) + a per-group sort inside
  `sort_array`; state per user is their event list — bounded by user
  activity, not corpus size.  The alternative (k min-cascade joins,
  the oracle's formulation) costs k shuffles; the fold wins whenever
  k > 1 and per-user event counts fit memory (they do: even a
  pathological 1M-event user is ~32 MB of (ts, type) structs).
- `retention_cohorts` is two aggregations co-partitioned on user_id;
  the first-seen table joins back user-to-user so AQE plans a
  shuffle-hash join with both sides already hashed on the key.
- `scd2_compress` is two window passes over the SAME
  (key, order) window spec — Spark plans a single sort+shuffle and
  runs both windows in one physical Window stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_depth(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-user deepest funnel stage reached, via a single-shuffle fold.

    Stage i is reached at the FIRST event of type ``steps[i]`` whose
    timestamp is strictly after the stage-(i-1) timestamp.  This is
    exactly the min-cascade semantics (min ts of step i among events
    later than stage i-1's ts), computed in one pass: events are
    time-sorted per user and folded left-to-right with a struct of
    k nullable stage timestamps.  Strict `>` means one event can never
    advance two stages.

    Returns (user_col, depth) with depth in [0, k].
    """
    k = len(steps)
    ev = F.sort_array(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                F.col(order_col).alias("ord"),
                                F.col(type_col).alias("et")))
    )
    init = F.struct(*[F.lit(None).cast("timestamp").alias(f"s{i}")
                      for i in range(k)])

    def step(acc: Column, e: Column) -> Column:
        outs = []
        for i, name in enumerate(steps):
            cond = (e["et"] == name) & acc[f"s{i}"].isNull()
            if i > 0:
                cond = cond & acc[f"s{i-1}"].isNotNull() & (
                    e["ts"] > acc[f"s{i-1}"]
                )
            outs.append(
                F.when(cond, e["ts"]).otherwise(acc[f"s{i}"]).alias(f"s{i}")
            )
        return F.struct(*outs)

    # Monotone state: s_i non-null implies s_{i-1} non-null, so depth is
    # just the count of set slots.
    per_user = (
        df.groupBy(user_col)
        .agg(ev.alias("evs"))
        .withColumn("st", F.aggregate("evs", init, step))
        .select(
            user_col,
            sum(
                (F.col(f"st.s{i}").isNotNull().cast("int") for i in range(k)),
                F.lit(0),
            ).alias("depth"),
        )
    )
    return per_user


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Funnel summary: one row per stage with the count of users who
    reached at least that stage (classic cumulative funnel).

    Output: (stage int 1-based, step string, n_users long).
    """
    depth = funnel_depth(df, steps, user_col, type_col, ts_col, order_col)
    counts = depth.agg(
        *[
            F.sum((F.col("depth") >= i + 1).cast("long")).alias(f"c{i}")
            for i in range(len(steps))
        ]
    )
    stack_args = ", ".join(
        f"{i + 1}, '{s}', c{i}" for i, s in enumerate(steps)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (stage, step, n_users)"
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: cohort = ISO week of the user's first
    event; for each (cohort_week, week_offset) count distinct active
    users.

    Output: (cohort_week date, week_offset int, n_users long).
    """
    first = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    return (
        df.join(first, user_col)
        .select(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col(ts_col)), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            user_col,
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def scd2_compress(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change stream:
    collapse consecutive identical states per key, then derive
    [valid_from, valid_to) intervals (valid_to NULL = current row).

    Both window functions share one (partitionBy key, orderBy ts)
    spec, so Catalyst plans a single Window exchange+sort.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    changes = (
        df.withColumn("_prev", F.lag(state_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(key_col, state_col, "valid_from", "valid_to")
    )
