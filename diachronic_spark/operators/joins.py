"""Join operators Spark lacks as primitives (SURVEY §2.3 J7/J8).

As-of join: for each left row, the latest right row with
``right_ts <= left_ts`` within the same key — the generalization of the
reference's "page state as of day d" semantics
(/root/reference/main.py:154-155).

Implementation is the union+window trick: tag both sides, union, sort
by (key, ts) once, and carry the last-seen right row forward with
``last(ignorenulls=True)``. One shuffle on the key, no range explosion,
no Python boundary — survives arbitrarily large sides (vs. the
broadcast-nested-loop a naive ``left.ts >= right.ts`` join plans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: Column,
    right_ts: Column,
    band_seconds: float,
    how: str = "inner",
) -> DataFrame:
    """Theta join ``|left_ts - right_ts| <= band_seconds`` as a banded
    equi-join (SURVEY §2.3 J6/J8).

    A naive ``abs(l - r) <= w`` condition plans as a
    BroadcastNestedLoopJoin — O(n·m) comparisons, the exact shape that
    takes the DuckDB oracle 260 s at sf0.1. Instead each left row
    explodes to the ceil(w/day)+1 day-buckets its window can touch and
    the join becomes an equi-join on the bucket, with the exact
    predicate re-applied afterwards. Shuffles on the day key, never
    materializes the cross space; band width == predicate width keeps
    the fan-out minimal.

    Returns the joined frame with helper columns ``__l_sec``/``__r_sec``
    dropped; callers aggregate or project as usual.
    """
    n_off = -int(-band_seconds // 86400)  # ceil(w / day): widest day reach
    l = left.withColumn("__l_sec", left_ts.cast("double")).withColumn(
        "__l_day", F.to_date(left_ts)
    )
    r = right.withColumn("__r_sec", right_ts.cast("double")).withColumn(
        "__join_day", F.to_date(right_ts)
    )
    l_banded = l.select(
        "*", F.explode(F.expr(f"sequence({-n_off}, {n_off})")).alias("__off")
    ).withColumn("__join_day", F.date_add("__l_day", F.col("__off")))
    return (
        l_banded.join(r, "__join_day", how)
        .filter(F.abs(F.col("__l_sec") - F.col("__r_sec")) <= band_seconds)
        .drop("__join_day", "__l_day", "__l_sec", "__r_sec", "__off")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per key.

    Ties on timestamp: the right row sorts before the left row at equal
    timestamps (side tag 0 < 1), so an exactly-simultaneous right row IS
    matched — the `<=` convention, matching DuckDB's ASOF JOIN.
    Rows with no earlier right row keep NULL right columns (left join).
    """
    right_cols = right_cols or [c for c in right.columns if c != on]
    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    for c in right_cols:
        l_tag = l_tag.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        F.col(on),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    l_cols = [c for c in left.columns]
    unioned = l_tag.select(
        on, "__side", "__ts", *[f"{c}{suffix}" for c in right_cols],
        *[c for c in l_cols if c != on],
    ).unionByName(
        r_tag.select(
            on, "__side", "__ts", *[f"{c}{suffix}" for c in right_cols]
        ),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_cols
        ],
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            on,
            *[c for c in l_cols if c != on],
            *[F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    n_buckets: int | None = None,
) -> DataFrame:
    """Cogrouped merge-asof variant of ``asof_join`` — identical
    semantics (latest right row with ``right_ts <= left_ts`` per key,
    ``<=`` tie convention, left join), different physical shape.

    ``asof_join`` unions both sides into ONE shuffle, so every left row
    carries null slots for every right column through the exchange —
    wasteful when the right schema is wide. Here each side shuffles
    only its own columns, and a ``pandas.merge_asof`` — a linear
    two-pointer merge over the sorted groups — fills the match inside
    an Arrow-batched worker. The trade is one Python boundary for a
    narrower exchange; prefer it when right-side width dominates the
    shuffle, the union form when avoiding Python matters more
    (SCALE.md "Known trade-offs").

    The cogroup key is a HASH BUCKET of the join key, not the key
    itself: cogroup dispatches one Python call per group, so keying on
    the raw key costs O(distinct keys) worker invocations — measured
    at ~2ms each, that alone was ~4s for 2k keys (BENCH r3 q108).
    Bucketing to ``n_buckets`` (default: session shuffle partitions)
    bounds the invocation count at the partition count regardless of
    key cardinality, and ``merge_asof(by=key)`` restores exact per-key
    semantics inside each bucket. Keys never straddle buckets, so the
    result is identical (equivalence with ``asof_join`` is test-pinned).
    """
    import pandas as pd

    right_cols = right_cols or [c for c in right.columns if c != on]
    l_fields = left.schema.fields
    r_schema = {f.name: f for f in right.schema.fields}
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in l_fields)
        + ", "
        + ", ".join(
            f"`{c}{suffix}` {r_schema[c].dataType.simpleString()}"
            for c in right_cols
        )
    )
    l_names = [f.name for f in l_fields]
    if n_buckets is None:
        # the conf can be the non-numeric 'auto' on AQE-managed
        # platforms (ADVICE r3) — fall back to defaultParallelism
        raw = left.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        try:
            n_buckets = int(raw)
        except (TypeError, ValueError):
            n_buckets = left.sparkSession.sparkContext.defaultParallelism

    def _ns_key(s: pd.Series) -> pd.Series:
        # one int64-ns key dtype on both sides: Arrow may hand either
        # side datetime64[us|ns] or (for DateType) date objects, and
        # merge_asof refuses mismatched key dtypes
        return pd.to_datetime(s).astype("datetime64[ns]").astype("int64")

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.drop(columns="__bkt").assign(
            __lk=_ns_key(lpdf[left_ts])
        ).sort_values("__lk", kind="mergesort")
        out_r = [f"{c}{suffix}" for c in right_cols]
        if rpdf.empty:
            res = lpdf.copy()
            for c in out_r:
                res[c] = None
            return res[l_names + out_r]
        keep = list(dict.fromkeys([on, right_ts] + right_cols))
        if set(keep) - set(rpdf.columns):
            raise KeyError(
                f"right group missing {sorted(set(keep) - set(rpdf.columns))}; "
                f"got columns {list(rpdf.columns)}"
            )
        ren = {c: f"{c}{suffix}" for c in keep if c != on}
        rsub = (
            rpdf[keep]
            .rename(columns=ren)
            .assign(__rk=_ns_key(rpdf[right_ts]).values)
            .sort_values("__rk", kind="mergesort")
        )
        res = pd.merge_asof(
            lpdf,
            rsub,
            left_on="__lk",
            right_on="__rk",
            by=on,  # exact per-key match inside the hash bucket
            direction="backward",  # <=: exact-timestamp right rows match
        )
        return res[l_names + out_r]

    def bkt(c: str) -> Column:
        return F.pmod(F.xxhash64(F.col(c)), F.lit(n_buckets))

    # Re-alias every column into FRESH attributes before cogrouping:
    # when both sides derive from the same source (self-cogroup
    # lineage), the shared expression ids let the optimizer's
    # deduplicate/prune pass drop the join key from one side's Python
    # input under a downstream projection — observed as the right
    # group arriving without `on` once a select sat on top.
    lb = left.select(
        *[F.col(c).alias(c) for c in left.columns], bkt(on).alias("__bkt")
    )
    rb = right.select(
        *[F.col(c).alias(c) for c in right.columns], bkt(on).alias("__bkt")
    )
    return (
        lb.groupby("__bkt")
        .cogroup(rb.groupby("__bkt"))
        .applyInPandas(merge, out_schema)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Interval × interval overlap join — both sides carry
    ``[start, end)`` half-open intervals; rows pair when the intervals
    have a NONEMPTY intersection: ``l_start < r_end AND r_start <
    l_end`` and neither interval is empty. (For empty ``[x, x)``
    intervals the textbook predicate alone would claim a point
    "overlap" inside any covering interval; this operator defines
    empty intervals to match nothing — they generate no buckets.)

    Written directly, that predicate plans as a nested-loop cross
    product (the banded_interval_join problem, squared). Instead BOTH
    sides explode to the bucket grid their interval touches and the
    join is an equi-join on the bucket; an overlapping pair shares at
    least one bucket (any t in the intersection lies in a bucket both
    sides generated), duplicates from multi-bucket overlaps collapse
    via the minimum shared bucket (join on bucket == greatest(first
    bucket of each side) — a pure filter, no DISTINCT shuffle), and
    the exact predicate re-applies last.

    Fan-out per row = interval length / bucket_seconds + 1 — pick the
    bucket near the typical interval length. Both exchanges hash on
    the bucket key, so at 100 TB this scales like any equi-join; skew
    = a bucket crossed by very many LONG intervals (pick coarser
    buckets, or split the long-interval minority out first).
    """
    shared = set(left.columns) & set(right.columns)
    if shared:
        raise ValueError(
            "interval_overlap_join requires disjoint column names; "
            f"shared: {sorted(shared)} — rename one side first"
        )
    # Bucket math in integer microseconds: double epoch-seconds has a
    # ~0.24 µs ulp at 2024-era epochs, so a float epsilon for the
    # half-open end would depend on rounding luck near boundaries.
    # floor-div via pmod (a - pmod(a, b) is an exact multiple of b, and
    # |µs| < 2^53 keeps the final division exact) is correct for any
    # epoch including pre-1970 negatives, where SQL `div` truncates
    # toward zero instead of flooring.
    b_us = F.lit(bucket_seconds * 1_000_000)

    def _floordiv(x):
        return ((x - F.pmod(x, b_us)) / b_us).cast("long")

    types = dict(left.dtypes) | dict(right.dtypes)

    def _to_us(c: str):
        # timestamps via unix_micros (exact); numeric epoch-second
        # columns (the pre-µs contract) scale to µs. Integer types
        # multiply in LONG arithmetic — a double intermediate would
        # round seconds above ~2^53/1e6 to 1024 µs multiples and shift
        # bucket indices near edges. Fractional types take the double
        # path, truncating sub-µs noise.
        t = types.get(c, "")
        if t.startswith("timestamp"):
            return F.unix_micros(F.col(c))
        if t in ("bigint", "int", "smallint", "tinyint"):
            return F.col(c).cast("long") * 1_000_000
        return (F.col(c).cast("double") * 1_000_000).cast("long")

    def buckets(s: str, e: str):
        lo = _floordiv(_to_us(s))
        # half-open end: an interval ending exactly on a bucket edge
        # does not occupy that bucket -> floor((e_us - 1) / b_us)
        hi = _floordiv(_to_us(e) - F.lit(1))
        seq = F.when(
            F.col(e) > F.col(s),  # empty/degenerate intervals emit no
            F.sequence(lo, hi),  # buckets
        ).otherwise(F.array().cast("array<long>"))
        return lo, seq

    llo, lseq = buckets(l_start, l_end)
    rlo, rseq = buckets(r_start, r_end)
    lb = left.withColumn("__l_b0", llo).withColumn("__bucket", F.explode(lseq))
    rb = right.withColumn("__r_b0", rlo).withColumn("__bucket", F.explode(rseq))
    j = lb.join(rb, "__bucket")
    exact = (F.col(l_start) < F.col(r_end)) & (
        F.col(r_start) < F.col(l_end)
    )
    dedup = F.col("__bucket") == F.greatest(
        F.col("__l_b0"), F.col("__r_b0")
    )
    return j.filter(exact & dedup).drop("__bucket", "__l_b0", "__r_b0")
