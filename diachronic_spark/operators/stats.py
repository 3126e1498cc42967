"""Distribution statistics: equi-width histogram.

(The rest of the stats surface lives elsewhere: moment aggregates in
q35, exact/approx percentiles in q42, KLL quantile sketches in q64,
single-pass column profiling in q69.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_width_histogram(
    df: DataFrame, col: str, bins: int = 20
) -> DataFrame:
    """Equi-width histogram: (bin, lo, hi, n) for ``bins`` buckets
    over [min, max]; the max value lands in the last bin.

    The bounds come from a 1-row aggregate cross-joined back in (a
    broadcast, not a driver action), so the whole histogram is one
    job: scan → min/max agg → bin hash-agg. At 100 TB the min/max agg
    is map-side-combined to one row per partition, and empty bins are
    simply absent (join a bin spine if density is required —
    timeseries.gap_fill_locf does exactly that for time buckets).
    """
    x = F.col(col)
    bounds = df.agg(
        F.min(x).alias("__lo"), F.max(x).alias("__hi")
    )
    w = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((x - F.col("__lo")) / w).cast("int"), F.lit(bins - 1)
        )
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(bin_.alias("bin"), F.col("__lo"), w.alias("__w"))
        .groupBy("bin", "__lo", "__w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("__lo") + F.col("bin") * F.col("__w")).alias("lo"),
            (F.col("__lo") + (F.col("bin") + 1) * F.col("__w")).alias("hi"),
            "n",
        )
    )


def exact_percentile_bracketed(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: float,
    accuracy: int = 10000,
    margin: float = 0.01,
) -> DataFrame:
    """Exact per-group percentile without sorting whole groups —
    approx-bracket then exact-select.

    Spark's exact ``percentile`` aggregate buffers and sorts EVERY
    group value on a single task: at 100 TB with few groups that is
    one executor sorting billions of rows — the classic exact-quantile
    scale-killer. This operator keeps the answer bit-exact while
    sorting only a sliver:

    1. One pass computes per-group ``n``, an approx percentile at
       ``p`` (returned for free), and an approx LOWER BRACKET at
       ``p - margin``. percentile_approx's rank error is bounded by
       n/accuracy, so with margin >> 1/accuracy (0.01 vs 1e-4 at the
       defaults) the bracket provably sits at-or-below the true
       target rank.
    2. A second pass ranks only the kept tail (~(1-p+margin) of each
       group) with a window; the below-bracket count is derived as
       ``n - |tail|`` inside the same window pass (no separate scan),
       the two order statistics around rank (n-1)*p come out of the
       tail, and linear interpolation reproduces ``F.percentile``
       exactly. Groups whose values are all NULL return a NULL
       percentile, matching the aggregate.

    The bracket value itself may vary with partitioning (sketch merge
    order); the RESULT does not — any valid bracket yields the same
    order statistics. If the bracket ever fails (impossible within the
    documented error bound; conceivable only if accuracy/margin are
    misconfigured), the affected group raises rather than returning a
    near-miss.

    Returns (group_col, n, p_exact, p_approx).
    """
    from pyspark.sql import Window

    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    p_lo = max(0.0, p - margin)
    stats = df.groupBy(group_col).agg(
        F.count(v).alias("n"),
        F.percentile_approx(v, p, accuracy).alias("p_approx"),
        F.percentile_approx(v, p_lo, accuracy).alias("lo_raw"),
    ).withColumn(
        "k", F.floor((F.col("n") - 1) * F.lit(p)).cast("bigint")
    ).withColumn(
        "frac", (F.col("n") - 1) * F.lit(p) - F.col("k")
    ).withColumn(
        # the bracket is only trusted when the margin spans the
        # sketch's rank-error bound (n/accuracy) plus 2 ranks of
        # rounding slack; tiny groups keep every value (they are
        # trivial to rank anyway)
        "lo",
        F.when(
            (F.col("n") - 1) * F.lit(margin)
            >= F.lit(2.0) + F.col("n") / F.lit(float(accuracy)),
            F.col("lo_raw"),
        ).otherwise(F.lit(float("-inf"))),
    ).drop("lo_raw")
    joined = df.select(g, v.alias("__v")).join(
        F.broadcast(stats), group_col
    )
    # non-null values split exactly into below-bracket and kept, so
    # n_below = n - |kept| — derived in the kept frame's own window
    # pass instead of a second full scan + join of df
    kept = joined.filter(F.col("__v") >= F.col("lo"))
    w = Window.partitionBy(group_col).orderBy("__v")
    w_all = Window.partitionBy(group_col)
    ranked = kept.withColumn(
        "grank",
        (F.col("n") - F.count(F.lit(1)).over(w_all))
        + F.row_number().over(w)
        - 1,
    )
    cand = ranked.filter(
        (F.col("grank") == F.col("k")) | (F.col("grank") == F.col("k") + 1)
    )
    out = cand.groupBy(group_col).agg(
        F.first("n").alias("n"),
        F.first("p_approx").alias("p_approx"),
        F.first("frac").alias("frac"),
        F.max(F.when(F.col("grank") == F.col("k"), F.col("__v"))).alias(
            "xk"
        ),
        F.max(
            F.when(F.col("grank") == F.col("k") + 1, F.col("__v"))
        ).alias("xk1"),
    )
    # xk missing means the bracket overshot the target rank — loud
    # failure, never a silently-wrong quantile
    guarded = out.withColumn(
        "p_exact",
        F.when(
            F.col("xk").isNull(),
            F.raise_error(
                F.concat(
                    F.lit("exact_percentile_bracketed: bracket missed "
                          "target rank for group "),
                    F.col(group_col).cast("string"),
                )
            ).cast("double"),
        ).otherwise(
            # (1-frac)*lower + frac*higher — the exact FP expression
            # Spark's Percentile (and DuckDB's quantile_cont) evaluate,
            # so the result is bit-identical, not just within 1 ulp
            (F.lit(1.0) - F.col("frac")) * F.col("xk")
            + F.col("frac") * F.coalesce("xk1", "xk")
        ),
    )
    result = guarded.select(group_col, "n", "p_exact", "p_approx")
    # all-NULL groups never reach the tail (every __v is null): emit
    # them with a NULL percentile, as the percentile aggregate does
    empty = stats.filter(F.col("n") == 0).select(
        group_col,
        "n",
        F.lit(None).cast("double").alias("p_exact"),
        F.lit(None).cast("double").alias("p_approx"),
    )
    return result.unionByName(empty)


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Closed-form per-group simple linear regression (OLS trend):
    one hash-aggregate over the data, no iteration, no driver state —
    the distributed shape of "fit a trend line per key" at any scale.

    ``x_col`` and ``y_col`` must be INTEGER columns (epoch days,
    cents): every moment sum (Sx, Sy, Sxy, Sxx, Syy) is then an EXACT
    bigint, immune to the order-dependent rounding of distributed
    double summation, and the slope/intercept/r2 ratios are computed
    from those exact integers with one float division each — the same
    IEEE result in any engine (the cross-engine parity rule this repo
    verifies against DuckDB). Center x per group upstream to keep the
    products within int64 at very large |x|.

    Returns (group, n, slope, intercept, r2); slope/r2 are null for
    degenerate groups (constant x — and constant y for r2).
    """
    # Widen BEFORE multiplying: a 32-bit x_col would otherwise compute
    # x*x in int32 — ANSI overflow error (or a silent wrap with ANSI
    # off) long before the int64 bound the moments are designed for.
    xb = F.col(x_col).cast("bigint")
    yb = F.col(y_col).cast("bigint")
    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xb).alias("sx"),
        F.sum(yb).alias("sy"),
        F.sum(xb * yb).alias("sxy"),
        F.sum(xb * xb).alias("sxx"),
        F.sum(yb * yb).alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(
        var_x != 0, cov_n.cast("double") / var_x.cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2 = F.when(
        (var_x != 0) & (var_y != 0),
        (cov_n.cast("double") * cov_n.cast("double"))
        / (var_x.cast("double") * var_y.cast("double")),
    )
    return g.select(
        group_col,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
