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
