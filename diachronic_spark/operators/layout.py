"""Physical-layout operators for shuffle elimination at scale:
bucketed tables (co-located joins) and salted joins (skew spreading).

Neither has a reference analog (the reference never joins beyond its
filename anti-join, /root/reference/main.py:60-71); these are the
100 TB table-layout tools SURVEY §6/SCALE.md call for:

- Bucketing pre-shuffles a fact table ONCE at write time. Every later
  equi-join or aggregation on the bucket key reads co-located buckets
  and skips its exchange entirely — the classic "pay the shuffle once,
  amortize over every downstream query" trade.
- Salting splits a pathologically hot join key across ``n_salts``
  synthetic sub-keys: the small side is replicated n_salts times (a
  bounded blow-up), the big side spreads evenly, and no single task
  owns the whole hot key. AQE's skew-join handles moderate skew
  automatically; salting is for the extreme tail (one key >> one
  executor's memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table.

    Sorting within buckets lets a later sort-merge join skip its sort
    as well as its shuffle — the join degenerates to a linear zip of
    pre-sorted bucket files.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key: when bucket counts
    match (or divide), Catalyst plans a SortMergeJoin with NO Exchange
    on either side (asserted by tests/test_layout.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join that spreads skewed left-side keys over ``n_salts``
    partitions.

    The left (big, skewed) side gets a deterministic pseudo-random salt
    derived from its whole row hash; the right (smaller) side is
    replicated across all salts with ``explode(sequence(...))``. The
    join key becomes (key, salt), so a hot key's rows land in n_salts
    different tasks instead of one straggler. Semantics are identical
    to ``left.join(right, on, how)`` for inner/left joins: every left
    row still meets every matching right row exactly once (the right
    copy with its salt).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(F.struct(*left.columns)), F.lit(n_salts))
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lhs.join(rhs, [on, "__salt"], how).drop("__salt")


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: float = 256,
    range_by: str | list[str] | None = None,
    compression: str = "zstd",
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_mb``-sized files. Returns the output file count.

    The small-files problem is a first-order 100 TB hazard: a
    streaming sink or over-parallel writer leaving millions of KB-scale
    files makes every later scan pay a per-file open/footer-read tax
    and floods the driver with split planning. Compaction is the
    standing maintenance job that keeps scan parallelism proportional
    to data, not to historical writer parallelism.

    Sizing reads the TOTAL source bytes from the filesystem (Hadoop
    FS — works for local paths and object stores alike), not row
    counts, so wide-schema tables size correctly.

    With ``range_by``, output files are RANGE-partitioned on those
    columns: each file then covers a disjoint key range, so parquet
    min/max stats let later selective scans skip whole files —
    compaction doubles as a data-skipping layout pass.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -int(-total_bytes // int(target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(src)
    if range_by is not None:
        cols = [range_by] if isinstance(range_by, str) else list(range_by)
        df = df.repartitionByRange(n_files, *cols)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").option("compression", compression).parquet(dst)
    out = spark.read.parquet(dst)
    return len([f for f in out.inputFiles() if f.endswith(".parquet")])


def _equi_depth_bucket(col: str, boundaries: list[float]) -> F.Column:
    """0-based equi-depth bucket index: the count of boundaries <= x.
    Boundary list is a literal array (KB-scale), so this is a pure
    codegen expression — no join, no shuffle."""
    blit = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(
        F.filter(blit, lambda b: b <= F.col(col).cast("double"))
    ).cast("long")


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 8,
) -> DataFrame:
    """Z-order (Morton-curve) multi-dimensional clustering: the file
    layout that makes selective scans on ANY of ``cols`` skip most
    files, not just scans on the single lead sort key.

    A linear sort on x packs each file into a thin x-slice spanning the
    FULL y range — a y-predicate then intersects every file. Z-order
    interleaves the bits of per-column equi-depth bucket ranks, so each
    file covers a small hyper-rectangle in (x, y, ...) space and
    parquet footer min/max stats prune files for predicates on any
    clustered column (tests assert the bbox-intersection count).

    Mechanics, all scalable: one tiny aggregate computes
    ``approx_percentile`` boundaries per column (2^bits-1 doubles,
    embedded as literals — equi-depth so skew can't collapse buckets),
    the z-value is a pure bit-interleave expression, and the write is
    ``repartitionByRange`` + ``sortWithinPartitions`` on z — one
    shuffle, the same cost as any compaction pass.
    """
    n_buckets = 1 << bits
    qs = [float(k) / n_buckets for k in range(1, n_buckets)]
    bounds = df.select(
        *[
            F.percentile_approx(
                F.col(c).cast("double"), F.array(*[F.lit(q) for q in qs])
            ).alias(c)
            for c in cols
        ]
    ).collect()[0]
    # Materialize each column's bucket rank in its own projection: the
    # z interleave references every bucket ``bits`` times, and
    # CollapseProject never inlines a non-cheap expression with
    # multiple references — so the (2^bits - 1)-element boundary scan
    # runs once per row per column, not once per bit.
    bcols = [f"__b{j}" for j in range(len(cols))]
    with_buckets = df.select(
        "*",
        *[
            _equi_depth_bucket(c, list(bounds[c])).alias(b)
            for c, b in zip(cols, bcols)
        ],
    )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bcols):
            bit = F.shiftright(F.col(b), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return (
        with_buckets.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *bcols)
    )
