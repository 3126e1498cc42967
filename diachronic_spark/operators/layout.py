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
