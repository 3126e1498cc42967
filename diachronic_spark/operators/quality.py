"""Data-quality constraint auditing (dbt-test / Deequ-style) — run a
set of declared constraints over tables in one pass each and emit a
(check_name, n_violations) summary.

A training-data pipeline gates every ingest batch on exactly these
checks (PK uniqueness, FK integrity, accepted ranges); at 100 TB each
check is a single aggregation or anti-join the optimizer can fuse
with the scan — never a row-by-row validator. All checks are lazy
1-row aggregates UNION ALLed into one DataFrame, so the whole audit
is one action.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unique_violations(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows in excess of one per key: n_rows - n_distinct_keys.
    One hash-agg; no self-join."""
    return df.agg(
        (
            F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys])
        ).alias("n")
    )


def fk_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose key has no parent (left anti join count).
    Null FKs are not violations (SQL FK semantics)."""
    c = child.select(F.col(child_key).alias("__fk")).filter(
        F.col("__fk").isNotNull()
    )
    p = parent.select(F.col(parent_key).alias("__fk"))
    return c.join(p, "__fk", "left_anti").agg(F.count(F.lit(1)).alias("n"))


def range_violations(df: DataFrame, pred: Column) -> DataFrame:
    """Rows NOT satisfying the accepted-range predicate. Nulls count
    as violations (they fail the acceptance test)."""
    ok = F.coalesce(pred, F.lit(False))
    return df.agg(F.sum((~ok).cast("long")).alias("n"))


def audit(checks: dict[str, DataFrame]) -> DataFrame:
    """Combine named 1-row violation counts into (check_name,
    n_violations), one UNION ALL plan / one action."""
    out = None
    for name, cnt in checks.items():
        row = cnt.select(
            F.lit(name).alias("check_name"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias(
                "n_violations"
            ),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("no checks given")
    return out
