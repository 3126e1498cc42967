"""Count-min sketch: mergeable heavy-hitter frequency estimation.

Complements the q60/q64 sketch family (HLL for distinct counts, KLL
for quantiles) with the third classic mergeable summary: point
frequency estimates over an unbounded key domain in O(d*w) space.
At 100 TB the full token-frequency table is itself huge and hot-key
skewed; a CMS cell grid is a few KB, merges across
partitions/days/languages by plain cell-wise SUM (the same
no-raw-rescan rollup pattern as q60), and over-estimates only —
est >= true count always, est <= true + eps*N with eps ~ e/w.

Hashing is the portable md5-nibble 32-bit base (same family as
sampling/hash_split) pushed through d independent affine rehashes mod
a Mersenne prime — replayable in any engine with md5, which is what
lets the DuckDB oracle rebuild the identical grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CM_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
# Small odd multipliers; independence across rows comes from the +j
# offset and the multiplier, as in operators/dedup.MINHASH_A.
CM_A = (1_000_003, 1_048_573, 1_299_709, 1_500_007)


def _base32(col: Column) -> Column:
    """First 8 md5 hex chars of the value -> 32-bit int (portable)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def cm_bucket(col: Column, j: int, width: int) -> Column:
    """Row-``j`` bucket of ``col`` in a ``width``-wide CMS row."""
    return ((_base32(col) * CM_A[j] + j) % CM_P) % width


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    partial_by: list[str] | None = None,
) -> DataFrame:
    """Build CMS cells ``(j, b, n)`` over ``df[key_col]`` occurrences.

    With ``partial_by``, emits one partial grid per group (columns
    ``partial_by + [j, b, n]``) — merge partials with
    :func:`count_min_merge`. One explode(d) + one hash-agg: the
    map-side partial combine collapses each partition to <= d*w rows
    before the shuffle, so the exchange is O(d*w) per partition
    regardless of input size.
    """
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    cm_bucket(F.col(key_col), j, width).alias("b"),
                )
                for j in range(depth)
            ]
        )
    ).alias("__cm")
    keys = list(partial_by or [])
    return (
        df.select(*keys, probes)
        .groupBy(*keys, "__cm.j", "__cm.b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def count_min_merge(partials: DataFrame) -> DataFrame:
    """Merge partial grids by cell-wise sum (drops the partial keys)."""
    return partials.groupBy("j", "b").agg(F.sum("n").alias("n"))


def count_min_estimate(
    cells: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    out_col: str = "cm_est",
) -> DataFrame:
    """Estimate the count of each probe key: min over the d cells the
    key hashes to. ``cells`` is tiny (<= d*w rows) and broadcast; a
    missing cell means count 0.
    """
    pr = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cm_bucket(F.col(key_col), j, width).alias("b"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__p"),
    )
    j = pr.join(
        F.broadcast(cells),
        (pr["__p.j"] == cells["j"]) & (pr["__p.b"] == cells["b"]),
        "left",
    )
    others = [c for c in probes.columns]
    return (
        j.groupBy(*others)
        .agg(F.min(F.coalesce(cells["n"], F.lit(0))).alias(out_col))
    )
