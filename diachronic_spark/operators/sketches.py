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

from pyspark.sql import Column, DataFrame, Window

from ..functions import md5_prefix32
from pyspark.sql import functions as F

CM_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
# Small odd multipliers; independence across rows comes from the +j
# offset and the multiplier, as in operators/dedup.MINHASH_A.
CM_A = (1_000_003, 1_048_573, 1_299_709, 1_500_007)


def _base32(col: Column) -> Column:
    """First 8 md5 hex chars of the value -> 32-bit int (portable) —
    the shared engine-wide definition (functions.md5_prefix32)."""
    return md5_prefix32(col)


def cm_bucket(col: Column, j: int, width: int) -> Column:
    """Row-``j`` bucket of ``col`` in a ``width``-wide CMS row."""
    return ((_base32(col) * CM_A[j] + j) % CM_P) % width


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    partial_by: list[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Build CMS cells ``(j, b, n)`` over ``df[key_col]`` occurrences.

    With ``partial_by``, emits one partial grid per group (columns
    ``partial_by + [j, b, n]``) — merge partials with
    :func:`count_min_merge`. One explode(d) + one hash-agg: the
    map-side partial combine collapses each partition to <= d*w rows
    before the shuffle, so the exchange is O(d*w) per partition
    regardless of input size.

    ``weight_col`` (OPTIMIZATION r11): build from PRE-AGGREGATED
    ``(key, count)`` rows instead of raw occurrences — each key row
    contributes ``weight_col`` to its cells via an integer SUM, the
    exact value counting the expanded occurrences would produce
    (guide §2.3 "aggregate before you shuffle": a caller that already
    needs per-key counts can feed the same tiny table here instead of
    exploding the raw stream a second time).
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
    n = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(weight_col).cast("bigint")
    )
    cols = keys + ([] if weight_col is None else [weight_col])
    return (
        df.select(*cols, probes)
        .groupBy(*keys, "__cm.j", "__cm.b")
        .agg(n.alias("n"))
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


# --- KMV (k-minimum-values) distinct sketch ---------------------------------
# The fourth classic mergeable summary: where HLL (q60) answers "how
# many distinct" per set, KMV additionally supports SET ALGEBRA on the
# sketches themselves — union by merging hash lists, intersection by
# the Jaccard-over-threshold estimator (Beyer et al., SIGMOD'07 /
# the theta-sketch construction) — without rescanning raw data. At
# 100 TB that is the difference between "distinct users per segment"
# and "distinct users in segment A AND B" from the same KB-scale
# state. Hashing is the portable md5-nibble 32-bit base so any engine
# with md5 can rebuild the identical sketch (the DuckDB oracle does).


def kmv_build(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """(group, sorted array of the k smallest distinct value hashes).

    Shape: distinct on (group, hash) — one shuffle with map-side
    partial dedup — then a per-group window keeps rank <= k. The
    window sorts only the surviving distincts per group; with heavy
    groups a two-stage per-partition pre-truncation would bound that
    sort, but the distinct pass already caps rows at the distinct
    cardinality, which is the quantity being estimated precisely
    because it is assumed huge-but-boundable. State per group is k
    ints — mergeable by ``kmv_merge`` with no raw rescan.
    """
    hv = _base32(F.col(value_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy("hv")
    return (
        df.select(F.col(group_col), hv.alias("hv"))
        # NULL values don't count toward distinct cardinality — and a
        # null hv would sort NULLS FIRST into rank 1, silently
        # shrinking the sketch when collect_list later drops it.
        .filter(F.col("hv").isNotNull())
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_list("hv")).alias("kmv"))
    )


def kmv_estimate(kmv: Column, k: int) -> Column:
    """Distinct-count estimate from a KMV array: exact (= array size)
    when the set had fewer than k distinct values — the sketch IS the
    set — else the unbiased (k-1) / U_(k) with U the k-th smallest
    hash normalized to (0,1): (k-1) * 2^32 / h_k."""
    n = F.size(kmv)
    kth = F.element_at(kmv, k).cast("double")
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(4294967296.0) / kth
    )


def kmv_merge(a: Column, b: Column, k: int) -> Column:
    """Union sketch: k smallest of the merged distinct hash lists —
    exactly the sketch that scanning A ∪ B would have produced, which
    is what makes KMV mergeable across partitions/days/segments."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_intersection_estimate(a: Column, b: Column, k: int) -> Column:
    """|A ∩ B| estimate from two KMV sketches: count common hashes at
    or below the union sketch's threshold (the k-th smallest of the
    union), scale by the union estimate — c/k' is the Jaccard
    estimator restricted to the union's uniform sample. Exact when
    |A ∪ B| < k (the sketches are the sets)."""
    merged = kmv_merge(a, b, k)
    thresh = F.element_at(merged, F.size(merged))
    c = F.size(
        F.filter(F.array_intersect(a, b), lambda h: h <= thresh)
    )
    return (
        c.cast("double")
        * kmv_estimate(merged, k)
        / F.size(merged).cast("double")
    )
