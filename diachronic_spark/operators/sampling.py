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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import md5_prefix32


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
