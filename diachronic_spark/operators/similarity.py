"""Similarity search over array<float> embeddings (SURVEY §2.11 L3).

- ``brute_force_topk``: exact cosine top-k — broadcast the query
  vector(s), expression-only dot product, TakeOrderedAndProject. The
  correctness baseline at any scale (linear scan).
- ``ivf_topk``: IVF-style approximate search — assign vectors to coarse
  cells (here: the fixture's ``label`` column; in production a k-means
  assignment column computed offline), probe only the cell(s) whose
  centroid is nearest the query. Turns a full scan into a partition-
  pruned scan: with cell as a partition column, Catalyst prunes
  untouched cells entirely — the 100 TB path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cosine_similarity


def brute_force_topk(
    emb: DataFrame, query_vec_id: int, k: int = 5, round_to: int = 4
) -> DataFrame:
    qv = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding")
    )
    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                cosine_similarity("embedding", "q_embedding"), round_to
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def centroids_by_cell(emb: DataFrame, cell: str = "label", dim: int = 64) -> DataFrame:
    """Per-cell mean vector, computed element-wise: posexplode → avg →
    re-assemble ordered. Two narrow shuffles on tiny keys (cell, pos)."""
    exploded = emb.select(
        F.col(cell).alias("cell"), F.posexplode("embedding").alias("pos", "v")
    )
    means = exploded.groupBy("cell", "pos").agg(
        F.avg(F.col("v").cast("double")).alias("cv")
    )
    return (
        means.groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "cv"))
            ).alias("pcs")
        )
        .select(
            "cell", F.transform("pcs", lambda s: s["cv"]).alias("centroid")
        )
    )


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 5,
    cell: str = "label",
    n_probe: int = 1,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: search only the n_probe cells nearest the query."""
    cents = centroids_by_cell(emb, cell)
    qv = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding")
    )
    probe_cells = (
        cents.crossJoin(F.broadcast(qv))
        .select(
            "cell",
            cosine_similarity("centroid", "q_embedding").alias("c_sim"),
        )
        .orderBy(F.desc("c_sim"), F.asc("cell"))
        .limit(n_probe)
        .select("cell")
    )
    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .join(
            F.broadcast(probe_cells), F.col(cell) == F.col("cell"), "left_semi"
        )
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                cosine_similarity("embedding", "q_embedding"), round_to
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


# --- embedding-cosine near-duplicate detection (L2/L3 hybrid) -------------
#
# Random-hyperplane (SRP) LSH: sign(v·r) bits are locality-sensitive for
# cosine — P[bit differs] = angle/pi (Charikar, STOC'02). Banding the
# bits turns all-pairs search into an equi-join on (band, bucket): the
# quadratic candidate space never materializes, only same-bucket pairs.
# At 100 TB the bucket join shuffles on a well-spread key (md5-derived
# bits), and signature extraction is a map-only projection.


def _srp_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state,
    so the signature of a vector is reproducible across runs/engines."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"srp:{p}:{i}".encode()).hexdigest()[:8], 16)
            / 2**31
            - 1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def with_near_duplicate_vectors(emb: DataFrame, id_below: int = 50) -> DataFrame:
    """Augment embeddings with perturbed copies (vec_id + 100000): a
    deterministic, SQL-replicable analog of dedup.with_near_duplicates
    for the vector domain. Component i gets ((vec_id*64 + i) % 7 - 3) *
    0.005 added — cosine(orig, dup) ≈ 0.997 on unit vectors, while the
    fixture's max unrelated-pair cosine is ~0.51."""
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("emb"),
    )
    dups = emb.filter(F.col("vec_id") < id_below).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda v, i: v.cast("double")
            + ((F.col("vec_id") * 64 + i) % 7 - 3) * 0.005,
        ).alias("emb"),
    )
    return base.unionByName(dups)


def srp_signature(
    emb: DataFrame,
    vec_col: str = "emb",
    n_planes: int = 32,
    dim: int = 64,
) -> DataFrame:
    """One sign bit per hyperplane, computed map-side: the plane
    components are plan-time literals, so each bit is a fold over
    zip_with(vec, lit_array) — no shuffle, no UDF. Right for small
    plane counts where staying inside codegen beats an Arrow hop; for
    the hundreds of planes banded near-dup needs, use srp_band_keys
    (vectorized matmul) instead."""
    planes = _srp_planes(n_planes, dim)
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(c) for c in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0
        )
        .cast("int")
        .alias(f"b{p}")
        for p, plane in enumerate(planes)
    ]
    return emb.select("vec_id", vec_col, *bits)


def srp_band_keys(
    n_planes: int = 384, band_size: int = 16, dim: int = 64
):
    """Arrow-vectorized band-key extraction: one BLAS matmul per batch
    computes every sign bit ((n, dim) @ (dim, n_planes)), then a
    reshape-matmul packs each band's bits into an int64 key. 384 plane
    dots per vector is where the JVM higher-order-function fold loses to
    NumPy by >10x — the deliberate Pandas-UDF exception to the
    built-ins-first rule. Map-only: no shuffle, scales linearly."""
    from pyspark.sql.types import ArrayType, LongType

    P = np.array(_srp_planes(n_planes, dim))
    W = (1 << np.arange(band_size)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def band_keys(emb: pd.Series) -> pd.Series:
        E = np.vstack(emb.to_numpy())
        bits = (E @ P.T >= 0).astype(np.int64)
        keys = bits.reshape(len(E), -1, band_size) @ W
        return pd.Series(list(keys))

    return band_keys


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 384,
    band_size: int = 16,
    dim: int = 64,
) -> DataFrame:
    """(vec_a, vec_b, cos_sim) for all pairs with cosine >= threshold.

    SRP band keys → same-(band, bucket) self-join → exact cosine verify.
    Near-dup detection wants a HIGH threshold, which is exactly where
    banded SRP is selective: with 24 bands of 16 bits, a pair at cosine
    0.99 (per-bit agreement 0.955) survives >= 1 band with
    P = 1 - (1 - 0.955^16)^24 ≈ 1 - 1.5e-7, while an unrelated pair
    (agreement ~0.5) collides with P ≈ 24 * 2^-16 ≈ 4e-4 — the
    candidate set stays ~linear in n, not n². Short bands (e.g. 8x4)
    look cheaper but collapse: 4 agreeing bits happen by chance 1/16 of
    the time, regenerating the quadratic pair space. The exact-cosine
    pass makes the output equal to brute force up to that ~1e-7 recall
    gap, which is what justifies a brute-force SQL oracle.
    """
    buckets = emb.select(
        "vec_id",
        F.posexplode(srp_band_keys(n_planes, band_size, dim)("emb")).alias(
            "band", "bucket"
        ),
    )
    pairs = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    za = emb.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    zb = emb.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    return (
        pairs.join(za, "vec_a")
        .join(zb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            cosine_similarity("ea", "eb").alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
