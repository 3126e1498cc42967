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
