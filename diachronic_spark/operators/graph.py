"""Weighted PageRank over an edge DataFrame — the iterative-algorithm
complement of dedup.connected_components (min-label propagation).

Reference scope note: the reference has no graph ops at all (SURVEY
§2.13); this is an EXT operator in the iterative family (q51 k-means,
q52 components, q65 recursive CTE) that a training-data pipeline uses
for site/domain authority weighting and dedup-cluster ranking.

Execution shapes (the similarity.kmeans dual, applied to a graph
fixpoint):

- **local** (default for small graphs): the edge/out-degree prep is
  distributed — one shuffle — then the KB-scale (u, v, frac) table is
  collected and the rank vector iterates driver-side. Rank state for
  even a 10M-node graph is MBs; the iteration is pure arithmetic on
  the driver exactly like kmeans' driver-checkpointed centroids, and
  the result re-parallelizes. No per-iteration Spark jobs at all.
- **distributed**: each iteration is one join edge⋈rank + one
  hash-agg on dst (the Pregel-as-dataframe step), with the rank DF
  persisted+materialized per iteration so lineage stays flat — for
  graphs whose EDGE table is itself beyond driver memory.

Ranks round to a fixed precision each iteration, which (a) makes the
fixpoint deterministic across partition orders, engines, and the two
execution shapes (the q51 trick) and (b) costs nothing at graph
scale.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ._config import LOCAL_EDGE_THRESHOLD


def _prep(edges: DataFrame, src: str, dst: str, weight: str):
    """(nodes, frac, dangling) — one distributed pass over edges."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    out = edges.groupBy(F.col(src).alias("node")).agg(
        F.sum(weight).alias("wout")
    )
    frac = edges.join(out, edges[src] == out["node"]).select(
        F.col(src).alias("u"),
        F.col(dst).alias("v"),
        (F.col(weight) / F.col("wout")).alias("frac"),
    )
    dangling = nodes.join(out, "node", "left_anti")
    return nodes, frac, dangling


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
    iterations: int = 5,
    precision: int = 10,
    mode: str = "auto",
    local_edge_threshold: int = LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution.

    pr_{t+1}(v) = (1-d)/N + d * (Σ_{(u,v)} pr_t(u)·w(u,v)/out(u)
                                 + dangling_t / N)

    Returns (node, pr). ``mode='local'`` collects the normalized edge
    fractions (driver-side state: O(E) for the fractions, O(V) for the
    ranks) and iterates without Spark jobs; ``mode='distributed'``
    keeps everything as DataFrames with a persist per iteration.
    ``mode='auto'`` (default) measures instead of trusting the caller:
    the edge set is persisted and counted in one parallel pass (not
    ``limit(n).collect()``, whose incremental partition waves re-run
    an expensive upstream pipeline), then either branch reads edges
    from the cache — the upstream pipeline executes exactly once.
    """
    if mode == "auto":
        cached = edges.select(src, dst, weight).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            if cached.count() <= local_edge_threshold:
                return _pagerank_local(
                    edges, src, dst, weight, damping, iterations, precision,
                    rows=[(r[0], r[1], r[2]) for r in cached.collect()],
                )
            return _pagerank_distributed(
                cached, src, dst, weight, damping, iterations, precision
            )
        finally:
            cached.unpersist()
    if mode == "local":
        return _pagerank_local(
            edges, src, dst, weight, damping, iterations, precision
        )
    return _pagerank_distributed(
        edges, src, dst, weight, damping, iterations, precision
    )


def _pagerank_local(
    edges, src, dst, weight, damping, iterations, precision, rows=None
):
    spark = edges.sparkSession
    # ONE Spark job: collect the (already aggregated) edge table; node
    # set, out-degrees, fractions, and dangling set are O(E) driver
    # arithmetic — by this mode's precondition that's KB-to-MB scale.
    # (Deriving them as DataFrames would re-run the upstream edge
    # build once per collect unless the caller persisted it.)
    if rows is None:
        rows = [
            (r[0], r[1], r[2])
            for r in edges.select(src, dst, weight).collect()
        ]
    nodes = sorted({u for u, _, _ in rows} | {v for _, v, _ in rows})
    wout: dict = {}
    for u, _, w in rows:
        wout[u] = wout.get(u, 0.0) + w
    frac = [(u, v, w / wout[u]) for u, v, w in rows]
    dangling = {v for v in nodes if v not in wout}
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    # Deterministic accumulation order: fractions sorted by (u, v).
    frac.sort(key=lambda t: (t[0], t[1]))
    for _ in range(iterations):
        dang = sum(pr[v] for v in nodes if v in dangling)
        contrib = {v: 0.0 for v in nodes}
        for u, v, f in frac:
            contrib[v] += pr[u] * f
        base = (1.0 - damping) / n
        pr = {
            v: _round_half_up(
                base + damping * (contrib[v] + dang / n), precision
            )
            for v in nodes
        }
    src_field = edges.schema[src]
    schema = StructType(
        [
            StructField("node", src_field.dataType, True),
            StructField("pr", DoubleType(), False),
        ]
    )
    from ._cache import local_relation

    return local_relation(spark, [(v, pr[v]) for v in nodes], schema)


def _round_half_up(x: float, p: int) -> float:
    """Multiplicative HALF_UP — matches DuckDB's round and the
    distributed mode's floor(x*m + 0.5)/m, NOT Python's banker's
    rounding and NOT Spark's F.round (which rounds via the double's
    shortest-decimal repr and disagrees at half boundaries like
    1.005). All three execution paths use this same form."""
    import math

    m = 10.0**p
    return math.floor(x * m + 0.5) / m


def _pagerank_distributed(
    edges, src, dst, weight, damping, iterations, precision
):
    nodes, frac, dangling_nodes = _prep(edges, src, dst, weight)
    nodes = nodes.persist()
    n = nodes.count()
    frac = frac.persist()
    dangling_nodes = dangling_nodes.persist()

    pr = nodes.withColumn("pr", F.lit(1.0 / n)).persist()
    pr.count()
    for _ in range(iterations):
        contrib = (
            frac.join(pr, frac["u"] == pr["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("frac")).alias("c"))
        )
        dang = dangling_nodes.join(pr, "node").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang")
        )
        nxt = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                # multiply-floor HALF_UP, NOT F.round: Spark's round()
                # goes through the double's shortest-decimal repr
                # (BigDecimal.valueOf) and rounds 1.005 -> 1.01 where
                # the multiplicative form (and DuckDB, and
                # _round_half_up in local mode) yields 1.00 — the
                # three paths must agree at half boundaries
                (
                    F.floor(
                        (
                            F.lit((1.0 - damping) / n)
                            + F.lit(damping)
                            * (
                                F.coalesce(F.col("c"), F.lit(0.0))
                                + F.col("dang") / n
                            )
                        )
                        * F.lit(10.0**precision)
                        + F.lit(0.5)
                    )
                    / F.lit(10.0**precision)
                ).alias("pr"),
            )
            .persist()
        )
        nxt.count()  # materialize: flat lineage, one job per iteration
        pr.unpersist()
        pr = nxt
    # internals are no longer needed once pr is materialized (pr's
    # lineage can recompute them if its cache is evicted — correctness
    # is unaffected, only re-read cost)
    for df in (nodes, frac, dangling_nodes):
        df.unpersist()
    return pr


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    cache_key: str | None = None,
) -> DataFrame:
    """Per-node triangle participation counts over the undirected
    simple graph induced by ``edges`` (direction, self-loops, and
    duplicates dropped). Completes the graph family (connected
    components, PageRank) with the standard clustering/cohesion
    primitive.

    Node-ordered enumeration: canonicalize every edge to (a < b),
    build wedges a-b-c with a < b < c by joining edge lists on the
    middle vertex, then close each wedge with an edge-existence join
    on (a, c). Each triangle is counted exactly once — at its ordered
    orientation — so no division by 6, and the node ordering bounds
    the join fan-out by the ordered degree (the same degeneracy trick
    that makes distributed triangle counting tractable on skewed
    graphs; orient by degree instead of id when hubs dominate).
    All joins are equi-joins on vertex ids: three shuffles, no
    driver-side state, nothing quadratic in the vertex count.

    Returns every node of the simple graph with its count (nodes in
    no triangle included with 0).

    ``cache_key``: the canonical edge set ``e`` has FOUR consumers in
    this plan (both wedge sides, the closing existence join, and the
    node spine) — without a persist the caller's entire upstream
    edge-build pipeline re-executes once per consumer (guide §5:
    cache a relation reused by a diamond plan; measured on q127's
    5-join TPC-H edge build: 4x re-execution, 43 warm jobs). Pass a
    managed-cache site key to persist ``e`` once per run; the edge
    set is by construction no larger than the input edge list.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if cache_key is not None:
        from ._cache import managed_persist

        e = managed_persist(e, cache_key)
    wedge = e.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )
    tri = wedge.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    )
    hits = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    return nodes.join(hits, "node", "left").select(
        "node",
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("bigint")
        .alias("n_triangles"),
    )
