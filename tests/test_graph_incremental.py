"""pagerank + incremental agg-state units."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from diachronic_spark.operators.graph import pagerank
from diachronic_spark.operators.incremental import agg_state, merge_states


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # a->b->c->a with equal weights: pr must stay uniform at 1/3
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    pr = {r["node"]: r["pr"] for r in pagerank(e, iterations=3).collect()}
    assert all(math.isclose(v, 1 / 3, rel_tol=1e-6) for v in pr.values())


def test_pagerank_mass_conserved_with_dangling(spark):
    # b is dangling (no out-edges): its mass redistributes; total stays 1
    e = spark.createDataFrame(
        [("a", "b", 2.0), ("c", "b", 1.0), ("a", "c", 1.0)],
        "src string, dst string, w double",
    )
    rows = pagerank(e, iterations=4).collect()
    total = sum(r["pr"] for r in rows)
    assert math.isclose(total, 1.0, abs_tol=1e-6)
    pr = {r["node"]: r["pr"] for r in rows}
    assert pr["b"] > pr["c"] > 0  # b receives from both a and c


def test_pagerank_weight_sensitivity(spark):
    # heavier edge a->b than a->c: b must outrank c
    e = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    pr = {r["node"]: r["pr"] for r in pagerank(e, iterations=5).collect()}
    assert pr["b"] > pr["c"]


def test_pagerank_local_equals_distributed(spark):
    # the two execution shapes (driver-iterated vs persist-per-
    # iteration Pregel) land on identical 10dp-rounded fixpoints
    e = spark.createDataFrame(
        [
            ("a", "b", 2.0),
            ("b", "c", 1.0),
            ("c", "a", 3.0),
            ("a", "c", 1.0),
            ("d", "a", 1.0),
        ],
        "src string, dst string, w double",
    )
    loc = sorted(map(tuple, pagerank(e, mode="local").collect()))
    dist = sorted(map(tuple, pagerank(e, mode="distributed").collect()))
    assert loc == dist


def test_agg_state_merge_equals_direct(spark):
    df = spark.createDataFrame(
        [("k1", i * 1.0) for i in range(10)]
        + [("k2", i * 2.0) for i in range(5)],
        "k string, v double",
    )
    direct = agg_state(df, ["k"], ["v"])
    parts = [
        agg_state(df.filter(F.col("v") < 6), ["k"], ["v"]),
        agg_state(df.filter(F.col("v") >= 6), ["k"], ["v"]),
    ]
    merged = merge_states(parts, ["k"])
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_merge_states_rejects_non_algebraic_columns(spark):
    bad = spark.createDataFrame([("k1", 1.5)], "k string, avg_v double")
    try:
        merge_states([bad], ["k"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "non-algebraic" in str(e)


def test_pagerank_auto_dispatch(spark, monkeypatch):
    """mode='auto' measures the edge count: small graphs reuse the probe
    rows driver-side; past the threshold the distributed loop runs."""
    import diachronic_spark.operators.graph as graph_mod

    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
         ("a", "c", 2.0), ("c", "b", 1.0)],
        "src string, dst string, w double",
    )
    expected = sorted(
        map(tuple, graph_mod.pagerank(e, mode="local", iterations=3).collect())
    )

    calls = []
    real_distributed = graph_mod._pagerank_distributed

    def spy(*args, **kw):
        calls.append("distributed")
        return real_distributed(*args, **kw)

    monkeypatch.setattr(graph_mod, "_pagerank_distributed", spy)

    got = sorted(
        map(
            tuple,
            graph_mod.pagerank(
                e, mode="auto", iterations=3, local_edge_threshold=100
            ).collect(),
        )
    )
    assert got == expected and calls == []

    got = sorted(
        map(
            tuple,
            graph_mod.pagerank(
                e, mode="auto", iterations=3, local_edge_threshold=2
            ).collect(),
        )
    )
    assert got == expected and calls == ["distributed"]


def test_triangle_counts_known_graph(spark):
    from diachronic_spark.operators.graph import triangle_counts

    # K4 on {a,b,c,d} (every vertex in C(3,3)=3 triangles) plus a
    # pendant edge d-e (e in none), duplicate/reversed/self edges
    # to exercise canonicalization.
    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
        ("e", "e"), ("c", "b"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: r.n_triangles
        for r in triangle_counts(df).collect()
    }
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}
