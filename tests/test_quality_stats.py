"""quality audit, snapshot_diff, histogram units."""

from __future__ import annotations

from pyspark.sql import functions as F

from diachronic_spark.operators.merge import merge_upsert, snapshot_diff
from diachronic_spark.operators.quality import (
    audit,
    fk_violations,
    range_violations,
    unique_violations,
)
from diachronic_spark.operators.stats import equi_width_histogram


def test_quality_checks(spark):
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k int, v string"
    )
    parent = spark.createDataFrame([(1,), (2,)], "k int")
    child = spark.createDataFrame(
        [(1,), (9,), (None,)], "fk int"
    )  # 9 orphan; NULL is not a violation
    vals = spark.createDataFrame([(5,), (50,), (None,)], "x int")
    out = {
        r["check_name"]: r["n_violations"]
        for r in audit(
            {
                "uniq": unique_violations(dup, ["k"]),
                "fk": fk_violations(child, "fk", parent, "k"),
                "rng": range_violations(vals, F.col("x") <= 10),
            }
        ).collect()
    }
    assert out == {"uniq": 1, "fk": 1, "rng": 2}  # rng: 50 + NULL


def test_snapshot_diff_roundtrips_merge(spark):
    t = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "k int, v double"
    )
    src = spark.createDataFrame(
        [(2, "U", 9.0), (3, "D", None), (7, "I", 7.0)],
        "k int, op string, v double",
    )
    d = snapshot_diff(t, merge_upsert(t, src, "k", ["v"]), "k", ["v"])
    got = {(r["k"], r["change_type"]) for r in d.collect()}
    assert got == {(2, "changed"), (3, "removed"), (7, "added")}


def test_snapshot_diff_null_safe_compare(spark):
    a = spark.createDataFrame([(1, None), (2, None)], "k int, v double")
    b = spark.createDataFrame([(1, None), (2, 5.0)], "k int, v double")
    got = {(r["k"], r["change_type"]) for r in
           snapshot_diff(a, b, "k", ["v"]).collect()}
    assert got == {(2, "changed")}  # NULL==NULL is unchanged


def test_histogram_bins_and_degenerate(spark):
    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    h = {r["bin"]: r["n"] for r in
         equi_width_histogram(df, "x", bins=3).collect()}
    # width 3: [0,3) [3,6) [6,9], max lands in last bin
    assert h == {0: 3, 1: 3, 2: 4}
    one = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    rows = equi_width_histogram(one, "x", bins=4).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 2


def test_q69_profiles_every_column_on_empty_input(spark):
    """The profile is anchored on the literal column list: an empty
    (or fully filtered) table still yields one row per profiled column
    with zero counts and null bounds, matching the oracle's UNION ALL
    of GROUP-BY-less aggregates."""
    import diachronic_spark.plans.ext_queries as X
    from diachronic_spark.catalog import load as real_load
    from pyspark.sql import functions as F

    empty_li = real_load(spark, "/root/testdata/sf0.001", "lineitem").filter(
        F.lit(False)
    )
    orig = X.load
    X.load = lambda s, sf, t: empty_li if t == "lineitem" else orig(s, sf, t)
    try:
        rows = X.q69(spark, "/root/testdata/sf0.001").collect()
    finally:
        X.load = orig
    assert [(r.col_name, r.n_nulls, r.n_distinct, r.min_v, r.max_v)
            for r in rows] == [
        (c, 0, 0, None, None) for c in X.PROFILE_COLS
    ]
