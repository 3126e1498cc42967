"""merge_upsert (SCD1 MERGE), weighted_sample_k, rolling_median units."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from diachronic_spark.operators.merge import merge_upsert
from diachronic_spark.operators.sampling import weighted_sample_k
from diachronic_spark.operators.timeseries import rolling_median


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, name string, v double",
    )


def test_merge_update_insert_delete(spark):
    src = spark.createDataFrame(
        [
            (2, "U", 99.0, None),
            (3, "D", None, None),
            (4, "I", 40.0, "d"),
        ],
        "k int, op string, v double, name string",
    )
    out = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(_target(spark), src, "k", ["v"]).collect()
    }
    assert out == {
        1: ("a", 10.0),   # untouched passthrough
        2: ("b", 99.0),   # updated v, name kept (source name null)
        4: ("d", 40.0),   # inserted
    }  # 3 deleted


def test_merge_unmatched_update_is_noop_and_matched_insert_keeps_target(spark):
    src = spark.createDataFrame(
        [
            (5, "U", 99.0, None),   # no key 5 in target: WHEN MATCHED
            (1, "I", 77.0, "zz"),   # key 1 exists: WHEN NOT MATCHED
        ],
        "k int, op string, v double, name string",
    )
    out = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(_target(spark), src, "k", ["v"]).collect()
    }
    assert 5 not in out            # unmatched 'U' must not insert
    assert out[1] == ("a", 10.0)   # matched 'I' leaves the row alone
    assert len(out) == 3


def test_merge_null_update_value_keeps_target(spark):
    # op='U' with a null value in an updatable column = leave it alone
    src = spark.createDataFrame(
        [(1, "U", None, "renamed")], "k int, op string, v double, name string"
    )
    # name is NOT in update_cols -> target value wins even though source
    # carries a value (non-updatable columns only fill inserts)
    row = merge_upsert(_target(spark), src, "k", ["v"]).filter("k=1").first()
    assert (row["name"], row["v"]) == ("a", 10.0)


def test_merge_missing_source_column_passthrough(spark):
    # source lacking a target column entirely -> inserts get null there
    src = spark.createDataFrame([(9, "I", 90.0)], "k int, op string, v double")
    row = merge_upsert(_target(spark), src, "k", ["v"]).filter("k=9").first()
    assert row["v"] == 90.0 and row["name"] is None


def test_weighted_sample_deterministic_and_weight_biased(spark):
    rows = [(i, float(1 + (i % 100))) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, w double")
    a = [r["k"] for r in weighted_sample_k(df, "k", "w", 50).collect()]
    b = [r["k"] for r in weighted_sample_k(df, "k", "w", 50).collect()]
    assert a == b  # pure function of the key
    # heavier rows must be overrepresented: mean weight of the sample
    # should clearly exceed the population mean (~50.5)
    wmap = dict(rows)
    assert sum(wmap[k] for k in a) / len(a) > 60


def test_rolling_median_odd_even_and_warmup(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([10, 20, 30, 40, 50])], "i int, v long"
    )
    out = [
        r["m"]
        for r in rolling_median(df, "i", "v", n=4, out_col="m")
        .orderBy("i")
        .collect()
    ]
    # frames: [10] [10,20] [10,20,30] [10..40] [20..50]
    assert out == [10.0, 15.0, 20.0, 25.0, 35.0]
    assert all(isinstance(v, float) and math.isfinite(v) for v in out)
