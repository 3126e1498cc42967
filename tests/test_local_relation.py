"""Focused tests for the r10 optimization that re-bases small
driver-side relations (fixtures, collected iteration state) on
``operators/_cache.local_relation``: the relation must plan as a
JVM-local LocalTableScan (no pickled-RDD scan, no Python workers at
evaluation) while staying ROW- and TYPE-identical to the classic
``createDataFrame(list)`` path — including NULLs, doubles, and
arrays."""

from __future__ import annotations

from decimal import Decimal

import pytest

from diachronic_spark.operators._cache import fixture_df, local_relation

CASES = [
    ("doc_id bigint, text string, label int", [(1, "a", 1), (2, None, 0)]),
    ("url string, priority double", [("u", 0.5), ("v", None)]),
    ("col_name string", [("x",), ("y",)]),
    ("cell int, c array<double>", [(0, [1.0, 2.5]), (1, [0.0])]),
    ("__pid int, __off decimal(20,2), __nnb boolean",
     [(0, Decimal("1.50"), True), (1, Decimal("0.00"), False)]),
]


@pytest.mark.parametrize("schema,data", CASES)
def test_local_relation_matches_classic_path(spark, schema, data):
    got = local_relation(spark, data, schema)
    ref = spark.createDataFrame(data, schema)
    assert got.schema == ref.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


@pytest.mark.parametrize("schema,data", CASES)
def test_local_relation_plans_local_table_scan(spark, schema, data):
    # The point of the change: no 'Scan ExistingRDD' (a pickled-Python
    # RDD re-evaluated through Python workers on every action).
    plan = (
        local_relation(spark, data, schema)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_local_relation_empty_input(spark):
    df = local_relation(spark, [], "a bigint, b string")
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"


def test_fixture_df_memoizes_per_app(spark):
    a = fixture_df(spark, "test.local_rel_memo", [(1,)], "x bigint")
    b = fixture_df(spark, "test.local_rel_memo", [(1,)], "x bigint")
    assert a is b  # same analyzed plan -> downstream persists cache-hit
