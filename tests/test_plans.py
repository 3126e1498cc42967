"""Physical-plan regression tests (SURVEY §4.3): the scale properties
the queries claim must be visible in the executed plan — predicate
pushdown, column pruning, broadcast of dims, no nested-loop joins where
a banded equi-join is intended. Guards against silent plan regressions
that small-data correctness tests would never catch.
"""

from __future__ import annotations

import pytest

from diachronic_spark.plans import QUERIES


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_pushes_status_filter_to_scan(spark, sf_dir):
    import re

    p = plan_str(QUERIES["q5"](spark, sf_dir))
    assert re.search(
        r"PushedFilters: \[[^\]]*EqualTo\(o_orderstatus,O\)", p
    ), "status filter must reach the orders parquet scan"


def test_q1_scan_prunes_columns(spark, sf_dir):
    p = plan_str(QUERIES["q1"](spark, sf_dir))
    # lineitem has 11 columns; q1 needs 6 — the scan schema must not
    # include the unused ones
    scan = p[p.index("ReadSchema"):]
    assert "l_partkey" not in scan[:400]
    assert "l_shipdate" not in scan[:400]


def test_q3_broadcasts_dimensions(spark, sf_dir):
    p = plan_str(QUERIES["q3"](spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_q22_banded_join_is_not_nested_loop(spark, sf_dir):
    p = plan_str(QUERIES["q22"](spark, sf_dir))
    assert "NestedLoop" not in p, "theta join must run as banded equi-join"


def test_q4_anti_and_q5_semi_join_types(spark, sf_dir):
    assert "LeftAnti" in plan_str(QUERIES["q4"](spark, sf_dir))
    assert "LeftSemi" in plan_str(QUERIES["q5"](spark, sf_dir))


def test_q19_broadcasts_query_vector(spark, sf_dir):
    p = plan_str(QUERIES["q19"](spark, sf_dir))
    assert "Broadcast" in p
    # top-k must be TakeOrdered, never a global sort of the corpus
    assert "TakeOrderedAndProject" in p


def test_no_rowatatime_python_udfs_anywhere(spark, sf_dir):
    """Python only via Arrow (mapInPandas etc.) — BatchEvalPython (the
    pickling row-at-a-time UDF operator) must never appear."""
    for name, fn in QUERIES.items():
        p = plan_str(fn(spark, sf_dir))
        assert "BatchEvalPython" not in p, name
