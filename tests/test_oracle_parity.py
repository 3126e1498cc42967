"""Every declared query vs its DuckDB oracle on the local testdata.

This is a local pre-run of the driver's t2 gate (sf0.01 there; sf0.001
here for speed — set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to
reproduce the gate exactly).
"""

from __future__ import annotations

import pytest

from diachronic_spark.plans import ORACLE, QUERIES

from .oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE, key=lambda n: (len(n), n)))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, con, ORACLE[name])
    assert ok, f"{name}: {msg}"


def test_all_oracle_keys_have_queries():
    missing = set(ORACLE) - set(QUERIES)
    assert not missing, f"oracle entries without query impls: {missing}"


def test_rows_only_queries_run(spark, sf_dir):
    # queries without an oracle (engine-internal inputs) must still run
    for name in set(QUERIES) - set(ORACLE):
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0, name
