"""Join-operator tests (SURVEY §2.3 J6/J7/J8).

``banded_interval_join`` is pinned two ways: against a naive
cross-join+filter on an in-memory fixture (exact semantics, including
the band boundary), and against the eagerly-aggregated q22 — the two
formulations must count the same pairs on real testdata.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from diachronic_spark.catalog import load
from diachronic_spark.operators.joins import banded_interval_join
from diachronic_spark.plans import QUERIES


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_banded_interval_join_matches_naive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2020-01-01 00:00:00")),  # exactly on a midnight
            (2, _ts("2020-01-01 23:59:59")),
            (3, _ts("2020-01-03 12:00:00")),
            (4, _ts("2020-02-10 06:30:00")),
        ],
        "l_id int, l_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2020-01-02 00:00:00")),  # midnight: boundary cases
            (11, _ts("2020-01-02 11:00:00")),
            (12, _ts("2020-01-05 00:00:00")),
            (13, _ts("2020-02-09 07:00:00")),
        ],
        "r_id int, r_ts timestamp",
    )
    for band in (86400.0, 3600.0, 0.0):
        got = sorted(
            banded_interval_join(
                left, right, F.col("l_ts"), F.col("r_ts"), band
            )
            .select("l_id", "r_id")
            .collect()
        )
        want = sorted(
            left.crossJoin(right)
            .filter(
                F.abs(
                    F.col("l_ts").cast("double") - F.col("r_ts").cast("double")
                )
                <= band
            )
            .select("l_id", "r_id")
            .collect()
        )
        assert got == want, f"band={band}: {got} != {want}"
    # sanity: the day-1 boundary pair (1,10) is included at band=86400
    pairs = {
        (r.l_id, r.r_id)
        for r in banded_interval_join(
            left, right, F.col("l_ts"), F.col("r_ts"), 86400.0
        ).collect()
    }
    assert (1, 10) in pairs


def test_banded_interval_join_counts_match_q22_rewrite(spark, sf_dir):
    """The generic banded join and q22's pushed-down aggregation are the
    same theta join — pair counts per status must agree exactly."""
    e = load(spark, sf_dir, "events").select(
        (F.col("ts") - F.expr("INTERVAL 29 YEARS")).alias("ets")
    )
    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderdate")
    generic = {
        r.o_orderstatus: r.n_pairs
        for r in banded_interval_join(
            e, o, F.col("ets"), F.col("o_orderdate").cast("timestamp"), 86400.0
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .collect()
    }
    rewritten = {
        r.o_orderstatus: r.n_pairs
        for r in QUERIES["q22"](spark, sf_dir).collect()
    }
    assert generic == rewritten


def test_banded_interval_join_plan_has_no_nested_loop(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        (F.col("ts") - F.expr("INTERVAL 29 YEARS")).alias("ets")
    )
    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderdate")
    p = banded_interval_join(
        e, o, F.col("ets"), F.col("o_orderdate").cast("timestamp"), 86400.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in p
