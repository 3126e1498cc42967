"""Unit tests for operators/lifecycle.py (funnel, retention, SCD2)
and the PII redaction ops — the edge cases the q66-q70 parity runs
can't isolate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from diachronic_spark.operators import lifecycle as LC
from diachronic_spark.operators import text as T

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, _ts(m), u, et) for i, (u, m, et) in enumerate(rows)], SCHEMA
    )


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes all 3 in order
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        # u2 clicks BEFORE viewing: click must not count; then no later click
        (2, 0, "click"), (2, 1, "view"), (2, 2, "purchase"),
        # u3 purchase before click: stops at click stage
        (3, 0, "view"), (3, 1, "purchase"), (3, 2, "click"),
        # u4 never views
        (4, 0, "click"), (4, 1, "purchase"),
    ]
    out = LC.funnel(_events(spark, rows), ["view", "click", "purchase"])
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_reentry_uses_first_qualifying_event(spark):
    # u1: view@0, click@1, then a SECOND view@2 must not reset anything;
    # purchase@3 counts (after click@1).
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 2, "view"), (1, 3, "purchase")]
    out = LC.funnel_depth(_events(spark, rows), ["view", "click", "purchase"])
    assert out.collect()[0]["depth"] == 3


def test_funnel_same_timestamp_does_not_advance(spark):
    # click at the SAME ts as the view: strict > rejects it; the later
    # click at m=2 advances instead.
    rows = [(1, 0, "view"), (1, 0, "click"), (1, 2, "click")]
    df = spark.createDataFrame(
        [(0, _ts(0), 1, "view"), (1, _ts(0), 1, "click"), (2, _ts(2), 1, "click")],
        SCHEMA,
    )
    out = LC.funnel_depth(df, ["view", "click"])
    assert out.collect()[0]["depth"] == 2
    # with only the tied click, depth stays 1
    out1 = LC.funnel_depth(df.filter("event_id < 2"), ["view", "click"])
    assert out1.collect()[0]["depth"] == 1


def test_scd2_collapses_consecutive_states(spark):
    rows = [(1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "a")]
    out = LC.scd2_compress(_events(spark, rows), "user_id", "event_type").orderBy(
        "valid_from"
    )
    got = [(r["event_type"], r["valid_from"], r["valid_to"]) for r in out.collect()]
    assert [g[0] for g in got] == ["a", "b", "a"]
    # intervals chain: each valid_to equals the next valid_from; last is open
    assert got[0][2] == got[1][1] and got[1][2] == got[2][1]
    assert got[2][2] is None
    assert got[0][1] == _ts(0) and got[1][1] == _ts(2) and got[2][1] == _ts(4)


def test_scd2_singleton(spark):
    out = LC.scd2_compress(_events(spark, [(1, 0, "a")]), "user_id", "event_type")
    r = out.collect()[0]
    assert r["event_type"] == "a" and r["valid_to"] is None


def test_retention_offsets(spark):
    # u1 first seen week of Jan 1 (Mon), active again 2 weeks later;
    # u2 first seen week 2.
    df = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 2), 1, "view"),
            (1, dt.datetime(2024, 1, 16), 1, "view"),
            (2, dt.datetime(2024, 1, 9), 2, "view"),
        ],
        SCHEMA,
    )
    out = LC.retention_cohorts(df)
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_redact_pii_counts_and_text(spark):
    df = spark.createDataFrame(
        [(0, "mail a@b.com and c.d@e.org call 555-1234"), (1, "clean text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.redact_pii(df).collect()}
    assert out[0]["n_emails"] == 2 and out[0]["n_phones"] == 1
    assert out[0]["redacted"] == "mail [EMAIL] and [EMAIL] call [PHONE]"
    assert out[1]["n_emails"] == 0 and out[1]["redacted"] == "clean text"


def test_inject_pii_only_every_7th(spark):
    df = spark.createDataFrame(
        [(i, "t") for i in range(15)], "doc_id long, text string"
    )
    out = T.redact_pii(T.inject_pii(df))
    hit = {r["doc_id"] for r in out.filter(F.col("n_emails") > 0).collect()}
    assert hit == {0, 7, 14}
