"""Property-based equivalence for the snapshot operator (SURVEY §5.2
item 3): hypothesis-generated revision streams, asserting

1. on per-page timestamp-SORTED input, the declarative window dedup
   equals the sequential replay spec (the only case the reference
   meaningfully supports — its input invariant);
2. on ARBITRARY (possibly out-of-order) input, the distributed
   applyInPandas sequential operator equals the pure-Python spec
   (bug-for-bug fidelity, including the silent drops of SURVEY §1.2-3).

Each hypothesis example pays a Spark job, so examples are few but the
generator covers the hard cases by construction: same-day collisions,
pre-epoch timestamps, null text, non-zero namespaces, shared titles
across pages.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from diachronic_spark.operators.snapshot import (
    DEFAULT_EPOCH,
    daily_snapshot,
    daily_snapshot_sequential,
    replay_page,
)
from diachronic_spark.schemas import WIKI_REVISIONS

# timestamps straddle the epoch: pre-epoch drops and same-day ties both
# appear with high probability in a handful of examples
_TS = st.datetimes(
    min_value=DEFAULT_EPOCH - dt.timedelta(days=2),
    max_value=DEFAULT_EPOCH + dt.timedelta(days=4),
).map(lambda t: t.replace(microsecond=0))

_REV = st.fixed_dictionaries(
    {
        "namespace": st.sampled_from(["0", "0", "0", "1"]),
        "title": st.sampled_from(["A", "B"]),
        "timestamp": _TS,
        "text": st.one_of(st.none(), st.text(alphabet="xyz ", max_size=8)),
    }
)

_PAGES = st.lists(
    st.lists(_REV, min_size=1, max_size=6), min_size=1, max_size=4
)


def _rows(pages, sort_within_page):
    rows = []
    for pid, revs in enumerate(pages):
        if sort_within_page:
            revs = sorted(revs, key=lambda r: r["timestamp"])
        for seq, r in enumerate(revs):
            rows.append(
                (pid, seq, r["namespace"], r["title"], r["timestamp"], r["text"])
            )
    return rows


def _spec(pages, sort_within_page):
    out = []
    for revs in pages:
        if sort_within_page:
            revs = sorted(revs, key=lambda r: r["timestamp"])
        out.extend(replay_page(revs))
    return sorted(
        (r["title"], str(r["timestamp"]), r["namespace"], r["text"]) for r in out
    )


def _collect(df):
    return sorted(
        (r["title"], str(r["timestamp"]), r["namespace"], r["text"])
        for r in df.collect()
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pages=_PAGES)
def test_declarative_equals_spec_on_sorted_streams(spark, pages):
    df = spark.createDataFrame(_rows(pages, True), WIKI_REVISIONS)
    assert _collect(daily_snapshot(df)) == _spec(pages, True)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pages=_PAGES)
def test_sequential_operator_equals_spec_on_any_stream(spark, pages):
    df = spark.createDataFrame(_rows(pages, False), WIKI_REVISIONS)
    assert _collect(daily_snapshot_sequential(df)) == _spec(pages, False)
