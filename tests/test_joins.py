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


def test_asof_join_merge_variant_matches_union_form(spark, sf_dir):
    """asof_join (union+window, one wide shuffle) and asof_join_merge
    (cogrouped pandas merge_asof, two narrow shuffles + Arrow boundary)
    are the same operator — outputs must match row-for-row, including
    left rows with no earlier right row (null fill)."""
    from pyspark.sql import Window

    from diachronic_spark.operators.joins import asof_join, asof_join_merge

    e = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        (F.col("ts") - F.expr("INTERVAL 29 YEARS")).alias("ets"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("o_custkey").alias("k"), "o_orderdate", "o_totalprice")
    )
    kw = dict(
        on="k", left_ts="ets", right_ts="o_orderdate",
        right_cols=["o_orderdate", "o_totalprice"],
    )
    a = sorted(map(tuple, asof_join(e, o, **kw).collect()))
    b = sorted(map(tuple, asof_join_merge(e, o, **kw).collect()))
    assert len(a) == len(b) and a == b


def test_asof_join_merge_empty_right_and_no_match(spark):
    import datetime as dtm

    from diachronic_spark.operators.joins import asof_join, asof_join_merge

    left = spark.createDataFrame(
        [
            (1, _ts("2020-01-05 00:00:00"), "a"),
            (1, _ts("2020-01-01 00:00:00"), "b"),  # before any right row
            (2, _ts("2020-06-01 00:00:00"), "c"),  # key with no right rows
        ],
        "k int, ets timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, dtm.date(2020, 1, 3), 10.0), (1, dtm.date(2020, 1, 5), 20.0)],
        "k int, rd date, val double",
    )
    kw = dict(on="k", left_ts="ets", right_ts="rd", right_cols=["rd", "val"])
    a = sorted(map(tuple, asof_join(left, right, **kw).collect()))
    b = sorted(map(tuple, asof_join_merge(left, right, **kw).collect()))
    assert a == b
    by_tag = {r.tag: r for r in asof_join_merge(left, right, **kw).collect()}
    assert by_tag["a"].val_r == 20.0  # exact-date tie matches (<=)
    assert by_tag["b"].val_r is None
    assert by_tag["c"].val_r is None


# --- property: banded join == naive theta join on random instances --------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_EPOCH = dt.datetime(2020, 1, 1)
_SECS = st.integers(min_value=0, max_value=5 * 86400)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    l_secs=st.lists(_SECS, min_size=1, max_size=12),
    r_secs=st.lists(_SECS, min_size=1, max_size=12),
    band=st.sampled_from([0.0, 1800.0, 86400.0, 100000.0, 200000.0]),
)
def test_banded_interval_join_property(spark, l_secs, r_secs, band):
    left = spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s)) for i, s in enumerate(l_secs)],
        "l_id int, l_ts timestamp",
    )
    right = spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s)) for i, s in enumerate(r_secs)],
        "r_id int, r_ts timestamp",
    )
    got = sorted(
        (r.l_id, r.r_id)
        for r in banded_interval_join(
            left, right, F.col("l_ts"), F.col("r_ts"), band
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, ls in enumerate(l_secs)
        for j, rs in enumerate(r_secs)
        if abs(ls - rs) <= band
    )
    assert got == want


def test_interval_overlap_join_matches_naive_and_edges(spark):
    import datetime as dt

    from diachronic_spark.operators.joins import interval_overlap_join

    T0 = dt.datetime(2024, 1, 1)

    def ts(h):  # hours offset
        return T0 + dt.timedelta(hours=h)

    left = spark.createDataFrame(
        [
            (1, ts(0), ts(2)),     # overlaps w1 only
            (2, ts(23), ts(49)),   # spans 3 days -> multi-bucket; w2, w3
            (3, ts(5), ts(5)),     # degenerate (empty) -> joins nothing
            (4, ts(26), ts(30)),   # inside day 2 -> w2
        ],
        "lid int, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts(1), ts(3)),    # w1
            (20, ts(25), ts(27)),  # w2
            (30, ts(48), ts(50)),  # w3
            (40, ts(3), ts(4)),    # touches nothing
        ],
        "rid int, s2 timestamp, e2 timestamp",
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "s", "e", "s2", "e2"
        ).collect()
    }
    # naive truth: overlap iff s < e2 and s2 < e (half-open)
    import itertools

    lrows = left.collect()
    rrows = right.collect()
    want = {
        (lr["lid"], rr["rid"])
        for lr, rr in itertools.product(lrows, rrows)
        if lr["s"] < rr["e2"] and rr["s2"] < lr["e"] and lr["s"] < lr["e"]
    }
    assert got == want
    assert (2, 20) in got and (2, 30) in got  # multi-bucket span found
    assert all(lid != 3 for lid, _ in got)  # degenerate emits nothing
    # exactly one row per overlapping pair (bucket dedup, no DISTINCT)
    n_rows = interval_overlap_join(left, right, "s", "e", "s2", "e2").count()
    assert n_rows == len(want)


def test_interval_overlap_half_open_boundary(spark):
    import datetime as dt

    from diachronic_spark.operators.joins import interval_overlap_join

    T0 = dt.datetime(2024, 1, 1)
    a = spark.createDataFrame(
        [(1, T0, T0 + dt.timedelta(hours=1))], "lid int, s timestamp, e timestamp"
    )
    b = spark.createDataFrame(
        [(2, T0 + dt.timedelta(hours=1), T0 + dt.timedelta(hours=2))],
        "rid int, s2 timestamp, e2 timestamp",
    )
    # [0,1) vs [1,2): touching endpoints do NOT overlap
    assert interval_overlap_join(a, b, "s", "e", "s2", "e2").count() == 0


def test_sliding_distinct_date_gaps(spark):
    import datetime as dt

    from diachronic_spark.operators.timeseries import sliding_distinct

    rows = []
    # day 0: users 1,2 ; day 1: user 2 ; day 9 (gap): user 3
    for day, users in [(0, [1, 2]), (1, [2]), (9, [3])]:
        for u in users:
            rows.append((dt.datetime(2024, 1, 1 + day, 12, 0), u))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = {
        str(r["d"]): (r["n_1d"], r["n_window"])
        for r in sliding_distinct(df, "ts", "user_id", days=7).collect()
    }
    assert out["2024-01-01"] == (2, 2)
    assert out["2024-01-02"] == (1, 2)   # union of days 1-2
    # day 10 is beyond the 7-day range of days 1-2: only user 3
    assert out["2024-01-10"] == (1, 1)


_IVL = st.tuples(
    st.integers(min_value=0, max_value=4 * 86400),
    st.integers(min_value=0, max_value=3 * 86400),
)  # (start_sec, duration_sec) — duration 0 = degenerate


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    l_ivls=st.lists(_IVL, min_size=1, max_size=10),
    r_ivls=st.lists(_IVL, min_size=1, max_size=10),
    bucket=st.sampled_from([3600, 86400]),
)
def test_interval_overlap_join_property(spark, l_ivls, r_ivls, bucket):
    from diachronic_spark.operators.joins import interval_overlap_join

    def mk(ivls, idc, sc, ec):
        return spark.createDataFrame(
            [
                (
                    i,
                    _EPOCH + dt.timedelta(seconds=s),
                    _EPOCH + dt.timedelta(seconds=s + d),
                )
                for i, (s, d) in enumerate(ivls)
            ],
            f"{idc} int, {sc} timestamp, {ec} timestamp",
        )

    left = mk(l_ivls, "l_id", "s", "e")
    right = mk(r_ivls, "r_id", "s2", "e2")
    rows = interval_overlap_join(
        left, right, "s", "e", "s2", "e2", bucket_seconds=bucket
    ).collect()
    got = sorted((r.l_id, r.r_id) for r in rows)
    want = sorted(
        (i, j)
        for i, (ls, ld) in enumerate(l_ivls)
        for j, (rs, rd) in enumerate(r_ivls)
        # nonempty-INTERSECTION semantics: empty intervals match
        # nothing (the textbook predicate s1<e2 AND s2<e1 would claim
        # a point "overlap" for an empty [x,x) sitting inside a
        # nonempty interval — the operator defines that out)
        if ld > 0 and rd > 0 and ls < rs + rd and rs < ls + ld
    )
    assert got == want
    assert len(got) == len(set(got))  # exactly one row per pair


def test_interval_overlap_join_numeric_epoch_columns(spark):
    """The pre-µs contract: plain numeric epoch-second interval bounds
    keep working alongside timestamps (scaled to µs internally)."""
    from diachronic_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 200, 300), (3, 300, 300)],
        "lid int, s long, e long",
    )
    right = spark.createDataFrame(
        [(10, 50, 150), (20, 299, 400), (30, 150, 200)],
        "rid int, rs long, re long",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "s", "e", "rs", "re", bucket_seconds=60
        ).collect()
    )
    # (3, *) empty interval matches nothing; (2,20) overlap [299,300)
    assert got == [(1, 10), (2, 20)]


def test_interval_overlap_join_numeric_randomized(spark):
    """Seeded random numeric intervals vs the quadratic spec — covers
    bucket-edge and long-interval shapes the fixed case misses."""
    import random

    from diachronic_spark.operators.joins import interval_overlap_join

    rng = random.Random(7)
    bucket = 60
    l_ivls = [
        (rng.randrange(0, 3000), rng.randrange(0, 200))
        for _ in range(40)
    ]
    r_ivls = [
        (rng.randrange(0, 3000), rng.choice([0, 1, 59, 60, 61, 600]))
        for _ in range(40)
    ]
    left = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(l_ivls)],
        "lid int, s long, e long",
    )
    right = spark.createDataFrame(
        [(j, s, s + d) for j, (s, d) in enumerate(r_ivls)],
        "rid int, rs long, re long",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "s", "e", "rs", "re", bucket_seconds=bucket
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (ls, ld) in enumerate(l_ivls)
        for j, (rs, rd) in enumerate(r_ivls)
        if ld > 0 and rd > 0 and ls < rs + rd and rs < ls + ld
    )
    assert got == want
    assert len(got) == len(set(got))
