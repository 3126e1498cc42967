"""Bloom-filter URL seen-set tests (operators/crawl.py, q179).

Anchors: (1) the NO-FALSE-NEGATIVE law on arbitrary url sets and
parameters (hypothesis); (2) the engine's bitmap membership equals
a pure-Python md5 position replay bit-for-bit; (3) q179's
deterministic outcomes: zero false negatives, and the exact
false-positive set the 79%-fill parameters produce.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from diachronic_spark.operators.crawl import (
    build_url_bloom,
    probe_url_bloom,
)

URLS = st.lists(
    st.from_regex(r"https://[a-z]{1,8}\.example/[a-z0-9]{1,10}",
                  fullmatch=True),
    min_size=1,
    max_size=12,
    unique=True,
)


def _py_positions(url: str, k: int, m: int) -> list[int]:
    return [
        int(hashlib.md5(f"{url}#{i}".encode()).hexdigest()[:8], 16) % m
        for i in range(k)
    ]


def _spark_bloom(spark, urls, probes, k, m):
    seen = spark.createDataFrame([(u,) for u in urls], "url string")
    pr = spark.createDataFrame([(u,) for u in probes], "url string")
    bloom = build_url_bloom(seen, k=k, m=m)
    return {
        r.url: r.in_bloom
        for r in probe_url_bloom(pr, bloom, k=k, m=m).collect()
    }


@settings(max_examples=12, deadline=None)
@given(URLS, st.sampled_from([(2, 64), (3, 128)]))
def test_membership_matches_python_replay_and_never_misses(
    spark, urls, km
):
    k, m = km
    probes = urls + ["https://never.example/x7z"]
    got = _spark_bloom(spark, urls, probes, k, m)
    bits = {p for u in urls for p in _py_positions(u, k, m)}
    for u in probes:
        want = all(p in bits for p in _py_positions(u, k, m))
        assert got[u] == want, u
    for u in urls:  # the law: a seen url can NEVER read absent
        assert got[u] is True


def test_q179_pins_the_deterministic_outcomes(spark, sf_dir):
    from diachronic_spark.plans import QUERIES

    rows = QUERIES["q179"](spark, sf_dir).collect()
    assert len(rows) == 13
    assert not [r for r in rows if r.seen and not r.in_bloom]
    fps = sorted(r.url for r in rows if r.false_positive)
    assert fps == [
        f"https://new.example/q{i}" for i in (1, 3, 4, 7, 8, 9)
    ]


def test_robots_group_scoping_and_longest_match(spark):
    """RFC 9309 semantics beyond what the fixture exercises: rules in
    a non-* group are ignored, Allow beats Disallow at equal length,
    and the LONGEST matching prefix wins regardless of rule order."""
    from diachronic_spark.operators.crawl import (
        parse_robots,
        robots_allowed,
    )

    resp = spark.createDataFrame(
        [(
            "https://h.example/robots.txt",
            "User-agent: bot\r\nDisallow: /\r\n"
            "User-agent: *\r\nAllow: /pub\r\nDisallow: /p\r\n"
            "Allow: /p/open\r\nDisallow: /pub/private\r\n",
        )],
        "target_uri string, text string",
    )
    rules = parse_robots(resp)
    got = {
        (r.rule, r.prefix) for r in rules.collect()
    }
    assert got == {
        ("allow", "/pub"), ("disallow", "/p"),
        ("allow", "/p/open"), ("disallow", "/pub/private"),
    }  # bot's blanket Disallow excluded by group scoping

    urls = spark.createDataFrame(
        [(u,) for u in (
            "https://h.example/pub/x",        # allow /pub > dis /p
            "https://h.example/p/z",          # dis /p only
            "https://h.example/p/open/d",     # allow /p/open longest
            "https://h.example/pub/private/s",  # dis longest wins
            "https://h.example/q",            # no match -> allowed
        )],
        "url string",
    )
    verdict = {
        r.url: r.allowed
        for r in robots_allowed(urls, rules).collect()
    }
    assert verdict == {
        "https://h.example/pub/x": True,
        "https://h.example/p/z": False,
        "https://h.example/p/open/d": True,
        "https://h.example/pub/private/s": False,
        "https://h.example/q": True,
    }


# --- sharded bitmap (VERDICT r9 item 3; q185) --------------------------------

from diachronic_spark.operators.crawl import (  # noqa: E402
    WORD_BITS,
    build_url_bloom_sharded,
    probe_url_bloom_sharded,
)


def _spark_bloom_sharded(spark, urls, probes, k, m, wps):
    seen = spark.createDataFrame([(u,) for u in urls], "url string")
    pr = spark.createDataFrame([(u,) for u in probes], "url string")
    bloom = build_url_bloom_sharded(
        seen, k=k, m=m, words_per_segment=wps
    )
    return {
        r.url: r.in_bloom
        for r in probe_url_bloom_sharded(
            pr, bloom, k=k, m=m, words_per_segment=wps
        ).collect()
    }


@settings(max_examples=10, deadline=None)
@given(URLS, st.sampled_from([(2, 64, 1), (3, 128, 2)]))
def test_sharded_membership_matches_python_replay(spark, urls, kmw):
    k, m, wps = kmw
    probes = urls + ["https://never.example/x7z"]
    got = _spark_bloom_sharded(spark, urls, probes, k, m, wps)
    bits = {p for u in urls for p in _py_positions(u, k, m)}
    for u in probes:
        want = all(p in bits for p in _py_positions(u, k, m))
        assert got[u] == want, u
    for u in urls:
        assert got[u] is True  # no false negatives, ever


def test_sharded_layout_is_many_fixed_width_rows(spark):
    """The scale property itself: no single giant row. m=256 at 2
    words/segment must land as 4 rows of exactly 2 words, every
    segment present, and the segments reassemble bit-for-bit into
    the one-row bitmap."""
    seen = spark.createDataFrame(
        [(f"https://s.example/{i}",) for i in range(50)],
        "url string",
    )
    sharded = build_url_bloom_sharded(
        seen, k=3, m=256, words_per_segment=2
    ).collect()
    assert len(sharded) == 256 // (WORD_BITS * 2)  # 4 rows, not 1
    assert all(len(r.words) == 2 for r in sharded)
    flat = [
        w
        for r in sorted(sharded, key=lambda r: r.segment)
        for w in r.words
    ]
    one_row = build_url_bloom(seen, k=3, m=256).collect()[0].words
    assert flat == list(one_row)


def test_sharded_probe_handles_duplicate_probe_urls(spark):
    seen = spark.createDataFrame(
        [("https://a.example/1",)], "url string"
    )
    bloom = build_url_bloom_sharded(
        seen, k=2, m=64, words_per_segment=1
    )
    pr = spark.createDataFrame(
        [("https://a.example/1",)] * 3, "url string"
    )
    rows = probe_url_bloom_sharded(
        pr, bloom, k=2, m=64, words_per_segment=1
    ).collect()
    assert len(rows) == 3 and all(r.in_bloom for r in rows)


# --- RFC 9309 groups + Crawl-delay (VERDICT r9 item 4; q186) -----------------


def _groups(spark, body: str):
    from diachronic_spark.operators.crawl import parse_robots_groups

    resp = spark.createDataFrame(
        [("https://h.example/robots.txt", body)],
        "target_uri string, text string",
    )
    return {
        (r.ua, r.rule, r.value)
        for r in parse_robots_groups(resp).collect()
    }


def test_stacked_ua_runs_share_rules(spark):
    """'User-agent: *\\nUser-agent: bot\\nDisallow: /x' gives /x to
    BOTH agents (RFC 9309 §2.1) — the r9 positional scope gave it
    only to bot (the ADVICE r9 finding)."""
    got = _groups(
        spark,
        "User-agent: *\r\nUser-agent: bot\r\nDisallow: /x\r\n",
    )
    assert got == {
        ("*", "disallow", "/x"),
        ("bot", "disallow", "/x"),
    }


def test_nongroup_lines_do_not_break_runs_and_rules_restart_groups(
    spark,
):
    body = (
        "# comment\n"
        "User-agent: a\n"
        "\n"                      # blank inside a UA run
        "Sitemap: https://h.example/s.xml\n"
        "User-agent: b\n"         # still the same run
        "Disallow: /one\n"
        "User-agent: c\n"         # after a rule -> NEW group
        "Disallow: /two\n"
        "Crawl-delay: 9\n"
    )
    got = _groups(spark, body)
    assert got == {
        ("a", "disallow", "/one"),
        ("b", "disallow", "/one"),
        ("c", "disallow", "/two"),
        ("c", "crawl-delay", "9"),
    }


def test_ownerless_rules_and_empty_values_drop(spark):
    got = _groups(
        spark,
        "Disallow: /orphan\nUser-agent: *\nDisallow:\nAllow: /ok\n",
    )
    assert got == {("*", "allow", "/ok")}


def test_most_specific_ua_wins_and_delay_follows_chosen_group(spark):
    from diachronic_spark.operators.crawl import (
        parse_robots_groups,
        robots_allowed_ua,
    )
    from diachronic_spark.sources.robots_fixture import ROBOTS_BODIES

    bodies = spark.createDataFrame(
        ROBOTS_BODIES, "target_uri string, text string"
    )
    groups = parse_robots_groups(bodies)
    urls = spark.createDataFrame(
        [("https://shop.example/private/ledger",),
         ("https://wide.example/lobby",)],
        "url string",
    )
    ex = {
        r.url: (r.allowed, r.crawl_delay)
        for r in robots_allowed_ua(
            urls, groups, "examplebot"
        ).collect()
    }
    # examplebot: its own group blocks /private/ and sets delay 2;
    # the 'example' token (a prefix of examplebot) governs wide
    assert ex["https://shop.example/private/ledger"] == (False, 2)
    assert ex["https://wide.example/lobby"] == (True, None)
    ot = {
        r.url: (r.allowed, r.crawl_delay)
        for r in robots_allowed_ua(urls, groups, "otherbot").collect()
    }
    # otherbot: `*` group only — /private/ open, wide fully blocked
    assert ot["https://shop.example/private/ledger"] == (True, None)
    assert ot["https://wide.example/lobby"] == (False, None)


def test_malformed_crawl_delay_is_null_not_error(spark):
    from diachronic_spark.operators.crawl import (
        parse_robots_groups,
        robots_allowed_ua,
    )

    resp = spark.createDataFrame(
        [(
            "https://h.example/robots.txt",
            "User-agent: *\nCrawl-delay: soon\nDisallow: /x\n",
        )],
        "target_uri string, text string",
    )
    rows = robots_allowed_ua(
        spark.createDataFrame(
            [("https://h.example/y",)], "url string"
        ),
        parse_robots_groups(resp),
        "anybot",
    ).collect()
    assert rows[0].allowed is True and rows[0].crawl_delay is None


def test_schedule_fetches_slots_and_offsets(spark):
    """q187's politeness contract: slots per host by (priority desc
    nulls last, url), fetch_at_s = slot x host delay (default 1),
    disallowed urls never consume a slot."""
    from diachronic_spark.plans import QUERIES

    rows = QUERIES["q187"](spark, "/root/testdata/sf0.001").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    # the disallowed news url is absent entirely
    assert all("arch-old" not in r.url for r in rows)
    shop = by_host["shop.example"]
    assert [r.url.rsplit("/", 1)[1] for r in shop] == [
        "new", "home", "sale", "faq"  # 0.9 > tie(home<sale) > NULL
    ]
    assert [r.fetch_at_s for r in shop] == [0, 2, 4, 6]  # delay 2
    assert [r.fetch_at_s for r in by_host["news.example"]] == [0, 7]
    assert [r.fetch_at_s for r in by_host["open.example"]] == [0, 1]


def test_sharded_probe_plan_is_equijoin_not_nestedloop(spark):
    """The layout's point: the probe joins on the segment KEY. A
    NestedLoop/cartesian here would re-create the one-row-broadcast
    shape the sharding exists to escape."""
    seen = spark.createDataFrame(
        [(f"https://s.example/{i}",) for i in range(20)],
        "url string",
    )
    bloom = build_url_bloom_sharded(
        seen, k=3, m=256, words_per_segment=2
    )
    pr = spark.createDataFrame(
        [("https://s.example/1",), ("https://x.example/9",)],
        "url string",
    )
    out = probe_url_bloom_sharded(
        pr, bloom, k=3, m=256, words_per_segment=2
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "NestedLoop" not in p and "CartesianProduct" not in p


def test_bloom_segment_merge_is_or_and_idempotent(spark):
    """merge ≡ recompute for the frontier state: OR-merging per-batch
    sharded bitmaps equals the one-shot build over the union, and
    re-merging any batch is a no-op (at-least-once safety)."""
    from diachronic_spark.operators.crawl import merge_bloom_segments

    urls = [f"https://m.example/{i}" for i in range(40)]
    half_a = spark.createDataFrame(
        [(u,) for u in urls[:20]], "url string"
    )
    half_b = spark.createDataFrame(
        [(u,) for u in urls[20:]], "url string"
    )
    full = spark.createDataFrame([(u,) for u in urls], "url string")
    kw = dict(k=3, m=128, words_per_segment=2)
    ba = build_url_bloom_sharded(half_a, **kw)
    bb = build_url_bloom_sharded(half_b, **kw)
    bf = build_url_bloom_sharded(full, **kw)

    def words(df):
        return {
            r.segment: list(r.words) for r in df.collect()
        }

    merged = merge_bloom_segments(ba, bb)
    assert words(merged) == words(bf)
    # idempotent: OR-ing a batch in twice changes nothing
    assert words(merge_bloom_segments(merged, bb)) == words(bf)


def test_extract_links_policy_and_host_edges(spark):
    """Every declared policy clause of the link extractor: quote
    styles, attribute case, protocol-/root-relative resolution,
    out-of-scope schemes dropped, canonicalization collapsing
    case/port/fragment, and self-loop removal at the edge stage."""
    from diachronic_spark.operators.crawl import extract_links, host_edges

    pages = spark.createDataFrame(
        [
            (
                "https://A.example:443/#frag",
                '<a href="https://b.example/x">b</a>'
                "<A HREF='//c.example/y'>c</A>"
                '<a data-x="1" href = "/self">self</a>'
                '<a href="mailto:x@y">m</a>'
                '<a href="#top">t</a>'
                '<a href="rel/path">r</a>',
            ),
            (
                "https://b.example/page",
                "<a href='HTTP://C.example:80/z?b=2&a=1'>c2</a>",
            ),
        ],
        "url string, html string",
    )
    links = {(r.src, r.dst) for r in extract_links(pages).collect()}
    assert links == {
        ("https://a.example/", "https://b.example/x"),
        ("https://a.example/", "https://c.example/y"),
        ("https://a.example/", "https://a.example/self"),
        ("https://b.example/page", "http://c.example/z?a=1&b=2"),
    }
    edges = {
        (r.src_host, r.dst_host): r.w
        for r in host_edges(extract_links(pages)).collect()
    }
    # the a.example self link dropped at the edge stage
    assert edges == {
        ("a.example", "b.example"): 1,
        ("a.example", "c.example"): 1,
        ("b.example", "c.example"): 1,
    }
