"""Crawl-frontier operators: the Bloom-filter URL seen-set (q179).

Every large crawler keeps a "have I fetched this URL before?" test
whose state CANNOT be the URL set itself (billions of URLs x ~80
bytes is frontier-killing); the standard structure is a Bloom
filter — no false negatives by construction, bounded false
positives, fixed memory. This module builds one as a pure
DataFrame aggregation and probes it with expressions only:

- positions: k md5-derived bit positions per CANONICAL url
  (``md5_prefix32(url + '#i') % m`` — the repo's one portable hash,
  so the DuckDB oracle replays every bit decision exactly);
- build: explode seen urls x k, bit-OR the positions into a
  ``m/32``-word bitmap (one narrow shuffle on word index, then a
  k-row aggregate — state is FIXED at m bits regardless of corpus
  size, the property that makes the structure frontier-grade);
- probe: membership = all k probe positions set in the broadcast
  bitmap — map-side, no join against the seen set.

The false-positive rate is the textbook (1 - e^{-kn/m})^k; the
operator surfaces ``in_bloom`` alongside exact truth in q179 so the
driver adjudicates BOTH the no-false-negative law and each
(deterministic) false positive.

Scale shape: the bitmap is a single ~m/8-byte row broadcast to every
probe task; the seen side is touched once to build it. At 100 TB the
probe stage is a map-only filter in whatever scan feeds it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import md5_prefix32

__all__ = [
    "bloom_positions",
    "build_url_bloom",
    "probe_url_bloom",
    "build_url_bloom_sharded",
    "probe_url_bloom_sharded",
    "merge_bloom_segments",
    "parse_robots_groups",
    "parse_robots",
    "robots_allowed",
    "robots_allowed_ua",
    "robots_allowed_multi_ua",
    "schedule_fetches",
]

WORD_BITS = 32  # int64 words hold < 2^32 so shifts never touch sign


def bloom_positions(url: Column, k: int, m: int) -> list[Column]:
    """The k md5-derived bit positions of one url (plan-time list)."""
    return [
        F.pmod(
            md5_prefix32(F.concat(url, F.lit(f"#{i}"))), F.lit(m)
        ).cast("int")
        for i in range(k)
    ]


def build_url_bloom(
    seen: DataFrame, url_col: str = "url", k: int = 3, m: int = 256
) -> DataFrame:
    """One-row DataFrame: ``words`` = the m/WORD_BITS-word bitmap
    (array<bigint>, each word < 2^32) over the seen urls."""
    if m % WORD_BITS:
        raise ValueError(f"m must be a multiple of {WORD_BITS}")
    n_words = m // WORD_BITS
    pos = seen.select(
        F.explode(
            F.array(*bloom_positions(F.col(url_col), k, m))
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / WORD_BITS).cast("int").alias("w"),
            # 2^bitpos via pow: exact for bitpos < 32 (double holds
            # integers to 2^53); Python's shiftleft wrapper only
            # takes literal shift amounts
            F.pow(F.lit(2.0), F.pmod(F.col("p"), F.lit(WORD_BITS)))
            .cast("bigint")
            .alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    # densify to exactly n_words entries (unset words = 0)
    # partition the word spine by size, not by default parallelism:
    # fixture-scale m (a handful of words) gets ONE task instead of a
    # 32-task stage of ~0 rows; a real 1e10-URL frontier (~1.5e9
    # words) still fans out at 64k words per partition
    idx = seen.sparkSession.range(
        n_words, numPartitions=max(1, n_words >> 16)
    ).select(
        F.col("id").cast("int").alias("w")
    )
    return (
        idx.join(words, "w", "left")
        .select("w", F.coalesce("word", F.lit(0)).alias("word"))
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("w", "word"))
            ).word.alias("words")
        )
    )


def probe_url_bloom(
    probes: DataFrame,
    bloom: DataFrame,
    url_col: str = "url",
    k: int = 3,
    m: int = 256,
) -> DataFrame:
    """Append ``in_bloom`` to the probe rows — map-side against the
    broadcast one-row bitmap."""
    out = probes.crossJoin(F.broadcast(bloom))
    cond = None
    for p in bloom_positions(F.col(url_col), k, m):
        word = F.element_at(
            F.col("words"), (p / WORD_BITS).cast("int") + 1
        )
        bit_set = (
            F.floor(
                word / F.pow(F.lit(2.0), F.pmod(p, F.lit(WORD_BITS)))
            ).cast("bigint")
            % 2
            == 1
        )
        cond = bit_set if cond is None else (cond & bit_set)
    return out.withColumn("in_bloom", cond).drop("words")


# --- robots.txt compliance (RFC 9309) — the crawl's legal gate --------------
# Declared semantics (VERDICT r9 item 4 upgraded this from the r9
# `*`-only positional scope):
# - GROUPS: a group is a run of consecutive User-agent lines
#   followed by its rule lines; every UA of the run owns every rule
#   (RFC 9309 §2.1 — stacked 'User-agent: *\nUser-agent: bot\n
#   Disallow: /x' blocks /x for BOTH). Non-group lines (blanks,
#   comments, Sitemap:, unknown fields) neither break a UA run nor
#   end a group. A UA line after rule lines starts a NEW group.
# - SELECTION: a crawler obeys the MOST SPECIFIC matching group —
#   the longest UA token that case-insensitively prefixes its
#   product name; `*` matches everything at specificity 0; rules of
#   every group sharing the chosen token combine (RFC 9309 §2.2.1).
# - VERDICT: longest-prefix-match wins, Allow wins length ties, no
#   match / no rules / no robots = allowed (the RFC defaults).
# - Crawl-delay (non-RFC but universally honored): surfaced per
#   host from the chosen group, max of its values.
# All computed with windows + string expressions, never a Python
# parser, so the whole stage stays JVM-side and the oracle replays
# it with the same windows.


def parse_robots_groups(
    responses: DataFrame,
    uri_col: str = "target_uri",
    text_col: str = "text",
) -> DataFrame:
    """robots.txt response rows -> (host, ua, rule, value) with
    RFC 9309 group membership: ua is lowercase, rule in
    {'allow', 'disallow', 'crawl-delay'}, value = path prefix (or
    the delay seconds for crawl-delay). Empty rule values
    (``Disallow:`` = allow everything) are dropped; rules before
    any User-agent line are ownerless and dropped."""
    from pyspark.sql import Window

    host = F.lower(
        F.regexp_extract(F.col(uri_col), "^[^:/?#]+://([^/?#]*)", 1)
    )
    lines = responses.select(
        host.alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "ln", "raw"
        ),
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace("raw", "\r$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "ln",
        F.lower(
            F.regexp_extract(
                F.col("line"), r"(?i)^user-agent:\s*(\S+)", 1
            )
        ).alias("ua"),
        F.lower(
            F.regexp_extract(
                F.col("line"),
                r"(?i)^(allow|disallow|crawl-delay):",
                1,
            )
        ).alias("rule"),
        F.trim(
            F.regexp_extract(
                F.col("line"),
                r"(?i)^(?:allow|disallow|crawl-delay):\s*(\S*)",
                1,
            )
        ).alias("value"),
    ).filter(
        # group-relevant lines only: blanks/comments/unknown fields
        # neither break UA runs nor end groups (RFC 9309 §2.2)
        (F.col("ua") != "") | ((F.col("rule") != "") & (F.col("value") != ""))
    )
    w = Window.partitionBy("host").orderBy("ln")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_ua = F.col("ua") != ""
    run_start = is_ua & ~F.coalesce(
        F.lag(is_ua).over(w), F.lit(False)
    )
    scoped = (
        parsed.withColumn(
            "run_id", F.sum(run_start.cast("int")).over(wrun)
        )
        # a rule belongs to the most recent UA run above it
        .withColumn(
            "grp",
            F.max(F.when(is_ua, F.col("run_id"))).over(wrun),
        )
    )
    uas = scoped.filter(is_ua).select(
        "host", F.col("run_id").alias("grp"), "ua"
    )
    rules = scoped.filter(
        (F.col("rule") != "") & F.col("grp").isNotNull()
    ).select("host", "grp", "rule", "value")
    return uas.join(rules, ["host", "grp"]).select(
        "host", "ua", "rule", "value"
    )


def parse_robots(
    responses: DataFrame,
    uri_col: str = "target_uri",
    text_col: str = "text",
) -> DataFrame:
    """The `*` group's Allow/Disallow rules as (host, rule, prefix)
    — q180's surface, now a projection of the RFC 9309 group parse
    (stacked UA runs included)."""
    return (
        parse_robots_groups(responses, uri_col, text_col)
        .filter(
            (F.col("ua") == "*") & F.col("rule").isin("allow", "disallow")
        )
        .select("host", "rule", F.col("value").alias("prefix"))
    )


def _best_rule_key(rs: Column, path: Column) -> Column:
    """Longest-prefix verdict as ONE integer fold over a host's rule
    array: key = 2·len(prefix) + (rule == allow) for every rule whose
    prefix matches ``path``, folded with greatest(); -1 = no hit (or
    no rules — null array coalesces). The winner's allow-bit IS the
    key's LSB, and equal keys imply equal verdicts (same length, same
    rule kind), so the fold reproduces the former max_by exactly,
    ties included."""
    return F.coalesce(
        F.aggregate(
            F.filter(rs, lambda r: path.startswith(r["prefix"])),
            F.lit(-1),
            lambda acc, r: F.greatest(
                acc,
                F.length(r["prefix"]) * 2
                + (r["rule"] == F.lit("allow")).cast("int"),
            ),
        ),
        F.lit(-1),
    )


def robots_allowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Append ``allowed`` per url: longest matching prefix rule of
    the url's host decides; Allow wins equal lengths; hosts without
    rules (or no matching rule) default to allowed.

    PRECONDITION (ADVICE r10): ``urls`` must be url-distinct. The
    verdict is one output row per INPUT row (the r10 rework traded
    the old per-distinct-url groupBy for a map-side fold); a caller
    feeding duplicate urls gets duplicate verdict rows, and a
    downstream equi-join on url row-multiplies. Every current call
    site is distinct by construction (q181 groups by url, q195
    applies .distinct(), fixtures are unique); dedupe first —
    ``urls.select(url_col).distinct()`` — if yours is not. Kept a
    precondition rather than a defensive distinct: the operator's
    point is that the frontier pays NO exchange for a KB-scale
    policy check, and an unconditional distinct would reintroduce
    exactly that url-scaled shuffle.

    Scale shape (reworked in the r10 optimization pass, guide
    §2.3/§2.4): rules are KB-per-host by nature, so they aggregate
    to ONE array row per host (a tiny rules-side shuffle), broadcast,
    and the longest-prefix verdict evaluates as an integer fold over
    the array — map-side on the url relation. The previous shape
    row-multiplied urls × their host's rules and re-aggregated per
    url, i.e. the frontier paid an exchange for a KB-scale policy
    check. Callers pass url-distinct frontiers (every call site does
    by construction), so per-row output equals the former per-group
    output."""
    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct("rule", "prefix")).alias("rs")
    )
    u = urls.select(
        F.col(url_col).alias("url"),
        F.lower(
            F.regexp_extract(F.col(url_col), "^[^:/?#]+://([^/?#]*)", 1)
        ).alias("host"),
        F.regexp_extract(
            F.col(url_col), "^[^:/?#]+://[^/?#]*([^?#]*)", 1
        ).alias("path"),
    )
    bk = _best_rule_key(F.col("rs"), F.col("path"))
    return (
        u.join(F.broadcast(per_host), "host", "left")
        .select(
            "url",
            ((bk == -1) | (bk % 2 == 1)).alias("allowed"),
        )
    )


def robots_allowed_multi_ua(
    urls: DataFrame,
    groups: DataFrame,
    crawler_uas: list[str],
    url_col: str = "url",
    cache_key: str = "crawl.robots_meta",
) -> DataFrame:
    """(ua, url, allowed, crawl_delay) for N NAMED crawlers in ONE
    plan (VERDICT r9 item 4): per (crawler, host), pick the MOST
    SPECIFIC matching user-agent token — longest ua that
    case-insensitively prefixes the crawler name; `*` matches all at
    specificity 0; length ties break lexicographically for
    determinism — then apply ONLY that token's rules (all groups
    sharing it combine, RFC 9309 §2.2.1) under the longest-prefix
    verdict. ``crawl_delay`` = max of the chosen token's crawl-delay
    values (bigint seconds, NULL when absent or non-numeric). Hosts
    with no robots or no matching group default to (allowed, NULL).

    A crawl farm evaluates every bot identity it operates in one
    pass — the per-UA loop shape would re-run the group windows N
    times. ``groups`` is :func:`parse_robots_groups` output —
    KB-scale per host.

    PRECONDITION (ADVICE r10): ``urls`` must be url-distinct — one
    verdict row per (input row × crawler), same contract and same
    rationale as :func:`robots_allowed`.

    ``cache_key`` names the managed-cache entry for the folded rules
    metadata (ADVICE r10): interleaved callers with different groups
    or UA lists fail managed_persist's sameResult check and would
    evict/re-persist each other on every alternation under one
    shared key — each repeated-evaluation site should own its key,
    as triangle_counts does.

    Scale shape (reworked in the r10 optimization pass, guide
    §2.3/§2.4): the chosen group's rules AND its crawl-delay fold
    into ONE metadata row per (crawler, host) — rules as an array,
    delay as a max — so the url relation takes a single broadcast
    join and the longest-prefix verdict evaluates as an integer fold
    (:func:`_best_rule_key`), map-side. The previous shape
    row-multiplied urls × rules, re-aggregated per (ua, url), and
    paid a second broadcast join for the delays — three url-scaled
    stages for a KB-scale policy. Callers pass url-distinct
    frontiers, so per-row output equals the former per-group
    output."""
    from pyspark.sql import Window

    from ._cache import fixture_df

    spark = urls.sparkSession
    crawlers = fixture_df(
        spark,
        "crawl.uas:" + ",".join(crawler_uas),
        [(u, u.lower()) for u in crawler_uas],
        "ua_in string, cua string",
    )
    matching = crawlers.crossJoin(groups).filter(
        (F.col("ua") == "*") | F.col("cua").startswith(F.col("ua"))
    )
    spec = F.when(F.col("ua") == "*", F.lit(0)).otherwise(
        F.length("ua")
    )
    w = Window.partitionBy("cua", "host").orderBy(
        spec.desc(), F.col("ua").desc()
    )
    chosen = (
        matching.select("cua", "host", "ua")
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("cua", "host", "ua")
    )
    applicable = matching.join(chosen, ["cua", "host", "ua"])
    from ._cache import managed_persist

    meta = applicable.groupBy("ua_in", "host").agg(
        # collect_list skips the when()'s nulls: only allow/disallow
        # rows land in the rule array (crawl-delay-only groups yield
        # an EMPTY array — still "no hit", exactly the old verdict)
        F.collect_list(
            F.when(
                F.col("rule").isin("allow", "disallow"),
                F.struct(
                    F.col("rule"), F.col("value").alias("prefix")
                ),
            )
        ).alias("rs"),
        # try_cast: a malformed delay is NULL, never an ANSI error
        F.max(
            F.when(
                F.col("rule") == "crawl-delay",
                F.col("value").try_cast("bigint"),
            )
        ).alias("crawl_delay"),
    )
    # the group-selection chain (crossJoin → distinct → window →
    # join → agg) is host×UA-count-sized metadata rebuilt from
    # `groups` on every call; persisting the folded meta table makes
    # a repeated evaluation (bench best-of-k, a crawl loop's repeated
    # gate) a cache hit instead of five re-run KB-scale stages.
    # managed_persist's sameResult check re-persists whenever groups
    # or the crawler list actually change.
    meta = managed_persist(meta, cache_key)
    u = urls.select(
        F.col(url_col).alias("url"),
        F.lower(
            F.regexp_extract(F.col(url_col), "^[^:/?#]+://([^/?#]*)", 1)
        ).alias("host"),
        F.regexp_extract(
            F.col(url_col), "^[^:/?#]+://[^/?#]*([^?#]*)", 1
        ).alias("path"),
    ).crossJoin(F.broadcast(crawlers.select("ua_in")))
    bk = _best_rule_key(F.col("rs"), F.col("path"))
    return (
        u.join(F.broadcast(meta), ["ua_in", "host"], "left")
        .select(
            F.col("ua_in").alias("ua"),
            "url",
            ((bk == -1) | (bk % 2 == 1)).alias("allowed"),
            "crawl_delay",
        )
    )


def robots_allowed_ua(
    urls: DataFrame,
    groups: DataFrame,
    crawler_ua: str,
    url_col: str = "url",
    cache_key: str = "crawl.robots_meta",
) -> DataFrame:
    """Single-crawler surface of :func:`robots_allowed_multi_ua` —
    (url, allowed, crawl_delay). Same url-distinct precondition;
    ``cache_key`` passes through."""
    return robots_allowed_multi_ua(
        urls, groups, [crawler_ua], url_col=url_col,
        cache_key=cache_key,
    ).drop("ua")


# --- sharded bitmap (VERDICT r9 item 3) — the real-m representation ---------
# build_url_bloom's one-row array<bigint> is the small-m fast path:
# at a production frontier (1e10 URLs) the textbook sizing for 1% FP
# is m = -n·ln(p)/ln(2)² ≈ 9.6e10 bits ≈ 12 GB with k = m/n·ln2 ≈ 7
# — a single row breaks Spark's 2 GB value limits and could never
# broadcast. The sharded layout keys FIXED-WIDTH segments of the
# bitmap ((segment, array<bigint> of words_per_segment words)), so
# state is a normal DataFrame: build is the same one narrow shuffle
# (word index → segment), probes join on the segment key — still a
# broadcast join while the bitmap fits (12 GB does not: AQE picks a
# shuffle join on the segment key, which is exactly right), and
# segment rows at, say, 1 MiB/segment put ~12k rows across the
# cluster — trivially partitionable, spill-free.


def build_url_bloom_sharded(
    seen: DataFrame,
    url_col: str = "url",
    k: int = 3,
    m: int = 256,
    words_per_segment: int = 2,
) -> DataFrame:
    """(segment int, words array<bigint>) rows — bitmap segment
    ``s`` holds words [s*wps, (s+1)*wps); every segment present
    (unset words = 0), so probes LEFT-join safely and a missing
    segment can only mean a caller mixed different (k, m)."""
    if m % (WORD_BITS * words_per_segment):
        raise ValueError(
            f"m must be a multiple of WORD_BITS*words_per_segment "
            f"= {WORD_BITS * words_per_segment}, got {m}"
        )
    n_words = m // WORD_BITS
    pos = seen.select(
        F.explode(
            F.array(*bloom_positions(F.col(url_col), k, m))
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / WORD_BITS).cast("int").alias("w"),
            F.pow(F.lit(2.0), F.pmod(F.col("p"), F.lit(WORD_BITS)))
            .cast("bigint")
            .alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    # partition the word spine by size, not by default parallelism:
    # fixture-scale m (a handful of words) gets ONE task instead of a
    # 32-task stage of ~0 rows; a real 1e10-URL frontier (~1.5e9
    # words) still fans out at 64k words per partition
    idx = seen.sparkSession.range(
        n_words, numPartitions=max(1, n_words >> 16)
    ).select(
        F.col("id").cast("int").alias("w")
    )
    dense = idx.join(words, "w", "left").select(
        "w",
        (F.col("w") / words_per_segment).cast("int").alias("segment"),
        F.coalesce("word", F.lit(0)).alias("word"),
    )
    return dense.groupBy("segment").agg(
        F.array_sort(
            F.collect_list(F.struct("w", "word"))
        ).word.alias("words")
    )


def probe_url_bloom_sharded(
    probes: DataFrame,
    bloom: DataFrame,
    url_col: str = "url",
    k: int = 3,
    m: int = 256,
    words_per_segment: int = 2,
) -> DataFrame:
    """Append ``in_bloom`` per probe row: the k positions explode to
    (url, position) rows, equi-join the segment rows on the segment
    key (broadcast while the bitmap is small; a 12 GB frontier
    bitmap shuffle-joins on the same key), test the bit per row, and
    one narrow aggregate on the url ANDs the k verdicts. No row ever
    carries more than one segment's words."""
    seg_words = WORD_BITS * words_per_segment
    pos = probes.select(
        F.col(url_col),
        F.posexplode(
            F.array(*bloom_positions(F.col(url_col), k, m))
        ).alias("i", "p"),
    ).select(
        url_col,
        "i",
        "p",
        (F.col("p") / seg_words).cast("int").alias("segment"),
    )
    joined = pos.join(F.broadcast(bloom), "segment", "left")
    word = F.element_at(
        F.col("words"),
        F.pmod((F.col("p") / WORD_BITS).cast("int"), words_per_segment)
        + 1,
    )
    bit_set = (
        F.floor(
            word
            / F.pow(F.lit(2.0), F.pmod(F.col("p"), F.lit(WORD_BITS)))
        ).cast("bigint")
        % 2
        == 1
    )
    verdict = (
        joined.select(
            url_col,
            F.coalesce(bit_set, F.lit(False)).alias("hit"),
        )
        .groupBy(url_col)
        # min over booleans = AND of the k bit tests (and stays
        # correct if a url appears in probes more than once)
        .agg(F.min("hit").alias("in_bloom"))
    )
    return probes.join(verdict, url_col, "left")


def schedule_fetches(
    frontier: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    priority_col: str = "priority",
    default_delay: int = 1,
) -> DataFrame:
    """Politeness scheduler — the step AFTER the q182 work list: a
    crawler may not hammer a host, so each host's fetches serialize
    at its crawl-delay (q186's surface; ``default_delay`` where the
    host declared none). Slots assign by (priority desc, url) —
    deterministic — and ``fetch_at_s`` = slot × delay, the earliest
    legal start offset per url.

    Returns (url, host, slot, fetch_at_s). Scale shape: ONE window
    partitioned by host (the natural crawl parallelism unit — a
    frontier is wide in hosts, bounded per host), the delay table is
    host-count-sized and broadcast; no global ordering anywhere."""
    from pyspark.sql import Window

    host_of = F.lower(
        F.regexp_extract(F.col(url_col), "^[^:/?#]+://([^/?#]*)", 1)
    )
    w = Window.partitionBy("host").orderBy(
        F.col(priority_col).desc_nulls_last(), F.col(url_col)
    )
    return (
        frontier.withColumn("host", host_of)
        .join(F.broadcast(delays), "host", "left")
        .withColumn(
            "slot", (F.row_number().over(w) - 1).cast("bigint")
        )
        .select(
            url_col,
            "host",
            "slot",
            (
                F.col("slot")
                * F.coalesce("crawl_delay", F.lit(default_delay))
            ).cast("bigint").alias("fetch_at_s"),
        )
    )


def merge_bloom_segments(
    prev: DataFrame, delta: DataFrame
) -> DataFrame:
    """Fold a new batch's sharded bitmap into the at-rest frontier
    state: per segment, words OR together (``zip_with`` bitwiseOR —
    fixed-width arrays by construction). OR is idempotent and
    commutative, so replayed/duplicated batches change NOTHING —
    the exactly-once property a crawl frontier needs under
    at-least-once delivery (the q156 merge≡recompute regime, bit-OR
    instead of sum). Both sides are densified (every segment
    present), so the join is a plain inner equi-join on the segment
    key — segment-count-sized, never url-scaled."""
    return (
        prev.alias("a")
        .join(delta.alias("b"), "segment")
        .select(
            "segment",
            F.zip_with(
                F.col("a.words"),
                F.col("b.words"),
                lambda x, y: x.bitwiseOR(y),
            ).alias("words"),
        )
    )


_HREF_DQ = '(?i)<a\\s[^>]*?href\\s*=\\s*"([^"]*)"'
_HREF_SQ = "(?i)<a\\s[^>]*?href\\s*=\\s*'([^']*)'"


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Anchor extraction + resolution for the crawl link graph —
    expression-only (regexp_extract_all + canonical_url, codegen-
    fused, zero Python): one output row per resolved link, columns
    ``src`` (canonical page URL) and ``dst`` (canonical target).

    Declared policy (sources/linkgraph_fixture.py is the decisive
    corpus): <a ... href> in either quote style, any attribute
    order/case; absolute http(s) targets kept, protocol-relative
    resolved with the page scheme, root-relative with the page
    scheme+host; document-relative / mailto: / javascript: /
    fragment-only are out of scope and dropped; both endpoints go
    through the house canonical_url policy, NULL canons filtered.

    Scale shape: pure map-side fan-out (explode of per-page href
    arrays) — at 100 TB this rides the WARC scan's file-level
    parallelism; the first shuffle is whatever edge aggregation
    follows, keyed by host, never by page.
    """
    from ..functions import canonical_url

    src = canonical_url(F.col(url_col))
    scheme = F.regexp_extract(src, "^([a-z][a-z0-9+.-]*)://", 1)
    host = F.regexp_extract(src, "^[^:/?#]+://([^/?#]*)", 1)
    hrefs = F.concat(
        F.regexp_extract_all(F.col(html_col), F.lit(_HREF_DQ), 1),
        F.regexp_extract_all(F.col(html_col), F.lit(_HREF_SQ), 1),
    )
    href = F.col("href")
    # resolution must reference the PROJECTED scheme/host columns —
    # the canonical-src expressions name url_col, which the explode
    # projection below no longer carries
    resolved = (
        F.when(href.rlike("(?i)^https?://"), href)
        .when(
            href.startswith("//"),
            F.concat(F.col("__scheme"), F.lit(":"), href),
        )
        .when(
            href.startswith("/"),
            F.concat(
                F.col("__scheme"), F.lit("://"), F.col("__host"), href
            ),
        )
        .otherwise(F.lit(None))
    )
    return (
        pages.select(
            src.alias("src"),
            scheme.alias("__scheme"),
            host.alias("__host"),
            F.explode(hrefs).alias("href"),
        )
        .withColumn("dst", canonical_url(resolved))
        .filter(F.col("dst").isNotNull() & F.col("src").isNotNull())
        .select("src", "dst")
    )


def host_edges(links: DataFrame) -> DataFrame:
    """Host-level link-graph edges from (src, dst) canonical URL
    pairs: weight = link count, self-loops dropped (cross-host
    endorsement is the crawl-prioritization signal). One narrow
    shuffle on the (src_host, dst_host) pair."""
    sh = F.regexp_extract("src", "^[^:/?#]+://([^/?#]*)", 1)
    dh = F.regexp_extract("dst", "^[^:/?#]+://([^/?#]*)", 1)
    return (
        links.select(sh.alias("src_host"), dh.alias("dst_host"))
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("w"))
    )


_ANCHOR_DQ = '(?i)<a\\s[^>]*?href\\s*=\\s*"([^"]*)"[^>]*>(.*?)</a>'
_ANCHOR_SQ = "(?i)<a\\s[^>]*?href\\s*=\\s*'([^']*)'[^>]*>(.*?)</a>"


def extract_anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(anchor text -> target URL) pairs from archived HTML — the
    web's free labeled data: anchor texts are human descriptions of
    the page they point to (classic IR signal; in LLM pipelines they
    become query/document training pairs). Expression-only, same
    declared href scope as ``extract_links`` (both quote styles,
    same resolution CASE, canonical endpoints); anchors are
    single-tag-line scope (the dot doesn't cross newlines), inner
    markup is stripped from the text, whitespace collapsed, and
    empty texts dropped.

    Returns (src, dst, anchor_text) — one row per kept anchor.
    Map-side fan-out like extract_links; the aggregation that
    follows (per-target collection) is the first shuffle, keyed by
    the TARGET — the key you want at scale, since anchor evidence
    for a page arrives from everywhere.
    """
    from ..functions import canonical_url

    src = canonical_url(F.col(url_col))
    scheme = F.regexp_extract(src, "^([a-z][a-z0-9+.-]*)://", 1)
    host = F.regexp_extract(src, "^[^:/?#]+://([^/?#]*)", 1)

    def pairs(pattern: str) -> Column:
        return F.zip_with(
            F.regexp_extract_all(F.col(html_col), F.lit(pattern), 1),
            F.regexp_extract_all(F.col(html_col), F.lit(pattern), 2),
            lambda h, t: F.struct(h.alias("href"), t.alias("raw")),
        )

    href = F.col("a.href")
    resolved = (
        F.when(href.rlike("(?i)^https?://"), href)
        .when(
            href.startswith("//"),
            F.concat(F.col("__scheme"), F.lit(":"), href),
        )
        .when(
            href.startswith("/"),
            F.concat(
                F.col("__scheme"), F.lit("://"), F.col("__host"), href
            ),
        )
        .otherwise(F.lit(None))
    )
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("a.raw"), "<[^>]*>", ""),
            "\\s+",
            " ",
        )
    )
    return (
        pages.select(
            src.alias("src"),
            scheme.alias("__scheme"),
            host.alias("__host"),
            F.explode(
                F.concat(pairs(_ANCHOR_DQ), pairs(_ANCHOR_SQ))
            ).alias("a"),
        )
        .select(
            "src",
            canonical_url(resolved).alias("dst"),
            text.alias("anchor_text"),
        )
        .filter(
            F.col("dst").isNotNull()
            & F.col("src").isNotNull()
            & (F.col("anchor_text") != "")
        )
    )
