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

__all__ = ["bloom_positions", "build_url_bloom", "probe_url_bloom"]

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
    idx = seen.sparkSession.range(n_words).select(
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
# Declared scope: the `*` user-agent group's Allow/Disallow rules,
# longest-prefix-match wins, Allow wins length ties, no match =
# allowed (the RFC defaults). Group membership is positional (a rule
# belongs to the most recent User-agent line above it) — computed
# with a running window, not a Python parser, so the whole stage
# stays JVM-side and the oracle can replay it with the same window.


def parse_robots(
    responses: DataFrame,
    uri_col: str = "target_uri",
    text_col: str = "text",
) -> DataFrame:
    """robots.txt response rows -> (host, rule, prefix) for the `*`
    group. Line grammar is case-insensitive on field names; empty
    rule paths (``Disallow:`` = allow everything) are dropped."""
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
        "host", "ln", F.trim(F.regexp_replace("raw", "\r$", "")).alias("line")
    )
    parsed = lines.select(
        "host",
        "ln",
        F.regexp_extract(F.col("line"), r"(?i)^user-agent:\s*(\S+)", 1)
        .alias("ua"),
        F.lower(
            F.regexp_extract(F.col("line"), r"(?i)^(allow|disallow):", 1)
        ).alias("rule"),
        F.trim(
            F.regexp_extract(
                F.col("line"), r"(?i)^(?:allow|disallow):\s*(\S*)", 1
            )
        ).alias("prefix"),
    )
    w = (
        Window.partitionBy("host")
        .orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = parsed.withColumn(
        "group_ua",
        F.last(F.when(F.col("ua") != "", F.col("ua")), True).over(w),
    )
    return grouped.filter(
        (F.col("group_ua") == "*")
        & (F.col("rule") != "")
        & (F.col("prefix") != "")
    ).select("host", "rule", "prefix")


def robots_allowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Append ``allowed`` per url: longest matching prefix rule of
    the url's host decides; Allow wins equal lengths; hosts without
    rules (or no matching rule) default to allowed. Rules tables are
    tiny by nature (KBs per host) — broadcast join, one narrow
    aggregate on the url."""
    u = urls.select(
        F.col(url_col).alias("url"),
        F.lower(
            F.regexp_extract(F.col(url_col), "^[^:/?#]+://([^/?#]*)", 1)
        ).alias("host"),
        F.regexp_extract(
            F.col(url_col), "^[^:/?#]+://[^/?#]*([^?#]*)", 1
        ).alias("path"),
    )
    joined = u.join(F.broadcast(rules), "host", "left").withColumn(
        "hit",
        F.col("prefix").isNotNull()
        & F.col("path").startswith(F.col("prefix")),
    )
    verdict = joined.groupBy("url").agg(
        F.max_by(
            F.col("rule") == "allow",
            F.when(
                F.col("hit"),
                # longest prefix wins; allow outranks disallow on ties
                F.length("prefix") * 2
                + (F.col("rule") == "allow").cast("int"),
            ).otherwise(F.lit(-1)),  # non-hits lose to any hit; when
            # NO rule hits, the winner is unused (any_hit gates it)
        ).alias("winner_allow"),
        F.max(F.when(F.col("hit"), 1).otherwise(0)).alias("any_hit"),
    )
    return verdict.select(
        "url",
        (
            (F.col("any_hit") == 0) | F.col("winner_allow")
        ).alias("allowed"),
    )
