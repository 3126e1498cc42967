"""Expression-level helpers.

Everything here is built from ``pyspark.sql.functions`` higher-order
functions so it stays inside whole-stage codegen — no Python UDFs in
the hot path (SURVEY §4.3). Vector math over ``array<float>`` uses
sequential fold order, so results are bit-deterministic for a given
input ordering.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine_similarity",
    "ts_str",
    "date_str",
    "whitespace_tokens",
    "word_shingles",
]


def dot(a, b) -> Column:
    """Dot product of two array<numeric> columns, JVM-side.

    Sequential left fold => deterministic float accumulation order.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def ts_str(col) -> Column:
    """Render a timestamp as a canonical µs string (FIXTURES.md §4).

    Query outputs never expose raw timestamp types: Spark is µs, DuckDB
    is ns, and cross-engine hashing of native timestamps is fragile.
    Matches DuckDB ``strftime(ts, '%Y-%m-%d %H:%M:%S.%f')``.
    """
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")


def date_str(col) -> Column:
    """Render a date/timestamp as 'yyyy-MM-dd' (DuckDB: strftime '%Y-%m-%d')."""
    return F.date_format(col, "yyyy-MM-dd")


def whitespace_tokens(col) -> Column:
    """Split text on runs of whitespace, dropping empty tokens."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def md5_prefix32(col) -> Column:
    """Portable 32-bit hash: first 8 md5 hex chars of the stringified
    value, decoded to a bigint. The ONE Spark-side definition of the
    hash every deterministic-order/bucketing operator uses (splits,
    sampling, token budgets, KMV sketches) — its SQL twin is
    ext_oracle._h32, and keeping each side single-sourced is what
    stops the two from drifting."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def word_shingles(tokens, n: int = 3) -> Column:
    """Word n-gram shingles over an ALREADY-MATERIALIZED array<string>
    token column. Documents shorter than ``n`` words yield a single
    shingle of all tokens.

    Callers must materialize tokens with ``whitespace_tokens`` in a
    prior projection: referencing the tokenizer expression directly here
    would re-evaluate the split per window position inside the lambda
    (no common-subexpression elimination across lambda iterations) —
    O(tokens²) per document.
    """
    toks = F.col(tokens) if isinstance(tokens, str) else tokens
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def canonical_url(col) -> Column:
    """WHATWG-flavored URL canonicalization (VERDICT r8 item 2) — the
    stage-0 key every crawl pipeline (C4, CCNet) dedups on BEFORE
    text dedup. Declared policy, expression-only (JVM-side, codegen-
    fused; the SQL twin is ext_oracle._canon_url_expr — the single
    SQL rendering every canonicalizing oracle builds from):

    1. drop the fragment;
    2. scheme and host lowercase (path/query case is significant);
    3. strip the scheme's default port (http:80, https:443);
    4. empty path becomes "/"; a non-root path loses its trailing
       slashes (the whole run — which makes the policy IDEMPOTENT,
       hypothesis-pinned: one pass over "/a//" must equal two);
    5. query parameters sort lexicographically (order never changes
       resource identity for sane endpoints); an empty query ("?" or
       none) is dropped.

    Non-URI inputs (no "://") canonicalize to NULL — callers filter
    or surface them, never silently keep unkeyed rows.
    """
    u = F.regexp_replace(col, "#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    auth = F.lower(F.regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1))
    host = (
        F.when(
            (scheme == "http") & auth.endswith(":80"),
            F.substring(auth, 1, F.length(auth) - 3),
        )
        .when(
            (scheme == "https") & auth.endswith(":443"),
            F.substring(auth, 1, F.length(auth) - 4),
        )
        .otherwise(auth)
    )
    raw_path = F.regexp_replace(
        F.regexp_extract(u, "^[^:/?#]+://[^/?#]*([^?#]*)", 1),
        "/+$",
        "",
    )
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    qs = F.array_join(F.array_sort(F.split(q, "&")), "&")
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme, F.lit("://"), host, path,
            F.when(q == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), qs)
            ),
        )
    )
