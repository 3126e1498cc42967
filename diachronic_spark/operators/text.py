"""Text-analysis operators (SURVEY §2.11 L4/L6): language ID heuristic,
quality scoring, token counting, document fingerprinting. All
expression-only — JVM-side, codegen-fused, linear scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import md5_prefix32, whitespace_tokens
from ._cache import managed_persist

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and fixed: the operator contract is the
# scoring mechanism, not lexicon quality.
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "les", "de", "et", "est", "que", "un"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single other symbols.
RE_TOKEN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def stopword_hits(tokens: Column, lang: str) -> Column:
    """Occurrence count (not distinct) of this language's stopwords."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))


def predict_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-language stopword scores and an argmax prediction.

    Tie-break: first language in alphabetical order with the max score
    (deterministic; word-soup fixtures mostly tie at 0).
    """
    toks = whitespace_tokens(F.col(text_col))
    out = df
    for lang in STOPWORDS:
        out = out.withColumn(f"s_{lang}", stopword_hits(toks, lang))
    m = F.greatest(*[F.col(f"s_{lang}") for lang in STOPWORDS])
    pred = None
    for lang in sorted(STOPWORDS):
        cond = F.col(f"s_{lang}") == m
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return out.withColumn("predicted_lang", pred)


def quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality columns: char/word counts, mean word length,
    punctuation ratio, stopword ratio (all languages pooled)."""
    toks = whitespace_tokens(F.col(text_col))
    all_sw = F.array(
        *[F.lit(w) for ws in STOPWORDS.values() for w in ws]
    )
    n_words = F.size(toks)
    return (
        df.withColumn("n_chars_m", F.length(text_col))
        .withColumn("n_words", n_words)
        .withColumn(
            "mean_word_len",
            F.when(n_words > 0,
                   F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
                   / n_words.cast("double")).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(
                F.length(text_col) > 0,
                F.length(F.regexp_replace(text_col, "[A-Za-z0-9\\s]", ""))
                / F.length(text_col).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(
                n_words > 0,
                F.size(F.filter(toks, lambda t: F.array_contains(all_sw, t)))
                / n_words.cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count and BPE-ish regex token count per doc."""
    return df.withColumn(
        "n_ws_tokens", F.size(whitespace_tokens(F.col(text_col)))
    ).withColumn("n_re_tokens", F.size(F.regexp_extract_all(F.col(text_col), F.lit(RE_TOKEN), 0)))


def fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 16, stride: int = 4
) -> DataFrame:
    """Rolling char-k-gram fingerprint: min md5 over k-char windows
    sampled every ``stride`` chars (a bottom-1 sketch — winnowing's
    degenerate form; identical texts share it, near-identical texts
    usually do). Stride bounds hash work per byte at scale.
    Expression-only: window starts via sequence(), md5 per window, min.
    """
    txt = F.col(text_col)
    last_start = F.greatest(F.length(txt) - F.lit(k - 1), F.lit(1))
    starts = F.sequence(F.lit(1), last_start, F.lit(stride))
    return df.withColumn(
        "fp",
        F.array_min(
            F.transform(
                starts, lambda i: F.md5(F.col(text_col).substr(i, F.lit(k)))
            )
        ),
    ).withColumn("n_grams", F.size(starts))


def hash_split(
    df: DataFrame, key: str = "doc_id", weights: tuple[int, int, int] = (8, 1, 1)
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    key hash — the reproducible-split primitive every training-data
    pipeline needs: membership depends only on the key, so re-runs,
    backfills, and different clusters all agree, and no shuffle or
    global sort is involved (pure projection).

    Buckets: md5(key) first 8 hex chars -> 32-bit int, mod 10:
    [0, w_train) train, [w_train, w_train+w_val) val, rest test.
    """
    w_train, w_val, _ = weights
    h = md5_prefix32(F.col(key))
    bucket = F.pmod(h, F.lit(10))
    return df.withColumn(
        "split",
        F.when(bucket < w_train, "train")
        .when(bucket < w_train + w_val, "val")
        .otherwise("test"),
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition quality signals — the Gopher-style
    repeated-content filters adapted to newline-free corpora:

    - ``dup_trigram_frac``: 1 - distinct/total word trigrams. Entirely
      row-local (HOF + array_distinct inside codegen, no shuffle): a
      doc that loops the same phrase scores near 1.
    - ``top_bigram_frac``: occurrences of the single most frequent
      bigram / total bigrams. Needs a per-(doc, bigram) count, done as
      explode -> two-level aggregation; the first groupBy's map-side
      partial collapse means the exchange carries the DISTINCT
      (doc, bigram) pairs, not every token — the same shape as q69's
      profiling and safe at any corpus size.

    Docs with too few words for an n-gram score 0.0 for that signal.
    """
    # materialize the token array ONCE: HOF lambda bodies get no CSE,
    # so an inlined tokenizer re-splits the text per element —
    # O(len^2) per doc (the SCALE.md tokenization rule; measured 16s →
    # 1s at sf0.1 for this operator)
    toks = F.col("__toks")
    n = F.size(toks)

    def grams(width: int) -> Column:
        idx = F.sequence(F.lit(1), n - (width - 1))
        g = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k) for k in range(width)]
            ),
        )
        # NB: F.sequence counts DOWN when n < width (bidirectional),
        # hence the explicit short-doc guard (same as bigram_pairs)
        return F.when(n >= width, g).otherwise(
            F.array().cast("array<string>")
        )

    base = df.select(
        F.col(id_col),
        whitespace_tokens(F.col(text_col)).alias("__toks"),
    ).select(
        F.col(id_col), grams(3).alias("tg"), grams(2).alias("bg")
    ).select(
        id_col,
        F.when(
            F.size("tg") > 0,
            1 - F.size(F.array_distinct("tg"))
            / F.size("tg").cast("double"),
        ).otherwise(F.lit(0.0)).alias("dup_trigram_frac"),
        "bg",
    )
    # explode_outer keeps zero-bigram docs (null bigram row) so the
    # final frame still carries every input doc
    per = (
        base.select(id_col, "dup_trigram_frac", F.explode_outer("bg").alias("b"))
        .groupBy(id_col, "b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.first("dup_trigram_frac").alias("dtf"),
        )
    )
    real = F.when(F.col("b").isNotNull(), F.col("c"))
    return per.groupBy(id_col).agg(
        F.first("dtf").alias("dup_trigram_frac"),
        F.coalesce(
            F.max(real).cast("double") / F.sum(real), F.lit(0.0)
        ).alias("top_bigram_frac"),
    )


def mixture_sample_tokens(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    bucket_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic mixture sampling to a token budget — the data-mix
    step of a training corpus build: each bucket (language/domain/
    source) gets ``floor(budget * w / sum(w))`` tokens; docs are
    admitted in content-independent hash-of-id order until the bucket
    budget is exhausted (the doc that would cross the line is
    excluded). Buckets absent from ``weights`` contribute nothing.

    Determinism is the contract: membership depends only on
    (id, weights, budget), so re-runs, backfills, and different
    cluster layouts produce the same corpus — the same md5-derived
    hash as ``hash_split``. Shape: one narrow projection, a broadcast
    join of the k-row target table, and ONE window cumsum per bucket
    (a single shuffle on the bucket key; at skewed bucket sizes the
    cumsum is still a linear per-partition scan).
    """
    total_w = float(sum(weights.values()))
    spark = df.sparkSession
    from ._cache import local_relation

    targets = local_relation(
        spark,
        [(b, int(budget_tokens * w / total_w)) for b, w in sorted(weights.items())],
        f"{bucket_col} string, target_tokens bigint",
    )
    h = md5_prefix32(F.col(id_col))
    w = (
        Window.partitionBy(bucket_col)
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        df.select(
            F.col(id_col),
            F.col(bucket_col),
            F.size(whitespace_tokens(F.col(text_col)))
            .cast("bigint")
            .alias("n_tokens"),
            h.alias("h"),
        )
        .join(F.broadcast(targets), bucket_col)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
    )
    return ranked.filter(
        F.col("cum_tokens") <= F.col("target_tokens")
    ).select(id_col, bucket_col, "n_tokens", "cum_tokens")


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text form: lowercase, strip non-alphanumerics,
    collapse whitespace. Expression-only; the first step of most
    dedup/quality pipelines (case/punctuation variants should hash
    identically downstream)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9\\s]", ""),
            "\\s+",
            " ",
        )
    )
    return df.withColumn("norm_text", norm)


def pack_sequences(
    df: DataFrame,
    bin_tokens: int = 2048,
    key: str = "source",
    order: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to contiguous fixed-token-budget bins (context-
    window packing for training): running token count per key, bin =
    floor((cumsum-1)/budget). One window shuffle on the pack key; no
    driver-side loop. Documents can straddle a boundary — this is the
    declarative approximation of greedy packing (exact greedy is
    sequential; run it per-bin downstream if splits must not straddle).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.size(whitespace_tokens(F.col(text_col)))
    return (
        df.withColumn("n_toks", toks)
        .withColumn("cum_toks", F.sum("n_toks").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum_toks") - 1) / F.lit(bin_tokens)).cast("bigint"),
        )
    )


def _greedy_pack_ids(toks, budget: int):
    """The greedy first-fit fold as a searchsorted JUMP per pack over
    the token cumsum — O(P log n) for P packs instead of a per-doc
    Python loop; exact-equal to the naive fold (hypothesis-pinned in
    tests/test_quality_stats.py)."""
    import numpy as np

    cs = np.asarray(toks, dtype=np.int64).cumsum()
    n = len(cs)
    pack = np.empty(n, dtype=np.int64)
    start, p, base = 0, 0, 0
    while start < n:
        # widest prefix fitting the budget; an oversize doc at
        # `start` yields j < start and founds a singleton pack
        j = int(np.searchsorted(cs, base + budget, side="right")) - 1
        if j < start:
            j = start
        pack[start : j + 1] = p
        base = int(cs[j])
        start, p = j + 1, p + 1
    return pack


def pack_sequences_greedy(
    df: DataFrame,
    bin_tokens: int = 2048,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    return_assignments: bool = False,
) -> DataFrame:
    """EXACT whole-document greedy packing — the sequential variant
    ``pack_sequences`` declares out of scope ("run it per-bin
    downstream if splits must not straddle"): documents never
    straddle a pack boundary. Docs are hash-bucketed by id
    (``md5_prefix32 % n_buckets`` — content-independent, replayable),
    ordered by id within the bucket, and folded greedily: a doc joins
    the open pack unless that would exceed ``bin_tokens``, in which
    case it founds the next pack (an oversize doc therefore occupies
    a pack alone — training-side truncation is a separate policy).

    Scale shape: the shuffle carries (bucket, id, n_tokens) ONLY —
    ~24 bytes/doc, never the text, which is the difference between a
    packing pass and a corpus copy at 100 TB. Buckets are the
    parallelism unit (set ``n_buckets`` ~ cluster cores); the
    per-bucket fold is sequential BY DEFINITION, but runs as a
    numpy searchsorted jump per PACK, not per doc — O(P log n_b)
    with P = packs in the bucket — inside one Arrow-batched
    ``applyInPandas`` task. Output is pack-level (one row per pack:
    count, token sum, id span), so the result is ~budget/avg_tokens
    smaller than the corpus. With ``return_assignments`` the
    per-doc (bucket, doc_id, n_tokens, pack_id) rows come back
    instead — the shard sink (``bpe.write_packed_shards``) joins
    them to the token sequences it materializes.
    """
    if bin_tokens < 1 or n_buckets < 1:
        raise ValueError(
            f"bin_tokens/n_buckets must be >= 1, got "
            f"{bin_tokens}/{n_buckets}"
        )
    # budget currency: whitespace count of text_col by default, or a
    # caller-supplied token-count column (e.g. real BPE n_tokens from
    # operators/bpe.py — VERDICT r8 item 1's rewire; q175)
    tok = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(whitespace_tokens(F.col(text_col)))
    )
    narrow = df.select(
        F.col(id_col).alias("doc_id"),
        (md5_prefix32(F.col(id_col)) % n_buckets)
        .cast("int")
        .alias("bucket"),
        tok.cast("bigint").alias("n_tokens"),
    )

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id", ignore_index=True)
        return pd.DataFrame(
            {
                "bucket": pdf["bucket"],
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "pack_id": _greedy_pack_ids(
                    pdf["n_tokens"].to_numpy(), bin_tokens
                ),
            }
        )

    assigned = narrow.groupBy("bucket").applyInPandas(
        fold,
        "bucket int, doc_id bigint, n_tokens bigint, pack_id bigint",
    )
    if return_assignments:
        return assigned
    return assigned.groupBy("bucket", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (idf = ln((1+N)/(1+df)) + 1, the sklearn smoothing — never
    divides by zero, never goes negative).

    Ranking is by score ROUNDED TO 6 DP desc, then term asc: tf and df
    are integers but ln() may differ in the last ulp across engines,
    and an ulp must never flip a rank (same guard as the kmeans fit).

    Scale shape: one shuffle to (doc, term) counts with map-side
    partial aggregation; the per-term document-frequency table is
    vocabulary-sized (zipfian, << corpus) and joins back on the term
    key — AQE broadcasts it when small; N arrives as a 1-row broadcast
    cross-join, not a driver-side collect.

    Returns (id_col, term_rank, term, score[2dp]).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(whitespace_tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n"))
    scored = (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (
                F.log((1.0 + F.col("n")) / (1.0 + F.col("df")))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("score"), 6).desc(), F.col("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_k)
        .select(id_col, "term_rank", "term", "score")
    )


def bm25_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_query_terms: int = 3,
    skip_top_df: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Okapi BM25 ranked retrieval (Robertson & Walker, the standard
    lexical-retrieval scorer) — the length-normalized complement of
    ``tfidf_top_terms`` (per-doc term importance) and the q73/q74
    boolean postings machinery (set retrieval): disjunctive SCORED
    retrieval with saturation (k1) and document-length normalization
    (b), the function every retrieval-based curation/RAG pipeline runs
    first.

    The query is data-driven and self-scaling: the ``n_query_terms``
    terms ranked ``skip_top_df+1 .. skip_top_df+n_query_terms`` by
    document frequency (desc, ties by term) — mid-frequency terms, the
    band real queries live in (the top-``skip_top_df`` df heads are the
    corpus' stopwords, exactly what q73 surfaces).

    score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  — always > 0.

    Determinism across engines: each per-term contribution is
    pre-rounded to 10dp (multiplicative HALF_UP), the per-doc sum is an
    ORDERED fold over the term-sorted contribution array (F.aggregate —
    the q51/q83/q190 pattern), avgdl is an explicit exact-integer
    sum(dl)/N division (never engine-avg), and ranking is by the
    6dp-rounded score desc then doc id (the q56 ulp guard).

    Scale shape: one (doc, term) count shuffle with map-side partials;
    df is vocabulary-sized and aggregated from tf (no second corpus
    scan); the query-term table (<= n_query_terms rows) and the 1-row
    (N, avgdl) stats arrive as broadcasts; scoring touches only the tf
    rows of the query terms (a semi-join-shaped inner join against the
    broadcast); the final top-k is a TakeOrdered, never a global sort.

    Returns (id_col, dl, score) — the ``top_k`` best documents.
    """
    # toks feeds tf AND the length/stats branch; tf feeds df, the
    # query-term ranking, and scoring — persist both so the tokenize
    # (CPU) and the (doc, term) shuffle each run exactly once.
    toks = managed_persist(
        df.select(
            F.col(id_col),
            whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
        ),
        "text.bm25.toks",
    )
    lens = toks.select(F.col(id_col), F.size("__toks").alias("dl"))
    tf = managed_persist(
        toks.select(F.col(id_col), F.explode("__toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf")),
        "text.bm25.tf",
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # limit-first (the q74 shape): the global row_number window only
    # ever sees skip_top_df + n_query_terms rows.
    w = Window.orderBy(F.desc("df"), "term")
    qterms = (
        dfreq.orderBy(F.desc("df"), "term")
        .limit(skip_top_df + n_query_terms)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > skip_top_df)
        .select("term", "df")
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    m10 = F.lit(1e10)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / norm
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            "term",
            "dl",
            (F.floor(contrib * m10 + F.lit(0.5)) / m10).alias("c"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.first("dl").alias("dl"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", "c"))),
                lambda s: s["c"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    return (
        agg.select(
            F.col(id_col),
            F.col("dl").cast("bigint").alias("dl"),
            (F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
            .alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(top_k)
    )


# Rolling-hash parameters: Horner fold acc*B + code mod P. P = 2^31-1
# (Mersenne) keeps acc*B + 0xFFFF < 2^39, far from int64 overflow, and
# is portable to any engine with 64-bit integer arithmetic.
RH_BASE = 131
RH_MOD = 2**31 - 1


def fingerprint_rolling(
    df: DataFrame, text_col: str = "text", k: int = 16, stride: int = 4
) -> DataFrame:
    """Production variant of ``fingerprint``: same min-over-k-char-
    windows bottom-1 sketch, but each window hashes via a polynomial
    Horner fold of Unicode code points in plain int64 arithmetic
    instead of an md5 digest — no cryptographic rounds in the hot
    loop, stays fully inside whole-stage codegen.

    The code-point array must materialize ONCE per document: lambda
    bodies get no CSE, and a plain ``withColumn`` is NOT enough —
    CollapseProject inlines it into every window's slice, re-splitting
    the whole text per window (O(len²) per doc; measured 15.7s vs 1.0s
    at sf0.1). The barrier is ``explode(array(codes))``: a Generate
    node evaluates its child exactly once per row and downstream
    references see an attribute, not a substitutable expression — no
    cache, no shuffle, still one streaming pass.

    ``fp`` is a bigint (vs the md5 variant's hex string) — 8 bytes per
    doc in every downstream shuffle instead of 32.
    """
    txt = F.col(text_col)
    last_start = F.greatest(F.length(txt) - F.lit(k - 1), F.lit(1))
    starts = F.sequence(F.lit(1), last_start, F.lit(stride))
    codes = F.transform(F.split(txt, ""), lambda c: F.ascii(c).cast("long"))
    with_codes = df.select(
        "*", F.explode(F.array(codes)).alias("__codes")
    )
    window_hash = lambda i: F.aggregate(  # noqa: E731
        F.slice(F.col("__codes"), i, k),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * RH_BASE + c) % RH_MOD,
    )
    return (
        with_codes.withColumn(
            "fp", F.array_min(F.transform(starts, window_hash))
        )
        .withColumn("n_grams", F.size(starts))
        .drop("__codes")
    )


def fingerprint_rolling_np(
    df: DataFrame, text_col: str = "text", k: int = 16, stride: int = 4
) -> DataFrame:
    """Arrow-vectorized dual of ``fingerprint_rolling`` — bit-identical
    output (equality-pinned in tests/test_batch_ops.py), ~2x faster on
    a fresh plan.

    Why a pandas UDF beats the expression form HERE: higher-order
    functions (transform/aggregate) are CodegenFallback — every
    window's 16-step Horner fold runs on the INTERPRETED expression
    evaluator, one eval() call per tree node per element. The
    vectorized form ships text through one Arrow batch and computes
    all windows of a doc as a single strided int64 matmul + mod
    (exact: codes < 2^21, powers < 2^31, 16-term dot < 2^56 < 2^63),
    so the per-window cost is a few SIMD ops instead of dozens of
    boxed evals. Same O(len/stride) work, same single narrow stage,
    no shuffle — the 100 TB shape is unchanged.
    """
    import numpy as np
    import pandas as pd

    pows = np.array(
        [pow(RH_BASE, k - 1 - j, RH_MOD) for j in range(k)], dtype=np.int64
    )

    # module-wide `from __future__ import annotations` stringifies type
    # hints, which the pandas_udf signature inference can't resolve —
    # set real objects explicitly before wrapping.
    def roll(texts):
        # object arrays so NULL text matches the expression form on
        # nullable documents.text: fp null-propagates through the fold,
        # while n_grams is 1 (greatest() skips the NULL length, so the
        # expression's starts sequence is [1])
        fps = np.empty(len(texts), dtype=object)
        ngs = np.empty(len(texts), dtype=object)
        for i, t in enumerate(texts):
            if t is None:
                fps[i] = None
                ngs[i] = 1
                continue
            codes = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            n = len(codes)
            starts = np.arange(0, max(n - (k - 1), 1), stride)
            ngs[i] = len(starts)
            if n < k:
                # short doc: one window over whatever is there (slice
                # semantics of the expression form)
                acc = 0
                for c in codes:
                    acc = (acc * RH_BASE + c) % RH_MOD
                fps[i] = acc
                continue
            win = np.lib.stride_tricks.sliding_window_view(codes, k)[starts]
            fps[i] = ((win * pows).sum(axis=1) % RH_MOD).min()
        return pd.DataFrame({"fp": fps, "n_grams": ngs})

    roll.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    roll = F.pandas_udf(roll, "fp long, n_grams int")

    return df.withColumn("__r", roll(F.col(text_col))).select(
        "*", F.col("__r.fp").alias("fp"),
        F.col("__r.n_grams").alias("n_grams")
    ).drop("__r")


def chunk_tokens(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunking (context-window shaping for
    training corpora): chunk ``c`` covers tokens
    ``[1 + c*stride, 1 + c*stride + size)``, so consecutive chunks
    overlap by ``size - stride`` tokens and trailing chunks may be
    shorter — every token is covered, nothing is padded. An empty
    document yields one empty chunk (row preserved for accounting).

    Expression-only and row-local: ``sequence`` generates the start
    offsets, one ``posexplode`` Generate emits a row per chunk, and
    ``slice`` re-reads the already-materialized token array — no
    shuffle, no Python, scales linearly with corpus bytes. chunk_id is
    the 0-based posexplode index, identical to ``(start-1)/stride``.
    """
    assert 0 < stride <= size, "stride must be in (0, size]"
    toks = df.select(
        id_col, whitespace_tokens(F.col(text_col)).alias("toks")
    ).withColumn("n_toks", F.size("toks"))
    starts = F.sequence(
        F.lit(1), F.greatest("n_toks", F.lit(1)), F.lit(stride)
    )
    return (
        toks.select(
            id_col, "toks", F.posexplode(starts).alias("chunk_id", "start")
        )
        .withColumn("chunk_toks", F.slice("toks", F.col("start"), size))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("chunk_toks").cast("long").alias("chunk_tokens"),
            F.array_join("chunk_toks", " ").alias("chunk_text"),
        )
    )


# --- PII scrubbing (training-data hygiene) ---------------------------------
# Patterns kept to the regex subset where Java's engine (Spark) and
# RE2 (DuckDB) agree exactly: char classes, bounded repeats, \b.  No
# backrefs, no lookaround (RE2 has neither).
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"


def inject_pii(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Deterministically append synthetic PII to every 7th document —
    the test substrate for `redact_pii` (the real corpus is lorem text
    with no emails/phones, so redaction would be an untested no-op).
    Mirrored verbatim in the q70 oracle SQL.
    """
    pii = F.format_string(
        " contact user%d@example.com or 555-%04d",
        F.col(id_col), F.col(id_col) % 10000,
    )
    return df.withColumn(
        text_col,
        F.when(F.col(id_col) % 7 == 0, F.concat(F.col(text_col), pii))
        .otherwise(F.col(text_col)),
    )


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails/phone numbers with typed placeholder tokens and
    count what was removed.

    Row-local and expression-only (regexp_extract_all + two
    regexp_replace): scan-bound at 100 TB, no shuffle, and the scan
    only reads the text column (column pruning).  Adds: n_emails,
    n_phones, redacted (text with [EMAIL]/[PHONE] substituted).
    """
    c = F.col(text_col)
    return (
        df.withColumn("n_emails", F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))))
        .withColumn("n_phones", F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))))
        .withColumn(
            "redacted",
            F.regexp_replace(
                F.regexp_replace(c, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
            ),
        )
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs —
# the GPT-2 pattern family minus lookarounds (kept to the Java ∩ RE2
# subset; both engines use leftmost-first alternation so the splits
# agree). Case-folded before matching.
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_tokens(col) -> "F.Column":
    """Token array under the BPE-ish regex (lowercased input)."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_RE), F.lit(0))


def bigram_pairs(tokens: "F.Column") -> "F.Column":
    """Adjacent token bigrams as array<struct<a,b>> — row-local (a HOF
    over the token array; no posexplode self-join, no shuffle). Empty
    for docs with < 2 tokens. NB: F.sequence(1, n) with n < 1 counts
    DOWN (Spark sequences are bidirectional), hence the explicit
    short-doc guard.
    """
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), n - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(tokens, i).alias("a"),
            F.element_at(tokens, i + 1).alias("b"),
        ),
    )
    return F.when(n >= 2, pairs).otherwise(
        F.array().cast("array<struct<a:string,b:string>>")
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style count-LM quality score: each document's mean
    add-one-smoothed bigram log-likelihood ln((c2+1)/(c1+V)) under the
    corpus's OWN bigram counts (c2 = corpus count of the bigram, c1 =
    of its conditioning word, V = vocabulary size) — the perplexity-
    proxy filter count-based pipelines use where CCNet uses a KenLM:
    repetitive/boilerplate text scores high (its bigrams are common),
    gibberish scores low (bigrams unseen elsewhere, smoothing floor).
    Complements ``q135``'s coverage signal (set membership) with an
    actual likelihood.

    Shape: bigrams come from the row-local HOF (no shuffle to build
    them); the LM tables are two hash-aggs whose exchanges carry
    DISTINCT (a, b) / token keys after map-side partial collapse; the
    scoring pass joins the exploded bigrams to c2 on (a, b) and to c1
    on the conditioning word, then one per-doc avg. V rides along as a
    broadcast 1-row frame — never a driver scalar in the plan. At
    100 TB the LM tables are the classic count-model shuffle (hot
    bigrams pre-collapsed map-side); score against a REFERENCE corpus
    by swapping the c1/c2/V inputs, same plan.

    Docs with < 2 tokens have no bigrams and are absent from the
    result (inner semantics, both engines). Returns
    (id_col, n_bigrams, avg_logp).
    """
    base = df.select(
        F.col(id_col), whitespace_tokens(F.col(text_col)).alias("__toks")
    )
    bg = base.select(
        id_col, F.explode(bigram_pairs(F.col("__toks"))).alias("p")
    ).select(id_col, F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    bg = managed_persist(bg, "lm.bg")  # consumers: c2 agg + scoring join
    tok = base.select(F.explode("__toks").alias("t"))
    c1 = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    c1 = managed_persist(c1, "lm.c1")  # consumers: V count + scoring join
    vv = c1.agg(F.count(F.lit(1)).alias("v"))
    c2 = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        bg.join(c2, ["a", "b"])
        .join(c1, bg["a"] == c1["t"])
        .crossJoin(F.broadcast(vv))
        .select(
            id_col,
            F.log(
                (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("lp").alias("avg_logp"),
    )


def char_entropy(text: "F.Column", max_chars: int = 512) -> "F.Column":
    """Shannon entropy (bits/char) of the character distribution over
    the first ``max_chars`` chars — a classic machine-generated-text /
    binary-junk quality signal. Entirely row-local HOF arithmetic
    (O(distinct_chars * len) comparisons per doc, all inside codegen);
    the prefix cap bounds the cost per row at scale.
    """
    s = F.lower(F.substring(text, 1, max_chars))
    arr = F.filter(F.split(s, ""), lambda c: c != "")
    n = F.size(arr).cast("double")
    counts = F.transform(
        F.array_distinct(arr),
        lambda c: F.size(F.filter(arr, lambda x: x == c)).cast("double"),
    )
    return F.when(
        n > 0,
        -F.aggregate(
            counts,
            F.lit(0.0),
            lambda acc, k: acc + (k / n) * F.log2(k / n),
        ),
    ).otherwise(F.lit(0.0))


def with_char_entropy(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "entropy",
    max_chars: int = 512,
) -> DataFrame:
    """Scale variant of :func:`char_entropy`: O(n log n) per row
    instead of O(distinct_chars * n).

    Shape: lower+split → codepoints (int compares, not UTF8String) →
    array_sort → run-starts index array → run lengths → entropy fold.
    The sorted-codes and run-starts arrays each materialize behind an
    ``explode(array(...))`` Generate barrier — the q31
    fingerprint_rolling lesson: lambda bodies get no CSE, and
    CollapseProject would otherwise inline the whole sort into every
    element_at, going quadratic.

    Same value as char_entropy up to float summation order (the run
    counts are the same multiset, folded in sorted-code order rather
    than first-occurrence order) — aggregate + round as usual.
    """
    s = F.lower(F.substring(F.col(text_col), 1, max_chars))
    codes = F.array_sort(
        F.transform(
            F.filter(F.split(s, ""), lambda c: c != ""),
            lambda c: F.ascii(c),
        )
    )
    d1 = df.select("*", F.explode(F.array(codes)).alias("__codes"))
    n = F.size(F.col("__codes"))
    starts = F.when(
        n > 0,
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == 1)
            | (
                F.get(F.col("__codes"), i - 1)
                != F.get(F.col("__codes"), i - 2)
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    d2 = d1.select("*", F.explode(F.array(starts)).alias("__starts"))
    m = F.size(F.col("__starts"))
    counts = F.transform(
        F.sequence(F.lit(1), m),
        lambda j: (
            F.coalesce(F.get(F.col("__starts"), j), n + 1)
            - F.get(F.col("__starts"), j - 1)
        ).cast("double"),
    )
    nd = n.cast("double")
    h = F.when(
        n > 0,
        -F.aggregate(
            F.when(m > 0, counts).otherwise(
                F.array().cast("array<double>")
            ),
            F.lit(0.0),
            lambda acc, k: acc + (k / nd) * F.log2(k / nd),
        ),
    ).otherwise(F.lit(0.0))
    return d2.withColumn(out_col, h).drop("__codes", "__starts")


def extract_html_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """HTML → visible text (the Common Crawl WET step): the declared
    layout policy of ``functions/html_text.py`` applied as an
    Arrow-batched pandas UDF — one Python call per batch, map-side,
    the step between q163's raw text/html response bodies and the
    documents table every downstream operator consumes. Lenient by
    contract: crawled HTML is tag soup by default, so the stdlib
    error-tolerant parser never raises on malformation."""
    import pandas as pd

    from ..functions.html_text import html_to_text

    # module-wide `from __future__ import annotations` stringifies
    # hints, which pandas_udf inference can't resolve — set real
    # objects explicitly before wrapping (the fingerprint rule).
    def _extract(s):
        # na_action: NULL html (e.g. read_warc rows whose mime was
        # not text) passes through as NULL — the lenient contract
        return s.map(html_to_text, na_action="ignore")

    _extract.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_extract, "string")
    return df.withColumn(out_col, udf(F.col(html_col)))


# --- C4-style rule-based page cleanup (VERDICT r8 item 6) -------------------
# The public C4 heuristics (Raffel et al. 2020, §2.2 of the T5
# paper), declared exactly:
#   line rules (applied to each '\n'-split, trimmed line):
#     keep iff it ends in terminal punctuation (. ! ? or a closing
#     double quote) AND has >= 5 whitespace words;
#   page rules:
#     drop the page if the RAW text contains a curly brace or
#     (case-insensitive) "lorem ipsum";
#     drop the page if the CLEANED text has < 3 sentences, where a
#     sentence is one [.!?]+ run.
# Expression-only — the whole operator is a codegen-fused projection
# + filter, no UDF, no shuffle; at 100 TB it runs map-side inside
# whatever scan feeds it.
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3
C4_LINE_END_RE = r'[.!?"]$'


def c4_clean(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply the C4 cleanup rules; surviving pages keep their cleaned
    text plus audit counts (lines in/kept, sentences)."""
    raw = F.col(text_col)
    lines = F.transform(F.split(raw, "\n"), lambda l: F.trim(l))
    kept = F.filter(
        lines,
        lambda l: l.rlike(C4_LINE_END_RE)
        & (
            F.size(F.filter(F.split(l, r"\s+"), lambda t: t != ""))
            >= C4_MIN_WORDS_PER_LINE
        ),
    )
    out = (
        df.withColumn("__lines", lines)
        .withColumn("__kept", kept)
        .withColumn("clean_text", F.array_join(F.col("__kept"), "\n"))
        .withColumn(
            "n_sentences",
            F.size(
                F.regexp_extract_all(
                    F.col("clean_text"), F.lit("[.!?]+"), F.lit(0)
                )
            ),
        )
    )
    page_ok = (
        ~raw.contains("{")
        & ~raw.contains("}")
        & ~F.lower(raw).contains("lorem ipsum")
        & (F.col("n_sentences") >= C4_MIN_SENTENCES)
    )
    return (
        out.filter(page_ok)
        .withColumn("n_lines_in", F.size(F.col("__lines")))
        .withColumn("n_lines_kept", F.size(F.col("__kept")))
        .drop("__lines", "__kept")
    )
