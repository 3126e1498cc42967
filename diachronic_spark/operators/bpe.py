"""Real byte-pair-encoding tokenizer (SURVEY §2.11 L4 extension;
VERDICT r8 item 1): merge-table training + Arrow-batched encode
producing real ``n_tokens``, replacing the whitespace/regex proxies
as the pipeline's budget currency.

Algorithm (public: Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units"; the greedy apply loop is the one
GPT-2's public encoder popularized):

- TRAIN: over a word-frequency table, repeatedly take the most
  frequent adjacent symbol pair (ties: lexicographically smallest
  pair) and merge it everywhere; each merge appends one row to the
  merge table. Deterministic by construction.
- ENCODE: a word starts as its character sequence; repeatedly find
  the adjacent pair with the LOWEST merge rank (ties: leftmost
  occurrence) and merge that one occurrence; stop when no adjacent
  pair is in the table. One-occurrence-at-a-time with the
  (rank, position) ordering reaches the same fixpoint as the
  merge-all-occurrences variant and is exactly replayable as a
  recursive CTE on the oracle side (q172).

Scale design (the part that matters at 100 TB):

- Pre-tokenization (``regexp_extract_all`` on ``RE_TOKEN``),
  explode, and the per-(id, word) counts are all JVM-side,
  codegen-fused, one hash-aggregate shuffle on the word key with
  map-side combine.
- Python only ever sees the DISTINCT pre-tokens — vocabulary-sized
  work, not corpus-sized. ``_encode_vocab_udf`` is an Arrow-batched
  pandas UDF over the distinct-word table with the merge ranks
  shipped once per executor (broadcast variable semantics via
  closure capture — the table is a few thousand rows).
- The encoded vocabulary is broadcast-joined back to the per-doc
  counts (``F.broadcast``) so the corpus-side fact table is never
  re-shuffled; ``n_tokens`` is then a plain sum aggregate.
- Training's only driver-side state is the word-frequency table
  bounded by ``max_words`` (top-K by frequency) — the standard
  production practice (tokenizer training always runs on a bounded
  sample/vocabulary, never the raw corpus).

Reference parity note: the reference engine (main.py) has no
tokenizer; this implements the training-data-pipeline extension
surface mandated for the Spark engine.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import RE_TOKEN

__all__ = [
    "train_merges",
    "encode_word",
    "train_bpe",
    "bpe_token_counts",
    "encode_text",
]


def train_merges(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Driver-side BPE merge-table training over a bounded
    word-frequency table. Deterministic: best pair = max total
    frequency, ties broken by lexicographically smallest (a, b)."""
    vocab = {w: tuple(w) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, freq in word_freqs.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in vocab.items():
            if a not in syms:
                continue
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    return merges


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Greedy BPE apply: merge the (lowest-rank, then leftmost)
    adjacent pair until no pair is in the table. Concatenation of
    the result is always the input word (merges only concatenate),
    so decode is free and lossless."""
    toks = list(word)
    while len(toks) > 1:
        best: tuple[int, int] | None = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or (r, i) < best):
                best = (r, i)
        if best is None:
            break
        i = best[1]
        toks[i : i + 2] = [toks[i] + toks[i + 1]]
    return toks


def _ranks(merges: Iterable[tuple[str, str]]) -> dict:
    return {(a, b): i for i, (a, b) in enumerate(merges)}


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 48,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Distributed word-frequency count (one shuffle, map-side
    combine) + bounded top-K collect + driver-side merge loop.

    The collect is capped at ``max_words`` rows ordered by
    (frequency desc, word asc) — a TakeOrdered, not a full sort —
    which is the industry-standard bounded-vocabulary training
    regime; the corpus itself never reaches the driver."""
    wf = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(RE_TOKEN), F.lit(0)
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    return train_merges({r["w"]: r["c"] for r in wf}, n_merges)


def _encode_vocab(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """words(w) -> (w, toks array<string>, n_toks int) via an
    Arrow-batched pandas UDF. Vocabulary-sized input only."""
    ranks = _ranks(merges)

    @F.pandas_udf("array<string>")
    def enc(s: pd.Series) -> pd.Series:
        return s.map(lambda w: encode_word(w, ranks))

    return words.select(
        "w",
        enc("w").alias("toks"),
    ).withColumn("n_toks", F.size("toks"))


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_broadcast_max: int = 1_000_000,
) -> DataFrame:
    """Per-document real token counts: (id, n_pretoks, n_tokens).

    Corpus-side work is JVM-only: pre-tokenize, explode, one hash
    aggregate on (id, word). Python encodes only the distinct
    words. The join strategy for the encoded vocab is a MEASURED
    choice, not a blind hint (the connected_components_auto rule):
    the vocab is persisted once, counted, and broadcast only when it
    fits (<= ``vocab_broadcast_max`` rows); a web-scale vocabulary
    (typo/unicode long tail can reach 1e8+ distinct pre-tokens)
    falls back to a shuffle join on the word key — the same key the
    per-doc aggregate already partitioned by. Docs with no
    pre-tokens surface as (0, 0), never drop."""
    from ._cache import managed_persist

    pretoks = F.regexp_extract_all(
        F.col(text_col), F.lit(RE_TOKEN), F.lit(0)
    )
    per_doc = (
        df.select(F.col(id_col), F.explode(pretoks).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = managed_persist(
        _encode_vocab(per_doc.select("w").distinct(), merges).select(
            "w", "n_toks"
        ),
        "bpe.vocab",
    )
    small = vocab.count() <= vocab_broadcast_max
    counts = (
        per_doc.join(F.broadcast(vocab) if small else vocab, "w")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_pretoks"),
            F.sum(F.col("c") * F.col("n_toks")).alias("n_tokens"),
        )
    )
    return (
        df.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_pretoks", F.lit(0)).alias("n_pretoks"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        )
    )


def encode_text(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token sequence (id, tokens array<string>) in
    pre-token order — the test/debug surface; counts-only pipelines
    should use :func:`bpe_token_counts` (vocab-sized Python)."""
    pretoks = F.regexp_extract_all(
        F.col(text_col), F.lit(RE_TOKEN), F.lit(0)
    )
    exploded = df.select(
        F.col(id_col),
        F.posexplode_outer(pretoks).alias("pos", "w"),
    )
    vocab = _encode_vocab(
        exploded.where(F.col("w").isNotNull()).select("w").distinct(),
        merges,
    ).select("w", "toks")
    return (
        exploded.join(F.broadcast(vocab), "w", "left")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_compact(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "toks"))
                    ).toks
                )
            ).alias("tokens")
        )
    )
