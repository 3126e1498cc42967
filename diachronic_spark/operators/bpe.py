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
- BYTE LEVEL (VERDICT r9 item 1): with ``byte_level=True`` the seed
  sequence is the word's UTF-8 bytes under the GPT-2 byte↔unicode
  printable table (:func:`bytes_to_unicode`) instead of its chars —
  ANY input is tokenizable from a 256-symbol base vocab and
  decode∘encode = id holds for arbitrary unicode (hypothesis-pinned;
  char-level cannot satisfy it). Same trainer, same fold, same
  vocab-sized-Python architecture; q183 adjudicates it with the
  byte seed replayed in DuckDB from hex(encode(w)).

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
    "RE_TOKEN_UNI",
    "bytes_to_unicode",
    "byte_repr",
    "decode_tokens",
    "write_packed_shards",
    "build_packed_shards",
]

# Unicode pre-tokenizer for the BYTE-LEVEL pipeline: letter runs,
# number runs, single other-non-space — the \\p{L}/\\p{N} classes are
# implemented identically by Java regex (Spark) and RE2 (DuckDB),
# parity-tested on CJK/Greek/Cyrillic/emoji in tests/test_bpe.py.
# (RE_TOKEN, the ASCII variant, stays the char-level q172 currency.)
RE_TOKEN_UNI = r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte↔unicode table (public algorithm, Radford et
    al. 2019): the 188 printable latin-1 bytes map to themselves,
    the 68 others (controls, space, DEL, 0xA0, 0xAD) to U+0100+n in
    byte order — every byte gets a PRINTABLE single-char symbol, so
    merge tables over these symbols serialize/compare as plain
    strings and ANY input is tokenizable from a 256-symbol base
    vocab. The DuckDB oracle derives the same table from the same
    published rule in pure SQL (no shared mapping artifact)."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    table = {b: chr(b) for b in printable}
    n = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + n)
            n += 1
    return table


BYTE_TO_UNICODE = bytes_to_unicode()
UNICODE_TO_BYTE = {c: b for b, c in BYTE_TO_UNICODE.items()}


def byte_repr(word: str) -> str:
    """UTF-8 bytes of ``word`` as their printable byte-symbols — the
    byte-level seed sequence (one symbol per byte; multi-byte chars
    span symbols, which is exactly what lets merges cross them)."""
    return "".join(BYTE_TO_UNICODE[b] for b in word.encode("utf-8"))


def decode_tokens(tokens: Iterable[str]) -> str:
    """Inverse of byte-level encode: concatenate, map symbols back
    to bytes, UTF-8 decode. Total on anything ``byte_repr`` produced
    (merges only concatenate), which is the round-trip law char-level
    BPE cannot satisfy — hypothesis-pinned for arbitrary unicode."""
    return bytes(
        UNICODE_TO_BYTE[c] for c in "".join(tokens)
    ).decode("utf-8")


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
    byte_level: bool = False,
    pretoken_re: str = RE_TOKEN,
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
                    F.col(text_col), F.lit(pretoken_re), F.lit(0)
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    freqs = {
        (byte_repr(r["w"]) if byte_level else r["w"]): r["c"]
        for r in wf
    }
    return train_merges(freqs, n_merges)


def _encode_vocab(
    words: DataFrame,
    merges: list[tuple[str, str]],
    byte_level: bool = False,
) -> DataFrame:
    """words(w) -> (w, toks array<string>, n_toks int) via an
    Arrow-batched pandas UDF. Vocabulary-sized input only. With
    ``byte_level`` the seed sequence is the word's byte symbols
    (:func:`byte_repr`) instead of its characters — same fold."""
    ranks = _ranks(merges)

    if byte_level:
        def _enc1(w: str) -> list[str]:
            return encode_word(byte_repr(w), ranks)
    else:
        def _enc1(w: str) -> list[str]:
            return encode_word(w, ranks)

    @F.pandas_udf("array<string>")
    def enc(s: pd.Series) -> pd.Series:
        return s.map(_enc1)

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
    byte_level: bool = False,
    pretoken_re: str = RE_TOKEN,
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
        F.col(text_col), F.lit(pretoken_re), F.lit(0)
    )
    per_doc = (
        df.select(F.col(id_col), F.explode(pretoks).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = managed_persist(
        _encode_vocab(
            per_doc.select("w").distinct(), merges, byte_level
        ).select("w", "n_toks"),
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
    byte_level: bool = False,
    pretoken_re: str = RE_TOKEN,
) -> DataFrame:
    """Per-document token sequence (id, tokens array<string>) in
    pre-token order — the shard-sink/test surface; counts-only
    pipelines should use :func:`bpe_token_counts` (vocab-sized
    Python)."""
    pretoks = F.regexp_extract_all(
        F.col(text_col), F.lit(pretoken_re), F.lit(0)
    )
    exploded = df.select(
        F.col(id_col),
        F.posexplode_outer(pretoks).alias("pos", "w"),
    )
    vocab = _encode_vocab(
        exploded.where(F.col("w").isNotNull()).select("w").distinct(),
        merges,
        byte_level,
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


def write_packed_shards(
    df: DataFrame,
    merges: list[tuple[str, str]],
    out_path: str,
    bin_tokens: int = 2048,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    byte_level: bool = False,
    pretoken_re: str = RE_TOKEN,
    max_records_per_file: int = 100_000,
) -> None:
    """The packed TRAINING-SHARD sink (VERDICT r9 item 2) — the last
    mile the pipeline was missing: q162/q175/q178 computed pack
    assignments but never materialized the training artifact. One row
    per pack at rest: (pack_id, n_docs, pack_tokens,
    tokens array<string>) under ``bucket=<k>/`` partitions — the
    layout a trainer's data loader shards by (reference's sink role:
    main.py:177-191; the parquet mechanics are q121's
    ``write_snapshots``).

    Token order is the pack's training order: docs ascend by id (the
    fold order inside a bucket), tokens within a doc in pre-token
    position order — so concatenating a shard row replays the exact
    sequence the budget was charged for, and (byte-level) decodes
    back to the concatenated source text.

    Scale shape: the token payload crosses exactly ONE
    corpus-scale shuffle — ``encode_text``'s (id, pos)-collect —
    after which the doc→pack join carries the already-grouped arrays
    on the same id key and the (bucket, pack_id) aggregate is
    pack-count-sized; the assignment side shuffles only
    (bucket, id, n_tokens). Python stays vocabulary-sized (the
    encode UDF sees distinct pre-tokens, never documents).
    """
    from ..pipeline import PipelineConfig, write_snapshots

    packs = build_packed_shards(
        df, merges,
        bin_tokens=bin_tokens, n_buckets=n_buckets,
        id_col=id_col, text_col=text_col,
        byte_level=byte_level, pretoken_re=pretoken_re,
    )
    write_snapshots(
        packs,
        out_path,
        PipelineConfig(
            partition_by=("bucket",),
            max_records_per_file=max_records_per_file,
        ),
    )


def build_packed_shards(
    df: DataFrame,
    merges: list[tuple[str, str]],
    bin_tokens: int = 2048,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    byte_level: bool = False,
    pretoken_re: str = RE_TOKEN,
) -> DataFrame:
    """The shard relation :func:`write_packed_shards` materializes —
    exposed separately so tests can audit the PLAN (exchange keys,
    Arrow-only Python) without paying the write."""
    from .text import pack_sequences_greedy

    toks = encode_text(
        df, merges, id_col=id_col, text_col=text_col,
        byte_level=byte_level, pretoken_re=pretoken_re,
    )
    counts = toks.select(
        F.col(id_col),
        F.size("tokens").cast("bigint").alias("n_tokens"),
    )
    assigned = pack_sequences_greedy(
        counts,
        bin_tokens=bin_tokens,
        n_buckets=n_buckets,
        id_col=id_col,
        tokens_col="n_tokens",
        return_assignments=True,
    )
    return (
        toks.join(assigned.withColumnRenamed("doc_id", id_col), id_col)
        .groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col), "tokens"))
                ).tokens
            ).alias("tokens"),
        )
    )
