"""Multimodal column plumbing (SURVEY §2.11 L5).

Media payloads are opaque ``binary`` columns plus a typed metadata
struct; transforms run as Arrow-batched Pandas iterators via
``mapInPandas`` — the pattern for decode / feature-extract / resize at
scale (batch-columnar transfer, no per-row Python crossings).

The actual image/audio codecs are NOT in this container, so ``decode``
is stubbed: ``extract_features`` computes deterministic byte-level
features (length, sha256, fake dimensions) with the real Spark-side
plumbing — schema, batching, partitioning — fully exercised and
oracle-checked; swap ``_fake_decode`` for PIL/ffmpeg bindings in a
real deployment.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, sha_hex string, width int, height int"
)


def decode(blob: bytes) -> object:
    """Real media decode — unavailable in this environment."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not installed in this container; "
        "extract_features uses _fake_decode for deterministic tests"
    )


def _fake_decode(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image dimension extraction."""
    n = len(blob)
    return (n % 640) + 1, ((n * 7) % 480) + 1


def binarize(documents: DataFrame) -> DataFrame:
    """Treat each document's text as an opaque UTF-8 payload with typed
    metadata — the storage schema for multimodal corpora: (id, bytes,
    struct<mime, n_bytes>)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers each partition as pandas batches; one Python call
    per batch (not per row). Output schema is fixed/typed so the driver
    and downstream joins see a stable relational shape.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["payload"]
            dims = [ _fake_decode(b) for b in blobs ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(b) for b in blobs],
                    "sha_hex": [hashlib.sha256(b).hexdigest() for b in blobs],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return binary_df.mapInPandas(fn, FEATURE_SCHEMA)
