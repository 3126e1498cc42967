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


RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, "
    "meta struct<mime string, n_bytes int, width int, height int>"
)


def resize(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """Stubbed image resize with real Spark plumbing.

    The decode→resample→encode body is what PIL would do; here the
    payload transform is a deterministic byte resample (stride-sampled
    to the target "pixel count") so schema, batch shape, and metadata
    propagation are fully testable without codecs. One Python call per
    Arrow batch; output payload size is bounded by width*height — the
    property that matters at scale (resize SHRINKS the shuffle, so it
    belongs before any exchange).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out_payload = []
            for b in pdf["payload"]:
                b = bytes(b)
                if len(b) <= target:
                    out_payload.append(b)
                else:
                    stride = len(b) / target
                    out_payload.append(
                        bytes(b[int(i * stride)] for i in range(target))
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out_payload,
                    "meta": [
                        {
                            "mime": m["mime"],
                            "n_bytes": len(p),
                            "width": width,
                            "height": height,
                        }
                        for m, p in zip(pdf["meta"], out_payload)
                    ],
                }
            )

    return binary_df.mapInPandas(fn, RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame binary, n_frame_bytes int"
)


def sample_frames(
    binary_df: DataFrame, frame_bytes: int = 64, every_n: int = 4
) -> DataFrame:
    """Stubbed video frame sampling: one input row → many frame rows.

    Payloads are treated as a sequence of fixed-size fake "frames"
    (ffmpeg would produce real ones); every_n-th frame is emitted.
    Exercises the one-to-many mapInPandas shape (a UDTF analog): the
    output batch length is decoupled from the input batch length, which
    is exactly how distributed frame extraction fans out — downstream
    repartition spreads frames of hot videos across executors.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                n = max(1, (len(b) + frame_bytes - 1) // frame_bytes)
                for i in range(0, n, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_frame_bytes": [len(f) for f in frames],
                }
            )

    return binary_df.mapInPandas(fn, FRAME_SCHEMA)
