"""Generic file-format sources (SURVEY §2.1 S10-S12): parquet is the
native path (catalog.py); JSON-lines and CSV cover interchange ingest.

Scale rules baked in:
- Explicit schema ALWAYS (no inference pass — schema inference reads
  the data twice and type-drifts across files).
- JSON/CSV are ingest formats, not storage: pipelines convert to
  parquet (columnar, statistics, predicate pushdown) at the first
  materialization; the scan here exists so that conversion is one
  ``read_jsonl(...).write.parquet(...)`` hop.
- ``columnNameOfCorruptRecord`` captures malformed rows instead of
  failing the 10-TB job at record 9,999,999,999 (PERMISSIVE mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
    multiline: bool = False,
    null_value: str | None = None,
) -> DataFrame:
    """CSV scan. Pass ``multiline=True`` when fields may contain
    embedded newlines (quoted multi-line values): without it the
    reader treats every newline as a record separator and PERMISSIVE
    mode silently turns the halves into malformed rows. The cost is
    real — multiline CSV files are not splittable — which is why it is
    opt-in rather than the default.

    ``null_value``: the token that reads back as SQL NULL. Spark's
    default ('' on both write and read) cannot distinguish NULL from
    the empty string once quoteAll is on (a NULL round-trips as ''),
    so writers that must preserve NULLs should pick an unambiguous
    token and pass the same one here."""
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("multiLine", str(multiline).lower())
        .option("mode", "PERMISSIVE")
    )
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    return reader.csv(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """ORC scan — columnar like parquet (stripe statistics, predicate
    pushdown, column pruning all apply), common as an interchange
    format out of Hive/Trino warehouses. Schema optional: ORC embeds
    one, but pass it when the directory mixes writer versions.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    df.write.mode("overwrite").option("compression", compression).orc(path)


_MIME_BY_EXT = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "webp": "image/webp",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "flac": "audio/flac",
    "mp4": "video/mp4",
    "mkv": "video/x-matroska",
    "webm": "video/webm",
    "bin": "application/octet-stream",
}


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Media-file ingestion (S-ext / L5): Spark's ``binaryFile`` source
    scanned into the engine's multimodal storage schema —
    (doc_id, payload, meta struct<mime, n_bytes>), the same shape
    ``multimodal.binarize`` produces from text, so the whole
    ``extract_features`` / resize / frame-sample pipeline runs
    unchanged on real files.

    Scale notes: the source distributes one file per task up to
    ``maxPartitionBytes`` (no driver-side listing loop beyond Hadoop's
    parallel listing); ``glob`` pushes the filename filter into the
    LISTING (pathGlobFilter — files never open), where a post-scan
    filter would read every byte first. doc_id is the xxhash64 of the
    absolute path: stable across re-runs and clusters, collision
    odds ~n²/2^64 (guard with a distinct-count check in pipelines past
    ~10^8 files). The deprecated per-file open cost of tiny files is
    real at 100 TB — compact small media into parquet binary columns
    (write the result of this scan) rather than re-listing millions
    of loose files each run.
    """
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(
        F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1)
    )
    mime = F.coalesce(
        *[
            F.when(ext == e, F.lit(m))
            for e, m in sorted(_MIME_BY_EXT.items())
        ],
        F.lit("application/octet-stream"),
    )
    return raw.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.octet_length("content").alias("n_bytes"),
        ).alias("meta"),
        F.col("path").alias("src_path"),
    )


WARC_RECORD_SCHEMA = (
    "path string, rec_idx int, rec_type string, rec_id string, "
    "target_uri string, http_status int, mime string, "
    "content_len bigint, content_sha string, text string"
)


def read_warc(
    spark: SparkSession, path: str, glob: str = "*.warc*"
) -> DataFrame:
    """WARC (web-archive) ingestion — the FIRST stage of a web-corpus
    curation pipeline: one row per WARC record, with the declared
    text-extraction policy applied to HTTP responses (media type
    text/* or application/json → UTF-8 body, errors replaced; other
    payloads keep only the integrity facts). The parse is
    ``functions/warc.py`` (pure stdlib, loud on malformation) inside
    an Arrow ``mapInPandas`` batch.

    Scale notes: gzip WARCs are not splittable, so the parallelism
    unit is the FILE — exactly how the format is deployed (Common
    Crawl ships ~1 GB segments precisely so file-level parallelism
    saturates a cluster); one task per file up to maxPartitionBytes,
    record walk O(bytes), per-task memory bounded by one file.
    Downstream record-level work should repartition after this scan
    (the fan-out is map-side; hot files spread on the next
    exchange). The text policy runs HERE, map-side, so the shuffle
    that follows carries extracted text, not raw archives.
    """
    import hashlib
    from typing import Iterator

    import pandas as pd

    from ..functions import warc as W

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "path", "rec_idx", "rec_type", "rec_id", "target_uri",
            "http_status", "mime", "content_len", "content_sha",
            "text",
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            for p, blob in zip(pdf["path"], pdf["content"]):
                for idx, rec in enumerate(W.parse_warc(bytes(blob))):
                    status, mime, text = None, None, None
                    if rec.rec_type == "response":
                        resp = W.http_response(rec.content)
                        status = resp.status
                        mime = W.mime_of(
                            resp.headers.get("content-type")
                        )
                        if mime is not None and (
                            mime.startswith("text/")
                            or mime == "application/json"
                        ):
                            text = resp.body.decode("utf-8", "replace")
                    out["path"].append(p)
                    out["rec_idx"].append(idx)
                    out["rec_type"].append(rec.rec_type)
                    out["rec_id"].append(
                        rec.headers.get("warc-record-id")
                    )
                    out["target_uri"].append(
                        rec.headers.get("warc-target-uri")
                    )
                    out["http_status"].append(status)
                    out["mime"].append(mime)
                    out["content_len"].append(len(rec.content))
                    out["content_sha"].append(
                        hashlib.sha256(rec.content).hexdigest()
                    )
                    out["text"].append(text)
            yield pd.DataFrame(out)

    return raw.mapInPandas(fn, WARC_RECORD_SCHEMA)


# extensions the declared ZIP text policy decodes (UTF-8, errors
# replaced) — ENGINE-side; the truth fixture imports it from here
TEXT_EXTS = (".txt", ".csv", ".jsonl", ".json", ".md")

ZIP_ENTRY_SCHEMA = (
    "path string, entry_idx int, name string, method string, "
    "n_bytes bigint, content_sha string, text string"
)

# every compression method stdlib zipfile can actually read (ADVICE
# r8: bzip2/lzma members were mislabeled 'stored'); anything else is
# outside the declared scope and raises loudly rather than mislabel
import zipfile  # noqa: E402  (module-level: the map keys need it)

_ZIP_METHODS = {
    zipfile.ZIP_STORED: "stored",
    zipfile.ZIP_DEFLATED: "deflate",
    zipfile.ZIP_BZIP2: "bzip2",
    zipfile.ZIP_LZMA: "lzma",
}


def _zip_method_err(info: "zipfile.ZipInfo") -> str:
    raise ValueError(
        f"zip member {info.filename!r}: unsupported compress_type "
        f"{info.compress_type} (supported: stored/deflate/bzip2/lzma)"
    )


def read_zip_entries(
    spark: SparkSession, path: str, glob: str = "*.zip"
) -> DataFrame:
    """ZIP dataset-archive ingestion: one row per archive member with
    integrity facts (CRC-verified size + sha) and the declared text
    policy (members named .txt/.csv/.jsonl/.json/.md — case-
    insensitive — decode as UTF-8, errors replaced). Dataset mirrors
    overwhelmingly ship as zipped CSV/JSONL shards; this scan is the
    one hop between "a directory of zips" and relational rows.

    Extraction is stdlib ``zipfile`` (zlib is the container's vetted
    DEFLATE — the gzip/WARC precedent); a CRC mismatch or truncated
    central directory raises loudly rather than yielding silent
    garbage. Scale shape: like WARC, the archive is the parallelism
    unit (central-directory formats are not splittable) — one task
    per file, per-task memory bounded by the largest member;
    downstream work repartitions after the scan, and the text policy
    runs map-side so post-scan shuffles carry rows, not archives.
    """
    import hashlib
    import io
    import zipfile
    from typing import Iterator

    import pandas as pd

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "path", "entry_idx", "name", "method", "n_bytes",
            "content_sha", "text",
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            for p, blob in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
                    for idx, info in enumerate(zf.infolist()):
                        data = zf.read(info)  # CRC-checked by stdlib
                        out["path"].append(p)
                        out["entry_idx"].append(idx)
                        out["name"].append(info.filename)
                        out["method"].append(
                            _ZIP_METHODS.get(info.compress_type)
                            or _zip_method_err(info)
                        )
                        out["n_bytes"].append(len(data))
                        out["content_sha"].append(
                            hashlib.sha256(data).hexdigest()
                        )
                        out["text"].append(
                            data.decode("utf-8", "replace")
                            if info.filename.lower().endswith(TEXT_EXTS)
                            else None
                        )
            yield pd.DataFrame(out)

    return raw.mapInPandas(fn, ZIP_ENTRY_SCHEMA)


WDS_SAMPLE_SCHEMA = (
    "path string, sample_idx int, key string, n_members int, "
    "cls int, caption string, width int, height int, channels int, "
    "pix_sha string"
)


class WdsError(ValueError):
    """Loud rejection for malformed WebDataset shards."""


def read_webdataset(
    spark: SparkSession, path: str, glob: str = "*.tar*"
) -> DataFrame:
    """WebDataset tar-shard ingestion — the de-facto multimodal
    training-shard format (ImageNet/LAION-scale corpora ship as tar
    archives of ``key.ext`` members). One row per SAMPLE: members
    sharing a key are grouped by the format's rules — the key is the
    member path up to the FIRST dot of the basename (so multi-part
    extensions like ``k.depth.npy`` group under ``k``), and a
    sample's members must be stored ADJACENTLY (the property that
    makes tar streaming work; a key recurring non-adjacently is a
    malformed shard and raises).

    Typed member policy, applied map-side: ``png``/``jpg`` decode
    through the signature-routed image engine (the row carries the
    decoded geometry + pixel sha — extract AND decode are
    adjudicated together); ``cls`` parses as int; ``txt`` is the
    UTF-8 caption; other members count toward ``n_members`` only.
    Samples lacking an image or a cls member raise (the declared
    contract of a labeled-image shard). Missing-member rows surface
    as NULL caption, never as silent drops.

    Scale shape: like WARC/ZIP, the shard is the parallelism unit —
    which is WHY the ecosystem shards corpora into many ~1 GB tars;
    one task per shard, O(bytes) walk, per-task memory bounded by
    one member, decode map-side so post-scan shuffles carry features
    not archives.
    """
    import hashlib
    import io
    import tarfile
    from typing import Iterator

    import pandas as pd

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.multimodal import decode as img_decode

        cols = (
            "path", "sample_idx", "key", "n_members", "cls",
            "caption", "width", "height", "channels", "pix_sha",
        )

        def emit(out, p, idx, key, members):
            img = next(
                (d for e, d in members if e in ("png", "jpg", "jpeg")),
                None,
            )
            cls_raw = next((d for e, d in members if e == "cls"), None)
            if img is None or cls_raw is None:
                raise WdsError(
                    f"sample {key!r} lacks an image or cls member "
                    f"(has {[e for e, _ in members]})"
                )
            w, h, c, pix = img_decode(img)
            cap = next((d for e, d in members if e == "txt"), None)
            out["path"].append(p)
            out["sample_idx"].append(idx)
            out["key"].append(key)
            out["n_members"].append(len(members))
            out["cls"].append(int(cls_raw.decode("ascii").strip()))
            out["caption"].append(
                cap.decode("utf-8", "replace") if cap is not None else None
            )
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(c)
            out["pix_sha"].append(hashlib.sha256(pix).hexdigest())

        for pdf in batches:
            out = {k: [] for k in cols}
            for p, blob in zip(pdf["path"], pdf["content"]):
                blob = bytes(blob)
                try:
                    tf = tarfile.open(
                        fileobj=io.BytesIO(blob), mode="r:*"
                    )
                except tarfile.TarError as e:
                    raise WdsError(f"bad tar shard {p}: {e}") from None
                cur_key, members = None, []
                seen: set = set()
                idx = 0
                with tf:
                    for ti in tf:
                        if not ti.isfile():
                            continue
                        d, _, base = ti.name.rpartition("/")
                        dot = base.find(".")
                        if dot <= 0:
                            raise WdsError(
                                f"member {ti.name!r} has no extension"
                            )
                        key = (d + "/" if d else "") + base[:dot]
                        ext = base[dot + 1 :].lower()
                        if key != cur_key:
                            if cur_key is not None:
                                emit(out, p, idx, cur_key, members)
                                idx += 1
                            if key in seen:
                                raise WdsError(
                                    f"sample {key!r} recurs "
                                    "non-adjacently — malformed shard"
                                )
                            seen.add(key)
                            cur_key, members = key, []
                        members.append(
                            (ext, tf.extractfile(ti).read())
                        )
                    if cur_key is not None:
                        emit(out, p, idx, cur_key, members)
            yield pd.DataFrame(out)

    return raw.mapInPandas(fn, WDS_SAMPLE_SCHEMA)


PDF_PAGE_SCHEMA = (
    "path string, page_idx int, n_pages int, text string, "
    "n_chars bigint"
)


def read_pdf_pages(
    spark: SparkSession, path: str, glob: str = "*.pdf"
) -> DataFrame:
    """PDF text extraction: one row per page with the declared text
    layer (``functions/pdf.py`` — recovery-mode object scan + ObjStm
    expansion, Flate/LZW/ASCIIHex/ASCII85 filters, Tj/'/\"/TJ layout
    policy, Latin-1 simple fonts + ToUnicode CID fonts; encryption
    and unsupported filters loud). After HTML, PDF is the web
    corpus's main document format — this scan is the documents-table
    feeder for it.

    Scale shape: like the archive sources, the FILE is the
    parallelism unit; one task per PDF, per-task memory bounded by
    one document's streams, extraction map-side so post-scan
    shuffles carry text rows, never documents.
    """
    from typing import Iterator

    import pandas as pd

    from ..functions import pdf as PDF

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("path", "page_idx", "n_pages", "text", "n_chars")
        for pdf in batches:
            out = {k: [] for k in cols}
            for p, blob in zip(pdf["path"], pdf["content"]):
                pages = PDF.extract_text(bytes(blob))
                for idx, text in enumerate(pages):
                    out["path"].append(p)
                    out["page_idx"].append(idx)
                    out["n_pages"].append(len(pages))
                    out["text"].append(text)
                    out["n_chars"].append(len(text))
            yield pd.DataFrame(out)

    return raw.mapInPandas(fn, PDF_PAGE_SCHEMA)


TOKEN_SHARD_SCHEMA = (
    "shard string, key string, bucket int, pack_id bigint, "
    "n_docs bigint, pack_tokens bigint, tokens array<string>"
)


def write_wds_token_shards(
    packs: DataFrame, out_dir: str
) -> None:
    """TOKEN-shard twin of the q184 parquet sink (VERDICT r9 item 2's
    'or WDS tar' alternative): each pack becomes one WebDataset
    sample — ``{bucket:04d}-{pack_id:08d}.txt`` holding the token
    stream newline-joined (byte-level BPE symbols are printable and
    whitespace-free BY CONSTRUCTION — Ġ/Ċ replace space/newline — so
    the join is unambiguous) and ``.json`` holding the
    {n_docs, pack_tokens} metadata; one tar per BUCKET (the same
    sharding unit as the parquet twin; a data loader consumes one
    tar per worker), members adjacent in pack_id order — exactly the
    layout ``read_webdataset``'s adjacency law expects.

    Scale shape: one ``applyInPandas`` task per bucket assembles and
    writes its tar — the token payload is already grouped per pack,
    so the write adds ONE narrow (bucket) shuffle and each task's
    memory is bounded by its shard. Executor-side file writes, like
    any file sink (object-store/shared-FS path on a cluster).
    """
    import io
    import json as _json
    import os
    import tarfile

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pack_id", ignore_index=True)
        bucket = int(pdf["bucket"].iloc[0])
        name = f"tokens-{bucket:04d}.tar"
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for _, row in pdf.iterrows():
                key = f"{bucket:04d}-{int(row['pack_id']):08d}"
                txt = "\n".join(row["tokens"]).encode("utf-8")
                meta = _json.dumps(
                    {
                        "n_docs": int(row["n_docs"]),
                        "pack_tokens": int(row["pack_tokens"]),
                    }
                ).encode("ascii")
                for ext, data in (("txt", txt), ("json", meta)):
                    ti = tarfile.TarInfo(f"{key}.{ext}")
                    ti.size = len(data)
                    ti.mtime = 0  # deterministic shard bytes
                    tf.addfile(ti, io.BytesIO(data))
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(buf.getvalue())
        return pd.DataFrame({"shard": [name], "n_samples": [len(pdf)]})

    (
        packs.repartition("bucket")
        .groupBy("bucket")
        .applyInPandas(write_shard, "shard string, n_samples bigint")
        .collect()  # shard-count-sized action drives the write
    )


def read_wds_token_shards(
    spark: SparkSession, path: str, glob: str = "*.tar*"
) -> DataFrame:
    """Re-read :func:`write_wds_token_shards` output: one row per
    sample with the token stream and its metadata, the sample
    grouping/adjacency law shared with :func:`read_webdataset`.
    Token-mass is VERIFIED at scan time: a sample whose txt stream
    disagrees with its json pack_tokens raises (a corrupt shard
    must be loud, never silently mis-budgeted training data)."""
    import io
    import json as _json
    import tarfile
    from typing import Iterator

    import pandas as pd

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "shard", "key", "bucket", "pack_id", "n_docs",
            "pack_tokens", "tokens",
        )

        def emit(out, p, key, members):
            exts = dict(members)
            if "txt" not in exts or "json" not in exts:
                raise WdsError(
                    f"token sample {key!r} lacks txt or json member "
                    f"(has {[e for e, _ in members]})"
                )
            toks = (
                exts["txt"].decode("utf-8").split("\n")
                if exts["txt"]
                else []
            )
            meta = _json.loads(exts["json"].decode("ascii"))
            if len(toks) != meta["pack_tokens"]:
                raise WdsError(
                    f"token sample {key!r}: stream carries "
                    f"{len(toks)} tokens, metadata claims "
                    f"{meta['pack_tokens']} — corrupt shard"
                )
            b, _, pid = key.rpartition("-")
            out["shard"].append(p)
            out["key"].append(key)
            out["bucket"].append(int(b))
            out["pack_id"].append(int(pid))
            out["n_docs"].append(int(meta["n_docs"]))
            out["pack_tokens"].append(int(meta["pack_tokens"]))
            out["tokens"].append(toks)

        for pdf in batches:
            out = {k: [] for k in cols}
            for p, blob in zip(pdf["path"], pdf["content"]):
                try:
                    tf = tarfile.open(
                        fileobj=io.BytesIO(bytes(blob)), mode="r:*"
                    )
                except tarfile.TarError as e:
                    raise WdsError(f"bad tar shard {p}: {e}") from None
                cur_key, members = None, []
                seen: set = set()
                with tf:
                    for ti in tf:
                        if not ti.isfile():
                            continue
                        d, _, base = ti.name.rpartition("/")
                        dot = base.find(".")
                        if dot <= 0:
                            raise WdsError(
                                f"member {ti.name!r} has no extension"
                            )
                        key = (d + "/" if d else "") + base[:dot]
                        ext = base[dot + 1 :].lower()
                        if key != cur_key:
                            if cur_key is not None:
                                emit(out, p, cur_key, members)
                            if key in seen:
                                raise WdsError(
                                    f"sample {key!r} recurs "
                                    "non-adjacently — malformed shard"
                                )
                            seen.add(key)
                            cur_key, members = key, []
                        members.append(
                            (ext, tf.extractfile(ti).read())
                        )
                    if cur_key is not None:
                        emit(out, p, cur_key, members)
            yield pd.DataFrame(out)

    return raw.mapInPandas(fn, TOKEN_SHARD_SCHEMA)
