"""Wiki revision-history XML ingestion (SURVEY §2.1 S4/S5).

The reference pipes ``7z e -so`` into a SAX iterparse loop
(/root/reference/main.py:172-175) one process per dump file. The Spark
form distributes the same work two ways:

1. ``read_pages_xml``: Spark's built-in XML source (rowTag="page") —
   declarative, whole files split across executors, columns pruned at
   the scan. Preferred when dumps are in a Spark-readable codec
   (bz2/zstd/plain; Wikimedia also publishes .bz2 dumps).

2. ``parse_dump_files``: a work-queue DataFrame of file paths fanned
   out via ``mapInPandas`` — each task streams one file through an
   incremental XML parse (same lxml-style event loop, constant
   memory). This is the path for codecs Spark can't read (7z): the
   task shells out to ``7z e -so`` exactly like the reference when the
   binary exists; plain/bz2/gz fall back to Python codecs so the
   pipeline is testable in this container (no p7zip here).

Both yield the flat revision schema (page_id, rev_seq, namespace,
title, timestamp, text) feeding operators.snapshot.daily_snapshot.
"""

from __future__ import annotations

import bz2
import datetime as dt
import gzip
import io
import shutil
import subprocess
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import WIKI_REVISIONS

# MediaWiki export namespace (reference diachronic/conf.yml:6).
MEDIAWIKI_NS = "http://www.mediawiki.org/xml/export-0.10/"

REVISION_SQL_SCHEMA = (
    "page_id bigint, rev_seq int, namespace string, title string, "
    "timestamp timestamp, text string"
)


PAGE_XML_SCHEMA = (
    "title string, ns string, id long, "
    "revision array<struct<id: long, timestamp: string, text: string>>"
)


def read_pages_xml(spark: SparkSession, path: str) -> DataFrame:
    """Declarative XML scan: one row per <page>, revisions exploded in
    document order (posexplode preserves it — required because the
    snapshot dedup is order-sensitive, SURVEY §1.2).

    Explicit schema (timestamps kept as strings and parsed with the
    reference's exact format, main.py:153) — never infer at scale.
    """
    pages = (
        spark.read.format("xml")
        .option("rowTag", "page")
        .schema(PAGE_XML_SCHEMA)
        .load(path)
    )
    rev = F.posexplode("revision").alias("rev_seq", "rev")
    exploded = pages.select(
        F.col("id").cast("long").alias("page_id"),
        F.col("ns").cast("string").alias("namespace"),
        F.col("title").cast("string").alias("title"),
        rev,
    )
    return exploded.select(
        "page_id",
        F.col("rev_seq").cast("int"),
        "namespace",
        "title",
        # reference main.py:153: strip trailing Z, parse seconds
        F.to_timestamp(
            F.regexp_replace(F.col("rev.timestamp").cast("string"), "Z$", ""),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("timestamp"),
        F.col("rev.text").cast("string").alias("text"),
    )


def _open_stream(path: str):
    """Decompressed byte stream for one dump file.

    7z: external binary piped exactly like the reference (main.py:173)
    when installed (the fast C path); otherwise the pure-stdlib
    container reader (sources/sevenzip.py — lzma/bz2 codecs, streaming,
    CRC-verified), so the path is executable on binary-less executors.
    bz2/gz: Python codecs; anything else: raw bytes.
    """
    if path.endswith(".7z"):
        if shutil.which("7z") is None:
            from .sevenzip import open_7z_stream

            return open_7z_stream(path)
        proc = subprocess.Popen(["7z", "e", "-so", path], stdout=subprocess.PIPE)
        return proc.stdout
    if path.endswith(".bz2"):
        return bz2.open(path, "rb")
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return io.open(path, "rb")


def iterparse_revisions(stream) -> Iterator[tuple]:
    """Incremental end-tag event loop over one dump stream.

    Mirrors the reference's dispatch (main.py:135-161) but emits EVERY
    revision row flat (page_id, rev_seq, ns, title, ts, text) — the
    filter/dedup lives downstream in the declarative snapshot operator,
    where Catalyst can push predicates and fuse.
    Uses stdlib ElementTree iterparse (lxml-compatible API) with
    element.clear() for O(page) memory, like main.py:161,170.
    """
    import xml.etree.ElementTree as ET

    ns = f"{{{MEDIAWIKI_NS}}}"
    page_id = 0
    rev_seq = 0
    title = None
    namespace = None
    pid = None
    for _, elem in ET.iterparse(stream, events=("end",)):
        tag = elem.tag.removeprefix(ns)
        if tag == "title":
            title = elem.text
        elif tag == "ns":
            namespace = elem.text
        elif tag == "id" and pid is None:
            pid = int(elem.text) if elem.text else None
        elif tag == "revision":
            ts_el = elem.find(f"{ns}timestamp")
            tx_el = elem.find(f"{ns}text")
            ts = None
            if ts_el is not None and ts_el.text:
                ts = dt.datetime.strptime(ts_el.text[:-1], "%Y-%m-%dT%H:%M:%S")
            yield (
                pid if pid is not None else page_id,
                rev_seq,
                namespace,
                title,
                ts,
                tx_el.text if tx_el is not None else None,
            )
            rev_seq += 1
            elem.clear()
        elif tag == "page":
            page_id += 1
            rev_seq = 0
            title = None
            namespace = None
            pid = None
            elem.clear()


PARSE_STATUS_SCHEMA = REVISION_SQL_SCHEMA + ", src_path string, error string"

_REV_COLS = ["page_id", "rev_seq", "namespace", "title", "timestamp", "text"]


def parse_dump_files_with_status(
    spark: SparkSession, paths: list[str]
) -> DataFrame:
    """Fault-tolerant distributed dump parse.

    The reference wraps each file in try/except and logs failures
    without killing the run (main.py:84-94, 103) — at dump scale SOME
    file is always truncated. The relational form of that failure log:
    every output row carries (src_path, error); a failed file
    contributes exactly one row with error set and null revision
    fields. Split with ``split_parse_failures``. One file = one task,
    streaming decompress → iterparse → Arrow batches.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                try:
                    rows = list(iterparse_revisions(_open_stream(path)))
                except Exception as e:  # the reference's per-file net
                    yield pd.DataFrame(
                        [[None] * len(_REV_COLS) + [path, f"{type(e).__name__}: {e}"]],
                        columns=_REV_COLS + ["src_path", "error"],
                    )
                    continue
                if rows:
                    out = pd.DataFrame(rows, columns=_REV_COLS)
                    out["src_path"] = path
                    out["error"] = None
                    yield out

    from ..operators._cache import local_relation

    files = local_relation(
        spark, [(p,) for p in paths], "path string"
    ).repartition(max(len(paths), 1), "path")
    return files.mapInPandas(fn, PARSE_STATUS_SCHEMA)


def split_parse_failures(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(revisions, failures) from the with-status parse output."""
    revisions = parsed.filter(F.col("error").isNull()).select(*_REV_COLS)
    failures = (
        parsed.filter(F.col("error").isNotNull()).select("src_path", "error")
    )
    return revisions, failures


def parse_dump_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Strict distributed dump parse: any unreadable file fails the job
    (use parse_dump_files_with_status for the reference's log-and-
    continue behavior)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                stream = _open_stream(path)
                rows = list(iterparse_revisions(stream))
                if rows:
                    yield pd.DataFrame(rows, columns=_REV_COLS)

    from ..operators._cache import local_relation

    files = local_relation(
        spark, [(p,) for p in paths], "path string"
    ).repartition(max(len(paths), 1), "path")
    return files.mapInPandas(fn, REVISION_SQL_SCHEMA)
