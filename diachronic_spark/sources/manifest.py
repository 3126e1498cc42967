"""Dump-manifest source + incremental skip (SURVEY §2.1 S1-S3, §2.3 J1).

The reference fetches ``dumpstatus.json`` per wiki, extracts the
metahistory7zdump file list, and skips files whose parquet output
already exists in the bucket — an anti-join done as an O(n·m) Python
list comprehension (/root/reference/main.py:44-71).

Spark form: both sides become DataFrames and the skip is a left-anti
join (broadcast-hash for the small side, chosen by the planner).
Manifest fetch stays driver-side (one tiny HTTP GET per wiki — not
worth a task); at scale the *download* of the dump files themselves is
the distributed stage (wiki_xml.parse_dump_files handles local paths;
pair it with a fetch task when sources are remote).
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def manifest_files(
    manifest_json: str, job: str = "metahistory7zdump"
) -> list[str]:
    """File names from one dumpstatus.json document (main.py:51-53)."""
    doc = json.loads(manifest_json)
    return list(doc["jobs"][job]["files"].keys())


def files_df(spark: SparkSession, wikis_manifests: dict[str, str]) -> DataFrame:
    """Union of per-wiki manifest file lists (main.py:46-53 / SO1)."""
    rows = [
        (wiki, fname)
        for wiki, mjson in wikis_manifests.items()
        for fname in manifest_files(mjson)
    ]
    from ..operators._cache import local_relation

    return local_relation(spark, rows, "wiki string, file_name string")


def files_to_run(
    candidates: DataFrame,
    done_outputs: DataFrame,
    output_suffix: str = ".parquet",
) -> DataFrame:
    """Incremental anti-join: manifest files minus already-produced
    outputs (main.py:60-71). ``done_outputs`` has column ``blob_name``
    (e.g. an object-store listing); a candidate is done when
    file_name + suffix matches a blob (main.py:67-68 / P7)."""
    expected = candidates.withColumn(
        "expected_blob", F.concat(F.col("file_name"), F.lit(output_suffix))
    )
    return expected.join(
        done_outputs,
        expected.expected_blob == done_outputs.blob_name,
        "left_anti",
    ).drop("expected_blob")
