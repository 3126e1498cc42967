"""Custom Python DataSource (Spark 4 DataSource API) for wiki dump
manifests: ``spark.read.format("wiki_manifest")`` over a set of
``dumpstatus.json`` files.

Upgrades manifest handling from driver-side JSON loops
(sources/manifest.py, mirroring the reference's main.py:44-71) to a
first-class scan: one input partition PER MANIFEST, so a thousand
wikis' manifests parse in parallel on executors, and the result is a
DataFrame from the first operator on — the incremental-skip anti-join
(manifest.files_to_run) composes directly.

The reader receives only file paths at plan time; JSON loads at
execute time on executors. No driver-side materialization of file
lists.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

MANIFEST_SCHEMA = (
    "wiki string, file_name string, url string, sha1 string, size bigint"
)


class WikiManifestDataSource(DataSource):
    """Options:
    - ``paths``: comma-separated dumpstatus.json paths (or pass one
      path to ``load``). The wiki name is the parent directory name.
    - ``job``: dump job to list (default ``metahistory7zdump``).
    """

    @classmethod
    def name(cls) -> str:
        return "wiki_manifest"

    def schema(self) -> str:
        return MANIFEST_SCHEMA

    def reader(self, schema) -> "WikiManifestReader":
        return WikiManifestReader(self.options)


class WikiManifestReader(DataSourceReader):
    def __init__(self, options) -> None:
        raw = options.get("paths") or options.get("path") or ""
        self._paths = [p for p in (s.strip() for s in raw.split(",")) if p]
        self._job = options.get("job", "metahistory7zdump")

    def partitions(self):
        # one manifest = one partition: parse parallelism scales with
        # the number of wikis, and a corrupt manifest fails one task
        return [InputPartition(p) for p in self._paths]

    def read(self, partition):
        path = partition.value
        wiki = os.path.basename(os.path.dirname(path)) or path
        with open(path) as f:
            doc = json.load(f)
        files = doc["jobs"][self._job]["files"]
        for fname, meta in sorted(files.items()):
            yield (
                wiki,
                fname,
                meta.get("url"),
                meta.get("sha1"),
                meta.get("size"),
            )


def register(spark) -> None:
    spark.dataSource.register(WikiManifestDataSource)
