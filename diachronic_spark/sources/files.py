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
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


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
