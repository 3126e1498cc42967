"""diachronic_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(droher/diachronic, see /root/reference/main.py) as a Spark-first
engine: declarative DataFrame plans, Catalyst/Tungsten execution,
plus the LLM-data-pipeline operator suite (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB scale.

Package layout:
  session    — SparkSession factory with scale-tuned defaults
  schemas    — explicit StructTypes for every table (no inference at scale)
  catalog    — parquet table loaders / temp-view registration
  functions  — expression-level helpers (vector math, text, hashing)
  operators  — composed operators (snapshot dedup, joins, dedup, similarity)
  sources    — wiki XML ingestion, manifest anti-join incremental source
  plans      — the declared query set (SURVEY.md §2.12) + oracle SQL
  streaming  — Structured Streaming forms of the stateful operators
"""

__version__ = "0.1.0"
