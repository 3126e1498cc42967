"""Declared query plans (SURVEY §2.12 + §2.11 extensions) and their
DuckDB oracle SQL."""

from .ext_oracle import EXT_ORACLE
from .ext_queries import EXT_QUERIES
from .oracle import ORACLE
from .queries import QUERIES
from .streaming_queries import STREAM_ORACLE, STREAM_QUERIES

QUERIES = {**QUERIES, **EXT_QUERIES, **STREAM_QUERIES}
ORACLE = {**ORACLE, **EXT_ORACLE, **STREAM_ORACLE}

__all__ = ["QUERIES", "ORACLE"]
