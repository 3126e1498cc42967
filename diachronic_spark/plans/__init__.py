"""Declared query plans (SURVEY §2.12) and their DuckDB oracle SQL."""

from .queries import QUERIES
from .oracle import ORACLE

__all__ = ["QUERIES", "ORACLE"]
