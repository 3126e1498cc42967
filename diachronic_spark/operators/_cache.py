"""Bounded caching for per-query persisted intermediates.

Several operators persist a mid-plan relation so a diamond-shaped plan
(self-join, multi-branch reuse, iterative loop) evaluates the expensive
subtree exactly once. Plain ``.persist()`` leaks, though: the query
function returns a lazy DataFrame, so there is no point inside the
function where the cache can be dropped, and a long session running
many queries (the bench loop, a notebook, the driver's t2 sweep)
accumulates one orphaned cache entry per call until storage-memory
pressure evicts them — measurable as GC/eviction noise on later
queries.

``managed_persist(df, key)`` bounds that: each call SITE owns a key,
and persisting a new relation under a key unpersists the previous
holder. Steady-state cache footprint is one live relation per site
regardless of how many times queries run. Dropping a cache is never a
correctness event in Spark — lineage recomputes on demand — so the
only effect of the swap is bounded memory. (Concurrent sessions
sharing a site key would steal each other's cache: perf, not
correctness; the engine's query surface is sequential.)
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}


def managed_persist(
    df: DataFrame,
    key: str,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` under a call-site key, unpersisting the previous
    relation cached for that key.

    If the new plan IS the previous plan (sameResult on the analyzed
    plans — e.g. the same query re-run at the same SF), the existing
    cached relation is returned instead: repeated runs hit the warm
    cache exactly as CacheManager's plan matching would have served
    them, while a genuinely different plan (new SF, new params) evicts
    the stale entry.
    """
    prev = _LIVE.get(key)
    if prev is not None:
        try:
            same = (
                prev._jdf.queryExecution()
                .analyzed()
                .sameResult(df._jdf.queryExecution().analyzed())
            )
        except Exception:
            same = False
        if same:
            return prev
        _LIVE.pop(key, None)
        try:
            prev.unpersist()
        except Exception:
            pass  # session gone / already unpersisted — nothing to free
    out = df.persist(level)
    _LIVE[key] = out
    return out


def release(key: str | None = None) -> None:
    """Drop one managed cache entry (or all of them)."""
    keys = [key] if key is not None else list(_LIVE)
    for k in keys:
        prev = _LIVE.pop(k, None)
        if prev is not None:
            try:
                prev.unpersist()
            except Exception:
                pass
