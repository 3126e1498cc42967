"""Incremental aggregate maintenance: algebraic-aggregate partials
that merge without rescanning history.

The reference's whole pipeline is incremental at the FILE level (skip
dump files whose output exists, /root/reference/main.py:56-71); this
operator family is the same idea at the AGGREGATE level: keep a
compact per-key state (count + sums + min/max — the algebraic
aggregates), fold each new batch into it, and answer queries from the
state alone. avg/ratios are derived at read time, never stored
(storing avg breaks mergeability). Sketch-backed versions of the
non-algebraic aggregates live in operators/sketches.py (count-min),
q60 (HLL distinct), q64 (KLL quantiles).

Scale: each batch aggregates map-side to one row per key before the
shuffle; the merge is a union + re-agg over state-sized (not
raw-sized) inputs. This is exactly how a 100 TB daily-rollup table
stays maintainable: O(keys) state, O(batch) work per day.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(
    df: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Partial state: per-key count + per-measure sum/min/max."""
    aggs = [F.count(F.lit(1)).alias("state_n")]
    for m in measures:
        aggs += [
            F.sum(m).alias(f"sum_{m}"),
            F.min(m).alias(f"min_{m}"),
            F.max(m).alias(f"max_{m}"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    states: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Merge partial states: sum the counts/sums, min/max the bounds."""
    it = iter(states)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    aggs = []
    for c in u.columns:
        if c in keys:
            continue
        if c == "state_n" or c.startswith("sum_"):
            aggs.append(F.sum(c).alias(c))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        else:  # non-mergeable column snuck into the state
            raise ValueError(f"non-algebraic state column: {c}")
    return u.groupBy(*keys).agg(*aggs)
