"""Final-sort presentation helper (r10 optimization pass).

Every declared query returns a fully-ordered relation; most end in
``.orderBy(keys)``, which plans ``Exchange rangepartitioning`` — and a
range exchange pays a partition-boundary SAMPLING job plus a full
shuffle on EVERY execution (guide §2.4: "an orderBy used only to make
output deterministic" is a removable exchange). For a final relation
that is provably bounded — enum-keyed aggregates (nation, brand,
event_type, lang, status...), config-bounded probe/top-k sets,
KB-scale fixture policies — that machinery orders a handful of rows:
measured at the bench floor, the tail costs ~2 extra Spark jobs and
~0.15-0.2 s per run on local[32].

``sort_small`` swaps that tail for ``coalesce(1)`` + a partition-local
sort: no exchange, no sampling job, one task sorting KBs. Catalyst's
EliminateSorts guarantees no redundant global sort survives below it.

Scale contract: apply ONLY where the sorted relation stays small at
ANY scale factor because its cardinality is bounded by a key domain or
configuration, not by the data volume. Row-scaled finals (per-document,
per-user, per-order outputs) KEEP the parallel range sort — a single
sort task over a data-scaled relation would be a straggler at 100 TB.
Each call site states its bound. The ordering produced is identical to
the replaced ``orderBy`` (same keys, same null ordering); only the
physical tail changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sort_small(df: DataFrame, *cols) -> DataFrame:
    """Total-order a BOUNDED final relation without a range exchange.

    ``coalesce(1)`` is a narrow dependency (no shuffle): the one result
    task reads the (already tiny) last-stage output and sorts it
    locally. See module docstring for the smallness contract.
    """
    return df.coalesce(1).sortWithinPartitions(*cols)
