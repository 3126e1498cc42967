"""MERGE / upsert: apply a keyed change-set (insert/update/delete) to a
dimension table — the SCD1 counterpart of lifecycle.scd2_compress.

The reference never mutates data (append-only parquet snapshots,
/root/reference/main.py:177-184), but its incremental skip
(main.py:56-71) is exactly the "don't redo what exists" half of a
MERGE; this operator supplies the general form every warehouse-style
pipeline needs (Delta/Iceberg MERGE INTO semantics, expressed with
vanilla DataFrame ops so it works on plain parquet).

Documented divergence from SQL MERGE: a null source value in an
updatable column means "leave the target column alone" (COALESCE),
whereas ``MERGE ... WHEN MATCHED THEN UPDATE SET c = s.c`` overwrites
with NULL. Callers cannot null-out a column through this operator; a
change-set that needs explicit null-outs must model them as a sentinel
in the payload (or extend the op vocabulary), not as NULL.

Scale: one full-outer shuffle join on the key — both sides hash-
partition once, no driver-side state. A full outer join can't
broadcast even a tiny change-set (unmatched target rows must
survive), so at 100 TB the change-set and target co-partition on the
key; with a bucketed target (operators/layout.py) the exchange on the
target side disappears entirely. AQE handles the skew/coalesce.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OP_UPDATE, OP_INSERT, OP_DELETE = "U", "I", "D"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply ``source`` (rows carry ``op_col`` in {'U','I','D'}) to
    ``target`` keyed by ``key``.

    - 'D': the matching target row is dropped.
    - 'U': the matching target row survives with each ``update_cols``
      value replaced by the source value when it is non-null (null
      source value = "leave this column alone"). An unmatched 'U' is
      a no-op — MERGE's WHEN MATCHED clauses never fire for absent
      keys, so no phantom row is inserted.
    - 'I': the source row is appended when its key is absent; an 'I'
      on an existing key leaves the target row unchanged (WHEN NOT
      MATCHED only fires for absent keys).
    - target rows with no source match pass through unchanged.

    Deterministic given unique keys per side (enforce upstream; this
    is MERGE's own precondition — multiple source rows per key is a
    cardinality violation in every MERGE dialect).
    """
    t, s = target.alias("__t"), source.alias("__s")
    j = t.join(s, F.col(f"__t.{key}") == F.col(f"__s.{key}"), "full_outer")
    op = F.col(f"__s.{op_col}")
    matched = F.col(f"__t.{key}").isNotNull()
    keep = (
        (op.isNull() | (op != F.lit(OP_DELETE)))
        # WHEN MATCHED clauses never fire for absent keys: an
        # unmatched 'U' (or 'D') is a no-op, not a phantom insert
        & ~((op == F.lit(OP_UPDATE)) & ~matched)
    )
    # clause applicability, per MERGE semantics
    applies = ((op == F.lit(OP_UPDATE)) & matched) | (
        (op == F.lit(OP_INSERT)) & ~matched
    )

    out: list[Column] = []
    source_cols = set(source.columns)
    for c in target.columns:
        tc = F.col(f"__t.{c}")
        if c == key:
            out.append(F.coalesce(tc, F.col(f"__s.{key}")).alias(c))
        elif c in source_cols and c in set(update_cols):
            sc = F.col(f"__s.{c}")
            out.append(
                F.when(applies, F.coalesce(sc, tc)).otherwise(tc).alias(c)
            )
        elif c in source_cols:
            # not updatable: target value wins, source fills inserts
            out.append(F.coalesce(tc, F.col(f"__s.{c}")).alias(c))
        else:
            out.append(tc.alias(c))
    return j.filter(keep).select(*out)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """CDC between two snapshots of a keyed table: one full-outer
    shuffle join emitting (key, change_type) with change_type in
    {'added','removed','changed'} (unchanged rows are dropped —
    at 100 TB the diff is small, the snapshots are not).

    ``snapshot_diff(t, merge_upsert(t, src, ...), key, cols)``
    recovers the effective change-set of the merge — the round-trip
    invariant q87 pins against the oracle.

    Comparison is null-safe per column (NULL == NULL); restrict
    ``compare_cols`` to the business payload so metadata-only noise
    (load timestamps etc.) doesn't read as churn.
    """
    o, n = old.alias("__o"), new.alias("__n")
    j = o.join(n, F.col(f"__o.{key}") == F.col(f"__n.{key}"), "full_outer")
    ok, nk = F.col(f"__o.{key}"), F.col(f"__n.{key}")
    differs = None
    for c in compare_cols:
        d = ~F.col(f"__o.{c}").eqNullSafe(F.col(f"__n.{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(ok.isNull(), F.lit("added"))
        .when(nk.isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.select(
            F.coalesce(ok, nk).alias(key), change.alias("change_type")
        )
        .filter(F.col("change_type").isNotNull())
    )
