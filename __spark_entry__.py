"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship multi-way star join (Q3) at sf0.001;
``queries``/``oracle_sql`` expose the full declared set from
SURVEY.md §2.12 plus the LLM-data-pipeline extension operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diachronic_spark.plans import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q3"](spark, "/root/testdata/sf0.001")


# Driver-adjudication ledger (ADVICE r2: explicit sets, not numeric
# tiers). The per-round correctness check caps at ~50 queries taken in
# registry order, so ordering IS the verification scheduler:
#   1. never checked by any round's driver;
#   2. changed since their last green row (stale evidence);
#   3. previously-passed queries, least-recently-adjudicated first —
#      so regressions in old greens rotate back through the cap.
# Update these sets each round from CORRECTNESS_r{N}.json.
_ADJUDICATED_ROUND: dict[str, int] = {
    # round 1 checked q1-q50 (all green)
    **{f"q{i}": 1 for i in range(1, 51)},
    # round 2 checked q51-q95 and q101-q105 (all green)
    **{f"q{i}": 2 for i in range(51, 96)},
    **{f"q{i}": 2 for i in range(101, 106)},
    # round 3 re-checked q1-q36, the stale q21/q45/q50, q96-q100, and
    # the new q106-q112 (all green; CORRECTNESS_r03.json)
    **{f"q{i}": 3 for i in range(1, 37)},
    **{"q45": 3, "q50": 3},
    **{f"q{i}": 3 for i in range(96, 101)},
    **{f"q{i}": 3 for i in range(106, 113)},
    # round 4 checked the ten new q113-q122, the stale q37/q51, and
    # the rotation tail q38-q44/q46-q49/q52-q78 — all green except
    # q115 (type-aware hash: Spark INT vs DuckDB BIGINT, values equal;
    # CORRECTNESS_r04.json). Both sides now cast to bigint.
    **{f"q{i}": 4 for i in range(113, 123)},
    **{"q37": 4, "q51": 4},
    **{f"q{i}": 4 for i in range(38, 45)},
    **{f"q{i}": 4 for i in range(46, 50)},
    **{f"q{i}": 4 for i in range(52, 79)},
}
# Changed since their last driver row (round-5 edits): q115 carries
# r4's RED row (int-width fix on both sides — must re-adjudicate
# first), q117's oracle now folds updates sequentially with null-skip,
# q122's CSV leg pins an explicit nullValue. q112/q113 rerun through
# dedup_against_index/append_to_minhash_index after the arrs-sharing +
# tombstone additions (defaults preserve behavior; local parity green,
# but their r3/r4 rows predate the edit), and q110 goes through
# purchase_attribution_join after the `how` parameter landed (default
# unchanged). The r4-era stale set (q37/q51) got green rows in r4 and
# is retired.
# q26/q52's candidate generation now routes through the extracted
# dedup.rare_shingle_pairs helper (same plan, deduplicated code) —
# their r3/r4 rows predate the refactor.
_STALE = ("q115", "q117", "q122", "q112", "q113", "q110", "q26", "q52")


def _priority_order(keys: list[str]) -> list[str]:
    def qnum(k: str) -> int:
        try:
            return int(k.lstrip("q"))
        except ValueError:
            return 0

    def rank(k: str) -> tuple:
        never = k not in _ADJUDICATED_ROUND
        stale = k in _STALE
        last_round = _ADJUDICATED_ROUND.get(k, 0)
        # never-checked (0) < stale (1) < oldest-green-first (2+round)
        tier = 0 if never else (1 if stale else 2 + last_round)
        return (tier, qnum(k))

    return sorted(keys, key=rank)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: QUERIES[k] for k in _priority_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (q21 reads the committed
    fixtures/wiki_revisions.parquet on both engines)."""
    return {k: ORACLE[k] for k in _priority_order(list(ORACLE))}
