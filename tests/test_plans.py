"""Physical-plan regression tests (SURVEY §4.3): the scale properties
the queries claim must be visible in the executed plan — predicate
pushdown, column pruning, broadcast of dims, no nested-loop joins where
a banded equi-join is intended. Guards against silent plan regressions
that small-data correctness tests would never catch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diachronic_spark.catalog import load
from diachronic_spark.plans import QUERIES


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_pushes_status_filter_to_scan(spark, sf_dir):
    import re

    p = plan_str(QUERIES["q5"](spark, sf_dir))
    assert re.search(
        r"PushedFilters: \[[^\]]*EqualTo\(o_orderstatus,O\)", p
    ), "status filter must reach the orders parquet scan"


def test_q1_scan_prunes_columns(spark, sf_dir):
    p = plan_str(QUERIES["q1"](spark, sf_dir))
    # lineitem has 11 columns; q1 needs 6 — the scan schema must not
    # include the unused ones
    scan = p[p.index("ReadSchema"):]
    assert "l_partkey" not in scan[:400]
    assert "l_shipdate" not in scan[:400]


def test_q3_broadcasts_dimensions(spark, sf_dir):
    p = plan_str(QUERIES["q3"](spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_q22_banded_join_is_not_nested_loop(spark, sf_dir):
    p = plan_str(QUERIES["q22"](spark, sf_dir))
    assert "NestedLoop" not in p, "theta join must run as banded equi-join"


def test_q4_anti_and_q5_semi_join_types(spark, sf_dir):
    assert "LeftAnti" in plan_str(QUERIES["q4"](spark, sf_dir))
    assert "LeftSemi" in plan_str(QUERIES["q5"](spark, sf_dir))


def test_q19_broadcasts_query_vector(spark, sf_dir):
    p = plan_str(QUERIES["q19"](spark, sf_dir))
    assert "Broadcast" in p
    # top-k must be TakeOrdered, never a global sort of the corpus
    assert "TakeOrderedAndProject" in p


def test_no_rowatatime_python_udfs_anywhere(spark, sf_dir):
    """Python only via Arrow (mapInPandas etc.) — BatchEvalPython (the
    pickling row-at-a-time UDF operator) must never appear."""
    for name, fn in QUERIES.items():
        p = plan_str(fn(spark, sf_dir))
        assert "BatchEvalPython" not in p, name


def test_q37_lsh_join_has_no_cartesian(spark, sf_dir):
    """The all-pairs search must stay an equi-join on (band, bucket) —
    a CartesianProduct/NestedLoop would mean the LSH blocking silently
    degenerated into brute force."""
    p = plan_str(QUERIES["q37"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p


def test_srp_lsh_recall_equals_brute_force(spark, sf_dir):
    """LSH candidates + exact verify must find every pair brute force
    finds at the query threshold (the property that justifies the
    brute-force SQL oracle for q37)."""
    from pyspark.sql import functions as F

    from diachronic_spark.catalog import load
    from diachronic_spark.functions import cosine_similarity
    from diachronic_spark.operators import similarity as S

    aug = S.with_near_duplicate_vectors(load(spark, sf_dir, "embeddings"))
    lsh = {
        (r.vec_a, r.vec_b)
        for r in S.cosine_near_dup_pairs(aug, threshold=0.99).collect()
    }
    a = aug.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    b = aug.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    brute = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(cosine_similarity("ea", "eb") >= 0.99)
        .collect()
    }
    assert lsh == brute


def test_srp_signature_bits_match_numpy(spark, sf_dir):
    """The JVM-side (small-plane) SRP path computes the same sign bits
    as the vectorized matmul path uses — the two implementations are
    interchangeable per plane count."""
    import numpy as np

    from diachronic_spark.catalog import load
    from diachronic_spark.operators import similarity as S

    aug = S.with_near_duplicate_vectors(
        load(spark, sf_dir, "embeddings").limit(40)
    )
    rows = S.srp_signature(aug, "emb", n_planes=8, dim=64).collect()
    P = np.array(S._srp_planes(8, 64))
    for r in rows:
        want = ((np.array(r.emb) @ P.T) >= 0).astype(int).tolist()
        assert [r[f"b{i}"] for i in range(8)] == want


def test_hash_split_is_shuffle_free(spark, sf_dir):
    """Reproducible split assignment must stay a pure projection —
    an Exchange would mean split membership costs a corpus shuffle."""
    from diachronic_spark.catalog import load
    from diachronic_spark.operators.text import hash_split

    p = plan_str(hash_split(load(spark, sf_dir, "documents")))
    assert "Exchange" not in p


def test_q46_contamination_probe_is_broadcast(spark, sf_dir):
    """The benchmark shingle set must reach the corpus as a broadcast,
    never as a shuffled join of the corpus side."""
    p = plan_str(QUERIES["q46"](spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime row-level filtering: when the build side of a shuffled
    join carries a selective filter, Spark injects a bloom_filter_agg
    on it and a might_contain predicate on the probe-side SCAN — rows
    of the 100 TB fact side that can't join die before the exchange.
    Thresholds are production-scale (10 GB probe side), so the test
    lowers them; the assertion is that the rewrite fires at all.
    """
    saved = {
        k: spark.conf.get(k, None)
        for k in [
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        orders = (
            load(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey")
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        p = plan_str(j)
        assert "might_contain" in p and "bloom_filter_agg" in p
        # the filter sits on the probe side BELOW the join's exchange
        assert p.index("might_contain") > p.index("SortMergeJoin")
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q78_weighted_sample_is_shuffle_free_topk(spark, sf_dir):
    p = plan_str(QUERIES["q78"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p, "top-k must be TakeOrdered"
    assert "Exchange hashpartitioning" not in p, (
        "A-ES scoring+selection must not shuffle"
    )


def test_q80_cms_probe_is_broadcast(spark, sf_dir):
    p = plan_str(QUERIES["q80"](spark, sf_dir))
    assert "BroadcastHashJoin" in p, "the d*w cell grid must broadcast"


def test_q84_blocked_join_no_nested_loop(spark, sf_dir):
    p = plan_str(QUERIES["q84"](spark, sf_dir))
    assert "NestedLoop" not in p and "CartesianProduct" not in p, (
        "equality blocking must plan as a hash/merge join"
    )


def test_q86_audit_scans_prune_to_single_columns(spark, sf_dir):
    p = plan_str(QUERIES["q86"](spark, sf_dir))
    # each range check must scan exactly its one column, not lineitem's
    # full 11-column schema
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert any(s.strip() == "l_quantity:double" for s in schemas), schemas


def test_q91_exists_decorrelates_to_semi_join(spark, sf_dir):
    p = plan_str(QUERIES["q91"](spark, sf_dir))
    assert "LeftSemi" in p, "EXISTS must decorrelate to a semi join"
    assert "NestedLoop" not in p


def test_q98_not_exists_decorrelates_to_anti_join(spark, sf_dir):
    p = plan_str(QUERIES["q98"](spark, sf_dir))
    assert "LeftAnti" in p, "NOT EXISTS must decorrelate to an anti join"


def test_q95_correlated_scalar_subquery_decorrelates(spark, sf_dir):
    """The per-partkey avg subquery must rewrite to a grouped aggregate
    joined on l_partkey — one extra lineitem pass — never a per-row
    nested-loop re-execution (PLANS.md q95)."""
    p = plan_str(QUERIES["q95"](spark, sf_dir))
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "partial_avg(l_quantity" in p, (
        "decorrelated form computes avg(l_quantity) as a map-side "
        "partial aggregate"
    )


def test_q97_disjunctive_predicates_push_to_both_scans(spark, sf_dir):
    """The three-brand OR mixes part and lineitem columns, but each
    side's disjunct-local projection must still reach its parquet scan:
    the l_quantity range union on lineitem, the brand/size union on
    part (PLANS.md q97)."""
    p = plan_str(QUERIES["q97"](spark, sf_dir))
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)", p)
    assert any("Or(" in s and "l_quantity" in s for s in pushed), pushed
    assert any("Or(" in s and "p_brand" in s for s in pushed), pushed


def test_adjudication_ledger_consistent_with_registry():
    """The driver's 50-query cap makes registry order the verification
    scheduler — keep the ledger honest: every ledger/stale id must be a
    real query, stale ids must sit ahead of the rotation tail, and
    never-checked queries must lead."""
    import __spark_entry__ as E
    from diachronic_spark.plans import ORACLE, QUERIES

    assert set(E._ADJUDICATED_ROUND) <= set(QUERIES), (
        "ledger references unknown queries"
    )
    assert set(E._STALE) <= set(E._ADJUDICATED_ROUND), (
        "stale queries must have a prior driver row"
    )
    order = list(E.queries())
    never = [k for k in order if k not in E._ADJUDICATED_ROUND]
    n_never = len(never)
    assert order[:n_never] == never, "never-checked queries must lead"
    assert order[n_never:n_never + len(E._STALE)] == sorted(
        E._STALE, key=lambda k: int(k.lstrip("q"))
    ), "stale queries come right after never-checked"
    # the two registries expose the same ordering and key sets
    assert list(E.oracle_sql()) == [k for k in order if k in ORACLE]


def test_q108_merge_asof_cogroups_on_bucket_not_key(spark, sf_dir):
    """The cogrouped merge-asof must shuffle each side once on the HASH
    BUCKET (bounded Python invocations), never nested-loop, and never
    cogroup on the raw key (PLANS.md q108 / SCALE.md r3 findings)."""
    p = plan_str(QUERIES["q108"](spark, sf_dir))
    assert "FlatMapCoGroupsInPandas [__bkt" in p, (
        "cogroup key must be the hash bucket"
    )
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert p.count("Exchange hashpartitioning(__bkt") == 2, (
        "each side shuffles exactly once, on the bucket"
    )


def test_q109_dump_parse_is_one_task_per_file(spark, sf_dir):
    """The imperative 7z path fans files out via MapInPandas over a
    path work-queue; the snapshot dedup is the only hash shuffle."""
    p = plan_str(QUERIES["q109"](spark, sf_dir))
    assert "MapInPandas" in p
    assert "BatchEvalPython" not in p


def test_q125_ppjoin_candidate_join_is_equi(spark, sf_dir):
    """The complete similarity join must stay an equi-join on the
    prefix shingle hash — NestedLoop/Cartesian would mean prefix
    filtering degenerated into all-pairs."""
    p = plan_str(QUERIES["q125"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p


def test_q127_triangle_joins_are_equi(spark, sf_dir):
    p = plan_str(QUERIES["q127"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p


def test_count_star_scan_reads_zero_columns(spark, sf_dir):
    """count(*) must prune the scan to ZERO columns (ReadSchema
    struct<>) — at 100 TB the difference between a footer-bounded
    count and a full-table read."""
    df = load(spark, sf_dir, "lineitem").groupBy().count()
    p = plan_str(df)
    assert "ReadSchema: struct<>" in p


def test_q140_containment_join_has_no_cartesian(spark, sf_dir):
    """Containment candidates must come from the rare-shingle posting
    expansion + equi-joins — Cartesian/NestedLoop would mean the
    blocking degenerated into all-pairs."""
    p = plan_str(QUERIES["q140"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p


def test_q139_tombstone_exclusion_is_broadcast_anti_join(spark, sf_dir):
    """Retraction must not reshuffle the index: the tombstone set is
    KB-scale vs the band table, so its exclusion has to plan as a
    broadcast LeftAnti on the index read."""
    from diachronic_spark.operators import dedup as D
    from diachronic_spark.plans.ext_queries import (
        _q139_batch,
        _tombstoned_index,
    )

    df = D.dedup_against_index(
        spark,
        _q139_batch(spark, sf_dir),
        _tombstoned_index(spark, sf_dir),
        threshold=0.5,
    )
    p = plan_str(df)
    assert "LeftAnti" in p, "tombstones must exclude via anti-join"
    import re

    assert re.search(r"BroadcastHashJoin .*LeftAnti", p), (
        "tombstone anti-join must be broadcast, not shuffled"
    )


def test_q133_has_no_single_partition_window(spark, sf_dir):
    """The admission cumsum is the two-phase distributed prefix sum
    (VERDICT r5 item 2) — a global Window.orderBy would show up as an
    Exchange SinglePartition over all cluster keepers, the last
    driver-adjacent bottleneck shape the repo had. Pin its absence
    anywhere in q133's executed plan."""
    p = plan_str(QUERIES["q133"](spark, sf_dir))
    assert "SinglePartition" not in p


def test_q148_bucketed_join_has_no_join_exchange(spark, sf_dir):
    """The bucketed co-located join must read both sides Bucketed: true
    and shuffle NEITHER join side — the only hash exchange in the query
    belongs to the aggregation above the join. (Broadcast disabled so
    the small-SF dim can't sidestep the property under test.)"""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = QUERIES["q148"](spark, sf_dir)
        df.collect()
        p = plan_str(df)
        assert p.count("Bucketed: true") >= 2
        assert "SortMergeJoin" in p
        # no exchange keyed on either join column anywhere in the plan
        assert "Exchange hashpartitioning(l_orderkey" not in p
        assert "Exchange hashpartitioning(o_orderkey" not in p
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_q190_dsir_scoring_has_no_doc_keyed_shuffle(spark, sf_dir):
    """DSIR's per-document scoring is a pure projection against the
    LLR array literal: the plan may shuffle for the tiny bucket-count
    agg and the final top-k, but never exchange on a doc key, join,
    or fall back to a row UDF."""
    p = plan_str(QUERIES["q190"](spark, sf_dir))
    assert "Join" not in p, "LLR lookup must be an array literal, not a join"
    assert "BatchEvalPython" not in p
    assert "TakeOrderedAndProject" in p, "top-k must not global-sort"


def test_q191_paragraph_dedup_is_two_exchanges(spark, sf_dir):
    """CCNet paragraph dedup = exactly the paragraph-hash window
    shuffle plus the doc-key reassembly shuffle."""
    p = plan_str(QUERIES["q191"](spark, sf_dir))
    # AQE wraps exchanges; count the shuffle origins
    n_exchanges = p.count("Exchange hashpartitioning")
    assert n_exchanges <= 3, f"expected hash window + regroup, got:\n{p}"
    assert "SinglePartition" not in p
    assert "NestedLoop" not in p


def test_q192_link_extraction_is_expression_only(spark, sf_dir):
    """Anchor extraction/resolution/canonicalization must stay
    JVM-side; PageRank's edge aggregation is the first shuffle.
    The only Python in the plan is the WARC scan's Arrow batch."""
    p = plan_str(QUERIES["q192"](spark, sf_dir))
    assert "BatchEvalPython" not in p, "row-at-a-time Python in plan"
    assert p.count("MapInPandas") <= 1, "only the WARC parse is Python"
    assert "CartesianProduct" not in p


def test_q194_classifier_gradient_agg_is_partial(spark, sf_dir):
    """Each GD iteration's gradient aggregation must map-side combine
    (partial_sum before the exchange) — the property that keeps
    iterations scan-shaped at 100 TB."""
    from diachronic_spark.operators.classifier import (
        _featurize, _hard_sigmoid, _margin,
    )
    from diachronic_spark.sources.classifier_fixture import DOCS

    docs = spark.createDataFrame(
        DOCS, "doc_id bigint, text string, label int"
    )
    feat = _featurize(docs, F.col("label") == 1, "text", 16)
    err = F.col("y") - _hard_sigmoid(_margin([0.0] * 17))
    agg = feat.select(
        F.sum(
            F.floor(F.element_at("x", 1) * err * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
        ).alias("s1")
    )
    p = plan_str(agg)
    assert "partial_sum" in p, "gradient sums must map-side combine"
    assert "BatchEvalPython" not in p


def test_q199_span_removal_no_token_explode_join(spark, sf_dir):
    """ExactSubstr removal reassembles via a per-doc covered-set array
    and an indexed array filter — the plan must carry no anti-join (the
    token-grain rewrite this replaced), no Python, and no nested loop;
    the final doc join stays an equi-join."""
    p = plan_str(QUERIES["q199"](spark, sf_dir))
    assert "BatchEvalPython" not in p
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "LeftAnti" not in p, "token-grain anti-join crept back in"


def test_q200_bm25_broadcasts_query_and_stats(spark, sf_dir):
    """BM25 scoring touches only the query-term tf rows: the <=3-row
    query-term table and the 1-row (N, avgdl) stats must arrive as
    broadcasts, the top-k must be a TakeOrdered (never a global sort),
    and nothing falls back to Python."""
    p = plan_str(QUERIES["q200"](spark, sf_dir))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p


def test_q201_hard_negatives_two_phase_no_single_partition(spark, sf_dir):
    """The per-anchor top-k must run as the salted two-phase window
    (phase 1 keyed by (anchor, salt)) — never collapse the corpus onto
    n_anchors partitions or a single partition; anchors arrive
    broadcast."""
    p = plan_str(QUERIES["q201"](spark, sf_dir))
    assert "Exchange SinglePartition" not in p
    assert p.count("Window") >= 2, "two-phase top-k collapsed to one window"
    assert "__salt" in p, "phase-1 salt key missing from the plan"
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_q203_margin_pairs_built_once_and_broadcast(spark, sf_dir):
    """The candidate pair relation feeds the numerator and BOTH
    neighborhood windows — it must come from the persisted cache
    (InMemoryTableScan), the smaller side must broadcast, and nothing
    drops to Python."""
    p = plan_str(QUERIES["q203"](spark, sf_dir))
    assert "InMemoryTableScan" in p, "pair relation recomputed per branch"
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p
    assert "TakeOrderedAndProject" in p


def test_q204_auc_cumulative_is_two_phase_and_aggs_partial(spark, sf_dir):
    """The margin-grain cumulative must ride the two-phase prefix sum
    (range partition + pid window), never a global ORDER BY window —
    and every global aggregate must map-side combine (partial_sum
    before its exchange), so the only SinglePartition exchanges are
    1-row agg finalizes."""
    p = plan_str(QUERIES["q204"](spark, sf_dir))
    assert "rangepartitioning(m" in p, "prefix sum lost its range phase"
    assert "partial_sum" in p, "global aggs must map-side combine"
    # no WINDOW runs on a single partition (agg finalizes may)
    import re
    for m in re.finditer(r"Window .{0,400}", p):
        assert "SinglePartition" not in m.group(0)
    assert "BatchEvalPython" not in p


def test_q205_eval_bands_broadcast_no_cartesian(spark, sf_dir):
    """Fuzzy decontamination must probe the training bands with a
    BROADCAST of the eval-suite bands (an eval suite is KBs at any
    corpus scale) and never degenerate to a cartesian/nested loop."""
    p = plan_str(QUERIES["q205"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "BatchEvalPython" not in p
