"""Physical-layout operators: the scale property IS the test — a
bucketed join must show no Exchange in its physical plan, and a salted
join must return exactly what the plain join returns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diachronic_spark.catalog import load
from diachronic_spark.operators.layout import (
    compact,
    bucketed_join,
    salted_join,
    write_bucketed,
)


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(
        orders, "b_orders", str(tmp_path / "b_orders"), "o_custkey", 8
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_li", str(tmp_path / "b_li"), "o_orderkey", 8,
    )
    # bucket-key aggregation: no exchange either
    agg = spark.table("b_orders").groupBy("o_custkey").count()
    assert "Exchange" not in plan_str(agg)

    write_bucketed(
        orders, "b_orders2", str(tmp_path / "b_orders2"), "o_orderkey", 8
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, "b_orders2", "b_li", "o_orderkey")
        p = plan_str(j)
        assert "Exchange" not in p, "bucketed join must be shuffle-free"
        assert "SortMergeJoin" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # and it is still a correct join
    expected = orders.join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    ).count()
    assert j.count() == expected


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    salted = salted_join(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey", n_salts=7,
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, v string"
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y")], "k int, w string")
    out = salted_join(left, right, "k", how="left", n_salts=4)
    rows = sorted(map(tuple, out.collect()))
    assert rows == [
        (1, "a", "X"), (1, "b", "X"), (2, "c", "Y"), (3, "d", None)
    ]


def test_compact_merges_small_files_preserving_rows(spark, sf_dir, tmp_path):
    li = load(spark, sf_dir, "lineitem")
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compacted")
    li.repartition(64).write.parquet(src)
    n_in = len(spark.read.parquet(src).inputFiles())
    assert n_in >= 32
    n_out = compact(spark, src, dst, target_file_mb=64)
    assert n_out < n_in
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert sorted(a.columns) == sorted(b.columns)
    # integer sum: order-independent (float sums differ in last ulp
    # across partition layouts)
    assert (
        a.select(F.sum("l_orderkey")).first()[0]
        == b.select(F.sum("l_orderkey")).first()[0]
    )


def test_compact_range_layout_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    li = load(spark, sf_dir, "lineitem")
    src, dst = str(tmp_path / "frag2"), str(tmp_path / "ranged")
    li.repartition(16).write.parquet(src)
    # tiny target forces >1 output file so disjointness is non-vacuous
    compact(spark, src, dst, target_file_mb=0.05, range_by="l_orderkey")
    spans = sorted(
        (r["lo"], r["hi"])
        for r in spark.read.parquet(dst)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
        .collect()
    )
    assert len(spans) > 1
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        # range partitioning: every key lives in exactly one file, so
        # consecutive file ranges cannot interleave
        assert hi_prev <= lo_next


def test_ivf_store_prunes_partitions_and_matches_full_scan(spark, sf_dir, tmp_path):
    from diachronic_spark.catalog import load
    from diachronic_spark.operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    # quantizer = the label cells (deterministic, no fit needed here)
    assign = emb.select("vec_id", F.col("label").alias("cell"))
    cents = (
        emb.groupBy(F.col("label").alias("cell"))
        .agg(F.array(*[F.round(F.avg(F.col("embedding")[i]), 6)
                       for i in range(64)]).alias("c"))
    )
    path = str(tmp_path / "ivf_store")
    S.write_ivf_store(emb.select("vec_id", "embedding"), assign, path)

    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 7).select("embedding").first()[0]]
    got = S.ivf_store_topk(spark, path, cents, qv, k=5, n_probe=2)

    # 1) plan-level: the scan must carry a PartitionFilters entry on
    # cell — the probe semi-join became metadata pruning
    plan = plan_str(got)
    assert "PartitionFilters" in plan and "cell" in plan

    # 2) the probe is selective: more cells exist than are probed
    n_cells = assign.select("cell").distinct().count()
    assert n_cells > 2  # otherwise the test proves nothing

    # 3) results equal the unpartitioned probe over the same cells
    from diachronic_spark.functions import cosine_similarity
    q = F.array(*[F.lit(x) for x in qv])
    probe_cells = [r["cell"] for r in
                   cents.select("cell",
                                cosine_similarity(F.col("c"), q).alias("s"))
                   .orderBy(F.desc("s"), F.asc("cell")).limit(2).collect()]
    want = (
        emb.join(assign, "vec_id")
        .filter(F.col("cell").isin(probe_cells))
        .select("vec_id",
                F.round(cosine_similarity(F.col("embedding"), q), 4)
                .alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(5)
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_zorder_layout_skips_files_on_either_dimension(spark, tmp_path):
    from diachronic_spark.operators.layout import zorder_layout

    # 64x64 uniform grid: the adversarial case for a linear sort (no
    # correlation between dimensions).
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    zorder_layout(grid, ["x", "y"], n_files=16, bits=4).write.parquet(zpath)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        lpath
    )

    def files_hit(path, col, lo, hi):
        bbox = (
            spark.read.parquet(path)
            .groupBy(F.col("_metadata.file_name").alias("f"))
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        )
        return bbox.filter(
            (F.col("hi") >= lo) & (F.col("lo") <= hi)
        ).count()

    # rows preserved, 16 real files
    z = spark.read.parquet(zpath)
    assert z.count() == 64 * 64
    assert z.select("_metadata.file_name").distinct().count() == 16
    # a thin y-band intersects EVERY linear file but only a corner of
    # the z-order files; a thin x-band still prunes under z-order.
    assert files_hit(lpath, "y", 0, 3) == 16
    assert files_hit(zpath, "y", 0, 3) <= 8
    assert files_hit(zpath, "x", 0, 3) <= 8
    # z-order prunes on BOTH dimensions; linear only on its sort key.
    both = files_hit(zpath, "x", 0, 3) + files_hit(zpath, "y", 0, 3)
    linear = files_hit(lpath, "x", 0, 3) + files_hit(lpath, "y", 0, 3)
    assert both < linear
