#!/usr/bin/env python
"""10x corpus scaling point for the heavy dedup/ANN family
(VERDICT r5 item 7).

The 3x fact-table point (SCALING_SF03.json) is green, but the
round-5/6 heavy queries — complete PPJoin (q125), containment dedup
(q140), SemDeDup (q141), the curation capstone (q133), the streaming
ingest loop (q136), the z-order layout pass (q124) — are exactly the
shapes whose failure mode is quadratic blow-up in CANDIDATE
GENERATION (prefix-posting fan-out, rare-shingle postings, k-means
cell sizes), which a 3x step can hide. This tool builds a 10x
document/embedding corpus (lineitem too, for q124) and measures the
growth ratio per 10x data.

Corpus realism matters more here than anywhere: verbatim replication
would hand every document 9 exact duplicates and multiply every
shingle's document frequency 10x — candidate fan-out would measure a
pathological corpus, not scale. So each extra documents copy gets a
DISTINCT deterministic pseudo-random word order (tokens sorted by
md5(token || copy_index)): length and vocabulary are preserved, word
trigrams are essentially disjoint across copies, so per-shingle dfs
and the near-dup pair structure stay corpus-like while the corpus
grows 10x. Embedding copies rotate the vector by c positions (norms
preserved, directions spread) with shifted ids.

Methodology: tables cached, one full warmup pass per point (codegen +
JIT), then best-of-2 with managed-persist caches dropped between runs
(end-to-end timing including data-dependent build stages). Flag ratio
13 = linear 10x + scheduling overhead headroom; anything above is
super-linear evidence.

The scaled dir is measurement scratch (never committed, never a
correctness input).

Usage: python tools/scaling_corpus10x.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from diachronic_spark.catalog import TABLES, load  # noqa: E402
from diachronic_spark.plans import QUERIES  # noqa: E402
from diachronic_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/diachronic_scaled_docs10x"
COPIES = 10
FLAG_RATIO = 13.0

# q162 (round 8): exact greedy packing — corpus-bound (documents),
# O(n) tokenize + one narrow (bucket, id, tokens) shuffle + the
# per-bucket jump fold; measured here so the packing family carries
# a 10x point like the dedup family it feeds.
SUBSET = ["q124", "q125", "q133", "q136", "q140", "q141", "q162"]

SHIFTS = {
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
    "lineitem": {"l_orderkey": 10_000_000_000},
}


def build_scaled_dir(spark) -> None:
    if os.path.isdir(SCALED):
        if os.environ.get("SPARK_GRAFT_REUSE_SCALED") == "1":
            # the corpus is deterministic; reuse lets a re-measure run
            # skip the ~5-min rebuild (set to 0/unset for a clean build)
            return
        shutil.rmtree(SCALED)
    os.makedirs(SCALED)
    for t in TABLES:
        dst = os.path.join(SCALED, f"{t}.parquet")
        if t not in SHIFTS:
            os.symlink(os.path.join(BASE, f"{t}.parquet"), dst)
            continue
        base = load(spark, BASE, t)
        parts = []
        for c in range(COPIES):
            df = base
            for col, step in SHIFTS[t].items():
                df = df.withColumn(col, F.col(col) + F.lit(c * step))
            if t == "documents" and c > 0:
                # distinct pseudo-random word order PER DOC PER COPY:
                # sort tokens by md5(token || doc_id || copy). The key
                # MUST include doc_id — keying on (token, copy) alone
                # gives every doc in a copy the same global token
                # ordering, so docs with overlapping vocabulary share
                # sorted-adjacent trigrams and posting-list dfs
                # explode (measured: the PPJoin warmup at 10x ran 11+
                # minutes on 2 straggler tasks before this fix; with
                # per-doc keys the corpus behaves like the base one)
                toks = F.filter(
                    F.split(F.col("text"), r"\s+"), lambda x: x != ""
                )
                keyed = F.transform(
                    toks,
                    lambda x: F.struct(
                        F.md5(
                            F.concat(
                                x,
                                F.lit("#"),
                                F.col("doc_id").cast("string"),
                                F.lit(f"#{c}"),
                            )
                        ).alias("k"),
                        x.alias("t"),
                    ),
                )
                df = df.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.array_sort(keyed), lambda s: s["t"]
                        ),
                        " ",
                    ),
                )
            if t == "embeddings" and c > 0:
                # rotate the vector by c positions: norm-preserving,
                # direction-spreading, zero float arithmetic drift
                df = df.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(F.col("embedding"), c + 1, 64),
                        F.slice(F.col("embedding"), 1, c),
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # multiple row groups so the 10x point parallelizes like a
        # real multi-file table, not the single-row-group cliff
        out.repartition(8).write.mode("overwrite").parquet(dst)


def time_subset(spark, sf_dir: str) -> dict[str, float]:
    from diachronic_spark.operators._cache import release

    cached = [load(spark, sf_dir, t).persist() for t in TABLES]
    for df in cached:
        df.count()
    for q in SUBSET:  # codegen + JIT warmup per plan shape
        QUERIES[q](spark, sf_dir).toPandas()
    timings: dict[str, float] = {}
    for q in SUBSET:
        best = float("inf")
        for _ in range(2):
            release()
            t0 = time.perf_counter()
            QUERIES[q](spark, sf_dir).toPandas()
            best = min(best, time.perf_counter() - t0)
        timings[q] = round(best, 3)
    for df in cached:
        df.unpersist()
    return timings



def fixedk_point(spark) -> dict:
    """The INVERSE reference of rounds 5-6: q141's declared form is
    now the k ∝ n policy (re-based round 7), so the main table's q141
    row measures the scale-safe shape. This measurement-only variant
    pins k=8 at BOTH corpora — the paper-baseline fixed-k form the
    r5/r6 oracle declared — to keep the super-linearity it was
    re-based away from on the record (cells grow 10×, within-cell
    pairs ~100×; r6 measured 16.2× per 10×). Reference only: its
    ratio does not feed flagged_superlinear, because no declared
    query runs this shape anymore."""
    from diachronic_spark.operators._cache import release
    from diachronic_spark.plans.ext_queries import _semdedup_parametrized

    def run(sf_dir: str, k: int, key: str) -> float:
        _semdedup_parametrized(spark, sf_dir, k=k, cache_key=key).toPandas()
        best = float("inf")
        for _ in range(2):
            release()
            t0 = time.perf_counter()
            _semdedup_parametrized(
                spark, sf_dir, k=k, cache_key=key
            ).toPandas()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    base = run(BASE, 8, "semdedup.fixedk8")
    scaled = run(SCALED, 8, "semdedup.fixedk8s")
    ratio = round(scaled / base, 2) if base else None
    return {
        "query": "reference[fixed k=8, undeclared since r7]",
        "sf0.1": base,
        "sf1.0_corpus": scaled,
        "x_1_to_10": ratio,
        "superlinear": ratio is not None and ratio > FLAG_RATIO,
    }


def assignment_point(spark) -> dict:
    """The ASSIGNMENT TERM of declared q141, measured on its own
    (VERDICT r7 item 1 'Done' criterion): fit + assign via the
    hierarchical two-level k-means at the k∝n policy, no pair scan /
    closure. Two-level makes every fit stage O(n·√k) — with k ∝ n
    that is O(n^1.5) arithmetic, the exact-within-declared-policy
    floor for a two-level hierarchy (deeper recursion reaches
    O(n·log n); similarity.kmeans_two_level documents the recursion
    point) — vs the flat form's O(n²/64). This row DOES feed
    flagged_superlinear: it is a declared query's plan component."""
    from diachronic_spark.operators import similarity as S
    from diachronic_spark.operators._cache import release
    from diachronic_spark.plans.ext_queries import _semdedup_k

    def run(sf_dir: str, key: str) -> float:
        aug = S.with_near_duplicate_vectors(
            load(spark, sf_dir, "embeddings")
        )
        k = _semdedup_k(aug.count())

        def once() -> None:
            a, _, _ = S.kmeans_two_level(
                aug, k=k, n_iter=3, vec_col="emb", cache_key=key
            )
            a.count()

        once()  # codegen/JIT warmup for this plan shape
        best = float("inf")
        for _ in range(2):
            release()
            t0 = time.perf_counter()
            once()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    base = run(BASE, "scal.assign.base")
    scaled = run(SCALED, "scal.assign.scaled")
    ratio = round(scaled / base, 2) if base else None
    return {
        "query": "q141.fit[two-level assignment term, declared]",
        "sf0.1": base,
        "sf1.0_corpus": scaled,
        "x_1_to_10": ratio,
        "superlinear": ratio is not None and ratio > FLAG_RATIO,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_DOCS10X.json"
    spark = get_spark("diachronic-spark-scaling-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled_dir(spark)
    t_base = time_subset(spark, BASE)
    t_scaled = time_subset(spark, SCALED)
    assign_row = assignment_point(spark)
    kprop = fixedk_point(spark)
    rows, flagged = [], []
    for q in SUBSET:
        ratio = round(t_scaled[q] / t_base[q], 2) if t_base[q] else None
        if ratio is not None and ratio > FLAG_RATIO:
            flagged.append(q)
        rows.append(
            {
                "query": q,
                "sf0.1": t_base[q],
                "sf1.0_corpus": t_scaled[q],
                "x_1_to_10": ratio,
                "superlinear": ratio is not None and ratio > FLAG_RATIO,
            }
        )
    # the declared assignment term feeds the flag like any declared row
    if assign_row["superlinear"]:
        flagged.append("q141.fit")
    rows.append(assign_row)
    # reference row only — the fixed-k shape is no longer any declared
    # query's plan, so its (expected) super-linearity is context, not
    # a flag on the engine
    rows.append(kprop)
    result = {
        "metric": "scaling_corpus_10x",
        "unit": "sec",
        "data_factor": COPIES,
        "flag_ratio": FLAG_RATIO,
        "flagged_superlinear": flagged,
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"flagged_superlinear": flagged, "queries": rows}))


if __name__ == "__main__":
    main()
