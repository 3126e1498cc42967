#!/usr/bin/env python
"""Scaling ladders for the round-10 curation operators (q190-q197's
engines): DSIR scoring, CCNet paragraph dedup, and classifier-
training iterations, each at 1x / 10x / 100x synthetic corpus size.

Emits SCALING_CURATION.json. Methodology matches the other scaling
artifacts: min-of-2 wall per point, loadavg stamped, superlinear
flag at ratio > 13x per 10x step (per-query floors amortize, so a
linear operator reads well under the flag).

Usage: python tools/scaling_curation.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from diachronic_spark.session import get_spark  # noqa: E402

BASE_DOCS = 480  # 1x corpus size; 100x = 48k multi-paragraph docs


def synth_docs(spark, n: int):
    """Deterministic multi-paragraph corpus with ~30% shared
    boilerplate paragraphs and per-doc unique prose — the paragraph-
    dedup / DSIR / classifier workload shape."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2 == 0).alias("is_target"),
            F.concat_ws(
                "\n",
                F.format_string(
                    "unique opening line for document %d with words", F.col("id")
                ),
                F.lit("Accept all cookies to continue reading this site."),
                F.format_string(
                    "body paragraph %d talks about rivers and %d stones",
                    F.col("id"),
                    F.col("id") % 97,
                ),
                F.when(
                    F.col("id") % 3 == 0,
                    F.lit("Subscribe to our newsletter today!"),
                ).otherwise(
                    F.format_string("closing thought %d", F.col("id") % 53)
                ),
            ).alias("text"),
        )
    )


def timed(fn, k: int = 2) -> float:
    fn()  # untimed warm-up: first-call codegen/JIT dominates small
    # points otherwise (an 11 s x1 next to a 0.5 s x100 is plan
    # compilation, not data work — the thing this ladder is NOT
    # measuring)
    best = float("inf")
    for _ in range(k):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("scaling-curation", master="local[8]")
    from diachronic_spark.operators.classifier import (
        _featurize,
        _hard_sigmoid,
        _margin,
    )
    from diachronic_spark.operators.dedup import paragraph_dedup
    from diachronic_spark.operators.sampling import dsir_log_weights

    rows = []
    for op, run in (
        (
            "dsir_log_weights",
            lambda df: dsir_log_weights(
                df, target=F.col("is_target"), n_buckets=256
            ).agg(F.count(F.lit(1)), F.sum("log_weight")).collect(),
        ),
        (
            "paragraph_dedup",
            lambda df: paragraph_dedup(df)
            .agg(F.count(F.lit(1)), F.sum("n_paras_kept"))
            .collect(),
        ),
        (
            "classifier_iteration",
            None,  # special-cased below: one gradient agg over cached feats
        ),
    ):
        pts = {}
        for factor in (1, 10, 100):
            n = BASE_DOCS * factor
            df = synth_docs(spark, n)
            if op == "classifier_iteration":
                feat = _featurize(
                    df, F.col("is_target"), "text", 16
                ).persist()
                feat.count()  # materialize OUTSIDE the timed region
                err = F.col("y") - _hard_sigmoid(_margin([0.01] * 17))
                pts[f"x{factor}"] = timed(
                    lambda: feat.select(
                        *[
                            F.sum(
                                F.floor(
                                    F.element_at("x", i)
                                    * err
                                    * F.lit(1e9)
                                    + F.lit(0.5)
                                ).cast("bigint")
                            ).alias(f"s{i}")
                            for i in range(1, 18)
                        ]
                    ).collect()
                )
                feat.unpersist()
            else:
                pts[f"x{factor}"] = timed(lambda: run(df))
        r10 = round(pts["x10"] / pts["x1"], 2)
        r100 = round(pts["x100"] / pts["x10"], 2)
        rows.append(
            {
                "op": op,
                "n_docs_x1": BASE_DOCS,
                **pts,
                "ratio_1_to_10": r10,
                "ratio_10_to_100": r100,
                "superlinear": r10 > 13 or r100 > 13,
            }
        )
        print(rows[-1])
    out = {
        "metric": "scaling_curation_ops",
        "unit": "sec",
        "loadavg_1m": os.getloadavg()[0],
        "method": "min-of-2 wall per point; synthetic multi-paragraph "
        "corpus (30% shared boilerplate); classifier point times ONE "
        "gradient aggregation over pre-materialized cached features "
        "(the per-iteration cost at scale)",
        "flag_ratio": 13.0,
        "ops": rows,
    }
    with open("SCALING_CURATION.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_CURATION.json")


if __name__ == "__main__":
    main()
