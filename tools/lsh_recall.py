#!/usr/bin/env python
"""Measured LSH recall vs complete ground truth at the 10x corpus
point (VERDICT r8 item 5).

The near-dup family's green correctness rows prove PAIR ALGEBRA
(candidates -> exact verify -> survivors), not RECALL: MinHash and
SRP banding are probabilistic, and a banding miss silently drops a
true pair before the exact verify ever sees it. This tool
adjudicates the miss rate against COMPLETE truth:

- MinHash (8 hashes, 4 bands x 2 rows — the production config every
  minhash query uses): truth = ppjoin_pairs (q125's machinery —
  prefix filtering is exhaustive, not probabilistic) at the same
  Jaccard threshold; found = banded candidates -> exact Jaccard
  verify. Recall is reported overall AND above j=0.7, because the
  S-curve 1-(1-j^2)^4 predicts misses concentrate near the 0.5
  boundary (j=0.5: P=0.68; j=0.7: P=0.92; j=0.9: P=0.9988).
- SRP (384 planes, 24 bands x 16 bits): truth = brute-force cosine
  over the collected embedding matrix (driver-side numpy — 55k
  vectors fit trivially; measurement tooling, not engine path);
  found = cosine_near_dup_pairs at threshold 0.99.

Corpus: the SCALING_DOCS10X 10x documents/embeddings build
(deterministic; reuse via SPARK_GRAFT_REUSE_SCALED=1), with the
same near-duplicate augmentation the correctness queries use.

Writes SCALING_LSH_RECALL.json. The small-SF floor is pinned in
tests/test_lsh_recall.py with the same machinery.

Usage: python tools/lsh_recall.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from diachronic_spark.operators import dedup as D  # noqa: E402
from diachronic_spark.operators import similarity as S  # noqa: E402
from diachronic_spark.session import get_spark  # noqa: E402

J_THRESHOLD = 0.5
COS_THRESHOLD = 0.99


def minhash_recall(spark, sf_dir: str) -> dict:
    """Banded-minhash recall vs complete PPJoin truth at one corpus."""
    from diachronic_spark.catalog import load

    corpus = D.with_near_duplicates(load(spark, sf_dir, "documents"))
    arrs = D.shingle_arrays(corpus).persist()
    arrs.count()

    truth = {
        (r.doc_a, r.doc_b, round(r.jaccard, 6))
        for r in D.ppjoin_pairs(
            arrs, J_THRESHOLD, cache_key="recall.ppjoin"
        ).collect()
    }
    sig = D.minhash_signature(arrs)
    found = {
        (r.doc_a, r.doc_b, round(r.jaccard, 6))
        for r in D.jaccard_for_pairs(
            D.lsh_candidate_pairs(sig), arrs
        )
        .filter(F.col("jaccard") >= J_THRESHOLD)
        .collect()
    }
    arrs.unpersist()
    hi_truth = {t for t in truth if t[2] >= 0.7}
    hit = truth & found
    hi_hit = hi_truth & found
    assert not (found - truth), "verify stage must never over-report"
    return {
        "threshold": J_THRESHOLD,
        "n_true_pairs": len(truth),
        "n_found": len(hit),
        "recall": round(len(hit) / len(truth), 4) if truth else None,
        "n_true_pairs_j_ge_0.7": len(hi_truth),
        "n_found_j_ge_0.7": len(hi_hit),
        "recall_j_ge_0.7": (
            round(len(hi_hit) / len(hi_truth), 4) if hi_truth else None
        ),
    }


def srp_recall(spark, sf_dir: str) -> dict:
    """SRP-banded cosine recall vs driver-side numpy brute force."""
    from diachronic_spark.catalog import load

    emb = S.with_near_duplicate_vectors(
        load(spark, sf_dir, "embeddings")
    ).persist()
    emb.count()
    rows = emb.select("vec_id", "emb").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.emb for r in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = M @ M.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= COS_THRESHOLD
    truth = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ids[iu[0][mask]], ids[iu[1][mask]])
    }
    found = {
        (r.vec_a, r.vec_b)
        for r in S.cosine_near_dup_pairs(
            emb, threshold=COS_THRESHOLD
        ).collect()
    }
    emb.unpersist()
    hit = truth & found
    return {
        "threshold": COS_THRESHOLD,
        "n_true_pairs": len(truth),
        "n_found": len(hit),
        "n_spurious": len(found - truth),
        "recall": round(len(hit) / len(truth), 4) if truth else None,
    }


def borderline_minhash_recall(spark, sf_dir: str) -> dict:
    """Adversarial S-curve shoulder (VERDICT r9 item 7): constructed
    pairs at j ≈ 0.5–0.7 where 1-(1-j²)⁴ predicts 0.68–0.92 —
    recall MUST dip below 1.0 here; a 1.0 reading would mean the
    measurement isn't exercising the probabilistic layer at all.
    Per-band counts land in the artifact next to the prediction."""
    from diachronic_spark.catalog import load

    corpus = D.with_borderline_near_duplicates(
        load(spark, sf_dir, "documents")
    )
    arrs = D.shingle_arrays(corpus).persist()
    arrs.count()
    truth = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ppjoin_pairs(
            arrs, J_THRESHOLD, cache_key="recall.bl.ppjoin"
        ).collect()
    }
    found = {
        (r.doc_a, r.doc_b)
        for r in D.jaccard_for_pairs(
            D.lsh_candidate_pairs(D.minhash_signature(arrs)), arrs
        )
        .filter(F.col("jaccard") >= J_THRESHOLD)
        .collect()
    }
    arrs.unpersist()
    assert not (found - set(truth)), "verify must never over-report"

    bands: dict[str, list] = {}
    for (a, b), j in truth.items():
        hi = max(a, b)
        band = (hi - 200000) // 10000 if hi >= 200000 else None
        key = (
            f"target_{(0.55, 0.60, 0.65, 0.70)[band]}"
            if band is not None and 0 <= band <= 3
            else "preexisting_pairs"
        )
        n_t, n_f, js = bands.setdefault(key, [0, 0, []])
        bands[key][0] += 1
        bands[key][1] += (a, b) in found
        bands[key][2].append(j)

    out = {"threshold": J_THRESHOLD, "bands": {}}
    for key in sorted(bands):
        n_t, n_f, js = bands[key]
        jmin, jmax = min(js), max(js)
        out["bands"][key] = {
            "n_true_pairs": n_t,
            "n_found": n_f,
            "recall": round(n_f / n_t, 4),
            "j_min": round(jmin, 4),
            "j_max": round(jmax, 4),
            # the banding's own guarantee at the band's weakest point
            "s_curve_floor": round(1 - (1 - jmin**2) ** 4, 4),
        }
    border = [v for k, v in bands.items() if k != "preexisting_pairs"]
    n_t = sum(b[0] for b in border)
    n_f = sum(b[1] for b in border)
    out["borderline_total"] = {
        "n_true_pairs": n_t,
        "n_found": n_f,
        "recall": round(n_f / n_t, 4) if n_t else None,
    }
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_LSH_RECALL.json",
    )
    spark = get_spark("lsh-recall")
    spark.sparkContext.setLogLevel("ERROR")

    from scaling_corpus10x import SCALED, build_scaled_dir

    build_scaled_dir(spark)

    result = {
        "metric": "lsh_recall_vs_complete_truth",
        "corpus": "10x documents/embeddings (SCALING_DOCS10X build)",
        "minhash_bands": "8 hashes, 4 bands x 2 rows",
        "srp_bands": "384 planes, 24 bands x 16 bits",
        "minhash_10x": minhash_recall(spark, SCALED),
        "srp_10x": srp_recall(spark, SCALED),
        "minhash_sf0.01": minhash_recall(
            spark, "/root/testdata/sf0.01"
        ),
        "srp_sf0.01": srp_recall(spark, "/root/testdata/sf0.01"),
        "minhash_borderline_10x": borderline_minhash_recall(
            spark, SCALED
        ),
        "minhash_borderline_sf0.01": borderline_minhash_recall(
            spark, "/root/testdata/sf0.01"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
