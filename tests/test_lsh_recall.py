"""LSH recall floor (VERDICT r8 item 5; tools/lsh_recall.py is the
10x artifact, SCALING_LSH_RECALL.json).

The near-dup queries' green rows prove pair algebra; THIS pins the
probabilistic layer: banded-minhash candidates + exact verify must
recover the complete PPJoin truth on the fixture corpus. The
banding S-curve 1-(1-j^2)^4 gives P >= 0.9988 at j >= 0.9 — and the
constructed near-dups (drop one word from ~100-shingle docs) all
sit there, so the DETERMINISTIC measured value is 1.0; the asserted
floor is 0.95, the honest probabilistic bound for any future
corpus tweak that adds borderline mass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from diachronic_spark.catalog import load
from diachronic_spark.operators import dedup as D

J_T = 0.5


def test_minhash_recall_floor_vs_complete_truth(spark, sf_dir):
    corpus = D.with_near_duplicates(load(spark, sf_dir, "documents"))
    arrs = D.shingle_arrays(corpus).persist()
    try:
        truth = {
            (r.doc_a, r.doc_b)
            for r in D.ppjoin_pairs(
                arrs, J_T, cache_key="test.recall.ppjoin"
            ).collect()
        }
        found = {
            (r.doc_a, r.doc_b)
            for r in D.jaccard_for_pairs(
                D.lsh_candidate_pairs(D.minhash_signature(arrs)), arrs
            )
            .filter(F.col("jaccard") >= J_T)
            .collect()
        }
    finally:
        arrs.unpersist()
    assert truth, "fixture corpus must carry true near-dup pairs"
    assert not (found - truth), "exact verify must never over-report"
    recall = len(truth & found) / len(truth)
    assert recall >= 0.95, f"minhash recall {recall:.3f} below floor"
    # current corpus: all pair mass at j>=0.9 -> deterministic 1.0
    assert recall == 1.0


def test_borderline_band_recall_dips_but_holds_floor(spark, sf_dir):
    """The adversarial point (VERDICT r9 item 7): constructed pairs
    at j ≈ 0.5–0.7 sit on the 4-band S-curve's shoulder, where
    P(candidate) = 1-(1-j²)⁴ is 0.68–0.92 — so recall here MUST be
    measurably below the j≥0.9 band's 1.0 (a 1.0 reading would mean
    the probe never left the certain region), while holding the
    floor the banding actually guarantees (≥ 0.68 at the band's
    weakest point, asserted with binomial slack at fixture n). The
    deterministic md5 hashes make the measured value a fixed fact
    per corpus, not a flaky sample."""
    corpus = D.with_borderline_near_duplicates(
        load(spark, sf_dir, "documents")
    )
    arrs = D.shingle_arrays(corpus).persist()
    try:
        truth = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in D.ppjoin_pairs(
                arrs, J_T, cache_key="test.recall.borderline"
            ).collect()
        }
        found = {
            (r.doc_a, r.doc_b)
            for r in D.jaccard_for_pairs(
                D.lsh_candidate_pairs(D.minhash_signature(arrs)), arrs
            )
            .filter(F.col("jaccard") >= J_T)
            .collect()
        }
    finally:
        arrs.unpersist()
    assert not (found - set(truth))
    border = {
        p: j for p, j in truth.items() if max(p) >= 200000
    }
    assert len(border) >= 100, "band must carry real pair mass"
    assert all(j < 0.75 for j in border.values())  # on the shoulder
    hits = sum(p in found for p in border)
    recall = hits / len(border)
    # measurably below certainty — the whole point of the band...
    assert recall <= 0.95, f"borderline recall {recall:.3f} too high"
    # ...but above the S-curve guarantee at j=0.5 (0.684) minus
    # 3σ binomial slack at this n
    n = len(border)
    floor = 0.684 - 3 * (0.684 * 0.316 / n) ** 0.5
    assert recall >= floor, (
        f"borderline recall {recall:.3f} under guarantee {floor:.3f}"
    )
