"""k-means quantizer + IVF probe tests (SURVEY §2.11 L3 scale path).

The eager (driver-checkpointed) and lazy (single-job) variants must
produce IDENTICAL assignments and centroids — they are two execution
shapes of one algorithm. Recall is pinned against the exact
brute-force baseline, and a pure-Python replay pins the semantics
independent of any Spark execution detail.
"""

from __future__ import annotations

import math

from diachronic_spark.catalog import load
from diachronic_spark.operators import similarity as S


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def _py_kmeans(vecs: dict[int, list[float]], k: int, n_iter: int, rnd: int = 6):
    """Executable spec: the documented determinism contract in ~20 lines."""
    ids = sorted(vecs)
    cents = {c: [round(x, rnd) for x in vecs[i]] for c, i in enumerate(ids[:k])}

    def assign():
        out = {}
        for i in ids:
            best = max(
                cents, key=lambda c: (_cos(vecs[i], cents[c]), -c)
            )
            out[i] = best
        return out

    for _ in range(n_iter):
        a = assign()
        new = {}
        for c in set(a.values()):
            members = [vecs[i] for i in ids if a[i] == c]
            new[c] = [
                round(sum(col) / len(members), rnd) for col in zip(*members)
            ]
        cents = new
    return assign(), cents


def test_eager_and_lazy_kmeans_identical(spark, sf_dir):
    """The eager form now assigns through the VECTORIZED numpy dual
    (_assigned_np) while the lazy form keeps the HOF fold — so this
    equivalence is also the bit-parity pin for the cumsum-equals-
    sequential-fold property, at several k (including k > dim/2 where
    empty cells appear and cell ids gap)."""
    emb = load(spark, sf_dir, "embeddings")
    for k in (8, 9, 33):
        a_e, c_e = S.kmeans(emb, k=k, n_iter=3)
        a_l, c_l = S.kmeans_lazy(emb, k=k, n_iter=3, cache_key=f"t{k}")
        assert sorted(map(tuple, a_e.collect())) == sorted(
            map(tuple, a_l.collect())
        ), f"k={k} assignments diverge"
        ce = {r["cell"]: list(r["c"]) for r in c_e.collect()}
        cl = {r["cell"]: list(r["c"]) for r in c_l.collect()}
        assert ce == cl, f"k={k} centroids diverge"


def test_kmeans_matches_python_replay(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding").collect()
    }
    py_assign, py_cents = _py_kmeans(vecs, k=8, n_iter=3)
    a, c = S.kmeans_lazy(emb, k=8, n_iter=3)
    got_assign = {r["vec_id"]: r["cell"] for r in a.collect()}
    assert got_assign == py_assign
    got_cents = {r["cell"]: [round(x, 6) for x in r["c"]] for r in c.collect()}
    assert set(got_cents) == set(py_cents)
    for cell in got_cents:
        for gx, px in zip(got_cents[cell], py_cents[cell]):
            # both sides round to 6dp; allow one ulp of 1e-6 for
            # summation-order drift sitting exactly on a boundary
            assert abs(gx - px) <= 1.1e-6


def test_ivf_with_kmeans_recall_vs_brute_force(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    assign, cents = S.kmeans_lazy(emb, k=8, n_iter=3)
    exact = [
        r["vec_id"] for r in S.brute_force_topk(emb, 7, k=5).collect()
    ]
    approx = [
        r["vec_id"]
        for r in S.ivf_topk_with_cells(
            emb, assign, cents, 7, k=5, n_probe=2
        ).collect()
    ]
    # clustered fixture: probing 2 of 8 cells must recover most of the
    # true neighborhood
    overlap = len(set(exact) & set(approx))
    assert overlap >= 3, f"recall {overlap}/5 too low: {exact} vs {approx}"


def test_pairwise_cosine_np_bit_equals_hof(spark, sf_dir):
    """cosine_similarity_np (the Arrow-vectorized pair filter) must be
    BIT-identical to the HOF fold over real corpus pairs — the same
    cumsum-equals-sequential-fold property _assigned_np relies on."""
    from pyspark.sql import functions as F

    from diachronic_spark.functions import cosine_similarity

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.join(b, (F.col("ia") % 17) == (F.col("ib") % 17)).filter(
        F.col("ia") < F.col("ib")
    )
    got = pairs.select(
        "ia", "ib",
        cosine_similarity("va", "vb").alias("h"),
        S.cosine_similarity_np(F.col("va"), F.col("vb")).alias("n"),
    ).collect()
    assert got, "no pairs?"
    bad = [(r.ia, r.ib, r.h, r.n) for r in got if r.h != r.n]
    assert not bad, bad[:5]


def _py_two_level(vecs: dict[int, list[float]], k: int, n_iter: int, rnd: int = 6):
    """Executable spec of kmeans_two_level: coarse = _py_kmeans at
    k_c = ceil(sqrt(k)); fine = per-coarse-cell Lloyd with UNROUNDED
    lowest-id init, argmax-cosine assignment (ties -> lowest cell),
    half-up-rounded means; global id = gcell * k_f + local."""
    k_c = max(2, math.ceil(math.sqrt(k)))
    k_f = -(-k // k_c)
    ca, _ = _py_kmeans(vecs, k_c, n_iter, rnd)
    p = 10.0 ** rnd
    out = {}
    for g in sorted(set(ca.values())):
        members = sorted(i for i in vecs if ca[i] == g)
        cents = {
            loc: list(vecs[i]) for loc, i in enumerate(members[:k_f])
        }

        def assign():
            return {
                i: max(cents, key=lambda c: (_cos(vecs[i], cents[c]), -c))
                for i in members
            }

        for _ in range(n_iter):
            a = assign()
            new = {}
            for c in sorted(set(a.values())):
                ms = [vecs[i] for i in members if a[i] == c]
                new[c] = [
                    math.floor((sum(col) / len(ms)) * p + 0.5) / p
                    for col in zip(*ms)
                ]
            cents = new
        for i, loc in assign().items():
            out[i] = g * k_f + loc
    return out, k_c, k_f


def test_two_level_matches_python_replay(spark, sf_dir):
    """The hierarchical fit (coarse flat kmeans + per-cell numpy fine
    Lloyd inside applyInPandas) must reproduce the pure-Python spec
    exactly — pinning init choice, candidate restriction (probe width
    1), tie-breaks, empty-cell drops, and the global id arithmetic."""
    emb = load(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding").collect()
    }
    for k in (8, 9, 33):
        want, k_c, k_f = _py_two_level(vecs, k=k, n_iter=3)
        assign, got_kc, got_kf = S.kmeans_two_level(
            emb, k=k, n_iter=3, cache_key=f"t2l{k}"
        )
        assert (got_kc, got_kf) == (k_c, k_f)
        got = {r["vec_id"]: r["cell"] for r in assign.collect()}
        assert got == want, f"k={k}: {sum(got[i] != want[i] for i in got)} diverge"


def test_two_level_cell_shape(spark, sf_dir):
    """Structural invariants: ids stay inside their coarse block
    (cell // k_f is a valid coarse id), every vector is assigned, and
    the mean occupied-cell size is within a small factor of the n/k
    policy target."""
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    k = max(8, -(-n // 8))  # force a multi-cell hierarchy on the fixture
    assign, k_c, k_f = S.kmeans_two_level(
        emb, k=k, n_iter=3, cache_key="t2lshape"
    )
    rows = assign.collect()
    assert len(rows) == n
    cells = [r["cell"] for r in rows]
    assert all(0 <= c // k_f < k_c for c in cells)
    occupied = len(set(cells))
    assert occupied <= k_c * k_f
    mean_sz = n / occupied
    assert mean_sz <= 8 * 4, f"mean cell size {mean_sz} vs target 8"
