"""Tests for the embedding near-dup hot-cell guard (dd6): banded RH-LSH
sub-blocking must bound a skewed cell's pair fan-out while keeping true
near-duplicates and leaving small cells exact."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from crawler_spark.operators.similarity import (
    embedding_neardup_pairs, rh_planes,
)

DIM = 64


def _emb_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    # hot cell 0: 40 vectors — far wider than max_cell=10
    for i in range(40):
        rows.append((i, 0, [float(x) for x in rng.normal(size=DIM)]))
    # engineered near-dup: vec 100 ≈ vec 0 (cosine ~ 1.0)
    base = np.asarray(rows[0][2])
    near = base + rng.normal(scale=1e-3, size=DIM)
    rows.append((100, 0, [float(x) for x in near]))
    # cold cell 1: 5 vectors — stays exact all-pairs
    for i in range(200, 205):
        rows.append((i, 1, [float(x) for x in rng.normal(size=DIM)]))
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>")


def test_neardup_hot_cell_subblock_bounds_fanout(spark):
    emb = _emb_df(spark)
    planes = rh_planes(4, DIM)
    # threshold=-1 keeps every generated pair: the count IS the fan-out
    uncapped = {(r["vec_a"], r["vec_b"])
                for r in embedding_neardup_pairs(
                    emb, threshold=-1.0, max_cell=None).collect()}
    capped_df = embedding_neardup_pairs(
        emb, threshold=-1.0, max_cell=10, planes=planes, band_size=2)
    capped = {(r["vec_a"], r["vec_b"]) for r in capped_df.collect()}

    hot_allpairs = 41 * 40 // 2
    cold_allpairs = 5 * 4 // 2
    assert len(uncapped) == hot_allpairs + cold_allpairs
    # sub-blocking generates only within (band, sub) blocks: strictly fewer
    # pairs than all-pairs in the hot cell, never more than 2-band union
    assert capped <= uncapped
    assert len(capped) < hot_allpairs
    # cold cell is untouched (exact all-pairs)
    cold = {(a, b) for a, b in uncapped if a >= 200}
    assert cold <= capped


def test_neardup_subblock_keeps_true_neardups(spark):
    """A near-identical pair has the same sign pattern under every plane, so
    it lands in the same sub-bucket in every band and survives the guard."""
    emb = _emb_df(spark)
    got = embedding_neardup_pairs(
        emb, threshold=0.95, max_cell=10,
        planes=rh_planes(4, DIM), band_size=2).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in got} == {(0, 100)}
    assert got[0]["cosine"] >= 0.999


def test_kmeans_separates_blobs(spark):
    """Two well-separated lattice blobs: 3 Lloyd iterations recover the
    partition regardless of which seeds start where."""
    from pyspark.sql import functions as F
    from crawler_spark.operators.similarity import kmeans_assign

    rows = []
    for i in range(20):
        rows.append((i, [1.0 + (i % 3) * 0.01] * 8))        # blob A
        rows.append((100 + i, [-1.0 - (i % 3) * 0.01] * 8))  # blob B
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
              .withColumn("embedding", F.col("embedding")
                          .cast("array<float>"))
    out = kmeans_assign(df, k=2, iters=3, scale=64).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert len(out) == 40 and len(by_cluster) == 2
    a = {i for i in range(20)}
    b = {100 + i for i in range(20)}
    assert set(map(frozenset, by_cluster.values())) == {frozenset(a),
                                                        frozenset(b)}


def test_kmeans_partition_invariant(spark):
    from pyspark.sql import functions as F
    from crawler_spark.operators.similarity import kmeans_assign

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted((r["vec_id"], r["cluster"], r["d2"]) for r in
               kmeans_assign(e.repartition(1), k=4, iters=2).collect())
    b = sorted((r["vec_id"], r["cluster"], r["d2"]) for r in
               kmeans_assign(e.repartition(13), k=4, iters=2).collect())
    assert a == b


def test_pq_encode_m1_equals_kmeans(spark):
    """With one subspace, PQ encoding degenerates to plain k-means: same
    cells, same distances — the joint-training path is the same algebra."""
    from crawler_spark.operators.similarity import kmeans_assign, pq_encode

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    km = {r["vec_id"]: (r["cluster"], r["d2"]) for r in
          kmeans_assign(e, k=4, iters=2).collect()}
    pq = {r["vec_id"]: (r["code_0"], r["pq_err"]) for r in
          pq_encode(e, m=1, k=4, iters=2).collect()}
    assert km == pq


def test_pq_encode_code_ranges_and_error(spark):
    from crawler_spark.operators.similarity import pq_encode

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = pq_encode(e, m=4, k=4, iters=2).collect()
    assert len(rows) == e.count()
    for r in rows:
        assert all(1 <= r[f"code_{i}"] <= 4 for i in range(4))
        assert r["pq_err"] >= 0


def test_adc_equals_reconstruction_distance(spark):
    """ADC's defining identity: adc(q, x) == ||q_lattice - recon(x)||^2
    where recon(x) concatenates x's assigned subspace centroids. Checked
    exhaustively on sf0.001 by reconstructing in Python from the trained
    codebook."""
    import math
    from pyspark.sql import functions as F
    from crawler_spark.operators.similarity import _pq_train, adc_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    asg, cent = _pq_train(e, m=4, k=4, iters=2, scale=64)
    code = {(r["vec_id"], r["s"]): r["c"] for r in asg.collect()}
    cb = {(r["s"], r["c"], r["d"]): r["cv"] for r in cent.collect()}
    q = {r["vec_id"]: [math.floor(float(x) * 64) for x in r["embedding"]]
         for r in e.collect()}
    got = adc_topk(e, query_ids=[0, 1], topk=3, m=4, k=4, iters=2).collect()
    assert len(got) == 6
    for r in got:
        qv = q[r["qid"]]
        want = 0
        for d in range(1, 65):
            s = (d - 1) // 16
            cv = cb[(s, code[(r["vec_id"], s)], d)]
            want += (qv[d - 1] - cv) ** 2
        assert r["adc"] == want


def test_range_search_threshold_and_rounding(spark):
    from crawler_spark.operators.similarity import range_search
    rows = [(0, [1.0, 0.0]), (1, [0.6, 0.8]), (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]), (4, [1.0, 0.05])]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = e.where(F.col("vec_id") == 0)
    got = {r["vec_id"]: r["cosine"]
           for r in range_search(e, q, threshold=0.6).collect()}
    # cos(v0,v1)=0.6 sits exactly ON the threshold (kept: >= on rounded)
    assert got[1] == 0.6
    assert 4 in got and got[4] > 0.99
    assert 2 not in got and 3 not in got and 0 not in got


def test_mips_order_differs_from_cosine_when_norms_vary(spark):
    # corpus: v1 aligned with q but tiny norm; v2 slightly off-axis but
    # huge norm -> cosine prefers v1, MIPS must prefer v2.
    from crawler_spark.operators.similarity import brute_force_topk, mips_topk
    rows = [
        (0, [1.0, 0.0, 0.0]),            # query
        (1, [0.01, 0.0, 0.0]),           # perfect cosine, tiny dot
        (2, [5.0, 2.0, 0.0]),            # cosine ~0.93, dot 5.0
        (3, [0.0, 1.0, 0.0]),            # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") == 0)
    mips = [r["vec_id"] for r in
            mips_topk(emb, q, k=3).orderBy("rnk").collect()]
    cos = [r["vec_id"] for r in
           brute_force_topk(emb, q, k=3).orderBy("rnk").collect()]
    assert mips[0] == 2 and cos[0] == 1
    assert mips != cos


def test_mips_augmentation_preserves_order(spark):
    # cosine top-k over the augmented space == exact MIPS top-k
    from crawler_spark.operators.similarity import (
        augment_for_mips, brute_force_topk, mips_topk,
    )
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8) * rng.uniform(0.1, 5)])
            for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") < 3)
    exact = {(r["qid"], r["rnk"]): r["vec_id"]
             for r in mips_topk(emb, q, k=5).collect()}
    aug_c = augment_for_mips(emb)
    aug_q = augment_for_mips(q, is_query=True)
    via_cos = {(r["qid"], r["rnk"]): r["vec_id"]
               for r in brute_force_topk(aug_c, aug_q, k=5).collect()}
    assert exact == via_cos


def test_knn_graph_mutual_flag_is_symmetric_membership(spark):
    from crawler_spark.operators.similarity import knn_graph
    rng = np.random.default_rng(13)
    rows = [(i, int(i % 2), [float(x) for x in rng.normal(size=8)])
            for i in range(20)]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    edges = knn_graph(emb, k=3).collect()
    eset = {(r["src"], r["dst"]) for r in edges}
    for r in edges:
        assert r["mutual"] == (1 if (r["dst"], r["src"]) in eset else 0)
    # per-node out-degree is exactly k
    from collections import Counter
    deg = Counter(s for s, _ in eset)
    assert all(v == 3 for v in deg.values())


def test_knn_graph_cell_blocking_restricts_pairs(spark):
    from crawler_spark.operators.similarity import knn_graph
    rng = np.random.default_rng(17)
    rows = [(i, int(i % 3), [float(x) for x in rng.normal(size=8)])
            for i in range(18)]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    blocked = knn_graph(emb, k=2, cell_col="label").collect()
    cell = {r[0]: r[1] for r in rows}
    assert blocked
    for r in blocked:
        assert cell[r["src"]] == cell[r["dst"]]


def test_mmr_rerank_matches_python_greedy(spark):
    from crawler_spark.operators.similarity import mmr_rerank
    rng = np.random.default_rng(7)
    vecs = {i: rng.normal(size=6) for i in range(20)}
    rows = [(i, [float(x) for x in v]) for i, v in vecs.items()]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") == 0)
    got = {(r["qid"], r["pick"]): (r["vec_id"], r["mmr"]) for r in
           mmr_rerank(emb, q, shortlist_k=6, picks=3).collect()}

    def cos(a, b):
        return round(float(np.dot(a, b)
                           / (np.linalg.norm(a) * np.linalg.norm(b))), 4)

    rel = sorted(((cos(vecs[0], vecs[i]), i) for i in vecs if i != 0),
                 key=lambda t: (-t[0], t[1]))[:6]
    cand = {i: r for r, i in rel}
    sel = [min(cand, key=lambda i: (-cand[i], i))]
    picks = {1: (sel[0], cand[sel[0]])}
    for t in (2, 3):
        best = None
        for i in cand:
            if i in sel:
                continue
            maxsim = max(cos(vecs[i], vecs[s]) for s in sel)
            mmr = round(0.7 * cand[i] - 0.3 * maxsim, 4)
            key = (-mmr, i)
            if best is None or key < best[0]:
                best = (key, i, mmr)
        sel.append(best[1])
        picks[t] = (best[1], best[2])
    for t in (1, 2, 3):
        assert got[(0, t)] == picks[t], t
    assert len({v for v, _ in picks.values()}) == 3  # distinct picks


def test_centroid_drift_zero_for_identical_halves(spark):
    """Two identical slices have drift exactly 0.0 per cell; moving one
    slice's vectors produces a positive drift."""
    from crawler_spark.operators.similarity import centroid_drift
    from pyspark.sql import functions as F
    rows = []
    for i in range(8):
        v = [0.5 if (i + j) % 2 == 0 else -0.25 for j in range(4)]
        rows.append((2 * i, v, i % 2))       # even ids: half a
        rows.append((2 * i + 1, v, i % 2))   # odd ids: identical twin in b
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in centroid_drift(
        df, split=(F.col("vec_id") % 2 == 0)).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["n_a"] == r["n_b"] == 4 and r["drift"] == 0.0
    shifted = df.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 2 == 1,
               F.transform("embedding", lambda x: x + F.lit(1.0)))
        .otherwise(F.col("embedding")))
    out2 = centroid_drift(shifted,
                          split=(F.col("vec_id") % 2 == 0)).collect()
    assert all(r["drift"] > 50 for r in out2)   # lattice scale 64: ~64


def test_ivf_multiprobe_allprobe_equals_bruteforce(spark):
    """With nprobe >= n_cells, multi-probe degenerates to the exact
    brute-force ranking — same rows, same order."""
    from crawler_spark.operators.similarity import (
        brute_force_topk, ivf_multiprobe)
    import random
    rng = random.Random(7)
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(8)], i % 3)
            for i in range(30)]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    qs = e.where(F.col("vec_id") < 2)
    mp = {(r["qid"], r["vec_id"], r["cosine"]) for r in
          ivf_multiprobe(e, qs, k=5, nprobe=3).collect()}
    bf = {(r["qid"], r["vec_id"], r["cosine"]) for r in
          brute_force_topk(e, qs, k=5).select(
              "qid", "vec_id", "cosine").collect()}
    assert mp == bf


def test_ivf_multiprobe_crosses_voronoi_boundary(spark):
    """The query's nearest neighbor lives in the SECOND-nearest cell:
    nprobe=1 misses it (scans only the home cell), nprobe=2 finds it —
    the exact failure mode multi-probe exists to fix."""
    from crawler_spark.operators.similarity import ivf_multiprobe
    # cell 0 centered at x=1.0 (query's home), cell 1 at x=0.8 close by,
    # cell 2 far away; the query's true NN (id 10) sits in cell 1.
    def vec(x):
        return [float(x)] + [0.0] * 7
    rows = ([(0, vec(1.0), 0)]                       # the query, cell 0
            + [(i, vec(1.2), 0) for i in (1, 2)]      # home-cell docs
            + [(10, vec(1.01), 1)]                    # true NN, cell 1
            + [(i, vec(0.6), 1) for i in (11, 12)]
            + [(i, vec(-5.0), 2) for i in (20, 21)])
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    qs = e.where(F.col("vec_id") == 0)
    one = {r["vec_id"] for r in
           ivf_multiprobe(e, qs, k=3, nprobe=1).collect()}
    two = {r["vec_id"] for r in
           ivf_multiprobe(e, qs, k=3, nprobe=2).collect()}
    assert 10 not in one and 10 in two


def test_ivf_recall_curve_monotone_and_saturates(spark):
    """Recall@k must be non-decreasing in nprobe and reach 1.0 when
    every cell is probed (nprobe >= n_cells => candidate set == corpus)."""
    from crawler_spark.operators.similarity import ivf_recall_curve
    import random
    rnd = random.Random(41)
    rows = []
    for i in range(60):
        cell = i % 3
        base = [0.9 * (cell == 0), 0.9 * (cell == 1), 0.9 * (cell == 2)]
        vec = [round(b + rnd.uniform(-0.05, 0.05), 6) for b in base]
        rows.append((i, cell, vec))
    df = spark.createDataFrame(rows,
                               "vec_id long, label long, "
                               "embedding array<double>")
    qs = df.where("vec_id in (0, 1)")
    got = {r.nprobe: r.mean_recall
           for r in ivf_recall_curve(df, qs, k=5, max_nprobe=3).collect()}
    assert list(got) == [1, 2, 3]
    assert got[1] <= got[2] <= got[3]
    assert got[3] == 1.0
    assert got[1] > 0.0


def test_farthest_first_golden_1d(spark):
    """Hand-traced Gonzalez traversal on a 1-D lattice (0, 10, 4, 7 at
    scale 64): start at min id, then 10 (d2=100), then 4 (d2=16);
    radius with k=3 is vec 3's min distance, 9."""
    from crawler_spark.operators.similarity import farthest_first_centers
    rows = [(0, [0.0]), (1, [10 / 64]), (2, [4 / 64]), (3, [7 / 64])]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [(r.rk, r.vec_id, r.sel_d2, r.radius)
           for r in farthest_first_centers(d, k=3).orderBy("rk").collect()]
    assert got == [(1, 0, 0, 9), (2, 1, 100, 9), (3, 2, 16, 9)]


def test_farthest_first_matches_python_reference(spark):
    """Random lattice vectors vs a direct Python Gonzalez traversal."""
    import random
    from crawler_spark.operators.similarity import farthest_first_centers
    rnd = random.Random(5)
    vecs = {i: [rnd.randrange(0, 64) / 64 for _ in range(4)]
            for i in range(30)}
    lat = {i: [int(x * 64) for x in v] for i, v in vecs.items()}
    d2 = lambda a, b: sum((x - y) ** 2 for x, y in zip(a, b))  # noqa: E731
    chosen = [min(lat)]
    mind = {i: d2(lat[i], lat[chosen[0]]) for i in lat}
    want = [(1, chosen[0], 0)]
    for rk in range(2, 5):
        nxt = max((i for i in lat if i not in chosen),
                  key=lambda i: (mind[i], -i))
        want.append((rk, nxt, mind[nxt]))
        chosen.append(nxt)
        for i in lat:
            mind[i] = min(mind[i], d2(lat[i], lat[nxt]))
    radius = max(mind.values())
    df = spark.createDataFrame(sorted(vecs.items()),
                               "vec_id long, embedding array<double>")
    got = [(r.rk, r.vec_id, r.sel_d2)
           for r in farthest_first_centers(df, k=4).orderBy("rk").collect()]
    assert got == want
    assert farthest_first_centers(df, k=4).first().radius == radius
