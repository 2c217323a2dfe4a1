"""IVF ANN: exactness when probing all lists, sane recall when pruning."""

import pytest
from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.similarity import cosine_topk, ivf_ann_topk
from ophidia_io_server_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def _pairs(df):
    return {(r.query_id, r.rank): r.neighbor_id for r in df.collect()}


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    pred = F.col("vec_id") < 5
    exact = _pairs(cosine_topk(emb, pred, k=5))
    ivf = _pairs(ivf_ann_topk(emb, pred, k=5, nlist=4, nprobe=4, iters=2))
    assert ivf == exact


def test_ivf_nlist256_plan_analysis_subsecond(spark, emb):
    """Centroids live in a broadcast DataFrame, not the expression tree: at
    nlist=256 the former F.lit-array encoding built an O(nlist·dim) ≈ 16k-node
    expression per assignment and Catalyst analysis took many seconds; the
    broadcast-join plan must analyze in well under a second."""
    import time

    pred = F.col("vec_id") < 3
    df = ivf_ann_topk(emb, pred, k=3, nlist=256, nprobe=2, iters=1)
    t0 = time.perf_counter()
    df.select("*").schema  # fresh analyzer pass over the whole tree
    assert time.perf_counter() - t0 < 1.0
    assert len(df.limit(3).collect()) > 0


def test_ivf_pruned_recall(spark, emb):
    pred = F.col("vec_id") < 10
    exact = _pairs(cosine_topk(emb, pred, k=5))
    ivf = _pairs(ivf_ann_topk(emb, pred, k=5, nlist=8, nprobe=3, iters=3))
    hits = sum(1 for k, v in ivf.items() if exact.get(k) == v)
    # pruned probing keeps most of the true top-5 (deterministic given data)
    assert hits / len(exact) >= 0.5
    # every query still returns k ranked rows
    assert len(ivf) == len(exact)


# -- BLAS vs HOF kernel parity ------------------------------------------------
# The cogrouped/mapInPandas BLAS kernels must return EXACTLY the rows the
# pure-JVM HOF fold returns (same values after the public 6-dp rounding) —
# the driver gate hashes values, so "close" is not enough.  Verified over the
# full sf0.01+sf0.1 outputs in PERF.md r5; pinned here at sf0.001.


def _symdiff(a, b):
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_cosine_pairs_kernel_parity(spark, emb):
    from ophidia_io_server_spark.pipeline.similarity import cosine_pairs

    blas = cosine_pairs(emb, threshold=0.4, kernel="blas")
    hof = cosine_pairs(emb, threshold=0.4, kernel="hof")
    assert blas.count() == hof.count() > 0
    assert _symdiff(blas, hof) == 0


def test_cosine_topk_kernel_parity(spark, emb):
    pred = F.col("vec_id") < 10
    blas = cosine_topk(emb, pred, k=5, kernel="blas")
    hof = cosine_topk(emb, pred, k=5, kernel="hof")
    assert blas.count() == hof.count() > 0
    assert _symdiff(blas, hof) == 0


def test_ivf_kernel_parity(spark, emb):
    pred = F.col("vec_id") < 10
    blas = ivf_ann_topk(emb, pred, k=5, nlist=8, nprobe=2, iters=2, kernel="blas")
    hof = ivf_ann_topk(emb, pred, k=5, nlist=8, nprobe=2, iters=2, kernel="hof")
    assert blas.count() == hof.count() > 0
    assert _symdiff(blas, hof) == 0


def test_auto_kernel_dispatch(spark, emb):
    """auto = hof below AUTO_BLAS_MIN_ROWS (sf0.001 is), blas above; both
    reachable and equal — the dispatch itself must not change results."""
    from ophidia_io_server_spark.pipeline import similarity as sim

    n = emb.count()
    assert n < sim.AUTO_BLAS_MIN_ROWS  # precondition of this fixture
    auto = cosine_topk(emb, F.col("vec_id") < 3, k=3, kernel="auto")
    hof = cosine_topk(emb, F.col("vec_id") < 3, k=3, kernel="hof")
    assert _symdiff(auto, hof) == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cosine_topk(emb, F.col("vec_id") < 3, k=3, kernel="gpu")


def test_cosine_pairs_blas_plan_is_cogroup(spark, emb):
    """The BLAS pairs plan must be a cogroup (FlatMapCoGroupsInPandas) over
    the block-pair key — not a joined n² row stream into Python — and the
    HOF plan must stay a plain shuffled equi-join with no BNLJ/cartesian."""
    from ophidia_io_server_spark.pipeline.similarity import cosine_pairs

    blas_plan = cosine_pairs(emb, threshold=0.4, kernel="blas")._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in blas_plan
    hof_plan = cosine_pairs(emb, threshold=0.4, kernel="hof")._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in blas_plan and bad not in hof_plan


def test_work_based_dispatch_thresholds():
    """The linear (q·n) family dispatches on estimated dot products — unit
    check of the threshold function itself."""
    from ophidia_io_server_spark.pipeline.similarity import (
        AUTO_BLAS_MIN_WORK, _resolve_kernel_work)

    assert _resolve_kernel_work("auto", AUTO_BLAS_MIN_WORK - 1) == "hof"
    assert _resolve_kernel_work("auto", AUTO_BLAS_MIN_WORK) == "blas"
    assert _resolve_kernel_work("blas", 0) == "blas"
    assert _resolve_kernel_work("hof", 1e12) == "hof"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _resolve_kernel_work("gpu", 1.0)


# -- PCA / whitening ---------------------------------------------------------


def test_pca_recovers_planted_structure(spark):
    import numpy as np

    from ophidia_io_server_spark.pipeline.embeddings import fit_pca, transform_pca

    # plant variance concentrated on two known directions in R^8
    rng = np.random.RandomState(3)
    d1, d2 = np.zeros(8), np.zeros(8)
    d1[0] = 1.0
    d2[3] = 1.0
    V = (rng.randn(400, 1) * 5.0 * d1 + rng.randn(400, 1) * 2.0 * d2
         + rng.randn(400, 8) * 0.01)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>")
    mean, comps, var = fit_pca(emb, k=2)
    # top component ≈ ±e0, second ≈ ±e3 (sign pinned positive)
    assert abs(comps[0, 0]) > 0.99 and comps[0, 0] > 0
    assert abs(comps[3, 1]) > 0.99 and comps[3, 1] > 0
    assert var[0] > var[1] > 0
    # projection matches numpy exactly (same matmul, same mean)
    proj = {r["vec_id"]: np.array(r["proj"])
            for r in transform_pca(emb, mean, comps, var).collect()}
    expect = (V - mean) @ comps
    for i in range(0, 400, 57):
        assert np.allclose(proj[i], expect[i], atol=1e-12)


def test_pca_whiten_unit_variance(spark):
    import numpy as np

    from ophidia_io_server_spark.pipeline.embeddings import pca_whiten

    rng = np.random.RandomState(11)
    V = rng.randn(300, 6) * np.array([9, 5, 3, 2, 1, 0.5])
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>")
    P = np.stack([r["proj"] for r in pca_whiten(emb, k=4).collect()])
    cov = np.cov(P.T, bias=True)
    assert np.abs(np.diag(cov) - 1.0).max() < 1e-6
    assert np.abs(cov - np.diag(np.diag(cov))).max() < 1e-6


def test_pca_layout_independent(spark):
    import numpy as np

    from ophidia_io_server_spark.pipeline.embeddings import fit_pca

    rng = np.random.RandomState(5)
    V = rng.randn(200, 5)
    rows = [(i, v.tolist()) for i, v in enumerate(V)]
    e1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m1, c1, v1 = fit_pca(e1, k=3)
    m2, c2, v2 = fit_pca(e1.repartition(7), k=3)
    assert np.allclose(m1, m2, atol=1e-12)
    assert np.allclose(v1, v2, atol=1e-9)
    assert np.allclose(np.abs(c1), np.abs(c2), atol=1e-7)


# -- product quantization ----------------------------------------------------


def _emb_df(spark, V):
    return spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>")


def test_pq_exact_when_codebook_holds_all_points(spark):
    import numpy as np

    from ophidia_io_server_spark.pipeline.pq import pq_encode, pq_topk, train_pq

    # 8 well-separated points, ncent=8, m=1: quantization is lossless, so
    # ADC top-k must equal exact L2 top-k
    rng = np.random.RandomState(2)
    V = rng.randn(8, 4) * 10
    emb = _emb_df(spark, V)
    books = train_pq(emb, m=1, ncent=8, sample=8, iters=20)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in pq_topk(emb, __import__("pyspark").sql.functions.col("vec_id") < 2,
                            books, k=3).collect()}
    for q in (0, 1):
        d = ((V - V[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        expect = np.argsort(d)[:3]
        assert [got[(q, r)] for r in (1, 2, 3)] == list(expect)


def test_pq_recall_on_planted_clusters(spark):
    import numpy as np

    from ophidia_io_server_spark.pipeline.pq import pq_topk, train_pq

    # 10 tight clusters of 20 points: a query's true neighbours are its own
    # cluster; PQ recall@5 should be high
    rng = np.random.RandomState(4)
    centers = rng.randn(10, 16) * 20
    V = np.concatenate([c + rng.randn(20, 16) * 0.1 for c in centers])
    emb = _emb_df(spark, V)
    books = train_pq(emb, m=4, ncent=16, sample=200, iters=10)
    from pyspark.sql import functions as F
    res = pq_topk(emb, F.col("vec_id") % 20 == 0, books, k=5).collect()
    hits = sum(1 for r in res
               if r["neighbor_id"] // 20 == r["query_id"] // 20)
    assert hits / len(res) >= 0.9


def test_pq_encode_layout_independent(spark):
    import numpy as np

    from ophidia_io_server_spark.pipeline.pq import pq_encode, train_pq

    rng = np.random.RandomState(9)
    V = rng.randn(100, 8)
    emb = _emb_df(spark, V)
    books = train_pq(emb, m=2, ncent=4, sample=100, iters=5)
    a = {r["vec_id"]: r["codes"] for r in pq_encode(emb, books).collect()}
    b = {r["vec_id"]: r["codes"]
         for r in pq_encode(emb.repartition(7), books).collect()}
    assert a == b
    assert all(0 <= c < 4 for codes in a.values() for c in codes)


def test_pca_rotation_composes_with_pq(spark):
    """OPQ-lite: on coordinate-correlated data, decorrelating with PCA
    before PQ must not hurt (and typically helps) quantization quality —
    the operators compose through the standard (vec_id, array) contract."""
    import numpy as np

    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.embeddings import fit_pca, transform_pca
    from ophidia_io_server_spark.pipeline.pq import pq_encode, train_pq

    # strongly correlated dims: x replicated across subspace boundaries, so
    # independent per-subspace quantizers waste codes on shared variance
    rng = np.random.RandomState(13)
    base = rng.randn(600, 2)
    V = np.concatenate([base @ rng.randn(2, 4) + rng.randn(600, 4) * 0.05
                        for _ in range(2)], axis=1)  # dim 8, rank ~2+noise
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>")

    def recon_err(df):
        books = train_pq(df, m=2, ncent=8, sample=600, iters=10)
        enc = {r["vec_id"]: r["codes"] for r in pq_encode(df, books).collect()}
        X = {r["vec_id"]: np.array(r["embedding"])
             for r in df.select("vec_id", "embedding").collect()}
        err = 0.0
        for vid, codes in enc.items():
            rec = np.concatenate([books[s][codes[s]] for s in range(2)])
            err += float(((X[vid] - rec) ** 2).sum())
        return err / len(enc)

    raw_err = recon_err(emb)
    mean, comps, var = fit_pca(emb, k=8)
    rot = transform_pca(emb, mean, comps, var).select(
        "vec_id", F.col("proj").alias("embedding"))
    rot_err = recon_err(rot)
    # rotation concentrates variance into few dims -> per-subspace
    # quantizers cover it with the same code budget at lower error
    assert rot_err <= raw_err * 1.05


def test_ivfpq_lossless_configuration_matches_exact(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.pq import (exact_l2_topk, ivfpq_topk,
                                                     train_ivfpq)

    rng = np.random.RandomState(6)
    V = rng.randn(12, 4) * 10
    emb = _emb_df(spark, V)
    # nlist=1 (no pruning), m=1, ncent >= n: residual quantization lossless
    C, B = train_ivfpq(emb, nlist=1, m=1, ncent=12, sample=12, iters=25)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in ivfpq_topk(emb, F.col("vec_id") < 2, C, B,
                               k=3, nprobe=1).collect()}
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in exact_l2_topk(emb, F.col("vec_id") < 2, k=3).collect()}
    assert got == exact


def test_ivfpq_recall_and_probe_dial(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.pq import ivfpq_topk, train_ivfpq

    rng = np.random.RandomState(8)
    centers = rng.randn(8, 16) * 20
    V = np.concatenate([c + rng.randn(25, 16) * 0.1 for c in centers])
    emb = _emb_df(spark, V)
    C, B = train_ivfpq(emb, nlist=8, m=4, ncent=16, sample=200, iters=10)
    pred = F.col("vec_id") % 25 == 0

    def recall(nprobe):
        res = ivfpq_topk(emb, pred, C, B, k=5, nprobe=nprobe).collect()
        return sum(1 for r in res
                   if r["neighbor_id"] // 25 == r["query_id"] // 25) / len(res)

    r_full = recall(8)
    assert r_full >= 0.9            # residual PQ resolves tight clusters
    assert recall(2) >= 0.8         # coarse pruning keeps own-cluster lists


def test_ivfpq_layout_independent(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.pq import ivfpq_topk, train_ivfpq

    rng = np.random.RandomState(14)
    V = rng.randn(150, 8)
    emb = _emb_df(spark, V)
    C, B = train_ivfpq(emb, nlist=4, m=2, ncent=8, sample=150, iters=6)
    pred = F.col("vec_id") < 5
    a = sorted(tuple(r) for r in ivfpq_topk(emb, pred, C, B, k=4, nprobe=2).collect())
    b = sorted(tuple(r) for r in ivfpq_topk(emb.repartition(9), pred, C, B,
                                            k=4, nprobe=2).collect())
    assert a == b and len(a) > 0


def test_opq_beats_plain_pq_on_correlated_data(spark):
    import numpy as np

    from ophidia_io_server_spark.pipeline.pq import (opq_rotate, pq_encode,
                                                     train_opq, train_pq)

    rng = np.random.RandomState(21)
    base = rng.randn(500, 2)
    V = np.concatenate([base @ rng.randn(2, 4) + rng.randn(500, 4) * 0.05
                        for _ in range(2)], axis=1)
    emb = _emb_df(spark, V)

    def recon_err(df, books):
        enc = {r["vec_id"]: r["codes"] for r in pq_encode(df, books).collect()}
        X = {r["vec_id"]: np.array(r["embedding"])
             for r in df.select("vec_id", "embedding").collect()}
        m, ncent, dsub = books.shape
        err = 0.0
        for vid, codes in enc.items():
            rec = np.concatenate([books[s][codes[s]] for s in range(m)])
            err += float(((X[vid] - rec) ** 2).sum())
        return err / len(enc)

    pq_books = train_pq(emb, m=2, ncent=8, sample=500, iters=10)
    raw_err = recon_err(emb, pq_books)
    R, opq_books = train_opq(emb, m=2, ncent=8, sample=500,
                             iters_pq=10, iters_opq=6)
    assert np.allclose(R @ R.T, np.eye(8), atol=1e-10)  # orthogonal
    rot_err = recon_err(opq_rotate(emb, R), opq_books)
    # the learned rotation must quantize correlated data strictly better
    assert rot_err < raw_err * 0.9


def test_opq_topk_valid_and_deterministic(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.pq import opq_topk, train_opq

    rng = np.random.RandomState(30)
    V = rng.randn(120, 8)
    emb = _emb_df(spark, V)
    R, books = train_opq(emb, m=2, ncent=8, sample=120, iters_pq=6, iters_opq=4)
    pred = F.col("vec_id") < 4
    a = sorted(tuple(r) for r in opq_topk(emb, pred, R, books, k=3).collect())
    b = sorted(tuple(r) for r in opq_topk(emb.repartition(7), pred, R, books, k=3).collect())
    assert a == b
    assert len(a) == 4 * 3


def test_opq_ivfpq_beats_plain_ivfpq_reconstruction(spark):
    import numpy as np

    from ophidia_io_server_spark.pipeline.pq import (train_ivfpq,
                                                     train_opq_ivfpq)

    rng = np.random.RandomState(33)
    base = rng.randn(500, 2)
    V = np.concatenate([base @ rng.randn(2, 4) + rng.randn(500, 4) * 0.05
                        for _ in range(2)], axis=1)
    emb = _emb_df(spark, V)

    def ivfpq_recon_err(X, coarse, books):
        a = ((X[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        Res = X - coarse[a]
        m, ncent, dsub = books.shape
        rec = np.empty_like(X)
        for s in range(m):
            Rs = Res[:, s * dsub:(s + 1) * dsub]
            d2 = ((Rs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            rec[:, s * dsub:(s + 1) * dsub] = books[s][d2.argmin(axis=1)]
        return float((((X - coarse[a]) - rec) ** 2).sum() / len(X))

    c0, b0 = train_ivfpq(emb, nlist=4, m=2, ncent=8, sample=500, iters=10)
    raw_err = ivfpq_recon_err(V, c0, b0)
    R, c1, b1 = train_opq_ivfpq(emb, nlist=4, m=2, ncent=8, sample=500,
                                iters=10, iters_opq=6)
    assert np.allclose(R @ R.T, np.eye(8), atol=1e-10)
    rot_err = ivfpq_recon_err(V @ R, c1, b1)
    assert rot_err < raw_err * 0.9


def test_opq_ivfpq_topk_valid_and_deterministic(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.pq import (opq_ivfpq_topk,
                                                     train_opq_ivfpq)

    rng = np.random.RandomState(34)
    V = rng.randn(150, 8)
    emb = _emb_df(spark, V)
    R, coarse, books = train_opq_ivfpq(emb, nlist=4, m=2, ncent=8,
                                       sample=150, iters=6, iters_opq=4)
    pred = F.col("vec_id") < 4
    a = sorted(tuple(r) for r in
               opq_ivfpq_topk(emb, pred, R, coarse, books, k=3, nprobe=4).collect())
    b = sorted(tuple(r) for r in
               opq_ivfpq_topk(emb.repartition(7), pred, R, coarse, books,
                              k=3, nprobe=4).collect())
    assert a == b
    assert len(a) == 4 * 3
