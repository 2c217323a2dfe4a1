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
