"""Distributed k-means + SemDeDup (`pipeline/cluster.py`) invariants.

The workload gate (embedding_kmeans_semdedup) binds the full unrolled
iteration bitwise vs DuckDB; these tests bind the properties the SQL
mirror can't see — layout invariance, the Lloyd's descent contract, the
empty-cluster path, and a hand-checkable planted-cluster replay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.cluster import (
    cosine_ge_grid,
    kmeans_assign,
    kmeans_fit,
    quantize_vec,
    semantic_dedup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from ophidia_io_server_spark.sources.tables import load_table

    return load_table(spark, SF, "embeddings").cache()


def test_assignment_layout_invariant(spark, emb):
    """Same assignments regardless of partitioning — the map-only
    argmin depends on row values only (exact ints + one IEEE division),
    never on partition order."""
    a1, _ = kmeans_fit(emb, k=6, iters=2)
    a2, _ = kmeans_fit(emb.repartition(17, "label"), k=6, iters=2)
    r1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    r2 = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    assert r1 == r2


def test_centroids_are_exact_member_sums(spark, emb):
    """After fit, each returned centroid (s, n) equals the exact integer
    column-sums and count of the PREVIOUS assignment's members — the
    Lloyd's update identity, checked from the returned assignment."""
    assigned, cents = kmeans_fit(emb, k=5, iters=2)
    # `assigned` is the iteration-2 assignment (computed with the
    # iteration-1 centroids); `cents` is its update.
    agg = {int(r["cluster"]): r for r in
           assigned.groupBy("cluster")
           .agg(F.count(F.lit(1)).alias("n"),
                *[F.sum(F.element_at("qv", i + 1)).alias(f"s{i}")
                  for i in range(64)]).collect()}
    for c, (s, n) in enumerate(cents):
        assert c in agg
        assert n == int(agg[c]["n"])
        assert s == [int(agg[c][f"s{i}"]) for i in range(64)]


def test_lloyds_descent(spark, emb):
    """More iterations never increase the total within-cluster cost
    (monotone descent — the defining property of Lloyd's)."""
    def cost(iters):
        assigned, cents = kmeans_fit(emb, k=8, iters=iters)
        # exact numerator/denominator cost of the FINAL assignment
        # against its own update centroids (the next iterate's view)
        tot = 0.0
        rows = assigned.collect()
        for r in rows:
            s, n = cents[int(r["cluster"])]
            num = sum((n * x - si) ** 2 for x, si in zip(r["qv"], s))
            tot += num / float(n * n)
        return tot

    c1, c2, c3 = cost(1), cost(2), cost(3)
    assert c1 >= c2 >= c3


def test_empty_cluster_keeps_previous_centroid(spark):
    """A centroid that attracts no members survives unchanged (both
    engines' contract; the oracle mirrors it with the NOT IN union)."""
    rows = [(i, [float(i * 100), 0.0]) for i in range(3)] + \
           [(3, [100000.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k=4 seeds are the 4 points; points 0-2 all sit nearest centroid 1
    # after one update pulls centroids together — cluster 3 keeps its far
    # point; run 3 iters to force re-update churn.
    assigned, cents = kmeans_fit(df, k=4, iters=3, grid=1)
    assert len(cents) == 4
    assert all(n >= 1 for _, n in cents)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert got[3] == 3  # the outlier never migrates


def test_semantic_dedup_drops_planted_duplicate(spark):
    """Two near-identical vectors in one cluster → the larger id is
    dropped; a far vector is kept even though ids are adjacent."""
    base = [0.1] * 8
    near = [0.1] * 7 + [0.100001]
    far = [-0.2] * 8
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: (r["cluster"], r["kept"])
           for r in semantic_dedup(df, k=2, iters=2, tau_pct=90).collect()}
    assert out[0][1] is True
    assert out[1][1] is False          # near-dup of 0, larger id
    assert out[2][1] is True
    assert out[0][0] == out[1][0] != out[2][0]


def test_cosine_grid_predicate_matches_float(spark, emb):
    """The exact-integer cosine-≥τ predicate agrees with float cosine on
    the quantized vectors (the grid predicate IS float-free; compare on
    the same grid to avoid quantization boundary cases)."""
    q = emb.select("vec_id", quantize_vec(F.col("embedding"), 256)
                   .alias("q")).limit(40)
    a = q.select(F.col("vec_id").alias("ai"), F.col("q").alias("qa"))
    b = q.select(F.col("vec_id").alias("bi"), F.col("q").alias("qb"))
    pairs = (a.crossJoin(b).where(F.col("ai") < F.col("bi"))
             .withColumn("pred", cosine_ge_grid(F.col("qa"), F.col("qb"), 40))
             .collect())
    import math
    for r in pairs:
        dot = sum(x * y for x, y in zip(r["qa"], r["qb"]))
        na = math.sqrt(sum(x * x for x in r["qa"]))
        nb = math.sqrt(sum(x * x for x in r["qb"]))
        cos = dot / (na * nb) if na and nb else 0.0
        if abs(cos - 0.4) > 1e-9:      # off the exact boundary
            assert r["pred"] == (cos >= 0.4), (r["ai"], r["bi"], cos)


def test_assignment_is_jvm_only(spark, emb):
    """The per-row argmin plan contains no Python evaluation node —
    assignment must scale as map-only JVM work."""
    q = emb.select("vec_id", quantize_vec(F.col("embedding"), 1024)
                   .alias("qv"))
    cents = [(list(r["qv"]), 1) for r in q.orderBy("vec_id").limit(4).collect()]
    plan = kmeans_assign(q, cents)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan      # map-only: no shuffle either


def test_blas_kernel_agrees_with_exact_sf001_and_10x(spark):
    """Gate-adjacent signal for the large-k production kernel (r7 verdict
    #7): the float64 dgemm argmin must agree with the exact int64 kernel
    on corpora with no near-ties — at sf0.01 scale AND on a 10× replica
    union (distinct vec_ids, identical geometry), so dispatch drift or a
    tie-break regression in either kernel cannot pass silently.  The
    comparison is set-level per cluster id (both kernels share the
    deterministic lowest-id init, so labels align)."""
    from ophidia_io_server_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.01", "embeddings")

    def assignments(df, kernel):
        assigned, _ = kmeans_fit(df, k=8, iters=3, kernel=kernel)
        return {(r["vec_id"], r["cluster"]) for r in
                assigned.select("vec_id", "cluster").collect()}

    assert assignments(base, "exact") == assignments(base, "blas")

    n = base.agg(F.max("vec_id")).collect()[0][0] + 1
    tenx = base
    for i in range(1, 10):
        tenx = tenx.unionByName(
            base.withColumn("vec_id", F.col("vec_id") + F.lit(i * n)))
    tenx = tenx.localCheckpoint()
    assert assignments(tenx, "exact") == assignments(tenx, "blas")
