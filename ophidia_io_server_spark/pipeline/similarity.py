"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — broadcast the (small) query set,
  one pass over candidates, per-query top-k via aggregation.  The baseline.
- ``cosine_pairs``: all pairs above a cosine threshold via block-nested
  equi-join on a coarse LSH bucket (exact verify), avoiding n² at scale.
- ``lsh_ann_topk``: hyperplane-LSH bucketed approximate top-k — the scale
  path (candidates share ≥1 band bucket).

Dot products are left-to-right ``F.aggregate`` folds over ``zip_with`` —
JVM-side, no UDF; cosine uses precomputed norms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ophidia_io_server_spark.sources.tables import spread


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return spread(emb).withColumn("_norm", _norm(F.col(vec_col).cast("array<double>")))


def cosine_topk(emb: DataFrame, query_pred, k: int = 5,
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for every query vector (query_pred filters
    the query set).  Queries are broadcast; candidates stream by partition;
    the per-query top-k is a window over (sim desc, vec_id) — at cluster
    scale swap for the aggregation top-k in lsh_ann_topk."""
    base = with_norm(emb, vec_col).select(
        F.col("vec_id"), F.col(vec_col).cast("array<double>").alias("v"), F.col("_norm")
    )
    queries = base.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("_norm").alias("qn")
    )
    scored = (
        F.broadcast(queries)
        .join(base, F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.col("rank").cast("bigint").alias("rank"),
                F.round("cosine", 6).alias("cosine"))
    )


def cosine_pairs(emb: DataFrame, threshold: float = 0.4,
                 vec_col: str = "embedding", blocks: int | None = None) -> DataFrame:
    """All (a<b) pairs with cosine ≥ threshold — EXACT, and shuffle-bounded.

    Exact all-pairs is Ω(n²) comparisons in the worst case; the scale
    question is only how that work is *distributed*.  The former
    implementation was a BroadcastNestedLoopJoin on ``vec_a < vec_b`` —
    one broadcast of the whole table and a single-node-ish nested loop.
    This is the triangle block join instead: hash every vector into one of
    ``blocks`` buckets, emit each row once per block *pair* it participates
    in (left side: (g,j) for j ≥ g; right side: (i,h) for i ≤ h), and
    equi-join on the pair id.  Every unordered vector pair meets in exactly
    one of the B(B+1)/2 block-pair tasks, the plan is a plain shuffled
    equi-join (no BNLJ / CartesianProduct), each task holds ~(n/B)² work and
    2·n/B rows, and replication is ~B/2 rows per side — the standard
    distributed all-pairs shape.

    ``blocks`` defaults to √(8·defaultParallelism) (≥16): B(B+1)/2 block
    pairs ≈ 4 tasks per core, so the parameter self-scales with cluster
    size instead of being pinned to a bench-size constant.  The OUTPUT is
    identical for any ``blocks`` value (every unordered pair meets exactly
    once), so the oracle does not depend on it.

    For the approximate sub-quadratic path use ``cosine_pairs_lsh`` (banded
    sign-LSH candidates + exact verify) or ``lsh_ann_topk``."""
    if blocks is None:
        par = emb.sparkSession.sparkContext.defaultParallelism
        blocks = max(16, int((8 * par) ** 0.5))
    base = with_norm(emb, vec_col).select(
        F.col("vec_id"), F.col(vec_col).cast("array<double>").alias("v"), F.col("_norm"),
        F.pmod(F.xxhash64("vec_id"), F.lit(blocks)).cast("int").alias("g"),
    )
    left = base.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("_norm").alias("na"), F.col("g").alias("ga"),
        F.explode(F.sequence(F.col("g"), F.lit(blocks - 1))).alias("jb"),
    ).withColumn("pair_id", F.col("ga") * blocks + F.col("jb"))
    right = base.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("_norm").alias("nb"), F.col("g").alias("gb"),
        F.explode(F.sequence(F.lit(0), F.col("g"))).alias("ia"),
    ).withColumn("pair_id", F.col("ia") * blocks + F.col("gb"))
    joined = left.join(right, "pair_id").where(
        # same block: order by id (also drops self-pairs and mirror dups);
        # distinct blocks: every cross pair meets exactly once, keep it
        ((F.col("ga") == F.col("gb")) & (F.col("vec_a") < F.col("vec_b")))
        | (F.col("ga") != F.col("gb"))
    )
    scored = (
        joined
        .withColumn("cosine", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
    )
    return scored.select(
        F.least("vec_a", "vec_b").alias("vec_a"),
        F.greatest("vec_a", "vec_b").alias("vec_b"),
        F.round("cosine", 6).alias("cosine"),
    )


def cosine_pairs_lsh(emb: DataFrame, threshold: float = 0.4,
                     vec_col: str = "embedding", nplanes: int = 64,
                     bands: int = 16, dim: int = 64) -> DataFrame:
    """Approximate-recall all-pairs: banded sign-LSH candidates + exact
    cosine verify — the sub-quadratic scale path when near-dup pairs sit
    well above the threshold.

    Recall bound: a pair at cosine c survives a band of r = nplanes/bands
    bits with probability p^r, p = 1 - arccos(c)/π, so
    P[candidate] = 1 - (1 - p^r)^bands.  At r=4/bands=16: c=0.95 → miss
    ≈ 2e-7; c=0.7 → miss ≈ 2.8%; c=0.4 (the floor) → miss ≈ 93%.  Use for
    high-similarity near-dup mining, not low-threshold sweeps; precision is
    exact (every candidate is verified)."""
    planes = _hyperplanes(dim, nplanes)
    r = nplanes // bands

    def band_cols(v):
        bits = [
            F.when(_dot(v, F.array(*[F.lit(x) for x in p])) >= 0, 1).otherwise(0)
            for p in planes
        ]
        out = []
        for bnd in range(bands):
            acc = F.lit(0)
            for j in range(r):
                acc = acc * 2 + bits[bnd * r + j]
            out.append(acc)
        return F.array(*out)

    base = with_norm(emb, vec_col).select(
        "vec_id", F.col(vec_col).cast("array<double>").alias("v"), "_norm",
    )
    banded = base.select(
        "vec_id", "v", "_norm",
        F.posexplode(band_cols(F.col("v"))).alias("band", "bucket"),
    )
    a = banded.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                      F.col("_norm").alias("na"), "band", "bucket")
    b = banded.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                      F.col("_norm").alias("nb"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "va", "vb", "na", "nb")
        .dropDuplicates(["vec_a", "vec_b"])
        .withColumn("cosine", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplanes(dim: int, nplanes: int, seed: int = 7):
    """Deterministic pseudo-random hyperplanes from the shared LCG (centered
    uniforms are fine for sign-LSH)."""
    return [
        [float(((p * 1103515245 + (k + 1) * 12345 + seed) % 2147483648) / 2147483648.0 - 0.5)
         for k in range(dim)]
        for p in range(nplanes)
    ]


def ivf_ann_topk(emb: DataFrame, query_pred, k: int = 5, nlist: int = 8,
                 nprobe: int = 2, iters: int = 3, vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other standard ANN scale
    path next to LSH.

    Build: train a coarse quantizer with Lloyd iterations where ONLY the
    centroids (nlist × dim floats) ever touch the driver — assignment and the
    element-wise mean are distributed (posexplode → groupBy(cluster, pos)).
    Search: each query probes its nprobe nearest centroid lists; candidates
    come from an equi-join on the cluster id; exact cosine rescore; top-k by
    sorted aggregation.  nprobe == nlist degenerates to exact brute force
    (the recall-vs-cost dial), which the tests exploit.

    Centroids live in a BROADCAST DataFrame, not the expression tree:
    assignment is a broadcast cross-join against the nlist centroid rows +
    one map-side-combined ``min_by`` shuffle (n rows).  The former
    implementation inlined every centroid as ``F.lit`` arrays —
    O(nlist·dim) expression nodes, which chokes Catalyst analysis at real
    ANN scale (nlist ≥ 4k) long before the data does.
    """
    spark = emb.sparkSession
    base = with_norm(emb, vec_col).select(
        "vec_id", F.col(vec_col).cast("array<double>").alias("v"), "_norm"
    ).cache()

    def cents_df(cents):
        return F.broadcast(spark.createDataFrame(
            [(i + 1, [float(x) for x in c]) for i, c in enumerate(cents)],
            "cluster int, c array<double>",
        ))

    def sqdist(v):
        return F.aggregate(
            F.zip_with(v, F.col("c"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda s, d: s + d,
        )

    def assign(df, cents):
        # broadcast nlist centroid rows; keep the closest (ties → lowest
        # cluster id, deterministic).  Partial min_by collapses the nlist
        # replicas map-side, so the shuffle is n rows.
        rest = [c for c in df.columns if c != "vec_id"]
        return (
            df.crossJoin(cents_df(cents))
            .withColumn("_d", sqdist(F.col("v")))
            .groupBy("vec_id")
            .agg(F.min_by(
                F.struct(*rest, "cluster"),
                F.struct(F.col("_d"), F.col("cluster")),
            ).alias("_s"))
            .select("vec_id", "_s.*")
        )

    # deterministic init: the nlist lowest vec_ids
    cents = [r.v for r in base.orderBy("vec_id").limit(nlist).collect()]
    for _ in range(iters):
        assigned = assign(base, cents)
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos").agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.transform("pm", lambda s: s["m"]).alias("c"))
            .collect()
        )
        by_cluster = {r.cluster: r.c for r in means}
        cents = [by_cluster.get(i + 1, cents[i]) for i in range(nlist)]

    assigned = assign(base, cents).select("vec_id", "v", "_norm", "cluster")
    queries = (
        assigned.filter(query_pred)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                F.col("_norm").alias("qn"))
        .crossJoin(cents_df(cents))
        .withColumn("_d", sqdist(F.col("qv")))
        .groupBy("query_id")
        .agg(
            F.first("qv").alias("qv"),
            F.first("qn").alias("qn"),
            F.slice(
                F.array_sort(F.collect_list(
                    F.struct(F.col("_d").alias("d"), F.col("cluster").alias("cl")))),
                1, nprobe,
            ).alias("_pr"),
        )
        .withColumn("cluster", F.explode(F.transform("_pr", lambda s: s["cl"])))
        .drop("_pr")
    )
    # training collects are done; release the cache.  The final (lazy) search
    # re-derives base from source — one cheap scan — instead of pinning
    # executor memory for the caller's session lifetime.
    base.unpersist()
    cand = (
        queries.join(assigned, on="cluster")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("_norm")))
    )
    return (
        cand.groupBy("query_id")
        .agg(F.slice(
            F.array_sort(F.collect_list(F.struct((-F.col("cosine")).alias("nc"),
                                                 F.col("vec_id").alias("nid")))),
            1, k,
        ).alias("top"))
        .select("query_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "query_id",
            F.col("t.nid").alias("neighbor_id"),
            (F.col("pos") + 1).cast("bigint").alias("rank"),
            F.round(-F.col("t.nc"), 6).alias("cosine"),
        )
    )


def lsh_ann_topk(emb: DataFrame, query_pred, k: int = 5, nplanes: int = 12,
                 bands: int = 3, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Approximate top-k: sign signature over random hyperplanes, banded into
    buckets; candidates = share ≥1 band bucket with the query; exact cosine
    rescoring + per-query top-k via sorted-aggregation (no global window).

    Approximate recall — exposed as the scale path; correctness gate treats
    it as rows-only."""
    planes = _hyperplanes(dim, nplanes)
    r = nplanes // bands

    def sig_bits(v):
        return [
            F.when(_dot(v, F.array(*[F.lit(x) for x in p])) >= 0, 1).otherwise(0)
            for p in planes
        ]

    def band_cols(v):
        bits = sig_bits(v)
        out = []
        for bnd in range(bands):
            acc = F.lit(0)
            for j in range(r):
                acc = acc * 2 + bits[bnd * r + j]
            out.append(acc)
        return F.array(*out)

    base = with_norm(emb, vec_col).select(
        "vec_id", F.col(vec_col).cast("array<double>").alias("v"), "_norm",
        F.posexplode(band_cols(F.col(vec_col).cast("array<double>"))).alias("band", "bucket"),
    )
    queries = base.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("_norm").alias("qn"), "band", "bucket",
    )
    cand = (
        queries.join(base, on=["band", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "qn", "vec_id", "v", "_norm")
        .withColumn("cosine", _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("_norm")))
    )
    # a candidate sharing several band buckets appears once per bucket; its
    # (cosine, id) struct is bit-identical every time (same deterministic
    # expression), so collect_set dedups inside the aggregation — one shuffle
    # on query_id instead of dropDuplicates + groupBy (two)
    topk = (
        cand.groupBy("query_id")
        .agg(F.slice(
            F.array_sort(F.collect_set(F.struct((-F.col("cosine")).alias("nc"),
                                                F.col("vec_id").alias("nid")))),
            1, k,
        ).alias("top"))
        .select("query_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "query_id",
            F.col("t.nid").alias("neighbor_id"),
            (F.col("pos") + 1).cast("bigint").alias("rank"),
            F.round(-F.col("t.nc"), 6).alias("cosine"),
        )
    )
    return topk
