"""Distributed k-means (Lloyd's) and SemDeDup-style semantic dedup.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") prunes semantically redundant
training documents: cluster the embedding space with k-means, then inside
each cluster drop every vector whose cosine similarity to an
earlier-ordered cluster member exceeds a threshold.  Clustering first is
what makes the pair search tractable — the quadratic term is
Σ|cluster|², bounded by choosing k ∝ N so cluster sizes stay roughly
constant as the corpus grows.

Spark shape at 100 TB:

* **Assignment is map-only.**  The k centroids are a k·d-sized driver
  object broadcast into JVM expressions — each row computes its k
  distances with ``zip_with``/``aggregate`` array arithmetic inside
  whole-stage codegen (no Python, no shuffle) and takes the argmin via
  struct-ordered ``array_min``.
* **The update step is one partial-aggregatable groupBy per iteration.**
  ``groupBy(cluster).agg(sum(qv[i])…, count)`` emits d+1 aggregate
  columns — map-side combine reduces every partition to ≤k rows before
  the exchange, and only k·(d+1) numbers ever reach the driver.  No
  ``posexplode`` row amplification, no driver-side data pass.
* **Exactness by integer grid.**  Coordinates are quantized once to an
  integer grid (``floor(x·grid + 0.5)``); centroids are kept as exact
  integer ``(Σqv, n)`` pairs and distances compared as
  ``double(Σ(n·x − s)²) / double(n²)`` — every intermediate is an exact
  int64, and the single division is IEEE correctly-rounded, so the
  iteration is bit-reproducible across engines, partitionings and
  retries (the property the DuckDB oracle gate binds).  Overflow bound:
  Σ over d dims of (2·n·grid)² must stay < 2^63 — with grid=1024, d=64
  that allows ~3.7e8 members per cluster; SemDeDup's k ∝ N keeps real
  cluster sizes far below that.
* **Ties** (two centroids at exactly equal distance) break toward the
  smaller cluster id — pinned identically in the SQL mirror.

Reference parity: the reference engine has no clustering surface; this
module is part of the beyond-reference LLM-curation mandate (SURVEY.md
§2 "training-data pipeline" block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_vec(vec_col: Column, grid: int) -> Column:
    """``array<bigint>`` integer-grid quantization: floor(x·grid + 0.5).

    The double multiply is correctly rounded and floor is exact, so the
    grid cell is deterministic across engines (unlike ROUND, whose
    half-way rule differs between Spark HALF_UP and banker's rounding).
    """
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * float(grid) + 0.5)
        .cast("bigint"))


def _dist_expr(qv: Column, s: list[int], n: int) -> Column:
    """Exact squared L2 distance to centroid (Σs/n) on the common
    denominator: double(Σ_i (n·qv_i − s_i)²) / double(n²)."""
    arr = F.array(*[F.lit(int(v)).cast("bigint") for v in s])
    num = F.aggregate(
        F.zip_with(qv, arr,
                   lambda x, c: (F.lit(n).cast("bigint") * x - c)
                   * (F.lit(n).cast("bigint") * x - c)),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    return num.cast("double") / F.lit(float(n * n))


def kmeans_assign(df: DataFrame, centroids: list[tuple[list[int], int]],
                  qv_col: str = "qv") -> DataFrame:
    """Add ``cluster`` = argmin over the broadcast centroid list.

    ``centroids[c] = (s, n)`` with s the exact coordinate sums and n the
    member count.  argmin via struct-ordered ``array_min`` — ties break
    on the cluster id (second struct field)."""
    cands = F.array(*[
        F.struct(_dist_expr(F.col(qv_col), s, n).alias("d"),
                 F.lit(c).cast("bigint").alias("c"))
        for c, (s, n) in enumerate(centroids)])
    return df.withColumn("cluster", F.array_min(cands)["c"])


def kmeans_fit(df: DataFrame, k: int = 10, iters: int = 3,
               grid: int = 1024, vec_col: str = "embedding",
               id_col: str = "vec_id") -> tuple[DataFrame, list]:
    """Integer-grid Lloyd's k-means.  Returns ``(assigned, centroids)``
    where ``assigned`` carries ``id_col, qv, cluster`` (final assignment
    after ``iters`` rounds) and ``centroids`` is the final driver-side
    ``[(s, n)]`` list.

    Init: the k lowest-``id_col`` rows, in id order, are singleton
    centroids (deterministic, data-defined — no RNG state).  A cluster
    that empties keeps its previous centroid.
    """
    dim = len(df.select(vec_col).first()[0])
    base = (df.select(F.col(id_col), quantize_vec(F.col(vec_col), grid)
                      .alias("qv"))
            .localCheckpoint())  # pin the quantized layout; scanned 2·iters times
    seed = base.orderBy(id_col).limit(k).collect()
    centroids: list[tuple[list[int], int]] = [
        (list(r["qv"]), 1) for r in seed]

    assigned = None
    for _ in range(iters):
        assigned = kmeans_assign(base, centroids)
        upd = (assigned.groupBy("cluster")
               .agg(*[F.sum(F.element_at("qv", i + 1)).alias(f"s{i}")
                      for i in range(dim)],
                    F.count(F.lit(1)).alias("n"))
               .collect())
        new = {int(r["cluster"]): ([int(r[f"s{i}"]) for i in range(dim)],
                                   int(r["n"])) for r in upd}
        centroids = [new.get(c, centroids[c]) for c in range(k)]
    return assigned, centroids


def cosine_ge_grid(qa: Column, qb: Column, tau_pct: int) -> Column:
    """Exact integer predicate  cos(a, b) ≥ tau_pct/100  on quantized
    vectors:  dot > 0  AND  dot²·10000 ≥ tau²·‖a‖²·‖b‖².  With grid 256
    and d = 64 every product stays < 2^63 (dot ≤ d·grid² = 2^22)."""
    dot = F.aggregate(F.zip_with(qa, qb, lambda x, y: x * y),
                      F.lit(0).cast("bigint"), lambda a, v: a + v)
    nsq = lambda q: F.aggregate(  # noqa: E731
        F.transform(q, lambda x: x * x),
        F.lit(0).cast("bigint"), lambda a, v: a + v)
    return (dot > 0) & (dot * dot * F.lit(10000).cast("bigint")
                        >= F.lit(tau_pct * tau_pct).cast("bigint")
                        * nsq(qa) * nsq(qb))


def semantic_dedup(df: DataFrame, k: int = 10, iters: int = 3,
                   tau_pct: int = 40, kmeans_grid: int = 1024,
                   cos_grid: int = 256, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """SemDeDup: k-means then within-cluster cosine dedup.  Returns one
    row per vector: ``(id_col, cluster, kept)`` — ``kept`` is false iff
    an earlier-id member of the SAME cluster is cosine-≥τ similar.

    The pair join is an equi-join on the cluster id (never corpus
    all-pairs); its cost is Σ|cluster|², the quantity k-means exists to
    bound.  The cosine predicate runs on its own (coarser) grid so the
    squared terms stay in int64 — see ``cosine_ge_grid``."""
    assigned, _ = kmeans_fit(df, k=k, iters=iters, grid=kmeans_grid,
                             vec_col=vec_col, id_col=id_col)
    cq = (assigned
          .join(df.select(F.col(id_col),
                          quantize_vec(F.col(vec_col), cos_grid)
                          .alias("cq")), id_col)
          .select(id_col, "cluster", "cq")
          .localCheckpoint())  # both join sides below read this layout
    a = cq.select(F.col(id_col).alias("a_id"), "cluster",
                  F.col("cq").alias("a_cq"))
    b = cq.select(F.col(id_col).alias("b_id"), "cluster",
                  F.col("cq").alias("b_cq"))
    dropped = (a.join(b, "cluster")
               .where((F.col("a_id") < F.col("b_id"))
                      & cosine_ge_grid(F.col("a_cq"), F.col("b_cq"),
                                       tau_pct))
               .select(F.col("b_id").alias(id_col)).distinct())
    return (cq.join(dropped.withColumn("_drop", F.lit(True)),
                    id_col, "left")
            .select(id_col, "cluster",
                    F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept")))
