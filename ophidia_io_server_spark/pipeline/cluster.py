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
  object broadcast into the assignment kernel — no shuffle, no
  row-amplifying centroid join.  Three kernels share the same exact
  semantics: the default Arrow int64 kernel (numpy exact integers, no
  per-iteration codegen compile), the JVM expression kernel (pure
  Catalyst, pays a recompile per Lloyd's iteration — kept for the
  no-Python plan guarantee), and a float64 dgemm kernel for large k.
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
  Σ over d dims of (2·n·grid·max|x|)² must stay < 2^63 — with grid=1024,
  d=64, |x| ≤ 0.55 that allows ~3·10⁵ members per EXACT-kernel cluster;
  SemDeDup's k ∝ N discipline keeps cluster sizes constant and far
  below that, and the large-k BLAS kernel (float64 distances) has no
  such bound.
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


def _sq_norm_expr(qv: Column, dim: int) -> Column:
    """Σ qv_i² as plain element_at arithmetic.  Higher-order array
    functions (zip_with/aggregate) evaluate INTERPRETED; an expanded
    per-element sum stays inside whole-stage codegen — measured 4×
    faster on the assignment hot path."""
    terms = [F.element_at(qv, i + 1) * F.element_at(qv, i + 1)
             for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _dot_lit_expr(qv: Column, s: list[int]) -> Column:
    """Σ s_i·qv_i against a literal integer vector — codegen-able."""
    out = F.lit(int(s[0])).cast("bigint") * F.element_at(qv, 1)
    for i in range(1, len(s)):
        out = out + F.lit(int(s[i])).cast("bigint") * F.element_at(qv, i + 1)
    return out


def kmeans_assign(df: DataFrame, centroids: list[tuple[list[int], int]],
                  qv_col: str = "qv") -> DataFrame:
    """Add ``cluster`` = argmin over the broadcast centroid list.

    ``centroids[c] = (s, n)`` with s the exact coordinate sums and n the
    member count.  The exact numerator Σ_i (n·qv_i − s_i)² is computed
    in its expanded form  n²·Σqv² − 2n·(s·qv) + Σs²  so the per-row
    Σqv² term is shared across the k candidates and everything is plain
    codegen arithmetic (identical integer value — int64 arithmetic is
    exact under rearrangement, so the SQL mirror's folded form agrees
    bitwise).  argmin via struct-ordered ``array_min`` — ties break on
    the cluster id (second struct field)."""
    dim = len(centroids[0][0])
    x2 = F.col("_x2")
    cands = F.array(*[
        F.struct(
            ((F.lit(n * n).cast("bigint") * x2
              - F.lit(2 * n).cast("bigint") * _dot_lit_expr(F.col(qv_col), s)
              + F.lit(sum(v * v for v in s)).cast("bigint")).cast("double")
             / F.lit(float(n * n))).alias("d"),
            F.lit(c).cast("bigint").alias("c"))
        for c, (s, n) in enumerate(centroids)])
    return (df.withColumn("_x2", _sq_norm_expr(F.col(qv_col), dim))
            .withColumn("cluster", F.array_min(cands)["c"])
            .drop("_x2"))


def kmeans_assign_exact(df: DataFrame,
                        centroids: list[tuple[list[int], int]],
                        qv_col: str = "qv") -> DataFrame:
    """Arrow-batched EXACT assignment — bit-identical to the JVM
    expression kernel, but with no per-iteration codegen compile.

    Lloyd's rebuilds the plan every iteration with fresh centroids;
    inlining them as JVM literals makes Spark recompile ~2 s of
    generated code per iteration, which dominates at small scale.  Here
    the distance numerator n_c²·Σx² − 2n_c·(x·s_c) + Σs_c² is computed
    in numpy int64 (matmul on int64 is exact — no float accumulation),
    the single division is float64 correctly-rounded, and argmin ties
    break to the lowest index exactly like the struct-ordered
    ``array_min``.  Same int64 overflow budget as the JVM kernel."""
    import numpy as np
    import pandas as pd

    S = np.stack([np.asarray(s, dtype=np.int64) for s, _ in centroids])
    n = np.asarray([c[1] for c in centroids], dtype=np.int64)      # (k,)
    s2 = (S * S).sum(axis=1)                                       # (k,)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields) + ", cluster bigint"

    def part(batches):
        for b in batches:
            if len(b) == 0:
                continue
            X = np.stack(b[qv_col].to_numpy()).astype(np.int64)    # (m, d)
            x2 = (X * X).sum(axis=1)                               # (m,)
            num = (n * n)[None, :] * x2[:, None] \
                - 2 * n[None, :] * (X @ S.T) + s2[None, :]         # int64
            dist = num.astype(np.float64) / (n * n).astype(np.float64)
            out = b.copy()
            out["cluster"] = pd.Series(dist.argmin(axis=1), index=b.index,
                                       dtype="int64")
            yield out

    return df.mapInPandas(part, schema)


def kmeans_assign_blas(df: DataFrame,
                       centroids: list[tuple[list[int], int]],
                       qv_col: str = "qv") -> DataFrame:
    """Large-k assignment kernel: one Arrow-batch matmul argmin against
    the broadcast (k×d) centroid matrix — the same dispatch pattern as
    ``pq.py``'s encoders.  Float64 distances, so near-exact ties may
    break differently from the exact kernel (argmin index, not distance,
    is all downstream consumers read); the gate rows pin the exact
    kernel, large-k production sweeps use this one."""
    import numpy as np
    import pandas as pd

    M = np.stack([np.asarray(s, dtype=np.float64) / n
                  for s, n in centroids])          # (k, d) means
    half_msq = 0.5 * (M * M).sum(axis=1)           # (k,)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields) + ", cluster bigint"

    def part(batches):
        for b in batches:
            if len(b) == 0:
                continue
            X = np.stack(b[qv_col].to_numpy()).astype(np.float64)
            # argmin_c ‖x−m_c‖² == argmin_c (½‖m_c‖² − x·m_c); ties →
            # numpy argmin picks the lowest c, matching the exact kernel
            a = (half_msq[None, :] - X @ M.T).argmin(axis=1)
            out = b.copy()
            out["cluster"] = pd.Series(a, index=b.index, dtype="int64")
            yield out

    return df.mapInPandas(part, schema)


def _assign_update_partials(base: DataFrame,
                            centroids: list[tuple[list[int], int]],
                            kernel: str, qv_col: str = "qv") -> DataFrame:
    """One Arrow pass per Lloyd iteration: assign each batch's vectors to
    their nearest centroid (same exact int64 / blas float64 math as the
    standalone kernels) and emit the batch's PARTIAL per-cluster
    ``(cluster, n, s0..s{d-1})`` sums — k·(d+1) numbers per batch instead
    of the whole assigned corpus.  int64 addition is associative, so the
    final JVM sum of partials is bitwise the old groupBy-over-rows
    update."""
    import numpy as np
    import pandas as pd

    S = np.stack([np.asarray(s, dtype=np.int64) for s, _ in centroids])
    n_arr = np.asarray([c[1] for c in centroids], dtype=np.int64)
    s2 = (S * S).sum(axis=1)
    dim = S.shape[1]
    M = S.astype(np.float64) / n_arr[:, None]
    half_msq = 0.5 * (M * M).sum(axis=1)
    schema = ("cluster bigint, n bigint, "
              + ", ".join(f"s{i} bigint" for i in range(dim)))

    def part(batches):
        for b in batches:
            if len(b) == 0:
                continue
            X = np.stack(b[qv_col].to_numpy()).astype(np.int64)
            if kernel == "blas":
                Xf = X.astype(np.float64)
                a = (half_msq[None, :] - Xf @ M.T).argmin(axis=1)
            else:
                x2 = (X * X).sum(axis=1)
                num = (n_arr * n_arr)[None, :] * x2[:, None] \
                    - 2 * n_arr[None, :] * (X @ S.T) + s2[None, :]
                dist = num.astype(np.float64) \
                    / (n_arr * n_arr).astype(np.float64)
                a = dist.argmin(axis=1)
            rows = []
            for c in np.unique(a):
                m = a == c
                rows.append((int(c), int(m.sum()),
                             *[int(v) for v in X[m].sum(axis=0)]))
            yield pd.DataFrame(
                rows, columns=["cluster", "n", *[f"s{i}" for i in range(dim)]])

    return base.mapInPandas(part, schema)


def kmeans_fit(df: DataFrame, k: int = 10, iters: int = 3,
               grid: int = 1024, vec_col: str = "embedding",
               id_col: str = "vec_id",
               kernel: str = "auto") -> tuple[DataFrame, list]:
    """Integer-grid Lloyd's k-means.  Returns ``(assigned, centroids)``
    where ``assigned`` carries ``id_col, qv, cluster`` (final assignment
    after ``iters`` rounds) and ``centroids`` is the final driver-side
    ``[(s, n)]`` list.

    Init: the k lowest-``id_col`` rows, in id order, are singleton
    centroids (deterministic, data-defined — no RNG state); k is clamped
    to the corpus size (fewer than k vectors → one cluster per vector),
    and an empty corpus raises ValueError.  A cluster that empties keeps
    its previous centroid.

    ``kernel``: "exact" = Arrow int64 kernel (bit-reproducible,
    oracle-gated, any k within the overflow budget); "jvm" = the same
    exact arithmetic as inlined JVM expressions (pays a per-iteration
    codegen recompile — kept for the no-Python plan guarantee); "blas" =
    float64 dgemm argmin (no overflow bound, near-ties may flip);
    "auto" = exact up to k=64, blas above (numpy int64 matmul has no
    BLAS backend — at k=1000 the exact kernel's n·k·d integer products
    run ~5× slower than dgemm; measured in PERF.md r7).
    """
    if kernel == "auto":
        kernel = "exact" if k <= 64 else "blas"
    assign = {"exact": kmeans_assign_exact, "jvm": kmeans_assign,
              "blas": kmeans_assign_blas}[kernel]
    # r13 opt: the quantized-layout pin is LAZY — the seed collect right
    # below is its first action and scans it directly (the lazy-pin
    # safety rule), so the separate eager-checkpoint job is gone; the
    # probe row for `dim` comes from the seed rows instead of a separate
    # first() job (one more driver-blocking job removed per call).
    base = (df.select(F.col(id_col), quantize_vec(F.col(vec_col), grid)
                      .alias("qv"))
            .localCheckpoint(eager=False))  # scanned 2·iters times
    seed = base.orderBy(id_col).limit(k).collect()
    if not seed or seed[0]["qv"] is None:
        raise ValueError("kmeans_fit: input has no vectors")
    dim = len(seed[0]["qv"])
    # a corpus with fewer than k vectors seeds fewer centroids; clamp k so
    # the update loop never indexes past the seed list (r7 ADVICE: the
    # IndexError crash semantic_dedup inherited on small inputs)
    k = min(k, len(seed))
    centroids: list[tuple[list[int], int]] = [
        (list(r["qv"]), 1) for r in seed]

    assigned = None
    for _ in range(iters):
        assigned = assign(base, centroids)
        if kernel == "jvm":
            # the no-Python plan keeps the JVM-expression update
            upd = (assigned.groupBy("cluster")
                   .agg(*[F.sum(F.element_at("qv", i + 1)).alias(f"s{i}")
                          for i in range(dim)],
                        F.count(F.lit(1)).alias("n"))
                   .collect())
        else:
            # fused assign+partial-update: ONE Arrow pass per iteration
            # emits k·(d+1) partial sums PER BATCH instead of shipping the
            # whole assigned corpus back through Arrow for a JVM 64-sum
            # aggregate (int64 addition is associative, so batch-partial
            # then final sums are bitwise the update the groupBy computed;
            # r9: kmeans_fit 2.2 -> ~1.2 s at sf0.1, and the win GROWS
            # with corpus size — the per-iteration transfer drops from
            # O(n·d) to O(batches·k·d))
            upd = (_assign_update_partials(base, centroids, kernel)
                   .groupBy("cluster")
                   .agg(*[F.sum(f"s{i}").alias(f"s{i}") for i in range(dim)],
                        F.sum("n").alias("n"))
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
                   id_col: str = "vec_id", kernel: str = "auto") -> DataFrame:
    """SemDeDup: k-means then within-cluster cosine dedup.  Returns one
    row per vector: ``(id_col, cluster, kept)`` — ``kept`` is false iff
    an earlier-id member of the SAME cluster is cosine-≥τ similar.

    The pair join is an equi-join on the cluster id (never corpus
    all-pairs); its cost is Σ|cluster|², the quantity k-means exists to
    bound.  The cosine predicate runs on its own (coarser) grid so the
    squared terms stay in int64 — see ``cosine_ge_grid``."""
    assigned, _ = kmeans_fit(df, k=k, iters=iters, grid=kmeans_grid,
                             vec_col=vec_col, id_col=id_col, kernel=kernel)
    cq = (assigned
          .join(df.select(F.col(id_col),
                          quantize_vec(F.col(vec_col), cos_grid)
                          .alias("cq")), id_col)
          .select(id_col, "cluster", "cq")
          # lazy (r13): the budget-probe first() below is the pin's first
          # action and scans it directly — one eager-checkpoint job fewer
          .localCheckpoint(eager=False))  # group-by + kept join share this
    # per-cluster exact-int64 Gram tile (the similarity.py "blas"
    # pattern): one shuffle by cluster, then m×m numpy inside the group —
    # a join+filter would evaluate the 64-term predicate interpreted per
    # candidate pair inside the SMJ inner loop (measured 5× slower).
    # Row-block chunking bounds the tile at blk·m int64 entries.
    import numpy as np
    import pandas as pd

    t2 = tau_pct * tau_pct

    # int64 budget for the Gram inequality G²·10⁴ ≥ τ²·‖a‖²·‖b‖²: with
    # ‖·‖² ≤ NSQ_MAX every product stays < 2^63.  numpy int64 overflow is
    # SILENT — an out-of-range embedding (‖x‖ ≫ 1 on this grid) would
    # flip kept/dropped decisions without any error, so the kernel
    # validates the bound and fails loudly instead (r7 ADVICE).
    import math

    nsq_max_budget = math.isqrt((2 ** 63 - 1) // 10000)

    # per-element |q| bound BEFORE squaring: (Q*Q).sum overflows silently
    # if a coordinate is extreme, so bound |q| such that the worst-case
    # squared norm d·q² stays inside the budget.  Checked ONCE per corpus
    # as a vectorized JVM aggregate, not per Gram tile: the per-group
    # np.abs(Q).max() copy cost 25% of the whole operator (r8 verdict #4
    # A/B: 3.3 -> 2.6 s without it) while validating the same uniform
    # bound on the same rows.
    dim_row = cq.select(F.max(F.size("cq")).alias("d"),
                        F.max(F.array_max(F.transform(
                            "cq", lambda x: F.abs(x)))).alias("qmax")).first()
    if dim_row["d"] is not None:
        qmax_budget = math.isqrt(nsq_max_budget // max(dim_row["d"], 1))
        if dim_row["qmax"] is not None and dim_row["qmax"] > qmax_budget:
            raise ValueError(
                f"semantic_dedup: quantized coordinate {dim_row['qmax']} "
                f"exceeds the int64 Gram budget |q| <= {qmax_budget} "
                f"(cos_grid={cos_grid} assumes |embedding| <= ~1; rescale "
                "the vectors or lower cos_grid)")

    def dropped_in_cluster(key, g: pd.DataFrame):
        ids = g[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        Q = np.stack(g["cq"].to_numpy())[order].astype(np.int64)
        nsq = (Q * Q).sum(axis=1)
        m = len(ids)
        drop = np.zeros(m, dtype=bool)
        blk = 1024
        for lo in range(0, m, blk):
            hi = min(lo + blk, m)
            G = Q[lo:hi] @ Q.T                     # int64 exact
            ok = (G > 0) & (G * G * 10000 >= t2 * nsq[lo:hi, None]
                            * nsq[None, :])
            # a (row) must sort before b (col): ids sorted → a idx < b idx
            ok &= (lo + np.arange(hi - lo))[:, None] < np.arange(m)[None, :]
            drop |= ok.any(axis=0)
        return pd.DataFrame({id_col: ids[drop]})

    dropped = (cq.groupBy("cluster")
               .applyInPandas(dropped_in_cluster, f"{id_col} long"))
    return (cq.join(dropped.withColumn("_drop", F.lit(True)),
                    id_col, "left")
            .select(id_col, "cluster",
                    F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept")))
