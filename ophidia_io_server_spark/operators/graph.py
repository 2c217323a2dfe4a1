"""Distributed PageRank — the iterative graph-analytics operator beyond the
connected-components pair in ``pipeline/dedup.py`` (authority scoring for
web-graph-style corpus curation, transition analysis over event streams).

Power iteration with damping ``d`` over a weighted directed edge table:

    rank'(v) = (1−d)/n + d·( Σ_{u→v} rank(u)·w(u,v)/outw(u) + dang/n )

where ``dang`` is the rank mass parked on dangling (no-out-edge) nodes,
redistributed uniformly — the standard stochastic-matrix completion, so
ranks keep summing to 1.

Scale shape per iteration: one equi-join (edges ⋈ ranks on src — the rank
side is n rows, the edge side E rows; Spark picks broadcast-hash when
ranks fit, shuffled-hash otherwise) + one groupBy(dst) aggregation; the
dangling mass is a scalar single-row aggregate (broadcast, no driver
round-trip inside the plan).  ``localCheckpoint`` every few rounds keeps
the lineage flat over many iterations — same discipline as the CC loops.

``exact_fold=True`` replaces the ``SUM`` of incoming contributions with a
source-ordered sort-then-left-fold, making every float addition sequence
reproducible across engines (the SQL-oracle gate needs it).  It collects
each node's in-contributions into an array, so it is bounded by max
in-degree — use the default ``SUM`` on hub-heavy graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ophidia_io_server_spark.pin import pinned


def pagerank(
    edges: DataFrame,
    iters: int = 12,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    exact_fold: bool = False,
    checkpoint_every: int = 4,
    round_times: list | None = None,
) -> DataFrame:
    """(node, rank) after ``iters`` damped power iterations; ranks sum to 1
    (up to float error).  Unweighted edges (``weight_col=None``) count 1
    each; parallel edges accumulate weight.

    ``round_times``: pass a list to collect per-iteration wall seconds
    (scale-probe instrumentation).  Timing mode forces a localCheckpoint
    every round so each append measures exactly one power iteration —
    slightly different from the production ``checkpoint_every`` cadence."""
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
                     w.alias("w"))
        # NULL/non-positive weights are dropped BEFORE deriving nodes and
        # out-weights: a src whose edges all carry NULL weight would
        # otherwise count as non-dangling while its p=NULL contributions
        # vanished, leaking rank mass (and weights summing to 0 would make
        # p = w/0 = NaN and poison downstream ranks)
        .where(F.col("w").isNotNull() & (F.col("w") > 0))
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct().localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        # empty (or fully-invalid-weight) edge set: empty result, not a
        # driver-side ZeroDivisionError from the teleport constant
        return nodes.select("node", F.lit(0.0).alias("rank")).limit(0)
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    ep = e.join(outw, on="src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("p")).localCheckpoint()
    dangling = nodes.join(outw.select(F.col("src").alias("node")),
                          on="node", how="left_anti").localCheckpoint()

    import time

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    teleport = (1 - damping) / n
    for i in range(iters):
        t0 = time.monotonic() if round_times is not None else 0.0
        contrib = ep.join(ranks, ep["src"] == ranks["node"]).select(
            "dst", "src", (F.col("rank") * F.col("p")).alias("c"))
        if exact_fold:
            incoming = contrib.groupBy("dst").agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("src", "c"))),
                    F.lit(0.0), lambda a, x: a + x["c"],
                ).alias("m"))
        else:
            incoming = contrib.groupBy("dst").agg(F.sum("c").alias("m"))
        # dangling rank mass (scalar row, broadcast): folded in node order
        # under exact_fold for the same cross-engine-determinism reason
        dr = dangling.join(ranks, on="node")
        if exact_fold:
            dang = dr.agg(F.aggregate(
                F.array_sort(F.collect_list(F.struct("node", "rank"))),
                F.lit(0.0), lambda a, x: a + x["rank"]).alias("dm"))
        else:
            dang = dr.agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        ranks = (
            nodes.join(incoming.withColumnRenamed("dst", "node"),
                       on="node", how="left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (F.lit(teleport)
                 + damping * (F.coalesce(F.col("m"), F.lit(0.0))
                              + F.col("dm") / n)).alias("rank"),
            )
        )
        if round_times is not None:
            ranks = ranks.localCheckpoint()
            round_times.append(time.monotonic() - t0)
        elif (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def label_propagation(
    edges: DataFrame,
    iters: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    round_times: list | None = None,
) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan et al. 2007) with a
    fully deterministic update: each round every node adopts the label
    with the greatest total incident edge weight among its neighbours'
    CURRENT labels, ties broken by the smallest label — (score DESC,
    label ASC) under row_number, so two engines replay the identical
    sequence and the SQL-oracle gate can hash a fixed-iteration run
    (synchronous LPA may oscillate on bipartite structures; the contract
    is "the labelling after exactly ``iters`` rounds", like the
    fixed-iteration PageRank row).

    Edges are treated as UNDIRECTED (each input row votes both ways).
    Integral weights keep the per-label score sums exact in any order —
    pass counts, not floats, when the oracle must match.

    Scale shape per round: one edges ⋈ labels equi-join on the voting
    side + one groupBy(node, label) + one per-node top-1 window — all
    shuffle-bounded by |E|; labels are ``localCheckpoint``-ed per round
    (flat lineage, the repo's iterative-loop discipline).  Returns
    (node, label); a label value is the community id (some member node)."""
    from pyspark.sql import Window

    w = (F.col(weight_col) if weight_col else F.lit(1)).alias("w")
    fwd = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"), w)
    und = fwd.unionByName(
        edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"), w))
    labels = und.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node"))
    import time

    top = Window.partitionBy("node").orderBy(
        F.col("score").desc(), F.col("label").asc())
    for _ in range(iters):
        t0 = time.monotonic() if round_times is not None else 0.0
        scored = (
            und.join(labels.withColumnRenamed("node", "u"), on="u")
            .groupBy(F.col("v").alias("node"), "label")
            .agg(F.sum("w").alias("score"))
        )
        labels = (
            scored.withColumn("_rn", F.row_number().over(top))
            .where(F.col("_rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
        if round_times is not None:
            round_times.append(time.monotonic() - t0)
    return labels


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle counts via degree-ordered orientation — the
    node-iterator++ scheme (Schank & Wagner 2005; Cohen's MapReduce
    formulation, and Suri & Vassilvitskii WWW'11 for the shuffle-volume
    analysis).  Input: undirected edges in any orientation — rows are
    canonicalized, self-loops dropped and duplicates collapsed on entry.

    Why orientation matters at scale: wedges formed at ARBITRARY
    vertices cost Σ deg(v)² — a single hub node of degree 10⁶ yields
    10¹² wedge rows.  Directing every edge from the lower (degree, id)
    endpoint to the higher bounds per-vertex out-degree by O(√m), so the
    wedge join emits O(m^{3/2}) rows worst-case — the optimal exponent —
    and each triangle is generated exactly once (at its lowest-ordered
    vertex).  Plan: two equi-join exchanges (wedge build + closing-edge
    probe) plus one count aggregation; no cartesian stage.

    Returns ``(node, n_triangles)`` for EVERY node of the graph (zeros
    included).
    """
    # The edge list feeds FOUR consumers (degree table, orientation join
    # x2, closing-edge probe).  Without a pin each consumer re-executes
    # the caller's whole upstream (for the token graph: the corpus-wide
    # co-occurrence explode+aggregate — measured 35 parquet scans and
    # ZERO ReusedExchange under AQE).  Edges are vocab²-bounded, far
    # smaller than the corpus that produces them, so materializing once
    # is the scale-correct trade.
    und = pinned(
        edges
        .select(F.least(src, dst).alias("u"),
                F.greatest(src, dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct(),
        "triangle edge list: degree table + orientation joins + closing probe")
    nodes = (und.select(F.col("u").alias("n"))
             .unionAll(und.select(F.col("v").alias("n"))))
    deg = nodes.groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))

    e = (und
         .join(deg.select(F.col("n").alias("u"), F.col("deg").alias("du")), "u")
         .join(deg.select(F.col("n").alias("v"), F.col("deg").alias("dv")), "v"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = pinned(e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ), "oriented edges: reused by both wedge sides — pin the deg joins")

    o1 = oriented.select("a", F.col("b").alias("b1"), F.col("db").alias("db1"))
    o2 = oriented.select("a", F.col("b").alias("b2"), F.col("db").alias("db2"))
    wedges = o1.join(o2, "a").where(
        (F.col("db1") < F.col("db2")) |
        ((F.col("db1") == F.col("db2")) & (F.col("b1") < F.col("b2"))))
    closing = und.select(F.least("u", "v").alias("cu"),
                         F.greatest("u", "v").alias("cv"))
    tri = wedges.join(
        closing,
        (F.least("b1", "b2") == F.col("cu"))
        & (F.greatest("b1", "b2") == F.col("cv")))

    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b1").alias("node")))
        .unionAll(tri.select(F.col("b2").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (deg.select(F.col("n").alias("node"))
            .join(per_node, "node", "left")
            .select("node", F.coalesce("n_triangles", F.lit(0))
                    .cast("bigint").alias("n_triangles")))


def kcore(edges: DataFrame, k: int, rounds: int = 12,
          src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """k-core by synchronous peeling, EXACTLY ``rounds`` rounds: each
    round keeps the vertices with ≥ k neighbours inside the current
    survivor set (Seidman 1983 degeneracy peeling; synchronous variant
    so the round sequence is engine-reproducible).  Like the
    fixed-iteration PageRank/LPA rows, the contract is "the survivor set
    after exactly ``rounds`` rounds" — a well-defined quantity whether
    or not the peel has converged — plus a ``converged`` boolean
    (round R removed nothing), which certifies the set IS the k-core
    when true.

    Returns (node, core_degree, converged): degree counted within the
    final set.  Edges are undirected, de-duplicated, self-loops dropped.

    Scale shape per round: two semi-join-shaped equi-joins of the pinned
    edge list against the (shrinking) survivor set + one groupBy —
    all shuffle-bounded by |E|; survivors are localCheckpoint-ed per
    round (the repo's iterative-loop discipline — without the pin every
    round would replay the whole prior chain)."""
    if k < 1 or rounds < 1:
        raise ValueError(f"k and rounds must be >= 1, got k={k}, rounds={rounds}")
    from ophidia_io_server_spark.pin import pinned

    fwd = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    und = (fwd.unionByName(fwd.select(F.col("v").alias("u"),
                                      F.col("u").alias("v")))
           .where(F.col("u") != F.col("v")).distinct())
    und = pinned(und, f"kcore edge list: reused {rounds} rounds")
    vs = und.select(F.col("u").alias("node")).distinct()
    # Early fixpoint exit (r13 opt): the peel only ever REMOVES vertices,
    # so round counts are strictly decreasing until the fixpoint; once a
    # round removes nothing every later round is bitwise identical
    # (next = f(current), f(fix) = fix).  Tracking the per-round count is
    # ~free — the count action just rides the materialization the lazy
    # pin was deferring to the next round anyway — and rounds j..R are
    # skipped whenever the peel converges at round j, at ANY scale.  The
    # ``converged`` certificate keeps its exact meaning: "round R removed
    # nothing" == the last executed round removed nothing.
    prev_cnt = vs.count()
    converged = False
    for i in range(rounds):
        deg = (und
               .join(vs.withColumnRenamed("node", "u"), "u")
               .join(vs.withColumnRenamed("node", "v"), "v")
               .groupBy("u").agg(F.count(F.lit(1)).alias("deg")))
        vs = pinned(deg.where(F.col("deg") >= k)
                    .select(F.col("u").alias("node")),
                    f"kcore survivors round {i + 1}")
        cnt = vs.count()
        if cnt == prev_cnt:
            converged = True
            break
        prev_cnt = cnt
    final_deg = (und
                 .join(vs.withColumnRenamed("node", "u"), "u")
                 .join(vs.withColumnRenamed("node", "v"), "v")
                 .groupBy(F.col("u").alias("node"))
                 .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree")))
    return final_deg.withColumn("converged", F.lit(converged))
