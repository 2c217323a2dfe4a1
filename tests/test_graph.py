"""PageRank: differential test vs a numpy power-iteration reference
(including dangling-mass redistribution), invariants, layout independence."""

from __future__ import annotations

import numpy as np
import pytest

from ophidia_io_server_spark.operators.graph import pagerank


def _ref_pagerank(n_nodes, edges, iters, d=0.85):
    """edges: list of (src, dst, w) ints. Mirrors the operator's update."""
    outw = np.zeros(n_nodes)
    for s, t, w in edges:
        outw[s] += w
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(iters):
        nxt = np.full(n_nodes, (1 - d) / n_nodes)
        dang = r[outw == 0].sum()
        for s, t, w in edges:
            nxt[t] += d * r[s] * (w / outw[s])
        nxt += d * dang / n_nodes
        r = nxt
    return r


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long, w long")


def test_pagerank_matches_numpy(spark):
    rng = np.random.default_rng(8)
    n = 30
    edges = []
    seen = set()
    for _ in range(150):
        s, t = int(rng.integers(0, n)), int(rng.integers(0, n))
        if (s, t) not in seen:
            seen.add((s, t))
            edges.append((s, t, int(rng.integers(1, 5))))
    # make node 0 dangling: remove its out-edges
    edges = [e for e in edges if e[0] != 0]
    df = _edges_df(spark, edges)
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iters=15, weight_col="w").collect()}
    node_ids = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    remap = {v: i for i, v in enumerate(node_ids)}
    ref = _ref_pagerank(len(node_ids),
                        [(remap[s], remap[t], w) for s, t, w in edges], 15)
    assert set(got) == set(node_ids)
    for v in node_ids:
        assert got[v] == pytest.approx(ref[remap[v]], abs=1e-12), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_exact_fold_equals_sum_and_layout_independent(spark):
    rng = np.random.default_rng(9)
    edges = list({(int(rng.integers(0, 12)), int(rng.integers(0, 12)))
                  for _ in range(60)})
    df = _edges_df(spark, [(s, t, 1) for s, t in edges])
    a = {r["node"]: r["rank"] for r in pagerank(df, iters=8).collect()}
    b = {r["node"]: r["rank"]
         for r in pagerank(df.repartition(7), iters=8, exact_fold=True).collect()}
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_pagerank_authority_ordering(spark):
    # star graph: everyone points at node 0 → node 0 dominates
    df = _edges_df(spark, [(i, 0, 1) for i in range(1, 6)])
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    assert got[0] == max(got.values())
    assert got[0] > 3 * max(v for k, v in got.items() if k != 0)


def test_pagerank_invalid_weights_and_empty(spark):
    # NULL-weight edges are dropped before node derivation: node 0 (whose
    # only edge was invalid) is absent, the remaining graph's ranks are
    # finite and sum to 1 — no NaN poisoning, no leaked rank mass
    df = spark.createDataFrame(
        [(0, 1, None), (1, 2, 1), (2, 1, 1)], "src long, dst long, w long")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iters=10, weight_col="w").collect()}
    assert set(got) == {1, 2}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert all(np.isfinite(v) for v in got.values())
    # fully-empty edges: empty result, no ZeroDivisionError
    empty = spark.createDataFrame([], "src long, dst long, w long")
    assert pagerank(empty, iters=3, weight_col="w").count() == 0


def test_label_propagation_planted_communities(spark):
    """Two dense cliques joined by one weak bridge: LPA must converge each
    clique to a single label and keep the two communities apart; a Python
    replay of the same synchronous rule must agree exactly."""
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.operators.graph import label_propagation

    edges = []
    cliq_a = [f"a{i}" for i in range(6)]
    cliq_b = [f"b{i}" for i in range(6)]
    for grp in (cliq_a, cliq_b):
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                edges.append((grp[i], grp[j], 5))
    edges.append(("a0", "b0", 1))  # weak bridge
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["node"]: r["label"] for r in
           label_propagation(df, iters=8, weight_col="w").collect()}

    # python replay of the identical synchronous deterministic rule
    und = {}
    for s, d, w in edges:
        und.setdefault(d, []).append((s, w))
        und.setdefault(s, []).append((d, w))
    labels = {n: n for n in und}
    for _ in range(8):
        new = {}
        for node, nbrs in und.items():
            score = {}
            for u, w in nbrs:
                score[labels[u]] = score.get(labels[u], 0) + w
            new[node] = min(score, key=lambda l: (-score[l], l))
        labels = new
    assert got == labels
    # community structure: each clique uniform, communities distinct
    assert len({got[n] for n in cliq_a}) == 1
    assert len({got[n] for n in cliq_b}) == 1
    assert {got[n] for n in cliq_a} != {got[n] for n in cliq_b}
