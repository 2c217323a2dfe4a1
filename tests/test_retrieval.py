"""BM25 retrieval: differential test against a pure-Python reference
implementation, determinism/tie-break pins, and edge cases."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ophidia_io_server_spark.pipeline.retrieval import bm25_scores, bm25_topk

VOCAB = ["hash", "join", "scan", "merge", "sort", "agg", "row", "batch",
         "key", "value", "table", "part", "fast", "slow"]


def _corpus(rng, n_docs: int):
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(3, 40))
        words = rng.choice(VOCAB, size=n)
        rows.append((i, " ".join(words)))
    return rows


def _bm25_reference(rows, terms, k1=1.2, b=0.75):
    """Straight-from-the-formula reference (sorted-term summation order)."""
    toks = {i: t.lower().split() for i, t in rows if t is not None}
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in sorted(terms):
            tf = tk.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if s > 0.0:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_reference(spark):
    rng = np.random.default_rng(3)
    rows = _corpus(rng, 200)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["hash", "merge", "scan"]
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, terms).collect()}
    exp = _bm25_reference(rows, terms)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=2e-6), f"doc {i}"


def test_bm25_topk_rank_and_tiebreak(spark):
    # identical docs → identical scores → rank breaks on doc_id ascending
    docs = spark.createDataFrame(
        [(9, "hash join"), (2, "hash join"), (5, "hash join"), (1, "sort agg")],
        "doc_id long, text string")
    top = bm25_topk(docs, ["hash"], k=10).collect()
    assert [r["doc_id"] for r in top] == [2, 5, 9]
    assert [r["rank"] for r in top] == [1, 2, 3]
    assert len({r["score"] for r in top}) == 1


def test_bm25_edges(spark):
    docs = spark.createDataFrame(
        [(0, "hash hash hash"), (1, None), (2, "   "), (3, "join")],
        "doc_id long, text string")
    got = bm25_scores(docs, ["HASH"]).collect()   # query case-folds
    assert [r["doc_id"] for r in got] == [0]
    assert got[0]["score"] > 0
    # no term present anywhere → empty result, not an error
    assert bm25_scores(docs, ["absent"]).count() == 0
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_bm25_topk_plan_is_take_ordered(spark):
    docs = spark.createDataFrame([(i, "hash join") for i in range(50)],
                                 "doc_id long, text string")
    plan = bm25_topk(docs, ["hash"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
