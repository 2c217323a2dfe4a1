"""Bigram-LM perplexity: differential test vs a pure-Python reference,
external-model backoff, and edge cases."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from ophidia_io_server_spark.pipeline.lm import (
    perplexity_scores,
    train_bigram_model,
)

VOCAB = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast", "big"]


def _corpus(rng, n_docs):
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(0, 25))
        rows.append((i, " ".join(rng.choice(VOCAB, size=n)) if n else ""))
    rows.append((n_docs, None))
    return rows


def _ref_scores(train_rows, score_rows):
    def toks(t):
        return [w for w in t.split(" ") if w] if t is not None else []

    bigs = Counter()
    ctx = Counter()
    vocab = set()
    for _, t in train_rows:
        tk = toks(t)
        vocab.update(tk)
        for a, b in zip(tk, tk[1:]):
            bigs[(a, b)] += 1
            ctx[a] += 1
    v = len(vocab)
    out = {}
    for i, t in score_rows:
        tk = toks(t)
        if len(tk) < 2:
            continue
        lps = [math.log((bigs[(a, b)] + 1) / (ctx[a] + v))
               for a, b in zip(tk, tk[1:])]
        s = 0.0
        for x in lps:        # position order, matching the engine's fold
            s += x
        avg = s / len(lps)
        out[i] = (len(lps), round(avg, 6), round(math.exp(-avg), 6))
    return out


def test_self_trained_matches_reference(spark):
    rng = np.random.default_rng(5)
    rows = _corpus(rng, 80)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["ppl"])
           for r in perplexity_scores(docs).collect()}
    exp = _ref_scores(rows, rows)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert got[i][1] == pytest.approx(exp[i][1], abs=2e-6), f"doc {i}"
        assert got[i][2] == pytest.approx(exp[i][2], abs=2e-5), f"doc {i}"


def test_external_model_backoff(spark):
    train = spark.createDataFrame([(0, "the cat sat")], "doc_id long, text string")
    score_rows = [(1, "the cat"), (2, "dog ran")]   # seen / fully unseen
    score = spark.createDataFrame(score_rows, "doc_id long, text string")
    model = train_bigram_model(train)
    got = {r["doc_id"]: r for r in perplexity_scores(score, model=model).collect()}
    v = 3  # {the, cat, sat}
    assert got[1]["avg_logprob"] == pytest.approx(
        round(math.log((1 + 1) / (1 + v)), 6), abs=2e-6)
    # unseen bigram AND unseen context: floor (0+1)/(0+V)
    assert got[2]["avg_logprob"] == pytest.approx(
        round(math.log(1 / v), 6), abs=2e-6)
    # unseen text scores strictly worse (lower logprob, higher ppl)
    assert got[2]["ppl"] > got[1]["ppl"]


def test_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "single"), (1, ""), (2, None), (3, "two tokens")],
        "doc_id long, text string")
    got = perplexity_scores(docs).collect()
    assert [r["doc_id"] for r in got] == [3]
    assert got[0]["n_bigrams"] == 1


def test_trigram_matches_reference(spark):
    rng = np.random.default_rng(6)
    rows = _corpus(rng, 60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    from ophidia_io_server_spark.pipeline.lm import ngram_perplexity_scores

    def toks(t):
        return [w for w in t.split(" ") if w] if t is not None else []

    ngrams = Counter()
    ctxs = Counter()
    vocab = set()
    for _, t in rows:
        tk = toks(t)
        vocab.update(tk)
        for i in range(len(tk) - 2):
            ngrams[(tk[i], tk[i + 1], tk[i + 2])] += 1
            ctxs[(tk[i], tk[i + 1])] += 1
    v = len(vocab)
    exp = {}
    for i, t in rows:
        tk = toks(t)
        if len(tk) < 3:
            continue
        lps = [math.log((ngrams[(a, b, c)] + 1) / (ctxs[(a, b)] + v))
               for a, b, c in zip(tk, tk[1:], tk[2:])]
        s = 0.0
        for x in lps:
            s += x
        exp[i] = (len(lps), round(s / len(lps), 6))
    got = {r["doc_id"]: (r["n_ngrams"], r["avg_logprob"])
           for r in ngram_perplexity_scores(docs, order=3).collect()}
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert got[i][1] == pytest.approx(exp[i][1], abs=2e-6), f"doc {i}"


def test_ngram_order2_equals_bigram_module(spark):
    rng = np.random.default_rng(7)
    rows = _corpus(rng, 40)
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    from ophidia_io_server_spark.pipeline.lm import ngram_perplexity_scores

    a = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["ppl"])
         for r in perplexity_scores(docs).collect()}
    b = {r["doc_id"]: (r["n_ngrams"], r["avg_logprob"], r["ppl"])
         for r in ngram_perplexity_scores(docs, order=2).collect()}
    assert a == b


def test_stupid_backoff_matches_reference(spark):
    from ophidia_io_server_spark.pipeline.lm import stupid_backoff_scores

    rng = np.random.default_rng(19)
    rows = _corpus(rng, 100)
    train_rows = [(i, t) for i, t in rows if i % 2 == 0]
    score_rows = [(i, t) for i, t in rows if i % 2 == 1]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    score = spark.createDataFrame(score_rows, "doc_id long, text string")

    def toks(t):
        return [w for w in t.split(" ") if w] if t is not None else []

    c3, c2, c1 = Counter(), Counter(), Counter()
    for _, t in train_rows:
        tk = toks(t)
        for g in zip(tk, tk[1:], tk[2:]):
            c3[g] += 1
        for g in zip(tk, tk[1:]):
            c2[g] += 1
        for w in tk:
            c1[w] += 1
    N, V = sum(c1.values()), len(c1)
    a = 0.4
    exp = {}
    for i, t in score_rows:
        tk = toks(t)
        if len(tk) < 3:
            continue
        tot, b2, b1 = 0.0, 0, 0
        ls = []
        for w1, w2, w3 in zip(tk, tk[1:], tk[2:]):
            if (w1, w2, w3) in c3:
                s = c3[(w1, w2, w3)] / c2[(w1, w2)]
            elif (w2, w3) in c2:
                s = a * c2[(w2, w3)] / c1[w2]
                b2 += 1
            else:
                s = a * a * (c1.get(w3, 0) + 1) / (N + V)
                b1 += 1
            ls.append(math.log(s))
        ssum = 0.0
        for x in ls:
            ssum += x
        exp[i] = (len(ls), b2, b1, round(ssum / len(ls), 6))
    got = {r["doc_id"]: (r["n_trigrams"], r["n_backoff2"], r["n_backoff1"],
                         r["avg_logscore"])
           for r in stupid_backoff_scores(train, score).collect()}
    assert set(got) == set(exp)
    n_b2 = sum(v[1] for v in exp.values())
    n_b1 = sum(v[2] for v in exp.values())
    assert n_b2 > 0 and n_b1 >= 0      # held-out half actually backs off
    for i in exp:
        assert got[i][:3] == exp[i][:3], i
        assert got[i][3] == pytest.approx(exp[i][3], abs=2e-6), i


def _ref_kn(train_rows, score_rows):
    """Pure-Python interpolated modified Kneser-Ney bigram reference
    (Chen & Goodman 1998), same clamp/fallback rules as the engine."""
    def toks(t):
        return [w for w in t.split(" ") if w] if t is not None else []

    bigs = Counter()
    vocab = set()
    for _, t in train_rows:
        tk = toks(t)
        vocab.update(tk)
        for a, b in zip(tk, tk[1:]):
            bigs[(a, b)] += 1
    c1 = Counter()
    tn = {}
    nprec = Counter()
    for (a, b), c in bigs.items():
        c1[a] += c
        t1, t2, t3 = tn.get(a, (0, 0, 0))
        tn[a] = (t1 + (c == 1), t2 + (c == 2), t3 + (c >= 3))
        nprec[b] += 1
    n = Counter(bigs.values())
    n1, n2, n3, n4 = n[1], n[2], n[3], n[4]
    T, V = len(bigs), len(vocab)
    y = n1 / (n1 + 2.0 * n2) if (n1 + 2.0 * n2) else None

    def disc(k, nk, nk1):
        raw = (k - (k + 1) * y * nk1 / nk) if (y is not None and nk) else 0.75
        return min(max(raw, 0.0), float(k))

    d1, d2, d3 = disc(1, n1, n2), disc(2, n2, n3), disc(3, n3, n4)
    out = {}
    for i, t in score_rows:
        tk = toks(t)
        if len(tk) < 2:
            continue
        s, n_up, n_uc = 0.0, 0, 0
        cnt = 0
        for a, b in zip(tk, tk[1:]):
            pc = (nprec.get(b, 0) + 1) / (T + V)
            if a in c1:
                c = bigs.get((a, b), 0)
                if c == 0:
                    num, n_up = 0.0, n_up + 1
                elif c == 1:
                    num = c - d1
                elif c == 2:
                    num = c - d2
                else:
                    num = c - d3
                t1, t2, t3 = tn[a]
                gamma = (d1 * t1 + d2 * t2 + d3 * t3) / c1[a]
                p = num / c1[a] + gamma * pc
            else:
                p, n_uc = pc, n_uc + 1
            s += math.log(p)
            cnt += 1
        avg = s / cnt
        out[i] = (cnt, n_up, n_uc, round(avg, 6), round(math.exp(-avg), 6))
    return out


def test_kneser_ney_matches_reference(spark):
    from ophidia_io_server_spark.pipeline.lm import kneser_ney_scores

    rng = np.random.default_rng(13)
    rows = _corpus(rng, 120)
    train = [(i, t) for i, t in rows if i % 2 == 0]
    score = [(i, t) for i, t in rows if i % 2 == 1]
    # an OOV-bearing scoring doc: unseen words AND unseen contexts
    score.append((9001, "zzz qqq the cat zzz"))
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["n_unseen_pair"], r["n_unseen_ctx"],
                         r["avg_logprob"], r["ppl"])
           for r in kneser_ney_scores(tdf, sdf).collect()}
    exp = _ref_kn(train, score)
    assert set(got) == set(exp)
    for i in exp:
        ge, ee = got[i], exp[i]
        assert ge[:3] == ee[:3], f"doc {i}: counters {ge[:3]} vs {ee[:3]}"
        assert abs(ge[3] - ee[3]) <= 1e-6 and abs(ge[4] - ee[4]) <= 1e-5, (
            f"doc {i}: {ge} vs {ee}")
    # discounted mass must be redistributed, not lost: for a seen context,
    # sum over the FULL vocab of P(w2|w1) == 1 within float error
    vocab = sorted({w for _, t in train for w in (t or "").split(" ") if w})
    probe_ctx = "the"
    ref = _ref_kn(train, [(j, f"{probe_ctx} {w}") for j, w in enumerate(vocab)])
    probs = [math.exp(v[3]) for v in ref.values()]  # avg_logprob of 1 bigram = ln P
    assert abs(sum(probs) - 1.0) < 1e-6


def test_ccnet_buckets_contract(spark):
    """Tercile sizes are balanced (differ by ≤1 corpus-wide), every
    scored chunk lands in exactly one bucket, and the result is
    layout-invariant (rank keys are row values, not partitioning)."""
    from ophidia_io_server_spark.pipeline.lm import ccnet_chunk_buckets
    from ophidia_io_server_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = ccnet_chunk_buckets(docs, chunk_tokens=16)
    rows = out.collect()
    heads = sum(r["n_head"] for r in rows)
    mids = sum(r["n_middle"] for r in rows)
    tails = sum(r["n_tail"] for r in rows)
    total = sum(r["n_chunks"] for r in rows)
    assert heads + mids + tails == total
    assert max(heads, mids, tails) - min(heads, mids, tails) <= 1
    rows2 = ccnet_chunk_buckets(docs.repartition(13, "lang"),
                                chunk_tokens=16).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_ccnet_buckets_orders_by_score(spark):
    """A document made of the corpus's most predictable bigram should
    land its chunks in head; a gibberish document lands in tail."""
    common = " ".join(["a b"] * 24)           # high-count bigram
    rare = " ".join(f"zq{i} xw{i}" for i in range(24))
    filler = [(10 + i, "c d " * 8) for i in range(4)]
    df = spark.createDataFrame(
        [(1, common), (2, rare), *filler], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           __import__("ophidia_io_server_spark.pipeline.lm",
                      fromlist=["ccnet_chunk_buckets"])
           .ccnet_chunk_buckets(df, chunk_tokens=16).collect()}
    assert out[1]["n_tail"] == 0          # predictable text is never tail
    assert out[2]["n_head"] == 0          # gibberish is never head
    assert out[2]["n_tail"] == out[2]["n_chunks"]
