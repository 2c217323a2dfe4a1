"""BPE training: full merge-sequence differential vs a pure-Python
Sennrich reference, encoding equivalence, and early-stop behavior."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.bpe import (
    encode_with_merges,
    train_bpe,
    word_freqs,
)

WORDS = ["banana", "bandana", "ananas", "scan", "hash", "shard", "shash",
         "nana", "bans", "sash"]


def _ref_bpe(word_freq: dict[str, int], n_merges: int, min_pair_freq: int = 2):
    """Sennrich et al. 2016, greedy left-to-right, ties → lexicographic."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b), _ = best
        merges.append((a, b))
        new_vocab = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


def _ref_encode(word: str, merges) -> list[str]:
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(17)
    rows = [(i, " ".join(rng.choice(WORDS, size=int(rng.integers(2, 12)))))
            for i in range(60)]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_merge_sequence_matches_reference(spark, corpus):
    rows, docs = corpus
    wf = Counter()
    for _, t in rows:
        wf.update(t.split(" "))
    exp_merges, exp_vocab = _ref_bpe(dict(wf), 15)
    got_merges, got_wf = train_bpe(docs, 15)
    assert got_merges == exp_merges
    # final symbolization of every word type matches
    got_syms = {r["word"]: tuple(r["symbols"]) for r in got_wf.collect()}
    exp_syms = {}
    for sym, f in exp_vocab.items():
        exp_syms["".join(s for s in sym)] = sym
    for w, sym in got_syms.items():
        assert sym == tuple(_ref_encode(w, exp_merges)), w


def test_encode_matches_reference(spark, corpus):
    rows, docs = corpus
    merges, _ = train_bpe(docs, 10)
    sample = spark.createDataFrame([(0, "banana shash scan")],
                                   "doc_id long, text string")
    got = sample.select(
        encode_with_merges(F.col("text"), merges).alias("toks")).collect()[0]["toks"]
    exp = (_ref_encode("banana", merges) + _ref_encode("shash", merges)
           + _ref_encode("scan", merges))
    assert got == exp


def test_early_stop_on_rare_pairs(spark):
    docs = spark.createDataFrame([(0, "ab ab cd")], "doc_id long, text string")
    merges, _ = train_bpe(docs, 50, min_pair_freq=2)
    assert merges == [("a", "b")]       # (c,d) occurs once → stop


def test_word_freqs(spark, corpus):
    rows, docs = corpus
    wf = Counter()
    for _, t in rows:
        wf.update(t.split(" "))
    got = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert got == dict(wf)


def test_arrow_encoder_matches_column_encoder(spark, corpus):
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.bpe import encode_with_merges_arrow

    rows, docs = corpus
    merges, _ = train_bpe(docs, 12)
    sample = spark.createDataFrame(
        [(0, "banana shash scan hash"), (1, None), (2, "  "), (3, "bandana")],
        "doc_id long, text string")
    col_path = {r["doc_id"]: r["t"] for r in sample.select(
        "doc_id", encode_with_merges(F.col("text"), merges).alias("t")).collect()}
    arr_path = {r["doc_id"]: r["t"] for r in sample.select(
        "doc_id", encode_with_merges_arrow("text", merges).alias("t")).collect()}
    assert arr_path[1] is None          # NULL text stays NULL on the arrow path
    assert arr_path[2] == []
    for k in (0, 3):
        assert arr_path[k] == col_path[k], k
    # and across the whole training corpus
    both = docs.select(
        encode_with_merges(F.col("text"), merges).alias("a"),
        encode_with_merges_arrow("text", merges).alias("b"))
    assert both.where(F.col("a") != F.col("b")).count() == 0
