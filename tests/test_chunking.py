"""Sliding-window chunking: differential test vs a pure-Python reference
over randomized sizes, plus invariants (coverage, overlap, no dup-suffix)."""

from __future__ import annotations

import numpy as np
import pytest

from ophidia_io_server_spark.pipeline.chunking import chunk_sliding


def _ref_chunks(tokens, window, stride):
    n = len(tokens)
    if n == 0:
        return []
    last = 0 if n <= window else ((n - window + stride - 1) // stride) * stride
    out = []
    for idx, start in enumerate(range(0, last + 1, stride)):
        ck = tokens[start:start + window]
        out.append((idx, start, len(ck), " ".join(ck)))
    return out


@pytest.mark.parametrize("window,stride", [(8, 8), (8, 6), (5, 2), (64, 48)])
def test_chunks_match_reference(spark, window, stride):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        n = int(rng.integers(0, 40))
        rows.append((i, " ".join(f"w{rng.integers(0, 99)}" for _ in range(n))))
    rows.append((60, None))
    rows.append((61, "   "))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_sliding(docs, window=window, stride=stride).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"]))
    for i, text in rows:
        toks = [] if text is None else [w for w in text.split(" ") if w]
        exp = _ref_chunks(toks, window, stride)
        assert sorted(got.get(i, [])) == exp, f"doc {i}"


def test_chunk_invariants(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(f"t{j}" for j in range(100)))], "doc_id long, text string")
    ck = sorted(
        (r["chunk_start"], r["n_chunk_tokens"]) for r in
        chunk_sliding(docs, window=16, stride=12).collect())
    # coverage: consecutive windows tile the stream with window-stride overlap
    assert ck[0][0] == 0
    for (s0, n0), (s1, _) in zip(ck, ck[1:]):
        assert s1 - s0 == 12
        assert s0 + n0 > s1          # true overlap, no gaps
    last_start, last_n = ck[-1]
    assert last_start + last_n == 100   # reaches the end exactly
    # every full window is exactly `window` long
    assert all(n == 16 for _, n in ck[:-1])


def test_chunk_validation(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="positive"):
        chunk_sliding(docs, window=0)
    with pytest.raises(ValueError, match="skip"):
        chunk_sliding(docs, window=4, stride=5)
