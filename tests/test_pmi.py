"""PMI co-occurrence: differential vs a Python reference."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from ophidia_io_server_spark.pipeline.text import cooccurrence_pmi

VOCAB = ["hot", "dog", "ice", "cream", "data", "base", "lake", "house"]


def _ref(rows, window=2, min_count=5):
    c12, c1 = Counter(), Counter()
    for _, t in rows:
        tk = [w for w in t.split(" ") if w]
        c1.update(tk)
        for i in range(len(tk)):
            for d in range(1, window + 1):
                if i + d < len(tk):
                    a, b = sorted((tk[i], tk[i + d]))
                    c12[(a, b)] += 1
    P, N = sum(c12.values()), sum(c1.values())
    out = {}
    for (a, b), c in c12.items():
        if c >= min_count:
            out[(a, b)] = (c, round(math.log(c / P / (c1[a] / N) / (c1[b] / N)), 6))
    return out


def test_pmi_matches_reference(spark):
    rng = np.random.default_rng(31)
    rows = []
    for i in range(80):
        n = int(rng.integers(2, 30))
        words = []
        for _ in range(n):
            # correlated pairs: "hot dog" / "ice cream" show up adjacent
            if rng.random() < 0.3:
                words += ["hot", "dog"] if rng.random() < 0.5 else ["ice", "cream"]
            else:
                words.append(str(rng.choice(VOCAB)))
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["wa"], r["wb"]): (r["c12"], r["pmi"])
           for r in cooccurrence_pmi(docs).collect()}
    exp = _ref(rows)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], k
        assert got[k][1] == pytest.approx(exp[k][1], abs=2e-6), k
    # the planted collocations have strongly positive PMI
    assert got[("dog", "hot")][1] > 0.3
    assert got[("cream", "ice")][1] > 0.3
