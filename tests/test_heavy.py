"""Heavy hitters: MG guarantee property on adversarial layouts, exact-count
verification vs a Python Counter, and top-N correctness."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from ophidia_io_server_spark.pipeline.heavy import (
    heavy_hitter_candidates,
    heavy_hitters,
)


def _items_df(spark, items, parts=8):
    return spark.createDataFrame([(i,) for i in items], "tok string") \
        .repartition(parts)


def test_candidates_contain_all_above_threshold(spark):
    rng = np.random.default_rng(12)
    # zipf-ish: few frequent heads, long uniform tail
    heads = [f"head{j}" for j in range(5)]
    items = []
    for j, h in enumerate(heads):
        items += [h] * (4000 // (j + 1))
    items += [f"tail{int(x)}" for x in rng.integers(0, 5000, 6000)]
    rng.shuffle(items)
    n, k = len(items), 64
    exact = Counter(items)
    for parts in (1, 8, 32):
        cand = {r["item"] for r in
                heavy_hitter_candidates(_items_df(spark, items, parts),
                                        "tok", k).collect()}
        for it, c in exact.items():
            if c > n / (k + 1):
                assert it in cand, (it, c, parts)


def test_exact_counts_and_topn(spark):
    items = ["a"] * 100 + ["b"] * 80 + ["c"] * 60 + ["d"] * 40 + \
        [f"x{i}" for i in range(50)]
    df = _items_df(spark, items)
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "tok", k=16).collect()}
    exact = Counter(items)
    for it, c in got.items():
        assert c == exact[it], it          # counts are EXACT, never estimates
    top = heavy_hitters(df, "tok", k=16, top_n=3).collect()
    assert [(r["item"], r["cnt"]) for r in top] == [("a", 100), ("b", 80), ("c", 60)]


def test_nulls_ignored(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], "tok string")
    got = heavy_hitters(df, "tok", k=4).collect()
    assert [(r["item"], r["cnt"]) for r in got] == [("a", 2)]


def test_non_string_items(spark):
    df = spark.createDataFrame([(7,)] * 30 + [(9,)] * 5 + [(i,) for i in range(20)],
                               "v long")
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "v", k=8).collect()}
    assert got[7] == 31          # 30 + the range(20) occurrence of 7
    assert isinstance(list(got)[0], int)
