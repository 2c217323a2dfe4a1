"""Heavy hitters: MG guarantee property on adversarial layouts, exact-count
verification vs a Python Counter, and top-N correctness."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

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


def test_weighted_counts_path(spark):
    """r13 wave 5: heavy_hitters(counts=...) routes the MG candidate pass
    over the pre-aggregated (item, cnt) table (weighted MG, |items| rows
    across the Python boundary).  The weighted summary keeps the n/(k+1)
    survivor guarantee over the same multiset, so the exact-verified
    top-N equals the raw-stream path's whenever the N-th count clears
    the threshold — pinned here on an adversarial layout."""
    rng = np.random.default_rng(31)
    items = (["a"] * 400 + ["b"] * 300 + ["c"] * 200 + ["d"] * 150
             + [f"t{int(x)}" for x in rng.integers(0, 800, 2000)])
    rng.shuffle(items)
    df = _items_df(spark, items, parts=16)
    counts = df.groupBy(F.col("tok").alias("item")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"))
    for parts in (1, 4, 32):
        raw = heavy_hitters(df, "tok", k=64, top_n=4).collect()
        wtd = heavy_hitters(df, "tok", k=64, top_n=4,
                            counts=counts.repartition(parts)).collect()
        assert [tuple(r) for r in raw] == [tuple(r) for r in wtd]
    # candidate superset property holds on the weighted path too
    n, k = len(items), 64
    exact = Counter(items)
    cand = {r["item"] for r in heavy_hitter_candidates(
        counts.repartition(8), "item", k, weight_col="cnt").collect()}
    for it, c in exact.items():
        if c > n / (k + 1):
            assert it in cand, (it, c)


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


# --- Count-Min sketch ------------------------------------------------------

def test_countmin_est_ge_exact_for_every_item(spark):
    from ophidia_io_server_spark.pipeline.heavy import (
        countmin_build,
        countmin_estimate,
    )

    rng = np.random.default_rng(5)
    items = [f"w{int(x)}" for x in rng.zipf(1.4, 3000) if x < 500]
    df = _items_df(spark, items)
    sketch = countmin_build(df, "tok", depth=4, width=64, seed=3)
    # tiny width on purpose: collisions guaranteed, one-sidedness must hold
    est = {r["item"]: r["est"]
           for r in countmin_estimate(sketch, df, "tok", depth=4, width=64,
                                      seed=3).collect()}
    exact = Counter(items)
    assert set(est) == set(exact)
    for it, c in exact.items():
        assert est[it] >= c, (it, est[it], c)
    # sketch size is bounded by depth*width regardless of vocabulary
    assert sketch.count() <= 4 * 64
    # total mass per row == stream length
    row0 = sketch.where("r = 0").agg({"cnt": "sum"}).collect()[0][0]
    assert row0 == len(items)


def test_countmin_shard_merge_equals_full_build(spark):
    """CMS counters are mergeable: build per shard, sum counters, get the
    full-corpus sketch bit-for-bit (the federated/streaming property)."""
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.heavy import countmin_build

    items = [f"a{i % 17}" for i in range(400)] + [f"b{i % 5}" for i in range(100)]
    df = _items_df(spark, items)
    full = countmin_build(df, "tok", depth=3, width=32, seed=9)
    sh1 = countmin_build(df.where(F.crc32("tok") % 2 == 0), "tok",
                         depth=3, width=32, seed=9)
    sh2 = countmin_build(df.where(F.crc32("tok") % 2 == 1), "tok",
                         depth=3, width=32, seed=9)
    merged = (sh1.unionByName(sh2).groupBy("r", "pos")
              .agg(F.sum("cnt").cast("bigint").alias("cnt")))
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_countmin_estimate_unseen_item_zero_or_collision(spark):
    from ophidia_io_server_spark.pipeline.heavy import (
        countmin_build,
        countmin_estimate,
    )

    df = _items_df(spark, ["x"] * 10)
    sketch = countmin_build(df, "tok", depth=4, width=1024, seed=1)
    q = spark.createDataFrame([("never-seen",)], "tok string")
    est = countmin_estimate(sketch, q, "tok", depth=4, width=1024,
                            seed=1).collect()
    # with one distinct item in 1024 buckets the probe almost surely finds
    # an empty counter; at minimum the estimate is bounded by the stream
    assert est[0]["est"] in (0, 10)


def test_countmin_inner_product_bounds_join_size(spark):
    """est >= exact unconditionally; est == exact when the width is large
    enough that no two keys collide in any row (collision mass ~ 0)."""
    from ophidia_io_server_spark.pipeline.heavy import (
        countmin_build,
        countmin_inner_product,
    )

    a = spark.createDataFrame([(k,) for k in [1, 1, 2, 3, 3, 3]], "k long")
    b = spark.createDataFrame([(k,) for k in [1, 2, 2, 3, 4]], "k long")
    exact = a.join(b, on="k").count()  # 2*1 + 1*2 + 3*1 = 7
    assert exact == 7
    ska = countmin_build(a, "k", depth=5, width=4096, seed=3)
    skb = countmin_build(b, "k", depth=5, width=4096, seed=3)
    est = countmin_inner_product(ska, skb).collect()[0]["est"]
    assert est >= exact
    # 4 distinct keys in 4096 buckets x 5 rows: min over rows is exact
    assert est == exact


def test_countmin_inner_product_merged_shards(spark):
    """Sketches built per shard and counter-summed give the same inner
    product as the full-corpus sketch (the mergeable-statistics path)."""
    from ophidia_io_server_spark.pipeline.heavy import (
        countmin_build,
        countmin_inner_product,
    )

    rows = [(k % 17,) for k in range(200)]
    a = spark.createDataFrame(rows, "k long")
    b = spark.createDataFrame(rows[::3], "k long")
    full = countmin_build(a, "k", depth=4, width=512, seed=5)
    sh = (countmin_build(a.where(F.col("k") < 9), "k", depth=4, width=512,
                         seed=5)
          .unionByName(countmin_build(a.where(F.col("k") >= 9), "k",
                                      depth=4, width=512, seed=5))
          .groupBy("r", "pos").agg(F.sum("cnt").cast("bigint").alias("cnt")))
    skb = countmin_build(b, "k", depth=4, width=512, seed=5)
    e1 = countmin_inner_product(full, skb).collect()[0]["est"]
    e2 = countmin_inner_product(sh, skb).collect()[0]["est"]
    assert e1 == e2 >= a.join(b, on="k").count()
