"""Deterministic sampling/splitting/shuffling (pipeline/sampling.py).

The load-bearing property everywhere: decisions are pure functions of
(seed, key) — identical across reruns and partition layouts — which is what
``df.sample``/``randomSplit`` do NOT guarantee under task retries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.sampling import (
    deterministic_shuffle,
    hash_sample,
    hash_split,
    stratified_sample,
)
from ophidia_io_server_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def test_hash_sample_deterministic_and_layout_independent(docs):
    a = sorted(r.doc_id for r in hash_sample(docs, 0.3).select("doc_id").collect())
    b = sorted(r.doc_id for r in hash_sample(docs, 0.3).select("doc_id").collect())
    c = sorted(r.doc_id for r in
               hash_sample(docs.repartition(7), 0.3).select("doc_id").collect())
    assert a == b == c and a  # same set, regardless of partitioning


def test_hash_sample_rate_and_nesting(docs):
    n = docs.count()
    k30 = hash_sample(docs, 0.3).count()
    assert abs(k30 / n - 0.3) < 0.1
    # monotone nesting: the 10% sample is a subset of the 30% sample
    s10 = {r.doc_id for r in hash_sample(docs, 0.1).select("doc_id").collect()}
    s30 = {r.doc_id for r in hash_sample(docs, 0.3).select("doc_id").collect()}
    assert s10 <= s30
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == n


def test_hash_sample_seed_independence(docs):
    s1 = {r.doc_id for r in hash_sample(docs, 0.5, seed=1).select("doc_id").collect()}
    s2 = {r.doc_id for r in hash_sample(docs, 0.5, seed=2).select("doc_id").collect()}
    assert s1 != s2  # different seeds → different (overlapping) sets


def test_stratified_rates(docs):
    # rebalance by language: downsample the dominant 'en', keep 'zh' whole
    fr = {"en": 0.2, "zh": 1.0}
    out = stratified_sample(docs, fr, strata_col="lang")
    by = {r.lang: r.n for r in
          out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r.lang: r.n for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by.get("zh", 0) == base["zh"]                   # kept whole
    assert 0 < by.get("en", 0) < 0.5 * base["en"]          # downsampled
    for lang in by:                                        # default 0 drops rest
        assert lang in fr


def test_hash_split_disjoint_exhaustive_stable(docs):
    out = hash_split(docs, [0.8, 0.1, 0.1]).select("doc_id", "split")
    rows = {r.doc_id: r.split for r in out.collect()}
    assert set(rows.values()) <= {0, 1, 2}
    assert len(rows) == docs.count()                       # exhaustive, disjoint
    again = {r.doc_id: r.split for r in
             hash_split(docs.repartition(5), [0.8, 0.1, 0.1])
             .select("doc_id", "split").collect()}
    assert rows == again                                   # stable across layouts
    n = len(rows)
    n0 = sum(1 for s in rows.values() if s == 0)
    assert abs(n0 / n - 0.8) < 0.1


def test_deterministic_shuffle_is_stable_permutation(docs):
    ids = [r.doc_id for r in deterministic_shuffle(docs).select("doc_id").collect()]
    ids2 = [r.doc_id for r in
            deterministic_shuffle(docs.repartition(3)).select("doc_id").collect()]
    assert ids == ids2                                     # same order every time
    assert sorted(ids) == sorted(r.doc_id for r in docs.select("doc_id").collect())
    other = [r.doc_id for r in
             deterministic_shuffle(docs, seed=99).select("doc_id").collect()]
    assert other != ids                                    # seed changes the order


def test_sampling_is_narrow_no_shuffle(docs):
    """Samples and splits must fuse into the scan — no exchange in the plan."""
    for df in (hash_sample(docs, 0.5), hash_split(docs, [0.5, 0.5]),
               stratified_sample(docs, {"web": 0.5})):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_validation_errors(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)
    with pytest.raises(ValueError):
        hash_split(docs, [])
    with pytest.raises(ValueError):
        hash_split(docs, [0.0])
    with pytest.raises(ValueError):
        stratified_sample(docs, {"web": -0.1})


# -- token-budget selection --------------------------------------------------


def test_token_budget_semantics(spark):
    from ophidia_io_server_spark.pipeline.sampling import select_token_budget

    rows = [  # (doc_id, n_tokens, quality)
        (1, 100, 0.9), (2, 100, 0.9), (3, 100, 0.7),
        (4, 100, 0.5), (5, 100, 0.5), (6, 100, 0.3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, quality double")
    got = {r["doc_id"]: r["cum_before"]
           for r in select_token_budget(df, 250, "quality", "n_tokens").collect()}
    # order: 1,2 (0.9) then 3 (0.7); cum_before 0,100,200; doc 3 overshoots
    # the 250 budget but started under it; doc 4 (cum 300) excluded
    assert got == {1: 0, 2: 100, 3: 200}
    # boundary INSIDE a tied class: budget 150 → docs 1 and 2 only
    got2 = {r["doc_id"]: r["cum_before"]
            for r in select_token_budget(df, 150, "quality", "n_tokens").collect()}
    assert got2 == {1: 0, 2: 100}
    # zero budget → empty; huge budget → everything with exact global cumsum
    assert select_token_budget(df, 0, "quality", "n_tokens").count() == 0
    all_rows = {r["doc_id"]: r["cum_before"]
                for r in select_token_budget(df, 10**9, "quality", "n_tokens").collect()}
    assert all_rows == {1: 0, 2: 100, 3: 200, 4: 300, 5: 400, 6: 500}


def test_token_budget_layout_independent(spark):
    from ophidia_io_server_spark.pipeline.sampling import select_token_budget

    rows = [(i, 10 + (i % 7), round(((i * 37) % 11) / 10.0, 4)) for i in range(200)]
    df1 = spark.createDataFrame(rows, "doc_id long, n_tokens long, quality double")
    df8 = df1.repartition(8)
    a = sorted(tuple(r) for r in select_token_budget(df1, 900, "quality", "n_tokens").collect())
    b = sorted(tuple(r) for r in select_token_budget(df8, 900, "quality", "n_tokens").collect())
    assert a == b and len(a) > 0


def test_write_training_shards_deterministic(spark, tmp_path):
    import os

    from ophidia_io_server_spark.pipeline.sampling import write_training_shards

    rows = [(i, f"text {i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(df, p1, n_shards=4)
    write_training_shards(df.repartition(13), p2, n_shards=4)
    r1 = spark.read.parquet(p1)
    r2 = spark.read.parquet(p2)
    # same membership per shard regardless of input layout
    a = sorted((r["shard"], r["doc_id"]) for r in r1.collect())
    b = sorted((r["shard"], r["doc_id"]) for r in r2.collect())
    assert a == b and len(a) == 500
    # all shards populated, every row exactly once
    shards = {s for s, _ in a}
    assert shards == {0, 1, 2, 3}
    assert sorted(d for _, d in a) == list(range(500))
    # shard directories exist for independent reading
    assert sorted(d for d in os.listdir(p1) if d.startswith("shard="))
    import pytest as _pt
    with _pt.raises(ValueError):
        write_training_shards(df, str(tmp_path / "c"), n_shards=0)


def test_token_budget_null_quality_ranks_last(spark):
    # regression (r5 review): NULL quality used to truncate the whole
    # selection; it must instead rank last, like ORDER BY ... NULLS LAST
    from ophidia_io_server_spark.pipeline.sampling import select_token_budget

    df = spark.createDataFrame(
        [(1, 100, 0.9), (2, 100, 0.7), (3, 100, None)],
        "doc_id long, n_tokens long, quality double")
    all_rows = {r["doc_id"]: r["cum_before"]
                for r in select_token_budget(df, 10**9, "quality", "n_tokens").collect()}
    assert all_rows == {1: 0, 2: 100, 3: 200}
    # a budget covering only scored rows excludes the NULL row
    scored = {r["doc_id"] for r in select_token_budget(df, 150, "quality", "n_tokens").collect()}
    assert scored == {1, 2}
