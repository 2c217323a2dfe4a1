"""Skew utilities correctness + large-array stress (Arrow batch sanity)."""

import pytest
from pyspark.sql import functions as F

from ophidia_io_server_spark.operators.skew import salted_count_by_key, salted_join
from ophidia_io_server_spark.sources.random_import import random_fragment


def test_salted_join_matches_plain_join(spark):
    # skewed big side: 90% of rows share key 1
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (10, "ten"), (20, "twenty"), (999999, "nomatch")], "k long, v string"
    )
    plain = big.join(small, on="k").groupBy("v").count()
    salted = salted_join(big, small, on="k", salts=8).groupBy("v").count()
    assert {(r.v, r["count"]) for r in salted.collect()} == \
        {(r.v, r["count"]) for r in plain.collect()}


def test_salted_join_outer(spark):
    big = spark.range(0, 100).select((F.col("id") % 3).alias("k"), F.col("id").alias("p"))
    small = spark.createDataFrame([(0, "a"), (7, "b")], "k long, v string")
    plain = big.join(small, on="k", how="left").where(F.col("v").isNull()).count()
    salted = salted_join(big, small, on="k", salts=4, how="left") \
        .where(F.col("v").isNull()).count()
    assert salted == plain


def test_salted_count_by_key(spark):
    df = spark.range(0, 5000).select((F.when(F.col("id") % 100 != 0, 7)
                                      .otherwise(F.col("id"))).alias("k"))
    got = {r.k: r.n for r in salted_count_by_key(df, "k").collect()}
    want = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want


def test_large_array_fragment_stress(spark):
    """64k-element arrays through reductions, fused element-wise chains and a
    pandas-UDF kernel — Arrow batches and codegen must both survive."""
    from ophidia_io_server_spark.operators import IOServer

    srv = IOServer(spark)
    srv.catalog.put("bigarr", random_fragment(spark, 64, 65536, seed=3), cache=False)
    out = srv.execute(
        "operation=select;from=bigarr;"
        "field=id_dim|oph_reduce(oph_mul_scalar(oph_sum_scalar(measure,1),2),'sum')"
        "|oph_size_array(measure)|oph_reduce(oph_accumulate(measure),'last');"
        "select_alias=id_dim|s|n|acc_last;order=id_dim;limit=4"
    ).collect()
    assert len(out) == 4
    for r in out:
        assert r.n == 65536
        # sum of 2*(x+1) over 64k uniforms in [0,1): E≈3n/2... just sanity-band
        assert 2 * 65536 < r.s < 4 * 65536
        # accumulate's last element == plain sum of the array
        assert r.acc_last == pytest.approx((r.s / 2) - 65536, rel=1e-9)


def test_elementwise_agg_exploded_matches_fold(spark):
    """Positional-explode aggregate == collect-and-fold aggregate."""
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.functions.aggregates import elementwise_fold
    from ophidia_io_server_spark.operators.array_agg import elementwise_agg_exploded

    df = random_fragment(spark, 300, 6).withColumn("g", (F.col("id_dim") % 5))
    for op in ("sum", "max", "min", "avg"):
        got = {r.g: r.agg for r in
               elementwise_agg_exploded(df, "g", "measure", op).collect()}
        if op == "avg":
            cnt = F.count(F.lit(1)).cast("double")
            fold = F.transform(elementwise_fold(F.col("measure"), "sum"),
                               lambda x: x / cnt)
        else:
            fold = elementwise_fold(F.col("measure"), op)
        want = {r.g: r.f for r in df.groupBy("g").agg(fold.alias("f")).collect()}
        for g in want:
            assert got[g] == pytest.approx(want[g]), (op, g)


def test_jaccard_doc_freq_cap(spark):
    """max_doc_freq=1.0 == uncapped; a tight cap only removes pairs."""
    from ophidia_io_server_spark.pipeline.dedup import _pairs_from_index, shingle_df
    from ophidia_io_server_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sh = shingle_df(docs).cache()
    base = {(r.doc_a, r.doc_b): r.n_common for r in _pairs_from_index(sh).collect()}
    full = {(r.doc_a, r.doc_b): r.n_common
            for r in _pairs_from_index(sh, max_doc_freq=1.0).collect()}
    assert full == base
    capped = {(r.doc_a, r.doc_b): r.n_common
              for r in _pairs_from_index(sh, max_doc_freq=0.01).collect()}
    assert set(capped) <= set(base)
    assert all(capped[k] <= base[k] for k in capped)
    sh.unpersist()


def test_duplicate_spans_hot_window_skew(spark):
    # one boilerplate 8-token run repeated in EVERY doc (the hot-hash case
    # the groupBy-count path must absorb): counts stay exact, every doc is
    # reported, and the span covers exactly the boilerplate
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.dedup import duplicate_spans

    boiler = " ".join(f"b{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(i, f"u{i}a u{i}b " + boiler + f" u{i}c u{i}d") for i in range(2000)],
        "doc_id long, text string")
    out = duplicate_spans(docs, window=8)
    agg = out.agg(F.count("*").alias("n"), F.sum("dup_tokens").alias("t"),
                  F.max("n_spans").alias("mx")).collect()[0]
    assert agg["n"] == 2000
    assert agg["t"] == 2000 * 8
    assert agg["mx"] == 1


def test_duplicate_spans_randomized_invariants(spark):
    # property sweep: on random corpora the report must satisfy
    # 0 < dup_tokens <= n_tokens, dup_windows >= n_spans, and dup_frac
    # consistent with the two counts
    import random

    from ophidia_io_server_spark.pipeline.dedup import duplicate_spans

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(5, 60)))
             for _ in range(300)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    for r in duplicate_spans(docs, window=5).collect():
        assert 0 < r["dup_tokens"] <= r["n_tokens"]
        assert r["dup_windows"] >= r["n_spans"] >= 1
        assert r["dup_frac"] == round(r["dup_tokens"] / r["n_tokens"], 4)
        # a span is at least one window long
        assert r["dup_tokens"] >= 5
