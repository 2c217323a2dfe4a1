"""Temperature source mixing: weight math vs a Python reference, rate
caps, layout independence, and flattening behavior across alpha."""

from __future__ import annotations

import numpy as np
import pytest

from ophidia_io_server_spark.pipeline.mixing import (
    source_mixing_plan,
    temperature_sample,
)


def _docs(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for s, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, s, f"text {i}"))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_plan_matches_reference(spark):
    sizes = {"web": 800, "books": 150, "code": 50}
    docs = _docs(spark, sizes)
    alpha, frac = 0.7, 0.5
    plan = {r["source"]: r for r in
            source_mixing_plan(docs, alpha, frac).collect()}
    denom = sum(n ** alpha for _, n in sorted(sizes.items()))
    n_total = sum(sizes.values())
    for s, n in sizes.items():
        w = n ** alpha / denom
        assert plan[s]["n_docs"] == n
        assert plan[s]["weight"] == pytest.approx(round(w, 6), abs=1e-6)
        assert plan[s]["target_rate"] == pytest.approx(
            round(min(1.0, w * n_total * frac / n), 6), abs=1e-6)


def test_alpha_flattens_and_caps(spark):
    sizes = {"big": 1000, "tiny": 20}
    docs = _docs(spark, sizes)
    # α=1: natural proportions — every source rate equals target_fraction
    p1 = {r["source"]: r["target_rate"]
          for r in source_mixing_plan(docs, 1.0, 0.5).collect()}
    assert p1["big"] == pytest.approx(0.5, abs=1e-6)
    assert p1["tiny"] == pytest.approx(0.5, abs=1e-6)
    # α→0: equal weights — the tiny source caps at rate 1
    p0 = {r["source"]: r["target_rate"]
          for r in source_mixing_plan(docs, 0.0, 0.5).collect()}
    assert p0["tiny"] == 1.0
    assert p0["big"] < 0.5


def test_sample_is_deterministic_and_rate_true(spark):
    sizes = {"web": 2000, "books": 500}
    docs = _docs(spark, sizes)
    a = temperature_sample(docs, 0.7, 0.5, seed=3)
    ids1 = sorted(r["doc_id"] for r in a.collect())
    ids2 = sorted(r["doc_id"] for r in
                  temperature_sample(docs.repartition(7), 0.7, 0.5, seed=3).collect())
    assert ids1 == ids2                       # layout-independent
    assert a.columns == docs.columns          # schema passthrough
    plan = {r["source"]: r["target_rate"]
            for r in source_mixing_plan(docs, 0.7, 0.5).collect()}
    got = {r["source"]: r["cnt"] for r in
           a.groupBy("source").count().withColumnRenamed("count", "cnt").collect()}
    for s, n in sizes.items():
        r = plan[s]
        sd = (r * (1 - r) * n) ** 0.5
        assert abs(got.get(s, 0) - r * n) <= 4 * sd + 1, s


def test_null_source_stratum_not_dropped(spark):
    rows = [(i, "a", "t") for i in range(50)] + \
        [(100 + i, None, "t") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = {r["source"]: r for r in
            source_mixing_plan(docs, 1.0, 1.0).collect()}
    assert plan[None]["n_docs"] == 50        # NULL stratum is counted...
    kept = temperature_sample(docs, 1.0, 1.0)
    assert kept.count() == 100               # ...and fully kept at rate 1.0
    assert kept.where(F.col("source").isNull()).count() == 50


from pyspark.sql import functions as F  # noqa: E402


def test_stream_mix_equals_batch_across_micro_batches(spark, tmp_path):
    """temperature_mix_stream with a fixed plan must select EXACTLY the
    batch rows, regardless of how the stream is micro-batched."""
    import numpy as np
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.mixing import (
        source_mixing_plan,
        temperature_mix_stream,
        temperature_sample,
    )

    rng = np.random.default_rng(2)
    langs = ["en"] * 700 + ["fr"] * 200 + ["de"] * 80 + ["sw"] * 20
    rows = [(int(i), langs[i]) for i in rng.permutation(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    path = str(tmp_path / "mixsrc")
    docs.repartition(6).write.parquet(path)

    plan = source_mixing_plan(docs, 0.5, 0.4, source_col="lang")
    stream = (spark.readStream.schema("doc_id long, lang string")
              .option("maxFilesPerTrigger", 1).parquet(path))
    mixed = temperature_mix_stream(stream, plan, source_col="lang",
                                   key_col="doc_id", seed=3)
    q = (mixed.writeStream.format("memory").queryName("mixq")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert q.lastProgress is not None and q.lastProgress["batchId"] >= 5, (
        "stream must have been processed in multiple micro-batches")
    got = {r["doc_id"] for r in spark.table("mixq").collect()}
    want = {r["doc_id"] for r in
            temperature_sample(docs, 0.5, 0.4, source_col="lang",
                               key_col="doc_id", seed=3).collect()}
    assert got == want and len(got) > 0


def test_bottom_k_sample_properties(spark):
    """Exact size, bottom-of-hash-order, layout determinism, and the
    shared-sample (bottom-k sketch) property across overlapping tables."""
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.sampling import bottom_k_sample

    df = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(500)], "id long, g string")
    got = bottom_k_sample(df, 10, key_col="id", seed=3, strata_col="g")
    rows = got.collect()
    assert len(rows) == 20  # 10 per stratum
    # global (no strata): exactly k, TakeOrdered plan shape
    g = bottom_k_sample(df, 25, key_col="id", seed=3)
    assert g.count() == 25
    assert "TakeOrderedAndProject" in g._jdf.queryExecution().executedPlan().toString()
    # k > n degenerates to the whole table
    assert bottom_k_sample(df.limit(7), 99, key_col="id", seed=3).count() == 7
    # shared keys → shared sample prefix (bottom-k sketch property)
    other = df.where(F.col("id") < 250)
    s_all = {r["id"] for r in bottom_k_sample(df, 30, key_col="id", seed=5).collect()}
    s_sub = {r["id"] for r in bottom_k_sample(other, 30, key_col="id", seed=5).collect()}
    # every sampled id of the SUBSET that is also in the full table's
    # bottom-30 must agree; the subset's bottom-30 restricted to the full
    # bottom-30 is exactly the intersection restricted both ways
    assert s_all & set(range(250)) <= s_sub
