"""Coordinated bottom-k quantile sketch (`pipeline/quantile.py`)
invariants: the exact-merge theorem (bottom-k of a union == merge of
per-part bottom-k's, bitwise, any sharding), small-cell exactness, and
merge associativity.  The workload gate (events_quantile_rollup) binds
the estimates and cross-grain consistency vs DuckDB; these bind the
algebra the SQL mirror can't quantify over (arbitrary shardings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.quantile import (
    exact_discrete_quantiles,
    merge_sketches,
    quantile_sketch,
    sketch_quantiles,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    from ophidia_io_server_spark.sources.tables import load_table

    return (load_table(spark, SF, "events")
            .where(F.col("value").isNotNull() & ~F.isnan("value")))


def _sample_sets(df, keys):
    return {tuple(r[k] for k in keys):
            [(s["pr"], s["id"], s["v"]) for s in r["sample"]]
            for r in df.collect()}


def test_merge_equals_direct_for_any_sharding(spark):
    """Sketch day cells then merge per type == sketch per type directly —
    and the same through an arbitrary 7-way hash sharding."""
    ev = _events(spark)
    direct = quantile_sketch(ev, ["event_type"], "value", "event_id", k=16)
    via_day = merge_sketches(
        quantile_sketch(ev.withColumn("day", F.to_date("ts")),
                        ["event_type", "day"], "value", "event_id", k=16),
        ["event_type"], k=16)
    via_hash = merge_sketches(
        quantile_sketch(ev.withColumn("shard", F.col("event_id") % 7),
                        ["event_type", "shard"], "value", "event_id", k=16),
        ["event_type"], k=16)
    d = _sample_sets(direct, ["event_type"])
    assert _sample_sets(via_day, ["event_type"]) == d
    assert _sample_sets(via_hash, ["event_type"]) == d
    # n adds exactly through the merge
    nd = {r["event_type"]: r["n"] for r in direct.collect()}
    nm = {r["event_type"]: r["n"] for r in via_day.collect()}
    assert nd == nm


def test_merge_associativity(spark):
    ev = _events(spark).withColumn("day", F.to_date("ts"))
    day_sk = quantile_sketch(ev, ["event_type", "day"], "value",
                             "event_id", k=8)
    # (day -> week -> type) vs (day -> type)
    week = day_sk.withColumn("week", F.weekofyear("day"))
    two_step = merge_sketches(
        merge_sketches(week, ["event_type", "week"], k=8),
        ["event_type"], k=8)
    one_step = merge_sketches(day_sk, ["event_type"], k=8)
    assert (_sample_sets(two_step, ["event_type"])
            == _sample_sets(one_step, ["event_type"]))


def test_small_cell_estimates_are_exact(spark):
    """Cells with n <= k carry the whole cell: every estimate equals the
    exact discrete quantile at the same index rule."""
    ev = _events(spark)
    sk = sketch_quantiles(
        quantile_sketch(ev, ["event_type"], "value", "event_id", k=10 ** 6),
        [0.5, 0.9])
    ex = exact_discrete_quantiles(ev, ["event_type"], "value", "event_id",
                                  [0.5, 0.9])
    j = sk.join(ex, on="event_type").collect()
    assert j
    for r in j:
        assert r["est_p50"] == r["exact_p50"]
        assert r["est_p90"] == r["exact_p90"]


def test_sketch_error_within_rank_bound(spark):
    """k=32 over ~400-row cells: the estimate's true rank must sit within
    a generous 4/sqrt(k) rank-error band of the target quantile (a sanity
    envelope, not a tight bound — the gate hash pins exact values)."""
    ev = _events(spark)
    sk = sketch_quantiles(
        quantile_sketch(ev, ["event_type"], "value", "event_id", k=32),
        [0.5])
    vals = {r["event_type"]: r["est_p50"] for r in sk.collect()}
    rows = (ev.groupBy("event_type")
            .agg(F.sort_array(F.collect_list("value")).alias("vs"))
            .collect())
    for r in rows:
        est = vals[r["event_type"]]
        vs = r["vs"]
        rank = sum(1 for v in vs if v <= est) / len(vs)
        assert abs(rank - 0.5) <= 4 / (32 ** 0.5), (r["event_type"], rank)


def test_stream_sketch_batch_arrival_invariance(spark, tmp_path):
    """The drained streaming sketch is BITWISE identical to the one-shot
    batch sketch under two different file splits (2-file vs 5-file) —
    the coordination theorem carried into foreachBatch state."""
    from ophidia_io_server_spark.streaming.ingest import (
        quantile_sketch_stream,
    )

    ev = (_events(spark)
          .select("event_id", "event_type", "value").limit(400)
          .localCheckpoint())
    batch = quantile_sketch(ev, ["event_type"], "value", "event_id", k=16)
    want = _sample_sets(batch, ["event_type"])

    for nfiles in (2, 5):
        p = str(tmp_path / f"split{nfiles}")
        ev.repartition(nfiles).write.mode("overwrite").parquet(p)
        src = (spark.readStream
               .schema("event_id long, event_type string, value double")
               .option("maxFilesPerTrigger", 1).parquet(p))
        got = quantile_sketch_stream(src, ["event_type"], "value",
                                     "event_id", k=16)
        assert _sample_sets(got, ["event_type"]) == want
        assert ({r["event_type"]: r["n"] for r in got.collect()}
                == {r["event_type"]: r["n"] for r in batch.collect()})


def test_merge_theorem_property(spark):
    """Hypothesis: for ANY small corpus (ids, values) and ANY number of
    hash shards, sketch-per-shard + merge == direct sketch, bitwise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        rows=st.lists(
            st.tuples(st.integers(min_value=0, max_value=10 ** 6),
                      st.floats(min_value=-1e6, max_value=1e6,
                                allow_nan=False)),
            min_size=1, max_size=60, unique_by=lambda t: t[0]),
        shards=st.integers(min_value=2, max_value=6),
        k=st.integers(min_value=1, max_value=12),
    )
    @settings(max_examples=10, deadline=None)
    def check(rows, shards, k):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in rows], "event_id long, value double")
        # a constant cell key: one global cell
        df2 = df.withColumn("g", F.lit(1))
        direct = quantile_sketch(df2, ["g"], "value", "event_id", k=k)
        sharded = merge_sketches(
            quantile_sketch(
                df2.withColumn("shard", F.col("event_id") % shards),
                ["g", "shard"], "value", "event_id", k=k),
            ["g"], k=k)
        assert (_sample_sets(direct, ["g"]) == _sample_sets(sharded, ["g"]))

    check()
