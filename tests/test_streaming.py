"""Structured Streaming layer: windowed aggs, stateful dedup, foreachBatch
insert accumulation — each checked against its batch equivalent."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ophidia_io_server_spark.sources.tables import load_table
from ophidia_io_server_spark.streaming.ingest import (
    events_stream,
    hourly_counts_stream,
    run_available_now,
    stateful_dedup_stream,
    streaming_insert_fragment,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    d = tempfile.mkdtemp(prefix="ophidia_stream_test_")
    load_table(spark, SF, "events").repartition(3).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_hourly_counts_stream_matches_batch(spark, events_dir):
    stream_result = run_available_now(
        hourly_counts_stream(events_stream(spark, events_dir)), "t_hourly"
    )
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
             F.sum(F.round(F.col("value") * 100).cast("bigint"))
              .cast("bigint").alias("total_cents"))
    )
    got = {(r.hour_start, r.event_type): (r.n_events, r.total_cents)
           for r in stream_result.collect()}
    want = {(r.hour_start, r.event_type): (r.n_events, r.total_cents)
            for r in batch.collect()}
    assert got == want


def test_stateful_dedup_stream(spark, events_dir):
    # duplicate the input by reading it twice into one directory
    d = tempfile.mkdtemp(prefix="ophidia_dup_test_")
    try:
        ev = spark.read.parquet(events_dir)
        ev.unionAll(ev).repartition(2).write.mode("overwrite").parquet(d)
        deduped = run_available_now(
            stateful_dedup_stream(events_stream(spark, d)), "t_dedup", output_mode="append"
        )
        n_unique = ev.select("event_id").distinct().count()
        assert deduped.select("event_id").distinct().count() == n_unique
        assert deduped.count() == n_unique
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_user_running_stats_stream(spark, events_dir):
    from ophidia_io_server_spark.streaming.ingest import user_running_stats_stream

    res = run_available_now(
        user_running_stats_stream(events_stream(spark, events_dir)),
        "t_userstats", output_mode="update",
    )
    # update mode may emit a row per (user, batch); the LAST emit per user is
    # the cumulative total — compare that against the batch aggregate
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        res.withColumn("rn", F.row_number().over(w)).where("rn = 1")
        .select("user_id", "n_events", F.round("total_value", 4).alias("tv"))
    )
    batch = (
        load_table(spark, SF, "events").groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
             F.round(F.sum("value"), 4).alias("tv"))
    )
    got = {r.user_id: (r.n_events, r.tv) for r in final.collect()}
    want = {r.user_id: (r.n_events, r.tv) for r in batch.collect()}
    assert got == want


def test_streaming_insert_fragment(spark, events_dir, server):
    entry = streaming_insert_fragment(
        spark,
        events_stream(spark, events_dir, max_files_per_trigger=1),
        server.catalog,
        "ev_frag",
    )
    assert entry is not None
    n = server.catalog.df("ev_frag").count()
    assert n == load_table(spark, SF, "events").count()
