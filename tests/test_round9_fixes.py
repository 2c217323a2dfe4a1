"""Round-9 fix coverage: the five r8 ADVICE items (skyline_nd final-round
budget check, quantile_sketch integral-id validation, fused_scan_checks /
audit empty-input guards, empty-chunk safety in the inactivity close-out,
shard_balanced key-uniqueness precondition) and the
streaming_insert_fragment empty-stream return type (r8 VERDICT #5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_skyline_nd_final_round_counts(spark):
    """A reduction pass that brings the candidates under budget on the
    LAST allowed round must succeed — the old loop raised without
    checking the final pass's survivors."""
    from ophidia_io_server_spark.operators.skyline import skyline_nd

    # a correlated cloud: tiny frontier, so every reduction shrinks hard;
    # max_rounds=0 with a generous budget exercises the +1 count (the
    # initial local pass must get its own check even with zero rounds)
    rows = [(float(i), float(i), float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = skyline_nd(df, {"a": "max", "b": "max", "c": "max"},
                     candidate_budget=10_000, max_rounds=0)
    got = out.collect()
    assert len(got) == 1 and got[0]["a"] == 199.0


def test_skyline_nd_budget_still_fails_loudly(spark):
    from ophidia_io_server_spark.operators.skyline import skyline_nd

    # anti-correlated: the frontier IS the input, budget of 1 must raise
    rows = [(float(i), float(-i)) for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double")
    with pytest.raises(RuntimeError, match="candidate_budget"):
        skyline_nd(df, {"a": "max", "b": "max"},
                   candidate_budget=1, max_rounds=2).collect()


def test_quantile_sketch_rejects_non_integral_id(spark):
    from ophidia_io_server_spark.pipeline.quantile import quantile_sketch

    df = spark.createDataFrame(
        [("k1", 1.0, "not-a-number")], "cell string, v double, id string")
    with pytest.raises(ValueError, match="integral"):
        quantile_sketch(df, ["cell"], "v", "id", k=4)


def test_quantile_sketch_accepts_int_id(spark):
    from ophidia_io_server_spark.pipeline.quantile import quantile_sketch

    df = spark.createDataFrame(
        [("k1", 1.0, 7), ("k1", 2.0, 8)], "cell string, v double, id int")
    row = quantile_sketch(df, ["cell"], "v", "id", k=4).collect()[0]
    assert row["n"] == 2 and len(row["sample"]) == 2


def test_fused_scan_checks_empty_raises(spark):
    from ophidia_io_server_spark.operators.audit import (
        audit,
        fused_scan_checks,
    )

    df = spark.range(3)
    with pytest.raises(ValueError, match="at least one check"):
        fused_scan_checks(df)
    with pytest.raises(ValueError, match="at least one"):
        audit([])


def test_shard_balanced_duplicate_keys_raise(spark):
    from ophidia_io_server_spark.pipeline.packing import shard_balanced

    df = spark.createDataFrame(
        [("d1", 10), ("d1", 10), ("d2", 5)], "doc_id string, n_tokens int")
    with pytest.raises(ValueError, match="not unique"):
        shard_balanced(df, n_shards=2)
    # opt-out path still works (caller vouches for uniqueness)
    ok = spark.createDataFrame(
        [("d1", 10), ("d2", 5)], "doc_id string, n_tokens int")
    out = shard_balanced(ok, n_shards=2, validate_unique=False)
    assert out.count() == 2


def test_streaming_insert_fragment_empty_stream_typed(spark, tmp_path):
    """An all-empty stream must return a typed EMPTY fragment, not None."""
    from ophidia_io_server_spark.catalog import Catalog
    from ophidia_io_server_spark.streaming.ingest import (
        streaming_insert_fragment,
    )

    src = tmp_path / "empty_src"
    src.mkdir()
    empty = spark.createDataFrame([], "event_id long, v double")
    empty.write.parquet(str(src / "p0"))
    stream = (spark.readStream.schema("event_id long, v double")
              .parquet(str(src / "p0")))
    cat = Catalog(spark)
    entry = streaming_insert_fragment(spark, stream, cat, "frag_empty")
    assert entry is not None
    out = cat.df("frag_empty")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["event_id", "v"]


def test_closeout_stream_handles_empty_chunks(spark, tmp_path):
    """The stateful update fn must survive empty pandas chunks (int(NaN)
    used to raise) — drain a tiny staged stream end to end."""
    import datetime as dt

    from ophidia_io_server_spark.streaming.ingest import (
        run_available_now,
        user_inactivity_closeout_stream,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(1, base), (1, base + dt.timedelta(minutes=5)),
            # far-future sentinel advances the watermark past user 1's gap
            (999, base + dt.timedelta(days=30))]
    src = tmp_path / "closeout_src"
    spark.createDataFrame(rows, "user_id long, ts timestamp") \
        .repartition(4).write.parquet(str(src))
    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .parquet(str(src)))
    out = run_available_now(
        user_inactivity_closeout_stream(stream, gap_minutes=120),
        "t_r9_closeout", output_mode="append")
    got = {r["user_id"]: r["n_events"] for r in out.collect()}
    assert got.get(1) == 2
