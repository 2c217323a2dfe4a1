"""as-of join + interval join: differential tests against pandas.merge_asof
and a brute-force inequality join, plus plan-shape guards (no BNLJ)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from ophidia_io_server_spark.operators.temporal import (
    asof_join,
    interval_join,
    merge_intervals,
)

BASE = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return BASE + dt.timedelta(seconds=float(sec))


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _rand_events(rng, n, n_keys, tmax):
    return [
        (int(i), int(rng.integers(0, n_keys)), _ts(float(rng.uniform(0, tmax))),
         float(np.round(rng.uniform(0, 100), 2)))
        for i in range(n)
    ]


SCHEMA = "event_id long, user_id long, ts timestamp, value double"


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 40.0])
def test_asof_matches_pandas_merge_asof(spark, direction, tolerance):
    rng = np.random.default_rng(42)
    left_rows = _rand_events(rng, 300, 8, 1000)
    right_rows = _rand_events(rng, 200, 8, 1000)
    left = _mk(spark, left_rows, SCHEMA)
    right = _mk(spark, right_rows, SCHEMA).select(
        F.col("event_id").alias("rid"), "user_id", "ts",
        F.col("value").alias("rvalue"))

    got = asof_join(
        left, right, on="user_id", ts_col="ts", seq_col="rid",
        direction=direction, tolerance_sec=tolerance,
    ).toPandas().sort_values("event_id").reset_index(drop=True)

    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts", "value"])
    rp = pd.DataFrame(right_rows, columns=["rid", "user_id", "ts", "rvalue"])
    # pandas keeps the LAST right row among equal timestamps in sort order —
    # sort by (ts, rid) so ties resolve to max rid, matching seq_col
    rp = rp.sort_values(["ts", "rid"]).reset_index(drop=True)
    exp = pd.merge_asof(
        lp.sort_values("ts"), rp, on="ts", by="user_id", direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
        suffixes=("", "_r"),
    ).sort_values("event_id").reset_index(drop=True)

    assert len(got) == len(exp) == 300
    for i in range(300):
        g, e = got.iloc[i], exp.iloc[i]
        assert g["event_id"] == e["event_id"]
        ge, ee = g["r_rid"], e["rid"]
        assert (pd.isna(ge) and pd.isna(ee)) or ge == ee, (
            f"row {i} (dir={direction} tol={tolerance}): got rid={ge}, want {ee}")
    # r_ts must be the matched RIGHT row's ts (merge_asof only keeps left ts)
    rid_ts = dict(zip(rp["rid"], rp["ts"]))
    for _, g in got.iterrows():
        if not pd.isna(g["r_rid"]):
            assert g["r_ts"] == rid_ts[int(g["r_rid"])]


def test_asof_exact_match_toggle(spark):
    left = _mk(spark, [(1, 0, _ts(100), 1.0)], SCHEMA)
    right = _mk(spark, [(7, 0, _ts(100), 5.0), (6, 0, _ts(50), 3.0)], SCHEMA)
    on = asof_join(left, right, on="user_id", seq_col="event_id").collect()[0]
    off = asof_join(left, right, on="user_id", seq_col="event_id",
                    allow_exact_matches=False).collect()[0]
    assert on["r_event_id"] == 7        # equal-ts row visible
    assert off["r_event_id"] == 6       # equal-ts row hidden → earlier row


def test_asof_equal_ts_tiebreak_is_max_seq(spark):
    left = _mk(spark, [(1, 0, _ts(100), 1.0)], SCHEMA)
    right = _mk(spark, [(3, 0, _ts(90), 1.0), (9, 0, _ts(90), 2.0),
                        (5, 0, _ts(90), 3.0)], SCHEMA)
    row = asof_join(left, right, on="user_id", seq_col="event_id").collect()[0]
    assert row["r_event_id"] == 9


def test_asof_no_bnlj(spark):
    left = _mk(spark, [(1, 0, _ts(1), 1.0)], SCHEMA)
    right = _mk(spark, [(2, 0, _ts(0), 2.0)], SCHEMA)
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _brute_interval_join(points, intervals):
    out = []
    for pid, key, ts in points:
        hits = [iv for iv in intervals
                if iv[0] == key and iv[1] <= ts < iv[2]]
        out.append((pid, sorted((iv[1], iv[2]) for iv in hits)))
    return dict(out)


def test_interval_join_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    points = [(int(i), int(rng.integers(0, 5)), _ts(float(rng.uniform(0, 5000))))
              for i in range(400)]
    raw_ivs = [(int(rng.integers(0, 5)), float(rng.uniform(0, 4800)),
                float(rng.uniform(30, 900))) for _ in range(60)]
    intervals = [(k, _ts(s), _ts(s + w)) for k, s, w in raw_ivs]
    pdf = _mk(spark, points, "pid long, user_id long, ts timestamp")
    ivdf = _mk(spark, intervals, "user_id long, start_ts timestamp, end_ts timestamp")

    for bins in (60, 1800, 7200):
        got = interval_join(pdf, ivdf, on="user_id", bin_seconds=bins).collect()
        exp = _brute_interval_join(points, intervals)
        got_map: dict[int, list] = {p[0]: [] for p in points}
        for r in got:
            got_map.setdefault(r["pid"], []).append((r["start_ts"], r["end_ts"]))
        for pid, ivs in exp.items():
            assert sorted(got_map.get(pid, [])) == ivs, f"pid {pid} bins={bins}"

    left = interval_join(pdf, ivdf, on="user_id", how="left",
                         point_id_col="pid").collect()
    # left join: every point appears; matched rows == inner rows;
    # unmatched have NULL interval cols
    n_inner = sum(len(v) for v in _brute_interval_join(points, intervals).values())
    n_unmatched = sum(1 for v in _brute_interval_join(points, intervals).values() if not v)
    assert len(left) == n_inner + n_unmatched
    assert sum(1 for r in left if r["start_ts"] is None) == n_unmatched


def test_interval_join_no_bnlj_and_clash_guard(spark):
    pdf = _mk(spark, [(1, 0, _ts(1))], "pid long, user_id long, ts timestamp")
    ivdf = _mk(spark, [(0, _ts(0), _ts(2))],
               "user_id long, start_ts timestamp, end_ts timestamp")
    plan = interval_join(pdf, ivdf, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    bad = ivdf.withColumnRenamed("start_ts", "ts")
    with pytest.raises(ValueError, match="clash"):
        interval_join(pdf, bad, on="user_id")


def test_merge_intervals(spark):
    rows = [
        (0, _ts(0), _ts(100)), (0, _ts(50), _ts(150)),   # overlap → merge
        (0, _ts(150), _ts(200)),                          # touching → merge
        (0, _ts(300), _ts(400)),                          # gap → separate
        (1, _ts(0), _ts(10)),
    ]
    df = _mk(spark, rows, "user_id long, start_ts timestamp, end_ts timestamp")
    got = sorted(
        ((r["user_id"], r["start_ts"], r["end_ts"])
         for r in merge_intervals(df, on="user_id").collect()))
    assert got == [
        (0, _ts(0), _ts(200)), (0, _ts(300), _ts(400)), (1, _ts(0), _ts(10))]


def test_asof_null_right_ts_not_carried(spark):
    left = _mk(spark, [(1, 0, _ts(100), 1.0)], SCHEMA)
    right = _mk(spark, [(5, 0, None, 9.0), (6, 0, _ts(50), 3.0)], SCHEMA)
    row = asof_join(left, right, on="user_id", seq_col="event_id").collect()[0]
    assert row["r_event_id"] == 6          # the NULL-ts row is ignored
    only_null = _mk(spark, [(5, 0, None, 9.0)], SCHEMA)
    row = asof_join(left, only_null, on="user_id", seq_col="event_id").collect()[0]
    assert row["r_event_id"] is None


def test_interval_join_replication_guard(spark):
    pdf = _mk(spark, [(1, 0, _ts(1))], "pid long, user_id long, ts timestamp")
    huge = _mk(spark, [(0, _ts(0), _ts(86400 * 365))],
               "user_id long, start_ts timestamp, end_ts timestamp")
    # a year-long interval at 60 s bins would need >500k replicas → raises
    with pytest.raises(Exception, match="interval_join"):
        interval_join(pdf, huge, on="user_id", bin_seconds=60,
                      max_bins_per_interval=1000).collect()
    # same interval with an adequate bin width: fine
    got = interval_join(pdf, huge, on="user_id", bin_seconds=86400 * 30).collect()
    assert len(got) == 1


def test_asof_null_left_ts_no_match_either_direction(spark):
    left = _mk(spark, [(1, 0, None, 1.0), (2, 0, _ts(100), 2.0)], SCHEMA)
    right = _mk(spark, [(7, 0, _ts(10), 5.0), (8, 0, _ts(200), 6.0)], SCHEMA)
    for direction in ("backward", "forward"):
        got = {r["event_id"]: r["r_event_id"] for r in asof_join(
            left, right, on="user_id", seq_col="event_id",
            direction=direction).collect()}
        assert got[1] is None, direction    # NULL-ts left row: no fabricated match
        assert got[2] == (7 if direction == "backward" else 8)


def test_asof_clash_with_ts_col_raises(spark):
    left = _mk(spark, [(1, 0, _ts(1), 1.0)], SCHEMA) \
        .withColumnRenamed("ts", "r_ts")
    right = _mk(spark, [(2, 0, _ts(0), 2.0)], SCHEMA)
    with pytest.raises(ValueError, match="clash"):
        asof_join(left, right, on="user_id", ts_col="r_ts",
                  right_ts_col="ts", prefix="r_")


@pytest.mark.parametrize("tolerance", [None, 40.0])
def test_asof_nearest_matches_pandas(spark, tolerance):
    rng = np.random.default_rng(55)
    left_rows = _rand_events(rng, 250, 6, 1000)
    right_rows = _rand_events(rng, 150, 6, 1000)
    left = _mk(spark, left_rows, SCHEMA)
    right = _mk(spark, right_rows, SCHEMA).select(
        F.col("event_id").alias("rid"), "user_id", "ts",
        F.col("value").alias("rvalue"))
    got = asof_join(left, right, on="user_id", seq_col="rid",
                    direction="nearest", tolerance_sec=tolerance
                    ).toPandas().sort_values("event_id").reset_index(drop=True)
    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts", "value"])
    rp = pd.DataFrame(right_rows, columns=["rid", "user_id", "ts", "rvalue"]) \
        .sort_values(["ts", "rid"]).reset_index(drop=True)
    exp = pd.merge_asof(
        lp.sort_values("ts"), rp, on="ts", by="user_id", direction="nearest",
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
        suffixes=("", "_r"),
    ).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(exp) == 250
    for i in range(250):
        g, e = got.iloc[i], exp.iloc[i]
        ge, ee = g["r_rid"], e["rid"]
        assert (pd.isna(ge) and pd.isna(ee)) or ge == ee, \
            f"row {i} tol={tolerance}: got {ge}, want {ee}"


def test_asof_nearest_tie_goes_backward(spark):
    left = _mk(spark, [(1, 0, _ts(100), 1.0)], SCHEMA)
    right = _mk(spark, [(7, 0, _ts(90), 5.0), (8, 0, _ts(110), 6.0)], SCHEMA)
    row = asof_join(left, right, on="user_id", seq_col="event_id",
                    direction="nearest").collect()[0]
    assert row["r_event_id"] == 7          # equidistant → backward wins


def test_interval_overlap_join_matches_bruteforce(spark):
    from ophidia_io_server_spark.operators.temporal import interval_overlap_join

    rng = np.random.default_rng(77)
    def mk_ivs(n, prefix):
        rows = []
        for i in range(n):
            s = float(rng.uniform(0, 4000))
            rows.append((int(i), int(rng.integers(0, 4)), _ts(s),
                         _ts(s + float(rng.uniform(10, 1200)))))
        return rows
    arows = mk_ivs(80, "a")
    brows = mk_ivs(90, "b")
    a = _mk(spark, arows, "aid long, user_id long, start_ts timestamp, end_ts timestamp")
    b = _mk(spark, brows,
            "bid long, user_id long, bstart timestamp, bend timestamp")
    exp = sorted(
        (ar[0], br[0])
        for ar in arows for br in brows
        if ar[1] == br[1] and ar[2] < br[3] and br[2] < ar[3])
    for bins in (60, 900, 3600):
        got = sorted(
            (r["aid"], r["bid"]) for r in interval_overlap_join(
                a, b, on="user_id", right_start="bstart", right_end="bend",
                bin_seconds=bins).collect())
        assert got == exp, f"bins={bins}"   # exact AND exactly-once


def test_interval_overlap_join_clash_guard(spark):
    from ophidia_io_server_spark.operators.temporal import interval_overlap_join

    a = _mk(spark, [(1, 0, _ts(0), _ts(10))],
            "aid long, user_id long, start_ts timestamp, end_ts timestamp")
    with pytest.raises(ValueError, match="clash"):
        interval_overlap_join(a, a, on="user_id")


def test_asof_and_interval_multi_key(spark):
    # composite join keys: (user_id, kind)
    left = spark.createDataFrame(
        [(1, 0, "a", _ts(100)), (2, 0, "b", _ts(100))],
        "event_id long, user_id long, kind string, ts timestamp")
    right = spark.createDataFrame(
        [(7, 0, "a", _ts(90)), (8, 0, "b", _ts(95)), (9, 1, "a", _ts(99))],
        "rid long, user_id long, kind string, ts timestamp")
    got = {r["event_id"]: r["r_rid"] for r in asof_join(
        left, right, on=["user_id", "kind"], seq_col="rid").collect()}
    assert got == {1: 7, 2: 8}       # matches respect BOTH key columns

    pts = spark.createDataFrame(
        [(1, 0, "a", _ts(5)), (2, 0, "b", _ts(5))],
        "pid long, user_id long, kind string, ts timestamp")
    ivs = spark.createDataFrame(
        [(0, "a", _ts(0), _ts(10))],
        "user_id long, kind string, start_ts timestamp, end_ts timestamp")
    got = [r["pid"] for r in interval_join(
        pts, ivs, on=["user_id", "kind"], bin_seconds=60).collect()]
    assert got == [1]                # kind='b' point does not cross keys


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("bucket_seconds", [7, 100, 5000])
def test_asof_bucketed_identical_to_plain(spark, direction, bucket_seconds):
    """Hot-key pre-bucketing is a pure execution-strategy change: output is
    row-identical to the default single-task-per-key path for every
    direction, bucket width (narrower / comparable / wider than the data
    span), tie pattern, and NULL-ts rows."""
    rng = np.random.default_rng(7)
    left_rows = _rand_events(rng, 250, 5, 1000)
    right_rows = _rand_events(rng, 150, 5, 1000)
    # equal-ts ties + a NULL-ts left row + a NULL-ts right row
    right_rows += [(900, 2, _ts(500), 1.0), (901, 2, _ts(500), 2.0)]
    left_rows += [(800, 2, _ts(500), 0.0), (801, 3, None, 0.0)]
    right_rows += [(902, 3, None, 9.0)]
    left = _mk(spark, left_rows, SCHEMA)
    right = _mk(spark, right_rows, SCHEMA).select(
        F.col("event_id").alias("rid"), "user_id", "ts",
        F.col("value").alias("rvalue"))
    kw = dict(on="user_id", ts_col="ts", seq_col="rid", direction=direction,
              tolerance_sec=120.0)
    plain = asof_join(left, right, **kw)
    bucketed = asof_join(left, right, bucket_seconds=bucket_seconds, **kw)
    assert bucketed.exceptAll(plain).count() == 0
    assert plain.exceptAll(bucketed).count() == 0
    assert bucketed.count() == len(left_rows)
    # the carry window must really partition on the time bucket
    assert "_bkt" in bucketed._jdf.queryExecution().executedPlan().toString()


def test_asof_bucketed_exact_toggle_and_tiebreak(spark):
    left = _mk(spark, [(1, 0, _ts(100), 1.0)], SCHEMA)
    right = _mk(spark, [(7, 0, _ts(100), 5.0), (6, 0, _ts(50), 3.0)], SCHEMA)
    off = asof_join(left, right, on="user_id", seq_col="event_id",
                    allow_exact_matches=False, bucket_seconds=30).collect()[0]
    assert off["r_event_id"] == 6  # equal-ts hidden; match carried from an earlier bucket
    on = asof_join(left, right, on="user_id", seq_col="event_id",
                   bucket_seconds=30).collect()[0]
    assert on["r_event_id"] == 7


def test_asof_bucketed_hot_key_splits_across_partitions(spark):
    """90%-hot-key stress: identical output, and the hot key's rows span
    multiple carry-window partitions (the whole point of the bucketing)."""
    rng = np.random.default_rng(11)
    n = 4000
    left_rows = [(int(i), 0 if i % 10 else int(1 + i % 4),
                  _ts(float(rng.uniform(0, 40000))), 1.0) for i in range(n)]
    right_rows = [(int(10_000 + i), 0 if i % 10 else int(1 + i % 4),
                   _ts(float(rng.uniform(0, 40000))), 2.0) for i in range(1000)]
    left = _mk(spark, left_rows, SCHEMA)
    right = _mk(spark, right_rows, SCHEMA).select(
        F.col("event_id").alias("rid"), "user_id", "ts",
        F.col("value").alias("rvalue"))
    kw = dict(on="user_id", ts_col="ts", seq_col="rid")
    plain = asof_join(left, right, **kw)
    bucketed = asof_join(left, right, bucket_seconds=600, **kw)
    assert bucketed.exceptAll(plain).count() == 0
    assert plain.exceptAll(bucketed).count() == 0
    # hot key's timeline covers many distinct (key, bucket) partitions
    n_buckets = (left.where("user_id = 0")
                 .select((F.unix_micros("ts") / (600 * 1_000_000))
                         .cast("long").alias("b")).distinct().count())
    assert n_buckets > 20
