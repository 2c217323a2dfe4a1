"""Distributed 2-D skyline: brute-force dominance differential
(hypothesis), duplicate/NULL semantics, direction parametrization, and
the plan-shape guard (no single-partition global window)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ophidia_io_server_spark.operators.skyline import skyline_2d


def _brute_skyline(pts, x_dir, y_dir):
    def better(a, b, d):  # a at-least-as-preferred-as b
        return a >= b if d == "max" else a <= b

    out = []
    for i, (x, y) in enumerate(pts):
        dominated = False
        for j, (qx, qy) in enumerate(pts):
            if i == j:
                continue
            if better(qx, x, x_dir) and better(qy, y, y_dir) and (qx, qy) != (x, y):
                dominated = True
                break
        if not dominated:
            out.append((x, y))
    return sorted(out)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pts=st.lists(st.tuples(st.integers(-9, 9), st.integers(-9, 9)),
                 min_size=1, max_size=40),
    x_dir=st.sampled_from(["max", "min"]),
    y_dir=st.sampled_from(["max", "min"]),
)
def test_skyline_matches_brute_force(spark, pts, x_dir, y_dir):
    df = spark.createDataFrame([(i, x, y) for i, (x, y) in enumerate(pts)],
                               "rid long, x long, y long")
    got = skyline_2d(df, "x", "y", x_dir=x_dir, y_dir=y_dir, partitions=4)
    got_pts = sorted((r["x"], r["y"]) for r in got.collect())
    want = _brute_skyline(pts, x_dir, y_dir)
    # every duplicate of a frontier point survives
    want_rows = sorted(p for p in [(x, y) for x, y in pts] if tuple(p) in set(want))
    assert got_pts == want_rows


def test_skyline_duplicates_and_nulls(spark):
    rows = [(1, 10.0, 5.0), (2, 10.0, 5.0), (3, 10.0, 7.0),
            (4, None, 1.0), (5, 20.0, None), (6, 20.0, 6.0)]
    df = spark.createDataFrame(rows, "rid long, x double, y double")
    got = sorted(r["rid"] for r in skyline_2d(df, "x", "y").collect())
    # (20,6) beats nothing on y=5 side; (10,5) not dominated (x smaller but y better);
    # (10,7) dominated by (10,5); NULL rows never appear
    assert got == [1, 2, 6]


def test_skyline_all_columns_preserved_and_order_stat(spark):
    df = spark.createDataFrame(
        [(i, float(i), float(i), f"tag{i}") for i in range(100)],
        "rid long, x double, y double, tag string")
    # under (max x, min y), y growing with x means no point dominates
    # another: every point is on the frontier
    got = skyline_2d(df, "x", "y", partitions=8)
    assert got.columns == ["x", "y", "rid", "tag"] or set(got.columns) == {"x", "y", "rid", "tag"}
    assert got.count() == 100


def test_skyline_rejects_bad_direction(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError):
        skyline_2d(df, "x", "y", x_dir="up")


def test_skyline_no_global_single_partition_window(spark):
    """The executed plan must not contain a partition-less global Window
    (the textbook scale trap for ordered running aggregates)."""
    df = spark.range(1000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 89).cast("double").alias("y"))
    plan = skyline_2d(df, "x", "y", partitions=8)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "_pid" in line, f"global window without partition key:\n{line}"


def _brute_nd(pts, dirs):
    def dom(q, p):
        ge = all((qq >= pp) if d == "max" else (qq <= pp)
                 for qq, pp, d in zip(q, p, dirs))
        return ge and q != p
    return sorted(p for p in set(pts) if not any(dom(q, p) for q in set(pts)))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pts=st.lists(st.tuples(st.integers(-5, 5), st.integers(-5, 5),
                           st.integers(-5, 5)),
                 min_size=1, max_size=30),
    dirs=st.tuples(st.sampled_from(["max", "min"]),
                   st.sampled_from(["max", "min"]),
                   st.sampled_from(["max", "min"])),
)
def test_skyline_nd_matches_brute_force(spark, pts, dirs):
    from ophidia_io_server_spark.operators.skyline import skyline_nd

    df = spark.createDataFrame(
        [(i, float(x), float(y), float(z)) for i, (x, y, z) in enumerate(pts)],
        "rid long, x double, y double, z double")
    got = sorted({(r["x"], r["y"], r["z"]) for r in
                  skyline_nd(df, dict(zip(["x", "y", "z"], dirs))).collect()})
    want = [(float(a), float(b), float(c))
            for a, b, c in _brute_nd(pts, list(dirs))]
    assert got == want


def test_skyline_nd_duplicates_survive_and_budget_raises(spark):
    from ophidia_io_server_spark.operators.skyline import skyline_nd

    df = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, 5.0, 1.0), (3, 1.0, 5.0)],
        "rid long, x double, y double")
    rows = skyline_nd(df, {"x": "max", "y": "max"}).collect()
    assert sorted(r["rid"] for r in rows) == [1, 2, 3]

    import pytest as _pytest
    big = spark.range(200).selectExpr("cast(id as double) x",
                                      "cast(-id as double) y")
    with _pytest.raises(RuntimeError):
        skyline_nd(big, {"x": "max", "y": "max"},
                   candidate_budget=10, max_rounds=2)


def test_skyline_nd_rejects_non_numeric(spark):
    from ophidia_io_server_spark.operators.skyline import skyline_nd

    import pytest as _pytest
    df = spark.createDataFrame([("a", 1.0)], "s string, x double")
    with _pytest.raises(ValueError):
        skyline_nd(df, {"s": "max", "x": "max"})
