"""Table profiler: exactness vs pandas, fixed-decimal means, unpivot shape."""

from __future__ import annotations

import pytest

from ophidia_io_server_spark.operators.profile import profile_table


def test_profile_matches_pandas(spark):
    rows = [(1, 10.25, "x"), (2, None, "y"), (3, 10.25, None), (None, 7.50, "x")]
    df = spark.createDataFrame(rows, "k long, v double, s string")
    got = {r["col_name"]: r for r in profile_table(df, mean_decimals=2).collect()}
    assert set(got) == {"k", "v", "s"}
    assert all(got[c]["n_rows"] == 4 for c in got)
    assert got["k"]["n_null"] == 1 and got["k"]["n_distinct"] == 3
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 2
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["v"]["min_num"] == 7.50 and got["v"]["max_num"] == 10.25
    assert got["v"]["mean_num"] == pytest.approx(round((10.25 + 10.25 + 7.5) / 3, 6), abs=1e-6)
    assert got["k"]["mean_num"] == pytest.approx(2.0, abs=1e-9)
    # non-numeric columns carry NULL stats
    assert got["s"]["min_num"] is None and got["s"]["mean_num"] is None


def test_profile_single_aggregation_plan(spark):
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    # one wide aggregate, not one scan per column
    assert plan.count("FileScan") <= 1


def test_profile_empty_table_exact_zero_counts(spark):
    df = spark.createDataFrame([], "a long, s string")
    got = {r["col_name"]: r for r in profile_table(df).collect()}
    for c in ("a", "s"):
        assert got[c]["n_rows"] == 0
        assert got[c]["n_null"] == 0          # not NULL
        assert got[c]["n_distinct"] == 0
