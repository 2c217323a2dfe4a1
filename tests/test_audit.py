"""Constraint-audit checks: FK null-key exclusion, empty-input zero
rows, uniqueness arithmetic, accepted-values NULL handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from ophidia_io_server_spark.operators.audit import (
    accepted_values_check,
    audit,
    fk_check,
    not_null_check,
    predicate_check,
    unique_check,
)


def test_fk_check_counts_orphans_and_skips_null_keys(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = fk_check(child, ["k"], parent, ["pk"]).collect()[0]
    # NULL FK is not checked (completeness is a separate check)
    assert (r["n_rows"], r["n_violations"]) == (3, 1)


def test_fk_check_empty_child(spark):
    child = spark.createDataFrame([], "k long")
    parent = spark.createDataFrame([(1,)], "pk long")
    r = fk_check(child, ["k"], parent, ["pk"]).collect()[0]
    assert (r["n_rows"], r["n_violations"]) == (0, 0)


def test_unique_and_not_null_and_accepted(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (3, "z")], "k long, s string")
    u = unique_check(df, ["k"]).collect()[0]
    assert (u["n_rows"], u["n_violations"]) == (4, 1)
    nn = not_null_check(df, "s").collect()[0]
    assert (nn["n_rows"], nn["n_violations"]) == (4, 1)
    av = accepted_values_check(df, "s", ["a"]).collect()[0]
    # NULL and 'z' both violate
    assert (av["n_rows"], av["n_violations"]) == (4, 2)


def test_fused_scan_checks_match_single_checks(spark):
    from ophidia_io_server_spark.operators.audit import fused_scan_checks

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (3, "z")], "k long, s string")
    rep = {r["constraint_name"]: r for r in fused_scan_checks(
        df,
        violations={
            "nn_s": F.col("s").isNull(),
            "av_s": ~F.col("s").isin(["a"]) | F.col("s").isNull(),
            "pos_k": F.col("k") <= 0,
        },
        unique_keys={"uq_k": ["k"]},
    ).collect()}
    assert all(r["n_rows"] == 4 for r in rep.values())
    assert rep["nn_s"]["n_violations"] == 1
    assert rep["av_s"]["n_violations"] == 2
    assert rep["pos_k"]["n_violations"] == 0 and rep["pos_k"]["ok"] is True
    assert rep["uq_k"]["n_violations"] == 1
    # one scan: the executed plan reads the source exactly once
    plan = fused_scan_checks(
        df, violations={"nn_s": F.col("s").isNull()},
        unique_keys={"uq_k": ["k"]},
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2


def test_audit_report_shape(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    rep = audit([
        ("u", unique_check(df, ["k"])),
        ("p", predicate_check(df, F.col("k") > 1)),
    ]).collect()
    rows = {r["constraint_name"]: r for r in rep}
    assert rows["u"]["ok"] is True
    assert rows["p"]["n_violations"] == 1 and rows["p"]["ok"] is False
