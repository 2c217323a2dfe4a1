"""Expression compiler semantics against literal evaluation."""

import pytest
from pyspark.sql import functions as F

from ophidia_io_server_spark.dialect.expression import (
    ExprContext,
    ExprError,
    compile_expression,
)


def _eval(spark, src, params=None, cols=None):
    cols = cols or {}
    df = spark.range(1).select(*[F.lit(v).alias(k) for k, v in cols.items()] or [F.lit(0)])
    ctx = ExprContext(resolver=lambda n: df[n], params=params or {})
    ev = compile_expression(src, ctx)
    col = ev.numeric() if ev.boolean else ev.col
    return df.select(col.alias("r")).collect()[0]["r"]


def test_arithmetic_precedence(spark):
    assert _eval(spark, "1+2*3") == 7
    assert _eval(spark, "(1+2)*3") == 9
    assert _eval(spark, "10/4") == 2.5  # correct division, not the reference bug
    assert _eval(spark, "10%3") == 1
    assert _eval(spark, "-2*3") == -6


def test_logical_ops(spark):
    assert _eval(spark, "1 & 0") == 0
    assert _eval(spark, "1 | 0") == 1
    assert _eval(spark, "!0") == 1
    assert _eval(spark, "1=1 & 2=2") == 1


def test_comparisons(spark):
    assert _eval(spark, "3>2") == 1
    assert _eval(spark, "3<=2") == 0
    assert _eval(spark, "3!=2") == 1


def test_column_and_params(spark):
    assert _eval(spark, "x*2", cols={"x": 21}) == 42
    assert _eval(spark, "?1+?2", params={1: 40, 2: 2}) == 42


def test_id_builtins(spark):
    # oph_id: C integer division semantics
    assert _eval(spark, "oph_id(x, 100)", cols={"x": 101}) == 2
    assert _eval(spark, "oph_id(x, 100)", cols={"x": 100}) == 1
    assert _eval(spark, "oph_is_in_subset(x, 1, 2, 100)", cols={"x": 3}) == 1
    assert _eval(spark, "oph_is_in_subset(x, 1, 2, 100)", cols={"x": 4}) == 0
    assert _eval(spark, "oph_id_to_index(x, 4, 3)", cols={"x": 7}) == 2
    assert _eval(spark, "oph_id_to_index2(x, 5, 3)", cols={"x": 11}) == 3


def test_errors(spark):
    with pytest.raises(ExprError):
        _eval(spark, "oph_nope(1)")
    with pytest.raises(ExprError):
        _eval(spark, "1 +")
    with pytest.raises(ExprError):
        _eval(spark, "?9")
