"""Missing-value (NaN) semantics through the primitive pipeline
(FIXTURES.md A1: ~2% NaN fills exercise the missing-value paths)."""

import math

import pytest
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from ophidia_io_server_spark.dialect.expression import ExprContext, compile_expression

NAN = float("nan")
ARR = [1.0, NAN, 3.0, NAN, 5.0]


@pytest.fixture(scope="module")
def frag(spark):
    schema = StructType([
        StructField("id_dim", LongType()),
        StructField("measure", ArrayType(DoubleType())),
    ])
    return spark.createDataFrame([(1, ARR)], schema).cache()


def run1(frag, src):
    ctx = ExprContext(resolver=lambda n: frag[n])
    ev = compile_expression(src, ctx)
    col = ev.numeric() if ev.boolean else ev.col
    return frag.select(col.alias("r")).collect()[0]["r"]


def test_count_skips_nan(frag):
    assert run1(frag, "oph_count_array(measure)") == 3
    assert run1(frag, "oph_size_array(measure)") == 5


def test_sum_propagates_nan(frag):
    # C-loop semantics: NaN participates in += and poisons the fold
    assert math.isnan(run1(frag, "oph_reduce(measure,'sum')"))


def test_replace_nan_then_reduce(frag):
    got = run1(frag, "oph_reduce(oph_replace(measure,'NAN',0),'sum')")
    assert got == pytest.approx(9.0)


def test_mask_fill_and_filter_nan(frag):
    # predicate comparisons with NaN are false → else-branch
    got = run1(frag, "oph_predicate(measure,'x','>0','x','-1')")
    assert got[0] == 1.0 and got[1] == -1.0 and got[4] == 5.0
    # predicate2 passes NaN through untouched
    got2 = run1(frag, "oph_predicate2(measure,'x','>0','x','-1')")
    assert math.isnan(got2[1]) and got2[0] == 1.0


def test_nan_through_elementwise_fusion(frag):
    got = run1(frag, "oph_mul_scalar(oph_sum_scalar(measure,1),2)")
    assert got[0] == 4.0 and math.isnan(got[1]) and got[2] == 8.0
