"""Metamorphic/property tests for array primitives (SURVEY.md §5 plan item 3):
invariants that must hold for ANY input, checked with hypothesis-generated
arrays pushed through the real dialect → Catalyst pipeline."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from ophidia_io_server_spark.dialect.expression import ExprContext, compile_expression

ARR = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=1, max_size=12,
)

SCHEMA = StructType([
    StructField("id_dim", LongType()),
    StructField("measure", ArrayType(DoubleType())),
])


def run1(spark, arr, src):
    df = spark.createDataFrame([(1, [float(x) for x in arr])], SCHEMA)
    ctx = ExprContext(resolver=lambda n: df[n])
    ev = compile_expression(src, ctx)
    col = ev.numeric() if ev.boolean else ev.col
    return df.select(col.alias("r")).collect()[0]["r"]


@given(arr=ARR)
@settings(max_examples=12, deadline=None)
def test_reduce_sum_invariant_under_reverse(spark, arr):
    """sum is permutation-invariant: reduce(reverse(x)) == reduce(x) exactly
    is NOT guaranteed for doubles, but max/min/size are."""
    assert run1(spark, arr, "oph_reduce(oph_reverse(measure),'max')") == \
        run1(spark, arr, "oph_reduce(measure,'max')")
    assert run1(spark, arr, "oph_reduce(oph_reverse(measure),'min')") == \
        run1(spark, arr, "oph_reduce(measure,'min')")
    assert run1(spark, arr, "oph_size_array(oph_reverse(measure))") == len(arr)


@given(arr=ARR)
@settings(max_examples=12, deadline=None)
def test_accumulate_deaccumulate_roundtrip(spark, arr):
    got = run1(spark, arr, "oph_deaccumulate(oph_accumulate(measure))")
    assert got == pytest.approx([float(x) for x in arr], rel=1e-9, abs=1e-6)


@given(arr=ARR)
@settings(max_examples=12, deadline=None)
def test_reverse_involution_and_rotate_identity(spark, arr):
    assert run1(spark, arr, "oph_reverse(oph_reverse(measure))") == \
        pytest.approx([float(x) for x in arr])
    n = len(arr)
    assert run1(spark, arr, f"oph_rotate(measure,{n})") == \
        pytest.approx([float(x) for x in arr])


@given(arr=ARR, k=st.integers(1, 5))
@settings(max_examples=12, deadline=None)
def test_subarray_concat_partition(spark, arr, k):
    """slicing at k then concatenating reconstructs the array."""
    k = min(k, len(arr))
    got = run1(
        spark, arr,
        f"oph_concat(oph_get_subarray(measure,1,{k}),"
        f"oph_get_subarray(measure,{k + 1},{max(len(arr) - k, 0) or 1}))",
    )
    want = list(arr[:k]) + list(arr[k:])
    assert got == pytest.approx([float(x) for x in want])


@given(arr=ARR)
@settings(max_examples=12, deadline=None)
def test_expand_rollup_inverse_shapes(spark, arr):
    """roll_up(expand(x)) has the same elements: expand splits to rows,
    collecting first elements back ordered by position reconstructs x —
    verified here at the primitive level via size/content of get_subarray."""
    got = run1(spark, arr, "oph_get_subarray(measure,1,1000000)")
    assert got == pytest.approx([float(x) for x in arr])


@given(arr=ARR, c=st.floats(min_value=-100, max_value=100, allow_nan=False))
@settings(max_examples=12, deadline=None)
def test_sum_scalar_inverse(spark, arr, c):
    got = run1(spark, arr, f"oph_sum_scalar(oph_sum_scalar(measure,{c}),{-c})")
    assert got == pytest.approx([float(x) for x in arr], rel=1e-9, abs=1e-6)


@given(arr=ARR)
@settings(max_examples=12, deadline=None)
def test_compress_uncompress_identity(spark, arr):
    got = run1(spark, arr, "oph_uncompress(oph_compress(measure))")
    assert got == pytest.approx([float(x) for x in arr])


@given(arr=ARR)
@settings(max_examples=12, deadline=None)
def test_gsl_sort_properties(spark, arr):
    got = run1(spark, arr, "oph_gsl_sort(measure)")
    assert got == sorted([float(x) for x in arr])


@given(arr=ARR)
@settings(max_examples=10, deadline=None)
def test_quantile_and_boxplot_permutation_invariant(spark, arr):
    """Sort-based stats ignore input order: reversing the array changes
    nothing in median/boxplot/histogram."""
    for f in ("oph_gsl_quantile(measure,0.5)", "oph_gsl_boxplot(measure)",
              "oph_gsl_histogram(measure,3)"):
        a = run1(spark, arr, f)
        b = run1(spark, arr, f.replace("measure", "oph_reverse(measure)"))
        assert a == pytest.approx(b), f


ARR2 = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=2, max_size=12,
)


@given(arr=ARR2, k=st.floats(min_value=-50, max_value=50, allow_nan=False))
@settings(max_examples=10, deadline=None)
def test_fit_shift_equivariance(spark, arr, k):
    """Shifting y by a constant shifts the intercept, not the slope.
    (n >= 2: a single point has no defined line.)"""
    base = run1(spark, arr, "oph_gsl_fit_linear_coeff(measure)")
    shifted = run1(spark, arr, f"oph_gsl_fit_linear_coeff(oph_sum_scalar(measure,{k}))")
    assert shifted[1] == pytest.approx(base[1], rel=1e-6, abs=1e-6)   # slope
    assert shifted[0] == pytest.approx(base[0] + k, rel=1e-6, abs=1e-5)  # intercept
