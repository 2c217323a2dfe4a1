"""Array primitives against numpy oracles on a deterministic fixture."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from ophidia_io_server_spark.dialect.expression import ExprContext, compile_expression

ARRS = [
    [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    [3.0, -1.0, 4.0, 1.0, -5.0, 9.0],
    [0.5, 0.25, 0.125, 8.0, 16.0, 32.0],
]


@pytest.fixture(scope="module")
def frag(spark):
    schema = StructType([
        StructField("id_dim", LongType()),
        StructField("measure", ArrayType(DoubleType())),
        StructField("other", ArrayType(DoubleType())),
    ])
    rows = [(i + 1, a, [x * 2 for x in a]) for i, a in enumerate(ARRS)]
    return spark.createDataFrame(rows, schema).cache()


def run(frag, src):
    ctx = ExprContext(resolver=lambda n: frag[n])
    ev = compile_expression(src, ctx)
    col = ev.numeric() if ev.boolean else ev.col
    out = frag.orderBy("id_dim").select(col.alias("r")).collect()
    return [r["r"] for r in out]


def test_scalar_ops(frag):
    got = run(frag, "oph_sum_scalar(measure, 10)")
    for g, a in zip(got, ARRS):
        assert g == [x + 10 for x in a]
    got = run(frag, "oph_mul_scalar(measure, 3)")
    for g, a in zip(got, ARRS):
        assert g == [x * 3 for x in a]
    got = run(frag, "oph_sum_scalar2(measure, 2, 5)")
    for g, a in zip(got, ARRS):
        assert g == [2 * x + 5 for x in a]


def test_array_ops(frag):
    got = run(frag, "oph_sum_array(measure, other)")
    for g, a in zip(got, ARRS):
        assert g == [3 * x for x in a]
    got = run(frag, "oph_max_array(measure, other)")
    for g, a in zip(got, ARRS):
        assert g == [max(x, 2 * x) for x in a]
    got = run(frag, "oph_operation_array(measure, other, 'sub')")
    for g, a in zip(got, ARRS):
        assert g == [-x for x in a]
    assert run(frag, "oph_compare(measure, measure)") == [1, 1, 1]
    assert run(frag, "oph_compare(measure, other)") == [0, 0, 0]


def test_math_predicate_mask(frag):
    got = run(frag, "oph_math(measure, 'sqrt')")
    for g, a in zip(got, ARRS):
        for gg, x in zip(g, a):
            if x >= 0:
                assert gg == pytest.approx(math.sqrt(x))
            else:
                assert gg is None or math.isnan(gg)
    got = run(frag, "oph_predicate(measure, 'x-2', '>=0', 'x*10', '0')")
    for g, a in zip(got, ARRS):
        assert g == [x * 10 if x - 2 >= 0 else 0 for x in a]


def test_subsetting(frag):
    assert run(frag, "oph_get_subarray(measure, 2, 3)") == [a[1:4] for a in ARRS]
    assert run(frag, "oph_get_subarray2(measure, '1:2:end')") == [a[0::2] for a in ARRS]
    assert run(frag, "oph_get_subarray2(measure, '2:3,6:6')") == [a[1:3] + a[5:6] for a in ARRS]
    # 2x3 tensor, keep row 2, cols 1&3
    assert run(frag, "oph_get_subarray3(measure, '2,3', '2:2', '1:2:3')") == [
        [a[3], a[5]] for a in ARRS
    ]
    assert run(frag, "oph_extract(measure, '1,6')") == [[a[0], a[5]] for a in ARRS]


def test_reorder(frag):
    assert run(frag, "oph_reverse(measure)") == [a[::-1] for a in ARRS]
    assert run(frag, "oph_rotate(measure, 2)") == [a[-2:] + a[:-2] for a in ARRS]
    assert run(frag, "oph_rotate(measure, -1)") == [a[1:] + a[:1] for a in ARRS]
    got = run(frag, "oph_shift(measure, 2, 0)")
    assert got == [[0.0, 0.0] + a[:-2] for a in ARRS]
    # permute: 2x3 row-major → transpose to 3x2
    got = run(frag, "oph_permute(measure, '2,3', '2,1')")
    for g, a in zip(got, ARRS):
        m = np.array(a).reshape(2, 3).T.ravel().tolist()
        assert g == m


def test_concat_interlace(frag):
    assert run(frag, "oph_concat(measure, other)") == [a + [2 * x for x in a] for a in ARRS]
    got = run(frag, "oph_interlace(measure, other)")
    for g, a in zip(got, ARRS):
        expect = []
        for x in a:
            expect += [x, 2 * x]
        assert g == expect


def test_reductions(frag):
    assert run(frag, "oph_reduce(measure, 'sum')") == [sum(a) for a in ARRS]
    assert run(frag, "oph_reduce(measure, 'max')") == [max(a) for a in ARRS]
    got = run(frag, "oph_reduce(measure, 'avg')")
    assert got == pytest.approx([np.mean(a) for a in ARRS])
    got = run(frag, "oph_reduce(measure, 'std')")
    assert got == pytest.approx([np.std(a, ddof=1) for a in ARRS])
    assert run(frag, "oph_reduce2(measure, 'sum', 2)") == [
        [a[0] + a[1], a[2] + a[3], a[4] + a[5]] for a in ARRS
    ]
    assert run(frag, "oph_reduce3(measure, 'sum', 2)") == [
        [a[0] + a[2] + a[4], a[1] + a[3] + a[5]] for a in ARRS
    ]


def test_scans(frag):
    assert run(frag, "oph_accumulate(measure)") == [np.cumsum(a).tolist() for a in ARRS]
    got = run(frag, "oph_deaccumulate(oph_accumulate(measure))")
    for g, a in zip(got, ARRS):
        assert g == pytest.approx(a)
    got = run(frag, "oph_moving_avg(measure, 3)")
    for g, a in zip(got, ARRS):
        expect = [np.mean(a[max(0, i - 2): i + 1]) for i in range(len(a))]
        assert g == pytest.approx(expect)


def test_sizes_find(frag):
    assert run(frag, "oph_size_array(measure)") == [6, 6, 6]
    assert run(frag, "oph_count_array(measure)") == [6, 6, 6]
    assert run(frag, "oph_find(measure, 4.0)") == [[4], [3], []]
    assert run(frag, "oph_get_index_array(measure)") == [[1, 2, 3, 4, 5, 6]] * 3


def test_gsl(frag):
    got = run(frag, "oph_gsl_sd(measure)")
    assert got == pytest.approx([np.std(a, ddof=1) for a in ARRS])
    got = run(frag, "oph_gsl_quantile(measure, 0.5)")
    assert got == pytest.approx([np.percentile(a, 50) for a in ARRS])
    got = run(frag, "oph_gsl_boxplot(measure)")
    for g, a in zip(got, ARRS):
        assert g == pytest.approx([
            min(a), np.percentile(a, 25), np.percentile(a, 50), np.percentile(a, 75), max(a)
        ])
    got = run(frag, "oph_gsl_histogram(measure, 3)")
    for g, a in zip(got, ARRS):
        expect, _ = np.histogram(a, bins=3, range=(min(a), max(a)))
        assert g == expect.tolist()
    got = run(frag, "oph_gsl_correlation(measure, other)")
    assert got == pytest.approx([1.0, 1.0, 1.0])
    got = run(frag, "oph_gsl_sort(measure)")
    assert got == [sorted(a) for a in ARRS]


def test_fft_roundtrip(frag):
    got = run(frag, "oph_gsl_complex_get_real(oph_gsl_ifft(oph_gsl_fft(measure)))")
    for g, a in zip(got, ARRS):
        assert g == pytest.approx(a, abs=1e-9)
    got = run(frag, "oph_gsl_idwt(oph_gsl_dwt(measure))")
    for g, a in zip(got, ARRS):
        assert g == pytest.approx(a, abs=1e-9)


def test_fit(frag):
    got = run(frag, "oph_gsl_fit_linear_coeff(measure)")
    for g, a in zip(got, ARRS):
        b, c0 = np.polyfit(np.arange(len(a), dtype=float), a, 1)
        assert g == pytest.approx([c0, b])


def test_norm_quant_padding(frag):
    got = run(frag, "oph_normalize(measure)")
    for g, a in zip(got, ARRS):
        arr = np.array(a)
        assert g == pytest.approx(((arr - arr.mean()) / arr.std(ddof=1)).tolist())
    assert run(frag, "oph_quantize(measure, '0,2')") == [
        [float((x > 0) + (x > 2)) for x in a] for a in ARRS
    ]
    got = run(frag, "oph_padding(measure, 8, 0)")
    assert got == [a + [0.0, 0.0] for a in ARRS]


def test_cast_codecs(frag):
    assert run(frag, "oph_convert_l(measure)") == [[int(x) for x in a] for a in ARRS]
    got = run(frag, "oph_uncompress(oph_compress(measure))")
    assert got == ARRS
    got = run(frag, "oph_from_bin(oph_to_bin(measure))")
    assert got == ARRS


def test_kcluster(frag):
    got = run(frag, "oph_ccluster_kcluster(measure, 2)")
    for g, a in zip(got, ARRS):
        assert len(g) == 2
        assert g == sorted(g)
        assert min(a) <= g[0] <= g[1] <= max(a)
