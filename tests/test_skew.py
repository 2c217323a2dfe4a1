

def test_bloom_semi_join_exact_and_prefilter(spark):
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.operators.skew import bloom_semi_join

    left = spark.createDataFrame([(i, f"k{i % 500}") for i in range(5000)],
                                 "row_id long, key string")
    right = spark.createDataFrame([(f"k{i}",) for i in range(0, 500, 7)],
                                  "key string")
    exact_keys = {f"k{i}" for i in range(0, 500, 7)}
    got = bloom_semi_join(left, right, "key").collect()
    assert {r["key"] for r in got} == exact_keys
    assert len(got) == sum(1 for i in range(5000) if f"k{i % 500}" in exact_keys)
    # approximate mode: superset with zero false negatives
    approx = {r["key"] for r in
              bloom_semi_join(left, right, "key", exact=False).collect()}
    assert exact_keys <= approx
    # numeric keys work through the string cast
    ln = spark.createDataFrame([(i,) for i in range(1000)], "v long")
    rn = spark.createDataFrame([(i,) for i in range(0, 1000, 9)], "v long")
    got_n = {r["v"] for r in bloom_semi_join(ln, rn, "v").collect()}
    assert got_n == set(range(0, 1000, 9))


def test_salted_join_rejects_small_side_preserving_how(spark):
    import pytest
    from ophidia_io_server_spark.operators.skew import salted_join

    big = spark.createDataFrame([(i, i % 3) for i in range(30)], "v long, k long")
    small = spark.createDataFrame([(0, "a"), (99, "zz")], "k long, tag string")
    for bad in ("right", "right_outer", "full", "full_outer", "outer", "cross"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(big, small, on="k", how=bad)
    # left join keeps unmatched BIG rows exactly once (never duplicated)
    got = salted_join(big, small, on="k", how="left").collect()
    assert len(got) == 30
    assert sum(1 for r in got if r["tag"] is None) == 20  # k in {1,2}


def test_salted_count_salt_is_retry_deterministic(spark):
    """The salt column must depend only on the input split, never on
    scheduling (no monotonically_increasing_id)."""
    import inspect

    from ophidia_io_server_spark.operators import skew
    from ophidia_io_server_spark.operators.skew import salted_count_by_key

    src = inspect.getsource(skew)
    assert "monotonically_increasing_id(" not in src  # no CALL (prose ok)
    df = spark.createDataFrame(
        [("hot",)] * 5000 + [(f"k{i}",) for i in range(50)], "k string"
    ).repartition(8)
    got = {r["k"]: r["n"] for r in salted_count_by_key(df, "k").collect()}
    assert got["hot"] == 5000 and len(got) == 51
