

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
