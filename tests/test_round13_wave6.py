"""Round-13 wave-6 equivalence pins.

``part_copurchase_pairs`` replaced its distinct-projection + orderkey
self-join pair enumeration with ONE ``groupBy(l_orderkey).collect_set``
shuffle and an in-row sorted-array C(k,2) enumeration (the
association-triples discipline).  The algebra being relied on:

  - ``collect_set`` over the raw rows equals the distinct projection
    (duplicate (orderkey, partkey) rows collapse either way), and
  - enumerating i < j over the SORTED set emits exactly the
    part_a < part_b pairs the self-join's ``where(part_a < part_b)``
    kept — once per order each.

This test pins the in-row form against a literal self-join reference on
data with duplicate rows, single-part orders, and shared parts across
orders, so a future edit cannot silently change pair semantics.
"""

from pyspark.sql import functions as F


def _inrow_pairs(li):
    """The wave-6 production shape (mirrors part_copurchase_pairs)."""
    sets = (li.groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    k = F.size("ps")
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(1), k - 1),
        lambda i: F.transform(
            F.sequence(i + 1, k),
            lambda j: F.struct(
                F.element_at("ps", i.cast("int")).alias("part_a"),
                F.element_at("ps", j.cast("int")).alias("part_b")))))
    return (sets.where(k >= 2)
            .select(F.explode(pairs).alias("p"))
            .select("p.part_a", "p.part_b")
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("nab")))


def _selfjoin_pairs(li):
    """The pre-wave-6 reference shape."""
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (a.join(b, "l_orderkey")
            .where(F.col("part_a") < F.col("part_b"))
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("nab")))


def test_inrow_pair_enumeration_matches_self_join(spark):
    rows = [
        # order 1: three parts, one duplicated row -> C(3,2) pairs once
        (1, 30), (1, 10), (1, 20), (1, 10),
        # order 2: single part -> no pairs either way
        (2, 10),
        # order 3: same pair as order 1's (10, 20) -> nab accumulates
        (3, 20), (3, 10),
        # order 4: two parts sharing one with order 3
        (4, 40), (4, 10),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {(r["part_a"], r["part_b"]): r["nab"]
           for r in _inrow_pairs(li).collect()}
    ref = {(r["part_a"], r["part_b"]): r["nab"]
           for r in _selfjoin_pairs(li).collect()}
    assert got == ref
    assert got[(10, 20)] == 2  # orders 1 and 3
    assert (10, 10) not in got  # duplicate rows never self-pair
