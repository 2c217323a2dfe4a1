"""Skew-mitigation utilities.

AQE's skew-join handles most runtime skew (enabled in session.py), but two
shapes still need explicit treatment at 100 TB:

- ``salted_join``: an equi-join where a handful of hot keys dominate — salt
  the skewed (large) side into S sub-keys and explode the small side across
  all S salts, turning one giant reducer into S balanced ones.  Classic
  manual fallback when the hot side is ALSO too large to broadcast.
- ``salted_count_by_key``: two-phase aggregation for heavily skewed
  group-by-count — partial count on (key, salt), final sum on key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: join types where replicating the small side `salts`× cannot change the
#: result: each big row matches exactly one (key, salt) replica.  right/full
#: outer would emit every UNMATCHED small-side row once per salt — silently
#: duplicated results — so they are rejected.
_SALTED_JOIN_HOW = frozenset({"inner", "left", "left_outer", "left_semi",
                              "left_anti", "semi", "anti"})


def salted_join(big: DataFrame, small: DataFrame, on: str, salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join robust to hot keys in ``big``.

    big gets a random-but-deterministic salt (hash of its row content modulo
    S); small is exploded S× so every (key, salt) pair finds its match.
    Shuffle key = (on, salt) → a hot key's rows split across S reducers.
    ``how`` must keep the small side non-preserved ({'inner', 'left',
    'left_semi', 'left_anti'}) — right/full outer joins would emit each
    unmatched small row once per salt.
    """
    if how not in _SALTED_JOIN_HOW:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the exploded small side "
            f"would duplicate unmatched rows {salts}x; use one of "
            "{'inner','left','left_semi','left_anti'}")
    salt_col = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % salts).cast("int")
    b = big.withColumn("__salt", salt_col)
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    out = b.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_count_by_key(df: DataFrame, key: str, salts: int = 64) -> DataFrame:
    """count(*) per key under extreme key skew: pre-aggregate on (key, salt)
    then combine — the hot key's count is computed by S tasks, not one.

    Salt = spark_partition_id() mod S: deterministic under task retry (a
    re-executed task reads the same input split, unlike
    monotonically_increasing_id whose value depends on scheduling), and it
    is exactly the map-side-combine shape — each input partition contributes
    at most one partial row per key."""
    salted = df.withColumn("__salt", (F.spark_partition_id() % salts).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").cast("bigint").alias("n"))


def bloom_semi_join(left, right, key: str, fpp: float = 0.01,
                    exact: bool = True):
    """Bloom-prefiltered LEFT SEMI join — the selective-join scale pattern
    when the right side's key set is too large to broadcast as values but
    its Bloom bitmap is not (1e7 keys ≈ 12 MB at 1% FP vs GBs of strings).

    The right key set distills to a distributed-built bitmap
    (``pipeline/decontaminate.build_gram_bloom`` — groupBy+bit_or, only
    non-zero words reach the driver); the left side drops every
    definitely-absent row with an Arrow membership probe (zero false
    negatives by construction), and ``exact=True`` finishes with a real
    semi join over the ~fpp-sized survivor set — the expensive shuffle
    now runs on a fraction of the data.  ``exact=False`` keeps the
    (bounded) false positives when the caller tolerates them.

    Keys are compared as strings (the hash input form); cast upstream if
    a collision-relevant type distinction matters."""
    from ophidia_io_server_spark.pipeline.decontaminate import (
        _bloom_member_col,
        build_gram_bloom,
    )

    # Materialize the (keys-only, distinct) right projection ONCE: both the
    # bitmap build and the exact-finish semi join read it, and without the
    # checkpoint each consumer would rescan the full right side.
    rk = (right.select(F.col(key).cast("string").alias("__k")).distinct()
          .localCheckpoint(eager=True))
    bitmap, m, k = build_gram_bloom(rk, "__k", fpp)
    spark = left.sparkSession
    pre = left.where(
        _bloom_member_col(bitmap, m, k, spark, F.col(key).cast("string")))
    if not exact:
        return pre
    return pre.join(rk, pre[key].cast("string") == rk["__k"], "left_semi")
