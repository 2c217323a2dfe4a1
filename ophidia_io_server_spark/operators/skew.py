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


def salted_join(big: DataFrame, small: DataFrame, on: str, salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join robust to hot keys in ``big``.

    big gets a random-but-deterministic salt (hash of its row content modulo
    S); small is exploded S× so every (key, salt) pair finds its match.
    Shuffle key = (on, salt) → a hot key's rows split across S reducers.
    """
    salt_col = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % salts).cast("int")
    b = big.withColumn("__salt", salt_col)
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    out = b.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_count_by_key(df: DataFrame, key: str, salts: int = 64) -> DataFrame:
    """count(*) per key under extreme key skew: pre-aggregate on (key, salt)
    then combine — the hot key's count is computed by S tasks, not one."""
    salted = df.withColumn("__salt", (F.monotonically_increasing_id() % salts).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").cast("bigint").alias("n"))
