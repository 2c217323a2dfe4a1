"""Adversarial-skew probe (r6 verdict #8): prove the repo's skew defenses
actually FIRE on the --skew replica (scripts/make_10x.py --skew), not just
in isolated unit tests.

Measurements, one JSON line each:
1. AQE skew-join: events x user-dim equi-join on the 90%-hot user_id
   with skew-join thresholds lowered to local scale -- asserts the
   executed plan contains the skew-split marker.  Two preconditions were
   DISCOVERED by this probe failing (both now documented in PERF.md):
   (a) both join inputs must be independent shuffle stages -- a self-join
   against a groupBy on the join key shares one exchange, which AQE
   cannot re-split; (b) the upstream must have >1 map task -- skew-split
   granularity is map-output blocks, so a single-file scan is
   unsplittable (spread() is the fix, for a second reason beyond CPU
   parallelism).
2. salted_join on the same hot key vs the plain join: row-count identity
   + wall time.
3. As-of join on the hot key with and without the bucket_seconds
   pre-bucketing fix: row identity + wall time.
4. MinHash/LSH on the planted 10-clique corpus: candidate and verified
   pair counts + wall time (the quadratic regime is bounded to the
   cliques; exact dedup before LSH is the production recipe order).

Usage: python scripts/skew_probe.py [skew_sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ophidia_io_server_spark.sources.tables import load_table


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, round(time.monotonic() - t0, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ophidia_sf10x_skew"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        # local-scale thresholds so the 90%-hot partition qualifies as
        # skewed (the production defaults are 256MB / 5x median)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        # keep the join a sort-merge join (skew-split only applies there)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # spread() matters here for a SECOND reason beyond CPU parallelism
    # (measured, PERF.md r7): AQE splits a skewed reduce partition at MAP
    # BLOCK granularity, so a single-file scan (1 mapper) makes every
    # reduce partition one indivisible block and skew-split silently never
    # fires no matter the thresholds.
    from ophidia_io_server_spark.sources.tables import spread

    ev = spread(load_table(spark, sf_dir, "events"), 16).localCheckpoint()
    hot = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    total = ev.count()

    # 1. AQE skew-join on the hot key ------------------------------------
    # props rides along so the hot partition's shuffle BYTES (what the AQE
    # stats see, post-compression) clear the lowered threshold; the plan
    # must come from the COLLECTED DataFrame's own QueryExecution (count()
    # builds a separate one that never adapts).
    #
    # MEASURED GOTCHA (PERF.md r7): when both join sides derive from the
    # SAME exchange (self-join against a groupBy on the join key), Catalyst
    # reuses the exchange for both consumers and OptimizeSkewedJoin cannot
    # re-split the shared stage -- skew handling silently never fires.  The
    # dim side is round-tripped through parquet into a genuinely separate
    # source (what a real pipeline's separately-materialized dimension is);
    # a checkpoint is NOT enough -- it preserves the groupBy's hash
    # partitioning, the SMJ then reads it exchange-free, and a non-shuffle
    # child cannot be replicated against the split partitions either.
    dim_path = f"/tmp/ophidia_skew_userdim"
    (ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_user"))
     .write.mode("overwrite").parquet(dim_path))
    a = ev.select(F.col("user_id"), F.col("event_id").alias("ea"), "props")
    b = spark.read.parquet(dim_path)
    j = a.join(b, on="user_id")
    (rows, t) = timed(lambda: j.collect())
    plan = j._jdf.queryExecution().executedPlan().toString()
    skew_marker = "skew=true" in plan or "AQEShuffleRead skewed" in plan
    print(json.dumps({
        "probe": "aqe_skew_join", "rows": len(rows), "sec": t,
        "hot_user": hot["user_id"], "hot_share": round(hot["count"] / total, 3),
        "skew_split_in_plan": bool(skew_marker),
    }))

    # 2. salted_join vs plain join ---------------------------------------
    from ophidia_io_server_spark.operators.skew import salted_join

    (n_plain, t_plain) = timed(lambda: a.join(b, on="user_id").count())
    (n_salt, t_salt) = timed(
        lambda: salted_join(a, b, on="user_id", salts=16).count())
    print(json.dumps({
        "probe": "salted_join", "rows_plain": n_plain, "rows_salted": n_salt,
        "identical": n_plain == n_salt,
        "sec_plain": t_plain, "sec_salted": t_salt,
    }))

    # 3. as-of join: bucket_seconds fix on vs off ------------------------
    from ophidia_io_server_spark.operators.temporal import asof_join

    left = ev.select("user_id", "ts", "event_id", "value")
    right = (ev.where(F.col("event_type") == "purchase")
             .select("user_id", F.col("ts").alias("rts"),
                     F.col("event_id").alias("rid")))
    kw = dict(on="user_id", ts_col="ts", right_ts_col="rts", seq_col="rid")
    (n_off, t_off) = timed(lambda: asof_join(left, right, **kw).count())
    (n_on, t_on) = timed(lambda: asof_join(
        left, right, bucket_seconds=86400, **kw).count())
    ident = bool(
        asof_join(left, right, **kw)
        .exceptAll(asof_join(left, right, bucket_seconds=86400, **kw))
        .count() == 0)
    print(json.dumps({
        "probe": "asof_bucket_seconds", "rows_off": n_off, "rows_on": n_on,
        "row_identical": ident, "sec_off": t_off, "sec_on": t_on,
    }))

    # 4. MinHash/LSH on the planted clique corpus ------------------------
    from ophidia_io_server_spark.pipeline.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").localCheckpoint()
    (n_exact, t_exact) = timed(
        lambda: exact_duplicates(docs).where(F.col("n_docs") >= 2).count())
    (pairs, t_mh) = timed(lambda: minhash_lsh_pairs(docs).count())
    print(json.dumps({
        "probe": "minhash_clique", "n_docs": docs.count(),
        "exact_dup_classes": n_exact, "verified_pairs": pairs,
        "sec_exact": t_exact, "sec_minhash": t_mh,
    }))


if __name__ == "__main__":
    main()
