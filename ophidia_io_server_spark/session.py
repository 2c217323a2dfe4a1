"""SparkSession factory with scale-oriented defaults.

Test/bench runs are ``local[N]`` single-JVM, but every knob here is chosen so
the same plans hold on a multi-executor cluster: AQE for runtime re-planning
(skew joins, partition coalescing), Arrow for all pandas-UDF traffic, UTC
session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ophidia-io-server-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for array-analytics workloads."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffledHashJoinFactor", "3")
        # reference C semantics: double division by zero → inf/NaN (no error),
        # out-of-bounds array access → NULL; matches DuckDB doubles too
        .config("spark.sql.ansi.enabled", "false")
        # driver testdata stores TIMESTAMP(NANOS) parquet, which Spark rejects
        # by default; read as long and convert in sources.tables.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def session_key(spark: SparkSession) -> tuple:
    """Stable identity tuple for per-session caches/memos.

    ``applicationId`` alone merges sibling sessions (``spark.newSession()``
    shares the application), and ``id(spark)`` can be reused after GC; the
    JVM ``sessionUUID`` is unique per SparkSession for the app's lifetime.
    Falls back to applicationId-only where the internal accessor is absent
    (e.g. Spark Connect)."""
    app = spark.sparkContext.applicationId
    try:
        return (app, spark._jsparkSession.sessionUUID())
    except Exception:  # noqa: BLE001 — accessor shape varies by deployment
        return (app,)
