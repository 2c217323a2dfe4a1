"""Z-order clustering: Morton-code correctness vs a Python reference and
the pruning-effectiveness property the layout exists for."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from ophidia_io_server_spark.operators.zorder import (
    zorder_repartition,
    zorder_value,
)


def _interleave(qs: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, q in enumerate(qs):
            z |= ((q >> i) & 1) << (i * len(qs) + j)
    return z


def test_zvalue_matches_reference(spark):
    rng = np.random.default_rng(41)
    rows = [(int(i), float(rng.uniform(0, 1000)), int(rng.integers(0, 100)))
            for i in range(256)]
    df = spark.createDataFrame(rows, "id long, x double, y long")
    bits = 8
    got = {r["id"]: r["zval"]
           for r in zorder_value(df, ["x", "y"], bits=bits).collect()}
    # reference: dense-rank-normalize each column (ties share a code —
    # the deterministic rule; NTILE's within-tie split depended on the
    # sort's arbitrary tie order), scale onto [0, 2^bits), interleave.
    # Checkable for EVERY row, duplicates included.
    nb = 1 << bits

    def codes(vals):
        distinct = sorted(set(vals))
        dr = {v: i + 1 for i, v in enumerate(distinct)}
        mx = len(distinct)
        return {v: (dr[v] - 1) * nb // mx for v in distinct}

    cx = codes([r[1] for r in rows])
    cy = codes([r[2] for r in rows])
    for rid, x, y in rows:
        assert got[rid] == _interleave([cx[x], cy[y]], bits), rid


def test_zvalue_layout_invariant_with_ties(spark):
    """Tied values share a Morton code at every partitioning — the
    determinism NTILE could not give."""
    rows = [(i, i % 7, float(i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a long, b double")
    z1 = {r["id"]: r["zval"] for r in zorder_value(df, ["a", "b"], 8).collect()}
    z2 = {r["id"]: r["zval"]
          for r in zorder_value(df.repartition(17, "b"), ["a", "b"], 8).collect()}
    assert z1 == z2
    by_key = {}
    for i, a, b in rows:
        by_key.setdefault((a, b), set()).add(z1[i])
    assert all(len(s) == 1 for s in by_key.values())


def test_zorder_layout_prunes_both_columns(spark):
    rng = np.random.default_rng(42)
    rows = [(int(i), float(rng.uniform(0, 1000)), float(rng.uniform(0, 1000)))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    parts = 16

    def stats_of(layout):
        # per-partition (min, max) on both columns — the stats a parquet
        # writer would record for pruning
        return (
            layout.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                 F.min("y").alias("y0"), F.max("y").alias("y1"))
            .collect())

    def selectivity(stats, col, lo, hi):
        a, b = (f"{col}0", f"{col}1")
        return sum(1 for s in stats if s[a] <= hi and s[b] >= lo) / len(stats)

    plain = df.repartitionByRange(parts, "x").sortWithinPartitions("x")
    zord = zorder_repartition(df, ["x", "y"], bits=8, num_partitions=parts)
    assert zord.count() == len(rows)
    assert set(zord.columns) == set(df.columns)      # zval dropped
    ps, zs = stats_of(plain), stats_of(zord)
    probes = [(60.0 * k + 10, 60.0 * k + 110) for k in range(15)]
    # the x-only sort prunes x perfectly but cannot prune y AT ALL; the
    # z-order layout prunes BOTH.  That balance is the whole point.
    y_plain = sum(selectivity(ps, "y", lo, hi) for lo, hi in probes) / len(probes)
    y_z = sum(selectivity(zs, "y", lo, hi) for lo, hi in probes) / len(probes)
    x_z = sum(selectivity(zs, "x", lo, hi) for lo, hi in probes) / len(probes)
    assert y_plain > 0.95                      # x-sort reads everything on y
    assert y_z < 0.6, (y_plain, y_z)           # z-order prunes y
    assert x_z < 0.6, (x_z,)                   # ...while still pruning x


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="non-empty"):
        zorder_value(df, [])
    with pytest.raises(ValueError, match="63 bits"):
        zorder_value(df, ["a", "b"], bits=32)
