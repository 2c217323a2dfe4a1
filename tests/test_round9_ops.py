"""Round-9 operator units: prefix-filter set join (recall 1.0 vs brute
force), bloom semi-join (no false negatives, exact end result), grid
spatial join (exact vs brute force), Pearson matrix (vs numpy)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_prefix_jaccard_matches_bruteforce(spark):
    from ophidia_io_server_spark.pipeline.setjoin import prefix_jaccard_pairs

    rows = [
        (1, "a b c d"), (2, "a b c e"), (3, "x y z"),
        (4, "x y z"), (5, "a q"), (6, None), (7, ""),
        (8, "b c d a"),  # same SET as 1 in different order -> jaccard 1.0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in prefix_jaccard_pairs(docs, 0.5).collect()}
    # brute force over distinct-token sets
    sets = {i: set(t.split()) for i, t in rows if t}
    want = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j and sets[i] and sets[j]:
                c = len(sets[i] & sets[j])
                u = len(sets[i] | sets[j])
                if u and c / u >= 0.5:
                    want[(i, j)] = round(c / u, 6)
    assert got == want
    assert got[(1, 8)] == 1.0


def test_prefix_jaccard_bad_threshold(spark):
    from ophidia_io_server_spark.pipeline.setjoin import prefix_jaccard_pairs

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        prefix_jaccard_pairs(docs, 0.0)


def test_bloom_no_false_negatives_and_exact_rejoin(spark):
    from ophidia_io_server_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    M, K = 1 << 14, 4
    keys = spark.range(0, 500)
    bl = bloom_build(keys, "id", m_bits=M, k_hashes=K)
    assert bl.first()["n_keys"] == 500
    fact = spark.range(0, 5000)
    pre = (fact.crossJoin(F.broadcast(bl.select("bloom")))
           .where(bloom_might_contain(F.col("bloom"), F.col("id"), M, K)))
    passed = {r["id"] for r in pre.collect()}
    assert set(range(500)) <= passed          # no false negatives, ever
    # exact re-join removes every false positive
    final = pre.join(keys.select(F.col("id").alias("k")),
                     F.col("id") == F.col("k"))
    assert {r["id"] for r in final.collect()} == set(range(500))
    # FP rate within 4x of theory
    fp = len(passed) - 500
    exp = (1 - math.exp(-K * 500 / M)) ** K * 4500
    assert fp <= max(4 * exp, 16)


def test_bloom_build_validates_m(spark):
    from ophidia_io_server_spark.operators.bloom import bloom_build

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(spark.range(3), "id", m_bits=100)


def test_radius_self_join_matches_bruteforce(spark):
    from ophidia_io_server_spark.operators.spatial import radius_self_join

    pts = [(1, 0.10, 0.10), (2, 0.105, 0.10),   # dist 0.005 — in
           (3, 0.10, 0.12),                      # 0.02 from 1 — out
           (4, 0.109, 0.101),                    # near 1/2 across a cell edge
           (5, 0.90, 0.90), (6, 0.9005, 0.9005), (7, None, 0.5)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {(r["id_a"], r["id_b"]) for r in
           radius_self_join(df, 0.01).collect()}
    want = set()
    clean = [(i, x, y) for i, x, y in pts if x is not None]
    for i, xi, yi in clean:
        for j, xj, yj in clean:
            if i < j and (xi - xj) ** 2 + (yi - yj) ** 2 <= 0.01 ** 2:
                want.add((i, j))
    assert got == want and (1, 2) in got and (5, 6) in got


def test_radius_self_join_validates_radius(spark):
    from ophidia_io_server_spark.operators.spatial import radius_self_join

    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    with pytest.raises(ValueError, match="radius"):
        radius_self_join(df, 0.0)


def test_pearson_matrix_matches_numpy(spark):
    import numpy as np

    from ophidia_io_server_spark.operators.profile import pearson_matrix

    rng = np.random.default_rng(7)
    a = rng.integers(0, 100, 200)
    b = a * 2 + rng.integers(0, 10, 200)          # strongly correlated
    c = rng.integers(0, 100, 200)                  # independent
    df = spark.createDataFrame(
        [(int(x), int(y), int(z)) for x, y, z in zip(a, b, c)],
        "a long, b long, c long")
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in pearson_matrix(df, ["a", "b", "c"]).collect()}
    want = np.corrcoef(np.stack([a, b, c]))
    assert got[("a", "b")] == pytest.approx(want[0, 1], abs=1e-6)
    assert got[("a", "c")] == pytest.approx(want[0, 2], abs=1e-6)
    assert got[("b", "c")] == pytest.approx(want[1, 2], abs=1e-6)


def test_pearson_matrix_needs_two_cols(spark):
    from ophidia_io_server_spark.operators.profile import pearson_matrix

    with pytest.raises(ValueError, match=">= 2"):
        pearson_matrix(spark.range(3), ["id"])
