"""Round-13 wave-5 fused-axis ranking equivalence.

Three bench rows replaced N independent global_dense_rank /
global_prefix_sum chains (each paying its own range-partitioner
sampling pass + driver offset collect) with ONE fused chain over the
axis-tagged union.  The algebra being relied on:

  - dense rank over (axis, key...) minus axis·n equals the per-axis
    rank whenever every axis block holds exactly n distinct keys
    (true when the key is unique per axis, e.g. (value, id)), and
  - the running sum over (axis, v) minus the preceding axes' grand
    total equals the per-axis running sum (true always; the totals per
    axis must be known — the callers' axes all total the same n).

These tests pin that equivalence on data with ties, so a future edit
to the fused unions cannot silently change rank semantics.
"""

from pyspark.sql import functions as F

from ophidia_io_server_spark.operators.ranking import (
    global_dense_rank,
    global_prefix_sum,
)


def test_fused_axis_dense_rank_matches_per_axis(spark):
    # (value, id) unique per axis; values collide across rows and axes
    rows = [(i, v0, v1, v2) for i, (v0, v1, v2) in enumerate(
        [(3, 10, 7), (1, 10, 7), (3, 20, 5), (2, 30, 5), (1, 40, 9)])]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    per_axis = {}
    for col in ("a", "b", "c"):
        r = global_dense_rank(df, [col, "id"], rank_col="rank")
        per_axis[col] = {row["id"]: row["rank"] for row in r.collect()}
    u = None
    for ax, col in enumerate(("a", "b", "c")):
        part = df.select(F.lit(ax).alias("axis"), F.col(col).alias("v"),
                         "id")
        u = part if u is None else u.unionAll(part)
    ranked, max_rank = global_dense_rank(u, ["axis", "v", "id"],
                                         rank_col="rank", return_max=True)
    n = max_rank // 3
    assert n == len(rows)
    got = {(row["axis"], row["id"]): row["rank"] - row["axis"] * n
           for row in ranked.collect()}
    for ax, col in enumerate(("a", "b", "c")):
        for rid, rk in per_axis[col].items():
            assert got[(ax, rid)] == rk, (col, rid)


def _brute_equi_depth(vals, bins):
    """Row-rank reference: rank every row, bucket = ((r-1)*bins)//n."""
    n = len(vals)
    out = {}
    for r, v in enumerate(sorted(vals), start=1):
        b = ((r - 1) * bins) // n
        cnt, lo, hi = out.get(b, (0, v, v))
        out[b] = (cnt + 1, min(lo, v), max(hi, v))
    return {b: t for b, t in out.items()}


def test_equi_depth_histogram_matches_row_rank(spark):
    from ophidia_io_server_spark.pipeline.quantile import (
        equi_depth_histogram,
    )

    # heavy ties straddling bucket boundaries, plus distinct spread
    vals = [5.0] * 7 + [1.0] * 3 + [9.0, 2.0, 2.0, 8.0, 7.5, 7.5, 3.25]
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "x double, id long")
    got = {r["bucket"]: (r["n_rows"], r["lo"], r["hi"])
           for r in equi_depth_histogram(df, "x", ["id"], bins=4).collect()}
    assert got == _brute_equi_depth(vals, 4)
    # fewer rows than bins: empty buckets must be ABSENT, lo/hi clean
    small = [4.0, 4.0, 11.0, 2.5, 30.0]
    dfs = spark.createDataFrame(
        [(v, i) for i, v in enumerate(small)], "x double, id long")
    got = {r["bucket"]: (r["n_rows"], r["lo"], r["hi"])
          for r in equi_depth_histogram(dfs, "x", ["id"], bins=8).collect()}
    assert got == _brute_equi_depth(small, 8)
    assert all(c >= 1 for c, _, _ in got.values())


def test_fused_axis_prefix_sum_matches_per_axis(spark):
    # two count tables with the SAME grand total (the spearman shape)
    cx = spark.createDataFrame(
        [(1, 2), (5, 1), (9, 3)], "v long, c long")
    cy = spark.createDataFrame(
        [(2, 4), (5, 1), (7, 1)], "v long, c long")
    ex = {r["v"]: r["cum"] for r in
          global_prefix_sum(cx, ["v"], "c").collect()}
    ey = {r["v"]: r["cum"] for r in
          global_prefix_sum(cy, ["v"], "c").collect()}
    u = (cx.select(F.lit(0).alias("axis"), "v", "c")
         .unionAll(cy.select(F.lit(1).alias("axis"), "v", "c")))
    fused, total = global_prefix_sum(u, ["axis", "v"], "c",
                                     return_total=True)
    n = int(total) // 2
    assert n == 6
    for r in fused.collect():
        if r["axis"] == 0:
            assert r["cum"] == ex[r["v"]]
        else:
            assert r["cum"] - n == ey[r["v"]]
