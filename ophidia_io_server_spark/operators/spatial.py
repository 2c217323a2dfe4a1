"""Grid-bucketed spatial radius self-join — the distance-join Spark has
no built-in for.

Classic fixed-grid spatial hashing (the uniform-grid special case of
Bentley's fixed-radius near neighbors, 1975; the same cell trick every
spatial engine uses before R-trees): bucket points into square cells of
side = radius, so any pair within ``radius`` lies in the SAME or an
ADJACENT cell (|Δx| ≤ r ⇒ cell indices differ by ≤ 1).  One side
replicates into its 3×3 cell neighborhood (constant 9× fanout), the
join is a plain EQUI-join on the cell id, and the exact Euclidean
predicate filters the survivors — no CartesianProduct anywhere, and the
shuffle key is the cell id, whose skew is the point density.  A hot
cell (one cell holding a large fraction of the points) degrades the
equi-join toward all-pairs WITHIN that cell, so the builder GUARDS it
(r9 verdict #4): one cheap groupBy(cx, cy) max-population check that
raises loudly with the salting recipe instead of silently producing a
quadratic task — the same fail-loud budget discipline as the skyline
candidate budget and the winnowing position budget.

Scale: candidates = Σ_cell |cell|·|3×3 neighborhood| — linear in points
for bounded density.  100 TB shape: one 9× explode + one equi-join +
one filter, all codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_self_join(pts: DataFrame, radius: float, id_col: str = "id",
                     x_col: str = "x", y_col: str = "y",
                     max_cell_rows: int | None = 2_000_000) -> DataFrame:
    """All unordered pairs (id_a, id_b, dist) with Euclidean distance
    ≤ ``radius``; ``dist`` rounded 6.  NULL coordinates are dropped.

    ``max_cell_rows`` bounds the population of any single grid cell:
    candidates within one cell are quadratic in its population (a cell
    of n points meets its 3×3 neighborhood of ≥ n points → ≥ n² pairs
    into the distance filter), so a hot cell past the budget raises a
    RuntimeError carrying the fix (shrink ``radius`` so the grid is
    finer, or salt the hot cell: split it into s sub-cells on a salt
    column and union the s² sub-joins) rather than silently scheduling a
    multi-hour task.  The check is one groupBy + scalar max over the
    (already projected) point table — cheap next to the 9× join.  Pass
    ``None`` to skip when the density bound is known a priori."""
    if radius <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    p = (pts.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
         .select(F.col(id_col).alias("pid"),
                 F.col(x_col).cast("double").alias("px"),
                 F.col(y_col).cast("double").alias("py"),
                 F.floor(F.col(x_col) / radius).alias("cx"),
                 F.floor(F.col(y_col) / radius).alias("cy")))

    if max_cell_rows is not None:
        # the guard's collect below is a full pass over ``p`` anyway, and
        # the join consumes ``p`` twice more (left replicated + right) —
        # a lazy checkpoint lets the guard job materialize the narrow
        # (id, x, y, cell) projection once and both join sides read the
        # blocks instead of re-deriving the points (r13 opt; when the
        # guard is skipped the two-consumer recompute is kept, since the
        # caller asserting a density bound a priori is the
        # very-large-scale path where persisting the point table is the
        # riskier trade).
        p = p.localCheckpoint(eager=False)
        hot = (p.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
               .agg(F.max("n").alias("mx")).collect()[0])
        if hot["mx"] is not None and hot["mx"] > max_cell_rows:
            raise RuntimeError(
                f"radius_self_join: hottest grid cell holds {hot['mx']} "
                f"points (budget {max_cell_rows}); candidates are "
                f"quadratic in cell population. Shrink radius for a "
                f"finer grid, or salt the hot cell (split on a salt key "
                f"into s sub-cells, union the s² sub-joins), or raise "
                f"max_cell_rows deliberately.")

    # Half-neighborhood replication (r13 opt, guide §2.3 — shuffle fewer
    # bytes): an unordered pair of ADJACENT cells only needs to be examined
    # once, so the left side replicates into the antisymmetric half of the
    # 3×3 neighborhood — {(0,0),(0,1),(1,-1),(1,0),(1,1)} — instead of all
    # nine offsets (for any Δcell v ≠ 0 exactly one of ±v is in the set).
    # Same-cell candidates (offset (0,0)) arrive in both orders and keep
    # the id< filter; cross-cell candidates arrive exactly once and are
    # canonicalized with least/greatest.  Identical output pair set —
    # (id_a < id_b, dist ≤ r) — with 5/9 of the replicated rows entering
    # the exchange and the join.
    offs = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
    off = F.expr("explode(array(" + ", ".join(
        f"named_struct('dx', {dx}, 'dy', {dy})" for dx, dy in offs) + "))")
    left = (p.select("pid", "px", "py", "cx", "cy", off.alias("o"))
            .select("pid", "px", "py",
                    (F.col("cx") + F.col("o.dx")).alias("cx"),
                    (F.col("cy") + F.col("o.dy")).alias("cy"),
                    ((F.col("o.dx") == 0) & (F.col("o.dy") == 0))
                    .alias("_same")))
    a = left.select(F.col("pid").alias("ia"), F.col("px").alias("xa"),
                    F.col("py").alias("ya"), "cx", "cy", "_same")
    b = p.select(F.col("pid").alias("ib"), F.col("px").alias("xb"),
                 F.col("py").alias("yb"), "cx", "cy")
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) \
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    return (a.join(b, ["cx", "cy"])
            .where((~F.col("_same") | (F.col("ia") < F.col("ib")))
                   & (d2 <= F.lit(radius * radius)))
            .select(F.least("ia", "ib").alias("id_a"),
                    F.greatest("ia", "ib").alias("id_b"),
                    F.round(F.sqrt(d2), 6).alias("dist")))
