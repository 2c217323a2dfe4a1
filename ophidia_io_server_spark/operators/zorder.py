"""Z-order (Morton) clustering — the multi-column data-layout tool behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``: rows close in the interleaved-bit
curve are close in EVERY clustered column, so min/max file statistics
prune multi-predicate scans that a single-column sort cannot.

This is a LAYOUT operator, not a query: ``zorder_repartition`` range-
partitions by the Morton value and sorts within partitions, so a
downstream parquet write produces files whose per-column min/max ranges
are tight on all clustered columns simultaneously.

Mechanics (pure Column, no UDF):
- each column is rank-normalized to ``bits``-bit integers via a DENSE
  global rank (``operators/ranking.py::global_dense_rank`` — two-phase
  range partition, NO single-partition window) scaled onto the code
  range with exact integer division.  Distribution-proof (raw value
  scaling would collapse skewed columns onto few codes) and — unlike
  NTILE over a bare ``Window.orderBy``, the first version — both
  DISTRIBUTED and layout-deterministic: NTILE splits equal values
  across adjacent buckets in whatever order the sort delivered them,
  so tied rows' codes depended on partitioning; dense rank gives every
  occurrence of a value the same code.
- bits interleave column-major (bit i of column j lands at position
  ``i·ncols + j``) through a shift-or fold;
- the result is one BIGINT ``zval`` column — cheap to range-partition on.

``bits·ncols`` must fit 63 bits (e.g. 3 columns × 20 bits), and
``(distinct values − 1) · 2^bits`` must fit 63 bits per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window  # noqa: F401  (Window: API compat)
from pyspark.sql import functions as F


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16,
                 out_col: str = "zval") -> DataFrame:
    """Add the Morton code column computed from rank-normalized inputs.

    NULLs rank first (lowest codes) — deterministic, matching NULLS FIRST
    ordering.  The per-column global ranks are layout-maintenance work
    (run at write/compaction time, like OPTIMIZE), not a per-query
    cost."""
    from ophidia_io_server_spark.operators.ranking import global_dense_rank

    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits × {len(cols)} cols exceeds 63 bits")
    n_buckets = 1 << bits
    out = df
    for c in cols:
        ranked, mx = global_dense_rank(out, [c], rank_col=f"__dr_{c}",
                                       return_max=True)
        # exact integer scaling onto [0, n_buckets): dense rank keeps
        # equal values on equal codes at every layout
        out = (ranked.withColumn(
            f"__q_{c}",
            F.expr(f"((`__dr_{c}` - 1) * {n_buckets}) div {max(mx, 1)}"))
            .drop(f"__dr_{c}"))
    ncols = len(cols)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(f"__q_{c}"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return out.withColumn(out_col, z).drop(*[f"__q_{c}" for c in cols])


def zorder_repartition(df: DataFrame, cols: list[str], bits: int = 16,
                       num_partitions: int | None = None) -> DataFrame:
    """Range-partition + sort by the Morton value (then drop it): the
    resulting partition files carry tight min/max ranges on every
    clustered column — write this out and multi-column predicates prune."""
    z = zorder_value(df, cols, bits)
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        z.repartitionByRange(parts, F.col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval")
    )
