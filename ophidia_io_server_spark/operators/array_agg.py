"""Positional-explode element-wise aggregation — the bounded-memory
alternative to ``functions/aggregates.py``'s collect-and-fold forms.

The Column forms hold each group's arrays on one reducer (exactly the
reference's per-group state, fine for normal group widths).  When a single
group spans millions of rows, this variant keeps memory bounded:
posexplode → groupBy(key, pos) hash-aggregate (map-side partial, any
fan-in) → re-assemble the array ordered by position.  One extra shuffle,
O(1) state per (key, pos) — the standard scale shape for element-wise
cross-row reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPS = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
    "mean": F.avg,
}


def elementwise_agg_exploded(df: DataFrame, key_col: str, measure_col: str,
                             op: str = "sum", out_col: str = "agg") -> DataFrame:
    """(key, agg: array) — element-wise ``op`` across every row's array in
    the group, computed via positional explode (memory O(1) per position)."""
    opk = op.lower().removeprefix("oph_")
    if opk not in _OPS:
        raise ValueError(f"elementwise_agg_exploded: unknown op {op!r}")
    agg_fn = _OPS[opk]
    exploded = df.select(F.col(key_col), F.posexplode(F.col(measure_col)).alias("pos", "x"))
    per_pos = exploded.groupBy(key_col, "pos").agg(agg_fn("x").alias("v"))
    return (
        per_pos.groupBy(key_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select(F.col(key_col), F.transform("pv", lambda s: s["v"]).alias(out_col))
    )
