"""Time-series grid alignment: gap filling + linear interpolation —
the resample/asfreq operator every metrics pipeline needs (regularize an
irregular event stream onto a fixed step grid, fill the holes).

Shape, and why it scales: the operator works in the INDEX domain (the
caller maps timestamps to integer grid indices, which keeps every
arithmetic step engine-exact — no epoch-second division, no tz
semantics).  The dense grid is a constant-fanout ``explode(sequence)``
per key (linear in keys × steps, no join), the observations attach with
one left equi-join, and the fill is two per-key windows (previous /
next observation carried via ``last/first(..., ignoreNulls)``).  All
windows are partitioned BY KEY — there is no global ordering stage, so
the plan parallelizes per key at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_interpolate(observed: DataFrame, key_cols: list[str],
                         idx_col: str, val_col: str,
                         n_steps: int, start_idx: int = 0) -> DataFrame:
    """Regularize ``observed`` — at most one row per (keys, grid index)
    with index in ``[start_idx, start_idx + n_steps)`` — onto the dense
    per-key grid.

    Adds:
      * ``<val_col>_filled`` — the observed value at observed points;
        linear interpolation between the previous and next observed
        points inside a gap; last-observation-carried-forward after the
        final observation; next-observation-carried-backward before the
        first one;
      * ``fill_kind`` — ``obs`` / ``interp`` / ``locf`` / ``nocb``.

    Other observation columns ride along (NULL on gap rows).  Keys with
    no observations at all do not appear (the key spine is derived from
    ``observed``).  Interpolation weights are integer index deltas cast
    to double — deterministic and bit-identical across engines.
    """
    if n_steps < 1:
        # Spark's sequence(a, b) DESCENDS when b < a, so n_steps=0 would
        # silently yield a 2-row backwards grid instead of an empty one
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    keys = [F.col(c) for c in key_cols]
    from ophidia_io_server_spark.pin import pinned

    # observed is grid-bounded, far smaller than the raw series it
    # summarizes — pin so the caller's upstream aggregation runs once
    observed = pinned(
        observed, "gap-fill observations: feed the key spine AND the grid join")
    spine = (observed.select(*key_cols).distinct()
             .select(*key_cols,
                     F.explode(F.sequence(
                         F.lit(start_idx),
                         F.lit(start_idx + n_steps - 1))).alias(idx_col)))
    j = spine.join(observed, on=key_cols + [idx_col], how="left")

    v = F.col(val_col)
    w_prev = (Window.partitionBy(*keys).orderBy(idx_col)
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy(*keys).orderBy(idx_col)
              .rowsBetween(0, Window.unboundedFollowing))
    pv = F.last(v, ignorenulls=True).over(w_prev)
    pi = F.last(F.when(v.isNotNull(), F.col(idx_col)),
                ignorenulls=True).over(w_prev)
    nv = F.first(v, ignorenulls=True).over(w_next)
    ni = F.first(F.when(v.isNotNull(), F.col(idx_col)),
                 ignorenulls=True).over(w_next)

    frac = (F.col(idx_col) - pi).cast("double") / (ni - pi).cast("double")
    filled = (
        F.when(v.isNotNull(), v)
        .when(pi.isNotNull() & ni.isNotNull(), pv + (nv - pv) * frac)
        .when(pi.isNotNull(), pv)
        .otherwise(nv)
    )
    kind = (
        F.when(v.isNotNull(), F.lit("obs"))
        .when(pi.isNotNull() & ni.isNotNull(), F.lit("interp"))
        .when(pi.isNotNull(), F.lit("locf"))
        .otherwise(F.lit("nocb"))
    )
    return j.withColumn(f"{val_col}_filled", filled).withColumn("fill_kind", kind)
