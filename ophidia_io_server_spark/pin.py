"""The recompute-per-consumer guard (r8 verdict #7).

Spark DataFrames are lazy PLANS: a DataFrame that feeds two downstream
consumers re-executes its whole upstream once PER CONSUMER unless AQE
happens to grant a ReusedExchange (it rarely does across separate
actions, and never across foreachBatch/loop iterations).  The r8 sweep
found four independent sites where a corpus-sized upstream silently
re-ran — triangle-counting edges (100x probe: 21.6 -> 6.7 s once
pinned), connected-components edges (every CC round re-ran the caller's
whole pair pipeline), the PassJoin dictionary, and the gap-fill
observation summary.

``pinned`` is the one-line rule those sites now share: materialize the
small multi-consumer artifact ONCE (localCheckpoint — executor-local
blocks, lineage truncated) and let every consumer read the blocks.

When to pin:
- the DataFrame feeds >= 2 downstream plans (joins, loop rounds,
  separate actions), AND
- it is much smaller than the upstream that produces it (edge lists,
  dictionaries, per-key summaries — NOT raw corpus projections).

When NOT to pin:
- single-consumer plans (Catalyst pipelines them; a pin only adds a
  materialization barrier and blocks whole-stage codegen fusion),
- corpus-sized intermediates (pinning trades recompute for memory/disk
  pressure the cluster may not have — prefer letting the scan repeat or
  use persist(DISK_ONLY) deliberately).

``tests/test_plan_shapes.py`` asserts the four fixed sites stay pinned:
their final plans must read checkpointed blocks, not re-scan parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pinned(df: DataFrame, note: str, eager: bool = True) -> DataFrame:
    """Materialize ``df`` once for multiple consumers (localCheckpoint:
    lineage truncated, executor-local storage).  ``note`` documents WHY
    this DataFrame qualifies (who the consumers are) — it is carried on
    the returned DataFrame as ``_pin_note`` so audits can enumerate live
    pins."""
    out = df.localCheckpoint(eager=eager)
    out._pin_note = note  # noqa: SLF001 — introspection hook for audits
    return out


def pinned_parallel(*pairs: tuple[DataFrame, str]) -> list[DataFrame]:
    """Eagerly pin several INDEPENDENT DataFrames concurrently.

    Each eager ``localCheckpoint`` is a driver-blocking job; calling
    ``pinned`` back-to-back on independent subplans serializes those
    jobs, leaving executors idle through each job's straggler tail.
    Spark happily runs concurrent jobs from several driver threads
    (FIFO scheduling back-fills the tail of one job with tasks of the
    next), so independent pins are submitted from a small thread pool
    and awaited together.  Results come back in argument order.

    Only for subplans with NO shared un-materialized lineage: a shared
    lazy parent would be raced by both jobs (block-level locks make
    that correct but can duplicate partition compute).  Exceptions
    propagate; all threads are joined before returning."""
    from concurrent.futures import ThreadPoolExecutor

    if len(pairs) == 1:
        df, note = pairs[0]
        return [pinned(df, note)]
    with ThreadPoolExecutor(max_workers=len(pairs)) as pool:
        futs = [pool.submit(pinned, df, note) for df, note in pairs]
        return [f.result() for f in futs]
