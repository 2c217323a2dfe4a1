"""Heavy hitters at scale: Misra-Gries per-partition summaries + exact
candidate verification — frequent-item mining whose shuffle volume is
bounded by k·partitions instead of the vocabulary size.

Why not a plain groupBy-count-orderBy?  On a 100 TB corpus the token
vocabulary is billions of keys; the full count table IS the shuffle.  The
two-pass shape here:

1. **Summarize** (narrow): each partition runs the classic Misra-Gries(k)
   counter over its rows — at most k (item, weight) survivors per
   partition.  MG's guarantee: any item with partition-frequency
   > n_p/(k+1) survives its partition, so any item with GLOBAL frequency
   > n/(k+1) survives in at least one partition (its count exceeds the
   threshold in at least one — pigeonhole over the partition sums).
2. **Verify** (one bounded shuffle + one semi-joined exact count): union
   the ≤ k·P candidates, deduplicate, and compute EXACT global counts for
   candidates only via a broadcast semi-join on the corpus.  The output
   counts are exact, and the candidate set provably contains every item
   above the n/(k+1) support threshold — so the exact top-N is the true
   top-N whenever the N-th item clears the threshold (the caller picks k
   accordingly; ``heavy_hitters`` surfaces the threshold so the gate can
   assert it).

The MG kernel is an Arrow ``mapInPandas`` (pure dict arithmetic per
batch); everything after is JVM joins/aggregations.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_partitions(item_col: str, k: int, weight_col: str | None = None):
    """Weighted (batched) Misra-Gries: fold each Arrow batch's
    ``value_counts()`` into the counters, then restore the ≤k invariant by
    repeatedly subtracting the minimum counter from ALL counters (deleting
    the zeroed ones) until ≤k survive.

    Restoring the invariant in one shot is exact: iterated
    subtract-the-min-from-all (the textbook weighted-MG step) stops at the
    first cumulative subtraction T with ≤ k positive counters left, and
    that T is precisely the (k+1)-th largest counter value — so subtract
    it directly.  Guarantee: at every intermediate level t < T at least
    k+1 counters exceed t (else the iterated process would have stopped),
    so the weight removed is ∫₀ᵀ #{cᵢ > t} dt ≥ (k+1)·T, giving
    ΣT ≤ W/(k+1) across passes — any item with partition frequency
    > n_p/(k+1) still survives, same bound as the one-token-at-a-time
    kernel.  Python work per batch drops from O(tokens) dict ops to
    O(uniq) (pandas value_counts + one numpy selection) — the batch's
    duplication factor is the speedup.

    ``weight_col``: run over a PRE-AGGREGATED ``(item, weight)`` table —
    each row folds in as ``weight`` repetitions of ``item`` (the same
    weighted-MG step the batch fold above already performs), so the
    n/(k+1) survivor guarantee holds for the identical underlying
    multiset.  A caller that already built the exact count table ships
    |items| rows across the Python boundary instead of |rows| (guide
    §4: pass fewer rows, same arithmetic)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        counters: dict = {}
        for b in batches:
            if weight_col is not None:
                pairs = b.groupby(item_col, dropna=True)[weight_col] \
                    .sum().items()
            else:
                pairs = b[item_col].value_counts(dropna=True).items()
            for it, w in pairs:
                counters[it] = counters.get(it, 0) + int(w)
            if len(counters) > k:
                vals = np.fromiter(counters.values(), dtype=np.int64,
                                   count=len(counters))
                t = int(np.partition(vals, -(k + 1))[-(k + 1)])
                counters = {it: c - t for it, c in counters.items() if c > t}
        yield pd.DataFrame({"item": list(counters.keys())})

    return run


def heavy_hitter_candidates(df: DataFrame, item_col: str, k: int = 64,
                            weight_col: str | None = None) -> DataFrame:
    """Distinct Misra-Gries survivors across partitions (≤ k·P rows before
    the distinct) — guaranteed superset of every item with global
    frequency > n/(k+1).  Works for any atomic item type (the Arrow
    output schema mirrors the input column's type); nested types would
    need hashable keys and are rejected by Arrow anyway.

    ``weight_col``: treat ``df`` as a pre-aggregated ``(item, weight)``
    table (see ``_mg_partitions``) — the survivor guarantee is over the
    same multiset, so any exact-verified top-N whose N-th count clears
    the n/(k+1) threshold is unchanged."""
    item_type = df.schema[item_col].dataType.simpleString()
    cols = [F.col(item_col).alias("item")]
    if weight_col is not None:
        cols.append(F.col(weight_col).alias("_w"))
    cand = df.select(*cols).mapInPandas(
        _mg_partitions("item", k, "_w" if weight_col else None),
        f"item {item_type}")
    return cand.distinct()


def heavy_hitters(df: DataFrame, item_col: str, k: int = 64,
                  top_n: int | None = None,
                  counts: DataFrame | None = None) -> DataFrame:
    """(item, cnt) with EXACT counts for the MG candidate set, optionally
    truncated to the top ``top_n`` by (cnt desc, item).  Exact-correct
    top-N whenever the N-th true count exceeds n/(k+1) — pick
    ``k ≥ n/count_N − 1``.

    ``counts``: optional pre-aggregated exact ``(item, cnt)`` table (same
    universe as ``df``'s item stream).  BOTH phases then read the
    summary instead of the corpus (r13 opt — callers that already built
    the item-count table for another consumer save the raw-stream
    passes entirely): the exact-count verify phase semi-joins it, and
    the MG candidate pass runs WEIGHTED over it — |items| rows across
    the Python boundary instead of |rows| (guide §4).  The weighted MG
    summary keeps the same n/(k+1) survivor guarantee over the same
    multiset, so the exact-verified top-N is unchanged whenever the
    N-th count clears the threshold (the contract the caller picks k
    for; pinned by tests/test_heavy.py::test_weighted_counts_path)."""
    if counts is not None:
        cand = heavy_hitter_candidates(counts, "item", k, weight_col="cnt")
    else:
        cand = heavy_hitter_candidates(df, item_col, k)
    if counts is not None:
        exact = counts.join(F.broadcast(cand), on="item", how="left_semi") \
            .select("item", F.col("cnt").cast("bigint").alias("cnt"))
    else:
        exact = (
            df.select(F.col(item_col).alias("item"))
            .join(F.broadcast(cand), on="item", how="left_semi")
            .groupBy("item").agg(F.count(F.lit(1)).cast("bigint")
                                 .alias("cnt"))
        )
    if top_n is not None:
        exact = exact.orderBy(F.col("cnt").desc(), F.col("item").asc()).limit(top_n)
    return exact


def _cms_positions(item: Column, depth: int, width: int, seed: int) -> Column:
    """The d counter positions of ``item``: row r uses ``xxhash64(item,
    seed+r)`` reduced mod width (pmod keeps it non-negative).  Independent
    seeds per row stand in for the pairwise-independent hash family of
    Cormode & Muthukrishnan 2005 §3."""
    return F.array(*[
        F.pmod(F.xxhash64(item, F.lit(seed + r)), F.lit(width))
        for r in range(depth)
    ])


def countmin_build(df: DataFrame, item_col: str, depth: int = 5,
                   width: int = 2048, seed: int = 7,
                   weight_col: str | None = None) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a tiny DataFrame
    of ``(r, pos, cnt)`` counters — a mergeable frequency summary whose
    size is depth·width REGARDLESS of corpus size.

    Spark shape: posexplode of the d positions, then one
    ``groupBy(r, pos).count()`` — map-side combine reduces every partition
    to ≤ depth·width rows before the single bounded shuffle, so at 100 TB
    the exchange carries O(partitions · d · w) counter rows, never the
    vocabulary.  Sketches of disjoint corpus shards merge by summing
    counters (the same groupBy), which is what makes this the streaming /
    federated complement to the exact MG+verify pipeline above.

    ``weight_col``: build from a PRE-AGGREGATED ``(item, weight)`` table —
    counters become Σweight per position, bitwise the counters the raw
    stream would produce (same hash family, same additions grouped by
    item first).  A caller holding distinct-item counts explodes
    |items|·d rows instead of |rows|·d (r13 opt: the lineitem sketch's
    explode+hash volume drops by the key-duplication factor)."""
    pos = _cms_positions(F.col(item_col), depth, width, seed)
    base = df.where(F.col(item_col).isNotNull())
    if weight_col is None:
        return (base
                .select(F.posexplode(pos).alias("r", "pos"))
                .groupBy("r", "pos")
                .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    return (base
            .select(F.posexplode(pos).alias("r", "pos"),
                    F.col(weight_col).alias("_w"))
            .groupBy("r", "pos")
            .agg(F.sum("_w").cast("bigint").alias("cnt")))


def countmin_estimate(sketch: DataFrame, queries: DataFrame, item_col: str,
                      depth: int = 5, width: int = 2048,
                      seed: int = 7) -> DataFrame:
    """Point-estimate ``est`` for each distinct query item: min over the
    item's d counters (0 for a counter no item hashed to).  Guarantees:
    ``est >= true count`` always (every occurrence increments all d of the
    item's counters); overshoot per counter row has mean (N − c_i)/width,
    and the min over d rows exceeds t·N/width with probability ≤ t^−d
    (Markov per row, independent rows).

    The sketch side is ≤ depth·width rows — broadcast it; the probe is
    map-only over the queries."""
    q = queries.select(F.col(item_col).alias("item")).where(
        F.col("item").isNotNull()).distinct()
    qpos = q.select(
        "item",
        F.posexplode(_cms_positions(F.col("item"), depth, width, seed))
         .alias("r", "pos"),
    )
    return (
        qpos.join(F.broadcast(sketch), on=["r", "pos"], how="left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint")
              .alias("est"))
    )


def countmin_inner_product(ska: DataFrame, skb: DataFrame) -> DataFrame:
    """Equi-join SIZE estimate from two Count-Min sketches (Cormode &
    Muthukrishnan 2005 §4.2): ``|A ⋈_k B| = Σ_k fA(k)·fB(k)`` is
    estimated by ``min over rows r of Σ_pos cA(r,pos)·cB(r,pos)``.

    Guarantees: ``est ≥ exact`` UNCONDITIONALLY (expanding the per-bucket
    product picks up every same-key term plus non-negative collision
    cross-terms), and a single row's overshoot exceeds ``t·NA·NB/width``
    with probability ≤ 1/t (Markov: expected collision mass per row is ≤
    NA·NB/width), so the min over d independent rows exceeds it with
    probability ≤ t^−d.

    This is the optimizer-statistics primitive: join cardinality for ANY
    key pair from two d·w counter tables built in one pass each — no
    sampling re-scan, mergeable across shards (counters sum), usable to
    pick broadcast-vs-shuffle or detect a blow-up join BEFORE running it.
    Both sketch sides are ≤ d·w rows; the probe join broadcasts one and
    never touches raw data.  Returns a single row ``(est)``."""
    a = ska.select("r", "pos", F.col("cnt").alias("ca"))
    b = skb.select("r", "pos", F.col("cnt").alias("cb"))
    return (
        a.join(F.broadcast(b), on=["r", "pos"])
        .groupBy("r")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
        .agg(F.min("ip").cast("bigint").alias("est"))
    )
