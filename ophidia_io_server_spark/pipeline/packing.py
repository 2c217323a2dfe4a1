"""Sequence packing: assign documents to fixed token-budget training
sequences, deterministically and without a global bottleneck.

Two packing disciplines, matching how LLM pretraining actually batches text:

- ``pack_concat_chunks`` — GPT-style "concatenate then chunk": documents are
  laid end-to-end in a deterministic order and the stream is cut every
  ``budget`` tokens; a document may straddle a chunk boundary.  Pure window
  arithmetic (cumulative sums), no Python.
- ``pack_first_fit`` — no-split FIRST-fit: each document lands whole in the
  first open sequence with room (earlier sequences are revisited), sequences
  never exceed ``budget`` (oversized documents get a flagged singleton
  sequence).  Packs tighter than next-fit — never more sequences, often
  fewer.  Inherently sequential per stream, so it runs as per-bucket Arrow
  ``applyInPandas`` over many small deterministic hash buckets.
- ``pack_next_fit`` — no-split next-fit: same contract, but only the
  CURRENT sequence is a candidate; when a document does not fit, the
  sequence is closed for good.  O(1) state per stream (first-fit keeps the
  open-sequence fill list), the classical streaming trade-off.

Scale design: there is no single global order anywhere.  Both operators shard
the corpus into ``n_shards``/``n_buckets`` deterministic streams (hash of the
row key) and pack within each shard independently — each shard's window /
pandas group is executor-sized, so the operators parallelize to any cluster
width.  Sequence identity is the pair (shard, seq_in_shard), which is stable
under repartitioning, task retries, and cluster layout, because every
decision derives from the row key alone (same property as
``pipeline/sampling.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_concat_chunks(df: DataFrame, budget: int, token_col: str = "n_tokens",
                       key_col: str = "doc_id", n_shards: int = 64,
                       shard_expr=None, order_cols=None) -> DataFrame:
    """Concat-then-chunk packing: adds ``pack_shard``, ``seq_in_shard``
    (which budget-sized chunk of the shard's token stream this document
    STARTS in) and ``seq_offset`` (token offset within that chunk).

    The shard stream is the documents in ``order_cols`` order (default: by
    ``key_col``) concatenated end-to-end; chunk k spans tokens
    [k*budget, (k+1)*budget).  Documents may straddle chunks — that is the
    concat-packing contract (the trainer reads the stream, not the rows).

    ``shard_expr`` defaults to ``pmod(xxhash64(key), n_shards)`` —
    deterministic, uniformly balanced.  Pass e.g. ``F.col('doc_id') %
    n_shards`` when an external system must reproduce the assignment with
    plain SQL arithmetic.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    shard = shard_expr if shard_expr is not None else F.pmod(
        F.xxhash64(F.col(key_col)), F.lit(n_shards))
    out = df.withColumn("pack_shard", shard.cast("bigint"))
    w = Window.partitionBy("pack_shard").orderBy(
        *(order_cols or [F.col(key_col)]))
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("bigint")
    return (
        out.withColumn("seq_in_shard", F.floor(start / budget).cast("bigint"))
        .withColumn("seq_offset", (start % budget).cast("bigint"))
    )


_FIT_COLS = ("pack_bucket", "seq_in_bucket", "seq_fill", "oversize")


def _pack_no_split(df: DataFrame, budget: int, token_col: str, key_col: str,
                   n_buckets: int, seed: int, discipline: str) -> DataFrame:
    """Shared no-split packing scaffold: deterministic hash-bucket sharding,
    (xxhash64(seed+1, key), key) visit order inside each bucket, and a
    per-bucket Arrow kernel applying ``discipline`` ('first' or 'next').

    Adds ``pack_bucket``, ``seq_in_bucket``, ``seq_fill`` (tokens already in
    the sequence before this document) and ``oversize`` (document alone
    exceeds the budget → its own flagged sequence: nothing else ever fits
    next to it because its fill already exceeds the budget).

    The pandas kernel sees one bucket at a time (corpus_size / n_buckets
    rows); size ``n_buckets`` so a bucket fits executor memory — the same
    contract as any keyed ``applyInPandas``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    import pandas as pd

    clash = [c for c in _FIT_COLS if c in df.columns]
    if clash:
        raise ValueError(f"input already has packing columns {clash}")

    base = df.withColumn(
        "pack_bucket",
        F.pmod(F.xxhash64(F.lit(seed), F.col(key_col)), F.lit(n_buckets)).cast("bigint"),
    ).withColumn("__ord", F.xxhash64(F.lit(seed + 1), F.col(key_col)))

    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    out_schema = StructType(
        list(base.schema.fields)
        + [
            StructField("seq_in_bucket", LongType()),
            StructField("seq_fill", LongType()),
            StructField("oversize", BooleanType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ord", key_col], kind="mergesort")
        open_fills: list[int] = []  # fill per open sequence, index = seq id
        seqs, fills, overs = [], [], []
        for tok in pdf[token_col]:
            tok = int(tok)
            placed = None
            if discipline == "first":
                # revisit every open sequence, earliest first — O(nseq) scan
                # per doc; nseq is bounded by the bucket, and buckets are
                # executor-sized by construction
                for i, fl in enumerate(open_fills):
                    if fl + tok <= budget:
                        placed = i
                        break
            else:  # next-fit: only the latest sequence is a candidate
                if open_fills and open_fills[-1] + tok <= budget:
                    placed = len(open_fills) - 1
            if placed is None:
                open_fills.append(0)
                placed = len(open_fills) - 1
            seqs.append(placed)
            fills.append(open_fills[placed])
            overs.append(tok > budget)
            open_fills[placed] += tok
        pdf = pdf.copy()
        pdf["seq_in_bucket"] = seqs
        pdf["seq_fill"] = fills
        pdf["oversize"] = overs
        return pdf

    return (
        base.groupBy("pack_bucket").applyInPandas(pack, schema=out_schema)
        .drop("__ord")
    )


def pack_first_fit(df: DataFrame, budget: int, token_col: str = "n_tokens",
                   key_col: str = "doc_id", n_buckets: int = 64,
                   seed: int = 7) -> DataFrame:
    """No-split FIRST-fit packing: each document goes to the EARLIEST open
    sequence with room (revisiting earlier sequences), else opens a new one.
    Never produces more sequences than ``pack_next_fit`` on the same stream,
    and typically fewer — use this when sizing token budgets.

    (Until r5 this name implemented next-fit — a user sizing budgets off the
    name got systematically more, emptier sequences than first-fit promises.)
    """
    return _pack_no_split(df, budget, token_col, key_col, n_buckets, seed,
                          discipline="first")


def pack_next_fit(df: DataFrame, budget: int, token_col: str = "n_tokens",
                  key_col: str = "doc_id", n_buckets: int = 64,
                  seed: int = 7) -> DataFrame:
    """No-split next-fit packing: a document either extends the CURRENT
    sequence or closes it and opens a new one — O(1) packing state per
    stream, at the cost of more sequences than first-fit.  The streaming
    discipline: right when documents arrive incrementally and sequences
    must be emitted as soon as they close."""
    return _pack_no_split(df, budget, token_col, key_col, n_buckets, seed,
                          discipline="next")


def shard_balanced(df: DataFrame, n_shards: int,
                   token_col: str = "n_tokens", key_col: str = "doc_id",
                   partitions: int | None = None,
                   validate_unique: bool = True) -> DataFrame:
    """Deterministic BALANCED shard plan for training-shard writing:
    rank documents by (tokens DESC, key) with the distributed two-phase
    rank (``operators/ranking.py`` — no single-partition window), then
    assign ``shard = (rank − 1) % n_shards`` — round-robin over the
    size-sorted order.

    Provable balance: within round j, shard 0 receives the round's
    largest document and shard S−1 its smallest, so the per-shard totals
    differ by at most Σ_j (a_{jS+1} − a_{jS+S}) ≤ Σ_j (a_{jS+1} −
    a_{(j+1)S+1}), which telescopes to ≤ a₁ = the single largest
    document — max(shard total) − min(shard total) ≤ max doc tokens, for
    ANY token distribution (the LPT-style guarantee without LPT's
    sequential greedy).  Assignment is a pure function of (tokens, key),
    so the plan is stable under repartitioning and retries, like every
    id-keyed decision in this package.

    Returns ``df`` plus a ``shard`` column.  The rank is one range
    exchange + a ≤P-row offset summary; nothing sequential, nothing
    driver-sized.

    PRECONDITION: ``key_col`` must be unique.  The rank is DENSE over
    (tokens DESC, key), so duplicate keys with equal token counts would
    share one rank and all land in the same shard, silently voiding the
    balance bound.  ``validate_unique=True`` (default) checks this with
    one scan aggregate and raises loudly — same discipline as the
    skyline/winnowing budgets; pass False only when uniqueness is
    already guaranteed upstream (e.g. the key IS a primary key)."""
    from ophidia_io_server_spark.operators.ranking import global_dense_rank

    if validate_unique:
        chk = df.agg(F.count(key_col).alias("n"),
                     F.countDistinct(key_col).alias("d")).first()
        if chk["n"] != chk["d"]:
            raise ValueError(
                f"shard_balanced: key_col={key_col!r} is not unique "
                f"({chk['n']} rows, {chk['d']} distinct) — tied keys "
                "share a dense rank and break the max-min <= max-doc "
                "balance bound; deduplicate or pick a unique key")

    ranked = global_dense_rank(
        df.withColumn("_negt", -F.col(token_col).cast("bigint")),
        ["_negt", key_col], partitions)
    return (ranked
            .withColumn("shard",
                        ((F.col("rank") - 1) % n_shards).cast("bigint"))
            .drop("_negt", "rank"))
