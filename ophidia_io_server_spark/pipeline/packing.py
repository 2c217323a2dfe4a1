"""Sequence packing: assign documents to fixed token-budget training
sequences, deterministically and without a global bottleneck.

Two packing disciplines, matching how LLM pretraining actually batches text:

- ``pack_concat_chunks`` — GPT-style "concatenate then chunk": documents are
  laid end-to-end in a deterministic order and the stream is cut every
  ``budget`` tokens; a document may straddle a chunk boundary.  Pure window
  arithmetic (cumulative sums), no Python.
- ``pack_first_fit`` — no-split next-fit: each document lands whole in the
  first sequence with room, sequences never exceed ``budget`` (oversized
  documents get a flagged singleton sequence).  Inherently sequential per
  stream, so it runs as per-bucket Arrow ``applyInPandas`` over many small
  deterministic hash buckets.

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


_FIRST_FIT_COLS = ("pack_bucket", "seq_in_bucket", "seq_fill", "oversize")


def pack_first_fit(df: DataFrame, budget: int, token_col: str = "n_tokens",
                   key_col: str = "doc_id", n_buckets: int = 64,
                   seed: int = 7) -> DataFrame:
    """No-split next-fit packing: adds ``pack_bucket``, ``seq_in_bucket``,
    ``seq_fill`` (tokens already in the sequence before this document) and
    ``oversize`` (document alone exceeds the budget → its own flagged
    sequence).

    Within each deterministic hash bucket, documents are visited in
    (xxhash64(seed, key), key) order — a stable pseudo-shuffle — and appended
    to the current sequence unless that would exceed ``budget``, in which
    case a new sequence starts.  Next-fit (not best-fit) keeps the visit
    order the only state, so the result is reproducible row-for-row.

    The pandas kernel sees one bucket at a time (corpus_size / n_buckets
    rows); size ``n_buckets`` so a bucket fits executor memory — the same
    contract as any keyed ``applyInPandas``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    import pandas as pd

    clash = [c for c in _FIRST_FIT_COLS if c in df.columns]
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
        seq, fill = 0, 0
        seqs, fills, overs = [], [], []
        first = True
        for tok in pdf[token_col]:
            tok = int(tok)
            if not first and fill + tok > budget:
                seq, fill = seq + 1, 0
            seqs.append(seq)
            fills.append(fill)
            overs.append(tok > budget)
            fill += tok
            first = False
        pdf = pdf.copy()
        pdf["seq_in_bucket"] = seqs
        pdf["seq_fill"] = fills
        pdf["oversize"] = overs
        return pdf

    return (
        base.groupBy("pack_bucket").applyInPandas(pack, schema=out_schema)
        .drop("__ord")
    )
