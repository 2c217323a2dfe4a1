"""Sliding-window document chunking — the context-window preparation step
(split long documents into overlapping fixed-size token windows) that sits
between curation and sequence packing in a training-data pipeline.

Window rule (the tokenizer-overflow convention): starts at
``0, stride, 2·stride, …``; the last start is the smallest multiple of
``stride`` whose window reaches the document end —
``ceil((n − window)/stride)·stride`` for ``n > window``, else ``0``.  Every
token is covered, every window except possibly the last has exactly
``window`` tokens, and no window is a fully-contained suffix duplicate of
its predecessor.  All boundary arithmetic is integer, so the SQL oracle
reproduces it exactly.

Scale shape: one narrow projection + one ``explode`` — no shuffle at all.
Chunk count per document is ~n/stride, so output size is input·(window/
stride) tokens; the explode is the plan Spark pipelines into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.text import tokens_col


def chunk_sliding(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (document, window): ``chunk_idx`` (0-based), ``chunk_start``
    (token offset), ``n_chunk_tokens`` and the reassembled ``chunk_text``.
    Documents with no tokens (NULL/blank text) emit no chunks."""
    if window <= 0 or stride <= 0:
        raise ValueError(f"window and stride must be positive, got {window}, {stride}")
    if stride > window:
        raise ValueError(f"stride {stride} > window {window} would skip tokens")
    toks = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens_col(F.col(text_col)).alias("tk"))
        .withColumn("n", F.size("tk").cast("bigint"))
        .where(F.col("n") > 0)
    )
    # integer ceil-division (`div`, never `/` — double quotients truncate
    # wrong past 2^52): smallest stride multiple reaching the end
    last = F.when(
        F.col("n") <= window, F.lit(0).cast("bigint")
    ).otherwise(
        F.expr(f"((n - {window} + {stride} - 1) div {stride}) * {stride}")
    )
    chunks = (
        toks.withColumn("chunk_start", F.explode(F.sequence(F.lit(0).cast("bigint"),
                                                            last, F.lit(stride))))
        .withColumn("ck", F.slice("tk", F.col("chunk_start").cast("int") + 1, window))
    )
    return chunks.select(
        id_col,
        F.expr(f"chunk_start div {stride}").alias("chunk_idx"),
        F.col("chunk_start"),
        F.size("ck").cast("bigint").alias("n_chunk_tokens"),
        F.array_join("ck", " ").alias("chunk_text"),
    )
