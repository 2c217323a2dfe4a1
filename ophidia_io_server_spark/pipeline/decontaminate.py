"""Benchmark decontamination for training corpora.

Standard LLM-pipeline hygiene: a training document is CONTAMINATED when it
shares at least one word n-gram (n=8 here; common practice is 8-13) with
any document of the evaluation/benchmark set — such documents leak eval
answers into training and must be flagged/dropped.

Spark shape (100 TB-safe): the benchmark n-gram set is tiny relative to the
corpus (benchmarks are ~1e5-1e7 grams), so it is built once, deduplicated,
and BROADCAST; the corpus side explodes its n-grams and the flag is one
broadcast semi-join + groupBy(doc_id) — a single shuffle of (doc_id, hit)
pairs, no corpus self-join, no driver collection.  If a benchmark ever
outgrows broadcast range, remove the hint and the same plan becomes a
shuffled equi-join (semantics unchanged).

Gram extraction reuses ``shingle_df`` (pipeline/dedup.py) so the tokenizer
and dedup semantics are shared with the near-dup operators and with their
SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.dedup import shingle_df


def contamination_flags(docs: DataFrame, eval_pred: Column, n: int = 8,
                        text_col: str = "text") -> DataFrame:
    """Per-document contamination report against the benchmark subset.

    ``eval_pred`` selects the benchmark documents (a Column predicate over
    ``docs``).  Returns one row per document: ``doc_id``, ``is_eval``,
    ``n_eval_grams_hit`` (distinct n-grams shared with the benchmark set —
    for eval docs this counts their own grams) and ``contaminated``
    (non-eval doc sharing ≥1 gram with any eval doc).
    """
    sh = shingle_df(docs, n, text_col)
    eval_ids = docs.where(eval_pred).select("doc_id")
    eval_grams = (
        sh.join(F.broadcast(eval_ids), "doc_id")
        .select(F.explode("shingles").alias("g"))
        .distinct()
    )
    hits = (
        sh.select("doc_id", F.explode("shingles").alias("g"))
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_eval_grams_hit"))
    )
    return (
        docs.select("doc_id", eval_pred.alias("is_eval"))
        .join(hits, "doc_id", "left")
        .withColumn("n_eval_grams_hit",
                    F.coalesce("n_eval_grams_hit", F.lit(0).cast("bigint")))
        .withColumn("contaminated",
                    ~F.col("is_eval") & (F.col("n_eval_grams_hit") > 0))
    )
