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

import numpy as np
import pandas as pd
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


# -- Bloom-filter prefilter (the beyond-broadcast scale path) ---------------


def _bloom_positions(col, m: int, k: int):
    """array<bigint> of the k bit positions for a gram: k independently
    SEEDED ``xxhash64`` values mod m.  Pure hashing — no multiply/add that
    could overflow, so the construction is identical under ANSI and legacy
    arithmetic (the previous Kirsch-Mitzenmacher ``h1 + i·h2`` needed
    ANSI-off bigint wraparound and a bit-matching numpy reimplementation)."""
    return F.array(*[
        F.pmod(F.xxhash64(col, F.lit(1_000_003 + i)), F.lit(m))
        for i in range(k)
    ])


def build_gram_bloom(grams: DataFrame, col: str = "g",
                     fpp: float = 0.01) -> tuple:
    """Build a Bloom filter over a gram column, distributively.

    Spark's own ``bloom_filter_agg`` is not in the public function registry,
    so the bitmap is assembled with plain DataFrame algebra: k seeded-hash
    bit positions per gram, ``groupBy(word_index).agg(bit_or)`` (map-side
    combined), and only the NON-ZERO 64-bit words ever reach the driver —
    the full bitmap for 1e7 grams at 1% FP is ~12 MB, far under broadcast
    limits where the gram STRINGS would be GBs.

    Returns ``(bitmap: np.ndarray[int64], m_bits: int, k: int)``.
    """
    import math

    n = grams.count()
    if n == 0:
        return np.zeros(1, dtype=np.int64), 64, 1
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64  # whole words
    k = max(1, round(m / n * math.log(2)))
    pos = grams.select(
        F.explode(_bloom_positions(F.col(col), m, k)).alias("p"))
    words = (
        pos.select(F.shiftright("p", 6).alias("w"),
                   F.expr("shiftleft(1L, cast(pmod(p, 64) as int))").alias("bit"))
        .groupBy("w").agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = np.zeros(m // 64, dtype=np.int64)
    for r in words:
        bitmap[int(r["w"])] = np.int64(r["word"])
    return bitmap, m, k


def _bloom_member_col(bitmap, m: int, k: int, spark, gram_col):
    """Membership test Column: positions are computed JVM-side by the SAME
    ``_bloom_positions`` expression the build used, and the Arrow-batched
    UDF only does vectorized bitmap lookups — no arithmetic to keep in sync
    across engines."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(bitmap)

    @pandas_udf("boolean")
    def member(pos: pd.Series) -> pd.Series:
        bm = bc.value
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        idx = np.stack(pos.to_numpy()).astype(np.int64)  # (rows, k)
        hit = (bm[idx >> 6] >> (idx & 63)) & np.int64(1)
        return pd.Series((hit == 1).all(axis=1))

    return member(_bloom_positions(gram_col, m, k))


def contamination_flags_bloom(docs: DataFrame, eval_pred: Column, n: int = 8,
                              text_col: str = "text",
                              fpp: float = 0.01) -> DataFrame:
    """``contamination_flags`` for benchmark sets too large to broadcast as
    gram strings: the corpus side is prefiltered through a Bloom filter of
    the eval grams (a few MB broadcast regardless of eval-set size), then
    the survivors — eval-gram hits plus the fpp false positives — go through
    the same EXACT equi-join, so the output is bit-identical to the
    broadcast path (pytest pins the equivalence).  The exact join's left
    side is now |hits|·(1+fpp) rows instead of the whole corpus gram
    stream, so it shuffles a sliver of the corpus."""
    from ophidia_io_server_spark.pipeline.dedup import shingle_df

    spark = docs.sparkSession
    sh = shingle_df(docs, n, text_col)
    eval_ids = docs.where(eval_pred).select("doc_id")
    eval_grams = (
        sh.join(F.broadcast(eval_ids), "doc_id")
        .select(F.explode("shingles").alias("g"))
        .distinct()
    )
    # persist: the eval-gram set is otherwise re-derived three times (the
    # sizing count, the bitmap build, the exact verify join) — at the very
    # scale this function exists for, that triples the eval-side shingling
    eval_grams = eval_grams.persist()
    try:
        bitmap, m, k = build_gram_bloom(eval_grams, "g", fpp)
    except Exception:
        eval_grams.unpersist()
        raise
    corpus = sh.select("doc_id", F.explode("shingles").alias("g"))
    survivors = corpus.where(
        _bloom_member_col(bitmap, m, k, spark, F.col("g"))
    ).select("doc_id", "g")
    hits = (
        survivors.join(eval_grams, "g")  # exact verify: no broadcast hint —
        .groupBy("doc_id")               # the point is eval > broadcast range
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


def source_overlap_matrix(docs: DataFrame, n: int = 8,
                          group_col: str = "source",
                          text_col: str = "text",
                          memo_key: tuple | None = None) -> DataFrame:
    """Cross-source n-gram overlap matrix — the dataset-audit view of
    contamination: for every pair of sources, how many distinct word
    n-grams they share and the gram-set Jaccard.  High overlap between a
    crawl slice and a curated slice signals mirroring/leakage and informs
    mixing weights.

    Scale shape: grams are reduced to DISTINCT (gram, source) pairs first
    (groupBy with map-side combine — the corpus never self-joins), then the
    pair counts come from a self equi-join on gram whose per-gram fan-out is
    bounded by the number of SOURCES (a handful), not documents.  One row
    per unordered source pair.
    """
    from ophidia_io_server_spark.pipeline.dedup import shingle_df

    sh = shingle_df(docs, n, text_col, memo_key=memo_key)
    gs = (
        docs.select("doc_id", F.col(group_col).alias("src"))
        .join(sh, "doc_id")
        .select("src", F.explode("shingles").alias("g"))
        .distinct()
    )
    sizes = gs.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a, b = gs.alias("a"), gs.alias("b")
    inter = (
        a.join(b, "g")
        .where(F.col("a.src") < F.col("b.src"))
        .groupBy(F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        inter.join(sizes.select(F.col("src").alias("src_a"),
                                F.col("n").alias("n_grams_a")), "src_a")
        .join(sizes.select(F.col("src").alias("src_b"),
                           F.col("n").alias("n_grams_b")), "src_b")
        .select(
            "src_a", "src_b", "n_grams_a", "n_grams_b", "n_shared",
            F.round(F.col("n_shared")
                    / (F.col("n_grams_a") + F.col("n_grams_b")
                       - F.col("n_shared")), 6).alias("jaccard"),
        )
    )
