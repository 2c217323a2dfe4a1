"""Hashed n-gram linear text classifier — the fastText-style model-based
filter step of LLM data pipelines (CCNet's LM filter, GPT-3's quality
classifier, fastText language ID all reduce to this at inference time):
score(doc) = mean over features of w[hash(feature) % D], features = unigrams
plus adjacent-word bigrams, weights trained offline.

Spark shape (100 TB):
- ``score_with_weight_expr``: when the weight table is expressible as a
  Column function of the bucket id (quantized/hashed models, or models
  shipped as closed-form codebooks), scoring is a SINGLE PROJECTION — no
  explode, no join, no shuffle; whole-corpus scoring is embarrassingly
  parallel over file splits.
- ``score_with_weights_df``: the general path — explode features, one
  broadcast hash join against the ``(bucket, weight)`` table (a 2^18-bucket
  model is ~2 MB), groupBy(doc_id) mean.  One shuffle of (doc_id, weight)
  pairs.  If a model ever outgrows broadcast, remove the hint and the same
  plan shuffles on bucket.

The feature hash is the first 8 hex digits of md5 — chosen because Spark
(``conv(substring(md5(t),1,8),16,10)``) and DuckDB
(``CAST('0x' || substr(md5(t),1,8) AS BIGINT)``) compute it identically, so
the correctness gate can mirror the full pipeline in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.text import tokens_col
from ophidia_io_server_spark.sources.tables import spread


def hashed_feature_buckets_col(text: Column, n_buckets: int,
                               bigrams: bool = True) -> Column:
    """array<bigint> of hashed feature buckets: unigrams + ``a_b`` bigrams.
    NULL text degrades to an empty feature array (without the guard,
    ``size(split(NULL))`` is -1 under ANSI-off and n_features goes
    negative)."""
    toks = F.coalesce(tokens_col(text), F.array().cast("array<string>"))
    feats = toks
    if bigrams:
        bi = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
                lambda i: F.concat_ws(
                    "_", F.element_at(toks, i.cast("int")),
                    F.element_at(toks, (i + 1).cast("int"))),
            ),
        ).otherwise(F.array().cast("array<string>"))
        feats = F.concat(toks, bi)
    return F.transform(
        feats,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
            F.lit(n_buckets)),
    )


def score_with_weight_expr(docs: DataFrame, weight_fn, n_buckets: int = 1 << 18,
                           text_col: str = "text", bias: float = 0.0,
                           threshold: float = 0.0,
                           bigrams: bool = True) -> DataFrame:
    """Score every document with ``weight_fn(bucket: Column) -> Column`` in
    one scan-only projection: ``doc_id, n_features, quality_score, keep``.

    ``quality_score`` = bias + mean feature weight (0.0 for featureless
    docs); ``keep`` = score > threshold.  The mean is a left-fold sum so a
    SQL ``list_reduce`` mirror is bitwise-identical."""
    buckets = hashed_feature_buckets_col(F.col(text_col), n_buckets, bigrams)
    score = F.when(
        F.size(buckets) > 0,
        F.lit(bias) + F.aggregate(
            F.transform(buckets, weight_fn),
            F.lit(0.0), lambda a, c: a + c) / F.size(buckets),
    ).otherwise(F.lit(float(bias)))
    return spread(docs).select(
        "doc_id",
        F.size(buckets).cast("bigint").alias("n_features"),
        F.round(score, 6).alias("quality_score"),
        (score > threshold).alias("keep"),
    )


def score_with_weights_df(docs: DataFrame, weights: DataFrame,
                          n_buckets: int = 1 << 18, text_col: str = "text",
                          bias: float = 0.0, threshold: float = 0.0,
                          bigrams: bool = True,
                          broadcast_weights: bool = True) -> DataFrame:
    """General path: ``weights`` is a ``(bucket: bigint, weight: double)``
    table (missing buckets weigh 0).  Explode → broadcast join → per-doc
    mean.  Same output contract as ``score_with_weight_expr``."""
    buckets = hashed_feature_buckets_col(F.col(text_col), n_buckets, bigrams)
    base = spread(docs).select(
        "doc_id", buckets.alias("bs"),
        F.size(buckets).cast("bigint").alias("n_features"))
    w = F.broadcast(weights) if broadcast_weights else weights
    summed = (
        base.select("doc_id", F.explode("bs").alias("bucket"))
        .join(w, "bucket", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("weight", F.lit(0.0))).alias("wsum"))
    )
    score = F.when(
        F.col("n_features") > 0,
        F.lit(bias) + F.coalesce("wsum", F.lit(0.0)) / F.col("n_features"),
    ).otherwise(F.lit(float(bias)))
    return (
        base.select("doc_id", "n_features")
        .join(summed, "doc_id", "left")
        .select(
            "doc_id", "n_features",
            F.round(score, 6).alias("quality_score"),
            (score > threshold).alias("keep"),
        )
    )


def demo_weight_fn(bucket: Column) -> Column:
    """Deterministic stand-in weights in [-1, 1] — a closed form both Spark
    and the SQL oracle compute exactly: ((b·2654435761) mod 2000001)/1e6 − 1.
    Takes the place of offline-trained weights in tests and the gate row."""
    return ((bucket * F.lit(2654435761)) % F.lit(2000001)) / F.lit(1000000.0) - F.lit(1.0)


# -- DSIR importance weights (Xie et al. 2023) -------------------------------


def dsir_logratio_weights(docs: DataFrame, target_pred,
                          n_buckets: int = 1 << 16, text_col: str = "text",
                          alpha: float = 1.0, scale: int = 10_000) -> DataFrame:
    """Per-bucket importance weights for Data Selection via Importance
    Resampling: ``w(f) = ln(p_target(f) / p_raw(f))`` over hashed n-gram
    features, with add-``alpha`` smoothing on both distributions.

    Weights are emitted as INTEGER ``w_int = round(w · scale)`` — summing
    integers is shuffle-order-free, so document scores are bit-reproducible
    across layouts AND mirror exactly in the SQL oracle (a float sum would
    drift in the last ulp with aggregation order).  At ``scale=1e4`` the
    quantization error per feature is ≤ 5e-5 — far below any selection
    threshold anyone uses.

    Returns ``(bucket, w_int)`` with at most ``n_buckets`` rows — broadcast
    range by construction, whatever the corpus size.
    """
    feats = hashed_feature_buckets_col(F.col(text_col), n_buckets)
    base = spread(docs).select(target_pred.alias("_t"), feats.alias("bs"))
    counts = (
        base.select("_t", F.explode("bs").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct"),
            F.count(F.lit(1)).alias("cr"),
        )
    )
    totals = counts.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr")).collect()[0]
    tt, tr = totals["tt"] or 0, totals["tr"] or 0
    a, d = float(alpha), float(n_buckets)
    return counts.select(
        "bucket",
        F.round(
            (F.log((F.col("ct") + a) / (tt + a * d))
             - F.log((F.col("cr") + a) / (tr + a * d))) * scale
        ).cast("bigint").alias("w_int"),
    )


def dsir_scores(docs: DataFrame, target_pred, n_buckets: int = 1 << 16,
                text_col: str = "text", alpha: float = 1.0,
                scale: int = 10_000) -> DataFrame:
    """Score every document by summed importance weight of its features:
    ``doc_id, n_features, dsir_score`` (mean per-feature log ratio, 4 dp;
    0.0 for featureless docs — they carry no evidence either way).

    Plan: the weight table is ≤ ``n_buckets`` rows → broadcast join against
    the exploded corpus features, one groupBy(doc_id) summing INTEGERS, so
    the whole scorer is one corpus shuffle with map-side combine.  Features
    absent from the weight table cannot exist (weights cover every observed
    bucket), so the join is inner."""
    w = dsir_logratio_weights(docs, target_pred, n_buckets, text_col, alpha, scale)
    feats = hashed_feature_buckets_col(F.col(text_col), n_buckets)
    base = spread(docs).select(
        "doc_id", feats.alias("bs"), F.size(feats).cast("bigint").alias("n_features"))
    summed = (
        base.select("doc_id", F.explode("bs").alias("bucket"))
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w_int").alias("wsum"))
    )
    return (
        base.select("doc_id", "n_features")
        .join(summed, "doc_id", "left")
        .select(
            "doc_id", "n_features",
            F.when(F.col("n_features") > 0,
                   F.round(F.coalesce("wsum", F.lit(0))
                           / (F.lit(float(scale)) * F.col("n_features")), 4))
            .otherwise(F.lit(0.0)).alias("dsir_score"),
        )
    )
