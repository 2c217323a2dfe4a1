"""End-to-end corpus curation recipe — the documented composition of every
curation operator in this package, in the order real training-data pipelines
run them:

    1. rule filters     — Gopher quality rules + C4 line cleaning (one scan)
    2. PII redaction    — placeholder tokens, counts kept for reporting
    3. exact dedup      — content-hash, keep the minimum doc_id
    4. near-dup dedup   — MinHash-LSH candidates → exact-Jaccard verify →
                          connected components → canonical keeper
    5. span dedup       — ExactSubstr duplicated-window spans cut, canonical
                          occurrence kept
    6. decontamination  — drop docs sharing 8-grams with the eval set
    7. scoring          — hashed n-gram classifier score (optional weights)
                          + optional CCNet-style LM-perplexity ceiling
    8. split            — deterministic train/val/test hash buckets

Every stage is a lazy DataFrame transformation (near-dup CC is the one
operator that runs jobs eagerly, bounded by its round count), so Catalyst
fuses the scan-shaped stages and the whole recipe distributes exactly like
its parts.  ``report=True`` adds one count per stage — 8 small actions —
for the funnel table a data card needs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CurationResult:
    docs: DataFrame                      # curated corpus (text redacted+cut)
    funnel: dict = field(default_factory=dict)   # stage -> surviving docs


def curate_corpus(docs: DataFrame, *, eval_pred: Column | None = None,
                  text_col: str = "text",
                  rule_filters: bool | str = True,
                  gopher_kwargs: dict | None = None,
                  redact_pii: bool = True,
                  near_dup_threshold: float = 0.5,
                  span_window: int = 8,
                  classifier_weight_fn=None,
                  max_perplexity: float | None = None,
                  split_weights: tuple = (0.9, 0.05, 0.05),
                  seed: int = 7,
                  report: bool = False) -> CurationResult:
    """Run the full curation chain over ``docs`` (needs ``doc_id`` and
    ``text_col``).  Returns the curated corpus with ``text`` rewritten
    (redacted, span-cut), per-doc provenance columns (``cluster_id``,
    ``quality_score`` when scoring is on, ``split``), and — with
    ``report=True`` — the per-stage survivor funnel.

    Input docs must not already carry ``n_tokens``/``dup_tokens``/
    ``text_clean`` columns — the span-cut stage refuses to overwrite them
    (ValueError); rename such columns before curating."""
    from ophidia_io_server_spark.pipeline.dedup import (
        exact_duplicates, minhash_lsh_pairs, remove_duplicate_spans,
        resolve_duplicates)
    from ophidia_io_server_spark.pipeline.decontaminate import contamination_flags
    from ophidia_io_server_spark.pipeline.redact import redact_text_col
    from ophidia_io_server_spark.pipeline.sampling import hash_split
    from ophidia_io_server_spark.pipeline.text import (c4_filter_cols,
                                                       gopher_quality_cols)

    funnel: dict = {}

    def note(stage: str, df: DataFrame) -> DataFrame:
        if report:
            funnel[stage] = df.count()
        return df

    cur = note("input", docs)

    # 1. rule filters — one projection computes the selected rule sets.
    # ``rule_filters``: True = Gopher AND C4; "gopher" / "c4" = one set only
    # (C4's terminal-punctuation line rule zeroes out corpora without
    # sentence punctuation — pick "gopher" for such inputs); False = skip.
    # ``gopher_kwargs`` forwards threshold overrides (e.g. a corpus whose
    # vocabulary carries no English stop words needs min_stop_hits=0).
    if rule_filters:
        keeps = []
        if rule_filters in (True, "gopher"):
            keeps.append(gopher_quality_cols(
                F.col(text_col), **(gopher_kwargs or {}))["gopher_keep"])
        if rule_filters in (True, "c4"):
            keeps.append(c4_filter_cols(F.col(text_col))["c4_keep"])
        if not keeps:
            raise ValueError(
                f"rule_filters must be True/False/'gopher'/'c4', got {rule_filters!r}")
        pred = keeps[0]
        for k in keeps[1:]:
            pred = pred & k
        cur = note("rule_filters", cur.where(pred))

    # 2. PII redaction (rewrites the text; dedup then sees redacted content,
    # so identically-redacted docs still dedup together)
    if redact_pii:
        cur = cur.withColumn(text_col, redact_text_col(F.col(text_col)))

    # 3. exact dedup: keep each content hash's minimum doc_id
    reps = exact_duplicates(cur, text_col).select(
        F.col("rep_doc_id").alias("doc_id"))
    cur = note("exact_dedup", cur.join(reps, "doc_id"))

    # 4. near-dup dedup: LSH candidates → exact verify → CC → keep canonical
    pairs = minhash_lsh_pairs(cur, threshold=near_dup_threshold,
                              text_col=text_col)
    resolved = resolve_duplicates(cur, pairs)
    cur = note("near_dedup",
               resolved.where(F.col("is_canonical"))
               .drop("is_canonical", "cluster_size"))

    # 5. span-level ExactSubstr cut (keeps one canonical occurrence)
    if span_window:
        cur = (remove_duplicate_spans(cur, window=span_window,
                                      text_col=text_col)
               .withColumn(text_col, F.col("text_clean"))
               .drop("text_clean", "n_tokens", "dup_tokens"))

    # 6. decontamination against the eval subset
    if eval_pred is not None:
        flags = contamination_flags(cur, eval_pred, text_col=text_col)
        cur = note("decontaminated",
                   cur.join(flags.where(~F.col("contaminated") |
                                        F.col("is_eval"))
                            .select("doc_id"), "doc_id"))

    # 7. model-based scoring (optional)
    if classifier_weight_fn is not None:
        from ophidia_io_server_spark.pipeline.classifier import \
            score_with_weight_expr

        scores = score_with_weight_expr(
            cur, classifier_weight_fn, text_col=text_col
        ).select("doc_id", "quality_score")
        cur = cur.join(scores, "doc_id")

    # 7b. LM-perplexity filter (optional, CCNet-style): self-trained
    # bigram model over the SURVIVING corpus; docs above the absolute
    # perplexity ceiling (gibberish / boilerplate outliers) drop.  Runs
    # after dedup so duplicate mass cannot distort the model's counts.
    if max_perplexity is not None:
        from ophidia_io_server_spark.pipeline.lm import perplexity_scores

        ppl = perplexity_scores(cur, text_col=text_col).select(
            "doc_id", F.col("ppl").alias("perplexity"))
        cur = note("perplexity_filter",
                   cur.join(ppl, "doc_id")
                      .where(F.col("perplexity") <= max_perplexity))

    # 8. deterministic split
    cur = hash_split(cur, list(split_weights), key_col="doc_id", seed=seed)
    out = note("output", cur)
    return CurationResult(docs=out, funnel=funnel)


def curate_stream(docs_stream: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  gopher_kwargs: dict | None = None) -> DataFrame:
    """The STREAMING form of the recipe's stateless prefix: content-hash
    dedup (Structured Streaming state store) → Gopher rule columns → PII
    redaction — everything that needs no corpus-global statistics, applied
    incrementally as documents land.

    Returns a streaming DataFrame with (id, text_redacted, n_words,
    gopher_keep, has_pii).  Corpus-global stages (near-dup CC, span dedup,
    token budgets, splits) stay batch: they need a consistent snapshot by
    definition, and the standard architecture is stream-curate into a
    landing table, then run the batch recipe over snapshots.

    The dedup state is unbounded here (content hashes accumulate); bound
    it with ``withWatermark`` on an event-time column before calling when
    the stream is endless — same trade documented on
    ``streaming/ingest.stateful_dedup_stream``."""
    from ophidia_io_server_spark.pipeline.redact import redact_cols
    from ophidia_io_server_spark.pipeline.text import gopher_quality_cols

    deduped = (
        docs_stream.where(F.col(text_col).isNotNull())
        .withColumn("_h", F.md5(F.col(text_col)))
        .dropDuplicates(["_h"])
    )
    g = gopher_quality_cols(F.col(text_col), **(gopher_kwargs or {}))
    r = redact_cols(F.col(text_col))
    return deduped.select(
        id_col,
        r["text_redacted"].alias("text_redacted"),
        g["n_words"].alias("n_words"),
        g["gopher_keep"].alias("gopher_keep"),
        r["has_pii"].alias("has_pii"),
    )
