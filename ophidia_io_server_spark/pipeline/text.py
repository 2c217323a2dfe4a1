"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

Every feature here is a pure Column expression (JVM-side, codegen, no Python)
whose arithmetic is integer/exact or explicitly rounded, so the DuckDB oracle
can reproduce values bit-for-bit at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FP_MOD = 1_000_000_007
_FP_MUL = 31


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empties dropped (mirrors SQL list_filter/split)."""
    return F.filter(F.split(text, " "), lambda w: w != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("bigint")


def distinct_token_count_col(text: Column) -> Column:
    return F.size(F.array_distinct(tokens_col(text))).cast("bigint")


# GPT-2-style pre-tokenizer classes (letters / digits / other-symbol runs,
# optionally preceded by one space) — deliberately lookahead-free so the Java
# regex engine (Spark) and RE2 (DuckDB oracle) match identically.
BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_tokens_col(text: Column) -> Column:
    """BPE-ish pre-tokenization: the unit a byte-pair encoder would merge
    within.  A proxy for LLM token counts that needs no vocab file."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count_col(text: Column) -> Column:
    return F.size(bpe_tokens_col(text)).cast("bigint")


def fingerprint_col(text: Column) -> Column:
    """Polynomial rolling hash over character codes: h = (h*31 + code) mod 1e9+7.

    Pure integer fold — identical in any engine; the scale-friendly stand-in
    for content-defined fingerprints (one pass, no Python)."""
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes, F.lit(0).cast("bigint"), lambda h, c: (h * _FP_MUL + c) % _FP_MOD
    )


EN_STOPWORDS = ("the", "a", "an", "of", "and", "is", "to", "in", "that", "it",
                "on", "for", "as", "with", "was", "are", "be", "this", "by", "at")


def stopword_ratio_col(text: Column) -> Column:
    """Fraction of tokens that are (English) stopwords — the classic junk /
    boilerplate discriminator in quality scoring."""
    t = tokens_col(text)
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    hits = F.size(F.filter(t, lambda w: F.array_contains(sw, F.lower(w))))
    return F.round(hits / F.size(t), 4)


def punct_ratio_col(text: Column) -> Column:
    """Fraction of characters that are punctuation/symbols (not alnum, not
    whitespace)."""
    total = F.length(text)
    stripped = F.length(F.regexp_replace(text, r"[^A-Za-z0-9\s]", ""))
    return F.round((total - stripped) / total, 4)


def mean_token_len_col(text: Column) -> Column:
    t = tokens_col(text)
    total = F.aggregate(t, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w))
    return F.round(total / F.size(t), 4)


# language-ID marker words: tiny per-language stopword sets.  The heuristic is
# argmax over languages of marker-token count (ties → lexicographically first
# language), 'und' when nothing matches.  Deterministic and SQL-expressible.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "is", "to", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "una", "por"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}


def lang_scores(text: Column) -> dict[str, Column]:
    t = tokens_col(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(t, lambda w: F.array_contains(marker_arr, w))).cast("bigint")
    return out


def lang_id_col(text: Column) -> Column:
    """argmax marker-count; ties → lexicographically first language; 'und' if
    no marker hits.  (SQL mirror: CASE ladder over langs in alphabetical
    order comparing each count to greatest(...).)"""
    scores = lang_scores(text)
    ranked = F.array_sort(
        F.array(*[
            F.struct((-scores[lang]).alias("ns"), F.lit(lang).alias("lang"))
            for lang in sorted(scores)
        ])
    )
    top = F.element_at(ranked, 1)
    return F.when(-top["ns"] > 0, top["lang"]).otherwise(F.lit("und"))


# -- repetition signals (Gopher-style quality filters) -----------------------
#
# "Scaling Language Models: Methods, Analysis & Insights from Training
# Gopher" (Rae et al. 2021, §A1.1) filters documents by duplicate-line /
# duplicate-n-gram fractions.  The line signals are pure Column expressions;
# the n-gram signals need per-(doc, gram) counts, so they are DataFrame-level
# explode→groupBy aggregations (shuffle bounded by corpus token count — the
# scale-safe shape; per-doc O(k²) array expressions would be quadratic in
# document length).


def lines_col(text: Column) -> Column:
    """Non-empty lines (split on newline, trimmed empties dropped)."""
    return F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")


def dup_line_frac_col(text: Column) -> Column:
    """Fraction of lines that are repeats of an earlier line:
    (n_lines - n_distinct_lines) / n_lines; 0.0 for single-line docs."""
    ls = lines_col(text)
    n = F.size(ls)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.round((n - F.size(F.array_distinct(ls))) / n, 4))


def dup_line_char_frac_col(text: Column) -> Column:
    """Fraction of line characters contained in duplicated lines (all
    occurrences of any line appearing more than once), per Gopher's
    duplicate-line-character filter.  O(distinct_lines × lines) interpreted
    array math per row — fine for normal documents, use the n-gram
    aggregation path for pathological single-doc blobs."""
    ls = lines_col(text)
    total = F.aggregate(ls, F.lit(0).cast("bigint"), lambda a, l: a + F.length(l))
    dup_chars = F.aggregate(
        F.array_distinct(ls),
        F.lit(0).cast("bigint"),
        lambda a, d: a
        + F.when(
            F.size(F.filter(ls, lambda l: l == d)) > 1,
            F.size(F.filter(ls, lambda l: l == d)).cast("bigint") * F.length(d),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return F.when(total <= 0, F.lit(0.0)).otherwise(F.round(dup_chars / total, 4))


def word_ngrams_col(text: Column, n: int) -> Column:
    """ALL word n-grams in order (repeats kept — unlike shingling, repetition
    statistics need the multiset)."""
    toks = tokens_col(text)
    # guard the short-doc case BEFORE building the index: sequence(1, 0) is
    # DESCENDING in Spark ([1, 0]) and element_at(_, 0) throws
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def ngram_repetition(docs: DataFrame, n: int = 2, text_col: str = "text",
                     doc_col: str = "doc_id") -> DataFrame:
    """Per-document n-gram repetition statistics:

    - ``n_{n}grams``   — total n-gram occurrences,
    - ``top{n}_cnt``   — occurrences of the most frequent n-gram,
    - ``top{n}_frac``  — its fraction of all occurrences (Gopher's
      top-n-gram filter, occurrence-weighted),
    - ``dup{n}_frac``  — fraction of occurrences whose n-gram appears more
      than once (Gopher's duplicate-n-gram filter).

    explode → count per (doc, gram) → per-doc aggregate: two key-bounded
    shuffles, no per-doc quadratic work.  Documents with fewer than ``n``
    tokens emit zero counts and 0.0 fractions.
    """
    p = str(n)
    from ophidia_io_server_spark.sources.tables import spread

    grams = spread(docs).select(
        doc_col, F.explode(word_ngrams_col(F.col(text_col), n)).alias("g"))
    per_gram = grams.groupBy(doc_col, "g").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_gram.groupBy(doc_col).agg(
        F.sum("cnt").cast("bigint").alias(f"n_{p}grams"),
        F.max("cnt").cast("bigint").alias(f"top{p}_cnt"),
        F.coalesce(F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0))
        .cast("bigint").alias(f"dup{p}_cnt"),
    )
    return (
        docs.select(doc_col).join(stats, doc_col, "left")
        .select(
            doc_col,
            F.coalesce(f"n_{p}grams", F.lit(0)).cast("bigint").alias(f"n_{p}grams"),
            F.coalesce(f"top{p}_cnt", F.lit(0)).cast("bigint").alias(f"top{p}_cnt"),
            F.when(F.coalesce(f"n_{p}grams", F.lit(0)) <= 0, F.lit(0.0))
            .otherwise(F.round(F.col(f"top{p}_cnt") / F.col(f"n_{p}grams"), 4))
            .alias(f"top{p}_frac"),
            F.when(F.coalesce(f"n_{p}grams", F.lit(0)) <= 0, F.lit(0.0))
            .otherwise(F.round(F.coalesce(f"dup{p}_cnt", F.lit(0)) / F.col(f"n_{p}grams"), 4))
            .alias(f"dup{p}_frac"),
        )
    )


def char_entropy_col(text: Column) -> Column:
    """Shannon entropy (nats) of the character distribution — a cheap
    gibberish/boilerplate signal: ~0 for repeated filler, high for random
    bytes, mid-range for natural language.  Pure HOF math per row, no
    shuffle.

    Computed as ``ln(n) − (Σ c·ln c)/n`` over RUN LENGTHS of the sorted
    character array — one O(n log n) sort + one O(n) fold, replacing the
    original O(distinct × n) distinct-then-count formulation (profiled as
    the single dominant cost of the whole doc_text_metrics projection:
    1.74 s of its 1.1 s+ at sf0.1).  The SQL oracle sums the identical
    ``c·ln c`` terms in the identical sorted order, so the 4-dp values
    still hash-match."""
    cs = F.array_sort(F.split(text, ""))
    n = F.size(cs)
    zero = F.struct(F.lit("").alias("prev"),
                    F.lit(0).cast("bigint").alias("run"),
                    F.lit(0.0).alias("s"))

    def close_run(acc):
        return acc["s"] + F.when(
            acc["run"] > 0, acc["run"] * F.log(acc["run"])).otherwise(F.lit(0.0))

    ssum = F.aggregate(
        cs, zero,
        lambda acc, ch: F.struct(
            ch.alias("prev"),
            F.when(acc["prev"] == ch, acc["run"] + 1)
             .otherwise(F.lit(1).cast("bigint")).alias("run"),
            F.when(acc["prev"] == ch, acc["s"]).otherwise(close_run(acc)).alias("s"),
        ),
        close_run,
    )
    return F.when(n <= 0, F.lit(0.0)).otherwise(F.round(F.log(n) - ssum / n, 4))


def quality_features(df: DataFrame, text_col: str = "text",
                     extra: list[Column] | None = None) -> DataFrame:
    """Quality-scoring feature set: token counts, type-token ratio, mean token
    length, char count, plus a composite [0,1] score.  All rounded to 4
    decimals for cross-engine hashing.  ``extra``: additional Columns carried
    through the same projection (one scan — avoids a join-back on doc_id).

    The input is spread across cores first: the higher-order array
    expressions here (split/filter/transform) are interpreted, and a small
    corpus arrives as one file = one partition = one core."""
    from ophidia_io_server_spark.sources.tables import spread

    df = spread(df)
    t = F.col(text_col)
    n_tok = token_count_col(t)
    n_dist = distinct_token_count_col(t)
    ttr = F.round(n_dist / n_tok, 4)
    mtl = mean_token_len_col(t)
    n_chars = F.length(t).cast("bigint")
    score = F.round(
        F.least(n_tok / F.lit(200.0), F.lit(1.0)) * 0.5
        + F.least(n_dist / n_tok, F.lit(1.0)) * 0.5,
        4,
    )
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_dist.alias("n_distinct_tokens"),
        ttr.alias("ttr"),
        mtl.alias("mean_token_len"),
        n_chars.alias("n_chars_m"),
        score.alias("quality_score"),
        *(extra or []),
    )


# -- Gopher quality rules (Rae et al. 2021, appendix A1.1) -------------------

# the paper's stop set for the "contains ≥2 stop words" rule
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_cols(text: Column, min_words: int = 50,
                        max_words: int = 100_000,
                        min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                        max_symbol_ratio: float = 0.1,
                        max_bullet_frac: float = 0.9,
                        max_ellipsis_frac: float = 0.3,
                        min_alpha_frac: float = 0.8,
                        min_stop_hits: int = 2) -> dict[str, Column]:
    """The canonical Gopher document-quality rule set as named Columns, for
    single-scan folding (same contract as ``redact_cols``): word-count
    bounds, mean word length, symbol-to-word ratio (# and ellipsis),
    bullet/ellipsis line fractions, alphabetic-word fraction, stop-word
    presence, and the conjunction ``gopher_keep``.  Everything is JVM
    Column algebra with explicit 0-word/0-line guards, mirrored exactly by
    the SQL oracle.  (The paper's repetition rules are the separate
    ``dup_line*``/``ngram_repetition`` operators.)"""
    ws = tokens_col(text)
    n = F.size(ws)
    nl = F.lit(None).cast("double")
    mean_len = F.when(n <= 0, nl).otherwise(F.round(
        F.aggregate(ws, F.lit(0).cast("bigint"),
                    lambda a, w: a + F.length(w)) / n, 4))
    hash_cnt = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ell_cnt = (F.length(text)
               - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
    symbol_ratio = F.when(n <= 0, nl).otherwise(
        F.round((hash_cnt + ell_cnt) / n, 4))
    alpha_frac = F.when(n <= 0, nl).otherwise(F.round(
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))) / n, 4))
    low = F.transform(ws, F.lower)
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPS])
    stop_hits = F.size(F.filter(stops, lambda s: F.array_contains(low, s)))
    ls = lines_col(text)
    nln = F.size(ls)
    bullet_frac = F.when(nln <= 0, nl).otherwise(F.round(
        F.size(F.filter(ls, lambda l: F.ltrim(l).startswith("-")
                        | F.ltrim(l).startswith("*")
                        | F.ltrim(l).startswith("•"))) / nln, 4))
    ellipsis_frac = F.when(nln <= 0, nl).otherwise(F.round(
        F.size(F.filter(ls, lambda l: F.rtrim(l).endswith("...")
                        | F.rtrim(l).endswith("…"))) / nln, 4))
    keep = (
        (n >= min_words) & (n <= max_words)
        & mean_len.between(min_mean_len, max_mean_len)
        & (symbol_ratio <= max_symbol_ratio)
        & F.coalesce(bullet_frac <= max_bullet_frac, F.lit(True))
        & F.coalesce(ellipsis_frac <= max_ellipsis_frac, F.lit(True))
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    return {
        "n_words": n.cast("bigint"),
        "mean_word_len": mean_len,
        "symbol_word_ratio": symbol_ratio,
        "frac_alpha_words": alpha_frac,
        "n_stop_hits": stop_hits.cast("bigint"),
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "gopher_keep": F.coalesce(keep, F.lit(False)),
    }


def gopher_quality_flags(docs: DataFrame, text_col: str = "text",
                         **thresholds) -> DataFrame:
    """``docs`` + the Gopher rule columns (one projection, no shuffle)."""
    out = docs
    for name, col in gopher_quality_cols(F.col(text_col), **thresholds).items():
        out = out.withColumn(name, col)
    return out


# -- C4 line/page filters (Raffel et al. 2020, §2.2) -------------------------


def c4_filter_cols(text: Column, min_line_words: int = 5,
                   min_sentences: int = 3) -> dict[str, Column]:
    """C4's cleaning rules as named Columns: keep lines that end in terminal
    punctuation and carry ≥ ``min_line_words`` words; drop pages with fewer
    than ``min_sentences`` sentences, a ``{`` (code), or "lorem ipsum".
    Emits the cleaned text (kept lines re-joined) plus the decision
    columns — the bad-word list of the original is deliberately out of
    scope."""
    ls = lines_col(text)
    kept = F.filter(
        ls,
        lambda l: (F.rtrim(l).endswith(".") | F.rtrim(l).endswith("!")
                   | F.rtrim(l).endswith("?") | F.rtrim(l).endswith('"'))
        & (F.size(F.filter(F.split(l, " "), lambda w: w != ""))
           >= min_line_words),
    )
    n_sent = F.length(text) - F.length(F.regexp_replace(text, r"[.!?]", ""))
    has_brace = text.contains("{")
    has_lorem = F.lower(text).contains("lorem ipsum")
    keep = ((n_sent >= min_sentences) & ~has_brace & ~has_lorem)
    return {
        "n_lines": F.size(ls).cast("bigint"),
        "n_kept_lines": F.size(kept).cast("bigint"),
        "c4_kept_frac": F.when(F.size(ls) <= 0, F.lit(None).cast("double"))
                         .otherwise(F.round(F.size(kept) / F.size(ls), 4)),
        "text_c4": F.concat_ws("\n", kept),
        "c4_n_sentences": n_sent.cast("bigint"),
        "c4_has_brace": F.coalesce(has_brace, F.lit(False)),
        "c4_has_lorem": F.coalesce(has_lorem, F.lit(False)),
        "c4_keep": F.coalesce(keep, F.lit(False)),
    }


def c4_filters(docs: DataFrame, text_col: str = "text", **kw) -> DataFrame:
    """``docs`` + the C4 filter columns (one projection, no shuffle)."""
    out = docs
    for name, col in c4_filter_cols(F.col(text_col), **kw).items():
        out = out.withColumn(name, col)
    return out


def cooccurrence_counts(docs: DataFrame, window: int = 2,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(wa, wb, c12): unordered token co-occurrence counts within a
    ±``window`` position distance — pairs stream straight off each
    document's token array (no self-join), one groupBy counts them.
    The shared edge-list builder for ``cooccurrence_pmi`` and the LPA
    community workload (which needs counts, not PMI)."""
    toks = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens_col(F.col(text_col)).alias("tk"))
        .withColumn("n", F.size("tk").cast("bigint"))
        .where(F.col("n") >= 2)
    )
    pairs_per_doc = F.flatten(F.transform(
        F.sequence(F.lit(1), (F.col("n") - 1).cast("int")),
        lambda i: F.filter(
            F.transform(
                F.sequence(F.lit(1), F.lit(window)),
                lambda d: F.when(
                    i + d <= F.col("n"),
                    F.struct(
                        F.least(F.element_at("tk", i.cast("int")),
                                F.element_at("tk", (i + d).cast("int"))).alias("wa"),
                        F.greatest(F.element_at("tk", i.cast("int")),
                                   F.element_at("tk", (i + d).cast("int"))).alias("wb"),
                    ),
                ),
            ),
            lambda s: s.isNotNull(),
        ),
    ))
    pair_stream = toks.select(F.explode(pairs_per_doc).alias("p")) \
        .select("p.wa", "p.wb")
    return pair_stream.groupBy("wa", "wb").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12"))


def cooccurrence_pmi(docs: DataFrame, window: int = 2, min_count: int = 5,
                     text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pointwise mutual information over token co-occurrences within a
    ±``window`` position distance — the classic word-association miner
    (collocations, naming conventions, topic seeds) behind count-based
    embeddings.

    Pairs stream straight off each document's token array (one struct per
    (i, i+δ), δ ≤ window — no self-join), normalized to unordered
    (least, greatest) form; one groupBy counts them.  PMI =
    ln(((c12/P) / (c1a/N)) / (c1b/N)) with P = total pairs, N = total
    tokens — the division chain is mirrored token-for-token in the SQL
    oracle so both engines round identically at 6 dp.

    Returns (wa, wb, c12, pmi) for pairs with c12 ≥ ``min_count``."""
    c12 = cooccurrence_counts(docs, window, text_col, id_col)
    uni = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens_col(F.col(text_col))).alias("t"))
        .groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    totals = c12.agg(F.sum("c12").cast("bigint").alias("P")).crossJoin(
        uni.agg(F.sum("c1").cast("bigint").alias("N")))
    return (
        c12.where(F.col("c12") >= min_count)
        .join(uni.select(F.col("t").alias("wa"), F.col("c1").alias("ca")), on="wa")
        .join(uni.select(F.col("t").alias("wb"), F.col("c1").alias("cb")), on="wb")
        .crossJoin(F.broadcast(totals))
        .select(
            "wa", "wb", "c12",
            F.round(F.log(
                F.col("c12") / F.col("P") / (F.col("ca") / F.col("N"))
                / (F.col("cb") / F.col("N"))), 6).alias("pmi"),
        )
    )
