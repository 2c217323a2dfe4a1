"""Training-data curation operators: near-dup cluster resolution, sequence
packing, Gopher-style repetition signals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.dedup import dup_clusters, resolve_duplicates
from ophidia_io_server_spark.pipeline.packing import (pack_concat_chunks,
    pack_first_fit, pack_next_fit)
from ophidia_io_server_spark.pipeline.text import (
    dup_line_char_frac_col,
    dup_line_frac_col,
    ngram_repetition,
)


# -- cluster resolution ------------------------------------------------------


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(a, b, 0.9) for a, b in edges], "doc_a long, doc_b long, jaccard double"
    )


def test_dup_clusters_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter 3) + clique {10,11,12} + isolated pair (20,21)
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4),
                           (10, 11), (10, 12), (11, 12), (20, 21)])
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dup_clusters_long_path_converges(spark):
    # path of 12 nodes — exercises multi-round propagation to the fixpoint
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 12)])
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {i: 1 for i in range(1, 13)}


def test_dup_clusters_max_iter_raises(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 12)])
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iter=2)


def test_resolve_duplicates_quality_keeper(spark):
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5)], "doc_id long, q double"
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    out = resolve_duplicates(docs, pairs, quality_col="q").collect()
    rows = {r["doc_id"]: r for r in out}
    # cluster {1,2,3} labelled 1; keeper = highest q, tie → lowest doc_id ⇒ 2
    assert all(rows[i]["cluster_id"] == 1 for i in (1, 2, 3))
    assert [rows[i]["is_canonical"] for i in (1, 2, 3)] == [False, True, False]
    assert rows[1]["cluster_size"] == 3
    # 7 is a singleton: own cluster, canonical, size 1
    assert rows[7]["cluster_id"] == 7 and rows[7]["is_canonical"]
    assert rows[7]["cluster_size"] == 1


def test_resolve_duplicates_default_min_id_keeper(spark):
    docs = spark.createDataFrame([(5,), (6,)], "doc_id long")
    out = resolve_duplicates(docs, _pairs(spark, [(5, 6)])).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[5]["is_canonical"] and not rows[6]["is_canonical"]


def test_dup_clusters_on_real_minhash_pairs(spark):
    from ophidia_io_server_spark.pipeline.dedup import minhash_lsh_pairs
    from ophidia_io_server_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5).cache()
    labels = dup_clusters(pairs)
    # every doc in a pair is labelled, labels are component-minimal:
    # a label must be ≤ every member and itself a member of the component
    joined = (
        pairs.select(F.col("doc_a").alias("doc_id")).union(pairs.select("doc_b"))
        .distinct().join(labels, "doc_id", "left")
    )
    assert joined.where(F.col("cluster_id").isNull()).count() == 0
    assert labels.where(F.col("cluster_id") > F.col("doc_id")).count() == 0


# -- sequence packing --------------------------------------------------------


def _docs_tok(spark, toks):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks, start=1)], "doc_id long, n_tokens long"
    )


def test_pack_concat_chunks_single_shard_stream(spark):
    df = _docs_tok(spark, [100, 900, 150, 2048, 10])
    out = pack_concat_chunks(df, budget=1024, n_shards=1,
                             shard_expr=F.lit(0)).collect()
    rows = {r["doc_id"]: r for r in sorted(out, key=lambda r: r["doc_id"])}
    # cumulative starts: 0, 100, 1000, 1150, 3198
    assert [(rows[i]["seq_in_shard"], rows[i]["seq_offset"]) for i in range(1, 6)] == [
        (0, 0), (0, 100), (0, 1000), (1, 126), (3, 126)
    ]


def test_pack_concat_chunks_deterministic_and_partitioned(spark):
    df = _docs_tok(spark, list(range(1, 300)))
    a = pack_concat_chunks(df, budget=512, n_shards=8)
    b = pack_concat_chunks(df.repartition(13), budget=512, n_shards=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # every shard's stream is gapless: offsets within a (shard, seq) are
    # consistent with cumulative token arithmetic
    tot = a.groupBy("pack_shard").agg(
        F.sum("n_tokens").alias("t"), F.max(F.col("seq_in_shard") * 512 + F.col("seq_offset")).alias("m"))
    assert tot.where(F.col("m") >= F.col("t")).count() == 0


@pytest.mark.parametrize("packer", [pack_first_fit, pack_next_fit])
def test_pack_no_split_respects_budget(spark, packer):
    df = _docs_tok(spark, [300, 800, 500, 200, 700, 100, 1500])
    out = packer(df, budget=1024, n_buckets=2).collect()
    # no sequence exceeds the budget unless it is a flagged oversize singleton
    per_seq = {}
    for r in out:
        per_seq.setdefault((r["pack_bucket"], r["seq_in_bucket"]), []).append(r)
    for members in per_seq.values():
        total = sum(m["n_tokens"] for m in members)
        if total > 1024:
            assert len(members) == 1 and members[0]["oversize"]
    # fill bookkeeping: docs in a sequence tile it without overlap
    for members in per_seq.values():
        members.sort(key=lambda m: m["seq_fill"])
        acc = 0
        for m in members:
            assert m["seq_fill"] == acc
            acc += m["n_tokens"]


@pytest.mark.parametrize("packer", [pack_first_fit, pack_next_fit])
def test_pack_no_split_deterministic(spark, packer):
    df = _docs_tok(spark, list(range(50, 400, 7)))
    a = packer(df, budget=777, n_buckets=4).collect()
    b = packer(df.repartition(11), budget=777, n_buckets=4).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_pack_first_fit_packs_tighter_than_next_fit(spark):
    """First-fit revisits earlier open sequences, so it can NEVER need more
    sequences than next-fit on the same visit order — and on mixed sizes it
    needs strictly fewer (the rename-fix contract: pack_first_fit really is
    first-fit now)."""
    import random

    rng = random.Random(11)
    sizes = [rng.choice([120, 350, 600, 900]) for _ in range(200)]
    df = _docs_tok(spark, sizes)
    def nseqs(out):
        return len({(r["pack_bucket"], r["seq_in_bucket"]) for r in out})
    ff = pack_first_fit(df, budget=1000, n_buckets=4).collect()
    nf = pack_next_fit(df, budget=1000, n_buckets=4).collect()
    assert nseqs(ff) <= nseqs(nf)
    # same doc multiset, both budget-true
    assert sorted(r["doc_id"] for r in ff) == sorted(r["doc_id"] for r in nf)
    # strict win on this distribution (deterministic given the fixed seed)
    assert nseqs(ff) < nseqs(nf)


def test_pack_rejects_bad_budget(spark):
    df = _docs_tok(spark, [1])
    with pytest.raises(ValueError):
        pack_concat_chunks(df, budget=0)
    with pytest.raises(ValueError):
        pack_first_fit(df, budget=-5)
    with pytest.raises(ValueError):
        pack_next_fit(df, budget=0)


# -- repetition signals ------------------------------------------------------


def _doc(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_dup_line_fracs(spark):
    text = "aaa\nbbb\naaa\nccc dd\n\naaa"
    row = _doc(spark, text).select(
        dup_line_frac_col(F.col("text")).alias("lf"),
        dup_line_char_frac_col(F.col("text")).alias("cf"),
    ).collect()[0]
    # 5 non-empty lines, 3 distinct → dup fraction 2/5; chars: aaa×3 dup'd
    # (9 chars) over 3+3+3+6+3=18 total
    assert row["lf"] == 0.4
    assert row["cf"] == 0.5


def test_dup_line_frac_single_line_is_zero(spark):
    row = _doc(spark, "no newlines here").select(
        dup_line_frac_col(F.col("text")).alias("lf"),
        dup_line_char_frac_col(F.col("text")).alias("cf"),
    ).collect()[0]
    assert row["lf"] == 0.0 and row["cf"] == 0.0


def test_ngram_repetition_counts(spark):
    # tokens: a b a b a  → 2-grams: "a b","b a","a b","b a" (4 total,
    # top count 2, all 4 occurrences duplicated)
    df = _doc(spark, "a b a b a")
    row = ngram_repetition(df, n=2).collect()[0]
    assert row["n_2grams"] == 4
    assert row["top2_cnt"] == 2
    assert row["top2_frac"] == 0.5
    assert row["dup2_frac"] == 1.0


def test_ngram_repetition_no_repeats(spark):
    row = ngram_repetition(_doc(spark, "w x y z"), n=2).collect()[0]
    assert row["n_2grams"] == 3 and row["top2_cnt"] == 1
    assert row["top2_frac"] == round(1 / 3, 4) and row["dup2_frac"] == 0.0


def test_ngram_repetition_short_doc_zeroes(spark):
    row = ngram_repetition(_doc(spark, "solo"), n=2).collect()[0]
    assert (row["n_2grams"], row["top2_cnt"], row["top2_frac"], row["dup2_frac"]) == (
        0, 0, 0.0, 0.0)


# -- benchmark decontamination ------------------------------------------------


def test_contamination_flags(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ophidia_io_server_spark.pipeline.decontaminate import contamination_flags

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    eval_text = "one two three four"          # the benchmark doc
    leak = "zzz one two three four yyy"       # shares the 4-gram → contaminated
    clean = "five six seven eight nine"       # no shared 4-gram
    short = "tiny"                            # shorter than n → no grams
    docs = spark.createDataFrame(
        [(1, eval_text), (2, leak), (3, clean), (4, short)], schema)
    out = {r.doc_id: r for r in
           contamination_flags(docs, F.col("doc_id") == 1, n=4).collect()}
    assert out[1].is_eval and not out[1].contaminated
    assert out[1].n_eval_grams_hit == 1       # its own single 4-gram
    assert not out[2].is_eval and out[2].contaminated
    assert out[2].n_eval_grams_hit == 1
    assert not out[3].contaminated and out[3].n_eval_grams_hit == 0
    assert not out[4].contaminated and out[4].n_eval_grams_hit == 0
    assert len(out) == 4                      # every doc reported exactly once


# -- PII redaction + char entropy ---------------------------------------------


def test_redact_categories_and_counts(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ophidia_io_server_spark.pipeline.redact import redact

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    docs = spark.createDataFrame([
        (1, "mail me at jo.doe+x@example.org or visit https://ex.org/a?b=1 ok"),
        (2, "server 10.0.255.3 answered, call +1 (555) 123-4567 today"),
        (3, "clean text with the number 42 and v1.2 left intact"),
    ], schema)
    out = {r.doc_id: r for r in redact(docs).collect()}
    assert out[1].n_email == 1 and out[1].n_url == 1 and out[1].has_pii
    assert "<EMAIL>" in out[1].text_redacted and "<URL>" in out[1].text_redacted
    assert "example.org" not in out[1].text_redacted
    assert out[2].n_ipv4 == 1 and out[2].n_phone == 1 and out[2].has_pii
    assert "<IP>" in out[2].text_redacted and "<PHONE>" in out[2].text_redacted
    assert not out[3].has_pii
    assert out[3].text_redacted == docs.collect()[2].text  # untouched
    # short harmless numbers are NOT phone-matched (precision-first)
    assert out[3].n_phone == 0


def test_redact_phone_adversarial(spark):
    """The r4 phone pattern matched any 7+ digit/separator run, redacting
    dates, year pairs, score ranges and spaced decimals (VERDICT r4).  The
    structured pattern must pass ALL of these through untouched while still
    catching real phone formats."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ophidia_io_server_spark.pipeline.redact import redact

    passthrough = [
        "between 2019 2020 the trend held",
        "dated 2026-08-13 and signed",
        "scores were 10 - 20 - 30 overall",
        "pi is 3.14159 26535 approximately",
        "version 1.2.3 released",
        "range 1990-2020 covered",
        "math gives 2+345 678 9012 somehow",
        "order id 1234567890123",
        "timestamp 2026-08-13 10:30 recorded",
    ]
    phones = [
        "call +1 (555) 123-4567 today",
        "fax 555-123-4567 works",
        "ring +44 20 7946 0958 now",
        "dial (555) 123-4567 please",
        "or 555.123.4567 alternatively",
        "tel:+44 20 7946 0958",
    ]
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    docs = spark.createDataFrame(
        list(enumerate(passthrough + phones + [None])), schema)
    out = {r.doc_id: r for r in redact(docs).collect()}
    for i, t in enumerate(passthrough):
        assert out[i].n_phone == 0 and out[i].text_redacted == t, (t, out[i])
    for j, t in enumerate(phones):
        r = out[len(passthrough) + j]
        assert r.n_phone >= 1 and "<PHONE>" in r.text_redacted, (t, r)
    # NULL text: redacted stays NULL, counts degrade to 0, has_pii false
    rn = out[len(passthrough) + len(phones)]
    assert rn.text_redacted is None
    assert rn.n_phone == rn.n_url == rn.n_email == rn.n_ipv4 == 0
    assert rn.has_pii is False


def test_char_entropy(spark):
    import math

    from ophidia_io_server_spark.pipeline.text import char_entropy_col

    rows = _doc(spark, "aaaa").select(char_entropy_col(F.col("text")).alias("e")).collect()
    assert rows[0].e == 0.0
    e_ab = _doc(spark, "ab").select(char_entropy_col(F.col("text")).alias("e")).collect()[0].e
    assert e_ab == round(math.log(2), 4)
    e_en = _doc(spark, "the quick brown fox jumps over the lazy dog").select(
        char_entropy_col(F.col("text")).alias("e")).collect()[0].e
    assert 2.5 < e_en < 4.5  # natural-language range


# -- exact-substring span dedup ---------------------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_duplicate_spans_basic_and_merge(spark):
    from ophidia_io_server_spark.pipeline.dedup import duplicate_spans

    # doc0/doc1 share a 10-token run -> 3 overlapping dup windows (W=8)
    # merging into ONE span of 10 tokens in each doc
    shared = " ".join(f"s{i}" for i in range(10))
    texts = [
        "a0 a1 a2 " + shared + " a3 a4",
        "b0 " + shared + " b1 b2 b3 b4 b5",
        " ".join(f"c{i}" for i in range(20)),  # no duplication
    ]
    got = {r["doc_id"]: r.asDict() for r in duplicate_spans(_docs(spark, texts), window=8).collect()}
    assert set(got) == {0, 1}
    for d in (0, 1):
        assert got[d]["dup_windows"] == 3
        assert got[d]["n_spans"] == 1
        assert got[d]["dup_tokens"] == 10
    assert got[0]["n_tokens"] == 15
    assert got[0]["dup_frac"] == round(10 / 15, 4)


def test_duplicate_spans_disjoint_spans_and_self_repeat(spark):
    from ophidia_io_server_spark.pipeline.dedup import duplicate_spans

    # one doc repeating the same 8-token run twice WITH a gap: the window
    # occurs twice corpus-wide (both inside doc0) -> two disjoint spans
    run = " ".join(f"r{i}" for i in range(8))
    texts = ["x0 " + run + " g0 g1 g2 g3 " + run + " x1"]
    rows = duplicate_spans(_docs(spark, texts), window=8).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["dup_windows"] == 2
    assert r["n_spans"] == 2
    assert r["dup_tokens"] == 16


def test_duplicate_spans_adjacent_windows_merge(spark):
    from ophidia_io_server_spark.pipeline.dedup import duplicate_spans

    # doc0 contains the 16-token run once; doc1 contains its two 8-token
    # halves separately -> in doc0 windows at pos0 and pos8 are adjacent
    # (pos8 == prev end) and must merge into one 16-token span
    half1 = " ".join(f"h{i}" for i in range(8))
    half2 = " ".join(f"k{i}" for i in range(8))
    texts = [
        half1 + " " + half2,
        half1 + " z0 z1 z2 z3 z4 z5 z6 z7 " + half2,
    ]
    got = {r["doc_id"]: r.asDict() for r in duplicate_spans(_docs(spark, texts), window=8).collect()}
    assert got[0]["n_spans"] == 1
    assert got[0]["dup_tokens"] == 16
    assert got[1]["n_spans"] == 2
    assert got[1]["dup_tokens"] == 16


def test_duplicate_spans_short_docs_skipped(spark):
    from ophidia_io_server_spark.pipeline.dedup import duplicate_spans

    texts = ["only five tokens in here", "only five tokens in here"]
    assert duplicate_spans(_docs(spark, texts), window=8).count() == 0


# -- star-contraction connected components ----------------------------------


def test_star_cc_matches_min_label(spark):
    import random

    from ophidia_io_server_spark.pipeline.dedup import dup_clusters, dup_clusters_star

    rng = random.Random(7)
    nodes = list(range(1, 61))
    edges = {tuple(sorted(rng.sample(nodes, 2))) for _ in range(70)}
    pairs = _pairs(spark, sorted(edges))
    a = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    b = {r["doc_id"]: r["cluster_id"] for r in dup_clusters_star(pairs).collect()}
    assert a == b


def test_star_cc_long_path_few_rounds(spark):
    from ophidia_io_server_spark.pipeline.dedup import dup_clusters_star

    # path of 120 nodes (diameter 119): min-label would need 119 rounds;
    # star contraction must finish well inside 12
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 120)])
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters_star(pairs, max_iter=12).collect()}
    assert got == {i: 1 for i in range(1, 121)}


def test_star_cc_cliques_and_pair(spark):
    from ophidia_io_server_spark.pipeline.dedup import dup_clusters_star

    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4),
                           (10, 11), (10, 12), (11, 12), (20, 21)])
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters_star(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_resolve_duplicates_star_method_equivalent(spark):
    from ophidia_io_server_spark.pipeline.dedup import resolve_duplicates

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 8)], "doc_id long, text string")
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    cols = ["doc_id", "cluster_id", "cluster_size", "is_canonical"]
    a = sorted(tuple(r) for r in resolve_duplicates(docs, pairs).select(cols).collect())
    b = sorted(tuple(r) for r in resolve_duplicates(docs, pairs, method="star").select(cols).collect())
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError):
        resolve_duplicates(docs, pairs, method="bogus")


# -- Bloom-prefiltered decontamination ---------------------------------------


def test_bloom_no_false_negatives(spark):
    # build/probe consistency: every inserted gram MUST test positive (both
    # sides now evaluate the SAME JVM _bloom_positions expression)
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.decontaminate import (
        _bloom_member_col, build_gram_bloom)

    grams = spark.createDataFrame(
        [(f"gram {i} alpha beta",) for i in range(500)], "g string")
    bitmap, m, k = build_gram_bloom(grams, "g", fpp=0.01)
    hits = grams.where(
        _bloom_member_col(bitmap, m, k, spark, F.col("g"))).count()
    assert hits == 500
    # and unrelated grams mostly miss (FP rate ~1%; allow generous slack)
    other = spark.createDataFrame(
        [(f"other {i} gamma delta",) for i in range(500)], "g string")
    nfp = other.where(
        _bloom_member_col(bitmap, m, k, spark, F.col("g"))).count()
    assert nfp <= 25


def test_bloom_decontamination_equivalent(spark):
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.decontaminate import (
        contamination_flags, contamination_flags_bloom)
    from ophidia_io_server_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pred = F.col("doc_id") % 17 == 0
    cols = ["doc_id", "is_eval", "n_eval_grams_hit", "contaminated"]
    a = sorted(tuple(r) for r in contamination_flags(docs, pred).select(cols).collect())
    b = sorted(tuple(r) for r in contamination_flags_bloom(docs, pred).select(cols).collect())
    assert a == b


def test_bloom_empty_eval_set(spark):
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.decontaminate import contamination_flags_bloom

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "k l m n o p q r s t")],
        "doc_id long, text string")
    out = contamination_flags_bloom(docs, F.lit(False)).collect()
    assert all(r["n_eval_grams_hit"] == 0 and not r["contaminated"] for r in out)


# -- hashed n-gram linear classifier -----------------------------------------


def test_classifier_paths_equivalent(spark):
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.classifier import (
        demo_weight_fn, hashed_feature_buckets_col, score_with_weight_expr,
        score_with_weights_df)

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "lorem ipsum dolor"),
         (3, ""), (4, "single"), (5, "a b a b a b a b")],
        "doc_id long, text string")
    nb = 4096
    # materialize the closed-form weights into a (bucket, weight) table
    weights = (
        docs.select(F.explode(
            hashed_feature_buckets_col(F.col("text"), nb)).alias("bucket"))
        .distinct()
        .select("bucket", demo_weight_fn(F.col("bucket")).alias("weight"))
    )
    a = {r["doc_id"]: r for r in
         score_with_weight_expr(docs, demo_weight_fn, n_buckets=nb).collect()}
    b = {r["doc_id"]: r for r in
         score_with_weights_df(docs, weights, n_buckets=nb).collect()}
    assert set(a) == set(b) == {1, 2, 3, 4, 5}
    for d in a:
        assert a[d]["n_features"] == b[d]["n_features"]
        assert abs(a[d]["quality_score"] - b[d]["quality_score"]) <= 1e-6
        assert a[d]["keep"] == b[d]["keep"]
    # featureless doc: zero features, bias score, not kept at threshold 0
    assert a[3]["n_features"] == 0 and a[3]["quality_score"] == 0.0 and not a[3]["keep"]
    # unigrams + bigrams: 5 tokens -> 5 + 4 features
    assert a[1]["n_features"] == 9


def test_classifier_threshold_and_bias(spark):
    from ophidia_io_server_spark.pipeline.classifier import (
        demo_weight_fn, score_with_weight_expr)

    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    lo = score_with_weight_expr(docs, demo_weight_fn, threshold=-10.0).collect()[0]
    hi = score_with_weight_expr(docs, demo_weight_fn, threshold=10.0).collect()[0]
    assert lo["keep"] and not hi["keep"]
    shifted = score_with_weight_expr(docs, demo_weight_fn, bias=5.0).collect()[0]
    assert abs((shifted["quality_score"] - 5.0) - lo["quality_score"]) <= 2e-6


def test_remove_duplicate_spans_keep_canonical(spark):
    from ophidia_io_server_spark.pipeline.dedup import remove_duplicate_spans

    shared = " ".join(f"s{i}" for i in range(10))
    texts = [
        "a0 a1 " + shared + " a2",          # doc 0: canonical (min doc_id)
        "b0 " + shared + " b1 b2 b3 b4",    # doc 1: occurrence cut
        "c0 c1 c2 c3 c4 c5 c6 c7 c8",       # doc 2: untouched
    ]
    out = {r["doc_id"]: r.asDict() for r in remove_duplicate_spans(
        _docs(spark, texts), window=8).collect()}
    assert out[0]["text_clean"] == texts[0]          # canonical kept whole
    assert out[0]["dup_tokens"] == 0
    assert out[1]["text_clean"] == "b0 b1 b2 b3 b4"  # span cut, rest joined
    assert out[1]["dup_tokens"] == 10
    assert out[2]["text_clean"] == texts[2]
    assert out[2]["dup_tokens"] == 0


def test_remove_duplicate_spans_cut_all(spark):
    from ophidia_io_server_spark.pipeline.dedup import remove_duplicate_spans

    shared = " ".join(f"s{i}" for i in range(8))
    texts = ["x " + shared, shared + " y"]
    out = {r["doc_id"]: r.asDict() for r in remove_duplicate_spans(
        _docs(spark, texts), window=8, keep_in_min_doc=False).collect()}
    assert out[0]["text_clean"] == "x"
    assert out[1]["text_clean"] == "y"
    assert out[0]["dup_tokens"] == out[1]["dup_tokens"] == 8


def test_remove_duplicate_spans_report_consistency(spark):
    # dup_tokens of the cut (keep_in_min_doc=False) matches duplicate_spans'
    # report for every doc; docs absent from the report keep dup_tokens 0
    from ophidia_io_server_spark.pipeline.dedup import (duplicate_spans,
                                                        remove_duplicate_spans)
    from ophidia_io_server_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rep = {r["doc_id"]: r["dup_tokens"]
           for r in duplicate_spans(docs, window=8).collect()}
    cut = {r["doc_id"]: r["dup_tokens"]
           for r in remove_duplicate_spans(docs, window=8,
                                           keep_in_min_doc=False).collect()}
    assert all(cut[d] == rep.get(d, 0) for d in cut)
    assert sum(1 for v in cut.values() if v > 0) == len(rep)


# -- Gopher rules + C4 filters ----------------------------------------------


def test_gopher_rules_branches(spark):
    from ophidia_io_server_spark.pipeline.text import gopher_quality_flags

    good = " ".join(["the and that have with words here now then"] * 6)  # 54 words
    texts = [
        good,                                   # passes every rule
        "short doc",                            # word count too low
        good + " " + "#" * 40,                  # symbol ratio blown
        " ".join(["12345 67890"] * 30),         # no alpha words, no stops
        "- one\n- two\n- three",                # all bullet lines (and short)
    ]
    got = {r["doc_id"]: r.asDict()
           for r in gopher_quality_flags(_docs(spark, texts)).collect()}
    assert got[0]["gopher_keep"] is True
    assert got[0]["n_stop_hits"] >= 2
    assert got[1]["gopher_keep"] is False and got[1]["n_words"] == 2
    assert got[2]["gopher_keep"] is False
    assert got[2]["symbol_word_ratio"] > 0.1
    assert got[3]["gopher_keep"] is False and got[3]["frac_alpha_words"] == 0.0
    assert got[4]["bullet_line_frac"] == 1.0 and got[4]["gopher_keep"] is False


def test_c4_filters_line_and_page_rules(spark):
    from ophidia_io_server_spark.pipeline.text import c4_filters

    texts = [
        "This is a proper sentence line.\nshort one.\nno terminal punct here\n"
        "Another full sentence with enough words!\nAnd a third one right here?",
        "lorem ipsum dolor sit amet and more words here.",
        "function f() { return 1; } This has code. More code! Even more?",
        "",
    ]
    got = {r["doc_id"]: r.asDict() for r in c4_filters(_docs(spark, texts)).collect()}
    d0 = got[0]
    assert d0["n_lines"] == 5 and d0["n_kept_lines"] == 3
    assert d0["text_c4"] == ("This is a proper sentence line.\n"
                             "Another full sentence with enough words!\n"
                             "And a third one right here?")
    assert d0["c4_keep"] is True and d0["c4_n_sentences"] == 4
    assert got[1]["c4_has_lorem"] is True and got[1]["c4_keep"] is False
    assert got[2]["c4_has_brace"] is True and got[2]["c4_keep"] is False
    assert got[3]["n_lines"] == 0 and got[3]["text_c4"] == "" \
        and got[3]["c4_keep"] is False


# -- DSIR importance scoring -------------------------------------------------


def test_dsir_separates_domains(spark):
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.classifier import dsir_scores

    # target docs use one vocabulary, raw-only docs another: target-like
    # docs must score higher
    tgt = [" ".join(["alpha beta gamma delta"] * 5)] * 4
    raw = [" ".join(["omega psi chi phi"] * 5)] * 4
    docs = spark.createDataFrame(
        [(i, t, "tgt") for i, t in enumerate(tgt)]
        + [(100 + i, t, "raw") for i, t in enumerate(raw)],
        "doc_id long, text string, source string")
    got = {r["doc_id"]: r["dsir_score"]
           for r in dsir_scores(docs, F.col("source") == "tgt",
                                n_buckets=4096).collect()}
    assert all(got[i] > got[100 + j] for i in range(4) for j in range(4))
    # and scores are layout-independent (integer weight sums)
    got8 = {r["doc_id"]: r["dsir_score"]
            for r in dsir_scores(docs.repartition(8),
                                 F.col("source") == "tgt",
                                 n_buckets=4096).collect()}
    assert got == got8


def test_dsir_weight_table_bounded(spark):
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.classifier import dsir_logratio_weights

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i}", "s") for i in range(50)],
        "doc_id long, text string, source string")
    w = dsir_logratio_weights(docs, F.col("source") == "s", n_buckets=256)
    assert w.count() <= 256
    assert dict(w.dtypes)["w_int"] == "bigint"


def test_source_overlap_matrix_math(spark):
    from ophidia_io_server_spark.pipeline.decontaminate import source_overlap_matrix

    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "s1"),       # grams: abc bcd cde
            (2, "c d e f g", "s2"),       # grams: cde def efg  (shares cde)
            (3, "x y z w v", "s3"),       # disjoint
            (4, "a b c d e", "s1"),       # duplicate doc: distinct per source
        ],
        "doc_id long, text string, source string")
    rows = {(r["src_a"], r["src_b"]): r.asDict()
            for r in source_overlap_matrix(docs, n=3).collect()}
    r12 = rows[("s1", "s2")]
    assert r12["n_grams_a"] == 3 and r12["n_grams_b"] == 3
    assert r12["n_shared"] == 1
    assert r12["jaccard"] == round(1 / 5, 6)
    # disjoint source pairs emit no row (inner join on shared grams)
    assert ("s1", "s3") not in rows and ("s2", "s3") not in rows


# -- end-to-end curation recipe ----------------------------------------------


def test_curate_corpus_end_to_end(spark):
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.recipe import curate_corpus
    from ophidia_io_server_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    # rule_filters="gopher": the synthetic corpus has no sentence
    # punctuation, so the C4 line rule would (correctly) zero it out and
    # make every downstream assertion vacuous
    gk = {"min_stop_hits": 0, "min_words": 30}   # synthetic vocab: no
    res = curate_corpus(                           # English stop words
        docs, eval_pred=F.col("doc_id") % 89 == 0,
        rule_filters="gopher", gopher_kwargs=gk, report=True)
    out = res.docs.cache()
    n_out = out.count()
    # funnel is monotone non-increasing through the filtering stages, and
    # the chain must actually pass documents through (non-vacuous)
    f = res.funnel
    assert f["input"] >= f["rule_filters"] > 0
    assert f["exact_dedup"] >= f["near_dedup"] >= f["decontaminated"] > 0
    assert f["output"] == n_out and n_out > 0
    # output schema: provenance + split present, one row per surviving doc
    assert {"doc_id", "text", "cluster_id", "split"} <= set(out.columns)
    assert out.select("doc_id").distinct().count() == n_out
    assert out.where(~F.col("split").isin(0, 1, 2)).count() == 0
    # determinism: a second run selects the identical corpus
    res2 = curate_corpus(docs, eval_pred=F.col("doc_id") % 89 == 0,
                         rule_filters="gopher", gopher_kwargs=gk)
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in res2.docs.select("doc_id").collect())
    assert ids1 == ids2


def test_curate_corpus_stages_toggle(spark):
    from ophidia_io_server_spark.pipeline.recipe import curate_corpus

    docs = spark.createDataFrame(
        [(i, " ".join(["the and of that with have words here now then"] * 6))
         for i in range(6)],
        "doc_id long, text string")
    # all docs identical → exact dedup keeps exactly one
    res = curate_corpus(docs, rule_filters=False, redact_pii=False,
                        span_window=0, report=True)
    assert res.funnel["exact_dedup"] == 1 and res.funnel["output"] == 1


def test_remove_duplicate_spans_null_text_and_clash(spark):
    import pytest as _pt

    from ophidia_io_server_spark.pipeline.dedup import remove_duplicate_spans

    run = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, "x " + run), (2, run + " y"), (3, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in remove_duplicate_spans(docs, window=8,
                                           keep_in_min_doc=False).collect()}
    # NULL text: preserved as NULL, zero counts (was n_tokens=-1, '' before)
    assert out[3]["text_clean"] is None
    assert out[3]["n_tokens"] == 0 and out[3]["dup_tokens"] == 0
    # column-clash guard (the pack_* convention: refuse, don't overwrite)
    with _pt.raises(ValueError, match="overwrite"):
        remove_duplicate_spans(
            docs.withColumn("n_tokens", docs.doc_id), window=8)


def test_classifier_null_text_zero_features(spark):
    from ophidia_io_server_spark.pipeline.classifier import (demo_weight_fn,
                                                             score_with_weight_expr)

    docs = spark.createDataFrame([(1, None), (2, "a b c")],
                                 "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           score_with_weight_expr(docs, demo_weight_fn, n_buckets=64).collect()}
    assert got[1]["n_features"] == 0 and got[1]["quality_score"] == 0.0
    assert not got[1]["keep"]
    assert got[2]["n_features"] == 5


def test_canonical_dedup_catches_variants(spark):
    from ophidia_io_server_spark.pipeline.dedup import (exact_duplicates,
                                                        exact_duplicates_canonical)

    docs = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "HELLO WORLD."),
         (4, "something else")],
        "doc_id long, text string")
    byte_exact = exact_duplicates(docs).count()
    canon = {r["rep_doc_id"]: r["n_docs"]
             for r in exact_duplicates_canonical(docs).collect()}
    assert byte_exact == 4            # all byte-distinct
    assert canon == {1: 3, 4: 1}      # three variants collapse to doc 1


def test_simhash_recall_bound_is_the_real_boundary(spark):
    """At sf0.001 exactly one true Jaccard≥0.5 pair sits at simhash hamming
    9 — BEYOND the 8-chunk banding guarantee (≤7).  Pin that the operator
    misses exactly the pairs outside its documented contract and nothing
    inside it: every exact pair at hamming ≤ 7 is found."""
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.dedup import (jaccard_pairs_exact,
                                                        simhash_df,
                                                        simhash_pairs)
    from ophidia_io_server_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {(r["doc_a"], r["doc_b"])
           for r in simhash_pairs(docs, max_hamming=7, verify_jaccard=0.5).collect()}
    exact = {(r["doc_a"], r["doc_b"])
             for r in jaccard_pairs_exact(docs, n=3, threshold=0.5).collect()}
    sig = {r["doc_id"]: r["simhash"] for r in simhash_df(docs).collect()}
    missed = exact - got
    assert got <= exact                       # precision stays exact (verify)
    for a, b in missed:
        assert bin(sig[a] ^ sig[b]).count("1") > 7   # outside the contract
    for a, b in exact - missed:
        pass  # found
    assert len(missed) == 1                   # the known hamming-9 pair


def test_duplicate_spans_differential_vs_python_reference(spark):
    """Brute-force Python reference on random corpora: identical report."""
    import random
    from collections import Counter, defaultdict

    from ophidia_io_server_spark.pipeline.dedup import duplicate_spans

    rng = random.Random(41)
    W = 4
    vocab = [f"t{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30)))
             for _ in range(120)]

    # reference: count windows globally, merge per-doc intervals
    wins = Counter()
    per_doc = defaultdict(list)
    for d, t in enumerate(texts):
        ws = t.split()
        for i in range(len(ws) - W + 1):
            g = " ".join(ws[i:i + W])
            wins[g] += 1
            per_doc[d].append((i, g))
    expect = {}
    for d, t in enumerate(texts):
        hits = sorted(i for i, g in per_doc[d] if wins[g] >= 2)
        if not hits:
            continue
        spans, cur_s, cur_e = [], hits[0], hits[0] + W
        for i in hits[1:]:
            if i > cur_e:
                spans.append((cur_s, cur_e))
                cur_s = i
            cur_e = max(cur_e, i + W)
        spans.append((cur_s, cur_e))
        expect[d] = (len(t.split()), len(hits), len(spans),
                     sum(e - s for s, e in spans))

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["dup_windows"], r["n_spans"],
                         r["dup_tokens"])
           for r in duplicate_spans(docs, window=W).collect()}
    assert got == expect and len(got) > 10


def test_token_budget_differential_vs_python_reference(spark):
    import random

    from ophidia_io_server_spark.pipeline.sampling import select_token_budget

    rng = random.Random(51)
    rows = [(i, rng.randint(1, 50), round(rng.choice([0.1, 0.3, 0.5, 0.9]), 4))
            for i in range(300)]
    budget = 2000
    order = sorted(rows, key=lambda r: (-r[2], r[0]))
    expect, run = {}, 0
    for doc_id, toks, _q in order:
        if run < budget:
            expect[doc_id] = run
        run += toks
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, quality double")
    got = {r["doc_id"]: r["cum_before"]
           for r in select_token_budget(df, budget, "quality", "n_tokens").collect()}
    assert got == expect


def test_remove_spans_keep_canonical_differential(spark):
    """Python reference for keep_in_min_doc=True: a window is cut iff it is
    duplicated corpus-wide AND not the minimum-(doc_id, pos) occurrence."""
    import random
    from collections import Counter, defaultdict

    from ophidia_io_server_spark.pipeline.dedup import remove_duplicate_spans

    rng = random.Random(61)
    W = 4
    vocab = [f"v{i}" for i in range(10)]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(4, 24)))
             for _ in range(80)]

    wins = Counter()
    keeper = {}
    occ = defaultdict(list)
    for d, t in enumerate(texts):
        ws = t.split()
        for i in range(len(ws) - W + 1):
            g = " ".join(ws[i:i + W])
            wins[g] += 1
            occ[(d)].append((i, g))
            if g not in keeper or (d, i) < keeper[g]:
                keeper[g] = (d, i)
    expect = {}
    for d, t in enumerate(texts):
        ws = t.split()
        cut = sorted(i for i, g in occ[d]
                     if wins[g] >= 2 and keeper[g] != (d, i))
        removed = set()
        for i in cut:
            removed.update(range(i, i + W))
        expect[d] = " ".join(w for j, w in enumerate(ws) if j not in removed)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r["text_clean"]
           for r in remove_duplicate_spans(docs, window=W).collect()}
    assert got == expect
    # and something was actually cut somewhere (non-vacuous)
    assert any(got[d] != texts[d] for d in got)
