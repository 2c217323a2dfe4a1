"""Paragraph dedup: differential vs a Python reference, canonical-keeper
semantics, blank-paragraph preservation, layout independence."""

from __future__ import annotations

import numpy as np
import pytest

from ophidia_io_server_spark.pipeline.dedup import remove_duplicate_paragraphs

BOILER = ["subscribe to our newsletter", "all rights reserved",
          "click here to continue"]
BODY = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota",
        "kappa lambda", "mu nu xi omicron pi"]


def _ref(rows, min_count=2, keep_canonical=True):
    from collections import Counter

    paras = [(i, j, p) for i, t in rows for j, p in enumerate(t.split("\n"))]
    cnt = Counter(p for _, _, p in paras if p.strip() != "")
    canon = {}
    for i, j, p in paras:
        if p.strip() != "" and (p not in canon or (i, j) < canon[p]):
            canon[p] = (i, j)
    out = {}
    for i, t in rows:
        kept, removed = [], 0
        for j, p in enumerate(t.split("\n")):
            if p.strip() == "" or cnt[p] < min_count or \
                    (keep_canonical and canon[p] == (i, j)):
                kept.append(p)
            else:
                removed += 1
        out[i] = ("\n".join(kept), len(t.split("\n")), removed)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(23)
    rows = []
    for i in range(40):
        paras = list(rng.choice(BODY, size=int(rng.integers(1, 4)), replace=False))
        if rng.random() < 0.7:
            paras.insert(int(rng.integers(0, len(paras) + 1)),
                         str(rng.choice(BOILER)))
        if rng.random() < 0.3:
            paras.append("")           # trailing blank line
        rows.append((i, "\n".join(paras)))
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("keep_canonical", [True, False])
def test_matches_reference(spark, corpus, keep_canonical):
    rows, docs = corpus
    got = {r["doc_id"]: (r["text_cleaned"], r["n_paragraphs"], r["n_removed"])
           for r in remove_duplicate_paragraphs(
               docs, keep_canonical=keep_canonical).collect()}
    exp = _ref(rows, keep_canonical=keep_canonical)
    assert got == exp


def test_layout_independent(spark, corpus):
    rows, docs = corpus
    a = sorted(map(tuple, remove_duplicate_paragraphs(docs).collect()))
    b = sorted(map(tuple, remove_duplicate_paragraphs(
        docs.repartition(13)).collect()))
    assert a == b


def test_canonical_is_first_occurrence(spark):
    docs = spark.createDataFrame(
        [(5, "dup line\nunique five"), (2, "dup line\nunique two"),
         (9, "pre\ndup line")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["text_cleaned"]
           for r in remove_duplicate_paragraphs(docs).collect()}
    assert got[2] == "dup line\nunique two"     # lowest doc_id keeps it
    assert got[5] == "unique five"
    assert got[9] == "pre"


def test_blank_paragraphs_survive(spark):
    docs = spark.createDataFrame(
        [(0, "a\n\nb"), (1, "c\n\nd")], "doc_id long, text string")
    got = {r["doc_id"]: r["text_cleaned"]
           for r in remove_duplicate_paragraphs(docs).collect()}
    assert got == {0: "a\n\nb", 1: "c\n\nd"}    # the empty line is not "dup"


def test_null_text_survives_with_null_cleaned(spark):
    docs = spark.createDataFrame(
        [(1, "dup\nbody one\ndup"), (2, None), (3, "dup\nbody two")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           remove_duplicate_paragraphs(docs, min_count=2).collect()}
    assert set(got) == {1, 2, 3}, "NULL-text doc must not disappear"
    assert got[2]["text_cleaned"] is None
    assert got[2]["n_paragraphs"] == 0 and got[2]["n_removed"] == 0
    assert got[1]["text_cleaned"] == "dup\nbody one"  # canonical keeper


def test_separator_is_literal_not_regex(spark):
    """A '.' or '|' separator must split on the literal character — regex
    interpretation would explode every document per-character."""
    docs = spark.createDataFrame(
        [(1, "dup.body one.dup"), (2, "dup.body two")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           remove_duplicate_paragraphs(docs, min_count=2, sep=".").collect()}
    assert got[1]["n_paragraphs"] == 3
    assert got[1]["text_cleaned"] == "dup.body one"
    assert got[2]["text_cleaned"] == "body two"
    docs2 = spark.createDataFrame([(1, "a|b|a"), (2, "a|c")],
                                  "doc_id long, text string")
    got2 = {r["doc_id"]: r["text_cleaned"] for r in
            remove_duplicate_paragraphs(docs2, min_count=2, sep="|").collect()}
    assert got2 == {1: "a|b", 2: "c"}


# --- winnowing fingerprints (Schleimer et al. 2003) -------------------------


def test_winnow_guarantee_shared_run(spark):
    """Any shared run of >= w+k-1 tokens yields >= 1 shared fingerprint
    (the paper's correctness guarantee), checked on a planted overlap."""
    from ophidia_io_server_spark.pipeline.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"        # 6 = w+k-1 tokens
    d1 = "one two three " + shared + " four five six seven"
    d2 = "red green blue " + shared + " cyan magenta yellow black"
    df = spark.createDataFrame([(1, d1), (2, d2)],
                               "doc_id long, text string")
    fp = winnow_fingerprints(df, k=3, w=4)
    h1 = {r["h"] for r in fp.where("doc_id = 1").collect()}
    h2 = {r["h"] for r in fp.where("doc_id = 2").collect()}
    assert h1 & h2, "shared >=(w+k-1)-token run must share a fingerprint"


def test_winnow_disjoint_docs_share_nothing(spark):
    from ophidia_io_server_spark.pipeline.dedup import winnow_pairs

    df = spark.createDataFrame(
        [(1, " ".join(f"a{i}" for i in range(30))),
         (2, " ".join(f"b{i}" for i in range(30)))],
        "doc_id long, text string")
    assert winnow_pairs(df, min_shared=1).count() == 0


def test_winnow_density_and_layout_invariance(spark):
    """Selection density is near the paper's 2/(w+1); fingerprints are
    identical at any partitioning (window keys are row values)."""
    from ophidia_io_server_spark.pipeline.dedup import winnow_fingerprints
    from ophidia_io_server_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    fp = winnow_fingerprints(docs, k=3, w=4)
    n_sel = fp.count()
    n_windows = (docs.where("text IS NOT NULL")
                 .selectExpr("size(split(trim(text), ' +')) AS P")
                 .where("P >= 6").selectExpr("sum(P - 5)").first()[0])
    # distinct-collapse pulls density below the 2/(w+1)=0.4 expectation
    assert 0.1 < n_sel / n_windows < 0.6
    fp2 = winnow_fingerprints(docs.repartition(13, "lang"), k=3, w=4)
    assert (fp.exceptAll(fp2).count() == 0
            and fp2.exceptAll(fp).count() == 0)
