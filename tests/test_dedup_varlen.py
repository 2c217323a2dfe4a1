"""Variable-length ExactSubstr (`longest_duplicate_match`): differential vs
a genuine suffix-automaton reference on synthetic planted substrings, plus
the fixed-window/variable-length coverage-equivalence invariant."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.dedup import (
    _dup_window_base,
    longest_duplicate_match,
)


class _SuffixAutomaton:
    """Token-level suffix automaton (Blumer et al. 1985 construction) with
    endpos-size counts — the classical exact structure for repeated-factor
    queries, used here purely as a test oracle."""

    def __init__(self):
        self.next = [dict()]
        self.link = [-1]
        self.length = [0]
        self.cnt = [0]
        self.last = 0

    def extend(self, c):
        cur = len(self.next)
        self.next.append(dict())
        self.link.append(0)
        self.length.append(self.length[self.last] + 1)
        self.cnt.append(1)
        p = self.last
        while p != -1 and c not in self.next[p]:
            self.next[p][c] = cur
            p = self.link[p]
        if p == -1:
            self.link[cur] = 0
        else:
            q = self.next[p][c]
            if self.length[p] + 1 == self.length[q]:
                self.link[cur] = q
            else:
                clone = len(self.next)
                self.next.append(dict(self.next[q]))
                self.link.append(self.link[q])
                self.length.append(self.length[p] + 1)
                self.cnt.append(0)
                while p != -1 and self.next[p].get(c) == q:
                    self.next[p][c] = clone
                    p = self.link[p]
                self.link[q] = clone
                self.link[cur] = clone
        self.last = cur

    def finalize(self):
        order = sorted(range(1, len(self.next)),
                       key=lambda v: self.length[v], reverse=True)
        for v in order:
            if self.link[v] > 0:
                self.cnt[self.link[v]] += self.cnt[v]


def _ref_longest(docs_tokens):
    """For each doc: longest factor starting at any position that occurs at
    ≥2 distinct (doc, pos) sites corpus-wide, via ONE automaton over the
    corpus with unique per-doc separators (factors crossing a separator
    occur once, so they never count)."""
    sa = _SuffixAutomaton()
    for j, tk in enumerate(docs_tokens):
        for t in tk:
            sa.extend(("t", t))
        sa.extend(("sep", j))  # unique separator
    sa.finalize()
    out = []
    for tk in docs_tokens:
        best_per_pos = []
        for i in range(len(tk)):
            state, ln = 0, 0
            for t in tk[i:]:
                nxt = sa.next[state].get(("t", t))
                if nxt is None or sa.cnt[nxt] < 2:
                    break
                state, ln = nxt, ln + 1
            best_per_pos.append(ln)
        out.append(best_per_pos)
    return out


def _mk_corpus(rng, n_docs=40, planted=None):
    vocab = [f"w{i}" for i in range(150)]
    docs = []
    for _ in range(n_docs):
        n = int(rng.integers(5, 60))
        docs.append(list(rng.choice(vocab, size=n)))
    for (a, pa, b, pb, ln) in planted or []:
        seg = [f"plant{rng.integers(1e9)}_{k}" for k in range(ln)]
        docs[a][pa:pa] = seg
        docs[b][pb:pb] = seg
    return docs


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_suffix_automaton_reference(spark, seed):
    rng = np.random.default_rng(seed)
    # planted exact duplicates of known lengths, incl. one WITHIN-doc repeat
    docs = _mk_corpus(rng, planted=[(0, 2, 5, 1, 23), (7, 0, 7, 30, 11),
                                    (3, 4, 9, 9, 8)])
    ref = _ref_longest(docs)
    df = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(docs)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           longest_duplicate_match(df, min_len=8, max_match=64).collect()}
    for i, per_pos in enumerate(ref):
        mx = max(per_pos, default=0)
        starts = sum(1 for v in per_pos if v >= 8)
        if mx >= 8:
            assert i in got, f"doc {i}: expected max_dup_len {mx}"
            assert got[i]["max_dup_len"] == mx, (i, got[i]["max_dup_len"], mx)
            assert got[i]["n_dup_starts"] == starts
            assert bool(got[i]["capped"]) is (mx >= 64)
            assert got[i]["n_tokens"] == len(per_pos)
        else:
            assert i not in got


def test_planted_long_repeat_is_found_exactly(spark):
    rng = np.random.default_rng(5)
    docs = _mk_corpus(rng, n_docs=10, planted=[(1, 3, 8, 0, 31)])
    df = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(docs)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["max_dup_len"] for r in
           longest_duplicate_match(df, min_len=20, max_match=64).collect()}
    ref = _ref_longest(docs)
    assert got[1] == max(ref[1]) and got[8] == max(ref[8])
    assert got[1] >= 31  # at least the planted run (may extend by accident)


def test_cap_reports_capped_flag(spark):
    seg = " ".join(f"s{i}" for i in range(40))
    df = spark.createDataFrame(
        [(0, f"a b {seg}"), (1, f"c {seg} d")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           longest_duplicate_match(df, min_len=8, max_match=16).collect()}
    assert got[0]["max_dup_len"] == 16 and bool(got[0]["capped"])


def test_varlen_starts_equal_fixed_window_starts(spark):
    """Cross-algorithm invariant: positions whose longest match is ≥ L are
    exactly the duplicated fixed-L-window start positions."""
    rng = np.random.default_rng(9)
    docs = _mk_corpus(rng, planted=[(2, 1, 6, 2, 14), (4, 0, 4, 20, 9)])
    df = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(docs)],
        "doc_id long, text string")
    L = 8
    base = _dup_window_base(df, L, "text", with_tokens=False)
    dup = (base.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
           .where(F.col("c") >= 2).select("h"))
    fixed = (base.join(dup, "h").groupBy("doc_id")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_starts")))
    fixed_m = {r["doc_id"]: r["n_starts"] for r in fixed.collect()}
    var_m = {r["doc_id"]: r["n_dup_starts"] for r in
             longest_duplicate_match(df, min_len=L, max_match=64).collect()}
    # fixed-window pos is 0-based from posexplode → starts count identical
    assert var_m == {k: v for k, v in fixed_m.items() if v > 0}


def test_incremental_minhash_equals_full_run_restriction(spark):
    """Batch-arrival invariance: incremental(old, new) must equal the full
    corpus run restricted to pairs touching a new doc — on a corpus with
    planted near-dups inside old, inside new, and across the split."""
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    rng = np.random.default_rng(21)
    docs = _mk_corpus(rng, n_docs=60)
    # near-dup pairs: old-old (ids 2,4), new-new (3,5), cross (6,7)
    for a, b in ((2, 4), (3, 5), (6, 7)):
        base = [f"dup{a}{b}_{i}" for i in range(30)]
        docs[a] = base + docs[a][:3]
        docs[b] = base + docs[b][:2]
    df = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(docs)],
        "doc_id long, text string")
    old = df.where(F.col("doc_id") % 2 == 0)
    new = df.where(F.col("doc_id") % 2 == 1)
    inc = minhash_lsh_pairs_incremental(old, new).collect()
    full = minhash_lsh_pairs(df).collect()
    want = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in full
            if r["doc_a"] % 2 == 1 or r["doc_b"] % 2 == 1}
    got = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in inc}
    assert got == want and len(got) >= 2      # new-new + cross at least
    # the old-old planted pair must NOT be re-emitted by the incremental run
    assert (2, 4) not in {(a, b) for a, b, _ in got}
    assert (2, 4) in {(r["doc_a"], r["doc_b"]) for r in full}


def _ref_suffix_ranks(docs_tokens):
    """Dense ranks of all (doc, pos) suffixes under true token-tuple
    lexicographic order (shorter-prefix-first); identical suffixes share a
    rank — the exact contract of suffix_array_ranks."""
    sufs = [((d, p + 1), tuple(tk[p:]))
            for d, tk in enumerate(docs_tokens) for p in range(len(tk))]
    sufs.sort(key=lambda x: x[1])
    ranks, r, prev = {}, 0, None
    for key, t in sufs:
        if t != prev:
            r += 1
            prev = t
        ranks[key] = r
    return ranks


@pytest.mark.parametrize("seed", [0, 3])
def test_suffix_array_matches_python_reference(spark, seed):
    """Manber-Myers ranks must equal the reference dense ranks exactly —
    including shared ranks for identical cross-doc suffixes and the
    shorter-prefix-first convention."""
    from ophidia_io_server_spark.pipeline.dedup import suffix_array_ranks

    rng = np.random.default_rng(seed)
    docs = _mk_corpus(rng, n_docs=25, planted=[(0, 1, 4, 2, 12)])
    # force identical full suffixes across docs (shared-rank path)
    docs[7] = docs[3][-5:]
    df = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(docs)],
        "doc_id long, text string")
    got = {(r["doc_id"], r["pos"]): r["rank"]
           for r in suffix_array_ranks(df, partitions=5).collect()}
    want = _ref_suffix_ranks(docs)
    assert got == want


def test_global_dense_rank_matches_sql_semantics(spark):
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.operators.ranking import global_dense_rank

    rng = np.random.default_rng(1)
    vals = [(int(v),) for v in rng.integers(0, 200, size=5000)]
    df = spark.createDataFrame(vals, "v long").repartition(13)
    got = global_dense_rank(df, ["v"], partitions=7)
    rows = got.collect()
    assert len(rows) == 5000
    # dense-rank law: rank is order-isomorphic to v, ties share, no gaps
    by_v = {}
    for r in rows:
        by_v.setdefault(r["v"], set()).add(r["rank"])
    assert all(len(s) == 1 for s in by_v.values())
    ordered = sorted(by_v.items())
    ranks = [next(iter(s)) for _, s in ordered]
    assert ranks == list(range(1, len(ordered) + 1))


@pytest.mark.parametrize("seed", [0, 2])
def test_sa_report_matches_suffix_automaton_reference(spark, seed):
    """The suffix-array rebase must be EXACT and uncapped: per-doc longest
    duplicated substring + start counts equal the automaton reference."""
    from ophidia_io_server_spark.pipeline.dedup import longest_match_report_sa

    rng = np.random.default_rng(seed)
    docs = _mk_corpus(rng, planted=[(0, 2, 5, 1, 23), (7, 0, 7, 30, 11),
                                    (3, 4, 9, 9, 8)])
    ref = _ref_longest(docs)
    df = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(docs)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           longest_match_report_sa(df, min_len=8).collect()}
    for i, per_pos in enumerate(ref):
        mx = max(per_pos, default=0)
        starts = sum(1 for v in per_pos if v >= 8)
        if mx >= 8:
            assert got[i]["max_dup_len"] == mx
            assert got[i]["n_dup_starts"] == starts
            assert got[i]["n_tokens"] == len(per_pos)
        else:
            assert i not in got


def test_sa_report_agrees_with_capped_path_below_cap(spark):
    """Row-identity between the hash-bucket capped path and the SA rebase
    wherever the cap does not bind (max_dup_len < cap)."""
    rng = np.random.default_rng(11)
    docs = _mk_corpus(rng, planted=[(1, 3, 8, 0, 31), (2, 1, 6, 2, 14)])
    df = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(docs)],
        "doc_id long, text string")
    from ophidia_io_server_spark.pipeline.dedup import longest_match_report_sa

    capped = {r["doc_id"]: r for r in
              longest_duplicate_match(df, min_len=8, max_match=64).collect()}
    sa = {r["doc_id"]: r for r in
          longest_match_report_sa(df, min_len=8).collect()}
    assert set(capped) == set(sa)
    for i, r in sa.items():
        assert not capped[i]["capped"]
        for c in ("n_tokens", "max_dup_len", "n_dup_starts"):
            assert r[c] == capped[i][c], (i, c)


def test_varlen_cut_matches_reference_cut(spark):
    """Cut differential: remove exactly the positions inside a duplicated
    run of true length >= T, per the automaton reference lengths."""
    from ophidia_io_server_spark.pipeline.dedup import (
        remove_duplicate_spans_varlen,
    )

    rng = np.random.default_rng(4)
    docs = _mk_corpus(rng, planted=[(0, 2, 5, 1, 23), (7, 0, 7, 30, 11)])
    df = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(docs)],
        "doc_id long, text string")
    T = 10
    ref = _ref_longest(docs)
    got = {r["doc_id"]: r for r in
           remove_duplicate_spans_varlen(df, min_len=T).collect()}
    for i, per_pos in enumerate(ref):
        covered = [False] * len(per_pos)
        for q, L in enumerate(per_pos):
            if L >= T:
                for p in range(q, min(len(per_pos), q + L)):
                    covered[p] = True
        kept = " ".join(t for t, c in zip(docs[i], covered) if not c)
        assert got[i]["text_cleaned"] == kept, i
        assert got[i]["n_removed"] == sum(covered)
        assert got[i]["n_tokens"] == len(per_pos)


def test_varlen_cut_null_and_empty_text_pass_through(spark):
    from ophidia_io_server_spark.pipeline.dedup import (
        remove_duplicate_spans_varlen,
    )

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "a b c")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           remove_duplicate_spans_varlen(df, min_len=5).collect()}
    assert got[0]["text_cleaned"] is None and got[0]["n_removed"] == 0
    assert got[1]["text_cleaned"] == "" and got[1]["n_removed"] == 0
    assert got[2]["text_cleaned"] == "a b c" and got[2]["n_tokens"] == 3


def test_varlen_cut_coverage_equals_fixed_window_coverage(spark):
    """The coverage-equivalence theorem, asserted cross-algorithm: the
    varlen cut's removed POSITION SET at threshold T equals fixed-window
    duplicate coverage at window T."""
    from ophidia_io_server_spark.pipeline.dedup import (
        remove_duplicate_spans_varlen,
    )

    rng = np.random.default_rng(13)
    docs = _mk_corpus(rng, planted=[(2, 1, 6, 2, 14), (4, 0, 4, 20, 9)])
    df = spark.createDataFrame(
        [(i, " ".join(tk)) for i, tk in enumerate(docs)],
        "doc_id long, text string")
    T = 8
    base = _dup_window_base(df, T, "text", with_tokens=False)
    dup = (base.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
           .where(F.col("c") >= 2).select("h"))
    # fixed coverage: positions [q, q+T) for every duplicated window start q
    fixed_cov = {}
    for r in base.join(dup, "h").select("doc_id", "pos").collect():
        s = fixed_cov.setdefault(r["doc_id"], set())
        s.update(range(r["pos"], r["pos"] + T))  # 0-based starts
    got = {r["doc_id"]: r for r in
           remove_duplicate_spans_varlen(df, min_len=T).collect()}
    for i, tk in enumerate(docs):
        want_removed = len(fixed_cov.get(i, set()))
        assert got[i]["n_removed"] == want_removed, i
