"""Scale probe + certificates for the eight round-9 operators at sf0.01
vs the 100x replica (scripts/make_10x.py; the prefix set join runs at
10x — see its note).

Certificates (the replica's construction makes these EXACT):
  * events_hopping_window — same time span, 100x events: every
    (win_start, event_type) count scales exactly 100x.
  * events_welch_ttest — identical value distribution per replica:
    means bitwise equal; t scales ~sqrt(100) (soft, (n-1) shifts it).
  * lineitem_correlation_matrix — row-exact replicas: all sums scale
    100x, correlations equal to <=1e-9 (double cast of scaled ints).
  * doc_keyword_extraction — token permutation preserves per-doc tf and
    scales df/N exactly 100x, so the original-doc slice's (token, rank)
    picks are invariant.
  * doc_prefix_jaccard_pairs — token SETS are permutation-INVARIANT, so
    replicas form Jaccard-1.0 cliques: the k-replica corpus is the
    ADVERSARIAL quadratic regime for set semantics (the shingle
    operators dodge it via the permutation; sets cannot).  Probed at
    10x: cross-original pairs must equal sf0.01's, plus exactly
    C(10,2) clique pairs per original doc.
  * orders_bloom_semijoin — keys shift per replica: n/revenue scale
    exactly 100x, both certificates stay true (fp bound re-derived at
    the 100x key count).
  * events_spatial_neighbors — new ids = new points at 100x density:
    soundness = max emitted dist <= r; completeness = brute-force
    equality on the [0,0.05)^2 slice.
  * token_association_rules — unigram-preserving permutation: all
    counts scale 100x, so support/confidence/lift are the SAME exact
    rationals -> rule set identical to sf0.01.

Usage: python scripts/r9_scale_probe.py [sf001] [x100] [x10]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def timed(fn, *a):
    df = fn(*a)
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    rows = fn(*a).collect()
    return time.perf_counter() - t0, rows


def main() -> None:
    sf001 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    x100 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ophidia_sf100x"
    x10 = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ophidia_sf10x"
    OFF = 10_000_000

    from ophidia_io_server_spark import get_spark
    from ophidia_io_server_spark.workload import WORKLOADS

    spark = get_spark(app_name="r9-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ok_all = True

    def check(name, cond, msg=""):
        nonlocal ok_all
        ok_all &= bool(cond)
        print(f"  cert {name}: {'OK' if cond else 'FAIL'} {msg}")

    # --- hopping window: exact 100x per-window counts -------------------
    t1, r1 = timed(WORKLOADS["events_hopping_window"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_hopping_window"].fn, spark, x100)
    print(f"events_hopping_window: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} -> {len(r2)} rows)")
    m1 = {(r["win_start"], r["event_type"]): (r["n_events"], r["total_cents"])
          for r in r1}
    m2 = {(r["win_start"], r["event_type"]): (r["n_events"], r["total_cents"])
          for r in r2}
    check("hopping_100x_counts",
          set(m1) == set(m2)
          and all(m2[k] == (100 * n, 100 * c) for k, (n, c) in m1.items()))

    # --- Welch t-test: identical means, t ~ 10x -------------------------
    t1, r1 = timed(WORKLOADS["events_welch_ttest"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_welch_ttest"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"events_welch_ttest: {t1:.2f}s -> {t2:.2f}s  "
          f"t {a['t_stat']} -> {b['t_stat']}")
    check("ttest_means_equal",
          a["mean_a"] == b["mean_a"] and a["mean_b"] == b["mean_b"])
    check("ttest_n_100x", b["na"] == 100 * a["na"] and b["nb"] == 100 * a["nb"])
    check("ttest_t_10x", abs(b["t_stat"] / a["t_stat"] - 10.0) < 0.01,
          f"ratio={b['t_stat']/a['t_stat']:.4f}")

    # --- correlation matrix: invariant under row replication ------------
    t1, r1 = timed(WORKLOADS["lineitem_correlation_matrix"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["lineitem_correlation_matrix"].fn, spark, x100)
    print(f"lineitem_correlation_matrix: {t1:.2f}s -> {t2:.2f}s")
    c1 = {(r["col_a"], r["col_b"]): r["corr"] for r in r1}
    c2 = {(r["col_a"], r["col_b"]): r["corr"] for r in r2}
    check("corr_invariant",
          set(c1) == set(c2)
          and all(abs(c1[k] - c2[k]) <= 1e-9 for k in c1))

    # --- keyword extraction: original-doc picks invariant ---------------
    t1, r1 = timed(WORKLOADS["doc_keyword_extraction"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["doc_keyword_extraction"].fn, spark, x100)
    print(f"doc_keyword_extraction: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} -> {len(r2)} rows)")
    k1 = {(r["doc_id"], r["rank"]): (r["token"], r["tf"]) for r in r1}
    k2 = {(r["doc_id"], r["rank"]): (r["token"], r["tf"])
          for r in r2 if r["doc_id"] < OFF}
    check("keywords_slice_invariant", k1 == k2)
    df2 = {(r["doc_id"], r["rank"]): r["df"] for r in r2
           if r["doc_id"] < OFF}
    check("keywords_df_100x",
          all(df2.get((r["doc_id"], r["rank"])) == 100 * r["df"]
              for r in r1))

    # --- prefix set join at 10x: clique + slice certificates ------------
    t1, r1 = timed(WORKLOADS["doc_prefix_jaccard_pairs"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["doc_prefix_jaccard_pairs"].fn, spark, x10)
    print(f"doc_prefix_jaccard_pairs: {t1:.2f}s (sf0.01) -> {t2:.2f}s (10x) "
          f"({len(r1)} -> {len(r2)} rows)")
    p1 = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in r1}
    # original-pair slice: both ids in replica 0
    slice0 = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in r2
              if r["doc_a"] < OFF and r["doc_b"] < OFF}
    check("prefix_slice_invariant", slice0 == p1)
    # every original doc's 10 replicas form a jaccard-1.0 clique
    n_clique = sum(1 for r in r2
                   if r["doc_a"] % OFF == r["doc_b"] % OFF
                   and r["jaccard"] == 1.0)
    from ophidia_io_server_spark.sources.tables import load_table
    n_docs = (load_table(spark, sf001, "documents")
              .where(F.col("doc_id") % 10 == 0)  # the workload's slice
              .where(F.col("text").isNotNull())
              .where(F.size(F.filter(F.split("text", " "),
                                     lambda w: w != "")) > 0).count())
    check("prefix_replica_cliques", n_clique >= n_docs * 45,
          f"clique pairs {n_clique} >= {n_docs}*C(10,2)")

    # --- bloom semi-join: exact 100x aggregates + certs -----------------
    t1, r1 = timed(WORKLOADS["orders_bloom_semijoin"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["orders_bloom_semijoin"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"orders_bloom_semijoin: {t1:.2f}s -> {t2:.2f}s")
    check("bloom_100x_exact",
          b["n_orders"] == 100 * a["n_orders"]
          and b["n_li"] == 100 * a["n_li"]
          and b["revenue_e4"] == 100 * a["revenue_e4"])
    check("bloom_certs_hold",
          b["bloom_no_false_negative"] and b["fp_within_bound"])

    # --- spatial neighbors: soundness + sliced completeness -------------
    t1, r1 = timed(WORKLOADS["events_spatial_neighbors"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_spatial_neighbors"].fn, spark, x100)
    print(f"events_spatial_neighbors: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} -> {len(r2)} rows)")
    check("spatial_soundness", all(r["dist"] <= 0.01 for r in r2))
    # completeness on the [0, 0.05)^2 slice: brute force in numpy
    ev = load_table(spark, x100, "events")
    h = F.md5(F.col("event_id").cast("string"))
    pts = (ev.where(F.col("event_type") == "purchase")
           .select("event_id",
                   (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
                    % 1000000 / 1000000.0).alias("x"),
                   (F.conv(F.substring(h, 17, 15), 16, 10).cast("bigint")
                    % 1000000 / 1000000.0).alias("y"))
           .where((F.col("x") < 0.05) & (F.col("y") < 0.05))).collect()
    import numpy as np
    ids = np.array([r["event_id"] for r in pts])
    X = np.array([[r["x"], r["y"]] for r in pts])
    want = set()
    if len(ids):
        d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
        ii, jj = np.where(d2 <= 0.01 ** 2)
        want = {(int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
                for i, j in zip(ii, jj) if ids[i] < ids[j]}
    got = {(r["id_a"], r["id_b"]) for r in r2}
    check("spatial_completeness_slice", want <= got,
          f"{len(want)} brute-force pairs in slice")

    # --- association rules: metrics invariant ----------------------------
    t1, r1 = timed(WORKLOADS["token_association_rules"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["token_association_rules"].fn, spark, x100)
    print(f"token_association_rules: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} -> {len(r2)} rows)")
    # the min-support threshold is ABSOLUTE (20 docs), so the 100x corpus
    # legitimately admits rules whose base support was 1..19; the exact
    # invariant is over the threshold-scaled slice: 100x rules with
    # nab >= 100*20 are EXACTLY the base rules with metrics unchanged
    # (every count scales 100x -> identical rationals)
    a1 = {(r["antecedent"], r["consequent"]):
          (100 * r["nab"], r["support"], r["confidence"], r["lift"])
          for r in r1}
    a2 = {(r["antecedent"], r["consequent"]):
          (r["nab"], r["support"], r["confidence"], r["lift"])
          for r in r2 if r["nab"] >= 100 * 20}
    check("rules_invariant_100x_scaled_threshold", a1 == a2,
          f"{len(a1)} base rules == {len(a2)} 100x rules at nab>=2000 "
          f"(unfiltered 100x rule count {len(r2)} — absolute threshold)")

    # --- third wave -------------------------------------------------------
    # OHLC: replica preserves per-window value sets -> OHLC invariant, n 100x
    t1, r1 = timed(WORKLOADS["events_ohlc_hourly"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_ohlc_hourly"].fn, spark, x100)
    print(f"events_ohlc_hourly: {t1:.2f}s -> {t2:.2f}s")
    o1 = {(r["hour_start"], r["event_type"]):
          (r["open"], r["high"], r["low"], r["close"], 100 * r["n"])
          for r in r1}
    o2 = {(r["hour_start"], r["event_type"]):
          (r["open"], r["high"], r["low"], r["close"], r["n"])
          for r in r2}
    check("ohlc_invariant_100x", o1 == o2)

    # hopping streaming twin: drained stream counts scale exactly 100x
    t1, r1 = timed(WORKLOADS["events_hopping_streaming"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_hopping_streaming"].fn, spark, x100)
    print(f"events_hopping_streaming: {t1:.2f}s -> {t2:.2f}s")
    h1 = {(r["win_start"], r["event_type"]): (100 * r["n_events"],
                                              100 * r["total_cents"])
          for r in r1}
    h2 = {(r["win_start"], r["event_type"]): (r["n_events"],
                                              r["total_cents"])
          for r in r2}
    check("hopping_stream_100x", h1 == h2)

    # WOE bins: replica blocks of 100 never straddle a decile boundary
    # (boundaries are multiples of 10n with n % 10 == 0), so counts scale
    # exactly 100x; woe moves only by the +0.5 smoothing term
    t1, r1 = timed(WORKLOADS["orders_woe_price_bins"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["orders_woe_price_bins"].fn, spark, x100)
    print(f"orders_woe_price_bins: {t1:.2f}s -> {t2:.2f}s")
    w1 = {r["bin"]: (100 * r["n_orders"], 100 * r["n_bad"], r["woe"])
          for r in r1}
    w2 = {r["bin"]: (r["n_orders"], r["n_bad"], r["woe"]) for r in r2}
    check("woe_counts_100x",
          set(w1) == set(w2)
          and all(w2[k][:2] == w1[k][:2] for k in w1))
    check("woe_value_stable",
          all(abs(w2[k][2] - w1[k][2]) < 1e-3 for k in w1))

    # stratified split: per-(lang, split) counts scale exactly 100x
    # (rank thresholds are exact integer divisions of 100x stratum sizes)
    t1, r1 = timed(WORKLOADS["doc_stratified_split"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["doc_stratified_split"].fn, spark, x100)
    print(f"doc_stratified_split: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} -> {len(r2)} rows)")
    from collections import Counter
    s1 = Counter((r["lang"], r["split"]) for r in r1)
    s2 = Counter((r["lang"], r["split"]) for r in r2)
    # thresholds are floor divisions of the STRATUM size, which does not
    # scale linearly (floor(0.8n)*100 != floor(0.8*100n) unless 10 | n):
    # recompute the exact expected shares from the 100x stratum sizes
    n_lang = Counter(r["lang"] for r in r1)
    want = {}
    for lang, n in n_lang.items():
        N = 100 * n
        tr = (N * 8) // 10
        va = (N * 9) // 10 - tr
        want[(lang, "train")] = tr
        want[(lang, "val")] = va
        want[(lang, "test")] = N - tr - va
    check("split_shares_exact_at_100x", dict(s2) == want,
          f"base shares {dict(s1)}")

    print("ALL CERTS OK" if ok_all else "CERT FAILURES — see above")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
