"""Round-10 scale certificates: the eight new operators at sf0.01
vs the 100x replica (scripts/make_10x.py; the containment join runs at
10x — its output is quadratic in the replica count by construction).

Each certificate is an EXACT derivation, not a tolerance:
  * orders_gini_revenue — Gini is provably INVARIANT under uniform
    k-fold duplication (the Lorenz curve is identical; the (n+1) terms
    cancel: G' = (2*10^4*S - 10^4*(n+1/1)*T...) reduces to G exactly),
    so the 100x row must carry the SAME gini with n,sum scaled 100x.
  * lineitem_winsorized_stats — cum counts scale 100x so the p01/p99
    boundary VALUES are identical (ceil(q*100n)-th value falls in the
    same tie block); win_sum scales exactly 100x, the mean is equal.
  * events_mannwhitney_utest — U and z recomputed exactly in Python
    from the base distinct-value counts with every count * 100.
  * events_seasonal_decompose — events replicate at the SAME ts, so
    every hourly count is exactly 100x; trend/seasonal/resid all scale
    by 100 (exact rationals of scaled integers).
  * events_acf — the ACF ratio has numerator and denominator both
    ~(100)^2: bitwise-invariant per (type, lag).
  * source_kmv_overlap — replica docs PERMUTE tokens within each doc
    (make_10x), so every per-source DISTINCT token set is preserved:
    sketches, estimates, exacts and bounds must be bitwise identical.
  * doc_weighted_sample — independent-engine replay: DuckDB runs the
    workload's own oracle on the 100x corpus; rows must match exactly.
  * doc_containment_pairs (10x) — replica sets equal original sets, so
    the directed pair count is exactly k^2*P + k*(k-1)*D (P = base
    pairs, D = sliced docs with a nonempty token set; self-replica
    containment is 1.0).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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

    spark = get_spark(app_name="r10-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ok_all = True

    def check(name, cond, msg=""):
        nonlocal ok_all
        ok_all &= bool(cond)
        print(f"  cert {name}: {'OK' if cond else 'FAIL'} {msg}")

    # --- Gini: invariant under uniform duplication ----------------------
    t1, r1 = timed(WORKLOADS["orders_gini_revenue"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["orders_gini_revenue"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"orders_gini_revenue: {t1:.2f}s -> {t2:.2f}s  "
          f"gini {a['gini']} -> {b['gini']}")
    check("gini_invariant_100x", abs(b["gini"] - a["gini"]) <= 1e-6
          and b["n_orders"] == 100 * a["n_orders"]
          and b["sum_cents"] == 100 * a["sum_cents"])

    # --- winsorize: identical boundaries, 100x sums ----------------------
    t1, r1 = timed(WORKLOADS["lineitem_winsorized_stats"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["lineitem_winsorized_stats"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"lineitem_winsorized_stats: {t1:.2f}s -> {t2:.2f}s  "
          f"bounds ({a['lo_cents']},{a['hi_cents']}) -> "
          f"({b['lo_cents']},{b['hi_cents']})")
    check("winsorize_bounds_exact_100x",
          b["lo_cents"] == a["lo_cents"] and b["hi_cents"] == a["hi_cents"]
          and b["n_rows"] == 100 * a["n_rows"]
          and b["win_sum_cents"] == 100 * a["win_sum_cents"]
          and abs(b["win_mean"] - a["win_mean"]) <= 1e-6)

    # --- Mann-Whitney: exact recomputation with counts * 100 ------------
    t1, r1 = timed(WORKLOADS["events_mannwhitney_utest"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_mannwhitney_utest"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"events_mannwhitney_utest: {t1:.2f}s -> {t2:.2f}s  "
          f"z {a['z']} -> {b['z']}")
    # recompute the 100x expectation from the base value counts
    import duckdb
    cnts = duckdb.sql(f"""
      SELECT CAST(ROUND(value*100) AS BIGINT) v,
             COUNT(*) c,
             SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) ca
      FROM read_parquet('{sf001}/events.parquet')
      WHERE event_type IN ('purchase','click')
        AND value IS NOT NULL AND NOT isnan(value)
      GROUP BY 1 ORDER BY 1""").fetchall()
    K = 100
    cum = 0
    r2sum = 0
    ties = 0
    na = 0
    for _, c, ca in cnts:
        c, ca = K * int(c), K * int(ca)
        cum += c
        r2sum += ca * (2 * cum - c + 1)
        ties += c * c * c - c
        na += ca
    n = cum
    nb = n - na
    u = (r2sum - na * (na + 1)) / 2
    import math
    var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    check("mwu_exact_recomputation_100x",
          b["na"] == na and b["nb"] == nb
          and b["u_stat"] == round(u, 4) and b["z"] == round(z, 6),
          f"expected u={round(u,4)} z={round(z,6)}")

    # --- seasonal decomposition: every component scales exactly 100x ----
    t1, r1 = timed(WORKLOADS["events_seasonal_decompose"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_seasonal_decompose"].fn, spark, x100)
    print(f"events_seasonal_decompose: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} -> {len(r2)} rows)")
    m1 = {(r["event_type"], r["hr"]): r for r in r1}
    m2 = {(r["event_type"], r["hr"]): r for r in r2}
    check("seasonal_rows_match", set(m1) == set(m2))
    check("seasonal_components_100x", all(
        m2[k]["y"] == 100 * m1[k]["y"]
        and abs(m2[k]["trend"] - 100 * m1[k]["trend"]) <= 1e-3
        and abs(m2[k]["seasonal"] - 100 * m1[k]["seasonal"]) <= 1e-3
        and abs(m2[k]["resid"] - 100 * m1[k]["resid"]) <= 1e-3
        for k in m1))

    # --- ACF: bitwise scale-invariant ------------------------------------
    t1, r1 = timed(WORKLOADS["events_acf"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_acf"].fn, spark, x100)
    print(f"events_acf: {t1:.2f}s -> {t2:.2f}s")
    a1 = {(r["event_type"], r["lag"]): r["acf"] for r in r1}
    a2 = {(r["event_type"], r["lag"]): r["acf"] for r in r2}
    check("acf_invariant_100x",
          set(a1) == set(a2)
          and all(abs(a1[k] - a2[k]) <= 1e-6 for k in a1))

    # --- KMV: distinct sets preserved -> bitwise identical ---------------
    t1, r1 = timed(WORKLOADS["source_kmv_overlap"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["source_kmv_overlap"].fn, spark, x100)
    print(f"source_kmv_overlap: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} -> {len(r2)} rows)")
    k1 = {(r["source_a"], r["source_b"]): tuple(r)[2:] for r in r1}
    k2 = {(r["source_a"], r["source_b"]): tuple(r)[2:] for r in r2}
    check("kmv_bitwise_invariant_100x", k1 == k2)
    check("kmv_all_within_bound", all(r["within_bound"] for r in r2))

    # --- weighted sample: independent-engine replay at 100x -------------
    t1, r1 = timed(WORKLOADS["doc_weighted_sample"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["doc_weighted_sample"].fn, spark, x100)
    print(f"doc_weighted_sample: {t1:.2f}s -> {t2:.2f}s")
    want = duckdb.sql(f"""
      WITH d AS (
        SELECT doc_id, n_chars, 1 + n_chars // 50 AS w
        FROM read_parquet('{x100}/documents.parquet')
        WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars >= 0),
      ex AS (SELECT doc_id, n_chars, w, unnest(range(w)) AS j FROM d),
      pr AS (
        SELECT doc_id, any_value(n_chars) n_chars, any_value(w) w,
               MIN(CAST(('0x' || substr(md5(md5(CAST(doc_id AS VARCHAR))
                   || '#ws:' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT))
                 AS priority
        FROM ex GROUP BY doc_id)
      SELECT doc_id, CAST(n_chars AS BIGINT), CAST(w AS BIGINT), priority
      FROM pr ORDER BY priority, doc_id LIMIT 100""").fetchall()
    check("weighted_sample_duckdb_replay_100x",
          sorted(map(tuple, r2)) == sorted(map(tuple, want)))

    # --- containment at 10x: exact quadratic pair-count formula ---------
    t1, r1 = timed(WORKLOADS["doc_containment_pairs"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["doc_containment_pairs"].fn, spark, x10)
    print(f"doc_containment_pairs: {t1:.2f}s (sf0.01) -> {t2:.2f}s (10x) "
          f"({len(r1)} -> {len(r2)} rows)")
    d_docs = duckdb.sql(f"""
      SELECT COUNT(*) FROM (
        SELECT doc_id FROM read_parquet('{sf001}/documents.parquet')
        WHERE text IS NOT NULL AND doc_id % 10 = 0
          AND len(list_filter(string_split(text,' '), w -> w <> '')) > 0
      )""").fetchone()[0]
    k = 10
    expect = k * k * len(r1) + k * (k - 1) * int(d_docs)
    check("containment_pair_count_formula_10x", len(r2) == expect,
          f"expected {expect} = {k}^2*{len(r1)} + {k}*{k-1}*{d_docs}")
    slice0 = {(r["doc_a"], r["doc_b"]): r["containment"] for r in r2
              if r["doc_a"] < OFF and r["doc_b"] < OFF}
    p1 = {(r["doc_a"], r["doc_b"]): r["containment"] for r in r1}
    check("containment_slice_invariant", slice0 == p1)

    # --- KS: D invariant, scaled statistic exactly 10x -------------------
    t1, r1 = timed(WORKLOADS["events_ks_test"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_ks_test"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"events_ks_test: {t1:.2f}s -> {t2:.2f}s  "
          f"D {a['d_stat']} -> {b['d_stat']}")
    check("ks_d_invariant_100x", abs(b["d_stat"] - a["d_stat"]) <= 1e-6
          and b["na"] == 100 * a["na"] and b["nb"] == 100 * a["nb"])
    check("ks_stat_10x", abs(b["ks_stat"] / a["ks_stat"] - 10.0) < 1e-3,
          f"ratio={b['ks_stat']/a['ks_stat']:.5f}")

    # --- chi2: 100x chi2, invariant Cramér's V ---------------------------
    t1, r1 = timed(WORKLOADS["events_chi2_independence"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_chi2_independence"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"events_chi2_independence: {t1:.2f}s -> {t2:.2f}s  "
          f"chi2 {a['chi2']} -> {b['chi2']}")
    check("chi2_100x", abs(b["chi2"] - 100 * a["chi2"]) <= 1e-3
          and b["n"] == 100 * a["n"] and b["n_cells"] == a["n_cells"],
          f"expected {100*a['chi2']:.4f}")
    check("cramers_v_invariant", abs(b["cramers_v"] - a["cramers_v"]) <= 1e-6)

    # --- MAD: identical median/MAD, outliers exactly 100x ----------------
    t1, r1 = timed(WORKLOADS["lineitem_mad_outliers"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["lineitem_mad_outliers"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"lineitem_mad_outliers: {t1:.2f}s -> {t2:.2f}s  "
          f"med/mad {a['median_cents']}/{a['mad_cents']} -> "
          f"{b['median_cents']}/{b['mad_cents']}")
    check("mad_invariant_100x",
          b["median_cents"] == a["median_cents"]
          and b["mad_cents"] == a["mad_cents"]
          and b["n_rows"] == 100 * a["n_rows"]
          and b["n_outliers"] == 100 * a["n_outliers"])

    # --- Benford: counts exactly 100x, expectation scales ----------------
    t1, r1 = timed(WORKLOADS["orders_benford_digits"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["orders_benford_digits"].fn, spark, x100)
    print(f"orders_benford_digits: {t1:.2f}s -> {t2:.2f}s")
    b1 = {r["digit"]: r for r in r1}
    b2 = {r["digit"]: r for r in r2}
    check("benford_100x",
          set(b1) == set(b2)
          and all(b2[d]["n_obs"] == 100 * b1[d]["n_obs"]
                  and abs(b2[d]["expected"] - 100 * b1[d]["expected"])
                  <= 1e-3 for d in b1))

    # --- k-core: monotone under the 100x edge superset --------------------
    # replica docs permute token ORDER, so co-occurrence pairs change —
    # but every base edge's count only grows, so edges(100x) ⊇ edges(base)
    # and the k-core (monotone under edge addition) can only grow.
    t1, r1 = timed(WORKLOADS["token_kcore_membership"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["token_kcore_membership"].fn, spark, x100)
    print(f"token_kcore_membership: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} -> {len(r2)} core nodes)")
    base_nodes = {r["node"] for r in r1}
    big_nodes = {r["node"] for r in r2}
    check("kcore_monotone_100x", base_nodes <= big_nodes,
          f"missing={sorted(base_nodes - big_nodes)[:5]}")
    check("kcore_converged_and_closed_100x",
          all(r["converged"] for r in r2)
          and all(r["core_degree"] >= 4 for r in r2))

    # --- conversion z-test: rates invariant, z exactly 10x ---------------
    t1, r1 = timed(WORKLOADS["events_conversion_ztest"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_conversion_ztest"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"events_conversion_ztest: {t1:.2f}s -> {t2:.2f}s  "
          f"z {a['z']} -> {b['z']}")
    check("ztest_counts_100x",
          b["na"] == 100 * a["na"] and b["nb"] == 100 * a["nb"]
          and b["conv_a"] == 100 * a["conv_a"]
          and b["conv_b"] == 100 * a["conv_b"])
    check("ztest_z_10x", abs(b["z"] - 10 * a["z"]) <= 1e-4,
          f"expected {10*a['z']:.6f}")

    # --- RRF: formula identity + arm population at 100x -------------------
    # (corpus stats N/df scale, so BM25 scores shift — no bitwise slice
    # invariant exists; the certificate is the fusion identity itself)
    t1, r1 = timed(WORKLOADS["doc_rrf_retrieval"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["doc_rrf_retrieval"].fn, spark, x100)
    print(f"doc_rrf_retrieval: {t1:.2f}s -> {t2:.2f}s")
    check("rrf_fusion_identity_100x", all(
        r["rrf"] == round(
            (1 / (60 + r["rank_bm"]) if r["rank_bm"] is not None else 0)
            + (1 / (60 + r["rank_tf"]) if r["rank_tf"] is not None else 0),
            6)
        for r in r2) and len(r2) == 20)

    # --- EWMA: linear recursion -> exactly 100x ---------------------------
    t1, r1 = timed(WORKLOADS["events_ewma_halflife"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_ewma_halflife"].fn, spark, x100)
    print(f"events_ewma_halflife: {t1:.2f}s -> {t2:.2f}s")
    e1 = {(r["event_type"], r["hr"]): r for r in r1}
    e2 = {(r["event_type"], r["hr"]): r for r in r2}
    check("ewma_100x_linear", set(e1) == set(e2) and all(
        e2[k]["y"] == 100 * e1[k]["y"]
        and abs(e2[k]["ewma"] - 100 * e1[k]["ewma"]) <= 1e-3
        for k in e1))

    # --- quantile normalize: ceil algebra -> bitwise invariant mapping ----
    t1, r1 = timed(WORKLOADS["events_quantile_normalize"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_quantile_normalize"].fn, spark, x100)
    print(f"events_quantile_normalize: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} rows)")
    q1 = {(r["event_type"], r["v"]): (r["cnt"], r["v_norm"]) for r in r1}
    q2 = {(r["event_type"], r["v"]): (r["cnt"], r["v_norm"]) for r in r2}
    check("qnorm_mapping_invariant_100x",
          set(q1) == set(q2)
          and all(q2[k] == (100 * c, vn) for k, (c, vn) in q1.items()),
          "ceil(100r*100N/100n_t) lands in the 100x-scaled range of the "
          "SAME pooled value")

    # --- triples: RELATIVE min-support -> whole rule set invariant --------
    # min_n = max(20, n_docs/25) scales with the corpus, so the 100x
    # run's own threshold (2000) admits exactly the base rules' scaled
    # counts: the FULL rule sets must carry identical rationals.
    t1, r1 = timed(WORKLOADS["token_association_triples"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["token_association_triples"].fn, spark, x100)
    print(f"token_association_triples: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} -> {len(r2)} rows)")
    a1 = {(r["ant_a"], r["ant_b"], r["consequent"]):
          (r["support"], r["confidence"], r["lift"]) for r in r1}
    a2 = {(r["ant_a"], r["ant_b"], r["consequent"]):
          (r["support"], r["confidence"], r["lift"]) for r in r2}
    check("triples_invariant_100x_relative_support", a1 == a2,
          f"{len(a1)} base == {len(a2)} 100x rules (relative threshold)")

    # --- Spearman: affine-invariant under uniform duplication -------------
    # duplicating rows 100x maps every doubled tie-averaged rank through
    # the SAME affine transform (2R' = 100·2R − 99), and Pearson — hence
    # Spearman — is affine-invariant: rho must be identical.
    t1, r1 = timed(WORKLOADS["lineitem_spearman_corr"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["lineitem_spearman_corr"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"lineitem_spearman_corr: {t1:.2f}s -> {t2:.2f}s  "
          f"rho {a['rho']} -> {b['rho']}")
    check("spearman_affine_invariant_100x",
          abs(b["rho"] - a["rho"]) <= 1e-6 and b["n"] == 100 * a["n"])

    # --- FD discovery: verdicts invariant, key cardinalities scale --------
    t1, r1 = timed(WORKLOADS["orders_fd_discovery"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["orders_fd_discovery"].fn, spark, x100)
    print(f"orders_fd_discovery: {t1:.2f}s -> {t2:.2f}s")
    f1 = {(r["lhs"], r["rhs"]): r for r in r1}
    f2 = {(r["lhs"], r["rhs"]): r for r in r2}
    check("fd_verdicts_invariant_100x",
          set(f1) == set(f2)
          and all(f2[k]["holds"] == f1[k]["holds"] for k in f1))
    check("fd_cardinalities_scale_100x", all(
        (f2[k]["n_lhs"] == 100 * f1[k]["n_lhs"]
         if k[0] in ("o_orderkey", "o_custkey")
         else f2[k]["n_lhs"] == f1[k]["n_lhs"])
        for k in f1))

    # --- CUSUM: positive scaling commutes with the clamp ------------------
    t1, r1 = timed(WORKLOADS["events_cusum_drift"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_cusum_drift"].fn, spark, x100)
    print(f"events_cusum_drift: {t1:.2f}s -> {t2:.2f}s")
    c1 = {(r["event_type"], r["hr"]): r for r in r1}
    c2 = {(r["event_type"], r["hr"]): r for r in r2}
    check("cusum_100x_exact", set(c1) == set(c2) and all(
        c2[k]["y"] == 100 * c1[k]["y"]
        and c2[k]["cusum"] == 100 * c1[k]["cusum"]
        and c2[k]["alarm"] == c1[k]["alarm"] for k in c1))

    # --- DBSCAN at 100x: new points, structural certificates --------------
    t1, r1 = timed(WORKLOADS["events_dbscan_clusters"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_dbscan_clusters"].fn, spark, x100)
    print(f"events_dbscan_clusters: {t1:.2f}s -> {t2:.2f}s "
          f"({len(r1)} -> {len(r2)} rows)")
    conv = all(r["converged"] for r in r2)
    by_cl = {}
    for r in r2:
        by_cl.setdefault(r["cluster"], []).append(r)
    # when converged, every cluster label IS the min core member id
    lbl_ok = (not conv) or all(
        cl == min(m["event_id"] for m in ms if m["role"] == "core")
        for cl, ms in by_cl.items())
    check("dbscan_labels_are_min_core_ids_100x", lbl_ok,
          f"converged={conv}, clusters={len(by_cl)}")
    check("dbscan_nonempty_100x", len(r2) > len(r1))

    # --- OHLC streaming twin: stream == batch at 100x ----------------------
    t1, r1 = timed(WORKLOADS["events_ohlc_streaming"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_ohlc_streaming"].fn, spark, x100)
    rb = WORKLOADS["events_ohlc_hourly"].fn(spark, x100).collect()
    print(f"events_ohlc_streaming: {t1:.2f}s -> {t2:.2f}s")
    check("ohlc_stream_equals_batch_100x",
          sorted(map(tuple, r2)) == sorted(map(tuple, rb)))

    print("ALL CERTS OK" if ok_all else "CERT FAILURES — see above")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
