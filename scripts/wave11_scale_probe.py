"""Wave-11..14 scale certificates: the twenty-four new operators at
sf0.01 vs the 100x key-consistent replica (scripts/make_10x.py; HITS,
contamination, embedding outliers, ABC classes and seasonal anomalies
run at 10x — the replica transforms deliberately change their results,
so their cert is the independent-engine replay, not an invariance).

Wave-14 derivations: discount-OLS moments all scale * 100 (slope/
intercept/R^2 invariant); YoY months are fixed with revenue * 100
(growth invariant); circadian chi2 = (24*SumO^2 - n^2)/n scales
exactly * 100 with the peak hour fixed.

Wave-13 derivations: Nelson-Aalen increments are d/n ratios (H
invariant, variance / 100 exactly); VMR's numerator and denominator
both scale * 1e4 under the count-preserving token permutation (top-20
invariant with counts * 100); cohort-LTV cells are pure integer sums
(everything * 100).

Wave-12 derivations: Cochran-Armitage z recomputed from counts * 100;
decision-stump impurities are count-ratio functions (threshold and
gini invariant, counts * 100); co-purchase replicas NEVER cross (all
keys shift together) so the pair set is 100 disjoint copies with
support / 100 and lift * 100; the token permutation preserves marker
counts so language-ID predictions are per-replica identical
(confusion * 100, P/R/F1/kappa invariant); Markov transition cells and
Cliff's value-level cells scale * 100 with ratio statistics invariant.

Derivations (exact, not tolerances):
  * lineitem_kruskal_wallis — H recomputed in Python from the base
    (flag, qty) counts with every count * 100, mirroring the operator's
    own IEEE expression order.
  * orders_lineitem_mutual_info — every contingency cell scales * 100 so
    every probability ratio is the SAME real number; MI/NMI recomputed
    in Python from the scaled cells in the operator's own fold order.
  * events_logrank_test — the replica offset (k * 10^7) is EVEN, so
    user-parity groups are preserved and every (group, duration) cell
    scales exactly * 100; O1/E1/V/z recomputed from the scaled table.
  * events_crosscorr_leadlag — the DECIMAL moments scale exactly
    (n same, linear sums * 100, quadratic sums * 10^4), so the Pearson
    ratio is the same real number: xcorr must be EQUAL at 6dp per lag,
    n_pairs identical.
  * events_mcnemar_test — b and c scale exactly * 100, so chi2 scales
    exactly * 100; the continuity-corrected statistic is recomputed
    ((|100b-100c|-1)^2 does not scale).
  * doc_zipf_fit — token permutation preserves unigram counts, so every
    frequency scales * 100 and the rank order is identical: slope and
    R^2 are invariant (ln(100c) = ln c + ln 100 shifts every y equally),
    intercept shifts by exactly ln(100) — all checked at 6dp.
  * token_hits_scores (10x) — independent-engine replay: DuckDB runs the
    workload's own oracle on the 10x corpus; rows must match exactly.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402


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
    K = 100

    from ophidia_io_server_spark import get_spark
    from ophidia_io_server_spark.workload import WORKLOADS

    spark = get_spark(app_name="wave11-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ok_all = True

    def check(name, cond, msg=""):
        nonlocal ok_all
        ok_all &= bool(cond)
        print(f"  cert {name}: {'OK' if cond else 'FAIL'} {msg}")

    # --- Kruskal-Wallis: exact recomputation with counts * 100 ----------
    t1, r1 = timed(WORKLOADS["lineitem_kruskal_wallis"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["lineitem_kruskal_wallis"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"lineitem_kruskal_wallis: {t1:.2f}s -> {t2:.2f}s  "
          f"H {a['h_stat']} -> {b['h_stat']}")
    cnts = duckdb.sql(f"""
      SELECT l_returnflag g, CAST(l_quantity AS BIGINT) q, COUNT(*) c
      FROM read_parquet('{sf001}/lineitem.parquet')
      WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A','N','R')
      GROUP BY 1, 2 ORDER BY 2""").fetchall()
    tq: dict = {}
    for _, q, c in cnts:
        tq[q] = tq.get(q, 0) + K * int(c)
    mr2 = {}
    cum = 0
    for q in sorted(tq):
        mr2[q] = 2 * cum + tq[q] + 1
        cum += tq[q]
    ng = {"A": 0, "N": 0, "R": 0}
    r2g = {"A": 0, "N": 0, "R": 0}
    for g, q, c in cnts:
        ng[g] += K * int(c)
        r2g[g] += K * int(c) * mr2[q]
    n = sum(ng.values())
    grp = sum((r2g[g] / 2) * (r2g[g] / 2) / ng[g] for g in ("A", "N", "R"))
    tt = sum(t ** 3 - t for t in tq.values())
    h = (12.0 / (float(n) * float(n + 1)) * grp - 3 * float(n + 1)) \
        / (1 - tt / (float(n) ** 3 - float(n)))
    check("kw_exact_recomputation_100x",
          b["na"] == ng["A"] and b["nn"] == ng["N"] and b["nr"] == ng["R"]
          and abs(b["h_stat"] - h) <= 1e-6, f"expected H={round(h, 6)}")

    # --- mutual information: ratio-invariant under * 100 ----------------
    t1, r1 = timed(WORKLOADS["orders_lineitem_mutual_info"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["orders_lineitem_mutual_info"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"orders_lineitem_mutual_info: {t1:.2f}s -> {t2:.2f}s  "
          f"mi {a['mi_nats']} -> {b['mi_nats']}")
    cells = sorted(duckdb.sql(f"""
      SELECT o.o_orderpriority p, l.l_returnflag r, COUNT(*) c
      FROM read_parquet('{sf001}/orders.parquet') o
      JOIN read_parquet('{sf001}/lineitem.parquet') l
        ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2""").fetchall())
    nn = sum(K * int(c) for _, _, c in cells)
    ni: dict = {}
    nj: dict = {}
    for p, rf, c in cells:
        ni[p] = ni.get(p, 0) + K * int(c)
        nj[rf] = nj.get(rf, 0) + K * int(c)
    mi = 0.0
    for p, rf, c in cells:  # operator's own (p, r)-ordered fold
        c = K * int(c)
        mi += c / nn * math.log(c * nn / (ni[p] * nj[rf]))
    hp = sum(-(v / nn) * math.log(v / nn) for v in
             (ni[p] for p in sorted(ni)))
    hr = sum(-(v / nn) * math.log(v / nn) for v in
             (nj[r] for r in sorted(nj)))
    check("mi_exact_recomputation_100x",
          b["n_pairs"] == nn
          and abs(b["mi_nats"] - mi) <= 1e-6
          and abs(b["nmi"] - mi / math.sqrt(hp * hr)) <= 1e-6
          and abs(b["mi_nats"] - a["mi_nats"]) <= 1e-6,
          f"expected mi={round(mi, 6)}")

    # --- log-rank: parity preserved (even offset), cells * 100 ----------
    t1, r1 = timed(WORKLOADS["events_logrank_test"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_logrank_test"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"events_logrank_test: {t1:.2f}s -> {t2:.2f}s  "
          f"z {a['z_lr']} -> {b['z_lr']}")
    rows = duckdb.sql(f"""
      WITH w AS (SELECT min(ts) + INTERVAL 96 HOUR AS wend
                 FROM read_parquet('{sf001}/events.parquet')),
      e AS (SELECT * FROM read_parquet('{sf001}/events.parquet')
            WHERE ts < (SELECT wend FROM w))
      SELECT user_id % 2,
             (epoch_us(coalesce(
                  min(CASE WHEN event_type='purchase' THEN ts END),
                  max(ts))) - epoch_us(min(ts))) // 3600000000,
             CASE WHEN min(CASE WHEN event_type='purchase' THEN ts END)
                  IS NULL THEN 1 ELSE 0 END
      FROM e GROUP BY user_id""").fetchall()
    tab: dict = {}
    for g, dur, cens in rows:
        t = tab.setdefault(dur, [0, 0, 0, 0])
        t[2 * g + cens] += K
    n0 = sum(d + c for d, c, _, _ in tab.values())
    n1 = sum(d + c for _, _, d, c in tab.values())
    at0, at1 = n0, n1
    o1, e1, v = 0, 0.0, 0.0
    for dur in sorted(tab):
        d0, c0, d1, c1 = tab[dur]
        d, nt = d0 + d1, at0 + at1
        if d > 0:
            o1 += d1
            e1 += float(d) * at1 / nt
            if nt > 1:
                p1 = at1 / nt
                v += d * p1 * (1 - p1) * (nt - d) / (nt - 1)
        at0 -= d0 + c0
        at1 -= d1 + c1
    z = (o1 - e1) / math.sqrt(v)
    check("logrank_exact_recomputation_100x",
          b["n_g0"] == n0 and b["n_g1"] == n1 and b["o1"] == o1
          and abs(b["e1"] - e1) <= 1e-6 and abs(b["z_lr"] - z) <= 1e-6,
          f"expected z={round(z, 6)}")

    # --- cross-correlation: Pearson invariant under * 100 ---------------
    t1, r1 = timed(WORKLOADS["events_crosscorr_leadlag"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_crosscorr_leadlag"].fn, spark, x100)
    am = {r["lag"]: r for r in r1}
    bm = {r["lag"]: r for r in r2}
    print(f"events_crosscorr_leadlag: {t1:.2f}s -> {t2:.2f}s  "
          f"lag0 {am[0]['xcorr']} -> {bm[0]['xcorr']}")
    check("xcorr_invariant_100x",
          all(bm[k]["n_pairs"] == am[k]["n_pairs"]
              and ((bm[k]["xcorr"] is None and am[k]["xcorr"] is None)
                   or abs(bm[k]["xcorr"] - am[k]["xcorr"]) <= 1e-6)
              for k in range(-3, 4)))

    # --- McNemar: b,c * 100 exactly; chi2 * 100; cc recomputed ----------
    t1, r1 = timed(WORKLOADS["events_mcnemar_test"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_mcnemar_test"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"events_mcnemar_test: {t1:.2f}s -> {t2:.2f}s  "
          f"chi2 {a['chi2']} -> {b['chi2']}")
    bb, cc = K * a["b_yes_no"], K * a["c_no_yes"]
    if bb + cc:
        exp_cc = (abs(bb - cc) - 1) ** 2 / (bb + cc)
        check("mcnemar_exact_scaling_100x",
              b["n_users"] == K * a["n_users"]
              and b["b_yes_no"] == bb and b["c_no_yes"] == cc
              and abs(b["chi2"] - K * a["chi2"]) <= 1e-4
              and abs(b["chi2_cc"] - exp_cc) <= 1e-4,
              f"expected cc={round(exp_cc, 6)}")
    else:
        check("mcnemar_exact_scaling_100x",
              b["n_users"] == K * a["n_users"]
              and b["b_yes_no"] == 0 and b["c_no_yes"] == 0
              and b["chi2"] is None and b["chi2_cc"] is None,
              "degenerate b=c=0 path")

    # --- Zipf: slope/R^2 invariant, intercept + ln(100) ------------------
    t1, r1 = timed(WORKLOADS["doc_zipf_fit"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["doc_zipf_fit"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"doc_zipf_fit: {t1:.2f}s -> {t2:.2f}s  "
          f"slope {a['slope']} -> {b['slope']}")
    check("zipf_shift_relations_100x",
          b["n_tokens"] == a["n_tokens"]
          and abs(b["slope"] - a["slope"]) <= 1e-6
          and abs(b["intercept"] - a["intercept"] - math.log(K)) <= 1e-6
          and abs(b["r2"] - a["r2"]) <= 1e-6)

    # ===== wave 12 =======================================================

    # --- Cochran-Armitage: exact recompute with counts * 100 ------------
    t1, r1 = timed(WORKLOADS["orders_trend_test"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["orders_trend_test"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"orders_trend_test: {t1:.2f}s -> {t2:.2f}s  "
          f"z {a['z_trend']} -> {b['z_trend']}")
    gs = duckdb.sql(f"""
      WITH rk AS (SELECT DISTINCT l_orderkey
                  FROM read_parquet('{sf001}/lineitem.parquet')
                  WHERE l_returnflag = 'R')
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) s,
             COUNT(*) n,
             SUM(CASE WHEN rk.l_orderkey IS NOT NULL THEN 1 ELSE 0 END) r
      FROM read_parquet('{sf001}/orders.parquet') o
      LEFT JOIN rk ON rk.l_orderkey = o.o_orderkey
      GROUP BY 1""").fetchall()
    n = sum(K * int(x[1]) for x in gs)
    rr = sum(K * int(x[2]) for x in gs)
    sr = sum(x[0] * K * int(x[2]) for x in gs)
    sn = sum(x[0] * K * int(x[1]) for x in gs)
    snn = sum(x[0] * x[0] * K * int(x[1]) for x in gs)
    z = float(n * sr - rr * sn) / math.sqrt(
        float(rr) * (n - rr)
        * float(n * snn - sn * sn) / n)
    check("trend_exact_recomputation_100x",
          b["n_orders"] == n and b["n_returned"] == rr
          and abs(b["z_trend"] - z) <= 1e-6, f"expected z={round(z, 6)}")

    # --- decision stump: impurities ratio-invariant under * 100 ---------
    t1, r1 = timed(WORKLOADS["lineitem_decision_stump"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["lineitem_decision_stump"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"lineitem_decision_stump: {t1:.2f}s -> {t2:.2f}s  "
          f"t {a['threshold']} -> {b['threshold']}")
    check("stump_invariant_100x",
          b["threshold"] == a["threshold"]
          and b["n_left"] == K * a["n_left"]
          and b["r_left"] == K * a["r_left"]
          and b["n_right"] == K * a["n_right"]
          and b["r_right"] == K * a["r_right"]
          and abs(b["gini_split"] - a["gini_split"]) <= 1e-6
          and abs(b["gain"] - a["gain"]) <= 1e-6)

    # --- co-purchase: replicas never cross — 100 disjoint copies --------
    t1, r1 = timed(WORKLOADS["part_copurchase_pairs"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["part_copurchase_pairs"].fn, spark, x100)
    base = {(r["part_a"], r["part_b"]): r for r in r1}
    rep0 = {(r["part_a"], r["part_b"]): r for r in r2
            if (r["part_a"], r["part_b"]) in base}
    print(f"part_copurchase_pairs: {t1:.2f}s -> {t2:.2f}s  "
          f"{len(r1)} -> {len(r2)} pairs")
    check("copurchase_disjoint_replicas_100x",
          len(r2) == K * len(r1) and len(rep0) == len(base)
          and all(rep0[k]["nab"] == base[k]["nab"]
                  and abs(rep0[k]["support"] - base[k]["support"] / K)
                  <= 1e-6
                  and abs(rep0[k]["lift"] - K * base[k]["lift"]) <= 1e-2
                  for k in base))

    # --- lang confusion/kappa: permutation preserves marker counts ------
    t1, r1 = timed(WORKLOADS["doc_lang_confusion"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["doc_lang_confusion"].fn, spark, x100)
    am = {r["class"]: r for r in r1}
    bm = {r["class"]: r for r in r2}
    print(f"doc_lang_confusion: {t1:.2f}s -> {t2:.2f}s")
    check("confusion_invariant_100x",
          set(am) == set(bm)
          and all(bm[c]["n_true"] == K * am[c]["n_true"]
                  and bm[c]["n_pred"] == K * am[c]["n_pred"]
                  and bm[c]["tp"] == K * am[c]["tp"]
                  and bm[c]["f1"] == am[c]["f1"]
                  for c in am))
    t1, r1 = timed(WORKLOADS["doc_lang_kappa"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["doc_lang_kappa"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"doc_lang_kappa: {t1:.2f}s -> {t2:.2f}s  "
          f"kappa {a['kappa']} -> {b['kappa']}")
    check("kappa_invariant_100x",
          b["n_docs"] == K * a["n_docs"]
          and b["n_agree"] == K * a["n_agree"]
          and abs(b["accuracy"] - a["accuracy"]) <= 1e-6
          and abs(b["kappa"] - a["kappa"]) <= 1e-6)

    # --- Markov entropy: transition cells * 100, entropies invariant ----
    # r13: the hashed row is the exact cell table; entropies read out
    # via analytics.markov_entropy_readout (scale-invariant since every
    # count scales by exactly K)
    from ophidia_io_server_spark.workloads.analytics import (
        markov_entropy_readout,
    )
    t1, r1 = timed(WORKLOADS["events_markov_entropy"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_markov_entropy"].fn, spark, x100)
    cells1 = {(r["a"], r["b"]): r for r in r1}
    cells2 = {(r["a"], r["b"]): r for r in r2}
    hc1, hm1 = markov_entropy_readout(
        [(r["a"], r["b"], r["nab"], r["na"], r["n"]) for r in r1])
    hc2, hm2 = markov_entropy_readout(
        [(r["a"], r["b"], r["nab"], r["na"], r["n"]) for r in r2])
    print(f"events_markov_entropy: {t1:.2f}s -> {t2:.2f}s  "
          f"h_cond {hc1} -> {hc2}")
    check("markov_entropy_invariant_100x",
          set(cells1) == set(cells2)
          and all(cells2[k]["nab"] == K * cells1[k]["nab"]
                  and cells2[k]["na"] == K * cells1[k]["na"]
                  and cells2[k]["n"] == K * cells1[k]["n"]
                  for k in cells1)
          and abs(hc2 - hc1) <= 1e-9
          and abs(hm2 - hm1) <= 1e-9)

    # --- Cliff's delta: gt/lt * 10^4, na*nb * 10^4 — invariant ----------
    t1, r1 = timed(WORKLOADS["events_cliffs_delta"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_cliffs_delta"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"events_cliffs_delta: {t1:.2f}s -> {t2:.2f}s  "
          f"delta {a['cliffs_delta']} -> {b['cliffs_delta']}")
    check("cliffs_delta_invariant_100x",
          b["na"] == K * a["na"] and b["nb"] == K * a["nb"]
          and abs(b["cliffs_delta"] - a["cliffs_delta"]) <= 1e-6)

    # ===== wave 13 =======================================================

    # --- Nelson-Aalen: increments ratio-invariant, var / 100 ------------
    t1, r1 = timed(WORKLOADS["events_nelson_aalen"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_nelson_aalen"].fn, spark, x100)
    am = {r["dur_h"]: r for r in r1}
    bm = {r["dur_h"]: r for r in r2}
    print(f"events_nelson_aalen: {t1:.2f}s -> {t2:.2f}s  {len(r1)} rows")
    check("nelson_aalen_invariant_100x",
          set(am) == set(bm)
          and all(bm[t]["n_risk"] == K * am[t]["n_risk"]
                  and bm[t]["d"] == K * am[t]["d"]
                  and bm[t]["c"] == K * am[t]["c"]
                  and abs(bm[t]["cum_hazard"] - am[t]["cum_hazard"])
                  <= 1e-6
                  and abs(bm[t]["hazard_var"]
                          - am[t]["hazard_var"] / K) <= 1e-6
                  for t in am))

    # --- dispersion: VMR invariant (numerator and denominator * 1e4) ----
    t1, r1 = timed(WORKLOADS["token_dispersion_index"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["token_dispersion_index"].fn, spark, x100)
    print(f"token_dispersion_index: {t1:.2f}s -> {t2:.2f}s")
    am = {r["token"]: r for r in r1}
    bm = {r["token"]: r for r in r2}
    check("dispersion_invariant_100x",
          set(am) == set(bm)
          and all(bm[t]["total_count"] == K * am[t]["total_count"]
                  and bm[t]["n_docs_with"] == K * am[t]["n_docs_with"]
                  and abs(bm[t]["vmr"] - am[t]["vmr"]) <= 1e-6
                  for t in am))

    # --- cohort LTV: every cell * 100 exactly ---------------------------
    t1, r1 = timed(WORKLOADS["orders_cohort_ltv"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["orders_cohort_ltv"].fn, spark, x100)
    am = {(r["cohort"], r["age_months"]): r for r in r1}
    bm = {(r["cohort"], r["age_months"]): r for r in r2}
    print(f"orders_cohort_ltv: {t1:.2f}s -> {t2:.2f}s  "
          f"{len(r1)} -> {len(r2)} cells")
    check("cohort_ltv_exact_scaling_100x",
          set(am) == set(bm)
          and all(bm[k]["n_customers"] == K * am[k]["n_customers"]
                  and bm[k]["n_active"] == K * am[k]["n_active"]
                  and bm[k]["revenue_cents"] == K * am[k]["revenue_cents"]
                  and bm[k]["cum_revenue_cents"]
                  == K * am[k]["cum_revenue_cents"]
                  for k in am))

    # ===== wave 14 =======================================================

    # --- discount elasticity: all moments * 100 — OLS invariant ---------
    t1, r1 = timed(WORKLOADS["lineitem_discount_elasticity"].fn,
                   spark, sf001)
    t2, r2 = timed(WORKLOADS["lineitem_discount_elasticity"].fn,
                   spark, x100)
    a, b = r1[0], r2[0]
    print(f"lineitem_discount_elasticity: {t1:.2f}s -> {t2:.2f}s  "
          f"slope {a['slope']} -> {b['slope']}")
    check("elasticity_invariant_100x",
          b["n_rows"] == K * a["n_rows"]
          and abs(b["slope"] - a["slope"]) <= 1e-6
          and abs(b["intercept"] - a["intercept"]) <= 1e-6
          and abs(b["r2"] - a["r2"]) <= 1e-6)

    # --- YoY growth: months fixed, revenue * 100, growth invariant ------
    t1, r1 = timed(WORKLOADS["orders_yoy_growth"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["orders_yoy_growth"].fn, spark, x100)
    am = {r["month_idx"]: r for r in r1}
    bm = {r["month_idx"]: r for r in r2}
    print(f"orders_yoy_growth: {t1:.2f}s -> {t2:.2f}s  {len(r1)} months")
    check("yoy_exact_scaling_100x",
          set(am) == set(bm)
          and all(bm[k]["revenue_cents"] == K * am[k]["revenue_cents"]
                  and bm[k]["n_orders"] == K * am[k]["n_orders"]
                  and ((bm[k]["yoy_growth"] is None
                        and am[k]["yoy_growth"] is None)
                       or abs(bm[k]["yoy_growth"] - am[k]["yoy_growth"])
                       <= 1e-6)
                  for k in am))

    # --- circadian: chi2 scales exactly * 100, peak fixed ---------------
    t1, r1 = timed(WORKLOADS["events_circadian_uniformity"].fn,
                   spark, sf001)
    t2, r2 = timed(WORKLOADS["events_circadian_uniformity"].fn,
                   spark, x100)
    am = {r["event_type"]: r for r in r1}
    bm = {r["event_type"]: r for r in r2}
    print(f"events_circadian_uniformity: {t1:.2f}s -> {t2:.2f}s")
    check("circadian_exact_scaling_100x",
          set(am) == set(bm)
          and all(bm[e]["n"] == K * am[e]["n"]
                  and bm[e]["peak_hour"] == am[e]["peak_hour"]
                  and bm[e]["peak_n"] == K * am[e]["peak_n"]
                  and abs(bm[e]["chi2_uniform"]
                          - K * am[e]["chi2_uniform"]) <= 1e-2
                  for e in am))

    # ===== wave 15 =======================================================

    # --- keyness: G2 terms scale * 100 (ratios invariant) ----------------
    t1, r1 = timed(WORKLOADS["token_keyness_loglr"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["token_keyness_loglr"].fn, spark, x100)
    am = {r["token"]: r for r in r1}
    bm = {r["token"]: r for r in r2}
    print(f"token_keyness_loglr: {t1:.2f}s -> {t2:.2f}s")
    check("keyness_exact_scaling_100x",
          set(am) == set(bm)
          and all(bm[t]["count_target"] == K * am[t]["count_target"]
                  and bm[t]["count_reference"]
                  == K * am[t]["count_reference"]
                  and bm[t]["keyness_sign"] == am[t]["keyness_sign"]
                  and abs(bm[t]["g2"] - K * am[t]["g2"]) <= 1e-2
                  for t in am))

    # --- windowed funnel: per-user outcomes identical per replica -------
    t1, r1 = timed(WORKLOADS["events_funnel_windowed"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["events_funnel_windowed"].fn, spark, x100)
    a, b = r1[0], r2[0]
    print(f"events_funnel_windowed: {t1:.2f}s -> {t2:.2f}s  "
          f"{a['n_purchase_24h']} -> {b['n_purchase_24h']}")
    check("funnel_windowed_exact_scaling_100x",
          b["n_users"] == K * a["n_users"]
          and b["n_view"] == K * a["n_view"]
          and b["n_click_24h"] == K * a["n_click_24h"]
          and b["n_purchase_24h"] == K * a["n_purchase_24h"]
          and abs(b["view_to_click"] - a["view_to_click"]) <= 1e-6
          and abs(b["click_to_purchase"] - a["click_to_purchase"])
          <= 1e-6)

    # --- reorder fit: gap cells * 100, lambda and KS invariant ----------
    t1, r1 = timed(WORKLOADS["orders_reorder_exponential"].fn,
                   spark, sf001)
    t2, r2 = timed(WORKLOADS["orders_reorder_exponential"].fn,
                   spark, x100)
    a, b = r1[0], r2[0]
    print(f"orders_reorder_exponential: {t1:.2f}s -> {t2:.2f}s  "
          f"ks {a['ks_stat']} -> {b['ks_stat']}")
    check("reorder_exponential_invariant_100x",
          b["n_gaps"] == K * a["n_gaps"]
          and abs(b["lambda_per_day"] - a["lambda_per_day"]) <= 1e-6
          and abs(b["ks_stat"] - a["ks_stat"]) <= 1e-6)

    # --- ABC + seasonal anomalies at 10x: engine replay ------------------
    # (ABC's interleaved replica ties and the anomaly row's rounded-
    # residual folds change the exact values at scale, so the cert is
    # both engines agreeing on the scaled corpus)
    con3 = duckdb.connect()
    for tname in ("lineitem", "events"):
        con3.execute(f"CREATE VIEW {tname} AS SELECT * FROM "
                     f"read_parquet('{x10}/{tname}.parquet')")
    for wname in ("part_abc_classification", "events_seasonal_anomalies"):
        t1, r1 = timed(WORKLOADS[wname].fn, spark, sf001)
        t2, r2 = timed(WORKLOADS[wname].fn, spark, x10)
        want = sorted(map(tuple, con3.execute(
            WORKLOADS[wname].oracle).fetchall()))
        got = sorted(tuple(r[c] for c in r.asDict()) for r in r2)
        print(f"{wname}: {t1:.2f}s -> {t2:.2f}s (10x, {len(got)} rows)")
        check(f"{wname}_duckdb_replay_10x",
              len(got) == len(want)
              and all(g[:-1] == w[:-1]
                      and (g[-1] == w[-1]
                           or (isinstance(g[-1], float)
                               and abs(g[-1] - w[-1]) <= 1e-6))
                      for g, w in zip(got, want)))

    # --- contamination + embedding outliers at 10x: engine replay -------
    # (the replica transforms — token permutation, coordinate nudge —
    # deliberately change these results, so the cert is both engines
    # agreeing on the CHANGED corpus, not an invariance)
    con2 = duckdb.connect()
    for tname in ("documents", "embeddings"):
        con2.execute(f"CREATE VIEW {tname} AS SELECT * FROM "
                     f"read_parquet('{x10}/{tname}.parquet')")
    for wname in ("doc_ngram_contamination", "embedding_outlier_topk"):
        t1, r1 = timed(WORKLOADS[wname].fn, spark, sf001)
        t2, r2 = timed(WORKLOADS[wname].fn, spark, x10)
        want = sorted(map(tuple, con2.execute(
            WORKLOADS[wname].oracle).fetchall()))
        got = sorted(tuple(r[c] for c in r.asDict()) for r in r2)
        print(f"{wname}: {t1:.2f}s -> {t2:.2f}s (10x, {len(got)} rows)")
        check(f"{wname}_duckdb_replay_10x", got == want)

    # --- HITS at 10x: independent-engine replay --------------------------
    t1, r1 = timed(WORKLOADS["token_hits_scores"].fn, spark, sf001)
    t2, r2 = timed(WORKLOADS["token_hits_scores"].fn, spark, x10)
    print(f"token_hits_scores: {t1:.2f}s -> {t2:.2f}s (10x)")
    con = duckdb.connect()
    for tname in ("documents",):
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM "
                    f"read_parquet('{x10}/{tname}.parquet')")
    want = con.execute(WORKLOADS["token_hits_scores"].oracle).fetchall()
    got = sorted((r["token"], r["auth"], r["hub"], r["rnk"]) for r in r2)
    check("hits_duckdb_replay_10x",
          got == sorted(tuple(w) for w in want),
          f"{len(got)} rows")

    print("ALL CERTS OK" if ok_all else "SOME CERTS FAILED")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
