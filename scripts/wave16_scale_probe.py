"""Wave-16 scale certificates: the five r11 operators at sf0.01 vs the
key-consistent 10x/100x replicas (scripts/make_10x.py).  Each is an
EXACT derivation from the replication semantics, not a tolerance:

* doc_score_auc (100x) — AUC is P(s+ > s-) + P(s+ = s-)/2, a population
  probability, provably INVARIANT under uniform k-fold duplication;
  n_pos/n_neg scale exactly k.
* doc_length_calibration (100x) — every bin count/moment scales k, so
  mean_pred/frac_pos/ece are bitwise invariant (their k's cancel in the
  exact integer numerators and denominators).
* doc_novelty_curve (10x) — replicas are token-PERMUTED with doc_id
  shifted ABOVE every base id, so a base gram's min-doc_id attribution
  can never move: the 10x rows restricted to base doc_ids must equal
  the sf0.01 rows exactly.
* events_dau_wau_stickiness (100x) — replicas shift user_id at the SAME
  ts, so each day's active set is k disjoint shifted copies: dau/wau
  scale exactly k, stickiness is bitwise invariant.
* events_value_psi (100x) — the span midpoint and the cents grid are
  replica-invariant and every count scales k, so the decile-edge
  inequality 10·cum ≥ j·n1 is k-invariant (k cancels) and the bin
  counts scale exactly k; the LAPLACE +1 does NOT scale, so psi_term/
  psi_total are recomputed exactly in Python from the k-scaled integer
  counts and compared bitwise.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OFF = 10_000_000


def timed(fn, *a):
    df = fn(*a)
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    rows = fn(*a).collect()
    return time.perf_counter() - t0, rows


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    x100 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ophidia_sf100x"
    x10 = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ophidia_sf10x"

    from ophidia_io_server_spark import get_spark
    from ophidia_io_server_spark.workload import WORKLOADS

    spark = get_spark(app_name="wave16-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ok_all = True

    def check(name, cond, detail=""):
        nonlocal ok_all
        ok_all &= bool(cond)
        print(f"{'PASS' if cond else 'FAIL'} {name} {detail}", flush=True)

    k100, k10 = 100, 10

    # --- doc_score_auc: AUC invariant, counts scale k -----------------------
    tb, rb = timed(WORKLOADS["doc_score_auc"].fn, spark, base_dir)
    ts_, rs = timed(WORKLOADS["doc_score_auc"].fn, spark, x100)
    b, s = rb[0], rs[0]
    check("doc_score_auc@100x",
          s["n_pos"] == k100 * b["n_pos"]
          and s["n_neg"] == k100 * b["n_neg"]
          and s["auc"] == b["auc"],
          f"base {tb:.2f}s -> 100x {ts_:.2f}s auc={s['auc']}")

    # --- doc_length_calibration: all ratios bitwise invariant ---------------
    tb, rb = timed(WORKLOADS["doc_length_calibration"].fn, spark, base_dir)
    ts_, rs = timed(WORKLOADS["doc_length_calibration"].fn, spark, x100)
    mb = {r["bin"]: r for r in rb}
    ms = {r["bin"]: r for r in rs}
    ok = set(mb) == set(ms) and all(
        ms[k]["n"] == k100 * mb[k]["n"]
        and ms[k]["n_pos"] == k100 * mb[k]["n_pos"]
        and ms[k]["mean_pred"] == mb[k]["mean_pred"]
        and ms[k]["frac_pos"] == mb[k]["frac_pos"]
        and ms[k]["ece"] == mb[k]["ece"] for k in mb)
    check("doc_length_calibration@100x", ok,
          f"base {tb:.2f}s -> 100x {ts_:.2f}s bins={len(ms)}")

    # --- doc_novelty_curve: base rows immutable under 10x -------------------
    tb, rb = timed(WORKLOADS["doc_novelty_curve"].fn, spark, base_dir)
    ts_, rs = timed(WORKLOADS["doc_novelty_curve"].fn, spark, x10)
    mb = {r["doc_id"]: (r["n_grams"], r["n_novel"]) for r in rb}
    ms = {r["doc_id"]: (r["n_grams"], r["n_novel"]) for r in rs
          if r["doc_id"] < OFF}
    check("doc_novelty_curve@10x", mb == ms,
          f"base {tb:.2f}s ({len(rb)} rows) -> 10x {ts_:.2f}s "
          f"({len(rs)} rows)")

    # --- events_dau_wau_stickiness: counts scale k, ratio invariant ---------
    tb, rb = timed(WORKLOADS["events_dau_wau_stickiness"].fn, spark, base_dir)
    ts_, rs = timed(WORKLOADS["events_dau_wau_stickiness"].fn, spark, x100)
    mb = {r["day"]: r for r in rb}
    ms = {r["day"]: r for r in rs}
    ok = set(mb) == set(ms) and all(
        ms[d]["dau"] == k100 * mb[d]["dau"]
        and ms[d]["wau"] == k100 * mb[d]["wau"]
        and ms[d]["stickiness"] == mb[d]["stickiness"] for d in mb)
    check("events_dau_wau_stickiness@100x", ok,
          f"base {tb:.2f}s -> 100x {ts_:.2f}s days={len(ms)}")

    # --- events_value_psi: k-scaled exact recompute --------------------------
    tb, rb = timed(WORKLOADS["events_value_psi"].fn, spark, base_dir)
    ts_, rs = timed(WORKLOADS["events_value_psi"].fn, spark, x100)
    mb = {r["bin"]: r for r in rb}
    ms = {r["bin"]: r for r in rs}
    na = sum(r["n_first"] for r in rb) * k100
    nb = sum(r["n_second"] for r in rb) * k100
    # r13: the hashed row is the exact bin table; the ln() readout is
    # analytics.psi_readout — recompute it at the k-scaled counts and
    # compare against the readout of the 100x row (the Laplace +1 does
    # not scale, so the expected terms are recomputed, not scaled)
    from ophidia_io_server_spark.workloads.analytics import psi_readout
    terms = {}
    for j in mb:
        p1 = (k100 * mb[j]["n_first"] + 1) / (na + 10)
        p2 = (k100 * mb[j]["n_second"] + 1) / (nb + 10)
        terms[j] = (p1 - p2) * math.log(p1 / p2)
    total = sum(terms[j] for j in sorted(terms))
    got_terms, got_total = psi_readout(
        [(r["bin"], r["n_first"], r["n_second"]) for r in rs],
        na, nb)
    ok = set(mb) == set(ms) and all(
        ms[j]["n_first"] == k100 * mb[j]["n_first"]
        and ms[j]["n_second"] == k100 * mb[j]["n_second"]
        and ms[j]["na"] == na and ms[j]["nb"] == nb
        and got_terms[j] == terms[j] for j in mb) and got_total == total
    check("events_value_psi@100x", ok,
          f"base {tb:.2f}s -> 100x {ts_:.2f}s psi={total}")

    print("ALL PASS" if ok_all else "FAILURES", flush=True)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()


# Wave 16b replay certificates (run separately; recorded in PERF.md):
#   python scripts/check_correctness.py /tmp/ophidia_sf10x \
#       doc_rbo_retrieval embedding_silhouette_topk doc_score_auc \
#       doc_length_calibration doc_novelty_curve \
#       events_dau_wau_stickiness events_value_psi
# — the independent-engine replay (DuckDB runs each workload's own
# oracle against the 10x replica; Spark rows must hash-match exactly).
# The embeddings replicas carry a deterministic per-replica coordinate
# nudge and documents are token-permuted, so neither RBO nor silhouette
# has a closed-form k-scaling — the dual-engine replay at 10x is the
# certificate (the doc_weighted_sample precedent from r10).
