"""Wave-7 cross-scale certificates (sf0.01 vs the 100x key-consistent
replica): each an EXACT derivation from the replication rules, sharper
than the oracle replay the mirror already provides.

- events_kendall_tau: replicas land at the SAME timestamps, so the hourly
  (x, y) series scales by exactly 100 per hour; every pairwise comparison
  (<, >, =) is invariant under a positive uniform scaling, so nc/nd/ties/n
  are IDENTICAL and tau_b (an IEEE expression of those identical ints) is
  bitwise identical.
- events_kaplan_meier: each user replicates with its event times, so per
  duration d/c/n_risk scale exactly x100; each factor (100d)/(100n) is the
  SAME rational as d/n and IEEE division is correctly rounded, so every
  factor — and the folded survival — is bitwise identical.
- lineitem_ols_regression: all ten moment sums scale exactly x100; Cramer's
  dets are cubic forms, so numerator and denominator both scale by 100^3
  and the betas / R^2 are scale-invariant as reals.  The cast-to-double of
  the scaled sums can round differently in the last ulp (sums > 2^53), so
  the certificate asserts equality AFTER the operator's own ROUND(6).
- orders_rfm_segments: the quintile boundaries move (n' = 100n), so
  per-customer scores are NOT invariant; the exact claim is the score
  HISTOGRAM recomputed in Python from the base value multiset with the
  floor-division thresholds at n' = 100n (replicas of a value-tie group
  occupy a contiguous rank block of 100x its base width).
- source_divergence_matrix: replicas permute tokens WITHIN docs, so every
  per-source unigram count scales exactly x100: TV distance and cosine are
  invariant (same distributions), n_a/n_b x100, n_common identical.
- token_link_prediction: the count>=5 edge set at 100x is a SUPERSET of
  the base edge set (every count scales x100); on this template corpus the
  graph saturates to a clique and the non-adjacent pair set empties — the
  oracle replay covers the output; here we certify the edge monotonicity.

Usage: python scripts/wave7_scale_probe.py [base_sf_dir] [x100_dir]
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OFF = 10_000_000


def rows(df):
    return [r.asDict() for r in df.collect()]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    x100 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ophidia_sf100x"

    from ophidia_io_server_spark import get_spark
    from ophidia_io_server_spark.workload import WORKLOADS

    spark = get_spark(app_name="wave7-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ok_all = True

    def check(name, ok, detail=""):
        nonlocal ok_all
        ok_all &= ok
        print(f"{'OK  ' if ok else 'FAIL'} {name} {detail}")

    # -- kendall: full row identical -------------------------------------
    kb = rows(WORKLOADS["events_kendall_tau"].fn(spark, base))[0]
    kx = rows(WORKLOADS["events_kendall_tau"].fn(spark, x100))[0]
    check("kendall_tau row bitwise-invariant", kb == kx, f"{kb} vs {kx}")

    # -- kaplan-meier: counts x100, survival bitwise ----------------------
    mb = {r["dur_h"]: r for r in
          rows(WORKLOADS["events_kaplan_meier"].fn(spark, base))}
    mx = {r["dur_h"]: r for r in
          rows(WORKLOADS["events_kaplan_meier"].fn(spark, x100))}
    ok = set(mb) == set(mx) and all(
        mx[t]["d"] == 100 * mb[t]["d"]
        and mx[t]["c"] == 100 * mb[t]["c"]
        and mx[t]["n_risk"] == 100 * mb[t]["n_risk"]
        and mx[t]["survival"] == mb[t]["survival"]
        for t in mb)
    check("kaplan_meier counts x100 + survival bitwise", ok,
          f"{len(mb)} event times")

    # -- ols: n x100, betas/r2 equal after the operator's ROUND(6) --------
    ob = rows(WORKLOADS["lineitem_ols_regression"].fn(spark, base))[0]
    ox = rows(WORKLOADS["lineitem_ols_regression"].fn(spark, x100))[0]
    ok = (ox["n_rows"] == 100 * ob["n_rows"]
          and all(ox[k] == ob[k] for k in ("beta0", "beta1", "beta2", "r2")))
    check("ols betas/r2 scale-invariant (round-6)", ok, f"{ob} vs {ox}")

    # -- divergence: n x100, tv/cosine invariant, vocab identical ---------
    db = {(r["src_a"], r["src_b"]): r for r in
          rows(WORKLOADS["source_divergence_matrix"].fn(spark, base))}
    dx = {(r["src_a"], r["src_b"]): r for r in
          rows(WORKLOADS["source_divergence_matrix"].fn(spark, x100))}
    ok = set(db) == set(dx) and all(
        dx[k]["n_a"] == 100 * db[k]["n_a"]
        and dx[k]["n_b"] == 100 * db[k]["n_b"]
        and dx[k]["n_common"] == db[k]["n_common"]
        and dx[k]["tv_dist"] == db[k]["tv_dist"]
        and dx[k]["cosine"] == db[k]["cosine"]
        for k in db)
    check("divergence tv/cosine invariant under x100", ok,
          f"{len(db)} pairs")

    # -- rfm: score histogram == python floor recompute -------------------
    con = duckdb.connect()
    cust = con.execute(f"""
        WITH mx AS (SELECT max(o_orderdate) AS mo
                    FROM '{base}/orders.parquet'),
        c AS (SELECT o_custkey,
                     CAST((epoch_us((SELECT mo FROM mx))
                           - epoch_us(max(o_orderdate))) // 86400000000
                          AS BIGINT) AS r,
                     CAST(COUNT(*) AS BIGINT) AS f,
                     CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                          AS BIGINT) AS m
              FROM '{base}/orders.parquet' GROUP BY 1)
        SELECT o_custkey, r, f, m FROM c""").fetchall()
    n100 = 100 * len(cust)

    def expected_hist(vals_keyed, reverse_score):
        # scaled ranks: sort by (value, custkey) where replica custkeys are
        # base + k*OFF, k = 0..99 -> within a value group, replicas of ALL
        # its base members stay grouped by k then custkey; the group's rank
        # block is contiguous with width 100*|group| regardless of order.
        hist = Counter()
        by_val = Counter()
        for _, v in vals_keyed:
            by_val[v] += 1
        start = 0  # ranks are 1-based; block of value v: [start+1, start+w]
        for v in sorted(by_val):
            w = 100 * by_val[v]
            for r in range(start + 1, start + w + 1):
                q = (r - 1) * 5 // n100
                hist[5 - q if reverse_score else 1 + q] += 1
            start += w
        return hist

    rfm_x = rows(WORKLOADS["orders_rfm_segments"].fn(spark, x100))
    ok = len(rfm_x) == n100
    for col, key, rev in (("r_score", 1, True), ("f_score", 2, False),
                          ("m_score", 3, False)):
        got = Counter(r[col] for r in rfm_x)
        exp = expected_hist([(c[0], c[key]) for c in cust], rev)
        ok &= got == exp
    check("rfm score histograms == floor recompute at n'=100n", ok,
          f"{n100} customers")

    # -- link prediction: 100x edge set is a superset of base -------------
    from ophidia_io_server_spark.pipeline.text import cooccurrence_counts
    from ophidia_io_server_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    def edge_set(sf):
        docs = load_table(spark, sf, "documents")
        e = (cooccurrence_counts(docs, window=2)
             .where((F.col("c12") >= 5) & (F.col("wa") != F.col("wb"))))
        return {(r["wa"], r["wb"]) for r in e.collect()}

    eb, ex = edge_set(base), edge_set(x100)
    check("linkpred edge set monotone under x100", eb <= ex,
          f"{len(eb)} -> {len(ex)} edges (clique saturation expected)")

    print("ALL OK" if ok_all else "FAILURES", flush=True)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
