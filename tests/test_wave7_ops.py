"""Wave-7 operator guards: plan shapes (distributed rank for RFM, single
fused scan for OLS, no cartesian in the token-keyed joins) + independent
Python/numpy differentials for the statistics (Kendall tau-b, Kaplan-Meier,
the OLS solve)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from ophidia_io_server_spark.workload import WORKLOADS

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = WORKLOADS[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"))


def test_rfm_uses_distributed_rank_not_global_window(spark):
    """Quintile scores must come from the two-phase range-partition rank:
    a bare Window.orderBy/ntile would be a single-task sort over every
    customer at 100 TB."""
    import re

    p = _plan(spark, "orders_rfm_segments")
    assert "ntile" not in p
    # the two-phase rank pins (localCheckpoint) after its per-partition
    # window, so the consumer plan reads the pinned RDD; any window that
    # DOES appear must be keyed on the range-partition id
    assert "Scan ExistingRDD" in p
    for m in re.finditer(r"windowspecdefinition\((\w+)#", p):
        assert m.group(1) == "_pid", m.group(0)


def test_ols_single_fused_scan(spark):
    """The ten moment sums must ride ONE aggregate over ONE lineitem scan
    (partial+final) — a per-sum scan would be 10x the IO."""
    p = _plan(spark, "lineitem_ols_regression")
    assert p.count("FileScan parquet") == 1
    assert "SinglePartition" in p  # the single-row final aggregate only


def test_divergence_and_linkpred_no_cartesian(spark):
    for name in ("source_divergence_matrix", "token_link_prediction"):
        p = _plan(spark, name)
        assert "CartesianProduct" not in p, name


def test_kendall_tau_matches_bruteforce(spark):
    out = WORKLOADS["events_kendall_tau"].fn(spark, SF).collect()
    assert len(out) == 1
    r = out[0].asDict()
    con = duckdb.connect()
    s = con.execute(f"""
        SELECT date_trunc('hour', ts) AS hr,
               SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS x,
               SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS y
        FROM '{SF}/events.parquet'
        WHERE event_type IN ('click','view') GROUP BY 1
        HAVING x > 0 AND y > 0 ORDER BY hr""").fetchall()
    n = len(s)
    nc = nd = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = s[i][1] - s[j][1]
            dy = s[i][2] - s[j][2]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
    assert (r["n"], r["nc"], r["nd"], r["ties_x"], r["ties_y"]) == \
        (n, nc, nd, tx, ty)
    n0 = n * (n - 1) // 2
    tau = (nc - nd) / math.sqrt((n0 - tx) * (n0 - ty))
    assert r["tau_b"] == pytest.approx(tau, abs=1e-6)


def test_kaplan_meier_matches_python(spark):
    out = {r["dur_h"]: r.asDict()
           for r in WORKLOADS["events_kaplan_meier"].fn(spark, SF).collect()}
    con = duckdb.connect()
    subj = con.execute(f"""
        WITH w AS (SELECT min(ts) + INTERVAL 96 HOUR AS wend
                   FROM '{SF}/events.parquet'),
        e AS (SELECT * FROM '{SF}/events.parquet'
              WHERE ts < (SELECT wend FROM w)),
        pu AS (SELECT user_id, min(ts) AS t0, max(ts) AS tl,
                      min(CASE WHEN event_type='purchase' THEN ts END) AS tp
               FROM e GROUP BY 1)
        SELECT (epoch_us(coalesce(tp, tl)) - epoch_us(t0)) // 3600000000,
               CASE WHEN tp IS NULL THEN 1 ELSE 0 END
        FROM pu""").fetchall()
    durs = sorted({d for d, _ in subj})
    surv = 1.0
    seen = set()
    for t in durs:
        n_risk = sum(1 for d, _ in subj if d >= t)
        d_t = sum(1 for d, c in subj if d == t and c == 0)
        c_t = sum(1 for d, c in subj if d == t and c == 1)
        if d_t == 0:
            continue
        surv *= 1.0 - d_t / n_risk
        seen.add(t)
        row = out[t]
        assert (row["n_risk"], row["d"], row["c"]) == (n_risk, d_t, c_t), t
        assert row["survival"] == pytest.approx(surv, abs=1e-6), t
    assert set(out) == seen  # exactly the event times, nothing else


def test_ols_matches_numpy_lstsq(spark):
    r = WORKLOADS["lineitem_ols_regression"].fn(spark, SF).collect()[0]
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT CAST(l_quantity AS BIGINT),
               CAST(ROUND(l_discount * 100) AS BIGINT),
               CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        FROM '{SF}/lineitem.parquet'
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_extendedprice IS NOT NULL""").fetchall()
    a = np.array(rows, dtype=np.float64)
    X = np.column_stack([np.ones(len(a)), a[:, 0], a[:, 1]])
    y = a[:, 2]
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    r2 = 1.0 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert r["n_rows"] == len(a)
    # closed-form Cramer vs numpy QR agree to float noise, not bitwise
    assert r["beta0"] == pytest.approx(beta[0], rel=1e-6, abs=1e-4)
    assert r["beta1"] == pytest.approx(beta[1], rel=1e-6, abs=1e-4)
    assert r["beta2"] == pytest.approx(beta[2], rel=1e-6, abs=1e-4)
    assert r["r2"] == pytest.approx(r2, abs=1e-6)


def test_link_prediction_scores_consistent(spark):
    """Every output pair must be NON-adjacent, have cn >= 1, and satisfy
    the exact RA identity sum(1e12 // deg_z) over its common neighbors."""
    rows = WORKLOADS["token_link_prediction"].fn(spark, SF).collect()
    from ophidia_io_server_spark.pipeline.text import cooccurrence_counts
    from ophidia_io_server_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    e = (cooccurrence_counts(docs, window=2)
         .where((F.col("c12") >= 5) & (F.col("wa") != F.col("wb"))))
    edges = {(r["wa"], r["wb"]) for r in e.collect()}
    nbr: dict[str, set] = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    for r in rows:
        a, b = r["node_a"], r["node_b"]
        assert (a, b) not in edges and (b, a) not in edges
        common = nbr[a] & nbr[b]
        assert r["cn"] == len(common) >= 1
        assert r["deg_a"] == len(nbr[a]) and r["deg_b"] == len(nbr[b])
        assert r["ra_scaled"] == sum(10 ** 12 // len(nbr[z]) for z in common)
