"""Scale probe for the r8 second-session operators (skyline, PassJoin
fuzzy join, gap-fill interpolation, constraint audit) at sf0.01 and the
100x replica (scripts/make_10x.py output, default /tmp/ophidia_sf100x).

Beyond timing, each op carries a scale CERTIFICATE:
  * orders_pareto_frontier — soundness: no returned point is dominated
    by ANY row of the full table (broadcast |S|xN dominance probe; the
    sf0.01 DuckDB oracle + the hypothesis differential bind exactness);
  * part_fuzzy_name_pairs — the distinct-name vocabulary is invariant
    under replication, so the 100x pair set must equal sf0.01's;
  * events_gapfill_interpolate — replica users get shifted ids, so the
    user_id < 50 slice is invariant: 100x output == sf0.01 output;
  * orders_constraint_audit — keys shift per replica: FK/accepted/
    positive checks stay ok=True and the lineitem duplicate count
    scales exactly 100x.

Usage: python scripts/newops_scale_probe.py [sf001_dir] [x100_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def timed(fn, *a):
    df = fn(*a)
    df.write.format("noop").mode("overwrite").save()  # warm (JIT + cache)
    t0 = time.perf_counter()
    rows = fn(*a).collect()
    return time.perf_counter() - t0, rows


def main() -> None:
    sf001 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    x100 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ophidia_sf100x"
    from ophidia_io_server_spark import get_spark
    from ophidia_io_server_spark.sources.tables import load_table
    from ophidia_io_server_spark.workload import WORKLOADS

    spark = get_spark(app_name="newops-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    names = ["orders_pareto_frontier", "part_fuzzy_name_pairs",
             "events_gapfill_interpolate", "orders_constraint_audit"]
    results: dict[str, dict[str, list]] = {}
    for sf_dir in (sf001, x100):
        tag = sf_dir.rsplit("/", 1)[-1]
        for name in names:
            dt, rows = timed(WORKLOADS[name].fn, spark, sf_dir)
            results.setdefault(name, {})[tag] = (dt, rows)
            print(f"{tag} {name}: {dt:.2f}s rows={len(rows)}")

    t001, t100 = sf001.rsplit("/", 1)[-1], x100.rsplit("/", 1)[-1]

    # certificate 1: skyline EXACTNESS vs the FULL 100x table, without the
    # O(n²) literal oracle (which is DuckDB-feasible only at gate scale):
    # soundness — no returned point is dominated by ANY row; completeness —
    # every non-returned row is dominated by SOME returned point.  Together
    # these imply the returned set IS the skyline (a non-returned,
    # non-dominated row would contradict completeness; a dominated returned
    # row contradicts soundness).  Both probes are broadcast |S|×N scans.
    sky = results["orders_pareto_frontier"][t100][1]
    o = load_table(spark, x100, "orders")
    pts = spark.createDataFrame(
        [(r["o_totalprice"], r["o_orderdate"]) for r in sky],
        "px double, dx timestamp_ntz")
    dominated = (
        o.crossJoin(F.broadcast(pts))
        .where((F.col("o_totalprice") >= F.col("px"))
               & (F.col("o_orderdate") <= F.col("dx"))
               & ((F.col("o_totalprice") > F.col("px"))
                  | (F.col("o_orderdate") < F.col("dx"))))
        .count())
    covered = (
        o.crossJoin(F.broadcast(pts))
        .where((F.col("px") >= F.col("o_totalprice"))
               & (F.col("dx") <= F.col("o_orderdate"))
               & ((F.col("px") > F.col("o_totalprice"))
                  | (F.col("dx") < F.col("o_orderdate"))))
        .select("o_orderkey").distinct().count())
    total = o.count()
    ok = dominated == 0 and covered + len(sky) == total
    print(f"CERT skyline_exactness_100x: dominated_returned={dominated} "
          f"covered={covered}+returned={len(sky)} of {total} ok={ok}")

    # certificate 2: PassJoin pair set invariant under replication
    p001 = sorted(tuple(r) for r in results["part_fuzzy_name_pairs"][t001][1])
    p100 = sorted(tuple(r) for r in results["part_fuzzy_name_pairs"][t100][1])
    eq = [(a[0], a[1], a[2]) for a in p001] == [(a[0], a[1], a[2]) for a in p100]
    print(f"CERT passjoin_vocab_invariance: pairs {len(p001)} vs {len(p100)} ok={eq}")

    # certificate 3: gap-fill slice invariance (user_id < 50 untouched by replicas)
    g001 = sorted(tuple(r) for r in results["events_gapfill_interpolate"][t001][1])
    g100 = sorted(tuple(r) for r in results["events_gapfill_interpolate"][t100][1])
    print(f"CERT gapfill_slice_invariance: ok={g001 == g100}")

    # certificate 4: audit — ok flags hold, lineitem dup count scales 100x
    a001 = {r["constraint_name"]: r for r in results["orders_constraint_audit"][t001][1]}
    a100 = {r["constraint_name"]: r for r in results["orders_constraint_audit"][t100][1]}
    always_ok = [k for k in a001 if k != "unique_lineitem_orderkey_linenumber"]
    flags = all(a100[k]["ok"] for k in always_ok)
    dup_scale = (a100["unique_lineitem_orderkey_linenumber"]["n_violations"]
                 == 100 * a001["unique_lineitem_orderkey_linenumber"]["n_violations"])
    print(f"CERT audit_flags_100x: ok={flags} dup_count_scales_100x={dup_scale}")

    # ---- second wave: scd2, triangles, entity resolution, multi-touch ----
    names2 = ["events_scd2_intervals", "token_triangle_counts",
              "part_name_entity_resolution", "events_multitouch_attribution"]
    for sf_dir in (sf001, x100):
        tag = sf_dir.rsplit("/", 1)[-1]
        for name in names2:
            dt, rows = timed(WORKLOADS[name].fn, spark, sf_dir)
            results.setdefault(name, {})[tag] = (dt, rows)
            print(f"{tag} {name}: {dt:.2f}s rows={len(rows)}")

    # certificate 5: replica users are disjoint id ranges, so the scd2 and
    # multi-touch outputs restricted to base users equal sf0.01 exactly,
    # and total row counts scale exactly 100x
    for name in ("events_scd2_intervals", "events_multitouch_attribution"):
        base = sorted(tuple(r) for r in results[name][t001][1])
        big = results[name][t100][1]
        big_base = sorted(tuple(r) for r in big if r["user_id"] < 10_000_000)
        print(f"CERT {name}_100x: base_slice_equal={base == big_base} "
              f"count_scales_100x={len(big) == 100 * len(base)}")

    # certificate 6: entity resolution — vocabulary invariant, counts x100
    er001 = {r["name"]: r for r in results["part_name_entity_resolution"][t001][1]}
    er100 = {r["name"]: r for r in results["part_name_entity_resolution"][t100][1]}
    er_ok = (set(er001) == set(er100)
             and all(er100[k]["cluster_id"] == er001[k]["cluster_id"]
                     and er100[k]["canonical"] == er001[k]["canonical"]
                     and er100[k]["cluster_size"] == er001[k]["cluster_size"]
                     and er100[k]["n"] == 100 * er001[k]["n"] for k in er001))
    print(f"CERT entity_resolution_100x: vocab_invariant_counts_scale={er_ok}")

    # certificate 7: triangles — exactness at 100x vs the literal
    # lexicographic triple join run IN SPARK on the same edge list
    from ophidia_io_server_spark.pipeline.text import cooccurrence_counts
    docs = load_table(spark, x100, "documents")
    e = (cooccurrence_counts(docs, window=2)
         .where((F.col("c12") >= 5) & (F.col("wa") != F.col("wb")))
         .select(F.col("wa").alias("u"), F.col("wb").alias("v")))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (e1.join(e2, (F.col("e2.u") == F.col("e1.u"))
                   & (F.col("e2.v") > F.col("e1.v")))
           .join(e3, (F.col("e3.u") == F.col("e1.v"))
                 & (F.col("e3.v") == F.col("e2.v"))))
    lit = (tri.select(F.col("e1.u").alias("node"))
           .unionAll(tri.select(F.col("e1.v").alias("node")))
           .unionAll(tri.select(F.col("e2.v").alias("node")))
           .groupBy("node").count())
    want = {r["node"]: r["count"] for r in lit.collect()}
    got = {r["node"]: r["n_triangles"]
           for r in results["token_triangle_counts"][t100][1]}
    tri_ok = all(got.get(k, 0) == v for k, v in want.items()) and \
        all(v == want.get(k, 0) for k, v in got.items())
    print(f"CERT triangles_100x_exact_vs_literal_join: ok={tri_ok}")


if __name__ == "__main__":
    main()
