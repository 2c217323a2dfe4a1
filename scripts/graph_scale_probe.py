"""Scale probe for the two iterative graph operators (r6 verdict #7):
per-round wall-time + iteration counts for PageRank and label propagation
on a replica corpus (default: the 100x directory built by make_10x.py).

Usage: python scripts/graph_scale_probe.py [sf_dir]
Prints one JSON line per operator: edge/node counts and per-round seconds.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ophidia_io_server_spark.operators.graph import label_propagation, pagerank
from ophidia_io_server_spark.pipeline.text import cooccurrence_counts
from ophidia_io_server_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ophidia_sf100x"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # PageRank over the event-type transition graph (workload edge shape)
    ev = load_table(spark, sf_dir, "events")
    wdw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(F.col("event_type").alias("src"),
                  F.lead("event_type").over(wdw).alias("dst"))
    pr_edges = (s.where(F.col("dst").isNotNull())
                .groupBy("src", "dst")
                .agg(F.count(F.lit(1)).cast("double").alias("w"))
                .localCheckpoint())
    times: list = []
    ranks = pagerank(pr_edges, iters=12, weight_col="w", exact_fold=True,
                     round_times=times)
    n_nodes = ranks.count()
    print(json.dumps({
        "op": "pagerank", "sf_dir": sf_dir,
        "n_edges": pr_edges.count(), "n_nodes": n_nodes, "iters": len(times),
        "round_sec": [round(t, 3) for t in times],
        "total_sec": round(sum(times), 2),
    }))

    # LPA over the token co-occurrence graph (workload edge shape)
    docs = load_table(spark, sf_dir, "documents")
    lpa_edges = (cooccurrence_counts(docs, window=2)
                 .where(F.col("c12") >= 5)
                 .select(F.col("wa").alias("src"), F.col("wb").alias("dst"),
                         F.col("c12").alias("w"))
                 .localCheckpoint())
    times = []
    labels = label_propagation(lpa_edges, iters=8, weight_col="w",
                               round_times=times)
    n_nodes = labels.count()
    n_comm = labels.select("label").distinct().count()
    print(json.dumps({
        "op": "label_propagation", "sf_dir": sf_dir,
        "n_edges": lpa_edges.count(), "n_nodes": n_nodes,
        "n_communities": n_comm, "iters": len(times),
        "round_sec": [round(t, 3) for t in times],
        "total_sec": round(sum(times), 2),
    }))

    # The workload graphs collapse to the event-type / token vocabulary
    # (constant node count at any SF — the scale cost is the edge
    # aggregation, not the iterations).  For an iterative-scale datapoint
    # whose NODE count grows with the corpus, run both operators on the
    # user↔event_type bipartite graph: at 100x that is ~100k user nodes.
    bip = (ev.groupBy(F.concat(F.lit("u"), F.col("user_id")).alias("src"),
                      F.col("event_type").alias("dst"))
           .agg(F.count(F.lit(1)).cast("double").alias("w"))
           .localCheckpoint())
    times = []
    ranks = pagerank(bip, iters=12, weight_col="w", round_times=times)
    n_nodes = ranks.count()
    print(json.dumps({
        "op": "pagerank_user_bipartite", "sf_dir": sf_dir,
        "n_edges": bip.count(), "n_nodes": n_nodes, "iters": len(times),
        "round_sec": [round(t, 3) for t in times],
        "total_sec": round(sum(times), 2),
    }))
    times = []
    labels = label_propagation(bip, iters=8, weight_col="w",
                               round_times=times)
    print(json.dumps({
        "op": "lpa_user_bipartite", "sf_dir": sf_dir,
        "n_edges": bip.count(), "n_nodes": labels.count(),
        "n_communities": labels.select("label").distinct().count(),
        "iters": len(times),
        "round_sec": [round(t, 3) for t in times],
        "total_sec": round(sum(times), 2),
    }))


if __name__ == "__main__":
    main()
