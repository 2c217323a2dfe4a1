"""SemDeDup scale probe: wall time + within-cluster pair volume as the
corpus grows, with k scaled ∝ N (the SemDeDup paper's discipline — the
quadratic Σ|cluster|² term stays bounded only if cluster sizes stay
roughly constant).

Usage: python scripts/semdedup_probe.py
Writes one line per (sf_dir, k): rows, k, pairs_examined, corpus_pairs,
ratio, wall seconds.  Pair volume is measured exactly by counting the
within-cluster candidate join (before the cosine predicate).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ophidia_io_server_spark import get_spark  # noqa: E402
from ophidia_io_server_spark.pipeline.cluster import (  # noqa: E402
    semantic_dedup,
)
from ophidia_io_server_spark.sources.tables import load_table  # noqa: E402


def probe(spark, sf_dir: str, k: int) -> None:
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    t0 = time.time()
    out = semantic_dedup(emb, k=k, iters=3, tau_pct=40).localCheckpoint()
    kept = out.where("kept").count()
    wall = time.time() - t0
    sizes = [r["n"] for r in
             out.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
             .collect()]
    pairs = sum(s * (s - 1) // 2 for s in sizes)
    corpus_pairs = n * (n - 1) // 2
    print(f"{sf_dir} n={n} k={k} kept={kept} pairs={pairs} "
          f"corpus_pairs={corpus_pairs} ratio={pairs / corpus_pairs:.4f} "
          f"max_cluster={max(sizes)} wall={wall:.2f}s", flush=True)


def main() -> None:
    spark = get_spark(app_name="semdedup-probe", cpus=16,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, ks in [
        ("/root/testdata/sf0.01", [10]),
        ("/tmp/ophidia_sf10x", [10, 100]),
        ("/tmp/ophidia_sf100x", [100, 1000]),
    ]:
        if not Path(sf_dir).exists():
            print(f"skip {sf_dir} (absent)", flush=True)
            continue
        for k in ks:
            probe(spark, sf_dir, k)


if __name__ == "__main__":
    main()
