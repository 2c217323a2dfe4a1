"""PassJoin vocabulary-scale probe (r8 verdict #8): the 100x corpus probe
replicated documents with the VOCABULARY unchanged, so the pair set was
invariant — a weak probe for an operator whose cost is O(n_vocab · tau^2).
This one scales the vocabulary itself: N distinct generated names, tau=2,
and reports probe volume, verified-candidate count, output pairs, and wall
time, so the O(n·tau^2) claim has measured datapoints.

Usage: python scripts/passjoin_vocab_probe.py [sizes ...]   (default 10000 100000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]

    from pyspark.sql import functions as F

    from ophidia_io_server_spark import get_spark
    from ophidia_io_server_spark.pipeline.strsim import (
        edit_distance_self_join,
    )

    spark = get_spark(app_name="passjoin-vocab-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        # deterministic vocabulary: base-26 words of length 8-12 from a
        # LCG so neighbors at distance <= 2 exist but are sparse
        ids = spark.range(n)
        word = F.concat(*[
            F.chr(F.lit(97) + F.pmod(F.xxhash64(F.col("id"), F.lit(i)),
                                     F.lit(26)).cast("int"))
            for i in range(8)
        ])
        # length variety: append 0-4 extra chars by id bucket
        extra = F.substring(F.lit("abcde"), 1, (F.col("id") % 5).cast("int"))
        vocab = ids.select(F.concat(word, extra).alias("name")).distinct()
        vocab = vocab.localCheckpoint()
        nv = vocab.count()

        # warm-up then timed
        edit_distance_self_join(vocab, "name", 2).count()
        t0 = time.perf_counter()
        pairs = edit_distance_self_join(vocab, "name", 2)
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0

        print(json.dumps({
            "vocab": nv, "tau": 2, "pairs": n_pairs,
            "wall_sec": round(wall, 2),
            "wall_per_100k_vocab": round(wall * 100_000 / nv, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
