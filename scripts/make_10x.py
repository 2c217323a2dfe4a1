"""Build a key-consistent 10x replica of a testdata scale-factor directory
(default: sf0.01 -> a sf0.1-equivalent corpus) for the full-gate scale
mirror (PERF.md r6).

Replication rules (replica k = 0..9, offset = k * 10_000_000):
- region/nation: single copy (fixed-PK dimensions; replicating would break
  PK uniqueness, and FK columns in the fact replicas stay valid).
- customer/supplier/part/orders/lineitem: all TPC-H keys shift together
  (custkey, suppkey, partkey, orderkey) so every join edge lands inside
  the same replica -- revenue/count aggregates scale exactly 10x.
- events: event_id/user_id shift (10x users, same time span).
- documents: doc_id shifts; replicas k>0 get a seeded pseudo-random token
  permutation so unigram statistics are preserved but shingles are NOT --
  without it every doc becomes a 10-replica near-dup clique and the
  near-dup corpus degenerates into the quadratic adversarial regime (that
  regime is measured separately in PERF.md r5).
- embeddings: vec_id shifts; one coordinate gets a +k*1e-3 deterministic
  nudge so replicas are not bit-identical (no cosine ties to break).

Usage: python scripts/make_10x.py [src_sf_dir] [dst_dir] [k]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np

OFF = 10_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ophidia_sf10x"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def rd(t):
        return f"read_parquet('{src}/{t}.parquet')"

    def wr(sql, t):
        con.execute(f"COPY ({sql}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    for t in ("region", "nation"):
        wr(f"SELECT * FROM {rd(t)}", t)

    shifts = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    for t, keys in shifts.items():
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM {rd(t)}").fetchall()]
        sel = ", ".join(
            f"{c} + r.k * {OFF} AS {c}" if c in keys else c for c in cols)
        wr(f"SELECT {sel} FROM {rd(t)} CROSS JOIN (SELECT unnest(range({k})) AS k) r", t)

    # documents: pandas side for the seeded per-replica token permutation
    import pandas as pd

    docs = con.execute(f"SELECT * FROM {rd('documents')}").df()
    out = []
    for rep in range(k):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + rep * OFF
        if rep > 0:
            d["text"] = [
                None if t is None else
                " ".join(np.random.default_rng((rep << 20) ^ i).permutation(
                    [w for w in t.split(" ") if w]))
                for i, t in zip(d["doc_id"], d["text"])
            ]
        out.append(d)
    alld = pd.concat(out, ignore_index=True)
    con.register("docs10", alld)
    wr("SELECT * FROM docs10", "documents")

    emb = con.execute(f"SELECT * FROM {rd('embeddings')}").df()
    dims = len(emb["embedding"].iloc[0])
    eout = []
    for rep in range(k):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + rep * OFF
        if rep > 0:
            e["embedding"] = [
                [float(v) + (rep * 1e-3 if j == int(vid) % dims else 0.0)
                 for j, v in enumerate(vec)]
                for vid, vec in zip(e["vec_id"], e["embedding"])
            ]
        eout.append(e)
    alle = pd.concat(eout, ignore_index=True)
    con.register("emb10", alle)
    # pandas round-trips the vectors as double; the source stores FLOAT[] —
    # keep the type identical so Spark/DuckDB kernels see the same widths
    wr("SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, label "
       "FROM emb10", "embeddings")


if __name__ == "__main__":
    main()
