"""Local mirror of the driver's correctness gate: run every workload's Spark
query AND its DuckDB oracle at a given scale factor, compare row count, schema
(column names) and values (column-name-sorted, row-sorted).

Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))


def _norm_cell(v):
    if isinstance(v, np.ndarray) and v.ndim == 0:
        return _norm_cell(v.item())
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "timestamp"):  # datetime-like
        return str(v)
    if isinstance(v, float):
        return v
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm_cell)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(str)).reset_index(drop=True)


def _cells_equal(a, b, tol=1e-9) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y, tol) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
    return a == b


def compare(name: str, spark_df, oracle_df) -> list[str]:
    problems = []
    s, o = _normalize(spark_df), _normalize(oracle_df)
    if list(s.columns) != list(o.columns):
        problems.append(f"schema mismatch: spark={list(s.columns)} oracle={list(o.columns)}")
        return problems
    if len(s) != len(o):
        problems.append(f"row count mismatch: spark={len(s)} oracle={len(o)}")
        return problems
    exact = True
    for c in s.columns:
        for i, (a, b) in enumerate(zip(s[c], o[c])):
            if not _cells_equal(a, b, tol=0.0):
                exact = False
                if not _cells_equal(a, b, tol=1e-9):
                    problems.append(f"value mismatch col={c} row={i}: {a!r} vs {b!r}")
                    if len(problems) > 5:
                        return problems
    if not problems and not exact:
        problems.append("WARNING: equal only within 1e-9 tolerance (driver hash may differ!)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from ophidia_io_server_spark import get_spark
    from ophidia_io_server_spark.workload import WORKLOADS

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_skip = 0
    for name, w in WORKLOADS.items():
        if only and name not in only:
            continue
        try:
            sdf = w.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if w.oracle is None:
            print(f"SKIP {name}: no oracle (rows-only check), rows={len(sdf)}")
            n_skip += 1
            continue
        try:
            odf = con.execute(w.oracle).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
