"""Driver-shaped full-gate double run (r10 verdict #4).

Runs the entire 50-row gate window (GATE_ORDER, the driver's exact row
set and order) TWICE back-to-back inside ONE SparkSession at sf0.01 —
the configuration in which the r10 driver flake appeared — and
cell-diffs every row's normalized output between the two passes.  This
covers the session-HISTORY axis the per-workload sweeps cannot: 48 rows
of staged corpora, cached fragments, streaming drains and DDL run
before `analytics_suite` in pass 1, and the whole gate's state again
before pass 2.

Usage: python scripts/gate_double_run.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.check_correctness import _cells_equal, _normalize  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from ophidia_io_server_spark import get_spark
    from ophidia_io_server_spark.workload import ordered_workloads
    from ophidia_io_server_spark.workloads.suites import GATE_ORDER

    WORKLOADS = ordered_workloads()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    passes: list[dict[str, object]] = []
    for p in range(2):
        frames: dict[str, object] = {}
        t0 = time.time()
        for name in GATE_ORDER:
            frames[name] = _normalize(
                WORKLOADS[name].fn(spark, sf_dir).toPandas())
        print(f"pass {p}: {len(frames)} rows collected "
              f"({time.time() - t0:.0f}s)", flush=True)
        passes.append(frames)

    rc = 0
    for name in GATE_ORDER:
        a, b = passes[0][name], passes[1][name]
        if list(a.columns) != list(b.columns) or len(a) != len(b):
            print(f"DRIFT {name}: shape {a.shape} vs {b.shape}", flush=True)
            rc = 1
            continue
        bad = 0
        arm = a["op"] if "op" in a.columns else None
        for col in a.columns:
            x, y = a[col], b[col]
            for i in range(len(a)):
                if not _cells_equal(x.iat[i], y.iat[i]):
                    bad += 1
                    rc = 1
                    who = f" arm={arm.iat[i]}" if arm is not None else ""
                    if bad <= 10:
                        print(f"DRIFT {name}{who} col={col} row={i}: "
                              f"{x.iat[i]!r} vs {y.iat[i]!r}", flush=True)
        print(f"{name}: {'STABLE' if not bad else f'{bad} drifting cells'}"
              f" ({len(a)} rows)", flush=True)
    print("RESULT:", "INTER-PASS DRIFT" if rc else
          "ALL 50 ROWS STABLE ACROSS BOTH PASSES", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
