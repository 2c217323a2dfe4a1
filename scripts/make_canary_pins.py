"""Regenerate ophidia_io_server_spark/workloads/canary_pins.py (r11 #5).

Evaluates every canary chain over the fixed grid in BOTH engines and
freezes the observed IEEE-754 bit patterns as hex strings.  Run ONLY in
the environment whose math you want to certify as the reference (this
build container); the committed pins are what the determinism_canary
workload compares against at gate time.

Usage: python scripts/make_canary_pins.py
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# load canary_chains BY FILE PATH: importing it as a package submodule
# would execute the workloads package __init__, which evaluates the canary
# oracle against the current (stale, mid-regeneration) pins file
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "canary_chains",
    Path(__file__).resolve().parent.parent / "ophidia_io_server_spark"
    / "workloads" / "canary_chains.py")
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
CHAINS, N_CELLS = _mod.CHAINS, _mod.N_CELLS


def _hex(x: float) -> str:
    return struct.pack("<d", float(x)).hex()


def main() -> int:
    # vanilla session, NOT the package's get_spark: importing the package
    # evaluates the canary workload's oracle against the CURRENT pins file,
    # which fails by construction while regenerating after a chain change
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .appName("canary-pins")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    exprs = ", ".join(f"{e} AS {n}" for n, e in CHAINS.items())
    spark.range(N_CELLS).toDF("i").createOrReplaceTempView("__canary_grid")
    sdf = (spark.sql(f"SELECT i, {exprs} FROM __canary_grid")
           .toPandas().sort_values("i").reset_index(drop=True))

    con = duckdb.connect()
    odf = con.execute(
        f"SELECT i, {exprs} FROM "
        f"(SELECT CAST(unnest(range(0, {N_CELLS})) AS BIGINT) AS i) "
        "ORDER BY i"
    ).df()

    spark_pins = {n: [_hex(v) for v in sdf[n]] for n in CHAINS}
    duck_pins = {n: [_hex(v) for v in odf[n]] for n in CHAINS}

    agree = {
        n: sum(1 for a, b in zip(spark_pins[n], duck_pins[n]) if a == b)
        for n in CHAINS
    }
    print(f"build-container cross-engine agreement over {N_CELLS} cells:")
    for n, k in agree.items():
        print(f"  {n}: {k}/{N_CELLS} bitwise equal")

    out = Path(__file__).resolve().parent.parent / \
        "ophidia_io_server_spark" / "workloads" / "canary_pins.py"
    lines = [
        '"""Build-time pinned IEEE-754 bit patterns for the determinism',
        "canary (one hex string per (chain, grid cell, engine)).  Generated",
        "by scripts/make_canary_pins.py in the build container — do NOT",
        "regenerate in a gate environment, that would blind the canary.",
        '"""',
        "",
        "# fmt: off",
    ]
    for var, pins in (("SPARK_PINS", spark_pins), ("DUCK_PINS", duck_pins)):
        lines.append(f"{var}: dict[str, list[str]] = {{")
        for n, hx in pins.items():
            lines.append(f"    {n!r}: [")
            for i in range(0, len(hx), 4):
                lines.append("        " + ", ".join(repr(h) for h in hx[i:i + 4]) + ",")
            lines.append("    ],")
        lines.append("}")
        lines.append("")
    lines.append("# fmt: on")
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
