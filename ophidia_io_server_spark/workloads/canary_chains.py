"""Determinism-canary chain definitions (r11 verdict #5).

Each chain is ONE SQL expression string valid verbatim in BOTH Spark SQL
and DuckDB (double literals written in `e` notation — `1.0` parses as
DECIMAL in Spark SQL and would silently change the arithmetic).  The
canary workload evaluates every chain over the fixed integer grid
i = 0..N_CELLS-1 and compares the bits against values PINNED at build
time (``canary_pins.py``, regenerated only by
``scripts/make_canary_pins.py``): if the gate environment's JVM math
(Spark) or libm (DuckDB) produces different last-ulp results than this
container did at build time, the per-chain drift counters move and the
gate row reds — naming the mechanism (transcendental-library drift, the
prime suspect for the 2-rounds-red analytics composite) at zero data
cost.

Chain choice: measured in this container (r12 probe), Spark-vs-DuckDB
already disagree by 1 ulp on ~10% of exp cells, ~10% of pow cells and
~1-5% of log10/ln-ratio cells over a 4k grid, while sqrt and plain
division are bitwise identical (IEEE-exact operations).  The pins are
therefore PER-ENGINE: each engine is compared against its own build-time
bits, and only the match COUNTS are cross-compared by the gate hash.
`c_div` is the control — IEEE division is exactly specified, so drift
there means the environment broke something far worse than libm ulps.
"""

from __future__ import annotations

N_CELLS = 128

# name -> SQL expression over BIGINT column `i` (0..N_CELLS-1)
CHAINS: dict[str, str] = {
    # pure ln over a (1, 10] grid
    "c_ln": "ln(1e0 + i * 9e0 / 127e0)",
    # pure exp over [-3, 3]
    "c_exp": "exp(-3e0 + i * 6e0 / 127e0)",
    # pow with fractional exponent (library-dependent in both engines)
    "c_pow": "pow(1e0 + i / 127e0, 25e-1)",
    # decimal log over a wide range
    "c_log10": "log10(1e0 + i * 37e0)",
    # a composed ln/exp/sqrt chain shaped like the analytics arms'
    # statistics (entropy terms, PSI terms, z-scores)
    "c_mix": "ln(2e0 + sqrt(i + 25e-2)) / (1e0 + exp(0e0 - i / 11e0))",
    # r12b: the trig surface the gsl arms hash through
    # (oph_gsl_complex_to_polar/get_arg -> atan2; fft kernels -> sin/cos)
    "c_atan2": "atan2(1e0 + i / 127e0, 2e0 - i / 255e0)",
    "c_sin": "sin(i * 3e0 / 127e0)",
    "c_cos": "cos(i * 5e0 / 127e0)",
    # exact-by-construction control: IEEE division of small integers
    "c_div": "(i + 1e0) / 7e0",
}
