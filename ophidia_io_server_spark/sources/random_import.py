"""random_import source: deterministic synthetic fragments
(≙ reference ``oph_io_server_nc.c:3035-3243``, algorithms
``default``/``temperatures`` at :3059-3075).

Built on ``spark.range`` so generation is fully distributed — every executor
synthesizes only its own id range, no driver-side data.  The value function is
a pure-integer LCG expressed in Column math (not Spark's ``rand()``), so the
exact same values are reproducible from ANSI SQL in any engine — that is what
lets the DuckDB oracle hash-match this source bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# LCG parameters (glibc-style multiplier/increment, 2^31 modulus): values in
# [0,1) with exactly 31 bits of mantissa → every derived double is exact.
# Known artifact: WITHIN one row the k-sequence is an arithmetic progression
# (+C per element) — near-constant arrays whose mean == median exactly.
# Fine for correctness oracles (the point is exact reproducibility); rows
# differ strongly from each other (id*A mod 2^31 disperses).
_A = 1103515245
_C = 12345
_M = 2147483648  # 2^31


def lcg_value(id_col, k_col, seed: int):
    """Deterministic uniform [0,1): ((id*A + (k+1)*C + seed) mod 2^31) / 2^31."""
    h = (id_col * _A + (k_col + 1) * _C + F.lit(seed)) % _M
    return h / F.lit(float(_M))


def mixed_value(id_col, k_col, seed: int):
    """Deterministic uniform [0,1) WITHOUT the within-row progression of
    lcg_value: one extra multiply-mod round mixes k into the high bits
    (h2 = (h*A + C) mod 2^31), so consecutive elements decorrelate.  Still
    pure integer Column math → bit-exact in ANSI SQL."""
    h = (id_col * _A + (k_col + 1) * _C + F.lit(seed)) % _M
    h2 = (h * _A + _C) % _M
    return h2 / F.lit(float(_M))


def random_fragment(
    spark: SparkSession,
    nrows: int,
    array_len: int,
    algorithm: str = "default",
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Fragment (id_dim 1..nrows, measure double[array_len])."""
    rng = spark.range(1, nrows + 1, numPartitions=partitions)
    idc = F.col("id").cast("long")
    ks = F.sequence(F.lit(0), F.lit(array_len - 1))
    if algorithm == "temperatures":
        # plausible temperature field in K: 250 + 60*u  (exact double math)
        value = lambda k: F.lit(250.0) + F.lit(60.0) * lcg_value(idc, k, seed)
    elif algorithm == "default":
        value = lambda k: lcg_value(idc, k, seed)
    elif algorithm == "mixed":
        value = lambda k: mixed_value(idc, k, seed)
    else:
        raise ValueError(f"random_import: unknown algorithm {algorithm!r}")
    return rng.select(
        idc.alias("id_dim"),
        F.transform(ks, value).alias("measure"),
    )


def random_fragment_oracle_sql(nrows: int, array_len: int, algorithm: str = "default",
                               seed: int = 42) -> str:
    """DuckDB SQL producing the identical fragment (for the correctness gate)."""
    base = (
        f"((id_dim * {_A} + (k + 1) * {_C} + {seed}) % {_M}) / {_M}.0"
    )
    if algorithm == "temperatures":
        base = f"250.0 + 60.0 * ({base})"
    elif algorithm == "mixed":
        base = (
            f"((((id_dim * {_A} + (k + 1) * {_C} + {seed}) % {_M}) * {_A} + {_C})"
            f" % {_M}) / {_M}.0"
        )
    return f"""
        SELECT id_dim,
               list_transform(range(0, {array_len}), k -> {base}) AS measure
        FROM (SELECT unnest(range(1, {nrows + 1})) AS id_dim)
    """
