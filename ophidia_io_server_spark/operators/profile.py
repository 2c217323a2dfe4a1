"""Table profiling — the data-quality report an engine owes its users
before they trust a table: per-column cardinalities and null rates, plus
numeric summary statistics.

One pass over the table computes every column's aggregates in a single
wide aggregation (Catalyst evaluates them all in one partial+final
cycle — no per-column scans), then the wide row unpivots to one row per
column driver-free (a stack/explode projection, not a collect).

Cross-engine determinism contract (the gate hash needs it): counts are
exact BIGINTs; numeric min/max are exact; means go through exact
integer-scaled sums when the data is fixed-decimal, else ROUND(avg, 6) —
the one surface where last-ulp summation order could differ, covered by
the rounding like every other cross-row double mean in the suite.
String min/max are byte-order comparisons in both engines (ASCII data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame, mean_decimals: int | None = None) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_num, max_num, mean_num)
    — one row per column; the *_num columns are NULL for non-numeric
    columns.  Exact distinct counts (this is a profiling report, not a
    sketch — the HLL variant is the `sketch_approx_stats` surface).

    ``mean_decimals``: when the numeric columns are fixed-decimal (money,
    2-dp measurements), pass the decimal count and means are computed from
    exact integer-scaled sums — shuffle-order-free, hash-gate-safe.  With
    None, means are ``ROUND(avg, 6)`` (last-ulp summation drift possible
    right at a rounding boundary — fine for human reports, not for a
    value-hash gate)."""
    num_cols = {f.name for f in df.schema.fields
                if isinstance(f.dataType, NumericType)}
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in df.columns:
        # coalesce: SUM over an EMPTY table is NULL, not 0 — the report
        # promises exact BIGINT counts even for empty inputs
        aggs.append(F.coalesce(F.sum(F.col(c).isNull().cast("int")), F.lit(0))
                    .cast("bigint").alias(f"{c}__nn"))
        aggs.append(F.countDistinct(F.col(c)).cast("bigint")
                    .alias(f"{c}__nd"))
        if c in num_cols:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"{c}__mn"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"{c}__mx"))
            if mean_decimals is not None:
                scale = 10 ** mean_decimals
                aggs.append(F.round(
                    F.sum(F.round(F.col(c) * scale).cast("bigint"))
                    / F.lit(scale) / F.count(F.col(c)), 6).alias(f"{c}__av"))
            else:
                aggs.append(F.round(F.avg(F.col(c)), 6).alias(f"{c}__av"))
    wide = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nn").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__mn") if c in num_cols else null_d).alias("min_num"),
            (F.col(f"{c}__mx") if c in num_cols else null_d).alias("max_num"),
            (F.col(f"{c}__av") if c in num_cols else null_d).alias("mean_num"),
        )
        for c in df.columns
    ]
    return (
        wide.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.*")
    )


def pearson_matrix(df: DataFrame, int_cols: list[str]) -> DataFrame:
    """Exact-sum Pearson correlation matrix over INTEGER-VALUED columns:
    one fused scan aggregates n plus Σx, Σx², Σxy for every column/pair
    as DECIMAL(38,0) (exact — no float accumulation-order drift), then
    the d·(d−1)/2 upper-triangle rows unpivot driver-free and each
    correlation is ONE double expression over the exact sums:

        corr = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))

    Cross-engine determinism: the decimal sums are exact integers, the
    final cast-to-double + IEEE ops are identical given identical inputs,
    and the result is rounded to 6.  Budget: every decimal term must fit
    38 digits — n·Σxy ≤ n²·max² needs n·max ≤ 10^19, i.e. 10^10 rows of
    10^9-scaled values; raise grid coarseness past that.  Rows with a
    NULL in ANY column are excluded (pairwise-complete would make n
    differ per pair and the matrix non-PSD).

    At 100 TB: one partial-aggregatable scan emitting d·(d+3)/2+1
    numbers — no shuffle beyond the single-row aggregate, no Python.
    """
    if len(int_cols) < 2:
        raise ValueError(f"pearson_matrix needs >= 2 columns, got {int_cols}")
    dec = "decimal(38,0)"
    base = df.where(F.expr(" AND ".join(
        f"`{c}` IS NOT NULL" for c in int_cols)))
    aggs = [F.count(F.lit(1)).cast(dec).alias("_n")]
    for i, c in enumerate(int_cols):
        x = F.col(c).cast("bigint")
        aggs.append(F.sum(x.cast(dec)).alias(f"_s{i}"))
        aggs.append(F.sum((x * x).cast(dec)).alias(f"_q{i}"))
    pairs = [(i, j) for i in range(len(int_cols))
             for j in range(i + 1, len(int_cols))]
    for i, j in pairs:
        xy = (F.col(int_cols[i]).cast("bigint")
              * F.col(int_cols[j]).cast("bigint"))
        aggs.append(F.sum(xy.cast(dec)).alias(f"_p{i}_{j}"))
    wide = base.agg(*aggs)

    n = F.col("_n")
    rows = []
    for i, j in pairs:
        num = (n * F.col(f"_p{i}_{j}") - F.col(f"_s{i}") * F.col(f"_s{j}")) \
            .cast("double")
        deni = (n * F.col(f"_q{i}") - F.col(f"_s{i}") * F.col(f"_s{i}")) \
            .cast("double")
        denj = (n * F.col(f"_q{j}") - F.col(f"_s{j}") * F.col(f"_s{j}")) \
            .cast("double")
        rows.append(F.struct(
            F.lit(int_cols[i]).alias("col_a"),
            F.lit(int_cols[j]).alias("col_b"),
            n.cast("bigint").alias("n"),
            F.round(num / (F.sqrt(deni) * F.sqrt(denj)), 6).alias("corr"),
        ))
    return (wide.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.col_a", "r.col_b", "r.n", "r.corr"))


def fd_discovery(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact functional-dependency discovery over the ordered pairs of
    ``cols`` (the single-attribute core of Metanome/TANE-style data
    profiling): ``A → B`` holds iff ``count_distinct(A) ==
    count_distinct(A, B)`` — every A value maps to exactly one B value.
    Violations (= distinct (A,B) pairs minus distinct A values) quantify
    HOW broken a failed dependency is, which is what a schema auditor
    acts on.

    Scale shape: ONE aggregate computes every count-distinct (Spark
    plans multi-distinct aggregates via a single Expand — one scan, one
    exchange, no per-pair re-scan); the d·(d−1) result rows unpivot
    driver-free from the one-row aggregate, exactly like
    ``pearson_matrix``.  NULL counts as a value (SQL count-distinct
    semantics would drop all-NULL tuples; profiling must see them), so
    every column rides through a sentinel-free ``struct`` — distinct
    over structs treats NULL fields as values in both engines."""
    if len(cols) < 2:
        raise ValueError(f"fd_discovery needs >= 2 columns, got {cols}")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.count_distinct(F.struct(c)).cast("bigint")
                    .alias(f"_d{i}"))
    pairs = [(i, j) for i in range(len(cols)) for j in range(len(cols))
             if i != j]
    for i, j in pairs:
        aggs.append(F.count_distinct(F.struct(cols[i], cols[j]))
                    .cast("bigint").alias(f"_d{i}_{j}"))
    wide = df.agg(*aggs)
    rows = []
    for i, j in pairs:
        rows.append(F.struct(
            F.lit(cols[i]).alias("lhs"), F.lit(cols[j]).alias("rhs"),
            F.col(f"_d{i}").alias("n_lhs"),
            F.col(f"_d{i}_{j}").alias("n_pairs"),
            (F.col(f"_d{i}_{j}") == F.col(f"_d{i}")).alias("holds"),
            (F.col(f"_d{i}_{j}") - F.col(f"_d{i}")).alias("violations"),
        ))
    return (wide.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.lhs", "r.rhs", "r.n_lhs", "r.n_pairs", "r.holds",
                    "r.violations"))
