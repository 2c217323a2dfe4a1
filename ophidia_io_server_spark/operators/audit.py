"""Declarative data-quality constraint audit (the Deequ / dbt-tests
family): referential integrity, key uniqueness, completeness, accepted
values, and arbitrary row predicates, each reported as one summary row
``(constraint, n_rows, n_violations, ok)``.

Every check is a single-pass aggregate:

  * ``fk_check`` — LEFT join onto the distinct parent keys +
    ``sum(parent IS NULL)``: one exchange; AQE broadcasts the parent
    side when it is dimension-sized, and the join key is the natural
    shuffle key when both sides are fact-sized (at 100 TB a Bloom
    pre-filter on the child is the standard refinement — see
    ``pipeline/decontaminate.py`` for the building block);
  * ``unique_check`` — violations = rows − distinct keys, two partial
    aggregates in one pass (``count`` + ``count_distinct`` collapse to
    a single map-side-combined exchange);
  * ``not_null_check`` / ``accepted_values_check`` / ``predicate_check``
    — scan-only conditional counts (no exchange beyond the final
    1-row aggregate).

The audit result is the UNION of 1-row aggregates — one action
materializes every check.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _summary(df: DataFrame, violated: F.Column, checked: F.Column | None = None) -> DataFrame:
    base = df if checked is None else df.where(checked)
    return base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(violated, 1).otherwise(0)).cast("bigint").alias("n_violations"),
    ).select(
        F.coalesce("n_rows", F.lit(0)).cast("bigint").alias("n_rows"),
        F.coalesce("n_violations", F.lit(0)).cast("bigint").alias("n_violations"),
    )


def fk_check(child: DataFrame, child_cols: list[str],
             parent: DataFrame, parent_cols: list[str]) -> DataFrame:
    """Referential integrity: child rows (with fully non-null FK) whose
    key has no match in the parent's distinct key set."""
    pk = parent.select(*[F.col(p).alias(c) for c, p in
                         zip(child_cols, parent_cols)]).distinct() \
               .withColumn("_present", F.lit(1))
    nn = reduce(lambda a, b: a & b,
                [F.col(c).isNotNull() for c in child_cols])
    joined = child.where(nn).join(pk, on=child_cols, how="left")
    return _summary(joined, F.col("_present").isNull())


def unique_check(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key uniqueness: violations = rows beyond the first per key."""
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("bigint").alias("n_violations"),
    )


def not_null_check(df: DataFrame, col: str) -> DataFrame:
    return _summary(df, F.col(col).isNull())


def accepted_values_check(df: DataFrame, col: str, values: list) -> DataFrame:
    return _summary(df, ~F.col(col).isin(values) | F.col(col).isNull())


def predicate_check(df: DataFrame, violated: F.Column) -> DataFrame:
    return _summary(df, violated)


def fused_scan_checks(df: DataFrame,
                      violations: dict[str, F.Column] | None = None,
                      unique_keys: dict[str, list[str]] | None = None) -> DataFrame:
    """All scan-only checks over ONE table in ONE aggregate pass —
    predicate/completeness/accepted-values conditions plus key-uniqueness
    counts fuse into a single wide aggregation, so the table is scanned
    once however many checks it carries (at 100 TB, one scan per check
    is the difference between an audit and five).  Returns report rows
    ``(constraint_name, n_rows, n_violations, ok)``; FK checks need a
    join and stay separate (``fk_check`` + ``audit``)."""
    violations = violations or {}
    unique_keys = unique_keys or {}
    if not violations and not unique_keys:
        raise ValueError(
            "fused_scan_checks needs at least one check — empty "
            "violations/unique_keys would build a malformed stack(0) "
            "expression")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    names: list[str] = []
    for name, cond in violations.items():
        aggs.append(F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
                    .cast("bigint").alias(f"_v{len(names)}"))
        names.append(name)
    for name, cols in unique_keys.items():
        aggs.append((F.count(F.lit(1))
                     - F.count_distinct(*[F.col(c) for c in cols]))
                    .cast("bigint").alias(f"_v{len(names)}"))
        names.append(name)
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', _v{i}" for i, n in enumerate(names))
    return (wide.selectExpr(
                "n_rows", f"stack({len(names)}, {stack}) AS (constraint_name, n_violations)")
            .select("constraint_name", "n_rows", "n_violations",
                    (F.col("n_violations") == 0).alias("ok")))


def audit(checks: list[tuple[str, DataFrame]]) -> DataFrame:
    """Stitch named 1-row check summaries into the audit report
    ``(constraint_name, n_rows, n_violations, ok)``."""
    if not checks:
        raise ValueError("audit needs at least one named check")
    parts = [
        s.select(F.lit(name).alias("constraint_name"), "n_rows", "n_violations",
                 (F.col("n_violations") == 0).alias("ok"))
        for name, s in checks
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
