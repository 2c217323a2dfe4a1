"""Temporal joins Spark lacks as built-ins: as-of join and interval join.

Both are implemented as *merge/bucket* compositions of shuffle-safe
primitives — no BroadcastNestedLoopJoin, no per-key cartesian blowup —
because at 100 TB the naive formulations are the classic scale killers:

- **as-of join** (``p.ts >= c.ts`` + "latest wins") written as a range
  join explodes to O(|left|·|right|) rows per key before the window
  prunes; the union-merge here is the textbook sort-merge as-of — tag the
  two sides, union them, one shuffle on the key, and a running
  ``last(..., ignoreNulls)`` carry-forward per partition.  Cost: one
  exchange + one sort, rows = |left| + |right|, never their product.
- **interval join** (point-in-interval) written as an inequality join is
  a BNLJ in Spark; the binned variant here turns it into a plain shuffled
  equi-join on (key, time-bucket): intervals replicate once per covered
  bucket (bounded by interval length / bin width), points land in exactly
  one bucket, and a cheap residual predicate finishes the exact match.

Reference scope note: the reference engine (ophidia-io-server) has no
temporal-join statement — its WHERE grammar is scalar comparisons only
(`/root/reference/src/query_engine/oph_query_expression_parser.y`).  These
operators extend the engine the way a training-data / event-analytics user
needs (attribution, outage windows, feature as-of lookups) while staying
inside the same DataFrame-first execution model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _keys(on) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    seq_col: str | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_sec: float | None = None,
    prefix: str = "r_",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the nearest right row per key:
    ``direction="backward"`` → the latest right row with
    ``r.ts <= l.ts`` (the pandas ``merge_asof`` default), ``"forward"`` →
    the earliest with ``r.ts >= l.ts``, ``"nearest"`` → whichever of the
    two is closer in time (exact-distance ties go backward, pandas
    semantics).  Left rows with no match keep NULL right columns
    (left-join semantics, row count preserved).

    Deterministic tie-break: among right rows sharing the boundary
    timestamp the one with the greatest (backward) / smallest (forward)
    ``seq_col`` wins.  Pass a unique right-side column (an event id);
    without one, equal-timestamp ties are engine-order dependent.

    ``tolerance_sec`` nulls the match when it is further than the
    tolerance from the left timestamp (pandas semantics).

    Plan shape: union → single hash exchange on ``on`` → one sort by
    (ts, side, seq) → running ``last(ignoreNulls)`` window → filter.  The
    only data-size term is |left| + |right| rows through one shuffle —
    the same cost as the sort-merge as-of in kdb/QuestDB/DuckDB, and the
    reason this beats any range-join formulation at scale.

    Skew note: by default a hot key serializes its per-key sort into one
    task (the carry-forward needs the full per-key time order); Spark's
    external sort spills rather than OOMs (measured 1.3× at 90%-hot,
    PERF.md r5).  ``bucket_seconds`` opts into hot-key pre-bucketing when
    one key outgrows a task: the carry window partitions on
    (key, time-bucket) — a hot key's timeline splits across
    ⌈span/bucket⌉ tasks — and the cross-bucket boundary is restored
    exactly from a per-(key, bucket) summary table (one row per bucket:
    the bucket's latest/earliest right struct), whose per-key prefix scan
    is O(#buckets) rows and whose result joins back on (key, bucket) and
    coalesces UNDER the in-bucket carry.  Exactness: equal timestamps land
    in the same bucket, so tie/visibility ordering (seq,
    allow_exact_matches) never crosses a bucket boundary, and any
    carried-in right row is strictly earlier (backward) / later (forward)
    than every row of the bucket.  Output is row-identical to the default
    path (differential-tested); cost is two extra small shuffles over the
    bucket-summary table.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}")
    keys = _keys(on)
    rts = right_ts_col or ts_col
    lpayload = [c for c in left.columns if c not in keys and c != ts_col]
    rpayload = [c for c in right.columns if c not in keys]
    # ts_col included: a prefixed right column named like the left timestamp
    # would emit two identically-named output columns (AMBIGUOUS_REFERENCE
    # downstream) — fail early instead
    clash = {prefix + c for c in [rts, *rpayload]} & set(keys + lpayload + [ts_col])
    if clash:
        raise ValueError(f"prefixed right columns clash with left columns: {sorted(clash)}")

    rstruct = F.struct(
        F.col(rts).alias(prefix + rts),
        *[F.col(c).alias(prefix + c) for c in rpayload if c != rts],
    )
    # a NULL-ts right row would sort to the partition front and be carried
    # into every left row until the first real right row — drop them (they
    # cannot be "nearest" to anything)
    right = right.where(F.col(rts).isNotNull())
    rs = right.select(
        *keys,
        F.col(rts).alias("_ats"),
        (F.col(seq_col).cast("long") if seq_col else F.lit(0)).alias("_seq"),
        F.lit(0).alias("_side"),
        rstruct.alias("_r"),
    )
    rtype = rs.schema["_r"].dataType
    ls = left.select(
        *keys,
        F.col(ts_col).alias("_ats"),
        F.lit(0).cast("long").alias("_seq"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtype).alias("_r"),
        *[F.col(c) for c in lpayload],
    )
    rs = rs.select(*keys, "_ats", "_seq", "_side", "_r",
                   *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lpayload])

    part = list(keys) if bucket_seconds is None else [*keys, "_bkt"]

    def carry(backward: bool):
        # traversal order: backward walks time ascending, forward descending.
        # At equal timestamps the right row must be *visible* to the left row
        # iff exact matches are allowed → right sorts before left exactly
        # then.  NULLS FIRST in BOTH traversal directions: a NULL-ts left
        # row must see no carried right row (desc's default NULLS LAST
        # would sort it after every right row and fabricate a match with
        # the earliest one).  Among equal-ts right rows the LAST one in
        # traversal order wins the carry-forward → greatest seq for
        # backward, smallest for forward.
        ts_ord = (F.col("_ats").asc_nulls_first() if backward
                  else F.col("_ats").desc_nulls_first())
        side_ord = (F.col("_side").asc() if allow_exact_matches
                    else F.col("_side").desc())
        seq_ord = F.col("_seq").asc() if backward else F.col("_seq").desc()
        w = (
            Window.partitionBy(*part)
            .orderBy(ts_ord, side_ord, seq_ord)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_r", ignorenulls=True).over(w)

    def carry_in(u: DataFrame, backward: bool) -> DataFrame:
        """(keys, _bkt, _cin): the match a left row falls back to when its
        own bucket holds no earlier (backward) / later (forward) right row
        — the latest right struct over all STRICTLY earlier buckets (resp.
        earliest over later ones).  Built from one bucket-summary row per
        (key, bucket) — the per-key prefix window runs over #buckets rows,
        not data rows.  NULL-_bkt rows (NULL-ts left rows) never join."""
        bkts = u.where(F.col("_bkt").isNotNull()).select(*keys, "_bkt").distinct()
        rrows = u.where(F.col("_side") == 0)
        pick = F.struct("_ats", "_seq")
        if backward:
            summ = rrows.groupBy(*keys, "_bkt").agg(F.max_by("_r", pick).alias("_b_r"))
            wk = (Window.partitionBy(*keys).orderBy(F.col("_bkt").asc())
                  .rowsBetween(Window.unboundedPreceding, -1))
            cin = F.last("_b_r", ignorenulls=True).over(wk)
        else:
            summ = rrows.groupBy(*keys, "_bkt").agg(F.min_by("_r", pick).alias("_b_r"))
            wk = (Window.partitionBy(*keys).orderBy(F.col("_bkt").asc())
                  .rowsBetween(1, Window.unboundedFollowing))
            cin = F.first("_b_r", ignorenulls=True).over(wk)
        return (bkts.join(summ, on=[*keys, "_bkt"], how="left")
                .withColumn("_cin", cin).drop("_b_r"))

    lt = F.unix_micros(F.col("_ats").cast("timestamp"))

    def with_tolerance(match, backward: bool):
        if tolerance_sec is None:
            return match
        mt = F.unix_micros(match[prefix + rts].cast("timestamp"))
        gap = (lt - mt) if backward else (mt - lt)
        return F.when(gap <= int(tolerance_sec * 1_000_000), match)

    u = ls.unionByName(rs)
    if bucket_seconds is not None:
        bkt_us = int(bucket_seconds) * 1_000_000
        u = u.withColumn(
            "_bkt",
            F.floor(F.unix_micros(F.col("_ats").cast("timestamp")) / F.lit(bkt_us)))
    if direction == "nearest":
        # both carries ride the SAME hash exchange (identical partitioning;
        # the second window only adds a sort); the closer match wins,
        # exact-distance ties go backward (pandas semantics)
        out = (
            u.withColumn("_mb", carry(True))
            .withColumn("_mf", carry(False))
            .where(F.col("_side") == 1)
        )
        if bucket_seconds is not None:
            cb = carry_in(u, True).withColumnRenamed("_cin", "_cb")
            cf = carry_in(u, False).withColumnRenamed("_cin", "_cf")
            out = (
                out.join(cb, on=[*keys, "_bkt"], how="left")
                .join(cf, on=[*keys, "_bkt"], how="left")
                .withColumn("_mb", F.coalesce("_mb", "_cb"))
                .withColumn("_mf", F.coalesce("_mf", "_cf"))
                .drop("_cb", "_cf")
            )
        mb = with_tolerance(F.col("_mb"), True)
        mf = with_tolerance(F.col("_mf"), False)
        gb = lt - F.unix_micros(mb[prefix + rts].cast("timestamp"))
        gf = F.unix_micros(mf[prefix + rts].cast("timestamp")) - lt
        out = out.withColumn(
            "_match",
            F.when(mb.isNull(), mf).when(mf.isNull(), mb)
            .when(gf < gb, mf).otherwise(mb),
        )
    else:
        backward = direction == "backward"
        out = u.withColumn("_match", carry(backward)).where(F.col("_side") == 1)
        if bucket_seconds is not None:
            out = (
                out.join(carry_in(u, backward), on=[*keys, "_bkt"], how="left")
                .withColumn("_match", F.coalesce("_match", "_cin"))
                .drop("_cin")
            )
        out = out.withColumn("_match", with_tolerance(F.col("_match"), backward))
    rcols = [F.col("_match")[f.name].alias(f.name) for f in rtype.fields]
    return out.select(*keys, F.col("_ats").alias(ts_col), *lpayload, *rcols)


def merge_intervals(
    intervals: DataFrame,
    on,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Coalesce overlapping/touching [start, end) intervals per key into
    disjoint covering intervals (gaps-and-islands over a running max-end).

    One shuffle on the key; windows are per-key sorts.  Touching intervals
    (``start == previous end``) merge — half-open semantics."""
    keys = _keys(on)
    w = Window.partitionBy(*keys).orderBy(F.col(start_col), F.col(end_col))
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        intervals.withColumn(
            "_new", F.when(prev_max_end.isNull()
                           | (F.col(start_col) > prev_max_end), 1).otherwise(0))
        .withColumn("_island",
                    F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        islands.groupBy(*keys, "_island")
        .agg(F.min(start_col).alias(start_col), F.max(end_col).alias(end_col))
        .drop("_island")
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: int = 1800,
    how: str = "inner",
    point_id_col: str | None = None,
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Exact point-in-[start, end) join as a shuffled EQUI-join.

    Every point hashes to exactly one ``bin_seconds``-wide time bucket; every
    interval is replicated to each bucket it covers (``⌈len/bin⌉ + 1`` rows —
    pick ``bin_seconds`` near the median interval length to keep the
    replication factor ~2).  The equi-join on (key, bucket) then a residual
    ``start <= ts < end`` filter reproduces the inequality join exactly: a
    (point, interval) pair agrees on exactly one bucket, so no duplicates
    and no dedup pass.

    ``how="left"`` keeps unmatched points with NULL interval columns; it
    needs ``point_id_col`` (a unique point key) for the anti-join that
    recovers points whose bucket matched but whose residual failed.

    Plan shape: two narrow projections + one shuffled equi-join (+ for
    "left": one anti-join reusing the same point-side shuffle key).  No
    BNLJ/CartesianProduct for any input — the plan-shape test pins this.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if how == "left" and not point_id_col:
        raise ValueError("how='left' needs point_id_col (unique point key)")
    keys = _keys(on)
    clash = (set(intervals.columns) - set(keys)) & set(points.columns)
    if clash:
        raise ValueError(f"interval columns clash with point columns: {sorted(clash)}")
    bin_us = int(bin_seconds) * 1_000_000
    pb = points.withColumn(
        "_bin", F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(bin_us)))
    iv = intervals.where(F.col(end_col) > F.col(start_col))
    first_bin = F.floor(F.unix_micros(F.col(start_col).cast("timestamp")) / F.lit(bin_us))
    # end is exclusive: the bucket of (end − 1µs)
    last_bin = F.floor((F.unix_micros(F.col(end_col).cast("timestamp")) - 1) / F.lit(bin_us))
    # replication guard: one corrupt interval (year-9999 end_ts) would
    # otherwise explode into millions of rows inside a single task.  Fail
    # loudly — silently clamping would silently drop matches.
    ib = iv.withColumn(
        "_nbins", last_bin - first_bin + 1
    ).withColumn(
        "_bin",
        F.explode(F.sequence(
            first_bin,
            F.when(F.col("_nbins") <= max_bins_per_interval, last_bin).otherwise(
                F.raise_error(F.concat(
                    F.lit(f"interval_join: an interval spans > {max_bins_per_interval} "
                          f"bins of {bin_seconds}s (nbins="),
                    F.col("_nbins"),
                    F.lit("); raise bin_seconds or max_bins_per_interval, "
                          "or filter corrupt intervals"),
                ).cast("string")).cast("bigint")),
        )),
    ).drop("_nbins")
    matched = (
        pb.join(ib, on=[*keys, "_bin"])
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bin")
    )
    if how == "inner":
        return matched
    iv_cols = [c for c in iv.columns if c not in keys]
    unmatched = (
        points.join(matched.select(point_id_col), on=point_id_col, how="left_anti")
        .select(*points.columns,
                *[F.lit(None).cast(dict(iv.dtypes)[c]).alias(c) for c in iv_cols])
    )
    return matched.select(*points.columns, *iv_cols).unionByName(unmatched)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_start: str = "start_ts",
    left_end: str = "end_ts",
    right_start: str = "start_ts",
    right_end: str = "end_ts",
    bin_seconds: int = 1800,
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Interval × interval OVERLAP join (``aS < bE AND bS < aE``,
    half-open) as a shuffled equi-join — the session-overlap /
    concurrent-windows primitive.

    Both sides replicate per covered time bucket like ``interval_join``.
    Two overlapping intervals can share MANY buckets; instead of a distinct
    pass over the (potentially huge) matched set, each pair is emitted at
    exactly ONE bucket — the first bucket of their overlap,
    ``max(first_bin(a), first_bin(b))``, which both sides provably cover —
    the standard dedup-free replication-join trick.  The residual overlap
    predicate makes the match exact.

    Right-side columns must not clash with left's (rename upstream)."""
    keys = _keys(on)
    clash = (set(right.columns) - set(keys)) & set(left.columns)
    if clash:
        raise ValueError(f"right columns clash with left columns: {sorted(clash)}")
    bin_us = int(bin_seconds) * 1_000_000

    def binned(df: DataFrame, s: str, e: str, tag: str) -> DataFrame:
        first = F.floor(F.unix_micros(F.col(s).cast("timestamp")) / F.lit(bin_us))
        last = F.floor((F.unix_micros(F.col(e).cast("timestamp")) - 1) / F.lit(bin_us))
        guarded_last = F.when(
            last - first + 1 <= max_bins_per_interval, last
        ).otherwise(F.raise_error(F.concat(
            F.lit(f"interval_overlap_join: an interval spans > "
                  f"{max_bins_per_interval} bins of {bin_seconds}s; raise "
                  f"bin_seconds or max_bins_per_interval"),
        )).cast("bigint"))
        return (
            df.where(F.col(e) > F.col(s))
            .withColumn(f"_first_{tag}", first)
            .withColumn("_bin", F.explode(F.sequence(first, guarded_last)))
        )
    a = binned(left, left_start, left_end, "a")
    b = binned(right, right_start, right_end, "b")
    return (
        a.join(b, on=[*keys, "_bin"])
        # exactly-once: keep the pair only at the first bucket BOTH cover
        .where(F.col("_bin") == F.greatest("_first_a", "_first_b"))
        .where((F.col(left_start) < F.col(right_end))
               & (F.col(right_start) < F.col(left_end)))
        .drop("_bin", "_first_a", "_first_b")
    )


def scd2_intervals(df: DataFrame, key_cols: list[str], ts_col: str,
                   attr_col: str, order_cols: list[str] | None = None) -> DataFrame:
    """Collapse an event log into SCD Type-2 validity intervals — the
    classic warehouse dimension-history build: one row per maximal run
    of an unchanged attribute value per key, with ``valid_from`` /
    ``valid_to`` (NULL = still current), ``n_events`` in the run and an
    ``is_current`` flag.

    Change detection is null-safe (``<=>`` against the previous event's
    value), run ids are a conditional running sum, intervals close at
    the NEXT run's ``valid_from`` (lead) — three per-key window passes
    plus one (key, run) aggregation, all partitioned BY KEY: no global
    ordering stage, so the plan parallelizes per key at any scale.

    ``order_cols`` breaks timestamp ties deterministically (pass the
    event id); without it equal-``ts`` runs would be layout-dependent.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    chg = (~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w))).cast("bigint")
    seg = F.sum(chg).over(
        Window.partitionBy(*key_cols).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0))
    runs = (
        df.withColumn("_seg", seg)
        .groupBy(*key_cols, "_seg")
        .agg(F.min(attr_col).alias(attr_col),   # constant within a run
             F.min(ts_col).alias("valid_from"),
             F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    w_run = Window.partitionBy(*key_cols).orderBy(F.col("_seg").asc())
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w_run))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_seg")
    )
