"""Structured Streaming ingest layer (beyond-reference mandate, BASELINE.json:
"Structured Streaming + in-memory caching").

The reference's only streaming-adjacent machinery is the multi-run
insert/multi_insert accumulation (rows pile up across protocol round trips,
committed on the final run — ``/root/reference/src/server/
oph_io_server_query.c:190-339``) and the ESDM stream kernels (reduce applied
while data streams in, ``oph_io_server_esdm.c:611-630``).  Those map here to:

- ``streaming_insert_fragment``: foreachBatch append into a catalog fragment
  (micro-batch = one "run"; the final commit is just the last batch) —
  the scale replacement for the row-buffer protocol;
- windowed/watermarked aggregations: the stream-kernel analog, aggregation
  applied as data arrives;
- ``stateful_dedup_stream``: watermark-bounded dropDuplicates (state store
  evicts ids older than the watermark — bounded memory at any scale).

All plans are identical to their batch shape, so the DuckDB oracle for the
batch query also checks the streaming result (processed with availableNow).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ophidia_io_server_spark.sources.tables import exact_cents_sum
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# State partitions follow per-batch VOLUME, not cluster CPU count: every
# stateful store commits one delta file per partition per micro-batch, so
# a stream whose batches hold thousands-not-billions of rows pays pure
# commit overhead for each extra partition.  Measured
# (scripts/stream_steady_probe.py, PERF.md r8): the stream-stream join's
# per-batch marginal cost drops 3.39 s → 0.86 s going 32 → 8 partitions
# on identical data.  At production volume raise it to keep
# rows-per-partition-per-batch bounded — it is a per-query start-time
# knob, pinned into the checkpoint thereafter.
STREAM_SHUFFLE_PARTITIONS = 8


@contextmanager
def stream_shuffle_partitions(spark: SparkSession,
                              n: int = STREAM_SHUFFLE_PARTITIONS):
    """Scope ``spark.sql.shuffle.partitions`` around a streaming-query
    START (the value is captured into the query's state checkpoint at
    first batch; restoring after start does not affect the running
    query).  Results are partition-count invariant — the gate re-verifies
    every streaming row under a different count than the bench runs."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def events_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None
                  ) -> DataFrame:
    """File-source stream over event parquet (directory or single file).

    At production scale this is the same reader pointed at a Kafka topic or a
    cloud-storage landing zone; the downstream plans don't change."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed aggregation with late-data watermark — the
    streaming form of workload.events_hourly_window (same plan, same oracle)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            exact_cents_sum("value").alias("total_cents"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "total_cents")
    )


def hopping_counts_stream(events: DataFrame,
                          watermark: str = "4 hours") -> DataFrame:
    """HOPPING (2 h window / 1 h slide) aggregation under a watermark —
    the streaming form of workload.events_hopping_window: each event
    lands in two overlapping windows; state is two open windows per
    (slide, type) and eviction follows the watermark like the tumbling
    twin."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"),
                 F.col("event_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
             exact_cents_sum("value").alias("total_cents"))
        .select(F.col("w.start").alias("win_start"), "event_type",
                "n_events", "total_cents")
    )


def stateful_dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids within the
    watermark horizon.  State is bounded: ids older than the watermark are
    evicted from the state store."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def session_window_stream(events: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Native session windows (gap-based) over the event stream: state closes
    a user's session once no event arrives within ``gap``; the watermark
    bounds state retention.  Batch shape of the same query:
    workload.events_sessionize (lag/cumulative-sum formulation)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def user_running_stats_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    event count / value sum / last-seen timestamp maintained in the state
    store across micro-batches (update mode: each batch emits the users it
    touched with their cumulative totals).

    This is the streaming generalization of the reference's add/exec/clear
    aggregate machine (oph_query_plugin_executor.c:480-680): state = the
    accumulator, each micro-batch = a run of add() calls, every emit = exec()
    without clear().  State is per-user and O(users), watermark-independent.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double, last_ts timestamp"
    state_schema = "n long, total double, last long"

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # noqa: PLC0415

        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts"].astype("int64").max()))
        state.update((n, total, last))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last)],
        })

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def stream_stream_attribution(views: DataFrame, purchases: DataFrame,
                              window_minutes: int = 120,
                              watermark: str = "4 hours") -> DataFrame:
    """Watermarked STREAM-STREAM inner join: each purchase joined to the
    same user's view events in the preceding ``window_minutes``.

    This is Spark's canonical bounded-state stream-stream join: both
    inputs are watermarked and the join condition carries an explicit
    event-time range, so the state store can evict a buffered view row as
    soon as the purchase-side watermark passes ``v_ts + window`` (and
    vice versa) — state is O(events inside the watermark horizon), not
    O(stream length).  Output mode must be ``append`` (stream-stream
    joins emit a pair exactly once, when both sides have arrived).

    The batch twin is the identical join on static DataFrames; the
    correctness gate asserts the drained stream result set-equals the
    batch result (``workload.stream_view_attribution``)."""
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("v_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    return p.join(
        v,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") > F.col("p_ts")
           - F.expr(f"INTERVAL {int(window_minutes)} MINUTES")),
        "inner",
    ).drop("v_user")


def user_inactivity_closeout_stream(events: DataFrame,
                                    gap_minutes: int = 120,
                                    watermark: str = "2 hours") -> DataFrame:
    """Per-user INACTIVITY CLOSE-OUT via event-time state timeout: a user's
    running (n_events, last_ts) accumulates in the state store; once the
    watermark passes ``last_ts + gap`` with no new event, the TIMEOUT path
    fires, emits the user's final record exactly once, and ``state.remove()``
    frees the slot.

    This exercises the one stateful-streaming discipline the repo's other
    operators don't: ``GroupStateTimeout.EventTimeTimeout`` — emission
    driven by the ABSENCE of data, with state lifetime bounded by the
    timeout instead of a window/watermark eviction.  State is O(active
    users within the gap horizon), the canonical abandoned-cart /
    session-close shape.  Each emitted row is (user_id, n_events,
    last_ts); a drained stream emits every user exactly once provided the
    final watermark passes every user's horizon (the workload stages a
    far-future sentinel user for exactly that)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, last_ts timestamp"
    state_schema = "n long, last long"
    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # noqa: PLC0415

        if state.hasTimedOut:
            n, last = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [key[0]],
                "n_events": [n],
                "last_ts": [pd.Timestamp(last)],
            })
            return
        n, last = state.get if state.exists else (0, 0)
        seen = state.exists
        for pdf in pdfs:
            # applyInPandasWithState can deliver empty chunks; max() over
            # an empty series is NaN and int(NaN) would kill the query
            if not len(pdf):
                continue
            seen = True
            n += len(pdf)
            last = max(last, int(pdf["ts"].astype("int64").max()))
        if seen:
            state.update((n, last))
            # timestamps ride as int64 NANOseconds in Arrow; the timeout
            # API takes epoch MILLIseconds
            state.setTimeoutTimestamp(last // 1_000_000 + gap_us // 1_000)
        yield pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                            "n_events": pd.Series(dtype="int64"),
                            "last_ts": pd.Series(dtype="datetime64[ns]")})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_stream_attribution_outer(views: DataFrame, purchases: DataFrame,
                                    window_minutes: int = 120,
                                    watermark: str = "4 hours") -> DataFrame:
    """LEFT-OUTER watermarked stream-stream join: every purchase emits —
    joined to the user's prior-window views when they exist, NULL-extended
    when they don't.

    The semantics corner beyond the inner join
    (``stream_stream_attribution``): a NULL-extended result can only be
    emitted once the engine PROVES no match can still arrive — i.e. when
    the watermark passes ``p_ts + window`` — and that proof materializes
    during state eviction, which runs a batch AFTER the watermark
    advances.  A drained availableNow stream therefore needs events past
    the horizon (two trailing micro-batches) to flush the unmatched tail;
    the ``stream_view_attribution_outer`` workload stages two sentinel
    batches for exactly this, and its stream≡batch certificate binds the
    NULL rows too, not just the matches.  State is the same
    O(watermark horizon) as the inner join."""
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("v_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    return p.join(
        v,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") > F.col("p_ts")
           - F.expr(f"INTERVAL {int(window_minutes)} MINUTES")),
        "leftOuter",
    ).drop("v_user")


def run_available_now(sdf: DataFrame, query_name: str, output_mode: str = "complete",
                      timeout_sec: int = 300) -> DataFrame:
    """Process everything currently available, write to an in-memory sink,
    return the result table.  Used by tests and the correctness gate to check
    streaming plans against batch oracles."""
    spark = sdf.sparkSession
    # Pin the no-data micro-batch explicitly (it is the Spark default):
    # the sentinel stagings rely on the trailing no-data batch to run the
    # watermark-driven state-eviction/timeout pass before the availableNow
    # drain terminates (workloads/streaming.py::_staged_events_outer_dir).
    old_ndmb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled",
                              "true")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        with stream_shuffle_partitions(spark):
            q = (
                sdf.writeStream.format("memory")
                .queryName(query_name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(timeout_sec)
    finally:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
                       old_ndmb)
    return spark.table(query_name)


def streaming_insert_fragment(spark: SparkSession, stream: DataFrame, catalog, frag_name: str,
                              id_col: str = "event_id", timeout_sec: int = 300):
    """foreachBatch accumulation into a catalog fragment (≙ multi-run insert):
    every micro-batch appends; the union is registered as the fragment."""
    batches: list[DataFrame] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # persist each micro-batch so the union doesn't recompute the source
        batches.append(batch_df.persist())

    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(timeout_sec)
    if not batches:
        # consistent return type on an all-empty stream: a typed empty
        # fragment with the stream's schema (same fix as minhash_lsh_stream)
        out = spark.createDataFrame([], stream.schema)
        catalog.put(frag_name, out, cache=True, overwrite=True)
        return catalog.get(frag_name)
    out = batches[0]
    for b in batches[1:]:
        out = out.unionAll(b)
    catalog.put(frag_name, out, cache=True, overwrite=True)
    return catalog.get(frag_name)


def heavy_hitters_stream(items: DataFrame, item_col: str = "item",
                         k: int = 64, buckets: int = 16) -> DataFrame:
    """Streaming heavy-hitter candidates with BOUNDED state: per-bucket
    Misra-Gries counters maintained in the state store across
    micro-batches via ``applyInPandasWithState``.

    Items hash to exactly ONE of ``buckets`` state groups, so an item's
    full stream count accumulates inside one MG instance; each group keeps
    ≤ k counters (state is O(k·buckets) forever — the point, vs the
    vocabulary-sized state of a plain streaming count).  The MG fold is
    the same batched one-shot-trim kernel as ``pipeline/heavy.py``
    (value_counts merge, subtract the (k+1)-th largest) and carries the
    same guarantee per bucket: any item whose TOTAL stream frequency
    exceeds W_bucket/(k+1) ≤ W_total/(k+1) is in the bucket's survivors —
    so the final survivor union is a superset of every global heavy
    hitter above the classic support bound, over the whole stream, not
    per batch.

    Each micro-batch EMITS the touched buckets' full survivor snapshots
    tagged with a per-bucket round number; the stream's final candidate
    set is the max-round snapshot per bucket (``final_candidates`` does
    that in batch after an availableNow drain).  Exact counts come from a
    batch verify join against the landed corpus, exactly like the batch
    operator."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "bkt integer, round long, item string"
    state_schema = "items array<string>, counts array<long>, round long"

    def update(key, pdfs, state: GroupState):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        if state.exists:
            its, cts, rnd = state.get
            counters = dict(zip(its, cts))
        else:
            counters, rnd = {}, 0
        for pdf in pdfs:
            for it, w in pdf["item"].value_counts(dropna=True).items():
                counters[it] = counters.get(it, 0) + int(w)
            if len(counters) > k:
                vals = np.fromiter(counters.values(), dtype=np.int64,
                                   count=len(counters))
                t = int(np.partition(vals, -(k + 1))[-(k + 1)])
                counters = {it: c - t for it, c in counters.items() if c > t}
        rnd += 1
        state.update((list(counters.keys()),
                      [int(v) for v in counters.values()], rnd))
        yield pd.DataFrame({
            "bkt": [key[0]] * len(counters) or [key[0]],
            "round": [rnd] * max(len(counters), 1),
            "item": list(counters.keys()) or [None],
        })

    keyed = items.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(buckets)).cast("int").alias("bkt"),
        F.col(item_col).cast("string").alias("item"),
    )
    return keyed.groupBy("bkt").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)


def final_candidates(emitted: DataFrame) -> DataFrame:
    """Distinct items of each bucket's LAST emitted snapshot (max round per
    bucket) — the stream's final MG survivor set."""
    from pyspark.sql import Window

    w = Window.partitionBy("bkt")
    return (
        emitted.withColumn("_mx", F.max("round").over(w))
        .where((F.col("round") == F.col("_mx")) & F.col("item").isNotNull())
        .select("item").distinct()
    )


def quantile_sketch_stream(stream_df: DataFrame, keys: list[str],
                           value_col: str, id_col: str, k: int = 64,
                           timeout_sec: int = 300) -> DataFrame:
    """Streaming incremental quantile-sketch rollup (the foreachBatch
    realization of ``pipeline/quantile.py``): each micro-batch sketches
    ONLY its arriving rows (one window exchange over |batch|), then
    merges into the persisted per-cell state — merge work is
    |cells|·k rows regardless of history length, so per-batch cost is
    O(|batch| + cells·k), never O(stream).

    Because the sketch's bottom-k priorities are pure functions of row
    ids, the merged state after draining is BITWISE equal to the
    one-shot batch sketch over the whole input — for ANY batch
    decomposition (the exact-coordination theorem, module docstring of
    ``pipeline/quantile.py``).  That upgrades the usual stream≡batch
    set-equality certificate to bitwise sample equality, which the
    ``stream_quantile_rollup`` workload asserts.

    Returns the drained per-cell state ``(*keys, n, sample)``; an
    all-empty stream returns an empty DataFrame with the same schema."""
    from ophidia_io_server_spark.pipeline.quantile import (
        merge_sketches,
        quantile_sketch,
    )

    state: dict = {"sk": None}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint()
        if not batch.take(1):
            return
        sk_new = quantile_sketch(batch, keys, value_col, id_col, k)
        if state["sk"] is None:
            state["sk"] = sk_new.localCheckpoint()
        else:
            state["sk"] = merge_sketches(
                state["sk"].unionByName(sk_new), keys, k).localCheckpoint()

    q = (stream_df.writeStream.foreachBatch(sink)
         .trigger(availableNow=True).start())
    q.awaitTermination(timeout_sec)
    if state["sk"] is not None:
        return state["sk"]
    spark = stream_df.sparkSession
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream_df.schema.fields if f.name in keys)
    return spark.createDataFrame(
        [], f"{key_fields}, n bigint, "
            "sample array<struct<pr: bigint, id: bigint, v: double>>")


def minhash_lsh_stream(stream_docs: DataFrame, n: int = 3,
                       threshold: float = 0.5, num_hashes: int = 64,
                       bands: int = 16, text_col: str = "text",
                       timeout_sec: int = 300) -> DataFrame:
    """Streaming incremental MinHash+LSH dedup (the foreachBatch
    realization of ``pipeline/dedup.py::minhash_lsh_pairs_incremental`` —
    its docstring's "persist the signatures between batches" note made
    real, r6 verdict #6).

    Per micro-batch: shingle + sign ONLY the arriving docs, probe their
    band rows against the PERSISTED corpus band index (plus the batch's
    own rows, for new↔new pairs), exact-verify the candidates against the
    persisted shingle table, emit the verified pairs, then append the
    batch's bands/shingles to the persisted state.  Per-batch probe cost
    is |batch|·bands rows against the index — the corpus is never
    re-banded, never self-joined.

    Because banding and signatures are per-doc deterministic, the UNION
    of emitted pairs over any batch decomposition equals the one-shot
    ``minhash_lsh_pairs`` over the whole corpus (the batch-arrival
    invariance the incremental operator gates) — asserted as the
    ``stream_equals_batch`` boolean in the ``stream_minhash_incremental``
    workload.  State is the band index + shingle table, exactly what a
    production pipeline persists between ingestion runs.

    Returns the union of per-batch verified (doc_a, doc_b, jaccard) rows.
    Doc ids must be unique across the stream."""
    from ophidia_io_server_spark.pipeline.dedup import (
        _band_rows,
        _verify_pairs,
        minhash_signatures,
        shingle_df,
    )

    r = num_hashes // bands
    state: dict = {"bands": None, "sh": None}
    emitted: list[DataFrame] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # no extra checkpoint of the raw batch: foreachBatch hands over a
        # source-backed DataFrame, and each micro-batch plan's FIXED cost
        # (driver-side analysis + job launch — the same per 10 docs as per
        # 5000, measured r9) dominates this operator's marginal, so every
        # plan shaved matters
        batch = batch_df.select("doc_id", text_col)
        if not batch.take(1):
            return
        sh_new = shingle_df(batch, n, text_col).localCheckpoint()
        bands_new = _band_rows(minhash_signatures(sh_new, num_hashes),
                               bands, r).localCheckpoint()
        all_bands = (bands_new if state["bands"] is None
                     else state["bands"].unionByName(bands_new))
        all_sh = (sh_new if state["sh"] is None
                  else state["sh"].unionByName(sh_new))
        a = bands_new.alias("a")
        b = all_bands.alias("b")
        cand = (
            a.join(b, on=["band", "bucket"])
            .where(F.col("a.doc_id") != F.col("b.doc_id"))
            .select(F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                    F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"))
            .distinct()
        )
        emitted.append(_verify_pairs(cand, all_sh, threshold).localCheckpoint())
        state["bands"], state["sh"] = all_bands, all_sh

    # per-batch volumes are |batch|-bounded (probe ∝ |new|·bands), so the
    # session's 32 shuffle partitions mean mostly-empty tasks per batch
    # join; 8 measured ~0.2-0.3 s/batch faster at sf0.1 (r9 probe) with
    # identical output — the earlier "don't shrink foreachBatch" note
    # applied to the plain insert runners, not to join-per-batch sinks
    with stream_shuffle_partitions(stream_docs.sparkSession):
        q = (stream_docs.writeStream.foreachBatch(sink)
             .trigger(availableNow=True).start())
        q.awaitTermination(timeout_sec)
    if not emitted:
        # consistent return type on an all-empty stream (r7 ADVICE: a
        # None here forced every caller to special-case it)
        return stream_docs.sparkSession.createDataFrame(
            [], "doc_a bigint, doc_b bigint, jaccard double")
    out = emitted[0]
    for p in emitted[1:]:
        out = out.unionByName(p)
    return out


def ohlc_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Hourly OHLC bars under a watermark — the streaming form of
    workload.events_ohlc_hourly: ``min_by``/``max_by`` are declarative
    (partial-aggregatable) aggregates, so the state per open (hour,
    type) window is four scalars + a count, and eviction follows the
    watermark exactly like the tumbling count twin."""
    o = F.struct("ts", "event_id")
    return (
        events.where(F.col("value").isNotNull() & ~F.isnan("value"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.min_by("value", o).alias("open"),
             F.max("value").alias("high"),
             F.min("value").alias("low"),
             F.max_by("value", o).alias("close"),
             F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type",
                "open", "high", "low", "close", "n")
    )


def sessionized_funnel_stream(events: DataFrame,
                              gap_minutes: int = 30,
                              watermark: str = "2 hours") -> DataFrame:
    """Sessionized funnel ATTRIBUTION over a watermarked stream (r11
    verdict #7's named gap): per user, events split into 30-min-gap
    sessions; within each session the ordered funnel
    view -> click(after view) -> purchase(after click) resolves to first
    occurrences, and the converting purchase's cents become the session's
    attributed credit.  Sessions CLOSED by in-stream evidence (a later
    event past the gap) emit immediately; the trailing open session per
    user emits via ``GroupStateTimeout.EventTimeTimeout`` when the
    watermark passes ``last_ts + gap`` — the same exactly-once timeout
    discipline as ``user_inactivity_closeout_stream``, but holding a
    FUNNEL state machine per open session instead of a counter.

    Determinism: within each state invocation the buffered rows are
    sorted by (ts, event_id) before the walk, so emission is independent
    of arrival partitioning; "after" comparisons are strict on ts
    (a click at the view's exact timestamp does not qualify), matching
    the batch twin's `>` predicates.  State is ONE fixed-size tuple per
    user (the open session), not an event buffer — O(active users) at
    any scale."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = ("user_id long, session_start timestamp, n_events long, "
                  "first_view_ts timestamp, first_click_ts timestamp, "
                  "purchase_ts timestamp, credit_cents long, "
                  "converted boolean")
    state_schema = ("start long, last long, n long, fv long, fc long, "
                    "fp long, credit long")
    gap_ns = gap_minutes * 60 * 1_000_000_000

    def _row(uid, s):
        import pandas as pd  # noqa: PLC0415

        start, last, n, fv, fc, fp, credit = s
        return {
            "user_id": uid,
            "session_start": pd.Timestamp(start),
            "n_events": n,
            "first_view_ts": pd.Timestamp(fv) if fv else pd.NaT,
            "first_click_ts": pd.Timestamp(fc) if fc else pd.NaT,
            "purchase_ts": pd.Timestamp(fp) if fp else pd.NaT,
            "credit_cents": credit,
            "converted": bool(fp),
        }

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # noqa: PLC0415

        uid = key[0]
        if state.hasTimedOut:
            closed = [_row(uid, state.get)]
            state.remove()
            yield pd.DataFrame(closed)
            return

        def empty():
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "session_start": pd.Series(dtype="datetime64[ns]"),
                "n_events": pd.Series(dtype="int64"),
                "first_view_ts": pd.Series(dtype="datetime64[ns]"),
                "first_click_ts": pd.Series(dtype="datetime64[ns]"),
                "purchase_ts": pd.Series(dtype="datetime64[ns]"),
                "credit_cents": pd.Series(dtype="int64"),
                "converted": pd.Series(dtype="bool"),
            })

        rows = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = pdf["ts"].astype("int64")
            for t, eid, et, cents in zip(ts, pdf["event_id"],
                                         pdf["event_type"], pdf["cents"]):
                rows.append((int(t), int(eid), et,
                             0 if pd.isna(cents) else int(cents)))
        if not rows:
            # applyInPandasWithState can invoke with only empty chunks
            yield empty()
            return
        rows.sort()

        cur = list(state.get) if state.exists else None
        closed = []
        for t, eid, et, cents in rows:
            if cur is not None and t - cur[1] > gap_ns:
                closed.append(_row(uid, cur))
                cur = None
            if cur is None:
                cur = [t, t, 0, 0, 0, 0, 0]
            cur[1] = t
            cur[2] += 1
            if et == "view" and not cur[3]:
                cur[3] = t
            elif et == "click" and cur[3] and not cur[4] and t > cur[3]:
                cur[4] = t
            elif et == "purchase" and cur[4] and not cur[5] and t > cur[4]:
                cur[5] = t
                cur[6] = cents
        state.update(tuple(cur))
        state.setTimeoutTimestamp(cur[1] // 1_000_000 + gap_ns // 1_000_000)
        yield pd.DataFrame(closed) if closed else empty()

    src = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(F.col("value").isNotNull() & ~F.isnan("value"),
               F.round(F.col("value") * 100).cast("bigint"))
        .alias("cents"))
    return (
        src.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
