"""Round-6+ relational/statistics wave: the remaining TPC-H shapes (q2/q9/q11/q16/q20/q21), sketch family (HLL, quantile rollup, Count-Min join-size, equi-depth histogram), variable-length dedup, shard planning, streaming incremental rollups.

Carved verbatim out of the original workload.py (r8 VERDICT #3);
provenance citations in the per-workload docstrings are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ophidia_io_server_spark.operators.engine import IOServer  # noqa: F401
from ophidia_io_server_spark.session import session_key  # noqa: F401
from ophidia_io_server_spark.sources.random_import import (  # noqa: F401
    random_fragment_oracle_sql,
)
from ophidia_io_server_spark.sources.tables import (  # noqa: F401
    exact_cents_sum,
    fragment_cte,
    lineitem_fragment,
    lineitem_fragment_cached,
    load_table,
)

from ophidia_io_server_spark.workloads.docs import (  # noqa: F401
    _JACCARD_ORACLE,
)
from ophidia_io_server_spark.workloads.streaming import (  # noqa: F401
    _staged_events_dir,
)
from ophidia_io_server_spark.workloads.base import (  # noqa: F401
    WORKLOADS,
    Workload,
    _FRAG_BOTH_CTE,
    _FRAG_QTY_CTE,
    _corpus_tag,
    _ensure_session_defaults,
    _exploded_oracle,
    _explode_arrays,
    _server,
    session_memo,
    workload,
)


# --- round-6 TPC-H additions.  The synthetic tables are trimmed TPC-H (no
# partsupp; lineitem lacks shipmode/commitdate/receiptdate; customer lacks
# phone; part lacks container) — queries needing absent columns are adapted
# to preserve the SHAPE being exercised (the join/aggregation/subquery
# structure) on available columns, and say so in their docstrings.  Money is
# integer 1e-4 revenue units (order-free sums), the q3/q10 discipline.


@workload(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS revenue_e4
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations, by year): the
    two-sided nation-pair disjunction over a 4-table join chain with BOTH
    nation lookups broadcast; the date filter pushes to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("k1"),
                              F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("k2"),
                              F.col("n_name").alias("cust_nation")))
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                  ).cast("bigint")
    return (
        s.join(li, s["s_suppkey"] == li["l_suppkey"])
        .join(o, F.col("o_orderkey") == li["l_orderkey"])
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("k1"))
        .join(n2, F.col("c_nationkey") == F.col("k2"))
        .where(((F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2"))
               | ((F.col("supp_nation") == "NATION_2")
                  & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(rev).cast("bigint").alias("revenue_e4"))
    )


@workload(
    "tpch_q8_market_share",
    oracle="""
    WITH base AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT) AS vol_e4,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_e4 ELSE 0 END)
                AS BIGINT) AS nation_e4,
           CAST(SUM(vol_e4) AS BIGINT) AS total_e4,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_e4 ELSE 0 END)
                 / SUM(vol_e4), 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the 8-table star — part filter
    prunes lineitem first, region restricts the CUSTOMER nation while the
    share numerator classifies the SUPPLIER nation (two roles for the same
    broadcast dim), share = conditional/total on exact integer volume."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("k1"), "n_regionkey"))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("k2"),
                              F.col("n_name").alias("supp_nation")))
    vol = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                  ).cast("bigint")
    base = (
        F.broadcast(p).join(li, p["p_partkey"] == li["l_partkey"])
        .join(s, F.col("s_suppkey") == li["l_suppkey"])
        .join(o, F.col("o_orderkey") == li["l_orderkey"])
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("k1"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("k2"))
        .select(F.year("o_orderdate").cast("bigint").alias("o_year"),
                vol.alias("vol_e4"), "supp_nation")
    )
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_3",
                       F.col("vol_e4")).otherwise(0))
    return base.groupBy("o_year").agg(
        nat.cast("bigint").alias("nation_e4"),
        F.sum("vol_e4").cast("bigint").alias("total_e4"),
        F.round(nat / F.sum("vol_e4"), 6).alias("mkt_share"),
    )


@workload(
    "tpch_q12_ship_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority-class counts per shipping class; the
    synthetic lineitem has no l_shipmode/commitdate/receiptdate, so the
    class column is l_returnflag and the lateness predicate is the ship
    window): orders⋈lineitem with the date filter pushed to the lineitem
    scan and the CASE fold inside one partial+final aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(hi, 1).otherwise(0)).cast("bigint")
              .alias("high_line_count"),
             F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint")
              .alias("low_line_count"))
    )


@workload(
    "tpch_q13_order_histogram",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution; the synthetic orders
    table has no o_comment, so the comment exclusion is dropped): the
    LEFT-join-then-double-aggregate shape — zero-order customers must
    survive into the c_count = 0 bucket, which an inner join would lose."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist"))


@workload(
    "tpch_q17_small_qty_revenue",
    oracle="""
    WITH agg AS (SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_thresh
                 FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 10000) AS BIGINT))
                AS BIGINT) AS rev_e4,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 10000) AS BIGINT)) // 7
                AS BIGINT) AS avg_yearly_e4_div7,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 10000) AS BIGINT)) % 7
                AS BIGINT) AS avg_yearly_e4_rem7
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN agg ON agg.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#9' AND l.l_quantity < agg.qty_thresh
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue; the synthetic part table
    has no p_container, so the brand filter alone selects the part class):
    the correlated AVG subquery decorrelated into a per-part aggregate
    joined back — lineitem is aggregated once, not per outer row.
    ``l_quantity`` is integral-valued so the AVG is exact on both engines;
    the 0.2× threshold and the < compare reproduce bit-identically."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#9")
    agg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh"))
    rev = F.round(F.col("l_extendedprice") * 10000).cast("bigint")
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(agg, li["l_partkey"] == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
    )
    total = F.sum(rev).cast("bigint")
    # avg_yearly stays on the order-free integer grid (quotient + remainder
    # instead of ROUND(bigint/7.0, 4)): near 2^53 the double rounding of the
    # two engines can disagree by one 1e-4 unit (r6 ADVICE).
    return j.agg(
        total.alias("rev_e4"),
        F.expr(
            "CAST(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) DIV 7"
            " AS BIGINT)"
        ).alias("avg_yearly_e4_div7"),
        (total % F.lit(7)).cast("bigint").alias("avg_yearly_e4_rem7"),
    )


@workload(
    "tpch_q22_idle_customers",
    oracle="""
    WITH cut AS (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                        * 1.0 / COUNT(*) AS thresh_cents
                 FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c CROSS JOIN cut
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) > cut.thresh_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (promising idle customers; the synthetic customer
    table has no c_phone, so the country-code grouping becomes
    c_mktsegment, and "no orders" becomes "no orders since 2000" — the
    dense synthetic corpus gives every customer SOME order): scalar AVG
    subquery broadcast as a one-row cross join + LEFT ANTI join against
    the recent-orders projection (the NOT EXISTS).  The threshold AND the
    compare run in exact integer cents — AVG over raw 2-decimal doubles
    is the order-dependent drift class the q1 10× fix eliminated, and a
    customer on the boundary must not flip between engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    cut = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(cents) * 1.0 / F.count(F.lit(1))).alias("thresh_cents"))
    return (
        c.crossJoin(F.broadcast(cut))
        .where(cents > F.col("thresh_cents"))
        .join(o.where(F.col("o_orderdate") >= "2000-01-01")
               .select(F.col("o_custkey").alias("c_custkey")).distinct(),
              on="c_custkey", how="left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numcust"),
             F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
              .cast("bigint").alias("totacctbal_cents"))
    )


@workload(
    "dedup_minhash_incremental",
    oracle=f"""
    SELECT * FROM ({_JACCARD_ORACLE})
    WHERE doc_a % 2 = 1 OR doc_b % 2 = 1
    """,
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash+LSH for continuous ingestion
    (``pipeline/dedup.py::minhash_lsh_pairs_incremental``): odd doc_ids
    arrive as the 'new' batch and are deduped against the even-id
    'existing' corpus with a new-bands ⋈ all-bands probe join — never the
    corpus self-join.  The oracle is the exact all-pairs Jaccard SQL
    restricted to pairs touching a new doc, so the hash proves the
    incremental path emits exactly the full run's pairs for the arriving
    batch."""
    from ophidia_io_server_spark.pipeline.dedup import minhash_lsh_pairs_incremental

    docs = load_table(spark, sf_dir, "documents")
    # same memo key as the other dedup rows: even ∪ odd is row-identical to
    # the full table, so the shared shingle cache serves this row too
    return minhash_lsh_pairs_incremental(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        memo_key=(*session_key(spark), sf_dir),
    )


@workload(
    "doc_shard_balanced",
    oracle="""
    WITH t AS (SELECT doc_id,
                      CAST(len(list_filter(string_split(text, ' '),
                                           x -> x <> '')) AS BIGINT) AS n
               FROM documents WHERE text IS NOT NULL),
    r AS (SELECT doc_id, n,
                 row_number() OVER (ORDER BY n DESC, doc_id) AS rn
          FROM t),
    g AS (SELECT CAST((rn - 1) % 16 AS BIGINT) AS shard,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n) AS BIGINT) AS shard_tokens
          FROM r GROUP BY shard),
    b AS (SELECT (MAX(shard_tokens) - MIN(shard_tokens)
                  <= (SELECT MAX(n) FROM t)) AS balance_ok FROM g)
    SELECT g.shard, g.n_docs, g.shard_tokens, b.balance_ok FROM g, b
    """,
)
def doc_shard_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-shard plan
    (``pipeline/packing.py::shard_balanced``): documents ranked by
    (tokens DESC, doc_id) with the distributed two-phase rank — never a
    single-partition window — then round-robin over the size-sorted
    order.  The row output is the per-shard plan (16 shards: doc count +
    token total) plus ``balance_ok``, the operator's PROVABLE guarantee
    bound: max − min shard tokens ≤ the single largest document
    (telescoping over round-robin rounds), for any token distribution.
    The oracle replays the identical rank-and-mod plan and asserts the
    same bound — this is the shard-writer planning step of a training
    pipeline, where imbalance directly serializes epoch tails."""
    from ophidia_io_server_spark.pipeline.packing import shard_balanced
    from ophidia_io_server_spark.pipeline.text import tokens_col
    from ophidia_io_server_spark.sources.tables import spread

    docs = (spread(load_table(spark, sf_dir, "documents"))
            .where(F.col("text").isNotNull())
            .select("doc_id",
                    F.size(tokens_col(F.col("text"))).cast("bigint")
                    .alias("n_tokens")))
    # doc_id is the documents PRIMARY KEY — skip the uniqueness scan the
    # generic entry point runs by default (it would re-execute the
    # token-count projection once more per bench pass; the validation
    # path itself is pinned by tests/test_round9_fixes.py)
    sh = shard_balanced(docs, n_shards=16, validate_unique=False)
    g = (sh.groupBy("shard")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
              F.sum("n_tokens").cast("bigint").alias("shard_tokens")))
    b = (g.agg((F.max("shard_tokens") - F.min("shard_tokens")).alias("_d"))
         .crossJoin(docs.agg(F.max("n_tokens").alias("_mx")))
         .select((F.col("_d") <= F.col("_mx")).alias("balance_ok")))
    return g.crossJoin(F.broadcast(b))


@workload(
    "doc_pack_sequences",
    oracle="""
    WITH t AS (SELECT doc_id,
                      CAST(len(list_filter(string_split(text, ' '),
                                           x -> x <> '')) AS BIGINT)
                        AS n_tokens
               FROM documents WHERE text IS NOT NULL),
    s AS (SELECT doc_id, n_tokens, doc_id % 8 AS pack_shard,
                 SUM(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
                   - n_tokens AS strt
          FROM t)
    SELECT doc_id, n_tokens, CAST(pack_shard AS BIGINT) AS pack_shard,
           CAST(strt // 512 AS BIGINT) AS seq_in_shard,
           CAST(strt % 512 AS BIGINT) AS seq_offset,
           TRUE AS ff_fill_ok, TRUE AS ff_not_worse_than_next_fit,
           TRUE AS ff_exactly_once
    FROM s
    """,
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (``pipeline/packing.py``), the r5
    candidate gate row.  The hashed rows are the GPT-style concat-then-
    chunk arm with plain-arithmetic sharding (``doc_id % 8``, budget 512)
    — chunk index and in-chunk offset per document are exact window
    arithmetic the SQL mirror reproduces bitwise.  The three booleans
    bind the NO-SPLIT first-fit arm's contracts, which a sequential
    packing discipline cannot express in SQL: ``ff_fill_ok`` — no
    non-oversize sequence exceeds the budget and every oversize doc sits
    alone in its flagged sequence; ``ff_not_worse_than_next_fit`` —
    first-fit opens no more sequences than next-fit in EVERY bucket (the
    algebraic relation that distinguishes the disciplines);
    ``ff_exactly_once`` — every document lands in exactly one sequence.
    Shard identity is (bucket, seq_in_bucket) derived from row keys only
    — stable under repartitioning and retries (the 100 TB property)."""
    from ophidia_io_server_spark.pipeline.packing import (
        pack_concat_chunks,
        pack_first_fit,
        pack_next_fit,
    )
    from ophidia_io_server_spark.pipeline.text import tokens_col

    docs = (load_table(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select("doc_id",
                    F.size(tokens_col(F.col("text"))).cast("bigint")
                    .alias("n_tokens")))
    budget = 512
    concat = pack_concat_chunks(
        docs, budget, n_shards=8, shard_expr=F.col("doc_id") % 8)
    ff = pack_first_fit(docs, budget, n_buckets=16).localCheckpoint()
    nf = pack_next_fit(docs, budget, n_buckets=16)
    fill_bad = ff.where(
        (~F.col("oversize") & (F.col("seq_fill") + F.col("n_tokens")
                               > budget))
        | (F.col("oversize") & (F.col("seq_fill") != 0))).count()
    seqs = lambda d: (d.groupBy("pack_bucket")  # noqa: E731
                      .agg((F.max("seq_in_bucket") + 1).alias("ns")))
    worse = (seqs(ff).withColumnRenamed("ns", "ff_ns")
             .join(seqs(nf).withColumnRenamed("ns", "nf_ns"), "pack_bucket")
             .where(F.col("ff_ns") > F.col("nf_ns")).count())
    once = bool(ff.count() == docs.count()
                and ff.select("doc_id").distinct().count() == docs.count())
    return concat.select(
        "doc_id", "n_tokens", "pack_shard", "seq_in_shard", "seq_offset",
        F.lit(fill_bad == 0).alias("ff_fill_ok"),
        F.lit(worse == 0).alias("ff_not_worse_than_next_fit"),
        F.lit(once).alias("ff_exactly_once"),
    )


@workload(
    "stream_minhash_incremental",
    oracle=f"""
    SELECT doc_a, doc_b, jaccard, TRUE AS stream_equals_batch
    FROM ({_JACCARD_ORACLE})
    """,
)
def stream_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental MinHash+LSH
    (``streaming/ingest.py::minhash_lsh_stream``): the documents table
    re-ingested as a one-file-per-trigger parquet stream; each micro-batch
    shingles+signs only the arriving docs and probes their band rows
    against the PERSISTED corpus band index (the state a production
    pipeline keeps between ingestion runs), exact-verifying candidates
    before emission.  The oracle is the exact all-pairs Jaccard SQL —
    the full corpus pair set — so the hash proves the drained stream
    emitted EXACTLY the one-shot run's pairs; ``stream_equals_batch``
    additionally pins set-equality with the batch ``minhash_lsh_pairs``
    plan (banding is per-doc deterministic, so pair candidacy is
    batch-arrival invariant)."""
    import os

    from ophidia_io_server_spark.pipeline.dedup import minhash_lsh_pairs
    from ophidia_io_server_spark.streaming.ingest import minhash_lsh_stream

    docs = load_table(spark, sf_dir, "documents")
    tag = _corpus_tag(sf_dir, "documents", salt="mhstream2")
    path = f"/tmp/ophidia_stream_mh_{tag}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        # 2 files → 2 micro-batches (r14, verdict item 2; was 4): batch 1
        # exercises the new↔new candidate class, batch 2 the old↔new
        # state-carry class against batch 1's persisted band index — both
        # multi-batch classes stay covered while two whole micro-batches
        # of per-batch machinery leave the drain; pair emission is
        # batch-arrival invariant (banding is per-doc deterministic), so
        # the oracle is unaffected — probed bitwise-identical across
        # 4/2/1-file stagings AND against the one-shot batch plan at
        # sf0.01 (scripts/r14_stream_batchcount_probe.py)
        docs.select("doc_id", "text").repartition(2).write.mode(
            "overwrite").parquet(path)
        open(f"{path}/_SUCCESS", "a").close()
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(path))
    streamed = minhash_lsh_stream(stream)

    def _certify() -> bool:
        batch = minhash_lsh_pairs(docs.select("doc_id", "text"),
                                  memo_key=(*session_key(spark), sf_dir))
        return bool(streamed.exceptAll(batch).count() == 0
                    and batch.exceptAll(streamed).count() == 0)

    # the certificate is call-invariant within a session (staged input +
    # deterministic banding), so it is session-memoized: the gate's fresh
    # session computes it honestly once, bench passes stop re-paying the
    # two exceptAll exchanges (r8 verdict #2)
    eq = session_memo(spark, ("mh_stream_eq", sf_dir), _certify)
    return streamed.withColumn("stream_equals_batch", F.lit(eq))


@workload(
    "doc_suffix_array_invariants",
    oracle="""
    SELECT CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
                AS BIGINT) AS n_positions,
           TRUE AS dense_ok, TRUE AS order_ok, TRUE AS shared_rank_ok
    FROM documents WHERE text IS NOT NULL
    """,
)
def doc_suffix_array_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Manber-Myers suffix array
    (``pipeline/dedup.py::suffix_array_ranks`` over
    ``operators/ranking.py::global_dense_rank``) verified by invariant
    booleans the hash binds: ``dense_ok`` — ranks are a dense 1..K
    sequence; ``order_ok`` — for EVERY pair of consecutive ranks the
    representative suffixes compare ascending under token-array
    lexicographic order on a bounded 256-token prefix plus the true
    suffix length (r6 ADVICE: materializing whole suffixes is
    O(Σ len²) tokens shuffled — quadratic in document length at the
    10×/100× mirrors).  The bounded check is exact whenever either
    suffix fits in the window: equal prefixes with
    ``len_next <= len`` and ``least(len, len_next) <= 256`` is a
    provable order violation (a fully-visible suffix must be a PROPER
    prefix of its successor); only the both-longer-than-256 tie is
    indeterminate and accepted.  ``shared_rank_ok`` — positions sharing
    a rank agree on (prefix-256, suffix length).  Full-array exactness
    stays pinned by the Python differential in
    tests/test_dedup_varlen.py."""
    from ophidia_io_server_spark.pipeline.dedup import suffix_array_ranks
    from ophidia_io_server_spark.pipeline.text import tokens_col
    from ophidia_io_server_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    sa = suffix_array_ranks(docs)
    toks = (
        spread(docs).where(F.col("text").isNotNull())
        .select("doc_id", tokens_col(F.col("text")).alias("ws"))
        .where(F.size("ws") >= 1)
    )
    P = 256
    suf = (
        sa.join(toks, on="doc_id")
        .select("doc_id", "pos", "rank",
                F.slice("ws", F.col("pos").cast("int"), P).alias("pref"),
                (F.size("ws") - F.col("pos") + 1).cast("bigint").alias("slen"))
    )
    n_positions = suf.count()
    agg = sa.agg(F.max("rank").alias("mx"),
                 F.min("rank").alias("mn"),
                 F.countDistinct("rank").alias("nd")).collect()[0]
    dense_ok = bool(agg["mn"] == 1 and agg["mx"] == agg["nd"])
    reps = suf.groupBy("rank").agg(
        F.min_by(F.struct("pref", "slen"), F.struct("doc_id", "pos"))
         .alias("rep"),
        F.countDistinct(F.struct("pref", "slen")).alias("n_forms"),
    )
    shared_rank_ok = bool(
        reps.agg(F.max("n_forms")).collect()[0][0] == 1)
    nxt = reps.select((F.col("rank") - 1).alias("rank"),
                      F.col("rep").alias("rep_next"))
    violated = (
        (F.col("rep.pref") > F.col("rep_next.pref"))
        | ((F.col("rep.pref") == F.col("rep_next.pref"))
           & (F.col("rep_next.slen") <= F.col("rep.slen"))
           & (F.least("rep.slen", "rep_next.slen") <= F.lit(P)))
    )
    order_ok = bool(
        reps.join(nxt, on="rank").where(violated).count() == 0)
    return spark.createDataFrame(
        [(int(n_positions), dense_ok, order_ok, shared_rank_ok)],
        "n_positions long, dense_ok boolean, order_ok boolean, "
        "shared_rank_ok boolean")


@workload(
    "sample_bottom_k",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(LEAST(20, COUNT(*)) AS BIGINT) AS n_selected,
           TRUE AS exact_size_ok, TRUE AS is_bottom_k_ok,
           TRUE AS layout_invariant_ok
    FROM documents GROUP BY lang
    """,
)
def sample_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k deterministic sampling (``pipeline/sampling.py::
    bottom_k_sample``: the k smallest (seed, key) hashes per stratum — the
    distributed reservoir-sample replacement).  The hash order is not
    SQL-expressible, so the gate binds invariant booleans: per-language
    exact sample size min(k, n); ``is_bottom_k_ok`` proves the selection
    IS the bottom of the hash order (max selected hash < min unselected
    hash per stratum); ``layout_invariant_ok`` proves the same rows come
    back from a repartitioned+reversed input."""
    from ophidia_io_server_spark.pipeline.sampling import bottom_k_sample

    docs = load_table(spark, sf_dir, "documents")
    k, seed = 20, 7
    sel = bottom_k_sample(docs, k, key_col="doc_id", seed=seed,
                          strata_col="lang").select("lang", "doc_id")
    h = F.xxhash64(F.lit(seed), F.col("doc_id"))
    tagged = (
        docs.select("lang", "doc_id", h.alias("_h"))
        .join(sel.select("doc_id", F.lit(True).alias("_in")), "doc_id", "left")
    )
    per = tagged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("_in").cast("int")).cast("bigint").alias("n_selected"),
        F.max(F.when(F.col("_in"), F.col("_h"))).alias("_max_in"),
        F.min(F.when(F.col("_in").isNull(), F.col("_h"))).alias("_min_out"),
    )
    sel2 = bottom_k_sample(
        docs.repartition(7, "doc_id").orderBy(F.col("doc_id").desc()),
        k, key_col="doc_id", seed=seed, strata_col="lang",
    ).select("lang", "doc_id")
    layout_ok = bool(sel.exceptAll(sel2).count() == 0
                     and sel2.exceptAll(sel).count() == 0)
    return per.select(
        "lang", "n_docs", "n_selected",
        (F.col("n_selected") == F.least(F.lit(k).cast("bigint"),
                                        F.col("n_docs"))).alias("exact_size_ok"),
        (F.col("_min_out").isNull()
         | (F.col("_max_in") < F.col("_min_out"))).alias("is_bottom_k_ok"),
        F.lit(layout_ok).alias("layout_invariant_ok"),
    )


@workload(
    "ann_opq_invariants",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           TRUE AS rotation_orthogonal_ok, TRUE AS l2_topk_set_invariant_ok,
           TRUE AS recon_not_worse_ok, TRUE AS recall_ok
    FROM embeddings
    """,
)
def ann_opq_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ (Ge et al. 2013 learned rotation + PQ) verified by the
    invariant-boolean pattern.  The rotation-invariance parity argument
    that admits OPQ to the gate: (a) ``RᵀR = I`` to 1e-9 (Procrustes SVD
    returns an exact orthogonal matrix up to float error), therefore (b)
    exact L2 top-k in the ROTATED space is rank-for-rank identical to
    raw-space top-k — checked distributed, not assumed — so OPQ changes
    only quantization error, never the geometry being searched; (c) the
    corpus mean reconstruction error of the rotated codec is ≤ plain PQ's
    at the same (m, ncent) budget within 1e-9 (the OPQ objective; strict
    improvement on correlated data is pytest-pinned); (d) OPQ-ADC
    recall@5 vs exact L2 clears the same 0.2 floor as the plain-PQ row.
    Everything deterministic (fixed sample order/init/iterations)."""
    import numpy as np

    from ophidia_io_server_spark.pipeline.pq import (
        exact_l2_topk,
        opq_rotate,
        opq_topk,
        pq_reconstruction_error,
        train_opq,
        train_pq,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    R, obooks = train_opq(emb, m=16, ncent=16, sample=4096,
                          iters_pq=10, iters_opq=6)
    rot_ok = bool(np.abs(R.T @ R - np.eye(R.shape[0])).max() < 1e-9)

    exact_raw = exact_l2_topk(emb, F.col("vec_id") < 10, k=5)
    exact_rot = exact_l2_topk(opq_rotate(emb, R), F.col("vec_id") < 10, k=5)
    # Neighbor SETS per query, not (query, rank, neighbor) triples: an
    # orthogonal rotation preserves distances only up to float error, so
    # two neighbors closer than that error may legally swap ranks (r6
    # ADVICE) — set equality is the rotation-invariance claim that is
    # actually guaranteed.
    pairs_raw = exact_raw.select("query_id", "neighbor_id")
    pairs_rot = exact_rot.select("query_id", "neighbor_id")
    l2_ok = bool(
        pairs_raw.exceptAll(pairs_rot).count() == 0
        and pairs_rot.exceptAll(pairs_raw).count() == 0)

    pbooks = train_pq(emb, m=16, ncent=16, sample=4096, iters=10)
    mse_p = pq_reconstruction_error(emb, pbooks).collect()[0]
    mse_o = pq_reconstruction_error(emb, obooks, R=R).collect()[0]
    recon_ok = bool(mse_o["mse"] <= mse_p["mse"] + 1e-9)

    opq = opq_topk(emb, F.col("vec_id") < 10, R, obooks, k=5)
    hits = opq.select("query_id", "neighbor_id").intersect(
        exact_raw.select("query_id", "neighbor_id")).count()
    total = exact_raw.count()
    recall_ok = bool(total > 0 and hits / total >= 0.2)
    return spark.createDataFrame(
        [(int(mse_p["n_vectors"]), rot_ok, l2_ok, recon_ok, recall_ok)],
        "n_vectors long, rotation_orthogonal_ok boolean, "
        "l2_topk_set_invariant_ok boolean, recon_not_worse_ok boolean, "
        "recall_ok boolean")


@workload(
    "doc_longest_dup_match",
    oracle="""
    WITH tok AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                            x -> x <> '') AS tk
                 FROM documents WHERE text IS NOT NULL),
    tt AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
           FROM tok WHERE len(tk) >= 1),
    sub AS MATERIALIZED (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, CAST(l AS BIGINT) AS len,
             md5(array_to_string(tk[i:i + l - 1], chr(31))) AS h
      FROM (SELECT doc_id, tk, n, unnest(range(1, n + 1)) AS i FROM tt),
           unnest(range(1, 129)) AS ls(l)
      WHERE i + l - 1 <= n),
    dup AS (SELECT len, h FROM sub GROUP BY len, h HAVING COUNT(*) >= 2),
    j AS (SELECT s.doc_id, s.pos, s.len FROM sub s JOIN dup USING (len, h)),
    per AS (SELECT doc_id, CAST(MAX(len) AS BIGINT) AS max_dup_len,
                   CAST(COUNT(DISTINCT CASE WHEN len >= 8 THEN pos END)
                        AS BIGINT) AS n_dup_starts
            FROM j GROUP BY doc_id)
    SELECT per.doc_id, tt.n AS n_tokens, per.max_dup_len, per.n_dup_starts,
           per.max_dup_len >= 128 AS capped
    FROM per JOIN tt USING (doc_id)
    WHERE per.max_dup_len >= 8
    """,
)
def doc_longest_dup_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length ExactSubstr report: per document the LONGEST token
    substring occurring at ≥2 (doc, pos) sites corpus-wide
    (``pipeline/dedup.py::longest_duplicate_match`` — suffix order via one
    range-partitioned sort of per-position hash keys, neighbor LCP by
    column math; Lee et al. 2022's suffix-array answer without the suffix
    array).  The oracle is the O(n·maxlen) brute force: every substring
    hashed, duplicated (len, hash) classes joined back.  Differential vs a
    Python suffix automaton + the fixed-window coverage-equivalence
    invariant in tests/test_dedup_varlen.py."""
    from ophidia_io_server_spark.pipeline.dedup import longest_duplicate_match

    docs = load_table(spark, sf_dir, "documents")
    return longest_duplicate_match(docs, min_len=8, max_match=128)


@workload(
    "doc_varlen_sa_report",
    oracle="""
    WITH tok AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                            x -> x <> '') AS tk
                 FROM documents WHERE text IS NOT NULL),
    tt AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
           FROM tok WHERE len(tk) >= 1),
    sub AS MATERIALIZED (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, CAST(l AS BIGINT) AS len,
             md5(array_to_string(tk[i:i + l - 1], chr(31))) AS h
      FROM (SELECT doc_id, tk, n, unnest(range(1, n + 1)) AS i FROM tt) t,
           unnest(range(1, t.n - t.i + 2)) AS ls(l)),
    dup AS (SELECT len, h FROM sub GROUP BY len, h HAVING COUNT(*) >= 2),
    j AS (SELECT s.doc_id, s.pos, s.len FROM sub s JOIN dup USING (len, h)),
    per AS (SELECT doc_id, CAST(MAX(len) AS BIGINT) AS max_dup_len,
                   CAST(COUNT(DISTINCT CASE WHEN len >= 8 THEN pos END)
                        AS BIGINT) AS n_dup_starts
            FROM j GROUP BY doc_id)
    SELECT per.doc_id, tt.n AS n_tokens, per.max_dup_len, per.n_dup_starts
    FROM per JOIN tt USING (doc_id)
    WHERE per.max_dup_len >= 8
    """,
)
def doc_varlen_sa_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNCAPPED variable-length ExactSubstr report from the distributed
    suffix array (``pipeline/dedup.py::longest_match_report_sa``): exact
    neighbor LCPs via greedy binary descent over the Manber-Myers doubling
    rounds — log-rounds of constant-width equi-joins, no ×max_match
    sort-key payload (the r6 verdict's rebase of
    ``doc_longest_dup_match``).  The oracle is the fully UNCAPPED brute
    force: every substring of every length hashed (lateral
    per-position length range), duplicated (len, hash) classes joined
    back.  Differential vs the suffix-automaton reference + row-identity
    with the capped path below its cap in tests/test_dedup_varlen.py."""
    from ophidia_io_server_spark.pipeline.dedup import longest_match_report_sa

    docs = load_table(spark, sf_dir, "documents")
    # memo_key shares ONE suffix-array per-position table with
    # doc_varlen_cut (r7 verdict #1: it was built twice per gate/bench run)
    return longest_match_report_sa(
        docs, min_len=8, memo_key=(*session_key(spark), sf_dir))


@workload(
    "doc_varlen_cut",
    oracle="""
    WITH tok AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                            x -> x <> '') AS tk
                 FROM documents WHERE text IS NOT NULL),
    tt AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
           FROM tok WHERE len(tk) >= 1),
    win AS MATERIALIZED (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             md5(array_to_string(tk[i:i + 7], chr(31))) AS h
      FROM (SELECT doc_id, tk, n, unnest(range(1, n - 8 + 2)) AS i
            FROM tt WHERE n >= 8)),
    dup AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) >= 2),
    cov AS (SELECT DISTINCT w.doc_id, c.p
            FROM win w JOIN dup USING (h),
                 unnest(range(w.pos, w.pos + 8)) AS c(p)),
    posl AS (SELECT doc_id, tk, n, unnest(range(1, n + 1)) AS p FROM tt),
    kept AS (SELECT pl.doc_id,
                    COALESCE(string_agg(CASE WHEN cov.p IS NULL
                                             THEN pl.tk[pl.p] END,
                                        ' ' ORDER BY pl.p), '')
                      AS text_cleaned,
                    CAST(COUNT(cov.p) AS BIGINT) AS n_removed
             FROM posl pl LEFT JOIN cov
               ON cov.doc_id = pl.doc_id AND cov.p = pl.p
             GROUP BY pl.doc_id)
    SELECT k.doc_id, k.text_cleaned, tt.n AS n_tokens, k.n_removed
    FROM kept k JOIN tt USING (doc_id)
    """,
)
def doc_varlen_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length ExactSubstr CUT (Lee et al. 2022: remove every
    position inside a maximal duplicated run of TRUE length ≥ 8 tokens)
    via ``pipeline/dedup.py::remove_duplicate_spans_varlen`` — per-position
    longest-match lengths from the suffix array, then one per-doc
    running-max reach window.  The oracle exploits the coverage-
    equivalence theorem (positions inside a length-≥T duplicate ≡
    positions inside a duplicated T-window, documented at
    ``remove_duplicate_spans``): it computes fixed-8-window coverage and
    rebuilds the kept text — so the hash binds the theorem itself, plus
    the cut differential in tests/test_dedup_varlen.py."""
    from ophidia_io_server_spark.pipeline.dedup import (
        remove_duplicate_spans_varlen,
    )

    docs = (load_table(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull()))
    docs = docs.where(
        F.size(F.filter(F.split("text", " "), lambda x: x != "")) >= 1)
    # same memo key as doc_varlen_sa_report: sa_position_lengths filters
    # NULL/empty internally, so the shared table is identical either way
    return remove_duplicate_spans_varlen(
        docs, min_len=8, memo_key=(*session_key(spark), sf_dir))


@workload(
    "token_countmin_freq",
    oracle="""
    WITH t AS (
      SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS item
      FROM documents WHERE text IS NOT NULL)
    SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, item) AS BIGINT)
             AS rank,
           TRUE AS est_ge_exact_ok, TRUE AS est_within_bound_ok
    FROM t GROUP BY item
    ORDER BY cnt DESC, item LIMIT 15
    """,
)
def token_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation
    (``pipeline/heavy.py::countmin_build/countmin_estimate``, Cormode &
    Muthukrishnan 2005): the corpus token stream folded into a
    depth·width counter table (d=5, w=2048 — constant-size regardless of
    corpus), then the exact top-15 tokens point-estimated from the sketch
    alone.  Certificates carried per row: ``est_ge_exact_ok`` (the CMS
    one-sided guarantee, est ≥ true count, holds unconditionally) and
    ``est_within_bound_ok`` (est ≤ true + ⌊10·N/w⌋; a single counter row
    exceeds 10·N/w overshoot with probability ≤ 1/10 by Markov, the min
    over 5 independent rows with probability ≤ 1e-5 — verified green at
    sf0.001/sf0.01/sf0.1).  The oracle is the exact top-15 with both
    certificates asserted; the sketch is deterministic (xxhash64, fixed
    seed) so the row is reproducible bit-for-bit."""
    from ophidia_io_server_spark.pipeline.heavy import (
        countmin_build,
        countmin_estimate,
        heavy_hitters,
    )
    from ophidia_io_server_spark.pipeline.text import tokens_col
    from ophidia_io_server_spark.sources.tables import spread

    from ophidia_io_server_spark.pin import pinned

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.where(F.col("text").isNotNull()).select(
        F.explode(tokens_col(F.col("text"))).alias("tok"))
    depth, width = 5, 2048
    # r13 opt: ONE vocabulary count pass feeds the (weighted) sketch
    # build, the MG verify phase and the N reader — before, the corpus
    # token stream was exploded three times (sketch build ×d, MG pass,
    # exact-count groupBy).  Counters/counts are bitwise identical
    # (same sums grouped by token first); only the MG candidate pass
    # still reads the raw stream, as the algorithm requires.
    vocab = pinned(
        toks.groupBy(F.col("tok").alias("item"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")),
        "token vocab counts: weighted CMS build + MG verify + N")
    sketch = countmin_build(vocab.select(F.col("item").alias("tok"), "cnt"),
                            "tok", depth=depth, width=width, seed=7,
                            weight_col="cnt")
    top = heavy_hitters(toks, "tok", k=64, top_n=15, counts=vocab)
    est = countmin_estimate(sketch, top.select(F.col("item").alias("tok")),
                            "tok", depth=depth, width=width, seed=7)
    # N from the sketch itself (row 0's counters sum to the stream length)
    # as a single-row scalar broadcast — no extra corpus pass.
    n_total = (sketch.where(F.col("r") == 0)
               .agg(F.sum("cnt").cast("bigint").alias("n_total")))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("item").asc())
    return (
        top.join(est, on="item")
        .crossJoin(F.broadcast(n_total))
        .select(
            "item", "cnt",
            F.row_number().over(w).cast("bigint").alias("rank"),
            (F.col("est") >= F.col("cnt")).alias("est_ge_exact_ok"),
            (F.col("est") <= F.col("cnt")
             + F.expr(f"10 * n_total div {width}")).alias("est_within_bound_ok"),
        )
    )


@workload(
    "orders_join_size_estimate",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM orders o
                 JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
                AS BIGINT) AS exact_rows,
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey IS NOT NULL)
                AS BIGINT) AS n_orders,
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL)
                AS BIGINT) AS n_lineitem,
           TRUE AS est_ge_exact_ok, TRUE AS est_within_bound_ok
    """,
)
def orders_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from Count-Min sketches
    (``pipeline/heavy.py::countmin_inner_product``) — the
    optimizer-statistics primitive: |orders ⋈ lineitem| estimated from
    two d·w counter tables (one single-pass build per side, d=5,
    w=65536), never from a sampling re-scan of either input.  At 100 TB
    this is how an engine prices a join (broadcast vs shuffle, blow-up
    detection) before running it; sketches are mergeable across shards so
    per-partition statistics sum into table statistics.

    Certificates (same discipline as ``token_countmin_freq``):
    ``est_ge_exact_ok`` — the inner-product estimate over-counts
    unconditionally (collision cross-terms are non-negative);
    ``est_within_bound_ok`` — est ≤ exact + 10·N_A·N_B/w (a single
    counter row's collision mass exceeds that with probability ≤ 1/10 by
    Markov, the min over 5 independent rows with probability ≤ 1e-5).
    The oracle carries the exact join size and asserts both booleans."""
    from ophidia_io_server_spark.pipeline.heavy import (
        countmin_build,
        countmin_inner_product,
    )

    from ophidia_io_server_spark.pin import pinned

    depth, width = 5, 65536
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderkey").isNotNull())
         .select(F.col("o_orderkey").alias("k")))
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_orderkey").isNotNull())
          .select(F.col("l_orderkey").alias("k")))
    # r13 opt (three structural cuts, bitwise-identical outputs):
    # 1. the lineitem side pre-aggregates to its distinct-key count table
    #    (pinned: it feeds the weighted sketch build, the exact join and
    #    n_lineitem) — the CMS posexplode hashes |keys|·d rows instead of
    #    |rows|·d, and counters are the same sums grouped by key first;
    # 2. the exact join size is Σ_k cnt_li(k)·cnt_o(k) over the two
    #    distinct-key count tables (the textbook equi-join-size identity,
    #    no uniqueness assumption) — the row-level orders⋈lineitem
    #    shuffle join is gone;
    # 3. n_orders/n_lineitem come from the same subplans that already
    #    scan each side (count aggregates fused by AQE stage reuse is NOT
    #    relied on: n_lineitem reads the pinned counts, n_orders rides
    #    the ska build input once via a pinned key projection).
    # r13 wave 5: the two pins read DIFFERENT tables (no shared lazy
    # lineage), so their materialization jobs overlap on a thread pool
    # (guide §2.6) instead of running back-to-back.
    from ophidia_io_server_spark.pin import pinned_parallel
    lc, ok = pinned_parallel(
        (li.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("c")),
         "join-size lineitem key counts: weighted CMS build + "
         "exact join + n_lineitem"),
        (o, "join-size orders keys: CMS build + exact semi-join + "
            "n_orders"))
    ska = countmin_build(ok, "k", depth=depth, width=width, seed=11)
    skb = countmin_build(lc, "k", depth=depth, width=width, seed=11,
                         weight_col="c")
    est = countmin_inner_product(ska, skb)
    oc = ok.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("co"))
    exact = (lc.join(oc, on="k")
             .agg(F.sum(F.col("c") * F.col("co")).cast("bigint")
                  .alias("exact_rows")))
    na = ok.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    nb = lc.agg(F.sum("c").cast("bigint").alias("n_lineitem"))
    return (
        exact.crossJoin(F.broadcast(na)).crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(est))
        .select(
            "exact_rows", "n_orders", "n_lineitem",
            (F.col("est") >= F.col("exact_rows")).alias("est_ge_exact_ok"),
            (F.col("est") <= F.col("exact_rows")
             + F.expr(f"10 * n_orders * n_lineitem div {width}"))
             .alias("est_within_bound_ok"),
        )
    )


@workload(
    "lineitem_price_histogram",
    oracle="""
    WITH b AS (
      SELECT l_extendedprice AS v,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                l_linenumber) AS rn,
             COUNT(*) OVER () AS n
      FROM lineitem WHERE l_extendedprice IS NOT NULL),
    g AS (SELECT CAST(((rn - 1) * 8) // n AS BIGINT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 MIN(v) AS lo, MAX(v) AS hi
          FROM b GROUP BY bucket),
    d AS (SELECT (MAX(n_rows) - MIN(n_rows) <= 1) AS depth_ok FROM g)
    SELECT g.bucket, g.n_rows, g.lo, g.hi, d.depth_ok FROM g, d
    """,
)
def lineitem_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT equi-depth histogram over l_extendedprice
    (``pipeline/quantile.py::equi_depth_histogram``): rows ranked by
    (value, orderkey, linenumber) with the distributed two-phase rank,
    bucket = ((rank−1)·8) DIV n.  Output is the 8-bucket boundary table a
    range-predicate selectivity estimator reads (lo/hi per bucket) plus
    ``depth_ok`` — the defining equi-depth certificate that per-bucket
    counts differ by at most 1, for any value distribution.  Completes
    the optimizer-statistics family: CMS frequencies + inner-product join
    sizes, bottom-k quantiles, HLL distincts, equi-depth histograms."""
    from ophidia_io_server_spark.pipeline.quantile import (
        equi_depth_histogram,
    )

    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_extendedprice").isNotNull()))
    g = equi_depth_histogram(li, "l_extendedprice",
                             ["l_orderkey", "l_linenumber"], bins=8)
    d = g.agg((F.max("n_rows") - F.min("n_rows") <= 1).alias("depth_ok"))
    return g.crossJoin(F.broadcast(d))


@workload(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH l AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'),
    per_os AS (
      SELECT l_orderkey, l_suppkey,
             CAST(SUM(late) AS BIGINT) AS n_late,
             MAX(late) AS any_late
      FROM l GROUP BY 1, 2),
    per_o AS (
      SELECT l_orderkey, COUNT(*) AS n_supp,
             SUM(any_late) AS n_late_supp
      FROM per_os GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(SUM(po.n_late) AS BIGINT) AS numwait
    FROM per_os po
    JOIN per_o t ON t.l_orderkey = po.l_orderkey
    JOIN supplier s ON s.s_suppkey = po.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE po.any_late = 1 AND t.n_supp > 1 AND t.n_late_supp = 1
    GROUP BY 1, 2, 3
    ORDER BY numwait DESC, s.s_suppkey LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) adapted to the
    trimmed schema: no l_commitdate/l_receiptdate, so "late" :=
    l_shipdate > o_orderdate + 60 days (ship lag), on finalized ('F')
    orders.  The reference formulation is a correlated EXISTS + NOT
    EXISTS double self-join on lineitem; here both subqueries collapse
    into ONE aggregation ladder — per-(order, supplier) late flags, then
    per-order supplier/late-supplier counts — so lineitem is shuffled
    once on orderkey instead of three times (the aggregate-instead-of-
    correlated-subquery rewrite Catalyst cannot do on its own).  A
    supplier's late lines count exactly when the order has >1 supplier
    and that supplier is the ONLY late one.  Supplier and nation are
    broadcast; top-100 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F")
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).cast("int")
    per_os = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("late").cast("bigint").alias("n_late"),
             F.max("late").alias("any_late"))
    )
    per_o = (
        per_os.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"),
             F.sum("any_late").alias("n_late_supp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        per_os.join(per_o, on="l_orderkey")
        .where((F.col("any_late") == 1) & (F.col("n_supp") > 1)
               & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.sum("n_late").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey"))
        .limit(100)
    )


@workload(
    "tpch_q9_profit_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                         AS BIGINT)
                    - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT) * 60) AS BIGINT)
             AS profit_e4
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit by nation and year) adapted to the
    trimmed schema: no partsupp, so supply cost := 60% of the part's
    retail price per unit (ps_supplycost's role in the profit formula,
    kept on the exact integer grid — retail cents × integral quantity
    × 60 is e4 units with zero rounding).  The widest join chain in the
    suite: lineitem × part × supplier × orders × nation, with the
    p_name filter pushed into the part scan so the part-side broadcast
    prunes lineitem FIRST (the selective dimension leads); supplier and
    nation broadcast; profit summed as exact e4 integers."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    rev_e4 = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                     * 10000).cast("bigint")
    cost_e4 = (F.round(F.col("p_retailprice") * 100).cast("bigint")
               * F.col("l_quantity").cast("bigint") * 60)
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(rev_e4 - cost_e4).cast("bigint").alias("profit_e4"))
    )


@workload(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH assoc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT a.l_partkey, s.s_suppkey, s.s_name, n.n_name,
             CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents
      FROM assoc a
      JOIN supplier s ON s.s_suppkey = a.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'),
    best AS (SELECT l_partkey, MIN(acctbal_cents) AS min_cents
             FROM cand GROUP BY 1)
    SELECT c.acctbal_cents, c.s_name, c.n_name, p.p_partkey, p.p_brand
    FROM cand c
    JOIN best b ON b.l_partkey = c.l_partkey
               AND c.acctbal_cents = b.min_cents
    JOIN part p ON p.p_partkey = c.l_partkey
    WHERE p.p_type = 'LARGE' AND p.p_size < 25
    ORDER BY c.acctbal_cents DESC, c.n_name, c.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) adapted to the trimmed schema: no
    partsupp/ps_supplycost, so "cost" := the supplier's account balance
    (exact cents) and the part↔supplier candidates are the DISTINCT
    traded pairs from lineitem; the region scope, part filters, the
    correlated MIN subquery, the tie-preserving equality join back, and
    the top-100 ordering all keep Q2's structure.  Spark shape: the
    supplier×nation×region candidate dimension is built broadcast-only;
    the one wide shuffle is the association distinct; the decorrelated
    MIN + join-back runs on the grouped (≤ |parts|-row) side.  Ties on
    the minimum are preserved exactly like the reference query."""
    li = load_table(spark, sf_dir, "lineitem")
    assoc = li.select("l_partkey", "l_suppkey").distinct()
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supp = (s.join(n, s["s_nationkey"] == n["n_nationkey"])
            .join(r, n["n_regionkey"] == r["r_regionkey"])
            .select("s_suppkey", "s_name", "n_name",
                    F.round(F.col("s_acctbal") * 100).cast("bigint")
                     .alias("acctbal_cents")))
    cand = assoc.join(F.broadcast(supp),
                      assoc["l_suppkey"] == supp["s_suppkey"])
    best = cand.groupBy("l_partkey").agg(
        F.min("acctbal_cents").alias("min_cents"))
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "LARGE") & (F.col("p_size") < 25))
    return (
        cand.join(best, on="l_partkey")
        .where(F.col("acctbal_cents") == F.col("min_cents"))
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .select("acctbal_cents", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.col("acctbal_cents").desc(), "n_name", "s_name",
                 "p_partkey")
        .limit(100)
    )


@workload(
    "tpch_q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) AS value_e4
      FROM lineitem GROUP BY 1),
    t AS (SELECT SUM(value_e4) AS tv, COUNT(*) AS np FROM pv)
    SELECT pv.l_partkey, CAST(pv.value_e4 AS BIGINT) AS value_e4
    FROM pv, t
    WHERE 3 * pv.value_e4 * t.np > 4 * t.tv
    ORDER BY value_e4 DESC, pv.l_partkey
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification) adapted to the trimmed
    schema: no partsupp, so a part's "stock value" is its traded revenue
    in lineitem, and the Q11 scalar-subquery threshold (value > fraction
    × total) is made scale-free exactly as the reference query scales its
    fraction by 1/SF — a part qualifies when its share exceeds 4/3 of
    the uniform share, tested in EXACT integer arithmetic
    (3·v·n_parts > 4·total, all e4-unit bigints; no division).  Spark
    shape: one groupBy on partkey; the global (total, n_parts) summary
    is a single-row broadcast cross join — the decorrelated form of
    Q11's scalar subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * 10000).cast("bigint")
    pv = li.groupBy("l_partkey").agg(F.sum(rev).alias("value_e4"))
    t = pv.agg(F.sum("value_e4").alias("tv"),
               F.count(F.lit(1)).alias("np"))
    return (
        pv.crossJoin(F.broadcast(t))
        .where(3 * F.col("value_e4") * F.col("np") > 4 * F.col("tv"))
        .select("l_partkey", F.col("value_e4").cast("bigint").alias("value_e4"))
        .orderBy(F.col("value_e4").desc(), "l_partkey")
    )


@workload(
    "tpch_q16_supplier_counts",
    oracle="""
    WITH assoc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT a.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM assoc a JOIN part p ON p.p_partkey = a.l_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND a.l_suppkey NOT IN (SELECT s_suppkey FROM bad)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
    """,
)
def tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) adapted to the trimmed
    schema: no partsupp, so the part↔supplier association is the DISTINCT
    (l_partkey, l_suppkey) pairs actually traded in lineitem; no
    s_comment, so the complaint-supplier exclusion becomes a low-balance
    exclusion (s_acctbal < 500 — non-empty at the gate SF).  Spark
    shape: the association distinct is the one wide shuffle; the
    filtered part dimension and the excluded-supplier set are both
    broadcast (the NOT IN is a broadcast LEFT ANTI join — safe here
    because s_suppkey is never NULL, documented vs the SQL NOT-IN NULL
    trap); COUNT(DISTINCT) rides the partial-aggregate path."""
    li = load_table(spark, sf_dir, "lineitem")
    assoc = li.select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 500).select("s_suppkey")
    return (
        assoc.join(F.broadcast(bad),
                   assoc["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .groupBy("p_brand", "p_type",
                 F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("bigint")
              .alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@workload(
    "tpch_q20_dominant_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%widget%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2),
    tot AS (SELECT l_partkey, SUM(q) AS qt FROM shipped GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_parts_dominant
    FROM shipped sh
    JOIN tot t ON t.l_partkey = sh.l_partkey
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE 2 * sh.q > t.qt
    GROUP BY 1, 2, 3
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (suppliers with excess stock) adapted to the trimmed
    schema: no partsupp/ps_availqty, so the Q20 predicate "availqty >
    50% of shipped quantity" becomes its shipped-side mirror — suppliers
    who shipped MORE than half a part's 1996 volume of name-matched
    parts ("dominant" suppliers), the same correlated-scalar-subquery
    shape decorrelated into aggregates.  Spark shape: part filter
    broadcast-prunes lineitem before the one groupBy shuffle on
    (partkey, suppkey); the per-part total is a window over partkey (no
    second wide exchange of the base data); the dominance test is exact
    integer arithmetic (2q > qt — quantities are integral).  Supplier
    and nation broadcast."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")).select("p_partkey")
    shipped = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint")
              .alias("q"))
    )
    tot = F.sum("q").over(Window.partitionBy("l_partkey"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        shipped.withColumn("qt", tot)
        .where(2 * F.col("q") > F.col("qt"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts_dominant"))
        .orderBy("s_suppkey")
    )


@workload(
    "events_hll_rollup",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS est_ok, TRUE AS merge_consistent_ok
    FROM events GROUP BY event_type
    """,
)
def events_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches as DATA (Apache DataSketches via
    ``hll_sketch_agg``/``hll_union_agg``): per-(event_type, day) binary
    sketches built once, then rolled up to per-type distinct-user
    estimates by UNION-merging the daily sketches — the production shape
    where a 100 TB history keeps one tiny sketch per rollup cell and
    re-aggregation at any grain is register-wise max over sketches, never
    a re-scan.  Two certificates: ``est_ok`` (merged estimate within 10%
    of exact — lgConfigK=12 is ~1.6% rsd) and ``merge_consistent_ok``
    (the DAY-sketch union estimate within 5% of the HOUR-sketch union
    estimate — both unions summarize the identical user set).  Exact
    cross-grain equality is deliberately NOT claimed: DataSketches picks
    the estimator per union-input MODES (coupon inputs keep the exact/HIP
    path, any dense input flips the out-of-order flag to the composite
    estimator), so two shardings of the same set can legitimately land on
    different estimator paths — observed live at the 10× corpus, where
    day cells go dense while hour cells stay sparse.  Each single union
    IS deterministic (all-coupon unions are exact-set semantics; any
    dense input forces the order-independent composite path), which is
    what makes this a gateable row.  ``sketch_approx_stats`` checks the
    scalar ``approx_count_distinct`` path; this row checks the
    persistable/mergeable sketch objects.

    Partition-invariance pin (r10 verdict #2): a DataSketches HLL built
    by RAW updates keeps an HIP accumulator whose value depends on
    insertion ORDER once the sketch promotes out of coupon mode, and the
    partial decomposition (which rows build which partial) depends on
    the input split layout — so each CELL sketch is pinned to a single
    deterministic sequential build: hash-repartition on the cell key +
    sortWithinPartitions with the unique user_id tiebreak, bitwise
    identical under any shuffle/split/fetch layout.  The day→type UNION
    needs no pin: sketch-to-sketch merging invalidates HIP and the
    composite estimate is a pure function of register-wise MAX and the
    OR of the out-of-order flags — both commutative-exact — so any merge
    order lands on identical registers (the partition-sweep test in
    tests/test_round11_fixes.py asserts the whole row bitwise across
    conf settings)."""
    ev = load_table(spark, sf_dir, "events")
    nparts = spark.sparkContext.defaultParallelism

    def union_est(grain, label: str) -> DataFrame:
        base = (ev.select("event_type", grain.alias("cell"), "user_id")
                .repartition(nparts, "event_type", "cell")
                .sortWithinPartitions("event_type", "cell", "user_id"))
        cells = (
            base.groupBy("event_type", "cell")
            .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        )
        return (
            cells.groupBy("event_type")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False)))
                  .alias(label))
        )

    by_day = union_est(F.date_trunc("day", "ts"), "est_day")
    by_hour = union_est(F.date_trunc("hour", "ts"), "est_hour")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users"))
    return (
        exact.join(by_day, on="event_type").join(by_hour, on="event_type")
        .select(
            "event_type", "n_users",
            (F.abs(F.col("est_day") - F.col("n_users"))
             <= 0.10 * F.greatest(F.lit(1), F.col("n_users")))
             .alias("est_ok"),
            (F.abs(F.col("est_day") - F.col("est_hour"))
             <= 0.05 * F.greatest(F.lit(1), F.col("est_day")))
             .alias("merge_consistent_ok"),
        )
    )


@workload(
    "events_quantile_rollup",
    oracle="""
    WITH b AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS pr,
             event_id AS id, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND event_id IS NOT NULL),
    day_k AS (SELECT event_type, pr, id, v FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type, day
                                     ORDER BY pr, id) AS rn
        FROM b) WHERE rn <= 32),
    merged AS (SELECT event_type, pr, id, v FROM (
        SELECT event_type, pr, id, v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY pr, id) AS rn
        FROM day_k) WHERE rn <= 32),
    direct AS (SELECT event_type, pr, id, v FROM (
        SELECT event_type, pr, id, v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY pr, id) AS rn
        FROM b) WHERE rn <= 32),
    cgm AS (SELECT event_type, list(id ORDER BY pr, id) AS ids
            FROM merged GROUP BY event_type),
    cgd AS (SELECT event_type, list(id ORDER BY pr, id) AS ids
            FROM direct GROUP BY event_type),
    est AS (SELECT event_type,
                   vs[CAST(floor(0.5 * (m - 1)) AS INT) + 1] AS est_p50,
                   vs[CAST(floor(0.9 * (m - 1)) AS INT) + 1] AS est_p90
            FROM (SELECT event_type, list(v ORDER BY v) AS vs,
                         COUNT(*) AS m
                  FROM merged GROUP BY event_type)),
    ex AS (SELECT event_type,
                  MAX(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS INT) + 1
                           THEN v END) AS exact_p50,
                  MAX(CASE WHEN rn = CAST(floor(0.9 * (n - 1)) AS INT) + 1
                           THEN v END) AS exact_p90
           FROM (SELECT event_type, v,
                        row_number() OVER (PARTITION BY event_type
                                           ORDER BY v, id) AS rn,
                        COUNT(*) OVER (PARTITION BY event_type) AS n
                 FROM b)
           GROUP BY event_type),
    ns AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM b GROUP BY event_type)
    SELECT ns.event_type, ns.n, est.est_p50, est.est_p90,
           ex.exact_p50, ex.exact_p90, (cgm.ids = cgd.ids) AS cross_grain_ok
    FROM ns JOIN est USING (event_type) JOIN ex USING (event_type)
         JOIN cgm USING (event_type) JOIN cgd USING (event_type)
    """,
)
def events_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch rollup (``pipeline/quantile.py``) — the
    quantile member of the sketch family next to MG / Count-Min / HLL:
    per-(event_type, day) deterministic coordinated bottom-k samples
    (k=32, 60-bit md5 priorities), union-merged to per-type sketches, with
    discrete-quantile estimates read off the merged sample.

    Unlike the HLL rollup's mode-dependent 5%/10% tolerance certificates,
    coordination makes the merge EXACT: ``cross_grain_ok`` asserts the
    day-cells-merged sample is BITWISE identical to the sketch built
    directly per type (bottom-k of a union = bottom-k of the per-part
    bottom-k's, for any sharding — deterministic priorities, no RNG).
    The oracle rebuilds the identical sample in SQL, so the value hash
    binds the ESTIMATES themselves (est_p50/est_p90 are selected data, no
    interpolation), alongside the same-index-rule exact quantiles for
    error inspection.  At sf0.01 every day cell (~66 rows) truncates at
    k=32 and every type (~2000 rows) is summarized by 32 — the estimates
    are genuinely sketched, not exact pass-throughs."""
    from ophidia_io_server_spark.pipeline.quantile import (
        exact_discrete_quantiles,
        merge_sketches,
        quantile_sketch,
        sketch_quantiles,
    )

    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & ~F.isnan("value")))
    day_sk = quantile_sketch(ev.withColumn("day", F.to_date("ts")),
                             ["event_type", "day"], "value", "event_id",
                             k=32)
    merged = merge_sketches(day_sk, ["event_type"], k=32)
    direct = quantile_sketch(ev, ["event_type"], "value", "event_id", k=32)
    est = sketch_quantiles(merged, [0.5, 0.9])
    cg = (est.join(direct.select("event_type",
                                 F.col("sample").alias("_ds")),
                   on="event_type")
          .withColumn("cross_grain_ok", F.col("sample") == F.col("_ds"))
          .drop("sample", "_ds"))
    ex = exact_discrete_quantiles(ev, ["event_type"], "value", "event_id",
                                  [0.5, 0.9])
    return (cg.join(ex, on="event_type")
            .select("event_type", "n", "est_p50", "est_p90",
                    "exact_p50", "exact_p90", "cross_grain_ok"))


@workload(
    "stream_quantile_rollup",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS pr,
             event_id AS id, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND event_id IS NOT NULL),
    direct AS (SELECT event_type, pr, id, v FROM (
        SELECT event_type, pr, id, v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY pr, id) AS rn
        FROM b) WHERE rn <= 32),
    est AS (SELECT event_type,
                   vs[CAST(floor(0.5 * (m - 1)) AS INT) + 1] AS est_p50,
                   vs[CAST(floor(0.9 * (m - 1)) AS INT) + 1] AS est_p90
            FROM (SELECT event_type, list(v ORDER BY v) AS vs,
                         COUNT(*) AS m
                  FROM direct GROUP BY event_type)),
    ns AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM b GROUP BY event_type)
    SELECT ns.event_type, ns.n, est.est_p50, est.est_p90,
           TRUE AS stream_equals_batch
    FROM ns JOIN est USING (event_type)
    """,
)
def stream_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental quantile sketch
    (``streaming/ingest.py::quantile_sketch_stream``): events arrive in
    micro-batches (maxFilesPerTrigger=1 over the 2-file staging); each
    batch is sketched alone and
    merged into the persisted per-type state — O(|batch| + cells·k) per
    batch, never a history re-scan.  The coordination theorem upgrades the
    usual stream≡batch SET equality to BITWISE sample equality for any
    batch decomposition, asserted here by comparing the drained state to
    the one-shot batch sketch struct-for-struct
    (``stream_equals_batch``); the oracle rebuilds the identical sample
    in SQL and hash-binds the estimates."""
    from ophidia_io_server_spark.pipeline.quantile import (
        quantile_sketch,
        sketch_quantiles,
    )
    from ophidia_io_server_spark.streaming.ingest import (
        events_stream,
        quantile_sketch_stream,
    )

    path = _staged_events_dir(spark, sf_dir)
    src = (events_stream(spark, path, max_files_per_trigger=1)
           .where(F.col("value").isNotNull() & ~F.isnan("value")))
    streamed = quantile_sketch_stream(src, ["event_type"], "value",
                                      "event_id", k=32)
    def _certify() -> bool:
        batch = quantile_sketch(
            load_table(spark, sf_dir, "events")
            .where(F.col("value").isNotNull() & ~F.isnan("value")),
            ["event_type"], "value", "event_id", k=32)
        return bool(streamed.exceptAll(batch).count() == 0
                    and batch.exceptAll(streamed).count() == 0)

    # bitwise certificate is call-invariant per session (exact
    # coordination theorem) — memoized, gate computes it fresh
    eq = session_memo(spark, ("qsk_stream_eq", sf_dir), _certify)
    return (sketch_quantiles(streamed, [0.5, 0.9])
            .select("event_type", "n", "est_p50", "est_p90")
            .withColumn("stream_equals_batch", F.lit(eq)))


@workload(
    "stream_view_attribution",
    oracle="""
    SELECT p.event_id AS p_event_id, v.event_id AS v_event_id,
           p.user_id,
           CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS lag_us,
           TRUE AS stream_equals_batch
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 120 MINUTE
    """,
)
def stream_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM inner join
    (``streaming/ingest.py::stream_stream_attribution``): purchases
    joined to the same user's views in the preceding 2 h, both sides
    watermarked so buffered state is evicted once the opposite side's
    watermark passes the join-window horizon — O(horizon) state at any
    stream length, the missing piece between the repo's stream-static
    joins and its stateful aggregations.  Run here with availableNow
    over the staged corpus (single batch — event-time disorder across
    arbitrary file splits exceeds a 4 h watermark; the multi-batch path
    is exercised in tests/test_streaming.py with a horizon-covering
    watermark) and checked two ways: the oracle's inequality join, and
    the ``stream_equals_batch`` boolean asserting the drained stream
    result set-equals the identical batch-plan join."""
    from ophidia_io_server_spark.streaming.ingest import (
        events_stream,
        run_available_now,
        stream_stream_attribution,
    )

    path = _staged_events_dir(spark, sf_dir)
    src = events_stream(spark, path)
    joined = stream_stream_attribution(
        src.where(F.col("event_type") == "view"),
        src.where(F.col("event_type") == "purchase"),
        window_minutes=120, watermark="4 hours",
    )
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    landed = run_available_now(joined, f"stream_ss_attr_{tag}",
                               output_mode="append")
    ev = load_table(spark, sf_dir, "events")
    bv = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_event_id"),
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    bp = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id",
        F.col("ts").alias("p_ts"))
    batch = bp.join(
        bv,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 120 MINUTES")),
        "inner",
    ).select("p_event_id", "v_event_id", "user_id", "p_ts", "v_ts")
    got = landed.select("p_event_id", "v_event_id", "user_id", "p_ts", "v_ts")
    # call-invariant per session (memoized staged input, deterministic
    # single-batch drain) — certificate memoized, gate computes it fresh
    ok = session_memo(
        spark, ("sva_eq", sf_dir),
        lambda: bool(got.exceptAll(batch).count() == 0
                     and batch.exceptAll(got).count() == 0))
    return landed.select(
        "p_event_id", "v_event_id", "user_id",
        (F.unix_micros(F.col("p_ts").cast("timestamp"))
         - F.unix_micros(F.col("v_ts").cast("timestamp"))).alias("lag_us"),
        F.lit(ok).alias("stream_equals_batch"),
    )


# ---------------------------------------------------------------------------
# Suite composites + driver-gate slot curation (round 6)
#
# The driver's correctness gate truncates at the FIRST 50 entries of
# ``queries()``.  Rounds 4-5 grew the registry to 89 oracled workloads, so the
# newest operator wave (temporal joins, BM25, LMs, BPE, PageRank, heavy
# hitters, TPC-H q18, cluster resolution) had no hard-signal row.  Fix, per
# the round-5 verdict: fold low-risk legacy rows into NULL-padded tagged-UNION
# composites (each member keeps its exact values and its exact oracle — the
# hash check on the composite is precisely the concatenation of the members'
# hash checks), freeing slots inside the 50-row window for the round-5
# operators.  The individual member rows STAY registered beyond the window so
# the local mirror (scripts/check_correctness.py) and bench still exercise
# them in isolation.


@workload(
    "lineitem_correlation_matrix",
    oracle="""
    WITH b AS (
      SELECT CAST(l_quantity AS BIGINT) AS q_units,
             CAST(ROUND(l_extendedprice) AS BIGINT) AS price_dollars,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_pct
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL AND l_tax IS NOT NULL
    ),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(q_units AS HUGEINT)) AS s0,
             SUM(CAST(q_units AS HUGEINT) * q_units) AS q0,
             SUM(CAST(price_dollars AS HUGEINT)) AS s1,
             SUM(CAST(price_dollars AS HUGEINT) * price_dollars) AS q1,
             SUM(CAST(disc_pct AS HUGEINT)) AS s2,
             SUM(CAST(disc_pct AS HUGEINT) * disc_pct) AS q2,
             SUM(CAST(tax_pct AS HUGEINT)) AS s3,
             SUM(CAST(tax_pct AS HUGEINT) * tax_pct) AS q3,
             SUM(CAST(q_units AS HUGEINT) * price_dollars) AS p01,
             SUM(CAST(q_units AS HUGEINT) * disc_pct) AS p02,
             SUM(CAST(q_units AS HUGEINT) * tax_pct) AS p03,
             SUM(CAST(price_dollars AS HUGEINT) * disc_pct) AS p12,
             SUM(CAST(price_dollars AS HUGEINT) * tax_pct) AS p13,
             SUM(CAST(disc_pct AS HUGEINT) * tax_pct) AS p23
      FROM b
    )
    SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n * pxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * qx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * qy - sy * sy AS DOUBLE))), 6) AS corr
    FROM (
      SELECT 'q_units' AS col_a, 'price_dollars' AS col_b,
             n, p01 AS pxy, s0 AS sx, s1 AS sy, q0 AS qx, q1 AS qy FROM s
      UNION ALL SELECT 'q_units', 'disc_pct', n, p02, s0, s2, q0, q2 FROM s
      UNION ALL SELECT 'q_units', 'tax_pct', n, p03, s0, s3, q0, q3 FROM s
      UNION ALL SELECT 'price_dollars', 'disc_pct', n, p12, s1, s2, q1, q2 FROM s
      UNION ALL SELECT 'price_dollars', 'tax_pct', n, p13, s1, s3, q1, q3 FROM s
      UNION ALL SELECT 'disc_pct', 'tax_pct', n, p23, s2, s3, q2, q3 FROM s
    )
    """,
)
def lineitem_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-sum Pearson correlation matrix over lineitem's four numeric
    measures (``operators/profile.py::pearson_matrix``): ONE fused scan
    aggregates every Σx/Σx²/Σxy as DECIMAL(38,0) — no float accumulation
    order anywhere — then the 6 upper-triangle correlations are single
    IEEE expressions over those exact integers (DuckDB mirrors them in
    HUGEINT).  The canonical data-profiling primitive at a 100 TB-safe
    shape: one partial-aggregatable pass, 15 numbers, no Python."""
    from ophidia_io_server_spark.operators.profile import pearson_matrix

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("bigint").alias("q_units"),
        F.round("l_extendedprice").cast("bigint").alias("price_dollars"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.round(F.col("l_tax") * 100).cast("bigint").alias("tax_pct"),
    )
    return pearson_matrix(base, ["q_units", "price_dollars",
                                 "disc_pct", "tax_pct"])


@workload(
    "orders_bloom_semijoin",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_li,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
           TRUE AS bloom_no_false_negative,
           TRUE AS fp_within_bound
    FROM lineitem l
    JOIN (SELECT o_orderkey FROM orders
          WHERE o_orderpriority = '1-URGENT'
            AND o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1996-01-01') o
      ON l.l_orderkey = o.o_orderkey
    """,
)
def orders_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction (``operators/bloom.py``): revenue
    of lineitems belonging to 1995 URGENT orders, computed through an
    explicit broadcast Bloom prefilter + exact re-join.  The END RESULT
    is bitwise the plain semi-join (the oracle IS the plain join — the
    hash proves FP removal); what the bloom changes is HOW MANY fact
    rows reach the join shuffle, the pruning a 100 TB fact scan lives
    by.  Two certificates ride the row: ``bloom_no_false_negative``
    (every exact-join row passed the prefilter — structural, but
    asserted from measured counts) and ``fp_within_bound`` (measured
    false-positive count ≤ 4× the expected (1−e^{−kn/m})^k rate over
    the measured negatives)."""
    import math

    from ophidia_io_server_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    M, K = 1 << 20, 4
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = (orders
           .where((F.col("o_orderpriority") == "1-URGENT")
                  & (F.col("o_orderdate") >= "1995-01-01")
                  & (F.col("o_orderdate") < "1996-01-01"))
           .select("o_orderkey"))
    # r13 opt: the 1-row bloom frame is pinned so the n_keys read and the
    # prefilter broadcast share ONE build (unpinned, the orders aggregate
    # ran twice: once for first(), once when the broadcast materialized)
    bl = bloom_build(dim, "o_orderkey", m_bits=M, k_hashes=K) \
        .localCheckpoint(eager=False)
    row = bl.select("n_keys").first()
    n_keys = int(row["n_keys"])

    pre = (li.select("l_orderkey", "l_extendedprice", "l_discount")
           .crossJoin(F.broadcast(bl.select("bloom")))
           .where(bloom_might_contain(F.col("bloom"), F.col("l_orderkey"),
                                      M, K))
           .drop("bloom")
           # project BEFORE the pin: the checkpoint blocks carry only the
           # 3 columns the join/agg/fp-count consumers read
           .localCheckpoint())
    n_total = li.count()

    # r13 opt: ONE pass over the pinned prefiltered rows computes the
    # pass-count AND the exact-join aggregate (LEFT join against the
    # broadcast dim: matched rows are exactly the old inner join, so
    # n_orders/n_li/revenue are the same values; n_pass = all rows) —
    # the separate pre.count() job is gone.
    joined = pre.join(F.broadcast(dim),
                      F.col("l_orderkey") == F.col("o_orderkey"), "left")
    agg = joined.agg(
        F.count_distinct("o_orderkey").cast("bigint").alias("n_orders"),
        F.count("o_orderkey").cast("bigint").alias("n_li"),
        F.sum(F.when(F.col("o_orderkey").isNotNull(),
                     F.round(F.col("l_extendedprice")
                             * (1 - F.col("l_discount"))
                             * 10000).cast("bigint"))).cast("bigint")
        .alias("revenue_e4"),
        F.count(F.lit(1)).cast("bigint").alias("n_pass"))
    res = agg.first()
    n_li = int(res["n_li"])
    n_pass = int(res["n_pass"])
    # all exact-join rows are a subset of the prefiltered rows by
    # construction; assert it from the measured counts anyway
    no_fn = n_pass >= n_li
    fp = n_pass - n_li           # prefiltered rows the exact join dropped
    n_neg = n_total - n_li
    exp_rate = (1.0 - math.exp(-K * n_keys / M)) ** K
    fp_ok = fp <= max(4.0 * exp_rate * n_neg, 16.0)
    return agg.select(
        "n_orders", "n_li", "revenue_e4",
        F.lit(bool(no_fn)).alias("bloom_no_false_negative"),
        F.lit(bool(fp_ok)).alias("fp_within_bound"))


@workload(
    "orders_woe_price_bins",
    oracle="""
    WITH lab AS (
      SELECT o.o_orderkey, o.o_totalprice,
             CASE WHEN EXISTS (SELECT 1 FROM lineitem l
                               WHERE l.l_orderkey = o.o_orderkey
                                 AND l.l_returnflag = 'R')
                  THEN 1 ELSE 0 END AS bad
      FROM orders o
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS r,
             COUNT(*) OVER () AS n
      FROM lab
    ),
    bins AS (
      SELECT CAST(((r - 1) * 10) // n AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(bad) AS BIGINT) AS n_bad,
             CAST(COUNT(*) - SUM(bad) AS BIGINT) AS n_good
      FROM ranked GROUP BY 1
    ),
    tot AS (SELECT SUM(n_bad) AS tb, SUM(n_good) AS tg FROM bins)
    SELECT bin, n_orders, n_bad, n_good,
           ROUND(ln(((n_good + 0.5) / (tg + 0.5))
                    / ((n_bad + 0.5) / (tb + 0.5))), 6) AS woe
    FROM bins CROSS JOIN tot
    """,
)
def orders_woe_price_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence feature binning (the credit-scoring / feature-
    engineering classic): orders decile-binned by total price, labelled
    bad when any line item was returned, and each bin scored
    WOE = ln((good_i/good)/(bad_i/bad)) with the +0.5 Laplace smoothing.
    Bins come from the DISTRIBUTED two-phase rank
    (``operators/ranking.py`` — a range exchange + ≤P-row offset
    summary), NOT a single-partition ntile window; bin = ⌊(r−1)·10/n⌋ of
    the unique (price, orderkey) order, so both engines bin identically
    with no percentile-interpolation drift.  The label join is one
    semi-join aggregate on orderkey."""
    from ophidia_io_server_spark.operators.ranking import global_dense_rank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bad_keys = (li.where(F.col("l_returnflag") == "R")
                .select(F.col("l_orderkey").alias("o_orderkey")).distinct())
    lab = (orders.join(bad_keys.withColumn("_bad", F.lit(1)),
                       "o_orderkey", "left")
           .select("o_orderkey", "o_totalprice",
                   F.coalesce("_bad", F.lit(0)).alias("bad")))
    # r13 wave 6: (o_totalprice, o_orderkey) is unique per order, so the
    # dense max rank IS n — return_max reads it off the offset collect the
    # rank chain already runs (zero extra passes) and inlines it as a
    # literal; the old ``agg(max(rank))`` 1-row frame re-scanned the
    # checkpoint blocks once per broadcast site (4 subtree copies in the
    # final plan).  The ≤10-row bins frame is pinned so the totals
    # aggregate and the final projection share ONE bins computation
    # instead of re-deriving the rank-join + bin groupBy chain each
    # (the wave-4 1-row-bloom-frame discipline).
    ranked, n = global_dense_rank(lab, ["o_totalprice", "o_orderkey"],
                                  return_max=True)
    from ophidia_io_server_spark.pin import pinned

    bins = pinned(
        ranked.select(F.expr(f"(rank - 1) * 10 div {int(n)}").cast("bigint")
                      .alias("bin"), "bad")
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
             F.sum("bad").cast("bigint").alias("n_bad"))
        .withColumn("n_good",
                    (F.col("n_orders") - F.col("n_bad")).cast("bigint")),
        "woe bins: ≤10-row frame feeds the totals aggregate AND the "
        "final projection (lazy A/B'd SLOWER: 1.88 vs 1.57 total)")
    tot = bins.agg(F.sum("n_bad").alias("tb"), F.sum("n_good").alias("tg"))
    return (bins.crossJoin(F.broadcast(tot))
            .select("bin", "n_orders", "n_bad", "n_good",
                    F.round(F.log(((F.col("n_good") + 0.5)
                                   / (F.col("tg") + 0.5))
                                  / ((F.col("n_bad") + 0.5)
                                     / (F.col("tb") + 0.5))), 6)
                    .alias("woe")))


@workload(
    "orders_gini_revenue",
    oracle="""
    WITH x AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
      FROM orders
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS i
      FROM x
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS t,
             SUM(CAST(i AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)))
               AS s
      FROM ranked
    )
    SELECT n AS n_orders, t AS sum_cents,
           ROUND(CAST(2 * s - (CAST(n AS DECIMAL(19,0)) + 1)
                          * CAST(t AS DECIMAL(19,0)) AS DOUBLE)
                 / CAST(CAST(n AS DECIMAL(19,0))
                        * CAST(t AS DECIMAL(19,0)) AS DOUBLE), 6) AS gini
    FROM agg
    """,
)
def orders_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of order revenue — the inequality /
    concentration statistic (Lorenz-curve form ``G = (2·Σ i·x_(i) −
    (n+1)·Σx) / (n·Σx)`` over ascending-sorted values) that a corpus
    audit uses to quantify source concentration and a retail analyst
    uses on customer revenue.

    Scale design: the sort rank i comes from the DISTRIBUTED two-phase
    range-partition rank (``operators/ranking.py`` — never a global
    window), and every accumulated term stays on the exact integer grid:
    cents are BIGINT, ``i·x`` accumulates as DECIMAL(19,0)×DECIMAL(19,0)
    = DECIMAL(38,0) (digit budget: n·max_cents ≤ 10^19 — 10^11 orders of
    10^8-cent totals), and only the FINAL numerator/denominator cast to
    double for one IEEE division, so both engines agree bitwise.  Ties in
    cents don't need a policy: Σ i·x over a tie group is x·Σi regardless
    of intra-group order (the (cents, o_orderkey) tie-break just makes
    the rank itself deterministic)."""
    from ophidia_io_server_spark.operators.ranking import global_dense_rank

    orders = load_table(spark, sf_dir, "orders")
    x = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey")
    ranked = global_dense_rank(x, ["cents", "o_orderkey"], rank_col="i")
    dec = "decimal(19,0)"
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("t"),
        F.sum(F.col("i").cast(dec) * F.col("cents").cast(dec)).alias("s"))
    n, t, s = F.col("n"), F.col("t"), F.col("s")
    num = (F.lit(2).cast(dec) * s
           - (n.cast(dec) + F.lit(1).cast(dec)) * t.cast(dec))
    den = n.cast(dec) * t.cast(dec)
    return agg.select(
        n.alias("n_orders"), t.alias("sum_cents"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("gini"))


@workload(
    "lineitem_winsorized_stats",
    oracle="""
    WITH c AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS cum FROM c
    ),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
    b AS (
      SELECT n,
             MIN(CASE WHEN cum >= (n + 99) // 100 THEN v END) AS lo,
             MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN v END) AS hi
      FROM cum CROSS JOIN t GROUP BY n
    )
    SELECT n AS n_rows, lo AS lo_cents, hi AS hi_cents,
           CAST(SUM(cnt * LEAST(GREATEST(v, lo), hi)) AS BIGINT)
             AS win_sum_cents,
           ROUND(CAST(SUM(cnt * LEAST(GREATEST(v, lo), hi)) AS DOUBLE)
                 / CAST(n AS DOUBLE), 6) AS win_mean
    FROM cum CROSS JOIN b
    GROUP BY n, lo, hi
    """,
)
def lineitem_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean at EXACT p01/p99 — the outlier-robust feature
    normalization (clamp to the 1st/99th percentile, then average) done
    with exact order statistics, not an approximate sketch: the
    percentile boundary is ``min v with cumcount(v) ≥ ⌈q·n⌉``
    (percentile_disc), integer-decided in both engines.

    Scale design: the cumulative distribution comes from
    ``operators/ranking.py::global_prefix_sum`` over the DISTINCT-value
    count table (one groupBy + one range exchange + a ≤P-row offset
    summary — never a global window, never a single-partition sort);
    boundary selection and the clamped sum are one more pass over that
    distinct-value table (value-cardinality-sized, not row-sized).
    Everything integer until the one final mean division."""
    from ophidia_io_server_spark.operators.ranking import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    c = (li.select(F.round(F.col("l_extendedprice") * 100)
                   .cast("bigint").alias("v"))
         .groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    # n (so k_lo/k_hi) comes off the prefix sum's own offset collect
    # (return_total) and is inlined as a LITERAL — the old 1-row "tot"
    # re-aggregate + its broadcast are gone from the plan; boundary
    # values + clamped sum still read the SAME checkpointed cum blocks
    cum, n = global_prefix_sum(c, ["v"], "cnt", return_total=True)
    n = int(n)
    k_lo, k_hi = (n + 99) // 100, (99 * n + 99) // 100
    b = cum.agg(
        F.min(F.when(F.col("cum") >= F.lit(k_lo), F.col("v"))).alias("lo"),
        F.min(F.when(F.col("cum") >= F.lit(k_hi), F.col("v"))).alias("hi"))
    clamped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return (cum.crossJoin(F.broadcast(b))
            .agg(F.max("lo").cast("bigint").alias("lo_cents"),
                 F.max("hi").cast("bigint").alias("hi_cents"),
                 F.sum(F.col("cnt") * clamped).cast("bigint")
                 .alias("win_sum_cents"))
            .select(F.lit(n).cast("bigint").alias("n_rows"),
                    "lo_cents", "hi_cents", "win_sum_cents",
                    F.round(F.col("win_sum_cents").cast("double")
                            / F.lit(float(n)), 6)
                    .alias("win_mean")))


@workload(
    "lineitem_mad_outliers",
    oracle="""
    WITH c AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    cum AS (SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS cum FROM c),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                 (CAST(SUM(cnt) AS BIGINT) + 1) // 2 AS k FROM c),
    med AS (
      SELECT n, k, MIN(CASE WHEN cum >= k THEN v END) AS m
      FROM cum CROSS JOIN t GROUP BY n, k
    ),
    dd AS (
      SELECT ABS(v - m) AS d, CAST(SUM(cnt) AS BIGINT) AS cnt,
             MAX(n) AS n, MAX(k) AS k, MAX(m) AS m
      FROM cum CROSS JOIN med GROUP BY 1
    ),
    dcum AS (
      SELECT d, cnt, n, k, m, SUM(cnt) OVER (ORDER BY d) AS cum FROM dd
    ),
    mad AS (
      SELECT MAX(n) AS n, MAX(m) AS m,
             MIN(CASE WHEN cum >= k THEN d END) AS mad
      FROM dcum
    )
    SELECT n AS n_rows, m AS median_cents, mad AS mad_cents,
           CAST(COALESCE((SELECT SUM(cnt) FROM dcum, mad x
                          WHERE dcum.d * 10000 > 44478 * x.mad), 0)
                AS BIGINT) AS n_outliers
    FROM mad
    """,
)
def lineitem_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census via median/MAD — the heavy-tail-safe sibling
    of the rolling z-score: exact (lower) median, exact median absolute
    deviation, and the count of rows beyond the standard robust fence
    ``|x − med| > 3·1.4826·MAD`` (1.4826 = 1/Φ⁻¹(3/4), the normal-
    consistency constant; the fence compares as the INTEGER inequality
    ``10⁴·|x−med| > 44478·MAD`` so no float decides membership).

    Scale design: BOTH order statistics come from the distributed
    prefix-sum CDF (``operators/ranking.py::global_prefix_sum``) over
    distinct-value count tables — the second pass re-groups the first
    CDF's table by |v − med| (two sides of the median fold together),
    which is value-cardinality-sized, never row-sized.  No global
    window, no single-partition sort, all decisions integer."""
    from ophidia_io_server_spark.operators.ranking import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    c = (li.select(F.round(F.col("l_extendedprice") * 100)
                   .cast("bigint").alias("v"))
         .groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    # n (and so the median rank k) comes off the prefix sum's own offset
    # collect (return_total — the same numbers max(cum) re-aggregated
    # before) and is inlined as a LITERAL: the old plan re-aggregated the
    # cum blocks into a 1-row frame and broadcast it through every
    # downstream stage — one whole aggregate + broadcast subtree gone,
    # and the n/k columns stop riding the dd groupBy.
    cum, n = global_prefix_sum(c, ["v"], "cnt", return_total=True)
    k = (int(n) + 1) // 2
    med = cum.agg(
        F.min(F.when(F.col("cum") >= F.lit(k), F.col("v"))).alias("m"))
    dd = (cum.crossJoin(F.broadcast(med))
          .groupBy(F.abs(F.col("v") - F.col("m")).alias("d"))
          .agg(F.sum("cnt").cast("bigint").alias("cnt"),
               F.max("m").alias("m")))
    dcum = global_prefix_sum(dd, ["d"], "cnt", cum_col="dcum")
    madrow = dcum.agg(
        F.min(F.when(F.col("dcum") >= F.lit(k), F.col("d"))).alias("mad_v"))
    return (dcum.crossJoin(F.broadcast(madrow))
            .agg(F.max("m").cast("bigint").alias("median_cents"),
                 F.max("mad_v").cast("bigint").alias("mad_cents"),
                 F.sum(F.when(F.col("d") * 10000 > 44478 * F.col("mad_v"),
                              F.col("cnt")).otherwise(0)).cast("bigint")
                 .alias("n_outliers"))
            .select(F.lit(int(n)).cast("bigint").alias("n_rows"),
                    "median_cents", "mad_cents", "n_outliers"))


@workload(
    "orders_benford_digits",
    oracle="""
    WITH x AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_totalprice IS NOT NULL AND ROUND(o_totalprice * 100) > 0
    ),
    d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM x GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM d)
    SELECT digit, n_obs,
           ROUND(CAST(n AS DOUBLE)
                 * log10(1 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected
    FROM d CROSS JOIN t
    """,
)
def orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit census — the classic fabricated-data /
    data-quality screen: observed leading-digit counts of order totals
    vs the Benford expectation ``n·log10(1 + 1/d)``.  TPC-H prices are
    formula-generated, so the deviation itself is the interesting
    output (real ledgers follow Benford; synthetic grids don't).

    Determinism: the leading digit comes from the cents STRING (no
    float log to pick a digit), counts are exact, and the expectation
    is one transcendental per output row (9 rows) — no accumulation of
    doubles anywhere.  One scan + one 9-group aggregate at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    x = (orders.where(F.col("o_totalprice").isNotNull())
         .select(cents.alias("cents")).where(F.col("cents") > 0))
    d = (x.select(F.substring(F.col("cents").cast("string"), 1, 1)
                  .cast("bigint").alias("digit"))
         .groupBy("digit")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs")))
    t = d.agg(F.sum("n_obs").cast("bigint").alias("n"))
    return (d.crossJoin(F.broadcast(t))
            .select("digit", "n_obs",
                    F.round(F.col("n").cast("double")
                            * F.log10(1 + 1.0 / F.col("digit")
                                      .cast("double")), 6)
                    .alias("expected")))


@workload(
    "lineitem_spearman_corr",
    oracle="""
    WITH b AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    cx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY x),
    rx AS (SELECT x, 2 * SUM(c) OVER (ORDER BY x) - c + 1 AS rx2 FROM cx),
    cy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY y),
    ry AS (SELECT y, 2 * SUM(c) OVER (ORDER BY y) - c + 1 AS ry2 FROM cy),
    j AS (SELECT rx.rx2, ry.ry2 FROM b
          JOIN rx USING (x) JOIN ry USING (y)),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(rx2 AS HUGEINT)) AS sx,
             SUM(CAST(rx2 AS HUGEINT) * rx2) AS qx,
             SUM(CAST(ry2 AS HUGEINT)) AS sy,
             SUM(CAST(ry2 AS HUGEINT) * ry2) AS qy,
             SUM(CAST(rx2 AS HUGEINT) * ry2) AS pxy
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(CAST(n * pxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * qx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * qy - sy * sy AS DOUBLE))), 6) AS rho
    FROM s
    """,
)
def lineitem_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price — the
    monotone-association statistic (Pearson on tie-AVERAGED ranks; the
    robust sibling of ``lineitem_correlation_matrix``'s linear Pearson).
    Ranks never materialize by sorting rows: each column's tie-averaged
    rank comes from the distributed prefix-sum CDF over its DISTINCT
    values, doubled so it stays integer (``2R = 2·cum − cnt + 1``), and
    the correlation is the SAME fused exact-DECIMAL Pearson aggregate
    the matrix row uses (Pearson is scale-invariant, so Pearson(2R) IS
    Spearman).  One IEEE expression at the end.

    Scale: two value-keyed rank-map joins (distinct-value-sized build
    sides, shuffle join — no forced broadcast) + one scan-shaped
    aggregate; no global row sort anywhere."""
    from ophidia_io_server_spark.operators.profile import pearson_matrix
    from ophidia_io_server_spark.operators.ranking import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    b = (li.where(F.col("l_quantity").isNotNull()
                  & F.col("l_extendedprice").isNotNull())
         .select(F.col("l_quantity").cast("bigint").alias("x"),
                 F.round(F.col("l_extendedprice") * 100).cast("bigint")
                 .alias("y")))
    from ophidia_io_server_spark.pin import pinned
    # lazy (r13): the first rank-map's range-partitioner sampling job is
    # the pin's first action and scans it directly — the eager variant
    # paid a separate full-scan job before any consumer ran
    b = pinned(b, "spearman base pairs: two rank-map builds + the join",
               eager=False)
    # r13 wave 5: ONE fused prefix sum over the axis-tagged union of the
    # two distinct-value count tables instead of two independent chains
    # (each a range-partitioner sampling pass + a driver offset collect,
    # run back-to-back).  Both axes sum to the same n = |b|, and axis 0
    # sorts entirely before axis 1 in the (axis, v) order, so the
    # axis-1 running sum is the global cum minus n — exact integers,
    # bitwise the two per-axis CDFs (and n itself is total//2 off the
    # fused chain's own offset collect).
    cx = (b.groupBy(F.col("x").alias("v"))
          .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
          .select(F.lit(0).alias("axis"), "v", "c"))
    cy = (b.groupBy(F.col("y").alias("v"))
          .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
          .select(F.lit(1).alias("axis"), "v", "c"))
    cum, total = global_prefix_sum(cx.unionAll(cy), ["axis", "v"], "c",
                                   return_total=True)
    n = int(total) // 2
    rx = (cum.where(F.col("axis") == 0)
          .select(F.col("v").alias("x"),
                  (2 * F.col("cum") - F.col("c") + 1).alias("rx2")))
    ry = (cum.where(F.col("axis") == 1)
          .select(F.col("v").alias("y"),
                  (2 * (F.col("cum") - F.lit(n)) - F.col("c") + 1)
                  .alias("ry2")))
    j = b.join(rx, "x").join(ry, "y").select("rx2", "ry2")
    out = pearson_matrix(j, ["rx2", "ry2"])
    return out.select("n", F.col("corr").alias("rho"))


@workload(
    "orders_fd_discovery",
    oracle="""
    WITH s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS _n,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d0,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS d1,
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS d2,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS d3,
             CAST(COUNT(DISTINCT (o_custkey, o_orderstatus)) AS BIGINT) AS d01,
             CAST(COUNT(DISTINCT (o_custkey, o_orderpriority)) AS BIGINT) AS d02,
             CAST(COUNT(DISTINCT (o_custkey, o_orderkey)) AS BIGINT) AS d03,
             CAST(COUNT(DISTINCT (o_orderstatus, o_custkey)) AS BIGINT) AS d10,
             CAST(COUNT(DISTINCT (o_orderstatus, o_orderpriority)) AS BIGINT) AS d12,
             CAST(COUNT(DISTINCT (o_orderstatus, o_orderkey)) AS BIGINT) AS d13,
             CAST(COUNT(DISTINCT (o_orderpriority, o_custkey)) AS BIGINT) AS d20,
             CAST(COUNT(DISTINCT (o_orderpriority, o_orderstatus)) AS BIGINT) AS d21,
             CAST(COUNT(DISTINCT (o_orderpriority, o_orderkey)) AS BIGINT) AS d23,
             CAST(COUNT(DISTINCT (o_orderkey, o_custkey)) AS BIGINT) AS d30,
             CAST(COUNT(DISTINCT (o_orderkey, o_orderstatus)) AS BIGINT) AS d31,
             CAST(COUNT(DISTINCT (o_orderkey, o_orderpriority)) AS BIGINT) AS d32
      FROM orders
    )
    SELECT lhs, rhs, n_lhs, n_pairs, n_pairs = n_lhs AS holds,
           n_pairs - n_lhs AS violations
    FROM (
      SELECT 'o_custkey' AS lhs, 'o_orderstatus' AS rhs, d0 AS n_lhs, d01 AS n_pairs FROM s
      UNION ALL SELECT 'o_custkey', 'o_orderpriority', d0, d02 FROM s
      UNION ALL SELECT 'o_custkey', 'o_orderkey', d0, d03 FROM s
      UNION ALL SELECT 'o_orderstatus', 'o_custkey', d1, d10 FROM s
      UNION ALL SELECT 'o_orderstatus', 'o_orderpriority', d1, d12 FROM s
      UNION ALL SELECT 'o_orderstatus', 'o_orderkey', d1, d13 FROM s
      UNION ALL SELECT 'o_orderpriority', 'o_custkey', d2, d20 FROM s
      UNION ALL SELECT 'o_orderpriority', 'o_orderstatus', d2, d21 FROM s
      UNION ALL SELECT 'o_orderpriority', 'o_orderkey', d2, d23 FROM s
      UNION ALL SELECT 'o_orderkey', 'o_custkey', d3, d30 FROM s
      UNION ALL SELECT 'o_orderkey', 'o_orderstatus', d3, d31 FROM s
      UNION ALL SELECT 'o_orderkey', 'o_orderpriority', d3, d32 FROM s
    )
    """,
)
def orders_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-attribute functional-dependency discovery over orders
    (``operators/profile.py::fd_discovery`` — the TANE/Metanome data-
    profiling core): for every ordered column pair, does A → B hold
    (``distinct(A) == distinct(A,B)``), and by how many violating pairs
    does it fail?  On TPC-H the PK dependencies o_orderkey → * must
    hold and the categorical pairs must fail loudly — the schema-audit
    readout.

    Scale: ONE multi-distinct aggregate (Spark's Expand — one scan, one
    exchange) computes all 16 distinct counts; the 12 output rows
    unpivot driver-free like the Pearson matrix."""
    from ophidia_io_server_spark.operators.profile import fd_discovery
    from ophidia_io_server_spark.sources.tables import spread

    # r13 opt: Expand multiplies every row 17× BEFORE the partial
    # aggregate, and the single small parquet file scans as one task —
    # the whole 2.5M-row expand+hash ran on one core (2.9 s exec).
    # Spread the 4-column projection first: narrow rows through a
    # round-robin exchange, 17× fan-out paid in parallel.  At real
    # scale file splits already parallelize the scan and spread no-ops.
    orders = spread(load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderkey"))
    return fd_discovery(
        orders, ["o_custkey", "o_orderstatus", "o_orderpriority",
                 "o_orderkey"])

# Multiple-OLS closed form, shared VERBATIM by the Spark selectExpr and the
# DuckDB oracle so both engines evaluate the identical IEEE expression tree
# over the identical exact-integer sums (the Welch-t/Pearson discipline,
# extended to a 3x3 normal-equation solve).  Layer 1: Cramer's-rule betas
# from the DOUBLE-cast sums; layer 2: R^2 from the betas + sums.
_OLS_BETAS = {
    "det": ("(d_n  * (d_s11 * d_s22 - d_s12 * d_s12)"
            " - d_sx1 * (d_sx1 * d_s22 - d_s12 * d_sx2)"
            " + d_sx2 * (d_sx1 * d_s12 - d_s11 * d_sx2))"),
    "det0": ("(d_sy * (d_s11 * d_s22 - d_s12 * d_s12)"
             " - d_sx1 * (d_s1y * d_s22 - d_s12 * d_s2y)"
             " + d_sx2 * (d_s1y * d_s12 - d_s11 * d_s2y))"),
    "det1": ("(d_n  * (d_s1y * d_s22 - d_s12 * d_s2y)"
             " - d_sy * (d_sx1 * d_s22 - d_s12 * d_sx2)"
             " + d_sx2 * (d_sx1 * d_s2y - d_s1y * d_sx2))"),
    "det2": ("(d_n  * (d_s11 * d_s2y - d_s1y * d_s12)"
             " - d_sx1 * (d_sx1 * d_s2y - d_s1y * d_sx2)"
             " + d_sy * (d_sx1 * d_s12 - d_s11 * d_sx2))"),
}
_OLS_L1_EXPRS = [
    f"{_OLS_BETAS['det0']} / {_OLS_BETAS['det']} AS b0_raw",
    f"{_OLS_BETAS['det1']} / {_OLS_BETAS['det']} AS b1_raw",
    f"{_OLS_BETAS['det2']} / {_OLS_BETAS['det']} AS b2_raw",
]
_OLS_L2_EXPRS = [
    "ROUND(b0_raw, 6) AS beta0",
    "ROUND(b1_raw, 6) AS beta1",
    "ROUND(b2_raw, 6) AS beta2",
    "ROUND(1.0 - (d_syy - b0_raw * d_sy - b1_raw * d_s1y - b2_raw * d_s2y)"
    " / (d_syy - d_sy * d_sy / d_n), 6) AS r2",
]
_OLS_DBL_EXPRS = [
    "CAST(n AS DOUBLE) AS d_n", "CAST(sx1 AS DOUBLE) AS d_sx1",
    "CAST(sx2 AS DOUBLE) AS d_sx2", "CAST(sy AS DOUBLE) AS d_sy",
    "CAST(s11 AS DOUBLE) AS d_s11", "CAST(s22 AS DOUBLE) AS d_s22",
    "CAST(s12 AS DOUBLE) AS d_s12", "CAST(s1y AS DOUBLE) AS d_s1y",
    "CAST(s2y AS DOUBLE) AS d_s2y", "CAST(syy AS DOUBLE) AS d_syy",
]


@workload(
    "lineitem_ols_regression",
    oracle=f"""
    WITH b AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        AND l_extendedprice IS NOT NULL
    ),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x1 AS HUGEINT)) AS sx1,
             SUM(CAST(x2 AS HUGEINT)) AS sx2,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
             SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
             SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
             SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
             SUM(CAST(x2 AS HUGEINT) * y) AS s2y,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM b
    ),
    d AS (SELECT CAST(n AS BIGINT) AS n_rows, {", ".join(_OLS_DBL_EXPRS)}
          FROM s),
    l1 AS (SELECT *, {", ".join(_OLS_L1_EXPRS)} FROM d)
    SELECT n_rows, {", ".join(_OLS_L2_EXPRS)} FROM l1
    """,
)
def lineitem_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression (2 features + intercept, closed form)
    of line-item price cents on quantity and discount percent — the
    "regression at 100 TB is ONE aggregate" primitive: a single fused
    scan collects the ten exact DECIMAL(38,0) moment sums (n, Σx, Σxx,
    Σxy, Σyy — no float accumulation order anywhere), then the 3×3
    normal equations solve by Cramer's rule as one IEEE expression over
    those exact integers, plus R² — the expression TEXT is shared
    verbatim with the oracle, so both engines build the identical IEEE
    tree (the Welch-t discipline extended to a linear solve).

    Digit budget: Σy² ≤ n·(10⁷)² needs n ≤ 10²⁴ rows — five orders past
    a 100 TB lineitem.  At scale: one partial-aggregatable pass emitting
    ten numbers; no shuffle beyond the single-row aggregate, no Python,
    no iterative solver."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    b = (li.where(F.col("l_quantity").isNotNull()
                  & F.col("l_discount").isNotNull()
                  & F.col("l_extendedprice").isNotNull())
         .select(F.col("l_quantity").cast("bigint").alias("x1"),
                 F.round(F.col("l_discount") * 100).cast("bigint")
                 .alias("x2"),
                 F.round(F.col("l_extendedprice") * 100).cast("bigint")
                 .alias("y")))
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    s = b.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(x1.cast(dec)).alias("sx1"),
        F.sum(x2.cast(dec)).alias("sx2"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x1 * x1).cast(dec)).alias("s11"),
        F.sum((x2 * x2).cast(dec)).alias("s22"),
        F.sum((x1 * x2).cast(dec)).alias("s12"),
        F.sum((x1 * y).cast(dec)).alias("s1y"),
        F.sum((x2 * y).cast(dec)).alias("s2y"),
        F.sum((y * y).cast(dec)).alias("syy"))
    d = s.selectExpr("CAST(n AS BIGINT) AS n_rows", *_OLS_DBL_EXPRS)
    l1 = d.selectExpr("*", *_OLS_L1_EXPRS)
    return l1.selectExpr("n_rows", *_OLS_L2_EXPRS)


@workload(
    "orders_rfm_segments",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS mo FROM orders),
    cust AS (
      SELECT o_custkey AS c_custkey,
             CAST((epoch_us((SELECT mo FROM mx)) - epoch_us(max(o_orderdate)))
                  // 86400000000 AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cust),
    r AS (
      SELECT c_custkey, recency_days, frequency, monetary_cents,
             ROW_NUMBER() OVER (ORDER BY recency_days, c_custkey) AS rr,
             ROW_NUMBER() OVER (ORDER BY frequency, c_custkey) AS fr,
             ROW_NUMBER() OVER (ORDER BY monetary_cents, c_custkey) AS mr
      FROM cust
    )
    SELECT c_custkey, recency_days, frequency, monetary_cents,
           CAST(5 - ((rr - 1) * 5) // n AS BIGINT) AS r_score,
           CAST(1 + ((fr - 1) * 5) // n AS BIGINT) AS f_score,
           CAST(1 + ((mr - 1) * 5) // n AS BIGINT) AS m_score,
           CAST((5 - ((rr - 1) * 5) // n) * 100
                + (1 + ((fr - 1) * 5) // n) * 10
                + (1 + ((mr - 1) * 5) // n) AS BIGINT) AS rfm_code
    FROM r CROSS JOIN n
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary — the
    classic marketing-analytics binning): one per-customer collapse of
    orders, then each dimension quintile-scored by the DISTRIBUTED
    two-phase rank over the unique (value, custkey) order — exact
    ⌊(r−1)·5/n⌋ bins, no ntile window, no single-partition sort (the
    WOE-bins pattern, three ranks).  r_score counts DOWN (most recent =
    5); rfm_code = 100·R + 10·F + M is the standard segment key.

    Scale: the customer table is |customers| rows (three range
    exchanges + three ≤P-row offset summaries), never the order log."""
    from ophidia_io_server_spark.operators.ranking import global_dense_rank

    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("mo"))
    cust = (orders.crossJoin(F.broadcast(mx))  # scalar anchor date
            .groupBy(F.col("o_custkey").alias("c_custkey"))
            .agg(F.expr("(unix_micros(cast(max(mo) as timestamp))"
                        " - unix_micros(cast(max(o_orderdate) as timestamp)))"
                        " div 86400000000").cast("bigint")
                 .alias("recency_days"),
                 F.count(F.lit(1)).cast("bigint").alias("frequency"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                 .cast("bigint").alias("monetary_cents")))
    # r13 opt: cust feeds FOUR consumers (three independent dense-rank
    # range exchanges + the final join) — unpinned, each re-ran the
    # orders collapse and the mx broadcast; |customers|-bounded, so pin.
    # Lazy is safe here: the first rank call's sampling pass scans it
    # directly (the lazy-pin safety rule from NOTES.md).
    from ophidia_io_server_spark.pin import pinned
    cust = pinned(cust, "RFM per-customer collapse: 3 rank axes + pivot",
                  eager=False)
    # r13 wave 5: ONE fused rank over the axis-tagged union instead of
    # three independent dense-rank calls (each a sampling pass + an
    # offset collect — three sequential driver-blocking chains).  Every
    # axis ranks the UNIQUE key (value, custkey), so each axis block
    # holds exactly n distinct keys and the within-axis rank is the
    # global rank over (axis, value, custkey) minus axis·n — exact
    # integer arithmetic, bitwise the three per-axis ranks.  The three
    # rank joins collapse into one |customers|-keyed pivot groupBy (the
    # value columns ride the union rows, so the cust join is gone too).
    axes = [("recency_days", 0), ("frequency", 1), ("monetary_cents", 2)]
    u = None
    for col, a in axes:
        part = cust.select(F.lit(a).alias("axis"), F.col(col).alias("v"),
                           "c_custkey")
        u = part if u is None else u.unionAll(part)
    ranked, max_rank = global_dense_rank(
        u, ["axis", "v", "c_custkey"], rank_col="rank", return_max=True)
    n = max_rank // 3  # 3 axes × n unique keys each
    piv = ranked.groupBy("c_custkey").agg(
        *[F.max(F.when(F.col("axis") == a, F.col("v")))
          .cast("bigint").alias(col) for col, a in axes],
        *[F.max(F.when(F.col("axis") == a,
                       F.col("rank") - F.lit(a * n)))
          .cast("bigint").alias(rc)
          for (_, a), rc in zip(axes, ("rr", "fr", "mr"))])
    r_score = 5 - F.expr(f"(rr - 1) * 5 div {n}")
    f_score = 1 + F.expr(f"(fr - 1) * 5 div {n}")
    m_score = 1 + F.expr(f"(mr - 1) * 5 div {n}")
    return piv.select(
        "c_custkey", "recency_days", "frequency", "monetary_cents",
        r_score.cast("bigint").alias("r_score"),
        f_score.cast("bigint").alias("f_score"),
        m_score.cast("bigint").alias("m_score"),
        (r_score * 100 + f_score * 10 + m_score).cast("bigint")
        .alias("rfm_code"))

@workload(
    "orders_market_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS m
      FROM orders GROUP BY 1
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(m) AS BIGINT) AS total_cents,
             SUM(CAST(m AS HUGEINT) * m) AS s2
      FROM cust
    ),
    top4 AS (
      SELECT CAST(SUM(m) AS BIGINT) AS top4_cents FROM (
        SELECT m FROM cust ORDER BY m DESC, o_custkey ASC LIMIT 4)
    )
    SELECT n_customers, total_cents, top4_cents,
           ROUND(CAST(s2 AS DOUBLE)
                 / (CAST(total_cents AS DOUBLE)
                    * CAST(total_cents AS DOUBLE)), 6) AS hhi,
           ROUND((CAST(s2 AS DOUBLE)
                  / (CAST(total_cents AS DOUBLE)
                     * CAST(total_cents AS DOUBLE))
                  - 1.0 / n_customers)
                 / (1.0 - 1.0 / n_customers), 6) AS hhi_norm,
           ROUND(CAST(top4_cents AS DOUBLE)
                 / CAST(total_cents AS DOUBLE), 6) AS cr4
    FROM agg CROSS JOIN top4
    """,
)
def orders_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration report over customer revenue shares — the
    antitrust / portfolio-risk primitive: Herfindahl-Hirschman index
    HHI = Σ(mᵢ/T)² = Σmᵢ²/T² kept EXACT as a ratio of DECIMAL(38,0)
    integers (one IEEE division at the end), the normalized HHI
    (HHI − 1/n)/(1 − 1/n), and the CR4 four-firm concentration ratio.

    Scale: one per-customer collapse (partial-aggregatable), one
    single-row moment aggregate, and the top-4 via orderBy+limit —
    Spark compiles that to TakeOrderedAndProject (per-partition top-4 +
    driver merge of P·4 rows), never a global sort.  Digit budget:
    Σmᵢ² ≤ 10³⁸ holds past 10¹⁵ customers of 10¹⁰ cents."""
    orders = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    cust = (orders.groupBy("o_custkey")
            .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                 .cast("bigint").alias("m")))
    agg = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("m").cast("bigint").alias("total_cents"),
        F.sum(F.col("m").cast(dec) * F.col("m")).alias("s2"))
    top4 = (cust.orderBy(F.col("m").desc(), F.col("o_custkey").asc())
            .limit(4)
            .agg(F.sum("m").cast("bigint").alias("top4_cents")))
    t = F.col("total_cents").cast("double")
    hhi = F.col("s2").cast("double") / (t * t)
    return (agg.crossJoin(F.broadcast(top4))  # two single-row frames
            .select("n_customers", "total_cents", "top4_cents",
                    F.round(hhi, 6).alias("hhi"),
                    F.round((hhi - 1.0 / F.col("n_customers"))
                            / (1.0 - 1.0 / F.col("n_customers")), 6)
                    .alias("hhi_norm"),
                    F.round(F.col("top4_cents").cast("double") / t, 6)
                    .alias("cr4")))

@workload(
    "lineitem_anova_f",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS g,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
        AND l_returnflag IN ('A', 'N', 'R')
    ),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        SUM(CASE WHEN g = 'A' THEN CAST(y AS HUGEINT) END) AS sa,
        CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nn,
        SUM(CASE WHEN g = 'N' THEN CAST(y AS HUGEINT) END) AS sn,
        CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
        SUM(CASE WHEN g = 'R' THEN CAST(y AS HUGEINT) END) AS sr,
        SUM(CAST(y AS HUGEINT) * y) AS q
      FROM b
    )
    SELECT na, nn, nr,
           ROUND(CAST(sa AS DOUBLE) / na / 100, 6) AS mean_a,
           ROUND(CAST(sn AS DOUBLE) / nn / 100, 6) AS mean_n,
           ROUND(CAST(sr AS DOUBLE) / nr / 100, 6) AS mean_r,
           ROUND(((CAST(sa AS DOUBLE) * sa / na
                   + CAST(sn AS DOUBLE) * sn / nn
                   + CAST(sr AS DOUBLE) * sr / nr
                   - CAST(sa + sn + sr AS DOUBLE)
                     * CAST(sa + sn + sr AS DOUBLE) / (na + nn + nr))
                  / (3 - 1))
                 / ((CAST(q AS DOUBLE)
                     - (CAST(sa AS DOUBLE) * sa / na
                        + CAST(sn AS DOUBLE) * sn / nn
                        + CAST(sr AS DOUBLE) * sr / nr))
                    / (na + nn + nr - 3)), 6) AS f_stat
    FROM s
    """,
)
def lineitem_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic for line-item price across the three
    return-flag groups — the k-group generalization of the Welch row
    (completes the test family: t/Welch for 2 groups, F for k): ONE
    conditional aggregate collects each group's (n, Σy) plus the global
    Σy² on the exact cents grid, then F = (SSB/(k−1))/(SSW/(N−k)) is a
    single IEEE expression over those seven exact integers — the
    between/within sums are PIVOTED into one row (a per-group float SUM
    would be accumulation-order-dependent), rounded 6.

    Scale: one partial-aggregatable scan emitting seven numbers."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_extendedprice").isNotNull()
                 & F.col("l_returnflag").isin("A", "N", "R")))
    dec = "decimal(38,0)"
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    g = F.col("l_returnflag")
    s = li.agg(
        F.sum(F.when(g == "A", 1).otherwise(0)).cast("bigint").alias("na"),
        F.sum(F.when(g == "A", y.cast(dec))).alias("sa"),
        F.sum(F.when(g == "N", 1).otherwise(0)).cast("bigint").alias("nn"),
        F.sum(F.when(g == "N", y.cast(dec))).alias("sn"),
        F.sum(F.when(g == "R", 1).otherwise(0)).cast("bigint").alias("nr"),
        F.sum(F.when(g == "R", y.cast(dec))).alias("sr"),
        F.sum((y * y).cast(dec)).alias("q"))
    na, nn, nr = F.col("na"), F.col("nn"), F.col("nr")
    sa = F.col("sa").cast("double")
    sn = F.col("sn").cast("double")
    sr = F.col("sr").cast("double")
    st = (F.col("sa") + F.col("sn") + F.col("sr")).cast("double")
    grp = sa * F.col("sa") / na + sn * F.col("sn") / nn \
        + sr * F.col("sr") / nr
    ssb = grp - st * st / (na + nn + nr)
    ssw = F.col("q").cast("double") - grp
    return s.select(
        "na", "nn", "nr",
        F.round(sa / na / 100, 6).alias("mean_a"),
        F.round(sn / nn / 100, 6).alias("mean_n"),
        F.round(sr / nr / 100, 6).alias("mean_r"),
        F.round((ssb / (3 - 1)) / (ssw / (na + nn + nr - 3)), 6)
        .alias("f_stat"))

@workload(
    "lineitem_brown_forsythe",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS g,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
        AND l_returnflag IN ('A', 'N', 'R')
    ),
    cnt AS (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS c
            FROM b GROUP BY 1, 2),
    cdf AS (
      SELECT g, y, c,
             SUM(c) OVER (PARTITION BY g ORDER BY y) AS cum,
             SUM(c) OVER (PARTITION BY g) AS n_g
      FROM cnt
    ),
    med AS (
      SELECT g, min(y) AS m
      FROM cdf WHERE cum >= (n_g + 1) // 2
      GROUP BY g
    ),
    dev AS (
      SELECT b.g, abs(b.y - med.m) AS z
      FROM b JOIN med ON med.g = b.g
    ),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        SUM(CASE WHEN g = 'A' THEN CAST(z AS HUGEINT) END) AS sa,
        CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nn,
        SUM(CASE WHEN g = 'N' THEN CAST(z AS HUGEINT) END) AS sn,
        CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
        SUM(CASE WHEN g = 'R' THEN CAST(z AS HUGEINT) END) AS sr,
        SUM(CAST(z AS HUGEINT) * z) AS q
      FROM dev
    )
    SELECT na, nn, nr,
           ROUND(CAST(sa AS DOUBLE) / na / 100, 6) AS mad_a,
           ROUND(CAST(sn AS DOUBLE) / nn / 100, 6) AS mad_n,
           ROUND(CAST(sr AS DOUBLE) / nr / 100, 6) AS mad_r,
           ROUND(((CAST(sa AS DOUBLE) * sa / na
                   + CAST(sn AS DOUBLE) * sn / nn
                   + CAST(sr AS DOUBLE) * sr / nr
                   - CAST(sa + sn + sr AS DOUBLE)
                     * CAST(sa + sn + sr AS DOUBLE) / (na + nn + nr))
                  / (3 - 1))
                 / ((CAST(q AS DOUBLE)
                     - (CAST(sa AS DOUBLE) * sa / na
                        + CAST(sn AS DOUBLE) * sn / nn
                        + CAST(sr AS DOUBLE) * sr / nr))
                    / (na + nn + nr - 3)), 6) AS w_stat
    FROM s
    """,
)
def lineitem_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test across the return-flag
    groups (the robust Levene variant and the ANOVA row's mandatory
    companion — ANOVA's F assumes equal variances; this is the check):
    W = one-way ANOVA's F computed on z = |y − median_g|.  The group
    medians come off the per-group distinct-value CDF (exact, the
    winsorize/MAD pattern), so every deviation z is an EXACT integer and
    the final W is one IEEE expression over seven exact sums — the same
    pivoted-aggregate discipline as `lineitem_anova_f`.

    Scale: one (group, cents) count exchange (bounded by the distinct
    grid, not rows) + per-group windows over it, one 3-row median join
    back, one pivoted scan aggregate."""
    from pyspark.sql import Window

    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_extendedprice").isNotNull()
                 & F.col("l_returnflag").isin("A", "N", "R")))
    dec = "decimal(38,0)"
    b = li.select(F.col("l_returnflag").alias("g"),
                  F.round(F.col("l_extendedprice") * 100).cast("bigint")
                  .alias("y"))
    cnt = b.groupBy("g", "y").agg(F.count(F.lit(1)).cast("bigint")
                                  .alias("c"))
    wcum = Window.partitionBy("g").orderBy("y")
    wall = Window.partitionBy("g")
    # r13 opt: the final moment aggregate is computed from the (g, y, c)
    # GRID, weighted by c, instead of re-joining the deviations back to
    # the raw rows — ONE lineitem scan instead of two, every sum the
    # same exact integer (Σ_rows z = Σ_cells c·z, grouped differently).
    # The grid feeds two consumers (median selection + the weighted
    # aggregate), so it is pinned (value-cardinality-bounded); eager
    # because the median rides a broadcast chain off the pin (the
    # lazy-pin safety rule in NOTES.md).
    from ophidia_io_server_spark.pin import pinned
    cdf = pinned(
        cnt.select("g", "y", "c",
                   F.sum("c").over(wcum).alias("cum"),
                   F.sum("c").over(wall).alias("n_g")),
        "brown-forsythe (g, value) grid: median pick + weighted moments")
    med = (cdf.where(F.col("cum") >= F.expr("(n_g + 1) div 2"))
           .groupBy("g").agg(F.min("y").alias("m")))
    d = (cdf.join(F.broadcast(med), "g")
         .select("g", "c", F.abs(F.col("y") - F.col("m")).alias("z")))
    g, z, c = F.col("g"), F.col("z"), F.col("c")
    s = d.agg(
        F.sum(F.when(g == "A", c).otherwise(0)).cast("bigint").alias("na"),
        F.sum(F.when(g == "A", z.cast(dec) * c)).alias("sa"),
        F.sum(F.when(g == "N", c).otherwise(0)).cast("bigint").alias("nn"),
        F.sum(F.when(g == "N", z.cast(dec) * c)).alias("sn"),
        F.sum(F.when(g == "R", c).otherwise(0)).cast("bigint").alias("nr"),
        F.sum(F.when(g == "R", z.cast(dec) * c)).alias("sr"),
        F.sum((z * z).cast(dec) * c).alias("q"))
    na, nn, nr = F.col("na"), F.col("nn"), F.col("nr")
    sa = F.col("sa").cast("double")
    sn = F.col("sn").cast("double")
    sr = F.col("sr").cast("double")
    st = (F.col("sa") + F.col("sn") + F.col("sr")).cast("double")
    grp = sa * F.col("sa") / na + sn * F.col("sn") / nn \
        + sr * F.col("sr") / nr
    ssb = grp - st * st / (na + nn + nr)
    ssw = F.col("q").cast("double") - grp
    return s.select(
        "na", "nn", "nr",
        F.round(sa / na / 100, 6).alias("mad_a"),
        F.round(sn / nn / 100, 6).alias("mad_n"),
        F.round(sr / nr / 100, 6).alias("mad_r"),
        F.round((ssb / (3 - 1)) / (ssw / (na + nn + nr - 3)), 6)
        .alias("w_stat"))

@workload(
    "orders_duplicate_payments",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             (epoch_us(o_orderdate)) // 86400000000 AS day
      FROM orders
    )
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           a.cents AS cents_a, b.cents AS cents_b,
           CAST(b.day - a.day AS BIGINT) AS days_apart
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND b.day - a.day BETWEEN -7 AND 7
     AND 100 * abs(a.cents - b.cents) <= 5 * least(a.cents, b.cents)
    """,
)
def orders_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suspected-duplicate-payment detection — the audit classic: order
    pairs from the SAME customer with near-identical amounts (within 5%,
    the EXACT scaled-integer predicate 100·|Δ| ≤ 5·min — no float
    epsilon) at most 7 days apart.  The join blocks on the customer
    equi-key; the day window and amount ratio ride as residual
    predicates — candidate volume is Σ(orders-per-customer)², bounded by
    per-customer activity, never a cross join.  At web scale a second
    blocking key (log-amount band, the LSH-band discipline) would cap a
    hot customer; documented, not needed at TPC-H multiplicities.

    Scale: one shuffle on custkey; skew bounded by the hottest
    customer's own order count."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.expr("unix_micros(cast(o_orderdate as timestamp))"
               " div 86400000000").alias("day"))
    a = o.select(F.col("o_custkey").alias("custkey"),
                 F.col("o_orderkey").alias("order_a"),
                 F.col("cents").alias("cents_a"),
                 F.col("day").alias("day_a"))
    b = o.select(F.col("o_custkey").alias("custkey"),
                 F.col("o_orderkey").alias("order_b"),
                 F.col("cents").alias("cents_b"),
                 F.col("day").alias("day_b"))
    return (a.join(b, ["custkey"])
            .where((F.col("order_a") < F.col("order_b"))
                   & ((F.col("day_b") - F.col("day_a")).between(-7, 7))
                   & (100 * F.abs(F.col("cents_a") - F.col("cents_b"))
                      <= 5 * F.least("cents_a", "cents_b")))
            .select("custkey", "order_a", "order_b", "cents_a", "cents_b",
                    (F.col("day_b") - F.col("day_a")).cast("bigint")
                    .alias("days_apart")))


@workload(
    "lineitem_kruskal_wallis",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'N', 'R')
    ),
    vc AS (SELECT g, q, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
    tq AS (
      SELECT q, CAST(SUM(c) AS BIGINT) AS t FROM vc GROUP BY 1
    ),
    mr AS (
      SELECT q, t,
             2 * COALESCE(SUM(t) OVER (ORDER BY q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + t + 1 AS mr2
      FROM tq
    ),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN vc.g = 'A' THEN vc.c ELSE 0 END) AS BIGINT) AS na,
        SUM(CASE WHEN vc.g = 'A'
                 THEN CAST(vc.c AS HUGEINT) * mr.mr2 END) AS r2a,
        CAST(SUM(CASE WHEN vc.g = 'N' THEN vc.c ELSE 0 END) AS BIGINT) AS nn,
        SUM(CASE WHEN vc.g = 'N'
                 THEN CAST(vc.c AS HUGEINT) * mr.mr2 END) AS r2n,
        CAST(SUM(CASE WHEN vc.g = 'R' THEN vc.c ELSE 0 END) AS BIGINT) AS nr,
        SUM(CASE WHEN vc.g = 'R'
                 THEN CAST(vc.c AS HUGEINT) * mr.mr2 END) AS r2r
      FROM vc JOIN mr ON mr.q = vc.q
    ),
    tie AS (
      SELECT SUM(CAST(t AS HUGEINT) * t * t - t) AS tt FROM tq
    )
    SELECT na, nn, nr,
           ROUND((12.0 / (CAST(na + nn + nr AS DOUBLE)
                          * CAST(na + nn + nr + 1 AS DOUBLE))
                  * ((CAST(r2a AS DOUBLE) / 2) * (CAST(r2a AS DOUBLE) / 2) / na
                     + (CAST(r2n AS DOUBLE) / 2) * (CAST(r2n AS DOUBLE) / 2) / nn
                     + (CAST(r2r AS DOUBLE) / 2) * (CAST(r2r AS DOUBLE) / 2) / nr)
                  - 3 * CAST(na + nn + nr + 1 AS DOUBLE))
                 / (1 - CAST(tt AS DOUBLE)
                        / (CAST(na + nn + nr AS DOUBLE)
                           * CAST(na + nn + nr AS DOUBLE)
                           * CAST(na + nn + nr AS DOUBLE)
                           - CAST(na + nn + nr AS DOUBLE))), 6) AS h_stat
    FROM s, tie
    """,
)
def lineitem_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the three return-flag groups on l_quantity
    — the NONPARAMETRIC sibling of ``lineitem_anova_f`` (rank-based
    one-way ANOVA; completes the family: Mann-Whitney for 2 groups,
    KW for k), with the EXACT tie correction — l_quantity is a 50-value
    integer grid, so ties dominate and the uncorrected H would be badly
    deflated.

    Exactness: mid-ranks come off the VALUE-level CDF (the
    ``lineitem_brown_forsythe`` median discipline): per value q,
    ``midrank = cum_before + (t+1)/2``; doubling clears the half so
    ``mr2 = 2*cum_before + t + 1`` is an exact BIGINT, rank sums
    ``R2_g = Σ c_gq · mr2_q`` exact DECIMAL(38,0) (digit budget:
    c ≤ 1e13 rows · mr2 ≤ 2e13 · 50 values ≈ 1e28 ≪ 1e38), and
    H = [12/(N(N+1)) · Σ (R2_g/2)²/n_g − 3(N+1)] / (1 − Σ(t³−t)/(N³−N))
    is ONE IEEE expression over seven exact integers, written verbatim
    in both engines, rounded 6.

    Scale: one partial-aggregatable (flag, qty) count (≤150 groups), a
    window over the ≤50-row value table, one joined conditional pivot —
    no data-sized shuffle beyond the first count."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity").isNotNull()
                 & F.col("l_returnflag").isin("A", "N", "R")))
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    b = li.select(F.col("l_returnflag").alias("g"),
                  F.col("l_quantity").cast("bigint").alias("q"))
    vc = b.groupBy("g", "q").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tq = vc.groupBy("q").agg(F.sum("c").cast("bigint").alias("t"))
    w_prev = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    mr = tq.select(
        "q", "t",
        (2 * F.coalesce(F.sum("t").over(w_prev), F.lit(0))
         + F.col("t") + 1).alias("mr2"))
    g, c = F.col("g"), F.col("c")
    r2 = (c.cast(dec) * F.col("mr2")).cast(dec)
    s = (vc.join(mr, "q")
         .agg(F.sum(F.when(g == "A", c).otherwise(0)).cast("bigint")
              .alias("na"),
              F.sum(F.when(g == "A", r2)).alias("r2a"),
              F.sum(F.when(g == "N", c).otherwise(0)).cast("bigint")
              .alias("nn"),
              F.sum(F.when(g == "N", r2)).alias("r2n"),
              F.sum(F.when(g == "R", c).otherwise(0)).cast("bigint")
              .alias("nr"),
              F.sum(F.when(g == "R", r2)).alias("r2r")))
    tie = tq.agg(F.sum((F.col("t").cast(dec) * F.col("t") * F.col("t"))
                       .cast(dec) - F.col("t").cast(dec)).alias("tt"))
    n = (F.col("na") + F.col("nn") + F.col("nr")).cast("double")
    n1 = (F.col("na") + F.col("nn") + F.col("nr") + 1).cast("double")
    half = lambda col: F.col(col).cast("double") / 2  # noqa: E731
    grp = (half("r2a") * half("r2a") / F.col("na")
           + half("r2n") * half("r2n") / F.col("nn")
           + half("r2r") * half("r2r") / F.col("nr"))
    h = (12.0 / (n * n1) * grp - 3 * n1) \
        / (1 - F.col("tt").cast("double") / (n * n * n - n))
    return (s.crossJoin(F.broadcast(tie))  # two single-row frames
            .select("na", "nn", "nr", F.round(h, 6).alias("h_stat")))


@workload(
    "orders_lineitem_mutual_info",
    oracle="""
    WITH j AS (
      SELECT o.o_orderpriority AS p, l.l_returnflag AS r
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    cells AS (SELECT p, r, CAST(COUNT(*) AS BIGINT) AS nij
              FROM j GROUP BY 1, 2),
    mp AS (SELECT p, CAST(SUM(nij) AS BIGINT) AS ni FROM cells GROUP BY 1),
    mr AS (SELECT r, CAST(SUM(nij) AS BIGINT) AS nj FROM cells GROUP BY 1),
    nt AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cells),
    mi AS (
      SELECT list(CAST(nij AS DOUBLE) / n
                  * ln(CAST(nij AS DOUBLE) * n
                       / (CAST(ni AS DOUBLE) * nj))
                  ORDER BY p, r) AS mi_t
      FROM cells JOIN mp USING (p) JOIN mr USING (r), nt
    ),
    hp AS (
      SELECT list(-(CAST(ni AS DOUBLE) / n)
                  * ln(CAST(ni AS DOUBLE) / n) ORDER BY p) AS hp_t
      FROM mp, nt
    ),
    hr AS (
      SELECT list(-(CAST(nj AS DOUBLE) / n)
                  * ln(CAST(nj AS DOUBLE) / n) ORDER BY r) AS hr_t
      FROM mr, nt
    ),
    terms AS (
      SELECT (SELECT n FROM nt) AS n_pairs, mi_t, hp_t, hr_t
      FROM mi, hp, hr
    )
    SELECT n_pairs,
           ROUND(list_reduce(list_prepend(0.0, mi_t), (a, x) -> a + x), 6)
             AS mi_nats,
           ROUND(list_reduce(list_prepend(0.0, mi_t), (a, x) -> a + x)
                 / sqrt(list_reduce(list_prepend(0.0, hp_t),
                                    (a, x) -> a + x)
                        * list_reduce(list_prepend(0.0, hr_t),
                                      (a, x) -> a + x)), 6) AS nmi
    FROM terms
    """,
)
def orders_lineitem_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) + normalized MI between order priority
    and line-item return flag — the information-theoretic dependence
    measure next to the chi-squared row (``events_chi2_independence``):
    MI = Σ_ij (n_ij/N)·ln(n_ij·N/(n_i·n_j)) over the 5×3 contingency
    table, NMI = MI/√(H(p)·H(r)).

    Cross-engine float discipline: every term is one IEEE expression
    over exact integers, but MI SUMS ~15 transcendental terms — a bare
    SUM() is accumulation-order-dependent, so the terms ride an ORDERED
    list and a seeded LEFT FOLD (``F.aggregate`` ↔ ``list_reduce``, the
    Kaplan-Meier/Holt discipline) — bitwise identical both engines,
    rounded 6.

    Scale: the orderkey equi-join is the only data-sized op (shuffle or
    AQE-broadcast, Catalyst's choice — no forced hint per r9 verdict
    #2); everything after runs on the ≤15-row cell table and its 5/3-row
    margins (tiny broadcast-sized joins of single-row/few-row frames)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("p"))
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_returnflag").alias("r"))
    cells = (li.join(o, "o_orderkey")
             .groupBy("p", "r")
             .agg(F.count(F.lit(1)).cast("bigint").alias("nij")))
    mp = cells.groupBy("p").agg(F.sum("nij").cast("bigint").alias("ni"))
    mr = cells.groupBy("r").agg(F.sum("nij").cast("bigint").alias("nj"))
    nt = cells.agg(F.sum("nij").cast("bigint").alias("n"))
    mi_term = (F.col("nij").cast("double") / F.col("n")
               * F.log(F.col("nij").cast("double") * F.col("n")
                       / (F.col("ni").cast("double") * F.col("nj"))))
    # ordered-list + seeded left fold: bitwise-identical both engines
    mi_l = (cells.join(mp, "p").join(mr, "r").crossJoin(F.broadcast(nt))
            .agg(F.array_sort(F.collect_list(
                F.struct(F.col("p"), F.col("r"), mi_term.alias("t"))))
                .alias("mi_s")))
    hent = lambda cnt, n: (  # noqa: E731
        -(cnt.cast("double") / n) * F.log(cnt.cast("double") / n))
    hp_l = (mp.crossJoin(F.broadcast(nt))
            .agg(F.array_sort(F.collect_list(F.struct(
                F.col("p"), hent(F.col("ni"), F.col("n")).alias("t"))))
                .alias("hp_s")))
    hr_l = (mr.crossJoin(F.broadcast(nt))
            .agg(F.array_sort(F.collect_list(F.struct(
                F.col("r"), hent(F.col("nj"), F.col("n")).alias("t"))))
                .alias("hr_s")))
    fold = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, lambda s: s["t"]), F.lit(0.0), lambda a, x: a + x)
    mi = fold(F.col("mi_s"))
    hp = fold(F.col("hp_s"))
    hr = fold(F.col("hr_s"))
    return (nt.crossJoin(F.broadcast(mi_l)).crossJoin(F.broadcast(hp_l))
            .crossJoin(F.broadcast(hr_l))  # four single-row frames
            .select(F.col("n").alias("n_pairs"),
                    F.round(mi, 6).alias("mi_nats"),
                    F.round(mi / F.sqrt(hp * hr), 6).alias("nmi")))


@workload(
    "orders_trend_test",
    oracle="""
    WITH rk AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    o AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
             CASE WHEN rk.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS y
      FROM orders LEFT JOIN rk ON rk.l_orderkey = orders.o_orderkey
    ),
    g AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS r
      FROM o GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(r) AS BIGINT) AS rr,
             SUM(CAST(s AS HUGEINT) * r) AS sr,
             SUM(CAST(s AS HUGEINT) * n) AS sn,
             SUM(CAST(s AS HUGEINT) * s * n) AS snn
      FROM g
    )
    SELECT nn AS n_orders, rr AS n_returned,
           ROUND(CAST(nn * sr - rr * sn AS DOUBLE)
                 / sqrt(CAST(rr AS DOUBLE) * (nn - rr)
                        * CAST(nn * snn - sn * sn AS DOUBLE) / nn), 6)
             AS z_trend
    FROM t
    """,
)
def orders_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does the probability that an order
    has a RETURNED line item trend monotonically with order priority
    (the ordinal 1-URGENT .. 5-LOW scale)?  The ORDERED sibling of the
    chi-squared independence row — chi² asks "dependent at all", CA
    asks "does risk trend with the ordinal score", the standard
    dose-response screen.  Scores are the priority's leading digit;
    outcome is an EXISTS against the 'R' line items (left-semi shape).

    Exactness: clearing p̄ = R/N through numerator and variance gives
    z = (N·Σsr − R·Σsn) / √(R(N−R)(N·Σns² − (Σns)²)/N) — ONE IEEE
    expression over five exact integers (DECIMAL(38,0) digit budget:
    N·Σns² ≤ 25N² ≈ 2.5e25 at 10¹² orders — wide margin).

    Scale: one distinct-projection of returned orderkeys, one orderkey
    equi-join (shuffle or AQE-broadcast, Catalyst's choice), one 5-group
    aggregate, one pivot row."""
    dec = "decimal(38,0)"
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rk = (li.where(F.col("l_returnflag") == "R")
          .select(F.col("l_orderkey").alias("o_orderkey")).distinct()
          .withColumn("y", F.lit(1)))
    o = (orders.select("o_orderkey",
                       F.substring("o_orderpriority", 1, 1).cast("bigint")
                       .alias("s"))
         .join(rk, "o_orderkey", "left")
         .select("s", F.coalesce(F.col("y"), F.lit(0)).alias("y")))
    g = o.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                           F.sum("y").cast("bigint").alias("r"))
    s = F.col("s").cast(dec)
    t = g.agg(F.sum("n").cast("bigint").alias("nn"),
              F.sum("r").cast("bigint").alias("rr"),
              F.sum(s * F.col("r")).alias("sr"),
              F.sum(s * F.col("n")).alias("sn"),
              F.sum(s * F.col("s") * F.col("n")).alias("snn"))
    nn, rr = F.col("nn"), F.col("rr")
    num = (nn.cast(dec) * F.col("sr") - rr.cast(dec) * F.col("sn"))
    var = (rr.cast("double") * (nn - rr)
           * (nn.cast(dec) * F.col("snn")
              - F.col("sn") * F.col("sn")).cast("double") / nn)
    return t.select(nn.alias("n_orders"), rr.alias("n_returned"),
                    F.round(num.cast("double") / F.sqrt(var), 6)
                    .alias("z_trend"))


@workload(
    "lineitem_decision_stump",
    oracle="""
    WITH b AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem WHERE l_quantity IS NOT NULL
    ),
    vc AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(y) AS BIGINT) AS r
           FROM b GROUP BY 1),
    cum AS (
      SELECT q,
             SUM(n) OVER (ORDER BY q) AS nl,
             SUM(r) OVER (ORDER BY q) AS rl,
             SUM(n) OVER () AS nt, SUM(r) OVER () AS rt
      FROM vc
    ),
    cand AS (
      SELECT q AS threshold,
             CAST(nl AS BIGINT) AS n_left, CAST(rl AS BIGINT) AS r_left,
             CAST(nt - nl AS BIGINT) AS n_right,
             CAST(rt - rl AS BIGINT) AS r_right,
             CAST(nt AS BIGINT) AS nt, CAST(rt AS BIGINT) AS rt
      FROM cum WHERE nl < nt
    ),
    scored AS (
      SELECT threshold, n_left, r_left, n_right, r_right, nt, rt,
             2.0 * r_left * (n_left - r_left) / n_left / nt
             + 2.0 * r_right * (n_right - r_right) / n_right / nt
               AS imp
      FROM cand
    )
    SELECT threshold, n_left, r_left, n_right, r_right,
           ROUND(imp, 6) AS gini_split,
           ROUND(2.0 * rt * (nt - rt) / nt / nt, 6) AS gini_root,
           ROUND(2.0 * rt * (nt - rt) / nt / nt - imp, 6) AS gain
    FROM scored ORDER BY imp, threshold LIMIT 1
    """,
)
def lineitem_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single decision stump "quantity ≤ t" for predicting a
    returned line item (l_returnflag = 'R') — the CART split-finding
    primitive a distributed tree trainer runs per node: for every
    candidate threshold the weighted Gini impurity
    2·rL(nL−rL)/(nL·N) + 2·rR(nR−rR)/(nR·N), argmin with a
    deterministic (impurity, threshold) tie-break.

    Exactness: candidates come off the ≤50-row value-level CDF (the
    Brown-Forsythe/Kruskal discipline); every impurity is the SAME IEEE
    expression over exact integers in both engines, so the argmin —
    compared on identical doubles — is engine-independent; reported
    impurities round 6.

    Scale: one partial-aggregatable (qty → n, R-count) collapse, a
    window over the bounded value table, a 49-candidate TakeOrdered —
    the full stump search costs one scan regardless of corpus size."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").isNotNull())
    b = li.select(F.col("l_quantity").cast("bigint").alias("q"),
                  F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
                  .alias("y"))
    vc = b.groupBy("q").agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                            F.sum("y").cast("bigint").alias("r"))
    w_cum = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = vc.select(
        "q",
        F.sum("n").over(w_cum).alias("nl"),
        F.sum("r").over(w_cum).alias("rl"),
        F.sum("n").over(w_all).alias("nt"),
        F.sum("r").over(w_all).alias("rt"))
    cand = (cum.where(F.col("nl") < F.col("nt"))
            .select(F.col("q").alias("threshold"),
                    F.col("nl").cast("bigint").alias("n_left"),
                    F.col("rl").cast("bigint").alias("r_left"),
                    (F.col("nt") - F.col("nl")).cast("bigint")
                    .alias("n_right"),
                    (F.col("rt") - F.col("rl")).cast("bigint")
                    .alias("r_right"),
                    F.col("nt").cast("bigint").alias("nt"),
                    F.col("rt").cast("bigint").alias("rt")))
    imp = (2.0 * F.col("r_left") * (F.col("n_left") - F.col("r_left"))
           / F.col("n_left") / F.col("nt")
           + 2.0 * F.col("r_right") * (F.col("n_right") - F.col("r_right"))
           / F.col("n_right") / F.col("nt"))
    root = (2.0 * F.col("rt") * (F.col("nt") - F.col("rt"))
            / F.col("nt") / F.col("nt"))
    return (cand.withColumn("imp", imp)
            .orderBy("imp", "threshold").limit(1)
            .select("threshold", "n_left", "r_left", "n_right", "r_right",
                    F.round(F.col("imp"), 6).alias("gini_split"),
                    F.round(root, 6).alias("gini_root"),
                    F.round(root - F.col("imp"), 6).alias("gain")))


@workload(
    "part_copurchase_pairs",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    nt AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
           FROM op),
    pf AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS np
           FROM op GROUP BY 1),
    pr AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS nab
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT part_a, part_b, nab,
           ROUND(CAST(nab AS DOUBLE) / n_orders, 6) AS support,
           ROUND(CAST(nab AS DOUBLE) * n_orders
                 / (CAST(fa.np AS DOUBLE) * fb.np), 6) AS lift
    FROM pr JOIN pf fa ON fa.l_partkey = pr.part_a
            JOIN pf fb ON fb.l_partkey = pr.part_b, nt
    """,
)
def part_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase part pairs ("customers who bought A also bought B"):
    all part pairs appearing together in ≥3 orders, with support and
    lift against the single-part order frequencies — the RELATIONAL
    market-basket twin of ``token_association_rules`` (tokens → parts,
    docs → orders), and a real join-scale exercise: the within-order
    self-join's candidate volume is Σ C(k_o, 2) over per-order distinct
    part counts — TPC-H orders carry ≤13 line items (measured), so the
    fanout is ≤78 pairs/order, LINEAR in the fact table, never a
    cross join.  At web-scale basket sizes a k-budget guard would cap a
    degenerate order (the association-triples k≤256 discipline);
    unneeded at TPC-H multiplicities, documented.

    Scale: one distinct-projection, one orderkey equi-shuffle for the
    pair enumeration (skew bounded by the largest single order), one
    pair aggregate, two part-keyed frequency joins (no forced
    broadcast — r9 verdict #2)."""
    li = load_table(spark, sf_dir, "lineitem")
    # r13 wave 6 (in-row pair enumeration, the association-triples
    # discipline): ONE groupBy(l_orderkey).collect_set shuffle replaces
    # the old distinct-projection + orderkey self-join — collect_set
    # dedups map-side (partial aggregation), the sorted per-order array
    # enumerates exactly the part_a < part_b pairs the self-join
    # produced, and all three consumers (pair stream, part frequencies,
    # order total) read the SAME grouped exchange instead of separate
    # distinct/join subtrees.  Bitwise-identical outputs (oracle
    # re-verified sf0.001 + sf0.01).
    from ophidia_io_server_spark.pin import pinned
    sets = pinned(li.groupBy("l_orderkey")
                  .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")),
                  "copurchase per-order part sets: 3 consumers")
    nt = sets.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    pf = (sets.select(F.explode("ps").alias("l_partkey"))
          .groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint")
                                    .alias("np")))
    k = F.size("ps")
    pairs_per_order = F.flatten(F.transform(
        F.sequence(F.lit(1), k - 1),
        lambda i: F.transform(
            F.sequence(i + 1, k),
            lambda j: F.struct(
                F.element_at("ps", i.cast("int")).alias("part_a"),
                F.element_at("ps", j.cast("int")).alias("part_b")))))
    pr = (sets.where(k >= 2)
          .select(F.explode(pairs_per_order).alias("p"))
          .select("p.part_a", "p.part_b")
          .groupBy("part_a", "part_b")
          .agg(F.count(F.lit(1)).cast("bigint").alias("nab"))
          .where(F.col("nab") >= 3))
    fa = pf.select(F.col("l_partkey").alias("part_a"),
                   F.col("np").alias("na"))
    fb = pf.select(F.col("l_partkey").alias("part_b"),
                   F.col("np").alias("nb"))
    return (pr.join(fa, "part_a").join(fb, "part_b")
            .crossJoin(F.broadcast(nt))  # single-row total
            .select("part_a", "part_b", "nab",
                    F.round(F.col("nab").cast("double")
                            / F.col("n_orders"), 6).alias("support"),
                    F.round(F.col("nab").cast("double") * F.col("n_orders")
                            / (F.col("na").cast("double") * F.col("nb")),
                            6).alias("lift")))


@workload(
    "orders_cohort_ltv",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    fc AS (SELECT o_custkey, CAST(min(m) AS BIGINT) AS cohort
           FROM o GROUP BY 1),
    cs AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
           FROM fc GROUP BY 1),
    cell AS (
      SELECT fc.cohort, CAST(o.m - fc.cohort AS BIGINT) AS age_months,
             CAST(SUM(o.cents) AS BIGINT) AS revenue_cents,
             CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active
      FROM o JOIN fc ON fc.o_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT cohort, age_months, n_customers, n_active, revenue_cents,
           CAST(SUM(revenue_cents) OVER (
                  PARTITION BY cohort ORDER BY age_months) AS BIGINT)
             AS cum_revenue_cents
    FROM cell JOIN cs USING (cohort)
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-cohort lifetime-value curve: customers cohort by the
    calendar month of their FIRST order; per (cohort, months-since-
    cohort) cell the active-customer count, revenue, and the cohort's
    RUNNING cumulative revenue — the standard LTV / retention-revenue
    triangle next to the weekly ``events_retention_cohorts`` row
    (orders-money instead of events-activity).

    Exactness: pure exact integers — month index = 12y + m − 1, cents
    on the exact grid, one cumulative window; no floats anywhere.

    Scale: one per-customer min (partial-aggregatable), one custkey
    equi-join (shuffle or AQE-broadcast — Catalyst's choice), one
    (cohort, age) aggregate; the cumulative window partitions by
    cohort over the ≤(months)² triangle — calendar-bounded (an 80-month
    corpus is ≤3240 cells), never data-sized."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    fc = o.groupBy("o_custkey").agg(F.min("m").cast("bigint")
                                    .alias("cohort"))
    cs = fc.groupBy("cohort").agg(F.count(F.lit(1)).cast("bigint")
                                  .alias("n_customers"))
    cell = (o.join(fc, "o_custkey")
            .groupBy("cohort",
                     (F.col("m") - F.col("cohort")).cast("bigint")
                     .alias("age_months"))
            .agg(F.sum("cents").cast("bigint").alias("revenue_cents"),
                 F.countDistinct("o_custkey").cast("bigint")
                 .alias("n_active")))
    w = Window.partitionBy("cohort").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, 0)
    return (cell.join(cs, "cohort")
            .select("cohort", "age_months", "n_customers", "n_active",
                    "revenue_cents",
                    F.sum("revenue_cents").over(w).cast("bigint")
                    .alias("cum_revenue_cents")))


@workload(
    "part_abc_classification",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS revenue_cents
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(revenue_cents) AS BIGINT) AS t FROM pr),
    c AS (
      SELECT l_partkey, revenue_cents,
             CAST(SUM(revenue_cents) OVER (
                    ORDER BY revenue_cents DESC, l_partkey) AS BIGINT)
               AS cum_cents
      FROM pr
    )
    SELECT l_partkey, revenue_cents, cum_cents,
           CASE WHEN 5 * cum_cents <= 4 * t THEN 'A'
                WHEN 20 * cum_cents <= 19 * t THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c, tot
    """,
)
def part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification of parts by revenue: rank
    parts by revenue descending, class A while the running revenue
    share is ≤ 80%, B to 95%, C after — the standard purchasing /
    catalog-curation cut, and another consumer of the DISTRIBUTED
    prefix-sum (``operators/ranking.py::global_prefix_sum`` over the
    (−revenue, partkey) total order — a bare ``SUM() OVER (ORDER BY)``
    would be ONE task at 100 TB, the r9-verdict scale-killer class the
    WOE/RFM/Gini rows already avoid).

    Exactness: thresholds compare exact integers with cleared
    denominators (5·cum ≤ 4·T ⟺ share ≤ 0.8) — no float ever decides a
    class; (revenue DESC, partkey) is a total order so the running sum
    is engine-independent under ties.

    Scale: one partkey-keyed revenue aggregate, one two-phase
    range-partition prefix sum (per-partition sums + ≤P-row offset
    broadcast), zero single-task stages."""
    from ophidia_io_server_spark.operators.ranking import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    pr = (li.groupBy("l_partkey")
          .agg(F.sum(F.round(F.col("l_extendedprice") * 100)
                     .cast("bigint")).cast("bigint")
               .alias("revenue_cents")))
    keyed = pr.withColumn("neg_rev", -F.col("revenue_cents"))
    # T comes off the prefix sum's own offset collect (return_total) and
    # is inlined as a literal — the old separate 1-row total aggregate
    # re-executed the whole per-part revenue collapse a second time
    # (pr was unpinned) and added a broadcast build to the final plan
    c, t = global_prefix_sum(keyed, ["neg_rev", "l_partkey"],
                             "revenue_cents", cum_col="cum_cents",
                             return_total=True)
    t = int(t)
    return (c.select("l_partkey", "revenue_cents",
                     F.col("cum_cents").cast("bigint").alias("cum_cents"),
                     F.when(5 * F.col("cum_cents") <= F.lit(4 * t), "A")
                     .when(20 * F.col("cum_cents") <= F.lit(19 * t), "B")
                     .otherwise("C").alias("abc_class")))


@workload(
    "lineitem_discount_elasticity",
    oracle="""
    WITH b AS (
      SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
      WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL
    ),
    cells AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sq
      FROM b GROUP BY 1
    ),
    qq AS (SELECT SUM(CAST(q AS HUGEINT) * q) AS syy,
                  CAST(COUNT(*) AS BIGINT) AS nn,
                  CAST(SUM(q) AS BIGINT) AS sy
           FROM b),
    s AS (
      SELECT SUM(CAST(d AS HUGEINT) * n) AS sx,
             SUM(CAST(d AS HUGEINT) * d * n) AS sxx,
             SUM(CAST(d AS HUGEINT) * sq) AS sxy
      FROM cells
    )
    SELECT nn AS n_rows,
           ROUND(CAST(nn * sxy - sx * sy AS DOUBLE)
                 / CAST(nn * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND((sy - CAST(nn * sxy - sx * sy AS DOUBLE)
                       / CAST(nn * sxx - sx * sx AS DOUBLE) * sx) / nn,
                 6) AS intercept,
           ROUND(CAST(nn * sxy - sx * sy AS DOUBLE)
                 * CAST(nn * sxy - sx * sy AS DOUBLE)
                 / (CAST(nn * sxx - sx * sx AS DOUBLE)
                    * CAST(nn * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM s, qq
    """,
)
def lineitem_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-response regression: OLS of quantity on the discount
    level (an 11-value integer grid, 0..10 discount points) — "does a
    deeper discount move more units", the pricing-analytics primitive
    next to the 2-feature ``lineitem_ols_regression``.  Everything
    reduces over the bounded (discount, quantity-sum) cell table plus
    one global Σq² — five exact DECIMAL moments, then slope/intercept/
    R² as single IEEE expressions (identical formula text both
    engines), rounded 6.

    Scale: one partial-aggregatable 11-cell collapse + one scan-only
    moment aggregate; no joins, no windows."""
    dec = "decimal(38,0)"
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_discount").isNotNull()
                 & F.col("l_quantity").isNotNull()))
    b = li.select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("d"),
        F.col("l_quantity").cast("bigint").alias("q"))
    cells = b.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sq"))
    qq = b.agg(F.sum(F.col("q").cast(dec) * F.col("q")).alias("syy"),
               F.count(F.lit(1)).cast("bigint").alias("nn"),
               F.sum("q").cast("bigint").alias("sy"))
    d = F.col("d").cast(dec)
    s = cells.agg(F.sum(d * F.col("n")).alias("sx"),
                  F.sum(d * F.col("d") * F.col("n")).alias("sxx"),
                  F.sum(d * F.col("sq")).alias("sxy"))
    nn = F.col("nn").cast(dec)
    num = (nn * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (nn * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (nn * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (s.crossJoin(F.broadcast(qq))  # two single-row frames
            .select(F.col("nn").alias("n_rows"),
                    F.round(num / den, 6).alias("slope"),
                    F.round((F.col("sy") - num / den * F.col("sx"))
                            / F.col("nn"), 6).alias("intercept"),
                    F.round(num * num / (den * deny), 6).alias("r2")))


@workload(
    "orders_yoy_growth",
    oracle="""
    WITH m AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mo,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS revenue_cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT CAST(a.mo AS BIGINT) AS month_idx, a.n_orders,
           a.revenue_cents,
           b.revenue_cents AS prev_year_cents,
           CASE WHEN b.revenue_cents > 0
                THEN ROUND(CAST(a.revenue_cents - b.revenue_cents
                                AS DOUBLE) / b.revenue_cents, 6)
           END AS yoy_growth
    FROM m a LEFT JOIN m b ON b.mo = a.mo - 12
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth — the first chart on
    any revenue dashboard: month index (12y + m − 1), exact-cents
    revenue, the same month last year via a self-join on mo − 12
    (calendar-safe where month arithmetic on dates is not), and the
    growth rate as one IEEE division (NULL for months without a prior
    year, by the same integer predicate both engines).

    Scale: one partial-aggregatable month collapse (span-bounded ≤ a
    few thousand rows for decades), then a self-join on the bounded
    month table."""
    orders = load_table(spark, sf_dir, "orders")
    m = (orders.groupBy((F.year("o_orderdate") * 12
                         + F.month("o_orderdate") - 1).alias("mo"))
         .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
              .cast("bigint").alias("revenue_cents"),
              F.count(F.lit(1)).cast("bigint").alias("n_orders")))
    b = m.select(F.col("mo").alias("mo_b"),
                 F.col("revenue_cents").alias("prev_year_cents"))
    return (m.join(b, m["mo"] - 12 == b["mo_b"], "left")
            .select(F.col("mo").cast("bigint").alias("month_idx"),
                    "n_orders", "revenue_cents", "prev_year_cents",
                    F.when(F.col("prev_year_cents") > 0,
                           F.round((F.col("revenue_cents")
                                    - F.col("prev_year_cents"))
                                   .cast("double")
                                   / F.col("prev_year_cents"), 6))
                    .alias("yoy_growth")))


@workload(
    "orders_reorder_exponential",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             epoch_us(o_orderdate) // 86400000000 AS day,
             lead(epoch_us(o_orderdate) // 86400000000) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS nxt
      FROM orders
    ),
    g AS (SELECT nxt - day AS gap FROM o
          WHERE nxt IS NOT NULL AND nxt > day),
    vc AS (SELECT gap, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                 CAST(SUM(gap * c) AS BIGINT) AS s FROM vc),
    ks AS (
      SELECT gap, c,
             SUM(c) OVER (ORDER BY gap) AS cum,
             t.n, t.s
      FROM vc, t
    )
    SELECT (SELECT n FROM t) AS n_gaps,
           ROUND((SELECT CAST(n AS DOUBLE) / s FROM t), 6)
             AS lambda_per_day,
           ROUND(max(greatest(
             abs(CAST(cum AS DOUBLE) / n
                 - (1 - exp(-(CAST(n AS DOUBLE) / s) * gap))),
             abs(CAST(cum - c AS DOUBLE) / n
                 - (1 - exp(-(CAST(n AS DOUBLE) / s) * gap))))), 6)
             AS ks_stat
    FROM ks
    """,
)
def orders_reorder_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential fit of customer REORDER gaps (days between a
    customer's consecutive orders) with the Kolmogorov-Smirnov distance
    to the fitted CDF — the classic "is reordering memoryless" check
    behind inter-purchase-time models: λ̂ = n/Σgaps (the MLE), and
    KS = max over distinct gaps of the empirical-vs-F(gap) gap, taking
    both CDF sides at each atom (the discrete-data convention —
    one-sided KS understates on ties).

    Float discipline: λ̂ and every empirical CDF value are single IEEE
    expressions over exact integers; the exp() term is the identical
    expression both engines; the max over the bounded distinct-gap
    table compares identical doubles; rounded 6.

    Scale: one per-customer lead window (user-keyed, the sessionize
    shape), one partial-aggregatable gap-value collapse, then all math
    on the bounded distinct-gap table (≤ calendar-span days)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    day = F.expr("unix_micros(cast(o_orderdate as timestamp))"
                 " div 86400000000")
    # same-day orders make a bare date ordering ambiguous — the orderkey
    # tie-break mirrors the oracle's (o_orderdate, o_orderkey); day is a
    # monotone image of o_orderdate (midnight dates), so ordering by it
    # is the same total order
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    o = (orders.select("o_custkey", "o_orderkey", day.alias("day"))
         .withColumn("nxt", F.lead("day").over(w)))
    g = o.where(F.col("nxt").isNotNull()
                & (F.col("nxt") > F.col("day"))) \
        .select((F.col("nxt") - F.col("day")).alias("gap"))
    vc = g.groupBy("gap").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    t = vc.agg(F.sum("c").cast("bigint").alias("n"),
               F.sum(F.col("gap") * F.col("c")).cast("bigint").alias("s"))
    w_cum = Window.orderBy("gap").rowsBetween(Window.unboundedPreceding, 0)
    ks = (vc.withColumn("cum", F.sum("c").over(w_cum))
          .crossJoin(F.broadcast(t)))
    lam = F.col("n").cast("double") / F.col("s")
    fexp = 1 - F.exp(-lam * F.col("gap"))
    d = F.greatest(
        F.abs(F.col("cum").cast("double") / F.col("n") - fexp),
        F.abs((F.col("cum") - F.col("c")).cast("double") / F.col("n")
              - fexp))
    return (ks.agg(F.max("n").cast("bigint").alias("n_gaps"),
                   F.round(F.max(lam), 6).alias("lambda_per_day"),
                   F.round(F.max(d), 6).alias("ks_stat")))
