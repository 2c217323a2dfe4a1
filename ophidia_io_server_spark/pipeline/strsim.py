"""String-similarity self-join under an edit-distance threshold —
the PassJoin family (Li, Deng, Feng, Wang: *PASS-JOIN: A
Partition-based Method for Similarity Joins*, PVLDB 2011), implemented
as pure Catalyst expressions (no UDFs, no all-pairs).

Why not all-pairs + ``levenshtein``: a fuzzy join over n distinct
strings is O(n²) pairs — at vocabulary scale (10⁸ distinct strings on a
100 TB corpus) that is 10¹⁶ verifications.  PassJoin's pigeonhole
bound replaces it with an inverted-index equi-join:

  * partition every indexed string of length ℓ into τ+1 segments (even
    scheme: ℓ mod (τ+1) trailing segments one char longer).  If
    ed(s, b) ≤ τ, at least one of b's τ+1 segments is untouched by all
    τ edits, so it appears EXACTLY in s — displaced by at most τ
    positions (each edit shifts later characters by ≤ 1);
  * probe side: for each string s, enumerate the ≤ (τ+1)²·(2τ+1)
    substrings that could equal a segment of a partner of length
    ℓ' ∈ [len(s)−τ, len(s)] (probing only toward shorter-or-equal
    partners halves the work: the longer side of every pair does the
    probing) and equi-join on (segment, segment-index, ℓ');
  * verify surviving candidate pairs with the BANDED ``levenshtein(s, t,
    threshold)`` (O(τ·len) per pair, JVM-side).

Per-string probe volume is a constant in τ, so the whole join is one
distinct-aggregation, one constant-fanout explode, one equi-join and a
verification filter — every stage shuffles O(n·τ²) rows, never O(n²).

Strings shorter than τ+1 produce zero-length segments whose probe keys
degenerate to ("", i, ℓ') — i.e. an automatic length-bucket fallback for
tiny strings (complete, and bounded by the count of short strings).

Unicode semantics: Spark's ``length``/``substr``/``levenshtein`` all
operate on CODEPOINTS, so the operator is internally consistent for any
unicode input (the hypothesis differential includes a non-ASCII
character).  Cross-engine caveat for oracle authors: DuckDB's
``levenshtein`` counts BYTES ('café'→'cafe' is 2 there, 1 here), so a
DuckDB differential is only byte-for-byte valid on ASCII vocabularies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_self_join(df: DataFrame, str_col: str, tau: int) -> DataFrame:
    """All unordered pairs of DISTINCT non-null values of ``str_col``
    within Levenshtein distance ``tau`` (> 0).

    Returns ``(a, b, dist)`` with ``a < b`` lexicographically and
    ``dist`` the exact edit distance (1 ≤ dist ≤ tau; identical values
    were collapsed by the distinct, so 0 never appears).
    """
    if tau < 1:
        raise ValueError(f"tau must be >= 1, got {tau}")
    k = tau + 1
    # Pin the dictionary: it feeds both the index and the probe side, and
    # without the pin each side re-executes the caller's corpus scan +
    # distinct exchange (AQE rarely grants ReusedExchange across the two
    # consumers).  The dictionary is vocabulary-bounded — far smaller
    # than the corpus that produces it.
    from ophidia_io_server_spark.pin import pinned
    from ophidia_io_server_spark.sources.tables import spread

    # spread after the pin (r13 opt): the distinct exchange AQE-coalesces
    # the dictionary to one/few partitions, and BOTH downstream exploders
    # fan it out ~(τ+1)²·(2τ+1)× with per-row substr work before the
    # segment join — measured single-core at sf0.1 (the same
    # enumeration-parallelism lesson as the Apriori triple row).  At real
    # vocabulary scale the dictionary already spans many partitions and
    # spread no-ops.
    d = spread(pinned(
        df.select(F.col(str_col).cast("string").alias("s"))
        .where(F.col("s").isNotNull()).distinct()
        .withColumn("slen", F.length("s")),
        "PassJoin dictionary: feeds both the segment index and probe sides"))

    # ---- index side: the tau+1 even-scheme segments of every string ----
    # (the expressions below resolve against whichever frame they are
    # used in: "slen" is the string's own length on the index side and
    # the PARTNER length on the probe side — same geometry both ways)
    a_ = F.expr(f"slen div {k}").cast("int")        # short-segment length
    r_ = F.col("slen") % k                          # count of long segments
    nshort = F.lit(k) - r_
    i_ = F.col("i")
    seg_pos = F.when(i_ < nshort, i_ * a_).otherwise(
        nshort * a_ + (i_ - nshort) * (a_ + 1))
    seg_len = F.when(i_ < nshort, a_).otherwise(a_ + 1)
    idx = (d.select("s", "slen",
                    F.explode(F.sequence(F.lit(0), F.lit(tau))).alias("i"))
           .withColumn("seg", F.col("s").substr(seg_pos + 1, seg_len)))

    # ---- probe side: candidate substrings toward shorter-or-equal partners ----
    probe = (
        d.select(F.col("s").alias("t"), F.col("slen").alias("m"),
                 F.explode(F.sequence(F.lit(0), F.lit(tau))).alias("dl"))
        .withColumn("slen", F.col("m") - F.col("dl"))  # partner length
        .where(F.col("slen") >= 0)
        .select("t", "m", "slen",
                F.explode(F.sequence(F.lit(0), F.lit(tau))).alias("i"))
        .withColumn("p0", seg_pos)      # same geometry, from partner length
        .withColumn("L", seg_len)
        .select("t", "m", "slen", "i", "p0", "L",
                F.explode(F.sequence(F.lit(-tau), F.lit(tau))).alias("sh"))
        .withColumn("p", F.col("p0") + F.col("sh"))
        .where((F.col("p") >= 0) & (F.col("p") + F.col("L") <= F.col("m")))
        .withColumn("seg", F.col("t").substr(F.col("p") + 1, F.col("L")))
    )

    cand = (
        probe.join(idx, on=["seg", "i", "slen"])
        # equal lengths pair exactly once (each side probes; keep s < t),
        # and a string never pairs with itself
        .where((F.col("slen") < F.col("m")) |
               ((F.col("slen") == F.col("m")) & (F.col("s") < F.col("t"))))
        .select("s", "t").distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("s", "t", tau).cast("bigint"))
        .where(F.col("dist") >= 0)
        .select(F.least("s", "t").alias("a"),
                F.greatest("s", "t").alias("b"), "dist")
    )
