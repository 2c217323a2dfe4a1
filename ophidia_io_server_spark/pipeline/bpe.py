"""Distributed BPE (byte-pair-encoding) vocabulary training — the
tokenizer-learning step of a training-data pipeline (Sennrich et al. 2016).

Scale design — the iteration state is the WORD-TYPE table, not the corpus:

- One corpus pass builds ``(word, freq)`` (a groupBy; map-side combined).
  Everything after operates on distinct word types weighted by ``freq`` —
  for natural text that is orders of magnitude smaller than the corpus
  and *shrinks* as merges proceed.
- Each merge round is: explode adjacent symbol pairs (narrow) → one
  count shuffle → collect exactly ONE row (the argmax pair, ties broken
  lexicographically so runs are reproducible) → apply the merge with a
  pure-Column left-to-right fold (``F.aggregate`` state machine — no
  Python worker in the loop).
- Lineage is flattened with ``localCheckpoint`` every few rounds, the
  same discipline as the connected-components loop in
  ``pipeline/dedup.py`` — without it 1000 merges would stack 1000 plan
  layers.

Greedy-left-to-right semantics match the reference algorithm: within one
round a merged token does not re-merge (``xxx`` + merge (x,x) → ``xx x``),
and the merge applies to every word type simultaneously.  The differential
test pins the full merge SEQUENCE against a pure-Python Sennrich
implementation, not just the final vocab.

No SQL oracle: iterative argmax training is not expressible in one DuckDB
query (the driver gate carries it as pytest coverage; the invariants row
``bpe_train_invariants`` — deterministic merges, monotone compression —
covers it in the gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.text import tokens_col
from ophidia_io_server_spark.sources.tables import spread


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the one corpus-sized pass."""
    return (
        spread(docs).where(F.col(text_col).isNotNull())
        .select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _apply_merge(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right single-pair merge as a pure-Column fold."""
    merged = a + b
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        take = acc["prev"].isNotNull() & (acc["prev"] == a) & (s == b)
        return F.struct(
            F.when(take, F.concat(acc["out"], F.array(F.lit(merged))))
            .when(acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"])))
            .otherwise(acc["out"]).alias("out"),
            F.when(take, F.lit(None).cast("string")).otherwise(s).alias("prev"),
        )

    def finish(acc):
        return F.when(acc["prev"].isNotNull(),
                      F.concat(acc["out"], F.array(acc["prev"]))
                      ).otherwise(acc["out"])

    return F.aggregate(symbols, acc0, step, finish)


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merges, final word-type table
    ``(word, freq, symbols)``).  Stops early when no adjacent pair reaches
    ``min_pair_freq`` (merging hapax pairs only memorizes the corpus)."""
    wf = word_freqs(docs, text_col).withColumn(
        "symbols", F.split(F.col("word"), "")).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        pairs = (
            wf.select(
                "freq",
                F.explode(
                    F.when(F.size("symbols") >= 2, F.transform(
                        F.sequence(F.lit(1), (F.size("symbols") - 1)),
                        lambda i: F.struct(
                            F.element_at("symbols", i.cast("int")).alias("a"),
                            F.element_at("symbols", (i + 1).cast("int")).alias("b"),
                        ),
                    )).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                ).alias("p"),
            )
            .groupBy("p.a", "p.b").agg(F.sum("freq").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc()) \
                   .limit(1).collect()
        if not top or top[0]["c"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        wf = wf.withColumn("symbols", _apply_merge(F.col("symbols"), a, b))
        if (r + 1) % checkpoint_every == 0:
            wf = wf.localCheckpoint()
    return merges, wf


def encode_with_merges(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Tokenize a text Column with a learned merge list: whitespace words →
    characters → merges replayed in training order.  Pure Column — the
    merge list compiles into a chain of folds (fine for the few-hundred-
    merge vocabs these tests train; a production encoder would use a
    Pandas-UDF trie for 50k merges)."""
    words = tokens_col(text)
    enc = F.transform(words, lambda w: F.split(w, ""))
    for a, b in merges:
        enc = F.transform(enc, lambda s: _apply_merge(s, a, b))
    return F.flatten(enc)


def encode_with_merges_arrow(text_col_name: str, merges: list[tuple[str, str]]):
    """Production-path encoder for LARGE merge lists: a rank-table greedy
    merger inside an Arrow-batched pandas UDF.

    ``encode_with_merges`` compiles one Catalyst fold PER MERGE — fine for
    the few-hundred-merge vocabs the tests train, quadratic-ish plan size
    at tokenizer scale (50k merges).  This variant ships the merge-rank
    dict to executors once (closure broadcast) and applies the standard
    iterative lowest-rank-pair merge per word — the algorithm GPT-2's
    encoder uses — so plan size is O(1) in vocab size and the per-batch
    cost is pure Python/NumPy on Arrow batches.

    Returns a Column expression usable in ``select``:
    ``df.select(encode_with_merges_arrow("text", merges).alias("toks"))``.
    Semantics are pinned identical to ``encode_with_merges`` by test.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rank = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        sym = list(word)
        while len(sym) > 1:
            best, best_r = None, None
            for i in range(len(sym) - 1):
                r = rank.get((sym[i], sym[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best, best_r = i, r
            if best is None:
                break
            a, b = merges[best_r]
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    # no type annotations on the UDF: `from __future__ import annotations`
    # stringifies them and pyspark's hint introspection can't resolve
    # locally-imported names from strings
    @pandas_udf("array<string>")
    def enc(texts):
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in t.split(" "):
                if not w:
                    continue
                if w not in cache:
                    cache[w] = encode_word(w)
                toks.extend(cache[w])
            out.append(toks)
        return pd.Series(out)

    return enc(F.col(text_col_name))
