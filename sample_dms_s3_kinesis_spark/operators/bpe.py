"""Distributed BPE tokenizer induction and application.

Byte-pair encoding (Sennrich et al. 2016) learns a subword vocabulary
by repeatedly merging the most frequent adjacent symbol pair.  The
reference engine has no tokenizer story (its scalar surface is SURVEY
§2.8); this is a north-star training-data operator: the tokenizer a
pipeline trains ON the corpus it just curated.

Scale shape — the crucial observation is that BPE statistics live on
the WEIGHTED VOCABULARY (distinct word, count), not the corpus:

- ``word_counts``: one corpus-wide shuffle on the word (map-side
  combined groupBy).  100 TB of text reduces to the distinct-word
  table (Heaps' law: ~10-100 M rows), and every later pass touches
  only that.
- ``bpe_train_merges``: per merge round, one bounded explode of
  adjacent symbol pairs over the vocabulary (≤ word-length rows per
  word), a map-side-combined pair-count aggregate, and a top-1 via
  TakeOrderedAndProject — the driver receives exactly ONE row per
  round (the argmax pair), never the vocabulary.  The merge rewrite is
  a pure Catalyst array fold (no UDF); the vocab frame is
  local-checkpointed each round so neither lineage nor the expression
  tree compounds across iterations.
- ``bpe_encode``: application is inherently iterative per word
  (priority-ordered merges), which Catalyst cannot express — this is
  the documented Arrow-batched ``mapInPandas`` escape hatch (same
  policy as operators/multimodal.py), with a per-batch word→pieces
  memo so Zipf-distributed text pays the loop once per DISTINCT word
  per batch.

Determinism: ties on pair count break lexicographically on (left,
right), so the merge list is a pure function of the corpus — identical
under any partitioning, re-run, or engine placement.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

import logging

from sample_dms_s3_kinesis_spark.operators.dedup import _cut_lineage
from sample_dms_s3_kinesis_spark.operators.partitioning import spread
from sample_dms_s3_kinesis_spark.operators.text import _bind
from sample_dms_s3_kinesis_spark.operators.text import tokens

_LOG = logging.getLogger("sample_dms_s3_kinesis_spark.bpe")

END_OF_WORD = "</w>"


def word_counts(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Weighted vocabulary (word, n) — the one corpus-sized shuffle in
    the whole BPE pipeline; everything downstream is vocabulary-sized."""
    return (
        spread(df)
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """chars + the end-of-word marker as a trailing symbol."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))


def _adjacent_pairs(sym: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs; [] for 1-symbol
    words (sequence() DESCENDS when stop < start, so guard it).
    ``sym`` is bound once: the per-index lambda's two ``F.get``
    references would re-evaluate an inline symbol expression per pair
    (HOF lambdas are opaque to Catalyst CSE)."""

    def _pairs(s: Column) -> Column:
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.struct(
                F.get(s, i - 1).alias("l"), F.get(s, i).alias("r")
            ),
        )
        return F.when(F.size(s) >= 2, pairs).otherwise(
            F.array().cast("array<struct<l:string,r:string>>")
        )

    return _bind(sym, _pairs)


def _merge_pair(sym: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) as a
    pure array fold: append each symbol unless it completes the pair
    with the accumulator's tail, in which case the tail is replaced by
    the concatenation.  Equivalent to the classic regex replace — a
    freshly merged token never re-merges within the same pass because
    its string differs from ``left`` (left+right == left would need an
    empty right, which cannot occur)."""
    merged = F.lit(left + right)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train_merges(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 32,
    min_pair_count: int = 2,
    checkpoint_dir: str | None = None,
    driver_threshold: int = 200_000,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    Returns [(left, right, pair_count), ...] in merge order.  Stops
    early when no pair reaches ``min_pair_count`` (a merge seen once
    is noise, not vocabulary).  Driver traffic is one row per round.

    ``driver_threshold``: after the one corpus-sized pass
    (``word_counts``), the working set is the VOCABULARY — when it has
    at or below this many rows (default 200 000 weighted words, a few
    MB) the merge rounds run on the driver over the collected symbol
    lists, skipping ``n_merges`` rounds of distributed scheduling +
    re-checkpointing latency.  Same size gate (and the same logged
    switch) as ``graph.pagerank`` / ``dedup.connected_components``;
    the distributed loop engages automatically above the gate
    (``driver_threshold=0`` forces it).  Both paths implement the
    identical greedy non-overlapping merge and the identical
    (count desc, left asc, right asc) tie-break — Python's code-point
    string order equals Spark's UTF8-binary order — so the learned
    merges are the same either side of the gate (pinned by the
    Sennrich reference tests)."""
    vocab = _cut_lineage(
        word_counts(df, text_col=text_col).select(
            _initial_symbols(F.col("word")).alias("sym"), "n"
        ),
        checkpoint_dir,
    )
    merges: list[tuple[str, str, int]] = []
    if driver_threshold and vocab.count() <= driver_threshold:
        _LOG.info(
            "bpe_train_merges: vocabulary <= driver_threshold=%d, "
            "taking the driver merge-loop path (the distributed loop "
            "engages above the gate)",
            driver_threshold,
        )
        syms = [(list(r["sym"]), int(r["n"])) for r in vocab.collect()]
        for _ in range(n_merges):
            counts: dict[tuple[str, str], int] = {}
            for s, n in syms:
                for i in range(len(s) - 1):
                    p = (s[i], s[i + 1])
                    counts[p] = counts.get(p, 0) + n
            if not counts:
                break
            (l, r), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if cnt < min_pair_count:
                break
            merges.append((l, r, cnt))
            merged = l + r
            for idx, (s, n) in enumerate(syms):
                out: list[str] = []
                for x in s:
                    if out and out[-1] == l and x == r:
                        out[-1] = merged
                    else:
                        out.append(x)
                syms[idx] = (out, n)
        return merges
    for _ in range(n_merges):
        best = (
            vocab.select(F.explode(_adjacent_pairs(F.col("sym"))).alias("p"), "n")
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((l, r, cnt))
        old = vocab
        vocab = _cut_lineage(
            vocab.select(_merge_pair(F.col("sym"), l, r).alias("sym"), "n"),
            checkpoint_dir,
        )
        old.unpersist()
    return merges


def merges_frame(df: DataFrame, **kwargs) -> DataFrame:
    """``bpe_train_merges`` as a (rank, left, right, merged, pair_count)
    DataFrame — the registry-facing shape."""
    merges = bpe_train_merges(df, **kwargs)
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (i + 1, l, r, l + r, cnt)
            for i, (l, r, cnt) in enumerate(merges)
        ],
        "rank int, left string, right string, merged string, pair_count long",
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank-first (the standard BPE
    application order); left-to-right non-overlapping within a rank."""
    sym = list(word) + [END_OF_WORD]
    while len(sym) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            rk = ranks.get((sym[i], sym[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_rank is None:
            break
        l, r = sym[best_i], sym[best_i + 1]
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == l and sym[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str] | tuple[str, str, int]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a learned merge list.

    Output: (id_col, bpe_tokens array<string>, n_bpe_tokens).  Arrow-
    batched ``mapInPandas`` (application is per-word iterative and not
    expressible in Catalyst); a per-batch word→pieces memo makes the
    cost proportional to distinct words per batch, not tokens.
    """
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
    # the id keeps its INPUT type: a forced long cast crashed ANSI
    # mode for string document ids (and NULLed them silently without
    # ANSI) — every other operator in the repo preserves the id type
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("_bpe_id", id_type),
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            out: list[str] = []
            for w in (text or "").lower().split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        for pdf in batches:
            toks = pdf["_bpe_text"].map(enc)
            yield pd.DataFrame(
                {
                    "_bpe_id": pdf["_bpe_id"],
                    "bpe_tokens": toks,
                    "n_bpe_tokens": toks.map(len).astype("int64"),
                }
            )

    narrow = spread(df).select(
        F.col(id_col).alias("_bpe_id"),
        F.col(text_col).alias("_bpe_text"),
    )
    return narrow.mapInPandas(run, schema).withColumnRenamed("_bpe_id", id_col)
