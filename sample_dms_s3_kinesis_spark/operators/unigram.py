"""Distributed unigram-LM (SentencePiece-style) tokenizer induction.

Kudo 2018: the vocabulary is a set of pieces with probabilities; a
word's likelihood marginalizes over ALL segmentations; EM re-estimates
piece probabilities from expected counts; pruning keeps the top pieces.
Together with ``operators/bpe.py`` this completes the two standard
subword-tokenizer families a training-data pipeline induces on the
corpus it just curated.  (The reference engine has no tokenizer story —
its scalar surface is SURVEY §2.8; this is a north-star operator.)

Scale shape mirrors the BPE trainer: every statistic lives on the
WEIGHTED VOCABULARY (distinct word, count), never the corpus:

- ``word_counts`` (shared with BPE): the one corpus-sized shuffle.
- seed candidates: a bounded substring explode over the vocabulary
  (≤ word_len · max_piece_len rows per word), one map-side-combined
  weighted count, and a TakeOrderedAndProject for the seed set.
- one EM round = ONE Arrow-batched ``mapInPandas`` pass over the word
  table with the current piece probabilities BROADCAST (seed-set
  sized), emitting (piece, expected_count), then a vocab-sized
  aggregate.  The corpus is never rescanned; driver state per round is
  the piece→prob map (seed-set sized, documented driver-bounded).
- pruning keeps every single character (so any word stays
  segmentable) plus the top multi-char pieces by probability.
- ``unigram_encode``: Viterbi application is inherently per-word
  iterative — the documented Arrow ``mapInPandas`` escape hatch, with
  a per-batch word→pieces memo like ``bpe_encode``.

Determinism: seed selection and pruning break ties on (weight DESC,
piece ASC); Viterbi breaks score ties toward the longer final piece.
The trained vocabulary is a pure function of the corpus — pinned
against an independent pure-Python reference in
``tests/test_unigram_ops.py``.  Probabilities are float64; no SQL
oracle (EM is not SQL-expressible), so registry queries are rows-only
with the pytest reference as the correctness channel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sample_dms_s3_kinesis_spark.operators.bpe import word_counts
from sample_dms_s3_kinesis_spark.operators.text import _bind, tokens


def _substring_weights(
    words: DataFrame, *, max_piece_len: int
) -> DataFrame:
    """(piece, w): every substring of length 1..max_piece_len of every
    vocabulary word, weighted by word count.  The explode is bounded
    (≤ len·max_piece_len rows per word) and collapses in the map-side
    combiner."""
    def _subs(w):
        # sequence() DESCENDS when stop < start (same footgun as
        # bpe._adjacent_pairs) — words shorter than the piece length
        # must contribute an EMPTY array, not substr(0, ...) garbage
        arrays = [
            F.when(
                F.length(w) >= length,
                F.transform(
                    F.sequence(F.lit(1), F.length(w) - (length - 1)),
                    lambda i: w.substr(i, F.lit(length)),
                ),
            ).otherwise(F.array().cast("array<string>"))
            for length in range(1, max_piece_len + 1)
        ]
        return F.flatten(F.array(*arrays))

    return (
        words.select(
            F.col("n"), F.explode(_bind(F.col("word"), _subs)).alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("n").alias("w"))
    )


def _expected_counts(word_rows, probs: dict) -> dict:
    """Soft-EM E-step for one word batch: forward/backward over all
    segmentations under ``probs``; returns piece → Σ cnt·E[uses].
    Pure-python scalar math so the pytest reference can reproduce it
    bit-for-bit."""
    out: dict = {}
    max_len = max((len(p) for p in probs), default=1)
    for word, cnt in word_rows:
        n = len(word)
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for j in range(1, n + 1):
            s = 0.0
            for i in range(max(0, j - max_len), j):
                p = probs.get(word[i:j])
                if p:
                    s += alpha[i] * p
            alpha[j] = s
        if alpha[n] <= 0.0:
            continue  # unsegmentable (char missing): contribute nothing
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for i in range(n - 1, -1, -1):
            s = 0.0
            for j in range(i + 1, min(n, i + max_len) + 1):
                p = probs.get(word[i:j])
                if p:
                    s += p * beta[j]
            beta[i] = s
        z = alpha[n]
        for i in range(n):
            for j in range(i + 1, min(n, i + max_len) + 1):
                piece = word[i:j]
                p = probs.get(piece)
                if p:
                    e = cnt * alpha[i] * p * beta[j] / z
                    if e:
                        out[piece] = out.get(piece, 0.0) + e
    return out


def _em_round(spark, words: DataFrame, probs: dict) -> dict:
    """One distributed EM round: broadcast ``probs``, expected counts
    via mapInPandas over the word table, vocab-sized aggregate,
    normalized M-step.  Returns the new piece→prob map."""
    bc = spark.sparkContext.broadcast(probs)
    schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )

    def _estep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pr = bc.value
        for pdf in batches:
            counts = _expected_counts(
                zip(pdf["word"].tolist(), pdf["n"].tolist()), pr
            )
            if counts:
                yield pd.DataFrame(
                    {"piece": list(counts), "c": list(counts.values())}
                )

    agg = (
        words.select("word", "n")
        .mapInPandas(_estep, schema)
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    total = sum(r["c"] for r in agg)
    if total <= 0.0:
        return probs
    return {r["piece"]: r["c"] / total for r in agg}


def unigram_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 200,
    seed_size: int = 1000,
    max_piece_len: int = 8,
    n_iter: int = 3,
) -> DataFrame:
    """Train a unigram-LM subword vocabulary on the corpus.

    Output: (piece, prob) — ``vocab_size`` rows (or fewer on tiny
    corpora), probabilities normalized over the final vocabulary.
    Single characters are always retained so every corpus word stays
    segmentable at encode time."""
    if vocab_size < 1 or seed_size < 1 or max_piece_len < 1 or n_iter < 0:
        raise ValueError("unigram_train: all size parameters must be >= 1")
    spark = df.sparkSession
    words = word_counts(df, text_col=text_col).persist()
    try:
        weights = _substring_weights(words, max_piece_len=max_piece_len)
        chars = (
            weights.filter(F.length("piece") == 1)
            .select("piece", "w")
            .collect()
        )
        multi = (
            weights.filter(F.length("piece") >= 2)
            .orderBy(F.desc("w"), F.asc("piece"))
            .limit(seed_size)
            .collect()
        )
        seed = {r["piece"]: float(r["w"]) for r in chars}
        seed.update({r["piece"]: float(r["w"]) for r in multi})
        total = sum(seed.values())
        probs = {p: w / total for p, w in seed.items()}
        for _ in range(n_iter):
            probs = _em_round(spark, words, probs)
        # prune: all single chars + top multi-char pieces by prob
        # (weight DESC, piece ASC), then one settling EM round
        char_pieces = {p for p in probs if len(p) == 1}
        keep_multi = sorted(
            ((p, w) for p, w in probs.items() if len(p) >= 2),
            key=lambda kv: (-kv[1], kv[0]),
        )[: max(0, vocab_size - len(char_pieces))]
        kept = char_pieces | {p for p, _ in keep_multi}
        probs = {p: w for p, w in probs.items() if p in kept}
        z = sum(probs.values())
        probs = {p: w / z for p, w in probs.items()}
        probs = _em_round(spark, words, probs)
    finally:
        words.unpersist()
    return spark.createDataFrame(
        sorted(probs.items()), "piece string, prob double"
    )


def _viterbi(word: str, logp: dict, max_len: int) -> list[str]:
    """Best segmentation under the piece log-probs; unknown single
    chars get a -1e9 floor so segmentation always completes.  Score
    ties break toward the LONGER final piece (smaller split index) —
    deterministic across engines and partitionings."""
    n = len(word)
    best = [(-float("inf"), -1)] * (n + 1)
    best[0] = (0.0, -1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            if best[i][0] == -float("inf"):
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i == 1:
                    lp = -1e9  # unknown char floor
                else:
                    continue
            score = best[i][0] + lp
            # strict > : earlier i (longer final piece) wins ties
            if score > best[j][0]:
                best[j] = (score, i)
    pieces: list[str] = []
    j = n
    while j > 0:
        i = best[j][1]
        pieces.append(word[i:j])
        j = i
    return pieces[::-1]


def unigram_encode(
    df: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "pieces",
) -> DataFrame:
    """Viterbi-encode each document's words under a trained (piece,
    prob) vocabulary: (id_col, out_col array<string>).  Arrow-batched
    with a per-batch word memo (Zipf: each distinct word pays the
    Viterbi loop once per batch)."""
    import math

    rows = vocab.select("piece", "prob").collect()
    logp = {r["piece"]: math.log(r["prob"]) for r in rows if r["prob"] > 0}
    max_len = max((len(p) for p in logp), default=1)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((logp, max_len))
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField(out_col, T.ArrayType(T.StringType())),
        ]
    )

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp, ml = bc.value
        memo: dict = {}
        for pdf in batches:
            out = []
            for text in pdf["_toks"]:
                pieces: list[str] = []
                for w in text if text is not None else []:
                    got = memo.get(w)
                    if got is None:
                        got = _viterbi(w, lp, ml)
                        memo[w] = got
                    pieces.extend(got)
                out.append(pieces)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: out})

    toks = df.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("_toks"),
    )
    return toks.mapInPandas(_enc, schema)
