"""Corpus-level curation operators for training-data pipelines:
benchmark decontamination (n-gram overlap), cross-document
duplicated-n-gram statistics, unigram-LM quality scoring, and PII
redaction.

Reference note: the reference has no curation surface (its scalar ops
are concat/lower/json only — SURVEY §2.8); these extend the engine per
the north star in BASELINE.json, alongside operators.dedup /
operators.text.

Scale design
------------
Every op here shuffles **fixed-width digests**, never raw n-gram
strings: grams fold to an 8-byte xxhash64 before any groupBy/join, so
the shuffle payload is bounded regardless of gram width.  The digest
is internal only — the DuckDB oracle joins on the raw gram strings, so
digest choice cannot change checked results except through a 64-bit
collision (≈2^-32 per billion gram pairs, merging two gram classes —
an acceptable counting-signal error, the same trade dedup.py makes,
and one the exact oracle would flag if it ever fired).

- ``ngram_overlap`` / ``decontaminate``: the benchmark gram set is
  normally tiny next to the corpus (a benchmark suite vs 100 TB of
  training text) — broadcast it when small, else fall back to a
  shuffle hash join on the digest.  Corpus grams are exploded map-side
  and never collected.
- ``dup_ngram_stats``: explode → groupBy(digest) doc-frequency →
  join back → per-doc agg.  Two shuffles on 8-byte keys; partial
  (map-side) aggregation applies to both groupBys.
- ``unigram_lm_stats``: vocabulary is heavy-tailed and usually orders
  of magnitude smaller than the token stream; the count→token join is
  left to AQE, which converts it to a broadcast join at runtime when
  the built vocab is small enough.  The grand-total is a 1-row frame
  cross-joined as an explicit broadcast — no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.dedup import BROADCAST_ROWS, token_ngrams
from sample_dms_s3_kinesis_spark.operators.partitioning import spread
from sample_dms_s3_kinesis_spark.operators.text import tokens


def gram_digest(gram: Column) -> Column:
    """64-bit fixed-width digest of a gram (internal shuffle/join key;
    the oracle SQL operates on raw gram strings)."""
    return F.xxhash64(gram)


def _doc_gram_digests(
    df: DataFrame, *, text_col: str, id_col: str, n: int
) -> DataFrame:
    """One row per (doc, distinct n-gram digest).  spread(): the
    shingle+md5 work is compute-bound and a single-file parquet scan
    would otherwise pin it to one core."""
    return spread(df).select(
        F.col(id_col),
        F.explode(token_ngrams(F.col(text_col), n)).alias("_gram"),
    ).select(id_col, gram_digest(F.col("_gram")).alias("_g"))


# ------------------------------------------------- decontamination

def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_rows: int = BROADCAST_ROWS,
    broadcast: bool | None = None,
) -> DataFrame:
    """Per corpus document, the number of distinct word ``n``-grams it
    shares with ANY benchmark document (the standard train/test
    contamination signal — e.g. the 13-gram overlap check of GPT-3
    appendix C, here with configurable ``n``).

    Returns ``(id_col, n_shared)`` for contaminated documents only
    (docs with zero overlap don't appear).

    ``broadcast``: True/False pins the join strategy without running
    the sizing count; None (default) size-gates the broadcast the same
    way dedup._block_pair_join does (the benchmark gram set must be
    materialized either way, so the count() is not an extra corpus
    pass — but callers that KNOW the benchmark is small should pass
    True and skip the extra job).
    """
    cg = _doc_gram_digests(corpus, text_col=text_col, id_col=id_col, n=n)
    bg = (
        _doc_gram_digests(benchmark, text_col=text_col, id_col=id_col, n=n)
        .select("_g")
        .distinct()
    )
    if broadcast is None:
        broadcast = bg.count() <= broadcast_rows
    joined = cg.join(F.broadcast(bg) if broadcast else bg, on="_g")
    return joined.groupBy(id_col).agg(F.count("*").alias("n_shared"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_rows: int = BROADCAST_ROWS,
    broadcast: bool | None = None,
) -> DataFrame:
    """Corpus minus every document sharing at least one word n-gram
    with the benchmark set (left-anti on the overlap relation).

    Note the corpus plan is evaluated twice (gram side + anti-join
    side); if it is itself an expensive pipeline, compute the overlap
    from the cheap upstream scan and anti-join the pipeline against
    those ids instead (contamination depends only on text, so it
    commutes with row filters — see q_curation_pipeline).
    """
    hits = ngram_overlap(
        corpus,
        benchmark,
        text_col=text_col,
        id_col=id_col,
        n=n,
        broadcast_rows=broadcast_rows,
        broadcast=broadcast,
    ).select(id_col)
    return corpus.join(hits, on=id_col, how="left_anti")


# --------------------------------------- cross-doc duplicated n-grams

def dup_ngram_stats(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_doc_share: float | None = None,
) -> DataFrame:
    """RefinedWeb-style duplicated-content signal: for each document,
    how many of its distinct word n-grams appear in at least one OTHER
    document, and the fraction they make up.

    Returns ``(id_col, n_grams, n_dup, dup_frac)``; documents with no
    n-grams (fewer than ``n`` tokens) don't appear.

    ``max_doc_share`` bounds the boilerplate-gram skew hazard: the
    count-window shuffles every occurrence of a gram to ONE task, so a
    boilerplate gram (license header, nav bar) present in a large
    corpus share makes that task's input O(corpus).  With the cap set
    (e.g. 0.01), grams whose document frequency exceeds
    ``max_doc_share × total docs`` are excluded from BOTH numerator and
    denominator before the window — they carry no duplication signal
    (they'd count as dup in virtually every document) and excluding
    them bounds every window partition.  The over-cap gram list is
    computed with a partial-aggregating groupBy (skew-safe: the map
    side pre-combines, so the shuffle carries one row per gram per
    partition, never one row per occurrence) and is tiny by
    construction, so it broadcasts.  None (default) disables the cap
    and reproduces the exact unfiltered statistic.
    """
    from pyspark.sql import Window

    g = _doc_gram_digests(corpus, text_col=text_col, id_col=id_col, n=n)
    if max_doc_share is not None:
        total_docs = corpus.select(id_col).count()
        cap = max_doc_share * total_docs
        hot = (
            g.groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > cap)
            .select("_g")
        )
        g = g.join(F.broadcast(hot), on="_g", how="left_anti")
    # Document frequency per gram class via a count-window: grams are
    # distinct per doc, so count(*) over the digest == number of
    # documents containing the gram.  One corpus scan + one
    # full-stream shuffle (by _g); the groupBy(dfreq)+join shape costs
    # a second scan AND a second full-stream shuffle, and the gram
    # vocabulary is ~O(token stream) so it never broadcasts at scale.
    dfw = Window.partitionBy("_g")
    dup = F.when(F.col("_nd") > 1, F.lit(1)).otherwise(F.lit(0))
    return (
        g.withColumn("_nd", F.count("*").over(dfw))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(dup).alias("n_dup"),
            F.round(
                F.sum(dup).cast("double") / F.count("*"), 6
            ).alias("dup_frac"),
        )
    )


# ------------------------------------------------ unigram LM scoring

def unigram_lm_stats(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under a unigram language model
    trained on the corpus itself (the cheap stand-in for a KenLM
    perplexity filter: high cross-entropy = rare-word soup, low =
    boilerplate).

    ``cross_entropy = -(1/|doc|) * sum_tok log2(count(tok) / N)``

    Returns ``(id_col, n_tokens, cross_entropy)``; empty documents
    don't appear.
    """
    # '' pseudo-tokens from empty/whitespace docs are filtered — they
    # would otherwise enter the LM vocabulary, inflate N, and emit the
    # very rows the contract says don't appear (r6 review find)
    tk = corpus.select(
        F.col(id_col),
        F.explode(
            F.filter(
                tokens(F.lower(F.col(text_col))), lambda w: w != F.lit("")
            )
        ).alias("_tok"),
    )
    counts = tk.groupBy("_tok").agg(F.count("*").alias("_c"))
    total = counts.agg(F.sum("_c").cast("double").alias("_n"))
    term = F.log2(F.col("_c").cast("double") / F.col("_n"))
    return (
        tk.join(counts, on="_tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round((-F.sum(term)) / F.count("*"), 6).alias("cross_entropy"),
        )
    )


def bigram_lm_stats(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained BIGRAM
    language model — the next step up from :func:`unigram_lm_stats`
    toward a KenLM-grade perplexity filter, sensitive to word ORDER
    (a shuffled document keeps its unigram entropy but its bigram
    entropy jumps).

    ``P(w_i | w_{i-1}) = c(w_{i-1} w_i) / c_ctx(w_{i-1})`` with
    ``c_ctx`` the token's occurrence count as a bigram context; since
    the model is trained on the corpus being scored, every observed
    bigram has nonzero probability (no smoothing term, mirroring the
    unigram op).  ``cross_entropy = -(1/n_bigrams) Σ log2 P``.

    Returns ``(id_col, n_bigrams, cross_entropy)``; documents with
    fewer than two tokens don't appear.

    Plan: the probability table is built once from the bigram counts
    (context counts derive from the SAME aggregate by re-grouping on
    the bigram's first token — no second pass over the corpus), then
    the per-doc bigram stream joins it once; both joins are left to
    AQE, which broadcasts the count side when the vocabulary is small
    enough.  Shuffled keys are gram strings to stay oracle-checkable
    (digest variant: wrap in :func:`gram_digest` as dup_ngram_stats
    does).
    """
    from sample_dms_s3_kinesis_spark.operators.text import word_bigrams

    bg = spread(corpus).select(
        F.col(id_col),
        F.explode(word_bigrams(F.col(text_col))).alias("_bg"),
    )
    counts = bg.groupBy("_bg").agg(F.count(F.lit(1)).alias("_c"))
    ctx = (
        counts.groupBy(
            F.substring_index(F.col("_bg"), " ", 1).alias("_w")
        ).agg(F.sum("_c").alias("_cc"))
    )
    prob = counts.join(
        ctx, F.substring_index(counts["_bg"], " ", 1) == ctx["_w"]
    ).select(
        "_bg",
        F.log2(F.col("_c").cast("double") / F.col("_cc")).alias("_lp"),
    )
    return (
        bg.join(prob, on="_bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round((-F.sum("_lp")) / F.count(F.lit(1)), 6).alias(
                "cross_entropy"
            ),
        )
    )


def lm_score_against(
    score: DataFrame,
    train: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Score HELD-OUT documents under a bigram LM trained on a
    DIFFERENT corpus, with stupid backoff (Brants et al. 2007) — the
    real perplexity-filter shape: incoming data scored against a
    trusted reference corpus, where unseen bigrams are the norm and
    need a backoff path (the self-trained ops above never see one).

    ``S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c_ctx(w_{i-1})`` when the
    bigram was observed in training, else ``alpha * c(w_i) / N`` with
    an OOV floor of ``alpha * 1 / N`` for words the training corpus
    never saw (deterministic, oracle-replicable; a true probability
    normalization is deliberately skipped, as in the paper).

    ``cross_entropy = -(1/n_bigrams) Σ log2 S``; ``n_backoff`` counts
    the bigrams that took the backoff path — itself a useful domain-
    shift signal (backoff fraction ~ how alien the new data is).

    Returns ``(id_col, n_bigrams, n_backoff, cross_entropy)``; scored
    documents with fewer than two tokens don't appear.

    Plan: three training aggregates (bigram, context, unigram — the
    context table re-groups the bigram aggregate, so training is ONE
    pass over the train corpus plus vocab-sized work), then the
    scored bigram stream left-joins the count tables; AQE broadcasts
    them when the vocabulary is small, and at 100 TB they are
    token-keyed shuffle joins with map-side-combined builds — never a
    corpus×corpus join."""
    from sample_dms_s3_kinesis_spark.operators.text import tokens, word_bigrams

    bg_train = spread(train).select(
        F.explode(word_bigrams(F.col(text_col))).alias("_bg")
    )
    bg_counts = bg_train.groupBy("_bg").agg(F.count(F.lit(1)).alias("_cbg"))
    ctx = bg_counts.groupBy(
        F.substring_index(F.col("_bg"), " ", 1).alias("_wc")
    ).agg(F.sum("_cbg").alias("_cc"))
    uni = (
        spread(train)
        .select(
            F.explode(
                F.filter(
                    tokens(F.lower(F.col(text_col))), lambda w: w != F.lit("")
                )
            ).alias("_w")
        )
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_cu"))
    )
    total = uni.agg(F.sum("_cu").cast("double").alias("_n"))

    bg_score = spread(score).select(
        F.col(id_col),
        F.explode(word_bigrams(F.col(text_col))).alias("_bg"),
    )
    joined = (
        bg_score.join(bg_counts, "_bg", "left")
        .join(
            ctx,
            F.substring_index(bg_score["_bg"], " ", 1) == ctx["_wc"],
            "left",
        )
        .join(
            uni,
            F.substring_index(bg_score["_bg"], " ", -1) == uni["_w"],
            "left",
        )
        .crossJoin(F.broadcast(total))
    )
    backoff = F.col("_cbg").isNull()
    lp = F.when(
        ~backoff,
        F.log2(F.col("_cbg").cast("double") / F.col("_cc")),
    ).otherwise(
        F.log2(
            F.lit(alpha)
            * F.coalesce(F.col("_cu"), F.lit(1)).cast("double")
            / F.col("_n")
        )
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(backoff.cast("long")).alias("n_backoff"),
            F.round((-F.sum(lp)) / F.count(F.lit(1)), 6).alias(
                "cross_entropy"
            ),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every RAW
    document by how target-like it is under two hashed-unigram
    bag-of-words models, ``log w(x) = log p_target(x) − log p_raw(x)``.
    Feeding the weights to :func:`sampling.weighted_sample` completes
    the paper's pipeline (importance resampling toward the target
    distribution).

    Each token hashes into one of ``buckets`` slots; bucket counts are
    add-one smoothed, so

    ``log₂ w(x) = Σ_tok [log₂(c_t(b)+1) − log₂(c_r(b)+1)]
                  + n_tok · [log₂(N_r+B) − log₂(N_t+B)]``

    with c_t/c_r the target/raw bucket counts, N_t/N_r the corpus
    token totals and B = ``buckets``.  Hashing is the point: the
    feature space is O(buckets) regardless of vocabulary, so both
    models stay broadcastable at any corpus size.

    ``hash_family="md5"`` (first 8 md5 hex chars → int) is
    DuckDB-replicable for exact cross-engine oracles; the default
    xxhash64 stays the production flavor.

    Scale: one explode pass per corpus with a map-side-combined bucket
    aggregate (model build), then the raw corpus explodes once more
    and joins the O(buckets) model frames (AQE-broadcast) — never a
    corpus×corpus join; per-doc reduction is one groupBy.

    Returns ``(id_col, n_tokens, log_weight)`` for every raw document
    (NULL text → 0 tokens, weight 0), log_weight rounded to 6.
    """
    from sample_dms_s3_kinesis_spark.operators.text import (
        bucketed_token_hash,
        tokens,
    )

    def bucket_of(tok: Column) -> Column:
        return bucketed_token_hash(
            tok, buckets=buckets, hash_family=hash_family
        )

    def bucket_counts(df: DataFrame, name: str) -> DataFrame:
        return (
            spread(df)
            .select(
                F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok")
            )
            .groupBy(bucket_of(F.col("_tok")).alias("_b"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    t_counts = bucket_counts(target, "_ct")
    r_counts = bucket_counts(raw, "_cr")
    totals = (
        t_counts.agg(F.coalesce(F.sum("_ct"), F.lit(0)).alias("_nt"))
        .crossJoin(
            r_counts.agg(F.coalesce(F.sum("_cr"), F.lit(0)).alias("_nr"))
        )
        .select(
            (
                F.log2(F.col("_nr") + F.lit(buckets))
                - F.log2(F.col("_nt") + F.lit(buckets))
            ).alias("_const")
        )
    )
    toks = (
        spread(raw)
        .select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok"),
        )
        .select(F.col(id_col), bucket_of(F.col("_tok")).alias("_b"))
    )
    per_doc = (
        toks.join(t_counts, "_b", "left")
        .join(r_counts, "_b", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(
                F.log2(F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(1))
                - F.log2(F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(1))
            ).alias("_s"),
        )
    )
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_tokens"),
            F.round(
                F.coalesce(
                    F.col("_s") + F.col("_n") * F.col("_const"), F.lit(0.0)
                ),
                6,
            ).alias("log_weight"),
        )
    )


# ------------------------------------------- duplicated-span coverage

def dup_span_coverage(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """RefinedWeb-style duplicated-SPAN coverage: for each document,
    the number of token positions covered by at least one word n-gram
    window that also appears in ANOTHER document, and the fraction of
    the document those positions make up.  Stronger than
    :func:`dup_ngram_stats` (which counts gram classes): overlapping
    duplicated windows are merged, so the output is the true footprint
    of cross-document duplicated text.

    Plan: positional grams (posexplode, every window, not distinct) →
    doc-frequency per gram class from the DISTINCT (doc, gram) pairs
    (partial-agg groupBy on the 8-byte digest) → inner join positional
    grams to duplicated classes (digest shuffle) → per-doc interval
    union via one window pass (running max of span end; each span adds
    ``end - max(start-1, prev_max_end)`` clamped at 0 — the standard
    sweep-line union without a self-join).  Shuffles carry digests and
    (doc, pos) pairs only.

    Output: (id_col, n_tokens, covered_tokens, span_frac); documents
    with fewer than ``n`` tokens, or with no cross-document duplicated
    window at all, don't appear (join semantics — absent means clean).
    """
    from pyspark.sql import Window

    toks = tokens(F.lower(F.col(text_col)))
    base = spread(corpus).select(
        F.col(id_col), toks.alias("_tk"), F.size(toks).alias("_nt")
    ).filter(F.col("_nt") >= n)
    # positional grams: window i covers tokens [i, i+n-1], 0-based
    pos_grams = base.select(
        id_col,
        "_nt",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("_nt") - (n - 1)),
                lambda i: gram_digest(F.concat_ws(" ", F.slice("_tk", i, n))),
            )
        ).alias("_pos", "_g"),
    )
    dup_classes = (
        pos_grams.select(id_col, "_g")
        .distinct()
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > 1)
        .select("_g")
    )
    spans = pos_grams.join(dup_classes, on="_g").select(
        id_col, "_nt", F.col("_pos").alias("_s"), (F.col("_pos") + n - 1).alias("_e")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max("_e").over(w)
    add = F.col("_e") - F.greatest(
        F.col("_s") - 1, F.coalesce(prev_end, F.lit(-1))
    )
    covered = F.when(add > 0, add).otherwise(F.lit(0))
    return (
        spans.withColumn("_add", covered)
        .groupBy(id_col)
        .agg(
            F.max("_nt").cast("long").alias("n_tokens"),
            F.sum("_add").cast("long").alias("covered_tokens"),
            F.round(
                F.sum("_add").cast("double") / F.max("_nt").cast("double"), 6
            ).alias("span_frac"),
        )
    )


def remove_duplicated_spans(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """The remediation twin of :func:`dup_span_coverage`: rebuild each
    document with every token position covered by a cross-document
    duplicated n-gram window REMOVED (RefinedWeb removes duplicated
    spans rather than dropping whole documents).  Gram classes are
    computed over lowercased tokens; the surviving text preserves the
    original-case tokens, joined by single spaces (whitespace is
    normalized — the same contract as ``normalize_text``).

    Plan: positional gram digests → duplicated classes (partial-agg
    groupBy) → covered positions (bounded explode: n positions per
    duplicated window, deduplicated) → anti-join against the
    (doc, position, token) stream → per-doc ordered reassembly
    (sort_array over collect_list of (pos, token) structs — bounded by
    document length, the same bound any text rebuild has).  Every doc
    appears in the output; a fully-duplicated doc yields ''.

    Output: (id_col, clean_text, n_removed).
    """
    orig = tokens(F.col(text_col))
    low = tokens(F.lower(F.col(text_col)))
    base = spread(corpus).select(
        F.col(id_col),
        orig.alias("_tko"),
        low.alias("_tk"),
        F.size(orig).alias("_nt"),
    )
    pos_grams = base.filter(F.col("_nt") >= n).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("_nt") - (n - 1)),
                lambda i: gram_digest(F.concat_ws(" ", F.slice("_tk", i, n))),
            )
        ).alias("_pos", "_g"),
    )
    dup_classes = (
        pos_grams.select(id_col, "_g")
        .distinct()
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > 1)
        .select("_g")
    )
    covered = (
        pos_grams.join(dup_classes, on="_g")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + (n - 1))
            ).alias("_p"),
        )
        .distinct()
    )
    toks_pos = base.select(
        id_col, F.posexplode("_tko").alias("_p", "_tok")
    )
    kept = toks_pos.join(covered, on=[id_col, "_p"], how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_p"), F.col("_tok")))
                ),
                lambda s: s["_tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    return (
        base.select(id_col, "_nt")
        .join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("_nt") - F.coalesce(F.col("_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def dedup_segments(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 12,
) -> DataFrame:
    """Global segment-level dedup, the C4/CCNet line-and-sentence-dedup
    shape: split each document into consecutive ``width``-token
    segments, keep only the corpus-wide FIRST occurrence of every
    repeated segment (first = minimal (doc id, segment position) —
    deterministic under any partitioning), and rebuild documents from
    their surviving segments.  C4 removes repeated three-sentence
    spans and CCNet dedups repeated lines; on a corpus with explicit
    boundaries the segmenter would split there — the fixed token width
    is the boundary-free equivalent and keeps the rebuild exactly
    reproducible by the SQL oracle.  Segment identity is
    case-insensitive (lowercased key); the rebuilt text preserves
    original-case tokens, space-joined (the ``normalize_text``
    whitespace contract).

    Plan (100 TB shape): tokenize → per-doc segment slices (bounded
    explode: ceil(len/width) rows per doc) → groupBy(lowered segment)
    with a MIN(struct(doc, pos)) aggregate — partial map-side combine
    makes hyper-common boilerplate segments skew-safe, unlike a
    row_number window — → join occurrences back on the segment key
    (AQE handles residual key skew) → keep rows matching their class
    minimum → per-doc ordered reassembly (sort_array over
    collect_list, bounded by document length).  Every input doc
    appears in the output; a doc whose every segment first occurred
    elsewhere yields ''.

    Output: (id_col, clean_text, n_removed) where n_removed counts
    dropped segments.
    """
    segs = _doc_segments(corpus, text_col=text_col, id_col=id_col, width=width)
    kept = _keep_first(segs, id_col=id_col)
    return _rebuild_from_segments(corpus, segs, kept, id_col=id_col)


def _doc_segments(
    df: DataFrame, *, text_col: str, id_col: str, width: int
) -> DataFrame:
    """(id, _pos, _seg, _key) — one row per non-empty ``width``-token
    segment; bounded explode (ceil(len/width) rows per doc)."""
    tks = tokens(F.col(text_col))
    base = spread(df).select(
        F.col(id_col), tks.alias("_tks"), F.size(tks).alias("_nt")
    )
    nseg = F.ceil(F.col("_nt") / F.lit(width)).cast("int")
    return (
        base.select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), nseg - F.lit(1)),
                    lambda i: F.array_join(
                        F.slice(F.col("_tks"), i * width + 1, width), " "
                    ),
                )
            ).alias("_pos", "_seg"),
        )
        .filter(F.col("_seg") != "")
        .withColumn("_key", F.lower(F.col("_seg")))
    )


def _keep_first(segs: DataFrame, *, id_col: str) -> DataFrame:
    """Corpus-wide first occurrence per segment class via the skew-safe
    MIN(struct) aggregate (partial map-side combine; no window)."""
    firsts = segs.groupBy("_key").agg(
        F.min(
            F.struct(F.col(id_col).alias("_d"), F.col("_pos").alias("_p"))
        ).alias("_first")
    )
    return segs.join(firsts, on="_key").filter(
        (F.col("_first._d") == F.col(id_col))
        & (F.col("_first._p") == F.col("_pos"))
    )


def _rebuild_from_segments(
    docs: DataFrame, segs: DataFrame, kept: DataFrame, *, id_col: str
) -> DataFrame:
    """Per-doc ordered reassembly of surviving segments; every doc in
    ``docs`` appears (all-removed → '')."""
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_seg")))
                ),
                lambda s: s["_seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("_ns"))
    return (
        docs.select(id_col)
        .join(rebuilt, on=id_col, how="left")
        .join(totals, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (
                F.coalesce(F.col("_ns"), F.lit(0))
                - F.coalesce(F.col("_kept"), F.lit(0))
            )
            .cast("long")
            .alias("n_removed"),
        )
    )


def dedup_segments_against(
    new: DataFrame,
    existing: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 12,
) -> DataFrame:
    """Incremental twin of :func:`dedup_segments` — the daily-crawl
    remediation gate: rebuild each NEW document with (a) every segment
    already present anywhere in the EXISTING corpus removed (anti-join
    against the corpus's distinct segment keys — the corpus is reduced
    to keys and never rebuilt or re-shuffled at occurrence grain) and
    (b) the surviving repeats deduped keep-first WITHIN the new batch,
    exactly as the self flavor would.  Running the self flavor over
    existing∪new and projecting the new ids gives the same surviving
    segments whenever the existing corpus is itself segment-deduped —
    this form does it without touching existing occurrences.

    Output: (id_col, clean_text, n_removed) over NEW docs only;
    n_removed counts both corpus-hit and in-batch-duplicate segments.
    """
    segs_new = _doc_segments(new, text_col=text_col, id_col=id_col, width=width)
    corpus_keys = (
        _doc_segments(existing, text_col=text_col, id_col=id_col, width=width)
        .select("_key")
        .distinct()
    )
    fresh = segs_new.join(corpus_keys, on="_key", how="left_anti")
    kept = _keep_first(fresh, id_col=id_col)
    return _rebuild_from_segments(new, segs_new, kept, id_col=id_col)


def dedup_segments_within(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 12,
) -> DataFrame:
    """Within-document repetition removal — the Gopher/FineWeb
    "repeated lines within a page" rule, scoped to a single document:
    keep only the FIRST occurrence of each repeated ``width``-token
    segment inside the same document, leaving cross-document
    duplication alone (that is :func:`dedup_segments`'s job).  The two
    compose: within-doc first (cheap, per-doc), then the global pass
    over the shrunken corpus.

    Plan: unlike the global flavor there is no corpus-wide segment
    class — the keep-first aggregate groups by (doc, key), so the
    shuffle key always includes the document id and boilerplate
    segments CANNOT concentrate on one reducer; this is the rare dedup
    operator that is skew-proof by construction and needs no cap.

    Output: (id_col, clean_text, n_removed).
    """
    segs = _doc_segments(corpus, text_col=text_col, id_col=id_col, width=width)
    firsts = segs.groupBy(id_col, "_key").agg(F.min("_pos").alias("_p"))
    kept = (
        segs.join(firsts, on=[id_col, "_key"])
        .filter(F.col("_pos") == F.col("_p"))
        .select(id_col, "_pos", "_seg")
    )
    return _rebuild_from_segments(corpus, segs, kept, id_col=id_col)


def _cdc_segments(
    corpus: DataFrame,
    *,
    text_col: str,
    id_col: str,
    mask_bits: int,
    min_tokens: int,
    max_tokens: int,
    boundary: str = "xxhash64",
) -> DataFrame:
    """Content-defined chunks in the keep-first segment shape
    (id, _pos, _seg, _key) — ONE definition of the chunk-key
    normalization shared by the self and incremental flavors, so the
    two can never diverge on segment identity."""
    from sample_dms_s3_kinesis_spark.operators.text import cdc_chunks

    return cdc_chunks(
        corpus,
        text_col=text_col,
        id_col=id_col,
        mask_bits=mask_bits,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        boundary=boundary,
    ).select(
        F.col(id_col),
        F.col("chunk_idx").alias("_pos"),
        F.col("chunk_text").alias("_seg"),
        F.lower(F.col("chunk_text")).alias("_key"),
    )


def dedup_segments_cdc(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_bits: int = 5,
    min_tokens: int = 8,
    max_tokens: int = 64,
    boundary: str = "xxhash64",
) -> DataFrame:
    """Global segment dedup over CONTENT-DEFINED chunks
    (:func:`~sample_dms_s3_kinesis_spark.operators.text.cdc_chunks`)
    instead of fixed ``width``-token windows.  Fixed-width
    segmentation (:func:`dedup_segments`) misses a repeated passage
    whenever an upstream insertion shifts its token offsets — the
    window grid no longer lines up.  Rolling-hash boundaries
    re-synchronize after any edit, so the SAME passage yields the SAME
    chunks wherever it sits in a document, and the keep-first
    aggregate catches it.

    Plan: the chunking is shuffle-free per-document Catalyst; the
    keep-first MIN(struct) aggregate and per-doc rebuild are identical
    to :func:`dedup_segments` (partial map-side combine keeps
    boilerplate chunks skew-safe).  Segment identity is the
    case-folded chunk text.

    Output: (id_col, clean_text, n_removed).
    """
    segs = _cdc_segments(
        corpus,
        text_col=text_col,
        id_col=id_col,
        mask_bits=mask_bits,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        boundary=boundary,
    )
    kept = _keep_first(segs, id_col=id_col)
    return _rebuild_from_segments(corpus, segs, kept, id_col=id_col)


def dedup_segments_cdc_against(
    new: DataFrame,
    existing: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_bits: int = 5,
    min_tokens: int = 8,
    max_tokens: int = 64,
    boundary: str = "xxhash64",
) -> DataFrame:
    """Incremental twin of :func:`dedup_segments_cdc`, completing the
    segment-dedup matrix ({fixed-width, content-defined} × {self,
    incremental, within}): each NEW document is rebuilt with (a) every
    content-defined chunk already present anywhere in the EXISTING
    corpus removed (anti-join against the corpus's distinct chunk
    keys — the corpus side reduces to keys, never re-shuffled at
    occurrence grain) and (b) surviving repeats deduped keep-first
    WITHIN the new batch.  Because chunk boundaries are content-
    defined, a passage lifted from the corpus into a new document
    matches even behind an inserted preamble — the case the
    fixed-width ``dedup_segments_against`` grid misses.

    Output: (id_col, clean_text, n_removed) over NEW docs only.
    """
    def segs(df: DataFrame) -> DataFrame:
        return _cdc_segments(
            df,
            text_col=text_col,
            id_col=id_col,
            mask_bits=mask_bits,
            min_tokens=min_tokens,
            max_tokens=max_tokens,
            boundary=boundary,
        )

    segs_new = segs(new)
    corpus_keys = segs(existing).select("_key").distinct()
    fresh = segs_new.join(corpus_keys, on="_key", how="left_anti")
    kept = _keep_first(fresh, id_col=id_col)
    return _rebuild_from_segments(new, segs_new, kept, id_col=id_col)


def drop_frequent_lines(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int = 2,
    min_line_chars: int = 1,
) -> DataFrame:
    """C4-style line-level boilerplate removal: a LINE (newline-
    delimited, trimmed) that appears in MORE than ``max_docs`` distinct
    documents is boilerplate — nav bars, footers, cookie banners, ToS
    blurbs — and is removed from every document; each survivor document
    is rebuilt with its remaining lines in original order.  Feed the
    output of :func:`..text.html_extract` (one line per block) and this
    is the cross-document half of main-content extraction.

    Shapes: one posexplode of lines, one distinct-doc count per line
    digest (map-side combined; the digest frame never carries bodies
    past the aggregate), one semi-join back, one per-doc reassembly
    window.  Lines shorter than ``min_line_chars`` are kept
    unconditionally (an empty or one-char line is structure, not
    boilerplate — and counting it would shuffle a mega-bucket).
    Output: (id_col, text_col) with cleaned text; a document whose
    every line was boilerplate keeps an empty string (the caller's
    quality gate drops it, mirroring the ingest empty-extraction
    rule)."""
    if max_docs < 1:
        raise ValueError(f"max_docs must be >= 1, got {max_docs}")
    lines = spread(corpus).select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), "\n", -1)
        ).alias("_pos", "_line"),
    )
    counted = (
        lines.filter(F.length(F.trim(F.col("_line"))) >= min_line_chars)
        .select(F.col(id_col), F.md5(F.trim(F.col("_line"))).alias("_lh"))
        .distinct()
        .groupBy("_lh")
        .agg(F.count(F.lit(1)).alias("_n_docs"))
        .filter(F.col("_n_docs") > max_docs)
        .select("_lh")
    )
    # ONE anti-join over ONE explode: a short line never matches the
    # compound condition, so it survives without a second scan branch
    short = F.length(F.trim(F.col("_line"))) < min_line_chars
    kept = lines.join(
        counted,
        (~short) & (F.md5(F.trim(F.col("_line"))) == counted["_lh"]),
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias(text_col)
    )
    # a document whose every line was boilerplate keeps '' (it has no
    # surviving line rows, so the groupBy alone would drop the row)
    return corpus.select(id_col).join(rebuilt, id_col, "left").select(
        id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
