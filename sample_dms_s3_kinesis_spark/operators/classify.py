"""Model-based curation: multinomial Naive Bayes over whitespace tokens.

The missing piece between heuristic quality signals (operators/text.py)
and human labels: train a token model on a labeled subset (language,
quality tier, domain), score the whole corpus, and filter/route on the
prediction — the shape of fastText-style quality/language filtering in
large-scale training-data pipelines, re-expressed as pure Catalyst
aggregates and joins.

Generalizes the reference's statistics machinery (per-table counters,
`/root/reference/run.py:209-215`) from counting rows to counting
(label, token) evidence.

Scale notes:
- Training is two hash aggregations: (label, token) counts and label
  totals.  Both partial-aggregate map-side, so hot tokens ship one
  partial row per task, not one row per occurrence.  Corpus-size
  scalars (vocab size, doc total) attach via broadcast 1-row cross
  joins — never a driver collect in the lazy plan.
- The model is O(labels × vocab) rows — small next to the corpus (it
  is the thing you'd broadcast).  Scoring joins the exploded token
  stream against the model on token, partially aggregates
  (doc, label) sums, then closes the unseen-token gap arithmetically:
  score = prior + Σ_seen log_cond + (n_tokens − n_seen)·log_default.
  That identity is what keeps scoring to ONE pass over the tokens —
  the naive per-(doc, label, token) left join would build the
  docs × labels × tokens cross product.
- argmax per doc is a row_number window partitioned by doc id — high
  cardinality, no skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.text import tokens


def _tokens(col: Column) -> Column:
    # NULL text coalesces to '' (one empty token, same as genuinely
    # empty text): without it a NULL doc explodes to NO token rows —
    # its label can vanish from the trained model, and at score time
    # size(NULL) = -1 turns the unseen-token closure into a huge
    # POSITIVE score that floats garbage docs to the top.
    return tokens(F.lower(F.coalesce(col, F.lit(""))))


def nb_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    smoothing: float = 1.0,
    tokenizer=None,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial NB token model.

    Returns ``(token_model, label_model)``:

    - ``token_model``: (label, token, log_cond) with
      log_cond = ln((c(label, token) + α) / (N_label + α·V))
    - ``label_model``: (label, log_prior, log_default) with
      log_prior = ln(docs_label / docs_total) and log_default the
      unseen-token likelihood ln(α / (N_label + α·V)).

    α = ``smoothing`` (Laplace), V = corpus vocabulary size,
    N_label = total token occurrences under the label.

    ``tokenizer`` swaps the feature stream: a ``Column -> Column``
    (array<string>) function replacing the default lowercased
    whitespace tokens — e.g. ``text.char_ngram_tokens`` for the
    char-n-gram language-ID flavor.  A custom tokenizer owns its NULL
    handling; score with the SAME tokenizer (:func:`nb_score` takes
    the identical kwarg) or the evidence spaces diverge.
    """
    a = float(smoothing)
    tok_fn = tokenizer if tokenizer is not None else _tokens
    toks = df.select(
        F.col(label_col).alias("label"),
        F.explode(tok_fn(F.col(text_col))).alias("token"),
    )
    counts = toks.groupBy("label", "token").agg(
        F.count(F.lit(1)).alias("_c")
    )
    totals = counts.groupBy("label").agg(F.sum("_c").alias("_n"))
    vocab = counts.select("token").distinct().agg(
        F.count(F.lit(1)).alias("_v")
    )
    denom = F.log(F.col("_n") + F.lit(a) * F.col("_v"))
    token_model = (
        counts.join(F.broadcast(totals), "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "token",
            (F.log(F.col("_c") + F.lit(a)) - denom).alias("log_cond"),
        )
    )
    doc_counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("_d")
    )
    doc_total = doc_counts.agg(F.sum("_d").alias("_t"))
    label_model = (
        doc_counts.crossJoin(F.broadcast(doc_total))
        .join(F.broadcast(totals), "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            (F.log(F.col("_d")) - F.log(F.col("_t"))).alias("log_prior"),
            (F.log(F.lit(a)) - denom).alias("log_default"),
        )
    )
    return token_model, label_model


def nb_score(
    df: DataFrame,
    token_model: DataFrame,
    label_model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer=None,
) -> DataFrame:
    """Per-(doc, label) log-posterior scores: (id_col, label, score).

    One exploded-token pass: seen (token, label) weights come from the
    broadcast model join; every unseen token contributes the label's
    log_default, closed arithmetically via the per-doc token count.
    ``tokenizer`` must match the one the model was trained with."""
    tok_fn = tokenizer if tokenizer is not None else _tokens
    toks = df.select(
        F.col(id_col),
        F.explode(tok_fn(F.col(text_col))).alias("token"),
    )
    seen = (
        toks.join(F.broadcast(token_model), "token")
        .groupBy(id_col, "label")
        .agg(
            F.sum("log_cond").alias("_s"),
            F.count(F.lit(1)).alias("_m"),
        )
    )
    per_doc = df.select(
        F.col(id_col), F.size(tok_fn(F.col(text_col))).alias("_n")
    )
    grid = per_doc.crossJoin(F.broadcast(label_model))
    return (
        grid.join(seen, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (
                F.col("log_prior")
                + F.coalesce(F.col("_s"), F.lit(0.0))
                + (F.col("_n") - F.coalesce(F.col("_m"), F.lit(0)))
                * F.col("log_default")
            ).alias("score"),
        )
    )


def nb_classify(
    df: DataFrame,
    token_model: DataFrame,
    label_model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer=None,
) -> DataFrame:
    """argmax label per doc: (id_col, predicted, score).  Deterministic
    tie-break: highest score, then label ascending.  ``tokenizer``
    must match the one the model was trained with."""
    scored = nb_score(
        df,
        token_model,
        label_model,
        text_col=text_col,
        id_col=id_col,
        tokenizer=tokenizer,
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(id_col, F.col("label").alias("predicted"), "score")
    )


# ------------------------- hashed-feature logistic regression (binary)

_LR_BIAS_BUCKET = -1  # the model frame's bias row


def _lr_features(
    df: DataFrame,
    *,
    text_col: str,
    id_col: str,
    buckets: int,
    hash_family: str,
    label_col: str | None = None,
) -> DataFrame:
    """Hashed term-frequency features: one row per (doc, bucket) with
    ``_tf = count/n_tokens`` — the hashing trick keeps the feature
    space O(buckets) regardless of vocabulary."""
    from sample_dms_s3_kinesis_spark.operators.partitioning import spread
    from sample_dms_s3_kinesis_spark.operators.text import (
        bucketed_token_hash,
    )

    cols = [F.col(id_col).alias("_id")]
    if label_col is not None:
        cols.append(F.col(label_col).cast("double").alias("_y"))
    tok = (
        spread(df)
        .select(*cols, F.explode(_tokens(F.col(text_col))).alias("_tok"))
        .withColumn(
            "_b",
            bucketed_token_hash(
                F.col("_tok"), buckets=buckets, hash_family=hash_family
            ),
        )
        .drop("_tok")
    )
    keys = ["_id", "_y"] if label_col is not None else ["_id"]
    counts = tok.groupBy(*keys, "_b").agg(F.count(F.lit(1)).alias("_c"))
    ntok = tok.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    return counts.join(ntok, "_id").select(
        *keys, "_b", (F.col("_c") / F.col("_n")).alias("_tf")
    )


def lr_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    buckets: int = 1024,
    epochs: int = 10,
    learning_rate: float = 1.0,
    l2: float = 0.0,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Binary logistic regression over hashed term-frequency features,
    trained by full-batch distributed gradient descent — the
    fastText/CCNet-style quality-classifier shape (a labeled seed set
    trains a model that scores the whole corpus), linear instead of
    generative where :func:`nb_train` is the generative flavor.

    ``label_col`` must be 0/1.  Per epoch: one broadcast join of the
    O(buckets) weight frame, one (doc)-keyed margin aggregate, one
    (bucket)-keyed gradient aggregate, one O(buckets) driver collect —
    the classic iterative-refinement shape (kmeans_refine, pagerank).
    The feature frame is built once and cached across epochs; the
    driver only ever holds O(buckets) scalars.  Float gradients sum in
    partition order, so training is deterministic up to last-ulp
    aggregation order (pytest pins it against a pure-Python reference;
    downstream queries are rows-only like the other iterative ops).

    Returns the model as a ``(bucket, weight)`` frame with the bias at
    ``bucket = -1`` (:data:`_LR_BIAS_BUCKET`) — one broadcastable
    artifact, O(buckets) rows.
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    if learning_rate <= 0:
        raise ValueError(f"learning_rate must be > 0, got {learning_rate}")
    # Fail on invalid labels instead of silently tolerating them: a
    # NULL label yields NULL residuals that drop out of both gradient
    # sums while the row still counts in n_docs — shrinking the
    # effective learning rate with no error.  One cheap pre-pass.
    _lbl = F.col(label_col).try_cast("int")
    n_bad = df.filter(_lbl.isNull() | ~_lbl.isin(0, 1)).count()
    if n_bad:
        raise ValueError(
            f"lr_train requires {label_col} in (0, 1); "
            f"{n_bad} row(s) are NULL or out of domain"
        )
    spark = df.sparkSession
    feats = _lr_features(
        df,
        text_col=text_col,
        id_col=id_col,
        buckets=buckets,
        hash_family=hash_family,
        label_col=label_col,
    ).persist()
    try:
        n_docs = feats.select("_id").distinct().count()
        if n_docs == 0:
            raise ValueError("lr_train needs a non-empty corpus")
        weights: dict[int, float] = {}
        bias = 0.0
        for _ in range(epochs):
            wdf = spark.createDataFrame(
                list(weights.items()) or [(0, 0.0)], "_b bigint, _w double"
            )
            resid = (
                feats.join(F.broadcast(wdf), "_b", "left")
                .groupBy("_id", "_y")
                .agg(
                    F.sum(
                        F.col("_tf") * F.coalesce(F.col("_w"), F.lit(0.0))
                    ).alias("_m")
                )
                .select(
                    "_id",
                    (
                        F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-(F.col("_m") + F.lit(bias))))
                        - F.col("_y")
                    ).alias("_r"),
                )
            )
            grad = (
                feats.join(resid, "_id")
                .groupBy("_b")
                .agg(F.sum(F.col("_tf") * F.col("_r")).alias("_g"))
                .union(
                    resid.agg(
                        F.lit(_LR_BIAS_BUCKET).cast("bigint").alias("_b"),
                        F.sum("_r").alias("_g"),
                    )
                )
            )
            grads = {r["_b"]: r["_g"] for r in grad.collect()}
            bias -= learning_rate * grads.pop(_LR_BIAS_BUCKET) / n_docs
            for b in set(weights) | set(grads):
                g = grads.get(b, 0.0) / n_docs + l2 * weights.get(b, 0.0)
                w = weights.get(b, 0.0) - learning_rate * g
                weights[b] = w
    finally:
        feats.unpersist()
    rows = [(int(b), float(w)) for b, w in sorted(weights.items())]
    rows.append((_LR_BIAS_BUCKET, float(bias)))
    return spark.createDataFrame(rows, "bucket bigint, weight double")


def lr_score(
    df: DataFrame,
    model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    hash_family: str = "xxhash64",
    threshold: float = 0.5,
) -> DataFrame:
    """Score documents under an :func:`lr_train` model: one explode
    pass, a broadcast join of the O(buckets) model, one per-doc
    aggregate.  ``buckets``/``hash_family`` must match training (the
    hashed feature space IS the model's coordinate system).

    Returns ``(id_col, prob, predicted)`` with ``prob`` the positive-
    class probability (rounded to 6) and ``predicted`` = 1 when
    ``prob >= threshold``.
    """
    bias_rows = model.filter(F.col("bucket") == _LR_BIAS_BUCKET).collect()
    if len(bias_rows) != 1:
        raise ValueError(
            "model frame must contain exactly one bias row "
            f"(bucket = {_LR_BIAS_BUCKET})"
        )
    bias = float(bias_rows[0]["weight"])
    wdf = model.filter(F.col("bucket") != _LR_BIAS_BUCKET).select(
        F.col("bucket").alias("_b"), F.col("weight").alias("_w")
    )
    feats = _lr_features(
        df,
        text_col=text_col,
        id_col=id_col,
        buckets=buckets,
        hash_family=hash_family,
    )
    prob = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.col("_m") + F.lit(bias)))
    )
    return (
        feats.join(F.broadcast(wdf), "_b", "left")
        .groupBy("_id")
        .agg(
            F.sum(F.col("_tf") * F.coalesce(F.col("_w"), F.lit(0.0))).alias(
                "_m"
            )
        )
        .select(
            F.col("_id").alias(id_col),
            F.round(prob, 6).alias("prob"),
            (prob >= F.lit(threshold)).cast("int").alias("predicted"),
        )
    )


# ------------------------------------------------- weak supervision

def weak_vote(
    df: DataFrame,
    labelers: dict[str, Column],
    *,
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Snorkel-style label-model baseline: apply k labeling functions
    (Catalyst Columns yielding a string label or NULL = ABSTAIN) and
    resolve each row by majority vote.

    Ties break to the lexicographically smallest tied label and the
    vote among k labelers is O(k²) per-row HOF arithmetic — k is
    single digits while the corpus is not, so everything stays in
    whole-stage codegen with zero shuffles (the vote is a projection).

    Output per row: ``(*id_cols, <labeler cols>, n_votes,
    majority_label, n_majority, unanimous, conflict)``; rows where
    every labeler abstains carry NULL majority and n_votes = 0."""
    if not labelers:
        raise ValueError("weak_vote requires at least one labeler")
    named = [(name, expr.alias(name)) for name, expr in labelers.items()]
    base = df.select(*id_cols, *[e for _, e in named])
    votes = F.filter(
        F.array(*[F.col(name) for name, _ in named]),
        lambda x: x.isNotNull(),
    )

    def _best(vs: Column) -> Column:
        # min over (-count, label) structs == max count, tie -> smallest
        return F.array_min(
            F.transform(
                F.array_distinct(vs),
                lambda lab: F.struct(
                    (-F.size(F.filter(vs, lambda x: x == lab))).alias(
                        "nc"
                    ),
                    lab.alias("lab"),
                ),
            )
        )

    out = base.withColumn("_votes", votes).withColumn(
        "_best", _best(F.col("_votes"))
    )
    n_votes = F.size("_votes")
    return out.select(
        *id_cols,
        *[F.col(name) for name, _ in named],
        n_votes.alias("n_votes"),
        F.col("_best.lab").alias("majority_label"),
        F.coalesce(-F.col("_best.nc"), F.lit(0)).alias("n_majority"),
        ((n_votes > 0) & (-F.col("_best.nc") == n_votes)).alias(
            "unanimous"
        ),
        (F.size(F.array_distinct("_votes")) > 1).alias("conflict"),
    )


def weak_vote_report(
    voted: DataFrame, labeler_names: Sequence[str]
) -> DataFrame:
    """Per-labeler diagnostics over a :func:`weak_vote` frame: coverage
    (fraction of rows with a non-NULL vote) and agreement (fraction of
    its votes matching the majority) — the two numbers that tell you
    which labeling function to fix first.  One map-side-combined
    aggregate; output one row per labeler, ordered by name."""
    if not labeler_names:
        raise ValueError("weak_vote_report requires labeler names")
    aggs = []
    for name in labeler_names:
        aggs.append(
            F.round(
                F.avg(F.col(name).isNotNull().cast("double")), 6
            ).alias(f"_cov_{name}")
        )
        aggs.append(
            F.round(
                F.coalesce(
                    F.sum(
                        (F.col(name) == F.col("majority_label")).cast(
                            "long"
                        )
                    )
                    / F.sum(F.col(name).isNotNull().cast("long")),
                    F.lit(0.0),
                ),
                6,
            ).alias(f"_agr_{name}")
        )
    row = voted.agg(*aggs)
    per = None
    for name in labeler_names:
        one = row.select(
            F.lit(name).alias("labeler"),
            F.col(f"_cov_{name}").alias("coverage"),
            F.col(f"_agr_{name}").alias("agreement"),
        )
        per = one if per is None else per.unionByName(one)
    return per.orderBy("labeler")


# ------------------------------- char-n-gram language identification

def langid_nb_model(
    spark,
    *,
    n: int = 3,
    smoothing: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train the char-n-gram NB language model on the in-repo seed
    corpus (``operators/langid_data.py``: 12 Latin-script languages ×
    18-22 sentences; see that module's docstring for the exact class
    balance) — the fastText-shaped upgrade over the marker-word
    heuristic, which covers en/de/fr/es only and funnels every other
    Latin-script language into one of those four.

    The model is tiny (trigram vocab over ~120 sentences — a few
    thousand rows) and broadcast at score time, so classifying a
    100 TB corpus is one exploded-n-gram pass with a broadcast join:
    no shuffle grows with the model, only with the corpus.  Returns
    the same ``(token_model, label_model)`` pair as :func:`nb_train`;
    score through :func:`lang_id_nb` (which fixes the SAME tokenizer
    so the evidence spaces match)."""
    from sample_dms_s3_kinesis_spark.operators.langid_data import (
        LANGID_SEED,
    )
    from sample_dms_s3_kinesis_spark.operators.text import (
        char_ngram_tokens,
    )

    key = (spark.sparkContext.applicationId, n, float(smoothing))
    if key not in _LANGID_MODEL_CACHE:
        seed = spark.createDataFrame(
            LANGID_SEED, "lang string, text string"
        )
        tm, lm = nb_train(
            seed,
            text_col="text",
            label_col="lang",
            smoothing=smoothing,
            tokenizer=lambda c: char_ngram_tokens(c, n),
        )
        # materialize ONCE per session and hand scorers literal frames:
        # the seed corpus is fixed, so retraining inside every scoring
        # DAG (each action re-running the whole agg chain) buys nothing
        # — the model is a few thousand rows, well under driver limits
        _LANGID_MODEL_CACHE[key] = (
            spark.createDataFrame(tm.collect(), tm.schema),
            spark.createDataFrame(lm.collect(), lm.schema),
        )
    return _LANGID_MODEL_CACHE[key]


_LANGID_MODEL_CACHE: dict = {}


def lang_id_nb(
    df: DataFrame,
    token_model: DataFrame,
    label_model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Classify Latin-script text by language with a
    :func:`langid_nb_model` pair: (id_col, predicted, score).  Pair
    with ``text.detect_script``/``text.lang_id_unicode`` for the full
    router — non-Latin scripts read their language off the script
    (han→zh, cyrillic→ru, …); this model separates the Latin-script
    languages the script layer cannot."""
    return nb_classify(
        df,
        token_model,
        label_model,
        text_col=text_col,
        id_col=id_col,
        tokenizer=lambda c: _char_tok(c, n),
    )


def _char_tok(col: Column, n: int) -> Column:
    from sample_dms_s3_kinesis_spark.operators.text import (
        char_ngram_tokens,
    )

    return char_ngram_tokens(col, n)


def lang_id_router(
    df: DataFrame,
    token_model: DataFrame,
    label_model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """The full language-ID router: (id_col, script, predicted).

    Non-Latin scripts read their language straight off the code points
    (``text.lang_id_unicode`` — han→zh, cyrillic→ru, the kana-in-CJK→ja
    rule); Latin-script text goes through the char-n-gram NB model,
    which separates the twelve Latin-script languages the script layer
    cannot.  ``'unknown'``-script (letterless) and NULL text keep the
    unicode path's answer (marker fallback / NULL respectively).

    Scale shape: one script-detect regex pass, then the Latin branch
    is one exploded-n-gram pass with a broadcast model join — neither
    shuffle grows with the model, only with the corpus."""
    from sample_dms_s3_kinesis_spark.operators.text import (
        detect_script,
        lang_id_unicode,
    )

    base = df.select(
        F.col(id_col),
        F.col(text_col),
        detect_script(F.col(text_col)).alias("script"),
    )
    latin = base.filter(F.col("script") == "latin")
    other = base.filter(
        F.col("script").isNull() | (F.col("script") != "latin")
    )
    latin_out = (
        latin.select(id_col, "script")
        .join(
            lang_id_nb(
                latin,
                token_model,
                label_model,
                text_col=text_col,
                id_col=id_col,
                n=n,
            ).select(id_col, "predicted"),
            id_col,
        )
        .select(id_col, "script", "predicted")
    )
    other_out = other.select(
        F.col(id_col),
        F.col("script"),
        lang_id_unicode(F.col(text_col)).alias("predicted"),
    )
    return latin_out.unionByName(other_out)
