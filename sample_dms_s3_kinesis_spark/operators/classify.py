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
    """
    a = float(smoothing)
    toks = df.select(
        F.col(label_col).alias("label"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
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
) -> DataFrame:
    """Per-(doc, label) log-posterior scores: (id_col, label, score).

    One exploded-token pass: seen (token, label) weights come from the
    broadcast model join; every unseen token contributes the label's
    log_default, closed arithmetically via the per-doc token count."""
    toks = df.select(
        F.col(id_col),
        F.explode(_tokens(F.col(text_col))).alias("token"),
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
        F.col(id_col), F.size(_tokens(F.col(text_col))).alias("_n")
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
) -> DataFrame:
    """argmax label per doc: (id_col, predicted, score).  Deterministic
    tie-break: highest score, then label ascending."""
    scored = nb_score(
        df, token_model, label_model, text_col=text_col, id_col=id_col
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(id_col, F.col("label").alias("predicted"), "score")
    )
