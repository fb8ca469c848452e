"""Text analysis operators for training-data pipelines: tokenization,
quality scoring, language ID, fingerprinting.

All pure Catalyst expressions (split/filter/transform/aggregate over
arrays + regexp) — no Python in the row path, so they scale linearly
with input and stay inside WholeStageCodegen.  Every op is also
expressible in ANSI SQL, which is how the DuckDB oracle cross-checks
them (see plans.registry).

Reference note: the reference has no text ops (SURVEY §2.8 — scalar
surface is concat/lower/json only); these extend the engine per the
north star in BASELINE.json.
"""

from __future__ import annotations

from collections.abc import Sequence

from sample_dms_s3_kinesis_spark.operators.partitioning import spread

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Whitespace tokenization: the shared definition for every op below and
# for the oracle SQL (regexp_split_to_array(trim(text), '\s+')).
_WS = r"\s+"

# Small deterministic marker-word lists for the language-ID heuristic.
# Chosen to be expressible identically in Spark and DuckDB SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}
# Deterministic tie-break preference (first wins on equal scores).
LANG_ORDER = ["en", "de", "fr", "es", "zh"]

STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "for"]


def tokens(col: Column) -> Column:
    """Whitespace tokens (BPE-ish splitting is a downstream concern;
    the token count contract is whitespace words)."""
    return F.split(F.trim(col), _WS)


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def char_count(col: Column) -> Column:
    return F.length(col).cast("long")


def punct_count(col: Column) -> Column:
    # Count of sentence punctuation; regex kept identical in oracle SQL.
    return F.length(F.regexp_replace(col, r"[^.!?,;:]", "")).cast("long")


def stopword_count(col: Column) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(
        F.filter(tokens(F.lower(col)), lambda t: F.array_contains(sw, t))
    ).cast("long")


def avg_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.round(total.cast("double") / F.size(toks).cast("double"), 4)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring features: length, token stats,
    punctuation ratio, stopword ratio (rounded for stable comparison)."""
    c = F.col(text_col)
    n_tok = token_count(c)
    n_chr = char_count(c)
    return df.select(
        "doc_id",
        n_chr.alias("n_chars_measured"),
        n_tok.alias("n_tokens"),
        avg_token_len(c).alias("avg_token_len"),
        F.round(punct_count(c).cast("double") / n_chr.cast("double"), 4).alias(
            "punct_ratio"
        ),
        F.round(stopword_count(c).cast("double") / n_tok.cast("double"), 4).alias(
            "stopword_ratio"
        ),
    )


def quality_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Composite linear quality score in [0, 1] plus a keep decision —
    the fixed-weight stand-in for a learned quality classifier (the
    CCNet/Gopher-style rule stack), entirely Catalyst expressions:

      0.4 · min(n_tokens/64, 1)          (length)
      0.3 · min(5 · stopword_ratio, 1)   (naturalness)
      0.3 · distinct_tokens/tokens       (non-repetitiveness)

    Every component is SQL-replicable token math, so the whole score is
    oracle-checkable.  Output: (id_col, quality_score, keep:int).
    One narrow projection, no shuffle, no UDFs."""
    c = F.col(text_col)
    toks = tokens(F.lower(c))
    n_tok = F.size(toks).cast("double")
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_ratio = (
        F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast("double")
        / n_tok
    )
    stop_score = F.least(F.lit(5.0) * stop_ratio, F.lit(1.0))
    uniq_score = F.size(F.array_distinct(toks)).cast("double") / n_tok
    score = F.round(
        F.lit(0.4) * len_score + F.lit(0.3) * stop_score + F.lit(0.3) * uniq_score,
        6,
    )
    return df.select(
        F.col(id_col),
        score.alias("quality_score"),
        (score >= F.lit(threshold)).cast("int").alias("keep"),
    )


def _marker_score(col: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens(F.lower(col)), lambda t: F.array_contains(markers, t)))


def lang_id(col: Column) -> Column:
    """N-gram-free marker-word language ID: argmax of marker hits with
    a deterministic preference order on ties.  Intentionally simple —
    the pipeline contract is a deterministic, cheap, shuffle-free
    classifier; swap in a real model via mapInPandas when available."""
    scores = {lang: _marker_score(col, lang) for lang in LANG_ORDER}
    expr = F.lit(LANG_ORDER[-1])
    # Build the CASE chain back-to-front so earlier langs win ties.
    for lang in reversed(LANG_ORDER[:-1]):
        later = [scores[l] for l in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]]
        cond = F.lit(True)
        for other in later:
            cond = cond & (scores[lang] >= other)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text.  md5 (not xxhash64) so external systems — and the DuckDB
    oracle — can reproduce it byte-for-byte."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), _WS, " "))


def dup_token_fraction(col: Column) -> Column:
    """Repetition signal: fraction of (lowercased) token occurrences
    that are repeats of an earlier token — 1 − |distinct|/|tokens|.
    High values flag boilerplate/spam (the Gopher-style repetition
    filters use exactly this family of signals)."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    return F.when(
        n > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))


def word_bigrams(col: Column) -> Column:
    """Consecutive lowercased token bigrams (with repeats — occurrence
    list, not a set; near-dup shingles use ``token_ngrams`` instead).
    Token array bound once (:func:`_bind`) — inlining it into the
    per-position lambda would re-split the text per bigram."""

    def _bigrams(toks: Column) -> Column:
        idx = F.when(
            F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1))
        )

    return _bind(tokens(F.lower(col)), _bigrams)


def top_bigram_fraction(grams: Column) -> Column:
    """Fraction of bigram occurrences taken by the single most frequent
    bigram — the "repeated phrase" signal.  Quadratic in tokens-per-doc
    (count via per-element filter) but all JVM-side array ops; documents
    are short, and the whole computation is per-row/narrow so it scales
    out linearly with the corpus.  Pass a MATERIALIZED ``grams`` column
    (own projection): higher-order lambdas are opaque to Catalyst's
    subexpression elimination, so inlining ``word_bigrams`` here would
    rebuild the array once per lambda."""
    counts = F.transform(
        grams, lambda g: F.size(F.filter(grams, lambda x: x == g))
    )
    return F.when(
        F.size(grams) > 0,
        F.round(
            F.array_max(counts).cast("double") / F.size(grams).cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))


def normalize_text(col: Column) -> Column:
    """Canonical text form for fingerprinting and exact-dup detection
    across cosmetic variants: lowercase, digit runs folded to ``0``,
    punctuation/symbols to spaces, whitespace collapsed, trimmed.
    Regex classes kept RE2/Java-identical so the DuckDB oracle (with
    the ``'g'`` flag) reproduces it byte-for-byte."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[0-9]+", "0")
    c = F.regexp_replace(c, r"[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def _bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` once and hand it to ``fn`` as a BOUND lambda
    variable.  Referencing a computed array expression inside a
    higher-order-function lambda re-evaluates the whole expression once
    per element (HOF lambdas are opaque to Catalyst CSE) — quadratic
    per-row blowup; routing it through a 1-element array transform
    turns it into a lambda variable, evaluated once and referenced
    cheaply."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def rolling_hashes(col: Column, window: int = 8) -> Column:
    """Winnowing-style rolling token-window hashes: xxhash64 over each
    consecutive ``window``-token span.  Spark-side only (xxhash64), used
    by near-dup candidate generation; no SQL oracle.  The token array
    is bound once (:func:`_bind`) — inlining it into the per-position
    lambda would re-split the text once per position."""

    def _roll(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
        return F.transform(
            idx,
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))),
        )

    return _bind(tokens(F.lower(col)), _roll)


# BPE-ish pre-tokenization: the GPT-2-family pretoken split — word
# pieces with leading space, number runs, punctuation runs.  Kept to a
# regex class both Spark and DuckDB execute identically (no lookahead).
_BPE_ISH = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def bpe_ish_tokens(col: Column) -> Column:
    """Sub-word-ish pretokens via regexp_extract_all: letter runs,
    digit runs, punctuation runs.  A real BPE merges within these
    pretokens; counting them is the standard cheap token estimate."""
    return F.regexp_extract_all(col, F.lit(_BPE_ISH), 0)


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(bpe_ish_tokens(col)).cast("long")


def tfidf_topk(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: ``tf(term, doc) ·
    ln(N / df(term))``, ties broken by term for determinism.
    Output: (id_col, term, tfidf rounded to 6).

    Plan shape at scale: one explode (narrow), a (doc, term) count and
    a per-term document-frequency count — both partial-aggregated
    map-side before their shuffles — then a shuffle join on ``term``
    and a per-doc top-k window.  The corpus size N rides along as a
    broadcast scalar.  No driver-side vocabulary; terms stay
    distributed end to end."""
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = terms.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def winnowed_fingerprints(
    col: Column, *, shingle: int = 8, window: int = 4
) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): over the rolling ``shingle``-token hashes, keep the
    minimum of every ``window`` consecutive hashes, distinct.

    Guarantee: any shared token run of at least ``shingle + window - 1``
    tokens between two documents yields at least one shared
    fingerprint — substring-level near-dup detection with output size
    ~1/window of the shingle count.  Spark-side only (xxhash64); the
    soundness property is pytest-checked rather than SQL-oracled.
    The rolling-hash array is bound once (:func:`_bind`) — inlining it
    into the min-of-window lambda would recompute every rolling hash
    once per position, O(positions²·shingle) per document."""

    def _winnow(rh: Column) -> Column:
        n = F.size(rh)
        idx = F.when(n >= window, F.sequence(F.lit(0), n - window)).otherwise(
            F.array().cast("array<int>")
        )
        mins = F.transform(
            idx, lambda i: F.array_min(F.slice(rh, i + 1, window))
        )
        return F.array_distinct(mins)

    return _bind(rolling_hashes(col, window=shingle), _winnow)


# ------------------------------------------------------ PII redaction

# Redaction patterns, most-specific first (an email is consumed before
# its digits can match "number").  Kept to RE2/Java-portable syntax —
# no backreferences or lookaround — so the same pattern string runs in
# Spark, DuckDB ('g' flag), and Python re (the pytest reference).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "phone": r"\+?[0-9][0-9()\-. ]{7,}[0-9]",
    "number": r"[0-9]+",
}
# Application order matters: later patterns must not re-match earlier
# replacement tokens, so every token is digit-free ("ipv4" → "<IP>",
# not "<IPV4>", whose digit the "number" pass would re-redact).
PII_ORDER = ["email", "ipv4", "phone", "number"]
PII_TOKENS = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
    "number": "<NUMBER>",
}


def redact_pii(col: Column, kinds: tuple[str, ...] = ("email", "ipv4", "number")) -> Column:
    """Replace each PII match with a digit-free ``PII_TOKENS`` token.
    Pure regexp_replace chain — JVM-side, codegen-friendly; Spark's
    regexp_replace is replace-all (mirror with the 'g' flag in SQL)."""
    out = col
    for k in PII_ORDER:
        if k in kinds:
            out = F.regexp_replace(out, PII_PATTERNS[k], PII_TOKENS[k])
    return out


def pii_count(col: Column, kinds: tuple[str, ...] = ("email", "ipv4", "number")) -> Column:
    """Number of PII matches that redact_pii would replace.  Counts are
    computed on the progressively redacted text so overlapping kinds
    (email digits vs number) aren't double-counted."""
    total = F.lit(0).cast("long")
    cur = col
    for k in PII_ORDER:
        if k in kinds:
            total = total + F.size(
                F.regexp_extract_all(cur, F.lit(PII_PATTERNS[k]), F.lit(0))
            ).cast("long")
            cur = F.regexp_replace(cur, PII_PATTERNS[k], PII_TOKENS[k])
    # regexp_extract_all(NULL) is NULL; size(NULL) is -1 under the
    # default legacy.sizeOfNull (NULL under ANSI) — either way null text
    # must count 0, not a negative/null total.
    return F.when(col.isNull(), F.lit(0).cast("long")).otherwise(total)


def vocab_topk(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "lang",
    k: int = 20,
) -> DataFrame:
    """Top-k most frequent tokens per group (language) with counts —
    the heavy-hitter vocabulary build that precedes tokenizer training.

    Plan: explode tokens map-side → groupBy (group, token) with partial
    map-side aggregation (the shuffle carries one row per distinct
    token per partition, so hot tokens like 'the' never concentrate raw
    occurrences on one task) → per-group rank window over the
    AGGREGATED frame, which is O(vocab) rows, not O(token stream).
    Ties break on token asc for determinism.
    Output: (group_col, rank, token, n_occurrences)."""
    from pyspark.sql import Window

    counts = (
        df.select(
            F.col(group_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
        )
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("n_occurrences"), F.asc("token")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "rank", "token", "n_occurrences")
    )


def vocab_coverage(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    sizes: Sequence[int] = (8, 16, 32, 64),
) -> DataFrame:
    """Tokenizer-sizing coverage curve: for each candidate vocabulary
    size K, the fraction of token OCCURRENCES the top-K
    tokens-by-frequency cover (``q_oov_rate``'s corpus-level dual —
    one row per K instead of per document; the curve's knee is where
    growing the vocab stops paying).

    Plan: one token count aggregate; the top-``max(sizes)`` candidates
    via orderBy+limit (TakeOrderedAndProject — per-partition heaps,
    never a global sort); ranks and the per-K rollup live entirely on
    that ≤max(sizes)-row frame, with the grand total broadcast as a
    1-row frame.  Ties break on the token string so the curve is
    deterministic across engines.

    Returns ``(vocab_size, covered, total_tokens, coverage)``.
    """
    ks = sorted(set(int(k) for k in sizes))
    if not ks or ks[0] < 1:
        raise ValueError(f"sizes must be positive ints, got {sizes!r}")
    tok = spread(corpus).select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok")
    )
    counts = tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    total = counts.agg(F.sum("_c").alias("_total"))
    ranked = (
        counts.orderBy(F.desc("_c"), F.asc("_tok"))
        .limit(ks[-1])
        .withColumn(
            "_r",
            F.row_number().over(Window.orderBy(F.desc("_c"), F.asc("_tok"))),
        )
    )
    k_frame = F.broadcast(
        ranked.sparkSession.createDataFrame(
            [(k,) for k in ks], "vocab_size int"
        )
    )
    return (
        ranked.join(k_frame, F.col("_r") <= F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(F.sum("_c").alias("covered"))
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_size",
            "covered",
            F.col("_total").alias("total_tokens"),
            F.round(
                F.col("covered").cast("double") / F.col("_total"), 6
            ).alias("coverage"),
        )
    )
