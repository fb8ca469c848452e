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
        # n_chars = 0 (empty text) would raise DIVIDE_BY_ZERO under
        # ANSI mode and abort the whole scan — an empty doc has zero
        # punctuation by definition (oracle mirrors the CASE)
        F.when(
            n_chr > 0,
            F.round(punct_count(c).cast("double") / n_chr.cast("double"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("punct_ratio"),
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
    # '' pseudo-tokens (empty/whitespace text) are filtered, and a doc
    # with NO real tokens scores 0.0 instead of the old 0.30625
    # freebie (one '' token counted as length + full uniqueness); the
    # token array is BOUND once — size/filter/array_distinct are HOF
    # siblings Catalyst will not CSE.
    toks_expr = F.filter(tokens(F.lower(c)), lambda x: x != F.lit(""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])

    def _score(toks: Column) -> Column:
        n_tok = F.size(toks).cast("double")
        len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
        stop_ratio = (
            F.size(
                F.filter(toks, lambda x: F.array_contains(sw, x))
            ).cast("double")
            / n_tok
        )
        stop_score = F.least(F.lit(5.0) * stop_ratio, F.lit(1.0))
        uniq_score = F.size(F.array_distinct(toks)).cast("double") / n_tok
        return F.when(
            F.size(toks) > 0,
            F.round(
                F.lit(0.4) * len_score
                + F.lit(0.3) * stop_score
                + F.lit(0.3) * uniq_score,
                6,
            ),
        ).otherwise(F.lit(0.0))

    score = _bind(toks_expr, _score)
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
    classifier; swap in a real model via mapInPandas when available.

    Double _bind: the token array is evaluated ONCE and the five
    marker scores are packed into one bound array — inlined, each of
    the ~20 CASE references re-tokenized and re-filtered the text
    (Catalyst does not CSE across HOF siblings; measured 20 split()
    invocations per row in the unbound plan)."""

    def _pick(toks: Column) -> Column:
        def score(lang: str) -> Column:
            markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
            return F.size(
                F.filter(toks, lambda t: F.array_contains(markers, t))
            )

        def _case(arr: Column) -> Column:
            def sc(lang: str) -> Column:
                return F.element_at(arr, LANG_ORDER.index(lang) + 1)

            expr = F.lit(LANG_ORDER[-1])
            # CASE chain back-to-front so earlier langs win ties.
            for lang in reversed(LANG_ORDER[:-1]):
                cond = F.lit(True)
                for other in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]:
                    cond = cond & (sc(lang) >= sc(other))
                expr = F.when(cond, F.lit(lang)).otherwise(expr)
            return expr

        return _bind(F.array(*[score(l) for l in LANG_ORDER]), _case)

    return _bind(tokens(F.lower(col)), _pick)


# Script classes for detect_script / lang_id_unicode, in deterministic
# tie-break order (first wins on equal letter counts).  Two spellings
# of each class: Java regex (\p{IsXxx}, Spark side) and RE2 (\p{Xxx},
# DuckDB oracle side) — keep in lockstep.
SCRIPT_CLASSES: list[tuple[str, str, str]] = [
    ("latin", r"\p{IsLatin}", r"\p{Latin}"),
    ("han", r"\p{IsHan}", r"\p{Han}"),
    ("kana", r"\p{IsHiragana}\p{IsKatakana}", r"\p{Hiragana}\p{Katakana}"),
    ("hangul", r"\p{IsHangul}", r"\p{Hangul}"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
    ("greek", r"\p{IsGreek}", r"\p{Greek}"),
    ("devanagari", r"\p{IsDevanagari}", r"\p{Devanagari}"),
    ("thai", r"\p{IsThai}", r"\p{Thai}"),
]
# script -> language code for the script-first layer of
# lang_id_unicode; latin resolves through the marker heuristic.
SCRIPT_LANG: dict[str, str] = {
    "han": "zh",
    "kana": "ja",
    "hangul": "ko",
    "cyrillic": "ru",
    "arabic": "ar",
    "greek": "el",
    "devanagari": "hi",
    "thai": "th",
}


def _script_counts(col: Column) -> Column:
    """array<long> of per-script letter counts, SCRIPT_CLASSES order —
    one regexp_replace pass per class (counting survivors), packed
    into one array so consumers bind it once."""
    return F.array(
        *[
            F.length(F.regexp_replace(col, f"[^{java}]", "")).cast(
                "long"
            )
            for _, java, _re2 in SCRIPT_CLASSES
        ]
    )


def _dominant_script(arr: Column) -> Column:
    """argmax over a bound ``_script_counts`` array, SCRIPT_CLASSES
    order winning ties — the ONE tie-break chain detect_script and
    lang_id_unicode share (duplicated, the two operators could
    silently diverge)."""
    names = [n for n, _, _ in SCRIPT_CLASSES]

    def sc(i: int) -> Column:
        return F.element_at(arr, i + 1)

    expr = F.lit(names[-1])
    for i in reversed(range(len(names) - 1)):
        cond = F.lit(True)
        for j in range(i + 1, len(names)):
            cond = cond & (sc(i) >= sc(j))
        expr = F.when(cond, F.lit(names[i])).otherwise(expr)
    return expr


def _script_total(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)


def detect_script(col: Column) -> Column:
    """Dominant writing system of the text: argmax of per-script letter
    counts over ``SCRIPT_CLASSES`` (deterministic order wins ties),
    ``'unknown'`` when no class matches at all, NULL for NULL input
    (without the guard the all-NULL counts skip every when() branch
    and fall through to the LAST script class — NULL text would tag
    'thai').  The script layer the r14 Unicode work needs under
    language ID: marker words are useless outside Latin text, but the
    script is readable straight off the code points.  Pure Catalyst —
    one regex pass per class, argmax via a bound CASE chain;
    DuckDB-replayable (RE2 spellings in SCRIPT_CLASSES)."""

    def _case(arr: Column) -> Column:
        total = _script_total(arr)
        return (
            F.when(total.isNull(), F.lit(None).cast("string"))
            .when(total == 0, F.lit("unknown"))
            .otherwise(_dominant_script(arr))
        )

    return _bind(_script_counts(col), _case)


def lang_id_unicode(col: Column) -> Column:
    """Script-first language ID: non-Latin scripts map straight to a
    language (``SCRIPT_LANG`` — han→zh, kana→ja, hangul→ko, …) with
    one Japanese-specific rule (kana present AND the dominant script
    is han or kana → ja, because mixed kanji-kana text is Japanese
    even when Han letters dominate — gated on the dominant script so
    a Latin document quoting one katakana loanword stays under the
    marker heuristic); Latin and letterless text fall back to the
    marker-word heuristic (:func:`lang_id`); NULL input stays NULL.
    The upgrade that stops every CJK/Cyrillic document from
    classifying as 'en'."""

    def _pick(arr: Column) -> Column:
        names = [n for n, _, _ in SCRIPT_CLASSES]
        kana = F.element_at(arr, names.index("kana") + 1)
        dominant = _dominant_script(arr)
        total = _script_total(arr)
        mapped = F.lit(None).cast("string")
        for script, lang in SCRIPT_LANG.items():
            mapped = F.when(
                dominant == script, F.lit(lang)
            ).otherwise(mapped)
        return (
            F.when(total.isNull() | (total == 0), F.lit(None).cast("string"))
            .when(
                (kana > 0) & dominant.isin("han", "kana"), F.lit("ja")
            )
            .otherwise(mapped)
        )

    script_lang = _bind(_script_counts(col), _pick)
    return F.when(
        col.isNotNull(), F.coalesce(script_lang, lang_id(col))
    )


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
    out linearly with the corpus.  ``grams`` is bound once (_bind), so
    an inline ``word_bigrams`` expression is NOT rebuilt per lambda
    (higher-order lambdas are opaque to Catalyst's subexpression
    elimination) — no call-site materialization discipline needed."""

    def _frac(gs: Column) -> Column:
        counts = F.transform(
            gs, lambda g: F.size(F.filter(gs, lambda x: x == g))
        )
        return F.when(
            F.size(gs) > 0,
            F.round(
                F.array_max(counts).cast("double")
                / F.size(gs).cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0))

    return _bind(grams, _frac)


def normalize_text(col: Column, *, nfkc: bool = False) -> Column:
    """Canonical text form for fingerprinting and exact-dup detection
    across cosmetic variants: lowercase, digit runs folded to ``0``,
    punctuation/symbols to spaces, whitespace collapsed, trimmed.

    Unicode-aware: the keep-classes are ``\\p{L}`` (any letter — Han,
    Cyrillic, Arabic, Greek, accented Latin…) and ``\\p{N}`` (any
    number, so Arabic-Indic/Devanagari digit runs fold to ``0`` too).
    A CJK or Cyrillic document therefore normalizes to its own
    canonical form instead of the empty string (the pre-r14 ASCII
    classes collapsed every non-Latin document into one dup cluster).
    On pure-ASCII input the output is byte-identical to the old form.
    Both Java regex (Spark) and RE2 (DuckDB, ``'g'`` flag) support
    ``\\p{L}``/``\\p{N}``, so the oracle reproduces it byte-for-byte.

    ``nfkc=True`` prepends NFKC compatibility folding (full-width →
    ASCII, ligatures decomposed, …) via an Arrow-batched pandas UDF —
    the one step Catalyst has no expression for.  Off by default: the
    default path stays pure-JVM and oracle-replayable (DuckDB exposes
    NFC only)."""
    if nfkc:
        col = _nfkc(col)
    c = F.lower(col)
    c = F.regexp_replace(c, r"\p{N}+", "0")
    c = F.regexp_replace(c, r"[^\p{L}\p{N} ]", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def _nfkc(col: Column) -> Column:
    """NFKC compatibility normalization as an Arrow-batched pandas UDF
    (vectorized; NOT on any oracle-checked path — see normalize_text)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfkc_udf(s):  # pragma: no cover - exercised via normalize_text
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFKC", v)
            if v is not None
            else None
        )

    return _nfkc_udf(col)


# Scripts written without inter-word spaces (or where whitespace
# tokenization is uninformative): Han, Hiragana, Katakana, Hangul,
# Thai, Lao, Khmer, Myanmar.  Two spellings of the same class: Java
# regex wants \p{IsHan}, RE2 (DuckDB) wants \p{Han} — keep them in
# lockstep when editing.
_SPACEFREE_JAVA = (
    r"[\p{IsHan}\p{IsHiragana}\p{IsKatakana}\p{IsHangul}"
    r"\p{IsThai}\p{IsLao}\p{IsKhmer}\p{IsMyanmar}]"
)
SPACEFREE_RE2 = (
    r"[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}"
    r"\p{Thai}\p{Lao}\p{Khmer}\p{Myanmar}]"
)


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct sliding character ``n``-grams — the shingle unit for
    space-free scripts, where a whitespace token is a whole clause and
    word shingles don't exist.  A string shorter than ``n`` yields
    itself (never an empty set, so short CJK strings still
    fingerprint).  Pure Catalyst: sequence + substring transform over
    a bound value."""
    return _bind(col, lambda s: _char_grams_inline(s, n))


def segment_tokens(col: Column, *, char_n: int = 3) -> Column:
    """Whitespace tokens with a character-n-gram fallback for
    space-free scripts: tokens containing Han/kana/Hangul/Thai/…
    characters (``_SPACEFREE_JAVA``) expand into their distinct
    character ``char_n``-grams; every other token passes through
    unchanged.  On pure-ASCII text this is exactly ``tokens`` — the
    fallback branch never fires — so ASCII consumers (and their DuckDB
    oracles) are unaffected.  Nested higher-order functions, no
    Python."""

    def _seg(toks: Column) -> Column:
        return F.flatten(
            F.transform(
                toks,
                lambda t: F.when(
                    t.rlike(_SPACEFREE_JAVA),
                    _char_grams_inline(t, char_n),
                ).otherwise(F.array(t)),
            )
        )

    return _bind(tokens(col), _seg)


def char_ngram_tokens(col: Column, n: int = 3) -> Column:
    """ALL sliding character ``n``-grams WITH multiplicity over the
    lowercased, whitespace-collapsed text (NULL → one ``''`` token,
    the :mod:`classify` NULL contract) — the langid feature stream.
    Unlike :func:`char_ngrams` (distinct shingles for minhash sets),
    this keeps duplicates: a multinomial NB model counts evidence per
    OCCURRENCE, and n-gram frequency is exactly what separates
    related languages.  Trigrams span word boundaries through the
    single collapsed space — function-word edges ('the', 'le ', ' el')
    are the classic discriminators.  Pure Catalyst."""
    c = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(col, F.lit(""))), _WS, " "
        )
    )
    return _bind(
        c,
        lambda s: F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))
            ),
            lambda i: F.substring(s, i, n),
        ),
    )


def _char_grams_inline(s: Column, n: int) -> Column:
    """char_ngrams body for use INSIDE a lambda (the lambda variable is
    already bound — _bind would add a pointless nested transform)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(s, i, n)))


def _bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` once and hand it to ``fn`` as a BOUND lambda
    variable.  Referencing a computed array expression inside a
    higher-order-function lambda re-evaluates the whole expression once
    per element (HOF lambdas are opaque to Catalyst CSE) — quadratic
    per-row blowup; routing it through a 1-element array transform
    turns it into a lambda variable, evaluated once and referenced
    cheaply."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def _check_hash_family(hash_family: str) -> None:
    """Every md5/xxhash64 fork validates here: a typo'd family silently
    falling through to xxhash64 would make an oracle cross-check (or an
    against-gate over corpora hashed under the 'other' spelling) report
    spurious mismatches instead of an error."""
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(
            f"unknown hash_family {hash_family!r}: "
            "expected 'xxhash64' or 'md5'"
        )


def bucketed_token_hash(
    tok: Column, *, buckets: int, hash_family: str = "xxhash64"
) -> Column:
    """Token → [0, buckets) feature slot — the shared hashing-trick
    expression behind the hashed bag-of-words operators (DSIR weights,
    the logistic-regression classifier).  ``hash_family="md5"`` (first
    8 md5 hex chars → int) is DuckDB-replicable:
    ``CAST(concat('0x', substr(md5(tok),1,8)) AS BIGINT) % buckets``;
    the default xxhash64 stays the production flavor."""
    _check_hash_family(hash_family)
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if hash_family == "md5":
        h = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")
    else:
        h = F.xxhash64(tok)
    return F.pmod(h, F.lit(buckets))


def rolling_hashes(
    col: Column, window: int = 8, *, hash_family: str = "xxhash64"
) -> Column:
    """Winnowing-style rolling token-window hashes: one 64-bit hash
    over each consecutive ``window``-token span, used by near-dup
    candidate generation.  ``hash_family="md5"`` (first 16 md5 hex
    chars, compared lexicographically) is DuckDB-replicable, making
    downstream winnowing operators exact-oracle-checkable; the default
    xxhash64 stays the production flavor.  The token array is bound
    once (:func:`_bind`) — inlining it into the per-position lambda
    would re-split the text once per position."""
    _check_hash_family(hash_family)
    if hash_family == "md5":
        def _span_hash(c: Column) -> Column:
            return F.substring(F.md5(c), 1, 16)
    else:
        def _span_hash(c: Column) -> Column:
            return F.xxhash64(c)

    def _roll(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
        return F.transform(
            idx,
            lambda i: _span_hash(F.concat_ws(" ", F.slice(toks, i + 1, window))),
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
    # '' pseudo-tokens (empty/whitespace text) would otherwise emit a
    # bogus term='' row and pollute the document-frequency table
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                tokens(F.lower(F.col(text_col))), lambda w: w != F.lit("")
            )
        ).alias("term"),
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
    col: Column,
    *,
    shingle: int = 8,
    window: int = 4,
    hash_family: str = "xxhash64",
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

    return _bind(
        rolling_hashes(col, window=shingle, hash_family=hash_family),
        _winnow,
    )


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


def pmi_bigrams(
    df: DataFrame, *, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """Corpus-level PMI collocation extraction: pointwise mutual
    information of consecutive token bigrams,
    ``pmi = ln((c_ab/M) / ((c_a/N)(c_b/N)))`` computed as ONE ln over
    an exact-count ratio (cross-engine float drift stays inside the
    4-decimal round — the same integer-moments discipline as
    ``corr_stats``).

    Plan (100 TB shape): one tokenize feeds two map-side-combined
    aggregates (vocab-keyed unigram counts, pair-keyed bigram counts);
    the bigram frame joins the vocab frame twice on its token keys
    (both corpus-bounded, hash join), and the two 1-row totals
    broadcast on.  ``min_count`` prunes the pair frame BEFORE the
    joins.  No windows, no driver loops.

    Output: (w1, w2, n_pair, pmi), pairs with ``n_pair >= min_count``.
    """
    tks = F.filter(
        tokens(F.lower(F.col(text_col))), lambda w: w != F.lit("")
    )
    base = spread(df).select(tks.alias("_tk"))
    uni = (
        base.select(F.explode("_tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    pairs = (
        base.select(
            F.explode(
                F.filter(
                    F.zip_with(
                        F.col("_tk"),
                        F.slice(
                            F.col("_tk"),
                            2,
                            F.greatest(F.size("_tk") - 1, F.lit(0)),
                        ),
                        lambda a, b: F.struct(
                            a.alias("w1"), b.alias("w2")
                        ),
                    ),
                    lambda s: s["w2"].isNotNull(),
                )
            ).alias("_p")
        )
        .groupBy(
            F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    tot = uni.agg(F.sum("c_w").alias("n_tok")).crossJoin(
        pairs.agg(F.sum("n_pair").alias("n_big"))
    )
    a = uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a"))
    b = uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b"))
    return (
        pairs.filter(F.col("n_pair") >= min_count)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_pair",
            # + 0.0 folds IEEE negative zero to +0.0 — a pair with
            # pmi exactly 0 otherwise renders '-0.0' on one engine
            (
                F.round(
                    F.log(
                        (
                            F.col("n_pair").cast("double")
                            * F.col("n_tok")
                            * F.col("n_tok")
                        )
                        / (
                            F.col("n_big").cast("double")
                            * F.col("c_a")
                            * F.col("c_b")
                        )
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_bits: int = 5,
    min_tokens: int = 8,
    max_tokens: int = 64,
    boundary: str = "xxhash64",
) -> DataFrame:
    """Content-defined chunking (the rolling-hash/Rabin boundary idea
    from dedup storage systems, applied to token streams): a token
    opens a new chunk when its content hash lands in the boundary
    class (``xxhash64(token) % 2^mask_bits == 0``), subject to
    ``min_tokens``/``max_tokens`` bounds.

    ``boundary="md5"`` selects the class by the first ``mask_bits/4``
    hex chars of ``md5(token)`` being zero — the SAME boundary rate
    (2^-mask_bits) with a hash every engine renders identically, so an
    external oracle (DuckDB ``md5``) can reproduce chunk boundaries
    exactly; ``mask_bits`` must be a multiple of 4.  Chunking quality
    is equivalent (both are uniform content-hash classes).  Because boundaries depend
    only on LOCAL token content, an insertion near the start of a
    document shifts only the chunks up to the next surviving boundary
    — after that the chunk stream re-synchronizes, which fixed-width
    segmenting (``dedup_segments``) can never do.

    Pure Catalyst per-row pipeline: tokenize once, per-token boundary
    flags, ONE O(n) ``aggregate`` fold collecting chunk-start
    positions (the min/max constraints are sequential state — exactly
    what the fold expresses), then an index-aware ``transform`` slices
    the chunks out.  Every intermediate array is routed through
    ``_bind`` — inlined, the flag array would re-hash every token once
    per fold step (the HOF-CSE quadratic trap).  No shuffle at all:
    the operator is embarrassingly per-document.

    Docs with no tokens yield no rows.  Every chunk except a doc's
    last has ``min_tokens <= n_tokens <= max_tokens``.

    Output: (id_col, chunk_idx, chunk_text, n_tokens).
    """
    if min_tokens < 1 or max_tokens < min_tokens:
        raise ValueError("need 1 <= min_tokens <= max_tokens")
    if boundary == "xxhash64":
        def _flag(w: Column) -> Column:
            return F.pmod(F.xxhash64(w), F.lit(1 << mask_bits)) == F.lit(0)
    elif boundary == "md5":
        if mask_bits % 4:
            raise ValueError(
                "boundary='md5' selects by hex-nibble prefix: mask_bits "
                f"must be a multiple of 4, got {mask_bits}"
            )
        _nibbles = mask_bits // 4
        def _flag(w: Column) -> Column:
            return F.substring(
                F.md5(F.encode(w, "UTF-8")), 1, _nibbles
            ) == F.lit("0" * _nibbles)
    else:
        raise ValueError(f"unknown boundary hash {boundary!r}")
    struct_t = "array<struct<chunk_idx:int,chunk_text:string,n_tokens:int>>"
    tks_expr = F.filter(tokens(F.col(text_col)), lambda w: w != F.lit(""))

    def _chunks(tks: Column) -> Column:
        n = F.size(tks)
        flags = F.transform(tks, _flag)

        def _with_flags(fl: Column) -> Column:
            starts = F.aggregate(
                F.sequence(F.lit(1), n - 1),
                F.array(F.lit(0)),
                lambda acc, i: F.when(
                    (i - F.element_at(acc, -1) >= F.lit(max_tokens))
                    | (
                        F.element_at(fl, i + 1)
                        & (
                            i - F.element_at(acc, -1)
                            >= F.lit(min_tokens)
                        )
                    ),
                    F.concat(acc, F.array(i)),
                ).otherwise(acc),
            )

            def _emit(st: Column) -> Column:
                end_of = lambda j: F.coalesce(F.get(st, j + 1), n)  # noqa: E731
                return F.transform(
                    st,
                    lambda s, j: F.struct(
                        j.cast("int").alias("chunk_idx"),
                        F.array_join(
                            F.slice(tks, s + 1, end_of(j) - s), " "
                        ).alias("chunk_text"),
                        (end_of(j) - s).cast("int").alias("n_tokens"),
                    ),
                )

            return _bind(starts, _emit)

        return (
            F.when(n >= 2, _bind(flags, _with_flags))
            .when(
                n == 1,
                F.array(
                    F.struct(
                        F.lit(0).alias("chunk_idx"),
                        F.array_join(tks, " ").alias("chunk_text"),
                        F.lit(1).alias("n_tokens"),
                    )
                ),
            )
            .otherwise(F.array().cast(struct_t))
        )

    return (
        spread(df)
        .select(F.col(id_col), _bind(tks_expr, _chunks).alias("_cs"))
        .select(id_col, F.explode("_cs").alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_idx").alias("chunk_idx"),
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.n_tokens").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# HTML / markup text extraction
# ---------------------------------------------------------------------------
# The first step of every real web-crawl pipeline: strip markup, decode
# entities, and keep block boundaries so the result feeds directly into
# block-level dedup (cdc_chunks / remove_dup_spans operate on the
# extracted text).  Pure Catalyst regexp chains + higher-order array
# functions — no Python in the row path, per-row/narrow, scales linearly.
# Every regex is RE2/Java-identical so the DuckDB oracle reproduces the
# chain byte-for-byte (see plans.registry q_html_extract).
#
# Scope (documented, deterministic): tags are recognized lexically (no
# DOM); <script>/<style>/<noscript>/<template>/<head> drop with their
# content; block-level tags become newlines; all other tags are
# stripped; entities decoded are the common named set, decimal numeric
# entities in the printable-ASCII range 32..126 (the only range where
# Spark's chr() and DuckDB's chr() agree byte-for-byte — Spark is
# mod-256 ASCII, DuckDB is Unicode), and the common typographic
# codepoints mapped to ASCII equivalents.  Everything else is left
# intact rather than guessed at.

# Tags whose content is invisible text — dropped wholesale.
_HTML_DROP_CONTENT = ("script", "style", "noscript", "template", "head")
# Tags that terminate a text block — open OR close becomes '\n'.
_HTML_BLOCK_TAGS = (
    "p|div|br|hr|li|ul|ol|dl|dt|dd|h[1-6]|tr|td|th|table|thead|tbody|"
    "blockquote|pre|section|article|header|footer|nav|aside|main|form|"
    "figure|figcaption|option|select|fieldset|legend|address|summary|details"
)
# Typographic codepoints folded to ASCII before the generic numeric
# decode (their chr() differs between engines, so they get a fixed map).
_HTML_TYPOGRAPHIC = [
    ("8211", "-"), ("8212", "-"),
    ("8216", "'"), ("8217", "'"),
    ("8220", '"'), ("8221", '"'),
    ("8230", "..."), ("160", " "),
]
# Named entities, decoded after numerics; amp LAST so "&amp;lt;" yields
# the literal "&lt;" (single-decode semantics).
_HTML_NAMED = [
    ("nbsp", " "), ("lt", "<"), ("gt", ">"), ("quot", '"'),
    ("apos", "'"), ("ndash", "-"), ("mdash", "-"), ("hellip", "..."),
    ("lsquo", "'"), ("rsquo", "'"), ("ldquo", '"'), ("rdquo", '"'),
    ("copy", "(c)"), ("reg", "(r)"), ("trade", "(tm)"), ("amp", "&"),
]
# Decimal numeric entities we decode generically: codes 32..126, the
# range where both engines' chr() agree — EXCEPT 38 ('&'), which must
# decode LAST like &amp; ('&#38;lt;' means the literal '&lt;', and an
# early decode would re-trigger the named pass and double-decode).
# The alternation IS the range check, so the decode lambda needs no
# conditional restore path.
_HTML_NUM_RE = r"&#(3[2-7]|39|[4-9][0-9]|1[01][0-9]|12[0-6]);"
# Hex numeric entities, same range/rules (0x20..0x7E minus 0x26 '&'),
# two hex digits either case.
_HTML_HEX_RE = r"&#[xX](2[0-57-9a-fA-F]|[3-6][0-9a-fA-F]|7[0-9a-eA-E]);"
# Sentinels: control chars stripped from input in step 1, so they are
# collision-free markers for the numeric-entity split/decode; _S3
# stands in for a '&#38;'/'&#x26;' marked BEFORE the named pass and
# resolved to '&' after it (the numeric half of amp-decodes-last).
_S1, _S2, _S3 = "\x01", "\x02", "\x03"


def _html_pre_clean(col: Column) -> Column:
    """Steps shared by every HTML op: strip control chars (frees the
    sentinels), fold source newlines/tabs to spaces (in HTML they are
    inter-word whitespace — only block TAGS delimit blocks, and the
    '\\n' those become is inserted downstream, after this fold), drop
    comments and invisible-content elements."""
    c = F.regexp_replace(col, "[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    c = F.regexp_replace(c, "[\r\n\t]+", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    for tag in _HTML_DROP_CONTENT:
        c = F.regexp_replace(c, rf"(?is)<{tag}\b.*?</{tag}\s*>", " ")
    return c


def _html_block_breaks(col: Column) -> Column:
    """Open/close block-level tags -> newline (block boundary)."""
    return F.regexp_replace(
        col, rf"(?i)</?(?:{_HTML_BLOCK_TAGS})\b[^>]*>", "\n"
    )


# '<' opens a tag only when followed by a letter, '/', '!' or '?' —
# the HTML5 tokenizer rule.  "3 < 5 and x > 1" is text, not markup.
_HTML_TAG_RE = r"(?s)<[/!?a-zA-Z][^>]*>"


def _html_strip_tags(col: Column) -> Column:
    """Remaining (inline) tags -> space.  A lone '<' that never closes,
    or one not opening a tag per _HTML_TAG_RE, stays literal text
    rather than eating the document."""
    return F.regexp_replace(col, _HTML_TAG_RE, " ")


def decode_html_entities(col: Column) -> Column:
    """Decode typographic + numeric-ASCII (decimal and hex) + named
    entities.
    Numeric decode: mark '&#NN;' with sentinel-wrapped code, split on
    the sentinel, chr() each marked head — pure HOF, no Python.  The
    two ampersand spellings ('&amp;' and '&#38;') decode LAST so an
    escaped entity ('&amp;lt;', '&#38;lt;') yields the literal '&lt;'
    — single-decode semantics.  Raw \\x01/\\x02 bytes in the input are
    stripped first (they are the decode's internal sentinels; the
    html_* entry points already remove all control chars)."""
    c = F.regexp_replace(col, f"[{_S1}{_S2}{_S3}]", "")
    for code, repl in _HTML_TYPOGRAPHIC:
        c = F.regexp_replace(c, rf"&#{code};", repl.replace("$", r"\$"))
    # Mark BOTH numeric spellings against the SAME (original) text
    # before decoding anything — decoding decimal first and re-scanning
    # would let decoded characters assemble a fresh hex entity (e.g.
    # '&&#35;x41;' -> '&#x41;' -> 'A'), a double decode.  Marking only
    # inserts sentinels+digits, which neither numeric pattern can
    # re-match, so the two marking passes commute.  Hex heads carry an
    # 'x' tag so the single decode pass can tell '41' (decimal) from
    # 'x41' (hex).
    c = F.regexp_replace(c, _HTML_NUM_RE, f"{_S1}$1{_S2}")
    c = F.regexp_replace(c, _HTML_HEX_RE, f"{_S1}x$1{_S2}")
    # the ampersand spellings mark HERE (against the same original
    # text) but resolve only after the named pass — resolving them in
    # a trailing regexp_replace instead would re-scan text the named
    # pass already decoded ('&amp;#38;' -> '&' + '#38;' -> '&', a
    # double decode)
    c = F.regexp_replace(c, r"&#38;|&#[xX]26;", _S3)
    parts = F.split(c, _S1, -1)
    dec = F.transform(
        parts,
        lambda p: F.when(
            p.rlike(f"^[0-9]{{2,3}}{_S2}"),
            F.concat(
                F.char(F.regexp_extract(p, f"^([0-9]+){_S2}", 1).cast("int")),
                F.regexp_replace(p, f"^[0-9]+{_S2}", ""),
            ),
        )
        .when(
            p.rlike(f"^x[0-9a-fA-F]{{2}}{_S2}"),
            F.concat(
                F.char(
                    F.conv(
                        F.regexp_extract(p, f"^x([0-9a-fA-F]+){_S2}", 1),
                        16,
                        10,
                    ).cast("int")
                ),
                F.regexp_replace(p, f"^x[0-9a-fA-F]+{_S2}", ""),
            ),
        )
        .otherwise(p),
    )
    c = F.array_join(dec, "")
    for name, repl in _HTML_NAMED:
        c = F.regexp_replace(c, rf"&{name};", repl.replace("$", r"\$"))
    return F.regexp_replace(c, _S3, "&")


def _html_ws_normalize(col: Column) -> Column:
    """Collapse intra-block whitespace (including raw U+00A0 — a
    non-breaking space renders as whitespace), trim block edges, drop
    empty blocks, trim the document."""
    c = F.regexp_replace(col, "[ \\t\\r\\u00a0]+", " ")
    c = F.regexp_replace(c, " ?\n ?", "\n")
    c = F.regexp_replace(c, "\n+", "\n")
    return F.regexp_replace(F.trim(c), "^\n+|\n+$", "")


def html_extract(col: Column) -> Column:
    """Extracted text of an HTML document: one line per block, entities
    decoded, whitespace collapsed.  Feed to html_blocks / cdc_chunks
    for block-level dedup."""
    c = _html_pre_clean(col)
    c = _html_block_breaks(c)
    c = _html_strip_tags(c)
    c = decode_html_entities(c)
    return _html_ws_normalize(c)


def html_blocks(col: Column) -> Column:
    """array<string> of non-empty extracted blocks — the block-dedup
    unit (hash each element, groupBy digest)."""
    return F.filter(F.split(html_extract(col), "\n", -1), lambda b: b != "")


def html_main_content(
    col: Column,
    *,
    min_text_chars: int = 15,
    max_link_density: float = 0.5,
) -> Column:
    """Boilerplate-stripped main content: blocks are scored while the
    inline markup is still present — link density = chars of <a>…</a>
    anchor text / chars of block text (both tag-stripped, pre-entity
    -decode) — and a block survives iff it has >= min_text_chars of
    text and link density <= max_link_density.  Nav bars, footers and
    link farms (short, link-dense blocks) drop; survivors then get the
    normal strip/decode/normalize chain.  Lengths are measured before
    entity decode ('&amp;' counts 5 chars) — deterministic and cheap;
    the bias is identical in numerator and denominator."""

    def _txt_len(b: Column) -> Column:
        return F.length(F.trim(F.regexp_replace(
            F.regexp_replace(b, _HTML_TAG_RE, " "), r"\s+", " ")))

    def _keep(b: Column) -> Column:
        anchors = F.regexp_extract_all(
            b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), 1
        )
        link_chars = F.aggregate(
            anchors, F.lit(0), lambda acc, a: acc + _txt_len(a)
        )
        n = _txt_len(b)
        return (n >= F.lit(min_text_chars)) & (
            link_chars.cast("double")
            <= F.lit(float(max_link_density)) * n.cast("double")
        )

    c = _html_pre_clean(col)
    c = _html_block_breaks(c)
    kept = F.filter(F.split(c, "\n", -1), _keep)
    c = F.array_join(kept, "\n")
    c = _html_strip_tags(c)
    c = decode_html_entities(c)
    return _html_ws_normalize(c)


# a href attribute on an <a> tag, in any of the three HTML value
# forms: double-quoted, single-quoted, unquoted (runs to whitespace or
# '>').  '<a\b' keeps '<abbr>' out; '[^>]*?\shref' requires whitespace
# before the attribute name so 'data-href=' never matches.
_HTML_HREF_RE = (
    r"(?is)<a\b[^>]*?\shref\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)"
)


def html_links(col: Column) -> Column:
    """``array<string>`` of href values from the document's ``<a>``
    tags, in document order: quotes stripped, attribute-level HTML
    entities decoded (``&amp;`` in query strings is the normal way an
    href embeds ``&``), surrounding whitespace trimmed, empty values
    dropped.  The link-discovery half of the crawl frontier — feed
    through `operators/urls.py:resolve_url` against the page URL, then
    the blocklist/unseen/cap gates (`q_link_frontier`).

    Values stay RAW relative references (no resolution here): one
    operator per concern, and the entity decode must happen before
    resolution (an encoded ``&amp;`` is part of the query, not a new
    parameter boundary).  Pure Catalyst: one regexp_extract_all + a
    per-element decode transform — no UDF, no shuffle."""
    raw = F.regexp_extract_all(col, F.lit(_HTML_HREF_RE), 1)
    return F.filter(
        F.transform(raw, _clean_attr_value), lambda h: h != ""
    )


def _unquote_attr(raw: Column) -> Column:
    """Strip one layer of surrounding quotes from a raw attribute
    capture (``"..."`` / ``'...'`` / bare) — the ONE unquote idiom
    every HTML attribute consumer in this module shares (duplicated,
    the link operators could silently drift)."""
    return F.when(
        raw.rlike("^\"") | raw.rlike("^'"),
        F.substring(raw, 2, F.length(raw) - 2),
    ).otherwise(raw)


def _clean_attr_value(raw: Column) -> Column:
    """Shared attribute-value cleaning: unquote, entity-decode, trim —
    the html_links contract."""
    return F.trim(decode_html_entities(_unquote_attr(raw)))


# Quote-aware <a> tag capture: a quoted attribute value may contain
# '>' (the tag ends at the first '>' OUTSIDE quotes), and the closing
# quote is optional so a document truncated mid-anchor keeps its
# dangling anchor.  The quoted alternatives are POSSESSIVE (Java
# regex): each quoted run is consumed atomically, so backtracking can
# never strand a position in the middle of a value — that atomicity
# is what makes the rel extraction below quote-safe.
_A_TAG_QUOTED = "\"[^\"]*+\"?+|'[^']*+'?+"
_A_TAG_RE = rf"(?is)(<a\b(?:{_A_TAG_QUOTED}|[^>\"'])*+(?:>|$))"

# rel attribute extraction within ONE <a> tag, anchored at the tag
# start with the same quote-atomic walk: ' rel=' can only match at an
# attribute boundary, never inside a quoted value (an href like
# "/s?q=a rel=nofollow" must NOT read as a rel attribute).  Applied to
# the VALUE, the nofollow test is token-bounded — 'nofollower' or a
# 'rel=nofollow' substring inside an href query string must NOT drop
# the anchor.  Residual divergence from html_links, documented: on
# MISMATCHED-quote tags (a bare quote inside an unquoted value) the
# two walks can group the tag differently — well-formed and truncated
# HTML agree exactly.
_REL_ATTR_IN_TAG_RE = (
    rf"(?is)^<a\b(?:{_A_TAG_QUOTED}|[^>\"'])*?"
    r"\srel\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)"
)
_NOFOLLOW_TOKEN_RE = r"(?i)(^|\s)nofollow(\s|$)"


def html_followable_links(col: Column) -> Column:
    """``array<string>`` of href values from the document's FOLLOWABLE
    ``<a>`` tags: exactly :func:`html_links` minus anchors whose
    ``rel`` attribute carries the ``nofollow`` TOKEN (space-separated
    token list semantics: ``rel="external nofollow"`` drops,
    ``rel="nofollower"`` or an href merely CONTAINING the text
    ``rel=nofollow`` does not) — the per-LINK half of on-page robots
    (the page-level half is `robots_directive_flags`); a page asks
    crawlers not to treat such links as endorsements, and a polite
    frontier drops them.  Same cleaning contract as html_links (quote
    strip, entity decode, trim, empties drop), same document order;
    a document truncated mid-anchor keeps its final href like
    html_links does (the tag match tolerates a missing ``>`` and an
    unterminated quote).  The tag capture is QUOTE-AWARE (r15, the
    r14 advice): a quoted attribute value may contain ``>`` without
    truncating the tag, and a ``rel=nofollow``-shaped sequence INSIDE
    a quoted value (``href="/s?q=a rel=nofollow"``) never reads as a
    rel attribute — the rel walk consumes quoted runs atomically.
    Pure Catalyst: one tag-level regexp_extract_all, a per-tag
    rel-value extract + token test, then the href extract."""
    tags = F.regexp_extract_all(col, F.lit(_A_TAG_RE), 1)

    def _followable(t: Column) -> Column:
        rel = _unquote_attr(
            F.regexp_extract(t, _REL_ATTR_IN_TAG_RE, 1)
        )
        return ~rel.rlike(_NOFOLLOW_TOKEN_RE)

    kept = F.filter(tags, _followable)

    def _href(tag: Column) -> Column:
        # html_links' OWN regex applied per-tag (anchored): the lazy
        # [^>]*? walk stops at an in-quote '>' exactly like the
        # document-level scan, so an href AFTER such an attribute is
        # dropped by both — "exactly html_links minus nofollow" holds
        # even on that quirk.
        return _clean_attr_value(
            F.regexp_extract(
                tag,
                r"(?is)^<a\b[^>]*?\shref\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)",
                1,
            )
        )

    return F.filter(F.transform(kept, _href), lambda h: h != "")


def html_canonical(col: Column) -> Column:
    """The document's declared canonical URL: the href of the FIRST
    ``<link rel="canonical" ...>`` element (either attribute order,
    any quote form, entity-decoded, trimmed); NULL when the document
    declares none.  ``rel`` must be exactly the token ``canonical``
    (the overwhelmingly dominant real-world form; multi-token rel
    lists are out of scope).  The value may be relative — resolve it
    against the page URL (`operators/urls.py:resolve_url`) before
    using it, the same rule ``<base href>`` follows.

    rel=canonical is the ON-PAGE twin of an HTTP redirect alias: two
    URLs serving one document declare one identity, so a dedup/frontier
    layer can collapse them BEFORE content hashing — the alias channel
    `sources/crawl.py:redirect_edges` provides for 3xx responses.
    Pure Catalyst (two regexp passes: first-matching tag, then its
    href) — a narrow projection, no UDF, no shuffle."""
    tag = F.regexp_extract(
        col,
        r"(?is)<link\b[^>]*?\brel\s*=\s*([\"']?)canonical\1(?=[\s/>])"
        r"[^>]*>",
        0,
    )
    raw = F.regexp_extract(
        tag,
        r"(?is)\shref\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)",
        1,
    )
    val = _clean_attr_value(raw)
    return F.when(val != "", val)


def html_base_href(col: Column) -> Column:
    """The document's effective ``<base href>`` value: the FIRST
    ``<base>`` element carrying an href (the HTML5 rule — later base
    elements are ignored), quote-stripped, entity-decoded, trimmed;
    NULL when the document declares none.  Per the HTML spec the value
    may itself be relative — resolve it against the page URL
    (`operators/urls.py:resolve_url`) before using it as the base for
    the page's links, which is exactly what the ingest frontier does
    (`streaming/ingest.py:_discover_frontier`)."""
    raw = F.regexp_extract(
        col,
        r"(?is)<base\b[^>]*?\shref\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)",
        1,
    )
    val = _clean_attr_value(raw)
    return F.when(val != "", val)


def meta_robots(col: Column) -> Column:
    """``array<string>`` of lowercased directive tokens from every
    ``<meta name="robots" content="...">`` element in the document
    (either attribute order, any quote form; multiple elements
    combine — the restrictive union, matching how crawlers treat
    conflicting tags).  Tokens are the comma-split, trimmed values:
    ``noindex``, ``nofollow``, ``none``, ``noarchive``, …  Empty array
    when the page declares nothing.  Pure Catalyst: one
    regexp_extract_all over the robots meta tags, a content-extract +
    split transform, flatten, distinct."""
    tags = F.regexp_extract_all(
        col,
        F.lit(
            r"(?is)(<meta\b[^>]*?\bname\s*=\s*([\"']?)robots\2"
            r"(?=[\s/>])[^>]*>)"
        ),
        1,
    )

    def _content(tag: Column) -> Column:
        raw = F.regexp_extract(
            tag,
            r"(?is)\bcontent\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)",
            1,
        )
        return F.split(F.lower(_unquote_attr(raw)), ",")

    toks = F.flatten(F.transform(tags, _content))
    # NB: F.trim must not be passed to transform directly — its
    # optional second parameter would receive the element index
    return F.array_distinct(
        F.filter(
            F.transform(toks, lambda t: F.trim(t)), lambda t: t != ""
        )
    )


def robots_directive_flags(
    html_col: Column, header_col: Column | None = None
) -> Column:
    """``struct(noindex boolean, nofollow boolean)`` — the on-page
    robots decision, folding ``<meta name="robots">`` tokens
    (:func:`meta_robots`) with the ``X-Robots-Tag`` HTTP header (the
    raw comma-separated value `sources/crawl.py:warc_responses`
    surfaces).  ``none`` implies both.  Restrictive union across both
    channels: a page is noindex/nofollow if ANY channel says so —
    there is no precedence between them, unlike charset sniffing.
    Agent-scoped header forms (``X-Robots-Tag: googlebot: noindex``)
    are treated as global — the conservative read for a corpus
    builder.  Pure Catalyst."""
    toks = meta_robots(html_col)
    if header_col is not None:
        hdr = F.split(F.lower(F.coalesce(header_col, F.lit(""))), "[,:]")
        toks = F.concat(
            toks,
            F.filter(
                F.transform(hdr, lambda t: F.trim(t)),
                lambda t: t != "",
            ),
        )
    has = lambda v: F.array_contains(toks, v)  # noqa: E731
    return F.struct(
        (has("noindex") | has("none")).alias("noindex"),
        (has("nofollow") | has("none")).alias("nofollow"),
    )
