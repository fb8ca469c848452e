"""Unigram-LM tokenizer trainer vs an independent pure-Python
reference (same algorithm, no shared code with the operator's
distributed path beyond the per-word E-step scalar math contract)."""

import math

import pytest
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import unigram

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cats chased the rats"),
    (3, "a cat and a rat sat"),
    (4, "the rat sat on the cat mat"),
    (5, "cats and rats and bats"),
]


def _ref_word_counts(rows):
    wc = {}
    for _, text in rows:
        for w in text.strip().lower().split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def _ref_seed(wc, max_piece_len, seed_size):
    weights = {}
    for w, n in wc.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_piece_len) + 1):
                p = w[i:j]
                weights[p] = weights.get(p, 0) + n
    chars = {p: w for p, w in weights.items() if len(p) == 1}
    multi = sorted(
        ((p, w) for p, w in weights.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    seed = dict(chars)
    seed.update(dict(multi))
    z = sum(seed.values())
    return {p: w / z for p, w in seed.items()}


def _ref_em(wc, probs):
    counts = unigram._expected_counts(wc.items(), probs)
    z = sum(counts.values())
    if z <= 0:
        return probs
    return {p: c / z for p, c in counts.items()}


def _ref_train(rows, *, vocab_size, seed_size, max_piece_len, n_iter):
    wc = _ref_word_counts(rows)
    probs = _ref_seed(wc, max_piece_len, seed_size)
    for _ in range(n_iter):
        probs = _ref_em(wc, probs)
    chars = {p for p in probs if len(p) == 1}
    multi = sorted(
        ((p, w) for p, w in probs.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, vocab_size - len(chars))]
    kept = chars | {p for p, _ in multi}
    probs = {p: w for p, w in probs.items() if p in kept}
    z = sum(probs.values())
    probs = {p: w / z for p, w in probs.items()}
    return _ref_em(wc, probs)


PARAMS = dict(vocab_size=24, seed_size=64, max_piece_len=5, n_iter=3)


def test_unigram_train_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["piece"]: r["prob"]
        for r in unigram.unigram_train(df, **PARAMS).collect()
    }
    want = _ref_train(CORPUS, **PARAMS)
    assert set(got) == set(want)
    for p, w in want.items():
        assert got[p] == pytest.approx(w, rel=1e-9), p
    # multi-char pieces actually learned (non-vacuous)
    assert any(len(p) >= 2 for p in got)
    # a frequent whole word should be a high-probability piece
    assert "the" in got or "cat" in got


def test_unigram_encode_viterbi_and_unknown_chars(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    vocab = unigram.unigram_train(df, **PARAMS)
    probs = {r["piece"]: r["prob"] for r in vocab.collect()}
    logp = {p: math.log(w) for p, w in probs.items()}
    ml = max(len(p) for p in logp)

    enc = {
        r["doc_id"]: r["pieces"]
        for r in unigram.unigram_encode(df, vocab).collect()
    }
    for doc_id, text in CORPUS:
        want = []
        for w in text.lower().split():
            want.extend(unigram._viterbi(w, logp, ml))
        assert enc[doc_id] == want, doc_id
        assert "".join(enc[doc_id]) == text.lower().replace(" ", "")

    # unknown characters fall back to single-char floor pieces
    odd = spark.createDataFrame([(9, "cat zq")], "doc_id long, text string")
    out = unigram.unigram_encode(odd, vocab).collect()[0]["pieces"]
    assert "".join(out) == "catzq"


def test_unigram_train_validates_params(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    with pytest.raises(ValueError, match="unigram_train"):
        unigram.unigram_train(df, vocab_size=0)


def test_unigram_train_matches_reference_on_random_corpora(spark):
    """Hypothesis sweep: tiny random corpora, trained vocab equal to
    the independent reference (membership exact, probs at 1e-9)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    word = st.text(alphabet="abcd", min_size=1, max_size=6)
    doc = st.lists(word, min_size=1, max_size=6).map(" ".join)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(doc, min_size=1, max_size=5))
    def inner(docs):
        rows = [(i, t) for i, t in enumerate(docs)]
        params = dict(
            vocab_size=12, seed_size=24, max_piece_len=3, n_iter=2
        )
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["piece"]: r["prob"]
            for r in unigram.unigram_train(df, **params).collect()
        }
        want = _ref_train(rows, **params)
        assert set(got) == set(want)
        for p, w in want.items():
            assert got[p] == pytest.approx(w, rel=1e-9, abs=1e-12), p

    inner()
