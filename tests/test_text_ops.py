"""Text operators vs hand-computed / Python-reference expectations."""

import math

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import text

from tdata import sf_dir

SF_DIR = sf_dir("0.001")


def test_quality_features_python_reference(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox. It jumps!"), (2, "a b c"), (3, "  padded   text  ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.quality_features(df).collect()}

    def ref(s):
        toks = s.strip().split()
        n_chars = len(s)
        punct = sum(1 for ch in s if ch in ".!?,;:")
        sw = sum(1 for w in s.lower().strip().split() if w in text.STOPWORDS)
        return (
            n_chars,
            len(toks),
            round(sum(len(w) for w in toks) / len(toks), 4),
            round(punct / n_chars, 4),
            round(sw / len(toks), 4),
        )

    for doc_id, s in [(1, "The quick brown fox. It jumps!"), (2, "a b c"), (3, "  padded   text  ")]:
        r = out[doc_id]
        exp = ref(s)
        got = (
            r["n_chars_measured"],
            r["n_tokens"],
            r["avg_token_len"],
            r["punct_ratio"],
            r["stopword_ratio"],
        )
        assert got == exp, (doc_id, got, exp)


def test_lang_id_markers_and_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),   # en markers
            (2, "der hund und die katze ist da"),       # de markers
            (3, "le chat et la maison est grande"),     # fr markers
            (4, "xyzzy qwerty plugh"),                  # no markers → tie → 'en'
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang"] for r in df.select("doc_id", text.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "en"  # deterministic preference order on all-zero scores


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "hello worlds")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_rolling_hashes_shape(spark):
    df = spark.createDataFrame([(1, " ".join(f"w{i}" for i in range(20)))], "doc_id long, text string")
    out = df.select(text.rolling_hashes(F.col("text"), window=8).alias("h")).collect()[0]["h"]
    # 20 tokens, window 8 → positions 0..12 → 13 hashes
    assert len(out) == 13
    assert len(set(out)) == 13  # distinct windows hash differently


def test_bpe_ish_tokens_python_reference(spark):
    import re

    from sample_dms_s3_kinesis_spark.operators.text import bpe_ish_token_count

    docs = spark.read.parquet(f"{sf_dir('0.001')}/documents.parquet").limit(200)
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_ish_token_count(F.col("text")).alias("n")
        ).collect()
    }
    pat = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+")
    for r in docs.collect():
        assert got[r["doc_id"]] == len(pat.findall(r["text"]))


def test_approx_count_distinct_within_rsd(spark):
    from sample_dms_s3_kinesis_spark.plans.registry import REGISTRY, t as load

    ev = load(spark, sf_dir("0.001"), "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["q_approx_distinct_users"]
        .fn(spark, sf_dir("0.001"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.1 * n)


def test_repetition_signals_match_python_reference(spark):
    rows = [
        (1, "the cat sat on the mat the cat"),
        (2, "all unique words here now"),
        (3, "go go go go"),
        (4, ""),
        (5, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    grams_df = df.select(
        "doc_id",
        text.dup_token_fraction(F.col("text")).alias("dup"),
        text.word_bigrams(F.col("text")).alias("g"),
    )
    out = {
        r["doc_id"]: (r["dup"], r["top"])
        for r in grams_df.select(
            "doc_id", "dup", text.top_bigram_fraction(F.col("g")).alias("top")
        ).collect()
    }

    for doc_id, s in rows:
        # Spark's split(trim(''), '\s+') yields [''] — mirror that.
        toks = s.strip().lower().split() or [""]
        dup = round(1.0 - len(set(toks)) / len(toks), 6) if len(toks) > 0 else 0.0
        grams = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
        top = (
            round(max(grams.count(x) for x in grams) / len(grams), 6)
            if grams
            else 0.0
        )
        assert out[doc_id] == (dup, top), (doc_id, out[doc_id], (dup, top))


def test_normalize_text_canonicalizes_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,   World! 123"),
            (2, "hello world 999"),
            (3, "HELLO ... world-42"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", text.normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    assert out[1] == "hello world 0"
    assert out[2] == "hello world 0"
    assert out[3] == "hello world 0"


def test_normalize_text_unicode_scripts(spark):
    """The r14 fix for the English-only normalizer: CJK / Cyrillic /
    accented-Latin documents normalize to their own canonical form —
    two distinct CJK docs must NOT collapse into one dup cluster, and
    Unicode digits fold to 0 like ASCII digits."""
    df = spark.createDataFrame(
        [
            (1, "这是一个测试文档，包含中文123。"),
            (2, "这是另一个完全不同的文档！"),
            (3, "Привет, мир! Число 42."),
            (4, "Café au lait — très bien"),
            (5, "النص العربي ٤٢"),  # Arabic text + Arabic-Indic digits
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", text.normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    assert out[1] == "这是一个测试文档 包含中文0"
    assert out[2] == "这是另一个完全不同的文档"
    assert out[1] != out[2] and out[1] != "" and out[2] != ""
    assert out[3] == "привет мир число 0"
    assert out[4] == "café au lait très bien"
    assert out[5] == "النص العربي 0"  # ٤٢ is \p{N} -> folds to 0


def test_normalize_text_nfkc_optin(spark):
    """nfkc=True folds compatibility forms (full-width, ligatures)
    before the Catalyst pipeline; the default path leaves them."""
    df = spark.createDataFrame(
        [(1, "１２３　ＡＢＣ"), (2, "ﬁle ﬂow")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["plain"], r["nfkc"])
        for r in df.select(
            "doc_id",
            text.normalize_text(F.col("text")).alias("plain"),
            text.normalize_text(F.col("text"), nfkc=True).alias("nfkc"),
        ).collect()
    }
    assert out[1][1] == "0 abc"  # full-width digits+letters folded
    assert out[2][1] == "file flow"  # ligatures decomposed
    # default path: ﬁ/ﬂ are \p{L} (category Ll) so they survive as-is
    assert out[2][0] == "ﬁle ﬂow"


def test_char_ngrams_and_segment_tokens(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world"),  # pure ASCII: passthrough
            (2, "日本語のテキスト"),  # space-free: char 3-grams
            (3, "见 hello"),  # short CJK token (<3 chars): itself
            (4, "mixed 中文字符 ascii"),  # mixed
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["cg"], r["seg"])
        for r in df.select(
            "doc_id",
            text.char_ngrams(F.col("text")).alias("cg"),
            text.segment_tokens(F.col("text")).alias("seg"),
        ).collect()
    }
    assert out[1][1] == ["hello", "world"]  # ASCII == whitespace tokens
    s = "日本語のテキスト"
    assert out[2][1] == [s[i : i + 3] for i in range(len(s) - 2)]
    assert out[3][1] == ["见", "hello"]  # short token yields itself
    assert out[4][1] == ["mixed", "中文字", "文字符", "ascii"]
    assert out[1][0] == [
        "hello world"[i : i + 3] for i in range(len("hello world") - 2)
    ]


def test_detect_script_and_lang_id_unicode(spark):
    """Script-first language ID: non-Latin scripts map straight to a
    language (any kana -> ja, even kanji-dominated text); Latin and
    letterless text fall back to the marker heuristic."""
    rows = [
        (1, "The quick brown fox and the dog", "latin", "en"),
        (2, "le chat et la maison est", "latin", "fr"),
        (3, "这是一个测试文档", "han", "zh"),
        (4, "日本語のテキストです", "kana", "ja"),
        (5, "日本国憲法の条文", "han", "ja"),  # kanji-dominant, kana present
        (6, "한국어 텍스트입니다", "hangul", "ko"),
        (7, "Привет мир это тест", "cyrillic", "ru"),
        (8, "النص العربي هنا", "arabic", "ar"),
        (9, "Ελληνικό κείμενο εδώ", "greek", "el"),
        (10, "यह हिंदी पाठ है", "devanagari", "hi"),
        (11, "ข้อความภาษาไทย", "thai", "th"),
        (12, "12345 !!!", "unknown", "en"),  # letterless -> marker tie
        # Latin-dominant text quoting one katakana loanword: the
        # kana->ja rule is gated on a CJK-dominant script, so the
        # marker heuristic still decides
        (13, "the english guide the word ガイド of the page", "latin", "en"),
        (14, None, None, None),  # NULL stays NULL, not 'thai'/'th'
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in rows], "id long, text string"
    )
    got = {
        r["id"]: (r["s"], r["l"])
        for r in df.select(
            "id",
            text.detect_script(F.col("text")).alias("s"),
            text.lang_id_unicode(F.col("text")).alias("l"),
        ).collect()
    }
    for i, _t, s, l in rows:
        assert got[i] == (s, l), (i, got[i], (s, l))


def test_token_ngrams_cjk_shingles_and_minhash(spark):
    """A CJK document (one whitespace token) used to produce ZERO
    shingles -> NULL minhash signature -> invisible to every near-dup
    gate.  The segment_tokens fallback gives it a real shingle set."""
    from sample_dms_s3_kinesis_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "这是一个测试文档包含中文"), (2, "hello world foo bar")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            dedup.token_ngrams(F.col("text")).alias("sh"),
            dedup.minhash_signature(F.col("text"), num_hashes=8).alias("sig"),
        ).collect()
    }
    assert len(rows[1]["sh"]) > 0
    assert rows[1]["sig"] is not None and len(rows[1]["sig"]) == 8
    # ASCII shingling unchanged: plain word 3-grams
    assert rows[2]["sh"] == ["hello world foo", "world foo bar"]


def test_tfidf_topk_matches_python_reference(spark):
    import math
    from collections import Counter

    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana durian"),
        (3, "cherry durian elderberry elderberry elderberry"),
        (4, "apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in text.tfidf_topk(df, k=2).collect()
    }

    docs = {i: s.lower().split() for i, s in rows}
    n = len(docs)
    dfreq = Counter()
    for toks in docs.values():
        dfreq.update(set(toks))
    expected = {}
    for i, toks in docs.items():
        scores = {
            term: round(tf * math.log(n / dfreq[term]), 6)
            for term, tf in Counter(toks).items()
        }
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for term, s in top:
            expected[(i, term)] = s
    assert got == expected


def test_winnowing_shared_substring_guarantee(spark):
    import random

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(500)]
    shared = " ".join(rng.choice(vocab) for _ in range(30))  # >= shingle+window-1 tokens
    doc_a = " ".join(rng.choice(vocab) for _ in range(40)) + " " + shared
    doc_b = shared + " " + " ".join(rng.choice(vocab) for _ in range(40))
    doc_c = " ".join(rng.choice(vocab) for _ in range(60))  # unrelated

    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )
    fps = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id",
            text.winnowed_fingerprints(F.col("text"), shingle=8, window=4).alias("fp"),
        ).collect()
    }
    assert fps[1] & fps[2], "docs sharing a 30-token span must share a fingerprint"
    assert not (fps[1] & fps[3])
    # density: winnowing keeps roughly 2/(window+1) of positions, far
    # fewer than the full shingle set, and never more than positions
    for d, (_i, s) in zip((1, 2, 3), [(1, doc_a), (2, doc_b), (3, doc_c)]):
        n_shingles = len(s.split()) - 8 + 1
        assert 0 < len(fps[d]) <= max(n_shingles - 4 + 1, 0)


def test_functions_package_surface_resolves(spark):
    """The public column library re-exports must all be importable and
    usable in a select."""
    from sample_dms_s3_kinesis_spark import functions as EF

    assert sorted(EF.__all__) == EF.__all__  # keep the surface tidy
    for name in EF.__all__:
        assert callable(getattr(EF, name)), name

    df = spark.createDataFrame([(1, "The quick brown fox")], "doc_id long, text string")
    row = df.select(
        EF.token_count(F.col("text")).alias("n"),
        EF.hash_bucket(F.col("doc_id"), 1).alias("b"),
        EF.fingerprint(F.col("text")).alias("fp"),
    ).first()
    assert row["n"] == 4 and len(row["b"]) == 8 and len(row["fp"]) == 32


def test_quality_score_python_reference(spark):
    from sample_dms_s3_kinesis_spark.operators.text import STOPWORDS, quality_score

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "word word word word word"),
        (3, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4),
        (4, "x"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_score(df, threshold=0.5).collect()}
    for doc_id, s in docs:
        tkl = s.lower().strip().split()
        n = len(tkl)
        len_s = min(n / 64, 1.0)
        stop_s = min(5.0 * sum(1 for x in tkl if x in STOPWORDS) / n, 1.0)
        uniq_s = len(set(tkl)) / n
        score = round(0.4 * len_s + 0.3 * stop_s + 0.3 * uniq_s, 6)
        assert abs(got[doc_id]["quality_score"] - score) <= 1e-9
        assert got[doc_id]["keep"] == int(score >= 0.5)


def test_vocab_topk_python_reference(spark):
    from collections import Counter

    from sample_dms_s3_kinesis_spark.operators.text import vocab_topk

    docs = [
        (1, "the cat and the dog and the bird", "en"),
        (2, "the dog runs and runs", "en"),
        (3, "der hund und der ball und", "de"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = [
        (r["lang"], r["rank"], r["token"], r["n_occurrences"])
        for r in vocab_topk(df, k=3).collect()
    ]
    expected = []
    by_lang = {}
    for _, text, lang in docs:
        by_lang.setdefault(lang, Counter()).update(text.lower().split())
    for lang, counts in by_lang.items():
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for i, (tok, n) in enumerate(ranked, 1):
            expected.append((lang, i, tok, n))
    assert sorted(out) == sorted(expected)


def test_public_function_library_surface(spark):
    """The functions package is the public column-function API; every
    exported name must resolve and the core ones must evaluate."""
    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark import functions as EF

    for name in EF.__all__:
        assert callable(getattr(EF, name)), name

    df = spark.createDataFrame(
        [(1, "The quick brown fox e-mail me at a@b.co 10.0.0.1")],
        "doc_id long, text string",
    )
    row = df.select(
        EF.token_count(F.col("text")).alias("nt"),
        EF.fingerprint(F.col("text")).alias("fp"),
        EF.lang_id(F.col("text")).alias("lang"),
        EF.simhash(F.col("text")).alias("sh"),
        EF.pii_count(F.col("text")).alias("pii"),
        EF.hash_bucket(F.col("doc_id")).alias("hb"),
    ).collect()[0]
    assert row["nt"] == 9
    assert len(row["fp"]) == 32
    assert row["lang"] == "en"
    assert isinstance(row["sh"], int)
    assert row["pii"] >= 2  # email + ipv4
    # hash_bucket yields the first 8 md5 hex nibbles (a string key)
    assert len(row["hb"]) == 8 and int(row["hb"], 16) >= 0


def test_pmi_bigrams_python_reference(spark):
    import math
    from collections import Counter

    docs = [
        (1, "the quick brown fox the quick brown dog"),
        (2, "The Quick brown fox jumps over the dog"),
        (3, "completely different words here now"),
        (4, ""),
        (5, "   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi"])
        for r in text.pmi_bigrams(df, min_count=2).collect()
    }
    uni, big = Counter(), Counter()
    for _, s in docs:
        tk = [w for w in s.lower().split() if w]
        uni.update(tk)
        big.update(zip(tk, tk[1:]))
    n_tok, n_big = sum(uni.values()), sum(big.values())
    exp = {
        (a, b): (
            c,
            round(
                math.log((c * n_tok * n_tok) / (n_big * uni[a] * uni[b])), 4
            )
            + 0.0,
        )
        for (a, b), c in big.items()
        if c >= 2
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) < 1e-9, k


def test_cdc_chunks_invariants(spark):
    """Reconstruction, size bounds, determinism, and the property the
    operator exists for: chunk boundaries re-synchronize after a
    prefix insertion, so the shared suffix produces IDENTICAL
    chunks."""
    body = " ".join(f"w{i % 13}q{i % 7}" for i in range(300))
    shifted = "three extra preamble tokens " + body
    df = spark.createDataFrame(
        [(1, body), (2, shifted), (3, ""), (4, "one")],
        "doc_id long, text string",
    )
    out = text.cdc_chunks(df, mask_bits=3, min_tokens=4, max_tokens=24)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in by_doc:
        by_doc[d].sort(key=lambda r: r["chunk_idx"])

    # reconstruction: chunks concatenate back to the tokenized doc
    assert " ".join(c["chunk_text"] for c in by_doc[1]) == body
    assert " ".join(c["chunk_text"] for c in by_doc[2]) == shifted
    assert 3 not in by_doc                      # empty doc: no rows
    assert [c["chunk_text"] for c in by_doc[4]] == ["one"]

    # bounds: all but the final chunk respect [min, max]
    for d in (1, 2):
        lens = [c["n_tokens"] for c in by_doc[d]]
        assert all(4 <= x <= 24 for x in lens[:-1]), lens
        assert all(
            c["n_tokens"] == len(c["chunk_text"].split()) for c in by_doc[d]
        )

    # shift-resilience: after the insertion point, the chunk STREAMS
    # re-synchronize — the two docs share a long common chunk suffix
    c1 = [c["chunk_text"] for c in by_doc[1]]
    c2 = [c["chunk_text"] for c in by_doc[2]]
    shared_suffix = 0
    while (
        shared_suffix < min(len(c1), len(c2))
        and c1[-1 - shared_suffix] == c2[-1 - shared_suffix]
    ):
        shared_suffix += 1
    assert shared_suffix >= len(c1) // 2, (shared_suffix, len(c1))

    # determinism
    again = text.cdc_chunks(
        df, mask_bits=3, min_tokens=4, max_tokens=24
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        text.cdc_chunks(df, min_tokens=0)
    with _pytest.raises(ValueError):
        text.cdc_chunks(df, min_tokens=8, max_tokens=4)


def test_cdc_chunks_property_random_corpora(spark):
    """Property sweep on random corpora: reconstruction, bounds, and
    per-document locality (a doc's chunks depend only on its own
    text — adding corpus rows never changes them)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.lists(
                st.sampled_from([f"t{i}" for i in range(30)]),
                min_size=0,
                max_size=60,
            ).map(" ".join),
            min_size=1,
            max_size=8,
        )
    )
    def check(texts):
        docs = list(enumerate(texts))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = text.cdc_chunks(
            df, mask_bits=2, min_tokens=3, max_tokens=9
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for d, t_ in docs:
            toks = t_.split()
            toks = [w for w in toks if w]
            cs = sorted(by_doc.get(d, []), key=lambda r: r["chunk_idx"])
            # reconstruction + contiguous chunk indexes
            assert " ".join(c["chunk_text"] for c in cs) == " ".join(toks)
            assert [c["chunk_idx"] for c in cs] == list(range(len(cs)))
            lens = [c["n_tokens"] for c in cs]
            assert all(3 <= x <= 9 for x in lens[:-1]), lens
            assert all(x >= 1 for x in lens)
        # locality: chunking doc 0 alone gives identical chunks
        solo = text.cdc_chunks(
            spark.createDataFrame([docs[0]], "doc_id long, text string"),
            mask_bits=2, min_tokens=3, max_tokens=9,
        ).collect()
        assert sorted(map(tuple, solo)) == sorted(
            tuple(r) for r in by_doc.get(0, [])
        )

    check()


def test_empty_and_whitespace_docs_are_safe(spark):
    """r6 review: empty text used to DIVIDE_BY_ZERO quality_features
    under ANSI, score a 0.30625 freebie in quality_score, and emit a
    bogus '' term from tfidf_topk."""
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    feats = {r["doc_id"]: r for r in text.quality_features(df).collect()}
    assert feats[2]["punct_ratio"] == 0.0
    assert feats[3]["punct_ratio"] == 0.0

    scores = {
        r["doc_id"]: r["quality_score"]
        for r in text.quality_score(df).collect()
    }
    assert scores[2] == 0.0 and scores[3] == 0.0
    assert scores[1] > 0.0

    tfidf = text.tfidf_topk(df, k=3).collect()
    assert all(r["term"] != "" for r in tfidf)
    assert {r["doc_id"] for r in tfidf} == {1}


def test_cdc_chunks_md5_boundary_flavor(spark):
    """boundary='md5' (the DuckDB-replicable hex-nibble class): same
    invariants as the xxhash64 default — reconstruction, bounds,
    shift-resilience — plus the boundary definition itself: every
    non-initial chunk start token hashes into the nibble-prefix class
    or closes a max_tokens run."""
    import hashlib

    body = " ".join(f"t{i % 17}x{i % 5}" for i in range(400))
    shifted = "an inserted preamble " + body
    df = spark.createDataFrame(
        [(1, body), (2, shifted)], "doc_id long, text string"
    )
    out = text.cdc_chunks(
        df, mask_bits=4, min_tokens=4, max_tokens=32, boundary="md5"
    )
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in by_doc:
        by_doc[d].sort(key=lambda r: r["chunk_idx"])
    assert " ".join(c["chunk_text"] for c in by_doc[1]) == body
    lens = [c["n_tokens"] for c in by_doc[1]]
    assert all(4 <= x <= 32 for x in lens[:-1]), lens
    # boundary definition: each chunk start (after the first) either
    # opens with a token whose md5 starts '0' or follows a full-width
    # (max_tokens) chunk
    for prev, cur in zip(by_doc[1], by_doc[1][1:]):
        first_tok = cur["chunk_text"].split()[0]
        in_class = hashlib.md5(
            first_tok.encode()
        ).hexdigest().startswith("0")
        assert in_class or prev["n_tokens"] == 32, (prev, cur)
    # shift-resilience carries over
    c1 = [c["chunk_text"] for c in by_doc[1]]
    c2 = [c["chunk_text"] for c in by_doc[2]]
    shared = 0
    while (
        shared < min(len(c1), len(c2))
        and c1[-1 - shared] == c2[-1 - shared]
    ):
        shared += 1
    assert shared >= len(c1) // 2, (shared, len(c1))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of 4"):
        text.cdc_chunks(df, mask_bits=5, boundary="md5")
    with _pytest.raises(ValueError, match="unknown boundary"):
        text.cdc_chunks(df, boundary="sha9000")


# ---------------------------------------------------------------------------
# HTML / markup extraction
# ---------------------------------------------------------------------------

def _html_one(spark, col_fn, html):
    df = spark.createDataFrame([(1, html)], "id int, html string")
    return df.select(col_fn(F.col("html")).alias("v")).collect()[0]["v"]


def test_html_extract_tags_blocks_entities(spark):
    html = (
        '<html><head><style>p{c:1}</style></head><body>'
        "<h1>Title &amp; more</h1><!-- gone -->"
        "<p>H&#101;llo <b>world</b> &lt;tag&gt; &#8217;q&#8217;</p>"
        "<p>line\nbreak   inside</p>"
        "<script>var x = 1 < 2;</script></body></html>"
    )
    got = _html_one(spark, text.html_extract, html)
    assert got == (
        "Title & more\nHello world <tag> 'q'\nline break inside"
    )


def test_html_extract_single_decode_amp_last(spark):
    # "&amp;lt;" must decode ONCE, to the literal "&lt;" — not to "<".
    got = _html_one(spark, text.html_extract, "<p>&amp;lt; &amp;#65;</p>")
    assert got == "&lt; &#65;"


def test_html_numeric_entity_range_gate(spark):
    # 32..126 decode; 31 and 127 stay literal (outside the range where
    # Spark chr and DuckDB chr agree); hex entities stay literal.
    got = _html_one(
        spark, text.html_extract, "a&#65;b &#31;c &#127;d &#x41;e &#x7e;f"
    )
    assert got == "aAb &#31;c &#127;d Ae ~f"
    # outside 0x20..0x7E (or 0x26) stays literal
    got = _html_one(
        spark, text.html_extract, "&#x1f; &#x7f; &#xfc; &#x26;lt;"
    )
    assert got == "&#x1f; &#x7f; &#xfc; &lt;"


def test_html_numeric_amp_decodes_last(spark):
    # '&#38;' is the numeric spelling of '&amp;' and must follow the
    # same decode-LAST rule: '&#38;lt;' means the literal '&lt;'.
    got = _html_one(
        spark, text.html_extract, "<p>&#38;lt;b&#38;gt; x &#38; y</p>"
    )
    assert got == "&lt;b&gt; x & y"


def test_html_extract_unclosed_tag_and_plain_text(spark):
    assert _html_one(spark, text.html_extract, "3 < 5 and x > 1") == (
        "3 < 5 and x > 1"
    )
    # a '<' that never closes stays literal; the closed tag strips
    assert _html_one(spark, text.html_extract, "a < b <i>c</i>") == "a < b c"


def test_html_blocks_and_empty_input(spark):
    got = _html_one(
        spark, text.html_blocks, "<ul><li>one</li><li></li><li>two</li></ul>"
    )
    assert got == ["one", "two"]
    assert _html_one(spark, text.html_extract, "") == ""
    assert _html_one(spark, text.html_blocks, "") == []


def test_html_main_content_drops_link_farms(spark):
    html = (
        '<div><a href="/">Home</a> <a href="/a">About</a></div>'
        "<p>This paragraph is long enough to keep and has no links.</p>"
        '<p>A sentence with one <a href="/x">link</a> inside stays put.</p>'
        "<p>short</p>"
        '<div class="footer"><a href="/p">Privacy</a> <a href="/t">Terms</a></div>'
    )
    got = _html_one(spark, text.html_main_content, html)
    assert got == (
        "This paragraph is long enough to keep and has no links.\n"
        "A sentence with one link inside stays put."
    )
    # all-boilerplate page -> empty string, not NULL
    nav_only = '<div><a href="/">Home</a> <a href="/a">About</a></div>'
    assert _html_one(spark, text.html_main_content, nav_only) == ""


def test_html_extract_python_reference_on_corpus(spark):
    """Engine chain vs an independent pure-Python reference over real
    corpus text wrapped in markup (entity-encoding every 'e')."""
    import html as _pyhtml
    import re

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text").orderBy("doc_id").limit(40).collect()
    )

    def py_extract(raw: str) -> str:
        c = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", raw)
        c = re.sub(r"[\r\n\t]+", " ", c)
        c = re.sub(r"(?s)<!--.*?-->", " ", c)
        for tag in ("script", "style", "noscript", "template", "head"):
            c = re.sub(rf"(?is)<{tag}\b.*?</{tag}\s*>", " ", c)
        c = re.sub(
            rf"(?i)</?(?:{text._HTML_BLOCK_TAGS})\b[^>]*>", "\n", c
        )
        c = re.sub(r"(?s)<[/!?a-zA-Z][^>]*>", " ", c)
        for code, repl in text._HTML_TYPOGRAPHIC:
            c = c.replace(f"&#{code};", repl)
        c = re.sub(
            r"&#(3[2-7]|39|[4-9][0-9]|1[01][0-9]|12[0-6]);",
            lambda m: "\x01" + m.group(1) + "\x02", c,
        )
        c = re.sub(
            r"&#[xX](2[0-57-9a-fA-F]|[3-6][0-9a-fA-F]|7[0-9a-eA-E]);",
            lambda m: "\x01x" + m.group(1) + "\x02", c,
        )
        c = re.sub(
            r"\x01x([0-9a-fA-F]+)\x02",
            lambda m: chr(int(m.group(1), 16)), c,
        )
        c = re.sub(
            r"\x01([0-9]+)\x02", lambda m: chr(int(m.group(1))), c,
        )
        c = re.sub(r"&#38;|&#[xX]26;", "\x03", c)
        for name, repl in text._HTML_NAMED:
            c = c.replace(f"&{name};", repl)
        c = c.replace("\x03", "&")
        c = re.sub(r"[ \t\r\u00a0]+", " ", c)
        c = re.sub(r" ?\n ?", "\n", c)
        c = re.sub(r"\n+", "\n", c)
        return re.sub(r"^\n+|\n+$", "", c.strip(" "))

    def wrap(doc_id, txt):
        return (
            f"<h1>Doc {doc_id}</h1><p>" + txt.replace("e", "&#101;")
            + "</p><script>x</script>"
        )

    df = spark.createDataFrame(
        [(r["doc_id"], wrap(r["doc_id"], r["text"])) for r in rows],
        "doc_id long, html string",
    )
    got = {
        r["doc_id"]: r["v"]
        for r in df.select(
            "doc_id", text.html_extract(F.col("html")).alias("v")
        ).collect()
    }
    for r in rows:
        expect = py_extract(wrap(r["doc_id"], r["text"]))
        assert got[r["doc_id"]] == expect, r["doc_id"]
        # sanity: the reference decode matches stdlib html.unescape on
        # the ASCII-range numerics it handles
        assert _pyhtml.unescape("&#101;") == "e"


def test_html_lexical_scope_edges(spark):
    """The extractor is a LEXICAL tokenizer (documented scope, no DOM):
    a '>' inside an attribute value ends the tag early, and a
    '</script>' inside a JS string ends the script block early.  These
    pins make the behavior a contract rather than an accident."""
    got = _html_one(
        spark, text.html_extract, '<div title="a>b">text</div>'
    )
    assert got == 'b">text'
    got = _html_one(
        spark,
        text.html_extract,
        "<script>var s = \"</script>\"; more</script><p>body</p>",
    )
    assert got == '"; more\nbody'


def test_html_blocks_feed_block_dedup(spark):
    """The block-dedup composition the operator exists for: two pages
    sharing a boilerplate footer block -> digest groupBy finds exactly
    the shared block."""
    pages = [
        (1, "<p>unique alpha content</p><div>shared footer text</div>"),
        (2, "<p>unique beta content</p><div>shared footer text</div>"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    blocks = df.select(
        "doc_id",
        F.explode(text.html_blocks(F.col("html"))).alias("block"),
    )
    shared = (
        blocks.groupBy(F.md5("block").alias("digest"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("block").alias("block"),
        )
        .filter(F.col("n") > 1)
        .collect()
    )
    assert len(shared) == 1
    assert shared[0]["block"] == "shared footer text"
    assert shared[0]["n"] == 2


def test_html_numeric_passes_cannot_compose(spark):
    """Decoded characters must not assemble a fresh entity for a later
    pass: '&&#35;x41;' (decimal '#' between '&' and 'x41;') stays the
    literal '&#x41;', and '&&#x23;57;' (hex '#') stays '&#57;'."""
    assert _html_one(spark, text.html_extract, "&&#35;x41;") == "&#x41;"
    assert _html_one(spark, text.html_extract, "&&#x23;57;") == "&#57;"


def test_html_extract_seeded_fuzz_vs_python_reference(spark):
    """300 seeded-random adversarial strings — fragment soup of tags,
    half-tags, entities (valid, truncated, out-of-range), sentinel
    bytes, newlines and nested anchors — must match the independent
    Python reference byte-for-byte through the whole chain.  The
    corpus test covers realistic text; this covers the inputs a regexp
    chain actually breaks on."""
    import random
    import re

    rng = random.Random(813)
    frags = [
        "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<hr/>",
        "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
        "<a href='/x'>", "</a>", "<b", ">", "<", "&", ";", "#",
        "&amp;", "&lt;", "&gt;", "&nbsp;", "&#65;", "&#101;", "&#x41;",
        "&#x7e;", "&#38;", "&#x26;", "&#8217;", "&#31;", "&#127;",
        "&#xfc;", "&#", "&#x", "&bogus;", "x", "word", "tail",
        " ", "\n", "\t", "\x01", "\x02", "\u00a0", "0", "7", "a",
        "f", "<i>",
        "</i>", "<SCRIPT>", "</SCRIPT>", "3 < 5", "x > 1",
    ]
    cases = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 30)))
        for _ in range(300)
    ]

    def py_extract(raw: str) -> str:
        c = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", raw)
        c = re.sub(r"[\r\n\t]+", " ", c)
        c = re.sub(r"(?s)<!--.*?-->", " ", c)
        for tag in text._HTML_DROP_CONTENT:
            c = re.sub(rf"(?is)<{tag}\b.*?</{tag}\s*>", " ", c)
        c = re.sub(rf"(?i)</?(?:{text._HTML_BLOCK_TAGS})\b[^>]*>", "\n", c)
        c = re.sub(r"(?s)<[/!?a-zA-Z][^>]*>", " ", c)
        for code, repl in text._HTML_TYPOGRAPHIC:
            c = c.replace(f"&#{code};", repl)
        c = re.sub(
            r"&#(3[2-7]|39|[4-9][0-9]|1[01][0-9]|12[0-6]);",
            lambda m: "\x01" + m.group(1) + "\x02", c,
        )
        c = re.sub(
            r"&#[xX](2[0-57-9a-fA-F]|[3-6][0-9a-fA-F]|7[0-9a-eA-E]);",
            lambda m: "\x01x" + m.group(1) + "\x02", c,
        )
        c = re.sub(
            r"\x01x([0-9a-fA-F]+)\x02",
            lambda m: chr(int(m.group(1), 16)), c,
        )
        c = re.sub(r"\x01([0-9]+)\x02", lambda m: chr(int(m.group(1))), c)
        c = re.sub(r"&#38;|&#[xX]26;", "\x03", c)
        for name, repl in text._HTML_NAMED:
            c = c.replace(f"&{name};", repl)
        c = c.replace("\x03", "&")
        c = re.sub(r"[ \t\r\u00a0]+", " ", c)
        c = re.sub(r" ?\n ?", "\n", c)
        c = re.sub(r"\n+", "\n", c)
        return re.sub(r"^\n+|\n+$", "", c.strip(" "))

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i long, html string"
    )
    got = {
        r["i"]: r["v"]
        for r in df.select(
            "i", text.html_extract(F.col("html")).alias("v")
        ).collect()
    }
    # the python reference strips sentinels at the decode stage only;
    # the engine strips them in decode_html_entities too — mirror that
    # by removing raw sentinel bytes before the reference decode
    def py_full(raw):
        return py_extract(raw.replace("\x01", "").replace("\x02", ""))

    bad = [
        (i, cases[i], got[i], py_full(cases[i]))
        for i in range(len(cases))
        if got[i] != py_full(cases[i])
    ]
    assert not bad, bad[:3]


def test_html_nbsp_and_escaped_numeric_amp(spark):
    """Raw U+00A0 collapses like whitespace (it renders as a space),
    and '&amp;#38;' decodes ONCE: the named pass yields '&', leaving
    the literal '#38;' as text — not a second decode to '&'."""
    assert _html_one(
        spark, text.html_extract, "a\u00a0\u00a0b"
    ) == "a b"
    assert _html_one(spark, text.html_extract, "&amp;#38;") == "&#38;"
    assert _html_one(spark, text.html_extract, "&amp;#x26;") == "&#x26;"
    assert _html_one(spark, text.html_extract, "&#38;#x26;") == "&#x26;"


def test_html_links_extraction_forms(spark):
    """Every href value form, in document order; non-anchor tags and
    href-less anchors never match."""
    html = (
        '<a href="https://x.com/a?b=1&amp;c=2">abs</a>'
        "<a href='/single'>sq</a>"
        "<a href=unquoted/p>uq</a>"
        '<A HREF="/upper">case-insensitive</A>'
        '<a class="x"\n   href="/multiline">attr on next line</a>'
        '<a data-href="/not-an-href">decoy attr</a>'
        '<a name="anchor">no href</a>'
        '<abbr href="/not-anchor">wrong tag</abbr>'
        '<a href="">empty dropped</a>'
        '<a href="  /padded ">trimmed</a>'
        '<a href="/p?n=&#65;">numeric entity</a>'
    )
    got = _html_one(spark, text.html_links, html)
    assert got == [
        "https://x.com/a?b=1&c=2",
        "/single",
        "unquoted/p",
        "/upper",
        "/multiline",
        "/padded",
        "/p?n=A",
    ]


def test_html_links_single_decode_and_plain_text(spark):
    # attribute entity decode is SINGLE-decode like html_extract
    assert _html_one(
        spark, text.html_links, '<a href="/x?e=&amp;amp;">t</a>'
    ) == ["/x?e=&amp;"]
    # documents with no anchors (or no markup at all) -> empty array
    assert _html_one(spark, text.html_links, "no links here") == []
    assert _html_one(spark, text.html_links, "<p>a &lt; b</p>") == []


def test_html_base_href(spark):
    # first base-with-href wins; quotes/entities/whitespace handled
    assert _html_one(
        spark, text.html_base_href,
        '<head><base target="_top"><base href=" /sub/&#47; ">'
        '<base href="/ignored"></head>',
    ) == "/sub//"
    assert _html_one(
        spark, text.html_base_href, "<base href='https://cdn.x/'>"
    ) == "https://cdn.x/"
    assert _html_one(spark, text.html_base_href, "<p>no base</p>") is None
    assert _html_one(spark, text.html_base_href, '<base href="">') is None


def test_html_canonical(spark):
    """First rel=canonical link wins, any attribute order / quote
    form, case-insensitive, entity-decoded; exact-token rel only; NULL
    when absent or href-less."""
    cases = [
        ('<head><link rel="canonical" href="https://a/x"></head>',
         "https://a/x"),
        ("<link rel='canonical' href='/y'>", "/y"),
        ("<link rel=canonical href=/z>", "/z"),
        ('<link href="https://first" rel="canonical">', "https://first"),
        ('<link rel="stylesheet" href="s.css">'
         '<link rel="canonical" href="https://c">', "https://c"),
        ('<link rel="canonical" href="https://1">'
         '<link rel="canonical" href="https://2">', "https://1"),
        ('<LINK REL="CANONICAL" HREF="https://up">', "https://up"),
        ('<link rel="canonicalfoo" href="https://no">', None),
        ("<link rel=canonicalfoo href=https://no>", None),
        ('<link rel="canonical" href="https://a/?a=1&amp;b=2">',
         "https://a/?a=1&b=2"),
        ("<p>no links</p>", None),
        ('<link rel="canonical">', None),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i int, html string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", text.html_canonical(F.col("html")).alias("c")
        ).collect()
    }
    for i, (_, exp) in enumerate(cases):
        assert got[i] == exp, (i, got[i], exp)


def test_meta_robots_and_charset_prescan_match_htmlparser_reference(spark):
    """meta_robots and the charset-prescan regexes pinned against an
    html.parser reference over seeded-random well-formed HTML (the
    robots_decisions / sitemap_entries verification pattern): random
    attribute order, quote forms, case, decoy metas whose
    name=description content MENTIONS noindex/charset=, multiple
    robots tags (restrictive union), bare-charset and http-equiv
    declaration forms.  Contract notes mirrored by the reference: the
    http-equiv form wins over the bare attribute (coalesce order, not
    document order), and only <meta> tags with NO name=/http-equiv=
    carry a bare charset attribute."""
    import random
    from html.parser import HTMLParser

    from sample_dms_s3_kinesis_spark.sources.crawl import (
        META_CHARSET_ATTR_RE,
        META_CHARSET_EQUIV_RE,
    )

    rng = random.Random(20260816)
    charsets = ["UTF-8", "ISO-8859-1", "Shift_JIS", "windows-1252"]
    robot_tokens = ["noindex", "nofollow", "none", "noarchive", "all"]

    def attr(name, val, q):
        return f"{name}={q}{val}{q}" if q else f"{name}={val}"

    def meta_tag(attrs, rng):
        rng.shuffle(attrs)
        return "<" + rng.choice(["meta", "META", "Meta"]) + " " + " ".join(attrs) + ">"

    docs = []
    for i in range(200):
        parts = ["<html><head><title>t</title>"]
        for _ in range(rng.randrange(0, 4)):
            kind = rng.randrange(0, 5)
            q = rng.choice(['"', "'", ""])
            if kind == 0:  # robots meta
                toks = rng.sample(robot_tokens, rng.randrange(1, 3))
                parts.append(meta_tag(
                    [attr(rng.choice(["name", "NAME"]), "robots", q),
                     attr("content", ", ".join(toks), rng.choice(['"', "'"]))],
                    rng))
            elif kind == 1:  # decoy description mentioning keywords
                parts.append(meta_tag(
                    [attr("name", "description", q),
                     attr("content",
                          rng.choice(["set charset=iso-8859-1 here",
                                      "please noindex nothing",
                                      "plain words"]),
                          rng.choice(['"', "'"]))],
                    rng))
            elif kind == 2:  # bare charset attribute
                parts.append(meta_tag(
                    [attr("charset", rng.choice(charsets), q)], rng))
            elif kind == 3:  # http-equiv content-type
                parts.append(meta_tag(
                    [attr("http-equiv", "Content-Type", q),
                     attr("content",
                          f"text/html; charset={rng.choice(charsets)}",
                          rng.choice(['"', "'"]))],
                    rng))
            else:  # unrelated meta
                parts.append(meta_tag(
                    [attr("name", "viewport", q),
                     attr("content", "width=1", rng.choice(['"', "'"]))],
                    rng))
        parts.append("</head><body>words here</body></html>")
        docs.append((i, "".join(parts)))

    class Ref(HTMLParser):
        def __init__(self):
            super().__init__()
            self.robots = []
            self.equiv_cs = None
            self.attr_cs = None

        def handle_starttag(self, tag, attrs):
            if tag != "meta":
                return
            d = dict(attrs)
            if d.get("name", "").lower() == "robots":
                for tk in (d.get("content") or "").lower().split(","):
                    tk = tk.strip()
                    if tk and tk not in self.robots:
                        self.robots.append(tk)
            if (
                d.get("http-equiv", "").lower() == "content-type"
                and self.equiv_cs is None
            ):
                c = d.get("content") or ""
                if ";" in c and "charset=" in c.replace(" ", ""):
                    self.equiv_cs = (
                        c.split("charset=")[1].split(";")[0].strip().lower()
                    )
            if (
                "charset" in d
                and "name" not in d
                and "http-equiv" not in d
                and self.attr_cs is None
            ):
                self.attr_cs = d["charset"].lower()

    expected = {}
    for i, html in docs:
        r = Ref()
        r.feed(html)
        expected[i] = (r.robots, r.equiv_cs or r.attr_cs)

    df = spark.createDataFrame(docs, "id long, html string")
    got = {
        r["id"]: (
            list(r["m"]),
            (r["cs"] or "").lower() or None,
        )
        for r in df.select(
            "id",
            text.meta_robots(F.col("html")).alias("m"),
            F.coalesce(
                F.nullif(
                    F.regexp_extract(F.col("html"), META_CHARSET_EQUIV_RE, 1),
                    F.lit(""),
                ),
                F.nullif(
                    F.regexp_extract(F.col("html"), META_CHARSET_ATTR_RE, 1),
                    F.lit(""),
                ),
            ).alias("cs"),
        ).collect()
    }
    bad = [
        (i, got[i], expected[i])
        for i in expected
        if got[i] != expected[i]
    ]
    assert not bad, bad[:5]


def test_normalize_and_segment_match_python_reference(spark):
    """normalize_text / char_ngrams / segment_tokens pinned against
    pure-Python references over seeded-random multilingual strings
    (the robots_decisions verification pattern): mixed ASCII, Latin-1,
    Cyrillic, Greek, Arabic, CJK, kana, Thai, digits (incl.
    Arabic-Indic), punctuation, and whitespace runs."""
    import random
    import re as _re

    rng = random.Random(20260814)
    pools = [
        "the quick brown fox jumps over lazy dog and it is for".split(),
        ["café", "voilà", "très", "ñandú", "Ärger", "øre"],
        ["привет", "мир", "тест", "данные"],
        ["κείμενο", "εδώ", "λόγος"],
        ["النص", "هنا", "اختبار"],
        ["这是测试", "中文字符串", "数据管道", "语言"],
        ["テキスト", "データ", "ひらがな"],
        ["ข้อความ", "ทดสอบ"],
        ["123", "٤٢", "42x7", "a1b2"],
        ["...", "!?;", "—", "№", "†‡"],
    ]

    def rand_text(rng):
        n = rng.randrange(0, 12)
        toks = [rng.choice(rng.choice(pools)) for _ in range(n)]
        sep = lambda: rng.choice([" ", "  ", " \t "])  # noqa: E731
        return sep().join(toks) + rng.choice(["", " ", "  "])

    docs = [(i, rand_text(rng)) for i in range(300)]

    # Python references (same regex semantics: Python re supports
    # \p-free spelling via explicit ranges? No — use the regex that
    # Java/RE2 run through equivalent unicodedata category checks).
    import unicodedata

    def is_LN(ch):
        return unicodedata.category(ch)[0] in ("L", "N")

    def is_N(ch):
        return unicodedata.category(ch)[0] == "N"

    def ref_normalize(s):
        s = s.lower()
        # \p{N}+ -> '0'
        out, i = [], 0
        while i < len(s):
            if is_N(s[i]):
                while i < len(s) and is_N(s[i]):
                    i += 1
                out.append("0")
            else:
                out.append(s[i])
                i += 1
        s = "".join(out)
        s = "".join(c if (is_LN(c) or c == " ") else " " for c in s)
        s = _re.sub(" +", " ", s)
        return s.strip()

    SPACEFREE = (
        "Han", "Hiragana", "Katakana", "Hangul", "Thai", "Lao",
        "Khmer", "Myanmar",
    )

    def _script(ch):
        # unicodedata has no script property; approximate via name
        try:
            nm = unicodedata.name(ch)
        except ValueError:
            return None
        for s in ("CJK", "HIRAGANA", "KATAKANA", "HANGUL", "THAI",
                  "LAO", "KHMER", "MYANMAR"):
            if nm.startswith(s):
                return s
        return None

    def is_spacefree(tok):
        return any(_script(c) is not None for c in tok)

    def ref_char_ngrams(s, n=3):
        if len(s) <= n:
            return [s]
        seen, out = set(), []
        for i in range(len(s) - n + 1):
            g = s[i : i + n]
            if g not in seen:
                seen.add(g)
                out.append(g)
        return out

    def ref_segment(s, n=3):
        toks = _re.split(r"\s+", s.strip())
        out = []
        for t in toks:
            if is_spacefree(t):
                out.extend(ref_char_ngrams(t, n))
            else:
                out.append(t)
        return out

    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["id"]: (r["n"], list(r["seg"]))
        for r in df.select(
            "id",
            text.normalize_text(F.col("text")).alias("n"),
            text.segment_tokens(F.col("text")).alias("seg"),
        ).collect()
    }
    bad = []
    for i, s in docs:
        exp = (ref_normalize(s), ref_segment(s))
        if got[i] != exp:
            bad.append((i, s, got[i], exp))
    assert not bad, bad[:3]


def test_followable_links_edge_cases(spark):
    """The r14 second review-sweep's findings pinned: a 'rel=nofollow'
    substring inside an href query string must NOT drop the anchor, a
    larger rel token ('nofollower', 'my-nofollow-x') must NOT drop it
    (token-list semantics), and a document truncated mid-anchor keeps
    its final href exactly like html_links does."""
    rows = [
        (1, '<a href="/out?rel=nofollow&amp;u=2">x</a>'),
        (2, '<a rel="nofollower" href="/keep1">x</a>'),
        (3, '<a rel="my-nofollow-x" href="/keep2">x</a>'),
        (4, '<a rel="external nofollow" href="/drop">x</a>'),
        (5, '<a rel=NOFOLLOW href="/drop2">x</a>'),
        (6, '<a href="/a">x</a><a href="/trunc'),  # truncated fetch
        # r15 (r14 advice): quoted href containing '>' must not
        # truncate the tag — html_links keeps it, followable must too
        (7, '<a href="/a>b">x</a>'),
        # r15 (r14 advice): a whitespace+rel=nofollow sequence INSIDE
        # a quoted href value is NOT a rel attribute
        (8, '<a href="/s?q=a rel=nofollow">x</a>'),
        # ...but a real rel after a '>'-bearing quoted value still drops
        (9, '<a href="/a>b" rel="nofollow">x</a><a href="/keep3">y</a>'),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    got = {
        r["id"]: (list(r["all"]), list(r["ok"]))
        for r in df.select(
            "id",
            text.html_links(F.col("html")).alias("all"),
            text.html_followable_links(F.col("html")).alias("ok"),
        ).collect()
    }
    assert got[1][1] == ["/out?rel=nofollow&u=2"]  # href text != rel attr
    assert got[2][1] == ["/keep1"]
    assert got[3][1] == ["/keep2"]
    assert got[4][1] == []
    assert got[5][1] == []
    # truncated: followable == html_links, whatever the raw regex
    # yields for the dangling anchor
    assert got[6][1] == got[6][0]
    assert got[7][0] == ["/a>b"] and got[7][1] == ["/a>b"]
    assert got[8][1] == ["/s?q=a rel=nofollow"] == got[8][0]
    assert got[9][0] == ["/a>b", "/keep3"]
    assert got[9][1] == ["/keep3"]
