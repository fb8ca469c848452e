"""Curation operators (decontamination, dup-n-gram stats, unigram LM,
PII redaction) vs brute-force Python references."""

import math
import re

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import curation, text

DOCS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "beta gamma delta zeta eta"),       # shares "beta gamma delta" with 1
    (3, "one two three four five six"),
    (4, "alpha beta gamma delta epsilon"),  # exact dup of 1
    (5, "unique words only here now"),
    (6, "one two"),                          # too short for 3-grams
]


def _ngrams(s, n):
    toks = s.lower().strip().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_ngram_overlap_python_reference(spark):
    df = _docs_df(spark)
    bench = df.filter(F.col("doc_id").isin(1, 3))
    corpus = df.filter(~F.col("doc_id").isin(1, 3))
    out = {
        r["doc_id"]: r["n_shared"]
        for r in curation.ngram_overlap(corpus, bench, n=3).collect()
    }
    bench_grams = _ngrams(DOCS[0][1], 3) | _ngrams(DOCS[2][1], 3)
    exp = {}
    for doc_id, s in DOCS:
        if doc_id in (1, 3):
            continue
        shared = len(_ngrams(s, 3) & bench_grams)
        if shared:
            exp[doc_id] = shared
    assert out == exp
    assert 4 in out and 2 in out  # exact dup + partial overlap both flagged


def test_decontaminate_removes_flagged_docs(spark):
    df = _docs_df(spark)
    bench = df.filter(F.col("doc_id").isin(1, 3))
    corpus = df.filter(~F.col("doc_id").isin(1, 3))
    kept = sorted(
        r["doc_id"] for r in curation.decontaminate(corpus, bench, n=3).collect()
    )
    # 2 and 4 overlap doc 1; 5 is clean; 6 has no 3-grams so cannot overlap.
    assert kept == [5, 6]


def test_dup_ngram_stats_python_reference(spark):
    df = _docs_df(spark)
    out = {r["doc_id"]: r for r in curation.dup_ngram_stats(df, n=3).collect()}
    grams = {doc_id: _ngrams(s, 3) for doc_id, s in DOCS}
    from collections import Counter

    freq = Counter(g for gs in grams.values() for g in gs)
    for doc_id, gs in grams.items():
        if not gs:
            assert doc_id not in out
            continue
        n_dup = sum(1 for g in gs if freq[g] > 1)
        r = out[doc_id]
        assert r["n_grams"] == len(gs)
        assert r["n_dup"] == n_dup
        assert r["dup_frac"] == round(n_dup / len(gs), 6)


def test_unigram_lm_python_reference(spark):
    df = _docs_df(spark)
    out = {r["doc_id"]: r for r in curation.unigram_lm_stats(df).collect()}
    from collections import Counter

    toks = {doc_id: s.lower().strip().split() for doc_id, s in DOCS}
    cnt = Counter(w for ws in toks.values() for w in ws)
    total = sum(cnt.values())
    for doc_id, ws in toks.items():
        xent = -sum(math.log2(cnt[w] / total) for w in ws) / len(ws)
        r = out[doc_id]
        assert r["n_tokens"] == len(ws)
        assert abs(r["cross_entropy"] - xent) < 1e-5
    # Sanity: the doc of corpus-unique words scores strictly higher
    # cross-entropy than the exact-duplicated doc.
    assert out[5]["cross_entropy"] > out[1]["cross_entropy"]


PII_SAMPLES = [
    (1, "mail bob.smith+x@corp.example.com now"),
    (2, "server at 192.168.1.254 port open"),
    (3, "call +1 (415) 555-0199 today"),
    (4, "order 12345 shipped 67 items"),
    (5, "clean text with no identifiers"),
]


def test_redact_pii_python_reference(spark):
    df = spark.createDataFrame(PII_SAMPLES, "doc_id long, text string")
    kinds = ("email", "ipv4", "phone", "number")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            text.redact_pii(F.col("text"), kinds=kinds).alias("red"),
            text.pii_count(F.col("text"), kinds=kinds).alias("n"),
        ).collect()
    }
    for doc_id, s in PII_SAMPLES:
        red, n = s, 0
        for k in text.PII_ORDER:
            if k not in kinds:
                continue
            pat = text.PII_PATTERNS[k]
            n += len(re.findall(pat, red))
            red = re.sub(pat, text.PII_TOKENS[k], red)
        assert out[doc_id]["red"] == red, doc_id
        assert out[doc_id]["n"] == n, doc_id
    assert "<EMAIL>" in out[1]["red"] and "@" not in out[1]["red"]
    assert out[2]["red"] == "server at <IP> port open"
    assert "<PHONE>" in out[3]["red"]
    assert out[4]["red"].count("<NUMBER>") == 2
    assert out[5]["n"] == 0 and out[5]["red"] == PII_SAMPLES[4][1]


def test_dup_ngram_stats_boilerplate_cap(spark):
    """Adversarial boilerplate: one shared gram in every doc.  With
    max_doc_share set below its share, the gram drops out of BOTH
    numerator and denominator; rare grams are untouched.  The capped
    result must equal the Python reference computed over the corpus
    minus the boilerplate gram class."""
    boiler = "terms of service apply here"  # one 5-token window → one 5-gram
    docs = [
        (i, f"{boiler} unique{i} tail{i} word{i} extra{i} more{i}")
        for i in range(20)
    ]
    # docs 0/1 additionally share a genuine duplicated 5-gram run
    docs[0] = (0, f"{boiler} shared run of five tokens exactly zero")
    docs[1] = (1, f"{boiler} shared run of five tokens exactly one")
    df = spark.createDataFrame(docs, "doc_id long, text string")

    out = {
        r["doc_id"]: r
        for r in curation.dup_ngram_stats(
            df, n=5, max_doc_share=0.5
        ).collect()
    }

    from collections import Counter

    grams = {d: _ngrams(t, 5) for d, t in docs}
    freq = Counter(g for gs in grams.values() for g in gs)
    total = len(docs)
    kept = {
        d: [g for g in gs if freq[g] <= 0.5 * total] for d, gs in grams.items()
    }
    for d, gs in kept.items():
        if not gs:
            assert d not in out
            continue
        n_dup = sum(1 for g in gs if freq[g] > 1)
        assert out[d]["n_grams"] == len(gs)
        assert out[d]["n_dup"] == n_dup

    # Uncapped remains the exact unfiltered statistic (default None).
    full = {
        r["doc_id"]: r["n_grams"]
        for r in curation.dup_ngram_stats(df, n=5).collect()
    }
    for d, gs in grams.items():
        if gs:
            assert full[d] == len(gs)


def test_dup_span_coverage_python_reference(spark):
    """Interval-union semantics: overlapping duplicated windows merge;
    clean docs and short docs are absent."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens → 2 5-windows
    docs = [
        # docs 0/1 share a 6-token run at different offsets
        (0, f"{shared} unique0a unique0b unique0c"),
        (1, f"lead1a lead1b {shared} tail1"),
        # doc 2: clean (no cross-doc 5-gram)
        (2, "one two three four five six seven eight"),
        # doc 3: too short for any 5-gram
        (3, "tiny doc"),
        # docs 4/5: exact copies — full coverage
        (4, "copy one two copy three copy four copy five copy"),
        (5, "copy one two copy three copy four copy five copy"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from sample_dms_s3_kinesis_spark.operators.curation import dup_span_coverage

    out = {r["doc_id"]: r for r in dup_span_coverage(df, n=5).collect()}

    # Python reference: interval union over duplicated windows
    from collections import defaultdict

    n = 5
    toks = {d: t.lower().split() for d, t in docs}
    windows = {
        d: [tuple(tk[i : i + n]) for i in range(len(tk) - n + 1)]
        for d, tk in toks.items()
    }
    by_gram = defaultdict(set)
    for d, ws in windows.items():
        for g in ws:
            by_gram[g].add(d)
    expected = {}
    for d, ws in windows.items():
        spans = [
            (i, i + n - 1) for i, g in enumerate(ws) if len(by_gram[g]) > 1
        ]
        if not spans:
            continue
        covered, prev_end = 0, -1
        for s, e in spans:
            covered += max(0, e - max(s - 1, prev_end))
            prev_end = max(prev_end, e)
        expected[d] = (len(toks[d]), covered, round(covered / len(toks[d]), 6))
    assert set(out) == set(expected)
    for d, (nt, cov, frac) in expected.items():
        assert out[d]["n_tokens"] == nt
        assert out[d]["covered_tokens"] == cov
        assert abs(out[d]["span_frac"] - frac) <= 1e-9
    assert 2 not in out and 3 not in out
    assert out[4]["span_frac"] == 1.0 and out[5]["span_frac"] == 1.0


def test_dup_span_coverage_property_random_corpora(spark):
    """Property test: on random corpora with injected shared runs, the
    operator matches the Python interval-union reference exactly."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    shared_runs = [
        " ".join(rng.choices(vocab, k=rng.randint(5, 9))) for _ in range(4)
    ]
    docs = []
    for d in range(25):
        words = rng.choices(vocab, k=rng.randint(3, 25))
        if rng.random() < 0.6:
            run = rng.choice(shared_runs).split()
            pos = rng.randint(0, len(words))
            words = words[:pos] + run + words[pos:]
        docs.append((d, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from sample_dms_s3_kinesis_spark.operators.curation import dup_span_coverage

    n = 5
    out = {r["doc_id"]: r for r in dup_span_coverage(df, n=n).collect()}

    from collections import defaultdict

    toks = {d: t.lower().split() for d, t in docs}
    windows = {
        d: [tuple(tk[i : i + n]) for i in range(len(tk) - n + 1)]
        for d, tk in toks.items()
    }
    by_gram = defaultdict(set)
    for d, ws in windows.items():
        for g in ws:
            by_gram[g].add(d)
    for d, ws in windows.items():
        spans = [(i, i + n - 1) for i, g in enumerate(ws) if len(by_gram[g]) > 1]
        if not spans:
            assert d not in out
            continue
        covered, prev_end = 0, -1
        for s, e in spans:
            covered += max(0, e - max(s - 1, prev_end))
            prev_end = max(prev_end, e)
        assert out[d]["n_tokens"] == len(toks[d]), d
        assert out[d]["covered_tokens"] == covered, d


def test_remove_duplicated_spans_python_reference(spark):
    """Cleaned text = original-case tokens minus covered positions,
    space-joined; clean docs pass through (whitespace-normalized);
    fully-duplicated docs become empty."""
    docs = [
        (0, "Alpha beta gamma delta epsilon zeta UNIQUE0a unique0b"),
        (1, "lead1 alpha beta gamma delta epsilon zeta tail1"),
        (2, "one two three four five six seven"),
        (3, "tiny doc"),
        (4, "same same same same same"),
        (5, "same same same same same"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from sample_dms_s3_kinesis_spark.operators.curation import (
        remove_duplicated_spans,
    )

    out = {r["doc_id"]: r for r in remove_duplicated_spans(df, n=5).collect()}

    from collections import defaultdict

    n = 5
    toks = {d: t.split() for d, t in docs}
    low = {d: [w.lower() for w in tk] for d, tk in toks.items()}
    by_gram = defaultdict(set)
    for d, tk in low.items():
        for i in range(len(tk) - n + 1):
            by_gram[tuple(tk[i : i + n])].add(d)
    for d, tk in toks.items():
        covered = set()
        lw = low[d]
        for i in range(len(lw) - n + 1):
            if len(by_gram[tuple(lw[i : i + n])]) > 1:
                covered.update(range(i, i + n))
        clean = " ".join(t for i, t in enumerate(tk) if i not in covered)
        assert out[d]["clean_text"] == clean, d
        assert out[d]["n_removed"] == len(covered), d
    assert out[4]["clean_text"] == "" and out[5]["clean_text"] == ""
    assert out[2]["n_removed"] == 0 and out[3]["n_removed"] == 0


def _dedup_segments_ref(docs, width):
    """Python model: global keep-first of repeated width-token segments
    (first = minimal (doc_id, pos)), per-doc ordered rebuild."""
    segs = []  # (doc_id, pos, seg)
    for doc_id, s in docs:
        toks = s.strip().split()
        for pos in range(0, math.ceil(len(toks) / width)):
            seg = " ".join(toks[pos * width : pos * width + width])
            if seg:
                segs.append((doc_id, pos, seg))
    first = {}
    for doc_id, pos, seg in sorted(segs):
        first.setdefault(seg.lower(), (doc_id, pos))
    out = {}
    for doc_id, s in docs:
        mine = sorted(
            (p, g) for d, p, g in segs
            if d == doc_id and first[g.lower()] == (d, p)
        )
        total = sum(1 for d, _, _ in segs if d == doc_id)
        out[doc_id] = (" ".join(g for _, g in mine), total - len(mine))
    return out


def test_dedup_segments_python_reference(spark):
    docs = [
        (1, "a b c d e f g h"),            # segments: "a b c d", "e f g h"
        (2, "a b c d x y z w tail"),       # first seg dups doc 1's
        (3, "A B C D e f g h"),            # case-insensitive dup of doc 1
        (4, "x y z w a b c d"),            # same WORDS, different segments
        (5, "fresh words only appear here once more indeed"),
        (6, "e f g h"),                    # whole doc is a dup segment
    ]
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in curation.dedup_segments(
            spark.createDataFrame(docs, "doc_id long, text string"), width=4
        ).collect()
    }
    exp = _dedup_segments_ref(docs, 4)
    assert got == exp
    # the fully-duplicated doc rebuilds to '' with its segment counted
    assert got[6] == ("", 1)
    # original case survives in the kept copy, dup dropped by lowered key
    assert got[3][0] == "e f g h" or got[3][0] == ""
    assert got[1] == ("a b c d e f g h", 0)  # first occurrences all kept


def test_dedup_segments_idempotent(spark):
    docs = [
        (1, "p q r s t u v w"),
        (2, "p q r s m n o k"),
        (3, "t u v w t u v w"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = curation.dedup_segments(df, width=4).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = curation.dedup_segments(once, width=4)
    again = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in twice.collect()
    }
    base = {
        r["doc_id"]: r["clean_text"]
        for r in curation.dedup_segments(df, width=4).collect()
    }
    # deduping an already-deduped corpus removes nothing
    assert all(n == 0 for _, n in again.values())
    assert {k: v for k, (v, _) in again.items()} == base


def test_dedup_segments_against_matches_self_flavor_on_union(spark):
    """When the existing corpus is itself segment-deduped, gating NEW
    against it must keep exactly the segments the self flavor keeps on
    existing UNION new (projected to new ids) — provided every shared
    class's global first occurrence lies in EXISTING, which holds here
    because existing ids sort below new ids."""
    existing = [
        (1, "a b c d e f g h"),
        (2, "m n o p q r s t"),
    ]
    new = [
        (11, "a b c d fresh segment goes here"),   # 1st seg dup of doc 1
        (12, "fresh segment goes here u v w x"),   # 1st seg dups doc 11's
        (13, "e f g h e f g h"),                   # both segs dup doc 1
    ]
    e_df = spark.createDataFrame(existing, "doc_id long, text string")
    n_df = spark.createDataFrame(new, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in curation.dedup_segments_against(n_df, e_df, width=4).collect()
    }
    via_union = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in curation.dedup_segments(e_df.union(n_df), width=4).collect()
        if r["doc_id"] >= 11
    }
    assert got == via_union
    assert got[13] == ("", 2)  # fully corpus-duplicated doc
    assert got[11] == ("fresh segment goes here", 1)
    assert got[12][1] == 1  # in-batch dup of doc 11's kept segment


def _dedup_within_ref(docs, width):
    import math as _math

    out = {}
    for doc_id, s in docs:
        toks = s.strip().split()
        segs = []
        for pos in range(0, _math.ceil(len(toks) / width)):
            seg = " ".join(toks[pos * width : pos * width + width])
            if seg:
                segs.append((pos, seg))
        seen, mine = set(), []
        for pos, seg in segs:
            if seg.lower() not in seen:
                seen.add(seg.lower())
                mine.append(seg)
        out[doc_id] = (" ".join(mine), len(segs) - len(mine))
    return out


def test_dedup_segments_within_python_reference(spark):
    docs = [
        (1, "a b c d a b c d e f g h"),   # in-doc repeat of seg 0
        (2, "a b c d x y z w"),           # dups doc 1's seg ACROSS docs only
        (3, "E F G H e f g h"),           # case-insensitive in-doc repeat
        (4, "solo words here"),
    ]
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in curation.dedup_segments_within(
            spark.createDataFrame(docs, "doc_id long, text string"), width=4
        ).collect()
    }
    assert got == _dedup_within_ref(docs, 4)
    # cross-document duplication is untouched — doc 2 keeps its copy
    assert got[2] == ("a b c d x y z w", 0)
    assert got[1] == ("a b c d e f g h", 1)
    assert got[3] == ("E F G H", 1)  # first (original-case) copy survives


def test_dedup_segments_within_then_global_matches_global(spark):
    """The within-doc pass removes a subset of what the global pass
    removes (global keep-first already keeps only the first in-doc
    copy), so within→global must equal global alone."""
    docs = [
        (1, "a b c d a b c d e f g h"),
        (2, "a b c d m n o p"),
        (3, "e f g h e f g h"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    direct = {
        r["doc_id"]: r["clean_text"]
        for r in curation.dedup_segments(df, width=4).collect()
    }
    within = curation.dedup_segments_within(df, width=4).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    composed = {
        r["doc_id"]: r["clean_text"]
        for r in curation.dedup_segments(within, width=4).collect()
    }
    assert composed == direct


def test_dedup_segments_boilerplate_skew_corpus(spark):
    """r5 verdict item 7 — adversarial skew: one boilerplate footer
    segment appears in >50% of docs.  The keep-first MIN(struct)
    aggregate must (a) stay correct vs the Python model, and (b) keep
    its plan free of windows and extra shuffles: partial map-side
    combine (partial_min in the physical aggregate) is what bounds the
    hot segment key at 100 TB, where a row_number window would funnel
    every footer occurrence through one reducer."""
    footer = "c o p y r i g h t f o o t e r"  # one 12-token segment... use width=4
    docs = [(i, f"body{i} unique{i} filler{i} tok{i} " + "all rights reserved inc")
            for i in range(60)]
    docs += [(100 + i, f"fresh{i} words{i} only{i} here{i}") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = curation.dedup_segments(df, width=4)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in out.collect()
    }
    exp = _dedup_segments_ref(docs, 4)
    assert got == exp
    # the hot footer survived exactly once, in the minimal doc
    assert "all rights reserved inc" in got[0][0]
    assert sum(
        1 for t, _ in got.values() if "all rights reserved inc" in t
    ) == 1

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan                  # no row_number funnel
    assert "partial_min" in plan                 # map-side combine on the hot key
    # no range-partitioned (global sort) exchange: the hot key never
    # funnels through an ordered single-reducer path
    assert "rangepartitioning" not in plan
    # shuffle budget regression guard: the segs subtree recurs in the
    # keep-first, join-back and rebuild branches (11 hash exchanges
    # measured); a blowup past this means a new shuffle crept in
    assert plan.count("Exchange") <= 14, plan.count("Exchange")


def test_dedup_segments_cdc_catches_shifted_copy(spark):
    """The reason content-defined segmentation exists: a repeated
    passage behind an inserted preamble.  The fixed-width grid no
    longer lines up (dedup_segments keeps both copies); rolling-hash
    boundaries re-synchronize and the CDC flavor removes the shifted
    copy.  Also pins equivalence to the keep-first model applied to
    the operator's own chunking."""
    passage = " ".join(f"p{i}z{i + 3}" for i in range(120))
    docs = [
        (1, passage),
        (2, "a little inserted preamble " + passage),
        (3, "unrelated fresh content entirely here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in curation.dedup_segments_cdc(
            df, mask_bits=3, min_tokens=4, max_tokens=24
        ).collect()
    }
    assert out[1] == (passage, 0)         # first copy untouched
    assert out[2][1] > 0                  # shifted copy: chunks removed
    assert passage not in out[2][0]       # the repeated tail is gone
    assert out[3][1] == 0

    # the fixed-width flavor misses the shifted copy almost entirely
    fixed = {
        r["doc_id"]: r["n_removed"]
        for r in curation.dedup_segments(df, width=8).collect()
    }
    assert out[2][1] > fixed[2]

    # equivalence to the Python keep-first model over the SAME chunks
    from sample_dms_s3_kinesis_spark.operators.text import cdc_chunks

    chunks = [
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in cdc_chunks(
            df, mask_bits=3, min_tokens=4, max_tokens=24
        ).collect()
    ]
    first = {}
    for d, p, g in sorted(chunks):
        first.setdefault(g.lower(), (d, p))
    exp = {}
    for d, _ in docs:
        mine = sorted(
            (p, g) for dd, p, g in chunks
            if dd == d and first[g.lower()] == (dd, p)
        )
        total = sum(1 for dd, _, _ in chunks if dd == d)
        exp[d] = (" ".join(g for _, g in mine), total - len(mine))
    assert out == exp


def test_dedup_segments_cdc_against_matches_self_on_union(spark):
    """Same consistency contract as the fixed-width twin: running the
    self flavor over existing∪new and projecting the new ids equals
    the incremental form when existing is itself chunk-deduped — and
    the shifted-lift case (corpus passage behind a new preamble) IS
    caught, unlike dedup_segments_against."""
    passage = " ".join(f"s{i}t{i + 7}" for i in range(80))
    existing = spark.createDataFrame(
        [(1, passage), (2, "some other corpus content words here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "fresh preamble words " + passage),   # shifted lift
            (11, "entirely novel new document body"),
            (12, "entirely novel new document body"),  # in-batch dup
        ],
        "doc_id long, text string",
    )
    kw = dict(mask_bits=3, min_tokens=4, max_tokens=24)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in curation.dedup_segments_cdc_against(
            new, existing, **kw
        ).collect()
    }
    assert set(got) == {10, 11, 12}
    assert got[10][1] > 0 and passage not in got[10][0]  # lift removed
    # union-consistency: self flavor over existing ∪ new, new ids only
    union = existing.unionByName(new)
    ref = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in curation.dedup_segments_cdc(union, **kw).collect()
        if r["doc_id"] >= 10
    }
    assert got == ref
    # the fixed-width incremental misses the shifted lift entirely
    fixed = {
        r["doc_id"]: r["n_removed"]
        for r in curation.dedup_segments_against(
            new, existing, width=8
        ).collect()
    }
    assert got[10][1] > fixed[10]


def test_unigram_lm_ignores_empty_docs(spark):
    """r6 review: empty/whitespace docs used to appear with a ''
    pseudo-token and inflate N for every document."""
    base = [(1, "the cat sat"), (2, "the dog ran")]
    with_empty = base + [(3, ""), (4, "   ")]
    a = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in curation.unigram_lm_stats(
            spark.createDataFrame(base, "doc_id long, text string")
        ).collect()
    }
    b = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in curation.unigram_lm_stats(
            spark.createDataFrame(with_empty, "doc_id long, text string")
        ).collect()
    }
    assert a == b          # empty docs absent AND other docs unchanged


# ------------------------------------------------------- DSIR weights

def _python_dsir(raw_docs, target_docs, buckets):
    """Pure-Python hashed-unigram importance weights (md5 family)."""
    import hashlib
    from collections import Counter

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % buckets

    def toks(s):
        return re.split(r"\s+", s.lower().strip())

    ct = Counter(bucket(w) for _, s in target_docs for w in toks(s))
    cr = Counter(bucket(w) for _, s in raw_docs for w in toks(s))
    nt, nr = sum(ct.values()), sum(cr.values())
    const = math.log2(nr + buckets) - math.log2(nt + buckets)
    out = {}
    for doc_id, s in raw_docs:
        ws = toks(s)
        lw = sum(
            math.log2(ct[bucket(w)] + 1) - math.log2(cr[bucket(w)] + 1)
            for w in ws
        ) + len(ws) * const
        out[doc_id] = (len(ws), round(lw, 6))
    return out


def test_dsir_weights_match_python_reference(spark):
    raw = [(1, "alpha beta gamma"), (2, "one two three beta"),
           (3, "unique words only here"), (4, "alpha alpha alpha")]
    target = [(10, "alpha beta beta gamma gamma gamma"),
              (11, "alpha beta delta")]
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt_df = spark.createDataFrame(target, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"])
        for r in curation.dsir_weights(
            raw_df, tgt_df, buckets=16, hash_family="md5"
        ).collect()
    }
    exp = _python_dsir(raw, target, 16)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0]
        assert abs(got[d][1] - exp[d][1]) <= 2e-6
    # target-like docs (shared vocabulary) must outrank alien ones
    assert got[1][1] > got[3][1]


def test_dsir_weights_null_text_and_validation(spark):
    import pytest as _pytest

    raw_df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string"
    )
    tgt_df = spark.createDataFrame([(9, "alpha")], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"])
        for r in curation.dsir_weights(
            raw_df, tgt_df, buckets=8, hash_family="md5"
        ).collect()
    }
    assert got[2] == (0, 0.0)
    assert got[1][0] == 2
    with _pytest.raises(ValueError, match="buckets"):
        curation.dsir_weights(raw_df, tgt_df, buckets=0)
    with _pytest.raises(ValueError, match="hash_family"):
        curation.dsir_weights(raw_df, tgt_df, hash_family="sha1")


def test_drop_frequent_lines_removes_cross_doc_boilerplate(spark):
    from sample_dms_s3_kinesis_spark.operators.curation import (
        drop_frequent_lines,
    )

    docs = spark.createDataFrame(
        [
            (1, "unique alpha\nCOOKIE BANNER\nbody one\nfooter text"),
            (2, "COOKIE BANNER\nbody two\nfooter text"),
            (3, "body three\nfooter text\nCOOKIE BANNER"),
            (4, "all mine\nno shared lines here"),
            (5, "COOKIE BANNER\nfooter text"),  # all boilerplate -> ''
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in drop_frequent_lines(docs, max_docs=2).collect()
    }
    # COOKIE BANNER (4 docs) and footer text (4 docs) exceed max_docs=2;
    # everything else survives in original order
    assert out == {
        1: "unique alpha\nbody one",
        2: "body two",
        3: "body three",
        4: "all mine\nno shared lines here",
        5: "",
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_docs"):
        drop_frequent_lines(docs, max_docs=0)


def test_drop_frequent_lines_short_line_exemption(spark):
    """Lines below min_line_chars are structure, not boilerplate —
    kept everywhere and never counted (no mega-bucket shuffle)."""
    from sample_dms_s3_kinesis_spark.operators.curation import (
        drop_frequent_lines,
    )

    docs = spark.createDataFrame(
        [(i, "x\nshared body line\nx") for i in range(4)],
        "doc_id long, text string",
    )
    out = drop_frequent_lines(
        docs, max_docs=2, min_line_chars=2
    ).collect()
    assert all(r["text"] == "x\nx" for r in out)
