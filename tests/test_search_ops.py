"""Retrieval operators vs a pure-Python reference index."""

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from sample_dms_s3_kinesis_spark.operators import search


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quick brown foxes leap"),
    (3, "the lazy dog sleeps all day the lazy dog"),
    (4, "brown dog quick fox"),
    (5, "completely unrelated text here"),
    (6, "QUICK BROWN fox"),           # case folding
]


def _df(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_boolean_search(spark):
    got = {
        r["doc_id"]
        for r in search.boolean_search(
            _df(spark), ["quick", "brown", "fox"]
        ).collect()
    }
    # doc 2 has 'foxes', not 'fox'; doc 6 matches case-insensitively
    assert got == {1, 4, 6}


def test_phrase_search_counts_occurrences(spark):
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in search.phrase_search(_df(spark), ["lazy", "dog"]).collect()
    }
    assert got == {1: 1, 3: 2}
    # order matters: 'dog lazy' never occurs
    assert search.phrase_search(_df(spark), ["dog", "lazy"]).count() == 0
    # 3-term phrase
    got3 = {
        r["doc_id"]: r["n_occurrences"]
        for r in search.phrase_search(
            _df(spark), ["the", "lazy", "dog"]
        ).collect()
    }
    assert got3 == {1: 1, 3: 2}


def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    avg = sum(len(v) for v in toks.values()) / n
    dfreq = {
        w: sum(1 for v in toks.values() if w in v) for w in terms
    }
    out = {}
    for d, v in toks.items():
        s = 0.0
        for w in terms:
            tf = v.count(w)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(v) / avg)
            )
        if s > 0:
            out[d] = round(s, 4)
    return out


def test_bm25_matches_python_reference(spark):
    terms = ["dog", "fox"]
    got = {
        r["doc_id"]: r["score"]
        for r in search.bm25_search(_df(spark), terms, topk=10).collect()
    }
    ref = _bm25_ref(DOCS, terms)
    assert set(got) == set(ref)
    for d in ref:
        assert abs(got[d] - ref[d]) < 1e-3, d
    # rarer term outranks: doc with both terms beats dog-only docs
    ordered = [
        r["doc_id"]
        for r in search.bm25_search(_df(spark), terms, topk=3).collect()
    ]
    assert ordered[0] in {1, 4}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=2, max_size=3),
)
def test_phrase_search_property(spark, texts, phrase):
    docs = list(enumerate(texts))
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in search.phrase_search(_df(spark, docs), phrase).collect()
    }
    exp = {}
    for d, s in docs:
        v = s.split()
        c = sum(
            1
            for i in range(len(v) - len(phrase) + 1)
            if v[i : i + len(phrase)] == list(phrase)
        )
        if c:
            exp[d] = c
    assert got == exp


def test_boolean_search_with_exclusion(spark):
    p = search.postings(_df(spark))
    got = {
        r["doc_id"]
        for r in search.boolean_search_postings(
            p, ["quick", "brown"], exclude=["lazy"]
        ).collect()
    }
    # docs 1 (has lazy) drops; 2, 4, 6 keep quick+brown without lazy
    assert got == {2, 4, 6}


def test_postings_index_roundtrip_prunes_partitions(spark, tmp_path):
    idx = search.PostingsIndex.build(_df(spark))
    path = str(tmp_path / "postings")
    idx.save(path)
    loaded = search.PostingsIndex.load(spark, path)
    fresh = {
        r["doc_id"]
        for r in search.boolean_search(_df(spark), ["quick", "fox"]).collect()
    }
    served = {
        r["doc_id"] for r in loaded.search(["quick", "fox"]).collect()
    }
    assert served == fresh == {1, 4, 6}
    # AND-NOT from the store matches the in-memory form
    a = {r["doc_id"] for r in loaded.search(["quick"], exclude=["dog"]).collect()}
    b = {
        r["doc_id"]
        for r in search.boolean_search_postings(
            search.postings(_df(spark)), ["quick"], exclude=["dog"]
        ).collect()
    }
    assert a == b
    # the loaded term filter must prune storage partitions on _tb
    plan = (
        loaded.search(["quick", "fox"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "_tb" in plan


def test_boolean_search_deduplicates_repeated_terms(spark):
    # ['quick', 'quick'] is the one-term query, not an unsatisfiable
    # two-distinct-token count (r5 advice).
    got = {
        r["doc_id"]
        for r in search.boolean_search(_df(spark), ["quick", "QUICK"]).collect()
    }
    want = {
        r["doc_id"]
        for r in search.boolean_search(_df(spark), ["quick"]).collect()
    }
    assert got == want and got  # non-empty, identical to the deduped query


def test_boolean_search_postings_deduplicates_repeated_terms(spark):
    p = search.postings(_df(spark))
    got = {
        r["doc_id"]
        for r in search.boolean_search_postings(
            p, ["dog", "dog", "lazy"]
        ).collect()
    }
    want = {
        r["doc_id"]
        for r in search.boolean_search_postings(p, ["dog", "lazy"]).collect()
    }
    assert got == want and got


def test_bm25_empty_corpus_returns_empty_frame(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = search.bm25_search(empty, ["quick"])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "score"]
    # docs that all tokenize to nothing hit the same guard
    blank = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    assert search.bm25_search(blank, ["quick"]).count() == 0


def test_bm25_single_stats_action(spark, monkeypatch):
    """Corpus stats + per-term df must arrive in ONE driver action
    (r5 verdict item: the two serialized collect()s fold into a
    union-aggregate).  Counted by instrumenting DataFrame.collect —
    AQE job counts are non-deterministic, collect calls are not."""
    cls = type(_df(spark))  # the concrete (classic) DataFrame class
    calls = []
    orig = cls.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    out = search.bm25_search(_df(spark), ["dog", "fox"])
    assert len(calls) == 1  # exactly one internal stats action
    assert out.count() > 0  # and the plan still evaluates
