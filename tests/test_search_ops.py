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


def _rrf_ref(lex_ranked, dense_ranked, rrf_k=60):
    """Pure-Python RRF over two (id -> rank) channel dicts."""
    ids = set(lex_ranked) | set(dense_ranked)
    out = {}
    for d in ids:
        s = 0.0
        if d in lex_ranked:
            s += 1.0 / (rrf_k + lex_ranked[d])
        if d in dense_ranked:
            s += 1.0 / (rrf_k + dense_ranked[d])
        out[d] = round(s, 6)
    return out


def test_rrf_fuse_matches_python_reference(spark):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(3, 1), (4, 2), (1, 3)], "doc_id long, rank int"
    )
    got = {
        r["doc_id"]: (r["rank_1"], r["rank_2"], r["rrf_score"])
        for r in search.rrf_fuse([lex, dense], topk=10).collect()
    }
    ref = _rrf_ref({1: 1, 2: 2, 3: 3}, {3: 1, 4: 2, 1: 3})
    assert {d: s for d, (_, _, s) in got.items()} == ref
    # channel-missing ids carry a NULL rank for that channel
    assert got[2] == (2.0, None, round(1.0 / 62, 6))
    assert got[4] == (None, 2.0, round(1.0 / 62, 6))
    # doc in both channels outranks single-channel docs here
    top = search.rrf_fuse([lex, dense], topk=1).collect()[0]
    assert top["doc_id"] in (1, 3)  # 1/(60+1)+1/(60+3) == 1/63+1/61


def test_rrf_fuse_rejects_empty_channel_list(spark):
    import pytest

    with pytest.raises(ValueError):
        search.rrf_fuse([])


def test_hybrid_rrf_search_end_to_end(spark):
    """Dense channel built so doc 5 (lexically unrelated) is the
    nearest neighbor: hybrid search must surface it via the dense
    rank while BM25 alone never would."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (4, [0.5, 0.5]),
            (5, [0.99, 0.01]),
            (6, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = search.hybrid_rrf_search(
        _df(spark), emb, ["dog", "fox"], [1.0, 0.0], k=10, pool=4
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 5 has no query term -> no lexical rank, but dense rank 2
    assert by_id[5]["rank_1"] is None and by_id[5]["rank_2"] == 2.0
    # dense top-1 is the query vector itself (doc 1), which also
    # matches lexically -> it must lead the fused ranking
    assert out[0]["doc_id"] == 1
    # every fused score is the RRF of its surfaced ranks
    for r in out:
        want = 0.0
        if r["rank_1"] is not None:
            want += 1.0 / (60 + r["rank_1"])
        if r["rank_2"] is not None:
            want += 1.0 / (60 + r["rank_2"])
        assert abs(r["rrf_score"] - round(want, 6)) < 1e-9


def test_ranking_metrics_hand_computed(spark):
    """nDCG/MRR/Recall vs a hand-worked example (k=3)."""
    import math

    # q1: run = [d1(rel2), d2(rel0), d3(rel1)]; qrels also d4(rel3)
    # unretrieved.  q2: relevant docs exist, run has no hits.
    run = spark.createDataFrame(
        [(1, "d1", 1), (1, "d2", 2), (1, "d3", 3),
         (2, "x1", 1), (2, "x2", 2)],
        "query_id long, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, "d1", 2), (1, "d3", 1), (1, "d4", 3),
         (2, "y1", 1),
         (3, "z1", 0)],  # q3: no relevant docs -> dropped
        "query_id long, doc_id string, rel long",
    )
    from sample_dms_s3_kinesis_spark.operators.search import (
        ranking_metrics_report,
    )

    out = {
        r["query_id"]: r
        for r in ranking_metrics_report(run, qrels, k=3).collect()
    }
    assert set(out) == {1, 2}
    dcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
    idcg = (
        (2**3 - 1) / math.log2(2)
        + (2**2 - 1) / math.log2(3)
        + (2**1 - 1) / math.log2(4)
    )
    assert abs(out[1]["ndcg"] - round(dcg / idcg, 6)) < 1e-9
    assert out[1]["mrr"] == 1.0
    # AP@3: precision at the relevant ranks 1 and 3 = 1/1 and 2/3,
    # normalized by min(n_rel=3, k=3)
    assert abs(out[1]["ap"] - round((1.0 + 2.0 / 3.0) / 3.0, 6)) < 1e-9
    assert abs(out[1]["recall"] - round(2 / 3, 6)) < 1e-9
    assert out[2]["ndcg"] == 0.0
    assert out[2]["mrr"] == 0.0
    assert out[2]["ap"] == 0.0
    assert out[2]["recall"] == 0.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        ranking_metrics_report(run, qrels, k=0)


def test_ranking_metrics_perfect_run(spark):
    """A run that returns the relevant docs in ideal order scores
    nDCG = MRR = recall = 1."""
    qrels = spark.createDataFrame(
        [(1, "a", 3), (1, "b", 2), (1, "c", 1)],
        "query_id long, doc_id string, rel long",
    )
    run = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3)],
        "query_id long, doc_id string, rank long",
    )
    from sample_dms_s3_kinesis_spark.operators.search import (
        ranking_metrics_report,
    )

    row = ranking_metrics_report(run, qrels, k=10).collect()[0]
    assert (row["ndcg"], row["mrr"], row["ap"], row["recall"]) == (
        1.0, 1.0, 1.0, 1.0,
    )
