"""Round-5 additions: corpus snapshot diff, weighted sampling without
replacement, bigram-LM scoring, and semantic (cluster-then-pair)
dedup — each checked against an independent pure-Python reference."""

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import sampling, similarity
from sample_dms_s3_kinesis_spark.operators.curation import bigram_lm_stats
from sample_dms_s3_kinesis_spark.operators.dedup import embedding_near_dup_pairs
from sample_dms_s3_kinesis_spark.operators.versioning import (
    corpus_diff,
    corpus_diff_stats,
)

from tdata import sf_dir

SF_DIR = sf_dir("0.001")


# ------------------------------------------------------- corpus diff

def _snapshots(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma CHANGED"), (4, "delta"), (5, "epsilon")],
        ["doc_id", "text"],
    )
    return old, new


def test_corpus_diff_labels(spark):
    old, new = _snapshots(spark)
    got = {r["doc_id"]: r["change"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",
        5: "added",
    }


def test_corpus_diff_delta_only_and_stats(spark):
    old, new = _snapshots(spark)
    delta = corpus_diff(old, new, include_unchanged=False).collect()
    assert {r["doc_id"] for r in delta} == {1, 3, 5}
    stats = {
        r["change"]: r["n_docs"]
        for r in corpus_diff_stats(old, new).collect()
    }
    assert stats == {"removed": 1, "unchanged": 2, "changed": 1, "added": 1}


def test_corpus_diff_null_text_counts_as_content(spark):
    # md5(NULL) is NULL: NULL text on both sides must not read as
    # added/removed (the id IS present).  Spark's null-safe compare of
    # two NULL digests lands it in 'changed' (conservative: re-process).
    old = spark.createDataFrame([(1, None)], "doc_id long, text string")
    new = spark.createDataFrame([(1, None)], "doc_id long, text string")
    got = corpus_diff(old, new).collect()
    assert len(got) == 1 and got[0]["change"] == "changed"


# -------------------------------------------------- weighted sampling

def _ares_reference(rows, k, seed):
    keyed = []
    for doc_id, w in rows:
        if w is None or w <= 0:
            continue
        h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 16**8
        keyed.append((u ** (1.0 / w), -doc_id, doc_id))
    keyed.sort(reverse=True)
    return [t[2] for t in keyed[:k]]


def test_weighted_sample_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = [(r["doc_id"], r["n_chars"]) for r in docs.collect()]
    exp = set(_ares_reference(rows, k=20, seed=3))
    got = {
        r["doc_id"]
        for r in sampling.weighted_sample(
            docs, id_col="doc_id", weight_col="n_chars", k=20, seed=3
        ).collect()
    }
    assert got == exp


def test_weighted_sample_deterministic_and_filters_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, -5.0), (4, None), (5, 3.0), (6, 8.0)],
        "id long, w double",
    )
    s1 = {r["id"] for r in sampling.weighted_sample(df, id_col="id", weight_col="w", k=2).collect()}
    s2 = {r["id"] for r in sampling.weighted_sample(df, id_col="id", weight_col="w", k=2).collect()}
    assert s1 == s2 and len(s1) == 2
    assert s1 <= {1, 5, 6}  # non-positive / null weights never selected


def test_weighted_sample_prefers_heavy_rows(spark):
    # one row carries ~all the mass: across many seeds it must be
    # selected (k=1) nearly always — a distributional sanity check.
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(20)] + [(99, 10_000.0)], "id long, w double"
    )
    hits = sum(
        sampling.weighted_sample(df, id_col="id", weight_col="w", k=1, seed=s)
        .collect()[0]["id"]
        == 99
        for s in range(10)
    )
    assert hits >= 8


# ---------------------------------------------------- bigram LM score

def _bigram_reference(texts):
    docs = {i: t.strip().lower().split() for i, t in texts}
    big = {i: list(zip(tk, tk[1:])) for i, tk in docs.items() if len(tk) >= 2}
    bc: dict = {}
    for gs in big.values():
        for g in gs:
            bc[g] = bc.get(g, 0) + 1
    ctx: dict = {}
    for g, c in bc.items():
        ctx[g[0]] = ctx.get(g[0], 0) + c
    out = {}
    for i, gs in big.items():
        lp = sum(math.log2(bc[g] / ctx[g[0]]) for g in gs)
        out[i] = (len(gs), round(-lp / len(gs), 6))
    return out


def test_bigram_lm_matches_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    exp = _bigram_reference(
        [(r["doc_id"], r["text"]) for r in docs.collect()]
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in bigram_lm_stats(docs).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) <= 1e-6


def test_bigram_lm_order_sensitivity(spark):
    # same unigram bag, different order: the repetitive doc must score
    # strictly lower cross-entropy than the shuffled one.
    df = spark.createDataFrame(
        [
            (1, "a b a b a b a b a b"),
            (2, "a a b b a b b a a b"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["cross_entropy"] for r in bigram_lm_stats(df).collect()}
    assert got[1] < got[2]


# ------------------------------------------- stupid-backoff LM scoring

def _backoff_reference(train_texts, score_texts, alpha=0.4):
    tr = [t.strip().lower().split() for t in train_texts]
    bc: dict = {}
    uni: dict = {}
    for tk in tr:
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
        for g in zip(tk, tk[1:]):
            bc[g] = bc.get(g, 0) + 1
    ctx: dict = {}
    for g, c in bc.items():
        ctx[g[0]] = ctx.get(g[0], 0) + c
    n = sum(uni.values())
    out = {}
    for i, t in score_texts:
        tk = t.strip().lower().split()
        gs = list(zip(tk, tk[1:]))
        if not gs:
            continue
        lp = 0.0
        nb = 0
        for g in gs:
            if g in bc:
                lp += math.log2(bc[g] / ctx[g[0]])
            else:
                nb += 1
                lp += math.log2(alpha * uni.get(g[1], 1) / n)
        out[i] = (len(gs), nb, round(-lp / len(gs), 6))
    return out


def test_lm_score_against_matches_python(spark):
    from sample_dms_s3_kinesis_spark.operators.curation import lm_score_against

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)
    exp = _backoff_reference(
        [r["text"] for r in train.collect()],
        [(r["doc_id"], r["text"]) for r in score.collect()],
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_backoff"], r["cross_entropy"])
        for r in lm_score_against(score, train).collect()
    }
    assert set(got) == set(exp)
    assert any(v[1] > 0 for v in exp.values())  # held-out data backs off
    for k in exp:
        assert got[k][:2] == exp[k][:2]
        assert abs(got[k][2] - exp[k][2]) <= 1e-6


def test_lm_score_against_backoff_paths(spark):
    from sample_dms_s3_kinesis_spark.operators.curation import lm_score_against

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat")], ["doc_id", "text"]
    )
    score = spark.createDataFrame(
        [
            (10, "the cat sat"),       # fully in-model: no backoff
            (11, "the dog sat"),       # unseen bigrams, one OOV word
            (12, "zz"),                # single token: no row
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in lm_score_against(score, train).collect()}
    assert set(rows) == {10, 11}
    assert rows[10]["n_backoff"] == 0
    # "the dog" and "dog sat" both back off; "dog" is OOV (floor c=1),
    # "sat" has train count 1 -> identical floor term
    assert rows[11]["n_backoff"] == 2
    n = 6  # train tokens
    exp11 = -(
        math.log2(0.4 * 1 / n) + math.log2(0.4 * 1 / n)
    ) / 2
    assert abs(rows[11]["cross_entropy"] - round(exp11, 6)) <= 1e-6


# ---------------------------------------------------- semantic dedup

def test_semantic_dedup_single_cell_is_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in similarity.semantic_dedup_pairs(
            emb, cells=1, threshold=0.3, iters=1, broadcast=True
        ).collect()
    }
    exp = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_dup_pairs(
            emb.withColumn("_one", F.lit(0)),
            block_col="_one",
            threshold=0.3,
            broadcast=True,
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_semantic_dedup_survivors(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    pairs = similarity.semantic_dedup_pairs(
        emb, cells=4, threshold=0.3, iters=1, broadcast=True
    )
    kept = similarity.semantic_dedup(
        emb, cells=4, threshold=0.3, iters=1, broadcast=True
    )
    # survivor contract: per connected component of the pair graph,
    # exactly the min id survives (union-find reference in Python).
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    pair_rows = pairs.collect()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pair_rows:
        a, b = find(r["id_a"]), find(r["id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    comps: dict = {}
    for node in parent:
        comps.setdefault(find(node), set()).add(node)
    expected_dropped = set().union(
        *({m for m in members if m != root} for root, members in comps.items())
    )
    dropped = {r["vec_id"] for r in emb.select("vec_id").collect()} - kept_ids
    assert dropped == expected_dropped and len(dropped) > 0
    assert kept.count() == n - len(dropped)


def test_semantic_dedup_pairs_are_true_cosines(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    for r in similarity.semantic_dedup_pairs(
        emb, cells=4, threshold=0.3, iters=1, broadcast=True
    ).collect():
        a, b = rows[r["id_a"]], rows[r["id_b"]]
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(c - r["cosine"]) <= 1e-5
        assert r["cosine"] >= 0.3 and r["id_a"] < r["id_b"]


def test_weighted_sample_per_group_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = [(r["doc_id"], r["lang"], r["n_chars"]) for r in docs.collect()]
    by_lang: dict = {}
    for doc_id, lang, w in rows:
        by_lang.setdefault(lang, []).append((doc_id, w))
    exp = set()
    for lang, items in by_lang.items():
        exp |= {(doc_id, lang) for doc_id in _ares_reference(items, k=5, seed=9)}
    got = {
        (r["doc_id"], r["lang"])
        for r in sampling.weighted_sample_per_group(
            docs, group_cols="lang", id_col="doc_id",
            weight_col="n_chars", k=5, seed=9,
        ).collect()
    }
    assert got == exp
    # exactly min(k, group size) rows per group
    from collections import Counter

    per = Counter(lang for _, lang in got)
    for lang, items in by_lang.items():
        assert per[lang] == min(5, len(items))
