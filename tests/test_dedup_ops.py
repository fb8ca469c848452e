"""Dedup operators: exactness vs Python references; LSH family
soundness/consistency properties that hold by construction."""

import itertools

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import dedup

from tdata import sf_dir

SF_DIR = sf_dir("0.001")


def _docs(spark, n=120):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text", "lang")
    )


def test_exact_dedup_known_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "aaa"), (6, "bbb")],
        "doc_id long, text string",
    )
    groups = {r["keep_id"]: r["dup_count"] for r in dedup.exact_duplicates(df).collect()}
    assert groups == {1: 3, 2: 2}
    survivors = {r["doc_id"]: r["group_size"] for r in dedup.dedup_exact(df).collect()}
    assert survivors == {1: 3, 2: 2, 4: 1}


def test_ngram_jaccard_matches_python_reference(spark):
    docs = _docs(spark).collect()
    out = dedup.ngram_jaccard_pairs(
        _docs(spark), block_col="lang", n=3, threshold=0.15
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}

    def grams(s, n=3):
        toks = s.lower().strip().split()
        return set(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))

    expected = {}
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        for a, b in itertools.combinations(sorted(rows, key=lambda r: r["doc_id"]), 2):
            ga, gb = grams(a["text"]), grams(b["text"])
            union = ga | gb
            j = len(ga & gb) / len(union) if union else 0.0
            if round(j, 6) >= 0.15:
                expected[(a["doc_id"], b["doc_id"])] = round(j, 6)

    assert set(got) == set(expected)
    for k in got:
        assert abs(got[k] - expected[k]) < 1e-9, (k, got[k], expected[k])


def test_minhash_lsh_soundness_and_self_similarity(spark):
    base = _docs(spark, n=60)
    # Append exact copies of 3 docs under new ids: est_jaccard must be
    # 1.0 and LSH must surface them (identical signatures share every band).
    copies = base.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang"
    )
    df = base.unionByName(copies)
    pairs = dedup.minhash_lsh_pairs(df, num_hashes=64, bands=16, threshold=0.9).collect()
    found = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    for i in range(3):
        assert (i, i + 100000) in found, f"exact copy pair {i} not found"
        assert found[(i, i + 100000)] == 1.0
    # soundness: every reported pair meets the threshold
    assert all(v >= 0.9 for v in found.values())


def test_minhash_estimates_track_true_jaccard(spark):
    docs = _docs(spark, n=40).collect()
    sig_df = _docs(spark, n=40).select(
        "doc_id", dedup.minhash_signature(F.col("text"), num_hashes=128).alias("sig")
    )
    sigs = {r["doc_id"]: r["sig"] for r in sig_df.collect()}

    def grams(s, n=3):
        toks = s.lower().strip().split()
        return set(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))

    import itertools

    errs = []
    for a, b in itertools.combinations(docs, 2):
        ga, gb = grams(a["text"]), grams(b["text"])
        true_j = len(ga & gb) / len(ga | gb) if (ga | gb) else 0.0
        est = sum(x == y for x, y in zip(sigs[a["doc_id"]], sigs[b["doc_id"]])) / 128
        errs.append(abs(true_j - est))
    # 128 hashes → std ≈ sqrt(j(1-j)/128) ≤ 0.045; mean abs error well under 0.08
    assert sum(errs) / len(errs) < 0.08, sum(errs) / len(errs)


def test_simhash_pairs_sound_and_complete_vs_signatures(spark):
    df = _docs(spark, n=80)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(df, max_hamming=3).collect()
    }
    sigs = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", dedup.simhash(F.col("text")).alias("sh")).collect()
    }
    expected = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        if h <= 3:
            expected[(a, b)] = h
    # Pigeonhole banding (4×16 bits, hamming ≤3) is exact: sound AND complete.
    assert got == expected


def test_embedding_near_dup_python_reference(spark):
    import math

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_pairs(emb, threshold=0.3).collect()
    }
    rows = emb.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    expected = {}
    for label, rs in by_label.items():
        for a, b in itertools.combinations(sorted(rs, key=lambda r: r["vec_id"]), 2):
            va, vb = a["embedding"], b["embedding"]
            dot = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            c = round(dot / (na * nb), 6)
            if c >= 0.3:
                expected[(a["vec_id"], b["vec_id"])] = c
    assert set(got) == set(expected)
    for k in got:
        assert abs(got[k] - expected[k]) <= 1e-5


def test_lsh_verified_jaccard_subset_of_exact_with_true_values(spark):
    """The composed LSH->exact pipeline returns only pairs the exact
    operator returns (no false positives — verification is exact) and
    reports the true Jaccard value; at the default high-recall banding
    (r=2, b=32) it finds every pair on this corpus."""
    docs = _docs(spark)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    composed = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.lsh_verified_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert set(composed) == set(exact)
    for k, v in composed.items():
        assert abs(v - exact[k]) <= 1e-9


def test_connected_components_known_shapes(spark):
    # path (worst case for label propagation), triangle, pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21), (2, 1)],
        "id_a long, id_b long",
    )
    got = {
        (r["id"], r["cluster_id"])
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_connected_components_vs_union_find(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(500))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(350)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id per component
    comp_min = {}
    for n in nodes:
        comp_min.setdefault(find(n), set()).add(n)
    expected = {
        (n, min(members))
        for members in comp_min.values()
        if len(members) > 1
        for n in members
    }

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["id"], r["cluster_id"])
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == expected


def test_connected_components_long_chain_converges(spark):
    # A 300-node path needs O(diameter) rounds under naive propagation;
    # large-star/small-star must land well inside max_iter.
    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    rows = dedup.connected_components(pairs, max_iter=20).collect()
    assert len(rows) == n + 1
    assert {r["cluster_id"] for r in rows} == {0}


def test_resolve_duplicates_keeps_canonical_and_singletons(spark):
    df = spark.range(0, 25).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    surv = sorted(r["doc_id"] for r in dedup.resolve_duplicates(df, pairs).collect())
    dropped = {2, 3, 4, 5, 11, 12, 21}
    assert surv == sorted(set(range(25)) - dropped)


def test_salted_pair_join_equals_broadcast_path(spark):
    """The size-gated salted shuffle join must produce exactly the same
    pairs as the broadcast path (broadcast_rows=0 forces the salted
    branch)."""
    docs = _docs(spark)
    kw = dict(block_col="lang", n=3, threshold=0.15)
    bc = dedup.ngram_jaccard_pairs(docs, **kw).collect()
    salted = dedup.ngram_jaccard_pairs(docs, broadcast_rows=0, **kw).collect()
    key = lambda r: (r["id_a"], r["id_b"])
    assert sorted(map(key, bc)) == sorted(map(key, salted))
    assert {key(r): r["jaccard"] for r in bc} == {
        key(r): r["jaccard"] for r in salted
    }

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bc_e = dedup.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    salted_e = dedup.embedding_near_dup_pairs(
        emb, threshold=0.4, broadcast_rows=0
    ).collect()
    assert sorted(map(key, bc_e)) == sorted(map(key, salted_e))


def test_connected_components_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches the fixpoint loop to reliable
    checkpoint(); results identical and checkpoint files land there."""
    import os

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    plain = {
        (r["id"], r["cluster_id"])
        for r in dedup.connected_components(pairs).collect()
    }
    ckpt = str(tmp_path / "cc-ckpt")
    reliable = {
        (r["id"], r["cluster_id"])
        for r in dedup.connected_components(pairs, checkpoint_dir=ckpt).collect()
    }
    assert plain == reliable == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }
    # reliable checkpoint files actually landed under the given dir
    found = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert found, "no checkpoint files written to checkpoint_dir"


def test_dedup_against_existing_corpus(spark):
    from sample_dms_s3_kinesis_spark.operators.dedup import dedup_against

    existing = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "alpha"),   # already in existing → dropped
            (11, "gamma"),   # fresh
            (12, "gamma"),   # batch-internal dup → min id survives
            (13, "delta"),   # fresh
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup_against(new, existing).collect())
    assert kept == [11, 13]


def test_band_width_cap_drops_boilerplate_bucket(spark):
    """Adversarial boilerplate corpus: every doc shares band 0 (same
    leading shingle window) but is otherwise unique.  Uncapped, the
    shared bucket alone emits n(n-1)/2 candidate pairs in one join
    task; with the cap below n the bucket is dropped and only pairs
    agreeing on some OTHER band survive — here, none."""
    import pyspark.sql.functions as F  # noqa: F811

    n_docs = 40
    sig_rows = []
    for i in range(n_docs):
        # bands=4, rows=2 → slots 0-1 form band 0 (identical across the
        # corpus = the boilerplate band); remaining slots unique per doc.
        sig_rows.append((i, [7, 7] + [100 * i + j for j in range(6)]))
    sig = spark.createDataFrame(sig_rows, "_id long, _sig array<long>")

    uncapped = dedup._band_candidates(sig, bands=4, rows=2).collect()
    assert len(uncapped) == n_docs * (n_docs - 1) // 2

    capped = dedup._band_candidates(
        sig, bands=4, rows=2, max_band_width=n_docs - 1
    ).collect()
    assert capped == []

    # A cap ABOVE the bucket width changes nothing.
    wide_ok = dedup._band_candidates(
        sig, bands=4, rows=2, max_band_width=n_docs
    ).collect()
    assert len(wide_ok) == len(uncapped)


def test_minhash_cap_preserves_pairs_on_real_corpus(spark):
    """On the fixture corpus (no boilerplate bucket anywhere near the
    default cap), minhash_lsh_pairs with the default cap returns the
    identical pair set as the uncapped run — the cap only bites
    adversarial skew."""
    docs = _docs(spark, n=80)
    kw = dict(num_hashes=32, bands=8, threshold=0.5)
    capped = dedup.minhash_lsh_pairs(docs, **kw).collect()
    uncapped = dedup.minhash_lsh_pairs(docs, max_band_width=None, **kw).collect()
    key = lambda r: (r["id_a"], r["id_b"])
    assert sorted(map(key, capped)) == sorted(map(key, uncapped))


def test_broadcast_pin_skips_sizing_job_and_matches(spark):
    """broadcast=True/False pins must produce the same pairs as the
    size-gated default (the pin's purpose — skipping the eager sizing
    count() — is structural: build_rows stays None, no count runs)."""
    docs = _docs(spark, n=60)
    kw = dict(block_col="lang", n=3, threshold=0.15)
    auto = dedup.ngram_jaccard_pairs(docs, **kw)
    pinned = dedup.ngram_jaccard_pairs(docs, broadcast=True, **kw)
    key = lambda r: (r["id_a"], r["id_b"])
    assert sorted(map(key, auto.collect())) == sorted(map(key, pinned.collect()))

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    auto_e = dedup.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    pinned_e = dedup.embedding_near_dup_pairs(
        emb, threshold=0.4, broadcast=True
    ).collect()
    assert sorted(map(key, auto_e)) == sorted(map(key, pinned_e))


def test_dedup_canonical_priority_survivor(spark):
    """Survivor per content group = lowest (priority, id), not min id."""
    df = spark.createDataFrame(
        [
            (1, "aaa", 2),  # crawl copy, lowest id
            (2, "aaa", 0),  # curated copy → must win despite higher id
            (3, "aaa", 1),
            (4, "bbb", 1),
            (5, "bbb", 1),  # tie on priority → min id 4 wins
            (6, "ccc", 2),  # singleton
        ],
        "doc_id long, text string, prio int",
    )
    out = {
        r["doc_id"]: (r["group_size"], r["src_priority"])
        for r in dedup.dedup_canonical(df, F.col("prio")).collect()
    }
    assert out == {2: (3, 0), 4: (2, 1), 6: (1, 2)}


def test_simhash_chunk_cap_drops_wide_bucket(spark):
    """Identical docs share every chunk; with the cap below the corpus
    size the shared buckets drop and no pairs emerge — while the
    default (None) keeps the exact+complete pigeonhole behavior."""
    docs = spark.createDataFrame(
        [(i, "same exact text for everyone") for i in range(12)],
        "doc_id long, text string",
    )
    full = dedup.simhash_pairs(docs, max_hamming=3).collect()
    assert len(full) == 12 * 11 // 2
    capped = dedup.simhash_pairs(
        docs, max_hamming=3, max_chunk_width=11
    ).collect()
    assert capped == []


def test_minhash_lsh_pairs_against_matches_cross_subset(spark):
    """Cross-corpus pairs must equal exactly the cross-corpus subset of
    the self-join operator run over the union (same hashes, same
    banding) — and the admission gate keeps precisely the unflagged new
    docs."""
    base = _docs(spark, n=60)
    existing = base.filter(F.col("doc_id") < 40)
    # new batch: 10 fresh docs + near-copies of 3 existing docs
    fresh = base.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 50))
    copies = existing.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang"
    )
    new = fresh.unionByName(copies)
    kw = dict(num_hashes=64, bands=16, threshold=0.9)

    got = {
        (r["new_id"], r["existing_id"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs_against(new, existing, **kw).collect()
    }
    union = existing.unionByName(new)
    ref = {
        (r["id_b"], r["id_a"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(union, **kw).collect()
        if r["id_a"] < 1000 and (r["id_b"] >= 1000 or r["id_b"] >= 40)
        # keep only (existing, new) cross pairs: existing ids < 40,
        # new ids are >= 40
        if r["id_a"] < 40 and r["id_b"] >= 40
    }
    assert got == ref
    # the exact copies are flagged at est 1.0
    for i in range(3):
        assert got[(i + 1000, i)] == 1.0

    admitted = {
        r["doc_id"] for r in dedup.near_dedup_against(new, existing, **kw).collect()
    }
    flagged_new = {a for a, _ in got}
    assert admitted == {r["doc_id"] for r in new.collect()} - flagged_new


def test_simhash_pairs_against_matches_cross_subset(spark):
    """Cross-corpus SimHash pairs must equal exactly the cross-corpus
    subset of the self-join operator run over the union (same
    fingerprints, same chunk banding), and the admission gate keeps
    precisely the unflagged new docs."""
    base = _docs(spark, n=60)
    existing = base.filter(F.col("doc_id") < 40)
    # new batch: 10 fresh docs + exact copies of 3 existing docs
    fresh = base.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 50))
    copies = existing.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang"
    )
    new = fresh.unionByName(copies)

    got = {
        (r["new_id"], r["existing_id"]): r["hamming"]
        for r in dedup.simhash_pairs_against(
            new, existing, max_hamming=3
        ).collect()
    }
    union = existing.unionByName(new)
    ref = {
        (r["id_b"], r["id_a"]): r["hamming"]
        for r in dedup.simhash_pairs(union, max_hamming=3).collect()
        # keep only (existing, new) cross pairs: existing < 40, new >= 40
        if r["id_a"] < 40 and r["id_b"] >= 40
    }
    assert got == ref
    # exact copies carry identical fingerprints: hamming 0
    for i in range(3):
        assert got[(i + 1000, i)] == 0

    admitted = {
        r["doc_id"]
        for r in dedup.simhash_dedup_against(
            new, existing, max_hamming=3
        ).collect()
    }
    flagged_new = {a for a, _ in got}
    assert admitted == {r["doc_id"] for r in new.collect()} - flagged_new


def test_simhash_pairs_against_chunk_cap_drops_only_hot_buckets(spark):
    """With max_chunk_width armed, pairs whose every agreeing chunk
    bucket is over-cap disappear; all other pairs survive unchanged."""
    base = _docs(spark, n=40)
    existing = base.filter(F.col("doc_id") < 30)
    new = base.filter(F.col("doc_id") >= 30).unionByName(
        existing.filter(F.col("doc_id") < 2).select(
            (F.col("doc_id") + 500).alias("doc_id"), "text", "lang"
        )
    )
    uncapped = set(
        (r["new_id"], r["existing_id"])
        for r in dedup.simhash_pairs_against(
            new, existing, max_hamming=3
        ).collect()
    )
    # a cap far above any bucket width changes nothing
    wide = set(
        (r["new_id"], r["existing_id"])
        for r in dedup.simhash_pairs_against(
            new, existing, max_hamming=3, max_chunk_width=10_000
        ).collect()
    )
    assert wide == uncapped
    # cap of 0 drops every existing-side bucket -> no pairs at all
    none = dedup.simhash_pairs_against(
        new, existing, max_hamming=3, max_chunk_width=0
    ).collect()
    assert none == []


def test_embedding_near_dup_against_matches_cross_subset(spark):
    """Cross-corpus embedding pairs must equal the cross subset of the
    self-join operator over the union, for both the broadcast and the
    salted-shuffle strategies, and the gate admits the unflagged new
    ids."""
    emb = spark.read.parquet(f"{sf_dir('0.001')}/embeddings.parquet")
    new = emb.filter(F.col("vec_id") % 2 == 1)
    existing = emb.filter(F.col("vec_id") % 2 == 0)

    got = {
        (r["new_id"], r["existing_id"]): r["cosine"]
        for r in dedup.embedding_near_dup_against(
            new, existing, threshold=0.4
        ).collect()
    }
    ref = {
        (r["id_b"], r["id_a"]) if r["id_b"] % 2 == 1 else (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_pairs(emb, threshold=0.4).collect()
        if (r["id_a"] % 2) != (r["id_b"] % 2)  # cross-parity pairs only
    }
    assert got == ref

    # pinned strategies agree
    for pin in (True, False):
        pinned = {
            (r["new_id"], r["existing_id"]): r["cosine"]
            for r in dedup.embedding_near_dup_against(
                new, existing, threshold=0.4, broadcast=pin
            ).collect()
        }
        assert pinned == got, pin

    admitted = {
        r["vec_id"]
        for r in dedup.embedding_dedup_against(
            new, existing, threshold=0.4
        ).collect()
    }
    flagged = {a for a, _ in got}
    assert admitted == {r["vec_id"] for r in new.collect()} - flagged


def test_winnowing_containment_detects_partial_overlap(spark):
    """A doc quoting a long span of another must surface as a
    containment pair even though full-document Jaccard is low; unrelated
    docs must not pair; shared counts match a Python winnowing
    reference."""
    import random

    from sample_dms_s3_kinesis_spark.operators import text as text_ops

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(800)]
    quoted = " ".join(rng.choice(vocab) for _ in range(40))
    doc_a = quoted + " " + " ".join(rng.choice(vocab) for _ in range(160))
    doc_b = " ".join(rng.choice(vocab) for _ in range(50)) + " " + quoted
    doc_c = " ".join(rng.choice(vocab) for _ in range(200))
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )

    out = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.winnowing_containment_pairs(
            df, shingle=8, window=4, min_shared=2
        ).collect()
    }
    assert (1, 2) in out
    assert (1, 3) not in out and (2, 3) not in out

    # shared count equals the intersection of the per-doc fingerprint
    # sets the winnowing operator itself produces
    fps = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id",
            text_ops.winnowed_fingerprints(
                F.col("text"), shingle=8, window=4
            ).alias("fp"),
        ).collect()
    }
    exp_shared = len(fps[1] & fps[2])
    row = out[(1, 2)]
    assert row["shared"] == exp_shared
    assert row["containment"] == round(
        exp_shared / min(len(fps[1]), len(fps[2])), 6
    )


def test_winnowing_containment_fp_cap_drops_boilerplate(spark):
    """A fingerprint shared by every doc (license header) exceeds the
    cap and is excluded from pairing; pairs supported only by it
    disappear."""
    header = " ".join(f"lic{i}" for i in range(12))
    rows = [(i, header + f" body{i} " + " ".join(f"x{i}_{j}" for j in range(20)))
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: the shared header pairs everything
    full = dedup.winnowing_containment_pairs(
        df, shingle=6, window=3, min_shared=1, max_fp_width=None
    ).count()
    assert full > 0
    # cap below corpus size: header fingerprints (width 8) are dropped
    capped = dedup.winnowing_containment_pairs(
        df, shingle=6, window=3, min_shared=1, max_fp_width=7
    ).count()
    assert capped == 0


def test_connected_components_driver_gate_equals_distributed(spark):
    """The size-gated driver union-find must produce EXACTLY the
    distributed large-star/small-star labeling (min id per component),
    including chains and multi-component graphs."""
    from sample_dms_s3_kinesis_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (5, 1)],
        "id_a long, id_b long",
    )
    fast = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist
    assert fast == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


# ------------------------------------------------ edit-distance join

def _lev(a, b):
    m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        m[i][0] = i
    for j in range(len(b) + 1):
        m[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            m[i][j] = min(
                m[i - 1][j] + 1,
                m[i][j - 1] + 1,
                m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return m[len(a)][len(b)]


def _ed_brute(docs, k):
    import itertools

    return sorted(
        (a, b, _lev(ta, tb))
        for (a, ta), (b, tb) in itertools.combinations(docs, 2)
        if _lev(ta, tb) <= k
    )


def test_edit_distance_pairs_matches_brute_force(spark):
    docs = [
        (1, "hello world"),
        (2, "hello worlds"),
        (3, "hxllo world"),
        (4, "completely different text"),
        (5, "ab"), (6, "ac"), (7, ""),          # short-string branch
        (8, "hello wxrld"),
        (9, "abcabcabc"), (10, "abcabcabcx"),   # repeated grams (multiset)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in dedup.edit_distance_pairs(df, k=2, q=3).collect()
    )
    assert got == _ed_brute(docs, 2)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=12),
        min_size=2,
        max_size=8,
        unique=True,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_edit_distance_pairs_property(spark, texts, k):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in dedup.edit_distance_pairs(df, k=k, q=3).collect()
    )
    assert got == _ed_brute(docs, k)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=10),
        min_size=1, max_size=5, unique=True,
    ),
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=10),
        min_size=1, max_size=5, unique=True,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_edit_distance_against_property(spark, new_texts, old_texts, kk):
    new = [(100 + i, s) for i, s in enumerate(new_texts)]
    old = [(i, s) for i, s in enumerate(old_texts)]
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    odf = spark.createDataFrame(old, "doc_id long, text string")
    got = sorted(
        tuple(r)
        for r in dedup.edit_distance_pairs_against(
            ndf, odf, k=kk, q=3
        ).collect()
    )
    exp = sorted(
        (a, b, _lev(ta, tb))
        for (a, ta) in new
        for (b, tb) in old
        if _lev(ta, tb) <= kk
    )
    assert got == exp


def test_connected_components_driver_gate_is_logged(spark, caplog):
    """The silent-gate wart from the r5 verdict: when the driver
    union-find path engages, a log line must say so (and name the
    threshold) so a caller profiling the small case knows the plan
    changes at scale."""
    import logging

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    with caplog.at_level(
        logging.INFO, logger="sample_dms_s3_kinesis_spark.dedup"
    ):
        dedup.connected_components(pairs).collect()
    assert any("driver_threshold" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(
        logging.INFO, logger="sample_dms_s3_kinesis_spark.dedup"
    ):
        dedup.connected_components(pairs, driver_threshold=0).collect()
    assert not any("driver_threshold" in r.message for r in caplog.records)


def test_edit_distance_short_pass_is_hash_join(spark):
    """r5 advice (medium): the short-string passes used a pure theta
    join (id order + |len| band) that Spark plans as a
    broadcast-nested-loop — O(shorts x corpus).  The r6 rework
    explodes each short row to its 2k+1 admissible partner lengths
    and equi-joins on the band, so the executed plan must contain NO
    nested-loop/cartesian join anywhere."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["ab", "abc", "abd", "xyz", "a much longer document body",
             "a much longer document bod", "zz", ""]
        )],
        "doc_id long, text string",
    )
    out = dedup.edit_distance_pairs(docs, k=1, q=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # brute-force reference
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    texts = dict(enumerate(
        ["ab", "abc", "abd", "xyz", "a much longer document body",
         "a much longer document bod", "zz", ""]
    ))
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(texts), 2)
        if lev(texts[a], texts[b]) <= 1
    }
    assert got == want

    against = dedup.edit_distance_pairs_against(
        docs.filter(F.col("doc_id") < 3), docs, k=1, q=3
    )
    plan2 = against._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan2 and "Cartesian" not in plan2


def test_short_docs_are_not_mutual_near_dups(spark):
    """r6 review: docs with fewer than n tokens have no shingles; the
    per-slot sentinel used to make ALL of them mutual near-dups with
    est_jaccard 1.0 (and one quadratic band bucket).  They now have
    NULL signatures and never band."""
    df = spark.createDataFrame(
        [(1, "hi there"), (2, "goodbye cruel"), (3, "totally different"),
         (4, "a much longer document with plenty of shingles inside it"),
         (5, "a much longer document with plenty of shingles inside it")],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_lsh_pairs(df, num_hashes=32, bands=8, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(4, 5)}           # only the true duplicates
    # incremental flavor: a short new doc is never flagged against a
    # short existing doc
    flagged = dedup.minhash_lsh_pairs_against(
        df.filter(F.col("doc_id") == 1), df.filter(F.col("doc_id") == 2),
        num_hashes=32, bands=8, threshold=0.5,
    )
    assert flagged.count() == 0


def test_band_geometry_is_validated(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bands must divide"):
        dedup.minhash_lsh_pairs(df, num_hashes=8, bands=16)
    with pytest.raises(ValueError, match="bands must divide"):
        dedup.minhash_lsh_pairs(df, num_hashes=100, bands=32)


def test_dedup_canonical_null_priority_ranks_last(spark):
    """r6 review: a NULL priority used to WIN survivor selection
    (struct min sorts NULL first) while src_priority reported the
    non-null min — survivor and reported priority disagreed."""
    df = spark.createDataFrame(
        [(10, "same text", None), (20, "same text", 5)],
        "doc_id long, text string, prio int",
    )
    out = dedup.dedup_canonical(df, F.col("prio")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 20 and r["src_priority"] == 5


def test_minhash_md5_signature_matches_python_reference(spark):
    """The md5 hash family must compute exactly the signature a
    straight Python transcription computes — this is the property the
    DuckDB oracle for q_minhash_md5_pairs relies on (base = first 16
    md5 hex chars per shingle, slot i = lexicographic min of
    md5(base || ':i'), NULL for shingle-less docs)."""
    import hashlib

    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "the quick  brown fox   jumps over a lazy cat"),
        (3, "too short"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["sig"]
        for r in df.select(
            "doc_id",
            dedup.minhash_signature(
                F.col("text"), num_hashes=8, hash_family="md5"
            ).alias("sig"),
        ).collect()
    }

    def ref(text):
        if text is None:
            return None
        toks = text.strip().lower().split()
        if len(toks) < 3:
            return None
        grams = list(
            dict.fromkeys(
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            )
        )
        hs = [hashlib.md5(g.encode()).hexdigest()[:16] for g in grams]
        return [
            min(hashlib.md5(f"{h}:{i}".encode()).hexdigest() for h in hs)
            for i in range(8)
        ]

    for doc_id, text in rows:
        assert got[doc_id] == ref(text), doc_id


def test_minhash_md5_pairs_agree_with_bruteforce_model(spark):
    """md5-family LSH pairs equal a pure-Python model of the same
    pipeline (signatures → band buckets → candidates → estimate)."""
    import hashlib

    corpus = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight nine"),
        (4, "alpha beta gamma delta epsilon zeta eta theta"),
        (5, "completely different words entirely here now ok"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): round(r["est_jaccard"], 6)
        for r in dedup.minhash_lsh_pairs(
            df, num_hashes=12, bands=4, threshold=0.5, hash_family="md5"
        ).collect()
    }

    def sig(text):
        toks = text.strip().lower().split()
        grams = list(
            dict.fromkeys(
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            )
        )
        if not grams:
            return None
        hs = [hashlib.md5(g.encode()).hexdigest()[:16] for g in grams]
        return [
            min(hashlib.md5(f"{h}:{i}".encode()).hexdigest() for h in hs)
            for i in range(12)
        ]

    sigs = {i: sig(t) for i, t in corpus}
    want = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        sa, sb = sigs[a], sigs[b]
        if sa is None or sb is None:
            continue
        shares_band = any(
            hashlib.md5(",".join(sa[k * 3 : k * 3 + 3]).encode()).hexdigest()
            == hashlib.md5(",".join(sb[k * 3 : k * 3 + 3]).encode()).hexdigest()
            for k in range(4)
        )
        if not shares_band:
            continue
        est = sum(x == y for x, y in zip(sa, sb)) / 12.0
        if est >= 0.5:
            want[(a, b)] = round(est, 6)
    assert got == want and want  # non-vacuous: the dup pair must appear


def test_simhash_md5_fingerprint_matches_python_reference(spark):
    """md5-family SimHash bits must equal a hashlib transcription —
    the property q_simhash_md5_pairs's DuckDB oracle (nibble-wise bit
    extraction) relies on."""
    import hashlib

    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id",
            dedup.simhash(F.col("text"), hash_family="md5").alias("fp"),
        ).collect()
    }

    def ref(text):
        toks = list(dict.fromkeys(text.strip().lower().split()))
        hs = [
            int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in toks
        ]
        fp = 0
        for j in range(64):
            if 2 * sum((h >> j) & 1 for h in hs) > len(hs):
                fp |= 1 << j
        return fp - (1 << 64) if fp >= (1 << 63) else fp  # signed long

    for doc_id, text in rows:
        assert got[doc_id] == ref(text), doc_id


def test_simhash_null_text_gives_null_fingerprint_and_no_pairs(spark):
    """NULL-text docs must not collapse to fingerprint 0 and pair with
    each other at hamming 0 (the DuckDB oracle for the md5 flavor drops
    NULL docs, so Spark must too)."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "some real text here ok then")],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", dedup.simhash(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[1] is None and fps[2] is None and fps[3] is not None
    assert dedup.simhash_pairs(df, max_hamming=3).count() == 0


def test_unknown_hash_family_raises(spark):
    import pytest as _pytest

    from sample_dms_s3_kinesis_spark.operators import text as _text

    for fn in (
        lambda: dedup.minhash_signature(F.col("text"), hash_family="Md5"),
        lambda: dedup.simhash(F.col("text"), hash_family="sha1"),
        lambda: _text.rolling_hashes(F.col("text"), hash_family="MD5"),
    ):
        with _pytest.raises(ValueError, match="hash_family"):
            fn()


def test_xxh64_numpy_replica_matches_spark_xxhash64(spark):
    """The vectorized minhash signature path claims a bit-exact NumPy
    replica of Spark's XxHash64 (one-long block seeded 42, then the
    4-byte-int tail seeded with the previous hash).  Pin it against
    F.xxhash64 for random longs, the extremes, and every slot index the
    default geometries use — any drift would silently change every
    xxhash64-family signature."""
    import random

    import numpy as np

    from sample_dms_s3_kinesis_spark.operators.dedup import (
        _XXH_SEED,
        _xxh64_int,
        _xxh64_long,
    )

    random.seed(7)
    vals = [random.randint(-(2**63), 2**63 - 1) for _ in range(200)] + [
        0, 1, -1, 2**63 - 1, -(2**63)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "h long")
    v = np.array(vals, dtype=np.int64).view(np.uint64)
    got1 = [r[0] for r in df.select(F.xxhash64(F.col("h"))).collect()]
    mine1 = _xxh64_long(v, np.uint64(_XXH_SEED)).view(np.int64)
    assert [int(x) for x in mine1] == got1
    for i in (0, 1, 31, 63, 127):
        got2 = [r[0] for r in df.select(F.xxhash64(F.col("h"), F.lit(i))).collect()]
        mine2 = _xxh64_int(i, _xxh64_long(v, np.uint64(_XXH_SEED))).view(np.int64)
        assert [int(x) for x in mine2] == got2, f"slot {i}"


def test_minhash_sig_frame_matches_expression_form(spark):
    """_minhash_sig_frame (vectorized mapInPandas scan path) must give
    the identical signatures, NULL-for-no-shingles included, as the
    _signature_from_hashes expression form it replaces — and must stay
    re-executable (Spark 4.1 loses the ArrowEvalPython extraction when
    an array-returning Column-level pandas UDF plan is re-executed;
    mapInPandas must not regress the same way)."""
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        _gram_hashes,
        _minhash_sig_frame,
        _signature_from_hashes,
        token_ngrams,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "short"),
        (3, None),
        (4, ""),
        (5, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    gh = df.select(
        F.col("doc_id").alias("_id"),
        _gram_hashes(token_ngrams(F.col("text"))).alias("_gh"),
    )
    expr = {
        r["_id"]: r["_sig"]
        for r in gh.select(
            "_id",
            _signature_from_hashes(F.col("_gh"), num_hashes=16).alias("_sig"),
        ).collect()
    }
    for _ in range(2):  # re-execution must not lose the Python node
        vec = {
            r["_id"]: r["_sig"]
            for r in _minhash_sig_frame(gh, num_hashes=16).collect()
        }
        assert vec == expr


def test_vectorized_udf_row_slicing_is_value_transparent(spark):
    """The bounded row-slicing inside the vectorized signature/pack
    UDFs (the OOM guard for batches of very long documents) must not
    change a single value: force multi-slice execution with a tiny
    token_chunk and compare against the single-slice result."""
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        _gram_hashes,
        _minhash_sig_frame,
        _simhash_from_hashes,
        _token_hashes,
        token_ngrams,
    )

    rows = [(i, f"token{i} " * (3 + i % 7) + "shared words here") for i in range(20)]
    rows += [(99, None), (100, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    gh = df.select(
        F.col("doc_id").alias("_id"),
        _gram_hashes(token_ngrams(F.col("text"))).alias("_gh"),
    )
    one = {r["_id"]: r["_sig"] for r in _minhash_sig_frame(gh, num_hashes=8).collect()}
    many = {
        r["_id"]: r["_sig"]
        for r in _minhash_sig_frame(gh, num_hashes=8, token_chunk=3).collect()
    }
    assert many == one
    th = df.select("doc_id", _token_hashes(F.col("text")).alias("_th"))
    one_sh = {
        r["doc_id"]: r["fp"]
        for r in th.select(
            "doc_id", _simhash_from_hashes(F.col("_th")).alias("fp")
        ).collect()
    }
    many_sh = {
        r["doc_id"]: r["fp"]
        for r in th.select(
            "doc_id",
            _simhash_from_hashes(F.col("_th"), token_chunk=3).alias("fp"),
        ).collect()
    }
    assert many_sh == one_sh
