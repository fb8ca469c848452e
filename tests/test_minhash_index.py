"""MinhashIndex: the persisted admission gate must make IDENTICAL
decisions to the recompute-everything operator, survive a save/load
roundtrip, and grow idempotently."""

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.dedup import (
    MinhashIndex,
    minhash_lsh_pairs_against,
)

from tdata import sf_dir

SF_DIR = sf_dir("0.001")


def _halves(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )


def _pairs_set(df):
    return {
        (r["new_id"], r["existing_id"], r["est_jaccard"]) for r in df.collect()
    }


def test_index_gate_equals_recompute_operator(spark):
    existing, new = _halves(spark)
    idx = MinhashIndex.build(existing, num_hashes=64, bands=16)
    got = _pairs_set(idx.pairs_against(new, threshold=0.5))
    exp = _pairs_set(
        minhash_lsh_pairs_against(
            new, existing, num_hashes=64, bands=16, threshold=0.5
        )
    )
    assert got == exp and len(got) > 0


def test_index_save_load_roundtrip(spark, tmp_path):
    existing, new = _halves(spark)
    idx = MinhashIndex.build(existing, num_hashes=64, bands=16)
    path = str(tmp_path / "mh-index")
    idx.save(path)
    loaded = MinhashIndex.load(spark, path)
    assert (loaded.num_hashes, loaded.bands, loaded.id_col) == (64, 16, "doc_id")
    assert _pairs_set(loaded.pairs_against(new, threshold=0.5)) == _pairs_set(
        idx.pairs_against(new, threshold=0.5)
    )


def test_admit_drops_exactly_the_matched_new_ids(spark):
    existing, new = _halves(spark)
    idx = MinhashIndex.build(existing, num_hashes=64, bands=16)
    matched = {
        r["new_id"]
        for r in idx.pairs_against(new, threshold=0.5).collect()
    }
    admitted = {r["doc_id"] for r in idx.admit(new, threshold=0.5).collect()}
    all_new = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert admitted == all_new - matched and len(matched) > 0


def test_add_grows_index_and_is_idempotent(spark):
    existing, new = _halves(spark)
    idx = MinhashIndex.build(existing, num_hashes=64, bands=16)
    n0 = idx.signatures.count()
    admitted = idx.admit(new, threshold=0.5)
    grown = idx.add(admitted)
    assert grown.signatures.count() == n0 + admitted.count()
    # replaying the same batch must not duplicate signatures
    again = grown.add(admitted)
    assert again.signatures.count() == grown.signatures.count()
    # a doc admitted into the index is now a near-dup of itself
    one = admitted.limit(1)
    hits = grown.pairs_against(one, threshold=0.99).collect()
    one_id = one.collect()[0]["doc_id"]
    assert any(r["existing_id"] == r["new_id"] == one_id for r in hits)


def test_index_rejects_bad_band_shape(spark):
    existing, _ = _halves(spark)
    try:
        MinhashIndex.build(existing, num_hashes=64, bands=10)
        assert False, "expected ValueError"
    except ValueError:
        pass


# ------------------------------------------ prefix-filter Jaccard join

def _brute_jaccard(rows, tau):
    sets = {r["doc_id"]: set(r["text"].lower().split()) for r in rows}
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            jac = inter / (len(sets[a]) + len(sets[b]) - inter)
            if jac >= tau:
                out.add((a, b, round(jac, 6)))
    return out


def test_prefix_jaccard_exact_vs_brute_force(spark):
    from sample_dms_s3_kinesis_spark.operators.dedup import prefix_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for tau in (0.9, 0.7):
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in prefix_jaccard_pairs(docs, threshold=tau).collect()
        }
        exp = _brute_jaccard(docs.collect(), tau)
        assert got == exp, f"tau={tau}: {len(got)} vs {len(exp)}"
        assert len(exp) > 0


def test_prefix_jaccard_rejects_bad_threshold(spark):
    from sample_dms_s3_kinesis_spark.operators.dedup import prefix_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    try:
        prefix_jaccard_pairs(docs, threshold=0.0)
        assert False
    except ValueError:
        pass


def test_lsh_quality_report_bounds(spark):
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        lsh_quality_report,
        minhash_lsh_pairs,
        prefix_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    row = lsh_quality_report(
        docs, threshold=0.5, num_hashes=64, bands=16, shingle=3
    ).collect()[0]
    # the exact side is the SAME shingle similarity the minhash stack
    # fingerprints — counts must agree with the standalone operators
    assert row["exact_pairs"] == prefix_jaccard_pairs(
        docs, threshold=0.5, shingle=3
    ).count()
    assert row["lsh_pairs"] == minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, threshold=0.5
    ).count()
    assert 0 <= row["true_positive"] <= min(row["exact_pairs"], row["lsh_pairs"])
    if row["lsh_pairs"]:
        assert 0.0 <= row["precision"] <= 1.0
    # at r=4 rows/band and 16 bands the s-curve at s=0.5 passes ~64%
    # of true pairs into candidacy; a collapsed-join bug would read ~0
    assert row["exact_pairs"] > 0
    assert row["recall"] is not None and row["recall"] >= 0.2


def _brute_shingle_jaccard(rows, tau, n=3):
    def shingles(text):
        tk = text.lower().strip().split()
        return {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}

    sets = {r["doc_id"]: shingles(r["text"]) for r in rows}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            if not inter:
                continue
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= tau:
                out.add((a, b, round(jac, 6)))
    return out


def test_prefix_jaccard_shingle_mode_vs_brute_force(spark):
    from sample_dms_s3_kinesis_spark.operators.dedup import prefix_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in prefix_jaccard_pairs(docs, threshold=0.4, shingle=3).collect()
    }
    exp = _brute_shingle_jaccard(docs.collect(), 0.4)
    assert got == exp and len(exp) > 0


# ------------------------------------------- exact term-vector cosine

def _brute_token_cosine(rows, tau, binary):
    import math
    from collections import Counter

    vecs = {}
    for r in rows:
        cnt = Counter(r["text"].lower().strip().split())
        if binary:
            cnt = Counter(set(cnt))
        vecs[r["doc_id"]] = cnt
    out = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        va = vecs[a]
        na = math.sqrt(sum(c * c for c in va.values()))
        for b in ids[i + 1:]:
            vb = vecs[b]
            dot = sum(va[t] * vb[t] for t in va if t in vb)
            if not dot:
                continue
            nb = math.sqrt(sum(c * c for c in vb.values()))
            cos = dot / (na * nb)
            if cos >= tau:
                out.add((a, b, round(cos, 6)))
    return out


def test_token_cosine_exact_both_modes(spark):
    from sample_dms_s3_kinesis_spark.operators.dedup import token_cosine_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = docs.collect()
    for binary in (False, True):
        got = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in token_cosine_pairs(
                docs, threshold=0.9, binary=binary
            ).collect()
        }
        exp = _brute_token_cosine(rows, 0.9, binary)
        assert got == exp, f"binary={binary}: {len(got)} vs {len(exp)}"
        assert len(exp) > 0


def test_simhash_quality_report_bounds(spark):
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        simhash_pairs,
        simhash_quality_report,
        token_cosine_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    row = simhash_quality_report(docs, max_hamming=8, threshold=0.95).collect()[0]
    assert row["exact_pairs"] == token_cosine_pairs(
        docs, threshold=0.95, binary=True
    ).count()
    assert row["simhash_pairs"] == simhash_pairs(docs, max_hamming=8).count()
    assert 0 <= row["true_positive"] <= min(row["exact_pairs"], row["simhash_pairs"])
    if row["simhash_pairs"]:
        assert 0.0 <= row["precision"] <= 1.0
    if row["exact_pairs"]:
        assert 0.0 <= row["recall"] <= 1.0


# ------------------------------------------------ persisted simhash index

def test_simhash_index_matches_recompute_and_roundtrips(spark, tmp_path):
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        SimhashIndex,
        simhash_pairs_against,
    )

    existing, new = _halves(spark)
    idx = SimhashIndex.build(existing)
    got = {
        (r["new_id"], r["existing_id"], r["hamming"])
        for r in idx.pairs_against(new, max_hamming=8).collect()
    }
    exp = {
        (r["new_id"], r["existing_id"], r["hamming"])
        for r in simhash_pairs_against(new, existing, max_hamming=8).collect()
    }
    assert got == exp and len(got) > 0
    path = str(tmp_path / "sh-index")
    idx.save(path)
    loaded = SimhashIndex.load(spark, path)
    assert {
        (r["new_id"], r["existing_id"])
        for r in loaded.pairs_against(new, max_hamming=8).collect()
    } == {(a, b) for a, b, _ in exp}
    # admit/add: replay-idempotent growth
    admitted = loaded.admit(new, max_hamming=8)
    grown = loaded.add(admitted)
    assert grown.signatures.count() == existing.count() + admitted.count()
    assert grown.add(admitted).signatures.count() == grown.signatures.count()


def test_prefix_jaccard_against_equals_cross_brute_force(spark):
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        prefix_jaccard_pairs_against,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from pyspark.sql import functions as F

    existing = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    for tau in (0.9, 0.7):
        got = {
            (r["new_id"], r["existing_id"], r["jaccard"])
            for r in prefix_jaccard_pairs_against(
                new, existing, threshold=tau
            ).collect()
        }
        sets = {
            r["doc_id"]: set(r["text"].lower().split()) for r in docs.collect()
        }
        exp = set()
        for a in sets:
            if a % 2 == 0:
                continue
            for b in sets:
                if b % 2 == 1:
                    continue
                inter = len(sets[a] & sets[b])
                if not inter:
                    continue
                jac = inter / (len(sets[a]) + len(sets[b]) - inter)
                if jac >= tau:
                    exp.add((a, b, round(jac, 6)))
        assert got == exp, f"tau={tau}: {len(got)} vs {len(exp)}"
        assert len(exp) > 0


def test_token_cosine_against_equals_cross_brute_force(spark):
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.operators.dedup import (
        token_cosine_pairs_against,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    got = {
        (r["new_id"], r["existing_id"], r["cosine"])
        for r in token_cosine_pairs_against(
            new, existing, threshold=0.9
        ).collect()
    }
    vecs = {
        r["doc_id"]: Counter(w for w in r["text"].lower().strip().split() if w)
        for r in docs.collect()
    }
    exp = set()
    for a, va in vecs.items():
        if a % 2 == 0 or not va:
            continue
        na = math.sqrt(sum(v * v for v in va.values()))
        for b, vb in vecs.items():
            if b % 2 == 1 or not vb:
                continue
            dot = sum(va[t] * vb[t] for t in va if t in vb)
            if not dot:
                continue
            cos = dot / (na * math.sqrt(sum(v * v for v in vb.values())))
            if cos >= 0.9:
                exp.add((a, b, round(cos, 6)))
    assert got == exp and len(exp) > 0


def test_winnowing_containment_against_equals_self_join_subset(spark):
    """The cross gate must equal the cross subset of the self-join
    operator (same fingerprints, same counting) with no self-pairs."""
    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.operators.dedup import (
        winnowing_containment_against,
        winnowing_containment_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    got = {
        (r["new_id"], r["existing_id"], r["shared"], r["containment"])
        for r in winnowing_containment_against(
            new, existing, shingle=6, window=4, min_shared=3
        ).collect()
    }
    full = winnowing_containment_pairs(
        docs, shingle=6, window=4, min_shared=3
    ).collect()
    exp = set()
    for r in full:
        a, b = r["id_a"], r["id_b"]
        # self-join emits id_a < id_b; the cross gate emits (new, existing)
        if a % 2 == 1 and b % 2 == 0:
            exp.add((a, b, r["shared"], r["containment"]))
        elif b % 2 == 1 and a % 2 == 0:
            exp.add((b, a, r["shared"], r["containment"]))
    assert got == exp and len(exp) > 0
