"""Property-based tests (hypothesis) for the round-5 operators:
corpus_diff partition/conservation laws and weighted-sample selection
laws over randomized snapshots — the shapes example-based tests only
sample."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sample_dms_s3_kinesis_spark.operators.sampling import weighted_sample
from sample_dms_s3_kinesis_spark.operators.versioning import corpus_diff

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=30),
    st.text(alphabet="abc ", min_size=0, max_size=8),
    max_size=12,
)


@_slow
@given(old=snapshot, new=snapshot)
def test_corpus_diff_partitions_the_id_space(spark, old, new):
    o = spark.createDataFrame(
        list(old.items()) or [(None, None)], "doc_id long, text string"
    ).filter("doc_id is not null")
    n = spark.createDataFrame(
        list(new.items()) or [(None, None)], "doc_id long, text string"
    ).filter("doc_id is not null")
    got = {r["doc_id"]: r["change"] for r in corpus_diff(o, n).collect()}
    # exactly one row per id in either snapshot
    assert set(got) == set(old) | set(new)
    for i, ch in got.items():
        if i not in old:
            assert ch == "added"
        elif i not in new:
            assert ch == "removed"
        elif old[i] == new[i]:
            assert ch == "unchanged"
        else:
            assert ch == "changed"


weights = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100),
        st.one_of(
            st.none(),
            st.floats(
                min_value=-5, max_value=50, allow_nan=False, allow_infinity=False
            ),
        ),
    ),
    max_size=15,
    unique_by=lambda t: t[0],
)


@_slow
@given(rows=weights, k=st.integers(min_value=1, max_value=6), seed=st.integers(0, 9))
def test_weighted_sample_selection_laws(spark, rows, k, seed):
    df = spark.createDataFrame(rows or [(None, None)], "id long, w double").filter(
        "id is not null"
    )
    got = [
        r["id"]
        for r in weighted_sample(
            df, id_col="id", weight_col="w", k=k, seed=seed
        ).collect()
    ]
    positive = {i for i, w in rows if w is not None and w > 0}
    # no duplicates, only positive-weight rows, exactly min(k, |positive|)
    assert len(got) == len(set(got)) == min(k, len(positive))
    assert set(got) <= positive
    # matches the A-Res reference ranking exactly
    keyed = sorted(
        (
            (
                (
                    (int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16) + 0.5)
                    / 16**8
                )
                ** (1.0 / w),
                -i,
                i,
            )
            for i, w in rows
            if w is not None and w > 0
        ),
        reverse=True,
    )
    assert set(got) == {t[2] for t in keyed[:k]}


corpus = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),
        st.text(alphabet="ab ", min_size=0, max_size=24),
    ),
    max_size=10,
    unique_by=lambda t: t[0],
)


@_slow
@given(rows=corpus, tau=st.sampled_from([0.34, 0.5, 0.75, 1.0]))
def test_prefix_jaccard_equals_brute_force_on_random_corpora(spark, rows, tau):
    from sample_dms_s3_kinesis_spark.operators.dedup import prefix_jaccard_pairs

    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id long, text string"
    ).filter("doc_id is not null")
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_jaccard_pairs(df, threshold=tau).collect()
    }
    sets = {
        i: set(t.lower().split())
        for i, t in rows
        if set(t.lower().split()) - {""}
    }
    sets = {i: s - {""} for i, s in sets.items() if s - {""}}
    exp = set()
    ids = sorted(sets)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter and inter / union >= tau:
                exp.add((a, b))
    assert got == exp


@_slow
@given(rows=corpus, tau=st.sampled_from([0.4, 0.8, 1.0]))
def test_token_cosine_equals_brute_force_on_random_corpora(spark, rows, tau):
    import math
    from collections import Counter

    from sample_dms_s3_kinesis_spark.operators.dedup import token_cosine_pairs

    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id long, text string"
    ).filter("doc_id is not null")
    got = {
        (r["id_a"], r["id_b"])
        for r in token_cosine_pairs(df, threshold=tau).collect()
    }
    vecs = {}
    for i, t in rows:
        c = Counter(w for w in t.lower().strip().split() if w)
        if c:
            vecs[i] = c
    exp = set()
    ids = sorted(vecs)
    for x, a in enumerate(ids):
        va = vecs[a]
        na = math.sqrt(sum(v * v for v in va.values()))
        for b in ids[x + 1:]:
            vb = vecs[b]
            dot = sum(va[t] * vb[t] for t in va if t in vb)
            if dot and dot / (na * math.sqrt(sum(v * v for v in vb.values()))) >= tau:
                exp.add((a, b))
    assert got == exp


sig64 = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
    ),
    max_size=12,
    unique_by=lambda t: t[0],
)


@_slow
@given(sigs=sig64, h=st.integers(min_value=0, max_value=3))
def test_hamming_pairs_equals_brute_force(spark, sigs, h):
    """The shared hamming tail (SimHash text dedup + image/audio
    perceptual hashes) is exact and complete for max_hamming <= 3 —
    the 4x16-bit pigeonhole bound — on arbitrary signatures."""
    from sample_dms_s3_kinesis_spark.operators.dedup import hamming_pairs

    df = spark.createDataFrame(
        sigs or [(None, None)], "_id long, _sh long"
    ).filter("_id is not null")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(df, max_hamming=h).collect()
    }
    exp = set()
    ids = sorted(dict(sigs))
    vals = dict(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((vals[a] ^ vals[b]) & (2**64 - 1)).count("1")
            if d <= h:
                exp.add((a, b, d))
    assert got == exp


@_slow
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.sampled_from(["en", "fr", "de"]),
            st.integers(min_value=1, max_value=40),
        ),
        max_size=18,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=4),
    seed=st.integers(0, 5),
)
def test_weighted_sample_per_group_laws(spark, rows, k, seed):
    """Grouped A-Res: per group, exactly min(k, group size) rows, and
    the selection matches the per-group reference ranking."""
    from collections import Counter

    from sample_dms_s3_kinesis_spark.operators.sampling import (
        weighted_sample_per_group,
    )
    from tests.test_versioning_ops import _ares_reference

    df = spark.createDataFrame(
        rows or [(None, None, None)], "id long, g string, w long"
    ).filter("id is not null")
    got = [
        (r["id"], r["g"])
        for r in weighted_sample_per_group(
            df, group_cols="g", id_col="id", weight_col="w", k=k, seed=seed
        ).collect()
    ]
    assert len(got) == len(set(got))
    by_g: dict = {}
    for i, g, w in rows:
        by_g.setdefault(g, []).append((i, w))
    per = Counter(g for _, g in got)
    exp = set()
    for g, items in by_g.items():
        assert per[g] == min(k, len(items))
        exp |= {(i, g) for i in _ares_reference(items, k=k, seed=seed)}
    assert set(got) == exp


@_slow
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    bounds=st.tuples(
        st.floats(min_value=0.0, max_value=0.4),
        st.floats(min_value=0.6, max_value=1.0),
    ),
)
def test_winsorize_laws(spark, vals, bounds):
    """Winsorize: row count preserved, NULLs stay NULL, non-null
    outputs clamped exactly to the NumPy linear percentiles."""
    import numpy as np

    from sample_dms_s3_kinesis_spark.operators.profiling import winsorize

    lo, hi = bounds
    df = spark.createDataFrame(vals, "id long, v long")
    out = {r["id"]: r["v_w"] for r in winsorize(df, "v", lower=lo, upper=hi).collect()}
    assert len(out) == len(vals)
    nonnull = [w for _, w in vals if w is not None]
    if nonnull:
        p_lo = float(np.percentile(nonnull, lo * 100, method="linear"))
        p_hi = float(np.percentile(nonnull, hi * 100, method="linear"))
    for i, w in vals:
        if w is None:
            assert out[i] is None
        else:
            assert abs(out[i] - min(max(float(w), p_lo), p_hi)) < 1e-9


# --- segment-level dedup laws ---------------------------------------

_seg_corpus = st.dictionaries(
    st.integers(min_value=0, max_value=20),
    # tiny alphabet + short docs force cross-doc segment collisions
    st.lists(st.sampled_from(["aa", "bb", "Cc"]), max_size=7).map(" ".join),
    max_size=8,
)


def _segments_of(text, width):
    toks = text.strip().split()
    segs = []
    pos = 0
    while pos * width < len(toks) or (pos == 0 and not toks):
        seg = " ".join(toks[pos * width : pos * width + width])
        if seg:
            segs.append((pos, seg))
        pos += 1
        if pos * width >= len(toks):
            break
    return segs


def _dedup_segments_model(docs, width, corpus_keys=frozenset()):
    """keep-first over lowered segment keys, minimal (doc_id, pos)
    first; ``corpus_keys`` pre-bans keys (the *_against flavor)."""
    occ = [
        (d, p, s)
        for d, t in docs.items()
        for p, s in _segments_of(t, width)
    ]
    first = {}
    for d, p, s in sorted(occ):
        if s.lower() not in corpus_keys:
            first.setdefault(s.lower(), (d, p))
    out = {}
    for d, t in docs.items():
        mine = [(p, s) for dd, p, s in occ if dd == d]
        kept = [
            s for p, s in sorted(mine)
            if first.get(s.lower()) == (d, p)
        ]
        out[d] = (" ".join(kept), len(mine) - len(kept))
    return out


@_slow
@given(docs=_seg_corpus)
def test_dedup_segments_matches_model(spark, docs):
    from sample_dms_s3_kinesis_spark.operators.curation import dedup_segments

    df = spark.createDataFrame(
        list(docs.items()) or [(None, None)], "doc_id long, text string"
    ).filter("doc_id is not null")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup_segments(df, width=2).collect()
    }
    assert got == _dedup_segments_model(docs, 2)


@_slow
@given(new=_seg_corpus, existing=_seg_corpus)
def test_dedup_segments_against_matches_model(spark, new, existing):
    from sample_dms_s3_kinesis_spark.operators.curation import (
        dedup_segments_against,
    )

    n_df = spark.createDataFrame(
        list(new.items()) or [(None, None)], "doc_id long, text string"
    ).filter("doc_id is not null")
    e_df = spark.createDataFrame(
        list(existing.items()) or [(None, None)], "doc_id long, text string"
    ).filter("doc_id is not null")
    corpus_keys = frozenset(
        s.lower()
        for t in existing.values()
        for _, s in _segments_of(t, 2)
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup_segments_against(n_df, e_df, width=2).collect()
    }
    assert got == _dedup_segments_model(new, 2, corpus_keys)
