"""Record linkage vs a pure-Python reference."""

import pytest
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import linkage


ROWS = [
    # (id, city, name) — city is the blocking key
    (1, "springfield", "john smith"),
    (2, "springfield", "jon smith"),     # lev 1 from john smith
    (3, "springfield", "jane doe"),
    (4, "shelbyville", "john smith"),    # same name, other block
    (5, "shelbyville", "john smyth"),    # lev 1 within shelbyville
    (6, "springfield", "john smith"),    # exact dup of 1
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "id long, city string, name string")


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _ref_pairs(rows, threshold):
    out = {}
    for i, (ia, ca, na) in enumerate(rows):
        for ib_, cb, nb in rows[i + 1:]:
            if ca != cb:
                continue
            a, b = sorted((ia, ib_))
            s = round(1.0 - _lev(na, nb) / max(len(na), len(nb)), 6)
            if s >= threshold:
                out[(a, b)] = s
    return out


def _score():
    return F.round(
        F.lit(1.0)
        - F.levenshtein("name_a", "name_b")
        / F.greatest(F.length("name_a"), F.length("name_b")),
        6,
    )


def test_self_linkage_matches_python_reference(spark):
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in linkage.self_linkage(
            _df(spark),
            block_on=["city"],
            id_col="id",
            score=_score(),
            threshold=0.8,
        ).collect()
    }
    assert got == _ref_pairs(ROWS, 0.8)
    # blocking respected: 1-4 share a name but never pair
    assert (1, 4) not in got and (4, 6) not in got
    # exact dup scores 1.0, canonicalized id_a < id_b, no self-pairs
    assert got[(1, 6)] == 1.0
    assert all(a < b for a, b in got)


def test_link_tables_cross_and_null_score_drop(spark):
    a = spark.createDataFrame(
        [(1, "x", "alpha"), (2, "x", None)], "id long, k string, s string"
    )
    b = spark.createDataFrame(
        [(10, "x", "alphq"), (11, "y", "alpha")], "id long, k string, s string"
    )
    got = linkage.link_tables(
        a,
        b,
        block_on=["k"],
        id_cols=("id", "id"),
        score=F.round(
            F.lit(1.0)
            - F.levenshtein("s_a", "s_b")
            / F.greatest(F.length("s_a"), F.length("s_b")),
            6,
        ),
        threshold=0.5,
    ).collect()
    # row 2 has NULL field -> NULL score -> dropped; 11 is in block y
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 10)]
    assert got[0]["score"] == 0.8


def test_max_block_size_caps_hot_block(spark):
    rows = ROWS + [(i, "megacity", f"user {i}") for i in range(100, 110)]
    got = linkage.self_linkage(
        _df(spark, rows),
        block_on=["city"],
        id_col="id",
        score=_score(),
        threshold=0.0,
        max_block_size=5,
    ).collect()
    # megacity (10 rows) and springfield-with-4 survive/drop by cap:
    # springfield has 4 rows (<=5, kept), megacity 10 (dropped)
    cities = {r["id_a"] for r in got} | {r["id_b"] for r in got}
    assert cities and all(i < 100 for i in cities)


def test_mutual_best_flag(spark):
    pairs = spark.createDataFrame(
        [
            (1, 10, 0.9),   # best for 1 and for 10 -> mutual
            (1, 11, 0.8),   # best for 11, not for 1 -> not mutual
            (2, 11, 0.7),
        ],
        "id_a long, id_b long, score double",
    )
    got = {
        (r["id_a"], r["id_b"]): r["is_mutual"]
        for r in linkage.mutual_best_flag(pairs, "id_a", "id_b").collect()
    }
    assert got == {(1, 10): True, (1, 11): False, (2, 11): False}


def test_mutual_best_flag_tie_breaks_on_partner_id(spark):
    pairs = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.9), (2, 11, 0.9)],
        "id_a long, id_b long, score double",
    )
    got = {
        (r["id_a"], r["id_b"]): r["is_mutual"]
        for r in linkage.mutual_best_flag(pairs, "id_a", "id_b").collect()
    }
    # 1's tie resolves to partner 10 (asc); 11's best left is 1 but
    # 1 chose 10, so (1,11) is one-sided; (2,11): 11 prefers 1
    assert got == {(1, 10): True, (1, 11): False, (2, 11): False}


def test_empty_block_on_rejected(spark):
    with pytest.raises(ValueError):
        linkage.self_linkage(
            _df(spark), block_on=[], id_col="id", score=_score()
        )


def test_edit_blocked_matches_flat_blocked(spark):
    """edit_blocked_self_linkage must return EXACTLY the flat-blocked
    self_linkage result whenever the score gate implies lev <= 1 —
    the deletion-neighborhood candidate generator is complete there
    (substitution / insertion / deletion / exact-dup all covered),
    and hash collisions only add candidates the verify step drops."""
    rows = [
        # block 1: sub (1 edit), exact dup, insertion, deletion, far
        (1, 1, "alpha-entity-x"),
        (2, 1, "alpha-entity-y"),    # sub of 1
        (3, 1, "alpha-entity-x"),    # exact dup of 1
        (4, 1, "alpha-entityq-x"),   # insertion vs 1
        (5, 1, "alpha-entity-"),     # deletion vs 1
        (6, 1, "totally different"),
        # block 2: same strings, different block -> no cross pairs
        (7, 2, "alpha-entity-x"),
        (8, 2, "zz"),
        # empty + NULL strings don't crash the variant builder
        (9, 2, ""),
        (10, 2, None),
    ]
    df = spark.createDataFrame(rows, "id long, blk int, name string")
    # try_divide: the (empty, NULL) pair sees max length 0 and ANSI
    # division throws; NULL sim -> NULL score -> dropped, per contract
    sim = F.lit(1.0) - F.try_divide(
        F.levenshtein(F.col("name_a"), F.col("name_b")),
        F.greatest(F.length("name_a"), F.length("name_b")),
    )
    score = F.when(sim >= 0.9, F.round(sim, 6))
    kw = dict(block_on=["blk"], id_col="id", score=score)
    flat = {
        (r["id_a"], r["id_b"], r["score"])
        for r in linkage.self_linkage(df, **kw).collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["score"])
        for r in linkage.edit_blocked_self_linkage(
            df, string_col="name", **kw
        ).collect()
    }
    assert fast == flat
    assert (1, 3, 1.0) in fast          # exact dup pair survives
    assert any(a == 1 and b == 2 for a, b, _ in fast)  # substitution
    with pytest.raises(NotImplementedError):
        linkage.deletion_variant_hashes(F.col("name"), max_edits=2)
