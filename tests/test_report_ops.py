"""Skew report, vocabulary coverage curve, and winsorization — checked
against hand-computed and NumPy references."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.profiling import winsorize
from sample_dms_s3_kinesis_spark.operators.skew import skew_report
from sample_dms_s3_kinesis_spark.operators.text import vocab_coverage
from tdata import sf_dir


def test_skew_report_counts_shares_and_null_key(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 2 + [("c",)] * 1,
        "k string",
    )
    got = skew_report(df, "k", top=3).collect()
    assert [(r["k"], r["n_rows"], r["share"]) for r in got] == [
        ("a", 6, 0.5),
        ("b", 3, 0.25),
        (None, 2, round(2 / 12, 6)),
    ]


def test_skew_report_multi_key_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("x", 1)] * 2 + [("x", 2)] * 2 + [("y", 1)] * 1,
        "a string, b int",
    )
    got = skew_report(df, ["a", "b"], top=2).collect()
    # tie between (x,1) and (x,2) breaks ascending on the key
    assert [(r["a"], r["b"]) for r in got] == [("x", 1), ("x", 2)]


def test_vocab_coverage_matches_python(spark):
    texts = ["a a a b b c", "a b d", "e e a"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    toks = " ".join(texts).split()
    from collections import Counter

    cnt = Counter(toks)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = len(toks)
    got = {
        r["vocab_size"]: (r["covered"], r["total_tokens"], r["coverage"])
        for r in vocab_coverage(df, sizes=(1, 2, 4)).collect()
    }
    for k in (1, 2, 4):
        covered = sum(c for _, c in ranked[:k])
        assert got[k] == (covered, total, round(covered / total, 6))
    # curve is monotone non-decreasing in K
    assert got[1][2] <= got[2][2] <= got[4][2]


def test_vocab_coverage_rejects_bad_sizes(spark):
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(ValueError):
        vocab_coverage(df, sizes=(0, 4))


def test_winsorize_grouped_matches_numpy(spark):
    docs = spark.read.parquet(f"{sf_dir('0.001')}/documents.parquet")
    got = {
        r["doc_id"]: r["n_chars_w"]
        for r in winsorize(docs, "n_chars", group_cols=["lang"]).collect()
    }
    rows = docs.select("doc_id", "lang", "n_chars").collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    bounds = {
        lang: (
            float(np.percentile(v, 5, method="linear")),
            float(np.percentile(v, 95, method="linear")),
        )
        for lang, v in by_lang.items()
    }
    for r in rows:
        lo, hi = bounds[r["lang"]]
        assert abs(got[r["doc_id"]] - min(max(float(r["n_chars"]), lo), hi)) < 1e-9
    # winsorized range is within bounds, raw range typically is not
    assert all(
        bounds[r["lang"]][0] - 1e-9 <= got[r["doc_id"]] <= bounds[r["lang"]][1] + 1e-9
        for r in rows
    )


def test_winsorize_ungrouped_nulls_and_args(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 20.0), (4, 1000.0), (5, None)],
        "id long, v double",
    )
    out = {r["id"]: r["v_w"] for r in winsorize(df, "v", lower=0.0, upper=0.5).collect()}
    assert out[5] is None  # NULL stays NULL
    assert out[4] == 15.0  # p50 of [0,10,20,1000] = 15 (linear interp)
    assert out[1] == 0.0
    with pytest.raises(ValueError):
        winsorize(df, "v", lower=0.9, upper=0.1)


def test_profile_drift_detects_shifts(spark):
    from sample_dms_s3_kinesis_spark.operators.profiling import profile_drift

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, None, 20), (4, "d", 99), (5, "d", 7)],
        "id long, s string, v long",
    )
    got = {r["column"]: r for r in profile_drift(old, new).collect()}
    assert set(got) == {"id", "s", "v"}
    r = got["s"]
    assert (r["n_rows_old"], r["n_rows_new"]) == (3, 4)
    assert (r["n_null_old"], r["n_null_new"]) == (0, 1)
    assert (r["n_distinct_old"], r["n_distinct_new"]) == (3, 2)
    assert r["min_changed"] is False and r["max_changed"] is True  # c -> d
    v = got["v"]
    assert v["min_changed"] is True and v["max_changed"] is True  # 10->7, 30->99
    i = got["id"]
    assert i["min_changed"] is False and i["max_changed"] is True


def test_ann_recall_report_shape(spark):
    from sample_dms_s3_kinesis_spark.plans.registry import REGISTRY

    rows = {
        r["method"]: r
        for r in REGISTRY["q_ann_recall"].fn(spark, sf_dir("0.001")).collect()
    }
    assert set(rows) == {"ivf", "lsh"}
    for r in rows.values():
        assert 0 <= r["hits"] <= r["k"] == 10
        assert 0.0 <= r["recall"] <= 1.0
        assert r["recall"] == round(r["hits"] / r["k"], 6)


def test_hll_daily_union_bounds(spark):
    """Merged daily HLL sketches must estimate monthly uniques within
    HLL error bounds, and per-day estimates must bound their exact
    counts the same way."""
    from sample_dms_s3_kinesis_spark.plans.registry import REGISTRY, t

    sf = sf_dir("0.001")
    rows = REGISTRY["q_hll_daily_union"].fn(spark, sf).collect()
    ev = t(spark, sf, "events")
    exact_total = ev.select("user_id").distinct().count()
    merged = [r for r in rows if r["day"] is None]
    assert len(merged) == 1
    est = merged[0]["est_users"]
    assert abs(est - exact_total) <= max(3, 0.05 * exact_total)
    # per-day rows: one per distinct day, estimates near exact
    import pyspark.sql.functions as F

    exact_daily = {
        r["day"]: r["n"]
        for r in ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    per_day = {r["day"]: r["est_users"] for r in rows if r["day"] is not None}
    assert set(per_day) == set(exact_daily)
    for day, n in exact_daily.items():
        assert abs(per_day[day] - n) <= max(3, 0.05 * n), day


def test_winsorize_keeps_null_group_rows(spark):
    """r6 review: the bounds re-join must be null-safe — rows whose
    group key is NULL used to vanish from an operator documented to
    only ADD a column."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 3.0), (None, 40.0)],
        "g string, v double",
    )
    out = winsorize(df, "v", group_cols=["g"], lower=0.0, upper=0.5)
    rows = out.collect()
    assert len(rows) == 4                    # no silent row loss
    got = {(r["g"], r["v"]): r["v_w"] for r in rows}
    # NULL group clamps within ITS OWN bounds (median of 3, 40)
    assert got[(None, 40.0)] < 40.0
    assert got[("a", 1.0)] == 1.0


def test_profile_table_handles_dotted_column_names(spark):
    from sample_dms_s3_kinesis_spark.operators.profiling import (
        profile_drift,
        profile_table,
    )

    df = spark.createDataFrame([(1, "x"), (2, None)], ["a.b", "c"])
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["a.b"]["n_distinct"] == 2
    assert prof["c"]["n_null"] == 1

    # drift over snapshots with DIFFERENT columns surfaces both sides
    old = spark.createDataFrame([(1, "x")], ["a", "b"])
    new = spark.createDataFrame([(1, 2.0)], ["a", "c"])
    drift = {r["column"]: r for r in profile_drift(old, new).collect()}
    assert set(drift) == {"a", "b", "c"}
    assert drift["b"]["n_rows_new"] is None   # dropped column visible
    assert drift["c"]["n_rows_old"] is None   # added column visible


# ------------------------------------------------- binary_metrics_report

def _auc_reference(pairs):
    """Independent tie-aware ROC-AUC (pairwise comparison count) and
    unique-threshold average precision, straight from the definitions."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if pos and neg:
        wins = sum(
            1.0 if p > q else (0.5 if p == q else 0.0)
            for p in pos
            for q in neg
        )
        auc = wins / (len(pos) * len(neg))
    else:
        auc = None
    if pos:
        ap = 0.0
        for thr in sorted({s for s, _ in pairs}, reverse=True):
            kept = [(s, y) for s, y in pairs if s >= thr]
            tp = sum(y for _, y in kept)
            tp_at = sum(1 for s, y in kept if y == 1 and s == thr)
            ap += (tp_at / len(pos)) * (tp / len(kept))
        return auc, ap
    return auc, None


@pytest.mark.parametrize(
    "pairs",
    [
        # distinct scores, mixed labels
        [(10, 1), (9, 0), (8, 1), (7, 0), (6, 0), (5, 1)],
        # heavy ties across labels
        [(3, 1), (3, 0), (3, 1), (2, 0), (2, 1), (1, 0), (1, 0)],
        # perfect separation
        [(5, 1), (4, 1), (3, 0), (2, 0)],
        # inverted ranking
        [(1, 1), (2, 1), (3, 0), (4, 0)],
    ],
)
def test_binary_metrics_match_reference(spark, pairs):
    from sample_dms_s3_kinesis_spark.operators.profiling import (
        binary_metrics_report,
    )

    df = spark.createDataFrame(pairs, "score int, label int")
    row = binary_metrics_report(df, score="score", label="label").collect()[0]
    auc, ap = _auc_reference(pairs)
    assert row["n_pos"] == sum(y for _, y in pairs)
    assert row["n_neg"] == sum(1 - y for _, y in pairs)
    assert row["n_excluded"] == 0
    assert row["roc_auc"] == pytest.approx(auc, abs=1e-6)
    assert row["avg_precision"] == pytest.approx(ap, abs=1e-6)


def test_binary_metrics_nulls_and_degenerate(spark):
    from sample_dms_s3_kinesis_spark.operators.profiling import (
        binary_metrics_report,
    )

    df = spark.createDataFrame(
        [(5, 1), (None, 1), (4, None), (3, 1)], "score int, label int"
    )
    row = binary_metrics_report(df, score="score", label="label").collect()[0]
    # no negatives: ROC undefined, AP degenerates to 1.0
    assert (row["n_pos"], row["n_neg"], row["n_excluded"]) == (2, 0, 2)
    assert row["roc_auc"] is None
    assert row["avg_precision"] == pytest.approx(1.0)

    empty = spark.createDataFrame([], "score int, label int")
    row = binary_metrics_report(empty, score="score", label="label").collect()[0]
    assert (row["n_pos"], row["n_neg"], row["n_excluded"]) == (0, 0, 0)
    assert row["roc_auc"] is None and row["avg_precision"] is None


def test_calibration_report_hand_computed(spark):
    """Two populated bins with known sums; NULL/out-of-range rows count
    as excluded; ECE = Σ|sum_y - sum_s| / N."""
    rows = [
        (0.05, 0), (0.15, 0), (0.12, 1),   # bin 0 (x1), bin 1 (x2)
        (0.95, 1), (1.0, 1),               # bin 9 (score 1.0 folds in)
        (None, 1), (0.5, None), (1.5, 0), (-0.1, 1), (0.5, 2),
    ]
    df = spark.createDataFrame(rows, "score double, label long")
    from sample_dms_s3_kinesis_spark.operators.profiling import (
        calibration_report,
    )

    out = {r["bin"]: r for r in calibration_report(
        df, score="score", label="label", bins=10
    ).collect()}
    assert set(out) == {0, 1, 9}
    assert out[0]["n"] == 1 and out[0]["conf"] == 0.05 and out[0]["acc"] == 0.0
    assert out[1]["n"] == 2
    assert abs(out[1]["conf"] - round((0.15 + 0.12) / 2, 6)) < 1e-9
    assert out[1]["acc"] == 0.5
    assert out[9]["n"] == 2 and out[9]["acc"] == 1.0
    assert all(r["n_excluded"] == 5 for r in out.values())
    ece = (abs(0 - 0.05) + abs(1 - 0.27) + abs(2 - 1.95)) / 5
    assert abs(out[0]["ece"] - round(ece, 6)) < 1e-9

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bins"):
        calibration_report(df, score="score", label="label", bins=0)


def test_calibration_report_perfectly_calibrated(spark):
    """A classifier whose score IS the positive rate per bin has
    near-zero ECE on enough samples (exact-construction check: labels
    deterministic threshold of an independent uniform hash)."""
    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.operators.profiling import (
        calibration_report,
    )

    n = 20_000
    base = spark.range(n)

    def frac(prefix):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(prefix), F.col("id"))), 1, 6
                ), 16, 10,
            ).cast("double") / F.lit(16777216.0)
        )

    df = base.select(
        frac("s").alias("score"),
        (frac("y") < frac("s")).cast("bigint").alias("label"),
    )
    rows = calibration_report(
        df, score="score", label="label", bins=10
    ).collect()
    assert len(rows) == 10
    assert rows[0]["ece"] < 0.02  # ~1/sqrt(2000 per bin) noise floor
    for r in rows:
        assert abs(r["acc"] - r["conf"]) < 0.05, (r["bin"], r["acc"], r["conf"])


def test_calibration_report_all_invalid_vs_empty(spark):
    """All-rows-invalid is observable: one NULL-bin summary row carries
    n_excluded; truly empty input stays an empty report."""
    from sample_dms_s3_kinesis_spark.operators.profiling import (
        calibration_report,
    )

    bad = spark.createDataFrame(
        [(None, 1), (1.5, 0), (-0.1, 1), (0.5, None)],
        "score double, label long",
    )
    rows = calibration_report(
        bad, score="score", label="label", bins=10
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["bin"] is None and r["n"] == 0 and r["n_excluded"] == 4
    assert r["conf"] is None and r["acc"] is None and r["ece"] is None

    empty = spark.createDataFrame([], "score double, label long")
    assert (
        calibration_report(
            empty, score="score", label="label", bins=10
        ).count()
        == 0
    )
