"""Naive Bayes token classifier: Spark implementation checked against a
pure-Python multinomial NB on the same data — training counts, scoring
identity (seen sums + arithmetic unseen closure), argmax tie-breaks."""

import collections
import math

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import classify

DOCS = [
    (0, "spark table join join scan", "a"),
    (1, "table scan filter scan scan", "a"),
    (2, "stream window state window", "b"),
    (3, "window stream watermark state", "b"),
    (4, "join stream window scan", "a"),
    (5, "state state window table", "b"),
]
TEST = [
    (100, "join scan table"),
    (101, "window state stream"),
    (102, "scan window"),
    (103, "unseen tokens only here"),
]


def _python_nb(train, a=1.0):
    cnt = collections.Counter()
    tot = collections.Counter()
    dcount = collections.Counter()
    vocab = set()
    for _, text, lab in train:
        dcount[lab] += 1
        for tok in text.strip().lower().split():
            cnt[(lab, tok)] += 1
            tot[lab] += 1
            vocab.add(tok)
    V, D = len(vocab), sum(dcount.values())

    def score(text, lab):
        s = math.log(dcount[lab]) - math.log(D)
        den = math.log(tot[lab] + a * V)
        for tok in text.strip().lower().split():
            c = cnt.get((lab, tok))
            s += (math.log(c + a) if c else math.log(a)) - den
        return s

    return score, sorted(dcount)


def test_nb_matches_python_reference(spark):
    train = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    tm, lm = classify.nb_train(train, label_col="lang")
    ref_score, labels = _python_nb(DOCS)

    scored = classify.nb_score(test, tm, lm).collect()
    assert len(scored) == len(TEST) * len(labels)
    texts = dict(TEST)
    for r in scored:
        assert abs(r["score"] - ref_score(texts[r["doc_id"]], r["label"])) < 1e-9

    got = {
        r["doc_id"]: r["predicted"]
        for r in classify.nb_classify(test, tm, lm).collect()
    }
    for doc_id, text in TEST:
        exp = min(labels, key=lambda l: (-ref_score(text, l), l))
        assert got[doc_id] == exp, doc_id


def test_nb_all_unseen_tokens_follow_prior_and_default(spark):
    """A doc of only unseen tokens scores prior + n·log_default per
    label — the arithmetic closure must not need any model-join row."""
    train = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    test = spark.createDataFrame(
        [(900, "zzz qqq")], "doc_id long, text string"
    )
    tm, lm = classify.nb_train(train, label_col="lang")
    got = {r["label"]: r["score"] for r in classify.nb_score(test, tm, lm).collect()}
    lab = {r["label"]: r for r in lm.collect()}
    for label, row in lab.items():
        exp = row["log_prior"] + 2 * row["log_default"]
        assert abs(got[label] - exp) < 1e-12, label


def test_nb_classify_tie_breaks_on_label_ascending(spark):
    """Perfectly symmetric training data gives equal scores — the
    deterministic tie-break must pick the lexicographically first
    label."""
    sym = [
        (0, "x", "b"),
        (1, "x", "a"),
    ]
    train = spark.createDataFrame(sym, "doc_id long, text string, lang string")
    test = spark.createDataFrame([(5, "x")], "doc_id long, text string")
    tm, lm = classify.nb_train(train, label_col="lang")
    out = classify.nb_classify(test, tm, lm).collect()
    assert out[0]["predicted"] == "a"


def test_nb_sf_documents_classify_is_plan_clean(spark):
    """The full train+classify pipeline over the test tables stays
    JVM-side (no Python row evaluation) and predicts only training
    labels."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    tm, lm = classify.nb_train(train, label_col="lang")
    out = classify.nb_classify(test, tm, lm)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    preds = out.collect()
    assert len(preds) == test.count()
    train_labels = {r["lang"] for r in train.select("lang").distinct().collect()}
    assert {r["predicted"] for r in preds} <= train_labels


def test_nb_handles_null_text(spark):
    """r6 review: NULL text used to score a huge positive number
    (size(NULL) = -1 flipped the unseen-token closure) and could drop
    a label from the trained model entirely."""
    from sample_dms_s3_kinesis_spark.operators import classify

    train = spark.createDataFrame(
        [(1, "aa bb aa", "en"), (2, "cc dd cc", "fr"), (3, None, "unk")],
        "doc_id long, text string, lang string",
    )
    tm, lm = classify.nb_train(train, text_col="text", label_col="lang")
    labels = {r["label"] for r in lm.collect()}
    assert labels == {"en", "fr", "unk"}      # NULL-text label survives
    score_in = spark.createDataFrame(
        [(10, "aa bb"), (11, None)], "doc_id long, text string"
    )
    scored = classify.nb_score(score_in, tm, lm).collect()
    by_doc = {}
    for r in scored:
        by_doc.setdefault(r["doc_id"], {})[r["label"]] = r["score"]
    # the NULL doc's scores are finite and no higher than the real
    # doc's best (no positive-score blowup)
    assert all(s < 0 for s in by_doc[11].values()), by_doc[11]
