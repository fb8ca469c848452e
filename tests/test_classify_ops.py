"""Naive Bayes token classifier: Spark implementation checked against a
pure-Python multinomial NB on the same data — training counts, scoring
identity (seen sums + arithmetic unseen closure), argmax tie-breaks."""

import collections
import math

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import classify
from tdata import sf_dir

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
    docs = spark.read.parquet(f"{sf_dir('0.001')}/documents.parquet")
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


# ------------------------- hashed-feature logistic regression

LR_DOCS = [
    (0, "good clean prose with varied words", 1),
    (1, "prose clean varied thoughtful words", 1),
    (2, "varied clean good thoughtful prose", 1),
    (3, "spam spam buy now buy now", 0),
    (4, "buy now spam click click now", 0),
    (5, "click buy spam spam click", 0),
]


def _python_lr(docs, *, buckets, epochs, lr, l2=0.0):
    """Pure-Python replica of lr_train/lr_score (md5 hash family)."""
    import hashlib
    import re as _re

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % buckets

    feats = {}
    for doc_id, text, y in docs:
        toks = _re.split(r"\s+", (text or "").lower().strip())
        tf = collections.Counter(bucket(w) for w in toks)
        feats[doc_id] = ({b: c / len(toks) for b, c in tf.items()}, float(y))
    n = len(feats)
    w, bias = {}, 0.0
    for _ in range(epochs):
        resid = {}
        for d, (tf, y) in feats.items():
            m = bias + sum(v * w.get(b, 0.0) for b, v in tf.items())
            resid[d] = 1.0 / (1.0 + math.exp(-m)) - y
        grads = collections.defaultdict(float)
        for d, (tf, _) in feats.items():
            for b, v in tf.items():
                grads[b] += v * resid[d]
        bias -= lr * sum(resid.values()) / n
        for b in set(w) | set(grads):
            w[b] = w.get(b, 0.0) - lr * (grads.get(b, 0.0) / n + l2 * w.get(b, 0.0))
    probs = {}
    for d, (tf, _) in feats.items():
        m = bias + sum(v * w.get(b, 0.0) for b, v in tf.items())
        probs[d] = 1.0 / (1.0 + math.exp(-m))
    return w, bias, probs


def test_lr_train_score_match_python_reference(spark):
    df = spark.createDataFrame(LR_DOCS, "doc_id long, text string, label int")
    model = classify.lr_train(
        df, buckets=32, epochs=20, learning_rate=2.0, hash_family="md5"
    )
    ref_w, ref_bias, ref_probs = _python_lr(
        LR_DOCS, buckets=32, epochs=20, lr=2.0
    )
    got = {r["bucket"]: r["weight"] for r in model.collect()}
    assert abs(got.pop(-1) - ref_bias) <= 1e-9
    assert set(got) == set(ref_w)
    for b in ref_w:
        assert abs(got[b] - ref_w[b]) <= 1e-9
    scored = {
        r["doc_id"]: (r["prob"], r["predicted"])
        for r in classify.lr_score(
            df, model, buckets=32, hash_family="md5"
        ).collect()
    }
    for d, p in ref_probs.items():
        assert scored[d][0] == round(p, 6) or abs(scored[d][0] - p) <= 2e-6
    # separable data: the classifier separates it
    for doc_id, _, y in LR_DOCS:
        assert scored[doc_id][1] == y


def test_lr_l2_shrinks_weights_and_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame(LR_DOCS, "doc_id long, text string, label int")
    plain = classify.lr_train(
        df, buckets=32, epochs=10, learning_rate=1.0, hash_family="md5"
    )
    shrunk = classify.lr_train(
        df, buckets=32, epochs=10, learning_rate=1.0, l2=0.5,
        hash_family="md5",
    )
    norm = lambda m: sum(
        r["weight"] ** 2 for r in m.collect() if r["bucket"] >= 0
    )
    assert norm(shrunk) < norm(plain)
    with _pytest.raises(ValueError, match="epochs"):
        classify.lr_train(df, epochs=0)
    with _pytest.raises(ValueError, match="learning_rate"):
        classify.lr_train(df, learning_rate=0.0)
    with _pytest.raises(ValueError, match="non-empty"):
        classify.lr_train(
            spark.createDataFrame([], "doc_id long, text string, label int")
        )
    with _pytest.raises(ValueError, match="bias"):
        classify.lr_score(df, plain.filter(F.col("bucket") >= 0))


def test_lr_unseen_tokens_score_at_bias(spark):
    df = spark.createDataFrame(LR_DOCS, "doc_id long, text string, label int")
    model = classify.lr_train(
        df, buckets=32, epochs=5, learning_rate=1.0, hash_family="md5"
    )
    bias = [
        r["weight"] for r in model.collect() if r["bucket"] == -1
    ][0]
    out = spark.createDataFrame(
        [(9, "zz qq vv")], "doc_id long, text string"
    )
    # tokens all unseen -> margin = bias exactly... unless a hash
    # collision lands one in a trained bucket; with 32 buckets assume
    # the margin is within the trained-weight envelope
    row = classify.lr_score(out, model, buckets=32, hash_family="md5").collect()[0]
    assert 0.0 < row["prob"] < 1.0
    assert row["doc_id"] == 9


def test_lr_train_rejects_invalid_labels(spark):
    import pytest

    from sample_dms_s3_kinesis_spark.operators import classify

    base = [("a", "alpha beta", 1), ("b", "beta gamma", 0)]
    null_lbl = spark.createDataFrame(
        base + [("c", "gamma delta", None)],
        "doc_id string, text string, label int",
    )
    with pytest.raises(ValueError, match="NULL or out of domain"):
        classify.lr_train(null_lbl, buckets=16, epochs=1)
    out_of_domain = spark.createDataFrame(
        base + [("c", "gamma delta", 2)],
        "doc_id string, text string, label int",
    )
    with pytest.raises(ValueError, match="NULL or out of domain"):
        classify.lr_train(out_of_domain, buckets=16, epochs=1)
