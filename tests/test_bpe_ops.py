"""BPE tokenizer induction: Spark trainer vs a pure-Python reference
implementation (Sennrich-style weighted-vocab merge counting), plus
encode invariants."""

from hypothesis import HealthCheck, given, settings, strategies as st

from sample_dms_s3_kinesis_spark.operators import bpe


# ---------------------------------------------------------------------
# Pure-Python reference: classic weighted-vocab BPE with the same
# deterministic tie-break (max count, then lexicographic (l, r)).
# ---------------------------------------------------------------------

def _ref_train(texts, n_merges, min_pair_count=2):
    vocab = {}
    for s in texts:
        for w in s.lower().split():
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    seqs = {w: tuple(list(w) + [bpe.END_OF_WORD]) for w in vocab}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, sym in seqs.items():
            n = vocab[w]
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((l, r, cnt))
        new_seqs = {}
        for w, sym in seqs.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return merges


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_train_matches_python_reference(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
        "low lower newest",
    ]
    got = bpe.bpe_train_merges(_df(spark, texts), n_merges=10)
    exp = _ref_train(texts, 10)
    assert got == exp
    # the classic outcome: frequent subwords coalesce end-to-start
    assert got, "expected at least one merge"
    assert all(cnt >= 2 for _, _, cnt in got)


def test_bpe_train_distributed_loop_matches_driver_gate(spark):
    """driver_threshold=0 forces the DISTRIBUTED merge loop (the path
    that actually runs above the gate at scale); it must learn exactly
    the merges the driver loop and the Python reference produce —
    without this pin the Sennrich tests only ever exercise the driver
    path (every test vocabulary is tiny)."""
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
        "low lower newest",
    ]
    dist = bpe.bpe_train_merges(
        _df(spark, texts), n_merges=10, driver_threshold=0
    )
    drv = bpe.bpe_train_merges(_df(spark, texts), n_merges=10)
    assert dist == drv == _ref_train(texts, 10)


def test_bpe_train_min_pair_count_stops(spark):
    # every word unique, every pair count 1 -> no merge at threshold 2
    texts = ["abc def", "ghi jkl"]
    assert bpe.bpe_train_merges(_df(spark, texts), n_merges=5) == []
    # threshold 1 merges something
    assert bpe.bpe_train_merges(
        _df(spark, texts), n_merges=1, min_pair_count=1
    ) == _ref_train(texts, 1, min_pair_count=1)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=5),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_bpe_train_property(spark, texts, n_merges):
    got = bpe.bpe_train_merges(_df(spark, texts), n_merges=n_merges)
    assert got == _ref_train(texts, n_merges)


def test_merges_frame_shape(spark):
    texts = ["aa aa aa bb", "aa bb bb"]
    mf = bpe.merges_frame(_df(spark, texts), n_merges=4).collect()
    ref = _ref_train(texts, 4)
    assert [(r["left"], r["right"], r["pair_count"]) for r in mf] == ref
    assert [r["rank"] for r in mf] == list(range(1, len(ref) + 1))
    assert all(r["merged"] == r["left"] + r["right"] for r in mf)


def test_bpe_encode_invariants(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "low lower newest",
    ]
    df = _df(spark, texts)
    merges = bpe.bpe_train_merges(df, n_merges=12)
    out = {r["doc_id"]: r for r in bpe.bpe_encode(df, merges).collect()}
    assert set(out) == {0, 1, 2}
    for i, s in enumerate(texts):
        toks = out[i]["bpe_tokens"]
        assert out[i]["n_bpe_tokens"] == len(toks)
        # concatenating pieces reconstructs the words + markers exactly
        rebuilt = "".join(toks).replace(bpe.END_OF_WORD, " ").strip()
        assert rebuilt == " ".join(s.lower().split())
    # a fully-merged frequent word encodes to a single token
    top = {r["doc_id"]: r["bpe_tokens"] for r in
           bpe.bpe_encode(_df(spark, ["low"]), merges).collect()}
    assert top[0] == ["low" + bpe.END_OF_WORD]


def test_bpe_encode_empty_and_null(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "ab")], "doc_id long, text string"
    )
    merges = [("a", "b", 1)]
    out = {r["doc_id"]: r for r in bpe.bpe_encode(df, merges).collect()}
    assert out[0]["bpe_tokens"] == [] and out[0]["n_bpe_tokens"] == 0
    assert out[1]["bpe_tokens"] == []
    assert out[2]["bpe_tokens"] == ["ab", bpe.END_OF_WORD]


def test_bpe_encode_preserves_string_ids(spark):
    """r6 review: the forced long cast crashed ANSI mode for string
    document ids (and NULLed them without ANSI)."""
    from sample_dms_s3_kinesis_spark.operators import bpe

    df = spark.createDataFrame(
        [("doc-a", "low lower"), ("doc-b", "lowest")],
        "doc_id string, text string",
    )
    merges = bpe.bpe_train_merges(df, n_merges=4, min_pair_count=2)
    out = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe.bpe_encode(df, merges).collect()}
    assert set(out) == {"doc-a", "doc-b"}
    assert all(n > 0 for n in out.values())
