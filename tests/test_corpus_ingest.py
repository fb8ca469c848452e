"""Streaming corpus ingestion: exact + near-dup admission gates over
micro-batches, replay idempotency, restart-stable statistics."""

import json
import os
import time

import pytest

from sample_dms_s3_kinesis_spark.streaming.ingest import CorpusIngestTask


def _drop(drop_dir, name, docs):
    os.makedirs(drop_dir, exist_ok=True)
    path = os.path.join(drop_dir, name)
    with open(path + ".tmp", "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.replace(path + ".tmp", path)


def test_exact_gates_across_batches(spark, tmp_path):
    drop = str(tmp_path / "drop")
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "crawl1.json", [
        (1, "alpha beta gamma"),
        (2, "delta epsilon zeta"),
        (3, "alpha beta gamma"),      # within-batch dup of 1
    ])
    task.process_available()
    got = {r["doc_id"] for r in task.corpus().collect()}
    assert got == {1, 2}             # min-id survivor admitted

    for f in os.listdir(drop):
        os.remove(os.path.join(drop, f))
    _drop(drop, "crawl2.json", [
        (10, "alpha beta gamma"),     # exact dup of corpus doc 1
        (11, "eta theta iota"),       # novel
        (12, None),                   # malformed: rejected
    ])
    task.process_available()
    got = {r["doc_id"] for r in task.corpus().collect()}
    assert got == {1, 2, 11}
    stats = task.ingest_stats()
    assert stats["admitted"] == 3
    assert stats["dropped_exact"] == 2   # doc 3 (in-batch) + doc 10 (corpus)
    assert stats["rejected"] == 1
    assert stats["dropped_near"] == 0


def test_near_dup_gate_drops_near_copies(spark, tmp_path):
    drop = str(tmp_path / "drop")
    base = " ".join(f"w{i}" for i in range(60))
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        near_dup=True, num_hashes=64, bands=32, threshold=0.5,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "crawl1.json", [(1, base)])
    task.process_available()
    assert {r["doc_id"] for r in task.corpus().collect()} == {1}

    for f in os.listdir(drop):
        os.remove(os.path.join(drop, f))
    near_copy = base + " extra"       # one-token edit: high jaccard
    unrelated = " ".join(f"z{i}" for i in range(60))
    _drop(drop, "crawl2.json", [(20, near_copy), (21, unrelated)])
    task.process_available()
    got = {r["doc_id"] for r in task.corpus().collect()}
    assert got == {1, 21}             # near-copy gated out
    assert task.ingest_stats()["dropped_near"] == 1

    # same second crawl WITHOUT the near gate admits the near-copy
    task2 = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    _drop(os.path.join(str(tmp_path), "seed"), "s.json", [(1, base)])
    task2_seed = CorpusIngestTask(
        spark, os.path.join(str(tmp_path), "seed"), str(tmp_path / "corpus2"),
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    task2_seed.process_available()
    task2.process_available()
    assert {r["doc_id"] for r in task2.corpus().collect()} == {1, 20, 21}


def test_batch_replay_is_idempotent(spark, tmp_path):
    """Re-processing the same batch id (Structured Streaming replay
    after a crash before checkpoint commit) must not duplicate corpus
    rows or double-count statistics."""
    drop = str(tmp_path / "drop")
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "crawl1.json", [(1, "alpha beta"), (2, "gamma delta")])
    df = spark.read.schema(
        "doc_id long, text string"
    ).json(drop)
    task._process_batch(df, 0)
    first = sorted(r["doc_id"] for r in task.corpus().collect())
    first_stats = task.ingest_stats()
    task._process_batch(df, 0)   # the replay
    assert sorted(r["doc_id"] for r in task.corpus().collect()) == first
    assert task.ingest_stats() == first_stats


def test_streaming_path_admits_incrementally(spark, tmp_path):
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    task.start()
    assert task.status == "running"
    _drop(drop, "crawl1.json", [(1, "alpha beta"), (2, "gamma delta")])
    _drop(drop, "crawl2.json", [(3, "alpha beta"), (4, "epsilon zeta")])
    deadline = time.time() + 90
    while time.time() < deadline and task.ingest_stats()["admitted"] < 3:
        time.sleep(0.5)
    task.stop()
    got = {r["doc_id"] for r in task.corpus().collect()}
    # The file source orders batches by modification time, which can tie
    # for near-simultaneous drops — either file may process first, so
    # either doc 1 or doc 3 ("alpha beta" twins) survives, never both.
    assert {2, 4} <= got
    assert len(got) == 3 and got - {2, 4} <= {1, 3}
    assert task.ingest_stats()["dropped_exact"] == 1


def test_signature_store_written_and_served(spark, tmp_path):
    """The near gate persists each admitted batch's signatures and
    serves later gates from them; a batch whose signature dir is lost
    (or predates the store) falls back to recompute-from-text."""
    drop = str(tmp_path / "drop")
    corpus = str(tmp_path / "corpus")
    base = " ".join(f"w{i}" for i in range(60))
    task = CorpusIngestTask(
        spark, drop, corpus,
        near_dup=True, num_hashes=64, bands=32, threshold=0.5,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "crawl1.json", [(1, base), (2, " ".join(f"z{i}" for i in range(60)))])
    task.process_available()
    sig_dir = os.path.join(corpus, "_signatures")
    assert os.path.isdir(os.path.join(sig_dir, "batch_id=0"))
    assert task.signatures().count() == 2

    # gate a second crawl: near-copy of doc 1 must drop, decided from
    # the STORED signatures
    for f in os.listdir(drop):
        os.remove(os.path.join(drop, f))
    _drop(drop, "crawl2.json", [(20, base + " extra"), (21, " ".join(f"q{i}" for i in range(60)))])
    task.process_available()
    assert {r["doc_id"] for r in task.corpus().collect()} == {1, 2, 21}
    assert task.signatures().count() == 3

    # lose batch 0's signature dir: signatures() recomputes that batch
    import shutil

    shutil.rmtree(os.path.join(sig_dir, "batch_id=0"))
    assert task.signatures().count() == 3

    # param mismatch: the whole store is ignored, everything recomputes
    with open(os.path.join(sig_dir, "_PARAMS.json"), "w") as f:
        json.dump({"num_hashes": 128, "bands": 16}, f)
    sigs = task.signatures()
    assert sigs.count() == 3
    # recomputed signatures carry the task's CURRENT num_hashes
    assert len(sigs.collect()[0]["_sig"]) == 64


def test_signature_gate_decisions_match_recompute_operator(spark, tmp_path):
    """Persisted-signature gating must make the same decision as the
    recompute-everything operator on the same corpus."""
    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.operators.dedup import near_dedup_against

    drop = str(tmp_path / "drop")
    base = " ".join(f"w{i}" for i in range(60))
    docs2 = [(20, base + " extra"), (21, " ".join(f"q{i}" for i in range(60)))]
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        near_dup=True, num_hashes=64, bands=32, threshold=0.5,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "crawl1.json", [(1, base)])
    task.process_available()
    for f in os.listdir(drop):
        os.remove(os.path.join(drop, f))
    _drop(drop, "crawl2.json", docs2)
    task.process_available()
    got = {r["doc_id"] for r in task.corpus().collect()}

    new = spark.createDataFrame(docs2, "doc_id long, text string")
    existing = spark.createDataFrame([(1, base)], "doc_id long, text string")
    admitted = near_dedup_against(
        new, existing, num_hashes=64, bands=32, threshold=0.5
    )
    exp = {1} | {r["doc_id"] for r in admitted.collect()}
    assert got == exp


def _drop_vec(drop_dir, name, docs):
    os.makedirs(drop_dir, exist_ok=True)
    path = os.path.join(drop_dir, name)
    with open(path + ".tmp", "w") as f:
        for doc_id, text, vec in docs:
            rec = {"doc_id": doc_id, "text": text}
            if vec is not None:
                rec["embedding"] = vec
            f.write(json.dumps(rec) + "\n")
    os.replace(path + ".tmp", path)


def test_embedding_gate_drops_semantic_copies(spark, tmp_path):
    """Gate 4: a new doc whose VECTOR is near-identical to an admitted
    one is dropped even though its text passes every lexical gate;
    docs without an embedding skip the gate."""
    drop = str(tmp_path / "drop")
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        embedding_gate=True, embedding_threshold=0.99,
        embedding_planes=0,       # single block: exact gate
        embedding_dim=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop_vec(drop, "crawl1.json", [(1, "first document text", [1.0, 0.0, 0.0, 0.0])])
    task.process_available()
    assert {r["doc_id"] for r in task.corpus().collect()} == {1}

    for f in os.listdir(drop):
        os.remove(os.path.join(drop, f))
    _drop_vec(drop, "crawl2.json", [
        (20, "completely different words", [0.999, 0.01, 0.0, 0.0]),  # same meaning
        (21, "another unrelated document", [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        (22, "no vector shipped here", None),                          # skips gate
    ])
    task.process_available()
    got = {r["doc_id"] for r in task.corpus().collect()}
    assert got == {1, 21, 22}
    stats = task.ingest_stats()
    assert stats["dropped_sem"] == 1 and stats["admitted"] == 3

    # embeddings persist in the corpus parquet; NULL for doc 22
    vecs = {r["doc_id"]: r["embedding"] for r in task.corpus().collect()}
    assert vecs[21] == [0.0, 1.0, 0.0, 0.0] and vecs[22] is None


def test_embedding_gate_requires_dim(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        CorpusIngestTask(
            spark, str(tmp_path / "d"), str(tmp_path / "c"),
            embedding_gate=True,
        )


def test_all_gates_armed_together(spark, tmp_path):
    """Exact, minhash and semantic gates in one task: each drops its
    own class of duplicate from a single crawl."""
    drop = str(tmp_path / "drop")
    base = " ".join(f"w{i}" for i in range(60))
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        near_dup=True, num_hashes=64, bands=32, threshold=0.5,
        embedding_gate=True, embedding_threshold=0.99,
        embedding_planes=0, embedding_dim=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop_vec(drop, "crawl1.json", [(1, base, [1.0, 0.0, 0.0])])
    task.process_available()

    for f in os.listdir(drop):
        os.remove(os.path.join(drop, f))
    _drop_vec(drop, "crawl2.json", [
        (20, base, [0.5, 0.5, 0.0]),                 # exact text dup of 1
        (21, base + " extra", [0.0, 1.0, 0.0]),      # minhash near-dup of 1
        (22, "totally different words here", [0.999, 0.01, 0.0]),  # semantic dup
        (23, "novel in every axis", [0.0, 0.0, 1.0]),
    ])
    task.process_available()
    assert {r["doc_id"] for r in task.corpus().collect()} == {1, 23}
    stats = task.ingest_stats()
    assert stats["dropped_exact"] == 1
    assert stats["dropped_near"] == 1
    assert stats["dropped_sem"] == 1
    assert stats["admitted"] == 2


def test_signature_store_plan_has_no_recompute(spark, tmp_path):
    """When every admitted batch has stored signatures, signatures()
    must be a pure parquet scan of the store — no shingle/minhash
    recompute of corpus text anywhere in the plan."""
    drop = str(tmp_path / "drop")
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        near_dup=True, num_hashes=64, bands=32, threshold=0.5,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "c1.json", [(1, " ".join(f"w{i}" for i in range(40)))])
    task.process_available()
    for f in os.listdir(drop):
        os.remove(os.path.join(drop, f))
    _drop(drop, "c2.json", [(2, " ".join(f"z{i}" for i in range(40)))])
    task.process_available()
    plan = task.signatures()._jdf.queryExecution().executedPlan().toString()
    # a pure parquet scan of the stored (_id, _sig) frame...
    assert "FileScan parquet [_id" in plan and "_sig" in plan
    # ...and the minhash pipeline never re-runs (no text hashing)
    assert "xxhash64" not in plan


def test_contract_gate_quarantines_and_counts(spark, tmp_path):
    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.operators import quality

    drop = str(tmp_path / "drop")
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        contract_rules=[
            quality.RowRule(
                "min_tokens",
                F.size(F.split(F.trim("text"), r"\s+")) >= 3,
            ),
            quality.RowRule("no_tabs", ~F.col("text").contains("\t")),
        ],
    )
    _drop(drop, "crawl1.json", [
        (1, "alpha beta gamma"),          # passes
        (2, "too short"),                 # fails min_tokens
        (3, "has\ta tab inside here"),    # fails no_tabs
        (4, "delta epsilon zeta eta"),    # passes
        (5, None),                        # schema-invalid, NOT contract
    ])
    task.process_available()
    assert {r["doc_id"] for r in task.corpus().collect()} == {1, 4}
    q = {
        r["doc_id"]: r["failed_rule"] for r in task.quarantined().collect()
    }
    assert q == {2: "min_tokens", 3: "no_tabs"}
    stats = task.ingest_stats()
    assert stats["admitted"] == 2
    assert stats["rejected_contract"] == 2
    assert stats["rejected"] == 1        # the NULL-text row only

    # replay idempotence: re-running the same batch id overwrites the
    # quarantine directory and re-records the same counters
    import json as _json

    with open(task._manifest_file()) as f:
        before = _json.load(f)
    df = spark.read.schema(
        __import__(
            "sample_dms_s3_kinesis_spark.streaming.ingest",
            fromlist=["DOC_SCHEMA"],
        ).DOC_SCHEMA
    ).json(drop)
    task._process_batch(df, 0)
    with open(task._manifest_file()) as f:
        after = _json.load(f)
    assert after == before
    assert {r["doc_id"] for r in task.quarantined().collect()} == {2, 3}

    # r5 advice: both quarantined() branches must agree on the declared
    # (long, string, long) schema — the parquet path used to surface a
    # partition-inferred int batch_id.
    empty_task = CorpusIngestTask(
        spark, str(tmp_path / "drop2"), str(tmp_path / "corpus2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert (
        task.quarantined().schema == empty_task.quarantined().schema
    ), (task.quarantined().schema, empty_task.quarantined().schema)


def test_contract_gate_off_by_default(spark, tmp_path):
    drop = str(tmp_path / "drop")
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "crawl1.json", [(1, "x"), (2, "alpha beta gamma")])
    task.process_available()
    # no contract: the one-token doc is admitted, quarantine is empty
    assert {r["doc_id"] for r in task.corpus().collect()} == {1, 2}
    assert task.quarantined().count() == 0
    assert task.ingest_stats()["rejected_contract"] == 0


def test_postings_gate_output_incremental_search(spark, tmp_path):
    """postings=True: admitted batches append to the persisted
    inverted index; searches over the stored copies equal a fresh
    PostingsIndex.build of the whole corpus, replay is idempotent,
    and pre-flag batches fall back to recompute-from-text (r5 verdict
    item 6 — the reference's incremental-apply pattern,
    run.py:193-198)."""
    from sample_dms_s3_kinesis_spark.operators.search import PostingsIndex
    from sample_dms_s3_kinesis_spark.streaming.ingest import DOC_SCHEMA

    drop = str(tmp_path / "drop")
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        postings=True,
    )
    _drop(drop, "c1.json", [
        (1, "alpha beta gamma"),
        (2, "beta delta epsilon"),
    ])
    task.process_available()
    for f in os.listdir(drop):
        os.remove(os.path.join(drop, f))
    _drop(drop, "c2.json", [
        (3, "alpha delta zeta"),
        (4, "alpha beta gamma"),   # exact dup of 1: not admitted
    ])
    task.process_available()

    stored = task.postings_index()
    fresh = PostingsIndex.build(task.corpus().select("doc_id", "text"))
    for terms in (["alpha"], ["beta"], ["alpha", "delta"], ["zeta"]):
        got = {r["doc_id"] for r in stored.search(terms).collect()}
        want = {r["doc_id"] for r in fresh.search(terms).collect()}
        assert got == want, terms

    # replay idempotence: re-running batch 1 overwrites its postings
    # directory and search results are unchanged
    df = (
        spark.read.schema(DOC_SCHEMA).json(drop)
    )
    task._process_batch(df, 1)
    again = {
        r["doc_id"] for r in task.postings_index().search(["alpha"]).collect()
    }
    assert again == {1, 3}

    # fallback: a second task over the same corpus dir but whose
    # postings dir is removed serves identical searches by recomputing
    import shutil

    shutil.rmtree(task._postings_dir())
    recomputed = task.postings_index()
    assert {
        r["doc_id"] for r in recomputed.search(["alpha"]).collect()
    } == {1, 3}

    # empty-corpus path: index over nothing returns no hits
    empty = CorpusIngestTask(
        spark, str(tmp_path / "d2"), str(tmp_path / "c2"),
        checkpoint_dir=str(tmp_path / "k2"), postings=True,
    )
    assert empty.postings_index().search(["alpha"]).count() == 0


def test_ivf_gate_output_incremental_vector_search(spark, tmp_path):
    """ivf_cells=N: the vector twin of the postings gate — a frozen
    train-once quantizer, per-batch cell-partitioned assignment
    appends, searches equal to assigning the whole corpus against the
    same centroids, replay idempotence, and recompute fallback."""
    import shutil

    from sample_dms_s3_kinesis_spark.operators.similarity import (
        IvfIndex,
        ivf_assign,
    )
    from pyspark.sql import functions as F

    def vec(i):
        return [float(i % 5), float((i * 3) % 7), float(i % 2), 1.0]

    drop = str(tmp_path / "drop")
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        ivf_cells=4,
    )
    _drop_vec(drop, "c1.json", [
        (i, f"doc number {i} body{i}", vec(i)) for i in range(8)
    ])
    task.process_available()
    for f in os.listdir(drop):
        os.remove(os.path.join(drop, f))
    _drop_vec(drop, "c2.json", [
        (100 + i, f"later doc {i} text{i}", vec(100 + i)) for i in range(6)
    ] + [(200, "no vector doc here", None)])
    task.process_available()

    idx = task.ivf_index()
    # reference: same frozen centroids, assignment recomputed over the
    # whole admitted corpus
    corpus_vec = task.corpus().filter(
        F.col("embedding").isNotNull()
    ).select("doc_id", "embedding")
    ref = IvfIndex(
        idx.centroids,
        corpus_vec.join(
            ivf_assign(
                corpus_vec, idx.centroids,
                vec_col="embedding", id_col="doc_id",
            ),
            on="doc_id",
        ).select("doc_id", "embedding", "cell"),
        vec_col="embedding",
        id_col="doc_id",
    )
    for q in (vec(0), vec(101), [9.0, 9.0, 9.0, 9.0]):
        got = [r["doc_id"] for r in idx.search(q, k=5, nprobe=2).collect()]
        want = [r["doc_id"] for r in ref.search(q, k=5, nprobe=2).collect()]
        assert got == want, q
    assert idx.assigned.count() == 14      # the no-vector doc is absent

    # replay: re-running batch 1 overwrites its assignment, results hold
    from sample_dms_s3_kinesis_spark.streaming.ingest import DOC_SCHEMA

    df = spark.read.schema(DOC_SCHEMA).json(drop)
    task._process_batch(df, 1)
    assert task.ivf_index().assigned.count() == 14

    # fallback: lose the whole assigned store — recompute path serves
    # identical searches from the frozen centroids.  (ref is rebuilt:
    # the replay overwrote corpus part files under the old frame.)
    shutil.rmtree(f"{task._ivf_dir()}/assigned")
    again = task.ivf_index()
    corpus_vec2 = task.corpus().filter(
        F.col("embedding").isNotNull()
    ).select("doc_id", "embedding")
    ref2 = IvfIndex(
        again.centroids,
        corpus_vec2.join(
            ivf_assign(
                corpus_vec2, again.centroids,
                vec_col="embedding", id_col="doc_id",
            ),
            on="doc_id",
        ).select("doc_id", "embedding", "cell"),
        vec_col="embedding",
        id_col="doc_id",
    )
    for q in (vec(0), vec(101)):
        assert [r["doc_id"] for r in again.search(q, k=5, nprobe=2).collect()] == [
            r["doc_id"] for r in ref2.search(q, k=5, nprobe=2).collect()
        ]

    # no quantizer yet: clean error
    import pytest as _pytest

    bare = CorpusIngestTask(
        spark, str(tmp_path / "d2"), str(tmp_path / "c2"),
        checkpoint_dir=str(tmp_path / "k2"), ivf_cells=4,
    )
    with _pytest.raises(ValueError, match="no IVF quantizer"):
        bare.ivf_index()


def test_stream_restart_requires_original_checkpoint(spark, tmp_path):
    """r6 review: restarting a populated corpus with a different
    checkpoint would replay epoch ids over existing batch dirs."""
    import pytest

    drop = str(tmp_path / "drop")
    corpus = str(tmp_path / "corpus")
    task = CorpusIngestTask(
        spark, drop, corpus, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "c1.json", [(1, "alpha beta gamma")])
    task.start()
    deadline = time.time() + 90
    while time.time() < deadline and not task._load_manifest():
        time.sleep(0.5)
    task.stop()
    assert task.corpus().count() == 1
    # same checkpoint: fine
    t2 = CorpusIngestTask(
        spark, drop, corpus, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    t2.start()
    t2.stop()
    # different checkpoint over a populated corpus: refused
    t3 = CorpusIngestTask(
        spark, drop, corpus, checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    with pytest.raises(ValueError, match="reuse the original"):
        t3.start()


def test_check_expectations_empty_frame_passes(spark):
    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.operators import quality

    empty = spark.createDataFrame([], "x long")
    rows = quality.check_expectations(
        empty, [quality.not_null("x_nn", "x")]
    ).collect()
    assert rows[0]["n_violations"] == 0 and rows[0]["passed"] is True


def test_html_extraction_mode_gates_on_content(spark, tmp_path):
    """extract_html=True: raw crawl pages extract BEFORE the gates —
    markup-variant mirrors dedup exactly, boilerplate-only pages
    reject, and the corpus stores extracted text."""
    drop = str(tmp_path / "drop")
    task = CorpusIngestTask(
        spark, drop, str(tmp_path / "corpus"),
        extract_html=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "crawl1.json", [
        (1, "<html><body><p>alpha beta gamma</p>"
            "<script>var x=1;</script></body></html>"),
        # same CONTENT as 1 under different markup -> exact dup
        (2, "<div><b>alpha</b> beta   gamma</div>"),
        # boilerplate-only page -> empty extraction -> rejected
        (3, "<style>p{}</style><!-- tracking pixel -->"),
        (4, "<h1>delta &amp; epsilon</h1>"),
    ])
    task.process_available()
    rows = {r["doc_id"]: r["text"] for r in task.corpus().collect()}
    assert rows == {1: "alpha beta gamma", 4: "delta & epsilon"}
    stats = task.ingest_stats()
    assert stats["admitted"] == 2
    assert stats["dropped_exact"] == 1   # doc 2, markup variant of 1
    assert stats["rejected"] == 1        # doc 3, empty extraction


def _warc_record(uri, body, status=200):
    payload = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n{body}"
    )
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n"
        f"{payload}\r\n\r\n"
    )


def test_warc_input_mode_e2e(spark, tmp_path):
    """input_format='warc' + extract_html=True: WARC containers in the
    drop dir feed the same admission pipeline — container-level filters
    (request records, non-200) apply before the gates, markup variants
    dedup exactly, boilerplate pages reject, cross-batch dedup holds,
    and URIs without a /p/<n> path get a stable xxhash64 doc_id."""
    from pyspark.sql import functions as F

    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        doc_id_pattern=r"/p/([0-9]+)$",
        extract_html=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    b1 = (
        _warc_record(
            "https://a.com/p/1",
            "<html><body><p>alpha beta gamma</p></body></html>",
        )
        # same CONTENT as doc 1 under different markup -> exact dup
        + _warc_record("https://b.com/p/2", "<div><b>alpha</b> beta   gamma</div>")
        # boilerplate-only page -> empty extraction -> rejected
        + _warc_record("https://c.com/p/3", "<style>p{}</style>")
        # crawler bookkeeping: filtered at the container boundary
        + (
            "WARC/1.0\r\nWARC-Type: request\r\n"
            "WARC-Target-URI: https://a.com/p/1\r\n"
            "Content-Length: 3\r\n\r\nGET\r\n\r\n"
        )
        # non-200: filtered at the container boundary
        + _warc_record("https://d.com/p/4", "<p>gone away now</p>", status=404)
    )
    (drop / "b1.warc").write_text(b1)
    task.process_available()
    rows = {r["doc_id"]: r["text"] for r in task.corpus().collect()}
    assert rows == {1: "alpha beta gamma"}
    stats = task.ingest_stats()
    assert stats["admitted"] == 1
    assert stats["dropped_exact"] == 1  # doc 2, markup variant of 1
    assert stats["rejected"] == 1  # doc 3, boilerplate-only

    b2 = (
        # cross-batch dup vs the corpus state
        _warc_record("https://e.com/p/5", "<p>alpha beta gamma</p>")
        + _warc_record("https://f.com/page", "<p>delta epsilon</p>")
    )
    (drop / "b1.warc").unlink()
    (drop / "b2.warc").write_text(b2)
    task.process_available()
    hashed_id = (
        spark.range(1)
        .select(F.xxhash64(F.lit("https://f.com/page")))
        .collect()[0][0]
    )
    rows = {r["doc_id"]: r["text"] for r in task.corpus().collect()}
    assert rows == {1: "alpha beta gamma", hashed_id: "delta epsilon"}
    stats = task.ingest_stats()
    assert stats["admitted"] == 2
    assert stats["dropped_exact"] == 2


def test_warc_input_mode_streaming(spark, tmp_path):
    """The streaming path reads WARC drops too (readStream text fold
    behind the same source frame)."""
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        doc_id_pattern=r"/p/([0-9]+)$",
        extract_html=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    (drop / "b1.warc").write_text(
        _warc_record("https://a.com/p/7", "<p>seven seas content</p>")
    )
    task.start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            task._query.processAllAvailable()
            if task.ingest_stats().get("admitted", 0) >= 1:
                break
            time.sleep(0.5)
    finally:
        task.stop()
    rows = {r["doc_id"]: r["text"] for r in task.corpus().collect()}
    assert rows == {7: "seven seas content"}


def test_input_format_validation(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="input_format"):
        CorpusIngestTask(
            spark,
            str(tmp_path / "d"),
            str(tmp_path / "c"),
            input_format="parquet",
        )


def test_warc_uri_less_response_dropped(spark, tmp_path):
    """A response without WARC-Target-URI has no doc identity
    (xxhash64(NULL) is a constant) — it must drop at the container
    boundary, not collapse onto a shared doc_id."""
    drop = tmp_path / "drop"
    drop.mkdir()
    payload = "HTTP/1.1 200 OK\r\n\r\n<p>anonymous page content</p>"
    no_uri = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n"
        f"{payload}\r\n\r\n"
    )
    (drop / "b1.warc").write_text(
        no_uri + _warc_record("https://a.com/p/9", "<p>named page content</p>")
    )
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        doc_id_pattern=r"/p/([0-9]+)$",
        extract_html=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    task.process_available()
    rows = {r["doc_id"]: r["text"] for r in task.corpus().collect()}
    assert rows == {9: "named page content"}


def test_warc_gz_input_mode(spark, tmp_path):
    """input_format='warc_gz': gzipped containers drain through the
    same admission pipeline, batch and streaming."""
    import gzip

    drop = tmp_path / "drop"
    drop.mkdir()
    recs = _warc_record(
        "https://a.com/p/11", "<p>eleven plus content</p>"
    ) + _warc_record("https://a.com/p/12", "<p>twelve more content</p>")
    (drop / "b1.warc.gz").write_bytes(gzip.compress(recs.encode()))
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc_gz",
        doc_id_pattern=r"/p/([0-9]+)$",
        extract_html=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    task.process_available()
    rows = {r["doc_id"]: r["text"] for r in task.corpus().collect()}
    assert rows == {11: "eleven plus content", 12: "twelve more content"}

    # streaming: a second container arrives while the stream runs
    task2 = CorpusIngestTask(
        spark,
        str(tmp_path / "drop2"),
        str(tmp_path / "corpus2"),
        input_format="warc_gz",
        doc_id_pattern=r"/p/([0-9]+)$",
        extract_html=True,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    os.makedirs(str(tmp_path / "drop2"))
    (tmp_path / "drop2" / "s1.warc.gz").write_bytes(
        gzip.compress(
            _warc_record(
                "https://b.com/p/21", "<p>stream twenty one</p>"
            ).encode()
        )
    )
    task2.start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            task2._query.processAllAvailable()
            if task2.ingest_stats().get("admitted", 0) >= 1:
                break
            time.sleep(0.5)
    finally:
        task2.stop()
    rows = {r["doc_id"]: r["text"] for r in task2.corpus().collect()}
    assert rows == {21: "stream twenty one"}


def test_warc_default_doc_id_no_cross_host_aliasing(spark, tmp_path):
    """Without an explicit doc_id_pattern, identity is the URI hash:
    a.com/p/7 and b.com/p/7 are DIFFERENT documents (a suffix pattern
    would alias them — that is why the pattern is opt-in)."""
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "b1.warc").write_text(
        _warc_record("https://a.com/p/7", "<p>page from host a</p>")
        + _warc_record("https://b.com/p/7", "<p>page from host b</p>")
    )
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    task.process_available()
    rows = {r["doc_id"]: r["text"] for r in task.corpus().collect()}
    assert len(rows) == 2
    assert sorted(rows.values()) == ["page from host a", "page from host b"]


def test_robots_gate_quarantines_and_counts(spark, tmp_path):
    """Politeness gate: robots_rules disallow pages BEFORE any content
    gate — denied pages land in the per-batch _quarantine_robots store
    with rejected_robots counted next to rejected_contract, replay is
    idempotent, and hosts without rules pass.  JSONL mode (no URI to
    judge) refuses the parameter."""
    import pytest

    from sample_dms_s3_kinesis_spark.operators import robots as _robots

    rules = _robots.parse_robots(
        spark.createDataFrame(
            [("a.com", "User-agent: *\nDisallow: /private\n")],
            "host string, robots_txt string",
        )
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        doc_id_pattern=r"/p/([0-9]+)$",
        extract_html=True,
        robots_rules=rules,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    b1 = (
        _warc_record("https://a.com/p/1", "<p>public page one</p>")
        # a.com/private/* disallowed for '*'
        + _warc_record(
            "https://a.com/private/p/2", "<p>secret page two</p>"
        )
        # same path on a RULE-LESS host: allowed
        + _warc_record(
            "https://b.com/private/p/3", "<p>other host page</p>"
        )
    )
    (drop / "b1.warc").write_text(b1)
    task.process_available()
    rows = {r["doc_id"]: r["text"] for r in task.corpus().collect()}
    assert rows == {1: "public page one", 3: "other host page"}
    stats = task.ingest_stats()
    assert stats["admitted"] == 2
    assert stats["rejected_robots"] == 1
    assert stats["rejected"] == 0
    q = {
        (r["doc_id"], r["target_uri"], r["batch_id"])
        for r in task.robots_quarantined().collect()
    }
    assert q == {(2, "https://a.com/private/p/2", 0)}

    # replay of batch 0: keyed manifest upsert + overwrite stores keep
    # every count and both side channels unchanged
    task._process_batch(task._source_frame(streaming=False), 0)
    assert task.ingest_stats() == stats
    assert {
        (r["doc_id"], r["target_uri"], r["batch_id"])
        for r in task.robots_quarantined().collect()
    } == q
    assert {r["doc_id"] for r in task.corpus().collect()} == {1, 3}

    with pytest.raises(ValueError, match="robots"):
        CorpusIngestTask(
            spark,
            str(drop),
            str(tmp_path / "corpus2"),
            input_format="jsonl",
            robots_rules=rules,
        )


def test_cdx_sidecar_selection(spark, tmp_path):
    """The index-sidecar mode: a CDX drop drains into the selected-
    capture manifest — latest valid capture, status-200, unseen-digest
    anti-join against the admitted corpus, per-host cap — and a
    REPLAYED sidecar selects nothing new (idempotence keyed on the
    already-selected store)."""
    import hashlib

    from pyspark.sql import functions as F

    drop = tmp_path / "drop"
    cdx = tmp_path / "cdx"
    drop.mkdir()
    cdx.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        cdx_dir=str(cdx),
        cdx_schema="url string, status string, digest string",
        cdx_max_per_host=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # corpus: one admitted doc whose digest the sidecar must treat as seen
    seen_text = "alpha bravo charlie delta"
    (drop / "b1.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": seen_text}) + "\n"
    )
    task.process_available()

    def line(urlkey, ts, url, status, digest):
        import json as _j

        return f"{urlkey} {ts} " + _j.dumps(
            {"url": url, "status": status, "digest": digest}
        )

    seen = hashlib.md5(seen_text.encode()).hexdigest()
    lines = [
        # k1: latest capture's digest is already admitted -> not selected
        line("org,h1)/a", "20240101000000", "https://h1.org/a", "200", "d-old"),
        line("org,h1)/a", "20240301000000", "https://h1.org/a", "200", seen),
        # k2: unseen -> selected (h1's single slot)
        line("org,h1)/b", "20240101000000", "https://h1.org/b", "200", "d2"),
        # k3: latest is a 404 -> dropped at the status gate
        line("org,h2)/c", "20240101000000", "https://h2.org/c", "404", "d3"),
        # k4/k5: both unseen on h2; cap=1 selects the first by urlkey
        line("org,h2)/d", "20240101000000", "https://h2.org/d", "200", "d4"),
        line("org,h2)/e", "20240101000000", "https://h2.org/e", "200", "d5"),
        "malformed line without a json block",
    ]
    (cdx / "s1.cdx").write_text("\n".join(lines) + "\n")
    task.process_cdx_available()
    got = {
        r["urlkey"]: r for r in task.selected_captures().collect()
    }
    assert set(got) == {"org,h1)/b", "org,h2)/d"}
    assert got["org,h1)/b"]["host"] == "h1.org"
    assert got["org,h1)/b"]["digest"] == "d2"
    assert got["org,h2)/d"]["batch_id"] == 0
    stats = task.cdx_stats()
    assert stats == {
        "n_rejects": 1,
        "n_latest": 5,
        "n_200": 4,
        "n_unseen": 3,
        "n_selected": 2,
    }
    # replay: the same sidecar drains again -> nothing new selected
    # (k5 re-counts as unseen — counters are per-attempt, like the
    # corpus manifest's — but the cumulative per-host budget keeps it
    # out of the selected store)
    task.process_cdx_available()
    assert task.selected_captures().count() == 2
    s2 = task.cdx_stats()
    assert s2["n_selected"] == 2 and s2["n_unseen"] == 4
    # a second sidecar: an already-selected capture re-appears (0 new),
    # a fresh capture on h1 loses to the CUMULATIVE host budget (h1's
    # single slot went to /b in batch 0), and a new host's capture
    # takes h3's free slot
    (cdx / "s1.cdx").unlink()
    (cdx / "s2.cdx").write_text(
        line("org,h1)/b", "20240101000000", "https://h1.org/b", "200", "d2")
        + "\n"
        + line("org,h1)/f", "20240501000000", "https://h1.org/f", "200", "d6")
        + "\n"
        + line("org,h3)/g", "20240501000000", "https://h3.org/g", "200", "d7")
        + "\n"
    )
    task.process_cdx_available()
    sel = {r["urlkey"]: r for r in task.selected_captures().collect()}
    assert set(sel) == {"org,h1)/b", "org,h2)/d", "org,h3)/g"}
    assert sel["org,h3)/g"]["batch_id"] == 2
    # validation: cdx_dir without a schema / schema missing the
    # selection fields
    import pytest

    with pytest.raises(ValueError, match="cdx_schema"):
        CorpusIngestTask(
            spark, str(drop), str(tmp_path / "c2"), cdx_dir=str(cdx)
        )
    with pytest.raises(ValueError, match="digest"):
        CorpusIngestTask(
            spark,
            str(drop),
            str(tmp_path / "c3"),
            cdx_dir=str(cdx),
            cdx_schema="url string, status string",
        )


def _warc_page(uri, body):
    return _warc_record(uri, f"<html><body>{body}</body></html>")


def test_link_discovery_frontier(spark, tmp_path):
    """discover_links=True: every fetched page's anchors resolve into
    the cumulative _frontier store — absolute/relative/root-relative
    forms resolve, decoys drop, same-batch fetched URIs and admitted
    pages are excluded, earlier discoveries are not re-listed, the
    per-host budget is CUMULATIVE across batches, and a batch replay
    changes nothing."""
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        frontier_max_per_host=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    b1 = (
        _warc_page(
            "https://a.com/dir/p1.html",
            '<p>alpha one</p>'
            '<a href="https://b.com/x">abs</a>'
            "<a href='../q/r.html'>rel</a>"
            '<a href="/s">root</a>'
            '<a href="https://a.com/dir/p2.html">same batch</a>'
            '<a href="mailto:z@a.com">decoy</a>'
            '<a href="#top">decoy</a>',
        )
        + _warc_page(
            "https://a.com/dir/p2.html",
            '<p>beta two</p><a href="https://b.com/x">dup across pages</a>',
        )
    )
    (drop / "b1.warc").write_text(b1)
    batch = task._source_frame(streaming=False)
    task._process_batch(batch, 0)

    got = {
        (r["url"], r["host"], r["batch_id"])
        for r in task.discovered_frontier().collect()
    }
    assert got == {
        ("https://b.com/x", "b.com", 0),
        ("https://a.com/q/r.html", "a.com", 0),
        ("https://a.com/s", "a.com", 0),
    }
    stats = task.frontier_stats()
    # 5 resolved link instances (decoys dropped): p1's abs/rel/root/
    # same-batch + p2's cross-page dup; 4 unique; 3 survive the gates
    # (the same-batch URI drops, a.com budget 2 exactly holds)
    assert stats == {
        "discovered_links": 5,
        "discovered_unique": 4,
        "discovered_redirects": 0,
        "frontier_new": 3,
    }

    # replay of batch 0: same store, same counters
    task._process_batch(batch, 0)
    assert {
        (r["url"], r["host"], r["batch_id"])
        for r in task.discovered_frontier().collect()
    } == got
    assert task.frontier_stats() == stats

    # batch 1: an already-discovered URL is not re-listed, an admitted
    # page's URL is not listed, a.com's budget is already spent, and a
    # fresh host URL lands
    b2 = _warc_page(
        "https://c.com/page",
        '<p>gamma three</p>'
        '<a href="https://b.com/x">seen in batch 0</a>'
        '<a href="https://a.com/dir/p1.html">already admitted</a>'
        '<a href="https://a.com/extra">budget spent</a>'
        '<a href="https://d.com/fresh">new</a>',
    )
    (drop / "b1.warc").unlink()
    (drop / "b2.warc").write_text(b2)
    task._process_batch(task._source_frame(streaming=False), 1)
    got2 = {
        (r["url"], r["host"], r["batch_id"])
        for r in task.discovered_frontier().collect()
    }
    assert got2 == got | {("https://d.com/fresh", "d.com", 1)}
    assert task.frontier_stats() == {
        "discovered_links": 9,
        "discovered_unique": 8,  # per-batch unique counts, summed
        "discovered_redirects": 0,
        "frontier_new": 4,
    }


def test_discover_links_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="discover_links requires"):
        CorpusIngestTask(
            spark, str(tmp_path / "d"), str(tmp_path / "c"),
            discover_links=True,
        )
    with pytest.raises(ValueError, match="frontier_max_per_host"):
        CorpusIngestTask(
            spark, str(tmp_path / "d"), str(tmp_path / "c"),
            input_format="warc", frontier_max_per_host=3,
        )
    task = CorpusIngestTask(
        spark, str(tmp_path / "d"), str(tmp_path / "c"),
        input_format="warc",
    )
    with pytest.raises(ValueError, match="discovered_frontier requires"):
        task.discovered_frontier()


def test_frontier_surt_key_collapses_mirrors(spark, tmp_path):
    """frontier_key='surt': mirror spellings of one page (www./port/
    query-order variants) enter the frontier ONCE — the smallest URL
    is the representative — and a NEW mirror spelling in a later batch
    does not re-enter; fetch_plan serves the politeness schedule."""
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        frontier_key="surt",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    b1 = _warc_page(
        "https://h.com/p",
        "<p>alpha page</p>"
        '<a href="https://www.m.com/A/B?x=1&amp;y=2">m1</a>'
        '<a href="http://M.com:8080/a/b?y=2&amp;x=1">m2</a>'
        '<a href="https://other.com/z">o</a>',
    )
    (drop / "b1.warc").write_text(b1)
    task._process_batch(task._source_frame(streaming=False), 0)
    rows = {
        (r["url"], r["host"], r["urlkey"])
        for r in task.discovered_frontier().collect()
    }
    # min() of the two mirror URLs is the http:// spelling
    assert rows == {
        (
            "http://M.com:8080/a/b?y=2&x=1",
            "m.com",
            "com,m)/a/b?x=1&y=2",
        ),
        ("https://other.com/z", "other.com", "com,other)/z"),
    }
    assert task.frontier_stats() == {
        "discovered_links": 3,
        "discovered_unique": 3,
        "discovered_redirects": 0,
        "frontier_new": 2,
    }

    # a THIRD mirror spelling in batch 1: same surt key -> not re-added
    b2 = _warc_page(
        "https://h.com/q",
        '<p>beta page</p><a href="https://www2.m.com/a/b?x=1&amp;y=2#f">m3</a>',
    )
    (drop / "b1.warc").unlink()
    (drop / "b2.warc").write_text(b2)
    task._process_batch(task._source_frame(streaming=False), 1)
    assert {
        (r["url"], r["host"], r["urlkey"])
        for r in task.discovered_frontier().collect()
    } == rows
    assert task.frontier_stats()["frontier_new"] == 2

    # fetch_plan: both frontier URLs are on distinct hosts -> wave 1,
    # offset 0; with a delays frame the offsets honor it
    plan = {
        (r["host"], r["wave"], r["fetch_offset_s"])
        for r in task.fetch_plan().collect()
    }
    assert plan == {("m.com", 1, 0.0), ("other.com", 1, 0.0)}

    # rate-limit feedback: a (host, backoff_s) frame shifts that
    # host's offsets out; the clean host is untouched
    bk = spark.createDataFrame(
        [("m.com", 90.0)], "host string, backoff_s double"
    )
    plan_bk = {
        (r["host"], r["wave"], r["fetch_offset_s"])
        for r in task.fetch_plan(backoff=bk).collect()
    }
    assert plan_bk == {("m.com", 1, 90.0), ("other.com", 1, 0.0)}


def test_frontier_key_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="frontier_key must be"):
        CorpusIngestTask(
            spark, str(tmp_path / "d"), str(tmp_path / "c"),
            input_format="warc", discover_links=True,
            frontier_key="md5",
        )
    with pytest.raises(ValueError, match="frontier_key requires"):
        CorpusIngestTask(
            spark, str(tmp_path / "d"), str(tmp_path / "c"),
            input_format="warc", frontier_key="surt",
        )


def test_frontier_honors_base_href(spark, tmp_path):
    """A page's <base href> declaration (itself resolved against the
    page URI) overrides the resolution base for its links."""
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    b1 = _warc_page(
        "https://h.com/deep/dir/p.html",
        '<base href="/top/"><p>page one</p>'
        '<a href="rel.html">against base tag</a>'
        '<a href="/abs.html">root still host</a>',
    ) + _warc_page(
        "https://h.com/other/q.html",
        '<base href="https://cdn.h.com/lib/"><p>page two</p>'
        '<a href="x.js">cross-host base</a>',
    )
    (drop / "b1.warc").write_text(b1)
    task._process_batch(task._source_frame(streaming=False), 0)
    got = {
        (r["url"], r["host"]) for r in task.discovered_frontier().collect()
    }
    assert got == {
        ("https://h.com/top/rel.html", "h.com"),
        ("https://h.com/abs.html", "h.com"),
        ("https://cdn.h.com/lib/x.js", "cdn.h.com"),
    }


def test_fetch_plan_drops_robots_denied(spark, tmp_path):
    """fetch_plan never schedules a URL the task's robots rules
    disallow — the allow/deny twin of the Crawl-delay spacing."""
    from sample_dms_s3_kinesis_spark.operators.robots import parse_robots

    drop = tmp_path / "drop"
    drop.mkdir()
    rules = parse_robots(
        spark.createDataFrame(
            [("b.com", "User-agent: *\nDisallow: /private\n")],
            "host string, robots_txt string",
        )
    )
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        robots_rules=rules,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    b1 = _warc_page(
        "https://a.com/p",
        "<p>alpha page</p>"
        '<a href="https://b.com/private/x">denied</a>'
        '<a href="https://b.com/open/y">allowed</a>'
        '<a href="https://c.com/z">rule-less host</a>',
    )
    (drop / "b1.warc").write_text(b1)
    task._process_batch(task._source_frame(streaming=False), 0)
    # discovery keeps all three (the frontier records what exists);
    # scheduling drops the denied one
    assert task.frontier_stats()["frontier_new"] == 3
    plan = {r["url"] for r in task.fetch_plan().collect()}
    assert plan == {"https://b.com/open/y", "https://c.com/z"}


def test_frontier_ingests_fetched_sitemaps(spark, tmp_path):
    """A fetched sitemap document contributes its <loc> entries (page
    URLs AND child sitemaps) to the frontier; its entity-escaped locs
    decode, and already-crawled locs still gate out."""
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    sitemap = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://s.com/p1?a=1&amp;b=2</loc></url>"
        "<url><loc>/rel/p2</loc></url>"
        "</urlset>"
    )
    index = (
        "<sitemapindex>"
        "<sitemap><loc>https://s.com/sitemap-2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    b1 = (
        _warc_record("https://s.com/sitemap.xml", sitemap)
        + _warc_record("https://s.com/sitemap-idx.xml", index)
        + _warc_page(
            "https://s.com/page",
            '<p>normal page</p><a href="https://s.com/p3">x</a>',
        )
    )
    (drop / "b1.warc").write_text(b1)
    task._process_batch(task._source_frame(streaming=False), 0)
    got = {r["url"] for r in task.discovered_frontier().collect()}
    assert got == {
        "https://s.com/p1?a=1&b=2",     # entity-decoded loc
        "https://s.com/rel/p2",          # relative loc resolves
        "https://s.com/sitemap-2.xml",   # child sitemap enters too
        "https://s.com/p3",              # anchors still work
    }
    # the sitemap XML files themselves never enter the corpus
    texts = [r["text"] for r in task.corpus().collect()]
    assert texts == ["normal page\nx"]
    stats = task.ingest_stats()
    assert stats["admitted"] == 1
    manifest = task._load_manifest()
    assert manifest["0"]["rejected_sitemap"] == 2
    assert manifest["0"]["rejected"] == 0


def test_fetch_plan_unifies_cdx_and_link_modalities(spark, tmp_path):
    """include_cdx=True merges CDX-selected capture URLs into the fetch
    plan; a URL both linked-to and index-selected schedules ONCE."""
    drop = tmp_path / "drop"
    cdx = tmp_path / "cdx"
    drop.mkdir()
    cdx.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        cdx_dir=str(cdx),
        cdx_schema="url string, status string, digest string",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    b1 = _warc_page(
        "https://a.com/p",
        '<p>alpha</p><a href="https://b.com/shared">s</a>'
        '<a href="https://b.com/linkonly">l</a>',
    )
    (drop / "b1.warc").write_text(b1)
    task._process_batch(task._source_frame(streaming=False), 0)
    (cdx / "s1.cdx").write_text(
        'com,b)/shared 20240101000000 {"url": "https://b.com/shared", '
        '"status": "200", "digest": "d1"}\n'
        'com,c)/cdxonly 20240101000000 {"url": "https://c.com/cdxonly", '
        '"status": "200", "digest": "d2"}\n'
    )
    task.process_cdx_available()
    plan = {(r["url"], r["host"]) for r in task.fetch_plan(include_cdx=True).collect()}
    assert plan == {
        ("https://b.com/shared", "b.com"),
        ("https://b.com/linkonly", "b.com"),
        ("https://c.com/cdxonly", "c.com"),
    }
    # waves: b.com URLs serialize, c.com independent
    waves = {
        r["url"]: r["wave"]
        for r in task.fetch_plan(include_cdx=True).collect()
    }
    assert sorted(
        w for u, w in waves.items() if u.startswith("https://b.com")
    ) == [1, 2]
    assert waves["https://c.com/cdxonly"] == 1
    with pytest.raises(ValueError, match="include_cdx"):
        CorpusIngestTask(
            spark, str(drop), str(tmp_path / "c2"),
            input_format="warc", discover_links=True,
            checkpoint_dir=str(tmp_path / "ckpt2"),
        ).fetch_plan(include_cdx=True)


def test_fetch_plan_is_pending_work_only(spark, tmp_path):
    """Once a frontier URL's page is fetched and admitted, it drops
    out of fetch_plan — the stores stay append-only, the plan is the
    remaining work."""
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    b1 = _warc_page(
        "https://a.com/p",
        '<p>alpha</p><a href="https://b.com/next">n</a>'
        '<a href="https://c.com/later">l</a>',
    )
    (drop / "b1.warc").write_text(b1)
    task._process_batch(task._source_frame(streaming=False), 0)
    assert {r["url"] for r in task.fetch_plan().collect()} == {
        "https://b.com/next",
        "https://c.com/later",
    }
    # the fetch tier retrieves b.com/next; batch 1 admits it
    b2 = _warc_page("https://b.com/next", "<p>beta body</p>")
    (drop / "b1.warc").unlink()
    (drop / "b2.warc").write_text(b2)
    task._process_batch(task._source_frame(streaming=False), 1)
    # the fetched URL leaves the plan; the frontier store still has it
    assert {r["url"] for r in task.fetch_plan().collect()} == {
        "https://c.com/later"
    }
    assert {r["url"] for r in task.discovered_frontier().collect()} == {
        "https://b.com/next",
        "https://c.com/later",
    }


def test_extract_mode_main_strips_boilerplate(spark, tmp_path):
    """extract_mode='main' drops link-dense/short blocks before any
    gate, so two mirrors differing only in boilerplate dedup exactly
    and a nav-only page rejects."""
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        extract_mode="main",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    nav = (
        '<div><a href="/1">one</a> <a href="/2">two</a> '
        '<a href="/3">three</a></div>'
    )
    content = "<p>the quick brown fox jumps over the lazy dog now</p>"
    b1 = (
        _warc_record("https://a.com/p/1", f"<html><body>{nav}{content}</body></html>")
        # mirror: same content, DIFFERENT nav boilerplate
        + _warc_record(
            "https://b.com/p/2",
            '<html><body><div><a href="/x">x</a> <a href="/y">y</a> '
            f"<a href=\"/z\">zzz</a></div>{content}</body></html>",
        )
        # nav-only page: everything strips -> rejected
        + _warc_record("https://c.com/p/3", f"<html><body>{nav}</body></html>")
    )
    (drop / "b1.warc").write_text(b1)
    task._process_batch(task._source_frame(streaming=False), 0)
    rows = {r["doc_id"]: r["text"] for r in task.corpus().collect()}
    assert list(rows.values()) == [
        "the quick brown fox jumps over the lazy dog now"
    ]
    stats = task.ingest_stats()
    assert stats["admitted"] == 1
    assert stats["dropped_exact"] == 1   # the boilerplate-only mirror
    assert stats["rejected"] == 1        # the nav-only page


def test_extract_mode_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="extract_mode must be"):
        CorpusIngestTask(
            spark, str(tmp_path / "d"), str(tmp_path / "c"),
            input_format="warc", extract_html=True, extract_mode="x",
        )
    with pytest.raises(ValueError, match="extract_mode requires"):
        CorpusIngestTask(
            spark, str(tmp_path / "d"), str(tmp_path / "c"),
            input_format="warc", extract_mode="main",
        )


def _warc_redirect(uri, location, status=301):
    payload = (
        f"HTTP/1.1 {status} Moved\r\nContent-Type: text/html\r\n"
        f"Location: {location}\r\n\r\n<html><body>moved</body></html>"
    )
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n"
        f"{payload}\r\n\r\n"
    )


def test_follow_redirects_feeds_frontier(spark, tmp_path):
    """follow_redirects=True: 3xx Location targets enter the SAME
    frontier the anchors feed — relative Locations resolve against the
    source URI, robots-denied sources contribute nothing, a target
    already fetched this batch is excluded, an anchor pointing AT a
    redirect source is excluded (it was fetched — EVEN a robots-denied
    one), the redirect rows never reach the corpus, and a replay
    changes nothing."""
    from sample_dms_s3_kinesis_spark.operators.robots import parse_robots

    drop = tmp_path / "drop"
    drop.mkdir()
    rules = parse_robots(
        spark.createDataFrame(
            [("deny.com", "User-agent: *\nDisallow: /x\n")],
            "host string, robots_txt string",
        )
    )
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        follow_redirects=True,
        robots_rules=rules,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    b1 = (
        _warc_page(
            "https://a.com/p1",
            "<p>alpha content here</p>"
            '<a href="https://b.com/keep">keep</a>'
            '<a href="https://a.com/old">redirecting source</a>'
            '<a href="https://deny.com/x">denied redirecting source</a>',
        )
        + _warc_redirect("https://a.com/old", "https://a.com/new")
        + _warc_redirect("https://b.com/r", "/moved", status=302)
        + _warc_redirect("https://deny.com/x", "https://deny.com/y")
        + _warc_redirect("https://a.com/self", "https://a.com/p1")
    )
    (drop / "b1.warc").write_text(b1)
    batch = task._source_frame(streaming=False)
    task._process_batch(batch, 0)

    got = {
        (r["url"], r["host"]) for r in task.discovered_frontier().collect()
    }
    assert got == {
        ("https://b.com/keep", "b.com"),  # anchor
        ("https://a.com/new", "a.com"),  # absolute Location
        ("https://b.com/moved", "b.com"),  # relative Location resolved
    }
    stats = task.frontier_stats()
    # 3 anchors resolve; 3 redirect edges survive robots (deny.com/x
    # drops); targets a.com/p1 (admitted this batch) and the anchored
    # a.com/old AND deny.com/x (fetched redirect sources — the denied
    # one too) are gated out
    assert stats == {
        "discovered_links": 3,
        "discovered_unique": 3,
        "discovered_redirects": 3,
        "frontier_new": 3,
    }
    # redirect rows are navigation artifacts — only the page admits
    assert task.corpus().count() == 1

    # replay: same store, same counters
    task._process_batch(batch, 0)
    assert {
        (r["url"], r["host"]) for r in task.discovered_frontier().collect()
    } == got
    assert task.frontier_stats() == stats


def test_follow_redirects_streaming(spark, tmp_path):
    """The streaming source frame unions the redirect plumbing rows
    (a self-union of one file stream) — targets land in the frontier
    through the normal micro-batch path."""
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        follow_redirects=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    (drop / "b1.warc").write_text(
        _warc_page("https://a.com/p1", "<p>page body text</p>")
        + _warc_redirect("https://a.com/old", "https://c.com/new")
    )
    task.start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            task._query.processAllAvailable()
            if task.frontier_stats().get("frontier_new", 0) >= 1:
                break
            time.sleep(0.5)
    finally:
        task.stop()
    assert {
        r["url"] for r in task.discovered_frontier().collect()
    } == {"https://c.com/new"}
    assert task.ingest_stats().get("admitted") == 1


def test_on_page_robots_gates(spark, tmp_path):
    """on_page_robots=True: a noindex page (meta or X-Robots-Tag) is
    never admitted (quarantined + counted rejected_noindex) but its
    links STILL feed the frontier; a nofollow page is admitted but
    contributes no frontier edges (counted nofollow_pages) and stays
    in the fetched anti-join; 'none' means both."""
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        on_page_robots=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    def _page(uri, body, extra_header=""):
        payload = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"{extra_header}\r\n<html><body>{body}</body></html>"
        )
        return (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload.encode())}\r\n\r\n"
            f"{payload}\r\n\r\n"
        )

    b1 = (
        _page(
            "https://a.com/plain",
            '<p>plain page body</p><a href="https://x.com/from-plain">l</a>'
            '<a href="https://x.com/nf-link" rel="nofollow">n</a>',
        )
        + _page(
            "https://a.com/noindex",
            '<meta name="robots" content="noindex">'
            '<p>noindex body</p><a href="https://x.com/from-noindex">l</a>',
        )
        + _page(
            "https://a.com/nofollow",
            '<meta name="robots" content="nofollow">'
            '<p>nofollow body</p><a href="https://x.com/from-nofollow">l</a>'
            '<a href="https://a.com/nofollow-target">t</a>',
        )
        + _page(
            "https://a.com/none",
            '<p>none body</p><a href="https://x.com/from-none">l</a>',
            extra_header="X-Robots-Tag: none\r\n",
        )
    )
    (drop / "b1.warc").write_text(b1)
    task._process_batch(task._source_frame(streaming=False), 0)

    stats = task.ingest_stats()
    assert stats["admitted"] == 2  # plain + nofollow
    assert stats["rejected_noindex"] == 2  # noindex + none
    assert stats["nofollow_pages"] == 2  # nofollow + none
    noidx = {
        r["target_uri"] for r in task.noindex_quarantined().collect()
    }
    assert noidx == {"https://a.com/noindex", "https://a.com/none"}
    frontier = {
        r["url"] for r in task.discovered_frontier().collect()
    }
    # noindex page's links present; nofollow/none pages' links absent;
    # the plain page's rel=nofollow ANCHOR contributes nothing either
    # (the per-link channel)
    assert frontier == {
        "https://x.com/from-plain",
        "https://x.com/from-noindex",
    }

    # a second batch linking AT the nofollow page must not re-frontier
    # it (it was fetched), nor at the QUARANTINED noindex page (it was
    # fetched too — quarantined, never admitted, so the corpus
    # anti-join alone would miss it), while a fresh URL still enters
    b2 = _page(
        "https://b.com/later",
        '<p>later body page</p>'
        '<a href="https://a.com/nofollow">seen</a>'
        '<a href="https://a.com/noindex">quarantined</a>'
        '<a href="https://x.com/fresh">new</a>',
    )
    (drop / "b1.warc").unlink()  # batch 1 must NOT refetch batch 0's
    # pages, or the in-batch fetched set would mask the cross-batch gap
    (drop / "b2.warc").write_text(b2)
    task._process_batch(task._source_frame(streaming=False), 1)
    frontier2 = {
        r["url"] for r in task.discovered_frontier().collect()
    }
    assert "https://x.com/fresh" in frontier2
    assert "https://a.com/nofollow" not in frontier2
    assert "https://a.com/noindex" not in frontier2


def test_nofollow_counted_without_link_discovery(spark, tmp_path):
    """r15 (r14 advice): nofollow_pages is an observability counter
    like rejected_noindex — a discover_links=False batch must still
    report its nofollow pages, not 0 because no frontier exists."""
    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=False,
        on_page_robots=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    def _page(uri, body):
        payload = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"\r\n<html><body>{body}</body></html>"
        )
        return (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload.encode())}\r\n\r\n"
            f"{payload}\r\n\r\n"
        )

    (drop / "b1.warc").write_text(
        _page("https://a.com/plain", "<p>plain page body</p>")
        + _page(
            "https://a.com/nofollow",
            '<meta name="robots" content="nofollow">'
            "<p>nofollow body page</p>",
        )
    )
    task._process_batch(task._source_frame(streaming=False), 0)
    stats = task.ingest_stats()
    assert stats["admitted"] == 2  # nofollow gates links, not admission
    assert stats["nofollow_pages"] == 1


def test_pdf_text_routing(spark, tmp_path):
    """pdf_text=True: an application/pdf 200 routes through the
    text-layer extractor (admitted with its EXTRACTED text, counted
    pdf_extracted) instead of quarantining at the MIME gate; an
    encrypted PDF lands in _quarantine_pdf with its error (counted
    rejected_pdf); non-PDF rejects still flow rejected_mime; a replay
    changes nothing."""
    from sample_dms_s3_kinesis_spark.operators.pdf import encode_pdf
    from sample_dms_s3_kinesis_spark.streaming.ingest import (
        TEXT_MIME_ALLOWLIST,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        mime_allowlist=TEXT_MIME_ALLOWLIST,
        pdf_text=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    def _page(uri, body, content_type):
        ct = (
            f"Content-Type: {content_type}\r\n" if content_type else ""
        )
        payload = f"HTTP/1.1 200 OK\r\n{ct}\r\n{body}"
        return (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload.encode())}\r\n\r\n"
            f"{payload}\r\n\r\n"
        )

    # ASCII (uncompressed) PDFs survive the text-mode WARC reader
    good_pdf = encode_pdf(
        ["report text line one\nline two", "second page text"],
        compress=False,
    ).decode("ascii")
    enc_pdf = encode_pdf(
        ["secret"], compress=False, encrypted=True
    ).decode("ascii")
    (drop / "b1.warc").write_text(
        _page(
            "https://p.com/html",
            "<html><body><p>html page body</p></body></html>",
            "text/html",
        )
        + _page("https://p.com/doc.pdf", good_pdf, "application/pdf")
        + _page("https://p.com/enc.pdf", enc_pdf, "application/pdf")
        + _page("https://p.com/api", '{"k": 1}', "application/json")
        # NO Content-Type at all: the MIME gate admits undeclared
        # pages, and the pdf carve-out's filter must not NULL-drop
        # them (r15 review sweep #1: ~is_pdf is NULL for NULL _mime)
        + _page(
            "https://p.com/untyped",
            "<html><body><p>untyped page body</p></body></html>",
            None,
        )
    )
    batch = task._source_frame(streaming=False)
    task._process_batch(batch, 0)
    task._process_batch(batch, 0)  # replay: idempotent

    stats = task.ingest_stats()
    assert stats["admitted"] == 3  # html + extracted pdf + untyped
    assert stats["pdf_extracted"] == 1  # replay overwrote batch 0
    assert stats["rejected_pdf"] == 1
    assert stats["rejected_mime"] == 1  # json only — pdfs never here
    corpus = {r["text"] for r in task.corpus().collect()}
    assert any("untyped page body" in t for t in corpus)
    assert (
        "report text line one\nline two\n\nsecond page text" in corpus
    )
    assert any("html page body" in t for t in corpus)
    q = task.pdf_quarantined().collect()
    assert {(r["target_uri"], r["error"]) for r in q} == {
        ("https://p.com/enc.pdf", "encrypted")
    }
    mime_q = {r["target_uri"] for r in task.mime_quarantined().collect()}
    assert mime_q == {"https://p.com/api"}


def test_pdf_text_binary_warc_gz(spark, tmp_path):
    """pdf_text over input_format='warc_gz': a REAL binary PDF (Flate
    content streams) — whose bytes the text decode necessarily mangles
    — extracts through the raw-payload route (_pdf_bin ->
    http_entity_bytes), including one served with Content-Encoding:
    gzip; an encrypted binary PDF lands in _quarantine_pdf."""
    import gzip

    from sample_dms_s3_kinesis_spark.operators.pdf import encode_pdf
    from sample_dms_s3_kinesis_spark.streaming.ingest import (
        TEXT_MIME_ALLOWLIST,
    )

    drop = tmp_path / "drop"
    drop.mkdir()

    def _record(uri, body_bytes, extra_headers=b""):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n"
            + extra_headers
            + b"\r\n"
            + body_bytes
        )
        return (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload
            + b"\r\n\r\n"
        )

    def _html(uri, body):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + body.encode()
        )
        return (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload
            + b"\r\n\r\n"
        )

    plain_pdf = encode_pdf(["binary flate page text"])  # real binary
    gz_pdf = encode_pdf(["gzip served pdf text"])
    enc_pdf = encode_pdf(["locked"], encrypted=True)
    recs = (
        _html("https://b.com/html", "<p>binary mode html</p>")
        + _record("https://b.com/plain.pdf", plain_pdf)
        + _record(
            "https://b.com/gz.pdf",
            gzip.compress(gz_pdf),
            extra_headers=b"Content-Encoding: gzip\r\n",
        )
        + _record("https://b.com/enc.pdf", enc_pdf)
    )
    (drop / "b1.warc.gz").write_bytes(gzip.compress(recs))
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc_gz",
        extract_html=True,
        mime_allowlist=TEXT_MIME_ALLOWLIST,
        pdf_text=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    task._process_batch(task._source_frame(streaming=False), 0)
    stats = task.ingest_stats()
    assert stats["pdf_extracted"] == 2
    assert stats["rejected_pdf"] == 1
    corpus = {r["text"] for r in task.corpus().collect()}
    assert "binary flate page text" in corpus
    assert "gzip served pdf text" in corpus
    assert any("binary mode html" in t for t in corpus)
    q = {(r["target_uri"], r["error"]) for r in task.pdf_quarantined().collect()}
    assert q == {("https://b.com/enc.pdf", "encrypted")}


def test_pdf_text_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="pdf_text requires"):
        CorpusIngestTask(
            spark,
            str(tmp_path / "d"),
            str(tmp_path / "c"),
            input_format="warc",
            pdf_text=True,
        )


def test_on_page_robots_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="on_page_robots requires"):
        CorpusIngestTask(
            spark,
            str(tmp_path / "d"),
            str(tmp_path / "c"),
            input_format="jsonl",
            on_page_robots=True,
        )


def test_follow_redirects_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="follow_redirects requires"):
        CorpusIngestTask(
            spark,
            str(tmp_path / "d"),
            str(tmp_path / "c"),
            input_format="warc",
            follow_redirects=True,
        )
    # jsonl drops carry no HTTP layer: follow_redirects must reject the
    # combination up front (mirrors the track_revalidations guard)
    # rather than silently never building _redirect_target rows.
    with pytest.raises(
        ValueError, match="follow_redirects requires a WARC"
    ):
        CorpusIngestTask(
            spark,
            str(tmp_path / "d"),
            str(tmp_path / "c"),
            input_format="jsonl",
            follow_redirects=True,
        )
    with pytest.raises(ValueError, match="requires a WARC"):
        CorpusIngestTask(
            spark,
            str(tmp_path / "d"),
            str(tmp_path / "c"),
            input_format="jsonl",
            follow_redirects=True,
            discover_links=True,
        )


def _warc_304(uri):
    payload = (
        'HTTP/1.1 304 Not Modified\r\nETag: "x"\r\n\r\n'
    )
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n"
        f"{payload}\r\n\r\n"
    )


def test_track_revalidations(spark, tmp_path):
    """track_revalidations=True: 304 Not Modified responses land in
    the per-batch _revalidated store keyed by the SAME doc_id the
    admitted page carries, count as `revalidated`, never touch the
    content funnel, and replay idempotently."""
    from pyspark.sql import functions as F

    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        track_revalidations=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    (drop / "b0.warc").write_text(
        _warc_page("https://a.com/p1", "<p>fresh page body</p>")
    )
    task._process_batch(task._source_frame(streaming=False), 0)
    assert task.corpus().count() == 1
    (page_id,) = [r["doc_id"] for r in task.corpus().collect()]

    (drop / "b0.warc").unlink()
    (drop / "b1.warc").write_text(
        _warc_304("https://a.com/p1") + _warc_304("https://b.com/q")
    )
    batch = task._source_frame(streaming=False)
    task._process_batch(batch, 1)

    got = {
        (r["doc_id"], r["target_uri"], r["batch_id"])
        for r in task.revalidations().collect()
    }
    unknown_id = (
        spark.range(1)
        .select(F.xxhash64(F.lit("https://b.com/q")))
        .collect()[0][0]
    )
    assert got == {
        (page_id, "https://a.com/p1", 1),
        (unknown_id, "https://b.com/q", 1),
    }
    # the admitted doc's revalidation joins its corpus row by id
    assert (
        task.corpus()
        .join(task.revalidations(), "doc_id")
        .count()
        == 1
    )
    stats = task.ingest_stats()
    assert stats["revalidated"] == 2
    assert stats["admitted"] == 1
    assert task.corpus().count() == 1  # 304s never re-admit

    # replay changes nothing
    task._process_batch(batch, 1)
    assert task.ingest_stats() == stats
    assert {
        (r["doc_id"], r["target_uri"], r["batch_id"])
        for r in task.revalidations().collect()
    } == got


def test_track_revalidations_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="track_revalidations"):
        CorpusIngestTask(
            spark,
            str(tmp_path / "d"),
            str(tmp_path / "c"),
            track_revalidations=True,
        )


def _warc_typed(uri, body, content_type=None, extra_header=""):
    """A WARC 200 response whose Content-Type header is controlled —
    None omits the header entirely (an undeclared type)."""
    ct = f"Content-Type: {content_type}\r\n" if content_type else ""
    payload = f"HTTP/1.1 200 OK\r\n{ct}{extra_header}\r\n{body}"
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n"
        f"{payload}\r\n\r\n"
    )


def test_mime_gate(spark, tmp_path):
    """mime_allowlist: a 200 whose DECLARED media type is outside the
    allowlist quarantines (counted rejected_mime) before extraction
    and every content gate; parameters/case/whitespace in the header
    don't matter; an UNDECLARED type passes; the rejected page's
    anchors still feed the frontier (admission gate, not crawl graph);
    a replay changes nothing."""
    from sample_dms_s3_kinesis_spark.streaming.ingest import (
        TEXT_MIME_ALLOWLIST,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        input_format="warc",
        extract_html=True,
        discover_links=True,
        mime_allowlist=TEXT_MIME_ALLOWLIST,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    html = "<html><body><p>real page body</p></body></html>"
    b1 = (
        _warc_typed("https://a.com/html", html, "text/html")
        # parameters + case + pre-';' whitespace all fold away
        + _warc_typed(
            "https://a.com/charset",
            html,
            "TEXT/HTML ; charset=UTF-8",
        )
        + _warc_typed(
            "https://a.com/plain", "plain prose body", "text/plain"
        )
        # declared binary that happens to decode as text — the r14
        # hazard: without the gate this ingests as garbage prose
        + _warc_typed(
            "https://a.com/doc.pdf",
            "%PDF-1.4 fake pdf body text",
            "application/pdf",
        )
        # a JSON API response CONTAINING an anchor: rejected from the
        # corpus, but its link still feeds the frontier
        + _warc_typed(
            "https://a.com/api",
            '{"html": "<a href=\'https://x.com/from-api\'>l</a>"}',
            "application/json",
        )
        # no Content-Type header at all -> passes (undeclared)
        + _warc_typed("https://a.com/untyped", html)
    )
    (drop / "b1.warc").write_text(b1)
    task._process_batch(task._source_frame(streaming=False), 0)

    stats = task.ingest_stats()
    assert stats["rejected_mime"] == 2  # pdf + json
    # html survives; charset-variant and untyped carry the SAME body
    # (exact dups); plain is unique -> 2 admitted, 2 dropped_exact
    assert stats["admitted"] == 2
    assert stats["dropped_exact"] == 2
    assert task.corpus().count() == 2
    q = {
        (r["target_uri"], r["content_type"])
        for r in task.mime_quarantined().collect()
    }
    assert q == {
        ("https://a.com/doc.pdf", "application/pdf"),
        ("https://a.com/api", "application/json"),
    }
    frontier = {r["url"] for r in task.discovered_frontier().collect()}
    assert "https://x.com/from-api" in frontier

    # replay: same counters, same stores
    task._process_batch(task._source_frame(streaming=False), 0)
    assert task.ingest_stats() == stats
    assert {
        (r["target_uri"], r["content_type"])
        for r in task.mime_quarantined().collect()
    } == q


def test_mime_gate_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="mime_allowlist requires"):
        CorpusIngestTask(
            spark,
            str(tmp_path / "d"),
            str(tmp_path / "c"),
            input_format="jsonl",
            mime_allowlist=("text/html",),
        )
    with pytest.raises(ValueError, match="non-empty"):
        CorpusIngestTask(
            spark,
            str(tmp_path / "d2"),
            str(tmp_path / "c2"),
            input_format="warc",
            mime_allowlist=(),
        )


def test_lang_id_labels_admitted_docs(spark, tmp_path):
    """lang_id=True: admitted documents carry the router's language
    label (Latin text via the NB model, non-Latin via the script
    layer); language_composition() reports the admitted mix; a replay
    changes nothing; default-mode corpora read lang NULL."""
    import json as _json

    from sample_dms_s3_kinesis_spark.operators.langid_data import (
        LANGID_TEST,
        NONLATIN_TEST,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    docs = [
        (1, LANGID_TEST["pt"][0], "pt"),
        (2, LANGID_TEST["pl"][1], "pl"),
        (3, LANGID_TEST["en"][2], "en"),
        (4, NONLATIN_TEST["zh"][0], "zh"),
        (5, NONLATIN_TEST["ru"][1], "ru"),
    ]
    (drop / "b1.jsonl").write_text(
        "\n".join(
            _json.dumps({"doc_id": i, "text": t}) for i, t, _ in docs
        )
    )
    task = CorpusIngestTask(
        spark,
        str(drop),
        str(tmp_path / "corpus"),
        lang_id=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    batch = task._source_frame(streaming=False)
    task._process_batch(batch, 0)
    task._process_batch(batch, 0)  # replay: idempotent
    got = {
        r["doc_id"]: r["lang"] for r in task.corpus().collect()
    }
    assert got == {i: lang for i, _, lang in docs}
    comp = {
        r["lang"]: (r["n_docs"], r["doc_share"])
        for r in task.language_composition().collect()
    }
    assert comp == {
        "pt": (1, 0.2),
        "pl": (1, 0.2),
        "en": (1, 0.2),
        "zh": (1, 0.2),
        "ru": (1, 0.2),
    }
    # default mode: lang reads NULL, nothing else changes
    drop2 = tmp_path / "drop2"
    drop2.mkdir()
    (drop2 / "b1.jsonl").write_text(
        _json.dumps({"doc_id": 9, "text": "plain unlabeled doc"})
    )
    task2 = CorpusIngestTask(
        spark,
        str(drop2),
        str(tmp_path / "corpus2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    task2._process_batch(task2._source_frame(streaming=False), 0)
    rows = task2.corpus().collect()
    assert rows[0]["lang"] is None


def test_empty_corpus_carries_lang_column(spark, tmp_path):
    """r15 second sweep: the empty-corpus early return must carry the
    same 6-column schema as the non-empty path, or lang consumers
    (language_composition) crash on a fresh task."""
    task = CorpusIngestTask(
        spark,
        str(tmp_path / "drop"),
        str(tmp_path / "corpus"),
        lang_id=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    empty = task.corpus()
    assert [f.name for f in empty.schema.fields] == [
        "doc_id", "text", "digest", "embedding", "lang", "batch_id",
    ]
    assert task.language_composition().collect() == []
