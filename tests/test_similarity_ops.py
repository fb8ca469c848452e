"""Similarity search: exact top-k vs a NumPy reference; ANN variants'
soundness (returned cosines correct, results drawn from the corpus)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import similarity

from tdata import sf_dir

SF_DIR = sf_dir("0.001")


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _numpy_topk(rows, q, k=10):
    qv = np.array(q)
    sims = []
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        c = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        sims.append((round(c, 6), r["vec_id"]))
    sims.sort(key=lambda t: (-t[0], t[1]))
    return sims[:k]


def test_brute_force_topk_matches_numpy(spark):
    emb = _emb(spark)
    rows = emb.collect()
    q = [float(x) for x in rows[0]["embedding"]]
    got = [
        (r["cosine"], r["vec_id"])
        for r in similarity.brute_force_topk(emb, q, k=10)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .collect()
    ]
    exp = _numpy_topk(rows, q, k=10)
    assert [g[1] for g in got] == [e[1] for e in exp]
    for g, e in zip(got, exp):
        assert abs(g[0] - e[0]) <= 1e-5


def test_ivf_topk_sound_and_overlaps_exact(spark):
    emb = _emb(spark)
    rows = emb.collect()
    q = [float(x) for x in rows[0]["embedding"]]
    exact_ids = [e[1] for e in _numpy_topk(rows, q, k=10)]
    got = similarity.ivf_topk(emb, q, k=10, cells=8, nprobe=4).collect()
    assert 0 < len(got) <= 10
    by_id = {r["vec_id"]: r["cosine"] for r in got}
    # per-row cosines must be the true cosines (soundness)
    full = {e[1]: e[0] for e in _numpy_topk(rows, q, k=len(rows))}
    for vid, cos in by_id.items():
        assert abs(cos - full[vid]) <= 1e-5
    # probing half the cells should recover a decent chunk of the exact top-10
    overlap = len(set(by_id) & set(exact_ids))
    assert overlap >= 3, f"IVF recall too low: {overlap}/10"


def test_lsh_topk_sound(spark):
    emb = _emb(spark)
    rows = emb.collect()
    q = [float(x) for x in rows[0]["embedding"]]
    got = similarity.lsh_topk(emb, q, k=10, planes=8)
    out = got.collect()
    # the query's own vector shares its bucket → at least 1 result, and
    # vec 0 itself (cosine 1.0) must be in it
    assert len(out) >= 1
    assert out[0]["vec_id"] == 0
    assert abs(out[0]["cosine"] - 1.0) <= 1e-6


def test_lsh_multiprobe_recall_at_least_single_probe(spark):
    """Multi-probe (Hamming ≤1 bit flips) must recall at least as many
    of the exact top-k as the single-bucket probe — a near neighbor on
    the wrong side of one hyperplane differs in exactly one signature
    bit, so widening the probe set can only add candidates."""
    emb = _emb(spark)
    rows = emb.collect()
    q = [float(x) for x in rows[0]["embedding"]]
    exact_ids = {e[1] for e in _numpy_topk(rows, q, k=10)}
    single = {
        r["vec_id"]
        for r in similarity.lsh_topk(
            emb, q, k=10, planes=8, hamming_probes=0
        ).collect()
    }
    multi = {
        r["vec_id"]
        for r in similarity.lsh_topk(
            emb, q, k=10, planes=8, hamming_probes=1
        ).collect()
    }
    assert len(multi & exact_ids) >= len(single & exact_ids)
    # cosines must still be the true values (soundness of the wider set)
    full = {e[1]: e[0] for e in _numpy_topk(rows, q, k=len(rows))}
    for r in similarity.lsh_topk(
        emb, q, k=10, planes=8, hamming_probes=1
    ).collect():
        assert abs(r["cosine"] - full[r["vec_id"]]) <= 1e-5


def test_ivf_topk_does_not_leak_cached_frames(spark):
    """Repeated ivf_topk calls in one session must not grow the cached
    RDD set (the pre-fix bug: each call persisted its centroid frame
    and never unpersisted it)."""
    emb = _emb(spark)
    rows = emb.collect()
    q = [float(x) for x in rows[0]["embedding"]]

    def cached_count():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    similarity.ivf_topk(emb, q, k=5, cells=8, nprobe=2).collect()
    before = cached_count()
    for _ in range(3):
        similarity.ivf_topk(emb, q, k=5, cells=8, nprobe=2).collect()
    assert cached_count() <= before


def test_multimodal_plumbing(spark):
    from sample_dms_s3_kinesis_spark.operators import multimodal

    assets = multimodal.synthetic_assets(spark, n=16).filter(
        F.col("media_type") == "image"
    )
    feats = multimodal.extract_image_features(assets).collect()
    by_id = {r["asset_id"]: r for r in feats}
    assert set(by_id) == {0, 3, 6, 9, 12, 15}
    # corrupt (empty) payload → null features, job survives
    assert by_id[15]["content_sha256"] is None
    ok = [i for i in by_id if i != 15]
    for i in ok:
        assert by_id[i]["content_sha256"] is not None
        assert len(by_id[i]["feature"]) == 8
    # determinism: same content → same feature
    again = {r["asset_id"]: r for r in multimodal.extract_image_features(assets).collect()}
    assert all(again[i]["feature"] == by_id[i]["feature"] for i in ok)


def test_frame_sample_plan(spark):
    from sample_dms_s3_kinesis_spark.operators import multimodal

    assets = multimodal.synthetic_assets(spark, n=12)
    frames = multimodal.frame_sample_plan(assets, every_ms=1000).collect()
    videos = assets.filter(F.col("media_type") == "video").collect()
    # 3000ms duration, sample every 1000ms → ts 0,1000,2000 per video
    assert len(frames) == 3 * len(videos)
    one = sorted(r["frame_ts_ms"] for r in frames if r["asset_id"] == videos[0]["asset_id"])
    assert one == [0, 1000, 2000]


def test_ivf_index_build_once_search_many(spark):
    from sample_dms_s3_kinesis_spark.operators.similarity import (
        IvfIndex,
        brute_force_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index = IvfIndex.build(emb, cells=8)
    queries = [r["embedding"] for r in emb.filter(F.col("vec_id") < 3).collect()]
    for qv in queries:
        approx = [r["vec_id"] for r in index.search(qv, k=10, nprobe=4).collect()]
        exact = [r["vec_id"] for r in brute_force_topk(emb, list(qv), k=10).collect()]
        # probing half the cells must recover a majority of true top-10
        overlap = len(set(approx) & set(exact))
        assert overlap >= 5, (overlap, approx, exact)
        # and the probed results must themselves be exact within cells
        assert len(approx) == 10


def test_l2_normalize_and_centroids_match_numpy(spark):
    import numpy as np

    from sample_dms_s3_kinesis_spark.operators import similarity as S

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)], int(i % 3)) for i in range(60)
    ] + [(999, [0.0] * 8, 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")

    unit = {
        r["vec_id"]: r["u"]
        for r in df.select(
            "vec_id", S.l2_normalize(F.col("embedding"), scale=6).alias("u")
        ).collect()
    }
    for vid, v, _lbl in rows:
        a = np.array(v)
        n = np.linalg.norm(a)
        exp = (a / n if n > 0 else a).round(6)
        assert np.allclose(unit[vid], exp, atol=1e-9), vid

    cents = {
        r["label"]: r["centroid"]
        for r in S.label_centroids(df, dim=8, scale=6).collect()
    }
    for lbl in (0, 1, 2):
        vecs = np.array([v for _i, v, l in rows if l == lbl])
        assert np.allclose(cents[lbl], vecs.mean(axis=0).round(6), atol=1e-6)


def test_centroid_seed_selection_avoids_global_sort(spark):
    """Seed selection must plan as TakeOrderedAndProject (per-partition
    top-k + merge), never a single-partition global-sort window over
    the corpus."""
    from sample_dms_s3_kinesis_spark.operators.similarity import (
        _deterministic_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = _deterministic_centroids(
        emb, vec_col="embedding", id_col="vec_id", cells=16
    )
    plan = cent._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = cent.collect()
    assert len(rows) == 16
    assert sorted(r["cell"] for r in rows) == list(range(16))


def test_ivf_index_save_load_roundtrip_with_partition_pruning(spark, tmp_path):
    """A saved index reloads to identical search results, and the
    loaded index's probe filter prunes parquet partitions (the
    assignment is written partitionBy(cell), so `cell IN (...)` reads
    nprobe/cells of the corpus from storage)."""
    emb = _emb(spark)
    rows = emb.collect()
    q = [float(x) for x in rows[0]["embedding"]]

    idx = similarity.IvfIndex.build(emb, cells=8)
    before = [
        (r["vec_id"], r["cosine"])
        for r in idx.search(q, k=5, nprobe=2)
        .orderBy("vec_id")
        .collect()
    ]
    path = str(tmp_path / "ivf")
    idx.save(path)

    loaded = similarity.IvfIndex.load(spark, path)
    result = loaded.search(q, k=5, nprobe=2)
    after = [
        (r["vec_id"], r["cosine"]) for r in result.orderBy("vec_id").collect()
    ]
    assert after == before

    plan = result._jdf.queryExecution().executedPlan().toString()
    # probe filter reached the scan as a partition filter (pruning),
    # not a post-scan row filter
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters:")[1][:200]


def test_quantize_embeddings_roundtrip_error_bound(spark):
    from sample_dms_s3_kinesis_spark.operators.similarity import (
        dequantize,
        quantization_params,
        quantize_embeddings,
    )

    emb = _emb(spark)
    params = quantization_params(emb)
    p = params.collect()[0]
    mins, maxs = p["mins"], p["maxs"]
    q = quantize_embeddings(emb, params)
    # all components in int8 range
    rng = q.select(
        F.min(F.array_min("qvec")).alias("lo"), F.max(F.array_max("qvec")).alias("hi")
    ).collect()[0]
    assert rng["lo"] >= -128 and rng["hi"] <= 127

    # dequantized reconstruction error ≤ half a quantization step/dim
    joined = emb.join(q, on="vec_id").select(
        F.col("embedding").cast("array<double>").alias("v"),
        dequantize(
            F.col("qvec"),
            F.array(*[F.lit(float(x)) for x in mins]),
            F.array(*[F.lit(float(x)) for x in maxs]),
        ).alias("dv"),
    )
    rows = joined.collect()
    steps = [(mx - mn) / 255.0 for mn, mx in zip(mins, maxs)]
    for r in rows:
        for x, dx, step in zip(r["v"], r["dv"], steps):
            assert abs(x - dx) <= step / 2 + 1e-9


def test_quantize_python_reference(spark):
    from sample_dms_s3_kinesis_spark.operators.similarity import (
        quantization_params,
        quantize_embeddings,
    )

    rows = [
        (0, [0.0, -1.0, 5.0]),
        (1, [1.0, 1.0, 5.0]),
        (2, [0.5, 0.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = quantization_params(df, dim=3)
    out = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(df, params).collect()}
    mins = [0.0, -1.0, 5.0]
    maxs = [1.0, 1.0, 5.0]
    for vid, v in rows:
        exp = []
        for x, mn, mx in zip(v, mins, maxs):
            if mx > mn:
                exp.append(int(round((x - mn) / (mx - mn) * 255)) - 128)
            else:
                exp.append(0)  # constant dimension
        assert out[vid] == exp, (vid, out[vid], exp)


def test_kmeans_refine_recovers_synthetic_blobs(spark):
    """On well-separated synthetic blobs, Lloyd refinement moves the
    seed centroids onto the true cluster means."""
    import numpy as np

    rng = np.random.default_rng(11)
    true_means = np.array(
        [[5.0] * 4 + [0.0] * 4, [0.0] * 4 + [5.0] * 4, [-5.0] * 8]
    )
    rows = []
    for i in range(240):
        c = i % 3
        v = true_means[c] + rng.normal(scale=0.2, size=8)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    seeds = similarity._deterministic_centroids(
        df, vec_col="embedding", id_col="vec_id", cells=3
    )
    refined = similarity.kmeans_refine(df, seeds, iters=4, dim=8)
    cents = np.array([r["centroid"] for r in refined.collect()])
    # every true mean is (cosine-)matched by some refined centroid
    for tm in true_means:
        best = max(
            float(c @ tm / (np.linalg.norm(c) * np.linalg.norm(tm)))
            for c in cents
        )
        assert best > 0.99, (tm, cents)

    # refined centroids feed the standard index build unchanged
    idx = similarity.IvfIndex(
        refined,
        df.join(
            similarity.ivf_assign(df, refined), on="vec_id"
        ).localCheckpoint(eager=True),
        vec_col="embedding",
        id_col="vec_id",
    )
    q = [float(x) for x in rows[0][1]]
    got = idx.search(q, k=5, nprobe=1).collect()
    assert len(got) == 5 and got[0]["vec_id"] == 0


def test_dim_probe_errors_clearly_on_empty_input(spark):
    """An empty frame must raise a clear ValueError from the dim probe,
    not an opaque 'NoneType is not subscriptable' TypeError."""
    import pytest

    from sample_dms_s3_kinesis_spark.operators.similarity import (
        kmeans_refine,
        quantization_params,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="pass dim= explicitly"):
        quantization_params(empty)
    no_centroids = spark.createDataFrame([], "cell int, centroid array<double>")
    with pytest.raises(ValueError, match="pass dim= explicitly"):
        kmeans_refine(empty, no_centroids, iters=1)


def test_kmeans_refine_preserves_long_cell_ids(spark):
    """The merged-centroid frame must carry the INPUT centroid schema —
    a hardcoded 'cell int' would silently truncate bigint cell ids."""
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    big = 2**40  # far outside int32
    cents = spark.createDataFrame(
        [(big, [1.0, 0.0]), (big + 1, [0.0, 1.0])],
        "cell bigint, centroid array<double>",
    )
    refined = similarity.kmeans_refine(df, cents, iters=2, dim=2)
    assert refined.schema["cell"].dataType.simpleString() == "bigint"
    assert {r["cell"] for r in refined.collect()} == {big, big + 1}


# ------------------------------------------------- product quantization

def _pq_blobs(spark, n=120, dim=8, n_clusters=6, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 5.0
    rows = []
    for i in range(n):
        v = centers[i % n_clusters] + rng.normal(size=dim) * 0.2
        rows.append((i, [float(x) for x in v]))
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_pq_encode_picks_nearest_code_per_subspace(spark):
    rows, df = _pq_blobs(spark)
    m, d_sub = 4, 2
    cb = similarity.pq_train(df, m=m, codes=8, iters=2)
    cb_rows = {(r["sub"], r["code"]): r["centroid"] for r in cb.collect()}
    enc = {
        r["vec_id"]: r["codes"]
        for r in similarity.pq_encode(df, cb, m=m).collect()
    }
    assert set(enc) == {i for i, _ in rows}
    for vid, vec in rows:
        for sub in range(m):
            sv = vec[sub * d_sub : (sub + 1) * d_sub]
            dists = {
                code: sum((a - b) ** 2 for a, b in zip(sv, cen))
                for (s, code), cen in cb_rows.items()
                if s == sub
            }
            best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))[0]
            assert enc[vid][sub] == best, (vid, sub)


def test_pq_topk_matches_python_table_scoring(spark):
    rows, df = _pq_blobs(spark)
    m, d_sub = 4, 2
    cb = similarity.pq_train(df, m=m, codes=8, iters=1)
    cb_rows = {(r["sub"], r["code"]): r["centroid"] for r in cb.collect()}
    enc_rows = similarity.pq_encode(df, cb, m=m).collect()
    q = rows[7][1]
    got = [
        (r["vec_id"], r["approx_dist"])
        for r in similarity.pq_topk(
            df.sparkSession.createDataFrame(enc_rows), cb, q, k=10
        ).collect()
    ]
    # python reference: asymmetric distance = sum of per-sub table entries
    ref = []
    for r in enc_rows:
        d = 0.0
        for sub, code in enumerate(r["codes"]):
            cen = cb_rows[(sub, code)]
            qs = q[sub * d_sub : (sub + 1) * d_sub]
            d += sum((a - b) ** 2 for a, b in zip(qs, cen))
        ref.append((round(d, 6), r["vec_id"]))
    ref.sort(key=lambda t: (t[0], t[1]))
    assert got == [(vid, d) for d, vid in ref[:10]]


def test_pq_topk_recall_on_clustered_data(spark):
    rows, df = _pq_blobs(spark, n=150)
    q = rows[3][1]
    exact = sorted(
        (sum((a - b) ** 2 for a, b in zip(vec, q)), vid) for vid, vec in rows
    )[:5]
    cb = similarity.pq_train(df, m=4, codes=12, iters=2)
    enc = similarity.pq_encode(df, cb, m=4)
    got = {
        r["vec_id"] for r in similarity.pq_topk(enc, cb, q, k=5).collect()
    }
    recall = len(got & {vid for _, vid in exact}) / 5
    assert recall >= 0.6, recall


def test_pq_train_deterministic_and_validates(spark):
    _, df = _pq_blobs(spark, n=40)
    a = similarity.pq_train(df, m=4, codes=6, iters=1).collect()
    b = similarity.pq_train(
        df.repartition(13), m=4, codes=6, iters=1
    ).collect()
    key = lambda r: (r["sub"], r["code"])
    assert sorted(a, key=key) == sorted(b, key=key)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(df, m=3, codes=4)
    empty = df.filter("vec_id < 0")
    with _pytest.raises(ValueError, match="empty"):
        similarity.pq_train(empty, m=4, codes=4)


def test_ivfpq_search_matches_python_adc_reference(spark):
    rows, df = _pq_blobs(spark, n=100)
    idx = similarity.IvfPqIndex.build(
        df, cells=5, m=4, codes=8, iters=1
    )
    cents = {r["cell"]: r["centroid"] for r in idx.centroids.collect()}
    book = {(r["sub"], r["code"]): r["centroid"] for r in idx.codebooks.collect()}
    enc = {r["vec_id"]: (r["cell"], r["codes"]) for r in idx.encoded.collect()}
    d_sub = 2
    q = rows[11][1]
    nprobe = 3
    # python ADC reference over the same probed cells
    probed = sorted(
        cents,
        key=lambda c: (
            sum((a - b) ** 2 for a, b in zip(q, cents[c])),
            c,
        ),
    )[:nprobe]
    ref = []
    for vid, (cell, codes) in enc.items():
        if cell not in probed:
            continue
        qr = [a - b for a, b in zip(q, cents[cell])]
        d = 0.0
        for sub, code in enumerate(codes):
            cen = book[(sub, code)]
            qs = qr[sub * d_sub : (sub + 1) * d_sub]
            d += sum((a - b) ** 2 for a, b in zip(qs, cen))
        ref.append((round(d, 6), vid))
    ref.sort()
    got = [
        (r["vec_id"], r["approx_dist"])
        for r in idx.search(q, k=10, nprobe=nprobe).collect()
    ]
    assert got == [(vid, d) for d, vid in ref[:10]]


def test_ivfpq_recall_on_clustered_data(spark):
    rows, df = _pq_blobs(spark, n=150)
    q = rows[9][1]
    exact = sorted(
        (sum((a - b) ** 2 for a, b in zip(vec, q)), vid) for vid, vec in rows
    )[:5]
    idx = similarity.IvfPqIndex.build(df, cells=6, m=4, codes=12, iters=2)
    got = {r["vec_id"] for r in idx.search(q, k=5, nprobe=3).collect()}
    recall = len(got & {vid for _, vid in exact}) / 5
    assert recall >= 0.6, recall


def test_ivfpq_save_load_roundtrip_prunes_partitions(spark, tmp_path):
    rows, df = _pq_blobs(spark, n=80)
    idx = similarity.IvfPqIndex.build(df, cells=4, m=4, codes=8, iters=1)
    path = str(tmp_path / "ivfpq")
    idx.save(path)
    loaded = similarity.IvfPqIndex.load(spark, path)
    q = rows[2][1]
    a = [(r["vec_id"], r["approx_dist"]) for r in idx.search(q, k=8, nprobe=2).collect()]
    b = [(r["vec_id"], r["approx_dist"]) for r in loaded.search(q, k=8, nprobe=2).collect()]
    assert a == b
    # the loaded probe must prune parquet partitions on the cell key
    plan = loaded.search(q, k=8, nprobe=2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_brute_force_topk_excludes_zero_norm_vectors(spark):
    """r6 review: NaN cosine (zero-norm corpus vector) sorted ABOVE
    every real score in the 'exact' top-k."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    got = [r["vec_id"] for r in similarity.brute_force_topk(emb, [1.0, 0.0], k=3).collect()]
    assert got == [1, 3]          # the zero vector is excluded, not rank 1
    # all-zero query: empty, never k arbitrary rows
    assert similarity.brute_force_topk(emb, [0.0, 0.0], k=3).count() == 0


def test_ivf_assign_plans_as_partial_aggregate(spark):
    """r6 review: the argmax is a map-side-combinable MAX(struct), not
    a cells-x-corpus row_number window sort."""
    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    cent_plan = similarity._deterministic_centroids(
        emb, vec_col="embedding", id_col="vec_id", cells=4
    )
    # materialized centroids (the IvfIndex/ivf_topk shape) so the plan
    # under test is the assignment alone, not the seed-pick window
    cents = spark.createDataFrame(cent_plan.collect(), cent_plan.schema)
    out = similarity.ivf_assign(emb, cents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan


def test_lsh_topk_guards_dim_mismatch_and_generalizes_probes(spark):
    import pytest

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, 2.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="components"):
        similarity.lsh_topk(emb, [1.0, 2.0], k=3)     # 2-dim query, 4-dim corpus
    # hamming_probes=3 probes strictly more buckets than 2 (monotone recall)
    r2 = {r["vec_id"] for r in similarity.lsh_topk(emb, [1.0, 1.0, 0.5, 2.0], k=20, planes=6, hamming_probes=2).collect()}
    r3 = {r["vec_id"] for r in similarity.lsh_topk(emb, [1.0, 1.0, 0.5, 2.0], k=20, planes=6, hamming_probes=3).collect()}
    assert r2 <= r3


def test_quantize_clamps_out_of_calibration_values(spark):
    from sample_dms_s3_kinesis_spark.operators.similarity import (
        quantization_params,
        quantize_embeddings,
    )

    cal = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    params = quantization_params(cal, vec_col="embedding")
    full = spark.createDataFrame(
        [(3, [2.0, -1.0])],  # outside the calibrated [0, 1] range
        "vec_id long, embedding array<double>",
    )
    q = quantize_embeddings(full, params, vec_col="embedding").collect()[0]["qvec"]
    assert q == [127, -128]       # clamped into int8, never 382


def test_cosine_degenerate_inputs_are_null_never_nan(spark):
    """r6 review round 2: NaN components bypass `> 0` guards (NaN > x
    is true in Spark) and sort FIRST under desc — cosine must surface
    BOTH zero-norm and NaN-component vectors as NULL."""
    from sample_dms_s3_kinesis_spark.operators.dedup import cosine_similarity

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 0.0]),             # zero norm
            (3, [float("nan"), 1.0]),    # NaN component
        ],
        "vec_id long, embedding array<double>",
    )
    q = F.array(F.lit(1.0), F.lit(0.0))
    got = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id", cosine_similarity(F.col("embedding"), q).alias("c")
        ).collect()
    }
    assert got[1] == 1.0
    assert got[2] is None and got[3] is None
    # top-k paths exclude them
    assert [
        r["vec_id"]
        for r in similarity.brute_force_topk(df, [1.0, 0.0], k=3).collect()
    ] == [1]
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    got_batch = similarity.batch_topk(df, queries, k=3).collect()
    assert [r["vec_id"] for r in got_batch] == [1]  # no NULL padding


def test_lsh_topk_tolerates_leading_null_vector(spark):
    """A NULL embedding in the probed row must not read as a dimension
    mismatch (r6 advice): F.size(NULL) is NULL != dim.  The guard probes
    the first NON-NULL vector; NULL rows simply never match a bucket."""
    emb = spark.createDataFrame(
        [(0, None)] + [(i, [float(i), 1.0, 0.5, 2.0]) for i in range(1, 20)],
        "vec_id long, embedding array<double>",
    ).coalesce(1)  # deterministic scan order: the NULL row is first
    got = similarity.lsh_topk(
        emb, [1.0, 1.0, 0.5, 2.0], k=5, planes=6, hamming_probes=2
    ).collect()
    assert got  # searched instead of raising
    assert all(r["vec_id"] != 0 for r in got)
    # an all-NULL corpus is degenerate, not a mismatch error
    all_null = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<double>"
    )
    assert similarity.lsh_topk(all_null, [1.0, 2.0], k=3).collect() == []


def test_pca_matches_numpy_reference(spark):
    import numpy as np

    from sample_dms_s3_kinesis_spark.operators.similarity import (
        pca_fit,
        pca_transform,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(300, 8)) @ np.diag([5, 3, 2, 1, 0.5, 0.2, 0.1, 0.05])
    rows = [(i, base[i].tolist()) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    model = pca_fit(df, n_components=4, id_col="vec_id")
    got = {r["component"]: r for r in model.collect()}

    mean = base.mean(axis=0)
    cov = np.cov(base.T, bias=True)
    ev, evec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:4]
    ref_ev = ev[order]
    ref_comps = evec[:, order].T
    for i in range(4):
        j = int(np.argmax(np.abs(ref_comps[i])))
        if ref_comps[i][j] < 0:
            ref_comps[i] = -ref_comps[i]

    assert np.allclose(got[-1]["vec"], mean, atol=1e-9)
    for i in range(4):
        assert got[i]["eigval"] == pytest.approx(ref_ev[i], rel=1e-9)
        assert np.allclose(got[i]["vec"], ref_comps[i], atol=1e-8), i
    # explained variance ratios descend and stay in (0, 1]
    ratios = [got[i]["explained"] for i in range(4)]
    assert ratios == sorted(ratios, reverse=True) and ratios[0] < 1.0

    # projection matches numpy; whitened projection has ~unit variance
    out = {
        r["vec_id"]: np.array(r["pca"])
        for r in pca_transform(df, model).collect()
    }
    ref_proj = (base - mean) @ ref_comps.T
    for i in range(len(base)):
        assert np.allclose(out[i], ref_proj[i], atol=1e-8)
    wout = np.array(
        [
            r["pca"]
            for r in pca_transform(df, model, whiten=True)
            .orderBy("vec_id")
            .collect()
        ]
    )
    assert np.allclose(wout.var(axis=0), 1.0, atol=1e-3)


def test_pca_validates_inputs(spark):
    from sample_dms_s3_kinesis_spark.operators.similarity import (
        pca_fit,
        pca_transform,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="n_components"):
        pca_fit(df, n_components=3)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        pca_fit(empty, n_components=1)
    with pytest.raises(ValueError, match="mean row"):
        pca_transform(df, df.select(F.lit(0).alias("component"),
                                    F.lit(1.0).alias("eigval"),
                                    F.lit(1.0).alias("explained"),
                                    F.col("embedding").alias("vec")))


# ------------------------------------------------------------- MMR

def _python_mmr(rows, q, *, k, lam, pool):
    """Independent greedy MMR over numpy cosines (round-6 inputs)."""
    qv = np.array(q, dtype=np.float64)

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    vecs = {r["vec_id"]: np.array(r["embedding"], np.float64) for r in rows}
    rel = sorted(
        ((cos(v, qv), i) for i, v in vecs.items()),
        key=lambda t: (-t[0], t[1]),
    )[:pool]
    rel = {i: c for c, i in rel}
    selected, out = [], []
    for step in range(1, min(k, len(rel)) + 1):
        best = None
        for d in rel:
            if d in selected:
                continue
            pen = max((cos(vecs[d], vecs[s]) for s in selected), default=0.0)
            score = lam * rel[d] - (1.0 - lam) * pen
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, pen, score)
        _, d, pen, score = best
        out.append((step, d, rel[d], pen, score))
        selected.append(d)
    return out


def test_mmr_rerank_matches_python_reference(spark):
    emb = _emb(spark)
    rows = emb.collect()
    q = [float(x) for x in rows[0]["embedding"]]
    got = [
        (r["step"], r["vec_id"], r["relevance"], r["penalty"], r["mmr_score"])
        for r in similarity.mmr_rerank(emb, q, k=8, lambda_=0.6, pool=25)
        .orderBy("step")
        .collect()
    ]
    exp = _python_mmr(rows, q, k=8, lam=0.6, pool=25)
    assert [g[:2] for g in got] == [e[:2] for e in exp]
    for g, e in zip(got, exp):
        assert g[2] == pytest.approx(e[2], abs=2e-6)  # relevance
        assert g[3] == pytest.approx(e[3], abs=2e-6)  # penalty
        assert g[4] == pytest.approx(e[4], abs=2e-6)  # mmr score


def test_mmr_rerank_diversifies_vs_pure_relevance(spark):
    """Near-duplicate cluster at the top: λ=1 keeps the clones, a
    diversity-weighted λ spreads the picks."""
    rows = [
        (0, [1.0, 1.0, 0.0, 0.0]),
        (1, [1.0, 0.99, 0.0, 0.0]),  # clone of 0
        (2, [0.99, 1.0, 0.0, 0.0]),  # clone of 0
        (3, [1.0, 0.0, 0.0, 0.0]),   # half-relevant, far from the clones
        (4, [0.0, 1.0, 0.0, 0.0]),   # half-relevant, orthogonal to 3
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )
    q = [1.0, 1.0, 0.0, 0.0]
    relevance_only = [
        r["vec_id"]
        for r in similarity.mmr_rerank(df, q, k=3, lambda_=1.0, pool=5)
        .orderBy("step")
        .collect()
    ]
    assert relevance_only == [0, 1, 2]
    # diversity-weighted: mmr = 0.3·rel − 0.7·pen makes the clones
    # (pen≈1) lose to the half-relevant orthogonal pair (pen≈0.707)
    diversified = [
        r["vec_id"]
        for r in similarity.mmr_rerank(df, q, k=3, lambda_=0.3, pool=5)
        .orderBy("step")
        .collect()
    ]
    assert diversified[0] == 0
    assert set(diversified[1:]) == {3, 4}


def test_mmr_rerank_pool_short_and_validation(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.5, 0.5])],
        "vec_id bigint, embedding array<float>",
    )
    got = similarity.mmr_rerank(df, [1.0, 0.0], k=10, pool=5).collect()
    assert [r["step"] for r in sorted(got, key=lambda r: r["step"])] == [1, 2]
    with pytest.raises(ValueError, match="lambda_"):
        similarity.mmr_rerank(df, [1.0, 0.0], lambda_=1.5)
    with pytest.raises(ValueError, match="k and pool"):
        similarity.mmr_rerank(df, [1.0, 0.0], k=0)


def test_embedding_diversity_matches_brute_force(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 6)
    rows = [
        (i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(20)
    ]
    # a zero vector and a NULL vector must be excluded from n and S
    rows.append((20, [0.0] * 6, 0))
    rows.append((21, None, 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        r["label"]: (r["n_vectors"], r["mean_pairwise_cosine"])
        for r in similarity.embedding_diversity(
            df, label_col="label"
        ).collect()
    }
    for lab in (0, 1, 2):
        sub = vecs[[i for i in range(20) if i % 3 == lab]]
        unit = sub / np.linalg.norm(sub, axis=1, keepdims=True)
        sims = unit @ unit.T
        n = len(sub)
        ref = (sims.sum() - n) / (n * (n - 1))
        assert got[lab][0] == n
        assert abs(got[lab][1] - ref) < 1e-6, lab
    # ungrouped variant: one row over all valid vectors
    allrow = similarity.embedding_diversity(df).collect()
    assert len(allrow) == 1 and allrow[0]["n_vectors"] == 20


def test_embedding_diversity_small_group_is_null(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 1), (2, [0.0, 1.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    got = {
        r["label"]: (r["n_vectors"], r["mean_pairwise_cosine"])
        for r in similarity.embedding_diversity(
            df, label_col="label"
        ).collect()
    }
    assert got[0] == (1, None)          # n < 2 -> NULL KPI
    assert got[1] == (2, 0.0)           # orthogonal pair


def test_mine_hard_negatives_band_and_rank(spark):
    """Hand-built geometry: the anchor's duplicate (cosine 1) is
    excluded by the band, the in-band vectors rank by similarity, and
    out-of-band dissimilar vectors never appear."""
    import math

    def vec(theta):
        return [math.cos(theta), math.sin(theta)]

    corpus = spark.createDataFrame(
        [
            (0, vec(0.0)),          # the anchor itself (cos 1)
            (1, vec(0.05)),         # near-dup (cos ~0.9988) - above hi
            (2, vec(0.6)),          # cos ~0.825  - hard negative
            (3, vec(1.0)),          # cos ~0.540  - hard negative
            (4, vec(1.3)),          # cos ~0.2675 - hard negative
            (5, vec(2.5)),          # cos ~-0.80  - below lo
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, vec(0.0))], "query_id long, query_vec array<double>"
    )
    from sample_dms_s3_kinesis_spark.operators.similarity import (
        mine_hard_negatives,
    )

    rows = mine_hard_negatives(
        corpus, queries, k=5, lo=0.2, hi=0.99
    ).collect()
    assert [(r["rank"], r["vec_id"]) for r in rows] == [
        (1, 2), (2, 3), (3, 4)
    ]
    assert all(0.2 <= r["cosine"] < 0.99 for r in rows)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lo < hi"):
        mine_hard_negatives(corpus, queries, lo=0.9, hi=0.2)
    with _pytest.raises(ValueError, match="k must"):
        mine_hard_negatives(corpus, queries, k=0)
