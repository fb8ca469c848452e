"""Deterministic split/sampling operators: partition-layout
independence, append stability, per-group exactness."""

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import sampling
from tdata import sf_dir


def _ids(spark, n=2000, parts=4):
    return spark.range(0, n, numPartitions=parts).withColumnRenamed("id", "doc_id")


def test_hash_split_disjoint_exhaustive_and_sized(spark):
    df = _ids(spark)
    out = sampling.hash_split(df, id_col="doc_id", seed=42)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000  # exhaustive, disjoint by construction
    assert 0.85 < counts["train"] / 2000 < 0.95
    assert counts["val"] > 0 and counts["test"] > 0


def test_hash_split_stable_under_repartition_and_append(spark):
    base = sampling.hash_split(_ids(spark, 1000), id_col="doc_id", seed=1)
    assignment = {r["doc_id"]: r["split"] for r in base.collect()}

    # different partition layout → identical assignment
    re = sampling.hash_split(
        _ids(spark, 1000).repartition(13), id_col="doc_id", seed=1
    )
    assert {r["doc_id"]: r["split"] for r in re.collect()} == assignment

    # appending rows never reassigns existing ones
    grown = sampling.hash_split(_ids(spark, 1500), id_col="doc_id", seed=1)
    grown_map = {r["doc_id"]: r["split"] for r in grown.collect()}
    assert all(grown_map[k] == v for k, v in assignment.items())


def test_hash_split_rejects_bad_weights(spark):
    import pytest

    with pytest.raises(ValueError):
        sampling.hash_split(
            _ids(spark, 10), id_col="doc_id", weights=[("a", 0.5), ("b", 0.2)]
        )


def test_deterministic_sample_fraction_and_subset(spark):
    df = _ids(spark, 4000)
    s25 = sampling.deterministic_sample(df, id_col="doc_id", fraction=0.25, seed=5)
    s50 = sampling.deterministic_sample(df, id_col="doc_id", fraction=0.5, seed=5)
    ids25 = {r["doc_id"] for r in s25.collect()}
    ids50 = {r["doc_id"] for r in s50.collect()}
    assert 0.2 < len(ids25) / 4000 < 0.3
    assert ids25 <= ids50  # nested thresholds → nested samples
    assert sampling.deterministic_sample(df, id_col="doc_id", fraction=0.0).count() == 0
    assert sampling.deterministic_sample(df, id_col="doc_id", fraction=1.0).count() == 4000


def test_stratified_sample_keep_all_and_drop(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(1000)],
        "doc_id long, lang string",
    )
    out = sampling.stratified_sample(
        df,
        strata_col="lang",
        fractions={"en": 0.3, "zh": 1.0},
        id_col="doc_id",
        seed=3,
    ).groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    counts = {r["lang"]: r["n"] for r in out.collect()}
    assert counts["zh"] == 500  # keep-all stratum intact
    assert 0.2 < counts["en"] / 500 < 0.4
    # default_fraction=0 drops unlisted strata entirely
    extra = spark.createDataFrame([(10_000, "fr")], "doc_id long, lang string")
    out2 = sampling.stratified_sample(
        df.union(extra),
        strata_col="lang",
        fractions={"en": 0.3, "zh": 1.0},
        id_col="doc_id",
        seed=3,
    )
    assert out2.filter(F.col("lang") == "fr").count() == 0


def test_group_sample_topk_exact_counts_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(700)] + [(9000, "tiny")],
        "doc_id long, grp string",
    )
    out = sampling.group_sample_topk(df, group_col="grp", id_col="doc_id", k=10, seed=2)
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(counts[f"g{i}"] == 10 for i in range(7))
    assert counts["tiny"] == 1  # min(k, |group|)
    again = sampling.group_sample_topk(
        df.repartition(11), group_col="grp", id_col="doc_id", k=10, seed=2
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


def test_hash_bucket_matches_python_hashlib(spark):
    """The bucket expression is the portability contract: any engine
    (DuckDB oracle, a Python backfill job) must reproduce it."""
    import hashlib

    rows = [(i,) for i in [0, 1, 42, 10**12, 999_999_999_999_999]]
    df = spark.createDataFrame(rows, "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", sampling.hash_bucket(F.col("doc_id"), seed=17).alias("b")
        ).collect()
    }
    for (i,) in rows:
        expected = hashlib.md5(f"{i}:17".encode()).hexdigest()[:8]
        assert got[i] == expected


def test_mixture_sample_rebalances_to_target_shares(spark):
    from sample_dms_s3_kinesis_spark.operators import sampling

    d = spark.read.parquet(f"{sf_dir('0.01')}/documents.parquet")
    shares = {"en": 0.4, "de": 0.3, "zh": 0.3}
    out = sampling.mixture_sample(
        d, domain_col="lang", target_shares=shares, id_col="doc_id", seed=11
    )
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # dropped domains are absent
    assert set(got) <= set(shares)
    total = sum(got.values())
    # realized mixture approximates the target (hash sampling is
    # binomial around frac*n)
    for lang, share in shares.items():
        assert abs(got[lang] / total - share) < 0.08, (lang, got)
    # max retention: the limiting domain keeps ALL its rows
    counts = {r["lang"]: r["n"] for r in
              d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    limiting = min(shares, key=lambda l: counts[l] / shares[l])
    assert got[limiting] == counts[limiting]


def test_mixture_fractions_properties():
    from sample_dms_s3_kinesis_spark.operators.sampling import mixture_fractions

    counts = {"en": 1000, "de": 100, "zh": 500, "fr": 50}
    shares = {"en": 0.4, "de": 0.3, "zh": 0.3}
    f = mixture_fractions(counts, shares)
    # de is scarcest relative to its share -> kept in full
    assert f["de"] == 1.0
    # unlisted domains dropped
    assert f["fr"] == 0.0
    # all fractions valid
    assert all(0.0 <= v <= 1.0 for v in f.values())
    # resulting mixture matches target: kept_d = frac_d * count_d
    kept = {d: f[d] * counts[d] for d in shares}
    total = sum(kept.values())
    for d, s in shares.items():
        assert abs(kept[d] / total - s) < 1e-9


def test_token_budget_sample_matches_naive_global_cumsum(spark):
    from pyspark.sql import Window
    from sample_dms_s3_kinesis_spark.operators import sampling

    d = spark.read.parquet(f"{sf_dir('0.01')}/documents.parquet")
    budget = 50_000
    out = sampling.token_budget_sample(
        d, weight_col="n_chars", budget=budget, id_col="doc_id", seed=5
    )
    got = sorted(r["doc_id"] for r in out.collect())

    # semantic spec: single global running sum in (hash, id) order
    h = sampling.hash_bucket(F.col("doc_id"), 5)
    w = (
        Window.orderBy(h.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        d.withColumn("_cum", F.sum("n_chars").over(w))
        .filter(F.col("_cum") <= budget)
    )
    want = sorted(r["doc_id"] for r in naive.collect())
    assert got == want

    # the kept set actually fits the budget, and is maximal in order
    kept = out.agg(F.sum("n_chars").alias("s")).collect()[0]["s"]
    assert kept <= budget
    # determinism
    again = sorted(
        r["doc_id"]
        for r in sampling.token_budget_sample(
            d, weight_col="n_chars", budget=budget, id_col="doc_id", seed=5
        ).collect()
    )
    assert again == got


def test_token_budget_sample_avoids_single_partition_window(spark):
    from sample_dms_s3_kinesis_spark.operators import sampling

    d = spark.read.parquet(f"{sf_dir('0.01')}/documents.parquet")
    out = sampling.token_budget_sample(
        d, weight_col="n_chars", budget=50_000, id_col="doc_id", seed=5
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window partitions by the hash-prefix bucket, never a global
    # single-partition sort
    assert "windowspecdefinition(_b" in plan or "PartitionBy: [_b" in plan or "_b#" in plan.split("Window")[1][:300]


def test_top_fraction_per_group_exact_counts(spark):
    from sample_dms_s3_kinesis_spark.operators import sampling
    import math

    d = spark.read.parquet(f"{sf_dir('0.01')}/documents.parquet")
    out = sampling.top_fraction_per_group(
        d, value_col="n_chars", group_col="lang", fraction=0.25, id_col="doc_id"
    )
    kept = {r["lang"]: r["n"] for r in
            out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept and all(
        kept[l] == math.ceil(0.25 * totals[l]) for l in kept
    )
    # the kept rows really are the per-group longest
    mins = {r["lang"]: r["m"] for r in
            out.groupBy("lang").agg(F.min("n_chars").alias("m")).collect()}
    for lang, m in mins.items():
        dropped_max = (
            d.filter(F.col("lang") == lang)
            .join(out.select("doc_id"), "doc_id", "left_anti")
            .agg(F.max("n_chars").alias("x")).collect()[0]["x"]
        )
        assert dropped_max is None or dropped_max <= m


def test_pack_sequences_layout_properties(spark):
    from sample_dms_s3_kinesis_spark.operators import sampling

    d = spark.read.parquet(f"{sf_dir('0.01')}/documents.parquet")
    L = 4096
    out = sampling.pack_sequences(
        d, weight_col="n_chars", seq_len=L, id_col="doc_id", seed=5
    ).collect()
    assert len(out) == d.count()  # every doc is placed

    # recompute offsets from the same deterministic order and verify
    # each doc's bin contains its start offset
    import hashlib

    def bucket(doc_id):
        return hashlib.md5(f"{doc_id}:5".encode()).hexdigest()[:8]

    rows = sorted(out, key=lambda r: (bucket(r["doc_id"]), r["doc_id"]))
    offset = 0
    bins = set()
    prev_bin = 0
    for r in rows:
        want_bin = offset // L
        assert r["bin_id"] == want_bin, (r["doc_id"], r["bin_id"], want_bin)
        assert r["bin_id"] >= prev_bin  # bins fill in order
        prev_bin = r["bin_id"]
        bins.add(r["bin_id"])
        offset += r["n_chars"]
    # bin occupancy is contiguous 0..max
    assert bins == set(range(max(bins) + 1))


def test_assign_shards_deterministic_and_contiguous(spark):
    import hashlib

    from sample_dms_s3_kinesis_spark.operators.sampling import assign_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    out = assign_shards(df, num_shards=8, seed=0).select(
        "doc_id", "shard", "pos"
    )
    rows = {r["doc_id"]: (r["shard"], r["pos"]) for r in out.collect()}
    # Python reference: shard from the first 3 digest nibbles, position
    # by (digest, id) rank within shard.
    def dig(i):
        return hashlib.md5(f"{i}:0".encode()).hexdigest()[:8]

    by_shard = {}
    for i in range(200):
        by_shard.setdefault(int(dig(i)[:3], 16) % 8, []).append(i)
    for shard, ids in by_shard.items():
        ids.sort(key=lambda i: (dig(i), i))
        for pos, i in enumerate(ids, start=1):
            assert rows[i] == (shard, pos), i
    # Rerun reproduces the identical assignment (replayable recipe).
    again = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in assign_shards(df, num_shards=8, seed=0)
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert again == rows
    # Every shard's positions are contiguous 1..n.
    for shard, ids in by_shard.items():
        got = sorted(p for s, p in rows.values() if s == shard)
        assert got == list(range(1, len(ids) + 1))


def test_assign_shards_bounds(spark):
    import pytest as _pytest

    from sample_dms_s3_kinesis_spark.operators.sampling import assign_shards

    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError):
        assign_shards(df, num_shards=0)
    with _pytest.raises(ValueError):
        assign_shards(df, num_shards=5000)


def test_corpus_composition_python_reference(spark):
    from collections import defaultdict

    from sample_dms_s3_kinesis_spark.operators.sampling import corpus_composition

    rows = [
        (1, "one two three", "s1", "en"),
        (2, "four five", "s1", "en"),
        (3, "six", "s2", "en"),
        (4, "sept huit neuf dix", "s2", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    out = {
        (r["source"], r["lang"]): r
        for r in corpus_composition(df).collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for _, text, src, lang in rows:
        agg[(src, lang)][0] += 1
        agg[(src, lang)][1] += len(text.split())
    total = sum(v[1] for v in agg.values())
    assert set(out) == set(agg)
    for k, (nd, nt) in agg.items():
        assert out[k]["n_docs"] == nd
        assert out[k]["n_tokens"] == nt
        assert abs(out[k]["token_share"] - round(nt / total, 6)) <= 1e-9


def test_chunk_documents_python_reference(spark):
    """Chunk boundaries, overlap, final-partial-chunk, and exact chunk
    strings against a pure-Python chunker."""
    from sample_dms_s3_kinesis_spark.operators.sampling import chunk_documents

    docs = [
        (1, " ".join(f"t{i}" for i in range(10))),   # 10 toks: 2 chunks
        (2, " ".join(f"u{i}" for i in range(4))),    # 4 toks: 1 chunk
        (3, "single"),                               # 1 tok
        (4, " ".join(f"v{i}" for i in range(13))),   # 13 toks: 3 chunks
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=6, overlap=2)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    }
    exp = {}
    stride = 4
    for doc_id, txt in docs:
        toks = txt.split()
        for i, s in enumerate(range(0, len(toks), stride)):
            chunk = toks[s : s + 6]
            exp[(doc_id, i)] = (" ".join(chunk), len(chunk))
    assert got == exp
    # overlap: consecutive chunks share exactly `overlap` tokens
    assert got[(1, 0)][0].split()[-2:] == got[(1, 1)][0].split()[:2]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from sample_dms_s3_kinesis_spark.operators.sampling import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_profile_table_python_reference(spark):
    """Column profile against hand-computed stats on a frame with
    nulls and duplicates; approx mode keeps schema with sketch counts."""
    from sample_dms_s3_kinesis_spark.operators.profiling import profile_table

    rows = [
        (1, "a", None),
        (2, "b", 5.0),
        (3, "a", 7.5),
        (4, None, 7.5),
        (5, "c", None),
    ]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert set(got) == {"id", "s", "v"}
    for c in got:
        assert got[c]["n_rows"] == 5
    assert got["id"]["n_null"] == 0 and got["id"]["n_distinct"] == 5
    assert (got["id"]["min_value"], got["id"]["max_value"]) == ("1", "5")
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 3
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "c")
    assert got["v"]["n_null"] == 2 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_value"] == "5.0"

    approx = {r["column"]: r for r in profile_table(df, exact=False).collect()}
    assert approx["id"]["n_distinct"] >= 4  # sketch, not exact contract


def test_pack_sequence_spans_invariants(spark):
    """Spans reconstruct the packing exactly: per doc they sum to its
    weight with contiguous doc_offsets; per bin they tile [0, L)
    without overlap (full bins) and the bin ids match pack_sequences'
    start-bin assignment."""
    from sample_dms_s3_kinesis_spark.operators import sampling

    docs = spark.read.parquet(f"{sf_dir('0.001')}/documents.parquet")
    L = 512
    spans = sampling.pack_sequence_spans(
        docs, weight_col="n_chars", seq_len=L, id_col="doc_id", seed=3
    ).collect()
    weights = {r["doc_id"]: r["n_chars"] for r in docs.collect() if r["n_chars"] > 0}
    by_doc: dict = {}
    by_bin: dict = {}
    for r in spans:
        assert 0 <= r["bin_start"] < r["bin_end"] <= L
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_bin.setdefault(r["bin_id"], []).append(r)
    assert set(by_doc) == set(weights)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["bin_id"])
        total = sum(r["bin_end"] - r["bin_start"] for r in rs)
        assert total == weights[doc_id]
        # doc offsets are contiguous across the doc's spans
        off = 0
        for r in rs:
            assert r["doc_offset"] == off
            off += r["bin_end"] - r["bin_start"]
    # full bins tile exactly: sorted spans abut with no gap/overlap
    last_bin = max(by_bin)
    for bin_id, rs in by_bin.items():
        rs.sort(key=lambda r: r["bin_start"])
        pos = 0
        for r in rs:
            assert r["bin_start"] == pos
            pos = r["bin_end"]
        if bin_id < last_bin:
            assert pos == L  # interior bins are exactly full
    # start-bin agreement with pack_sequences
    packed = {
        r["doc_id"]: r["bin_id"]
        for r in sampling.pack_sequences(
            docs.filter("n_chars > 0"), weight_col="n_chars",
            seq_len=L, id_col="doc_id", seed=3,
        ).collect()
    }
    for doc_id, rs in by_doc.items():
        assert min(r["bin_id"] for r in rs) == packed[doc_id]


def test_temperature_shares_laws():
    counts = {"en": 8000, "de": 1500, "zh": 500}
    nat = sampling.temperature_shares(counts, temperature=1.0)
    tot = sum(counts.values())
    # T=1 reproduces natural proportions
    for d, n in counts.items():
        assert abs(nat[d] - n / tot) < 1e-12
    # higher T flattens: head share falls, tail share rises, sum stays 1
    for T in (2.0, 5.0, 100.0):
        s = sampling.temperature_shares(counts, temperature=T)
        assert abs(sum(s.values()) - 1.0) < 1e-12
        assert s["en"] < nat["en"] and s["zh"] > nat["zh"]
    # T→∞ approaches uniform
    s = sampling.temperature_shares(counts, temperature=1e9)
    assert all(abs(v - 1 / 3) < 1e-6 for v in s.values())
    # zero-count domains get share 0 and don't poison the rest
    s = sampling.temperature_shares({"en": 10, "empty": 0}, temperature=2.0)
    assert s["empty"] == 0.0 and abs(s["en"] - 1.0) < 1e-12


def test_temperature_mixture_sample_rebalances(spark):
    rows = [(i, "en" if i < 900 else ("de" if i < 980 else "zh"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.temperature_mixture_sample(
        df, domain_col="lang", temperature=3.0, id_col="doc_id", seed=7
    )
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # the scarcest domain relative to its scaled share survives in full
    assert got["zh"] == 20
    # head domain is downsampled below natural proportion
    assert got["en"] < 900
    # achieved mixture is closer to the T-scaled target than natural was
    shares = sampling.temperature_shares(
        {"en": 900, "de": 80, "zh": 20}, temperature=3.0
    )
    tot = sum(got.values())
    assert abs(got["en"] / tot - shares["en"]) < 0.05
    # determinism under repartition: identical surviving ids
    ids_a = {r["doc_id"] for r in out.collect()}
    ids_b = {
        r["doc_id"]
        for r in sampling.temperature_mixture_sample(
            df.repartition(17), domain_col="lang", temperature=3.0,
            id_col="doc_id", seed=7,
        ).collect()
    }
    assert ids_a == ids_b


def test_mixture_sample_with_null_domain(spark):
    """r6 review: a NULL domain value used to crash the driver-side
    sort; it is now a real stratum (eqNullSafe clause)."""
    rows = [(i, "en") for i in range(40)] + [(100 + i, None) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.mixture_sample(
        df, domain_col="lang", target_shares={"en": 1.0}, id_col="doc_id"
    )
    got = {r["lang"] for r in out.collect()}
    assert got <= {"en"}        # NULL domain has share 0: dropped
    out2 = sampling.temperature_mixture_sample(
        df, domain_col="lang", temperature=2.0, id_col="doc_id"
    )
    assert out2.count() > 0     # no TypeError with a NULL key present


def test_token_budget_sample_float_weights(spark):
    df = spark.createDataFrame(
        [(i, 1.5) for i in range(30)], "doc_id long, w double"
    )
    kept = sampling.token_budget_sample(
        df, weight_col="w", budget=15, id_col="doc_id"
    )
    assert kept.count() == 10   # 10 * 1.5 = 15 <= budget; 11th exceeds


def test_pack_sequences_drops_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, 5)], "doc_id long, w long"
    )
    out = sampling.pack_sequences(df, weight_col="w", seq_len=8, id_col="doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 4}        # matches pack_sequence_spans' manifest
    assert all(r["bin_id"] >= 0 for r in out.collect())


# ------------------------------------------------------------ k-fold

def test_kfold_assign_matches_python_and_is_stable(spark):
    import hashlib

    from sample_dms_s3_kinesis_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame([(i,) for i in range(200)], "id long")

    def ref_fold(i, folds=5, seed=0):
        h = hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8]
        return int(h, 16) % folds

    got = {r["id"]: r["fold"] for r in kfold_assign(df, id_col="id").collect()}
    assert got == {i: ref_fold(i) for i in range(200)}
    # disjoint + exhaustive by construction; every fold populated at n=200
    assert set(got.values()) == {0, 1, 2, 3, 4}
    # stable under repartition (hash depends only on the id)
    got2 = {
        r["id"]: r["fold"]
        for r in kfold_assign(df.repartition(7), id_col="id").collect()
    }
    assert got2 == got
    # seed changes the assignment
    got3 = {
        r["id"]: r["fold"]
        for r in kfold_assign(df, id_col="id", seed=1).collect()
    }
    assert got3 != got

    import pytest as _pytest

    with _pytest.raises(ValueError, match="folds"):
        kfold_assign(df, id_col="id", folds=1)
