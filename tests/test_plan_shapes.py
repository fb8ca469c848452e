"""Physical-plan shape assertions: the scale contract is that filters
and projections reach the parquet scan, small dims broadcast, top-k
plans as TakeOrderedAndProject, and no Python evaluation appears in
JVM-only pipelines.  These guard against plan regressions that tests
on 60k rows would never notice but a 100 TB cluster would."""

from sample_dms_s3_kinesis_spark.plans.registry import REGISTRY

from tdata import sf_dir

SF_DIR = sf_dir("0.001")


def _plan(spark, name: str, *, execute: bool = False) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    if execute:
        # AQE finalizes the physical plan (and annotates WholeStage-
        # Codegen spans with ``*(n)``) only after execution.
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q06_filters_and_projection_reach_the_scan(spark):
    plan = _plan(spark, "q06_forecast_revenue")
    assert "PushedFilters: [" in plan
    # the shipdate range predicate is pushed into the parquet scan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    # column pruning: the scan reads only the needed columns, never
    # the whole 16-column lineitem row
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_extendedprice" in read_schema
    assert "l_orderkey" not in read_schema


def test_q01_stays_in_wholestage_codegen_without_python(spark):
    plan = _plan(spark, "q01_pricing_summary", execute=True)
    # ``*(n)`` marks a WholeStageCodegen span; partial_sum marks the
    # map-side combine before the shuffle.
    assert "*(" in plan
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_partition_key_join_broadcasts_the_dims(spark):
    plan = _plan(spark, "q_partition_key")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_top_orders_plans_as_take_ordered(spark):
    plan = _plan(spark, "q_top_orders")
    assert "TakeOrderedAndProject" in plan


def test_curation_pipeline_is_jvm_only(spark):
    plan = _plan(spark, "q_curation_pipeline", execute=True)
    assert "*(" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_md5_shuffles_digests_not_bodies(spark):
    plan = _plan(spark, "q_dedup_md5_documents")
    # the shuffle is keyed on the digest, and its input is the partial
    # aggregate over (digest, id) — the text column is projected into
    # md5() BELOW the exchange, so bodies never move
    assert "hashpartitioning(content_hash" in plan
    between_exchange_and_project = plan.split("Exchange")[1].split("Project")[0]
    assert "partial_min" in between_exchange_and_project
    assert "text#" not in between_exchange_and_project


def test_decontaminate_broadcasts_benchmark_grams(spark):
    # The benchmark gram set is tiny next to the corpus; the overlap
    # join must build-broadcast it, keeping full probe parallelism.
    plan = _plan(spark, "q_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dup_ngram_stats_single_scan_window(spark):
    # Doc frequency comes from a count-window over the gram digest:
    # exactly one scan of documents.parquet (the groupBy+join shape
    # costs two scans AND two full-stream shuffles).
    plan = _plan(spark, "q_dup_ngram_stats")
    assert plan.count("documents.parquet") == 1
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unigram_lm_stays_jvm_side(spark):
    plan = _plan(spark, "q_unigram_lm_score", execute=True)
    assert "*(" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_assign_shards_reads_documents_once(spark):
    plan = _plan(spark, "q_assign_shards")
    assert plan.count("documents.parquet") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_band_cap_is_broadcast_anti_join_not_window(spark):
    """The band-width cap must be pay-as-you-go: over-cap buckets come
    from a map-side-combined groupBy count (HashAggregate) and are
    removed with a BROADCAST anti-join — never a sort-based count-window
    over every banded row (the r4 shape, whose sort cost 40-90% extra on
    the minhash family even when no bucket was ever hot)."""
    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.operators import dedup

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    capped = dedup.minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, threshold=0.5
    )
    capped.collect()  # AQE finalizes the physical plan only after execution
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "HashAggregate" in plan


def test_round4_queries_stay_jvm_side(spark):
    """None of the round-4 operators may fall back to Python row
    evaluation — they are all pure Catalyst expressions."""
    for name in (
        "q_dedup_canonical",
        "q_quality_score_filter",
        "q_corpus_composition",
        "q_dup_span_coverage",
        "q_vocab_topk",
        "q_embedding_quantize",
        "q_length_histogram",
        "q_remove_dup_spans",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_vocab_topk_partial_aggregation(spark):
    """The token count must partially aggregate map-side (two
    HashAggregate phases) so hot tokens never ship raw occurrences, and
    the rank window runs over the aggregated frame only."""
    plan = _plan(spark, "q_vocab_topk")
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan


def test_persisted_ivf_probe_prunes_partitions(spark, tmp_path):
    """IvfIndex.save writes the assignment partitioned BY CELL; a loaded
    index's probe filter (cell IN ...) must reach the parquet scan as a
    PartitionFilter — storage-level pruning, not a post-scan filter —
    and return the same answer as the in-memory index."""
    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.operators import similarity

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < 512)
        .select("vec_id", "embedding")
    )
    idx = similarity.IvfIndex.build(emb, cells=8)
    idx.save(str(tmp_path / "ivf"))
    loaded = similarity.IvfIndex.load(spark, str(tmp_path / "ivf"))

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = loaded.search(qv, k=5, nprobe=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any(
        "PartitionFilters: [cell#" in ln and " IN " in ln for ln in scan_lines
    ), plan
    assert [r["vec_id"] for r in got.collect()] == [
        r["vec_id"] for r in idx.search(qv, k=5, nprobe=2).collect()
    ]


def test_round5_queries_stay_jvm_side(spark):
    """The late round-5 operators are all pure Catalyst — no Python
    row evaluation anywhere in their plans."""
    for name in (
        "q_corpus_diff",
        "q_weighted_sample",
        "q_bigram_lm_score",
        "q_skew_report",
        "q_vocab_coverage",
        "q_winsorize",
        "q_oov_rate",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_weighted_sample_plans_as_take_ordered(spark):
    """A-Res top-k must be per-partition heaps + driver merge, never a
    global sort of the corpus."""
    plan = _plan(spark, "q_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan.split("TakeOrderedAndProject")[0]


def test_skew_report_take_ordered_and_partial_agg(spark):
    """The report aggregates map-side (two HashAggregate phases) and
    takes its top-N with heaps — the hot key never concentrates."""
    plan = _plan(spark, "q_skew_report")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_corpus_diff_shuffles_digests_not_text(spark):
    """The full outer join must carry the md5 digest, not document
    bodies: no 'text' column survives past the scan projection."""
    plan = _plan(spark, "q_corpus_diff")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "md5" in plan
    # the join's shuffle exchanges project (id, digest, flag) only
    joins = plan.split("FullOuter")
    assert len(joins) >= 2
    assert "text" not in joins[0]


def test_vocab_coverage_ranks_on_take_ordered_frame(spark):
    """The rank window may only run over the <=max(K)-row TakeOrdered
    result, never the full token-count frame."""
    plan = _plan(spark, "q_vocab_coverage")
    assert "TakeOrderedAndProject" in plan
    assert "Window" in plan
    # Window must appear ABOVE (before, in toString order) the
    # TakeOrdered that bounds its input
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_latest_round5_queries_stay_jvm_side(spark):
    for name in (
        "q_weighted_sample_group",
        "q_prefix_jaccard_pairs",
        "q_profile_drift",
        "q_minhash_index_gate",
        "q_dedup_report",
        "q_corr_stats",
        "q_token_cosine_pairs",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_prefix_jaccard_candidate_join_is_keyed(spark):
    """The candidate and verification joins must be equi-joins on the
    token (SortMerge/ShuffledHash/BroadcastHash), never a nested-loop
    over doc pairs."""
    plan = _plan(spark, "q_prefix_jaccard_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    keyed = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert keyed >= 3  # candidate join + two verification joins


def test_dedup_segments_keep_first_is_aggregate_not_window(spark):
    """Global keep-first must compile to a partial-aggregated
    MIN(struct) — a row_number Window over the segment key would
    funnel every occurrence of a boilerplate segment through one
    task (the skew hazard the operator exists to avoid)."""
    plan = _plan(spark, "q_dedup_segments")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan  # map-side combine on the segment key
    # the only Window-free rebuild: sort_array over collect_list
    assert plan.count("Window") == 0


def test_session_r5b_queries_stay_jvm_side(spark):
    """The funnel/cohort/unpivot/HOF/temperature/segment-within batch
    is pure Catalyst — no Python row evaluation in any plan."""
    for name in (
        "q_unpivot_metrics",
        "q_array_hof_stats",
        "q_dedup_segments_within",
        "q_temperature_mixture",
        "q_funnel_counts",
        "q_cohort_retention",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_funnel_scans_events_once(spark):
    """The funnel fold must touch the event table ONCE (the naive plan
    joins it k times, once per step) and push the step-type filter to
    the scan."""
    plan = _plan(spark, "q_funnel_counts")
    assert plan.count("Scan parquet") == 1
    assert "PushedFilters" in plan and "event_type" in plan


def test_cohort_distinct_is_two_phase(spark):
    """Exact distinct-user counts must run as partial/final aggregates
    (map-side combine), never a single-phase global aggregate."""
    plan = _plan(spark, "q_cohort_retention")
    assert plan.count("HashAggregate") >= 4


def test_session_r5c_queries_stay_jvm_side(spark):
    """The analytics follow-ups (conversion latency, resample, rolling
    frames, anomaly, LTV, WAU) are pure Catalyst."""
    for name in (
        "q_funnel_conversion",
        "q_resample_ffill",
        "q_rolling_7d_value",
        "q_daily_anomaly",
        "q_cohort_ltv",
        "q_rolling_wau",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_rolling_7d_window_runs_over_daily_frame(spark):
    """The RANGE window must order the per-(type, day) aggregate, never
    the raw events: an aggregate appears below the window."""
    plan = _plan(spark, "q_rolling_7d_value")
    assert "Window" in plan
    below = plan.split("Window")[-1]
    assert "HashAggregate" in below


def test_session_r5d_queries_stay_jvm_side(spark):
    """Search family, windowed funnel, SQL entry, and trend fitting
    are pure Catalyst."""
    for name in (
        "q_boolean_search",
        "q_phrase_search",
        "q_bm25_search",
        "q_funnel_windowed",
        "q_sql_entry_revenue",
        "q_daily_trend",
        "q_session_stats",
        "q_event_transitions",
        "q_edit_distance_pairs",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_bm25_finishes_with_take_ordered(spark):
    plan = _plan(spark, "q_bm25_search")
    assert "TakeOrderedAndProject" in plan


def test_session_r5e_queries_stay_jvm_side(spark):
    for name in (
        "q_group_split",
        "q_split_leakage",
        "q_stickiness",
        "q_resample_interpolate",
        "q_unpivot_metrics",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_session_r5f_queries_stay_jvm_side(spark):
    for name in (
        "q_top_journeys",
        "q_check_expectations",
        "q_quarantine",
        "q_hll_daily_union",
        "q_cohort_ltv",
        "q_rolling_wau",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_round6_queries_stay_jvm_side(spark):
    """The four round-6 queries: no Python eval, no cartesian.  The
    LATERAL entry must DECORRELATE (Catalyst rewrites the correlated
    limit-1 subquery into the window plan — a surviving per-row
    re-execution would show as a nested loop); PMI's only
    nested-loop join is the 1-row broadcast totals frame."""
    for name in (
        "q_pmi_bigrams",
        "q_lateral_top_order",
        "q_cdc_chunks",
        "q_dedup_segments_cdc",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    lateral = _plan(spark, "q_lateral_top_order")
    assert "Window" in lateral           # decorrelated top-1
    assert "BroadcastNestedLoop" not in lateral
    # cdc chunking is per-document — the only exchange is spread()'s
    # deliberate parallelism repartition, never a key shuffle
    chunks = _plan(spark, "q_cdc_chunks")
    assert chunks.count("Exchange") <= 1, chunks.count("Exchange")
    assert "hashpartitioning" not in chunks and "rangepartitioning" not in chunks


def test_signature_builders_evaluate_tokenize_once(spark):
    """r6 HOF-CSE fix: the k slot transforms (and 64 simhash bit
    filters) must reference a BOUND base-hash array, not re-inline the
    tokenize→shingle→hash pipeline per slot.  The physical plan shows
    exactly one split() when bound; the unbound form shows one per
    slot (measured 8.95 s vs 0.40 s for the k=128 signature scan at
    sf0.1)."""
    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.operators import dedup, similarity

    d = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    sig = d.select(
        dedup.minhash_signature(F.col("text"), num_hashes=64).alias("s")
    )
    assert (
        sig._jdf.queryExecution().executedPlan().toString().count("split(")
        <= 2
    )
    sh = d.select(dedup.simhash(F.col("text")).alias("s"))
    assert (
        sh._jdf.queryExecution().executedPlan().toString().count("split(")
        <= 2
    )
    # l2_normalize: the norm aggregate must appear once, not per
    # component (the captured-lambda O(d^2) trap)
    e = spark.createDataFrame([(1, [3.0, 4.0])], "id long, v array<double>")
    unit = e.select(similarity.l2_normalize(F.col("v")).alias("u"))
    plan = unit._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("sqrt") <= 2, plan.lower().count("sqrt")


def test_graph_queries_stay_jvm_side(spark):
    for name in ("q_neardup_degrees", "q_pagerank_neardup"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_html_extract_is_jvm_only_single_scan(spark):
    """The HTML extraction chain is ~40 regexp/HOF expressions but ONE
    narrow projection: no Python eval, no KEY shuffle, one documents
    scan.  The single allowed Exchange is the deliberate round-robin
    parallelism spread (the one-file scan would otherwise pin the
    whole regex chain to one core) — same contract as q_cdc_chunks."""
    plan = _plan(spark, "q_html_extract")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 1, plan.count("Exchange")
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert plan.count("Scan parquet") == 1


def test_url_domain_caps_single_window_shuffle(spark):
    """URL parse + registered domain are narrow; the per-domain cap is
    exactly ONE shuffle (the window's domain-key exchange)."""
    plan = _plan(spark, "q_url_domain_caps")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_warc_text_decode_path_has_no_python(spark, tmp_path):
    """The text-reader response path (incl. the chunked-decode fold)
    is pure Catalyst: no Arrow/Python evaluation node may appear in
    its plan.  The binary path pays exactly ONE Arrow eval (the
    pre-gated decompressor) — never one per coding branch."""
    import gzip

    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.sources import crawl

    body = "plan shape page body"
    payload = f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n{body}"
    rec = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://p.com/x\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n{payload}\r\n\r\n"
    )
    t = tmp_path / "txt"
    t.mkdir()
    (t / "f.warc").write_text(rec)
    g = tmp_path / "gz"
    g.mkdir()
    (g / "f.warc.gz").write_bytes(gzip.compress(rec.encode()))

    text_plan = (
        crawl.warc_responses(crawl.read_warc_records(spark, str(t)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "pythonUDF"):
        assert marker not in text_plan, marker

    bin_plan = (
        crawl.warc_responses(
            crawl.read_warc_gz(spark, str(g), binary_payload=True)
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one decompressor eval for the whole response frame (plus the
    # container reader's own mapInPandas)
    assert bin_plan.count("ArrowEvalPython") == 1


def test_recrawl_priority_single_shuffle_no_python(spark):
    """The change-rate estimator is one lag window + one groupBy on
    the SAME key: Catalyst reuses the window's hash partitioning for
    the aggregate, so the whole operator is exactly ONE exchange and
    zero Python."""
    from sample_dms_s3_kinesis_spark.operators.urls import (
        recrawl_priority,
    )

    df = spark.createDataFrame(
        [("k", "20240101000000", "d")],
        "urlkey string, ts string, digest string",
    )
    plan = (
        recrawl_priority(df, now="2024-07-01 00:00:00")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_canonical_alias_stays_jvm_side_single_shuffle(spark):
    """html_canonical + resolve + identity groupBy: pure Catalyst, one
    aggregate exchange, one documents scan."""
    plan = _plan(spark, "q_canonical_alias")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Scan parquet") == 1


def test_http_validator_columns_no_python(spark, tmp_path):
    """The validator headers ride the existing Catalyst header probes:
    the text-path response plan stays Python-free with them selected."""
    from sample_dms_s3_kinesis_spark.sources import crawl

    body = "v page"
    payload = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        'ETag: "x"\r\n\r\n' + body
    )
    rec = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://p.com/v\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n{payload}\r\n\r\n"
    )
    t = tmp_path / "txt"
    t.mkdir()
    (t / "f.warc").write_text(rec)
    plan = (
        crawl.warc_responses(crawl.read_warc_records(spark, str(t)))
        .select("http_etag", "http_last_modified", "http_charset")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "pythonUDF"):
        assert marker not in plan, marker
