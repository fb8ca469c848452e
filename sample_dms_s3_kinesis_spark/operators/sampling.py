"""Deterministic dataset splitting and sampling for training-data
pipelines.

Everything here derives randomness from ``md5(id ':' seed)`` rather
than Spark's per-partition RNG (``rand()``/``sample()``):

- **Reproducible across runs, partitionings, and engines** — the
  assignment is a pure function of the row id and the seed, so a
  re-run, a repartition, AQE re-planning, or a different engine
  (the DuckDB oracle) produces the identical split.  ``rand()`` is
  none of those: it depends on partition layout and task retries
  re-draw it.
- **Stable under incremental growth** — appending new documents never
  reassigns existing ones, which is what leakage-free train/val
  splits need at 100 TB where the corpus is append-only.
- **Narrow** — one projection, no shuffle, no state; scales linearly
  and survives any partitioning.

The first 8 md5 hex nibbles are compared lexicographically against a
fixed-point hex threshold (lowercase hex order == numeric order), so
the whole predicate stays JVM-side and SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SPACE = 16**8  # 8 hex nibbles of the digest


def _hex_threshold(fraction: float) -> str:
    """``fraction`` of the 32-bit hash space as an 8-nibble hex bound
    for a ``digest < bound`` filter.  ``'g'`` sorts above every hex
    digest (keep all); ``''`` sorts below every digest (drop all)."""
    if fraction >= 1.0:
        return "g"
    if fraction <= 0.0:
        return ""
    return format(int(fraction * _SPACE), "08x")


def hash_bucket(col: Column, seed: int | str = 0) -> Column:
    """First 8 hex nibbles of md5(col ':' seed) — the shared bucket
    expression (also the exact string the oracle SQL computes:
    ``substr(md5(id || ':' || seed), 1, 8)``).

    CONTRACT: ``col`` must be a non-null unique id.  NULL ids are
    indistinguishable to any deterministic hash — ``concat_ws`` skips
    them, so every NULL-id row lands in the SAME bucket and a sampler
    keeps all of them or none (systematic bias, and a split-leakage
    hazard in hash_split).  Clean or synthesize ids upstream."""
    return F.substring(
        F.md5(F.concat_ws(":", col.cast("string"), F.lit(str(seed)))), 1, 8
    )


def kfold_assign(
    df: DataFrame,
    *,
    id_col: str,
    folds: int = 5,
    seed: int | str = 0,
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: ``fold =
    md5_bucket(id:seed) mod folds`` — every row lands in exactly one
    of ``folds`` disjoint, exhaustive folds, stable across runs,
    partitionings, engines and appends (the same digest family as
    :func:`hash_split` / :func:`deterministic_sample`, so the whole
    split surface shares one reproducibility contract).

    Fold i's validation set is ``fold == i`` and its training set is
    everything else — no materialization per fold, just a filter.
    Hashing a GROUP key (author, source domain) instead of the row id
    gives leakage-safe folds, same as the group-split flavor of
    hash_split.  Same NULL-id contract as :func:`hash_bucket`.
    """
    if folds < 2:
        raise ValueError(f"folds must be >= 2, got {folds}")
    h = F.conv(hash_bucket(F.col(id_col), seed), 16, 10).cast("bigint")
    return df.withColumn(out_col, F.pmod(h, F.lit(folds)).cast("int"))


def hash_split(
    df: DataFrame,
    *,
    id_col: str,
    weights: Mapping[str, float] | Sequence[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    seed: int | str = 0,
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label, e.g. train/val/test.

    ``weights`` are (label, fraction) in declaration order; fractions
    must sum to ~1.  The last label is the catch-all so the union is
    exhaustive regardless of rounding.
    """
    items = list(weights.items()) if isinstance(weights, Mapping) else list(weights)
    total = sum(w for _, w in items)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = hash_bucket(F.col(id_col), seed)
    # CASE in ascending-bound order: the first matching bound wins, so
    # label i covers the [c_{i-1}, c_i) slice of the hash space.
    cum = 0.0
    cond_expr = None
    for label, w in items[:-1]:
        cum += w
        clause = h < F.lit(_hex_threshold(cum))
        cond_expr = (
            F.when(clause, F.lit(label))
            if cond_expr is None
            else cond_expr.when(clause, F.lit(label))
        )
    cond_expr = (
        cond_expr.otherwise(F.lit(items[-1][0]))
        if cond_expr is not None
        else F.lit(items[-1][0])
    )
    return df.withColumn(out_col, cond_expr)


def deterministic_sample(
    df: DataFrame,
    *,
    id_col: str,
    fraction: float,
    seed: int | str = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by the row's hash bucket.
    Unlike ``DataFrame.sample`` this is a pure filter: re-runs,
    repartitions, and engine changes select the same rows."""
    h = hash_bucket(F.col(id_col), seed)
    return df.filter(h < F.lit(_hex_threshold(fraction)))


def weighted_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int | str = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows, deterministic
    (A-Res, Efraimidis & Spirakis 2006): each row draws a uniform
    ``u`` from its hash bucket and the ``k`` largest ``u^(1/w)`` keys
    are the sample — inclusion probability proportional to weight,
    sequential-pass semantics, no global RNG state.

    The same md5-derived ``u`` as every sampler here, so the draw is
    reproducible across runs/partitionings/engines and new rows never
    re-draw existing ones.  Rows with non-positive or null weight are
    excluded.  Plan: one narrow projection + ``orderBy().limit(k)`` →
    TakeOrderedAndProject (per-partition k-heaps, driver merges k rows
    — no global sort, 100 TB safe for any sane ``k``).

    Float caveat: ``pow`` may differ across engines in the last ulp;
    selection flips only if two keys tie within that ulp at rank k —
    vanishing for continuous keys (and the determinism contract is
    per-engine bitwise anyway).
    """
    v = F.conv(hash_bucket(F.col(id_col), seed), 16, 10).cast("double")
    u = (v + F.lit(0.5)) / F.lit(float(_SPACE))
    w = F.col(weight_col).cast("double")
    return (
        df.filter(w > 0)
        .withColumn("_key", F.pow(u, F.lit(1.0) / w))
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(k)
        .drop("_key")
    )


def weighted_sample_per_group(
    df: DataFrame,
    *,
    group_cols: str | Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
    seed: int | str = 0,
) -> DataFrame:
    """Per-group A-Res weighted sampling without replacement: the ``k``
    largest ``u^(1/w)`` keys WITHIN each group — e.g. k documents per
    language/source with inclusion probability proportional to length,
    the stratified twin of :func:`weighted_sample`.

    Same md5-derived uniform, so fully deterministic.  Plan: one
    row_number window partitioned by the group — the shuffle is keyed
    on the group and each task heap-sorts only its groups' rows;
    nothing global.  For a skewed group carrying most of the corpus,
    pre-filter with :func:`deterministic_sample` or winsorize the
    weight first (the window must sort that group's rows on one task).
    """
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    v = F.conv(hash_bucket(F.col(id_col), seed), 16, 10).cast("double")
    u = (v + F.lit(0.5)) / F.lit(float(_SPACE))
    w = F.col(weight_col).cast("double")
    win = Window.partitionBy(*gcols).orderBy(
        F.desc("_key"), F.asc(id_col)
    )
    return (
        df.filter(w > 0)
        .withColumn("_key", F.pow(u, F.lit(1.0) / w))
        .withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= k)
        .drop("_key", "_rk")
    )


def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str,
    seed: int | str = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones).  One narrow filter — the
    per-stratum threshold is a CASE over ``strata_col``, so there is
    no shuffle and no driver-side split like ``sampleBy``'s RNG."""
    h = hash_bucket(F.col(id_col), seed)
    bound = None
    # None sorts last (a NULL stratum is legal — the domain column may
    # be nullable and mixture callers pass observed keys through);
    # eqNullSafe makes the NULL stratum matchable while behaving
    # exactly like == for every non-null one.
    for stratum, frac in sorted(
        fractions.items(),
        key=lambda kv: (kv[0] is None, "" if kv[0] is None else str(kv[0])),
    ):
        clause = F.col(strata_col).eqNullSafe(F.lit(stratum))
        hexb = F.lit(_hex_threshold(frac))
        bound = F.when(clause, hexb) if bound is None else bound.when(clause, hexb)
    bound = (
        bound.otherwise(F.lit(_hex_threshold(default_fraction)))
        if bound is not None
        else F.lit(_hex_threshold(default_fraction))
    )
    return df.filter(h < bound)


def mixture_fractions(
    counts: Mapping[str, int], target_shares: Mapping[str, float]
) -> dict[str, float]:
    """Max-retention keep fractions that rebalance domain counts to the
    target mixture: budget B = min_d(count_d / share_d) rows total, so
    frac_d = B * share_d / count_d and the scarcest domain (relative to
    its target share) is kept in full.  Domains absent from
    ``target_shares`` get fraction 0 (dropped).

    All arithmetic is double-precision in a fixed operation order so an
    engine computing the same expression (the DuckDB oracle) derives
    bit-identical fractions and therefore identical hash thresholds.
    """
    # share > 0 guard: a zero-(or negative-)share domain with rows is a
    # "drop it" request, not a division — excluding it from `present`
    # keeps it out of the budget min() and lands it in the 0.0 branch.
    present = {
        d: float(n)
        for d, n in counts.items()
        if n > 0 and target_shares.get(d, 0.0) > 0
    }
    if not present:
        return {d: 0.0 for d in counts}
    budget = min(n / target_shares[d] for d, n in present.items())
    return {
        d: (min(budget * target_shares[d] / n, 1.0) if d in present else 0.0)
        for d, n in ((d, float(n)) for d, n in counts.items())
    }


def mixture_sample(
    df: DataFrame,
    *,
    domain_col: str,
    target_shares: Mapping[str, float],
    id_col: str,
    seed: int | str = 0,
) -> DataFrame:
    """Deterministically downsample so the surviving corpus matches the
    target domain mixture (e.g. language or source rebalancing for a
    training run) while retaining the maximum possible data.

    Two-step plan: a tiny per-domain count aggregate (collect of
    #domains rows — driver traffic is O(domains) at any corpus size)
    derives the per-domain keep fractions, then ONE narrow stratified
    hash filter applies them — no shuffle of the corpus, reproducible
    under re-runs/repartitioning/appends like every sampler here."""
    counts = {
        r[domain_col]: r["n"]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    fractions = mixture_fractions(counts, target_shares)
    return stratified_sample(
        df,
        strata_col=domain_col,
        fractions=fractions,
        id_col=id_col,
        seed=seed,
        default_fraction=0.0,
    )


def _bucketed_prefix_cumsum(
    df: DataFrame,
    *,
    weight_col: str,
    id_col: str,
    seed: int | str,
    out_col: str = "_cum",
) -> DataFrame:
    """Inclusive running sum of ``weight_col`` over the global
    deterministic (hash, id) order — WITHOUT a single-partition global
    window.

    The hash's first two nibbles form 256 buckets whose order is
    compatible with the full hash order (prefix property), so the plan
    is: per-bucket weight sums (one tiny aggregate, ≤256 rows to the
    driver) → driver-side exclusive prefix offsets → broadcast join →
    per-bucket window cumsum + offset.  256 parallel window partitions;
    bit-identical to the naive global cumsum.  Internal columns are
    dropped except ``out_col``.
    """
    h = hash_bucket(F.col(id_col), seed)
    base = df.withColumn("_h", h).withColumn("_b", F.substring(F.col("_h"), 1, 2))
    per_bucket = base.groupBy("_b").agg(F.sum(weight_col).alias("_w")).collect()
    offsets = []
    acc = 0
    for r in sorted(per_bucket, key=lambda r: r["_b"]):
        offsets.append((r["_b"], acc))
        acc += r["_w"] or 0
    # integer weights keep exact long offsets (the 100 TB cumsum must
    # not round through a double); a floating weight column switches
    # the offset type to match — the hard-coded long schema used to
    # reject float sums outright (r6 review find)
    if any(isinstance(o, float) for _, o in offsets):
        off_type = "double"
        offsets = [(b, float(o)) for b, o in offsets]
    else:
        off_type = "long"
    off_df = df.sparkSession.createDataFrame(
        offsets, f"_b string, _off {off_type}"
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(off_df), "_b")
        .withColumn(out_col, F.sum(weight_col).over(w) + F.col("_off"))
        .drop("_b", "_h", "_off")
    )


def token_budget_sample(
    df: DataFrame,
    *,
    weight_col: str,
    budget: int,
    id_col: str,
    seed: int | str = 0,
) -> DataFrame:
    """Keep documents in deterministic hash order until the cumulative
    ``weight_col`` (token/char count) reaches ``budget`` — "give me N
    tokens of this corpus, reproducibly".  See
    :func:`_bucketed_prefix_cumsum` for the scale shape (no global
    single-partition window)."""
    cum = _bucketed_prefix_cumsum(
        df, weight_col=weight_col, id_col=id_col, seed=seed
    )
    return cum.filter(F.col("_cum") <= F.lit(budget)).drop("_cum")


def pack_sequences(
    df: DataFrame,
    *,
    weight_col: str,
    seq_len: int,
    id_col: str,
    seed: int | str = 0,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Concat-then-chunk sequence-packing layout: documents are laid
    out in deterministic hash order and each is assigned the training
    sequence (bin) containing its START offset —
    ``bin_id = floor(exclusive_prefix / seq_len)``.

    This is the distributed plan for GPT-style packing: the layout
    (which docs land in which sequence, in which order) is decided
    here; the tokenizer-level split of boundary-spanning documents
    happens downstream inside each bin.  Deterministic under re-runs,
    repartitioning, and engine changes, like every sampler in this
    module; scale shape per :func:`_bucketed_prefix_cumsum`.

    Non-positive weights are dropped, matching
    :func:`pack_sequence_spans` — a zero-weight doc occupies no span
    and a negative one would walk the running sum BACKWARDS, silently
    overlapping every later document's bin assignment.
    """
    cum = _bucketed_prefix_cumsum(
        df.filter(F.col(weight_col) > 0),
        weight_col=weight_col,
        id_col=id_col,
        seed=seed,
    )
    start = F.col("_cum") - F.col(weight_col)
    return cum.withColumn(
        bin_col, F.floor(start / F.lit(seq_len)).cast("long")
    ).drop("_cum")


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size token chunks with optional
    overlap — the context-window prep that complements
    :func:`pack_sequences` (packing concatenates SHORT docs; chunking
    splits LONG ones).  Chunk starts step by ``chunk_tokens − overlap``;
    the final chunk keeps its natural (shorter) length.

    Output: (id_col, chunk_id, chunk_text, n_tokens), one row per
    chunk, chunk_id counting from 0 within the document.

    Scale: a narrow projection + posexplode — no shuffle, no window; a
    doc's chunk fan-out is bounded by its own length, so the operator
    is embarrassingly parallel at any corpus size.  Deterministic and
    SQL-expressible (whitespace tokens, fixed stride), so the driver
    oracle verifies exact chunk strings cross-engine."""
    from sample_dms_s3_kinesis_spark.operators.text import tokens

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_tokens "
            f"({chunk_tokens})"
        )
    base = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).withColumn("_n", F.size("_t"))
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    return base.select(
        id_col,
        "_t",
        "_n",
        F.posexplode(starts).alias("chunk_id", "_s"),
    ).select(
        id_col,
        "chunk_id",
        F.array_join(
            F.slice("_t", F.col("_s") + 1, chunk_tokens), " "
        ).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_s")).alias(
            "n_tokens"
        ),
    )


def top_fraction_per_group(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    fraction: float,
    id_col: str,
) -> DataFrame:
    """Keep the top ``fraction`` of rows per group by ``value_col``
    (ties broken by id) — rank-based quality filtering ("keep the best
    25% of documents per language").  Rank-based rather than
    quantile-threshold-based: the kept count is exactly
    ``ceil(fraction * |group|)`` with no interpolation arithmetic to
    diverge between engines.  One shuffle on the group key; heavy
    groups are the usual window-skew hazard."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).desc(), F.col(id_col).asc()
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy(group_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_keep", F.ceil(F.lit(fraction) * cnt))
        .filter(F.col("_rk") <= F.col("_keep"))
        .drop("_rk", "_keep")
    )


def group_sample_topk(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    k: int,
    seed: int | str = 0,
) -> DataFrame:
    """Exactly ``min(k, |group|)`` deterministic representatives per
    group — a shuffled-by-group rank over the hash order (uniform
    within each group, tie-broken by id).  The reproducible stand-in
    for per-group reservoir sampling: one shuffle on ``group_col``;
    heavy groups are the skew hazard (salt or pre-aggregate upstream
    if one group dominates)."""
    h = hash_bucket(F.col(id_col), seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def assign_shards(
    df: DataFrame,
    *,
    num_shards: int,
    id_col: str = "doc_id",
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic training-shard assignment with a reproducible
    within-shard order: ``shard`` = value of the digest's first three
    hex nibbles (0..4095) mod ``num_shards``; ``pos`` = 1-based rank of
    the digest (id tie-break) within the shard.  Rerunning over the
    same corpus and seed reproduces the exact shard files and row
    order a trainer consumed — the property that makes a data recipe
    replayable.

    Scale notes: assignment is map-side; the within-shard rank is a
    window partitioned by shard, i.e. one sort task per shard — which
    is exactly the write shape (one ordered shard file per task).
    Choose ``num_shards`` so a shard fits a task (~100-500 MB).
    Distribution is uniform when ``num_shards`` divides 4096 and at
    most 4096 shards are addressable; beyond that, widen the nibble
    slice.  The digest math (md5 prefix → integer) is mirrored by
    ``instr('0123456789abcdef', ...)`` arithmetic in the DuckDB
    oracle — same value, no engine-specific hashing.
    """
    if not 1 <= num_shards <= 4096:
        raise ValueError("num_shards must be in [1, 4096]")
    dig = hash_bucket(F.col(id_col), seed)
    nib3 = F.conv(F.substring(dig, 1, 3), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy("_dig", id_col)
    return (
        df.withColumn("_dig", dig)
        .withColumn("shard", (nib3 % num_shards).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_dig")
    )


def corpus_composition(
    df: DataFrame,
    *,
    group_cols: Sequence[str] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus-composition report: documents, tokens, and token share
    per group (source × language) — the mixing table every pretraining
    data pipeline publishes before sampling weights are chosen.

    One hash aggregate over the corpus (map-side partial combine, the
    shuffle carries one row per group per partition); the share window
    runs over the post-aggregate frame, which is O(groups) rows, so the
    single-partition window task is trivially bounded.  Output:
    (*group_cols, n_docs, n_tokens, token_share)."""
    from sample_dms_s3_kinesis_spark.operators.text import token_count

    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    return agg.select(
        *group_cols,
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w), 6
        ).alias("token_share"),
    )


def pack_sequence_spans(
    df: DataFrame,
    *,
    weight_col: str,
    seq_len: int,
    id_col: str,
    seed: int | str = 0,
) -> DataFrame:
    """Data-loader manifest for :func:`pack_sequences`: one row per
    (training sequence, document) with the token span the document
    occupies INSIDE that sequence — the information a loader needs to
    build attention masks and split boundary-spanning documents,
    which ``pack_sequences``'s start-bin assignment alone doesn't
    carry.

    A document starting at global offset ``s`` with weight ``w``
    covers bins ``floor(s/L) … floor((s+w−1)/L)``; in bin ``b`` it
    occupies ``[max(s, bL) − bL, min(s+w, (b+1)L) − bL)`` and
    ``doc_offset`` is the document-internal position where the span
    begins.  Zero-weight rows don't appear.

    Plan: the same 256-bucket prefix cumsum as the other packers (no
    global window), then a per-doc ``sequence`` explode over the bins
    it touches — fan-out bounded by ``w/L + 1`` rows per document.
    Output: (bin_id, id_col, bin_start, bin_end, doc_offset).
    """
    cum = _bucketed_prefix_cumsum(
        df.filter(F.col(weight_col) > 0),
        weight_col=weight_col,
        id_col=id_col,
        seed=seed,
    )
    spans = (
        cum.withColumn("_s", F.col("_cum") - F.col(weight_col))
        .withColumn("_e", F.col("_cum"))
        .withColumn(
            "bin_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("_s") / F.lit(seq_len)),
                    F.floor((F.col("_e") - 1) / F.lit(seq_len)),
                )
            ),
        )
    )
    b0 = F.col("bin_id") * F.lit(seq_len)
    span_start_global = F.greatest(F.col("_s"), b0)
    return spans.select(
        F.col("bin_id").cast("long"),
        F.col(id_col),
        (span_start_global - b0).cast("long").alias("bin_start"),
        (F.least(F.col("_e"), b0 + F.lit(seq_len)) - b0)
        .cast("long")
        .alias("bin_end"),
        (span_start_global - F.col("_s")).cast("long").alias("doc_offset"),
    )


def temperature_shares(
    counts: Mapping[str, int], *, temperature: float
) -> dict[str, float]:
    """Temperature-scaled sampling shares over domain counts —
    share_d ∝ count_d^(1/T), the multilingual/multi-domain rebalancing
    rule (T=1 keeps natural proportions, T→∞ approaches uniform;
    mBERT/XLM-R exponent-smoothing with alpha = 1/T).

    Op order is fixed (weights in sorted-domain order, one final
    normalization) so an oracle computing POW(n, 1/T)/SUM(...) over the
    same doubles derives bit-identical shares.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    alpha = 1.0 / temperature
    weights = {
        d: float(n) ** alpha
        for d, n in sorted(
            counts.items(),
            key=lambda kv: (
                kv[0] is None,
                "" if kv[0] is None else str(kv[0]),
            ),
        )
        if n > 0
    }
    tot = 0.0
    for w in weights.values():  # sorted-domain accumulation order
        tot += w
    if tot == 0.0:
        return {d: 0.0 for d in counts}
    return {d: weights.get(d, 0.0) / tot for d in counts}


def temperature_mixture_sample(
    df: DataFrame,
    *,
    domain_col: str,
    temperature: float,
    id_col: str,
    seed: int | str = 0,
) -> DataFrame:
    """Deterministically rebalance the corpus toward the
    temperature-scaled mixture: derive share_d ∝ n_d^(1/T) from the
    observed domain counts, then apply :func:`mixture_sample`'s
    max-retention budget arithmetic and stratified hash filter.  With
    T>1 the head domains are downsampled toward the tail (the scarcest
    domain relative to its scaled share survives in full); the corpus
    itself never shuffles — one O(domains) count aggregate picks the
    fractions and a narrow hash filter applies them, same 100 TB shape
    as every sampler here.
    """
    counts = {
        r[domain_col]: r["n"]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    shares = temperature_shares(counts, temperature=temperature)
    fractions = mixture_fractions(counts, shares)
    return stratified_sample(
        df,
        strata_col=domain_col,
        fractions=fractions,
        id_col=id_col,
        seed=seed,
        default_fraction=0.0,
    )
