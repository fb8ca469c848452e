"""Dataset profiling: per-column statistics in one aggregation pass.

The pipeline-health report a curation run starts and ends with (row
counts, null rates, cardinalities, value ranges) — the generalization
of the reference's per-table replication statistics
(`/root/reference/run.py:209-215`) from apply counters to column-level
data quality.

Scale notes: ONE wide aggregate computes every column's stats in a
single pass (count/min/max partial-aggregate map-side; the exact
distincts share one expand-based aggregate), then a literal
struct-array explode pivots the 1-row result into one row per column —
driver never sees data, only the final O(columns) rows.  Exact
distinct counts multiply the aggregate's internal row stream by the
column count (Spark's expand); at 100 TB pass ``exact=False`` to use
HLL sketches (``approx_count_distinct``) and keep the pass linear.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    exact: bool = True,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value), min/max cast to string so heterogeneous
    column types share one schema.  ``exact=False`` swaps the distinct
    counts to ``approx_count_distinct`` (no SQL oracle then)."""
    cols = list(columns) if columns is not None else list(df.columns)
    distinct = F.count_distinct if exact else F.approx_count_distinct

    # Backtick-quoted reads + positional alias ids: F.col (and the
    # string form of df[...]) parses dots as struct access, so a
    # column literally named "x.y" would otherwise fail analysis
    # (r6 review find).
    def _c(name: str):
        return F.col("`" + name.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(_c(c)).alias(f"_nn_{i}"),
            distinct(_c(c)).alias(f"_d_{i}"),
            F.min(_c(c)).cast("string").alias(f"_mn_{i}"),
            F.max(_c(c)).cast("string").alias(f"_mx_{i}"),
        ]
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_total").alias("n_rows"),
            (F.col("_total") - F.col(f"_nn_{i}")).alias("n_null"),
            F.col(f"_d_{i}").alias("n_distinct"),
            F.col(f"_mn_{i}").alias("min_value"),
            F.col(f"_mx_{i}").alias("max_value"),
        )
        for i, c in enumerate(cols)
    ]
    return row.select(F.explode(F.array(*entries)).alias("_p")).select("_p.*")


def winsorize(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: Sequence[str] | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Clamp ``value_col`` to its [lower, upper] interpolated
    percentiles, optionally per group — outlier trimming for length /
    score columns before they feed a sampler or a mixture weight (a
    single 10M-token document otherwise owns its group's token
    budget).

    Adds ``out_col`` (default ``{value_col}_w``); rows keep their
    original value column.  NULL values stay NULL.

    Plan: one partial-agg percentile aggregate per group (the exact
    interpolated percentile — at 100 TB swap in ``approx_percentile``
    the same way profile_table trades exact distincts for HLL), then
    the ≤|groups|-row bounds frame joins back — broadcast by AQE when
    small.  No window over the data, so no per-group sort of the
    corpus.
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    out = out_col or f"{value_col}_w"
    gcols = list(group_cols or [])
    v = F.col(value_col).cast("double")
    agg = [
        F.percentile(v, F.lit(lower)).alias("_lo"),
        F.percentile(v, F.lit(upper)).alias("_hi"),
    ]
    bounds = df.groupBy(*gcols).agg(*agg) if gcols else df.agg(*agg)
    if gcols:
        # NULL-SAFE bounds re-join: groupBy emits a NULL-group bounds
        # row, but a plain equality join would never match it back —
        # silently DROPPING every row whose group key is NULL from an
        # operator documented to only add a column (r6 review find).
        b = bounds
        for g in gcols:
            b = b.withColumnRenamed(g, f"_wg_{g}")
        cond = None
        for g in gcols:
            c = F.col(g).eqNullSafe(F.col(f"_wg_{g}"))
            cond = c if cond is None else cond & c
        joined = df.join(b, cond).drop(*[f"_wg_{g}" for g in gcols])
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    # least/greatest IGNORE nulls (they return the extreme non-null
    # argument), which would silently clamp a NULL value to the lower
    # bound — gate on nullity explicitly.
    clamped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    )
    return joined.withColumn(out, clamped).drop("_lo", "_hi")


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    *,
    columns: Sequence[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Column-level drift report between two snapshot releases: the
    per-column profiles of ``old`` and ``new`` joined on column name
    with their deltas — the release QA that catches a broken extractor
    (null rate jump), an id-space reset (distinct collapse), or a unit
    change (range shift) before 100 TB of it lands in training.

    The column-level complement of ``versioning.corpus_diff`` (which
    answers WHICH rows changed; this answers HOW the distributions
    moved).  Cost: one wide aggregate pass per snapshot — the join is
    over two O(columns)-row frames.

    Returns ``(column, n_rows_old, n_rows_new, n_null_old, n_null_new,
    n_distinct_old, n_distinct_new, min_changed, max_changed)``.
    """
    cols = list(columns) if columns is not None else None
    po = profile_table(old, cols, exact=exact)
    pn = profile_table(new, cols, exact=exact)
    o = po.select(
        "column",
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_null").alias("n_null_old"),
        F.col("n_distinct").alias("n_distinct_old"),
        F.col("min_value").alias("_min_o"),
        F.col("max_value").alias("_max_o"),
    )
    n = pn.select(
        "column",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_null").alias("n_null_new"),
        F.col("n_distinct").alias("n_distinct_new"),
        F.col("min_value").alias("_min_n"),
        F.col("max_value").alias("_max_n"),
    )
    # FULL OUTER on column name: a column present in only one snapshot
    # (dropped/renamed by a broken extractor) is exactly the drift this
    # report exists to catch — an inner join would silently hide it
    # (r6 review find); its missing side reads as NULL counts.
    return o.join(n, on="column", how="full_outer").select(
        "column",
        "n_rows_old",
        "n_rows_new",
        "n_null_old",
        "n_null_new",
        "n_distinct_old",
        "n_distinct_new",
        (~F.col("_min_o").eqNullSafe(F.col("_min_n"))).alias("min_changed"),
        (~F.col("_max_o").eqNullSafe(F.col("_max_n"))).alias("max_changed"),
    )


def binary_metrics_report(df: DataFrame, *, score: str, label: str) -> DataFrame:
    """Exact ROC-AUC and average precision for a binary ``label``
    ranked by ``score`` — the calibration report behind every
    threshold a curation pipeline picks (quality-filter cutoffs,
    classifier gates, dedup score floors).

    Semantics are the standard unique-threshold definitions, so both
    metrics are tie-invariant and deterministic across engines and
    partitionings:

    - ROC-AUC: tie-aware rank statistic (= trapezoidal area over
      unique-score operating points).  Each positive earns the count
      of negatives scored strictly below plus half the negatives tied
      with it, normalized by ``n_pos * n_neg``.
    - Average precision: step-function PR area over unique-score
      thresholds — AP = Σ_g (n_pos(g)/n_pos) · P(g) with P(g) =
      cum_pos/cum_total at the end of score group ``g`` in descending
      score order.

    Rows with a NULL score or label are excluded and counted in
    ``n_excluded``; degenerate inputs (no positives / no negatives)
    yield NULL metrics instead of a division error.

    Scale: one groupBy collapses the corpus to O(distinct scores)
    rows; the cumulative window and the broadcast totals join run over
    that small frame, never the raw table.  The ROC numerator stays in
    exact integers (2·U form) until the single final division.

    Returns one row: ``(n_pos, n_neg, n_excluded, roc_auc,
    avg_precision)``, metrics rounded to 6 decimals.
    """
    valid = F.col("_score").isNotNull() & F.col("_y").isNotNull()
    g = (
        df.select(
            F.col(score).alias("_score"),
            F.col(label).cast("bigint").alias("_y"),
        )
        .groupBy("_score")
        .agg(
            F.sum(F.when(valid, F.col("_y")).otherwise(F.lit(0))).alias("_pos"),
            F.sum(
                F.when(valid, F.lit(1) - F.col("_y")).otherwise(F.lit(0))
            ).alias("_neg"),
            F.sum(F.when(valid, F.lit(0)).otherwise(F.lit(1))).alias("_excl"),
        )
    )
    tot = g.agg(
        F.coalesce(F.sum("_pos"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum("_neg"), F.lit(0)).alias("n_neg"),
        F.coalesce(F.sum("_excl"), F.lit(0)).alias("n_excluded"),
    )
    w = Window.orderBy(F.col("_score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        g.filter((F.col("_pos") + F.col("_neg")) > 0)
        .select(
            "_pos",
            "_neg",
            F.sum("_pos").over(w).alias("_cum_pos"),
            F.sum("_neg").over(w).alias("_cum_neg"),
            (F.sum("_pos").over(w) + F.sum("_neg").over(w)).alias("_cum_total"),
        )
        .crossJoin(F.broadcast(tot.select("n_neg")))
    )
    contrib = cum.agg(
        F.sum(
            F.col("_pos")
            * (
                2 * (F.col("n_neg") - F.col("_cum_neg"))
                + F.col("_neg")
            )
        ).alias("_auc2"),
        F.sum(
            F.col("_pos") * F.col("_cum_pos") / F.col("_cum_total")
        ).alias("_apnum"),
    )
    return tot.crossJoin(F.broadcast(contrib)).select(
        "n_pos",
        "n_neg",
        "n_excluded",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("_auc2") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6
            ),
        ).alias("roc_auc"),
        F.when(
            F.col("n_pos") > 0, F.round(F.col("_apnum") / F.col("n_pos"), 6)
        ).alias("avg_precision"),
    )


def calibration_report(
    df: DataFrame,
    *,
    score: str,
    label: str,
    bins: int = 10,
    scale: int = 6,
) -> DataFrame:
    """Reliability diagram + expected calibration error for a binary
    classifier: scores in [0, 1] bucket into ``bins`` equal-width bins
    (score 1.0 folds into the last bin), and each bin reports its row
    count, mean predicted score (confidence) and empirical positive
    rate (accuracy).  ECE — Σ_b (n_b/N)·|acc_b − conf_b| — rides along
    on every row, so the report is one frame, not two.

    The companion to :func:`binary_metrics_report`: AUC ranks, ECE
    says whether the scores MEAN anything as probabilities (a quality
    classifier gating a corpus at 'p ≥ 0.8' needs calibrated p).

    Rows with NULL score/label, or score outside [0, 1], are excluded
    (count in ``n_excluded`` on every row).  Edge: empty input yields
    an EMPTY report; a non-empty input where NO row is valid yields
    ONE summary row (bin NULL, n 0, conf/acc/ece NULL) carrying
    ``n_excluded`` — so 'all rows invalid' is observable and
    distinguishable from 'no input' without a second pass.
    One groupBy over at most
    ``bins`` keys; means derive from exact sums divided once at the
    end, so the only cross-engine float is the final division —
    rounded at ``scale``.  Output: (bin, n, conf, acc, n_excluded,
    ece), one row per non-empty bin, ordered by bin."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    s = F.col(score).cast("double")
    y = F.col(label).cast("bigint")
    ok = (
        s.isNotNull() & y.isNotNull() & (s >= 0.0) & (s <= 1.0)
        & y.isin(0, 1)
    )
    b = F.least(F.floor(s * bins).cast("int"), F.lit(bins - 1))
    per_bin = (
        df.select(
            F.when(ok, b).alias("_b"),
            F.when(ok, s).alias("_s"),
            F.when(ok, y).alias("_y"),
            F.when(ok, F.lit(0)).otherwise(F.lit(1)).alias("_excl"),
        )
        .groupBy("_b")
        .agg(
            F.count(F.col("_s")).alias("_n"),
            F.sum("_s").alias("_sum_s"),
            F.sum("_y").alias("_sum_y"),
            F.sum("_excl").alias("_nx"),
        )
    )
    # excluded rows land in a NULL bin; fold their count into a
    # broadcast total and drop the row
    tot = per_bin.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).alias("_N"),
        F.coalesce(F.sum("_nx"), F.lit(0)).alias("n_excluded"),
        F.coalesce(
            F.sum(
                F.abs(
                    F.col("_sum_y").cast("double")
                    - F.col("_sum_s").cast("double")
                )
            ),
            F.lit(0.0),
        ).alias("_ece_num"),
    )
    # tot derives from per_bin, so the join below is a self-join by
    # lineage — qualify both sides or Spark flags every shared column
    # reference as ambiguous
    pb = per_bin.alias("pb")
    tt = tot.alias("tt")
    return (
        pb.crossJoin(F.broadcast(tt))
        # the excluded rows' NULL bin is dropped while any valid bin
        # exists, but KEPT as the single summary row when none does —
        # try_divide (not /) because its n is 0 under ANSI mode
        .filter(F.col("pb._b").isNotNull() | (F.col("tt._N") == 0))
        .select(
            F.col("pb._b").alias("bin"),
            F.col("pb._n").cast("long").alias("n"),
            F.round(
                F.try_divide(
                    F.col("pb._sum_s"), F.col("pb._n").cast("double")
                ),
                scale,
            ).alias("conf"),
            F.round(
                F.try_divide(
                    F.col("pb._sum_y").cast("double"),
                    F.col("pb._n").cast("double"),
                ),
                scale,
            ).alias("acc"),
            F.col("tt.n_excluded").cast("long").alias("n_excluded"),
            F.round(
                F.try_divide(
                    F.col("tt._ece_num"), F.col("tt._N").cast("double")
                ),
                scale,
            ).alias("ece"),
        )
        .orderBy("bin")
    )
