"""Declarative data-quality expectations — the Deequ/Great-Expectations
shape on plain Catalyst: a rule set is ONE aggregate pass over the
table (conditional sums + exact distinct counts share the same
partial/final plan), emitting a long-form report a pipeline gates on.

The reference's quality surface is the apply-exceptions side channel
(SURVEY §2, O25 — bad rows diverted, pipeline continues); this is the
proactive twin: assert the contract BEFORE the data ships.

Scale: each row rule compiles to a conditional count inside one
map-side-combined aggregate — k rules cost one scan, not k.  A
uniqueness rule adds an exact distinct aggregate (two-phase).  NULL
semantics are explicit: a row where the predicate evaluates to NULL
counts as a VIOLATION (unknown is not a pass), mirrored by the oracle's
``NOT COALESCE(cond, FALSE)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowRule:
    """A predicate every row must satisfy (NULL ⇒ violation)."""

    name: str
    cond: Column


@dataclass(frozen=True)
class UniqueRule:
    """Columns whose combination must be unique across the table
    (NULL-keyed rows are excluded from the distinct count, matching
    COUNT(DISTINCT ...) semantics on both engines)."""

    name: str
    cols: tuple[str, ...]


def not_null(name: str, col: str) -> RowRule:
    return RowRule(name, F.col(col).isNotNull())


def in_set(name: str, col: str, values: Sequence[str]) -> RowRule:
    return RowRule(name, F.col(col).isin(list(values)))


def check_expectations(
    df: DataFrame, rules: Sequence[RowRule | UniqueRule]
) -> DataFrame:
    """Evaluate every rule in one aggregate pass.

    Output: (rule, n_rows, n_violations, passed) — one row per rule in
    declaration order (rule names must be unique).
    """
    if not rules:
        # An empty rule list would build explode(F.array()) whose
        # null-typed struct access fails analysis with an opaque error.
        raise ValueError("at least one rule required")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("expectation rule names must be unique")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        if isinstance(r, RowRule):
            aggs.append(
                F.sum(
                    F.when(~F.coalesce(r.cond, F.lit(False)), 1).otherwise(0)
                ).alias(f"_v{i}")
            )
        else:
            all_nn = None
            for c in r.cols:
                nn = F.col(c).isNotNull()
                all_nn = nn if all_nn is None else (all_nn & nn)
            aggs.append(
                (
                    F.sum(F.when(all_nn, 1).otherwise(0))
                    - F.count_distinct(*[F.col(c) for c in r.cols])
                ).alias(f"_v{i}")
            )
    one = df.agg(*aggs)
    report = one.select(
        F.explode(
            F.array(
                *[
                    # coalesce: over ZERO rows the sums are NULL and
                    # passed would be NULL too — a gate doing
                    # all(passed) spuriously fails while a NOT-passed
                    # filter spuriously passes; an empty frame
                    # violates nothing
                    F.struct(
                        F.lit(r.name).alias("rule"),
                        F.col("_n").cast("long").alias("n_rows"),
                        F.coalesce(F.col(f"_v{i}"), F.lit(0))
                        .cast("long")
                        .alias("n_violations"),
                        (F.coalesce(F.col(f"_v{i}"), F.lit(0)) == 0).alias(
                            "passed"
                        ),
                    )
                    for i, r in enumerate(rules)
                ]
            )
        ).alias("_r")
    )
    return report.select("_r.rule", "_r.n_rows", "_r.n_violations", "_r.passed")


def quarantine(
    df: DataFrame, rules: Sequence[RowRule]
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (valid, invalid): the generalization of the
    CDC apply-exceptions side channel (O25) to arbitrary contracts —
    bad rows divert with the FIRST failing rule's name attached (rule
    declaration order), good rows flow on untouched.

    One narrow projection, no shuffle: the rule CASE evaluates per
    row; both outputs share the same scan (Spark computes each filter
    independently — at scale, persist the labeled frame if both sides
    are consumed).

    Returns (valid_df, invalid_df); invalid carries a ``failed_rule``
    column.
    """
    if not rules:
        # label would stay None and withColumn(None) fails opaquely.
        raise ValueError("at least one rule required")
    label = None
    for r in rules:
        clause = ~F.coalesce(r.cond, F.lit(False))
        label = (
            F.when(clause, F.lit(r.name))
            if label is None
            else label.when(clause, F.lit(r.name))
        )
    labeled = df.withColumn("failed_rule", label)
    valid = labeled.filter(F.col("failed_rule").isNull()).drop("failed_rule")
    invalid = labeled.filter(F.col("failed_rule").isNotNull())
    return valid, invalid


def check_expectations_with_thresholds(
    df: DataFrame,
    rules: Sequence[tuple[RowRule | UniqueRule, float]],
) -> DataFrame:
    """Tolerance-aware expectations: each rule carries a maximum
    violation RATE (0.0 = strict); ``passed`` compares the observed
    rate against it — the form real pipelines gate on ("≤0.1% bad
    rows ships, more pages someone").  Same one-pass plan.

    Output: (rule, n_rows, n_violations, violation_rate, max_rate,
    passed)."""
    base = check_expectations(df, [r for r, _ in rules])
    thr = base.sparkSession.createDataFrame(
        [(r.name, float(mx)) for r, mx in rules], "rule string, max_rate double"
    )
    return (
        base.join(F.broadcast(thr), on="rule")
        .select(
            "rule",
            "n_rows",
            "n_violations",
            F.round(
                F.col("n_violations").cast("double")
                / F.greatest(F.col("n_rows"), F.lit(1)),
                6,
            ).alias("violation_rate"),
            "max_rate",
            (
                F.col("n_violations").cast("double")
                / F.greatest(F.col("n_rows"), F.lit(1))
                <= F.col("max_rate")
            ).alias("passed"),
        )
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    *,
    k: int = 5,
    sensitive_col: str | None = None,
    l: int | None = None,
) -> DataFrame:
    """Privacy QA over quasi-identifier combinations: groups violating
    k-anonymity (fewer than ``k`` rows share the combination) and,
    with ``sensitive_col``/``l``, l-diversity (fewer than ``l``
    distinct sensitive values in the group).  The release gate a
    training-data pipeline runs before shipping columns that could be
    joined to an external identity table.

    NULL quasi values group like any value (NULL is itself
    identifying); the sensitive distinct count ignores NULLs,
    matching COUNT(DISTINCT) on both engines.

    Output: (*quasi_cols, n_rows[, n_sensitive], violations) where
    ``violations`` lists the failed properties.  One map-side-combined
    aggregate pass; the report is at most one row per violating
    combination."""
    if not quasi_cols:
        raise ValueError("k_anonymity_report requires quasi_cols")
    if (sensitive_col is None) != (l is None):
        raise ValueError("sensitive_col and l must be given together")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    out = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    k_viol = F.col("n_rows") < k
    if sensitive_col is None:
        return out.filter(k_viol).withColumn(
            "violations", F.lit("k_anonymity")
        )
    l_viol = F.col("n_sensitive") < l
    return out.filter(k_viol | l_viol).withColumn(
        "violations",
        F.concat_ws(
            ",",
            F.when(k_viol, F.lit("k_anonymity")),
            F.when(l_viol, F.lit("l_diversity")),
        ),
    )
