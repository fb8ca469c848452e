"""Record linkage / entity resolution: blocked candidate generation,
multi-field similarity scoring, and mutual-best-match selection — the
operator a pipeline runs to find records that REFER to the same entity
without a shared key (duplicate account rows, the same document
ingested under two sources, a vendor table joined to a CRM by name).

Scale shapes:

- Candidate generation is ALWAYS blocked: pairs exist only inside a
  blocking-key group (equi join on the blocking columns), never via a
  cross join.  Candidate volume is Σ_block n_b·m_b — the blocking key
  is the knob, and ``max_block_size`` hard-caps pathological groups
  (the NULL-city block, the 'UNKNOWN' name block) with a
  map-side-combined count + broadcast anti-join, the same
  pay-as-you-go guard the LSH families use (`dedup._drop_hot_buckets`).
- Scoring is a per-pair Catalyst expression (levenshtein / equality /
  numeric proximity composed by the caller) — whole-stage codegen,
  no Python in the pair loop.
- Mutual-best-match runs two ROW_NUMBER windows partitioned by the
  pair's OWN ids over the threshold-filtered pair frame — bounded by
  match volume, not corpus size, and each window shuffles on a
  high-cardinality id.

The reference's engine exposes no linkage surface; this generalizes
its routing semi-join family (`sources/cdc_source.py` route_changes —
SURVEY §2.6) from exact-key matching to similarity matching.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cap_blocks(
    df: DataFrame, block_on: Sequence[str], max_block_size: int
) -> DataFrame:
    """Drop rows whose blocking-key group exceeds ``max_block_size``
    (a group of n produces O(n²) self-pair candidates; one boilerplate
    key must not go quadratic).  Count is map-side combined; the hot
    list is tiny by construction and broadcast into a left-anti join."""
    hot = (
        df.groupBy(*block_on)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_block_size)
        .drop("_n")
    )
    return df.join(F.broadcast(hot), on=list(block_on), how="left_anti")


def _suffixed(df: DataFrame, keep: Sequence[str], suffix: str) -> DataFrame:
    cols = [
        F.col(c) if c in keep else F.col(c).alias(f"{c}{suffix}")
        for c in df.columns
    ]
    return df.select(*cols)


def link_tables(
    a: DataFrame,
    b: DataFrame,
    *,
    block_on: Sequence[str],
    id_cols: tuple[str, str],
    score: Column,
    threshold: float | None = None,
    suffixes: tuple[str, str] = ("_a", "_b"),
    max_block_size: int | None = None,
) -> DataFrame:
    """Link two tables: candidates are the equi join of ``a`` and ``b``
    on ``block_on`` (columns must exist, same-named, in both), scored
    by ``score`` — a Column over the suffixed field names (``a``'s
    non-blocking columns carry ``suffixes[0]``, ``b``'s
    ``suffixes[1]``).  Rows with NULL score (e.g. a NULL field inside
    the scorer) are dropped — an unscorable pair is not a match.
    Output: (id_a+suffix, id_b+suffix, score) filtered to
    ``score >= threshold`` when given, one row per surviving pair."""
    if not block_on:
        raise ValueError("link_tables requires blocking columns")
    sa, sb = suffixes
    if max_block_size is not None:
        a = _cap_blocks(a, block_on, max_block_size)
        b = _cap_blocks(b, block_on, max_block_size)
    left = _suffixed(a, block_on, sa)
    right = _suffixed(b, block_on, sb)
    ida, idb = f"{id_cols[0]}{sa}", f"{id_cols[1]}{sb}"
    pairs = (
        left.join(right, on=list(block_on))
        .select(ida, idb, score.alias("score"))
        .filter(F.col("score").isNotNull())
    )
    if threshold is not None:
        pairs = pairs.filter(F.col("score") >= threshold)
    return pairs


def self_linkage(
    df: DataFrame,
    *,
    block_on: Sequence[str],
    id_col: str,
    score: Column,
    threshold: float | None = None,
    suffixes: tuple[str, str] = ("_a", "_b"),
    max_block_size: int | None = None,
) -> DataFrame:
    """Within-table linkage (duplicate-entity detection): every
    unordered pair inside a blocking group, canonicalized
    ``id_a < id_b`` so no pair appears twice and no row matches
    itself.  Same contract as :func:`link_tables` otherwise."""
    sa, sb = suffixes
    ida, idb = f"{id_col}{sa}", f"{id_col}{sb}"
    out = link_tables(
        df,
        df,
        block_on=block_on,
        id_cols=(id_col, id_col),
        score=score,
        threshold=None,
        suffixes=suffixes,
        max_block_size=max_block_size,
    ).filter(F.col(ida) < F.col(idb))
    if threshold is not None:
        out = out.filter(F.col("score") >= threshold)
    return out


def mutual_best_flag(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    *,
    score_col: str = "score",
) -> DataFrame:
    """Flag each candidate pair as ``is_mutual``: true iff it is the
    best-scoring pair for BOTH of its endpoints (ties break on the
    partner id ascending, so the flag is deterministic).  Mutual best
    match is the standard one-to-one entity-resolution decision rule —
    order-independent, unlike greedy global assignment, so it
    distributes as two windows with no sequential state.  Each window
    partitions by one endpoint id (high cardinality, no skew pile-up);
    the input is the already-thresholded pair frame."""
    wa = Window.partitionBy(id_a).orderBy(
        F.desc(score_col), F.asc(id_b)
    )
    wb = Window.partitionBy(id_b).orderBy(
        F.desc(score_col), F.asc(id_a)
    )
    return pairs.select(
        "*",
        (
            (F.row_number().over(wa) == 1)
            & (F.row_number().over(wb) == 1)
        ).alias("is_mutual"),
    )
