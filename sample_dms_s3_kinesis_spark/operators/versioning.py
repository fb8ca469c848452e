"""Corpus snapshot versioning: what changed between two releases of a
dataset.

Reference note: the reference's replication pipeline reports per-table
Inserts/Updates/Deletes counts after applying a CDC stream
(`/root/reference/run.py` table_statistics loop); this module answers
the same question for two *materialized snapshots* with no change log
available — the situation every training-data pipeline is in when a
new crawl or a re-processed corpus lands next to the previous release.

Scale design
------------
Text is folded to a 128-bit md5 digest BEFORE the join, so the full
outer join shuffles ``(id, 16-byte digest)`` pairs — never document
bodies.  One shuffle on the id, partial aggregation for the stats
rollup.  At 100 TB the digest projection is a map-only pass over each
snapshot; the join cost is that of two id columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change labels, in report order
ADDED, REMOVED, CHANGED, UNCHANGED = "added", "removed", "changed", "unchanged"


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_unchanged: bool = True,
) -> DataFrame:
    """Per-id change status between two corpus snapshots.

    Returns ``(id_col, change)`` with ``change`` one of ``added``
    (id only in ``new``), ``removed`` (only in ``old``), ``changed``
    (both, different ``text_col`` digest), ``unchanged``.  Content
    comparison is by md5 digest, so two snapshots of 100 TB compare by
    shuffling 16 bytes per row.  ``include_unchanged=False`` drops the
    (typically dominant) unchanged class before the shuffle ever
    returns rows — the delta feed a downstream incremental job wants.
    """
    # Presence is tracked by explicit membership flags, NOT digest
    # nullability: a row with NULL text has a NULL md5 but IS present,
    # and must not read as added/removed.  Two NULL digests compare as
    # 'changed' (content unknown → conservative re-process), matching
    # the plain-equality CASE the SQL oracle runs.
    o = old.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("_od"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("_nd"),
        F.lit(True).alias("_in_new"),
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit(ADDED))
        .when(F.col("_in_new").isNull(), F.lit(REMOVED))
        .when(F.col("_od") == F.col("_nd"), F.lit(UNCHANGED))
        .otherwise(F.lit(CHANGED))
    )
    out = (
        o.join(n, on=id_col, how="full_outer")
        .select(F.col(id_col), change.alias("change"))
    )
    if not include_unchanged:
        out = out.filter(F.col("change") != UNCHANGED)
    return out


def corpus_diff_stats(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per change class with its count — the release-note
    summary (`added/removed/changed/unchanged`, classes with zero rows
    don't appear).  Same join as :func:`corpus_diff` plus a
    partial-aggregated rollup on the 4-value change key."""
    return (
        corpus_diff(old, new, id_col=id_col, text_col=text_col)
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
