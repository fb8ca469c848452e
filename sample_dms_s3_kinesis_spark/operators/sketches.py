"""Mergeable frequency sketches as plain relational tables.

The HLL query (``q_hll_daily_union``) keeps DISTINCT counts
re-aggregatable; this module does the same for FREQUENCIES with a
Count-Min sketch (Cormode & Muthukrishnan 2005) expressed as a
DataFrame instead of an opaque binary: ``(d, b, cnt)`` — depth×width
counters, counter (d, b) = how many input rows hashed to bucket b
under seed d.  A metrics store keeps one sketch table per partition
(per day, per source); ANY range's frequency estimates come from
summing the partitions' counters (:func:`cms_merge`) and probing
(:func:`cms_estimate`) — no rescan of the raw events.

Why a TABLE and not Spark's ``count_min_sketch`` binary: the binary
is only readable driver-side through the JVM helper class, so every
estimate leaves the engine; the relational form keeps build, merge
and probe inside Catalyst (map-side-combined aggregates + a
broadcast probe join), stays engine-portable, and the driver gate /
oracles can see it.

Guarantees (depth d = ⌈ln 1/δ⌉, width w = ⌈e/ε⌉): estimates never
undercount, and overcount by more than ε·N with probability at most
δ.  ``tests/test_sketch_ops.py`` pins both sides against exact
counts.

Scale: the build is one bounded explode (×depth) into one map-side-
combined groupBy — hot values collapse in the combiner, and the
sketch itself is at most d·w rows regardless of input size.  Probes
broadcast the (tiny) probe set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.partitioning import spread


def _bucket(
    col: Column, d: Column, width: int, *, hash_family: str = "xxhash64"
) -> Column:
    """Seeded bucket hash.  ``hash_family="md5"`` derives the bucket
    from the first 8 md5 hex chars of ``"<value>:<seed>"`` — the value
    is a 32-bit non-negative integer, so ``pmod`` == ``%`` and DuckDB
    computes the identical bucket via
    ``CAST(('0x' || substr(md5(v || ':' || d), 1, 8)) AS BIGINT) % w``,
    making the whole sketch exact-oracle-checkable.  NOTE the NULL
    edge: md5(concat(NULL, ...)) is NULL (null-bucket rows), while
    xxhash64 skips null arguments (seed-only bucket) — callers that
    admit NULL keys should filter first."""
    from sample_dms_s3_kinesis_spark.operators.text import (
        _check_hash_family,
    )

    _check_hash_family(hash_family)
    if hash_family == "md5":
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        col.cast("string"), F.lit(":"), d.cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(width)).cast("int")
    return F.pmod(F.xxhash64(col, d), F.lit(width)).cast("int")


def cms_table(
    df: DataFrame,
    col: str,
    *,
    width: int = 1024,
    depth: int = 5,
    group_cols: Sequence[str] = (),
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Build a Count-Min sketch table over ``df[col]`` — one sketch
    per ``group_cols`` combination (e.g. per day) or one global
    sketch.

    Output: (*group_cols, d, b, cnt) with ``cnt`` long; absent
    (d, b) pairs are implicitly zero.
    """
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("d")
    rows = spread(df).select(
        *[F.col(g) for g in group_cols], F.col(col).alias("_v"), seeds
    )
    return (
        rows.select(
            *[F.col(g) for g in group_cols],
            "d",
            _bucket(
                F.col("_v"), F.col("d"), width, hash_family=hash_family
            ).alias("b"),
        )
        .groupBy(*group_cols, "d", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(
    cms: DataFrame, *, drop_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge sketches by summing counters — the whole point of the
    sketch being a table: dropping the partition columns and
    re-aggregating IS the union.  Output: (d, b, cnt)."""
    return (
        cms.drop(*drop_cols)
        .groupBy("d", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    col: str,
    *,
    width: int = 1024,
    depth: int = 5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Estimate each probe value's frequency from a (merged) sketch:
    min over the depth rows of its counters (a missing counter is 0).
    The probe set is broadcast — it is the small side by contract.

    Output: (col, est_count); ``est_count >= true_count`` always.

    Join shape: an INNER join with the broadcast probe frame as the
    build side (a broadcast hint on the PRESERVED side of an outer
    join is silently unusable — BroadcastHashJoin cannot build the
    preserved side — so the naive left-outer form degrades to a
    shuffle once the sketch outgrows auto-broadcast).  A probe
    missing ANY of its depth counters has a zero counter somewhere,
    so its estimate is 0 — reconstructed from the hit count instead
    of null rows.
    """
    # NULL probes are dropped: xxhash64 skips null arguments, so a
    # null would hash to the seed-only buckets AND evade the anti-join
    # (null never equals null), yielding two contradictory rows.
    probe_vals = (
        probes.select(F.col(col)).filter(F.col(col).isNotNull()).distinct()
    )
    keyed = probe_vals.select(
        F.col(col),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    )
    keyed = keyed.select(
        col,
        "d",
        _bucket(
            F.col(col), F.col("d"), width, hash_family=hash_family
        ).alias("b"),
    )
    hits = (
        cms.join(F.broadcast(keyed), on=["d", "b"])
        .groupBy(col)
        .agg(
            F.count(F.lit(1)).alias("_nd"),
            F.min("cnt").alias("_m"),
        )
        .select(
            col,
            F.when(F.col("_nd") < depth, F.lit(0))
            .otherwise(F.col("_m"))
            .cast("long")
            .alias("est_count"),
        )
    )
    absent = probe_vals.join(
        F.broadcast(hits.select(col)), on=col, how="left_anti"
    ).select(F.col(col), F.lit(0).cast("long").alias("est_count"))
    return hits.unionByName(absent)


# ------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) distinct sketches: where
# HLL only merges by UNION, KMV supports set ALGEBRA — intersection
# estimates across sketches (Beyer et al., "On synopses for
# distinct-value estimation under multiset operations", SIGMOD'07;
# the Apache DataSketches theta family).  A sketch is the k smallest
# normalized hashes of the distinct values — again a plain relational
# table, so build/merge/estimate all stay inside Catalyst.
#
# Scale: the distinct pass is a map-side-combined aggregate keyed by
# (group, hash) — duplicates collapse in the combiner.  The ungrouped
# bottom-k is orderBy+limit → TakeOrderedAndProject (per-partition
# bottom-k + tiny merge — never a single-reducer global sort); the
# grouped form ranks within each GROUP partition, so the shuffle
# spreads across group keys.  Sketch size is exactly k rows per
# group.


def _unit_hash(col: Column, *, hash_family: str = "xxhash64") -> Column:
    """Hash mapped into (0, 1) — both endpoints open so theta = kth
    value is always usable.  xxhash64: (h + 2^63 + 1) / (2^64 + 2).
    ``"md5"``: the first 12 md5 hex chars as a 48-bit integer x, then
    (x + 1) / (2^48 + 1) — x is exact in a double (48 < 53 bits) and
    the single division rounds identically under IEEE 754 in Spark and
    DuckDB (``CAST(('0x' || substr(md5(v), 1, 12)) AS BIGINT)``), so
    the md5 sketch is exact-oracle-checkable."""
    from sample_dms_s3_kinesis_spark.operators.text import (
        _check_hash_family,
    )

    _check_hash_family(hash_family)
    if hash_family == "md5":
        x = F.conv(
            F.substring(F.md5(col.cast("string")), 1, 12), 16, 10
        ).cast("double")
        return (x + F.lit(1.0)) / F.lit(float(2**48 + 1))
    return (
        (F.xxhash64(col).cast("double") + F.lit(float(2**63) + 1.0))
        / F.lit(float(2**64) + 2.0)
    )


def kmv_table(
    df: DataFrame,
    col: str,
    *,
    k: int = 256,
    group_cols: Sequence[str] = (),
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Bottom-k distinct sketch per ``group_cols`` combination.

    Output: (*group_cols, h double, rn int) — the k smallest distinct
    unit hashes, ranked ascending (rn = 1..k; fewer rows means the
    group's EXACT distinct count is rn_max < k).
    """
    distinct = (
        spread(df)
        .select(
            *[F.col(g) for g in group_cols],
            _unit_hash(F.col(col), hash_family=hash_family).alias("h"),
        )
        .distinct()
    )
    return _bottom_k(distinct, k=k, group_cols=group_cols)


def _bottom_k(
    distinct: DataFrame,
    *,
    k: int,
    group_cols: Sequence[str] = (),
    order_cols: Sequence[str] = ("h",),
    with_rank: bool = True,
) -> DataFrame:
    """Keep the k smallest rows per group by ``order_cols``, optionally
    ranked — shared by the KMV distinct sketch (orders on "h", keeps
    rn) and the quantile sample sketch (orders on ("r", "v"), no rank).

    Ungrouped: ``orderBy(...).limit(k)`` — Catalyst plans it as
    TakeOrderedAndProject (per-partition bottom-k + a tiny merge),
    never a global single-reducer sort; the rank window then runs
    over <= k rows.  Grouped: a row_number window partitioned by the
    GROUP key — the shuffle spreads across groups (per-day sketches
    etc.), nothing funnels through one task.
    """
    from pyspark.sql import Window

    order = [F.col(c) for c in order_cols]
    if group_cols:
        w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy(
            *order
        )
        out = (
            distinct.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
        )
        return out if with_rank else out.drop("rn")
    small = distinct.orderBy(*order).limit(k)
    if not with_rank:
        return small
    w = Window.partitionBy(F.lit(1)).orderBy(*order)  # <= k rows by now
    return small.withColumn("rn", F.row_number().over(w))


def kmv_estimate(kmv: DataFrame, *, k: int = 256) -> DataFrame:
    """Distinct-count estimate per group from a bottom-k sketch:
    (k-1)/theta when the sketch is full (theta = the kth smallest
    hash), the exact row count when it is not.

    Output: (*group_cols, est_distinct double).
    """
    group_cols = [c for c in kmv.columns if c not in ("h", "rn")]
    agg = kmv.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_theta")
    )
    return agg.select(
        *group_cols,
        F.when(
            F.col("_n") < k, F.col("_n").cast("double")
        ).otherwise((F.lit(float(k - 1))) / F.col("_theta")).alias(
            "est_distinct"
        ),
    )


def kmv_union(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union sketch: pool the hashes, dedupe, keep the k smallest —
    the result is exactly the sketch of the concatenated inputs.
    Group columns must already be dropped/aligned.  Output: (h, rn).
    """
    pooled = sketches[0].select("h")
    for s in sketches[1:]:
        pooled = pooled.unionByName(s.select("h"))
    return _bottom_k(pooled.distinct(), k=k)


def kmv_intersect_estimate(
    a: DataFrame, b: DataFrame, *, k: int = 256
) -> DataFrame:
    """|A ∩ B| estimate from two bottom-k sketches: theta = the union
    sketch's threshold; every hash below theta present in BOTH
    sketches is an intersection sample; est = matches / theta.
    The same theta also yields the union estimate, so the row carries
    a Jaccard estimate too.

    Output: one row (est_intersection double, est_union double,
    est_jaccard double).
    """
    u = kmv_union(a, b, k=k)
    stats = u.agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_theta")
    )
    # exact-mode theta: when the pooled distinct count is below k the
    # union sketch IS the union — every sample counts, theta = 1
    both = (
        a.select("h")
        .join(b.select("h"), on="h")
        .join(F.broadcast(u.select("h")), on="h", how="left_semi")
    )
    m = both.agg(F.count(F.lit(1)).cast("double").alias("_m"))
    return (
        stats.crossJoin(m)
        .select(
            F.when(F.col("_n") < k, F.col("_m"))
            .otherwise(F.col("_m") / F.col("_theta"))
            .alias("est_intersection"),
            F.when(F.col("_n") < k, F.col("_n").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("_theta"))
            .alias("est_union"),
        )
        .select(
            "est_intersection",
            "est_union",
            (F.col("est_intersection") / F.col("est_union")).alias(
                "est_jaccard"
            ),
        )
    )


# ------------------------------------------------- quantile sketches

def _row_rank(id_col: Column, *, hash_family: str = "xxhash64") -> Column:
    """Deterministic per-row sampling rank from the row's unique id.
    xxhash64 (long) for production; ``"md5"`` gives the first 16 md5
    hex chars of the id's decimal rendering — lexicographically
    ordered like the unsigned numeric value and computable verbatim in
    DuckDB, so the whole sketch is exact-oracle-checkable."""
    from sample_dms_s3_kinesis_spark.operators.text import (
        _check_hash_family,
    )

    _check_hash_family(hash_family)
    if hash_family == "md5":
        return F.substring(F.md5(id_col.cast("string")), 1, 16)
    return F.xxhash64(id_col)


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    *,
    id_col: str,
    k: int = 256,
    group_cols: Sequence[str] = (),
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Mergeable quantile synopsis: a bottom-k uniform row sample per
    group, keyed by a deterministic hash rank of the row id — the
    quantile member of the synopsis family (HLL/KMV distinct, CMS
    frequency).  NULL values are excluded (no rank can order them).

    Output: (*group_cols, r, v) — the k sample rows with the smallest
    ranks.  Merging sketches of disjoint batches = pool + re-keep
    bottom-k (:func:`quantile_merge`), exactly the sketch of the
    concatenated input, so per-batch stores can serve any range.
    Estimate error is the uniform-sample rank error O(1/sqrt(k)).

    Scale: same shape as :func:`kmv_table` — ungrouped bottom-k plans
    as TakeOrderedAndProject (no global sort); grouped runs one
    window shuffle spread across groups.  The sketch is <= k rows per
    group regardless of input size."""
    rows = (
        spread(df)
        # NULL values carry no quantile information; NULL ids have no
        # orderable rank (md5(NULL) sorts first and would FILL the
        # sample; xxhash64(NULL) collapses to one seed value) — both
        # would silently bias the "uniform" sample, so both are out.
        .filter(
            F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
        )
        .select(
            *[F.col(g) for g in group_cols],
            _row_rank(F.col(id_col), hash_family=hash_family).alias("r"),
            F.col(value_col).cast("double").alias("v"),
        )
    )
    return _bottom_k(
        rows, k=k, group_cols=group_cols, order_cols=("r", "v"),
        with_rank=False,
    )


def quantile_merge(
    *sketches: DataFrame, k: int, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merged sketch over the concatenated inputs: pool the sample
    rows and re-keep the bottom-k per group.  Sound because every row
    of the true merged bottom-k carries a rank no larger than each
    input sketch's cutoff, so it is present in one of the pools —
    PROVIDED ``k`` is at most each input's k (hence no default: a
    merge k larger than an input's would treat that input's rank
    cutoff as if it covered the whole pooled range and overweight
    small batches)."""
    pooled = sketches[0]
    for s in sketches[1:]:
        pooled = pooled.unionByName(s)
    return _bottom_k(
        pooled, k=k, group_cols=group_cols, order_cols=("r", "v"),
        with_rank=False,
    )


def quantile_estimate(
    sk: DataFrame,
    *,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Quantile estimates from the sample: per group, the type-1
    empirical quantile v_(ceil(q*m)) of the m sampled values.

    Output: (*group_cols, q double, est double).  The per-group state
    is <= k values (collect_list is bounded by the sketch size)."""
    if group_cols is None:
        group_cols = [c for c in sk.columns if c not in ("r", "v")]
    agg = sk.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.sort_array(F.collect_list("v")).alias("_vs"),
        F.count(F.lit(1)).alias("_m"),
    )
    q_rows = F.array(*[F.lit(float(q)) for q in qs])
    return (
        agg.select(
            *[F.col(g) for g in group_cols],
            F.explode(q_rows).alias("q"),
            F.col("_vs"),
            F.col("_m"),
        )
        .select(
            *[F.col(g) for g in group_cols],
            "q",
            F.element_at(
                F.col("_vs"),
                F.greatest(
                    F.lit(1), F.ceil(F.col("q") * F.col("_m")).cast("int")
                ),
            ).alias("est"),
        )
    )


# ------------------------------------------------------------- bloom

def _bloom_pos(
    col: Column, h: int, n_bits: int, *, hash_family: str = "xxhash64"
) -> Column:
    """Bit position of seed ``h`` for a key.  ``"md5"``: first 8 md5
    hex chars of ``"<key>:<seed>"`` as a 32-bit integer mod n_bits —
    DuckDB-replicable (same pattern as the CMS bucket)."""
    from sample_dms_s3_kinesis_spark.operators.text import (
        _check_hash_family,
    )

    _check_hash_family(hash_family)
    if hash_family == "md5":
        x = F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(f":{h}"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(x, F.lit(n_bits))
    return F.pmod(F.xxhash64(col, F.lit(h)), F.lit(n_bits))


def bloom_table(
    df: DataFrame,
    col: str,
    *,
    n_bits: int = 1 << 20,
    k: int = 5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Build a Bloom filter over ``df[col]`` as a relational bit table:
    (word_idx int, bits long) — bit ``p`` of the filter lives at bit
    ``p % 64`` of word ``p // 64``; absent words are implicitly zero.

    Same design argument as the CMS table: Spark's own
    ``bloom_filter_agg`` yields an opaque JVM binary, while the
    relational form keeps build, merge and probe inside Catalyst and
    visible to oracles.  The build is one bounded explode (×k) into
    ONE map-side-combined ``bit_or`` aggregate; the table is at most
    ``n_bits/64`` rows (16 Ki rows = 128 KiB for the 2^20 default)
    regardless of input size — always broadcastable.

    NULL keys are skipped (SQL semantics: ``x IN (...)`` is never
    true for NULL on the fast path; the exact verifier agrees).
    """
    if n_bits % 64 or n_bits < 64:
        raise ValueError("n_bits must be a positive multiple of 64")
    if k < 1:
        raise ValueError("k must be >= 1")
    pos = F.explode(
        F.array(
            *[
                _bloom_pos(
                    F.col(col), h, n_bits, hash_family=hash_family
                )
                for h in range(k)
            ]
        )
    ).alias("pos")
    return (
        df.filter(F.col(col).isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union Bloom filters built with the SAME (n_bits, k): OR the
    word tables — merge-of-builds == build-of-union, pytest-pinned."""
    if not blooms:
        raise ValueError("need at least one bloom table")
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    *,
    n_bits: int = 1 << 20,
    k: int = 5,
    out_col: str = "bloom_maybe",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Add ``out_col``: true iff all k filter bits for ``df[col]`` are
    set — i.e. the key is POSSIBLY in the build set (never a false
    negative).  The probe is k BROADCAST hash joins against the word
    table: no shuffle of ``df``, no row fan-out, everything JVM-side —
    the shape that lets a 100-TB fact scan drop non-matching rows
    before its first exchange.  NULL keys probe false."""
    # Internal join columns carry a fixed random tag so a caller
    # column can never collide (a caller column named `_bw0` would
    # previously be overwritten by withColumn and then silently
    # dropped by the prefix filter below).
    tag = "j9q4"
    out = df
    checks = []
    for h in range(k):
        pos = _bloom_pos(F.col(col), h, n_bits, hash_family=hash_family)
        wcol, bcol = f"_bw_{tag}_{h}", f"_bb_{tag}_{h}"
        words = bloom.select(
            F.col("word_idx").alias(wcol), F.col("bits").alias(bcol)
        )
        out = out.withColumn(wcol, (pos / 64).cast("int")).join(
            F.broadcast(words), wcol, "left"
        )
        checks.append(
            F.call_function(
                "shiftright",
                F.coalesce(F.col(bcol), F.lit(0).cast("long")),
                (pos % 64).cast("int"),
            ).bitwiseAND(F.lit(1).cast("long"))
            == F.lit(1)
        )
    generated = {f"_bw_{tag}_{h}" for h in range(k)} | {
        f"_bb_{tag}_{h}" for h in range(k)
    }
    keep = [c for c in out.columns if c not in generated]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return out.select(*keep, cond.alias(out_col))


def bloom_semijoin(
    fact: DataFrame,
    key_col: str,
    dim_keys: DataFrame,
    *,
    n_bits: int = 1 << 20,
    k: int = 5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """EXACT semi-join accelerated by a Bloom prefilter: build the
    filter over the (distinct, non-null) dim keys, drop fact rows the
    filter rejects — no shuffle, no false negatives — then verify the
    survivors with a real left-semi join so false positives never
    escape.  Output == ``fact LEFT SEMI JOIN dim_keys`` exactly, which
    is what the DuckDB oracle checks; the filter only changes WHERE
    rows die (before the exchange instead of inside the join).

    ``dim_keys``: one column named like ``key_col``."""
    keys = dim_keys.select(key_col).filter(F.col(key_col).isNotNull()).distinct()
    bloom = bloom_table(keys, key_col, n_bits=n_bits, k=k, hash_family=hash_family)
    pre = bloom_probe(
        fact, key_col, bloom, n_bits=n_bits, k=k, out_col="_bloom_maybe",
        hash_family=hash_family,
    ).filter(F.col("_bloom_maybe")).drop("_bloom_maybe")
    return pre.join(keys, key_col, "left_semi")


def bloom_fpp_report(
    fact: DataFrame,
    key_col: str,
    dim_keys: DataFrame,
    *,
    n_bits: int = 1 << 20,
    k: int = 5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Calibration report for the Bloom prefilter: probed / passed /
    true-member / false-positive counts, measured false-positive rate
    over true negatives, and the theoretical rate
    (1 - e^{-k·n/m})^k for n distinct build keys.  One row."""
    keys = dim_keys.select(key_col).filter(F.col(key_col).isNotNull()).distinct()
    bloom = bloom_table(keys, key_col, n_bits=n_bits, k=k, hash_family=hash_family)
    probed = bloom_probe(
        fact.filter(F.col(key_col).isNotNull()),
        key_col,
        bloom,
        n_bits=n_bits,
        k=k,
        out_col="_maybe",
        hash_family=hash_family,
    )
    marked = probed.join(
        keys.withColumn("_member", F.lit(True)), key_col, "left"
    )
    agg = marked.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.when(F.col("_maybe"), 1).otherwise(0)).alias("n_passed"),
        F.sum(
            F.when(F.col("_member").isNotNull(), 1).otherwise(0)
        ).alias("n_members"),
        F.sum(
            F.when(F.col("_maybe") & F.col("_member").isNull(), 1).otherwise(0)
        ).alias("n_false_pos"),
    )
    n_keys = keys.count()
    import math

    theory = (1.0 - math.exp(-k * n_keys / float(n_bits))) ** k
    return agg.select(
        "n_probed",
        "n_passed",
        "n_members",
        "n_false_pos",
        F.round(
            F.when(
                F.col("n_probed") > F.col("n_members"),
                F.col("n_false_pos")
                / (F.col("n_probed") - F.col("n_members")).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("measured_fpp"),
        F.lit(round(theory, 6)).alias("theoretical_fpp"),
    )
