"""Graph centrality over derived document/similarity graphs.

Corpus-curation pipelines use link-graph centrality as a quality
signal — the Common-Crawl lineage (and the C4/RefinedWeb descendants)
seed and weight crawls by harmonic/PageRank centrality of the URL
graph.  This engine has no URL column, but it derives graphs the same
pipelines care about: the exact near-dup pair graph
(``prefix_jaccard_pairs``) whose connected components feed
``resolve_duplicates``, and whose centrality ranks how "hub-like" a
duplicated document is.

Scale notes (100 TB):

- :func:`pagerank` is the standard distributed iteration: each round
  is ONE shuffle keyed by destination node (contributions groupBy) —
  hub nodes receive many contributions but SUM is map-side
  combinable, so in-degree skew does not funnel rows through one
  reducer.  Out-degrees are computed once and persisted; the rank
  frame is the only thing that moves per round.
- Every iteration is eagerly cut from the lineage
  (``localCheckpoint``; pass ``checkpoint_dir`` for a reliable
  HDFS/S3 checkpoint on a real cluster — same contract as
  ``connected_components``, dedup.py:43).
- Dangling mass (nodes with no out-edges) is folded in via a 1-row
  aggregate broadcast — never a driver-side loop over nodes.
- The iteration count is FIXED (power iteration), so the whole job is
  ``iterations`` shuffles — no data-dependent convergence probe jobs.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.dedup import _cut_lineage

_LOG = logging.getLogger("sample_dms_s3_kinesis_spark.graph")


def degree_stats(
    pairs: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Per-node degree of an undirected pair list (each row one edge,
    endpoints in either column).  One explode + one map-side-combined
    count — the degree histogram of the near-dup graph is the
    standard first diagnostic before cluster resolution (a
    boilerplate hub shows up as a degree spike long before the CC
    job runs).

    Output: (id, degree).
    """
    ends = pairs.select(F.col(src_col).alias("id")).unionAll(
        pairs.select(F.col(dst_col).alias("id"))
    )
    return ends.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_dir: str | None = None,
    driver_threshold: int = 100_000,
    scale: int = 6,
) -> DataFrame:
    """Power-iteration PageRank over a DIRECTED edge list (symmetrize
    first for an undirected similarity graph).  Ranks sum to ~1.

    Per iteration: ``rank' = (1-d)/n + d * (in_contributions +
    dangling_mass / n)`` — contributions are ``rank/out_degree``
    summed per destination (one dst-keyed shuffle, map-side
    combined); with ``weight_col`` (e.g. the pair jaccard) each edge
    carries ``rank * w / sum_of_out_weights`` instead — similarity-
    weighted centrality; dangling mass is a 1-row aggregate cross-joined back
    (broadcast nested loop over one row, the accepted tiny-frame
    shape).  Nodes with no in-edges keep their teleport share via the
    right join against the node frame.

    ``driver_threshold``: edge graphs at or below this size (default
    100 000 edges — a few MB) run the identical power iteration on
    the DRIVER, skipping ``iterations`` rounds of distributed
    scheduling latency — the same size gate (and the same logged
    switch) as ``connected_components``; the distributed loop
    engages automatically above it (``driver_threshold=0`` forces
    it).

    Output: (id, rank) with ``rank`` rounded to ``scale`` decimals
    (floating sums are order-dependent across partitionings; the
    round pins a stable presentation, pytest compares against the
    Python model with tolerance).
    """
    if weight_col is not None:
        # parallel edges merge by summing their weights
        e = (
            edges.select(
                F.col(src_col).alias("_s"),
                F.col(dst_col).alias("_d"),
                F.col(weight_col).cast("double").alias("_w"),
            )
            .groupBy("_s", "_d")
            .agg(F.sum("_w").alias("_w"))
        )
    else:
        # unweighted contract: the edge LIST is a set — duplicates
        # collapse to one unit edge
        e = (
            edges.select(
                F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
            )
            .distinct()
            .withColumn("_w", F.lit(1.0))
        )
    e = _cut_lineage(e, checkpoint_dir)
    if driver_threshold and e.count() <= driver_threshold:
        _LOG.info(
            "pagerank: edge graph <= driver_threshold=%d, taking the "
            "driver power-iteration path (the distributed loop "
            "engages above the gate)",
            driver_threshold,
        )
        rows = e.collect()
        id_type = dict(e.dtypes)["_s"]
        nodes_l = sorted({r["_s"] for r in rows} | {r["_d"] for r in rows})
        n = len(nodes_l)
        if n == 0:
            return e.sparkSession.createDataFrame(
                [], f"id {id_type}, rank double"
            )
        out: dict = {}
        for r in rows:
            out[r["_s"]] = out.get(r["_s"], 0.0) + r["_w"]
        rank = {v: 1.0 / n for v in nodes_l}
        for _ in range(iterations):
            dangling = sum(
                x for v, x in rank.items() if out.get(v, 0.0) == 0.0
            )
            contrib = {v: 0.0 for v in nodes_l}
            for r in rows:
                # a node whose out-weights sum to 0 is dangling (the
                # distributed path's _out > 0 filter) — its edges
                # carry nothing, its rank teleports
                if out[r["_s"]] != 0.0:
                    contrib[r["_d"]] += (
                        rank[r["_s"]] * r["_w"] / out[r["_s"]]
                    )
            rank = {
                v: (1.0 - damping) / n
                + damping * (contrib[v] + dangling / n)
                for v in nodes_l
            }
        # round with F.round (HALF_UP) like the distributed path —
        # Python round() is banker's rounding, and the two paths are
        # documented as producing identical ranks either side of the
        # driver_threshold gate
        return (
            e.sparkSession.createDataFrame(
                list(rank.items()), f"id {id_type}, rank double"
            )
            .select("id", F.round("rank", scale).alias("rank"))
        )
    nodes = (
        e.select(F.col("_s").alias("id"))
        .unionAll(e.select(F.col("_d").alias("id")))
        .distinct()
    )
    nodes = _cut_lineage(nodes, checkpoint_dir).persist()
    n = nodes.count()  # bounded driver scalar: one long
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))
    out_deg = e.groupBy(F.col("_s").alias("id")).agg(
        F.sum("_w").alias("_out")
    )
    # node frame with out-weight 0 for dangling nodes; persisted once,
    # reused every iteration
    base = nodes.join(out_deg, on="id", how="left").select(
        "id", F.coalesce(F.col("_out"), F.lit(0.0)).alias("_out")
    )
    base = _cut_lineage(base, checkpoint_dir).persist()

    ranks = base.select("id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        r = ranks.join(base, on="id")
        dangling = r.filter(F.col("_out") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contrib = (
            r.filter(F.col("_out") > 0)
            .join(e, r["id"] == e["_s"])
            .select(
                F.col("_d").alias("id"),
                (F.col("rank") * F.col("_w") / F.col("_out")).alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, on="id", how="left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        ranks = _cut_lineage(ranks, checkpoint_dir)

    out = ranks.select("id", F.round("rank", scale).alias("rank"))
    base.unpersist()
    nodes.unpersist()
    return out


def _canonical_edges(
    pairs: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """(lo, hi) canonical undirected edge set: deduped, self-loops
    dropped — the shared base for degrees and triangles."""
    return (
        pairs.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
    )


def _triangles_from_canonical(
    e: DataFrame, deg: DataFrame
) -> DataFrame:
    """Per-node triangle counts over a canonical (lo, hi) edge frame
    (caller has cut its lineage) with its (id, degree) frame.

    Degree-ordered counting: each edge is directed from its lower-
    (degree, id)-rank endpoint to the higher; wedges form only around
    a node's HIGHER-rank neighbors, so a degree-d hub contributes
    wedges only through the ≤ √(2m) neighbors that out-rank it —
    the classic O(m^{3/2}) total-wedge bound that plain id-ordering
    does NOT give (an id-0 star would emit d² wedges).  Each triangle
    is counted once at its minimum-rank corner and credited to all
    three corners."""

    dl = deg.select(
        F.col("id").alias("lo"),
        F.struct(F.col("degree"), F.col("id")).alias("_rl"),
    )
    dh = deg.select(
        F.col("id").alias("hi"),
        F.struct(F.col("degree"), F.col("id")).alias("_rh"),
    )

    low_first = F.col("_rl") < F.col("_rh")  # ranks unique (id unique)
    # lineage cut: three references below (wedge x, wedge y, closing
    # semi-join) would otherwise each replan the rank-attach joins
    directed = _cut_lineage(
        e.join(dl, "lo")
        .join(dh, "hi")
        .select(
            F.when(low_first, F.col("lo")).otherwise(F.col("hi")).alias("src"),
            F.when(low_first, F.col("hi")).otherwise(F.col("lo")).alias("dst"),
            F.when(low_first, F.col("_rh")).otherwise(F.col("_rl")).alias("_rd"),
        )
    )
    # wedges (a; b, c) with rank(a) < rank(b) < rank(c): the closing
    # edge, if present, is directed b→c by construction
    wedges = (
        directed.alias("x")
        .join(
            directed.alias("y"),
            on=[
                F.col("x.src") == F.col("y.src"),
                F.col("x._rd") < F.col("y._rd"),
            ],
        )
        .select(
            F.col("x.src").alias("a"),
            F.col("x.dst").alias("b"),
            F.col("y.dst").alias("c"),
        )
    )
    tri = wedges.join(
        directed.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        on=["b", "c"],
        how="left_semi",
    )
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    return corners.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("triangles")
    )


def triangle_count(
    pairs: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Per-node triangle participation over an undirected pair list —
    with :func:`degree_stats` this gives local clustering coefficients,
    the standard density diagnostic of a near-dup graph (a boilerplate
    clique shows up as triangle mass long before cluster resolution).

    Scale: the canonical edge set is materialized once (lineage cut —
    it feeds the degree aggregate and three join sides), and wedges
    are DEGREE-ordered, bounding total wedge rows at O(m^{3/2}) even
    when one hub holds most edges (see
    :func:`_triangles_from_canonical`).

    Output: (id, triangles long) — nodes on ≥1 triangle.
    """

    e = _cut_lineage(_canonical_edges(pairs, src_col, dst_col))
    return _triangles_from_canonical(e, degree_stats(e, src_col="lo", dst_col="hi"))


def clustering_coefficients(
    pairs: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Local clustering coefficient per node: triangles / possible
    wedges (deg·(deg−1)/2), 0.0 for degree-1 nodes.  Degrees are
    computed over the DEDUPED undirected edge set so repeated input
    rows cannot inflate them; the edge set and degree frame are each
    computed ONCE and shared with the triangle pass (the upstream
    pair pipeline — e.g. an exact-jaccard join — is not re-executed
    per reference).

    Output: (id, degree, triangles, coefficient)."""

    e = _cut_lineage(_canonical_edges(pairs, src_col, dst_col))
    deg = _cut_lineage(degree_stats(e, src_col="lo", dst_col="hi"))
    tri = _triangles_from_canonical(e, deg)
    poss = F.col("degree") * (F.col("degree") - 1) / F.lit(2.0)
    return (
        deg.join(tri, on="id", how="left")
        .select(
            "id",
            "degree",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    F.coalesce(F.col("triangles"), F.lit(0)) / poss,
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("coefficient"),
        )
    )
