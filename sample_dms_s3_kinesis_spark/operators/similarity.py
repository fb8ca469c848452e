"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline — one narrow pass, a
  single top-k reduction (no full sort).
- IVF (inverted-file) ANN: coarse-quantizer cells as blocking keys —
  the 100 TB path: probe only ``nprobe`` cells per query instead of the
  full corpus.
- LSH (random hyperplane) ANN: sign-bit buckets, deterministic
  hyperplanes derived from xxhash64 so results are reproducible without
  storing a model.

Exactness contract: brute_force_topk is exact (oracle-checkable via
DuckDB list_cosine_similarity); IVF/LSH trade recall for probe cost and
get rows-only checks plus recall tests against the exact baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.dedup import cosine_similarity
from sample_dms_s3_kinesis_spark.operators.partitioning import spread
from sample_dms_s3_kinesis_spark.operators.text import _bind


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float] | Column,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against one query vector.

    Plan shape: map (cosine per row) → global top-k via orderBy+limit;
    Catalyst executes limit+sort as TakeOrderedAndProject (per-partition
    top-k then merge — no full shuffle sort).  Ties break on id for
    determinism.  Output: (vec_id, cosine)."""
    q = (
        F.array(*[F.lit(float(x)) for x in query_vec])
        if isinstance(query_vec, list)
        else query_vec
    )
    cos = cosine_similarity(F.col(vec_col).cast("array<double>"), q)
    # zero-norm vectors have undefined (NULL) cosine — excluded, so
    # garbage rows can neither outrank a perfect match nor pad the
    # "exact" top-k (an all-zeros query returns an empty frame)
    return (
        spread(df).select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# ------------------------------------------------------------------ IVF

def _deterministic_centroids(df: DataFrame, *, vec_col: str, id_col: str, cells: int) -> DataFrame:
    """Pick ``cells`` deterministic seed vectors as centroids (ids with
    the smallest xxhash64 — a reproducible pseudo-random sample).  A
    real deployment would k-means these; the operator contract (assign →
    probe) is identical.

    Seed selection is ``orderBy(hash).limit(cells)``, which Catalyst
    plans as TakeOrderedAndProject: every partition keeps its local
    top-``cells`` and a tiny merge finishes — the corpus is never pulled
    through a single-task global sort (a ``row_number`` window with no
    partitionBy would be exactly that, the classic 100×-scale killer).
    Only the ≤``cells``-row seed frame sees a windowed renumber."""
    seeds = (
        df.select(
            F.col(id_col).alias("cell_id"),
            F.col(vec_col).cast("array<double>").alias("centroid"),
        )
        .orderBy(F.xxhash64(F.col("cell_id")), F.col("cell_id"))
        .limit(cells)
    )
    return (
        seeds.withColumn(
            "cell", F.row_number().over(Window.orderBy("cell_id")) - 1
        ).select("cell", "centroid")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid cell.  Centroids are
    broadcast (they are tiny); assignment is a broadcast nested-loop +
    per-row argmax — embarrassingly parallel, no shuffle of the corpus."""
    v = spread(df).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    joined = v.join(F.broadcast(centroids))
    cos = cosine_similarity(F.col("_v"), F.col("centroid"))
    # argmax as a map-side-combinable MAX(struct(cos, -cell)) — the
    # same shape as _l2_assign; the former row_number window shuffled
    # cells x corpus rows with no partial aggregation and sorted them
    # (struct order: higher cos wins, ties -> smaller cell, identical
    # to the window's (desc _cos, asc cell))
    return (
        joined.select(F.col(id_col), F.col("cell"), cos.alias("_cos"))
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("_cos"), (-F.col("cell")).alias("_negcell")
                )
            ).alias("_best")
        )
        .select(id_col, (-F.col("_best._negcell")).alias("cell"))
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: search only the ``nprobe`` cells whose centroids are
    closest to the query.  At 100 TB with the corpus partitioned (or a
    table bucketed) by cell, a probe touches nprobe/cells of the data —
    partition pruning does the rest.  Output: (vec_id, cosine).

    The centroid frame (≤ ``cells`` rows) is materialized ONCE to the
    driver and re-created as a local relation: bounded driver traffic,
    no ``persist`` to leak across calls in a long-lived session, and
    the broadcast in ``ivf_assign`` ships a literal local plan.  For
    repeated queries over one corpus use :class:`IvfIndex` (build once,
    search many)."""
    cent_plan = _deterministic_centroids(
        df, vec_col=vec_col, id_col=id_col, cells=cells
    )
    centroids = df.sparkSession.createDataFrame(
        cent_plan.collect(), cent_plan.schema
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_cells = [
        r["cell"]
        for r in centroids.select(
            "cell", cosine_similarity(F.col("centroid"), q).alias("c")
        )
        .orderBy(F.desc("c"), F.asc("cell"))
        .limit(nprobe)
        .collect()
    ]
    assignment = ivf_assign(df, centroids, vec_col=vec_col, id_col=id_col)
    probed = df.join(assignment, on=id_col).filter(F.col("cell").isin(probe_cells))
    return brute_force_topk(probed, query_vec, k=k, vec_col=vec_col, id_col=id_col)


# ------------------------------------------------------------------ LSH

def hyperplane_signature(vec: Column, *, planes: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane sign signature packed into a long.  Plane
    components are deterministic pseudo-randoms in (-1, 1) — signed
    ``xxhash64(plane, j) % 10_000`` keeps the dividend's sign, scaled
    by 1e4 — reproducible across sessions with no stored model.  Only
    the component SIGN pattern matters for sign-LSH, so the asymmetric
    distribution around 0 is harmless."""
    def component(p: int, j: Column) -> Column:
        h = F.xxhash64(F.lit(p), j)
        return (h % 10_000).cast("double") / F.lit(10_000.0)

    # vec is bound once: the `planes` sibling dot-product aggregates
    # would otherwise re-evaluate an inline vector expression once per
    # plane (Catalyst does not CSE across HOF siblings).
    def _sig(v: Column) -> Column:
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        v,
                        F.transform(
                            F.sequence(F.lit(0), F.lit(dim - 1)),
                            lambda j: component(p, j),
                        ),
                        lambda x, c: x * c,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.shiftleft(F.lit(1).cast("long"), p),
            ).otherwise(F.lit(0).cast("long"))
            for p in range(planes)
        ]
        out = F.lit(0).cast("long")
        for b in bits:
            out = out.bitwiseXOR(b)
        return out

    return _bind(vec, _sig)


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    planes: int = 12,
    hamming_probes: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """LSH-bucketed ANN: exact cosine within the query's hyperplane
    bucket plus every bucket within ``hamming_probes`` bit flips of it
    (standard multi-probe LSH: a near neighbor that lands on the wrong
    side of 1–2 hyperplanes still differs in only that many signature
    bits).  The probe set is enumerated on the driver — O(planes^d)
    signatures, 1+12=13 at the defaults — and the plan stays
    scan→IN-filter→topk, so the filter pushes to the source.
    ``hamming_probes=0`` is the single-bucket recall cliff; 1 is the
    production default; 2 for high recall on coarse (few-plane)
    signatures."""
    import itertools

    dim = len(query_vec)
    # a corpus/query dimension mismatch would NULL-poison every corpus
    # signature to 0 (zip_with pads nulls) and silently return an
    # empty top-k — fail loudly instead.  Probe the first NON-NULL
    # vector: a leading NULL embedding is legal (the brute-force/IVF
    # paths tolerate it) and F.size(NULL) is NULL, which must not
    # read as a mismatch.  Per-row stragglers of a different length
    # hash to NULL signatures and fall out of the bucket filter, the
    # same degenerate-row tolerance as the exact path.
    first = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("_d"))
        .first()
    )
    if first is not None and first["_d"] != dim:
        raise ValueError(
            f"query vector has {dim} components but the corpus "
            f"{vec_col} column has {first['_d']}"
        )
    sig = hyperplane_signature(
        F.col(vec_col).cast("array<double>"), planes=planes, dim=dim
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qsig_row = (
        df.sparkSession.range(1)
        .select(hyperplane_signature(q, planes=planes, dim=dim).alias("s"))
        .collect()
    )
    qsig = qsig_row[0]["s"]
    # generalized multi-probe: every signature within hamming_probes
    # bit flips (the former hard-coded >=1/>=2 branches silently
    # capped any larger request at distance 2)
    probe_sigs = {qsig}
    for d in range(1, hamming_probes + 1):
        for flips in itertools.combinations(range(planes), d):
            x = qsig
            for b in flips:
                x ^= 1 << b
            probe_sigs.add(x)
    bucket = spread(df).filter(sig.isin([int(s) for s in sorted(probe_sigs)]))
    return brute_force_topk(bucket, query_vec, k=k, vec_col=vec_col, id_col=id_col)


def batch_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors for a batch of query vectors.

    Plan: broadcast the query set against the (spread) corpus — each
    corpus partition scores all queries locally — then per-query top-k
    via rank-window.  The shuffle moves only (query_id, vec_id, cosine)
    triples, never vectors; corpus size × query count bounds the scored
    pairs, so batch the queries (thousands, not millions) and loop
    batches at larger scale.  Output: (query_id, rank, vec_id, cosine).
    """
    scored = _batch_scored(
        corpus, queries,
        vec_col=vec_col, id_col=id_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def _batch_scored(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    query_vec_col: str,
) -> DataFrame:
    """(query_id, id, cosine) for every (query, corpus) pair: broadcast
    queries against the spread corpus; degenerate (NULL-cosine) rows
    are dropped so they never pad a downstream top-k (the
    brute_force_topk contract).  Shared by batch_topk and
    mine_hard_negatives."""
    c = spread(corpus).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).cast("array<double>").alias("_q"),
    )
    return (
        c.join(F.broadcast(q))
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine_similarity(F.col("_v"), F.col("_q")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )


def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    lo: float = 0.3,
    hi: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: per
    query (anchor), the top-``k`` corpus vectors whose cosine falls in
    ``[lo, hi)`` — similar enough to be informative negatives, below
    the near-duplicate band (``hi``) that would make them FALSE
    negatives; the anchor itself and its near-copies sit at cosine ~1
    and are excluded by the band, not by id bookkeeping.

    Same broadcast-queries + rank-window shape as :func:`batch_topk`
    (shuffles (query_id, id, cosine) triples only); at corpus scale,
    generate the candidate pool with the IVF/LSH index families first
    and band-filter their output — the ranking contract is identical.
    Output: (query_id, rank, id_col, cosine), rank 1 = hardest."""
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scored = _batch_scored(
        corpus, queries,
        vec_col=vec_col, id_col=id_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
    )
    banded = scored.filter(
        (F.col("cosine") >= F.lit(float(lo)))
        & (F.col("cosine") < F.lit(float(hi)))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        banded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def mmr_rerank(
    df: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    lambda_: float = 0.7,
    pool: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): diversify a retrieval result by greedily picking the
    candidate that maximizes ``λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s)``
    — the standard redundancy-reduction step between an ANN search and
    a RAG context window.

    Two stages:

    1. distributed candidate pool — exact cosine top-``pool`` against
       the corpus (TakeOrderedAndProject, same contract as
       :func:`brute_force_topk`), and the pool's pairwise similarity
       matrix via a crossJoin of the tiny pool frame (O(pool²) rows,
       broadcast);
    2. greedy selection over those O(pool²) collected scalars on the
       driver — the greedy recurrence is inherently sequential, and
       bounding it by ``pool`` (not the corpus) is what makes MMR
       scale: the corpus pass stays distributed, the driver never
       holds vectors.

    Determinism: relevance and pairwise similarities are rounded to 6
    decimals BEFORE the greedy (cross-engine float contract, same as
    brute_force_topk); ties break on id ascending.  Distinct rounded
    inputs keep mmr scores ≥1e-7 apart, so a last-ulp evaluation
    difference can never flip the argmax — any engine replaying the
    recurrence selects the same sequence.  ``mmr_score`` is emitted as
    the raw double ``λ·rel − (1−λ)·penalty`` (oracle comparisons
    round it, since engines may differ in the last ulp).

    Returns ``(step, <id_col>, relevance, penalty, mmr_score)`` with
    ``step`` 1..k in selection order (fewer if the pool runs dry).
    """
    if k < 1 or pool < 1:
        raise ValueError("k and pool must be >= 1")
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError("lambda_ must be in [0, 1]")
    cand = (
        spread(df)
        .select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn(
            "rel",
            F.round(
                cosine_similarity(
                    F.col("_v"),
                    F.array(*[F.lit(float(x)) for x in query_vec]),
                ),
                6,
            ),
        )
        .filter(F.col("rel").isNotNull())
        .orderBy(F.desc("rel"), F.asc(id_col))
        .limit(pool)
    )
    a = cand.select(F.col(id_col).alias("_ida"), F.col("_v").alias("_va"))
    b = cand.select(F.col(id_col).alias("_idb"), F.col("_v").alias("_vb"))
    sims_df = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("_ida") != F.col("_idb"))
        .select(
            "_ida",
            "_idb",
            F.round(
                cosine_similarity(F.col("_va"), F.col("_vb")), 6
            ).alias("_sim"),
        )
    )
    rel = {r[id_col]: r["rel"] for r in cand.select(id_col, "rel").collect()}
    sim: dict[int, dict[int, float]] = {}
    for r in sims_df.collect():
        sim.setdefault(r["_ida"], {})[r["_idb"]] = r["_sim"]
    chosen: list[tuple[int, int, float, float, float]] = []
    selected: list = []
    remaining = set(rel)
    for step in range(1, min(k, len(rel)) + 1):
        best = None
        for d in remaining:
            penalty = (
                max(sim[d][s] for s in selected) if selected else 0.0
            )
            score = lambda_ * rel[d] - (1.0 - lambda_) * penalty
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, penalty, score)
        _, d, penalty, score = best
        chosen.append((step, d, rel[d], penalty, score))
        selected.append(d)
        remaining.discard(d)
    spark = df.sparkSession
    id_type = dict(df.dtypes)[id_col]
    return spark.createDataFrame(
        chosen,
        schema=(
            f"step int, {id_col} {id_type}, relevance double, "
            "penalty double, mmr_score double"
        ),
    )


class IvfIndex:
    """Built-once IVF index: centroids + cell assignment are computed a
    single time (eagerly checkpointed) and every ``search`` only scores
    the ``nprobe`` nearest cells — ``ivf_topk`` re-derives both per
    call, which is the right shape for a one-off query but not for a
    query service.  At 100 TB the assignment frame would be a table
    bucketed/partitioned by ``cell`` so probes prune at the source."""

    def __init__(self, centroids: DataFrame, assigned: DataFrame, *, vec_col: str, id_col: str):
        self.centroids = centroids
        self.assigned = assigned
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        df: DataFrame,
        *,
        cells: int = 16,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "IvfIndex":
        centroids = _deterministic_centroids(
            df, vec_col=vec_col, id_col=id_col, cells=cells
        ).localCheckpoint(eager=True)
        assignment = ivf_assign(df, centroids, vec_col=vec_col, id_col=id_col)
        assigned = (
            df.select(F.col(id_col), F.col(vec_col))
            .join(assignment, on=id_col)
            .localCheckpoint(eager=True)
        )
        return cls(centroids, assigned, vec_col=vec_col, id_col=id_col)

    def search(self, query_vec: list[float], *, k: int = 10, nprobe: int = 4) -> DataFrame:
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        probe_cells = [
            r["cell"]
            for r in self.centroids.select(
                "cell", cosine_similarity(F.col("centroid"), q).alias("c")
            )
            .orderBy(F.desc("c"), F.asc("cell"))
            .limit(nprobe)
            .collect()
        ]
        probed = self.assigned.filter(F.col("cell").isin(probe_cells))
        return brute_force_topk(
            probed, query_vec, k=k, vec_col=self.vec_col, id_col=self.id_col
        )

    # -- persistence ---------------------------------------------------
    # The durable service shape: build once, WRITE the index, serve many
    # sessions.  The assignment frame is written partitioned BY CELL, so
    # a loaded index's probe filter (`cell IN (...)`) becomes parquet
    # PARTITION PRUNING — at 100 TB a probe reads nprobe/cells of the
    # corpus from storage instead of scanning and filtering it.

    def save(self, path: str) -> None:
        path = path.rstrip("/")
        self.centroids.write.mode("overwrite").parquet(f"{path}/centroids")
        (
            self.assigned.write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{path}/assigned")
        )
        meta = self.centroids.sparkSession.createDataFrame(
            [(self.vec_col, self.id_col)], "vec_col string, id_col string"
        )
        meta.coalesce(1).write.mode("overwrite").json(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        path = path.rstrip("/")
        meta = spark.read.json(f"{path}/meta").collect()[0]
        centroids = spark.read.parquet(f"{path}/centroids")
        assigned = spark.read.parquet(f"{path}/assigned")
        return cls(
            centroids,
            assigned,
            vec_col=meta["vec_col"],
            id_col=meta["id_col"],
        )


def kmeans_refine(
    df: DataFrame,
    centroids: DataFrame,
    *,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Lloyd refinement of an initial centroid set (e.g. the seed pick
    of :func:`_deterministic_centroids`): repeat assign → per-cell mean.
    Each iteration is one broadcast assignment pass over the corpus
    plus one wide aggregate (dim scalars per cell through a partial-agg
    shuffle) — no explode, and the ≤cells-row centroid frame returns to
    the driver each round (bounded traffic), so the loop plan never
    deepens.  Deterministic: ties in assignment break on cell id, and a
    cell that loses every vector keeps its previous centroid.  Output:
    (cell, centroid) like the input."""
    if dim is None:
        # Probe the (tiny, usually checkpointed) centroid frame, not the
        # corpus — one cheap job instead of a scan of df.
        seed = centroids.select("centroid").first()
        if seed is None or seed[0] is None:
            raise ValueError(
                "kmeans_refine: cannot infer dim from an empty/null "
                "centroid frame; pass dim= explicitly"
            )
        dim = len(seed[0])
    spark = df.sparkSession
    # Re-create each iteration's merged frame under the INPUT's schema —
    # a hardcoded 'cell int' would silently truncate long cell ids.
    schema = centroids.schema
    current = centroids
    for _ in range(max(0, iters)):
        assign = ivf_assign(df, current, vec_col=vec_col, id_col=id_col)
        joined = df.join(assign, on=id_col)
        means = label_centroids(
            joined, vec_col=vec_col, label_col="cell", dim=dim
        )
        new_rows = {r["cell"]: r["centroid"] for r in means.collect()}
        merged = [
            (r["cell"], new_rows.get(r["cell"], r["centroid"]))
            for r in current.collect()
        ]
        current = spark.createDataFrame(merged, schema)
    return current


# ------------------------------------------------------- vector utils

def l2_norm(vec: Column) -> Column:
    """Euclidean norm of an array<double> column — JVM-side fold."""
    return F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x * x), F.lit(0.0), lambda s, v: s + v
        )
    )


def l2_normalize(vec: Column, *, scale: int | None = None) -> Column:
    """Unit-normalize a vector column (zero vectors pass through as
    zeros).  With ``scale``, components are rounded for cross-engine
    comparison; leave None in compute pipelines.

    The norm is bound to a lambda variable before the division: a
    captured norm EXPRESSION inside ``transform``'s lambda is
    re-evaluated once per component — O(d²) per vector instead of
    O(d) (HOF lambdas are opaque to Catalyst CSE)."""

    def _unit(v: Column) -> Column:
        return _bind(
            l2_norm(v),
            lambda n: F.when(
                n > 0, F.transform(v, lambda x: x / n)
            ).otherwise(v),
        )

    unit = _bind(vec, _unit)
    if scale is not None:
        unit = F.transform(unit, lambda x: F.round(x, scale))
    return unit


def label_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int,
    scale: int | None = None,
) -> DataFrame:
    """Per-label mean vector — the centroid build for blocking /
    coarse quantization.  One wide aggregate: dim per-slot AVGs in a
    single hash-partitioned groupBy (partial map-side aggregation, one
    shuffle of dim doubles per label), then reassembled into an array.
    No explode: exploding to (row × dim) would shuffle dim× the data
    for the same answer."""
    v = F.col(vec_col).cast("array<double>")
    avgs = [
        F.avg(F.get(v, i)).alias(f"_c{i}") for i in range(dim)
    ]
    out = df.groupBy(label_col).agg(*avgs)
    comps = [F.col(f"_c{i}") for i in range(dim)]
    if scale is not None:
        comps = [F.round(c, scale) for c in comps]
    return out.select(label_col, F.array(*comps).alias("centroid"))


def embedding_diversity(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str | None = None,
    scale: int = 6,
) -> DataFrame:
    """Mean pairwise cosine similarity of the corpus (or of each
    ``label_col`` group) WITHOUT the O(n²) pair join: for unit
    vectors, ``Σ_{i≠j} cos(v_i, v_j) = ||Σ v̂||² − n``, so the mean is
    ``(||S||² − n) / (n·(n−1))`` — the mixture-collapse / diversity
    KPI a curation pipeline tracks per source, computed from ONE
    linear pass.

    Plan shape: normalize (per-row HOF fold), posexplode to
    (group, dim, component), one map-side-combined per-dim SUM, then a
    dim-sized per-group reduce — the corpus is touched once and the
    shuffle carries dim doubles per group, never a pair frame.  NULL
    and zero-norm vectors are excluded from both n and S (they have no
    defined cosine).  Groups with n < 2 report NULL.  Output:
    ``([label,] n_vectors, mean_pairwise_cosine)``."""
    keys = [label_col] if label_col else []
    v = F.col(vec_col).cast("array<double>")
    unit = (
        spread(df)
        .filter(v.isNotNull() & (l2_norm(v) > 0))
        .select(*keys, l2_normalize(v).alias("_u"))
    )
    comp = unit.select(*keys, F.posexplode("_u").alias("_pos", "_c"))
    per_dim = comp.groupBy(*keys, "_pos").agg(F.sum("_c").alias("_s"))
    ssq = per_dim.groupBy(*keys).agg(
        F.sum(F.col("_s") * F.col("_s")).alias("_ssq")
    )
    n = unit.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_vectors"))
    joined = (
        n.join(ssq, on=keys)
        if keys
        # ungrouped: both sides are one row — broadcast cross join
        else n.crossJoin(F.broadcast(ssq))
    )
    mean = F.when(
        F.col("n_vectors") >= 2,
        F.round(
            (F.col("_ssq") - F.col("n_vectors"))
            / (F.col("n_vectors") * (F.col("n_vectors") - F.lit(1.0))),
            scale,
        ),
    )
    return joined.select(
        *keys, "n_vectors", mean.alias("mean_pairwise_cosine")
    )


def quantization_params(
    df: DataFrame, *, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Per-dimension (min, max) over the corpus — the scalar-quantizer
    calibration.  One wide aggregate (2·dim scalars through a single
    partial-agg shuffle), no explode.  Output: one row,
    ``mins array<double>, maxs array<double>``."""
    if dim is None:
        probe = df.select(vec_col).first()
        if probe is None or probe[0] is None:
            raise ValueError(
                "quantization_params: cannot infer dim from an "
                "empty/null-vector frame; pass dim= explicitly"
            )
        dim = len(probe[0])
    v = F.col(vec_col).cast("array<double>")
    aggs = []
    for i in range(dim):
        aggs.append(F.min(F.get(v, i)).alias(f"_mn{i}"))
        aggs.append(F.max(F.get(v, i)).alias(f"_mx{i}"))
    row = df.agg(*aggs)
    return row.select(
        F.array(*[F.col(f"_mn{i}") for i in range(dim)]).alias("mins"),
        F.array(*[F.col(f"_mx{i}") for i in range(dim)]).alias("maxs"),
    )


def quantize_embeddings(
    df: DataFrame,
    params: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scalar int8 quantization: each component maps linearly from its
    per-dimension [min, max] onto 0..255 (stored −128..127) — 4-8×
    storage reduction for an embedding corpus, the first step of an
    IVF+SQ index.  The 2·dim-double params row is crossJoin-broadcast;
    the math is zip_with over arrays, fully JVM-side.  A constant
    dimension (max == min) quantizes to 0.  Output:
    (id_col, qvec array<int> in [-128, 127])."""
    q = (
        F.zip_with(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.col("mins"),
                lambda x, mn: x - mn,
            ),
            F.zip_with(F.col("maxs"), F.col("mins"), lambda mx, mn: mx - mn),
            # clamp to [0, 255] BEFORE the -128 shift: a component
            # outside the calibrated [min, max] (params fit on a
            # sample, corpus quantized in full — the standard 100 TB
            # workflow) would otherwise produce codes outside int8
            lambda d, rng: F.when(
                rng > 0,
                F.least(
                    F.greatest(F.round(d / rng * F.lit(255.0)), F.lit(0.0)),
                    F.lit(255.0),
                ).cast("int")
                - F.lit(128),
            ).otherwise(F.lit(0)),
        )
    )
    return df.crossJoin(F.broadcast(params)).select(
        F.col(id_col), q.alias("qvec")
    )


def dequantize(qvec: Column, mins: Column, maxs: Column) -> Column:
    """Inverse map back to doubles (quantization error ≤ range/510 per
    component) — used by search paths that score on quantized storage."""
    return F.zip_with(
        F.zip_with(qvec, mins, lambda qc, mn: F.struct(qc.alias("q"), mn.alias("mn"))),
        F.zip_with(maxs, mins, lambda mx, mn: mx - mn),
        lambda s, rng: s["mn"] + (s["q"].cast("double") + F.lit(128.0)) / F.lit(255.0) * rng,
    )


# ---------------------------------------------------- semantic dedup

def semantic_dedup_pairs(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cells: int = 16,
    threshold: float = 0.97,
    iters: int = 2,
    broadcast: bool | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): coarse k-means clustering of the embedding
    space, then exact cosine pairs WITHIN each cluster only — the
    pair count drops from O(n²) to O(Σ cluster²), and with balanced
    clusters a 100 TB corpus never materializes a cross-cluster pair.

    This is a pure composition of existing primitives: deterministic
    seed pick → Lloyd refinement → broadcast assignment →
    block-keyed pair join (`dedup.embedding_near_dup_pairs` with the
    learned cell as the blocking key).  Approximate by construction:
    a true near-dup pair straddling a cluster boundary is missed —
    the recall/cost dial is ``cells`` (SemDeDup §3 reports the
    boundary loss negligible at their scale).

    ``df`` is scanned once per k-means iteration plus twice for the
    pair join — persist it (or point it at parquet) before calling.
    Returns ``(id_a < id_b, cosine)`` like the other pair operators.
    """
    from sample_dms_s3_kinesis_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    cent = kmeans_refine(
        df,
        _deterministic_centroids(df, vec_col=vec_col, id_col=id_col, cells=cells),
        iters=iters,
        vec_col=vec_col,
        id_col=id_col,
    )
    assign = ivf_assign(df, cent, vec_col=vec_col, id_col=id_col)
    blocked = df.select(id_col, vec_col).join(assign, on=id_col)
    return embedding_near_dup_pairs(
        blocked,
        vec_col=vec_col,
        id_col=id_col,
        block_col="cell",
        threshold=threshold,
        broadcast=broadcast,
    )


def semantic_dedup(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cells: int = 16,
    threshold: float = 0.97,
    iters: int = 2,
    broadcast: bool | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Survivor frame for :func:`semantic_dedup_pairs`: one canonical
    row (min id) per semantic cluster, singletons untouched.  Drop-list
    anti-join only — the corpus itself is never shuffled."""
    from sample_dms_s3_kinesis_spark.operators.dedup import resolve_duplicates

    pairs = semantic_dedup_pairs(
        df,
        vec_col=vec_col,
        id_col=id_col,
        cells=cells,
        threshold=threshold,
        iters=iters,
        broadcast=broadcast,
    )
    return resolve_duplicates(
        df, pairs, id_col=id_col, checkpoint_dir=checkpoint_dir
    )


# ----------------------------------------------- product quantization

def _pq_dim(df: DataFrame, vec_col: str, dim: int | None, m: int) -> int:
    if dim is None:
        probe = df.select(vec_col).first()
        if probe is None or probe[0] is None:
            raise ValueError(
                "pq: cannot infer dim from an empty/null-vector frame; "
                "pass dim= explicitly"
            )
        dim = len(probe[0])
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    return dim


def _pq_subvectors(
    df: DataFrame, *, vec_col: str, id_col: str, m: int, dim: int
) -> DataFrame:
    """(id, sub, _sv) — each vector split into m contiguous subvectors.
    Bounded explode: exactly m rows per vector."""
    d_sub = dim // m
    # bind the cast: m sibling slices of an inline cast would copy the
    # float→double conversion once per subvector
    slices = _bind(
        F.col(vec_col).cast("array<double>"),
        lambda v: F.array(
            *[F.slice(v, j * d_sub + 1, d_sub) for j in range(m)]
        ),
    )
    return spread(df).select(
        F.col(id_col), F.posexplode(slices).alias("sub", "_sv")
    )


def _pq_assign(subs: DataFrame, codebooks: DataFrame, id_col: str) -> DataFrame:
    """Nearest code per (vector, subspace): broadcast the m·codes-row
    codebook, join on the subspace, per-group MIN(struct(dist, code))
    aggregate — deterministic tie-break on code, map-side combinable,
    no window over the corpus."""
    joined = subs.join(F.broadcast(codebooks), on="sub")
    d2 = F.aggregate(
        F.zip_with(F.col("_sv"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return (
        joined.groupBy(id_col, "sub")
        .agg(F.min(F.struct(d2.alias("_d"), F.col("code").alias("code"))).alias("_b"))
        .select(id_col, "sub", F.col("_b.code").alias("code"))
    )


def pq_train(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    codes: int = 16,
    iters: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """Train product-quantization codebooks: split every vector into
    ``m`` contiguous subvectors and k-means each subspace into
    ``codes`` centroids (Jégou et al. 2011 — the memory side of
    billion-scale ANN: a vector becomes m small codes, 4-8 bytes total,
    while distances stay computable against the codebooks alone).

    Plan: ONE bounded explode (m rows/vector), seed centroids from the
    subvectors of ``codes`` hash-sampled vectors (TakeOrderedAndProject
    — no corpus window), then Lloyd rounds shared across all subspaces
    at once: broadcast codebook join + per-(vector, subspace) MIN
    aggregate + a wide per-(sub, code) mean — the driver sees only the
    m·codes codebook rows per round.  Empty codes keep their previous
    centroid; everything ties deterministically.

    Output: (sub, code, centroid array<double>) — m·codes rows.
    """
    dim = _pq_dim(df, vec_col, dim, m)
    d_sub = dim // m
    subs = _pq_subvectors(df, vec_col=vec_col, id_col=id_col, m=m, dim=dim)
    seed_ids = (
        df.select(F.col(id_col))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(codes)
        .withColumn(
            "code", F.row_number().over(Window.orderBy(id_col)) - 1
        )
    )
    codebooks = (
        subs.join(F.broadcast(seed_ids), on=id_col)
        .select("sub", "code", F.col("_sv").alias("centroid"))
    )
    spark = df.sparkSession
    current = codebooks.collect()
    codebooks = spark.createDataFrame(
        current, "sub int, code int, centroid array<double>"
    )
    for _ in range(max(0, iters)):
        assign = _pq_assign(subs, codebooks, id_col)
        joined = subs.join(assign, on=[id_col, "sub"])
        avgs = [
            F.avg(F.get(F.col("_sv"), i)).alias(f"_c{i}") for i in range(d_sub)
        ]
        means = (
            joined.groupBy("sub", "code")
            .agg(*avgs)
            .select(
                "sub",
                "code",
                F.array(*[F.col(f"_c{i}") for i in range(d_sub)]).alias(
                    "centroid"
                ),
            )
            .collect()
        )
        got = {(r["sub"], r["code"]): r["centroid"] for r in means}
        merged = [
            (r["sub"], r["code"], got.get((r["sub"], r["code"]), r["centroid"]))
            for r in codebooks.collect()
        ]
        codebooks = spark.createDataFrame(
            merged, "sub int, code int, centroid array<double>"
        )
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Encode every vector as its m nearest-code ids.  Output:
    (id_col, codes array<int>) — the 100 TB resident form of the
    corpus: m bytes-ish per vector instead of 4·dim."""
    dim = _pq_dim(df, vec_col, dim, m)
    subs = _pq_subvectors(df, vec_col=vec_col, id_col=id_col, m=m, dim=dim)
    assign = _pq_assign(subs, codebooks, id_col)
    return (
        assign.groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("sub"), F.col("code")))
                ),
                lambda s: s["code"],
            ).alias("codes")
        )
    )


def _adc_table_expr(query, entries, *, m: int, n_codes: int, d_sub: int) -> Column:
    """Squared-distance lookup table of ``query`` against each
    (sub, code) centroid, as a nested array literal — the shared ADC
    table builder for :func:`pq_topk` and :meth:`IvfPqIndex.search`
    (one definition of the table layout the lookup fold indexes)."""
    table = [[0.0] * n_codes for _ in range(m)]
    for sub, code, cen in entries:
        qs = query[sub * d_sub : (sub + 1) * d_sub]
        table[sub][code] = sum(
            (float(a) - float(b)) ** 2 for a, b in zip(qs, cen)
        )
    return F.array(*[F.array(*[F.lit(x) for x in row]) for row in table])


def _adc_dist(tbl: Column, m: int) -> Column:
    """m table lookups + a sum over the codes array — the shared ADC
    scoring fold (1-based element_at on both levels; codes are
    0-based, hence the (c + 1) cast)."""
    return F.aggregate(
        F.zip_with(
            F.sequence(F.lit(1), F.lit(m)),
            F.col("codes"),
            lambda i, c: F.element_at(
                F.element_at(tbl, i), (c + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def pq_topk(
    encoded: DataFrame,
    codebooks: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the driver turns the
    (tiny) codebook into a per-(subspace, code) squared-distance table
    against the query, and scoring a vector is m table lookups + a sum
    — a pure Catalyst fold over the codes array; the corpus's float
    vectors are never read.  TakeOrderedAndProject finishes (per-
    partition heaps, no global sort).

    Output: (id_col, approx_dist) ascending, ties broken on id.
    """
    rows = codebooks.collect()  # m·codes rows — driver-bounded
    if not rows:
        raise ValueError("pq_topk: empty codebook frame")
    m = 1 + max(r["sub"] for r in rows)
    n_codes = 1 + max(r["code"] for r in rows)
    d_sub = len(rows[0]["centroid"])
    tbl = _adc_table_expr(
        query_vec,
        ((r["sub"], r["code"], r["centroid"]) for r in rows),
        m=m,
        n_codes=n_codes,
        d_sub=d_sub,
    )
    dist = _adc_dist(tbl, m)
    return (
        encoded.select(F.col(id_col), F.round(dist, scale).alias("approx_dist"))
        .orderBy("approx_dist", id_col)
        .limit(k)
    )


def _l2_assign(
    df: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Nearest-centroid cell by EUCLIDEAN distance (the PQ-side metric;
    :func:`ivf_assign` is its cosine twin).  Broadcast centroids +
    per-group MIN(struct) argmin — deterministic, no corpus window."""
    v = spread(df).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    joined = v.join(F.broadcast(centroids))
    d2 = F.aggregate(
        F.zip_with(F.col("_v"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return (
        joined.groupBy(id_col)
        .agg(F.min(F.struct(d2.alias("_d"), F.col("cell").alias("cell"))).alias("_b"))
        .select(id_col, F.col("_b.cell").alias("cell"))
    )


class IvfPqIndex:
    """IVF-PQ (IVFADC, Jégou et al. 2011): a coarse inverted file picks
    candidate cells, and within each cell vectors live only as PQ codes
    of their RESIDUAL from the cell centroid — the composition that
    serves billion-vector corpora: the coarse quantizer prunes the
    corpus to nprobe/cells, and the PQ codes shrink what remains to a
    few bytes per vector.  Search never touches a float corpus vector:
    the driver builds one m×codes asymmetric-distance table per probed
    cell (against the query's residual in that cell) and scoring is m
    table lookups + a sum per candidate, finished by
    TakeOrderedAndProject.

    All distances are Euclidean (the PQ metric); everything ties
    deterministically, so build and search are pure functions of the
    corpus.
    """

    def __init__(
        self,
        centroids: DataFrame,
        codebooks: DataFrame,
        encoded: DataFrame,
        *,
        m: int,
        id_col: str,
    ):
        self.centroids = centroids
        self.codebooks = codebooks
        self.encoded = encoded  # (id, cell, codes)
        self.m = m
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        df: DataFrame,
        *,
        cells: int = 8,
        m: int = 4,
        codes: int = 16,
        iters: int = 1,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        dim: int | None = None,
    ) -> "IvfPqIndex":
        dim = _pq_dim(df, vec_col, dim, m)
        centroids = _deterministic_centroids(
            df, vec_col=vec_col, id_col=id_col, cells=cells
        ).localCheckpoint(eager=True)
        assign = _l2_assign(df, centroids, vec_col=vec_col, id_col=id_col)
        residuals = (
            df.select(
                F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
            )
            .join(assign, on=id_col)
            .join(F.broadcast(centroids), on="cell")
            .select(
                id_col,
                "cell",
                F.zip_with(
                    F.col("_v"), F.col("centroid"), lambda a, b: a - b
                ).alias("_res"),
            )
            .localCheckpoint(eager=True)
        )
        codebooks = pq_train(
            residuals, vec_col="_res", id_col=id_col, m=m, codes=codes,
            iters=iters, dim=dim,
        ).localCheckpoint(eager=True)
        enc = pq_encode(
            residuals, codebooks, vec_col="_res", id_col=id_col, m=m, dim=dim
        )
        encoded = (
            residuals.select(id_col, "cell")
            .join(enc, on=id_col)
            .localCheckpoint(eager=True)
        )
        return cls(centroids, codebooks, encoded, m=m, id_col=id_col)

    def search(
        self, query_vec: list[float], *, k: int = 10, nprobe: int = 2,
        scale: int = 6,
    ) -> DataFrame:
        q = [float(x) for x in query_vec]
        q_arr = F.array(*[F.lit(x) for x in q])
        d2 = F.aggregate(
            F.zip_with(F.col("centroid"), q_arr, lambda c, x: (c - x) * (c - x)),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        probed = (
            self.centroids.select("cell", "centroid", d2.alias("_d"))
            .orderBy("_d", "cell")
            .limit(nprobe)
            .collect()
        )
        cb = self.codebooks.collect()
        n_codes = 1 + max(r["code"] for r in cb)
        d_sub = len(cb[0]["centroid"])
        book = {(r["sub"], r["code"]): r["centroid"] for r in cb}
        # per probed cell: the ADC table against the query's residual
        dist_expr = None
        for cr in probed:
            qr = [x - c for x, c in zip(q, cr["centroid"])]
            tbl = _adc_table_expr(
                qr,
                ((sub, code, cen) for (sub, code), cen in book.items()),
                m=self.m,
                n_codes=n_codes,
                d_sub=d_sub,
            )
            branch = _adc_dist(tbl, self.m)
            cond = F.col("cell") == F.lit(cr["cell"])
            dist_expr = (
                F.when(cond, branch)
                if dist_expr is None
                else dist_expr.when(cond, branch)
            )
        cells = [cr["cell"] for cr in probed]
        return (
            self.encoded.filter(F.col("cell").isin(cells))
            .select(
                F.col(self.id_col),
                F.round(dist_expr, scale).alias("approx_dist"),
            )
            .orderBy("approx_dist", self.id_col)
            .limit(k)
        )

    # -- persistence: same durable shape as IvfIndex — codes partitioned
    # by cell so a loaded index's probe prunes parquet partitions.

    def save(self, path: str) -> None:
        path = path.rstrip("/")
        self.centroids.write.mode("overwrite").parquet(f"{path}/centroids")
        self.codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")
        (
            self.encoded.write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{path}/encoded")
        )
        meta = self.centroids.sparkSession.createDataFrame(
            [(self.m, self.id_col)], "m int, id_col string"
        )
        meta.coalesce(1).write.mode("overwrite").json(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "IvfPqIndex":
        path = path.rstrip("/")
        meta = spark.read.json(f"{path}/meta").collect()[0]
        return cls(
            spark.read.parquet(f"{path}/centroids"),
            spark.read.parquet(f"{path}/codebooks"),
            spark.read.parquet(f"{path}/encoded"),
            m=int(meta["m"]),
            id_col=meta["id_col"],
        )


# ------------------------------------------------------ PCA / whitening

def pca_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_components: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """Fit PCA over an embedding column — the standard rotation before
    product quantization / dimensionality reduction (PQ subspaces
    assume roughly isotropic residuals; PCA + optional whitening is
    what makes that assumption true on real embedding sets).

    Scale shape: ONE Arrow mapInPandas pass emits per-batch moment
    partials (n, Σv, flattened Σvvᵀ — numpy outer products, d² floats
    per PARTITION, never per row); the partials (≤ one row per batch,
    driver-bounded like the PQ codebook collect) combine on the
    driver, where the d×d eigendecomposition is O(d³) scalar work.
    The corpus is scanned once; nothing corpus-sized ever leaves the
    executors.

    Sign convention: each component's largest-|coefficient| entry is
    made positive, so the decomposition is deterministic (numpy eigh
    sign ambiguity would otherwise flip runs).

    Output model frame: one row per component — (component int,
    eigval double, explained double, vec array<double>) — plus the
    mean as component = -1 (eigval/explained NULL).
    """
    import numpy as np

    from pyspark.sql import types as T

    rows = df.filter(F.col(vec_col).isNotNull())
    if dim is None:
        probe = rows.select(vec_col).first()
        if probe is None or probe[0] is None:
            raise ValueError(
                "pca_fit: cannot infer dim from an empty frame; "
                "pass dim= explicitly"
            )
        dim = len(probe[0])
    if not (1 <= n_components <= dim):
        raise ValueError(
            f"pca_fit: n_components must be in [1, {dim}], "
            f"got {n_components}"
        )

    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )
    d = dim

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            vecs = np.array(
                [v for v in pdf[vec_col] if v is not None and len(v) == d],
                dtype=np.float64,
            )
            if len(vecs) == 0:
                continue
            yield pd.DataFrame(
                {
                    "n": [len(vecs)],
                    "s": [vecs.sum(axis=0).tolist()],
                    "ss": [(vecs.T @ vecs).ravel().tolist()],
                }
            )

    parts = rows.select(vec_col).mapInPandas(_partials, schema).collect()
    if not parts:
        raise ValueError("pca_fit: no usable vectors")
    n = sum(p["n"] for p in parts)
    s = np.sum([p["s"] for p in parts], axis=0)
    ss = np.sum([p["ss"] for p in parts], axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigval)[::-1][:n_components]
    eigval = np.maximum(eigval[order], 0.0)
    comps = eigvec[:, order].T  # (n_components, d)
    # deterministic sign: largest-|coeff| entry positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    total_var = float(np.trace(cov)) or 1.0
    spark = df.sparkSession
    model_rows = [(-1, None, None, mean.tolist())] + [
        (
            int(i),
            float(eigval[i]),
            float(eigval[i] / total_var),
            comps[i].tolist(),
        )
        for i in range(len(comps))
    ]
    return spark.createDataFrame(
        model_rows,
        "component int, eigval double, explained double, vec array<double>",
    )


def pca_transform(
    df: DataFrame,
    model: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project vectors onto the fitted components (center → rotate →
    optionally scale by 1/√eigval).  The model is collected once
    (≤ dim+1 rows) and inlined as literals, so the projection is pure
    Catalyst: k dot products over the BOUND centered vector — JVM-side
    whole-stage codegen, no Python in the hot path."""
    rows = {r["component"]: r for r in model.collect()}
    if -1 not in rows:
        raise ValueError("pca_transform: model is missing the mean row")
    mean = rows.pop(-1)["vec"]
    comps = [rows[c] for c in sorted(rows)]
    if not comps:
        raise ValueError("pca_transform: model has no components")

    def _proj(centered: Column) -> Column:
        outs = []
        for r in comps:
            w = r["vec"]
            dot = F.aggregate(
                F.zip_with(
                    centered,
                    F.array(*[F.lit(float(x)) for x in w]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            if whiten:
                dot = dot / F.lit(float((r["eigval"] or 0.0) + eps) ** 0.5)
            outs.append(dot)
        return F.array(*outs)

    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(x)) for x in mean]),
        lambda a, b: a - b,
    )
    # bind: the k sibling dot products would re-center the vector once
    # per component (HOF lambdas are opaque to Catalyst CSE)
    return df.withColumn(out_col, _bind(centered, _proj))
