"""Full-text retrieval over the corpus: boolean search, phrase search,
and BM25 ranking — the read side of the curation stack (SURVEY §2.8's
scalar surface generalized to an inverted-index workload).

Scale shapes — everything is posting-list algebra on (token, doc)
frames, never a scan-per-query:

- ``boolean_search``: explode distinct tokens per doc ONCE, filter to
  the query's terms (predicate pushes to the scan when the posting
  frame is a stored table), and a conjunctive match is a groupBy(doc)
  HAVING count = n_terms — the posting-list intersection as one
  map-side-combined aggregate.
- ``phrase_search``: positional postings (token, doc, pos); a phrase
  match anchors on the first term and checks successors with a
  grouped ANY over shifted positions — no self-join chain per term
  pair (k-term phrase = one explode + one aggregate, not k-1 joins).
- ``bm25_search``: document frequencies and lengths are tiny
  aggregate frames broadcast back onto the matched postings; the
  score is a per-(doc, term) expression summed per doc.  The
  few-term float sum is the only cross-engine nondeterminism and is
  rounded away at 4 decimals.

At 100 TB the posting frame is the thing you persist (bucketed by
token); these operators then read postings, not text.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.partitioning import spread
from sample_dms_s3_kinesis_spark.operators.text import tokens


def postings(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional posting frame: (id, token, pos), lowercased, one row
    per token OCCURRENCE.  The persistable inverted-index form."""
    return spread(df).select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "token"),
    ).filter(F.col("token") != "")


def boolean_search(
    df: DataFrame,
    terms: Sequence[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive (AND) boolean retrieval: documents containing every
    term.  Output: (id_col) — one row per matching doc.  Terms are
    deduplicated first: ['spark', 'spark'] means the one-term query,
    not an unsatisfiable two-distinct-token count.  One seam: this is
    :func:`boolean_search_postings` over a freshly exploded posting
    frame, so the conjunctive-match semantics cannot diverge between
    the ad-hoc and stored-index entry points."""
    return boolean_search_postings(
        postings(df, text_col=text_col, id_col=id_col),
        terms,
        id_col=id_col,
    )


def phrase_search(
    df: DataFrame,
    phrase: Sequence[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact consecutive-phrase retrieval: documents where the tokens
    of ``phrase`` appear adjacently in order.  One explode + one
    aggregate: anchor positions of term 0 must see term i at pos+i for
    every i — checked with a per-doc aggregate over (term-index,
    shifted-anchor) pairs, no join chain.  Output: (id_col,
    n_occurrences)."""
    want = [t.lower() for t in phrase]
    if not want:
        raise ValueError("phrase must contain at least one term")
    k = len(want)
    p = postings(df, text_col=text_col, id_col=id_col)
    hits = None
    for i, term in enumerate(want):
        h = p.filter(F.col("token") == term).select(
            id_col, (F.col("pos") - i).alias("_anchor"), F.lit(i).alias("_i")
        )
        hits = h if hits is None else hits.unionByName(h)
    return (
        hits.distinct()
        .groupBy(id_col, "_anchor")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == k)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )


def bm25_search(
    df: DataFrame,
    terms: Sequence[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    scale: int = 4,
) -> DataFrame:
    """BM25-ranked retrieval (Lucene idf variant:
    ln(1 + (N - df + 0.5)/(df + 0.5))).  Corpus stats (N, avg doc
    length, per-term document frequency) are tiny aggregates fetched
    in ONE driver action (a union of the corpus-total row with the
    per-term rows — one job, not two serialized ones) and broadcast
    as literals onto the per-(doc, term) frequency frame;
    TakeOrderedAndProject finishes.  An empty corpus — or one whose
    docs all tokenize to nothing — returns an empty (id_col, score)
    frame instead of dividing by zero.  Output: (id_col, score)
    descending, ties on id."""
    want = sorted({t.lower() for t in terms})
    p = postings(df, text_col=text_col, id_col=id_col)
    doclen = p.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    tf = (
        p.filter(F.col("token").isin(want))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    stat_rows = (
        doclen.agg(
            F.count(F.lit(1)).cast("long").alias("_a"),
            F.coalesce(F.sum("_dl"), F.lit(0)).cast("long").alias("_b"),
        )
        .select(F.lit(None).cast("string").alias("token"), "_a", "_b")
        .unionByName(
            tf.groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias("_a"))
            .select("token", "_a", F.lit(0).cast("long").alias("_b"))
        )
        .collect()
    )
    n_docs, tot_len, dfreq = 0, 0, {}
    for r in stat_rows:
        if r["token"] is None:
            n_docs, tot_len = int(r["_a"]), int(r["_b"])
        else:
            dfreq[r["token"]] = int(r["_a"])
    if n_docs == 0:
        return df.select(
            F.col(id_col), F.lit(0.0).alias("score")
        ).filter(F.lit(False))
    avg_len = float(tot_len) / float(n_docs)
    idf_expr = None
    for term in sorted(want):
        d = dfreq.get(term, 0)
        idf = math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))
        clause = F.col("token") == term
        idf_expr = (
            F.when(clause, F.lit(idf))
            if idf_expr is None
            else idf_expr.when(clause, F.lit(idf))
        )
    scored = tf.join(doclen, on=id_col).select(
        id_col,
        (
            idf_expr
            * (F.col("_tf").cast("double") * (k1 + 1.0))
            / (
                F.col("_tf").cast("double")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("_dl").cast("double") / F.lit(avg_len)
                )
            )
        ).alias("_s"),
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("_s"), scale).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(topk)
    )


def rrf_fuse(
    ranked: Sequence[DataFrame],
    *,
    id_col: str = "doc_id",
    rrf_k: int = 60,
    topk: int = 10,
    scale: int = 6,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009) over any
    number of ranked channels: ``rrf(d) = Σ_c 1/(rrf_k + rank_c(d))``,
    summing only over channels that returned ``d``.

    Each input frame must be ``(id_col, rank)`` with 1-based integer
    ranks.  Channel frames are top-``pool``-bounded by construction
    (the retrieval step already cut them), so the fusion join is a
    few-KB full-outer chain — never corpus-sized; at 100 TB the corpus
    cost lives entirely inside the per-channel retrievers.  Ranks come
    back as DOUBLE (a missing channel is NULL, and nullable ints decay
    to float in every Arrow/pandas sink — declaring double keeps the
    cross-engine rendering identical).  Output:
    ``(id_col, rank_1..rank_n, rrf_score)`` descending, ties on id."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked channel")
    fused = None
    for i, ch in enumerate(ranked, start=1):
        ch = ch.select(
            F.col(id_col),
            F.col("rank").cast("double").alias(f"rank_{i}"),
        )
        fused = ch if fused is None else fused.join(
            ch, on=id_col, how="full_outer"
        )
    score = None
    for i in range(1, len(ranked) + 1):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(f"rank_{i}")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    return (
        fused.withColumn("rrf_score", F.round(score, scale))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(topk)
    )


def hybrid_rrf_search(
    docs: DataFrame,
    emb: DataFrame,
    terms: Sequence[str],
    query_vec: list[float],
    *,
    k: int = 10,
    pool: int = 50,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid retrieval: BM25 lexical channel + exact-cosine dense
    channel, fused with Reciprocal Rank Fusion — the standard RAG
    two-tower read path (lexical recall for rare literals, dense recall
    for paraphrase) without any score normalization between the two
    incomparable score scales.

    Each channel retrieves its own top-``pool`` (both finish as
    TakeOrderedAndProject — per-partition top-k then a tiny merge, no
    global sort of the corpus), ranks are assigned by a window over the
    ≤``pool``-row channel result (bounded, never corpus-wide), and
    :func:`rrf_fuse` joins the two tiny rank frames.  Ties inside a
    channel break on the channel's rounded score then id, so both
    engines replay identical ranks.  Output:
    ``(id_col, rank_1 [lexical], rank_2 [dense], rrf_score)``."""
    from pyspark.sql import Window

    from sample_dms_s3_kinesis_spark.operators.similarity import (
        brute_force_topk,
    )

    lex = bm25_search(
        docs, terms, text_col=text_col, id_col=id_col, topk=pool
    ).select(
        id_col,
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc(id_col)))
        .alias("rank"),
    )
    dense = brute_force_topk(
        emb, query_vec, k=pool, vec_col=vec_col, id_col=vec_id_col
    ).select(
        F.col(vec_id_col).alias(id_col),
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), F.asc(vec_id_col)))
        .alias("rank"),
    )
    return rrf_fuse([lex, dense], id_col=id_col, rrf_k=rrf_k, topk=k)


def boolean_search_postings(
    p: DataFrame,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    exclude: Sequence[str] = (),
) -> DataFrame:
    """Boolean retrieval directly over a posting frame (the stored
    form — see :class:`PostingsIndex`): AND of ``terms`` minus docs
    containing any ``exclude`` term (AND-NOT as a digest anti-join).
    Output: (id_col).  Terms are deduplicated before the distinct-token
    count so repeated terms cannot raise the match threshold."""
    want = sorted({t.lower() for t in terms})
    hit = (
        p.filter(F.col("token").isin(want))
        .select(id_col, "token")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == len(want))
        .select(id_col)
    )
    if not exclude:
        return hit
    bad = (
        p.filter(F.col("token").isin([t.lower() for t in exclude]))
        .select(id_col)
        .distinct()
    )
    return hit.join(bad, on=id_col, how="left_anti")


class PostingsIndex:
    """Persisted inverted index: the positional posting frame written
    as a parquet directory PARTITIONED BY a token hash-prefix bucket,
    so a loaded query's term filter prunes storage partitions instead
    of scanning every posting (the same durable-index shape as
    MinhashIndex/SimhashIndex/IvfIndex/IvfPqIndex — build the corpus
    pass once, serve every query from the stored copy).  A raw
    ``partitionBy(token)`` would create one directory per distinct
    token (millions of tiny files); the 256-way hash-prefix bucket
    keeps file counts bounded while still pruning ~255/256 of the
    postings per term."""

    BUCKETS = 256

    def __init__(self, frame: DataFrame, *, id_col: str):
        self.frame = frame
        self.id_col = id_col

    @staticmethod
    def _bucket(col):
        return F.pmod(F.xxhash64(col), F.lit(PostingsIndex.BUCKETS)).cast(
            "int"
        )

    @classmethod
    def build(
        cls,
        df: DataFrame,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "PostingsIndex":
        p = postings(df, text_col=text_col, id_col=id_col).withColumn(
            "_tb", cls._bucket(F.col("token"))
        )
        return cls(p, id_col=id_col)

    def save(self, path: str) -> None:
        path = path.rstrip("/")
        self.frame.write.mode("overwrite").partitionBy("_tb").parquet(
            f"{path}/postings"
        )
        meta = self.frame.sparkSession.createDataFrame(
            [(self.id_col,)], "id_col string"
        )
        meta.coalesce(1).write.mode("overwrite").json(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "PostingsIndex":
        path = path.rstrip("/")
        meta = spark.read.json(f"{path}/meta").collect()[0]
        return cls(
            spark.read.parquet(f"{path}/postings"), id_col=meta["id_col"]
        )

    def search(
        self, terms: Sequence[str], *, exclude: Sequence[str] = ()
    ) -> DataFrame:
        """Conjunctive search served from stored postings: the term
        filter carries the bucket predicate (`_tb IN (...)`) so parquet
        partition pruning bounds the read."""
        all_terms = [t.lower() for t in list(terms) + list(exclude)]
        buckets = sorted(
            {
                r["_b"]
                for r in self.frame.sparkSession.createDataFrame(
                    [(t,) for t in all_terms], "t string"
                )
                .select(self._bucket(F.col("t")).alias("_b"))
                .collect()
            }
        )
        pruned = self.frame.filter(F.col("_tb").isin(buckets))
        return boolean_search_postings(
            pruned, terms, id_col=self.id_col, exclude=exclude
        )


def ranking_metrics_report(
    run: DataFrame,
    qrels: DataFrame,
    *,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    scale: int = 6,
) -> DataFrame:
    """Per-query ranking quality for a retrieval run: nDCG@k (graded,
    exponential gain, log2 position discount), MRR@k (reciprocal rank
    of the first relevant hit), AP@k (average precision: mean of
    precision-at-rank over relevant hits, normalized by min(n_rel, k))
    and Recall@k (relevant retrieved / relevant total) — the standard
    TREC-style eval set, closing the loop on the BM25/RRF read side.

    ``run``: (query_col, doc_col, rank_col) with rank 1-based within
    each query.  ``qrels``: (query_col, doc_col, rel_col) integer
    grades >= 0; pairs absent from qrels count as grade 0.  Queries
    with no relevant documents are dropped from the report (IDCG and
    recall are undefined for them — trec_eval semantics); a query with
    relevant documents but an empty/missing run row scores 0.

    Shapes: one left join of the rank-filtered run against qrels, one
    window over qrels for the ideal ordering (deterministic tie-break
    on doc id), two grouped aggregates joined per query — every
    aggregate is map-side combinable and the frames after the top-k
    filter are k-bounded per query.  Output: (query_col, ndcg, mrr,
    ap, recall), rounded to ``scale`` (the log2/division float is the
    only cross-engine nondeterminism; integer gains and counts are
    exact).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    q, d, r, g = query_col, doc_col, rank_col, rel_col
    topk = run.filter(F.col(r) <= k)
    hits = topk.join(
        qrels.select(q, d, g), [q, d], "left"
    ).withColumn("_g", F.coalesce(F.col(g), F.lit(0)))
    # precision@rank needs the cumulative relevant count in rank
    # order — one window over the k-bounded hits
    cum_w = (
        Window.partitionBy(q)
        .orderBy(F.col(r).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hits = hits.withColumn(
        "_cum_rel", F.sum((F.col("_g") > 0).cast("int")).over(cum_w)
    )
    per_q = hits.groupBy(q).agg(
        F.sum(
            (F.pow(F.lit(2.0), F.col("_g")) - 1.0)
            / F.log2(F.col(r).cast("double") + 1.0)
        ).alias("_dcg"),
        F.min(
            F.when(F.col("_g") > 0, F.col(r))
        ).alias("_first_rel"),
        F.count(F.when(F.col("_g") > 0, F.lit(1))).alias("_n_hit"),
        F.sum(
            F.when(
                F.col("_g") > 0,
                F.col("_cum_rel").cast("double") / F.col(r).cast("double"),
            )
        ).alias("_ap_num"),
    )
    w = Window.partitionBy(q).orderBy(
        F.col(g).desc(), F.col(d).asc()
    )
    ideal = (
        qrels.filter(F.col(g) > 0)
        .withColumn("_irk", F.row_number().over(w))
        .groupBy(q)
        .agg(
            F.sum(
                F.when(
                    F.col("_irk") <= k,
                    (F.pow(F.lit(2.0), F.col(g)) - 1.0)
                    / F.log2(F.col("_irk").cast("double") + 1.0),
                )
            ).alias("_idcg"),
            F.count(F.lit(1)).alias("_n_rel"),
        )
    )
    return (
        ideal.join(per_q, q, "left")
        .select(
            q,
            F.round(
                F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.col("_idcg"),
                scale,
            ).alias("ndcg"),
            F.round(
                F.coalesce(
                    1.0 / F.col("_first_rel").cast("double"), F.lit(0.0)
                ),
                scale,
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("_ap_num"), F.lit(0.0))
                / F.least(F.col("_n_rel"), F.lit(k)).cast("double"),
                scale,
            ).alias("ap"),
            F.round(
                F.coalesce(F.col("_n_hit"), F.lit(0)).cast("double")
                / F.col("_n_rel").cast("double"),
                scale,
            ).alias("recall"),
        )
    )
