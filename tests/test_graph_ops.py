"""Graph centrality operators vs pure-Python references."""

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import graph


EDGES = [  # directed; 5 is dangling-reachable, 6 isolated-from-in
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 5), (6, 1),
]


def _pagerank_ref(edges, d=0.85, iters=10):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in rank.items() if out.get(v, 0) == 0)
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += rank[s] / out[s]
        rank = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n) for v in nodes
        }
    return rank


def test_pagerank_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["id"]: r["rank"] for r in graph.pagerank(df, iterations=10).collect()}
    exp = _pagerank_ref(EDGES)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-6, v
    # ranks form a distribution
    assert abs(sum(got.values()) - 1.0) < 1e-4
    # same ranking order as the model
    assert max(got, key=got.get) == max(exp, key=exp.get)


def test_pagerank_empty_and_self_loop(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank(empty).count() == 0
    loop = spark.createDataFrame([(1, 1), (1, 2)], "src long, dst long")
    got = {r["id"]: r["rank"] for r in graph.pagerank(loop, iterations=5).collect()}
    exp = _pagerank_ref([(1, 1), (1, 2)], iters=5)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-6


def test_degree_stats(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    got = {r["id"]: r["degree"] for r in graph.degree_stats(pairs).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 1, 5: 1}


def test_pagerank_plan_has_no_python_eval(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    out = graph.pagerank(df, iterations=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pagerank_driver_gate_equals_distributed(spark, caplog):
    """The size gate mirrors connected_components: small graphs run the
    identical power iteration on the driver (logged), the distributed
    loop engages when forced — same values either way."""
    import logging

    df = spark.createDataFrame(EDGES, "src long, dst long")
    with caplog.at_level(
        logging.INFO, logger="sample_dms_s3_kinesis_spark.graph"
    ):
        fast = {
            r["id"]: r["rank"]
            for r in graph.pagerank(df, iterations=6).collect()
        }
    assert any("driver_threshold" in r.message for r in caplog.records)
    dist = {
        r["id"]: r["rank"]
        for r in graph.pagerank(
            df, iterations=6, driver_threshold=0
        ).collect()
    }
    assert set(fast) == set(dist)
    for v in fast:
        assert abs(fast[v] - dist[v]) < 1e-6, v
