"""Graph centrality operators vs pure-Python references."""

from hypothesis import HealthCheck, given, settings, strategies as st
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


def _pagerank_w_ref(edges, d=0.85, iters=8):
    """(src, dst, w) reference with weighted contributions."""
    nodes = sorted({x for s, t, _ in edges for x in (s, t)})
    n = len(nodes)
    out = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0.0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in rank.items() if out.get(v, 0.0) == 0.0)
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += rank[s] * w / out[s]
        rank = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n) for v in nodes
        }
    return rank


def test_pagerank_weighted(spark):
    edges = [
        (1, 2, 0.9), (1, 3, 0.1), (2, 3, 1.0), (3, 1, 0.5), (4, 1, 0.2),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, jac double")
    for thresh in (100_000, 0):  # driver and distributed paths
        got = {
            r["id"]: r["rank"]
            for r in graph.pagerank(
                df, weight_col="jac", iterations=8, driver_threshold=thresh
            ).collect()
        }
        exp = _pagerank_w_ref(edges)
        assert set(got) == set(exp)
        for v in exp:
            assert abs(got[v] - exp[v]) < 1e-6, (thresh, v)
    # heavier edge pulls more rank: node 2 (0.9 from 1) beats node 3's
    # teleport-only competitor 4
    assert got[2] > got[4]
    # parallel weighted edges merge by weight sum
    dup = spark.createDataFrame(
        edges + [(1, 2, 0.9)], "src long, dst long, jac double"
    )
    merged = {
        r["id"]: r["rank"]
        for r in graph.pagerank(dup, weight_col="jac", iterations=8).collect()
    }
    exp2 = _pagerank_w_ref([(1, 2, 1.8)] + edges[1:])
    for v in exp2:
        assert abs(merged[v] - exp2[v]) < 1e-6, v


def test_pagerank_property_random_graphs(spark):
    from hypothesis import HealthCheck, given, settings, strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=0, max_value=9),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(edges):
        edges = sorted(set(edges))
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["id"]: r["rank"]
            for r in graph.pagerank(df, iterations=6).collect()
        }
        exp = _pagerank_ref(edges, iters=6)
        assert set(got) == set(exp)
        for v in exp:
            assert abs(got[v] - exp[v]) < 1e-6, v
        assert abs(sum(got.values()) - 1.0) < 1e-4

    check()


def test_triangle_count_and_clustering_reference(spark):
    """Known graph: K4 on {1,2,3,4} plus pendant 5—1 and isolated
    edge 6—7.  Every K4 node sits on 3 triangles; duplicate and
    reversed input edges must not change anything."""
    from sample_dms_s3_kinesis_spark.operators.graph import (
        clustering_coefficients,
        triangle_count,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(5, 1), (6, 7)] + [(2, 1), (3, 1)]  # dups reversed
    df = spark.createDataFrame(edges, "id_a long, id_b long")

    tri = {r["id"]: r["triangles"] for r in triangle_count(df).collect()}
    assert tri == {1: 3, 2: 3, 3: 3, 4: 3}

    cc = {
        r["id"]: (r["degree"], r["triangles"], r["coefficient"])
        for r in clustering_coefficients(df).collect()
    }
    # node 1: degree 4 (K4 + pendant), 3 triangles of possible 6
    assert cc[1] == (4, 3, 0.5)
    assert cc[2] == (3, 3, 1.0) and cc[3] == (3, 3, 1.0)
    assert cc[4] == (3, 3, 1.0)
    assert cc[5] == (1, 0, 0.0)
    assert cc[6] == (1, 0, 0.0) and cc[7] == (1, 0, 0.0)

    # self-loops are dropped
    loop = spark.createDataFrame([(1, 1), (1, 2)], "id_a long, id_b long")
    assert triangle_count(loop).count() == 0


def test_triangle_hub_star_emits_no_wedges(spark):
    """Degree-ordering bound: a star around the MINIMUM id must not
    pay d^2 wedges — with degree-ordered direction every star edge
    points INTO the hub, so the star yields zero wedges and zero
    triangles (id-ordering would have emitted C(d,2) wedges here)."""
    from sample_dms_s3_kinesis_spark.operators.graph import triangle_count

    star = [(0, i) for i in range(1, 40)]
    df = spark.createDataFrame(star, "id_a long, id_b long")
    assert triangle_count(df).count() == 0

    # star + one rim edge closes exactly one triangle
    df2 = spark.createDataFrame(star + [(1, 2)], "id_a long, id_b long")
    tri = {r["id"]: r["triangles"] for r in triangle_count(df2).collect()}
    assert tri == {0: 1, 1: 1, 2: 1}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        max_size=40,
    )
)
def test_triangle_count_matches_bruteforce_on_random_graphs(spark, edges):
    from sample_dms_s3_kinesis_spark.operators.graph import triangle_count

    canon = {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }
    adj: dict = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if b not in adj[a]:
                continue
            for c in nodes:
                if c > b and c in adj[a] and c in adj[b]:
                    for n in (a, b, c):
                        want[n] = want.get(n, 0) + 1
    if not edges:
        return
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    got = {r["id"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == want
