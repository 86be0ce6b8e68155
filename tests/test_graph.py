"""Tests for operators/graph.py (pagerank; closure tests live in
test_warehouse.py)."""


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from spark_relieffc_fselection_spark.operators.graph import pagerank

    # small deterministic digraph incl. a dangling node (4) and an
    # off-node edge target (9 -> dropped)
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 9)]
    nodes = list(range(5))
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    got = {
        r.node: r.rank
        for r in pagerank(e, n, n_iter=4, damping=0.85).collect()
    }

    N, d = len(nodes), 0.85
    outdeg = {0: 2, 1: 1, 2: 1, 3: 2}
    rank = {x: 1.0 / N for x in nodes}
    for _ in range(4):
        contrib = {x: 0.0 for x in nodes}
        for s, t in edges:
            if t in contrib:
                contrib[t] += rank[s] / outdeg[s]
        rank = {x: (1 - d) / N + d * contrib[x] for x in nodes}
    for x in nodes:
        assert abs(got[x] - rank[x]) < 1e-12, (x, got[x], rank[x])
    # dangling node 4 holds only teleport mass
    assert abs(got[4] - (1 - d) / N) < 1e-15
