"""PageRank vs a dense numpy power iteration, including dangling nodes."""

from __future__ import annotations

import numpy as np

from iceberg_rest_server_spark.operators.graph import pagerank


def _numpy_pagerank(n, edge_list, damping=0.85, iters=60):
    M = np.zeros((n, n))
    deg = np.zeros(n)
    for u, v in edge_list:
        deg[u] += 1
    for u, v in edge_list:
        M[v, u] = 1.0 / deg[u]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (M @ r + dangling / n)
    return r


def _check(spark, n, edge_list):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(edges, max_iter=60, tol=1e-12).collect()}
    want = _numpy_pagerank(n, edge_list)
    present = sorted(got)
    assert abs(sum(got.values()) - sum(want[i] for i in present)) < 1e-6
    for i in present:
        assert abs(got[i] - want[i]) < 1e-6, (i, got[i], want[i])


def test_pagerank_cycle_with_tail(spark):
    # 0 -> 1 -> 2 -> 0 cycle plus 3 -> 0 tail; 4 -> 3 chain
    _check(spark, 5, [(0, 1), (1, 2), (2, 0), (3, 0), (4, 3)])


def test_pagerank_dangling_nodes(spark):
    # 2 and 3 have no out-edges: their mass redistributes uniformly
    _check(spark, 4, [(0, 2), (1, 2), (1, 3)])


def test_pagerank_star(spark):
    # hub collects from all spokes
    _check(spark, 6, [(i, 0) for i in range(1, 6)])
