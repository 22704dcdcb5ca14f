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


def test_pagerank_canonicals_match_numpy_argmax(spark):
    """Canonical selection (top-ranked member per component) must agree
    with a dense numpy PageRank + per-component argmax, and the emitted
    invariants (mass conservation, rank floor) must hold."""
    from iceberg_rest_server_spark.operators.graph import pagerank_canonicals

    # two clusters: a path 0-1-2-3 (1 and 2 are central) and a
    # star 10-{11,12,13} (10 is central); undirected pair list
    pair_list = [(0, 1), (1, 2), (2, 3), (10, 11), (10, 12), (10, 13)]
    pairs = spark.createDataFrame(pair_list, "id1 long, id2 long")
    got = {
        r["component"]: (r["canonical_id"], r["canonical_rank"], r["n_members"])
        for r in pagerank_canonicals(pairs, max_iter=60).collect()
    }
    # numpy reference on the symmetrized graph
    ids = sorted({i for p in pair_list for i in p})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    edges = [(idx[u], idx[v]) for u, v in pair_list] + [
        (idx[v], idx[u]) for u, v in pair_list
    ]
    want = _numpy_pagerank(n, edges)
    comp_members = {0: [0, 1, 2, 3], 10: [10, 11, 12, 13]}
    assert set(got) == set(comp_members)
    for comp, members in comp_members.items():
        # argmax with id-ascending tiebreak
        best = min(members, key=lambda m: (-want[idx[m]], m))
        cid, crank, n_members = got[comp]
        assert cid == best, (comp, cid, best)
        assert n_members == len(members)
        assert abs(crank - want[idx[best]]) < 1e-6
        assert crank >= (1 - 0.85) / n
