"""ext200: exact graph-algorithm re-derivations on planted graphs --
path/star betweenness closed forms, eccentricity on a path, Prim on a
known weighted graph -- plus structural laws on the real payment
backbone (MST spans with n-1 edges; per-pair betweenness contributions
sum to (d-1)*1e9 up to the documented per-term truncation)."""

from __future__ import annotations

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext200 import (
    _bfs_all_pairs,
    _collect_graph,
    q_betweenness_brandes_nations,
    q_graph_eccentricity_nations,
    q_payment_backbone_mst,
)

_Q = 1000000000


def _adj_of(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for k in adj:
        adj[k].sort()
    return sorted(adj), adj


def _bc_quantized(nodes, adj):
    dist, sig = _bfs_all_pairs(nodes, adj)
    bc = {v: 0 for v in nodes}
    for (s, t), dst in dist.items():
        for v in nodes:
            if v in (s, t):
                continue
            dsv, dvt = dist.get((s, v)), dist.get((v, t))
            if dsv is None or dvt is None or dsv + dvt != dst:
                continue
            bc[v] += (_Q * sig[(s, v)] * sig[(v, t)]) // sig[(s, t)]
    return bc, dist, sig


def test_path_graph_betweenness_closed_form():
    nodes, adj = _adj_of([(1, 2), (2, 3), (3, 4), (4, 5)])
    bc, dist, sig = _bc_quantized(nodes, adj)
    # unique shortest paths: bc(v) = ordered pairs strictly crossing v
    assert bc[1] == 0 and bc[5] == 0
    assert bc[2] == 6 * _Q  # {1}x{3,4,5} both directions
    assert bc[3] == 8 * _Q  # {1,2}x{4,5} both directions
    assert bc[4] == 6 * _Q
    assert dist[(1, 5)] == 4 and sig[(1, 5)] == 1


def test_star_graph_betweenness_center():
    n = 7
    nodes, adj = _adj_of([(0, i) for i in range(1, n)])
    bc, _, _ = _bc_quantized(nodes, adj)
    assert bc[0] == (n - 1) * (n - 2) * _Q
    assert all(bc[i] == 0 for i in range(1, n))


def test_diamond_graph_split_paths():
    # 1-2-4 and 1-3-4: two shortest paths, each mid node carries half
    nodes, adj = _adj_of([(1, 2), (1, 3), (2, 4), (3, 4)])
    bc, dist, sig = _bc_quantized(nodes, adj)
    assert sig[(1, 4)] == 2 and dist[(1, 4)] == 2
    assert bc[2] == bc[3] == 2 * (_Q // 2)  # both directions, half each
    assert bc[1] == bc[4] == 2 * (_Q // 2)  # carry (2,3)/(3,2)


def test_eccentricity_on_path():
    nodes, adj = _adj_of([(1, 2), (2, 3), (3, 4), (4, 5)])
    dist, _ = _bfs_all_pairs(nodes, adj)
    ecc = {}
    for (s, _t), d in dist.items():
        ecc[s] = max(ecc.get(s, 0), d)
    assert ecc == {1: 4, 2: 3, 3: 2, 4: 3, 5: 4}


def test_betweenness_pair_sum_law(spark, sf_dir):
    # per pair: interior contributions sum to (d-1)*1e9 minus at most
    # one unit per interior term (integer truncation)
    nodes, adj, _w = _collect_graph(spark, sf_dir)
    dist, sig = _bfs_all_pairs(nodes, adj)
    for (s, t), dst in list(dist.items())[:200]:
        total, terms = 0, 0
        for v in nodes:
            if v in (s, t):
                continue
            dsv, dvt = dist.get((s, v)), dist.get((v, t))
            if dsv is None or dvt is None or dsv + dvt != dst:
                continue
            total += (_Q * sig[(s, v)] * sig[(v, t)]) // sig[(s, t)]
            terms += 1
        exact = (dst - 1) * _Q
        assert exact - terms <= total <= exact


def test_mst_spans_and_is_greedy_maximal(spark, sf_dir):
    nodes, _adj, wedges = _collect_graph(spark, sf_dir)
    pdf = q_payment_backbone_mst(spark, sf_dir).toPandas()
    assert len(pdf) == len(nodes) - 1  # spanning (graph is connected)
    # Prim order: every edge connects exactly one NEW node to the tree
    seen = {min(nodes)}
    for _, r in pdf.sort_values("step").iterrows():
        a, b = int(r["node_a"]), int(r["node_b"])
        assert (a in seen) != (b in seen)
        seen.update((a, b))
    assert seen == set(nodes)
    # cut property: every chosen edge was the max-weight edge leaving
    # the visited set at its step (replay)
    vis = {min(nodes)}
    for _, r in pdf.sort_values("step").iterrows():
        best = max(
            (w, -a, -b)
            for (a, b), w in wedges.items()
            if a in vis and b not in vis
        )
        assert int(r["weight"]) == best[0]
        new = int(r["node_b"]) if int(r["node_a"]) in vis else int(r["node_a"])
        vis.add(new)


def test_query_outputs_consistent(spark, sf_dir):
    bc = q_betweenness_brandes_nations(spark, sf_dir).toPandas()
    ecc = q_graph_eccentricity_nations(spark, sf_dir).toPandas()
    assert len(bc) == len(ecc) == 25
    assert (bc["bc_q"] >= 0).all()
    assert ecc["diameter"].nunique() == 1
    assert int(ecc["diameter"].iloc[0]) == int(ecc["ecc"].max())
    assert int(ecc["radius"].iloc[0]) == int(ecc["ecc"].min())
    assert (ecc.loc[ecc["is_center"] == 1, "ecc"] == ecc["radius"].iloc[0]).all()
