"""ext211: reciprocity and rich-club re-derivations on planted graphs
(a pure 2-cycle graph has reciprocity 1; a one-way chain 0; a planted
hub clique makes phi(k) rise) plus consistency of the query outputs
with a duckdb recount."""

from __future__ import annotations

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext211 import (
    q_payment_reciprocity,
    q_payment_rich_club,
)


def _recip(edges):
    es = set(edges)
    n = len(es)
    rec = sum(1 for (a, b) in es if (b, a) in es)
    return n, rec


def test_planted_reciprocity():
    n, rec = _recip([(1, 2), (2, 1), (3, 4)])
    assert (n, rec) == (3, 2)
    n, rec = _recip([(1, 2), (2, 3), (3, 1)])  # one-way cycle
    assert rec == 0


def _phi(edges, kmins=(0, 4)):
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for km in kmins:
        club = {v for v, k in deg.items() if k > km}
        e = sum(1 for a, b in edges if a in club and b in club)
        nc = len(club)
        out[km] = None if nc < 2 else 2 * e / (nc * (nc - 1))
    return out


def test_planted_rich_club_rises():
    # hub clique {1,2,3,4,5} fully connected + 20 leaves on node 1
    edges = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    edges += [(1, 100 + i) for i in range(20)]
    phi = _phi(edges, kmins=(0, 3))
    assert phi[3] == 1.0  # only the clique (+hub) survives k>3 -- wait:
    # degrees: hub 1 has 24, nodes 2-5 have 4, leaves 1 -> k>3 keeps
    # {1,2,3,4,5}: the clique, density 1
    assert phi[0] < phi[3]


def test_query_consistency(spark, sf_dir):
    rec = q_payment_reciprocity(spark, sf_dir).toPandas().iloc[0]
    assert 0 <= rec["edge_reciprocity"] <= 1
    assert 0 <= rec["weight_reciprocity"] <= rec["edge_reciprocity"] + 1e-9
    assert rec["n_reciprocated"] <= rec["n_directed_edges"]
    rc = q_payment_rich_club(spark, sf_dir).toPandas().sort_values("k_min")
    assert list(rc["k_min"]) == [0, 4, 8, 12, 16, 20]
    # club sizes shrink with the cutoff; density stays in [0, 1]
    assert (rc["n_nodes"].diff().dropna() <= 0).all()
    ph = rc["phi"].dropna()
    assert ((ph >= 0) & (ph <= 1)).all()
    # duckdb recount of the k>0 club edge total
    con = duckdb.connect()
    und = con.sql(
        f"""WITH pay AS (
          SELECT c.c_nationkey AS na, s.s_nationkey AS nb
          FROM '{sf_dir}/lineitem.parquet' l
          JOIN '{sf_dir}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
          JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = o.o_custkey
          JOIN '{sf_dir}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
          WHERE c.c_nationkey <> s.s_nationkey)
        SELECT CAST(count(*) AS BIGINT) FROM (
          SELECT DISTINCT least(na, nb), greatest(na, nb) FROM pay)"""
    ).fetchone()[0]
    assert int(rc.loc[rc["k_min"] == 0, "n_edges"].iloc[0]) == und
