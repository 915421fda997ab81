"""Definition-level checks for the ext17 batch: Mann-Whitney against a
literal per-row rank computation, Cramer's V bounds + chi2 link, HHI
against a pandas share recompute.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext17 import (
    q_cramers_v,
    q_herfindahl_index,
    q_mann_whitney_u,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_mann_whitney_matches_per_row_ranks(spark, sf_dir):
    got = q_mann_whitney_u(spark, sf_dir).toPandas().iloc[0]
    orders = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderpriority", F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"))
        .toPandas()
    )
    sub = orders[orders.o_orderpriority.isin(["1-URGENT", "5-LOW"])].copy()
    sub["rank"] = sub["v"].rank(method="average")  # literal average ranks
    urgent = sub[sub.o_orderpriority == "1-URGENT"]
    n1, n0 = len(urgent), len(sub) - len(urgent)
    r1 = urgent["rank"].sum()
    u = r1 - n1 * (n1 + 1) / 2
    assert (int(got.n_urgent), int(got.n_low)) == (n1, n0)
    assert int(got.u_stat) == math.floor(u)
    n = n1 + n0
    ties = sub.groupby("v").size()
    tie_term = float((ties**3 - ties).sum())
    var_u = n1 * n0 / 12 * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u - n1 * n0 / 2) / math.sqrt(var_u)
    assert math.isclose(float(got.z_score), z, abs_tol=1e-5)


def test_cramers_v_links_to_chi2_and_is_bounded(spark, sf_dir):
    got = q_cramers_v(spark, sf_dir).toPandas().iloc[0]
    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").toPandas()
    obs = pd.crosstab(li["l_returnflag"], li["l_linestatus"])
    n = obs.values.sum()
    expected = (
        obs.sum(axis=1).values[:, None] * obs.sum(axis=0).values[None, :] / n
    )
    mask = obs.values > 0  # the query only materializes observed cells
    chi2 = (((obs.values - expected) ** 2 / expected)[mask]).sum()
    assert math.isclose(float(got.chi2), chi2, abs_tol=1e-4)
    v = math.sqrt(chi2 / (n * min(obs.shape[0] - 1, obs.shape[1] - 1)))
    assert math.isclose(float(got.cramers_v), v, abs_tol=1e-6)
    assert 0 <= float(got.cramers_v) <= 1


def test_hhi_matches_share_recompute_and_floor(spark, sf_dir):
    got = q_herfindahl_index(spark, sf_dir).toPandas().set_index("market")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"))
        .toPandas()
    )
    for key, market in [("l_partkey", "parts_overall"), ("l_suppkey", "suppliers_overall")]:
        rev = li.groupby(key)["cents"].sum()
        shares = rev / rev.sum()
        hhi = float((shares**2).sum() * 10000)
        assert int(got.loc[market, "n_units"]) == len(rev)
        assert math.isclose(float(got.loc[market, "hhi"]), hhi, abs_tol=1e-4)
        # HHI can never sit below the uniform-market floor
        assert float(got.loc[market, "hhi"]) >= float(got.loc[market, "hhi_if_uniform"]) - 1e-9
