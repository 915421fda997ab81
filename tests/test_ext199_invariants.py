"""ext199: chain-ladder re-derivations -- a plain pandas chain-ladder
built independently from the raw parquet must reproduce the queries'
factors (round 6) and ultimates (exact BIGINT), plus the method laws:
nondecreasing cumulatives make every factor >= 1, ultimates develop
upward from the latest diagonal, the fully-developed origin carries
zero reserve, and BF ultimates sit on the CL development pattern."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext199 import (
    _DEVS,
    _ORIGINS,
    q_bornhuetter_ferguson_reserves,
    q_chain_ladder_factors,
    q_chain_ladder_ultimates,
)


def _py_triangle(sf_dir: str):
    con = duckdb.connect()
    tri = con.sql(
        f"""
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS origin,
               least(greatest(CAST(year(l.l_shipdate) AS BIGINT)
                              - CAST(year(o.o_orderdate) AS BIGINT), 0),
                     {_DEVS}) AS dev,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
        """
    ).df()
    vy = int((tri["origin"] + tri["dev"]).max())
    tri = tri[
        (tri["origin"] >= vy - (_ORIGINS - 1))
        & (tri["origin"] + tri["dev"] <= vy)
    ]
    cum = {}
    for origin, grp in tri.groupby("origin"):
        running = 0
        for _, row in grp.sort_values("dev").iterrows():
            running += int(row["cents"])
            cum[(int(origin), int(row["dev"]))] = running
    return cum, vy


def _py_factors(cum):
    f = {}
    for j in range(_DEVS):
        sn = sd = 0
        for (origin, dev), c in cum.items():
            if dev == j and (origin, j + 1) in cum:
                sd += c
                sn += cum[(origin, j + 1)]
        if sd:
            f[j] = (sn, sd)
    return f


def test_factors_match_python(spark, sf_dir):
    cum, _ = _py_triangle(sf_dir)
    f = _py_factors(cum)
    pdf = q_chain_ladder_factors(spark, sf_dir).toPandas()
    got = {int(r["dev_from"]): r for _, r in pdf.iterrows()}
    assert set(got) == set(f)
    for j, (sn, sd) in f.items():
        assert int(got[j]["sum_next_cents"]) == sn
        assert int(got[j]["sum_cur_cents"]) == sd
        assert got[j]["dev_factor"] == round(sn / sd, 6)
        assert got[j]["dev_factor"] >= 1.0  # cumulatives nondecreasing


def test_ultimates_match_python_and_laws(spark, sf_dir):
    cum, vy = _py_triangle(sf_dir)
    f = {j: sn / sd for j, (sn, sd) in _py_factors(cum).items()}
    pdf = q_chain_ladder_ultimates(spark, sf_dir).toPandas()
    assert len(pdf) <= _ORIGINS
    for _, row in pdf.iterrows():
        origin, age = int(row["origin"]), int(row["age"])
        assert age == vy - origin
        latest = max(
            c for (o, _d), c in cum.items() if o == origin
        )
        assert int(row["latest_cents"]) == latest
        # replicate the shared left-assoc product exactly
        if age >= _DEVS:
            cdf = 1.0
        else:
            cdf = f[age]
            for k in range(age + 1, _DEVS):
                cdf = cdf * f[k]
        ult = int(math.floor(latest * cdf))
        assert int(row["ultimate_cents"]) == ult
        assert int(row["reserve_cents"]) == ult - latest
        assert int(row["ultimate_cents"]) >= latest  # factors >= 1
    # the fully-developed origin (age = _DEVS) has zero reserve
    full = pdf[pdf["age"] >= _DEVS]
    assert (full["reserve_cents"] == 0).all()
    assert len(full) >= 1


def test_bf_sits_on_cl_pattern(spark, sf_dir):
    cl = q_chain_ladder_ultimates(spark, sf_dir).toPandas().set_index("origin")
    bf = (
        q_bornhuetter_ferguson_reserves(spark, sf_dir)
        .toPandas()
        .set_index("origin")
    )
    assert set(bf.index) == set(cl.index)
    for origin in bf.index:
        # BF ultimate >= latest (the unreported share 1 - 1/CDF >= 0)
        assert bf.loc[origin, "bf_ultimate_cents"] >= bf.loc[
            origin, "latest_cents"
        ]
        # mature origin: CDF = 1 -> BF ultimate == latest exactly
        if cl.loc[origin, "age"] >= _DEVS:
            assert (
                bf.loc[origin, "bf_ultimate_cents"]
                == bf.loc[origin, "latest_cents"]
            )
    # BF uses the same latest diagonal as CL
    assert (bf["latest_cents"] == cl["latest_cents"]).all()
