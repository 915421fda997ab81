"""Definition-level checks for ext98: literal Neyman weights, a
python Aalen-Johansen, and a literal PPS selection scan."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext98 import (
    _CIF_DAYS,
    _MUS_POINTS,
    _NEYMAN_BUDGET,
    q_competing_risks_cif,
    q_monetary_unit_sampling,
    q_neyman_allocation,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_neyman_definition(spark, sf_dir):
    rows = q_neyman_allocation(spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["v"] = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5).astype("int64") // 100
    ws = {}
    for g, grp in j.groupby("c_nationkey"):
        x = grp.v.to_numpy().astype("float64")
        ws[g] = (len(x), x.std(ddof=0), len(x) * x.std(ddof=0))
    wtot = sum(w for _, _, w in ws.values())
    assert len(rows) == len(ws)
    for r in rows:
        nh, sh, w = ws[r["nationkey"]]
        assert r["stratum_orders"] == nh
        assert abs(r["stratum_sd_dollars"] - sh) < 0.02
        assert abs(r["alloc_share"] - w / wtot) < 1e-4
        assert abs(r["n_alloc"] - round(_NEYMAN_BUDGET * w / wtot)) <= 1
    # shares sum to ~1 and allocations to ~budget
    assert abs(sum(r["alloc_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["n_alloc"] for r in rows) - _NEYMAN_BUDGET) <= len(rows)


def test_competing_risks_definition(spark, sf_dir):
    rows = {r["day"]: r for r in q_competing_risks_cif(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).toPandas()
    ev["d"] = pd.to_datetime(ev.ts).dt.date
    recs = []
    for uid, grp in ev.groupby("user_id"):
        t0 = grp.d.min()
        tp = grp[grp.event_type == "purchase"].d.min()
        te = grp[grp.event_type == "error"].d.min()
        if pd.notna(tp) and (pd.isna(te) or tp <= te):
            recs.append(((tp - t0).days, "p"))
        elif pd.notna(te):
            recs.append(((te - t0).days, "e"))
        else:
            recs.append((None, None))
    n = len(recs)
    events = sorted({t for t, c in recs if t is not None})
    surv = 1.0
    at_risk = n
    cifp = cife = 0.0
    curve = {}
    for t in events:
        dp = sum(1 for tt, c in recs if tt == t and c == "p")
        de = sum(1 for tt, c in recs if tt == t and c == "e")
        cifp += surv * dp / at_risk
        cife += surv * de / at_risk
        curve[t] = (cifp, cife)
        surv *= 1 - (dp + de) / at_risk
        at_risk -= dp + de
    assert sorted(rows) == sorted(_CIF_DAYS)
    for d in _CIF_DAYS:
        last = max(t for t in events if t <= d)
        cp, ce = curve[last]
        assert abs(rows[d]["cif_purchase"] - cp) < 1e-4
        assert abs(rows[d]["cif_error"] - ce) < 1e-4
    # CIFs are monotone and jointly bounded by 1
    for d1, d2 in zip(_CIF_DAYS, _CIF_DAYS[1:]):
        assert rows[d1]["cif_purchase"] <= rows[d2]["cif_purchase"] + 1e-9
        assert rows[d1]["cif_error"] <= rows[d2]["cif_error"] + 1e-9
    assert rows[_CIF_DAYS[-1]]["cif_purchase"] + rows[_CIF_DAYS[-1]][
        "cif_error"
    ] <= 1.0 + 1e-6


def test_mus_definition(spark, sf_dir):
    row = q_monetary_unit_sampling(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).toPandas()
    o = o.sort_values("o_orderkey")
    v = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    cum = np.cumsum(v)
    total = int(cum[-1])
    interval = total // _MUS_POINTS
    pts = [j * interval for j in range(1, _MUS_POINTS + 1)]
    prev = np.concatenate(([0], cum[:-1]))
    hits = {}
    for p in pts:
        i = int(np.searchsorted(cum, p, side="left"))
        assert prev[i] < p <= cum[i]
        hits[i] = hits.get(i, 0) + 1
    assert row["n_sampling_points"] == _MUS_POINTS
    assert row["n_selected_orders"] == len(hits)
    assert row["n_certainty_multihit"] == sum(1 for c in hits.values() if c > 1)
    sel_v = sum(int(v[i]) for i in hits)
    assert abs(row["value_coverage"] - sel_v / total) < 1e-6
    assert row["largest_selected_dollars"] == round(max(v[i] for i in hits) / 100, 2)
    # every order larger than the interval is selected with certainty
    for i in np.nonzero(v > interval)[0]:
        assert i in hits
