"""End-to-end golden test (SURVEY.md 5.2): a generated ~600-row domain
fixture through build_lookup, compared against an independent DuckDB
implementation of the FDProcBatch.txt runbook SQL."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.plans.lookup import build_lookup

N_CARDS = 40


def _gen_fixture():
    rng = random.Random(42)
    txns = []
    for card in range(1, N_CARDS + 1):
        n = rng.choice([3, 8, 10, 12, 25])  # around the top-10 boundary
        for i in range(n):
            ts = f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d} {rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{i % 60:02d}"
            txns.append(
                dict(
                    card_id=card,
                    member_id=(card - 1) // 2 + 1,
                    amount=round(rng.uniform(5, 500) * (1 + card / 10), 2),
                    postcode=rng.choice([100, 200, 300, 400]),
                    pos_id=rng.randint(1, 10 ** 6),
                    transaction_dt=ts,
                    status=rng.choice(["GENUINE", "GENUINE", "GENUINE", "FRAUDULENT"]),
                )
            )
    members = [
        dict(card_id=c, member_id=(c - 1) // 2 + 1, member_joining_dt="2020-01-01",
             card_purchase_dt="2020-01-02", country="US", city="X")
        for c in range(1, N_CARDS + 1)
    ]
    scores = [
        dict(member_id=m, score=random.Random(m).randint(100, 800))
        for m in range(1, (N_CARDS - 1) // 2 + 2)
    ]
    return pd.DataFrame(txns), pd.DataFrame(members), pd.DataFrame(scores)


ORACLE_SQL = """
WITH ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY card_id
      ORDER BY strptime(transaction_dt, '%Y-%m-%d %H:%M:%S') DESC,
               pos_id DESC, amount DESC) AS rn
  FROM txns WHERE upper(status) = 'GENUINE'),
last_ten AS (SELECT * FROM ranked WHERE rn <= 10),
card_ucl AS (
  SELECT card_id, avg(amount) + 3 * stddev_pop(amount) AS ucl
  FROM last_ten GROUP BY card_id),
card_zip AS (
  SELECT card_id, postcode, transaction_dt FROM last_ten WHERE rn = 1),
card_score AS (
  SELECT m.card_id, s.score FROM members m JOIN scores s USING (member_id))
SELECT cs.card_id, u.ucl, z.postcode, z.transaction_dt, cs.score
FROM card_score cs
JOIN card_ucl u USING (card_id)
JOIN card_zip z USING (card_id)
"""


@pytest.mark.parametrize("seed_note", ["fixed-seed fixture"])
def test_build_lookup_matches_duckdb_runbook(spark, seed_note):
    txns_pd, members_pd, scores_pd = _gen_fixture()
    lookup = build_lookup(
        spark.createDataFrame(txns_pd),
        spark.createDataFrame(members_pd),
        spark.createDataFrame(scores_pd),
    ).toPandas()

    con = duckdb.connect()
    con.register("txns", txns_pd)
    con.register("members", members_pd)
    con.register("scores", scores_pd)
    expected = con.execute(ORACLE_SQL).df()

    got = lookup.sort_values("card_id").reset_index(drop=True)
    exp = expected.sort_values("card_id").reset_index(drop=True)
    # Cards whose rows are all FRAUDULENT drop out (inner join on the
    # genuine-only UCL table) -- in both engines alike.
    assert len(got) == len(exp)
    assert len(got) >= N_CARDS - 3
    assert list(got.card_id) == list(exp.card_id)
    assert list(got.postcode) == list(exp.postcode)
    assert list(got.transaction_dt) == list(exp.transaction_dt)
    assert list(got.score) == list(exp.score)
    assert (got.ucl - exp.ucl).abs().max() < 1e-9
