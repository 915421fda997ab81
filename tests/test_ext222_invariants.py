"""Invariants for the streaming Elo replay (ext222): the batch cuts
genuinely straddle months (so the deferred-application state is
exercised, not just tested trivially), arbitrary-cut stitch
equivalence on the shared fold, and replay == batch both-path
parity."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext221 import _ELO_INIT
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext222 import (
    _game_feed,
    elo_stitch,
)

_Q = {q.name: q.fn for q in registry()}


def _games(spark, sf_dir):
    return [
        (g["m"], g["i"], g["j"], g["s"])
        for g in _game_feed(spark, sf_dir).orderBy("m", "i", "j").collect()
    ]


def test_batch_cuts_straddle_months(spark, sf_dir):
    """The ntile(4) cuts must land strictly inside months, or the
    deferred-application machinery would never be exercised."""
    feed = _game_feed(spark, sf_dir)
    parts = feed.select(
        "m", F.ntile(4).over(Window.orderBy("m", "i", "j")).alias("pt")
    ).collect()
    by_pt = {}
    for r in parts:
        by_pt.setdefault(r["pt"], set()).add(r["m"])
    straddles = sum(
        1
        for p in (1, 2, 3)
        if by_pt[p] & by_pt[p + 1]  # a month spans the boundary
    )
    assert straddles >= 1


def test_stitch_equals_one_shot_for_any_cut(spark, sf_dir):
    games = _games(spark, sf_dir)
    whole_r, mp, dp = elo_stitch([_ELO_INIT] * 25, None, [0] * 25, games)
    whole = [whole_r[n] + dp[n] for n in range(25)]
    for cut in (1, 7, len(games) // 3, len(games) // 2, len(games) - 1):
        r1, m1, d1 = elo_stitch([_ELO_INIT] * 25, None, [0] * 25, games[:cut])
        r2, m2, d2 = elo_stitch(r1, m1, d1, games[cut:])
        assert [r2[n] + d2[n] for n in range(25)] == whole, f"cut {cut}"


def test_replay_equals_batch_elo(spark, sf_dir):
    batch = sorted(
        map(tuple, _Q["elo_ratings_nations"](spark, sf_dir).collect())
    )
    replay = sorted(
        map(tuple, _Q["streaming_elo_replay"](spark, sf_dir).collect())
    )
    assert batch == replay
    assert len(batch) == 25
