"""Physical-plan regression tests: the scale properties (pushdown,
broadcast joins, window-limit, exchange counts) asserted so a refactor
cannot silently trade them away."""

from __future__ import annotations

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import (
    q_filter_project,
    q_revenue_by_nation,
    q_ucl_grouped,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext import q_sessionize


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ucl_grouped_single_shuffle_with_window_limit(spark, sf_dir):
    plan = _plan(q_ucl_grouped(spark, sf_dir))
    # top-10 pushed into the window operator (no full per-group sort)
    assert "WindowGroupLimit" in plan
    # window and groupBy share one hash exchange on the same key
    assert plan.count("Exchange hashpartitioning") == 1
    # status filter reached the parquet scan
    assert "EqualTo(o_orderstatus,F)" in plan


def test_filter_project_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(q_filter_project(spark, sf_dir))
    # (plan strings truncate PushedFilters with '...'; the Filter node
    # carries the full predicate)
    assert "= R)" in plan and "l_shipdate" in plan
    # column pruning: only the 5 needed columns reach the scan
    assert "l_quantity" not in plan and "l_tax" not in plan


def test_revenue_join_tree_is_all_broadcast(spark, sf_dir):
    plan = _plan(q_revenue_by_nation(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    # the only hash exchange is the final aggregation
    assert plan.count("Exchange hashpartitioning") <= 1


def test_q10_dims_broadcast_facts_pushed(spark, sf_dir):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_tpch2 import q10_returned_items

    plan = _plan(q10_returned_items(spark, sf_dir))
    # nation is broadcast; returnflag/orderdate filters reach the scans
    assert "BroadcastHashJoin" in plan
    assert "l_returnflag" in plan and "o_orderdate" in plan
    # top-20 by revenue runs as TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_q21_semi_anti_join_chain(spark, sf_dir):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_tpch2 import q21_latest_shipper

    plan = _plan(q21_latest_shipper(spark, sf_dir))
    # EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti, both as JOINs (no
    # per-row subquery execution anywhere)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan


def test_simhash_no_bit_explode(spark, sf_dir):
    """The 60x (token,bit) explode must never come back: exactly ONE
    Generate (the token explode) in the simhash plan."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

    q = {x.name: x for x in registry()}["simhash_docs"]
    plan = _plan(q.fn(spark, sf_dir))
    assert plan.count("Generate explode") == 1


def test_sessionize_single_shuffle(spark, sf_dir):
    plan = _plan(q_sessionize(spark, sf_dir))
    # lag window, running sum, and the session groupBy all partition by
    # user_id -- one exchange total... plus the final agg keyed by
    # (user_id, session_id), which cannot reuse the user_id-only
    # partitioning. 2 is the floor; >2 means a regression.
    assert plan.count("Exchange hashpartitioning") <= 2


def test_join_strategy_hints_take_effect(spark, sf_dir):
    """The engine exposes Catalyst's join-strategy control surface:
    hints must override the planner's default choice (the escape hatch
    when statistics mislead it at 100 TB)."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # default: small dim -> broadcast
    default = plan_of(orders.join(cust, orders.o_custkey == cust.c_custkey))
    assert "BroadcastHashJoin" in default

    merged = plan_of(
        orders.join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
    )
    assert "SortMergeJoin" in merged and "BroadcastHashJoin" not in merged

    shuffled = plan_of(
        orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
    )
    assert "ShuffledHashJoin" in shuffled
