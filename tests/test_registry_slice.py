"""The PYTEST_REGISTRY_SLICE partition (tools/pytest_shards.py) must be
a true partition: slices pairwise disjoint and their union the full
registry, for every shard count the runner might use -- otherwise a
sharded run silently skips queries the serial run would test."""

from __future__ import annotations

import os
from unittest import mock

from registry_slice import slice_queries

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry


def test_slices_partition_registry():
    qs = registry()
    names = {q.name for q in qs}
    for k in (2, 6, 8):
        seen: set[str] = set()
        for i in range(k):
            with mock.patch.dict(os.environ, {"PYTEST_REGISTRY_SLICE": f"{i}/{k}"}):
                part = {q.name for q in slice_queries(qs)}
            assert seen.isdisjoint(part)
            seen |= part
        assert seen == names


def test_no_env_means_identity():
    qs = registry()
    env = {k: v for k, v in os.environ.items() if k != "PYTEST_REGISTRY_SLICE"}
    with mock.patch.dict(os.environ, env, clear=True):
        assert [q.name for q in slice_queries(qs)] == [q.name for q in qs]
