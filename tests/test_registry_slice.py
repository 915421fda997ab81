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


def test_no_env_means_default_sample_and_full_flag_restores_identity():
    """r13 verdict item 2: a plain serial run defaults to the
    deterministic 0/6 sample (a strict subset of what every sharded run
    covers); PYTEST_REGISTRY_FULL=1 restores the full matrix."""
    qs = registry()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTEST_REGISTRY_SLICE", "PYTEST_REGISTRY_FULL")
    }
    with mock.patch.dict(os.environ, env, clear=True):
        default = [q.name for q in slice_queries(qs)]
    with mock.patch.dict(
        os.environ, {**env, "PYTEST_REGISTRY_SLICE": "0/6"}, clear=True
    ):
        slice0 = [q.name for q in slice_queries(qs)]
    assert default == slice0 and len(default) > 0
    with mock.patch.dict(
        os.environ, {**env, "PYTEST_REGISTRY_FULL": "1"}, clear=True
    ):
        assert [q.name for q in slice_queries(qs)] == [q.name for q in qs]
