"""Registry-slice filter for the two registry-wide parametrized test
modules (test_queries_oracle.py, test_plan_quality_registry.py).

r11 verdict item 5: those two files carry ~2,400 of the suite's ~3,500
tests, so size-based file packing left one 20-minute shard while the
rest finished in ~4. tools/pytest_shards.py now runs BOTH files in
EVERY shard with PYTEST_REGISTRY_SLICE=<i>/<k> set, and this filter
keeps only the queries whose md5(name) lands in slice i -- the union
over shards is exactly the full registry (md5 is stable across
processes, unlike hash()). Without the env var (serial pytest runs)
the full list passes through unchanged.
"""

from __future__ import annotations

import hashlib
import os


def slice_queries(queries):
    spec = os.environ.get("PYTEST_REGISTRY_SLICE")
    if not spec:
        return list(queries)
    i, k = (int(x) for x in spec.split("/"))
    # r12 ADVICE: a malformed spec like "6/6" would silently collect
    # zero tests (trivially green shard) -- error loudly instead.
    if not (k > 0 and 0 <= i < k):
        raise ValueError(
            f"PYTEST_REGISTRY_SLICE={spec!r}: need 0 <= i < k (k > 0)"
        )
    return [
        q
        for q in queries
        if int(hashlib.md5(q.name.encode()).hexdigest(), 16) % k == i
    ]
