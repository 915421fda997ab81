"""Poor-man's pytest-xdist: run the test suite as K concurrent pytest
subprocesses, each with its own 4-core SparkSession (the image has no
xdist and pip installs are off).

Safe because every per-process resource is already isolated: the
SparkSession warehouse dir is a tempfile.mkdtemp per JVM, Derby JDBC
tests use in-memory databases, and each shard gets its own pytest
--basetemp. Files are greedy-packed into shards by size (a good proxy
for duration here: invariant tests dominate and scale with LoC).

Usage:
    python tools/pytest_shards.py [K]          # default K=6
Exit code is non-zero if ANY shard fails; each shard's tail is printed.
Full-suite wall clock on this box: ~17.5 min serial -> ~4-5 min at K=6.
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


# Duration is dominated by Spark-job count, which tracks test-function
# count far better than byte size (invariant tests dominate).
_PER_TESTDEF = 6_000

# The two registry-wide parametrized modules carry ~2,400 of the
# suite's ~3,500 tests -- no file-level packing can balance them (r11
# verdict item 5: one 20-minute shard while the rest finished in ~4).
# They are excluded from packing and instead run in EVERY shard with
# PYTEST_REGISTRY_SLICE=<i>/<k>, which filters their parametrize lists
# to an md5(name)-partitioned 1/k slice (tests/registry_slice.py); the
# union across shards is exactly the full registry.
_SLICED = ("test_queries_oracle.py", "test_plan_quality_registry.py")


def _weight(p: Path) -> int:
    src = p.read_bytes()
    return p.stat().st_size + _PER_TESTDEF * src.count(b"def test_")


def shard_files(k: int) -> list[list[Path]]:
    files = sorted(
        (
            p
            for p in (REPO / "tests").glob("test_*.py")
            if p.name not in _SLICED
        ),
        key=_weight,
        reverse=True,
    )
    shards: list[tuple[int, list[Path]]] = [(0, []) for _ in range(k)]
    for f in files:
        i = min(range(k), key=lambda j: shards[j][0])
        size, lst = shards[i]
        lst.append(f)
        shards[i] = (size + _weight(f), lst)
    # Every shard gets the sliced registry-wide modules on top of its
    # packed files (the slice env var is set per-shard in main()).
    return [lst + [REPO / "tests" / n for n in _SLICED] for _, lst in shards]


def main() -> int:
    import os

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    shards = shard_files(k)
    t0 = time.time()
    procs = []
    for i, files in enumerate(shards):
        basetemp = tempfile.mkdtemp(prefix=f"pytest-shard{i}-")
        cmd = [
            sys.executable, "-m", "pytest", "-q", "--tb=short",
            f"--basetemp={basetemp}", *[str(f) for f in files],
        ]
        env = dict(os.environ)
        env["PYTEST_REGISTRY_SLICE"] = f"{i}/{len(shards)}"
        procs.append(
            (i, subprocess.Popen(
                cmd, cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True, env=env,
            ))
        )
    rc = 0
    for i, p in procs:
        out, _ = p.communicate()
        tail = "\n".join(out.strip().splitlines()[-4:])
        print(f"--- shard {i} (rc={p.returncode}) ---\n{tail}", flush=True)
        if p.returncode != 0:
            rc = 1
    print(f"total wall: {time.time() - t0:.0f}s  ({len(shards)} shards)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
