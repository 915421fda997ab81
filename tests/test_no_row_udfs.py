"""Source-level slow-path gate: the package must never register a
row-at-a-time Python UDF. Every Python hook in the hot path is either a
built-in expression, an Arrow-batched pandas UDF, or a mapInPandas /
applyInPandas iterator -- a plain `@udf` pays per-row pickle shuttling
(~10-100x slower) and is always avoidable here. This pins today's
zero-occurrence state the same way the complex-output and
COVERAGE-completeness gates pin theirs.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / (
    "fraud_detection_in_banking_transactions_using_hadoop_spark"
)

# row-at-a-time registration forms; pandas_udf / mapInPandas etc. are fine
_BANNED = [
    re.compile(r"^\s*@udf\b"),
    re.compile(r"^\s*@F\.udf\b"),
    re.compile(r"\bF\.udf\("),
    re.compile(r"functions\s+import\s+udf\b"),
    re.compile(r"\budf\s*\(\s*lambda"),
    re.compile(r"\.udf\.register\("),
    re.compile(r"\bUserDefinedFunction\("),
]


def test_no_row_at_a_time_udfs():
    hits = []
    for path in sorted(PKG.rglob("*.py")):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if "pandas_udf" in line:
                continue
            for pat in _BANNED:
                if pat.search(line):
                    hits.append(f"{path.relative_to(PKG.parent)}:{i}: {line.strip()}")
    assert not hits, "row-at-a-time UDF registration found:\n" + "\n".join(hits)
