"""Shared guard for the bounded-state driver-fold pattern.

The r8 folds (wagner_whitin, spectral_bipartition, betweenness/MST,
markov attribution, ...) collect an O(1)-row aggregate at query
CONSTRUCTION time and replay an exact integer recursion driver-side
(COVERAGE.md loop-classification table). They all assume the collected
state frame is non-empty; on a degenerate (empty) input table the
failure used to be an opaque IndexError/ValueError deep inside the
fold. `collect_nonempty` turns that into one clear, uniform error at
the collect site. The non-empty precondition is also documented in the
COVERAGE.md loop-classification table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row


def collect_nonempty(df: DataFrame, what: str) -> list[Row]:
    """Collect a bounded driver-fold state frame, raising a clear error
    when the source table is empty (the fold recursions require at
    least one state row; degenerate inputs must fail loudly, not with
    an IndexError inside the recursion)."""
    rows = df.collect()
    if not rows:
        raise ValueError(
            f"driver fold '{what}': collected state frame is empty -- "
            "the bounded-state fold pattern requires a non-empty input "
            "table (see COVERAGE.md loop-classification preconditions)"
        )
    return rows
