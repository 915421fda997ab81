"""Driver bench-contract guard (r11 verdict item 1): the driver keeps
only the TAIL (~2000 chars) of bench.py's stdout and parses the LAST
line. At 69 headline queries the old final summary still embedded the
per-query map and overflowed that window (BENCH_r11.json.parsed null).
The final line is now built by bench._bounded_summary -- scalars only --
and this test pins its serialized length far under the window so
headline-set growth can never regress the contract again."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE, _bounded_summary


def test_final_summary_line_is_bounded():
    # Worst-plausible scalar magnitudes: a 6-hour total, thousands of
    # queries, huge CPU, a stringy sf label.
    summary = _bounded_summary(
        total=99999.999,
        n=99999,
        cpu_total=999999.999,
        load_start=128.123456789,
        sf_val="0.123456789",
    )
    line = json.dumps(summary)
    assert len(line) < 1500, line
    # And it must never grow a per-query map back.
    assert "queries" not in summary
    assert all(not isinstance(v, dict) for v in summary.values())


def test_final_summary_has_driver_contract_fields():
    summary = _bounded_summary(1.0, len(HEADLINE), 2.0, 0.5, 0.1)
    for key in ("metric", "value", "unit", "sf"):
        assert key in summary
    assert summary["unit"] == "sec"
