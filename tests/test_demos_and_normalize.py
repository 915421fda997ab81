"""Demo scripts executed in-process (rot protection) + the pandas_udf
normalization template."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "examples"))


def test_fraud_pipeline_demo_runs(spark, tmp_path, capsys):
    import fraud_pipeline_demo

    old_argv = sys.argv
    sys.argv = ["fraud_pipeline_demo.py", str(tmp_path / "wd")]
    try:
        fraud_pipeline_demo.main()
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    assert "fraud=2" in out  # amount rule + speed rule both fire
    assert "== done" in out


def test_llm_pipeline_demo_runs(spark, capsys):
    import llm_data_pipeline_demo

    old_argv = sys.argv
    sys.argv = ["llm_data_pipeline_demo.py", "/root/testdata/sf0.001"]
    try:
        llm_data_pipeline_demo.main()
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    assert "== done" in out
    assert "pipeline: 500" in out


def test_nfc_normalize_and_strip(spark):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.functions.normalize import (
        nfc_normalize,
        strip_control_chars,
    )

    decomposed = "éclair"  # e + combining acute
    composed = "éclair"     # precomposed
    noisy = "ab\x00cd​ef"   # NUL + zero-width space
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, noisy), (4, None)],
        "id long, s string",
    )
    got = {
        r.id: (r.n, r.c)
        for r in df.select(
            "id", nfc_normalize("s").alias("n"), strip_control_chars("s").alias("c")
        ).collect()
    }
    assert got[1][0] == composed
    assert got[2][0] == composed  # NFC folds both forms to one code point
    assert got[3][1] == "abcdef"  # NUL + zero-width dropped
    assert got[4] == (None, None)  # NULL preserved
