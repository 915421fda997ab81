from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from fraud_detection_in_banking_transactions_using_hadoop_spark.session import get_spark

    spark = get_spark("tests", cpus=4)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
