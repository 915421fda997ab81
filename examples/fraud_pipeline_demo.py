"""End-to-end demo of the engine's fraud pipeline -- the runnable twin of
the reference's 12-step runbook (FDProcBatch.txt) + speed layer
(RTFraudScan.txt), on generated fixture data.

    python examples/fraud_pipeline_demo.py [workdir]

Steps (each printed as it runs):
  1. ingest   -- CSV transactions + member dims -> typed DataFrames
  2. batch    -- build_lookup: UCL + score + last location per card
  3. persist  -- keyed parquet lookup table (the HBase replacement)
  4. stream   -- replay payload JSONL through the foreachBatch scorer
  5. report   -- scored master table + final lookup state
"""

from __future__ import annotations

import json
import random
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Row

from fraud_detection_in_banking_transactions_using_hadoop_spark.plans.lookup import build_lookup
from fraud_detection_in_banking_transactions_using_hadoop_spark.schemas import CARD_TRANSACTIONS
from fraud_detection_in_banking_transactions_using_hadoop_spark.session import get_spark
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_csv_table
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.writers import overwrite_keyed_table
from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.scorer import (
    read_payload_file_stream,
    run_scorer,
)

ZIPS = {"100": (40.7128, -74.0060), "200": (34.0522, -118.2437), "300": (51.5074, -0.1278)}


def generate_inputs(work: Path) -> None:
    rng = random.Random(7)
    lines = ["card_id,member_id,amount,postcode,pos_id,transaction_dt,status"]
    for card in range(1, 21):
        for i in range(15):
            ts = f"2024-01-{i + 1:02d} {rng.randint(8, 20):02d}:{rng.randint(0, 59):02d}:00"
            status = "GENUINE" if rng.random() > 0.1 else "FRAUDULENT"
            lines.append(
                f"{card},{(card - 1) // 2 + 1},{rng.uniform(10, 200):.2f},"
                f"{rng.choice(list(ZIPS))},{rng.randint(1, 999)},{ts},{status}"
            )
    (work / "card_transactions.csv").write_text("\n".join(lines))

def generate_stream(work: Path, lookup_rows: dict[int, Row]) -> None:
    """Payloads relative to each card's ACTUAL lookup state so every rule
    demonstrably fires: the speed rule needs short dt, so the teleport
    event is stamped 10 minutes after the card's last known transaction."""
    from datetime import datetime, timedelta

    def minutes_after(card: int, m: int) -> str:
        last = datetime.strptime(lookup_rows[card].transaction_dt, "%Y-%m-%d %H:%M:%S")
        return (last + timedelta(minutes=m)).strftime("%Y-%m-%d %H:%M:%S")

    def far_zip(card: int) -> int:
        return 300 if lookup_rows[card].postcode != 300 else 100

    stream_dir = work / "stream_in"
    stream_dir.mkdir()
    payloads = [
        # normal purchase at the last known location, a day later -> GENUINE
        {"card_id": 1, "member_id": 1, "amount": 50.0, "pos_id": 1,
         "postcode": lookup_rows[1].postcode,
         "transaction_dt": minutes_after(1, 24 * 60)},
        # huge amount -> FRAUD on the UCL rule
        {"card_id": 2, "member_id": 1, "amount": 99999.0, "pos_id": 2,
         "postcode": lookup_rows[2].postcode,
         "transaction_dt": minutes_after(2, 24 * 60)},
        # distant zip 10 minutes after the last txn -> FRAUD on speed
        {"card_id": 3, "member_id": 2, "amount": 40.0, "pos_id": 3,
         "postcode": far_zip(3), "transaction_dt": minutes_after(3, 10)},
    ]
    with open(stream_dir / "batch1.json", "w") as f:
        for p in payloads:
            f.write(json.dumps(p) + "\n")


def main() -> None:
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp(prefix="fraud_demo_"))
    work.mkdir(parents=True, exist_ok=True)
    print(f"== workdir: {work}")
    generate_inputs(work)
    spark = get_spark("fraud-pipeline-demo")

    print("== 1. ingest: CSV -> typed DataFrames")
    txns = read_csv_table(spark, str(work / "card_transactions.csv"), CARD_TRANSACTIONS)
    members = spark.createDataFrame(
        [Row(card_id=c, member_id=(c - 1) // 2 + 1, member_joining_dt="2020-01-01",
             card_purchase_dt="2020-01-02", country="US", city="NYC") for c in range(1, 21)]
    )
    scores = spark.createDataFrame(
        [Row(member_id=m, score=150 if m == 10 else 600) for m in range(1, 11)]
    )
    print(f"   {txns.count()} transactions, {members.count()} cards")

    print("== 2. batch: build_lookup (UCL + score + last location)")
    lookup = build_lookup(txns, members, scores)
    lookup.show(5, truncate=False)

    print("== 3. persist keyed lookup table")
    lookup_path = str(work / "lookup")
    overwrite_keyed_table(lookup, lookup_path, key="card_id")

    print("== 4. stream: replay payloads through the scorer")
    generate_stream(work, {r.card_id: r for r in lookup.collect()})
    zip_geo = spark.createDataFrame(
        [Row(zip=z, lat=lat, lon=lon, city="?", state="?", pos_id="0")
         for z, (lat, lon) in ZIPS.items()]
    )
    stream = read_payload_file_stream(spark, str(work / "stream_in"))
    q = run_scorer(stream, lookup_path, zip_geo, str(work / "master"),
                   str(work / "ckpt"), console=False)
    q.processAllAvailable()
    q.stop()

    print("== 5. report: scored master table")
    master = spark.read.parquet(str(work / "master"))
    master.select("card_id", "amount", "postcode", "transaction_dt",
                  "speed_kms", "status").show(truncate=False)
    n_fraud = master.filter(master.status == "FRAUD").count()
    print(f"   scored={master.count()} fraud={n_fraud}")
    print("== done")


if __name__ == "__main__":
    main()
