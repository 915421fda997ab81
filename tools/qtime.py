"""Single-query isolation harness for the optimization rounds.

Usage: python tools/qtime.py <query> [<query> ...] [--sf DIR] [--reps N]
       [--explain OUTDIR]

Times each named registry query with the noop sink (guide 1.4: forces
every column of every row, no driver collect) after the same session
warm-up bench.py uses, prints per-rep wall seconds, and optionally dumps
.explain("formatted") to OUTDIR/<query>.txt.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 2
    explain_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--explain":
            explain_dir = Path(args[i + 1])
            explain_dir.mkdir(parents=True, exist_ok=True)
            i += 2
        else:
            names.append(args[i])
            i += 1

    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
    from fraud_detection_in_banking_transactions_using_hadoop_spark.session import get_spark

    spark = get_spark("qtime")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

    read_table(spark, sf_dir, "region").count()
    read_table(spark, sf_dir, "events").groupBy("user_id").count().selectExpr(
        "user_id", "row_number() OVER (ORDER BY count DESC, user_id) AS rn"
    ).where("rn <= 3").count()

    by_name = {q.name: q for q in registry()}
    for name in names:
        q = by_name[name]
        if explain_dir is not None:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (explain_dir / f"{name}.txt").write_text(plan)
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}:{r}")
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"{name} rep{r}: {time.time() - t0:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
