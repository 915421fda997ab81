"""End-to-end demo of the LLM-training-data side of the engine on the
driver's documents/embeddings tables:

    python examples/llm_data_pipeline_demo.py [sf_dir]

  1. quality   -- token/stopword/distinct ratios, keep the top band
  2. exact     -- content-hash dedup
  3. near-dup  -- shingle MinHash + LSH candidates, jaccard-verified
  4. embed     -- cosine near-dup pairs + IVF ANN neighbors
  5. batchprep -- deterministic split, 512-token packing, mixture weights
  6. report    -- surviving corpus + per-stage drop counts
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import ivf_cosine_topk
from fraud_detection_in_banking_transactions_using_hadoop_spark.session import get_spark
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("llm-pipeline-demo")
    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"== corpus: {n0} documents from {sf_dir}")

    print("== 1. quality filter")
    toks = F.split("text", " ")
    scored = docs.select(
        "*",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("distinct_ratio"),
    )
    kept = scored.filter((F.col("n_tokens") >= 10) & (F.col("distinct_ratio") >= 0.2))
    n1 = kept.count()
    print(f"   kept {n1}/{n0} (dropped short / low-diversity docs)")

    print("== 2. exact dedup")
    groups = exact_dedup(kept, "doc_id", "text")
    n_dup = groups.filter(F.col("n_copies") > 1).count()
    keep_ids = groups.select(F.col("keep_id").alias("doc_id"))
    deduped = kept.join(keep_ids, "doc_id", "left_semi")
    print(f"   {n_dup} duplicate groups; {deduped.count()} docs remain")

    print("== 3. near-dup (shingle MinHash -> LSH -> jaccard verify)")
    sigs = minhash_signatures(deduped, "doc_id", "text", n_hashes=8, shingle_w=3)
    cands = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
    verified = ngram_jaccard_pairs(deduped, "doc_id", "text", "lang", threshold=0.7)
    cand_set = cands.select("doc_a", "doc_b").intersect(verified.select("doc_a", "doc_b"))
    n_near = cand_set.count()
    drop_near = cand_set.select(F.col("doc_b").alias("doc_id")).distinct()
    final_docs = deduped.join(drop_near, "doc_id", "left_anti")
    print(f"   {cands.count()} LSH candidates, {n_near} jaccard-confirmed; "
          f"{final_docs.count()} docs survive")

    print("== 4. embedding neighbors (IVF ANN)")
    vecs = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ann = ivf_cosine_topk(vecs, vecs.filter(F.col("vec_id") < 5), k=3, n_cells=8, n_probe=2)
    ann.show(truncate=False)

    print("== 5. split / pack / mixture (training-batch prep)")
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_pipeline import (
        q_pack_sequences,
        q_source_mixture,
        q_train_test_split,
    )

    q_train_test_split(spark, sf_dir).orderBy("split").show()
    chunks = q_pack_sequences(spark, sf_dir)
    print(f"   {chunks.count()} packed 512-token chunks")
    q_source_mixture(spark, sf_dir).orderBy("source").show(5)

    print("== 6. report")
    print(f"   pipeline: {n0} -> quality {n1} -> exact {deduped.count()} "
          f"-> near-dup {final_docs.count()}")
    print("== done")


if __name__ == "__main__":
    main()
