"""The batch lookup-table build -- the reference's primary "query"
(SURVEY.md 3.1; FDProcBatch.txt:259-354).

Dataflow (each arrow a Catalyst-planned stage, not a materialized table --
the reference materializes 4 intermediate ORC tables; we compile the whole
thing into one plan with a single shuffle on card_id reused across the
window, the aggregation, and the final joins):

  card_transactions --filter GENUINE--> rank desc ts --rn<=10--> last_ten
  last_ten --groupBy card_id: avg+3*stddev_pop--> card_ucl
  last_ten --rn=1--> card_zipcode (latest postcode + ts)
  card_member |x| member_score on member_id --> card_score   (broadcast)
  card_score |x| card_ucl |x| card_zipcode on card_id --> lookup
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.config import DEFAULT_CONFIG, EngineConfig
from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.agg_ops import ucl_agg
from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.window_ops import top_k_per_group


def build_lookup(
    transactions: DataFrame,
    card_member: DataFrame,
    member_score: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Assemble card_transaction_lookup(card_id, ucl, postcode,
    transaction_dt, score) -- FDProcBatch.txt:342-354.

    Semantics decisions (SURVEY.md 1.4): status compare is
    case-insensitive; ordering ties broken by (transaction_dt, pos_id,
    amount) for determinism; stddev is population.
    """
    genuine = transactions.filter(
        F.upper(F.col("status")) == F.lit(cfg.status_genuine)
    )
    ts = F.to_timestamp(F.col("transaction_dt"), cfg.ts_format)
    order = [ts.desc(), F.col("pos_id").desc(), F.col("amount").desc()]

    # FDProcBatch.txt:279-293 -- card_last_ten_transactions.
    last_ten = top_k_per_group(genuine, ["card_id"], order, k=cfg.ucl_last_n)

    # FDProcBatch.txt:302-310 -- card_ucl (grouped form; the windowed
    # variant lives in operators.window_ops.moving_ucl).
    card_ucl = last_ten.groupBy("card_id").agg(
        ucl_agg(F.col("amount"), cfg.ucl_sigma).alias("ucl")
    )

    # FDProcBatch.txt:319-333 -- card_zipcode: latest postcode + ts.
    card_zip = last_ten.filter(F.col("rn") == 1).select(
        "card_id", "postcode", "transaction_dt"
    )

    # FDProcBatch.txt:259-267 -- card_score: dim |x| dim, broadcast-sized.
    card_score = card_member.join(
        F.broadcast(member_score), "member_id", "inner"
    ).select("card_id", "score")

    # FDProcBatch.txt:342-354 -- final 3-way join on card_id.
    return (
        card_score.join(card_ucl, "card_id", "inner")
        .join(card_zip, "card_id", "inner")
        .select("card_id", "ucl", "postcode", "transaction_dt", "score")
    )
