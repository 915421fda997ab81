"""Explicit schemas for the domain tables (SURVEY.md 1.2).

Every reference table declares its schema in DDL (FDProcBatch.txt) or via a
Jackson POJO (TransFraudModel.java); we mirror that with StructTypes -- no
inference anywhere. Timestamps are STRING at the edge (matching the
reference) and TimestampType internally.
"""

from __future__ import annotations

from pyspark.sql import types as T

# card_member (FDProcBatch.txt:177-187; README.md:11-19)
CARD_MEMBER = T.StructType([
    T.StructField("card_id", T.LongType(), False),
    T.StructField("member_id", T.LongType(), False),
    T.StructField("member_joining_dt", T.StringType(), True),
    T.StructField("card_purchase_dt", T.StringType(), True),
    T.StructField("country", T.StringType(), True),
    T.StructField("city", T.StringType(), True),
])

# member_score (FDProcBatch.txt:190-196)
MEMBER_SCORE = T.StructType([
    T.StructField("member_id", T.LongType(), False),
    T.StructField("score", T.IntegerType(), True),
])

# card_transactions_history_data (FDProcBatch.txt:70-82)
CARD_TRANSACTIONS = T.StructType([
    T.StructField("card_id", T.LongType(), False),
    T.StructField("member_id", T.LongType(), True),
    T.StructField("amount", T.DoubleType(), True),
    T.StructField("postcode", T.IntegerType(), True),
    T.StructField("pos_id", T.LongType(), True),
    T.StructField("transaction_dt", T.StringType(), True),
    T.StructField("status", T.StringType(), True),
])

# zip geo reference (GeoGraudData.csv layout; FraudDistMetric.java:42-52)
ZIP_GEO = T.StructType([
    T.StructField("zip", T.StringType(), False),
    T.StructField("lat", T.DoubleType(), True),
    T.StructField("lon", T.DoubleType(), True),
    T.StructField("city", T.StringType(), True),
    T.StructField("state", T.StringType(), True),
    T.StructField("pos_id", T.StringType(), True),
])

# streaming payload TransactionData (TransFraudModel.java:9-25; README.md:38-46)
TXN_PAYLOAD = T.StructType([
    T.StructField("card_id", T.LongType(), True),
    T.StructField("member_id", T.LongType(), True),
    T.StructField("amount", T.DoubleType(), True),
    T.StructField("pos_id", T.LongType(), True),
    T.StructField("postcode", T.IntegerType(), True),
    T.StructField("transaction_dt", T.StringType(), True),
])

# card_transaction_lookup (FDProcBatch.txt:158-169; TransQueryLog.java:8-12)
LOOKUP = T.StructType([
    T.StructField("card_id", T.LongType(), False),
    T.StructField("ucl", T.DoubleType(), True),
    T.StructField("postcode", T.IntegerType(), True),
    T.StructField("transaction_dt", T.StringType(), True),
    T.StructField("score", T.IntegerType(), True),
])
