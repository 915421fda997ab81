"""Extension batch 230 (round 10): adaptive binary arithmetic coding --
the 12th real codec and the first ENTROPY-OPTIMAL one.

arith_coder_daily encodes the daily up/down revenue bit sequence with a
32-bit Witten-Neal-Cleary arithmetic coder under a Laplace-smoothed
adaptive order-0 model (c0 = c1 = 1). Every encoder operation is
integer -- the range split is one floor-division, renormalization is
the classic E1/E2/E3 scheme with underflow-pending bits -- so the FULL
ENCODER STATE TRAJECTORY (low, high, pending, c0, c1, bits emitted,
ones emitted) replays as a phase-encoded recursive CTE (33 micro-steps
per symbol: 1 consume + up to 32 renorm steps, the DGIM pattern; a
32-bit range can renormalize at most 32 times per symbol). The Spark
side runs the REAL bit-packing coder (operators/multimodal
ac_encode_bits / ac_decode_bits, roundtrip asserted in the fold) and
emits the same trajectory endpoints -- hash equality means an
independent from-scratch SQL implementation of arithmetic coding
agrees with the Python coder on every carry, every pending bit, every
adaptive count. Output includes the compression ratio against LZ76 /
entropy intuition: near-random up/down bits should NOT compress
(ratio ~ 1e6 ppm), a strongly trending series would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_PH = 33  # 1 consume + up to 32 renormalizations per symbol
_HALF = 1 << 31
_QUARTER = 1 << 30
_TOP = (1 << 32) - 1


def _renorm_case() -> str:
    """One E1/E2/E3 renormalization micro-step over state columns
    (low, high, pending, nout, ones); no-op when the range is wide."""
    return f"""
      CASE WHEN f.high < {_HALF} THEN struct_pack(
             low := f.low * 2, high := f.high * 2 + 1,
             pending := CAST(0 AS BIGINT),
             nout := f.nout + 1 + f.pending,
             ones := f.ones + f.pending)
           WHEN f.low >= {_HALF} THEN struct_pack(
             low := (f.low - {_HALF}) * 2,
             high := (f.high - {_HALF}) * 2 + 1,
             pending := CAST(0 AS BIGINT),
             nout := f.nout + 1 + f.pending,
             ones := f.ones + 1)
           WHEN f.low >= {_QUARTER} AND f.high < {3 * _QUARTER}
           THEN struct_pack(
             low := (f.low - {_QUARTER}) * 2,
             high := (f.high - {_QUARTER}) * 2 + 1,
             pending := f.pending + 1,
             nout := f.nout, ones := f.ones)
           ELSE struct_pack(low := f.low, high := f.high,
             pending := f.pending, nout := f.nout, ones := f.ones)
      END
    """


_AC_ORACLE = f"""
    WITH RECURSIVE daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_orderdate),
    bits AS (
      SELECT d,
             CASE WHEN cents > lag(cents) OVER (ORDER BY d)
                  THEN 1 ELSE 0 END AS b,
             row_number() OVER (ORDER BY d) AS rn
      FROM daily),
    s_t AS MATERIALIZED (
      SELECT list(b ORDER BY rn) AS bs, CAST(count(*) AS BIGINT) AS n
      FROM bits WHERE rn > 1),
    fold AS (
      -- variable-advance replay: a level is a RENORM micro-step when
      -- an E1/E2/E3 condition holds, else it CONSUMES the next symbol
      -- (s counts symbols consumed); levels = n + #renorms ~ 2n, not
      -- the 33n a fixed phase encoding costs
      SELECT CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS low,
             CAST({_TOP} AS BIGINT) AS high,
             CAST(0 AS BIGINT) AS pending,
             CAST(1 AS BIGINT) AS c0, CAST(1 AS BIGINT) AS c1,
             CAST(0 AS BIGINT) AS nout, CAST(0 AS BIGINT) AS ones
      UNION ALL
      SELECT CASE WHEN g.need THEN g.s ELSE g.s + 1 END,
             CASE WHEN g.need THEN g.rs.low
                  ELSE CASE WHEN g.b = 0 THEN g.low ELSE g.splitp END
             END,
             CASE WHEN g.need THEN g.rs.high
                  ELSE CASE WHEN g.b = 0 THEN g.splitp - 1 ELSE g.high END
             END,
             CASE WHEN g.need THEN g.rs.pending ELSE g.pending END,
             CASE WHEN g.need THEN g.c0
                  ELSE g.c0 + CASE WHEN g.b = 0 THEN 1 ELSE 0 END END,
             CASE WHEN g.need THEN g.c1
                  ELSE g.c1 + CASE WHEN g.b = 1 THEN 1 ELSE 0 END END,
             CASE WHEN g.need THEN g.rs.nout ELSE g.nout END,
             CASE WHEN g.need THEN g.rs.ones ELSE g.ones END
      FROM (
        SELECT f.s, f.low, f.high, f.pending, f.c0, f.c1, f.nout,
               f.ones,
               (f.high < {_HALF} OR f.low >= {_HALF}
                OR (f.low >= {_QUARTER} AND f.high < {3 * _QUARTER}))
                 AS need,
               t.bs[CAST(f.s + 1 AS INTEGER)] AS b,
               f.low + ((f.high - f.low + 1) * f.c0)
                 // (f.c0 + f.c1) AS splitp,
               {_renorm_case()} AS rs
        FROM fold f CROSS JOIN s_t t
        WHERE f.s < t.n
           OR f.high < {_HALF} OR f.low >= {_HALF}
           OR (f.low >= {_QUARTER} AND f.high < {3 * _QUARTER})) g),
    fin AS (
      SELECT f.* FROM fold f CROSS JOIN s_t t
      WHERE f.s = t.n
        AND NOT (f.high < {_HALF} OR f.low >= {_HALF}
                 OR (f.low >= {_QUARTER} AND f.high < {3 * _QUARTER}))),
    flushed AS (
      SELECT t.n AS n_bits_in,
             fin.nout + fin.pending + 2 AS n_bits_out,
             fin.ones + CASE WHEN fin.low < {_QUARTER}
                             THEN fin.pending + 1 ELSE 1 END AS ones_out,
             fin.low AS final_low, fin.pending AS final_pending,
             fin.c0 AS final_c0, fin.c1 AS final_c1
      FROM fin CROSS JOIN s_t t)
    SELECT n_bits_in, n_bits_out, ones_out,
           (n_bits_out * 1000000) // n_bits_in AS ratio_ppm,
           final_low, final_pending, final_c0, final_c1
    FROM flushed
"""


@register(
    "arith_coder_daily",
    _AC_ORACLE,
    tags=("multimodal", "codec", "entropy", "stateful", "exact-arith"),
)
def q_arith_coder_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive arithmetic coding of the daily up/down bits (module
    docstring): the real coder runs in the driver fold with its decode
    roundtrip asserted; the emitted trajectory endpoints match the
    recursive-CTE replay bit-for-bit."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        _AC_QUARTER,
        ac_decode_bits,
        ac_encode_bits,
    )

    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    bits_df = daily.select(
        F.when(
            F.col("cents") > F.lag("cents").over(Window.orderBy("d")), 1
        )
        .otherwise(0)
        .alias("b"),
        F.row_number().over(Window.orderBy("d")).alias("rn"),
    ).where(F.col("rn") > 1)
    rows = collect_nonempty(
        bits_df.orderBy("rn").select("b"), "arith coder daily bits"
    )
    bits = [int(r["b"]) for r in rows]
    data, n_out, trace = ac_encode_bits(bits)
    assert ac_decode_bits(data, len(bits)) == bits
    n_emitted, ones, low, high, pending, c0, c1 = trace
    n_bits_out = n_emitted + pending + 2
    ones_out = ones + (pending + 1 if low < _AC_QUARTER else 1)
    assert n_bits_out == n_out  # the flush accounting is the real one
    n = len(bits)
    return spark.createDataFrame(
        [
            (
                n,
                n_bits_out,
                ones_out,
                n_bits_out * 1000000 // n,
                low,
                pending,
                c0,
                c1,
            )
        ],
        "n_bits_in long, n_bits_out long, ones_out long, ratio_ppm long,"
        " final_low long, final_pending long, final_c0 long, final_c1 long",
    )
