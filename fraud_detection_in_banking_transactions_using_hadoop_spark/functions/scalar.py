"""Scalar column-expression builders (SURVEY.md 2.8, F1-F10).

Everything here is a pure Column expression -- no Python UDFs -- so the
whole rule pipeline stays inside whole-stage codegen. The distance function
reproduces the reference's exact formula (spherical law of cosines, despite
its "Haversine" comment) so results hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0  # FraudDistMetric.java:76


def distance_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance, spherical law of cosines (F6).

    Reproduces FraudDistMetric.java:69-78 exactly:
      acos(sin(p1)sin(p2) + cos(p1)cos(p2)cos(t1-t2)) * 6371
    The cos-sum is clamped to [-1, 1]: float rounding can push identical
    points to 1+1e-16, which the reference's Math.acos maps to NaN but
    strict engines (DuckDB) reject outright.

    Identical coordinates short-circuit to exactly 0.0: the law of cosines
    is catastrophically ill-conditioned at angle 0 (libm trig differs by
    1 ulp across engines, which acos amplifies to ~1e-4 km), and the only
    correct answer there is 0.
    """
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon1) - F.radians(lon2)
    cos_angle = F.sin(p1) * F.sin(p2) + F.cos(p1) * F.cos(p2) * F.cos(dl)
    clamped = F.least(F.lit(1.0), F.greatest(F.lit(-1.0), cos_angle))
    any_null = lat1.isNull() | lon1.isNull() | lat2.isNull() | lon2.isNull()
    return (
        # least/greatest IGNORE nulls (Spark and DuckDB alike), which would
        # silently turn a missing coordinate into acos(-1) = 20015 km --
        # propagate NULL explicitly.
        F.when(any_null, F.lit(None).cast("double"))
        .when((lat1 == lat2) & (lon1 == lon2), F.lit(0.0))
        .otherwise(F.acos(clamped) * F.lit(EARTH_RADIUS_KM))
    )


def speed_kms(dist_km: Column, dt_seconds: Column) -> Column:
    """Speed in km/s (F7, FinFraudGuard.java:79). NULL when dt <= 0 --
    the caller decides how a non-positive dt scores (SURVEY.md 1.4(7):
    the speed rule fires on dt <= 0). Guarding here avoids ANSI-mode
    division-by-zero errors."""
    return F.when(dt_seconds > 0, dist_km / dt_seconds)


def ts_seconds(ts: Column) -> Column:
    """Epoch seconds as DOUBLE with sub-second precision (F5). Matches
    DuckDB's epoch(ts) for oracle parity."""
    return ts.cast("double")


def parse_ts_multi(col: Column, formats: tuple[str, ...]) -> Column:
    """Parse a string timestamp trying several formats (SURVEY.md 1.4(1):
    the reference mixes yyyy-MM-dd and dd-MM-yyyy). First format that
    parses wins; all-NULL if none do."""
    parsed = F.try_to_timestamp(col, F.lit(formats[0]))
    for fmt in formats[1:]:
        parsed = F.coalesce(parsed, F.try_to_timestamp(col, F.lit(fmt)))
    return parsed


def row_uuid() -> Column:
    """Random row id with dashes stripped (F3: reflect(java.util.UUID)
    + regexp_replace, FDProcBatch.txt:125). Nondeterministic -- excluded
    from hash-checked oracle queries."""
    return F.regexp_replace(F.expr("uuid()"), "-", "")


def csv_line(*cols: Column) -> Column:
    """CSV record formatting (F9, TransFraudModel.java:56-59)."""
    return F.concat_ws(",", *cols)
