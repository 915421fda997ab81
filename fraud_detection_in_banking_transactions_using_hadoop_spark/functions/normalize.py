"""Vectorized scalar pandas UDFs -- the engine's template for the Arrow
batch path (SURVEY.md 2.11 realization (b)).

Policy: pure column expressions first (everything else in functions/ is
expression-only); a pandas_udf is sanctioned only when the logic needs a
Python library. Unicode normalization is the canonical example: NFC/NFKC
folding has no Spark SQL builtin, and unicodedata is C-accelerated over
Arrow batches here (never row-at-a-time Python).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def nfc_normalize(s: pd.Series) -> pd.Series:
    """Unicode NFC normalization (composed form): 'e' + combining acute
    becomes the single code point. Idempotent; NULL-preserving."""
    return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)


@pandas_udf("string")
def strip_control_chars(s: pd.Series) -> pd.Series:
    """Drop Unicode control/format characters (category C*) except
    whitespace -- standard corpus-cleaning step before tokenization."""

    def clean(x):
        if x is None:
            return None
        return "".join(
            ch for ch in x if ch in "\n\t " or not unicodedata.category(ch).startswith("C")
        )

    return s.map(clean)
