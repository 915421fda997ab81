"""Python UDTFs (Spark 4 table functions) -- the engine's UDTF surface.

The reference has no UDTF (SURVEY.md 2.11); these demonstrate the
extension point with text-pipeline table functions usable from SQL after
registration:

    spark.udtf.register("explode_shingles", ShinglesUDTF)
    spark.sql("SELECT s.* FROM docs, LATERAL explode_shingles(text, 3) s")

Prefer the pure-expression `operators.dedup.shingles` in the hot path --
a UDTF crosses the Python boundary per row group. UDTFs earn their keep
when the expansion logic is genuinely imperative (parsers, tokenizers
with state).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="shingle: string, pos: int")
class ShinglesUDTF:
    """Word w-shingles of a text, with position."""

    def eval(self, text: str, w: int = 3):
        if text is None:
            return
        toks = text.split(" ")
        if len(toks) < w:
            yield " ".join(toks), 0
            return
        for i in range(len(toks) - w + 1):
            yield " ".join(toks[i : i + w]), i


@udtf(returnType="tok: string, kind: string")
class TokenClassifyUDTF:
    """Token stream tagged by class (word / number / symbol) -- the
    imperative tokenizer shape that genuinely needs a UDTF."""

    def eval(self, text: str):
        if text is None:
            return
        for tok in text.split(" "):
            if not tok:
                continue
            if tok.isdigit():
                yield tok, "number"
            elif tok.isalpha():
                yield tok, "word"
            else:
                yield tok, "symbol"


def register_udtfs(spark) -> None:
    spark.udtf.register("explode_shingles", ShinglesUDTF)
    spark.udtf.register("classify_tokens", TokenClassifyUDTF)
