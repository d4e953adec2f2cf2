"""Python UDTF surface (Spark 4): user-defined TABLE functions — the
row-to-rows extension seam the template layer's ``explode`` can't
express when the split logic needs imperative Python.

Placement in the §2.7 surface: scalar UDF < pandas_udf < applyInPandas
< UDTF. All are the SLOW path relative to built-in expressions —
``sentence_split`` exists because sentence boundaries with
quote/abbreviation handling outgrow a regex, not because a UDTF is
ever preferable to ``explode(split(...))`` when a regex does the job.

Scale note: UDTFs execute row-at-a-time in a Python worker (no Arrow
batching as of Spark 4.1) — keep them off the per-token hot path; a
per-DOCUMENT sentence split is the right granularity (one Python call
per row, output fan-out handled by the engine).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

__all__ = ["SentenceSplit", "register_udtfs"]

# Candidate boundary: terminator + whitespace + sentence-ish start.
# Decimal points never match (no whitespace after the dot).
_BOUNDARY = re.compile(r"(?<=[.!?])\s+(?=[A-Z0-9\"'])")
# Fragment endings that are abbreviations, not sentence ends — the
# merge rule that outgrows a regex split (variable-width lookbehind):
# single initials ("A."), honorifics, and latin shorthands.
_ABBREV_END = re.compile(
    r"\b(?:[A-Z]|Mr|Mrs|Ms|Dr|Prof|Sr|Jr|St|vs|etc|e\.g|i\.e|al)\.$"
)


@udtf(returnType="idx int, sentence string, n_chars int")
class SentenceSplit:
    """One output row per sentence of the input text: (idx, sentence,
    n_chars). Empty/NULL text yields no rows (explode_outer semantics
    are the caller's choice via a left lateral join)."""

    def eval(self, text: str | None):  # noqa: D102 (UDTF protocol)
        if not text:
            return
        merged: list[str] = []
        for part in _BOUNDARY.split(text.strip()):
            s = part.strip()
            if not s:
                continue
            if merged and _ABBREV_END.search(merged[-1]):
                merged[-1] = merged[-1] + " " + s
            else:
                merged.append(s)
        for i, s in enumerate(merged):
            yield i, s, len(s)


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface for SQL use:
    ``SELECT d.doc_id, s.* FROM docs d, LATERAL sentence_split(d.text) s``.
    """
    spark.udtf.register("sentence_split", SentenceSplit)
