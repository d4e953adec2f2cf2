"""Full-text relevance ranking: BM25 keyword scoring over a document
corpus — the retrieval primitive a training-data pipeline uses for
targeted corpus slicing ("pull the docs most about X") and for building
weak-supervision labels.

Scale design (100 TB):

- **No explode, no corpus shuffle.** Per-document term frequencies are
  computed with array expressions (``size(filter(tokens, t = term))``)
  inside one projection — the corpus is scanned, never re-keyed. The
  only aggregation is the corpus-statistics pass (N, avgdl, per-term
  document frequencies), which partial-aggregates map-side down to ONE
  row; that row is broadcast back for scoring. Top-k compiles to
  ``TakeOrderedAndProject`` (per-partition partial top-k, driver merge
  of k × partitions rows).
- **Two corpus passes, both embarrassingly parallel**: one for stats,
  one for scoring. In steady-state production the stats pass amortizes:
  df/avgdl drift slowly, so the stats row can be pinned (cached /
  persisted) across many query batches — scoring is then a single pass.
- **Determinism**: scores are IEEE-double expressions evaluated in a
  FIXED association order (terms summed in the order given, not via a
  commutative aggregate), so a DuckDB oracle replays them bit-exactly;
  ranking ties broken by doc id.

The reference (srahul3/ig-etl-sync) has no search capability; this is a
§2.9 extension operator in the LLM-data-pipeline family (SURVEY.md).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.textops import tokens

__all__ = ["bm25_scores", "bm25_topk"]


def _tf(tok_col: Column, term: str) -> Column:
    """Term frequency inside a pre-split token array (lower-cased)."""
    return F.size(F.filter(tok_col, lambda t: t == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against ``terms`` with BM25 (Lucene idf
    form: ``ln(1 + (N - df + 0.5) / (df + 0.5))``).

    Returns ``(id_col, score DOUBLE)`` with score > 0 rows only (a doc
    containing none of the terms scores 0 and is dropped — at scale
    that's the overwhelming majority, and dropping them early keeps the
    top-k heap input small).

    Plan shape: projection (tf array ops) → single-row partial agg
    (stats) → broadcast-cross-join → projection (score). No shuffle of
    the corpus at any point.
    """
    if not terms:
        raise ValueError("bm25_scores: terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("bm25_scores: duplicate terms")

    toks = tokens(F.lower(F.col(text_col)))
    tf_cols = [_tf(toks, t).alias(f"_tf{i}") for i, t in enumerate(terms)]
    per_doc = docs.select(
        F.col(id_col), F.size(toks).alias("_dl"), *tf_cols
    )

    # corpus statistics: ONE row (map-side partial agg → single reduce)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )

    scored = per_doc.crossJoin(F.broadcast(stats))

    def contrib(i: int) -> Column:
        tf = F.col(f"_tf{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        # fixed association order — mirrored exactly in the SQL oracle
        return idf * (
            tf
            * (k1 + 1.0)
            / (
                tf
                + k1
                * (1.0 - b + b * F.col("_dl").cast("double") / F.col("_avgdl"))
            )
        )

    score = reduce(
        lambda acc, i: acc + contrib(i), range(1, len(terms)), contrib(0)
    )
    return (
        scored.select(F.col(id_col), score.alias("score"))
        .where(F.col("score") > 0)
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 4,
) -> DataFrame:
    """Top-``k`` documents by BM25 score, deterministically ordered by
    (rounded score DESC, id ASC). Rounding happens IN-ENGINE before the
    ordering so the ranking (not just the display) is replayable by the
    DuckDB oracle. Compiles to ``TakeOrderedAndProject``."""
    scored = bm25_scores(
        docs, terms, id_col=id_col, text_col=text_col, k1=k1, b=b
    ).select(
        F.col(id_col), F.round(F.col("score"), round_dp).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
