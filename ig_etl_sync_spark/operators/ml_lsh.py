"""MLlib-backed LSH variants (SURVEY §2.9 X2/X3 alternate path).

The custom implementations in ``dedup.py``/``similarity.py`` are the
primary path (expression-level, oracle-reproducible). These wrappers
expose the stock ``pyspark.ml`` estimators — ``MinHashLSH`` over token
sets and ``BucketedRandomProjectionLSH`` over dense vectors — for users
standardized on MLlib pipelines. Gated behind import-try: the engine
works without pyspark.ml (e.g. minimal Spark builds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - import guard
    from pyspark.ml.feature import (
        BucketedRandomProjectionLSH,
        CountVectorizer,
        MinHashLSH,
        RegexTokenizer,
    )
    from pyspark.ml.functions import array_to_vector

    HAS_ML = True
except ImportError:  # pragma: no cover
    HAS_ML = False


def _require_ml() -> None:
    if not HAS_ML:
        raise ImportError(
            "pyspark.ml is unavailable; use operators.dedup / "
            "operators.similarity (the expression-level implementations)"
        )


def ml_minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hash_tables: int = 8,
    jaccard_distance_threshold: float = 0.3,
    vocab_size: int = 1 << 18,
) -> DataFrame:
    """MinHashLSH near-dup join: tokenize → binary CountVectorizer →
    approxSimilarityJoin. Returns (id_a, id_b, jaccard_distance)."""
    _require_ml()
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_toks", pattern=r"\s+", toLowercase=True
    )
    toks = tok.transform(docs)
    cv = CountVectorizer(
        inputCol="_toks", outputCol="_features", vocabSize=vocab_size, binary=True
    ).fit(toks)
    feats = cv.transform(toks).where(F.size("_toks") > 0)
    mh = MinHashLSH(
        inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=42
    ).fit(feats)
    joined = mh.approxSimilarityJoin(
        feats, feats, jaccard_distance_threshold, distCol="jaccard_distance"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def ml_brp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
) -> DataFrame:
    """BucketedRandomProjectionLSH approximate neighbors (Euclidean).

    One set-oriented job: ``approxSimilarityJoin(corpus, queries, ∞)``
    meets only bucket-colliding pairs (the LSH blocking — never the
    O(n²) cross product), then a per-query ``row_number`` keeps the k
    nearest. No driver-side per-query loop, plan size constant in the
    number of queries (the r01 version collect()ed queries and chained
    one ``approxNearestNeighbors`` job each — a driver bottleneck at any
    real query count).

    Note: BRP-LSH is L2-based; for cosine semantics L2-normalize the
    vectors first (then L2 rank order == cosine rank order).
    """
    _require_ml()
    from pyspark.sql import Window

    to_vec = lambda df: df.withColumn("_vec", array_to_vector(F.col(vec_col)))  # noqa: E731
    c = to_vec(corpus)
    q = to_vec(queries)
    brp = BucketedRandomProjectionLSH(
        inputCol="_vec", outputCol="_hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=42,
    ).fit(c)
    joined = brp.approxSimilarityJoin(c, q, float("inf"), distCol="_dist")
    scored = (
        joined.select(
            F.col(f"datasetB.{id_col}").alias("query_id"),
            F.col(f"datasetA.{id_col}").alias("neighbor_id"),
            F.round("_dist", 6).alias("l2_distance"),
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2_distance").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
