"""Training-corpus pipeline demo: dedup → quality gate → chunk → pack →
partitioned write, over the synthetic documents table.
Run: python examples/corpus_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ig_etl_sync_spark.operators.dataprep import (
    chunk_documents,
    pack_sequences,
    prepare_training_corpus,
)
from ig_etl_sync_spark.operators.layout import partitioned_write
from ig_etl_sync_spark.session import get_spark
from ig_etl_sync_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[4]", shuffle_partitions=4,
                      app_name="corpus-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    print("raw docs:", docs.count())

    # Gopher-style composite rule gate (round 4): one fused projection
    from ig_etl_sync_spark.operators.textops import gopher_quality_flags

    flags = gopher_quality_flags(docs)
    print("gopher-pass docs:",
          flags.where("passes").count(), "/", docs.count())

    kept = prepare_training_corpus(docs)
    print("after dedup + quality gate:", kept.count())

    # leakage-safe holdout: every source lands wholly in one split
    from ig_etl_sync_spark.operators.dataprep import group_holdout_split

    split = group_holdout_split(docs, "source", val_ppm=250_000)
    split.groupBy("split").count().show()

    # incremental ingest: dedup a "new batch" against the standing corpus
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.functions.hashing import md5_int32
    from ig_etl_sync_spark.operators.dedup import cross_corpus_near_dups

    parity = md5_int32(F.col("doc_id").cast("string")) % 2
    cross = cross_corpus_near_dups(
        docs.where(parity == 1), docs.where(parity == 0), threshold=0.7
    )
    print("new-batch docs duplicating the reference corpus:",
          cross.select("new_id").distinct().count())

    survivors = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    chunks = chunk_documents(survivors, chunk_tokens=128, overlap=16)
    print("chunks:", chunks.count())

    packs = pack_sequences(
        chunks.selectExpr("concat(doc_id, ':', chunk_id) AS doc_id",
                          "chunk_text AS text"),
        budget=2048,
    )
    print("packs:", packs.select("pack_id").distinct().count())

    from ig_etl_sync_spark.operators.bpe import bpe_merge_table, bpe_segment

    merges = bpe_merge_table(survivors, num_merges=8)
    print("BPE merges learned:",
          [r["merged"] for r in merges.orderBy("rank").collect()])
    budgeted = bpe_segment(survivors.select("doc_id", "text"), merges)
    print("corpus subword tokens:",
          budgeted.agg(F.sum("bpe_tokens")).first()[0])

    # C4 line-level cleaning (X60): line verdicts + the cleaned text
    from ig_etl_sync_spark.operators.textops import c4_line_filters

    c4 = c4_line_filters(docs)
    print("C4 keep rate (raw word-soup has no prose lines, so 0 is expected):",
          c4.where("keep").count(), "/", docs.count())

    # DSIR importance (X59): score the pool against a target slice
    from ig_etl_sync_spark.operators.dataprep import dsir_importance

    scores = dsir_importance(docs, F.col("lang") == F.lit("en"))
    top = scores.orderBy(F.desc("dsir_bits"), "doc_id").limit(3).collect()
    print("most target-like docs:", [(r.doc_id, r.dsir_bits) for r in top])

    # embedding-space curation (X58/X61): SemDeDup screen + PC1 spread
    from ig_etl_sync_spark.operators.dedup import semantic_dedup
    from ig_etl_sync_spark.operators.pca import power_iteration_pc1

    emb = load_table(spark, sf_dir, "embeddings")
    sem = semantic_dedup(emb, k=8, iters=1, threshold=0.4)
    print("SemDeDup kept:", sem.where("kept").count(), "/", emb.count())
    pc1 = power_iteration_pc1(emb, iters=3, dims=64)
    spread = pc1.agg(F.max("pc1_proj") - F.min("pc1_proj")).first()[0]
    print("PC1 projection spread (quantized units):", spread)

    out = tempfile.mkdtemp(prefix="corpus-demo-")
    partitioned_write(survivors, out, partition_cols=["lang"])
    print("wrote partitioned corpus to", out)


if __name__ == "__main__":
    main()
