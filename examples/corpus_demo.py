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

    kept = prepare_training_corpus(docs)
    print("after dedup + quality gate:", kept.count())

    survivors = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    chunks = chunk_documents(survivors, chunk_tokens=128, overlap=16)
    print("chunks:", chunks.count())

    packs = pack_sequences(
        chunks.selectExpr("concat(doc_id, ':', chunk_id) AS doc_id",
                          "chunk_text AS text"),
        budget=2048,
    )
    print("packs:", packs.select("pack_id").distinct().count())

    out = tempfile.mkdtemp(prefix="corpus-demo-")
    partitioned_write(survivors, out, partition_cols=["lang"])
    print("wrote partitioned corpus to", out)


if __name__ == "__main__":
    main()
