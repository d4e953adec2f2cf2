"""Streaming corpus ingestion with STANDING near-dup state: the
`foreachBatch` pipeline that finally streams the piece
``streaming/corpus.py`` documents as batch-only.

Near-dup removal is corpus-global (a new doc can pair with ANY historic
doc), so it cannot live in per-key streaming state — but it CAN live in
a persistent :class:`~ig_etl_sync_spark.operators.dedup.MinhashDedupIndex`
that each micro-batch probes and extends:

    batch → in-batch dedup (exact + minhash) → probe index (drop docs
    near-duplicating ANY prior accepted doc) → extend index with the
    survivors → append survivors to the corpus table

Both the index and the corpus are versioned tables (any ``backend=``),
so a crashed batch leaves the previous committed versions intact, and
every write is guarded by an anti-join on already-present ids — a
foreachBatch RETRY of the same data is a no-op, giving effectively-once
corpus contents on top of Spark's at-least-once replay.

Scale: per batch the probe shuffles only the batch's (id, band) pairs
against the index (the batch is the small side), and BOTH appends are
epoch-partitioned ``write_incremental`` calls — each batch writes one
fresh epoch partition while prior epochs are carried by hard link
(pointer/txnlog) or manifest re-list (manifest backend), so per-batch
cost is O(batch) data regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.dedup import (
    MinhashDedupIndex,
    exact_dedup,
    near_dup_pairs_minhash,
)
from ig_etl_sync_spark.operators.textops import normalized_text

#: corpus-table epoch partition column (one fresh partition per batch).
_EPOCH = "cepoch"


class StreamingCorpusIngest:
    """foreachBatch processor: attach with
    ``stream.writeStream.foreachBatch(ingest.process_batch)``."""

    def __init__(
        self,
        index: MinhashDedupIndex,
        corpus_table,
        *,
        threshold: float = 0.7,
    ) -> None:
        self.index = index
        self.corpus = corpus_table
        self.threshold = threshold

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        id_col, text_col = self.index.id_col, self.index.text_col
        # 1. in-batch exact dedup (content fingerprint, min-id winner)
        b = exact_dedup(
            batch.withColumn("_fp", F.md5(normalized_text(F.col(text_col)))),
            keys=["_fp"],
            tiebreak=[id_col],
        ).drop("_fp")
        # 2. in-batch near-dup (larger id of each verified pair drops)
        pairs = near_dup_pairs_minhash(
            b,
            id_col,
            text_col,
            self.index.num_hashes,
            self.index.bands,
            self.index.shingle_k,
            self.threshold,
        )
        b = b.join(
            pairs.select(F.col("id_b").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
        # 3. drop docs near-duplicating the standing corpus
        hits = self.index.probe(b, threshold=self.threshold)
        b = b.join(
            hits.select(F.col("new_id").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
        # 4. retry guard: ids already accepted are not re-admitted
        cur = self.corpus.read()
        if cur is not None:
            b = b.join(cur.select(id_col), id_col, "left_anti")
        b = b.localCheckpoint(eager=False)  # feeds index + corpus writes
        if b.isEmpty():
            return
        # 5. commit: index first (a crash between the two writes only
        # over-filters — a doc indexed but not in the corpus can never
        # be duplicated by later batches, and the retry guard re-admits
        # nothing), then the corpus append. Both writes are EPOCH-
        # partitioned incrementals: O(batch) data moves, prior epochs
        # are carried by link/manifest, never rewritten.
        self.index.extend(b)
        epoch = 0
        if cur is not None:
            epoch = int(
                cur.agg(F.max(F.col(_EPOCH).cast("int")).alias("m"))
                .first()["m"]
            ) + 1
        self.corpus.write_incremental(
            b.withColumn(_EPOCH, F.lit(epoch).cast("int")),
            _EPOCH,
            {str(epoch)},
        )

    def compact(self, *, target_files: int = 8) -> None:
        """Fold the per-batch epoch partitions of BOTH standing tables
        (index and corpus) into single-epoch versions — run between
        batches to bound small-file accumulation. Contents unchanged;
        see :meth:`MinhashDedupIndex.compact` for why this must flow
        through ``write_incremental``, not a plain rewrite."""
        self.index.compact(target_files=target_files)
        cur = self.corpus.read()
        if cur is None:
            return
        epochs = {
            str(r["e"])
            for r in cur.select(
                F.col(_EPOCH).cast("int").alias("e")
            ).distinct().collect()
        }
        rows = cur.withColumn(_EPOCH, F.lit(0).cast("int")).repartition(
            target_files, F.col(self.index.id_col)
        )
        self.corpus.write_incremental(rows, _EPOCH, epochs | {"0"})
