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
so a crashed batch leaves the previous committed versions intact. Retry
safety is two-layered: every write is guarded by an anti-join on
already-present ids, AND both appends key their epoch partition off the
foreachBatch ``batch_id`` (stable across replays), so re-running a batch
overwrites its own partitions with the same rows. A crash BETWEEN the
index and corpus writes is therefore completed — not self-filtered — by
the retry (probe ignores same-id self-matches), giving effectively-once
corpus contents on top of Spark's at-least-once replay.

HARD REQUIREMENT: one checkpoint location per standing table pair.
Epochs are keyed off the bare ``batch_id``, which resets with a fresh
checkpoint and repeats across concurrent streams — the extend/append
guards (:func:`~ig_etl_sync_spark.sources.versioned.assert_epoch_replay`)
verify content-identity on epoch reuse, so a violation raises instead
of silently replacing a committed batch, but the supported deployment
is still one stream + one checkpoint per (index, corpus) pair.

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
    minhash_signatures_from_shingles,
    near_dup_pairs_minhash,
)
from ig_etl_sync_spark.operators.textops import normalized_text, word_shingles
from ig_etl_sync_spark.sources.versioned import assert_epoch_replay

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
        span_index=None,
    ) -> None:
        """``span_index``: optional
        :class:`~ig_etl_sync_spark.operators.spans.SpanDupIndex`. When
        given, each batch's surviving docs are ExactSubstr-CUT before
        the corpus append: spans already seen in the standing span
        index (or duplicated within the batch) are excised from the
        stored text, and the span index extends with the batch's
        PRE-CUT spans. Retry-safe with no special casing: the span
        probe counts DISTINCT (span, doc) pairs, so a replayed doc's
        own pairs from the crashed attempt's extend collapse into
        themselves — coverage is identical on replay, and the
        epoch-keyed extend overwrites its own partition."""
        self.index = index
        self.corpus = corpus_table
        self.threshold = threshold
        self.span_index = span_index

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        id_col, text_col = self.index.id_col, self.index.text_col
        # 1. in-batch exact dedup (content fingerprint, min-id winner)
        b = exact_dedup(
            batch.withColumn("_fp", F.md5(normalized_text(F.col(text_col)))),
            keys=["_fp"],
            tiebreak=[id_col],
        ).drop("_fp")
        # Hoist the per-batch text artifacts ONCE: minhash signatures
        # feed the in-batch pair pass, the index probe, AND the index
        # extend; distinct shingle sets feed both verify stages and the
        # extend's stored rows. Each consumer semi-joins the pinned
        # superset down to its (further-filtered) id set — without the
        # pins the tokenize/shingle/hash pipeline runs 3× per batch
        # The pin API splits by the size rule (CLAUDE.md): sigs is
        # NARROW (16 longs/doc) and read by three driver-latency-bound
        # consumers → cache(); sh is the WIDE shingle-array frame
        # (data volume dominates) → localCheckpoint, whose one-time
        # planning cost beats the columnar encode + InMemoryRelation
        # scan tax a cache pays on every read of a big array column.
        # sigs DERIVE from the pinned sh (round 8): array_min is
        # invariant under shingle multiplicity, so minhash over the
        # distinct-shingle arrays is bit-identical to minhash over the
        # raw shingle stream — one tokenize+shingle pass per batch
        # instead of two, and the signature explode reads the
        # MATERIALIZED arrays (no HOF re-inlining possible).
        n_parts = b.sparkSession.sparkContext.defaultParallelism
        sh = (
            b.repartition(n_parts, F.col(id_col))
            .select(
                F.col(id_col),
                F.array_distinct(
                    word_shingles(F.col(text_col), self.index.shingle_k)
                ).alias("sh"),
            )
            .localCheckpoint(eager=False)
        )
        sigs = minhash_signatures_from_shingles(
            sh, id_col, self.index.num_hashes
        ).cache()
        # every cache pin released in the finally — a failed commit
        # attempt (crash-injection matrix) must not leak executor
        # storage into the foreachBatch retry (checkpoint blocks free
        # with their frames)
        pinned = [sigs]
        try:
            self._run_batch(b, int(batch_id), sigs, sh, pinned)
        finally:
            for frame in pinned:
                frame.unpersist(blocking=False)

    def _run_batch(
        self,
        b: DataFrame,
        batch_id: int,
        sigs: DataFrame,
        sh: DataFrame,
        pinned: list[DataFrame],
    ) -> None:
        id_col, text_col = self.index.id_col, self.index.text_col
        # 2. in-batch near-dup (larger id of each verified pair drops)
        pairs = near_dup_pairs_minhash(
            b,
            id_col,
            text_col,
            self.index.num_hashes,
            self.index.bands,
            self.index.shingle_k,
            self.threshold,
            sigs=sigs,
            sh=sh,
        )
        b = b.join(
            pairs.select(F.col("id_b").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
        # 3. drop docs near-duplicating the standing corpus. Hits whose
        # ref IS the probing doc itself (same id) are ignored: on a
        # foreachBatch RETRY after a crash between the index and corpus
        # writes, every survivor is already in the index and would
        # otherwise self-match and vanish — permanently losing the
        # whole batch from the corpus. In-batch near-dups were removed
        # in step 2, so a replayed survivor's only same-batch index hit
        # is itself; genuine prior-corpus hits carry a different ref id
        # and still drop the doc. (Corner: an id REUSED for different
        # text during a crash window is judged by step 4's id guard,
        # not by similarity — acceptable, ids are assumed unique.)
        hits = self.index.probe(b, threshold=self.threshold, sigs=sigs, sh=sh)
        b = b.join(
            hits.where(F.col("new_id") != F.col("ref_id"))
            .select(F.col("new_id").alias(id_col))
            .distinct(),
            id_col,
            "left_anti",
        )
        # 4. retry guard: ids already accepted are not re-admitted
        cur = self.corpus.read()
        if cur is not None:
            b = b.join(cur.select(id_col), id_col, "left_anti")
        # feeds the emptiness probe, the epoch guard, both index
        # extends and the corpus write: cache(), not localCheckpoint —
        # the checkpoint pays physical planning + codegen at call time
        # (~1 s/batch on this chain), the cache defers it to first use
        b = shared = b.cache()
        pinned.append(shared)
        if b.isEmpty():
            return
        # 5. commit: index first, then the corpus append. BOTH writes
        # key their epoch partition off batch_id (stable across
        # Spark's at-least-once replay; +1 reserves epoch 0 for
        # build/compact), so a retry OVERWRITES the same partitions
        # with the same rows — idempotent per batch (Delta's
        # txnAppId/txnVersion pattern). A crash between the two writes
        # is completed by the retry: step 3's self-match filter keeps
        # the already-indexed survivors alive, step 4 sees them absent
        # from the corpus, the index overwrite is a no-op in content,
        # and the corpus append finally lands — effectively-once, not
        # at-most-once. Both writes are epoch-partitioned incrementals:
        # O(batch) data moves; prior epochs are carried by link or
        # manifest re-list, never rewritten.
        # Explicit epochs implement only the txnVersion half of Delta's
        # txnAppId/txnVersion pattern, so bare batch_id numbers COLLIDE
        # across checkpoints/streams: extend() and the corpus guard
        # below verify content-identity (replay passes, a colliding
        # different batch raises instead of silently replacing the
        # committed partition). One checkpoint location per standing
        # table pair remains the supported deployment.
        epoch = int(batch_id) + 1
        assert_epoch_replay(self.corpus, _EPOCH, epoch, b, id_col)
        if self.span_index is None:
            # Overlap the corpus append's STAGING (the expensive Spark
            # write of the epoch's files into an invisible .stg-* dir)
            # with the index extend (guide §2.6 / the GraphStore.sync
            # staging precedent); only the cheap pointer-flip COMMIT is
            # ordered after the extend — the crash contract requires the
            # index commit to precede the corpus COMMIT, not its
            # staging. A crash mid-overlap leaves an orphan .stg-* dir
            # reclaimed by vacuum; the replay re-stages from scratch.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1) as ex:
                staged_fut = ex.submit(
                    self.corpus.stage_incremental,
                    b.withColumn(_EPOCH, F.lit(epoch).cast("int")),
                    _EPOCH,
                    {str(epoch)},
                    cluster=False,
                )
                self.index.extend(b, epoch=epoch, sigs=sigs, sh=sh)
                staged = staged_fut.result()
            self.corpus.commit_staged(staged)
        else:
            # 6. ExactSubstr cut: excise spans already in the standing
            # span index (or duplicated in-batch) from the STORED text,
            # then extend the span index with the PRE-CUT spans (the
            # duplicated text must stay indexed or the third copy would
            # not match). Extend-before-cut also makes a crash between
            # the two span steps replay-identical: distinct (span, doc)
            # pairs make the doc's own prior extend invisible to its
            # re-probe.
            # The MINHASH extend is independent of the entire span path
            # (different table, different artifact) and the SPAN extend
            # is independent of the span probe (round 8: the probe
            # derives the batch's pairs from the shared cached spans
            # frame instead of reading the just-committed extend back,
            # so it no longer serializes behind the extend's commit) —
            # BOTH extends run on worker threads CONCURRENTLY with the
            # probe + cut (Spark schedules jobs from multiple threads
            # fairly — the GraphStore.sync staging precedent). The
            # crash-ordering contract only requires both INDEX commits
            # to precede the corpus append: the extends may land in
            # either order (a crash after just one is completed by the
            # replay the same way as before), and both `result()` calls
            # join before the corpus write. Shared pins (b, sigs, sh)
            # were materialized by the isEmpty action above; spans_b is
            # a cache() whose concurrent first materialization the
            # CacheManager dedupes across threads.
            from concurrent.futures import ThreadPoolExecutor

            ex = ThreadPoolExecutor(max_workers=3)
            try:
                fut = ex.submit(
                    self.index.extend, b, epoch=epoch, sigs=sigs, sh=sh
                )
                b, span_fut = self._span_cut(b, epoch, pinned, ex)
                # The corpus append's STAGING depends only on the cut
                # text (the probe over the shared spans_b), never on
                # either extend — stage it on the third thread while
                # both extends run (guide §2.6; round 8). Only the
                # pointer-flip COMMIT must wait for both index commits
                # (the crash-ordering contract): a crash mid-overlap
                # leaves an orphan .stg-* dir for vacuum and the replay
                # re-stages.
                staged_fut = ex.submit(
                    self.corpus.stage_incremental,
                    b.withColumn(_EPOCH, F.lit(epoch).cast("int")),
                    _EPOCH,
                    {str(epoch)},
                    cluster=False,
                )
                span_fut.result()  # span extend committed before corpus
                fut.result()  # minhash extend committed before corpus
                staged = staged_fut.result()
            finally:
                ex.shutdown(wait=True)
            self.corpus.commit_staged(staged)

    def _span_cut(self, b: DataFrame, epoch: int, pinned, ex):
        """Span-index extend (submitted to ``ex``, runs concurrently)
        + touched-only probe + text excision for one batch (step 6) —
        returns ``(b with cut texts swapped in, extend future)``."""
        sid, stext = self.span_index.id_col, self.span_index.text_col
        # one doc_spans pass feeds the extend AND the probe (the
        # same hoist as sigs/sh above; b is final by here, so no
        # semi-join slack between the two consumers). Pinned AFTER
        # the span_md5 shuffle, as cache(): InMemoryRelation
        # preserves the hash partitioning (a localCheckpoint drops
        # it — measured), so the extend's (span_md5, id) distinct
        # and the probe's span-keyed join are BOTH exchange-free on
        # the shared frame; the columns are narrow ints + one md5
        # (the wide-array cache tax doesn't apply).
        from ig_etl_sync_spark.operators.spans import _by_span, doc_spans

        spans_b = _by_span(
            doc_spans(b, sid, stext, self.span_index.k)
        ).cache()
        pinned.append(spans_b)
        span_fut = ex.submit(
            self.span_index.extend, b, epoch=epoch, spans=spans_b
        )
        # only docs with an actual cut swap in the rebuilt text —
        # clean_text is a NORMALIZED-token rejoin, and untouched
        # docs must keep their original bytes. touched_only pushes
        # that filter into the probe plan: no _full rebuild or
        # whole-batch left-join spine for rows this consumer drops.
        # The probe derives the batch's pairs from the shared cached
        # spans_b (NOT index_covers_batch read-back — round 8): the
        # probe counts DISTINCT (span, doc) pairs over batch ∪ index,
        # so whichever index version its read observes (pre- or
        # post-extend, the extend is racing on another thread) the
        # pair SET is identical — batch pairs union'd from spans_b
        # collapse with any read back from the index. Read-back was
        # faster than re-derivation SERIALLY (round 7); overlapping
        # the ~2 s extend behind the probe beats both (measured).
        cut = (
            self.span_index.probe(
                b,
                spans=spans_b,
                touched_only=True,
                spans_partitioned=True,
            )
            .where(F.col("covered_tokens") > 0)
            .select(F.col(sid), F.col("clean_text"))
        )
        b = (
            b.join(cut, sid, "left")
            .withColumn(
                stext,
                F.coalesce(F.col("clean_text"), F.col(stext)),
            )
            .drop("clean_text")
        )
        return b, span_fut

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
        self.corpus.write_incremental(
            rows, _EPOCH, epochs | {"0"}, absorb_unpartitioned=True,
            cluster=False,
        )
