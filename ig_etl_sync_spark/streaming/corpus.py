"""Streaming training-corpus prep: the ingest-time half of
``operators/dataprep.prepare_training_corpus``.

What streams and what doesn't (the standard split for dedup pipelines):

- **Exact dedup** streams: the dedup key is the per-doc content
  fingerprint, so "keep the first doc ever seen with this fingerprint"
  is per-key state — ``streaming_first_seen`` keyed on the fingerprint,
  durable across micro-batches and restarts.
- **Quality/language gate** streams: pure per-row expressions, applied
  to each micro-batch as it arrives.
- **Near-dup removal streams via the STANDING INDEX, not via state**:
  minhash banding is corpus-global (a new doc can pair with ANY
  historic doc), which no per-key state can hold — but
  ``streaming/ingest.StreamingCorpusIngest`` probes and extends a
  persistent ``MinhashDedupIndex`` per micro-batch, which is the same
  global knowledge kept in a versioned table instead. A periodic
  ``near_dup_pairs_minhash`` batch compaction remains the belt-and-
  braces audit over the accumulated corpus.

State is partitioned by fingerprint across executors and checkpointed;
memory is bounded by distinct fingerprints (set ``ttl_ms`` to evict
idle ones when the corpus is unbounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.textops import (
    alpha_ratio,
    lang_id,
    normalized_text,
    token_count,
)
from ig_etl_sync_spark.streaming.stateful import streaming_first_seen


def streaming_corpus_prep(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 1000,
    min_alpha: float = 0.6,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming exact-dedup + quality/language gate over a doc stream.

    Emits (id, lang_pred, n_tokens, alpha_ratio) for each accepted doc,
    exactly once per content fingerprint across all micro-batches.
    Same gate semantics as the batch pipeline; near-dup removal is the
    batch compaction stage (see module docstring).
    """
    fp = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.md5(normalized_text(F.col(text_col))).alias("_fp"),
    )
    deduped = streaming_first_seen(fp, "_fp", ttl_ms=ttl_ms)
    scored = deduped.select(
        F.col(id_col),
        lang_id(F.col(text_col)).alias("lang_pred"),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.round(alpha_ratio(F.col(text_col)), 4).alias("alpha_ratio"),
    )
    return scored.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("alpha_ratio") >= min_alpha)
        & (F.col("lang_pred") != "und")
    )


def streaming_dedup_within_watermark(
    events,
    key_cols: "list[str]",
    ts_col: str = "ts",
    delay: str = "10 minutes",
):
    """Native bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes, so re-deliveries within ``delay`` collapse
    while state stays bounded by the watermark window — the built-in
    complement to ``stateful.streaming_first_seen`` (which remembers
    keys FOREVER unless given a TTL).

    Pick per duplicate horizon: retries/at-least-once re-deliveries
    arrive within minutes → this; cross-day exact dedup → the custom
    state form with its explicit TTL trade-off.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, delay)
        return df.dropDuplicatesWithinWatermark(key_cols)
    # batch frames: plain dedup (same result set on bounded input)
    return df.dropDuplicates(key_cols)
