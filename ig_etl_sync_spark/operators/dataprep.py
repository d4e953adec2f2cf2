"""End-to-end training-corpus preparation: the composition a real LLM
data pipeline runs over raw documents, as one declarative DataFrame
plan (SURVEY §2.9 — dedup + text analysis as first-class operators).

Stage order follows standard practice (and cost):

1. **Exact dedup** — normalized-content fingerprint, keep the smallest
   id. One hash shuffle; removes the mass of byte-identical crawl dups
   before anything expensive runs.
2. **Near-dup removal** — MinHash-LSH banding over the survivors, drop
   the larger id of every verified pair (≥ ``near_dup_threshold``
   shingle-Jaccard). Banded self-join: only (id, band) pairs shuffle,
   never documents, never O(n²).
3. **Quality + language gate** — token band, alpha-ratio floor, and
   stopword-vote language ID ≠ 'und', all single-projection JVM
   expressions fused by Catalyst into the scan of the survivors.

Deterministic end-to-end (md5 fingerprints, md5-derived minhash, fixed
tiebreaks) — replayable in a DuckDB oracle; see
``contract.training_data_prep``.

At 100 TB: stages 1-2 are the only shuffles (one hash-partition each);
stage 3 is shuffle-free. The pair list and the drop set are tiny
relative to the corpus, so the anti-joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ig_etl_sync_spark.functions.hashing import md5_int32
from ig_etl_sync_spark.operators.dedup import near_dup_pairs_minhash
from ig_etl_sync_spark.operators.textops import (
    alpha_ratio,
    lang_id,
    normalized_text,
    token_count,
    tokens,
    word_shingles,
)


def prepare_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 1000,
    min_alpha: float = 0.6,
    near_dup_threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """Returns the kept rows as (id, lang_pred, n_tokens, alpha_ratio).

    Keeps a document iff it survives exact dedup (smallest id per
    normalized-content fingerprint), is not the larger id of a verified
    minhash near-dup pair among the survivors, sits inside the token
    band, clears the alpha-ratio floor (rounded to 4 dp IN-ENGINE, so
    the threshold compare is oracle-reproducible), and gets a
    determinate language vote.
    """
    # 1. exact dedup: min id per fingerprint, then a semi-join keeps the
    # winners without carrying the fingerprint column forward.
    fp = docs.select(
        F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("_fp")
    )
    keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    # The survivor set feeds the minhash signature pass, both sides of
    # the pair-verify text join, the anti-join, and the final quality
    # projection. ReusedExchange de-duplicates some of those subtrees;
    # localCheckpoint removes the remaining re-scans (~20% wall at
    # sf0.1). Checkpoint, NOT persist: cached plans are pinned in the
    # cache manager until an explicit unpersist this builder can't
    # issue, so repeated invocations in one session leak (measured:
    # median 6.7s → 14.8s over 3 bench reps with persist); checkpoint
    # blocks are freed by the ContextCleaner when the frame is
    # dropped.
    surv = docs.join(keep, id_col, "left_semi").localCheckpoint(eager=False)

    # 2. near-dup removal among survivors (smaller id of each pair wins;
    # pairs are already oriented id_a < id_b by the dedup operator).
    pairs = near_dup_pairs_minhash(
        surv,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        threshold=near_dup_threshold,
    )
    dupes = pairs.select(F.col("id_b").alias(id_col)).distinct()
    surv = surv.join(dupes, id_col, "left_anti")

    # 3. quality + language gate (one fused projection + filter)
    scored = surv.select(
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


# -- deterministic corpus sampling ------------------------------------
#
# All three samplers key on md5(id): no RNG state, re-runs and retries
# pick the SAME rows, and any engine (or the DuckDB oracle) reproduces
# the choice bit-for-bit. Hash-ordering is the distributed substitute
# for "shuffle the corpus then take a prefix".

def deterministic_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id"
) -> DataFrame:
    """Bernoulli-style sample keeping ≈``rate`` of rows: keep iff
    ``md5(id) mod 10000 < round(rate*10000)``. One shuffle-free filter;
    the predicate pushes into the scan. The threshold is resolved to an
    exact int in Python at plan time — engine-side float floor would
    undercut binary-unrepresentable rates by a basis point (e.g.
    floor(0.07 * 10000) = 699)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate={rate} outside [0, 1]")
    bp = round(rate * 10000)
    return df.where(
        md5_int32(F.col(id_col).cast("string")) % 10000 < F.lit(bp)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the ``n_per_stratum`` hash-smallest rows of every stratum
    (e.g. a per-language quota). One shuffle on the stratum key; the
    rank is a windowed row_number WITHIN strata — never a global sort.
    Spark plans this as WindowGroupLimit (partial per-partition top-n
    before the exchange), so the shuffle carries ≤ n rows per stratum
    per input partition."""
    w = Window.partitionBy(strata_col).orderBy(
        md5_int32(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_sr", F.row_number().over(w))
        .where(F.col("_sr") <= n_per_stratum)
        .drop("_sr")
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Downsample to ≈``budget_tokens`` total: measure the corpus token
    count (one agg), derive the keep-rate, hash-filter at that rate.

    Two passes instead of "order by hash, take a cumulative-sum prefix"
    — the prefix form needs a GLOBAL ordered window (single-partition
    sort, the exact 100 TB anti-pattern); rate-based selection is one
    scalar agg plus one shuffle-free filter, at the cost of hitting the
    budget in expectation rather than exactly. The rate derivation is
    integer-exact (floor of an int/int double quotient), so an external
    oracle reproduces the selection."""
    total = df.select(
        F.sum(token_count(F.col(text_col))).alias("t")
    ).first()["t"] or 0
    if total <= budget_tokens:
        return df
    # keep-rate in basis points, floored — both engines compute
    # floor(budget*10000/total) over exact integers.
    bp = (budget_tokens * 10000) // int(total)
    return df.where(
        md5_int32(F.col(id_col).cast("string")) % 10000 < F.lit(bp)
    )


# -- benchmark decontamination ----------------------------------------

def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    ``shingle_k``-grams with an evaluation/benchmark corpus (the
    GPT-3/Gopher-style n-gram overlap check run before training).

    Returns one row per contaminated train doc:
    ``(id_col, n_grams BIGINT, n_contaminated BIGINT, frac DOUBLE)``
    where ``frac = n_contaminated / n_grams`` over the doc's DISTINCT
    shingles. Docs with zero overlap are dropped (at scale that is
    almost every doc — dropping early keeps the aggregation input to
    just the join survivors).

    Plan shape / 100 TB posture:

    - Benchmark side is small by definition (eval sets are MBs, not
      TBs): its distinct gram set builds with one tiny shuffle and
      BROADCASTS — the training corpus is never re-keyed for the join.
    - Train side: TWO independent corpus scans, each evaluating the
      shingle pipeline exactly once per doc. The explode pass carries
      ONLY (id, gram) — putting ``size(grams)`` in the same projection
      as ``explode(grams)`` re-evaluates the whole normalize+shingle
      pipeline per exploded SHINGLE, not per doc (measured: ~18× wall
      on this query; the minhash CollapseProject lesson, worse). The
      broadcast hash join filters that pass to hits ONLY, so its
      groupBy shuffles a few rows per contaminated doc, not the
      corpus. The size pass is a narrow (id, n_grams) projection that
      never explodes; the tiny hit-count table broadcasts back onto it
      — the corpus is never re-keyed.
    - The hit-count broadcast assumes decontamination's normal regime
      (contaminated docs ≪ corpus). If a run flags a large fraction,
      swap that broadcast for a doc_id shuffle join — semantics
      identical.
    - For benchmark suites too large to broadcast, swap the gram-side
      broadcast for a bloom-prefiltered shuffle join
      (operators/bloom.py) — same semantics, still no O(corpus)
      shuffle of raw text.
    """
    grams = F.array_distinct(word_shingles(F.col(text_col), shingle_k))
    bench_grams = bench.select(F.explode(grams).alias("_g")).distinct()
    exploded = train.select(F.col(id_col), F.explode(grams).alias("_g"))
    hit_counts = (
        exploded.join(F.broadcast(bench_grams), "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    sizes = train.select(
        F.col(id_col), F.size(grams).cast("long").alias("n_grams")
    )
    return sizes.join(F.broadcast(hit_counts), id_col).withColumn(
        "frac",
        F.round(
            F.col("n_contaminated").cast("double") / F.col("n_grams"), 4
        ),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing for training batches: assign every document a
    ``pack_id`` such that each pack holds ~``budget`` tokens, in a
    deterministic pseudo-random order (md5 of the id — packing in
    length or ingest order would correlate pack contents).

    Returns ``(id_col, n_tokens BIGINT, pack_id BIGINT)``. A doc's
    pack is where its START offset lands in the bucket's running token
    count, so packs can overflow by at most one doc's tail and
    oversize docs (> budget) claim their start pack — consumers chunk
    those downstream.

    ``pack_id = bucket * 2^40 + floor(start / budget)``: the 2^40
    stride holds 2^40 packs ≈ budget·2^40 tokens per bucket (~2.25e15
    at the default 2048) before cross-bucket collision — beyond the
    per-bucket token mass of a 100 TB corpus, unlike a decimal 1e6
    stride which collides at ~2.1e9 tokens. Buckets must stay below
    2^23 to keep the id in BIGINT; asserted.

    Scale design (100 TB): a true greedy packer is a sequential scan —
    instead, docs hash into ``n_buckets`` independent streams (ONE
    shuffle), each packed by a per-bucket running-sum window. Pack ids
    are bucket-prefixed so streams never coordinate; ``n_buckets``
    scales with the cluster. Same two-level trick as the equi-depth
    histogram: no global sort, no single-partition window.
    """
    if not 0 < n_buckets < 2**23:
        raise ValueError(f"n_buckets must be in (0, 2^23): {n_buckets}")
    nt = token_count(F.col(text_col)).cast("long")
    base = docs.select(
        F.col(id_col),
        nt.alias("n_tokens"),
        md5_int32(F.col(id_col).cast("string")).alias("_hk"),
    ).withColumn("_bucket", F.pmod(F.col("_hk"), F.lit(n_buckets)))
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_hk", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    pack_id = F.col("_bucket").cast("long") * F.lit(1 << 40) + F.floor(
        start / F.lit(budget)
    )
    return base.select(
        F.col(id_col), F.col("n_tokens"), pack_id.alias("pack_id")
    )


def weighted_sample_topn(
    df: DataFrame,
    n: int,
    weight: F.Column | str,
    id_col: str = "doc_id",
    round_dp: int = 8,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``n`` rows,
    inclusion probability proportional to ``weight`` (Efraimidis-
    Spirakis A-ES): key = u^(1/w) with u the md5-uniform of the id,
    keep the n largest keys. The usual use: sample documents
    proportional to token count so the sample's token mass mirrors the
    corpus.

    No RNG state — u derives from md5(id), so re-runs, retries, and
    external engines reproduce the exact selection. The key is rounded
    ``round_dp`` BEFORE ranking (id tiebreak) so the cut replays
    bit-for-bit across engines; top-n compiles to
    TakeOrderedAndProject — per-partition partial top-n, never a
    global sort.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (md5_int32(F.col(id_col).cast("string")) + F.lit(1.0)) / F.lit(
        float(2**32)
    )
    key = F.round(
        F.pow(u, F.lit(1.0) / w.cast("double")), round_dp
    ).alias("_wkey")
    return (
        df.withColumn("_wkey", key)
        .where(w > 0)
        .orderBy(F.col("_wkey").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("_wkey")
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap — the
    context-window prep step for long-document training/retrieval.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    where ``stride = chunk_tokens - overlap``; the chunk count is
    ``max(1, ceil((n_tokens - overlap) / stride))`` (integer ceil), so
    every token is covered, consecutive chunks share ``overlap``
    tokens, and an empty-or-short doc still yields one chunk. Tokens
    are whitespace-split; the chunk text is re-joined with single
    spaces (whitespace-normalizing, like every tokenized path here).

    Returns ``(id_col, chunk_id BIGINT, n_tokens BIGINT, chunk_text)``.

    Scale: a single explode-ONLY pass — the whole tokenize→slice
    pipeline lives INSIDE the generator expression (the chunk array is
    built per input row and posexploded with nothing co-projected), so
    Catalyst cannot re-evaluate the tokenization per output row (the
    repo's co-projection invariant). The input is spread on the id
    first (repo invariant: the tokenize stage is compute-bound and a
    small-file scan would serialize it on 1-2 tasks). Chunk ids are
    per-document, so downstream repartitioning is free to co-locate by
    document or spread by (document, chunk).
    """
    if chunk_tokens <= overlap:
        raise ValueError(
            f"chunk_tokens={chunk_tokens} must exceed overlap={overlap}"
        )
    stride = chunk_tokens - overlap

    def chunks_of(toks):
        # integer ceil: (n - overlap + stride - 1) div stride, min 1 —
        # exact integer arithmetic (clamped non-negative so % is safe)
        num = F.greatest(F.size(toks) - overlap + stride - 1, F.lit(0))
        nc = F.greatest(
            F.lit(1), ((num - num % stride) / stride).cast("int")
        )
        return F.transform(
            F.sequence(F.lit(0), nc - 1),
            lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
        )

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    exploded = docs.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col),
        F.posexplode(chunks_of(tokens(F.col(text_col)))).alias(
            "chunk_id", "_ctoks"
        ),
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("_ctoks").cast("long").alias("n_tokens"),
        F.array_join("_ctoks", " ").alias("chunk_text"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: "list[str] | None" = None,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str = "v_winsorized",
) -> DataFrame:
    """Winsorize ``value_col`` to its [``p_lo``, ``p_hi``] DISCRETE
    percentiles (per group when ``group_cols`` given) — the standard
    tail-clipping step before feature scaling / loss computation.

    Discrete (``percentile_disc`` ≡ DuckDB ``quantile_disc``) rather
    than interpolated percentiles, deliberately: the bound is an EXACT
    data element, so the clip comparison is bit-identical in any
    engine — interpolated bounds differ in final ulps between engines
    and a value within 1 ulp of the bound would clip differently (the
    repo's round() lesson, applied to clipping).

    Scale: one partial-agg pass for the bounds (|groups| rows) joined
    back broadcast; the clip is a pure projection.
    """
    gcols = group_cols or []
    bounds = (
        df.groupBy(*gcols)
        .agg(
            F.expr(
                f"percentile_disc({p_lo!r}) WITHIN GROUP (ORDER BY {value_col})"
            ).alias("_lo"),
            F.expr(
                f"percentile_disc({p_hi!r}) WITHIN GROUP (ORDER BY {value_col})"
            ).alias("_hi"),
        )
    )
    j = (
        df.join(F.broadcast(bounds), gcols)
        if gcols
        else df.crossJoin(F.broadcast(bounds))
    )
    return j.withColumn(
        out_col, F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    )


def class_balanced_sample(
    df: DataFrame,
    label_col: str,
    id_col: str,
    *,
    n_buckets: int = 256,
) -> DataFrame:
    """Down-sample every class to the size of the SMALLEST class — the
    deterministic label-balancing step for classifier training sets.

    Per class, rows are ranked by (md5 hash of id, id) — a replayable
    pseudo-random draw, no RNG — and the first ``min-class-count``
    survive. Returns the surviving rows (all input columns).

    Scale: the naive form (rank every row of every class) serializes
    the hottest class through one window task. Instead a NON-LOSSY
    hash-bucket pre-cut bounds that: bucket the 32-bit draw hash into
    ``n_buckets`` ordered ranges, count rows per (class, bucket) in one
    partial-agg pass, and per class keep only the shortest bucket
    prefix whose cumulative count reaches the min class count ``m``.
    Every true top-``m`` row lands in that prefix (any row in a later
    bucket has a strictly larger hash than ≥ m kept rows, so its rank
    exceeds ``m``), so the exact rank over survivors returns the
    identical relation while the hot class feeds the window only
    ~``m + class_count/n_buckets`` rows instead of ``class_count``.
    """
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError("n_buckets must be a positive power of two")
    bwidth = (1 << 32) // n_buckets
    dfh = df.withColumn(
        "_h", md5_int32(F.col(id_col).cast("string"))
    ).withColumn("_b", F.expr(f"_h div {bwidth}"))
    # one full-input partial agg; tiny (|classes| x n_buckets) result.
    # localCheckpoint: it feeds both the cutoff map and the min-class
    # count (self-join diamond rule).
    bc = (
        dfh.groupBy(label_col, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    wcum = (
        Window.partitionBy(label_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_class = bc.withColumn("_cum", F.sum("_c").over(wcum))
    m = (
        per_class.groupBy(label_col)
        .agg(F.max("_cum").alias("_n"))
        .agg(F.min("_n").alias("_m"))
    )
    cutoff = (
        per_class.crossJoin(F.broadcast(m))
        .groupBy(label_col)
        .agg(
            F.min(F.when(F.col("_cum") >= F.col("_m"), F.col("_b"))).alias(
                "_cut"
            ),
            F.min("_m").alias("_m"),
        )
    )
    pruned = dfh.join(F.broadcast(cutoff), label_col).where(
        F.col("_b") <= F.col("_cut")
    )
    w = Window.partitionBy(label_col).orderBy(F.col("_h"), F.col(id_col))
    return (
        pruned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.col("_m"))
        .select(*df.columns)
    )


def group_holdout_split(
    df: DataFrame,
    group_col: str,
    *,
    val_ppm: int = 100_000,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/validation split: EVERY row of a group lands
    in the same split, decided by the replayable md5 draw on the group
    key — near-duplicate documents from one source/site cannot straddle
    the split and leak eval content into training.

    ``val_ppm`` is the validation share in parts-per-million
    (``md5_int32(group) % 1_000_000 < val_ppm`` → ``'val'``); integer
    arithmetic end-to-end, so the assignment is identical in any engine
    and stable run-over-run (adding rows never reassigns a group).

    Scale: one fused projection, no shuffle, no state — the split of a
    100 TB corpus is a scan.
    """
    if not (0 <= val_ppm <= 1_000_000):
        raise ValueError("val_ppm must be in [0, 1_000_000]")
    h = F.pmod(md5_int32(F.col(group_col).cast("string")), F.lit(1_000_000))
    return df.withColumn(
        out_col, F.when(h < F.lit(val_ppm), F.lit("val")).otherwise(F.lit("train"))
    )


def mixture_sampling_rates(
    docs: DataFrame,
    group_col: str,
    target_ppm: dict[str, int],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Data-mixture planning: given target mixture weights (ppm per
    group — the DoReMi/Pile-style domain recipe), compute the per-group
    KEEP RATE that realizes the target composition at the largest
    total no group can exceed (downsampling only, never upsampling).

    With measured token counts ``t_g`` and weights ``w_g``, the
    achievable total is ``T = min_g floor(t_g * 1e6 / w_g)``, the
    per-group budget ``d_g = floor(T * w_g / 1e6)``, and the keep rate
    ``floor(d_g * 1e6 / t_g)`` ppm — every step an integer floor, so
    the plan is reproducible in any engine. Feed the rates into
    :func:`deterministic_sample`-style md5 filters per group.

    Returns ``(group, tokens BIGINT, target_ppm BIGINT, keep_ppm
    BIGINT)`` for the groups present in ``target_ppm`` (groups not in
    the recipe are dropped — rate 0 by definition).

    Scale: one token-count partial agg over the corpus (|groups| rows
    out), then pure arithmetic on the broadcast group table.
    """
    from ig_etl_sync_spark.operators.textops import token_count

    if sum(target_ppm.values()) != 1_000_000:
        raise ValueError(
            f"target_ppm must sum to 1_000_000, got {sum(target_ppm.values())}"
        )
    if any(v <= 0 for v in target_ppm.values()):
        raise ValueError("every target_ppm weight must be positive")
    spark = docs.sparkSession
    targets = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(target_ppm.items())],
        f"{group_col} string, target_ppm long",
    )
    toks = (
        docs.groupBy(group_col)
        .agg(F.sum(token_count(F.col(text_col))).cast("long").alias("tokens"))
        .join(F.broadcast(targets), group_col)
    )
    cap = toks.agg(
        F.min(F.expr("tokens * 1000000 div target_ppm")).alias("_T")
    )
    return (
        toks.crossJoin(F.broadcast(cap))
        .select(
            group_col,
            "tokens",
            "target_ppm",
            F.expr(
                "(_T * target_ppm div 1000000) * 1000000 div tokens"
            ).cast("long").alias("keep_ppm"),
        )
    )


def dsir_importance(
    docs: DataFrame,
    target_pred: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """DSIR-style data selection scores (Xie et al. 2023,
    arXiv:2302.03169): rank a raw pool by how target-like each document
    is under hashed-n-gram bag-of-words language models — the published
    cheap proxy for "select pretraining data that looks like the
    high-quality target domain".

    Features are word unigrams + bigrams of the normalized text, hashed
    into ``buckets`` bins with the repo's cross-engine md5 primitive.
    The importance weight of a document is the log-likelihood ratio
    ``sum_g log p_target(g) - log p_raw(g)`` with add-one smoothing;
    this implementation keeps it EXACT-integer (the repo's float-free
    log2 discipline, X53) by flooring each factor's log2 separately:

    ``dsir_bits = sum_g [bitlen(ct(b)+1) - bitlen(cr(b)+1)]
                  + n_grams * [bitlen(Nr+B) - bitlen(Nt+B)]``

    where ``ct/cr`` are bucket occurrence counts in the target/raw
    corpus, ``Nt/Nr`` their totals, and ``bitlen(x) = floor(log2 x)``
    via ``length(bin(x)) - 1``. Flooring each log2 term separately
    (instead of the product's) keeps every quantity < 2^63 at ANY
    corpus size — no BIGINT product of two corpus-sized counts — and
    is replayable bit-for-bit in any engine.

    Returns ``(id_col, n_grams BIGINT, dsir_bits BIGINT)`` for NON-
    target documents with at least one token; higher = more
    target-like. Feed the scores into ``weighted_sample_topn`` or a
    threshold filter for the resampling step.

    Scale: one gram explode over each corpus side, bucket counts
    partial-agg to <= ``buckets`` rows, the weight table broadcasts,
    and the pool shuffles once on the doc id for the score sum. No
    vocabulary-sized state anywhere — the hash trick bounds the model
    at ``buckets`` rows by construction.
    """
    from ig_etl_sync_spark.operators.textops import normalized_text, tokens

    if buckets < 2:
        raise ValueError(f"buckets={buckets} must be >= 2")

    # Gram construction is the compute-bound stage and the doc scan is
    # few partitions (50k docs ≈ 2 parquet row-groups: measured 74 s of
    # a 88 s sf1 wall on 2 of 8 cores) — spread first, the
    # prefix_filter_jaccard precedent.
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    docs = docs.repartition(n_parts, F.col(id_col))

    tk = docs.select(
        F.col(id_col),
        target_pred.alias("_is_t"),
        tokens(normalized_text(F.col(text_col))).alias("_t"),
    )
    toks = F.col("_t")
    # slice+zip_with, NEVER element_at(toks, i) inside the lambda:
    # projection collapse inlines the tokenize expression into the
    # lambda body, re-tokenizing the document once PER ELEMENT
    # (measured: 70 s of a 78 s sf1 wall; the zip_with form is 4 s).
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    grams = tk.select(
        id_col, "_is_t", F.concat(toks, bigrams).alias("_grams")
    )
    # explode-only pass (never co-project the array with its explode)
    ex = grams.select(
        id_col, "_is_t", F.explode("_grams").alias("_gram")
    ).select(
        id_col, "_is_t", (md5_int32(F.col("_gram")) % F.lit(buckets)).alias("_b")
    )
    ex = ex.localCheckpoint(eager=False)  # feeds counts AND the score join

    counts = (
        ex.groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).cast("long").alias("_ct"),
            F.sum(F.when(F.col("_is_t"), 0).otherwise(1)).cast("long").alias("_cr"),
        )
    )
    bitlen = lambda c: (F.length(F.bin(c)) - F.lit(1)).cast("long")  # noqa: E731
    weights = counts.select(
        "_b",
        (bitlen(F.col("_ct") + 1) - bitlen(F.col("_cr") + 1)).alias("_wb"),
    )
    totals = counts.agg(
        (
            bitlen(F.sum("_cr") + F.lit(buckets))
            - bitlen(F.sum("_ct") + F.lit(buckets))
        ).alias("_shift")
    )
    return (
        ex.where(~F.col("_is_t"))
        .join(F.broadcast(weights), "_b")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            (F.sum("_wb") + F.count(F.lit(1)) * F.first("_shift"))
            .cast("long")
            .alias("dsir_bits"),
        )
    )


def source_frequency_cap(
    docs: DataFrame,
    cap: int,
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    seed: str = "cap-v1",
    salt: int = 16,
) -> DataFrame:
    """X81: per-source document cap (the RefinedWeb/C4 "don't let one
    domain dominate" curation step): keep at most ``cap`` docs per
    ``group_col``, chosen by seeded-hash order — an unbiased,
    reproducible pseudo-random subset, NOT first-k by id (which biases
    toward whatever the id order encodes, usually crawl time).

    EXACT two-phase selection, skew-bounded (the X38 rank-window
    posture): a single ``Window.partitionBy(group)`` puts a 10B-doc
    domain in one task. Phase 1 ranks within ``(group, pmod(h, salt))``
    partitions and keeps partial rank <= cap — every doc of the group's
    true hash-order top-``cap`` has partial rank <= cap in its own salt
    slice (rows ranked above it there are above it globally), so the
    phase-1 survivors are a superset; each group shrinks to at most
    ``salt * cap`` rows. Phase 2 ranks the survivors exactly; its
    hottest partition is ``salt * cap`` rows REGARDLESS of group skew.

    Returns the kept rows (all input columns). Deterministic for fixed
    ``(seed, cap)`` — ``salt`` changes the plan, never the result (the
    selected set is the global hash-order top-cap either way).
    """
    if cap < 1:
        raise ValueError(f"cap={cap} must be >= 1")
    if salt < 1:
        raise ValueError(f"salt={salt} must be >= 1")
    h = md5_int32(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    hashed = docs.withColumn("_h", h)
    w1 = Window.partitionBy(
        F.col(group_col), F.pmod(F.col("_h"), F.lit(salt))
    ).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    pruned = (
        hashed.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= cap)
        .drop("_r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return (
        pruned.withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= cap)
        .drop("_r2", "_h")
    )


def soft_dedup_weights(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """X82: SOFT deduplication — instead of dropping near-duplicates,
    weight every document by ``1 / |near-dup cluster|`` so a family of
    n copies contributes one document's worth of training mass in
    expectation (the repetition-discounting alternative to hard dedup
    when data is scarce; cf. the data-constrained-scaling literature).

    Pipeline: minhash-LSH verified pairs → connected components
    (``clustering.resolve_dup_clusters``) → exact integer weight
    ``1000000 div cluster_size`` (ppm — float division is not
    cross-engine stable; the CLAUDE.md ratio rule). Docs in no pair are
    singletons with weight 1000000.

    Returns ``(id_col, cluster_size BIGINT, weight_ppm BIGINT)`` for
    EVERY input doc. Scale: pairs are LSH-blocked (never all-pairs),
    components converge in O(log diameter) label-prop rounds, and the
    final join is id-keyed.
    """
    from ig_etl_sync_spark.operators.clustering import resolve_dup_clusters

    pairs = near_dup_pairs_minhash(
        docs, id_col, text_col, num_hashes, bands, shingle_k, threshold
    ).select("id_a", "id_b")
    comp = resolve_dup_clusters(pairs).select(
        F.col("doc_id").alias(id_col),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_size"), F.lit(1).cast("long")).alias(
                "cluster_size"
            ),
        )
        .withColumn(
            "weight_ppm",
            F.expr("1000000 div cluster_size").cast("long"),
        )
    )


def padding_efficiency(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 32,
    batch_size: int = 16,
    salt: int = 8,
    seed: str = "pad-v1",
) -> DataFrame:
    """X87: length-bucketed batch packing with an exact padding-waste
    audit — the training-loader question "how many pad tokens does this
    batching scheme burn?". Docs are bucketed by token-length range
    (``n_tokens div bucket_width``), pseudo-randomly ordered INSIDE
    each bucket by seeded hash, grouped into batches of ``batch_size``,
    and every batch pays ``max_len * |batch|`` tokens — the standard
    bucketed-batching scheme (cf. fairseq/t5-style length grouping);
    the report quantifies the residual waste per bucket in exact ppm.

    Scale posture: the per-bucket ordering is a SALTED two-pass global
    rank, not one window per bucket — rank within ``(bucket, pmod(h,
    salt))`` slices plus broadcast slice-count offsets reconstructs an
    exact global rank over the order ``(salt_slice, h, id)`` (itself a
    deterministic seeded shuffle), so the hottest window partition is
    ``bucket/salt``, never a whole hot bucket (the X81 skew posture;
    a 10B-doc web corpus concentrates mass in few length buckets).

    Returns per bucket: ``(len_bucket, n_docs, n_batches, real_tokens,
    padded_tokens, waste_ppm)``. Empty docs (0 tokens) land in bucket
    0 and cost nothing.
    """
    from pyspark.sql import Window

    from ig_etl_sync_spark.functions.hashing import md5_int32
    from ig_etl_sync_spark.operators.textops import token_count

    if bucket_width < 1:
        raise ValueError(f"bucket_width={bucket_width} must be >= 1")
    if batch_size < 1:
        raise ValueError(f"batch_size={batch_size} must be >= 1")
    if salt < 1:
        raise ValueError(f"salt={salt} must be >= 1")
    h = md5_int32(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    base = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tok"),
    ).withColumn(
        "len_bucket", F.expr(f"n_tok div {bucket_width}").cast("long")
    ).withColumn("_h", h).withColumn(
        "_sl", F.pmod(F.col("_h"), F.lit(salt))
    )
    # feeds the slice counts AND the ranked join (diamond rule)
    base = base.localCheckpoint(eager=False)
    w1 = Window.partitionBy("len_bucket", "_sl").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    ranked = base.withColumn("_r1", F.row_number().over(w1))
    # broadcast offsets: cumulative doc counts of the PRECEDING salt
    # slices of the same bucket ((buckets x salt) rows, data-free)
    woff = (
        Window.partitionBy("len_bucket")
        .orderBy("_sl")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        base.groupBy("len_bucket", "_sl")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0)).cast("long")
        )
        .select("len_bucket", "_sl", "_off")
    )
    batched = (
        ranked.join(F.broadcast(offs), ["len_bucket", "_sl"])
        .withColumn("_r", F.col("_off") + F.col("_r1"))
        .withColumn(
            "batch_id", F.expr(f"(_r - 1) div {batch_size}").cast("long")
        )
    )
    per_batch = batched.groupBy("len_bucket", "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("_bn"),
        F.sum("n_tok").cast("long").alias("_breal"),
        F.max("n_tok").cast("long").alias("_bmax"),
    )
    return (
        per_batch.groupBy("len_bucket")
        .agg(
            F.sum("_bn").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("_breal").cast("long").alias("real_tokens"),
            F.sum(F.col("_bmax") * F.col("_bn")).cast("long").alias(
                "padded_tokens"
            ),
        )
        .withColumn(
            "waste_ppm",
            F.when(F.col("padded_tokens") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "(padded_tokens - real_tokens) * 1000000"
                    " div padded_tokens"
                ).cast("long")
            ),
        )
    )


def temporal_split_leakage(
    events: DataFrame,
    cut_micros: int,
    *,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """X96: time-based holdout audit — before trusting a "train on the
    past, evaluate on the future" split, measure per event type how
    many evaluation-side keys ALSO appear on the training side (user-
    level leakage: a model that memorizes a user's past behaves
    differently on that user's future, inflating offline metrics; the
    leakage-SAFE alternative is the X45 group split). Comparison in
    exact microseconds (`unix_micros` — never a second cast; repo
    temporal rule); ratios exact ppm.

    Shape: one (type, key) grouped pass with boolean side flags, one
    per-type agg — two narrow shuffles, no window.

    Returns ``(type_col, users_train, users_test, users_both,
    leak_ppm)`` where ``leak_ppm = users_both * 1e6 div users_test``
    (0 when the test side is empty).
    """
    e = events.select(
        F.col(type_col),
        F.col(key_col),
        (F.unix_micros(F.col(ts_col)) < F.lit(int(cut_micros))).alias(
            "_is_train"
        ),
    )
    per_key = e.groupBy(type_col, key_col).agg(
        F.max(F.col("_is_train").cast("int")).alias("_tr"),
        F.max((~F.col("_is_train")).cast("int")).alias("_te"),
    )
    return (
        per_key.groupBy(type_col)
        .agg(
            F.sum("_tr").cast("long").alias("users_train"),
            F.sum("_te").cast("long").alias("users_test"),
            F.sum(F.col("_tr") * F.col("_te")).cast("long").alias(
                "users_both"
            ),
        )
        .withColumn(
            "leak_ppm",
            F.when(F.col("users_test") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr("users_both * 1000000 div users_test").cast("long")
            ),
        )
    )


def unimax_allocation(
    docs: DataFrame,
    group_col: str,
    *,
    epochs: int,
    budget_ppm: int,
    text_col: str = "text",
) -> DataFrame:
    """X101: UniMax language-sampling allocation (Chung et al. 2023,
    arXiv:2304.09151) — the budget-driven complement to X52's
    downsample-only recipe planner: given a total token budget and a
    per-group repeat cap of ``epochs`` passes, split the budget as
    EVENLY as possible across groups, never repeating any group more
    than ``epochs`` times. Low-resource groups get up-sampled (to the
    cap) where X52 would only ever shrink them; head groups absorb the
    freed budget equally.

    The published algorithm is sequential water-filling (smallest
    group first); the capped set is provably a PREFIX of the
    cap-ascending order, so it has a closed form over window
    cumulatives — with ``cap_g = epochs * n_g`` sorted ascending,
    group ``j`` is capped iff every prefix row ``i <= j`` satisfies
    ``cap_i * (k - i + 1) <= B - cum_before_i``; the uncapped rows
    split the remainder as ``q = R div m`` with the first ``R mod m``
    of them (cap-ascending, group tiebreak) getting ``q + 1``. Every
    step is BIGINT floor arithmetic on token counts — replayable
    bit-for-bit in any engine (the X52 discipline).

    ``budget_ppm`` states the budget as parts-per-million of the
    corpus's own total token count so one contract constant scales
    across SFs (1_500_000 = "1.5 corpus passes worth of tokens").

    Returns ``(group_col, n_tokens BIGINT, cap_tokens BIGINT,
    capped BOOLEAN, alloc_tokens BIGINT, epochs_ppm BIGINT)`` with
    ``epochs_ppm = alloc * 1e6 div n_tokens`` (the per-group repeat
    factor the sampler realizes).

    Scale: one token-count partial agg over the corpus (|groups| rows
    out); the water-filling windows run on that |groups|-row frame —
    single-partition by construction and bounded by the group
    vocabulary (languages/domains), never by corpus size.
    """
    from ig_etl_sync_spark.operators.textops import token_count

    if epochs <= 0:
        raise ValueError("epochs must be a positive integer")
    if budget_ppm <= 0:
        raise ValueError("budget_ppm must be a positive integer")

    toks = docs.groupBy(group_col).agg(
        F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    asc = Window.orderBy("cap_tokens", group_col)
    prefix = asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    before = asc.rowsBetween(Window.unboundedPreceding, -1)

    t = (
        toks.withColumn(
            "cap_tokens", (F.lit(int(epochs)) * F.col("n_tokens")).cast("long")
        )
        .withColumn("_N", F.sum("n_tokens").over(w_all).cast("long"))
        .withColumn(
            "_B",
            F.expr(f"_N * {int(budget_ppm)} div 1000000").cast("long"),
        )
        .withColumn("_k", F.count(F.lit(1)).over(w_all))
        .withColumn("_i", F.row_number().over(asc))
        .withColumn(
            "_cum_before", F.coalesce(F.sum("cap_tokens").over(before), F.lit(0))
        )
        .withColumn(
            "_flag",
            (
                F.col("cap_tokens") * (F.col("_k") - F.col("_i") + 1)
                <= F.col("_B") - F.col("_cum_before")
            ).cast("int"),
        )
        .withColumn("capped", F.min("_flag").over(prefix) == 1)
    )
    t = (
        t.withColumn(
            "_S",
            F.coalesce(
                F.sum(
                    F.when(F.col("capped"), F.col("cap_tokens"))
                ).over(w_all),
                F.lit(0),
            ),
        )
        .withColumn("_p", F.sum(F.col("capped").cast("int")).over(w_all))
        .withColumn("_m", F.col("_k") - F.col("_p"))
        .withColumn("_R", F.col("_B") - F.col("_S"))
        .withColumn(
            "_ur",
            F.sum(F.when(F.col("capped"), 0).otherwise(1)).over(prefix),
        )
    )
    alloc = F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
        F.expr("_R div _m")
        + F.when(F.col("_ur") <= F.expr("_R % _m"), F.lit(1)).otherwise(
            F.lit(0)
        )
    )
    return t.withColumn("alloc_tokens", alloc.cast("long")).select(
        group_col,
        "n_tokens",
        "cap_tokens",
        "capped",
        "alloc_tokens",
        F.expr(
            "case when n_tokens = 0 then 0 "
            "else alloc_tokens * 1000000 div n_tokens end"
        )
        .cast("long")
        .alias("epochs_ppm"),
    )


def realize_sampling_plan(
    docs: DataFrame,
    plan: DataFrame,
    *,
    group_col: str,
    id_col: str = "doc_id",
    epochs_col: str = "epochs_ppm",
) -> DataFrame:
    """X104: materialize a per-group repeat plan (X101 UniMax
    ``epochs_ppm``, or any ``(group, epochs_ppm)`` recipe) into the
    actual repeated-document relation a training run consumes: every
    doc of group ``g`` is emitted ``floor(e/1e6)`` whole times plus one
    more copy iff its seeded md5 draw falls under ``e mod 1e6`` — so
    realized group totals hit the plan within one doc's tokens, the
    fractional epoch is an UNBIASED deterministic subset (no RNG state,
    replayable anywhere, stable under corpus growth: a doc's draw never
    depends on other docs), and a doc's copies are identifiable
    (``copy`` index) for epoch-aware shuffling downstream
    (:func:`training_shuffle` seeds can fold the copy index in).

    Returns the input rows with two added columns::

        (..., n_copies BIGINT, copy BIGINT)   -- one row per copy,
                                                 copy in [0, n_copies)

    Rows with ``n_copies = 0`` (dropped by the fractional draw under a
    sub-1-epoch plan) are not emitted.

    Scale: one broadcast join of the |groups|-row plan + an
    ``explode(sequence(...))`` fan-out — map-side only, no shuffle; the
    output is exactly plan-realization-sized (sum of group allocations),
    never corpus × max-epochs.
    """
    e = F.col("_eppm")
    whole = F.expr("_eppm div 1000000")
    frac = F.expr("_eppm % 1000000")
    draw = F.pmod(
        md5_int32(F.concat(F.lit("realize:"), F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    n_copies = (whole + F.when(draw < frac, 1).otherwise(0)).cast("long")
    return (
        docs.join(
            F.broadcast(
                plan.select(
                    F.col(group_col), F.col(epochs_col).alias("_eppm")
                )
            ),
            group_col,
        )
        .withColumn("n_copies", n_copies)
        .where(F.col("n_copies") > 0)
        .withColumn(
            "copy",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.col("n_copies") - F.lit(1)
                )
            ),
        )
        .drop("_eppm")
    )


def doremi_domain_weights(
    docs: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    lam_num: int = 3,
    lam_den: int = 4,
    eta_num: int = 1,
    eta_den: int = 1,
    smooth_ppm: int = 200_000,
) -> DataFrame:
    """X109: DoReMi-shaped domain reweighting (Xie et al. 2023,
    arXiv:2305.10429) — per-domain mixture weights from EXCESS LOSS,
    kept exact end to end by base-2 integer exponentials.

    DoReMi's Group-DRO loop upweights domains where the proxy model's
    loss exceeds a reference model's. This closed-form instantiation
    replaces the inner proxy-training loop with the repo's standing
    n-gram LMs: for each domain d,

        excess_d = max(0, L_shared(d) - L_own(d))

    where ``L_shared`` is the mean per-bigram surprisal of domain d's
    text under the whole-corpus X99 backoff mixture and ``L_own`` is
    the same under d's OWN counts — the domain-specialist reference.
    High excess = the shared model underserves the domain = upweight
    (the DoReMi direction; excess clipped at 0 as in the paper). Both
    models smooth the unigram leg add-one over the shared pool
    vocabulary (the X107 formula), so every bit count is an exact
    BIGINT in any engine.

    The exponentiated-gradient step stays exact by working in base 2:
    the update exp(eta * excess) becomes a BIT SHIFT of
    ``shift_d = (eta_num * excess_d) div (eta_den * 1e6)`` whole bits;
    weights are ``raw_d = 1e9 >> min(max_shift - shift_d, 62)``
    normalized to ppm (floor division — Sum(weight) <= 1e6 by at most
    |domains| ppm), then smoothed with the uniform distribution:
    ``w = ((1e6 - smooth_ppm)*alpha + smooth_ppm*(1e6 div G)) div 1e6``
    — DoReMi's uniform-mixing stabilizer, and the floor that keeps a
    fully-outshifted domain alive.

    Returns one row per domain: ``(group_col, n_bigrams BIGINT,
    shared_surprisal_ppm, own_surprisal_ppm, excess_ppm, shift_bits,
    weight_ppm)``.

    Scale: tokenize once (checkpointed), ONE bigram explode feeding
    both models' counts; the whole-corpus type tables broadcast back
    (the X99 posture) while the per-domain tables join on their
    composite keys (same row order as the bigram stream — a standard
    shuffle join, never a broadcast of corpus-sized state); everything
    after the per-domain aggregation runs on |domains| rows.
    """
    if not (0 < lam_num < lam_den):
        raise ValueError(
            f"lambda = {lam_num}/{lam_den} must lie strictly in (0, 1)"
        )
    if not (eta_num >= 0 and eta_den > 0):
        raise ValueError("eta must be a non-negative rational")
    if not (0 <= smooth_ppm <= 1_000_000):
        raise ValueError("smooth_ppm must lie in [0, 1e6]")
    from ig_etl_sync_spark.operators.textops import normalized_text, tokens

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    t = (
        docs.repartition(n_parts, F.col(id_col))
        .select(
            F.col(group_col).alias("_g"),
            tokens(normalized_text(F.col(text_col))).alias("_t"),
        )
        .localCheckpoint(eager=False)  # unigram + bigram branches
    )
    exu = t.select("_g", F.explode("_t").alias("_w"))
    tf_all = exu.groupBy("_w").agg(
        F.count(F.lit(1)).cast("long").alias("_tfg")
    )
    tf_dom = exu.groupBy("_g", "_w").agg(
        F.count(F.lit(1)).cast("long").alias("_tfd")
    )
    totals = tf_all.agg(
        F.sum("_tfg").cast("long").alias("_ng"),
        F.count(F.lit(1)).cast("long").alias("_v"),
    )
    n_dom = t.groupBy("_g").agg(
        F.sum(F.size("_t")).cast("long").alias("_nd")
    )
    sz = F.size(F.col("_t"))
    ln = F.greatest(sz - F.lit(1), F.lit(0))
    ex = (
        t.select(
            "_g",
            F.explode(
                F.zip_with(
                    F.slice(F.col("_t"), 1, ln),
                    F.slice(F.col("_t"), 2, ln),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("_b"),
        )
        .select("_g", F.col("_b.w1").alias("_w1"), F.col("_b.w2").alias("_w2"))
        .localCheckpoint(eager=False)  # both models' count aggs + score join
    )
    c2_all = ex.groupBy("_w1", "_w2").agg(
        F.count(F.lit(1)).cast("long").alias("_c2g")
    )
    c1_all = ex.groupBy("_w1").agg(
        F.count(F.lit(1)).cast("long").alias("_c1g")
    )
    c2_dom = ex.groupBy("_g", "_w1", "_w2").agg(
        F.count(F.lit(1)).cast("long").alias("_c2d")
    )
    c1_dom = ex.groupBy("_g", "_w1").agg(
        F.count(F.lit(1)).cast("long").alias("_c1d")
    )
    ln_, ld, lr = lam_num, lam_den, lam_den - lam_num

    def _bits(c1: str, c2: str, tf: str, n: str) -> str:
        d = f"({n} + _v)"
        mix = (
            f"({ld} * {c1} * {d}) div "
            f"({ln_} * {c2} * {d} + {lr} * {c1} * ({tf} + 1))"
        )
        uni = f"{d} div ({tf} + 1)"
        return (
            f"length(bin(CASE WHEN {c1} > 0 THEN {mix} ELSE {uni} END)) - 1"
        )

    scored = (
        ex.join(F.broadcast(c2_all), ["_w1", "_w2"])
        .join(F.broadcast(c1_all), ["_w1"])
        .join(F.broadcast(tf_all), F.col("_w2") == F.col("_w"))
        .join(c2_dom, ["_g", "_w1", "_w2"])
        .join(c1_dom, ["_g", "_w1"])
        .join(
            tf_dom.select(
                F.col("_g").alias("_gd"),
                F.col("_w").alias("_wd"),
                "_tfd",
            ),
            (F.col("_g") == F.col("_gd")) & (F.col("_w2") == F.col("_wd")),
        )
        .join(F.broadcast(n_dom), "_g")
        .crossJoin(F.broadcast(totals))
        .select(
            "_g",
            F.expr(_bits("_c1g", "_c2g", "_tfg", "_ng"))
            .cast("long")
            .alias("_bs"),
            F.expr(_bits("_c1d", "_c2d", "_tfd", "_nd"))
            .cast("long")
            .alias("_bo"),
        )
    )
    per_dom = scored.groupBy(F.col("_g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.expr("sum(_bs) * 1000000 div count(1)")
        .cast("long")
        .alias("shared_surprisal_ppm"),
        F.expr("sum(_bo) * 1000000 div count(1)")
        .cast("long")
        .alias("own_surprisal_ppm"),
    )
    eta_sc = eta_den * 1_000_000
    per_dom = per_dom.withColumn(
        "excess_ppm",
        F.greatest(
            F.lit(0).cast("long"),
            F.col("shared_surprisal_ppm") - F.col("own_surprisal_ppm"),
        ),
    ).withColumn(
        "shift_bits",
        F.expr(f"{eta_num} * excess_ppm div {eta_sc}").cast("long"),
    )
    # |domains|-row tail: max shift + normalization via one-row frames
    per_dom = per_dom.localCheckpoint(eager=False)
    mx = per_dom.agg(F.max("shift_bits").alias("_mx"))
    raw = per_dom.crossJoin(F.broadcast(mx)).withColumn(
        "_raw",
        # BIGINT shift: Java long >> masks the amount & 63, so the
        # 62-clamp is honored; an INT literal would wrap mod 32.
        F.expr(
            "shiftright(cast(1000000000 as bigint),"
            " cast(least(_mx - shift_bits, 62) as int))"
        ).cast("long"),
    )
    tot = raw.agg(F.sum("_raw").cast("long").alias("_s"))
    g_cnt = per_dom.agg(F.count(F.lit(1)).cast("long").alias("_gc"))
    return (
        raw.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(g_cnt))
        .withColumn("_alpha", F.expr("_raw * 1000000 div _s").cast("long"))
        .withColumn(
            "weight_ppm",
            F.expr(
                f"(({1_000_000 - smooth_ppm} * _alpha)"
                f" + {smooth_ppm} * (1000000 div _gc)) div 1000000"
            ).cast("long"),
        )
        .select(
            group_col,
            "n_bigrams",
            "shared_surprisal_ppm",
            "own_surprisal_ppm",
            "excess_ppm",
            "shift_bits",
            "weight_ppm",
        )
    )
