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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.textops import tokens

__all__ = [
    "bm25_scores",
    "bm25_topk",
    "tfidf_top_terms",
    "vocab_coverage",
    "inverted_index",
]


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
    # narrow (id, dl, tf…) ints, but the producing chain tokenizes the
    # whole corpus — pinned once against the stats/scored diamond
    # (Catalyst won't reuse the exchange; the sf1 RRF wall halved)
    per_doc = docs.select(
        F.col(id_col), F.size(toks).alias("_dl"), *tf_cols
    ).localCheckpoint(eager=False)

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


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_len: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Characteristic-term extraction: the top-``k`` terms per document
    by smoothed TF-IDF (sklearn form: ``tf/dl * (ln((1+N)/(1+df))+1)``)
    — the labeling/clustering primitive a corpus pipeline uses to name
    near-dup clusters and topic-slice a crawl.

    Returns ``(id_col, term, tfidf)``; ranking is by ROUNDED score desc
    + term asc so a SQL oracle can replay the ordering exactly.

    Scale design (100 TB): the corpus is exploded once to (doc, term)
    pairs — the one inherently term-keyed shuffle. Document frequencies
    partial-aggregate map-side from the already-distinct (doc, term)
    table; the resulting vocabulary table is orders of magnitude
    smaller than the corpus and joins back BY TERM, co-partitioned with
    the groupBy that produced it (no extra exchange; broadcast if it
    fits). The corpus size N arrives via a broadcast single-row cross
    join, never a driver collect. Final per-doc top-k is one doc-keyed
    window.
    """
    toks = F.filter(
        tokens(F.lower(F.col(text_col))),
        lambda t: F.length(t) >= F.lit(min_token_len),
    )
    tok = docs.select(F.col(id_col), toks.alias("_ts"))
    td = tok.select(
        F.col(id_col), F.size("_ts").alias("_dl"), F.explode("_ts").alias("term")
    )
    tc = td.groupBy(id_col, "term").agg(
        F.first("_dl").alias("_dl"), F.count(F.lit(1)).alias("_cnt")
    )
    dfreq = tc.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tc.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                (F.col("_cnt").cast("double") / F.col("_dl"))
                * (
                    F.log(
                        (F.lit(1.0) + F.col("_n"))
                        / (F.lit(1.0) + F.col("_df"))
                    )
                    + F.lit(1.0)
                ),
                round_dp,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def vocab_coverage(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Corpus vocabulary head: the ``top_n`` most frequent tokens
    (normalized: lower-cased, punctuation-stripped) with their rank
    and the CUMULATIVE share of all token occurrences they cover, in
    parts-per-million — the tokenizer-design question "how much of
    the corpus do the first N vocab entries explain?".

    Returns ``(rank BIGINT, token, cnt BIGINT, coverage_ppm BIGINT)``
    ordered deterministically by (cnt desc, token asc). Coverage is
    fixed-point (``cum_cnt * 1_000_000 div total``) — integer
    arithmetic, cross-engine bit-identical.

    Scale: token counts are one explode + one partial-agg shuffle;
    the global total is a scalar broadcast; the head is
    ``orderBy().limit(top_n)`` — TakeOrderedAndProject, a per-
    partition top-n heap + driver merge, never a global sort. Only
    the ≤ top_n head rows pass through the unpartitioned cumsum
    window (bounded by construction, noted per the repo's
    no-global-window rule).
    """
    from ig_etl_sync_spark.operators.textops import normalized_text

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(n_parts, F.col(id_col)).select(
        F.explode(tokens(normalized_text(F.col(text_col)))).alias("token")
    )
    # counts feeds a DIAMOND (global total + top-n head): materialize it
    # once — Catalyst re-evaluates the whole tokenize+agg chain per
    # branch otherwise (repo invariant: no exchange reuse across
    # differently-consumed branches).
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    head = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(
        top_n
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        head.crossJoin(F.broadcast(total))
        .select(
            F.row_number()
            .over(
                Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
            )
            .cast("long")
            .alias("rank"),
            "token",
            "cnt",
            (F.sum("cnt").over(w) * F.lit(1_000_000)).alias("_num"),
            F.col("_total").alias("_den"),
        )
        .select(
            "rank",
            "token",
            "cnt",
            F.expr("_num div _den").alias("coverage_ppm"),
        )
    )


def inverted_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int | float | None = None,
) -> DataFrame:
    """Document-level inverted index: for each normalized token
    appearing in at least ``min_df`` distinct documents, the document
    frequency and the sorted posting list (comma-joined doc ids —
    string form so the driver's value-hash sees a scalar).

    ``max_df`` drops ultra-common terms (the production posture for
    100 TB — search engines drop stop-word-like terms for exactly this
    reason): an ``int`` is an absolute df ceiling, a ``float`` in
    (0, 1) is a fraction of the distinct-document count.  Crucially
    the cap is enforced with a count-only df pre-pass BEFORE the
    posting list is collected, so a 50%-df term never materializes a
    giant single row on one task.  Fractional caps compare with exact
    integer arithmetic (``df * 1_000_000 <= round(max_df * 1e6) *
    n_docs``) so the bound is reproducible cross-engine.

    Returns ``(term, df BIGINT, postings STRING)``.

    Scale: explode → distinct (term, doc) → one groupBy(term) with
    ``collect_list``; posting lists are per-term, so a stop-word-like
    term with huge df is the skew hazard — ``min_df`` trims the rare
    tail, ``max_df`` bounds the frequent head before the collect.
    """
    from ig_etl_sync_spark.operators.textops import normalized_text

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    pairs = (
        docs.repartition(n_parts, F.col(id_col)).select(
            F.col(id_col).alias("_doc"),
            F.explode(tokens(normalized_text(F.col(text_col)))).alias("term"),
        )
        .distinct()
    )
    if max_df is None:
        # One shuffle; min_df alone only trims the tail, so no pre-pass
        # is needed to bound memory.
        return (
            pairs.groupBy("term")
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.array_join(
                    F.sort_array(F.collect_list(F.col("_doc"))), ","
                ).alias("postings"),
            )
            .where(F.col("df") >= min_df)
        )
    # Capped path: count-only df pre-pass (partial-agg collapses the
    # hot term map-side, so even a 100%-df term is safe), bound-filter,
    # then semi-join pairs down to surviving terms before the collect.
    pairs = pairs.localCheckpoint(eager=False)  # pairs feeds two branches
    dfreq = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if isinstance(max_df, float):
        if not (0.0 < max_df < 1.0):
            raise ValueError("fractional max_df must be in (0, 1)")
        ndocs = pairs.agg(
            F.count_distinct(F.col("_doc")).alias("_ndocs")
        )
        kept = (
            dfreq.crossJoin(F.broadcast(ndocs))
            .where(
                (F.col("df") >= min_df)
                & (
                    F.col("df") * F.lit(1_000_000)
                    <= F.lit(int(round(max_df * 1e6))) * F.col("_ndocs")
                )
            )
            .select("term", "df")
        )
    else:
        kept = dfreq.where(
            (F.col("df") >= min_df) & (F.col("df") <= F.lit(int(max_df)))
        )
    return (
        pairs.join(kept, "term")
        .groupBy("term")
        .agg(
            F.max(F.col("df")).alias("df"),
            F.array_join(
                F.sort_array(F.collect_list(F.col("_doc"))), ","
            ).alias("postings"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` adjacent-word collocations by PMI lift — the classic
    corpus-characterization statistic (Church & Hanks 1990, public):
    ``lift(a,b) = p(ab) / (p(a)·p(b))``, ranked descending (ranking by
    lift ≡ ranking by PMI since log is monotone).

    Cross-engine determinism: counts are exact BIGINTs; the lift is ONE
    fixed-association IEEE expression ``((c_ab·Nu)·Nu) / ((Nb·c_a)·c_b)``
    evaluated identically in both engines, displayed at 4 dp and ranked
    by (rounded lift DESC, w1, w2) — the repo's rounded-measure +
    tiebreak ranking contract.

    Scale design (100 TB): token and bigram arrays are each materialized
    in their OWN select and only the COLUMN is exploded (co-projection
    rule); the two count aggregations partial-agg map-side to vocab- and
    bigram-vocab-sized relations; totals are one-row broadcasts; the
    final join keys on words (AQE broadcasts the unigram side when small,
    skew-splits stop-word keys when not). Top-k compiles to
    TakeOrderedAndProject.
    """
    # Tokenization feeds both count passes — materialize once (diamond
    # rule), then each pass explodes the COLUMN (co-projection rule).
    # Spread off the few-row-group doc scan first (repo scan-parallelism
    # rule).
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    toks = (
        docs.repartition(n_parts, F.col(id_col))
        .select(tokens(F.lower(F.col(text_col))).alias("t"))
        .localCheckpoint(eager=False)
    )
    bigram = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    # vocab-sized; consumed by both word joins AND the Nu total
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # bigram-vocab-sized pre-filter counts; consumed by Nb AND the join
    bigc = (
        toks.select(bigram.alias("bg"))
        .select(F.explode("bg").alias("z"))
        .select(F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    big = bigc.where(F.col("c_ab") >= min_count)
    nu = uni.agg(F.sum("c").alias("nu"))
    nb_all = bigc.agg(F.sum("c_ab").alias("nb"))
    lift = (
        (F.col("c_ab").cast("double") * F.col("nu")) * F.col("nu")
    ) / ((F.col("nb").cast("double") * F.col("c_a")) * F.col("c_b"))
    return (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb_all))
        .select(
            "w1",
            "w2",
            F.col("c_ab"),
            F.round(lift, 4).alias("lift"),
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(k)
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    *,
    id_col: str = "doc_id",
    k_const: int = 60,
    top_n: int | None = None,
) -> DataFrame:
    """X88: reciprocal-rank fusion of multiple retrieval rankings —
    the standard hybrid-search combiner (Cormack et al. 2009): each
    list contributes ``1e9 div (k + rank)`` (exact integer ppb; float
    reciprocals are not cross-engine stable) and lists vote without
    any score calibration, which is why RRF is the default fusion for
    BM25 + embedding retrieval.

    ``rankings``: ``{name: DataFrame(id_col, rank)}`` — each a BOUNDED
    top-N list (the expensive part is producing them; the established
    bounded retrieval ops do). Returns ``(id_col, {name}_rank ...,
    rrf_ppb)`` with absent-from-list ranks reported as 0, ordered by
    (rrf_ppb DESC, id ASC), cut to ``top_n`` when given.

    Scale: inputs are top-N lists, so every join here is
    broadcast-sized regardless of corpus size; nothing in the fusion
    rescans the corpus.
    """
    if not rankings:
        raise ValueError("rrf_fuse: at least one ranking required")
    if k_const < 1:
        raise ValueError(f"k_const={k_const} must be >= 1")
    # each bounded list is consumed TWICE (the fusion union + the
    # rank-display join-back); without a pin each consumption replays
    # the list's full retrieval chain — a whole BM25/ANN corpus scan
    # per consumer (the repo diamond rule). The lists are ≤ top-N rows,
    # so the checkpoint is byte-trivial.
    rankings = {
        name: df.localCheckpoint(eager=False)
        for name, df in rankings.items()
    }
    contribs = [
        df.select(F.col(id_col), F.col("rank").cast("long").alias("rank"))
        for df in rankings.values()
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    fused = u.groupBy(id_col).agg(
        F.sum(F.expr(f"1000000000 div ({k_const} + rank)"))
        .cast("long")
        .alias("rrf_ppb")
    )
    for name, df in rankings.items():
        fused = fused.join(
            F.broadcast(
                df.select(
                    F.col(id_col),
                    F.col("rank").cast("long").alias(f"{name}_rank"),
                )
            ),
            id_col,
            "left",
        ).withColumn(
            f"{name}_rank",
            F.coalesce(F.col(f"{name}_rank"), F.lit(0).cast("long")),
        )
    out = fused.select(
        id_col,
        *[f"{name}_rank" for name in rankings],
        "rrf_ppb",
    ).orderBy(F.col("rrf_ppb").desc(), F.col(id_col).asc())
    return out.limit(top_n) if top_n is not None else out
