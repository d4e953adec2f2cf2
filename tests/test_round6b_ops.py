"""Round-6 second-wave operators: source overlap matrix (X85) and
content-defined chunking (X86)."""

import hashlib

from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.profiling import source_overlap_matrix
from ig_etl_sync_spark.operators.spans import cdc_chunk_stats, cdc_chunks


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# -- X85 source overlap matrix ----------------------------------------

def test_source_overlap_exact_jaccard(spark):
    # srcA: shingles over "a b c d e f" (k=3): {a b c, b c d, c d e, d e f}
    # srcB: "c d e f g"             (k=3): {c d e, d e f, e f g}
    # shared = {c d e, d e f} -> 2; union = 4 + 3 - 2 = 5
    docs = _docs(
        spark,
        [(1, "srcA", "a b c d e f"), (2, "srcB", "c d e f g")],
    )
    rows = source_overlap_matrix(docs, shingle_k=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.group_a, r.group_b) == ("srcA", "srcB")
    assert (r.n_shared, r.n_a, r.n_b) == (2, 4, 3)
    assert r.jaccard_ppm == 2 * 1_000_000 // 5


def test_source_overlap_disjoint_pairs_not_emitted(spark):
    docs = _docs(
        spark,
        [(1, "srcA", "a b c d"), (2, "srcB", "x y z w"), (3, "srcC", "a b c d")],
    )
    rows = source_overlap_matrix(docs, shingle_k=3).collect()
    # only (srcA, srcC) intersect — identical sets, jaccard 1.0
    assert len(rows) == 1
    assert rows[0].group_a == "srcA" and rows[0].group_b == "srcC"
    assert rows[0].jaccard_ppm == 1_000_000


def test_source_overlap_df_cap_filters_universal_shingles(spark):
    # "c d e" appears in all three sources; cap at 2 drops it
    docs = _docs(
        spark,
        [(1, "srcA", "c d e"), (2, "srcB", "c d e"), (3, "srcC", "c d e x")],
    )
    full = source_overlap_matrix(docs, shingle_k=3)
    capped = source_overlap_matrix(docs, shingle_k=3, max_groups_per_shingle=2)
    assert full.count() == 3  # all pairs share "c d e"
    # after dropping the universal shingle nothing intersects
    assert capped.count() == 0


# -- X86 content-defined chunking --------------------------------------

def _tok(text):
    return [t for t in text.strip().lower().split() if t]


def test_cdc_chunks_partition_token_stream(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    chunks = cdc_chunks(docs, k=4, divisor=16)
    got = (
        chunks.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("n"))
        .collect()
    )
    want = {
        r["doc_id"]: len(_tok(r["text"]))
        for r in docs.select("doc_id", "text").collect()
    }
    got_map = {r["doc_id"]: r["n"] for r in got}
    assert got_map == {k: v for k, v in want.items() if v > 0}


def test_cdc_chunks_resynchronize_after_prefix_edit(spark):
    # a long shared tail after an inserted prefix: content-defined
    # boundaries re-sync, so the two docs share at least one chunk hash
    # (fixed-size blocks would shift and share none unless aligned).
    base = " ".join(f"w{i % 7}x{i % 11}" for i in range(400))
    docs = _docs(
        spark,
        [(1, "s", base), (2, "s", "inserted prefix tokens " + base)],
    )
    ch = cdc_chunks(docs, k=4, divisor=8)
    a = {r.chunk_md5 for r in ch.where(F.col("doc_id") == 1).collect()}
    b = {r.chunk_md5 for r in ch.where(F.col("doc_id") == 2).collect()}
    assert a & b, "no shared chunk after prefix edit — boundaries not content-defined"


def test_cdc_chunks_deterministic_and_hash_correct(spark):
    docs = _docs(spark, [(1, "s", "Alpha beta gamma delta epsilon zeta")])
    rows = sorted(
        cdc_chunks(docs, k=4, divisor=16).collect(),
        key=lambda r: r.chunk_id,
    )
    toks = _tok("alpha beta gamma delta epsilon zeta")
    # chunks partition the tokens in order; rebuild and check the md5
    rebuilt = []
    for r in rows:
        seg = toks[: r.n_tokens]
        toks = toks[r.n_tokens :]
        assert r.chunk_md5 == hashlib.md5(" ".join(seg).encode()).hexdigest()
        rebuilt.extend(seg)
    assert not toks


def test_cdc_chunk_stats_duplicate_docs_share_chunks(spark):
    # unique tokens -> all chunks within one doc are distinct, so the
    # only duplication is the doc-level copy
    text = " ".join(f"t{i}" for i in range(300))
    docs = _docs(spark, [(1, "s", text), (2, "s", text)])
    row = cdc_chunk_stats(docs, k=4, divisor=8).collect()[0]
    assert row.n_chunks == 2 * row.n_distinct_chunks
    assert row.dup_ppm == 500_000


# -- X87 padding efficiency -------------------------------------------

def test_padding_efficiency_conservation(spark, sf_dir):
    from ig_etl_sync_spark.operators.dataprep import padding_efficiency
    from ig_etl_sync_spark.operators.textops import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = padding_efficiency(docs, bucket_width=32, batch_size=16).collect()
    total_real = sum(r.real_tokens for r in out)
    want = docs.select(F.sum(token_count(F.col("text"))).alias("s")).collect()[0].s
    assert total_real == want
    assert sum(r.n_docs for r in out) == docs.count()
    for r in out:
        assert r.padded_tokens >= r.real_tokens
        assert 0 <= r.waste_ppm < 1_000_000


def test_padding_efficiency_salted_rank_equals_plain_window(spark, sf_dir):
    # salt=1 degenerates to a single slice, so the salted two-pass rank
    # must equal the direct per-bucket window implementation
    from pyspark.sql import Window

    from ig_etl_sync_spark.functions.hashing import md5_int32
    from ig_etl_sync_spark.operators.dataprep import padding_efficiency
    from ig_etl_sync_spark.operators.textops import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.len_bucket: (r.n_docs, r.n_batches, r.real_tokens, r.padded_tokens)
        for r in padding_efficiency(
            docs, bucket_width=32, batch_size=4, salt=1
        ).collect()
    }
    h = md5_int32(F.concat(F.lit("pad-v1:"), F.col("doc_id").cast("string")))
    base = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tok")
    ).withColumn("len_bucket", F.expr("n_tok div 32")).withColumn("_h", h)
    w = Window.partitionBy("len_bucket").orderBy(
        F.col("_h").asc(), F.col("doc_id").asc()
    )
    ref = (
        base.withColumn("r", F.row_number().over(w))
        .withColumn("batch_id", F.expr("(r - 1) div 4"))
        .groupBy("len_bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("bn"),
            F.sum("n_tok").alias("breal"),
            F.max("n_tok").alias("bmax"),
        )
        .groupBy("len_bucket")
        .agg(
            F.sum("bn").alias("n_docs"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("breal").alias("real_tokens"),
            F.sum(F.col("bmax") * F.col("bn")).alias("padded_tokens"),
        )
        .collect()
    )
    want = {
        r.len_bucket: (r.n_docs, r.n_batches, r.real_tokens, r.padded_tokens)
        for r in ref
    }
    assert got == want


# -- X88 reciprocal-rank fusion ----------------------------------------

def test_rrf_fuse_hand_case(spark):
    from ig_etl_sync_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank long")
    rows = {r.doc_id: r for r in rrf_fuse({"a": a, "b": b}).collect()}
    K = 60
    assert rows[2].rrf_ppb == 10**9 // (K + 2) + 10**9 // (K + 1)
    assert rows[1].rrf_ppb == 10**9 // (K + 1)
    assert rows[4].rrf_ppb == 10**9 // (K + 2)
    assert (rows[2].a_rank, rows[2].b_rank) == (2, 1)
    assert (rows[4].a_rank, rows[4].b_rank) == (0, 2)
    # fused order: doc 2 first (in both lists)
    ordered = rrf_fuse({"a": a, "b": b}, top_n=1).collect()
    assert ordered[0].doc_id == 2


# -- X89 surprisal buckets ---------------------------------------------

def test_surprisal_buckets_partition_and_order(spark, sf_dir):
    from ig_etl_sync_spark.operators.textops import surprisal_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = surprisal_buckets(docs).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, {})[r.bucket] = r
    want_counts = {
        r.lang: r.n for r in docs.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    for lang, buckets in per_lang.items():
        assert sum(r.n_docs for r in buckets.values()) == want_counts[lang]
        # head scores below middle below tail (means follow the terciles)
        means = [
            buckets[b].mean_surprisal_ppm
            for b in ("head", "middle", "tail")
            if b in buckets
        ]
        assert means == sorted(means)


def test_surprisal_buckets_all_ties_fall_to_tail(spark):
    from ig_etl_sync_spark.operators.textops import surprisal_buckets

    # one value group spanning the whole lang: inclusive count == n for
    # every doc, so the by-value rule lands ALL of them in 'tail' —
    # deterministic and documented (no arbitrary within-tie split)
    docs = spark.createDataFrame(
        [(i, "x y z", "en") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    rows = surprisal_buckets(docs).collect()
    assert len(rows) == 1
    assert rows[0].bucket == "tail" and rows[0].n_docs == 6


# -- X90 MMR diverse selection -----------------------------------------

def test_mmr_first_pick_is_max_relevance_and_diversity(spark):
    from ig_etl_sync_spark.operators.similarity import mmr_diverse_topk

    # anchor at e0; cluster A hugs the anchor (near-copies), cluster B
    # is distinct but still relevant. Plain top-k would pick all of A
    # first; MMR must interleave B early.
    def v(*dims):
        out = [0.0] * 8
        for d, x in dims:
            out[d] = x
        return out

    rows = [
        (0, v((0, 1.0))),                      # anchor
        (1, v((0, 1.0), (1, 0.01))),           # A near-copy
        (2, v((0, 1.0), (1, 0.02))),           # A near-copy
        (3, v((0, 1.0), (1, 0.03))),           # A near-copy
        (4, v((0, 0.6), (2, 0.8))),            # B distinct direction
        (5, v((0, 0.6), (3, 0.8))),            # B distinct direction
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vec]) for i, vec in rows],
        "vec_id long, embedding array<float>",
    )
    out = mmr_diverse_topk(emb, anchor_id=0, k=4, pool=5)
    picks = [r.vec_id for r in sorted(out.collect(), key=lambda r: r.mmr_rank)]
    assert picks[0] == 1  # highest cosine to the anchor
    # at least one of the distinct-direction vectors enters by rank 3
    assert set(picks[:3]) & {4, 5}, picks
    ranks = {r.vec_id: r.mmr_rank for r in out.collect()}
    assert len(ranks) == 4 and sorted(ranks.values()) == [1, 2, 3, 4]


# -- X91 threshold sweep -----------------------------------------------

def test_threshold_sweep_hand_case(spark):
    from ig_etl_sync_spark.operators.profiling import threshold_sweep

    # scores 1..4; positives at 3, 4
    scored = spark.createDataFrame(
        [(1, False), (2, False), (3, True), (4, True)],
        "score long, label boolean",
    )
    rows = {
        r.threshold: r
        for r in threshold_sweep(scored, "score", "label", [0, 3, 5]).collect()
    }
    # t=0: everything predicted positive
    assert (rows[0].tp, rows[0].fp, rows[0].fn, rows[0].tn) == (2, 2, 0, 0)
    assert rows[0].precision_ppm == 500_000 and rows[0].recall_ppm == 1_000_000
    # t=3: perfect split
    assert (rows[3].tp, rows[3].fp, rows[3].fn, rows[3].tn) == (2, 0, 0, 2)
    assert rows[3].f1_ppm == 1_000_000
    # t=5: nothing predicted positive — the grid row still emits
    assert (rows[5].tp, rows[5].fp, rows[5].fn, rows[5].tn) == (0, 0, 2, 2)
    assert rows[5].precision_ppm == 0


def test_threshold_sweep_counts_conserve(spark, sf_dir):
    from ig_etl_sync_spark.operators.profiling import threshold_sweep
    from ig_etl_sync_spark.operators.textops import unigram_surprisal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = unigram_surprisal(docs).withColumn(
        "label", F.col("surprisal_ppm") > 4_100_000
    )
    n = s.count()
    for r in threshold_sweep(
        s, "surprisal_ppm", "label", [4_000_000, 4_200_000]
    ).collect():
        assert r.tp + r.fp + r.fn + r.tn == n


# -- X92 lang-ID confusion ---------------------------------------------

def test_lang_id_confusion_shares_sum_per_lang(spark, sf_dir):
    from ig_etl_sync_spark.contract import lang_id_confusion

    rows = lang_id_confusion(spark, sf_dir).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, rs in per_lang.items():
        assert sum(r.n_docs for r in rs) == want[lang]
        # floor-division shares never exceed 1e6 in total
        assert sum(r.share_ppm for r in rs) <= 1_000_000


# -- X93 LSH recall audit ----------------------------------------------

def test_lsh_recall_monotone_in_cosine_band(spark, sf_dir):
    from ig_etl_sync_spark.operators.similarity import lsh_recall_audit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = {r.band: r for r in lsh_recall_audit(emb, sample=40).collect()}
    assert rows, "no truth pairs at cosine >= 0.3 in the sample"
    for r in rows.values():
        assert 0 <= r.n_caught <= r.n_truth
        assert r.recall_ppm == r.n_caught * 1_000_000 // r.n_truth
    # the LSH S-curve: the top band's recall is at least the bottom's
    if "0.70-1.00" in rows and "0.30-0.50" in rows:
        assert rows["0.70-1.00"].recall_ppm >= rows["0.30-0.50"].recall_ppm


def test_lsh_recall_sample_restriction_is_exact(spark, sf_dir):
    # buckets are data-independent, so the sample-restricted LSH pair
    # set must equal the FULL run's pairs restricted to sampled ids
    from ig_etl_sync_spark.functions.hashing import md5_int32
    from ig_etl_sync_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    h = md5_int32(
        F.concat(F.lit("lshrec-v1:"), F.col("vec_id").cast("string"))
    )
    ids = {
        r.vec_id
        for r in emb.select("vec_id")
        .orderBy(h.asc(), F.col("vec_id").asc())
        .limit(40)
        .collect()
    }
    samp = emb.where(F.col("vec_id").isin(list(ids)))
    on_sample = {
        (r.id_a, r.id_b)
        for r in S.lsh_bucketed_pairs(
            samp, threshold=0.3, planes=4, tables=2
        ).collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in S.lsh_bucketed_pairs(
            emb, threshold=0.3, planes=4, tables=2
        ).collect()
        if r.id_a in ids and r.id_b in ids
    }
    assert on_sample == full


# -- X96 temporal split leakage ----------------------------------------

def test_temporal_split_leakage_hand_case(spark):
    import datetime as dt

    from ig_etl_sync_spark.operators.dataprep import temporal_split_leakage

    cut = dt.datetime(2024, 1, 10)
    cut_us = int(cut.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    before = dt.datetime(2024, 1, 5)
    after = dt.datetime(2024, 1, 20)
    rows = [
        # u1 straddles the cut (leaks), u2 test-only, u3 train-only
        (1, before, 1, "click"),
        (2, after, 1, "click"),
        (3, after, 2, "click"),
        (4, before, 3, "click"),
        # a type with an empty test side
        (5, before, 1, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.event_type: r for r in temporal_split_leakage(ev, cut_us).collect()}
    c = out["click"]
    assert (c.users_train, c.users_test, c.users_both) == (2, 2, 1)
    assert c.leak_ppm == 500_000
    v = out["view"]
    assert (v.users_train, v.users_test, v.users_both, v.leak_ppm) == (1, 0, 0, 0)


# -- X97 transition predictor accuracy ---------------------------------

def test_transition_predictor_hand_case(spark):
    import datetime as dt

    from ig_etl_sync_spark.operators.sessions import (
        transition_predictor_accuracy,
    )

    t0 = dt.datetime(2024, 1, 1)

    def seq(user, types):
        return [
            (user * 100 + i, t0 + dt.timedelta(minutes=i), user, t)
            for i, t in enumerate(types)
        ]

    # transitions from a: a->b x3, a->c x1  => predict b, accuracy 750000
    rows = (
        seq(1, ["a", "b", "a", "b"])     # a->b, b->a, a->b
        + seq(2, ["a", "b"])             # a->b
        + seq(3, ["a", "c"])             # a->c
    )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.src_type: r for r in transition_predictor_accuracy(ev).collect()}
    a = out["a"]
    assert a.predicted_next == "b"
    assert (a.n_transitions, a.n_correct) == (4, 3)
    assert a.accuracy_ppm == 750_000
    b = out["b"]
    assert b.predicted_next == "a"
    assert b.accuracy_ppm == 1_000_000


# -- X94 ANN recall audit ----------------------------------------------

def test_ann_recall_audit_bounds_and_routes(spark, sf_dir):
    from ig_etl_sync_spark.contract import ann_recall_audit

    rows = ann_recall_audit(spark, sf_dir).collect()
    routes = {r.route for r in rows}
    assert routes == {"lsh", "ivf", "pq"}
    for r in rows:
        assert 0 <= r.n_overlap <= r.n_brute
        assert r.recall_ppm == r.n_overlap * 1_000_000 // r.n_brute
    # every route reports the same query set as brute truth
    per_route = {}
    for r in rows:
        per_route.setdefault(r.route, set()).add(r.query_id)
    qsets = list(per_route.values())
    assert all(q == qsets[0] for q in qsets)


# -- X95 cluster dilution audit ----------------------------------------

def test_cluster_dilution_invariants_on_corpus(spark, sf_dir):
    from ig_etl_sync_spark.operators.clustering import cluster_dilution

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = cluster_dilution(docs, top_n=50).collect()
    assert rows, "expected near-dup clusters in the shipped corpus"
    for r in rows:
        assert r.size >= 2
        # pair count bounded by the complete graph; density exact
        assert 1 <= r.n_pairs <= r.size * (r.size - 1) // 2
        assert r.density_ppm == 2 * r.n_pairs * 1_000_000 // (
            r.size * (r.size - 1)
        )
        # every counted pair passed the verify threshold
        assert r.min_jaccard >= 0.7
    sizes = [r.size for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_cluster_dilution_complete_family_density_full(spark):
    from ig_etl_sync_spark.operators.clustering import cluster_dilution

    text = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(i, text) for i in range(1, 4)], "doc_id long, text string"
    )
    r = cluster_dilution(docs, top_n=10).collect()[0]
    assert (r.size, r.n_pairs, r.density_ppm) == (3, 3, 1_000_000)
    assert r.min_jaccard == 1.0
