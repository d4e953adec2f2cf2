"""Round-5 operator semantics: bigram LM surprisal."""

from __future__ import annotations


def test_bigram_surprisal_hand_computed(spark):
    from ig_etl_sync_spark.operators.textops import bigram_surprisal

    # corpus: 4x "x y", 1x "x z". V = {x,y,z} = 3; c1(x) = 5.
    # (x,y): c2=4 -> bits = bitlen((5+3)//(4+1)=1) = 0
    # (x,z): c2=1 -> bits = bitlen((5+3)//(1+1)=4) = 2
    rows = [(i, "x y") for i in range(4)] + [(10, "x z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_surprisal(df).collect()}
    assert got[0].n_bigrams == 1 and got[0].bigram_surprisal_ppm == 0
    assert got[10].n_bigrams == 1 and got[10].bigram_surprisal_ppm == 2_000_000


def test_bigram_surprisal_excludes_short_docs(spark):
    from ig_etl_sync_spark.operators.textops import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a pair of words")],
        "doc_id long, text string",
    )
    got = bigram_surprisal(df).collect()
    assert {r.doc_id for r in got} == {3}
    assert got[0].n_bigrams == 3


def test_bigram_surprisal_sees_word_order(spark):
    """Common words in an unseen ORDER score high — the signal the
    unigram form cannot produce (both docs have identical bags)."""
    from ig_etl_sync_spark.operators.textops import bigram_surprisal

    rows = [(i, "the quick brown fox") for i in range(8)] + [
        (100, "fox brown quick the")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bigram_surprisal_ppm for r in bigram_surprisal(df).collect()}
    assert got[100] > got[0]


# ------------------------------------------- longest duplicated span

def test_longest_dup_span_run_length(spark):
    """11 shared words -> 4 consecutive dup 8-span starts -> length 11."""
    shared = "a b c d e f g h i j kk"
    from ig_etl_sync_spark.operators.spans import longest_dup_span

    df = spark.createDataFrame(
        [("x", f"{shared} unique1 unique2 unique3"),
         ("y", f"other words first {shared}")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in longest_dup_span(df, k=8).collect()}
    assert got["x"].longest_span_tokens == 11
    assert got["y"].longest_span_tokens == 11


def test_longest_dup_span_zero_when_unique(spark):
    from ig_etl_sync_spark.operators.spans import longest_dup_span

    df = spark.createDataFrame(
        [("x", "all fresh words nothing shared anywhere at all today"),
         ("y", "a wholly different sentence with separate vocabulary")],
        ["doc_id", "text"],
    )
    for r in longest_dup_span(df, k=8).collect():
        assert r.longest_span_tokens == 0


def test_longest_dup_span_short_doc_clipped(spark):
    """Whole-text shingle of a 3-token doc clips to 3, not k=8."""
    from ig_etl_sync_spark.operators.spans import longest_dup_span

    df = spark.createDataFrame(
        [("x", "tiny dup text"), ("y", "tiny dup text")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.longest_span_tokens for r in longest_dup_span(df, k=8).collect()}
    assert got == {"x": 3, "y": 3}


def test_longest_dup_span_separate_islands_not_merged(spark):
    """Two disjoint duplicated runs report the LONGER one, not the sum."""
    from ig_etl_sync_spark.operators.spans import longest_dup_span

    run1 = "r1a r1b r1c r1d r1e r1f r1g r1h"            # 8 words: len 8
    run2 = "r2a r2b r2c r2d r2e r2f r2g r2h r2i r2j"    # 10 words: len 10
    df = spark.createDataFrame(
        [("x", f"{run1} gapword {run2}"),
         ("y", f"{run1} something else entirely"),
         ("z", f"unrelated prefix {run2}")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.longest_span_tokens for r in longest_dup_span(df, k=8).collect()}
    assert got["x"] == 10


# ------------------------------------------- deterministic training shuffle

def test_training_shuffle_deterministic_and_dense(spark):
    from ig_etl_sync_spark.operators.layout import training_shuffle_order

    df = spark.range(100).withColumnRenamed("id", "k")
    a = training_shuffle_order(df, "k", 4).collect()
    b = training_shuffle_order(df, "k", 4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():  # dense 0..n-1 within each shard
        assert sorted(positions) == list(range(len(positions)))


def test_training_shuffle_seed_changes_order(spark):
    from ig_etl_sync_spark.operators.layout import training_shuffle_order

    df = spark.range(200).withColumnRenamed("id", "k")
    a = {r.k: (r.shard, r.pos) for r in training_shuffle_order(df, "k", 1).collect()}
    b = {r.k: (r.shard, r.pos) for r in
         training_shuffle_order(df, "k", 1, seed="shuffle-v2").collect()}
    assert a != b  # an independent permutation
    assert set(a) == set(b)


def test_training_shuffle_rejects_bad_shards(spark):
    import pytest

    from ig_etl_sync_spark.operators.layout import training_shuffle_order

    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        training_shuffle_order(df, "k", 0)


# ------------------------------------------- word_shingles fast build

def test_word_shingles_doubling_equals_naive(spark):
    """The doubling zip_with build must be expression-for-expression
    identical to the naive transform(sequence) form, for every k and
    doc-length regime (short-doc CASE, exact-k, k+1, long)."""
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.operators.textops import (
        normalized_text,
        tokens,
        word_shingles,
    )

    def naive(text, k):
        toks = tokens(normalized_text(text))
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        return F.when(n <= k, F.array(F.concat_ws(" ", toks))).otherwise(
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
            )
        )

    rows = [
        (1, ""),
        (2, "one"),
        (3, "two words"),
        (4, "exactly five little words here"),
        (5, "six words is one more now"),
        (6, "  UPPER, punct!  and   extra   spaces here ok then  "),
        (7, " ".join(f"w{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (1, 2, 3, 5, 8, 13):
        bad = (
            df.select(
                word_shingles(F.col("text"), k).alias("a"),
                naive(F.col("text"), k).alias("b"),
            )
            .where(F.expr("a <> b"))
            .count()
        )
        assert bad == 0, k


# ------------------------------------------- event-sequence surprisal

def _ev_rows():
    # u1 loops A->A->A->A; u2 alternates A,B,A,B
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i, t in enumerate("AAAA"):
        rows.append((i, base + dt.timedelta(minutes=i), 1, t))
    for i, t in enumerate("ABAB"):
        rows.append((10 + i, base + dt.timedelta(minutes=i), 2, t))
    return rows


def test_sequence_surprisal_hand_computed(spark):
    from ig_etl_sync_spark.operators.sessions import sequence_surprisal

    df = spark.createDataFrame(
        _ev_rows(), "event_id long, ts timestamp, user_id long, event_type string"
    )
    # V=2; c2(A,A)=3, c2(A,B)=2, c2(B,A)=1; c1(A)=5, c1(B)=1
    # bits(A,A)=bitlen(7//4)=0; bits(A,B)=bitlen(7//3)=1; bits(B,A)=bitlen(3//2)=0
    got = {r.user_id: r for r in sequence_surprisal(df).collect()}
    assert got[1].n_transitions == 3 and got[1].surprisal_ppm == 0
    assert got[2].n_transitions == 3 and got[2].surprisal_ppm == 666_666


def test_sequence_surprisal_excludes_single_event_keys(spark):
    import datetime as dt

    from ig_etl_sync_spark.operators.sessions import sequence_surprisal

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 7, "A")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    assert sequence_surprisal(df).count() == 0


# ------------------------------------------- token-balanced sharding

def test_token_balanced_shards_balance_and_determinism(spark):
    """Heavy-tailed lengths (100x spread): every shard's token total
    within 15% of the mean; assignment deterministic; every doc
    assigned exactly once."""
    import random

    from pyspark.sql import functions as F

    from ig_etl_sync_spark.operators.layout import token_balanced_shards

    rng = random.Random(99)
    rows = [
        (i, " ".join(f"w{rng.randrange(50)}"
                     for _ in range(rng.choice([3, 10, 40, 300]))))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # few salt buckets at this toy size: imbalance ~ buckets x max_doc
    # x shards / total (the partial-fold tail), negligible at corpus
    # scale but dominant at 600 docs if buckets is large
    out = token_balanced_shards(df, 6, salt_buckets=4)
    a = out.collect()
    b = token_balanced_shards(df, 6, salt_buckets=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 600 and len({r.doc_id for r in a}) == 600
    totals = {}
    for r in a:
        totals[r.shard] = totals.get(r.shard, 0) + r.n_tokens
    assert set(totals) == set(range(6))
    mean = sum(totals.values()) / 6
    for s, t in totals.items():
        assert abs(t - mean) / mean < 0.15, (s, t, mean)


def test_token_balanced_shards_beats_hash_sharding(spark):
    """On the same heavy-tailed corpus, the snake's max/min spread must
    be tighter than plain hash sharding's."""
    import random

    from ig_etl_sync_spark.functions.hashing import md5_int32
    from ig_etl_sync_spark.operators.layout import token_balanced_shards
    from ig_etl_sync_spark.operators.textops import normalized_text, tokens
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"w{rng.randrange(50)}"
                     for _ in range(rng.choice([2, 5, 500]))))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def spread(assign):
        tot = {}
        for shard, toks in assign:
            tot[shard] = tot.get(shard, 0) + toks
        return max(tot.values()) / max(1, min(tot.values()))

    snake = [(r.shard, r.n_tokens)
             for r in token_balanced_shards(df, 4, salt_buckets=16).collect()]
    hashed = [
        (r.s, r.n)
        for r in df.select(
            (md5_int32(F.col("doc_id").cast("string")) % 4).alias("s"),
            F.size(tokens(normalized_text(F.col("text")))).alias("n"),
        ).collect()
    ]
    assert spread(snake) < spread(hashed)


# ------------------------------------------- multimodal dup decision

def test_multimodal_near_dup_signals(spark, tmp_path, monkeypatch):
    """All three provenance signals on synthetic aligned data: a text
    near-dup pair with unrelated embeddings, an embedding near-dup pair
    with unrelated text, and a pair close on BOTH routes."""
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.operators import similarity as S
    from ig_etl_sync_spark.operators.dedup import near_dup_pairs_minhash

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on the quiet village roofs tonight")
    texts = {
        1: base, 2: base + " extra",                      # text dup 1-2
        3: "alpha words one", 4: "beta words two",        # embedding dup 3-4
        5: base.replace("fox", "cat"),                    # both with 6
        6: base.replace("fox", "cat") + " indeed",
    }
    import math
    def vec(seedlike, near=None):
        if near is not None:
            return [x + 0.01 for x in near]
        vals = [math.sin(seedlike * 13.7 + i) for i in range(8)]
        return vals
    vecs = {1: vec(1), 2: vec(2), 3: vec(3), 4: vec(3, near=vec(3)),
            5: vec(5), 6: vec(5, near=vec(5))}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>")

    tp = near_dup_pairs_minhash(docs, "doc_id", "text", 16, 4, 5, 0.7).select(
        "id_a", "id_b", F.lit("text").alias("src"))
    ep = S.lsh_bucketed_pairs(emb, threshold=0.95, planes=2, dim=8,
                              tables=2).select(
        "id_a", "id_b", F.lit("embedding").alias("src"))
    out = {
        (r.id_a, r.id_b): r.signal
        for r in tp.unionByName(ep).groupBy("id_a", "id_b").agg(
            F.when(F.count(F.lit(1)) == 2, F.lit("both"))
            .otherwise(F.min("src")).alias("signal")).collect()
    }
    assert out[(1, 2)] == "text"
    assert out[(3, 4)] == "embedding"
    assert out[(5, 6)] == "both"


def test_token_balanced_shards_autosizing_holds_at_scale(spark):
    """Round-6: salt_buckets=None auto-sizes to docs/(100*n_shards)
    (clamped), and the balance holds as the corpus grows 10x and 100x —
    the documented failure of a PINNED bucket count (the 3.2x-spread
    regime) cannot happen when the dial scales with the data."""
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.operators.layout import token_balanced_shards

    def corpus(n):
        # heavy-tailed lengths, fully Spark-side (no driver rows)
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("w "),
                F.repeat(
                    F.lit("tok "),
                    F.when(F.col("id") % 17 == 0, 300)
                    .when(F.col("id") % 3 == 0, 40)
                    .otherwise(5),
                ),
            ).alias("text"),
        )

    for n in (500, 5_000, 50_000):
        out = token_balanced_shards(corpus(n), 8).collect()
        assert len(out) == n
        totals = {}
        for r in out:
            totals[r.shard] = totals.get(r.shard, 0) + r.n_tokens
        assert set(totals) == set(range(8))
        spread = max(totals.values()) / min(totals.values())
        assert spread < 1.15, (n, spread, totals)


def test_token_balanced_shards_degenerate_regime_warns(spark):
    """An explicit salt_buckets leaving under one fold per bucket must
    emit the UserWarning (and still assign deterministically); a
    healthy explicit setting must stay silent."""
    import warnings

    from ig_etl_sync_spark.operators.layout import token_balanced_shards

    rows = [(i, "alpha beta gamma " * (1 + i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = token_balanced_shards(df, 8, salt_buckets=64).collect()
    assert len(out) == 100
    assert any("snake fold" in str(w.message) for w in caught)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        token_balanced_shards(df, 2, salt_buckets=4).collect()
    assert not [w for w in caught if "snake fold" in str(w.message)]


# ------------------------------------------- round-6 curation ops

def test_source_frequency_cap_exact_and_salt_invariant(spark):
    """X81: the two-phase skew-bounded selection must equal the
    single-window reference for ANY salt, keep <= cap per group, and be
    deterministic."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.functions.hashing import md5_int32
    from ig_etl_sync_spark.operators.dataprep import source_frequency_cap

    rng = random.Random(5)
    rows = [(i, f"g{rng.randrange(4) if i < 980 else 4}") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    h = md5_int32(F.concat(F.lit("cap-v1:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ref = {
        (r.doc_id, r.source)
        for r in df.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= 30).select("doc_id", "source").collect()
    }
    for salt in (1, 3, 16):
        got = {
            (r.doc_id, r.source)
            for r in source_frequency_cap(df, 30, salt=salt).collect()
        }
        assert got == ref, salt
    per_group = {}
    for _i, g in ref:
        per_group[g] = per_group.get(g, 0) + 1
    assert all(v <= 30 for v in per_group.values())
    # groups under the cap are kept whole (g4 has 20 docs)
    assert per_group["g4"] == 20


def test_soft_dedup_weights_families_and_singletons(spark):
    """X82: an n-copy near-dup family weighs 1000000//n each; docs with
    no near-dup weigh exactly 1000000; every input doc gets a row."""
    from ig_etl_sync_spark.operators.dataprep import soft_dedup_weights

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on the quiet gray roof of the old house")
    rows = [
        (1, base), (2, base + " extra"), (3, base + " extra words"),
        (10, "completely different text about cooking pasta with garlic "
             "and olive oil in a big pan tonight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.cluster_size, r.weight_ppm)
           for r in soft_dedup_weights(df, threshold=0.5).collect()}
    assert set(got) == {1, 2, 3, 10}
    assert got[10] == (1, 1000000)
    assert got[1] == got[2] == got[3] == (3, 333333)


def test_hard_negative_mining_finds_planted_negative(spark):
    """X83: an anchor's nearest different-label vector must surface as
    its top negative; same-label near-twins must NOT appear; k bounds
    the per-anchor output."""
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.operators.similarity import hard_negative_pairs

    def vec(seed, eps=0.0):
        # unit-ish deterministic vectors: base direction + tiny wiggle
        return [
            (1.0 if d == seed else 0.02 * ((d * 7 + seed) % 5 - 2))
            + (eps if d == (seed + 1) % 64 else 0.0)
            for d in range(64)
        ]

    rows = [
        (1, vec(3), 0),          # anchor, label 0
        (2, vec(3, 0.05), 0),    # same-label near-twin — excluded
        (3, vec(3, 0.10), 1),    # different label, very similar: the hard negative
        (4, vec(40), 1),         # different label, far away
        (5, vec(41), 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = hard_negative_pairs(df, k=2, planes=2, tables=2).collect()
    by_anchor = {}
    for r in got:
        by_anchor.setdefault(r.anchor_id, []).append(r)
        assert r.anchor_label != r.neg_label
    assert all(len(v) <= 2 for v in by_anchor.values())
    ranked = sorted(by_anchor[1], key=lambda r: (-r.cosine, r.neg_id))
    assert ranked[0].neg_id == 3  # the planted hard negative leads
    assert all(r.neg_id != 2 for r in by_anchor[1])  # same-label excluded


def test_label_centroid_outliers_flags_planted_mislabel(spark):
    """X84: a vector labeled into the WRONG cluster must rank first
    among its label's outliers; rank caps hold; dist2 is exact-integer
    reproducible across two runs."""
    from ig_etl_sync_spark.operators.profiling import label_centroid_outliers

    def vec(center, wiggle):
        return [center + 0.001 * ((d * 3 + wiggle) % 7 - 3) for d in range(64)]

    rows = (
        [(i, vec(0.5, i), 0) for i in range(10)]       # tight label-0 cluster
        + [(100 + i, vec(-0.5, i), 1) for i in range(10)]  # tight label-1
        + [(999, vec(-0.5, 3), 0)]                     # label-1-ish vector mislabeled 0
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = label_centroid_outliers(df, top_n=5).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r.label, []).append(r)
    assert all(len(v) <= 5 for v in by_label.values())
    top0 = min(by_label[0], key=lambda r: r.rank)
    assert top0.vec_id == 999 and top0.rank == 1
    # the planted point dominates by orders of magnitude
    second = sorted(by_label[0], key=lambda r: r.rank)[1]
    assert top0.dist2 > 50 * second.dist2  # centroid shifts ~1/11 toward the plant
    # determinism
    again = label_centroid_outliers(df, top_n=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
