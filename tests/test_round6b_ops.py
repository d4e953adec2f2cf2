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
