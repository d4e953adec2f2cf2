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
