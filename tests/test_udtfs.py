"""Python UDTF surface: sentence splitting via SQL lateral join."""

from __future__ import annotations

from ig_etl_sync_spark.functions.udtfs import register_udtfs


def test_sentence_split_lateral_join(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [
            (1, "First sentence. Second one! A third? Yes."),
            (2, "One only"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.idx, s.sentence
        FROM udtf_docs d, LATERAL sentence_split(d.text) s
        ORDER BY d.doc_id, s.idx
        """
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["sentence"])
    assert by_doc[1] == ["First sentence.", "Second one!", "A third?", "Yes."]
    assert by_doc[2] == ["One only"]
    assert 3 not in by_doc and 4 not in by_doc  # empty/NULL -> no rows


def test_sentence_split_keeps_abbrev_and_decimals(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "Mr. A. Smith paid 3.50 dollars. Then he left.")],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs2")
    got = [
        r["sentence"]
        for r in spark.sql(
            "SELECT s.sentence FROM udtf_docs2 d, "
            "LATERAL sentence_split(d.text) s ORDER BY s.idx"
        ).collect()
    ]
    assert got == ["Mr. A. Smith paid 3.50 dollars.", "Then he left."]
