"""Training-corpus prep pipeline (operators/dataprep.py)."""

from __future__ import annotations

from ig_etl_sync_spark.operators.dataprep import prepare_training_corpus

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and it was a bright "
    "morning for the walk in that green field with the old friends "
    "because it is good to be outside and the air was clear for everyone"
)


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_pipeline_stages_compose(spark):
    rows = [
        (1, "en", GOOD_EN),
        (2, "en", GOOD_EN.upper()),          # exact dup after normalization → dropped
        (3, "en", GOOD_EN + " extra trailing words here"),  # near dup → dropped
        (4, "en", "short text"),             # under token floor → dropped
        (5, "en", "x0x1 " * 30),             # digit-heavy → alpha below floor
        (6, "zh", "汉字 " * 40),              # no stopword votes → 'und' → dropped
        (7, "de", "der hund und die katze und der vogel sind nicht in das "
                  "haus mit der tür und der garten ist auch nicht klein aber "
                  "die sonne ist warm und der tag ist lang für alle tiere"),
    ]
    out = {r["doc_id"]: r for r in prepare_training_corpus(docs_df(spark, rows)).collect()}
    assert set(out) == {1, 7}
    assert out[1]["lang_pred"] == "en"
    assert out[7]["lang_pred"] == "de"
    assert out[1]["n_tokens"] >= 20
    assert out[1]["alpha_ratio"] >= 0.6


def test_exact_dup_keeps_smallest_id(spark):
    rows = [(10, "en", GOOD_EN), (2, "en", GOOD_EN), (5, "en", GOOD_EN)]
    out = [r["doc_id"] for r in prepare_training_corpus(docs_df(spark, rows)).collect()]
    assert out == [2]


def test_empty_input(spark):
    out = prepare_training_corpus(docs_df(spark, []))
    assert out.collect() == []
    assert out.columns == ["doc_id", "lang_pred", "n_tokens", "alpha_ratio"]
