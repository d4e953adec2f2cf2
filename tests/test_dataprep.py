"""Training-corpus prep pipeline (operators/dataprep.py)."""

from __future__ import annotations

import pytest

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


def test_deterministic_sample_rate_and_stability(spark, sf_dir):
    from ig_etl_sync_spark.operators.dataprep import deterministic_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.25).collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, 0.25).collect()}
    assert a == b  # rerun picks identical rows
    assert 0.1 * n < len(a) < 0.4 * n  # ≈ rate, not degenerate
    # monotone: a higher rate strictly contains a lower one
    big = {r["doc_id"] for r in deterministic_sample(docs, 0.5).collect()}
    assert a <= big
    import pytest as _pytest
    with _pytest.raises(ValueError, match="rate"):
        deterministic_sample(docs, 1.5)


def test_stratified_sample_quota(spark, sf_dir):
    from ig_etl_sync_spark.operators.dataprep import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(docs, "lang", 7)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    for lang, n_full in full.items():
        assert counts[lang] == min(7, n_full)


def test_token_budget_sample(spark, sf_dir):
    from ig_etl_sync_spark.operators.dataprep import token_budget_sample
    from ig_etl_sync_spark.operators.textops import token_count
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.select(F.sum(token_count(F.col("text"))).alias("t")).first()["t"]
    # generous budget: everything kept
    assert token_budget_sample(docs, total + 1).count() == docs.count()
    # tight budget: kept tokens land near the budget (rate-based ⇒
    # in-expectation; allow wide but meaningful bounds)
    budget = total // 3
    kept = token_budget_sample(docs, budget)
    kept_tokens = kept.select(F.sum(token_count(F.col("text"))).alias("t")).first()["t"]
    assert kept.count() < docs.count()
    assert 0.5 * budget < kept_tokens < 1.5 * budget


def test_pack_sequences_properties(spark, sf_dir):
    from ig_etl_sync_spark.operators.dataprep import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = pack_sequences(docs, budget=512, n_buckets=4)
    rows = packed.collect()
    # total assignment: every doc exactly once
    assert len(rows) == docs.count()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    # deterministic: same assignment on re-run
    again = {(r["doc_id"], r["pack_id"]) for r in pack_sequences(
        docs, budget=512, n_buckets=4).collect()}
    assert {(r["doc_id"], r["pack_id"]) for r in rows} == again
    # packs only overflow via a boundary-crossing or oversize doc: a
    # pack's tokens minus its LAST doc's contribution stays under budget
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for pack, toks in by_pack.items():
        assert sum(toks) - max(toks) < 512, (pack, sum(toks))


def test_weighted_sample_proportional_and_deterministic(spark):
    from ig_etl_sync_spark.operators.dataprep import weighted_sample_topn
    from pyspark.sql import functions as F

    # two weight classes: heavy docs 100x the weight of light docs
    rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample_topn(df, 200, "w").collect()
    assert len(got) == 200
    heavy = sum(1 for r in got if r["w"] == 100.0)
    # heavy docs should dominate the sample overwhelmingly
    assert heavy > 170
    again = {r["doc_id"] for r in weighted_sample_topn(df, 200, "w").collect()}
    assert {r["doc_id"] for r in got} == again
    # zero/negative weights excluded
    z = spark.createDataFrame([(1, 0.0), (2, 5.0)], "doc_id long, w double")
    assert [r["doc_id"] for r in weighted_sample_topn(z, 5, "w").collect()] == [2]


# -------------------------------------------------------------- chunking

def test_chunk_documents_coverage_and_overlap(spark):
    from ig_etl_sync_spark.operators.dataprep import chunk_documents

    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, chunk_tokens=64, overlap=8).collect(),
        key=lambda r: r.chunk_id,
    )
    # stride 56: ceil((150-8)/56) = 3 chunks
    assert [r.chunk_id for r in out] == [0, 1, 2]
    assert [r.n_tokens for r in out] == [64, 64, 150 - 2 * 56]
    c0, c1 = out[0].chunk_text.split(" "), out[1].chunk_text.split(" ")
    assert c0[-8:] == c1[:8]  # consecutive chunks share `overlap` tokens
    # every token covered, in order
    all_toks = c0 + c1[8:] + out[2].chunk_text.split(" ")[8:]
    assert all_toks == [f"w{i}" for i in range(150)]


def test_chunk_documents_short_doc_single_chunk(spark):
    from ig_etl_sync_spark.operators.dataprep import chunk_documents

    df = spark.createDataFrame(
        [(1, "just a few tokens"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in chunk_documents(df, chunk_tokens=64, overlap=8).collect()}
    assert out[1].chunk_id == 0 and out[1].n_tokens == 4
    assert out[2].chunk_id == 0 and out[2].n_tokens == 0


def test_chunk_documents_rejects_bad_overlap(spark):
    from ig_etl_sync_spark.operators.dataprep import chunk_documents
    import pytest as _pytest

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


# ----------------------------------------------------- winsorize/balance

def test_winsorize_clips_to_exact_elements(spark):
    from ig_etl_sync_spark.operators.dataprep import winsorize

    vals = [float(v) for v in range(1, 101)] + [10000.0, -10000.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = winsorize(df, "v", p_lo=0.05, p_hi=0.95)
    lo, hi = out.select("_lo", "_hi").first()
    assert lo in vals and hi in vals  # discrete: bounds are data elements
    got = [r.v_winsorized for r in out.collect()]
    assert max(got) == hi and min(got) == lo
    assert all(lo <= v <= hi for v in got)


def test_winsorize_per_group_bounds(spark):
    from ig_etl_sync_spark.operators.dataprep import winsorize

    rows = [("a", float(v)) for v in range(10)] + [("b", float(v * 100)) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", ["g"], p_lo=0.1, p_hi=0.9)
    bounds = {r.g: (r._lo, r._hi) for r in out.select("g", "_lo", "_hi").distinct().collect()}
    assert bounds["a"][1] <= 9.0 and bounds["b"][1] >= 800.0


def test_class_balanced_sample_equalizes_and_is_deterministic(spark):
    from ig_etl_sync_spark.operators.dataprep import class_balanced_sample

    rows = [(i, i % 3) for i in range(30)] + [(i, 0) for i in range(100, 170)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    from pyspark.sql import functions as F

    out = class_balanced_sample(df, "label", "vec_id")
    sizes = {r.label: r.n for r in
             out.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes.values()) == {10}  # min class (labels 1,2 have 10)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, class_balanced_sample(df, "label", "vec_id").collect()))
    assert a == b


def _naive_class_balance(df, label_col, id_col):
    """Reference form: exact rank over EVERY row of every class."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.functions.hashing import md5_int32

    m = (
        df.groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(F.min("_c").alias("_m"))
    )
    w = Window.partitionBy(label_col).orderBy(
        md5_int32(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .where(F.col("_rn") <= F.col("_m"))
        .drop("_rn", "_m")
    )


@pytest.mark.parametrize("n_buckets", [2, 16, 256])
def test_class_balanced_prefilter_nonlossy_under_100x_skew(spark, n_buckets):
    """The bucketed-hash pre-cut must be exactly lossless: one class is
    100x the smallest, and the result must equal the naive
    rank-everything form at every bucket granularity (n_buckets=2 makes
    the prefix bound as coarse as possible, the hardest case)."""
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.operators.dataprep import class_balanced_sample

    rows = [(i, "hot") for i in range(500)] + [
        (1000 + i, "cold") for i in range(5)
    ] + [(2000 + i, "warm") for i in range(37)]
    df = spark.createDataFrame(rows, "vec_id long, label string")
    got = sorted(
        map(tuple, class_balanced_sample(
            df, "label", "vec_id", n_buckets=n_buckets).collect())
    )
    want = sorted(map(tuple, _naive_class_balance(df, "label", "vec_id").collect()))
    assert got == want
    per = {r.label: r.n for r in
           class_balanced_sample(df, "label", "vec_id", n_buckets=n_buckets)
           .groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {"hot": 5, "cold": 5, "warm": 5}


def test_class_balanced_rejects_bad_buckets(spark):
    from ig_etl_sync_spark.operators.dataprep import class_balanced_sample

    df = spark.createDataFrame([(1, "a")], "vec_id long, label string")
    with pytest.raises(ValueError):
        class_balanced_sample(df, "label", "vec_id", n_buckets=3)
