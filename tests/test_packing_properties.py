"""Property tests: packing, weighted sampling, and outlier operators
against plain-Python models on randomized inputs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TOKENS = st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(tokens=TOKENS, budget=st.sampled_from([64, 256, 1024]))
def test_pack_sequences_model(spark, tokens, budget):
    """Engine packing must equal the per-bucket prefix-sum model."""
    from ig_etl_sync_spark.operators.dataprep import pack_sequences
    from ig_etl_sync_spark.functions.hashing import md5_int32
    from pyspark.sql import functions as F

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(df, budget=budget, n_buckets=4).collect()
    }

    # model: same md5 key the engine uses, via a 1-row Spark eval
    hks = {
        r["doc_id"]: r["hk"]
        for r in df.select(
            "doc_id", md5_int32(F.col("doc_id").cast("string")).alias("hk")
        ).collect()
    }
    want = {}
    for b in range(4):
        run = 0
        members = sorted(
            (i for i in got if hks[i] % 4 == b), key=lambda i: (hks[i], i)
        )
        for i in members:
            want[i] = b * (1 << 40) + run // budget
            run += tokens[i]
    assert got == want


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=1000), min_size=5, max_size=40
    ),
    n=st.sampled_from([3, 7]),
)
def test_weighted_sample_model(spark, weights, n):
    """Engine A-ES selection must equal the Python key model."""
    from ig_etl_sync_spark.operators.dataprep import weighted_sample_topn
    from ig_etl_sync_spark.functions.hashing import md5_int32
    from pyspark.sql import functions as F

    rows = [(i, float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample_topn(df, n, "w").collect()}

    hks = {
        r["doc_id"]: r["hk"]
        for r in df.select(
            "doc_id", md5_int32(F.col("doc_id").cast("string")).alias("hk")
        ).collect()
    }
    keys = {
        i: round((hks[i] + 1.0) / 2**32, 20) ** (1.0 / w)
        for i, w in enumerate(map(float, weights))
    }
    want = set(
        sorted(keys, key=lambda i: (-round(keys[i], 8), i))[: min(n, len(weights))]
    )
    assert got == want


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e4,
            max_value=1e4,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=4,
        max_size=40,
    )
)
def test_mad_outliers_model(spark, vals):
    """Engine modified z-scores must match the numpy-free Python model
    (exact interpolated median) within rounding."""
    from ig_etl_sync_spark.operators.profiling import mad_outliers

    def median(xs):
        s = sorted(xs)
        m = len(s)
        if m % 2:
            return s[m // 2]
        return (s[m // 2 - 1] + s[m // 2]) / 2.0

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, v double"
    )
    got = {r["i"]: r["mod_z"] for r in mad_outliers(df, "v").collect()}

    med = median(vals)
    mad = median([abs(v - med) for v in vals])
    for i, v in enumerate(vals):
        z = got[i]
        if mad == 0:
            assert z is None
        else:
            want = 0.6745 * (v - med) / mad
            assert z is not None and math.isclose(z, round(want, 4), abs_tol=1e-4)


WORDS = st.lists(
    st.lists(st.sampled_from("a b c d e aa bb cc dd ee".split()),
             min_size=0, max_size=25),
    min_size=2, max_size=20,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=WORDS, threshold=st.sampled_from([0.3, 0.5, 0.6, 2 / 3, 0.75]))
def test_prefix_filter_jaccard_property(spark, docs, threshold):
    """Prefix filtering must equal the all-pairs baseline on ANY corpus
    and threshold — including rational thresholds that stress the
    integer ceil boundary, tiny/empty docs, and exact duplicates."""
    from ig_etl_sync_spark.operators import dedup as D

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    brute = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.ngram_jaccard_pairs(df, n=2, threshold=threshold).collect()
    }
    pf = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.prefix_filter_jaccard_pairs(
            df, n=2, threshold=threshold
        ).collect()
    }
    assert pf == brute


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    fps=st.lists(st.integers(min_value=0, max_value=2**32 - 1),
                 min_size=2, max_size=30),
    max_h=st.sampled_from([1, 2, 3, 5]),
)
def test_simhash_pigeonhole_property(spark, fps, max_h):
    """Pigeonhole block join over ARBITRARY fingerprints (not just ones
    simhash produces) must equal all-pairs Hamming filtering."""
    from pyspark.sql import functions as F

    from ig_etl_sync_spark.operators.dedup import simhash_block_bounds

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(fps)], "doc_id long, simhash long"
    )
    a = df.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("h_a"))
    b = df.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("h_b"))
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))) <= max_h)
        .collect()
    }
    blocked_df = df.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", s).bitwiseAND(
                        F.lit((1 << w) - 1).cast("bigint")
                    )
                    for s, w in simhash_block_bounds(32, max_h)
                ]
            )
        ).alias("block_id", "block_val"),
    )
    aa = blocked_df.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("h_a"),
        "block_id", "block_val",
    )
    bb = blocked_df.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("h_b"),
        "block_id", "block_val",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in aa.join(bb, ["block_id", "block_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))) <= max_h)
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    assert got == brute
