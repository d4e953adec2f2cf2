"""Similarity search over embedding columns (``array<float>``).

Two tiers, same results contract:

- **Brute-force top-k** (correctness baseline): queries × corpus cosine
  via JVM higher-order functions, per-query top-k by window. The query
  side is broadcast (it's the small side by construction), so the
  corpus is scanned once with NO shuffle of corpus rows — at 100 TB the
  plan is scan → broadcast-nested-loop → partial top-k per partition →
  final top-k, and the only shuffled data is k rows per query per
  partition.
- **LSH-bucketed** (scale path): random-hyperplane signatures computed
  from deterministic md5-derived pseudo-hyperplanes (no runtime RNG, no
  side file) bucket the corpus; candidates = bucket collisions (with
  multi-probe rotations), then exact cosine re-rank. Recall tunable by
  planes/probes; candidate set is ~corpus/2^planes per query.

A vectorized Pandas-UDF dot product (numpy matmul per Arrow batch) is
provided for the widest fan-outs where JVM HOF per-element lambdas lose
to BLAS — measured, not assumed (see bench).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ig_etl_sync_spark.functions.hashing import md5_int32 as _md5_int
from ig_etl_sync_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)


def _check_dim(df: DataFrame, vec_col: str, dim: int) -> None:
    """Fail loudly when the embedding dimension != ``dim``: a mismatch
    silently degrades hyperplane bucketing to 'everything in bucket 0'
    (null-poisoned dot products), i.e. an invisible O(n²) fallback.
    One limit-1 action — negligible against the LSH job itself."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is not None and row["d"] != dim:
        raise ValueError(
            f"embedding dimension is {row['d']} but dim={dim} was given; "
            "hyperplane signatures require the exact dimension"
        )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors for every query. Returns
    (query_id, neighbor_id, score, rank), excluding self-matches.
    """
    qid = query_id_col or id_col
    # Norms and float->double casts are per-VECTOR quantities: hoist
    # them out of the |corpus| x |queries| pair loop (the corpus side is
    # the one that is huge at scale). dot / (_qn * _cn) multiplies the
    # same doubles in the same order as the fused cosine_similarity, so
    # scores stay bit-identical.
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cv"),
    )
    if metric == "cosine":
        q = q.withColumn("_qn", l2_norm("_qv"))
        c = c.withColumn("_cn", l2_norm("_cv"))
        score = dot_product("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))
    else:
        score = dot_product("_qv", "_cv")
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(score, 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_weights(p: int, dim: int = 64) -> list[int]:
    """Plane ``p``'s integer weights: ``md5("p:d") % 2001 - 1000`` per
    dimension — md5-derived at plan time, so any engine (and the DuckDB
    oracle, which imports THIS function) reproduces them exactly.
    Single source of truth for the formula."""
    import hashlib

    return [
        int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) % 2001 - 1000
        for d in range(dim)
    ]


def hyperplane_signature(
    vec_col: str | Column, planes: int = 8, dim: int = 64, plane_offset: int = 0
) -> Column:
    """Sign pattern of ``planes`` deterministic pseudo-random hyperplanes.

    Plane p's weight for dimension d = (md5_int("p:d") mod 2001 - 1000)
    — a fixed, data-independent pseudo-gaussian surrogate reproducible
    in any engine (and in a DuckDB oracle). Returns a bigint bucket id
    in [0, 2^planes). ``plane_offset`` selects a disjoint plane set
    (independent LSH tables share one deterministic family).
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("bigint")
    for p in range(plane_offset, plane_offset + planes):
        # Weights computed with PYTHON md5 at plan time — bit-identical
        # to md5_int32(lit) (same digest, same substring), but the plan
        # carries dim plain literals instead of dim md5/conv/substr
        # expression trees. At planes=8, dim=64 that is 512 fewer
        # Catalyst nodes per signature call — measured seconds of
        # analysis/codegen time on multi-use plans.
        weights = F.array(
            *[F.lit(float(w)) for w in hyperplane_weights(p, dim)]
        )
        dot = F.aggregate(
            F.zip_with(v, weights, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(
            dot >= 0, F.lit(2 ** (p - plane_offset)).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return bucket


def probe_masks(planes: int, probe_hamming: int) -> list[int]:
    """All XOR masks with popcount ≤ ``probe_hamming`` over ``planes``
    bits, ascending — the multi-probe neighborhood of a bucket. Shared
    by the operator and its DuckDB oracle so they cannot diverge."""
    from itertools import combinations

    masks = [
        sum(1 << b for b in bits)
        for r in range(probe_hamming + 1)
        for bits in combinations(range(planes), r)
    ]
    return sorted(masks)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    planes: int = 8,
    dim: int = 64,
    probe_hamming: int = 1,
    tables: int = 1,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket join + exact cosine re-rank.

    Two independent recall levers, both query-side only (the corpus is
    bucketed once per table, never re-scanned per query):

    - ``probe_hamming=h`` probes each query into every bucket within
      Hamming distance h of its own — Σ C(planes, i), i ≤ h probes
      (all masks, not just single-bit: h=2 at planes=8 is 37 probes).
    - ``tables=t`` buckets the corpus under t disjoint plane sets of
      the same deterministic family and unions the candidates — the
      classic independent-tables LSH bound on miss probability.

    Candidates are deduped before the exact re-rank, so recall knobs
    never change a returned score, only coverage.
    """
    qid = query_id_col or id_col
    _check_dim(corpus, vec_col, dim)
    _check_dim(queries, vec_col, dim)  # a wrong-dim QUERY side degrades too
    masks = probe_masks(planes, probe_hamming)
    # The corpus frame fans into one branch per table below — without
    # the lazy checkpoint each branch re-scans the corpus and recomputes
    # EVERY table's signatures (the self-join-diamond rule). The l2 norm
    # is hoisted per vector (it rides the checkpoint); dot / (_qn * _cn)
    # multiplies the same doubles in the same order as the fused cosine,
    # so scores stay bit-identical.
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            *[
                hyperplane_signature(vec_col, planes, dim, plane_offset=t * planes)
                .alias(f"_b{t}")
                for t in range(tables)
            ],
        )
        .withColumn("_cn", l2_norm("_cv"))
        .localCheckpoint(eager=False)
    )
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        *[
            hyperplane_signature(vec_col, planes, dim, plane_offset=t * planes)
            .alias(f"_qb{t}")
            for t in range(tables)
        ],
    ).withColumn("_qn", l2_norm("_qv"))
    cand = None
    for t in range(tables):
        qt = q.select(
            "query_id",
            "_qv",
            "_qn",
            F.explode(
                F.array(
                    *[
                        F.col(f"_qb{t}").bitwiseXOR(F.lit(m).cast("bigint"))
                        for m in masks
                    ]
                )
            ).alias("bucket"),
        )
        ct = c.select(
            "neighbor_id", "_cv", "_cn", F.col(f"_b{t}").alias("bucket")
        )
        p = ct.join(F.broadcast(qt), "bucket").select(
            "query_id", "neighbor_id", "_qv", "_cv", "_qn", "_cn"
        )
        cand = p if cand is None else cand.unionByName(p)
    scored = (
        cand.where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_bucketed_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    planes: int = 8,
    dim: int = 64,
    tables: int = 2,
) -> DataFrame:
    """Embedding near-dup pairs, 100 TB path: hyperplane-bucket blocking
    → exact cosine verify. Only vectors sharing a bucket in ≥1 of
    ``tables`` independent plane sets ever meet — the self-join shuffles
    (id, bucket) pairs, never the O(n²) cross product. High-cosine pairs
    land in the same bucket w.h.p. (each plane splits them with prob
    ≈ angle/π); multiple tables bound the miss rate.
    """
    _check_dim(embeddings, vec_col, dim)
    bucketed = (
        embeddings.select(
            F.col(id_col),
            F.col(vec_col).alias("_v"),
            *[
                # Table t uses planes [t*planes, (t+1)*planes) of the same
                # deterministic family — independent sets, no extra scan.
                hyperplane_signature(vec_col, planes, dim, plane_offset=t * planes).alias(f"_b{t}")
                for t in range(tables)
            ],
        )
        # the l2 norm is a per-VECTOR quantity: computing it here (it
        # rides the checkpoint, +8 bytes/row) instead of inside the
        # per-pair cosine drops two of the three 64-element aggregates
        # from the in-bucket verify loop; dot / (_na * _nb) multiplies
        # the same doubles in the same order, so cosines stay
        # bit-identical.
        .withColumn("_n", l2_norm("_v"))
        .localCheckpoint(eager=False)
    )
    # ^ 2 tables × 2 join sides = 4 plan branches; without the lazy
    # checkpoint every branch re-scans the corpus and recomputes ALL
    # table signatures (4 parquet scans observed at sf0.01).
    # Verify INSIDE each bucket join, BEFORE the cross-table dedup: the
    # vectors are already co-located by the join, so the cosine filter
    # runs streaming on the join output and only narrow survivors
    # (id_a, id_b, cosine) reach the dropDuplicates shuffle. The old
    # verify-after-dedup form shuffled every CANDIDATE with both
    # 64-float vectors attached — ~80 GB of spill at sf1 on clustered
    # corpora (measured: filled the disk); this form shuffles the true
    # pairs only. Bucket-overlapped candidates pay the cosine twice —
    # compute is linear and cheap, shuffle bytes were the bottleneck.
    pairs = None
    for t in range(tables):
        a = bucketed.select(
            F.col(id_col).alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_n").alias("_na"),
            F.col(f"_b{t}").alias("_b"),
        )
        b = bucketed.select(
            F.col(id_col).alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"),
            F.col(f"_b{t}").alias("_b"),
        )
        p = (
            a.join(b, "_b")
            .where(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.round(
                    dot_product("_va", "_vb") / (F.col("_na") * F.col("_nb")), 6
                ).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    # per-pair cosine is identical in every table's copy, so the
    # arbitrary-survivor dedup is value-deterministic
    return pairs.dropDuplicates(["id_a", "id_b"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    n_centroids: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantization + probed search.

    Centroids are chosen deterministically as the ``n_centroids``
    corpus vectors with the smallest ``md5_int32(id)`` (a uniform random
    sample without RNG — reproducible plans, replicable in a DuckDB
    oracle). ``refine_iters`` runs that many distributed Lloyd sweeps
    (assign → per-cluster mean) on top — standard k-means centroid
    quality at one corpus pass per sweep; leave at 0 for bit-exact
    oracle replay. Corpus vectors are assigned to their nearest centroid
    (one broadcast pass); each query probes its ``n_probe`` nearest
    centroid lists and exact-reranks only those lists — the
    inverted-file structure: search cost ≈ corpus × n_probe /
    n_centroids.
    """
    qid = query_id_col or id_col

    # 1. deterministic centroid sample via orderBy().limit(n) — this
    # compiles to TakeOrderedAndProject: each partition keeps its local
    # top-n and only n_centroids × n_partitions rows ever meet the
    # driver-side merge. (A no-partition Window here would instead sort
    # the WHOLE corpus in one task — the r01 scale-killer.) centroid_id
    # must be STABLE across the two evaluations below (corpus + query
    # assignment): row_number over the md5 total order on the ≤n
    # surviving rows is deterministic; the window moves only those n
    # rows, not the corpus.
    _ckey = _md5_int(F.col(id_col).cast("string"))
    cw = Window.orderBy(F.col("_ck").asc(), F.col(id_col).asc())
    cent = (
        corpus.select(F.col(id_col), F.col(vec_col), _ckey.alias("_ck"))
        .orderBy(F.col("_ck").asc(), F.col(id_col).asc())
        .limit(n_centroids)
        .withColumn("centroid_id", F.row_number().over(cw))
        .select("centroid_id", F.col(vec_col).alias("_cent"))
    )

    # Optional Lloyd refinement: each sweep reassigns the corpus to its
    # nearest current centroid and replaces every centroid with its
    # cluster mean (computed dim-agnostically via posexplode → per-
    # position avg → ordered reassembly — all partial aggregations).
    # Empty clusters keep their previous centroid. One corpus pass per
    # sweep; centroid ids never change, so downstream probing is
    # unaffected.
    for _ in range(refine_iters):
        assigned = (
            corpus.select(F.col(id_col).alias("_rid"), F.col(vec_col).alias("_rv"))
            .crossJoin(F.broadcast(cent))
            .withColumn(
                "_dist",
                F.aggregate(
                    F.zip_with(
                        F.col("_rv"),
                        F.col("_cent"),
                        lambda a, b: (a.cast("double") - b.cast("double"))
                        * (a.cast("double") - b.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
        )
        aw = Window.partitionBy("_rid").orderBy(
            F.col("_dist").asc(), F.col("centroid_id").asc()
        )
        nearest = (
            assigned.withColumn("_ar", F.row_number().over(aw))
            .where(F.col("_ar") == 1)
            .select("centroid_id", "_rv")
        )
        means = (
            nearest.select(
                "centroid_id", F.posexplode(F.col("_rv")).alias("_pos", "_val")
            )
            .groupBy("centroid_id", "_pos")
            .agg(F.avg(F.col("_val").cast("double")).alias("_m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
                    lambda s: s["_m"],
                ).alias("_mean")
            )
        )
        cent = (
            cent.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(
                    F.col("_mean"),
                    F.transform(F.col("_cent"), lambda x: x.cast("double")),
                ).alias("_cent"),
            )
        )

    def nearest_centroids(df: DataFrame, key: str, vcol: str, n: int) -> DataFrame:
        """Attach the n nearest centroid ids to each row of df (keyed
        by the unique ``key`` column)."""
        scored = df.crossJoin(F.broadcast(cent)).withColumn(
            "_dist",
            F.aggregate(
                F.zip_with(
                    F.col(vcol),
                    F.col("_cent"),
                    lambda a, b: (a.cast("double") - b.cast("double"))
                    * (a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        w = Window.partitionBy(key).orderBy(
            F.col("_dist").asc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("_cr", F.row_number().over(w))
            .where(F.col("_cr") <= n)
            .drop("_dist", "_cr", "_cent")
        )

    # 2. corpus → single nearest list; queries → n_probe lists
    c_assigned = nearest_centroids(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
        "neighbor_id",
        "_cv",
        1,
    )
    q_assigned = nearest_centroids(
        queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("_qv")),
        "query_id",
        "_qv",
        n_probe,
    )

    # 3. probe: join on centroid list, exact cosine re-rank. No dedup:
    # each corpus vector lives in exactly one list and probe lists are
    # distinct, so a (query, neighbor) pair matches at most once.
    # Norms are hoisted per side (per-vector, not per-pair); the
    # division multiplies the same doubles in the same order as the
    # fused cosine, so scores are bit-identical.
    scored = (
        c_assigned.withColumn("_cn", l2_norm("_cv"))
        .join(F.broadcast(q_assigned.withColumn("_qn", l2_norm("_qv"))), "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def pandas_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Vectorized alternative: per-partition numpy matmul against the
    collected query matrix via ``mapInPandas`` (Arrow batches). Use when
    queries ≫ tens (HOF cost scales with queries × dim per row; BLAS
    amortizes). Query matrix must fit in executor memory — it is the
    broadcast side by design.
    """
    import numpy as np
    import pandas as pd

    qid = query_id_col or id_col
    # Output id types follow the input schema (hardcoding `long` broke
    # string-keyed corpora).
    id_type = corpus.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[qid].dataType.simpleString()
    qrows = queries.select(qid, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows])
    q_mat = np.array([r[1] for r in qrows], dtype="float64")
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = np.array(pdf[vec_col].tolist(), dtype="float64")
            c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_norm @ q_norm.T  # (batch, nq)
            for j, qv in enumerate(q_ids):
                yield pd.DataFrame(
                    {
                        "query_id": qv,
                        "neighbor_id": pdf[id_col].to_numpy(),
                        "score": np.round(sims[:, j], 6),
                    }
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id {qid_type}, neighbor_id {id_type}, score double"
    ).where(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# -- product quantization ---------------------------------------------

def _norm_vec_sql(vec: str) -> str:
    """L2-normalized double vector (PQ operates in cosine geometry:
    after normalization, L2 argmin order == cosine argmax order)."""
    return (
        f"transform({vec}, x -> cast(x as double) /"
        f" sqrt(aggregate(transform({vec}, y -> cast(y as double) * cast(y as double)),"
        f" 0.0d, (p, q) -> p + q)))"
    )


def _d2_sql(a: str, b: str) -> str:
    """Squared-L2 between two array<double> expressions, sequential
    left-to-right summation (cross-engine reproducible order)."""
    return (
        f"aggregate(zip_with({a}, {b}, (a, b) -> (a - b) * (a - b)),"
        " 0.0d, (x, y) -> x + y)"
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic PQ codebooks: ONE row with ``_cb[s][j]`` = the
    s-th subvector of the j-th md5-smallest corpus vector.

    Same no-RNG sampling as IVF centroids (TakeOrderedAndProject over
    the md5 order — never a global single-partition window), reshaped:
    the j-th sampled vector contributes its s-th slice to subspace s's
    codebook, so one sample of ``ks`` rows fills all ``m`` codebooks
    and a DuckDB oracle can replay the construction exactly.
    """
    _ckey = _md5_int(F.col(id_col).cast("string"))
    cw = Window.orderBy(F.col("_ck").asc(), F.col(id_col).asc())
    sample = (
        corpus.select(
            F.col(id_col),
            F.expr(_norm_vec_sql(vec_col)).alias("_v"),
            _ckey.alias("_ck"),
        )
        .orderBy(F.col("_ck").asc(), F.col(id_col).asc())
        .limit(ks)
        .withColumn("_code", F.row_number().over(cw) - 1)
    )
    # one row per (code): array of m subvectors, then fold to ONE row
    # ordered [s][j] — the broadcastable whole-codebook literal
    subs = sample.select(
        "_code",
        F.expr(
            f"transform(sequence(0, {m - 1}),"
            f" s -> slice(_v, s * (size(_v) div {m}) + 1, size(_v) div {m}))"
        ).alias("_subs"),
    )
    return subs.groupBy().agg(
        F.expr(
            f"transform(sequence(0, {m - 1}),"
            f" s -> transform(array_sort(collect_list(struct(_code, _subs))),"
            f"      e -> e._subs[s]))"
        ).alias("_cb")
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` codebook indices — a single
    shuffle-free projection against the broadcast one-row codebook.

    32× compression at (d=64, m=8, float32): the corpus never moves,
    no groupBy/window — argmin over codes runs as a HOF fold per
    subspace (ties → smaller code, strict ``<``). The squared-distance
    term is evaluated twice per candidate inside the fold (compare +
    store); constant-factor, not the O(n²) CollapseProject trap.
    """
    enc = f"""
    transform(sequence(0, {m - 1}), s ->
      aggregate(sequence(0, {ks - 1}),
        named_struct('j', -1, 'd', cast('Infinity' as double)),
        (acc, jj) -> CASE WHEN {_d2_sql(f"slice(_v, s * (size(_v) div {m}) + 1, size(_v) div {m})", "_cb[s][jj]")} < acc.d
          THEN named_struct('j', jj, 'd', {_d2_sql(f"slice(_v, s * (size(_v) div {m}) + 1, size(_v) div {m})", "_cb[s][jj]")})
          ELSE acc END).j)
    """
    return (
        corpus.select(F.col(id_col), F.expr(_norm_vec_sql(vec_col)).alias("_v"))
        .crossJoin(F.broadcast(codebooks))
        .select(id_col, F.expr(enc).alias("codes"))
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    rerank: int = 0,
) -> DataFrame:
    """Approximate top-k via PQ + asymmetric distance computation.

    Each query precomputes its ``m × ks`` distance table against the
    codebooks (one tiny projection); corpus-side cost is then a table
    lookup-sum over the m codes per row — no vector arithmetic touches
    the corpus at query time, which is the entire point at 100 TB:
    the float embeddings are read ONCE (encode) and queries scan only
    the 8-byte code columns.

    ``rerank=0``: rank by quantized distance alone — output
    ``query_id, neighbor_id, approx_dist (6dp asc), rank``.
    ``rerank=r``: production shape — ADC selects a ``k*r`` shortlist,
    then ONLY those rows' float vectors are fetched for an exact
    cosine re-rank (measured here: recall@10 0.10 → 0.48 at r=5 on
    uniform-random vectors, the hardest case). Output
    ``query_id, neighbor_id, score (cosine 6dp desc), rank``.
    The shortlist is tiny (k·r·n_queries rows), so the exact stage
    broadcasts it against the corpus — the 100 TB read stays code-only.
    """
    qid = query_id_col or id_col
    cb = pq_codebooks(corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(corpus, cb, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    dt_expr = f"""
    transform(sequence(0, {m - 1}), s ->
      transform(sequence(0, {ks - 1}), jj ->
        {_d2_sql(f"slice(_qv, s * (size(_qv) div {m}) + 1, size(_qv) div {m})", "_cb[s][jj]")}))
    """
    q_tables = (
        queries.select(
            F.col(qid).alias("query_id"),
            F.expr(_norm_vec_sql(vec_col)).alias("_qv"),
        )
        .crossJoin(F.broadcast(cb))
        .select("query_id", F.expr(dt_expr).alias("_dt"))
    )
    scored = (
        codes.crossJoin(F.broadcast(q_tables))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                F.expr(
                    f"aggregate(sequence(0, {m - 1}), 0.0d,"
                    " (acc, s) -> acc + _dt[s][codes[s]])"
                ),
                6,
            ).alias("approx_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    if not rerank:
        return scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )
    shortlist = (
        scored.withColumn("_sr", F.row_number().over(w))
        .where(F.col("_sr") <= k * rerank)
        .select("query_id", "neighbor_id")
    )
    c_vec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    q_vec = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("_qxv")
    )
    exact = (
        F.broadcast(shortlist)
        .join(c_vec, "neighbor_id")
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity("_qxv", "_cv"), 6).alias("score"),
        )
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return exact.withColumn("rank", F.row_number().over(rw)).where(F.col("rank") <= k)


# -- per-dimension standardization ------------------------------------

#: standardize quantization: q = floor(x * 1000). Kept coarse so the
#: BIGINT moment sums stay far from overflow (n*sumsq <= n^2 * (4e3)^2:
#: safe to ~2e5 corpus rows per the bound below; raise the scale only
#: with a matching overflow re-check).
_STD_SCALE = 1_000


def standardize_embeddings(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-DIMENSION z-score standardization of an embedding column —
    the feature-normalization pass run before clustering / ANN so no
    dimension dominates the metric. Returns one row per (vector,
    dimension): ``(vec_id, pos INT, z DOUBLE)``.

    Cross-engine exact: components quantize to ``q = floor(x*1000)``
    (BIGINT); per-dimension count/sum/sum-of-squares are exact integer
    aggregates; and the z-score is computed as::

        z = (n*q - sum) / sqrt(n*sumsq - sum^2)

    — integer numerator, integer radicand, then ONE IEEE sqrt and ONE
    division, both correctly rounded, so any engine produces the same
    doubles bit-for-bit. Constant dimensions (zero variance) return
    z = 0.0 rather than dividing by zero.

    Scale: posexplode → one (pos)-keyed partial agg (dims rows out) →
    broadcast the dims-row stats back onto the exploded frame. The
    corpus never shuffles; only the tiny stats table moves.
    """
    ex = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * F.lit(float(_STD_SCALE)))
                .cast("long"),
            )
        ).alias("pos", "_q"),
    )
    stats = ex.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_q").alias("_s"),
        F.sum(F.col("_q") * F.col("_q")).alias("_ss"),
    )
    rad = F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s")
    return (
        ex.join(F.broadcast(stats), "pos")
        .select(
            id_col,
            "pos",
            F.when(rad <= 0, F.lit(0.0))
            .otherwise(
                (F.col("_n") * F.col("_q") - F.col("_s")).cast("double")
                / F.sqrt(rad.cast("double"))
            )
            .alias("z"),
        )
    )


# -- deterministic random projection (JL) -----------------------------

def random_projection(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    in_dim: int = 64,
) -> DataFrame:
    """Deterministic Johnson-Lindenstrauss-style dimensionality
    reduction: project each embedding onto ``out_dim`` fixed
    pseudo-random integer directions (the :func:`hyperplane_weights`
    md5 family — the same data-independent surrogate the LSH buckets
    use, so any engine regenerates the matrix exactly).

    Exactness: components quantize to ``q = floor(x*1000)`` and each
    output coordinate is the exact BIGINT dot ``y_p = sum_d q_d *
    w_{p,d}``; the returned double is ``y_p / 1e6`` — one
    correctly-rounded division, bit-identical cross-engine.

    Returns exploded ``(id_col, pos INT, y DOUBLE)`` rows.

    Scale: one fused projection, O(out_dim * in_dim) multiply-adds per
    row inside codegen, no shuffle — reduce 100 TB of 64-d vectors to
    8-d sketches in a single scan (the standard pre-filter before
    exact re-rank, and the cheap input for coarse clustering).
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(1000.0)).cast("long"),
    )
    ys = []
    for p in range(out_dim):
        w = F.array(
            *[F.lit(int(x)) for x in hyperplane_weights(p, in_dim)]
        )
        ys.append(
            F.aggregate(
                F.zip_with(q, w, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.lit(1_000_000.0)
        )
    return df.select(
        F.col(id_col), F.posexplode(F.array(*ys)).alias("pos", "y")
    )


def embedding_isolation(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    planes: int = 4,
    dim: int = 64,
    tables: int = 2,
) -> DataFrame:
    """Isolation screen: per-vector count of verified neighbors
    (cosine >= ``threshold``) under the deterministic hyperplane-LSH
    candidate graph, plus an ``isolated`` flag — the curation filter
    for noisy / out-of-distribution embeddings (the opposite tail of
    SemDeDup: NO near neighbor instead of a too-near one).

    The candidate graph is the md5-deterministic bucket join of
    :func:`lsh_bucketed_pairs`, so isolation is approximate exactly the
    way the LSH near-dup relation is (a bucket miss can under-count a
    borderline neighbor) and the whole relation replays in SQL.

    Returns ``(id_col, n_neighbors BIGINT, isolated BOOLEAN)`` for
    EVERY input vector. Scale: the verified pair relation never leaves
    the bucket join wider than (id_a, id_b); counting makes the output
    linear in the corpus no matter how dense the neighborhood graph is.
    """
    pairs = lsh_bucketed_pairs(
        embeddings,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        planes=planes,
        dim=dim,
        tables=tables,
    )
    # Diamond rule (CLAUDE.md): a two-branch id_a/id_b union would
    # re-run the bucket joins + cosine verify per branch (the `bucketed`
    # checkpoint inside lsh_bucketed_pairs stops the corpus re-scan but
    # NOT the join/verify recompute). Exploding array(id_a, id_b) keeps
    # ONE plan branch — the verify runs once and the pair relation
    # streams straight into the count agg, never materialized (a
    # localCheckpoint also fixes the diamond but stores the
    # family-quadratic pair list; at sf1 that is >100M rows). The
    # exploded array is two cheap column refs, not an expensive derived
    # expression, so the per-row re-evaluation trap doesn't apply.
    both = pairs.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias(id_col)
    )
    counts = both.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_neighbors")
    )
    return (
        embeddings.select(id_col)
        .join(counts, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce(F.col("n_neighbors"), F.lit(0)).cast("long").alias(
                "n_neighbors"
            ),
            (F.coalesce(F.col("n_neighbors"), F.lit(0)) == 0).alias(
                "isolated"
            ),
        )
    )


def hard_negative_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
    planes: int = 4,
    dim: int = 64,
    tables: int = 2,
) -> DataFrame:
    """X83: hard-negative mining for contrastive training — per anchor
    vector, the top-``k`` most-cosine-similar vectors carrying a
    DIFFERENT label, drawn from the deterministic hyperplane-LSH
    candidate graph (the standard "hardest in-batch negatives at corpus
    scale" prep step: random negatives are too easy, exhaustive search
    is O(n²)).

    Plan shape is the `lsh_bucketed_pairs` discipline: signatures for
    ``tables`` independent plane sets in one scan (checkpointed — 2
    tables × 2 join sides would otherwise re-scan 4×), cosine verified
    INSIDE each bucket join where the vectors are co-located, only
    narrow ``(anchor, negative, cosine)`` rows reach the cross-table
    dedup, then one per-anchor rank window keeps ``k``. The window
    partitions on the anchor id — candidate fan-in per anchor is
    bucket-bounded (grow ``planes`` with the corpus, the documented
    LSH dial), so no partition scales with n.

    Returns ``(anchor_id, anchor_label, neg_id, neg_label,
    cosine DOUBLE)`` ranked by (rounded cosine DESC, neg_id ASC) —
    ranking on the ROUNDED measure + id tiebreak keeps the cut
    cross-engine deterministic.
    """
    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    _check_dim(embeddings, vec_col, dim)
    bucketed = (
        embeddings.select(
            F.col(id_col),
            F.col(label_col).alias("_lab"),
            F.col(vec_col).alias("_v"),
            *[
                hyperplane_signature(
                    vec_col, planes, dim, plane_offset=t * planes
                ).alias(f"_b{t}")
                for t in range(tables)
            ],
        )
        .withColumn("_n", l2_norm("_v"))
        .localCheckpoint(eager=False)
    )
    cands = None
    for t in range(tables):
        a = bucketed.select(
            F.col(id_col).alias("anchor_id"),
            F.col("_lab").alias("anchor_label"),
            F.col("_v").alias("_va"),
            F.col("_n").alias("_na"),
            F.col(f"_b{t}").alias("_b"),
        )
        b = bucketed.select(
            F.col(id_col).alias("neg_id"),
            F.col("_lab").alias("neg_label"),
            F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"),
            F.col(f"_b{t}").alias("_b"),
        )
        p = (
            a.join(b, "_b")
            .where(
                (F.col("anchor_id") != F.col("neg_id"))
                & (F.col("anchor_label") != F.col("neg_label"))
            )
            .select(
                "anchor_id",
                "anchor_label",
                "neg_id",
                "neg_label",
                F.round(
                    dot_product("_va", "_vb")
                    / (F.col("_na") * F.col("_nb")),
                    6,
                ).alias("cosine"),
            )
        )
        cands = p if cands is None else cands.unionByName(p)
    # a pair seen in several tables carries the identical cosine —
    # the arbitrary-survivor dedup is value-deterministic
    deduped = cands.dropDuplicates(["anchor_id", "neg_id"])
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id").asc()
    )
    return (
        deduped.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .drop("_r")
    )


def mmr_diverse_topk(
    emb: DataFrame,
    *,
    anchor_id: int = 0,
    k: int = 10,
    pool: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X90: Maximal Marginal Relevance re-ranking (Carbonell &
    Goldstein 1998) — the diversity-aware context selector: from the
    exact top-``pool`` candidates around an anchor vector, greedily
    pick ``k`` items maximizing ``rel(c) - max_{s in S} sim(c, s)``
    (λ = 0.5, both terms equally weighted, scores scaled by 2) so the
    selection covers the neighborhood instead of returning ``k``
    near-copies of the best hit — the standard RAG-context / few-shot
    exemplar picker.

    Determinism: ``rel`` and every pairwise ``sim`` are cosines rounded
    to 6 dp IN-ENGINE (the ``brute_force_topk`` parity contract), the
    greedy score is their exact double difference, and ties break by
    id — every round replays bit-identically in the unrolled SQL twin.

    Scale: the candidate pool is a BOUNDED list (produced by the exact
    top-k here; an ANN route at corpus scale), so the whole pool×pool
    cosine matrix is ≤ ``pool²`` rounded doubles — ONE Spark job
    computes it (round 8; the previous form ran ``k`` driver-side
    rounds each ending in a 1-row collect, paying k plan+schedule
    round-trips for arithmetic over ≤2500 numbers), and the inherently
    serial greedy runs on the driver over the collected matrix. Every
    number the greedy consumes (rel, pairwise sims) is still computed
    and rounded IN-ENGINE, so the output is bit-identical to the
    round-by-round form (the contract oracle pins it).

    Returns ``(id_col, mmr_rank BIGINT, rel, mmr_score)`` for the
    selected items in pick order.
    """
    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    if pool < k:
        raise ValueError(f"pool={pool} must be >= k={k}")
    spark = emb.sparkSession
    anchor = emb.where(F.col(id_col) == anchor_id)
    rel = brute_force_topk(
        emb, anchor, k=pool, id_col=id_col, vec_col=vec_col
    ).select(F.col("neighbor_id").alias(id_col), F.col("score").alias("rel"))
    cand = (
        rel.join(emb.select(id_col, vec_col), id_col)
        .select(
            id_col,
            "rel",
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "_v"
            ),
        )
        .withColumn("_n", l2_norm("_v"))
        # the corpus-wide top-k feeds BOTH crossJoin sides — pin it so
        # the expensive pool selection runs once
        .localCheckpoint(eager=False)
    )
    # pool×pool matrix with self-pairs kept: every pool id appears as
    # _ia even if the pool is a single row, so rel survives collection
    pairs = (
        cand.select(
            F.col(id_col).alias("_ia"), F.col("rel").alias("_ra"), "_v", "_n"
        )
        .crossJoin(
            F.broadcast(
                cand.select(
                    F.col(id_col).alias("_ib"),
                    F.col("_v").alias("_vb"),
                    F.col("_n").alias("_nb"),
                )
            )
        )
        .select(
            "_ia",
            "_ra",
            "_ib",
            F.round(
                dot_product("_v", "_vb") / (F.col("_n") * F.col("_nb")), 6
            ).alias("_s"),
        )
        .collect()
    )
    rels: dict = {}
    sims: dict = {}
    for r in pairs:
        rels[r["_ia"]] = r["_ra"]
        sims[(r["_ia"], r["_ib"])] = r["_s"]
    ids = sorted(rels)
    picked: list[tuple] = []
    sel_ids: list = []
    for step in range(k):
        best = None
        for c in ids:
            if c in sel_ids:
                continue
            # same IEEE ops the per-round Spark plan performed: max of
            # rounded sims, exact double difference, (score desc, id
            # asc) tiebreak
            ms = max((sims[(c, s)] for s in sel_ids), default=0.0)
            score = rels[c] - ms
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, rels[c], score)
        if best is None:
            break
        picked.append((best[1], step + 1, float(best[2]), float(best[3])))
        sel_ids.append(best[1])
    return spark.createDataFrame(
        picked,
        f"{id_col} long, mmr_rank long, rel double, mmr_score double",
    )


def lsh_recall_audit(
    embeddings: DataFrame,
    *,
    sample: int = 200,
    planes: int = 4,
    tables: int = 2,
    band_edges: tuple = (0.3, 0.5, 0.7),
    seed: str = "lshrec-v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X93: measured LSH recall — on a deterministic sample, compare the
    hyperplane-bucket pair route against brute-force truth and report
    recall per cosine band (the S-curve, MEASURED on this corpus at
    this plane setting instead of assumed from theory). The audit a
    pipeline runs before trusting a planes dial at a new scale — the
    repo rule "measure, don't guess" applied to its own approximation.

    Scale: the quadratic truth is confined to the ``sample`` rows
    (seeded-md5 top-``sample`` — an unbiased reproducible subset), and
    hyperplane buckets are DATA-INDEPENDENT per vector, so the
    sample-restricted LSH pair set is exactly the full run's pair set
    restricted to sampled ids: sample recall is an unbiased estimate
    of corpus recall at any corpus size. The sample crossJoin is the
    bounded-side broadcast form (the ``brute_force_topk`` idiom).

    Returns ``(band, n_truth, n_caught, recall_ppm)`` — one row per
    cosine band ``[edge_i, edge_i+1)`` (last band closes at 1].
    """
    from ig_etl_sync_spark.functions.hashing import md5_int32

    if sample < 2:
        raise ValueError(f"sample={sample} must be >= 2")
    if len(band_edges) < 1:
        raise ValueError("band_edges must be non-empty")
    h = md5_int32(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    samp = (
        embeddings.select(id_col, vec_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .limit(sample)
        .localCheckpoint(eager=False)  # truth both sides + the LSH route
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    side = samp.select(
        F.col(id_col), v.alias("_v")
    ).withColumn("_n", l2_norm("_v"))
    a = side.select(
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = side.select(
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    lo = float(band_edges[0])
    truth = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot_product("_va", "_vb") / (F.col("_na") * F.col("_nb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= lo)
    )
    caught = lsh_bucketed_pairs(
        samp,
        id_col=id_col,
        vec_col=vec_col,
        threshold=lo,
        planes=planes,
        tables=tables,
    ).select("id_a", "id_b", F.lit(1).cast("long").alias("_c"))
    edges = [float(e) for e in band_edges]
    expr = None
    for i, e in enumerate(edges):
        hi = edges[i + 1] if i + 1 < len(edges) else None
        label = f"{e:.2f}-{hi:.2f}" if hi is not None else f"{e:.2f}-1.00"
        cond = (
            (F.col("cosine") >= e) & (F.col("cosine") < hi)
            if hi is not None
            else F.col("cosine") >= e
        )
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    return (
        truth.join(caught, ["id_a", "id_b"], "left")
        .select(expr.alias("band"), F.coalesce("_c", F.lit(0)).alias("_c"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_truth"),
            F.sum("_c").cast("long").alias("n_caught"),
        )
        .withColumn(
            "recall_ppm",
            F.expr("n_caught * 1000000 div n_truth").cast("long"),
        )
    )


# -- margin-based bitext/parallel-pair mining (X102) -------------------

def margin_pair_mining(
    embeddings: DataFrame,
    side_a,
    side_b,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    margin_threshold_ppm: int = 1_050_000,
    planes: int | None = None,
    tables: int = 1,
    dim: int = 64,
) -> DataFrame:
    """X102: margin-criterion pair mining between two embedding sides
    (Artetxe & Schwenk 2019, arXiv:1811.01136 — the ratio-margin rule
    CCMatrix/LASER bitext mining runs): a candidate pair scores by its
    cosine RELATIVE to each endpoint's k-NN neighborhood density,

        margin(x, y) = cos(x, y) / ((avgk(x) + avgk(y)) / 2),

    which suppresses hubs (vectors close to everything) that absolute
    cosine thresholds mis-mine. ``side_a``/``side_b`` are boolean
    Column predicates selecting the two sides (source/target language
    pools, two corpus snapshots, ...).

    Exact-integer discipline: per-pair cosine is ONE fixed-association
    double expression (identical in any engine) quantized to
    micro-units (``round(round(cos, 6) * 1e6)`` → BIGINT). All margin
    arithmetic is then BIGINT rationals —

        margin_ppm = 2e6·c·ka·kb div (sa·kb + sb·ka)

    with ``sa/ka`` the sum/count of x's top-k quantized cosines toward
    the other side (rank by cosine DESC, neighbor id ASC — ties
    deterministic) — no float division or float average anywhere, so
    the relation replays bit-for-bit in SQL. Pairs are mined only
    where ``c > 0`` and the denominator is positive (a pair whose
    endpoints' neighborhoods are net-negative cannot be parallel; also
    keeps truncating ``div`` ≡ floor ``//`` — the repo's negative-
    operand rule).

    Returns one row per side-A vector that has any positive-cosine
    candidate::

        (id_a, id_b, cosine_q BIGINT, margin_ppm BIGINT,
         mutual BOOLEAN, accepted BOOLEAN)

    where ``id_b`` is x's argmax-margin candidate (margin DESC, id_b
    ASC), ``mutual`` marks pairs that are ALSO the argmax of their B
    endpoint (the paper's bidirectional "max" strategy), and
    ``accepted = mutual AND margin_ppm >= margin_threshold_ppm``.

    Scale shape: with ``planes=None`` this is the BRUTE candidate
    route (A×B exact dots) — the correctness baseline, same posture as
    :func:`~ig_etl_sync_spark.operators.dedup.embedding_near_dup_pairs`.
    With ``planes`` set, candidates come from random-hyperplane bucket
    collisions across ``tables`` independent signatures (the
    :func:`lsh_bucketed_pairs` recipe: ~|A|·|B|/2^planes candidates
    per table, planes grows ~log2(n) with the corpus) and the k-NN
    neighborhood stats are computed over the CANDIDATE set — the
    operator's defined contract at scale, replayed exactly by the
    oracle (sparser neighborhoods are the dial's documented trade).
    Cosines are verified INSIDE each bucket join (vectors co-located;
    only narrow (id, id, c) rows leave it — the repo pair rule). Norms
    are hoisted per vector (never per pair), the A side is spread
    before the nested-loop join (scan-parallelism rule), and
    everything after the pair scan is linear in |A|+|B|.
    """
    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    if planes is not None and (planes < 1 or tables < 1):
        raise ValueError("planes and tables must be >= 1 when bucketed")
    n_parts = embeddings.sparkSession.sparkContext.defaultParallelism

    def side(pred, id_out: str, v_out: str, n_out: str) -> DataFrame:
        return (
            embeddings.where(pred)
            .select(
                F.col(id_col).alias(id_out),
                F.transform(
                    F.col(vec_col), lambda x: x.cast("double")
                ).alias(v_out),
            )
            .withColumn(n_out, l2_norm(v_out))
        )

    a = side(side_a, "id_a", "v_a", "n_a").repartition(n_parts)
    b = side(side_b, "id_b", "v_b", "n_b")
    # quantized cosine: micro-units, exact BIGINT from here on
    cos_q = F.round(
        F.round(
            dot_product("v_a", "v_b") / (F.col("n_a") * F.col("n_b")), 6
        )
        * F.lit(1_000_000)
    ).cast("long")
    if planes is None:
        cand = a.crossJoin(b).select("id_a", "id_b", cos_q.alias("c"))
    else:
        parts = []
        for t in range(tables):
            asig = a.withColumn(
                "_bk",
                hyperplane_signature(
                    "v_a", planes, dim, plane_offset=t * planes
                ),
            )
            bsig = b.withColumn(
                "_bk",
                hyperplane_signature(
                    "v_b", planes, dim, plane_offset=t * planes
                ),
            )
            parts.append(
                asig.join(bsig, "_bk").select(
                    "id_a", "id_b", cos_q.alias("c")
                )
            )
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p)
    pairs = cand.where(F.col("c") > 0)
    if planes is not None and tables > 1:
        # the same pair collides in several tables with an IDENTICAL c
        # — dedupe the narrow (id, id, c) relation, never the vectors
        pairs = pairs.distinct()
    # top-k stats + both argmax windows consume the pair relation;
    # narrow ints (two ids + one long) — cache would also work, but
    # the relation is pair-QUADRATIC in the sides, so follow the
    # size rule's data-volume branch
    pairs = pairs.localCheckpoint(eager=False)
    w_a = Window.partitionBy("id_a").orderBy(F.desc("c"), F.asc("id_b"))
    w_b = Window.partitionBy("id_b").orderBy(F.desc("c"), F.asc("id_a"))
    ranked = pairs.select(
        "id_a",
        "id_b",
        "c",
        F.row_number().over(w_a).alias("_ra"),
        F.row_number().over(w_b).alias("_rb"),
    )
    stat_a = (
        ranked.where(F.col("_ra") <= k)
        .groupBy("id_a")
        .agg(
            F.sum("c").cast("long").alias("sa"),
            F.count(F.lit(1)).cast("long").alias("ka"),
        )
    )
    stat_b = (
        ranked.where(F.col("_rb") <= k)
        .groupBy("id_b")
        .agg(
            F.sum("c").cast("long").alias("sb"),
            F.count(F.lit(1)).cast("long").alias("kb"),
        )
    )
    scored = (
        pairs.join(stat_a, "id_a")
        .join(stat_b, "id_b")
        .where(F.expr("sa * kb + sb * ka > 0"))
        .select(
            "id_a",
            "id_b",
            F.col("c").alias("cosine_q"),
            F.expr(
                "2 * c * 1000000 * ka * kb div (sa * kb + sb * ka)"
            ).cast("long").alias("margin_ppm"),
        )
        .localCheckpoint(eager=False)  # argmax-A + argmax-B diamond
    )
    m_a = Window.partitionBy("id_a").orderBy(
        F.desc("margin_ppm"), F.asc("id_b")
    )
    m_b = Window.partitionBy("id_b").orderBy(
        F.desc("margin_ppm"), F.asc("id_a")
    )
    best_a = (
        scored.withColumn("_r", F.row_number().over(m_a))
        .where(F.col("_r") == 1)
        .drop("_r")
    )
    best_b = (
        scored.withColumn("_r", F.row_number().over(m_b))
        .where(F.col("_r") == 1)
        .select(
            F.col("id_a").alias("_ba"), F.col("id_b").alias("_bb")
        )
    )
    return best_a.join(
        best_b,
        (F.col("id_a") == F.col("_ba")) & (F.col("id_b") == F.col("_bb")),
        "left",
    ).select(
        "id_a",
        "id_b",
        "cosine_q",
        "margin_ppm",
        F.col("_ba").isNotNull().alias("mutual"),
        (
            F.col("_ba").isNotNull()
            & (F.col("margin_ppm") >= F.lit(int(margin_threshold_ppm)))
        ).alias("accepted"),
    )
