"""Table profiling and data-validation operators — the ANALYZE /
expectations surface of the engine: per-column statistics for planning
and monitoring, plus the referential / uniqueness checks an
incremental sync runs before trusting a source snapshot (the same
spirit as the reference's convergence self-check,
``recon.go:138-156``, extended to the data itself).

Scale design (100 TB):

- ``column_profile`` is ONE aggregation pass over the table. Exact
  ndv for k columns plans through Spark's Expand operator (k rows per
  input row into one shuffle) — exact is the oracle-checkable choice
  here; at 100 TB swap the exact ``countDistinct`` for the mergeable
  HLL registers in ``operators/sketches`` (same output schema, no
  Expand).
- ``referential_violations`` is a broadcast (or shuffle, Catalyst's
  call) LEFT ANTI join — rows, not booleans, so the report is
  actionable — followed by a partial-agg count by key.
- ``duplicate_keys`` is one groupBy + HAVING; the map-side partial
  aggregation means clean tables (the common case) shuffle one row
  per key per partition, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_profile", "referential_violations", "duplicate_keys", "mad_outliers", "psi_drift"]

#: column kinds with cross-engine-stable min/max rendering
_KINDS = ("num", "ts", "str")


def _render(col: F.Column, kind: str) -> F.Column:
    if kind == "num":
        # round IN-ENGINE before formatting (the _fmt4 rule: both
        # engines round identically; the formatter then never sees a
        # representable half value)
        return F.format_string("%.4f", F.round(col.cast("double"), 4))
    if kind == "ts":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def column_profile(df: DataFrame, specs: list[tuple[str, str]]) -> DataFrame:
    """Per-column statistics in one table pass.

    ``specs`` is ``[(column, kind)]`` with kind in ``num | ts | str``
    (controls min/max rendering so external engines reproduce the
    strings). Returns one row per column:
    ``(column, n_rows, n_non_null, n_distinct, min_str, max_str)``.
    """
    for c, kind in specs:
        if kind not in _KINDS:
            raise ValueError(f"{c}: kind {kind!r} not in {_KINDS}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (c, kind) in enumerate(specs):
        aggs += [
            F.count(F.col(c)).alias(f"_nn{i}"),
            F.countDistinct(F.col(c)).alias(f"_nd{i}"),
            _render(F.min(F.col(c)), kind).alias(f"_mn{i}"),
            _render(F.max(F.col(c)), kind).alias(f"_mx{i}"),
        ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nn{i}").alias("n_non_null"),
            F.col(f"_nd{i}").alias("n_distinct"),
            F.col(f"_mn{i}").alias("min_str"),
            F.col(f"_mx{i}").alias("max_str"),
        )
        for i, (c, _k) in enumerate(specs)
    ]
    return row.select(
        F.explode(F.array(*per_col)).alias("_p")
    ).select("_p.*")


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str | None = None,
) -> DataFrame:
    """Child rows whose ``fk`` has no match in ``parent.pk`` — the
    orphan report a keyed sink would otherwise discover as silent
    row loss (the engine's edge sink validates endpoints the same
    way, ``graph.py`` S5). Returns ``(fk, n_orphans)`` per violating
    key, largest first.

    NULL ``fk`` rows are a *missing value*, not an orphan, and are
    excluded up front — this pins the semantics that ``left_anti``
    (NULL never matches → reported) and SQL ``NOT IN`` (NULL fk
    dropped; any NULL pk empties the result) disagree on. The oracle
    twin uses ``NOT EXISTS`` + ``fk IS NOT NULL`` to match exactly."""
    pk = pk or fk
    orphans = child.where(F.col(fk).isNotNull()).join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    return (
        orphans.groupBy(fk)
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .orderBy(F.col("n_orphans").desc(), F.col(fk).asc())
    )


def duplicate_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key tuples appearing more than once — the uniqueness
    expectation. Returns ``(cols..., n_rows)`` per violating tuple."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 3.5,
    round_dp: int = 4,
) -> DataFrame:
    """Robust per-group outlier flags via the modified z-score
    (Iglewicz-Hoaglin): ``0.6745 * (x - median) / MAD``. Median-based,
    so a few wild rows can't drag the threshold the way mean/stddev
    z-scores do — the standard monitoring check for a metric column.

    Returns the input rows plus ``mod_z`` (rounded ``round_dp``, so
    threshold compares replay in any engine) and ``is_outlier``.
    Degenerate groups (MAD = 0: over half the values identical) yield
    NULL ``mod_z`` and false ``is_outlier`` rather than ±inf.

    Scale: two grouped EXACT-percentile aggregations (median, then MAD)
    joined back by group key — group stat tables are tiny and
    broadcast. Exact interpolated percentile matches DuckDB
    ``quantile_cont`` bit-for-bit (the q14 parity result); at 100 TB
    swap in ``approx_percentile`` per group if exactness stops
    mattering before cost does.
    """
    gcols = group_cols or []
    gb = df.groupBy(*gcols) if gcols else df.groupBy()
    med = gb.agg(F.expr(f"percentile({value_col}, 0.5)").alias("_med"))
    with_med = (
        df.join(F.broadcast(med), gcols) if gcols else df.crossJoin(F.broadcast(med))
    )
    dev = with_med.withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("_med"))
    )
    gb2 = dev.groupBy(*gcols) if gcols else dev.groupBy()
    mad = gb2.agg(F.expr("percentile(_absdev, 0.5)").alias("_mad"))
    scored = (
        dev.join(F.broadcast(mad), gcols) if gcols else dev.crossJoin(F.broadcast(mad))
    )
    mod_z = F.when(
        F.col("_mad") > 0,
        F.round(
            F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad"),
            round_dp,
        ),
    )
    return (
        scored.withColumn("mod_z", mod_z)
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("mod_z")) > threshold, F.lit(False)),
        )
        .drop("_med", "_mad", "_absdev")
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bins: int = 10,
    eps: float = 1e-6,
    round_dp: int = 6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    sample of a metric: per-bin ``(p - q) * ln(p / q)`` over
    equal-width bins derived from the REFERENCE min/max (industry
    drift monitor; rule of thumb: total PSI > 0.2 = shifted).

    Returns one row per bin: ``(bin_id, p_ref, q_cur, contrib)``, all
    rounded ``round_dp`` — total PSI is their sum. Out-of-range
    current values clamp into the edge bins (drift beyond the
    reference range must count, not vanish); empty bins are
    ``eps``-smoothed so the log stays finite.

    Scale: the bin spec is a one-row broadcast aggregate of the
    reference; each side then bins with a map-side partial count —
    two scans, two tiny shuffles, no sort.
    """
    if bins < 2:
        raise ValueError(f"bins={bins} < 2")
    spec = ref.agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor(
                    (F.col(value_col) - F.col("_mn"))
                    * bins
                    / (F.col("_mx") - F.col("_mn"))
                ),
                F.lit(0),
            ),
            F.lit(bins - 1),
        )
        return (
            df.crossJoin(F.broadcast(spec))
            .select(b.cast("long").alias("bin_id"))
            .groupBy("bin_id")
            .agg(F.count(F.lit(1)).alias(out))
        )

    p = binned(ref, "_np")
    q = binned(cur, "_nq")
    all_bins = ref.sparkSession.range(bins).select(
        F.col("id").alias("bin_id")
    )
    joined = (
        all_bins.join(p, "bin_id", "left_outer")
        .join(q, "bin_id", "left_outer")
        .select(
            "bin_id",
            F.coalesce(F.col("_np"), F.lit(0)).alias("_np"),
            F.coalesce(F.col("_nq"), F.lit(0)).alias("_nq"),
        )
    )
    tot = joined.agg(
        F.sum("_np").alias("_tp"), F.sum("_nq").alias("_tq")
    )
    pq = joined.crossJoin(F.broadcast(tot)).select(
        "bin_id",
        (F.col("_np") / F.col("_tp") + F.lit(eps)).alias("_p"),
        (F.col("_nq") / F.col("_tq") + F.lit(eps)).alias("_q"),
    )
    return pq.select(
        "bin_id",
        F.round("_p", round_dp).alias("p_ref"),
        F.round("_q", round_dp).alias("q_cur"),
        F.round(
            (F.col("_p") - F.col("_q")) * F.log(F.col("_p") / F.col("_q")),
            round_dp,
        ).alias("contrib"),
    ).orderBy("bin_id")


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    window_rows: int = 10,
    quant_dp: int = 2,
) -> DataFrame:
    """Deterministic rolling z-score anomaly signal: each row's value
    against the mean/stddev of its trailing ``window_rows`` rows
    (inclusive) per key.

    A naive ``(x - avg) / stddev`` window is NOT cross-engine stable —
    engines disagree in the last ulps of Welford vs two-pass variance
    and rounding can flip at half boundaries (the repo's round() rule).
    Here values are quantized to ``10^quant_dp`` units ONCE, the
    rolling sums S=Σx, Q=Σx² and count n are EXACT BIGINTs, and every
    float op afterwards consumes identical integers:

        z = (n·x − S) / (n · sqrt((n·Q − S²) / (n·(n−1))))

    — one division of identical ints, one IEEE sqrt (correctly rounded
    everywhere), two exact mults/divides: bit-identical in any engine.
    Rows with n < 2 or zero variance emit NULL z.

    Overflow bound: |x| ≤ 10^(quant_dp)·max|value|; Q ≤ n·x² must fit
    BIGINT — at quant_dp=2 and values ≤ 10^7 that is n·10^18/10^4,
    safe for any practical window.

    Scale: a single keyed window shuffle; the two running sums share
    one frame (one sort, one pass).
    """
    scale = 10**quant_dp
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    x = F.floor(F.col(value_col) * scale).cast("long")
    base = df.select(
        F.col(key_col),
        F.col(tiebreak_col),
        x.alias("_x"),
        F.col(ts_col),
    )
    rolled = base.select(
        key_col,
        tiebreak_col,
        "_x",
        F.sum("_x").over(w).alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).over(w).alias("_q"),
        F.count(F.lit(1)).over(w).alias("_n"),
    )
    var_num = F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")
    dev = F.col("_n") * F.col("_x") - F.col("_s")
    denom = F.col("_n").cast("double") * F.sqrt(
        var_num.cast("double")
        / (F.col("_n") * (F.col("_n") - 1)).cast("double")
    )
    # deliberately UNROUNDED: every input to the float pipeline is an
    # identical BIGINT on both engines, so the double itself is
    # bit-identical — while round(double, n) is the one op the engines
    # disagree on (repo invariant). Raw is the safer contract here.
    z = F.when(
        (F.col("_n") >= 2) & (var_num > 0),
        dev.cast("double") / denom,
    )
    return rolled.select(key_col, tiebreak_col, z.alias("z"))


def categorical_drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    cat_col: str,
    top_m: int = 50,
    eps: float = 1e-6,
    round_dp: int = 6,
    other_label: str = "__other__",
) -> DataFrame:
    """PSI drift over a CATEGORICAL column — the vocabulary/segment
    twin of :func:`psi_drift`: bins are the reference's ``top_m``
    categories (count DESC, category ASC tiebreak) plus one ``other``
    bucket that absorbs the tail AND any category the reference never
    saw (new-token drift must count, not vanish — the clamp-to-edge
    rule in categorical form).

    Returns one row per bucket: ``(category, p_ref, q_cur, contrib)``,
    all rounded ``round_dp``; total PSI is the contrib sum.

    Scale: the bucket spec is a ``top_m``-row broadcast (partial-agg
    top-k, TakeOrdered); each side then counts with one map-side
    partial aggregation — two scans, two bucket-sized shuffles. Use an
    exploded token frame as ``ref``/``cur`` for vocabulary drift, or
    any dimension column (source, lang, event_type) directly.
    """
    if top_m < 1:
        raise ValueError(f"top_m={top_m} < 1")
    topc = (
        ref.groupBy(cat_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.desc("_c"), F.col(cat_col))
        .limit(top_m)
        .select(F.col(cat_col).alias("_k"), F.lit(True).alias("_keep"))
        .localCheckpoint(eager=False)  # feeds both sides + the bucket list
    )

    def bucketed(df: DataFrame, out: str) -> DataFrame:
        return (
            df.join(
                F.broadcast(topc), df[cat_col] == F.col("_k"), "left_outer"
            )
            .select(
                F.when(F.col("_keep"), F.col("_k"))
                .otherwise(F.lit(other_label))
                .alias("category")
            )
            .groupBy("category")
            .agg(F.count(F.lit(1)).alias(out))
        )

    buckets = topc.select(F.col("_k").alias("category")).unionByName(
        ref.sparkSession.range(1).select(F.lit(other_label).alias("category"))
    )
    p = bucketed(ref, "_np")
    q = bucketed(cur, "_nq")
    joined = (
        buckets.join(p, "category", "left_outer")
        .join(q, "category", "left_outer")
        .select(
            "category",
            F.coalesce(F.col("_np"), F.lit(0)).alias("_np"),
            F.coalesce(F.col("_nq"), F.lit(0)).alias("_nq"),
        )
    )
    tot = joined.agg(F.sum("_np").alias("_tp"), F.sum("_nq").alias("_tq"))
    pq = joined.crossJoin(F.broadcast(tot)).select(
        "category",
        (F.col("_np") / F.col("_tp") + F.lit(eps)).alias("_p"),
        (F.col("_nq") / F.col("_tq") + F.lit(eps)).alias("_q"),
    )
    return pq.select(
        "category",
        F.round("_p", round_dp).alias("p_ref"),
        F.round("_q", round_dp).alias("q_cur"),
        F.round(
            (F.col("_p") - F.col("_q")) * F.log(F.col("_p") / F.col("_q")),
            round_dp,
        ).alias("contrib"),
    ).orderBy("category")


def label_centroid_outliers(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    top_n: int = 20,
) -> DataFrame:
    """X84: label-noise screen — per label, the ``top_n`` vectors
    FARTHEST from their own label's centroid (the classic
    mislabel-suspect shortlist: a cat embedded among dogs sits far from
    the cat centroid). Everything integer-exact so the oracle replays
    bit-for-bit:

    - vectors quantize via the k-means contract
      (``floor((x + 2) * 1e6)``, strictly positive BIGINTs);
    - per-(label, dim) centroid = floor mean (``sum div n`` — exact
      because quantized values are >= 0), one dims-bounded partial-agg
      shuffle (|labels| x dims rows), assembled into an ordered array
      and BROADCAST back;
    - distance = integer squared L2 (bounded: (4e6)^2 x 64 < 2^60);
    - per-label rank window on (dist2 DESC, id ASC).

    Returns ``(id_col, label_col, dist2 BIGINT, rank BIGINT)``. Scale:
    one corpus scan for the centroid partial-agg, one map-side
    broadcast join for distances, and the rank window partitions per
    label (WindowGroupLimit caps each partition's buffer at ``top_n``).
    """
    from pyspark.sql import Window

    from ig_etl_sync_spark.operators.kmeans import quantize_embeddings

    if top_n < 1:
        raise ValueError(f"top_n={top_n} must be >= 1")
    q = quantize_embeddings(embeddings, vec_col, "qv").select(
        id_col, label_col, "qv"
    )
    # q feeds the centroid agg AND the distance join — diamond rule.
    q = q.localCheckpoint(eager=False)
    cents = (
        q.select(label_col, F.posexplode("qv").alias("d", "x"))
        .groupBy(label_col, "d")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(label_col, "d", F.expr("s div n").alias("m"))
        .groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "m"))),
                lambda x: x["m"],
            ).alias("cv")
        )
    )
    dist2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy(label_col).orderBy(
        F.col("dist2").desc(), F.col(id_col).asc()
    )
    return (
        q.join(F.broadcast(cents), label_col)
        .select(id_col, label_col, dist2.alias("dist2"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
    )


def source_overlap_matrix(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    shingle_k: int = 5,
    max_groups_per_shingle: int | None = None,
) -> DataFrame:
    """X85: cross-source contamination matrix — exact pairwise Jaccard
    between the distinct-shingle SETS of every pair of sources that
    share at least one shingle. The corpus-level twin of the per-doc
    near-dup operators: before mixing corpora (or weighting them,
    ``dataprep.mixture_rates``), a pipeline wants to know how much two
    sources overlap AS SETS (a crawl re-listing a mirror, a benchmark
    leaking into a scrape), not just which individual docs collide.

    Pipeline: distinct ``(group, shingle)`` pairs → self-join on the
    shingle key (``group_a < group_b``) → per-pair intersection counts
    joined to per-group set sizes → exact integer Jaccard in ppm
    (``|∩| * 1e6 div (|A| + |B| - |∩|)`` — the cross-multiplied-integer
    rule; float division is not cross-engine stable).

    Scale: the shingle self-join fans out quadratically ONLY in the
    number of sources sharing one shingle, never in docs. For web-scale
    source counts (1e5+ domains) a universal shingle ("click here to")
    would still explode — ``max_groups_per_shingle`` drops shingles
    present in more than that many sources first (the standard
    stop-shingle/df-cap; biases Jaccard DOWN by discarding mass every
    surviving pair shares, so it is a contamination LOWER bound).
    Pairs with an empty intersection are not emitted (an all-pairs
    zero-filled matrix would be |sources|² rows regardless of data).

    Returns ``(group_a, group_b, n_shared, n_a, n_b, jaccard_ppm)``.
    """
    from ig_etl_sync_spark.operators.textops import word_shingles

    gs = (
        docs.select(
            F.col(group_col).alias("_g"),
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), shingle_k))
            ).alias("_sh"),
        )
        .distinct()
    )
    if max_groups_per_shingle is not None:
        if max_groups_per_shingle < 2:
            raise ValueError(
                f"max_groups_per_shingle={max_groups_per_shingle} must be >= 2"
            )
        keep = (
            gs.groupBy("_sh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_groups_per_shingle)
            .select("_sh")
        )
        gs = gs.join(keep, "_sh", "left_semi")
    # feeds the per-group sizes, and BOTH sides of the pair join —
    # diamond rule (the distinct's exchange is not reused across
    # differently-aliased branches).
    gs = gs.localCheckpoint(eager=False)
    sizes = gs.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    a = gs.select(F.col("_g").alias("group_a"), "_sh")
    b = gs.select(F.col("_g").alias("group_b"), "_sh")
    inter = (
        a.join(b, "_sh")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("_g").alias("group_a"),
                                     F.col("_n").alias("n_a"))),
            "group_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("_g").alias("group_b"),
                                     F.col("_n").alias("n_b"))),
            "group_b",
        )
        .select(
            "group_a",
            "group_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("n_shared * 1000000 div (n_a + n_b - n_shared)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )


def threshold_sweep(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[int],
) -> DataFrame:
    """X91: exact binary-classification operating curve — confusion
    counts and precision/recall/F1 (ppm) at every threshold in a fixed
    grid, predicting positive when ``score_col >= t``. The calibration
    harness a pipeline runs before replacing an expensive gate with a
    cheap score (e.g. "which surprisal cutoff reproduces the Gopher
    rule-pack verdict, and at what precision?").

    Shape: one (score, n, n_pos) value-distribution agg, the threshold
    grid EXPLODED onto it as a literal array (projection + filter — no
    theta join, no BroadcastNestedLoopJoin), one groupBy(threshold),
    and a one-row totals agg broadcast by the scalar-join idiom.
    Grid thresholds nothing reaches still emit a row (tp = 0). All
    ratios are exact integer ppm.

    ``label_col``: boolean or 0/1. Returns ``(threshold, tp, fp, fn,
    tn, precision_ppm, recall_ppm, f1_ppm)``.
    """
    if not thresholds:
        raise ValueError("threshold_sweep: empty threshold grid")
    grid_lit = F.lit([int(t) for t in thresholds]).cast("array<bigint>")
    lab = F.col(label_col).cast("long")
    vc = scored.groupBy(score_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(lab).cast("long").alias("_npos"),
    )
    # Totals derive from vc, not from `scored` directly: both consumers
    # then share vc's shuffle (identical subplan -> ReusedExchange), so
    # the full scoring chain over the corpus is evaluated once instead
    # of once per diamond branch.
    tot = vc.agg(
        F.sum("_n").cast("long").alias("_N"),
        F.sum("_npos").cast("long").alias("_P"),
    )
    cnt = (
        vc.select(
            F.explode(grid_lit).alias("threshold"), score_col, "_n", "_npos"
        )
        .where(F.col(score_col) >= F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.sum("_n").cast("long").alias("_ppred"),
            F.sum("_npos").cast("long").alias("_tp"),
        )
    )
    grid = tot.select(
        F.explode(grid_lit).alias("threshold"), "_N", "_P"
    )
    out = (
        grid.join(cnt, "threshold", "left")
        .select(
            "threshold",
            F.coalesce(F.col("_tp"), F.lit(0).cast("long")).alias("tp"),
            (
                F.coalesce(F.col("_ppred"), F.lit(0).cast("long"))
                - F.coalesce(F.col("_tp"), F.lit(0).cast("long"))
            ).alias("fp"),
            (F.col("_P") - F.coalesce(F.col("_tp"), F.lit(0).cast("long")))
            .alias("fn"),
            (
                F.col("_N")
                - F.coalesce(F.col("_ppred"), F.lit(0).cast("long"))
                - F.col("_P")
                + F.coalesce(F.col("_tp"), F.lit(0).cast("long"))
            ).alias("tn"),
        )
    )
    return out.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("tp * 1000000 div (tp + fp)").cast("long"))
        .alias("precision_ppm"),
        F.when(F.col("tp") + F.col("fn") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("tp * 1000000 div (tp + fn)").cast("long"))
        .alias("recall_ppm"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") == 0,
            F.lit(0).cast("long"),
        )
        .otherwise(
            F.expr("2 * tp * 1000000 div (2 * tp + fp + fn)").cast("long")
        )
        .alias("f1_ppm"),
    )


def source_overlap_sketch(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    shingle_k: int = 5,
    m: int = 64,
) -> DataFrame:
    """X103: the sketch-route scale twin of X85
    (:func:`source_overlap_matrix`): pairwise source-overlap estimates
    from HLL registers instead of the exact (group, shingle) self-join.
    One HLL register table per source over its shingle stream —
    registers are max-reduced, so the DISTINCT pass X85 needs is free
    here and duplicate shingles change nothing — then per-pair UNION
    registers (per-bucket max, the standard HLL merge), and
    inclusion-exclusion ``|A∩B| ≈ est(A) + est(B) − est(A∪B)``.

    The estimates are deterministic (md5-hashed ranks, plan-time
    linear-counting table — the repo's X13 HLL), so the whole estimate
    relation replays bit-for-bit in SQL: every arithmetic step after
    the rounded per-set estimates is one fixed IEEE expression
    (``round(ea + eb − eu, 4)``, ``floor(inter · 1e6 / eu)``) on
    identical doubles.

    Returns one row per source pair (all pairs — |sources|² is tiny by
    definition)::

        (group_a, group_b, est_a DOUBLE, est_b DOUBLE,
         est_union DOUBLE, inter_est DOUBLE, jaccard_est_ppm BIGINT)

    with ``inter_est`` clamped at 0 (inclusion-exclusion of estimates
    can go slightly negative on disjoint sets).

    Scale: ONE corpus scan feeds the register partial-agg (map-side
    max); everything after is ``sources × m`` register rows —
    kilobytes at any corpus size, mergeable across shards/days by the
    same per-bucket max, where X85's exact join pays a
    (group, shingle)-relation shuffle and a hot-shingle quadratic
    fan-out. The trade is ±~13% standard HLL error at m=64 (grow m
    for tighter estimates); X85 stays the exact audit.
    """
    from ig_etl_sync_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from ig_etl_sync_spark.operators.textops import word_shingles

    sh = docs.select(
        F.col(group_col).alias("_g"),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("_sh"),
    )
    # per-group register table: feeds the per-group estimates AND both
    # sides of the pair-union fan-out (diamond rule); sources × m rows
    regs = hll_registers(sh, "_sh", m, ["_g"]).localCheckpoint(eager=False)
    est_g = hll_estimate(regs, m, ["_g"], corrected=True).select(
        F.col("_g"), F.col("hll_est")
    )
    groups = regs.select("_g").distinct()
    gp = (
        groups.select(F.col("_g").alias("group_a"))
        .crossJoin(groups.select(F.col("_g").alias("group_b")))
        .where(F.col("group_a") < F.col("group_b"))
    )
    pr = (
        gp.join(regs.withColumnRenamed("_g", "group_a"), "group_a")
        .select("group_a", "group_b", "_b", "_m")
        .unionByName(
            gp.join(regs.withColumnRenamed("_g", "group_b"), "group_b")
            .select("group_a", "group_b", "_b", "_m")
        )
        .groupBy("group_a", "group_b", "_b")
        .agg(F.max("_m").alias("_m"))
    )
    est_u = hll_estimate(
        pr, m, ["group_a", "group_b"], corrected=True
    ).select("group_a", "group_b", F.col("hll_est").alias("est_union"))
    inter = F.greatest(
        F.lit(0.0),
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4),
    )
    return (
        est_u.join(
            est_g.select(
                F.col("_g").alias("group_a"), F.col("hll_est").alias("est_a")
            ),
            "group_a",
        )
        .join(
            est_g.select(
                F.col("_g").alias("group_b"), F.col("hll_est").alias("est_b")
            ),
            "group_b",
        )
        .select(
            "group_a",
            "group_b",
            "est_a",
            "est_b",
            "est_union",
            inter.alias("inter_est"),
            F.floor(inter * F.lit(1_000_000.0) / F.col("est_union"))
            .cast("long")
            .alias("jaccard_est_ppm"),
        )
    )


def quality_filter_funnel(
    flags: DataFrame,
    rules: list[str],
    *,
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """X108: per-rule attribution for a gate cascade — the question a
    curation pipeline answers before it tightens or reorders filters:
    WHICH rule is costing the data, and would dropping it matter?

    ``flags`` is a per-document frame with one BOOLEAN column per rule
    (true = the rule REMOVES the doc) plus an optional integer
    ``weight_col`` (token count: attribution by data mass, not doc
    count). ``rules`` fixes the cascade ORDER — marginal counts are
    order-dependent by definition (a doc removed by rule 2 in the
    funnel was not removed by rule 1 first), while flagged/unique
    counts are order-free.

    Per rule, exact BIGINT counts over one pass:

    - ``n_flagged``   — docs the rule flags, regardless of the others;
    - ``n_unique``    — docs ONLY this rule flags (drop this rule and
      exactly these docs survive the whole cascade);
    - ``n_marginal``  — docs whose FIRST flagging rule in cascade
      order is this one (the funnel step's visible removal);
    - ``n_tokens_flagged`` — weight mass under ``n_flagged`` (0 when
      no ``weight_col``);
    - ``n_remaining_after`` — docs surviving rules 1..ord (total minus
      cumulative marginals; the last row is the cascade's output
      size).

    Scale: per-doc derived ints (flag sum + first-flag ordinal) in one
    projection, posexplode over the |rules|-wide literal struct array
    (cheap ints — nothing expensive is co-projected with its explode),
    ONE partial-aggregated groupBy on the |rules|-row result, and the
    cumulative window runs on |rules| rows. No self-join, no second
    corpus pass; doc count and weight totals ride the same aggregation
    via a broadcast one-row frame.
    """
    if not rules:
        raise ValueError("rules must name at least one flag column")
    missing = [r for r in rules if r not in flags.columns]
    if missing:
        raise ValueError(f"flag columns missing from frame: {missing}")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(0).cast("long")
    )
    fcols = [F.coalesce(F.col(r).cast("boolean"), F.lit(False)) for r in rules]
    nflags = sum(f.cast("int") for f in fcols)
    # first flagging rule's ordinal (1-based); 0 = survives the cascade
    first_ord = F.lit(0)
    for i in range(len(rules) - 1, -1, -1):
        first_ord = F.when(fcols[i], F.lit(i + 1)).otherwise(first_ord)
    per_doc = flags.select(
        w.alias("_w"),
        nflags.alias("_nf"),
        first_ord.alias("_fo"),
        F.array(
            *[
                F.struct(
                    F.lit(i + 1).alias("ord"),
                    F.lit(r).alias("rule"),
                    fcols[i].alias("flag"),
                )
                for i, r in enumerate(rules)
            ]
        ).alias("_rules"),
    )
    totals = flags.agg(F.count(F.lit(1)).cast("long").alias("_total"))
    per_rule = (
        per_doc.select("_w", "_nf", "_fo", F.explode("_rules").alias("_r"))
        .groupBy(
            F.col("_r.ord").cast("long").alias("ord"),
            F.col("_r.rule").alias("rule"),
        )
        .agg(
            F.sum(F.col("_r.flag").cast("long")).cast("long").alias(
                "n_flagged"
            ),
            F.sum(
                (F.col("_r.flag") & (F.col("_nf") == 1)).cast("long")
            )
            .cast("long")
            .alias("n_unique"),
            F.sum((F.col("_fo") == F.col("_r.ord")).cast("long"))
            .cast("long")
            .alias("n_marginal"),
            F.sum(
                F.when(F.col("_r.flag"), F.col("_w")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_tokens_flagged"),
        )
    )
    from pyspark.sql import Window

    wcum = Window.orderBy("ord").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_rule.crossJoin(F.broadcast(totals))
        .withColumn(
            "n_remaining_after",
            (F.col("_total") - F.sum("n_marginal").over(wcum)).cast("long"),
        )
        .select(
            "ord",
            "rule",
            "n_flagged",
            "n_unique",
            "n_marginal",
            "n_tokens_flagged",
            "n_remaining_after",
        )
    )
