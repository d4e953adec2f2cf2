"""Deterministic distributed sketches: KMV distinct-count, HLL-style
register sketch, count-min frequency sketch.

Why hand-rolled instead of ``approx_count_distinct``/DataSketches: the
built-ins are engine-private (HLL++ register layouts differ between
Spark and DuckDB), so their outputs can never be cross-checked. These
sketches derive every hash from ``md5_int32`` (the repo's cross-engine
hash primitive, ``functions/hashing.py:29``), which makes the full
sketch state — and therefore the estimate — bit-identical in a DuckDB
oracle. Accuracy is standard for the sketch family; determinism is the
design point.

Scale design (the reason to sketch at all at 100 TB):

- **KMV** — ``distinct`` on (group, hash) is a map-side partial agg;
  the per-group ``row_number`` window then sorts only the *deduped*
  hash set, never the raw rows — and Spark 4 compiles ``row_number()
  <= k`` to partial/final ``WindowGroupLimit``, so each partition
  forwards at most k rows per group into the shuffle (verified in the
  physical plan). Estimate = ``(k-1) / kth_min_fraction``.
- **HLL registers** — ``groupBy(group, bucket).max(rank)`` is the whole
  sketch: max is commutative/idempotent, so map-side combine reduces
  every partition to ≤ m rows per group before the shuffle. Register
  tables from different days/partitions MERGE by the same max — the
  re-aggregatable property that makes HLL the 100 TB distinct-count
  workhorse.
- **Count-min** — ``groupBy(depth, bucket).count``: the sketch is
  ``d*w`` rows total regardless of input size, so lookups join against
  a *broadcast* sketch. Counters merge by addition across shards.

Float determinism: register contributions are ``1.0 / (1 << M)`` —
exact powers of two spanning < 53 mantissa bits, so their sum is exact
(order-independent) in IEEE double on both engines; the final
``alpha * m^2 / Z`` is a correctly-rounded mul/div chain, identical
everywhere. No ``ln``/``pow`` calls whose libm rounding could differ.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ig_etl_sync_spark.functions.hashing import md5_int32

_HASH_SPACE = float(1 << 32)  # md5_int32 range is [0, 2^32)

#: HLL bias constant for m = 64 registers (Flajolet et al. 2007).
HLL_ALPHA_64 = 0.709


def _str(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


# -- KMV (k minimum values) -------------------------------------------

def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group distinct-count estimate from the k smallest hashes.

    If a group has fewer than ``k`` distinct hashes the sketch IS the
    distinct set and the exact count is returned; otherwise
    ``(k-1) * 2^32 / kth_smallest`` (the classic KMV estimator).
    Output: ``group_cols..., kmv_est (double, 4dp)``.
    """
    groups = list(group_cols)
    hashed = (
        df.select(*groups, md5_int32(_str(value_col)).alias("_h"))
        .distinct()  # partial-agg dedup before any sort
    )
    w = Window.partitionBy(*groups).orderBy("_h")
    topk = hashed.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)
    n, kth = F.count(F.lit(1)), F.max("_h")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / kth
    )
    return topk.groupBy(*groups).agg(F.round(est, 4).alias("kmv_est"))


def kmv_sql(value_col: str, table: str, k: int, group_cols: Sequence[str] = ()) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same output columns)."""
    groups = list(group_cols)
    gsel = (", ".join(groups) + ",") if groups else ""
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    part = ("PARTITION BY " + ", ".join(groups)) if groups else ""
    h = f"('0x' || substr(md5({value_col}::VARCHAR), 1, 8))::BIGINT"
    return f"""
WITH hashed AS (SELECT DISTINCT {gsel} {h} AS _h FROM {table}),
topk AS (
  SELECT * FROM (
    SELECT {gsel} _h,
           row_number() OVER ({part} ORDER BY _h) AS _r
    FROM hashed)
  WHERE _r <= {k})
SELECT {gsel}
       round(CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
             ELSE {float(k - 1)} * {_HASH_SPACE} / max(_h) END, 4) AS kmv_est
FROM topk {gby}
"""


# -- HLL-style register sketch ----------------------------------------

def _hll_rank(h: Column, m: int) -> Column:
    """Rank = 1 + trailing zeros of ``h div m`` (the non-bucket bits).

    ``length(bin(r & -r))`` counts the lowest-set-bit position with
    pure integer/string ops — NOT ``log2``, whose rounding differs
    between JVM (``log(x)/log(2)``) and libm and can return 2.999…
    for an exact power of two. ``r = 0`` (all non-bucket bits zero)
    gets the max rank, bits(2^32 / m) + 1. ``m`` must be a power of
    two so bucket/rest split is a pure shift (no float division).
    """
    if m & (m - 1):
        raise ValueError(f"m must be a power of two, got {m}")
    r = F.shiftright(h, m.bit_length() - 1)
    max_rank = (32 - m.bit_length() + 1) + 1
    return F.when(r == 0, F.lit(max_rank)).otherwise(
        F.length(F.bin(r.bitwiseAND(-r)))
    ).cast("int")


def hll_registers(
    df: DataFrame,
    value_col: str,
    m: int = 64,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """The sketch itself: per (group, bucket) max rank — ≤ m rows per
    group, mergeable across shards/days by the same ``max``."""
    groups = list(group_cols)
    hashed = df.select(*groups, md5_int32(_str(value_col)).alias("_h"))
    bucketed = hashed.select(
        *groups,
        (F.col("_h") % m).alias("_b"),
        _hll_rank(F.col("_h"), m).alias("_rank"),
    )
    return bucketed.groupBy(*groups, "_b").agg(F.max("_rank").alias("_m"))


def _lc_table(m: int) -> list[float]:
    """Linear-counting estimates ``m * ln(m / V)`` for every possible
    empty-register count ``V ∈ [1, m]``, computed ONCE in Python at
    plan time and injected as identical literals into both engines.

    This sidesteps the only cross-engine hazard of the small-range
    correction: ``ln``'s last-ulp rounding is not guaranteed identical
    between the JVM and libm. ``V`` is an integer with just ``m``
    possible values, so the whole ``ln`` surface collapses to an
    ``m``-entry lookup — the same plan-time-literal trick the repo
    uses for minhash coefficients and hyperplane weights."""
    import math

    return [round(m * math.log(m / v), 4) for v in range(1, m + 1)]


def hll_estimate(
    registers: DataFrame,
    m: int = 64,
    group_cols: Sequence[str] = (),
    alpha: float = HLL_ALPHA_64,
    corrected: bool = False,
) -> DataFrame:
    """HLL estimate ``alpha * m^2 / Z`` from a register table.

    ``Z = sum(2^-M_j)`` with empty registers contributing ``2^0 = 1``.
    With ``corrected=True`` the standard small-range fix applies: when
    the raw estimate is ≤ 2.5·m and some registers are empty, switch
    to linear counting ``m·ln(m/V)`` (V = empty registers) — the
    regime where the raw estimator's bias is worst. The ``ln`` values
    come from the plan-time table in :func:`_lc_table`, so the result
    stays bit-identical to the DuckDB oracle.
    Output: ``group_cols..., hll_est (4dp), hll_buckets``.
    """
    groups = list(group_cols)
    z_present = F.sum(F.lit(1.0) / F.expr("shiftleft(1L, _m)"))
    n_b = F.count(F.lit(1))
    z = z_present + (F.lit(m) - n_b).cast("double")
    raw = F.lit(alpha * m * m) / z
    est = F.round(raw, 4)
    if corrected:
        # element_at is 1-based and _lc_table[0] holds V=1, so index by
        # v_empty directly; the v_empty > 0 guard keeps index 0 out.
        v_empty = (F.lit(m) - n_b).cast("int")
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (v_empty > 0),
            F.element_at(F.array(*[F.lit(x) for x in _lc_table(m)]), v_empty),
        ).otherwise(est)
    return registers.groupBy(*groups).agg(
        est.alias("hll_est"),
        n_b.alias("hll_buckets"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    m: int = 64,
    group_cols: Sequence[str] = (),
    corrected: bool = False,
) -> DataFrame:
    """Convenience: registers + estimate in one call."""
    return hll_estimate(
        hll_registers(df, value_col, m, group_cols), m, group_cols,
        corrected=corrected,
    )


def hll_rollup(
    df: DataFrame,
    value_col: str,
    hierarchy: Sequence[str],
    m: int = 64,
    corrected: bool = False,
) -> DataFrame:
    """Distinct-count estimates at EVERY prefix level of a hierarchy
    from ONE raw scan — the mergeability of the register sketch made
    visible: leaf registers (finest grouping) are max-merged upward,
    never re-reading the data.

    ``hierarchy`` is coarsest→finest (e.g. ``["r_name", "n_name"]``);
    output has one row per group per prefix level plus the grand total:
    ``(lvl INT, <hierarchy cols, NULL above the level>, hll_est,
    hll_buckets)``.

    Scale: the raw table is scanned once into ≤ ``groups×m`` register
    rows (partial-agg map-side max); every coarser level aggregates
    THAT — at 100 TB the rollup costs one scan + kilobyte-scale merges,
    where a per-level exact ``count(distinct)`` would be one full
    shuffle per level. The leaf frame is ``localCheckpoint``-pinned
    because every level re-reads it (diamond rule)."""
    cols = list(hierarchy)
    if not cols:
        raise ValueError("hll_rollup: hierarchy must name >= 1 column")
    leaf = hll_registers(df, value_col, m, cols).localCheckpoint(eager=False)
    out = None
    for depth in range(len(cols), -1, -1):
        keep = cols[:depth]
        regs = (
            leaf
            if depth == len(cols)
            else leaf.groupBy(*keep, "_b").agg(F.max("_m").alias("_m"))
        )
        est = hll_estimate(regs, m, keep, corrected=corrected)
        lvl = est.select(
            F.lit(depth).alias("lvl"),
            *[
                (F.col(c) if c in keep else F.lit(None).cast("string")).alias(c)
                for c in cols
            ],
            "hll_est",
            "hll_buckets",
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out


def hll_rollup_sql(
    value_col: str,
    table: str,
    m: int,
    hierarchy: Sequence[str],
    corrected: bool = False,
) -> str:
    """DuckDB twin of :func:`hll_rollup` — same leaf-register merge
    (the leaf CTE is MATERIALIZED: every level references it)."""
    cols = list(hierarchy)
    max_rank = (32 - m.bit_length() + 1) + 1
    h = f"('0x' || substr(md5({value_col}::VARCHAR), 1, 8))::BIGINT"
    z = f"(sum(1.0 / (1::BIGINT << _m)) + ({m} - count(*)))"
    raw = f"({HLL_ALPHA_64 * m * m} / {z})"
    est = f"round({raw}, 4)"
    if corrected:
        lc_list = "[" + ", ".join(repr(x) for x in _lc_table(m)) + "]"
        est = (
            f"CASE WHEN {raw} <= {2.5 * m} AND ({m} - count(*)) > 0 "
            f"THEN ({lc_list})[({m} - count(*))::INT] ELSE {est} END"
        )
    sel = ", ".join(cols)
    leaf = f"""leaf AS MATERIALIZED (
  SELECT {sel}, _h % {m} AS _b,
         max(CASE WHEN _h // {m} = 0 THEN {max_rank}
             ELSE length(bin((_h // {m}) & -(_h // {m}))) END) AS _m
  FROM (SELECT {sel}, {h} AS _h FROM {table})
  GROUP BY {sel}, _b)"""
    levels = []
    for depth in range(len(cols), -1, -1):
        keep = cols[:depth]
        pad = ", ".join(
            (c if c in keep else f"NULL::VARCHAR AS {c}") for c in cols
        )
        src = (
            "leaf"
            if depth == len(cols)
            else (
                f"(SELECT {', '.join(keep) + ', ' if keep else ''}_b, "
                f"max(_m) AS _m FROM leaf GROUP BY "
                f"{', '.join(keep + ['_b'])})"
            )
        )
        gby = f"GROUP BY {', '.join(keep)}" if keep else ""
        levels.append(
            f"""SELECT {depth} AS lvl, {pad},
       {est} AS hll_est, count(*) AS hll_buckets
FROM {src} {gby}"""
        )
    body = "\nUNION ALL\n".join(levels)
    return f"WITH {leaf}\n{body}"


def hll_sql(
    value_col: str,
    table: str,
    m: int,
    group_cols: Sequence[str] = (),
    corrected: bool = False,
) -> str:
    """DuckDB twin of :func:`hll_distinct` (same output columns)."""
    groups = list(group_cols)
    gsel = (", ".join(groups) + ",") if groups else ""
    gby1 = "GROUP BY " + ", ".join(groups + ["_b"])
    gby2 = ("GROUP BY " + ", ".join(groups)) if groups else ""
    max_rank = (32 - m.bit_length() + 1) + 1
    h = f"('0x' || substr(md5({value_col}::VARCHAR), 1, 8))::BIGINT"
    z = f"(sum(1.0 / (1::BIGINT << _m)) + ({m} - count(*)))"
    raw = f"({HLL_ALPHA_64 * m * m} / {z})"
    est = f"round({raw}, 4)"
    if corrected:
        lc_list = "[" + ", ".join(repr(x) for x in _lc_table(m)) + "]"
        est = (
            f"CASE WHEN {raw} <= {2.5 * m} AND ({m} - count(*)) > 0 "
            f"THEN ({lc_list})[({m} - count(*))::INT] ELSE {est} END"
        )
    return f"""
WITH hashed AS (SELECT {gsel} {h} AS _h FROM {table}),
regs AS (
  SELECT {gsel} _h % {m} AS _b,
         max(CASE WHEN _h // {m} = 0 THEN {max_rank}
             ELSE length(bin((_h // {m}) & -(_h // {m}))) END) AS _m
  FROM hashed {gby1})
SELECT {gsel}
       {est} AS hll_est,
       count(*) AS hll_buckets
FROM regs {gby2}
"""


# -- count-min sketch -------------------------------------------------

def _cms_bucket(value: Column, row: int, width: int) -> Column:
    return md5_int32(F.concat(F.lit(f"cms{row}:"), value)) % width


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the ``d × w`` counter table: ``(_d, _b, c)``.

    One explode (d rows per input row) + one partial-agg count; the
    result is ≤ ``depth*width`` rows no matter the input size, and two
    sketches over disjoint shards merge by summing counters.
    """
    v = _str(value_col)
    rows = F.array(
        *[
            F.struct(F.lit(i).alias("_d"), _cms_bucket(v, i, width).alias("_b"))
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_e"))
        .select("_e._d", "_e._b")
        .groupBy("_d", "_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: min over the d counters each item maps
    to (classic CMS upper bound — never underestimates). The sketch
    side is tiny by construction, so the join is broadcast: the item
    table never shuffles."""
    v = _str(value_col)
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("_d"), _cms_bucket(v, i, width).alias("_b")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_e"),
    ).select(*items.columns, "_e._d", "_e._b")
    joined = probes.join(F.broadcast(sketch), ["_d", "_b"])
    return joined.groupBy(*items.columns).agg(F.min("c").alias("cms_est"))


# -- equi-depth histogram ---------------------------------------------

def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    buckets: int = 8,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group equi-depth (equal-count) histogram without a global
    sort.

    The naive shape — ``ntile(k)`` over a per-group total order — is a
    single-partition sort per group, the exact scale-killer pattern the
    IVF centroid fix removed. Instead: two passes, both partial-agg
    friendly. Pass 1 computes the k-1 interior boundaries with exact
    interpolated ``percentile`` (one groupBy agg); pass 2 assigns each
    row ``bucket = 1 + #{boundaries < value}`` via a HOF over the
    broadcast boundary array and counts per (group, bucket) — a plain
    hash aggregation. No row ever sorts globally.

    Boundaries are rounded 4dp in-engine BEFORE bucketing so the strict
    ``>`` comparison is cross-engine deterministic (raw interpolation
    can differ in the last ulp between engines).

    Output: ``group_cols..., bucket, cnt, lo, hi`` (lo/hi 4dp observed
    min/max). Equal-count is approximate at boundary ties: every tied
    row lands in the same bucket, which is the correct semantics for a
    histogram (the alternative — splitting ties — is order-dependent).
    """
    groups = list(group_cols)
    qs = [i / buckets for i in range(1, buckets)]
    bounds = df.groupBy(*groups).agg(
        F.expr(
            f"transform(percentile({value_col}, array({', '.join(map(str, qs))})),"
            " x -> round(x, 4))"
        ).alias("_bnds")
    )
    joined = (
        df.join(F.broadcast(bounds), groups)
        if groups
        else df.crossJoin(F.broadcast(bounds))
    )
    bucket = F.lit(1) + F.aggregate(
        F.col("_bnds"),
        F.lit(0),
        lambda acc, x: acc + F.when(F.col(value_col) > x, 1).otherwise(0),
    )
    return joined.withColumn("bucket", bucket).groupBy(*groups, "bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.min(value_col), 4).alias("lo"),
        F.round(F.max(value_col), 4).alias("hi"),
    )


def equi_depth_sql(
    value_col: str, table: str, buckets: int, group_cols: Sequence[str] = ()
) -> str:
    """DuckDB twin of :func:`equi_depth_histogram`."""
    groups = list(group_cols)
    gsel = (", ".join(groups) + ",") if groups else ""
    gby1 = ("GROUP BY " + ", ".join(groups)) if groups else ""
    join = f"JOIN bnds USING ({', '.join(groups)})" if groups else "CROSS JOIN bnds"
    gby2 = "GROUP BY " + ", ".join(groups + ["bucket"])
    qs = ", ".join(str(i / buckets) for i in range(1, buckets))
    return f"""
WITH bnds AS (
  SELECT {gsel}
         list_transform(quantile_cont({value_col}, [{qs}]),
                        x -> round(x, 4)) AS _bnds
  FROM {table} {gby1}),
assigned AS (
  SELECT {gsel} {value_col} AS v,
         1 + len(list_filter(_bnds, x -> {value_col} > x)) AS bucket
  FROM {table} {join})
SELECT {gsel} bucket, count(*)::BIGINT AS cnt,
       round(min(v), 4) AS lo, round(max(v), 4) AS hi
FROM assigned {gby2}
"""


# -- bottom-k quantile sketch -----------------------------------------

def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 256,
    group_cols: Sequence[str] = (),
    quantiles: Sequence[int] = (25, 50, 90, 99),
) -> DataFrame:
    """Per-group quantile estimates from a deterministic bottom-k row
    sample — the MERGEABLE quantile sketch the exact-percentile path
    (contract q14) is not.

    The sketch is the ``k`` rows whose ``md5(value:id)`` draw is
    smallest: a uniform row sample that is deterministic (no RNG
    state), replayable in any engine, and mergeable by construction —
    the bottom-k of a union is the bottom-k of the per-shard bottom-k
    union, so shard/day sketches combine without touching raw data
    (the KMV argument, applied to rows instead of distinct values).
    Groups with ≤ k rows return their EXACT discrete quantiles.

    Quantile q is the sample value at 1-based rank ``ceil(q·n/100)``
    (computed as ``(q·n + 99) div 100`` — pure integers), and the
    output is a SAMPLED VALUE, not an interpolation: no float
    arithmetic anywhere, so results are bit-identical cross-engine
    with no rounding contract.

    Scale: the per-group sort sees only rows surviving the
    ``row_number() <= k`` cut, which Spark compiles to partial/final
    ``WindowGroupLimit`` — each partition forwards at most k rows per
    group; the ``collect_list`` is bounded by k.

    NULL values are excluded (a NULL draws a NULL hash and has no
    place in a value ranking).
    """
    groups = list(group_cols)
    hashed = df.where(F.col(value_col).isNotNull()).select(
        *groups,
        F.col(value_col).alias("_v"),
        md5_int32(
            F.concat_ws(":", _str(value_col), _str(id_col))
        ).alias("_h"),
    )
    # _v tiebreak: 32-bit draws WILL collide at scale (~100 expected
    # collisions per 1M rows); (_h, _v) makes the rank-k cut
    # value-deterministic (equal-value ties are interchangeable).
    w = Window.partitionBy(*groups).orderBy("_h", "_v")
    samp = hashed.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)
    agged = samp.groupBy(*groups).agg(
        F.sort_array(F.collect_list("_v")).alias("arr")
    )
    return agged.select(
        *groups,
        F.size("arr").alias("sample_n"),
        *[
            F.expr(
                f"element_at(arr, CAST(({q} * size(arr) + 99) DIV 100 AS INT))"
            ).alias(f"q{q}")
            for q in quantiles
        ],
    )


def quantile_sketch_sql(
    value_col: str,
    id_col: str,
    table: str,
    k: int = 256,
    group_cols: Sequence[str] = (),
    quantiles: Sequence[int] = (25, 50, 90, 99),
) -> str:
    """DuckDB twin of :func:`quantile_sketch` (same output columns)."""
    groups = list(group_cols)
    gsel = (", ".join(groups) + ",") if groups else ""
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    part = ("PARTITION BY " + ", ".join(groups)) if groups else ""
    h = (
        f"('0x' || substr(md5({value_col}::VARCHAR || ':' || "
        f"{id_col}::VARCHAR), 1, 8))::BIGINT"
    )
    qcols = ",\n       ".join(
        f"arr[(({q} * len(arr) + 99) // 100)::INT] AS q{q}" for q in quantiles
    )
    return f"""
WITH hashed AS (
  SELECT {gsel} {value_col} AS _v, {h} AS _h
  FROM {table} WHERE {value_col} IS NOT NULL),
samp AS (
  SELECT * FROM (
    SELECT {gsel} _v, row_number() OVER ({part} ORDER BY _h, _v) AS _r
    FROM hashed)
  WHERE _r <= {k}),
agged AS (
  SELECT {gsel} list_sort(list(_v)) AS arr FROM samp {gby})
SELECT {gsel} len(arr)::INT AS sample_n,
       {qcols}
FROM agged
"""
