"""Temporal joins Spark lacks natively: as-of (point-in-time) join and
bounded range join — expressed as compositions of built-in operators
(SURVEY custom-operator rule (a): composition before UDFs).

**As-of join** (``l`` matched to the LATEST ``r`` row with
``r.ts <= l.ts`` per key): implemented with the union trick — tag both
sides into one frame, sort within key by (ts, side), and carry the last
right-side payload forward with ``last(..., ignorenulls=True)``. ONE
shuffle on the key, no per-row subquery, no skew beyond the key's own —
the textbook distributed as-of shape. (A naive join + row_number over
all ≤-pairs is O(left × right-per-key); this is O(n log n) per key.)

**Range join** (``r.ts`` within ``[l.ts + lower, l.ts + upper]``):
implemented with time-bucket blocking — both sides bucket to
``ceil(span)``-sized bins, left explodes to the 2-3 candidate bins its
window overlaps, equi-join on (key, bin), then exact filter. Turns an
inequality join (cartesian per key) into an equi-join whose fan-out is
bounded by rows-per-bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row sharing key
    ``on``: with ``direction="backward"`` (default) the LATEST right
    row with ``right.ts <= left.ts``; with ``direction="forward"`` the
    EARLIEST right row with ``right.ts >= left.ts`` (both inclusive —
    DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` / ``l.ts <= r.ts``).
    Left rows with no match keep NULL right columns (left-join
    semantics). Right payload columns get ``suffix``.

    Forward is the same union-trick plan with the sort reversed: in
    ``(_t DESC, _side ASC)`` order every right row in a left row's
    prefix has ``ts >= left.ts``, and the ``last(ignorenulls)`` carry
    holds the nearest (minimum) such timestamp — still ONE shuffle on
    the key.

    Right rows with a NULL timestamp are dropped (SQL as-of semantics:
    ``NULL <= t`` is never true), and duplicate (key, ts) right rows
    collapse deterministically to the max-by-payload row — without this
    the window carry is order-nondeterministic under retries.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    r_payload = [c for c in right.columns if c not in (on, right_ts)]

    # The union trick needs internal tags (_k, _t, _side, _f_*) and the
    # suffixed right-payload names to be FREE in the left frame — a
    # collision would silently produce duplicate/ambiguous columns in
    # the final select. Fail loudly instead.
    reserved = {"_k", "_t", "_side"}
    reserved |= {f"{c}{suffix}" for c in [*r_payload, right_ts]}
    reserved |= {f"_f_{c}" for c in [*r_payload, right_ts]}
    clashes = sorted(reserved & set(left.columns))
    if clashes:
        raise ValueError(
            f"as_of_join: left columns {clashes} collide with internal or "
            f"suffixed output names; rename them or pass a different "
            f"suffix (current suffix={suffix!r})"
        )
    r_clashes = sorted({"_k", "_t", "_side"} & set(right.columns))
    if r_clashes:
        raise ValueError(
            f"as_of_join: right columns {r_clashes} collide with internal "
            "tag names; rename them before joining"
        )

    right = right.where(F.col(right_ts).isNotNull())
    if r_payload:
        dw = Window.partitionBy(on, right_ts).orderBy(
            *[F.col(c).desc_nulls_last() for c in r_payload]
        )
        right = (
            right.withColumn("_rn", F.row_number().over(dw))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        right = right.dropDuplicates([on, right_ts])

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in r_payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{right_ts}{suffix}"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
        *[F.col(c).alias(f"{c}{suffix}") for c in r_payload],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    unioned = l_tag.unionByName(r_tag)

    # Right rows sort BEFORE left rows at equal ts (side 0 < 1) → the
    # inclusive semantics in either direction; last(ignorenulls)
    # carries the nearest right payload to each left row.
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in [*r_payload, right_ts]
        ],
    )
    out_cols = (
        [F.col("_k").alias(on)]
        + [F.col(c) for c in left.columns if c != on]
        + [F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in [*r_payload, right_ts]]
    )
    return carried.where(F.col("_side") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower_sec: int,
    upper_sec: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """Pairs where ``left.ts + lower <= right.ts <= left.ts + upper``
    sharing key ``on`` (inner). Bucketed equi-join, exact filter."""
    if upper_sec < lower_sec:
        raise ValueError(f"upper_sec={upper_sec} < lower_sec={lower_sec}")
    # Microsecond arithmetic: both Spark and DuckDB hold these
    # timestamps at µs precision — second-granularity casts would
    # include/exclude boundary rows differently.
    lower_us = lower_sec * 1_000_000
    upper_us = upper_sec * 1_000_000
    span = max(upper_us - lower_us, 1)

    # Bin id = floor(µs / span). F.floor, NOT .cast("long"): the cast
    # truncates toward zero, so pre-1970 (negative-µs) timestamps would
    # collapse bins -0.x and +0.x together and misalign every negative
    # bin by one. floor is monotonic under the same double division on
    # both sides, so a right row's bin always lands inside the left
    # row's candidate range. (Double division is exact to 2^53 µs ≈
    # year 2255.)
    r_cols = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in r_cols],
    ).withColumn(
        "_bin", F.floor(F.unix_micros(F.col(f"{right_ts}{suffix}")) / span)
    )

    # Left's window [t+lower, t+upper] spans at most 2 consecutive bins
    # (3 with boundary slack) — explode candidates.
    lo = F.unix_micros(F.col(left_ts)) + lower_us
    hi = F.unix_micros(F.col(left_ts)) + upper_us
    l = left.withColumn(
        "_bins",
        F.array_distinct(
            F.array(
                F.floor(lo / span),
                F.floor(lo / span) + 1,
                F.floor(hi / span),
            )
        ),
    ).withColumn("_bin", F.explode("_bins")).drop("_bins")

    joined = l.join(r, [on, "_bin"])
    rts = F.unix_micros(F.col(f"{right_ts}{suffix}"))
    cond = (rts >= F.unix_micros(F.col(left_ts)) + lower_us) & (
        rts <= F.unix_micros(F.col(left_ts)) + upper_us
    )
    # No dedup needed or wanted: left bins are array_distinct and each
    # right row has exactly one bin, so a (left, right) pair joins at
    # most once — and a dedup keyed on payload would DROP legitimate
    # pairs when distinct rows share (key, ts, payload-subset).
    return joined.where(cond).drop("_bin")


def time_weighted_avg(
    intervals: DataFrame,
    keys: "list[str]",
    value_col: str,
    from_col: str,
    to_col: str,
    window_start,
    window_end,
    out_col: str = "twa",
) -> DataFrame:
    """Time-weighted average of a piecewise-constant signal over
    ``[window_start, window_end)``.

    ``intervals`` carries one row per constant segment:
    ``value_col`` valid over ``[from_col, to_col)``; a NULL ``to_col``
    means still-current (clipped at ``window_end``). The weight of each
    segment is its µs overlap with the window (all arithmetic in
    ``unix_micros`` per the repo's µs invariant — never second-cast):

        twa = Σ value·overlap_µs / Σ overlap_µs

    Segments with zero overlap are filtered out BEFORE the aggregate,
    so keys entirely outside the window disappear (no 0/0 rows).

    Plan: one filter + one groupBy on the keys — a single partial-agg
    shuffle; weights are computed per-row JVM-side (whole-stage
    codegen), no window function and no per-row Python. Output:
    ``keys..., {out_col}, covered_us`` (covered_us = total weighted
    time, for coverage-aware consumers).
    """
    t0 = F.unix_micros(F.lit(window_start).cast("timestamp"))
    t1 = F.unix_micros(F.lit(window_end).cast("timestamp"))
    seg_from = F.unix_micros(F.col(from_col))
    seg_to = F.unix_micros(F.coalesce(F.col(to_col), F.lit(window_end).cast("timestamp")))
    overlap = F.least(seg_to, t1) - F.greatest(seg_from, t0)
    return (
        intervals.withColumn("_w", overlap)
        .where(F.col("_w") > 0)
        .groupBy(*keys)
        .agg(
            F.round(
                F.sum(F.col(value_col) * F.col("_w")) / F.sum("_w"), 6
            ).alias(out_col),
            F.sum("_w").cast("bigint").alias("covered_us"),
        )
    )


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    step: str = "hour",
) -> DataFrame:
    """Regularize an irregular time series onto a fixed grid with
    forward fill: one row per (key, grid instant) between the key's
    first and last observation, carrying the last observed value at or
    before that instant.

    Per grid cell the representative observation is the LATEST by
    (ts, tiebreak) — a deterministic pick even when two events share a
    microsecond. Grid instants before the key's first observation
    cannot exist (the grid starts at the first observed cell), so the
    filled value is never NULL.

    Returns ``(key, grid_ts STRING 'yyyy-MM-dd HH:mm:ss',
    value_ffill DOUBLE)``. The value is COPIED, never recomputed —
    no float arithmetic, so cross-engine exact.

    Scale: the raw events collapse to one row per (key, cell) in a
    single keyed aggregation pass; everything after runs over the
    cell table (|keys| x |span cells|), not the events. The grid is
    generated distributed (per-key ``sequence`` + explode — no
    driver-side range materialization), the cells→grid join is keyed
    on (key, cell), and the forward-fill window shuffles once on the
    key. A key spanning years at second resolution would make one
    giant array per key: cap spans upstream or use a coarser step.
    """
    cell = F.date_trunc(step, F.col(ts_col))
    w_cell = Window.partitionBy("_k", "_c").orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    cells = (
        events.select(
            F.col(key_col).alias("_k"),
            cell.alias("_c"),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(value_col).alias("_v"),
        )
        .withColumn("_rn", F.row_number().over(w_cell))
        .where(F.col("_rn") == 1)
        .select("_k", "_c", "_v")
    )
    grid = (
        cells.groupBy("_k")
        .agg(F.min("_c").alias("_mn"), F.max("_c").alias("_mx"))
        .select(
            "_k",
            F.explode(
                F.sequence("_mn", "_mx", F.expr(f"interval 1 {step}"))
            ).alias("_c"),
        )
    )
    j = grid.join(cells, ["_k", "_c"], "left")
    w_fill = Window.partitionBy("_k").orderBy("_c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return j.select(
        F.col("_k").alias(key_col),
        F.date_format("_c", "yyyy-MM-dd HH:mm:ss").alias("grid_ts"),
        F.last("_v", ignorenulls=True).over(w_fill).alias("value_ffill"),
    )


def decay_weighted_avg(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    *,
    alpha: float = 0.5,
    depth: int = 8,
    quant_dp: int = 2,
) -> DataFrame:
    """Exponentially decay-weighted rolling average over the last
    ``depth`` observations per key (the bounded-window EWMA used for
    recency-weighted behavioral features) — cross-engine
    BIT-IDENTICAL by construction.

    The naive ``Σ alphaⁱ·xᵢ / Σ alphaⁱ`` accumulates engine-specific
    float error; here the decay weights are quantized ONCE in Python
    (``wᵢ = round(alphaⁱ · 2²⁰)``), values quantize to integer
    ``10^quant_dp`` units, and the weighted numerator/denominator are
    exact BIGINT sums over a FIXED number of lags — the only float op
    is the final division of identical integers. Missing lags (series
    head) contribute to neither side.

    Returns ``(key, tiebreak, dwa DOUBLE)`` where
    ``dwa = Σwᵢxᵢ / (Σwᵢ · 10^quant_dp)`` over available lags.

    Scale: one keyed window shuffle; all ``depth`` lags share one
    frame (single sort pass). ``depth`` is bounded — this is the
    fixed-memory form; for unbounded EWMA use
    ``streaming.stateful.streaming_ewma`` (same fixed-point
    discipline, two-BIGINT state per key).
    """
    wscale = 1 << 20
    vscale = 10**quant_dp
    weights = [round((alpha**i) * wscale) for i in range(depth)]
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    x = F.floor(F.col(value_col) * vscale).cast("long")
    base = events.select(
        F.col(key_col), F.col(tiebreak_col), F.col(ts_col), x.alias("_x")
    )
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for i, wi in enumerate(weights):
        xi = F.col("_x") if i == 0 else F.lag("_x", i).over(w)
        num = num + F.when(xi.isNotNull(), xi * F.lit(wi)).otherwise(F.lit(0))
        den = den + F.when(xi.isNotNull(), F.lit(wi)).otherwise(F.lit(0))
    return base.select(
        key_col,
        tiebreak_col,
        (num.cast("double") / (den * F.lit(vscale)).cast("double")).alias("dwa"),
    )


def absence_within(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
) -> DataFrame:
    """Temporal ANTI join: rows of ``left`` with NO ``right`` row for
    the same key within ``(left_ts, left_ts + window_seconds]`` — the
    absence-of-followup shape (clicks never converted, alerts never
    acknowledged, carts abandoned), the complement of the attribution
    interval join.

    All temporal comparison is µs-exact (``unix_micros``) per the repo
    invariant. Returns the ``left`` rows unchanged.

    Scale: a LEFT ANTI join with an equi key plus a range predicate —
    Spark plans sort-merge on the key with the range as a join filter,
    so both sides shuffle once on the key and nothing is quadratic.
    The window bound is what keeps the merge's per-key scan local; an
    unbounded "never afterwards" query should instead compare against
    a per-key min/max aggregate.
    """
    l_us = F.unix_micros(F.col(f"_l.{left_ts}"))
    r_us = F.unix_micros(F.col(f"_r.{right_ts}"))
    win = window_seconds * 1_000_000
    cond = (
        (F.col(f"_l.{key_col}") == F.col(f"_r.{key_col}"))
        & (r_us > l_us)
        & (r_us <= l_us + win)
    )
    return left.alias("_l").join(right.alias("_r"), cond, "left_anti")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_micros: int = 3_600_000_000,
) -> DataFrame:
    """Pairs of OVERLAPPING intervals across two frames (closed
    intervals in µs BIGINTs: ``a.start <= b.end AND b.start <= a.end``)
    with the exact overlap length — the ranges×ranges join (concurrent
    sessions, campaign exposure windows, downtime intersections) that
    plain equi/as-of joins can't express.

    Both inputs carry ``(…payload, start_col, end_col)`` with
    ``end >= start`` (a malformed reversed interval cannot crash the
    plan — F.sequence steps backwards, producing the same bucket SET —
    but its "overlap" is meaningless, as in any engine); output is
    every left column (``a_``-prefixed), every right column
    (``b_``-prefixed), and ``overlap_us``.

    Scale: a direct inequality join is quadratic (BroadcastNestedLoop
    at best); instead each interval explodes to the time buckets it
    spans (``floor(start/w)..floor(end/w)``) and candidates equi-join
    on the bucket — only co-bucketed intervals meet. Each true pair is
    emitted EXACTLY ONCE, without a dedup shuffle, by keeping it only
    in the bucket containing ``max(starts)`` (both sides provably span
    that bucket, and no earlier or later shared bucket qualifies).
    Size ``bucket_micros`` near the typical interval length: the
    per-interval fan-out is ``len/w + 1`` and the per-bucket candidate
    count is what bounds the join, the classic time-blocking trade.
    """
    def prep(df: DataFrame, tag: str) -> DataFrame:
        renamed = df.select(
            *[F.col(c).alias(f"{tag}_{c}") for c in df.columns]
        )
        s, e = f"{tag}_{start_col}", f"{tag}_{end_col}"
        return renamed.select(
            "*",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / F.lit(bucket_micros)),
                    F.floor(F.col(e) / F.lit(bucket_micros)),
                )
            ).alias("_bucket"),
        )
    a, b = prep(left, "a"), prep(right, "b")
    sa, ea = f"a_{start_col}", f"a_{end_col}"
    sb, eb = f"b_{start_col}", f"b_{end_col}"
    joined = a.join(b, "_bucket").where(
        (F.col(sa) <= F.col(eb))
        & (F.col(sb) <= F.col(ea))
        # exactly-once emission: only in max(starts)'s bucket
        & (
            F.col("_bucket")
            == F.floor(
                F.greatest(F.col(sa), F.col(sb)) / F.lit(bucket_micros)
            )
        )
    )
    return joined.select(
        *[c for c in joined.columns if c != "_bucket"],
        (
            F.least(F.col(ea), F.col(eb))
            - F.greatest(F.col(sa), F.col(sb))
        ).alias("overlap_us"),
    )
