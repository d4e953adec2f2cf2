"""Slowly-changing-dimension type-2 history from a change stream.

The reference engine reconciles each sync to the *latest* state
(``internal/recon/recon.go:36-156`` keeps one row per external_id and
its change hash); SCD2 is the history-preserving extension a warehouse
user expects on top of that CDC core: one row per *run* of identical
tracked values per key, with ``[valid_from, valid_to)`` validity and a
current-row marker.

Plan shape (the scale story): ONE shuffle, on the key. The classic
formulation — tag run starts with a lag, cumsum a run id, then
``groupBy(key, run_id)`` — pays a second shuffle because Spark hashes
on ``(key, run_id)``, not ``key``. We avoid it: keep only the run-START
rows (the lag filter) and take ``valid_to = lead(valid_from)`` with a
second window over the SAME partitioning — Catalyst plans both windows
and the filter into one Exchange. Verified in the physical plan: a
single ``Exchange hashpartitioning(key)``.

Skew: one key's whole history sorts inside one partition — same hazard
profile as any per-key window (see ``sessions.py``); salt by a coarse
time bucket if a single key can exceed a partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    state_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    out_from: str = "valid_from",
    out_to: str = "valid_to",
    out_current: str = "is_current",
) -> DataFrame:
    """Collapse a change stream into SCD2 validity intervals.

    One output row per maximal run of identical ``state_cols`` values
    per key (ordered by ``ts_col``, then ``tiebreak_cols``):
    ``key_cols..., state_cols..., valid_from, valid_to, is_current``.
    ``valid_to`` is the next run's ``valid_from`` (half-open interval)
    and NULL on the key's current run; ``is_current`` is 1 there, else
    0 (int, not bool, for cross-engine hash stability).
    """
    keys, states = list(key_cols), list(state_cols)
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    internal = {"_prev_state", "_state"}
    clash = internal.intersection(df.columns)
    if clash:
        raise ValueError(f"column(s) {sorted(clash)} collide with scd2 internals")

    w = Window.partitionBy(*keys).orderBy(*order)
    state = F.struct(*[F.col(c) for c in states])
    runs = (
        df.withColumn("_state", state)
        .withColumn("_prev_state", F.lag("_state").over(w))
        .where(~F.col("_prev_state").eqNullSafe(F.col("_state")))
    )
    # Same partitioning + ordering as `w`: no second Exchange.
    w2 = Window.partitionBy(*keys).orderBy(*order)
    valid_to = F.lead(ts_col).over(w2)
    return runs.select(
        *keys,
        *states,
        F.col(ts_col).alias(out_from),
        valid_to.alias(out_to),
        F.when(valid_to.isNull(), 1).otherwise(0).alias(out_current),
    )


def scd2_point_in_time(
    history: DataFrame,
    ts,
    out_from: str = "valid_from",
    out_to: str = "valid_to",
) -> DataFrame:
    """The rows valid at instant ``ts`` (a Column or literal):
    ``valid_from <= ts < valid_to`` with NULL ``valid_to`` = open end.
    A narrow filter — at scale it predicate-pushes into the scan when
    the history is stored partitioned/sorted by ``valid_from``."""
    t = F.lit(ts)
    return history.where(
        (F.col(out_from) <= t)
        & (F.col(out_to).isNull() | (t < F.col(out_to)))
    )


def scd2_sql(
    table: str,
    key_cols: Sequence[str],
    state_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`scd2_history` (same output columns)."""
    keys = ", ".join(key_cols)
    states = ", ".join(state_cols)
    order = ", ".join([ts_col, *tiebreak_cols])
    state_row = "ROW(" + ", ".join(state_cols) + ")"
    # carry tiebreak cols through the CTE for the second window's ORDER BY
    carried = ", ".join(
        dict.fromkeys([*key_cols, *state_cols, ts_col, *tiebreak_cols])
    )
    return f"""
WITH marked AS (
  SELECT {carried},
         CASE WHEN lag({state_row}) OVER w IS DISTINCT FROM {state_row}
              THEN 1 ELSE 0 END AS _new_run
  FROM {table}
  WINDOW w AS (PARTITION BY {keys} ORDER BY {order})),
starts AS (SELECT * FROM marked WHERE _new_run = 1)
SELECT {keys}, {states},
       {ts_col} AS valid_from,
       lead({ts_col}) OVER w2 AS valid_to,
       CASE WHEN lead({ts_col}) OVER w2 IS NULL THEN 1 ELSE 0 END AS is_current
FROM starts
WINDOW w2 AS (PARTITION BY {keys} ORDER BY {order})
"""
