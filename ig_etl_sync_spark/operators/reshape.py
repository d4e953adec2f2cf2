"""Pivot / unpivot reshaping (wide ↔ long).

The reference's transform templates (``data/transform/*.tmpl``) only
reshape *nested* structure (explode, §2.3 P1); column-direction
reshaping is the OLAP counterpart a warehouse user expects, so it is
part of the §2.9 beyond-reference surface.

Scale notes:

- ``pivot_wide`` compiles the pivot to CONDITIONAL AGGREGATES —
  ``agg(f(when(pivot = v, measure)))`` per (value, measure) — instead
  of ``DataFrame.pivot``. Two reasons, both measured in
  ``tests/test_reshape.py::test_pivot_single_shuffle_no_discovery_job``:
  (1) Spark's ``pivot(col)`` without values runs an eager ``distinct``
  job over the whole input just to *name* the output columns — a full
  extra scan at 100 TB; (2) even with explicit values, ``pivot``
  physically plans TWO hash Exchanges (pre-aggregate on
  ``(keys, pivot)``, then ``pivot_first`` on ``keys``). The conditional
  form is ONE Exchange on ``keys`` with map-side partial aggregation —
  the same plan a hand-written ``sum(x) FILTER (WHERE p = v)`` gets.
- Empty cells: a group with no row for value ``v`` yields NULL for
  null-ignoring aggs (sum/avg/min/max) and 0 for ``F.count`` — i.e.
  exactly SQL ``FILTER`` semantics, NOT ``DataFrame.pivot``'s
  NULL-for-count behavior.
- ``unpivot_long`` is narrow (a generator over each row, no shuffle);
  output rows = input rows × len(value_cols). Project BEFORE unpivoting
  — the generator multiplies whatever width you carry.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: One pivot measure: (aggregate fn over the masked cell, measure column).
PivotAgg = tuple[Callable[[Column], Column], "Column | str"]


def pivot_wide(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    aggs: Mapping[str, PivotAgg],
) -> DataFrame:
    """Wide pivot with explicit values, compiled to conditional aggs.

    One output row per ``keys`` group; for every pivot value ``v`` and
    every agg ``name -> (fn, measure)`` an output column ``{name}_{v}``
    holding ``fn(measure)`` over the rows where ``pivot_col == v``
    (e.g. ``{"qty": (F.sum, "l_quantity")}``). Rows whose pivot value
    is outside ``values`` are filtered out before the aggregate so the
    scan prunes them.
    """
    if not values:
        raise ValueError("pivot_wide: explicit `values` required (empty)")
    if not aggs:
        raise ValueError("pivot_wide: at least one aggregate required")
    cells = []
    for v in values:
        mask = F.col(pivot_col) == F.lit(v)
        for name, (fn, measure) in aggs.items():
            m = F.col(measure) if isinstance(measure, str) else measure
            cells.append(fn(F.when(mask, m)).alias(f"{name}_{v}"))
    return (
        df.where(F.col(pivot_col).isin(list(values)))
        .groupBy(*keys)
        .agg(*cells)
    )


def unpivot_long(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Long unpivot (melt): one output row per (input row, value col).

    NULL measure cells are KEPT (a melted cell is a fact even when the
    fact is NULL) — callers wanting DuckDB-``UNPIVOT`` semantics (which
    drops NULLs) filter afterwards.
    """
    missing = [c for c in [*ids, *value_cols] if c not in df.columns]
    if missing:
        raise ValueError(f"unpivot_long: missing columns {missing}")
    return df.unpivot(
        [F.col(c) for c in ids],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
