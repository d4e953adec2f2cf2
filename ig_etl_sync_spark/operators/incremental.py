"""Incremental aggregate maintenance — fold a CDC delta into a
materialized aggregate without rescanning the base data.

The reference syncs row-level state (``internal/recon/recon.go``); any
warehouse on top of it also maintains *aggregates* of that state. The
naive refresh recomputes ``groupBy().agg()`` over the full base — an
O(100 TB) scan per sync. For ADDITIVE measures (sum, count — the
abelian-group subset) the refreshed aggregate is derivable from the
previous aggregate plus the delta alone:

    new = old  ⊕  summarize(created)  ⊖  summarize(deleted)

(an upsert contributes its old row to ``deleted`` and its new row to
``created`` — exactly what ``reconcile`` / ``merkle_diff`` emit.)

Plan shape: ``summarize`` over the delta is a partial-agg scan of the
DELTA only; ``apply_delta`` is a union of two already-tiny frames (the
stored aggregate, |groups| rows, and the delta summary) followed by one
groupBy on the keys. Nothing ever rescans base data, so maintenance
cost is O(|delta| + |groups|) independent of base size. Groups whose
maintained row count reaches zero are retired (dropped), so the
maintained frame stays exactly equal to a from-scratch recompute —
property-tested in ``tests/test_incremental.py`` and oracle-proven by
``contract.incremental_orders_agg`` (whose DuckDB twin IS the
from-scratch recompute).

Non-additive measures (min/max/distinct) are NOT maintainable under
deletes from the aggregate alone — ``summarize`` rejects them by
construction (it only builds sums and counts). Maintain those with
sketches (``operators/sketches``) or a recompute.

Determinism note for integer measures: sums of BIGINT are
order-independent, so the maintained value is bit-equal to a recompute.
Float sums are only equal up to addition-order ulps — prefer
fixed-point (cents) columns for maintained money measures, as the
contract query does.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: maintained row-count column (the group-retirement witness)
COUNT_COL = "n_rows"


def _measures(sums: Mapping[str, "Column | str"]) -> dict[str, Column]:
    out = {}
    for name, m in sums.items():
        if name == COUNT_COL:
            raise ValueError(f"measure name {COUNT_COL!r} is reserved")
        out[name] = F.col(m) if isinstance(m, str) else m
    return out


def summarize(
    df: DataFrame,
    keys: Sequence[str],
    sums: Mapping[str, "Column | str"],
    sign: int = 1,
) -> DataFrame:
    """Materialize the additive aggregate: per-keys ``sum`` of each
    measure plus the maintained row count. ``sign=-1`` negates every
    measure and the count — the ⊖ side of the delta."""
    ms = _measures(sums)
    return df.groupBy(*keys).agg(
        *[F.sum(F.lit(sign) * c).alias(n) for n, c in ms.items()],
        F.sum(F.lit(sign)).alias(COUNT_COL),
    )


def delta_summary(
    plus: DataFrame | None,
    minus: DataFrame | None,
    keys: Sequence[str],
    sums: Mapping[str, "Column | str"],
) -> DataFrame:
    """Summaries of created (+) and deleted (−) rows, ready for
    :func:`apply_delta`. Either side may be None/empty."""
    if plus is None and minus is None:
        raise ValueError("delta_summary: need at least one of plus/minus")
    parts = []
    if plus is not None:
        parts.append(summarize(plus, keys, sums, sign=1))
    if minus is not None:
        parts.append(summarize(minus, keys, sums, sign=-1))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def apply_delta(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Fold a delta summary into the stored aggregate: union the two
    (tiny) frames, re-sum per key, retire groups whose maintained count
    hit zero. Output schema == ``summarize`` output schema, and value-
    equal to a from-scratch recompute for additive measures."""
    if set(base.columns) != set(delta.columns):
        raise ValueError(
            f"apply_delta: schema mismatch {sorted(base.columns)} vs "
            f"{sorted(delta.columns)}"
        )
    measure_cols = [c for c in base.columns if c not in keys]
    merged = base.unionByName(delta).groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in measure_cols]
    )
    return merged.where(F.col(COUNT_COL) > 0)
