"""Stream-stream event-time interval join (SURVEY §2.9 X7 family).

The attribution primitive — "join each click to the purchases the same
user made within the next hour" — over two UNBOUNDED streams. The
reference has no streaming at all; batch engines express this as an
inequality join, but on streams it needs bounded state: Spark keeps
only rows inside the watermark + interval bound and evicts the rest,
so the join runs indefinitely at bounded memory.

Scale design (100 TB/day):

- **State is bounded by the time bound, not the stream size.** Both
  sides carry a watermark; the interval condition (``r.ts BETWEEN l.ts
  + lower AND l.ts + upper``) lets Spark compute, per side, exactly
  how long a row can still find a match — rows older than watermark +
  bound are dropped from the state store each micro-batch.
- **The join itself is a key-hash shuffle** (both streams partitioned
  by the join key), identical to the batch plan — no driver-side
  anything. Skewed keys behave like any skewed shuffle and can be
  salted upstream with ``operators.joins.salted_join`` semantics.
- **Batch twin for free**: the same function on batch frames compiles
  to a plain inequality join, which is how tests verify streaming
  output ≡ batch answer on bounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]

_HOW = {"inner", "leftOuter", "left_outer"}


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: int = 0,
    upper_sec: int = 3600,
    watermark_delay: str = "30 minutes",
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Join ``left`` to the ``right`` rows of the same ``on`` key whose
    ``right_ts`` falls in ``[left_ts + lower_sec, left_ts + upper_sec]``.

    Works on both batch and streaming frames. On streaming inputs both
    sides get ``watermark_delay`` watermarks (required by Spark for
    state eviction; for outer joins it also bounds NULL-emission
    latency). Right-side non-key columns come back suffixed so the
    output schema is collision-free either way.
    """
    if how not in _HOW:
        raise ValueError(
            f"interval_join supports inner/leftOuter, not {how!r}: a "
            "rightOuter/full join would need the right side to outlive "
            "the left watermark bound, which inverts the state model"
        )
    if lower_sec > upper_sec:
        raise ValueError(f"empty interval: [{lower_sec}, {upper_sec}]")
    overlap = {c for c in right.columns if c in left.columns and c != on}
    renamed = right
    for c in overlap:
        renamed = renamed.withColumnRenamed(c, c + right_suffix)
    r_ts = right_ts + right_suffix if right_ts in overlap else right_ts

    lf = left.alias("l")
    rf = renamed.alias("r")
    if left.isStreaming:
        lf = lf.withWatermark(left_ts, watermark_delay)
    if right.isStreaming:
        rf = rf.withWatermark(r_ts, watermark_delay)

    # Written as timestamp ± INTERVAL (not unix_micros arithmetic) so
    # Spark's streaming analyzer recognizes the event-time bound and
    # derives the state-eviction threshold from it.
    cond = F.expr(
        f"l.{on} = r.{on} "
        f"AND r.{r_ts} >= l.{left_ts} + INTERVAL '{int(lower_sec)}' SECOND "
        f"AND r.{r_ts} <= l.{left_ts} + INTERVAL '{int(upper_sec)}' SECOND"
    )
    joined = lf.join(rf, cond, "inner" if how == "inner" else "leftOuter")
    return joined.drop(rf[on])
