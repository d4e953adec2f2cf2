"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY §2.8); these are the
engine's X7 extension ops that need state ACROSS micro-batches — the
one place Structured Streaming's built-in aggregates don't reach and
the documented escape hatch (Arrow-batched grouped state) is the right
tool.

Scale: state is partitioned by the group key across executors and
checkpointed; memory is bounded by keys-with-state. For unbounded key
spaces set a state TTL (``GroupStateTimeout``) so idle keys evict —
exactly the watermark discipline, applied to custom state.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def streaming_first_seen(
    events: DataFrame,
    key_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Cross-batch exact dedup: emit each key's FIRST row ever seen;
    re-deliveries in later batches are dropped (state remembers).

    The batch analog is ``dedup.exact_dedup`` — this is its streaming
    form with durable seen-state. ``ttl_ms`` bounds state for unbounded
    key spaces (idle keys evict and would re-emit — choose per
    pipeline).
    """
    import pandas as pd

    out_schema = StructType.fromJson(events.schema.jsonValue())
    state_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "seen", "type": "boolean", "nullable": False, "metadata": {}}
        ]}
    )

    def dedup(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return  # key already emitted in an earlier batch
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if first is None:
            return
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield first

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        dedup, out_schema, state_schema, "append", timeout
    )


def streaming_running_counts(
    events: DataFrame,
    key_col: str,
) -> DataFrame:
    """Running per-key event counter maintained across batches — the
    minimal custom-state example (built-in streaming agg could do this;
    kept as the template for richer per-key state machines)."""
    import pandas as pd

    key_field = events.schema[key_col]  # follow the actual key type
    out_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            key_field.jsonValue(),
            {"name": "total", "type": "long", "nullable": False, "metadata": {}},
        ]}
    )
    state_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "total", "type": "long", "nullable": False, "metadata": {}}
        ]}
    )

    def count(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        prev = state.get[0] if state.exists else 0
        batch = sum(len(pdf) for pdf in pdfs)
        total = prev + batch
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "total": [total]})

    return events.groupBy(key_col).applyInPandasWithState(
        count, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of ``sessions.transition_matrix``: emit one row
    per consecutive event-type transition within each key's timeline,
    with the previous batch's LAST state carried across micro-batches
    (the transition that straddles a batch boundary is not lost).

    Emits ``(key, src_type, dst_type)`` rows in append mode — feed a
    downstream counter (foreachBatch upsert or a follow-up batch agg)
    for the matrix. Rows within a batch are ordered by (ts, tiebreak)
    before pairing; batches are assumed to arrive in event-time order
    per key (the same in-order contract as the other streaming twins —
    use a watermark + sort upstream for out-of-order sources).

    Scale: state per key is ONE string (the last event type) — the
    minimum possible; with RocksDB state store (session.py scale
    defaults) the bound is keys × bytes(type), not event volume.
    """
    import pandas as pd

    key_field = events.schema[key_col]
    out_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            key_field.jsonValue(),
            {"name": "src_type", "type": "string", "nullable": False,
             "metadata": {}},
            {"name": "dst_type", "type": "string", "nullable": False,
             "metadata": {}},
        ]}
    )
    state_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "last_type", "type": "string", "nullable": False,
             "metadata": {}}
        ]}
    )

    def trans(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True).sort_values(
            [ts_col, tiebreak_col], kind="mergesort"
        )
        types = rows[type_col].tolist()
        seq = ([state.get[0]] if state.exists else []) + types
        state.update((types[-1],))
        if len(seq) < 2:
            return
        yield pd.DataFrame(
            {
                key_col: [key[0]] * (len(seq) - 1),
                "src_type": seq[:-1],
                "dst_type": seq[1:],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        trans, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_ewma(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    *,
    alpha_ppm: int = 500_000,
    quant_dp: int = 2,
) -> DataFrame:
    """UNBOUNDED exponential decay per key — the streaming twin that
    ``temporal.decay_weighted_avg`` (bounded ``depth`` lags) points at
    for infinite histories.

    Per observation the state advances with the deterministic
    fixed-point recurrence (all BIGINT, floor division — the repo's
    iterated-computation discipline, no float in the loop)::

        x_q  = floor(value * 10^quant_dp)
        num' = x_q * 2^20 + (alpha_ppm * num) div 10^6
        den' =       2^20 + (alpha_ppm * den) div 10^6

    and emits ``ewma = num' / (den' * 10^quant_dp)`` — the only float
    op is the final division, so a replay (or the batch reference that
    runs the same recurrence over the full history) is bit-identical.
    Both accumulators are bounded by the geometric series
    ``max/(1-alpha)``, so state per key is two BIGINTs forever.

    Rows within a batch are ordered by ``(ts, tiebreak)``; batches are
    assumed in event-time order per key (the module's in-order
    contract). Emits one ``(key, tiebreak, ewma DOUBLE)`` row per input
    row in append mode.

    Scale: state is 16 bytes/key regardless of history length; with
    the RocksDB state store the bound is keys, not event volume.
    """
    import pandas as pd

    if not (0 < alpha_ppm < 1_000_000):
        raise ValueError("alpha_ppm must be in (0, 1_000_000)")
    wscale = 1 << 20
    vscale = 10**quant_dp
    key_field = events.schema[key_col]
    tiebreak_field = events.schema[tiebreak_col]
    out_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            key_field.jsonValue(),
            tiebreak_field.jsonValue(),
            {"name": "ewma", "type": "double", "nullable": False,
             "metadata": {}},
        ]}
    )
    state_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "num", "type": "long", "nullable": False, "metadata": {}},
            {"name": "den", "type": "long", "nullable": False, "metadata": {}},
        ]}
    )

    def ewma(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True).sort_values(
            [ts_col, tiebreak_col], kind="mergesort"
        )
        import math

        num, den = state.get if state.exists else (0, 0)
        ids, outs = [], []
        for v, tb in zip(rows[value_col], rows[tiebreak_col]):
            x_q = math.floor(float(v) * vscale)
            num = x_q * wscale + (alpha_ppm * num) // 1_000_000
            den = wscale + (alpha_ppm * den) // 1_000_000
            ids.append(tb)
            outs.append(num / (den * vscale))
        state.update((num, den))
        yield pd.DataFrame(
            {key_col: [key[0]] * len(ids), tiebreak_col: ids, "ewma": outs}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        ewma, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_quantile_sketch(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    *,
    k: int = 256,
    quantiles: tuple[int, ...] = (25, 50, 90, 99),
) -> DataFrame:
    """Streaming twin of ``sketches.quantile_sketch``: per-key bottom-k
    quantile state across micro-batches.

    The md5 draw is computed IN SPARK (``md5_int32`` over the same
    ``concat_ws(':', value, id)`` string the batch op hashes) BEFORE
    the stateful op — Python's float formatting differs from Spark's
    cast-to-string, so hashing driver-side would silently break
    streaming≡batch parity. The pandas state op only MERGES: union the
    incoming (hash, value) pairs with the stored sample and keep the k
    smallest by (hash, value) — the same bottom-k-of-union identity
    that makes the batch sketch shard-mergeable makes the stream fold
    order-insensitive, so after any batch the state equals the batch
    sketch over everything ingested so far (tested exactly).

    Emits one ``(key, sample_n, q25, …)`` row per key per batch in
    update mode. State is ≤ k (long, double) pairs per key —
    ``k * 16`` bytes regardless of stream length.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    from ig_etl_sync_spark.functions.hashing import md5_int32

    hashed = events.where(F.col(value_col).isNotNull()).select(
        F.col(key_col),
        md5_int32(
            F.concat_ws(
                ":",
                F.col(value_col).cast("string"),
                F.col(id_col).cast("string"),
            )
        ).alias("_h"),
        F.col(value_col).cast("double").alias("_v"),
    )
    key_field = events.schema[key_col]
    out_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            key_field.jsonValue(),
            {"name": "sample_n", "type": "integer", "nullable": False,
             "metadata": {}},
            *[
                {"name": f"q{q}", "type": "double", "nullable": False,
                 "metadata": {}}
                for q in quantiles
            ],
        ]}
    )
    state_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "hs", "type": {"type": "array", "elementType": "long",
                                    "containsNull": False},
             "nullable": False, "metadata": {}},
            {"name": "vs", "type": {"type": "array", "elementType": "double",
                                    "containsNull": False},
             "nullable": False, "metadata": {}},
        ]}
    )

    def sketch(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True)
        hs, vs = state.get if state.exists else ([], [])
        pairs = sorted(
            list(zip((int(h) for h in hs), (float(v) for v in vs)))
            + list(zip((int(h) for h in rows["_h"]), (float(v) for v in rows["_v"])))
        )[:k]
        state.update(([h for h, _ in pairs], [v for _, v in pairs]))
        sv = sorted(v for _, v in pairs)
        n = len(sv)
        out = {key_col: [key[0]], "sample_n": [n]}
        for q in quantiles:
            out[f"q{q}"] = [sv[(q * n + 99) // 100 - 1]]
        yield pd.DataFrame(out)

    return hashed.groupBy(key_col).applyInPandasWithState(
        sketch, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
