"""Deterministic Bloom filter — distributed build, expression-only
probe — as a shuffle-avoiding join pre-filter.

The scale problem: a semi join of a 100 TB fact table against a 10M-key
dimension shuffles the full fact table; the exact key set is too big to
broadcast as a join, but a Bloom filter of it is ~1-2 bytes/key and
broadcasts fine. Pre-filtering the fact side with the bloom removes
(1 - fp) of the non-matching rows BEFORE any shuffle; the exact join
afterwards only sees survivors. (Spark's own runtime row-group bloom
filtering does this inside AQE when it can; this operator is the
engine-level, cross-engine-checkable version with explicit control.)

Construction is md5-double-hashed and fully deterministic, so a DuckDB
oracle can rebuild the IDENTICAL filter bit-for-bit
(``contract.bloom_words``): position_i(key) = (h1 + i·h2) mod n_bits
with h1 = md5_int32(key), h2 = md5_int32(key ∥ '#') | 1 (odd ⇒ the k
probes cycle the whole table). Words are 32-bit (stored in BIGINT) so
``1 << bit`` never touches the sign bit in either engine.

Plan shapes:

- ``bloom_build``: explode k positions per key → groupBy word index →
  ``bit_or`` — one partial-agg shuffle whose output is ≤ n_bits/32
  rows. At any corpus size the shuffle moves only per-partition partial
  words (≤ n_words × partitions rows).
- ``bloom_probe_col``: the collected words become a LITERAL array in
  the plan (the filter IS the broadcast, same posture as
  ``similarity.pandas_topk``'s query matrix); the probe is pure
  ``element_at``/``shiftright``/bitwise-AND expressions — whole-stage
  codegen, no join, no Python.

False-negative-free by construction; false-positive rate for m bits,
n keys, k hashes ≈ (1 - e^{-kn/m})^k.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ig_etl_sync_spark.functions.hashing import md5_int32

WORD_BITS = 32  # 32-bit words in BIGINT: shifts stay off the sign bit


def _h1(key: Column) -> Column:
    return md5_int32(key.cast("string"))


def _h2(key: Column) -> Column:
    # force odd so (h1 + i*h2) mod n_bits cycles all positions
    return md5_int32(F.concat(key.cast("string"), F.lit("#"))).bitwiseOR(F.lit(1))


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    h1, h2 = _h1(key), _h2(key)
    return [(h1 + F.lit(i) * h2) % F.lit(n_bits) for i in range(n_hashes)]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Distributed build: ``(word_idx, word)`` rows, word_idx ∈
    [0, n_bits/32), missing indexes ⇒ word 0. One partial-agg shuffle."""
    if n_bits % WORD_BITS:
        raise ValueError(f"n_bits must be a multiple of {WORD_BITS}")
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits, n_hashes)))
    exploded = keys.select(pos.alias("_pos"))
    return (
        exploded.groupBy(
            (F.col("_pos") / WORD_BITS).cast("long").alias("word_idx")
        )
        .agg(
            F.bit_or(
                # call_function: the shift amount is a COLUMN (python
                # F.shiftleft only takes a literal int)
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("_pos") % WORD_BITS).cast("int"),
                )
            ).alias("word")
        )
    )


def collect_words(bloom: DataFrame, n_bits: int) -> list[int]:
    """Densify a ``bloom_build`` frame into the full word list (the
    tiny broadcast payload: n_bits/32 Python ints)."""
    words = [0] * (n_bits // WORD_BITS)
    for r in bloom.collect():
        words[int(r.word_idx)] = int(r.word)
    return words


def bloom_probe_col(
    key: Column,
    words: list[int],
    n_bits: int,
    n_hashes: int = 3,
) -> Column:
    """Boolean membership-test expression over a literal word array.

    True ⇔ every hash position's bit is set (no false negatives;
    false positives at the configured rate)."""
    if len(words) != n_bits // WORD_BITS:
        raise ValueError(
            f"words length {len(words)} != n_bits/{WORD_BITS} = {n_bits // WORD_BITS}"
        )
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    checks = []
    for p in _positions(key, n_bits, n_hashes):
        word = F.element_at(arr, (p / WORD_BITS).cast("int") + 1)
        bit = (p % WORD_BITS).cast("int")
        checks.append(
            F.call_function("shiftright", word, bit).bitwiseAND(F.lit(1)) == 1
        )
    return reduce(lambda a, b: a & b, checks)


def bloom_semi_filter(
    facts: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Pre-filter ``facts`` to rows whose key MIGHT be in ``dim_keys``:
    a superset of the exact semi join (follow with the exact join).
    The build aggregates the dim side; the probe never shuffles the
    fact side."""
    bloom = bloom_build(dim_keys.select(dim_key), dim_key, n_bits, n_hashes)
    words = collect_words(bloom, n_bits)
    return facts.where(
        bloom_probe_col(F.col(fact_key), words, n_bits, n_hashes)
    )
