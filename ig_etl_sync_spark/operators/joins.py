"""Join strategies for scale: skew salting and broadcast helpers.

AQE's skew-join splitting handles most skew automatically; explicit
salting is for the cases AQE cannot fix — a skewed AGGREGATION key, or
a skewed join where neither side can be split (both sides huge on the
hot key). The salt spreads one hot key over ``salt`` subkeys: the small
side is replicated ``salt``× (explode), the big side picks one subkey
pseudo-randomly-but-deterministically (hash of a high-cardinality
column, not RNG — reproducible plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with the hot-key salt pattern.

    ``big`` rows get ``_salt = pmod(xxhash64(salt_source or key-row),
    salt)``; ``small`` rows are exploded to all ``salt`` values. The
    join key becomes (key, _salt) — the hot key's rows spread over
    ``salt`` reducers instead of one.

    Only join types where the SMALL side's replication cannot surface
    as output rows are valid: inner/left/left_semi/left_anti (the
    replicated small rows that miss a salt value would appear as
    phantom unmatched rows under right/full outer).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side is "
            f"replicated {salt}x, so right/full outer joins would emit "
            "phantom unmatched rows. Use inner/left/left_semi/left_anti."
        )
    src = F.xxhash64(*[F.col(c) for c in ([salt_source] if salt_source else big.columns)])
    big_s = big.withColumn("_salt", F.pmod(src, F.lit(salt)).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def broadcast_threshold_join(
    left: DataFrame, right: DataFrame, key: str, how: str = "inner",
    force_broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join that pins a broadcast when the caller KNOWS the right
    side is small (dimension tables) — saves AQE the first-shuffle
    round-trip it needs before demoting to broadcast."""
    r = F.broadcast(right) if force_broadcast_right else right
    return left.join(r, key, how)


def fuzzy_match_join(
    left: DataFrame,
    right: DataFrame,
    col: str,
    max_dist: int = 1,
    left_out: str = "a",
    right_out: str = "b",
) -> DataFrame:
    """Entity-resolution join: pairs of values whose Levenshtein
    distance is ≤ ``max_dist``. Returns ``(left_out, right_out, dist)``
    with ``left_out < right_out`` (self-join safe, each pair once).

    Blocking is by LENGTH — sound, because edit distance ≥ the length
    difference, so no pair within ``max_dist`` is missed: the right
    side replicates each value to its ``2·max_dist+1`` admissible
    length keys (explode), and the join becomes an equi-join on the
    length key. Levenshtein runs only within blocks, never all-pairs.

    Scale note: length blocking alone leaves large blocks when values
    share lengths (names, SKUs). The production refinement is q-gram
    prefix blocking (same explode-to-keys shape, keys = positional
    q-grams) — length blocking keeps this construction exactly
    replayable by a SQL oracle, which is what the contract checks.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist={max_dist} < 0")
    lv = left.select(F.col(col).alias(left_out)).distinct()
    rv = right.select(F.col(col).alias(right_out)).distinct()
    l_key = lv.withColumn("_blk", F.length(left_out))
    r_key = rv.withColumn(
        "_blk",
        F.explode(
            F.sequence(
                F.length(right_out) - max_dist,
                F.length(right_out) + max_dist,
            )
        ),
    )
    cand = l_key.join(r_key, "_blk").where(F.col(left_out) < F.col(right_out))
    return cand.select(
        left_out,
        right_out,
        F.levenshtein(F.col(left_out), F.col(right_out)).alias("dist"),
    ).where(F.col("dist") <= max_dist)
