"""BPE vocabulary induction over the corpus word dictionary.

The standard byte-pair-encoding trainer (Sennrich et al. 2016) works on
the WORD-FREQUENCY dictionary, not the raw corpus: aggregate word
counts once, then iterate merges over the (word, freq) table. That is
exactly the scale shape this operator keeps at 100 TB:

- ONE full corpus scan builds the dict (hash-partial count aggregate —
  the only stage whose input is corpus-sized);
- every merge round runs on |vocab| rows: explode symbol bigrams
  (weighted by word freq), one pair-count shuffle bounded by the
  bigram vocabulary, a ``TakeOrdered`` argmax (no global sort), and a
  map-side literal replace. The dict is ``localCheckpoint``-ed per
  round so round N+1 never replays round N's lineage.

Determinism (the oracle contract): pair counts are BIGINT sums of
BIGINT freqs; the argmax orders by (count DESC, left ASC, right ASC)
— a total order over ASCII symbol strings that Spark and DuckDB
compare identically. Merges are applied with a literal string replace
over a DOUBLE-SPACED symbol string (' l  r ' → ' lr '): because every
token owns both its bounding spaces, left-to-right non-overlapping
replacement merges runs of repeated symbols exactly like canonical
greedy BPE ([a,a,a,a] → [aa,aa], [a,a,a] → [aa,a]) — and both
engines' ``replace`` share the scan-after-replacement semantics.

A round with no pair at ``min_freq`` applies no merge, so every later
round is provably a no-op too — the fixed-round unrolled-CTE oracle
replay is exact whether or not the Spark side stopped early (the
converge-then-stop contract, see CLAUDE.md).

Reference scope: the reference engine (672-line Go ETL sync,
``main.go``/``internal/``) has no text pipeline; this operator is part
of the training-data-preparation surface the build brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.textops import normalized_text, tokens

#: end-of-word marker ('</w>' per the BPE paper). ASCII, so the
#: (left, right) tiebreak compares identically in Spark and DuckDB.
END_OF_WORD = "</w>"


def _symbol_string(word: str | Column) -> Column:
    """Initial symbol sequence of a word: its characters space-joined,
    plus the end-of-word marker ('h e l l o </w>')."""
    w = F.col(word) if isinstance(word, str) else word
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, 1)
    )
    return F.concat(F.array_join(chars, " "), F.lit(" " + END_OF_WORD))


def word_freq_dict(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, symbols) dictionary — the one corpus-sized stage."""
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.repartition(n_parts)  # spread off the few-row-group scan
        .select(F.explode(tokens(normalized_text(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
        .withColumn("s", _symbol_string("w"))
    )


def _apply_merge(s: Column, left: str, right: str) -> Column:
    """One merge pass: canonical left-to-right non-overlapping pairing
    via literal replace on the double-spaced form (module docstring)."""
    doubled = F.concat(F.lit(" "), F.replace(s, F.lit(" "), F.lit("  ")), F.lit(" "))
    merged = F.replace(
        doubled,
        F.lit(f" {left}  {right} "),
        F.lit(f" {left}{right} "),
    )
    return F.trim(F.regexp_replace(merged, " +", " "))


def bpe_merge_table(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_freq: int = 2,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns the merge table
    (rank, left, right, merged, pair_freq) — rank is 1-based merge
    order, ``merged`` the new symbol. Stops early only when no pair
    reaches ``min_freq`` (a no-change round, after which every further
    round would also be a no-op).

    The per-round argmax is a driver-side single-row collect — bounded
    by construction (one row per round), the same pattern as the
    k-means codebook loop.
    """
    spark = docs.sparkSession
    d = word_freq_dict(docs, text_col).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, num_merges + 1):
        a = F.split("s", " ")
        # slice+zip_with, not element_at(a, i) in a lambda: projection
        # collapse would inline the split into the lambda body and
        # re-split the word once per element (the DSIR bigram trap —
        # bounded here by word length, but the same defect). Both
        # slices are top-level expressions, evaluated once per row.
        n1 = F.greatest(F.size(a) - 1, F.lit(0))
        pairs = F.zip_with(
            F.slice(a, 1, n1),
            F.slice(a, 2, n1),
            lambda l, r: F.struct(l.alias("l"), r.alias("r")),
        )
        best = (
            d.select("f", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("f").cast("bigint").alias("pf"))
            .where(F.col("pf") >= min_freq)
            .orderBy(F.col("pf").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, pf = best[0]["l"], best[0]["r"], best[0]["pf"]
        merges.append((r, left, right, left + right, pf))
        d = d.withColumn("s", _apply_merge(F.col("s"), left, right)).localCheckpoint(
            eager=False
        )
    return spark.createDataFrame(
        merges, "rank bigint, left string, right string, merged string, pair_freq bigint"
    )


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table: per-document subword token counts.

    The merge list is collected to the driver (|merges| rows, bounded
    by the requested vocabulary size — same posture as a broadcast
    codebook) and applied as a fused chain of literal replaces over
    each document's word stream; the corpus is scanned once,
    map-side only.
    """
    ms = [
        (r["left"], r["right"])
        for r in merges.orderBy(F.col("rank").asc()).collect()
    ]
    word = F.col("_w")
    sym = _symbol_string(word)
    for left, right in ms:
        sym = _apply_merge(sym, left, right)
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    # the fused replace chain runs per word — spread off the scan first
    per_word = docs.repartition(n_parts).select(
        "*", F.explode(tokens(normalized_text(text_col))).alias("_w")
    ).withColumn("_n", F.size(F.split(sym, " ")))
    return (
        per_word.groupBy(*docs.columns)
        .agg(F.sum("_n").cast("bigint").alias(out_col))
    )
