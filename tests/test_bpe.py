"""BPE vocabulary induction (SURVEY X56) vs a canonical pure-Python
reference (Sennrich et al. get_stats/merge_vocab discipline)."""

from __future__ import annotations

import collections
import re

import pyspark.sql.functions as F
import pytest

from ig_etl_sync_spark.operators.bpe import (
    END_OF_WORD,
    bpe_merge_table,
    bpe_segment,
)


def ref_bpe(word_freqs: dict[str, int], num_merges: int, min_freq: int):
    """Canonical BPE trainer: overlapping-adjacency pair counts,
    (count DESC, pair ASC) argmax, left-to-right non-overlapping
    merge application."""
    vocab = {tuple(w) + (END_OF_WORD,): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        stats: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        cands = [(c, p) for p, c in stats.items() if c >= min_freq]
        if not cands:
            break
        count, (left, right) = min(cands, key=lambda t: (-t[0], t[1]))
        merges.append((rank, left, right, left + right, count))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def word_freqs_of(texts: list[str]) -> dict[str, int]:
    freqs: collections.Counter = collections.Counter()
    for t in texts:
        norm = re.sub(r"\s+", " ", re.sub(r"[^\w\s]", "", t.lower().strip()))
        freqs.update(w for w in norm.split(" ") if w)
    return dict(freqs)


def run_both(spark, texts, num_merges=8, min_freq=2):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in bpe_merge_table(
            docs, num_merges=num_merges, min_freq=min_freq
        ).orderBy("rank").collect()
    ]
    want = ref_bpe(word_freqs_of(texts), num_merges, min_freq)
    return got, want


def test_bpe_matches_reference_simple(spark):
    got, want = run_both(
        spark,
        ["low low low lower lowest", "new newer newest low wider wide"],
        num_merges=10,
    )
    assert got == want


def test_bpe_repeated_symbol_runs(spark):
    """Runs of 3+ identical symbols are the hard case for the
    replace-based merge application: [a,a,a,a] must become [aa,aa]
    (canonical non-overlapping left-to-right), not [aa,a,a]."""
    got, want = run_both(
        spark,
        ["aaaa aaaa aaa banana banana bandana"],
        num_merges=8,
        min_freq=2,
    )
    assert got == want


def test_bpe_early_stop_when_no_pair_qualifies(spark):
    """Every word unique → all pair counts 1 < min_freq → zero merges
    (and a fixed-round oracle replay is all no-ops)."""
    got, want = run_both(spark, ["ab cd ef gh"], min_freq=2)
    assert got == want == []


def test_bpe_fully_merged_word(spark):
    """A word whose symbols all merge into one token must not blow up
    the next round's pair extraction (single-token symbol string)."""
    got, want = run_both(spark, ["ab ab ab ab ab ab"], num_merges=4)
    assert got == want
    # merges exhaust once 'ab</w>' is a single symbol: 2 real merges
    assert [m[3] for m in got] == ["ab", f"ab{END_OF_WORD}"]


def test_bpe_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in bpe_merge_table(docs, num_merges=6).orderBy("rank").collect()
    ]
    want = ref_bpe(word_freqs_of(texts), 6, 2)
    assert got == want


def test_bpe_segment_counts(spark):
    docs = spark.createDataFrame(
        [(1, "low low"), (2, "lowest"), (3, "low lower")],
        "doc_id int, text string",
    )
    merges = bpe_merge_table(docs, num_merges=3, min_freq=2)
    seg = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment(docs, merges).collect()
    }
    # replay by hand: merges are (l,o)->lo, (lo,w)->low, (low,</w>)
    # 'low' -> [low</w>] = 1 token; 'lowest' -> [low,e,s,t,</w>] = 5;
    # 'lower' -> [low,e,r,</w>] = 4
    assert seg == {1: 2, 2: 5, 3: 5}
