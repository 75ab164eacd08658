"""Distributed BPE training: hand-verified merges on the classic corpus."""

from __future__ import annotations

from weather_data_warehouse_aws_spark.operators.bpe import (
    SEP,
    bpe_train,
    merge_pair,
    pair_counts,
    word_symbols,
)


def _corpus(spark):
    # Sennrich-style toy corpus: 'low'x5 'lower'x2 'newest'x6 'widest'x3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_pair_counts_hand_verified(spark):
    syms = word_symbols(_corpus(spark), "doc_id", "text")
    got = {(r.a, r.b): r.n_pairs for r in pair_counts(syms).collect()}
    # 'es' appears in newest(6) + widest(3) = 9; 'lo' in low(5) + lower(2) = 7
    assert got[("e", "s")] == 9
    assert got[("s", "t")] == 9
    assert got[("l", "o")] == 7
    assert got[("t", SEP)] == 9


def test_bpe_train_learns_expected_merges(spark):
    merges, syms = bpe_train(_corpus(spark), "doc_id", "text", n_merges=4)
    learned = [(a, b) for a, b, _ in merges]
    # first merge must be a count-9 pair; with lexicographic tie-break over
    # {('e','s'), ('s','t'), ('t',SEP)} the order is deterministic:
    assert learned[0] == ("e", "s")
    assert learned[1] == ("es", "t")
    assert learned[2] == ("est", SEP)
    assert learned[3] == ("l", "o")
    # after the merges, 'newest' tokenizes as n-e-w-est▁
    rows = {r.word: r.syms for r in syms.collect()}
    assert rows["newest"] == ["n", "e", "w", f"est{SEP}"]
    assert rows["low"] == ["lo", "w", SEP]


def test_merge_pair_leftmost_greedy_nonoverlapping(spark):
    """'aaa' under merge (a,a) must become (aa, a) — leftmost greedy, no
    overlap — the standard BPE application order."""
    df = spark.createDataFrame([(1, "aaa")], ["doc_id", "text"])
    syms = merge_pair(word_symbols(df, "doc_id", "text"), "a", "a")
    got = syms.collect()[0].syms
    assert got == ["aa", "a", SEP]


def test_merge_pair_escapes_backslash_and_quote(spark):
    """Symbols containing backslashes or quotes must splice into the merge
    expression as valid SQL literals (ADVICE: escape backslashes BEFORE
    quotes)."""
    from weather_data_warehouse_aws_spark.operators.bpe import merge_pair

    df = spark.createDataFrame(
        [("w1", 1, ["\\", "'", "x"]), ("w2", 1, ["'", "\\", "x"])],
        "word string, n long, syms array<string>",
    )
    out = {r.word: r.syms for r in merge_pair(df, "\\", "'").collect()}
    assert out["w1"] == ["\\'", "x"]  # adjacent (\, ') merged
    assert out["w2"] == ["'", "\\", "x"]  # reversed order untouched
