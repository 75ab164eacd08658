"""BPE encoding (merge-table application): parity with training, HOF ≡
rank-greedy long path on trained tables, document reassembly order.

The reference has no tokenizer; this is part of the training-data-pipeline
track (token accounting feeds operators/sampling.py::token_budget_sample).
"""

from __future__ import annotations

from weather_data_warehouse_aws_spark.operators.bpe import (
    SEP,
    _encode_word,
    bpe_encode,
    bpe_train,
    encode_words,
    encode_words_long,
)


def _corpus(spark):
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_encode_reproduces_training_symbols(spark):
    """Encoding the training corpus's own vocabulary with the learned merge
    table must land on exactly the symbol table training finished with —
    the defining property of sequential in-training-order application."""
    corpus = _corpus(spark)
    merges, syms = bpe_train(corpus, "doc_id", "text", n_merges=4)
    trained = {r.word: r.syms for r in syms.select("word", "syms").collect()}
    vocab = spark.createDataFrame([(w,) for w in trained], "word string")
    for fn in (encode_words, encode_words_long):
        got = {r.word: r.toks for r in fn(vocab, merges).collect()}
        assert got == trained, fn.__name__


def test_hof_and_long_paths_agree_on_trained_tables(spark):
    """Rank-greedy ≡ sequential on any table bpe_train can produce (the
    created-pairs-rank-higher invariant); fuzz over random corpora."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words_st = st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    )

    @given(words=words_st, n_merges=st.sampled_from([2, 5]))
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    def run(words, n_merges):
        df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
        merges, _ = bpe_train(df, "doc_id", "text", n_merges=n_merges)
        # encode UNSEEN words too, not just the training vocab
        probe = sorted(set(words) | {"aa", "abcde", "zz", "ez"})
        vocab = spark.createDataFrame([(w,) for w in probe], "word string")
        hof = {r.word: r.toks for r in encode_words(vocab, merges).collect()}
        long = {
            r.word: r.toks for r in encode_words_long(vocab, merges).collect()
        }
        assert hof == long

    run()


def test_encode_word_rank_greedy_merge_all():
    """One chosen rank merges ALL its occurrences leftmost-greedy in a
    single sweep (mirrors merge_pair), and unknown chars pass through."""
    pairs = [("a", "a"), ("aa", "a")]
    ranks = {p: i for i, p in enumerate(pairs)}
    # 'aaaa' -> (a,a) everywhere leftmost-greedy: [aa, aa]; (aa,a) never
    # fires because the first sweep consumed the odd 'a' pairings
    assert _encode_word("aaaa", pairs, ranks) == ["aa", "aa", SEP]
    # 'aaa' -> [aa, a] then rank-1 (aa,a) fires -> [aaa]
    assert _encode_word("aaa", pairs, ranks) == ["aaa", SEP]
    assert _encode_word("zq", pairs, ranks) == ["z", "q", SEP]


def test_bpe_encode_document_order_and_empty_docs(spark):
    corpus = _corpus(spark)
    merges, _ = bpe_train(corpus, "doc_id", "text", n_merges=4)
    docs = spark.createDataFrame(
        [
            (10, "newest low"),
            (11, "  Widest  NEWEST "),  # normalization: lower + trim + ws
            (12, "   "),
            (13, None),
        ],
        "doc_id long, text string",
    )
    for impl in ("hof", "long"):
        got = {
            r.doc_id: r.tokens
            for r in bpe_encode(docs, "doc_id", "text", merges, impl=impl).collect()
        }
        assert got[10] == ["n", "e", "w", f"est{SEP}", "lo", "w", SEP]
        assert got[11] == [
            "w", "i", "d", f"est{SEP}", "n", "e", "w", f"est{SEP}",
        ]
        assert got[12] == []
        assert got[13] == []


def test_bpe_encode_repeated_word_positions(spark):
    """A word occurring at many positions must appear once per position in
    order — the distinct-vocab compression must not collapse occurrences."""
    merges = [("a", "b", 3)]
    docs = spark.createDataFrame([(1, "ab c ab")], "doc_id long, text string")
    got = bpe_encode(docs, "doc_id", "text", merges).collect()[0].tokens
    assert got == ["ab", SEP, "c", SEP, "ab", SEP]


def test_bpe_encode_rejects_unknown_impl(spark):
    import pytest

    with pytest.raises(ValueError):
        bpe_encode(_corpus(spark), "doc_id", "text", [], impl="nope")
