"""Distributed BPE (byte-pair encoding) tokenizer training prep — the
standard subword-vocabulary algorithm (Sennrich et al. 2016), in the
canonical distributed shape: the DRIVER holds only the merge table (KB) and
each training step is ONE distributed pass (pair-count aggregate + argmax +
map-side merge), exactly the Lloyd-iteration pattern in
operators/similarity.py.

Scale accounting per merge step: symbols explode to adjacent pairs (≤ one
pair per symbol), groupBy(pair) count is map-side combined (vocab-sized
result), the winning pair broadcasts back as a literal in the merge
expression — the corpus shuffles ZERO times; only pair counts move. The
classic single-machine BPE walks a heap over the whole corpus; at 100 TB
the corpus cannot sit in one heap, and this count→argmax→rewrite loop is
how production tokenizer pipelines train instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "▁"  # ▁ end-of-word sentinel, as in SentencePiece


def word_symbols(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(word, n, syms): corpus word frequencies with each word split into
    initial character symbols + end-of-word sentinel. Aggregating to the
    word level FIRST is the classic BPE-training compression: every later
    pass works on |vocab| rows, not |corpus| rows."""
    words = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count("*").alias("n"))
    return counts.withColumn(
        "syms",
        F.expr(f"concat(split(word, ''), array('{SEP}'))"),
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """(a, b, n_pairs): corpus-weighted counts of adjacent symbol pairs."""
    pairs = symbols.select(
        "n",
        F.explode(
            F.expr(
                "zip_with(slice(syms, 1, size(syms) - 1), "
                "slice(syms, 2, size(syms) - 1), (a, b) -> struct(a, b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("n").alias("n_pairs")
    )


def merge_pair(symbols: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) with the merged symbol — a leftmost-
    greedy fold over each word's symbol array, pure HOF (no Python)."""
    # backslashes must be escaped BEFORE quotes, or a symbol containing a
    # backslash splices a malformed SQL string literal into the expression
    esc = lambda s: s.replace("\\", "\\\\").replace("'", "\\'")  # noqa: E731
    a_l, b_l = esc(a), esc(b)
    merged = f"'{a_l}' || '{b_l}'"
    return symbols.withColumn(
        "syms",
        F.expr(
            f"""aggregate(
                syms,
                CAST(array() AS ARRAY<STRING>),
                (acc, x) -> CASE
                    WHEN size(acc) > 0
                         AND element_at(acc, -1) = '{a_l}'
                         AND x = '{b_l}'
                    THEN concat(slice(acc, 1, size(acc) - 1), array({merged}))
                    ELSE concat(acc, array(x))
                END
            )"""
        ),
    )


def bpe_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_merges: int = 10,
    vocab_partitions: int | None = None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn `n_merges` BPE merges. Returns (merge table [(a, b, count)...],
    final symbolized vocabulary). Ties on count break lexicographically on
    (a, b) so training is deterministic under any partitioning.

    `vocab_partitions` bounds the partition count of the word-frequency
    table the merge loop iterates over. The word-level compression makes
    that table orders of magnitude smaller than the corpus (a 100 TB corpus
    has a ~10⁷-row vocabulary), so after the one corpus-sized groupBy the
    loop's 2·n_merges micro-jobs should run on vocabulary-sized
    parallelism — leaving it at the corpus's shuffle partitioning makes
    every iteration pay full scheduling fan-out for near-empty tasks."""
    syms = word_symbols(df, id_col, text_col)
    if vocab_partitions is not None:
        # repartition, NOT coalesce: coalesce would propagate below the
        # corpus-sized groupBy inside word_symbols and collapse its reduce
        # stage to `vocab_partitions` tasks — the one big aggregation must
        # keep full parallelism. The repartition shuffle moves only the
        # (tiny) vocabulary table once, before the 2·n_merges micro-jobs.
        syms = syms.repartition(int(vocab_partitions))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(syms)
            .orderBy(F.col("n_pairs").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0].a, top[0].b, top[0].n_pairs
        merges.append((a, b, n))
        syms = merge_pair(syms, a, b)
        # keep the lineage shallow across iterations (plan depth O(1))
        syms = syms.localCheckpoint(eager=False)
    return merges, syms


# ---------------------------------------------------------------------------
# Encoding (applying a learned merge table to new text) — the inference half
# of the tokenizer. Training runs once; encoding runs on every corpus pass,
# so this is the path that actually sees 100 TB.
# ---------------------------------------------------------------------------


def encode_words(words: DataFrame, merges: list[tuple]) -> DataFrame:
    """Tokenize each distinct `word`: chars + sentinel, then every merge
    applied IN TRAINING ORDER with the same leftmost-greedy HOF fold
    training used (`merge_pair`) — so encoding the training corpus
    reproduces `bpe_train`'s final symbol table exactly (unit-asserted).

    Adds a `toks array<string>` column. Pure JVM expressions, but the plan
    nests one `aggregate(...)` per merge — depth O(|merges|), fine for
    demo-scale tables, hostile to codegen at production vocab size (32k
    merges). Use `encode_words_long` there; on any table `bpe_train` can
    produce, the two agree exactly (see its docstring for why)."""
    out = words.withColumn(
        "syms", F.expr(f"concat(split(word, ''), array('{SEP}'))")
    )
    for a, b, *_ in merges:
        out = merge_pair(out, a, b)
    return out.withColumnRenamed("syms", "toks")


def _encode_word(word: str, pairs: list[tuple[str, str]], ranks: dict) -> list[str]:
    """Rank-greedy BPE encode of one word (the canonical tokenizer-runtime
    algorithm): repeatedly merge ALL occurrences of the lowest-ranked
    adjacent pair present, leftmost-greedy — the in-Python mirror of one
    `merge_pair` sweep per chosen rank."""
    syms = list(word) + [SEP]
    while True:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            return syms
        a, b = pairs[best]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out


def encode_words_long(words: DataFrame, merges: list[tuple]) -> DataFrame:
    """`encode_words` for production-size merge tables: one Arrow-batched
    pass, rank-greedy per word (constant plan size; the merge table ships
    once per executor as a Spark broadcast, not per task in the closure).

    Equivalence to the sequential HOF path: on a merge table PRODUCED BY
    TRAINING, a merged symbol's constituents were necessarily created by
    EARLIER merges, so any pair a merge creates has a HIGHER rank than the
    merge that created it — the lowest applicable rank never decreases,
    rank-greedy therefore fires merges in training order, and each fires
    with the same merge-all leftmost-greedy sweep. On an arbitrary
    hand-built table that invariant can be violated (a low-ranked pair
    whose members only exist after a higher-ranked merge), and the two
    paths legitimately differ — property-tested only over trained tables."""
    from pyspark.sql.types import ArrayType, StringType

    pairs = [(a, b) for a, b, *_ in merges]
    sc = words.sparkSession.sparkContext
    bc = sc.broadcast((pairs, {p: i for i, p in enumerate(pairs)}))

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        pairs_l, ranks = bc.value
        return s.map(lambda w: _encode_word(w, pairs_l, ranks))

    return words.withColumn("toks", _enc(F.col("word")))


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple],
    *,
    impl: str = "hof",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(id, tokens): BPE-tokenize each document with a learned merge table.

    Same normalization as training (`word_symbols`: lower/trim/ws-split),
    then the word-level compression in reverse: encode each DISTINCT word
    once (`impl`: "hof" = sequential JVM fold, "long" = rank-greedy Arrow
    pass), join the word→toks table back to the positioned word stream,
    and reassemble per document in word order. The corpus itself is never
    run through the merge loop — only its vocabulary is, so the expensive
    step is |vocab|-sized regardless of corpus size.

    `broadcast_vocab` (default) broadcasts the word→toks table so the
    corpus-sized side never shuffles — right whenever the vocabulary fits
    an executor (a 10⁷-word vocab with short token arrays is ~GB; flip it
    off past that and the join shuffles on `word`). Documents with no
    words (empty/whitespace text) keep an empty tokens array."""
    if impl not in ("hof", "long"):
        raise ValueError(f"impl must be 'hof' or 'long', got {impl!r}")
    words = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
    )
    vocab = words.select("word").distinct()
    enc = encode_words(vocab, merges) if impl == "hof" else encode_words_long(
        vocab, merges
    )
    if broadcast_vocab:
        enc = F.broadcast(enc)
    per_doc = (
        words.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                    lambda s: s["toks"],
                )
            ).alias("tokens")
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .withColumn(
            "tokens",
            F.coalesce("tokens", F.expr("CAST(array() AS ARRAY<STRING>)")),
        )
    )
