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
