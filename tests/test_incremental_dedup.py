"""incremental_minhash_pairs (operators/dedup.py): the union of pairs
emitted over any batch sequence must equal the one-shot full-corpus
minhash_lsh_pairs — same signatures, same banding, no pair emitted twice.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.dedup import (
    incremental_minhash_pairs,
    minhash_lsh_pairs,
)
from weather_data_warehouse_aws_spark.queries.dedup import (
    SHINGLE_N,
    planted_documents,
)

_KW = dict(k=16, bands=4, shingle_n=SHINGLE_N, threshold=0.5)


def _pairset(df):
    return {(r["id_a"], r["id_b"], r["est_jaccard"]) for r in df.collect()}


def test_two_batches_equal_one_shot(spark, sf_dir):
    corpus = planted_documents(spark, sf_dir)
    # split so planted duplicate partners often land in DIFFERENT batches
    # (originals below 1M, copies above) — the old×new path must find them
    b1 = corpus.filter(F.col("doc_id") < 1_000_000)
    b2 = corpus.filter(F.col("doc_id") >= 1_000_000)

    full = _pairset(minhash_lsh_pairs(corpus, "doc_id", "text", **_KW))

    p1, store = incremental_minhash_pairs(None, b1, "doc_id", "text", **_KW)
    s1 = _pairset(p1)
    p2, store2 = incremental_minhash_pairs(store, b2, "doc_id", "text", **_KW)
    s2 = _pairset(p2)

    assert s1 | s2 == full and full, "batched union must reproduce one-shot pairs"
    assert not (s1 & s2), "no pair may be emitted by two different runs"
    # cross-batch pairs exist by construction and only run 2 can see them
    assert any(a < 1_000_000 <= b for a, b, _ in s2)
    assert store2.count() == corpus.count()


def test_three_batch_sequence(spark, sf_dir):
    corpus = planted_documents(spark, sf_dir)
    batches = [
        corpus.filter(F.col("doc_id") % 3 == i).filter(F.col("doc_id") < 3_000_000)
        for i in range(3)
    ]
    emitted, store = set(), None
    for b in batches:
        pairs, store = incremental_minhash_pairs(store, b, "doc_id", "text", **_KW)
        got = _pairset(pairs)
        assert not (got & emitted)
        emitted |= got
    full = _pairset(
        minhash_lsh_pairs(
            corpus.filter(F.col("doc_id") < 3_000_000), "doc_id", "text", **_KW
        )
    )
    assert emitted == full


def test_empty_store_then_empty_batch(spark, sf_dir):
    corpus = planted_documents(spark, sf_dir).limit(0)
    pairs, store = incremental_minhash_pairs(None, corpus, "doc_id", "text", **_KW)
    assert pairs.count() == 0 and store.count() == 0


def test_leak_spans_localizes_planted_slice(spark):
    """A doc contaminated only by a known middle slice: span bounds and
    coverage must name exactly that slice."""
    from weather_data_warehouse_aws_spark.operators.dedup import (
        leak_spans,
        shingle_table,
    )

    train_txt = " ".join(f"w{i}" for i in range(1, 21))            # w1..w20
    eval_txt = "x1 x2 x3 " + " ".join(f"w{i}" for i in range(5, 13)) + " y1 y2"
    train = spark.createDataFrame([(1, train_txt)], "doc_id long, text string")
    ev = spark.createDataFrame([(10, eval_txt)], "doc_id long, text string")

    t_sh = shingle_table(train, "doc_id", "text", 5).select("sh").distinct()
    e_sh = shingle_table(ev, "doc_id", "text", 5)
    leaked = e_sh.join(t_sh, "sh").select("doc_id", "sh").distinct()

    row = leak_spans(ev, leaked, 5).collect()[0]
    # eval tokens: 1-3 = x's, 4-11 = w5..w12, 12-13 = y's
    # leaked 5-grams start at positions 4..7 (w5-w9 .. w8-w12)
    assert row["span_start"] == 4
    assert row["span_end"] == 11
    assert row["n_covered_tokens"] == 8


def test_leak_spans_overlaps_do_not_double_count(spark):
    """Two disjoint leaked regions: coverage sums regions, span brackets
    both, and overlapping shingles inside a region count each token once."""
    from weather_data_warehouse_aws_spark.operators.dedup import (
        leak_spans,
        shingle_table,
    )

    a = " ".join(f"a{i}" for i in range(1, 7))    # 6 tokens
    b = " ".join(f"b{i}" for i in range(1, 7))
    train = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    ev_txt = a + " m1 m2 m3 " + b                 # 6 + 3 + 6 = 15 tokens
    ev = spark.createDataFrame([(10, ev_txt)], "doc_id long, text string")

    t_sh = shingle_table(train, "doc_id", "text", 5).select("sh").distinct()
    leaked = (
        shingle_table(ev, "doc_id", "text", 5)
        .join(t_sh, "sh").select("doc_id", "sh").distinct()
    )
    row = leak_spans(ev, leaked, 5).collect()[0]
    assert row["span_start"] == 1 and row["span_end"] == 15
    assert row["n_covered_tokens"] == 12          # both 6-token regions, m's clean
