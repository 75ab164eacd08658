"""TF-IDF / BM25 relevance operators (operators/relevance.py).

Registry parity is covered by test_registry_oracle[text_relevance]; these
units pin the math against hand-computed values and the plan against the
broadcast-everything-small shape.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.relevance import bm25, tf_idf
from weather_data_warehouse_aws_spark.plans.inspect import physical_plan

K1, B = 1.2, 0.75


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )


def test_tf_idf_hand_computed(spark):
    rows = tf_idf(_docs(spark), "doc_id", "text").collect()
    by_key = {(r["doc_id"], r["tok"]): r for r in rows}
    # apple: tf=2 in doc 1, df=1, N=3  →  tfidf = 2·ln(3)
    r = by_key[(1, "apple")]
    assert r["tf"] == 2
    assert abs(r["tfidf"] - 2 * math.log(3.0)) < 1e-12
    # banana: df=2 → ln(1.5); cherry in doc 3: tf=3, df=2
    assert abs(by_key[(2, "banana")]["tfidf"] - math.log(1.5)) < 1e-12
    assert abs(by_key[(3, "cherry")]["tfidf"] - 3 * math.log(1.5)) < 1e-12


def test_bm25_hand_computed(spark):
    out = bm25(_docs(spark), "doc_id", "text", ["cherry"], k1=K1, b=B).collect()
    scores = {r["doc_id"]: r["score"] for r in out}
    assert set(scores) == {2, 3}  # doc 1 has no query term
    # N=3, df(cherry)=2, dl = {1:3, 2:2, 3:4}, avgdl = 3
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))

    def s(tf, dl):
        return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / 3.0))

    assert abs(scores[2] - s(1, 2)) < 1e-12
    assert abs(scores[3] - s(3, 4)) < 1e-12
    # longer doc with more hits outranks the short single-hit doc here
    assert scores[3] > scores[2]


def test_bm25_multi_term_sums(spark):
    both = bm25(_docs(spark), "doc_id", "text", ["apple", "banana"]).collect()
    by_id = {r["doc_id"]: r for r in both}
    assert by_id[1]["n_hit_terms"] == 2  # apple + banana
    assert by_id[2]["n_hit_terms"] == 1
    only_a = {
        r["doc_id"]: r["score"]
        for r in bm25(_docs(spark), "doc_id", "text", ["apple"]).collect()
    }
    only_b = {
        r["doc_id"]: r["score"]
        for r in bm25(_docs(spark), "doc_id", "text", ["banana"]).collect()
    }
    assert abs(by_id[1]["score"] - (only_a[1] + only_b[1])) < 1e-12


def test_bm25_plan_broadcasts_small_sides(spark, sf_dir):
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = physical_plan(bm25(docs, "doc_id", "text", ["join", "spark"]))
    # query terms, per-term df, and the 1-row stats all broadcast; the only
    # sort-merge-eligible join keys are doc-sized, and none should SMJ here
    assert plan.count("BroadcastExchange") >= 3
    assert "CartesianProduct" not in plan  # 1-row cross join is BNLJ


# ---------------------------------------------------------------------------
# hashed-feature linear quality classifier
# ---------------------------------------------------------------------------
def test_quality_scores_trained_weights_discriminate(spark):
    """With a trained (bucket, weight) relation, docs containing the scored
    feature must separate from docs that don't — verifying the broadcast
    weight-join path end-to-end, missing buckets scoring 0."""
    import hashlib

    from weather_data_warehouse_aws_spark.operators.relevance import (
        QLR_BUCKETS,
        quality_scores,
    )

    def bucket_of(feat: str, salt: str = "qlr") -> int:
        h = int(hashlib.md5(f"{salt}|{feat}".encode()).hexdigest()[:15], 16)
        return h % QLR_BUCKETS

    docs = spark.createDataFrame(
        [
            (1, "excellent prose here"),
            (2, "junk junk junk"),
            (3, "excellent analysis"),
        ],
        ["doc_id", "text"],
    )
    weights = spark.createDataFrame(
        [(bucket_of("excellent"), 500), (bucket_of("junk"), -500)],
        ["bucket", "weight"],
    )
    got = {
        r.doc_id: (r.keep, r.margin)
        for r in quality_scores(docs, "doc_id", "text", weights=weights).collect()
    }
    assert got[1][0] and got[3][0], "docs with positive feature must keep"
    assert not got[2][0], "doc with negative feature must drop"
    assert got[1][1] > 0 > got[2][1]


def test_quality_scores_margin_is_exact_integer_arithmetic(spark):
    """margin must equal w_sum/(1000·n) computed from exact integers — no
    float accumulation: verify against a Python-side recomputation."""
    import hashlib

    from weather_data_warehouse_aws_spark.operators.relevance import (
        QLR_BUCKETS,
        QLR_SCALE,
        quality_scores,
    )

    text = "alpha beta gamma alpha"
    docs = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    toks = text.lower().split()
    feats = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    w_sum = sum(
        h(f"w|{h('qlr|' + f) % QLR_BUCKETS}") % (2 * QLR_SCALE + 1) - QLR_SCALE
        for f in feats
    )
    import math

    expected = math.floor(w_sum / (QLR_SCALE * len(feats)) * 1e6) / 1e6
    row = quality_scores(docs, "doc_id", "text").collect()[0]
    assert row.n_features == len(feats)
    assert row.margin == expected
    assert row.keep == (w_sum > 0)


def test_quality_scores_plan_is_jvm_only_single_shuffle(spark, sf_dir):
    """No Python evaluation anywhere; the only corpus-sized exchange is the
    groupBy(doc_id) after the feature explode."""
    from weather_data_warehouse_aws_spark.operators.relevance import quality_scores
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = physical_plan(quality_scores(docs, "doc_id", "text"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
