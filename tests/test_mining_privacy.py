"""Hard-negative mining, temperature mixture budgets, k-anonymity audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.pairing import hard_negatives
from weather_data_warehouse_aws_spark.operators.quality import k_anonymity
from weather_data_warehouse_aws_spark.operators.sampling import (
    temperature_budgets,
    token_budget_sample,
)
from weather_data_warehouse_aws_spark.sources.tables import load_table


def test_hard_negatives_exclude_same_label_and_rank_by_similarity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = hard_negatives(emb, k=3, candidates=20).collect()
    assert len(out) > 0
    by_anchor: dict[int, list] = {}
    for r in out:
        assert labels[r.anchor_id] != labels[r.negative_id], "same-label negative"
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for rows in by_anchor.values():
        rows.sort(key=lambda r: r.neg_rank)
        assert len(rows) <= 3
        cs = [r.cos for r in rows]
        assert cs == sorted(cs, reverse=True), "negatives not similarity-ranked"


def test_temperature_budgets_flatten_mixture(spark):
    """α < 1 must up-weight small domains: the small group's budget share
    exceeds its token share; α = 1 reproduces proportional shares; budgets
    plug into token_budget_sample unchanged."""
    rows = [(i, "big", 100) for i in range(90)] + [(i + 1000, "small", 100) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "tokens"])
    b_half = {r.source: r.budget for r in temperature_budgets(df, "source", "tokens", alpha=0.5, total_budget=1000).collect()}
    b_one = {r.source: r.budget for r in temperature_budgets(df, "source", "tokens", alpha=1.0, total_budget=1000).collect()}
    assert b_one["small"] in (99, 100)  # proportional: 10%
    assert b_half["small"] > 200  # sqrt scaling: 3000/(3000+9000)=0.25
    assert b_half["big"] + b_half["small"] <= 1000
    kept = token_budget_sample(
        df, "source", "doc_id", "tokens",
        temperature_budgets(df, "source", "tokens", alpha=0.5, total_budget=1000),
    )
    per = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["small"] >= 2 and per["big"] >= per["small"]


def test_k_anonymity_flags_small_groups(spark):
    rows = (
        [("US", 1980, i) for i in range(10)]
        + [("FR", 1990, i) for i in range(3)]
        + [("NZ", 2001, 99)]
    )
    df = spark.createDataFrame(rows, ["country", "birth_year", "uid"])
    got = {
        (r.country, r.birth_year): (r.group_size, r.is_k_anonymous)
        for r in k_anonymity(df, ["country", "birth_year"], k=5).collect()
    }
    assert got[("US", 1980)] == (10, True)
    assert got[("FR", 1990)] == (3, False)
    assert got[("NZ", 2001)] == (1, False)
