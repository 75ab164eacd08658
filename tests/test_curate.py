"""End-to-end corpus-curation pipeline (pipeline/curate.py): a planted
corpus with one of everything — markup, PII, a short doc, an exact dup, a
near dup, and an eval-set leak — must come out the other end clean, deduped,
decontaminated, split, budgeted, and packed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.pipeline.curate import (
    CurationConfig,
    clean_documents,
    curate_corpus,
    curation_audit,
)

CFG = CurationConfig(
    min_tokens=5,
    max_tokens=50,
    neardup_threshold=0.5,
    pack_budget=8,
    pack_shards=2,
    split_weights=(1.0,),
    split_labels=("train",),
)


def _corpus(spark):
    rows = []
    for i in range(1, 13):
        lang = "en" if i % 2 else "de"
        # 10 tokens, all doc-unique, so unrelated docs share zero shingles
        rows.append((i, " ".join(f"w{i}{c}" for c in "abcdefghij"), lang))
    rows.append((100, rows[0][1], "en"))  # exact dup of doc 1
    rows.append((101, rows[1][1] + " ztail", "de"))  # near dup of doc 2
    rows.append((200, "too short", "en"))  # quarantined: < 5 tokens
    rows.append(
        (300, "<p>write to bob@example.com for the full report today</p>", "en")
    )  # markup + PII
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def _eval_set(spark, corpus):
    # eval doc shares doc 4's text verbatim -> doc 4 is contaminated
    return corpus.filter(F.col("doc_id") == 4).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text"
    )


@pytest.fixture(scope="module")
def stages(spark):
    corpus = _corpus(spark)
    out = curate_corpus(
        corpus, eval_docs=_eval_set(spark, corpus), config=CFG
    )
    yield out
    spark.catalog.clearCache()


def test_clean_strips_markup_and_redacts_pii(spark):
    cleaned = clean_documents(_corpus(spark), "doc_id", "text")
    row = cleaned.filter(F.col("doc_id") == 300).first()
    assert "<p>" not in row.text and "</p>" not in row.text
    assert "bob@example.com" not in row.text and "<EMAIL>" in row.text
    assert row.raw_text.startswith("<p>")  # original retained for audit
    assert row.lang == "en"  # passthrough column survives


def test_quality_gate_quarantines_short_doc(stages):
    bad = {r.doc_id for r in stages["quarantined"].select("doc_id").collect()}
    assert bad == {200}
    metrics = {r.rule: r.n_violations for r in stages["dq_metrics"].collect()}
    assert metrics["in_range_n_tokens"] == 1
    assert metrics["not_null_text"] == 0
    assert metrics["_rows"] == 16


def test_dedup_keeps_canonical_only(stages):
    surv = {r.doc_id for r in stages["survivors"].select("doc_id").collect()}
    assert 1 in surv and 100 not in surv  # exact dup dropped, lowest id kept
    assert 2 in surv and 101 not in surv  # near dup dropped
    pairs = {(r.id_a, r.id_b) for r in stages["dup_pairs"].collect()}
    assert (1, 100) in pairs and (2, 101) in pairs


def test_decontamination_drops_eval_overlap(stages):
    out = {r.doc_id for r in stages["decontaminated"].select("doc_id").collect()}
    assert 4 not in out  # shares every shingle with the eval doc
    assert 5 in out and 3 in out


def test_split_labels_and_determinism(stages, spark):
    splits = stages["split"].select("doc_id", "split").collect()
    assert splits and all(r.split == "train" for r in splits)
    corpus = _corpus(spark)
    again = curate_corpus(corpus, eval_docs=_eval_set(spark, corpus), config=CFG)
    a = sorted((r.doc_id, r.split) for r in splits)
    b = sorted((r.doc_id, r.split) for r in again["split"].select("doc_id", "split").collect())
    assert a == b
    spark.catalog.clearCache()


def test_token_budget_mixture(spark):
    corpus = _corpus(spark)
    budgets = spark.createDataFrame([("en", 15), ("de", 25)], ["lang", "budget"])
    out = curate_corpus(corpus, budgets=budgets, config=CFG)
    mixed = out["mixed"].groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    caps = {"en": 15, "de": 25}
    for r in mixed:
        assert r.t <= caps[r.lang]
    spark.catalog.clearCache()


def test_packing_exact_budgets(stages):
    packed = stages["packed"]
    per_pack = (
        packed.groupBy("shard_id", "pack_id")
        .agg(F.sum("seg_len").alias("tok"))
        .collect()
    )
    last = {}
    for r in per_pack:
        last[r.shard_id] = max(last.get(r.shard_id, -1), r.pack_id)
    for r in per_pack:
        if r.pack_id < last[r.shard_id]:
            assert r.tok == CFG.pack_budget
        else:
            assert 0 < r.tok <= CFG.pack_budget
    total_packed = sum(r.tok for r in per_pack)
    total_mixed = stages["mixed"].agg(F.sum("n_tokens")).first()[0]
    assert total_packed == total_mixed  # packing conserves every token


def test_audit_funnel_monotone(stages):
    audit = {r.stage: (r.n_docs, r.n_tokens) for r in curation_audit(stages).collect()}
    assert audit["cleaned"][0] == 16
    assert audit["passed"][0] == 15  # short doc quarantined
    assert audit["survivors"][0] == 13  # two dup losers dropped
    assert audit["decontaminated"][0] == 12  # eval leak dropped
    assert audit["decontaminated"][1] == audit["mixed"][1]  # no budgets -> same tokens
    assert audit["packed"][1] == audit["mixed"][1]


def test_curation_with_gopher_rules(spark):
    """CurationConfig.extra_rules accepts the packaged Gopher rule set:
    stopword-free docs quarantine with the gopher tag, normal curation
    stages still compose."""
    from weather_data_warehouse_aws_spark.operators.quality import gopher_rules
    from weather_data_warehouse_aws_spark.pipeline.curate import (
        CurationConfig,
        curate_corpus,
    )

    good = "the data of the lake and the stream that we have with " + " ".join(
        f"tok{i}" for i in range(60)
    )
    nostops = " ".join(f"zz{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(1, good), (2, nostops)], "doc_id long, text string"
    )
    cfg = CurationConfig(extra_rules=tuple(gopher_rules()))
    stages = curate_corpus(docs, config=cfg)
    passed = {r.doc_id for r in stages["passed"].collect()}
    quarantined = {r.doc_id for r in stages["quarantined"].collect()}
    assert 1 in passed and 2 in quarantined
    tags = stages["quarantined"].filter("doc_id = 2").first()["dq_violations"]
    assert any("gopher" in t for t in tags)
