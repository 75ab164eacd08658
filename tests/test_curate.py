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


def test_cut_spans_operator(spark):
    """Envelope cut: tokens [a, b] removed, outside kept verbatim,
    n_tokens recomputed; docs without a span row pass through; whole-doc
    spans yield empty text. DuckDB mirrors the slice arithmetic exactly."""
    import duckdb

    from weather_data_warehouse_aws_spark.operators.dedup import cut_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", 6),
            (2, "p q r s", 4),
            (3, "x y z", 3),
        ],
        "doc_id int, text string, n_tokens int",
    )
    spans = spark.createDataFrame(
        [(1, 2, 4), (3, 1, 3)], "doc_id int, span_start int, span_end int"
    )
    out = {r.doc_id: (r.text, r.n_tokens) for r in cut_spans(docs, spans).collect()}
    assert out[1] == ("a e f", 3)      # middle cut
    assert out[2] == ("p q r s", 4)    # untouched
    assert out[3] == ("", 0)           # whole doc cut

    # DuckDB differential for the same arithmetic (1-based inclusive)
    con = duckdb.connect()
    got = con.execute(r"""
        WITH d(doc_id, text, a, b) AS (VALUES (1, 'a b c d e f', 2, 4), (3, 'x y z', 1, 3)),
        t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks, a, b FROM d)
        SELECT doc_id, list_aggregate(toks[1:a-1] || toks[b+1:], 'string_agg', ' ')
        FROM t ORDER BY doc_id
    """).fetchall()
    assert (got[0][1] or "") == out[1][0] and (got[1][1] or "") == out[3][0]


def test_salvage_cuts_instead_of_dropping(spark):
    """A doc whose contamination is a small leading slice (coverage under
    the threshold) must survive with the envelope cut and a clean
    re-probe; heavy contamination still drops; splits/packs see the
    recomputed token counts."""
    from weather_data_warehouse_aws_spark.pipeline.curate import (
        CurationConfig,
        curate_corpus,
    )

    rows = []
    for i in range(1, 9):
        rows.append((i, " ".join(f"w{i}{c}" for c in "abcdefghijklmnop"), "en"))
    # doc 50: 5-token leaked prefix + 15 unique tokens (coverage 5/20=0.25)
    leak = "s1 s2 s3 s4 s5"
    rows.append((50, leak + " " + " ".join(f"u{c}" for c in "abcdefghijklmno"), "en"))
    # doc 60: fully leaked (coverage 1.0) — must drop
    rows.append((60, "t1 t2 t3 t4 t5 t6", "en"))
    corpus = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    ev = spark.createDataFrame(
        [(9001, leak), (9002, "t1 t2 t3 t4 t5 t6")], ["doc_id", "text"]
    )
    cfg = CurationConfig(
        min_tokens=5, max_tokens=50, pack_budget=8, pack_shards=2,
        split_weights=(1.0,), split_labels=("train",),
        salvage_max_coverage=0.5,
    )
    out = curate_corpus(corpus, eval_docs=ev, config=cfg)
    salv = {r.doc_id: r for r in out["salvaged"].collect()}
    dec_ids = {r.doc_id for r in out["decontaminated"].select("doc_id").collect()}
    assert 50 in salv and 50 in dec_ids
    assert 60 not in dec_ids
    assert salv[50].n_tokens == 15
    assert not salv[50].text.startswith("s1")
    assert "u" in salv[50].text  # unique tail kept
    # salvaged doc flows into the split/pack with its new token count
    assert 50 in {r.doc_id for r in out["split"].collect()}
    # without the knob: both drop (baseline behavior unchanged)
    base = curate_corpus(
        corpus, eval_docs=ev,
        config=CurationConfig(
            min_tokens=5, max_tokens=50, pack_budget=8, pack_shards=2,
            split_weights=(1.0,), split_labels=("train",),
        ),
    )
    base_ids = {r.doc_id for r in base["decontaminated"].select("doc_id").collect()}
    assert 50 not in base_ids and 60 not in base_ids
    assert base["salvaged"].count() == 0


def test_salvage_reprobe_rejects_splice_leak(spark):
    """The cut splices tokens across the removed span; if the splice
    itself recreates an eval n-gram the doc must STILL be dropped (the
    verified-salvage re-probe, not just the cut, decides survival)."""
    from weather_data_warehouse_aws_spark.pipeline.curate import (
        CurationConfig,
        curate_corpus,
    )

    # doc: g1 g2 [LEAK: m1..m5] g3 g4 g5 — cutting m1..m5 splices
    # 'g1 g2 g3 g4 g5', which is EXACTLY an eval doc's 5-gram.
    rows = [(1, "g1 g2 m1 m2 m3 m4 m5 g3 g4 g5", "en")]
    for i in range(2, 8):
        rows.append((i, " ".join(f"w{i}{c}" for c in "abcdefghij"), "en"))
    corpus = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    ev = spark.createDataFrame(
        [(9001, "m1 m2 m3 m4 m5"), (9002, "g1 g2 g3 g4 g5")],
        ["doc_id", "text"],
    )
    cfg = CurationConfig(
        min_tokens=3, max_tokens=50, pack_budget=8, pack_shards=2,
        split_weights=(1.0,), split_labels=("train",),
        salvage_max_coverage=0.9,
    )
    out = curate_corpus(corpus, eval_docs=ev, config=cfg)
    dec_ids = {r.doc_id for r in out["decontaminated"].select("doc_id").collect()}
    assert 1 not in dec_ids, "splice-created leak survived the re-probe"


def test_provenance_covers_every_doc_exactly_once(stages, spark):
    """curation_provenance: one disposition row per cleaned doc, matching
    the known fates of the planted corpus."""
    from weather_data_warehouse_aws_spark.pipeline.curate import (
        curation_provenance,
    )

    prov = curation_provenance(stages).collect()
    by_doc = {}
    for r in prov:
        assert r.doc_id not in by_doc, f"doc {r.doc_id} has two rows"
        by_doc[r.doc_id] = (r.disposition, r.detail)
    n_cleaned = stages["cleaned"].count()
    assert len(by_doc) == n_cleaned
    assert by_doc[200][0] == "quarantined" and "tokens" in by_doc[200][1].lower() or by_doc[200][0] == "quarantined"
    assert by_doc[100][0] == "dup_loser" and "cluster=1" in by_doc[100][1]
    assert by_doc[101][0] == "dup_loser"
    assert by_doc[4] == ("contaminated", "dropped")
    assert by_doc[5][0] == "kept" and by_doc[5][1] == "train"


def test_provenance_labels_salvaged_docs(spark):
    from weather_data_warehouse_aws_spark.pipeline.curate import (
        CurationConfig,
        curate_corpus,
        curation_provenance,
    )

    rows = [(i, " ".join(f"w{i}{c}" for c in "abcdefghijklmnop"), "en") for i in range(1, 9)]
    leak = "s1 s2 s3 s4 s5"
    rows.append((50, leak + " " + " ".join(f"u{c}" for c in "abcdefghijklmno"), "en"))
    corpus = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    ev = spark.createDataFrame([(9001, leak)], ["doc_id", "text"])
    out = curate_corpus(
        corpus, eval_docs=ev,
        config=CurationConfig(
            min_tokens=5, max_tokens=50, pack_budget=8, pack_shards=2,
            split_weights=(1.0,), split_labels=("train",),
            salvage_max_coverage=0.5,
        ),
    )
    prov = {r.doc_id: (r.disposition, r.detail) for r in curation_provenance(out).collect()}
    assert prov[50] == ("contaminated", "salvaged")
    assert sum(1 for d, _ in prov.values() if d == "kept") == 8


def test_fuzz_cut_spans_matches_python_reference(spark):
    """cut_spans ≡ the obvious Python slice for arbitrary docs and spans
    (1-based inclusive, clamped), including empty remainders."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from weather_data_warehouse_aws_spark.operators.dedup import cut_spans

    toks_st = st.lists(
        st.sampled_from(["a", "bb", "c1", "dd", "e"]), min_size=1, max_size=12
    )

    @given(toks=toks_st, a=st.integers(1, 12), width=st.integers(0, 12))
    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
        ],
    )
    def run(toks, a, width):
        n = len(toks)
        a2 = min(a, n)
        b = min(a2 + width, n)
        df = spark.createDataFrame(
            [(1, " ".join(toks), n)], "doc_id int, text string, n_tokens int"
        )
        spans = spark.createDataFrame(
            [(1, a2, b)], "doc_id int, span_start int, span_end int"
        )
        r = cut_spans(df, spans).first()
        expect = toks[: a2 - 1] + toks[b:]
        assert r.text == " ".join(expect)
        assert r.n_tokens == len(expect)

    run()


def test_provenance_mixed_out_respects_custom_train_label(spark):
    """The mixed-out detail must key off the PIPELINE's train label, not a
    hardcoded "train" — under custom split labels a budget-excluded doc
    still reads mixed-out."""
    from weather_data_warehouse_aws_spark.pipeline.curate import (
        curation_provenance,
    )

    corpus = _corpus(spark)
    budgets = spark.createDataFrame([("en", 15), ("de", 15)], ["lang", "budget"])
    cfg = CurationConfig(
        min_tokens=5, max_tokens=50, neardup_threshold=0.5,
        pack_budget=8, pack_shards=2,
        split_weights=(1.0,), split_labels=("t",),
    )
    out = curate_corpus(corpus, budgets=budgets, config=cfg)
    prov = {
        r.doc_id: (r.disposition, r.detail)
        for r in curation_provenance(out, train_label="t").collect()
    }
    kept_details = {d for disp, d in prov.values() if disp == "kept"}
    # 15-token budgets over ~10-token docs keep one doc per lang; the rest
    # of the split must surface as mixed-out, never as the bare label
    assert kept_details == {"t", "mixed-out"}
    n_mixed = sum(1 for disp, d in prov.values() if d == "mixed-out")
    n_in = out["mixed"].count()
    n_split = out["split"].count()
    assert n_mixed == n_split - n_in > 0
    spark.catalog.clearCache()


def test_release_curation_empties_cache_manager(spark):
    """Cache-ownership contract: curate_corpus pins its fan-out boundaries;
    release_curation(stages) unpersists exactly this run's plans — the
    CacheManager ends empty without nuking a shared session's caches."""
    from weather_data_warehouse_aws_spark.pipeline.curate import release_curation

    spark.catalog.clearCache()  # start from a clean manager
    corpus = _corpus(spark)
    out = curate_corpus(corpus, eval_docs=_eval_set(spark, corpus), config=CFG)
    assert out["packed"].count() >= 0  # consume the pipeline
    mgr = spark._jsparkSession.sharedState().cacheManager()
    assert not mgr.isEmpty(), "fan-out boundaries should be pinned while in use"
    release_curation(out)
    assert mgr.isEmpty(), "release_curation must drop every pinned plan"
    release_curation(out)  # idempotent
