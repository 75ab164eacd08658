"""Count-Min sketch: one-sided guarantee, exact merge algebra, heavy
hitters, weighted builds, bounded overestimate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
)
from weather_data_warehouse_aws_spark.sources.tables import load_table


def _tokens(spark, sf_smoke_dir):
    docs = load_table(spark, sf_smoke_dir, "documents")
    return docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )


def test_estimate_never_underestimates(spark, sf_smoke_dir):
    toks = _tokens(spark, sf_smoke_dir).persist()
    sketch = cms_build(toks, "tok", width=1024, depth=5).persist()
    exact = toks.groupBy("tok").agg(F.count("*").alias("true_cnt"))
    sample = exact.orderBy(F.col("true_cnt").desc()).limit(200)
    joined = cms_estimate(sketch, sample, "tok").join(sample, "tok")
    bad = joined.filter(F.col("est") < F.col("true_cnt")).count()
    assert bad == 0  # the one-sided CMS guarantee, exhaustively


def test_overestimate_bounded(spark, sf_smoke_dir):
    """width=2048, depth=5 over a ~30k-token stream: overestimate should be
    small in absolute terms (ε·N ≈ e/2048 · N ≈ 1.3e-3·N)."""
    toks = _tokens(spark, sf_smoke_dir).persist()
    n = toks.count()
    sketch = cms_build(toks, "tok", width=2048, depth=5)
    exact = toks.groupBy("tok").agg(F.count("*").alias("true_cnt"))
    joined = cms_estimate(sketch, exact, "tok").join(exact, "tok")
    worst = joined.select(
        F.max(F.col("est") - F.col("true_cnt")).alias("m")
    ).first()["m"]
    import math

    assert worst <= max(3 * math.e / 2048 * n, 3), worst


def test_merge_equals_single_pass(spark, sf_smoke_dir):
    """Sketch(A ∪ B) must equal merge(Sketch(A), Sketch(B)) EXACTLY —
    integer sums, not approximately."""
    toks = _tokens(spark, sf_smoke_dir).withColumn(
        "half", (F.length("tok") % 2 == 0).cast("int")
    ).persist()
    a = cms_build(toks.filter("half = 0"), "tok", width=512, depth=4)
    b = cms_build(toks.filter("half = 1"), "tok", width=512, depth=4)
    merged = cms_merge(a, b)
    single = cms_build(toks, "tok", width=512, depth=4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, single.collect())
    )


def test_heavy_hitters_no_false_negatives(spark):
    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "tok string")
    sketch = cms_build(df, "tok", width=1024, depth=5)
    cands = df.distinct()
    hh = {r.tok for r in cms_heavy_hitters(sketch, cands, "tok", threshold=400).collect()}
    assert "hot" in hh
    assert len(hh) <= 10  # slack keeps false positives few at this width


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 1)], "tok string, w int"
    )
    sketch = cms_build(df, "tok", width=256, depth=4, weight_col="w")
    est = {r.tok: r.est for r in cms_estimate(sketch, df, "tok").collect()}
    assert est["a"] >= 15 and est["b"] >= 1


def test_unknown_key_small_and_empty_sketch_estimates_zero(spark):
    df = spark.createDataFrame([("x",)] * 3, "tok string")
    sketch = cms_build(df, "tok", width=256, depth=4)
    probe = spark.createDataFrame([("never-seen",)], "tok string")
    est = cms_estimate(sketch, probe, "tok").first()["est"]
    assert 0 <= est <= 3
    # empty sketch = the merge-monoid identity (a streaming job's first
    # micro-batch may legally persist one): every key estimates 0, and
    # merging it with a real sketch is a no-op
    empty = sketch.limit(0)
    est0 = cms_estimate(empty, probe, "tok").first()["est"]
    assert est0 == 0
    remerged = cms_merge(empty, sketch)
    assert sorted(map(tuple, remerged.collect())) == sorted(
        map(tuple, sketch.collect())
    )


def test_streaming_cms_matches_batch(spark, tmp_path_factory):
    """Drained streaming sketch ≡ one-shot batch sketch over the same rows
    (exact integer merge), and heavy hitters survive the micro-batching."""
    import time

    from weather_data_warehouse_aws_spark.streaming.jobs import (
        read_current_agg,
        run_cms_foreachbatch,
    )

    feed = str(tmp_path_factory.mktemp("cms_feed")) + "/f"
    cmsd = str(tmp_path_factory.mktemp("cms_agg")) + "/cms"
    ckpt = str(tmp_path_factory.mktemp("cms_ckpt"))

    b1 = spark.createDataFrame([("hot",)] * 300 + [("a",), ("b",)], "tok string")
    b2 = spark.createDataFrame([("hot",)] * 200 + [("c",)] * 50, "tok string")
    b1.coalesce(1).write.parquet(f"{feed}/1")
    time.sleep(1.1)
    b2.coalesce(1).write.parquet(f"{feed}/2")

    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(feed)
    )
    run_cms_foreachbatch(stream, "tok", cmsd, ckpt, width=512, depth=4)

    live = read_current_agg(spark, cmsd)
    batch = cms_build(b1.unionByName(b2), "tok", width=512, depth=4)
    assert sorted(map(tuple, live.collect())) == sorted(map(tuple, batch.collect()))

    probe = spark.createDataFrame([("hot",), ("c",), ("zzz",)], "tok string")
    est = {r.tok: r.est for r in cms_estimate(live, probe, "tok").collect()}
    assert est["hot"] >= 500 and est["c"] >= 50 and est["zzz"] <= 2


def test_merge_rejects_mixed_parameters(spark):
    """Validation is a LAZY tripwire riding the consuming action (no eager
    collect that would recompute an unpersisted sketch build), so the
    raise surfaces at evaluation time as a raise_error."""
    df = spark.createDataFrame([("x",)] * 3, "tok string")
    a = cms_build(df, "tok", width=256, depth=4)
    b = cms_build(df, "tok", width=512, depth=4)
    with pytest.raises(Exception, match="mixed"):
        cms_merge(a, b).collect()
    probe = spark.createDataFrame([("x",)], "tok string")
    mixed = a.unionByName(b)
    with pytest.raises(Exception, match="mixed"):
        cms_estimate(mixed, probe, "tok").collect()


def test_probe_type_mismatch_is_bridged(spark):
    """Hashing goes through CAST(key AS STRING), so probing an INT-built
    sketch with BIGINT keys must still find them ('7' == '7') — without
    the bridge, real keys would silently estimate 0."""
    df = spark.createDataFrame([(7,)] * 42, "k int")
    sketch = cms_build(df, "k", width=256, depth=4)
    probe = spark.createDataFrame([(7,)], "k bigint")
    est = cms_estimate(sketch, probe, "k").first()["est"]
    assert est >= 42


# ---------------------------------------------------------------------------
# property fuzz: the CMS invariants must hold for ARBITRARY corpora, not
# just the synthetic token stream (SURVEY §5 item 4 pattern)
# ---------------------------------------------------------------------------
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FUZZ_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
)

_corpus = st.lists(
    st.sampled_from(["a", "b", "cc", "dd", "e f", "", "長", "0"]),
    min_size=0,
    max_size=80,
)


@given(toks=_corpus, width=st.sampled_from([2, 4, 16]), depth=st.sampled_from([1, 3]))
@_FUZZ_SETTINGS
def test_fuzz_one_sided_and_split_merge(spark, toks, width, depth):
    """For any corpus and any (width, depth): est ≥ true for every key,
    and sketch(A∪B) == merge(sketch(A), sketch(B)) exactly for any split."""
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    sketch = cms_build(df, "tok", width=width, depth=depth)
    truth = Counter(toks)
    if toks:
        probe = spark.createDataFrame([(t,) for t in set(toks)], "tok string")
        est = {r.tok: r.est for r in cms_estimate(sketch, probe, "tok").collect()}
        assert all(est[t] >= n for t, n in truth.items()), (est, truth)
    # arbitrary split point: merge algebra must be exact
    cut = len(toks) // 3
    a = spark.createDataFrame([(t,) for t in toks[:cut]] or [("x",)], "tok string")
    b = spark.createDataFrame([(t,) for t in toks[cut:]] or [("x",)], "tok string")
    whole = spark.createDataFrame(
        [(t,) for t in (toks[:cut] or ["x"]) + (toks[cut:] or ["x"])],
        "tok string",
    )
    merged = cms_merge(
        cms_build(a, "tok", width=width, depth=depth),
        cms_build(b, "tok", width=width, depth=depth),
    )
    single = cms_build(whole, "tok", width=width, depth=depth)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, single.collect())
    )
