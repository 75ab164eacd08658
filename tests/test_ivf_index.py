"""Persistent IVF index: query ≡ per-call operator, probes partition-pruned."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.similarity import (
    build_ivf_index,
    ivf_index_topk,
    ivf_topk,
)
from weather_data_warehouse_aws_spark.plans.inspect import physical_plan
from weather_data_warehouse_aws_spark.sources.tables import load_table


def test_index_query_matches_operator_and_prunes(spark, sf_smoke_dir, tmp_path_factory):
    emb = load_table(spark, sf_smoke_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 17 == 0)
    path = str(tmp_path_factory.mktemp("ivf")) + "/idx"

    build_ivf_index(emb, path, n_cells=8, lloyd_iterations=1)
    got = ivf_index_topk(spark, queries, path, k=5, nprobe=2)
    want = ivf_topk(
        queries, emb, k=5, n_cells=8, nprobe=2, lloyd_iterations=1
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0

    # the cells scan must be partition-pruned to the probed cells
    plan = physical_plan(got, "formatted")
    assert "PartitionFilters" in plan and "cell_id" in plan


def test_index_reuse_across_query_batches(spark, sf_smoke_dir, tmp_path_factory):
    """Build once, query twice with different batches — no rebuild, results
    consistent with the operator for each batch."""
    emb = load_table(spark, sf_smoke_dir, "embeddings")
    path = str(tmp_path_factory.mktemp("ivf2")) + "/idx"
    build_ivf_index(emb, path, n_cells=8, lloyd_iterations=0)
    for mod in (13, 29):
        batch = emb.filter(F.col("vec_id") % mod == 1)
        got = ivf_index_topk(spark, batch, path, k=3, nprobe=3)
        want = ivf_topk(batch, emb, k=3, n_cells=8, nprobe=3, lloyd_iterations=0)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), mod


def test_ivfpq_full_probe_equals_pq_topk(spark, sf_smoke_dir, tmp_path_factory):
    """nprobe = n_cells ⇒ the IVFPQ index answers exactly what the
    per-call pq_topk computes (same codebooks, shortlist, rescore)."""
    from weather_data_warehouse_aws_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_index_topk,
        pq_topk,
    )
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path_factory.mktemp("ivfpq")) + "/idx"
    build_ivfpq_index(emb, path, n_cells=8, m=4, ksub=16, dim=64)

    via_index = ivfpq_index_topk(
        spark, queries, path, k=5, nprobe=8, rerank=6
    )
    direct = pq_topk(queries, emb, k=5, m=4, ksub=16, rerank=6, dim=64)
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_ivfpq_partial_probe_prunes_partitions(spark, sf_smoke_dir, tmp_path_factory):
    """Small nprobe: the codes scan must be partition-pruned (only probed
    cell dirs read) and results stay plausible top-k."""
    from weather_data_warehouse_aws_spark.operators.similarity import (
        build_ivfpq_index,
        cosine_topk,
        ivfpq_index_topk,
    )
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path_factory.mktemp("ivfpq2")) + "/idx"
    build_ivfpq_index(emb, path, n_cells=8, m=4, ksub=16, dim=64)

    out = ivfpq_index_topk(spark, queries, path, k=5, nprobe=3, rerank=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_id" in plan

    rows = out.collect()
    from collections import Counter

    per_q = Counter(r.query_id for r in rows)
    assert all(v == 5 for v in per_q.values()) and len(per_q) == 8
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(queries, emb, k=5).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(exact & approx) / len(exact) >= 0.2  # probing 3/8 cells


def test_ivfpq_incremental_update(spark, sf_smoke_dir, tmp_path_factory):
    """Appended vectors become searchable with frozen centroids/codebooks:
    a planted exact copy of a query (added via update) ranks top-1 with
    cos=1.0; pre-existing rows are untouched; batch cost only."""
    from weather_data_warehouse_aws_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_index_topk,
        update_ivfpq_index,
    )
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke_dir, "embeddings")
    path = str(tmp_path_factory.mktemp("ivfpq3")) + "/idx"
    build_ivfpq_index(emb, path, n_cells=8, m=4, ksub=16, dim=64)
    before_codes = spark.read.parquet(f"{path}/codes").count()

    # append: exact copies of queries 0 and 3 under new ids
    batch = emb.filter(F.col("vec_id").isin(0, 3)).select(
        (F.col("vec_id") + 900_000).alias("vec_id"), "embedding", "label"
    )
    update_ivfpq_index(batch, path)

    assert spark.read.parquet(f"{path}/codes").count() == before_codes + 2 * 4
    queries = emb.filter(F.col("vec_id").isin(0, 3))
    out = ivfpq_index_topk(spark, queries, path, k=3, nprobe=8, rerank=6)
    top1 = {r.query_id: (r.neighbor_id, r.cos) for r in out.collect() if r.rank == 1}
    assert top1[0] == (900_000, 1.0)
    assert top1[3] == (900_003, 1.0)


def test_ivfpq_residual_mode_improves_clustered_recall(spark, tmp_path_factory):
    """Residual encoding must beat (or tie) plain encoding on clustered
    vectors — residuals are small, so the same code budget quantizes them
    more finely; and the residual index stays end-to-end consistent
    (build → update → query)."""
    import numpy as np

    from weather_data_warehouse_aws_spark.operators.similarity import (
        build_ivfpq_index,
        cosine_topk,
        ivfpq_index_topk,
        update_ivfpq_index,
    )

    rng = np.random.default_rng(5)
    rows = []
    vid = 0
    for c in range(8):
        center = rng.standard_normal(64)
        center /= np.linalg.norm(center)
        for _ in range(25):
            v = center + 0.15 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(queries, emb, k=5).collect()
    }

    def recall(residual: bool) -> float:
        path = str(tmp_path_factory.mktemp(f"res{int(residual)}")) + "/idx"
        build_ivfpq_index(
            emb, path, n_cells=8, m=4, ksub=16, dim=64, residual=residual
        )
        out = ivfpq_index_topk(spark, queries, path, k=5, nprobe=8, rerank=2)
        approx = {(r.query_id, r.neighbor_id) for r in out.collect()}
        return len(exact & approx) / len(exact)

    r_plain, r_res = recall(False), recall(True)
    assert r_res >= r_plain, (r_plain, r_res)
    assert r_res >= 0.6, r_res

    # update path honors the residual flag: a planted copy is findable
    path = str(tmp_path_factory.mktemp("resu")) + "/idx"
    build_ivfpq_index(emb, path, n_cells=8, m=4, ksub=16, dim=64, residual=True)
    batch = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 900_000).alias("vec_id"), "embedding"
    )
    update_ivfpq_index(batch, path)
    out = ivfpq_index_topk(
        spark, emb.filter(F.col("vec_id") == 0), path, k=3, nprobe=8, rerank=6
    )
    top1 = {r.query_id: (r.neighbor_id, r.cos) for r in out.collect() if r.rank == 1}
    assert top1[0] == (900_000, 1.0)


def test_ivfpq_update_retry_is_idempotent(spark, sf_smoke_dir, tmp_path_factory):
    """Running the same update batch twice must not change results: ids
    already committed in codes/ are filtered out on retry, and the rescore
    pool dedups by id."""
    from weather_data_warehouse_aws_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_index_topk,
        update_ivfpq_index,
    )
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke_dir, "embeddings")
    path = str(tmp_path_factory.mktemp("ivfpq_r")) + "/idx"
    build_ivfpq_index(emb, path, n_cells=8, m=4, ksub=16, dim=64)
    batch = emb.filter(F.col("vec_id") == 1).select(
        (F.col("vec_id") + 900_000).alias("vec_id"), "embedding", "label"
    )
    update_ivfpq_index(batch, path)
    codes_once = spark.read.parquet(f"{path}/codes").count()
    update_ivfpq_index(batch, path)  # retry: must be a no-op
    assert spark.read.parquet(f"{path}/codes").count() == codes_once

    out = ivfpq_index_topk(
        spark, emb.filter(F.col("vec_id") == 1), path, k=3, nprobe=8, rerank=6
    )
    rows = [r for r in out.collect()]
    assert [r.neighbor_id for r in rows if r.rank == 1] == [900_001]
    # the duplicate never occupies two slots
    assert len({r.neighbor_id for r in rows}) == 3


def test_pq_serve_cache_rebuilds_on_corpus_rewrite(spark, tmp_path):
    """The once-per-process IVFPQ serving cache is keyed by (path, corpus
    fingerprint): rewriting the embeddings under the SAME path must
    trigger a rebuild, never silently serve the stale index."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from weather_data_warehouse_aws_spark.queries import similarity as S

    d = str(tmp_path / "sfcopy")
    os.makedirs(d)
    src = "/root/testdata/sf0.001/embeddings.parquet"
    shutil.copy(src, os.path.join(d, "embeddings.parquet"))

    n_before = len(S._IVFPQ_SERVE_CACHE)
    r1 = S.q_pq_ann(spark, d)
    assert r1.count() > 0
    assert len(S._IVFPQ_SERVE_CACHE) == n_before + 1

    # same path, same corpus -> cache hit, no new entry
    S.q_pq_ann(spark, d).count()
    assert len(S._IVFPQ_SERVE_CACHE) == n_before + 1

    # REWRITE the corpus in place (drop the tail -> different file bytes)
    t = pq.read_table(os.path.join(d, "embeddings.parquet"))
    pq.write_table(t.slice(0, t.num_rows - 5), os.path.join(d, "embeddings.parquet"))
    r2 = S.q_pq_ann(spark, d)
    assert r2.count() > 0
    assert len(S._IVFPQ_SERVE_CACHE) == n_before + 2, (
        "rewritten corpus must build a fresh index entry"
    )
