"""Sequence packing: concat-and-cut exactness/determinism, greedy FFD
feasibility/efficiency/determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.packing import (
    pack_concat_cut,
    pack_greedy,
    shard_of,
)
from weather_data_warehouse_aws_spark.sources.tables import load_table

BUDGET = 128
N_SHARDS = 8


def _chunks(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = r"split(trim(text), '\\s+')"
    return docs.select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_tokens"),
    ).withColumn("shard_id", shard_of("doc_id", n_shards=N_SHARDS))


def test_concat_cut_tiles_packs_exactly(spark, sf_dir):
    items = _chunks(spark, sf_dir)
    packed = pack_concat_cut(
        items, ["doc_id"], "n_tokens", budget=BUDGET, n_shards=N_SHARDS
    ).cache()

    # every pack except each shard's last holds exactly BUDGET tokens
    per_pack = (
        packed.groupBy("shard_id", "pack_id")
        .agg(F.sum("seg_len").alias("tok"))
        .cache()
    )
    last = per_pack.groupBy("shard_id").agg(F.max("pack_id").alias("last_pack"))
    full = per_pack.join(last, "shard_id").filter(F.col("pack_id") != F.col("last_pack"))
    assert full.filter(F.col("tok") != BUDGET).count() == 0
    assert per_pack.filter(F.col("tok") > BUDGET).count() == 0

    # segments tile each pack contiguously: min offset 0, offsets+lens
    # reconstruct the token count with no overlap
    tiling = packed.groupBy("shard_id", "pack_id").agg(
        F.min("pack_offset").alias("mn"),
        F.max(F.col("pack_offset") + F.col("seg_len")).alias("mx"),
        F.sum("seg_len").alias("tok"),
    )
    assert tiling.filter((F.col("mn") != 0) | (F.col("mx") != F.col("tok"))).count() == 0


def test_concat_cut_tiles_items_exactly(spark, sf_dir):
    items = _chunks(spark, sf_dir)
    packed = pack_concat_cut(
        items, ["doc_id"], "n_tokens", budget=BUDGET, n_shards=N_SHARDS
    )
    per_item = packed.groupBy("doc_id", "n_tokens").agg(
        F.min("seg_start").alias("mn"),
        F.max(F.col("seg_start") + F.col("seg_len")).alias("mx"),
        F.sum("seg_len").alias("covered"),
    )
    bad = per_item.filter(
        (F.col("mn") != 0)
        | (F.col("mx") != F.col("n_tokens"))
        | (F.col("covered") != F.col("n_tokens"))
    )
    assert bad.count() == 0
    # total conservation
    total_items = items.agg(F.sum("n_tokens")).first()[0]
    total_segs = packed.agg(F.sum("seg_len")).first()[0]
    assert total_items == total_segs


def test_concat_cut_partitioning_invariant(spark, sf_dir):
    items = _chunks(spark, sf_dir)
    a = pack_concat_cut(
        items.repartition(3), ["doc_id"], "n_tokens", budget=BUDGET, n_shards=N_SHARDS
    )
    b = pack_concat_cut(
        items.repartition(37), ["doc_id"], "n_tokens", budget=BUDGET, n_shards=N_SHARDS
    )
    cols = a.columns
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_greedy_feasible_and_complete(spark, sf_dir):
    items = _chunks(spark, sf_dir).drop("shard_id")
    packed = pack_greedy(
        items, ["doc_id"], "n_tokens", budget=BUDGET, n_shards=N_SHARDS
    ).cache()
    assert packed.count() == items.filter(F.col("n_tokens") > 0).count()
    assert packed.select("doc_id").distinct().count() == packed.count()
    # non-oversize packs respect the budget; oversize rows sit alone
    per_pack = packed.groupBy("shard_id", "pack_id").agg(
        F.sum("n_tokens").alias("tok"),
        F.count("*").alias("n"),
        F.max(F.col("oversize").cast("int")).alias("has_over"),
    )
    assert per_pack.filter((F.col("has_over") == 0) & (F.col("tok") > BUDGET)).count() == 0
    assert per_pack.filter((F.col("has_over") == 1) & (F.col("n") > 1)).count() == 0
    # oversize flag matches reality
    assert packed.filter(F.col("oversize") != (F.col("n_tokens") > BUDGET)).count() == 0


def test_greedy_efficiency_ffd_bound(spark, sf_dir):
    items = _chunks(spark, sf_dir).drop("shard_id")
    packed = pack_greedy(items, ["doc_id"], "n_tokens", budget=BUDGET, n_shards=N_SHARDS)
    stats = (
        packed.filter(~F.col("oversize"))
        .groupBy("shard_id")
        .agg(
            F.countDistinct("pack_id").alias("n_packs"),
            F.sum("n_tokens").alias("total"),
        )
        .collect()
    )
    for r in stats:
        opt_lb = math.ceil(r.total / BUDGET)
        assert r.n_packs <= math.ceil(11 / 9 * opt_lb) + 1, (
            r.shard_id,
            r.n_packs,
            opt_lb,
        )


def test_greedy_partitioning_invariant(spark, sf_dir):
    items = _chunks(spark, sf_dir).drop("shard_id")
    a = pack_greedy(items.repartition(3), ["doc_id"], "n_tokens", budget=BUDGET, n_shards=N_SHARDS)
    b = pack_greedy(items.repartition(37), ["doc_id"], "n_tokens", budget=BUDGET, n_shards=N_SHARDS)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
