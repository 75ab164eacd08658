"""Shuffle-partition fuzz: oracle parity must be invariant to parallelism.

The driver may run with any `spark.sql.shuffle.partitions`; results that
depend on partition count (summation order, window tie-breaks, row_number
over under-specified sorts) are latent correctness bugs. This re-runs the
most partition-sensitive registry queries at 7 and 200 partitions (default
suite runs at 32) — the subset covers every hazard class: multi-shuffle
window ranking, keyed dedup ordering, iterative centroid refinement,
forward-fill frames, and banded-signature joins.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_query_matches_oracle

SENSITIVE = [
    "window_rank",
    "dedup_latest",
    "ivf_ann_refined",
    "gap_fill",
    "pair_dedup",
    "chunk_documents",  # per-shard window cumsum feeding pack arithmetic
    "dedup_clusters",  # iterative label propagation + recursive-CTE oracle
    "corpus_sampling",  # two-phase prefix-sum quota cut vs one-window oracle
    "text_relevance",  # full-precision rank + LIMIT across partitions
    "embedding_neardup",  # semdedup cell assignment + survivor anti-join
    "ann_methods",  # q8 two-stage rerank + IVF/LSH bucket candidates
]


@pytest.mark.parametrize("partitions", ["7", "200"])
@pytest.mark.parametrize("name", SENSITIVE)
def test_oracle_invariant_to_shuffle_partitions(spark, sf_dir, name, partitions):
    queries = entrymod.queries()
    oracle = entrymod.oracle_sql()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    try:
        assert_query_matches_oracle(queries[name](spark, sf_dir), oracle[name], sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
