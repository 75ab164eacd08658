"""Skew-mitigation primitives (SURVEY §4.5; the 100 TB insurance policy).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py) handles most skew at runtime. These helpers cover the
two cases AQE can't:

* `salted_agg` — a single hot group in an aggregation (AQE splits skewed
  JOIN partitions, not skewed agg groups). Two-phase: hash-partial over
  (key, salt), then final merge over key. Works for any algebraic aggregate
  expressed as (partial, merge, finish) triples.
* `salted_broadcast_join` — a hot key joining a small-but-over-broadcast-
  threshold dim: replicate the dim per salt instead of shuffling the fact.

Both are deterministic: the salt is `pmod(xxhash64(fine_grain_cols), n)` —
never `rand()`, which would break retries/speculative execution (a retried
task must salt identically or rows are lost/duplicated).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SALT = "__salt"


def deterministic_salt(fine_grain: Sequence[str], buckets: int) -> Column:
    """Stable salt from columns finer-grained than the group key."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in fine_grain]), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt_cols: Sequence[str],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation immune to hot group keys.

    `aggs` maps output column → (input column, fn) with fn ∈
    {count, sum, min, max, avg}. Phase 1 aggregates over (keys, salt) —
    spreading a hot key over `buckets` reducers — phase 2 merges partials
    over keys. `avg` is decomposed into sum+count and finished exactly.
    """
    partials = []
    finals = []
    finish = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partials.append(F.count(col if col != "*" else "*").alias(f"__p_{out}"))
            finals.append(F.sum(f"__p_{out}").alias(out))
            finish.append(F.col(out))
        elif fn in ("sum", "min", "max"):
            partials.append(getattr(F, fn)(col).alias(f"__p_{out}"))
            finals.append(getattr(F, fn if fn != "sum" else "sum")(f"__p_{out}").alias(out))
            finish.append(F.col(out))
        elif fn == "avg":
            partials.append(F.sum(col).alias(f"__p_{out}_s"))
            partials.append(F.count(col).alias(f"__p_{out}_c"))
            finals.append(F.sum(f"__p_{out}_s").alias(f"__f_{out}_s"))
            finals.append(F.sum(f"__p_{out}_c").alias(f"__f_{out}_c"))
            finish.append((F.col(f"__f_{out}_s") / F.col(f"__f_{out}_c")).alias(out))
        else:
            raise ValueError(f"unsupported aggregate: {fn}")

    salted = df.withColumn(_SALT, deterministic_salt(salt_cols, buckets))
    phase1 = salted.groupBy(*keys, _SALT).agg(*partials)
    phase2 = phase1.groupBy(*keys).agg(*finals)
    return phase2.select(*keys, *finish)


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    *,
    salt_cols: Sequence[str],
    buckets: int = 8,
) -> DataFrame:
    """Equi-join where the fact side has hot keys: salt the fact, explode
    the dim across all salt values, join on (keys…, salt). The dim is
    replicated `buckets`× — use only when dim_size × buckets is still
    broadcastable-ish; otherwise rely on AQE skew-join."""
    salted_fact = fact.withColumn(_SALT, deterministic_salt(salt_cols, buckets))
    exploded_dim = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_fact.join(exploded_dim, [*on, _SALT], "inner").drop(_SALT)


def key_skew(df: DataFrame, col: str, *, top_k: int = 5) -> DataFrame:
    """(value, n, share) for the `top_k` heaviest values of `col` — the
    data-side skew diagnostic behind every salting decision: a join/agg
    key whose top value carries >1/parallelism of the rows will stall its
    stage on one task. One two-level count + a tiny top-k; run it BEFORE
    shipping a join on an unfamiliar key, then reach for salted_agg /
    salted_broadcast_join / AQE skew-join when share is high. NULL counts
    as its own value (NULL-heavy keys are the classic silent skew)."""
    counts = df.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # share from the counts relation itself: ONE scan of df, lazy, the
    # global-sum window runs over the (small) distinct-value relation only
    total = F.sum("n").over(Window.partitionBy())
    return (
        counts.withColumn("share", F.round(F.col("n") / total, 6))
        .orderBy(F.col("n").desc(), F.col("value"))
        .limit(top_k)
    )


def partition_balance(df: DataFrame) -> DataFrame:
    """(partition_id, n) + an `imbalance` column = n / mean(n): the
    physical-layout skew diagnostic. An imbalance ≫ 1 after a shuffle
    means the partitioner (or the key distribution) funnels work onto few
    tasks — the thing AQE's skew split fixes for joins but NOT for
    arbitrary downstream stages. One map pass + a tiny aggregate."""
    # denominator counts EMPTY partitions too: a layout funneling every
    # row into one of 8 partitions must report imbalance 8, not 1 (the
    # groupBy only yields populated partitions). One scan; the mean uses
    # the physical partition count, a planning-time scalar.
    n_parts = max(df.rdd.getNumPartitions(), 1)
    per = df.select(F.spark_partition_id().alias("partition_id")).groupBy(
        "partition_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    mean_n = F.sum("n").over(Window.partitionBy()) / F.lit(n_parts)
    return per.select(
        "partition_id", "n", F.round(F.col("n") / mean_n, 4).alias("imbalance")
    )
