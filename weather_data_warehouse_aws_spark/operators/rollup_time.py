"""Cascading time rollup — multi-grain aggregates from partials, not raw.

The reference materializes a single hourly grain (its Athena agg views,
`scripts/sql/create_views.sql:39-68`); dashboards then re-scan it for
coarser slices. The general form of that idea is the hypertable
"continuous aggregate" (public prior art: TimescaleDB's continuous
aggregates, materialized-view rollup chains): compute the FINEST grain
once from raw data, then derive each coarser grain by re-aggregating the
next-finer grain's partial states.

This is only valid for decomposable aggregates, so the operator carries
partials, never finals:

    count  -> sum of partial counts
    sum    -> sum of partial sums
    min/max-> min/max of partial min/max

and derives ratios (avg = sum/count) at output time only.

Why it matters at 100 TB: the raw table is scanned ONCE (the hourly agg —
map-side partial, one shuffle on the hour grain). The daily rollup then
shuffles |hours|·|keys| rows and the monthly |days|·|keys| — 4-6 orders of
magnitude smaller than raw. Recomputing each grain from raw would instead
re-scan raw N_grains times. The cascade is also the maintenance story:
when an hour partition is restated, only its day and month rows recompute.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# truncation targets accepted by date_trunc, finest-first
_GRAIN_ORDER = ("hour", "day", "week", "month", "quarter", "year")

_GRAIN_COL = "grain_start"


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_cols: Sequence[str] = (),
    grains: Sequence[str] = ("hour", "day", "month"),
) -> dict[str, DataFrame]:
    """Multi-grain rollup of `df` keyed by (`grains[i]`-truncated `ts_col`,
    *keys), each coarser grain re-aggregated from the previous one.

    Returns {grain: DataFrame} with columns
    ``grain_start, *keys, n_rows, sum_<c>…, n_<c>…`` where `n_rows` is the
    row count, `sum_<c>` the sum of each `sum_cols` entry and `n_<c>` the
    non-null count of each `count_cols` entry. Sums are carried RAW
    (unrounded) through the cascade — round only at output, or coarse
    grains drift off the direct-computation value.
    """
    order = {g: i for i, g in enumerate(_GRAIN_ORDER)}
    unknown = [g for g in grains if g not in order]
    if unknown:
        raise ValueError(f"unsupported grains: {unknown}; pick from {_GRAIN_ORDER}")
    grains = sorted(grains, key=order.__getitem__)
    if "week" in grains and {"month", "quarter", "year"} & set(grains):
        raise ValueError("weeks straddle month boundaries — cascade is invalid")

    sum_aliases = [f"sum_{c}" for c in sum_cols]
    cnt_aliases = [f"n_{c}" for c in count_cols]

    finest = (
        df.groupBy(F.date_trunc(grains[0], F.col(ts_col)).alias(_GRAIN_COL), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(c).alias(a) for c, a in zip(sum_cols, sum_aliases)],
            *[F.count(c).alias(a) for c, a in zip(count_cols, cnt_aliases)],
        )
    )
    out = {grains[0]: finest}
    prev = finest
    for g in grains[1:]:
        prev = (
            prev.groupBy(
                F.date_trunc(g, F.col(_GRAIN_COL)).alias(_GRAIN_COL), *keys
            )
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(a).alias(a) for a in sum_aliases],
                *[F.sum(a).alias(a) for a in cnt_aliases],
            )
        )
        out[g] = prev
    return out


def tagged_union(rollups: dict[str, DataFrame]) -> DataFrame:
    """Stack the per-grain frames into one relation tagged by `grain`."""
    frames = [df.withColumn("grain", F.lit(g)) for g, df in rollups.items()]
    acc = frames[0]
    for f in frames[1:]:
        acc = acc.unionByName(f)
    return acc


def distinct_rollup(
    df: DataFrame,
    *,
    ts_col: str,
    keys: list[str],
    distinct_col: str,
    grains: tuple[str, ...] = ("hour", "day", "month"),
    lg_k: int = 12,
) -> dict[str, DataFrame]:
    """Cascading COUNT(DISTINCT) via mergeable HLL sketches (Apache
    DataSketches, built into Spark as `hll_sketch_agg`/`hll_union_agg`).

    Exact distincts don't cascade — you cannot add hourly unique-user
    counts into a daily one — which is why naive rollup pipelines re-scan
    raw data per grain. Sketches fix this at 100 TB: the finest grain
    aggregates raw ONCE into ~2^lg_k-byte sketch registers; every coarser
    grain UNIONS the finer grain's sketches (a per-group reduce over
    KB-sized state, 4-6 orders of magnitude below raw — the same cascade
    economics as `cascade_rollup`'s sums). Register union is lossless, so
    the cascaded estimate is exactly the single-pass estimate at every
    grain (asserted in tests, alongside the error-vs-exact band).

    Returns {grain: DataFrame(grain_start, *keys, sketch, n_distinct_est)};
    keep the `sketch` column when persisting so later grains (or late
    restatements) keep merging instead of re-scanning.
    """
    finest, *coarser = grains
    out: dict[str, DataFrame] = {}
    cur = (
        df.select(
            F.date_trunc(finest, F.col(ts_col)).alias("grain_start"),
            *keys,
            F.col(distinct_col).alias("__d"),
        )
        .groupBy("grain_start", *keys)
        .agg(F.expr(f"hll_sketch_agg(__d, {lg_k})").alias("sketch"))
    )
    out[finest] = cur.withColumn(
        "n_distinct_est", F.expr("hll_sketch_estimate(sketch)").cast("long")
    )
    for g in coarser:
        cur = (
            cur.select(F.date_trunc(g, F.col("grain_start")).alias("grain_start"), *keys, "sketch")
            .groupBy("grain_start", *keys)
            .agg(F.expr("hll_union_agg(sketch)").alias("sketch"))
        )
        out[g] = cur.withColumn(
            "n_distinct_est", F.expr("hll_sketch_estimate(sketch)").cast("long")
        )
    return out
