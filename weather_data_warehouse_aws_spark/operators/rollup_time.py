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


def quantile_rollup(
    df: DataFrame,
    *,
    ts_col: str,
    keys: list[str],
    value_col: str,
    grains: tuple[str, ...] = ("hour", "day", "month"),
    k: int = 200,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> dict[str, DataFrame]:
    """Cascading percentiles via mergeable KLL sketches (Apache
    DataSketches, built into Spark as `kll_sketch_agg_double` /
    `kll_merge_agg_double`) — the quantile twin of `distinct_rollup`.

    Exact percentiles don't cascade any more than exact distincts do: a
    daily p95 is not a function of hourly p95s, so naive pipelines re-sort
    raw data per grain (and `percentile` is a full sort per group). KLL
    sketches (Karnin-Lang-Liberty, FOCS 2016 — public literature) carry a
    bounded-rank-error summary of the VALUE DISTRIBUTION in ~KB of state:
    the finest grain aggregates raw once, coarser grains merge the finer
    sketches, and any quantile is read from the merged state. Normalized
    rank error ~1.65% at k=200, shrinking as k grows; for n ≤ capacity the
    sketch stores all values and quantiles are exact.

    Returns {grain: DataFrame(grain_start, *keys, sketch, p50, p95, ...)};
    persist the `sketch` column so later grains, restatements, or ad-hoc
    windows keep merging instead of re-scanning raw.
    """
    finest, *coarser = grains
    # label preserves tail decimals: 0.95 -> p95, 0.999 -> p99_9 (a plain
    # round() would name both 0.995 and 0.999 "p100" — colliding columns)
    qcols = [
        F.expr(f"kll_sketch_get_quantile_double(sketch, {q!r}d)").alias(
            "p" + f"{q * 100:g}".replace(".", "_")
        )
        for q in quantiles
    ]
    out: dict[str, DataFrame] = {}
    cur = (
        df.select(
            F.date_trunc(finest, F.col(ts_col)).alias(_GRAIN_COL),
            *keys,
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy(_GRAIN_COL, *keys)
        .agg(F.expr(f"kll_sketch_agg_double(__v, {k})").alias("sketch"))
    )
    out[finest] = cur.select(_GRAIN_COL, *keys, "sketch", *qcols)
    for g in coarser:
        cur = (
            cur.select(
                F.date_trunc(g, F.col(_GRAIN_COL)).alias(_GRAIN_COL), *keys, "sketch"
            )
            .groupBy(_GRAIN_COL, *keys)
            .agg(F.expr("kll_merge_agg_double(sketch)").alias("sketch"))
        )
        out[g] = cur.select(_GRAIN_COL, *keys, "sketch", *qcols)
    return out


def retention_overlap(
    df: DataFrame,
    *,
    ts_col: str,
    id_col: str,
    grain: str = "week",
    keys: list[str] | None = None,
) -> DataFrame:
    """Period-over-period audience overlap via mergeable Theta sketches
    (`theta_sketch_agg` + the `theta_intersection`/`theta_difference` set
    algebra): per period (and optional segment keys), how many distinct ids
    were retained from the previous period, how many are new, and how many
    churned.

    The exact computation is a self-join of per-period DISTINCT id sets —
    at 100 TB that shuffles the raw id universe once per period pair, and
    every new question ("week 3 vs week 7?") is another full pass. Theta
    sketches compress each period's id set into KB of hashes ONCE (one
    linear scan, one shuffle of sketch partials); any pairwise
    union/intersection/difference is then driver-cheap set algebra over
    adjacent rows — here a window lag, no joins at all. Estimates are
    EXACT while a period's cardinality stays under the sketch's nominal
    capacity (default 2^12), and ~2%-bounded beyond it.

    Returns (grain_start, *keys, n_prev, n_cur, n_retained, n_new,
    n_churned) — n_* are Theta estimates cast to long; the first period
    per segment has n_prev/n_retained/n_churned = null.
    """
    keys = keys or []
    per_period = (
        df.select(
            F.date_trunc(grain, F.col(ts_col)).alias(_GRAIN_COL),
            *keys,
            F.col(id_col).alias("__id"),
        )
        .groupBy(_GRAIN_COL, *keys)
        .agg(F.expr("theta_sketch_agg(__id)").alias("sketch"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(_GRAIN_COL) if keys else Window.orderBy(
        _GRAIN_COL
    )
    # |periods|·|segments| rows of KB sketches — window state is tiny; with
    # no keys this is a single-task window over a micro-relation (post-agg),
    # which is the documented exception to the no-global-window rule
    est = "CAST(theta_sketch_estimate({0}) AS LONG)"
    lagged = per_period.withColumn("__prev", F.lag("sketch").over(w))
    return lagged.select(
        _GRAIN_COL,
        *keys,
        F.expr(est.format("__prev")).alias("n_prev"),
        F.expr(est.format("sketch")).alias("n_cur"),
        F.expr(est.format("theta_intersection(__prev, sketch)")).alias("n_retained"),
        # first period per segment: no prior sketch, so EVERY current user
        # is new — theta_difference(sketch, NULL) would propagate NULL and
        # misreport week 1's "new users" as unknown
        F.when(
            F.col("__prev").isNull(), F.expr(est.format("sketch"))
        ).otherwise(
            F.expr(est.format("theta_difference(sketch, __prev)"))
        ).alias("n_new"),
        F.expr(est.format("theta_difference(__prev, sketch)")).alias("n_churned"),
    )
