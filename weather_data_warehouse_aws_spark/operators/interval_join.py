"""Interval (point-in-range) join — the general form of the band join.

The reference's only range predicate is the symmetric |Δt| < 3600 band
(`scripts/sql/create_views.sql:109-115`, handled by operators/band_join.py).
Real pipelines also need the ASYMMETRIC form: match each point-in-time row
to every interval `[start, end)` that contains it — attribution windows,
validity periods, maintenance outages, IP-range lookups on a numeric axis.

Naive Spark planning turns `p.ts >= i.start AND p.ts < i.end` into a
post-join filter on the key equi-join (or, with no keys, a broadcast
nested-loop join) — quadratic per key group at scale. The rewrite here is
the same family as the band join's, generalized to arbitrary-length
intervals:

    pick a bucket width B (≈ the typical interval length);
    points get ONE bucket  floor(epoch(ts)/B);
    intervals EXPLODE to every bucket they overlap,
        sequence(floor(epoch(start)/B), floor(epoch(end)/B));
    equi-join on (keys…, bucket); residual `start <= ts < end`.

Each (point, interval) pair meets at exactly one bucket — the point's own —
so no dedup is needed, for any interval length. Replication cost is
`len(interval)/B + 1` buckets per interval row (the points side, usually the
big one, is never replicated). Buckets compare second-truncated epochs
(monotonic under truncation, so containment survives), while the residual
compares the raw timestamps at full precision.

Scale notes:
- B trades interval-side replication (long intervals / small B) against
  per-bucket fan-in (short intervals / large B). For mixed workloads, split
  the interval table by length and run two joins with different B.
- The composite (keys…, bucket) key is high-cardinality → even shuffle;
  AQE absorbs residual hot buckets.
- `how="left"` preserves every point (interval columns null) by moving the
  residual into the outer join condition, same trick as band_join's outer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__iv_bucket"
_PBUCKET = "__iv_pbucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_sec: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to the interval rows that contain it.

    Semantics: equi-join on `on` AND ``start_ts <= point_ts < end_ts``
    (half-open, full timestamp precision, many-to-many). `how`:

    * ``"inner"``  — matched (point, interval) pairs only.
    * ``"left"``   — points preserved, interval columns null when no
      interval contains the point.
    * ``"right"``  — intervals preserved ("which windows saw no point?"),
      point columns null. The exploded side can't be the preserved side of
      an outer join (each exploded copy would null-extend independently),
      so never-matched intervals are found by projecting the matched
      intervals' row images out of the inner join, de-duplicating, and
      LEFT ANTI joining the raw interval table against them with null-safe
      equality on every interval column — identical interval rows match
      identical point sets, so image equality is exact. Costs one extra
      pass over the pair join; all joins remain hash/equi.
    * ``"full"``   — the ``left`` result UNION the same never-matched
      intervals, null-extended.

    Key columns follow Spark's name-join convention: one `on` column per
    key, populated from whichever side the row came from.

    `bucket_sec` is the bucketing width B of the scale rewrite (see module
    docstring) — it affects only the plan, never the result. Column name
    collisions outside `on` must be resolved by the caller, same contract
    as `DataFrame.join`.
    """
    if how not in ("inner", "left", "right", "full"):
        raise NotImplementedError(
            "interval_join supports how in {'inner','left','right','full'}"
        )
    b = int(bucket_sec)
    if b <= 0:
        raise ValueError("bucket_sec must be positive")

    pb = F.floor(F.unix_timestamp(F.col(point_ts)) / b)
    ivb = F.explode(
        F.sequence(
            F.floor(F.unix_timestamp(F.col(start_ts)) / b),
            F.floor(F.unix_timestamp(F.col(end_ts)) / b),
        )
    )
    residual = (F.col(point_ts) >= F.col(start_ts)) & (
        F.col(point_ts) < F.col(end_ts)
    )

    def _inner() -> DataFrame:
        p = points.withColumn(_BUCKET, pb)
        iv = intervals.withColumn(_BUCKET, ivb)
        return p.join(iv, [*on, _BUCKET], "inner").filter(residual).drop(_BUCKET)

    def _left() -> DataFrame:
        # keys + bucket + residual all inside the join condition so an
        # uncovered point yields exactly one null-extended row.
        # (One withColumnsRenamed call, not one DataFrame op per key —
        # plan construction is serial driver latency at any cluster size)
        rkeys = {k: f"__iv_r_{k}" for k in on}
        p = points.withColumn(_PBUCKET, pb)
        iv = intervals.withColumn(_BUCKET, ivb).withColumnsRenamed(rkeys)
        cond = (F.col(_PBUCKET) == F.col(_BUCKET)) & residual
        for k, rk in rkeys.items():
            cond = cond & (F.col(k) == F.col(rk))
        return p.join(iv, cond, "left").drop(_PBUCKET, _BUCKET, *rkeys.values())

    if how == "inner":
        return _inner()
    if how == "left":
        return _left()

    # right / full: never-matched intervals via distinct matched row images
    # + null-safe LEFT ANTI (see docstring). ONE _inner() DataFrame serves
    # both the image projection and (for how='right') the matched base, so
    # the pair join appears once per role with identical subplans and
    # Spark's ReuseExchange shares the shuffles instead of re-executing
    # them from scan.
    iv_cols = intervals.columns
    inner_df = _inner()
    # single-call renames and one parsed condition string: the per-column
    # withColumnRenamed/eqNullSafe chains cost ~6 py4j round-trips per
    # column of pure plan-construction latency
    img = inner_df.select(*iv_cols).distinct().toDF(
        *[f"__iv_m_{c}" for c in iv_cols]
    )
    anti_cond = F.expr(
        " AND ".join(f"`{c}` <=> `__iv_m_{c}`" for c in iv_cols)
    )
    unmatched_iv = intervals.join(img, anti_cond, "left_anti")

    base = inner_df if how == "right" else _left()
    point_types = {f.name: f.dataType for f in points.schema.fields}
    null_extended = unmatched_iv.selectExpr(
        *[
            f"`{c}`"
            if c in iv_cols or c in on  # `on` keys + interval columns
            else f"CAST(NULL AS {point_types[c].simpleString()}) AS `{c}`"
            for c in base.columns
        ]
    )
    return base.unionByName(null_extended)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_sec: int,
    how: str = "inner",
) -> DataFrame:
    """Join interval rows to interval rows that OVERLAP them — the fully
    general form of the temporal-join family (band join = fixed symmetric
    tolerance, interval_join = point-in-range, this = range-meets-range).

    Semantics: equi-join on `on` AND the half-open overlap predicate
    ``left_start < right_end AND right_start < left_end`` (many-to-many;
    intervals that merely touch at an endpoint do NOT overlap). `how` in
    {"inner", "left", "right", "full"} with the usual preserved-side
    null-extension.

    Scale rewrite: BOTH sides explode to every bucket of width B they
    cover. An overlapping pair co-occurs in every bucket both cover, so a
    naive equi-join would duplicate it; each pair is instead CLAIMED at
    exactly one bucket — the bucket of the later start,
    ``floor(epoch(greatest(left_start, right_start))/B)``. Overlap
    guarantees that bucket is covered by both sides (the later start
    precedes both ends), so the claim never loses a pair, and the equality
    filter keeps each pair exactly once — no dedup pass. Replication is
    ``len/B + 1`` buckets per row per side; the (keys…, bucket) composite
    key is high-cardinality, so the shuffle stays even and AQE splits any
    residual hot bucket.

    Outer variants reuse the matched-row-image trick from
    :func:`interval_join` on whichever side(s) must be preserved: project
    the preserved side's row images out of the inner join, de-duplicate,
    null-safe LEFT ANTI the raw table against them, null-extend, union.
    Identical rows match identical partner sets, so image equality is
    exact. Costs one extra distinct pass per preserved side; every join
    stays hash/equi.
    """
    if how not in ("inner", "left", "right", "full"):
        raise NotImplementedError(
            "interval_overlap_join supports how in {'inner','left','right','full'}"
        )
    b = int(bucket_sec)
    if b <= 0:
        raise ValueError("bucket_sec must be positive")

    def buckets(start: str, end: str):
        return F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / b),
                F.floor(F.unix_timestamp(F.col(end)) / b),
            )
        )

    claim = F.floor(
        F.unix_timestamp(F.greatest(F.col(left_start), F.col(right_start))) / b
    )
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )

    l_ex = left.withColumn(_BUCKET, buckets(left_start, left_end))
    r_ex = right.withColumn(_BUCKET, buckets(right_start, right_end))
    inner = (
        l_ex.join(r_ex, [*on, _BUCKET], "inner")
        .filter(overlap & (F.col(_BUCKET) == claim))
        .drop(_BUCKET)
    )
    if how == "inner":
        return inner

    def unmatched(side: DataFrame) -> DataFrame:
        # single-call rename + one parsed predicate (see interval_join:
        # per-column Column chains are serial py4j latency, ~6 round
        # trips per column, identical plan)
        cols = side.columns
        img = inner.select(*cols).distinct().toDF(
            *[f"__ov_m_{c}" for c in cols]
        )
        cond = F.expr(" AND ".join(f"`{c}` <=> `__ov_m_{c}`" for c in cols))
        return side.join(img, cond, "left_anti")

    def null_extend(rows: DataFrame, other: DataFrame) -> DataFrame:
        other_types = {f.name: f.dataType for f in other.schema.fields}
        rows_cols = set(rows.columns)
        return rows.selectExpr(
            *[
                f"`{c}`"
                if c in rows_cols
                else f"CAST(NULL AS {other_types[c].simpleString()}) AS `{c}`"
                for c in inner.columns
            ]
        )

    out = inner
    if how in ("left", "full"):
        out = out.unionByName(null_extend(unmatched(left), right))
    if how in ("right", "full"):
        out = out.unionByName(null_extend(unmatched(right), left))
    return out
