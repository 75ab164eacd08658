"""Band (interval/time-proximity) join — SURVEY.md §2.3 J4.

The reference's accuracy view joins forecast↔actual on `location_key`
equality AND ``ABS(TO_UNIXTIME(f.forecast_for_time) -
TO_UNIXTIME(a.observation_time)) < 3600`` (reference
`scripts/sql/create_views.sql:109-115`). Semantics: strict `<`, many-to-many
(a forecast can match several observations and vice versa).

Naive Spark planning treats the range predicate as a post-join filter on the
equi-join, which is fine when keys are selective — but at 100 TB with few
distinct keys (8 cities!) each key-group is huge and the per-key cross
product explodes. The scale-safe rewrite implemented here:

    bucket both sides by ``floor(epoch/tolerance)``; explode the LEFT side to
    buckets {b-1, b, b+1}; equi-join on (keys…, bucket); filter |Δt| < tol.

Any pair with |Δt| < tol has right_bucket within ±1 of left_bucket, and each
(left,right) pair meets at exactly ONE bucket (the right row's own bucket),
so no dedup is needed. The join becomes a plain hash join on a high-
cardinality composite key → shuffles partition evenly, AQE handles residual
skew. Cost: 3× replication of the left side, vs quadratic blowup avoided.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__band_bucket"
_LEPOCH = "__band_lepoch"
_REPOCH = "__band_repoch"


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance_sec: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose timestamps differ by strictly less than `tolerance_sec`.

    Matches the reference view's semantics exactly: equi-keys + strict
    ``|unix(left_ts) - unix(right_ts)| < tolerance_sec`` (second-truncated
    epochs, as Presto's TO_UNIXTIME on second-precision data). Many-to-many.

    `how="left"` keeps unmatched left rows (right columns null) — the
    "unmatched forecasts" extension of the reference's inner-only accuracy
    view. Implementation difference: the OUTER variant explodes the RIGHT
    side to adjacent buckets and puts the |Δt| residual INSIDE the join
    condition, so each left row appears exactly once per true match (a pair
    meets at the left row's single bucket) and exactly once, null-extended,
    when nothing matches. Catalyst still plans an equi-join on
    (keys…, bucket) with the residual as join filter — no nested loop.

    `how="right"` is the mirror ("which observations never got a
    forecast?"): left side exploded, right side single-bucket, preserved.
    `how="full"` composes: the left-outer result UNION the never-matched
    right rows (found with a LEFT ANTI join against the exploded left —
    the anti's preserved side is never exploded, so no duplicate
    null-extensions), left-only columns typed-null. All four variants are
    equi-joins on (keys…, bucket); the outer ones carry the residual in
    the join condition.

    Key columns in the output follow Spark's name-join convention: one
    `on` column per key, populated from whichever side the row came from
    (coalesced for `full`).

    Column name collisions between left and right (other than `on`) must be
    resolved by the caller (alias/rename) — same contract as `DataFrame.join`.
    """
    if how not in ("inner", "left", "right", "full"):
        raise NotImplementedError(
            "band_join supports how in {'inner','left','right','full'}"
        )
    tol = int(tolerance_sec)

    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))

    if how == "inner":
        lefts = left.withColumn(_LEPOCH, l_epoch).withColumn(
            _BUCKET,
            F.explode(
                F.array(
                    F.floor(F.col(_LEPOCH) / tol) - 1,
                    F.floor(F.col(_LEPOCH) / tol),
                    F.floor(F.col(_LEPOCH) / tol) + 1,
                )
            ),
        )
        rights = right.withColumn(_REPOCH, r_epoch).withColumn(
            _BUCKET, F.floor(F.col(_REPOCH) / tol)
        )
        joined = lefts.join(rights, [*on, _BUCKET], "inner").filter(
            F.abs(F.col(_LEPOCH) - F.col(_REPOCH)) < tol
        )
        return joined.drop(_BUCKET, _LEPOCH, _REPOCH)

    if how in ("left", "full"):
        # left outer: single bucket on the left, exploded buckets + renamed
        # keys on the right; equi-keys AND the residual together form the join
        # condition, so "no qualifying right row" → one null-extended left row
        rbucket = _BUCKET + "_r"
        rkeys = {k: f"__band_r_{k}" for k in on}
        lefts = left.withColumn(_LEPOCH, l_epoch).withColumn(
            _BUCKET, F.floor(F.col(_LEPOCH) / tol)
        )
        rights = right.withColumn(_REPOCH, r_epoch).withColumn(
            rbucket,
            F.explode(
                F.array(
                    F.floor(F.col(_REPOCH) / tol) - 1,
                    F.floor(F.col(_REPOCH) / tol),
                    F.floor(F.col(_REPOCH) / tol) + 1,
                )
            ),
        )
        for k, rk in rkeys.items():
            rights = rights.withColumnRenamed(k, rk)
        cond = (F.col(_BUCKET) == F.col(rbucket)) & (
            F.abs(F.col(_LEPOCH) - F.col(_REPOCH)) < tol
        )
        for k, rk in rkeys.items():
            cond = cond & (F.col(k) == F.col(rk))
        joined = lefts.join(rights, cond, "left")
        outer = joined.drop(_BUCKET, rbucket, _LEPOCH, _REPOCH, *rkeys.values())
        if how == "left":
            return outer
        # full = left-outer ∪ never-matched right rows, null-extended on the
        # left's non-key columns. The anti join's PRESERVED side is the raw
        # (unexploded) right, so each unmatched right row survives exactly
        # once; the probe side is the exploded left, keeping the plan an
        # equi-join on (keys…, bucket) + residual.
        lkeys = {k: f"__band_l_{k}" for k in on}
        probe = left.withColumn(_LEPOCH, l_epoch).withColumn(
            _BUCKET,
            F.explode(
                F.array(
                    F.floor(F.col(_LEPOCH) / tol) - 1,
                    F.floor(F.col(_LEPOCH) / tol),
                    F.floor(F.col(_LEPOCH) / tol) + 1,
                )
            ),
        )
        for k, lk in lkeys.items():
            probe = probe.withColumnRenamed(k, lk)
        rights_plain = right.withColumn(_REPOCH, r_epoch).withColumn(
            rbucket, F.floor(F.col(_REPOCH) / tol)
        )
        anti_cond = (F.col(rbucket) == F.col(_BUCKET)) & (
            F.abs(F.col(_LEPOCH) - F.col(_REPOCH)) < tol
        )
        for k, lk in lkeys.items():
            anti_cond = anti_cond & (F.col(k) == F.col(lk))
        unmatched_r = rights_plain.join(probe, anti_cond, "left_anti").drop(
            rbucket, _REPOCH
        )
        left_types = {f.name: f.dataType for f in left.schema.fields}
        um_cols = set(unmatched_r.columns)
        # one parsed select, not 3 py4j round-trips per column
        null_extended = unmatched_r.selectExpr(
            *[
                f"`{c}`"
                if c in um_cols  # `on` keys + right columns
                else (  # left-only
                    f"CAST(NULL AS {left_types[c].simpleString()}) AS `{c}`"
                )
                for c in outer.columns
            ]
        )
        return outer.unionByName(null_extended)

    # right outer: mirror of left — exploded buckets + renamed keys on the
    # LEFT, single bucket on the preserved right; each true pair meets at
    # the right row's own bucket, unmatched right rows null-extend once
    lbucket = _BUCKET + "_l"
    lkeys = {k: f"__band_l_{k}" for k in on}
    lefts = left.withColumn(_LEPOCH, l_epoch).withColumn(
        lbucket,
        F.explode(
            F.array(
                F.floor(F.col(_LEPOCH) / tol) - 1,
                F.floor(F.col(_LEPOCH) / tol),
                F.floor(F.col(_LEPOCH) / tol) + 1,
            )
        ),
    )
    for k, lk in lkeys.items():
        lefts = lefts.withColumnRenamed(k, lk)
    rights = right.withColumn(_REPOCH, r_epoch).withColumn(
        _BUCKET, F.floor(F.col(_REPOCH) / tol)
    )
    cond = (F.col(lbucket) == F.col(_BUCKET)) & (
        F.abs(F.col(_LEPOCH) - F.col(_REPOCH)) < tol
    )
    for k, lk in lkeys.items():
        cond = cond & (F.col(lk) == F.col(k))
    joined = lefts.join(rights, cond, "right")
    return joined.drop(_BUCKET, lbucket, _LEPOCH, _REPOCH, *lkeys.values())


def band_join_condition(
    left_key: Column, right_key: Column, left_ts: Column, right_ts: Column, tolerance_sec: int
) -> Column:
    """The literal (non-bucketed) join condition, for small inputs/tests."""
    return (left_key == right_key) & (
        F.abs(F.unix_timestamp(left_ts) - F.unix_timestamp(right_ts)) < tolerance_sec
    )
