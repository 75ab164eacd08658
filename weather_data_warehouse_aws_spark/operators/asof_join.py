"""As-of (nearest-predecessor) join — the ordered cousin of the band join.

The reference's accuracy view matches EVERY observation within ±1 h
(many-to-many band join, `create_views.sql:109-115`). The as-of variant —
"the latest right-side row at or before each left row" — is what most
time-series systems ship (SURVEY §4 item 2 names it as the scale idiom).
Spark has no built-in; this implements it as a sort-merge-over-union:

    union(left tagged 1, right tagged 0)
    window PARTITION BY keys ORDER BY (ts, tag) ROWS UNBOUNDED PRECEDING
    last(right_payload IGNORE NULLS)  →  carried forward to each left row

One shuffle on the keys, one sort per partition — exactly the cost of a
sort-merge join, with no range-explosion risk. Ordering `(ts, tag)` puts a
right row BEFORE a left row at equal timestamps, so `t_left == t_right`
matches (ASOF `>=` semantics, same as DuckDB/Pandas merge_asof backward).

Scale note: parallelism = distinct key groups. A single monster key (one
user with billions of events) serializes that key's sort; the fix at that
extreme is time-range chunking with boundary carry-over, not salting (which
would break the running `last`). Keys like user_id/location_key are fine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TAG = "__asof_is_left"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    tolerance_sec: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """Left join each left row to the nearest right row in the same key
    group — the full pandas-`merge_asof` direction matrix:

    * ``backward`` (default): most recent right with ``right_ts <= left_ts``
      (DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``);
    * ``forward``: earliest right with ``right_ts >= left_ts``;
    * ``nearest``: whichever of the two is closer in absolute time,
      ties broken toward the backward match.

    Right payload columns (everything except keys + right_ts) come back
    suffixed. Rows with no match keep nulls. `tolerance_sec` drops matches
    farther than the window (match becomes null, row is kept).

    All three directions ride the same single shuffle on the keys; forward
    adds a second sort (opposite tie order) within the same exchange, and
    nearest evaluates both windows then picks per row — still no join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward | forward | nearest")
    on = list(on)
    right_payload_cols = [c for c in right.columns if c not in on]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_payload_cols}

    payload = F.struct(*[F.col(c) for c in right_payload_cols])
    # a right row with a NULL timestamp can never be a temporal match — and
    # left in, it would sort to the partition HEAD (NULLS FIRST) with a
    # non-null payload struct, becoming the spurious "predecessor" of every
    # early left row
    rhs = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_TAG),
        payload.alias(_PAYLOAD),
    )
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(rhs.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    rhs_aligned = rhs.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) if c not in on else F.col(c) for c in left.columns],
        "__asof_ts",
        _TAG,
        _PAYLOAD,
    )

    unioned = lhs.unionByName(rhs_aligned)
    # backward: right rows sort BEFORE left at equal ts (tag asc), running
    # last() over the preceding frame → latest right_ts <= left_ts.
    # final tiebreak: payload hash — without it, two right rows sharing
    # (keys, ts) are ordered by shuffle accident and last()/first() picks a
    # different one per run/repartitioning; the hash makes the pick
    # deterministic (and is a no-op when (keys, ts) is unique)
    tiebreak = F.xxhash64(_PAYLOAD)
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__asof_ts"), F.col(_TAG), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: right rows sort AFTER left at equal ts (tag desc), first()
    # over the following frame → earliest right_ts >= left_ts. Same
    # partitioning ⇒ same exchange; only the sort differs.
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__asof_ts"), F.col(_TAG).desc(), tiebreak)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned
    if direction in ("backward", "nearest"):
        carried = carried.withColumn(
            "__asof_back", F.last(_PAYLOAD, ignorenulls=True).over(w_back)
        )
    if direction in ("forward", "nearest"):
        carried = carried.withColumn(
            "__asof_fwd", F.first(_PAYLOAD, ignorenulls=True).over(w_fwd)
        )

    result = carried.filter(F.col(_TAG) == 1)

    def gap(m):  # seconds from match to the left row; >=0 back, <=0 fwd
        return F.unix_timestamp("__asof_ts") - F.unix_timestamp(
            m.getField(right_ts)
        )

    def in_tol(m):
        if tolerance_sec is None:
            return m
        return F.when(F.abs(gap(m)) <= tolerance_sec, m)

    if direction == "backward":
        match = in_tol(F.col("__asof_back"))
    elif direction == "forward":
        match = in_tol(F.col("__asof_fwd"))
    else:
        # tolerance gates each candidate BEFORE the pick (merge_asof
        # semantics: a near forward match wins over an out-of-window
        # backward one, not the reverse)
        back, fwd = in_tol(F.col("__asof_back")), in_tol(F.col("__asof_fwd"))
        match = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(F.abs(gap(fwd)) < F.abs(gap(back)), fwd)
            .otherwise(back)  # tie → backward
        )
    # a left row with a NULL timestamp has no temporal position: no match,
    # row preserved (the forward window would otherwise hand it the
    # partition's earliest right row)
    match = F.when(F.col("__asof_ts").isNotNull(), match)
    return result.select(
        *[F.col(c) for c in left.columns],
        *[match.getField(c).alias(out_names[c]) for c in right_payload_cols],
    )
