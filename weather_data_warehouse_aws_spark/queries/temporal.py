"""Temporal queries: band join, as-of join, date spine, windowed event aggs
(SURVEY §2.3 J4, §2.5, §2.9 X3, §2.10 streaming-equivalent batch).

events.ts is microsecond-precision; every epoch we emit is second-truncated
(`unix_timestamp` in Spark ≡ `floor(epoch())` in DuckDB) so both engines
hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.asof_join import asof_join
from ..operators.band_join import band_join
from ..operators.interval_join import interval_join, interval_overlap_join
from ..operators.rollup_time import cascade_rollup, tagged_union
from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# q_band_join_events — time-proximity many-to-many join (J4)
# ---------------------------------------------------------------------------
def q_band_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast↔actual accuracy-join analog (`create_views.sql:109-115`):
    match each *view* event to every *purchase* by the same user strictly
    within 1 hour, exactly the reference's |Δt| < 3600 semantics.

    Runs through the bucketed band-join operator: equi-join on
    (user_id, hour-bucket) after exploding the left side to adjacent
    buckets — the plan that survives 8-distinct-key scale (see
    operators/band_join.py).
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    matched = band_join(
        views, purchases, on=["user_id"], left_ts="view_ts", right_ts="purchase_ts",
        tolerance_sec=3600,
    )
    return matched.select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")).alias("gap_seconds"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# q_band_join_left — outer band join: unmatched left rows survive (J4 ext.)
# ---------------------------------------------------------------------------
def q_band_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`band_join(how="left")`: every view keeps a row even when no purchase
    lands within the hour — the "keep unmatched forecasts" extension of the
    reference's inner-only accuracy view (`create_views.sql:109-115`). The
    bucketed rewrite (right side exploded, residual inside the outer join
    condition) is differential-tested here against DuckDB's LITERAL left
    band join, proving rewrite ≡ semantics."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    matched = band_join(
        views, purchases, on=["user_id"], left_ts="view_ts", right_ts="purchase_ts",
        tolerance_sec=3600, how="left",
    )
    return matched.select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")).alias("gap_seconds"),
        F.round("purchase_value", 2).alias("purchase_value"),
        F.col("purchase_id").isNotNull().alias("matched"),
    )


def _band_sides(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return views, purchases


def q_band_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full band-join type matrix in one tagged relation, so a single
    driver CORRECTNESS row covers the reference's strict-inner accuracy
    semantics (J4, `create_views.sql:109-115`) AND every outer extension —
    left ("forecasts that never verified"), right ("observations that never
    got a forecast"), full — all running through the bucketed rewrite in
    operators/band_join.py, differential-tested against DuckDB's LITERAL
    inequality joins (50-entry-registry consolidation, like `ann_methods`)."""
    inner = (
        q_band_join_events(spark, sf_dir)
        .withColumn("variant", F.lit("inner"))
        .withColumn("matched", F.lit(True))
    )
    left = q_band_join_left(spark, sf_dir).withColumn("variant", F.lit("left"))

    def outer_variant(how: str) -> DataFrame:
        views, purchases = _band_sides(spark, sf_dir)
        matched = band_join(
            views, purchases, on=["user_id"], left_ts="view_ts",
            right_ts="purchase_ts", tolerance_sec=3600, how=how,
        )
        return matched.select(
            F.lit(how).alias("variant"),
            "user_id",
            "view_id",
            "purchase_id",
            (
                F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
            ).alias("gap_seconds"),
            F.round("purchase_value", 2).alias("purchase_value"),
            (
                F.col("purchase_id").isNotNull() & F.col("view_id").isNotNull()
            ).alias("matched"),
        )

    return (
        inner.unionByName(left)
        .select(
            "variant", "user_id", "view_id", "purchase_id",
            "gap_seconds", "purchase_value", "matched",
        )
        .unionByName(outer_variant("right"))
        .unionByName(outer_variant("full"))
        .orderBy("variant", "user_id", "view_id", "purchase_id")
    )


# ---------------------------------------------------------------------------
# q_interval_join — asymmetric point-in-range join (attribution windows)
# ---------------------------------------------------------------------------
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution windows: each purchase opens a half-open 2-hour interval
    `[ts, ts+2h)`; match every same-user click inside it. The asymmetric
    generalization of the J4 band join — arbitrary-length intervals, strict
    half-open bounds — through the bucket-explode equi rewrite
    (operators/interval_join.py). All four join types ride one tagged
    relation (inner / left = clicks preserved / right = windows that
    converted nothing / full), plus the `overlap_*` variants: each click
    also opens a half-open 30-minute BROWSING interval `[ts, ts+30m)`, and
    the fully general interval×interval overlap join
    (operators/interval_join.py::interval_overlap_join — claim-bucket
    rewrite, no dedup pass) matches browsing intervals to the purchase
    windows they overlap. The oracle is DuckDB's LITERAL inequality join
    per type (`l.start < r.end AND r.start < l.end` for overlap), proving
    rewrite ≡ semantics including both boundary edges, endpoint-touch
    non-overlap, and the outer null-extensions."""
    ev = load_table(spark, sf_dir, "events")
    windows = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )

    def variant(how: str) -> DataFrame:
        matched = interval_join(
            clicks, windows, on=["user_id"], point_ts="click_ts",
            start_ts="win_start", end_ts="win_end", bucket_sec=7200, how=how,
        )
        return matched.select(
            F.lit(how).alias("variant"),
            "user_id",
            "purchase_id",
            "click_id",
            (F.unix_timestamp("click_ts") - F.unix_timestamp("win_start")).alias(
                "secs_into_window"
            ),
        )

    browsing = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("br_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("br_end"),
    )

    def overlap_variant(how: str) -> DataFrame:
        matched = interval_overlap_join(
            browsing, windows, on=["user_id"],
            left_start="br_start", left_end="br_end",
            right_start="win_start", right_end="win_end",
            bucket_sec=3600, how=how,
        )
        return matched.select(
            F.lit(f"overlap_{how}").alias("variant"),
            "user_id",
            "purchase_id",
            "click_id",
            (
                F.unix_timestamp(F.least("br_end", "win_end"))
                - F.unix_timestamp(F.greatest("br_start", "win_start"))
            ).alias("secs_into_window"),
        )

    return (
        variant("inner")
        .unionByName(variant("left"))
        .unionByName(variant("right"))
        .unionByName(variant("full"))
        .unionByName(overlap_variant("inner"))
        .unionByName(overlap_variant("left"))
        .unionByName(overlap_variant("right"))
        .unionByName(overlap_variant("full"))
        .orderBy("variant", "user_id", "purchase_id", "click_id")
    )


_INTERVAL_ORACLE_TMPL = """
SELECT
    '{how}' AS variant,
    {uid} AS user_id,
    p.event_id AS purchase_id,
    c.event_id AS click_id,
    CAST(FLOOR(epoch(c.ts)) AS BIGINT)
      - CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS secs_into_window
FROM (SELECT * FROM events WHERE event_type = 'click') c
{join} JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND c.ts >= p.ts
 AND c.ts < p.ts + INTERVAL 2 HOUR
"""

_OVERLAP_ORACLE_TMPL = """
SELECT
    'overlap_{how}' AS variant,
    {uid} AS user_id,
    p.event_id AS purchase_id,
    c.event_id AS click_id,
    CAST(FLOOR(epoch(LEAST(c.ts + INTERVAL 30 MINUTE, p.ts + INTERVAL 2 HOUR))) AS BIGINT)
      - CAST(FLOOR(epoch(GREATEST(c.ts, p.ts))) AS BIGINT) AS secs_into_window
FROM (SELECT * FROM events WHERE event_type = 'click') c
{join} JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND c.ts < p.ts + INTERVAL 2 HOUR
 AND p.ts < c.ts + INTERVAL 30 MINUTE
"""

ORACLE_INTERVAL_JOIN = (
    _INTERVAL_ORACLE_TMPL.format(how="inner", uid="c.user_id", join="")
    + " UNION ALL "
    + _INTERVAL_ORACLE_TMPL.format(how="left", uid="c.user_id", join="LEFT")
    + " UNION ALL "
    + _INTERVAL_ORACLE_TMPL.format(how="right", uid="p.user_id", join="RIGHT")
    + " UNION ALL "
    + _INTERVAL_ORACLE_TMPL.format(
        how="full", uid="COALESCE(c.user_id, p.user_id)", join="FULL"
    )
    + " UNION ALL "
    + _OVERLAP_ORACLE_TMPL.format(how="inner", uid="c.user_id", join="")
    + " UNION ALL "
    + _OVERLAP_ORACLE_TMPL.format(how="left", uid="c.user_id", join="LEFT")
    + " UNION ALL "
    + _OVERLAP_ORACLE_TMPL.format(how="right", uid="p.user_id", join="RIGHT")
    + " UNION ALL "
    + _OVERLAP_ORACLE_TMPL.format(
        how="full", uid="COALESCE(c.user_id, p.user_id)", join="FULL"
    )
    + " ORDER BY variant, user_id, purchase_id, click_id"
)


ORACLE_BAND_JOIN_LEFT = """
SELECT
    v.user_id AS user_id,
    v.event_id AS view_id,
    p.event_id AS purchase_id,
    CAST(FLOOR(epoch(p.ts)) AS BIGINT) - CAST(FLOOR(epoch(v.ts)) AS BIGINT) AS gap_seconds,
    ROUND(p.value, 2) AS purchase_value,
    p.event_id IS NOT NULL AS matched
FROM (SELECT * FROM events WHERE event_type = 'view') v
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND ABS(CAST(FLOOR(epoch(v.ts)) AS BIGINT) - CAST(FLOOR(epoch(p.ts)) AS BIGINT)) < 3600
"""


ORACLE_BAND_JOIN_EVENTS = """
SELECT
    v.user_id AS user_id,
    v.event_id AS view_id,
    p.event_id AS purchase_id,
    CAST(FLOOR(epoch(p.ts)) AS BIGINT) - CAST(FLOOR(epoch(v.ts)) AS BIGINT) AS gap_seconds,
    ROUND(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND ABS(CAST(FLOOR(epoch(v.ts)) AS BIGINT) - CAST(FLOOR(epoch(p.ts)) AS BIGINT)) < 3600
"""


# ---------------------------------------------------------------------------
# q_asof_join — nearest-predecessor join (scale idiom for J4, SURVEY §4.2)
# ---------------------------------------------------------------------------
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full as-of direction matrix over one click/purchase feed, tagged
    per variant: `backward` = latest click at-or-before each purchase by
    the same user, `forward` = earliest click at-or-after, `nearest` =
    whichever is closer in absolute seconds (ties → backward).

    Spark side: sort-merge-over-union as-of operator (operators/asof_join.py,
    direction parameter). Oracle: DuckDB's native ASOF JOIN for both
    directions — an independent implementation of the same semantics, which
    is exactly what makes this a strong differential test — and nearest as
    the CASE-pick over the two ASOF CTEs with the same second-floored gap
    arithmetic. Clicks are pre-deduped per (user, ts) so ties can't differ.
    `gap_seconds` is signed (purchase − click): ≥0 backward, ≤0 forward.
    """
    ev = load_table(spark, sf_dir, "events")
    # deterministic tie-break: one click per (user_id, ts), keep max event_id
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", F.col("ts").alias("click_ts"), "click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    branches = []
    for direction in ("backward", "forward", "nearest"):
        joined = asof_join(
            purchases, clicks, on=["user_id"], left_ts="purchase_ts",
            right_ts="click_ts", direction=direction,
        )
        branches.append(
            joined.select(
                F.lit(direction).alias("variant"),
                "user_id",
                "purchase_id",
                "click_id",
                (
                    F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
                ).alias("gap_seconds"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


ORACLE_ASOF_JOIN = """
WITH clicks AS (
    SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
    FROM events WHERE event_type = 'click'
    GROUP BY user_id, ts
),
purchases AS (
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
    FROM events WHERE event_type = 'purchase'
),
back AS (
    SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
),
fwd AS (
    SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.purchase_ts <= c.click_ts
)
SELECT 'backward' AS variant, user_id, purchase_id, click_id,
       CAST(FLOOR(epoch(purchase_ts)) AS BIGINT)
         - CAST(FLOOR(epoch(click_ts)) AS BIGINT) AS gap_seconds
FROM back
UNION ALL
SELECT 'forward', user_id, purchase_id, click_id,
       CAST(FLOOR(epoch(purchase_ts)) AS BIGINT)
         - CAST(FLOOR(epoch(click_ts)) AS BIGINT)
FROM fwd
UNION ALL
-- nearest: same second-floored gap arithmetic as the engine; ties and
-- single-sided matches resolve to the backward candidate
SELECT 'nearest', b.user_id, b.purchase_id,
       CASE WHEN b.click_id IS NULL THEN f.click_id
            WHEN f.click_id IS NULL THEN b.click_id
            WHEN ABS(CAST(FLOOR(epoch(b.purchase_ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(f.click_ts)) AS BIGINT))
               < ABS(CAST(FLOOR(epoch(b.purchase_ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(b.click_ts)) AS BIGINT))
            THEN f.click_id ELSE b.click_id END,
       CASE WHEN b.click_id IS NULL THEN
                 CAST(FLOOR(epoch(b.purchase_ts)) AS BIGINT)
                   - CAST(FLOOR(epoch(f.click_ts)) AS BIGINT)
            WHEN f.click_id IS NULL THEN
                 CAST(FLOOR(epoch(b.purchase_ts)) AS BIGINT)
                   - CAST(FLOOR(epoch(b.click_ts)) AS BIGINT)
            WHEN ABS(CAST(FLOOR(epoch(b.purchase_ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(f.click_ts)) AS BIGINT))
               < ABS(CAST(FLOOR(epoch(b.purchase_ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(b.click_ts)) AS BIGINT))
            THEN CAST(FLOOR(epoch(b.purchase_ts)) AS BIGINT)
                   - CAST(FLOOR(epoch(f.click_ts)) AS BIGINT)
            ELSE CAST(FLOOR(epoch(b.purchase_ts)) AS BIGINT)
                   - CAST(FLOOR(epoch(b.click_ts)) AS BIGINT) END
FROM back b
JOIN fwd f USING (user_id, purchase_id)
"""


# ---------------------------------------------------------------------------
# q_date_spine — generated date dimension (X3, F6, F7, P9)
# ---------------------------------------------------------------------------
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-dimension spine over the orders date range — the reference's
    dim_date (`build_dimensions.py:99-145`) built with SQL `sequence()`
    instead of a 1096-iteration driver loop.

    Spark `dayofweek` is 1=Sunday; DuckDB's is 0=Sunday → oracle adds 1.
    All calendar parts cast to int on both sides (DuckDB's default is BIGINT).
    """
    from ..pipeline.gold import build_dim_date

    orders = load_table(spark, sf_dir, "orders")
    lo, hi = orders.agg(
        F.min(F.to_date("o_orderdate")), F.max(F.to_date("o_orderdate"))
    ).collect()[0]
    dd = build_dim_date(spark, str(lo), str(hi))
    return dd.select(
        "full_date",
        "date_key",
        "year",
        "quarter",
        "month",
        "month_name",
        "day",
        "day_of_week",
        "day_name",
        "week_of_year",
        "is_weekend",
        "is_holiday",
    )


ORACLE_DATE_SPINE = """
WITH bounds AS (
    SELECT CAST(MIN(o_orderdate) AS DATE) AS lo, CAST(MAX(o_orderdate) AS DATE) AS hi
    FROM orders
),
spine AS (
    SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS full_date FROM bounds
)
SELECT
    full_date,
    CAST(strftime(full_date, '%Y%m%d') AS INT) AS date_key,
    CAST(year(full_date) AS INT) AS year,
    CAST(quarter(full_date) AS INT) AS quarter,
    CAST(month(full_date) AS INT) AS month,
    monthname(full_date) AS month_name,
    CAST(day(full_date) AS INT) AS day,
    CAST(dayofweek(full_date) + 1 AS INT) AS day_of_week,
    dayname(full_date) AS day_name,
    CAST(weekofyear(full_date) AS INT) AS week_of_year,
    (dayofweek(full_date) + 1) IN (1, 7) AS is_weekend,
    FALSE AS is_holiday
FROM spine
"""


# ---------------------------------------------------------------------------
# q_events_hourly — tumbling-window aggregation (streaming-equivalent batch)
# ---------------------------------------------------------------------------
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over the event stream: the batch twin of the
    Structured Streaming job in streaming/jobs.py (same logical plan —
    that's the point of the Dataset API).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count(F.col("user_id")).alias("n_with_user"),
        )
        .orderBy("window_start", "event_type")
    )


ORACLE_EVENTS_HOURLY = """
SELECT
    date_trunc('hour', ts) AS window_start,
    event_type,
    COUNT(*) AS n_events,
    ROUND(SUM(value), 2) AS total_value,
    COUNT(user_id) AS n_with_user
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_events_rollup — cascading hour→day→month rollup (continuous aggregates)
# ---------------------------------------------------------------------------
FUNNEL_STEPS = ("view", "click", "purchase")


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time rollups + behavioral analytics in one tagged relation.

    Hour/day/month grains: the hourly grain is the reference's agg-view
    analog (`create_views.sql:39-68`); coarser grains are re-aggregated
    FROM the hourly partials (operators/rollup_time.py), never from raw.
    The oracle computes every grain DIRECTLY from raw rows, so the driver
    hash proves cascade-from-partials ≡ direct — the invariant that makes
    continuous aggregates trustworthy. Sums stay raw through the cascade
    and round only here; avg divides the snapped sum by the exact count
    (both engines deterministic on the 2dp grid, see gap_fill).

    `funnel` rows (operators/behavior.funnel_steps): strictly-ordered
    view→click→purchase first-touch funnel; event_type = step name,
    n_events = users reached, total_value = floor-quantized fraction of
    step 1, n_with_user = step index.

    `cohort` rows (operators/behavior.cohort_retention): weekly retention
    triangle from each user's first event; grain_start = cohort week,
    event_type = 'w<offset>', n_events = active users, total_value =
    retention vs offset 0, n_with_user = cohort size."""
    from ..operators.behavior import cohort_retention, funnel_steps

    ev = load_table(spark, sf_dir, "events")
    grains = cascade_rollup(
        ev, ts_col="ts", keys=["event_type"],
        sum_cols=["value"], count_cols=["user_id"],
        grains=("hour", "day", "month"),
    )
    rollups = tagged_union(grains).select(
        "grain",
        "grain_start",
        "event_type",
        F.col("n_rows").alias("n_events"),
        F.round("sum_value", 2).alias("total_value"),
        (F.round("sum_value", 2) / F.col("n_rows")).alias("avg_value"),
        F.col("n_user_id").alias("n_with_user"),
    )
    funnel = funnel_steps(ev, FUNNEL_STEPS).select(
        F.lit("funnel").alias("grain"),
        F.lit(None).cast("timestamp").alias("grain_start"),
        F.col("step").alias("event_type"),
        F.col("n_users").cast("long").alias("n_events"),
        F.col("pct_of_first").alias("total_value"),
        F.lit(None).cast("double").alias("avg_value"),
        F.col("step_index").cast("long").alias("n_with_user"),
    )
    cohort = cohort_retention(ev, grain="week").select(
        F.lit("cohort").alias("grain"),
        F.col("cohort_start").alias("grain_start"),
        F.concat(F.lit("w"), F.col("offset").cast("string")).alias("event_type"),
        F.col("n_active").cast("long").alias("n_events"),
        F.col("retention").alias("total_value"),
        F.lit(None).cast("double").alias("avg_value"),
        F.col("cohort_size").cast("long").alias("n_with_user"),
    )
    return (
        rollups.unionByName(funnel)
        .unionByName(cohort)
        .orderBy("grain", "grain_start", "event_type")
    )


def _oracle_grain(g: str) -> str:
    return f"""
SELECT '{g}' AS grain,
       date_trunc('{g}', ts) AS grain_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value,
       ROUND(SUM(value), 2) / COUNT(*) AS avg_value,
       COUNT(user_id) AS n_with_user
FROM events
GROUP BY 1, 2, 3"""


_ORACLE_FUNNEL = """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
),
counts AS (
    SELECT 1 AS step_index, 'view' AS step, (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
)
SELECT 'funnel' AS grain, CAST(NULL AS TIMESTAMP) AS grain_start,
       step AS event_type, CAST(n_users AS BIGINT) AS n_events,
       FLOOR(CAST(n_users AS DOUBLE) / (SELECT n_users FROM counts WHERE step_index = 1) * 10000) / 10000 AS total_value,
       CAST(NULL AS DOUBLE) AS avg_value,
       CAST(step_index AS BIGINT) AS n_with_user
FROM counts
"""

_ORACLE_COHORT = """
WITH firsts AS (
    SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_start
    FROM events GROUP BY 1
),
active AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
),
per AS (
    SELECT cohort_start,
           CAST(date_diff('day', cohort_start, p) / 7 AS INT) AS ofs,
           COUNT(*) AS n_active
    FROM active JOIN firsts USING (user_id)
    GROUP BY 1, 2
),
size AS (
    SELECT cohort_start, n_active AS cohort_size FROM per WHERE ofs = 0
)
SELECT 'cohort' AS grain, cohort_start AS grain_start,
       'w' || CAST(ofs AS VARCHAR) AS event_type,
       CAST(n_active AS BIGINT) AS n_events,
       FLOOR(CAST(n_active AS DOUBLE) / cohort_size * 10000) / 10000 AS total_value,
       CAST(NULL AS DOUBLE) AS avg_value,
       CAST(cohort_size AS BIGINT) AS n_with_user
FROM per JOIN size USING (cohort_start)
"""

ORACLE_EVENTS_ROLLUP = f"""
{_oracle_grain('hour')}
UNION ALL
{_oracle_grain('day')}
UNION ALL
{_oracle_grain('month')}
UNION ALL
SELECT * FROM ({_ORACLE_FUNNEL.strip()})
UNION ALL
SELECT * FROM ({_ORACLE_COHORT.strip()})
ORDER BY grain, grain_start, event_type
"""


# ---------------------------------------------------------------------------
# q_sessionize — gap-based session windows (gaps-and-islands)
# ---------------------------------------------------------------------------
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap, computed BOTH ways
    and emitted under one hash gate: the classic lag + running-sum-of-breaks
    window chain, and Spark's built-in `session_window` grouping (the batch
    form of the Structured Streaming operator). Both shuffle once on
    user_id and scale linearly; their boundary semantics agree exactly
    (events spaced exactly `gap` apart merge; strictly more closes the
    session — verified empirically and pinned by the union hashing equal).
    The oracle is the gaps-and-islands SQL twice, so a driver hash match
    certifies the built-in operator against first-principles SQL.
    """
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = 1800
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts").over(w_user))
        .withColumn(
            "is_break",
            (
                F.col("prev_ts").isNull()
                | ((F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")) > gap)
            ).cast("int"),
        )
        .withColumn("session_seq", F.sum("is_break").over(w_user))
    )
    manual = sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
        F.unix_timestamp(F.max("ts")).alias("session_end_epoch"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )
    by_start = Window.partitionBy("user_id").orderBy("session_start_epoch")
    builtin = (
        ev.groupBy("user_id", F.session_window("ts", f"{gap} seconds").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
            F.unix_timestamp(F.max("ts")).alias("session_end_epoch"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .drop("sw")
        .withColumn("session_seq", F.row_number().over(by_start).cast("long"))
    )
    cols = [
        "method",
        "user_id",
        "session_seq",
        "n_events",
        "session_start_epoch",
        "session_end_epoch",
        "session_value",
    ]
    return (
        manual.withColumn("method", F.lit("manual"))
        .select(cols)
        .unionByName(builtin.withColumn("method", F.lit("session_window")).select(cols))
        .orderBy("method", "user_id", "session_seq")
    )


ORACLE_SESSIONIZE = """
WITH laggy AS (
    SELECT user_id, ts, event_id, value,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
breaks AS (
    SELECT *,
           CASE WHEN prev_ts IS NULL
                  OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(prev_ts)) AS BIGINT) > 1800
                THEN 1 ELSE 0 END AS is_break
    FROM laggy
),
sessions AS (
    SELECT *,
           CAST(SUM(is_break) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_seq
    FROM breaks
),
agg AS (
    SELECT
        user_id,
        session_seq,
        COUNT(*) AS n_events,
        CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
        CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS session_end_epoch,
        ROUND(SUM(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
)
-- the engine emits the same sessions from the manual window chain AND the
-- built-in session_window operator; a hash match certifies both
SELECT 'manual' AS method, * FROM agg
UNION ALL
SELECT 'session_window' AS method, * FROM agg
ORDER BY method, user_id, session_seq
"""


ORACLE_BAND_JOIN_RIGHT = """
SELECT
    p.user_id AS user_id,
    v.event_id AS view_id,
    p.event_id AS purchase_id,
    CAST(FLOOR(epoch(p.ts)) AS BIGINT) - CAST(FLOOR(epoch(v.ts)) AS BIGINT) AS gap_seconds,
    ROUND(p.value, 2) AS purchase_value,
    p.event_id IS NOT NULL AND v.event_id IS NOT NULL AS matched
FROM (SELECT * FROM events WHERE event_type = 'view') v
RIGHT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND ABS(CAST(FLOOR(epoch(v.ts)) AS BIGINT) - CAST(FLOOR(epoch(p.ts)) AS BIGINT)) < 3600
"""


ORACLE_BAND_JOIN_FULL = """
SELECT
    COALESCE(v.user_id, p.user_id) AS user_id,
    v.event_id AS view_id,
    p.event_id AS purchase_id,
    CAST(FLOOR(epoch(p.ts)) AS BIGINT) - CAST(FLOOR(epoch(v.ts)) AS BIGINT) AS gap_seconds,
    ROUND(p.value, 2) AS purchase_value,
    p.event_id IS NOT NULL AND v.event_id IS NOT NULL AS matched
FROM (SELECT * FROM events WHERE event_type = 'view') v
FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND ABS(CAST(FLOOR(epoch(v.ts)) AS BIGINT) - CAST(FLOOR(epoch(p.ts)) AS BIGINT)) < 3600
"""


ORACLE_BAND_JOINS = f"""
SELECT 'inner' AS variant, user_id, view_id, purchase_id,
       gap_seconds, purchase_value, TRUE AS matched
FROM ({ORACLE_BAND_JOIN_EVENTS})
UNION ALL
SELECT 'left' AS variant, user_id, view_id, purchase_id,
       gap_seconds, purchase_value, matched
FROM ({ORACLE_BAND_JOIN_LEFT})
UNION ALL
SELECT 'right' AS variant, user_id, view_id, purchase_id,
       gap_seconds, purchase_value, matched
FROM ({ORACLE_BAND_JOIN_RIGHT})
UNION ALL
SELECT 'full' AS variant, user_id, view_id, purchase_id,
       gap_seconds, purchase_value, matched
FROM ({ORACLE_BAND_JOIN_FULL})
ORDER BY variant, user_id, view_id, purchase_id
"""


QUERIES = {
    "band_joins": q_band_joins,
    "interval_join": q_interval_join,
    "asof_join": q_asof_join,
    "date_spine": q_date_spine,
    "events_rollup": q_events_rollup,
    "sessionize": q_sessionize,
}

ORACLE = {
    "band_joins": ORACLE_BAND_JOINS,
    "interval_join": ORACLE_INTERVAL_JOIN,
    "asof_join": ORACLE_ASOF_JOIN,
    "date_spine": ORACLE_DATE_SPINE,
    "events_rollup": ORACLE_EVENTS_ROLLUP,
    "sessionize": ORACLE_SESSIONIZE,
}


# ---------------------------------------------------------------------------
# q_moving_avg — windowed frame spec (ROWS BETWEEN), dashboard-trend shape
# ---------------------------------------------------------------------------
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals + 3-day trailing moving average + EWMA per event type —
    the 'last-N-days trend' panel the reference builds in QuickSight
    (SURVEY §2.5 notes the dashboards imply time-ordered slices). Frame
    windows partition by type: parallel across groups, ordered scan within.

    EWMA (exponential smoothing, y_t = α·x_t + (1-α)·y_{t-1}) is the
    recursive operator windows can't express directly; here it's an
    ordered prefix-list frame + a sequential HOF fold — JVM-side, and with
    α = 1/2 every multiply is an exact binary scale, so the fold is
    bit-identical in any engine that folds in list order (DuckDB
    list_reduce seeds with the first element — mirrored by the NULL-init
    CASE here). Prefix-list frames hold O(n²/2) values per group — fine
    for series of thousands of points; for very long series use a
    per-group applyInPandas sequential scan instead."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.round(F.sum("value"), 2).alias("daily_total"), F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-2, Window.currentRow)
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ewma = F.expr(
        "round(aggregate(__prefix, CAST(NULL AS DOUBLE),"
        " (acc, x) -> CASE WHEN acc IS NULL THEN x"
        " ELSE 0.5D * x + 0.5D * acc END), 4)"
    )
    return (
        daily.withColumn("ma3", F.round(F.avg("daily_total").over(w), 4))
        .withColumn("__prefix", F.collect_list("daily_total").over(wp))
        .withColumn("ewma", ewma)
        .select("day", "event_type", "daily_total", "n", "ma3", "ewma")
        .orderBy("day", "event_type")
    )


ORACLE_MOVING_AVG = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, event_type,
           ROUND(SUM(value), 2) AS daily_total,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
)
SELECT day, event_type, daily_total, n, ma3,
       -- list_filter mirrors Spark collect_list's NULL-skipping (DuckDB
       -- list() keeps NULLs, which would poison the fold); the CASE guards
       -- list_reduce's empty-list error when a prefix is all-NULL (Spark's
       -- NULL-init fold returns NULL there too)
       ROUND(CASE WHEN len(list_filter(pl, x -> x IS NOT NULL)) = 0 THEN NULL
             ELSE list_reduce(
                 list_filter(pl, x -> x IS NOT NULL),
                 (acc, x) -> 0.5 * x + 0.5 * acc
             ) END, 4) AS ewma
FROM (
    SELECT day, event_type, daily_total, n,
           ROUND(AVG(daily_total) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS ma3,
           list(daily_total) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS pl
    FROM daily
)
ORDER BY day, event_type
"""


QUERIES["moving_avg"] = q_moving_avg
ORACLE["moving_avg"] = ORACLE_MOVING_AVG


# ---------------------------------------------------------------------------
# q_gap_fill — dense time spine + forward fill (time-series repair)
# ---------------------------------------------------------------------------
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly avg(value) per event_type over a DENSE hour spine, with empty
    hours forward-filled from the last observed hour (`last(ignorenulls)`
    over an UNBOUNDED PRECEDING frame) — the standard sensor/observation
    repair the weather domain needs when a station misses a reading.

    Scale: the spine is `sequence()` (generated distributed, never a driver
    loop) crossed with the tiny type dim; the fact side aggregates once on
    (type, hour). The fill window partitions by event_type ordered by hour —
    bounded rows per partition after aggregation, no raw-row windows. At
    petabyte scale partition the window by (type, day) with a boundary
    carry-over pass if a single type's history outgrows one task.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(
            # ROUND(SUM, 2) snaps to the 2dp grid identically in both engines
            # (values are 2dp; sums never approach a .005 boundary); dividing
            # the snapped sum by the exact count is deterministic IEEE, so
            # the quotient is bit-identical WITHOUT further rounding — per-row
            # round(avg, k) would disagree at half boundaries (e.g. 51.51125).
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.count("*").alias("n_events"),
        )
    )
    spine = spark.sql(
        "SELECT explode(sequence(timestamp'2024-01-01 00:00:00', "
        "timestamp'2024-01-30 23:00:00', interval 1 hour)) AS hour"
    )
    types = ev.select("event_type").distinct()
    dense = spine.crossJoin(types)

    fill_w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias("n_events"),
            F.col("avg_value").isNull().alias("is_gap"),
            F.last("avg_value", ignorenulls=True).over(fill_w).alias("filled_value"),
        )
        .orderBy("event_type", "hour")
    )


ORACLE_GAP_FILL = """
WITH hourly AS (
    SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           ROUND(SUM(value), 2) / COUNT(*) AS avg_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
),
spine AS (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                  TIMESTAMP '2024-01-30 23:00:00',
                                  INTERVAL 1 HOUR)) AS hour
),
dense AS (
    SELECT t.event_type, s.hour
    FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT d.event_type, d.hour,
       COALESCE(h.n_events, 0) AS n_events,
       h.avg_value IS NULL AS is_gap,
       LAST_VALUE(h.avg_value IGNORE NULLS) OVER (
           PARTITION BY d.event_type ORDER BY d.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value
FROM dense d LEFT JOIN hourly h ON d.event_type = h.event_type AND d.hour = h.hour
ORDER BY d.event_type, d.hour
"""

QUERIES["gap_fill"] = q_gap_fill
ORACLE["gap_fill"] = ORACLE_GAP_FILL
