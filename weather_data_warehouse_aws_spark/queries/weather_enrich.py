"""Silver-derivation differential, consolidated (50-entry cap): five tagged
branches under one driver row, each pinning a reference semantic cross-engine
on observations both engines synthesize identically from `events`:

* ``enrich``          — heat-index CASE (P11) + is_daytime census, THE column
                        objects the silver pipeline uses (functions/weather.py),
                        oracle built from the same SQL template constants.
* ``daytime_boundary``— P6 timestamp-range predicate: observations planted at
                        hour granularity so some land EXACTLY on sunrise/sunset;
                        the position CASE × the shared BETWEEN expression pins
                        inclusive-both-ends semantics (`bronze_to_silver.py:94-100`).
* ``current_filter``  — P7 boolean-equality filter `is_current = TRUE` over a
                        window-derived currency flag (the dim_city current-row
                        filter shape, `create_views.sql:16`).
* ``epoch_seconds``   — F2 epoch→timestamp (`timestamp_seconds`, the silver
                        `dt` path `bronze_to_silver.py:49`) verified tz-proof:
                        both engines emit the reconstructed instant's epoch,
                        never a rendered local timestamp.
* ``optional_default``— X4 schema-introspection default: the absent `gust`
                        column gated on `df.columns` exactly like
                        `_wind_gust_col` (pipeline/silver.py:53,
                        `bronze_to_silver.py:35-42`); oracle applies the same
                        static default.
* ``pseudo``          — operators/privacy.py keyed pseudonymization under
                        the hash gate: the 20 busiest users grouped BY
                        THEIR sha256 TOKEN, so a driver match pins (a) the
                        token bytes cross-engine (Spark sha2 ≡ DuckDB
                        sha256 on the secret|domain|value preimage) and
                        (b) that tokenized identifiers stay groupable —
                        the property the whole pseudonymize-then-analyze
                        workflow rests on.

Common schema (variant, group_key, n, checksum) — checksum is SUM(event_id)
(or epoch-of-day sum for the F2 branch) so the hash gate pins the exact row
membership of every branch, not just sizes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.weather import (
    HEAT_INDEX_SQL,
    IS_DAYTIME_SQL,
    heat_index_category,
    is_daytime,
)
from ..sources.tables import load_table

# demo secret for the oracle branch — a fixed literal so both engines build
# the identical preimage; real deployments inject theirs from a secret store
PSEUDO_SECRET = "wdwa-oracle-secret"


def _synth_obs(ev: DataFrame) -> DataFrame:
    """Deterministic observation synthesis shared by the branches:
    feels_like sweeps the full CASE range (value ∈ [0,100] → [-10, 50] hits
    every heat band incl. the exact >10/>26/>32/>40 boundaries via integer
    quantization); obs_time lands on hour slots 0..24 of the event's day so
    slots 6 and 18 coincide exactly with sunrise/sunset."""
    day_start = F.date_trunc("day", F.col("ts"))
    return ev.select(
        "event_id",
        (F.floor(F.col("value") * 10) / 100 * 6 - 10).alias("feels_like"),
        F.col("ts").alias("observation_time"),
        (
            day_start
            + F.make_interval(hours=(F.col("event_id") % 25).cast("int"))
        ).alias("slot_time"),
        (day_start + F.expr("INTERVAL 6 HOURS")).alias("sunrise_time"),
        (day_start + F.expr("INTERVAL 18 HOURS")).alias("sunset_time"),
    )


def q_weather_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = _synth_obs(ev)

    schema = lambda variant, df: df.select(  # noqa: E731
        F.lit(variant).alias("variant"),
        F.col("group_key").cast("string").alias("group_key"),
        F.col("n").cast("long").alias("n"),
        F.col("checksum").cast("long").alias("checksum"),
    )

    # -- enrich: heat CASE × is_daytime census (P11 + the silver columns) --
    enrich = schema(
        "enrich",
        obs.select(
            "event_id",
            heat_index_category(F.col("feels_like")).alias("cat"),
            is_daytime(
                F.col("observation_time"), F.col("sunrise_time"), F.col("sunset_time")
            ).alias("day"),
        )
        .groupBy("cat", "day")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("checksum"))
        .select(
            F.concat_ws("/", "cat", F.col("day").cast("string")).alias("group_key"),
            "n",
            "checksum",
        ),
    )

    # -- daytime_boundary: P6 BETWEEN inclusivity at exact boundary hits --
    pos = (
        F.when(F.col("slot_time") < F.col("sunrise_time"), "before")
        .when(F.col("slot_time") == F.col("sunrise_time"), "at_sunrise")
        .when(F.col("slot_time") < F.col("sunset_time"), "inside")
        .when(F.col("slot_time") == F.col("sunset_time"), "at_sunset")
        .otherwise("after")
    )
    boundary = schema(
        "daytime_boundary",
        obs.select(
            "event_id",
            pos.alias("pos"),
            is_daytime(
                F.col("slot_time"), F.col("sunrise_time"), F.col("sunset_time")
            ).alias("day"),
        )
        .groupBy("pos", "day")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("checksum"))
        .select(
            F.concat_ws("/", "pos", F.col("day").cast("string")).alias("group_key"),
            "n",
            "checksum",
        ),
    )

    # -- current_filter: P7 boolean equality on a derived currency flag --
    w = Window.partitionBy("user_id")
    current = schema(
        "current_filter",
        ev.select(
            "event_id",
            "event_type",
            (F.col("ts") == F.max("ts").over(w)).alias("is_current"),
        )
        .filter(F.col("is_current") == F.lit(True))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("checksum"))
        .withColumnRenamed("event_type", "group_key"),
    )

    # -- epoch_seconds: F2 epoch→timestamp, instant-equality (tz-proof) --
    epoch = F.unix_timestamp("ts")
    recon_epoch = F.unix_timestamp(F.timestamp_seconds(epoch))
    epochs = schema(
        "epoch_seconds",
        ev.select(
            recon_epoch.alias("recon_epoch"),
            (recon_epoch == epoch).alias("ok"),
        )
        .groupBy("ok")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("recon_epoch") % 86400).alias("checksum"),
        )
        .select(
            F.concat(F.lit("roundtrip="), F.col("ok").cast("string")).alias(
                "group_key"
            ),
            "n",
            "checksum",
        ),
    )

    # -- optional_default: X4 column-presence introspection, like
    # _wind_gust_col — events has no `gust`, so the static default applies;
    # the same code path would coalesce if the column existed --
    gust = (
        F.coalesce(F.col("gust"), F.lit(0.0)) if "gust" in ev.columns else F.lit(0.0)
    )
    optional = schema(
        "optional_default",
        ev.select("event_id", gust.alias("gust"))
        .filter(F.col("gust") == 0.0)
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("checksum"))
        .select(F.lit("gust_default").alias("group_key"), "n", "checksum"),
    )

    # -- pseudo: sha256 keyed tokens group identically to raw user_ids --
    from ..operators.privacy import pseudonym_token

    pseudo = schema(
        "pseudo",
        ev.filter(F.col("user_id").isNotNull())
        .select(
            pseudonym_token(
                F.col("user_id"), secret=PSEUDO_SECRET, domain="user_id"
            ).alias("group_key"),
            "event_id",
        )
        .groupBy("group_key")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("checksum"))
        .orderBy(F.col("n").desc(), "group_key")
        .limit(20),
    )

    branches = [enrich, boundary, current, epochs, optional, pseudo]
    return reduce(lambda a, b: a.unionByName(b), branches).orderBy(
        "variant", "group_key"
    )


_HEAT = HEAT_INDEX_SQL.format(c="feels_like")
_DAY_OBS = IS_DAYTIME_SQL.format(
    o="observation_time", r="sunrise_time", s="sunset_time"
)
_DAY_SLOT = IS_DAYTIME_SQL.format(o="slot_time", r="sunrise_time", s="sunset_time")

ORACLE_WEATHER_ENRICH = f"""
WITH obs AS (
    SELECT
        event_id,
        FLOOR(value * 10) / 100 * 6 - 10 AS feels_like,
        ts AS observation_time,
        date_trunc('day', ts) + to_hours(CAST(event_id % 25 AS BIGINT)) AS slot_time,
        date_trunc('day', ts) + INTERVAL 6 HOUR AS sunrise_time,
        date_trunc('day', ts) + INTERVAL 18 HOUR AS sunset_time
    FROM events
),
enrich AS (
    SELECT 'enrich' AS variant,
           ({_HEAT}) || '/' || CAST(({_DAY_OBS}) AS VARCHAR) AS group_key,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS checksum
    FROM obs GROUP BY 1, 2
),
boundary AS (
    SELECT 'daytime_boundary' AS variant,
           (CASE
                WHEN slot_time < sunrise_time THEN 'before'
                WHEN slot_time = sunrise_time THEN 'at_sunrise'
                WHEN slot_time < sunset_time THEN 'inside'
                WHEN slot_time = sunset_time THEN 'at_sunset'
                ELSE 'after'
            END) || '/' || CAST(({_DAY_SLOT}) AS VARCHAR) AS group_key,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS checksum
    FROM obs GROUP BY 1, 2
),
flagged AS (
    SELECT event_id, event_type,
           ts = MAX(ts) OVER (PARTITION BY user_id) AS is_current
    FROM events
),
current_f AS (
    SELECT 'current_filter' AS variant,
           event_type AS group_key,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS checksum
    FROM flagged WHERE is_current = TRUE GROUP BY 1, 2
),
epochs AS (
    SELECT 'epoch_seconds' AS variant,
           'roundtrip=' || CAST(
               CAST(FLOOR(epoch(to_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT)))) AS BIGINT)
               = CAST(FLOOR(epoch(ts)) AS BIGINT) AS VARCHAR) AS group_key,
           COUNT(*) AS n,
           CAST(SUM(
               CAST(FLOOR(epoch(to_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT)))) AS BIGINT)
               % 86400) AS BIGINT) AS checksum
    FROM events GROUP BY 1, 2
),
optional_d AS (
    SELECT 'optional_default' AS variant,
           'gust_default' AS group_key,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS checksum
    FROM (SELECT event_id, 0.0 AS gust FROM events) WHERE gust = 0.0
),
pseudo AS (
    SELECT 'pseudo' AS variant, group_key, n, checksum FROM (
        SELECT {{token}} AS group_key,
               COUNT(*) AS n,
               CAST(SUM(event_id) AS BIGINT) AS checksum
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, group_key LIMIT 20
    )
)
SELECT * FROM enrich
UNION ALL SELECT * FROM boundary
UNION ALL SELECT * FROM current_f
UNION ALL SELECT * FROM epochs
UNION ALL SELECT * FROM optional_d
UNION ALL SELECT * FROM pseudo
ORDER BY variant, group_key
"""

from ..operators.privacy import pseudonym_token_sql  # noqa: E402

ORACLE_WEATHER_ENRICH = ORACLE_WEATHER_ENRICH.replace(
    "{token}",
    pseudonym_token_sql("user_id", secret=PSEUDO_SECRET, domain="user_id"),
)


QUERIES = {"weather_enrich": q_weather_enrich}
ORACLE = {"weather_enrich": ORACLE_WEATHER_ENRICH}
