"""Land the `weatherfeed` DataSource into the bronze zone — the S7
ingestion edge consumed BY the pipeline, not just registered beside it.

The reference's extraction edge is EventBridge→Lambda→S3: each scheduled
invocation calls the REST API per city for BOTH data types and PUTs one
JSON array per data_type under the hive-style bronze keyspace
(`weather_extractor_lambda.py:60-80,118-133`). Here the same edge is the
pluggable `weatherfeed` source (`sources/feed_source.py`, current +
forecast modes), and this module is the landing writer that turns its flat
rows back into the reference's bronze envelope/array/key layout — so
`read_bronze → build_silver_* → run_pipeline` runs UNCHANGED over
feed-landed data, and the batch and streaming modes of the source land
bit-identical files for the same seed (per-batch RNG; the two modes share
`_feed_rows` / `_forecast_rows`).

Scale note: a landing batch is one REST extraction (8 cities ≈ KBs flat,
~320 forecast points) — the per-micro-batch `collect()` here is the
protocol-mandated landing shape, same as the reference Lambda buffering
one response before the S3 PUT; the distributed part of the pipeline
starts at the silver scan. The STREAMING mode is the architectural story:
the checkpoint stores the feed offset, so a crashed/re-run ingest resumes
at the exact batch the last run committed instead of re-landing (or
skipping) extractions.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import SparkSession

from ..sources.feed_source import register_feed_source
from .generate import CITIES, _bronze_key

_TZ_BY_CITY = {c["name"]: c["tz"] for c in CITIES}
_CITY_ORDER = {c["name"]: i for i, c in enumerate(CITIES)}


def _current_payload_of(row) -> dict:
    """Re-nest one flat current-feed row into the bronze envelope
    (`generate._current_payload` shape; reference
    `weather_extractor_lambda.py:109-116`)."""
    rec = {
        "city_name": row["city_name"],
        "country": row["country"],
        "extraction_timestamp": row["extraction_timestamp"].strftime(
            "%Y-%m-%dT%H:%M:%S"
        ),
        "batch_id": row["batch_id"],
        "data_type": "current",
        "coord": {"lat": row["lat"], "lon": row["lon"]},
        "main": {
            "temp": row["temp"],
            "feels_like": row["feels_like"],
            "temp_min": row["temp_min"],
            "temp_max": row["temp_max"],
            "humidity": row["humidity"],
            "pressure": row["pressure"],
        },
        "wind": {"speed": row["wind_speed"], "deg": row["wind_deg"]},
        "clouds": {"all": row["clouds_all"]},
        "visibility": row["visibility"],
        "weather": [
            {"main": row["condition"], "description": "synthetic condition"}
        ],
        "timezone": _TZ_BY_CITY[row["city_name"]],
        "sys": {"sunrise": row["sunrise"], "sunset": row["sunset"]},
    }
    if row["wind_gust"] is not None:
        rec["wind"]["gust"] = row["wind_gust"]
    return rec


def _forecast_payload_of(city_rows: list) -> dict:
    """Re-nest one city's flat forecast-point rows into the bronze
    forecast envelope (`generate._forecast_payload` shape)."""
    head = city_rows[0]
    points = [
        {
            "dt": r["forecast_dt"],
            "main": {
                "temp": r["temp"],
                "feels_like": r["feels_like"],
                "humidity": r["humidity"],
                "pressure": r["pressure"],
            },
            "wind": {"speed": r["wind_speed"], "deg": r["wind_deg"]},
            "clouds": {"all": r["clouds_all"]},
            "pop": r["pop"],
            "weather": [{"main": r["condition"]}],
        }
        for r in sorted(city_rows, key=lambda r: r["forecast_dt"])
    ]
    return {
        "city_name": head["city_name"],
        "country": head["country"],
        "extraction_timestamp": head["extraction_timestamp"].strftime(
            "%Y-%m-%dT%H:%M:%S"
        ),
        "batch_id": head["batch_id"],
        "data_type": "forecast",
        "list": points,
    }


def _land_rows(bronze_dir: str, rows, data_type: str) -> int:
    """Write one JSON array per extraction batch at the reference keyspace.
    Returns files written. City order follows the reference's fixed list so
    repeated landings are byte-identical.

    DRIVER-SIDE LANDING, BY CONTRACT: callers `.collect()` each extraction
    batch to the driver before calling this — deliberately reproducing the
    reference Lambda's single-process landing (one JSON array per file,
    KB-scale batches: 8 cities × a few extractions). This path is sized
    for that feed; do NOT copy it for a high-volume feed — land big feeds
    executor-side (`df.write.json` / a streaming sink) instead."""
    by_batch: dict[str, list] = {}
    for row in rows:
        by_batch.setdefault(row["batch_id"], []).append(row)
    n = 0
    for batch_id in sorted(by_batch):
        batch_rows = sorted(
            by_batch[batch_id], key=lambda r: _CITY_ORDER[r["city_name"]]
        )
        ts = dt.datetime.strptime(batch_id, "%Y%m%d_%H%M%S")
        path = _bronze_key(bronze_dir, data_type, ts)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if data_type == "current":
            payloads = [_current_payload_of(r) for r in batch_rows]
        else:
            by_city: dict[str, list] = {}
            for r in batch_rows:
                by_city.setdefault(r["city_name"], []).append(r)
            payloads = [
                _forecast_payload_of(by_city[c["name"]])
                for c in CITIES
                if c["name"] in by_city
            ]
        with open(path, "w", encoding="utf-8") as f:
            json.dump(payloads, f)
        n += 1
    return n


def feed_batch_to_bronze(
    spark: SparkSession,
    bronze_dir: str,
    *,
    start: str = "2024-01-01",
    days: int = 3,
    extractions_per_day: int = 1,
    seed: int = 42,
) -> dict[str, int]:
    """Batch mode: one `weatherfeed` scan per data type (one input
    partition per extraction batch) landed as bronze JSON. Returns file
    counts per data type — the same contract as `generate_bronze`."""
    register_feed_source(spark)
    counts = {}
    for data_type in ("current", "forecast"):
        rows = (
            spark.read.format("weatherfeed")
            .option("start", start)
            .option("days", days)
            .option("extractions_per_day", extractions_per_day)
            .option("seed", seed)
            .option("data_type", data_type)
            .load()
            .collect()
        )
        counts[data_type] = _land_rows(bronze_dir, rows, data_type)
    return counts


def feed_stream_to_bronze(
    spark: SparkSession,
    bronze_dir: str,
    checkpoint_dir: str,
    *,
    n_triggers: int = 1,
    start: str = "2024-01-01",
    extractions_per_day: int = 1,
    seed: int = 42,
    data_types: tuple[str, ...] = ("current", "forecast"),
) -> int:
    """Streaming mode: `n_triggers` once-triggered micro-batches through
    the CHECKPOINTED stream reader (one extraction batch per trigger),
    each landed via foreachBatch — one stream per data type, each with its
    own checkpoint subdir (offsets advance independently, exactly like the
    reference Lambda's two sequential API calls per invocation).
    Restartable: a later call with the same checkpoint resumes at the next
    unlanded extraction — the EventBridge cadence with exactly-once
    landing instead of fire-and-forget. Returns files written by THIS
    call."""
    register_feed_source(spark)
    written = 0

    def _mk_sink(data_type: str):
        def _sink(batch_df, batch_id: int) -> None:
            nonlocal written
            written += _land_rows(bronze_dir, batch_df.collect(), data_type)

        return _sink

    for data_type in data_types:
        sink = _mk_sink(data_type)
        for _ in range(n_triggers):
            q = (
                spark.readStream.format("weatherfeed")
                .option("start", start)
                .option("extractions_per_day", extractions_per_day)
                .option("seed", seed)
                .option("data_type", data_type)
                .load()
                .writeStream.foreachBatch(sink)
                .option(
                    "checkpointLocation",
                    os.path.join(checkpoint_dir, data_type),
                )
                .trigger(once=True)
                .start()
            )
            q.awaitTermination()
    return written
