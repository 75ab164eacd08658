"""`weatherfeed` — a PySpark Python DataSource for the synthetic weather
feed: the S7 ingestion edge as a first-class pluggable SOURCE instead of a
driver-side file generator.

The reference's extraction edge is a scheduled Lambda calling the
OpenWeather REST API per city (`weather_extractor_lambda.py:26-80`). Spark's
Python DataSource API (SPARK-44076, public since 4.0) is the idiomatic way
to mount such an edge directly into the engine:

    spark.dataSource.register(WeatherFeedDataSource)
    df = (spark.read.format("weatherfeed")
          .option("start", "2024-01-01").option("days", 3).load())

Scale design — the part that matters at 100 TB:

* `partitions()` declares one `InputPartition` PER EXTRACTION BATCH, so
  reads fan out across executors; a real REST edge would shard by
  (city-page, time-window) the same way and own rate-limit/backoff inside
  `read()`. The planner sees a normal multi-partition scan — downstream
  repartition/AQE behave as with any file source.
* Each partition re-seeds its OWN `random.Random(f"{seed}:{index}")` —
  rows are reproducible WITHOUT any cross-partition draw order. (The
  bronze file generator (`pipeline/generate.py`) deliberately keeps the
  reference Lambda's sequential single-RNG shape; that shape cannot be
  distributed, which is exactly why a pluggable source re-derives
  per-batch seeds instead.) String seeding hashes via sha512, so values
  are stable across processes and PYTHONHASHSEED.
* Rows are emitted FLAT (the envelope + main/wind/clouds fields the
  silver projection consumes) rather than nested JSON: the source is the
  right place to shed structure the pipeline would immediately explode.

The per-row value domains reuse `pipeline/generate.py`'s synthesis
(`_current_payload`) so both edges describe the same feed.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

FEED_SCHEMA = (
    "city_name string, country string, extraction_timestamp timestamp, "
    "batch_id string, lat double, lon double, temp double, feels_like double, "
    "temp_min double, temp_max double, humidity int, pressure int, "
    "wind_speed double, wind_deg int, wind_gust double, clouds_all int, "
    "visibility int, condition string, sunrise bigint, sunset bigint"
)

# forecast mode (`option("data_type", "forecast")`): one row per
# (city, horizon point) — 40 points @ 3 h, the reference's 5-day forecast
# (README.md:339-340). `forecast_dt` stays an epoch BIGINT (like
# sunrise/sunset) so values are timezone-independent on the wire.
FORECAST_FEED_SCHEMA = (
    "city_name string, country string, extraction_timestamp timestamp, "
    "batch_id string, forecast_dt bigint, temp double, feels_like double, "
    "humidity int, pressure int, wind_speed double, wind_deg int, "
    "clouds_all int, pop double, condition string"
)


def _batch_ts(start: dt.date, idx: int, extractions_per_day: int) -> dt.datetime:
    d, e = divmod(idx, extractions_per_day)
    day = start + dt.timedelta(days=d)
    hour = 6 + e * (12 // max(1, extractions_per_day))
    return dt.datetime(day.year, day.month, day.day, hour, 0, 0)


def _feed_rows(seed: int, idx: int, batch_ts: dt.datetime) -> list[tuple]:
    """One extraction batch: every city's flattened current observation,
    from a batch-local RNG (same draw order as `_current_payload` so the
    two edges share value domains)."""
    from ..pipeline.generate import CITIES, _current_payload

    rng = random.Random(f"{seed}:{idx}")
    include_gust = rng.random() < 0.7  # per-batch optional field (X4)
    out = []
    for c in CITIES:
        p = _current_payload(rng, c, batch_ts, include_gust)
        out.append(
            (
                p["city_name"],
                p["country"],
                batch_ts,
                p["batch_id"],
                p["coord"]["lat"],
                p["coord"]["lon"],
                p["main"]["temp"],
                p["main"]["feels_like"],
                p["main"]["temp_min"],
                p["main"]["temp_max"],
                p["main"]["humidity"],
                p["main"]["pressure"],
                p["wind"]["speed"],
                p["wind"]["deg"],
                p["wind"].get("gust"),
                p["clouds"]["all"],
                p["visibility"],
                p["weather"][0]["main"],
                p["sys"]["sunrise"],
                p["sys"]["sunset"],
            )
        )
    return out


def _forecast_rows(seed: int, idx: int, batch_ts: dt.datetime) -> list[tuple]:
    """One extraction batch's flattened forecast: (city × 40 points) rows
    from a batch-local RNG (`:forecast`-suffixed stream so the current and
    forecast draws of the same batch are independent — per-batch
    reproducibility without any cross-data-type draw-order coupling)."""
    from ..pipeline.generate import CITIES, _forecast_payload

    rng = random.Random(f"{seed}:{idx}:forecast")
    out = []
    for c in CITIES:
        p = _forecast_payload(rng, c, batch_ts)
        for pt in p["list"]:
            out.append(
                (
                    p["city_name"],
                    p["country"],
                    batch_ts,
                    p["batch_id"],
                    pt["dt"],
                    pt["main"]["temp"],
                    pt["main"]["feels_like"],
                    pt["main"]["humidity"],
                    pt["main"]["pressure"],
                    pt["wind"]["speed"],
                    pt["wind"]["deg"],
                    pt["clouds"]["all"],
                    pt["pop"],
                    pt["weather"][0]["main"],
                )
            )
    return out


class WeatherFeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = dt.date.fromisoformat(options.get("start", "2024-01-01"))
        self.days = int(options.get("days", 3))
        self.extractions_per_day = int(options.get("extractions_per_day", 1))
        self.seed = int(options.get("seed", 42))
        self.data_type = options.get("data_type", "current")
        if self.days < 0 or self.extractions_per_day < 1:
            raise ValueError("days must be >= 0, extractions_per_day >= 1")
        if self.data_type not in ("current", "forecast"):
            raise ValueError("data_type must be 'current' or 'forecast'")

    def partitions(self):
        n = self.days * self.extractions_per_day
        return [InputPartition(i) for i in range(n)]

    def read(self, partition: InputPartition):
        if partition is None:
            # an empty partitions() list (days=0) still gets one probe
            # call with partition=None — an empty feed, not an error
            return
        idx = partition.value
        ts = _batch_ts(self.start, idx, self.extractions_per_day)
        rows = (
            _feed_rows(self.seed, idx, ts)
            if self.data_type == "current"
            else _forecast_rows(self.seed, idx, ts)
        )
        yield from rows


class WeatherFeedStreamReader(SimpleDataSourceStreamReader):
    """The scheduled-extraction edge as a STREAM: one micro-batch per
    extraction batch, offset = the next batch index. The reference runs
    this cadence with EventBridge→Lambda (`template.yaml` schedule);
    Structured Streaming owns it natively — the checkpoint stores the
    offset, so restart resumes at the exact batch the last run committed
    (`readBetweenOffsets` replays any uncommitted range DETERMINISTICALLY
    from the same per-batch seeds; no external replay buffer needed).

    `read` emits ONE batch per trigger regardless of wall-clock: the feed
    is synthetic, so there is always a next batch — a real REST edge
    would instead emit everything newer than its high-watermark."""

    def __init__(self, options: dict):
        self.start = dt.date.fromisoformat(options.get("start", "2024-01-01"))
        self.extractions_per_day = int(options.get("extractions_per_day", 1))
        self.seed = int(options.get("seed", 42))
        self.data_type = options.get("data_type", "current")
        if self.data_type not in ("current", "forecast"):
            raise ValueError("data_type must be 'current' or 'forecast'")

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _rows(self, idx: int) -> list[tuple]:
        ts = _batch_ts(self.start, idx, self.extractions_per_day)
        if self.data_type == "forecast":
            return _forecast_rows(self.seed, idx, ts)
        return _feed_rows(self.seed, idx, ts)

    def read(self, start: dict):
        idx = int(start["index"])
        return iter(self._rows(idx)), {"index": idx + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for idx in range(int(start["index"]), int(end["index"])):
            yield from self._rows(idx)


class WeatherFeedDataSource(DataSource):
    """`format("weatherfeed")` batch + streaming source. Options: `start`
    (ISO date, default 2024-01-01), `days` (batch only, default 3),
    `extractions_per_day` (default 1), `seed` (default 42)."""

    @classmethod
    def name(cls) -> str:
        return "weatherfeed"

    def schema(self) -> str:
        if self.options.get("data_type", "current") == "forecast":
            return FORECAST_FEED_SCHEMA
        return FEED_SCHEMA

    def reader(self, schema) -> WeatherFeedReader:
        return WeatherFeedReader(self.options)

    def simpleStreamReader(self, schema) -> WeatherFeedStreamReader:
        return WeatherFeedStreamReader(self.options)


def register_feed_source(spark) -> None:
    spark.dataSource.register(WeatherFeedDataSource)
