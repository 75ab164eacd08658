"""Deterministic synthetic OpenWeather feed (replaces the reference Lambda).

The reference's extractor (`weather_extractor_lambda.py:26-80,92-146`) calls
the OpenWeather API for 8 fixed cities daily, envelopes each payload with
``extraction_timestamp, batch_id, data_type, city_name, country``, and lands
one JSON array per data_type under hive-style
``raw/{current,forecast}/year=/month=/day=/hour=/`` keys. This module
produces the same bronze layout from a seeded RNG so the whole pipeline is
reproducible (seed=42 convention, TESTDATA.md).

This is a feed *simulator* — bronze data arrives from outside the engine at
scale, so driver-side generation here is not a scalability statement. Value
domains follow FIXTURES.md F1-F3: a few out-of-range/null rows to exercise
the DQ gates, duplicate (city, extraction_timestamp) rows to exercise
dropDuplicates, and per-batch presence/absence of `wind.gust` to exercise
optional-field handling.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random

# Exact city seed list from the reference (weather_extractor_lambda.py:12-21)
CITIES = [
    {"name": "New York", "lat": 40.7128, "lon": -74.0060, "country": "US", "tz": -18000},
    {"name": "London", "lat": 51.5074, "lon": -0.1278, "country": "GB", "tz": 0},
    {"name": "Tokyo", "lat": 35.6762, "lon": 139.6503, "country": "JP", "tz": 32400},
    {"name": "Sydney", "lat": -33.8688, "lon": 151.2093, "country": "AU", "tz": 36000},
    {"name": "Mumbai", "lat": 19.0760, "lon": 72.8777, "country": "IN", "tz": 19800},
    {"name": "Dubai", "lat": 25.2048, "lon": 55.2708, "country": "AE", "tz": 14400},
    {"name": "São Paulo", "lat": -23.5505, "lon": -46.6333, "country": "BR", "tz": -10800},
    {"name": "Toronto", "lat": 43.6532, "lon": -79.3832, "country": "CA", "tz": -10800},
]

CONDITIONS = ["Clear", "Clouds", "Rain", "Haze", "Smoke", "Snow", "Thunderstorm"]

_BASE_TEMP = {
    "New York": 12.0,
    "London": 10.0,
    "Tokyo": 15.0,
    "Sydney": 20.0,
    "Mumbai": 29.0,
    "Dubai": 33.0,
    "São Paulo": 22.0,
    "Toronto": 6.0,
}


def _city_temp(rng: random.Random, city: str, when: dt.datetime) -> float:
    diurnal = 5.0 * (1 if 9 <= when.hour <= 18 else -1)
    return round(_BASE_TEMP[city] + diurnal + rng.uniform(-4, 4), 2)


def _envelope(city: dict, batch_ts: dt.datetime, data_type: str) -> dict:
    # reference weather_extractor_lambda.py:109-116
    return {
        "city_name": city["name"],
        "country": city["country"],
        "extraction_timestamp": batch_ts.strftime("%Y-%m-%dT%H:%M:%S"),
        "batch_id": batch_ts.strftime("%Y%m%d_%H%M%S"),
        "data_type": data_type,
    }


def _current_payload(
    rng: random.Random, city: dict, batch_ts: dt.datetime, include_gust: bool
) -> dict:
    temp = _city_temp(rng, city["name"], batch_ts)
    rec = _envelope(city, batch_ts, "current")
    rec.update(
        {
            "coord": {"lat": city["lat"], "lon": city["lon"]},
            "main": {
                "temp": temp,
                "feels_like": round(temp + rng.uniform(-2, 3), 2),
                "temp_min": round(temp - rng.uniform(0, 3), 2),
                "temp_max": round(temp + rng.uniform(0, 3), 2),
                "humidity": rng.randint(20, 100),
                "pressure": rng.randint(990, 1035),
            },
            "wind": {"speed": round(rng.uniform(0, 15), 2), "deg": rng.randint(0, 359)},
            "clouds": {"all": rng.randint(0, 100)},
            "visibility": rng.choice([None, 10000, rng.randint(1000, 10000)]),
            "weather": [
                {
                    "main": rng.choice(CONDITIONS),
                    "description": "synthetic condition",
                }
            ],
            "timezone": city["tz"],
            "sys": {
                "sunrise": int(
                    batch_ts.replace(hour=6, minute=0, second=0).timestamp()
                ),
                "sunset": int(batch_ts.replace(hour=18, minute=0, second=0).timestamp()),
            },
        }
    )
    if include_gust:
        rec["wind"]["gust"] = round(rng.uniform(0, 25), 2)
    return rec


def _forecast_payload(rng: random.Random, city: dict, batch_ts: dt.datetime) -> dict:
    rec = _envelope(city, batch_ts, "forecast")
    points = []
    base = batch_ts.replace(minute=0, second=0, microsecond=0)
    for i in range(40):  # 5 days @ 3h — reference README.md:339-340
        for_time = base + dt.timedelta(hours=3 * (i + 1))
        temp = _city_temp(rng, city["name"], for_time) + rng.uniform(-3, 3)
        points.append(
            {
                "dt": int(for_time.timestamp()),
                "main": {
                    "temp": round(temp, 2),
                    "feels_like": round(temp + rng.uniform(-2, 3), 2),
                    "humidity": rng.randint(20, 100),
                    "pressure": rng.randint(990, 1035),
                },
                "wind": {"speed": round(rng.uniform(0, 15), 2), "deg": rng.randint(0, 359)},
                "clouds": {"all": rng.randint(0, 100)},
                "pop": rng.choice([None, round(rng.random(), 2)]),
                "weather": [{"main": rng.choice(CONDITIONS)}],
            }
        )
    rec["list"] = points
    return rec


def _bronze_key(prefix: str, data_type: str, ts: dt.datetime) -> str:
    # reference weather_extractor_lambda.py:67 keyspace
    return (
        f"{prefix}/raw/{data_type}/year={ts.year}/month={ts.month:02d}/"
        f"day={ts.day:02d}/hour={ts.hour:02d}/{data_type}_{ts.strftime('%H%M%S')}.json"
    )


def generate_bronze(
    out_dir: str,
    start: dt.date = dt.date(2024, 1, 1),
    days: int = 3,
    extractions_per_day: int = 1,
    seed: int = 42,
    dq_violations: bool = True,
) -> dict[str, int]:
    """Write a deterministic bronze landing zone; returns file counts."""
    rng = random.Random(seed)
    counts = {"current": 0, "forecast": 0}
    for d in range(days):
        day = start + dt.timedelta(days=d)
        for e in range(extractions_per_day):
            batch_ts = dt.datetime(
                day.year, day.month, day.day, 6 + e * (12 // max(1, extractions_per_day)), 0, 0
            )
            include_gust = rng.random() < 0.7  # per-batch optional field (X4)
            current = [
                _current_payload(rng, c, batch_ts, include_gust) for c in CITIES
            ]
            if dq_violations:
                bad = dict(current[0])
                bad["main"] = dict(bad["main"], temp=75.0)  # out of [-50,60]
                current.append(bad)
                dup = json.loads(json.dumps(current[1]))  # duplicate key pair
                current.append(dup)
                nul = json.loads(json.dumps(current[2]))
                nul["main"] = dict(nul["main"], temp=None)  # null temp
                current.append(nul)
            forecast = [_forecast_payload(rng, c, batch_ts) for c in CITIES]

            for data_type, payloads in (("current", current), ("forecast", forecast)):
                path = _bronze_key(out_dir, data_type, batch_ts)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "w", encoding="utf-8") as f:
                    json.dump(payloads, f)  # JSON array ⇒ multiLine read
                counts[data_type] += 1
    return counts
