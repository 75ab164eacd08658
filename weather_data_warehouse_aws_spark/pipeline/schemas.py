"""Explicit bronze schemas (FIXTURES.md F1/F2).

The reference infers schema at read time (`bronze_to_silver.py:30,130`) and
then defensively introspects for the optional `wind.gust` field
(`bronze_to_silver.py:35-42`). We pin explicit StructTypes instead — at
100 TB, schema inference is a full extra pass over the data and a correctness
hazard (a day of malformed files silently changes the schema). Optional
fields stay nullable and are defaulted downstream exactly like the reference
(`coalesce(visibility, 10000)`, `coalesce(pop, 0.0)`, gust→0.0).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WEATHER_ITEM = StructType(
    [
        StructField("main", StringType()),
        StructField("description", StringType()),
    ]
)

# OpenWeather /weather envelope + Lambda-added fields
# (reference weather_extractor_lambda.py:109-116, bronze_to_silver.py:44-79)
BRONZE_CURRENT_SCHEMA = StructType(
    [
        StructField("city_name", StringType()),
        StructField("country", StringType()),
        StructField("extraction_timestamp", StringType()),
        StructField("batch_id", StringType()),
        StructField("data_type", StringType()),
        StructField(
            "coord",
            StructType(
                [StructField("lat", DoubleType()), StructField("lon", DoubleType())]
            ),
        ),
        StructField(
            "main",
            StructType(
                [
                    StructField("temp", DoubleType()),
                    StructField("feels_like", DoubleType()),
                    StructField("temp_min", DoubleType()),
                    StructField("temp_max", DoubleType()),
                    StructField("humidity", LongType()),
                    StructField("pressure", LongType()),
                ]
            ),
        ),
        StructField(
            "wind",
            StructType(
                [
                    StructField("speed", DoubleType()),
                    StructField("deg", LongType()),
                    StructField("gust", DoubleType()),  # optional in the feed
                ]
            ),
        ),
        StructField("clouds", StructType([StructField("all", LongType())])),
        StructField("visibility", LongType()),  # nullable → coalesce 10000
        StructField("weather", ArrayType(_WEATHER_ITEM)),
        StructField("timezone", LongType()),
        StructField(
            "sys",
            StructType(
                [StructField("sunrise", LongType()), StructField("sunset", LongType())]
            ),
        ),
    ]
)

# OpenWeather /forecast envelope (reference bronze_to_silver.py:135-165)
BRONZE_FORECAST_SCHEMA = StructType(
    [
        StructField("city_name", StringType()),
        StructField("country", StringType()),
        StructField("extraction_timestamp", StringType()),
        StructField("batch_id", StringType()),
        StructField("data_type", StringType()),
        StructField(
            "list",
            ArrayType(
                StructType(
                    [
                        StructField("dt", LongType()),
                        StructField(
                            "main",
                            StructType(
                                [
                                    StructField("temp", DoubleType()),
                                    StructField("feels_like", DoubleType()),
                                    StructField("humidity", LongType()),
                                    StructField("pressure", LongType()),
                                ]
                            ),
                        ),
                        StructField(
                            "wind",
                            StructType(
                                [
                                    StructField("speed", DoubleType()),
                                    StructField("deg", LongType()),
                                ]
                            ),
                        ),
                        StructField("clouds", StructType([StructField("all", LongType())])),
                        StructField("pop", DoubleType()),  # nullable → coalesce 0.0
                        StructField(
                            "weather",
                            ArrayType(StructType([StructField("main", StringType())])),
                        ),
                    ]
                )
            ),
        ),
    ]
)
