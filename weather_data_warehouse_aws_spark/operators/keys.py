"""Surrogate-key generation — SURVEY.md §2.5 W1, scale-safe variants.

The reference mints keys with ``ROW_NUMBER() OVER (ORDER BY …)`` and no
partitioning (`create_views.sql:8,41,73`; `build_dimensions.py:66-73`). A
global unpartitioned window pulls the entire relation through ONE task — the
single worst scalability bug a 100 TB plan can have. Engine policy:

* `hash_key`   — default for facts: ``xxhash64`` of the natural key. Pure
  map-side, deterministic, collision odds ~n²/2⁶⁴ (negligible below ~10¹⁸
  rows). This is what our fact views use.
* `dense_key`  — exact reference parity (dense 1..N by sort order). Only
  legal for SMALL relations (dims); guarded by a row-count ceiling so it can
  never silently become the 100 TB bottleneck.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DENSE_KEY_MAX_ROWS = 10_000_000


def hash_key(df: DataFrame, name: str, natural_key: Sequence[str]) -> DataFrame:
    """Add a deterministic 64-bit surrogate key from the natural key columns."""
    return df.withColumn(name, F.xxhash64(*[F.col(c) for c in natural_key]))


def dense_key(
    df: DataFrame, name: str, order_by: Sequence[str], *, max_rows: int = DENSE_KEY_MAX_ROWS
) -> DataFrame:
    """Dense 1..N key by total order — reference-parity path for small dims.

    Mirrors `build_dimensions.py:68-73` (``row_number().over(Window.orderBy(
    "location_name"))``). Refuses to run on relations larger than `max_rows`
    because the unpartitioned window is single-task by construction.
    """
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"dense_key on {n} rows would serialize through one task; "
            "use hash_key for large relations"
        )
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(name, F.row_number().over(w))
