"""Sequence packing: assemble variable-length items (documents / chunks)
into fixed-token-budget training packs.

Two formulations, matching the two semantics used in practice:

* `pack_concat_cut` — GPT-style pretraining packing: within each shard,
  items are concatenated into one token stream in a deterministic order and
  the stream is cut at exact `budget` boundaries; items may split across
  pack boundaries. Emits one row per (item × pack) intersection segment.
  Pure JVM (window cumsum + explode + integer arithmetic): zero Python,
  exact, strict budget, and the whole computation is SQL-replicable — the
  `chunk_documents` registry oracle differential-tests it against DuckDB.

* `pack_greedy` — no-split packing (instruction-tuning style, where an
  example must not be cut): first-fit-decreasing inside each shard via
  Arrow-batched `applyInPandas`. Strict budget; items longer than the
  budget get a pack of their own (flagged `oversize`, caller truncates).
  FFD uses no more than 11/9·OPT + 6/9 bins (Dósa 2007, public result).

Scale design (100 TB):
* Sharding comes FIRST: a single global cumsum/order would serialize the
  corpus through one window partition. Items are sharded by portable hash
  of the item id — deterministic across engines, partition counts, and
  repartitioning — and every downstream order is (shard, sort keys), so
  parallelism = n_shards and each shard's window sorts only its slice.
  Size n_shards ~ total cores (thousands on a cluster).
* Pack identity is the composite (shard_id, pack_id) — no global counter,
  no coordination between shards.
* `pack_greedy` holds ONE SHARD of (id, n_tokens) pairs in pandas — ids and
  counts only, never item bodies; at 16-byte rows even a billion-item shard
  is executor-friendly, and n_shards is the pressure valve.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60


def shard_of(*cols: Column | str, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards): portable hash of the
    concatenated key columns — stable across engines and partitionings."""
    key = F.concat_ws(":", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols])
    return F.pmod(portable_hash60(key), F.lit(n_shards)).cast("int")


def pack_concat_cut(
    items: DataFrame,
    order_cols: list[str],
    tokens_col: str,
    *,
    budget: int,
    n_shards: int,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Concat-and-cut packing. `items` must already carry `shard_col`
    (use `shard_of`). Within each shard, items ordered by `order_cols`
    form a token stream cut every `budget` tokens.

    Adds columns:
      pack_id     — 0-based pack index within the shard
      seg_start   — 0-based token offset of the segment inside the ITEM
      seg_len     — segment length in tokens (1..budget)
      pack_offset — 0-based token offset of the segment inside the PACK

    Every pack except each shard's last holds exactly `budget` tokens; an
    item spanning k boundaries emits k+1 rows. Zero-token items are
    dropped (nothing to pack).

    `order_cols` must totally order the rows within a shard (a unique id,
    not just a timestamp): the running token sum is order-sensitive, and a
    deterministic hash tiebreak is appended so tied rows still pack
    reproducibly across runs/repartitionings rather than by shuffle
    accident.
    """
    # ROWS frame, not the default RANGE: fully identical rows are frame
    # peers even after the hash tiebreak, and a RANGE running sum would
    # include both peers in each one's __s_prev, overlapping their spans
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols, F.xxhash64(*[F.col(c) for c in items.columns]))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col(tokens_col).cast("long")
    s_prev = (F.sum(tokens_col).over(w) - t).alias("__s_prev")
    df = items.filter(t > 0).select("*", s_prev)
    first_pack = F.floor(F.col("__s_prev") / budget)
    last_pack = F.floor((F.col("__s_prev") + t - 1) / budget)
    df = df.withColumn("pack_id", F.explode(F.sequence(first_pack, last_pack)))
    seg_start = F.greatest(F.col("pack_id") * budget - F.col("__s_prev"), F.lit(0))
    seg_end = F.least((F.col("pack_id") + 1) * budget - F.col("__s_prev"), t)
    return (
        df.withColumn("seg_start", seg_start.cast("int"))
        .withColumn("seg_len", (seg_end - seg_start).cast("int"))
        .withColumn(
            "pack_offset",
            (F.col("__s_prev") + F.col("seg_start") - F.col("pack_id") * budget).cast("int"),
        )
        .withColumn("pack_id", F.col("pack_id").cast("int"))
        .drop("__s_prev")
    )


def concat_cut_sql(
    source_sql: str,
    order_cols: list[str],
    tokens_col: str,
    *,
    budget: int,
    shard_col: str = "shard_id",
) -> str:
    """DuckDB replica of `pack_concat_cut` over `source_sql` (a relation
    already carrying the shard column) — used by registry oracles."""
    order = ", ".join(order_cols)
    return f"""
WITH __items AS (
    SELECT *,
           CAST(SUM({tokens_col}) OVER (
               PARTITION BY {shard_col} ORDER BY {order}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - {tokens_col} AS BIGINT) AS __s_prev
    FROM ({source_sql})
    WHERE {tokens_col} > 0
),
__exploded AS (
    SELECT i.*, CAST(p AS INT) AS pack_id
    FROM __items i,
         UNNEST(generate_series(
             __s_prev // {budget},
             (__s_prev + {tokens_col} - 1) // {budget}
         )) AS t(p)
)
SELECT * EXCLUDE (__s_prev),
       CAST(greatest(pack_id * {budget} - __s_prev, 0) AS INT) AS seg_start,
       CAST(least((pack_id + 1) * {budget} - __s_prev, {tokens_col})
            - greatest(pack_id * {budget} - __s_prev, 0) AS INT) AS seg_len,
       CAST(__s_prev + greatest(pack_id * {budget} - __s_prev, 0)
            - pack_id * {budget} AS INT) AS pack_offset
FROM __exploded
"""


PACK_GREEDY_SCHEMA = (
    "{id_schema}, n_tokens int, shard_id int, pack_id int, oversize boolean"
)


def pack_greedy(
    items: DataFrame,
    id_cols: list[str],
    tokens_col: str,
    *,
    budget: int,
    n_shards: int,
) -> DataFrame:
    """No-split first-fit-decreasing packing. Returns one row per item:
    (id_cols..., n_tokens, shard_id, pack_id, oversize). Deterministic:
    shard by portable hash, FFD order is (-tokens, id...) within the shard.
    """
    id_schema = ", ".join(f"{c} {t}" for c, t in items.select(*id_cols).dtypes)
    out_schema = PACK_GREEDY_SCHEMA.format(id_schema=id_schema)

    def _pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values(
            by=["__t"] + id_cols, ascending=[False] + [True] * len(id_cols)
        )
        # bins: list of remaining capacities; linear scan is fine because
        # shards bound the working set; a tree over capacities would drop
        # this to O(n log n) if a shard ever holds millions of items
        remaining: list[int] = []
        packs, oversize = [], []
        for t in pdf["__t"]:
            t = int(t)
            if t > budget:  # own (closed) pack; caller truncates downstream
                packs.append(len(remaining))
                remaining.append(0)
                oversize.append(True)
                continue
            for b, cap in enumerate(remaining):
                if cap >= t:
                    remaining[b] = cap - t
                    packs.append(b)
                    break
            else:
                packs.append(len(remaining))
                remaining.append(budget - t)
            oversize.append(False)
        out = pdf[id_cols].copy()
        out["n_tokens"] = pdf["__t"].astype("int32")
        out["shard_id"] = shard
        out["pack_id"] = pd.Series(packs, index=pdf.index, dtype="int32")
        out["oversize"] = pd.Series(oversize, index=pdf.index)
        return out

    prepared = items.select(
        *id_cols,
        F.col(tokens_col).cast("int").alias("__t"),
        shard_of(*id_cols, n_shards=n_shards).alias("__shard"),
    ).filter(F.col("__t") > 0)
    return prepared.groupBy("__shard").applyInPandas(_pack, out_schema)
