"""Per-file Bloom-filter skipping index (Delta/Iceberg bloom-index analogue
in vanilla Spark).

Sorted and Z-ordered layouts (operators/maintenance.py) make min/max footer
stats selective for RANGE predicates on the clustering columns; they do
nothing for point lookups on a high-cardinality column that isn't the sort
key (user_id in a time-sorted table, doc_id in a content-ordered corpus).
The standard answer is a per-file Bloom filter: an offline pass builds one
KB-scale bitmap per data file over the lookup column; a point query probes
the (tiny) index first and reads only the files that *might* contain the
key — no false negatives, so `pruned scan ∪ filter` ≡ `full scan ∪ filter`
exactly.

Scale accounting (100 TB, ~800k files):
- Build: one scan of the column (not the table — column pruning holds),
  exploding k≈7 bit positions per row, then a two-level aggregate keyed on
  (file, word) — map-side combined, shuffle volume ≈ rows·k/word-fill,
  output |files| rows of ~KB each. The index is ~GBs for 800k files —
  parquet-stored, itself scannable.
- Probe: the index scan is |files| KB-rows (seconds), and file pruning
  multiplies the main scan by the hit fraction. For a unique key with
  fpr=0.01 that's ~1 + 0.01·|files| files read instead of all of them.
- The index lives under `<table>/_bloom_idx_<col>/` — the leading
  underscore makes Spark's file listing skip it, so normal table reads are
  unaffected (same convention as `_SUCCESS`/`_metadata`).

The bitmap math (sizing, double hashing) is shared with
operators/bloom.py's broadcast semi-join filter; here the bitmap is a
per-file ROW of the index relation rather than a broadcast literal, and the
probe is an expression over that row's word array.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bloom import bloom_params

__all__ = ["bloom_index_path", "build_bloom_index", "prune_files", "read_with_index"]


def bloom_index_path(table_path: str, column: str) -> str:
    return os.path.join(table_path.rstrip("/"), f"_bloom_idx_{column}")


def _key(col_expr) -> F.Column:
    # xxhash64 gives the well-mixed BIGINT the double-hashing scheme needs,
    # for any input type, engine-deterministic (seed 42 fixed)
    return F.xxhash64(col_expr)


def _positions_expr(key, n_bits: int, n_hashes: int) -> list:
    key = key.cast("bigint")
    h1 = F.pmod(key, F.lit(n_bits))
    h2 = F.pmod(F.shiftrightunsigned(key, 23), F.lit(n_bits)).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)]


def build_bloom_index(
    spark: SparkSession,
    table_path: str,
    column: str,
    *,
    fpr: float = 0.01,
    keys_per_file: int | None = None,
) -> DataFrame:
    """Build (overwrite) the per-file Bloom index for `column`.

    One distributed pass: scan only `column` + `input_file_name()`, explode
    k bit positions per row, aggregate `bit_or` per (file, word), assemble
    each file's dense word array with a map lookup over
    `sequence(0, n_words-1)` — fully distributed, one index row per file,
    never a per-file bitmap on the driver.

    All files share one (n_bits, n_hashes) sizing so a single probe
    expression serves every row; sized from the max per-file distinct count
    (`keys_per_file` skips that sizing pass when the caller knows it).
    Returns the index DataFrame (also written to the sidecar path).
    """
    data = spark.read.parquet(table_path).select(
        F.input_file_name().alias("file"), _key(F.col(column)).alias("k")
    )
    if keys_per_file is None:
        keys_per_file = (
            data.groupBy("file")
            .agg(F.countDistinct("k").alias("n"))
            .agg(F.max("n"))
            .collect()[0][0]
            or 1
        )
    n_bits, n_hashes = bloom_params(keys_per_file, fpr)
    n_words = (n_bits + 63) // 64

    pos = F.explode(
        F.array(*_positions_expr(F.col("k"), n_bits, n_hashes))
    ).alias("pos")
    index = (
        data.select("file", pos)
        .select(
            "file",
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("file", "w")
        .agg(F.bit_or("bit").alias("word"))
        .groupBy("file")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("wm")
        )
        .select(
            "file",
            F.expr(
                f"transform(sequence(0, {n_words - 1}),"
                " i -> coalesce(element_at(wm, i), 0L))"
            ).alias("words"),
            F.lit(n_bits).alias("n_bits"),
            F.lit(n_hashes).alias("n_hashes"),
        )
    )
    index.write.mode("overwrite").parquet(bloom_index_path(table_path, column))
    return spark.read.parquet(bloom_index_path(table_path, column))


def _row_might_contain(key, n_bits: int, n_hashes: int):
    """Probe expression against THIS row's `words` array column."""
    test = None
    for pos in _positions_expr(key, n_bits, n_hashes):
        word = F.element_at(F.col("words"), (pos / 64).cast("int") + F.lit(1))
        shifted = F.call_function(
            "shiftright", word, F.pmod(pos, F.lit(64)).cast("int")
        )
        bit = shifted.bitwiseAND(F.lit(1)) == F.lit(1)
        test = bit if test is None else (test & bit)
    return test


def prune_files(spark: SparkSession, table_path: str, column: str, value) -> list[str]:
    """Files that might contain `value` (no false negatives)."""
    idx = spark.read.parquet(bloom_index_path(table_path, column))
    first = idx.select("n_bits", "n_hashes").first()
    if first is None:
        return []
    n_bits, n_hashes = first["n_bits"], first["n_hashes"]
    # xxhash64 is type-sensitive: probe with the literal cast to the data
    # column's exact type or the hash won't match the indexed one
    dtype = spark.read.parquet(table_path).schema[column].dataType
    hits = idx.filter(
        _row_might_contain(_key(F.lit(value).cast(dtype)), n_bits, n_hashes)
    ).select("file")
    return [r["file"] for r in hits.collect()]


def read_with_index(
    spark: SparkSession, table_path: str, column: str, value
) -> DataFrame:
    """Point lookup through the index: scan only candidate files, then
    apply the exact filter (removing Bloom false positives). Result is
    row-identical to `read.parquet(table).filter(col == value)`."""
    files = prune_files(spark, table_path, column, value)
    if not files:
        schema = spark.read.parquet(table_path).schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files).filter(F.col(column) == F.lit(value))


# ---------------------------------------------------------------------------
# Range complement: min/max footer-stats file pruning. Bloom answers point
# lookups on any column; footer ranges answer RANGE predicates — selective
# when the layout clusters the column (operators/maintenance.py::
# write_sorted / write_zorder), a no-op-but-correct superset otherwise.
# Parquet already carries these stats in every footer, so there is no index
# to build or maintain.
# ---------------------------------------------------------------------------


def prune_files_by_range(table_path: str, column: str, lo, hi) -> list[str]:
    """Files whose footer [min, max] for `column` intersects [lo, hi]
    (inclusive bounds; pass None for an open end). Files lacking stats for
    the column are kept — pruning must never produce false negatives."""
    import pyarrow.parquet as pq

    out: list[str] = []
    for name in sorted(os.listdir(table_path)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(table_path, name)
        md = pq.ParquetFile(full).metadata
        fmin = fmax = None
        prunable = False
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema != column:
                    continue
                if col.statistics is None:
                    prunable = False
                    break
                prunable = True
                st = col.statistics
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
            if not prunable and fmin is not None:
                break  # a statless row group poisons the whole file
        if not prunable:
            out.append(full)  # no stats -> cannot prune safely
            continue
        if (lo is None or fmax >= lo) and (hi is None or fmin <= hi):
            out.append(full)
    return out


def read_with_range(
    spark: SparkSession, table_path: str, column: str, lo, hi
) -> DataFrame:
    """Range scan through footer stats: read only intersecting files, then
    apply the exact BETWEEN filter. Row-identical to the full-scan filter;
    file count ∝ range width when the layout is clustered on `column`."""
    files = prune_files_by_range(table_path, column, lo, hi)
    if not files:
        schema = spark.read.parquet(table_path).schema
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(*files)
    if lo is not None:
        df = df.filter(F.col(column) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(column) <= F.lit(hi))
    return df
