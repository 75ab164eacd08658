"""Entity resolution / fuzzy record linkage: find records that are the same
real-world entity despite typos (the data-cleaning sibling of text dedup —
classic blocking + pairwise-compare record linkage, Fellegi & Sunter 1969).

Scale shape — the same discipline as every dedup operator here:
* candidate generation is an EQUI-JOIN on a blocking key (never all-pairs);
  the default key, (length, last-3 chars), survives typos planted anywhere
  before the suffix, and callers pass domain keys (zip code, birth year,
  phonetic code) the same way;
* the expensive compare (Levenshtein, O(len²) per pair) runs only within a
  block — JVM built-in `levenshtein`, no Python;
* `max_block_rows` is the familiar tripwire against degenerate blocking
  (everyone in one block = the quadratic hazard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def default_block_key(name: Column) -> Column:
    """(length, last 3 chars) — cheap, typo-tolerant for mid-string errors."""
    return F.concat_ws(
        "|", F.length(name).cast("string"), F.substring(name, -3, 3)
    )


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    block_fn=None,
    max_distance: int = 2,
    max_block_rows: int | None = 1_000_000,
) -> DataFrame:
    """(id_a, id_b, distance): record pairs whose names are within
    `max_distance` edits, compared only within a block. One shuffle on the
    block key; pair count bounded by Σ block², with the tripwire enforcing
    that blocks stay bounded.

    The tripwire is folded INTO the plan, not an eager pre-pass: a window
    count over the blocking key rides the a-side's join shuffle (same
    hash-partitioning, so the exchange is reused), and a filter condition
    `raise_error`s the task if any block exceeds the bound — zero extra
    scans of the input, and the guard fires before any oversized block's
    pairs are materialized. The error surfaces at action time (inside the
    Spark job) rather than eagerly at call time."""
    block_fn = block_fn or default_block_key
    occ = df.select(
        F.col(id_col).alias("rid"),
        F.col(name_col).alias("nm"),
        block_fn(F.col(name_col)).alias("blk"),
    )
    a = occ.select("blk", F.col("rid").alias("id_a"), F.col("nm").alias("nm_a"))
    if max_block_rows is not None:
        blk_rows = F.count("*").over(Window.partitionBy("blk"))
        guard = F.when(
            blk_rows > max_block_rows,
            F.raise_error(
                F.concat(
                    F.lit("blocked_fuzzy_pairs: degenerate blocking — block '"),
                    F.col("blk"),
                    F.lit("' has "),
                    blk_rows.cast("string"),
                    F.lit(f" rows (> {max_block_rows}); refine the blocking "),
                    F.lit("key (zip/phonetic/year) before the pairwise Levenshtein."),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
        a = a.withColumn("__blk_guard", guard).filter("__blk_guard").drop("__blk_guard")
    b = occ.select("blk", F.col("rid").alias("id_b"), F.col("nm").alias("nm_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("nm_a", "nm_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )
