"""Count-Min frequency sketch as a mergeable RELATION (Cormode &
Muthukrishnan 2005) — the frequency member of the sketch family
(operators/rollup_time.py: HLL = distincts, KLL = quantiles, Theta = set
algebra; this = "how often does each key occur", answerable for ANY key
after one pass, mergeable across batches/partitions/days by plain SUM).

Representation: a (d, bucket, cnt) DataFrame — depth d hash rows × width
buckets of exact longs. That spelling (instead of an opaque binary blob)
buys three things a blob cannot give:

* merge = groupBy(d, bucket).sum — the sketch of a union is the SUM of
  the sketches, exactly, with Spark's own map-side combine; no custom agg
  or UDF anywhere.
* estimates are a broadcast equi-join + MIN — a 100 TB stream's sketch is
  d·width longs (KBs), probed for any batch of keys JVM-side.
* determinism: bucketing uses the repo's PORTABLE md5-prefix hash
  (functions/text.py:portable_hash60) over `'d|' || CAST(key AS STRING)`,
  bit-identical in DuckDB — the sketch itself is cross-engine
  oracle-checkable, not just unit-differential-testable, and the
  string-cast makes probes type-bridging for free (an INT-built sketch
  probed with BIGINT keys hashes identically: '7' == '7').

Laziness: a sketch is usually a LAZY plan over the raw corpus. Nothing
here collects: parameter validation (one (width, depth, key_type) per
sketch) is a raise_error tripwire riding the probe/merge plan itself
(the merge_into guard pattern, operators/merge.py:96), so probing a
freshly-built sketch costs ONE build scan, not three.

NULL is not a key: NULL-keyed rows are dropped from the build and a NULL
probe estimates 0. An EMPTY sketch (legal: a streaming job's first
micro-batch may have zero rows) estimates 0 for every key instead of
raising — the all-zero sketch is the identity of the merge monoid.

Guarantees (standard CMS): estimate ≥ true count always (one-sided);
overestimate ≤ ε·N with probability 1-δ for width = ⌈e/ε⌉, depth =
⌈ln(1/δ)⌉, N = total stream length. Heavy hitters: every key with true
count ≥ T is in `cms_heavy_hitters(..., threshold=T)` (no false
negatives); false positives are bounded by the same ε·N slack.

Scale shape: the build is one explode-free map pass (d projected columns,
unioned compactly via posexplode of a d-array) + one groupBy on
(d, bucket) — map-side combined, shuffle volume ≤ d·width rows per
partition regardless of input size. Everything downstream touches only
the KB-scale sketch relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, portable_hash60_sql

__all__ = [
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "cms_heavy_hitters",
    "cms_bucket_sql",
]

_MIXED_MSG = (
    "cms: mixed sketch parameters — sketches are only mergeable/probe-able "
    "at ONE (width, depth, key_type)"
)


def _bucket(key_str: Column, d: Column, width: Column) -> Column:
    """Portable bucket: pmod(md5-prefix-hash('d|key'), width). All three
    inputs are Columns so the same expression serves the build (literal
    d/width) and the lazy probe (d/width read off the sketch relation)."""
    return F.pmod(
        portable_hash60(F.concat(d.cast("string"), F.lit("|"), key_str)),
        width,
    )


def cms_bucket_sql(key_expr: str, d_expr: str, width_expr: str) -> str:
    """DuckDB mirror of `_bucket` — embed in oracle SQL; bit-identical."""
    h = portable_hash60_sql(
        f"CAST({d_expr} AS VARCHAR) || '|' || CAST({key_expr} AS VARCHAR)"
    )
    return f"((({h}) % ({width_expr})) + ({width_expr})) % ({width_expr})"


def cms_build(
    df: DataFrame,
    col: str,
    *,
    width: int = 2048,
    depth: int = 5,
    weight_col: str | None = None,
) -> DataFrame:
    """One pass over `df[col]` → the (d, bucket, cnt) sketch relation.
    `weight_col` counts weighted occurrences (e.g. token counts per doc)
    instead of rows. NULL keys are dropped (NULL is not a key)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    key_type = df.schema[col].dataType.simpleString()
    key = F.col(col).cast("string")
    rows = df.filter(F.col(col).isNotNull()).select(
        F.posexplode(
            F.array(
                *[_bucket(key, F.lit(d), F.lit(width)) for d in range(depth)]
            )
        ).alias("d", "bucket"),
        w.alias("__w"),
    )
    return (
        rows.groupBy("d", "bucket")
        .agg(F.sum("__w").alias("cnt"))
        .withColumn("width", F.lit(width))
        .withColumn("depth", F.lit(depth))
        .withColumn("key_type", F.lit(key_type))
    )


def _params_rel(sketch: DataFrame) -> DataFrame:
    """ONE-row LAZY relation (__np, width, depth, key_type) over the
    sketch — no collect, so probing/merging a freshly-built (unpersisted)
    sketch never recomputes the build driver-side. The `width` column
    carries the mixed-parameter tripwire: evaluating it against a sketch
    holding >1 distinct (width, depth, key_type) raises (a mixed sketch
    would let MIN pick counters from the wrong geometry and silently
    UNDERestimate — the one error CMS promises never to make). On an
    EMPTY sketch the row is (__np=0, NULL, NULL, NULL)."""
    kt = (
        F.col("key_type")
        if "key_type" in sketch.columns
        else F.lit("")
    )
    return (
        sketch.groupBy()
        .agg(
            F.countDistinct(F.col("width"), F.col("depth"), kt).alias("__np"),
            F.min("width").alias("__w0"),
            F.min("depth").alias("__d0"),
            F.min(kt).alias("key_type"),
        )
        .select(
            "__np",
            F.when(
                F.col("__np") > 1,
                F.raise_error(F.lit(_MIXED_MSG)).cast("int"),
            )
            .otherwise(F.col("__w0"))
            .alias("width"),
            F.col("__d0").alias("depth"),
            "key_type",
        )
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sketch of the union = SUM of sketches (same width/depth/key_type
    required — validated by a lazy tripwire riding the merged plan, so
    merging freshly-built sketches stays one scan per input). Associative
    and commutative; merge order can never matter (exact integer sums).
    Empty sketches are the monoid identity and merge cleanly."""
    first, *rest = sketches
    out = first
    for s in rest:
        out = out.unionByName(s)
    extra = ["key_type"] if "key_type" in out.columns else []
    merged = (
        out.groupBy("d", "bucket", "width", "depth", *extra)
        .agg(F.sum("cnt").alias("cnt"))
        .select("d", "bucket", "cnt", "width", "depth", *extra)
    )
    # validation tripwire: a FILTER on the 1-row params relation (filters
    # survive column pruning; a projected-then-dropped guard would be
    # optimized away before it could raise)
    guard = _params_rel(out).select(
        F.when(
            F.col("__np") > 1, F.raise_error(F.lit(_MIXED_MSG)).cast("boolean")
        )
        .otherwise(F.lit(True))
        .alias("__ok")
    )
    return merged.join(F.broadcast(guard), how="cross").filter("__ok").drop(
        "__ok"
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, col: str) -> DataFrame:
    """(col, est): upper-bound frequency for every key in `keys`. The
    sketch broadcasts (d·width longs); each key probes its depth buckets
    and takes the MIN — missing buckets count 0.

    Fully lazy: width/depth come off a 1-row aggregate of the sketch
    relation (broadcast cross join), never a driver collect — the
    mixed-parameter raise rides the probe action itself. An empty sketch
    yields est=0 for every probe key (coalesced to a 1-bucket geometry
    that can never match). Probes hash via CAST(key AS STRING), so an
    INT-built sketch probed with BIGINT keys still finds them."""
    params = _params_rel(sketch).select(
        F.coalesce(F.col("width"), F.lit(1)).alias("__w"),
        F.coalesce(F.col("depth"), F.lit(1)).alias("__d"),
    )
    key = F.col(col).cast("string")
    probes = (
        keys.select(col)
        .distinct()
        .join(F.broadcast(params), how="cross")
        .select(
            col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__d") - 1),
                    lambda d: _bucket(key, d, F.col("__w")),
                )
            ).alias("d", "bucket"),
        )
    )
    return (
        probes.join(
            F.broadcast(sketch.select("d", "bucket", "cnt")),
            ["d", "bucket"],
            "left",
        )
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    sketch: DataFrame, candidates: DataFrame, col: str, *, threshold: int
) -> DataFrame:
    """Candidates whose estimated frequency ≥ threshold. CMS is one-sided:
    every TRUE heavy hitter survives (no false negatives); false positives
    are bounded by the ε·N overestimate. `candidates` is any relation
    carrying possible keys (e.g. this batch's distinct tokens) — CMS can
    only answer point queries, so heavy-hitter mining is candidate-driven."""
    return cms_estimate(sketch, candidates, col).filter(
        F.col("est") >= threshold
    )
