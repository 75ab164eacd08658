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
* determinism: xxhash64 bucketing and long counts are bit-identical on
  any engine/partitioning — the structure is unit-differential-testable
  against exact counts.

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_estimate", "cms_heavy_hitters"]


def _bucket(col, d: int, width: int):
    # independent rows via seed-mixing: xxhash64 of (value, row-id literal)
    return F.pmod(F.xxhash64(col, F.lit(d)), F.lit(width))


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
    instead of rows."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    key_type = df.schema[col].dataType.simpleString()
    rows = df.select(
        F.posexplode(
            F.array(*[_bucket(F.col(col), d, width) for d in range(depth)])
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


def _params(sketch: DataFrame) -> tuple[int, int, str]:
    """The sketch's single (width, depth, key_type) — raises on empty or
    MIXED parameter relations (a mixed sketch would make MIN pick counters
    from the wrong geometry and silently UNDERestimate, breaking the
    one-sided guarantee)."""
    cols = ["width", "depth"] + (
        ["key_type"] if "key_type" in sketch.columns else []
    )
    rows = sketch.select(*cols).distinct().collect()
    if not rows:
        raise ValueError("cms: empty sketch relation (no rows at all)")
    if len(rows) > 1:
        raise ValueError(
            f"cms: mixed sketch parameters {sorted(map(tuple, rows))} — "
            "sketches are only mergeable/probe-able at ONE (width, depth)"
        )
    r = rows[0]
    return r["width"], r["depth"], (r["key_type"] if "key_type" in cols else "")


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sketch of the union = SUM of sketches (same width/depth required —
    validated against every input). Associative and commutative; merge
    order can never matter (exact integer sums)."""
    params = {_params(s) for s in sketches if s.select("d").first() is not None}
    if len(params) > 1:
        raise ValueError(
            f"cms_merge: incompatible sketch parameters {sorted(params)}"
        )
    first, *rest = sketches
    out = first
    for s in rest:
        out = out.unionByName(s)
    extra = ["key_type"] if "key_type" in out.columns else []
    return (
        out.groupBy("d", "bucket", "width", "depth", *extra)
        .agg(F.sum("cnt").alias("cnt"))
        .select("d", "bucket", "cnt", "width", "depth", *extra)
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, col: str) -> DataFrame:
    """(col, est): upper-bound frequency for every key in `keys`. The
    sketch broadcasts (d·width longs); each key probes its depth buckets
    and takes the MIN — missing buckets count 0.

    Probe keys are CAST to the sketch's recorded key type before hashing:
    xxhash64 is input-type-sensitive, so probing an int-built sketch with
    bigint keys would hash into the wrong buckets and return 0 for real
    keys — a silent FALSE NEGATIVE, the one error class CMS promises
    never to make."""
    width, depth, key_type = _params(sketch)
    kcol = F.col(col).cast(key_type) if key_type else F.col(col)
    probes = keys.select(col).distinct().select(
        col,
        F.posexplode(
            F.array(*[_bucket(kcol, d, width) for d in range(depth)])
        ).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
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
