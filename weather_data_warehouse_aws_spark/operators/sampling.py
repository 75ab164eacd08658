"""Deterministic sampling & dataset splitting (north-star: training-data
pipelines need STABLE samples and train/val/test splits — `df.sample()` is
seed-dependent per partitioning and not reproducible across engines or
re-partitioned re-runs).

Everything keys off the md5-portable hash of the row's id: the same row
lands in the same split in every engine, at every scale factor, under any
partitioning — the property that makes splits auditable and leak-free.
Map-side only; no shuffle, no state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import portable_hash60, portable_hash60_sql

BUCKETS = 10_000


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Stable bucket in [0, 10000) from the id (+ optional salt namespace)."""
    return F.pmod(portable_hash60(F.concat(F.lit(salt), id_col.cast("string"))), F.lit(BUCKETS))


def hash_bucket_sql(id_expr: str, salt: str = "") -> str:
    h = portable_hash60_sql(f"'{salt}' || CAST({id_expr} AS VARCHAR)")
    return f"(({h} % {BUCKETS}) + {BUCKETS}) % {BUCKETS}"


def deterministic_sample(df: DataFrame, id_col: str, fraction: float, *, salt: str = "") -> DataFrame:
    """Keep ~fraction of rows, stably."""
    return df.filter(hash_bucket(F.col(id_col), salt) < int(fraction * BUCKETS))


def split_by_hash(
    df: DataFrame, id_col: str, weights: Sequence[float], labels: Sequence[str], *, salt: str = ""
) -> DataFrame:
    """Assign each row to exactly one split with ~`weights` proportions.

    Cumulative bucket thresholds ⇒ splits are disjoint and exhaustive by
    construction; adding data never moves an existing row between splits.
    """
    if len(weights) != len(labels):
        raise ValueError("weights and labels must align")
    total = sum(weights)
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    for w, label in zip(weights, labels):
        acc += w / total
        cond = bucket < int(round(acc * BUCKETS))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn("split", expr.otherwise(labels[-1]))


def stratified_sample(
    df: DataFrame, group_col: str, id_col: str, k: int, *, salt: str = ""
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, deterministically: the k
    smallest (hash_bucket, id) per group — a seedless reproducible stratified
    sample (the data-mixing/balancing primitive: cap each language/source at
    k docs).

    Scale: one shuffle on group_col + per-group sort. For huge groups,
    pre-filter with `hash_bucket < ceil(k/|group| * BUCKETS * safety)` first
    so the window sorts a k-proportional sliver instead of the full group —
    the uniform hash makes the sliver a superset of the answer with
    overwhelming probability, and the window then takes exactly k.
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    group_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: priority
    sampling (Duffield, Lund & Thorup 2007 — public literature). Each row
    gets priority p = w / u with u a deterministic hash-uniform; the k
    highest priorities (per group) are the sample — heavy rows are included
    with probability min(w/τ, 1) for the implicit threshold τ, the standard
    weight-proportional scheme for "sample important documents more".

    Engine-portable by construction: u = (2·h + 1) / (2·BUCKETS) over the
    md5-portable hash h, so p = w · 2·BUCKETS / (2·h + 1) is one integer
    product (< 2^53, exact) and one IEEE exactly-rounded division — the
    double is bit-identical in any engine, no transcendentals (the classic
    Efraimidis-Spirakis u^(1/w) key needs pow/ln, whose last-ulp drift is
    exactly what a cross-engine hash gate cannot tolerate).

    Scale: one shuffle on group_col + per-group ordered window. For huge
    groups, pre-filter cheap rows first (the same sliver trick as
    `stratified_sample`): p ≥ w_min·2B/(2h+1) bounds which h can win, so
    `h < threshold` keeps a k-proportional superset.
    """
    # weight contract: non-negative integers (the integer-exactness claim
    # depends on it — fractional weights would otherwise truncate, 0.7 → 0
    # silently excluding the row, and negatives invert priorities). The
    # guard is folded into the plan (raise_error at action time), zero
    # extra passes.
    w_raw = F.col(weight_col)
    w_int = F.when(
        # isNull first: NULL < 0 is NULL, so without the explicit term a
        # null weight would slip past the guard into a NULL priority and
        # the row would vanish from every sample without an error
        w_raw.isNull() | (w_raw < 0) | (w_raw != F.floor(w_raw)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_sample: weight column {weight_col!r} must hold "
                    "non-negative integers, got "
                ),
                F.coalesce(w_raw.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(w_raw.cast("long"))
    h = hash_bucket(F.col(id_col), salt)
    priority = (w_int * (2 * BUCKETS)).cast("double") / (2 * h + 1).cast("double")
    parts = [group_col] if group_col else []
    win = Window.partitionBy(*parts).orderBy(
        F.col("__priority").desc(), F.col(id_col)
    )
    return (
        df.withColumn("__priority", priority)
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .withColumnRenamed("__priority", "priority")
    )


def weighted_sample_sql(
    table: str, id_expr: str, weight_expr: str, k: int, *, group_expr: str | None = None, salt: str = ""
) -> str:
    """DuckDB replica of `weighted_sample`'s selection (same integer-exact
    priority arithmetic), returning the sampled rows of `table`."""
    h = hash_bucket_sql(id_expr, salt)
    part = f"PARTITION BY {group_expr} " if group_expr else ""
    return f"""
SELECT * EXCLUDE (__rn) FROM (
    SELECT *,
           ROW_NUMBER() OVER (
               {part}ORDER BY CAST(CAST({weight_expr} AS BIGINT) * {2 * BUCKETS} AS DOUBLE)
                              / CAST(2 * ({h}) + 1 AS DOUBLE) DESC,
                     {id_expr}
           ) AS __rn
    FROM {table}
) WHERE __rn <= {k}
"""


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    token_col: str,
    budgets: DataFrame,
    *,
    salt: str = "",
    n_buckets: int = 50,
) -> DataFrame:
    """Fill each group's token budget in deterministic hash-priority order:
    keep a row iff its group's cumulative token count — over the total order
    (hash_bucket(id), id) — stays ≤ that group's budget. The data-mixing
    primitive: "sample each domain down to its mixture weight's token count".

    Semantically this is ONE window:
        SUM(tokens) OVER (PARTITION BY group ORDER BY h, id) <= budget
    but a per-group window sorts each whole group in a single task — the
    classic million-row-domain bottleneck. The scale shape here is the
    two-phase prefix sum:

      1. coarse bucket = h DIV (BUCKETS/n_buckets) — contiguous hash ranges,
         so ordering by (bucket, h, id) IS the ordering by (h, id);
      2. per-(group, bucket) token sums — a map-side-combined aggregate of
         |groups|·n_buckets rows;
      3. exclusive prefix sum over that TINY table (the only window over a
         whole group, at 1/|bucket-range|-th the rows), broadcast back;
      4. buckets that fit entirely or overshoot entirely are decided with NO
         sort; only the one boundary bucket per group sorts — 1/n_buckets of
         the group per task.

    `budgets` is a (group_col, budget) relation — computed or literal; it is
    broadcast. Choose n_buckets so |largest group|/n_buckets fits a task.
    """
    range_width = BUCKETS // n_buckets
    h = hash_bucket(F.col(id_col), salt)
    with_h = df.withColumn("__h", h).withColumn(
        "__bkt", (F.col("__h") / range_width).cast("int")
    )

    per_bucket = with_h.groupBy(group_col, "__bkt").agg(
        F.sum(token_col).alias("__bkt_tokens")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.withColumn(
        "__before", F.coalesce(F.sum("__bkt_tokens").over(w), F.lit(0))
    )

    staged = with_h.join(
        F.broadcast(offsets), [group_col, "__bkt"]
    ).join(F.broadcast(budgets), group_col)

    fits = staged.filter(F.col("__before") + F.col("__bkt_tokens") <= F.col("budget"))
    boundary = staged.filter(
        (F.col("__before") <= F.col("budget"))
        & (F.col("__before") + F.col("__bkt_tokens") > F.col("budget"))
    )
    wl = (
        Window.partitionBy(group_col, "__bkt")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary_kept = boundary.withColumn(
        "__cum", F.col("__before") + F.sum(token_col).over(wl)
    ).filter(F.col("__cum") <= F.col("budget"))

    out_cols = df.columns + ["budget"]
    return fits.select(*out_cols).unionByName(boundary_kept.select(*out_cols))


def temperature_budgets(
    df: DataFrame,
    group_col: str,
    token_col: str,
    *,
    alpha: float = 0.5,
    total_budget: int,
) -> DataFrame:
    """Temperature-scaled mixture budgets (the multilingual-LM standard,
    e.g. sampling ∝ size^α with α<1 to up-weight small domains): each
    group's token budget is total_budget · size_g^α / Σ size^α, floored.
    One tiny aggregate (|groups| rows) — feed the result straight into
    `token_budget_sample` as its `budgets` relation."""
    sizes = df.groupBy(group_col).agg(F.sum(token_col).alias("__sz"))
    powed = sizes.withColumn("__p", F.pow(F.col("__sz").cast("double"), F.lit(alpha)))
    denom = powed.agg(F.sum("__p").alias("__d"))
    return (
        powed.crossJoin(F.broadcast(denom))
        .select(
            group_col,
            F.floor(F.lit(float(total_budget)) * F.col("__p") / F.col("__d"))
            .cast("long")
            .alias("budget"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    weights: Sequence[float],
    labels: Sequence[str],
    *,
    salt: str = "",
    components: DataFrame | None = None,
) -> DataFrame:
    """Near-dup-aware train/val/test split: `split_by_hash` keyed on each
    row's DEDUP COMPONENT representative instead of its own id, so a
    document and all its near-duplicates always land in the SAME split.

    Plain id-hash splits leak: a near-copy of a training document in the
    test set inflates eval (the contamination `decontamination` measures
    after the fact — this prevents it structurally at split time).
    `pairs` is any (id_a, id_b) near-dup relation (minhash/semdedup/
    segment/ensemble); components come from graph.connected_components
    (edge-sized work), rows without any near-dup keep their own id as the
    key — identical assignment to the plain split, so turning this on
    never reshuffles the non-duplicated majority of the corpus.

    `components`: an optional precomputed (node, component) relation for
    exactly these `pairs` — callers that already clustered them (e.g.
    `pipeline/curate.py`, whose dedup stage ran the same graph) hand the
    result over instead of paying a second full label-propagation run.
    """
    from .graph import connected_components

    comp = components if components is not None else connected_components(pairs)
    joined = df.join(
        F.broadcast(comp.withColumnRenamed("node", id_col)), id_col, "left"
    )
    key = F.coalesce(F.col("component"), F.col(id_col)).cast("string")
    keyed = joined.withColumn("__skey", key)
    out = split_by_hash(keyed, "__skey", weights, labels, salt=salt)
    return out.drop("__skey", "component")
