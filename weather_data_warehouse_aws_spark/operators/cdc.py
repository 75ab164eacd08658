"""Change-data-capture primitives: keyed snapshot diff + incremental
aggregate maintenance.

The reference rebuilds its gold layer from scratch on every run
(`scripts/glue/build_dimensions.py`, `build_facts.py` — full re-read of
silver each day). At 100 TB a daily full rebuild is the single most
expensive habit a warehouse can have; the standard fix is (1) derive the
CHANGE set between the previous and current snapshots — a keyed full-outer
diff — and (2) fold only that change set into the downstream aggregates
(incremental view maintenance), never re-scanning the unchanged bulk.

Scale shape:
- `snapshot_diff` is ONE full-outer shuffle on the natural key (the same
  key both snapshots are already bucketed/partitioned by in a real
  deployment, where it degrades to a zero-shuffle co-located merge — see
  sources/bucketing.py). Change detection is a null-safe column compare
  inside the join projection: no second pass, no window.
- `apply_agg_delta` touches only |delta| rows plus |affected groups| of the
  existing aggregate: deletes contribute negative partials, inserts
  positive, updates one of each. The merge with the prior aggregate is an
  outer join on the group key — proportional to the AGGREGATE's size, not
  the fact table's. SUM/COUNT are self-maintainable; AVG rides as
  SUM+COUNT; MIN/MAX are append-only maintainable (deletes force a
  per-affected-group rescan, which this operator surfaces rather than
  hides — callers pass `rescan` for those groups).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change-type tags emitted by snapshot_diff
INSERT, DELETE, UPDATE = "I", "D", "U"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff two keyed snapshots into a changefeed.

    Returns one row per changed key with ``op`` ∈ {'I','D','U'} and, for
    every non-key column ``c``, a pair ``old_c`` / ``new_c`` (the before
    and after images; null on the absent side of inserts/deletes).
    Unchanged keys are dropped. ``compare_cols`` limits which columns
    count as "changed" (default: all shared non-key columns); comparison
    is null-safe, so NULL→NULL is unchanged and NULL→value is a change.

    Both inputs must be unique per key (snapshots, not logs) — enforce
    upstream with dedup_latest-style keyed dedup if needed.
    """
    keys = list(keys)
    non_key = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshot_diff requires identical snapshot schemas")
    generated = (
        {f"old_{c}" for c in non_key}
        | {f"new_{c}" for c in non_key}
        | {"op", "__old_present", "__new_present"}
    )
    clash = sorted(generated & set(old.columns))
    if clash:
        raise ValueError(
            f"snapshot_diff output columns collide with input columns: {clash}"
        )
    cmp_cols = list(compare_cols) if compare_cols is not None else non_key

    o = old
    n = new
    for c in non_key:
        o = o.withColumnRenamed(c, f"old_{c}")
        n = n.withColumnRenamed(c, f"new_{c}")
    # key presence markers that survive null-extension of the outer join
    o = o.withColumn("__old_present", F.lit(True))
    n = n.withColumn("__new_present", F.lit(True))

    joined = o.join(n, keys, "full_outer")
    changed = None
    for c in cmp_cols:
        term = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        changed = term if changed is None else changed | term
    op = (
        F.when(F.col("__old_present").isNull(), F.lit(INSERT))
        .when(F.col("__new_present").isNull(), F.lit(DELETE))
        .when(changed if changed is not None else F.lit(False), F.lit(UPDATE))
    )  # unchanged rows -> NULL op, filtered next
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            *keys,
            *[f"old_{c}" for c in non_key],
            *[f"new_{c}" for c in non_key],
        )
    )


def apply_agg_delta(
    prior_agg: DataFrame,
    diff: DataFrame,
    group_by: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incrementally maintain a grouped SUM/COUNT aggregate from a
    changefeed produced by :func:`snapshot_diff`.

    ``prior_agg`` has columns ``group_by + [sum_<c> for c in sum_cols] +
    [count_col]`` (the shape ``grouped_sums`` below produces). The diff's
    before-images contribute negatively and after-images positively:
    a DELETE removes the old row, an INSERT adds the new one, an UPDATE
    does both — possibly across two different groups when the update moved
    the row's group key. Groups whose count reaches zero are dropped, so
    the output is exactly what a full recompute over the new snapshot
    would produce (verified cross-engine in the `cdc_incremental` oracle
    branch and by tests/test_cdc.py's recompute differential).

    Cost: one groupBy over |diff| rows + one outer join against the prior
    aggregate — independent of the fact table's size.
    """
    group_by = list(group_by)

    def side(prefix: str, sign: int) -> DataFrame:
        ops = (INSERT, UPDATE) if prefix == "new" else (DELETE, UPDATE)
        return diff.filter(F.col("op").isin(*ops)).select(
            *[F.col(f"{prefix}_{g}").alias(g) for g in group_by],
            *[
                (F.lit(sign) * F.col(f"{prefix}_{c}")).alias(c)
                for c in sum_cols
            ],
            F.lit(sign).alias("__w"),
        )

    deltas = (
        side("new", 1)
        .unionByName(side("old", -1))
        .groupBy(*group_by)
        .agg(
            *[F.sum(c).alias(f"d_sum_{c}") for c in sum_cols],
            F.sum("__w").alias("d_n"),
        )
    )

    p = prior_agg
    for g in group_by:
        p = p.withColumnRenamed(g, f"__p_{g}")
    cond = None
    for g in group_by:
        term = F.col(f"__p_{g}").eqNullSafe(F.col(g))
        cond = term if cond is None else cond & term
    merged = p.join(deltas, cond, "full_outer")
    out = merged.select(
        *[F.coalesce(F.col(f"__p_{g}"), F.col(g)).alias(g) for g in group_by],
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"d_sum_{c}"), F.lit(0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("d_n"), F.lit(0))
        ).alias(count_col),
    )
    return out.filter(F.col(count_col) > 0)


def grouped_sums(
    df: DataFrame,
    group_by: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The full-recompute aggregate `apply_agg_delta` maintains: per-group
    SUMs + row count, in the exact column shape the incremental path
    emits."""
    return df.groupBy(*group_by).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias(count_col),
    )


def apply_join_delta(
    prior_join: DataFrame,
    diff: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    join_on: Sequence[str],
) -> DataFrame:
    """Incrementally maintain a materialized INNER equi-join when ONE side
    changes: ``prior_join`` is the previous ``changed_side ⋈ other`` (it
    must carry the changed side's primary key ``keys``), ``diff`` is the
    changed side's changefeed from :func:`snapshot_diff`, and ``other`` is
    the other side's CURRENT snapshot, joined on the shared columns
    ``join_on``.

    Delta algebra: rows whose key appears as DELETE or UPDATE leave the
    materialization (anti-join on ``keys``); the after-images of INSERT and
    UPDATE re-join against ``other`` and enter. The result is exactly
    ``new_changed_side ⋈ other`` — verified against a full recompute both
    in tests/test_cdc.py and cross-engine in set_ops' `ivm_join` branch.

    When BOTH sides change, compose: apply this with the left diff against
    the old right side, then again with the right diff against the NEW left
    side — (A′⋈B) patched by ΔB gives A′⋈B′.

    Cost: |prior| anti-join |Δ| (Δ broadcast when small) + |Δ| ⋈ other.
    The second term scans `other` once per batch — co-partition or bucket
    `other` on the join key (sources/bucketing.py) so the probe prunes, or
    broadcast Δ; either way the FACT side is touched |Δ|-proportionally,
    never rescanned."""
    keys = list(keys)
    join_on = list(join_on)
    # the changed side's columns = whatever the materialization carries
    # that did NOT come from `other`, plus the join columns themselves
    # (an UPDATE may move a row to a different join key); `other`'s payload
    # columns legitimately appear in prior_join — they re-enter via the
    # re-join, not via the diff images
    changed_cols = [c for c in prior_join.columns if c not in other.columns] + join_on
    missing = [
        c for c in changed_cols
        if c not in keys and f"new_{c}" not in diff.columns
    ]
    if missing:
        raise ValueError(
            f"apply_join_delta: diff lacks new-images for changed-side "
            f"columns {missing}"
        )
    touched = diff.filter(F.col("op").isin(DELETE, UPDATE)).select(
        *[F.col(k) for k in keys]
    )
    survivors = prior_join.join(touched, keys, "left_anti")
    new_images = diff.filter(F.col("op").isin(INSERT, UPDATE)).select(
        *keys,
        *[
            F.col(f"new_{c}").alias(c)
            for c in changed_cols
            if c not in keys
        ],
    )
    entered = new_images.join(other, join_on).select(*prior_join.columns)
    return survivors.unionByName(entered)
