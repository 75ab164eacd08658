"""Incremental materialized views over the transaction log's change feed.

The reference recomputes every Athena view from full history at query
time (`scripts/athena/create_views.sql` — the engine inlines the view
body), and its gold build rebuilds aggregates from all of silver on every
run (`scripts/glue/build_facts.py`). At 100 TB both habits make the
COST of an aggregate proportional to the TABLE, forever. The lakehouse
answer (Databricks materialized views, Delta Live Tables; the classic
incremental-view-maintenance literature) is to materialize the aggregate
once and FOLD each batch of changes into it, so a refresh costs
O(|changes| + |affected groups|) regardless of table size.

This module is that loop, end to end, on this repo's own substrate:

* the change source is `tx_changes(update_images=True,
  skip_row_preserving=True)` — row-accurate deltas straight from the
  immutable data files (no extra CDC storage), with compactions skipped
  (row-preserving) and merge rewrites key-resolved to minimal pairs;
* the fold is a signed aggregate: inserts/update-postimages weigh +1,
  deletes/update-preimages −1 — SUM/COUNT are self-maintainable, AVG
  rides as SUM + non-null COUNT, and MIN/MAX are maintained
  append-only via `least`/`greatest` with a per-group RESCAN when a
  delete touches the group (deletes can expose the second-smallest
  value, which no incremental state holds — the rescan set is exactly
  the groups with deletions, surfaced honestly instead of hidden);
* the write-back is `tx_merge(null_safe_keys=True)` — only the MV files
  containing AFFECTED groups rewrite (a refresh touching 10 of 10M
  groups rewrites ~1 file, not the view), NULL group keys stay one
  group (SQL GROUP BY treats NULLs as equal; a plain equi-merge would
  duplicate them), and groups whose count reaches zero are deleted by
  the merge's WHEN MATCHED ... DELETE clause;
* exactly-once rides the log's txn tokens: every refresh commits with
  `txn=(app, source_version)` where `app` embeds the view-definition
  hash, so a replayed refresh is a structural no-op and the folded
  source version IS the stored watermark — no side state to drift.

SQL NULL faithfulness: `SUM(c)` over an all-NULL group is NULL, but NULL
is not incrementally maintainable from signed deltas alone — so the MV
stores `sum_<c>` null-free (empty = 0) alongside `nn_<c>`, the group's
non-null count, and `mv_read` re-derives the SQL value
(`CASE WHEN nn=0 THEN NULL ELSE sum END`). The differential tests pin
`mv_read` against a full GROUP BY recompute, NULL groups included.

Scale shape at 100 TB: a refresh reads only the change range's files
(bounded by what landed since the last refresh), shuffles |changes| rows
once for the delta groupBy, rescans only delete-affected groups via a
stats-prunable semi-join, and rewrites only the MV files those groups
live in. Nothing is proportional to the source table except the create.

The CONTINUOUS spelling of the same loop is
`streaming/jobs.py::run_txtable_agg_foreachbatch` (the txtable stream
source driving a maintained SUM/COUNT aggregate per micro-batch); this
module is the scheduled/batch spelling with the full surface — MIN/MAX
with rescan, AVG, WHERE, NULL-faithful sums, definition replace.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .txlog import (
    get_data_store,
    tx_changes,
    tx_commit_txn,
    tx_merge,
    tx_overwrite,
    tx_read,
    tx_snapshot,
)

__all__ = ["mv_create", "mv_refresh", "mv_read", "mv_spec", "mv_status"]

_SPEC_REL = "_mv/spec.json"

#: change-feed sign: +1 rows enter the group, -1 rows leave it
_POS = ("insert", "update_postimage")


def _canonical(spec: dict) -> str:
    return json.dumps(spec, sort_keys=True, separators=(",", ":"))


def _mv_app(spec: dict) -> str:
    """Txn-token app id, bound to the view DEFINITION: replacing the
    definition starts a fresh watermark namespace, so a replace at the
    same source version can never be mistaken for an already-folded
    refresh of the old definition."""
    h = hashlib.sha256(_canonical(spec).encode()).hexdigest()[:12]
    return f"mv:{h}"


def mv_spec(mv_path: str) -> dict:
    """The view definition, as stored at create time."""
    store = get_data_store(mv_path)
    if not store.exists(mv_path, _SPEC_REL):
        raise ValueError(f"{mv_path}: no materialized-view spec — "
                         "mv_create first")
    with store.open_input(mv_path, _SPEC_REL) as fh:
        return json.loads(fh.read().decode())


def _validate(group_by, sum_cols, min_cols, max_cols) -> None:
    agg_named = (
        {f"sum_{c}" for c in sum_cols} | {f"nn_{c}" for c in sum_cols}
        | {f"min_{c}" for c in min_cols} | {f"max_{c}" for c in max_cols}
        | {"n_rows", "__mv_abs", "__mv_del"}
    )
    clash = sorted(agg_named & set(group_by))
    if clash:
        raise ValueError(f"mv_create: group key collides with an MV "
                         f"internal column: {clash}")
    if not group_by:
        raise ValueError("mv_create: group_by must be non-empty (global "
                         "aggregates: add a constant key column upstream)")


def _full_agg(df: DataFrame, spec: dict) -> DataFrame:
    """The MV's internal state from a full scan — the shape every
    incremental refresh must land on (pinned by the differential tests)."""
    aggs = []
    for c in spec["sum_cols"]:
        aggs.append(F.coalesce(F.sum(c), F.lit(0)).alias(f"sum_{c}"))
        aggs.append(F.count(c).alias(f"nn_{c}"))
    for c in spec["min_cols"]:
        aggs.append(F.min(c).alias(f"min_{c}"))
    for c in spec["max_cols"]:
        aggs.append(F.max(c).alias(f"max_{c}"))
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.groupBy(*spec["group_by"]).agg(*aggs)


def _null_safe_semi(df: DataFrame, probe: DataFrame, keys: list[str]) -> DataFrame:
    """left-semi on keys with <=> (GROUP BY key semantics: NULL == NULL)."""
    probe = probe.select(*[F.col(k).alias(f"__mv_k_{k}") for k in keys])
    cond = None
    for k in keys:
        term = F.col(k).eqNullSafe(F.col(f"__mv_k_{k}"))
        cond = term if cond is None else cond & term
    return df.join(probe, cond, "leftsemi")


def mv_create(
    spark: SparkSession,
    src_path: str,
    mv_path: str,
    *,
    group_by: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    filter: str | None = None,
    replace: bool = False,
) -> dict:
    """Materialize `SELECT group_by, SUM(sum_cols), MIN/MAX(...),
    COUNT(*) FROM src [WHERE filter] GROUP BY group_by` as a txlog table
    at `mv_path`, pinned to the source's CURRENT version; `mv_refresh`
    folds everything the source commits after that. One full source scan
    — the last one this view ever needs."""
    spec = {
        "src": src_path,
        "group_by": list(group_by),
        "sum_cols": sorted(sum_cols or []),
        "min_cols": sorted(min_cols or []),
        "max_cols": sorted(max_cols or []),
        "filter": filter,
    }
    _validate(spec["group_by"], spec["sum_cols"], spec["min_cols"],
              spec["max_cols"])
    store = get_data_store(mv_path)
    if store.exists(mv_path, _SPEC_REL) and not replace:
        raise ValueError(f"{mv_path}: materialized view exists "
                         "(replace=True to redefine)")
    v0 = tx_snapshot(src_path)["version"]
    df = tx_read(spark, src_path, v0)
    if filter:
        df = df.filter(filter)
    agg = _full_agg(df, spec)
    store.put_atomic(mv_path, _SPEC_REL, _canonical(spec))
    # a full overwrite in both modes: create is the first write, and a
    # replace under a changed definition must swap the SCHEMA too (the
    # old state's columns are meaningless to the new fold). The fresh
    # app namespace (_mv_app hashes the definition) keeps the old
    # watermark from masking a replace at the same source version.
    tx_overwrite(agg, mv_path, txn=(_mv_app(spec), v0))
    return {"version": v0, "spec": spec}


def mv_read(
    spark: SparkSession,
    mv_path: str,
    *,
    avg_cols: list[str] | None = None,
    internal: bool = False,
) -> DataFrame:
    """The view's SQL-faithful contents: group keys, `sum_<c>` (NULL when
    the group holds no non-null value, exactly `SUM`), `min_<c>`/
    `max_<c>`, `n_rows`, and `avg_<c>` for requested columns.
    `internal=True` returns the raw maintenance state instead (null-free
    sums + non-null counts)."""
    spec = mv_spec(mv_path)
    df = tx_read(spark, mv_path).filter(F.col("n_rows") > 0)
    if internal:
        return df
    cols = [F.col(k) for k in spec["group_by"]]
    for c in spec["sum_cols"]:
        cols.append(
            F.when(F.col(f"nn_{c}") > 0, F.col(f"sum_{c}"))
            .alias(f"sum_{c}")
        )
    for c in avg_cols or []:
        if c not in spec["sum_cols"]:
            raise ValueError(f"avg_cols: {c!r} is not a sum column of "
                             "this view (AVG rides as SUM/COUNT)")
        cols.append(
            (F.when(F.col(f"nn_{c}") > 0, F.col(f"sum_{c}"))
             / F.col(f"nn_{c}")).alias(f"avg_{c}")
        )
    for c in spec["min_cols"]:
        cols.append(F.col(f"min_{c}"))
    for c in spec["max_cols"]:
        cols.append(F.col(f"max_{c}"))
    cols.append(F.col("n_rows"))
    return df.select(*cols)


def mv_status(mv_path: str) -> dict:
    """Staleness report without a SparkSession: the stored watermark (the
    last source version folded in) vs the source's current version.
    `stale_by` = commits the next refresh would fold (0 = current).
    None watermark means the spec file does not match any create commit —
    the same inconsistency mv_refresh refuses on."""
    spec = mv_spec(mv_path)
    wm = tx_snapshot(mv_path)["txns"].get(_mv_app(spec))
    src_v = tx_snapshot(spec["src"])["version"]
    return {
        "src": spec["src"],
        "watermark": wm,
        "src_version": src_v,
        "stale_by": None if wm is None else max(0, src_v - wm),
        "spec": spec,
    }


def mv_refresh(spark: SparkSession, mv_path: str) -> dict:
    """Fold every source commit since the last refresh into the view —
    cost proportional to the CHANGES, never the source table. Returns
    {"refreshed": bool, "from_version", "to_version", "version"
    (the MV's new commit, None when already current)}.

    Exactly-once: the fold commits with txn=(app, to_version); a crashed
    refresh replayed later is a structural no-op, and the watermark IS
    the token the log already stores. Concurrent refreshes serialize
    through the commit protocol (one wins the version; the loser's token
    check turns it into a no-op)."""
    spec = mv_spec(mv_path)
    src, keys = spec["src"], spec["group_by"]
    app = _mv_app(spec)
    last = tx_snapshot(mv_path)["txns"].get(app)
    if last is None:
        raise ValueError(
            f"{mv_path}: no refresh watermark for this definition — the "
            "create commit is missing or the spec file was replaced "
            "without mv_create(replace=True)"
        )
    to_v = tx_snapshot(src)["version"]
    if to_v <= last:
        return {"refreshed": False, "from_version": last,
                "to_version": last, "version": None}

    ch = tx_changes(spark, src, last, to_v,
                    update_images=True, skip_row_preserving=True)
    if spec["filter"]:
        ch = ch.filter(spec["filter"])
    sign = F.when(F.col("_change_type").isin(*_POS), F.lit(1)) \
            .otherwise(F.lit(-1))

    aggs = []
    for c in spec["sum_cols"]:
        aggs.append(
            F.coalesce(F.sum(sign * F.col(c)), F.lit(0)).alias(f"sum_{c}")
        )
        aggs.append(
            F.sum(F.when(F.col(c).isNotNull(), sign).otherwise(F.lit(0)))
            .alias(f"nn_{c}")
        )
    for c in spec["min_cols"]:
        aggs.append(F.min(F.when(sign == 1, F.col(c))).alias(f"min_{c}"))
    for c in spec["max_cols"]:
        aggs.append(F.max(F.when(sign == 1, F.col(c))).alias(f"max_{c}"))
    aggs.append(F.sum(sign).alias("n_rows"))
    aggs.append(F.max(F.when(sign == -1, F.lit(1)).otherwise(F.lit(0)))
                .alias("__mv_del"))
    delta = ch.groupBy(*keys).agg(*aggs)

    minmax = spec["min_cols"] or spec["max_cols"]
    if minmax:
        # deletes can expose the runner-up value no incremental state
        # holds: rescan EXACTLY the delete-affected groups from the
        # source at to_v and carry their min/max absolutely (__mv_abs).
        # Groups fully emptied miss the rescan — their NULL abs values
        # are dead weight behind the WHEN MATCHED DELETE clause.
        delta = delta.localCheckpoint(eager=True)
        del_groups = delta.filter(F.col("__mv_del") == 1).select(*keys)
        cur = tx_read(spark, src, to_v)
        if spec["filter"]:
            cur = cur.filter(spec["filter"])
        rescan_aggs = (
            [F.min(c).alias(f"__rs_min_{c}") for c in spec["min_cols"]]
            + [F.max(c).alias(f"__rs_max_{c}") for c in spec["max_cols"]]
        )
        rescan = (
            _null_safe_semi(cur, del_groups, keys)
            .groupBy(*keys)
            .agg(*rescan_aggs)
            .select(*[F.col(k).alias(f"__rs_{k}") for k in keys],
                    *[F.col(a) for a in
                      [f"__rs_min_{c}" for c in spec["min_cols"]]
                      + [f"__rs_max_{c}" for c in spec["max_cols"]]])
        )
        cond = None
        for k in keys:
            term = F.col(k).eqNullSafe(F.col(f"__rs_{k}"))
            cond = term if cond is None else cond & term
        joined = delta.join(rescan, cond, "left")
        out_cols = [F.col(k) for k in keys]
        for c in spec["sum_cols"]:
            out_cols += [F.col(f"sum_{c}"), F.col(f"nn_{c}")]
        for c in spec["min_cols"]:
            out_cols.append(
                F.when(F.col("__mv_del") == 1, F.col(f"__rs_min_{c}"))
                .otherwise(F.col(f"min_{c}")).alias(f"min_{c}")
            )
        for c in spec["max_cols"]:
            out_cols.append(
                F.when(F.col("__mv_del") == 1, F.col(f"__rs_max_{c}"))
                .otherwise(F.col(f"max_{c}")).alias(f"max_{c}")
            )
        out_cols.append(F.col("n_rows"))
        out_cols.append((F.col("__mv_del") == 1).alias("__mv_abs"))
        source = joined.select(*out_cols)
    else:
        source = delta.withColumn("__mv_abs", F.lit(False)) \
                      .drop("__mv_del")
    # |affected groups| rows: materialize ONCE so the merge's candidate
    # probe and rewrite don't re-execute the whole change-feed plan
    # (tx_changes unions + DV anti-joins + rescan join) per action
    source = source.localCheckpoint(eager=True)
    if source.isEmpty():
        # the range held only row-preserving commits (compactions) or
        # changes the filter excluded: advance the watermark with a
        # txn-only commit — no empty data file, same exactly-once token
        v = tx_commit_txn(mv_path, app, to_v)
        return {"refreshed": v is not None, "from_version": last,
                "to_version": to_v, "version": v}

    upd = {}
    for c in spec["sum_cols"]:
        upd[f"sum_{c}"] = F.col(f"sum_{c}") + F.col(f"__src_sum_{c}")
        upd[f"nn_{c}"] = F.col(f"nn_{c}") + F.col(f"__src_nn_{c}")
    for c in spec["min_cols"]:
        upd[f"min_{c}"] = (
            F.when(F.col("__src___mv_abs"), F.col(f"__src_min_{c}"))
            .otherwise(F.least(F.col(f"min_{c}"), F.col(f"__src_min_{c}")))
        )
    for c in spec["max_cols"]:
        upd[f"max_{c}"] = (
            F.when(F.col("__src___mv_abs"), F.col(f"__src_max_{c}"))
            .otherwise(F.greatest(F.col(f"max_{c}"),
                                  F.col(f"__src_max_{c}")))
        )
    upd["n_rows"] = F.col("n_rows") + F.col("__src_n_rows")

    res = tx_merge(
        spark, mv_path, source, keys,
        txn=(app, to_v),
        null_safe_keys=True,
        when_matched_delete=(F.col("n_rows") + F.col("__src_n_rows")) <= 0,
        when_matched_update=upd,
        # NEW groups born and fully deleted inside one refresh range net
        # to n_rows<=0 — the conditional insert drops them, so the state
        # never accretes dead rows (and needs no sweep commit)
        when_not_matched_insert=F.col("__src_n_rows") > 0,
    )
    return {"refreshed": res["version"] is not None, "from_version": last,
            "to_version": to_v, "version": res["version"]}
