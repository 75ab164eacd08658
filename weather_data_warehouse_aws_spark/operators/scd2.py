"""SCD Type 2 dimension maintenance — SURVEY.md §2.9 X5.

The reference *documents* a full SCD2 dimension (`README.md:17,147,292`) and
carries the columns for it (`build_dimensions.py:70-91`: effective_from_date,
effective_to_date='9999-12-31', is_current, version, audit timestamps), but
only implements the initial load — on any later run it prints "Dimension
exists, no updates needed" (`build_dimensions.py:96-97`). This module
implements the real merge:

  for each natural key in the update snapshot
    - tracked attributes unchanged → keep the current row
    - changed → EXPIRE the current row (effective_to_date = effective_date,
      is_current=false, updated_timestamp=now) and INSERT version+1
    - unseen natural key → INSERT version 1
  historical (already-expired) rows pass through untouched; keys absent from
  the snapshot remain current (the reference domain has no deletes).

Scale: one full-outer shuffle join on the natural key + unions — no windows
over the whole dim, no driver loops. Dimensions are usually broadcast-sized,
but nothing here breaks if they aren't: the join partitions on the natural
key. Surrogate keys: `hash` strategy (xxhash64 of natural key + version) is
pure map-side and the 100 TB default; `dense` reproduces the reference's
row_number-style compact keys and is guarded by `operators.keys.dense_key`'s
size ceiling.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HIGH_DATE = "9999-12-31"


def _qid(name: str) -> str:
    """Backtick-quote an identifier for interpolation into parsed SQL.
    Embedded backticks are escaped (`` is a literal ` inside quotes), so a
    caller-supplied column name can never break out of the identifier —
    the Column-API immunity the parsed-string spelling must preserve."""
    return f"`{name.replace('`', '``')}`"


def scd2_initial_load(
    updates: DataFrame,
    natural_key: Sequence[str],
    key_col: str = "location_key",
    *,
    effective_date: _dt.date | None = None,
    now: _dt.datetime | None = None,
    key_strategy: str = "dense",
) -> DataFrame:
    """First load of an SCD2 dim — parity with `build_dimensions.py:63-94`."""
    eff = F.lit(effective_date) if effective_date else F.current_date()
    now_ts = F.lit(now) if now else F.current_timestamp()

    if key_strategy == "dense":
        w = Window.orderBy(*natural_key)
        keyed = updates.withColumn(key_col, F.row_number().over(w))
    elif key_strategy == "hash":
        keyed = updates.withColumn(key_col, F.xxhash64(*natural_key, F.lit(1)))
    else:
        raise ValueError(f"unknown key_strategy: {key_strategy}")

    return (
        keyed.withColumn("effective_from_date", eff.cast("date"))
        .withColumn("effective_to_date", F.lit(HIGH_DATE).cast("date"))
        .withColumn("is_current", F.lit(True))
        .withColumn("version", F.lit(1))
        .withColumn("created_timestamp", now_ts.cast("timestamp"))
        .withColumn("updated_timestamp", now_ts.cast("timestamp"))
    )


def scd2_merge(
    existing: DataFrame,
    updates: DataFrame,
    natural_key: Sequence[str],
    tracked: Sequence[str],
    key_col: str = "location_key",
    *,
    effective_date: _dt.date | None = None,
    now: _dt.datetime | None = None,
    key_strategy: str = "dense",
) -> DataFrame:
    """Merge an attribute snapshot into an SCD2 dimension (see module doc).

    `updates` must carry the natural key plus every non-SCD attribute column
    of `existing`. Returns the full new dimension with `existing`'s column
    order.
    """
    scd_cols = {
        key_col,
        "effective_from_date",
        "effective_to_date",
        "is_current",
        "version",
        "created_timestamp",
        "updated_timestamp",
    }
    attr_cols = [c for c in existing.columns if c not in scd_cols and c not in natural_key]
    missing = [c for c in attr_cols if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing attribute columns: {missing}")

    # SQL snippets for the effective/now stamps: the whole merge plan is
    # built from parsed selectExpr strings (ONE py4j round-trip per
    # select instead of several per COLUMN — ~1s of serial driver
    # latency per merge call at any cluster size, measured; identical
    # expressions, identical plans)
    eff_sql = (
        f"DATE'{effective_date.isoformat()}'"
        if effective_date
        else "CAST(current_date() AS DATE)"
    )
    now_sql = (
        f"CAST(TIMESTAMP'{now.isoformat(sep=' ')}' AS TIMESTAMP)"
        if now
        else "CAST(current_timestamp() AS TIMESTAMP)"
    )

    current = existing.filter(F.col("is_current"))
    history = existing.filter(~F.col("is_current"))

    nk = [_qid(k) for k in natural_key]
    cur = current.selectExpr(
        *nk,
        *[f"{_qid(c)} AS {_qid('c_' + c)}" for c in attr_cols],
        f"{_qid(key_col)} AS c_key",
        "effective_from_date AS c_from",
        "version AS c_version",
        "created_timestamp AS c_created",
        "TRUE AS c_exists",
    )
    # snapshot-uniqueness guard, folded into the plan: a duplicate natural
    # key in `updates` would fan out the full_outer join — the expired row
    # emitted twice and multiple simultaneous is_current rows sharing one
    # surrogate key. The window shares the join's key partitioning, and
    # `updates` is dim-sized, so the guard costs a sort, not a scan.
    nk_str = ", ".join(f"CAST({k} AS STRING)" for k in nk)
    upd = updates.selectExpr(
        *nk,
        *[f"{_qid(c)} AS {_qid('u_' + c)}" for c in attr_cols],
        f"""CASE WHEN count(1) OVER (PARTITION BY {", ".join(nk)}) > 1
            THEN CAST(raise_error(concat(
                'scd2_merge: updates snapshot has duplicate rows for natural key (',
                concat_ws(', ', {nk_str}),
                ') — dedup upstream (e.g. dedup_latest)')) AS BOOLEAN)
            ELSE TRUE END AS u_exists""",
    )
    j = cur.join(upd, list(natural_key), "full_outer")

    changed = F.expr(
        " OR ".join(
            f"NOT ({_qid('c_' + t)} <=> {_qid('u_' + t)})" for t in tracked
        )
        if tracked else "FALSE"
    )
    matched = F.col("c_exists").isNotNull() & F.col("u_exists").isNotNull()

    def _current_row(df: DataFrame, *, expire: bool) -> DataFrame:
        return df.selectExpr(
            f"c_key AS {_qid(key_col)}",
            *nk,
            *[f"{_qid('c_' + c)} AS {_qid(c)}" for c in attr_cols],
            "c_from AS effective_from_date",
            (
                f"{eff_sql} AS effective_to_date"
                if expire
                else f"DATE'{HIGH_DATE}' AS effective_to_date"
            ),
            f"{'FALSE' if expire else 'TRUE'} AS is_current",
            "c_version AS version",
            "c_created AS created_timestamp",
            (
                f"{now_sql} AS updated_timestamp"
                if expire
                else "c_created AS updated_timestamp"
            ),
        )

    # kept = unchanged matches PLUS current rows absent from the snapshot —
    # absent keys remain current (partial snapshots must not drop dimension
    # rows; the reference domain has no deletes)
    kept = _current_row(
        j.filter(F.col("c_exists").isNotNull() & (F.col("u_exists").isNull() | ~changed)),
        expire=False,
    )
    expired = _current_row(j.filter(matched & changed), expire=True)

    inserts = j.filter((matched & changed) | F.col("c_exists").isNull()).selectExpr(
        *nk,
        *[f"{_qid('u_' + c)} AS {_qid(c)}" for c in attr_cols],
        "coalesce(c_version, 0) + 1 AS version",
    )
    if key_strategy == "hash":
        inserts = inserts.withColumn(key_col, F.xxhash64(*natural_key, F.col("version")))
    elif key_strategy == "dense":
        # compact keys continue from the current max; dim-sized relations only
        max_key = existing.agg(F.max(key_col)).collect()[0][0] or 0
        w = Window.orderBy(*natural_key)
        inserts = inserts.withColumn(key_col, F.row_number().over(w) + F.lit(max_key))
    else:
        raise ValueError(f"unknown key_strategy: {key_strategy}")

    inserted = inserts.selectExpr(
        _qid(key_col),
        *nk,
        *[_qid(c) for c in attr_cols],
        f"{eff_sql} AS effective_from_date",
        f"DATE'{HIGH_DATE}' AS effective_to_date",
        "TRUE AS is_current",
        "version",
        f"{now_sql} AS created_timestamp",
        f"{now_sql} AS updated_timestamp",
    )

    out_cols = existing.columns
    return (
        history.select(out_cols)
        .unionByName(kept.select(out_cols))
        .unionByName(expired.select(out_cols))
        .unionByName(inserted.select(out_cols))
    )


def inferred_members(
    facts: DataFrame,
    dim: DataFrame,
    natural_key: Sequence[str],
    key_col: str = "location_key",
    *,
    effective_date: _dt.date | None = None,
    now: _dt.datetime | None = None,
) -> DataFrame:
    """Late-arriving dimension handling (Kimball's "inferred members"):
    fact rows can reference natural keys the dimension hasn't loaded yet —
    dropping them loses facts, inner-joining delays the pipeline. The
    standard fix is to insert PLACEHOLDER current rows for the unknown keys
    (attributes null, `is_inferred` = true) so facts join immediately;
    the next real attribute snapshot expires the placeholder through the
    ordinary `scd2_merge` (null attrs ≠ real attrs ⇒ changed ⇒ expire +
    insert version 2), leaving full history.

    Plan: distinct fact keys (one shuffle of the key columns only) →
    left-anti join against current dim rows (dims broadcast) → placeholder
    rows unioned on. Surrogate keys are the map-side xxhash64 of
    (natural_key, version) — no window, no driver round-trip. Returns the
    dimension with placeholders appended and an `is_inferred` column
    (false for pre-existing rows if absent)."""
    eff = (F.lit(effective_date) if effective_date else F.current_date()).cast("date")
    now_ts = (F.lit(now) if now else F.current_timestamp()).cast("timestamp")

    base = (
        dim
        if "is_inferred" in dim.columns
        else dim.withColumn("is_inferred", F.lit(False))
    )
    current_keys = base.filter(F.col("is_current")).select(*natural_key)
    # a NULL natural-key component has no member identity — and the anti
    # join's NULL = NULL never matches, so a NULL-key placeholder would be
    # re-inserted on EVERY run (unbounded duplicate current rows). Such
    # fact rows belong in a DQ quarantine, not the dimension.
    key_known = None
    for k in natural_key:
        term = F.col(k).isNotNull()
        key_known = term if key_known is None else key_known & term
    unknown = (
        facts.select(*natural_key)
        .filter(key_known)
        .distinct()
        .join(F.broadcast(current_keys), list(natural_key), "left_anti")
    )
    attr_cols = [c for c in base.columns if c not in set(natural_key) | {
        key_col, "effective_from_date", "effective_to_date", "is_current",
        "version", "created_timestamp", "updated_timestamp", "is_inferred",
    }]
    placeholders = unknown.select(
        *natural_key,
        *[F.lit(None).cast(base.schema[c].dataType).alias(c) for c in attr_cols],
        F.xxhash64(*natural_key, F.lit(1)).alias(key_col),
        eff.alias("effective_from_date"),
        F.lit(HIGH_DATE).cast("date").alias("effective_to_date"),
        F.lit(True).alias("is_current"),
        F.lit(1).alias("version"),
        now_ts.alias("created_timestamp"),
        now_ts.alias("updated_timestamp"),
        F.lit(True).alias("is_inferred"),
    )
    return base.unionByName(placeholders.select(*base.columns))


def dim_as_of(dim: DataFrame, as_of: _dt.date | str) -> DataFrame:
    """Time-travel view of an SCD2 dimension: the attribute row that was
    current on `as_of` (effective_from ≤ as_of < effective_to under the
    half-open convention, with the HIGH_DATE sentinel closing the current
    row). Joining facts to `dim_as_of(dim, d)` reproduces any historical
    report exactly — the query-side payoff of maintaining SCD2 at all.
    Pure filter (map-side, partition-prunable on effective dates)."""
    d = F.lit(as_of).cast("date")
    return dim.filter(
        (F.col("effective_from_date") <= d) & (d < F.col("effective_to_date"))
    )
