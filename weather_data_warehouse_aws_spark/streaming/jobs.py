"""Structured Streaming variants of the batch aggregations (SURVEY §2.10).

The reference is strictly daily batch (EventBridge cron, `README.md:55-59`);
its bronze layer, though, is *naturally* a file-arrival stream, and the
driver's `events` table invites windowed aggregation. These jobs are the
streaming twins of the batch queries in queries/temporal.py — same logical
plan through the Dataset API, which is exactly Spark's pitch: write once,
run batch or incremental.

Scale notes:
* watermarks bound state: `1 hour` watermark + 1-hour tumbling windows keeps
  O(#active windows × #groups) state per executor;
* `availableNow` trigger gives incremental batch (catch-up without a
  long-running cluster) — used by the tests;
* session windows use the built-in `session_window` (state-store-backed,
  mergeable) rather than the gaps-and-islands window chain, which doesn't
  stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_session_conf
from ..sources.tables import read_parquet_if_exists

EVENTS_STREAM_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of parquet event files."""
    ensure_session_conf(spark)
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def hourly_event_counts(events: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of queries/temporal.q_events_hourly: tumbling 1-hour
    windows with late-data tolerance = `watermark`.

    Groups on the window STRUCT and projects `.start` after the agg —
    extracting the field before aggregation severs event-time tracking and
    makes append mode (the finalize-and-emit mode) illegal.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_windows(events: DataFrame, *, gap: str = "30 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization via the built-in mergeable session window —
    the stateful twin of queries/temporal.q_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, *, timeout_sec: int = 120,
                  mode: str = "complete") -> DataFrame:
    """Drain a stream with the availableNow trigger into an in-memory table
    and return the result as a batch DataFrame. `complete` for aggregations;
    `append` for row streams (dedup, enrichment)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return stream_df.sparkSession.table(name)


def deduped_event_stream(
    events: DataFrame, *, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once event delivery over an at-least-once source: drop rows
    repeating a key within the watermark horizon — the streaming twin of the
    batch keyed dedup (queries/joins.q_dedup_latest) and the standard fix
    for replayed file drops / producer retries.

    State design: `dropDuplicatesWithinWatermark` keeps one state entry per
    key and EVICTS entries older than the watermark — bounded state, unlike
    streaming `dropDuplicates`, whose key set grows forever. Duplicates
    arriving later than the watermark horizon are therefore not guaranteed
    to dedup: size the watermark to the source's replay window, not to the
    data's lateness.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def enriched_event_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream against a (broadcast)
    dimension snapshot. The static side is re-resolved per micro-batch, so
    a dim refresh is picked up without restarting the query — the streaming
    twin of the fact-view dim joins (pipeline/views.py)."""
    return events.join(F.broadcast(dim), "user_id", "left")


def scd2_enriched_stream(
    events: DataFrame,
    scd2_dim: DataFrame,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """POINT-IN-TIME stream enrichment against an SCD2 dimension: each
    event joins the dim VERSION whose [effective_from_date,
    effective_to_date) range contains the event's event-time — not just
    the current version, so late/replayed events get the attributes that
    were true WHEN THEY HAPPENED. This is the streaming consumer of the
    reference's SCD2 design (`build_dimensions.py:70-91` documents the
    effective-dating; `operators/scd2.py` builds it): a live feed joined
    to dim_location must pick the historically-correct city attributes.

    Plan shape: stream-static join on the natural key plus a range
    residual — Spark broadcasts the dim per micro-batch (dims are
    MB-scale), so this is a map-side probe with zero streaming state; a
    dim refresh (new merge output) is picked up at the next batch without
    restarting. Half-open [from, to): an event exactly ON a version
    boundary belongs to the NEW version, matching scd2_merge's expire
    algebra (old closes AT the effective date)."""
    d = F.broadcast(scd2_dim)
    ev_date = F.to_date(events[ts_col])
    cond = (
        (events[key] == scd2_dim[key])
        & (ev_date >= scd2_dim["effective_from_date"])
        & (ev_date < scd2_dim["effective_to_date"])
    )
    return events.join(d, cond, "left").drop(scd2_dim[key])


def run_upsert_foreachbatch(
    stream_df: DataFrame,
    silver_path: str,
    checkpoint_path: str,
    partition_col: str,
    key_cols: list[str],
    *,
    timeout_sec: int = 180,
    target_format: str = "parquet",
) -> None:
    """foreachBatch UPSERT sink: merge each micro-batch into the target by
    key, rewriting only affected partitions.

    The plain file sink appends exactly-once but can't update; a naive
    per-batch dynamic overwrite LOSES rows when two micro-batches touch the
    same partition (the second replaces the first). The correct merge:
    existing rows in affected partitions that don't collide on the key are
    kept (left_anti), batch rows win, and only affected partitions rewrite.
    This is vanilla Spark's spelling of Delta MERGE / JDBC upsert, riding
    streaming's checkpointed progress tracking.

    Contract (parquet mode): `partition_col` must be immutable per key
    (the norm for date-partitioned event tables). A batch row that CHANGES
    a key's partition value upserts into the new partition but cannot
    retire the copy in the old one — finding it would take a full-table
    key scan per batch, which is the index a real table format maintains.
    Route partition-moving corrections through a batch snapshot-diff
    rebuild (operators/cdc.py) instead.

    `target_format="tx"` upserts into a TRANSACTION-LOG table via
    `tx_merge` instead: each micro-batch is one atomic commit, only files
    containing matched keys rewrite (stats-pruned key scan — not
    partition-granular), the partition-move caveat disappears (the key
    scan finds the old copy wherever it lives and the update lands in its
    new partition), and a replayed batch is naturally idempotent (its
    keys are already matched, so the re-merge reproduces the same state).
    Unlike parquet mode, duplicate keys WITHIN one batch raise — merge
    semantics need one source row per key; pre-aggregate the batch to
    latest-per-key upstream if the feed can repeat keys."""

    def _write_tx(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.txlog import tx_merge

        tx_merge(
            batch_df.sparkSession, silver_path, batch_df,
            list(key_cols), partition_by=[partition_col],
        )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            affected = [r[0] for r in batch_df.select(partition_col).distinct().collect()]
            if not affected:
                return
            # path-missing → first batch, nothing to merge. Any OTHER read
            # error re-raises: treating a transient failure as first-batch
            # would let the dynamic overwrite replace affected partitions
            # with only the batch rows, silently losing existing data.
            target = read_parquet_if_exists(spark, silver_path)
            if target is None:
                merged = batch_df
            else:
                # null-safe membership: `isin([None])` never matches a NULL
                # partition, which would EXCLUDE existing NULL-partition
                # rows from the merge while the dynamic overwrite still
                # rewrites that directory — silently dropping them
                non_null = [a for a in affected if a is not None]
                cond = (
                    F.col(partition_col).isin(non_null)
                    if non_null
                    else F.lit(False)
                )
                if len(non_null) != len(affected):
                    cond = cond | F.col(partition_col).isNull()
                existing = target.filter(cond)
                merged = existing.join(
                    batch_df.select(*key_cols), key_cols, "left_anti"
                ).unionByName(batch_df)
                # materialize BEFORE the write: `merged` reads the very
                # partitions the overwrite is about to replace
                merged = merged.localCheckpoint(eager=True)
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                merged.write.partitionBy(partition_col).mode("overwrite").parquet(silver_path)
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        finally:
            batch_df.unpersist()

    if target_format not in ("parquet", "tx"):
        raise ValueError(
            f"run_upsert_foreachbatch: target_format must be 'parquet' or "
            f"'tx', got {target_format!r}"
        )
    q = (
        stream_df.writeStream.foreachBatch(
            _write_tx if target_format == "tx" else _write
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def run_incremental_agg_foreachbatch(
    diff_stream: DataFrame,
    agg_path: str,
    checkpoint_path: str,
    group_by: list[str],
    sum_cols: list[str],
    *,
    initial_agg: DataFrame | None = None,
    count_col: str = "n_rows",
    timeout_sec: int = 180,
    state_format: str = "versioned",
) -> None:
    """Streaming incremental gold maintenance: each micro-batch is a slice
    of a CDC changefeed (operators/cdc.py::snapshot_diff shape — op +
    old_/new_ images) and is folded into the maintained aggregate with
    apply_agg_delta. The fact stream is never re-scanned; per batch the
    cost is |batch| + |aggregate|.

    Exactly-once without a table format: each batch writes the FULL (small)
    aggregate to a versioned dir ``{agg_path}/v=<batch_id>`` after reading
    the newest version with id < batch_id as the prior. A retried batch
    (failure between write and checkpoint commit) re-reads the same prior
    and overwrites its own version — idempotent, no double-count; the
    half-written version is never a read candidate for its own retry.
    ``read_current_agg`` resolves the newest complete version. Retention:
    after each successful write, versions older than the one the batch was
    derived from are garbage-collected, so a long-running feed holds at
    most two versions (current + retry-safety prior) on disk.

    Ordering: a changefeed is inherently ordered; the single-writer file
    source delivers files in arrival order (`latestFirst` stays false).
    `initial_agg` seeds the prior for the very first batch (e.g.
    grouped_sums over the base snapshot); default is an empty aggregate.

    Version listing uses the local filesystem (tests, local[n]); a cluster
    deployment swaps the two `os`/`glob` calls for the Hadoop FS client —
    the versioning protocol is unchanged.
    """
    from ..operators.cdc import apply_agg_delta

    def _merge(spark: SparkSession, batch_df: DataFrame, prior) -> DataFrame:
        if prior is None:
            if initial_agg is not None:
                prior = initial_agg
            else:
                # empty aggregate in the exact shape apply_agg_delta emits
                from ..operators.cdc import grouped_sums

                empty_snap = batch_df.select(
                    *[F.col(f"new_{g}").alias(g) for g in group_by],
                    *[F.col(f"new_{c}").alias(c) for c in sum_cols],
                ).limit(0)
                prior = grouped_sums(empty_snap, group_by, sum_cols, count_col)
        return apply_agg_delta(prior, batch_df, group_by, sum_cols, count_col)

    _run_state_foreachbatch(
        diff_stream, agg_path, checkpoint_path, _merge,
        timeout_sec=timeout_sec, state_format=state_format,
        app="incremental_agg",
    )


def changefeed_to_diff(
    feed: DataFrame, cols: list[str]
) -> DataFrame:
    """Adapt a `txtable` change-feed batch (table columns +
    `_change_type` in {'insert','delete'} + `_commit_version`) to the
    `snapshot_diff` shape `apply_agg_delta` consumes: inserts become
    after-images (op I), deletes become before-images (op D). A rewrite
    commit (compact/erase/merge) arrives as delete+insert of the
    overlapping rows; the delta algebra nets them out, so a pure-layout
    rewrite contributes zero — only logical changes move the aggregate."""
    types = dict(feed.dtypes)

    def side(df: DataFrame, op: str, prefix: str, other: str) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            *[F.col(c).alias(f"{prefix}_{c}") for c in cols],
            *[
                F.lit(None).cast(types[c]).alias(f"{other}_{c}")
                for c in cols
            ],
        )

    return side(
        feed.filter(F.col("_change_type") == "insert"), "I", "new", "old"
    ).unionByName(
        side(feed.filter(F.col("_change_type") == "delete"), "D", "old", "new")
    )


def run_txtable_agg_foreachbatch(
    feed_stream: DataFrame,
    agg_path: str,
    checkpoint_path: str,
    group_by: list[str],
    sum_cols: list[str],
    *,
    count_col: str = "n_rows",
    timeout_sec: int = 180,
    state_format: str = "tx",
) -> None:
    """End-to-end incremental view maintenance ON the table format: the
    input is a `txtable` change-feed stream (sources/tx_source.py —
    commit-version offsets over a transaction-log table), the state is a
    maintained grouped SUM/COUNT aggregate, and with the default
    ``state_format="tx"`` the state itself lives on a transaction-log
    table with `(app, batch_id)` exactly-once tokens. Per micro-batch the
    cost is |changed files| + |aggregate| — the base table is never
    re-scanned, and a crashed/replayed batch can neither double-count nor
    skip. This is the composition the pieces were built for: gold tables
    on the log (pipeline/run.py) stream their own changes into downstream
    aggregates with no extra CDC storage."""
    from ..operators.cdc import apply_agg_delta, grouped_sums

    cols = list(group_by) + list(sum_cols)

    def _merge(spark: SparkSession, batch_df: DataFrame, prior) -> DataFrame:
        diff = changefeed_to_diff(batch_df, cols)
        if prior is None:
            empty_snap = batch_df.select(*cols).limit(0)
            prior = grouped_sums(empty_snap, group_by, sum_cols, count_col)
        return apply_agg_delta(prior, diff, group_by, sum_cols, count_col)

    _run_state_foreachbatch(
        feed_stream, agg_path, checkpoint_path, _merge,
        timeout_sec=timeout_sec, state_format=state_format,
        app="txtable_agg",
    )


def _run_state_foreachbatch(
    stream_df: DataFrame,
    state_path: str,
    checkpoint_path: str,
    merge_fn,
    *,
    timeout_sec: int = 180,
    state_format: str = "versioned",
    app: str = "state",
) -> None:
    """Dispatch a mergeable-state streaming job to its state store:
    `versioned` (the self-contained versioned-dir protocol below) or `tx`
    (the transaction-log table — `_run_tx_foreachbatch`)."""
    if state_format == "tx":
        _run_tx_foreachbatch(
            stream_df, state_path, checkpoint_path, merge_fn,
            timeout_sec=timeout_sec, app=app,
        )
    elif state_format == "versioned":
        _run_versioned_foreachbatch(
            stream_df, state_path, checkpoint_path, merge_fn,
            timeout_sec=timeout_sec,
        )
    else:
        raise ValueError(f"state_format must be 'versioned' or 'tx', got {state_format!r}")


def _run_tx_foreachbatch(
    stream_df: DataFrame,
    state_path: str,
    checkpoint_path: str,
    merge_fn,
    *,
    timeout_sec: int = 180,
    app: str = "state",
) -> None:
    """Transaction-log state store: the maintained state is a txlog TABLE.
    Per micro-batch: read the current snapshot as the prior, fold the
    batch with ``merge_fn(spark, batch_df, prior)``, and `tx_overwrite`
    the result under the idempotence token ``(app, batch_id)`` — a batch
    REPLAYED after a sink-side crash finds its token already folded and
    commits nothing (exactly-once, the Delta txn-action design), so no
    versioned-dir bookkeeping, completeness markers, or manual GC: history
    is the log, retention is `tx_vacuum`, and consumers read the state
    with `tx_read` (time-travelable to any retained batch's version).

    vs the versioned-dir protocol: same guarantees, but the prior-read /
    publish race needs no care at all here (data files are immutable; the
    overwrite is one atomic commit), and the state keeps the full audit
    trail until vacuumed instead of exactly two versions."""
    from ..operators.txlog import tx_exists, tx_read, tx_snapshot, tx_vacuum

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.txlog import tx_overwrite

        spark = batch_df.sparkSession
        prior = None
        if tx_exists(state_path):
            snap = tx_snapshot(state_path)
            if int(snap["txns"].get(app, -1)) >= int(batch_id):
                return  # replayed batch — already folded, exactly-once
            if snap["files"]:
                prior = tx_read(spark, state_path)
        updated = merge_fn(spark, batch_df, prior)
        tx_overwrite(updated, state_path, txn=(app, int(batch_id)))
        # retention: current + retry-safety prior STATE, matching the
        # versioned protocol's footprint. Each folded batch appends TWO
        # commits (overwrite + this vacuum), so 2 states = 4 versions.
        tx_vacuum(state_path, retain_versions=4)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def _run_versioned_foreachbatch(
    stream_df: DataFrame,
    state_path: str,
    checkpoint_path: str,
    merge_fn,
    *,
    timeout_sec: int = 180,
) -> None:
    """The shared versioned-dir exactly-once protocol: per micro-batch,
    resolve the newest COMPLETE version with id < batch_id as the prior
    (None on the first batch), call ``merge_fn(spark, batch_df, prior)``,
    write the result to ``{state_path}/v=<batch_id>``, then GC versions
    older than (current, retry-safety prior). merge_fn must be
    DETERMINISTIC given (batch, prior) — that is what makes a retried
    batch idempotent. Used by the incremental-aggregate and CMS
    maintenance jobs; any mergeable state rides the same scaffold."""
    import glob
    import os
    import shutil

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prior_ids = [v for v in _complete_versions(state_path) if v < batch_id]
        prior = (
            spark.read.parquet(os.path.join(state_path, f"v={max(prior_ids)}"))
            if prior_ids
            else None
        )
        updated = merge_fn(spark, batch_df, prior)
        # materialize before writing: `prior` may read the dir being listed
        updated.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            os.path.join(state_path, f"v={batch_id}")
        )
        # GC: the new version is durable; keep the prior it was derived
        # from (a retry of THIS batch re-reads it), drop everything older
        # so a long-running feed holds at most two versions on disk
        keep = {batch_id} | ({max(prior_ids)} if prior_ids else set())
        for p in glob.glob(os.path.join(state_path, "v=*")):
            try:
                vid = int(os.path.basename(p).split("=")[1])
            except ValueError:
                continue
            if vid < batch_id and vid not in keep:
                shutil.rmtree(p, ignore_errors=True)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def _complete_versions(agg_path: str) -> list[int]:
    """Version ids whose directory carries Spark's _SUCCESS marker — a
    crash mid-write (or a racing reader) must never surface a torn,
    partially-written aggregate as 'the newest version'."""
    import glob
    import os

    return sorted(
        int(os.path.basename(p).split("=")[1])
        for p in glob.glob(os.path.join(agg_path, "v=*"))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    )


def read_current_agg(spark: SparkSession, agg_path: str) -> DataFrame:
    """Newest COMPLETE maintained-aggregate state, whichever store the job
    used: a transaction-log table reads through its snapshot; a
    versioned dir resolves the newest version carrying _SUCCESS
    (in-flight or torn versions are skipped in both stores)."""
    import os

    from ..operators.txlog import tx_exists, tx_read

    if tx_exists(agg_path):
        return tx_read(spark, agg_path)
    ids = _complete_versions(agg_path)
    if not ids:
        raise FileNotFoundError(f"no complete aggregate versions under {agg_path}")
    return spark.read.parquet(os.path.join(agg_path, f"v={ids[-1]}"))


def correlated_event_stream(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    watermark: str = "2 hours",
    band_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """STREAM-STREAM band join: pair two live event streams on an equi-key
    within a strict event-time band |l.ts − r.ts| < band_seconds — the
    streaming twin of the batch band join behind the forecast-accuracy view
    (operators/band_join.py; reference semantics create_views.sql:109-115,
    re-expressed for two unbounded sources).

    State design (the part batch joins never face): BOTH sides are
    watermarked and the join condition bounds event-time distance, so Spark
    derives an eviction horizon = watermark + band for each side's buffered
    rows — state is O(arrival rate × (watermark + band)), not O(stream
    history). Without the time-range condition the state would grow
    forever; without the watermarks the join would refuse to run in append
    mode. `how="leftOuter"` emits unmatched left rows (null right columns)
    once the watermark closes their band — same contract as the batch
    band_join's left variant.
    """
    l = left.select(
        F.col(key).alias("join_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_id"),
        F.col("value").alias("l_value"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
        F.col("value").alias("r_value"),
    ).withWatermark("r_ts", watermark)
    band = F.expr(f"INTERVAL {band_seconds} SECONDS")
    cond = (
        (F.col("join_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts") - band)
        & (F.col("r_ts") < F.col("l_ts") + band)
    )
    return l.join(r, cond, how).select(
        "join_key", "l_id", "r_id", "l_ts", "r_ts", "l_value", "r_value"
    )


def attributed_event_stream(
    points: DataFrame,
    openers: DataFrame,
    *,
    key: str = "user_id",
    watermark: str = "2 hours",
    window_seconds: int = 7200,
    how: str = "inner",
) -> DataFrame:
    """STREAM-STREAM attribution (point-in-window) join: each `openers` row
    opens a half-open event-time window `[ts, ts+window_seconds)`; match
    every same-key `points` row inside it — the streaming twin of the batch
    interval_join (operators/interval_join.py), with the ASYMMETRIC range
    the band join can't express (a click 1s before the purchase must NOT
    attribute; 1s after must).

    Same bounded-state contract as correlated_event_stream: both sides
    watermarked + a time-range join condition give Spark an eviction
    horizon of watermark + window per side. `how="leftOuter"` preserves
    unattributed points once the watermark passes their last possible
    window. Boundary semantics are exactly the batch operator's: start
    inclusive, end exclusive, full timestamp precision.
    """
    p = points.select(
        F.col(key).alias("join_key"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("point_id"),
    ).withWatermark("p_ts", watermark)
    o = openers.select(
        F.col(key).alias("o_key"),
        F.col("ts").alias("o_ts"),
        F.col("event_id").alias("opener_id"),
    ).withWatermark("o_ts", watermark)
    win = F.expr(f"INTERVAL {window_seconds} SECONDS")
    cond = (
        (F.col("join_key") == F.col("o_key"))
        & (F.col("p_ts") >= F.col("o_ts"))
        & (F.col("p_ts") < F.col("o_ts") + win)
    )
    return p.join(o, cond, how).select(
        "join_key", "point_id", "opener_id", "p_ts", "o_ts"
    )


def hourly_distinct_users(events: DataFrame, *, watermark: str = "1 hour",
                          lg_k: int = 12) -> DataFrame:
    """Streaming distinct-user counts per tumbling hour via mergeable HLL
    sketches — the streaming twin of operators/rollup_time.distinct_rollup.

    Exact streaming COUNT(DISTINCT) would hold every seen id in state;
    `hll_sketch_agg` keeps 2^lg_k-byte registers per (window, key) instead,
    and the emitted sketch column stays MERGEABLE downstream: a batch job
    unions finalized hourly sketches into day/month rollups without ever
    re-reading the stream (the lambda-architecture join-point, minus the
    lambda: one code path, one error model). State is bounded by
    |open windows|·|keys|·KB regardless of id cardinality.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.expr(f"hll_sketch_agg(user_id, {lg_k})").alias("sketch"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "sketch",
            F.expr("CAST(hll_sketch_estimate(sketch) AS LONG)").alias("n_users_est"),
        )
    )


def run_cms_foreachbatch(
    stream_df: DataFrame,
    col: str,
    cms_path: str,
    checkpoint_path: str,
    *,
    width: int = 2048,
    depth: int = 5,
    timeout_sec: int = 180,
    state_format: str = "versioned",
) -> None:
    """Streaming heavy-hitter maintenance: each micro-batch's Count-Min
    sketch (operators/cms.py) merges into a persisted sketch — frequency
    state over an unbounded stream in d·width longs, never a per-key table.

    Exactly-once by the same versioned-dir protocol as
    `run_incremental_agg_foreachbatch`: merge is an exact integer SUM, so
    a retried batch re-merging against the same prior version produces the
    identical sketch (idempotent); versions older than the retry-safety
    prior are garbage-collected. `read_current_agg(spark, cms_path)` reads
    the live sketch for `cms_estimate`/`cms_heavy_hitters` probes."""
    from ..operators.cms import cms_build, cms_merge

    def _merge(spark, batch_df: DataFrame, prior) -> DataFrame:
        batch_sketch = cms_build(batch_df, col, width=width, depth=depth)
        return batch_sketch if prior is None else cms_merge(prior, batch_sketch)

    _run_state_foreachbatch(
        stream_df, cms_path, checkpoint_path, _merge,
        timeout_sec=timeout_sec, state_format=state_format, app="cms",
    )
