"""Minimal transaction-log table format: atomic multi-file commits,
snapshot-isolated reads, time travel, and vacuum — the metadata layer the
rest of the lake-maintenance family (compaction, GDPR erasure) needs to be
safe under CONCURRENT readers and writers.

Why this exists: `operators/maintenance.py` rewrites files in place
(crash-safe via staging, but a reader that listed the directory a moment
earlier can still race the swap), and an erasure that removes every row
loses the table's schema with its last data file
(`maintenance.py::erase_keys` docstring calls this out explicitly). Both
are solved the way Delta Lake / Apache Iceberg solve them — public designs
(Armbrust et al., "Delta Lake: High-Performance ACID Table Storage over
Cloud Object Stores", VLDB 2020): the set of live data files is defined by
an append-only JSON log, never by directory listing.

Layout (all under the table root):

    <table>/_txn_log/00000000000000000000.json     commit 0, 1, 2, ...
    <table>/_txn_log/00000000000000000010.checkpoint.json  (every Nth)
    <table>/part-<hex>.parquet                     data files, immutable

Each commit is `{"version", "op", "add": [relpath], "remove": [relpath],
"meta": {...}}`. A snapshot at version v replays the log (from the newest
checkpoint ≤ v): live = adds − removes, in order. Data files are IMMUTABLE
— every operation writes new files and commits an (add, remove) pair, so:

* **Readers are snapshot-isolated for free.** A reader resolves its file
  list once; compaction/erasure running concurrently add/remove OTHER
  files and never touch the ones the reader resolved (until vacuum, whose
  retention window is the documented covenant, as in Delta).
* **Commits are atomic.** The next version's log file is created with
  `open(..., "x")` — exclusive create; exactly one writer wins a version.
  Losers re-read the snapshot and retry (optimistic concurrency). On a
  cluster store this maps to the LogStore contract: a conditional/
  atomic-rename PUT of the next log entry (public Delta LogStore design);
  the protocol here is identical, only the primitive changes.
* **Conflicts are semantic, not physical.** Blind appends never conflict
  (retry always succeeds). Operations that REPLACE files (compact, erase,
  overwrite) validate at commit time that every file they remove is still
  live; if a concurrent writer removed one first, the work was based on a
  stale snapshot → `TxConflict` (caller re-runs). This is Delta's
  write-serializable check reduced to remove-set disjointness.
* **Schema outlives the data.** Append/overwrite commits record the
  DataFrame schema; an emptied table still reads as 0 rows × full schema.
* **Replay stays O(tail).** Every `CHECKPOINT_INTERVAL` commits the winner
  also writes a checkpoint (full live set + schema); snapshot loads the
  newest checkpoint ≤ target and replays only the tail — at 100 TB with
  millions of commits this is the difference between O(1) and O(log-len)
  per query plan.

Time travel: `tx_read(spark, path, version=v)` — any version not yet
vacuumed. `tx_vacuum` advances a horizon (recorded as a commit, so the
refusal to read pre-horizon versions is itself transactional) and only
then deletes files whose last reference is below it.

Tables are unpartitioned at the file level (partition/cluster columns are
ordinary data columns; pair with `write_sorted`/`write_zorder` layouts for
skipping — the log stores explicit file lists, so scans never rely on
directory structure). Reference parity: the reference has no table format
at all — its silver re-runs duplicate rows (`bronze_to_silver.py:27,87`,
the M4 bug); `tx_overwrite` is the transactional fix for that class.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CHECKPOINT_INTERVAL = 10
_LOG_DIR = "_txn_log"
_PAD = 20


class TxConflict(RuntimeError):
    """A concurrent commit invalidated this operation's snapshot (a file
    it rewrites/removes is no longer live). Re-run the operation."""


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG_DIR)


def _commit_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:0{_PAD}d}.json")


def _checkpoint_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:0{_PAD}d}.checkpoint.json")


def _list_log(path: str) -> tuple[list[int], list[int]]:
    """(sorted commit versions, sorted checkpoint versions)."""
    log = _log_dir(path)
    if not os.path.isdir(log):
        return [], []
    commits, checkpoints = [], []
    for name in os.listdir(log):
        if name.endswith(".checkpoint.json"):
            checkpoints.append(int(name[: -len(".checkpoint.json")]))
        elif name.endswith(".json"):
            commits.append(int(name[: -len(".json")]))
    return sorted(commits), sorted(checkpoints)


def _read_json(fp: str) -> dict:
    with open(fp) as f:
        return json.load(f)


def tx_exists(path: str) -> bool:
    return bool(_list_log(path)[0])


def _replay(path: str, version: int | None = None) -> dict | None:
    """Snapshot state at `version` (default: latest). Returns
    {"version", "files": sorted relpaths, "stats": {relpath: stats-dict},
    "schema": json-or-None, "horizon": int, "txns": {app: max_batch}}
    or None if the log is empty.

    The vacuum horizon is taken from the FULL log, not just the replayed
    prefix — a vacuum committed after version v may have deleted files v
    needs, so reading below the newest horizon must fail loudly.
    """
    commits, checkpoints = _list_log(path)
    if not commits:
        return None
    latest = commits[-1]
    target = latest if version is None else version
    if target > latest or target < 0:
        raise ValueError(f"version {target} does not exist (latest {latest})")

    # Newest horizon across the WHOLE log (a vacuum after `target` may
    # have deleted files `target` needs). Horizons are nondecreasing, so
    # the newest vacuum commit carries the max; checkpoints fold the
    # horizon of everything at-or-before them, so the backward scan is
    # bounded by the checkpoint interval, not the log length.
    horizon = 0
    scan_floor = checkpoints[-1] if checkpoints else -1
    for v in reversed(commits):
        if v <= scan_floor:
            break
        rec = _read_json(_commit_file(path, v))
        if rec.get("op") == "vacuum":
            horizon = int(rec["meta"]["horizon"])
            break
    if horizon == 0 and checkpoints:
        horizon = int(
            _read_json(_checkpoint_file(path, checkpoints[-1])).get(
                "horizon", 0
            )
        )
    if target < horizon:
        raise ValueError(
            f"version {target} was vacuumed (horizon {horizon}) — "
            "its data files are gone"
        )

    base_v = -1
    live: dict[str, dict] = {}  # relpath -> per-file stats ({} if none)
    txns: dict[str, int] = {}  # idempotence tokens: app -> max batch seen
    schema_json = None
    usable = [c for c in checkpoints if c <= target]
    if usable:
        cp = _read_json(_checkpoint_file(path, usable[-1]))
        base_v = cp["version"]
        cp_stats = cp.get("stats", {})
        live = {f: cp_stats.get(f, {}) for f in cp["files"]}
        schema_json = cp.get("schema")
        txns = dict(cp.get("txns", {}))
    for v in commits:
        if v <= base_v or v > target:
            continue
        rec = _read_json(_commit_file(path, v))
        for f in rec.get("remove", []):
            live.pop(f, None)
        rec_stats = rec.get("stats", {})
        for f in rec.get("add", []):
            live[f] = rec_stats.get(f, {})
        if rec.get("meta", {}).get("schema"):
            schema_json = rec["meta"]["schema"]
        txn = rec.get("txn")
        if txn:
            txns[txn["app"]] = max(txns.get(txn["app"], -1), int(txn["batch"]))
    return {
        "version": target,
        "files": sorted(live),
        "stats": live,
        "schema": schema_json,
        "horizon": horizon,
        "txns": txns,
    }


def tx_snapshot(path: str, version: int | None = None) -> dict:
    snap = _replay(path, version)
    if snap is None:
        raise ValueError(f"no transaction log at {path}")
    return snap


def tx_history(path: str) -> list[dict]:
    """All commit records, oldest first, with file LISTS reduced to counts
    (the audit view; full lists stay in the log files)."""
    out = []
    for v in _list_log(path)[0]:
        rec = _read_json(_commit_file(path, v))
        out.append(
            {
                "version": rec["version"],
                "op": rec["op"],
                "n_added": len(rec.get("add", [])),
                "n_removed": len(rec.get("remove", [])),
                "ts": rec.get("ts"),
                "meta": {
                    k: v2
                    for k, v2 in rec.get("meta", {}).items()
                    if k != "schema"
                },
            }
        )
    return out


def _commit(
    path: str,
    op: str,
    build,
    *,
    validate_remove_live: bool = True,
    max_retries: int = 50,
    stats: dict | None = None,
    txn: tuple[str, int] | None = None,
) -> int | None:
    """Optimistically commit: `build(snapshot_or_None)` returns
    (add, remove, meta) — or None to abandon (nothing to commit); the next
    version's log file is claimed with an exclusive create. Losing a race
    re-reads and retries — `build` runs again against the fresh snapshot.
    With `validate_remove_live`, any remove-set member no longer live
    raises TxConflict (the caller's rewrite was computed from a stale
    snapshot). `stats` is the per-added-file column-stats map recorded in
    the commit; `txn=(app, batch)` is a Delta-style idempotence token —
    if the snapshot has already folded a batch ≥ this one for `app`, the
    commit is a no-op (returns None). The token check runs INSIDE the
    retry loop, so two writers racing the same (app, batch) commit it
    exactly once."""
    os.makedirs(_log_dir(path), exist_ok=True)
    for _ in range(max_retries):
        snap = _replay(path)
        if txn is not None:
            seen = (snap or {}).get("txns", {}).get(txn[0], -1)
            if int(txn[1]) <= seen:
                return None  # this batch already committed — idempotent replay
        built = build(snap)
        if built is None:
            return None
        add, remove, meta = built
        if validate_remove_live and remove:
            live = set(snap["files"]) if snap else set()
            gone = sorted(set(remove) - live)
            if gone:
                raise TxConflict(
                    f"{op}: {len(gone)} file(s) in the remove set are no "
                    f"longer live (first: {gone[0]}) — a concurrent commit "
                    "replaced them; re-run against the new snapshot"
                )
        next_v = (snap["version"] + 1) if snap else 0
        rec = {
            "version": next_v,
            "op": op,
            "add": sorted(add),
            "remove": sorted(remove),
            "meta": meta,
            "ts": time.time(),
        }
        if stats:
            rec["stats"] = {f: stats[f] for f in add if f in stats}
        if txn is not None:
            rec["txn"] = {"app": txn[0], "batch": int(txn[1])}
        try:
            with open(_commit_file(path, next_v), "x") as f:
                json.dump(rec, f)
        except FileExistsError:
            continue  # lost the race — retry on the newer snapshot
        if next_v > 0 and next_v % CHECKPOINT_INTERVAL == 0:
            cp = _replay(path, next_v)
            try:
                with open(_checkpoint_file(path, next_v), "x") as f:
                    json.dump(
                        {
                            "version": next_v,
                            "files": cp["files"],
                            "stats": cp["stats"],
                            "schema": cp["schema"],
                            "horizon": cp["horizon"],
                            "txns": cp["txns"],
                        },
                        f,
                    )
            except FileExistsError:
                pass  # another process already wrote it — identical content
        return next_v
    raise TxConflict(f"{op}: exceeded {max_retries} commit retries")


# --------------------------------------------------------------------------
# data-file plumbing + per-file column statistics
# --------------------------------------------------------------------------


def _file_stats(path: str, rels: list[str]) -> dict[str, dict]:
    """Per-file `{rel: {"rows": n, "cols": {col: [min, max, null_count]}}}`
    read from the parquet FOOTERS (row-group statistics) — metadata-only,
    never a data scan, so recording stats costs O(files), not O(rows),
    exactly as Delta computes its add-file stats during the write.

    Only top-level NUMERIC columns are kept: parquet writers may TRUNCATE
    binary (string) min/max to a prefix, which is unsafe as an upper bound
    for pruning; bool/nested/timestamp are skipped for the same
    conservative reason. A column missing stats in ANY row group (or with
    a non-finite float bound — NaN ordering is writer-dependent) is
    dropped for that file; pruning treats absent stats as "cannot skip".
    """
    import math

    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for rel in rels:
        md = pq.ParquetFile(os.path.join(path, rel)).metadata
        cols: dict[str, list] = {}
        dead: set[str] = set()
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for c_i in range(rg.num_columns):
                cc = rg.column(c_i)
                name = cc.path_in_schema
                if "." in name or name in dead:
                    continue  # nested leaf — min/max not row-level
                st = cc.statistics
                if st is None or not st.has_min_max:
                    dead.add(name)
                    cols.pop(name, None)
                    continue
                mn, mx = st.min, st.max
                ok_type = (
                    isinstance(mn, (int, float))
                    and isinstance(mx, (int, float))
                    and not isinstance(mn, bool)
                    and not isinstance(mx, bool)
                )
                if not ok_type or (
                    isinstance(mn, float) and not math.isfinite(mn)
                ) or (isinstance(mx, float) and not math.isfinite(mx)):
                    dead.add(name)
                    cols.pop(name, None)
                    continue
                nulls = st.null_count if st.has_null_count else None
                prev = cols.get(name)
                if prev is None:
                    cols[name] = [mn, mx, nulls]
                else:
                    prev[0] = min(prev[0], mn)
                    prev[1] = max(prev[1], mx)
                    prev[2] = (
                        None if prev[2] is None or nulls is None
                        else prev[2] + nulls
                    )
        out[rel] = {"rows": md.num_rows, "cols": cols}
    return out


# predicate conjunct ops understood by the pruner AND the reader filter
_OPS = {
    "=": lambda c, v: c == v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


def _can_skip(stats: dict, col: str, op: str, value) -> bool:
    """True iff the file's stats PROVE no row satisfies `col op value`.
    Comparisons never match NULL (SQL), so an all-null file is always
    skippable and null_count never blocks pruning. Absent/foreign-typed
    stats → False (must read the file)."""
    cs = (stats or {}).get("cols", {}).get(col)
    if cs is None:
        rows = (stats or {}).get("rows")
        return False if rows is None else rows == 0
    mn, mx, nulls = cs
    rows = stats.get("rows")
    if nulls is not None and rows is not None and nulls == rows:
        return True  # every value NULL — no comparison can match
    try:
        if op == "=":
            return value < mn or value > mx
        if op == "<":
            return mn >= value
        if op == "<=":
            return mn > value
        if op == ">":
            return mx <= value
        if op == ">=":
            return mx < value
    except TypeError:
        return False  # incomparable literal type — stay safe, read it
    return False


def tx_prune(
    path: str,
    predicate: list[tuple],
    version: int | None = None,
) -> tuple[list[str], list[str]]:
    """Split the snapshot's live files into (kept, skipped) under a
    conjunctive predicate `[(col, op, value), ...]` with ops
    {=, <, <=, >, >=}, using the per-file min/max recorded at commit
    time. Skipping is PROOF-based: a file is skipped only when its stats
    guarantee zero matching rows, so reading only `kept` (then applying
    the same predicate as a row filter) is exact. At 100 TB this is the
    difference between a full-table scan and touching the handful of
    files a sorted/z-ordered layout concentrates the range into."""
    for _, op, _v in predicate:
        if op not in _OPS:
            raise ValueError(f"tx_prune: unsupported op {op!r} (use {sorted(_OPS)})")
    snap = tx_snapshot(path, version)
    kept, skipped = [], []
    for f in snap["files"]:
        st = snap["stats"].get(f, {})
        if any(_can_skip(st, c, op, v) for c, op, v in predicate):
            skipped.append(f)
        else:
            kept.append(f)
    return kept, skipped


def _write_new_files(
    df: DataFrame, path: str, *, collect_stats: bool = True
) -> tuple[list[str], dict[str, dict]]:
    """Write `df` as new immutable part files inside the table root;
    returns (relpaths, per-file stats). Staging is a sibling dir (never
    visible to the log until committed; a crash strands ORPHANS, which
    vacuum's `include_orphans` sweeps — the log never references them)."""
    stage = path.rstrip("/") + "__tx_stage"
    tmp = os.path.join(stage, uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(tmp)
    os.makedirs(path, exist_ok=True)
    rels = []
    for name in sorted(os.listdir(tmp)):
        if not name.endswith(".parquet"):
            continue
        rel = f"part-{uuid.uuid4().hex}.parquet"
        os.rename(os.path.join(tmp, name), os.path.join(path, rel))
        rels.append(rel)
    shutil.rmtree(tmp, ignore_errors=True)
    if os.path.isdir(stage) and not os.listdir(stage):
        os.rmdir(stage)
    stats = _file_stats(path, rels) if collect_stats else {}
    return rels, stats


def _drop_files(path: str, rels: list[str]) -> None:
    for rel in rels:
        try:
            os.remove(os.path.join(path, rel))
        except FileNotFoundError:
            pass


def _abs(path: str, rels: list[str]) -> list[str]:
    return [os.path.join(path, r) for r in rels]


def _rel_from_uri(uri: str, norm_root: str) -> str:
    """input_file_name() returns a URL-ENCODED file URI — unquote and
    strip the scheme before computing the log-relative path."""
    from urllib.parse import unquote, urlparse

    p = uri
    if "://" in p or p.startswith("file:"):
        p = urlparse(p).path
    rel = os.path.relpath(os.path.abspath(unquote(p)), norm_root)
    if rel.startswith("..") or os.path.isabs(rel):
        raise ValueError(
            f"txlog: scanned file {uri!r} resolves outside the table root "
            f"{norm_root!r} — input_file_name() was likely evaluated past "
            "a shuffle/join boundary"
        )
    return rel


# --------------------------------------------------------------------------
# operations
# --------------------------------------------------------------------------


def tx_append(
    df: DataFrame, path: str, *, txn: tuple[str, int] | None = None
) -> int | None:
    """Blind append: write new files, commit. Never conflicts.
    `txn=(app, batch)` makes the append IDEMPOTENT per (app, batch) —
    a replayed batch whose id the log has already folded is a no-op
    (returns None) and its just-written files are dropped as if never
    staged; this is what gives the streaming sink exactly-once."""
    rels, stats = _write_new_files(df, path)
    v = _commit(
        path,
        "append",
        lambda snap: (rels, [], {"schema": df.schema.json()}),
        validate_remove_live=False,
        stats=stats,
        txn=txn,
    )
    if v is None:
        _drop_files(path, rels)  # duplicate delivery — files never referenced
    return v


def tx_overwrite(df: DataFrame, path: str) -> int:
    """Replace the table's contents atomically (the transactional form of
    the reference's non-idempotent re-run — M4). The remove set is
    whatever is live AT COMMIT TIME, so a lost race simply re-removes the
    racer's files on retry: last overwrite wins, no conflict."""
    rels, stats = _write_new_files(df, path)
    return _commit(
        path,
        "overwrite",
        lambda snap: (
            rels,
            snap["files"] if snap else [],
            {"schema": df.schema.json()},
        ),
        validate_remove_live=False,
        stats=stats,
    )


def tx_read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    predicate: list[tuple] | None = None,
) -> DataFrame:
    """Snapshot-isolated read (optionally of a past version). The file
    list is resolved ONCE from the log — never a directory listing, so
    removed-but-unvacuumed files are invisible and concurrent commits
    can't change this scan. mergeSchema keeps late-added columns; an empty
    snapshot still has the logged schema.

    `predicate=[(col, op, value), ...]` (conjunctive, ops {=,<,<=,>,>=})
    both PRUNES files via the committed min/max stats (tx_prune) and
    applies the same conditions as row filters, so the result is exactly
    the filtered table — stats only decide which files are opened. Note:
    a predicate that prunes EVERY file returns the last writer's logged
    schema, which on a schema-evolved table may lack columns only older
    files carry (the unpruned read's mergeSchema union would have them)."""
    snap = tx_snapshot(path, version)
    files = snap["files"]
    if predicate:
        files, _ = tx_prune(path, predicate, version)
    if not files:
        if snap["schema"] is None:
            raise ValueError(f"{path}: empty table with no logged schema")
        out = spark.createDataFrame(
            [], StructType.fromJson(json.loads(snap["schema"]))
        )
    else:
        out = (
            spark.read.option("mergeSchema", True)
            .parquet(*_abs(path, files))
        )
    for col, op, value in predicate or []:
        out = out.filter(_OPS[op](F.col(col), F.lit(value)))
    return out


def tx_compact(
    spark: SparkSession, path: str, *, target_files: int = 1
) -> int | None:
    """Rewrite the live file set down to `target_files` and swap it in ONE
    atomic commit. Readers of older snapshots keep their (still-on-disk)
    files; `TxConflict` if a concurrent commit replaced any input file
    first. Returns the new version, or None if already compact."""
    snap = tx_snapshot(path)
    if len(snap["files"]) <= max(target_files, 1):
        return None
    df = (
        spark.read.option("mergeSchema", True)
        .parquet(*_abs(path, snap["files"]))
        .repartition(target_files)
    )
    rels, stats = _write_new_files(df, path)
    try:
        return _commit(
            path,
            "compact",
            lambda s: (rels, snap["files"], {"n_before": len(snap["files"])}),
            stats=stats,
        )
    except TxConflict:
        _drop_files(path, rels)  # never referenced — clean up, then surface
        raise


def tx_erase_keys(
    spark: SparkSession, path: str, column: str, values: list
) -> dict:
    """Transactional right-to-be-forgotten: rewrite ONLY the live files
    that contain an erase key, commit (add survivors, remove candidates)
    atomically. NULL keys are never erase targets (the list is stripped of
    None — a NULL member would 3VL-poison the keep filter into a full
    wipe, the `erase_keys` lesson). An erasure that empties the table
    keeps its schema via the log. NOTE: erased rows remain readable via
    time travel until `tx_vacuum` passes the erasure version — for GDPR,
    erase THEN vacuum with a horizon past it.

    Returns {"version", "files_rewritten", "rows_removed"}.
    """
    had_values = bool(values)
    values = [v for v in values if v is not None]
    if not values:
        if had_values:
            raise ValueError(
                "tx_erase_keys: erase list contains only None "
                "(NULL is never an erase target)"
            )
        return {"version": None, "files_rewritten": 0, "rows_removed": 0}

    snap = tx_snapshot(path)
    if not snap["files"]:
        return {"version": None, "files_rewritten": 0, "rows_removed": 0}
    # stats pruning first: only files whose [min,max] admits SOME erase key
    # are scanned for hits — with a sorted/z-ordered layout the erasure
    # touches a handful of files instead of the table
    plausible = [
        f
        for f in snap["files"]
        if not all(
            _can_skip(snap["stats"].get(f, {}), column, "=", v) for v in values
        )
    ]
    if not plausible:
        return {"version": None, "files_rewritten": 0, "rows_removed": 0}
    live = (
        spark.read.option("mergeSchema", True)
        .parquet(*_abs(path, plausible))
    )
    # one scan finds the candidate files AND the exact per-file hit counts
    hits = (
        live.filter(F.col(column).isin(values))
        .groupBy(F.input_file_name().alias("f"))
        .count()
        .collect()
    )
    if not hits:
        return {"version": None, "files_rewritten": 0, "rows_removed": 0}
    norm_root = os.path.abspath(path).rstrip("/") + "/"
    candidates = [_rel_from_uri(row["f"], norm_root) for row in hits]
    rows_removed = sum(r["count"] for r in hits)

    cand_df = (
        spark.read.option("mergeSchema", True)
        .parquet(*_abs(path, candidates))
    )
    keep = F.col(column).isNull() | ~F.col(column).isin(values)
    survivors = cand_df.filter(keep)
    rels, stats = _write_new_files(survivors, path)
    try:
        version = _commit(
            path,
            "erase",
            lambda s: (
                rels,
                candidates,
                {"column": column, "n_values": len(values)},
            ),
            stats=stats,
        )
    except TxConflict:
        _drop_files(path, rels)
        raise
    return {
        "version": version,
        "files_rewritten": len(candidates),
        "rows_removed": int(rows_removed),
    }


def tx_vacuum(
    path: str, *, retain_versions: int = 1, include_orphans: bool = False
) -> dict:
    """Physically delete data files no version ≥ the retention horizon can
    reference. `retain_versions=k` keeps the latest k versions readable
    (time travel below the horizon then fails LOUDLY — the horizon is
    itself a commit, so the refusal is transactional and survives
    restarts). `include_orphans` additionally sweeps on-disk part files
    the log never referenced (strandings from crashed writers — only safe
    when no write is in flight, same covenant as Delta's VACUUM retention).

    Returns {"version", "horizon", "deleted": [...]}.
    """
    snap = tx_snapshot(path)
    latest = snap["version"]
    horizon = max(snap["horizon"], latest - max(retain_versions, 1) + 1)

    # file -> version removed (None = still live at latest)
    commits, _ = _list_log(path)
    removed_at: dict[str, int] = {}
    referenced: set[str] = set()
    for v in commits:
        rec = _read_json(_commit_file(path, v))
        for f in rec.get("add", []):
            referenced.add(f)
            removed_at.pop(f, None)  # re-add after remove (shouldn't happen)
        for f in rec.get("remove", []):
            removed_at[f] = rec["version"]
    # live at some version v ≥ horizon  ⇔  removed_at > horizon (or never):
    # a file removed AT commit r is last visible in snapshot r-1.
    deletable = sorted(
        f for f, r in removed_at.items() if r <= horizon
    )
    orphans: list[str] = []
    if include_orphans:
        on_disk = {
            n for n in os.listdir(path)
            if n.endswith(".parquet") and os.path.isfile(os.path.join(path, n))
        }
        orphans = sorted(on_disk - referenced)

    version = _commit(
        path,
        "vacuum",
        lambda s: ([], [], {"horizon": horizon, "n_deleted": len(deletable)}),
        validate_remove_live=False,
    )
    # delete AFTER the horizon commit: a reader that resolves a pre-horizon
    # snapshot from here on fails at resolution, not mid-scan
    _drop_files(path, deletable + orphans)
    return {"version": version, "horizon": horizon, "deleted": deletable + orphans}


def tx_merge(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    **merge_kwargs,
) -> dict:
    """MERGE `source` into the txlog table: same clause semantics as
    `operators.merge.merge_into` (update/delete/insert/
    not-matched-by-source), but executed the way Delta executes MERGE —
    rewrite ONLY the live files that can contain a matched key, in one
    atomic commit:

    1. stats-prune: files whose [min,max] on the (single, numeric) merge
       key excludes the source's key range are untouched without opening;
    2. one semi-join scan of the remaining files finds those with ≥1 hit
       (grouped by input_file_name — the exact candidate set);
    3. merge_into runs over candidates ∪ source; unmatched source rows
       insert into the rewritten output; non-candidate files are reused
       verbatim (they provably hold no matched key);
    4. commit(add=new files, remove=candidates) — TxConflict if a
       concurrent commit replaced a candidate first.

    `when_not_matched_by_source_delete` forces every live file into the
    candidate set (the clause may delete rows anywhere). A merge into an
    absent/empty table degenerates to a guarded first write (insert-only),
    honoring `check_duplicate_source_keys` like merge_into_table.

    Isolation: write-serializable against REPLACING writers — a concurrent
    compact/erase/merge that rewrote a candidate file raises TxConflict.
    A concurrent blind APPEND whose new rows carry matched keys is NOT
    detected (the append's files postdate this merge's snapshot), exactly
    Delta's WriteSerializable level; serialize merges against appends of
    overlapping keys at the application layer if full serializability is
    required.

    Returns {"version", "files_rewritten", "files_skipped"}.
    """
    from .merge import _guard_duplicate_keys, merge_into

    if "__tx_file" in keys or "__tx_file" in source.columns:
        # candidate detection projects input_file_name() under this name;
        # a same-named key would make the semi-join match on file URIs
        raise ValueError("tx_merge: reserved column name in input: ['__tx_file']")
    check_dups = merge_kwargs.get("check_duplicate_source_keys", True)
    if not tx_exists(path) or not tx_snapshot(path)["files"]:
        if not merge_kwargs.get("when_not_matched_insert", True):
            return {"version": None, "files_rewritten": 0, "files_skipped": 0}
        first = _guard_duplicate_keys(source, keys) if check_dups else source
        rels, stats = _write_new_files(first, path)
        v = _commit(
            path,
            "merge",
            lambda s: (rels, [], {"schema": first.schema.json()}),
            validate_remove_live=False,
            stats=stats,
        )
        return {"version": v, "files_rewritten": 0, "files_skipped": 0}

    snap = tx_snapshot(path)
    live_files = snap["files"]

    if merge_kwargs.get("when_not_matched_by_source_delete") is not None:
        candidates = list(live_files)
    else:
        plausible = live_files
        if len(keys) == 1:
            b = source.agg(
                F.min(keys[0]).alias("mn"), F.max(keys[0]).alias("mx")
            ).first()
            if b["mn"] is None:
                plausible = []  # empty source (or all-NULL keys): no matches
            else:
                plausible = [
                    f
                    for f in live_files
                    if not (
                        _can_skip(snap["stats"].get(f, {}), keys[0], ">=", b["mn"])
                        or _can_skip(snap["stats"].get(f, {}), keys[0], "<=", b["mx"])
                    )
                ]
        candidates = []
        if plausible:
            # input_file_name() must be captured AT SCAN TIME: evaluated
            # after the join boundary it returns '' (the row no longer
            # belongs to a file scan) and the relpath would escape the root
            hit_rows = (
                spark.read.option("mergeSchema", True)
                .parquet(*_abs(path, plausible))
                .withColumn("__tx_file", F.input_file_name())
                .join(source.select(*keys).distinct(), keys, "leftsemi")
                .groupBy("__tx_file")
                .count()
                .collect()
            )
            norm_root = os.path.abspath(path).rstrip("/") + "/"
            candidates = sorted(
                _rel_from_uri(row["__tx_file"], norm_root) for row in hit_rows
            )

    if candidates:
        target = spark.read.option("mergeSchema", True).parquet(
            *_abs(path, candidates)
        )
    else:
        if snap["schema"] is None:
            raise ValueError(f"{path}: table has no logged schema")
        target = spark.createDataFrame(
            [], StructType.fromJson(json.loads(snap["schema"]))
        )
    merged = merge_into(target, source, keys, **merge_kwargs)
    rels, stats = _write_new_files(merged, path)
    try:
        v = _commit(
            path,
            "merge",
            lambda s: (
                rels,
                candidates,
                {"keys": list(keys), "schema": merged.schema.json()},
            ),
            stats=stats,
        )
    except TxConflict:
        _drop_files(path, rels)
        raise
    return {
        "version": v,
        "files_rewritten": len(candidates),
        "files_skipped": len(live_files) - len(candidates),
    }


def tx_stream_sink(path: str, app: str):
    """Exactly-once Structured Streaming sink: use as
    ``writeStream.foreachBatch(tx_stream_sink(table, "my-query"))``.
    Each micro-batch appends under the idempotence token `(app,
    batch_id)`; a batch REPLAYED after a sink-side crash (foreachBatch is
    at-least-once) finds its id already folded into the snapshot's txn
    map and commits nothing — the Delta `txn`-action design. Tokens are
    high-watermark per app (batch ids are monotonic within a streaming
    query), survive restarts via the log, and fold into checkpoints so
    the lookup stays O(tail)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tx_append(batch_df, path, txn=(app, int(batch_id)))

    return _sink
