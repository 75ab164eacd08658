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
    {"version", "files": sorted relpaths, "schema": json-or-None,
    "horizon": int} or None if the log is empty.

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
    live: dict[str, int] = {}  # relpath -> version added
    schema_json = None
    usable = [c for c in checkpoints if c <= target]
    if usable:
        cp = _read_json(_checkpoint_file(path, usable[-1]))
        base_v = cp["version"]
        live = {f: base_v for f in cp["files"]}
        schema_json = cp.get("schema")
    for v in commits:
        if v <= base_v or v > target:
            continue
        rec = _read_json(_commit_file(path, v))
        for f in rec.get("remove", []):
            live.pop(f, None)
        for f in rec.get("add", []):
            live[f] = v
        if rec.get("meta", {}).get("schema"):
            schema_json = rec["meta"]["schema"]
    return {
        "version": target,
        "files": sorted(live),
        "schema": schema_json,
        "horizon": horizon,
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
) -> int:
    """Optimistically commit: `build(snapshot_or_None)` returns
    (add, remove, meta); the next version's log file is claimed with an
    exclusive create. Losing a race re-reads and retries — `build` runs
    again against the fresh snapshot. With `validate_remove_live`, any
    remove-set member no longer live raises TxConflict (the caller's
    rewrite was computed from a stale snapshot)."""
    os.makedirs(_log_dir(path), exist_ok=True)
    for _ in range(max_retries):
        snap = _replay(path)
        add, remove, meta = build(snap)
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
                            "schema": cp["schema"],
                            "horizon": cp["horizon"],
                        },
                        f,
                    )
            except FileExistsError:
                pass  # another process already wrote it — identical content
        return next_v
    raise TxConflict(f"{op}: exceeded {max_retries} commit retries")


# --------------------------------------------------------------------------
# data-file plumbing
# --------------------------------------------------------------------------


def _write_new_files(df: DataFrame, path: str) -> list[str]:
    """Write `df` as new immutable part files inside the table root;
    returns their relpaths. Staging is a sibling dir (never visible to the
    log until committed; a crash strands ORPHANS, which vacuum's
    `include_orphans` sweeps — the log never references them)."""
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
    return rels


def _drop_files(path: str, rels: list[str]) -> None:
    for rel in rels:
        try:
            os.remove(os.path.join(path, rel))
        except FileNotFoundError:
            pass


def _abs(path: str, rels: list[str]) -> list[str]:
    return [os.path.join(path, r) for r in rels]


# --------------------------------------------------------------------------
# operations
# --------------------------------------------------------------------------


def tx_append(df: DataFrame, path: str) -> int:
    """Blind append: write new files, commit. Never conflicts."""
    rels = _write_new_files(df, path)
    return _commit(
        path,
        "append",
        lambda snap: (rels, [], {"schema": df.schema.json()}),
        validate_remove_live=False,
    )


def tx_overwrite(df: DataFrame, path: str) -> int:
    """Replace the table's contents atomically (the transactional form of
    the reference's non-idempotent re-run — M4). The remove set is
    whatever is live AT COMMIT TIME, so a lost race simply re-removes the
    racer's files on retry: last overwrite wins, no conflict."""
    rels = _write_new_files(df, path)
    return _commit(
        path,
        "overwrite",
        lambda snap: (
            rels,
            snap["files"] if snap else [],
            {"schema": df.schema.json()},
        ),
        validate_remove_live=False,
    )


def tx_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot-isolated read (optionally of a past version). The file
    list is resolved ONCE from the log — never a directory listing, so
    removed-but-unvacuumed files are invisible and concurrent commits
    can't change this scan. mergeSchema keeps late-added columns; an empty
    snapshot still has the logged schema."""
    snap = tx_snapshot(path, version)
    if not snap["files"]:
        if snap["schema"] is None:
            raise ValueError(f"{path}: empty table with no logged schema")
        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(snap["schema"]))
        )
    return (
        spark.read.option("mergeSchema", True)
        .parquet(*_abs(path, snap["files"]))
    )


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
    rels = _write_new_files(df, path)
    try:
        return _commit(
            path,
            "compact",
            lambda s: (rels, snap["files"], {"n_before": len(snap["files"])}),
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
    live = (
        spark.read.option("mergeSchema", True)
        .parquet(*_abs(path, snap["files"]))
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
    candidates = []
    for row in hits:
        p = row["f"]
        if p.startswith("file:"):
            p = p[len("file:"):]
        p = os.path.abspath(p)
        candidates.append(os.path.relpath(p, norm_root))
    rows_removed = sum(r["count"] for r in hits)

    cand_df = (
        spark.read.option("mergeSchema", True)
        .parquet(*_abs(path, candidates))
    )
    keep = F.col(column).isNull() | ~F.col(column).isin(values)
    survivors = cand_df.filter(keep)
    rels = _write_new_files(survivors, path)
    try:
        version = _commit(
            path,
            "erase",
            lambda s: (
                rels,
                candidates,
                {"column": column, "n_values": len(values)},
            ),
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
