"""Table maintenance: small-file compaction.

Daily partitioned appends (the reference's silver pattern) accumulate
small files — each extraction lands 8-city micro-files, and at 100 TB a
few-KB-per-file layout murders scan throughput (one task + one S3 GET per
file; parquet footers dominate I/O). Compaction rewrites each partition to
a target file count while preserving the partition layout, so downstream
pruning is unaffected.

Idempotent and crash-safe per partition: all staging lives in a sibling
directory OUTSIDE the table root (`<table>__compact_stage/`), so Spark's
partition discovery never sees half-swapped state, and every run starts by
recovering whatever a previous crash left behind — a missing partition is
restored from its staged original, stale staging output is deleted.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

_OLD_SUFFIX = "__old"


def list_partitions(path: str) -> list[str]:
    """Immediate hive-style partition directories (`col=value`)."""
    return sorted(
        d for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    )


def _stage_root(path: str) -> str:
    return path.rstrip("/") + "__compact_stage"


def recover_compaction(path: str) -> list[str]:
    """Repair interrupted `compact_partitions` runs; returns actions taken.

    The swap sequence is: write tmp → move partition to `<stage>/<part>__old`
    → move tmp into place → delete the old copy. A crash can therefore leave
    (a) a stale tmp with the original intact — delete the tmp; (b) the
    partition moved out but the tmp not yet moved in — restore the original;
    (c) the new partition in place with the old copy undeleted — delete the
    old copy. All staging is outside the table root, so none of these states
    is ever visible to partition discovery.
    """
    stage = _stage_root(path)
    if not os.path.isdir(stage):
        return []
    actions: list[str] = []
    entries = sorted(os.listdir(stage))
    # pass 1: settle saved originals (restore if the partition is missing)
    for entry in entries:
        if not entry.endswith(_OLD_SUFFIX):
            continue
        part = entry[: -len(_OLD_SUFFIX)]
        part_dir = os.path.join(path, part)
        saved = os.path.join(stage, entry)
        if os.path.isdir(part_dir):
            shutil.rmtree(saved)
            actions.append(f"dropped stale original for {part}")
        else:
            os.rename(saved, part_dir)
            actions.append(f"restored {part} from staged original")
    # pass 2: stale tmp outputs are always safe to drop (the partition is
    # intact either originally or via the pass-1 restore)
    for entry in sorted(os.listdir(stage)):
        if entry.endswith(_OLD_SUFFIX):
            continue
        shutil.rmtree(os.path.join(stage, entry))
        actions.append(f"dropped incomplete compaction output for {entry}")
    if not os.listdir(stage):
        os.rmdir(stage)
    return actions


def compact_partitions(
    spark: SparkSession,
    path: str,
    *,
    target_files: int = 1,
    min_files: int = 2,
) -> dict[str, tuple[int, int]]:
    """Rewrite every partition having more than `min_files` data files down
    to `target_files`. Returns {partition: (files_before, files_after)}.

    Runs partition-at-a-time so peak temp space is one partition. Crash-safe:
    recovers prior interrupted runs on entry, stages outside the table root,
    and keeps the original partition until the replacement is in place.
    """
    recover_compaction(path)
    stage = _stage_root(path)
    results: dict[str, tuple[int, int]] = {}
    for part in list_partitions(path):
        part_dir = os.path.join(path, part)
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        if len(files) < max(min_files, target_files + 1):
            continue
        os.makedirs(stage, exist_ok=True)
        tmp_dir = os.path.join(stage, part)
        (
            spark.read.parquet(part_dir)
            .repartition(target_files)
            .write.mode("overwrite")
            .parquet(tmp_dir)
        )
        old_dir = os.path.join(stage, part + _OLD_SUFFIX)
        os.rename(part_dir, old_dir)
        os.rename(tmp_dir, part_dir)
        shutil.rmtree(old_dir)
        after = len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])
        results[part] = (len(files), after)
    if os.path.isdir(stage) and not os.listdir(stage):
        os.rmdir(stage)
    return results


def write_sorted(
    df,
    path: str,
    sort_cols: list[str],
    *,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Cluster a table on `sort_cols` for data skipping: range-partition the
    rows across `n_files` output files, then sort within each file.

    Why this layout wins at 100 TB: parquet stores min/max statistics per
    row group, and Spark's scan skips row groups (and whole files, via
    footer stats) whose [min, max] cannot satisfy a pushed predicate. After
    an unsorted write every file spans ~the full key range, so NOTHING
    skips; after `repartitionByRange + sortWithinPartitions` the per-file
    key ranges are narrow and pairwise disjoint, so a point or range
    predicate touches the few files that can match (verified on real
    footers by tests/test_maintenance.py).

    The range partitioner samples the sort key to build balanced bounds —
    one extra pass at write time, bought back on every subsequent scan.
    This is the vanilla-Spark spelling of DB-style CLUSTER BY / Delta
    OPTIMIZE ZORDER's single-column case; for multi-column interleaving use
    `write_zorder` below.
    """
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(df, cols: list[str], *, bits: int = 8):
    """Morton (Z-order) interleave of `cols`, each first bucketed into
    2^bits equal-width bins between its global min and max.

    Returns (df_with_bounds, key_column): the per-column min/max come from
    ONE aggregate whose scalar results parameterize `width_bucket` — the
    same one-extra-pass cost `repartitionByRange`'s sampler already pays.
    Bit interleaving is a pure integer expression (JVM codegen, no UDF):
    z = Σ_j Σ_b bit_b(bucket_j) << (b·|cols| + j), so nearby values in ANY
    of the columns land in nearby z — the property that makes per-file
    min/max stats narrow in every dimension at once. Nulls bucket to 0.

    Column types: numeric columns bucket directly; date/timestamp columns
    are converted to epoch numbers (days / seconds) before bucketing; any
    other type raises a descriptive TypeError up front rather than a
    confusing float() failure mid-plan.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import DateType, NumericType, TimestampType

    num_expr: dict[str, str] = {}
    for c in cols:
        dtype = df.schema[c].dataType
        if isinstance(dtype, NumericType):
            num_expr[c] = f"CAST({c} AS DOUBLE)"
        elif isinstance(dtype, TimestampType):
            num_expr[c] = f"CAST(unix_timestamp({c}) AS DOUBLE)"
        elif isinstance(dtype, DateType):
            num_expr[c] = f"CAST(datediff({c}, DATE'1970-01-01') AS DOUBLE)"
        else:
            raise TypeError(
                f"zorder_key: column {c!r} has unsupported type "
                f"{dtype.simpleString()} — z-order clustering needs a numeric "
                "or temporal axis (strings have no equal-width binning)"
            )

    # bounds are computed on the SAME numeric projection the bucketing
    # expression uses, so temporal columns never round-trip through Python
    # datetime (whose local-timezone interpretation could shift them)
    aggs = []
    for c in cols:
        e = F.expr(num_expr[c])
        aggs += [F.min(e).alias(f"__min_{c}"), F.max(e).alias(f"__max_{c}")]
    bounds = df.agg(*aggs).first()  # scalar-only driver fetch (tiny)
    n_bins = 1 << bits
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo, hi = bounds[f"__min_{c}"], bounds[f"__max_{c}"]
        if lo is None or hi is None or hi == lo:
            continue  # constant/all-null column contributes no bits
        bucket = (
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.expr(
                        f"CAST(width_bucket({num_expr[c]}, {lo}D, "
                        f"{hi}D, {n_bins}) AS INT) - 1"
                    ),
                ),
            )
        )
        bucket = F.coalesce(bucket, F.lit(0))
        for b in range(bits):
            z = z + (F.shiftright(bucket, b).bitwiseAND(F.lit(1)).cast("long") * F.lit(1 << (b * len(cols) + j)).cast("long"))
    return df.withColumn("__z", z), "__z"


def write_zorder(
    df,
    path: str,
    cols: list[str],
    *,
    n_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Multi-column clustered layout via a Z-order space-filling curve
    (Morton 1966; the technique behind Delta/Iceberg OPTIMIZE ZORDER).

    `write_sorted` makes ONE column's per-file ranges disjoint but leaves
    every other column spanning its full range in every file — a predicate
    on the second column skips nothing. Z-ordering interleaves the bucket
    bits of all `cols`, so each file covers a small hyper-rectangle of the
    key space and footer-stats skipping works for predicates on ANY of the
    clustered columns (verified on real footers by tests/test_maintenance).

    Cost at 100 TB: one scalar min/max aggregate + the range-partition
    sampling pass + the write — same as `write_sorted` plus one cheap agg;
    all bit arithmetic is codegen'd, nothing leaves the JVM.
    """
    zdf, key = zorder_key(df, cols, bits=bits)
    (
        zdf.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode(mode)
        .parquet(path)
    )


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of `column` per parquet data file, straight from the
    footers — the same statistics a scan's skipping logic consults."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    st = col.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out


# ---------------------------------------------------------------------------
# Surgical key erasure — right-to-be-forgotten over a parquet lake
# ---------------------------------------------------------------------------

_ERASE_MANIFEST = "_erase_pending.json"


def _erase_stage_root(table_path: str) -> str:
    """Erasure's OWN staging dir — deliberately distinct from the
    compactor's `_stage_root`: each feature's crash recovery deletes its
    whole stage, so sharing one root would let either recovery destroy the
    other's staged-but-unrecovered state (permanent data loss)."""
    return table_path.rstrip("/") + "__erase_stage"


def recover_erase(table_path: str) -> bool:
    """Finish an interrupted `erase_keys`: if the manifest exists, the
    staged survivor files are authoritative — complete the moves, delete
    the listed originals (idempotent), drop the manifest. Returns True if
    recovery ran."""
    import json

    mpath = os.path.join(table_path, _ERASE_MANIFEST)
    if not os.path.exists(mpath):
        return False
    with open(mpath) as f:
        manifest = json.load(f)
    for src, dst in manifest["moves"]:
        if os.path.exists(src) and not os.path.exists(dst):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
    for old in manifest["deletes"]:
        if os.path.exists(old):
            os.remove(old)
    os.remove(mpath)
    stage = _erase_stage_root(table_path)
    if os.path.isdir(stage):
        shutil.rmtree(stage, ignore_errors=True)
    return True


def erase_keys(
    spark: SparkSession,
    table_path: str,
    column: str,
    values: list,
    *,
    update_index: bool = True,
) -> dict[str, int]:
    """Remove every row whose `column` is in `values`, rewriting ONLY the
    files that can contain them — the right-to-be-forgotten sweep a lake
    without a table format needs.

    File targeting: with a per-file Bloom index on `column`
    (operators/file_index.py) the candidate set is the union of each
    value's pruned files — at 100 TB an erasure batch touches
    ~|values|·(1 + fpr·|files|) files instead of the whole table. Without
    an index every file is a candidate (correct, just a full rewrite).

    Crash safety (manifest-staged like `compact_partitions`, but in its
    OWN stage root — see `_erase_stage_root`): survivors are written
    outside the table, a manifest records the pending (moves, deletes),
    then files move in and originals delete; `recover_erase` (called on
    entry) completes an interrupted run. Local-filesystem staging like
    the compactor — a cluster deployment swaps the os calls for the
    Hadoop FS client, protocol unchanged.

    NULL-keyed rows are always KEPT (a NULL key is never "in" the erase
    set; the filter is explicitly null-safe so 3VL cannot silently drop
    them). Schema-evolved tables are read with mergeSchema so survivors
    keep late-added columns; partition columns are detected from the
    `key=value` directory segments, never guessed from footers.

    An erasure that removes EVERY row leaves an empty table directory —
    correct for a schema-on-read lake (the schema lived only in the data
    files), but a bare `spark.read.parquet` on it then fails schema
    inference; read an emptied table with an explicit schema, or treat
    it as dropped. (A table format's metadata layer is what would
    preserve the schema past the last row.)

    Returns {"files_rewritten": n, "rows_removed": n}.
    """
    from pyspark.sql import functions as F

    from .file_index import (
        _norm_file,
        bloom_index_path,
        prune_files_any,
        update_bloom_index,
    )

    recover_erase(table_path)

    # A None inside the erase list poisons the survivor filter: SQL IN
    # with a NULL member makes `~isin(values)` NULL for every non-matching
    # row, and filter(NULL) drops them all — a full-table wipe. NULL is
    # never an erase target (NULL keys are always kept), so strip it. An
    # all-None batch is a caller bug (they meant to erase SOMETHING);
    # a literally-empty batch is a legal no-op request.
    had_values = bool(values)
    values = [v for v in values if v is not None]
    if not values:
        if had_values:
            raise ValueError(
                "erase_keys: erase list contains only None "
                "(NULL is never an erase target)"
            )
        return {"files_rewritten": 0, "rows_removed": 0}

    has_index = os.path.isdir(bloom_index_path(table_path, column))
    if has_index:
        # ONE index scan covers the whole erase batch
        candidates = prune_files_any(spark, table_path, column, values)
    else:
        from .file_index import _list_data_files

        candidates = _list_data_files(spark, table_path)
    if not candidates:
        return {"files_rewritten": 0, "rows_removed": 0}

    # mergeSchema: candidate files may carry EVOLVED schemas; a single
    # arbitrary footer would silently drop late-added columns from the
    # rewrite
    df = (
        spark.read.option("basePath", table_path)
        .option("mergeSchema", True)
        .parquet(*candidates)
    )
    # null-safe keep: NULL keys are not erase targets, and a bare
    # ~isin(values) is NULL for them — filter would DROP those rows
    keep = F.col(column).isNull() | ~F.col(column).isin(values)
    # observe() folds both row counts into the survivor write itself —
    # ONE scan of the candidate files total, instead of two extra eager
    # counts before the rewrite. CollectMetrics is a pushdown barrier, so
    # the keep-filter cannot slide below the observation and skew
    # n_before.
    from pyspark.sql import Observation

    obs = Observation("erase_metrics")
    survivors = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_before"),
        F.sum(F.when(keep, F.lit(0)).otherwise(F.lit(1))).alias("n_removed"),
    ).filter(keep)

    # partition columns come from the key=value DIRECTORY segments of the
    # candidate paths (footer-schema diffs would misclassify evolved data
    # columns as partition columns)
    norm_root = _norm_file(table_path).rstrip("/") + "/"
    rel = _norm_file(candidates[0])
    rel = rel[len(norm_root):] if rel.startswith(norm_root) else rel
    part_cols = [
        seg.split("=", 1)[0] for seg in rel.split("/")[:-1] if "=" in seg
    ]

    stage = _erase_stage_root(table_path)
    tmp_dir = os.path.join(stage, "erase_out")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(stage, exist_ok=True)
    writer = survivors.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(tmp_dir)

    # manifest: (stage→table moves preserving relative dirs) + deletes.
    # An all-rows-erased batch legally yields zero moves — the manifest
    # then only deletes the emptied originals.
    import json

    moves = []
    for root, _dirs, names in os.walk(tmp_dir):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(root, name)
            rel_p = os.path.relpath(src, tmp_dir)
            moves.append((src, os.path.join(table_path, rel_p)))
    deletes = [_norm_file(f) for f in candidates]
    mpath = os.path.join(table_path, _ERASE_MANIFEST)
    with open(mpath, "w") as f:
        json.dump({"moves": moves, "deletes": deletes}, f)
    recover_erase(table_path)  # executes the manifest (moves + deletes)

    if update_index and has_index:
        update_bloom_index(spark, table_path, column)
    metrics = obs.get  # available: the survivor write above completed
    return {
        "files_rewritten": len(candidates),
        "rows_removed": int(metrics["n_removed"] or 0),
    }


def vacuum_orphans(table_path: str) -> list[str]:
    """Remove write-attempt debris a failed/killed Spark job leaves under
    a parquet table: `_temporary` trees, `.spark-staging-*` dirs, and
    zero-byte `.parquet` files (a crashed task's empty part file breaks
    some readers). Never touches live data files, `_SUCCESS`, or index
    sidecars (`_bloom_idx_*` contain data). Returns the removed paths.

    Without a table format there is no manifest to diff against, so only
    KNOWN-debris patterns are safe to delete — an unreferenced but
    well-formed data file cannot be distinguished from a live one.
    """
    removed: list[str] = []
    for root, dirs, names in os.walk(table_path):
        for d in list(dirs):
            if d == "_temporary" or d.startswith(".spark-staging"):
                full = os.path.join(root, d)
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
                dirs.remove(d)
        dirs[:] = [d for d in dirs if not d.startswith("_bloom_idx_")]
        for name in names:
            if name.endswith(".parquet") and not name.startswith(("_", ".")):
                full = os.path.join(root, name)
                if os.path.getsize(full) == 0:
                    os.remove(full)
                    removed.append(full)
    return removed
