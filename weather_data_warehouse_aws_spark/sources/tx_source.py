"""`txtable` — a Spark DataSource that streams a transaction-log table's
CHANGE FEED (the Delta-streaming-source analogue for `operators/txlog.py`).

    register_tx_source(spark)
    df = (spark.readStream.format("txtable")
          .option("path", "/lake/gold/fact").load())

Offsets are COMMIT VERSIONS: the checkpoint stores the last delivered
version, each micro-batch covers the commit range (start, end], and a
restart resumes at exactly the next undelivered commit — the immutable
data files ARE the replay buffer, so redelivery is deterministic with no
extra storage (same contract as `tx_changes`, which this source serves
incrementally). Rows carry the table's columns plus `_change_type`
('insert' | 'delete') and `_commit_version`; applying each version's
deletes-then-inserts folds the stream into the live table (downstream IVM
/ index-refresh consumers), and an append-only table yields a pure insert
stream.

Scale shape: `partitions()` emits ONE InputPartition PER (commit, file),
so a micro-batch fans out across executors exactly as wide as the commit
wrote files; each partition reads its one immutable parquet file with
pyarrow (no driver-side data movement). Offsets/planning touch only the
KB-scale log. Each file is yielded as pyarrow RecordBatches cast to the
declared schema — zero per-row Python-object materialization (the
Python DataSource API ships RecordBatches straight into the Arrow
stream). A file whose physical types can't be cast to the declared
schema (exotic evolution) falls back, per file and deterministically,
to Python tuples aligned to the schema (None-filled for columns a
pre-evolution file lacks).

Deletion vectors are row-exact in the feed: a `tx_delete_where` commit
streams ONLY the newly-deleted rows (one partition per covered file,
positions resolved executor-side from the KB-scale DV parquets), file
reads exclude the DV'd positions of the relevant version's state, and a
restore that reverts a DV streams the resurrected rows as inserts.

Retention covenant (as with any CDC on the log): the stream must not lag
behind `tx_vacuum`'s horizon — a vacuumed commit's removed files are
gone, and planning raises rather than silently skipping. Start a new
stream on a vacuumed table with `starting_version` ≥ the horizon (or
`"latest"` to stream only future commits).
"""

from __future__ import annotations

import functools
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_CDC_COLS = ("_change_type", "_commit_version")
_ARROW_CHUNK_ROWS = 1 << 16


def _table_schema(path: str) -> StructType:
    from ..operators.txlog import tx_snapshot

    snap = tx_snapshot(path)
    if snap["schema"] is None:
        raise ValueError(f"{path}: transaction log carries no schema yet")
    return StructType.fromJson(json.loads(snap["schema"]))


def _partition_fill(rel: str, schema: StructType) -> dict:
    """Python values for the hive partition columns encoded in `rel`'s
    path (absent from the data file's footer), typed by the logged
    schema — what the per-file reader splices into rows."""
    import datetime as dt

    from ..operators.txlog import _partition_values

    out = {}
    by_name = {f.name: f.dataType.typeName() for f in schema.fields}
    for col, raw in _partition_values(rel).items():
        t = by_name.get(col)
        if raw is None or t is None:
            out[col] = None
        elif t in ("integer", "long", "short", "byte"):
            out[col] = int(raw)
        elif t in ("double", "float"):
            out[col] = float(raw)
        elif t == "date":
            out[col] = dt.date.fromisoformat(raw)
        elif t == "boolean":
            out[col] = raw == "true"
        else:
            out[col] = raw  # string (exact: no inference roundtrip)
    return out


def _dv_pos_set(path: str, rel: str, dv_rels: list[str]) -> set[int]:
    """Row positions the given deletion-vector relations mark deleted in
    `rel`. DVs are KB-scale (file, pos) parquets — read executor-side."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pos: set[int] = set()
    for d in dv_rels:
        t = pq.read_table(os.path.join(path, d))
        mask = pc.equal(t.column("file"), rel)
        pos.update(t.filter(mask).column("pos").to_pylist())
    return pos


def _keep_positions(path: str, rel: str, num_rows: int,
                    exclude_dv: list[str] | None,
                    only_dv: tuple[list[str], list[str]] | None) -> set[int] | None:
    """Physical row positions of `rel` to emit (None = all). `exclude_dv`
    drops the positions those DV relations mark deleted (the file's
    LOGICAL rows at the relevant version); `only_dv=(now_rels, prev_rels)`
    keeps ONLY positions in now − prev (the rows a DV commit newly
    deleted)."""
    if only_dv is not None:
        now_rels, prev_rels = only_dv
        return _dv_pos_set(path, rel, now_rels) - _dv_pos_set(path, rel, prev_rels)
    if exclude_dv:
        dead = _dv_pos_set(path, rel, exclude_dv)
        return set(range(num_rows)) - dead if dead else None
    return None


@functools.lru_cache(maxsize=8)
def _declared_arrow_schema(schema_json: str):
    """Arrow schema of the declared source output (table schema + CDC
    tail), exactly as the worker's own tuple conversion would build it —
    the contract a yielded RecordBatch must match. Cached per schema
    (executor-side, one entry per table generation)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    st = StructType(list(StructType.fromJson(json.loads(schema_json)).fields))
    st.add(_CDC_COLS[0], "string").add(_CDC_COLS[1], "long")
    return to_arrow_schema(st)


def _read_file_batches(path: str, rel: str, colnames: list[str],
                       schema_json: str, tail: tuple,
                       fill: dict | None = None,
                       exclude_dv: list[str] | None = None,
                       only_dv: tuple[list[str], list[str]] | None = None) -> list:
    """Arrow fast path: one immutable data file → RecordBatches cast to
    the declared schema — no per-row Python objects anywhere (columns stay
    Arrow buffers end-to-end; constants for the CDC tail, hive partition
    values, and pre-evolution nulls are built as whole arrays). EAGER: all
    casts happen before anything is yielded, so a file whose physical
    types can't be cast raises here and the caller falls back to the
    tuple path without a partial emit. Runs on the EXECUTOR."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fill = fill or {}
    table = pq.read_table(os.path.join(path, rel))
    keep = _keep_positions(path, rel, table.num_rows, exclude_dv, only_dv)
    if keep is not None:
        table = table.take(pa.array(sorted(keep), type=pa.int64()))
    expected = _declared_arrow_schema(schema_json)
    n = table.num_rows
    present = set(table.column_names)
    kind, version = tail
    arrays = []
    for name in colnames:
        typ = expected.field(name).type
        if name in present:
            arrays.append(table.column(name).combine_chunks().cast(typ))
        elif fill.get(name) is not None:
            arrays.append(pa.array([fill[name]] * n).cast(typ))
        else:
            arrays.append(pa.nulls(n, typ))
    arrays.append(pa.array([kind] * n, type=pa.string()))
    arrays.append(pa.array([version] * n, type=pa.int64()))
    out = pa.table(arrays, schema=expected)
    return out.to_batches(max_chunksize=_ARROW_CHUNK_ROWS)


def _read_file_rows(path: str, rel: str, colnames: list[str], tail: tuple,
                    fill: dict | None = None,
                    exclude_dv: list[str] | None = None,
                    only_dv: tuple[list[str], list[str]] | None = None):
    """Tuple fallback for files the Arrow cast can't express: one
    immutable data file → tuples aligned to `colnames` + `tail` (hive
    partition values spliced from `fill`; None for columns the file
    predates). Runs on the EXECUTOR."""
    import pyarrow.parquet as pq

    fill = fill or {}
    table = pq.read_table(os.path.join(path, rel))
    present = set(table.column_names)
    cols = [
        table.column(c).to_pylist() if c in present
        else [fill.get(c)] * table.num_rows
        for c in colnames
    ]
    keep = _keep_positions(path, rel, table.num_rows, exclude_dv, only_dv)
    for pos, row in enumerate(zip(*cols)):
        if keep is None or pos in keep:
            yield row + tail


def _emit_file(path: str, rel: str, colnames: list[str], schema_json: str,
               tail: tuple, fill: dict | None,
               exclude_dv: list[str] | None,
               only_dv: tuple[list[str], list[str]] | None = None):
    """RecordBatches when the file's types cast cleanly to the declared
    schema (the stable-schema norm), tuples otherwise — decided PER FILE
    and deterministically, never mid-stream (the batch path is eager)."""
    import pyarrow as pa

    try:
        batches = _read_file_batches(
            path, rel, colnames, schema_json, tail, fill, exclude_dv, only_dv
        )
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        yield from _read_file_rows(
            path, rel, colnames, tail, fill, exclude_dv, only_dv
        )
        return
    yield from batches


class TxTableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("txtable: option 'path' is required")
        self.starting = options.get("starting_version", "-1")

    def _snapshot(self):
        from ..operators.txlog import tx_exists, tx_snapshot

        return tx_snapshot(self.path) if tx_exists(self.path) else None

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            snap = self._snapshot()
            return {"version": snap["version"] if snap else -1}
        return {"version": int(self.starting)}

    def latestOffset(self) -> dict:
        snap = self._snapshot()
        return {"version": snap["version"] if snap else -1}

    def partitions(self, start: dict, end: dict):
        from ..operators.txlog import _load_rec, _usable_log, tx_snapshot

        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return [InputPartition(None)]
        snap = tx_snapshot(self.path)
        # a commit v > horizon can reference no deleted file (deletion
        # requires removal at r <= horizon < v) — so the range is safe
        # iff it starts at or after the horizon
        if snap["horizon"] > 0 and lo < snap["horizon"]:
            raise ValueError(
                f"txtable: stream offset {lo} predates the vacuum horizon "
                f"({snap['horizon']}) — removed files are gone; restart with "
                "starting_version >= the horizon (or 'latest')"
            )
        from ..operators.txlog import _replay

        schema = _table_schema(self.path)
        sjson = schema.json()
        colnames = [f.name for f in schema.fields]
        out = []
        prev: dict | None = None
        prev_for: int | None = None
        for v in _usable_log(self.path)[0]:
            if v <= lo or v > hi:
                continue
            rec = _load_rec(self.path, v)
            if prev_for != v - 1:
                prev = _replay(self.path, v - 1) if v > 0 else None
            cur = _replay(self.path, v)
            prev_for = v
            p_dvs = (prev or {}).get("dvs", {})
            c_dvs = cur["dvs"]
            # file-level: removed files emit their v-1 LOGICAL rows as
            # deletes, added files their v rows as inserts
            for kind, rels, dvs in (
                ("delete", rec.get("remove", []), p_dvs),
                ("insert", rec.get("add", []), c_dvs),
            ):
                for rel in rels:
                    out.append(InputPartition((
                        self.path, rel, colnames, sjson, kind, v,
                        _partition_fill(rel, schema),
                        dvs.get(rel, []), None,
                    )))
            # row-level: DV deltas on files live across the commit
            common = set((prev or {}).get("files", [])) & set(cur["files"])
            for rel in sorted(common):
                if p_dvs.get(rel, []) == c_dvs.get(rel, []):
                    continue
                fill = _partition_fill(rel, schema)
                out.append(InputPartition((  # newly deleted: cur − prev
                    self.path, rel, colnames, sjson, "delete", v, fill,
                    None, (c_dvs.get(rel, []), p_dvs.get(rel, [])),
                )))
                if p_dvs.get(rel):
                    out.append(InputPartition((  # restore-resurrected rows
                        self.path, rel, colnames, sjson, "insert", v, fill,
                        None, (p_dvs.get(rel, []), c_dvs.get(rel, [])),
                    )))
            prev = cur
        return out or [InputPartition(None)]

    def read(self, partition: InputPartition):
        if partition is None or partition.value is None:
            return
        (path, rel, colnames, sjson, kind, v,
         fill, exclude_dv, only_dv) = partition.value
        yield from _emit_file(
            path, rel, colnames, sjson, (kind, v), fill, exclude_dv, only_dv
        )

    def commit(self, end: dict) -> None:
        pass  # delivered versions need no source-side bookkeeping


class TxTableBatchReader(DataSourceReader):
    """Batch read of a snapshot, presented as an insert-feed (every row
    `_change_type='insert'`, `_commit_version` = the snapshot version) so
    batch and stream share one schema: one partition per live file.
    Exists for format symmetry — `operators/txlog.tx_read` is the
    preferred batch path (native JVM parquet scan, filter pushdown, stats
    pruning); this reader serves the places a `format("txtable")`
    spelling is required."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("txtable: option 'path' is required")
        self.version = options.get("version")

    def partitions(self):
        from ..operators.txlog import tx_snapshot

        v = int(self.version) if self.version is not None else None
        snap = tx_snapshot(self.path, v)
        schema = _table_schema(self.path)
        colnames = [f.name for f in schema.fields]
        tail = ("insert", snap["version"])
        return [
            InputPartition((
                self.path, rel, colnames, schema.json(), tail,
                _partition_fill(rel, schema),
                snap["dvs"].get(rel, []),  # logical rows: DV'd positions out
            ))
            for rel in snap["files"]
        ] or [InputPartition(None)]

    def read(self, partition: InputPartition):
        if partition is None or partition.value is None:
            return
        path, rel, colnames, sjson, tail, fill, exclude_dv = partition.value
        yield from _emit_file(
            path, rel, colnames, sjson, tail, fill, exclude_dv
        )


class TxTableDataSource(DataSource):
    """Options: `path` (required); stream: `starting_version` (int commit
    version, default -1 = full history, or 'latest'); batch: `version`
    (time travel)."""

    @classmethod
    def name(cls) -> str:
        return "txtable"

    def schema(self):
        # a FRESH StructType (StructType.add mutates in place — never
        # extend the table's own schema object)
        out = StructType(list(_table_schema(self.options["path"]).fields))
        out.add(_CDC_COLS[0], "string").add(_CDC_COLS[1], "long")
        return out

    def reader(self, schema) -> TxTableBatchReader:
        return TxTableBatchReader(self.options)

    def streamReader(self, schema) -> TxTableStreamReader:
        return TxTableStreamReader(self.options)


def register_tx_source(spark) -> None:
    spark.dataSource.register(TxTableDataSource)
