"""`txtable` streaming source (sources/tx_source.py): commit-version
offsets, checkpointed resume, delete/insert change semantics, batch
symmetry."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from weather_data_warehouse_aws_spark.operators.txlog import (
    tx_append,
    tx_erase_keys,
    tx_read,
    tx_snapshot,
    tx_vacuum,
)
from weather_data_warehouse_aws_spark.sources.tx_source import register_tx_source


def _mk(spark, rows):
    return spark.createDataFrame([Row(id=i, val=f"v{i}") for i in rows])


def _drain(spark, path, ckpt, sink_rows):
    """One trigger-once pass of the txtable stream into a collecting sink."""
    register_tx_source(spark)

    def _sink(batch_df, batch_id):
        sink_rows.extend(
            (r["id"], r["val"], r["_change_type"], r["_commit_version"])
            for r in batch_df.collect()
        )

    q = (
        spark.readStream.format("txtable")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(once=True)
        .start()
    )
    q.awaitTermination()


def test_stream_delivers_history_then_resumes(spark, tmp_path):
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    tx_append(_mk(spark, range(3)).coalesce(1), t)       # v0
    tx_append(_mk(spark, range(10, 12)).coalesce(1), t)  # v1

    got: list = []
    _drain(spark, t, ckpt, got)
    assert sorted(r[0] for r in got) == [0, 1, 2, 10, 11]
    assert {r[2] for r in got} == {"insert"}
    assert {r[3] for r in got} == {0, 1}  # provenance: which commit

    # new commit lands; the SAME checkpoint resumes at exactly v2
    tx_append(_mk(spark, [20]).coalesce(1), t)           # v2
    got2: list = []
    _drain(spark, t, ckpt, got2)
    assert [(r[0], r[2], r[3]) for r in got2] == [(20, "insert", 2)]

    # nothing new -> empty batch (or none), never redelivery
    got3: list = []
    _drain(spark, t, ckpt, got3)
    assert got3 == []


def test_stream_folds_rewrites_into_live_table(spark, tmp_path):
    """deletes-then-inserts per commit folds the stream into tx_read."""
    t = str(tmp_path / "t")
    tx_append(_mk(spark, range(6)).coalesce(1), t)
    tx_erase_keys(spark, t, "id", [2, 4])
    tx_append(_mk(spark, [30]).coalesce(1), t)

    got: list = []
    _drain(spark, t, str(tmp_path / "ckpt"), got)
    live: set = set()
    for v in sorted({r[3] for r in got}):
        dels = {r[0] for r in got if r[3] == v and r[2] == "delete"}
        ins = {r[0] for r in got if r[3] == v and r[2] == "insert"}
        live = (live - dels) | ins
    assert live == {r["id"] for r in tx_read(spark, t).collect()}


def test_starting_version_latest_skips_history(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_append(_mk(spark, range(5)).coalesce(1), t)
    register_tx_source(spark)
    got: list = []

    def _sink(batch_df, batch_id):
        got.extend(r["id"] for r in batch_df.collect())

    def _run():
        q = (
            spark.readStream.format("txtable")
            .option("path", t)
            .option("starting_version", "latest")
            .load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(once=True)
            .start()
        )
        q.awaitTermination()

    _run()
    assert got == []  # history skipped
    tx_append(_mk(spark, [99]).coalesce(1), t)
    _run()
    assert got == [99]  # only the post-subscription commit


def test_batch_read_matches_tx_read(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_append(_mk(spark, range(4)).coalesce(1), t)
    tx_erase_keys(spark, t, "id", [1])
    register_tx_source(spark)
    df = spark.read.format("txtable").option("path", t).load()
    assert {r["id"] for r in df.collect()} == {0, 2, 3}
    assert {r["_change_type"] for r in df.collect()} == {"insert"}
    # time travel through the batch reader
    df0 = (
        spark.read.format("txtable").option("path", t).option("version", "0").load()
    )
    assert {r["id"] for r in df0.collect()} == {0, 1, 2, 3}


def test_stream_from_vacuumed_history_fails_loudly(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    t = str(tmp_path / "t")
    for i in range(3):
        tx_append(_mk(spark, [i]).coalesce(1), t)
    from weather_data_warehouse_aws_spark.operators.txlog import tx_compact

    tx_compact(spark, t, target_files=1)
    tx_vacuum(t, retain_versions=1)
    assert tx_snapshot(t)["horizon"] > 0
    register_tx_source(spark)
    q = (
        spark.readStream.format("txtable")
        .option("path", t)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(once=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="horizon"):
        q.awaitTermination()


def test_batch_and_stream_fill_partition_columns(spark, tmp_path):
    """On a hive-partitioned tx table the partition values live in the
    file PATHS, not the footers — the txtable readers splice them back in,
    typed by the logged schema."""
    import datetime as dt

    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [(i, dt.date(2024, 1, 1 + i % 2), f"v{i}") for i in range(6)],
        "id int, d date, val string",
    )
    from weather_data_warehouse_aws_spark.operators.txlog import tx_append

    tx_append(df, t, partition_by=["d"])
    register_tx_source(spark)

    b = spark.read.format("txtable").option("path", t).load()
    assert b.filter(b["d"].isNull()).count() == 0
    assert sorted(str(r[0]) for r in b.select("d").distinct().collect()) == [
        "2024-01-01",
        "2024-01-02",
    ]

    got: list = []
    _drain(spark, t, ckpt, got)
    assert len(got) == 6 and all(r[2] == "insert" for r in got)


def test_txtable_changefeed_drives_incremental_aggregate(spark, tmp_path):
    """The full composition: a gold tx table streams its own change feed
    (txtable source) into a maintained grouped aggregate whose state is
    itself a tx table — erase and append move the aggregate, a pure-layout
    compaction nets to zero, and a drained checkpoint re-run is a no-op."""
    import datetime as dt

    from weather_data_warehouse_aws_spark.operators.cdc import grouped_sums
    from weather_data_warehouse_aws_spark.operators.txlog import (
        tx_append,
        tx_compact,
        tx_erase_keys,
        tx_read,
    )
    from weather_data_warehouse_aws_spark.streaming.jobs import (
        read_current_agg,
        run_txtable_agg_foreachbatch,
    )

    t = str(tmp_path / "t")
    agg = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")
    register_tx_source(spark)

    df = spark.createDataFrame(
        [(i, dt.date(2024, 1, 1 + i % 3), ["a", "b"][i % 2], i * 10) for i in range(40)],
        "id int, d date, grp string, amt int",
    )
    tx_append(df, t, partition_by=["d"])       # v0
    tx_erase_keys(spark, t, "id", [5, 6, 7])   # v1: logical deletes
    tx_compact(spark, t, target_files=2)       # v2: layout only — net zero

    def drain():
        s = spark.readStream.format("txtable").option("path", t).load()
        run_txtable_agg_foreachbatch(s, agg, ckpt, ["grp"], ["amt"])

    def direct():
        return sorted(
            map(tuple, grouped_sums(tx_read(spark, t), ["grp"], ["amt"]).collect())
        )

    drain()
    assert sorted(map(tuple, read_current_agg(spark, agg).collect())) == direct()

    drain()  # drained checkpoint: replay is a no-op
    assert sorted(map(tuple, read_current_agg(spark, agg).collect())) == direct()

    tx_append(
        spark.createDataFrame(
            [(100, dt.date(2024, 1, 2), "a", 999)],
            "id int, d date, grp string, amt int",
        ),
        t,
        partition_by=["d"],
    )
    tx_erase_keys(spark, t, "id", [0])
    drain()  # only the two new commits' files are read
    assert sorted(map(tuple, read_current_agg(spark, agg).collect())) == direct()


def test_changefeed_handles_deletion_vectors_and_restore(spark, tmp_path):
    """DV-exact streaming: a tx_delete_where commit streams exactly the
    newly-deleted rows, the batch reader serves the LOGICAL snapshot, a
    restore resurrects rows as inserts, and the maintained aggregate
    tracks the direct recompute through all of it."""
    from weather_data_warehouse_aws_spark.operators.cdc import grouped_sums
    from weather_data_warehouse_aws_spark.operators.txlog import (
        tx_append,
        tx_compact,
        tx_delete_where,
        tx_read,
        tx_restore,
    )
    from weather_data_warehouse_aws_spark.streaming.jobs import (
        read_current_agg,
        run_txtable_agg_foreachbatch,
    )

    t = str(tmp_path / "t")
    agg = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")
    register_tx_source(spark)

    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], i * 10) for i in range(40)],
        "id int, grp string, amt int",
    )
    tx_append(df.repartition(2), t)        # v0
    tx_delete_where(spark, t, "id < 6")    # v1: DV, no rewrite

    def drain():
        s = spark.readStream.format("txtable").option("path", t).load()
        run_txtable_agg_foreachbatch(s, agg, ckpt, ["grp"], ["amt"])

    def direct():
        return sorted(
            map(tuple, grouped_sums(tx_read(spark, t), ["grp"], ["amt"]).collect())
        )

    drain()
    assert sorted(map(tuple, read_current_agg(spark, agg).collect())) == direct()

    # the batch reader serves logical rows (DV'd positions excluded)
    b = spark.read.format("txtable").option("path", t).load()
    assert b.count() == 34

    tx_restore(t, 0)                       # v2: un-deletes via dv_state
    drain()
    assert sorted(map(tuple, read_current_agg(spark, agg).collect())) == direct()
    assert tx_read(spark, t).count() == 40

    tx_delete_where(spark, t, "id >= 38")  # v3
    tx_compact(spark, t, target_files=1)   # v4: materialization nets zero
    drain()
    assert sorted(map(tuple, read_current_agg(spark, agg).collect())) == direct()


def test_arrow_fast_path_engages_and_falls_back_per_file(spark, tmp_path):
    """The per-(commit,file) reader must emit pyarrow RecordBatches (zero
    per-row Python objects) for stable-schema tables — datetime, date,
    double, partition fill, DV exclusion all included — and fall back to
    tuples, per file and deterministically, only when a file's physical
    types can't cast to the declared schema."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weather_data_warehouse_aws_spark.operators.txlog import (
        tx_delete_where,
    )
    from weather_data_warehouse_aws_spark.sources.tx_source import (
        _emit_file,
        _read_file_rows,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (i, float(i), dt.datetime(2024, 1, 1 + i % 3, 6, 0, 0),
             dt.date(2024, 1, 1 + i % 3))
            for i in range(30)
        ],
        "id int, v double, ts timestamp, d date",
    )
    # repartition(1): one file per partition dir, so every file keeps live
    # rows after the DV below (layout must not depend on session history —
    # zero batches from a fully-DV'd file is CORRECT engine output, and
    # this test asserts the Arrow path, not file-count accidents).
    tx_append(df.repartition(1), t, partition_by=["d"])
    tx_delete_where(spark, t, "id < 6 AND d = DATE'2024-01-01'")  # DV on files

    snap = tx_snapshot(t)
    schema_json = snap["schema"]
    from pyspark.sql.types import StructType
    import json as _json

    tbl_schema = StructType.fromJson(_json.loads(schema_json))
    colnames = [f.name for f in tbl_schema.fields]
    from weather_data_warehouse_aws_spark.sources.tx_source import _partition_fill

    # pick a file that PROVABLY has live rows after the DV (belt+braces
    # against any future layout change): fewer DV'd positions than rows.
    rel = next(
        r for r in sorted(snap["files"])
        if len(snap["dvs"].get(r, []))
        < snap["stats"][r]["rows"]
    )
    out = list(_emit_file(
        t, rel, colnames, schema_json, ("insert", snap["version"]),
        _partition_fill(rel, tbl_schema), snap["dvs"].get(rel, []),
    ))
    assert out and all(isinstance(b, pa.RecordBatch) for b in out), (
        "stable-schema file must take the Arrow path"
    )
    # batch values ≡ tuple-path values (order, fill, DV exclusion, tail)
    tuple_rows = list(_read_file_rows(
        t, rel, colnames, ("insert", snap["version"]),
        _partition_fill(rel, tbl_schema), snap["dvs"].get(rel, []),
    ))
    batch_rows = [
        tuple(r.values())
        for b in out
        for r in pa.Table.from_batches([b]).to_pylist()
    ]
    def _norm(rows):
        return sorted(
            tuple(x.replace(tzinfo=None) if isinstance(x, dt.datetime) else x
                  for x in r)
            for r in rows
        )
    assert _norm(batch_rows) == _norm(tuple_rows)

    # craft a file whose 'id' column is uncastable strings → tuple fallback
    bad_rel = "part-badfile.parquet"
    pq.write_table(
        pa.table({"id": pa.array(["not-an-int"]),
                  "v": pa.array([1.0]),
                  "ts": pa.array([dt.datetime(2024, 1, 1)],
                                 type=pa.timestamp("us")),
                  }),
        os.path.join(t, bad_rel),
    )
    fallback = list(_emit_file(
        t, bad_rel, colnames, schema_json, ("insert", 99),
        {"d": dt.date(2024, 1, 1)}, [],
    ))
    assert fallback and all(isinstance(r, tuple) for r in fallback), (
        "uncastable file must fall back to tuples"
    )
    assert fallback[0][-2:] == ("insert", 99)


def test_predicate_prunes_files_without_opening(spark, tmp_path):
    """`predicate` option: a file whose committed stats PROVE no match is
    never opened — proven with a sentinel: corrupt the out-of-range
    file's bytes on disk; the predicated read still drains, the
    unpredicated read raises. Drained rows equal the full feed filtered
    by the same condition."""
    import json as _json
    import os

    t = str(tmp_path / "t")
    tx_append(_mk(spark, range(10)).coalesce(1), t)        # v0: ids 0..9
    tx_append(_mk(spark, range(100, 110)).coalesce(1), t)  # v1: ids 100..109
    snap = tx_snapshot(t)
    # the sentinel: clobber the v1 file (stats say id in [100, 109])
    hi_rel = next(
        r for r, st in snap["stats"].items() if st["cols"]["id"][0] == 100
    )
    with open(os.path.join(t, hi_rel), "wb") as fh:
        fh.write(b"\x00not a parquet file\x00")

    register_tx_source(spark)
    pred = _json.dumps([["id", "<=", 9]])

    # batch: pruned read works, unpruned read must hit the corrupt file
    df = (
        spark.read.format("txtable")
        .option("path", t).option("predicate", pred).load()
    )
    assert sorted(r["id"] for r in df.collect()) == list(range(10))
    with pytest.raises(Exception):
        spark.read.format("txtable").option("path", t).load().collect()

    # stream: same pruning at planning time, checkpointed drain succeeds
    got: list = []

    def _sink(batch_df, batch_id):
        got.extend((r["id"], r["_change_type"], r["_commit_version"])
                   for r in batch_df.collect())

    q = (
        spark.readStream.format("txtable")
        .option("path", t).option("predicate", pred).load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(once=True).start()
    )
    q.awaitTermination()
    assert sorted(r[0] for r in got) == list(range(10))
    assert {r[2] for r in got} == {0}  # the v1 (commit, file) partition never planned


def test_predicate_filters_rows_within_kept_files(spark, tmp_path):
    """A kept file is row-filtered by the same conjuncts (on the CAST
    columns), so the drained feed IS the filtered feed — including date
    literals arriving as ISO strings (JSON has no date type) against a
    hive date partition, and delete emissions from rewritten files."""
    import datetime as dt
    import json as _json

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}", dt.date(2024, 1, 1 + i % 2)) for i in range(8)],
        "id int, val string, d date",
    )
    tx_append(df.repartition(1), t, partition_by=["d"])  # v0: 2 files
    tx_erase_keys(spark, t, "id", [0, 1])                # v1: rewrites

    register_tx_source(spark)
    pred = _json.dumps([["d", "=", "2024-01-01"], ["id", "<=", 4]])

    def drain(with_pred, tag):
        rows: list = []

        def _sink(batch_df, batch_id):
            rows.extend(
                (r["id"], r["_change_type"], r["_commit_version"])
                for r in batch_df.collect()
            )

        reader = spark.readStream.format("txtable").option("path", t)
        if with_pred:
            reader = reader.option("predicate", pred)
        q = (
            reader.load().writeStream.foreachBatch(_sink)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .trigger(once=True).start()
        )
        q.awaitTermination()
        return sorted(rows)

    full = drain(False, "full")
    # d=2024-01-01 ⇔ even ids; id<=4 → {0, 2, 4}
    want = sorted(r for r in full if r[0] in (0, 2, 4))
    assert drain(True, "pred") == want
    assert any(r[1] == "delete" for r in want), "filtered deletes included"

    # batch symmetry: predicated snapshot read == tx_read + filter
    got = (
        spark.read.format("txtable")
        .option("path", t).option("predicate", pred).load().collect()
    )
    assert sorted(r["id"] for r in got) == [2, 4]  # 0 was erased


def test_cast_report_censuses_fallback_files(spark, tmp_path, capsys):
    """tx_source_cast_report: zero fallbacks on a stable-schema table;
    a planted value-uncastable file (string ids under a long-typed logged
    schema) is flagged — and _emit_file WARNS when it falls back."""
    import warnings

    from pyspark.sql import Row

    from weather_data_warehouse_aws_spark.sources.tx_source import (
        _emit_file,
        tx_source_cast_report,
    )

    t = str(tmp_path / "t")
    tx_append(_mk(spark, range(5)).coalesce(1), t)
    rep = tx_source_cast_report(t)
    assert rep == {
        "files_total": 1, "files_probed": 1, "files_skipped": 0,
        "arrow_ready": 1, "fallback_files": [],
    }

    # evolution that poisons the cast: id becomes string with
    # non-numeric values, then the logged schema moves back to long —
    # the string file can never cast to the declared type
    bad = spark.createDataFrame([Row(id="not-an-int", val="x")])
    tx_append(bad.coalesce(1), t)
    tx_append(_mk(spark, [9]).coalesce(1), t)  # logged schema: id long again

    rep2 = tx_source_cast_report(t)
    assert rep2["files_total"] == 3 and rep2["arrow_ready"] == 2

    # bounded probe: max_files caps driver IO to an evenly-spaced sample
    # and reports exactly what was skipped (no silent cap)
    capped = tx_source_cast_report(t, max_files=2)
    assert capped["files_probed"] == 2 and capped["files_skipped"] == 1
    assert capped["files_total"] == 3
    [(bad_rel, reason)] = rep2["fallback_files"]
    assert "ArrowInvalid" in reason

    snap = tx_snapshot(t)
    from pyspark.sql.types import StructType
    import json as _json

    schema = StructType.fromJson(_json.loads(snap["schema"]))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = list(_emit_file(
            t, bad_rel, [f.name for f in schema.fields], schema.json(),
            ("insert", 1), {}, [],
        ))
    assert rows and isinstance(rows[0], tuple)
    assert any("tuple path" in str(x.message) for x in w)
    # (doctor prints this census — pinned in test_txlog's doctor test on a
    # healthy table; THIS drifted table also breaks the JVM mergeSchema
    # read, so doctor's later tx_read would fail for unrelated reasons)


def test_parse_predicate_in_requires_list(spark):
    """[col, 'in', scalar] gets the friendly txtable ValueError, not a
    bare TypeError from inside the member-lift comprehension; a null
    member set is an explicit empty IN (matches nothing)."""
    import json as _json

    from pyspark.sql.types import StructType

    from weather_data_warehouse_aws_spark.sources.tx_source import (
        _parse_predicate,
    )

    schema = StructType.fromDDL("id long, val string")
    with pytest.raises(ValueError, match="txtable.*'in' needs a JSON list"):
        _parse_predicate(_json.dumps([["id", "in", 5]]), schema)
    assert _parse_predicate(_json.dumps([["id", "in"]]), schema) == [
        ("id", "in", [])
    ]
    assert _parse_predicate(_json.dumps([["id", "in", None]]), schema) == [
        ("id", "in", [])
    ]


def test_batch_predicate_strict_on_fallback_file(spark, tmp_path):
    """Batch-equals-filter even on a cast-fallback file: a row whose
    PHYSICAL value can't compare against the predicate literal is
    DROPPED on the batch path (pred_strict=True — Spark SQL's
    uncastable-comparison semantics: the cast yields NULL, the filter
    rejects it), while the CDC path KEEPS it (a change feed may
    over-deliver, never silently under-deliver)."""
    from pyspark.sql import Row

    from weather_data_warehouse_aws_spark.sources.tx_source import (
        _emit_file,
        _py_pred_ok,
    )

    # the primitive: incomparable pair -> kept lax, dropped strict
    idx = {"id": 0, "val": 1}
    row = ("not-an-int", "x")
    pred = [("id", "<=", 2)]
    assert _py_pred_ok(row, idx, pred) is True
    assert _py_pred_ok(row, idx, pred, strict=True) is False
    # comparable rows are identical under both modes
    assert _py_pred_ok((1, "x"), idx, pred, strict=True) is True
    assert _py_pred_ok((7, "x"), idx, pred) is False

    # through the per-file reader: plant a file whose id column can't
    # cast to the declared long (forces the tuple path), then read it
    # with the type-mismatched predicate under each contract
    t = str(tmp_path / "t")
    tx_append(_mk(spark, range(3)).coalesce(1), t)
    bad = spark.createDataFrame([Row(id="not-an-int", val="x")])
    tx_append(bad.coalesce(1), t)
    tx_append(_mk(spark, [9]).coalesce(1), t)  # logged schema: id long again

    import json as _json

    from pyspark.sql.types import StructType

    snap = tx_snapshot(t)
    schema = StructType.fromJson(_json.loads(snap["schema"]))
    bad_rel = next(
        r for r, st in snap["stats"].items()
        if "id" not in st.get("cols", {}) or st["cols"]["id"][0] is None
        or isinstance(st["cols"]["id"][0], str)
    )
    colnames = [f.name for f in schema.fields]
    args = (t, bad_rel, colnames, schema.json(), ("insert", 1), {}, [])
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cdc_rows = list(_emit_file(*args, pred=pred))
        batch_rows = list(_emit_file(*args, pred=pred, pred_strict=True))
    assert any(r[0] == "not-an-int" for r in cdc_rows)  # over-delivered
    assert batch_rows == []  # strict: incomparable row filtered out


def test_txtable_source_reads_renamed_columns(spark, tmp_path):
    """Column mapping through the Python source: after tx_rename_column
    (metadata-only, files keep the physical name) the batch reader, the
    change-feed stream, predicate pruning, and the cast-report census all
    operate under the LOGICAL name — for files written before AND after
    the rename."""
    import json as _json

    from weather_data_warehouse_aws_spark.operators.txlog import (
        tx_rename_column,
    )
    from weather_data_warehouse_aws_spark.sources.tx_source import (
        tx_source_cast_report,
    )

    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    tx_append(_mk(spark, range(5)).coalesce(1), t)          # v0, physical 'id'
    tx_rename_column(t, "id", "ident")                      # v1
    tx_append(
        spark.createDataFrame([(100, "v100")], "ident int, val string")
        .coalesce(1),
        t,
    )                                                       # v2

    register_tx_source(spark)
    b = spark.read.format("txtable").option("path", t).load()
    assert "ident" in b.columns and "id" not in b.columns
    assert sorted(r["ident"] for r in b.collect()) == [0, 1, 2, 3, 4, 100]

    # predicate under the new name: plan-time pruning + row filter
    pred = _json.dumps([["ident", ">=", 100]])
    got = (
        spark.read.format("txtable")
        .option("path", t).option("predicate", pred).load().collect()
    )
    assert [r["ident"] for r in got] == [100]

    # stream drains both eras as logical columns
    sink: list = []

    def _sink(batch_df, _bid):
        sink.extend((r["ident"], r["_commit_version"]) for r in batch_df.collect())

    q = (
        spark.readStream.format("txtable").option("path", t).load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt).trigger(once=True).start()
    )
    q.awaitTermination()
    assert sorted(sink) == [(i, 0) for i in range(5)] + [(100, 2)]

    # the census probes the PHYSICAL name — a mapped table is healthy
    rep = tx_source_cast_report(t)
    assert rep["arrow_ready"] == rep["files_total"] == 2


def test_starting_timestamp_resolves_stream_start(spark, tmp_path):
    """starting_timestamp: the feed covers every commit AFTER the newest
    one at-or-before the instant (Delta's startingTimestamp); an instant
    before all history yields the full feed; mixing the two starting
    options refuses."""
    from weather_data_warehouse_aws_spark.operators.txlog import tx_history

    t = str(tmp_path / "t")
    tx_append(_mk(spark, range(3)).coalesce(1), t)       # v0
    tx_append(_mk(spark, [10]).coalesce(1), t)           # v1
    tx_append(_mk(spark, [20]).coalesce(1), t)           # v2
    ts = [h["ts"] for h in tx_history(t)]
    register_tx_source(spark)

    def _run(opts, ckpt):
        got: list = []

        def _sink(batch_df, batch_id):
            got.extend(r["id"] for r in batch_df.collect())

        reader = spark.readStream.format("txtable").option("path", t)
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(once=True)
            .start()
        )
        q.awaitTermination()
        return got

    # an instant between v0 and v1 -> feed starts at v1
    mid = (ts[0] + ts[1]) / 2
    assert sorted(_run({"starting_timestamp": str(mid)}, "c1")) == [10, 20]
    # before all history -> the full feed
    assert sorted(_run({"starting_timestamp": str(ts[0] - 10)}, "c2")) == [
        0, 1, 2, 10, 20
    ]
    # ISO spelling
    import datetime as _dt

    iso = _dt.datetime.fromtimestamp(
        (ts[1] + ts[2]) / 2, tz=_dt.timezone.utc
    ).isoformat()
    assert _run({"starting_timestamp": iso}, "c3") == [20]
    # both starting options -> loud refusal
    with pytest.raises(Exception, match="not both"):
        _run({"starting_timestamp": str(mid), "starting_version": "0"}, "c4")


# --------------------------------------------------------- admission control
def _bounded_query(spark, t, ckpt, batches, **opts):
    """Start (not drain) a continuously-triggering txtable stream into a
    per-batch collecting sink; `batches` gains one (ids, versions) tuple
    per NON-EMPTY microbatch. Caller drives with processAllAvailable()
    and stop()."""
    register_tx_source(spark)

    def _sink(bdf, _bid):
        rows = bdf.collect()
        if rows:
            batches.append((
                sorted(r["id"] for r in rows),
                sorted({r["_commit_version"] for r in rows}),
            ))

    reader = spark.readStream.format("txtable").option("path", t)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return (
        reader.load().writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )


def test_max_commits_per_trigger_bounds_backlog(spark, tmp_path):
    """Commits landing while the stream is UP drain as BOUNDED
    microbatches — a 9-commit backlog under max_commits_per_trigger=3
    takes >=3 batches of <=3 commit versions each, every row delivered
    exactly once (Delta's maxFilesPerTrigger semantics: catch-up is
    incremental and each bounded batch is a durable checkpoint). The
    FIRST trigger of a (re)start is unbounded by Python-API necessity —
    latestOffset runs before the reader can see any offset, and
    releasing less than a restart's checkpoint would regress the offset
    log — so the backlog is planted after the stream starts."""
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    tx_append(_mk(spark, [100]).coalesce(1), t)  # v0 — first (unbounded) trigger
    batches: list = []
    q = _bounded_query(spark, t, ckpt, batches,
                       max_commits_per_trigger="3")
    try:
        q.processAllAvailable()
        assert [b[0] for b in batches] == [[100]]
        batches.clear()
        for i in range(9):
            tx_append(_mk(spark, [i]).coalesce(1), t)  # v1..v9
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) >= 3, batches
    for _ids, versions in batches:
        assert versions[-1] - versions[0] + 1 <= 3, batches
    all_ids = [i for ids, _ in batches for i in ids]
    assert sorted(all_ids) == list(range(9))  # exactly once


def test_max_commits_restart_mid_backlog_exactly_once(spark, tmp_path):
    """Stop the stream MID-BACKLOG (after >=1 bounded batch, before the
    drain completes), then restart on the same checkpoint: no row is
    lost or duplicated across the boundary — each bounded batch was a
    durable checkpoint. The restart's own first trigger is unbounded
    (see test above) and sweeps the remainder."""
    import time as _time

    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    tx_append(_mk(spark, [100]).coalesce(1), t)  # v0
    batches: list = []
    q = _bounded_query(spark, t, ckpt, batches,
                       max_commits_per_trigger="2")
    try:
        q.processAllAvailable()  # v0 delivered; high-water mark seeded
        for i in range(12):
            tx_append(_mk(spark, [i]).coalesce(1), t)  # v1..v12
        # stop as soon as at least one BOUNDED batch has committed but
        # before the 6-batch drain can finish
        deadline = _time.monotonic() + 120
        while len(batches) < 2 and _time.monotonic() < deadline:
            _time.sleep(0.05)
    finally:
        q.stop()
    delivered_phase1 = [i for ids, _ in batches[1:] for i in ids]
    assert delivered_phase1, "need at least one bounded batch pre-stop"
    # every phase-1 batch past the seed drain is bounded
    for _ids, versions in batches[1:]:
        assert versions[-1] - versions[0] + 1 <= 2, batches

    batches2: list = []
    q2 = _bounded_query(spark, t, ckpt, batches2,
                        max_commits_per_trigger="2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    delivered = delivered_phase1 + [i for ids, _ in batches2 for i in ids]
    assert sorted(delivered) == list(range(12))  # exactly once, no loss


def test_max_files_per_trigger_bounds_by_file_count(spark, tmp_path):
    """max_files_per_trigger admits whole commits until the planned file
    count would exceed the cap (2 files/commit, cap 4 -> 2 commits per
    batch), but always admits at least one commit so an oversized commit
    can never wedge the stream."""
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    tx_append(_mk(spark, [100, 101]).repartition(2), t)  # v0 — seed trigger
    batches: list = []
    q = _bounded_query(spark, t, ckpt, batches, max_files_per_trigger="4")
    try:
        q.processAllAvailable()
        batches.clear()
        for i in range(6):
            tx_append(_mk(spark, [2 * i, 2 * i + 1]).repartition(2), t)
        # one commit of 10 files: oversized, must still be admitted alone
        tx_append(_mk(spark, range(50, 60)).repartition(10), t)
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) >= 4, batches
    for _ids, versions in batches:
        assert len(versions) <= 2, batches
    assert [50, 51, 52, 53, 54, 55, 56, 57, 58, 59] in [
        b[0] for b in batches
    ], "oversized commit admitted as its own batch"
    all_ids = [i for ids, _ in batches for i in ids]
    assert sorted(all_ids) == sorted(list(range(12)) + list(range(50, 60)))


def test_max_bytes_per_trigger_bounds_by_volume(spark, tmp_path):
    """max_bytes_per_trigger admits whole commits until the planned ADD
    byte volume (commit-recorded add-file sizes) would exceed the cap;
    a single over-cap commit still admits alone (progress guarantee)."""
    from weather_data_warehouse_aws_spark.operators.txlog import (
        tx_snapshot as snap_of,
    )

    t = str(tmp_path / "t")
    tx_append(_mk(spark, [100]).coalesce(1), t)  # v0 — seed trigger
    # learn the per-commit add volume from the committed stats
    st = snap_of(t)["stats"]
    sizes = [st[f]["bytes"] for f in sorted(st)]
    assert all(s > 0 for s in sizes)
    cap = str(2 * max(sizes) + max(sizes) // 2)  # ~2 commits per batch
    batches: list = []
    q = _bounded_query(spark, t, str(tmp_path / "ckpt"), batches,
                       max_bytes_per_trigger=cap)
    try:
        q.processAllAvailable()  # v0 delivered; high-water mark seeded
        batches.clear()
        for i in range(6):
            tx_append(_mk(spark, [i]).coalesce(1), t)  # v1..v6
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) >= 3, batches
    for _ids, versions in batches:
        assert len(versions) <= 2, batches
    assert sorted(i for ids, _ in batches for i in ids) == list(range(6))
