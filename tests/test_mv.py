"""Incremental materialized views: differential correctness against a
full recompute after every kind of source mutation, exactly-once refresh,
and the CDF row-preserving skip they ride on.

The invariant every test pins: `mv_read(mv)` must equal the SQL
`SELECT keys, SUM(..), MIN(..), MAX(..), COUNT(*) FROM tx_read(src)
[WHERE f] GROUP BY keys` — NULL groups, NULL sums (all-NULL group),
dropped groups, and moved group keys included — no matter which ops
produced the source state or how many refreshes folded it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators import txlog as T
from weather_data_warehouse_aws_spark.operators.mv import (
    mv_create,
    mv_read,
    mv_refresh,
    mv_spec,
)

SCHEMA = "g string, x double, y int"


def _sorted(rows):
    return sorted(rows, key=lambda t: (t[0] is None, t))


def _mv_rows(spark, mv):
    return _sorted([tuple(r) for r in mv_read(spark, mv).collect()])


def _expected(spark, src, *, filter=None):
    """Full recompute with SQL semantics, in mv_read's column shape."""
    df = T.tx_read(spark, src)
    if filter:
        df = df.filter(filter)
    out = df.groupBy("g").agg(
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.min("x").alias("min_x"),
        F.max("y").alias("max_y"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return _sorted([tuple(r) for r in out.collect()])


def _mk(spark, tmp_path_factory, name, rows, *, filter=None):
    d = str(tmp_path_factory.mktemp(name))
    src, mv = d + "/src", d + "/mv"
    T.tx_append(spark.createDataFrame(rows, SCHEMA), src)
    mv_create(spark, src, mv, group_by=["g"], sum_cols=["x", "y"],
              min_cols=["x"], max_cols=["y"], filter=filter)
    return src, mv


BASE = [("a", 1.0, 5), ("a", 3.0, 6), ("b", None, 7), (None, 2.0, 8)]


def test_create_matches_recompute(spark, tmp_path_factory):
    src, mv = _mk(spark, tmp_path_factory, "mv_create", BASE)
    assert _mv_rows(spark, mv) == _expected(spark, src)
    # all-NULL sum group surfaces as SQL NULL, not the internal 0
    b = [t for t in _mv_rows(spark, mv) if t[0] == "b"][0]
    assert b[1] is None and b[4] == 7


def test_refresh_folds_every_mutation_kind(spark, tmp_path_factory):
    """Append + DV delete + update folded in ONE refresh equals the
    recompute — including the delete-triggered min/max rescan (x=3.0 was
    a's max candidate; its removal must expose the runner-up, which no
    incremental state holds)."""
    src, mv = _mk(spark, tmp_path_factory, "mv_fold", BASE)
    T.tx_append(spark.createDataFrame(
        [("a", 0.5, 1), ("c", 9.0, 9), (None, None, 2)], SCHEMA), src)
    T.tx_delete_where(spark, src, "x = 3.0")
    T.tx_update_where(spark, src, "g = 'b'", {"x": "4.0"})
    r = mv_refresh(spark, mv)
    assert r["refreshed"] and r["to_version"] == T.tx_snapshot(src)["version"]
    assert _mv_rows(spark, mv) == _expected(spark, src)


def test_minmax_rescan_exposes_runner_up(spark, tmp_path_factory):
    """Deleting the group's current minimum forces the rescan path: the
    surviving second-smallest value must become min_x exactly."""
    src, mv = _mk(spark, tmp_path_factory, "mv_rescan",
                  [("a", 1.0, 1), ("a", 2.0, 2), ("a", 3.0, 3)])
    T.tx_delete_where(spark, src, "x = 1.0")
    mv_refresh(spark, mv)
    rows = _mv_rows(spark, mv)
    assert rows == _expected(spark, src)
    assert rows[0][3] == 2.0  # min_x is the runner-up, not stale 1.0


def test_group_drop_and_new_group(spark, tmp_path_factory):
    src, mv = _mk(spark, tmp_path_factory, "mv_drop", BASE)
    T.tx_delete_where(spark, src, "g = 'a'")          # group emptied
    T.tx_append(spark.createDataFrame([("z", 7.0, 1)], SCHEMA), src)
    mv_refresh(spark, mv)
    rows = _mv_rows(spark, mv)
    assert rows == _expected(spark, src)
    assert not any(t[0] == "a" for t in rows)
    assert any(t[0] == "z" for t in rows)


def test_group_key_move_via_update(spark, tmp_path_factory):
    """An update that MOVES a row between groups (including into the NULL
    group) is one preimage-delete + one postimage-insert: both groups'
    aggregates shift in the same refresh."""
    src, mv = _mk(spark, tmp_path_factory, "mv_move", BASE)
    T.tx_update_where(spark, src, "g = 'a' AND x = 1.0", {"g": "NULL"})
    mv_refresh(spark, mv)
    assert _mv_rows(spark, mv) == _expected(spark, src)


def test_filter_applies_to_both_change_sides(spark, tmp_path_factory):
    """A filtered MV sees only in-filter rows; an update moving a row
    ACROSS the filter boundary must fold as a one-sided change."""
    src, mv = _mk(spark, tmp_path_factory, "mv_filter", BASE,
                  filter="y < 8")
    assert _mv_rows(spark, mv) == _expected(spark, src, filter="y < 8")
    # y 5 -> 9 leaves the filter; y 8 -> 3 enters it
    T.tx_update_where(spark, src, "y = 5", {"y": "9"})
    T.tx_update_where(spark, src, "y = 8", {"y": "3"})
    mv_refresh(spark, mv)
    assert _mv_rows(spark, mv) == _expected(spark, src, filter="y < 8")


def test_compact_is_skipped_but_watermark_advances(spark, tmp_path_factory):
    """OPTIMIZE/compact commits are row-preserving: the refresh reads ZERO
    change rows for them (skip_row_preserving), yet still advances the
    watermark so the skip is paid once, not on every future refresh."""
    src, mv = _mk(spark, tmp_path_factory, "mv_compact", BASE)
    v0 = T.tx_snapshot(src)["version"]
    T.tx_compact(spark, src, target_files=1)
    ch = T.tx_changes(spark, src, v0, skip_row_preserving=True)
    assert ch.count() == 0
    r = mv_refresh(spark, mv)
    assert r["refreshed"]
    app = [k for k in T.tx_snapshot(mv)["txns"] if k.startswith("mv:")][0]
    assert T.tx_snapshot(mv)["txns"][app] == T.tx_snapshot(src)["version"]
    assert _mv_rows(spark, mv) == _expected(spark, src)
    assert mv_refresh(spark, mv)["refreshed"] is False  # now current


def test_refresh_is_exactly_once_on_replay(spark, tmp_path_factory):
    """A replayed fold of the SAME source range is a structural no-op at
    the commit layer: tx_merge with the MV's (app, to_version) token
    returns version None and the table is byte-identical. This is the
    crash-retry story — a refresh that committed but whose caller died
    cannot double-fold."""
    src, mv = _mk(spark, tmp_path_factory, "mv_replay", BASE)
    T.tx_append(spark.createDataFrame([("a", 9.0, 9)], SCHEMA), src)
    r1 = mv_refresh(spark, mv)
    assert r1["refreshed"]
    before = _mv_rows(spark, mv)
    # replay the very same delta commit the refresh just made
    app = [k for k in T.tx_snapshot(mv)["txns"] if k.startswith("mv:")][0]
    fake_delta = spark.createDataFrame(
        [("a", 999.0, 1, 999, 1, 999.0, 999, 1, False)],
        "g string, sum_x double, nn_x long, sum_y long, nn_y long, "
        "min_x double, max_y int, n_rows long, __mv_abs boolean",
    )
    res = T.tx_merge(spark, mv, fake_delta, ["g"],
                     txn=(app, r1["to_version"]), null_safe_keys=True)
    assert res["version"] is None
    assert _mv_rows(spark, mv) == before


def test_replace_definition_starts_fresh_watermark(spark, tmp_path_factory):
    """mv_create(replace=True) with a CHANGED definition must fully
    re-materialize even at the same source version — the txn namespace is
    the definition hash, so the old watermark cannot mask the swap."""
    src, mv = _mk(spark, tmp_path_factory, "mv_replace", BASE)
    with pytest.raises(ValueError, match="exists"):
        mv_create(spark, src, mv, group_by=["g"], sum_cols=["x"])
    mv_create(spark, src, mv, group_by=["g"], sum_cols=["y"],
              replace=True)
    spec = mv_spec(mv)
    assert spec["sum_cols"] == ["y"] and spec["min_cols"] == []
    rows = _sorted([tuple(r) for r in mv_read(spark, mv).collect()])
    exp = _sorted([
        tuple(r) for r in T.tx_read(spark, src).groupBy("g").agg(
            F.sum("y").alias("sum_y"), F.count(F.lit(1)).alias("n_rows")
        ).collect()
    ])
    assert rows == exp
    # and refresh keeps working under the new namespace
    T.tx_append(spark.createDataFrame([("a", 0.0, 100)], SCHEMA), src)
    mv_refresh(spark, mv)
    a = [t for t in _sorted(
        [tuple(r) for r in mv_read(spark, mv).collect()]) if t[0] == "a"][0]
    assert a[1] == 5 + 6 + 100


def test_null_group_is_one_group(spark, tmp_path_factory):
    """NULL group keys accumulate into ONE group across refreshes (GROUP
    BY semantics) — the null-safe merge is what prevents a duplicate
    NULL-keyed row per refresh."""
    src, mv = _mk(spark, tmp_path_factory, "mv_nullg", BASE)
    for v in [5.0, 6.0]:
        T.tx_append(spark.createDataFrame([(None, v, 1)], SCHEMA), src)
        mv_refresh(spark, mv)
    rows = _mv_rows(spark, mv)
    assert rows == _expected(spark, src)
    assert sum(1 for t in rows if t[0] is None) == 1


def test_validation_errors(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mv_err"))
    src, mv = d + "/src", d + "/mv"
    T.tx_append(spark.createDataFrame(BASE, SCHEMA), src)
    with pytest.raises(ValueError, match="no materialized-view spec"):
        mv_refresh(spark, d + "/nope")
    with pytest.raises(ValueError, match="collides"):
        mv_create(spark, src, mv, group_by=["n_rows"], sum_cols=["x"])
    with pytest.raises(ValueError, match="non-empty"):
        mv_create(spark, src, mv, group_by=[], sum_cols=["x"])
    mv_create(spark, src, mv, group_by=["g"], sum_cols=["x"])
    with pytest.raises(ValueError, match="not a sum column"):
        mv_read(spark, mv, avg_cols=["y"]).collect()


def test_avg_and_internal_views(spark, tmp_path_factory):
    src, mv = _mk(spark, tmp_path_factory, "mv_avg", BASE)
    got = {r["g"]: r["avg_x"]
           for r in mv_read(spark, mv, avg_cols=["x"]).collect()}
    assert got["a"] == 2.0 and got["b"] is None and got[None] == 2.0
    internal = mv_read(spark, mv, internal=True)
    assert "nn_x" in internal.columns
    b = internal.filter("g = 'b'").first()
    assert b["sum_x"] == 0.0 and b["nn_x"] == 0  # null-free state


def test_fuzz_differential_against_recompute(spark, tmp_path_factory):
    """Seeded op-sequence fuzz: after EVERY refresh the MV equals the
    recompute. Ops cover append / DV delete / update / compact in an
    order that exercises rescans, group churn, and skip folding."""
    import random

    rnd = random.Random(20260816)
    src, mv = _mk(spark, tmp_path_factory, "mv_fuzz", BASE)
    groups = ["a", "b", "c", None]
    for step in range(6):
        for _ in range(rnd.randint(1, 2)):
            op = rnd.choice(["append", "delete", "update", "compact"])
            if op == "append":
                rows = [
                    (rnd.choice(groups),
                     rnd.choice([None, round(rnd.uniform(0, 9), 1)]),
                     rnd.randint(0, 9))
                    for _ in range(rnd.randint(1, 3))
                ]
                T.tx_append(spark.createDataFrame(rows, SCHEMA), src)
            elif op == "delete":
                T.tx_delete_where(spark, src, f"y = {rnd.randint(0, 9)}")
            elif op == "update":
                T.tx_update_where(
                    spark, src, f"y = {rnd.randint(0, 9)}",
                    {"x": str(round(rnd.uniform(0, 9), 1)),
                     "g": f"'{rnd.choice(['a', 'b', 'c'])}'"},
                )
            else:
                T.tx_compact(spark, src, target_files=1)
        mv_refresh(spark, mv)
        got, exp = _mv_rows(spark, mv), _expected(spark, src)
        # float sums fold in a different order than a recompute —
        # non-associativity is inherent, so compare doubles with approx
        assert len(got) == len(exp), f"group drift at fuzz step {step}"
        for g, e in zip(got, exp):
            for a, b in zip(g, e):
                if isinstance(a, float) and isinstance(b, float):
                    assert a == pytest.approx(b, rel=1e-9, abs=1e-9), \
                        f"divergence at fuzz step {step}: {g} vs {e}"
                else:
                    assert a == b, \
                        f"divergence at fuzz step {step}: {g} vs {e}"


def test_new_group_born_and_dying_in_one_range_never_lands(spark,
                                                           tmp_path_factory):
    """A group that first appears AND is fully deleted inside one refresh
    range nets to n_rows<=0; the conditional merge insert drops it, so the
    MV state stays minimal (no dead rows) and a later revival of the same
    group starts clean from the insert path."""
    src, mv = _mk(spark, tmp_path_factory, "mv_dead", BASE)
    T.tx_append(spark.createDataFrame([("ghost", 5.0, 5)], SCHEMA), src)
    T.tx_delete_where(spark, src, "g = 'ghost'")
    mv_refresh(spark, mv)
    internal = mv_read(spark, mv, internal=True)
    assert internal.filter("g = 'ghost'").count() == 0
    assert internal.filter("n_rows <= 0").count() == 0
    assert _mv_rows(spark, mv) == _expected(spark, src)
    # revival: the group returns via the insert path with fresh state
    T.tx_append(spark.createDataFrame([("ghost", 7.0, 7)], SCHEMA), src)
    mv_refresh(spark, mv)
    assert _mv_rows(spark, mv) == _expected(spark, src)


def test_mv_on_bucket_store_routes_through_seam(spark, tmp_path_factory):
    """The whole MV loop — spec file (put_atomic/open_input), create
    overwrite, CDF fold, merge write-back — rides the DataStore seam: under
    the object-store emulation the view's root holds no data bytes (only
    `_txn_log`), and the differential still holds."""
    import os

    from weather_data_warehouse_aws_spark.operators import txlog as _txmod

    from tests.bucket_store import BucketFSDataStore

    base = tmp_path_factory.mktemp("mv_bucket")
    bucket = str(tmp_path_factory.mktemp("mv_bucket_bytes"))
    prefix = str(base)
    _txmod.register_data_store(prefix, BucketFSDataStore(bucket))
    try:
        src, mv = str(base / "src"), str(base / "mv")
        T.tx_append(spark.createDataFrame(BASE, SCHEMA), src)
        mv_create(spark, src, mv, group_by=["g"], sum_cols=["x", "y"],
                  min_cols=["x"], max_cols=["y"])
        T.tx_append(spark.createDataFrame([("c", 9.0, 9)], SCHEMA), src)
        T.tx_delete_where(spark, src, "x = 3.0")
        mv_refresh(spark, mv)
        assert _mv_rows(spark, mv) == _expected(spark, src)
        for dirpath, _dirs, names in os.walk(mv):
            if "_txn_log" in dirpath:
                continue
            stray = [n for n in names if not n.startswith(".")]
            assert not stray, f"data bytes under the table root: {stray}"
        assert mv_spec(mv)["src"] == src  # spec readable through the seam
    finally:
        _txmod._DATA_STORES.pop(prefix, None)


def test_mv_status_reports_staleness(spark, tmp_path_factory):
    from weather_data_warehouse_aws_spark.operators.mv import mv_status

    src, mv = _mk(spark, tmp_path_factory, "mv_status", BASE)
    st = mv_status(mv)
    assert st["stale_by"] == 0 and st["watermark"] == st["src_version"]
    T.tx_append(spark.createDataFrame([("z", 1.0, 1)], SCHEMA), src)
    T.tx_append(spark.createDataFrame([("z", 2.0, 2)], SCHEMA), src)
    st = mv_status(mv)
    assert st["stale_by"] == 2
    mv_refresh(spark, mv)
    assert mv_status(mv)["stale_by"] == 0
