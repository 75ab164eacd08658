#!/usr/bin/env python
"""Reproduce the round-9 metadata-plane measurements quoted in SCALE.md:

1. checkpoint format — json vs parquet encode/decode time and payload
   size at N synthetic live files (plus the column-pruned rel-only read);
2. end-to-end planning — driver `tx_prune` vs distributed
   `tx_prune(spark=...)` on a FABRICATED table (planning never opens
   data files, so the table is 11 tiny commits + one N-file checkpoint).

Usage: python tools/bench_metadata_plane.py [N] [--spark]
Defaults: N=200000, no Spark (part 2 needs --spark and a quiet box).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_warehouse_aws_spark.operators.txlog import (  # noqa: E402
    _CP_STATE_KEYS,
    _SIDECAR_MAX_PARTS,
    _checkpoint_from_parquet,
    _checkpoint_to_parquet,
    _sidecar_to_parquet,
)


def _synthetic_checkpoint(n: int) -> dict:
    files = [f"d={i % 365:03d}/part-{i:08x}.parquet" for i in range(n)]
    stats = {
        f: {"rows": 10000 + i % 500,
            "cols": {"id": [i * 10, i * 10 + 9999, 0],
                     "v": [float(i), float(i) + 1.5, 3],
                     "d": [f"2024-{1 + i % 12:02d}-01",
                           f"2024-{1 + i % 12:02d}-28", 0]}}
        for i, f in enumerate(files)
    }
    dvs = {f: [f"_dv/{j}.parquet"] for j, f in enumerate(files[:n // 100])}
    return {"version": 10, "files": files, "stats": stats, "dvs": dvs,
            "schema": json.dumps({"type": "struct", "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}}]}),
            "horizon": 0, "txns": {}, "partition_by": ["d"],
            "constraints": {}, "column_map": {}, "dropped_cols": [],
            "bases": [], "generated": {}}


def _best(fn, n=3):
    ts = []
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def bench_formats(n: int) -> None:
    cp = _synthetic_checkpoint(n)
    tj, js = _best(lambda: json.dumps(
        {k: cp.get(k) for k in (*_CP_STATE_KEYS, "files", "stats", "dvs")}))
    tjd, _ = _best(lambda: json.loads(js))
    tp, blob = _best(lambda: _checkpoint_to_parquet(cp))
    tpd, back = _best(lambda: _checkpoint_from_parquet(blob))
    assert back["files"] == cp["files"] and back["stats"] == cp["stats"]
    import pyarrow as pa
    import pyarrow.parquet as pq
    trel, _ = _best(lambda: pq.read_table(
        pa.BufferReader(blob), columns=["rel"]).column("rel").to_pylist())
    print(f"N={n} live files:")
    print(f"  json:    encode {tj:.2f}s decode {tjd:.2f}s "
          f"size {len(js) / 1e6:.1f} MB")
    print(f"  parquet: encode {tp:.2f}s decode {tpd:.2f}s "
          f"size {len(blob) / 1e6:.1f} MB")
    print(f"  parquet rel-column-only read: {trel:.3f}s")


def bench_multipart(n: int, delta: int = 1000) -> None:
    """Checkpoint WRITE AMPLIFICATION: single-part (every checkpoint
    rewrites the live set) vs multi-part (unchanged parts reused, one
    delta sidecar per checkpoint, full compaction every
    _SIDECAR_MAX_PARTS checkpoints). `delta` models the files touched
    per CHECKPOINT_INTERVAL commits."""
    cp = _synthetic_checkpoint(n)
    t_full, blob = _best(lambda: _checkpoint_to_parquet(cp))
    rows = [
        (f, json.dumps(cp["stats"][f]), cp["dvs"].get(f) or [], False)
        for f in cp["files"][:delta]
    ] + [(f, None, [], True) for f in cp["files"][-max(1, delta // 10):]]
    t_delta, sblob = _best(lambda: _sidecar_to_parquet(rows))
    t_man, man = _best(lambda: _checkpoint_to_parquet(
        {**cp, "files": [], "stats": {}, "dvs": {}},
        extra_state={"sidecars": [f"sc-{i}" for i in range(
            _SIDECAR_MAX_PARTS)]},
    ))
    per_cp_delta = len(sblob) + len(man)
    amortized = (len(blob) + len(man)
                 + (_SIDECAR_MAX_PARTS - 1) * per_cp_delta
                 ) / _SIDECAR_MAX_PARTS
    print(f"checkpoint write amplification at N={n}, delta={delta} "
          f"touched files/checkpoint:")
    print(f"  single-part: {len(blob) / 1e6:.2f} MB per checkpoint "
          f"(encode {t_full:.2f}s)")
    print(f"  multi-part delta: {per_cp_delta / 1e6:.3f} MB per "
          f"checkpoint (sidecar {len(sblob) / 1e3:.0f} KB encode "
          f"{t_delta * 1e3:.0f}ms + manifest {len(man) / 1e3:.0f} KB)")
    print(f"  amortized incl. compaction every {_SIDECAR_MAX_PARTS}: "
          f"{amortized / 1e6:.2f} MB per checkpoint "
          f"({len(blob) / amortized:.1f}x less than single-part; "
          f"steady-state delta checkpoints are "
          f"{len(blob) / per_cp_delta:.0f}x smaller)")


def bench_planning(n: int) -> None:
    from pyspark.sql import SparkSession

    from weather_data_warehouse_aws_spark.operators import txlog as tx

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false").getOrCreate())
    cp = _synthetic_checkpoint(n)
    cp["partition_by"] = None
    cp["files"] = [f.split("/", 1)[1] for f in cp["files"]]  # flat rels
    cp["stats"] = {f.split("/", 1)[1]: s
                   for f, s in cp["stats"].items()}
    cp["dvs"] = {}
    d = tempfile.mkdtemp()
    t = os.path.join(d, "t")
    log = os.path.join(t, "_txn_log")
    os.makedirs(log)
    for v in range(11):
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
            json.dump({"version": v, "op": "append", "add": [],
                       "remove": [], "meta": {"schema": cp["schema"]},
                       "ts": time.time()}, fh)
    with open(os.path.join(log, f"{10:020d}.checkpoint.parquet"),
              "wb") as fh:
        fh.write(_checkpoint_to_parquet(cp))
    pred = [("id", ">=", n * 10 * 3 // 4)]
    tx.tx_prune(t, pred, spark=spark)  # warm the Spark path
    t0 = time.perf_counter()
    a = tx.tx_prune(t, pred)
    t1 = time.perf_counter()
    b = tx.tx_prune(t, pred, spark=spark)
    t2 = time.perf_counter()
    assert (sorted(a[0]), sorted(a[1])) == (b[0], b[1])
    print(f"end-to-end planning at {n} files: driver {t1 - t0:.2f}s, "
          f"distributed {t2 - t1:.2f}s, kept {len(a[0])}")
    spark.stop()


def bench_dv_commit(rows: int = 100_000) -> None:
    """The round-10 DV-commit change, reproduced: measure a
    tx_delete_where on a real table (its `_write_dv` rides Observation
    metrics on the write — one Spark job) against the prior shape (write
    the DV relation, then re-read it for covers + count — two jobs).
    Warm best-of-3 each; needs a quiet box like bench_planning."""
    from pyspark.sql import SparkSession, functions as F

    from weather_data_warehouse_aws_spark.operators import txlog as tx

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false").getOrCreate())
    d = tempfile.mkdtemp()
    t = os.path.join(d, "t")
    tx.tx_append(
        spark.range(rows).select(
            F.col("id").alias("k"), (F.col("id") * 2.5).alias("v")
        ).coalesce(8),
        t,
    )
    snap = tx.tx_snapshot(t)

    def hits():
        return (
            tx._read_live(spark, t, snap["files"], snap, keep_meta=True)
            .filter("k % 9973 = 5")
            .select(F.col("__tx_rel").alias("file"),
                    F.col("__tx_pos").alias("pos"))
            .repartition(1)
        )

    def two_jobs():
        rels, _ = tx._write_new_files(hits(), t, collect_stats=False,
                                      prefix="dv")
        per = (spark.read.parquet(*tx._read_uris(t, rels))
               .groupBy("file").count().collect())
        tx._drop_files(t, rels)
        return sum(r["count"] for r in per)

    def one_job():
        rels, covers, n_ = tx._write_dv(t, hits())
        tx._drop_files(t, rels)
        return n_

    one_job()  # warm
    t_old, n_old = _best(two_jobs)
    t_new, n_new = _best(one_job)
    assert n_old == n_new
    print(f"dv commit ({rows} rows scanned, {n_new} positions): "
          f"write+re-read {t_old:.2f}s, observed write {t_new:.2f}s "
          f"({t_old / t_new:.1f}x)")
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 200_000
    bench_formats(n)
    bench_multipart(n)
    if "--spark" in sys.argv:
        bench_planning(n)
        bench_dv_commit()
