#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a cheap count-style action (noop write would add
I/O variance); timings include plan + execution, excluding session startup.

Extra keys in the JSON line (additive, for scale-slope evidence):
- "iters": best-of-N per query (default 2 — steady-state numbers with
  JIT/codegen caches warm, so per-query times are comparable run to run
  instead of the alphabetically-first query eating JVM warmup).
- "sweep_sf"/"sweep_queries": one best-of-1 pass at a smaller SF
  (default sf0.01 when benching sf0.1), same session.
- "slopes": per-query time ratio primary/sweep on 10x the data — ~1-4 =
  overhead-dominated or sublinear, ~10 = linear, >10 flagged super-linear.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather_data_warehouse_aws_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# iterations per query; best run is reported
ITERS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2")))
# secondary scale factor for the slope sweep: "auto" picks sf0.01 when the
# primary is sf0.1; "off" disables; any path benches that dir
SWEEP = os.environ.get("SPARK_GRAFT_BENCH_SWEEP", "auto")


# entries whose best still exceeds this get extra iterations: heavy
# queries dominate the suite total, so their best-of-N needs more N to
# shake off one unlucky GC/compaction pause than a 0.2s entry does
HEAVY_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_SEC", "3.0"))
HEAVY_ITERS = max(
    ITERS, int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_ITERS", "4"))
)


def _load1() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


# ---------------------------------------------------------------------------
# Foreign-CPU metering: the r9 driver artifact was inflated ~20% by a
# co-tenant spike that the suite-start load gate could not see. load1
# DURING the run cannot adjudicate (our own 32-way Spark work dominates
# it), so each sample instead measures what the BOX burned minus what OUR
# process tree (driver + JVM + pyspark workers) burned — the difference,
# in cores, is the co-tenant. Samples above SPARK_GRAFT_BENCH_FOREIGN_MAX
# (default 2.0 cores) are flagged contaminated and retaken (up to 2
# extras); a query whose every sample stayed contaminated is reported in
# the JSON line's "contaminated" list so the number is never silently
# trusted.
# ---------------------------------------------------------------------------

_HZ = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100
# 1.0 core: measured on this box (r10), a 1.2-1.7-core co-tenant slows
# the heavy entries ~35% while 0.0-core samples match the quiet-box
# baselines exactly — 32-way Spark stages are memory-bandwidth-bound, so
# even one hot foreign core poisons a sample
FOREIGN_MAX = float(os.environ.get("SPARK_GRAFT_BENCH_FOREIGN_MAX", "1.0"))
CONTAMINATED_EXTRA = 2  # extra retakes when every base sample is dirty


def _box_busy_jiffies() -> int | None:
    """Total non-idle jiffies across all CPUs (user+nice+system+irq+…,
    excluding idle and iowait)."""
    try:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return sum(v) - v[3] - v[4]
    except (OSError, ValueError, IndexError):
        return None


def _tree_busy_jiffies() -> int | None:
    """utime+stime jiffies summed over THIS process and every live
    descendant (the py4j JVM, pyspark daemons/workers). A worker that
    exits mid-window drops its jiffies from the sum, which can only
    OVERSTATE foreign CPU — contamination flags stay conservative."""
    try:
        entries: dict[int, tuple[int, int]] = {}
        for p in os.listdir("/proc"):
            if not p.isdigit():
                continue
            try:
                with open(f"/proc/{p}/stat", "rb") as f:
                    s = f.read().decode("ascii", "replace")
            except OSError:
                continue  # raced a process exit
            after = s[s.rfind(")") + 2:].split()  # comm may hold spaces
            entries[int(p)] = (int(after[1]), int(after[11]) + int(after[12]))
        kids: dict[int, list[int]] = {}
        for pid, (ppid, _) in entries.items():
            kids.setdefault(ppid, []).append(pid)
        total, stack = 0, [os.getpid()]
        while stack:
            pid = stack.pop()
            if pid in entries:
                total += entries[pid][1]
            stack.extend(kids.get(pid, ()))
        return total
    except OSError:
        return None


def _foreign_cores(b0, t0, b1, t1, elapsed: float) -> float | None:
    """Average co-tenant cores burned during the window, or None when
    /proc was unreadable."""
    if None in (b0, t0, b1, t1) or elapsed <= 0:
        return None
    return round(max(0, (b1 - b0) - (t1 - t0)) / _HZ / elapsed, 2)


def timed_sample(fn):
    """(elapsed_sec, result, foreign_cores) for one callable run."""
    b0, t0 = _box_busy_jiffies(), _tree_busy_jiffies()
    start = time.perf_counter()
    result = fn()
    elapsed = time.perf_counter() - start
    foreign = _foreign_cores(b0, t0, _box_busy_jiffies(),
                             _tree_busy_jiffies(), elapsed)
    return elapsed, result, foreign


def _is_clean(foreign: float | None) -> bool:
    # unmeterable (non-Linux) degrades to "clean" — better an unflagged
    # number than a permanently contaminated suite
    return foreign is None or foreign <= FOREIGN_MAX


def run_suite(
    spark, queries, sf_dir: str, iters: int,
    detail: dict[str, dict] | None = None,
) -> dict[str, float]:
    # warm parquet footers so per-query numbers measure the query
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    timings: dict[str, float] = {}
    contaminated: list[str] = []
    for name in sorted(queries):
        load_before = _load1()
        samples: list[float] = []
        foreigns: list[float | None] = []
        n = 0

        def one_sample():
            nonlocal n
            df = queries[name](spark, sf_dir)
            n = df.count()
            # queries may persist internal intermediates (e.g. minhash
            # signatures); drop them so queries are timed independently
            spark.catalog.clearCache()

        # adaptive: heavy entries (best >= HEAVY_SEC after the base
        # iterations) get extra runs — a mid-run load spike on a 5s query
        # moves the suite total far more than one on a 0.2s query — and
        # a query with no foreign-CPU-clean sample gets retaken too
        # (min() only needs ONE quiet sample to report the true cost)
        while (
            len(samples) < iters
            or (min(samples) >= HEAVY_SEC and len(samples) < HEAVY_ITERS)
            or (not any(map(_is_clean, foreigns))
                and len(samples) < iters + CONTAMINATED_EXTRA)
        ):
            elapsed, _, foreign = timed_sample(one_sample)
            samples.append(elapsed)
            foreigns.append(foreign)
        clean = [s for s, f in zip(samples, foreigns) if _is_clean(f)]
        if not clean:
            contaminated.append(name)
            clean = samples
        timings[name] = round(min(clean), 3)
        if detail is not None:
            detail[name] = {
                "iters": [round(s, 3) for s in samples],
                "foreign_cores": foreigns,
                "load1_before": load_before,
            }
        print(
            f"# {name}: {timings[name]:.3f}s ({n} rows; "
            f"{len(samples)} iter(s), load1 {load_before}, "
            f"foreign {foreigns})",
            file=sys.stderr,
        )
    if detail is not None and contaminated:
        detail["_contaminated"] = contaminated
    return timings


def wait_for_quiet_box(
    threshold: float | None = None, max_wait_sec: float = 120.0,
) -> None:
    """Hold the primary loop until the 1-min load average settles below
    `threshold` (default: 1.5, override via SPARK_GRAFT_BENCH_LOAD_MAX;
    <=0 disables). Recorded benches on a box still digesting a previous
    job's load read 10-18% slow uniformly across queries (measured r5→r6:
    median per-query ratio 1.10× on UNTOUCHED code) — waiting a bounded
    minute or two is cheaper than a round of false regression triage.
    Best-effort: never raises, gives up after `max_wait_sec`."""
    if threshold is None:
        threshold = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "1.5"))
    if threshold <= 0:
        return
    deadline = time.monotonic() + max_wait_sec
    while True:
        try:
            load1 = os.getloadavg()[0]
        except OSError:
            return
        if load1 < threshold:
            return
        if time.monotonic() >= deadline:
            print(
                f"# load gate: giving up at load1={load1:.2f} after "
                f"{max_wait_sec:.0f}s — timings may read uniformly slow",
                file=sys.stderr,
            )
            return
        print(
            f"# load gate: load1={load1:.2f} >= {threshold} — waiting for "
            "the box to settle",
            file=sys.stderr,
        )
        time.sleep(5.0)


def main() -> None:
    spark = get_spark("wdwa-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    wait_for_quiet_box()
    load1_start = _load1()
    detail: dict[str, dict] = {}
    timings = run_suite(spark, queries, SF_DIR, ITERS, detail)

    # end-to-end weather pipeline (bronze JSON → silver → gold/SCD2 → band-
    # join accuracy fact): the reference's entire workload, vs its "<5 min
    # per Glue job" budget (BASELINE.md). 30 days × 2 extractions × 8 cities.
    import shutil
    import tempfile

    from weather_data_warehouse_aws_spark.pipeline.generate import generate_bronze
    from weather_data_warehouse_aws_spark.pipeline.run import run_pipeline

    # drop suite-era cached partitions/broadcasts before timing the
    # pipeline: a handful of queries persist() build sides and the suite
    # never unpersists them — their eviction/GC otherwise bills the
    # pipeline measurement (observed 2-3× inflation)
    spark.catalog.clearCache()

    tmp = tempfile.mkdtemp(prefix="wdwa_bench_")
    try:
        bronze = os.path.join(tmp, "bronze")
        t_gen = time.perf_counter()
        generate_bronze(bronze, days=30, extractions_per_day=2, seed=42)
        print(f"# weather_pipeline.generate: {time.perf_counter() - t_gen:.3f}s", file=sys.stderr)
        # best-of-ITERS like every suite query: iteration 1 pays one-time
        # plan analysis + codegen for the pipeline's ~15 fresh plans (a
        # per-process cost, not a per-day cost — production ingest is a
        # long-running session); steady state is what the reference's
        # "<5 min per daily Glue job" budget compares against
        best, n_acc = None, 0
        pipe_detail = {"iters": [], "foreign_cores": [],
                       "load1_before": _load1()}
        for it in range(max(ITERS, 1)):
            def _run_wp(it=it):
                layers = run_pipeline(
                    spark, bronze, os.path.join(tmp, f"wh{it}")
                )
                return layers["fact_forecast_accuracy"].count()
            elapsed, n_acc, foreign = timed_sample(_run_wp)
            pipe_detail["iters"].append(round(elapsed, 3))
            pipe_detail["foreign_cores"].append(foreign)
            print(f"# weather_pipeline.iter{it}: {elapsed:.3f}s "
                  f"(foreign {foreign})", file=sys.stderr)
            if _is_clean(foreign):
                best = elapsed if best is None else min(best, elapsed)
        if best is None:  # every sample contaminated — flag, report all
            detail.setdefault("_contaminated", []).append("weather_pipeline")
            best = min(pipe_detail["iters"])
        detail["weather_pipeline"] = pipe_detail
        timings["weather_pipeline"] = round(best, 3)
        print(
            f"# weather_pipeline: {timings['weather_pipeline']:.3f}s "
            f"({n_acc} accuracy rows)",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.clearCache()

    # end-to-end corpus curation pipeline (clean → DQ gate → MinHash dedup
    # → cluster survivors → Bloom-pruned decontamination → leakage-safe
    # split → concat-and-cut packing) — the training-data headline, over
    # this SF's documents with a 1%-slice eval set
    from pyspark.sql import functions as F

    from weather_data_warehouse_aws_spark.pipeline.curate import (
        curate_corpus,
        release_curation,
    )
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    ev = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    best, n_packed = None, 0
    cur_detail = {"iters": [], "foreign_cores": [], "load1_before": _load1()}
    for it in range(max(ITERS, 1)):
        def _run_cur():
            stages = curate_corpus(docs, eval_docs=ev)
            return stages, stages["packed"].count()
        elapsed, (stages, n_packed), foreign = timed_sample(_run_cur)
        release_curation(stages)  # the run's cache-ownership contract
        cur_detail["iters"].append(round(elapsed, 3))
        cur_detail["foreign_cores"].append(foreign)
        print(f"# curation_pipeline.iter{it}: {elapsed:.3f}s "
              f"(foreign {foreign})", file=sys.stderr)
        if _is_clean(foreign):
            best = elapsed if best is None else min(best, elapsed)
    if best is None:  # every sample contaminated — flag, report all
        detail.setdefault("_contaminated", []).append("curation_pipeline")
        best = min(cur_detail["iters"])
    detail["curation_pipeline"] = cur_detail
    timings["curation_pipeline"] = round(best, 3)
    print(
        f"# curation_pipeline: {timings['curation_pipeline']:.3f}s "
        f"({n_packed} packed rows)",
        file=sys.stderr,
    )

    def sf_of(path: str):
        raw = os.path.basename(path.rstrip("/")).replace("sf", "")
        try:
            return float(raw)
        except ValueError:
            return raw

    result = {
        "metric": "wdwa_spark_query_suite",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(SF_DIR),
        "iters": ITERS,
        # round-to-round comparability scalars (the per-query iteration
        # samples live in bench_detail.json — the primary line must stay
        # small enough for the driver's stdout-tail window)
        "load1_start": load1_start,
        "load1_end": _load1(),
        # queries whose EVERY sample saw > FOREIGN_MAX co-tenant cores
        # even after retakes — their numbers are upper bounds, not
        # measurements (empty on a quiet box)
        "contaminated": detail.get("_contaminated", []),
        "foreign_max": FOREIGN_MAX,
    }

    # full per-iteration samples + load readings, for adjudicating noise
    # vs. regression without a re-run; best-effort side artifact
    detail_out = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL_OUT", "bench_detail.json"
    )
    try:
        with open(detail_out, "w") as fh:
            json.dump(
                {"sf": sf_of(SF_DIR), "load1_start": load1_start,
                 "load1_end": _load1(), "detail": detail},
                fh, indent=1,
            )
        print(f"# detail written to {detail_out}", file=sys.stderr)
    except OSError as exc:
        print(f"# detail side-file write failed: {exc}", file=sys.stderr)

    # The scale-slope sweep runs BEFORE the primary line is printed and its
    # results go to stderr + a side file, NOT into the primary JSON object:
    # the driver captures only the tail of stdout, and inlining the sweep
    # made the round-2 primary line too long for that window (BENCH_r02.json
    # recorded "parsed": null). The compact primary object must be the final
    # stdout line.
    sweep_dir = None
    if SWEEP == "auto":
        cand = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
        if os.path.basename(SF_DIR.rstrip("/")) == "sf0.1" and os.path.isdir(cand):
            sweep_dir = cand
    elif SWEEP not in ("off", ""):
        sweep_dir = SWEEP
    if sweep_dir:
        print(f"# --- sweep at {sweep_dir} ---", file=sys.stderr)
        sweep_timings = run_suite(spark, queries, sweep_dir, 1)
        sweep = {
            "sweep_sf": sf_of(sweep_dir),
            "sweep_queries": sweep_timings,
            "slopes": {
                name: round(timings[name] / t, 2)
                for name, t in sweep_timings.items()
                if name in timings and t > 0
            },
        }
        print(f"# sweep: {json.dumps(sweep)}", file=sys.stderr)
        side = os.environ.get("SPARK_GRAFT_BENCH_SWEEP_OUT", "bench_sweep.json")
        try:
            with open(side, "w") as fh:
                json.dump({**sweep, "primary_sf": result["sf"],
                           "primary_queries": timings}, fh, indent=1)
            print(f"# sweep written to {side}", file=sys.stderr)
        except OSError as exc:  # side artifact is best-effort
            print(f"# sweep side-file write failed: {exc}", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
