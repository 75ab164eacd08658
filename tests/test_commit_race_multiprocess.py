"""Cross-PROCESS optimistic-concurrency hammer on the commit protocol.

The in-process race tests (test_txlog.py) prove retry logic against an
injected racer; this one proves the claim that matters on a cluster —
"exactly one writer wins a version" — with N separate OS processes each
landing M commits on one table, over BOTH log planes: the hard-link
store (one metadata op claims+publishes) and the mutex+publish store
(claim and publish are separate ops with a visibility gap — Delta's
S3+DynamoDB physics). Checks: every version 0..N*M-1 claimed exactly
once, every loser retry eventually wins, per-writer commit order is
serial (a writer's later commit lands at a later version), and the
replayed history carries each (worker, seq) exactly once. No Spark —
the commit protocol is pure Python, so the hammer runs in seconds.
"""

from __future__ import annotations

import multiprocessing as mp
import os

import pytest

from weather_data_warehouse_aws_spark.operators import txlog as TX

N_WORKERS = 4
N_COMMITS = 10  # 40 total -> 3 contended checkpoint writes at v10/20/30


def _hammer(store_kind: str, bucket_root: str, table: str, worker_id: int,
            barrier, out_q) -> None:
    # each process registers its own store view (the registry is
    # process-local, like a cluster node's config)
    if store_kind == "mutex":
        from tests.mutex_store import MutexPublishLogStore

        TX.register_log_store(
            os.path.dirname(table), MutexPublishLogStore(bucket_root)
        )
    barrier.wait()  # maximal contention: everyone commits at once
    won = []
    for i in range(N_COMMITS):
        v = TX._commit(
            table, "noop",
            lambda s, w=worker_id, i=i: ([], [], {"worker": w, "seq": i}),
            validate_remove_live=False,
        )
        won.append(v)
    out_q.put((worker_id, won))


@pytest.mark.parametrize("store_kind", ["localfs", "mutex"])
def test_n_processes_serialize_commits_exactly_once(tmp_path, store_kind):
    table = str(tmp_path / "t")
    bucket_root = str(tmp_path / "bucket")
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(N_WORKERS)
    out_q = ctx.Queue()
    procs = [
        ctx.Process(
            target=_hammer,
            args=(store_kind, bucket_root, table, w, barrier, out_q),
        )
        for w in range(N_WORKERS)
    ]
    for p in procs:
        p.start()
    results = {}
    for _ in range(N_WORKERS):
        wid, won = out_q.get(timeout=120)
        results[wid] = won
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0

    # the parent must read through the same store the workers wrote to
    if store_kind == "mutex":
        from tests.mutex_store import MutexPublishLogStore

        TX.register_log_store(str(tmp_path), MutexPublishLogStore(bucket_root))
    try:
        total = N_WORKERS * N_COMMITS
        # every version claimed exactly once, none lost to a retry
        all_won = [v for won in results.values() for v in won]
        assert None not in all_won, "a retry was swallowed as a no-op"
        assert sorted(all_won) == list(range(total))
        # per-writer serializability: later commits land at later versions
        for won in results.values():
            assert won == sorted(won)
        # the replayed log agrees: each (worker, seq) exactly once, at the
        # version its writer believes it won
        hist = TX.tx_history(table)
        assert [h["version"] for h in hist] == list(range(total))
        seen = {(h["meta"]["worker"], h["meta"]["seq"]): h["version"]
                for h in hist}
        assert len(seen) == total
        for wid, won in results.items():
            for i, v in enumerate(won):
                assert seen[(wid, i)] == v
        # contended checkpoints resolved: snapshot replays to the head
        assert TX.tx_snapshot(table)["version"] == total - 1
        cps = TX._list_log(table)[1]
        assert cps, "checkpoint interval crossings must leave checkpoints"
    finally:
        if store_kind == "mutex":
            TX._STORES.pop(str(tmp_path), None)
