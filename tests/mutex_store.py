"""Object-store LOG plane emulation with Delta-on-S3 physics.

`MutexPublishLogStore` claims each entry with a per-name mutex (mkdir —
the DynamoDB conditional-write role in Delta's S3 LogStore) and then
publishes the payload as a whole object (atomic rename — the S3 PUT).
Between claim and publish there is a REAL visibility gap, deliberately
widened by a tiny sleep: a loser that observed the claim can read the
entry before it is visible, which must surface as a plain lost race
(retry), never as corruption. `spark_uri` stays None, so planning over
tables logged here exercises the checkpoint spool path too.

This is the cross-process twin of the in-memory store in test_txlog.py:
state lives on the filesystem, so SEPARATE OS PROCESSES can hammer the
same log — the hard-link store and this one have different failure
physics (single metadata op vs claim+publish) and both must serialize
commits exactly."""

from __future__ import annotations

import os
import random
import time
import uuid

from weather_data_warehouse_aws_spark.operators.txlog import LogStore


class MutexPublishLogStore(LogStore):
    def __init__(self, root: str):
        self.root = root

    def _dir(self, log_dir: str) -> str:
        return os.path.join(self.root, os.path.abspath(log_dir).lstrip(os.sep))

    def put_if_absent(self, log_dir: str, name: str, payload: str) -> bool:
        return self.put_if_absent_bytes(log_dir, name, payload.encode())

    def put_if_absent_bytes(self, log_dir: str, name: str,
                            payload: bytes) -> bool:
        d = self._dir(log_dir)
        os.makedirs(d, exist_ok=True)
        try:
            os.mkdir(os.path.join(d, f".claim-{name}"))  # the mutex
        except FileExistsError:
            return False
        # visibility gap: the claim exists, the object does not (yet)
        time.sleep(random.uniform(0.0, 0.002))
        tmp = os.path.join(d, f".pub-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(d, name))  # atomic whole-object PUT
        return True

    def list(self, log_dir: str) -> list[str]:
        d = self._dir(log_dir)
        if not os.path.isdir(d):
            return []
        return sorted(n for n in os.listdir(d) if not n.startswith("."))

    def read(self, log_dir: str, name: str) -> str:
        with open(os.path.join(self._dir(log_dir), name)) as f:
            return f.read()

    def read_bytes(self, log_dir: str, name: str) -> bytes:
        with open(os.path.join(self._dir(log_dir), name), "rb") as f:
            return f.read()

    def delete(self, log_dir: str, name: str) -> None:
        d = self._dir(log_dir)
        for p in (os.path.join(d, name), os.path.join(d, f".claim-{name}")):
            try:
                os.remove(p) if not os.path.isdir(p) else os.rmdir(p)
            except FileNotFoundError:
                pass
