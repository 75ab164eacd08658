"""Object-store emulation DataStore shared by the txlog suite and the
warehouse pipeline suite (and any future suite that must prove its IO
goes through the DataStore seam).

`BucketFSDataStore` keeps every data byte in a 'bucket' directory
OUTSIDE the table root: keys, not paths. Publish is a whole-object COPY
(object stores have no rename), delete is per-key (no empty-dir
pruning), listing is a key-prefix scan, and `put_atomic` is a per-key
atomic PUT. The table root itself never holds a data byte — only
`_txn_log` — so any code path that bypasses the DataStore protocol
fails loudly: the file it expects under the table root does not exist.
"""

from __future__ import annotations

import os
import shutil
import uuid

from weather_data_warehouse_aws_spark.operators.txlog import DataStore


class BucketFSDataStore(DataStore):
    """See module docstring. Picklable (holds just the bucket path), as
    the DataStore protocol requires."""

    def __init__(self, bucket: str):
        self.bucket = bucket

    def _prefix(self, table_root: str) -> str:
        return os.path.join(
            self.bucket, os.path.abspath(table_root).lstrip(os.sep)
        )

    def _key(self, table_root: str, rel: str) -> str:
        return os.path.join(self._prefix(table_root), rel)

    def stage_uri(self, table_root: str) -> str:
        return os.path.join(
            self.bucket, "_stage",
            os.path.abspath(table_root).lstrip(os.sep), uuid.uuid4().hex,
        )

    def list_stage(self, stage_uri: str) -> list[str]:
        rels = []
        for dirpath, _dirs, names in os.walk(stage_uri):
            sub = os.path.relpath(dirpath, stage_uri)
            prefix = "" if sub == "." else sub + "/"
            rels.extend(prefix + n for n in names if n.endswith(".parquet"))
        return sorted(rels)

    def publish(self, table_root, stage_uri, staged_rel, rel) -> None:
        dst = self._key(table_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        # COPY, never rename: the object-store publish primitive
        shutil.copyfile(os.path.join(stage_uri, staged_rel), dst)

    def discard_stage(self, table_root, stage_uri) -> None:
        shutil.rmtree(stage_uri, ignore_errors=True)

    def sweep_stages(self, table_root) -> None:
        shutil.rmtree(
            os.path.join(
                self.bucket, "_stage",
                os.path.abspath(table_root).lstrip(os.sep),
            ),
            ignore_errors=True,
        )

    def delete(self, table_root, rel) -> None:
        try:
            os.remove(self._key(table_root, rel))
        except FileNotFoundError:
            pass

    def exists(self, table_root, rel) -> bool:
        return os.path.exists(self._key(table_root, rel))

    def list_files(self, table_root) -> list[str]:
        root = self._prefix(table_root)
        out = []
        for dirpath, _dirs, names in os.walk(root):
            sub = os.path.relpath(dirpath, root)
            prefix = "" if sub == "." else sub + "/"
            out.extend(prefix + n for n in names if n.endswith(".parquet"))
        return sorted(out)

    def read_uri(self, table_root, rel) -> str:
        return self._key(table_root, rel)

    def scan_uri_root(self, table_root) -> str:
        return "file:" + self._prefix(table_root).rstrip("/") + "/"

    def spark_base_path(self, table_root) -> str:
        return self._prefix(table_root)

    def open_input(self, table_root, rel):
        return open(self._key(table_root, rel), "rb")

    def put_atomic(self, table_root, rel, payload) -> str:
        dst = self._key(table_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, dst)  # per-key atomic PUT
        return dst
