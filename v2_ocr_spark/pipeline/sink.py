"""Transactional per-partition merge sink — the Iceberg MERGE stand-in.

This sandbox ships no Iceberg runtime jar, so the sink reproduces the
semantics the engine needs from Iceberg (and that the reference gets
from Postgres upserts keyed (document_id, page_number, user_id),
results-service.ts:125,137):

  * idempotent writes keyed on a logical partition id — re-running a
    partition replaces its files, never duplicates rows;
  * atomic visibility — a partition's files become readable only when
    its commit marker lands (os.rename is atomic on POSIX), the
    file-level analog of an Iceberg snapshot commit;
  * lineage + metrics per commit (snapshot_id, run_id, row counts,
    char counts, timing) — FIXTURES.md §3 metrics schema.

Layout:
    out/
      data/pid=<N>/part-*.parquet     (staged by Spark, then promoted)
      _staging/<run>/pid=<N>/...      (invisible until promoted)
      _commits/<N>.json               (atomic marker: snapshot + metrics)
      _checkpoints/<N>.json           (claim-state machine, Q1/Q2)

On a real cluster the same call sites target Iceberg:
``MERGE INTO extracted t USING updates s ON t.conv_id = s.conv_id AND
t.turn_idx = s.turn_idx WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED
THEN INSERT ...`` — only this module changes.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

# 7-status lifecycle, reference types/index.ts:33
QUEUED, PROCESSING, COMPLETED, ERROR = "queued", "processing", "completed", "error"


class CheckpointStore:
    """Per-partition state machine with crash recovery (Q1/Q2).

    State transitions mirror document-status-utils.ts:13-42: moving to
    a non-error state clears the error field and stamps updated_at.
    """

    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_checkpoints")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, pid: int) -> str:
        return os.path.join(self.dir, f"{pid}.json")

    def get(self, pid: int) -> dict:
        try:
            with open(self._path(pid), encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return {"partition_id": pid, "status": QUEUED, "attempt": 0,
                    "run_id": None, "started_at": None, "completed_at": None,
                    "snapshot_id": None, "error": None}

    def set(self, pid: int, **updates) -> dict:
        state = self.get(pid)
        state.update(updates)
        if state["status"] != ERROR:
            state["error"] = updates.get("error")
        state["updated_at"] = time.time()
        tmp = self._path(pid) + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(state, f)
        os.replace(tmp, self._path(pid))
        return state

    def recover(self) -> list[int]:
        """Q2 (queue-manager.ts:53-61): on startup, any partition left
        'processing' by a crashed run is reset to 'queued' — safe
        because the sink is idempotent."""
        reset = []
        for fn in os.listdir(self.dir):
            if not fn.endswith(".json"):
                continue
            pid = int(fn[:-5])
            if self.get(pid)["status"] == PROCESSING:
                self.set(pid, status=QUEUED)
                reset.append(pid)
        return reset


class MergeSink:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.commits_dir = os.path.join(out_dir, "_commits")
        self.staging_root = os.path.join(out_dir, "_staging")
        for d in (self.data_dir, self.commits_dir, self.staging_root):
            os.makedirs(d, exist_ok=True)

    # -- read side ---------------------------------------------------------

    def committed(self) -> dict[int, dict]:
        out = {}
        for fn in os.listdir(self.commits_dir):
            if fn.endswith(".json"):
                with open(os.path.join(self.commits_dir, fn), encoding="utf-8") as f:
                    out[int(fn[:-5])] = json.load(f)
        return out

    def committed_paths(self) -> list[str]:
        return [
            os.path.join(self.data_dir, f"pid={pid}")
            for pid in sorted(self.committed())
            if os.path.isdir(os.path.join(self.data_dir, f"pid={pid}"))
        ]

    def read(self, spark):
        paths = self.committed_paths()
        if not paths:
            raise FileNotFoundError(f"no committed partitions under {self.out_dir}")
        return spark.read.option("basePath", self.data_dir).parquet(*paths)

    # -- write side ----------------------------------------------------------

    def staging_dir(self, run_id: str) -> str:
        return os.path.join(self.staging_root, run_id)

    def promote(self, run_id: str, pid: int, metrics: dict) -> dict:
        """Atomically publish one partition: swap its data dir into
        place, then drop the commit marker (the 'snapshot')."""
        src = os.path.join(self.staging_dir(run_id), f"pid={pid}")
        if not os.path.isdir(src):
            # partition produced no rows — publish an empty dir
            os.makedirs(src, exist_ok=True)
        dst = os.path.join(self.data_dir, f"pid={pid}")
        old = dst + f".old.{uuid.uuid4().hex[:8]}"
        if os.path.isdir(dst):
            os.replace(dst, old)
        os.replace(src, dst)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)

        commit = {
            "snapshot_id": uuid.uuid4().hex,
            "run_id": run_id,
            "partition_id": pid,
            "committed_at": time.time(),
            "metrics": metrics,
        }
        tmp = os.path.join(self.commits_dir, f"{pid}.json.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(commit, f)
        os.replace(tmp, os.path.join(self.commits_dir, f"{pid}.json"))
        return commit

    def metrics_rows(self) -> list[dict]:
        """Flattened lineage/metrics table (FIXTURES.md §3)."""
        rows = []
        for pid, c in sorted(self.committed().items()):
            row = {"run_id": c["run_id"], "partition_id": pid,
                   "snapshot_id": c["snapshot_id"]}
            row.update(c.get("metrics", {}))
            rows.append(row)
        return rows
