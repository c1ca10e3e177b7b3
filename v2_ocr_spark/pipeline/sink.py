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


class LeaseHeld(RuntimeError):
    """Another live driver owns this sink."""


class SinkLease:
    """Cross-process ownership lease for a sink directory.

    The claim loop's CheckpointStore get+set is atomic per FILE but not
    across processes: two drivers pointed at one sink could both see
    'queued' and both stage/promote the same partition. The lease makes
    ownership explicit: one `_lease.json`, created with O_CREAT|O_EXCL
    (atomic on POSIX), carrying owner id + heartbeat. A second driver's
    acquire() fails with LeaseHeld while the heartbeat is fresh; a
    lease whose heartbeat is older than ttl_seconds is presumed crashed
    and may be taken over. The takeover itself is serialized through an
    O_EXCL marker named deterministically from the stale lease's exact
    content — every racer computes the same name, so the filesystem
    grants it to exactly one (a write-then-confirm would be
    check-then-act: two racers whose write/read pairs don't interleave
    both 'confirm').

    Every read-decide-write on the lease runs under an flock(2) on a
    sidecar `_lease.json.lock`, which makes acquire / heartbeat /
    takeover / release mutually atomic on local/POSIX filesystems:
    a racer can never observe the winner's momentarily-empty O_EXCL
    file, and a paused owner resuming past ttl re-reads the lease
    under the lock and sees the takeover before it can clobber it.
    The lease also carries a monotonically increasing `gen` fencing
    token (takeover = stale gen + 1); heartbeat() refuses to write
    over a higher generation or a different owner.

    Honest scope: flock + rename-CAS is solid on local/POSIX
    filesystems and sufficient for the one-driver-per-sink contract.
    On filesystems without real flock semantics (some NFS mounts) the
    lock degrades to advisory-only and a heartbeat that raced a
    takeover could still land between that takeover's read and write —
    the gen fence narrows but cannot close that window without a
    server-side CAS. On a real lakehouse the equivalent fencing is
    Iceberg's optimistic snapshot commit (CAS on table metadata),
    which rejects the loser's commit rather than its claim."""

    def __init__(self, out_dir: str, owner: str | None = None,
                 ttl_seconds: float = 600.0):
        import socket

        self.path = os.path.join(out_dir, "_lease.json")
        self.owner = owner or (
            f"{socket.gethostname()}:{os.getpid()}:{uuid.uuid4().hex[:6]}"
        )
        self.ttl = ttl_seconds
        self.gen = 0

    def _locked(self):
        """Exclusive flock on the sidecar lock file for the duration of
        one lease read-decide-write."""
        import contextlib
        import fcntl

        @contextlib.contextmanager
        def cm():
            fd = os.open(self.path + ".lock", os.O_CREAT | os.O_WRONLY)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)

        return cm()

    def _read(self) -> dict | None:
        try:
            with open(self.path, encoding="utf-8") as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _write(self) -> None:
        tmp = self.path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {"owner": self.owner, "heartbeat": time.time(),
                 "gen": self.gen},
                f,
            )
        os.replace(tmp, self.path)

    def acquire(self) -> "SinkLease":
        # one retry covers the release-between-open-and-read race: the
        # holder removed the lease after our O_EXCL failed, so a second
        # pass creates it cleanly
        for attempt in (0, 1):
            with self._locked():
                try:
                    fd = os.open(
                        self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                    )
                except FileExistsError:
                    cur = self._read()
                    if cur is None:
                        if not os.path.exists(self.path):
                            continue  # released mid-race — retry create
                        # file exists but is unreadable: NEVER treat as
                        # ours (the old code did, letting a racer steal
                        # a winner's momentarily-empty lease on
                        # non-flock filesystems) — presume held
                        raise LeaseHeld(
                            f"lease file at {self.path} exists but is "
                            "unreadable (winner mid-create or corrupt); "
                            "presumed held"
                        )
                    if cur.get("owner") == self.owner:
                        # our own lease (reentrant) — refresh it
                        self.gen = max(self.gen, int(cur.get("gen", 0)))
                        self._write()
                        return self
                    age = time.time() - float(cur.get("heartbeat", 0))
                    if age < self.ttl:
                        raise LeaseHeld(
                            f"sink lease at {self.path} held by "
                            f"{cur.get('owner')} (heartbeat {age:.0f}s "
                            f"ago, ttl {self.ttl:.0f}s)"
                        )
                    # STALE lease: under flock the takeover is already
                    # serialized; the O_EXCL marker (named from the
                    # exact stale content, so every racer computes the
                    # same name and the filesystem grants exactly one)
                    # keeps single-winner semantics even where flock is
                    # advisory-only. A marker left by a crashed winner
                    # expires after ttl and is cleared for the next
                    # attempt.
                    tag = f"{cur.get('owner')}@{cur.get('heartbeat')}"
                    marker = (
                        self.path
                        + ".takeover."
                        + uuid.uuid5(uuid.NAMESPACE_URL, tag).hex[:16]
                    )
                    try:
                        mfd = os.open(
                            marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                        )
                    except FileExistsError:
                        if time.time() - os.path.getmtime(marker) >= self.ttl:
                            try:
                                os.remove(marker)  # crashed winner
                            except FileNotFoundError:
                                pass
                        raise LeaseHeld(
                            f"takeover of stale lease at {self.path} "
                            "already claimed by another driver"
                        )
                    os.close(mfd)
                    try:
                        # fencing token: strictly above the stale lease
                        self.gen = int(cur.get("gen", 0)) + 1
                        self._write()
                    finally:
                        try:
                            os.remove(marker)
                        except FileNotFoundError:
                            pass
                    return self
                else:
                    self.gen = max(self.gen, 0) + 1
                    with os.fdopen(fd, "w", encoding="utf-8") as f:
                        json.dump(
                            {"owner": self.owner, "heartbeat": time.time(),
                             "gen": self.gen},
                            f,
                        )
                    return self
        raise LeaseHeld(
            f"lease at {self.path} kept vanishing mid-acquire; giving up"
        )

    def heartbeat(self) -> None:
        with self._locked():
            cur = self._read()
            if (
                cur is None
                or cur.get("owner") != self.owner
                or int(cur.get("gen", 0)) > self.gen
            ):
                raise LeaseHeld(
                    f"lease at {self.path} no longer owned by {self.owner}"
                )
            self._write()

    def release(self) -> None:
        with self._locked():
            cur = self._read()
            if cur is not None and cur.get("owner") == self.owner:
                try:
                    os.remove(self.path)
                except FileNotFoundError:
                    pass

    def __enter__(self) -> "SinkLease":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()


def held_lease(out_dir: str, ttl_seconds: float = 600.0):
    """Acquire the sink lease AND keep it heartbeat-fresh for the whole
    block — the ownership wrapper every sink MUTATOR runs under (the
    extraction job, all maintenance rewrites, the streaming landing
    loop). A long Spark stage must never look like a dead owner and
    get taken over mid-write; conversely, if the lease IS lost to a
    takeover anyway, the yielded Event is set so the caller can refuse
    to promote. Yields (lease, lost_event). The beat interval is capped
    at ttl/2 — the old max(ttl/3, 1.0) floor let a sub-1.5s ttl sleep
    PAST its own ttl, so a rival could take over a live owner between
    beats."""
    import contextlib
    import threading

    @contextlib.contextmanager
    def cm():
        lease = SinkLease(out_dir, ttl_seconds=ttl_seconds).acquire()
        stop = threading.Event()
        lost = threading.Event()
        interval = min(max(ttl_seconds / 3.0, 1.0), ttl_seconds / 2.0)

        def _beat() -> None:
            while not stop.wait(interval):
                try:
                    lease.heartbeat()
                except Exception:  # noqa: BLE001 — lost to a takeover
                    lost.set()
                    return

        beater = threading.Thread(target=_beat, daemon=True)
        beater.start()
        try:
            yield lease, lost
        finally:
            stop.set()
            beater.join(timeout=5)
            lease.release()

    return cm()


class MergeSink:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.commits_dir = os.path.join(out_dir, "_commits")
        self.staging_root = os.path.join(out_dir, "_staging")
        for d in (self.data_dir, self.commits_dir, self.staging_root):
            os.makedirs(d, exist_ok=True)

    # -- table metadata ----------------------------------------------------

    def ensure_num_partitions(self, num_partitions: int | None) -> int:
        """Pin the table's logical partition count at first write and
        VALIDATE every later caller against it — re-hashing conv_id
        under a different count scatters rows into partitions that are
        never promoted (silent data loss). Pass None to adopt the
        stored value."""
        path = os.path.join(self.out_dir, "_table.json")
        try:
            with open(path, encoding="utf-8") as f:
                stored = int(json.load(f)["num_partitions"])
        except FileNotFoundError:
            stored = None
        if stored is None:
            if num_partitions is None:
                raise ValueError(
                    f"no table metadata at {path} and no num_partitions given"
                )
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump({"num_partitions": int(num_partitions)}, f)
            os.replace(tmp, path)
            return int(num_partitions)
        if num_partitions is not None and int(num_partitions) != stored:
            raise ValueError(
                f"table at {self.out_dir} was written with "
                f"num_partitions={stored}; caller passed {num_partitions} — "
                "re-hashing under a different count would lose rows"
            )
        return stored

    # -- read side ---------------------------------------------------------

    def committed(self) -> dict[int, dict]:
        out = {}
        for fn in os.listdir(self.commits_dir):
            if fn.endswith(".json"):
                with open(os.path.join(self.commits_dir, fn), encoding="utf-8") as f:
                    out[int(fn[:-5])] = json.load(f)
        return out

    def recover_partials(self, grace_seconds: float = 60.0) -> list[int]:
        """Heal promote()'s crash window: a committed pid whose data
        dir is missing but whose pre-swap '.old' dir survives rolls
        back to that prior snapshot (its commit marker still describes
        it). Orphaned '.old' dirs next to a live data dir are cleanup
        leftovers and are removed.

        '.old' dirs YOUNGER than grace_seconds are left alone — they
        most likely belong to an in-flight promote() in another
        process, and restoring (or deleting) them mid-swap would make
        the promoter's second rename fail. Pass grace_seconds=0 only
        from a context that owns the sink exclusively (job start)."""
        import glob

        restored = []
        now = time.time()
        for pid in self.committed():
            dst = os.path.join(self.data_dir, f"pid={pid}")
            olds = sorted(glob.glob(dst + ".old.*"), key=os.path.getmtime)
            olds = [
                o for o in olds
                if now - os.path.getmtime(o) >= grace_seconds
            ]
            if os.path.isdir(dst):
                for o in olds:
                    shutil.rmtree(o, ignore_errors=True)
                continue
            if olds:
                os.replace(olds[-1], dst)
                for o in olds[:-1]:
                    shutil.rmtree(o, ignore_errors=True)
                restored.append(pid)
        return restored

    def committed_paths(self) -> list[str]:
        self.recover_partials()
        paths = []
        for pid in sorted(self.committed()):
            p = os.path.join(self.data_dir, f"pid={pid}")
            if not os.path.isdir(p):
                # a committed pid ALWAYS has a dir (promote publishes an
                # empty one for row-less partitions) — missing means
                # corruption; surfacing beats silently returning a
                # partial table
                raise RuntimeError(
                    f"committed partition pid={pid} has no data dir under "
                    f"{self.data_dir} and no recoverable .old snapshot"
                )
            paths.append(p)
        return paths

    def record_schema(self, schema) -> None:
        """Persist the table schema (incl. the pid partition column)
        next to the table metadata. Writers call this before staging;
        read() then works even when EVERY committed partition is empty
        (a retention pass that matches everything leaves only empty
        pid dirs — parquet inference has no footer to read and would
        raise, making a legitimately emptied table unreadable and
        un-repopulatable since merge_upsert reads before it writes)."""
        path = os.path.join(self.out_dir, "_schema.json")
        tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(schema.json())
        os.replace(tmp, path)

    def stored_schema(self):
        try:
            with open(
                os.path.join(self.out_dir, "_schema.json"), encoding="utf-8"
            ) as f:
                from pyspark.sql.types import StructType

                return StructType.fromJson(json.load(f))
        except FileNotFoundError:
            return None

    def read(self, spark):
        paths = self.committed_paths()
        if not paths:
            raise FileNotFoundError(f"no committed partitions under {self.out_dir}")
        reader = spark.read.option("basePath", self.data_dir)
        schema = self.stored_schema()
        if schema is not None:
            # explicit schema: no footer inference (cheaper listing at
            # many-partition scale, and the only way an all-empty table
            # stays readable); pid is parsed from the dir names
            reader = reader.schema(schema)
        return reader.parquet(*paths)

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
        # the pre-swap snapshot is deleted ONLY after the new marker is
        # durable — a crash in any earlier window leaves either the new
        # dir (stale marker, idempotent rerun heals) or the .old dir
        # (recover_partials rolls back to the marker's snapshot)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)
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
