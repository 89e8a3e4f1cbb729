"""Best-effort writer lock for degraded-delta control-file mutations.

Real Delta serializes writers through ATOMIC log commits (reference
``io/writers/delta_merge_writer.py:28-210`` inherits that safety for
free). The parquet fallbacks cannot: the merge rewrite and the CDF
sidecar commit log (``io/cdf_commit_log.py``) both do read-modify-write
against plain files, which under two concurrent writers silently loses
one writer's work. This module narrows that window with the strongest
primitive a raw filesystem offers — ``FileSystem.create(path,
overwrite=False)``, an atomic create-or-fail on HDFS/local (and a
best-effort one on object stores) — and turns every detected collision
into a LOUD :class:`ConcurrentWriterError` instead of a silent
lost-update.

Guarantees (and their limits, mirrored from the merge fallback's
documented single-writer assumption):

- two writers racing for the lock: one wins, the other raises — on any
  filesystem with atomic create (HDFS, local POSIX). On S3-class stores
  create-overwrite=false is check-then-act, so a tight race can still
  slip through; this is strictly narrower than no lock at all.
- a writer whose lock was stolen mid-flight (a second writer treated it
  as stale, or deleted it manually) detects the foreign token at commit
  time via :meth:`WriterLock.verify` and raises BEFORE overwriting.
- a crashed writer's lock auto-expires after ``stale_after_s`` (the next
  writer logs a warning and replaces it), so the guard cannot deadlock
  an unattended pipeline.
"""

from __future__ import annotations

import json
import logging
import os
import time
import uuid
from typing import Optional

from pyspark.sql import SparkSession

_LOGGER = logging.getLogger(__name__)

LOCK_NAME = "_lhe_writer.lock"
DEFAULT_STALE_S = 3600.0


class ConcurrentWriterError(RuntimeError):
    """Another writer holds (or stole) the table's writer lock.

    Raised instead of proceeding with a read-modify-write that would
    silently drop the other writer's update. Remediation: serialize the
    writers (one engine job per degraded-delta table at a time — the
    documented contract), or, after a confirmed crash, delete the stale
    ``_lhe_writer.lock`` / wait out ``stale_after_s``.
    """


def _fs_path(spark: SparkSession, location: str, name: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(location.rstrip("/") + "/" + name)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path, jvm


def _read_lock(spark: SparkSession, location: str) -> Optional[dict]:
    fs, path, jvm = _fs_path(spark, location, LOCK_NAME)
    try:
        if not fs.exists(path):
            return None
        stream = fs.open(path)
        try:
            raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
        info = json.loads(raw)
        return info if isinstance(info, dict) else {}
    except Exception:  # unreadable/raced-away lock: treat as opaque
        return {}


class WriterLock:
    """Context manager holding the table's writer lock for one mutation.

    >>> with WriterLock(spark, location, op="merge"):
    ...     ...read-modify-write...

    ``verify()`` may be called immediately before the final overwrite to
    assert the lock still carries OUR token (detects mid-flight steals).
    The context exit releases the lock only when the token is still ours
    — a stolen lock belongs to the thief and is left alone.
    """

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        op: str = "write",
        stale_after_s: float = DEFAULT_STALE_S,
        acquire_retries: int = 0,
        retry_wait_s: float = 0.05,
    ):
        """``acquire_retries``/``retry_wait_s``: how long to WAIT for a
        live holder before declaring contention. Control-plane-only
        mutations whose hold time is milliseconds (the CDF commit log)
        pass a short retry budget so two back-to-back appends serialize
        instead of erroring; data-overwrite mutations (merge) keep the
        default 0 — waiting there just delays the inevitable conflict."""
        self._spark = spark
        self._location = location
        self._op = op
        self._stale_after_s = stale_after_s
        self._acquire_retries = max(0, int(acquire_retries))
        self._retry_wait_s = retry_wait_s
        self._token = uuid.uuid4().hex

    def __enter__(self) -> "WriterLock":
        fs, path, _ = _fs_path(self._spark, self._location, LOCK_NAME)
        # parent must exist for create(); the data write that follows
        # creates it anyway, so make it eagerly
        fs.mkdirs(path.getParent())
        payload = json.dumps(
            {
                "token": self._token,
                "op": self._op,
                "pid": os.getpid(),
                "acquired_unix": time.time(),
            }
        ).encode("utf-8")
        stale_takeover_done = False
        for attempt in range(1, self._acquire_retries + 3):
            try:
                out = fs.create(path, False)  # overwrite=False: atomic claim
                try:
                    out.write(payload)
                finally:
                    out.close()
                return self
            except Exception:
                holder = _read_lock(self._spark, self._location)
                if holder is None:
                    continue  # holder released between create() and read
                age = time.time() - float(holder.get("acquired_unix", 0) or 0)
                if attempt <= self._acquire_retries:
                    time.sleep(self._retry_wait_s)
                    continue
                if not stale_takeover_done and age > self._stale_after_s:
                    stale_takeover_done = True
                    _LOGGER.warning(
                        "writer lock at %s is stale (%.0fs old, holder pid "
                        "%s op %s) — replacing it; if that writer is alive, "
                        "its commit-time verify() will refuse to proceed",
                        self._location,
                        age,
                        holder.get("pid"),
                        holder.get("op"),
                    )
                    try:
                        fs.delete(path, False)
                    except Exception:
                        pass
                    continue
                raise ConcurrentWriterError(
                    f"concurrent writer detected at {self._location}: lock "
                    f"{LOCK_NAME} held by pid {holder.get('pid')} "
                    f"(op={holder.get('op')!r}, {age:.0f}s old). Degraded-"
                    "delta targets support ONE writer at a time (real Delta "
                    "serializes via atomic log commits); serialize the jobs, "
                    "or delete the lock file if that writer crashed."
                ) from None
        raise ConcurrentWriterError(
            f"could not claim writer lock at {self._location} after a stale "
            "takeover attempt — another writer is actively racing this one."
        )

    def verify(self) -> None:
        """Assert the lock still carries our token (call right before the
        destructive overwrite). A foreign token means another writer
        treated ours as stale and claimed the table mid-flight."""
        holder = _read_lock(self._spark, self._location)
        if holder is None or holder.get("token") != self._token:
            raise ConcurrentWriterError(
                f"writer lock at {self._location} was taken over mid-write "
                f"(now held by pid {(holder or {}).get('pid')!r}) — refusing "
                "to overwrite: the other writer's view of the table no "
                "longer includes this writer's base state."
            )

    def __exit__(self, exc_type, exc, tb) -> None:
        try:
            holder = _read_lock(self._spark, self._location)
            if holder is not None and holder.get("token") == self._token:
                fs, path, _ = _fs_path(self._spark, self._location, LOCK_NAME)
                fs.delete(path, False)
        except Exception:  # pragma: no cover - release is best-effort
            _LOGGER.warning(
                "failed to release writer lock at %s", self._location
            )
