"""Sidecar commit log for the parquet CDF emulation.

Runtimes without delta-spark degrade ``delta`` writes to parquet, so
there is no ``_delta_log`` for ``expose_cdf`` to read commit versions
from (reference ``terminators/cdf_processor.py:59-87`` gets true
versions from the Delta log). This module is the emulation's stand-in:
every engine APPEND to a degraded-delta location records one commit
entry — ``{version, ts, files added}`` — in ``_cdf_commits.json`` next
to the data (underscore-prefixed: Spark scans ignore it). Two appends
between materializations therefore yield two ``_commit_version``s, per
Delta semantics, instead of collapsing into one per materialization.

Cost model (why this scales): the log is written per COMMIT, not per
row — one recursive file listing plus one small JSON read-modify-write,
the same control-plane class as Delta's own log append. Reading it back
is a driver-side parse bounded by append count, turned into a small
file→version frame that broadcast-joins against the stream's
``_metadata.file_path``.

Limitations mirror the emulation's: append-only (rewrites invalidate
file identity), only writes that go THROUGH the engine's writers are
logged — foreign appends fall back to the materialization-counter
versioning in ``terminator_factory`` — and the log's
read-modify-write targets ONE writer per table (the same contract as
the parquet merge fallback's overwrite; real Delta gets multi-writer
safety from atomic log commits, which raw object stores cannot
provide). Since round 13 that contract is ENFORCED best-effort by
``io/table_lock.WriterLock``: two engine writers racing the log
SERIALIZE through a short retry budget; persistent contention skips
the entry with a warning (never failing the already-landed data write
— the skipped files sweep into the next commit's entry).
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional

from pyspark.sql import SparkSession

_LOGGER = logging.getLogger(__name__)

LOG_NAME = "_cdf_commits.json"


def _fs_and_path(spark: SparkSession, location: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(location)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path, jvm


def _normalize(p: str) -> str:
    """Scheme-insensitive path identity: ``file:/x``, ``file:///x`` and
    ``/x`` all name the same local file."""
    if p.startswith("file:"):
        p = p[len("file:") :]
        while p.startswith("//"):
            p = p[1:]
    return p


def _list_data_files(spark: SparkSession, location: str) -> List[str]:
    """Recursive listing of data files under ``location``, skipping
    underscore/dot-prefixed names at every level (Spark's own ignore
    rule) — one control-plane walk per commit."""
    fs, root, _ = _fs_and_path(spark, location)
    if not fs.exists(root):
        return []
    out: List[str] = []
    stack = [root]
    while stack:
        cur = stack.pop()
        for st in fs.listStatus(cur):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            else:
                out.append(_normalize(st.getPath().toString()))
    return out


def read_log(spark: SparkSession, location: str) -> Optional[list]:
    """The commit entries at ``location``, or None when no log exists."""
    fs, _, jvm = _fs_and_path(spark, location)
    log_path = jvm.org.apache.hadoop.fs.Path(
        location.rstrip("/") + "/" + LOG_NAME
    )
    if not fs.exists(log_path):
        return None
    stream = fs.open(log_path)
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    try:
        entries = json.loads(raw)
    except ValueError:
        _LOGGER.warning("cdf commit log at %s is unreadable; ignoring", location)
        return None
    return entries if isinstance(entries, list) else None


def _write_log(spark: SparkSession, location: str, entries: list) -> None:
    fs, _, jvm = _fs_and_path(spark, location)
    log_path = jvm.org.apache.hadoop.fs.Path(
        location.rstrip("/") + "/" + LOG_NAME
    )
    out = fs.create(log_path, True)
    try:
        out.write(json.dumps(entries).encode("utf-8"))
    finally:
        out.close()


def record_commit(spark: SparkSession, location: str, mode: str) -> None:
    """Record one commit at ``location``: the data files present now that
    no earlier entry claims. ``mode=='overwrite'`` restarts file history
    (the old files are gone) but keeps the version counter monotone,
    matching Delta's numbering across overwrites.

    Concurrency: the read-modify-write runs under the best-effort
    :class:`~lakehouse_engine_spark.io.table_lock.WriterLock` with a
    default ~2 s retry budget (40 × 50 ms). The hold time is NOT just
    milliseconds on every table — the holder runs read_log, a recursive
    data-file listing, and the log overwrite under the lock, which on a
    large/many-file directory can exceed the default budget, making
    version collapse routine there. Size the budget to the table via
    ``LHE_CDF_LOCK_RETRIES`` (retry count, 50 ms apart) for
    large-directory tables with concurrent appenders. If contention
    persists past the budget, this function WARNS and skips — it must
    never fail the data write it annotates: by the time it runs, the
    append has already landed, so raising could only trigger a retry
    that duplicates data. A skipped entry is safe by construction:
    files no entry claims are swept into the NEXT commit's entry (two
    appends collapse into one version — the documented pre-sidecar
    fallback), or stamped version 0 by the materialization counter."""
    from lakehouse_engine_spark.io.table_lock import (
        ConcurrentWriterError,
        WriterLock,
    )

    try:
        retries = int(os.environ.get("LHE_CDF_LOCK_RETRIES", "40") or 40)
        if retries < 0:  # negatives are as invalid as garbage strings:
            retries = 40  # don't silently zero the budget (0 IS valid:
            # "don't wait at all")
    except ValueError:
        retries = 40
    try:
        with WriterLock(
            spark, location, op="cdf_commit", acquire_retries=retries
        ) as lk:
            _record_commit_locked(spark, location, mode, lk)
    except ConcurrentWriterError as exc:
        _LOGGER.warning(
            "cdf commit log at %s contended past the retry budget — "
            "skipping this entry (files will be swept into the next "
            "commit): %s",
            location,
            exc,
        )
    except Exception as exc:  # pragma: no cover - defensive
        _LOGGER.warning("cdf commit log update failed at %s: %s", location, exc)


def _record_commit_locked(spark, location: str, mode: str, lock) -> None:
    import datetime as _dt

    entries = read_log(spark, location) or []
    if mode == "overwrite":
        known: set = set()
        prev_max = max((e.get("version", 0) for e in entries), default=0)
        entries = []
    else:
        known = {f for e in entries for f in e.get("files", [])}
        prev_max = max((e.get("version", 0) for e in entries), default=0)
    current = _list_data_files(spark, location)
    new = sorted(f for f in current if f not in known)
    if not new:
        return
    # epoch millis, not wall-clock text: a naive local string re-parsed
    # by F.to_timestamp in the SESSION timezone skews _commit_timestamp
    # by the offset whenever spark.sql.session.timeZone differs from
    # the driver OS zone; millis are zone-free and read back with
    # timestamp_millis. "ts" kept for human inspection only (UTC).
    now = _dt.datetime.now(_dt.timezone.utc)
    entries.append(
        {
            "version": prev_max + 1,
            "ts": now.strftime("%Y-%m-%d %H:%M:%S UTC"),
            "ts_ms": int(now.timestamp() * 1000),
            "files": new,
        }
    )
    lock.verify()  # detect a mid-flight lock steal before the overwrite
    _write_log(spark, location, entries)
