"""Object-store FileManager backend: S3-compatible delete/copy/move plus
archive (Glacier-style) restore.

Reference parity: ``core/s3_file_manager.py:129-307`` and
``core/dbfs_file_manager.py`` — collapsed into ONE backend over a minimal
injectable client protocol (the same pattern as the SFTP/SharePoint
connectors), so the logic is testable without credentials and portable to
any S3-compatible store. The default client is boto3 when importable.

Client protocol (duck-typed):

* ``list_objects(bucket, prefix) -> list[str]`` — recursive key listing
* ``delete_objects(bucket, keys) -> None`` — batch delete
* ``copy_object(src_bucket, src_key, dst_bucket, dst_key) -> None``
* ``restore_object(bucket, key, days, tier) -> None`` — archive restore
* ``restore_status(bucket, key) -> str`` — ``not_started|ongoing|restored``

"Directories" are prefixes: a source ending in ``/`` (or matching several
keys) fans out per key, preserving the relative suffix on copy — identical
semantics to the reference's ``_list_objects_recursively`` fan-out.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional

_LOGGER = logging.getLogger(__name__)


def default_client():  # pragma: no cover - requires boto3 + credentials
    """boto3-backed client implementing the protocol above."""
    try:
        import boto3
    except ImportError as e:
        raise NotImplementedError(
            "object-store operations need boto3 (or inject a client)"
        ) from e

    class _Boto3Client:
        def __init__(self) -> None:
            self._s3 = boto3.client("s3")

        def list_objects(self, bucket: str, prefix: str) -> List[str]:
            keys, token = [], None
            while True:
                kw = {"Bucket": bucket, "Prefix": prefix}
                if token:
                    kw["ContinuationToken"] = token
                resp = self._s3.list_objects_v2(**kw)
                keys += [o["Key"] for o in resp.get("Contents", [])]
                token = resp.get("NextContinuationToken")
                if not token:
                    return keys

        def delete_objects(self, bucket: str, keys: List[str]) -> None:
            for i in range(0, len(keys), 1000):  # API batch limit
                self._s3.delete_objects(
                    Bucket=bucket,
                    Delete={"Objects": [{"Key": k} for k in keys[i : i + 1000]]},
                )

        def copy_object(self, sb: str, sk: str, db: str, dk: str) -> None:
            self._s3.copy_object(
                Bucket=db, Key=dk, CopySource={"Bucket": sb, "Key": sk}
            )

        def restore_object(self, bucket: str, key: str, days: int, tier: str) -> None:
            self._s3.restore_object(
                Bucket=bucket,
                Key=key,
                RestoreRequest={
                    "Days": days,
                    "GlacierJobParameters": {"Tier": tier},
                },
            )

        def restore_status(self, bucket: str, key: str) -> str:
            head = self._s3.head_object(Bucket=bucket, Key=key)
            restore = head.get("Restore")
            if restore is None:
                return "not_started"
            return "ongoing" if 'ongoing-request="true"' in restore else "restored"

    return _Boto3Client()


class ObjectStoreFileManager:
    """Executes one object-store file-management function from an ACON."""

    def __init__(self, configs: Dict[str, Any], client: Any = None):
        self.configs = configs
        self.client = client if client is not None else default_client()

    # ---------------------------------------------------------------- ops
    def _expand(self, bucket: str, path: str) -> List[str]:
        """A path is an exact key, or a 'directory' (delimiter-aware prefix).

        Directory expansion always appends the ``/`` delimiter before
        listing, so ``data`` never swallows ``database/...`` — only an
        exact-key match or children under ``data/`` qualify (the
        reference's ``_check_directory``/``get_directory_path`` behavior).
        """
        path = path.strip().lstrip("/")
        if not path.endswith("/"):
            listed = self.client.list_objects(bucket, path)
            if path in listed:
                return [path]
        children = self.client.list_objects(bucket, path.rstrip("/") + "/")
        return children if children else [path]

    def delete_objects(self) -> Optional[dict]:
        bucket = self.configs["bucket"]
        paths = self.configs["object_paths"]
        keys = [k for p in paths for k in self._expand(bucket, p)]
        if self.configs.get("dry_run"):
            _LOGGER.info("dry run - would delete: %s", keys)
            return {bucket: keys}
        self.client.delete_objects(bucket, keys)
        return None

    def _copy(self) -> dict:
        """Copy the expanded source keys; return the src→dst plan.

        The plan is the single source of truth for any follow-up delete:
        re-expanding the source prefix after the copy would also match
        objects copied INTO a destination nested under the source (e.g.
        ``data/`` → ``data/archive/``) and keys created concurrently —
        deleting either would lose data.
        """
        sb = self.configs["bucket"]
        so = self.configs["source_object"].strip().lstrip("/")
        db = self.configs.get("destination_bucket", sb)
        do = self.configs["destination_object"].strip().lstrip("/")
        keys = self._expand(sb, so)
        plan = {
            k: do if k == so else do.rstrip("/") + "/" + k[len(so.rstrip("/")) :].lstrip("/")
            for k in keys
        }
        if self.configs.get("dry_run"):
            _LOGGER.info("dry run - would copy: %s", plan)
            return plan
        for src, dst in plan.items():
            self.client.copy_object(sb, src, db, dst)
        return plan

    def copy_objects(self) -> Optional[dict]:
        plan = self._copy()
        return plan if self.configs.get("dry_run") else None

    def move_objects(self) -> Optional[dict]:
        plan = self._copy()
        if self.configs.get("dry_run"):
            return plan
        # delete EXACTLY the keys the copy plan covered — never a fresh
        # prefix expansion (see _copy docstring)
        self.client.delete_objects(self.configs["bucket"], list(plan.keys()))
        return None

    # ------------------------------------------------------------- restore
    def request_restore(self) -> Optional[dict]:
        bucket = self.configs["bucket"]
        source = self.configs["source_object"]
        keys = self._expand(bucket, source)
        if self.configs.get("dry_run"):
            _LOGGER.info("dry run - would restore: %s", keys)
            return {bucket: keys}
        for k in keys:
            self.client.restore_object(
                bucket,
                k,
                int(self.configs.get("restore_expiration", 7)),
                self.configs.get("retrieval_tier", "Bulk"),
            )
        return None

    def check_restore_status(self) -> dict:
        bucket = self.configs["bucket"]
        keys = self._expand(bucket, self.configs["source_object"])
        counts = {"not_started_objects": 0, "ongoing_objects": 0, "restored_objects": 0}
        for k in keys:
            status = self.client.restore_status(bucket, k)
            if f"{status}_objects" not in counts:
                raise ValueError(
                    f"object-store client returned restore status {status!r}; "
                    "expected not_started | ongoing | restored"
                )
            counts[f"{status}_objects"] += 1
        counts["total_objects"] = len(keys)
        return counts

    def request_restore_to_destination_and_wait(self) -> Optional[dict]:
        """Restore, poll until every object is restored, then copy to the
        destination — the reference's convenience flow for pulling archived
        partitions back before a backfill."""
        plan = self.request_restore()
        if self.configs.get("dry_run"):
            return plan
        poll = float(self.configs.get("poll_interval_seconds", 300))
        # archive restores take hours, not days — a bounded wait turns a
        # server-side-stuck restore into an error instead of a hung driver
        deadline = time.monotonic() + float(
            self.configs.get("max_wait_seconds", 48 * 3600)
        )
        while True:
            status = self.check_restore_status()
            _LOGGER.info("restore status: %s", status)
            if status["restored_objects"] >= status["total_objects"]:
                break
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"restore did not complete within max_wait_seconds: {status}"
                )
            time.sleep(poll)
        return self._copy()

    # ------------------------------------------------------------ dispatch
    def execute(self) -> Any:
        fn = self.configs.get("function")
        ops = {
            "delete_objects": self.delete_objects,
            "copy_objects": self.copy_objects,
            "move_objects": self.move_objects,
            "request_restore": self.request_restore,
            "check_restore_status": self.check_restore_status,
            "request_restore_to_destination_and_wait": (
                self.request_restore_to_destination_and_wait
            ),
        }
        if fn not in ops:
            raise ValueError(f"ObjectStoreFileManager: unknown function {fn}")
        return ops[fn]()
