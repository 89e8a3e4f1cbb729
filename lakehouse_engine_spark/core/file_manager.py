"""FileManager — object delete/copy/move operations.

Reference parity: ``core/file_manager.py`` dispatch over
``core/s3_file_manager.py`` / ``core/dbfs_file_manager.py`` (op schema
``core/definitions.py:1929-1969``). Two backends: local POSIX paths here,
and the S3-compatible :mod:`~lakehouse_engine_spark.core.object_store`
backend (delete/copy/move + archive restore) selected whenever the ACON
names a ``bucket`` — with an injectable client, so no cloud credentials
are needed to test it.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any


class FileManager:
    """Executes one file-management function from an ACON."""

    def __init__(self, acon: dict, client: Any = None):
        self.acon = acon
        self.function = acon.get("function")
        self.client = client

    def execute(self) -> Any:
        if self.client is not None and hasattr(self.client, "fs"):
            # a dbutils-shaped client (``client.fs.cp/ls/mv/rm``) selects
            # the DBFS backend — the injectable seam standing in for
            # Databricks' dbutils, like the S3 backend's injectable store
            return DbfsFileManager(self.acon, self.client).execute()
        if self.acon.get("bucket"):
            from lakehouse_engine_spark.core.object_store import ObjectStoreFileManager

            return ObjectStoreFileManager(self.acon, client=self.client).execute()
        fn = self.function
        if fn == "delete_objects":
            return self.delete_objects()
        if fn == "copy_objects":
            return self.copy_objects()
        if fn == "move_objects":
            return self.move_objects()
        if fn in ("request_restore", "check_restore_status", "request_restore_to_destination_and_wait"):
            raise NotImplementedError("archive restore needs an object store: set 'bucket'")
        raise ValueError(f"FileManager: unknown function {fn}")

    @staticmethod
    def _strip_scheme(path: str) -> Path:
        return Path(path.removeprefix("file://"))

    def delete_objects(self) -> None:
        p = self._strip_scheme(self.acon["bucket_or_path"]) / self.acon.get("object_paths", "")
        if p.is_dir():
            shutil.rmtree(p)
        elif p.exists():
            p.unlink()

    def copy_objects(self) -> None:
        src = self._strip_scheme(self.acon["source"])
        dst = self._strip_scheme(self.acon["destination"])
        if src.is_dir():
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src, dst)

    def move_objects(self) -> None:
        src = self._strip_scheme(self.acon["source"])
        dst = self._strip_scheme(self.acon["destination"])
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.move(str(src), str(dst))


class DbfsFileManager:
    """DBFS-backed file operations through an injected dbutils-shaped
    client (reference ``core/dbfs_file_manager.py:79-263`` — same op
    schema as the S3 backend with an empty ``bucket``; the reference
    resolves Databricks' dbutils, here the client is injected).

    Dry runs log the recursive listing dict (``{path: [objects...]}`` with
    the reference's ``"No such key"`` fallback); real operations run
    ``cp``/``rm``/``mv`` with ``recurse=True``.
    """

    def __init__(self, acon: dict, client: Any):
        import logging

        self.acon = acon
        self.fs = client.fs
        self._logger = logging.getLogger(__name__)

    def execute(self) -> None:
        fn = self.acon.get("function")
        available = {
            "delete_objects": self.delete_objects,
            "copy_objects": self.copy_objects,
            "move_objects": self.move_objects,
        }
        if fn not in available:
            raise NotImplementedError(
                f"The requested function {fn} is not implemented."
            )
        self._logger.info("Function being executed: %s", fn)
        available[fn]()

    @staticmethod
    def _get_path(bucket: str, path: str) -> str:
        return f"s3://{bucket}/{path}".strip() if (bucket or "").strip() else path.strip()

    def _list_objects(self, path: str, objects_list: list) -> list:
        for item in self.fs.ls(path):
            if item.isDir():
                self._list_objects(item.path, objects_list)
            else:
                objects_list.append(item.path)
        return objects_list

    def _dry_run(self, bucket: str, object_paths: list) -> dict:
        response = {}
        for path in object_paths:
            path = self._get_path(bucket, path)
            object_list = self._list_objects(path, [])
            response[path] = object_list if object_list else ["No such key"]
        return response

    def delete_objects(self) -> None:
        if self.acon.get("dry_run"):
            self._logger.info("Paths that would be deleted:")
            self._logger.info(
                self._dry_run(self.acon["bucket"], self.acon["object_paths"])
            )
            return
        for path in self.acon["object_paths"]:
            path = self._get_path(self.acon["bucket"], path)
            self._logger.info("Deleting: %s", path)
            self.fs.rm(path, True)
            self._logger.info("Deleted: %s", path)

    def _transfer(self, verb: str, op) -> None:
        if self.acon.get("dry_run"):
            self._logger.info(f"Paths that would be {verb}:")
            self._logger.info(
                self._dry_run(self.acon["bucket"], [self.acon["source_object"]])
            )
            return
        src = self._get_path(self.acon["bucket"], self.acon["source_object"])
        dst = self._get_path(
            self.acon["destination_bucket"], self.acon["destination_object"]
        )
        op(src, dst, True)

    def copy_objects(self) -> None:
        self._transfer("copied", self.fs.cp)

    def move_objects(self) -> None:
        self._transfer("moved", self.fs.mv)
