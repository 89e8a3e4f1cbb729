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
