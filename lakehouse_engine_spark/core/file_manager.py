"""FileManager — object delete/copy/move operations.

Reference parity: ``core/s3_file_manager.py`` / ``core/dbfs_file_manager.py``
(op schema ``core/definitions.py:1929-1969``), reduced to the
filesystem-agnostic subset implementable without cloud credentials: local
POSIX paths here; the same ACON surface maps to S3/DBFS on real deployments.
Glacier restore is cloud-only and stubbed.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any


class FileManager:
    """Executes one file-management function from an ACON."""

    def __init__(self, acon: dict):
        self.acon = acon
        self.function = acon.get("function")

    def execute(self) -> Any:
        fn = self.function
        if fn == "delete_objects":
            return self.delete_objects()
        if fn == "copy_objects":
            return self.copy_objects()
        if fn == "move_objects":
            return self.move_objects()
        if fn in ("request_restore", "check_restore_status", "request_restore_to_destination_and_wait"):
            raise NotImplementedError("Glacier restore operations require AWS credentials")
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
