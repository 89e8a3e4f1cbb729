"""SFTP reader — list/filter remote files, parse with pandas, convert to Spark.

Reference parity: ``io/readers/sftp_reader.py:36-150`` +
``utils/extraction/sftp_extraction_utils.py`` (formats csv/fwf/json/xml,
filename/date filters, earliest/latest selection, gz/zip decompression,
``file_metadata`` columns). The transport is injectable so the parse
pipeline is testable without a network: pass
``options["sftp_client_factory"]`` (a callable returning ``(client,
transport)`` objects with ``listdir_attr/open/stat/close``), set
``options["local"]=True`` to read a local directory through the same code
path, or provide paramiko-style connection options (``hostname``, ``port``,
``username``, ``password``…) to use a real SFTP connection when paramiko is
installed.

Scale note: an SFTP endpoint is a single-stream source — the reference
parses on the driver with pandas and so do we. This reader is for small
partner-feed files; bulk data belongs on object storage via the file
reader.
"""

from __future__ import annotations

import gzip
import io
import os
import stat as statmod
from datetime import datetime
from typing import Any, List, Optional, Tuple
from zipfile import ZipFile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lakehouse_engine_spark.core.definitions import InputSpec, WrongArgumentsError

SFTP_FORMATS = {"csv", "fwf", "json", "xml"}

# filter option keys (reference utils/extraction/sftp_extraction_utils.py:28-41)
FILE_NAME_CONTAINS = "file_name_contains"
LATEST_FILE = "latest_file"
EARLIEST_FILE = "earliest_file"
DATE_TIME_GT = "date_time_gt"
DATE_TIME_LT = "date_time_lt"


class _LocalAttrs:
    """stat-like record for local transport (mirrors paramiko SFTPAttributes)."""

    def __init__(self, path: str):
        st = os.stat(path)
        self.filename = os.path.basename(path)
        self.st_mtime = st.st_mtime
        self.st_mode = st.st_mode


class LocalSFTPClient:
    """Local-filesystem client implementing the subset of the paramiko
    SFTPClient interface the reader uses. Doubles as the offline test
    transport and as a generic local file-feed parser."""

    def listdir_attr(self, path: str) -> List[_LocalAttrs]:
        return [_LocalAttrs(os.path.join(path, n)) for n in sorted(os.listdir(path))]

    def open(self, path: str, mode: str = "r"):
        return open(path, "rb")

    def stat(self, path: str) -> _LocalAttrs:
        return _LocalAttrs(path)

    def close(self) -> None:
        pass


class _NullTransport:
    def close(self) -> None:
        pass


def _get_client(options: dict) -> Tuple[Any, Any]:
    factory = options.get("sftp_client_factory")
    if factory is not None:
        return factory(options)
    if options.get("local"):
        return LocalSFTPClient(), _NullTransport()
    try:
        import paramiko  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no paramiko
        raise NotImplementedError(
            "sftp reader: paramiko is not installed; pass "
            "options['local']=True for a local directory or inject "
            "options['sftp_client_factory']."
        ) from exc
    transport = paramiko.Transport((options["hostname"], int(options.get("port", 22))))
    transport.connect(
        username=options.get("username"), password=options.get("password")
    )
    return paramiko.SFTPClient.from_transport(transport), transport


def _parse_dt(text: str) -> datetime:
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return datetime.strptime(text, fmt)
        except ValueError:
            continue
    raise WrongArgumentsError(
        f"sftp reader: invalid datetime filter {text!r}; "
        "use YYYY-MM-DD or YYYY-MM-DD HH:MM:SS"
    )


def _matches(attrs, options: dict) -> bool:
    """Reference filter semantics (sftp_extraction_utils.py:264-300):
    ``file_name_contains`` + the date interval ONLY — the files_format
    drives the PARSER, never the listing (fwf feeds read .txt files, gz
    members can wrap any format)."""
    name = attrs.filename
    if FILE_NAME_CONTAINS in options and options[FILE_NAME_CONTAINS] not in name:
        return False
    mtime = datetime.fromtimestamp(attrs.st_mtime)
    if DATE_TIME_GT in options and mtime <= _parse_dt(options[DATE_TIME_GT]):
        return False
    if DATE_TIME_LT in options and mtime >= _parse_dt(options[DATE_TIME_LT]):
        return False
    return True


def get_files_list(client, location: str, options: dict, fmt: str) -> List[str]:
    """Recursive listing with the reference's filter semantics
    (``sftp_extraction_utils.py:44-101``)."""
    files: List[Tuple[str, float]] = []
    stack = [location.rstrip("/")]
    while stack:
        folder = stack.pop()
        for attrs in client.listdir_attr(folder):
            path = f"{folder}/{attrs.filename}"
            if statmod.S_ISDIR(attrs.st_mode):
                stack.append(path)
            elif _matches(attrs, options):
                files.append((path, attrs.st_mtime))
    if not files:
        return []
    if options.get(LATEST_FILE):
        return [max(files, key=lambda f: f[1])[0]]
    if options.get(EARLIEST_FILE):
        return [min(files, key=lambda f: f[1])[0]]
    return [f[0] for f in sorted(files)]


def _read_one(filename: str, fh, fmt: str, args: dict) -> pd.DataFrame:
    """Parse one (possibly gz/zip-compressed) file with pandas
    (``sftp_reader.py:107-150``)."""
    reader = getattr(pd, f"read_{fmt}")
    if filename.endswith(".gz"):
        with gzip.GzipFile(fileobj=fh, mode="rb") as gz:
            return reader(io.TextIOWrapper(gz), **args)
    if filename.endswith(".zip"):
        with ZipFile(fh, "r") as zf:
            # skip archiver metadata members (__MACOSX/, AppleDouble ._*
            # dotfiles) — the reference serves zips re-packed to data
            # members only (its test fixture does exactly this), so
            # parsing junk members would diverge, not match
            members = [
                n for n in zf.namelist()
                if not n.startswith("__MACOSX/")
                and not os.path.basename(n).startswith(".")
            ]
            dfs = [
                reader(io.TextIOWrapper(zf.open(n)), **args).fillna("")
                for n in members
            ]
            out = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
            # zip members are read as strings to dodge per-member dtype drift
            return out.astype(str) if not out.empty else out
    return reader(fh, **args)


def read_sftp(spark: SparkSession, spec: InputSpec) -> DataFrame:
    """Execute the batch SFTP extraction for an InputSpec."""
    options = dict(spec.options or {})
    fmt = (spec.sftp_files_format or options.get("sftp_files_format") or "csv").lower()
    if fmt not in SFTP_FORMATS:
        raise WrongArgumentsError(
            f"sftp reader: format {fmt!r} not in {sorted(SFTP_FORMATS)}"
        )
    if not spec.location:
        raise WrongArgumentsError("sftp reader: location is required")
    if spec.read_type != "batch":
        raise NotImplementedError("sftp reader supports only batch read_type")

    client, transport = _get_client(options)
    args = dict(options.get("args", {}))
    dfs: List[pd.DataFrame] = []
    try:
        for filename in get_files_list(client, spec.location, options, fmt):
            with client.open(filename, "r") as fh:
                try:
                    pdf = _read_one(filename, fh, fmt, args)
                except (pd.errors.EmptyDataError, ValueError):
                    continue
            if pdf.empty:
                continue
            if options.get("file_metadata"):
                pdf = pdf.copy()
                pdf["filename"] = filename
                pdf["modification_time"] = datetime.fromtimestamp(
                    client.stat(filename).st_mtime
                )
            dfs.append(pdf)
    finally:
        client.close()
        transport.close()
    if not dfs:
        # reference's exact message (utils/extraction/sftp_extraction_utils.py)
        raise ValueError("No files were found with the specified parameters.")
    return spark.createDataFrame(pd.concat(dfs, ignore_index=True))
