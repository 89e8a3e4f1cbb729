"""SharePoint connector — download/stage/read and write/upload flows.

Reference parity: ``io/readers/sharepoint_reader.py:88-667`` and
``io/writers/sharepoint_writer.py:41-107``. The MS Graph transport is
injectable (``download`` / ``upload`` callables in the options) because the
service needs tenant credentials; everything around it — local staging,
delimiter sniffing with ``csv.Sniffer``, Spark CSV option resolution, Excel
via pandas, the coalesce(1)-stage-upload write path, archiving — is real
and runs offline. ``options["local"]=True`` treats ``location`` as an
already-downloaded local folder (the post-download half of the reference
flow).

Scale note: like the reference, this is a small-file exchange surface
(the reference chunks uploads at 100 MB); bulk data belongs on object
storage via the file reader/writer.
"""

from __future__ import annotations

import csv as csvmod
import glob
import os
import shutil
import tempfile
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession

from lakehouse_engine_spark.core.definitions import (
    InputSpec,
    OutputSpec,
    WrongArgumentsError,
)

SNIFF_DELIMITERS = ";,|\t"


def detect_delimiter(
    file_content: bytes, provided_delimiter: Optional[str] = None
) -> str:
    """csv.Sniffer-based delimiter detection
    (reference ``sharepoint_reader.py:470-533``); comma fallback."""
    if provided_delimiter:
        return provided_delimiter
    try:
        text = file_content.decode("utf-8")
        return csvmod.Sniffer().sniff(text, delimiters=SNIFF_DELIMITERS).delimiter
    except Exception:
        return ","


def resolve_spark_csv_options(file_content: bytes, options: dict) -> dict:
    """Merge user csv options with the sniffed delimiter
    (reference ``sharepoint_reader.py:535-597``)."""
    local = dict(options.get("local_options", {}))
    local.setdefault("header", "true")
    local.setdefault("inferSchema", "true")
    local["sep"] = detect_delimiter(file_content, local.get("sep") or local.get("delimiter"))
    local.pop("delimiter", None)
    return local


def _stage_files(options: dict, location: str, pattern: str) -> List[str]:
    """Resolve the staging folder holding the files to read.

    Injectable transport: ``options["download"]`` is a callable
    ``(options, staging_dir) -> None`` that materialises the remote folder
    locally (the Graph API part of ``sharepoint_reader.py:183-249``).
    With ``options["local"]=True`` the location already is that folder.
    """
    if options.get("local"):
        staging = location
    elif callable(options.get("download")):
        staging = tempfile.mkdtemp(prefix="lhe_sharepoint_")
        options["download"](options, staging)
    else:
        raise NotImplementedError(
            "sharepoint reader: MS Graph needs tenant credentials; pass "
            "options['local']=True for an already-downloaded folder or inject "
            "options['download']."
        )
    files = sorted(glob.glob(os.path.join(staging, pattern)))
    if not files:
        raise ValueError(f"sharepoint reader: no files match {pattern!r} in {staging}")
    return files


def read_sharepoint(spark: SparkSession, spec: InputSpec) -> DataFrame:
    """Batch SharePoint read: stage → sniff → spark.read.csv / pandas xlsx."""
    options = dict(spec.options or {})
    if not spec.location:
        raise WrongArgumentsError("sharepoint reader: location is required")
    if spec.read_type != "batch":
        raise NotImplementedError("sharepoint reader supports only batch read_type")
    fmt = options.get("format", "csv").lower()
    pattern = options.get("pattern", "*.xlsx" if fmt in ("excel", "xlsx") else "*.csv")
    files = _stage_files(options, spec.location, pattern)

    if fmt in ("excel", "xlsx"):
        import pandas as pd

        frames = [pd.read_excel(f, **options.get("pandas_args", {})) for f in files]
        df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    else:
        with open(files[0], "rb") as fh:
            head = fh.read(64 * 1024)
        csv_opts = resolve_spark_csv_options(head, options)
        df = spark.read.options(**csv_opts).csv(files)

    archive = options.get("archive_folder")
    if archive:
        # Spark scans lazily — materialize (and cut lineage off the staged
        # paths) before the files move, or the archived read would 404.
        df = df.localCheckpoint(eager=True)
        os.makedirs(archive, exist_ok=True)
        for f in files:
            shutil.move(f, os.path.join(archive, os.path.basename(f)))
    return df


def write_sharepoint(df: DataFrame, spec: OutputSpec) -> None:
    """Batch SharePoint write: stage one CSV locally, hand to the uploader.

    Reference ``sharepoint_writer.py:72-107``: coalesce(1) csv to a local
    path, upload (Graph, chunked), delete staging. The uploader is the
    injectable half: ``options["upload"]`` is ``(options, local_file) ->
    None``; with ``options["keep_local"]=True`` the staged CSV is left in
    place (pure-local mode).
    """
    options = dict(spec.options or {})
    opts = dict(options.get("sharepoint_opts", {}))
    local_path = opts.get("local_path") or tempfile.mkdtemp(prefix="lhe_sp_out_")
    file_name = opts.get("file_name", "export.csv")
    upload: Optional[Callable] = options.get("upload")
    if upload is None and not options.get("keep_local"):
        raise NotImplementedError(
            "sharepoint writer: MS Graph needs tenant credentials; inject "
            "options['upload'] or set options['keep_local']=True."
        )

    stage_dir = os.path.join(local_path, "_stage")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .options(header="true", **opts.get("csv_options", {}))
        .csv(stage_dir)
    )
    part = glob.glob(os.path.join(stage_dir, "part-*.csv"))[0]
    target = os.path.join(local_path, file_name)
    shutil.move(part, target)
    shutil.rmtree(stage_dir, ignore_errors=True)

    if upload is not None:
        try:
            upload(options, target)
        finally:
            if not options.get("keep_local"):
                shutil.rmtree(local_path, ignore_errors=True)
