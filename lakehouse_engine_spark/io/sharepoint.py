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


class SharepointUtils:
    """MS Graph seam with the reference's method surface
    (``utils/sharepoint_utils.py`` there): ``check_if_endpoint_exists`` /
    ``list_items_in_path`` / ``get_file_metadata`` /
    ``archive_sharepoint_file`` / ``staging_area`` /
    ``save_to_staging_area``. The Graph legs raise until a live client is
    wired (tests patch the methods, exactly as the reference's tests
    patch theirs); the local staging legs are real."""

    def __init__(self, opts) -> None:
        self.opts = opts

    # ---- Graph legs (live-system; patched/injected in tests)
    def check_if_endpoint_exists(self, path: str) -> bool:
        raise NotImplementedError(
            "sharepoint: MS Graph needs tenant credentials; inject/patch "
            "SharepointUtils for offline use"
        )

    def list_items_in_path(self, path: str):
        raise NotImplementedError(
            "sharepoint: MS Graph needs tenant credentials; inject/patch "
            "SharepointUtils for offline use"
        )

    def get_file_metadata(self, file_path: str):
        raise NotImplementedError(
            "sharepoint: MS Graph needs tenant credentials; inject/patch "
            "SharepointUtils for offline use"
        )

    def archive_sharepoint_file(self, sp_file, to_path, move_enabled) -> None:
        raise NotImplementedError(
            "sharepoint: MS Graph needs tenant credentials; inject/patch "
            "SharepointUtils for offline use"
        )

    def write_to_sharepoint(self) -> None:
        raise NotImplementedError(
            "sharepoint: MS Graph needs tenant credentials; inject/patch "
            "SharepointUtils for offline use"
        )

    # ---- local legs (real)
    def write_to_local_path(self, df: DataFrame) -> None:
        """Stage the frame as ONE named csv at ``local_path/file_name``
        (reference ``sharepoint_utils.write_to_local_path``)."""
        local_path = self.opts.local_path
        file_name = self.opts.file_name or "export.csv"
        os.makedirs(local_path, exist_ok=True)
        stage_dir = os.path.join(local_path, "_stage")
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .options(header="true", **(self.opts.local_options or {}))
            .csv(stage_dir)
        )
        part = glob.glob(os.path.join(stage_dir, "part-*.csv"))[0]
        shutil.move(part, os.path.join(local_path, file_name))
        shutil.rmtree(stage_dir, ignore_errors=True)

    def delete_local_path(self) -> None:
        shutil.rmtree(self.opts.local_path, ignore_errors=True)

    def staging_area(self):
        import contextlib

        @contextlib.contextmanager
        def _area():
            d = tempfile.mkdtemp(prefix="lhe_sharepoint_")
            try:
                yield d
            finally:
                shutil.rmtree(d, ignore_errors=True)

        return _area()

    def save_to_staging_area(self, sp_file, staging_dir: Optional[str] = None) -> str:
        d = staging_dir or (self.opts.local_path if self.opts else None)
        d = d or tempfile.mkdtemp(prefix="lhe_sharepoint_")
        os.makedirs(d, exist_ok=True)
        target = os.path.join(d, sp_file.file_name)
        with open(target, "wb") as fh:
            fh.write(sp_file.content or b"")
        return target


def _sp_csv_options(file_content: bytes, opts) -> dict:
    local = dict(getattr(opts, "local_options", None) or {})
    return resolve_spark_csv_options(file_content, {"local_options": local})


def _sp_load_csv_to_spark(spark, utils, sp_file, staging_dir):
    """Reference ``_load_csv_to_spark``: refresh metadata/content, stage
    locally, sniff options, read + materialize; a Spark read failure
    surfaces as the reference's exact ValueError."""
    sp_file = utils.get_file_metadata(sp_file.file_path)
    local_file = utils.save_to_staging_area(sp_file, staging_dir)
    spark_options = _sp_csv_options(sp_file.content or b"", utils.opts)
    try:
        df = spark.read.format("csv").options(**spark_options).load(local_file)
        df = df.localCheckpoint(eager=True)  # materialize off the staging path
        return sp_file, df
    except Exception as e:
        raise ValueError(
            f"Failed to read Sharepoint file: '{sp_file.file_path}'."
        ) from e


def read_sharepoint_opts(
    spark: SparkSession, spec: InputSpec, utils: Optional[SharepointUtils] = None
) -> DataFrame:
    """The reference's ``sharepoint_opts`` reader contract
    (``io/readers/sharepoint_reader.py:26-597``): single-file mode when
    the resolved path carries an extension, folder mode (with optional
    glob ``file_pattern``) otherwise; per-file staging through
    ``SharepointUtils``; schema-consistency enforcement across a folder;
    success/error archiving with the ``done``/``error`` subfolder
    defaults and ``archive_enabled`` gating. Error strings are the
    reference's own."""
    import fnmatch as _fnmatch
    import posixpath
    from functools import reduce

    from lakehouse_engine_spark.core.definitions import (
        InvalidSharepointPathException,
        SharepointFile,
    )

    opts = spec.sharepoint_opts
    opts.validate_for_reader()
    if spec.read_type == "streaming":
        raise NotImplementedError(
            "Sharepoint reader doesn't support streaming input."
        )
    utils = utils or SharepointUtils(opts)

    # resolve the effective path (reference SharepointReader.__init__)
    if opts.file_name and opts.folder_relative_path:
        folder_name = posixpath.basename(opts.folder_relative_path)
        if "." in folder_name:
            raise InvalidSharepointPathException(
                f"Invalid path setup: `folder_relative_path` "
                f"('{opts.folder_relative_path}') appears to include a file, "
                f"but `file_name` ('{opts.file_name}') was also provided. "
                f"Provide either a folder+file_name, or a full file path "
                f"not both."
            )
        file_path = f"{opts.folder_relative_path}/{opts.file_name}"
    else:
        file_path = opts.folder_relative_path

    # format dispatch (reference SharepointReaderFactory)
    if opts.file_name:
        ext = posixpath.splitext(opts.file_name)[1].lower()
    elif file_path and "." in posixpath.basename(file_path):
        ext = posixpath.splitext(file_path)[1].lower()
    elif opts.file_type:
        ext = f".{opts.file_type.lower()}"
    else:
        raise ValueError(
            "Cannot determine file format. Please provide `file_name`, a "
            "full file path in `folder_relative_path`, or explicitly set "
            "`file_type`."
        )
    if ext == ".xlsx":
        raise NotImplementedError("Excel reading is not yet implemented.")
    if ext != ".csv":
        raise ValueError(f"Unsupported file format: {ext}")

    success_sub = opts.archive_success_subfolder or "done"
    error_sub = opts.archive_error_subfolder or "error"

    # ---- single-file mode
    if "." in posixpath.basename(file_path):
        sp_file = utils.get_file_metadata(file_path)
        base_folder = posixpath.dirname(file_path)
        archive_target = f"{base_folder}/{error_sub}" if base_folder else None
        try:
            if not sp_file.content:
                raise ValueError(
                    f"File '{file_path}' is empty or could not be downloaded."
                )
            with utils.staging_area() as tmp_dir:
                sp_file, df = _sp_load_csv_to_spark(spark, utils, sp_file, tmp_dir)
                archive_target = (
                    f"{base_folder}/{success_sub}" if base_folder else None
                )
                return df
        finally:
            utils.archive_sharepoint_file(
                sp_file=sp_file,
                to_path=archive_target,
                move_enabled=opts.archive_enabled,
            )

    # ---- folder mode
    if not utils.check_if_endpoint_exists(file_path):
        raise ValueError(f"Folder '{file_path}' does not exist in Sharepoint.")
    items = utils.list_items_in_path(file_path)
    files = []
    for item in items:
        f = SharepointFile(
            file_name=item["name"],
            time_created=item.get("createdDateTime", ""),
            time_modified=item.get("lastModifiedDateTime", ""),
            _folder=file_path,
        )
        if not f.is_csv:
            continue
        if opts.file_pattern and not _fnmatch.fnmatch(
            f.file_name, opts.file_pattern
        ):
            continue
        files.append(f)
    files.sort(key=lambda f: f.file_name)
    if not files:
        raise ValueError(f"No CSV files found in folder: {file_path}")

    error_folder = f"{file_path}/{error_sub}"
    valid_files, dfs = [], []
    base_schema = None
    with utils.staging_area() as tmp_dir:
        for f in files:
            try:
                f_loaded, df = _sp_load_csv_to_spark(spark, utils, f, tmp_dir)
                if base_schema and df.schema != base_schema:
                    utils.archive_sharepoint_file(
                        sp_file=f_loaded,
                        to_path=error_folder,
                        move_enabled=opts.archive_enabled,
                    )
                    # flag BOTH handles: the except block below checks `f`,
                    # so flagging only the re-fetched f_loaded would archive
                    # the same file twice
                    f_loaded._already_archived = True
                    f._already_archived = True
                    raise ValueError(f"Schema mismatch in '{f.file_name}'")
                base_schema = base_schema or df.schema
                dfs.append(df)
                valid_files.append(f_loaded)
            except Exception:
                if not getattr(f, "_already_archived", False):
                    f.skip_rename = True
                    try:
                        utils.archive_sharepoint_file(
                            sp_file=f,
                            to_path=error_folder,
                            move_enabled=opts.archive_enabled,
                        )
                        f._already_archived = True
                    except Exception:
                        pass
                raise
    combined = reduce(lambda a, b: a.unionByName(b), dfs)
    for sp_file in valid_files:
        utils.archive_sharepoint_file(
            sp_file=sp_file,
            to_path=(
                f"{file_path}/{opts.archive_success_subfolder}"
                if opts.archive_success_subfolder
                else None
            ),
            move_enabled=opts.archive_enabled,
        )
    return combined


def read_sharepoint(spark: SparkSession, spec: InputSpec) -> DataFrame:
    """Batch SharePoint read: the reference ``sharepoint_opts`` contract
    when the spec carries it, else the legacy local/injected-download
    staging path (stage → sniff → spark.read.csv / pandas xlsx)."""
    if getattr(spec, "sharepoint_opts", None) is not None:
        return read_sharepoint_opts(spark, spec)
    return _read_sharepoint_legacy(spark, spec)


def _read_sharepoint_legacy(spark: SparkSession, spec: InputSpec) -> DataFrame:
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


def write_sharepoint_opts(
    df: DataFrame, spec: OutputSpec, utils: Optional[SharepointUtils] = None
) -> None:
    """The reference's ``sharepoint_opts`` writer contract
    (``io/writers/sharepoint_writer.py:19-107``): streaming refused,
    writer options validated, endpoint existence gated, then
    write-local -> upload -> delete-local with the reference's log lines
    (the parity test asserts 'Deleted the local folder: ...')."""
    import logging

    from lakehouse_engine_spark.core.definitions import (
        EndpointNotFoundException,
        NotSupportedException,
        WriteToLocalException,
    )

    logger = logging.getLogger(__name__)
    opts = spec.sharepoint_opts
    if df.isStreaming:
        raise NotSupportedException("Sharepoint writer doesn't support streaming!")
    opts.validate_for_writer()
    utils = utils or SharepointUtils(opts)
    if not utils.check_if_endpoint_exists(opts.folder_relative_path):
        raise EndpointNotFoundException("The provided endpoint does not exist!")
    local_path = opts.local_path
    file_name = opts.file_name
    logger.info("Starting to write the data to the local path: %s", local_path)
    try:
        utils.write_to_local_path(df)
    except IOError as err:
        utils.delete_local_path()
        logger.info(f"Deleted the local folder: {local_path}")
        raise WriteToLocalException(
            f"The data was not written on the local path: {local_path}"
        ) from err
    logger.info("The data was written to the local path: %s", local_path)
    logger.info("Uploading the %s to Sharepoint.", file_name)
    utils.write_to_sharepoint()
    logger.info("The %s was uploaded to Sharepoint with success!", file_name)
    utils.delete_local_path()
    logger.info(f"Deleted the local folder: {local_path}")


def write_sharepoint(df: DataFrame, spec: OutputSpec) -> None:
    """Batch SharePoint write: the reference ``sharepoint_opts`` contract
    when the spec carries it, else the legacy injected-upload staging
    path."""
    if getattr(spec, "sharepoint_opts", None) is not None:
        return write_sharepoint_opts(df, spec)
    return _write_sharepoint_legacy(df, spec)


def _write_sharepoint_legacy(df: DataFrame, spec: OutputSpec) -> None:
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
