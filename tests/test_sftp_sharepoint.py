"""SFTP + SharePoint connector tests (local transports, no network)."""

import gzip
import os
import zipfile

import pytest

from lakehouse_engine_spark import load_data


def _write(path: str, text: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)


@pytest.fixture()
def sftp_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    _write(str(d / "a.csv"), "id,name\n1,ada\n2,grace\n")
    _write(str(d / "b.csv"), "id,name\n3,alan\n")
    # nested folder — listing must recurse
    sub = d / "nested"
    sub.mkdir()
    _write(str(sub / "c.csv"), "id,name\n4,edsger\n")
    # non-matching format must be skipped
    _write(str(d / "ignore.txt"), "nope")
    return str(d)


def test_sftp_local_csv(spark, sftp_dir):
    res = load_data(
        {
            "input_specs": [
                {
                    "spec_id": "in",
                    "data_format": "sftp",
                    "location": sftp_dir,
                    "sftp_files_format": "csv",
                    "options": {"local": True},
                }
            ],
            "output_specs": [{"spec_id": "o", "input_id": "in", "data_format": "dataframe"}],
        }
    )
    rows = {(r["id"], r["name"]) for r in res["o"].collect()}
    assert rows == {(1, "ada"), (2, "grace"), (3, "alan"), (4, "edsger")}


def test_sftp_filters_and_metadata(spark, sftp_dir):
    res = load_data(
        {
            "input_specs": [
                {
                    "spec_id": "in",
                    "data_format": "sftp",
                    "location": sftp_dir,
                    "sftp_files_format": "csv",
                    "options": {
                        "local": True,
                        "file_name_contains": "a.csv",
                        "file_metadata": True,
                    },
                }
            ],
            "output_specs": [{"spec_id": "o", "input_id": "in", "data_format": "dataframe"}],
        }
    )
    df = res["o"]
    assert {"filename", "modification_time"} <= set(df.columns)
    assert df.count() == 2  # only a.csv rows


def test_sftp_gz_and_zip(spark, tmp_path):
    d = tmp_path / "gzfeed"
    d.mkdir()
    with gzip.open(d / "x.csv.gz", "wt") as fh:
        fh.write("id,name\n10,zuse\n")
    with zipfile.ZipFile(d / "y.csv.zip", "w") as zf:
        zf.writestr("inner.csv", "id,name\n11,hopper\n")
    res = load_data(
        {
            "input_specs": [
                {
                    "spec_id": "in",
                    "data_format": "sftp",
                    "location": str(d),
                    "sftp_files_format": "csv",
                    "options": {"local": True},
                }
            ],
            "output_specs": [{"spec_id": "o", "input_id": "in", "data_format": "dataframe"}],
        }
    )
    vals = {str(r["id"]) for r in res["o"].collect()}
    assert vals == {"10", "11"}


def test_sftp_latest_file(spark, sftp_dir):
    newest = os.path.join(sftp_dir, "z_newest.csv")
    _write(newest, "id,name\n99,newest\n")
    os.utime(newest, (9999999999, 9999999999))
    res = load_data(
        {
            "input_specs": [
                {
                    "spec_id": "in",
                    "data_format": "sftp",
                    "location": sftp_dir,
                    "sftp_files_format": "csv",
                    "options": {"local": True, "latest_file": True},
                }
            ],
            "output_specs": [{"spec_id": "o", "input_id": "in", "data_format": "dataframe"}],
        }
    )
    assert [r["id"] for r in res["o"].collect()] == [99]


def test_sharepoint_reader_local_with_sniffed_delimiter(spark, tmp_path):
    d = tmp_path / "sp"
    d.mkdir()
    _write(str(d / "report.csv"), "id;name\n1;ada\n2;grace\n")
    res = load_data(
        {
            "input_specs": [
                {
                    "spec_id": "in",
                    "data_format": "sharepoint",
                    "location": str(d),
                    "options": {"local": True},
                }
            ],
            "output_specs": [{"spec_id": "o", "input_id": "in", "data_format": "dataframe"}],
        }
    )
    rows = {(r["id"], r["name"]) for r in res["o"].collect()}
    assert rows == {(1, "ada"), (2, "grace")}


def test_sharepoint_reader_injected_download_and_archive(spark, tmp_path):
    src = tmp_path / "remote"
    src.mkdir()
    _write(str(src / "x.csv"), "id,name\n5,kay\n")
    archive = str(tmp_path / "archive")

    def fake_download(options, staging):
        for n in os.listdir(src):
            _write(os.path.join(staging, n), open(src / n, encoding="utf-8").read())

    res = load_data(
        {
            "input_specs": [
                {
                    "spec_id": "in",
                    "data_format": "sharepoint",
                    "location": "https://example/site/folder",
                    "options": {"download": fake_download, "archive_folder": archive},
                }
            ],
            "output_specs": [{"spec_id": "o", "input_id": "in", "data_format": "dataframe"}],
        }
    )
    assert res["o"].count() == 1
    assert os.listdir(archive) == ["x.csv"]


def test_sharepoint_writer_stage_and_upload(spark, tmp_path):
    uploads = []

    def fake_upload(options, local_file):
        with open(local_file, encoding="utf-8") as fh:
            uploads.append((os.path.basename(local_file), fh.read()))

    local = str(tmp_path / "stage")
    load_data(
        {
            "input_specs": [
                {
                    "spec_id": "in",
                    "data_format": "parquet",
                    "location": "/root/testdata/sf0.001/nation.parquet",
                }
            ],
            "output_specs": [
                {
                    "spec_id": "o",
                    "input_id": "in",
                    "data_format": "sharepoint",
                    "options": {
                        "upload": fake_upload,
                        "sharepoint_opts": {"local_path": local, "file_name": "nation.csv"},
                    },
                }
            ],
        }
    )
    assert len(uploads) == 1
    name, content = uploads[0]
    assert name == "nation.csv"
    assert content.startswith("n_nationkey") and content.count("\n") == 26  # header + 25
