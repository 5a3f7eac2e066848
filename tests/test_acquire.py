"""Acquisition utilities: offline download via file://, nested zip
extraction, and the documented stubs."""

import os
import sys
import zipfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.sources.acquire import (  # noqa: E402
    download,
    extract_access_tables,
    extract_archive,
)


def test_download_file_url(tmp_path):
    src = tmp_path / "payload.csv"
    src.write_text("a,b\n1,2\n")
    dest = str(tmp_path / "out" / "payload.csv")
    got = download(src.as_uri(), dest)
    assert open(got).read() == "a,b\n1,2\n"
    # idempotent without overwrite
    src.write_text("changed")
    download(src.as_uri(), dest)
    assert open(got).read() == "a,b\n1,2\n"
    download(src.as_uri(), dest, overwrite=True)
    assert open(got).read() == "changed"


def test_nested_zip_extraction(tmp_path):
    inner = tmp_path / "inner.zip"
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("U00.csv", "ADRS\n1\n")
    outer = tmp_path / "outer.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.write(inner, "inner.zip")
        zf.writestr("readme.txt", "x")
    out = extract_archive(str(outer), str(tmp_path / "out"))
    names = sorted(os.path.basename(p) for p in out)
    assert "U00.csv" in names and "readme.txt" in names


def test_stubs_raise_with_guidance(tmp_path):
    rar = tmp_path / "x.rar"
    rar.write_bytes(b"Rar!")
    with pytest.raises(NotImplementedError, match="7z|unrar"):
        extract_archive(str(rar), str(tmp_path / "o"))
    with pytest.raises(NotImplementedError, match="pyodbc"):
        extract_access_tables("x.mdb", str(tmp_path))
    with pytest.raises(ValueError):
        extract_archive(str(tmp_path / "y.tar"), str(tmp_path / "o2"))
