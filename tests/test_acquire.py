"""Acquisition utilities: offline download via file://, nested zip
extraction, Access table extraction over a fake cursor, the one-call
setup() bootstrap, and the documented stubs."""

import os
import sys
import zipfile
from types import SimpleNamespace

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.sources.acquire import (  # noqa: E402
    download,
    extract_access_tables,
    extract_archive,
    find_access_file,
    setup,
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


class FakeCursor:
    """Mimics the slice of the pyodbc cursor API the extractor touches."""

    def __init__(self, tables):
        self._tables = tables
        self.description = None
        self._rows = None

    def tables(self):
        return [SimpleNamespace(table_name=n) for n in self._tables]

    def execute(self, sql):
        name = sql[sql.index("[") + 1 : sql.index("]")]
        spec = self._tables[name]
        if spec == "fail":
            raise RuntimeError(f"driver choked on {name}")
        headers, rows = spec
        self.description = [(h,) for h in headers]
        self._rows = rows
        return self

    def fetchall(self):
        return self._rows


class FakeConnection:
    def __init__(self, tables):
        self._cursor = FakeCursor(tables)
        self.closed = False

    def cursor(self):
        return self._cursor

    def close(self):
        self.closed = True


class TestAccessExtraction:
    TABLES = {
        "U1400Data": (["ADRS", "G01"], [[10001, 5], [10002, 7]]),
        "R1400Data": (["ADRS", "G01"], [[20001, 3]]),
        "MSysObjects": (["x"], [[1]]),  # system table: must be filtered
        "Broken": "fail",  # driver error: skipped, like the reference
        "Wierd1380": (["A"], [[1]]),  # renamed via the 1380-style map
    }

    def test_multi_table_roundtrip(self, tmp_path):
        conn = FakeConnection(self.TABLES)
        written = extract_access_tables(
            "year.mdb",
            str(tmp_path),
            connect=lambda path: conn,
            table_renames={"Wierd1380": "Fixed1380"},
        )
        names = sorted(os.path.basename(p) for p in written)
        assert names == ["Fixed1380.csv", "R1400Data.csv", "U1400Data.csv"]
        assert conn.closed  # connection released even on success
        with open(os.path.join(str(tmp_path), "U1400Data.csv")) as fh:
            assert fh.read().splitlines() == ["ADRS,G01", "10001,5", "10002,7"]

    def test_replace_false_keeps_existing(self, tmp_path):
        existing = tmp_path / "U1400Data.csv"
        existing.write_text("KEEP\n")
        extract_access_tables(
            "year.mdb",
            str(tmp_path),
            connect=lambda path: FakeConnection(self.TABLES),
            replace=False,
        )
        assert existing.read_text() == "KEEP\n"

    def test_find_access_file(self, tmp_path):
        (tmp_path / "notes.txt").write_text("x")
        (tmp_path / "Data1400.MDB").write_bytes(b"\x00")
        assert find_access_file(str(tmp_path)).endswith("Data1400.MDB")
        empty = tmp_path / "empty"
        empty.mkdir()
        with pytest.raises(FileNotFoundError):
            find_access_file(str(empty))


FOOD_META = {
    "columns": {
        "ADRS": {"new_name": "ID", "type": "unsigned"},
        "G01": {"new_name": "Grams", "type": "float"},
        "Urban_Rural": {},
    },
    "missings": "error",
}


class TestSetup:
    def _archive(self, tmp_path, year, rows_u, rows_r):
        path = tmp_path / f"hbs{year}.zip"
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("Ufood.csv", "ADRS,G01\n" + "\n".join(rows_u) + "\n")
            zf.writestr("Rfood.csv", "ADRS,G01\n" + "\n".join(rows_r) + "\n")
        return path.as_uri()

    def test_one_call_bootstrap_to_queryable_table(self, spark, tmp_path):
        archives = {
            1399: self._archive(tmp_path, 1399, ["10001,5"], ["20001,3"]),
            1400: self._archive(tmp_path, 1400, ["10002,7"], ["20002,9"]),
        }
        root = setup(
            spark,
            archives,
            cleaning_metadata={"food": FOOD_META},
            workspace=str(tmp_path / "ws"),
        )
        assert os.path.isdir(os.path.join(root, "food", "Year=1400"))

        from hbsir_old_spark.api import HBSIREngine, partitioned_base_loader

        engine = HBSIREngine(spark, base_loader=partitioned_base_loader(spark, root))
        df = engine.load_table("food", [1399, 1400])
        rows = {(r["Year"], r["ID"]): r for r in df.collect()}
        assert len(rows) == 4
        assert rows[(1400, 10002)]["Grams"] == 7.0
        assert rows[(1399, 20001)]["Urban_Rural"] == "Rural"

    def test_missing_table_files_are_skipped(self, spark, tmp_path):
        url = self._archive(tmp_path, 1400, ["10001,5"], ["20001,3"])
        root = setup(
            spark,
            {1400: url},
            cleaning_metadata={"food": FOOD_META, "ghost": FOOD_META},
            workspace=str(tmp_path / "ws2"),
        )
        assert os.path.isdir(os.path.join(root, "food"))
        assert not os.path.exists(os.path.join(root, "ghost"))


def test_stubs_raise_with_guidance(tmp_path):
    rar = tmp_path / "x.rar"
    rar.write_bytes(b"Rar!")
    with pytest.raises(NotImplementedError, match="7z|unrar"):
        extract_archive(str(rar), str(tmp_path / "o"))
    with pytest.raises(NotImplementedError, match="pyodbc"):
        extract_access_tables("x.mdb", str(tmp_path))
    with pytest.raises(ValueError):
        extract_archive(str(tmp_path / "y.tar"), str(tmp_path / "o2"))


def test_real_1380_rename_map_plugs_into_extraction(tmp_path):
    """The corpus' unusual_names_of_1380 (other.yaml) is exactly the
    table_renames seam of extract_access_tables (reference
    archive_handler.py:364-369): the Farsi-suffixed 1380 catalog names
    come out as their canonical R80* file names."""
    from hbsir_old_spark.metadata.corpus import load_corpus

    renames = load_corpus().other["unusual_names_of_1380"]
    farsi_name = next(iter(renames))
    tables = {farsi_name: (["A"], [[1]])}
    written = extract_access_tables(
        "y1380.mdb",
        str(tmp_path),
        connect=lambda path: FakeConnection(tables),
        table_renames=renames,
    )
    assert [os.path.basename(p) for p in written] == [f"{renames[farsi_name]}.csv"]
    assert renames[farsi_name] == "R80P1"
