"""Raw-data acquisition utilities (reference parity: S6/S7 —
archive_handler.py download/unpack + Access extraction, SURVEY §2.1).

These are DRIVER utilities, not engine operators (the reference runs them
once at setup). Implemented with the stdlib where possible:

* :func:`download` — urllib with resumable-overwrite semantics (supports
  file:// URLs, which is how tests exercise it offline);
* :func:`extract_archive` — zip via ``zipfile``; rar archives need an
  external tool (the reference shells out to 7z) and raise with a clear
  message here;
* :func:`extract_access_tables` — the reference's table-enumeration /
  CSV-emit logic (archive_handler.py:307-376) over an injectable
  connection factory; only the pyodbc driver import itself is
  environment-gated (no ODBC driver in this sandbox);
* :func:`setup` — the one-call bootstrap (reference api.py:612-657):
  download -> unpack -> locate per-table urban/rural CSVs -> clean ->
  Year-partitioned parquet, ready for ``partitioned_base_loader``.

After extraction, CSVs enter the engine through
``sources.cleaner.load_raw_csv`` (S1).
"""

from __future__ import annotations

import csv
import os
import shutil
import subprocess
import urllib.request
import zipfile
from typing import Callable, Mapping, Sequence


def download(url: str, dest: str, overwrite: bool = False) -> str:
    """Fetch ``url`` to ``dest`` (http(s)/file schemes)."""
    if os.path.exists(dest) and not overwrite:
        return dest
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with urllib.request.urlopen(url) as response, open(dest, "wb") as out:
        shutil.copyfileobj(response, out)
    return dest


def _find_unrar_tool() -> "tuple[str, str] | None":
    """Locate an external tool that can unpack rar archives (reference
    parity: seven_zip_utils.py:9-26 shells to a downloaded 7z binary; here
    detection is env-based). Returns (tool_path, flavor) or None."""
    for candidate, flavor in (
        ("7z", "7z"),
        ("7za", "7z"),
        ("7zz", "7z"),
        ("unrar", "unrar"),
    ):
        found = shutil.which(candidate)
        if found:
            return found, flavor
    return None


def _run_unrar_tool(tool: "tuple[str, str]", path: str, dest_dir: str) -> None:
    exe, flavor = tool
    if flavor == "7z":
        cmd = [exe, "x", "-y", f"-o{dest_dir}", path]
    else:
        cmd = [exe, "x", "-y", path, dest_dir + os.sep]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"{exe} failed to extract {path!r} (exit {proc.returncode}): "
            f"{proc.stderr.strip() or proc.stdout.strip()}"
        )


def extract_archive(path: str, dest_dir: str, recursive: bool = True) -> list[str]:
    """Unpack an archive; nested archives are extracted recursively (the
    reference's RAR-in-RAR layout). Returns extracted file paths."""
    os.makedirs(dest_dir, exist_ok=True)
    if path.lower().endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            zf.extractall(dest_dir)
    elif path.lower().endswith(".rar"):
        tool = _find_unrar_tool()
        if tool is None:
            raise NotImplementedError(
                "rar extraction needs an external tool (7z/7za/7zz/unrar on "
                "PATH — the reference shells to 7z, seven_zip_utils.py:9-26); "
                "none found — zip archives work out of the box"
            )
        _run_unrar_tool(tool, path, dest_dir)
    else:
        raise ValueError(f"unsupported archive type: {path!r}")
    # snapshot the tree BEFORE recursing — nested extraction mutates
    # dest_dir, and walking lazily would re-visit (and re-extract) the
    # directories the recursion just created
    snapshot = [
        os.path.join(root, fname)
        for root, _, files in os.walk(dest_dir)
        for fname in files
    ]
    extracted: list[str] = []
    for full in snapshot:
        if recursive and full.lower().endswith((".zip", ".rar")) and full != path:
            extracted.extend(extract_archive(full, full + ".d"))
        else:
            extracted.append(full)
    return extracted


def find_access_file(directory: str) -> str:
    """Locate the single .mdb/.accdb file in a year directory (reference
    archive_handler.py:_find_access_file_by_extension)."""
    for fname in sorted(os.listdir(directory)):
        if fname.lower().endswith((".mdb", ".accdb")):
            return os.path.join(directory, fname)
    raise FileNotFoundError(f"no Access file (*.mdb/*.accdb) under {directory!r}")


def _default_access_connect(mdb_path: str):
    """The only environment-gated piece: the pyodbc driver import. Platform
    driver selection mirrors reference archive_handler.py:_make_connection_string."""
    try:
        import pyodbc  # type: ignore[import-not-found]
    except ImportError as exc:
        raise NotImplementedError(
            "MS Access extraction requires pyodbc + an Access ODBC driver "
            "(Windows: 'Microsoft Access Driver', elsewhere: MDBTools); "
            "install one, or pass connect= with your own connection factory"
        ) from exc
    import platform

    driver = (
        "Microsoft Access Driver (*.mdb, *.accdb)"
        if platform.system() == "Windows"
        else "MDBTools"
    )
    return pyodbc.connect(f"DRIVER={{{driver}}};DBQ={mdb_path};")


def extract_access_tables(
    mdb_path: str,
    dest_dir: str,
    connect: "Callable[[str], object] | None" = None,
    replace: bool = True,
    table_renames: Mapping[str, str] | None = None,
) -> list[str]:
    """Dump every user table of an MS Access file to one CSV each
    (reference archive_handler.py:307-376).

    The catalog walk, system-table filter (names containing ``MSys``),
    per-table ``SELECT * FROM [name]``, header capture from
    ``cursor.description``, skip-on-driver-error behavior, and the
    1380-style rename map are all real logic here; only the default
    ``connect`` factory needs a driver. Returns the written CSV paths.
    """
    os.makedirs(dest_dir, exist_ok=True)
    connection = (connect or _default_access_connect)(mdb_path)
    written: list[str] = []
    try:
        cursor = connection.cursor()
        names = [t.table_name for t in cursor.tables()]
        names = [n for n in names if "MSys" not in n]
        for name in names:
            out_name = (table_renames or {}).get(name, name)
            file_path = os.path.join(dest_dir, f"{out_name}.csv")
            if os.path.exists(file_path) and not replace:
                written.append(file_path)
                continue
            try:
                # ODBC bracket quoting: a ']' inside the (catalog-supplied,
                # untrusted) table name must be doubled or it closes the
                # quote and the rest of the name is spliced as raw SQL
                cursor.execute(f"SELECT * FROM [{name.replace(']', ']]')}]")
                rows = cursor.fetchall()
                headers = [c[0] for c in cursor.description]
            except Exception:  # driver-specific errors — skip, like the reference
                continue
            with open(file_path, "w", newline="", encoding="utf-8") as out:
                writer = csv.writer(out)
                writer.writerow(headers)
                writer.writerows(rows)
            written.append(file_path)
    finally:
        close = getattr(connection, "close", None)
        if close is not None:
            close()
    return written


def _default_csv_locator(
    table: str, files: Sequence[str]
) -> "tuple[str | None, str | None]":
    """Match the reference's urban/rural file naming: ``U<table>.csv`` /
    ``R<table>.csv`` (or ``<table>_U.csv`` / ``<table>_R.csv``),
    case-insensitive."""
    urban = rural = None
    t = table.lower()
    for path in files:
        base = os.path.basename(path).lower()
        if base in (f"u{t}.csv", f"{t}_u.csv"):
            urban = path
        elif base in (f"r{t}.csv", f"{t}_r.csv"):
            rural = path
    return urban, rural


def setup(
    spark,
    archives: Mapping[int, str],
    cleaning_metadata: Mapping[str, Mapping],
    workspace: str,
    table_names: "Sequence[str] | str" = "all",
    replace: bool = False,
    csv_locator: "Callable[[str, Sequence[str]], tuple[str | None, str | None]] | None" = None,
) -> str:
    """One-call bootstrap (reference api.py:612-657): for every year,
    download the archive, unpack it (nested archives included), locate each
    table's urban/rural CSVs, clean them with the table's column metadata,
    and write one Year-partitioned parquet table per name under
    ``{workspace}/cleaned`` — the layout ``partitioned_base_loader`` reads.

    ``archives`` maps year -> URL (``file://`` works, which is how tests
    run offline). Returns the cleaned root directory.
    """
    from pyspark.sql import functions as F

    from hbsir_old_spark.sources.cleaner import clean_table, load_raw_csv
    from hbsir_old_spark.sources.writer import write_partitioned

    tables = (
        list(cleaning_metadata) if table_names == "all" else list(table_names)
    )
    locate = csv_locator or _default_csv_locator
    cleaned_root = os.path.join(workspace, "cleaned")
    per_table: dict[str, list] = {t: [] for t in tables}
    for year, url in sorted(archives.items()):
        archive_path = download(
            url,
            os.path.join(workspace, "downloads", f"{year}_{os.path.basename(url)}"),
            overwrite=replace,
        )
        files = extract_archive(archive_path, os.path.join(workspace, "unpacked", str(year)))
        for table in tables:
            urban, rural = locate(table, files)
            if urban is None and rural is None:
                continue
            raw = load_raw_csv(spark, urban, rural)
            cleaned = clean_table(raw, cleaning_metadata[table], year)
            per_table[table].append(cleaned.withColumn("Year", F.lit(year)))
    for table, parts in per_table.items():
        if not parts:
            continue
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df, allowMissingColumns=True)
        write_partitioned(out, os.path.join(cleaned_root, table))
    return cleaned_root
