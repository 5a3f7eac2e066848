"""Raw-data acquisition utilities (reference parity: S6/S7 —
archive_handler.py download/unpack + Access extraction, SURVEY §2.1).

These are DRIVER utilities, not engine operators (the reference runs them
once at setup). Implemented with the stdlib where possible:

* :func:`download` — urllib with resumable-overwrite semantics (supports
  file:// URLs, which is how tests exercise it offline);
* :func:`extract_archive` — zip via ``zipfile``; rar archives need an
  external tool (the reference shells out to 7z) and raise with a clear
  message here;
* :func:`extract_access_tables` — MS Access requires an ODBC driver
  (pyodbc); stubbed with the exact extension point documented.

After extraction, CSVs enter the engine through
``sources.cleaner.load_raw_csv`` (S1).
"""

from __future__ import annotations

import os
import shutil
import urllib.request
import zipfile


def download(url: str, dest: str, overwrite: bool = False) -> str:
    """Fetch ``url`` to ``dest`` (http(s)/file schemes)."""
    if os.path.exists(dest) and not overwrite:
        return dest
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with urllib.request.urlopen(url) as response, open(dest, "wb") as out:
        shutil.copyfileobj(response, out)
    return dest


def extract_archive(path: str, dest_dir: str, recursive: bool = True) -> list[str]:
    """Unpack an archive; nested archives are extracted recursively (the
    reference's RAR-in-RAR layout). Returns extracted file paths."""
    os.makedirs(dest_dir, exist_ok=True)
    if path.lower().endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            zf.extractall(dest_dir)
    elif path.lower().endswith(".rar"):
        raise NotImplementedError(
            "rar extraction needs an external tool (e.g. 7z/unrar); "
            "install one and extend extract_archive — zip archives work out of the box"
        )
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


def extract_access_tables(mdb_path: str, dest_dir: str) -> list[str]:
    """Dump every table of an MS Access file to CSV (reference
    archive_handler.py:307-376 uses pyodbc). Requires an Access ODBC
    driver, absent in this environment."""
    raise NotImplementedError(
        "MS Access extraction requires pyodbc + the Access ODBC driver; "
        "implement by listing tables via the driver catalog and writing one "
        "CSV per table into dest_dir, then feed them to sources.cleaner.load_raw_csv"
    )
