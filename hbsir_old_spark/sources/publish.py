"""S11 — publish processed parquet artifacts to an object store.

The reference maintainer syncs the local processed-parquet directory to a
public S3-compatible bucket: it HEAD-checks each remote object's size,
classifies every local file Missing / UpToDate / OutDated (sizes within 5
bytes count as up to date), and uploads only the stale ones under the key
layout ``HBSIR/<directory>/<file>`` with a thread pool
(/root/reference/hbsir/maintainer.py:20-117).

This module reproduces that sync logic with the TRANSPORT injected — the
same pattern the Access-DB seam uses for its connection
(``acquire.extract_access_tables(conn=...)``): all decisions (staleness,
key layout, skip set) are plain testable logic over a two-method client
protocol, and the boto3 adapter is a thin, import-guarded shim. On a
cluster the heavy bytes never route through here anyway — Spark writes
``s3a://`` paths directly (``writer.write_partitioned``); this seam exists
for the reference's maintainer workflow of promoting locally-built
artifacts to the public bucket.
"""

from __future__ import annotations

import concurrent.futures
from dataclasses import dataclass, field
from pathlib import Path
from typing import Literal, Protocol

__all__ = [
    "BucketClient",
    "PublishReport",
    "boto3_bucket_client",
    "publish_directory",
    "scan_directory",
]

FileStatus = Literal["Missing", "UpToDate", "OutDated"]

#: remote-vs-local size slack under which a file counts as already
#: published (reference maintainer.py:64: ``abs(online - local) < 5``)
_SIZE_SLACK_BYTES = 5


class BucketClient(Protocol):
    """Minimal transport the sync needs: size lookup + upload.

    ``head_size`` returns the remote object's byte size, or ``None`` when
    the key does not exist (the reference derives the same tri-state from
    an HTTP HEAD's Content-Length, maintainer.py:69-75).

    A client MAY additionally expose ``put_file(key, path)``; when
    present, :func:`publish_directory` streams uploads through it instead
    of reading whole files into memory via ``put`` — with multi-GB
    parquet parts and a pooled uploader, ``max_workers`` whole files in
    RAM at once is exactly the spike the seam's own workflow would hit.
    """

    def head_size(self, key: str) -> int | None: ...

    def put(self, key: str, body: bytes) -> None: ...


@dataclass
class PublishReport:
    """What a publish run decided and did, for logs/tests."""

    statuses: dict[str, FileStatus] = field(default_factory=dict)
    uploaded: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)


def _object_key(online_directory: str, relative_name: str) -> str:
    # reference key layout: HBSIR/<directory>/<file> (maintainer.py:95-97)
    return f"HBSIR/{online_directory}/{relative_name}"


def _local_files(local_directory: Path, recursive: bool) -> dict[str, Path]:
    """Map of relative POSIX name -> path. ``recursive=True`` walks a
    partitioned-parquet layout (``table/Year=1400/part-*.parquet``) so a
    ``writer.write_partitioned`` output publishes with its directory
    structure as key suffixes; the reference's flat per-file layout is the
    non-recursive case."""
    if recursive:
        paths = (p for p in sorted(local_directory.rglob("*")) if p.is_file())
    else:
        paths = (p for p in sorted(local_directory.iterdir()) if p.is_file())
    return {
        p.relative_to(local_directory).as_posix(): p
        for p in paths
        # Spark sink bookkeeping never publishes
        if not p.name.startswith(("_", ".")) and not p.name.endswith(".crc")
    }


def scan_directory(
    local_directory: str | Path,
    online_directory: str,
    client: BucketClient,
    recursive: bool = False,
    max_workers: int = 6,
) -> dict[str, FileStatus]:
    """Classify every publishable local file against the remote store.

    Same tri-state and tolerance as the reference scan
    (maintainer.py:40-66): Missing (no remote object), UpToDate (size
    within 5 bytes), OutDated (size drifted). HEAD lookups fan out on a
    thread pool — they are network-bound metadata calls, exactly the
    reference's 6-worker executor shape (maintainer.py:42).
    """
    files = _local_files(Path(local_directory), recursive)

    def classify(name: str, path: Path) -> FileStatus:
        remote = client.head_size(_object_key(online_directory, name))
        if remote is None:
            return "Missing"
        if abs(remote - path.stat().st_size) < _SIZE_SLACK_BYTES:
            return "UpToDate"
        return "OutDated"

    with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {
            pool.submit(classify, name, path): name for name, path in files.items()
        }
        return {
            futures[f]: f.result()
            for f in concurrent.futures.as_completed(futures)
        }


def publish_directory(
    local_directory: str | Path,
    online_directory: str,
    client: BucketClient,
    recursive: bool = False,
    force: bool = False,
    max_workers: int = 6,
) -> PublishReport:
    """Upload every Missing/OutDated file (all files with ``force``);
    returns the per-file decision record. Mirrors the reference's
    update_online_directory (maintainer.py:30-37): scan first, then a
    thread-pooled upload of only the stale set."""
    local_directory = Path(local_directory)
    statuses = scan_directory(
        local_directory, online_directory, client,
        recursive=recursive, max_workers=max_workers,
    )
    report = PublishReport(statuses=statuses)
    to_upload = [
        name for name, status in sorted(statuses.items())
        if force or status != "UpToDate"
    ]
    report.skipped = [n for n in sorted(statuses) if n not in set(to_upload)]

    put_file = getattr(client, "put_file", None)

    def upload(name: str) -> None:
        key = _object_key(online_directory, name)
        path = local_directory.joinpath(name)
        if put_file is not None:
            put_file(key, path)  # streamed: constant memory per worker
        else:
            client.put(key, path.read_bytes())

    with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as pool:
        list(pool.map(upload, to_upload))
    report.uploaded = to_upload
    return report


def boto3_bucket_client(
    bucket_name: str,
    endpoint_url: str,
    access_key: str,
    secret_key: str,
    acl: str = "public-read",
) -> BucketClient:
    """Thin boto3 adapter for the protocol — the production transport
    (reference maintainer.py:100-117: Bucket.put_object with a public-read
    ACL). Import-guarded: boto3 is not in this container, so this raises
    with the install hint rather than at module import (same contract as
    the pyodbc / RAR seams in sources/acquire.py)."""
    try:
        import boto3  # type: ignore
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "S3 publishing needs the optional boto3 dependency "
            "(pip install boto3); the sync logic itself is transport-free "
            "and tested via an injected client"
        ) from exc

    bucket = boto3.resource(
        "s3",
        endpoint_url=endpoint_url,
        aws_access_key_id=access_key,
        aws_secret_access_key=secret_key,
    ).Bucket(bucket_name)

    from botocore.exceptions import ClientError  # type: ignore

    class _Boto3Client:
        def head_size(self, key: str) -> int | None:
            # one HEAD per file (the reference's shape, maintainer.py:69-75)
            # — NOT objects.filter(Prefix=...): a LIST enumerates every
            # prefix-sharing sibling, needs s3:ListBucket, and paginates
            try:
                return int(bucket.Object(key).content_length)
            except ClientError as exc:
                if exc.response.get("Error", {}).get("Code") in ("404", "NoSuchKey"):
                    return None
                raise

        def put(self, key: str, body: bytes) -> None:
            bucket.put_object(ACL=acl, Body=body, Key=key)

        def put_file(self, key: str, path) -> None:
            # streamed multipart upload, constant memory
            bucket.upload_file(str(path), key, ExtraArgs={"ACL": acl})

    return _Boto3Client()
