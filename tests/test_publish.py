"""S11 publish seam (sources/publish.py): the reference maintainer's
size-based sync logic, proven against an injected in-memory bucket client —
the same injectable-transport pattern as the Access-DB connection test."""

import os
import sys
import threading

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.sources.publish import (  # noqa: E402
    publish_directory,
    scan_directory,
)
from hbsir_old_spark.sources.writer import write_partitioned  # noqa: E402


class FakeBucket:
    """In-memory BucketClient; thread-safe because the seam fans out."""

    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.put_calls: list[str] = []
        self._lock = threading.Lock()

    def head_size(self, key):
        with self._lock:
            body = self.objects.get(key)
        return None if body is None else len(body)

    def put(self, key, body):
        with self._lock:
            self.objects[key] = bytes(body)
            self.put_calls.append(key)


def _mkfiles(tmp_path, files):
    for name, content in files.items():
        p = tmp_path / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(content)


def test_publish_uploads_missing_then_skips_up_to_date(tmp_path):
    _mkfiles(tmp_path, {"1400_food.parquet": b"a" * 100, "1401_food.parquet": b"b" * 50})
    bucket = FakeBucket()

    first = publish_directory(tmp_path, "parquet_files", bucket)
    assert first.statuses == {
        "1400_food.parquet": "Missing",
        "1401_food.parquet": "Missing",
    }
    # reference key layout: HBSIR/<directory>/<file> (maintainer.py:95-97)
    assert set(bucket.objects) == {
        "HBSIR/parquet_files/1400_food.parquet",
        "HBSIR/parquet_files/1401_food.parquet",
    }
    assert bucket.objects["HBSIR/parquet_files/1400_food.parquet"] == b"a" * 100

    # second run: everything UpToDate, nothing re-uploaded
    bucket.put_calls.clear()
    second = publish_directory(tmp_path, "parquet_files", bucket)
    assert set(second.statuses.values()) == {"UpToDate"}
    assert second.uploaded == [] and bucket.put_calls == []
    assert sorted(second.skipped) == ["1400_food.parquet", "1401_food.parquet"]


def test_publish_reuploads_outdated_only(tmp_path):
    _mkfiles(tmp_path, {"a.parquet": b"x" * 100, "b.parquet": b"y" * 100})
    bucket = FakeBucket()
    publish_directory(tmp_path, "d", bucket)

    # drift a.parquet beyond the 5-byte slack; b stays within it
    (tmp_path / "a.parquet").write_bytes(b"x" * 200)
    (tmp_path / "b.parquet").write_bytes(b"y" * 103)
    statuses = scan_directory(tmp_path, "d", bucket)
    assert statuses == {"a.parquet": "OutDated", "b.parquet": "UpToDate"}

    bucket.put_calls.clear()
    report = publish_directory(tmp_path, "d", bucket)
    assert report.uploaded == ["a.parquet"]
    assert bucket.objects["HBSIR/d/a.parquet"] == b"x" * 200


def test_publish_force_reuploads_everything(tmp_path):
    _mkfiles(tmp_path, {"a.parquet": b"x" * 10})
    bucket = FakeBucket()
    publish_directory(tmp_path, "d", bucket)
    bucket.put_calls.clear()
    report = publish_directory(tmp_path, "d", bucket, force=True)
    assert report.uploaded == ["a.parquet"] and bucket.put_calls


def test_publish_ignores_subdirs_and_bookkeeping_files(tmp_path):
    _mkfiles(
        tmp_path,
        {
            "keep.parquet": b"k",
            "_SUCCESS": b"",
            ".keep.parquet.crc": b"c",
            "sub/inner.parquet": b"i",
        },
    )
    bucket = FakeBucket()
    report = publish_directory(tmp_path, "d", bucket)
    # non-recursive (the reference's flat layout): subdir + sink
    # bookkeeping excluded (maintainer.py:43-45 skips dirs)
    assert report.uploaded == ["keep.parquet"]


def test_publish_partitioned_spark_output_recursively(tmp_path, spark):
    # the Spark-era layout: a write_partitioned dataset publishes with its
    # Year=... directory structure as key suffixes
    df = spark.createDataFrame(
        [(1400, 1, 10.0), (1401, 2, 20.0)], ["Year", "ID", "value"]
    )
    out = str(tmp_path / "table")
    write_partitioned(df, out, partition_cols=("Year",))
    bucket = FakeBucket()
    report = publish_directory(out, "parquet_files", bucket, recursive=True)
    assert report.uploaded, "no parquet parts published"
    assert all(k.startswith("HBSIR/parquet_files/Year=") for k in bucket.objects)
    assert {k.split("/")[2] for k in bucket.objects} == {"Year=1400", "Year=1401"}
    # bookkeeping never publishes
    assert not any("_SUCCESS" in k or k.endswith(".crc") for k in bucket.objects)


def test_boto3_adapter_is_a_guarded_seam():
    from hbsir_old_spark.sources.publish import boto3_bucket_client

    try:
        import boto3  # noqa: F401
    except ImportError:
        # without the optional dependency the adapter must fail with the
        # actionable install hint, not an ImportError at module import
        with pytest.raises(NotImplementedError, match="boto3"):
            boto3_bucket_client("b", "https://example.invalid", "k", "s")
        return
    # with boto3 present, adapter construction is offline (no network
    # until head/put) and must satisfy the BucketClient protocol
    client = boto3_bucket_client("b", "https://example.invalid", "k", "s")
    assert callable(client.head_size) and callable(client.put)


def test_put_file_streaming_path_preferred_when_available(tmp_path):
    # a client exposing put_file gets the streamed path (no whole-file
    # bytes through put); plain two-method clients keep working via put
    class StreamingBucket(FakeBucket):
        def __init__(self):
            super().__init__()
            self.streamed: list[str] = []

        def put_file(self, key, path):
            with self._lock:
                self.objects[key] = path.read_bytes()
                self.streamed.append(key)

    _mkfiles(tmp_path, {"a.parquet": b"x" * 64})
    bucket = StreamingBucket()
    report = publish_directory(tmp_path, "d", bucket)
    assert report.uploaded == ["a.parquet"]
    assert bucket.streamed == ["HBSIR/d/a.parquet"]
    assert bucket.put_calls == []  # whole-bytes path never used
    assert bucket.objects["HBSIR/d/a.parquet"] == b"x" * 64
