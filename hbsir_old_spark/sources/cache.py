"""Dependency-fingerprinted cache for expensive derived tables.

Reference parity: the reference caches ``cache_result: true`` tables as
parquet plus a YAML snapshot of the resolved dependency tree, rebuilding
when the tree changes (/root/reference/hbsir/core/data_engine.py:515-610).
Same algorithm here, driver-side: fingerprint = sha256 over (resolved
schema subtree, base-file size/mtime stats); storage = parquet + JSON
sidecar. On a cluster the cache directory lives on shared storage and the
materialized parquet doubles as a shuffle-free, partition-pruned input for
downstream plans.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def stable_fingerprint(payload: Any) -> str:
    """Deterministic fingerprint of a JSON-serializable structure."""
    blob = json.dumps(payload, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()


class FingerprintCache:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, table: str, year: int) -> tuple[str, str]:
        base = os.path.join(self.root, f"{year}_{table}")
        return base + ".parquet", base + ".meta.json"

    def get(self, spark: SparkSession, table: str, year: int, fingerprint: str) -> DataFrame | None:
        data_path, meta_path = self._paths(table, year)
        if not (os.path.exists(data_path) and os.path.exists(meta_path)):
            return None
        try:
            with open(meta_path) as fh:
                meta = json.load(fh)
        except (OSError, json.JSONDecodeError):
            return None
        if meta.get("fingerprint") != fingerprint:
            return None
        return spark.read.parquet(data_path)

    def put(self, df: DataFrame, table: str, year: int, fingerprint: str) -> DataFrame:
        data_path, meta_path = self._paths(table, year)
        df.write.mode("overwrite").parquet(data_path)
        with open(meta_path, "w") as fh:
            json.dump({"table": table, "year": year, "fingerprint": fingerprint}, fh)
        return df.sparkSession.read.parquet(data_path)
