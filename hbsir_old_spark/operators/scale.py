"""Scale-path operators: bucketed co-located joins and skew-salted joins.

These are the two levers for 100 TB fact-fact joins that the rest of the
engine's broadcast-dimension design doesn't cover:

* **bucketing** — write both facts bucketed+sorted by the join key; later
  joins co-locate partitions and skip the shuffle entirely (plan shows a
  SortMergeJoin with NO Exchange on either side).
* **salting** — when one side's key distribution is heavily skewed and AQE's
  runtime skew-split isn't available (e.g. non-AQE deployments or
  aggregation-feeding joins), explode the hot side's keys into ``factor``
  salted variants and replicate the other side per salt; results are
  identical to the plain join.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Sequence
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _clear_stale_table_location(spark: SparkSession, table_name: str) -> None:
    """Remove a managed-table location that survives from a PREVIOUS
    process: a fresh session's metastore has no entry for it, so
    ``saveAsTable(mode="overwrite")`` cannot drop-and-recreate and raises
    LOCATION_ALREADY_EXISTS instead (seen when a driver run leaves
    ``spark-warehouse/<table>`` behind and a later pytest session writes
    the same table). Only local ``file:`` warehouses are handled — on a
    cluster with a shared metastore the catalog entry exists and the
    normal DROP TABLE path below owns the cleanup."""
    warehouse = urlparse(str(spark.conf.get("spark.sql.warehouse.dir")))
    if warehouse.scheme not in ("", "file"):
        return
    parts = table_name.split(".")
    root = Path(warehouse.path)
    if len(parts) == 2:
        root = root / f"{parts[0].lower()}.db"
    location = root / parts[-1].lower()
    if location.is_dir():
        shutil.rmtree(location, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: Sequence[str],
    num_buckets: int = 16,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a fact table bucketed (and optionally sorted) by its join
    key. Requires a session catalog (saveAsTable); reading the table back
    and joining on the bucket key produces an exchange-free plan."""
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        if not spark.catalog.tableExists(table_name):
            _clear_stale_table_location(spark, table_name)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key — co-located,
    shuffle-free when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a skewed ``on`` key on the LEFT side.

    Left rows get a deterministic salt in [0, factor) (hash of the full
    row's key + a uniform spread via monotonically varying component is NOT
    used — pure key hash would keep the skew, so the salt comes from
    ``rand``-free row identity: ``xxhash64`` of all left columns). Right
    rows are replicated once per salt value. Output equals the plain join
    for inner/left/semi/anti joins; right/full outer joins would duplicate
    unmatched right rows per salt and are rejected.
    """
    if how.replace("_outer", "") in ("right", "full", "outer"):
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched right rows "
            "would appear once per salt replica"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(factor))
    left_salted = left.withColumn("__salt__", salt)
    right_salted = right.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    out = left_salted.join(right_salted, [on, "__salt__"], how)
    return out.drop("__salt__")
