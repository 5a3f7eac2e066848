"""Parquet sinks (S4/S11) with the partition layout the 100 TB story needs.

The reference persists one parquet file per (year, table)
(/root/reference/hbsir/core/data_engine.py:231-234). At cluster scale the
same idea becomes *partitioned directories*: ``.../table/Year=1400/...`` so
every year-filtered query prunes partitions at planning time
(``PartitionFilters`` in the scan) and multi-year loads parallelize over
files. S3 publishing is the same call with an ``s3a://`` path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("Year",),
    mode: str = "overwrite",
) -> None:
    """Write a table partitioned by the given columns (default Year —
    matching the engine's per-year planning so partition pruning lines up
    with availability pruning)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; partition columns come back typed by
    inference and filters on them prune directories, not rows."""
    return spark.read.parquet(path)
