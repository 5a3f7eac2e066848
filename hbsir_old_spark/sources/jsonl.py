"""JSONL document ingestion — the training-corpus wire format.

Schema-ENFORCED reads: ``spark.read.schema(...).json`` never infers (an
inference pass over 100 TB would double the read, and schema drift between
shards would silently widen types). Malformed lines are captured, not
fatal: PERMISSIVE mode routes them to a corrupt-record column so one bad
shard cannot kill a corpus build, and the bad lines stay auditable.

Spark quirk worth pinning: a query that references ONLY the corrupt-record
column of a JSON scan is disallowed (the parser prunes the data columns it
would need to decide corruption); :func:`split_corrupt` therefore keeps
data columns in the bad-side projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read newline-delimited JSON with an enforced schema; malformed lines
    land in ``corrupt_col`` (data columns null) instead of failing the job.
    """
    if corrupt_col in schema.fieldNames():
        full = schema
    else:
        full = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
        )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, corrupt rows with it)."""
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull())
    return good, bad
