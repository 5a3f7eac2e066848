"""Sources/sinks: CSV-to-cleaned compiler, parquet IO, fingerprinted cache
of derived tables (SURVEY §2.1)."""

from hbsir_old_spark.sources.cleaner import clean_table, scrub_string  # noqa: F401
from hbsir_old_spark.sources.cache import FingerprintCache  # noqa: F401
