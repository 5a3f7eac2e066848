"""Driver-side metadata kernel: integer range-set algebra, year-versioned
metadata resolution, and the settings cascade.

These manipulate dicts, never data — they run on the driver and *compile to*
Spark constructs (StructTypes, select/cast lists, when-chains, broadcast
dimension DataFrames).
"""

from hbsir_old_spark.metadata.ranges import CodeRangeSet  # noqa: F401
from hbsir_old_spark.metadata.versioning import (  # noqa: F401
    ResolverSettings,
    categorize_items,
    is_versioned,
    resolve_versioned,
)
