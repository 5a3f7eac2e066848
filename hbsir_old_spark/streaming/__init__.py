from hbsir_old_spark.streaming.events import (  # noqa: F401
    sessionize,
    sliding_counts,
    tumbling_stats,
)
