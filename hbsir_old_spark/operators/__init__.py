"""Generic, scale-first Spark operators implementing the reference's
operator inventory (SURVEY.md §2). All are lazy DataFrame -> DataFrame
transformations built from pyspark.sql.functions — no Python UDFs here.
"""

from hbsir_old_spark.operators.weighted import average_table, weighted_average  # noqa: F401
from hbsir_old_spark.operators.quantile import (  # noqa: F401
    add_quantile_bin,
    weighted_ecdf,
)
from hbsir_old_spark.operators.classification import (  # noqa: F401
    add_classification,
    build_classification_dim,
)
from hbsir_old_spark.operators.attributes import (  # noqa: F401
    extract_id_digits,
    map_codes,
)
from hbsir_old_spark.operators.reshape import melt, pivot_table, union_tables  # noqa: F401
from hbsir_old_spark.operators.temporal import (  # noqa: F401
    asof_join,
    funnel_counts,
    funnel_steps,
    retention_cohorts,
    rolling_aggregate,
    session_path_ngrams,
    sessionize_batch,
)
