"""Plan layer: compiles metadata-declared table builds into lazy Spark
DataFrame transformations (the reference's Pipeline/TableFactory,
re-expressed as a compiler instead of an eager interpreter — SURVEY §3.1,
§7.1)."""

from hbsir_old_spark.plans.filters import translate_pandas_query  # noqa: F401
from hbsir_old_spark.plans.pipeline import PipelineCompiler  # noqa: F401
from hbsir_old_spark.plans.registry import TableRegistry  # noqa: F401
