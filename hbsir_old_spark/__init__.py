"""hbsir_old_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference pandas library
(Iran-Open-Data/HBSIR_OLD, surveyed in SURVEY.md).

Design: metadata (YAML schema resolution, code-range algebra, settings) stays
driver-side pure Python; every data operation is expressed as a lazy PySpark
DataFrame transformation so Catalyst fuses whole pipelines into one optimized
plan. No RDDs; Python UDFs only where built-ins genuinely cannot express the
semantics (and then Arrow-vectorized).
"""

__version__ = "0.1.0"

from hbsir_old_spark.session import get_spark  # noqa: F401
