"""Named standard-table transforms (the X1 external-function registry).

Reference parity: /root/reference/hbsir/schema_functions/standard_tables.py
(number of members A2, equivalence scales P12, season P11) — re-expressed as
single Spark aggregations / column expressions. These are the only
"external functions" the reference schema calls; the registry pattern
replaces arbitrary ``module.fn`` imports with an explicit allowlist.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEASONS = {1: "Spring", 2: "Summer", 3: "Autumn", 4: "Winter"}


def number_of_members(df: DataFrame) -> DataFrame:
    """A2: household size — Members=count, Adults=count(Age>=14),
    Childs=Members-Adults; one groupBy aggregation."""
    out = df.groupBy("Year", "ID").agg(
        F.count("Member_Number").alias("Members"),
        F.sum(F.when(F.col("Age") >= 14, 1).otherwise(0)).alias("Adults"),
    )
    return out.withColumn("Childs", F.col("Members") - F.col("Adults"))


def equivalence_scale(df: DataFrame) -> DataFrame:
    """P12: household equivalence scales over Number_of_Members output —
    reference-exact fields (standard_tables.py:16-26): Household ≡ 1 ("no
    adjustment"), Per_Capita = Members, OECD / OECD_Modified / Square_Root."""
    return df.select(
        "Year",
        "ID",
        F.lit(1.0).alias("Household"),
        F.col("Members").cast("double").alias("Per_Capita"),
        (0.7 * F.col("Adults") + 0.3 + 0.5 * F.col("Childs")).alias("OECD"),
        (0.5 * F.col("Adults") + 0.5 + 0.3 * F.col("Childs")).alias("OECD_Modified"),
        F.sqrt(F.col("Members")).alias("Square_Root"),
    )


def add_season(df: DataFrame) -> DataFrame:
    """P11: Month -> Season label, reference-exact formula ``Month // 3 + 1``
    (standard_tables.py:29-38). Note the inherited quirk: month 12 maps to
    code 5, which has no season label and therefore yields null — replicated
    deliberately for parity (unlike the bugs listed in SURVEY §5, this is
    observable reference behavior, not an implementation accident)."""
    quarter = (F.floor(F.col("Month") / 3) + 1).cast("int")
    season_map = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in SEASONS.items())
    )
    return df.withColumn("Season", season_map[quarter])


DEFAULT_EXTERNAL_FUNCTIONS = {
    "number_of_members": number_of_members,
    "equivalence_scale": equivalence_scale,
    "add_season": add_season,
}
