"""Geo source + geometry join (S10/J8, reference map_drawer.py:8-43):
broadcast WKT-dimension join, area auto-detection, and the import-guarded
GeoPandas reader seam."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.operators.geo import (  # noqa: E402
    add_geometry,
    geometry_dim,
    load_geometry_dim,
)

try:
    import geopandas  # type: ignore[import-not-found]  # noqa: F401

    HAS_GPD = True
except ImportError:
    HAS_GPD = False

WKTS = {
    "Tehran": "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    "Fars": "POLYGON ((2 0, 3 0, 3 1, 2 1, 2 0))",
}


def test_add_geometry_joins_by_province(spark):
    dim = geometry_dim(spark, WKTS)
    df = spark.createDataFrame(
        [(1, "Tehran"), (2, "Fars"), (3, "Gilan")], "ID long, Province string"
    )
    out = {r["Province"]: r["geometry"] for r in add_geometry(df, dim).collect()}
    assert out["Tehran"] == WKTS["Tehran"]
    assert out["Gilan"] is None  # left join keeps unmatched areas


def test_add_geometry_prefers_region_over_province(spark):
    dim = geometry_dim(spark, {"North": "POINT (0 1)"}, area="Region")
    df = spark.createDataFrame(
        [("North", "Tehran")], "Region string, Province string"
    )
    out = add_geometry(df, dim).collect()
    assert out[0]["geometry"] == "POINT (0 1)"


def test_add_geometry_autodetect_prefers_dim_key_column(spark):
    # review finding: a Province-keyed dim joined onto a table carrying BOTH
    # Region and Province must auto-detect Province (the dim's key), not
    # Region (the priority order) — the latter silently yields NULLs
    dim = geometry_dim(spark, WKTS)  # Province-keyed
    df = spark.createDataFrame(
        [("North", "Tehran")], "Region string, Province string"
    )
    out = add_geometry(df, dim).collect()
    assert out[0]["geometry"] == WKTS["Tehran"]


def test_add_geometry_errors_without_area_column(spark):
    dim = geometry_dim(spark, WKTS)
    df = spark.createDataFrame([(1,)], "ID long")
    with pytest.raises(ValueError, match="Region/Province"):
        add_geometry(df, dim)
    with pytest.raises(ValueError, match="not in table"):
        add_geometry(df, dim, area="County")


def test_geometry_dim_is_broadcast_in_plan(spark):
    dim = geometry_dim(spark, WKTS)
    df = spark.createDataFrame([(1, "Tehran")], "ID long, Province string")
    plan = add_geometry(df, dim)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


@pytest.mark.skipif(HAS_GPD, reason="geopandas present: guard not reachable")
def test_load_geometry_dim_raises_without_geopandas(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="geopandas"):
        load_geometry_dim(
            spark, str(tmp_path / "map.shp"), "ID", {}, {}, area="Province"
        )


@pytest.mark.skipif(not HAS_GPD, reason="geopandas not installed")
def test_load_geometry_dim_decodes_codes(spark, tmp_path):
    import geopandas as gpd
    from shapely.geometry import Point

    path = str(tmp_path / "map.geojson")
    gpd.GeoDataFrame(
        {"CODE": [23, 7], "geometry": [Point(0, 0), Point(1, 1)]}
    ).to_file(path, driver="GeoJSON")
    dim = load_geometry_dim(
        spark,
        path,
        code_column="CODE",
        codes={"tehran": 23, "fars": 7},
        area_names={"tehran": "Tehran", "fars": "Fars"},
    )
    rows = {r["Province"]: r["geometry"] for r in dim.collect()}
    assert rows["Tehran"].startswith("POINT")
