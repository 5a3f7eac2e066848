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


# -- WKT polygon analytics (the S10 residual: make add_geometry output
# analyzable — area/centroid via JVM-side shoelace, no UDF) -------------------


def _py_shoelace(verts):
    """Pure-Python cross-check: (area, (cx, cy)) of a closed ring."""
    signed = sum(
        verts[i][0] * verts[i + 1][1] - verts[i + 1][0] * verts[i][1]
        for i in range(len(verts) - 1)
    )
    cx = sum(
        (verts[i][0] + verts[i + 1][0])
        * (verts[i][0] * verts[i + 1][1] - verts[i + 1][0] * verts[i][1])
        for i in range(len(verts) - 1)
    ) / (3 * signed)
    cy = sum(
        (verts[i][1] + verts[i + 1][1])
        * (verts[i][0] * verts[i + 1][1] - verts[i + 1][0] * verts[i][1])
        for i in range(len(verts) - 1)
    ) / (3 * signed)
    return abs(signed) / 2, (cx, cy)


def test_wkt_polygon_area_and_centroid(spark):
    from pyspark.sql import functions as F

    from hbsir_old_spark.operators.geo import (
        wkt_polygon_area,
        wkt_polygon_centroid,
    )

    # unit square (known closed form), a clockwise ring (negative signed
    # area -> same |area| and centroid), and an irregular non-convex pentagon
    pent = [(3, 0), (7, 1), (6, 6), (4, 8), (2, 2), (3, 0)]
    rows = [
        ("sq", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        ("cw", "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
        ("pent", "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in pent) + "))"),
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "name string, geometry string")
    out = {
        r["name"]: r
        for r in df.select(
            "name",
            wkt_polygon_area("geometry").alias("area"),
            wkt_polygon_centroid("geometry").alias("c"),
        ).collect()
    }
    assert out["sq"]["area"] == 1.0
    assert (out["sq"]["c"]["cx"], out["sq"]["c"]["cy"]) == (0.5, 0.5)
    assert out["cw"]["area"] == 1.0
    assert (out["cw"]["c"]["cx"], out["cw"]["c"]["cy"]) == (0.5, 0.5)
    exp_area, (exp_cx, exp_cy) = _py_shoelace(pent)
    assert out["pent"]["area"] == exp_area
    assert abs(out["pent"]["c"]["cx"] - exp_cx) < 1e-12
    assert abs(out["pent"]["c"]["cy"] - exp_cy) < 1e-12
    # NULL geometry (the unmatched left-join row) -> NULL analytics
    assert out["none"]["area"] is None and out["none"]["c"] is None


def test_wkt_polygon_degenerate_and_plan(spark):
    from pyspark.sql import functions as F

    from hbsir_old_spark.operators.geo import (
        wkt_polygon_area,
        wkt_polygon_centroid,
    )

    # zero-area (collinear) ring: area 0, centroid NULL (no division error);
    # non-polygon garbage: NULL, not an exception
    df = spark.createDataFrame(
        [
            ("flat", "POLYGON ((0 0, 1 1, 2 2, 0 0))"),
            ("junk", "LINESTRING (0 0, 1 1)"),
        ],
        "name string, geometry string",
    )
    out = {
        r["name"]: r
        for r in df.select(
            "name",
            wkt_polygon_area("geometry").alias("area"),
            wkt_polygon_centroid("geometry").alias("c"),
        ).collect()
    }
    assert out["flat"]["area"] == 0.0 and out["flat"]["c"] is None
    assert out["junk"]["area"] is None and out["junk"]["c"] is None
    # the whole computation is expression-only: no BatchEvalPython /
    # ArrowEvalPython node may appear in the plan (UDF-free contract)
    plan = df.select(
        wkt_polygon_area("geometry").alias("a")
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_wkt_unsupported_geometry_is_null_not_wrong(spark):
    from hbsir_old_spark.operators.geo import (
        wkt_polygon_area,
        wkt_polygon_centroid,
    )

    # the ring regexp stops at the first ')': without the one-ring guard a
    # POLYGON with a hole or a MULTIPOLYGON would silently compute the
    # outer/first ring's area — a plausible WRONG number. The contract is
    # outer-ring-only simple polygons; anything else must be NULL.
    df = spark.createDataFrame(
        [
            (
                "hole",
                "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                "(2 2, 4 2, 4 4, 2 4, 2 2))",
            ),
            (
                "multi",
                "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 0)), "
                "((10 10, 14 10, 14 14, 10 10)))",
            ),
            ("simple", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        ],
        "name string, geometry string",
    )
    out = {
        r["name"]: r
        for r in df.select(
            "name",
            wkt_polygon_area("geometry").alias("area"),
            wkt_polygon_centroid("geometry").alias("c"),
        ).collect()
    }
    assert out["hole"]["area"] is None and out["hole"]["c"] is None
    assert out["multi"]["area"] is None and out["multi"]["c"] is None
    assert out["simple"]["area"] == 16.0
    assert out["simple"]["c"]["cx"] == 2.0 and out["simple"]["c"]["cy"] == 2.0


def test_wkt_centroid_terms_are_integer_exact(spark):
    from hbsir_old_spark.operators.geo import wkt_polygon_centroid_terms

    # the exact building blocks gates hash across engines: for an
    # integer-coordinate ring every field is an integer-valued double and
    # centroid = (cx_num, cy_num) / (3 * signed)
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",)], "geometry string"
    )
    t = df.select(
        wkt_polygon_centroid_terms("geometry").alias("t")
    ).collect()[0]["t"]
    assert t["signed"] == 32.0  # 2 * area, CCW ring
    assert t["cx_num"] / (3 * t["signed"]) == 2.0
    assert t["cy_num"] / (3 * t["signed"]) == 2.0
    assert all(v == int(v) for v in (t["cx_num"], t["cy_num"], t["signed"]))
