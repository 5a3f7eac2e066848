"""Geo source + geometry join (reference parity: S10/J8 —
map_drawer.py:8-43 create_geoseries/add_geometry).

Spark-first shape: geometry rides as a WKT string column in a tiny
area-keyed dimension DataFrame (a few dozen provinces/regions), broadcast
left-joined onto the fact — the fact side never shuffles. Reading a
shapefile/GeoJSON needs GeoPandas, which is optional: only
:func:`load_geometry_dim` touches it (import-guarded); the join itself is
plain Spark and fully testable with an injected dimension.

At 100 TB the dim stays broadcast-size by construction (admin geographies
are inherently small); downstream spatial tooling (Sedona, GeoPandas on
the collected result) consumes the WKT column directly.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference map_drawer.add_geometry auto-detection order (Region first)
_AREA_PRIORITY = ("Region", "Province")


def geometry_dim(
    spark: SparkSession,
    geometries: Mapping[str, str],
    area: str = "Province",
) -> DataFrame:
    """Build the broadcastable geometry dimension from an in-memory
    {area_name: wkt} mapping (the shape `create_geoseries` produces after
    code->name decoding, reference map_drawer.py:8-24)."""
    rows = [(name, wkt) for name, wkt in sorted(geometries.items())]
    return spark.createDataFrame(rows, f"{area} string, geometry string")


def load_geometry_dim(
    spark: SparkSession,
    path: str,
    code_column: str,
    codes: Mapping,
    area_names: Mapping,
    area: str = "Province",
) -> DataFrame:
    """S10: read a map file (shapefile/GeoJSON) and decode its code column
    to area names (reference create_geoseries, map_drawer.py:8-24). The
    GeoPandas dependency is import-guarded — everything after the read is
    plain Spark."""
    try:
        import geopandas as gpd  # type: ignore[import-not-found]
    except ImportError as exc:
        raise NotImplementedError(
            "reading map files requires geopandas; install it, or build the "
            "dimension yourself with geometry_dim({area_name: wkt})"
        ) from exc
    gdf = gpd.read_file(path)[[code_column, "geometry"]]
    name_by_code = {value: area_names[key] for key, value in codes.items()}
    # features with null/empty geometry are skipped, so the downstream left
    # join serves them NULL (the documented "areas without a geometry" path)
    mapping = {
        name_by_code[code]: geom.wkt
        for code, geom in zip(gdf[code_column], gdf["geometry"])
        if code in name_by_code and geom is not None
    }
    return geometry_dim(spark, mapping, area)


def wkt_polygon_points(wkt: Column | str) -> Column:
    """Parse a simple-polygon WKT (``POLYGON ((x y, x y, ...))``, outer
    ring only, no holes) into ``array<struct<x:double, y:double>>``. Pure
    JVM-side expressions (regexp + split + transform) — whole-stage
    codegen, no UDF — so downstream area/centroid math stays on the fast
    path. NULL/non-polygon strings parse to NULL/empty (the left-join
    "area without a geometry" rows flow through as NULL analytics).
    Geometry OUTSIDE the contract — a POLYGON with interior rings or a
    MULTIPOLYGON — also parses to NULL: the ring regexp stops at the
    first ``)``, so without the guard those would silently yield the
    outer/first ring's area-centroid, a plausible wrong answer instead
    of a loud NULL. Exactly two ``(`` in the WKT means exactly one ring.

    The spatial scope is deliberately minimal (reference map_drawer.py
    stops at attaching geometry; rendering is out of core per SURVEY §2):
    these helpers make the joined frame ANALYZABLE — area/centroid for
    choropleth binning and label placement — while full spatial algebra
    remains the documented Sedona/GeoPandas seam."""
    wkt = F.col(wkt) if isinstance(wkt, str) else wkt
    body = F.regexp_extract(wkt, r"POLYGON\s*\(\(([^)]*)\)\)", 1)
    one_ring = (
        F.length(wkt) - F.length(F.regexp_replace(wkt, r"[(]", "")) == 2
    )
    return F.when((body != "") & one_ring, F.transform(
        F.split(body, r",\s*"),
        lambda s: F.struct(
            F.split(F.trim(s), r"\s+")[0].cast("double").alias("x"),
            F.split(F.trim(s), r"\s+")[1].cast("double").alias("y"),
        ),
    ))


def _shoelace_terms(pts: Column) -> Column:
    """Cross-products ``x_i*y_{i+1} - x_{i+1}*y_i`` over consecutive ring
    points (the ring repeats its first point last, so consecutive pairs
    cover every edge exactly once)."""
    n = F.size(pts)
    a = F.slice(pts, 1, n - 1)
    b = F.slice(pts, 2, n - 1)
    return F.zip_with(a, b, lambda p, q: p["x"] * q["y"] - q["x"] * p["y"])


def wkt_polygon_area(wkt: Column | str) -> Column:
    """Planar area of a simple WKT polygon (shoelace formula, |signed|/2).
    With integer-coordinate fixtures the cross-terms are integer-valued
    doubles, so the sum is order-independent and exact — what lets the
    j8b gate compare bit-for-bit against a SQL oracle."""
    terms = _shoelace_terms(wkt_polygon_points(wkt))
    signed = F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)
    return F.abs(signed) / 2


def wkt_polygon_centroid_terms(wkt: Column | str) -> Column:
    """The centroid's EXACT building blocks as ``struct<cx_num:double,
    cy_num:double, signed:double>`` — per-axis numerators ``sum((p_i +
    p_{i+1}) * cross_i)`` and the signed shoelace sum, with the centroid
    itself ``(cx_num, cy_num) / (3 * signed)``. For integer-coordinate
    rings every field is an integer-valued double, so gates can compare
    these bit-for-bit across engines instead of rounding a quotient near
    a decimal boundary (the j8b full-oracle pattern)."""
    pts = wkt_polygon_points(wkt)
    n = F.size(pts)
    a = F.slice(pts, 1, n - 1)
    b = F.slice(pts, 2, n - 1)
    signed = F.aggregate(
        _shoelace_terms(pts), F.lit(0.0), lambda acc, v: acc + v
    )
    cx_num = F.aggregate(
        F.zip_with(
            a, b,
            lambda p, q: (p["x"] + q["x"]) * (p["x"] * q["y"] - q["x"] * p["y"]),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cy_num = F.aggregate(
        F.zip_with(
            a, b,
            lambda p, q: (p["y"] + q["y"]) * (p["x"] * q["y"] - q["x"] * p["y"]),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.struct(
        cx_num.alias("cx_num"), cy_num.alias("cy_num"), signed.alias("signed")
    )


def wkt_polygon_centroid(wkt: Column | str) -> Column:
    """Centroid of a simple WKT polygon as ``struct<cx:double, cy:double>``
    (the standard signed-area-weighted formula: ``C = (1/(6A_signed)) *
    sum((p_i + p_{i+1}) * cross_i)`` per axis). NULL for NULL/degenerate
    (zero-area) geometry instead of a division error."""
    t = wkt_polygon_centroid_terms(wkt)
    return F.when(
        t["signed"] != 0,
        F.struct(
            (t["cx_num"] / (3 * t["signed"])).alias("cx"),
            (t["cy_num"] / (3 * t["signed"])).alias("cy"),
        ),
    )


def add_geometry(
    df: DataFrame,
    dim: DataFrame,
    area: str | None = None,
) -> DataFrame:
    """J8: attach the geometry column by area name (reference add_geometry,
    map_drawer.py:27-43): ``area`` defaults to the first of Region/Province
    present in the table; the tiny dim is broadcast so the fact side never
    shuffles. Left join — areas without a geometry keep NULL, like the
    reference's pandas left join."""
    dim_area = [c for c in dim.columns if c != "geometry"][0]
    if area is None:
        # the dim's own key column wins: a Province-keyed dim joined onto a
        # table carrying BOTH Region and Province must join on Province —
        # priority order alone would pick Region and left-join province
        # names against region values (all-NULL geometries, no error)
        if dim_area in df.columns:
            area = dim_area
        else:
            for candidate in _AREA_PRIORITY:
                if candidate in df.columns:
                    area = candidate
                    break
            else:
                raise ValueError(
                    "no Region/Province column found; pass area= explicitly "
                    f"(table columns: {df.columns})"
                )
    elif area not in df.columns:
        raise ValueError(f"area column {area!r} not in table (has {df.columns})")
    return df.join(
        F.broadcast(dim.withColumnRenamed(dim_area, area)), on=area, how="left"
    )
