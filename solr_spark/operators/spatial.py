"""Spatial query family: geofilt / bbox / rect range / distance sort.

Reference semantics (Apache Solr):
  - `{!geofilt sfield pt d}` — all docs within `d` km great-circle
    distance of point `pt` (solr/core/src/java/org/apache/solr/search/
    SpatialFilterQParser.java, LatLonPointSpatialField.createSpatialQuery).
  - `{!bbox sfield pt d}` — the cheaper rectangle that CIRCUMSCRIBES the
    d-km circle (BBoxField / SpatialUtils.calcBoxByDistFromPt): latitude
    span d/R rad, longitude span widened by 1/cos(lat), with pole clamp
    and date-line wrap.
  - rectangle range `field:[lat1,lon1 TO lat2,lon2]` — LatLonPointField
    newBoxQuery.
  - `sort=geodist() asc` — distance sort (DistanceUnits KM; earth mean
    radius 6371.0087714, lucene SloppyMath / solr DistanceUtils).

Spark shape: everything is a JVM column expression (whole-stage
codegen; zero Python). `geofilt` applies the circumscribing-box
prefilter FIRST — two comparisons per row that Parquet can evaluate on
min/max stats (predicate pushdown prunes row groups / partitions long
before any trigonometry runs), then the exact haversine test on the
survivors. At 100 TB with lat-sorted or geo-partitioned layout the box
predicate is the difference between a full scan and touching only the
overlapping files.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0087714  # solr DistanceUtils.EARTH_MEAN_RADIUS_KM
_RAD = math.pi / 180.0


def geodist_km(lat_col, lon_col, pt_lat: float, pt_lon: float) -> Column:
    """Haversine great-circle km from (lat_col, lon_col) degrees to a
    fixed point — same formula as the geodist() value source, but with
    the point-side trig folded to literals at plan time (one sin/cos
    pair per ROW, not four)."""
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    cos_p = math.cos(pt_lat * _RAD)
    # sin^2(dphi/2) + cos(lat1)cos(lat2) sin^2(dlambda/2)
    dphi = (lat * _RAD - F.lit(pt_lat * _RAD)) / 2.0
    dlmb = (lon * _RAD - F.lit(pt_lon * _RAD)) / 2.0
    h = F.sin(dphi) * F.sin(dphi) + (
        F.cos(lat * _RAD) * F.lit(cos_p) * F.sin(dlmb) * F.sin(dlmb)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.least(F.sqrt(h), F.lit(1.0)))


def bounding_box(
    pt_lat: float, pt_lon: float, d_km: float
) -> tuple[float, float, float, float, bool]:
    """(lat_min, lat_max, lon_min, lon_max, wraps) of the rectangle
    circumscribing the d-km circle — SpatialUtils.calcBoxByDistFromPt:
    the longitude half-span is asin(sin(d/R)/cos(lat)); near the poles
    (circle crosses a pole) longitude degenerates to the full range."""
    dlat = d_km / EARTH_RADIUS_KM / _RAD  # degrees of latitude
    lat_min = max(-90.0, pt_lat - dlat)
    lat_max = min(90.0, pt_lat + dlat)
    if lat_min <= -90.0 + 1e-12 or lat_max >= 90.0 - 1e-12:
        return lat_min, lat_max, -180.0, 180.0, False
    s = math.sin(d_km / EARTH_RADIUS_KM) / math.cos(pt_lat * _RAD)
    if abs(s) >= 1.0:
        return lat_min, lat_max, -180.0, 180.0, False
    dlon = math.asin(s) / _RAD
    lon_min, lon_max = pt_lon - dlon, pt_lon + dlon
    wraps = lon_min < -180.0 or lon_max > 180.0
    if wraps:
        lon_min = (lon_min + 360.0) if lon_min < -180.0 else lon_min
        lon_max = (lon_max - 360.0) if lon_max > 180.0 else lon_max
    return lat_min, lat_max, lon_min, lon_max, wraps


def bbox_predicate(
    lat_col, lon_col, pt_lat: float, pt_lon: float, d_km: float
) -> Column:
    """{!bbox}: rectangle test only (cheap, sargable, pushes to Parquet
    row-group stats). Solr's BBoxField returns everything in the box —
    a superset of the circle, by design."""
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    lat_min, lat_max, lon_min, lon_max, wraps = bounding_box(pt_lat, pt_lon, d_km)
    p = (lat >= F.lit(lat_min)) & (lat <= F.lit(lat_max))
    if wraps:  # date-line crossing: lon >= min OR lon <= max
        return p & ((lon >= F.lit(lon_min)) | (lon <= F.lit(lon_max)))
    return p & (lon >= F.lit(lon_min)) & (lon <= F.lit(lon_max))


def geofilt(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    pt_lat: float,
    pt_lon: float,
    d_km: float,
) -> DataFrame:
    """{!geofilt}: exact d-km circle. Box prefilter (pushes down) then
    haversine on survivors — the same two-phase shape Lucene uses
    (encoded-box BKD visit, then exact haversin2 check)."""
    box = bbox_predicate(lat_col, lon_col, pt_lat, pt_lon, d_km)
    dist = geodist_km(lat_col, lon_col, pt_lat, pt_lon)
    return df.where(box & (dist <= F.lit(float(d_km))))


def rect_query(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat1: float,
    lon1: float,
    lat2: float,
    lon2: float,
) -> DataFrame:
    """field:[lat1,lon1 TO lat2,lon2] — LatLonPointField newBoxQuery.
    lon1 > lon2 means the box crosses the date line (Solr keeps the
    user's order and wraps)."""
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    p = (lat >= F.lit(min(lat1, lat2))) & (lat <= F.lit(max(lat1, lat2)))
    if lon1 <= lon2:
        return df.where(p & (lon >= F.lit(lon1)) & (lon <= F.lit(lon2)))
    return df.where(p & ((lon >= F.lit(lon1)) | (lon <= F.lit(lon2))))


def geodist_sort(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    pt_lat: float,
    pt_lon: float,
    k: int,
    d_km: float | None = None,
    dist_alias: str = "dist_km",
) -> DataFrame:
    """sort=geodist() asc with rows=k (optionally inside a geofilt).
    orderBy(...).limit(k) compiles to TakeOrderedAndProject — per-
    partition top-k then a k-row merge on the driver; no global sort
    shuffle at any scale."""
    base = geofilt(df, lat_col, lon_col, pt_lat, pt_lon, d_km) if d_km else df
    dist = geodist_km(lat_col, lon_col, pt_lat, pt_lon).alias(dist_alias)
    return base.select("*", dist).orderBy(F.asc(dist_alias)).limit(k)


def geodist_sql(
    lat_expr: str, lon_expr: str, pt_lat: float, pt_lon: float
) -> str:
    """ANSI-SQL twin of geodist_km (DuckDB-runnable) for oracle parity."""
    rad = _RAD
    return (
        f"2.0 * {EARTH_RADIUS_KM!r} * asin(least(sqrt("
        f"pow(sin((({lat_expr}) * {rad!r} - {pt_lat * _RAD!r}) / 2.0), 2)"
        f" + cos(({lat_expr}) * {rad!r}) * {math.cos(pt_lat * _RAD)!r}"
        f" * pow(sin((({lon_expr}) * {rad!r} - {pt_lon * _RAD!r}) / 2.0), 2)"
        f"), 1.0))"
    )
