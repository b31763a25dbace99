"""Spatial family: geofilt / bbox / rect range / distance sort.

Oracle strategy: coordinates are DERIVED deterministically from integer
keys with pure arithmetic (same expression runs in DuckDB for the gate
twins), and distances are checked against closed-form haversine values
computed in Python.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solr_spark.operators.spatial import (
    EARTH_RADIUS_KM,
    bbox_predicate,
    bounding_box,
    geodist_km,
    geodist_sort,
    geofilt,
    rect_query,
)


def py_haversine(lat1, lon1, lat2, lon2):
    rad = math.pi / 180.0
    h = (
        math.sin((lat2 - lat1) * rad / 2) ** 2
        + math.cos(lat1 * rad)
        * math.cos(lat2 * rad)
        * math.sin((lon2 - lon1) * rad / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * math.asin(min(1.0, math.sqrt(h)))


@pytest.fixture(scope="module")
def pts(spark):
    # deterministic scatter: same arithmetic a DuckDB oracle can run
    return (
        spark.range(0, 4000)
        .select(
            F.col("id"),
            ((F.col("id") * 7919 % 17000) / 100.0 - 85.0).alias("lat"),
            ((F.col("id") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
        )
        .cache()
    )


def test_geodist_matches_closed_form(spark):
    df = spark.createDataFrame(
        [(51.5074, -0.1278), (40.7128, -74.0060), (0.0, 0.0), (89.9, 10.0)],
        "lat double, lon double",
    )
    got = df.select(
        "lat", "lon", geodist_km("lat", "lon", 48.8566, 2.3522).alias("d")
    ).collect()
    for r in got:
        want = py_haversine(r["lat"], r["lon"], 48.8566, 2.3522)
        assert abs(r["d"] - want) < 1e-6, (r, want)


def test_equator_degree_is_111km(spark):
    d = (
        spark.range(1)
        .select(geodist_km(F.lit(0.0), F.lit(1.0), 0.0, 0.0).alias("d"))
        .collect()[0]["d"]
    )
    assert abs(d - EARTH_RADIUS_KM * math.pi / 180.0) < 1e-6  # 111.195


def test_bounding_box_contains_circle():
    lat_min, lat_max, lon_min, lon_max, wraps = bounding_box(45.0, 10.0, 300.0)
    assert not wraps
    # every point at exactly d on the 4 compass bearings is inside
    for brg in range(0, 360, 15):
        b = math.radians(brg)
        dr = 300.0 / EARTH_RADIUS_KM
        lat1, lon1 = math.radians(45.0), math.radians(10.0)
        lat2 = math.asin(
            math.sin(lat1) * math.cos(dr)
            + math.cos(lat1) * math.sin(dr) * math.cos(b)
        )
        lon2 = lon1 + math.atan2(
            math.sin(b) * math.sin(dr) * math.cos(lat1),
            math.cos(dr) - math.sin(lat1) * math.sin(lat2),
        )
        la, lo = math.degrees(lat2), math.degrees(lon2)
        assert lat_min - 1e-9 <= la <= lat_max + 1e-9
        assert lon_min - 1e-9 <= lo <= lon_max + 1e-9


def test_bounding_box_pole_clamp_and_dateline():
    # circle over the north pole -> full longitude range
    _, lat_max, lon_min, lon_max, _ = bounding_box(89.5, 0.0, 200.0)
    assert lat_max == 90.0 and lon_min == -180.0 and lon_max == 180.0
    # near the date line -> wrapped box
    _, _, lon_min, lon_max, wraps = bounding_box(0.0, 179.5, 200.0)
    assert wraps and lon_min > 0 and lon_max < 0


def test_geofilt_is_exact_and_subset_of_bbox(pts):
    pt = (40.7, -74.0)
    inside = geofilt(pts, "lat", "lon", *pt, 2000.0).collect()
    boxed = pts.where(bbox_predicate("lat", "lon", *pt, 2000.0)).collect()
    in_ids = {r["id"] for r in inside}
    box_ids = {r["id"] for r in boxed}
    assert in_ids <= box_ids
    # exact recheck in python over ALL rows (no prefilter miss)
    for r in pts.collect():
        d = py_haversine(r["lat"], r["lon"], *pt)
        assert (r["id"] in in_ids) == (d <= 2000.0), (r, d)


def test_geofilt_dateline_circle(spark):
    df = spark.createDataFrame(
        [(0.0, 179.0), (0.0, -179.0), (0.0, 170.0), (0.0, -170.0)],
        "lat double, lon double",
    )
    got = geofilt(df, "lat", "lon", 0.0, 180.0, 250.0).collect()
    lons = sorted(r["lon"] for r in got)
    assert lons == [-179.0, 179.0]  # both sides of the line, 111km away


def test_rect_query_plain_and_wrapped(pts):
    got = {r["id"] for r in rect_query(pts, "lat", "lon", -10, 20, 10, 40).collect()}
    want = {
        r["id"]
        for r in pts.collect()
        if -10 <= r["lat"] <= 10 and 20 <= r["lon"] <= 40
    }
    assert got == want and got
    # wrapped: lon1 > lon2 crosses the date line
    gotw = {r["id"] for r in rect_query(pts, "lat", "lon", -10, 170, 10, -170).collect()}
    wantw = {
        r["id"]
        for r in pts.collect()
        if -10 <= r["lat"] <= 10 and (r["lon"] >= 170 or r["lon"] <= -170)
    }
    assert gotw == wantw


def test_geodist_sort_topk(pts):
    pt = (10.0, 10.0)
    top = geodist_sort(pts, "lat", "lon", *pt, k=15).collect()
    assert len(top) == 15
    dists = [r["dist_km"] for r in top]
    assert dists == sorted(dists)
    # matches a python full-sort of the same corpus
    want = sorted(py_haversine(r["lat"], r["lon"], *pt) for r in pts.collect())[:15]
    for got_d, want_d in zip(dists, want):
        assert abs(got_d - want_d) < 1e-6


def test_geodist_sort_plan_is_takeordered(pts):
    plan = geodist_sort(pts, "lat", "lon", 0.0, 0.0, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
