"""Overlay (clip/intersection/union) kernel + UDF tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jena_geo_spark.functions.vector import (
    st_area,
    st_clip_by_box,
    st_geomfromtext,
    st_intersection_area,
    st_intersection_convex,
    st_intersection_percentage,
    st_union_area,
)
from jena_geo_spark.geom import from_wkt
from jena_geo_spark.geom.kernel import (
    clip_polygon_convex,
    intersection_area_convex,
    is_convex,
    ring_area,
)

SQ = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)


def test_clip_square_by_square():
    clip = np.array([[2, 2], [6, 2], [6, 6], [2, 6]], dtype=float)
    out = clip_polygon_convex(SQ, clip)
    assert ring_area(out) == 4.0  # overlap is the 2x2 square [2,4]x[2,4]


def test_clip_disjoint_and_contained():
    far = np.array([[10, 10], [11, 10], [11, 11], [10, 11]], dtype=float)
    assert len(clip_polygon_convex(SQ, far)) == 0
    inner = np.array([[1, 1], [2, 1], [2, 2], [1, 2]], dtype=float)
    assert intersection_area_convex(inner, SQ) == 1.0  # inner fully inside
    assert intersection_area_convex(SQ, inner) == 1.0


def test_clip_concave_subject():
    # L-shaped (concave) subject clipped by a box that catches the notch
    L = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]], dtype=float)
    box = np.array([[1, 1], [3, 1], [3, 3], [1, 3]], dtype=float)
    # overlap: [1,3]x[1,2] strip (area 2) + [1,2]x[2,3] (area 1) = 3
    assert intersection_area_convex(L, box) == 3.0


def test_clockwise_clip_ring_is_normalized():
    clip_cw = np.array([[2, 6], [6, 6], [6, 2], [2, 2]], dtype=float)
    assert ring_area(clip_polygon_convex(SQ, clip_cw)) == 4.0


def test_is_convex():
    assert is_convex(SQ)
    assert not is_convex(
        np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]], dtype=float)
    )


def test_overlay_spark_udfs(spark):
    df = spark.createDataFrame(
        [("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))", "POLYGON((2 2, 6 2, 6 6, 2 6, 2 2))")],
        "a string, b string",
    ).select(
        st_geomfromtext(F.col("a")).alias("ga"),
        st_geomfromtext(F.col("b")).alias("gb"),
    )
    r = df.select(
        st_intersection_area(F.col("ga"), F.col("gb")).alias("ia"),
        st_union_area(F.col("ga"), F.col("gb")).alias("ua"),
        st_intersection_percentage(F.col("ga"), F.col("gb")).alias("pct"),
        st_area(st_intersection_convex(F.col("ga"), F.col("gb"))).alias("iarea2"),
        st_area(
            st_clip_by_box(F.col("ga"), F.lit(1.0), F.lit(1.0), F.lit(3.0), F.lit(9.0))
        ).alias("clip"),
    ).first()
    assert r.ia == 4.0 and r.iarea2 == 4.0
    assert r.ua == 16.0 + 16.0 - 4.0
    assert r.pct == 4.0 / 16.0
    assert r.clip == 6.0  # [1,3]x[1,4]


def test_clip_reference_house_polygon():
    house = from_wkt(
        "POLYGON((8.286131571192028 49.993592741787,8.28627775158334 49.99350049055274,"
        "8.286228130716564 49.993466866227074,8.286079268116238 49.99355739320413,"
        "8.286131571192028 49.993592741787))"
    ).exterior()
    xmin, ymin = house[:, 0].min(), house[:, 1].min()
    xmax, ymax = house[:, 0].max(), house[:, 1].max()
    # clip by own bbox: area unchanged
    box = np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]])
    assert intersection_area_convex(house, box) == pytest.approx(ring_area(house), rel=1e-12)
    # clip by left half of the bbox + right half = total
    mid = (xmin + xmax) / 2
    left = np.array([[xmin, ymin], [mid, ymin], [mid, ymax], [xmin, ymax]])
    right = np.array([[mid, ymin], [xmax, ymin], [xmax, ymax], [mid, ymax]])
    total = intersection_area_convex(house, left) + intersection_area_convex(house, right)
    assert total == pytest.approx(ring_area(house), rel=1e-9)
