"""Attribute + transform long-tail kernels and UDFs: MBC, minimum
rectangle, geometric median, validity, Delaunay/Voronoi, concave hull,
snap/split/linemerge/linesubstring/segmentize/densify/simplifyVW/
normalize/makevalid."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jena_geo_spark.geom import linework as L
from jena_geo_spark.geom import shapes as S
from jena_geo_spark.geom import wkt as W
from jena_geo_spark.geom.kernel import ring_area


def g(s):
    return W.from_wkt(s)


def test_min_bounding_circle_kernel():
    cx, cy, r = S.min_bounding_circle(np.array([[0, 0], [4, 0], [2, 1]], float))
    assert (cx, cy, r) == (2.0, 0.0, 2.0)  # obtuse → diametric circle
    cx, cy, r = S.min_bounding_circle(np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float))
    assert (cx, cy) == (2.0, 2.0) and r == pytest.approx(np.sqrt(8))
    # all points enclosed, deterministic across permutations
    rng = np.random.default_rng(2)
    pts = rng.uniform(-5, 5, (40, 2))
    cx, cy, r = S.min_bounding_circle(pts)
    d = np.sqrt((pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2)
    assert (d <= r * (1 + 1e-9) + 1e-9).all()


def test_minimum_rectangle_and_median():
    ring, w, h = S.minimum_rectangle(np.array([[0, 0], [3, 3], [2, 4], [-1, 1]], float))
    assert sorted([round(w, 4), round(h, 4)]) == [1.4142, 4.2426]
    assert ring_area(ring) == pytest.approx(6.0)
    mx, my = S.geometric_median(np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float))
    assert (mx, my) == pytest.approx((2.0, 2.0))


def test_validity():
    assert S.is_valid_reason(g("POLYGON((0 0,4 0,4 4,0 4,0 0))")) == "Valid Geometry"
    assert "Self-intersection" in S.is_valid_reason(g("POLYGON((0 0,4 4,4 0,0 4,0 0))"))
    assert "not closed" in S.is_valid_reason(W.Geom("polygon", [np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)]))
    assert "outside shell" in S.is_valid_reason(
        g("POLYGON((0 0,4 0,4 4,0 4,0 0),(10 10,11 10,11 11,10 11,10 10))")
    )


def test_delaunay_voronoi():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2]], float)
    tris, p = S.delaunay(pts)
    assert len(tris) == 4
    # triangle areas tile the square
    tot = sum(ring_area(np.array([p[a], p[b], p[c], p[a]])) for a, b, c in tris)
    assert tot == pytest.approx(16.0)
    cells = S.voronoi_cells(pts)
    center = [c for site, c in cells if site == (2.0, 2.0)][0]
    assert len(center) == 4 and ring_area(np.array(center + [center[0]])) == pytest.approx(8.0)


def test_concave_hull_tighter_than_convex():
    # C-shaped band (outer + inner arc): carving the mouth needs interior
    # vertices — pure single-arc clouds are un-carvable by the regularity
    # rule (removing would pinch the ring at an existing boundary vertex)
    ang = np.linspace(0.7, 2 * np.pi - 0.7, 24)
    c = np.vstack(
        [
            np.column_stack([np.cos(ang) * 5, np.sin(ang) * 5]),
            np.column_stack([np.cos(ang) * 3, np.sin(ang) * 3]),
        ]
    )
    ch = S.concave_hull(c, length_threshold=2.5)
    assert ring_area(ch) < ring_area(S.convex_hull(c)) - 1.0
    # still a simple closed ring
    assert (ch[0] == ch[-1]).all() and len(ch) >= 5


def test_linework_kernels():
    # snap
    out = L.snap(np.array([[0.05, 0.02], [5, 5]], float), [np.array([[0, 0], [10, 0]], float)], 0.1)
    assert out[0].tolist() == [0.0, 0.0] and out[1].tolist() == [5.0, 5.0]
    # split
    pieces = L.split_line_by_line(
        np.array([[0, 0], [10, 0]], float), np.array([[5, -1], [5, 1]], float)
    )
    assert len(pieces) == 2 and pieces[0][-1].tolist() == [5.0, 0.0]
    # merge
    merged = L.line_merge([np.array([[0, 0], [1, 0]]), np.array([[1, 0], [2, 0]])])
    assert len(merged) == 1 and len(merged[0]) == 3
    # substring
    sub = L.line_substring(np.array([[0, 0], [10, 0]], float), 0.2, 0.8)
    assert sub[0].tolist() == [2.0, 0.0] and sub[-1].tolist() == [8.0, 0.0]
    # segmentize
    seg = L.segmentize(np.array([[0, 0], [10, 0]], float), 3.0)
    assert len(seg) == 5  # 4 even pieces of 2.5
    # simplify VW drops the small-area wiggle
    simp = L.simplify_vw(np.array([[0, 0], [5, 0.01], [10, 0]], float), 1.0)
    assert len(simp) == 2


def test_normalize():
    a = L.normalize(g("POLYGON((4 0,4 4,0 4,0 0,4 0))"))
    b = L.normalize(g("POLYGON((0 0,4 0,4 4,0 4,0 0))"))
    assert W.to_wkt(a) == W.to_wkt(b)
    assert tuple(a.parts[0][0]) == (0.0, 0.0)
    # CCW input reversed to CW (JTS norm: shells clockwise)
    c = L.normalize(g("POLYGON((0 0,0 4,4 4,4 0,0 0))"))
    assert W.to_wkt(c) == W.to_wkt(b)


def test_shape_udfs(spark):
    from jena_geo_spark.functions.shapes import (
        st_delaunaytriangles,
        st_geometricmedian,
        st_isvalid,
        st_isvalidreason,
        st_linemerge,
        st_linesubstring,
        st_makevalid,
        st_minimumboundingcircle,
        st_minimumrectangle,
        st_normalize,
        st_pointonsurface,
        st_simplifyvw,
        st_snap,
        st_split,
    )
    from jena_geo_spark.functions.vector import st_area, st_geomfromtext

    df = spark.createDataFrame(
        [("POLYGON((0 0,4 0,4 4,0 4,0 0))", "LINESTRING(2 -1,2 5)")], "a string, b string"
    ).select(
        st_geomfromtext(F.col("a")).alias("ga"), st_geomfromtext(F.col("b")).alias("gb")
    )
    r = df.select(
        st_minimumboundingcircle("ga").alias("mbc"),
        st_minimumrectangle("ga").alias("mr"),
        st_geometricmedian("ga").alias("gm"),
        st_isvalid("ga").alias("v"),
        st_isvalidreason("ga").alias("vr"),
        st_pointonsurface("ga").alias("pos"),
        st_area(st_minimumrectangle("ga")).alias("mra"),
        st_delaunaytriangles("ga").alias("dt"),
    ).first()
    assert r["mbc"]["r"] == pytest.approx(np.sqrt(8)) and r["v"] and r["vr"] == "Valid Geometry"
    assert r["mra"] == pytest.approx(16.0)
    assert (0 < r["pos"]["x"] < 4) and (0 < r["pos"]["y"] < 4)
    dt = W.from_wkb(bytes(r["dt"]))
    assert dt.kind == "multipolygon" and len(dt.parts) == 2
    # split a line by a blade
    line_df = spark.createDataFrame([("LINESTRING(0 0,10 0)", "LINESTRING(5 -1,5 1)")], "a string, b string").select(
        st_geomfromtext(F.col("a")).alias("ga"), st_geomfromtext(F.col("b")).alias("gb")
    )
    sp = W.from_wkb(bytes(line_df.select(st_split("ga", "gb").alias("s")).first()["s"]))
    assert sp.kind == "multilinestring" and len(sp.parts) == 2
    # makevalid: bowtie → convex hull fallback (valid output)
    bow = spark.createDataFrame([("POLYGON((0 0,4 4,4 0,0 4,0 0))",)], "a string").select(
        st_geomfromtext(F.col("a")).alias("g")
    )
    fixed = bow.select(st_isvalid(st_makevalid("g")).alias("ok")).first()
    assert fixed["ok"]
