"""Mixed-dimension overlay (geom/mixed.py) vs JTS OverlayOp semantics —
the reference's ST_Intersection/Union/Difference/SymDifference delegate
every mixed-dimension pair to JTS OverlayOp, whose result shaping
(covered sub-segments, isolated touch points, points-first mixed
collections, higher-dim absorption on union) these cases pin."""

import pytest

from jena_geo_spark.geom import mixed as M
from jena_geo_spark.geom import wkt as W


def ov(a: str, b: str, op: str) -> str:
    return W.to_wkt(M.overlay_mixed(W.from_wkt(a), W.from_wkt(b), op))


POLY = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
HOLE = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"


class TestPointXAreal:
    def test_interior_point_intersection(self):
        assert ov("POINT (1 1)", POLY, "intersection") == "POINT (1 1)"

    def test_boundary_point_intersection(self):
        # OverlayOp covers the boundary (closure semantics)
        assert ov("POINT (0 2)", POLY, "intersection") == "POINT (0 2)"

    def test_exterior_point_intersection_empty(self):
        assert ov("POINT (9 9)", POLY, "intersection") == "MULTIPOINT EMPTY"

    def test_point_in_hole_is_exterior(self):
        assert ov("POINT (5 5)", HOLE, "intersection") == "MULTIPOINT EMPTY"

    def test_difference_keeps_uncovered(self):
        assert ov("POINT (9 9)", POLY, "difference") == "POINT (9 9)"
        assert ov("POINT (1 1)", POLY, "difference") == "MULTIPOINT EMPTY"

    def test_areal_minus_point_is_areal(self):
        assert ov(POLY, "POINT (1 1)", "difference") == POLY

    def test_union_absorbs_covered_point(self):
        assert ov("POINT (1 1)", POLY, "union") == POLY

    def test_union_keeps_exterior_point_points_first(self):
        got = ov("MULTIPOINT ((1 1), (9 9))", POLY, "union")
        assert got == f"GEOMETRYCOLLECTION (POINT (9 9), {POLY})"

    def test_multipoint_filter(self):
        got = ov("MULTIPOINT ((1 1), (9 9), (0 2))", POLY, "intersection")
        assert got == "MULTIPOINT (1 1, 0 2)"


class TestPointXLineal:
    LINE = "LINESTRING (0 0, 4 4)"

    def test_point_on_line(self):
        assert ov("POINT (2 2)", self.LINE, "intersection") == "POINT (2 2)"

    def test_point_off_line(self):
        assert ov("POINT (2 3)", self.LINE, "intersection") == "MULTIPOINT EMPTY"

    def test_line_minus_point_identity(self):
        assert ov(self.LINE, "POINT (2 2)", "difference") == self.LINE


class TestPointXPoint:
    def test_same_point(self):
        assert ov("POINT (1 1)", "POINT (1 1)", "intersection") == "POINT (1 1)"

    def test_disjoint_points(self):
        assert ov("POINT (1 1)", "POINT (2 2)", "intersection") == "MULTIPOINT EMPTY"

    def test_union_dedups(self):
        got = ov("MULTIPOINT ((1 1), (2 2))", "MULTIPOINT ((2 2), (3 3))", "union")
        assert got == "MULTIPOINT (1 1, 2 2, 3 3)"

    def test_symdifference(self):
        got = ov("MULTIPOINT ((1 1), (2 2))", "MULTIPOINT ((2 2), (3 3))", "symdifference")
        assert got == "MULTIPOINT (1 1, 3 3)"

    def test_difference(self):
        got = ov("MULTIPOINT ((1 1), (2 2))", "POINT (1 1)", "difference")
        assert got == "POINT (2 2)"


class TestLineXAreal:
    def test_crossing_clip(self):
        got = ov("LINESTRING (-1 2, 5 2)", POLY, "intersection")
        assert got == "LINESTRING (0 2, 4 2)"

    def test_crossing_difference_both_tails(self):
        got = ov("LINESTRING (-1 2, 5 2)", POLY, "difference")
        assert got == "MULTILINESTRING ((-1 2, 0 2), (4 2, 5 2))"

    def test_areal_minus_line_is_areal(self):
        assert ov(POLY, "LINESTRING (-1 2, 5 2)", "difference") == POLY

    def test_interior_line_clip_identity(self):
        assert ov("LINESTRING (1 1, 3 3)", POLY, "intersection") == "LINESTRING (1 1, 3 3)"
        assert ov("LINESTRING (1 1, 3 3)", POLY, "difference") == "MULTILINESTRING EMPTY"

    def test_union_absorbs_interior_line(self):
        assert ov("LINESTRING (1 1, 3 3)", POLY, "union") == POLY

    def test_union_mixed_collection(self):
        got = ov("LINESTRING (-1 2, 5 2)", POLY, "union")
        assert got == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((-1 2, 0 2), (4 2, 5 2)), "
            + POLY + ")"
        )

    def test_corner_touch_is_point(self):
        # both adjacent sub-segments exterior → isolated 0D member
        assert ov("LINESTRING (-2 -2, 0 0)", POLY, "intersection") == "POINT (0 0)"

    def test_hole_splits_clip(self):
        got = ov("LINESTRING (2 5, 8 5)", HOLE, "intersection")
        assert got == "MULTILINESTRING ((2 5, 4 5), (6 5, 8 5))"

    def test_boundary_collinear_segment_covered(self):
        # riding the boundary is in the closure → kept by intersection
        got = ov("LINESTRING (0 0, 4 0)", POLY, "intersection")
        assert got == "LINESTRING (0 0, 4 0)"
        assert ov("LINESTRING (0 0, 4 0)", POLY, "difference") == "MULTILINESTRING EMPTY"

    def test_symdifference_equals_union_shape(self):
        got = ov("LINESTRING (-1 2, 5 2)", POLY, "symdifference")
        assert got.startswith("GEOMETRYCOLLECTION (MULTILINESTRING")


class TestSparkSurface:
    def test_st_intersection_point_polygon(self, spark):
        from pyspark.sql import functions as F

        from jena_geo_spark.functions.vector import (
            st_astext,
            st_geomfromtext,
            st_intersection,
        )

        df = spark.createDataFrame(
            [("POINT (1 1)", POLY), ("LINESTRING (-1 2, 5 2)", POLY)],
            "a string, b string",
        )
        got = [
            r.w
            for r in df.select(
                st_astext(
                    st_intersection(
                        st_geomfromtext(F.col("a")), st_geomfromtext(F.col("b"))
                    )
                ).alias("w")
            ).collect()
        ]
        assert got == ["POINT (1 1)", "LINESTRING (0 2, 4 2)"]
