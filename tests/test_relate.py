"""DE-9IM relate matrix + topological predicate tests.

Canonical matrices cross-checked against JTS/PostGIS documented examples;
the MULTIPOINT self-relate golden 0FFFFFFF2 is the reference's
IntersectionMatrixTest.java fixture."""

import pytest

from jena_geo_spark.geom import relate as R
from jena_geo_spark.geom import wkt as W


def g(s):
    return W.from_wkt(s)


SQ = "POLYGON((0 0,4 0,4 4,0 4,0 0))"

MATRIX_CASES = [
    (SQ, "POLYGON((2 2,6 2,6 6,2 6,2 2))", "212101212"),
    (SQ, SQ, "2FFF1FFF2"),
    (SQ, "POLYGON((4 0,8 0,8 4,4 4,4 0))", "FF2F11212"),  # edge-adjacent
    (SQ, "POLYGON((4 4,8 4,8 8,4 8,4 4))", "FF2F01212"),  # corner touch
    ("POLYGON((0 0,8 0,8 8,0 8,0 0))", "POLYGON((2 2,4 2,4 4,2 4,2 2))", "212FF1FF2"),
    ("POLYGON((0 0,8 0,8 8,0 8,0 0))", SQ, "212F11FF2"),  # contains, shared edge
    (SQ, "POLYGON((9 9,10 9,10 10,9 10,9 9))", "FF2FF1212"),
    ("POINT(2 2)", SQ, "0FFFFF212"),
    ("POINT(4 2)", SQ, "F0FFFF212"),
    ("POINT(9 9)", SQ, "FF0FFF212"),
    # reference IntersectionMatrixTest.java golden
    ("MULTIPOINT(10 40,40 30,20 20,30 10)", "MULTIPOINT(10 40,40 30,20 20,30 10)", "0FFFFFFF2"),
    ("LINESTRING(-1 2,5 2)", SQ, "101FF0212"),
    ("LINESTRING(1 1,3 3)", SQ, "1FF0FF212"),
    ("LINESTRING(0 0,4 4)", "LINESTRING(0 4,4 0)", "0F1FF0102"),
    ("LINESTRING(0 0,4 0)", "LINESTRING(2 0,6 0)", "1010F0102"),
    ("LINESTRING(0 0,2 2)", "LINESTRING(2 2,4 0)", "FF1F00102"),
    ("LINESTRING(0 0,4 0)", "LINESTRING(0 0,4 0)", "1FFF0FFF2"),
    ("POINT(0 0)", "LINESTRING(0 0,4 0)", "F0FFFF102"),
    ("POINT(2 0)", "LINESTRING(0 0,4 0)", "0FFFFF102"),
]


@pytest.mark.parametrize("a,b,want", MATRIX_CASES)
def test_relate_matrix(a, b, want):
    assert R.relate(g(a), g(b)) == want


def test_relate_symmetry():
    # relate(b, a) is the transpose of relate(a, b)
    for a, b, _ in MATRIX_CASES[:8]:
        m = R.relate(g(a), g(b))
        mt = R.relate(g(b), g(a))
        trans = "".join(m[3 * c + r] for r in range(3) for c in range(3))
        assert mt == trans, (a, b, m, mt)


def test_predicates():
    A, B = g(SQ), g("POLYGON((2 2,6 2,6 6,2 6,2 2))")
    C = g("POLYGON((4 0,8 0,8 4,4 4,4 0))")
    D = g("POLYGON((1 1,2 1,2 2,1 2,1 1))")
    assert R.overlaps(A, B) and not R.overlaps(A, C) and not R.overlaps(A, D)
    assert R.touches(A, C) and not R.touches(A, B)
    assert R.contains(A, D) and R.within(D, A) and not R.contains(A, B)
    assert R.covers(A, A) and R.equals_topo(A, A) and not R.equals_topo(A, B)
    assert R.intersects(A, B) and not R.disjoint(A, B)
    assert R.disjoint(A, g("POLYGON((9 9,10 9,10 10,9 10,9 9))"))
    # line/polygon crosses; line/line crosses at a point
    assert R.crosses(g("LINESTRING(-1 2,5 2)"), A)
    assert R.crosses(g("LINESTRING(0 0,4 4)"), g("LINESTRING(0 4,4 0)"))
    assert not R.crosses(g("LINESTRING(0 0,4 0)"), g("LINESTRING(2 0,6 0)"))  # overlap
    # covers but not contains: B on A's boundary edge
    edge_sq = g("POLYGON((0 0,4 0,4 2,0 2,0 0))")
    assert R.covers(g(SQ), edge_sq) and R.contains(g(SQ), edge_sq)


def test_relate_match_patterns():
    assert R.relate_match("212101212", "212101212")
    assert R.relate_match("212101212", "T*T***T**")
    assert not R.relate_match("212FF1FF2", "T*T***T**")
    assert R.relate_match("0FFFFFFF2", "0FFFFFFF2")


def test_relate_spark_udfs(spark):
    from pyspark.sql import functions as F

    from jena_geo_spark.functions.relate import (
        st_covers,
        st_crosses,
        st_equals_topo,
        st_overlaps,
        st_relate,
        st_relate_match,
        st_touches,
    )
    from jena_geo_spark.functions.vector import st_geomfromtext

    df = spark.createDataFrame(
        [
            (SQ, "POLYGON((2 2,6 2,6 6,2 6,2 2))"),
            (SQ, "POLYGON((4 0,8 0,8 4,4 4,4 0))"),
            (SQ, SQ),
        ],
        "a string, b string",
    ).select(
        st_geomfromtext(F.col("a")).alias("ga"), st_geomfromtext(F.col("b")).alias("gb")
    )
    rows = df.select(
        st_relate(F.col("ga"), F.col("gb")).alias("m"),
        st_touches(F.col("ga"), F.col("gb")).alias("t"),
        st_overlaps(F.col("ga"), F.col("gb")).alias("o"),
        st_equals_topo(F.col("ga"), F.col("gb")).alias("e"),
        st_covers(F.col("ga"), F.col("gb")).alias("cv"),
        st_crosses(F.col("ga"), F.col("gb")).alias("cr"),
        st_relate_match(F.col("ga"), F.col("gb"), F.lit("T*T***T**")).alias("rm"),
    ).collect()
    assert rows[0]["m"] == "212101212" and rows[0]["o"] and rows[0]["rm"]
    assert rows[1]["m"] == "FF2F11212" and rows[1]["t"] and not rows[1]["o"]
    assert rows[2]["m"] == "2FFF1FFF2" and rows[2]["e"] and rows[2]["cv"]
