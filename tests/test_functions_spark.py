"""Spark function-surface tests (st_* pandas UDFs + Catalyst helpers)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jena_geo_spark.functions import vector as V

LINE_A = "LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)"
LINE_B = "LINESTRING(5 5, 10 10)"
HOUSE = (
    "POLYGON((8.286131571192028 49.993592741787,8.28627775158334 49.99350049055274,"
    "8.286228130716564 49.993466866227074,8.286079268116238 49.99355739320413,"
    "8.286131571192028 49.993592741787))"
)


@pytest.fixture(scope="module")
def geoms(spark):
    df = spark.createDataFrame(
        [(LINE_A, LINE_B), (LINE_B, LINE_A), (HOUSE, HOUSE)], "wa string, wb string"
    )
    return df.select(
        "wa",
        "wb",
        V.st_geomfromtext(F.col("wa")).alias("ga"),
        V.st_geomfromtext(F.col("wb")).alias("gb"),
    )


def test_st_distance_golden(spark, geoms):
    rows = geoms.select(V.st_distance(F.col("ga"), F.col("gb")).alias("d")).collect()
    assert rows[0].d == 69.9400386045075  # DistanceTest.java:31-39
    assert rows[1].d == 69.9400386045075
    assert rows[2].d == 0.0


def test_exporters_roundtrip(spark, geoms):
    out = geoms.select(
        V.st_astext(F.col("ga")).alias("wkt"),
        V.st_asgeojson(F.col("ga")).alias("gj"),
        V.st_geometrytype(F.col("ga")).alias("t"),
        V.st_npoints(F.col("ga")).alias("n"),
    ).collect()
    assert out[0].t == "LineString" and out[0].n == 4
    assert out[2].t == "Polygon"
    assert "coordinates" in out[0].gj
    # text roundtrip re-parses to same geometry
    df2 = spark.createDataFrame([(out[0].wkt,)], "w string")
    n2 = df2.select(V.st_npoints(V.st_geomfromtext(F.col("w"))).alias("n")).first().n
    assert n2 == 4


def test_measures_and_accessors(spark):
    df = spark.createDataFrame(
        [("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))", "POINT (2.5 3.5)", "LINESTRING(0 0, 3 4)")],
        "p string, pt string, l string",
    ).select(
        V.st_geomfromtext(F.col("p")).alias("gp"),
        V.st_geomfromtext(F.col("pt")).alias("gpt"),
        V.st_geomfromtext(F.col("l")).alias("gl"),
    )
    r = df.select(
        V.st_area(F.col("gp")).alias("area"),
        V.st_perimeter(F.col("gp")).alias("perim"),
        V.st_length(F.col("gl")).alias("len"),
        V.st_x(F.col("gpt")).alias("x"),
        V.st_y(F.col("gpt")).alias("y"),
        V.st_centroid(F.col("gp")).alias("c"),
        V.st_bounds(F.col("gp")).alias("b"),
    ).first()
    assert r.area == 16.0 and r.perim == 16.0 and r.len == 5.0
    assert (r.x, r.y) == (2.5, 3.5)
    assert (r.c.x, r.c.y) == (2.0, 2.0)
    assert (r.b.xmin, r.b.ymin, r.b.xmax, r.b.ymax) == (0, 0, 4, 4)


def test_predicates(spark):
    df = spark.createDataFrame(
        [("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))", "POINT (2 2)", "POINT (9 9)")],
        "p string, inside string, outside string",
    ).select(
        V.st_geomfromtext(F.col("p")).alias("gp"),
        V.st_geomfromtext(F.col("inside")).alias("gi"),
        V.st_geomfromtext(F.col("outside")).alias("go"),
    )
    r = df.select(
        V.st_contains(F.col("gp"), F.col("gi")).alias("c1"),
        V.st_contains(F.col("gp"), F.col("go")).alias("c2"),
        V.st_within(F.col("gi"), F.col("gp")).alias("w1"),
        V.st_intersects(F.col("gp"), F.col("gi")).alias("i1"),
        V.st_disjoint(F.col("gp"), F.col("go")).alias("d1"),
        V.st_dwithin(F.col("gi"), F.col("go"), F.lit(15.0)).alias("dw"),
    ).first()
    assert r.c1 and not r.c2 and r.w1 and r.i1 and r.d1 and r.dw


def test_transforms(spark):
    df = spark.createDataFrame([("LINESTRING(0 0, 1 0.001, 2 0, 3 1, 4 0)",)], "l string")
    g = df.select(V.st_geomfromtext(F.col("l")).alias("g"))
    r = g.select(
        V.st_npoints(V.st_simplify(F.col("g"), F.lit(0.01))).alias("nsimp"),
        V.st_astext(V.st_envelope(F.col("g"))).alias("env"),
        V.st_npoints(V.st_convexhull(F.col("g"))).alias("nhull"),
        V.st_astext(V.st_translate(F.col("g"), F.lit(10.0), F.lit(20.0))).alias("tr"),
        V.st_astext(V.st_flipcoordinates(F.col("g"))).alias("fl"),
    ).first()
    assert r.nsimp == 4
    assert r.env.startswith("POLYGON")
    assert r.tr.startswith("LINESTRING (10 20")
    assert r.fl.startswith("LINESTRING (0 0, 0.001 1")


def test_linear_referencing(spark):
    df = spark.createDataFrame([("LINESTRING(0 0, 3 4)",)], "l string")
    g = df.select(V.st_geomfromtext(F.col("l")).alias("g"))
    r = g.select(
        V.st_lineinterpolatepoint(F.col("g"), F.lit(0.5)).alias("p"),
        V.st_linelocatepoint(F.col("g"), F.lit(3.0), F.lit(4.0)).alias("f"),
    ).first()
    assert (r.p.x, r.p.y) == (1.5, 2.0) and r.f == 1.0


def test_bbox_predicates_catalyst(spark):
    df = spark.createDataFrame(
        [("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON((5 5, 6 5, 6 6, 5 6, 5 5))")],
        "a string, b string",
    ).select(
        V.st_bounds(V.st_geomfromtext(F.col("a"))).alias("ba"),
        V.st_bounds(V.st_geomfromtext(F.col("b"))).alias("bb"),
    )
    r = df.select(
        V.bbox_intersects(F.col("ba"), F.col("bb")).alias("i"),
        V.bbox_contains(F.col("ba"), F.col("bb")).alias("c"),
        V.bbox_above(F.col("bb"), F.col("ba")).alias("above"),
        V.bbox_left_of(F.col("ba"), F.col("bb")).alias("left"),
    ).first()
    assert not r.i and not r.c and r.above and r.left


def test_unit_conversions(spark):
    df = spark.createDataFrame([(1609.344,)], "m double")
    r = df.select(
        V.convert_unit(F.col("m"), "m", "mile").alias("mi"),
        V.convert_unit(F.col("m"), "m", "km").alias("km"),
        V.convert_unit(F.col("m"), "m", "foot").alias("ft"),
    ).first()
    assert r.mi == 1.0
    assert r.km == pytest.approx(1.609344)
    assert r.ft == pytest.approx(5280.0)


def test_st_point_and_buffer(spark):
    df = spark.createDataFrame([(8.2835, 49.9928)], "lon double, lat double")
    r = df.select(
        V.st_astext(V.st_point(F.col("lon"), F.col("lat"))).alias("w"),
        V.st_area(
            V.st_buffer_point(F.col("lon"), F.col("lat"), F.lit(1.0), F.lit(64))
        ).alias("a"),
    ).first()
    assert r.w == "POINT (8.2835 49.9928)"
    assert r.a == pytest.approx(np.pi, rel=2e-3)  # 64-gon area → π r²


def test_distance_sphere(spark):
    df = spark.createDataFrame([(0.0, 0.0, 90.0, 0.0)], "a double, b double, c double, d double")
    r = df.select(
        V.st_distance_sphere(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
    ).first()
    assert r.m == pytest.approx(np.pi / 2 * 6371008.7714, rel=1e-12)


def test_reference_goldens_via_registry(spark):
    """Batch of reference unit-test goldens that need the registered
    Catalyst/UDF surface (see tests/test_reference_goldens.py for the
    kernel-level batch):

    * ShortestLineTest.java     → LINESTRING(77.29 29.07, 10 10)
    * OffsetCurveTest.java      → LINESTRING(-9 2, -9 10)
    * MinimumBoundingCircleCenterTest.java
                                → POINT(26284.841802713276 65267.11450908256)
    * BoundaryTest.java         → the polygon's exterior ring
    * AsTextTest.java           → 'LINESTRING (1 2, 4 5)'
    * AsGeoJSONTest.java        → JSON-equal to the quoted literal
    * AsGeoURITest.java         → 'geo:49.9928617,8.2472526;crs=EPSG:0'
    * RelateMatchTest.java      → equal matrices true, differing false
    * AsEncodedPolylineTest.java→ '~ps|U_p~iFnnqC_ulLvxq`@_mqN'
    * PointFromTextTest.java    → coordinate-exact parse
    """
    import json

    from jena_geo_spark.functions.registry import REGISTRY as R
    from jena_geo_spark.geom import wkt as W

    def wkb(s):
        return W.to_wkb(W.from_wkt(s))

    rows = [(
        wkb(LINE_A),
        wkb(LINE_B),
        wkb("POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))"),
        wkb("POLYGON((26426 65078,26531 65242,26075 65136,26096 65427,26426 65078))"),
        wkb("LINESTRING(1 2,1 10)"),
        wkb("LINESTRING (1 2, 4 5)"),
        wkb("POINT(49.9928617 8.2472526)"),
        wkb("LINESTRING(-120.2 38.5,-120.95 40.7,-126.453 43.252)"),
    )]
    df = spark.createDataFrame(
        rows,
        "tri binary, seg binary, poly binary, mbc binary, off binary,"
        " line binary, pt binary, gpoly binary",
    )
    r = df.select(
        R["st_astext"][0](R["st_shortestline"][0](F.col("tri"), F.col("seg"))).alias("shortest"),
        R["st_astext"][0](R["st_offsetcurve"][0](F.col("off"), F.lit(10.0))).alias("offset"),
        R["st_astext"][0](R["st_minimumboundingcirclecenter"][0](F.col("mbc"))).alias("mbcc"),
        R["st_astext"][0](R["st_boundary"][0](F.col("poly"))).alias("boundary"),
        R["st_astext"][0](F.col("line")).alias("astext"),
        R["st_asgeojson"][0](F.col("line")).alias("geojson"),
        R["st_asgeouri"][0](F.col("pt")).alias("geouri"),
        R["st_relatematch"][0](F.lit("212101212"), F.lit("212101212")).alias("rm_t"),
        R["st_relatematch"][0](F.lit("212FF1212"), F.lit("212101212")).alias("rm_f"),
        R["st_asencodedpolyline"][0](F.col("gpoly")).alias("encpoly"),
        R["st_astext"][0](
            R["st_pointfromtext"][0](F.lit("POINT(-71.1043443253471 42.3150676015829)"))
        ).alias("ptwkt"),
    ).collect()[0]
    assert r.shortest == "LINESTRING (77.29 29.07, 10 10)"
    assert r.offset == "LINESTRING (-9 2, -9 10)"
    mx, my = r.mbcc.replace("POINT (", "").rstrip(")").split()
    assert float(mx) == pytest.approx(26284.841802713276, rel=1e-12)
    assert float(my) == pytest.approx(65267.11450908256, rel=1e-12)
    assert r.boundary == "LINESTRING (0 0, 1 0, 1 1, 0.5 0.00032, 0 0)"
    assert r.astext == "LINESTRING (1 2, 4 5)"
    assert json.loads(r.geojson) == {
        "type": "LineString",
        "coordinates": [[1.0, 2.0], [4.0, 5.0]],
    }
    assert r.geouri == "geo:49.9928617,8.2472526;crs=EPSG:0"
    assert (r.rm_t, r.rm_f) == (True, False)
    assert r.encpoly == "~ps|U_p~iFnnqC_ulLvxq`@_mqN"
    assert r.ptwkt == "POINT (-71.1043443253471 42.3150676015829)"


def test_line_difference_udf(spark):
    # DifferenceTest.java through the registered overlay UDF: line inputs
    # dispatch to the 1D overlay instead of the polygon kernel
    from jena_geo_spark.geom import wkt as W

    a = W.to_wkb(W.from_wkt(LINE_A))
    b = W.to_wkb(W.from_wkt("LINESTRING(77.42 29.26, 10 10)"))
    df = spark.createDataFrame([(a, b)], "a binary, b binary")
    r = df.select(V.st_astext(V.st_difference(F.col("a"), F.col("b"))).alias("d")).first()
    assert r.d == (
        "MULTILINESTRING ((77.29 29.07, 77.42 29.26), "
        "(77.42 29.26, 77.27 29.31, 77.2775576481951 29.21930822165882), "
        "(77.2775576481951 29.21930822165882, 77.29 29.07))"
    )


def test_bbox_relation_goldens(spark):
    """envelope/relation/BBOX{Above,Below,LeftOf,RightOf}Test.java."""
    from jena_geo_spark.functions.registry import REGISTRY as R
    from jena_geo_spark.geom import wkt as W

    def wkb(s):
        return W.to_wkb(W.from_wkt(s))

    above1 = wkb("LINESTRING (1 4, 1 7)")
    above2 = wkb("LINESTRING (0 0, 4 2)")
    lr1 = wkb("LINESTRING (2 3, 5 6)")
    lr2 = wkb("LINESTRING (1 4, 1 7)")
    df = spark.createDataFrame(
        [(above1, above2, lr1, lr2)], "a1 binary, a2 binary, l1 binary, l2 binary"
    )
    r = df.select(
        R["st_bboxabove"][0](F.col("a1"), F.col("a2")).alias("ab_t"),
        R["st_bboxabove"][0](F.col("a2"), F.col("a1")).alias("ab_f"),
        R["st_bboxbelow"][0](F.col("a1"), F.col("a2")).alias("be_f"),
        R["st_bboxbelow"][0](F.col("a2"), F.col("a1")).alias("be_t"),
        R["st_bboxleftof"][0](F.col("l1"), F.col("l2")).alias("lo_f"),
        R["st_bboxleftof"][0](F.col("l2"), F.col("l1")).alias("lo_t"),
        R["st_bboxrightof"][0](F.col("l1"), F.col("l2")).alias("ro_t"),
        R["st_bboxrightof"][0](F.col("l2"), F.col("l1")).alias("ro_f"),
    ).first()
    assert (r.ab_t, r.ab_f, r.be_f, r.be_t) == (True, False, False, True)
    assert (r.lo_f, r.lo_t, r.ro_t, r.ro_f) == (False, True, True, False)

    # Documented divergence: reference BBOXAbove.java tests
    # maxY(A) > minY(B) (typo — loose), ours is the strict minY(A) > maxY(B)
    # its doc comment and siblings describe.  Overlapping-in-Y fixtures
    # separate the two: strict says False both ways.
    ov1 = wkb("LINESTRING (0 0, 1 5)")  # y in [0,5]
    ov2 = wkb("LINESTRING (2 3, 3 8)")  # y in [3,8] — overlaps [0,5]
    df2 = spark.createDataFrame([(ov1, ov2)], "o1 binary, o2 binary")
    r2 = df2.select(
        R["st_bboxabove"][0](F.col("o1"), F.col("o2")).alias("a12"),
        R["st_bboxabove"][0](F.col("o2"), F.col("o1")).alias("a21"),
    ).first()
    assert (r2.a12, r2.a21) == (False, False)


def test_equal_srs_goldens(spark):
    """EqualSRSTest.java: same declared SRS -> TRUE; two literals with no
    SRS prefix (both default 4326) -> TRUE.  Our engine carries SRID as a
    column (FIXTURES.md §1), so 'no prefix' is the default-SRID value."""
    from jena_geo_spark.functions.relations2 import st_equalsrs

    df = spark.createDataFrame([(27700, 27700, 4326, 4326)], "a int, b int, c int, d int")
    r = df.select(
        st_equalsrs(F.col("a"), F.col("b")).alias("same"),
        st_equalsrs(F.col("c"), F.col("d")).alias("default"),
        st_equalsrs(F.col("a"), F.col("c")).alias("diff"),
    ).first()
    assert (r.same, r.default, r.diff) == (True, True, False)
