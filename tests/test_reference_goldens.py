"""Golden values ported from the reference's unit tests
(``src/test/de/hsmainz/cs/semgis/arqextension/test/...``) — exact unless
noted.  Runs the kernels / UDF bodies directly (no Spark session): these
are value tests, the Spark plumbing is covered by test_registry.py.

Documented divergences (reference value NOT matched on purpose):
* RelateTest.java expects "212101212" for a ZERO-AREA (collinear) second
  polygon — JTS mislabels the degenerate ring's interior as 2-dimensional;
  our relate returns the topologically correct 'F12F01212' (empty interior).
* FrechetDistanceTest.java expects 10.0 for two polylines whose END POINTS
  are 191.05 apart — the continuous Fréchet distance is bounded below by
  the endpoint distance, so 10.0 is impossible; the vendored
  heigit/ors FrechetDistance the reference calls is not a Fréchet metric.
  Ours returns the true value (endpoint-coupled dynamic program).
* IsMorePreciseTest.java expects ±1 but the implementation compares a
  geometry with itself (copy-paste bug) and JTS FLOATING precision models
  are always equal — the reference test cannot pass against its own code.
* IsConvexTest.java expects FALSE for a zero-area collinear polygon, but
  the reference's isConvex contains a typo (``dy2 = c2.y - c2.y`` — always
  zero), so its orientation term is not a cross product; ours returns
  TRUE (all cross products zero → vacuously convex).  See
  test_triangle_predicate_goldens.
* SetRingTest.java passes only because SetRing.java never reads its third
  argument (the replacement ring) and behaves as RemoveRing; ours replaces
  the ring (test_set_ring_divergence).
* GeometricMedianTest.java asserts POINT(0 0) against a null result (the
  exec call is commented out) — and POINT(0 0) is not the median of its
  fixture; ours is pinned by the Weiszfeld optimality property instead
  (test_geometric_median_invariant).
* Unregistered-in-PostGISConfig dead code whose tests are therefore not
  ported: HasDuplicateRings, HasConnectedInterior, IsScaleneTriangle (its
  test also expects TRUE for an isoceles fixture — the impl's OR-of-ANDs
  is "not equilateral", not "scalene"), CompactnessRatioTest's disabled
  body (it expects a POINT from a ratio).  CircumcentreTest's live value
  IS ported at the kernel level (test_circumcentre_golden).
* MakeLineTest.java asserts the result equals a POINT literal of its first
  input; MakeLine.java concatenates coordinates — the impl's semantics are
  pinned (test_makeline_golden).
* Force4DTest.java's expected coordinates are internally inconsistent
  (z moved to m for two vertices, dropped for the rest); Force4D.java
  keeps Z and fills M with 0, which is what we pin (test_force4d_golden).
* 17 of the 32 unit/*Test.java goldens assert rounded 4-10-significant-
  digit factors (both Chain tests inverted outright); ours are the exact
  international factors (test_unit_conversion_goldens pins the full
  match/divergence table).
* BandMetadataTest.java expects "" for an out-of-range band and passes only
  because BandMetaData.java's in-range path is an
  UnsupportedOperationException stub; ours returns NULL out-of-range and a
  real metadata string in range (test_raster_summary_and_bandmetadata_
  goldens in test_raster.py).
* BBOXAbove.java computes ``maxY(A) > minY(B)`` — a typo: its own doc
  comment says "strictly above", its three siblings (Below/LeftOf/RightOf)
  are all strict comparisons of the facing edges, and the loose variant
  already exists as BBOXOverlapsAbove.java.  Ours is the strict
  ``minY(A) > maxY(B)``; BBOXAboveTest.java's fixtures pass under both
  formulas (test_bbox_relation_goldens in test_functions_spark.py pins the
  distinguishing overlap case).
"""

import math

import numpy as np
import pandas as pd
import pytest

from jena_geo_spark.functions import accessors as A
from jena_geo_spark.functions import shapes as FS
from jena_geo_spark.functions import transform as FT
from jena_geo_spark.functions import vector as FV
from jena_geo_spark.functions import exporters2 as E2
from jena_geo_spark.geom import distances as D
from jena_geo_spark.geom import relate as R
from jena_geo_spark.geom import shapes as S
from jena_geo_spark.geom import wkt as W


def g(s):
    return W.from_wkt(s)


def wkb(s):
    return W.to_wkb(g(s))


def u1(udf, *args):
    """Invoke a pandas_udf's underlying function on single values."""
    series = [pd.Series([a]) for a in args]
    return udf.func(*series).iloc[0]


def test_hausdorff_golden():  # HausdorffDistanceTest.java
    assert D.hausdorff(g("LINESTRING (0 0, 2 0)"), g("MULTIPOINT (0 1, 1 0, 2 1)")) == 1.0


def test_max_distance_golden():  # MaxDistanceTest.java
    got = D.max_distance(
        g("LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)"),
        g("LINESTRING(5 5 ,10 10)"),
    )
    assert got == 76.37541489249011


def test_relate_multipoint_self_golden():  # IntersectionMatrixTest.java
    mp = g("MULTIPOINT (10 40, 40 30, 20 20, 30 10)")
    assert R.relate(mp, mp) == "0FFFFFFF2"


def test_intersection_percentage_golden():  # IntersectionPercentageTest.java
    got = u1(
        FV.st_intersection_percentage,
        wkb("POLYGON((1 2, 11 13, 5 6, 1 2))"),
        wkb("POLYGON((1 2, 11 13, 5 5, 1 2))"),
    )
    # the triangles share a full edge — a GH degeneracy the overlay kernel
    # resolves with a 1e-9 relative perturbation, so ~1e-8 noise is expected
    assert got == pytest.approx(0.2857142857142857, abs=1e-7)


def test_angle_golden():  # AngleTest.java
    got = u1(A.st_angle, wkb("POINT (25 45)"), wkb("POINT (75 100)"), wkb("POINT (50 80)"))
    assert got == pytest.approx(0.15824032445087835, abs=1e-15)


def test_azimuth_golden():  # AzimuthTest.java (spherical great-circle)
    got = u1(FT.st_azimuth, 25.0, 45.0, 75.0, 100.0)
    assert got == pytest.approx(6.113262637907632, abs=1e-12)


def test_minimum_clearance_golden():  # MinimumClearanceTest.java
    d, _ = A._min_clearance(g("POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))"))
    assert d == pytest.approx(0.00032, abs=1e-18)


def test_minimum_diameter_golden():  # MinimumDiameterTest.java
    got = u1(FS.st_minimumdiameter, wkb("POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))"))
    assert got == pytest.approx(0.7071067811865476, abs=1e-15)


def test_minimum_bounding_radius_golden():  # MinimumBoundingRadiusTest.java
    _, _, r = S.min_bounding_circle(
        g("POLYGON((26426 65078,26531 65242,26075 65136,26096 65427,26426 65078))").all_coords()
    )
    assert r == pytest.approx(247.4360455914027, abs=1e-9)


def test_circularity_golden():  # CircularityIndexTest.java
    assert u1(A.st_circularity, wkb("POLYGON((8 2, 11 13, 2 6, 8 2))")) == pytest.approx(
        0.5440126910331675, abs=1e-15
    )
    # non-polygon → 0.0 per the reference
    assert u1(A.st_circularity, wkb("LINESTRING(1 2, 3 4)")) == 0.0


def test_length_to_point_golden():  # LengthToPointTest.java
    got = u1(A.st_lengthtopoint, wkb("LINESTRING (0 0, 0 1, 1 1, 1 0, 0 0)"), wkb("POINT (1 0)"))
    assert got == 3.0


def test_nrings_golden():  # NRingsTest.java — interior rings only
    assert u1(A.st_nrings, wkb("POLYGON((1 2, 3 4, 5 6, 1 2))")) == 0
    assert (
        u1(A.st_nrings, wkb("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 4 3, 4 4, 3 4, 3 3))")) == 1
    )


def test_ndims_goldens():  # NDimsTest.java — M does not add a dimension
    assert u1(A.st_ndims, wkb("POINT (1 1)")) == 2
    assert u1(A.st_ndims, wkb("POINT Z (1 1 2)")) == 3
    assert u1(A.st_ndims, wkb("POINT M (1 1 0.5)")) == 2


def test_is_closed_goldens():  # IsClosedTest.java
    assert u1(A.st_isclosed, wkb("LINESTRING (0 0, 1 1)")) is False
    assert u1(A.st_isclosed, wkb("LINESTRING (0 0, 0 1, 1 1, 0 0)")) is True
    assert (
        u1(A.st_isclosed, wkb("MULTILINESTRING ((0 0, 0 1, 1 1, 0 0), (0 0, 1 1))")) is False
    )
    assert u1(A.st_isclosed, wkb("POINT (0 0)")) is True


def test_is_ring_goldens():  # IsRingTest.java
    assert u1(A.st_isring, wkb("LINESTRING (0 0, 0 1, 1 1, 1 0, 0 0)")) is True
    assert u1(A.st_isring, wkb("LINESTRING (0 0, 0 1, 1 0, 1 1)")) is False


def test_is_valid_trajectory_goldens():  # IsValidTrajectoryTest.java
    assert u1(A.st_isvalidtrajectory, wkb("LINESTRING M (0 0 1, 0 1 2)")) is True
    assert u1(A.st_isvalidtrajectory, wkb("LINESTRING M (0 0 1, 0 1 0)")) is False


def test_has_repeated_points_goldens():  # HasRepeatedPointsTest.java
    # NB the reference golden uses consecutive duplicates ((1 1) twice
    # adjacent? no — (1 1) reappears NON-adjacently; JTS RepeatedPointTester
    # only flags consecutive repeats, so the golden 'true' case must contain
    # an adjacent pair after closing; test both behaviours explicitly:
    assert u1(A.st_hasrepeatedpoints, wkb("LINESTRING (0 0, 1 1, 1 1, 6 8)")) is True
    assert u1(A.st_hasrepeatedpoints, wkb("LINESTRING (0 0, 1 1, 2 4, 6 8)")) is False


def test_num_distinct_goldens():  # NumDistinct{Points,Geometries}Test.java
    line = "LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)"
    assert u1(A.st_numdistinctpoints, wkb(line)) == 3
    gc = (
        "GEOMETRYCOLLECTION(MULTIPOINT(-2 3, -2 2),LINESTRING(5 5, 10 10),"
        "LINESTRING(5 5, 10 10),POLYGON((-7 4.2,-7.1 5,-7.1 4.3,-7 4.2)))"
    )
    assert u1(A.st_numdistinctgeometries, wkb(gc)) == 3
    assert u1(A.st_numgeometries, wkb(gc)) == 4


def test_zm_accessor_goldens():  # {X,Y,Z,M,MinM,MaxM,MinZ,MaxZ,...}Test.java
    from jena_geo_spark.functions import zm as Z

    p = wkb("POINT ZM (1 2 3 4)")
    assert u1(FV.st_x, p) == 1.0
    assert u1(FV.st_y, p) == 2.0
    assert u1(Z.st_z, p) == 3.0
    assert u1(Z.st_m, p) == 4.0
    lm = wkb("LINESTRING M (1 2 3, 4 5 6, 7 8 9)")
    assert u1(Z.st_mmin, lm) == 3.0
    assert u1(Z.st_mmax, lm) == 9.0
    lz = wkb("LINESTRING Z (1 2 3, 4 5 6, 7 8 9)")
    assert u1(Z.st_zmin, lz) == 3.0
    assert u1(Z.st_zmax, lz) == 9.0
    l4 = wkb("LINESTRING (1 2, 3 4, 5 6, 7 8)")
    assert u1(A.st_xmin, l4) == 1.0
    assert u1(A.st_xmax, l4) == 7.0
    assert u1(A.st_ymin, l4) == 2.0
    assert u1(A.st_ymax, l4) == 8.0


def test_distance_sphere_golden():  # DistanceSphereTest.java
    from jena_geo_spark.functions import registry_support as RS

    got = u1(
        RS.st_distancesphere_geom,
        wkb("LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)"),
        wkb("LINESTRING(5 5, 10 10)"),
    )
    assert got == pytest.approx(7269372.186370237, abs=1e-5)
    same = wkb("LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)")
    assert u1(RS.st_distancesphere_geom, same, same) == 0.0


def test_bbox_distance_golden():  # BBOXDistanceTest.java
    a = wkb("LINESTRING (1 4, 1 7)")
    b = wkb("LINESTRING (0 0, 4 2)")
    env_a = u1(FV.st_envelope, a)
    env_b = u1(FV.st_envelope, b)
    assert u1(FV.st_distance, env_a, env_b) == 2.0


def test_hexewkb_golden():  # AsHEXEWKBTest.java — byte-for-byte XDR hex
    got = u1(E2.st_ashexewkb, wkb("POLYGON((0 0,0 1,1 1,1 0,0 0))"))
    assert got == (
        "000000000300000001000000050000000000000000000000000000000000000000000000003FF00"
        "000000000003FF00000000000003FF00000000000003FF00000000000000000000000000000000"
        "00000000000000000000000000000"
    )


def test_polyshape_golden():  # AsPolyshapeTest.java
    assert u1(E2.st_aspolyshape, wkb("POINT (49.9928617 8.2472526)")) == "0kfcpHixiq@"


def test_astextround_golden():  # AsTextRoundTest.java
    got = u1(E2.st_astextround, wkb("LINESTRING (1.32453 2.65655, 4.96254 5.43341)"), 2.0)
    assert got == "LINESTRING (1.32 2.66, 4.96 5.43)"


def test_frechet_lower_bound_vs_reference():
    """Documented divergence (see module docstring): the true continuous
    Fréchet distance here is the endpoint distance 191.049…, not the
    reference's 10.0."""
    p = np.array([[130.0, 0.0], [0.0, 0.0], [0.0, 150.0]])
    q = np.array([[10.0, 10.0], [10.0, 150.0], [130.0, 10.0]])
    got = D.frechet_continuous(p, q)
    endpoint = math.hypot(130 - 0, 10 - 150)
    assert got >= endpoint - 1e-9
    assert got == pytest.approx(191.049731745428, abs=1e-6)


def test_relate_degenerate_divergence():
    """Documented divergence: zero-area collinear 'polygon' has an empty
    interior — entry [0] of the matrix must be F, not the reference's 2."""
    got = R.relate(g("POLYGON((8 2, 11 13, 2 6, 8 2))"), g("POLYGON((1 2, 3 4, 5 6, 1 2))"))
    assert got[0] == "F"


# ----------------------------- r3 batch 2: attribute / relation / envelope --


AREA_POLY = (
    "POLYGON((743238 2967416,743238 2967450,743265 2967450,"
    "743265.625 2967416,743238 2967416))"
)
LEN_LINE = (
    "LINESTRING(743238 2967416,743238 2967450,743265 2967450,"
    " 743265.625 2967416,743238 2967416)"
)
TRI_LINE = "LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)"
SEG_LINE = "LINESTRING(5 5 ,10 10)"


def test_area_golden():  # AreaTest.java — 928.625
    assert u1(FV.st_area, wkb(AREA_POLY)) == 928.625


def test_length_golden():  # LengthTest.java
    assert u1(FV.st_length, wkb(LEN_LINE)) == 122.63074400009504


def test_perimeter_golden():  # PerimeterTest.java — same ring as a polygon
    assert u1(FV.st_perimeter, wkb(AREA_POLY)) == 122.63074400009504


def test_centroid_golden():  # CentroidTest.java
    got = u1(FV.st_centroid, wkb("POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))"))
    assert got["x"] == pytest.approx(0.8331201364460079, abs=1e-15)
    assert got["y"] == pytest.approx(0.33322680311267455, abs=1e-15)


def test_azimuth_reverse_golden():  # AzimuthTest.java testAzimuth2
    got = u1(FT.st_azimuth, 75.0, 100.0, 25.0, 45.0)
    assert got == pytest.approx(3.9011648233916847, abs=1e-12)


def test_num_points_golden():  # NumPointsTest.java — 4
    from jena_geo_spark.functions.registry import REGISTRY

    npts = REGISTRY["st_numpoints"][0]
    assert u1(npts, wkb(TRI_LINE)) == 4


def test_num_geometries_goldens():  # NumGeometriesTest.java — 1 and 3
    assert u1(A.st_numgeometries, wkb(TRI_LINE)) == 1
    coll = (
        "GEOMETRYCOLLECTION(MULTIPOINT(-2 3 , -2 2),LINESTRING(5 5 ,10 10),"
        "POLYGON((-7 4.2,-7.1 5,-7.1 4.3,-7 4.2)))"
    )
    assert u1(A.st_numgeometries, wkb(coll)) == 3


def test_envelope_xmax_ymax_goldens():  # envelope/XMaxTest.java, YMaxTest.java
    line3d = wkb("LINESTRING Z(1 3 4, 5 6 7)")
    assert u1(A.st_xmax, line3d) == 5.0
    assert u1(A.st_ymax, line3d) == 6.0


def test_num_distinct_goldens():
    # NumDistinctGeometriesTest.java: a simple geometry counts 1; a
    # collection with a duplicated LINESTRING member counts distinct
    # top-level members (4 members, 3 distinct).
    closed = wkb("LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)")
    assert u1(A.st_numdistinctgeometries, closed) == 1
    gc = wkb(
        "GEOMETRYCOLLECTION(MULTIPOINT(-2 3 , -2 2),"
        "LINESTRING(5 5 ,10 10),LINESTRING(5 5 ,10 10),"
        "POLYGON((-7 4.2,-7.1 5,-7.1 4.3,-7 4.2)))"
    )
    assert u1(A.st_numdistinctgeometries, gc) == 3
    # NumDistinctPointsTest.java: closed ring repeats its start — 3 distinct
    assert u1(A.st_numdistinctpoints, closed) == 3


def test_collection_transform_semantics():
    """geometry/transform/{ForceCollection,CollectionExtract,
    CollectionHomogenize}Test.java and point/constructor/
    GeneratePointsTest.java are disabled in the reference; these pin the
    registered implementations' semantics instead.

    Divergences from the reference impl bodies (not their tests):
    CollectionExtract.java type 1 concatenates EVERY member's coordinates
    (line/polygon vertices become points) and types 2/3 blind-cast every
    member (ClassCastException on mixed collections); ours follows the
    PostGIS contract both mirror — keep only the members of the requested
    type.  CollectionHomogenize.java likewise blind-casts on the first
    member's type; ours returns the collection unchanged when mixed."""
    from jena_geo_spark.functions import transforms2 as T2

    def wk(b):
        return W.to_wkt(W.from_wkb(b))

    # ForceCollection.java: wrap any geometry in a GEOMETRYCOLLECTION
    assert wk(u1(T2.st_forcecollection, wkb("POINT (1 2)"))) == (
        "GEOMETRYCOLLECTION (POINT (1 2))"
    )
    gc = wkb(
        "GEOMETRYCOLLECTION(POINT(1 1),MULTIPOINT(2 2, 3 3),"
        "LINESTRING(0 0, 4 4),POLYGON((0 0,1 0,0 1,0 0)))"
    )
    assert wk(u1(T2.st_collectionextract, gc, 1.0)) == "MULTIPOINT (1 1, 2 2, 3 3)"
    assert wk(u1(T2.st_collectionextract, gc, 2.0)) == "MULTILINESTRING ((0 0, 4 4))"
    assert wk(u1(T2.st_collectionextract, gc, 3.0)) == (
        "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)))"
    )
    # CollectionHomogenize.java: single member unwraps; homogeneous
    # members merge into the multi-type; mixed stays a collection
    assert wk(u1(T2.st_collectionhomogenize, wkb("GEOMETRYCOLLECTION(POINT(0 0))"))) == "POINT (0 0)"
    assert wk(
        u1(T2.st_collectionhomogenize, wkb("GEOMETRYCOLLECTION(POINT(0 0),POINT(1 1))"))
    ) == "MULTIPOINT (0 0, 1 1)"
    assert wk(
        u1(
            T2.st_collectionhomogenize,
            wkb("GEOMETRYCOLLECTION(POINT(0 0),LINESTRING(0 0,1 1))"),
        )
    ) == "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))"


def test_generate_points_semantics():
    # GeneratePoints.java: n uniform points inside the polygon (convex
    # hull for non-areal input).  Ours seeds the RNG from the geometry
    # bytes, so results are deterministic (plans replay / resume safely).
    from jena_geo_spark.functions import transforms2 as T2

    poly = wkb("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    a = u1(T2.st_generatepoints, poly, 5.0)
    assert a == u1(T2.st_generatepoints, poly, 5.0)  # deterministic
    pts = W.from_wkb(a).parts[0]
    assert len(pts) == 5
    assert ((pts >= 0) & (pts <= 10)).all()
    # non-areal input samples the convex hull (reference line 14-21)
    line = wkb("LINESTRING(0 0, 4 0, 4 4)")
    assert len(W.from_wkb(u1(T2.st_generatepoints, line, 3.0)).parts[0]) == 3


def test_remove_ring_golden():
    # RemoveRingTest.java: interior index 0 (zero-based) on a polygon whose
    # hole duplicates its shell leaves just the shell.
    dup = wkb("POLYGON ((8 2, 11 13, 2 6, 8 2), (8 2, 11 13, 2 6, 8 2))")
    got = W.to_wkt(W.from_wkb(u1(FV.st_removering, dup, 0)))
    assert got == "POLYGON ((8 2, 11 13, 2 6, 8 2))"


def test_longest_line_golden():  # LongestLineTest.java
    got = W.from_wkb(u1(FV.st_longestline, wkb(TRI_LINE), wkb(SEG_LINE)))
    assert got.parts[0].tolist() == [[77.42, 29.26], [5.0, 5.0]]


def test_furthest_coordinate_golden():  # FurthestCoordinateTest.java
    from jena_geo_spark.functions import relations2 as R2

    got = W.from_wkb(u1(R2.st_furthestcoordinate, wkb(SEG_LINE), wkb(TRI_LINE)))
    assert got.parts[0].tolist() == [[5.0, 5.0]]


def test_closest_point_golden():  # ClosestPointTest.java — the point itself
    got = u1(
        FV.st_closestpoint,
        wkb("POINT(100 100)"),
        wkb("LINESTRING (20 80, 98 190, 110 180, 50 75)"),
    )
    assert (got["x"], got["y"]) == (100.0, 100.0)


def test_area_similarity_golden():  # AreaSimilarityTest.java — identical → 1
    from jena_geo_spark.functions import relations2 as R2

    tri = wkb("POLYGON((8 2, 11 13, 2 6, 8 2))")
    assert u1(R2.st_areasimilarity, tri, tri) == 1.0


def test_make_point_goldens():  # MakePointTest.java
    from jena_geo_spark.functions import registry_support as RS

    got = W.from_wkb(u1(RS.st_makepoint, -71.1043443253471, 42.3150676015829))
    assert got.parts[0].tolist() == [[-71.1043443253471, 42.3150676015829]]


# --------------------------------------------- unit conversions (unit/*.java) --
#
# The reference hardcodes ROUNDED inverse factors (e.g. foot→m is
# value/3.2808, mile→m value/0.00062137) and its chain/link conversions
# multiply by the INVERSE factor (ChainToMeter.java: value*0.04971 — a
# chain is 20.1168 m, so that is chains-per-meter applied backwards).  We
# use the exact international definitions (vector.py UNIT_FACTORS_TO_M)
# and document the divergences instead of replicating them:
#   foot   ours 0.3048            ref 1/3.2808      = 0.30480370641307
#   yard   ours 0.9144            ref 1/1.0936      = 0.91441111923921
#   mile   ours 1609.344          ref 1/0.00062137  = 1609.3470878864446
#   usmile ours 6336000/3937      ref 1/0.0006213699= 1609.3473468862912
#   chain  ours 20.1168           ref 0.04971 (inverted)
#   link   ours 0.201168          ref (inverted like chain)


def test_unit_factor_goldens_exact_matches():
    # conversions where the reference's constant IS the exact definition
    from jena_geo_spark.functions.vector import UNIT_FACTORS_TO_M as U

    assert U["cm"] == 0.01 and U["dm"] == 0.1  # CentimeterToMeterTest etc.
    assert U["km"] == 1000.0 and U["mm"] == 0.001
    assert U["nauticalmile"] == 1852.0  # NauticalMileToMeterTest.java
    assert U["fathom"] == pytest.approx(1.8287999998958315, rel=1e-10)
    assert U["usfoot"] == pytest.approx(0.30480060991089725, rel=1e-8)
    assert U["usinch"] == pytest.approx(0.0254000508, rel=1e-9)


def test_unit_factor_documented_divergences():
    # the rounded reference factors differ from the exact definitions in
    # the 5th-7th significant digit; assert we are within 0.1% (so a typo
    # in OUR table would still be caught) but intentionally NOT equal
    from jena_geo_spark.functions.vector import UNIT_FACTORS_TO_M as U

    assert U["foot"] == 0.3048 != pytest.approx(1 / 3.2808, rel=1e-9)
    assert U["foot"] == pytest.approx(1 / 3.2808, rel=1e-3)
    assert U["yard"] == 0.9144 and U["yard"] == pytest.approx(1 / 1.0936, rel=1e-3)
    assert U["mile"] == 1609.344 == pytest.approx(1 / 0.00062137, rel=1e-4)
    assert U["chain"] == 20.1168 == pytest.approx(1 / 0.049710, rel=1e-4)
    assert U["link"] == 0.201168  # ref LinkToMeter is inverted, see above
    # USYardToMeter.java divides by 1.094 (a 4-digit rounding of
    # 1.0936132983 yd/m); exact factor is 3600/3937
    assert U["usyard"] == 3600.0 / 3937.0 == pytest.approx(1 / 1.094, rel=1e-3)


# ------------------------------------------ collection editors (editor/*) --


COLL = (
    "GEOMETRYCOLLECTION(MULTIPOINT(-2 3 , -2 2),LINESTRING(5 5 ,10 10),"
    "POLYGON((-7 4.2,-7.1 5,-7.1 4.3,-7 4.2)))"
)
COLL_PLUS = (
    "GEOMETRYCOLLECTION(MULTIPOINT(-2 3 , -2 2),LINESTRING(5 5 ,10 10),"
    "POLYGON((-7 4.2,-7.1 5,-7.1 4.3,-7 4.2)),"
    "LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07))"
)


def _geq(wkb_bytes, wkt):
    """Structural equality of a WKB result against an expected WKT
    (to_wkb is deterministic, so byte equality == structural equality,
    collections included)."""
    return wkb_bytes == W.to_wkb(W.from_wkt(wkt))


def test_add_geometry_golden():  # AddGeometryTest.java
    from jena_geo_spark.functions.registry import REGISTRY

    fn = REGISTRY["st_addgeometry"][0]
    assert _geq(u1(fn, wkb(COLL), wkb(TRI_LINE)), COLL_PLUS)


def test_remove_geometry_golden():  # RemoveGeometryTest.java
    from jena_geo_spark.functions.registry import REGISTRY

    fn = REGISTRY["st_removegeometry"][0]
    assert _geq(u1(fn, wkb(COLL_PLUS), 3), COLL)


def test_set_geometry_golden():  # SetGeometryTest.java
    from jena_geo_spark.functions.registry import REGISTRY

    fn = REGISTRY["st_setgeometry"][0]
    exp = (
        "GEOMETRYCOLLECTION("
        "LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07),"
        "LINESTRING(5 5 ,10 10),POLYGON((-7 4.2,-7.1 5,-7.1 4.3,-7 4.2)))"
    )
    assert _geq(u1(fn, wkb(COLL), wkb(TRI_LINE), 0), exp)


def test_ensure_closed_goldens():  # EnsureClosedTest.java
    from jena_geo_spark.functions.registry import REGISTRY

    fn = REGISTRY["st_ensureclosed"][0]
    closed = "LINESTRING(8 2, 11 13, 2 6, 8 2)"
    assert _geq(u1(fn, wkb("LINESTRING(8 2, 11 13, 2 6)")), closed)
    assert _geq(u1(fn, wkb(closed)), closed)


def test_area_similarity_edge_cases():  # review r3.2 findings 1/5
    from jena_geo_spark.functions import relations2 as R2

    # identity shortcut must survive nested part layouts
    mp = wkb("MULTIPOLYGON(((0 0,4 0,4 4,0 0)),((10 10,14 10,14 14,10 10)))")
    assert u1(R2.st_areasimilarity, mp, mp) == 1.0
    # ...but a zero-area degenerate pair keeps the overlay path's None
    deg = wkb("POLYGON((0 0,1 1,2 2,0 0))")
    assert u1(R2.st_areasimilarity, deg, deg) is None


def test_ensure_closed_edge_cases():  # review r3.2 findings 2/3
    from jena_geo_spark.functions.registry import REGISTRY

    fn = REGISTRY["st_ensureclosed"][0]
    # empty linestring passes through unchanged (no [0] on a 0-row array)
    assert W.from_wkb(u1(fn, wkb("LINESTRING EMPTY"))).kind == "linestring"
    # Z polygons keep their dims through the close
    gz = W.from_wkb(u1(fn, wkb("POLYGON Z((0 0 1,4 0 1,4 4 1,0 0 1))")))
    assert gz.dims == "XYZ" and gz.parts[0].shape[1] == 3


def test_relate_match_null_safe():  # review r3.2 finding 4
    from jena_geo_spark.functions import relate as FR

    assert u1(FR.st_relate_match_strings, None, "212101212") is None


def test_line_difference_golden():  # DifferenceTest.java (line x line)
    from jena_geo_spark.geom import linework as L

    A = g("LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)")
    B = g("LINESTRING(77.42 29.26, 10 10)")
    out = L.line_overlay(A.parts, B.parts, "difference")
    # the golden MULTILINESTRING, split-point doubles bit-exact
    assert [p.tolist() for p in out] == [
        [[77.29, 29.07], [77.42, 29.26]],
        [[77.42, 29.26], [77.27, 29.31], [77.2775576481951, 29.21930822165882]],
        [[77.2775576481951, 29.21930822165882], [77.29, 29.07]],
    ]


def test_line_overlay_ops():
    from jena_geo_spark.geom import linework as L

    A = g("LINESTRING(0 0, 10 0)")
    B = g("LINESTRING(4 0, 6 0)")  # collinear middle overlap
    diff = L.line_overlay(A.parts, B.parts, "difference")
    assert sorted(p[[0, -1], 0].tolist() for p in diff) == [[0, 4], [6, 10]]
    inter = L.line_overlay(A.parts, B.parts, "intersection")
    assert [p[[0, -1], 0].tolist() for p in inter] == [[4, 6]]
    sym = L.line_overlay(A.parts, B.parts, "symdifference")
    assert sorted(p[[0, -1], 0].tolist() for p in sym) == [[0, 4], [6, 10]]
    uni = L.line_overlay(A.parts, B.parts, "union")
    # total union length is the full 10 (shared part counted once)
    assert sum(abs(p[-1, 0] - p[0, 0]) for p in uni) == 10.0
    # identical lines: difference is empty
    assert L.line_overlay(A.parts, A.parts, "difference") == []


def test_geom_from_geojson_golden():  # GeomFromGeoJSONTest.java
    from jena_geo_spark.functions.registry import REGISTRY

    fn = REGISTRY["st_geomfromgeojson"][0]
    got = u1(fn, '{"type":"Point","coordinates":[-48.23456,20.12345]}')
    assert _geq(got, "POINT(-48.23456 20.12345)")


def test_transform_goldens():  # geometry/transform/*Test.java (enabled ones)
    from jena_geo_spark.functions.registry import REGISTRY as REG

    def xy(wkb_bytes):
        gg = W.from_wkb(wkb_bytes)
        rings = gg.parts if gg.kind != "multipolygon" else gg.parts[0]
        return [r[:, :2].tolist() for r in rings]

    p3 = wkb("POLYGON Z((0 0 2,0 5 2,5 0 2,0 0 2))")
    # FlipCoordinatesTest.java: swap x and y, Z stays in place
    flipped = W.from_wkb(u1(REG["st_flipcoordinates"][0], p3))
    assert flipped.parts[0].tolist() == [
        [0, 0, 2], [5, 0, 2], [0, 5, 2], [0, 0, 2]
    ]
    # Force2DTest.java: drop Z
    assert xy(u1(REG["st_force2d"][0], p3)) == [[[0, 0], [0, 5], [5, 0], [0, 0]]]
    # TransScaleTest.java: (x+tx)*sx — LINESTRING(1 2,1 10) -> (6 8, 6 24)
    ts = u1(REG["st_transscale"][0], wkb("LINESTRING(1 2,1 10)"), 2.0, 2.0, 2.0, 2.0)
    assert xy(ts) == [[[6, 8], [6, 24]]]
    # ShiftLongitudeTest.java: -340 -> 20, in-range x unchanged
    sh = u1(REG["st_shiftlongitude"][0], wkb("POLYGON((-340 0,0 5,5 0,-340 0))"))
    assert xy(sh) == [[[20, 0], [0, 5], [5, 0], [20, 0]]]
    # SwapOrdinatesTest.java: swap "xy" — same values as flip
    sw = W.from_wkb(u1(REG["st_swapordinates"][0], p3, "xy"))
    assert sw.parts[0][:, :2].tolist() == [[0, 0], [5, 0], [0, 5], [0, 0]]


def test_triangle_predicate_goldens():  # polygon/attribute/Is*Test.java
    from jena_geo_spark.functions.registry import REGISTRY as REG

    iso = wkb("POLYGON((8 2, 11 13, 2 6, 8 2))")
    deg = wkb("POLYGON((1 2, 3 4, 5 6, 1 2))")  # collinear, zero area
    noniso = wkb("POLYGON((8 2, 11 56, 2 6, 8 2))")
    # IsAcuteTest.java
    assert u1(REG["st_isacute"][0], iso) is True
    assert u1(REG["st_isacute"][0], deg) is False
    # IsIsocelesTriangleTest.java (the collinear one has two equal sides)
    assert u1(REG["st_isisocelestriangle"][0], noniso) is False
    assert u1(REG["st_isisocelestriangle"][0], deg) is True
    # IsConvexTest.java divergence: the reference's isConvex contains a
    # typo (`dy2 = c2.y - c2.y` — always 0), so its z is -dy1*dx2, not a
    # cross product; its FALSE for the degenerate collinear polygon is an
    # artifact.  Ours: all cross products 0 → convex (vacuously) → TRUE.
    assert u1(REG["st_isconvex"][0], iso) is True
    assert u1(REG["st_isconvex"][0], deg) is True


def test_linestring_accessor_goldens():  # linestring/attribute/*Test.java
    from jena_geo_spark.functions.registry import REGISTRY as REG

    # StartPoint/EndPoint (2D and Z)
    assert _geq(u1(REG["st_endpoint"][0], wkb("LINESTRING(1 1, 2 2, 3 3)")), "POINT(3 3)")
    assert _geq(
        u1(REG["st_endpoint"][0], wkb("LINESTRING Z (1 1 2, 1 2 3, 0 0 5)")),
        "POINT Z(0 0 5)",
    )
    assert _geq(u1(REG["st_startpoint"][0], wkb("LINESTRING(0 1, 0 2)")), "POINT(0 1)")
    assert _geq(
        u1(REG["st_startpoint"][0], wkb("LINESTRING Z (0 1 1, 0 2 2)")),
        "POINT Z(0 1 1)",
    )
    # PointNTest.java: ZERO-based (coords[2] of a 3-point line = last)
    assert _geq(
        u1(REG["st_pointn"][0], wkb("LINESTRING(0 0, 1 1, 2 2)"), 2), "POINT(2 2)"
    )
    # SelfIntersectionsTest.java: revisited coordinates, in order
    got = W.from_wkb(
        u1(REG["st_selfintersections"][0], wkb("LINESTRING(0 0, 0 1, 1 1, 1 0, 1 1, 0 0)"))
    )
    assert got.kind == "multipoint" and got.parts[0].tolist() == [[1, 1], [0, 0]]
    # LineSelfIntersectionPointTest.java: no revisit -> POINT EMPTY
    empty = W.from_wkb(
        u1(REG["st_lineselfintersectionpoint"][0], wkb("LINESTRING(5 2, 3 8, 6 20, 7 25, 10 10)"))
    )
    assert empty.kind == "point" and not empty.parts
    # SharedPathsTest.java: the shared leading segments (the reference
    # wraps the same MULTILINESTRING in a GEOMETRYCOLLECTION)
    sp = W.from_wkb(
        u1(
            REG["st_sharedpaths"][0],
            wkb("LINESTRING(0 0, 0 1, 1 1, 1 0, 1 1, 0 0)"),
            wkb("LINESTRING(0 0, 0 1, 1 1, 1 2, 1 1, 0 0)"),
        )
    )
    assert sp.kind == "multilinestring"
    assert [p.tolist() for p in sp.parts] == [
        [[0, 0], [0, 1]], [[0, 1], [1, 1]], [[1, 1], [0, 0]]
    ]


def test_linestring_editor_goldens():  # linestring/editor/*Test.java
    from jena_geo_spark.functions.registry import REGISTRY as REG

    # RemovePointTest.java semantics note: the reference calls
    # ArrayUtils.remove and DISCARDS the result, so its own code returns
    # the input unchanged and its test cannot pass; we implement the
    # documented intent (remove the vertex at the zero-based index) and
    # match the TEST's golden instead: index 1 removed -> first two kept?
    # No: removing index 1 of (0 0 1, 1 1 1, 2 2 1) keeps (0 0 1, 2 2 1).
    rm = W.from_wkb(
        u1(REG["st_removepoint"][0], wkb("LINESTRING Z(0 0 1, 1 1 1, 2 2 1)"), 1)
    )
    assert rm.dims == "XYZ" and rm.parts[0].tolist() == [[0, 0, 1], [2, 2, 1]]
    # SetEndPoint / SetStartPoint / SetPoint goldens
    assert _geq(
        u1(REG["st_setendpoint"][0], wkb("LINESTRING(0 1, 0 2)"), wkb("POINT(1 1)")),
        "LINESTRING(0 1, 1 1)",
    )
    assert _geq(
        u1(REG["st_setstartpoint"][0], wkb("LINESTRING(0 1, 0 2)"), wkb("POINT(1 1)")),
        "LINESTRING(1 1, 0 2)",
    )
    sp = REG["st_setpoint"][0]
    assert _geq(
        u1(sp, wkb("LINESTRING(0 1, 0 2)"), 0, 1.0, 1.0), "LINESTRING(1 1, 0 2)"
    )


def test_constructor_goldens():  # MakePointMTest.java, GeomFromTextTest.java
    from jena_geo_spark.functions import registry_support as RS
    from jena_geo_spark.functions.registry import REGISTRY as REG

    pm = W.from_wkb(
        u1(RS.st_makepointm, -71.1043443253471, 42.3150676015829, 10.0)
    )
    assert pm.kind == "point" and pm.dims == "XYM"
    assert pm.parts[0].tolist() == [[-71.1043443253471, 42.3150676015829, 10.0]]
    assert _geq(
        u1(REG["st_geomfromtext"][0], "POINT(48.23456 20.12345)"),
        "POINT(48.23456 20.12345)",
    )


def test_ring_editor_goldens():  # polygon/editor/{Add,Remove}RingTest.java
    from jena_geo_spark.functions.registry import REGISTRY as REG

    one = "POLYGON ((8 2, 11 13, 2 6, 8 2))"
    two = "POLYGON((8 2, 11 13, 2 6, 8 2), (8 2, 11 13, 2 6, 8 2))"
    ring = "LINESTRING (8 2, 11 13, 2 6, 8 2)"
    assert _geq(u1(REG["st_addring"][0], wkb(one), wkb(ring)), two)
    # interior index 0 removes the (only) hole — reference convention
    assert _geq(u1(REG["st_removering"][0], wkb(two), 0), one)


def test_line_overlay_edge_cases():  # review r3.3 findings
    from jena_geo_spark.functions import vector as FV2
    from jena_geo_spark.geom import linework as L

    # crossing-only intersection yields the crossing POINT (JTS semantics)
    got = W.from_wkb(
        u1(FV2.st_intersection, wkb("LINESTRING(0 0,2 2)"), wkb("LINESTRING(0 2,2 0)"))
    )
    assert got.kind == "point" and got.parts[0].tolist() == [[1.0, 1.0]]
    # intersection/union re-merge noded pieces to maximal chains
    a = g("LINESTRING(0 0,1 0,2 0)")
    assert [
        p[[0, -1], 0].tolist() for p in L.line_overlay(a.parts, a.parts, "intersection")
    ] == [[0.0, 2.0]]


def test_line_intersection_advice_r3():  # ADVICE r3 items 1+2
    from jena_geo_spark.functions import vector as FV2
    from jena_geo_spark.geom import linework as L

    # disjoint lines → canonical MULTIPOINT EMPTY (not a 1-D empty part
    # whose WKB round-trip breaks parts[0][:, :2] downstream)
    got = W.from_wkb(
        u1(FV2.st_intersection, wkb("LINESTRING(0 0,1 0)"), wkb("LINESTRING(0 5,1 5)"))
    )
    assert got.kind == "multipoint" and got.parts == []
    assert W.to_wkt(got) == "MULTIPOINT EMPTY"
    # shared segment AND transversal crossing → GEOMETRYCOLLECTION(POINT,
    # LINESTRING) like JTS OverlayOp, points first
    got = W.from_wkb(
        u1(
            FV2.st_intersection,
            wkb("LINESTRING(0 0,10 0)"),
            wkb("MULTILINESTRING((2 0,4 0),(6 -1,6 1))"),
        )
    )
    assert got.kind == "geometrycollection"
    kinds = [m.kind for m in got.parts]
    assert kinds == ["point", "linestring"]
    assert got.parts[0].parts[0].tolist() == [[6.0, 0.0]]
    assert got.parts[1].parts[0].tolist() == [[2.0, 0.0], [4.0, 0.0]]
    # crossing point coincident with shared linework is NOT duplicated
    chains, pts = L.line_intersection_mixed(
        g("LINESTRING(0 0,10 0)").parts,
        g("MULTILINESTRING((2 0,4 0),(3 -1,3 1))").parts,
    )
    assert len(chains) == 1 and len(pts) == 0


def test_ring_editors_preserve_dims():  # review r3.3 finding 1
    from jena_geo_spark.functions import vector as FV2

    zp = wkb("POLYGON Z((0 0 1,10 0 1,10 10 1,0 0 1),(4 4 1,6 4 1,6 6 1,4 4 1))")
    out = W.from_wkb(u1(FV2.st_removering, zp, 0))
    assert out.dims == "XYZ" and len(out.parts) == 1
    out2 = W.from_wkb(
        u1(
            FV2.st_addring,
            wkb("POLYGON Z((0 0 1,10 0 1,10 10 1,0 0 1))"),
            wkb("LINESTRING(4 4,6 4,6 6,4 4)"),  # 2D ring padded to width
        )
    )
    assert out2.dims == "XYZ" and all(p.shape[1] == 3 for p in out2.parts)
    tr = W.from_wkb(u1(FV2.st_translate, wkb("LINESTRING Z(0 0 1,1 1 1)"), 10.0, 20.0))
    assert tr.parts[0].tolist() == [[10, 20, 1], [11, 21, 1]]


# ---- r4 golden batch: geometry/relation + polygon/attribute +
# geometry/attribute actives (uncited until now) -------------------------


def test_equal_type_goldens():  # EqualTypeTest.java
    from jena_geo_spark.functions import relations2 as R2

    line = wkb("LINESTRING(743238 2967416,743238 2967450,743265 2967450,"
               " 743265.625 2967416,743238 2967416)")
    mp = wkb("MULTIPOINT (0 1, 1 0, 2 1)")
    assert u1(R2.st_equaltype, line, line)
    assert not u1(R2.st_equaltype, line, mp)


def test_ordering_equals_goldens():  # OrderingEqualsTest.java
    # pure-Catalyst: canonical-WKB byte equality — evaluate the semantics
    a = wkb("LINESTRING(0 0, 10 10)")
    assert a != wkb("LINESTRING(0 0, 5 5, 10 10)")           # test 1: false
    assert wkb("LINESTRING(10 10, 0 0)") != wkb("LINESTRING(0 0, 0 0, 10 10)")
    assert a == wkb("LINESTRING(0 0, 10 10)")                 # same order: true
    assert a != wkb("LINESTRING(10 10, 0 0)")                 # reversed: false


def test_equals_norm_topo_goldens():  # EqualNormTest.java / EqualTopoTest.java
    from jena_geo_spark.functions import relate as FR
    from jena_geo_spark.functions import relations2 as R2

    tri = wkb("LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)")
    other = wkb("LINESTRING(77.42 29.26 ,10 10)")
    assert u1(R2.st_equalsnorm, tri, tri)
    assert not u1(R2.st_equalsnorm, tri, other)
    assert u1(FR.st_equals_topo, tri, tri)
    assert not u1(FR.st_equals_topo, tri, other)
    # equalsTopo is orientation-insensitive where orderingEquals is not
    assert u1(FR.st_equals_topo, wkb("LINESTRING(0 0, 10 10)"),
              wkb("LINESTRING(10 10, 0 0)"))


def test_centroid_distance_golden():
    # CentroidDistanceTest.java expects 0.0 for two DIFFERENT triangles —
    # the reference impl extracts v1 twice (CentroidDistance.java:19-21
    # copy-paste bug), so it always measures a centroid against itself.
    # Divergence: ours measures the actual pair.  Area centroid of
    # POLYGON((8 2,11 13,2 6)) is (7,7); the unit square's is (0.5,0.5).
    got = u1(FV.st_centroid_distance,
             wkb("POLYGON((8 2, 11 13, 2 6, 8 2))"),
             wkb("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"))
    assert got == pytest.approx(math.hypot(6.5, 6.5), rel=1e-12)
    same = u1(FV.st_centroid_distance,
              wkb("POLYGON((8 2, 11 13, 2 6, 8 2))"),
              wkb("POLYGON((8 2, 11 13, 2 6, 8 2))"))
    assert same == 0.0  # the case the reference test accidentally reduces to


def test_is_triangle_goldens():  # IsTriangleTest.java
    assert not u1(A.st_istriangle, wkb("POLYGON((1 2, 3 4, 5 6, 7 8, 1 2))"))
    # degenerate (collinear) 3-vertex ring still counts — reference checks
    # only coordinate count + closure
    assert u1(A.st_istriangle, wkb("POLYGON((1 2, 3 4, 5 6, 1 2))"))


def test_polygon_cw_ccw_goldens():
    # IsPolygonCWTest/IsPolygonCCWTest use COLLINEAR (zero-area) rings and
    # pin JTS Orientation.isCCW's collinear fallback (prev.x > next.x at
    # the highest vertex).  Ours is signed-area based (PostGIS semantics:
    # exterior CW/CCW + opposite holes), so zero-area rings are a
    # documented divergence; the non-degenerate semantics are pinned here.
    cw = wkb("POLYGON((0 0, 0 2, 2 2, 2 0, 0 0))")           # signed area < 0
    ccw = wkb("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")          # signed area > 0
    assert u1(A.st_ispolygoncw, cw) and not u1(A.st_ispolygonccw, cw)
    assert u1(A.st_ispolygonccw, ccw) and not u1(A.st_ispolygoncw, ccw)
    # holes must wind opposite to the shell
    ccw_hole_ccw = wkb("POLYGON((0 0, 9 0, 9 9, 0 9, 0 0),"
                       "(2 2, 5 2, 5 5, 2 5, 2 2))")
    assert not u1(A.st_ispolygonccw, ccw_hole_ccw)
    ccw_hole_cw = wkb("POLYGON((0 0, 9 0, 9 9, 0 9, 0 0),"
                      "(2 2, 2 5, 5 5, 5 2, 2 2))")
    assert u1(A.st_ispolygonccw, ccw_hole_cw)


def test_is_collection_goldens():  # IsCollectionTest.java (8 actives)
    assert u1(A.st_iscollection, wkb("MULTIPOINT (10 40, 40 30, 20 20, 30 10)"))
    assert u1(A.st_iscollection, wkb(
        "MULTILINESTRING ((10 10, 20 20, 10 40),(40 40, 30 30, 40 20, 30 10))"))
    assert u1(A.st_iscollection, wkb(
        "MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)),"
        "((20 35, 10 30, 10 10, 30 5, 45 20, 20 35),(30 20, 20 15, 20 25, 30 20)))"))
    assert u1(A.st_iscollection, wkb(
        "GEOMETRYCOLLECTION(POINT(4 6),LINESTRING(4 6,7 10))"))
    assert not u1(A.st_iscollection, wkb("POINT (4 6)"))
    assert not u1(A.st_iscollection, wkb("LINESTRING(4 6,7 10)"))


def test_geometry_type_golden():  # GeometryTypeTest.java
    got = u1(FV.st_geometrytype, wkb(
        "LINESTRING(743238 2967416,743238 2967450,743265 2967450,"
        " 743265.625 2967416,743238 2967416)"))
    assert got == "LineString"


def test_bounding_diagonal_golden():  # BoundingDiagonalTest.java
    got = W.from_wkb(u1(A.st_boundingdiagonal, wkb(
        "POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))")))
    assert got.kind == "linestring"
    assert got.parts[0].tolist() == [[0.0, 0.0], [1.0, 1.0]]


# ---- r4 golden batch 2: transform/exporter/constructor actives ---------


def test_simplify_goldens():  # SimplifyTest.java / SimplifyVWTest.java
    from jena_geo_spark.functions.registry import REGISTRY as REG

    line = wkb("LINESTRING(5 2, 3 8, 6 20, 7 25, 10 10)")
    got = W.from_wkb(u1(REG["st_simplify"][0], line, 30.0))
    assert got.parts[0].tolist() == [[5, 2], [10, 10]]
    # JTS VWSimplifier squares the DISTANCE tolerance into an area
    # threshold (900 here) — kills every interior vertex
    got = W.from_wkb(u1(REG["st_simplifyvw"][0], line, 30.0))
    assert got.parts[0].tolist() == [[5, 2], [10, 10]]
    # ...whereas a raw-area 30 keeps the 49.5-area vertex (the PostGIS
    # convention the kernel exposes directly)
    from jena_geo_spark.geom import linework as L

    kept = L.simplify_vw(np.array([[5, 2], [3, 8], [6, 20], [7, 25], [10, 10]], float), 30.0)
    assert kept.tolist() == [[5, 2], [7, 25], [10, 10]]


def test_simplify_preserve_topology_golden():  # SimplifyPreserveTopologyTest.java
    from jena_geo_spark.functions.registry import REGISTRY as REG

    line = wkb("LINESTRING(5 2, 3 8, 6 20, 7 25, 10 10)")
    # the reference test calls it with no tolerance (= 0): identity
    got = W.from_wkb(u1(REG["st_simplifypreservetopology"][0], line, 0.0))
    assert got.parts[0].tolist() == [[5, 2], [3, 8], [6, 20], [7, 25], [10, 10]]


def test_precision_reducer_golden():  # PrecisionReducerTest.java
    from jena_geo_spark.functions.registry import REGISTRY as REG

    got = W.from_wkb(u1(REG["st_precisionreducer"][0], wkb("POINT(0.3424 0.3424)"), 2.0))
    assert got.parts[0].tolist() == [[0.34, 0.34]]


def test_densify_golden():  # DensifyTest.java (JTS Densifier fractions)
    from jena_geo_spark.functions.registry import REGISTRY as REG

    # edge (8 2)→(2 6), length √52 ≈ 7.21, tol 1 → 8 equal pieces: the
    # exact fraction list DensifyTest.java pins (7.25 2.5, 6.5 3, …)
    got = W.from_wkb(u1(REG["st_densify"][0], wkb("LINESTRING(8 2, 2 6)"), 1.0))
    exp = [[8 - 0.75 * k, 2 + 0.5 * k] for k in range(9)]
    assert np.allclose(got.parts[0], exp, atol=1e-12)
    # edge (2 6)→(11 13), length √130 ≈ 11.4 → 12 pieces incl. the
    # golden's 2.75 6.583333333333333 first step
    got = W.from_wkb(u1(REG["st_densify"][0], wkb("LINESTRING(2 6, 11 13)"), 1.0))
    assert len(got.parts[0]) == 13
    assert got.parts[0][1].tolist() == pytest.approx([2.75, 6.583333333333333])


def test_snap_golden():  # SnapTest.java: tolerance 0 → geometry unchanged
    from jena_geo_spark.functions.registry import REGISTRY as REG

    got = W.from_wkb(
        u1(REG["st_snap"][0], wkb("POLYGON((0 0, 0 5, 5 0, 0 0))"),
           wkb("POLYGON((1 1, 0 5, 5 0, 1 1))"), 0.0)
    )
    assert got.parts[0].tolist() == [[0, 0], [0, 5], [5, 0], [0, 0]]


def test_force_dims_goldens():
    # Force3DMTest.java: XYZ → XYM with M = 0 and Z DROPPED; Force4DTest's
    # expected list is self-inconsistent (it zeroes two of the four M
    # values) — divergence: ours is the PostGIS/coherent reading, XYZM
    # with the original Z kept and M = 0
    from jena_geo_spark.functions.registry import REGISTRY as REG

    got = W.from_wkb(
        u1(REG["st_force3dm"][0], wkb("POLYGON Z((0 0 1, 0 5 1, 5 0 1, 0 0 1))"), 0.0)
    )
    assert got.dims == "XYM"
    assert got.parts[0].tolist() == [[0, 0, 0], [0, 5, 0], [5, 0, 0], [0, 0, 0]]
    got2 = W.from_wkb(
        u1(REG["st_force3dm"][0], wkb("POLYGON((0 0, 0 5, 5 0, 0 0))"), 0.0)
    )
    assert got2.dims == "XYM" and got2.parts[0][:, 2].tolist() == [0, 0, 0, 0]
    got4 = W.from_wkb(
        u1(REG["st_force4d"][0],
           wkb("LINESTRING Z(0 0 1, 0 5 2, 5 0 3, 0 0 4)"), 0.0, 0.0)
    )
    assert got4.dims == "XYZM"
    assert got4.parts[0][:, 2].tolist() == [1, 2, 3, 4]  # Z kept
    assert got4.parts[0][:, 3].tolist() == [0, 0, 0, 0]  # M defaulted


def test_remove_repeated_points_semantics():
    # RemoveRepeatedPointsTest.java pins the reference's global dedup that
    # drops BOTH copies of a duplicated coordinate — for LineString and
    # MultiPoint we follow it verbatim (a closed LINESTRING therefore
    # loses its endpoint pair, exactly as the reference's i≠j pair scan
    # does).  Divergence: polygon RINGS keep PostGIS consecutive dedup,
    # because the reference's scan always strips a ring's closing vertex
    # pair and hands JTS an unclosable coordinate list (see
    # st_removerepeatedpoints's docstring and
    # test_remove_repeated_points_golden).
    from jena_geo_spark.functions.registry import REGISTRY as REG

    got = W.from_wkb(
        u1(
            REG["st_removerepeatedpoints"][0],
            wkb("LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0)"),
            0.0,
        )
    )
    assert got.parts[0].tolist() == [[0, 1], [1, 1], [1, 0]]
    got = W.from_wkb(
        u1(
            REG["st_removerepeatedpoints"][0],
            wkb("LINESTRING(0 0, 1 1, 1 1, 2 2)"),
            0.0,
        )
    )
    assert got.parts[0].tolist() == [[0, 0], [2, 2]]


def test_astextraw_golden():  # AsTextRawTest.java — exact WKT formatting
    from jena_geo_spark.functions.registry import REGISTRY as REG

    got = u1(REG["st_astextraw"][0], wkb("LINESTRING(1.32453 2.65655, 4.96254 5.43341)"))
    assert got == "LINESTRING (1.32453 2.65655, 4.96254 5.43341)"


def test_asx3d_golden():  # AsX3DTest.java
    # the reference's expected string is malformed XML (unclosed DOCTYPE
    # quote, truncated coordIndex) — divergence: ours emits well-formed
    # X3D with the same Scene/Shape/Coordinate structure and coordinates
    from jena_geo_spark.functions.registry import REGISTRY as REG

    got = u1(REG["st_asx3d"][0], wkb("POINT(49.9928617 8.2472526)"))
    assert got.startswith('<?xml version="1.0" encoding="UTF-8"?>')
    assert "<Scene><Shape>" in got and "49.9928617 8.2472526" in got


def test_point_from_text_golden():  # PointFromWKBTest.java (tests FromText)
    from jena_geo_spark.functions.registry import REGISTRY as REG

    got = W.from_wkb(
        u1(REG["st_pointfromtext"][0], "POINT(-71.1043443253471 42.3150676015829)")
    )
    assert got.kind == "point"
    assert got.parts[0].tolist() == [[-71.1043443253471, 42.3150676015829]]


def test_polygon_from_text_roundtrip():
    # PolygonFromTextTest.java / PolygonFromWKBTest.java contain NO active
    # @Test — only the fixture polygon; pin the parse round-trip on it
    from jena_geo_spark.functions.registry import REGISTRY as REG

    s = ("POLYGON((-71.1776585052917 42.3902909739571,"
         "-71.1776820268866 42.3903701743239,-71.1776063012595 42.3903825660754,"
         "-71.1775826583081 42.3903033653531,-71.1776585052917 42.3902909739571))")
    got = W.from_wkb(u1(REG["st_polygonfromtext"][0], s))
    assert got.kind == "polygon" and len(got.parts[0]) == 5
    assert got.parts[0][0].tolist() == [-71.1776585052917, 42.3902909739571]


# ------------------------------------------------- r4 batch: minimum shapes --


def test_minimum_clearance_line_golden():  # MinimumClearanceLineTest.java
    got = W.from_wkb(
        u1(A.st_minimumclearanceline, wkb("POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))"))
    )
    assert got.parts[0].tolist() == [[0.5, 0.00032], [0.5, 0.0]]


def test_minimum_diameter_line_golden():  # MinimumDiameterLineTest.java
    got = W.from_wkb(
        u1(A.st_minimumdiameterline, wkb("POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))"))
    )
    assert np.allclose(got.parts[0], [[0.5, 0.5], [1.0, 0.0]])


def test_minimum_rectangle_golden():  # MinimumRectangleTest.java
    # expected ring POLYGON((0 0, 0.5 -0.5, 1.5 0.5, 1 1, 0 0)); ours is the
    # same cycle rotated to a different start vertex — compare cyclically
    got = W.from_wkb(
        u1(FS.st_minimumrectangle, wkb("POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))"))
    )
    ring = got.parts[0][:-1]  # drop closing vertex
    exp = np.array([[0.0, 0.0], [0.5, -0.5], [1.5, 0.5], [1.0, 1.0]])
    k = int(np.argmin([np.abs(ring[0] - e).sum() for e in exp]))
    assert np.allclose(np.roll(exp, -k, axis=0), ring, atol=1e-9)


def test_minimum_bounding_circle_golden():  # MinimumBoundingCircleTest.java
    # the reference expects JTS's 36-vertex circle POLYGON; its center is
    # vertex-averaged from that WKT and its radius the x-span half — pin
    # our (cx, cy, r) struct to those exact values instead of a tessellation
    got = u1(
        FS.st_minimumboundingcircle,
        wkb("POLYGON((26426 65078,26531 65242,26075 65136,26096 65427,26426 65078))"),
    )
    assert (got["cx"], got["cy"]) == (26284.84180271327, 65267.114509082545)
    assert math.isclose(got["r"], 26532.27784830467 - 26284.84180271327, rel_tol=1e-12)


def test_start_end_point_goldens():  # StartPointTest.java, EndPointTest.java
    assert W.to_wkt(W.from_wkb(u1(A.st_startpoint, wkb("LINESTRING(0 1, 0 2)")))) == "POINT (0 1)"
    assert (
        W.to_wkt(W.from_wkb(u1(A.st_startpoint, wkb("LINESTRING Z (0 1 1, 0 2 2)"))))
        == "POINT Z (0 1 1)"
    )
    assert W.to_wkt(W.from_wkb(u1(A.st_endpoint, wkb("LINESTRING(1 1, 2 2, 3 3)")))) == "POINT (3 3)"
    assert (
        W.to_wkt(W.from_wkb(u1(A.st_endpoint, wkb("LINESTRING Z (1 1 2, 1 2 3, 0 0 5)"))))
        == "POINT Z (0 0 5)"
    )


def test_envelope_min_goldens():  # XMinTest.java, YMinTest.java
    line3d = wkb("LINESTRING Z(1 3 4, 5 6 7)")
    assert u1(A.st_xmin, line3d) == 1.0
    assert u1(A.st_ymin, line3d) == 3.0


# ------------------------------------------------------ r4 batch: editors --


def test_add_ring_golden():  # AddRingTest.java — append as interior ring
    got = W.from_wkb(
        u1(
            FV.st_addring,
            wkb("POLYGON ((8 2, 11 13, 2 6, 8 2))"),
            wkb("LINESTRING (8 2, 11 13, 2 6, 8 2)"),
        )
    )
    assert W.to_wkt(got) == "POLYGON ((8 2, 11 13, 2 6, 8 2), (8 2, 11 13, 2 6, 8 2))"


def test_set_point_editor_goldens():
    # SetStartPointTest.java, SetEndPointTest.java, SetPointTest.java
    from jena_geo_spark.functions import transforms2 as T2

    line = wkb("LINESTRING(0 1, 0 2)")
    pt = wkb("POINT(1 1)")
    assert W.to_wkt(W.from_wkb(u1(T2.st_setstartpoint, line, pt))) == "LINESTRING (1 1, 0 2)"
    assert W.to_wkt(W.from_wkb(u1(T2.st_setendpoint, line, pt))) == "LINESTRING (0 1, 1 1)"
    assert W.to_wkt(W.from_wkb(u1(FV.st_setpoint, line, 0, 1.0, 1.0))) == "LINESTRING (1 1, 0 2)"


def test_set_ring_divergence():  # SetRingTest.java
    # Reference SetRing.java is broken: it never reads its third argument
    # (the replacement ring) and simply REMOVES interior ring N — the
    # test's expected value is exactly RemoveRing's output.  Ours performs
    # the actual replacement; pin that semantics here.
    from jena_geo_spark.functions import transforms2 as T2

    got = W.from_wkb(
        u1(
            T2.st_setring,
            wkb("POLYGON((8 2, 11 13, 2 6, 8 2), (8 2, 11 13, 2 6, 8 2))"),
            0,
            wkb("LINESTRING (8 2, 11 13, 2 7, 8 2)"),
        )
    )
    assert W.to_wkt(got) == "POLYGON ((8 2, 11 13, 2 6, 8 2), (8 2, 11 13, 2 7, 8 2))"


# --------------------------------------------------- r4 batch: transforms --


def test_force3d_golden():  # Force3DTest.java — Z = 0 appended
    from jena_geo_spark.functions import zm as Z

    got = W.from_wkb(u1(Z.st_force3dz, wkb("POLYGON((0 0,0 5,5 0,0 0))"), 0.0))
    assert W.to_wkt(got) == "POLYGON Z ((0 0 0, 0 5 0, 5 0 0, 0 0 0))"


def test_force_polygon_cw_golden():  # ForcePolygonCWTest.java — CW input unchanged
    from jena_geo_spark.functions import transforms2 as T2

    s = "POLYGON ((1 2, 7 8, 5 6, 3 4, 1 2))"
    assert W.to_wkt(W.from_wkb(u1(T2.st_forcepolygoncw, wkb(s)))) == s


def test_geometric_median_invariant():  # GeometricMedianTest.java
    # The reference test is disabled-by-construction (it asserts against a
    # null result) and its expected POINT(0 0) is not the geometric median
    # of the fixture.  Pin ours with the Weiszfeld optimality property:
    # the returned point's summed distance beats the centroid's and the
    # reference's claimed POINT(0 0).
    mp = (
        "MULTIPOINT (( -1 0), (-1 2), (-1 3), (-1 4), (-1 7), (0 1), (0 3),"
        " (1 1), (2 0), (6 0), (7 8), (9 8), (10 6))"
    )
    coords = g(mp).all_coords()[:, :2]
    got = u1(FS.st_geometricmedian, wkb(mp))

    def sumdist(p):
        return float(np.hypot(coords[:, 0] - p[0], coords[:, 1] - p[1]).sum())

    ours = sumdist((got["x"], got["y"]))
    assert ours <= sumdist(coords.mean(axis=0)) + 1e-9
    assert ours < sumdist((0.0, 0.0))


def test_asosmlink_golden():  # AsOSMLinkTest.java — exact URL incl. lat↔x swap
    from jena_geo_spark.functions.exporters import to_osm_link

    assert to_osm_link(g("POINT(49.9928617 8.2472526)")) == (
        "http://www.openstreetmap.org/?minlon=8.2472526&minlat=49.9928617"
        "&maxlon=8.2472526&maxlat=49.9928617&mlat=49.9928617&mlon=8.2472526"
    )


def test_dimension_flag_goldens():
    # Is3DTest.java (active TRUE case), IsMeasuredTest.java (active FALSE),
    # IsPlanarTest.java (active FALSE), IsSolidTest.java (active TRUE —
    # the reference's IsSolid despite its name tests all-coords-have-Z)
    mp2d = wkb("MULTIPOINT (10 40, 40 30, 20 20, 30 10)")
    mp3d = wkb("MULTIPOINT Z (10 40 1, 40 30 2, 20 20 3, 30 10 4)")
    assert u1(A.st_is3d, mp3d) is True
    assert u1(A.st_ismeasured, mp2d) is False
    assert u1(A.st_isplanar, mp3d) is False
    assert u1(A.st_issolid, mp3d) is True
    assert u1(A.st_issolid, mp2d) is False


def test_points_golden():  # geometry/PointsTest.java
    """POLYGON Z -> MULTIPOINT of its vertices: Z preserved, duplicate
    closing vertex kept (the reference feeds geom.getCoordinates()
    verbatim into createMultiPoint)."""
    from jena_geo_spark.functions import transforms2 as T2

    got = u1(T2.st_points, wkb("POLYGON Z ((30 10 4,10 30 5,40 40 6, 30 10 4))"))
    assert W.to_wkt(W.from_wkb(got)) == (
        "MULTIPOINT Z (30 10 4, 10 30 5, 40 40 6, 30 10 4)"
    )


def test_polygon_from_ring_golden():  # polygon/PolygonTest.java
    """Polygon(lineStringLiteral, srid): the geometry half is a closed-ring
    LINESTRING -> POLYGON with identical coordinates.  The reference's
    second argument (4326) becomes a CRS URI prefix on the literal; our
    engine carries SRID as a separate column (FIXTURES.md §1), so the
    golden pins the shell coordinates bit-exactly."""
    from jena_geo_spark.functions import transforms2 as T2

    ring = (
        "LINESTRING (-71.1776585052917 42.3902909739571,"
        "-71.1776820268866 42.3903701743239,"
        "-71.1776063012595 42.3903825660754,"
        "-71.1775826583081 42.3903033653531,"
        "-71.1776585052917 42.3902909739571)"
    )
    got = W.from_wkb(u1(T2.st_makepolygon, wkb(ring)))
    assert got.kind == "polygon" and len(got.parts) == 1
    assert np.array_equal(got.parts[0], W.from_wkt(ring).parts[0])


def test_makeline_golden():  # linestring/constructor/MakeLineTest.java
    """MakeLine(p1, p2) -> LINESTRING(p1, p2).  The reference TEST is
    broken (it asserts the result equals a POINT literal of the first
    input); MakeLine.java itself concatenates the input coordinates, which
    is what we pin here."""
    from jena_geo_spark.functions import transforms2 as T2

    got = u1(
        T2.st_makeline,
        wkb("POINT(-71.1043443253471 42.3150676015829)"),
        wkb("POINT(1 2)"),
    )
    assert W.to_wkt(W.from_wkb(got)) == (
        "LINESTRING (-71.1043443253471 42.3150676015829, 1 2)"
    )


def test_force4d_golden():  # geometry/transform/Force4DTest.java
    """Force4D.java keeps existing Z (NaN -> 0) and fills missing M with 0.
    The reference TEST's expected coordinates are internally inconsistent
    (z moved to m for two points, dropped for the rest, on a WKT literal
    with doubled parens its own parser rejects) — the IMPL's semantics are
    what we pin: XYZM, original Z, M=0."""
    from jena_geo_spark.functions import transforms2 as T2

    got = u1(
        T2.st_force4d,
        wkb("LINESTRING Z (0 0 1, 0 5 2, 5 0 3, 0 0 4)"),
        0.0,
        0.0,
    )
    assert W.to_wkt(W.from_wkb(got)) == (
        "LINESTRING ZM (0 0 1 0, 0 5 2 0, 5 0 3 0, 0 0 4 0)"
    )


# unit/*Test.java — all 32 active reference unit-conversion tests.
# (file, from, to, input, reference expected, reference matches exact factor)
_UNIT_GOLDENS = [
    ("CentimeterToMeterTest.java", "cm", "m", 100.0, 1.0, True),
    ("ChainToMeterTest.java", "chain", "m", 1.0, 0.04971, False),  # inverted+rounded
    ("DecimeterToMeterTest.java", "dm", "m", 1.0, 0.1, True),
    ("FathomToMeterTest.java", "fathom", "m", 1.0, 1.8287999998958315, False),
    ("FootToMeterTest.java", "foot", "m", 1.0, 0.30480370641307, False),
    ("InchToMeterTest.java", "inch", "m", 1.0, 0.0254, True),
    ("KilometerToMeterTest.java", "km", "m", 1.0, 1000.0, True),
    ("LinkToMeterTest.java", "link", "m", 1.0, 0.201168, True),
    ("MeterToCentimeterTest.java", "m", "cm", 1.0, 100.0, True),
    ("MeterToChainTest.java", "m", "chain", 1.0, 20.116676725005032, False),  # inverted
    ("MeterToDecimeterTest.java", "m", "dm", 0.1, 1.0, True),
    ("MeterToFathomTest.java", "m", "fathom", 1.0, 0.5468066492, False),  # rounded
    ("MeterToFootTest.java", "m", "foot", 1.0, 3.2808, False),  # rounded
    ("MeterToInchTest.java", "m", "inch", 0.0254, 1.0, True),
    ("MeterToKilometerTest.java", "m", "km", 1000.0, 1.0, True),
    ("MeterToLinkTest.java", "m", "link", 1.0, 4.970969537898672, True),
    ("MeterToMileTest.java", "m", "mile", 1000.0, 0.62137, False),  # rounded
    ("MeterToMillimeterTest.java", "m", "mm", 1.0, 1000.0, True),
    ("MeterToNauticalMileTest.java", "m", "nauticalmile", 1852.0, 1.0, True),
    ("MeterToUSFootTest.java", "m", "usfoot", 1.0, 3.28083333, False),  # rounded
    ("MeterToUSInchTest.java", "m", "usinch", 1.0, 39.37, True),
    ("MeterToUSMileTest.java", "m", "usmile", 1.0, 6.213699e-4, False),  # rounded
    ("MeterToUSYardTest.java", "m", "usyard", 1000.0, 1094.0, False),  # rounded
    ("MeterToYardTest.java", "m", "yard", 1000.0, 1093.6, False),  # rounded
    ("MileToMeterTest.java", "mile", "m", 1.0, 1609.3470878864446, False),
    ("MillimeterToMeterTest.java", "mm", "m", 1000.0, 1.0, True),
    ("NauticalMileToMeterTest.java", "nauticalmile", "m", 1.0, 1852.0, True),
    ("USFootToMeterTest.java", "usfoot", "m", 1.0, 0.30480060991089725, False),
    ("USInchToMeterTest.java", "usinch", "m", 1.0, 0.0254000508, False),  # rounded
    ("USMileToMeterTest.java", "usmile", "m", 1.0, 1609.3473468862912, False),
    ("USYardToMeterTest.java", "usyard", "m", 1000.0, 914.0767824497257, False),
    ("YardToMeterTest.java", "yard", "m", 1000.0, 914.41111923921, False),
]


def test_unit_conversion_goldens():
    """All 32 unit/*Test.java goldens.  Where the reference's expected value
    IS the exact international factor (15 of 32) we match it bit-for-bit;
    the other 17 use rounded 4-10-significant-digit factors — two of them
    (Chain) inverted outright — and are pinned as divergences against the
    exact factors (0.9144 m/yd, 1200/3937 m/usft, 20.1168 m/chain, ...),
    so any factor edit that silently "fixes" one direction gets caught."""
    from jena_geo_spark.functions.vector import UNIT_FACTORS_TO_M as U

    diverged = set()
    for fname, a, b, x, ref, matches in _UNIT_GOLDENS:
        ours = x * U[a] / U[b]
        if matches:
            assert ours == ref, f"{fname}: {ours!r} != reference {ref!r}"
        else:
            assert ours != ref, f"{fname}: unexpectedly equals rounded ref"
            if "Chain" in fname:  # reference factor inverted outright
                assert ours == pytest.approx(1.0 / ref, rel=2e-3), fname
            else:
                assert ours == pytest.approx(ref, rel=2e-3), fname  # rounded
            diverged.add(fname)
    assert len(diverged) == 17


# ---------------------------------------------------------------------------
# geometry/transform + polygon/transform + linestring/constructor batch
# (GeometryN.java, ReverseRing.java, Split.java, LineFromEncodedPolyline.java)


def test_geometry_n_golden():
    """GeometryN.java calls JTS ``getGeometryN(n)`` directly — ZERO-based,
    unlike PostGIS's 1-based ST_GeometryN (GeometryNTest.java is an empty
    shell, so the source is the spec).  JTS's base-class getGeometryN
    returns ``this`` for any index on an atomic geometry."""
    mp = wkb("MULTIPOINT (1 2, 3 4, 5 6)")
    assert W.to_wkt(W.from_wkb(u1(A.st_geometryn, mp, 0))) == "POINT (1 2)"
    assert W.to_wkt(W.from_wkb(u1(A.st_geometryn, mp, 2))) == "POINT (5 6)"
    assert u1(A.st_geometryn, mp, 3) is None
    # atomic: index ignored, geometry returned unchanged
    pt = wkb("POINT (9 9)")
    assert W.to_wkt(W.from_wkb(u1(A.st_geometryn, pt, 5))) == "POINT (9 9)"


def test_reverse_ring_golden():
    """ReverseRingTest.java fixture (commented out in the reference but
    consistent with ReverseRing.java): index selects the INTERIOR ring,
    zero-based; the exterior ring is never touched; non-polygons raise."""
    from jena_geo_spark.functions import transforms2 as T2

    poly = wkb("POLYGON ((8 2, 11 13, 2 6, 8 2), (8 2, 2 6, 11 13, 8 2))")
    got = W.to_wkt(W.from_wkb(u1(T2.st_reversering, poly, 0)))
    assert got == "POLYGON ((8 2, 11 13, 2 6, 8 2), (8 2, 11 13, 2 6, 8 2))"
    with pytest.raises(ValueError):
        u1(T2.st_reversering, poly, 1)  # only one interior ring
    with pytest.raises(ValueError):
        u1(T2.st_reversering, wkb("POINT (0 0)"), 0)


def test_split_polygon_by_line_golden():
    """Split.java's only working branch: polygon × linestring → node the
    boundary with the blade, polygonize, keep faces inside the input
    (``splitPolygon``), returned as a collection of polygons.  SplitTest
    .java is commented out (and its polygon blade would throw in the
    reference); the square/vertical-blade case pins the semantics, the
    holed case pins that hole faces are dropped."""
    sq = wkb("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    blade = wkb("LINESTRING (5 -1, 5 11)")
    res = W.from_wkb(u1(FS.st_split, sq, blade))
    assert res.kind == "geometrycollection"
    faces = sorted(W.to_wkt(m) for m in res.members())
    assert faces == [
        "POLYGON ((0 0, 5 0, 5 10, 0 10, 0 0))",
        "POLYGON ((5 0, 10 0, 10 10, 5 10, 5 0))",
    ]
    # holed polygon: the hole's face is not inside the input → excluded
    holed = wkb("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    res2 = W.from_wkb(u1(FS.st_split, holed, blade))
    assert len(res2.members()) == 2

    def _net_area(m):
        def ring_area(r):
            r = np.asarray(r)
            return 0.5 * abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))

        return ring_area(m.parts[0]) - sum(ring_area(h) for h in m.parts[1:])

    assert sum(_net_area(m) for m in res2.members()) == 96.0


def test_line_from_encoded_polyline_precision_golden():
    """LineFromEncodedPolyline.java is FunctionBase2(polyline, precision) —
    precision is the 10^k divisor handed to EncodedPolylineDatatype
    .decodePolyline (5 = Google, 6 = OSRM).  LineFromEncodedPolylineTest
    .java's expected coordinates (-1232.00015…) are garbage from a stray
    leading '|' in its input string; the standard Google test vector is
    pinned instead, in our exporter's stream (x, y) order."""
    from jena_geo_spark.functions import codecs as C
    from jena_geo_spark.functions import registry_support as RS

    coords = [(-120.2, 38.5), (-120.95, 40.7), (-126.453, 43.252)]
    enc = C.polyline_encode(coords)
    assert C.polyline_decode(enc, 5) == coords
    # precision mismatch scales by 10 — the second argument is live
    dec6 = np.array(C.polyline_decode(enc, 6))
    np.testing.assert_allclose(dec6, np.array(coords) / 10, rtol=0, atol=1e-12)
    got = W.from_wkb(u1(RS.st_linefromencodedpolyline, enc, 5))
    assert np.array_equal(got.parts[0], np.array(coords))


def test_reverse_golden():
    """ReverseTest.java: LINESTRING(1 2,1 10) → coordinates reversed."""
    got = u1(FV.st_reverse, wkb("LINESTRING (1 2, 1 10)"))
    assert W.to_wkt(W.from_wkb(got)) == "LINESTRING (1 10, 1 2)"


def test_multi_golden():
    """MultiTest.java: atomic → single-member multi; already-multi geometries
    pass through; Multi.java's default branch (e.g. geometrycollection) is an
    error in the reference — ours passes them through (documented superset)."""
    from jena_geo_spark.functions import transforms2 as T2

    got = u1(T2.st_multi, wkb("POLYGON ((0 0, 0 5, 5 0, 0 0))"))
    assert W.to_wkt(W.from_wkb(got)) == "MULTIPOLYGON (((0 0, 0 5, 5 0, 0 0)))"
    got2 = u1(T2.st_multi, wkb("MULTIPOINT (1 1)"))
    assert W.to_wkt(W.from_wkb(got2)) == "MULTIPOINT (1 1)"


def test_normalize_jts_norm_goldens():
    """Normalize.java delegates to JTS ``Geometry.norm()``: polygon shells
    CW / holes CCW, each ring scrolled to its minimum coordinate;
    linestrings reversed when the reverse reads lexicographically smaller
    (NormalizeTest.java's fixture line — its expected literal truncates
    2.34 to 2, so the orientation is the golden, not the broken text)."""
    from jena_geo_spark.functions import shapes as SH

    got = u1(SH.st_normalize, wkb("POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"))
    assert W.to_wkt(W.from_wkb(got)) == "POLYGON ((0 0, 0 5, 5 5, 5 0, 0 0))"
    holed = wkb("POLYGON ((0 0, 0 5, 5 5, 5 0, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))")
    got2 = u1(SH.st_normalize, holed)
    assert (
        W.to_wkt(W.from_wkb(got2))
        == "POLYGON ((0 0, 0 5, 5 5, 5 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    )
    ls = u1(SH.st_normalize, wkb("LINESTRING (1.42312321 2.34, 1 10)"))
    assert W.to_wkt(W.from_wkb(ls)) == "LINESTRING (1 10, 1.42312321 2.34)"


def test_reflect_golden():
    """Reflect.java: a POINT mirror is JTS ``setToReflection(x, y)`` —
    reflection about the line through the ORIGIN and the point, NOT a
    central inversion; a LINESTRING mirror reflects about first→last.
    (ReflectTest.java reflects a line about itself and asserts its reverse,
    which holds under the line branch.)"""
    from jena_geo_spark.functions import transforms2 as T2

    # line through origin and (0, 1) is the y-axis
    got = u1(T2.st_reflect, wkb("POINT (3 4)"), wkb("POINT (0 1)"))
    assert W.to_wkt(W.from_wkb(got)) == "POINT (-3 4)"
    # y = x diagonal
    got2 = u1(T2.st_reflect, wkb("POINT (3 0)"), wkb("POINT (1 1)"))
    assert W.to_wkt(W.from_wkb(got2)) == "POINT (0 3)"
    # degenerate mirror (origin) has no defined line
    assert u1(T2.st_reflect, wkb("POINT (3 4)"), wkb("POINT (0 0)")) is None
    # ReflectTest.java's self-reflection fixture: line onto itself
    ls = wkb("LINESTRING (1 2, 1 10)")
    got3 = u1(T2.st_reflect, ls, ls)
    assert W.to_wkt(W.from_wkb(got3)) == "LINESTRING (1 2, 1 10)"


def test_rotate_golden():
    """Rotate.java: JTS ``AffineTransformation.rotate(theta)`` — rotation
    about the ORIGIN by radians (RotateTest.java's fixture is a copy-paste
    of SplitTest's and asserts the input unchanged under a 0.8 rad
    rotation, which is impossible; the quarter-turn pin replaces it)."""
    got = u1(FT.st_rotate, wkb("POINT (1 0)"), math.pi / 2)
    x, y = W.from_wkb(got).parts[0][0][:2]
    assert abs(x) < 1e-15 and y == 1.0


def test_node_golden():
    """Node.java: MCIndexNoder full noding of self-intersections — the
    bowtie line splits at its crossing into noded substrings in input
    order."""
    from jena_geo_spark.functions import transforms2 as T2

    got = u1(T2.st_node, wkb("LINESTRING (0 0, 2 2, 0 2, 2 0)"))
    assert W.to_wkt(W.from_wkb(got)) == (
        "MULTILINESTRING ((0 0, 1 1), (1 1, 2 2), (2 2, 0 2), "
        "(0 2, 1 1), (1 1, 2 0))"
    )


def test_line_from_multipoint_golden():
    """LineFromMultiPointTest.java: MULTIPOINT Z(1 2 3, 4 5 6, 7 8 9) →
    LINESTRING with the same coordinates, Z preserved."""
    from jena_geo_spark.functions import transforms2 as T2

    got = u1(T2.st_linefrommultipoint, wkb("MULTIPOINT Z (1 2 3, 4 5 6, 7 8 9)"))
    assert W.to_wkt(W.from_wkb(got)) == "LINESTRING Z (1 2 3, 4 5 6, 7 8 9)"


def test_force_polygon_ccw_golden():
    """ForcePolygonCCW.java reverses CW shells (ForcePolygonCCWTest.java's
    expected literal drops a vertex from its own input — POLYGON((1 2,7 8,
    5 6,3 4,1 2)) cannot normalize to a 4-point ring — so the orientation
    property is the golden, not the broken text)."""
    from jena_geo_spark.functions import transforms2 as T2

    got = u1(T2.st_forcepolygonccw, wkb("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))"))
    assert W.to_wkt(W.from_wkb(got)) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    # already-CCW input passes through unchanged
    got2 = u1(T2.st_forcepolygonccw, wkb("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    assert W.to_wkt(W.from_wkb(got2)) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"


def test_has_horizontal_crs_and_right_triangle_pins():
    """HasHorizontalCRSTest.java and IsRightTriangleTest.java are empty
    shells; the impl semantics are pinned instead: every WGS84-default
    geometry has a horizontal CRS, and the 3-4-5 triangle is right while
    the equilateral is not (IsRightTriangle.java's Pythagoras check)."""
    assert u1(A.st_hashorizontalcrs, wkb("POINT (1 2)")) is np.True_ or u1(
        A.st_hashorizontalcrs, wkb("POINT (1 2)")
    )
    assert bool(u1(A.st_isrighttriangle, wkb("POLYGON ((0 0, 3 0, 3 4, 0 0))")))
    assert not bool(
        u1(
            A.st_isrighttriangle,
            wkb("POLYGON ((0 0, 2 0, 1 1.7320508075688772, 0 0))"),
        )
    )


def test_voronoi_goldens():
    """VoronoiPolygons.java delegates to JTS ``VoronoiDiagramBuilder``:
    cells are clipped to the site envelope expanded by max(width, height)
    per side (its own Test fixture is a broken copy-paste expecting the
    input back).  VoronoiLines.java is an UnsupportedOperationException
    stub — the PostGIS ST_VoronoiLines contract (bisector edges only, no
    clip-envelope border) is the spec for ours."""
    from jena_geo_spark.functions import shapes as SHP
    from jena_geo_spark.functions import transforms2 as T2
    from jena_geo_spark.geom import shapes as S

    # two sites: the bisector x=2 splits the expanded envelope
    got = u1(SHP.st_voronoipolygons, wkb("MULTIPOINT (0 0, 4 0)"))
    assert W.to_wkt(W.from_wkb(got)) == (
        "MULTIPOLYGON (((-4 -4, 2 -4, 2 4, -4 4, -4 -4)), "
        "((2 -4, 8 -4, 8 4, 2 4, 2 -4)))"
    )
    lines = u1(T2.st_voronoilines, wkb("MULTIPOINT (0 0, 4 0)"))
    assert W.to_wkt(W.from_wkb(lines)) == "MULTILINESTRING ((2 -4, 2 4))"
    # three sites: all three bisector edges meet at the circumcenter (2, 1.5)
    lines3 = W.from_wkb(u1(T2.st_voronoilines, wkb("MULTIPOINT (0 0, 4 0, 2 4)")))
    assert len(lines3.parts) == 3
    assert all(
        any(np.allclose(pt, [2.0, 1.5]) for pt in seg) for seg in lines3.parts
    )
    # cells tile the clip envelope exactly (area conservation)
    def ring_area(r):
        r = np.asarray(r)
        return 0.5 * abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))

    sites = np.array([[0, 0], [4, 0], [2, 4], [2, 1]], dtype=np.float64)
    cells = S.voronoi_diagram(sites)
    assert len(cells) == 4
    assert sum(ring_area(r) for _s, r in cells) == pytest.approx(12.0 * 12.0)


def test_band_pixel_type_golden():
    """BandPixelType.java over SampleRasters.wkbString1 (one 8-bit unsigned
    band): '8BUI' in range, NULL out of range (BandPixelTypeTest.java
    expects "" out of range but is commented out; same divergence family as
    BandMetadataTest, documented in the module header of
    test_reference_goldens_raster.py)."""
    import binascii

    from jena_geo_spark.raster import attributes as RT

    wkb1 = binascii.unhexlify(
        "00000000013FF00000000000003FF0000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000010E600020002040000010100"
    )
    assert u1(RT.rt_bandpixeltype, wkb1, 0) == "8BUI"
    assert u1(RT.rt_bandpixeltype, wkb1, 1) is None


def test_wkb_text_constructor_exporter_goldens():
    """GeomFromWKBTest.java / AsBinaryTest.java / LineFromTextTest.java /
    LineFromWKBTest.java: constructor↔exporter round-trips (the reference
    tests are commented out; AsBinaryTest's expected bytes are an
    XDR-flagged literal whose body is little-endian).  MedianIntersectsTest
    .java is dead code — MedianIntersects is never registered in
    PostGISConfig.java (same family as GreaterIntersects/SmallerIntersects,
    documented in test_reference_goldens_raster.py)."""
    from jena_geo_spark.functions import registry_support as RS

    # LineFromText golden fixture
    got = u1(RS.st_linefromtext, "LINESTRING(1 2, 3 4)")
    assert W.to_wkt(W.from_wkb(got)) == "LINESTRING (1 2, 3 4)"
    # AsBinary and GeomFromWKB are Catalyst identities (WKB IS the column
    # format); the value-level equivalent is the WKB round-trip
    poly = wkb("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))")
    assert W.to_wkt(W.from_wkb(poly)) == "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"
    # LineFromWKB passes lines through and rejects non-lines
    line_wkb = wkb("LINESTRING (1 2, 3 4)")
    got2 = u1(RS.st_linefromwkb, line_wkb)
    assert W.to_wkt(W.from_wkb(got2)) == "LINESTRING (1 2, 3 4)"
    assert u1(RS.st_linefromwkb, poly) is None


def test_split_unsupported_constellation_raises():
    """Split.java rejects everything but polygon × linestring; ours keeps
    the PostGIS line × line extension and raises the reference's error for
    the rest (e.g. polygon × polygon, point blades)."""
    with pytest.raises(ValueError, match="constellation"):
        u1(
            FS.st_split,
            wkb("POLYGON ((0 0, 1 0, 1 1, 0 0))"),
            wkb("POLYGON ((0 0, 1 0, 1 1, 0 0))"),
        )
    with pytest.raises(ValueError, match="constellation"):
        u1(FS.st_split, wkb("LINESTRING (0 0, 1 1)"), wkb("POINT (0.5 0.5)"))


def test_voronoi_lines_scale_invariant_and_null_guards():
    """Review regressions: bisector-edge dedup must key on the (site, site)
    pair, not absolutely-rounded float endpoints — at projected-coordinate
    magnitudes (~1e6-1e7) the two cells' independently clipped copies of a
    shared edge differ by more than any absolute epsilon.  And the
    rewritten UDFs must keep SQL NULL-propagation (None in → None out)."""
    from jena_geo_spark.functions import shapes as SHP
    from jena_geo_spark.functions import transforms2 as T2

    rng = np.random.default_rng(0)
    pts = rng.random((12, 2)) * 1000
    near = W.from_wkb(
        u1(T2.st_voronoilines, W.to_wkb(W.Geom("multipoint", [pts])))
    )
    far = W.from_wkb(
        u1(
            T2.st_voronoilines,
            W.to_wkb(W.Geom("multipoint", [pts + np.array([6e6, 5e6])])),
        )
    )
    assert len(near.parts) == len(far.parts) > 0
    assert u1(T2.st_reversering, None, 0) is None
    assert u1(FS.st_split, None, wkb("LINESTRING (0 0, 1 1)")) is None
    assert u1(SHP.st_voronoipolygons, None) is None
    assert u1(SHP.st_normalize, None) is None


def test_normalize_sorts_interior_rings():
    """JTS Polygon.normalize() sorts the hole array after normalizing each
    ring — equal polygons with holes listed in different orders must
    normalize identically (st_equalsnorm depends on it)."""
    from jena_geo_spark.geom import linework as L

    a = L.normalize(
        g(
            "POLYGON ((0 0, 0 9, 9 9, 9 0, 0 0), "
            "(1 1, 2 1, 2 2, 1 2, 1 1), (5 5, 6 5, 6 6, 5 6, 5 5))"
        )
    )
    b = L.normalize(
        g(
            "POLYGON ((0 0, 0 9, 9 9, 9 0, 0 0), "
            "(5 5, 6 5, 6 6, 5 6, 5 5), (1 1, 2 1, 2 2, 1 2, 1 1))"
        )
    )
    assert W.to_wkt(a) == W.to_wkt(b)


def test_point_attribute_goldens():
    """point/attribute/{X,Y,Z,M,XMin,XMax,YMin,YMax,ZMin,ZMax,MMin,MMax}
    Test.java — the whole package on its three fixtures.  The load-bearing
    pin: the reference parses the bare 4-coordinate ``POINT(1 2 3 4)`` as
    XYZM (M = 4, MTest.java), and ``LINESTRING M`` puts the third ordinate
    in M, not Z."""
    from jena_geo_spark.functions import accessors as AC
    from jena_geo_spark.functions import zm as Z

    pt = wkb("POINT(1 2 3 4)")  # bare 4-coord → XYZM
    ls = wkb("LINESTRING(1 2,3 4,5 6,7 8)")
    lz = wkb("LINESTRING Z(1 2 3, 4 5 6,7 8 9)")
    lm = wkb("LINESTRING M(1 2 3, 4 5 6,7 8 9)")

    assert u1(FV.st_x, pt) == 1.0  # XTest
    assert u1(FV.st_y, pt) == 2.0  # YTest
    assert u1(Z.st_z, pt) == 3.0  # ZTest ("POINT ZM(1 2 3 4)" fixture)
    assert u1(Z.st_m, pt) == 4.0  # MTest
    assert u1(AC.st_xmin, ls) == 1.0  # MinXTest
    assert u1(AC.st_xmax, ls) == 7.0  # MaxXTest
    assert u1(AC.st_ymin, ls) == 2.0  # MinYTest
    assert u1(AC.st_ymax, ls) == 8.0  # MaxYTest
    assert u1(Z.st_zmin, lz) == 3.0  # MinZTest
    assert u1(Z.st_zmax, lz) == 9.0  # MaxZTest
    assert u1(Z.st_mmin, lm) == 3.0  # MinMTest
    assert u1(Z.st_mmax, lm) == 9.0  # MaxMTest


def test_hausdorff_z_coordinates():
    """Discrete Hausdorff must ignore Z/M ordinates (JTS operates on XY) —
    the vertex loop used to unpack exactly two ordinates and crashed on
    POINT Z inputs."""
    a = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert D.hausdorff(a, g("POINT Z (1 1 5)")) == D.hausdorff(a, g("POINT (1 1)"))


def test_empty_operand_conventions():
    """Review regressions: operators with no defined result on an EMPTY
    operand return SQL NULL — not inf (hausdorff), not NaN (distance), not
    a plausible 0.0 (line-locate) — while operators with a defined result
    keep it (normalize(EMPTY) = EMPTY, relate = JTS matrix).  Exporter
    guards must catch WKB-decoded LINESTRING EMPTY, whose parts is a
    (0,2) array rather than [] (to_latlon/osm crashed; svg/georss emitted
    bogus markup)."""
    from jena_geo_spark.functions import exporters as EX
    from jena_geo_spark.functions import shapes as SHP
    from jena_geo_spark.geom import distances as DD

    le = wkb("LINESTRING EMPTY")
    pe = wkb("POINT EMPTY")
    line = wkb("LINESTRING (0 0, 4 0)")

    assert DD.hausdorff(W.from_wkb(pe), W.from_wkb(line)) is None
    assert DD.hausdorff(W.from_wkb(pe), W.from_wkb(pe)) is None
    assert DD.max_distance(W.from_wkb(pe), W.from_wkb(line)) is None
    assert u1(FV.st_distance, le, line) is None
    assert u1(FV.st_dwithin, le, line, 10.0) is None
    assert u1(FV.st_linelocatepoint, le, 1.0, 0.0) is None
    # exporters: NULL, not crashes or empty-markup strings
    for udf in (EX.st_assvg, EX.st_aslatlontext, EX.st_asosmlink, EX.st_asgeorss):
        assert u1(udf, le) is None, udf
    # normalize has a defined result on empty: identity, not NULL
    got = u1(SHP.st_normalize, wkb("POLYGON EMPTY"))
    assert got is not None and W.from_wkb(got).is_empty
    # wkb_is_empty agrees with the full decode on every kind
    for s in (
        "POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
        "MULTIPOINT EMPTY", "MULTILINESTRING EMPTY", "MULTIPOLYGON EMPTY",
        "GEOMETRYCOLLECTION EMPTY", "POINT (1 2)", "LINESTRING (0 0, 1 1)",
    ):
        b = W.to_wkb(g(s))
        assert W.wkb_is_empty(b) == W.from_wkb(b).is_empty, s


def test_remove_repeated_points_golden():
    """RemoveRepeatedPointsTest.java (live): the reference removes every
    point that duplicates ANY other point — both copies — so
    LINESTRING(0 0, 1 1, 2 4, 1 1, 6 8) loses both (1 1)s.  Ring
    divergence documented in st_removerepeatedpoints's docstring."""
    from jena_geo_spark.functions.vector import st_removerepeatedpoints

    out = u1(
        st_removerepeatedpoints,
        W.to_wkb(W.from_wkt("LINESTRING(0 0, 1 1, 2 4, 1 1, 6 8)")),
        0.0,
    )
    assert W.to_wkt(W.from_wkb(out)) == "LINESTRING (0 0, 2 4, 6 8)"
    # equals2D honors the tolerance: (2 4) vs (2.05 4.05) repeat at tol 0.1
    out = u1(
        st_removerepeatedpoints,
        W.to_wkb(W.from_wkt("LINESTRING(0 0, 2 4, 2.05 4.05, 9 9)")),
        0.1,
    )
    assert W.to_wkt(W.from_wkb(out)) == "LINESTRING (0 0, 9 9)"
    # rings keep consecutive-dedup semantics (closure survives)
    out = u1(
        st_removerepeatedpoints,
        W.to_wkb(W.from_wkt("POLYGON((0 0, 4 0, 4 0, 4 4, 0 0))")),
        0.0,
    )
    assert W.to_wkt(W.from_wkb(out)) == "POLYGON ((0 0, 4 0, 4 4, 0 0))"


def test_shortest_line_golden():
    """ShortestLineTest.java (live): LINESTRING(77.29 29.07, 10 10) — the
    segment from g1's closest vertex to g2's closest point, in (g1, g2)
    endpoint order."""
    from jena_geo_spark.functions.vector import st_shortestline

    out = u1(
        st_shortestline,
        W.to_wkb(W.from_wkt("LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)")),
        W.to_wkb(W.from_wkt("LINESTRING(5 5,10 10)")),
    )
    assert W.to_wkt(W.from_wkb(out)) == "LINESTRING (77.29 29.07, 10 10)"


def test_circumcentre_golden():
    """CircumcentreTest.java (live, but Circumcentre is not registered in
    PostGISConfig.java): POINT(7.666666666666667 8) for the triangle
    (8 2, 11 13, 2 6).  Pinned at the kernel (circle_from_3 — the same
    circumcenter routine the Voronoi dual uses)."""
    from jena_geo_spark.geom.shapes import circle_from_3

    cx, cy, _r2 = circle_from_3(
        np.array([8.0, 2.0]), np.array([11.0, 13.0]), np.array([2.0, 6.0])
    )
    assert (cx, cy) == (7.666666666666667, 8.0)


def test_collection_transform_goldens():
    """CollectionExtractTest / CollectionHomogenizeTest / ForceCollection
    Test / ScaleTest.java (all commented out; the impls pin the shape):
    CollectionExtract returns a MULTI* of the requested type — the
    commented test's POINT expectation contradicts its own impl
    (CollectionExtract.java case 1 calls createMultiPoint); Homogenize
    collapses a single-member collection to the member; ForceCollection
    wraps in a GEOMETRYCOLLECTION; Scale(line, 2, 2) doubles coords
    (Scale.java delegates to AffineTransformation.scaleInstance)."""
    from jena_geo_spark.functions.transform import st_scale
    from jena_geo_spark.functions.transforms2 import (
        st_collectionextract,
        st_collectionhomogenize,
        st_forcecollection,
    )

    gc = W.to_wkb(W.from_wkt("GEOMETRYCOLLECTION(POINT(0 0))"))
    assert W.to_wkt(W.from_wkb(u1(st_collectionextract, gc, 1))) == "MULTIPOINT (0 0)"
    assert W.to_wkt(W.from_wkb(u1(st_collectionhomogenize, gc))) == "POINT (0 0)"
    out = u1(st_forcecollection, W.to_wkb(W.from_wkt("POLYGON((0 0,0 5,5 0,0 0))")))
    assert W.to_wkt(W.from_wkb(out)) == "GEOMETRYCOLLECTION (POLYGON ((0 0, 0 5, 5 0, 0 0)))"
    out = u1(st_scale, W.to_wkb(W.from_wkt("LINESTRING(1 2,1 10)")), 2.0, 2.0)
    assert W.to_wkt(W.from_wkb(out)) == "LINESTRING (2 4, 2 20)"


def test_line_from_encoded_polyline_golden():
    """LineFromEncodedPolylineTest.java: decodePolyline builds
    Coordinate(lat, lng) (EncodedPolylineDatatype.java:154), so the
    canonical Google fixture decodes to (38.5 -120.2, 40.7 -120.95,
    43.252 -126.453) in that axis order — the test's unused testGeometry
    constant has the axes flipped and its commented body garbles the
    string with a leading '|'."""
    from jena_geo_spark.functions.registry_support import st_linefromencodedpolyline

    out = u1(st_linefromencodedpolyline, "_p~iF~ps|U_ulLnnqC_mqNvxq`@", 5)
    assert (
        W.to_wkt(W.from_wkb(out))
        == "LINESTRING (38.5 -120.2, 40.7 -120.95, 43.252 -126.453)"
    )


def test_delaunay_voronoi_degenerate_goldens():
    """DelaunayTrianglesTest / VoronoiPolygonsTest / VoronoiLinesTest.java
    (commented; single-point fixtures).  JTS builders return an empty
    collection for fewer than 3 sites — the commented tests' POINT
    expectations never matched any impl.  Pins: degenerate inputs are
    empty (triangles/lines) or the site's clip cell (polygons), and a
    3-site Delaunay yields the one triangle whose circumcenter is the
    Voronoi vertex."""
    from jena_geo_spark.functions.shapes import (
        st_delaunaytriangles,
        st_voronoipolygons,
    )
    from jena_geo_spark.functions.transforms2 import st_voronoilines

    pt = W.to_wkb(W.from_wkt("GEOMETRYCOLLECTION(POINT(0 0))"))
    assert W.to_wkt(W.from_wkb(u1(st_delaunaytriangles, pt))) == "MULTIPOLYGON EMPTY"
    assert W.to_wkt(W.from_wkb(u1(st_voronoilines, pt))) == "MULTILINESTRING EMPTY"
    cell = W.from_wkb(u1(st_voronoipolygons, pt))
    assert cell.kind == "multipolygon" and len(cell.parts) == 1
    tri = W.to_wkb(W.from_wkt("MULTIPOINT(8 2, 11 13, 2 6)"))
    out = W.from_wkb(u1(st_delaunaytriangles, tri))
    assert out.kind == "multipolygon" and len(out.parts) == 1
    assert len(out.parts[0][0]) == 4  # one closed triangle


def test_segmentize_invariant():
    """SegmentizeTest.java's body is disabled and its expectation is a
    different fixture entirely; pin the operative property instead — no
    output segment exceeds the given max length and vertices are
    preserved."""
    from jena_geo_spark.functions.shapes import st_segmentize

    out = W.from_wkb(
        u1(st_segmentize, W.to_wkb(W.from_wkt("LINESTRING(0 0, 10 0, 10 8)")), 3.0)
    )
    c = out.parts[0]
    seg = np.hypot(*(np.diff(c[:, :2], axis=0).T))
    assert (seg <= 3.0 + 1e-12).all()
    for v in [(0, 0), (10, 0), (10, 8)]:
        assert (np.abs(c[:, :2] - np.array(v)) < 1e-12).all(axis=1).any()


def test_addpoint_numinteriorrings_goldens():
    """AddPointTest.java (disabled; its POINT literal "POINT Z (1, 2, 3)"
    has commas and cannot parse) pins AddPoint(point, line) appending the
    point to the line's end — ours is the PostGIS-shaped
    (line, x, y, pos) with pos=-1 as append, same resulting coordinate
    sequence.  NumInteriorRingsTest.java is an empty class; pin the
    registered st_numInteriorRings directly."""
    from jena_geo_spark.functions.vector import st_addpoint, st_numinteriorrings

    out = u1(st_addpoint, wkb("LINESTRING(0 0, 1 1)"), 1.0, 2.0, -1)
    assert W.to_wkt(W.from_wkb(out)) == "LINESTRING (0 0, 1 1, 1 2)"
    hole = wkb("POLYGON((0 0,9 0,9 9,0 9,0 0),(1 1,2 1,2 2,1 2,1 1))")
    assert u1(st_numinteriorrings, hole) == 1
    assert u1(st_numinteriorrings, wkb("POLYGON((0 0,9 0,9 9,0 0))")) == 0


def test_remove_repeated_points_review_edges():
    """Review-pass pins for st_removerepeatedpoints: collection recursion,
    sub-2-point collapse, ring tolerance honored with closure + minimum
    protection, bounded-memory global scan at t>0."""
    from jena_geo_spark.functions.vector import st_removerepeatedpoints

    def run(w, t=0.0):
        return W.to_wkt(
            W.from_wkb(u1(st_removerepeatedpoints, W.to_wkb(W.from_wkt(w)), t))
        )

    # GEOMETRYCOLLECTION recurses per member
    assert (
        run("GEOMETRYCOLLECTION(LINESTRING(0 0,1 1,2 4,1 1,6 8),POINT(3 3))")
        == "GEOMETRYCOLLECTION (LINESTRING (0 0, 2 4, 6 8), POINT (3 3))"
    )
    # a line part collapsing below 2 points drops (never 1-point WKB)
    assert run("LINESTRING(0 0, 5 5, 0 0)") == "LINESTRING EMPTY"
    assert (
        run("MULTILINESTRING((0 0,5 5,0 0),(1 1,2 2))")
        == "MULTILINESTRING ((1 1, 2 2))"
    )
    # ring honors the tolerance (one copy kept), keeps closure
    assert (
        run("POLYGON((0 0, 4 0, 4.0001 0.0001, 4 4, 0 0))", 0.01)
        == "POLYGON ((0 0, 4 0, 4 4, 0 0))"
    )
    # an interior vertex within tolerance of the CLOSING vertex goes too
    assert (
        run("POLYGON((0 0, 4 0, 4 4, 0 0, 0 0))", 0.0)
        == "POLYGON ((0 0, 4 0, 4 4, 0 0))"
    )
    # ring-minimum protection: a triangle never degenerates
    assert (
        run("POLYGON((0 0, 4 0, 4 0.001, 0 0))", 0.01)
        == "POLYGON ((0 0, 4 0, 4 0.001, 0 0))"
    )
    # t>0 chunked scan agrees with the t=0 exact scan on exact dups
    assert run("LINESTRING(0 0, 1 1, 2 4, 1 1, 6 8)", 1e-9) == "LINESTRING (0 0, 2 4, 6 8)"


def test_map_algebra_const_review_edges():
    """Review-pass pins for band-targeted const ops: out-of-range band is
    loud; untargeted bands survive byte-exact (pixel type included)."""
    import pytest as _pytest

    from jena_geo_spark.raster import algebra as A
    from jena_geo_spark.raster import wkb_raster as WR

    r = WR.decode_hex(
        "01" "0000" "0300"
        "9A9999999999A93F" "9A9999999999A9BF" "000000E02B274A41" "0000000077195641"
        "0000000000000000" "0000000000000000" "E6100000" "0500" "0500"
        "44" "00" "FDFEFDFEFEFDFEFEFDF9FAFEFEFCF9FBFDFEFEFDFCFAFEFEFE"
        "44" "00" "4E627AADD16076B4F9FE6370A9F5FE59637AB0E54F58617087"
        "44" "00" "46566487A1506CA2E3FA5A6CAFFBFE4D566DA4CB3E454C5665"
    )
    with _pytest.raises(ValueError):
        A.map_algebra_const(r, "add", 1.0, band=3)
    out = A.map_algebra_const(r, "multiply", 10.0, band=1)
    assert out.bands[0].pixtype == r.bands[0].pixtype  # 8BUI preserved
    assert out.bands[2].pixtype == r.bands[2].pixtype
    assert np.array_equal(out.bands[0].data, r.bands[0].data)
    assert out.bands[1].pixtype == 11  # targeted band promoted to 64BF
