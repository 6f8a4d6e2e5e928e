"""Distance long-tail kernels vs reference goldens
(HausdorffDistanceTest / MaxDistanceTest / ClosestPointTest; the
FrechetDistanceTest golden is NOT reproduced — see the st_frechetdistance
docstring: the vendored reference implementation is broken)."""

import numpy as np
import pytest

from jena_geo_spark.geom import distances as D
from jena_geo_spark.geom import wkt as W


def g(s):
    return W.from_wkt(s)


def test_hausdorff_reference_golden():
    assert D.hausdorff(g("LINESTRING (0 0, 2 0)"), g("MULTIPOINT (0 1, 1 0, 2 1)")) == 1.0


def test_hausdorff_symmetric_and_zero():
    a = g("LINESTRING(0 0, 10 0)")
    assert D.hausdorff(a, a) == 0.0
    b = g("LINESTRING(0 3, 10 3)")
    assert D.hausdorff(a, b) == 3.0
    assert D.hausdorff(b, a) == 3.0


def test_maxdistance_reference_golden():
    a = g("LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)")
    b = g("LINESTRING(5 5 ,10 10)")
    assert D.max_distance(a, b) == 76.37541489249011


def test_closest_point_reference_golden():
    # ClosestPointTest: closest point ON the point to the line is itself
    pa, pb = D.nearest_points(
        g("POINT(100 100)"), g("LINESTRING (20 80, 98 190, 110 180, 50 75 )")
    )
    assert pa == (100.0, 100.0)
    # and the returned pair realizes the min distance
    d = np.hypot(pa[0] - pb[0], pa[1] - pb[1])
    from jena_geo_spark.geom.kernel import geom_distance_g

    assert d == pytest.approx(
        geom_distance_g(g("POINT(100 100)"), g("LINESTRING (20 80, 98 190, 110 180, 50 75 )")),
        rel=1e-12,
    )


def test_frechet_discrete_and_continuous():
    same = np.array([[0, 1], [1, 0], [2, 1]], float)
    assert D.frechet_continuous(same, same) == 0.0
    assert D.frechet_discrete(same, same) == 0.0
    c1 = np.array([[0, 0], [5, 0], [10, 0]], float)
    c2 = c1 + [0, 3]
    assert D.frechet_continuous(c1, c2) == pytest.approx(3.0)
    assert D.frechet_discrete(c1, c2) == pytest.approx(3.0)
    # continuous <= discrete always; here continuous is strictly smaller:
    # zig-zag vs straight line
    zig = np.array([[0, 0], [5, 1], [10, 0]], float)
    line = np.array([[0, 0], [10, 0]], float)
    fc = D.frechet_continuous(zig, line)
    fd = D.frechet_discrete(zig, line)
    assert fc <= fd + 1e-12
    assert fc == pytest.approx(1.0)
    # endpoint mismatch dominates (true Alt-Godau semantics)
    g3 = np.array([[130, 0], [0, 0], [0, 150]], float)
    g4 = np.array([[10, 10], [10, 150], [130, 10]], float)
    fc = D.frechet_continuous(g3, g4)
    assert fc >= np.hypot(130, 140) - 1e-9  # >= end-end distance


def test_frechet_decision_monotone():
    rng = np.random.default_rng(5)
    for _ in range(20):
        p = rng.uniform(-5, 5, (rng.integers(2, 6), 2))
        q = rng.uniform(-5, 5, (rng.integers(2, 6), 2))
        f = D.frechet_continuous(p, q)
        assert D._frechet_decision(p, q, f + 1e-9)
        assert not D._frechet_decision(p, q, max(f - 1e-6, 0.0)) or f < 1e-6
        assert f <= D.frechet_discrete(p, q) + 1e-9


def test_furthest_pair_and_longest():
    a = g("LINESTRING(0 0, 1 0)")
    b = g("LINESTRING(10 0, 10 5)")
    pa, pb = D.furthest_pair(a, b)
    assert pa == (0.0, 0.0) and pb == (10.0, 5.0)


def test_distance_udfs(spark):
    from pyspark.sql import functions as F

    from jena_geo_spark.functions.vector import (
        st_centroid_distance,
        st_frechetdistance,
        st_frechetdistance_discrete,
        st_geomfromtext,
        st_hausdorffdistance,
        st_longestline,
        st_maxdistance,
        st_shortestline,
    )

    df = spark.createDataFrame(
        [("LINESTRING(0 0, 10 0)", "LINESTRING(0 3, 10 3)")], "a string, b string"
    ).select(
        st_geomfromtext(F.col("a")).alias("ga"), st_geomfromtext(F.col("b")).alias("gb")
    )
    r = df.select(
        st_hausdorffdistance("ga", "gb").alias("h"),
        st_maxdistance("ga", "gb").alias("m"),
        st_frechetdistance("ga", "gb").alias("f"),
        st_frechetdistance_discrete("ga", "gb").alias("fd"),
        st_centroid_distance("ga", "gb").alias("cd"),
        st_shortestline("ga", "gb").alias("sl"),
        st_longestline("ga", "gb").alias("ll"),
    ).first()
    assert r["h"] == 3.0 and r["f"] == 3.0 and r["fd"] == 3.0 and r["cd"] == 3.0
    assert r["m"] == pytest.approx(np.hypot(10, 3))
    sl = W.from_wkb(bytes(r["sl"]))
    assert sl.kind == "linestring" and np.hypot(*(sl.parts[0][1] - sl.parts[0][0])) == 3.0


def test_geof_distance_srid_dispatch(spark):
    """Reference dispatch (GeometryWrapper.java:676-686): geographic SRID →
    great-circle metres via spherical Vincenty on the nearest vertex pair;
    projected SRID → planar Euclidean, unchanged from st_distance."""
    import numpy as np
    from pyspark.sql import functions as F

    from jena_geo_spark.functions.vector import geof_distance, st_distance, st_geomfromtext
    from jena_geo_spark.geom.kernel import vincenty_m

    df = spark.createDataFrame(
        [("POINT(8.2835 49.9928)", "POINT(2.3522 48.8566)")], "wa string, wb string"
    ).select(
        st_geomfromtext(F.col("wa")).alias("ga"),
        st_geomfromtext(F.col("wb")).alias("gb"),
    )
    geo = df.select(
        geof_distance(F.col("ga"), F.col("gb"), F.lit(4326)).alias("d")
    ).first().d
    want = float(vincenty_m(8.2835, 49.9928, 2.3522, 48.8566))
    assert geo == want  # bit-exact: same kernel on the same pair
    assert abs(geo - 447_000) < 10_000  # sanity: Mainz→Paris ≈ 447 km

    proj = df.select(
        geof_distance(F.col("ga"), F.col("gb"), F.lit(3857)).alias("d"),
        st_distance(F.col("ga"), F.col("gb")).alias("p"),
    ).first()
    assert proj.d == proj.p  # projected branch == planar distance

    # geographic branch on NON-point geometry: nearest VERTEX pair feeds
    # Vincenty (reference CoordinatePair semantics, not segment projection)
    df2 = spark.createDataFrame(
        [("LINESTRING(0 0, 10 0)", "POINT(5 1)")], "wa string, wb string"
    ).select(
        st_geomfromtext(F.col("wa")).alias("ga"),
        st_geomfromtext(F.col("gb") if False else F.col("wb")).alias("gb"),
    )
    got = df2.select(
        geof_distance(F.col("ga"), F.col("gb"), F.lit(4326)).alias("d")
    ).first().d
    # nearest vertices: (0,0) or (10,0) vs (5,1) — both 5.099..° away; the
    # argmin picks the first, so the golden is vincenty((0,0),(5,1))
    assert got == float(vincenty_m(0.0, 0.0, 5.0, 1.0))
