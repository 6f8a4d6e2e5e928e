"""Polygon×polygon spatial join vs exhaustive oracle."""

import numpy as np
import pytest

from jena_geo_spark import datagen
from jena_geo_spark.geom import from_wkt
from jena_geo_spark.geom.kernel import points_in_polygon, segments_intersect
from jena_geo_spark.operators.spatial_join import _rings_intersect, polygon_join


@pytest.fixture(scope="module")
def zone_list(spark):
    t = datagen.build_zones(12).to_pandas()
    return list(t[["zone_id", "geom_wkt"]].itertuples(index=False))


def _oracle_pairs(zones):
    rings = {zid: from_wkt(w).exterior() for zid, w in zones}
    ids = sorted(rings)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if _rings_intersect(rings[a], rings[b]):
                out.add((a, b))
    return out


def test_polygon_self_join_matches_oracle(spark, zone_list):
    got = {(r.id_a, r.id_b) for r in polygon_join(spark, zone_list).collect()}
    exp = _oracle_pairs(zone_list)
    assert got == exp
    assert len(exp) > 0  # cluster-centred zones overlap by construction


def test_polygon_join_two_sided(spark, zone_list):
    left = zone_list[:6]
    right = zone_list[6:]
    got = {(r.id_a, r.id_b) for r in polygon_join(spark, left, right).collect()}
    rings_l = {z: from_wkt(w).exterior() for z, w in left}
    rings_r = {z: from_wkt(w).exterior() for z, w in right}
    exp = {
        (a, b)
        for a in rings_l
        for b in rings_r
        if _rings_intersect(rings_l[a], rings_r[b])
    }
    assert got == exp


def test_rings_intersect_cases():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    far = sq + 10
    touch_inside = sq + 2
    contained = np.array([[1, 1], [2, 1], [2, 2], [1, 2]], dtype=float)
    cross = np.array([[-1, 1], [5, 1], [5, 2], [-1, 2]], dtype=float)  # slab through
    assert not _rings_intersect(sq, far)
    assert _rings_intersect(sq, touch_inside)
    assert _rings_intersect(sq, contained)
    assert _rings_intersect(contained, sq)
    assert _rings_intersect(sq, cross)


# ---------------------------------------------------- frame-scale variant --


def _random_polys(n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        cx, cy = rng.uniform(-30, 30), rng.uniform(-20, 20)
        r = rng.uniform(0.5, 6.0)
        m = int(rng.integers(4, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        ring = np.column_stack(
            [cx + np.cos(ang) * r * rng.uniform(0.5, 1.0, m),
             cy + np.sin(ang) * r * rng.uniform(0.5, 1.0, m)]
        )
        pts = ", ".join(f"{x!r} {y!r}" for x, y in np.vstack([ring, ring[:1]]))
        out.append((f"p{i:03d}", f"POLYGON(({pts}))"))
    return out


def test_polygon_join_frames_self_matches_oracle(spark):
    from jena_geo_spark.operators.spatial_join import polygon_join_frames

    polys = _random_polys(60, seed=7)
    pdf = spark.createDataFrame(polys, "id string, wkt string")
    got = {(r.id_a, r.id_b) for r in polygon_join_frames(spark, pdf).collect()}
    exp = _oracle_pairs(polys)
    assert got == exp
    assert len(exp) > 20  # dense enough to be a real test


def test_polygon_join_frames_two_sided_matches_driver(spark, zone_list):
    from jena_geo_spark.operators.spatial_join import polygon_join_frames

    left, right = zone_list[:6], zone_list[6:]
    ldf = spark.createDataFrame(left, "id string, wkt string")
    rdf = spark.createDataFrame(right, "id string, wkt string")
    got = {(r.id_a, r.id_b) for r in polygon_join_frames(spark, ldf, rdf).collect()}
    exp = {(r.id_a, r.id_b) for r in polygon_join(spark, left, right).collect()}
    assert got == exp


# ------------------------------------------------- holes & multipolygons --


DONUT = (
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
    "(3 3, 7 3, 7 7, 3 7, 3 3))"
)
IN_HOLE = "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"          # entirely inside the hole
STRADDLE = "POLYGON ((6 6, 8 6, 8 8, 6 8, 6 6))"          # crosses the hole boundary
OUTSIDE = "POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))"
MULTI = (
    "MULTIPOLYGON (((-30 -30, -28 -30, -28 -28, -30 -28, -30 -30)), "
    "((19 19, 25 19, 25 25, 19 25, 19 19)))"              # 2nd member hits OUTSIDE
)


def _pairs_refine(wkts_a, wkts_b):
    from jena_geo_spark.operators.spatial_join import (
        _parse_polys,
        _refine_intersect_pairs,
    )

    polys_a = [_parse_polys(w) for w in wkts_a]
    polys_b = [_parse_polys(w) for w in wkts_b]
    n = len(wkts_a)
    return _refine_intersect_pairs(
        polys_a, np.arange(n), polys_b, np.arange(n)
    ).tolist()


def test_refine_holes_and_multipolygons():
    got = _pairs_refine(
        [DONUT, DONUT, DONUT, MULTI, MULTI, IN_HOLE],
        [IN_HOLE, STRADDLE, OUTSIDE, OUTSIDE, DONUT, STRADDLE],
    )
    #           in-hole straddle outside  multi×outside multi×donut in-hole×straddle
    assert got == [False, True, False, True, False, True]


def test_polygon_join_hole_semantics(spark):
    zones = [
        ("donut", DONUT),
        ("in_hole", IN_HOLE),
        ("straddle", STRADDLE),
        ("outside", OUTSIDE),
        ("multi", MULTI),
    ]
    got = {(r.id_a, r.id_b) for r in polygon_join(spark, zones).collect()}
    assert got == {
        ("donut", "straddle"),      # crosses the hole boundary into the solid part
        ("in_hole", "straddle"),    # both small squares overlap each other
        ("multi", "outside"),       # 2nd multipolygon member overlaps OUTSIDE
    }
    assert ("donut", "in_hole") not in got  # wholly inside the hole ⇒ disjoint


def test_polygon_join_frames_hole_semantics(spark):
    from jena_geo_spark.operators.spatial_join import polygon_join_frames

    zones = [
        ("donut", DONUT),
        ("in_hole", IN_HOLE),
        ("straddle", STRADDLE),
        ("outside", OUTSIDE),
        ("multi", MULTI),
    ]
    df = spark.createDataFrame(zones, "id string, wkt string")
    got = {(r.id_a, r.id_b) for r in polygon_join_frames(spark, df).collect()}
    assert got == {
        ("donut", "straddle"),
        ("in_hole", "straddle"),
        ("multi", "outside"),
    }
