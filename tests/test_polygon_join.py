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
