"""Differential fuzz: geom/overlay.overlay_area vs exact-rational areas.

The r5 relate differential caught a real `ring_depths` bug (a probe
landing on a collinear shared edge flipped a difference area's sign).
This fuzz targets that kernel directly: for random convex pairs with
small-integer coordinates, `overlay_area` must equal the exact
Sutherland–Hodgman Fraction area for intersections, and the exact
inclusion–exclusion value for differences and unions — including the
degenerate contact configurations (shared edges, vertex touches,
containment) that integer grids make common.
"""

import random
from fractions import Fraction as Fr

import pytest

from jena_geo_spark.geom import overlay as O

from _exact_relate import _area2, _sh_clip
from test_relate_differential import _rand_poly

import numpy as np


def _ring(poly):
    return np.array([[float(x), float(y)] for x, y in poly])


def _exact_inter_area(pa, pb) -> float:
    inter = _sh_clip(pa, pb)
    return float(_area2(inter) / 2) if len(inter) >= 3 else 0.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_overlay_area_matches_exact_rational(seed):
    rng = random.Random(4400 + seed)
    for _ in range(200):
        pa, pb = _rand_poly(rng), _rand_poly(rng)
        ia = _exact_inter_area(pa, pb)
        aa = float(_area2(pa) / 2)
        ab = float(_area2(pb) / 2)
        ra, rb = _ring(pa), _ring(pb)
        tol = 1e-6  # perturbation slivers on degenerate shared boundaries
        got_i = O.overlay_area(ra, rb, "intersection")
        assert abs(got_i - ia) <= tol, ("intersection", pa, pb, got_i, ia)
        got_dab = O.overlay_area(ra, rb, "difference")
        assert abs(got_dab - (aa - ia)) <= tol, ("a-b", pa, pb, got_dab, aa - ia)
        got_dba = O.overlay_area(rb, ra, "difference")
        assert abs(got_dba - (ab - ia)) <= tol, ("b-a", pa, pb, got_dba, ab - ia)


def test_overlay_area_flush_hole_regression():
    """The exact r5 bug shape: subtracting a rectangle flush against the
    shell's edge must return shell − hole, not a sign-flipped union."""
    a = _ring([(Fr(2), Fr(2)), (Fr(4), Fr(2)), (Fr(4), Fr(3)), (Fr(2), Fr(3))])
    b = _ring([(Fr(0), Fr(2)), (Fr(5), Fr(2)), (Fr(5), Fr(4)), (Fr(0), Fr(4))])
    assert abs(O.overlay_area(b, a, "difference") - 8.0) < 1e-6
    assert abs(O.overlay_area(a, b, "difference") - 0.0) < 1e-6
    assert abs(O.overlay_area(a, b, "intersection") - 2.0) < 1e-6
