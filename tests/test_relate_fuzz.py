"""Property-based consistency fuzz of the DE-9IM relate kernel
(geom/relate.py) over adversarial small-integer-lattice geometry pairs.

Lattice coordinates in [0, 4] force the degenerate configurations a
uniform-random sweep never produces: shared vertices, collinear edge
overlaps, boundary-on-boundary touches, identical operands.  Invariants:

* **transpose symmetry** — relate(b, a) is the transpose of
  relate(a, b).  Non-trivial here: rows come from sweeping A's samples
  against B while columns come from sweeping B's against A, so the two
  calls exercise disjoint code paths that must agree entry-for-entry.
* **self-relate** — relate(a, a) must be the dimension's canonical
  matrix (point 0FFFFFFF2, open line 1FFF0FFF2 for a simple open line,
  polygon 2FFF1FFF2) and equals_topo(a, a) must hold.
* **independent intersects oracle** — intersects(a, b) is re-derived
  from first principles (any vertex of one locates non-exterior in the
  other, or any edge pair intersects) and must match the matrix-derived
  predicate.  The oracle shares only the lowest-level primitives
  (locate / segments_intersect), not the sweep-sample machinery.

The reference's relate surface is RelateTest.java / the sf*/eh*/rcc8
function families (PostGISConfig.java registrations); semantics pinned
by tests/test_relate.py goldens — this file pins internal consistency.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jena_geo_spark.geom import relate as R
from jena_geo_spark.geom.kernel import segments_intersect
from jena_geo_spark.geom.wkt import Geom

COORD = st.integers(0, 4)


@st.composite
def lattice_geom(draw):
    kind = draw(st.sampled_from(["point", "segment", "path", "rect", "tri"]))
    if kind == "point":
        return Geom("point", [np.array([[draw(COORD), draw(COORD)]], float)])
    if kind == "segment":
        a = (draw(COORD), draw(COORD))
        b = (draw(COORD), draw(COORD))
        if a == b:
            b = (a[0] + 1, a[1])
        return Geom("linestring", [np.array([a, b], float)])
    if kind == "path":
        pts = [(draw(COORD), draw(COORD)) for _ in range(3)]
        out = [pts[0]]
        for p in pts[1:]:
            if p != out[-1]:
                out.append(p)
        if len(out) < 2:
            out.append((out[-1][0] + 1, out[-1][1]))
        return Geom("linestring", [np.array(out, float)])
    if kind == "rect":
        x0, y0 = draw(COORD), draw(COORD)
        w, h = draw(st.integers(1, 3)), draw(st.integers(1, 3))
        ring = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)]
        return Geom("polygon", [np.array(ring, float)])
    # triangle from 3 non-collinear lattice points
    while True:
        a = (draw(COORD), draw(COORD))
        b = (draw(COORD), draw(COORD))
        c = (draw(COORD), draw(COORD))
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if cross != 0:
            if cross < 0:
                b, c = c, b
            return Geom("polygon", [np.array([a, b, c, a], float)])


def _edges(g: Geom):
    for part in g.parts:
        arr = np.asarray(part, float)
        if g.kind == "point" or len(arr) < 2:
            continue
        for i in range(len(arr) - 1):
            yield arr[i, :2], arr[i + 1, :2]


def _vertices(g: Geom):
    for part in g.parts:
        for p in np.asarray(part, float):
            yield float(p[0]), float(p[1])


def _oracle_intersects(a: Geom, b: Geom) -> bool:
    for vx, vy in _vertices(a):
        if R.locate(vx, vy, b) != "exterior":
            return True
    for vx, vy in _vertices(b):
        if R.locate(vx, vy, a) != "exterior":
            return True
    for p1, p2 in _edges(a):
        for q1, q2 in _edges(b):
            if segments_intersect(p1, p2, q1, q2):
                return True
    return False


def _transpose(m: str) -> str:
    return "".join(m[3 * c + r] for r in range(3) for c in range(3))


_FUZZ = settings(
    max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@_FUZZ
@given(lattice_geom(), lattice_geom())
def test_relate_transpose_symmetry(a, b):
    assert R.relate(b, a) == _transpose(R.relate(a, b))


@_FUZZ
@given(lattice_geom(), lattice_geom())
def test_intersects_matches_first_principles(a, b):
    assert R.intersects(a, b) == _oracle_intersects(a, b)
    assert R.disjoint(a, b) != R.intersects(a, b)


@_FUZZ
@given(lattice_geom())
def test_self_relate_canonical(g):
    m = R.relate(g, g)
    assert R.equals_topo(g, g), m
    d = {"point": 0, "linestring": 1, "polygon": 2}[g.kind]
    if d == 0:
        assert m == "0FFFFFFF2"
    elif d == 2:
        assert m == "2FFF1FFF2"
    else:
        # open simple lines: 1FFF0FFF2; self-touching / closed paths may
        # differ in the BB entry — only pin the I/E structure
        assert m[0] == "1" and m[2] == "F" and m[6] == "F" and m[8] == "2"


@_FUZZ
@given(lattice_geom(), lattice_geom())
def test_containment_duality_and_touches(a, b):
    m = R.relate(a, b)
    assert R.within(a, b) == R.contains(b, a)
    if R.touches(a, b):
        assert R.intersects(a, b) and m[0] == "F"
    if R.equals_topo(a, b):
        assert R.within(a, b) and R.contains(a, b)
