"""General (Greiner–Hormann) boolean-overlay kernel tests: goldens for
every op and topology class, plus randomized identity + Monte-Carlo
property checks (reference overlay semantics GeometryWrapper.java:715-808)."""

import numpy as np
import pytest

from jena_geo_spark.geom import overlay as O
from jena_geo_spark.geom import wkt as W
from jena_geo_spark.geom.kernel import points_in_polygon, ring_area, segments_intersect

SQ = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
SQ2 = np.array([[2, 2], [6, 2], [6, 6], [2, 6]], float)
U = np.array([[0, 0], [6, 0], [6, 4], [4, 4], [4, 1], [2, 1], [2, 4], [0, 4]], float)
BAR = np.array([[-1, 2], [7, 2], [7, 3], [-1, 3]], float)
INNER = np.array([[1, 1], [2, 1], [2, 2], [1, 2]], float)
FAR = np.array([[10, 10], [11, 10], [11, 11], [10, 11]], float)


@pytest.mark.parametrize(
    "a,b,op,want",
    [
        (SQ, SQ2, "intersection", 4.0),
        (SQ, SQ2, "union", 28.0),
        (SQ, SQ2, "difference", 12.0),
        (SQ, SQ2, "symdifference", 24.0),
        (U, BAR, "intersection", 4.0),  # two disjoint pieces
        (U, BAR, "union", 22.0),  # union encloses a hole (area 2)
        (U, BAR, "difference", 14.0),  # three pieces
        (BAR, U, "difference", 4.0),
        (U, BAR, "symdifference", 18.0),
        (SQ, INNER, "difference", 15.0),  # polygon-with-hole result
        (SQ, INNER, "intersection", 1.0),
        (SQ, INNER, "union", 16.0),
        (SQ, FAR, "union", 17.0),
        (SQ, FAR, "intersection", 0.0),
        (SQ, FAR, "difference", 16.0),
    ],
)
def test_overlay_area_goldens(a, b, op, want):
    assert O.overlay_area(a, b, op) == pytest.approx(want, abs=1e-9)


def test_multi_piece_and_hole_ring_structure():
    rings = O.overlay_rings(U, BAR, "intersection")
    assert len(rings) == 2  # the bar crosses both prongs
    rings = O.overlay_rings(U, BAR, "union")
    polys = O.assemble_polygons(rings)
    assert len(polys) == 1 and len(polys[0][1]) == 1  # one shell, one hole
    g = O.overlay_geoms(
        W.Geom("polygon", [SQ]), W.Geom("polygon", [INNER]), "difference"
    )
    assert g.kind == "polygon" and len(g.parts) == 2  # shell + hole


def test_adjacent_edge_degeneracy_resolved_by_perturbation():
    adj = np.array([[4, 0], [8, 0], [8, 4], [4, 4]], float)
    assert O.overlay_area(SQ, adj, "intersection") == pytest.approx(0.0, abs=1e-5)
    assert O.overlay_area(SQ, adj, "union") == pytest.approx(32.0, abs=1e-5)


def _is_simple(P):
    n = len(P)
    for i in range(n):
        for j in range(i + 1, n):
            if (j + 1) % n == i or (i + 1) % n == j:
                continue
            if segments_intersect(P[i], P[(i + 1) % n], P[j], P[(j + 1) % n]):
                return False
    return True


def test_randomized_identities_and_montecarlo():
    rng = np.random.default_rng(7)

    def rand_poly(n, cx, cy, r):
        while True:
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(0.3 * r, r, n)
            P = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
            if _is_simple(P) and abs(ring_area(P)) > 0.05:
                return P

    for _ in range(40):
        A = rand_poly(int(rng.integers(3, 10)), 0, 0, 3)
        B = rand_poly(int(rng.integers(3, 10)), rng.uniform(-2.5, 2.5), rng.uniform(-2.5, 2.5), 3)
        i = O.overlay_area(A, B, "intersection")
        un = O.overlay_area(A, B, "union")
        da = O.overlay_area(A, B, "difference")
        db = O.overlay_area(B, A, "difference")
        sd = O.overlay_area(A, B, "symdifference")
        aa, ab = ring_area(A), ring_area(B)
        assert i + un == pytest.approx(aa + ab, abs=1e-6)
        assert da == pytest.approx(aa - i, abs=1e-6)
        assert db == pytest.approx(ab - i, abs=1e-6)
        assert sd == pytest.approx(un - i, abs=1e-6)
        assert min(i, un, da, db, sd) > -1e-9
        # Monte-Carlo cross-check (box must COVER both polygons)
        px = rng.uniform(-7, 7, 20000)
        py = rng.uniform(-7, 7, 20000)
        ina = points_in_polygon(px, py, A)
        inb = points_in_polygon(px, py, B)
        for op, mask, got in [
            ("intersection", ina & inb, i),
            ("union", ina | inb, un),
            ("difference", ina & ~inb, da),
        ]:
            mc = mask.mean() * 196.0
            sig = 196.0 * np.sqrt(max(mask.mean() * (1 - mask.mean()), 2e-5) / 20000)
            assert abs(got - mc) < 6 * sig + 1e-3, (op, got, mc)


def test_interior_point_and_depths():
    p = O.interior_point(U)
    assert points_in_polygon(np.array([p[0]]), np.array([p[1]]), U)[0]
    rings = [SQ, INNER, FAR]
    assert O.ring_depths(rings) == [0, 1, 0]


def test_node_chains_preserves_input_coordinates_bit_exact():
    """Noding snaps each coordinate cluster to ONE representative, preferring
    exact original endpoints — quantizing everything used to turn 1.0 into
    0.9999999999999999 (the snap quantum is not binary-representable).
    Computed cut points from different segments must still unify."""
    from jena_geo_spark.geom import arrangement as AR

    chains = [
        np.array([[0.0, 0.0], [1.0, 0.0]]),
        np.array([[0.3, -0.5], [0.3, 0.5]]),
    ]
    segs = AR.node_chains(chains)
    pts = {(float(p[0]), float(p[1])) for s in segs for p in s}
    # original endpoints pass through bit-identical
    assert {(0.0, 0.0), (1.0, 0.0), (0.3, -0.5), (0.3, 0.5)} <= pts
    # the crossing is cut into both segments, with ONE shared representative
    cut = [p for p in pts if p not in {(0.0, 0.0), (1.0, 0.0), (0.3, -0.5), (0.3, 0.5)}]
    assert len(cut) == 1 and cut[0] == (0.3, 0.0)
