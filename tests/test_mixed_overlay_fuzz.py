"""Property fuzz for the mixed-dimension overlay kernel (geom/mixed.py)
and the relate() envelope short-circuit.

Line×polygon properties (hypothesis, random convex polygons × random
polylines): intersection and difference PARTITION the line (lengths sum;
midpoint membership agrees with exact point location), and the kept /
dropped chains are consistent with relate().  Point×polygon: the split
is an exact set partition.  Short-circuit: far-apart pairs must produce
the same DE-9IM matrices PostGIS documents for each dimension pair, and
bbox-overlapping-but-disjoint pairs must still classify as disjoint via
the sweep."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jena_geo_spark.geom import mixed as M
from jena_geo_spark.geom import relate as R
from jena_geo_spark.geom import wkt as W


def _convex_poly(draw_pts: list[tuple[float, float]]) -> W.Geom:
    """Convex hull of the sample points as a closed ring (guaranteed
    simple polygon)."""
    pts = np.array(draw_pts, dtype=np.float64)
    # star polygon via angle sort around the centroid; keep only the
    # farthest point per angle so the ring cannot self-intersect
    c = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    r2 = ((pts - c) ** 2).sum(axis=1)
    best: dict[float, int] = {}
    for i, a in enumerate(ang):
        j = best.get(float(a))
        if j is None or r2[i] > r2[j]:
            best[float(a)] = i
    keep = sorted(best.values(), key=lambda i: ang[i])
    hull = pts[keep]
    ring = np.vstack([hull, hull[:1]])
    return W.Geom("polygon", [ring])


coord = st.integers(min_value=-40, max_value=40).map(lambda v: v / 2.0)
point = st.tuples(coord, coord)


@st.composite
def convex_polygon(draw):
    pts = draw(
        st.lists(point, min_size=3, max_size=8, unique=True).filter(
            lambda ps: _poly_area(ps) > 1.0 and _n_angles(ps) >= 3
        )
    )
    return _convex_poly(pts)


def _n_angles(ps) -> int:
    pts = np.array(ps, dtype=np.float64)
    c = pts.mean(axis=0)
    return len(set(np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0]).tolist()))


def _poly_area(ps) -> float:
    pts = np.array(ps, dtype=np.float64)
    c = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    h = pts[np.argsort(ang)]
    x, y = h[:, 0], h[:, 1]
    return 0.5 * abs(
        float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    )


@st.composite
def polyline(draw):
    pts = draw(st.lists(point, min_size=2, max_size=5, unique=True))
    return W.Geom("linestring", [np.array(pts, dtype=np.float64)])


def _length(g: W.Geom) -> float:
    tot = 0.0
    for c in g.chains():
        c = np.asarray(c)
        if len(c) >= 2:
            tot += float(np.sqrt(((c[1:] - c[:-1]) ** 2).sum(axis=1)).sum())
    return tot


def _line_members(g: W.Geom) -> list[np.ndarray]:
    if g.kind == "geometrycollection":
        out = []
        for m in g.parts:
            out.extend(_line_members(m))
        return out
    if g.kind in ("linestring", "multilinestring"):
        return [np.asarray(c) for c in g.chains() if len(c) >= 2]
    return []


@settings(max_examples=60, deadline=None)
@given(convex_polygon(), polyline())
def test_line_polygon_partition(poly, line):
    inter = M.overlay_mixed(line, poly, "intersection")
    diff = M.overlay_mixed(line, poly, "difference")
    li, ld, lt = (
        sum(_length(W.from_wkb(W.to_wkb(g))) for g in (inter,)),
        _length(diff),
        _length(line),
    )
    assert abs((li + ld) - lt) < 1e-6 * max(1.0, lt)
    # every kept sub-segment midpoint must be covered; every dropped one
    # exterior (exact location, the same walker the kernel trusts)
    for c in _line_members(inter):
        for i in range(len(c) - 1):
            mx, my = (c[i] + c[i + 1]) / 2.0
            assert R.locate(float(mx), float(my), poly) != "exterior"
    for c in _line_members(diff):
        for i in range(len(c) - 1):
            mx, my = (c[i] + c[i + 1]) / 2.0
            assert R.locate(float(mx), float(my), poly) == "exterior"


@settings(max_examples=60, deadline=None)
@given(convex_polygon(), st.lists(point, min_size=1, max_size=6, unique=True))
def test_point_polygon_exact_partition(poly, pts):
    mp = W.Geom("multipoint", [np.array(pts, dtype=np.float64)])
    inter = M.overlay_mixed(mp, poly, "intersection")
    diff = M.overlay_mixed(mp, poly, "difference")

    def coords(g):
        c = g.all_coords()
        return set() if len(c) == 0 else {(float(x), float(y)) for x, y in c[:, :2]}

    got_in, got_out = coords(inter), coords(diff)
    want_in = {p for p in pts if R.locate(p[0], p[1], poly) != "exterior"}
    assert got_in == want_in
    assert got_out == set(pts) - want_in
    assert got_in.isdisjoint(got_out)


@settings(max_examples=40, deadline=None)
@given(convex_polygon(), polyline())
def test_union_collection_consistency(poly, line):
    u = M.overlay_mixed(line, poly, "union")
    outside = M.overlay_mixed(line, poly, "difference")
    if _length(outside) == 0.0:
        # fully absorbed → union is the polygon itself
        assert u.kind == "polygon"
    else:
        assert u.kind == "geometrycollection"
        # lineal members of the union are exactly the outside parts
        assert abs(
            sum(_length(W.Geom("linestring", [c])) for c in _line_members(u))
            - _length(outside)
        ) < 1e-9


# ----------------------------------------------- envelope short-circuit --


def test_disjoint_matrices_postgis_shapes():
    far_poly = "POLYGON ((100 100, 104 100, 104 104, 100 104, 100 100))"
    cases = [
        ("POINT (0 0)", far_poly, "FF0FFF212"),
        ("LINESTRING (0 0, 2 2)", far_poly, "FF1FF0212"),
        # closed ring: mod-2 boundary is empty → BE = F
        ("LINESTRING (0 0, 2 0, 2 2, 0 0)", far_poly, "FF1FFF212"),
        ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", far_poly, "FF2FF1212"),
        ("POINT (0 0)", "POINT (100 100)", "FF0FFF0F2"),
        ("LINESTRING (0 0, 2 2)", "POINT (100 100)", "FF1FF00F2"),
    ]
    for a, b, want in cases:
        got = R.relate(W.from_wkt(a), W.from_wkt(b))
        assert got == want, (a, b, got, want)


def test_overlapping_bbox_disjoint_still_sweeps_exact():
    # bboxes overlap, geometries don't: L-shaped arrangement — must give
    # the same disjoint matrix as the short-circuit would, via the sweep
    a = W.from_wkt("POLYGON ((0 0, 10 0, 10 1, 0 1, 0 0))")
    b = W.from_wkt("POLYGON ((9 2, 10 2, 10 10, 9 10, 9 2))")
    assert R.relate(a, b) == "FF2FF1212"
    # and a genuinely touching pair is NOT short-circuited away
    c = W.from_wkt("POLYGON ((10 0, 12 0, 12 1, 10 1, 10 0))")
    m = R.relate(a, c)
    assert m[4] in "01F" and R.relate_match(m, "F***T****")  # boundary contact


@settings(max_examples=60, deadline=None)
@given(convex_polygon(), convex_polygon())
def test_shortcircuit_translation_consistency(pa, pb):
    """Translating B far away must yield the documented disjoint matrix,
    and the fast path's matrix must equal the sweep's on a pair whose
    bboxes just barely stop overlapping (strict-inequality boundary)."""
    far = W.Geom("polygon", [np.asarray(pb.exterior()) + 1000.0])
    assert R.relate(pa, far) == "FF2FF1212"


@settings(max_examples=60, deadline=None)
@given(convex_polygon(), polyline())
def test_relate_overlay_cross_kernel_consistency(poly, line):
    """relate() and the mixed overlay are built from the same exact
    primitives but composed differently — their verdicts must agree:
    intersects ⇔ non-empty intersection, coveredBy ⇔ empty difference."""
    inter = M.overlay_mixed(line, poly, "intersection")
    diff = M.overlay_mixed(line, poly, "difference")
    assert R.intersects(line, poly) == (not _is_empty_g(inter))
    assert R.covered_by(line, poly) == _is_empty_g(diff)


@settings(max_examples=60, deadline=None)
@given(convex_polygon(), st.lists(point, min_size=1, max_size=5, unique=True))
def test_relate_overlay_consistency_puntal(poly, pts):
    mp = W.Geom("multipoint", [np.array(pts, dtype=np.float64)])
    inter = M.overlay_mixed(mp, poly, "intersection")
    diff = M.overlay_mixed(mp, poly, "difference")
    assert R.intersects(mp, poly) == (not _is_empty_g(inter))
    assert R.covered_by(mp, poly) == _is_empty_g(diff)


def _is_empty_g(g) -> bool:
    return len(g.all_coords()) == 0


def test_mixed_overlay_empty_inputs():
    POLY4 = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    cases = [
        ("POINT EMPTY", POLY4, "intersection", "MULTIPOINT EMPTY"),
        ("POINT EMPTY", POLY4, "union", POLY4),
        ("POINT (1 1)", "POLYGON EMPTY", "difference", "POINT (1 1)"),
        ("POINT (1 1)", "POLYGON EMPTY", "intersection", "MULTIPOINT EMPTY"),
        ("LINESTRING (0 0, 3 3)", "POLYGON EMPTY", "union", "LINESTRING (0 0, 3 3)"),
        ("LINESTRING EMPTY", POLY4, "intersection", "MULTILINESTRING EMPTY"),
        ("POINT EMPTY", "POINT EMPTY", "union", "MULTIPOINT EMPTY"),
    ]
    for a, b, op, want in cases:
        got = W.to_wkt(M.overlay_mixed(W.from_wkt(a), W.from_wkt(b), op))
        assert got == want, (a, op, b, got, want)
