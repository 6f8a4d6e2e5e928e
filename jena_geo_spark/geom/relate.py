"""DE-9IM relate + the full topological predicate family, from scratch.

Reference surface: ``geof:relate`` / ``IntersectionMatrix.java`` and the
predicate registrations ``PostGISConfig.java:455-474,689`` (sfEquals /
sfTouches / sfCrosses / sfOverlaps / covers / coveredBy, RCC8 aliases);
JTS ``RelateOp`` is the semantic model.  Replaces the r1
"vertex-conservative" predicates (VERDICT "What's missing" #1).

Method: every interior/boundary pairing is decided EXACTLY by splitting
each 1-D component at all intersections with the other geometry and
classifying split midpoints / vertices (between split points the
classification is constant); 2-D pairings use the boolean-overlay kernel
(area > 0 tests).  Supported kinds: (multi)point, (multi)linestring,
(multi)polygon, in any combination.

Matrix string order: II IB IE / BI BB BE / EI EB EE with values
F, 0, 1, 2 (dimension of the intersection).
"""

from __future__ import annotations

import numpy as np

from . import kernel as K
from . import overlay as O

_F = -1  # dimension of an empty intersection


def _dimch(d: int) -> str:
    return "F" if d < 0 else str(d)


# ---------------------------------------------------------- point locating --


def _on_edge(px: float, py: float, ax, ay, bx, by) -> bool:
    rx, ry = bx - ax, by - ay
    qx, qy = px - ax, py - ay
    cross = rx * qy - ry * qx
    # scale-relative exactness, not cross != 0: the sweep's sub-segment
    # MIDPOINTS are float averages, so a midpoint's position carries an
    # absolute error ~eps·|coordinate| (e.g. 8.6e-15 at x≈77) and an exact
    # test mislabels the line's own interior as exterior (found by
    # EqualTopoTest.java: a closed decimal triangle was not equalsTopo to
    # itself).  Tolerated off-line distance = 8·eps·max|coord| (sub-ulp at
    # the data's own scale); cross = distance × |AB|.
    scale = max(abs(ax), abs(ay), abs(bx), abs(by), abs(px), abs(py))
    tol = 8.0 * 2.220446049250313e-16 * scale * (rx * rx + ry * ry) ** 0.5
    if abs(cross) > tol:
        return False
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def _point_on_chains(px: float, py: float, chains: list) -> bool:
    for c in chains:
        for i in range(len(c) - 1):
            if _on_edge(px, py, c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1]):
                return True
    return False


def _locate_in_areal(px: float, py: float, g) -> str:
    """'interior' | 'boundary' | 'exterior' of a (multi)polygon, holes
    respected (union over members)."""
    if _point_on_chains(px, py, g.chains()):
        return "boundary"
    for rings in g.polygons():
        ins = bool(K.points_in_polygon(np.array([px]), np.array([py]), rings[0])[0])
        for hole in rings[1:]:
            ins &= not bool(K.points_in_polygon(np.array([px]), np.array([py]), hole)[0])
        if ins:
            return "interior"
    return "exterior"


def _line_boundary_points(g) -> list:
    """JTS mod-2 rule: chain endpoints occurring an odd number of times.
    Closed rings have no boundary."""
    from collections import Counter

    cnt: Counter = Counter()
    for c in g.chains():
        if len(c) >= 2 and (c[0] == c[-1]).all():
            continue
        cnt[(float(c[0, 0]), float(c[0, 1]))] += 1
        cnt[(float(c[-1, 0]), float(c[-1, 1]))] += 1
    return [p for p, n in cnt.items() if n % 2 == 1]


def _locate_in_lineal(px: float, py: float, g) -> str:
    if not _point_on_chains(px, py, g.chains()):
        return "exterior"
    for bx, by in _line_boundary_points(g):
        if px == bx and py == by:
            return "boundary"
    return "interior"


def _locate_in_puntal(px: float, py: float, g) -> str:
    pts = g.all_coords()
    if len(pts) and bool(((pts[:, 0] == px) & (pts[:, 1] == py)).any()):
        return "interior"
    return "exterior"


def _dim_class(g) -> int:
    if g.kind in ("point", "multipoint"):
        return 0
    if g.kind in ("linestring", "multilinestring"):
        return 1
    return 2


def locate(px: float, py: float, g) -> str:
    d = _dim_class(g)
    if d == 0:
        return _locate_in_puntal(px, py, g)
    if d == 1:
        return _locate_in_lineal(px, py, g)
    return _locate_in_areal(px, py, g)


# ------------------------------------------------------------- splitting ---


def _seg_intersection_ts(ax, ay, bx, by, cx, cy, dx, dy) -> list:
    """Parameter values t on segment AB where it meets segment CD
    (crossings, endpoint hits, and collinear-overlap endpoints)."""
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    den = rx * sy - ry * sx
    out = []
    if den == 0.0:
        # parallel: collinear overlap endpoints project onto AB
        if (cx - ax) * ry - (cy - ay) * rx == 0.0:
            rr = rx * rx + ry * ry
            if rr > 0:
                for qx, qy in ((cx, cy), (dx, dy)):
                    t = ((qx - ax) * rx + (qy - ay) * ry) / rr
                    if 0.0 < t < 1.0:
                        out.append(t)
        return out
    t = ((cx - ax) * sy - (cy - ay) * sx) / den
    u = ((cx - ax) * ry - (cy - ay) * rx) / den
    if 0.0 < t < 1.0 and 0.0 <= u <= 1.0:
        out.append(t)
    return out


def _split_points_on_chain(chain: np.ndarray, other_chains: list, other_points=None) -> list:
    """Vertices, split points, and sub-segment midpoints of ``chain`` after
    splitting at every intersection with ``other_chains`` (and at any 0-dim
    ``other_points`` lying on a segment).  Returns [(x, y, dim0)] where
    dim0=True for vertices/split points (witness dimension 0) and False for
    midpoints (witness their whole sub-segment, dimension 1) — between
    split points the classification is constant, so this is EXACT."""
    out = []
    for i in range(len(chain) - 1):
        ax, ay = float(chain[i, 0]), float(chain[i, 1])
        bx, by = float(chain[i + 1, 0]), float(chain[i + 1, 1])
        out.append((ax, ay, True))
        ts = {0.0, 1.0}
        for oc in other_chains:
            if len(oc) == 1:  # 0-dim part riding in a chain list
                continue
            for j in range(len(oc) - 1):
                for t in _seg_intersection_ts(
                    ax, ay, bx, by,
                    float(oc[j, 0]), float(oc[j, 1]),
                    float(oc[j + 1, 0]), float(oc[j + 1, 1]),
                ):
                    ts.add(t)
        for qx, qy in other_points or []:
            if _on_edge(qx, qy, ax, ay, bx, by):
                rr = (bx - ax) ** 2 + (by - ay) ** 2
                if rr > 0:
                    t = ((qx - ax) * (bx - ax) + (qy - ay) * (by - ay)) / rr
                    if 0.0 < t < 1.0:
                        ts.add(t)
        ts = sorted(ts)
        for k, (t0, t1) in enumerate(zip(ts[:-1], ts[1:])):
            if t0 not in (0.0, 1.0):
                out.append((ax + t0 * (bx - ax), ay + t0 * (by - ay), True))
            tm = (t0 + t1) / 2.0
            out.append((ax + tm * (bx - ax), ay + tm * (by - ay), False))
    if len(chain):
        out.append((float(chain[-1, 0]), float(chain[-1, 1]), True))
    return out


# ------------------------------------------------------------- the matrix ---

_LOC = {"interior": 0, "boundary": 1, "exterior": 2}


def _sweep_samples(g, other):
    """Yield (x, y, role, dim) witness samples of geometry ``g`` split
    against geometry ``other``.  role 0 = interior, 1 = boundary.
    Between split points the location in the other geometry is constant,
    so midpoints witness their whole sub-segment (dim 1) exactly."""
    d = _dim_class(g)
    other_chains = other.chains()
    other_points = (
        [(float(x), float(y)) for x, y in other.all_coords()]
        if _dim_class(other) == 0
        else None
    )
    if d == 0:
        for px, py in g.all_coords():
            yield float(px), float(py), 0, 0
        return
    if d == 1:
        bset = set(_line_boundary_points(g))
        for chain in g.chains():
            for px, py, dim0 in _split_points_on_chain(chain, other_chains, other_points):
                if (px, py) in bset:
                    yield px, py, 1, 0
                else:
                    yield px, py, 0, (0 if dim0 else 1)
        return
    # areal: the 1-D sweep covers the BOUNDARY rings; interior entries are
    # resolved by area tests in relate()
    for chain in g.chains():
        for px, py, dim0 in _split_points_on_chain(chain, other_chains, other_points):
            yield px, py, 1, (0 if dim0 else 1)


def _boundary_dim(g) -> int:
    """Exact boundary dimension: 1 for areal, 0 for lineal with mod-2
    boundary points (F for closed rings), F for puntal."""
    d = _dim_class(g)
    if d == 2:
        return 1
    if d == 1:
        return 0 if _line_boundary_points(g) else _F
    return _F


def relate(ga, gb) -> str:
    """DE-9IM matrix string of two geometries (II IB IE BI BB BE EI EB EE).

    Areal interior∩interior / interior∩exterior entries use boolean-overlay
    area tests on the EXTERIOR rings (holes are honoured by the point
    sweeps but not by the areal×areal area tests — documented limitation).
    """
    da, db = _dim_class(ga), _dim_class(gb)
    m = [[_F] * 3 for _ in range(3)]
    m[2][2] = 2  # two bounded geometries: exteriors always share the plane

    # Empty inputs (JTS RelateOp): an empty side contributes no interior or
    # boundary, so its rows/columns stay F; the non-empty side's interior
    # and boundary land in the empty side's exterior.  Matches PostGIS
    # ST_Relate('POINT EMPTY', poly) = 'FFFFFF212'.  (Boundary dim for a
    # closed line is empty by the mod-2 rule — simplified to the open-line
    # 0 here, documented.)
    ca, cb = ga.all_coords(), gb.all_coords()
    ea, eb = len(ca) == 0, len(cb) == 0
    if ea or eb:
        _bdim = {0: _F, 1: 0, 2: 1}
        if not ea:  # A nonempty → its I/B intersect B's exterior
            m[0][2] = da
            m[1][2] = _bdim[da]
        if not eb:
            m[2][0] = db
            m[2][1] = _bdim[db]
        return "".join("F" if v == _F else str(v) for row in m for v in row)

    # envelope short-circuit (what JTS RelateOp gets from its envelope
    # check): strictly disjoint bounding boxes determine every entry
    # without sweeping — I/B of each side fall entirely in the other's
    # exterior.  Strict < so touching envelopes (possible corner contact)
    # still take the exact sweep.  This is what makes scattered-pair
    # relate batches (the rcc8*/eh* join families) scale: the common
    # far-apart pair costs two bbox reductions, not a quadratic sweep.
    if (
        float(ca[:, 0].max()) < float(cb[:, 0].min())
        or float(cb[:, 0].max()) < float(ca[:, 0].min())
        or float(ca[:, 1].max()) < float(cb[:, 1].min())
        or float(cb[:, 1].max()) < float(ca[:, 1].min())
    ):
        m[0][2] = da
        m[1][2] = _boundary_dim(ga)
        m[2][0] = db
        m[2][1] = _boundary_dim(gb)
        return "".join(_dimch(m[r][c]) for r in range(3) for c in range(3))

    # sweep A against B → (I/B of A) row × located column in B
    for px, py, role, dim in _sweep_samples(ga, gb):
        col = _LOC[locate(px, py, gb)]
        m[role][col] = max(m[role][col], dim)
    # sweep B against A → located row in A × (I/B of B) column
    for px, py, role, dim in _sweep_samples(gb, ga):
        row = _LOC[locate(px, py, ga)]
        m[row][role] = max(m[row][role], dim)

    # 2-D entries the 1-D sweeps cannot witness.  When the overlay kernel
    # had to perturb (degenerate shared boundaries, e.g. equal polygons),
    # its output carries sliver areas of order perimeter·rel·span — the
    # tolerance below absorbs them (documented: areal×areal interior tests
    # cannot distinguish true overlaps smaller than ~1e-5·bbox²).
    if da == 2 and db == 2:
        ra, rb = ga.exterior(), gb.exterior()
        span = max(
            float(np.ptp(ra[:, 0])), float(np.ptp(ra[:, 1])),
            float(np.ptp(rb[:, 0])), float(np.ptp(rb[:, 1])), 1e-300,
        )
        for (s, c, op, r_, c_) in (
            (ra, rb, "intersection", 0, 0),
            (ra, rb, "difference", 0, 2),
            (rb, ra, "difference", 2, 0),
        ):
            area = O.overlay_area(s, c, op)
            tol = 0.0 if O.last_perturbation == 0.0 else 64.0 * O.last_perturbation * span * span
            if area > tol:
                m[r_][c_] = 2
    elif da == 2:
        m[0][2] = 2  # a ≤1-D B can never cover A's 2-D interior
    elif db == 2:
        m[2][0] = 2

    return "".join(_dimch(m[r][c]) for r in range(3) for c in range(3))


# ------------------------------------------------------------- predicates ---


def relate_match(matrix: str, pattern: str) -> bool:
    """OGC relate-pattern match: T = any non-F, F = empty, * = anything,
    0/1/2 = exact dimension."""
    for mc, pc in zip(matrix, pattern):
        if pc == "*":
            continue
        if pc in ("T", "t"):
            if mc == "F":
                return False
        elif pc in ("F", "f"):
            if mc != "F":
                return False
        elif mc != pc:
            return False
    return True


def equals_topo(ga, gb) -> bool:
    return relate_match(relate(ga, gb), "T*F**FFF*") and _dim_class(ga) == _dim_class(gb)


def touches(ga, gb) -> bool:
    mx = relate(ga, gb)
    return (
        relate_match(mx, "FT*******")
        or relate_match(mx, "F**T*****")
        or relate_match(mx, "F***T****")
    )


def crosses(ga, gb) -> bool:
    da, db = _dim_class(ga), _dim_class(gb)
    mx = relate(ga, gb)
    if da < db:
        return relate_match(mx, "T*T******")
    if da > db:
        return relate_match(mx, "T*****T**")
    if da == 1 and db == 1:
        return relate_match(mx, "0********")
    return False


def overlaps(ga, gb) -> bool:
    da, db = _dim_class(ga), _dim_class(gb)
    if da != db:
        return False
    mx = relate(ga, gb)
    if da == 1:
        return relate_match(mx, "1*T***T**")
    return relate_match(mx, "T*T***T**")


def contains(ga, gb) -> bool:
    return relate_match(relate(ga, gb), "T*****FF*")


def within(ga, gb) -> bool:
    return contains(gb, ga)


def covers(ga, gb) -> bool:
    mx = relate(ga, gb)
    return (
        relate_match(mx, "T*****FF*")
        or relate_match(mx, "*T****FF*")
        or relate_match(mx, "***T**FF*")
        or relate_match(mx, "****T*FF*")
    )


def covered_by(ga, gb) -> bool:
    return covers(gb, ga)


def intersects(ga, gb) -> bool:
    return not relate_match(relate(ga, gb), "FF*FF****")


def disjoint(ga, gb) -> bool:
    return not intersects(ga, gb)
