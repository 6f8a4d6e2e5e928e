"""Attribute long-tail kernels: minimum bounding circle, minimum rotated
rectangle, geometric median, validity, Delaunay/Voronoi, concave hull,
point-on-surface.

Reference: ``geometry/attribute/`` (MinimumBoundingCircle(+Center/Radius),
MinimumRectangle, MinimumDiameter, GeometricMedian, IsValid(Reason),
PointOnSurface — 46 files) and ``geometry/transform/
{DelaunayTriangles,VoronoiDiagram}.java``; ConcaveHull vendored from
``org/opensphere/geometry/algorithm/ConcaveHull.java`` (χ-shape on the
Delaunay triangulation — same construction here, from scratch).
"""

from __future__ import annotations

import numpy as np

from .kernel import convex_hull, ring_area


# ------------------------------------------------- minimum bounding circle --


def circle_from_2(a, b) -> tuple:
    cx, cy = (a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0
    dx, dy = a[0] - cx, a[1] - cy
    return cx, cy, dx * dx + dy * dy  # (center, radius²)


def circle_from_3(a, b, c) -> tuple:
    """Circumcircle (center, radius²); collinear → huge circle sentinel."""
    d = 2.0 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
    if d == 0.0:
        return 0.0, 0.0, np.inf
    a2 = a[0] * a[0] + a[1] * a[1]
    b2 = b[0] * b[0] + b[1] * b[1]
    c2 = c[0] * c[0] + c[1] * c[1]
    ux = (a2 * (b[1] - c[1]) + b2 * (c[1] - a[1]) + c2 * (a[1] - b[1])) / d
    uy = (a2 * (c[0] - b[0]) + b2 * (a[0] - c[0]) + c2 * (b[0] - a[0])) / d
    dx, dy = a[0] - ux, a[1] - uy
    return ux, uy, dx * dx + dy * dy


def _in_circle(c, p, eps=1e-9) -> bool:
    dx, dy = p[0] - c[0], p[1] - c[1]
    return dx * dx + dy * dy <= c[2] * (1 + eps) + eps


def min_bounding_circle(coords: np.ndarray) -> tuple:
    """(cx, cy, r) minimal enclosing circle — Welzl's move-to-front on the
    deterministic input order (no RNG: resumable/deterministic plans)."""
    pts = [tuple(p) for p in np.asarray(coords, dtype=np.float64)[:, :2]]
    # deterministic de-dup preserving order
    seen = set()
    P = [p for p in pts if not (p in seen or seen.add(p))]
    if not P:
        return np.nan, np.nan, np.nan
    if len(P) == 1:
        return P[0][0], P[0][1], 0.0

    def welzl(points, boundary):
        if not points or len(boundary) == 3:
            if len(boundary) == 0:
                return (0.0, 0.0, -1.0)
            if len(boundary) == 1:
                return (boundary[0][0], boundary[0][1], 0.0)
            if len(boundary) == 2:
                return circle_from_2(*boundary)
            return circle_from_3(*boundary)
        p = points[0]
        c = welzl(points[1:], boundary)
        if c[2] >= 0 and _in_circle(c, p):
            return c
        return welzl(points[1:], boundary + [p])

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, len(P) * 2 + 100))
    try:
        cx, cy, r2 = welzl(P, [])
    finally:
        sys.setrecursionlimit(old)
    return float(cx), float(cy), float(np.sqrt(r2))


# --------------------------------------------- minimum rotated rectangle ---


def minimum_rectangle(coords: np.ndarray) -> tuple:
    """(ring (5,2), width, height) of the minimum-area rotated rectangle —
    rotating calipers over the convex hull."""
    hull = convex_hull(coords)
    h = hull[:-1] if len(hull) >= 2 and (hull[0] == hull[-1]).all() else hull
    if len(h) == 1:
        p = h[0]
        ring = np.tile(p, (5, 1))
        return ring, 0.0, 0.0
    if len(h) == 2:
        ring = np.array([h[0], h[1], h[1], h[0], h[0]])
        return ring, float(np.hypot(*(h[1] - h[0]))), 0.0
    best = None
    for i in range(len(h)):
        e = h[(i + 1) % len(h)] - h[i]
        L = np.hypot(e[0], e[1])
        if L == 0:
            continue
        ux, uy = e / L
        # rotate points into edge frame
        xs = h[:, 0] * ux + h[:, 1] * uy
        ys = -h[:, 0] * uy + h[:, 1] * ux
        w = xs.max() - xs.min()
        hh = ys.max() - ys.min()
        area = w * hh
        if best is None or area < best[0]:
            corners_f = np.array(
                [
                    [xs.min(), ys.min()],
                    [xs.max(), ys.min()],
                    [xs.max(), ys.max()],
                    [xs.min(), ys.max()],
                    [xs.min(), ys.min()],
                ]
            )
            ring = np.column_stack(
                [
                    corners_f[:, 0] * ux - corners_f[:, 1] * uy,
                    corners_f[:, 0] * uy + corners_f[:, 1] * ux,
                ]
            )
            best = (area, ring, float(w), float(hh))
    return best[1], best[2], best[3]


# ------------------------------------------------------- geometric median --


def geometric_median(coords: np.ndarray, iters: int = 200, tol: float = 1e-12) -> tuple:
    """Weiszfeld iteration (deterministic, fixed max iterations)."""
    pts = np.asarray(coords, dtype=np.float64)[:, :2]
    cur = pts.mean(axis=0)
    for _ in range(iters):
        d = np.sqrt(((pts - cur) ** 2).sum(axis=1))
        if (d < 1e-300).any():
            break
        w = 1.0 / d
        nxt = (pts * w[:, None]).sum(axis=0) / w.sum()
        if np.hypot(*(nxt - cur)) < tol:
            cur = nxt
            break
        cur = nxt
    return float(cur[0]), float(cur[1])


# ---------------------------------------------------------------- validity --


def is_valid_reason(g) -> str:
    """'Valid Geometry' or a reason string (PostGIS ST_IsValidReason shape).
    Checks: ring arity/closure, duplicate consecutive points, ring
    self-intersection, holes inside the exterior."""
    from .kernel import edges_intersect_any, points_in_polygon

    for rings in g.polygons() or []:
        for k, r in enumerate(rings):
            if len(r) < 4:
                return f"Too few points in ring {k}"
            if not (r[0] == r[-1]).all():
                return f"Ring {k} is not closed"
            body = r[:-1]
            if len(np.unique(body[:, :2], axis=0)) != len(body):
                return f"Repeated point in ring {k}"
            # self-intersection: split into two halves and cross-test, plus
            # adjacent-edge overlap via non-neighbour pair scan
            if _ring_self_intersects(r[:, :2]):
                return f"Self-intersection in ring {k}"
        for k, hole in enumerate(rings[1:], start=1):
            ins = points_in_polygon(hole[:, 0], hole[:, 1], rings[0])
            on_b = _all_on_boundary(hole, rings[0])
            if not ins.any() and not on_b:
                return f"Hole {k} lies outside shell"
    return "Valid Geometry"


def _all_on_boundary(hole, shell) -> bool:
    return False  # conservative; vertex-on-boundary holes stay "outside"


def _ring_self_intersects(r: np.ndarray) -> bool:
    from .kernel import segments_intersect

    n = len(r) - 1  # closed ring
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or (i + 1) % n == j or (j + 1) % n == i:
                continue
            if segments_intersect(r[i], r[i + 1], r[j], r[j + 1]):
                return True
    return False


def is_valid(g) -> bool:
    return is_valid_reason(g) == "Valid Geometry"


# ----------------------------------------------------- Delaunay / Voronoi --


def delaunay(coords: np.ndarray) -> list:
    """Bowyer–Watson Delaunay triangulation → list of (i, j, k) vertex-index
    triangles (deterministic insertion order)."""
    pts = np.asarray(coords, dtype=np.float64)[:, :2]
    pts = np.unique(pts, axis=0)
    n = len(pts)
    if n < 3:
        return [], pts
    # super-triangle
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 100
    sup = np.array([[cx - 2 * span, cy - span], [cx + 2 * span, cy - span], [cx, cy + 2 * span]])
    allp = np.vstack([pts, sup])
    tris = [(n, n + 1, n + 2)]

    def circum(t):
        return circle_from_3(allp[t[0]], allp[t[1]], allp[t[2]])

    circles = {tris[0]: circum(tris[0])}
    for pi in range(n):
        p = allp[pi]
        bad = [t for t in tris if _in_circle_strict(circles[t], p)]
        edges: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edges[key] = edges.get(key, 0) + 1
        boundary = [e for e, cnt in edges.items() if cnt == 1]
        for t in bad:
            tris.remove(t)
            del circles[t]
        for a, b in boundary:
            t = (a, b, pi)
            tris.append(t)
            circles[t] = circum(t)
    out = []
    for t in tris:
        if all(v < n for v in t):
            out.append(tuple(sorted(t)))
    return sorted(set(out)), pts


def _in_circle_strict(c, p) -> bool:
    # inclusive within a relative tolerance: a point exactly ON a
    # circumcircle (cocircular degeneracy, e.g. square corners) must count
    # as inside or Bowyer–Watson emits overlapping triangles
    dx, dy = p[0] - c[0], p[1] - c[1]
    return dx * dx + dy * dy <= c[2] * (1 + 1e-12)


def voronoi_cells(coords: np.ndarray) -> list:
    """Voronoi vertices per input point (dual of Delaunay: circumcenters of
    incident triangles, angularly sorted) — unbounded cells are returned as
    the sorted circumcenter fan (clip to an envelope downstream)."""
    tris, pts = delaunay(coords)
    centers = {}
    for t in tris:
        c = circle_from_3(pts[t[0]], pts[t[1]], pts[t[2]])
        centers[t] = (c[0], c[1])
    cells = []
    for i in range(len(pts)):
        cs = [centers[t] for t in tris if i in t]
        if not cs:
            cells.append((tuple(pts[i]), []))
            continue
        arr = np.array(cs)
        ang = np.arctan2(arr[:, 1] - pts[i][1], arr[:, 0] - pts[i][0])
        order = np.argsort(ang)
        cells.append((tuple(pts[i]), [tuple(arr[k]) for k in order]))
    return cells


def voronoi_diagram(coords: np.ndarray) -> list:
    """Bounded Voronoi cells — JTS ``VoronoiDiagramBuilder`` semantics
    (VoronoiPolygons.java delegates to it): each site's cell is the clip
    envelope (site bounding box expanded by ``max(width, height)`` on every
    side, min 1.0 for degenerate extents) intersected with the half-planes
    closer to the site than to every other site (Sutherland–Hodgman clip).
    Exact for ANY site count ≥ 1 — no triangulation degeneracies.  O(n²)
    per call; this is a per-row small-n geometry kernel, the distributed
    path never funnels a table through it.

    Returns ``[(site_xy, closed_ring ndarray), ...]`` in site order."""
    pts = np.unique(np.asarray(coords, dtype=np.float64)[:, :2], axis=0)
    n = len(pts)
    if n == 0:
        return []
    mn, mx = pts.min(axis=0), pts.max(axis=0)
    expand = max(mx[0] - mn[0], mx[1] - mn[1], 1.0)
    x0, y0 = mn - expand
    x1, y1 = mx + expand
    cells = []
    for i in range(n):
        poly = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64
        )
        si = pts[i]
        for j in range(n):
            if j == i or len(poly) == 0:
                continue
            # keep the half-plane closer to site i: (p - m)·d <= 0,
            # d = sj - si, m = midpoint of the two sites
            d = pts[j] - si
            m = (pts[j] + si) / 2.0
            side = (poly - m) @ d
            nxt = np.roll(poly, -1, axis=0)
            side_n = np.roll(side, -1)
            out_pts = []
            for k in range(len(poly)):
                if side[k] <= 0:
                    out_pts.append(poly[k])
                if (side[k] <= 0) != (side_n[k] <= 0):
                    t = side[k] / (side[k] - side_n[k])
                    out_pts.append(poly[k] + t * (nxt[k] - poly[k]))
            poly = np.array(out_pts) if out_pts else np.empty((0, 2))
        if len(poly) >= 3:
            cells.append((tuple(si), np.vstack([poly, poly[:1]])))
    return cells


def concave_hull(coords: np.ndarray, length_threshold: float) -> np.ndarray:
    """χ-shape concave hull: Delaunay triangulation, then iteratively remove
    boundary edges longer than the threshold while the boundary stays a
    simple ring (reference's vendored opensphere ConcaveHull construction).
    Returns a closed ring."""
    tris, pts = delaunay(coords)
    if not tris:
        return convex_hull(coords)
    tri_set = set(tris)

    def boundary_edges(tset):
        cnt: dict = {}
        for t in tset:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                cnt[key] = cnt.get(key, 0) + 1
        return {e for e, c in cnt.items() if c == 1}

    changed = True
    while changed:
        changed = False
        bedges = boundary_edges(tri_set)
        # longest first, deterministic tie-break on indices
        cand = sorted(
            bedges,
            key=lambda e: (-float(np.hypot(*(pts[e[0]] - pts[e[1]]))), e),
        )
        for e in cand:
            elen = float(np.hypot(*(pts[e[0]] - pts[e[1]])))
            if elen <= length_threshold:
                break
            owner = [t for t in tri_set if e[0] in t and e[1] in t]
            if len(owner) != 1:
                continue
            t = owner[0]
            third = [v for v in t if v not in e][0]
            # removal is regular only if the third vertex is interior
            # (not already on the boundary) — keeps the ring simple
            on_boundary = any(third in be for be in bedges)
            if on_boundary:
                continue
            tri_set.remove(t)
            changed = True
            break
    # stitch boundary edges into a ring
    bedges = boundary_edges(tri_set)
    adj: dict = {}
    for a, b in bedges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    start = min(adj)
    ring = [start]
    prev, cur = None, start
    while True:
        nbrs = [v for v in adj[cur] if v != prev]
        if not nbrs:
            break
        nxt = nbrs[0]
        if nxt == start:
            break
        ring.append(nxt)
        prev, cur = cur, nxt
        if len(ring) > len(bedges) + 1:
            break
    out = pts[ring]
    return np.vstack([out, out[:1]])
