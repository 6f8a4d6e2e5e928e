"""Distance long-tail kernels: Hausdorff, Fréchet (discrete + continuous),
MaxDistance, Closest/Furthest points, CentroidDistance.

Reference: ``geometry/relation/HausdorffDistance.java`` (JTS discrete
Hausdorff), ``FrechetDistance.java`` → vendored
``heigit/ors/util/FrechetDistance.java`` (Alt–Godau critical-value binary
search; the vendored code enumerates type-1 endpoint and type-2
vertex–edge critical values — type-3 bisector values are omitted there,
and so here, for parity), ``MaxDistance.java`` / ``LongestLineTest`` (max
vertex-pair distance), ``ClosestPoint.java`` / ``ShortestLine.java``
(JTS ``DistanceOp.nearestPoints``).

Goldens reproduced in tests: Hausdorff(LINESTRING(0 0,2 0),
MULTIPOINT(0 1,1 0,2 1)) = 1.0; Frechet(g3,g4) = 10.0;
MaxDistance = 76.37541489249011.
"""

from __future__ import annotations

import numpy as np

from .kernel import point_segment_dist_sq


def _point_to_chains_sq(px: float, py: float, chains: list) -> float:
    best = np.inf
    for c in chains:
        if len(c) == 1:
            best = min(best, float((px - c[0, 0]) ** 2 + (py - c[0, 1]) ** 2))
            continue
        for i in range(len(c) - 1):
            d = point_segment_dist_sq(
                np.array([px]), np.array([py]), c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1]
            )
            best = min(best, float(d[0]))
    return best


def hausdorff(ga, gb) -> float:
    """Discrete (vertex-to-geometry) Hausdorff distance, both orientations
    (JTS ``DiscreteHausdorffDistance`` with densifyFraction unset);
    None (SQL NULL) when either operand is empty — not inf/0."""
    if ga.is_empty or gb.is_empty:
        return None
    ca, cb = ga.chains(), gb.chains()
    best = 0.0
    for pts, chains in ((ga.all_coords(), cb), (gb.all_coords(), ca)):
        for v in pts:  # XY only — Z/M ordinates don't enter the metric
            best = max(best, _point_to_chains_sq(float(v[0]), float(v[1]), chains))
    return float(np.sqrt(best))


def max_distance(ga, gb) -> float:
    """Max vertex-pair distance (reference ``MaxDistance.java`` golden);
    None (SQL NULL) when either operand is empty."""
    a = ga.all_coords()
    b = gb.all_coords()
    if not len(a) or not len(b):
        return None
    dx = a[:, 0][:, None] - b[:, 0][None, :]
    dy = a[:, 1][:, None] - b[:, 1][None, :]
    return float(np.sqrt((dx * dx + dy * dy).max()))


def furthest_pair(ga, gb) -> tuple:
    a = ga.all_coords()
    b = gb.all_coords()
    dx = a[:, 0][:, None] - b[:, 0][None, :]
    dy = a[:, 1][:, None] - b[:, 1][None, :]
    i, j = np.unravel_index(np.argmax(dx * dx + dy * dy), (len(a), len(b)))
    return (float(a[i, 0]), float(a[i, 1])), (float(b[j, 0]), float(b[j, 1]))


def nearest_points(ga, gb) -> tuple:
    """((ax, ay), (bx, by)) realizing the min distance (JTS ``DistanceOp
    .nearestPoints`` semantics: vertex-to-segment projections both ways)."""
    best = np.inf
    pa = pb = (np.nan, np.nan)
    ca, cb = ga.chains(), gb.chains()

    def seg_proj(px, py, ax, ay, bx, by):
        dx, dy = bx - ax, by - ay
        ll = dx * dx + dy * dy
        t = 0.0 if ll == 0 else min(max(((px - ax) * dx + (py - ay) * dy) / ll, 0.0), 1.0)
        cx, cy = ax + t * dx, ay + t * dy
        return (px - cx) ** 2 + (py - cy) ** 2, (cx, cy)

    for va in ga.all_coords():
        px, py = float(va[0]), float(va[1])
        for c in cb:
            if len(c) == 1:
                d = (px - c[0, 0]) ** 2 + (py - c[0, 1]) ** 2
                if d < best:
                    best, pa, pb = d, (px, py), (float(c[0, 0]), float(c[0, 1]))
                continue
            for i in range(len(c) - 1):
                d, q = seg_proj(px, py, c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1])
                if d < best:
                    best, pa, pb = d, (px, py), q
    for vb in gb.all_coords():
        px, py = float(vb[0]), float(vb[1])
        for c in ca:
            if len(c) == 1:
                d = (px - c[0, 0]) ** 2 + (py - c[0, 1]) ** 2
                if d < best:
                    best, pa, pb = d, (float(c[0, 0]), float(c[0, 1])), (px, py)
                continue
            for i in range(len(c) - 1):
                d, q = seg_proj(px, py, c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1])
                if d < best:
                    best, pa, pb = d, q, (px, py)
    return pa, pb


def nearest_coordinate_pair(ga, gb) -> tuple:
    """((ax, ay), (bx, by)): the planar-nearest pair of VERTICES, one from
    each geometry — the reference's ``CoordinatePair.findNearestPair``
    (``GeometryWrapper.java:616-618``: "the nearest pair of coordinates
    from each Geometry using Euclidean distance"), which its great-circle
    distance then feeds to Vincenty.  Vertex-to-vertex only (no segment
    projection), matching the reference exactly."""
    a = np.asarray(ga.all_coords(), dtype=np.float64)[:, :2]
    b = np.asarray(gb.all_coords(), dtype=np.float64)[:, :2]
    d2 = (
        (a[:, 0][:, None] - b[:, 0][None, :]) ** 2
        + (a[:, 1][:, None] - b[:, 1][None, :]) ** 2
    )
    i, j = np.unravel_index(np.argmin(d2), d2.shape)
    return (float(a[i, 0]), float(a[i, 1])), (float(b[j, 0]), float(b[j, 1]))


def frechet_discrete(p: np.ndarray, q: np.ndarray) -> float:
    """Discrete Fréchet distance (Eiter–Mannila coupling DP)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    n, m = len(p), len(q)
    d = np.sqrt(
        (p[:, 0][:, None] - q[:, 0][None, :]) ** 2
        + (p[:, 1][:, None] - q[:, 1][None, :]) ** 2
    )
    ca = np.full((n, m), np.inf)
    ca[0, 0] = d[0, 0]
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        for j in range(1, m):
            ca[i, j] = max(min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1]), d[i, j])
    return float(ca[n - 1, m - 1])


def _free_interval(p1, p2, q, eps) -> tuple:
    """[t0, t1] ⊆ [0,1] of segment p1p2 within distance eps of point q
    (empty → (1.0, 0.0))."""
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    a = dx * dx + dy * dy
    fx, fy = p1[0] - q[0], p1[1] - q[1]
    if a == 0:
        d2 = fx * fx + fy * fy
        return (0.0, 1.0) if d2 <= eps * eps else (1.0, 0.0)
    b = 2 * (fx * dx + fy * dy)
    c = fx * fx + fy * fy - eps * eps
    disc = b * b - 4 * a * c
    if disc < 0:
        return (1.0, 0.0)
    s = np.sqrt(disc)
    t0 = max((-b - s) / (2 * a), 0.0)
    t1 = min((-b + s) / (2 * a), 1.0)
    if t0 > t1:
        return (1.0, 0.0)
    return (t0, t1)


_EMPTY = (1.0, -1.0)


def _nonempty(iv) -> bool:
    return iv[0] <= iv[1]


def _frechet_decision(p: np.ndarray, q: np.ndarray, eps: float) -> bool:
    """Alt–Godau free-space diagram reachability: Fréchet(p, q) ≤ eps?

    Cell (i, j) spans P-segment i (horizontal axis) × Q-segment j
    (vertical).  L[i][j] = free interval on the cell's left edge (on
    Q-segment j vs vertex P[i]); B[i][j] = bottom edge (on P-segment i vs
    vertex Q[j]).  Within a convex free cell, a monotone path from a left-
    edge point at height t reaches any right-edge point ≥ the left
    interval's low end; from the bottom edge any right-edge point.
    """
    tol = 1e-12
    n, m = len(p) - 1, len(q) - 1
    if float(np.hypot(*(p[0] - q[0]))) > eps or float(np.hypot(*(p[-1] - q[-1]))) > eps:
        return False
    if n == 0 and m == 0:
        return True
    if n == 0:  # P is a point: every Q vertex must be within eps
        return bool(
            (np.sqrt((q[:, 0] - p[0, 0]) ** 2 + (q[:, 1] - p[0, 1]) ** 2) <= eps + tol).all()
        )
    if m == 0:
        return bool(
            (np.sqrt((p[:, 0] - q[0, 0]) ** 2 + (p[:, 1] - q[0, 1]) ** 2) <= eps + tol).all()
        )

    L = [[_free_interval(q[j], q[j + 1], p[i], eps) for j in range(m)] for i in range(n + 1)]
    B = [[_free_interval(p[i], p[i + 1], q[j], eps) for j in range(m + 1)] for i in range(n)]

    # LR[i][j]: reachable part of left edge of cell (i, j); BR: bottom edge
    LR = [[_EMPTY] * m for _ in range(n + 1)]
    BR = [[_EMPTY] * (m + 1) for _ in range(n)]
    LR[0][0] = L[0][0] if _nonempty(L[0][0]) and L[0][0][0] <= tol else _EMPTY
    BR[0][0] = B[0][0] if _nonempty(B[0][0]) and B[0][0][0] <= tol else _EMPTY
    # diagram boundary: continue only while fully free up to the far end
    for j in range(1, m):
        prev, cur = LR[0][j - 1], L[0][j]
        LR[0][j] = (
            cur
            if _nonempty(prev) and prev[1] >= 1.0 - tol and _nonempty(cur) and cur[0] <= tol
            else _EMPTY
        )
    for i in range(1, n):
        prev, cur = BR[i - 1][0], B[i][0]
        BR[i][0] = (
            cur
            if _nonempty(prev) and prev[1] >= 1.0 - tol and _nonempty(cur) and cur[0] <= tol
            else _EMPTY
        )

    for i in range(n):
        for j in range(m):
            lr, br = LR[i][j], BR[i][j]
            r_free, t_free = L[i + 1][j], B[i][j + 1]
            if _nonempty(br):
                rr = r_free
            elif _nonempty(lr):
                rr = (max(r_free[0], lr[0]), r_free[1])
            else:
                rr = _EMPTY
            if _nonempty(lr):
                tr = t_free
            elif _nonempty(br):
                tr = (max(t_free[0], br[0]), t_free[1])
            else:
                tr = _EMPTY
            LR[i + 1][j] = rr if _nonempty(rr) else _EMPTY
            BR[i][j + 1] = tr if _nonempty(tr) else _EMPTY

    end_r = LR[n][m - 1]
    end_t = BR[n - 1][m]
    return (_nonempty(end_r) and end_r[1] >= 1.0 - tol and end_r[0] <= 1.0 + tol) or (
        _nonempty(end_t) and end_t[1] >= 1.0 - tol and end_t[0] <= 1.0 + tol
    )


def frechet_continuous(p: np.ndarray, q: np.ndarray) -> float:
    """Continuous Fréchet distance: smallest type-1/type-2 critical value
    accepted by the free-space decision procedure (the reference's vendored
    Alt–Godau variant, ``heigit/ors/util/FrechetDistance.java:234-366``)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    crit = [float(np.hypot(*(p[0] - q[0]))), float(np.hypot(*(p[-1] - q[-1])))]
    for a, b in ((p, q), (q, p)):
        for v in a:
            for i in range(len(b) - 1):
                d = point_segment_dist_sq(
                    np.array([v[0]]), np.array([v[1]]),
                    b[i, 0], b[i, 1], b[i + 1, 0], b[i + 1, 1],
                )
                crit.append(float(np.sqrt(d[0])))
    vals = sorted(set(crit))
    lo, hi = 0, len(vals) - 1
    ans_i = len(vals) - 1
    while lo <= hi:
        mid = (lo + hi) // 2
        if _frechet_decision(p, q, vals[mid]):
            ans_i = mid
            hi = mid - 1
        else:
            lo = mid + 1
    # type-3 (vertex-pair bisector) critical values are not enumerated —
    # when the true distance falls between listed values, resolve it by
    # bisecting the decision procedure (exceeds the reference's fidelity,
    # whose vendored variant simply returns a nearby listed value)
    lo_v = vals[ans_i - 1] if ans_i > 0 else 0.0
    hi_v = vals[ans_i]
    for _ in range(60):
        mid_v = (lo_v + hi_v) / 2.0
        if _frechet_decision(p, q, mid_v):
            hi_v = mid_v
        else:
            lo_v = mid_v
    return hi_v
