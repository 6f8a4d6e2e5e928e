"""Planar arrangement kernel: noding, face tracing, coverage booleans.

One machine powering four reference operators that JTS gets from its noder /
polygonizer / buffer stack (``geometry/transform/Node.java``,
``Polygonize.java``, ``geometry/relation/UnaryUnion.java``, ``Union.java``,
and geof:buffer in jena's ``GeometryWrapper``):

1. ``node_chains`` — split all input segments at pairwise intersections
   (JTS ``MCIndexNoder`` equivalent; grid-binned candidate pairs, exact
   parametric splits, collinear overlaps split at projected endpoints);
2. ``trace_faces`` — half-edge face traversal of the noded arrangement
   (each bounded face comes out CCW / positive signed area);
3. ``cover_polygons`` — boolean overlay as a *coverage* query: every face
   gets a representative interior point, the caller's predicate maps the
   vector of per-piece containment flags to kept/dropped, kept faces are
   re-assembled into shells + holes.  Union = any(cov); erosion for
   negative buffers = cov[0] and not any(cov[1:]);
4. ``buffer_geom`` — general ST_Buffer: union of per-segment rectangles +
   per-vertex discs (+ the polygon bodies themselves), resolved through the
   arrangement; negative distances erode areal geometries.

All numpy/python, no shapely/JTS.  After noding, coordinates within one
quantum (12 significant digits of the input scale) of each other are
snapped to a single cluster representative, preferring exact original
endpoints — coincident intersection points merge exactly while un-cut
input coordinates pass through bit-identical.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from . import kernel as K
from .wkt import Geom

# ------------------------------------------------------------------ noding --


def node_chains(chains: list, quantum: float | None = None) -> list:
    """Split every segment of every chain at its intersections with all
    other segments.  Returns a list of 2-point segments (a, b) as (2,2)
    arrays, deduplicated as undirected edges, zero-length dropped."""
    segs = []
    for ch in chains:
        a = np.asarray(ch, dtype=np.float64)[:, :2]
        for i in range(len(a) - 1):
            if not (a[i] == a[i + 1]).all():
                segs.append((a[i].copy(), a[i + 1].copy()))
    if not segs:
        return []
    allpts = np.array([p for s in segs for p in s])
    scale = max(1.0, float(np.abs(allpts).max()))
    if quantum is None:
        quantum = scale * 1e-12

    # grid-bin segments so candidate pairing is near-linear, not O(n²)
    cell = max(scale / 256.0, quantum * 1e3)
    bins: dict = defaultdict(list)
    for idx, (p, q) in enumerate(segs):
        x0, x1 = sorted((p[0], q[0]))
        y0, y1 = sorted((p[1], q[1]))
        for cx in range(int(x0 // cell), int(x1 // cell) + 1):
            for cy in range(int(y0 // cell), int(y1 // cell) + 1):
                bins[(cx, cy)].append(idx)

    cut_ts: list = [set() for _ in segs]  # parametric cut positions per seg
    seen_pairs = set()
    for members in bins.values():
        for ii in range(len(members)):
            for jj in range(ii + 1, len(members)):
                i, j = members[ii], members[jj]
                key = (i, j) if i < j else (j, i)
                if key in seen_pairs:
                    continue
                seen_pairs.add(key)
                _cut_pair(segs[i], segs[j], cut_ts[i], cut_ts[j], quantum)

    # Node registry: cluster points within one quantum and snap each cluster
    # to a single representative, PREFERRING exact original endpoints (so
    # un-cut input coordinates pass through bit-identical — quantizing
    # everything used to turn 1.0 into 0.9999999999999999 because the
    # quantum itself isn't binary-representable).  Computed cut points from
    # different segments still unify: same cluster → same representative.
    reps: dict = {}

    def _register(pt) -> None:
        key = (round(pt[0] / quantum), round(pt[1] / quantum))
        if key not in reps:
            reps[key] = pt

    for p, q in segs:
        _register(p)
        _register(q)

    def _snap(pt):
        kx, ky = round(pt[0] / quantum), round(pt[1] / quantum)
        for dx in (0, -1, 1):
            for dy in (0, -1, 1):
                r = reps.get((kx + dx, ky + dy))
                if (
                    r is not None
                    and abs(r[0] - pt[0]) <= quantum
                    and abs(r[1] - pt[1]) <= quantum
                ):
                    return r
        # first point seen in this cluster becomes its representative —
        # no rounding at all (the quantum is only the cluster radius)
        reps[(kx, ky)] = pt
        return pt

    out = []
    seen_edges = set()
    for idx, (p, q) in enumerate(segs):
        ts = sorted(t for t in cut_ts[idx] if 1e-12 < t < 1 - 1e-12)
        pts = [_snap(p)] + [_snap(p + t * (q - p)) for t in ts] + [_snap(q)]
        pts = np.array(pts)
        for k in range(len(pts) - 1):
            a, b = pts[k], pts[k + 1]
            if (a == b).all():
                continue
            ka, kb = tuple(a), tuple(b)
            ekey = (ka, kb) if ka <= kb else (kb, ka)
            if ekey in seen_edges:
                continue
            seen_edges.add(ekey)
            out.append(np.array([a, b]))
    return out


def _cut_pair(sa, sb, ts_a: set, ts_b: set, quantum: float) -> None:
    p1, p2 = sa
    q1, q2 = sb
    d1 = p2 - p1
    d2 = q2 - q1
    den = d1[0] * d2[1] - d1[1] * d2[0]
    eps = quantum
    if abs(den) > 1e-300:
        t = ((q1[0] - p1[0]) * d2[1] - (q1[1] - p1[1]) * d2[0]) / den
        u = ((q1[0] - p1[0]) * d1[1] - (q1[1] - p1[1]) * d1[0]) / den
        if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
            ts_a.add(min(max(t, 0.0), 1.0))
            ts_b.add(min(max(u, 0.0), 1.0))
        return
    # parallel: check collinearity, then project each endpoint on the other
    cross = d1[0] * (q1[1] - p1[1]) - d1[1] * (q1[0] - p1[0])
    L = math.hypot(*d1)
    if L == 0 or abs(cross) > eps * max(L, 1.0):
        return
    L2 = d1 @ d1
    for q in (q1, q2):
        t = ((q - p1) @ d1) / L2
        if -1e-12 <= t <= 1 + 1e-12:
            ts_a.add(min(max(t, 0.0), 1.0))
    M2 = d2 @ d2
    if M2 > 0:
        for p in (p1, p2):
            u = ((p - q1) @ d2) / M2
            if -1e-12 <= u <= 1 + 1e-12:
                ts_b.add(min(max(u, 0.0), 1.0))


# ------------------------------------------------------------ face tracing --


def trace_faces(segments: list) -> list:
    """Faces of the noded arrangement.  Returns list of (ring, area):
    ring an (n,2) closed CCW/CW array, area signed (+ = bounded face).

    Half-edge walk: from directed edge u→v, the successor is the edge v→w
    that is the clockwise-next neighbour of v→u in angular order — bounded
    faces come out CCW (positive area), the unbounded face CW."""
    # vertex adjacency
    adj: dict = defaultdict(list)  # vertex -> list of neighbour vertices
    for seg in segments:
        a, b = tuple(seg[0]), tuple(seg[1])
        if a == b:
            continue
        adj[a].append(b)
        adj[b].append(a)
    # drop dangling chains (degree-1 vertices) iteratively — they bound no face
    changed = True
    deg = {v: len(ns) for v, ns in adj.items()}
    edge_alive = set()
    for seg in segments:
        a, b = tuple(seg[0]), tuple(seg[1])
        if a != b:
            edge_alive.add((a, b) if a <= b else (b, a))
    while changed:
        changed = False
        for v in list(deg):
            if deg.get(v, 0) == 1:
                # remove its single edge
                w = next(n for n in adj[v] if _ekey(v, n) in edge_alive)
                edge_alive.discard(_ekey(v, w))
                deg[v] -= 1
                deg[w] -= 1
                adj[v].remove(w)
                adj[w].remove(v)
                changed = True
    # angular order per vertex
    order: dict = {}
    for v, ns in adj.items():
        if not ns:
            continue
        angs = [(math.atan2(n[1] - v[1], n[0] - v[0]), n) for n in ns]
        angs.sort()
        order[v] = angs
    visited = set()
    faces = []
    for v, ns in adj.items():
        for n in ns:
            e = (v, n)
            if e in visited:
                continue
            ring = [v]
            cur = e
            ok = True
            for _ in range(len(segments) * 4 + 8):
                visited.add(cur)
                u, w = cur
                ring.append(w)
                # incoming reverse direction at w
                back_ang = math.atan2(u[1] - w[1], u[0] - w[0])
                neigh = order[w]
                # clockwise-next: largest angle strictly below back_ang (cyclic)
                nxt = None
                for ang, nb in reversed(neigh):
                    if ang < back_ang - 1e-15:
                        nxt = nb
                        break
                if nxt is None:
                    nxt = neigh[-1][1]
                cur = (w, nxt)
                if cur == e:
                    break
            else:
                ok = False
            if not ok:
                continue
            arr = np.array(ring)
            area = K.ring_area_signed(arr)
            faces.append((arr, float(area)))
    return faces


def _ekey(a, b):
    return (a, b) if a <= b else (b, a)


def _interior_point(ring: np.ndarray) -> tuple | None:
    """A point strictly inside the (CCW, closed) face ring: midpoint of an
    edge nudged left by a fraction of the local edge length."""
    n = len(ring) - 1
    ring_closed = ring
    for i in range(n):
        a, b = ring_closed[i], ring_closed[i + 1]
        d = b - a
        L = math.hypot(*d)
        if L == 0:
            continue
        nrm = np.array([-d[1], d[0]]) / L  # left normal
        for f in (1e-6, 1e-9, 1e-3):
            p = (a + b) / 2 + nrm * (L * f)
            if K.points_in_polygon(np.array([p[0]]), np.array([p[1]]), ring_closed)[0]:
                return float(p[0]), float(p[1])
    return None


# --------------------------------------------------------- coverage boolean --


def _face_interior_point(shell: np.ndarray, holes: list) -> tuple | None:
    """Interior point of a face that may have holes: edge-midpoint nudges on
    the shell, rejected if they land inside a hole."""
    n = len(shell) - 1
    for i in range(n):
        a, b = shell[i], shell[i + 1]
        d = b - a
        L = math.hypot(*d)
        if L == 0:
            continue
        nrm = np.array([-d[1], d[0]]) / L
        for f in (1e-6, 1e-9, 1e-3):
            p = (a + b) / 2 + nrm * (L * f)
            px, py = np.array([p[0]]), np.array([p[1]])
            if not K.points_in_polygon(px, py, shell)[0]:
                continue
            if any(K.points_in_polygon(px, py, h)[0] for h in holes):
                continue
            return float(p[0]), float(p[1])
    return None


def _geom_covers_point(g: Geom, x: float, y: float) -> bool:
    inside = False
    for rings in g.polygons():
        r0 = np.asarray(rings[0])[:, :2]
        if len(r0) < 3:
            continue
        shell = r0 if (r0[0] == r0[-1]).all() else np.vstack([r0, r0[:1]])
        if not K.points_in_polygon(np.array([x]), np.array([y]), shell)[0]:
            continue
        in_hole = False
        for h in rings[1:]:
            hh = np.asarray(h)[:, :2]
            if len(hh) < 3:
                continue
            hc = hh if (hh[0] == hh[-1]).all() else np.vstack([hh, hh[:1]])
            if K.points_in_polygon(np.array([x]), np.array([y]), hc)[0]:
                in_hole = True
                break
        if not in_hole:
            inside = True
            break
    return inside


def faces_with_holes(segments: list) -> list:
    """Group traced boundary cycles into faces: each CCW cycle is a face
    shell; each CW cycle is either the unbounded boundary or the inner
    boundary (hole) of an annular face — assigned to the smallest positive
    shell that strictly contains it (area strictly larger + PIP).

    Returns list of (shell_ring, [hole_rings], area).  Hole rings keep their
    CW orientation (face interior on the left of their directed edges)."""
    traced = trace_faces(segments)
    pos = [(ring, area) for ring, area in traced if area > 1e-300]
    neg = [(ring, area) for ring, area in traced if area < -1e-300]
    holes_of: list = [[] for _ in pos]
    for nring, narea in neg:
        ip = _interior_point(nring[::-1])  # point inside the enclosed disk
        if ip is None:
            continue
        best = None
        for pi, (pring, parea) in enumerate(pos):
            if parea <= -narea * (1 + 1e-12):
                continue
            if K.points_in_polygon(np.array([ip[0]]), np.array([ip[1]]), pring)[0]:
                if best is None or parea < pos[best][1]:
                    best = pi
        if best is not None:
            holes_of[best].append(nring)
    return [(ring, holes_of[i], area) for i, (ring, area) in enumerate(pos)]


def cover_polygons(pieces: list, predicate) -> Geom:
    """Resolve a boolean over areal ``pieces`` (list of Geom) through the
    arrangement of all their ring edges.

    ``predicate(flags)`` maps the per-piece containment tuple of a face's
    interior point to keep/drop.  Returns polygon / multipolygon (with
    holes) — or an empty polygon when nothing is kept."""
    chains = []
    for g in pieces:
        for rings in g.polygons():
            for r in rings:
                a = np.asarray(r, dtype=np.float64)[:, :2]
                if len(a) >= 2 and not (a[0] == a[-1]).all():
                    a = np.vstack([a, a[:1]])
                chains.append(a)
    segs = node_chains(chains)
    faces = faces_with_holes(segs)
    kept_any = False
    # derive keep flag per face; record boundary edges with orientation
    edge_side: dict = defaultdict(lambda: [False, False])  # ekey -> [left_kept_fwd, left_kept_rev]
    for shell, holes, _area in faces:
        ip = _face_interior_point(shell, holes)
        if ip is None:
            continue
        flags = tuple(_geom_covers_point(g, ip[0], ip[1]) for g in pieces)
        if not predicate(flags):
            continue
        kept_any = True
        for ring in [shell] + holes:
            for i in range(len(ring) - 1):
                a, b = tuple(ring[i]), tuple(ring[i + 1])
                ek = _ekey(a, b)
                if a <= b:
                    edge_side[ek][0] = True
                else:
                    edge_side[ek][1] = True
    if not kept_any:
        return Geom("polygon", [])
    # boundary = edges kept on exactly one side
    boundary = []
    for (a, b), (fwd, rev) in edge_side.items():
        if fwd and not rev:
            boundary.append((a, b))  # kept face on left of a→b
        elif rev and not fwd:
            boundary.append((b, a))
    rings = _link_rings(boundary)
    return _assemble_polygons(rings)


def _link_rings(directed_edges: list) -> list:
    """Chain directed boundary edges into closed rings.  At multi-way
    vertices pick the most-counterclockwise continuation so touching rings
    separate cleanly."""
    out_map: dict = defaultdict(list)
    for a, b in directed_edges:
        out_map[a].append(b)
    unused = set(directed_edges)
    rings = []
    while unused:
        start = next(iter(unused))
        ring = [start[0], start[1]]
        unused.discard(start)
        cur = start
        for _ in range(len(directed_edges) + 2):
            v = cur[1]
            outs = [w for w in out_map[v] if (v, w) in unused]
            if not outs:
                break
            if len(outs) == 1:
                nxt = outs[0]
            else:
                back = math.atan2(cur[0][1] - v[1], cur[0][0] - v[0])
                # most counterclockwise turn: smallest angle above back
                def key(w):
                    ang = math.atan2(w[1] - v[1], w[0] - v[0])
                    d = ang - back
                    while d <= 0:
                        d += 2 * math.pi
                    return d

                nxt = min(outs, key=key)
            cur = (v, nxt)
            unused.discard(cur)
            ring.append(nxt)
            if nxt == ring[0]:
                break
        if len(ring) >= 4 and ring[0] == ring[-1]:
            rings.append(np.array(ring))
    return rings


def _assemble_polygons(rings: list) -> Geom:
    shells = [(r, K.ring_area_signed(r)) for r in rings]
    outers = [(r, a) for r, a in shells if a > 0]
    holes = [(r, a) for r, a in shells if a < 0]
    if not outers:
        return Geom("polygon", [])
    polys = []
    for r, _ in outers:
        polys.append([r])
    for h, _ in holes:
        ip = _interior_point(h[::-1])  # reverse to CCW for interior probe
        placed = False
        if ip is not None:
            # innermost containing shell (smallest area)
            cands = []
            for pi, (r, a) in enumerate(outers):
                if K.points_in_polygon(np.array([ip[0]]), np.array([ip[1]]), r)[0]:
                    cands.append((a, pi))
            if cands:
                _, pi = min(cands)
                polys[pi].append(h)
                placed = True
        if not placed and polys:
            polys[0].append(h)
    if len(polys) == 1:
        return Geom("polygon", polys[0])
    return Geom("multipolygon", polys)


def union_all(geoms: list) -> Geom:
    """n-way areal union (UnaryUnion / Union over many)."""
    pieces = [g for g in geoms if g.polygons()]
    if not pieces:
        return Geom("polygon", [])
    return cover_polygons(pieces, lambda flags: any(flags))


# ---------------------------------------------------------------- polygonize --


def polygonize_chains(chains: list) -> list:
    """JTS Polygonizer: node the linework, return every bounded face as a
    polygon Geom (shell CCW, holes for annular faces)."""
    segs = node_chains(chains)
    return [
        Geom("polygon", [shell] + holes) for shell, holes, _ in faces_with_holes(segs)
    ]


# -------------------------------------------------------------------- buffer --


def _disc(center: np.ndarray, r: float, quad_segs: int) -> Geom:
    n = max(4 * quad_segs, 8)
    ang = np.arange(n + 1) * (2 * math.pi / n)
    ring = np.column_stack([center[0] + r * np.cos(ang), center[1] + r * np.sin(ang)])
    return Geom("polygon", [ring])


def _seg_rect(a: np.ndarray, b: np.ndarray, r: float) -> Geom | None:
    d = b - a
    L = math.hypot(*d)
    if L == 0:
        return None
    nrm = np.array([-d[1], d[0]]) / L * r
    ring = np.array([a + nrm, b + nrm, b - nrm, a - nrm, a + nrm])
    return Geom("polygon", [ring])


def buffer_geom(g: Geom, dist: float, quad_segs: int = 8) -> Geom:
    """General ST_Buffer (geof:buffer): round joins/caps via vertex discs,
    arrangement-resolved union; negative distance erodes areal geometries."""
    if dist == 0:
        return g
    if dist < 0:
        if not g.polygons():
            return Geom("polygon", [])
        r = -dist
        pieces = [g]
        for ch in g.chains():
            a = np.asarray(ch)[:, :2]
            for i in range(len(a) - 1):
                rect = _seg_rect(a[i], a[i + 1], r)
                if rect is not None:
                    pieces.append(rect)
            for p in a[:-1]:
                pieces.append(_disc(p, r, quad_segs))
        # erosion: inside the polygon and not within r of its boundary
        return cover_polygons(pieces, lambda f: f[0] and not any(f[1:]))
    pieces = []
    if g.polygons():
        pieces.append(g)
    for ch in g.chains():
        a = np.asarray(ch)[:, :2]
        if len(a) == 1:
            pieces.append(_disc(a[0], dist, quad_segs))
            continue
        for i in range(len(a) - 1):
            rect = _seg_rect(a[i], a[i + 1], dist)
            if rect is not None:
                pieces.append(rect)
        for p in a:
            pieces.append(_disc(p, dist, quad_segs))
    if not pieces:
        return Geom("polygon", [])
    return cover_polygons(pieces, lambda flags: any(flags))
