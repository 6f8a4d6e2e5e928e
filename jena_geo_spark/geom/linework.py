"""Linework transforms: snap, split, line-merge, line-substring, densify/
segmentize, Visvalingam–Whyatt simplify, normalize.

Reference: ``geometry/transform/{Snap,Split,LineMerge,LineSubstring,
Segmentize,SimplifyVW,Normalize,...}.java`` (44 files) — JTS semantics
re-derived on coordinate arrays.
"""

from __future__ import annotations

import numpy as np

from .kernel import point_segment_dist_sq


def snap(coords: np.ndarray, target_chains: list, tol: float) -> np.ndarray:
    """ST_Snap: move each vertex to the nearest target VERTEX within tol,
    else project onto the nearest target segment within tol."""
    out = np.asarray(coords, dtype=np.float64)[:, :2].copy()
    tverts = np.vstack([c[:, :2] for c in target_chains]) if target_chains else np.empty((0, 2))
    for i, (px, py) in enumerate(out):
        if len(tverts):
            d2 = (tverts[:, 0] - px) ** 2 + (tverts[:, 1] - py) ** 2
            j = int(np.argmin(d2))
            if d2[j] <= tol * tol:
                out[i] = tverts[j]
                continue
        best, bestp = tol * tol, None
        for c in target_chains:
            for k in range(len(c) - 1):
                ax, ay, bx, by = c[k, 0], c[k, 1], c[k + 1, 0], c[k + 1, 1]
                dx, dy = bx - ax, by - ay
                ll = dx * dx + dy * dy
                t = 0.0 if ll == 0 else min(max(((px - ax) * dx + (py - ay) * dy) / ll, 0.0), 1.0)
                cx, cy = ax + t * dx, ay + t * dy
                d2 = (px - cx) ** 2 + (py - cy) ** 2
                if d2 < best:
                    best, bestp = d2, (cx, cy)
        if bestp is not None:
            out[i] = bestp
    return out


def split_line_by_line(line: np.ndarray, blade: np.ndarray) -> list:
    """ST_Split for a linestring split by another linestring: cut at every
    crossing → list of sub-chains."""
    line = np.asarray(line, dtype=np.float64)[:, :2]
    blade = np.asarray(blade, dtype=np.float64)[:, :2]
    pieces, cur = [], [line[0]]
    for i in range(len(line) - 1):
        a, b = line[i], line[i + 1]
        ts = []
        for j in range(len(blade) - 1):
            c, d = blade[j], blade[j + 1]
            r = b - a
            s = d - c
            den = r[0] * s[1] - r[1] * s[0]
            if den == 0:
                continue
            t = ((c[0] - a[0]) * s[1] - (c[1] - a[1]) * s[0]) / den
            u = ((c[0] - a[0]) * r[1] - (c[1] - a[1]) * r[0]) / den
            if 0 < t < 1 and 0 <= u <= 1:
                ts.append(t)
        for t in sorted(ts):
            p = a + t * (b - a)
            cur.append(p)
            pieces.append(np.array(cur))
            cur = [p]
        cur.append(b)
    if len(cur) >= 2:
        pieces.append(np.array(cur))
    return pieces


def line_merge(chains: list) -> list:
    """ST_LineMerge: stitch chains sharing endpoints into maximal chains
    (degree-2 joins only, JTS LineMerger semantics)."""
    from collections import defaultdict

    chains = [np.asarray(c, dtype=np.float64)[:, :2] for c in chains if len(c) >= 2]
    endpoints = defaultdict(list)
    for idx, c in enumerate(chains):
        endpoints[tuple(c[0])].append(idx)
        endpoints[tuple(c[-1])].append(idx)
    used = [False] * len(chains)
    out = []
    for idx in range(len(chains)):
        if used[idx]:
            continue
        used[idx] = True
        cur = list(map(tuple, chains[idx]))
        # extend forward then backward through degree-2 nodes
        for direction in (1, -1):
            while True:
                end = cur[-1] if direction == 1 else cur[0]
                cands = [
                    j for j in endpoints[end]
                    if not used[j] and len(endpoints[end]) == 2
                ]
                if not cands:
                    break
                j = cands[0]
                used[j] = True
                nxt = list(map(tuple, chains[j]))
                if direction == 1:
                    cur = cur + (nxt[1:] if nxt[0] == end else nxt[::-1][1:])
                else:
                    cur = (nxt[:-1] if nxt[-1] == end else nxt[::-1][:-1]) + cur
        out.append(np.array(cur))
    return out


def line_substring(coords: np.ndarray, f0: float, f1: float) -> np.ndarray:
    """ST_LineSubstring: the part of the line between length fractions
    [f0, f1]."""
    c = np.asarray(coords, dtype=np.float64)[:, :2]
    d = np.diff(c, axis=0)
    seglen = np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    tot = seglen.sum()
    if tot == 0:
        return c[:1]
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    lo, hi = sorted((max(f0, 0.0), min(f1, 1.0)))
    s0, s1 = lo * tot, hi * tot

    def point_at(s):
        i = int(np.searchsorted(cum, s, side="right") - 1)
        i = min(i, len(seglen) - 1)
        t = (s - cum[i]) / seglen[i] if seglen[i] > 0 else 0.0
        return c[i] + t * d[i], i

    p0, i0 = point_at(s0)
    p1, i1 = point_at(s1)
    mids = [c[k] for k in range(i0 + 1, i1 + 1) if cum[k] > s0 and cum[k] < s1]
    pts = [p0] + mids + [p1]
    return np.array(pts)


def segmentize(coords: np.ndarray, max_len: float) -> np.ndarray:
    """ST_Segmentize: insert vertices so no segment exceeds max_len
    (evenly split, PostGIS semantics)."""
    c = np.asarray(coords, dtype=np.float64)
    out = [c[0]]
    for i in range(len(c) - 1):
        a, b = c[i], c[i + 1]
        L = float(np.hypot(*(b[:2] - a[:2])))
        n = max(int(np.ceil(L / max_len)), 1)
        for k in range(1, n + 1):
            out.append(a + (b - a) * (k / n))
    return np.array(out)


def densify_tol(coords: np.ndarray, tol: float) -> np.ndarray:
    """JTS ``Densifier.densify`` arithmetic (the reference's
    ``geometry/transform/Densify.java`` delegates to it): each segment
    splits into ``floor(len/tol) + 1`` equal pieces, so every densified
    segment is strictly shorter than ``tol``.  Golden: DensifyTest.java's
    exact fraction list."""
    c = np.asarray(coords, dtype=np.float64)
    out = [c[0]]
    for i in range(len(c) - 1):
        a, b = c[i], c[i + 1]
        seg_len = float(np.hypot(*(b[:2] - a[:2])))
        count = int(seg_len / tol) + 1 if tol > 0 else 1
        for k in range(1, count):
            out.append(a + (b - a) * (k / count))
        out.append(b)
    return np.array(out)


def densify(coords: np.ndarray, n_per_edge: int) -> np.ndarray:
    """Fixed-count densify: n_per_edge extra points per segment (the
    SQL-oracle-friendly variant: split fractions are k/(n+1))."""
    c = np.asarray(coords, dtype=np.float64)
    out = [c[0]]
    for i in range(len(c) - 1):
        a, b = c[i], c[i + 1]
        for k in range(1, n_per_edge + 1):
            f = k / (n_per_edge + 1)
            out.append(a + (b - a) * f)
        out.append(b)
    return np.array(out)


def simplify_vw(coords: np.ndarray, area_tol: float) -> np.ndarray:
    """Visvalingam–Whyatt: drop the vertex with the smallest effective
    triangle area until all areas exceed the tolerance."""
    c = [tuple(p) for p in np.asarray(coords, dtype=np.float64)[:, :2]]

    def tri_area(a, b, d):
        return abs((b[0] - a[0]) * (d[1] - a[1]) - (b[1] - a[1]) * (d[0] - a[0])) * 0.5

    while len(c) > 2:
        areas = [tri_area(c[i - 1], c[i], c[i + 1]) for i in range(1, len(c) - 1)]
        k = int(np.argmin(areas))
        if areas[k] >= area_tol:
            break
        del c[k + 1]
    return np.array(c)


def normalize(g):
    """ST_Normalize: JTS ``Geometry.norm()`` canonical form (Normalize.java
    delegates to it) — exterior rings CW starting at the lexicographically
    smallest vertex, holes CCW; linestrings reversed when the reverse reads
    lexicographically smaller; multi-part members sorted by their first
    canonical vertex."""
    from . import wkt as W

    def norm_ring(r, ccw: bool):
        r = np.asarray(r, dtype=np.float64)
        closed = len(r) >= 2 and (r[0] == r[-1]).all()
        body = r[:-1] if closed else r
        x, y = body[:, 0], body[:, 1]
        area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        if (area2 < 0) == ccw:
            body = body[::-1]
        start = int(np.lexsort((body[:, 1], body[:, 0]))[0])
        body = np.roll(body, -start, axis=0)
        return np.vstack([body, body[:1]])

    def norm_line(c):
        # JTS LineString.normalize: reverse when, at the first symmetric
        # pair (i, n-1-i) that differs, the tail coordinate is smaller.
        n = len(c)
        for i in range(n // 2):
            a, b = tuple(c[i, :2]), tuple(c[n - 1 - i, :2])
            if a != b:
                return c[::-1] if b < a else c
        return c

    def ring_key(r):
        return tuple(map(tuple, np.asarray(r)[:, :2]))

    if not g.parts:  # empty geometries are already canonical
        return g
    if g.kind == "polygon":
        holes = sorted((norm_ring(h, True) for h in g.parts[1:]), key=ring_key)
        rings = [norm_ring(g.parts[0], False)] + holes
        return W.Geom("polygon", rings, g.dims if g.dims == "XY" else "XY")
    if g.kind == "multipolygon":
        polys = [
            [norm_ring(rings[0], False)]
            + sorted((norm_ring(h, True) for h in rings[1:]), key=ring_key)
            for rings in g.parts
        ]
        polys.sort(key=lambda rr: tuple(rr[0][0]))
        return W.Geom("multipolygon", polys)
    if g.kind == "linestring":
        return W.Geom("linestring", [norm_line(g.parts[0]).copy()], g.dims)
    if g.kind == "multilinestring":
        parts = [norm_line(c).copy() for c in g.parts]
        parts.sort(key=lambda c: tuple(c[0, :2]))
        return W.Geom("multilinestring", parts, g.dims)
    if g.kind == "multipoint":
        a = g.parts[0]
        order = np.lexsort((a[:, 1], a[:, 0]))
        return W.Geom("multipoint", [a[order].copy()], g.dims)
    return g


# ---------------------------------------------------------- 1D overlay --


def _pts_on_chains(pts: np.ndarray, chains: list, eps: float) -> np.ndarray:
    """Boolean mask: which of ``pts`` lie on any segment of ``chains``."""
    pts = np.asarray(pts, dtype=np.float64)[:, :2]
    on = np.zeros(len(pts), dtype=bool)
    for ch in chains:
        c = np.asarray(ch, dtype=np.float64)[:, :2]
        for j in range(len(c) - 1):
            rem = ~on
            if not rem.any():
                return on
            d2 = point_segment_dist_sq(
                pts[rem, 0], pts[rem, 1], c[j, 0], c[j, 1], c[j + 1, 0], c[j + 1, 1]
            )
            idx = np.flatnonzero(rem)
            on[idx[d2 <= eps * eps]] = True
    return on


def _insert_blade_vertices(piece: np.ndarray, bverts: np.ndarray, eps: float):
    """Insert blade vertices that lie in a segment's INTERIOR as new
    vertices (collinear-overlap noding: a crossing-only split never cuts
    there).  The inserted coordinates are the blade vertex doubles
    themselves, keeping golden splits bit-exact."""
    out = [piece[0]]
    for i in range(len(piece) - 1):
        a, b = piece[i], piece[i + 1]
        d = b - a
        ll = float(d @ d)
        if ll > 0 and len(bverts):
            t = ((bverts - a) @ d) / ll
            proj = a + t[:, None] * d
            dist2 = ((bverts - proj) ** 2).sum(axis=1)
            tol = eps / np.sqrt(ll)
            sel = (dist2 <= eps * eps) & (t > tol) & (t < 1 - tol)
            for j in np.argsort(t):
                if sel[j]:
                    out.append(bverts[j])
        out.append(b)
    return np.array(out)


def _node_chain(chain: np.ndarray, blades: list, eps: float) -> list:
    """Split one chain at every intersection with the blade chains —
    interior crossings (via :func:`split_line_by_line`), blade vertices
    inside a segment (collinear overlaps), and interior vertices that lie
    on a blade (JTS noding splits there too, e.g. a blade endpoint
    touching a vertex: DifferenceTest.java's golden has a piece boundary
    at the shared vertex)."""
    pieces = [np.asarray(chain, dtype=np.float64)[:, :2]]
    for blade in blades:
        pieces = [q for p in pieces for q in split_line_by_line(p, blade)]
    bverts = (
        np.vstack([np.asarray(b, dtype=np.float64)[:, :2] for b in blades])
        if blades
        else np.empty((0, 2))
    )
    out = []
    for p in pieces:
        if len(p) < 2:
            continue
        p = _insert_blade_vertices(p, bverts, eps)
        cut = np.zeros(len(p), dtype=bool)
        if len(p) > 2:
            cut[1:-1] = _pts_on_chains(p[1:-1], blades, eps)
        cur = [p[0]]
        for i in range(1, len(p)):
            cur.append(p[i])
            if cut[i]:
                out.append(np.array(cur))
                cur = [p[i]]
        if len(cur) >= 2:
            out.append(np.array(cur))
    return [p for p in out if len(p) >= 2 and not (p[0] == p).all()]


def _on_blades(piece: np.ndarray, blades: list, eps: float) -> bool:
    """A noded piece lies ON the blade linework iff every segment midpoint
    does (pieces are noded, so a segment is entirely on or off)."""
    mids = (piece[:-1] + piece[1:]) / 2.0
    return bool(_pts_on_chains(mids, blades, eps).all())


def line_overlay(chains_a: list, chains_b: list, op: str) -> list:
    """1D boolean overlay over linestring chains (JTS OverlayOp semantics
    restricted to lineal output — reference geof:difference /
    symDifference / union / intersection on line inputs,
    ``GeometryWrapper.java:715-808``; golden ``DifferenceTest.java``).

    difference      → pieces of A not on B
    intersection    → shared 1D portions (0-dimensional crossings are
                      nodes, not output — a point result is out of scope)
    union           → A-not-on-B plus all of B (noded; shared linework
                      appears once, contributed by B)
    symdifference   → A-not-on-B plus B-not-on-A
    """
    eps = _overlay_eps(chains_a, chains_b)
    a_pieces = [q for ch in chains_a for q in _node_chain(ch, chains_b, eps)]
    if op == "difference":
        # kept noded, NOT merged: the reference golden
        # (DifferenceTest.java) pins the node-split MULTILINESTRING
        return [p for p in a_pieces if not _on_blades(p, chains_b, eps)]
    if op == "intersection":
        # shared linework merged back to maximal chains
        return line_merge([p for p in a_pieces if _on_blades(p, chains_b, eps)])
    b_pieces = [q for ch in chains_b for q in _node_chain(ch, chains_a, eps)]
    if op == "union":
        return line_merge(
            [p for p in a_pieces if not _on_blades(p, chains_b, eps)] + b_pieces
        )
    if op == "symdifference":
        return [p for p in a_pieces if not _on_blades(p, chains_b, eps)] + [
            p for p in b_pieces if not _on_blades(p, chains_a, eps)
        ]
    raise ValueError(f"unknown line overlay op {op!r}")


def _overlay_eps(chains_a: list, chains_b: list) -> float:
    scale = 1.0
    for ch in list(chains_a) + list(chains_b):
        c = np.asarray(ch, dtype=np.float64)
        if c.size:
            scale = max(scale, float(np.abs(c[:, :2]).max()))
    return 1e-9 * scale


def line_intersection_mixed(chains_a: list, chains_b: list):
    """Line×line intersection with mixed-dimension output: the shared 1D
    linework plus any isolated 0D crossings NOT on it.  JTS OverlayOp
    returns GEOMETRYCOLLECTION(POINT, LINESTRING) when a pair both shares
    a segment and crosses transversally elsewhere (reference
    ``GeometryWrapper.java:715-808`` delegates to it); plain
    ``line_overlay`` reports only the 1D part."""
    chains = line_overlay(chains_a, chains_b, "intersection")
    pts = line_crossing_points(chains_a, chains_b)
    if len(pts) and chains:
        eps = _overlay_eps(chains_a, chains_b)
        pts = pts[~_pts_on_chains(pts, chains, eps)]
    return chains, pts


def line_crossing_points(chains_a: list, chains_b: list) -> np.ndarray:
    """0-dimensional intersection of two sets of line chains: the noding
    cut points of A against B that lie on B (JTS line x line intersection
    returns these as (MULTI)POINT when there is no 1D overlap)."""
    eps = _overlay_eps(chains_a, chains_b)
    pts = []
    for ch in chains_a:
        for p in _node_chain(ch, chains_b, eps):
            for v in (p[0], p[-1]):
                if _pts_on_chains(v[None, :], chains_b, eps)[0]:
                    pts.append((float(v[0]), float(v[1])))
    if not pts:
        return np.empty((0, 2))
    return np.array(sorted(set(pts)))
