"""An INDEPENDENT exact-rational DE-9IM oracle (VERDICT r4 ask #5).

``geom/relate.py`` computes DE-9IM with float sweeps and sampled
midpoints; the DuckDB oracles share formula text with the engine by
design.  This module is a from-scratch second implementation over
``fractions.Fraction`` — different arithmetic substrate, different
algorithm (half-plane interval clipping + Sutherland–Hodgman areas, no
sampling) — restricted to a geometry family where every DE-9IM cell has
a closed-form exact answer:

* points
* non-degenerate segments (2-point linestrings)
* convex polygons (CCW, area > 0, no holes)

Dimension facts used (convex sets, open interiors):
* two convex interiors intersect in dim 2 or not at all;
* a segment meets a convex interior in dim 1 or not at all;
* a boundary ring leaves a convex closure in dim 1 or not at all —
  isolated-point cases only arise ON boundaries, never against open
  interiors/exteriors, so every cell below is exact, not sampled.
"""

from __future__ import annotations

from fractions import Fraction as Fr

F_ = -1  # empty cell


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _edges(poly):
    n = len(poly)
    return [(poly[i], poly[(i + 1) % n]) for i in range(n)]


def _area2(poly):
    s = Fr(0)
    for a, b in _edges(poly):
        s += a[0] * b[1] - a[1] * b[0]
    return s  # 2x signed area, positive for CCW


def locate_in_poly(pt, poly) -> str:
    on_edge = False
    for a, b in _edges(poly):
        c = _cross(a, b, pt)
        if c < 0:
            return "E"
        if c == 0:
            on_edge = True
    return "B" if on_edge else "I"


def locate_on_seg(pt, seg) -> str:
    p, q = seg
    if pt == p or pt == q:
        return "B"
    if _cross(p, q, pt) != 0:
        return "E"
    # collinear: inside the extent?
    d = ((q[0] - p[0]), (q[1] - p[1]))
    t = ((pt[0] - p[0]) * d[0] + (pt[1] - p[1]) * d[1])
    L = d[0] * d[0] + d[1] * d[1]
    return "I" if 0 < t < L else "E"


def _clip_interval(p, q, poly, strict):
    """t-interval of [p,q] inside the polygon's closure (strict →
    interior).  Returns (t0, t1) or None; strict intervals are OPEN."""
    t0, t1 = Fr(0), Fr(1)
    for a, b in _edges(poly):
        f0 = _cross(a, b, p)
        f1 = _cross(a, b, q)
        denom = f1 - f0
        if denom == 0:
            if f0 < 0 or (strict and f0 == 0):
                return None
        else:
            th = Fr(-f0) / denom
            if denom > 0:
                t0 = max(t0, th)
            else:
                t1 = min(t1, th)
    if (strict and t0 >= t1) or t0 > t1:
        return None
    return (t0, t1)


def _collinear_overlap_len2(sa, sb):
    """Positive iff the two segments are collinear with overlap of
    positive length (returns squared-ish scale; only sign matters)."""
    p, q = sa
    if _cross(p, q, sb[0]) != 0 or _cross(p, q, sb[1]) != 0:
        return Fr(0)
    d = (q[0] - p[0], q[1] - p[1])
    L = d[0] * d[0] + d[1] * d[1]

    def t_of(x):
        return Fr((x[0] - p[0]) * d[0] + (x[1] - p[1]) * d[1]) / L

    u0, u1 = sorted((t_of(sb[0]), t_of(sb[1])))
    lo, hi = max(Fr(0), u0), min(Fr(1), u1)
    return hi - lo if hi > lo else Fr(0)


def _seg_seg_closed_intersect(sa, sb) -> bool:
    p1, q1 = sa
    p2, q2 = sb
    d1 = _cross(p1, q1, p2)
    d2 = _cross(p1, q1, q2)
    d3 = _cross(p2, q2, p1)
    d4 = _cross(p2, q2, q1)
    if ((d1 > 0) != (d2 > 0) or d1 == 0 or d2 == 0) and (
        (d3 > 0) != (d4 > 0) or d3 == 0 or d4 == 0
    ):
        # handle collinear / endpoint cases precisely
        if d1 == 0 and locate_on_seg(p2, sa) != "E":
            return True
        if d2 == 0 and locate_on_seg(q2, sa) != "E":
            return True
        if d3 == 0 and locate_on_seg(p1, sb) != "E":
            return True
        if d4 == 0 and locate_on_seg(q1, sb) != "E":
            return True
        if d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0:
            return True  # proper crossing
        if d1 == 0 and d2 == 0:  # collinear
            return _collinear_overlap_len2(sa, sb) > 0 or any(
                locate_on_seg(x, sa) != "E" for x in sb
            )
    return False


def _sh_clip(subject, clip):
    """Sutherland–Hodgman: convex subject ∩ convex clip (both CCW)."""
    out = list(subject)
    for a, b in _edges(clip):
        if not out:
            break
        inp, out = out, []
        for i, cur in enumerate(inp):
            nxt = inp[(i + 1) % len(inp)]
            fc = _cross(a, b, cur)
            fn = _cross(a, b, nxt)
            if fc >= 0:
                out.append(cur)
                if fn < 0:
                    t = Fr(fc) / (fc - fn)
                    out.append(
                        (cur[0] + t * (nxt[0] - cur[0]), cur[1] + t * (nxt[1] - cur[1]))
                    )
            elif fn >= 0:
                t = Fr(fc) / (fc - fn)
                out.append(
                    (cur[0] + t * (nxt[0] - cur[0]), cur[1] + t * (nxt[1] - cur[1]))
                )
    return out


def _m(cells):
    return "".join("F" if d == F_ else str(d) for d in cells)


def _transpose(m):
    return "".join(m[3 * c + r] for r in range(3) for c in range(3))


# ---------------------------------------------------------------- pairwise --


def _pt_pt(a, b):
    if a == b:
        return _m([0, F_, F_, F_, F_, F_, F_, F_, 2])
    return _m([F_, F_, 0, F_, F_, F_, 0, F_, 2])


def _pt_seg(pt, seg):
    loc = locate_on_seg(pt, seg)
    row1 = {"I": [0, F_, F_], "B": [F_, 0, F_], "E": [F_, F_, 0]}[loc]
    # the segment always has interior/boundary points off the point
    return _m(row1 + [F_, F_, F_] + [1, 0, 2])


def _pt_poly(pt, poly):
    loc = locate_in_poly(pt, poly)
    row1 = {"I": [0, F_, F_], "B": [F_, 0, F_], "E": [F_, F_, 0]}[loc]
    return _m(row1 + [F_, F_, F_] + [2, 1, 2])


def _seg_seg(sa, sb):
    p1, q1 = sa
    p2, q2 = sb
    coll = _cross(p1, q1, p2) == 0 and _cross(p1, q1, q2) == 0
    if coll:
        d = (q1[0] - p1[0], q1[1] - p1[1])
        L = d[0] * d[0] + d[1] * d[1]

        def t_of(x):
            return Fr((x[0] - p1[0]) * d[0] + (x[1] - p1[1]) * d[1]) / L

        u0, u1 = sorted((t_of(p2), t_of(q2)))
        ii = 1 if min(Fr(1), u1) > max(Fr(0), u0) else F_
        ib = 0 if any(locate_on_seg(x, sa) == "I" for x in (p2, q2)) else F_
        bi = 0 if any(locate_on_seg(x, sb) == "I" for x in (p1, q1)) else F_
        bb = 0 if ({p1, q1} & {p2, q2}) else F_
        ie = 1 if (u0 > 0 or u1 < 1) else F_
        ei = 1 if (u0 < 0 or u1 > 1) else F_
        be = 0 if any(locate_on_seg(x, sb) == "E" for x in (p1, q1)) else F_
        eb = 0 if any(locate_on_seg(x, sa) == "E" for x in (p2, q2)) else F_
        return _m([ii, ib, ie, bi, bb, be, ei, eb, 2])
    # non-collinear: intersection is at most one point
    locs_b_on_a = {x: locate_on_seg(x, sa) for x in (p2, q2)}
    locs_a_on_b = {x: locate_on_seg(x, sb) for x in (p1, q1)}
    touch = _seg_seg_closed_intersect(sa, sb)
    ii = ib = bi = bb = F_
    if touch:
        # classify the (single) intersection point by each side
        # endpoints first
        for x, la in locs_a_on_b.items():
            if la != "E":
                lb = "B"  # x is an endpoint of A
                if la == "I":
                    bi = 0
                else:
                    bb = 0
        for x, lb in locs_b_on_a.items():
            if lb != "E":
                if lb == "I":
                    ib = 0
                else:
                    bb = 0
        if (
            all(v == "E" for v in locs_a_on_b.values())
            and all(v == "E" for v in locs_b_on_a.values())
        ):
            ii = 0  # proper interior crossing
    be = 0 if any(v == "E" for v in locs_a_on_b.values()) else F_
    eb = 0 if any(v == "E" for v in locs_b_on_a.values()) else F_
    return _m([ii, ib, 1, bi, bb, be, 1, eb, 2])


def _seg_poly(seg, poly):
    p, q = seg
    closure = _clip_interval(p, q, poly, strict=False)
    strict = _clip_interval(p, q, poly, strict=True)
    ii = 1 if strict is not None else F_
    # interior(seg) ∩ boundary(poly)
    ib = F_
    for e in _edges(poly):
        ov = _collinear_overlap_len2(seg, e)
        if ov > 0:
            ib = 1
            break
    if ib == F_ and closure is not None:
        d = (q[0] - p[0], q[1] - p[1])
        for t in set(closure):
            if 0 < t < 1:
                x = (p[0] + t * d[0], p[1] + t * d[1])
                if locate_in_poly(x, poly) == "B":
                    ib = 0
                    break
    ie = 1 if (closure is None or closure[0] > 0 or closure[1] < 1) else F_
    la, lb_ = locate_in_poly(p, poly), locate_in_poly(q, poly)
    bi = 0 if "I" in (la, lb_) else F_
    bb = 0 if "B" in (la, lb_) else F_
    be = 0 if "E" in (la, lb_) else F_
    return _m([ii, ib, ie, bi, bb, be, 2, 1, 2])


def _poly_poly(pa, pb):
    inter = _sh_clip(pa, pb)
    ia = _area2(inter) if len(inter) >= 3 else Fr(0)
    aa, ab = _area2(pa), _area2(pb)
    ii = 2 if ia > 0 else F_
    ie = 2 if aa > ia else F_
    ei = 2 if ab > ia else F_

    def _bnd_in_interior(edges_of, poly_other):
        for p, q in edges_of:
            if _clip_interval(p, q, poly_other, strict=True) is not None:
                return True
        return False

    ib = 1 if _bnd_in_interior(_edges(pb), pa) else F_
    bi = 1 if _bnd_in_interior(_edges(pa), pb) else F_

    bb = F_
    for ea in _edges(pa):
        for eb in _edges(pb):
            if _collinear_overlap_len2(ea, eb) > 0:
                bb = 1
                break
        if bb == 1:
            break
    if bb == F_:
        for ea in _edges(pa):
            for eb in _edges(pb):
                if _seg_seg_closed_intersect(ea, eb):
                    bb = 0
                    break
            if bb == 0:
                break

    def _bnd_exits(edges_of, poly_other):
        for p, q in edges_of:
            c = _clip_interval(p, q, poly_other, strict=False)
            if c is None or c[0] > 0 or c[1] < 1:
                return True
        return False

    be = 1 if _bnd_exits(_edges(pa), pb) else F_
    eb = 1 if _bnd_exits(_edges(pb), pa) else F_
    return _m([ii, ib, ie, bi, bb, be, ei, eb, 2])


# ------------------------------------------------------------------ public --


def exact_relate(ga, gb) -> str:
    """DE-9IM matrix for two geometries given as ('point', pt) /
    ('seg', (p, q)) / ('poly', [v0..vn CCW]) with Fraction coords."""
    ka, va = ga
    kb, vb = gb
    if ka == "point" and kb == "point":
        return _pt_pt(va, vb)
    if ka == "point" and kb == "seg":
        return _pt_seg(va, vb)
    if ka == "seg" and kb == "point":
        return _transpose(_pt_seg(vb, va))
    if ka == "point" and kb == "poly":
        return _pt_poly(va, vb)
    if ka == "poly" and kb == "point":
        return _transpose(_pt_poly(vb, va))
    if ka == "seg" and kb == "seg":
        return _seg_seg(va, vb)
    if ka == "seg" and kb == "poly":
        return _seg_poly(va, vb)
    if ka == "poly" and kb == "seg":
        return _transpose(_seg_poly(vb, va))
    if ka == "poly" and kb == "poly":
        return _poly_poly(va, vb)
    # chains (multi-segment polylines); a segment is the 1-segment chain
    def as_chain(k, v):
        return list(v) if k == "chain" else [v[0], v[1]]

    if ka == "point" and kb == "chain":
        return _pt_chain(va, vb)
    if ka == "chain" and kb == "point":
        return _transpose(_pt_chain(vb, va))
    if ka == "chain" and kb == "poly":
        return _chain_poly(va, vb)
    if ka == "poly" and kb == "chain":
        return _transpose(_chain_poly(vb, va))
    if ka in ("chain", "seg") and kb in ("chain", "seg"):
        return _chain_chain(as_chain(ka, va), as_chain(kb, vb))
    raise ValueError((ka, kb))


def to_wkt(g) -> str:
    k, v = g

    def c(pt):
        return f"{int(pt[0])} {int(pt[1])}"

    if k == "point":
        return f"POINT ({c(v)})"
    if k == "seg":
        return f"LINESTRING ({c(v[0])}, {c(v[1])})"
    if k == "chain":
        return "LINESTRING (" + ", ".join(c(p) for p in v) + ")"
    ring = ", ".join(c(p) for p in list(v) + [v[0]])
    return f"POLYGON (({ring}))"


# ------------------------------------------------------- lineal chains ------
# A 'chain' is a simple open polyline [v0..vn] (generator guarantees
# x-monotone, so no self-intersection).  Boundary = the two ENDS (the
# mod-2 rule for a simple open line); every interior vertex belongs to
# the INTERIOR — the cell most likely to trip a sweep that treats all
# vertices alike.


def _chain_segs(ch):
    return [(ch[i], ch[i + 1]) for i in range(len(ch) - 1)]


def locate_on_chain(pt, ch) -> str:
    if pt == ch[0] or pt == ch[-1]:
        return "B"
    for p, q in _chain_segs(ch):
        if pt == p or pt == q:
            return "I"  # interior vertex
        if _cross(p, q, pt) == 0:
            d = (q[0] - p[0], q[1] - p[1])
            t = (pt[0] - p[0]) * d[0] + (pt[1] - p[1]) * d[1]
            if 0 < t < d[0] * d[0] + d[1] * d[1]:
                return "I"
    return "E"


def _seg_crossing_point(sa, sb):
    """Unique intersection point of two NON-collinear closed segments,
    or None."""
    p1, q1 = sa
    p2, q2 = sb
    d1 = (q1[0] - p1[0], q1[1] - p1[1])
    d2 = (q2[0] - p2[0], q2[1] - p2[1])
    den = d1[0] * d2[1] - d1[1] * d2[0]
    if den == 0:
        return None
    t = ((p2[0] - p1[0]) * d2[1] - (p2[1] - p1[1]) * d2[0])
    u = ((p2[0] - p1[0]) * d1[1] - (p2[1] - p1[1]) * d1[0])
    t = Fr(t) / den
    u = Fr(u) / den
    if 0 <= t <= 1 and 0 <= u <= 1:
        return (p1[0] + t * d1[0], p1[1] + t * d1[1])
    return None


def _collinear_overlap_interval(seg, other):
    """Param interval of `seg` covered by a collinear `other`, or None."""
    p, q = seg
    if _cross(p, q, other[0]) != 0 or _cross(p, q, other[1]) != 0:
        return None
    d = (q[0] - p[0], q[1] - p[1])
    L = d[0] * d[0] + d[1] * d[1]

    def t_of(x):
        return Fr((x[0] - p[0]) * d[0] + (x[1] - p[1]) * d[1]) / L

    u0, u1 = sorted((t_of(other[0]), t_of(other[1])))
    lo, hi = max(Fr(0), u0), min(Fr(1), u1)
    return (lo, hi) if hi >= lo else None


def _covers_unit(intervals) -> bool:
    """Do the closed intervals cover [0, 1]?"""
    ivs = sorted(i for i in intervals if i is not None)
    reach = Fr(0)
    for lo, hi in ivs:
        if lo > reach:
            return False
        reach = max(reach, hi)
        if reach >= 1:
            return True
    return reach >= 1


def _chain_chain(ca, cb):
    segs_a, segs_b = _chain_segs(ca), _chain_segs(cb)
    ii = F_
    for sa in segs_a:
        for sb in segs_b:
            ov = _collinear_overlap_interval(sa, sb)
            if ov is not None and ov[1] > ov[0]:
                ii = 1
                break
        if ii == 1:
            break
    if ii == F_:
        for sa in segs_a:
            for sb in segs_b:
                p = _seg_crossing_point(sa, sb)
                if p is not None and locate_on_chain(p, ca) == "I" \
                        and locate_on_chain(p, cb) == "I":
                    ii = 0
                    break
            if ii == 0:
                break
    ends_a = (ca[0], ca[-1])
    ends_b = (cb[0], cb[-1])
    ib = 0 if any(locate_on_chain(x, ca) == "I" for x in ends_b) else F_
    bi = 0 if any(locate_on_chain(x, cb) == "I" for x in ends_a) else F_
    bb = 0 if any(x == y for x in ends_a for y in ends_b) else F_

    def _subset(segs, other_segs):
        for s in segs:
            ivs = [_collinear_overlap_interval(s, o) for o in other_segs]
            if not _covers_unit(ivs):
                return False
        return True

    ie = F_ if _subset(segs_a, segs_b) else 1
    ei = F_ if _subset(segs_b, segs_a) else 1
    be = 0 if any(locate_on_chain(x, cb) == "E" for x in ends_a) else F_
    eb = 0 if any(locate_on_chain(x, ca) == "E" for x in ends_b) else F_
    return _m([ii, ib, ie, bi, bb, be, ei, eb, 2])


def _pt_chain(pt, ch):
    loc = locate_on_chain(pt, ch)
    row1 = {"I": [0, F_, F_], "B": [F_, 0, F_], "E": [F_, F_, 0]}[loc]
    return _m(row1 + [F_, F_, F_] + [1, 0, 2])


def _chain_poly(ch, poly):
    segs = _chain_segs(ch)
    ii = 1 if any(
        _clip_interval(p, q, poly, strict=True) is not None for p, q in segs
    ) else F_
    ib = F_
    for s in segs:
        for e in _edges(poly):
            ov = _collinear_overlap_len2(s, e)
            if ov > 0:
                ib = 1
                break
        if ib == 1:
            break
    if ib == F_:
        # isolated boundary touches at clip-interval endpoints or chain
        # vertices that sit on the ring while being chain-INTERIOR
        cands = []
        for p, q in segs:
            c = _clip_interval(p, q, poly, strict=False)
            if c is not None:
                d = (q[0] - p[0], q[1] - p[1])
                for t in set(c):
                    cands.append((p[0] + t * d[0], p[1] + t * d[1]))
        cands += list(ch[1:-1])
        for x in cands:
            if locate_on_chain(x, ch) == "I" and locate_in_poly(x, poly) == "B":
                ib = 0
                break
    covered = all(
        (lambda c: c is not None and c[0] <= 0 and c[1] >= 1)(
            _clip_interval(p, q, poly, strict=False)
        )
        for p, q in segs
    )
    ie = F_ if covered else 1
    la, lb_ = locate_in_poly(ch[0], poly), locate_in_poly(ch[-1], poly)
    bi = 0 if "I" in (la, lb_) else F_
    bb = 0 if "B" in (la, lb_) else F_
    be = 0 if "E" in (la, lb_) else F_
    return _m([ii, ib, ie, bi, bb, be, 2, 1, 2])
