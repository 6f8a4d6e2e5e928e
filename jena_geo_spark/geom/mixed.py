"""Mixed-dimension overlay set ops (point×line, point×polygon,
line×polygon, point×point) with JTS ``OverlayOp`` result shaping — the
semantic model behind the reference's registered ``ST_Intersection`` /
``ST_Union`` / ``ST_Difference`` / ``ST_SymDifference``
(``PostGISConfig.java``; JTS delegates every mixed-dimension pair to
``OverlayOp``).  The equal-dimension pairs stay on their dedicated
kernels (areal boolean overlay, 1D linework overlay); this module covers
every pair where the dimensions differ, plus the 0D×0D case.

Method: puntal sides are classified point-by-point with the exact
``relate.locate`` walker; lineal sides are split at every intersection
with the other geometry (``relate._split_points_on_chain`` — between
split points the classification is constant, so midpoint classification
is EXACT) and sub-segments are kept or dropped by where their midpoint
lies.  Isolated touch points (a line meeting a polygon boundary at a
single vertex with both adjacent sub-segments outside) surface as POINT
members, matching JTS's mixed GEOMETRYCOLLECTION results.
"""

from __future__ import annotations

import numpy as np

from . import relate as R
from .wkt import Geom

__all__ = ["overlay_mixed", "dim_class"]


def dim_class(g: Geom) -> int:
    return R._dim_class(g)


def _pts(g: Geom) -> list[tuple[float, float]]:
    c = g.all_coords()
    return [] if len(c) == 0 else [(float(x), float(y)) for x, y in c[:, :2]]


def _covered(p: tuple[float, float], g: Geom) -> bool:
    return R.locate(p[0], p[1], g) != "exterior"


def _puntal(points: list[tuple[float, float]]) -> Geom:
    # de-dup while keeping first-seen order (JTS unions repeated points)
    seen: dict[tuple[float, float], None] = {}
    for p in points:
        seen.setdefault(p, None)
    pts = list(seen)
    if not pts:
        return Geom("multipoint", [])
    arr = np.array(pts, dtype=np.float64)
    if len(pts) == 1:
        return Geom("point", [arr])
    return Geom("multipoint", [arr])


def _lineal(chains: list[np.ndarray]) -> Geom:
    if not chains:
        return Geom("multilinestring", [])
    if len(chains) == 1:
        return Geom("linestring", chains)
    return Geom("multilinestring", chains)


def _collection(members: list[Geom]) -> Geom:
    members = [m for m in members if not _is_empty(m)]
    if not members:
        return Geom("multipoint", [])
    if len(members) == 1:
        return members[0]
    return Geom("geometrycollection", members)


def _is_empty(g: Geom) -> bool:
    return len(g.all_coords()) == 0


def _clip_chains(
    g: Geom, other: Geom, keep_covered: bool
) -> tuple[list[np.ndarray], list[tuple[float, float]]]:
    """Sub-chains of lineal ``g`` whose midpoints are covered by
    (``keep_covered=True``) / exterior to (False) ``other``, merged back
    into maximal polylines, plus — for the covered direction — isolated
    non-exterior split points not on any kept sub-segment (JTS's 0D touch
    members of a mixed intersection)."""
    other_chains = other.chains()
    other_pts = _pts(other) if dim_class(other) == 0 else None
    kept: list[np.ndarray] = []
    touch: list[tuple[float, float]] = []
    for chain in g.chains():
        chain = np.asarray(chain, dtype=np.float64)[:, :2]
        if len(chain) < 2:
            continue
        walk = R._split_points_on_chain(chain, other_chains, other_pts)
        cur: list[tuple[float, float]] = []
        j = 0
        while j + 2 < len(walk):
            ax, ay, av = walk[j]
            mx, my, mv = walk[j + 1]
            bx, by, _ = walk[j + 2]
            if not av or mv:  # resync (defensive; the walk alternates)
                j += 1
                continue
            inside = _covered((mx, my), other)
            if inside == keep_covered:
                if not cur:
                    cur = [(ax, ay)]
                cur.append((bx, by))
            else:
                if cur:
                    kept.append(np.array(cur))
                    cur = []
                if keep_covered and _covered((ax, ay), other):
                    touch.append((ax, ay))
            j += 2
        if cur:
            kept.append(np.array(cur))
        # trailing vertex of a fully-excluded chain can still touch
        if keep_covered and len(chain):
            last = (float(chain[-1, 0]), float(chain[-1, 1]))
            if _covered(last, other):
                touch.append(last)
    if not keep_covered:
        touch = []
    elif kept:
        on_kept = set()
        for p in touch:
            if any(R._point_on_chains(p[0], p[1], [c]) for c in kept):
                on_kept.add(p)
        touch = [p for p in dict.fromkeys(touch) if p not in on_kept]
    else:
        touch = list(dict.fromkeys(touch))
    return kept, touch


def overlay_mixed(ga: Geom, gb: Geom, op: str) -> Geom:
    """JTS ``OverlayOp`` for dimension pairs the equal-dimension kernels
    don't own: any (da, db) with da != db, and 0D×0D."""
    da, db = dim_class(ga), dim_class(gb)

    if da == 0 and db == 0:
        a, b = _pts(ga), _pts(gb)
        bset, aset = set(b), set(a)
        if op == "intersection":
            return _puntal([p for p in a if p in bset])
        if op == "union":
            return _puntal(a + [p for p in b if p not in aset])
        if op == "difference":
            return _puntal([p for p in a if p not in bset])
        if op == "symdifference":
            return _puntal(
                [p for p in a if p not in bset]
                + [p for p in b if p not in aset]
            )
        raise ValueError(f"unknown overlay op {op!r}")

    # orient: low = the lower-dimension side
    flipped = da > db
    low, high = (gb, ga) if flipped else (ga, gb)

    def low_in() -> Geom:  # parts of `low` covered by `high`
        if dim_class(low) == 0:
            return _puntal([p for p in _pts(low) if _covered(p, high)])
        chains, touch = _clip_chains(low, high, keep_covered=True)
        if chains and touch:
            return _collection(
                [Geom("point", [np.array([p])]) for p in touch]
                + [Geom("linestring", [c]) for c in chains]
            )
        if chains:
            return _lineal(chains)
        if touch:
            return _puntal(touch)
        return Geom("multipoint", []) if dim_class(low) == 0 else _lineal([])

    def low_out() -> Geom:  # parts of `low` exterior to `high`
        if dim_class(low) == 0:
            return _puntal([p for p in _pts(low) if not _covered(p, high)])
        chains, _ = _clip_chains(low, high, keep_covered=False)
        return _lineal(chains)

    if op == "intersection":
        return low_in()
    if op == "union" or op == "symdifference":
        # JTS: the higher-dim geometry absorbs covered lower-dim parts;
        # symDifference(low, high) = (low \ high) ∪ (high \ low) and
        # high \ low == high, so both ops produce the same collection
        rest = low_out()
        return _collection([rest, high]) if not _is_empty(rest) else high
    if op == "difference":
        return low_out() if not flipped else high
    raise ValueError(f"unknown overlay op {op!r}")
