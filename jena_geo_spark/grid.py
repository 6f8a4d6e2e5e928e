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
    out_cells, out_owner = [], []
    for i in range(len(cid)):
        s = int(target_res - res[i])
        if s < 0:
            raise ValueError("cell finer than target_res")
        ix, iy = cell_xy(cid[i : i + 1])
        base_x, base_y = int(ix[0]) << s, int(iy[0]) << s
        k = 1 << s
        gx, gy = np.meshgrid(np.arange(k, dtype=np.int64), np.arange(k, dtype=np.int64))
        cells = pack(target_res, base_x + gx.ravel(), base_y + gy.ravel())
        out_cells.append(cells)
        out_owner.append(np.full(len(cells), i, dtype=np.int64))
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
    # seed: coarsest cells overlapping the polygon bbox at min_res
    n0 = 1 << min_res
    fx0 = int(np.clip((poly[:, 0].min() - _LON_MIN) / _LON_SPAN * n0, 0, n0 - 1))
    fx1 = int(np.clip((poly[:, 0].max() - _LON_MIN) / _LON_SPAN * n0, 0, n0 - 1))
    fy0 = int(np.clip((poly[:, 1].min() - _LAT_MIN) / _LAT_SPAN * n0, 0, n0 - 1))
    fy1 = int(np.clip((poly[:, 1].max() - _LAT_MIN) / _LAT_SPAN * n0, 0, n0 - 1))
    frontier = [
        int(pack(min_res, np.array([x]), np.array([y]))[0])
        for x in range(fx0, fx1 + 1)
        for y in range(fy0, fy1 + 1)
    ]
    out: list[int] = []
    while frontier:
        # stop refining when the budget is reached: keep remaining frontier
        if len(out) + len(frontier) >= max_cells:
            for c in frontier:
                xmin, ymin, xmax, ymax = (float(v[0]) for v in cell_bounds(np.array([c])))
                if _rect_polygon_relation(xmin, ymin, xmax, ymax, poly) != 0:
                    out.append(c)
            break
        nxt: list[int] = []
        for c in frontier:
            xmin, ymin, xmax, ymax = (float(v[0]) for v in cell_bounds(np.array([c])))
            rel = _rect_polygon_relation(xmin, ymin, xmax, ymax, poly)
            if rel == 0:
                continue
            r = int(cell_res(np.array([c]))[0])
            if rel == 2 or r >= max_res:
                out.append(c)
            else:
                nxt.extend(int(ch) for ch in children(c))
        frontier = nxt
    return np.array(sorted(set(out)), dtype=np.int64)


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
