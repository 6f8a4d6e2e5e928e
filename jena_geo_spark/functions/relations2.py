"""Relation long tail: 3D distance family, equality variants, coordinate
relations, area similarity.

Reference classes (behaviour only): ``geometry/relation/Distance3D.java``,
``ClosestPoint3D.java``, ``ShortestLine3D.java``, ``LongestLine3D.java``,
``MaxDistance3D.java``, ``DWithin3D.java``, ``EqualNorm.java``,
``EqualType.java``, ``EqualSRS.java``, ``OrderingEquals.java``,
``ClosestCoordinate.java``, ``FurthestCoordinate.java``,
``AreaSimilarity.java`` (JTS ``AreaSimilarityMeasure``: area(A∩B)/area(A∪B)),
``IsMorePrecise.java``.

3D kernels: distances between piecewise-linear chains using full XYZ
coordinates (Z = 0 when absent); the max distance over polytope vertex sets
is attained at vertices, so MaxDistance3D scans vertex pairs exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, BooleanType, DoubleType, IntegerType, StringType

from ..geom import wkt as W
from ..geom.wkt import Geom
from .nullsafe import empty_geom_null

# -------------------------------------------------------------- 3D kernels --


def _chains3(g: Geom) -> list:
    """Chains as (n,3) XYZ arrays (Z=0 when absent)."""
    zi = g.dims.find("Z")
    out = []
    for ch in g.chains():
        a = np.asarray(ch, dtype=np.float64)
        if len(a) == 0:  # empty geometry contributes no chains
            continue
        if zi >= 0 and a.shape[1] > zi:
            out.append(np.column_stack([a[:, 0], a[:, 1], a[:, zi]]))
        else:
            out.append(np.column_stack([a[:, 0], a[:, 1], np.zeros(len(a))]))
    return out


def _seg_seg_nearest3(p1, p2, q1, q2):
    """Nearest points between 3D segments (clamped closed form)."""
    d1 = p2 - p1
    d2 = q2 - q1
    r = p1 - q1
    a = d1 @ d1
    e = d2 @ d2
    f = d2 @ r
    if a <= 1e-300 and e <= 1e-300:
        return p1, q1
    if a <= 1e-300:
        t = np.clip(f / e, 0.0, 1.0)
        return p1, q1 + t * d2
    c = d1 @ r
    if e <= 1e-300:
        s = np.clip(-c / a, 0.0, 1.0)
        return p1 + s * d1, q1
    b = d1 @ d2
    den = a * e - b * b
    s = np.clip((b * f - c * e) / den, 0.0, 1.0) if den > 1e-300 else 0.0
    t = (b * s + f) / e
    if t < 0.0:
        t = 0.0
        s = np.clip(-c / a, 0.0, 1.0)
    elif t > 1.0:
        t = 1.0
        s = np.clip((b - c) / a, 0.0, 1.0)
    return p1 + s * d1, q1 + t * d2


def nearest_points_3d(ga: Geom, gb: Geom):
    """(pa, pb, dist) — nearest 3D points between two geometries' linework
    / vertices (areal interiors not considered, matching the reference's
    JTS ``Distance3DOp`` behaviour for the shapes in its tests)."""
    best = (None, None, None)  # empty operand: no nearest pair (SQL NULL)
    ca, cb = _chains3(ga), _chains3(gb)
    if not ca or not cb:
        return best
    best = (None, None, math.inf)
    for a in ca:
        sa = [(a[i], a[i + 1]) for i in range(len(a) - 1)] or [(a[0], a[0])]
        for b in cb:
            sb = [(b[j], b[j + 1]) for j in range(len(b) - 1)] or [(b[0], b[0])]
            for p1, p2 in sa:
                for q1, q2 in sb:
                    pa, pb = _seg_seg_nearest3(p1, p2, q1, q2)
                    d = float(np.linalg.norm(pa - pb))
                    if d < best[2]:
                        best = (pa, pb, d)
    return best


def max_distance_3d(ga: Geom, gb: Geom):
    """(pa, pb, dist) — farthest vertex pair in 3D; Nones on empty input."""
    ca, cb = _chains3(ga), _chains3(gb)
    if not ca or not cb:
        return (None, None, None)
    va = np.vstack(ca)
    vb = np.vstack(cb)
    d2 = ((va[:, None, :] - vb[None, :, :]) ** 2).sum(axis=2)
    i, j = np.unravel_index(int(d2.argmax()), d2.shape)
    return va[i], vb[j], float(math.sqrt(d2[i, j]))


# ------------------------------------------------------------- 3D UDFs --


def _pair_udf(ret):
    def deco(fn):
        def wrapped(a: pd.Series, b: pd.Series) -> pd.Series:
            out = []
            for x, y in zip(a, b):
                if x is None or y is None:
                    out.append(None)
                    continue
                out.append(fn(W.from_wkb(x), W.from_wkb(y)))
            return pd.Series(out, dtype=object)

        wrapped.__name__ = fn.__name__
        return pandas_udf(wrapped, ret)

    return deco


@_pair_udf(DoubleType())
def st_distance3d(ga, gb):
    return nearest_points_3d(ga, gb)[2]


@_pair_udf(DoubleType())
def st_maxdistance3d(ga, gb):
    return max_distance_3d(ga, gb)[2]


@_pair_udf(BinaryType())
def st_3dclosestpoint(ga, gb):
    pa, _, _ = nearest_points_3d(ga, gb)
    if pa is None:
        return None
    return W.to_wkb(Geom("point", [pa[None, :]], "XYZ"))


@_pair_udf(BinaryType())
def st_3dshortestline(ga, gb):
    pa, pb, _ = nearest_points_3d(ga, gb)
    if pa is None:
        return None
    return W.to_wkb(Geom("linestring", [np.vstack([pa, pb])], "XYZ"))


@_pair_udf(BinaryType())
def st_3dlongestline(ga, gb):
    pa, pb, _ = max_distance_3d(ga, gb)
    if pa is None:
        return None
    return W.to_wkb(Geom("linestring", [np.vstack([pa, pb])], "XYZ"))


@pandas_udf(BooleanType())
@empty_geom_null
def st_3ddwithin(a: pd.Series, b: pd.Series, dist: pd.Series) -> pd.Series:
    out = []
    for x, y, d in zip(a, b, dist):
        if x is None or y is None:
            out.append(None)
            continue
        out.append(nearest_points_3d(W.from_wkb(x), W.from_wkb(y))[2] <= float(d))
    return pd.Series(out, dtype=object)


# ------------------------------------------------------- equality variants --


def st_orderingequals(a: Column, b: Column) -> Column:
    """Same geometry AND same coordinate order ⇒ byte-identical WKB (our
    encoder is canonical little-endian) — pure Catalyst, no UDF.  Plain
    ``==`` (not eqNullSafe): a NULL operand yields NULL, not TRUE."""
    return a == b


@_pair_udf(BooleanType())
def st_equalsnorm(ga, gb):
    from ..geom import linework as L

    return W.to_wkb(L.normalize(ga)) == W.to_wkb(L.normalize(gb))


@_pair_udf(BooleanType())
def st_equaltype(ga, gb):
    return ga.kind == gb.kind


def st_equalsrs(srid_a: Column, srid_b: Column) -> Column:
    """SRS equality.  Our engine carries SRID as a plain column next to the
    WKB (FIXTURES.md §1), so this is pure Catalyst; the reference compares
    the SRS URIs embedded in its geometry literals (EqualSRS.java)."""
    return srid_a.cast("int") == srid_b.cast("int")


@_pair_udf(IntegerType())
def st_ismoreprecise(ga, gb):
    """1/0/-1 comparing maximum significant decimal digits of the
    coordinates (IsMorePrecise.java intent; its JTS PrecisionModel
    comparison is degenerate for FLOATING models)."""

    def digits(g):
        best = 0
        for c in g.all_coords().ravel():
            s = repr(float(c))
            if "." in s and "e" not in s and "E" not in s:
                best = max(best, len(s.split(".")[1].rstrip("0")))
        return best

    da, db = digits(ga), digits(gb)
    return 1 if da > db else (0 if da == db else -1)


# ---------------------------------------------------- coordinate relations --


@_pair_udf(BinaryType())
def st_closestcoordinate(ga, gb):
    """Vertex (or vertices) of A closest to B's centroid-free geometry —
    reference ClosestCoordinate.java: closest coordinate of A to the point
    B; returns the point."""
    va = ga.all_coords()[:, :2]
    if not len(va):
        return None
    from ..geom import kernel as K

    pb = gb.all_coords()[:, :2]
    if not len(pb):
        return None
    # distance from each vertex of A to geometry B's vertex set
    d2 = ((va[:, None, :] - pb[None, :, :]) ** 2).sum(axis=2).min(axis=1)
    i = int(d2.argmin())
    return W.to_wkb(Geom("point", [va[i : i + 1]]))


@_pair_udf(BinaryType())
def st_furthestcoordinate(ga, gb):
    va = ga.all_coords()[:, :2]
    pb = gb.all_coords()[:, :2]
    if not len(va) or not len(pb):
        return None
    d2 = ((va[:, None, :] - pb[None, :, :]) ** 2).sum(axis=2).min(axis=1)
    i = int(d2.argmax())
    return W.to_wkb(Geom("point", [va[i : i + 1]]))


@_pair_udf(IntegerType())
def st_linecrossingdirection(ga, gb):
    """PostGIS ST_LineCrossingDirection codes (0 / ±1 single cross /
    ±2 multicross ending opposite / ±3 multicross ending same side).
    Reference LineCrossingDirection.java is a registered stub."""
    if ga.kind != "linestring" or gb.kind != "linestring" or not ga.parts or not gb.parts:
        return None
    a = np.asarray(ga.parts[0])[:, :2]
    b = np.asarray(gb.parts[0])[:, :2]
    signs = []
    for i in range(len(a) - 1):
        p1, p2 = a[i], a[i + 1]
        d1 = p2 - p1
        for j in range(len(b) - 1):
            q1, q2 = b[j], b[j + 1]
            d2 = q2 - q1
            den = d1[0] * d2[1] - d1[1] * d2[0]
            if abs(den) < 1e-300:
                continue
            t = ((q1[0] - p1[0]) * d2[1] - (q1[1] - p1[1]) * d2[0]) / den
            u = ((q1[0] - p1[0]) * d1[1] - (q1[1] - p1[1]) * d1[0]) / den
            if 0 <= t <= 1 and 0 <= u <= 1:
                signs.append(1 if den > 0 else -1)
    if not signs:
        return 0
    if len(signs) == 1:
        return signs[0]
    last = signs[-1]
    return 3 * last if signs[0] == last else 2 * last


# --------------------------------------------------------- area similarity --


def _area_of(g: Geom) -> float:
    from ..geom import kernel as K

    total = 0.0
    for rings in g.polygons():
        total += abs(K.ring_area(np.asarray(rings[0])[:, :2]))
        for hole in rings[1:]:
            total -= abs(K.ring_area(np.asarray(hole)[:, :2]))
    return total


@_pair_udf(DoubleType())
def st_areasimilarity(ga, gb):
    """JTS AreaSimilarityMeasure: area(A∩B) / area(A∪B) (spatial Jaccard)."""
    from ..geom import overlay as O

    if (
        ga.kind == gb.kind
        and len(ga.parts) == len(gb.parts)
        and np.array_equal(ga.all_coords(), gb.all_coords())  # cheap gate
        and _area_of(ga) > 0
        and W.to_wkb(ga) == W.to_wkb(gb)  # settles ring-boundary layout
    ):
        # structurally identical non-degenerate inputs: Jaccard is
        # exactly 1 — the general clip kernel's coincident-edge handling
        # perturbs the ring by last ulps (AreaSimilarityTest.java golden
        # is 1.0).  The coordinate comparison rejects nearly all distinct
        # pairs without re-encoding; zero-area pairs keep the overlay
        # path's None (0/0).
        return 1.0
    inter = O.overlay_geoms(ga, gb, "intersection")
    ia = _area_of(inter)
    ua = _area_of(ga) + _area_of(gb) - ia
    if ua <= 0:
        return None
    return ia / ua
