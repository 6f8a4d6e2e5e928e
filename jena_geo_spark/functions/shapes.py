"""Spark UDFs for the attribute/transform long tail.

Reference: ``geometry/attribute/`` (MinimumBoundingCircle family,
MinimumRectangle, GeometricMedian, IsValid(Reason), PointOnSurface,
ConcaveHull) and ``geometry/transform/`` (Snap, Split, LineMerge,
LineSubstring, Segmentize, SimplifyVW, Normalize, MakeValid,
DelaunayTriangles, VoronoiDiagram).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..geom import linework as L
from ..geom import shapes as S
from ..geom import wkt as W
from .nullsafe import empty_geom_null, null_safe

_CIRCLE_T = StructType(
    [StructField("cx", DoubleType()), StructField("cy", DoubleType()), StructField("r", DoubleType())]
)
_POINT_T = StructType([StructField("x", DoubleType()), StructField("y", DoubleType())])


@pandas_udf(_CIRCLE_T)
@null_safe
def st_minimumboundingcircle(b: pd.Series) -> pd.DataFrame:
    rows = [S.min_bounding_circle(W.from_wkb(x).all_coords()) for x in b]
    a = np.array(rows, dtype=np.float64).reshape(-1, 3)
    return pd.DataFrame({"cx": a[:, 0], "cy": a[:, 1], "r": a[:, 2]})


@pandas_udf(BinaryType())
@empty_geom_null
def st_minimumrectangle(b: pd.Series) -> pd.Series:
    def mr(x):
        ring, _, _ = S.minimum_rectangle(W.from_wkb(x).all_coords())
        return W.to_wkb(W.Geom("polygon", [ring]))

    return b.map(mr)


@pandas_udf(DoubleType())
@empty_geom_null
def st_minimumdiameter(b: pd.Series) -> pd.Series:
    """Width of the minimum rotated rectangle (JTS MinimumDiameter length)."""

    def md(x):
        _, w, h = S.minimum_rectangle(W.from_wkb(x).all_coords())
        return float(min(w, h))

    return b.map(md)


@pandas_udf(_POINT_T)
@null_safe
def st_geometricmedian(b: pd.Series) -> pd.DataFrame:
    rows = [S.geometric_median(W.from_wkb(x).all_coords()) for x in b]
    a = np.array(rows, dtype=np.float64).reshape(-1, 2)
    return pd.DataFrame({"x": a[:, 0], "y": a[:, 1]})


@pandas_udf(BooleanType())
@null_safe
def st_isvalid(b: pd.Series) -> pd.Series:
    return b.map(lambda x: S.is_valid(W.from_wkb(x)))


@pandas_udf(StringType())
@null_safe
def st_isvalidreason(b: pd.Series) -> pd.Series:
    return b.map(lambda x: S.is_valid_reason(W.from_wkb(x)))


@pandas_udf(_POINT_T)
@null_safe
def st_pointonsurface(b: pd.Series) -> pd.DataFrame:
    from ..geom.overlay import interior_point

    rows = []
    for x in b:
        g = W.from_wkb(x)
        if g.kind in ("polygon", "multipolygon") and g.parts:
            rows.append(interior_point(g.exterior()))
        elif g.parts:
            c = g.all_coords()
            rows.append((float(c[0, 0]), float(c[0, 1])))
        else:
            rows.append((np.nan, np.nan))
    a = np.array(rows, dtype=np.float64).reshape(-1, 2)
    return pd.DataFrame({"x": a[:, 0], "y": a[:, 1]})


@pandas_udf(BinaryType())
@null_safe
def st_concavehull(b: pd.Series, threshold: pd.Series) -> pd.Series:
    return pd.Series(
        [
            W.to_wkb(W.Geom("polygon", [S.concave_hull(W.from_wkb(x).all_coords(), float(t))]))
            for x, t in zip(b, threshold)
        ]
    )


@pandas_udf(BinaryType())
@null_safe
def st_delaunaytriangles(b: pd.Series) -> pd.Series:
    def tri(x):
        tris, pts = S.delaunay(W.from_wkb(x).all_coords())
        polys = []
        for t in tris:
            ring = np.array([pts[t[0]], pts[t[1]], pts[t[2]], pts[t[0]]])
            polys.append([ring])
        return W.to_wkb(W.Geom("multipolygon", polys))

    return b.map(tri)


@pandas_udf(BinaryType())
def st_voronoipolygons(b: pd.Series) -> pd.Series:
    """Bounded Voronoi cells — VoronoiPolygons.java delegates to JTS
    ``VoronoiDiagramBuilder`` (cells clipped to the site envelope expanded
    by max(width, height)); exact for any site count via half-plane
    clipping (geom.shapes.voronoi_diagram)."""

    def vor(x):
        if x is None:
            return None
        cells = S.voronoi_diagram(W.from_wkb(x).all_coords())
        return W.to_wkb(W.Geom("multipolygon", [[ring] for _site, ring in cells]))

    return b.map(vor)


# ------------------------------------------------------------- linework ----


@pandas_udf(BinaryType())
@null_safe
def st_snap(b: pd.Series, target: pd.Series, tol: pd.Series) -> pd.Series:
    out = []
    for x, y, t in zip(b, target, tol):
        g = W.from_wkb(x)
        tchains = W.from_wkb(y).chains()
        if g.kind == "multipolygon":
            parts = [[L.snap(r, tchains, float(t)) for r in rings] for rings in g.parts]
        else:
            parts = [L.snap(p, tchains, float(t)) for p in g.parts]
        out.append(W.to_wkb(W.Geom(g.kind, parts)))
    return pd.Series(out)


@pandas_udf(BinaryType())
@empty_geom_null
def st_split(b: pd.Series, blade: pd.Series) -> pd.Series:
    """Split.java: the reference's only working branch is polygon ×
    linestring — node the polygon boundary with the blade, polygonize,
    and keep the faces whose interior point lies inside the input
    (``splitPolygon``/``polygonize``, returned as a GEOMETRYCOLLECTION of
    polygons).  Line × line (a PostGIS ST_Split case the reference
    rejects) keeps the noded-pieces MULTILINESTRING semantics."""
    from ..geom import arrangement as AR

    out = []
    for x, y in zip(b, blade):
        if x is None or y is None:
            out.append(None)
            continue
        g, gb = W.from_wkb(x), W.from_wkb(y)
        if g.kind in ("polygon", "multipolygon") and gb.kind in (
            "linestring",
            "multilinestring",
        ):
            rings = (
                [r for poly in g.parts for r in poly]
                if g.kind == "multipolygon"
                else list(g.parts)
            )
            chains = [np.asarray(r)[:, :2] for r in rings] + [
                np.asarray(c)[:, :2] for c in gb.chains()
            ]
            kept = []
            for face in AR.polygonize_chains(chains):
                ip = AR._face_interior_point(face.parts[0], face.parts[1:])
                if ip is not None and AR._geom_covers_point(g, ip[0], ip[1]):
                    kept.append(face)
            out.append(W.to_wkb(W.Geom("geometrycollection", kept)))
        elif g.kind == "linestring" and gb.kind == "linestring":
            pieces = L.split_line_by_line(g.parts[0], gb.parts[0])
            out.append(W.to_wkb(W.Geom("multilinestring", pieces)))
        else:
            # Split.java: "Constellation of input geometries is not
            # supported by this Split operator"
            raise ValueError(
                f"ST_Split: unsupported constellation {g.kind} x {gb.kind}"
            )
    return pd.Series(out)


@pandas_udf(BinaryType())
@null_safe
def st_linemerge(b: pd.Series) -> pd.Series:
    def lm(x):
        g = W.from_wkb(x)
        merged = L.line_merge(list(g.parts) if g.kind == "multilinestring" else [g.parts[0]])
        if len(merged) == 1:
            return W.to_wkb(W.Geom("linestring", merged))
        return W.to_wkb(W.Geom("multilinestring", merged))

    return b.map(lm)


@pandas_udf(BinaryType())
@null_safe
def st_linesubstring(b: pd.Series, f0: pd.Series, f1: pd.Series) -> pd.Series:
    return pd.Series(
        [
            W.to_wkb(W.Geom("linestring", [L.line_substring(W.from_wkb(x).parts[0], float(a), float(z))]))
            for x, a, z in zip(b, f0, f1)
        ]
    )


@pandas_udf(BinaryType())
@empty_geom_null
def st_segmentize(b: pd.Series, max_len: pd.Series) -> pd.Series:
    def seg(x, ml):
        g = W.from_wkb(x)
        if g.kind == "multipolygon":
            parts = [[L.segmentize(r, float(ml)) for r in rings] for rings in g.parts]
        else:
            parts = [L.segmentize(p, float(ml)) for p in g.parts]
        return W.to_wkb(W.Geom(g.kind, parts, g.dims))

    return pd.Series([seg(x, ml) for x, ml in zip(b, max_len)])


@pandas_udf(BinaryType())
@empty_geom_null
def st_densify(b: pd.Series, tol: pd.Series) -> pd.Series:
    """Reference ``geometry/transform/Densify.java`` = JTS
    ``Densifier.densify(geom, distanceTolerance)`` — the argument is a
    MAX SEGMENT LENGTH, not a point count (r4 golden: DensifyTest.java)."""
    def dn(x, t):
        g = W.from_wkb(x)
        if g.kind == "multipolygon":
            parts = [[L.densify_tol(r, float(t)) for r in rings] for rings in g.parts]
        else:
            parts = [L.densify_tol(p, float(t)) for p in g.parts]
        return W.to_wkb(W.Geom(g.kind, parts, g.dims))

    return pd.Series([dn(x, t) for x, t in zip(b, tol)])


@pandas_udf(BinaryType())
def st_densify_n(b: pd.Series, n_per_edge: pd.Series) -> pd.Series:
    """Fixed-count variant (n extra points per segment, fractions
    k/(n+1)) — kept for the SQL-oracle contract query."""
    def dn(x, n):
        g = W.from_wkb(x)
        if g.kind == "multipolygon":
            parts = [[L.densify(r, int(n)) for r in rings] for rings in g.parts]
        else:
            parts = [L.densify(p, int(n)) for p in g.parts]
        return W.to_wkb(W.Geom(g.kind, parts, g.dims))

    return pd.Series([dn(x, n) for x, n in zip(b, n_per_edge)])


@pandas_udf(BinaryType())
@null_safe
def st_simplifyvw(b: pd.Series, dist_tol: pd.Series) -> pd.Series:
    """JTS ``VWSimplifier`` convention (the reference delegates to it):
    the argument is a DISTANCE tolerance, squared into the effective-area
    threshold — not a raw area like PostGIS ST_SimplifyVW (r4 golden:
    SimplifyVWTest.java, tol 30 collapses the 5-point line to its
    endpoints)."""
    def sv(x, t):
        area = float(t) * float(t)
        g = W.from_wkb(x)
        if g.kind == "linestring":
            return W.to_wkb(W.Geom("linestring", [L.simplify_vw(g.parts[0], area)]))
        if g.kind == "polygon":
            return W.to_wkb(W.Geom("polygon", [L.simplify_vw(r, area) for r in g.parts]))
        return x

    return pd.Series([sv(x, t) for x, t in zip(b, dist_tol)])


@pandas_udf(BinaryType())
@null_safe
def st_normalize(b: pd.Series) -> pd.Series:
    # EMPTY stays EMPTY (JTS norm() of an empty geometry is itself) — the
    # linework.normalize empty guard handles it; only NULL maps to NULL
    return b.map(lambda x: None if x is None else W.to_wkb(L.normalize(W.from_wkb(x))))


@pandas_udf(BinaryType())
@null_safe
def st_makevalid(b: pd.Series) -> pd.Series:
    """Best-effort ST_MakeValid: close rings, drop repeated consecutive
    points; if a ring still self-intersects, fall back to its convex hull
    (documented simplification — full node-and-rebuild is out of scope)."""
    from ..geom.kernel import convex_hull

    def mv(x):
        g = W.from_wkb(x)
        if g.kind not in ("polygon", "multipolygon"):
            return x

        def fix_ring(r):
            keep = np.ones(len(r), dtype=bool)
            keep[1:] = (np.diff(r[:, :2], axis=0) != 0).any(axis=1)
            r = r[keep]
            if len(r) >= 2 and not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            if len(r) >= 4 and S._ring_self_intersects(r[:, :2]):
                return convex_hull(r)
            return r

        if g.kind == "polygon":
            return W.to_wkb(W.Geom("polygon", [fix_ring(r) for r in g.parts]))
        return W.to_wkb(
            W.Geom("multipolygon", [[fix_ring(r) for r in rings] for rings in g.parts])
        )

    return b.map(mv)
