"""Z/M-ordinate function family.

Reference: ``point/attribute/{Z,M,ZMax,ZMin,MMax,MMin,Zmflag}.java``,
``geometry/transform/{Force3D,Force3DM}.java``,
``geometry/LocateBetweenElevations.java``; codec support in geom/wkt.py
(ISO WKB +1000/+2000/+3000 type codes, WKT Z/M/ZM tags).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, DoubleType, IntegerType

from ..geom import wkt as W
from .nullsafe import null_safe


def _zcol(dims: str) -> int | None:
    return dims.index("Z") if "Z" in dims else None


def _mcol(dims: str) -> int | None:
    return dims.index("M") if "M" in dims else None


def _ordinate_udf(which: str, agg):
    @null_safe
    def wrapped(b: pd.Series) -> pd.Series:
        out = []
        for x in b:
            g = W.from_wkb(x)
            col = _zcol(g.dims) if which == "z" else _mcol(g.dims)
            if col is None or not g.parts:
                out.append(None)
            else:
                out.append(agg(g.all_coords()[:, col]))
        return pd.Series(out, dtype=object)

    return pandas_udf(wrapped, DoubleType())


st_z = _ordinate_udf("z", lambda v: float(v[0]))
st_m = _ordinate_udf("m", lambda v: float(v[0]))
st_zmin = _ordinate_udf("z", lambda v: float(v.min()))
st_zmax = _ordinate_udf("z", lambda v: float(v.max()))
st_mmin = _ordinate_udf("m", lambda v: float(v.min()))
st_mmax = _ordinate_udf("m", lambda v: float(v.max()))


@pandas_udf(IntegerType())
@null_safe
def st_zmflag(b: pd.Series) -> pd.Series:
    """PostGIS ST_Zmflag: 0 = 2D, 1 = 3DM, 2 = 3DZ, 3 = 4D."""
    flags = {"XY": 0, "XYM": 1, "XYZ": 2, "XYZM": 3}
    return b.map(lambda x: flags[W.from_wkb(x).dims])


def _map_parts(g: W.Geom, fn) -> list:
    if g.kind == "multipolygon":
        return [[fn(r) for r in rings] for rings in g.parts]
    return [fn(p) for p in g.parts]


@pandas_udf(BinaryType())
@null_safe
def st_force2d(b: pd.Series) -> pd.Series:
    def f2(x):
        g = W.from_wkb(x)
        return W.to_wkb(W.Geom(g.kind, _map_parts(g, lambda a: a[:, :2].copy()), "XY"))

    return b.map(f2)


@pandas_udf(BinaryType())
@null_safe
def st_force3dz(b: pd.Series, z: pd.Series) -> pd.Series:
    def f3(x, zv):
        g = W.from_wkb(x)
        if "Z" in g.dims:
            return x

        def widen(a):
            zc = np.full((len(a), 1), float(zv))
            if g.dims == "XYM":  # XYM → XYZM (Z inserted before M)
                return np.hstack([a[:, :2], zc, a[:, 2:3]])
            return np.hstack([a[:, :2], zc])

        dims = "XYZM" if g.dims == "XYM" else "XYZ"
        return W.to_wkb(W.Geom(g.kind, _map_parts(g, widen), dims))

    return pd.Series([f3(x, zv) for x, zv in zip(b, z)])


@pandas_udf(BinaryType())
@null_safe
def st_force3dm(b: pd.Series, mval: pd.Series) -> pd.Series:
    """Force XYM: Z is DROPPED, existing M kept, missing M defaulted —
    PostGIS ST_Force3DM and the reference's Force3DM.java agree (r4
    golden Force3DMTest.java: POLYGON Z → XYM with M = 0; our pre-r4
    XYZ → XYZM widening was a bug)."""
    def f3(x, mv):
        g = W.from_wkb(x)
        if g.dims == "XYM":
            return x

        def tom(a):
            if "M" in g.dims:  # XYZM: keep the trailing M column
                return np.hstack([a[:, :2], a[:, -1:]])
            mc = np.full((len(a), 1), float(mv))
            return np.hstack([a[:, :2], mc])

        return W.to_wkb(W.Geom(g.kind, _map_parts(g, tom), "XYM"))

    return pd.Series([f3(x, mv) for x, mv in zip(b, mval)])


@pandas_udf(DoubleType())
def st_3ddistance(a: pd.Series, b: pd.Series) -> pd.Series:
    """3-D min distance over vertex-to-segment projections of the
    coordinate chains (both orientations — JTS ``Distance3DOp`` shape)."""

    def chains3(g):
        z = _zcol(g.dims)
        out = []
        for c in g.chains():
            if z is None:
                out.append(np.column_stack([c[:, 0], c[:, 1], np.zeros(len(c))]))
            else:
                out.append(np.column_stack([c[:, 0], c[:, 1], c[:, z]]))
        return out

    def pt_seg3(p, a3, b3):
        d = b3 - a3
        ll = float(d @ d)
        t = 0.0 if ll == 0 else min(max(float((p - a3) @ d) / ll, 0.0), 1.0)
        c = a3 + t * d
        return float(((p - c) ** 2).sum())

    out = np.empty(len(a))
    for i, (x, y) in enumerate(zip(a, b)):
        ca = chains3(W.from_wkb(x))
        cb = chains3(W.from_wkb(y))
        best = np.inf
        for p_chain, q_chain in ((ca, cb), (cb, ca)):
            for pc in p_chain:
                for v in pc:
                    for qc in q_chain:
                        if len(qc) == 1:
                            best = min(best, float(((v - qc[0]) ** 2).sum()))
                        for j in range(len(qc) - 1):
                            best = min(best, pt_seg3(v, qc[j], qc[j + 1]))
        out[i] = np.sqrt(best)
    return pd.Series(out)


@pandas_udf(BinaryType())
@null_safe
def st_locate_between_elevations(b: pd.Series, zmin: pd.Series, zmax: pd.Series) -> pd.Series:
    """Sub-linestrings whose Z lies in [zmin, zmax]; segments are split at
    the elevation bounds by linear interpolation (reference
    ``LocateBetweenElevations.java`` / PostGIS semantics)."""

    def locate(x, lo, hi):
        g = W.from_wkb(x)
        z = _zcol(g.dims)
        if z is None or g.kind not in ("linestring", "multilinestring"):
            return W.to_wkb(W.Geom("multilinestring", [], g.dims))
        pieces = []
        for chain in g.parts if g.kind == "multilinestring" else [g.parts[0]]:
            cur = []
            for i in range(len(chain) - 1):
                p1, p2 = chain[i], chain[i + 1]
                z1, z2 = p1[z], p2[z]
                # parameter window where z ∈ [lo, hi]
                if z1 == z2:
                    ts = (0.0, 1.0) if lo <= z1 <= hi else None
                else:
                    t_lo = (lo - z1) / (z2 - z1)
                    t_hi = (hi - z1) / (z2 - z1)
                    t0, t1 = min(t_lo, t_hi), max(t_lo, t_hi)
                    t0, t1 = max(t0, 0.0), min(t1, 1.0)
                    ts = (t0, t1) if t0 <= t1 else None
                if ts is None:
                    if len(cur) >= 2:
                        pieces.append(np.array(cur))
                    cur = []
                    continue
                a0 = p1 + ts[0] * (p2 - p1)
                a1 = p1 + ts[1] * (p2 - p1)
                if not cur or not np.array_equal(cur[-1], a0):
                    if len(cur) >= 2:
                        pieces.append(np.array(cur))
                    cur = [a0]
                cur.append(a1)
            if len(cur) >= 2:
                pieces.append(np.array(cur))
        return W.to_wkb(W.Geom("multilinestring", pieces, g.dims))

    return pd.Series([locate(x, lo, hi) for x, lo, hi in zip(b, zmin, zmax)])
