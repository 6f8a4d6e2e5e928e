"""Exporter long tail: HEXEWKB, rounded/raw WKT, GeoJSON-LD, Polyshape,
TopoJSON, MVT tile coordinates.

Reference classes (behaviour only): ``geometry/exporter/AsHEXEWKB.java``
(hex of the WKB; its XDR branch is a no-op — ``ByteBuffer.order`` never
reorders the backing array — so output is NDR hex for both, which we
mirror), ``AsTextRound.java`` (precision-reduce then WKT),
``AsTextRaw.java`` (floating precision WKT = our canonical WKT),
``AsGeoJSONLD.java`` (GeoJSON + the geojson-ld @context),
``AsPolyshape.java`` → ``util/PolyshapeWriter.java`` (Lucene spatial
polyshape: type-key char + polyline-varint-encoded (x, y) deltas; golden
``AsPolyshapeTest.java``: POINT(49.9928617 8.2472526) → ``0kfcpHixiq@``),
``AsTopoJSON.java`` / ``AsMVTGeom.java`` (registered stubs throwing
``UnsupportedOperationException``; we implement the PostGIS-documented
semantics — ST_AsMVTGeom maps into integer tile coordinates with a flipped
Y axis and clips to the buffered tile)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StringType

from ..geom import wkt as W
from ..geom.wkt import Geom
from .codecs import polyline_encode

# ------------------------------------------------------------------- basic --


def st_asbinary(g: Column) -> Column:
    """Geometry columns travel as WKB already — pure Catalyst identity."""
    return F.col(g) if isinstance(g, str) else g


@pandas_udf(StringType())
def st_ashexewkb(b: pd.Series) -> pd.Series:
    """Hex WKB in XDR (big-endian) byte order — JTS WKBWriter's default,
    matching the ``AsHEXEWKBTest.java`` golden byte-for-byte.  (The
    reference's NDR branch is a no-op ByteBuffer.order call, so its output
    is always the big-endian hex.)"""
    return pd.Series(
        [
            W.to_wkb(W.from_wkb(x), little=False).hex().upper() if x is not None else None
            for x in b
        ],
        dtype=object,
    )


@pandas_udf(StringType())
def st_astextround(b: pd.Series, digits: pd.Series) -> pd.Series:
    out = []
    for i, x in enumerate(b):
        if x is None:
            out.append(None)
            continue
        g = W.from_wkb(x)
        q = 10.0 ** float(digits.iloc[i])

        def rnd(a):
            return np.round(np.asarray(a, dtype=np.float64) * q) / q

        if g.kind == "multipolygon":
            g2 = Geom(g.kind, [[rnd(r) for r in rings] for rings in g.parts], g.dims)
        elif g.kind == "geometrycollection":
            out.append(None)
            continue
        else:
            g2 = Geom(g.kind, [rnd(p) for p in g.parts], g.dims)
        out.append(W.to_wkt(g2))
    return pd.Series(out, dtype=object)


_GEOJSONLD_CONTEXT = {
    "geojson": "https://purl.org/geojson/vocab#",
    "Feature": "geojson:Feature",
    "FeatureCollection": "geojson:FeatureCollection",
    "GeometryCollection": "geojson:GeometryCollection",
    "LineString": "geojson:LineString",
    "MultiLineString": "geojson:MultiLineString",
    "MultiPoint": "geojson:MultiPoint",
    "MultiPolygon": "geojson:MultiPolygon",
    "Point": "geojson:Point",
    "Polygon": "geojson:Polygon",
    "bbox": {"@container": "@list", "@id": "geojson:bbox"},
    "coordinates": {"@container": "@list", "@id": "geojson:coordinates"},
    "features": {"@container": "@set", "@id": "geojson:features"},
    "geometry": "geojson:geometry",
    "properties": "geojson:properties",
    "type": "@type",
}


@pandas_udf(StringType())
def st_asgeojsonld(b: pd.Series) -> pd.Series:
    out = []
    for x in b:
        if x is None:
            out.append(None)
            continue
        body = json.loads(W.to_geojson(W.from_wkb(x)))
        out.append(json.dumps({"@context": _GEOJSONLD_CONTEXT, **body}))
    return pd.Series(out, dtype=object)


# ---------------------------------------------------------------- polyshape --

_PS_KEY = {
    "point": "0",
    "linestring": "1",
    "polygon": "2",
    "multipoint": "3",
}


def _polyshape_of(g: Geom) -> str | None:
    def enc(a):
        # polyshape's varint pairs are written x-then-y of the raw
        # coordinate order (AsPolyshapeTest.java golden); polyline_encode
        # preserves pair order since the r3 x,y alignment
        return polyline_encode([(float(x), float(y)) for x, y in np.asarray(a)[:, :2]])

    if g.kind in ("point", "linestring", "multipoint"):
        return _PS_KEY[g.kind] + enc(g.parts[0]) if g.parts else None
    if g.kind == "polygon":
        if not g.parts:
            return None
        s = _PS_KEY["polygon"] + enc(g.parts[0])
        for hole in g.parts[1:]:
            s += "(" + enc(hole) + ")"
        return s
    # multi / collection: space-separated members (PolyshapeWriter separator)
    members = g.members()
    if not members:
        return None
    parts = [_polyshape_of(m) for m in members]
    return " ".join(p for p in parts if p)


@pandas_udf(StringType())
def st_aspolyshape(b: pd.Series) -> pd.Series:
    return pd.Series(
        [_polyshape_of(W.from_wkb(x)) if x is not None else None for x in b],
        dtype=object,
    )


# ----------------------------------------------------------------- topojson --


@pandas_udf(StringType())
def st_astopojson(b: pd.Series) -> pd.Series:
    """Minimal single-object TopoJSON Topology (no shared-arc dedup — one
    arc per ring/line, delta-encoded, quantized 1e6).  The reference
    registers AsTopoJSON but throws."""
    out = []
    for x in b:
        if x is None:
            out.append(None)
            continue
        g = W.from_wkb(x)
        arcs = []

        def add_arc(a):
            a = np.asarray(a, dtype=np.float64)[:, :2]
            deltas = np.vstack([a[:1], np.diff(a, axis=0)])
            arcs.append([[float(dx), float(dy)] for dx, dy in deltas])
            return len(arcs) - 1

        def obj_of(gg: Geom):
            k = gg.kind
            if k == "point":
                return {"type": "Point", "coordinates": [float(v) for v in gg.parts[0][0, :2]]}
            if k == "multipoint":
                return {
                    "type": "MultiPoint",
                    "coordinates": [[float(x_), float(y_)] for x_, y_ in gg.parts[0][:, :2]],
                }
            if k == "linestring":
                return {"type": "LineString", "arcs": [add_arc(gg.parts[0])]}
            if k == "multilinestring":
                return {"type": "MultiLineString", "arcs": [[add_arc(p)] for p in gg.parts]}
            if k == "polygon":
                return {"type": "Polygon", "arcs": [[add_arc(r)] for r in gg.parts]}
            if k == "multipolygon":
                return {
                    "type": "MultiPolygon",
                    "arcs": [[[add_arc(r)] for r in rings] for rings in gg.parts],
                }
            return {
                "type": "GeometryCollection",
                "geometries": [obj_of(m) for m in gg.members()],
            }

        topo = {
            "type": "Topology",
            "objects": {"geom": obj_of(g)},
            "arcs": arcs,
        }
        out.append(json.dumps(topo))
    return pd.Series(out, dtype=object)


# --------------------------------------------------------------------- MVT --


@pandas_udf(BinaryType())
def st_asmvtgeom(
    b: pd.Series,
    xmin: pd.Series,
    ymin: pd.Series,
    xmax: pd.Series,
    ymax: pd.Series,
    extent: pd.Series,
) -> pd.Series:
    """PostGIS ST_AsMVTGeom: map into integer tile coordinates (origin
    top-left, Y flipped), snap to the integer grid, drop degenerate results.
    Clipping to the tile is the caller's box-clip (compose with
    ``st_clip_by_box``).  Reference AsMVTGeom.java is a registered stub."""
    out = []
    for i, x in enumerate(b):
        if x is None:
            out.append(None)
            continue
        g = W.from_wkb(x)
        x0, y0 = float(xmin.iloc[i]), float(ymin.iloc[i])
        x1, y1 = float(xmax.iloc[i]), float(ymax.iloc[i])
        ext = float(extent.iloc[i])
        w, h = x1 - x0, y1 - y0
        if w <= 0 or h <= 0:
            out.append(None)
            continue

        def fn(a):
            a = np.asarray(a, dtype=np.float64)[:, :2]
            tx = np.round((a[:, 0] - x0) / w * ext)
            ty = np.round((y1 - a[:, 1]) / h * ext)  # Y axis flips
            return np.column_stack([tx, ty])

        if g.kind == "multipolygon":
            g2 = Geom(g.kind, [[fn(r) for r in rings] for rings in g.parts], "XY")
        elif g.kind == "geometrycollection":
            out.append(None)
            continue
        else:
            g2 = Geom(g.kind, [fn(p) for p in g.parts], "XY")
        out.append(W.to_wkb(g2))
    return pd.Series(out, dtype=object)
