"""WKT and OGC-WKB geometry codecs, from scratch (no shapely/JTS).

The reference accepts many literal encodings (WKT library, WKB/HexWKB
``datatype/geometry/WKBDatatype.java`` / ``HexWKBDatatype.java``, GeoJSON
``GeoJSONDatatype.java``, …).  We implement the core three — WKT, WKB
(little-endian OGC), GeoJSON — covering Point / LineString / Polygon /
MultiPoint / MultiLineString / MultiPolygon (XY).

Internal geometry value = ``Geom(kind, parts)`` where parts is a list of
(n,2) float64 arrays:
  point        → [ (1,2) ]
  linestring   → [ (n,2) ]
  polygon      → [ ring0, ring1, … ]  (ring0 exterior)
  multipoint   → [ (n,2) ]
  multilinestring → [ line0, line1, … ]
  multipolygon → [ [rings…], … ]  (list of lists)
"""

from __future__ import annotations

import json
import re
import struct
from dataclasses import dataclass

import numpy as np

_WKB_CODE = {
    "point": 1,
    "linestring": 2,
    "polygon": 3,
    "multipoint": 4,
    "multilinestring": 5,
    "multipolygon": 6,
    "geometrycollection": 7,
}
_WKB_KIND = {v: k for k, v in _WKB_CODE.items()}


@dataclass
class Geom:
    """kind + parts (+ optional dims for Z/M ordinates).

    ``dims`` ∈ {"XY", "XYZ", "XYM", "XYZM"}; coordinate arrays then have
    len(dims) columns.  All planar kernels read columns 0-1 only, so wider
    arrays flow through measures/predicates untouched (reference XYZ/XYM
    support: ``GeometryWrapper.java:1002-1046``, ``point/attribute/
    {Z,M,ZMax,...}.java``)."""

    kind: str
    parts: list  # see module docstring
    dims: str = "XY"

    # ---- convenience ----
    def all_coords(self) -> np.ndarray:
        out = []
        for p in self._flat_parts():
            out.append(p)
        return np.vstack(out) if out else np.empty((0, 2))

    @property
    def is_empty(self) -> bool:
        """True when the geometry has no coordinates.  THE emptiness test —
        `not g.parts` is wrong for WKB-decoded empty linestrings, whose
        parts is [(0,2) array], not []."""
        return all(len(p) == 0 for p in self._flat_parts())

    def _flat_parts(self):
        if self.kind == "multipolygon":
            for rings in self.parts:
                yield from rings
        elif self.kind == "geometrycollection":
            for member in self.parts:  # parts = list[Geom]
                yield from member._flat_parts()
        else:
            yield from self.parts

    def exterior(self) -> np.ndarray:
        """Exterior ring / primary coordinate chain.

        Empty geometries (``parts == []``, as produced by overlay ops on
        disjoint inputs) yield an empty (0,2) array so downstream measure /
        overlay kernels degrade to 0 instead of crashing (ADVICE r1)."""
        if not self.parts:
            return np.empty((0, 2), dtype=np.float64)
        if self.kind == "multipolygon":
            return self.parts[0][0]
        if self.kind == "geometrycollection":
            return self.parts[0].exterior()
        return self.parts[0]

    def chains(self) -> list:
        """Coordinate chains for distance/predicate kernels — one array per
        ring / line / point, with polygon rings explicitly closed.  Unlike
        ``all_coords`` this never bridges separate parts (a flattened vstack
        creates phantom segments between holes/parts — ADVICE r1), matching
        JTS ``DistanceOp`` which iterates component segments."""
        out = []
        if self.kind == "geometrycollection":
            for member in self.parts:
                out.extend(member.chains())
            return out
        if self.kind == "multipolygon":
            ringsets = self.parts
            for rings in ringsets:
                for r in rings:
                    out.append(_closed(r))
            return out
        if self.kind == "polygon":
            return [_closed(r) for r in self.parts]
        if self.kind == "multipoint":
            return [self.parts[0][i : i + 1] for i in range(len(self.parts[0]))] if self.parts else []
        return list(self.parts)

    def polygons(self) -> list:
        """List of [rings...] — one entry per member polygon ([] for
        non-areal kinds); normalises polygon vs multipolygon handling."""
        if self.kind == "polygon":
            return [self.parts] if self.parts else []
        if self.kind == "multipolygon":
            return [rings for rings in self.parts if rings]
        if self.kind == "geometrycollection":
            out = []
            for member in self.parts:
                out.extend(member.polygons())
            return out
        return []

    def members(self) -> list:
        """Member geometries — one Geom per constituent (self for atomics).

        Reference semantics: JTS ``Geometry.getGeometryN`` /
        ``getNumGeometries`` (used by ``NumGeometries.java``,
        ``GeometryN.java``, ``NumDistinctGeometries.java``)."""
        if self.kind == "geometrycollection":
            return list(self.parts)
        if self.kind == "multipoint":
            if not self.parts:
                return []
            return [
                Geom("point", [self.parts[0][i : i + 1]], self.dims)
                for i in range(len(self.parts[0]))
            ]
        if self.kind == "multilinestring":
            return [Geom("linestring", [p], self.dims) for p in self.parts]
        if self.kind == "multipolygon":
            return [Geom("polygon", rings, self.dims) for rings in self.parts]
        return [self] if self.parts else []


def _closed(ring: np.ndarray) -> np.ndarray:
    if len(ring) >= 2 and not (ring[0] == ring[-1]).all():
        return np.vstack([ring, ring[:1]])
    return ring


# --------------------------------------------------------------------- WKT --

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _parse_coord_seq(body: str, width: int = 2) -> np.ndarray:
    pts = []
    for tok in body.split(","):
        nums = re.findall(_NUM, tok)
        if len(nums) < width:
            raise ValueError(f"bad WKT coordinate: {tok!r}")
        pts.append(tuple(float(n) for n in nums[:width]))
    return np.array(pts, dtype=np.float64)


def _split_groups(body: str) -> list[str]:
    """Split 'a),(b' style nested parenthesised groups at depth 0 commas."""
    groups, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            groups.append(body[start:i])
            start = i + 1
    groups.append(body[start:])
    # strip exactly ONE paren layer — stripping all layers collapsed
    # MULTIPOLYGON's double-nested rings into per-coordinate fragments
    out = []
    for g in groups:
        g = g.strip()
        if g.startswith("(") and g.endswith(")"):
            g = g[1:-1].strip()
        out.append(g)
    return out


def _split_top_level(body: str) -> list[str]:
    """Split at depth-0 commas WITHOUT stripping parens (collection members
    are complete WKT strings like ``POINT (1 2)``)."""
    groups, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            groups.append(body[start:i])
            start = i + 1
    groups.append(body[start:])
    return [g.strip() for g in groups]


def from_wkt(wkt: str) -> Geom:
    s = wkt.strip()
    m = re.match(r"^\s*([A-Za-z]+)\s*(Z|M|ZM)?\s*\((.*)\)\s*$", s, re.S | re.I)
    if not m:
        if re.match(r"^\s*([A-Za-z]+)\s+EMPTY\s*$", s):
            kind = s.split()[0].lower()
            return Geom(kind, [])
        raise ValueError(f"unparseable WKT: {wkt[:80]!r}")
    kind = m.group(1).lower()
    if kind == "geometrycollection":
        members = [from_wkt(g) for g in _split_top_level(m.group(3))]
        dims = members[0].dims if members else "XY"
        return Geom("geometrycollection", members, dims)
    zm = (m.group(2) or "").upper()
    body = m.group(3)
    if not zm:
        # infer from the first coordinate's arity (bare 'POINT(1 2 3)')
        first = re.split(r"[,()]", body.strip().lstrip("("))[0]
        arity = len(re.findall(_NUM, first))
        zm = {3: "Z", 4: "ZM"}.get(arity, "")
    dims = {"": "XY", "Z": "XYZ", "M": "XYM", "ZM": "XYZM"}[zm]
    w = len(dims)

    def seq(b):
        return _parse_coord_seq(b, w)

    if kind == "point":
        return Geom("point", [seq(body)], dims)
    if kind == "linestring":
        return Geom("linestring", [seq(body)], dims)
    if kind == "polygon":
        if "(" not in body:
            # tolerate the single-paren form 'POLYGON(x y, x y, ...)' as a
            # bare exterior ring — the reference's own test model uses it
            # (owl/testdata.ttl house_1_geom)
            return Geom("polygon", [seq(body)], dims)
        return Geom("polygon", [seq(g) for g in _split_groups(body)], dims)
    if kind == "multipoint":
        return Geom("multipoint", [seq(body.replace("(", "").replace(")", ""))], dims)
    if kind == "multilinestring":
        return Geom("multilinestring", [seq(g) for g in _split_groups(body)], dims)
    if kind == "multipolygon":
        polys = []
        for g in _split_groups(body):
            polys.append([seq(r) for r in _split_groups(g)])
        return Geom("multipolygon", polys, dims)
    raise ValueError(f"unsupported WKT type: {kind}")


def _fmt(v: float) -> str:
    return repr(float(v)) if v != int(v) else str(int(v))


def _seq_to_wkt(a: np.ndarray) -> str:
    return ", ".join(" ".join(_fmt(v) for v in row) for row in a)


def to_wkt(g: Geom) -> str:
    k = g.kind
    tag = k.upper() + ({"XY": "", "XYZ": " Z", "XYM": " M", "XYZM": " ZM"}[g.dims])
    if not g.parts:
        return f"{tag} EMPTY"
    if k in ("point", "linestring", "multipoint"):
        if len(g.parts[0]) == 0:
            # WKB EMPTY decodes to one 0-point part; canonical WKT is
            # EMPTY, never "LINESTRING ()"
            return f"{tag} EMPTY"
        return f"{tag} ({_seq_to_wkt(g.parts[0])})"
    if k == "polygon":
        rings = ", ".join(f"({_seq_to_wkt(r)})" for r in g.parts)
        return f"{tag} ({rings})"
    if k == "multilinestring":
        lines = ", ".join(f"({_seq_to_wkt(p)})" for p in g.parts)
        return f"{tag} ({lines})"
    if k == "multipolygon":
        polys = ", ".join(
            "(" + ", ".join(f"({_seq_to_wkt(r)})" for r in rings) + ")" for rings in g.parts
        )
        return f"{tag} ({polys})"
    if k == "geometrycollection":
        return f"{tag} ({', '.join(to_wkt(member) for member in g.parts)})"
    raise ValueError(k)


# --------------------------------------------------------------------- WKB --

_DIMS_OFFSET = {"XY": 0, "XYZ": 1000, "XYM": 2000, "XYZM": 3000}
_OFFSET_DIMS = {v: k for k, v in _DIMS_OFFSET.items()}


def to_wkb(g: Geom, little: bool = True) -> bytes:
    """OGC WKB, little-endian by default (ISO Z/M type codes:
    +1000/+2000/+3000); ``little=False`` emits XDR/big-endian — the byte
    order JTS WKBWriter defaults to (AsHEXEWKB golden)."""
    e = "<" if little else ">"
    eb = b"\x01" if little else b"\x00"
    code = _WKB_CODE[g.kind] + _DIMS_OFFSET[g.dims]
    w = len(g.dims)
    out = [eb, struct.pack(e + "I", code)]
    if g.kind == "point":
        if not g.parts or len(g.parts[0]) == 0:
            # POINT EMPTY: all-NaN coordinates (OGC convention)
            out.append(struct.pack(f"{e}{w}d", *([float("nan")] * w)))
        else:
            out.append(struct.pack(f"{e}{w}d", *g.parts[0][0]))
    elif g.kind in ("linestring", "multipoint"):
        a = g.parts[0] if g.parts else np.empty((0, w))
        out.append(struct.pack(e + "I", len(a)))
        if g.kind == "multipoint":
            pt_code = struct.pack(e + "I", 1 + _DIMS_OFFSET[g.dims])
            for row in a:
                out.append(eb + pt_code + struct.pack(f"{e}{w}d", *row))
        else:
            out.append(np.ascontiguousarray(a, dtype=e + "f8").tobytes())
    elif g.kind == "polygon":
        out.append(struct.pack(e + "I", len(g.parts)))
        for r in g.parts:
            out.append(struct.pack(e + "I", len(r)))
            out.append(np.ascontiguousarray(r, dtype=e + "f8").tobytes())
    elif g.kind == "multilinestring":
        out.append(struct.pack(e + "I", len(g.parts)))
        for p in g.parts:
            out.append(to_wkb(Geom("linestring", [p], g.dims), little))
    elif g.kind == "multipolygon":
        out.append(struct.pack(e + "I", len(g.parts)))
        for rings in g.parts:
            out.append(to_wkb(Geom("polygon", rings, g.dims), little))
    elif g.kind == "geometrycollection":
        out.append(struct.pack(e + "I", len(g.parts)))
        for member in g.parts:
            out.append(to_wkb(member, little))
    return b"".join(out)


def from_wkb(buf: bytes) -> Geom:
    g, _ = _read_wkb(memoryview(buf), 0)
    return g


def _decode_type(code: int) -> tuple[str, str]:
    """(kind, dims) from an ISO or EWKB type code."""
    if code & 0x80000000 or code & 0x40000000:  # EWKB flags
        dims = {
            (True, False): "XYZ",
            (False, True): "XYM",
            (True, True): "XYZM",
        }[(bool(code & 0x80000000), bool(code & 0x40000000))]
        base = code & 0xFF
    else:
        offset = (code // 1000) * 1000
        dims = _OFFSET_DIMS.get(offset, "XY")
        base = code % 1000
    return _WKB_KIND[base], dims


def _read_wkb(mv: memoryview, off: int) -> tuple[Geom, int]:
    endian = "<" if mv[off] == 1 else ">"
    code = struct.unpack_from(endian + "I", mv, off + 1)[0]
    kind, dims = _decode_type(code)
    w = len(dims)
    off += 5
    if kind == "point":
        vals = struct.unpack_from(endian + f"{w}d", mv, off)
        if all(v != v for v in vals):  # all-NaN = POINT EMPTY
            return Geom("point", [], dims), off + 8 * w
        return Geom("point", [np.array([vals])], dims), off + 8 * w
    if kind == "linestring":
        n = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        a = np.frombuffer(mv, dtype=endian + "f8", count=w * n, offset=off).reshape(n, w).copy()
        return Geom("linestring", [a], dims), off + 8 * w * n
    if kind == "polygon":
        nr = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        rings = []
        for _ in range(nr):
            n = struct.unpack_from(endian + "I", mv, off)[0]
            off += 4
            rings.append(
                np.frombuffer(mv, dtype=endian + "f8", count=w * n, offset=off).reshape(n, w).copy()
            )
            off += 8 * w * n
        return Geom("polygon", rings, dims), off
    if kind == "multipoint":
        n = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        pts = []
        sub_dims = dims
        for _ in range(n):
            g, off = _read_wkb(mv, off)
            sub_dims = g.dims
            pts.append(g.parts[0][0])
        # n == 0 → canonical empty ([], printing MULTIPOINT EMPTY), not a
        # 1-D zero-length part that breaks parts[0][:, :2] downstream
        return Geom("multipoint", [np.array(pts)] if pts else [], sub_dims), off
    if kind in ("multilinestring", "multipolygon"):
        n = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        parts = []
        sub_dims = dims
        for _ in range(n):
            g, off = _read_wkb(mv, off)
            sub_dims = g.dims
            parts.append(g.parts if kind == "multipolygon" else g.parts[0])
        return Geom(kind, parts, sub_dims), off
    if kind == "geometrycollection":
        n = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        members = []
        sub_dims = dims
        for _ in range(n):
            g, off = _read_wkb(mv, off)
            sub_dims = g.dims
            members.append(g)
        return Geom("geometrycollection", members, sub_dims if n else dims), off
    raise ValueError(kind)


# ------------------------------------------------------------------ GeoJSON --

def to_geojson(g: Geom) -> str:
    def seq(a):
        return [[float(x), float(y)] for x, y in a]

    if g.kind == "point":
        return json.dumps({"type": "Point", "coordinates": seq(g.parts[0])[0]})
    if g.kind == "linestring":
        return json.dumps({"type": "LineString", "coordinates": seq(g.parts[0])})
    if g.kind == "polygon":
        return json.dumps({"type": "Polygon", "coordinates": [seq(r) for r in g.parts]})
    if g.kind == "multipoint":
        return json.dumps({"type": "MultiPoint", "coordinates": seq(g.parts[0])})
    if g.kind == "multilinestring":
        return json.dumps({"type": "MultiLineString", "coordinates": [seq(p) for p in g.parts]})
    if g.kind == "multipolygon":
        return json.dumps(
            {"type": "MultiPolygon", "coordinates": [[seq(r) for r in rings] for rings in g.parts]}
        )
    if g.kind == "geometrycollection":
        return json.dumps(
            {
                "type": "GeometryCollection",
                "geometries": [json.loads(to_geojson(member)) for member in g.parts],
            }
        )
    raise ValueError(g.kind)


def from_geojson(s: str) -> Geom:
    obj = json.loads(s)
    t = obj["type"].lower()
    if t == "geometrycollection":
        members = [from_geojson(json.dumps(sub)) for sub in obj["geometries"]]
        return Geom("geometrycollection", members, members[0].dims if members else "XY")
    c = obj["coordinates"]
    if t == "point":
        return Geom("point", [np.array([c], dtype=np.float64)])
    if t == "linestring":
        return Geom("linestring", [np.array(c, dtype=np.float64)])
    if t == "polygon":
        return Geom("polygon", [np.array(r, dtype=np.float64) for r in c])
    if t == "multipoint":
        return Geom("multipoint", [np.array(c, dtype=np.float64)])
    if t == "multilinestring":
        return Geom("multilinestring", [np.array(p, dtype=np.float64) for p in c])
    if t == "multipolygon":
        return Geom(
            "multipolygon", [[np.array(r, dtype=np.float64) for r in rings] for rings in c]
        )
    raise ValueError(t)


def wkb_is_empty(b) -> bool:
    """Cheap WKB emptiness test from the header only (no full decode) —
    used by the NULL/EMPTY masking wrappers so hot functions don't pay a
    second full parse per row.  Points are empty iff their ordinates are
    NaN (our encoder's convention); every other type carries a count at
    byte 5 — zero means empty.  A non-empty count is treated as non-empty
    without recursing (a MULTI geometry holding only EMPTY members is
    pathological and falls back to the slow path downstream)."""
    import struct as _struct

    if len(b) < 9:
        return True
    little = b[0] == 1
    fmt = "<I" if little else ">I"
    gtype = _struct.unpack_from(fmt, b, 1)[0] % 1000
    if gtype == 1:  # point: NaN ordinates encode EMPTY
        x = _struct.unpack_from("<d" if little else ">d", b, 5)[0]
        return x != x
    return _struct.unpack_from(fmt, b, 5)[0] == 0
