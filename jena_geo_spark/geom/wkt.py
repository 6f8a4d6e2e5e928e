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
}
_WKB_KIND = {v: k for k, v in _WKB_CODE.items()}


@dataclass
class Geom:
    kind: str
    parts: list  # see module docstring

    # ---- convenience ----
    def all_coords(self) -> np.ndarray:
        out = []
        for p in self._flat_parts():
            out.append(p)
        return np.vstack(out) if out else np.empty((0, 2))

    def _flat_parts(self):
        if self.kind == "multipolygon":
            for rings in self.parts:
                yield from rings
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
        return self.parts[0]

    def chains(self) -> list:
        """Coordinate chains for distance/predicate kernels — one array per
        ring / line / point, with polygon rings explicitly closed.  Unlike
        ``all_coords`` this never bridges separate parts (a flattened vstack
        creates phantom segments between holes/parts — ADVICE r1), matching
        JTS ``DistanceOp`` which iterates component segments."""
        out = []
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
        return []


def _closed(ring: np.ndarray) -> np.ndarray:
    if len(ring) >= 2 and not (ring[0] == ring[-1]).all():
        return np.vstack([ring, ring[:1]])
    return ring


# --------------------------------------------------------------------- WKT --

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _parse_coord_seq(body: str) -> np.ndarray:
    pts = []
    for tok in body.split(","):
        nums = re.findall(_NUM, tok)
        if len(nums) < 2:
            raise ValueError(f"bad WKT coordinate: {tok!r}")
        pts.append((float(nums[0]), float(nums[1])))  # XY; Z/M ordinates dropped
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


def from_wkt(wkt: str) -> Geom:
    s = wkt.strip()
    m = re.match(r"^\s*([A-Za-z]+)\s*(?:Z|M|ZM)?\s*\((.*)\)\s*$", s, re.S)
    if not m:
        if re.match(r"^\s*([A-Za-z]+)\s+EMPTY\s*$", s):
            kind = s.split()[0].lower()
            return Geom(kind, [])
        raise ValueError(f"unparseable WKT: {wkt[:80]!r}")
    kind = m.group(1).lower()
    body = m.group(2)
    if kind == "point":
        return Geom("point", [_parse_coord_seq(body)])
    if kind == "linestring":
        return Geom("linestring", [_parse_coord_seq(body)])
    if kind == "polygon":
        rings = [_parse_coord_seq(g) for g in _split_groups(body)]
        return Geom("polygon", rings)
    if kind == "multipoint":
        return Geom("multipoint", [_parse_coord_seq(body.replace("(", "").replace(")", ""))])
    if kind == "multilinestring":
        return Geom("multilinestring", [_parse_coord_seq(g) for g in _split_groups(body)])
    if kind == "multipolygon":
        polys = []
        for g in _split_groups(body):
            polys.append([_parse_coord_seq(r) for r in _split_groups(g)])
        return Geom("multipolygon", polys)
    raise ValueError(f"unsupported WKT type: {kind}")


def _fmt(v: float) -> str:
    return repr(float(v)) if v != int(v) else str(int(v))


def _seq_to_wkt(a: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in a)


def to_wkt(g: Geom) -> str:
    k = g.kind
    if not g.parts:
        return f"{k.upper()} EMPTY"
    if k == "point":
        return f"POINT ({_seq_to_wkt(g.parts[0])})"
    if k == "linestring":
        return f"LINESTRING ({_seq_to_wkt(g.parts[0])})"
    if k == "polygon":
        rings = ", ".join(f"({_seq_to_wkt(r)})" for r in g.parts)
        return f"POLYGON ({rings})"
    if k == "multipoint":
        return f"MULTIPOINT ({_seq_to_wkt(g.parts[0])})"
    if k == "multilinestring":
        lines = ", ".join(f"({_seq_to_wkt(p)})" for p in g.parts)
        return f"MULTILINESTRING ({lines})"
    if k == "multipolygon":
        polys = ", ".join(
            "(" + ", ".join(f"({_seq_to_wkt(r)})" for r in rings) + ")" for rings in g.parts
        )
        return f"MULTIPOLYGON ({polys})"
    raise ValueError(k)


# --------------------------------------------------------------------- WKB --

def to_wkb(g: Geom) -> bytes:
    """Little-endian OGC WKB."""
    code = _WKB_CODE[g.kind]
    out = [b"\x01", struct.pack("<I", code)]
    if g.kind == "point":
        out.append(struct.pack("<dd", *g.parts[0][0]))
    elif g.kind in ("linestring", "multipoint"):
        a = g.parts[0]
        out.append(struct.pack("<I", len(a)))
        if g.kind == "multipoint":
            for x, y in a:
                out.append(b"\x01" + struct.pack("<Idd", 1, x, y))
        else:
            out.append(np.ascontiguousarray(a, dtype="<f8").tobytes())
    elif g.kind == "polygon":
        out.append(struct.pack("<I", len(g.parts)))
        for r in g.parts:
            out.append(struct.pack("<I", len(r)))
            out.append(np.ascontiguousarray(r, dtype="<f8").tobytes())
    elif g.kind == "multilinestring":
        out.append(struct.pack("<I", len(g.parts)))
        for p in g.parts:
            out.append(to_wkb(Geom("linestring", [p])))
    elif g.kind == "multipolygon":
        out.append(struct.pack("<I", len(g.parts)))
        for rings in g.parts:
            out.append(to_wkb(Geom("polygon", rings)))
    return b"".join(out)


def from_wkb(buf: bytes) -> Geom:
    g, _ = _read_wkb(memoryview(buf), 0)
    return g


def _read_wkb(mv: memoryview, off: int) -> tuple[Geom, int]:
    endian = "<" if mv[off] == 1 else ">"
    code = struct.unpack_from(endian + "I", mv, off + 1)[0] & 0xFF
    kind = _WKB_KIND[code]
    off += 5
    if kind == "point":
        x, y = struct.unpack_from(endian + "dd", mv, off)
        return Geom("point", [np.array([[x, y]])]), off + 16
    if kind == "linestring":
        n = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        a = np.frombuffer(mv, dtype=endian + "f8", count=2 * n, offset=off).reshape(n, 2).copy()
        return Geom("linestring", [a]), off + 16 * n
    if kind == "polygon":
        nr = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        rings = []
        for _ in range(nr):
            n = struct.unpack_from(endian + "I", mv, off)[0]
            off += 4
            rings.append(
                np.frombuffer(mv, dtype=endian + "f8", count=2 * n, offset=off).reshape(n, 2).copy()
            )
            off += 16 * n
        return Geom("polygon", rings), off
    if kind == "multipoint":
        n = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        pts = []
        for _ in range(n):
            g, off = _read_wkb(mv, off)
            pts.append(g.parts[0][0])
        return Geom("multipoint", [np.array(pts)]), off
    if kind in ("multilinestring", "multipolygon"):
        n = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        parts = []
        for _ in range(n):
            g, off = _read_wkb(mv, off)
            parts.append(g.parts if kind == "multipolygon" else g.parts[0])
        return Geom(kind, parts), off
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
    raise ValueError(g.kind)


def from_geojson(s: str) -> Geom:
    obj = json.loads(s)
    t = obj["type"].lower()
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
