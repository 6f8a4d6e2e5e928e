"""Small pure-python geo codecs: geohash, Google encoded polyline, GeoURI.

Reference exporters/constructors: ``geometry/constructor/GeomFromGeoHash``,
``PointFromGeoHash``, ``linestring/constructor/LineStringFromEncodedPolyline``,
``geometry/exporter/AsGeoURI`` etc.  Implemented from the public format
specs (geohash base32; polyline-algorithm 1e-5 varint zigzag).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType, StructField, StructType
from .nullsafe import null_safe

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_IDX = {c: i for i, c in enumerate(_B32)}


def geohash_encode(lon: float, lat: float, precision: int = 12) -> str:
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out = []
    bit = 0
    ch = 0
    even = True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_B32[ch])
            bit, ch = 0, 0
    return "".join(out)


def geohash_decode(gh: str) -> tuple[float, float]:
    """Centre point of the geohash cell."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in gh:
        v = _B32_IDX[c]
        for shift in range(4, -1, -1):
            bit = (v >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (lon_lo + lon_hi) / 2, (lat_lo + lat_hi) / 2


def polyline_encode(coords) -> str:
    """Encoded polyline (Google varint scheme, 1e-5 precision) from
    (x, y) pairs, written in x,y ORDER — the reference's AsEncodedPolyline
    emits the raw coordinate order with no lat-first swap
    (AsEncodedPolylineTest.java golden ``~ps|U_p~iF…`` starts with
    x = -120.2; Google's convention would start with the latitude)."""
    out = []
    prev_x = prev_y = 0
    for x, y in coords:
        ix, iy = round(x * 1e5), round(y * 1e5)
        for v in (ix - prev_x, iy - prev_y):
            v = ~(v << 1) if v < 0 else v << 1
            while v >= 0x20:
                out.append(chr((0x20 | (v & 0x1F)) + 63))
                v >>= 5
            out.append(chr(v + 63))
        prev_x, prev_y = ix, iy
    return "".join(out)


def polyline_decode(s: str, precision: int = 5) -> list[tuple[float, float]]:
    """Inverse of :func:`polyline_encode` — (x, y) pairs in stream order.

    ``precision`` is the decimal-digit factor exponent
    (EncodedPolylineDatatype.decodePolyline's second argument; 5 for
    Google-style polylines, 6 for OSRM — LineFromEncodedPolyline.java)."""
    factor = 10.0 ** int(precision)
    coords, i, x, y = [], 0, 0, 0
    while i < len(s):
        for which in (0, 1):
            shift = result = 0
            while True:
                b = ord(s[i]) - 63
                i += 1
                result |= (b & 0x1F) << shift
                shift += 5
                if b < 0x20:
                    break
            d = ~(result >> 1) if result & 1 else result >> 1
            if which == 0:
                x += d
            else:
                y += d
        coords.append((x / factor, y / factor))
    return coords


# --------------------------------------------------------- Spark bindings --


@pandas_udf(StringType())
def st_geohash(lon: pd.Series, lat: pd.Series, precision: pd.Series) -> pd.Series:
    p = int(precision.iloc[0])
    return pd.Series([geohash_encode(lo, la, p) for lo, la in zip(lon, lat)])


_PT = StructType([StructField("lon", DoubleType()), StructField("lat", DoubleType())])


@pandas_udf(_PT)
def st_pointfromgeohash(gh: pd.Series) -> pd.DataFrame:
    pts = [geohash_decode(g) for g in gh]
    a = np.array(pts, dtype=np.float64).reshape(-1, 2)
    return pd.DataFrame({"lon": a[:, 0], "lat": a[:, 1]})


@pandas_udf(StringType())
@null_safe
def st_asencodedpolyline(wkb: pd.Series) -> pd.Series:
    from ..geom import wkt as W

    return wkb.map(lambda b: polyline_encode(W.from_wkb(b).parts[0].tolist()))
