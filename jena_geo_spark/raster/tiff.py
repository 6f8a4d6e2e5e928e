"""Baseline TIFF 6.0 encoder/decoder — pure struct packing, no codec deps.

Implements the surface the reference STUBS OUT (``raster/exporter/
AsTIFF.java`` throws ``UnsupportedOperationException`` with a commented
geotoolkit ``TiffImageWriter`` sketch): uncompressed little-endian TIFF with
one strip, chunky band interleave, plus the two core GeoTIFF georeferencing
tags (ModelPixelScale 33550, ModelTiepoint 33922) so the WKB raster's
geotransform survives the export.

Scope: encode any ``wkb_raster.Raster`` whose bands share one pixel type;
decode only what this module encodes (round-trip testing + header goldens).
Python runs once per DISTINCT raster payload inside the pandas UDF — the
byte assembly is numpy ``tobytes`` on the stacked band cube, not per-pixel.
"""

from __future__ import annotations

import struct

import numpy as np

from .wkb_raster import PIXEL_DTYPES, Band, Raster

# pixtype → (numpy little-endian dtype, TIFF SampleFormat)
_SAMPLEFORMAT = {  # 1 = unsigned int, 2 = signed int, 3 = IEEE float
    "u1": 1,
    "u2": 1,
    "u4": 1,
    "i1": 2,
    "i2": 2,
    "i4": 2,
    "f4": 3,
    "f8": 3,
}

_TYPE_SHORT, _TYPE_LONG, _TYPE_RATIONAL, _TYPE_DOUBLE = 3, 4, 5, 12
_TYPE_SIZE = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_RATIONAL: 8, _TYPE_DOUBLE: 8}


def encode_tiff(r: Raster) -> bytes:
    """Uncompressed little-endian baseline TIFF of all bands (chunky
    interleave, one strip).  Requires ≥1 band, uniform pixel type."""
    if not r.bands:
        raise ValueError("raster has no bands")
    pixtypes = {b.pixtype for b in r.bands}
    if len(pixtypes) > 1:
        raise ValueError(f"mixed band pixel types not encodable: {sorted(pixtypes)}")
    np_code, size = PIXEL_DTYPES[r.bands[0].pixtype]
    dtype = np.dtype("<" + np_code)
    spp = len(r.bands)
    cube = np.stack([b.data for b in r.bands], axis=-1).astype(dtype, copy=False)
    # GeoTIFF rows run down-image (ScaleY stored positive, tiepoint at the
    # TOP-left); a bottom-up raster (scale_y > 0) must flip its rows and
    # anchor the tiepoint at its maximal-y edge, or consumers mirror it
    # vertically (same normalisation as raster_to_aaigrid)
    ip_y = r.ip_y
    if r.scale_y > 0:
        cube = cube[::-1]
        ip_y = r.ip_y + r.height * r.scale_y
    data = np.ascontiguousarray(cube).tobytes()

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def short(v: int) -> bytes:
        return struct.pack("<H", v)

    def long_(v: int) -> bytes:
        return struct.pack("<I", v)

    bits = short(size * 8) * spp
    sfmt = short(_SAMPLEFORMAT[np_code]) * spp
    entries.append((256, _TYPE_LONG, 1, long_(r.width)))  # ImageWidth
    entries.append((257, _TYPE_LONG, 1, long_(r.height)))  # ImageLength
    entries.append((258, _TYPE_SHORT, spp, bits))  # BitsPerSample
    entries.append((259, _TYPE_SHORT, 1, short(1)))  # Compression = none
    entries.append((262, _TYPE_SHORT, 1, short(1)))  # Photometric = BlackIsZero
    entries.append((273, _TYPE_LONG, 1, b"\0\0\0\0"))  # StripOffsets (patched)
    entries.append((277, _TYPE_SHORT, 1, short(spp)))  # SamplesPerPixel
    entries.append((278, _TYPE_LONG, 1, long_(r.height)))  # RowsPerStrip
    entries.append((279, _TYPE_LONG, 1, long_(len(data))))  # StripByteCounts
    entries.append((282, _TYPE_RATIONAL, 1, struct.pack("<II", 72, 1)))
    entries.append((283, _TYPE_RATIONAL, 1, struct.pack("<II", 72, 1)))
    entries.append((284, _TYPE_SHORT, 1, short(1)))  # PlanarConfig = chunky
    entries.append((296, _TYPE_SHORT, 1, short(2)))  # ResolutionUnit = inch
    entries.append((339, _TYPE_SHORT, spp, sfmt))  # SampleFormat
    # GeoTIFF georeferencing: pixel scale + the (0,0) raster→world tiepoint.
    # ScaleY is positive by GeoTIFF convention (rows run down-image).
    entries.append(
        (33550, _TYPE_DOUBLE, 3, struct.pack("<3d", r.scale_x, abs(r.scale_y), 0.0))
    )
    entries.append(
        (
            33922,
            _TYPE_DOUBLE,
            6,
            struct.pack("<6d", 0.0, 0.0, 0.0, r.ip_x, ip_y, 0.0),
        )
    )

    entries.sort(key=lambda e: e[0])  # ascending tag order (TIFF requirement)
    header = struct.pack("<2sHI", b"II", 42, 8)  # IFD at byte 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = 8 + ifd_size
    overflow = bytearray()
    slots = []
    for tag, typ, count, payload in entries:
        if len(payload) <= 4:
            slots.append((tag, typ, count, payload.ljust(4, b"\0"), None))
        else:
            slots.append((tag, typ, count, None, len(overflow)))
            overflow += payload
    data_off = overflow_off + len(overflow)

    ifd = bytearray(struct.pack("<H", len(entries)))
    for tag, typ, count, inline, ov in slots:
        if tag == 273:
            inline = struct.pack("<I", data_off)
        val = inline if inline is not None else struct.pack("<I", overflow_off + ov)
        ifd += struct.pack("<HHI", tag, typ, count) + val
    ifd += b"\0\0\0\0"  # no next IFD
    return bytes(header) + bytes(ifd) + bytes(overflow) + data


def decode_tiff(buf: bytes) -> tuple[dict, np.ndarray]:
    """Parse a TIFF produced by :func:`encode_tiff` → (tags, (h, w, spp)
    array).  Minimal reader: little-endian, single IFD, single strip."""
    order, magic, ifd_off = struct.unpack_from("<2sHI", buf, 0)
    if order != b"II" or magic != 42:
        raise ValueError("not a little-endian TIFF")
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    tags: dict[int, tuple] = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", buf, ifd_off + 2 + 12 * i)
        raw = buf[ifd_off + 2 + 12 * i + 8 : ifd_off + 2 + 12 * i + 12]
        total = _TYPE_SIZE[typ] * count
        if total > 4:
            (off,) = struct.unpack("<I", raw)
            raw = buf[off : off + total]
        else:
            raw = raw[:total]
        fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_RATIONAL: "II", _TYPE_DOUBLE: "d"}[typ]
        vals = struct.unpack("<%d%s" % (count * (2 if typ == _TYPE_RATIONAL else 1), fmt[-1]), raw)
        tags[tag] = vals
    w, h, spp = tags[256][0], tags[257][0], tags[277][0]
    bits, sf = tags[258][0], tags[339][0]
    dtype = np.dtype("<" + {1: "u", 2: "i", 3: "f"}[sf] + str(bits // 8))
    off, cnt = tags[273][0], tags[279][0]
    arr = np.frombuffer(buf[off : off + cnt], dtype=dtype).reshape(h, w, spp)
    return tags, arr


def raster_to_tiff(wkb: bytes) -> bytes:
    """WKB raster bytes → TIFF bytes (the ``rt_astiff`` kernel)."""
    from . import wkb_raster as WR

    return encode_tiff(WR.decode(wkb))


_PIXTYPE_BY_DTYPE = {"u1": 4, "i1": 3, "i2": 5, "u2": 6, "i4": 7, "u4": 8, "f4": 10, "f8": 11}


def tiff_to_raster(buf: bytes) -> Raster:
    """GeoTIFF bytes → Raster — the read direction the reference only
    plans (README.md:412-421 lists GeoTIFF under "Planned further
    implementations").  Scope mirrors :func:`decode_tiff` (uncompressed,
    little-endian, single strip) plus the two georeferencing tags this
    module writes: ModelPixelScale (33550, ScaleY positive by GeoTIFF
    convention → raster ``scale_y`` negated) and the (0,0) ModelTiepoint
    (33922)."""
    tags, arr = decode_tiff(buf)
    h, w, spp = arr.shape
    np_code = arr.dtype.str.lstrip("<>|=")
    pixtype = _PIXTYPE_BY_DTYPE[np_code]
    scale = tags.get(33550, (1.0, 1.0, 0.0))
    tie = tags.get(33922, (0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    # tiepoint maps raster (i,j) → world (x,y): origin = tiepoint shifted
    # back by i,j pixel offsets (our encoder always writes i=j=0)
    ip_x = float(tie[3]) - float(tie[0]) * float(scale[0])
    ip_y = float(tie[4]) + float(tie[1]) * float(scale[1])
    bands = [Band(pixtype, None, arr[:, :, k].copy()) for k in range(spp)]
    return Raster(
        0, float(scale[0]), -float(scale[1]), ip_x, ip_y, 0.0, 0.0, 0, w, h, bands
    )
