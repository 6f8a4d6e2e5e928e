"""NetCDF classic-format (CDF-1) raster literal codec, pure numpy.

The reference lists NetCDF under "Planned further implementations"
(README.md:412-421, "using Apache SIS") and never ships it; this module
implements the plan from the public Unidata *NetCDF Classic Format
Specification* — no netCDF library exists in this container, and none is
needed: the classic format is a small big-endian tagged header plus
padded array sections.

Layout written by :func:`raster_to_netcdf` (CF-style):

* dimensions ``y`` (height), ``x`` (width);
* coordinate variables ``x``/``y`` (NC_DOUBLE) holding pixel-CENTER
  world coordinates (the Apache SIS anchoring the rest of the raster
  stack uses);
* one NC_DOUBLE data variable per band (``band1``, ``band2``, …) with a
  ``_FillValue`` attribute carrying the band's nodata;
* global attributes ``Conventions = "CF-1.6"``, ``srid`` (NC_INT) and
  ``geotransform`` (6 × NC_DOUBLE: scale_x, scale_y, ip_x, ip_y, skew_x,
  skew_y) so the full georeference round-trips bit-exactly.

:func:`netcdf_to_raster` reads any classic (CDF-1/CDF-2) file whose data
variables are non-record 2-D numeric arrays: georeference comes from the
``geotransform`` attribute when present, else is derived from the
``x``/``y`` coordinate variables (center spacing), else defaults to the
unit grid.  Values are widened to float64 (pixtype 11), matching the
other grid literal codecs in this package.
"""

from __future__ import annotations

import struct

import numpy as np

from .wkb_raster import Band, Raster

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_DTYPES = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


# ------------------------------------------------------------------ writer --


def _w_name(out: bytearray, name: str) -> None:
    b = name.encode()
    out += struct.pack(">i", len(b))
    out += b + b"\x00" * (_pad4(len(b)) - len(b))


def _w_att(out: bytearray, name: str, nc_type: int, values) -> None:
    _w_name(out, name)
    out += struct.pack(">ii", nc_type, len(values))
    if nc_type == NC_CHAR:
        b = bytes(values)
        out += b + b"\x00" * (_pad4(len(b)) - len(b))
    else:
        arr = np.asarray(values, dtype=_DTYPES[nc_type])
        raw = arr.tobytes()
        out += raw + b"\x00" * (_pad4(len(raw)) - len(raw))


def _w_att_list(out: bytearray, atts: list[tuple[str, int, object]]) -> None:
    if not atts:
        out += struct.pack(">ii", 0, 0)
        return
    out += struct.pack(">ii", NC_ATTRIBUTE, len(atts))
    for name, nc_type, values in atts:
        _w_att(out, name, nc_type, values)


def raster_to_netcdf(r: Raster) -> bytes:
    """Raster → NetCDF classic (CDF-1) bytes; every band becomes one
    2-D NC_DOUBLE variable."""
    h, w = r.height, r.width
    # pixel-CENTER coordinates (CF convention; SIS anchoring): the raster
    # origin ip_x/ip_y is the index-0 pixel's reference, so centers sit at
    # half-pixel offsets
    xs = r.ip_x + (np.arange(w, dtype=np.float64) + 0.5) * r.scale_x
    ys = r.ip_y + (np.arange(h, dtype=np.float64) + 0.5) * r.scale_y
    gt = [r.scale_x, r.scale_y, r.ip_x, r.ip_y, r.skew_x, r.skew_y]

    # variables: (name, dim ids, atts, nc_type, values ndarray)
    variables: list[tuple[str, list[int], list, np.ndarray]] = [
        ("x", [1], [], xs),
        ("y", [0], [], ys),
    ]
    for i, band in enumerate(r.bands, start=1):
        atts = []
        if band.nodata is not None:
            atts.append(("_FillValue", NC_DOUBLE, [float(band.nodata)]))
        variables.append(
            (f"band{i}", [0, 1], atts, np.asarray(band.data, dtype=np.float64))
        )

    header = bytearray()
    header += b"CDF\x01" + struct.pack(">i", 0)  # magic + numrecs
    header += struct.pack(">ii", NC_DIMENSION, 2)
    _w_name(header, "y")
    header += struct.pack(">i", h)
    _w_name(header, "x")
    header += struct.pack(">i", w)
    _w_att_list(
        header,
        [
            ("Conventions", NC_CHAR, b"CF-1.6"),
            ("srid", NC_INT, [int(r.srid)]),
            ("geotransform", NC_DOUBLE, gt),
        ],
    )
    header += struct.pack(">ii", NC_VARIABLE, len(variables))

    # first pass with zero begins to learn the header length (begin fields
    # are fixed-width, so the length is final)
    def var_entries(begins: list[int]) -> bytearray:
        out = bytearray()
        for (name, dimids, atts, values), begin in zip(variables, begins):
            _w_name(out, name)
            out += struct.pack(">i", len(dimids))
            for d in dimids:
                out += struct.pack(">i", d)
            _w_att_list(out, atts)
            vsize = _pad4(values.size * 8)
            out += struct.pack(">iii", NC_DOUBLE, vsize, begin)
        return out

    base = len(header) + len(var_entries([0] * len(variables)))
    begins, off = [], base
    for _, _, _, values in variables:
        begins.append(off)
        off += _pad4(values.size * 8)
    header += var_entries(begins)

    body = bytearray()
    for _, _, _, values in variables:
        raw = np.ascontiguousarray(values, dtype=_DTYPES[NC_DOUBLE]).tobytes()
        body += raw + b"\x00" * (_pad4(len(raw)) - len(raw))
    return bytes(header + body)


# ------------------------------------------------------------------ reader --


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def name(self) -> str:
        n = self.i4()
        s = self.take(_pad4(n))[:n]
        return s.decode()

    def atts(self) -> dict:
        tag, count = self.i4(), self.i4()
        out = {}
        if tag == 0 and count == 0:
            return out
        if tag != NC_ATTRIBUTE:
            raise ValueError("bad attribute list tag")
        for _ in range(count):
            nm = self.name()
            nc_type, nelems = self.i4(), self.i4()
            if nc_type == NC_CHAR:
                raw = self.take(_pad4(nelems))[:nelems]
                out[nm] = raw.decode(errors="replace")
            else:
                dt = _DTYPES[nc_type]
                raw = self.take(_pad4(nelems * dt.itemsize))
                out[nm] = np.frombuffer(raw[: nelems * dt.itemsize], dtype=dt)
        return out


def netcdf_to_raster(buf: bytes, srid: int = 0) -> Raster:
    """NetCDF classic bytes → Raster (all non-record 2-D numeric
    variables become float64 bands, in file order)."""
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a NetCDF classic (CDF-1/CDF-2) file")
    offset_fmt = ">i" if buf[3] == 1 else ">q"
    offset_len = 4 if buf[3] == 1 else 8
    c = _Cursor(bytes(buf))
    c.pos = 4
    c.i4()  # numrecs
    tag, count = c.i4(), c.i4()
    dims: list[tuple[str, int]] = []
    if tag == NC_DIMENSION:
        for _ in range(count):
            nm = c.name()
            dims.append((nm, c.i4()))
    elif not (tag == 0 and count == 0):
        raise ValueError("bad dimension list tag")
    gatts = c.atts()
    tag, count = c.i4(), c.i4()
    variables = []
    if tag == NC_VARIABLE:
        for _ in range(count):
            nm = c.name()
            ndims = c.i4()
            dimids = [c.i4() for _ in range(ndims)]
            vatts = c.atts()
            nc_type = c.i4()
            c.i4()  # vsize
            begin = struct.unpack(offset_fmt, c.take(offset_len))[0]
            variables.append((nm, dimids, vatts, nc_type, begin))
    elif not (tag == 0 and count == 0):
        raise ValueError("bad variable list tag")

    def read_var(nm):
        for v in variables:
            if v[0] == nm:
                shape = [dims[d][1] for d in v[1]]
                dt = _DTYPES[v[3]]
                n = int(np.prod(shape)) if shape else 1
                raw = buf[v[4] : v[4] + n * dt.itemsize]
                return np.frombuffer(raw, dtype=dt).reshape(shape)
        return None

    bands = []
    band_meta = []
    for nm, dimids, vatts, nc_type, _ in variables:
        if len(dimids) == 2 and nc_type in (NC_BYTE, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE):
            band_meta.append((nm, vatts))
    for nm, vatts in band_meta:
        vals = np.asarray(read_var(nm), dtype=np.float64)
        fv = vatts.get("_FillValue")
        # no _FillValue ⇒ hasNodata stays unset (None), matching the
        # asciigrid codec — defaulting to 0.0 would mark every legitimate
        # zero pixel as nodata downstream
        nodata = float(np.asarray(fv).ravel()[0]) if fv is not None else None
        bands.append(Band(11, nodata, vals))
    if not bands:
        raise ValueError("no 2-D numeric variable found")
    height, width = bands[0].data.shape

    if "geotransform" in gatts and np.asarray(gatts["geotransform"]).size == 6:
        sx, sy, ipx, ipy, kx, ky = (float(v) for v in np.asarray(gatts["geotransform"]))
    else:
        # CF coordinate variables hold pixel CENTERS: origin = first
        # center minus half a pixel
        xs, ys = read_var("x"), read_var("y")
        sx = float(xs[1] - xs[0]) if xs is not None and xs.size > 1 else 1.0
        sy = float(ys[1] - ys[0]) if ys is not None and ys.size > 1 else -1.0
        ipx = float(xs[0]) - 0.5 * sx if xs is not None and xs.size else 0.0
        ipy = float(ys[0]) - 0.5 * sy if ys is not None and ys.size else 0.0
        kx = ky = 0.0
    out_srid = srid
    if "srid" in gatts:
        out_srid = int(np.asarray(gatts["srid"]).ravel()[0])
    return Raster(0, sx, sy, ipx, ipy, kx, ky, out_srid, width, height, bands)
