"""XYZ Gridded ASCII + Esri ASCIIGrid (AAIGrid) raster literal codecs.

The reference lists both under "Planned further implementations"
(README.md:412-421 — XYZ "for the integration of Digital Elevation
models", AAIGrid) and never ships them; this module implements the plan
so every raster literal the reference names is readable.  Formats follow
the GDAL drivers the reference links:

* XYZ (gdal.org/drivers/raster/xyz.html): one "x y z" line per pixel
  CENTER, whitespace-separated; the grid is inferred from the distinct
  sorted coordinates, so any line order parses.
* AAIGrid (gdal.org/drivers/raster/aaigrid.html): ``ncols/nrows/
  xllcorner|xllcenter/yllcorner|yllcenter/cellsize[/NODATA_value]``
  header followed by ``nrows`` rows, top row first.

Coordinates and values serialize with ``%.17g`` so doubles round-trip
bit-exactly; both parsers return a float64 (pixtype 11) single-band
:class:`~jena_geo_spark.raster.wkb_raster.Raster` with the standard
top-left origin / negative ``scale_y`` geotransform (same convention as
``covjson.py``).
"""

from __future__ import annotations

import numpy as np

from .wkb_raster import Band, Raster


def _g17(v: float) -> str:
    return "%.17g" % float(v)


# ------------------------------------------------------------------- XYZ ---


def raster_to_xyz(r: Raster, band: int = 1) -> str:
    """Serialize one band as GDAL-style XYZ gridded ASCII (pixel centers,
    raster scan order: top row first, x fastest)."""
    b = r.bands[band - 1]
    cols = np.arange(r.width, dtype=np.float64)
    rows = np.arange(r.height, dtype=np.float64)
    xs = r.ip_x + (cols + 0.5) * r.scale_x + 0.0 * r.skew_x
    ys = r.ip_y + (rows + 0.5) * r.scale_y
    data = np.asarray(b.data, dtype=np.float64)
    lines = []
    for j in range(r.height):
        yv = _g17(ys[j])
        for i in range(r.width):
            lines.append(f"{_g17(xs[i])} {yv} {_g17(data[j, i])}")
    return "\n".join(lines)


def xyz_to_raster(s: str, srid: int = 0) -> Raster:
    """Parse XYZ gridded ASCII → single-band float64 Raster.  Accepts any
    line order and comma or whitespace separators; requires the points to
    form a complete regular grid (the GDAL driver's contract)."""
    toks = s.replace(",", " ").split()
    if len(toks) % 3:
        raise ValueError("XYZ literal: token count not a multiple of 3")
    arr = np.array(toks, dtype=np.float64).reshape(-1, 3)
    xs = np.unique(arr[:, 0])
    ys = np.unique(arr[:, 1])
    w, h = len(xs), len(ys)
    if w * h != len(arr):
        raise ValueError(
            f"XYZ literal: {len(arr)} points do not fill a {w}x{h} grid"
        )
    # the GDAL driver's contract requires UNIFORM spacing — accepting an
    # irregular lattice would assign silently wrong world coordinates
    def _uniform(vals, axis):
        d = np.diff(vals)
        if d.size and not np.allclose(d, d[0], rtol=1e-9, atol=0.0):
            raise ValueError(f"XYZ literal: non-uniform {axis} spacing {d[:4]}…")
        return float(d[0]) if d.size else 1.0

    sx = _uniform(xs, "x")
    sy = _uniform(ys, "y")
    # world rows run top-down in the raster: highest y = row 0
    col = np.searchsorted(xs, arr[:, 0])
    row = (h - 1) - np.searchsorted(ys, arr[:, 1])
    grid = np.full((h, w), np.nan)
    grid[row, col] = arr[:, 2]
    ip_x = float(xs[0]) - 0.5 * sx
    ip_y = float(ys[-1]) + 0.5 * sy
    return Raster(
        0, sx, -sy, ip_x, ip_y, 0.0, 0.0, srid, w, h, [Band(11, None, grid)]
    )


# --------------------------------------------------------------- AAIGrid ---


def raster_to_aaigrid(r: Raster, band: int = 1) -> str:
    """Serialize one band as Esri ASCIIGrid.  Requires square pixels
    (|scale_x| == |scale_y|) — the format has a single ``cellsize``."""
    if abs(abs(r.scale_x) - abs(r.scale_y)) > 0:
        raise ValueError(
            f"AAIGrid needs square pixels, got {r.scale_x} x {r.scale_y}"
        )
    b = r.bands[band - 1]
    y_bottom = min(r.ip_y, r.ip_y + r.scale_y * r.height)
    head = [
        f"ncols {r.width}",
        f"nrows {r.height}",
        f"xllcorner {_g17(r.ip_x)}",
        f"yllcorner {_g17(y_bottom)}",
        f"cellsize {_g17(abs(r.scale_x))}",
    ]
    if b.nodata is not None:
        head.append(f"NODATA_value {_g17(b.nodata)}")
    data = np.asarray(b.data, dtype=np.float64)
    if r.scale_y > 0:  # stored bottom-up: AAIGrid rows are top-first
        data = data[::-1]
    rows = [" ".join(_g17(v) for v in data[j]) for j in range(r.height)]
    return "\n".join(head + rows)


def aaigrid_to_raster(s: str, srid: int = 0) -> Raster:
    """Parse Esri ASCIIGrid → single-band float64 Raster (top-left origin,
    negative scale_y).  Handles ``xllcenter/yllcenter`` variants and an
    optional ``NODATA_value``."""
    keys = {
        "ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
        "yllcenter", "cellsize", "nodata_value",
    }
    toks = s.split()
    hdr: dict[str, float] = {}
    i = 0
    while i + 1 < len(toks) and toks[i].lower() in keys:
        hdr[toks[i].lower()] = float(toks[i + 1])
        i += 2
    for req in ("ncols", "nrows", "cellsize"):
        if req not in hdr:
            raise ValueError(f"AAIGrid literal: missing header field {req}")
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    cell = hdr["cellsize"]
    x0 = hdr.get("xllcorner", hdr.get("xllcenter", 0.0) - 0.5 * cell)
    y0 = hdr.get("yllcorner", hdr.get("yllcenter", 0.0) - 0.5 * cell)
    vals = np.array(toks[i:], dtype=np.float64)
    if len(vals) != w * h:
        raise ValueError(f"AAIGrid literal: expected {w * h} values, got {len(vals)}")
    grid = vals.reshape(h, w)
    nodata = hdr.get("nodata_value")
    return Raster(
        0, cell, -cell, x0, y0 + h * cell, 0.0, 0.0, srid, w, h,
        [Band(11, nodata, grid, nodata_raw=nodata if nodata is not None else 0)],
    )
