"""CoverageJSON raster literal codec (covjson.org spec).

Mirrors the reference's raster-literal datatype surface —
``CovJSONDatatype.java`` (the literal codec), ``CoverageJSONReader.java``
(Grid domain: axes ``x``/``y`` given either as explicit ``values`` or as
``start``/``stop``/``num``), ``CoverageJsonWriter.java`` and
``AsCoverageJSON.java`` / ``RastFromCoverageJSON.java`` (the
constructor/exporter pair) — re-expressed against our WKB raster struct.
The reference's own CovJSON unit fixture is an empty string
(``SampleRasters.java:100``), so the tests here use a hand-built spec
fixture and a HexWKB-decoded twin instead.

Conventions:
* axis values are CELL CENTERS (CovJSON Grid semantics): column j center =
  ``ip_x + (j + 0.5) * scale_x`` — the same pixel-center anchoring as the
  envelope math in ``wkb_raster.Raster.envelope``;
* each ``ranges`` entry becomes one 64-bit-float band, shaped by its
  ``axisNames``/``shape`` (``["y","x"]`` row-major, the spec default);
* ``null`` values map to the band nodata slot.
"""

from __future__ import annotations

import json

import numpy as np

from .wkb_raster import Band, Raster

_NODATA = -9999.0


def _axis_centers(ax: dict) -> np.ndarray:
    if "values" in ax:
        return np.asarray(ax["values"], dtype=np.float64)
    start, stop, num = float(ax["start"]), float(ax["stop"]), int(ax["num"])
    return np.linspace(start, stop, num)


def covjson_to_raster(s: str | dict, srid: int = 4326) -> Raster:
    """Parse a CoverageJSON ``Coverage`` (Grid domain) into a Raster."""
    cov = json.loads(s) if isinstance(s, str) else s
    if cov.get("type") != "Coverage":
        raise ValueError(f"not a Coverage document: type={cov.get('type')!r}")
    domain = cov["domain"]
    if domain.get("domainType") not in (None, "Grid"):
        raise ValueError(f"unsupported domainType {domain['domainType']!r}")
    axes = domain["axes"]
    xs, ys = _axis_centers(axes["x"]), _axis_centers(axes["y"])
    w, h = len(xs), len(ys)
    scale_x = float(xs[1] - xs[0]) if w > 1 else 1.0
    scale_y = float(ys[1] - ys[0]) if h > 1 else -1.0
    ip_x = float(xs[0]) - 0.5 * scale_x
    ip_y = float(ys[0]) - 0.5 * scale_y
    bands = []
    # JSON object order (insertion) is the band order — lexicographic
    # sort would scramble band10 before band2
    for name in cov.get("ranges", {}):
        rng = cov["ranges"][name]
        if rng.get("type") != "NdArray":
            raise ValueError(f"range {name!r}: unsupported type {rng.get('type')!r}")
        axis_names = rng.get("axisNames", ["y", "x"])
        vals = np.array(
            [(_NODATA if v is None else float(v)) for v in rng["values"]],
            dtype=np.float64,
        )
        shape = rng.get("shape", [h, w] if axis_names == ["y", "x"] else [w, h])
        grid = vals.reshape(shape)
        if axis_names == ["x", "y"]:
            grid = grid.T
        elif axis_names != ["y", "x"]:
            raise ValueError(f"range {name!r}: unsupported axisNames {axis_names}")
        has_null = any(v is None for v in rng["values"])
        bands.append(
            Band(11, _NODATA if has_null else None, grid, nodata_raw=_NODATA)
        )
    return Raster(0, scale_x, scale_y, ip_x, ip_y, 0.0, 0.0, srid, w, h, bands)


def raster_to_covjson(r: Raster) -> str:
    """Serialize a Raster as a CoverageJSON ``Coverage`` (Grid domain,
    one NdArray range per band, ``start/stop/num`` axes)."""
    axes = {
        "x": {
            "start": r.ip_x + 0.5 * r.scale_x,
            "stop": r.ip_x + (r.width - 0.5) * r.scale_x,
            "num": r.width,
        },
        "y": {
            "start": r.ip_y + 0.5 * r.scale_y,
            "stop": r.ip_y + (r.height - 0.5) * r.scale_y,
            "num": r.height,
        },
    }
    ranges, parameters = {}, {}
    for i, band in enumerate(r.bands, start=1):
        name = f"band{i}"
        data = band.data.astype(np.float64)
        vals = [
            None if band.nodata is not None and v == band.nodata else v
            for v in data.ravel().tolist()
        ]
        ranges[name] = {
            "type": "NdArray",
            "dataType": "float",
            "axisNames": ["y", "x"],
            "shape": [r.height, r.width],
            "values": vals,
        }
        parameters[name] = {
            "type": "Parameter",
            "description": {"en": name},
            "observedProperty": {"label": {"en": name}},
        }
    cov = {
        "type": "Coverage",
        "domain": {
            "type": "Domain",
            "domainType": "Grid",
            "axes": axes,
            "referencing": [
                {
                    "coordinates": ["x", "y"],
                    "system": {
                        "type": "GeographicCRS",
                        "id": f"http://www.opengis.net/def/crs/EPSG/0/{r.srid}",
                    },
                }
            ],
        },
        "parameters": parameters,
        "ranges": ranges,
    }
    return json.dumps(cov)
