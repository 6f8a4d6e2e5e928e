"""NetCDF classic raster literal codec (raster/netcdf.py) — the last
format from the reference's planned list (README.md:412-421)."""

import struct

import numpy as np
import pytest

from jena_geo_spark.raster.netcdf import netcdf_to_raster, raster_to_netcdf
from jena_geo_spark.raster.wkb_raster import Band, Raster


def _r(nodata=-1.0):
    r = Raster(0, 2.0, -3.0, 0.5, 4.5, 0.0, 0.0, 4326, 4, 3, [])
    r.bands.append(Band(11, nodata, np.arange(12, dtype=np.float64).reshape(3, 4)))
    return r


def test_roundtrip_bitexact_multiband():
    r = _r()
    r.bands.append(Band(11, None, np.linspace(-1e300, 1e300, 12).reshape(3, 4)))
    out = netcdf_to_raster(raster_to_netcdf(r))
    assert (out.scale_x, out.scale_y, out.ip_x, out.ip_y) == (2.0, -3.0, 0.5, 4.5)
    assert (out.srid, out.width, out.height, len(out.bands)) == (4326, 4, 3, 2)
    for a, b in zip(r.bands, out.bands):
        assert a.data.tobytes() == b.data.tobytes()  # bit-exact doubles
    assert out.bands[0].nodata == -1.0
    # no _FillValue written ⇒ hasNodata must stay unset, not become 0.0
    assert out.bands[1].nodata is None


def test_header_golden_fields():
    b = raster_to_netcdf(_r())
    assert b[:4] == b"CDF\x01"
    assert struct.unpack(">i", b[4:8])[0] == 0  # numrecs
    assert struct.unpack(">ii", b[8:16]) == (0x0A, 2)  # NC_DIMENSION, 2 dims
    # dim 0 = y/3, dim 1 = x/4 (names 4-byte padded)
    assert b[16:20] == struct.pack(">i", 1) and b[20:24].startswith(b"y")
    assert struct.unpack(">i", b[24:28])[0] == 3
    assert len(b) % 4 == 0


def test_foreign_file_coordinate_georeference():
    """A classic file without our geotransform attribute: georeference is
    derived from the x/y coordinate variables (CF convention)."""
    r = _r()
    buf = bytearray(raster_to_netcdf(r))
    # strip the geotransform by renaming the attribute (same length)
    i = bytes(buf).find(b"geotransform")
    assert i > 0
    buf[i : i + 12] = b"geotransforX"
    out = netcdf_to_raster(bytes(buf))
    assert (out.scale_x, out.scale_y, out.ip_x, out.ip_y) == (2.0, -3.0, 0.5, 4.5)
    assert out.srid == 4326  # srid attribute still present


def test_rejects_non_netcdf():
    with pytest.raises(ValueError):
        netcdf_to_raster(b"NOPE" + b"\x00" * 64)


def test_registry_roundtrip_spark(spark):
    from pyspark.sql import functions as F

    from jena_geo_spark.functions.registry import REGISTRY, sample_frame
    from jena_geo_spark.raster import wkb_raster as WR

    df = sample_frame(spark)
    nc = REGISTRY["st_asnetcdf"][0](F.col("rast"))
    back = REGISTRY["st_rastfromnetcdf"][0](nc)
    row = df.select(F.col("rast").alias("orig"), back.alias("back")).first()
    a, b = WR.decode(bytes(row["orig"])), WR.decode(bytes(row["back"]))
    assert a.bands[0].data.tobytes() == b.bands[0].data.tobytes()
    assert (a.scale_x, a.ip_x, a.srid) == (b.scale_x, b.ip_x, b.srid)
