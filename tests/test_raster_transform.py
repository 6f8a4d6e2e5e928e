"""Raster transforms/editors/stats: resize, rescale, nodata, summary
stats, value lookup, PNG export."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jena_geo_spark.raster import transform as RT
from jena_geo_spark.raster import wkb_raster as WR


def _mk(w=8, h=4, vals=None, nodata=None, pixtype=11):
    data = (
        np.arange(w * h, dtype=np.float64).reshape(h, w)
        if vals is None
        else np.asarray(vals, dtype=np.float64)
    )
    dt, _ = WR.PIXEL_DTYPES[pixtype]
    band = WR.Band(pixtype, nodata, data.astype(dt), nodata or 0)
    return WR.Raster(0, 2.0, -2.0, 100.0, 50.0, 0.0, 0.0, 4326, w, h, [band])


def test_resize_nearest_and_extent():
    r = _mk(8, 4)
    out = RT.resize(r, 4, 2)
    assert out.width == 4 and out.height == 2
    assert out.scale_x == 4.0 and out.scale_y == -4.0
    # nearest-neighbor picks source pixels (0,0),(0,2)... row 0: 0,2,4,6
    assert out.bands[0].data[0].tolist() == [0.0, 2.0, 4.0, 6.0]
    # extent preserved
    assert r.envelope() == out.envelope()


def test_rescale_pixel_size():
    r = _mk(8, 4)
    out = RT.rescale(r, 4.0, 4.0)
    assert (out.width, out.height) == (4, 2)
    assert out.scale_x == 4.0 and out.scale_y == -4.0


def test_summary_stats_and_nodata():
    vals = np.array([[1, 2], [3, -9]], dtype=np.float64)
    r = _mk(2, 2, vals, nodata=-9.0)
    s = RT.summary_stats(r)
    assert s["count"] == 3 and s["sum"] == 6.0 and s["mean"] == 2.0
    assert s["min"] == 1.0 and s["max"] == 3.0
    r2 = RT.set_band_nodata(r, 0, 1.0)
    s2 = RT.summary_stats(r2)
    assert s2["count"] == 3 and s2["min"] == -9.0


def test_value_and_nearest_value():
    vals = np.array([[1, -9], [3, 4]], dtype=np.float64)
    r = _mk(2, 2, vals, nodata=-9.0)
    # world coords: ip(100,50), scale (2,-2): pixel (0,0) covers x∈[100,102)
    assert RT.value_at(r, 101.0, 49.0) == 1.0
    assert RT.value_at(r, 103.0, 49.0) is None  # nodata
    assert RT.nearest_value(r, 103.0, 49.0) in (1.0, 4.0)
    assert RT.value_at(r, 999.0, 49.0) is None  # out of grid


def test_add_band_and_png():
    r = _mk(4, 4)
    r2 = RT.add_band(r, np.ones((4, 4)), pixtype=11)
    assert len(r2.bands) == 2
    png = RT.as_png(r)
    from jena_geo_spark.image.codec import decode_png

    img = decode_png(png)
    assert img.shape == (4, 4, 3)
    assert img[0, 0, 0] == 0 and img[3, 3, 0] == 255  # min→0, max→255


def test_raster_transform_udfs(spark):
    r = _mk(8, 4)
    df = spark.createDataFrame([(bytearray(WR.encode(r)),)], "rast binary")
    row = df.select(
        RT.st_summarystats("rast").alias("s"),
        RT.st_resize("rast", F.lit(4), F.lit(2)).alias("rz"),
        RT.st_value("rast", F.lit(101.0), F.lit(49.0)).alias("v"),
        RT.st_aspng("rast").alias("png"),
    ).first()
    assert row["s"]["count"] == 32 and row["s"]["max"] == 31.0
    rz = WR.decode(bytes(row["rz"]))
    assert rz.width == 4 and rz.height == 2
    assert row["v"] == 0.0
    assert bytes(row["png"])[:4] == b"\x89PNG"
