"""Raster retile + value-aware relations."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jena_geo_spark.raster import algebra as A
from jena_geo_spark.raster import wkb_raster as WR
from tests.test_raster import WKB4, WKB5


def test_retile_covers_all_pixels():
    r = WR.decode_hex(WKB4)  # 5x5 RGB
    tiles = A.retile(r, 2, 2)
    assert len(tiles) == 9  # ceil(5/2)^2
    # reassemble band 0 and compare
    out = np.zeros((5, 5), dtype=r.bands[0].data.dtype)
    for tc, tr, t in tiles:
        out[tr * 2 : tr * 2 + t.height, tc * 2 : tc * 2 + t.width] = t.bands[0].data
    assert (out == r.bands[0].data).all()
    # geotransform of tile (1,1) shifted by 2 pixels in both axes
    t11 = [t for tc, tr, t in tiles if (tc, tr) == (1, 1)][0]
    assert t11.ip_x == r.ip_x + 2 * r.scale_x
    assert t11.ip_y == r.ip_y + 2 * r.scale_y


def test_retile_roundtrips_through_wkb():
    r = WR.decode_hex(WKB5)
    tiles = A.retile(r, 2, 1)
    for tc, tr, t in tiles:
        back = WR.decode(WR.encode(t))
        assert (back.bands[0].data == t.bands[0].data).all()


def test_value_intersects():
    r4 = WR.decode_hex(WKB4)
    r4b = WR.decode_hex(WKB4)
    assert A.value_intersects(r4, r4b, 0xFD)  # value present in overlap
    assert not A.value_intersects(r4, r4b, 9999.0)
    r5 = WR.decode_hex(WKB5)  # far-away envelope
    assert not A.value_intersects(r4, r5, 0xFD)


def test_spark_retile(spark):
    r = WR.decode_hex(WKB4)
    df = spark.createDataFrame([("r1", bytearray(WR.encode(r)))], "rid string, rast binary")
    out = A.spark_retile(df, "rast", 3, 3).collect()
    assert len(out) == 4  # ceil(5/3)^2
    total = 0
    for row in out:
        t = WR.decode(bytes(row.tile))
        total += t.width * t.height
    assert total == 25
    assert {(r.tile_col, r.tile_row) for r in out} == {(0, 0), (1, 0), (0, 1), (1, 1)}


def test_zonal_stats_fast_path_matches_per_tile(spark):
    """zonal_stats: the homogeneous-batch matrix path and the per-tile
    fallback (forced by mixing tile shapes) must agree exactly on the
    shared tiles."""
    import numpy as np

    from jena_geo_spark.raster import wkb_raster as WR
    from jena_geo_spark.raster.zonal import zonal_stats

    def mk(seed, w=8, h=8):
        v = (np.arange(w * h, dtype=np.int64) * 13 + seed * 7) % 97
        return WR.encode(WR.Raster(
            0, 0.25, -0.25, float(seed % 5), float(seed % 3), 0.0, 0.0,
            4326, w, h, [WR.Band(7, None, v.reshape(h, w).astype(np.int32), 0)],
        ))

    zones = [("z", "POLYGON((0.5 -1.5, 4 -1.5, 4 2, 0.5 2, 0.5 -1.5))")]
    homo = spark.createDataFrame([(mk(i),) for i in range(40)], "rast binary")
    # one odd-shaped tile far outside the zone forces the fallback loop
    # without changing which pixels the zone covers
    far = WR.encode(WR.Raster(
        0, 0.25, -0.25, 500.0, 500.0, 0.0, 0.0, 4326, 4, 4,
        [WR.Band(7, None, np.zeros((4, 4), dtype=np.int32), 0)],
    ))
    mixed = spark.createDataFrame(
        [(mk(i),) for i in range(40)] + [(far,)], "rast binary"
    ).coalesce(1)
    a = {r.zone_id: (r.n, r.px_sum, r.px_min, r.px_max)
         for r in zonal_stats(homo, zones).collect()}
    b = {r.zone_id: (r.n, r.px_sum, r.px_min, r.px_max)
         for r in zonal_stats(mixed, zones).collect()}
    assert a == b and a["z"][0] > 0
