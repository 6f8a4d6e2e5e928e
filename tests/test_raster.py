"""WKB-raster codec vs the reference's annotated fixtures.

Fixture hex strings quoted from ``src/test/.../test/util/SampleRasters.java``
(annotated byte-layout comments there are the spec); goldens from
``DistanceTest.java:51-59``.
"""

import numpy as np
import pytest

from jena_geo_spark.raster import algebra as A
from jena_geo_spark.raster import wkb_raster as WR

MINWKB = (
    "01" "0000" "0100" "000000000000F03F" "0000000000000040" "0000000000000840"
    "0000000000001040" "0000000000001440" "0000000000001840" "0A000000"
    "0100" "0100" "40" "00" "01"
)

WKB1 = "00000000013FF00000000000003FF00000000000000000000000000000000000000000000000000000000000000000000000000000000010E600020002040000010100"

WKB3 = (
    "00000000013FF000000000000040000000000000004008000000000000401000000000000040140000000000004018000000000000000010E6"
    "0003" "0002" "05" "FFFF" "FFFF" "0000" "FFF0" "007F" "000A" "0002"
)

WKB4 = (
    "01" "0000" "0300"
    "9A9999999999A93F" "9A9999999999A9BF" "000000E02B274A41" "0000000077195641"
    "0000000000000000" "0000000000000000" "E6100000" "0500" "0500"
    "44" "00" "FDFEFDFEFEFDFEFEFDF9FAFEFEFCF9FBFDFEFEFDFCFAFEFEFE"
    "44" "00" "4E627AADD16076B4F9FE6370A9F5FE59637AB0E54F58617087"
    "44" "00" "46566487A1506CA2E3FA5A6CAFFBFE4D566DA4CB3E454C5665"
)

WKB5 = (
    "01" "0000" "0100" "0000000000805640" "00000000008056C0" "000000001C992D41"
    "00000000E49E2341" "0000000000000000" "0000000000000000" "FFFFFFFF"
    "0300" "0100" "45" "0100" "0100" "B401" "AF01"
)

EMPTY = "01000001000000000000000000000000000000000000000000008036400000000000001E400000000000002EC00000000000002E40E6100000020002000A0000000000000000000000000000000000000000"


def test_min_raster_fields():
    r = WR.decode_hex(MINWKB)
    assert (r.scale_x, r.scale_y, r.ip_x, r.ip_y, r.skew_x, r.skew_y) == (1, 2, 3, 4, 5, 6)
    assert r.srid == 10 and (r.width, r.height) == (1, 1)
    b = r.bands[0]
    assert b.pixtype == 0 and b.nodata == 0 and b.data[0, 0] == 1


def test_wkb3_signed_pixels_bigendian():
    r = WR.decode_hex(WKB3)
    assert (r.width, r.height) == (3, 2)
    b = r.bands[0]
    # flags byte 0x05: pixtype 16BSI, hasNodata NOT set — the nodata slot
    # still holds -1 in the stream (reference reader always reads it)
    assert b.pixtype == 5 and b.nodata is None and b.nodata_raw == -1
    assert b.data.ravel().tolist() == [-1, 0, -16, 127, 10, 2]


def test_wkb4_rgb_image():
    r = WR.decode_hex(WKB4)
    assert len(r.bands) == 3 and (r.width, r.height) == (5, 5)
    assert r.scale_x == 0.05 and r.scale_y == -0.05
    assert r.ip_x == 3427927.75 and r.ip_y == 5793244.0
    assert r.bands[0].data[0, 0] == 0xFD and r.bands[2].data[4, 4] == 0x65


def test_as_hex_rast_wkb_golden():
    # AsHexRastWKBTest.java: re-encoding the big-endian 2x2 fixture emits
    # this exact little-endian hex string
    golden = (
        "0100000100000000000000F03F000000000000F03F"
        + "00" * 32
        + "E610000002000200040000010100"
    )
    assert WR.encode_hex(WR.decode_hex(WKB1)).upper() == golden


def test_wkb4_min_max_value_goldens():
    # MinValueTest.java / MaxValueTest.java: band 0 of the 5x5 RGB fixture
    r = WR.decode_hex(WKB4)
    assert float(r.bands[0].data.min()) == 249.0
    assert float(r.bands[0].data.max()) == 254.0


def test_wkb5_16bsi_values():
    r = WR.decode_hex(WKB5)
    assert r.bands[0].data.ravel().tolist() == [1, 436, 431]
    assert r.bands[0].nodata == 1 and r.srid == -1


def test_empty_raster_is_zero_band_payload():
    r = WR.decode_hex(EMPTY)
    assert (r.width, r.height) == (2, 2)
    assert r.scale_x == 0.0 and r.srid == 4326
    assert len(r.bands) == 1  # one 32BF band of zeros ("empty" = no values)
    assert r.bands[0].pixtype == 10
    assert (r.bands[0].data == 0).all()


def test_roundtrip_little_endian_fixtures():
    for hexstr in (MINWKB, WKB4, WKB5):
        assert WR.encode_hex(WR.decode_hex(hexstr)) == hexstr.upper()


def test_raster_distance_goldens():
    r1 = WR.decode_hex(WKB1)
    r4 = WR.decode_hex(WKB4)
    assert A.raster_distance(r1, r1) == 0.0
    # reference golden DistanceTest.java:51-59
    assert A.raster_distance(r1, r4) == 6731443.698114836


def test_map_algebra_local():
    r = WR.decode_hex(WKB5)
    s = A.map_algebra2(r, r, "add")
    assert s.bands[0].data.ravel().tolist() == [2.0, 872.0, 862.0]
    c = A.map_algebra_const(r, "multiply", 2.0)
    assert c.bands[0].data.ravel().tolist() == [2.0, 872.0, 862.0]
    t = A.binarize(r, 432.0)
    assert t.bands[0].data.ravel().tolist() == [0.0, 1.0, 0.0]


def test_focal_and_dct_roundtrip():
    r = WR.decode_hex(WKB4)
    f = A.focal(r, "max", 3)
    assert f.bands[0].data.max() == r.bands[0].data.max()
    d = A.idct2(A.dct2(r))
    np.testing.assert_allclose(d.bands[0].data, r.bands[0].data.astype(float), atol=1e-9)


def test_pixel_as_points_geotransform():
    r = WR.decode_hex(MINWKB)
    pts = A.pixel_as_points(r)
    # ip (3,4), scale (1,2), skew (5,6): centre of pixel (0,0)
    assert pts[0] == (3 + 0.5 * 1 + 0.5 * 5, 4 + 0.5 * 2 + 0.5 * 6, 1.0)


def test_world_raster_coords():
    r = WR.decode_hex(WKB5)
    col, row = r.world_to_raster(969870.0 + 95.0, 642930.0 - 95.0)
    assert (col, row) == (1, 1)
    assert r.raster_to_world(0, 0) == (969870.0, 642930.0)


def test_zonal_stats_holes_and_multipolygon(spark):
    import numpy as np
    import pandas as pd
    from jena_geo_spark.raster import wkb_raster as WR
    from jena_geo_spark.raster.zonal import zonal_stats

    # one 10x10 tile: pixel centers at (0..9, 0..9), value = row*10+col
    vals = np.arange(100, dtype=np.int32).reshape(10, 10)
    r = WR.Raster(0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 4326, 10, 10, [WR.Band(7, None, vals, 0)])
    tiles = spark.createDataFrame(pd.DataFrame({"rast": [WR.encode(r)]}))
    zones = [
        # square with a hole: covers centers 0<=x,y<=5 minus 2<x,y<4
        ("holed", "POLYGON((-0.5 -0.5, 5.5 -0.5, 5.5 5.5, -0.5 5.5, -0.5 -0.5),"
                  "(1.5 1.5, 3.5 1.5, 3.5 3.5, 1.5 3.5, 1.5 1.5))"),
        # multipolygon: two disjoint 1-pixel boxes around (8,8) and (9,0)
        ("mp", "MULTIPOLYGON(((7.5 7.5, 8.5 7.5, 8.5 8.5, 7.5 8.5, 7.5 7.5)),"
               "((8.5 -0.5, 9.5 -0.5, 9.5 0.5, 8.5 0.5, 8.5 -0.5)))"),
        ("far", "POLYGON((100 100, 101 100, 101 101, 100 101, 100 100))"),
    ]
    got = {row.zone_id: row for row in zonal_stats(tiles, zones).collect()}
    xs, ys = np.meshgrid(np.arange(10.0), np.arange(10.0))
    inside_sq = (xs <= 5) & (ys <= 5)
    hole = (xs >= 2) & (xs <= 3) & (ys >= 2) & (ys <= 3)
    exp = vals[(inside_sq & ~hole)]
    assert got["holed"].n == len(exp)
    assert got["holed"].px_sum == exp.sum()
    assert got["holed"].px_min == exp.min() and got["holed"].px_max == exp.max()
    assert got["mp"].n == 2
    assert got["mp"].px_sum == float(vals[8, 8] + vals[0, 9])
    assert "far" not in got  # zero-pixel zones absent


def test_sample_raster_at_points(spark):
    import numpy as np
    import pandas as pd
    from jena_geo_spark.raster import wkb_raster as WR
    from jena_geo_spark.raster.sample import sample_raster_at_points

    # two 4x4 tiles, scale 1.0, anchored at (0,0) and (10,10); values row*4+col
    vals = np.arange(16, dtype=np.int32).reshape(4, 4)
    tiles = []
    for tid, (ax, ay) in [("t0", (0.0, 0.0)), ("t1", (10.0, 10.0))]:
        r = WR.Raster(0, 1.0, 1.0, ax, ay, 0.0, 0.0, 4326, 4, 4, [WR.Band(7, None, vals, 0)])
        tiles.append((tid, WR.encode(r)))
    tdf = spark.createDataFrame(pd.DataFrame(tiles, columns=["tile_id", "rast"]))
    # points: inside t0 pixel (2,1)=6 at (1.2, 2.4); on t1 pixel (0,0) at (9.6,9.8);
    # outside both at (5,5); t0 pixel (0,0) at exact anchor (0,0)
    pts = pd.DataFrame(
        {"id": ["a", "b", "c", "d"], "lon": [1.2, 9.6, 5.0, 0.0], "lat": [2.4, 9.8, 5.0, 0.0]}
    )
    pdf = spark.createDataFrame(pts)
    got = {
        (r.id, r.tile_id): r.value
        for r in sample_raster_at_points(tdf, pdf, cover_res=4).collect()
    }
    assert got == {("a", "t0"): 9.0, ("b", "t1"): 0.0, ("d", "t0"): 0.0}


# ------------------------------------------------------------------- TIFF --


def test_tiff_roundtrip_multiband_u8():
    from jena_geo_spark.raster import tiff as T

    b1 = WR.Band(4, None, np.arange(12, dtype=np.uint8).reshape(3, 4))
    b2 = WR.Band(4, None, (np.arange(12, dtype=np.uint8) * 2).reshape(3, 4))
    r = WR.Raster(0, 0.5, -0.5, 10.0, 20.0, 0.0, 0.0, 4326, 4, 3, [b1, b2])
    buf = T.encode_tiff(r)
    # header goldens: little-endian magic, IFD at 8
    assert buf[:4] == b"II*\x00" and buf[4:8] == b"\x08\x00\x00\x00"
    tags, arr = T.decode_tiff(buf)
    assert arr.shape == (3, 4, 2)
    assert (arr[:, :, 0] == b1.data).all() and (arr[:, :, 1] == b2.data).all()
    # TIFF 6.0 field goldens
    assert tags[259] == (1,)  # uncompressed
    assert tags[258] == (8, 8) and tags[339] == (1, 1)
    assert tags[284] == (1,) and tags[278] == (3,)
    # GeoTIFF georeferencing survives (positive ScaleY convention)
    assert tags[33550] == (0.5, 0.5, 0.0)
    assert tags[33922] == (0.0, 0.0, 0.0, 10.0, 20.0, 0.0)


def test_tiff_roundtrip_float_and_signed():
    from jena_geo_spark.raster import tiff as T

    for pixtype, dt, sf in ((11, np.float64, 3), (10, np.float32, 3), (5, np.int16, 2)):
        data = (np.linspace(-3, 7, 12).reshape(3, 4)).astype(dt)
        r = WR.Raster(0, 1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 0, 4, 3, [WR.Band(pixtype, None, data)])
        tags, arr = T.decode_tiff(T.encode_tiff(r))
        assert tags[339] == (sf,)
        assert (arr[:, :, 0] == data).all()


def test_tiff_of_reference_fixture_wkb4():
    """Encode the reference's annotated 3-band 5x5 fixture; pixel payload
    must round-trip byte-exactly through the TIFF."""
    from jena_geo_spark.raster import tiff as T

    r = WR.decode_hex(WKB4)
    tags, arr = T.decode_tiff(T.encode_tiff(r))
    assert arr.shape == (5, 5, 3)
    for i, band in enumerate(r.bands):
        assert (arr[:, :, i] == band.data).all()
    assert tags[33550][0] == r.scale_x


def test_tiff_mixed_pixtypes_raise():
    from jena_geo_spark.raster import tiff as T

    r = WR.decode_hex(WKB4)
    r.bands[1].pixtype = 5
    r.bands[1].data = r.bands[1].data.astype(np.int16)
    with pytest.raises(ValueError, match="mixed band pixel types"):
        T.encode_tiff(r)


def test_st_astiff_spark(spark):
    from pyspark.sql import functions as F

    from jena_geo_spark.functions.registry import REGISTRY
    from jena_geo_spark.raster import tiff as T

    fn, _ = REGISTRY["st_astiff"]
    df = spark.createDataFrame(
        [(bytes.fromhex(WKB4),), (None,)], "rast binary"
    ).select(fn(F.col("rast")).alias("t"))
    rows = df.collect()
    assert rows[1].t is None
    tags, arr = T.decode_tiff(bytes(rows[0].t))
    want = WR.decode_hex(WKB4)
    assert arr.shape == (5, 5, 3)
    assert (arr[:, :, 0] == want.bands[0].data).all()


# --------------------------------------------------------------- CovJSON --


COVJSON_FIXTURE = """{
  "type": "Coverage",
  "domain": {
    "type": "Domain", "domainType": "Grid",
    "axes": {
      "x": {"start": 0.05, "stop": 0.45, "num": 5},
      "y": {"values": [0.45, 0.35, 0.25, 0.15, 0.05]}
    },
    "referencing": [{"coordinates": ["x","y"],
      "system": {"type": "GeographicCRS",
                 "id": "http://www.opengis.net/def/crs/EPSG/0/4326"}}]
  },
  "parameters": {"band1": {"type": "Parameter",
    "observedProperty": {"label": {"en": "band1"}}}},
  "ranges": {"band1": {"type": "NdArray", "dataType": "float",
    "axisNames": ["y","x"], "shape": [5,5],
    "values": [0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22,23,null]}}
}"""


def test_covjson_fixture_matches_hexwkb_twin():
    """Hand-built spec fixture vs its HexWKB-decoded twin: same grid, same
    geotransform (cell-center axes), same band values (reference surface:
    CovJSONDatatype/CoverageJSONReader; their own fixture is empty —
    SampleRasters.java:100, which is why AsCoverageJSONTest.java can only
    assertNotEquals against "" and RastFromCoverageJSONTest.java only
    checks datatype-tagging; both are upgraded here and in
    test_covjson_roundtrip_multiband to exact value round-trips)."""
    from jena_geo_spark.raster import covjson as CJ

    r = CJ.covjson_to_raster(COVJSON_FIXTURE)
    # twin: 5x5 f8 raster, scale 0.1/-0.1, origin (0, 0.5) — built via the
    # WKB codec so both literal forms decode through independent paths
    vals = np.arange(25, dtype=np.float64)
    vals[24] = -9999.0
    twin = WR.Raster(
        0, 0.1, -0.1, 0.0, 0.5, 0.0, 0.0, 4326, 5, 5,
        [WR.Band(11, -9999.0, vals.reshape(5, 5), nodata_raw=-9999.0)],
    )
    twin = WR.decode(WR.encode(twin))  # through the HexWKB codec
    assert (r.width, r.height) == (twin.width, twin.height)
    assert np.isclose(r.scale_x, twin.scale_x) and np.isclose(r.scale_y, twin.scale_y)
    assert np.isclose(r.ip_x, twin.ip_x) and np.isclose(r.ip_y, twin.ip_y)
    assert r.bands[0].nodata == twin.bands[0].nodata
    assert (r.bands[0].data == twin.bands[0].data).all()


def test_covjson_roundtrip_multiband():
    from jena_geo_spark.raster import covjson as CJ

    r = WR.decode_hex(WKB4)
    back = CJ.covjson_to_raster(CJ.raster_to_covjson(r))
    assert (back.width, back.height) == (r.width, r.height)
    assert np.isclose(back.scale_x, r.scale_x) and np.isclose(back.scale_y, r.scale_y)
    assert np.isclose(back.ip_x, r.ip_x) and np.isclose(back.ip_y, r.ip_y)
    assert len(back.bands) == 3
    for a, b in zip(back.bands, r.bands):
        assert (a.data == b.data.astype(np.float64)).all()


def test_covjson_xy_axis_order_and_values_axes():
    from jena_geo_spark.raster import covjson as CJ

    cov = {
        "type": "Coverage",
        "domain": {"type": "Domain", "domainType": "Grid",
                   "axes": {"x": {"values": [10.5, 11.5]},
                            "y": {"values": [5.0, 4.0, 3.0]}}},
        "ranges": {"b": {"type": "NdArray", "axisNames": ["x", "y"],
                         "shape": [2, 3],
                         "values": [1, 2, 3, 4, 5, 6]}},
    }
    import json as _json

    r = CJ.covjson_to_raster(_json.dumps(cov))
    assert (r.width, r.height) == (2, 3)
    # axisNames ["x","y"] transposes to row-major (y, x)
    assert r.bands[0].data.shape == (3, 2)
    assert r.bands[0].data[0, 0] == 1 and r.bands[0].data[0, 1] == 4
    assert r.scale_x == 1.0 and r.scale_y == -1.0
    assert r.ip_x == 10.0 and r.ip_y == 5.5


# -------------------------------------- XYZ / AAIGrid / GeoTIFF literals --


def _grid_raster():
    from jena_geo_spark.raster.wkb_raster import Band, Raster

    data = np.arange(12, dtype=np.float64).reshape(3, 4) * 1.37 - 3.25
    return Raster(0, 0.5, -0.5, 10.0, 20.0, 0.0, 0.0, 4326, 4, 3, [Band(11, None, data)])


def test_xyz_roundtrip_and_any_line_order():
    from jena_geo_spark.raster import grids as G

    r = _grid_raster()
    txt = G.raster_to_xyz(r)
    back = G.xyz_to_raster(txt, srid=4326)
    assert (back.scale_x, back.scale_y, back.ip_x, back.ip_y) == (0.5, -0.5, 10.0, 20.0)
    assert (back.bands[0].data == r.bands[0].data).all()
    lines = txt.split("\n")
    back2 = G.xyz_to_raster("\n".join(lines[::-1]).replace(" ", ","))
    assert (back2.bands[0].data == r.bands[0].data).all()


def test_xyz_incomplete_grid_raises():
    from jena_geo_spark.raster import grids as G

    with pytest.raises(ValueError, match="do not fill"):
        G.xyz_to_raster("0 0 1\n1 0 2\n0 1 3")  # 3 points, 2x2 grid


def test_aaigrid_roundtrip_nodata_and_center_variant():
    from jena_geo_spark.raster import grids as G
    from jena_geo_spark.raster.wkb_raster import Band, Raster

    r = Raster(
        0, 1.0, -1.0, 0.0, 3.0, 0.0, 0.0, 0, 2, 3,
        [Band(11, -9999.0, np.array([[1.0, 2.0], [-9999.0, 4.0], [5.0, 6.0]]),
              nodata_raw=-9999.0)],
    )
    txt = G.raster_to_aaigrid(r)
    assert txt.splitlines()[:2] == ["ncols 2", "nrows 3"]
    assert "NODATA_value -9999" in txt
    back = G.aaigrid_to_raster(txt)
    assert back.bands[0].nodata == -9999.0
    assert (back.bands[0].data == r.bands[0].data).all()
    assert (back.ip_x, back.ip_y, back.scale_x, back.scale_y) == (0.0, 3.0, 1.0, -1.0)
    c = G.aaigrid_to_raster("ncols 2\nnrows 1\nxllcenter 0.5\nyllcenter 0.5\ncellsize 1\n7 8")
    assert (c.ip_x, c.ip_y) == (0.0, 1.0) and (c.bands[0].data == [[7.0, 8.0]]).all()


def test_aaigrid_requires_square_pixels():
    from jena_geo_spark.raster import grids as G
    from jena_geo_spark.raster.wkb_raster import Band, Raster

    r = Raster(0, 1.0, -2.0, 0.0, 2.0, 0.0, 0.0, 0, 1, 1,
               [Band(11, None, np.zeros((1, 1)))])
    with pytest.raises(ValueError, match="square"):
        G.raster_to_aaigrid(r)


def test_tiff_to_raster_roundtrips_geotransform_and_bands():
    from jena_geo_spark.raster import tiff as T
    from jena_geo_spark.raster.wkb_raster import Band, Raster

    r = _grid_raster()
    back = T.tiff_to_raster(T.encode_tiff(r))
    assert (back.scale_x, back.scale_y, back.ip_x, back.ip_y) == (0.5, -0.5, 10.0, 20.0)
    assert back.bands[0].pixtype == 11
    assert (back.bands[0].data == r.bands[0].data).all()
    rm = Raster(0, 1.0, -1.0, 0.0, 2.0, 0.0, 0.0, 0, 3, 2,
                [Band(5, None, np.arange(6, dtype=np.int16).reshape(2, 3)),
                 Band(5, None, (np.arange(6, dtype=np.int16) * 7).reshape(2, 3))])
    back2 = T.tiff_to_raster(T.encode_tiff(rm))
    assert len(back2.bands) == 2 and back2.bands[0].pixtype == 5
    assert (back2.bands[1].data == rm.bands[1].data).all()


def test_grid_literals_spark_roundtrip(spark):
    """st_asxyz / st_rastfromxyz / st_asasciigrid / st_rastfromasciigrid /
    st_rastfromtiff through the registered surface: export then re-import
    must reproduce the full WKB raster payload bit-for-bit."""
    from pyspark.sql import functions as F

    from jena_geo_spark.raster import attributes as RT
    from jena_geo_spark.raster import wkb_raster as WR

    wkb = WR.encode(_grid_raster())
    df = spark.createDataFrame([(bytearray(wkb),)], "rast binary")
    out = df.select(
        RT.rt_fromxyz(RT.rt_asxyz(F.col("rast"))).alias("xyz"),
        RT.rt_fromasciigrid(RT.rt_asasciigrid(F.col("rast"))).alias("aai"),
        RT.rt_fromtiff(RT.rt_astiff(F.col("rast"))).alias("tif"),
    ).collect()[0]
    for name in ("xyz", "aai", "tif"):
        back = WR.decode(bytes(out[name]))
        assert (back.width, back.height) == (4, 3), name
        assert (back.ip_x, back.ip_y, back.scale_x, back.scale_y) == (10.0, 20.0, 0.5, -0.5), name
        assert (back.bands[0].data == _grid_raster().bands[0].data).all(), name


def test_raster_attribute_goldens():
    """raster/attribute/*Test.java goldens on the 2x2 big-endian fixture
    (Width/Height/NumBands/ScaleX/ScaleY/SkewX/UpperLeftX/UpperLeftY/
    MemSize/NumXTiles/TileWidth/TileGridXOffset/RasterToWorldCoordX/
    WorldToRasterCoordX/IsEmpty/HasNoBand)."""
    import pandas as pd

    from jena_geo_spark.functions.registry import REGISTRY as R

    raw = bytes.fromhex(WKB1)

    def u1(name, *args):
        fn = R[name][0]
        return fn.func(*[pd.Series([a]) for a in (raw,) + args]).iloc[0]

    assert u1("st_width") == 2 and u1("st_height") == 2
    assert u1("st_numbands") == 1
    assert u1("st_scalex") == 1.0 and u1("st_scaley") == 1.0
    assert u1("st_skewx") == 0.0
    assert u1("st_upperleftx") == 0.0 and u1("st_upperlefty") == 0.0
    assert u1("st_memsize") == 4  # 2x2 x one 8BUI band
    assert u1("st_numxtiles") == 1 and u1("st_tilewidth") == 2
    assert u1("st_tilegridxoffset") == 0
    assert u1("st_rastertoworldcoordx", 1, 1) == 1.0
    assert u1("st_worldtorastercoordx", 1.0, 1.0) == 1
    assert u1("st_isempty") is False
    assert u1("st_hasnoband", 10) is True
    # Y twins (SkewYTest/TileHeightTest/NumYTilesTest/TileGridYOffsetTest/
    # RasterToWorldCoordYTest/WorldToRasterCoordYTest.java) plus the
    # struct-returning pair functions (RasterToWorldCoordTest/
    # WorldToRasterCoordTest.java)
    assert u1("st_skewy") == 0.0
    assert u1("st_tileheight") == 2 and u1("st_numytiles") == 1
    assert u1("st_tilegridyoffset") == 0
    assert u1("st_rastertoworldcoordy", 1, 1) == 1.0
    assert u1("st_worldtorastercoordy", 1.0, 1.0) == 1
    pair = u1("st_rastertoworldcoord", 1, 1)
    assert (pair["x"], pair["y"]) == (1.0, 1.0)
    cell = u1("st_worldtorastercoord", 1.0, 1.0)
    assert (cell["col"], cell["row"]) == (1, 1)


def test_raster_tile_and_hexwkb_goldens():
    """MinTileXTest.java / MinTileYTest.java (both 0 on the untiled
    wkbString1 fixture), plus RastFromHexWKBTest.java upgraded: the
    reference only asserts lexical-form identity of the literal; we decode
    the big-endian fixture and re-encode it byte-exactly (which also
    upgrades AsRastWKBTest.java's weak assertNotEquals)."""
    import pandas as pd

    from jena_geo_spark.functions.registry import REGISTRY as R

    raw = bytes.fromhex(WKB1)

    def u1(name, *args):
        fn = R[name][0]
        return fn.func(*[pd.Series([a]) for a in (raw,) + args]).iloc[0]

    assert u1("st_mintilex") == 0 and u1("st_mintiley") == 0
    r = WR.decode_hex(WKB1)
    assert WR.encode_hex(r, little=False).upper() == WKB1.upper()


def test_raster_relation_equals_goldens():
    """raster/relation/EqualsTest.java: Equals(r, r) -> TRUE and
    Equals(wkbString4, wkbString1) -> FALSE.  The reference's polymorphic
    st_equals compares grid ENVELOPES for raster x raster (Equals.java);
    its RasterEquals variant additionally compares content — pinned here
    as full decode equality (geotransform + band data)."""
    import pandas as pd

    from jena_geo_spark.raster import attributes as RT

    r1, r4 = bytes.fromhex(WKB1), bytes.fromhex(WKB4)
    eq = RT.rt_equals.func
    assert eq(pd.Series([r1]), pd.Series([r1])).iloc[0] is True
    assert eq(pd.Series([r4]), pd.Series([r1])).iloc[0] is False

    def raster_equals(x, y):
        a, b = WR.decode(x), WR.decode(y)
        if (a.width, a.height, a.ip_x, a.ip_y, a.scale_x, a.scale_y) != (
            b.width, b.height, b.ip_x, b.ip_y, b.scale_x, b.scale_y
        ) or len(a.bands) != len(b.bands):
            return False
        return all((p.data == q.data).all() for p, q in zip(a.bands, b.bands))

    assert raster_equals(r1, r1) is True
    assert raster_equals(r4, r1) is False


def test_raster_summary_and_bandmetadata_goldens():
    """SummaryTest.java only asserts the summary is non-empty (it prints);
    upgraded to the exact string for wkbString1 (cell-center fixture:
    ip (0,0) with scale 1 -> pixel-aligned envelope [-0.5,-0.5,1.5,1.5]).
    BandMetadataTest.java expects "" for an out-of-range band — and passes
    only because BandMetaData.java's in-range path is an
    UnsupportedOperationException stub; ours returns NULL out-of-range
    (SQL convention) and a real metadata string in range (divergence)."""
    import pandas as pd

    from jena_geo_spark.raster import attributes as RT

    raw = bytes.fromhex(WKB1)
    got = RT.rt_summary.func(pd.Series([raw])).iloc[0]
    assert got == (
        "Raster of 2x2 MemSize: 4 has 1 bands and extent of "
        "[-0.5, -0.5, 1.5, 1.5] Tiles: 1/1[2/2] Offset: [0/0]"
    )
    bm = RT.rt_bandmetadata.func
    assert bm(pd.Series([raw]), pd.Series([10])).iloc[0] is None
    assert bm(pd.Series([raw]), pd.Series([0])).iloc[0] == (
        "band=0 pixeltype=8BUI nodatavalue=None isoutdb=false path="
    )


def test_raster_intersection_goldens():
    """raster/relation/IntersectionTest.java.  The reference's
    RasterIntersection returns THE_EMPTY_RASTER for disjoint inputs and
    its two other cases are weak assertNotEquals; ours returns the
    envelope-intersection POLYGON (empty for disjoint — wkbString4 sits at
    EPSG:3857-scale coordinates, and wkbString3's envelope [2.5,3,5.5,7]
    misses wkbString1's [-0.5,-0.5,1.5,1.5])."""
    import pandas as pd

    from jena_geo_spark.geom import wkt as W
    from jena_geo_spark.raster import attributes as RT

    f = RT.rt_intersection_geom.func
    r1, r3, r4 = (bytes.fromhex(h) for h in (WKB1, WKB3, WKB4))

    def wkt(a, b):
        return W.to_wkt(W.from_wkb(f(pd.Series([a]), pd.Series([b])).iloc[0]))

    assert wkt(r1, r1) == (
        "POLYGON ((-0.5 -0.5, 1.5 -0.5, 1.5 1.5, -0.5 1.5, -0.5 -0.5))"
    )
    assert wkt(r4, r1) == "POLYGON EMPTY"
    assert wkt(r1, r3) == "POLYGON EMPTY"
