"""Property-based round-trip fuzz of the from-scratch raster/image
codecs: WKB raster (both endians, every pixel type, nodata flags),
baseline TIFF, PNG, and the JPEG shape/totality contract.

The fixed-fixture tests pin golden bytes (tests/test_raster.py,
test_jpeg.py); this file sweeps dimensions down to 1×1, random band
counts, every pixel type, and arbitrary geotransforms — the places a
hand-written binary codec typically breaks (offset arithmetic, dtype
widths, row order, padding).

Reference parity: rt_asWKB/rt_fromWKB (wkb_raster.py cites the PostGIS
raster WKB layout), AsTIFF.java / AsJPG.java / AsPNG.java exporters.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jena_geo_spark.image import codec, jpeg
from jena_geo_spark.raster import tiff as T
from jena_geo_spark.raster import wkb_raster as WR

_FUZZ = settings(
    max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

_PIX_MAX = {0: 1, 1: 3, 2: 15, 3: 127, 4: 255, 5: 32767, 6: 65535,
            7: 2**31 - 1, 8: 2**32 - 1, 10: 1e30, 11: 1e300}

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)


@st.composite
def raster_case(draw):
    w = draw(st.integers(1, 16))
    h = draw(st.integers(1, 16))
    n_bands = draw(st.integers(1, 3))
    pixtype = draw(st.sampled_from(sorted(WR.PIXEL_DTYPES)))
    np_code, _ = WR.PIXEL_DTYPES[pixtype]
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    bands = []
    for _ in range(n_bands):
        if np_code.startswith("f"):
            data = rng.uniform(-1e4, 1e4, (h, w)).astype(np_code)
        else:
            data = rng.integers(0, _PIX_MAX[pixtype] + 1, (h, w)).astype(np_code)
        nodata = draw(st.one_of(st.none(), st.integers(0, _PIX_MAX[min(pixtype, 4)])))
        bands.append(WR.Band(pixtype=pixtype, nodata=nodata, data=data,
                             nodata_raw=nodata or 0))
    return WR.Raster(
        version=0,
        scale_x=draw(finite.filter(lambda v: abs(v) > 1e-9)),
        scale_y=-abs(draw(finite.filter(lambda v: abs(v) > 1e-9))),
        ip_x=draw(finite),
        ip_y=draw(finite),
        skew_x=0.0,
        skew_y=0.0,
        srid=draw(st.sampled_from([0, 4326, 3857])),
        width=w,
        height=h,
        bands=bands,
    )


def _assert_raster_equal(a: WR.Raster, b: WR.Raster):
    for f in ("scale_x", "scale_y", "ip_x", "ip_y", "skew_x", "skew_y",
              "srid", "width", "height"):
        assert getattr(a, f) == getattr(b, f), f
    assert len(a.bands) == len(b.bands)
    for ba, bb in zip(a.bands, b.bands):
        assert ba.pixtype == bb.pixtype
        assert (ba.nodata is None) == (bb.nodata is None)
        if ba.nodata is not None:
            assert float(ba.nodata) == float(bb.nodata)
        assert ba.data.shape == bb.data.shape
        assert np.array_equal(ba.data, bb.data), (ba.data, bb.data)


@_FUZZ
@given(raster_case(), st.booleans())
def test_wkb_raster_roundtrip(r, little):
    out = WR.decode(WR.encode(r, little=little))
    _assert_raster_equal(r, out)
    # hex twin must agree byte-for-byte
    assert WR.decode_hex(WR.encode_hex(r, little=little)).width == r.width


@_FUZZ
@given(raster_case())
def test_tiff_roundtrip(r):
    buf = T.encode_tiff(r)
    tags, arr = T.decode_tiff(buf)
    assert tags[256][0] == r.width and tags[257][0] == r.height
    cube = np.stack([b.data for b in r.bands], axis=-1)
    np_code, _ = WR.PIXEL_DTYPES[r.bands[0].pixtype]
    assert np.array_equal(arr, cube.astype("<" + np_code))
    back = T.tiff_to_raster(buf)
    # top-down rasters (scale_y < 0) round-trip the geotransform exactly
    for f in ("scale_x", "scale_y", "ip_x", "ip_y", "width", "height"):
        assert getattr(back, f) == pytest.approx(getattr(r, f)), f
    assert np.array_equal(
        np.stack([b.data for b in back.bands], axis=-1), cube
    )


@_FUZZ
@given(st.integers(1, 32), st.integers(1, 32), st.integers(0, 2**31))
def test_png_roundtrip_bitexact(h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(codec.decode_png(codec.encode_png(arr)), arr)


@_FUZZ
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31))
def test_jpeg_shape_totality(h, w, seed):
    """Any (h, w, 3) uint8 input must encode+decode to the same shape and
    dtype (no crash on non-multiple-of-8, 1-pixel, or 1-row images);
    smooth content must clear the 40 dB pipeline gate."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 70 * np.sin((xx + seed % 7) / 13.0) * np.cos(yy / 9.0))[..., None]
    arr = np.clip(np.round(base + np.array([0.0, 15.0, -10.0])), 0, 255).astype(
        np.uint8
    )
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=95))
    assert dec.shape == arr.shape and dec.dtype == np.uint8
    assert codec.psnr(arr, dec) >= 40.0


def test_stage_udf_splice_fuzz_all_pixtypes(spark):
    """Property fuzz of the homogeneous-batch splice encoder: across
    every pixel type, random shapes/geotransforms and every LOCAL2 op,
    the batch path must be byte-identical to the per-tile path (both
    produce 64BF outputs; the splice keeps each tile's own
    geotransform+srid)."""
    import random

    import numpy as np
    from pyspark.sql import functions as F

    from jena_geo_spark.functions import registry_support as RS
    from jena_geo_spark.raster import algebra as RA
    from jena_geo_spark.raster import wkb_raster as WR

    rng = np.random.default_rng(29)
    pyr = random.Random(31)

    def tile(pixtype, w, h, i):
        dt, _ = WR.PIXEL_DTYPES[pixtype]
        r = WR.Raster(
            0, pyr.uniform(0.5, 2.0), -1.0, float(i), float(10 * i),
            0.0, 0.0, pyr.choice([4326, 3857, 0]), w, h,
        )
        if dt.startswith("f"):
            data = rng.normal(size=(h, w)).astype(dt)
        else:
            info = np.iinfo(dt)
            lo, hi = max(info.min, -3), min(info.max, 97)
            data = rng.integers(lo, hi + 1, (h, w)).astype(dt)
        r.bands.append(WR.Band(pixtype, None, data))
        return WR.encode(r)

    for pixtype in sorted(WR.PIXEL_DTYPES):
        w, h = pyr.randint(1, 9), pyr.randint(1, 9)
        op = pyr.choice(sorted(RA.LOCAL2))
        if op == "subtractfromconst":
            continue  # const-only op, not exposed via rast2_udf
        rows = [(i, tile(pixtype, w, h, i), tile(pixtype, w, h, 50 + i)) for i in range(12)]
        df = spark.createDataFrame(rows, "id long, ra binary, rb binary")
        got = {
            r.id: bytes(r.o)
            for r in df.select("id", RS.rast2_udf(op)(F.col("ra"), F.col("rb")).alias("o")).collect()
        }
        for i, a, b in rows:
            exp = WR.encode(RA.map_algebra2(WR.decode(bytes(a)), WR.decode(bytes(b)), op))
            assert got[i] == exp, (pixtype, op, i)


def test_stage_udf_unary_splice_matches_per_tile(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from jena_geo_spark.functions import registry_support as RS
    from jena_geo_spark.raster import algebra as RA
    from jena_geo_spark.raster import wkb_raster as WR

    rng = np.random.default_rng(41)

    def tile(i):
        r = WR.Raster(0, 1.0, -1.0, float(i), 0.0, 0.0, 0.0, 4326, 5, 4)
        r.bands.append(WR.Band(5, None, rng.integers(-9, 60, (4, 5)).astype(np.int16)))
        return WR.encode(r)

    rows = [(i, tile(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, r binary")
    for op in sorted(RA.LOCAL1):
        got = {r.id: bytes(r.o) for r in df.select("id", RS.rast1_udf(op)(F.col("r")).alias("o")).collect()}
        for i, t in rows:
            assert got[i] == WR.encode(RA.map_algebra1(WR.decode(bytes(t)), op)), (op, i)


def test_arrow_stage_udf_fallbacks_exact(spark):
    """r6: the map-algebra UDFs moved to arrow_udf with a zero-copy
    buffer fast path — NULL rows, big-endian tiles, mixed shapes and
    nodata bands must all take the per-tile fallback and stay byte-exact
    with the scalar encoder (and NULLs must come back as NULL)."""
    import numpy as np
    from pyspark.sql import functions as F

    from jena_geo_spark.functions import registry_support as RS
    from jena_geo_spark.raster import algebra as RA
    from jena_geo_spark.raster import wkb_raster as WR

    def mk(w, h, seed, little=True, nodata=None, pixtype=7):
        v = (np.arange(w * h) * 3 + seed).reshape(h, w).astype(np.int32)
        r = WR.Raster(
            0, 1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 4326, w, h,
            [WR.Band(pixtype, nodata, v, nodata or 0)],
        )
        return WR.encode(r, little=little)

    rows = [
        (1, mk(4, 4, 1), mk(4, 4, 7)),  # homogeneous little-endian batch
        (2, None, mk(4, 4, 9)),  # NULL a
        (3, mk(4, 4, 2), None),  # NULL b
        (4, mk(4, 4, 3, little=False), mk(4, 4, 5, little=False)),  # BE
        (5, mk(2, 3, 4), mk(2, 3, 6)),  # shape differs from row 1
        (6, mk(4, 4, 8, nodata=0.0), mk(4, 4, 2)),  # nodata band
    ]
    df = spark.createDataFrame(rows, "id long, ra binary, rb binary")
    got = {
        r.id: r.c
        for r in df.select("id", RS.rast2_udf("add")("ra", "rb").alias("c")).collect()
    }
    for i, a, b in rows:
        if a is None or b is None:
            assert got[i] is None, i
        else:
            exp = WR.encode(RA.map_algebra2(WR.decode(a), WR.decode(b), "add"))
            assert bytes(got[i]) == exp, i

    # rastconst: a non-negative band index must route per-tile (the fast
    # path only covers band < 0 == every band)
    mulc = RS.rastconst_udf("multiply")
    df2 = spark.createDataFrame(
        [(1, mk(4, 4, 1), 0, 2.0), (2, mk(4, 4, 2), -1, 3.0)],
        "id long, ra binary, band int, k double",
    )
    out2 = {
        r.id: bytes(r.c)
        for r in df2.select("id", mulc("ra", "band", "k").alias("c")).collect()
    }
    assert out2[1] == WR.encode(
        RA.map_algebra_const(WR.decode(mk(4, 4, 1)), "multiply", 2.0, 0)
    )
    assert out2[2] == WR.encode(
        RA.map_algebra_const(WR.decode(mk(4, 4, 2)), "multiply", 3.0, -1)
    )
