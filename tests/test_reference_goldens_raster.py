"""Raster map-algebra goldens ported from the reference's
``src/test/.../test/raster/algebra/*Test.java`` (r3 verdict ask #3).

The reference tests there are weak — every one asserts only
``assertNotEquals(input, result)`` — but they pin three things worth
porting: the INPUT fixtures (SampleRasters.java's annotated byte layouts),
the ARGUMENT ORDER of each operator, and which operator family each name
dispatches to (JAI descriptors, ``raster/algebra/*.java``).  Here each
port is upgraded to an exact VALUE assert computed by hand from the
annotated fixture pixels.

Divergences (reference impls that are dead or broken, documented rather
than replicated):

* ``Clamp``/``Binarize``/``Threshold`` take a band index in the reference
  (applied to one band); ours apply to every band — the reference's own
  JAI delegates operate on all bands anyway, the band argument is unused
  past validation.
* ``raster/algebra/Equal`` and ``raster/relation/{Greater,Smaller,
  Median}Intersects`` and ``RasterEquals`` are NOT registered in
  PostGISConfig.java (dead code); EqualTest.java additionally asserts
  that Equal(r, r) *equals the input raster literal* — pixelwise
  equality of r with itself is an all-ones raster, so the test
  contradicts any equality semantics;
  their tests are inconsistent with their own impls (SmallerIntersects'
  same-bbox branch returns a raster literal where the test expects a
  boolean; GreaterIntersectsTest expects FALSE for min(0) > -1).  Only
  the registered ``ValueIntersects`` semantics are ported.
"""

import numpy as np
import pytest

from jena_geo_spark.raster import algebra as A
from jena_geo_spark.raster import wkb_raster as WR

# SampleRasters.java fixtures (annotated byte layout there is the spec)
WKB1 = (
    "00000000013FF00000000000003FF0000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000010E600020002040000010100"
)
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

R1 = lambda: WR.decode_hex(WKB1)  # noqa: E731 — 2x2 8BUI [[0,1],[1,0]]
R3 = lambda: WR.decode_hex(WKB3)  # noqa: E731 — 3x2 16BSI [[-1,0,-16],[127,10,2]]
R4 = lambda: WR.decode_hex(WKB4)  # noqa: E731 — 5x5 RGB 8BUI


def px(r, band=0):
    return r.bands[band].data.ravel().tolist()


def test_algebra_two_raster_ops():
    # AddTest.java: Add(wkb1, wkb1)
    assert px(A.map_algebra2(R1(), R1(), "add")) == [0, 2, 2, 0]
    # SubtractTest.java: Subtract(a, b) = a - b
    assert px(A.map_algebra2(R3(), R3(), "subtract")) == [0] * 6
    # MultTest / DivTest (0/0 -> 0, the JAI divide-by-zero convention)
    assert px(A.map_algebra2(R1(), R1(), "multiply")) == [0, 1, 1, 0]
    assert px(A.map_algebra2(R1(), R1(), "divide")) == [0, 1, 1, 0]
    # MinTest / MaxTest / MeanTest are idempotent on equal inputs
    assert px(A.map_algebra2(R3(), R3(), "min")) == [-1, 0, -16, 127, 10, 2]
    assert px(A.map_algebra2(R3(), R3(), "max")) == [-1, 0, -16, 127, 10, 2]
    assert px(A.map_algebra2(R3(), R3(), "mean")) == [-1, 0, -16, 127, 10, 2]
    # AndTest / OrTest / XorTest: bitwise on integer pixel values
    assert px(A.map_algebra2(R3(), R3(), "and")) == [-1, 0, -16, 127, 10, 2]
    assert px(A.map_algebra2(R3(), R3(), "xor")) == [0] * 6
    a, b = R1(), R3()
    # mixed shapes are rejected (reference requires SameAlignment)
    with pytest.raises(AssertionError):
        A.map_algebra2(a, b, "add")


def test_algebra_const_ops():
    # AddConstTest.java: AddConst(raster, band, 10)
    assert px(A.map_algebra_const(R3(), "add", 10)) == [9, 10, -6, 137, 20, 12]
    # SubtractConstTest: pixel - k
    assert px(A.map_algebra_const(R3(), "subtract", 10)) == [-11, -10, -26, 117, 0, -8]
    # SubtractFromConstTest: k - pixel (operand order is the test's point)
    assert px(A.map_algebra_const(R3(), "subtractfromconst", 10)) == [11, 10, 26, -117, 0, 8]
    # MultConst / DivConst
    assert px(A.map_algebra_const(R3(), "multiply", 10)) == [-10, 0, -160, 1270, 100, 20]
    assert px(A.map_algebra_const(R1(), "divide", 2)) == [0, 0.5, 0.5, 0]
    # AndConst / OrConst / XorConst: bitwise with the integer constant
    assert px(A.map_algebra_const(R3(), "and", 2)) == [2, 0, 0, 2, 2, 2]
    assert px(A.map_algebra_const(R3(), "or", 2)) == [-1, 2, -14, 127, 10, 2]
    assert px(A.map_algebra_const(R3(), "xor", 2)) == [-3, 2, -14, 125, 8, 0]


def test_algebra_unary_ops():
    # AbsTest / ExpTest / LogTest / NotTest
    assert px(A.map_algebra1(R3(), "abs")) == [1, 0, 16, 127, 10, 2]
    got = px(A.map_algebra1(R1(), "exp"))
    assert got[0] == 1.0 and abs(got[1] - np.e) < 1e-12
    # log: non-positive pixels -> 0 (JAI convention), log(1) = 0
    assert px(A.map_algebra1(R1(), "log")) == [0, 0, 0, 0]
    assert px(A.map_algebra1(R1(), "not")) == [1, 0, 0, 1]


def test_algebra_binarize_clamp_threshold_constant():
    # BinarizeTest.java: Binarize(wkb3, band, 31) — >= threshold -> 1
    assert px(A.binarize(R3(), 31)) == [0, 0, 0, 1, 0, 0]
    # ClampTest.java shape: Clamp(raster, band, lo, hi)
    assert px(A.clamp(R3(), 0.0, 100.0)) == [0, 0, 0, 100, 10, 2]
    # ThresholdTest.java: pixels inside [lo, hi] -> mapval, others pass
    assert px(A.threshold(R3(), 5.0, 100.0, 0.0)) == [-1, 0, -16, 127, 0, 2]
    # ConstantTest.java: Constant(wkb3, 1)
    assert px(A.constant(R3(), 1.0)) == [1] * 6
    # geometry metadata (grid, srid) must survive every local op
    out = A.constant(R3(), 1.0)
    r = R3()
    assert (out.scale_x, out.scale_y, out.ip_x, out.ip_y, out.srid) == (
        r.scale_x, r.scale_y, r.ip_x, r.ip_y, r.srid,
    )


def test_algebra_crop():
    # CropTest.java: Crop(wkb1, 0, 0, 2, 2) — the full window round-trips
    assert px(A.crop_pixels(R1(), 0, 0, 2, 2)) == [0, 1, 1, 0]
    sub = A.crop_pixels(R4(), 1, 1, 2, 2)
    r4 = R4()
    assert sub.width == 2 and sub.height == 2
    assert np.array_equal(sub.bands[0].data, r4.bands[0].data[1:3, 1:3])
    # origin shifts by the crop offset times the scale
    assert sub.ip_x == r4.ip_x + 1 * r4.scale_x
    assert sub.ip_y == r4.ip_y + 1 * r4.scale_y


def test_algebra_focal_filters():
    # MinFilterTest / MaxFilterTest on the 2x2 fixture: the 3x3 window
    # always sees both values regardless of edge padding
    assert px(A.focal(R1(), "min")) == [0, 0, 0, 0]
    assert px(A.focal(R1(), "max")) == [1, 1, 1, 1]
    # MedianFilterTest on the RGB fixture: interior pixel (2,2) of band 0
    r4 = R4()
    med = A.focal(r4, "median")
    win = r4.bands[0].data[1:4, 1:4].astype(np.float64)
    assert med.bands[0].data[2, 2] == np.median(win)


def test_algebra_dct_idct():
    # DCTTest / IDCTTest: IDCT inverts DCT exactly (orthonormal matmul);
    # the DCT of a constant raster concentrates in the DC coefficient
    r4 = R4()
    back = A.idct2(A.dct2(R4()))
    for bi in range(3):
        assert np.allclose(back.bands[bi].data, r4.bands[bi].data, atol=1e-9)
    flat = A.dct2(A.constant(R1(), 3.0))
    d = flat.bands[0].data
    assert abs(d[0, 0] - 6.0) < 1e-12  # DC = k * sqrt(w*h)
    assert np.allclose(d.ravel()[1:], 0.0, atol=1e-12)


def test_value_intersects_goldens():
    # ValueIntersectsTest.java (the registered relation): wkb1 contains
    # value 1 in band 0 -> TRUE, contains -1 -> FALSE; envelope-disjoint
    # rasters -> FALSE
    assert A.value_intersects(R1(), R1(), 1.0) is True
    assert A.value_intersects(R1(), R1(), -1.0) is False
    assert A.value_intersects(R4(), R1(), 1.0) is False


def test_make_empty_raster_fixture_roundtrip():
    """MakeEmptyRasterTest.java: the reference's 0-arg MakeEmptyRaster emits
    an exact 866-byte HexWKB literal (10x20 single-band 32BF, value x+y,
    srid 4326, the geotransform terms its null-transform GridGeometry
    happens to produce).  Pin our codec against that byte stream BOTH ways:
    decode must recover every header field and the x+y pixel lattice, and
    re-encode must reproduce the hex byte-for-byte."""
    import re

    src = (
        "/root/reference/src/test/de/hsmainz/cs/semgis/arqextension/test/"
        "raster/constructor/MakeEmptyRasterTest.java"
    )
    try:
        with open(src) as f:
            h = re.search(r'sampleRaster="([0-9A-Fa-f]+)"', f.read()).group(1)
    except OSError:
        pytest.skip("reference tree not available")
    r = WR.decode_hex(h)
    assert (r.width, r.height, r.srid) == (10, 20, 4326)
    assert (r.scale_x, r.scale_y, r.ip_x, r.ip_y, r.skew_x, r.skew_y) == (
        0.0, 0.0, 29.25, 1.5, -1.5, 3.0,
    )
    b = r.bands[0]
    assert b.pixtype == 10 and b.nodata is None and b.data.dtype == np.float32
    assert np.array_equal(
        b.data, np.add.outer(np.arange(20), np.arange(10)).astype("f4")
    )
    assert WR.encode_hex(r).lower() == h.lower()


def test_band_metadata_golden():
    """BandMetaDataTest.java: the only reachable reference behavior is the
    out-of-range band (returns empty string; the in-range branch throws
    UnsupportedOperationException — a stub).  Ours returns NULL out of
    range and a PostGIS-shaped row in range (documented divergence: the
    reference's in-range 'expected' output exists only in commented code).

    EnvelopeTest.java and ValueTest.java are not portable: Envelope's test
    expects boolean FALSE from an impl that returns a geometry literal, and
    Value's expects double 10.0 from an impl that returns a STRING and is
    called with cell (10,10) on a 2x2 raster (out of bounds)."""
    from jena_geo_spark.raster import attributes as RA

    def u1(udf, *args):
        import pandas as pd

        return udf.func(*[pd.Series([a]) for a in args]).iloc[0]

    wkb1 = bytes.fromhex(WKB1)
    assert u1(RA.rt_bandmetadata, wkb1, 10) is None
    meta = u1(RA.rt_bandmetadata, wkb1, 0)
    assert "pixeltype=8BUI" in meta and "band=0" in meta


def test_addband_and_fromwkb_goldens():
    """AddBandTest.java / RastFromWKBTest.java (both commented out; both
    registered ops): RastFromWKB re-parses a raster literal — identity on
    canonical bytes; AddBand appends a constant band.  SetUpperLeftTest
    .java and raster TranslateX/TranslateY are dead code (SetUpperLeft's
    test body is an UnsupportedOperationException, TranslateX/Y are never
    registered in PostGISConfig.java) and are not ported."""
    from jena_geo_spark.functions import registry_support as RS
    from jena_geo_spark.raster import attributes as RT

    import pandas as pd

    def u1(udf, *args):
        return udf.func(*(pd.Series([a]) for a in args)).iloc[0]

    raw = WR.encode(WR.decode(bytes.fromhex(WKB1)))
    # rt_fromwkb is a Catalyst identity (WKB-raster IS the column format):
    # the decode→encode round-trip above is the value-level equivalent
    assert WR.encode(WR.decode(raw)) == raw
    before = WR.decode(raw)
    after = WR.decode(u1(RS.rt_addband_const, raw, 7.0))
    assert len(after.bands) == len(before.bands) + 1
    assert np.all(after.bands[-1].data == 7.0)
    for bi in range(len(before.bands)):
        assert np.array_equal(after.bands[bi].data, before.bands[bi].data)


def test_const_ops_band_targeting():
    """{Add,Subtract,Mult,Div,And,Or,Xor,SubtractFrom}ConstTest.java: the
    reference arity is exec(coverage, bandnum, const) and bandnum targets a
    single band (negative = all bands, MultConst.java:33-45).  MultConst/
    DivConst are the live tests (assertNotEquals on wkbString4/wkbString1
    with const 10, band 0); And/Or/Xor/AddConst bodies are commented out
    but the impls pin the same shape.  Divergence (documented in
    map_algebra_const's docstring): the reference's untargeted-band
    constants are only neutral for add/or/xor/mult — SubtractConst and
    SubtractFromConst shift untargeted bands by 1, DivConst zero-divides
    them, AndConst masks them to the LSB.  We keep untargeted bands
    unchanged."""
    r4 = R4()  # 3-band RGB — band targeting is observable
    out = A.map_algebra_const(r4, "multiply", 10.0, band=0)
    assert px(out, 0) == [v * 10 for v in px(R4(), 0)]  # MultConstTest
    for b in (1, 2):
        assert px(out, b) == px(R4(), b)
    # DivConstTest: wkbString1 band 0, const 10
    out = A.map_algebra_const(R1(), "divide", 10.0, band=0)
    assert px(out) == [v / 10 for v in px(R1())]
    # bandnum < 0 → every band (the r3-era all-band behaviour)
    out = A.map_algebra_const(r4, "add", 1.0, band=-1)
    for b in range(3):
        assert px(out, b) == [v + 1 for v in px(R4(), b)]
    # bitwise consts operate on integer pixel values (AndConst etc.)
    out = A.map_algebra_const(R3(), "and", 10.0, band=0)
    assert px(out) == [v & 10 for v in [-1, 0, -16, 127, 10, 2]]
    out = A.map_algebra_const(R3(), "xor", 10.0, band=-1)
    assert px(out) == [v ^ 10 for v in [-1, 0, -16, 127, 10, 2]]
    out = A.map_algebra_const(R3(), "or", 8.0, band=0)
    assert px(out) == [v | 8 for v in [-1, 0, -16, 127, 10, 2]]
    # SubtractFromConstTest: const − pixel on the targeted band
    out = A.map_algebra_const(R3(), "subtractfromconst", 5.0, band=0)
    assert px(out) == [5 - v for v in [-1, 0, -16, 127, 10, 2]]


def test_attribute_goldens_wkb1():
    """raster/attribute/{Height,Width,NumBands,NumXTiles,TileWidth,
    TileGridXOffset,ScaleX,ScaleY,SkewX,UpperLeftX,UpperLeftY,MemSize,
    IsEmpty,HasNoBand,RasterToWorldCoordX,WorldToRasterCoordX}Test.java —
    every one runs against wkbString1 (2x2 8BUI, scale 1/1, origin 0/0,
    skew 0).  MemSizeTest pins the data-buffer element count (4), the
    tile family pins the single-tile render (1 tile of 2x2 at offset 0).

    Divergence: HasNoBand.java returns ``size() >= noband`` — inverted
    logic (that's HASBAND for 1-indexed bands), so its own test asserts
    HasNoBand(wkb1, 10) = FALSE on a raster that plainly has no band 10.
    Ours answers the documented question ("true if there is no band with
    the given band number", HasNoBand.java javadoc): no such 0-indexed
    band → True."""
    import pandas as pd

    from jena_geo_spark.raster import attributes as RT

    def u1(udf, *args):
        return udf.func(*(pd.Series([a]) for a in args)).iloc[0]

    wkb1 = bytes.fromhex(WKB1)
    assert u1(RT.rt_height, wkb1) == 2
    assert u1(RT.rt_width, wkb1) == 2
    assert u1(RT.rt_numbands, wkb1) == 1
    assert u1(RT.rt_scalex, wkb1) == 1.0
    assert u1(RT.rt_scaley, wkb1) == 1.0
    assert u1(RT.rt_skewx, wkb1) == 0.0
    assert u1(RT.rt_upperleftx, wkb1) == 0.0
    assert u1(RT.rt_upperlefty, wkb1) == 0.0
    assert u1(RT.rt_memsize, wkb1) == 4
    assert u1(RT.rt_isempty, wkb1) is False
    assert u1(RT.rt_numxtiles, wkb1) == 1
    assert u1(RT.rt_numytiles, wkb1) == 1
    assert u1(RT.rt_tilewidth, wkb1) == 2
    assert u1(RT.rt_tileheight, wkb1) == 2
    assert u1(RT.rt_tilegridxoffset, wkb1) == 0
    # HasNoBand: documented divergence (see docstring) — true semantics
    assert u1(RT.rt_hasnoband, wkb1, 10) is True
    assert u1(RT.rt_hasnoband, wkb1, 0) is False
    # RasterToWorldCoordXTest: exec(cov, 1, 1) = 1.0 under unit transform
    assert u1(RT.rt_rastertoworldcoordx, wkb1, 1, 1) == 1.0
    assert u1(RT.rt_rastertoworldcoordy, wkb1, 1, 1) == 1.0
    # WorldToRasterCoordXTest: exec(cov, 1.0, 1.0) = col 1
    assert u1(RT.rt_worldtorastercoordx, wkb1, 1.0, 1.0) == 1
    assert u1(RT.rt_worldtorastercoordy, wkb1, 1.0, 1.0) == 1
