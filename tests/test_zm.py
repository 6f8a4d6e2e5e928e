"""Z/M ordinate support: codec round-trips + the Z/M function family
(reference point/attribute/{Z,M,ZMax,Zmflag}.java, Force3D/Force3DM,
LocateBetweenElevations)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jena_geo_spark.geom import wkt as W


@pytest.mark.parametrize(
    "s",
    [
        "POINT Z (1 2 3)",
        "POINT M (1 2 4)",
        "POINT ZM (1 2 3 4)",
        "LINESTRING Z (0 0 1, 5 0 9, 10 0 2)",
        "LINESTRING M (0 0 1, 5 0 9)",
        "POLYGON Z ((0 0 1, 4 0 2, 4 4 3, 0 4 4, 0 0 1))",
        "MULTIPOLYGON Z (((0 0 1, 1 0 1, 1 1 1, 0 0 1)))",
        "MULTILINESTRING M ((0 0 1, 1 1 2), (2 2 3, 3 3 4))",
        "MULTIPOINT Z (0 1 5, 1 0 6)",
        "POLYGON ZM ((0 0 1 7, 4 0 2 8, 4 4 3 9, 0 0 1 7))",
    ],
)
def test_wkt_wkb_roundtrip_zm(s):
    g = W.from_wkt(s)
    assert W.to_wkt(g) == s
    assert W.to_wkt(W.from_wkb(W.to_wkb(g))) == s


def test_bare_arity_inference_and_ewkb():
    import struct

    assert W.from_wkt("POINT(1 2 3)").dims == "XYZ"
    assert W.from_wkt("POINT(1 2 3 4)").dims == "XYZM"
    ewkb = b"\x01" + struct.pack("<I", 1 | 0x80000000) + struct.pack("<3d", 1, 2, 3)
    assert W.to_wkt(W.from_wkb(ewkb)) == "POINT Z (1 2 3)"
    ewkb_m = b"\x01" + struct.pack("<I", 1 | 0x40000000) + struct.pack("<3d", 1, 2, 9)
    assert W.to_wkt(W.from_wkb(ewkb_m)) == "POINT M (1 2 9)"


def test_planar_kernels_ignore_zm():
    from jena_geo_spark.geom.kernel import geom_distance_g, ring_area

    p = W.from_wkt("POLYGON Z ((0 0 9, 4 0 9, 4 4 9, 0 4 9, 0 0 9))")
    assert ring_area(p.exterior()) == 16.0
    assert geom_distance_g(W.from_wkt("POINT Z (10 0 5)"), p) == 6.0
    assert geom_distance_g(W.from_wkt("POINT Z (2 2 5)"), p) == 0.0


def test_zm_function_family(spark):
    from jena_geo_spark.functions.vector import st_geomfromtext
    from jena_geo_spark.functions.zm import (
        st_3ddistance,
        st_force2d,
        st_force3dm,
        st_force3dz,
        st_m,
        st_mmax,
        st_z,
        st_zmax,
        st_zmflag,
        st_zmin,
    )

    df = spark.createDataFrame(
        [
            ("LINESTRING Z (0 0 1, 5 0 9, 10 0 2)", "POINT Z (0 0 5)"),
            ("POINT ZM (1 2 3 4)", "POINT Z (1 2 3)"),
            ("POINT(1 2)", "POINT(4 6)"),
        ],
        "a string, b string",
    ).select(
        st_geomfromtext(F.col("a")).alias("ga"), st_geomfromtext(F.col("b")).alias("gb")
    )
    rows = df.select(
        st_z("ga").alias("z"),
        st_m("ga").alias("m"),
        st_zmin("ga").alias("zmin"),
        st_zmax("ga").alias("zmax"),
        st_mmax("ga").alias("mmax"),
        st_zmflag("ga").alias("flag"),
        st_3ddistance("ga", "gb").alias("d3"),
    ).collect()
    assert rows[0]["z"] == 1.0 and rows[0]["zmin"] == 1.0 and rows[0]["zmax"] == 9.0
    assert rows[0]["m"] is None and rows[0]["flag"] == 2
    # (0,0,5) projected onto segment (0,0,1)->(5,0,9): t=32/89
    t = 32.0 / 89.0
    expect = np.sqrt((5 * t) ** 2 + (1 + 8 * t - 5) ** 2)
    assert rows[0]["d3"] == pytest.approx(expect, rel=1e-12)
    assert rows[1]["z"] == 3.0 and rows[1]["m"] == 4.0 and rows[1]["flag"] == 3
    assert rows[2]["flag"] == 0 and rows[2]["z"] is None
    assert rows[2]["d3"] == 5.0  # planar 3-4-5 with z=0

    f = df.select(
        st_force2d("ga").alias("f2"),
        st_force3dz("ga", F.lit(7.0)).alias("f3z"),
        st_force3dm("ga", F.lit(2.5)).alias("f3m"),
    ).collect()
    assert W.from_wkb(bytes(f[2]["f2"])).dims == "XY"
    assert W.from_wkb(bytes(f[0]["f2"])).dims == "XY"
    assert W.from_wkb(bytes(f[2]["f3z"])).dims == "XYZ"
    g3m = W.from_wkb(bytes(f[2]["f3m"]))
    assert g3m.dims == "XYM" and g3m.parts[0][0, 2] == 2.5
    # force3dz on XYM widens to XYZM with Z before M
    zm = W.from_wkb(bytes(df.select(st_force3dz(st_force3dm("gb", F.lit(1.0)), F.lit(9.0)).alias("x")).collect()[1]["x"]))
    assert zm.dims == "XYZM"


def test_locate_between_elevations(spark):
    from jena_geo_spark.functions.vector import st_geomfromtext
    from jena_geo_spark.functions.zm import st_locate_between_elevations

    df = spark.createDataFrame(
        [("LINESTRING Z (0 0 0, 10 0 10)",)], "a string"
    ).select(st_geomfromtext(F.col("a")).alias("g"))
    out = df.select(
        st_locate_between_elevations(F.col("g"), F.lit(2.0), F.lit(6.0)).alias("o")
    ).first()["o"]
    g = W.from_wkb(bytes(out))
    assert g.kind == "multilinestring" and len(g.parts) == 1
    seg = g.parts[0]
    assert seg[0].tolist() == [2.0, 0.0, 2.0] and seg[-1].tolist() == [6.0, 0.0, 6.0]
