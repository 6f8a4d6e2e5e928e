"""Regression tests for the r1 verdict fixes: empty-geometry hardening,
multipolygon WKT parsing, part-pair distance (no phantom bridge segments),
multipolygon PIP, and ST_RemoveRing bounds validation."""

import numpy as np
import pytest

from jena_geo_spark.geom import kernel as K
from jena_geo_spark.geom import wkt as W


def test_empty_geom_roundtrip_and_accessors():
    e = W.Geom("polygon", [])
    g = W.from_wkb(W.to_wkb(e))
    assert g.parts == []
    assert g.exterior().shape == (0, 2)
    assert g.all_coords().shape == (0, 2)
    assert g.chains() == []
    assert W.to_wkt(g) == "POLYGON EMPTY"


def test_multipolygon_wkt_parse_roundtrip():
    s = (
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((10 0, 11 0, 11 1, 10 1, 10 0), "
        "(10.2 0.2, 10.4 0.2, 10.4 0.4, 10.2 0.4, 10.2 0.2)))"
    )
    g = W.from_wkt(s)
    assert g.kind == "multipolygon"
    assert len(g.parts) == 2
    assert len(g.parts[0]) == 1 and g.parts[0][0].shape == (5, 2)
    assert len(g.parts[1]) == 2
    assert W.to_wkt(g) == s
    assert W.to_wkt(W.from_wkb(W.to_wkb(g))) == s


def test_geom_distance_part_pairs_no_phantom_bridge():
    mp = W.from_wkt(
        "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((10 0, 11 0, 11 1, 10 1, 10 0)))"
    )
    pt = W.from_wkt("POINT(5 0.5)")
    # flattened all_coords would bridge the two squares and report ~4.03
    assert K.geom_distance_g(mp, pt) == 4.0
    # disjoint multilinestring parts must not intersect via the bridge
    ml = W.from_wkt("MULTILINESTRING((0 0, 1 0), (0 2, 1 2))")
    probe = W.from_wkt("LINESTRING(0.5 0.5, 0.5 1.5)")
    assert K.geom_distance_g(ml, probe) == 0.5


def test_geom_distance_areal_containment():
    holey = W.from_wkt(
        "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    assert K.geom_distance_g(holey, W.from_wkt("POINT(2 2)")) == 0.0
    assert K.geom_distance_g(holey, W.from_wkt("POINT(5 5)")) == 1.0  # in hole


def test_area_empty_and_multipolygon(spark):
    from pyspark.sql import functions as F

    from jena_geo_spark.functions.vector import st_area

    rows = [
        (1, bytearray(W.to_wkb(W.Geom("polygon", [])))),
        (
            2,
            bytearray(
                W.to_wkb(
                    W.from_wkt(
                        "MULTIPOLYGON(((0 0, 2 0, 2 2, 0 2, 0 0)),"
                        "((10 0, 13 0, 13 1, 10 1, 10 0)))"
                    )
                )
            ),
        ),
    ]
    df = spark.createDataFrame(rows, "id int, g binary")
    got = {r["id"]: r["a"] for r in df.select("id", st_area(F.col("g")).alias("a")).collect()}
    assert got[1] == 0.0
    assert got[2] == 7.0


def test_pip_multipolygon_all_members(spark):
    from pyspark.sql import functions as F

    from jena_geo_spark.functions.vector import st_point_in_polygon

    mp = W.to_wkb(
        W.from_wkt(
            "MULTIPOLYGON(((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 0, 12 0, 12 2, 10 2, 10 0)))"
        )
    )
    rows = [
        (1, 1.0, 1.0, bytearray(mp)),  # in member 0
        (2, 11.0, 1.0, bytearray(mp)),  # in member 1 — the r1 bug dropped this
        (3, 5.0, 1.0, bytearray(mp)),  # in neither
    ]
    df = spark.createDataFrame(rows, "id int, lon double, lat double, g binary")
    got = {
        r["id"]: r["m"]
        for r in df.select(
            "id", st_point_in_polygon(F.col("lon"), F.col("lat"), F.col("g")).alias("m")
        ).collect()
    }
    assert got == {1: True, 2: True, 3: False}


def test_removering_bounds_validation(spark):
    from pyspark.sql import functions as F

    from jena_geo_spark.functions.vector import st_removering

    holey = W.to_wkb(
        W.from_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    )
    df = spark.createDataFrame([(1, bytearray(holey))], "id int, g binary")
    # interior index is ZERO-based (reference RemoveRing.java)
    ok = df.select(st_removering(F.col("g"), F.lit(0)).alias("g")).collect()
    assert len(W.from_wkb(bytes(ok[0]["g"])).parts) == 1
    for bad in (-1, 1):
        with pytest.raises(Exception):
            df.select(st_removering(F.col("g"), F.lit(bad)).alias("g")).collect()


def test_edges_intersect_any_vectorised():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    cross = np.array([[2, -1], [2, 5]], dtype=float)
    far = np.array([[10, 10], [11, 11]], dtype=float)
    touch = np.array([[4, 2], [8, 2]], dtype=float)  # endpoint on edge
    assert K.edges_intersect_any(sq, cross)
    assert not K.edges_intersect_any(sq, far)
    assert K.edges_intersect_any(sq, touch)
