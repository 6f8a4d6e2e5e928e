"""Geometry editor family (ST_AddPoint/RemovePoint/SetPoint/Reverse/…)."""

import pytest
from pyspark.sql import functions as F

from jena_geo_spark.functions.vector import (
    st_addpoint,
    st_astext,
    st_ensureclosed,
    st_geomfromtext,
    st_removepoint,
    st_removerepeatedpoints,
    st_reverse,
    st_setpoint,
)


@pytest.fixture(scope="module")
def line(spark):
    return spark.createDataFrame([("LINESTRING(0 0, 1 1, 2 2)",)], "w string").select(
        st_geomfromtext(F.col("w")).alias("g")
    )


def test_add_remove_set_point(spark, line):
    r = line.select(
        st_astext(st_addpoint(F.col("g"), F.lit(9.0), F.lit(9.0), F.lit(-1))).alias("app"),
        st_astext(st_addpoint(F.col("g"), F.lit(0.5), F.lit(0.5), F.lit(1))).alias("ins"),
        st_astext(st_removepoint(F.col("g"), F.lit(1))).alias("rm"),
        st_astext(st_setpoint(F.col("g"), F.lit(0), F.lit(7.0), F.lit(8.0))).alias("st"),
    ).first()
    assert r.app == "LINESTRING (0 0, 1 1, 2 2, 9 9)"
    assert r.ins == "LINESTRING (0 0, 0.5 0.5, 1 1, 2 2)"
    assert r.rm == "LINESTRING (0 0, 2 2)"
    assert r.st == "LINESTRING (7 8, 1 1, 2 2)"


def test_reverse_and_dedup(spark):
    df = spark.createDataFrame([("LINESTRING(0 0, 1 1, 1 1, 2 2)",)], "w string").select(
        st_geomfromtext(F.col("w")).alias("g")
    )
    r = df.select(
        st_astext(st_reverse(F.col("g"))).alias("rev"),
        st_astext(st_removerepeatedpoints(F.col("g"), F.lit(0.0))).alias("ded"),
    ).first()
    assert r.rev == "LINESTRING (2 2, 1 1, 1 1, 0 0)"
    # reference semantics: a repeated point is removed ENTIRELY (both
    # copies), RemoveRepeatedPointsTest.java
    assert r.ded == "LINESTRING (0 0, 2 2)"


def test_ensure_closed(spark):
    df = spark.createDataFrame([("POLYGON((0 0, 4 0, 4 4, 0 4))",)], "w string").select(
        st_geomfromtext(F.col("w")).alias("g")
    )
    r = df.select(st_astext(st_ensureclosed(F.col("g"))).alias("c")).first()
    assert r.c == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    # already closed → unchanged
    r2 = df.select(
        st_astext(st_ensureclosed(st_ensureclosed(F.col("g")))).alias("c")
    ).first()
    assert r2.c == r.c
