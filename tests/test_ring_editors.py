import pytest
from pyspark.sql import functions as F

from jena_geo_spark.functions.vector import (
    st_addring,
    st_area,
    st_geomfromtext,
    st_numinteriorrings,
    st_removering,
)


def test_ring_editors(spark):
    df = spark.createDataFrame(
        [("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))", "POLYGON((2 2, 4 2, 4 4, 2 4, 2 2))")],
        "p string, h string",
    ).select(
        st_geomfromtext(F.col("p")).alias("gp"),
        st_geomfromtext(F.col("h")).alias("gh"),
    )
    with_hole = df.select(st_addring(F.col("gp"), F.col("gh")).alias("g"))
    r = with_hole.select(
        st_numinteriorrings(F.col("g")).alias("n"),
        st_area(F.col("g")).alias("a"),
        # interior-ring index is ZERO-based (reference RemoveRing.java)
        st_area(st_removering(F.col("g"), F.lit(0))).alias("a2"),
        st_numinteriorrings(st_removering(F.col("g"), F.lit(0))).alias("n2"),
    ).first()
    assert r.n == 1 and r.a == 100.0 - 4.0
    assert r.n2 == 0 and r.a2 == 100.0
