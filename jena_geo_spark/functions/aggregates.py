"""Geometry aggregates (reference ``aggregate/*.java`` — 20 classes).

The reference's accumulators iterate every coordinate of every geometry
(``AvgX.java:71-95``) and fold envelopes (``BoundingBox.java:57-103``,
implemented here to the *intended* envelope-union semantics, not the
reference's accumulator bug — SURVEY §2.4).  Spark-first: explode the
coordinates once (``st_dumppoints``), then plain Catalyst aggregates —
partial/final aggregation and map-side combine come free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .vector import st_dumppoints


def explode_coords(df: DataFrame, geom_col: str, keep: list[str]) -> DataFrame:
    """One row per coordinate: keep + (x, y)."""
    pts = df.select(*keep, F.explode(st_dumppoints(F.col(geom_col))).alias("pt"))
    return pts.select(*keep, F.col("pt.x").alias("x"), F.col("pt.y").alias("y"))


def coord_aggs() -> list[Column]:
    """ST_AvgX/AvgY/MinX/MaxX/MinY/MaxY as one agg pass (Distinct variants
    come from a dropDuplicates on the exploded coordinates upstream)."""
    x = F.col("x")
    y = F.col("y")
    return [
        F.avg(x).alias("avg_x"),
        F.avg(y).alias("avg_y"),
        F.min(x).alias("min_x"),
        F.max(x).alias("max_x"),
        F.min(y).alias("min_y"),
        F.max(y).alias("max_y"),
    ]


def agg_coord_stats(
    df: DataFrame, geom_col: str, group_cols: list[str], distinct: bool = False
) -> DataFrame:
    """Grouped coordinate aggregates over a geometry column."""
    pts = explode_coords(df, geom_col, group_cols)
    if distinct:
        pts = pts.dropDuplicates(group_cols + ["x", "y"])
    return pts.groupBy(*group_cols).agg(*coord_aggs())


def agg_bounding_box(df: DataFrame, geom_col: str, group_cols: list[str]) -> DataFrame:
    """ST_BoundingBox aggregate: envelope union per group, emitted as a WKT
    polygon column ``bbox_wkt`` (intended semantics per README)."""
    pts = explode_coords(df, geom_col, group_cols)
    env = pts.groupBy(*group_cols).agg(
        F.min("x").alias("xmin"),
        F.min("y").alias("ymin"),
        F.max("x").alias("xmax"),
        F.max("y").alias("ymax"),
    )
    wkt = F.concat_ws(
        "",
        F.lit("POLYGON (("),
        F.col("xmin").cast("string"), F.lit(" "), F.col("ymin").cast("string"), F.lit(", "),
        F.col("xmax").cast("string"), F.lit(" "), F.col("ymin").cast("string"), F.lit(", "),
        F.col("xmax").cast("string"), F.lit(" "), F.col("ymax").cast("string"), F.lit(", "),
        F.col("xmin").cast("string"), F.lit(" "), F.col("ymax").cast("string"), F.lit(", "),
        F.col("xmin").cast("string"), F.lit(" "), F.col("ymin").cast("string"),
        F.lit("))"),
    )
    return env.withColumn("bbox_wkt", wkt)
