"""Tile assignment: cell→tile mapping + explicit range partitioning.

Spark-first replacement for the reference's ``ST_Retile`` / tile attribute
family (``raster/transform/Retile.java``, tile accessors
``raster/attribute/*Tile*.java``): instead of retiling one in-memory
coverage, we assign every row of a 10^12-row table to a spatial tile
(= quadtree cell at ``tile_res``) and lay the data out by
``repartitionByRange(tile_id)`` so each output partition is a contiguous
spatial tile range (Z-order locality comes free from the morton packing).

Hot-tile skew (cities/oceans): tiles whose row share exceeds
``hot_share`` are detected with a cheap aggregate and split into
``salt_buckets`` sub-partitions via a deterministic salt column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spatial_join import FINE_RES, ancestor_col, with_point_cells


def assign_tiles(
    points: DataFrame,
    tile_res: int = 6,
    lon: str = "lon",
    lat: str = "lat",
    fine_res: int = FINE_RES,
    tile_col: str = "tile_id",
) -> DataFrame:
    """Add ``tile_id`` (int64 quadtree cell at tile_res).  Pure Catalyst
    after the single fine-cell UDF; callers that already ran
    ``with_point_cells`` can pass a df carrying ``cell_fine``."""
    df = points if "cell_fine" in points.columns else with_point_cells(points, lon, lat, fine_res)
    return df.withColumn(tile_col, ancestor_col(F.col("cell_fine"), fine_res, tile_res))


def detect_hot_tiles(df: DataFrame, tile_col: str = "tile_id", hot_share: float = 0.05) -> list[int]:
    """Tiles holding more than ``hot_share`` of all rows (skew candidates)."""
    total = df.count()
    if total == 0:
        return []
    rows = (
        df.groupBy(tile_col)
        .count()
        .filter(F.col("count") > hot_share * total)
        .select(tile_col)
        .collect()
    )
    return [r[0] for r in rows]


def repartition_by_tile(
    df: DataFrame,
    tile_col: str = "tile_id",
    num_partitions: int | None = None,
    hot_tiles: list[int] | None = None,
    salt_buckets: int = 8,
    mode: str = "hash",
) -> DataFrame:
    """Partition by tile id; hot tiles are salted so one tile can span
    several partitions instead of one straggler reducer.

    ``mode='hash'`` (default): single-pass shuffle — each tile lands wholly
    in one partition.  ``mode='range'``: additionally lays tiles out in
    Z-order-contiguous ranges (better for downstream range scans) at the
    cost of Spark's range-sampling pass, which re-executes the upstream
    plan — callers should persist() first if the input is expensive."""
    if hot_tiles:
        salt = F.when(
            F.col(tile_col).isin(hot_tiles),
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns[:1]]), F.lit(salt_buckets)),
        ).otherwise(F.lit(0))
        df = df.withColumn("_tile_salt", salt.cast("int"))
        parts = [F.col(tile_col), F.col("_tile_salt")]
    else:
        parts = [F.col(tile_col)]
    fn = df.repartitionByRange if mode == "range" else df.repartition
    if num_partitions:
        return fn(num_partitions, *parts)
    return fn(*parts)


def tile_histogram(df: DataFrame, tile_col: str = "tile_id") -> DataFrame:
    return df.groupBy(tile_col).agg(F.count("*").alias("n_rows"))
