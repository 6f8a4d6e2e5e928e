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


def detect_hot_tiles(
    df: DataFrame, tile_col: str = "tile_id", hot_share: float = 0.05
) -> dict[int, float]:
    """Tiles holding more than ``hot_share`` of all rows → their row share.

    One cheap map-side-combined aggregate; at ingest this is a data-layout
    statistic computed once per table (like NDV/size stats AQE reuses), not
    a per-query cost."""
    rows = df.groupBy(tile_col).count().collect()
    total = sum(r["count"] for r in rows)
    if total == 0:
        return {}
    return {
        r[tile_col]: r["count"] / total
        for r in rows
        if r["count"] > hot_share * total
    }


def repartition_by_tile(
    df: DataFrame,
    tile_col: str = "tile_id",
    num_partitions: int | None = None,
    hot_tiles: dict[int, float] | list[int] | None = None,
    salt_buckets: int = 8,
    mode: str = "hash",
) -> DataFrame:
    """Partition by tile id; hot tiles are salted so one tile can span
    several partitions instead of one straggler reducer.

    ``hot_tiles`` — ``detect_hot_tiles`` output (tile → row share): each hot
    tile is split into ``ceil(share * salt_buckets * 2)`` sub-buckets, so a
    tile owning 70% of the rows spreads across ~1.4×salt_buckets reducers
    while a barely-hot one splits in two.  A bare list salts every listed
    tile into ``salt_buckets``.  The salt is a deterministic hash of the
    first (id) column — reproducible across resumed runs.

    ``mode='hash'`` (default): single-pass shuffle — each (tile, salt) group
    lands wholly in one partition.  ``mode='range'``: additionally lays
    tiles out in Z-order-contiguous ranges (better for downstream range
    scans) at the cost of Spark's range-sampling pass, which re-executes
    the upstream plan — callers should persist() first if the input is
    expensive.  ``mode='rebalance'``: AQE-managed REBALANCE hint — splits
    oversized reduce partitions at runtime with no statistics needed
    (``spark.sql.adaptive.optimizeSkewsInRebalancePartitions``), the
    stats-free alternative to explicit salting."""
    if mode == "rebalance":
        return df.hint("rebalance", tile_col)
    if hot_tiles:
        id_hash = F.xxhash64(*[F.col(c) for c in df.columns[:1]])
        if isinstance(hot_tiles, dict):
            import math

            salt = F.lit(0)
            for t, share in hot_tiles.items():
                b = max(2, math.ceil(share * salt_buckets * 2))
                salt = F.when(
                    F.col(tile_col) == t, F.pmod(id_hash, F.lit(b))
                ).otherwise(salt)
        else:
            salt = F.when(
                F.col(tile_col).isin(list(hot_tiles)),
                F.pmod(id_hash, F.lit(salt_buckets)),
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
