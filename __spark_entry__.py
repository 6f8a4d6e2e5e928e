"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline (image+caption table → cell-cover
spatial join against zone polygons → tile assignment) on deterministic
synthetic data at sf0.001.  ``queries``/``oracle_sql`` expose the operator
suite from SURVEY.md §2 over the driver's parquet tables; oracle SQL
expressions are written term-for-term identical to the engine kernels so
floating-point results match bit-for-bit (see jena_geo_spark/contract.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial join + tile assignment on the image+caption table."""
    from pyspark.sql import functions as F

    from jena_geo_spark import datagen
    from jena_geo_spark.operators.spatial_join import (
        build_zone_covers,
        spatial_join_points_zones,
    )
    from jena_geo_spark.operators.tiling import assign_tiles

    d = datagen.ensure_dataset(0.001)
    imgs = spark.read.parquet(f"{d}/images.parquet").select(
        "image_id", "caption", "phash", "lon", "lat"
    )
    zones = [
        (r.zone_id, r.geom_wkt)
        for r in spark.read.parquet(f"{d}/zones.parquet").collect()
    ]
    covers = build_zone_covers(zones)
    joined = spatial_join_points_zones(spark, imgs, covers)
    return assign_tiles(joined, tile_res=6).select(
        "image_id", "caption", "phash", "zone_id", "tile_id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jena_geo_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from jena_geo_spark.contract import ORACLES

    return dict(ORACLES)
