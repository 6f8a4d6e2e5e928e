"""Structured Streaming surface: streaming spatial join + watermarked tile
rollup.

The reference is a batch SPARQL engine (SURVEY §2.6 marked streaming n/a);
this module is the Spark-native extension of the same operators to
unbounded inputs, per the task's Structured Streaming mandate:

* ``read_point_stream`` — file-source stream of point rows (parquet dirs
  are the bench stand-in for Kafka/Kinesis; swap ``format``);
* ``stream_zone_join`` — the SAME cover → broadcast equi-join → exact PIP
  refine used in batch (operators/spatial_join.py): the zone side is a
  static broadcast frame, so this is a stream-static join — fully
  supported, no state store needed, the stream side never shuffles;
* ``stream_tile_counts`` — event-time windowed rollup per (window, tile,
  zone) with a watermark bounding late data and state size.

At 100 TB/day the shape holds: the static zone cover is tiny and broadcast
to every executor once per epoch; per-micro-batch work is a map-side join
plus a partial aggregation, and the watermark keeps the streaming-agg
state at O(#tiles × #windows-in-flight).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.spatial_join import ZoneCover, spatial_join_points_zones
from ..operators.tiling import assign_tiles

POINT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
        StructField("payload", StringType()),
    ]
)


def read_point_stream(
    spark: SparkSession,
    path: str,
    schema: StructType = POINT_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_zone_join(
    spark: SparkSession, stream: DataFrame, zone_covers: list[ZoneCover]
) -> DataFrame:
    """Stream-static spatial join — identical plan to the batch operator
    (broadcast zone cells, no stream-side shuffle)."""
    return spatial_join_points_zones(spark, stream, zone_covers, strategy="broadcast")


def stream_tile_counts(
    joined: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    tile_res: int = 6,
) -> DataFrame:
    """Watermarked event-time rollup: rows per (window, tile, zone)."""
    tiled = assign_tiles(joined, tile_res=tile_res)
    return (
        tiled.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "tile_id", "zone_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tile_id",
            "zone_id",
            "n",
        )
    )


def run_available_now(df: DataFrame, table_name: str, output_mode: str = "complete"):
    """Drain everything currently available into an in-memory sink and stop
    (test/bench harness; production would writeStream to parquet/Iceberg
    with checkpointLocation)."""
    q = (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
