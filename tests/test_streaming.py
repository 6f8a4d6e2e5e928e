"""Structured Streaming: the streaming spatial join + watermarked tile
rollup must produce exactly the batch answer once all input is drained
(availableNow drains everything, so stream == batch is an exact gate)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from jena_geo_spark.operators.spatial_join import build_zone_covers, spatial_join_points_zones
from jena_geo_spark.operators.tiling import assign_tiles
from jena_geo_spark.streaming import pipeline as SP

ZONES = [
    ("z_east", "POLYGON ((0 -60, 170 -60, 170 60, 0 60, 0 -60))"),
    ("z_west", "POLYGON ((-170 -60, -10 -60, -10 60, -170 60, -170 -60))"),
]


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Point rows with event timestamps, written as several files so the
    file source sees multiple input splits."""
    d = str(tmp_path_factory.mktemp("pt_stream"))
    base = (
        spark.range(0, 3000)
        .select(
            F.col("id").alias("event_id"),
            (F.timestamp_seconds(F.lit(1704067200) + (F.col("id") % 7200))).alias("ts"),
            ((F.col("id") * 2654435761) % 360000000 / 1000000.0 - 180.0).alias("lon"),
            ((F.col("id") * 2246822519) % 180000000 / 1000000.0 - 90.0).alias("lat"),
            F.concat(F.lit("p"), F.col("id")).alias("payload"),
        )
    )
    base.repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_equals_batch(spark, stream_dir):
    covers = build_zone_covers(ZONES)
    stream = SP.read_point_stream(spark, stream_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    joined = SP.stream_zone_join(spark, stream, covers)
    counts = SP.stream_tile_counts(joined, window="30 minutes", tile_res=3)
    q = SP.run_available_now(counts, "tile_counts_stream")
    got = spark.table("tile_counts_stream")

    batch_pts = spark.read.parquet(stream_dir)
    batch_joined = assign_tiles(
        spatial_join_points_zones(spark, batch_pts, covers), tile_res=3
    )
    want = (
        batch_joined.groupBy(
            F.window(F.col("ts"), "30 minutes").alias("w"), "tile_id", "zone_id"
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tile_id",
            "zone_id",
            "n",
        )
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_stream_plan_is_stream_static_broadcast(spark, stream_dir):
    """The streaming join must stay a stream-static BROADCAST join: no
    stateful join operator, no shuffle of the stream side before the join."""
    covers = build_zone_covers(ZONES)
    stream = SP.read_point_stream(spark, stream_dir)
    joined = SP.stream_zone_join(spark, stream, covers)
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "StreamingRelation" in plan
    # the zone side must carry the broadcast hint (stream-static broadcast
    # join — no stateful stream-stream join operator)
    assert "BROADCAST" in plan.upper()
