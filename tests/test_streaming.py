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


def test_stream_zone_visits_stateful(spark, tmp_path_factory):
    """applyInPandasWithState zone-visit sessionization: closed visits from
    the stream must equal a straightforward python reference over the same
    rows (visits still open at end-of-stream stay in state, not emitted)."""
    import pandas as pd

    d = str(tmp_path_factory.mktemp("visits_stream"))
    rows = []
    t0 = 1704067200
    # entity 1: zone A (3 pts), gap-close, zone A again (2 pts), zone B (1 pt)
    for i, (dt, z) in enumerate(
        [(0, "A"), (60, "A"), (120, "A"), (2000, "A"), (2060, "A"), (2120, "B")]
    ):
        rows.append((1, t0 + dt, z))
    # entity 2: zone B then zone A
    for dt, z in [(0, "B"), (30, "B"), (90, "A")]:
        rows.append((2, t0 + dt, z))
    pdf = pd.DataFrame(rows, columns=["event_id", "epoch", "zone_id"])
    sdf = spark.createDataFrame(pdf).select(
        "event_id", F.timestamp_seconds(F.col("epoch")).alias("ts"), "zone_id"
    )
    sdf.repartition(2).write.mode("overwrite").parquet(d)

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("zone_id", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(d)
    visits = SP.stream_zone_visits(stream, gap_seconds=600)
    SP.run_available_now(visits, "visits_stream", output_mode="append")
    got = {
        (r.entity, r.zone_id, int(r.enter_ts.timestamp()), int(r.exit_ts.timestamp()), r.n_points)
        for r in spark.table("visits_stream").collect()
    }
    # closed visits: entity1 A[0,120]x3 (closed by the 2000s gap),
    # A[2000,2060]x2 (closed by zone change to B); entity2 B[0,30]x2
    # (closed by zone change to A).  Open at end: e1 B, e2 A.
    want = {
        (1, "A", t0 + 0, t0 + 120, 3),
        (1, "A", t0 + 2000, t0 + 2060, 2),
        (2, "B", t0 + 0, t0 + 30, 2),
    }
    assert got == want


def test_stream_dedup_exact(spark, tmp_path_factory):
    import pandas as pd

    d = str(tmp_path_factory.mktemp("dedup_stream"))
    t0 = 1704067200
    # doc 1: exact replay; doc 2: same key at a DIFFERENT event time (the
    # case plain dropDuplicates on (key, ts) would keep — first-per-key
    # semantics must drop it)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 1, 2, 2, 3],
            "epoch": [t0, t0, t0 + 10, t0 + 70, t0 + 20],
            "text": ["a", "a", "b", "b2", "c"],
        }
    )
    sdf = spark.createDataFrame(pdf).select(
        "doc_id", F.timestamp_seconds(F.col("epoch")).alias("ts"), "text"
    )
    sdf.write.mode("overwrite").parquet(d)
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(d)
    out = SP.stream_dedup_exact(stream, ["doc_id"], watermark="1 hour")
    SP.run_available_now(out, "dedup_stream", output_mode="append")
    got = sorted((r.doc_id, r.text) for r in spark.table("dedup_stream").collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_batch_sessionize_is_superset_of_streaming_closed_visits(spark):
    """The batch window sessionizer and the streaming stateful operator
    share semantics: the stream's CLOSED visits must appear verbatim in
    the batch result; batch additionally holds the still-open tail runs."""
    import pandas as pd

    from jena_geo_spark.operators.sessionize import sessionize_visits

    t0 = 1704067200
    rows = [
        (1, t0, "A"), (1, t0 + 60, "A"), (1, t0 + 120, "A"),
        (1, t0 + 2000, "A"), (1, t0 + 2060, "A"), (1, t0 + 2120, "B"),
        (2, t0, "B"), (2, t0 + 30, "B"), (2, t0 + 90, "A"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "epoch", "zone_id"])
    df = spark.createDataFrame(pdf).select(
        "event_id", F.timestamp_seconds(F.col("epoch")).alias("ts"), "zone_id"
    )
    batch = {
        (r.event_id, r.zone_id, int(r.enter_ts.timestamp()), int(r.exit_ts.timestamp()), r.n_points)
        for r in sessionize_visits(
            df, entity_col="event_id", gap_seconds=600
        ).collect()
    }
    closed = {
        (1, "A", t0 + 0, t0 + 120, 3),
        (1, "A", t0 + 2000, t0 + 2060, 2),
        (2, "B", t0 + 0, t0 + 30, 2),
    }
    open_tail = {(1, "B", t0 + 2120, t0 + 2120, 1), (2, "A", t0 + 90, t0 + 90, 1)}
    assert batch == closed | open_tail


def test_curation_stages_run_on_streams(spark, tmp_path_factory):
    """The stateless curation stages (PII scrub, mixture sampling) are
    streaming-compatible by construction — row-local Catalyst only.
    availableNow drain over a file stream must equal the batch answer."""
    from jena_geo_spark.pipelines.curate import mixture_sample
    from jena_geo_spark.pipelines.text import scrub_pii

    d = str(tmp_path_factory.mktemp("doc_stream"))
    batch = spark.createDataFrame(
        [(i, f"doc {i} mail u{i}@x.io", ["en", "zh"][i % 2]) for i in range(400)],
        "doc_id long, text string, lang string",
    )
    batch.repartition(4).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(batch.schema).parquet(d)
    out = mixture_sample(
        scrub_pii(stream).withColumn("lang", F.lit("en")),
        {"en": 0.5},
        key_col="lang",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("curate_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.doc_id, r.text_redacted, r.sample_bucket)
           for r in spark.sql("SELECT * FROM curate_stream").collect()}
    want = {(r.doc_id, r.text_redacted, r.sample_bucket)
            for r in mixture_sample(
                scrub_pii(batch).withColumn("lang", F.lit("en")),
                {"en": 0.5}, key_col="lang").collect()}
    assert got == want and len(want) > 100
