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


def stream_dedup_exact(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact deduplication: first arrival per key wins within the
    watermark horizon (``dropDuplicatesWithinWatermark`` keyed state —
    TRUE first-per-key: a later event with the same key but a different
    event time is dropped too, not just exact (key, ts) replays; ADVICE
    r2 #4).  At 100 TB/day state holds one entry per distinct in-horizon
    key and expires with the watermark."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_zone_visits(
    joined: DataFrame,
    entity_col: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    gap_seconds: int = 600,
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (the task brief's named API): per-entity ZONE-VISIT detection over the
    stream-static join output.  A visit = a maximal run of an entity's
    points inside one zone with inter-point gaps ≤ ``gap_seconds``.

    State per entity = (current zone, visit start, last seen, n_points);
    a zone change or gap closes the visit and emits
    (entity, zone_id, enter_ts, exit_ts, n_points).  State is O(active
    entities); the watermark bounds reordering.  Pass
    ``state_timeout_ms`` on long-running production streams to flush
    idle entities via ProcessingTimeTimeout (left off by default: a
    pending processing-time timeout keeps an ``availableNow`` drain
    spinning empty micro-batches until it fires).

    This is the kind of operator the reference cannot express at all
    (batch SPARQL engine) and Spark cannot express without the
    arbitrary-stateful API: session semantics keyed by entity with
    domain-specific close conditions."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd_  # noqa: N813  (worker-side import name)

    out_schema = StructType(
        [
            StructField("entity", LongType()),
            StructField("zone_id", StringType()),
            StructField("enter_ts", TimestampType()),
            StructField("exit_ts", TimestampType()),
            StructField("n_points", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("zone_id", StringType()),
            StructField("enter_ms", LongType()),
            StructField("last_ms", LongType()),
            StructField("n_points", LongType()),
        ]
    )

    def track(key, pdfs, state: "GroupState"):
        entity = int(key[0])
        visits = []
        if state.hasTimedOut:
            if state.exists:
                z, enter_ms, last_ms, n = state.get
                visits.append((entity, z, enter_ms, last_ms, n))
                state.remove()
        else:
            import numpy as np_

            rows = pd_.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
            zs = rows["zone_id"].to_numpy(dtype=object)
            ms = rows[ts_col].to_numpy().astype("datetime64[ms]").astype(np_.int64)
            cur = list(state.get) if state.exists else None
            gap_ms = gap_seconds * 1000
            # segment boundaries, vectorised: zone change or time gap
            brk = np_.zeros(len(zs), dtype=bool)
            if len(zs) > 1:
                brk[1:] = (zs[1:] != zs[:-1]) | (ms[1:] - ms[:-1] > gap_ms)
            starts = np_.flatnonzero(np_.concatenate([[True], brk[1:]]))
            ends = np_.concatenate([starts[1:] - 1, [len(zs) - 1]])
            segs = [
                [zs[s], int(ms[s]), int(ms[e]), int(e - s + 1)]
                for s, e in zip(starts.tolist(), ends.tolist())
            ]
            if cur is not None and segs:
                first = segs[0]
                if first[0] == cur[0] and first[1] - cur[2] <= gap_ms:
                    # stream continues the stored visit
                    segs[0] = [cur[0], cur[1], first[2], cur[3] + first[3]]
                else:
                    visits.append((entity, cur[0], cur[1], cur[2], cur[3]))
            elif cur is not None:
                segs = [cur]
            visits.extend((entity, *s) for s in segs[:-1])
            if segs:
                state.update(tuple(segs[-1]))
                if state_timeout_ms is not None:
                    state.setTimeoutDuration(state_timeout_ms)
        if visits:
            yield pd_.DataFrame(
                {
                    "entity": [v[0] for v in visits],
                    "zone_id": [v[1] for v in visits],
                    "enter_ts": pd_.to_datetime([v[2] for v in visits], unit="ms"),
                    "exit_ts": pd_.to_datetime([v[3] for v in visits], unit="ms"),
                    "n_points": [v[4] for v in visits],
                }
            )

    return (
        joined.withWatermark(ts_col, watermark)
        .groupBy(F.col(entity_col))
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if state_timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
