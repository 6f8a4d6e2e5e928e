"""Diagnostic: per-stage timing of the flagship pipeline at one parallelism.

Usage: python BENCH/diag_stages.py <cpus> [sf]
Times each stage in isolation (materialized via noop sink) to locate the
sublinear component of the N->4N scaling curve.  Not part of the graded
bench; a scratch tool.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from jena_geo_spark.session import get_spark
from jena_geo_spark import datagen
from jena_geo_spark.operators.spatial_join import build_zone_covers, spatial_join_points_zones
from jena_geo_spark.operators.tiling import assign_tiles, repartition_by_tile
from jena_geo_spark.image.spark import with_phash_verified

cpus = int(sys.argv[1])
sf = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
spark = get_spark("diag", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
d = datagen.ensure_dataset(sf)
imgs = spark.read.parquet(f"{d}/images.parquet").select(
    "image_id", "caption", "lon", "lat", "cell_fine", "bytes", "w", "h", "fmt", "phash")
n = imgs.count()
zones = [(r.zone_id, r.geom_wkt) for r in spark.read.parquet(f"{d}/zones.parquet").collect()]
covers = build_zone_covers(zones)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, warm=1, runs=2):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"stage": name, "cpus": cpus, "times": ts, "min": min(ts)}), flush=True)
    return min(ts)


# stage A: scan only (no bytes)
slim = imgs.drop("bytes", "w", "h", "fmt")
timed("scan_slim", lambda: noop(slim))
# stage B: scan incl. bytes
timed("scan_bytes", lambda: noop(imgs))
# stage C: phash verify (the pandas-UDF stage)
v = with_phash_verified(imgs).filter(F.col("phash_ok")).drop("bytes", "w", "h", "fmt")
timed("verify", lambda: noop(v))
# stage D: verify + join
j = spatial_join_points_zones(spark, v, covers)
timed("verify_join", lambda: noop(j))
# stage E: full (verify + join + tile + repartition)
from jena_geo_spark.operators.tiling import detect_hot_tiles
hot = detect_hot_tiles(assign_tiles(spatial_join_points_zones(spark, slim, covers), tile_res=6), hot_share=0.5 / cpus)
full = repartition_by_tile(assign_tiles(j, tile_res=6), hot_tiles=hot, salt_buckets=2 * cpus)
timed("full", lambda: noop(full))
# stage F: join+tile only on slim input (no python UDF at all)
j2 = spatial_join_points_zones(spark, slim, covers)
full2 = repartition_by_tile(assign_tiles(j2, tile_res=6))
timed("join_tile_no_udf", lambda: noop(full2))
print(json.dumps({"n_rows": n, "join_rows": j2.count()}), flush=True)
spark.stop()
