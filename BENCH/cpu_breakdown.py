"""Per-run executor CPU-vs-wall breakdown of the flagship pipeline.

Evidence tool for the scaling gate (VERDICT r2 #8): for each timed run it
sums Spark's per-stage ``executorCpuTime`` (actual CPU-seconds burned by
tasks) and ``executorRunTime`` (task wall-seconds incl. host scheduling
stalls) from the local REST status API.  Interpretation:

* cpu_sec ≈ constant across runs AND levels → the job does the same total
  work regardless of parallelism (perfect work-scaling — no algorithmic
  overhead added at the bigger level);
* wall/cpu ratio inflating on SOME runs (bursts) while cpu_sec stays flat
  → the slowdown is host-side CPU steal / scheduling, not the engine.

Usage: python BENCH/cpu_breakdown.py <cpus> <runs> [sf]
Prints one JSON line per run + a summary line.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from jena_geo_spark import datagen
from jena_geo_spark.image.spark import with_phash_verified
from jena_geo_spark.operators.spatial_join import (
    build_zone_covers,
    refine_candidates,
    spatial_join_candidates,
)
from jena_geo_spark.operators.tiling import (
    assign_tiles,
    detect_hot_tiles,
    repartition_by_tile,
)
from jena_geo_spark.session import get_spark


def stage_totals(ui: str) -> tuple[float, float]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete"))
    cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
    run = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
    return cpu, run


def main():
    cpus = int(sys.argv[1])
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    spark = get_spark(
        "cpubreak",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.enabled": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "131072",
        },
    )
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}" if spark.sparkContext.uiWebUrl else "http://localhost:4040"
    d = datagen.ensure_dataset(sf)
    imgs = spark.read.parquet(f"{d}/images.parquet").select(
        "image_id", "caption", "lon", "lat", "cell_fine", "bytes", "w", "h", "fmt", "phash"
    )
    n = imgs.count()
    zones = [
        (r.zone_id, r.geom_wkt)
        for r in spark.read.parquet(f"{d}/zones.parquet").collect()
    ]
    covers = build_zone_covers(zones)
    slim = imgs.drop("bytes", "w", "h", "fmt", "phash")
    hot = detect_hot_tiles(
        assign_tiles(spatial_join_candidates(spark, slim, covers), tile_res=6),
        hot_share=0.5 / cpus,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def pipeline():
        v = with_phash_verified(imgs).filter(F.col("phash_ok")).drop(
            "bytes", "w", "h", "fmt", "phash_ok"
        )
        cand = assign_tiles(spatial_join_candidates(spark, v, covers), tile_res=6)
        shuffled = repartition_by_tile(cand, hot_tiles=hot, salt_buckets=2 * cpus)
        return refine_candidates(spark, shuffled, covers)

    noop(pipeline())  # warm
    import gc

    out = []
    for i in range(runs):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        c0, r0 = stage_totals(ui)
        t0 = time.perf_counter()
        noop(pipeline())
        wall = time.perf_counter() - t0
        c1, r1 = stage_totals(ui)
        rec = {
            "run": i,
            "cpus": cpus,
            "wall_sec": round(wall, 3),
            "task_cpu_sec": round(c1 - c0, 3),
            "task_run_sec": round(r1 - r0, 3),
            "stall_ratio": round((r1 - r0) / max(c1 - c0, 1e-9), 3),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    cpu_vals = sorted(r["task_cpu_sec"] for r in out)
    walls = sorted(r["wall_sec"] for r in out)
    print(
        json.dumps(
            {
                "summary": True,
                "cpus": cpus,
                "sf": sf,
                "n_rows": n,
                "cpu_median": cpu_vals[len(cpu_vals) // 2],
                "cpu_spread": round((cpu_vals[-1] - cpu_vals[0]) / cpu_vals[0], 3),
                "wall_min": walls[0],
                "wall_max": walls[-1],
                "wall_spread": round((walls[-1] - walls[0]) / walls[0], 3),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
