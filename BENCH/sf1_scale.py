"""sf0.1 → sf1 scale evidence for the flagship + frame-scale paths.

VERDICT r4 ask #2: the "fixed round latency amortizes at scale" claims
(kNN-frames round count; events_pip_frames' cover-build overhead vs its
dim-path twin) were sf0.1-only.  This script times the four flagged
entries at BOTH scales in one process (same warm-up / best-of-2 protocol
as bench.py) and prints one JSON line with per-query seconds, the
sf0.1→sf1 wall ratios (10× rows → ratio < 10 ⇒ sublinear overhead), and
the kNN round trace at each scale.

Inputs are the same deterministic synthetic tables the bench uses:
images from jena_geo_spark.datagen at each sf; event points re-derived
from the contract's hash-lattice formula over a 10×-larger id range
(the testdata directory only ships up to sf0.1 — no external data).

Usage: python BENCH/sf1_scale.py  [--cpus 32]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jena_geo_spark import datagen  # noqa: E402
from jena_geo_spark.contract import _LAT_MULT, _LON_MULT, _hash_coord  # noqa: E402
from jena_geo_spark.operators.knn import knn_join_frames  # noqa: E402
from jena_geo_spark.operators.spatial_join import (  # noqa: E402
    build_zone_covers,
    pip_join_points_polygons_frames,
    polygon_join_frames,
    refine_candidates,
    spatial_join_candidates,
)
from jena_geo_spark.operators.tiling import (  # noqa: E402
    assign_tiles,
    detect_hot_tiles,
    repartition_by_tile,
)
from jena_geo_spark.session import get_spark  # noqa: E402

N_EVENTS = {0.1: 100_000, 1.0: 1_000_000}


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def event_points(spark, sf: float):
    return spark.range(N_EVENTS[sf]).select(
        F.col("id").alias("event_id"),
        _hash_coord(F.col("id"), _LON_MULT, 360000000, 180.0).alias("lon"),
        _hash_coord(F.col("id"), _LAT_MULT, 180000000, 90.0).alias("lat"),
    )


def run_scale(spark, sf: float, cpus: int) -> dict:
    data_dir = datagen.ensure_dataset(sf)
    imgs = spark.read.parquet(f"{data_dir}/images.parquet").select(
        "image_id", "caption", "lon", "lat", "cell_fine"
    )
    n_images = imgs.count()
    zones = [
        (r.zone_id, r.geom_wkt)
        for r in spark.read.parquet(f"{data_dir}/zones.parquet").collect()
    ]
    covers = build_zone_covers(zones)
    hot = detect_hot_tiles(
        assign_tiles(spatial_join_candidates(spark, imgs, covers), tile_res=6),
        hot_share=0.5 / cpus,
    )
    out: dict = {"sf": sf, "n_images": n_images}

    def timed(name, fn):
        fn()  # warm pass
        best = None
        for _ in range(2):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)

    def _flagship():
        cand = assign_tiles(
            spatial_join_candidates(spark, imgs, covers), tile_res=6
        )
        shuffled = repartition_by_tile(cand, hot_tiles=hot, salt_buckets=2 * cpus)
        return refine_candidates(spark, shuffled, covers)

    timed("flagship_join_tile", lambda: _noop(_flagship()))
    out["flagship_rows_per_sec"] = round(n_images / out["flagship_join_tile"], 1)

    pts = imgs.select(F.col("image_id").alias("id"), "lon", "lat")
    knn_left = pts.filter(F.pmod(F.xxhash64("id"), F.lit(100)) == 0)
    knn_stats: dict = {}

    def _knn_frames():
        knn_stats.clear()
        _noop(
            knn_join_frames(
                spark, knn_left, pts, k=5, n_hint=n_images, stats=knn_stats
            )
        )

    timed("images_knn_frames", _knn_frames)
    out["knn_frames_rounds"] = knn_stats.get("rounds")
    out["knn_frames_pending_per_round"] = knn_stats.get("pending_per_round")

    # frame-scale polygon×polygon + point-in-polygon joins: ~4° triangles
    # anchored at 1/20th of the event lattice, identical to bench.py
    ev = event_points(spark, sf).filter(F.col("event_id") % 20 == 0)
    tri_local = ev.select(
        F.format_string("t%09d", F.col("event_id")).alias("id"),
        F.format_string(
            "POLYGON((%s %s, %s %s, %s %s, %s %s))",
            *[
                c.cast("string")
                for c in (
                    F.col("lon"), F.col("lat"),
                    F.col("lon") + 4.0, F.col("lat") + 0.8,
                    F.col("lon") + 1.6, F.col("lat") + 3.2,
                    F.col("lon"), F.col("lat"),
                )
            ],
        ).alias("wkt"),
    )
    timed(
        "polygon_join_frames",
        lambda: _noop(polygon_join_frames(spark, tri_local, id_col="id", wkt_col="wkt")),
    )
    ev_pts = event_points(spark, sf).select("event_id", "lon", "lat")
    timed(
        "events_pip_frames",
        lambda: _noop(
            pip_join_points_polygons_frames(
                spark, ev_pts, tri_local, poly_id="id", wkt_col="wkt"
            )
        ),
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    spark = get_spark(
        "sf1-scale", master=f"local[{args.cpus}]", shuffle_partitions=max(args.cpus, 8)
    )
    res = {}
    for sf in (0.1, 1.0):
        res[str(sf)] = run_scale(spark, sf, args.cpus)
    ratios = {
        q: round(res["1.0"][q] / res["0.1"][q], 2)
        for q in (
            "flagship_join_tile",
            "images_knn_frames",
            "polygon_join_frames",
            "events_pip_frames",
        )
    }
    print(json.dumps({"levels": res, "wall_ratio_sf1_over_sf01_at_10x_rows": ratios}))


if __name__ == "__main__":
    main()
