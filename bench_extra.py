"""Per-entry benchmark harness for optimization iteration (r06).

``bench.py`` is frozen for measurement; this file reproduces its exact
per-entry timing protocol (warm pass, then best-of-2 with gc between) but
lets a single entry or subset run in isolation so an optimization's effect
is measurable in seconds, not minutes.  Also supports ``--explain`` to dump
``.explain('formatted')`` for entries into plans/r06/.

Usage:
  python bench_extra.py                      # all entries
  python bench_extra.py polygon_join_frames doc_minhash_pairs
  python bench_extra.py --explain polygon_join_frames   # plan only
  python bench_extra.py --repeats 3 images_knn_frames
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from jena_geo_spark import datagen  # noqa: E402
from jena_geo_spark.contract import (  # noqa: E402
    KNN_K,
    KNN_QUERIES,
    q_doc_jaccard_pairs,
    q_emb_topk,
    q_geo_pip_join,
    q_geo_polygon_join,
    q_geo_tile_hist,
)
from jena_geo_spark.pipelines import dedup as _dedup  # noqa: E402
from jena_geo_spark.operators.knn import knn_join  # noqa: E402
from jena_geo_spark.operators.spatial_join import (  # noqa: E402
    build_zone_covers,
    refine_candidates,
    spatial_join_candidates,
    spatial_join_points_zones,
)
from jena_geo_spark.operators.tiling import (  # noqa: E402
    assign_tiles,
    detect_hot_tiles,
    repartition_by_tile,
)
from jena_geo_spark.session import get_spark  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_entries(spark, sf_dir: str, cpus: int) -> dict:
    """name -> zero-arg callable building the DataFrame (not yet executed)."""
    data_dir = datagen.ensure_dataset(datagen.sf_from_dir(sf_dir))
    imgs = spark.read.parquet(f"{data_dir}/images.parquet").select(
        "image_id", "caption", "lon", "lat", "cell_fine"
    )
    n_images = imgs.count()
    zones = [
        (r.zone_id, r.geom_wkt) for r in spark.read.parquet(f"{data_dir}/zones.parquet").collect()
    ]
    covers = build_zone_covers(zones)
    _noop(spatial_join_points_zones(spark, imgs, covers[:2]))  # worker warmup
    hot = detect_hot_tiles(
        assign_tiles(spatial_join_candidates(spark, imgs, covers), tile_res=6),
        hot_share=0.5 / cpus,
    )

    def _flagship(points, strategy="broadcast"):
        cand = assign_tiles(
            spatial_join_candidates(spark, points, covers, strategy=strategy),
            tile_res=6,
        )
        shuffled = repartition_by_tile(cand, hot_tiles=hot, salt_buckets=2 * cpus)
        return refine_candidates(spark, shuffled, covers)

    from jena_geo_spark import sparql as S

    _GEO = "http://www.opengis.net/ont/geosparql#asWKT"
    _G2 = "http://www.opengis.net/ont/geosparqlplus#"
    imgs_sq = spark.read.parquet(f"{data_dir}/images.parquet").select(
        "image_id", "geom_wkt", "lon", "lat", "cell_fine"
    )
    _ipt = S.PropertyTable(
        imgs_sq, id_col="image_id", subject_prefix="i:", type_iri=_G2 + "Image",
        props={_GEO: S.PropSpec("geom_wkt", kind="wkt_point", lon="lon", lat="lat")},
    )
    _zpt = S.PropertyTable(
        spark.read.parquet(f"{data_dir}/zones.parquet"),
        id_col="zone_id", subject_prefix="z:", type_iri=_G2 + "Zone",
        props={_GEO: S.PropSpec("geom_wkt", kind="wkt_polygon")},
    )
    _sparql_q = (
        "SELECT ?img ?zone WHERE { ?img a geo2:Image . ?zone a geo2:Zone . "
        "?img geo:sfWithin ?zone }"
    )

    imgs_full = spark.read.parquet(f"{data_dir}/images.parquet").select(
        "image_id", "caption", "lon", "lat", "cell_fine", "bytes", "w", "h", "fmt", "phash"
    )

    def _verify_pipeline():
        from jena_geo_spark.image.spark import with_phash_verified

        v = with_phash_verified(imgs_full).filter(F.col("phash_ok")).drop(
            "bytes", "w", "h", "fmt", "phash_ok"
        )
        return _flagship(v)

    from jena_geo_spark.image.resize import resize_images
    from jena_geo_spark.image.spark import phash_dedup_groups
    from jena_geo_spark.operators.knn import knn_join_frames
    from jena_geo_spark.operators.spatial_join import (
        dwithin_join_points_points,
        pip_join_points_polygons_frames,
        polygon_join_frames,
    )
    from jena_geo_spark.contract import points_from_events, q_sparql_nearby_poly

    pts = imgs.select(F.col("image_id").alias("id"), "lon", "lat")
    knn_left = pts.filter(F.pmod(F.xxhash64("id"), F.lit(100)) == 0)

    ev = points_from_events(spark, sf_dir).filter(F.col("event_id") % 20 == 0)
    tri_local = ev.select(
        F.format_string("t%09d", F.col("event_id")).alias("id"),
        F.format_string(
            "POLYGON((%s %s, %s %s, %s %s, %s %s))",
            *[
                c.cast("string")
                for c in (
                    F.col("lon"),
                    F.col("lat"),
                    F.col("lon") + 4.0,
                    F.col("lat") + 0.8,
                    F.col("lon") + 1.6,
                    F.col("lat") + 3.2,
                    F.col("lon"),
                    F.col("lat"),
                )
            ],
        ).alias("wkt"),
    )
    ev_pts = points_from_events(spark, sf_dir).select("event_id", "lon", "lat")

    from jena_geo_spark.contract import (
        _RAST_H, _RAST_MOD, _RAST_MULT_A, _RAST_MULT_B, _RAST_W,
        _RASTB_MOD, _RASTB_MULT,
    )
    from jena_geo_spark.functions import registry_support as _RS
    from jena_geo_spark.raster import transform as _RT
    from jena_geo_spark.raster import wkb_raster as _WR

    def _mk_tile_udf(mult: int, mod: int):
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BinaryType

        def f(event_id):
            out = []
            idx = np.arange(_RAST_W * _RAST_H, dtype=np.int64)
            for eid in event_id:
                v = (int(eid) * mult + idx * _RAST_MULT_B) % mod
                out.append(_WR.encode(_WR.Raster(
                    0, 1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 4326, _RAST_W, _RAST_H,
                    [_WR.Band(7, None,
                              v.reshape(_RAST_H, _RAST_W).astype(np.int32), 0)],
                )))
            return pd.Series(out)

        return pandas_udf(f, BinaryType())

    _tiles = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id")
        .withColumn("ra", _mk_tile_udf(_RAST_MULT_A, _RAST_MOD)("event_id"))
        .withColumn("rb", _mk_tile_udf(_RASTB_MULT, _RASTB_MOD)("event_id"))
        .localCheckpoint(eager=True)
    )
    _add = _RS.rast2_udf("add")
    _mulc = _RS.rastconst_udf("multiply")
    _fused = _RT.fused_algebra_stats_udf([("add", None), ("multiply_const", 3.0)])

    def _raster_algebra_chained():
        c = _mulc(_add(F.col("ra"), F.col("rb")), F.lit(-1), F.lit(3.0))
        return _tiles.select("event_id", _RT.st_summarystats(c).alias("s")).select(
            "event_id", F.col("s.sum").alias("px_sum")
        )

    def _raster_algebra_fused():
        return _tiles.select(
            "event_id", _fused(F.col("ra"), F.col("rb")).alias("s")
        ).select("event_id", F.col("s.sum").alias("px_sum"))

    from jena_geo_spark.pipelines import similarity as _sim
    from jena_geo_spark.pipelines.curate import curate_documents

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf_cents = _sim.train_ivf_centroids(emb, n_centroids=32)
    pq_books = _sim.train_pq_codebooks(emb, ivf_cents, m_sub=8, n_codes=16)

    knn_stats: dict = {}

    entries = {
        "flagship_join_tile": lambda: _flagship(imgs),
        "sparql_pip_join": lambda: S.execute_query(spark, _sparql_q, S.UnionModel([_ipt, _zpt])),
        "flagship_verify_join_tile": _verify_pipeline,
        "images_resize": lambda: resize_images(
            imgs_full.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash"),
            max_side=8,
            out_fmt="raw",
        ),
        "images_phash_groups": lambda: phash_dedup_groups(
            imgs_full.select("image_id", "phash"), max_hamming=6
        ),
        "flagship_join_tile_salted": lambda: _flagship(imgs, strategy="salted"),
        "images_knn": lambda: knn_join(
            spark, imgs, KNN_QUERIES, k=KNN_K, id_col="image_id", n_hint=n_images
        ),
        "images_dwithin_frames": lambda: dwithin_join_points_points(spark, pts, pts, 0.002),
        "images_knn_frames": lambda: knn_join_frames(
            spark, knn_left, pts, k=5, n_hint=n_images, stats=knn_stats
        ),
        "events_pip_join": lambda: q_geo_pip_join(spark, sf_dir),
        "sparql_nearby_poly": lambda: q_sparql_nearby_poly(spark, sf_dir),
        "polygon_join_frames": lambda: polygon_join_frames(
            spark, tri_local, id_col="id", wkt_col="wkt"
        ),
        "events_pip_frames": lambda: pip_join_points_polygons_frames(
            spark, ev_pts, tri_local, poly_id="id", wkt_col="wkt"
        ),
        "events_tile_hist": lambda: q_geo_tile_hist(spark, sf_dir),
        "doc_jaccard_pairs": lambda: q_doc_jaccard_pairs(spark, sf_dir),
        "doc_minhash_pairs": lambda: _dedup.minhash_lsh_pairs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold=0.2
        ),
        "doc_curate": lambda: curate_documents(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ),
        "raster_algebra_chained": _raster_algebra_chained,
        "raster_algebra_fused": _raster_algebra_fused,
        "emb_topk": lambda: q_emb_topk(spark, sf_dir),
        "emb_ivf_topk": lambda: _sim.ivf_topk(
            emb, list(range(10)), k=10, nprobe=8, centroids=ivf_cents
        ),
        "emb_pq_topk": lambda: _sim.ivf_pq_topk(
            emb, list(range(10)), k=10, nprobe=8, rerank=4,
            centroids=ivf_cents, codebooks=pq_books,
        ),
    }
    return entries, knn_stats


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    if explain:
        args.remove("--explain")
    repeats = 2
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    plan_dir = None
    if "--plan-dir" in args:
        i = args.index("--plan-dir")
        plan_dir = args[i + 1]
        del args[i : i + 2]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "jena-geo-bench-extra", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    entries, knn_stats = build_entries(spark, sf_dir, cpus)
    names = args or list(entries)
    unknown = [n for n in names if n not in entries]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}; known: {list(entries)}")

    if explain:
        os.makedirs(plan_dir or "plans/r06", exist_ok=True)
        for name in names:
            df = entries[name]()
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(plan_dir or "plans/r06", f"{name}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path}")
        spark.stop()
        return

    import gc

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = entries[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if name == "images_knn_frames":
            knn_stats.clear()
        _noop(fn())  # warm
        best = None
        samples[name] = []
        for _ in range(repeats):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            if name == "images_knn_frames":
                knn_stats.clear()
            t0 = time.perf_counter()
            _noop(fn())
            dt = time.perf_counter() - t0
            samples[name].append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": timings, "samples": samples,
                      "knn": dict(knn_stats)}))
    spark.stop()


if __name__ == "__main__":
    main()
