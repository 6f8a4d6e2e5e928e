"""Spatial join / kNN / tiling vs exhaustive local oracles (FIXTURES.md §6)."""

import numpy as np
import pandas as pd
import pytest

from jena_geo_spark import datagen, grid
from jena_geo_spark.geom import from_wkt
from jena_geo_spark.geom.kernel import points_in_polygon
from jena_geo_spark.operators.knn import knn_join
from jena_geo_spark.operators.spatial_join import (
    build_zone_covers,
    dwithin_join_points_centers,
    spatial_join_points_zones,
)
from jena_geo_spark.operators.tiling import assign_tiles, repartition_by_tile, tile_histogram


@pytest.fixture(scope="module")
def small_data(spark):
    imgs = datagen.build_images(3000).to_pandas()
    zones = datagen.build_zones(8).to_pandas()
    pts_df = spark.createDataFrame(imgs[["image_id", "caption", "lon", "lat"]])
    return pts_df, imgs, zones


def oracle_join(imgs: pd.DataFrame, zones: pd.DataFrame) -> set[tuple[str, str]]:
    out = set()
    for _, z in zones.iterrows():
        ring = from_wkt(z.geom_wkt).exterior()
        ins = points_in_polygon(imgs.lon.to_numpy(), imgs.lat.to_numpy(), ring)
        for iid in imgs.image_id.to_numpy()[ins]:
            out.add((iid, z.zone_id))
    return out


def test_spatial_join_matches_oracle_broadcast(spark, small_data):
    pts_df, imgs, zones = small_data
    covers = build_zone_covers(list(zones[["zone_id", "geom_wkt"]].itertuples(index=False)))
    got = spatial_join_points_zones(spark, pts_df, covers).select("image_id", "zone_id")
    got_set = {(r.image_id, r.zone_id) for r in got.collect()}
    exp = oracle_join(imgs, zones)
    assert got_set == exp
    assert len(exp) > 50  # non-trivial fixture


def test_spatial_join_salted_same_result(spark, small_data):
    pts_df, imgs, zones = small_data
    covers = build_zone_covers(list(zones[["zone_id", "geom_wkt"]].itertuples(index=False)))
    got = spatial_join_points_zones(spark, pts_df, covers, strategy="salted", salt_buckets=4)
    got_set = {(r.image_id, r.zone_id) for r in got.select("image_id", "zone_id").collect()}
    assert got_set == oracle_join(imgs, zones)


def test_semi_and_anti(spark, small_data):
    pts_df, imgs, zones = small_data
    covers = build_zone_covers(list(zones[["zone_id", "geom_wkt"]].itertuples(index=False)))
    exp = oracle_join(imgs, zones)
    matched_ids = {i for i, _ in exp}
    semi = spatial_join_points_zones(spark, pts_df, covers, how="semi")
    anti = spatial_join_points_zones(spark, pts_df, covers, how="anti")
    assert {r.image_id for r in semi.select("image_id").collect()} == matched_ids
    assert {r.image_id for r in anti.select("image_id").collect()} == (
        set(imgs.image_id) - matched_ids
    )


def test_caption_survives_shuffles(spark, small_data):
    """BASELINE invariant: caption byte-identical through every shuffle."""
    pts_df, imgs, zones = small_data
    covers = build_zone_covers(list(zones[["zone_id", "geom_wkt"]].itertuples(index=False)))
    joined = spatial_join_points_zones(spark, pts_df, covers, strategy="salted")
    tiled = repartition_by_tile(assign_tiles(joined))
    out = {r.image_id: r.caption for r in tiled.select("image_id", "caption").collect()}
    src = dict(zip(imgs.image_id, imgs.caption))
    assert all(src[i] == c for i, c in out.items())


def test_dwithin_join(spark, small_data):
    pts_df, imgs, zones = small_data
    centers = [("c0", 8.2835, 49.9928), ("c1", 77.29, 29.07)]
    r = 0.4
    got = dwithin_join_points_centers(spark, pts_df, centers, r)
    got_set = {(row.image_id, row.center_id) for row in got.collect()}
    exp = set()
    for cid, cx, cy in centers:
        d = np.sqrt((imgs.lon - cx) ** 2 + (imgs.lat - cy) ** 2)
        for iid in imgs.image_id[d <= r]:
            exp.add((iid, cid))
    assert got_set == exp and len(exp) > 10


def test_knn_matches_oracle(spark, small_data):
    pts_df, imgs, zones = small_data
    queries = [("q0", 8.2835, 49.9928), ("q1", -74.0, 40.7), ("q2", 0.0, 0.0)]
    k = 15
    got = knn_join(spark, pts_df, queries, k=k, id_col="image_id")
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.image_id))
    for qid, qx, qy in queries:
        d2 = (imgs.lon - qx) ** 2 + (imgs.lat - qy) ** 2
        order = sorted(zip(d2, imgs.image_id))[:k]
        exp = [iid for _, iid in order]
        gotk = [iid for _, iid in sorted(by_q[qid])]
        assert gotk == exp, qid


def test_knn_sparse_region_expands_ring(spark):
    """Regression: the ring-acceptance guard must require all k neighbors
    in-ring (n >= k), not just one.  A dense far-away cluster sets the
    density-derived start resolution; the query sits in a sparse corner
    where the first ring holds only 5 points — the old ``n >= min(k, 1)``
    guard returned those 5 and stopped (dmax was well inside the inscribed
    radius), silently dropping the other 15 true neighbors."""
    rng = np.random.default_rng(7)
    dense = pd.DataFrame(
        {
            "image_id": [f"d{i}" for i in range(5000)],
            "lon": rng.uniform(0.0, 1.0, 5000),
            "lat": rng.uniform(0.0, 1.0, 5000),
        }
    )
    near = pd.DataFrame(  # 5 points within ~2 deg of the query
        {
            "image_id": [f"n{i}" for i in range(5)],
            "lon": 120.0 + np.linspace(-2.0, 2.0, 5),
            "lat": 60.0 + np.linspace(-1.0, 1.0, 5),
        }
    )
    far = pd.DataFrame(  # 30 points 30-40 deg away, still the true 6..20th
        {
            "image_id": [f"f{i}" for i in range(30)],
            "lon": 120.0 + rng.uniform(30.0, 40.0, 30),
            "lat": 60.0 - rng.uniform(30.0, 40.0, 30),
        }
    )
    allp = pd.concat([dense, near, far], ignore_index=True)
    df = spark.createDataFrame(allp)
    k = 20
    got = knn_join(spark, df, [("q", 120.0, 60.0)], k=k, id_col="image_id")
    rows = sorted(got.collect(), key=lambda r: r.rank)
    assert len(rows) == k  # not 5
    d2 = (allp.lon - 120.0) ** 2 + (allp.lat - 60.0) ** 2
    exp = [iid for _, iid in sorted(zip(d2, allp.image_id))[:k]]
    assert [r.image_id for r in rows] == exp

    # fewer-than-k-total datasets terminate through the whole-world branch
    tiny = spark.createDataFrame(allp.tail(35))
    got_all = knn_join(spark, tiny, [("q", 120.0, 60.0)], k=50, id_col="image_id")
    assert got_all.count() == 35


def test_tiling_partitions_and_histogram(spark, small_data):
    pts_df, imgs, zones = small_data
    tiled = assign_tiles(pts_df, tile_res=4)
    hist = {r.tile_id: r.n_rows for r in tile_histogram(tiled).collect()}
    assert sum(hist.values()) == pts_df.count()
    # every tile id decodes to res 4
    assert all(grid.cell_res(np.array([t]))[0] == 4 for t in hist)
    # oracle: tile of each point == encode at res 4
    exp = grid.encode_points(imgs.lon.to_numpy(), imgs.lat.to_numpy(), 4)
    got = {r.image_id: r.tile_id for r in tiled.select("image_id", "tile_id").collect()}
    for iid, cell in zip(imgs.image_id, exp):
        assert got[iid] == cell


def test_dwithin_join_points_points_matches_bruteforce(spark):
    import numpy as np
    import pandas as pd

    from jena_geo_spark.operators.spatial_join import dwithin_join_points_points

    rng = np.random.default_rng(11)
    n = 1200
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-84, 84, n)
    lon[:300] = 8.28 + rng.normal(0, 0.2, 300)  # dense cluster
    lat[:300] = 49.99 + rng.normal(0, 0.2, 300)
    pdf = pd.DataFrame({"id": [f"p{i:05d}" for i in range(n)], "lon": lon, "lat": lat})
    df = spark.createDataFrame(pdf)
    radius = 0.3
    got = {
        (r.id, r.id_right)
        for r in dwithin_join_points_points(spark, df, df, radius).collect()
    }
    d = np.sqrt(
        (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    )
    ii, jj = np.where(d <= radius)
    exp = {(f"p{i:05d}", f"p{j:05d}") for i, j in zip(ii, jj)}
    assert got == exp
    assert len(exp) > n  # cluster produces real pairs beyond self-matches


def test_knn_join_frames_matches_bruteforce(spark):
    import numpy as np
    import pandas as pd

    from jena_geo_spark.operators.knn import knn_join_frames

    rng = np.random.default_rng(23)
    nl, nr, k = 300, 900, 4
    llon = rng.uniform(-179, 179, nl); llat = rng.uniform(-84, 84, nl)
    rlon = rng.uniform(-179, 179, nr); rlat = rng.uniform(-84, 84, nr)
    llon[:80] = 8.3 + rng.normal(0, 0.4, 80); llat[:80] = 50 + rng.normal(0, 0.4, 80)
    rlon[:250] = 8.3 + rng.normal(0, 0.4, 250); rlat[:250] = 50 + rng.normal(0, 0.4, 250)
    ldf = spark.createDataFrame(
        pd.DataFrame({"id": [f"l{i:04d}" for i in range(nl)], "lon": llon, "lat": llat}))
    rdf = spark.createDataFrame(
        pd.DataFrame({"id": [f"r{i:04d}" for i in range(nr)], "lon": rlon, "lat": rlat}))
    got = {}
    stats = {}
    for r in knn_join_frames(spark, ldf, rdf, k, stats=stats).collect():
        got.setdefault(r.id, []).append((r.rank, r.id_right))
    # per-row starts + 2-level coarsening: pending must shrink per round
    # and close well inside the max_iters budget
    assert stats["rounds"] <= 8
    pend = stats["pending_per_round"]
    assert pend == sorted(pend, reverse=True)
    d2 = (llon[:, None] - rlon[None, :]) ** 2 + (llat[:, None] - rlat[None, :]) ** 2
    for i in range(nl):
        order = sorted(range(nr), key=lambda j: (d2[i, j], f"r{j:04d}"))[:k]
        exp = [(rk + 1, f"r{j:04d}") for rk, j in enumerate(order)]
        assert sorted(got[f"l{i:04d}"]) == exp


def test_knn_join_frames_tail_pivot_exact(spark):
    """r6 tail pivot: with n_hint set and a small |pending|×|right|
    product, the unfinished tail routes to the bound-pruned endgame
    cross join instead of more grid rounds — results must be identical
    to brute force (same top-k, same (dist², id) tie-break), and the
    pivot must actually fire on this clustered input."""
    import numpy as np
    import pandas as pd

    from jena_geo_spark.operators.knn import knn_join_frames

    rng = np.random.default_rng(41)
    nl, nr, k = 300, 900, 4
    llon = rng.uniform(-179, 179, nl); llat = rng.uniform(-84, 84, nl)
    rlon = rng.uniform(-179, 179, nr); rlat = rng.uniform(-84, 84, nr)
    llon[:80] = 8.3 + rng.normal(0, 0.4, 80); llat[:80] = 50 + rng.normal(0, 0.4, 80)
    rlon[:250] = 8.3 + rng.normal(0, 0.4, 250); rlat[:250] = 50 + rng.normal(0, 0.4, 250)
    ldf = spark.createDataFrame(
        pd.DataFrame({"id": [f"l{i:04d}" for i in range(nl)], "lon": llon, "lat": llat}))
    rdf = spark.createDataFrame(
        pd.DataFrame({"id": [f"r{i:04d}" for i in range(nr)], "lon": rlon, "lat": rlat}))
    got = {}
    stats = {}
    for r in knn_join_frames(spark, ldf, rdf, k, n_hint=nr, stats=stats).collect():
        got.setdefault(r.id, []).append((r.rank, r.id_right))
    assert stats.get("endgame_rows", 0) > 0  # the pivot fired
    d2 = (llon[:, None] - rlon[None, :]) ** 2 + (llat[:, None] - rlat[None, :]) ** 2
    for i in range(nl):
        order = sorted(range(nr), key=lambda j: (d2[i, j], f"r{j:04d}"))[:k]
        exp = [(rk + 1, f"r{j:04d}") for rk, j in enumerate(order)]
        assert sorted(got[f"l{i:04d}"]) == exp


def test_pip_join_frames_matches_broadcast_path(spark):
    """pip_join_points_polygons_frames (nothing driver-side) must agree
    pair-for-pair with the broadcast zone-cover path — same cover
    construction, same exact-PIP kernel, different distribution shape."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from jena_geo_spark.operators.spatial_join import (
        build_zone_covers,
        pip_join_points_polygons_frames,
        spatial_join_points_zones,
    )

    rng = np.random.default_rng(7)
    polys = []
    for i in range(40):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        r = rng.uniform(0.5, 4.0)
        n = int(rng.integers(3, 7))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        xs, ys = cx + r * np.cos(ang), cy + r * np.sin(ang)
        ring = ", ".join(f"{x} {y}" for x, y in zip(xs, ys)) + f", {xs[0]} {ys[0]}"
        polys.append((i, f"POLYGON(({ring}))"))
    # a polygon with a hole and a multipolygon — both refine paths must
    # subtract holes / OR members identically
    polys.append((98, "MULTIPOLYGON(((30 30, 36 30, 36 36, 30 30)),"
                      "((-30 -30, -24 -30, -24 -24, -30 -30)))"))
    polys.append((99, "POLYGON((0 0, 20 0, 20 20, 0 20, 0 0),"
                      "(5 5, 15 5, 15 15, 5 15, 5 5))"))
    poly_df = spark.createDataFrame(polys, "pid long, zwkt string")
    pt_df = spark.createDataFrame(
        pd.DataFrame({
            "ptid": np.arange(5000),
            "lon": rng.uniform(-175, 175, 5000),
            "lat": rng.uniform(-85, 85, 5000),
        })
    )
    covers = build_zone_covers([(str(p), w) for p, w in polys])
    exp = {
        (r.ptid, int(r.zone_id))
        for r in spatial_join_points_zones(spark, pt_df, covers).collect()
    }
    out = pip_join_points_polygons_frames(
        spark, pt_df, poly_df, poly_id="pid", wkt_col="zwkt"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    got = {(r.ptid, r.pid) for r in out.collect()}
    assert got == exp and len(got) > 0
