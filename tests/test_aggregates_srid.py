"""Coordinate aggregates, bbox aggregate, SRID metadata, cosine near-dup."""

import pytest
from pyspark.sql import functions as F

from jena_geo_spark.functions import srid as S
from jena_geo_spark.functions.aggregates import agg_bounding_box, agg_coord_stats
from jena_geo_spark.functions.vector import st_geomfromtext
from jena_geo_spark.pipelines.similarity import cosine_near_dup_pairs


@pytest.fixture(scope="module")
def geoms(spark):
    return spark.createDataFrame(
        [
            ("g1", "LINESTRING(0 0, 4 0, 4 4)"),
            ("g1", "POINT (2 10)"),
            ("g2", "POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))"),
        ],
        "grp string, wkt string",
    ).select("grp", st_geomfromtext(F.col("wkt")).alias("g"))


def test_coord_aggs(spark, geoms):
    rows = {r.grp: r for r in agg_coord_stats(geoms, "g", ["grp"]).collect()}
    g1 = rows["g1"]
    # coords: (0,0),(4,0),(4,4),(2,10)
    assert (g1.min_x, g1.max_x, g1.min_y, g1.max_y) == (0, 4, 0, 10)
    assert g1.avg_x == pytest.approx(10 / 4)
    assert g1.avg_y == pytest.approx(14 / 4)
    g2 = rows["g2"]
    assert (g2.min_x, g2.max_x) == (1, 3)


def test_coord_aggs_distinct(spark, geoms):
    rows = {r.grp: r for r in agg_coord_stats(geoms, "g", ["grp"], distinct=True).collect()}
    # g2 ring closure duplicates (1,1): distinct drops it → avg over 4 pts
    assert rows["g2"].avg_x == pytest.approx((1 + 3 + 3 + 1) / 4)


def test_bbox_agg_wkt(spark, geoms):
    rows = {r.grp: r for r in agg_bounding_box(geoms, "g", ["grp"]).collect()}
    assert rows["g1"].bbox_wkt == "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 10.0, 0.0 10.0, 0.0 0.0))"
    assert (rows["g2"].xmin, rows["g2"].ymax) == (1.0, 3.0)


def test_srid_metadata():
    assert S.epsg_to_srid("EPSG:4326") == 4326
    assert S.srid_to_epsg(3857) == "EPSG:3857"
    assert S.axis_info(4326, 1) == ("Geodetic latitude", "north")
    assert S.has_flipped_axis(4326) and not S.has_flipped_axis(3857)
    assert S.is_geographic(4326) and not S.is_geographic(32632)


def test_cosine_near_dup_pairs(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 16)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(20)]
    # inject near-duplicates: 100+i ≈ i with tiny noise
    for i in range(5):
        noisy = base[i] + rng.standard_normal(16).astype("float32") * 0.01
        rows.append((100 + i, noisy.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = cosine_near_dup_pairs(df, threshold=0.98, n_planes=4, n_tables=12)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    expected = {(i, 100 + i) for i in range(5)}
    assert expected <= got  # all injected dups found
    # no false positives: every emitted pair really has cosine >= 0.98
    for r in pairs.collect():
        assert r.cosine >= 0.98
