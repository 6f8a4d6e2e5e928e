"""GeoJSON result sinks (reference TripleStoreConnection.java:83-186:
*_geom bindings → FeatureCollection; AsGeoJSON at :142-148)."""

import json

import pytest
from pyspark.sql import functions as F

from jena_geo_spark.geom import wkt as W
from jena_geo_spark.operators.geojson_sink import (
    featurecollection_json,
    read_geojsonseq,
    write_geojsonseq,
)


@pytest.fixture()
def frame(spark):
    rows = [
        ("a", 1, bytearray(W.to_wkb(W.from_wkt("POINT (1 2)")))),
        ("b", 2, bytearray(W.to_wkb(W.from_wkt("LINESTRING (0 0, 3 4)")))),
        ("c", 3, None),  # null geometry → null-geometry Feature (GeoJSON allows it)
    ]
    return spark.createDataFrame(rows, "name string, score int, geom binary")


def test_featurecollection_shape_and_properties(frame):
    fc = json.loads(featurecollection_json(frame))
    assert fc["type"] == "FeatureCollection"
    feats = {f["properties"]["name"]: f for f in fc["features"]}
    assert set(feats) == {"a", "b", "c"}
    assert feats["c"]["geometry"] is None  # row kept, geometry null
    assert feats["a"]["geometry"] == {"type": "Point", "coordinates": [1.0, 2.0]}
    assert feats["b"]["properties"]["score"] == 2
    assert feats["b"]["geometry"]["type"] == "LineString"


def test_featurecollection_max_rows_guard(frame):
    with pytest.raises(ValueError, match="max_rows"):
        featurecollection_json(frame, max_rows=1)


def test_geojsonseq_roundtrip(spark, frame, tmp_path):
    path = str(tmp_path / "seq")
    write_geojsonseq(frame, path)
    back = read_geojsonseq(spark, path)
    rows = back.collect()
    assert len(rows) == 3  # null geometry survives as a null-geometry Feature
    assert sum(1 for r in rows if r.geom is None) == 1
    by_name = {json.loads(r.properties)["name"]: r for r in rows}
    g = W.from_wkb(bytes(by_name["a"].geom))
    assert g.kind == "point" and tuple(g.parts[0][0][:2]) == (1.0, 2.0)
    # every line is standalone-parseable (RFC 8142 consumers stream lines)
    raw = spark.read.text(path).collect()
    assert all(json.loads(r.value)["type"] == "Feature" for r in raw)


def test_wkt_geometry_column(spark):
    df = spark.createDataFrame([("z", "POINT (5 6)")], "name string, geom string")
    fc = json.loads(featurecollection_json(df, wkb=False))
    assert fc["features"][0]["geometry"]["coordinates"] == [5.0, 6.0]
