"""GeoJSON(L) feature sources: round-trip vs the in-repo codec and the
GeoJSON sink, splittable-path schema behavior, malformed rows."""

import json

import pytest
from pyspark.sql import functions as F

from jena_geo_spark.geom import wkt as W
from jena_geo_spark.sources import read_geojson_collection, read_geojsonl

FEATURES = [
    {
        "type": "Feature",
        "id": "f0",
        "properties": {"name": "alpha", "rank": 1},
        "geometry": {"type": "Point", "coordinates": [8.2835, 49.9928]},
    },
    {
        "type": "Feature",
        "id": "f1",
        "properties": {"name": "beta", "rank": 2},
        "geometry": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]],
        },
    },
    {
        "type": "Feature",
        "id": "f2",
        "properties": {"name": "gamma", "rank": None},
        "geometry": None,  # geometry-less feature survives with NULL wkb
    },
]


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("geojsonl")
    p = d / "feats.jsonl"
    p.write_text("\n".join(json.dumps(ft) for ft in FEATURES) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def collection_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("geojson")
    p = d / "fc.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection", "features": FEATURES}))
    return str(p)


def _check(df):
    rows = {r.feature_id: r for r in df.collect()}
    assert set(rows) == {"f0", "f1", "f2"}
    g0 = W.from_wkb(bytes(rows["f0"].geom_wkb))
    assert g0.kind == "point" and abs(g0.parts[0][0][0] - 8.2835) < 1e-12
    g1 = W.from_wkb(bytes(rows["f1"].geom_wkb))
    assert g1.kind == "polygon"
    assert rows["f2"].geom_wkb is None
    assert rows["f0"].properties.name == "alpha" and rows["f1"].properties.rank == 2


def test_read_geojsonl(spark, jsonl_path):
    _check(read_geojsonl(spark, jsonl_path))


def test_read_geojson_collection(spark, collection_path):
    _check(read_geojson_collection(spark, collection_path))


def test_collection_size_guard(spark, collection_path):
    with pytest.raises(ValueError, match="read_geojsonl"):
        read_geojson_collection(spark, collection_path, max_bytes=10)


def test_sink_source_roundtrip(spark, tmp_path):
    """The engine's own sink output reads back through the matching
    source with geometry intact: featurecollection_json → collection
    source, write_geojsonseq → line source."""
    from jena_geo_spark.operators.geojson_sink import (
        featurecollection_json,
        write_geojsonseq,
    )

    df = spark.createDataFrame(
        [("a", "POINT (1 2)"), ("b", "POINT (3 4)")], "name string, geom string"
    )
    p = tmp_path / "out.geojson"
    p.write_text(featurecollection_json(df, geom_col="geom", wkb=False))
    back = read_geojson_collection(spark, str(p))
    got = sorted(
        (r.properties.name, W.to_wkt(W.from_wkb(bytes(r.geom_wkb))))
        for r in back.collect()
    )
    assert got == [("a", "POINT (1 2)"), ("b", "POINT (3 4)")]

    d = tmp_path / "seq"
    write_geojsonseq(df, str(d), geom_col="geom", wkb=False)
    back2 = read_geojsonl(spark, str(d))
    got2 = sorted(
        (r.properties.name, W.to_wkt(W.from_wkb(bytes(r.geom_wkb))))
        for r in back2.collect()
    )
    assert got2 == got


def test_empty_and_malformed_inputs(spark, tmp_path):
    """Degenerate inputs return empty/partial frames instead of raising:
    an empty GeoJSONL file, a zero-feature FeatureCollection, and a
    malformed line inside the schema sample (ADVICE r4)."""
    empty = tmp_path / "empty.geojsonl"
    empty.write_text("")
    df = read_geojsonl(spark, str(empty))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "feature_id", "properties", "geom_wkb",
    ]

    coll = tmp_path / "zero.geojson"
    coll.write_text('{"type": "FeatureCollection", "features": []}')
    assert read_geojson_collection(spark, str(coll)).count() == 0

    mixed = tmp_path / "mixed.geojsonl"
    mixed.write_text(
        "{not json at all\n"
        '{"type": "Feature", "id": "a", "properties": {"n": 7}, '
        '"geometry": {"type": "Point", "coordinates": [1.0, 2.0]}}\n'
    )
    out = read_geojsonl(spark, str(mixed))
    rows = {r.feature_id: r for r in out.collect()}
    assert rows["a"].properties.n == 7
    assert W.to_wkt(W.from_wkb(bytes(rows["a"].geom_wkb))) == "POINT (1 2)"
